#!/usr/bin/env python
"""acestep-tpu CLI — native-engine driver mirroring the reference C++ CLI modes
(acestep_ggml/cpp/ace_ggml_cli.cpp:17-26):

  --text-encoder     run the Qwen text encoder on a token file, print stats
  --dit              one DiT forward on random latents (smoke/benchmark)
  --vae              VAE decode random latents -> WAV
  --pipeline         text2music E2E from a style token file
  --pipeline-style-lyric         style + lyric token files
  --pipeline-style-lyric-timbre  + refer-audio latents (.npy)

Token files are whitespace/newline-separated integer token ids, exactly like the
reference's scripts/build_cli_token_files.py output.  Without --checkpoint the
engine runs random-init weights (smoke/bench mode, like --timbre-rand-n).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _read_token_file(path: str) -> np.ndarray:
    with open(path) as f:
        ids = [int(tok) for tok in f.read().split()]
    return np.asarray([ids], dtype=np.int32)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--text-encoder", action="store_true")
    mode.add_argument("--dit", action="store_true")
    mode.add_argument("--vae", action="store_true")
    mode.add_argument("--pipeline", action="store_true")
    mode.add_argument("--pipeline-style-lyric", action="store_true")
    mode.add_argument("--pipeline-style-lyric-timbre", action="store_true")
    mode.add_argument("--wizard", action="store_true",
                      help="interactive prompt flow (reference cli.py wizard)")

    ap.add_argument("--style-tokens", type=str, help="style token file")
    ap.add_argument("--lyric-tokens", type=str, help="lyric token file")
    ap.add_argument("--timbre-npy", type=str, help="refer-audio latents .npy [n, L, 64]")
    ap.add_argument("--timbre-rand-n", type=int, default=0, help="random timbre clips (smoke)")
    ap.add_argument("--audio-seconds", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shift", type=float, default=3.0)
    ap.add_argument("--infer-method", choices=["ode", "sde"], default="ode")
    ap.add_argument("--quant", choices=["bf16", "q8_0", "q4_0", "q4_k", "q6_k"], default=None)  # default from Settings (q8_0)
    ap.add_argument("--checkpoint", type=str, help="converted checkpoint dir (loader.save_params files)")
    ap.add_argument("--out", type=str, default="output.wav")
    ap.add_argument("--compile-cache", type=str, default=".jax_cache")
    args = ap.parse_args(argv)

    import os

    if args.wizard:
        return run_wizard(args)

    # layered settings: .env file / ACESTEP_TPU_* env / CLI override
    from acestep_tpu.settings import Settings

    settings = Settings.load(quant=args.quant)
    settings.apply_env()
    args.quant = settings.quant

    import jax

    if args.compile_cache:
        os.makedirs(args.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(args.compile_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from acestep_tpu import loader
    from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest, build_random_engine
    from acestep_tpu.utils import write_wav

    t0 = time.time()
    if args.checkpoint:
        dit_cfg = DiTConfig()
        vae_cfg = VAEConfig()
        text_cfg = QwenConfig()
        engine = AceStepEngine(
            loader.load_params(os.path.join(args.checkpoint, "dit")),
            dit_cfg,
            loader.load_params(os.path.join(args.checkpoint, "vae")),
            vae_cfg,
            loader.load_params(os.path.join(args.checkpoint, "text_encoder")),
            text_cfg,
        )
    else:
        quant = None if args.quant == "bf16" else args.quant
        engine = build_random_engine(jax.random.key(0), quant=quant)
    load_s = time.time() - t0
    print(f"load: {load_s:.2f}s (backend={jax.default_backend()})", file=sys.stderr)

    rng = np.random.default_rng(args.seed)
    style = _read_token_file(args.style_tokens) if args.style_tokens else \
        rng.integers(0, 150000, (1, 64)).astype(np.int32)
    lyric = _read_token_file(args.lyric_tokens) if args.lyric_tokens else None

    if args.text_encoder:
        out = engine.encode_style(style, np.ones_like(style))
        out.block_until_ready()
        arr = np.asarray(out, dtype=np.float32)
        print(json.dumps({"mode": "text-encoder", "shape": list(arr.shape),
                          "mean": float(arr.mean()), "std": float(arr.std())}))
        return 0

    if args.vae:
        frames = int(round(args.audio_seconds * 25))
        lat = jnp.asarray(rng.standard_normal((1, frames, 64)), jnp.float32)
        from acestep_tpu.models import vae as vae_mod

        audio = vae_mod.tiled_decode(engine.vae_params, engine.vae_cfg, lat,
                                     chunk_frames=128, overlap_frames=None)
        write_wav(args.out, np.asarray(audio[0]), engine.vae_cfg.sampling_rate)
        print(json.dumps({"mode": "vae", "samples": int(audio.shape[1]), "out": args.out}))
        return 0

    if args.dit:
        from acestep_tpu.models import dit as dit_mod

        frames = int(round(args.audio_seconds * 25))
        cfg = engine.dit_cfg
        hs = jnp.asarray(rng.standard_normal((1, frames, cfg.audio_acoustic_hidden_dim)), jnp.bfloat16)
        ctx = jnp.asarray(rng.standard_normal((1, frames, cfg.context_dim)), jnp.bfloat16)
        enc = jnp.asarray(rng.standard_normal((1, 64, cfg.hidden_size)), jnp.bfloat16)
        t = jnp.asarray([0.9], jnp.float32)
        fwd = jax.jit(lambda p, hs, t, enc, ctx: dit_mod.forward(p, cfg, hs, t, t, enc, ctx))
        out = fwd(engine.dit_params, hs, t, enc, ctx)
        out.block_until_ready()
        t1 = time.time()
        out = fwd(engine.dit_params, hs, t, enc, ctx)
        out.block_until_ready()
        print(json.dumps({"mode": "dit", "frames": frames, "forward_s": round(time.time() - t1, 4)}))
        return 0

    # pipeline modes
    req = GenerationRequest(
        duration_s=args.audio_seconds,
        style_token_ids=style,
        seeds=[args.seed],
        shift=args.shift,
        infer_method=args.infer_method,
    )
    if args.pipeline_style_lyric or args.pipeline_style_lyric_timbre:
        req.lyric_token_ids = lyric if lyric is not None else rng.integers(0, 150000, (1, 128)).astype(np.int32)
    if args.pipeline_style_lyric_timbre:
        if args.timbre_npy:
            req.refer_latents = np.load(args.timbre_npy)[None, ...]
        else:
            n = max(1, args.timbre_rand_n)
            req.refer_latents = rng.standard_normal((1, n, 750, 64)).astype(np.float32)

    res = engine.generate(req)
    write_wav(args.out, [s[0] for s in res.pcm16_segments()], res.sample_rate)
    print(json.dumps({
        "mode": "pipeline",
        "out": args.out,
        "samples": int(res.audio.shape[1]),
        "time_costs": {k: round(v, 3) for k, v in res.time_costs.items()},
        "seeds": res.seeds,
    }))
    return 0


def edit_formatted_prompt(caption, lyrics, editor=None):
    """Round-trip caption/lyrics through $EDITOR as a formatted prompt file
    (reference cli.py:213-234).  Section headers survive the edit; unchanged
    or aborted edits return the inputs untouched."""
    import os
    import subprocess
    import tempfile

    editor = editor or os.environ.get("EDITOR", "vi")
    doc = f"# caption (one line)\n{caption}\n\n# lyrics\n{lyrics}\n"
    with tempfile.NamedTemporaryFile("w", suffix=".prompt.txt", delete=False) as f:
        f.write(doc)
        path = f.name
    try:
        if subprocess.call([*editor.split(), path]) != 0:
            return caption, lyrics
        with open(path) as f:
            lines = f.read().splitlines()
    finally:
        os.unlink(path)
    section, cap_lines, lyr_lines = None, [], []
    for ln in lines:
        low = ln.strip().lower()
        if low.startswith("# caption"):
            section = "caption"
        elif low.startswith("# lyrics"):
            section = "lyrics"
        elif section == "caption" and ln.strip():
            cap_lines.append(ln.strip())
        elif section == "lyrics":
            lyr_lines.append(ln)
    new_caption = " ".join(cap_lines) or caption
    new_lyrics = "\n".join(lyr_lines).strip()
    return new_caption, new_lyrics


def run_wizard(args):
    """Interactive flow (analog of the reference's cli.py wizard: prompts for
    caption/lyrics/settings, optional TOML config load, then generates)."""
    import os
    import tomllib

    cfg = {}
    cfg_path = os.environ.get("ACESTEP_TPU_CLI_CONFIG", "acestep_cli.toml")
    if os.path.exists(cfg_path):
        with open(cfg_path, "rb") as f:
            cfg = tomllib.load(f)
        print(f"loaded config from {cfg_path}", file=sys.stderr)

    def ask(prompt, default=""):
        try:
            val = input(f"{prompt} [{default}]: ").strip()
        except EOFError:
            val = ""
        return val or default

    caption = ask("Caption / style", cfg.get("caption", "dreamy synthwave"))
    lyrics = ask("Lyrics (blank = instrumental)", cfg.get("lyrics", ""))
    if ask("Edit formatted prompt in $EDITOR? (y/N)", "n").lower().startswith("y"):
        caption, lyrics = edit_formatted_prompt(caption, lyrics)
    duration = float(ask("Duration seconds", str(cfg.get("duration", 30))))
    seed = int(ask("Seed", str(cfg.get("seed", 0))))
    out = ask("Output wav", cfg.get("out", "output.wav"))
    quant = ask("Quant (bf16/q8_0/q4_0/q4_k/q6_k)", cfg.get("quant", "q8_0"))

    argv = ["--pipeline", "--audio-seconds", str(duration), "--seed", str(seed),
            "--out", out, "--quant", quant]
    print(f"-> caption={caption!r} lyrics={len(lyrics)} chars; running pipeline...",
          file=sys.stderr)
    # the native engine takes token ids; in wizard/demo mode hash text to ids
    ids = [str(b % 32000) for b in caption.encode()][:256]
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(" ".join(ids))
        style_file = f.name
    argv += ["--style-tokens", style_file]
    try:
        return main(argv)
    finally:
        os.unlink(style_file)


if __name__ == "__main__":
    sys.exit(main())
