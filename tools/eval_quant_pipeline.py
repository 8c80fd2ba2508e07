#!/usr/bin/env python
"""Quant-vs-FP quality eval (analog of acestep_ggml/tools/
eval_quant_prompt_pipeline.py): run the SAME request through the fp engine and
each quant format, measure waveform metrics (mae/rmse/cosine/snr_db/lsd) and
wall time, write wav files + a markdown summary.

Without public checkpoints the engine runs a shared random-weight model — the
quant deltas are still the quantity under test (identical weights before
quantization, identical seeds/noise).
"""

from __future__ import annotations
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="reports/quant_eval")
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--formats", default="q8_0,q4_0,q4_k,q6_k")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--clap-ckpt", default=None,
                    help="local transformers-format CLAP checkpoint dir; adds "
                         "clap/clap_delta columns (BASELINE.json's metric). "
                         "Falls back to ACESTEP_TPU_CLAP_CKPT; skipped when "
                         "absent")
    ap.add_argument("--caption", default="an energetic electronic track with "
                    "driving synths", help="caption the CLAP gate scores "
                    "the audio against")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.abspath(".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
    from acestep_tpu.eval_metrics import waveform_metrics
    from acestep_tpu.models import dit, qwen, vae
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest
    from acestep_tpu.quant import quantize_tree_jax
    from acestep_tpu.utils.audio import write_wav

    os.makedirs(args.out, exist_ok=True)
    dit_cfg, vae_cfg, text_cfg = DiTConfig(), VAEConfig(), QwenConfig()

    # one shared fp weight set (jitted on-device init); kept UNSTACKED so the
    # quantizer sees 2-D kernels (the engine stacks at construction)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    fp_dit = jax.jit(lambda k: dit.init_params(k, dit_cfg, dtype=jnp.bfloat16))(k1)
    vae_params = jax.jit(lambda k: vae.init_params(k, vae_cfg))(k2)
    fp_text = jax.jit(lambda k: qwen.init_params(k, text_cfg, dtype=jnp.bfloat16))(k3)

    rng = np.random.default_rng(0)
    req = GenerationRequest(
        duration_s=args.duration,
        style_token_ids=rng.integers(0, 150000, (1, 64)),
        lyric_token_ids=rng.integers(0, 150000, (1, 256)),
        seeds=[args.seed],
    )

    from acestep_tpu.eval_clap import load_scorer

    clap = load_scorer(args.clap_ckpt)
    if clap is None and args.clap_ckpt:
        sys.exit(1)                                 # an explicit ckpt must load
    rows = []

    def run(name, dit_p, text_p):
        import gc

        engine = AceStepEngine(dit_p, dit_cfg, vae_params, vae_cfg, text_p, text_cfg)
        engine.generate(req)                       # compile
        t0 = time.time()
        res = engine.generate(req)
        infer_s = time.time() - t0
        wav = res.audio[0]
        lat = res.latents[0]
        write_wav(os.path.join(args.out, f"{name}.wav"), wav, res.sample_rate)
        print(f"{name}: {infer_s:.2f}s", file=sys.stderr)
        # free the engine's stacked weight copies before the next variant
        del engine
        gc.collect()
        return wav, lat, infer_s

    fp_wav, fp_lat, fp_s = run("fp_bf16", fp_dit, fp_text)
    sr = VAEConfig().sampling_rate
    fp_clap = clap.score(args.caption, fp_wav, sr) if clap else None
    rows.append(("fp_bf16", fp_s, None, None, fp_clap, None))

    for fmt in args.formats.split(","):
        import gc

        q_dit = quantize_tree_jax(fp_dit, fmt)
        q_text = quantize_tree_jax(fp_text, fmt)
        wav, lat, infer_s = run(fmt, q_dit, q_text)
        del q_dit, q_text
        gc.collect()
        m = waveform_metrics(fp_wav, wav)
        # latent-level cosine isolates the DiT path from the (unquantized)
        # VAE's waveform amplification — the meaningful random-weight gate
        a = fp_lat.astype(np.float64).ravel()
        b = lat.astype(np.float64).ravel()
        lat_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        c = clap.score(args.caption, wav, sr) if clap else None
        rows.append((fmt, infer_s, m, lat_cos, c,
                     None if c is None else c - fp_clap))

    clap_cols = " clap | clap_delta |" if clap else ""
    lines = [f"| variant | infer_s | latent_cos | mae | rmse | cosine | snr_db | lsd |{clap_cols}",
             "|---|---:|---:|---:|---:|---:|---:|---:|" + ("---:|---:|" if clap else "")]
    for name, infer_s, m, lat_cos, c, cd in rows:
        tail = "" if not clap else (
            f" {c:.4f} | {'—' if cd is None else format(cd, '+.4f')} |")
        if m is None:
            lines.append(f"| {name} | {infer_s:.3f} | — | — | — | — | — | — |{tail}")
        else:
            lines.append(
                f"| {name} | {infer_s:.3f} | {lat_cos:.6f} | {m['mae']:.6f} | {m['rmse']:.6f} "
                f"| {m['cosine']:.6f} | {m['snr_db']:.2f} | {m['lsd']:.4f} |{tail}")
    summary = "\n".join(lines)
    with open(os.path.join(args.out, "summary.md"), "w") as f:
        f.write(f"# Quant eval — {args.duration:.0f}s clip, seed {args.seed}\n\n"
                f"(random-weight engine; metrics vs the fp_bf16 output)\n\n{summary}\n")
    print(summary)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump([{"variant": n, "infer_s": s, "metrics": m,
                    "clap": c, "clap_delta": cd}
                   for n, s, m, _lc, c, cd in rows], f, indent=2)


if __name__ == "__main__":
    main()
