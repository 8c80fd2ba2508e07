#!/usr/bin/env python
"""Checkpoint converter: reference HF/safetensors checkpoints -> native quantized
format (analog of acestep_ggml/tools/export_safetensors_to_gguf.py, but
converter-ahead-of-time: quantization happens once here, load is instant).

Usage:
  python tools/convert_checkpoint.py --dit /path/acestep-v15-turbo \
      --vae /path/vae --text /path/Qwen3-Embedding-0.6B \
      --out converted/ --quant q4_k

Each component directory must contain model.safetensors (+ config.json, used
when present to override architecture defaults).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _find_st(path: str) -> str:
    if path.endswith(".safetensors"):
        return path
    for name in ("model.safetensors", "diffusion_pytorch_model.safetensors"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return p
    cands = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if len(cands) == 1:
        return os.path.join(path, cands[0])
    raise FileNotFoundError(f"no unambiguous .safetensors in {path}: {cands}")


def _load_cfg(path: str, cls):
    p = os.path.join(path, "config.json") if os.path.isdir(path) else None
    if p and os.path.exists(p):
        with open(p) as f:
            return cls.from_dict(json.load(f))
    return cls()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dit")
    ap.add_argument("--vae")
    ap.add_argument("--text")
    ap.add_argument("--lm")
    ap.add_argument("--out", required=True)
    ap.add_argument("--quant", default="q8_0", choices=["bf16", "q8_0", "q4_0", "q4_k", "q6_k"])
    ap.add_argument("--lm-quant", default=None, help="override quant for the LM")
    ap.add_argument("--allow-random-codec", action="store_true",
                    help="when the DiT checkpoint carries codec tensors that "
                         "cannot be mapped, keep the structural random-weight "
                         "bridge instead of failing (records the name diff in "
                         "the manifest)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")   # conversion is host-side

    from acestep_tpu import loader
    from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
    from acestep_tpu.utils.safetensors_io import SafetensorsFile

    os.makedirs(args.out, exist_ok=True)
    quant = None if args.quant == "bf16" else args.quant
    manifest = {"quant": args.quant, "components": {}}

    def convert(name, path, load_fn, cfg):
        t0 = time.time()
        st = SafetensorsFile(_find_st(path))
        params = load_fn(st, cfg)
        loader.save_params(os.path.join(args.out, name), params,
                           {"component": name, "quant": args.quant})
        # persist the resolved architecture config so serving needs no access
        # to the source checkpoint dir (launch.py build_engine reads these)
        import dataclasses

        with open(os.path.join(args.out, f"{name}.config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=1)
        dt = time.time() - t0
        manifest["components"][name] = {"source": path, "seconds": round(dt, 1)}
        print(f"{name}: converted in {dt:.1f}s", file=sys.stderr)

    if args.dit:
        cfg = _load_cfg(args.dit, DiTConfig)
        convert("dit", args.dit, lambda st, c: loader.load_dit(st, c, quant=quant), cfg)

        # codec bridge (tokenizer/quantizer/detokenizer — the reference keeps
        # these in the DiT checkpoint's remote code, handler.py:906-939).
        # Probe the safetensors for codec-family tensors; if any exist they
        # MUST load through the spec (optionally renamed via a codec.name_map
        # block in config.json) — never silently fall back to random weights.
        from acestep_tpu.models import codec as codec_mod

        st = SafetensorsFile(_find_st(args.dit))
        probe = codec_mod.probe_tensor_names(st.keys())
        manifest["codec_probe"] = [
            {"name": n, "shape": list(st.info(n)[1])} for n in probe]
        override = {}
        cfg_p = (os.path.join(args.dit, "config.json")
                 if os.path.isdir(args.dit) else None)
        if cfg_p and os.path.exists(cfg_p):
            with open(cfg_p) as f:
                override = json.load(f).get("codec", {})
        if probe:
            try:
                codec_params = codec_mod.load_from_checkpoint(
                    st, name_map=override.get("name_map"),
                    arch=override.get("arch"))
            except codec_mod.CodecMismatchError as e:
                if not args.allow_random_codec:
                    print(f"codec: FAILED\n{e}", file=sys.stderr)
                    sys.exit(1)
                manifest["components"]["codec"] = {
                    "status": "random", "mismatch": str(e)}
                print(f"codec: unmapped, keeping structural bridge "
                      f"(--allow-random-codec)\n{e}", file=sys.stderr)
            else:
                arch_name, _ = codec_mod.get_arch(codec_params)
                loader.save_params(os.path.join(args.out, "codec"),
                                   codec_params,
                                   {"component": "codec", "quant": "f32",
                                    "arch": arch_name})
                with open(os.path.join(args.out, "codec.config.json"), "w") as f:
                    json.dump({"source_names": probe,
                               "arch": arch_name,
                               "name_map": override.get("name_map", {})}, f,
                              indent=1)
                manifest["components"]["codec"] = {
                    "source": args.dit, "tensors": len(probe),
                    "arch": arch_name}
                print(f"codec: loaded {len(probe)} checkpoint tensors "
                      f"(arch {arch_name})", file=sys.stderr)
    if args.vae:
        cfg = _load_cfg(args.vae, VAEConfig)
        convert("vae", args.vae, lambda st, c: loader.load_vae(st, c), cfg)
    if args.text:
        cfg = _load_cfg(args.text, QwenConfig)
        convert("text_encoder", args.text,
                lambda st, c: loader.load_qwen(st, c, quant=quant), cfg)
    if args.lm:
        cfg = _load_cfg(args.lm, QwenConfig)
        lm_quant = args.lm_quant or quant
        convert("lm", args.lm, lambda st, c: loader.load_qwen(st, c, quant=lm_quant), cfg)
        # ship the tokenizer next to the converted weights so serving needs no
        # source-checkpoint access (launch.py build_lm reads tokenizer.json)
        tok_src = os.path.join(args.lm, "tokenizer.json")
        if os.path.isdir(args.lm) and os.path.exists(tok_src):
            import shutil

            shutil.copyfile(tok_src, os.path.join(args.out, "tokenizer.json"))
            manifest["components"]["tokenizer"] = {"source": tok_src}

    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest))


if __name__ == "__main__":
    main()
