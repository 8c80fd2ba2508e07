#!/usr/bin/env python
"""Profiling / benchmark harness (analog of the reference profile_inference.py;
modes per docs/en/BENCHMARK.md:23-33).

Modes:
  profile        one E2E generation with per-phase timing breakdown
  benchmark      duration x batch matrix -> markdown table
  tier-test      run each topology tier preset (device-count analog of VRAM tiers)
  understand     LM understanding flow timing (codes -> metadata)
  create_sample  LM inspiration flow timing (query -> sample)
  format_sample  LM rewrite flow timing

All timings are wall-clock with a warmup (compile) pass excluded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _setup_jax(cache_dir=".jax_cache"):
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _build_engine(jax, quant):
    from acestep_tpu.pipeline import build_random_engine

    return build_random_engine(jax.random.key(0), quant=None if quant == "bf16" else quant)


def _request(duration_s, batch, seed=0):
    from acestep_tpu.pipeline import GenerationRequest

    rng = np.random.default_rng(seed)
    return GenerationRequest(
        duration_s=duration_s,
        style_token_ids=rng.integers(0, 150000, (1, 64)),
        lyric_token_ids=rng.integers(0, 150000, (1, 256)),
        seeds=list(range(seed, seed + batch)),
        batch_size=batch,
    )


def mode_profile(args):
    jax = _setup_jax()
    engine = _build_engine(jax, args.quant)
    req = _request(args.duration, args.batch)
    warm = engine.generate(req)              # compile pass
    res = engine.generate(req)
    out = {
        "mode": "profile",
        "quant": args.quant,
        "duration_s": args.duration,
        "batch": args.batch,
        "compile_total_s": round(warm.time_costs["total_time_cost"], 3),
        "time_costs": {k: round(v, 4) for k, v in res.time_costs.items()},
        "rtf": round(args.duration * args.batch / res.time_costs["total_time_cost"], 2),
    }
    print(json.dumps(out, indent=2))


def mode_benchmark(args):
    jax = _setup_jax()
    engine = _build_engine(jax, args.quant)
    durations = [float(d) for d in args.durations.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    rows = []
    for d in durations:
        for b in batches:
            req = _request(d, b)
            engine.generate(req)             # compile
            res = engine.generate(req)
            tc = res.time_costs
            rows.append((d, b, tc["total_time_cost"], tc["diffusion_time_cost"],
                         tc["vae_time_cost"], d * b / tc["total_time_cost"]))
            print(f"done: {d}s x{b}", file=sys.stderr)
    print("| duration | batch | wall s | dit s | vae s | xRT |")
    print("|---:|---:|---:|---:|---:|---:|")
    for d, b, w, dit_s, vae_s, rtf in rows:
        print(f"| {d:.0f} | {b} | {w:.2f} | {dit_s:.2f} | {vae_s:.2f} | {rtf:.1f} |")


def _build_lm(jax, quant="q8_0"):
    import jax.numpy as jnp

    from acestep_tpu.config import QWEN3_0_6B
    from acestep_tpu.lm_pipeline import LMPipeline
    from acestep_tpu.models import qwen
    from acestep_tpu.quant import quantize_tree_jax

    cfg = QWEN3_0_6B

    def build(k):
        return quantize_tree_jax(qwen.init_params(k, cfg, dtype=jnp.bfloat16), quant)

    params = jax.jit(build)(jax.random.key(7))

    class ByteTok:
        eos_token_id = 151643
        think_end_id = 151644
        audio_code_base_id = 151669 - 64000

        def encode(self, text):
            return [b % 50000 for b in text.encode()][:512]

        def decode(self, ids):
            out = []
            for i in ids:
                i = int(i)
                if i == self.think_end_id:
                    out.append("</think>")
                elif i >= self.audio_code_base_id:
                    out.append(f"<|audio_code_{i - self.audio_code_base_id}|>")
                else:
                    out.append(chr(i % 94 + 32))
            return "".join(out)

    return LMPipeline(params, cfg, ByteTok())


def mode_lm_flow(args):
    """LM-only flows (reference profile modes understand/create_sample/
    format_sample — BENCHMARK.md:23-33)."""
    jax = _setup_jax()
    lm = _build_lm(jax, args.quant if args.quant.startswith("q") else "q8_0")
    flows = {
        "understand": lambda: lm.understand_audio_from_codes(
            "".join(f"<|audio_code_{i%64000}|>" for i in range(150)), max_tokens=128),
        "create_sample": lambda: lm.create_sample_from_query(
            "an upbeat track for a summer road trip", max_tokens=128),
        "format_sample": lambda: lm.format_sample_from_input(
            "i want smth chill, maybe lofi?? 2 min", max_tokens=128),
    }
    fn = flows[args.mode]
    fn()                                 # warm (compiles)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(json.dumps({"mode": args.mode, "seconds": round(dt, 3),
                      "keys": sorted(out.keys())}))


def mode_tier_test(args):
    jax = _setup_jax()
    from acestep_tpu.parallel import tier_for

    n = len(jax.devices())
    tier = tier_for(n)
    print(json.dumps({"devices": n, "tier": {"dp": tier.dp, "tp": tier.tp,
                                             "max_batch": tier.max_batch}}))
    engine = _build_engine(jax, args.quant)
    req = _request(30.0, 1)
    engine.generate(req)
    res = engine.generate(req)
    print(json.dumps({"tier_test_30s_wall_s": round(res.time_costs["total_time_cost"], 3)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["profile", "benchmark", "tier-test",
                                       "understand", "create_sample",
                                       "format_sample"], default="profile")
    ap.add_argument("--quant", default="q8_0", choices=["bf16", "q8_0", "q4_0", "q4_k", "q6_k"])
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--durations", default="10,30,60")
    ap.add_argument("--batches", default="1,2")
    args = ap.parse_args()
    {"profile": mode_profile, "benchmark": mode_benchmark,
     "tier-test": mode_tier_test, "understand": mode_lm_flow,
     "create_sample": mode_lm_flow, "format_sample": mode_lm_flow}[args.mode](args)


if __name__ == "__main__":
    main()
