#!/usr/bin/env python
"""A/B the DiT diffusion loop: fused vs unfused weights x qmm backend.

Times the exact jitted 8-step sampler the engine runs (sampler.sample_latents,
scan over Euler steps) on flagship-shaped random weights, for each requested
(fuse, backend) combo at one duration/quant.  This is the measurement behind
the memory_planner backend default (plan_request dit_qmm_backend) and the
dit.fuse_params layout choice.

Usage:  python tools/bench_dit_step.py --duration 10 --quant q8_0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--quant", default="q8_0")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cond-tokens", type=int, default=320)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--combos", default="fused:pallas,fused:xla,unfused:pallas,unfused:xla")
    ap.add_argument("--attn-mask", action="store_true",
                    help="replicate the engine's masked path (t_valid < bucket)")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from acestep_tpu import sampler
    from acestep_tpu.config import DiTConfig
    from acestep_tpu.models import dit
    from acestep_tpu.ops import qlinear
    from acestep_tpu.pipeline import bucket_frames, frames_for_duration
    from acestep_tpu.quant import quantize_tree_jax

    cfg = DiTConfig()

    def build(k):
        p = dit.init_params(k, cfg, dtype=jnp.bfloat16)
        if args.quant != "bf16":
            p = quantize_tree_jax(p, args.quant)
        return dit.stack_params(p)

    base = jax.jit(build)(jax.random.key(0))
    jax.block_until_ready(jax.tree_util.tree_leaves(base)[0])

    t = bucket_frames(frames_for_duration(args.duration))
    b = args.batch
    rng = np.random.default_rng(0)
    noise = jnp.asarray(
        rng.standard_normal((b, t, cfg.audio_acoustic_hidden_dim)), jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((b, t, cfg.context_dim)), jnp.float32)
    enc = jnp.asarray(
        rng.standard_normal((b, args.cond_tokens, cfg.hidden_size)), jnp.float32)
    schedule = sampler.get_timestep_schedule(3.0)[: args.steps]
    attn_mask = enc_mask = None
    if args.attn_mask:
        t_valid = frames_for_duration(args.duration)
        attn_mask = (jnp.arange(t)[None, :] < t_valid).astype(jnp.int32)
        attn_mask = jnp.broadcast_to(attn_mask, (b, t))
        enc_mask = jnp.ones((b, args.cond_tokens), jnp.int32)

    results = {}
    for combo in args.combos.split(","):
        fuse, backend = combo.split(":")
        params = qlinear.precast_quant_scales(
            dit.fuse_params(base) if fuse == "fused" else base)

        fn = jax.jit(lambda p, n, c, e: sampler.sample_latents(
            p, cfg, n, c, e, enc_mask, schedule,
            attn_mask=attn_mask, use_attn_mask=attn_mask is not None))
        def fence(a):
            # block_until_ready is unreliable through the axon tunnel; a
            # one-element device_get is a true fence (pipeline._fence)
            np.asarray(jax.device_get(a[0, 0, 0]))

        with qlinear.trace_backend(backend):
            t0 = time.perf_counter()
            out = fn(params, noise, ctx, enc)
            fence(out)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = fn(params, noise, ctx, enc)
                fence(out)
                times.append(time.perf_counter() - t0)
        best = min(times)
        results[combo] = {
            "total_s": round(best, 4),
            "ms_per_step": round(best / args.steps * 1e3, 3),
            "compile_s": round(compile_s, 1),
        }
        print(f"{combo:16s} {best:.4f} s  {best/args.steps*1e3:7.2f} ms/step  "
              f"(compile {compile_s:.1f}s)", file=sys.stderr)

    print(json.dumps({"duration": args.duration, "quant": args.quant,
                      "batch": b, "frames": int(t), "steps": args.steps,
                      "combos": results}))


if __name__ == "__main__":
    main()
