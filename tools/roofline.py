#!/usr/bin/env python
"""Measured per-phase rooflines: DiT Euler step, VAE decode, LM decode.

For each hot phase: measure wall time at flagship shapes, convert to achieved
GB/s + TFLOP/s via the analytic byte/FLOP accounting in acestep_tpu.roofline,
and print %-of-roof against the detected chip's HBM/MXU peaks.  Emits one
JSON line per phase plus a markdown table on stderr (pasted into
docs/BENCHMARK.md).

Reference anchor: BASELINE.json "latents/s/chip" + north-star
"speed-of-light per chip"; the GGML analog prints raw ms only
(ACE_GGML_DIT_PROFILE, acestep_ggml.cpp:1457-1477).
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
    ap.add_argument("--phases", default="dit,vae,lm")
    ap.add_argument("--dit-duration", type=float, default=10.0)
    ap.add_argument("--dit-quant", default="q8_0")
    ap.add_argument("--vae-duration", type=float, default=120.0)
    ap.add_argument("--lm-tokens", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cond-tokens", type=int, default=320)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from acestep_tpu import roofline as R
    from acestep_tpu import sampler
    from acestep_tpu.config import QWEN3_0_6B, DiTConfig, VAEConfig
    from acestep_tpu.models import dit, qwen, vae
    from acestep_tpu.ops import qlinear
    from acestep_tpu.pipeline import bucket_frames, frames_for_duration
    from acestep_tpu.quant import quantize_tree_jax

    chip = R.detect_chip()
    rows = []

    def log(m):
        print(f"[roofline] {m}", file=sys.stderr, flush=True)

    def fence(a):
        np.asarray(jax.device_get(jnp.ravel(a)[0:1]))

    phases = {p.strip() for p in args.phases.split(",")}

    if "dit" in phases:
        cfg = DiTConfig()
        log(f"DiT step: {args.dit_duration:.0f}s {args.dit_quant} ...")

        def build(k):
            p = dit.init_params(k, cfg, dtype=jnp.bfloat16)
            p = quantize_tree_jax(p, args.dit_quant)
            return dit.stack_params(p)

        params = qlinear.precast_quant_scales(
            dit.fuse_params(jax.jit(build)(jax.random.key(0))))
        t = bucket_frames(frames_for_duration(args.dit_duration))
        rng = np.random.default_rng(0)
        noise = jnp.asarray(rng.standard_normal(
            (1, t, cfg.audio_acoustic_hidden_dim)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, t, cfg.context_dim)), jnp.float32)
        enc = jnp.asarray(rng.standard_normal(
            (1, args.cond_tokens, cfg.hidden_size)), jnp.float32)
        schedule = sampler.get_timestep_schedule(3.0)
        fn = jax.jit(lambda p, n, c, e: sampler.sample_latents(
            p, cfg, n, c, e, None, schedule))
        fence(fn(params, noise, ctx, enc))          # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fence(fn(params, noise, ctx, enc))
            times.append(time.perf_counter() - t0)
        step_s = min(times) / len(schedule)
        pt = R.RooflinePoint(
            phase=f"dit_step_{args.dit_duration:.0f}s_{args.dit_quant}",
            time_s=step_s,
            bytes_=R.dit_step_weight_bytes(params),
            flops=R.dit_step_flops(cfg, t, args.cond_tokens),
            chip=chip,
        )
        s = pt.summary()
        s["latents_per_s_chip"] = round(
            t / (min(times)), 1)   # latent frames per wall second (8 steps)
        rows.append(s)
        log(s)

    if "vae" in phases:
        vcfg = VAEConfig()
        frames = frames_for_duration(args.vae_duration)
        log(f"VAE decode: {args.vae_duration:.0f}s ({frames} frames) ...")
        vp = jax.jit(lambda k: vae.init_params(k, vcfg))(jax.random.key(1))
        lat = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, frames, 64)) * 0.1,
            jnp.float32)
        chunk = 512
        fn = lambda: vae.fused_tiled_decode_int16(vp, vcfg, lat,
                                                  chunk_frames=chunk,
                                                  max_window_batch=4)
        fence(fn()[1])                               # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fence(fn()[1])
            times.append(time.perf_counter() - t0)
        # account the whole window plan (overlap windows redo seam frames)
        windows = (vae._window_plan(frames, chunk, None)
                   if chunk < frames else [(0, frames, 0, frames)])
        fl = sum(R.vae_decode_flops(vcfg, we - ws) for _, _, ws, we in windows)
        by = sum(R.vae_decode_act_bytes(vcfg, we - ws)
                 for _, _, ws, we in windows)
        pt = R.RooflinePoint(
            phase=f"vae_decode_{args.vae_duration:.0f}s_f32",
            time_s=min(times), bytes_=by, flops=fl, chip=chip)
        s = pt.summary()
        s["audio_s_per_wall_s"] = round(args.vae_duration / min(times), 1)
        rows.append(s)
        log(s)

    if "lm" in phases:
        from acestep_tpu.serving import lm as lm_serving
        from acestep_tpu.serving.lm import SamplingParams, generate

        lcfg = QWEN3_0_6B
        log(f"LM decode: 0.6B q8_0, {args.lm_tokens} tokens b=1 ...")

        def build_lm(k):
            p = qwen.init_params(k, lcfg, dtype=jnp.bfloat16)
            p = quantize_tree_jax(p, "q8_0")
            return qwen.stack_params(p)

        lp = jax.jit(build_lm)(jax.random.key(2))
        lp = lm_serving.ensure_quantized_head(lp)
        lp = lm_serving.fuse_serving_params(lp)
        ids = jnp.asarray(np.random.default_rng(2).integers(
            1, 1000, (1, 128)), jnp.int32)
        lens = jnp.asarray([128], jnp.int32)
        sp = SamplingParams(temperature=0.0, max_new_tokens=args.lm_tokens,
                            stop_tokens=())
        fence(generate(lp, lcfg, ids, lens, jax.random.key(0), sp)[0])
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fence(generate(lp, lcfg, ids, lens, jax.random.key(0), sp)[0])
            times.append(time.perf_counter() - t0)
        per_tok = min(times) / args.lm_tokens
        from acestep_tpu.serving import kv_cache as kvc

        cache_len = kvc.round_len(128 + args.lm_tokens + 1)
        pt = R.RooflinePoint(
            phase="lm_decode_0.6B_q8_0_b1",
            time_s=per_tok,
            bytes_=R.lm_decode_bytes(lp, lcfg, cache_len=cache_len),
            flops=2 * R.tree_quant_bytes(lp),    # ~2 FLOPs per weight byte(q8)
            chip=chip)
        s = pt.summary()
        s["tokens_per_s_chip"] = round(1.0 / per_tok, 1)
        s["ms_per_token"] = round(per_tok * 1e3, 3)
        rows.append(s)
        log(s)

    # markdown table for docs/BENCHMARK.md
    hdr = ("| phase | time | GB/s | TFLOP/s | % HBM roof | % MXU roof | "
           "bound |")
    print(hdr, file=sys.stderr)
    print("|---|---|---|---|---|---|---|", file=sys.stderr)
    for s in rows:
        print(f"| {s['phase']} | {s['time_ms']} ms | {s['GB_s']} | "
              f"{s['TFLOP_s']} | {s['pct_hbm_roof']}% | {s['pct_mxu_roof']}% "
              f"| {s['bound']} |", file=sys.stderr)
    for s in rows:
        print(json.dumps(s))


if __name__ == "__main__":
    main()
