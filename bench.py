#!/usr/bin/env python
"""Benchmark: BASELINE.json configs[0] — DiT-only text2music, 10 s clip, Q8_0
weights, 8 diffusion steps, batch=1 (style+lyric conditioning) + VAE decode.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

Baseline: the reference GGML runtime's same staged pipeline at Q8_0 runs the
10 s clip in 4.663 s infer (BASELINE.md, quant_eval_20260206_131422).
vs_baseline = baseline_seconds / our_seconds  (>1 means faster than reference).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_Q8_10S_INFER_S = 4.663


T00 = time.perf_counter()


def main():
    import os
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from acestep_tpu.pipeline import GenerationRequest, build_random_engine

    quant = "q8_0"
    duration_s = 10.0

    def log(msg):
        print(f"[bench {time.perf_counter()-T00:7.1f}s] {msg}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    log("building engine...")
    engine = build_random_engine(jax.random.key(0), quant=quant)
    rng = np.random.default_rng(0)
    req = GenerationRequest(
        duration_s=duration_s,
        style_token_ids=rng.integers(0, 150000, (1, 64)),
        lyric_token_ids=rng.integers(0, 150000, (1, 256)),
        seeds=[1],
    )
    build_s = time.perf_counter() - t0
    log(f"engine built in {build_s:.1f}s; warmup generate (compiles)...")

    # warmup (compile) — fenced, so its phase breakdown is accurate
    res = engine.generate(req)
    warm_s = res.time_costs["total_time_cost"]
    log(f"warmup done in {warm_s:.1f}s: {res.time_costs}")
    fenced = engine.generate(req)                  # warm fenced run for detail
    log(f"fenced warm run: {fenced.time_costs}")

    # timed runs: phase fences off — each fence is a host-device roundtrip
    # (~30 ms on the dev tunnel) that is pure measurement overhead; the
    # total_time_cost stays exact (the audio fetch is the closing sync)
    os.environ["ACESTEP_TPU_PHASE_FENCES"] = "0"
    runs = []
    for i in range(3):
        req.seeds = [i + 2]
        res = engine.generate(req)
        runs.append(res.time_costs["total_time_cost"])
        log(f"run {i}: total {res.time_costs['total_time_cost']:.4f}s")
    value = float(np.median(runs))
    res = fenced

    result = {
        "metric": "seconds per 10s clip, text2music E2E (text-enc + 8-step DiT + VAE), Q8_0, batch=1",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_Q8_10S_INFER_S / value, 3),
    }
    # regression tripwire: compare against the best prior round's number so a
    # real regression is loud.  The dev tunnel's day-to-day throughput varies
    # +/-20-35% (same binary, same cache), so only flag beyond that band.
    prior = _best_prior_bench()
    if prior is not None:
        result["vs_prior"] = round(prior / value, 3)
        if value > prior * 1.35:
            print(
                f"[bench] WARNING: {value:.4f}s is >35% slower than the best "
                f"prior round ({prior:.4f}s) — beyond tunnel variance; "
                f"investigate before shipping",
                file=sys.stderr, flush=True,
            )
    detail = {
        "backend": jax.default_backend(),
        "build_s": round(build_s, 2),
        "compile_run_s": round(warm_s, 2),
        "runs_s": [round(r, 4) for r in runs],
        "diffusion_s": round(res.time_costs["diffusion_time_cost"], 4),
        "vae_s": round(res.time_costs["vae_time_cost"], 4),
        # compute-only vs device->host fetch split: the fetch rides the dev
        # tunnel (~MB/s) here but PCIe (~GB/s) on a real host, so the compute
        # number is the cross-host-comparable one
        "vae_compute_s": round(res.time_costs.get("vae_compute_time_cost", 0.0), 4),
        "audio_fetch_s": round(res.time_costs.get("audio_fetch_time_cost", 0.0), 4),
        "condition_s": round(res.time_costs["condition_time_cost"], 4),
        "vae_overlapped": bool(res.time_costs.get("vae_overlapped")),
    }
    # per-phase roofline (VERDICT r4 item 2): achieved GB/s + TFLOP/s against
    # the chip's HBM/MXU peaks, from the fenced run's phase times and the
    # analytic byte/FLOP accounting (acestep_tpu.roofline)
    try:
        from acestep_tpu import roofline as R
        from acestep_tpu.pipeline import bucket_frames, frames_for_duration

        frames = bucket_frames(frames_for_duration(duration_s))
        dit_pt = R.RooflinePoint(
            phase="dit_step", chip=R.detect_chip(),
            time_s=res.time_costs["diffusion_time_cost"] / 8,
            bytes_=R.dit_step_weight_bytes(engine.dit_params),
            flops=R.dit_step_flops(engine.dit_cfg, frames, 320),
        )
        detail["roofline_dit_step"] = dit_pt.summary()
        detail["latents_per_s_chip"] = round(frames / value, 1)
        result["latents_per_s_chip"] = detail["latents_per_s_chip"]
    except Exception as e:   # roofline is reporting, never a bench failure
        detail["roofline_error"] = str(e)
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(result))


def _best_prior_bench():
    """Best (lowest) value across committed BENCH_r*.json files, if any."""
    import glob
    import os

    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            with open(path) as f:
                data = json.load(f)
            v = data.get("parsed", {}).get("value")
            if isinstance(v, (int, float)) and v > 0:
                best = v if best is None else min(best, v)
        except Exception:
            continue
    return best


if __name__ == "__main__":
    main()
