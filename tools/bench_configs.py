#!/usr/bin/env python
"""BASELINE.json configs[1] and configs[3] benches (driver-verifiable rows).

configs[1]: DiT + VAE decode end-to-end, 60 s song, Q4_0 weights, batch=1.
configs[3]: batch=8 continuous-batching mixed-duration requests, Q4_K DiT+VAE
            — real ContinuousBatcher in front of the real engine (not a fake
            run_fn), mixed 10-60 s durations sharing frame buckets.

Prints one JSON line per config:
  {"metric": ..., "value": seconds, "unit": "s", "detail": {...}}
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
    ap.add_argument("--configs", default="1,3",
                    help="comma list of: 1 (60s q4_0 E2E), 3 (batch-8 mixed "
                         "CB), 600 (single 600s request), base (50-step CFG "
                         "base-model row)")
    ap.add_argument("--mix", default="full", choices=("short", "full"),
                    help="configs[3] duration mix: short=10-60s (round-4 row),"
                         " full=10-600s (the BASELINE.json configs[3] spec)")
    ap.add_argument("--pad-ratio", type=float, default=2.5,
                    help="configs[3] batcher pad_ratio (1.0 = same-bucket merges only)")
    ap.add_argument("--out", default=None, help="append JSON lines to this file")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from acestep_tpu.pipeline import GenerationRequest, build_random_engine

    rows = []
    wanted = {c.strip() for c in args.configs.split(",")}

    def log(m):
        print(f"[bench_configs] {m}", file=sys.stderr, flush=True)

    if "1" in wanted:
        log("configs[1]: 60s Q4_0 E2E, batch=1 ...")
        engine = build_random_engine(jax.random.key(0), quant="q4_0")
        rng = np.random.default_rng(0)
        req = GenerationRequest(
            duration_s=60.0,
            style_token_ids=rng.integers(0, 150000, (1, 64)),
            lyric_token_ids=rng.integers(0, 150000, (1, 256)),
            seeds=[1],
        )
        engine.generate(req)                       # compile
        times = []
        for _ in range(3):
            res = engine.generate(req)
            times.append(res.time_costs["total_time_cost"])
        best = min(times)
        rows.append({
            "metric": "configs1_60s_q4_0_e2e", "value": round(best, 4),
            "unit": "s", "detail": {k: round(v, 4) for k, v in res.time_costs.items()},
        })
        log(f"configs[1]: {best:.3f}s  ({res.time_costs})")
        del engine

    if "3" in wanted:
        log(f"configs[3]: batch-8 mixed-duration ({args.mix}) continuous "
            "batching, Q4_K ...")
        from acestep_tpu.serving.batcher import ContinuousBatcher

        engine = build_random_engine(jax.random.key(0), quant="q4_k")
        rng = np.random.default_rng(1)
        style = rng.integers(0, 150000, (1, 64))
        if args.mix == "short":
            durations = [10.0, 10.2, 20.0, 20.5, 30.0, 30.1, 60.0, 58.0]
        else:
            # the BASELINE.json spec: 10s-600s in one batch — same-bucket
            # pairs merge; the 300/600 s tails exercise segmented decode
            durations = [10.0, 10.2, 30.0, 30.5, 60.0, 120.0, 300.0, 600.0]

        # warm the shape buckets (one compile per frame bucket)
        for d in sorted(set(round(dd) for dd in durations)):
            engine.generate(GenerationRequest(
                duration_s=float(d), style_token_ids=style, seeds=[0]))

        batcher = ContinuousBatcher(engine.generate, max_batch=8, max_wait_s=0.3,
                                    pad_ratio=args.pad_ratio,
                                    max_batch_for=engine.max_batch_for_frames)
        batcher.start()
        try:
            # two passes: pass 1 compiles the merged-batch shapes (the
            # per-duration warmup above is batch=1; the batcher merges same-
            # bucket requests into batch>=2 calls), pass 2 is the steady state
            walls = []
            for _pass in range(2):
                t0 = time.perf_counter()
                futs = [
                    batcher.submit(GenerationRequest(
                        duration_s=d, style_token_ids=style, seeds=[i]))
                    for i, d in enumerate(durations)
                ]
                results = [f.result(timeout=3600) for f in futs]
                walls.append(time.perf_counter() - t0)
            wall = walls[-1]
        finally:
            batcher.stop()
        total_audio_s = sum(d for d in durations)
        rows.append({
            "metric": f"configs3_batch8_mixed_cb_{args.mix}",
            "value": round(wall, 4),
            "unit": "s",
            "detail": {
                "requests": len(durations),
                "durations_s": durations,
                "total_audio_s": total_audio_s,
                "audio_s_per_wall_s": round(total_audio_s / wall, 2),
                "cold_wall_s": round(walls[0], 4),
                "batches": batcher.stats["batches"],
                "merged_sizes": list(batcher.stats["merged_sizes"]),
            },
        })
        log(f"configs[3]: {wall:.3f}s wall for {total_audio_s}s of audio "
            f"({batcher.stats})")
        for r in results:
            assert np.isfinite(r.audio).all()
        del engine

    if "600" in wanted:
        # single 600 s request: 15104-frame bucket, ~8-segment overlapped
        # decode — the longest path the reference supports (constants.py:60)
        log("600s single request: Q4_K E2E, batch=1 ...")
        engine = build_random_engine(jax.random.key(0), quant="q4_k")
        rng = np.random.default_rng(2)
        req = GenerationRequest(
            duration_s=600.0,
            style_token_ids=rng.integers(0, 150000, (1, 64)),
            lyric_token_ids=rng.integers(0, 150000, (1, 256)),
            seeds=[4],
        )
        engine.generate(req)                       # compile
        times, res = [], None
        for _ in range(3):
            res = engine.generate(req)
            times.append(res.time_costs["total_time_cost"])
        best = min(times)
        rows.append({
            "metric": "single_600s_q4_k_e2e", "value": round(best, 4),
            "unit": "s",
            "detail": {k: round(v, 4) for k, v in res.time_costs.items()},
        })
        log(f"600s: {best:.3f}s  ({res.time_costs})")
        del engine

    if "base" in wanted:
        # base-model path: 50-step shifted schedule + CFG (handler.py:2550
        # guidance surface; README.md:199-204 base 50-step row)
        log("base-model 50-step CFG row: 30s Q8_0, guidance 7.0 ...")
        engine = build_random_engine(jax.random.key(0), quant="q8_0")
        rng = np.random.default_rng(3)
        req = GenerationRequest(
            duration_s=30.0,
            style_token_ids=rng.integers(0, 150000, (1, 64)),
            lyric_token_ids=rng.integers(0, 150000, (1, 256)),
            uncond_style_token_ids=rng.integers(0, 150000, (1, 16)),
            guidance_scale=7.0, infer_steps=50,
            cfg_interval_start=0.0, cfg_interval_end=1.0,
            seeds=[5],
        )
        engine.generate(req)                       # compile
        times, res = [], None
        for _ in range(3):
            res = engine.generate(req)
            times.append(res.time_costs["total_time_cost"])
        best = min(times)
        rows.append({
            "metric": "base_model_50step_cfg_30s_q8_0", "value": round(best, 4),
            "unit": "s",
            "detail": {k: round(v, 4) for k, v in res.time_costs.items()},
        })
        log(f"base 50-step: {best:.3f}s  ({res.time_costs})")
        del engine

    for row in rows:
        print(json.dumps(row))
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
