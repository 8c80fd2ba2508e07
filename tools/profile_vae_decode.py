#!/usr/bin/env python
"""VAE decode kernel-time breakdown + f32-vs-bf16 decision data (VERDICT r4
item 5: the north star says fused/faster VAE convs; publish where decode time
actually goes and measure the two cheap levers).

Per-stage timing: each decoder stage (conv1, every up-block's convT and
res-unit trio, the final full-rate conv) is timed as its own jitted program at
the REAL activation shapes of a 512-frame decode window, so the table says
which stage the 1.19 s of configs[2] VAE time lives in.  Reference analog:
ACE_GGML_VAE_PROFILE per-op dumps (acestep_ggml.cpp:943-963).

A/B: full fused decode of a 120 s latent with f32 params vs bf16 params
(ACESTEP_TPU_VAE_DTYPE=bf16 — convs in bf16, Snake internally f32), reporting
wall time and the waveform delta of bf16 vs the f32 output at the int16 WAV
precision the pipeline actually emits.  The decision gate: ship bf16 as
default only if cosine >= 0.999 and snr >= 40 dB vs f32 (inaudible next to
the 16-bit floor).
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=512, help="latent frames per window")
    ap.add_argument("--duration", type=float, default=120.0, help="A/B song length")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stages", action="store_true", help="per-stage table")
    ap.add_argument("--ab", action="store_true", help="f32 vs bf16 full decode")
    args = ap.parse_args()
    if not (args.stages or args.ab):
        args.stages = args.ab = True

    import jax

    cache = _os.path.abspath(".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from acestep_tpu.config import VAEConfig
    from acestep_tpu.models import vae

    cfg = VAEConfig()
    rows = []

    def log(m):
        print(f"[vae_profile] {m}", file=_sys.stderr, flush=True)

    def fence(x):
        np.asarray(jax.device_get(jnp.ravel(x)[0:1]))

    def bench(fn, *xs):
        f = jax.jit(fn)
        fence(f(*xs))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fence(f(*xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    if args.stages:
        import math

        params = jax.jit(lambda k: vae.init_params(k, cfg))(jax.random.key(0))
        p = params["decoder"]
        rng = np.random.default_rng(0)
        t_lat = args.window
        ch = cfg.decoder_channels
        cm = (1,) + tuple(cfg.channel_multiples)
        strides = cfg.upsampling_ratios

        # walk the decoder once, timing each stage at its real input shape
        x = jnp.asarray(rng.standard_normal(
            (1, t_lat, cfg.decoder_input_channels)) * 0.1, jnp.float32)
        t0 = bench(lambda xx: vae.conv1d(xx, p["conv1"]["w"], p["conv1"].get("b"),
                                         padding=3), x)
        rows.append({"stage": "conv1 64->2048 k7", "ms": round(t0 * 1e3, 3),
                     "len_in": int(x.shape[1])})
        x = jax.jit(lambda xx: vae.conv1d(xx, p["conv1"]["w"], p["conv1"].get("b"),
                                          padding=3))(x)
        for i, s in enumerate(strides):
            blk = p["blocks"][i]
            cin = ch * cm[len(strides) - i]
            cout = ch * cm[len(strides) - i - 1]
            tc = bench(lambda xx, b=blk, ss=s: vae.conv_transpose1d(
                vae.snake(xx, **b["snake1"]), b["conv_t1"]["w"],
                b["conv_t1"].get("b"), stride=ss,
                padding=math.ceil(ss / 2)), x)
            rows.append({"stage": f"block{i} convT {cin}->{cout} s{s}",
                         "ms": round(tc * 1e3, 3), "len_in": int(x.shape[1])})
            x = jax.jit(lambda xx, b=blk, ss=s: vae.conv_transpose1d(
                vae.snake(xx, **b["snake1"]), b["conv_t1"]["w"],
                b["conv_t1"].get("b"), stride=ss,
                padding=math.ceil(ss / 2)))(x)

            def res3(xx, b=blk):
                y = vae._res_unit(b["res1"], xx, 1)
                y = vae._res_unit(b["res2"], y, 3)
                return vae._res_unit(b["res3"], y, 9)

            tr = bench(res3, x)
            rows.append({"stage": f"block{i} res x3 {cout}ch",
                         "ms": round(tr * 1e3, 3), "len_in": int(x.shape[1])})
            x = jax.jit(res3)(x)
        tf = bench(lambda xx: vae.conv1d(
            vae.snake(xx, **p["snake1"]), p["conv2"]["w"], None, padding=3), x)
        rows.append({"stage": "final snake+conv2 128->2 k7",
                     "ms": round(tf * 1e3, 3), "len_in": int(x.shape[1])})
        total = sum(r["ms"] for r in rows)
        log(f"stage total {total:.1f} ms for one {t_lat}-frame window")
        print("| stage | input len | ms | % |", file=_sys.stderr)
        print("|---|---:|---:|---:|", file=_sys.stderr)
        for r in rows:
            print(f"| {r['stage']} | {r['len_in']} | {r['ms']} "
                  f"| {100 * r['ms'] / total:.1f}% |", file=_sys.stderr)
        del params

    if args.ab:
        from acestep_tpu.pipeline import frames_for_duration

        frames = frames_for_duration(args.duration)
        lat = jnp.asarray(np.random.default_rng(1).standard_normal(
            (1, frames, cfg.decoder_input_channels)) * 0.1, jnp.float32)

        out = {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            params = jax.jit(lambda k: vae.init_params(k, cfg, dtype=dt))(
                jax.random.key(0))
            fn = lambda: vae.fused_tiled_decode_int16(
                params, cfg, lat, chunk_frames=512, max_window_batch=4)
            i16, scale = fn()
            fence(i16)
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fence(fn()[0])
                ts.append(time.perf_counter() - t0)
            audio = (np.asarray(jax.device_get(i16), np.float32)
                     / float(jax.device_get(scale)))
            out[name] = (min(ts), audio)
            log(f"{name}: {min(ts):.3f}s")
            del params

        from acestep_tpu.eval_metrics import waveform_metrics

        a, b = out["f32"][1], out["bf16"][1]
        m = waveform_metrics(a.reshape(1, -1, 2), b.reshape(1, -1, 2))
        ab = {
            "metric": "vae_decode_f32_vs_bf16",
            "duration_s": args.duration,
            "f32_s": round(out["f32"][0], 4),
            "bf16_s": round(out["bf16"][0], 4),
            "speedup": round(out["f32"][0] / out["bf16"][0], 3),
            "bf16_vs_f32": {k: round(float(v), 6) for k, v in m.items()},
            "gate": {"cosine_min": 0.999, "snr_min_db": 40.0,
                     "passes": bool(m["cosine"] >= 0.999 and m["snr_db"] >= 40.0)},
        }
        rows.append(ab)
        log(ab)

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
