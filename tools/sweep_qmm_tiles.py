#!/usr/bin/env python
"""Sweep pallas qmm tile shapes (BN, BK) on the real chip at given GEMM shapes.

Uses the ACESTEP_TPU_QMM_BN/_BK overrides in ops/pallas/qmm.py; clears jit
caches between points so each (bn, bk) actually retraces.  Prints a table of
us/call per point plus the XLA-dequant baseline, so the tile pickers
(_pick_bn/_pick_q8_bk) can be tuned with data instead of theory.

Usage:
  python tools/sweep_qmm_tiles.py --m 128 --fmt q8_0 \
      --shapes 2048x4096,2048x2048,2048x12288,6144x2048
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--fmt", default="q8_0")
    ap.add_argument("--shapes", default="2048x4096,2048x2048,2048x12288,6144x2048")
    ap.add_argument("--bns", default="256,512,1024,2048")
    ap.add_argument("--bks", default="256,512,1024,2048")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--stacked", action="store_true",
                    help="time qmm_pallas_stacked (L=24) instead of qmm_pallas")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from acestep_tpu.ops.pallas import qmm
    from acestep_tpu.quant import dequantize, quantize_jax

    shapes = [tuple(int(v) for v in s.split("x")) for s in args.shapes.split(",")]
    bns = [int(v) for v in args.bns.split(",")]
    bks = [int(v) for v in args.bks.split(",")]
    if args.fmt != "q8_0":
        bks = [b for b in bks if b % qmm.Q4_BK == 0] or [qmm.Q4_BK]

    rng = np.random.default_rng(0)
    L = 24 if args.stacked else 1

    for (k, n) in shapes:
        w = jnp.asarray(rng.standard_normal((L, k, n) if args.stacked else (k, n)),
                        jnp.float32)
        qt = jax.jit(lambda a: quantize_jax(a, args.fmt))(w)
        if args.stacked:
            import dataclasses as dc
            # quantize_jax on [L,K,N]? quantize per-layer then stack fields
            qts = [jax.jit(lambda a: quantize_jax(a, args.fmt))(w[i]) for i in range(L)]
            fields = {}
            for f in dc.fields(qts[0]):
                vals = [getattr(q, f.name) for q in qts]
                if isinstance(vals[0], jax.Array):
                    fields[f.name] = jnp.stack(vals)
                else:
                    fields[f.name] = vals[0]
            qt = dc.replace(qts[0], **fields)
        x = jnp.asarray(rng.standard_normal((args.m, k)), jnp.bfloat16)
        jax.block_until_ready(x)

        # XLA baseline
        def xla_fn(x, qt):
            wd = dequantize(qt if not args.stacked else qmm._index_qt_fields(qt, 0),
                            dtype=jnp.bfloat16)
            return jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        f = jax.jit(xla_fn)
        y = f(x, qt); jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = f(x, qt)
        jax.block_until_ready(y)
        base_us = (time.perf_counter() - t0) / args.iters * 1e6

        wbytes = qt.nbytes // L
        floor_us = wbytes / 800e9 * 1e6  # ~800 GB/s v5e HBM
        print(f"\n== m={args.m} k={k} n={n} {args.fmt} "
              f"(weights {wbytes/1e6:.1f} MB, stream floor ~{floor_us:.0f} us) ==")
        print(f"  xla-dequant baseline: {base_us:8.1f} us")

        for bn in bns:
            if n % bn:
                continue
            for bk in bks:
                if k % bk:
                    continue
                os.environ["ACESTEP_TPU_QMM_BN"] = str(bn)
                os.environ["ACESTEP_TPU_QMM_BK"] = str(bk)
                jax.clear_caches()
                try:
                    if args.stacked:
                        fn = jax.jit(lambda x, qt: qmm.qmm_pallas_stacked(
                            x, qt, jnp.int32(1)))
                    else:
                        fn = jax.jit(lambda x, qt: qmm.qmm_pallas(x, qt))
                    y = fn(x, qt); jax.block_until_ready(y)
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        y = fn(x, qt)
                    jax.block_until_ready(y)
                    us = (time.perf_counter() - t0) / args.iters * 1e6
                    bm = qmm._pick_bm(args.m)
                    steps = (max(args.m, bm) // bm) * (n // bn) * (k // bk)
                    print(f"  bn={bn:5d} bk={bk:5d}: {us:8.1f} us  ({steps:4d} grid steps)")
                except Exception as e:
                    print(f"  bn={bn:5d} bk={bk:5d}: FAIL {type(e).__name__}: {str(e)[:90]}")
                finally:
                    os.environ.pop("ACESTEP_TPU_QMM_BN", None)
                    os.environ.pop("ACESTEP_TPU_QMM_BK", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
