#!/usr/bin/env python
"""Capture a device profile of ONE DiT Euler step and print the top ops.

The 10 s flagship step runs ~12 ms on a v5e — ~6x the q8 weight-streaming
floor — and the gap is invariant to the qmm backend (xla / pallas / cached
bf16 all measure within noise), so the cost is in the step machinery, not
dequant.  This traces the jitted `sampler._euler_step` at a chosen duration
and aggregates XLA op self-time so the real dominator can be attacked with
data (same method as tools/profile_lm_decode.py).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--quant", default="q8_0")
    ap.add_argument("--cond-tokens", type=int, default=320)
    ap.add_argument("--steps", type=int, default=8, help="steps inside the trace")
    ap.add_argument("--logdir", default="/tmp/dit_prof")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--backend", default=None, help="qmm backend override")
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
    tok = None
    if args.backend:
        tok = qlinear._trace_backend.set(args.backend)

    def build(k):
        p = dit.init_params(k, cfg, dtype=jnp.bfloat16)
        if args.quant != "bf16":
            p = quantize_tree_jax(p, args.quant)
        return dit.stack_params(p)

    params = jax.jit(build)(jax.random.key(0))
    params = qlinear.precast_quant_scales(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    t = bucket_frames(frames_for_duration(args.duration))
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.standard_normal((1, t, cfg.audio_acoustic_hidden_dim)),
                     jnp.float32)
    ctx_dim = cfg.in_channels - cfg.audio_acoustic_hidden_dim
    ctx = jnp.asarray(rng.standard_normal((1, t, ctx_dim)), jnp.float32)
    enc = jnp.asarray(
        rng.standard_normal((1, args.cond_tokens, cfg.hidden_size)), jnp.float32)

    kv = sampler._prepare_condition_kv(params, cfg, enc)
    jax.block_until_ready(jax.tree_util.tree_leaves(kv)[0])

    def step(x, i):
        return sampler._euler_step(
            params, cfg, x, 0.5, 0.4, ctx, kv, None, None)

    # compile + warm
    x = step(xt, 0)
    jax.block_until_ready(x)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        x = xt
        for i in range(args.steps):
            x = step(x, i)
        jax.block_until_ready(x)

    if tok is not None:
        qlinear._trace_backend.reset(tok)

    xs = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                          recursive=True), key=os.path.getmtime)
    if not xs:
        print("no xplane captured", file=sys.stderr)
        return 1
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xs[-1]], "trace_viewer", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    tr = json.loads(data)
    events = tr.get("traceEvents", tr if isinstance(tr, list) else [])

    name_by_pid = {}
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm.lower() or "xla" in nm.lower():
                dev_pids.add(e["pid"])
            name_by_pid[e["pid"]] = nm

    # SELF time per op name: per (pid, tid) track, nested events have their
    # children's duration subtracted (trace events are fully nested on a
    # device track), so the table sums to real busy time.  Also reports the
    # track's idle fraction (span - busy) — launch/dispatch gaps show up there.
    tracks = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        tracks.setdefault((e["pid"], e.get("tid")), []).append(e)

    agg = {}
    span = 0.0
    nlaunch = {}
    for tk, evs in tracks.items():
        t_lo = min(e["ts"] for e in evs)
        t_hi = max(e["ts"] + e.get("dur", 0) for e in evs)
        span += (t_hi - t_lo) / 1e3
    for tk, evs in tracks.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # [start, end, name, child_accum]
        def flush_until(ts):
            while stack and ts >= stack[-1][1] - 1e-9:
                s, en, nm, cd = stack.pop()
                self_ms = max(0.0, (en - s) - cd) / 1e3
                agg[nm] = agg.get(nm, 0.0) + self_ms
                nlaunch[nm] = nlaunch.get(nm, 0) + 1
                if stack:
                    stack[-1][3] += en - s
        for e in evs:
            ts, dur, nm = e["ts"], e.get("dur", 0), e.get("name", "?")
            flush_until(ts)
            stack.append([ts, ts + dur, nm, 0.0])
        flush_until(float("inf"))

    total_self = sum(agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"# device pids: {sorted(dev_pids)} "
          f"({ {p: name_by_pid.get(p) for p in sorted(dev_pids)} })")
    print(f"# device tracks: {len(tracks)}; span {span:.2f} ms; "
          f"self-time total {total_self:.2f} ms over {args.steps} steps "
          f"-> {total_self/args.steps:.3f} ms/step busy, "
          f"{(span-total_self)/args.steps:.3f} ms/step idle")
    for nm, ms in rows:
        print(f"{ms:10.3f} ms  {ms/args.steps*1000:9.1f} us/step  "
              f"x{nlaunch.get(nm,0):5d}  {nm[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
