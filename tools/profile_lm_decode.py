#!/usr/bin/env python
"""Capture a device profile of the LM decode scan and print the top ops.

Traces a short decode scan with jax.profiler, converts the xplane via
xprof/tensorboard_plugin_profile, and aggregates self-time by op name so the
decode serial chain can be attacked with data instead of guesses.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="0.6b")
    ap.add_argument("--quant", default="q8_0")
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--logdir", default="/tmp/lm_prof")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from acestep_tpu.config import QWEN3_0_6B, QWEN3_1_7B, QWEN3_4B
    from acestep_tpu.models import qwen
    from acestep_tpu.quant import quantize_tree_jax
    from acestep_tpu.serving import lm as lm_serving

    cfg = {"0.6b": QWEN3_0_6B, "1.7b": QWEN3_1_7B, "4b": QWEN3_4B}[args.model]

    def build(k):
        p = qwen.init_params(k, cfg, dtype=jnp.bfloat16)
        if args.quant != "bf16":
            p = quantize_tree_jax(p, args.quant)   # before stacking (2-D policy)
        return qwen.stack_params(p)

    params = jax.jit(build)(jax.random.key(0))
    params = lm_serving.ensure_quantized_head(params)
    if os.environ.get("ACESTEP_TPU_LM_FUSE", "1") != "0":
        params = lm_serving.fuse_serving_params(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    sp = lm_serving.SamplingParams(
        max_new_tokens=args.new_tokens, temperature=1.0, top_p=0.95,
        eos_token=None)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (args.batch, args.prompt_len)), jnp.int32)
    lengths = jnp.full((args.batch,), args.prompt_len, jnp.int32)

    # compile + warm
    toks, n = lm_serving.generate(params, cfg, ids, lengths, jax.random.key(1), sp)
    np.asarray(n)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        toks, n = lm_serving.generate(params, cfg, ids, lengths, jax.random.key(2), sp)
        np.asarray(n)

    # ---- parse the xplane into trace events json ----
    xs = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                          recursive=True), key=os.path.getmtime)
    if not xs:
        print("no xplane captured", file=sys.stderr)
        return 1
    xplane = xs[-1]
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], "trace_viewer", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
    tr = json.loads(data)
    events = tr.get("traceEvents", tr if isinstance(tr, list) else [])

    # find TPU device pids (XLA Ops rows)
    name_by_pid_tid = {}
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm.lower() or "xla" in nm.lower():
                dev_pids.add(e["pid"])
            name_by_pid_tid[e["pid"]] = nm

    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        nm = e.get("name", "?")
        agg[nm] = agg.get(nm, 0.0) + dur
        total += dur

    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"# device pids: {sorted(dev_pids)} "
          f"({ {p: name_by_pid_tid.get(p) for p in sorted(dev_pids)} })")
    print(f"# total device-op time {total:.2f} ms over {args.new_tokens} steps "
          f"({total/args.new_tokens:.3f} ms/step if one row per device)")
    for nm, ms in rows:
        print(f"{ms:10.3f} ms  {ms/args.new_tokens*1000:9.1f} us/step  {nm[:120]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
