#!/usr/bin/env python
"""LM decode microbench: ms/token for the serving decode scan.

Measures the int8-KV scan decode (serving/lm.py) on a Qwen3 planner at the
code-generation shape: prefill a prompt, then time a fixed-length decode scan
and report ms/token at several batch sizes.  The reference's planner phase on
CUDA streams ~3000 code tokens per song (llm_inference.py:1252-1330); decode
throughput bounds the codes phase for every request.

Prints one JSON line:
  {"metric": "lm_decode_ms_per_token", "value": ..., "detail": {...}}
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
    ap.add_argument("--model", default="0.6b", choices=["0.6b", "1.7b", "4b"])
    ap.add_argument("--quant", default="q8_0")
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--new-tokens", type=int, default=512)
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top-p", type=float, default=0.95)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from acestep_tpu.config import QWEN3_0_6B, QWEN3_1_7B, QWEN3_4B
    from acestep_tpu.models import qwen
    from acestep_tpu.quant import quantize_tree_jax
    from acestep_tpu.serving import lm as lm_serving

    T0 = time.time()

    def log(m):
        print(f"[lm_bench {time.time()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)

    cfg = {"0.6b": QWEN3_0_6B, "1.7b": QWEN3_1_7B, "4b": QWEN3_4B}[args.model]
    log(f"init {args.model} ({args.quant}) ...")

    def build(k):
        p = qwen.init_params(k, cfg, dtype=jnp.bfloat16)
        if args.quant != "bf16":
            p = quantize_tree_jax(p, args.quant)   # BEFORE stacking: the quant
            # policy only takes 2-D kernels (stacked [L,K,N] would pass through
            # unquantized — silent bf16 bench)
        return qwen.stack_params(p)

    params = jax.jit(build)(jax.random.key(0))
    params = lm_serving.ensure_quantized_head(params)
    if os.environ.get("ACESTEP_TPU_LM_FUSE", "1") != "0":
        params = lm_serving.fuse_serving_params(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])

    sp = lm_serving.SamplingParams(
        max_new_tokens=args.new_tokens, temperature=args.temperature,
        top_p=args.top_p,
        eos_token=None,  # never stop early -> full-length scan (worst case)
    )

    detail = {}
    rng = np.random.default_rng(0)
    for b in [int(x) for x in args.batches.split(",")]:
        ids = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (b, args.prompt_len)), jnp.int32)
        lengths = jnp.full((b,), args.prompt_len, jnp.int32)
        key = jax.random.key(1)

        log(f"batch {b}: compile ...")
        toks, n = lm_serving.generate(params, cfg, ids, lengths, key, sp)
        np.asarray(n)                                  # sync
        t0 = time.perf_counter()
        runs = 3
        for i in range(runs):
            toks, n = lm_serving.generate(
                params, cfg, ids, lengths, jax.random.key(2 + i), sp)
        np.asarray(n)
        dt = (time.perf_counter() - t0) / runs
        ms_tok = dt / args.new_tokens * 1000.0
        per_seq = ms_tok / 1.0
        log(f"batch {b}: {dt:.3f}s for prefill+{args.new_tokens} tok "
            f"-> {ms_tok:.3f} ms/step, {b * args.new_tokens / dt:.0f} tok/s aggregate")
        detail[f"b{b}"] = {
            "wall_s": round(dt, 4),
            "ms_per_step": round(ms_tok, 4),
            "tok_per_s_aggregate": round(b * args.new_tokens / dt, 1),
        }

    out = {
        "metric": f"lm_decode_ms_per_token_{args.model}_{args.quant}",
        "value": detail["b1"]["ms_per_step"] if "b1" in detail else None,
        "unit": "ms/token (b=1, incl. prefill amortized)",
        "prompt_len": args.prompt_len,
        "new_tokens": args.new_tokens,
        "detail": detail,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
