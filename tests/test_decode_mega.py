"""Whole-model decode megakernel vs the default layer-scan decode_step.

Runs the pallas kernel under TPU interpret mode on CPU (correctness only —
the performance measurement lives in tools/bench_lm_decode.py --mega and
docs/BENCHMARK.md's round-4 megakernel study)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen
from acestep_tpu.quant import quantize_tree_jax
from acestep_tpu.serving import lm as lm_serving
from acestep_tpu.serving.kv_cache import init_cache

CFG = QwenConfig(hidden_size=1024, num_hidden_layers=2, num_attention_heads=16,
                 num_key_value_heads=8, intermediate_size=3072, vocab_size=2048)
T_MAX = 512


def _params():
    def build(k):
        p = qwen.init_params(k, CFG, dtype=jnp.bfloat16)
        p = quantize_tree_jax(p, "q8_0")
        return qwen.stack_params(p)

    params = jax.jit(build)(jax.random.key(0))
    params = lm_serving.ensure_quantized_head(params)
    return lm_serving.fuse_serving_params(params)


@pytest.mark.parametrize("b", [1, 4])
def test_megakernel_matches_scan_decode(b, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    params = _params()
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, 2000, (b, 37)), jnp.int32)
    cache = init_cache(CFG.num_hidden_layers, b, CFG.num_key_value_heads,
                       T_MAX, CFG.head_dim)
    lengths = jnp.full((b,), prompt.shape[1], jnp.int32)
    _, cache = jax.jit(
        lambda p, t, ln, c: lm_serving.prefill(p, CFG, t, ln, c)
    )(params, prompt, lengths, cache)
    tok = jnp.asarray(rng.integers(1, 2000, (b,)), jnp.int32)

    monkeypatch.setenv("ACESTEP_TPU_DECODE_MEGA", "0")
    ref_logits, ref_cache = jax.jit(
        lambda p, c, t: lm_serving.decode_step(p, CFG, c, t))(params, cache, tok)
    ref_logits = np.asarray(ref_logits)

    monkeypatch.setenv("ACESTEP_TPU_DECODE_MEGA", "1")
    with pltpu.force_tpu_interpret_mode():
        mega_logits, mega_cache = jax.jit(
            lambda p, c, t: lm_serving.decode_step(p, CFG, c, t))(params, cache, tok)
        mega_logits = np.asarray(mega_logits)

    err = np.abs(mega_logits - ref_logits).max()
    scale = np.abs(ref_logits).max()
    assert err / scale < 2e-2, f"logits diverge: rel {err / scale:.3e}"
    assert (mega_logits.argmax(-1) == ref_logits.argmax(-1)).all()
    # cache writes: int8 within quantization rounding of the reference path
    for name in ("k", "v"):
        d = np.abs(np.asarray(getattr(ref_cache, name), np.float32)
                   - np.asarray(getattr(mega_cache, name), np.float32))
        assert d.max() <= 2.0, f"cache {name} diverges: {d.max()}"


def test_megakernel_gate():
    from acestep_tpu.ops.pallas import decode_mega

    params = _params()
    assert decode_mega.supported(params["layers"], CFG, 1, 512)
    assert not decode_mega.supported(params["layers"], CFG, 16, 512)   # B cap
    assert not decode_mega.supported(params["layers"], CFG, 1, 500)    # T chunk
    bad_cfg = QwenConfig(hidden_size=512, num_hidden_layers=2,
                         num_attention_heads=16, num_key_value_heads=8,
                         intermediate_size=3072)
    assert not decode_mega.supported(params["layers"], bad_cfg, 1, 512)


def test_megakernel_vmem_gate():
    """Oversized caches must fall back to the scan path, not fail at compile.

    The f32 scores scratch is (b, heads, t_max); at b=8 a long-enough cache
    blows the ~16 MB/core VMEM — supported() must say no before pallas does.
    """
    from acestep_tpu.ops.pallas import decode_mega

    params = _params()
    # typical serving lengths stay supported
    assert decode_mega.supported(params["layers"], CFG, 8, 2048)
    # find the estimate-based cutoff and check the gate tracks it exactly
    huge_t = 512 * 1024  # far beyond any serving cache; scores alone > budget
    assert decode_mega._vmem_estimate(CFG, 8, huge_t) > decode_mega.VMEM_BUDGET
    assert not decode_mega.supported(params["layers"], CFG, 8, huge_t)
    # monotone: growing t_max never flips unsupported -> supported
    ts = [1024, 4096, 16384, 65536, huge_t]
    oks = [decode_mega.supported(params["layers"], CFG, 8, t) for t in ts]
    assert oks == sorted(oks, reverse=True)
