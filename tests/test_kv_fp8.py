"""FP8 KV-cache option (ACESTEP_TPU_KV_DTYPE=fp8) vs the int8 default.

BASELINE.json's north star says "INT8/FP8 KV-cache"; fp8 (e4m3fn) pays on
v5p/v6e whose MXUs take fp8 operands natively.  The scale-folded attention
math in serving/lm.py is dtype-agnostic; these tests pin (a) the quantizer's
round-trip error, (b) greedy decode parity vs the int8 path, (c) the pallas
kernels gating OFF under fp8 (they stream int8 KV specifically).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen
from acestep_tpu.serving import SamplingParams, generate
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving import lm as lm_serving

TINY = QwenConfig(
    vocab_size=160, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=8, num_key_value_heads=8, intermediate_size=128,
    head_dim=16,
)


def test_env_validation(monkeypatch):
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "fp16")
    with pytest.raises(ValueError, match="fp16"):
        kvc.kv_dtype_name()


def test_quantize_roundtrip_fp8_beats_nothing_burned(monkeypatch):
    """fp8 e4m3 round-trip: per-vector relative error well under 2^-3 (3
    mantissa bits) on Gaussian vectors; zero vectors stay exactly zero."""
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "fp8")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 64)) * 3.0, jnp.float32)
    q, s = kvc.quantize_kv(x)
    assert q.dtype == jnp.float8_e4m3fn
    back = np.asarray(kvc.dequantize_kv(q, s, dtype=jnp.float32))
    rel = np.abs(back - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.07                          # e4m3 grid at amax scaling

    z = jnp.zeros((2, 3, 64), jnp.float32)
    qz, sz = kvc.quantize_kv(z)
    assert np.asarray(kvc.dequantize_kv(qz, sz, jnp.float32)).max() == 0.0


def test_init_cache_dtype(monkeypatch):
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "fp8")
    c = kvc.init_cache(2, 1, 4, 128, 16)
    assert c.k.dtype == jnp.float8_e4m3fn
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "int8")
    c = kvc.init_cache(2, 1, 4, 128, 16)
    assert c.k.dtype == jnp.int8


PROMPT = np.asarray([[3, 14, 15, 92, 6, 53], [5, 8, 9, 7, 0, 0]], np.int32)
LENGTHS = np.asarray([6, 4], np.int32)


def _gen(cfg, sp, key=0):
    p = qwen.init_params(jax.random.key(7), cfg, dtype=jnp.float32, scale=0.1)
    p = lm_serving.fuse_serving_params(
        lm_serving.ensure_quantized_head(qwen.stack_params(p)))
    return generate(p, cfg, jnp.asarray(PROMPT), jnp.asarray(LENGTHS),
                    jax.random.key(key), sp)


def test_greedy_decode_parity_fp8_vs_int8(monkeypatch):
    """Greedy tokens agree between the int8 and fp8 caches at tiny scale —
    both quantizers keep enough of K/V that argmax decisions survive."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=8)
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "int8")
    base, base_n = _gen(TINY, sp)
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "fp8")
    got, got_n = _gen(TINY, sp)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(base_n), np.asarray(got_n))


def test_fp8_gates_pallas_kernels(monkeypatch):
    """Under fp8 the megakernel and pallas decode-attn selectors must decline
    (they stream int8 KV); the XLA scan path serves instead."""
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "fp8")
    monkeypatch.setenv("ACESTEP_TPU_DECODE_ATTN", "pallas")
    assert lm_serving._pallas_decode_attn(256, 8, 8, 128) is None
    monkeypatch.setenv("ACESTEP_TPU_DECODE_ATTN", "fused")
    assert lm_serving._pallas_decode_attn_fused(256, 8, 8, 128, 1e-6) is None
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "int8")
    monkeypatch.setenv("ACESTEP_TPU_DECODE_ATTN", "pallas")
    assert lm_serving._pallas_decode_attn(256, 8, 8, 128) is not None


def test_fp8_decode_with_mega_flag_falls_back(monkeypatch):
    """ACESTEP_TPU_DECODE_MEGA=1 + fp8: generation still works (the int8 gate
    inside the mega selection refuses and the scan path runs)."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=4)
    monkeypatch.setenv("ACESTEP_TPU_KV_DTYPE", "fp8")
    monkeypatch.setenv("ACESTEP_TPU_DECODE_MEGA", "1")
    toks, n = _gen(TINY, sp)
    assert np.asarray(n).min() >= 1
