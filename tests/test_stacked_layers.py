"""Stacked-layer (scan) path must match the list (loop) path bit-for-bit-ish."""

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig, QwenConfig
from acestep_tpu.models import dit, qwen
from acestep_tpu.quant import quantize_tree

TINY_DIT = DiTConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=3,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
    sliding_window=4, text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
    timbre_hidden_dim=8,
)
TINY_Q = QwenConfig(
    vocab_size=128, hidden_size=64, num_hidden_layers=3,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128, head_dim=16,
)


def test_dit_scan_matches_loop():
    params = dit.init_params(jax.random.key(0), TINY_DIT, dtype=jnp.float32)
    stacked = dit.stack_params(params)
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.standard_normal((2, 10, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)
    t = jnp.asarray([0.9, 0.4], jnp.float32)
    a = np.asarray(dit.forward(params, TINY_DIT, hs, t, t, enc, ctx))
    b = np.asarray(dit.forward(stacked, TINY_DIT, hs, t, t, enc, ctx))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_dit_scan_with_masks_and_quant():
    params = dit.init_params(jax.random.key(1), TINY_DIT, dtype=jnp.float32)
    policy = lambda p, a: getattr(a, "ndim", 0) == 2 and p.endswith("kernel") and a.shape[0] % 32 == 0
    qparams = quantize_tree(params, "q8_0", policy=policy)
    stacked = dit.stack_params(qparams)
    rng = np.random.default_rng(1)
    hs = jnp.asarray(rng.standard_normal((1, 12, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 12, 16)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
    am = jnp.asarray(np.concatenate([np.ones((1, 9)), np.zeros((1, 3))], 1), jnp.int32)
    em = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    t = jnp.asarray([0.5], jnp.float32)
    a = np.asarray(dit.forward(qparams, TINY_DIT, hs, t, t, enc, ctx,
                               attn_mask=am, encoder_attn_mask=em))
    b = np.asarray(dit.forward(stacked, TINY_DIT, hs, t, t, enc, ctx,
                               attn_mask=am, encoder_attn_mask=em))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_qwen_scan_matches_loop():
    params = qwen.init_params(jax.random.key(0), TINY_Q, dtype=jnp.float32, scale=0.1)
    stacked = qwen.stack_params(params)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (2, 9)), jnp.int32)
    a = np.asarray(qwen.forward(params, TINY_Q, ids))
    b = np.asarray(qwen.forward(stacked, TINY_Q, ids))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
