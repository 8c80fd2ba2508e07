"""Banded / flash attention must match dense masked attention numerically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.ops import attention, make_attention_mask
from acestep_tpu.ops.blocked_attention import banded_attention, flash_attention


def _qkv(b=2, hq=4, hkv=2, t=37, d=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, t, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, hkv, t, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, hkv, t, d)), dtype)
    return q, k, v


@pytest.mark.parametrize("window", [2, 4, 7, 16])
@pytest.mark.parametrize("t", [5, 16, 37, 64])
def test_banded_matches_dense(window, t):
    q, k, v = _qkv(t=t)
    mask = make_attention_mask(t, t, sliding_window=window)
    dense = attention(q, k, v, mask=mask)
    banded = banded_attention(q, k, v, window=window)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense), atol=2e-5)


def test_banded_matches_dense_with_kv_valid():
    t, window = 29, 5
    q, k, v = _qkv(t=t, seed=3)
    rng = np.random.default_rng(7)
    kv_valid = jnp.asarray(rng.integers(0, 2, (2, t)), jnp.int32)
    # ensure each row has at least its own position valid somewhere in band
    kv_valid = kv_valid.at[:, ::3].set(1)
    mask = make_attention_mask(t, t, kv_valid=kv_valid, sliding_window=window)
    dense = attention(q, k, v, mask=mask)
    banded = banded_attention(q, k, v, window=window, kv_valid=kv_valid)
    d = np.asarray(dense)
    bl = np.asarray(banded)
    # compare rows whose band contains at least one valid key (others are
    # degenerate uniform-average rows where dense mixes the whole sequence)
    kv = np.asarray(kv_valid)
    for bi in range(d.shape[0]):
        for qi in range(t):
            lo, hi = max(0, qi - window), min(t, qi + window + 1)
            if kv[bi, lo:hi].any():
                np.testing.assert_allclose(bl[bi, :, qi], d[bi, :, qi], atol=2e-5)


@pytest.mark.parametrize("block_k", [8, 16, 64, 1024])
def test_flash_matches_dense(block_k):
    t = 50
    q, k, v = _qkv(t=t, seed=1)
    dense = attention(q, k, v, mask=None)
    fl = flash_attention(q, k, v, block_k=block_k)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(dense), atol=2e-5)


def test_flash_matches_dense_with_kv_valid():
    t = 45
    q, k, v = _qkv(t=t, seed=2)
    rng = np.random.default_rng(11)
    kv_valid = jnp.asarray(rng.integers(0, 2, (2, t)), jnp.int32).at[:, 0].set(1)
    mask = make_attention_mask(t, t, kv_valid=kv_valid)
    dense = attention(q, k, v, mask=mask)
    fl = flash_attention(q, k, v, kv_valid=kv_valid, block_k=16)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(dense), atol=2e-5)


def test_flash_cross_shape():
    """Tq != Tk (cross-attention shape)."""
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((1, 4, 20, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 33, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 33, 8)), jnp.float32)
    dense = attention(q, k, v, mask=None)
    fl = flash_attention(q, k, v, block_k=8)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(dense), atol=2e-5)


def test_banded_locality():
    """Perturbation beyond the window must not leak through banded attention."""
    t, window = 64, 4
    q, k, v = _qkv(b=1, t=t, seed=5)
    base = np.asarray(banded_attention(q, k, v, window=window))
    k2 = k.at[:, :, 40, :].add(100.0)
    v2 = v.at[:, :, 40, :].add(100.0)
    pert = np.asarray(banded_attention(q, k2, v2, window=window))
    np.testing.assert_allclose(base[0, :, 0], pert[0, :, 0], atol=1e-6)
    assert np.abs(base[0, :, 40] - pert[0, :, 40]).max() > 1e-3


def test_bf16_inputs():
    # jitted: the CPU backend's eager dot thunk lacks bf16xbf16->f32
    q, k, v = _qkv(t=40, dtype=jnp.bfloat16, seed=6)
    mask = make_attention_mask(40, 40, sliding_window=8)
    dense = jax.jit(attention)(q, k, v, mask=mask)
    banded = jax.jit(lambda *a: banded_attention(*a, window=8))(q, k, v)
    assert banded.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(banded, np.float32), np.asarray(dense, np.float32), atol=3e-2
    )
    fl = jax.jit(lambda *a: flash_attention(*a, block_k=16))(q, k, v)
    dense_full = jax.jit(attention)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(fl, np.float32), np.asarray(dense_full, np.float32), atol=3e-2
    )


# ---------------------------------------------------------------------------
# end-to-end through dit.forward: blocked path must match dense path
# ---------------------------------------------------------------------------

def _tiny_cfg():
    from acestep_tpu.config import DiTConfig

    return DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=2, num_timbre_encoder_hidden_layers=0,
        timbre_hidden_dim=8,
    )


@pytest.mark.parametrize("stacked", [False, True])
def test_dit_forward_blocked_matches_dense(monkeypatch, stacked):
    from acestep_tpu.models import dit

    cfg = _tiny_cfg()
    params = dit.init_params(jax.random.key(0), cfg, dtype=jnp.float32)
    if stacked:
        params = dit.stack_params(params)
    rng = np.random.default_rng(0)
    b, t_len, lc = 2, 100, 7
    hs = jnp.asarray(rng.standard_normal((b, t_len, cfg.audio_acoustic_hidden_dim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, t_len, cfg.context_dim)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, lc, cfg.hidden_size)), jnp.float32)
    am = jnp.asarray(
        (np.arange(t_len)[None, :] < np.asarray([t_len, 80])[:, None]).astype(np.int32))
    t = jnp.asarray([0.9, 0.5], jnp.float32)

    monkeypatch.setenv("ACESTEP_TPU_BLOCKED_ATTN_MIN", "1000000")
    dense = np.asarray(dit.forward(params, cfg, hs, t, t, enc, ctx, attn_mask=am))
    monkeypatch.setenv("ACESTEP_TPU_BLOCKED_ATTN_MIN", "1")
    blocked = np.asarray(dit.forward(params, cfg, hs, t, t, enc, ctx, attn_mask=am))
    # compare valid frames only (invalid rows are degenerate either way)
    np.testing.assert_allclose(blocked[0], dense[0], atol=3e-5)
    np.testing.assert_allclose(blocked[1, :80], dense[1, :80], atol=3e-5)
