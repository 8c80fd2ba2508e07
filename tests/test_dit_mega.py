"""DiT Euler-step megakernel (ops/pallas/dit_mega.py) parity vs the XLA scan.

Runs under pallas interpret mode on CPU (same CI strategy as
tests/test_decode_mega.py) with a conformant tiny config: head_dim 128 and
every matmul dim divisible by the chunk edge, q8_0 fused stacked weights —
the exact format the engine serves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.ops.pallas import dit_mega
from acestep_tpu.ops.qlinear import precast_quant_scales
from acestep_tpu.quant import quantize_tree_jax

CFG = DiTConfig(
    hidden_size=256, intermediate_size=512, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=1, head_dim=128,
    in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
    sliding_window=4,
    layer_types=("sliding_attention", "full_attention"),
    text_hidden_dim=32, num_lyric_encoder_hidden_layers=1,
    num_timbre_encoder_hidden_layers=1, timbre_hidden_dim=8,
)
T_FRAMES = 32            # -> 16 patch tokens
LC = 16


def _params():
    p = dit.init_params(jax.random.key(0), CFG, dtype=jnp.float32)
    # quantize every 2-D kernel regardless of size (the tiny-config kernels
    # fall under the default MIN_QUANT_ELEMS threshold)
    policy = lambda path, a: (getattr(a, "ndim", 0) == 2  # noqa: E731
                              and path.endswith("kernel"))
    p = quantize_tree_jax(p, "q8_0", policy=policy)
    return precast_quant_scales(dit.fuse_params(dit.stack_params(p)))


def _inputs(b=1, seed=0):
    rng = np.random.default_rng(seed)
    hs = jnp.asarray(rng.standard_normal((b, T_FRAMES,
                                          CFG.audio_acoustic_hidden_dim)),
                     jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, T_FRAMES, CFG.context_dim)),
                      jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, LC, CFG.hidden_size)) * 0.3,
                      jnp.float32)
    return hs, ctx, enc


@pytest.fixture(scope="module")
def setup():
    params = _params()
    hs, ctx, enc = _inputs()
    kv = dit.compute_all_cross_kv(params, CFG, enc)
    return params, hs, ctx, enc, kv


def _fwd(params, hs, ctx, kv, enc_mask=None, t=0.4, r=None):
    return dit.forward(
        params, CFG, hs,
        jnp.asarray([t], jnp.float32),
        jnp.asarray([r if r is not None else t], jnp.float32),
        encoder_hidden_states=None, context_latents=ctx,
        encoder_attn_mask=enc_mask, cross_kv_cache=kv,
    )


def test_supported_gate(setup):
    params, hs, ctx, enc, kv = setup
    assert dit_mega.supported(params["layers"], CFG, 1, T_FRAMES // 2, LC)
    assert not dit_mega.supported(params["layers"], CFG, 2, T_FRAMES // 2, LC)
    huge_t = VMEM = 1 << 20
    assert not dit_mega.supported(params["layers"], CFG, 1, huge_t, LC)


def test_forward_parity(setup, monkeypatch):
    """Megakernel forward matches the XLA scan to accumulation-order noise —
    incl. the per-layer sliding/full split and the dual (t, t-r) embeds."""
    params, hs, ctx, enc, kv = setup
    monkeypatch.setenv("ACESTEP_TPU_DIT_MEGA", "0")
    ref = np.asarray(_fwd(params, hs, ctx, kv, t=0.4, r=0.3))
    monkeypatch.setenv("ACESTEP_TPU_DIT_MEGA", "1")
    got = np.asarray(_fwd(params, hs, ctx, kv, t=0.4, r=0.3))
    assert got.shape == ref.shape
    cos = float(ref.ravel() @ got.ravel()
                / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
    assert cos > 0.99999
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=5e-2)


def test_forward_parity_with_enc_mask(setup, monkeypatch):
    """Padded condition tokens: the additive encoder mask must match."""
    params, hs, ctx, enc, kv = setup
    enc_mask = jnp.asarray(
        np.concatenate([np.ones((1, 10)), np.zeros((1, LC - 10))], axis=1),
        jnp.float32)
    monkeypatch.setenv("ACESTEP_TPU_DIT_MEGA", "0")
    ref = np.asarray(_fwd(params, hs, ctx, kv, enc_mask=enc_mask))
    monkeypatch.setenv("ACESTEP_TPU_DIT_MEGA", "1")
    got = np.asarray(_fwd(params, hs, ctx, kv, enc_mask=enc_mask))
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=5e-2)
    # and the mask genuinely matters (masked vs unmasked differ)
    ref_nomask = np.asarray(_fwd(params, hs, ctx, kv))
    assert np.abs(ref_nomask - ref).max() > 1e-4


def test_batch2_falls_back(setup, monkeypatch):
    """b=2 declines the kernel and still produces the scan result."""
    params, _, _, _, _ = setup
    hs, ctx, enc = _inputs(b=2, seed=3)
    kv = dit.compute_all_cross_kv(params, CFG, enc)
    monkeypatch.setenv("ACESTEP_TPU_DIT_MEGA", "0")
    ref = np.asarray(dit.forward(
        params, CFG, hs, jnp.asarray([0.4, 0.4], jnp.float32),
        jnp.asarray([0.4, 0.4], jnp.float32), encoder_hidden_states=None,
        context_latents=ctx, cross_kv_cache=kv))
    monkeypatch.setenv("ACESTEP_TPU_DIT_MEGA", "1")
    got = np.asarray(dit.forward(
        params, CFG, hs, jnp.asarray([0.4, 0.4], jnp.float32),
        jnp.asarray([0.4, 0.4], jnp.float32), encoder_hidden_states=None,
        context_latents=ctx, cross_kv_cache=kv))
    np.testing.assert_array_equal(got, ref)
