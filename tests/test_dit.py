"""DiT decoder unit/semantic tests (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit

TINY = DiTConfig(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    in_channels=24,
    audio_acoustic_hidden_dim=8,
    patch_size=2,
    sliding_window=4,
    text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=1,
    timbre_hidden_dim=8,
)


@pytest.fixture(scope="module")
def setup():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    return params


def _inputs(t_len=10, b=2, lc=7, seed=0):
    rng = np.random.default_rng(seed)
    hs = jnp.asarray(rng.standard_normal((b, t_len, TINY.audio_acoustic_hidden_dim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, t_len, TINY.context_dim)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, lc, TINY.hidden_size)), jnp.float32)
    t = jnp.asarray([0.9, 0.5], jnp.float32)[:b]
    return hs, ctx, enc, t


def test_output_shape_even_and_odd_seq(setup):
    params = setup
    for t_len in (10, 11):  # odd length exercises patch padding + crop
        hs, ctx, enc, t = _inputs(t_len)
        out = dit.forward(params, TINY, hs, t, t, enc, ctx)
        assert out.shape == (2, t_len, TINY.audio_acoustic_hidden_dim)
        assert np.isfinite(np.asarray(out)).all()


def test_cross_kv_cache_exact_match(setup):
    """Precomputed cross-attn K/V must give bit-identical output to recompute
    (the MLX cache optimization, model.py:91-116)."""
    params = setup
    hs, ctx, enc, t = _inputs()
    full = dit.forward(params, TINY, hs, t, t, enc, ctx)
    enc_proj = dit.compute_condition(params, TINY, enc)
    kv = dit.compute_all_cross_kv(params, TINY, enc_proj)
    cached = dit.forward(params, TINY, hs, t, t, None, ctx, cross_kv_cache=kv)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))


@pytest.mark.parametrize("quant", [None, "q8_0"])
def test_fused_qkv_gateup_parity(setup, quant):
    """fuse_params (serving-fused q||k||v / gate||up weights) must match the
    unfused stacked forward: the N-axis concat is exact column-for-column."""
    params = setup
    if quant:
        from acestep_tpu.quant import quantize_tree_jax

        params = quantize_tree_jax(params, quant)
    hs, ctx, enc, t = _inputs()
    stacked = dit.stack_params(params)
    fused = dit.fuse_params(stacked)
    assert "qkv_proj" in fused["layers"]["self_attn"]
    assert "gateup_proj" in fused["layers"]["mlp"]
    assert "q_proj" not in fused["layers"]["self_attn"]
    # idempotent
    assert dit.fuse_params(fused) is fused

    base = dit.forward(stacked, TINY, hs, t, t, enc, ctx)
    out = dit.forward(fused, TINY, hs, t, t, enc, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=0, atol=1e-5)


def test_timestep_r_changes_output(setup):
    params = setup
    hs, ctx, enc, t = _inputs()
    # with random (non-degenerate) time_embed_r weights, t_r must influence output
    a = dit.forward(params, TINY, hs, t, t, enc, ctx)
    b = dit.forward(params, TINY, hs, t, t * 0.5, enc, ctx)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_sliding_window_locality():
    """With all-sliding layers, a perturbation beyond (window * patch * n_layers)
    frames must not affect position 0."""
    cfg = DiTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16,
        in_channels=12, audio_acoustic_hidden_dim=4, patch_size=1,
        sliding_window=2, layer_types=("sliding_attention",),
        text_hidden_dim=16, num_lyric_encoder_hidden_layers=0,
        num_timbre_encoder_hidden_layers=0, timbre_hidden_dim=4,
    )
    params = dit.init_params(jax.random.key(1), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    t_len = 16
    hs = jnp.asarray(rng.standard_normal((1, t_len, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, t_len, 8)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((1, 3, 32)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    base = np.asarray(dit.forward(params, cfg, hs, t, t, enc, ctx))
    hs2 = hs.at[0, 10, :].add(100.0)  # |0 - 10| > window=2 -> no path to pos 0
    pert = np.asarray(dit.forward(params, cfg, hs2, t, t, enc, ctx))
    np.testing.assert_allclose(base[0, 0], pert[0, 0], atol=1e-5)
    # ...but it must affect nearby positions
    assert np.abs(base[0, 10] - pert[0, 10]).max() > 1e-3


def test_full_attention_is_global():
    cfg = DiTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16,
        in_channels=12, audio_acoustic_hidden_dim=4, patch_size=1,
        sliding_window=2, layer_types=("full_attention",),
        text_hidden_dim=16, num_lyric_encoder_hidden_layers=0,
        num_timbre_encoder_hidden_layers=0, timbre_hidden_dim=4,
    )
    params = dit.init_params(jax.random.key(1), cfg, dtype=jnp.float32)
    # random-init AdaLN gates are near zero; force O(1) gates so influence is visible
    params["layers"][0]["scale_shift_table"] = jnp.ones((6, 32), jnp.float32)
    rng = np.random.default_rng(3)
    t_len = 16
    hs = jnp.asarray(rng.standard_normal((1, t_len, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, t_len, 8)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((1, 3, 32)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    base = np.asarray(dit.forward(params, cfg, hs, t, t, enc, ctx))
    pert = np.asarray(dit.forward(params, cfg, hs.at[0, 10, :].add(100.0), t, t, enc, ctx))
    assert np.abs(base[0, 0] - pert[0, 0]).max() > 1e-4


def test_patchify_matches_torch_conv1d(setup):
    """Our conv1d-as-linear patchify must match torch Conv1d(stride=patch) given
    the repack mapping kernel = w.transpose(2, 1, 0).reshape(p*C, H)
    (the C++ repack, dit_model.cpp:334-411)."""
    torch = pytest.importorskip("torch")
    params = setup
    rng = np.random.default_rng(5)
    b, t_len = 1, 8
    p_sz, c_in, h = TINY.patch_size, TINY.in_channels, TINY.hidden_size
    x = rng.standard_normal((b, t_len, c_in)).astype(np.float32)

    kernel = np.asarray(params["proj_in"]["kernel"], dtype=np.float32)  # [p*C, H]
    bias = np.asarray(params["proj_in"]["bias"], dtype=np.float32)
    # invert the repack to get torch conv weight [H, C, p]
    w_torch = kernel.reshape(p_sz, c_in, h).transpose(2, 1, 0)

    conv = torch.nn.Conv1d(c_in, h, kernel_size=p_sz, stride=p_sz)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w_torch.copy()))
        conv.bias.copy_(torch.from_numpy(bias.copy()))
        ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    ours = x.reshape(b, t_len // p_sz, p_sz * c_in) @ kernel + bias
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_unpatchify_matches_torch_convtranspose1d(setup):
    """Unpatchify linear must match torch ConvTranspose1d(stride=patch) given
    kernel = w.transpose(0, 2, 1).reshape(H, p*A)."""
    torch = pytest.importorskip("torch")
    params = setup
    rng = np.random.default_rng(6)
    b, tp = 1, 5
    p_sz, h, a = TINY.patch_size, TINY.hidden_size, TINY.audio_acoustic_hidden_dim
    x = rng.standard_normal((b, tp, h)).astype(np.float32)

    kernel = np.asarray(params["proj_out"]["kernel"], dtype=np.float32)  # [H, p*A]
    bias_a = np.asarray(params["proj_out"]["bias"], dtype=np.float32)   # [A]
    # torch ConvTranspose1d weight is [in=H, out=A, k=p]
    w_torch = kernel.reshape(h, p_sz, a).transpose(0, 2, 1)

    convt = torch.nn.ConvTranspose1d(h, a, kernel_size=p_sz, stride=p_sz)
    with torch.no_grad():
        convt.weight.copy_(torch.from_numpy(w_torch.copy()))
        convt.bias.copy_(torch.from_numpy(bias_a.copy()))
        ref = convt(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

    ours = (x.reshape(tp, h) @ kernel).reshape(b, tp * p_sz, a) + np.tile(bias_a, (1, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_lyric_and_timbre_encoders(setup):
    params = setup
    rng = np.random.default_rng(7)
    lyr = jnp.asarray(rng.standard_normal((2, 9, TINY.text_hidden_dim)), jnp.float32)
    out = dit.lyric_encoder(params, TINY, lyr)
    assert out.shape == (2, 9, TINY.hidden_size)

    ref = jnp.asarray(rng.standard_normal((2, 6, TINY.timbre_hidden_dim)), jnp.float32)
    tok = dit.timbre_encoder(params, TINY, ref)
    assert tok.shape == (2, 1, TINY.hidden_size)
    assert np.isfinite(np.asarray(tok)).all()


def test_encoder_mask_respected(setup):
    """Masked condition tokens must not influence the decoder output."""
    params = setup
    hs, ctx, enc, t = _inputs(lc=6)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0]] * 2, jnp.int32)
    base = dit.forward(params, TINY, hs, t, t, enc, ctx, encoder_attn_mask=mask)
    enc2 = enc.at[:, 4, :].add(50.0)  # masked position
    pert = dit.forward(params, TINY, hs, t, t, enc2, ctx, encoder_attn_mask=mask)
    np.testing.assert_allclose(np.asarray(base), np.asarray(pert), atol=1e-5)
