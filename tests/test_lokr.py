"""LoKr adapter tests."""

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.training import make_optimizer
from acestep_tpu.training.lokr import _factor_dim, apply_lokr, init_lokr, lokr_delta, make_lokr_train_step

TINY = DiTConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=1,
    num_attention_heads=2, num_key_value_heads=2, head_dim=16,
    in_channels=12, audio_acoustic_hidden_dim=4, patch_size=2,
    sliding_window=4, text_hidden_dim=16,
    num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
    timbre_hidden_dim=4,
)


def test_factor_dim():
    assert _factor_dim(32, 8) == (8, 4) or _factor_dim(32, 8)[0] * _factor_dim(32, 8)[1] == 32
    a, b = _factor_dim(2048, 8)
    assert a * b == 2048


def test_fresh_lokr_is_noop_and_delta_math():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    lokr = init_lokr(jax.random.key(1), params, factor=4)
    merged = apply_lokr(params, lokr)
    w0 = np.asarray(params["layers"][0]["self_attn"]["q_proj"]["kernel"])
    w1 = np.asarray(merged["layers"][0]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_allclose(w0, w1, atol=1e-7)     # b=0 -> no-op

    leaf = lokr["layers"][0]["self_attn"]["q_proj"]["kernel"]
    leaf["b"] = jnp.ones_like(leaf["b"]) * 0.01
    merged = apply_lokr(params, lokr, alpha=2.0)
    w1 = np.asarray(merged["layers"][0]["self_attn"]["q_proj"]["kernel"])
    expect = 2.0 * np.kron(np.asarray(leaf["a"]), np.asarray(leaf["b"]))
    np.testing.assert_allclose(w1 - w0, expect, atol=1e-5)
    assert (w1 - w0).shape == w0.shape


def test_lokr_training_reduces_loss():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    lokr = init_lokr(jax.random.key(1), params, factor=4)
    opt = make_optimizer(lr=5e-3, warmup_steps=1, total_steps=50)
    state = opt.init(lokr)
    step = make_lokr_train_step(params, TINY, opt, jit=False)
    rng = np.random.default_rng(1)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32),
        "context_latents": jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32),
        "encoder_hidden_states": jnp.asarray(rng.standard_normal((2, 3, 32)), jnp.float32),
        "loss_mask": jnp.ones((2, 8), jnp.float32),
    }
    losses = []
    for i in range(12):
        lokr, state, loss = step(lokr, state, batch, jax.random.key(0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
