"""LoRA adapter tests: no-op init, merge math, quantized merge, training."""

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.quant import QuantTensor, quantize_tree
from acestep_tpu.training import make_optimizer
from acestep_tpu.training.lora import apply_lora, init_lora, make_lora_train_step, scale_lora

TINY = DiTConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=1,
    num_attention_heads=2, num_key_value_heads=2, head_dim=16,
    in_channels=12, audio_acoustic_hidden_dim=4, patch_size=2,
    sliding_window=4, text_hidden_dim=16,
    num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
    timbre_hidden_dim=4,
)


def _setup():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    lora = init_lora(jax.random.key(1), params, rank=4)
    return params, lora


def _forward(params):
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.standard_normal((1, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 8)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((1, 3, 32)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    return np.asarray(dit.forward(params, TINY, hs, t, t, enc, ctx))


def test_fresh_lora_is_noop():
    params, lora = _setup()
    merged = apply_lora(params, lora)
    np.testing.assert_allclose(_forward(params), _forward(merged), atol=1e-6)


def test_nonzero_lora_changes_output_and_merge_math():
    params, lora = _setup()
    # set one adapter's b nonzero
    leaf = lora["layers"][0]["self_attn"]["q_proj"]["kernel"]
    leaf["b"] = jnp.ones_like(leaf["b"]) * 0.01
    merged = apply_lora(params, lora, alpha=16.0)
    w0 = np.asarray(params["layers"][0]["self_attn"]["q_proj"]["kernel"])
    w1 = np.asarray(merged["layers"][0]["self_attn"]["q_proj"]["kernel"])
    delta = (16.0 / 4) * np.asarray(leaf["a"]) @ np.asarray(leaf["b"])
    np.testing.assert_allclose(w1 - w0, delta, atol=1e-5)
    assert np.abs(_forward(params) - _forward(merged)).max() > 1e-6


def test_scale_lora():
    params, lora = _setup()
    leaf = lora["layers"][0]["self_attn"]["q_proj"]["kernel"]
    leaf["b"] = jnp.ones_like(leaf["b"]) * 0.01
    half = scale_lora(lora, 0.5)
    w_full = np.asarray(apply_lora(params, lora)["layers"][0]["self_attn"]["q_proj"]["kernel"])
    w_half = np.asarray(apply_lora(params, half)["layers"][0]["self_attn"]["q_proj"]["kernel"])
    w0 = np.asarray(params["layers"][0]["self_attn"]["q_proj"]["kernel"])
    np.testing.assert_allclose(w_half - w0, (w_full - w0) / 2, atol=1e-6)


def test_quantized_merge():
    params, lora = _setup()
    policy = lambda p, a: getattr(a, "ndim", 0) == 2 and p.endswith("kernel") and a.shape[0] % 32 == 0
    qparams = quantize_tree(params, "q8_0", policy=policy)
    leaf = lora["layers"][0]["mlp"]["gate_proj"]["kernel"]
    leaf["b"] = jnp.ones_like(leaf["b"]) * 0.02
    merged = apply_lora(qparams, lora)
    mk = merged["layers"][0]["mlp"]["gate_proj"]["kernel"]
    assert isinstance(mk, QuantTensor) and mk.fmt == "q8_0"
    # merged quantized weight tracks fp merge within quant noise
    from acestep_tpu.quant import dequantize_np

    fp_merged = apply_lora(params, lora)
    fp_w = np.asarray(fp_merged["layers"][0]["mlp"]["gate_proj"]["kernel"])
    err = np.abs(dequantize_np(mk) - fp_w)
    assert err.mean() < 0.01


def test_lora_training_reduces_loss_base_frozen():
    params, lora = _setup()
    base_snapshot = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params)
    opt = make_optimizer(lr=5e-3, warmup_steps=1, total_steps=50)
    opt_state = opt.init(lora)
    step = make_lora_train_step(params, TINY, opt, jit=False)
    rng = np.random.default_rng(1)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32),
        "context_latents": jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32),
        "encoder_hidden_states": jnp.asarray(rng.standard_normal((2, 3, 32)), jnp.float32),
        "loss_mask": jnp.ones((2, 8), jnp.float32),
    }
    losses = []
    for i in range(12):
        # fixed key -> deterministic objective; optimization must reduce it
        lora, opt_state, loss = step(lora, opt_state, batch, jax.random.key(0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # base params untouched
    for a, b in zip(jax.tree_util.tree_leaves(base_snapshot), jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))
