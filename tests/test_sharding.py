"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import sampler
from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.parallel import make_mesh, shard_batch, shard_params, tier_for
from acestep_tpu.quant import quantize_tree

TINY = DiTConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
    sliding_window=8, text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
    timbre_hidden_dim=8,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_tier_table():
    t = tier_for(8)
    assert t.dp * t.tp == 8
    t = tier_for(12)
    assert t.dp * t.tp == 12


def _inputs(b=4, t_len=16, lc=5, seed=0):
    rng = np.random.default_rng(seed)
    hs = jnp.asarray(rng.standard_normal((b, t_len, TINY.audio_acoustic_hidden_dim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, t_len, TINY.context_dim)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, lc, TINY.hidden_size)), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    return hs, ctx, enc, t


def test_tp_sharded_forward_matches_single_device():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    hs, ctx, enc, t = _inputs()
    ref = np.asarray(dit.forward(params, TINY, hs, t, t, enc, ctx))

    mesh = make_mesh(8, dp=2, tp=4)
    sharded = shard_params(params, mesh)
    hs_s = shard_batch(hs, mesh)

    fwd = jax.jit(lambda p, x, tt, e, c: dit.forward(p, TINY, x, tt, tt, e, c))
    out = np.asarray(fwd(sharded, hs_s, t, enc, ctx))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_tp_sharded_quantized_forward():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    policy = lambda path, a: getattr(a, "ndim", 0) == 2 and path.endswith("kernel") and a.shape[0] % 32 == 0
    qparams = quantize_tree(params, "q8_0", policy=policy)
    hs, ctx, enc, t = _inputs()
    ref = np.asarray(dit.forward(qparams, TINY, hs, t, t, enc, ctx))

    mesh = make_mesh(8, dp=2, tp=4)
    sharded = shard_params(qparams, mesh)
    fwd = jax.jit(lambda p, x, tt, e, c: dit.forward(p, TINY, x, tt, tt, e, c))
    out = np.asarray(fwd(sharded, shard_batch(hs, mesh), t, enc, ctx))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_sharded_sampler_runs():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    mesh = make_mesh(8, dp=2, tp=4)
    sharded = shard_params(params, mesh)
    rng = np.random.default_rng(1)
    b, t_len = 4, 16
    ctx = jnp.asarray(rng.standard_normal((b, t_len, TINY.context_dim)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, 5, TINY.hidden_size)), jnp.float32)
    noise = sampler.make_noise([0, 1, 2, 3], (b, t_len, TINY.audio_acoustic_hidden_dim))
    schedule = sampler.get_timestep_schedule(3.0)
    out = sampler.sample_latents(
        sharded, TINY, shard_batch(noise, mesh), shard_batch(ctx, mesh),
        shard_batch(enc, mesh), None, schedule,
    )
    assert np.isfinite(np.asarray(out)).all()
    # must match unsharded reference
    ref = sampler.sample_latents(params, TINY, noise, ctx, enc, None, schedule)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_training_step_dp_tp():
    """Full training step over the mesh (what the driver's dryrun exercises)."""
    from acestep_tpu.training import make_optimizer, make_train_step

    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    mesh = make_mesh(8, dp=2, tp=4)
    sharded = shard_params(params, mesh)
    opt = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)
    opt_state = opt.init(sharded)
    step = make_train_step(TINY, opt)
    rng = np.random.default_rng(2)
    batch = {
        "latents": shard_batch(jnp.asarray(rng.standard_normal((4, 16, 8)), jnp.float32), mesh),
        "context_latents": shard_batch(jnp.asarray(rng.standard_normal((4, 16, 16)), jnp.float32), mesh),
        "encoder_hidden_states": shard_batch(jnp.asarray(rng.standard_normal((4, 5, 64)), jnp.float32), mesh),
        "loss_mask": shard_batch(jnp.ones((4, 16), jnp.float32), mesh),
    }
    # two steps: warmup LR is 0 on the very first step, so updates land on step 2
    new_params, new_state, loss = step(sharded, opt_state, batch, jax.random.key(0))
    new_params, new_state, loss = step(new_params, new_state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    # params actually updated somewhere
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(sharded), jax.tree_util.tree_leaves(new_params)
        )
    ]
    assert max(diffs) > 0


def test_explicit_shard_map_tp_matches_single_device():
    """The explicit-psum shard_map TP forward must match the plain forward."""
    from acestep_tpu.parallel.tp import make_tp_dit_forward

    cfg = DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
        timbre_hidden_dim=8,
    )
    params = dit.stack_params(dit.init_params(jax.random.key(0), cfg, dtype=jnp.float32))
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)
    t = jnp.asarray([0.7, 0.4], jnp.float32)

    ref = np.asarray(dit.forward(params, cfg, hs, t, t, enc, ctx))

    mesh = make_mesh(8, dp=2, tp=4)
    fwd = make_tp_dit_forward(cfg, mesh, params)
    out = np.asarray(fwd(params, hs, t, enc, ctx))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_explicit_tp_with_quantized_params():
    from acestep_tpu.parallel.tp import make_tp_dit_forward

    cfg = DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=8, num_key_value_heads=4, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
        timbre_hidden_dim=8,
    )
    policy = lambda p, a: getattr(a, "ndim", 0) == 2 and p.endswith("kernel") and a.shape[0] % 32 == 0
    params = dit.stack_params(
        quantize_tree(dit.init_params(jax.random.key(1), cfg, dtype=jnp.float32),
                      "q8_0", policy=policy))
    rng = np.random.default_rng(1)
    hs = jnp.asarray(rng.standard_normal((1, 10, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 10, 16)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((1, 4, 64)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    ref = np.asarray(dit.forward(params, cfg, hs, t, t, enc, ctx))
    mesh = make_mesh(8, dp=2, tp=4)
    fwd = make_tp_dit_forward(cfg, mesh, params)
    out = np.asarray(fwd(params, hs, t, enc, ctx))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_distributed_single_process_fallback():
    """distributed.initialize is a no-op fallback off-pod; global_mesh builds
    a valid (dp, tp) mesh whose tp axis never crosses a host."""
    from acestep_tpu.parallel import distributed

    assert distributed.initialize() is False      # no coordinator configured
    n_proc, local, global_n = distributed.topology()
    assert n_proc == 1 and local == global_n == 8
    mesh = distributed.global_mesh()
    dp, tp = mesh.devices.shape
    assert dp * tp == 8
    assert local % tp == 0                        # tp rides "ICI"
    assert distributed.is_primary()
