"""Sampler tests: schedule resolution and scan-vs-eager equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import sampler
from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit

TINY = DiTConfig(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    head_dim=16,
    in_channels=12,
    audio_acoustic_hidden_dim=4,
    patch_size=2,
    sliding_window=4,
    text_hidden_dim=16,
    num_lyric_encoder_hidden_layers=0,
    num_timbre_encoder_hidden_layers=0,
    timbre_hidden_dim=4,
)


class TestSchedule:
    def test_default_shift_3(self):
        s = sampler.get_timestep_schedule(3.0)
        assert s == sampler.SHIFT_TIMESTEPS[3.0]
        assert len(s) == 8 and s[0] == 1.0

    def test_shift_rounding(self):
        assert sampler.get_timestep_schedule(2.6) == sampler.SHIFT_TIMESTEPS[3.0]
        assert sampler.get_timestep_schedule(1.4) == sampler.SHIFT_TIMESTEPS[1.0]

    def test_custom_snap_to_whitelist(self):
        s = sampler.get_timestep_schedule(3.0, timesteps=[0.99, 0.51, 0.12, 0.0, 0.0])
        assert s == (1.0, 0.5, 0.125)  # trailing zeros dropped, snapped

    def test_custom_empty_falls_back(self):
        s = sampler.get_timestep_schedule(2.0, timesteps=[0, 0])
        assert s == sampler.SHIFT_TIMESTEPS[2.0]

    def test_custom_truncated_at_20(self):
        s = sampler.get_timestep_schedule(3.0, timesteps=[0.5] * 30)
        assert len(s) == 20


class TestNoise:
    def test_per_item_seeds_reproducible(self):
        n1 = sampler.make_noise([1, 2], (2, 6, 4))
        n2 = sampler.make_noise([1, 2], (2, 6, 4))
        np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
        # different seeds -> different noise rows
        assert np.abs(np.asarray(n1[0]) - np.asarray(n1[1])).max() > 0.1

    def test_key_noise(self):
        n = sampler.make_noise(jax.random.key(0), (1, 5, 4))
        assert n.shape == (1, 5, 4)


@pytest.fixture(scope="module")
def setup():
    params = dit.init_params(jax.random.key(0), TINY, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, t_len, lc = 2, 10, 5
    ctx = jnp.asarray(rng.standard_normal((b, t_len, TINY.context_dim)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, lc, TINY.hidden_size)), jnp.float32)
    noise = sampler.make_noise([3, 4], (b, t_len, TINY.audio_acoustic_hidden_dim))
    return params, noise, ctx, enc


def _eager_loop(params, noise, ctx, enc, schedule):
    """Literal transcription of the reference loop (generate.py:155-199), eager."""
    xt = np.asarray(noise, dtype=np.float32)
    b = xt.shape[0]
    for i, t in enumerate(schedule):
        t_b = jnp.full((b,), t, jnp.float32)
        vt = np.asarray(
            dit.forward(params, TINY, jnp.asarray(xt), t_b, t_b, enc, ctx),
            dtype=np.float32,
        )
        if i == len(schedule) - 1:
            xt = xt - vt * t
            break
        dt = t - schedule[i + 1]
        xt = xt - vt * dt
    return xt


def test_scan_matches_eager_ode(setup):
    params, noise, ctx, enc = setup
    schedule = sampler.get_timestep_schedule(3.0)
    fast = np.asarray(
        sampler.sample_latents(
            params, TINY, noise, ctx, enc, None, schedule
        ),
        dtype=np.float32,
    )
    slow = _eager_loop(params, noise, ctx, enc, schedule)
    # bf16 activations inside the jitted path vs f32 eager: allow small tolerance
    assert np.isfinite(fast).all()
    cos = (fast.ravel() @ slow.ravel()) / (
        np.linalg.norm(fast) * np.linalg.norm(slow) + 1e-12
    )
    assert cos > 0.995


def test_sde_runs_and_differs(setup):
    params, noise, ctx, enc = setup
    schedule = sampler.get_timestep_schedule(3.0)
    ode = np.asarray(sampler.sample_latents(params, TINY, noise, ctx, enc, None, schedule))
    sde = np.asarray(
        sampler.sample_latents(
            params, TINY, noise, ctx, enc, None, schedule,
            infer_method="sde", sde_key=jax.random.key(9),
        )
    )
    assert ode.shape == sde.shape
    assert np.abs(ode - sde).max() > 1e-4


def test_cover_switch(setup):
    params, noise, ctx, enc = setup
    schedule = sampler.get_timestep_schedule(3.0)
    enc2 = enc * 0.5
    ctx2 = ctx * 0.5
    mixed = np.asarray(
        sampler.sample_latents(
            params, TINY, noise, ctx, enc, None, schedule,
            cover_steps=4,
            encoder_hidden_states_non_cover=enc2,
            context_latents_non_cover=ctx2,
        )
    )
    pure = np.asarray(sampler.sample_latents(params, TINY, noise, ctx, enc, None, schedule))
    assert np.abs(mixed - pure).max() > 1e-4


def test_stepwise_matches_scan(setup):
    """The stepwise sampler must match the scan sampler exactly (ODE path)."""
    params, noise, ctx, enc = setup
    schedule = sampler.get_timestep_schedule(3.0)
    scan_out = np.asarray(sampler.sample_latents(
        params, TINY, noise, ctx, enc, None, schedule))
    step_out = np.asarray(sampler.sample_latents_stepwise(
        params, TINY, noise, ctx, enc, None, schedule))
    np.testing.assert_allclose(scan_out, step_out, atol=2e-5, rtol=2e-5)


def test_stepwise_cover_switch(setup):
    params, noise, ctx, enc = setup
    schedule = sampler.get_timestep_schedule(3.0)
    out = np.asarray(sampler.sample_latents_stepwise(
        params, TINY, noise, ctx, enc, None, schedule,
        cover_steps=4, encoder_hidden_states_non_cover=enc * 0.5,
        context_latents_non_cover=ctx * 0.5))
    base = np.asarray(sampler.sample_latents_stepwise(
        params, TINY, noise, ctx, enc, None, schedule))
    assert np.abs(out - base).max() > 1e-4
