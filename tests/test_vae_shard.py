"""Mesh-sharded VAE decode: windows distributed over every mesh device.

VERDICT r4 item 1: the VAE was replicated under the mesh and decoded windows
serially on one chip even when a (dp, tp) mesh was up — 1.19 s of configs[2]'s
2.83 s.  Overlap-discard windows are embarrassingly data-parallel, so the
sharded path spreads the window batch across dp x tp and must be bit-parity
with the single-device seams (same per-window math, same trim plan).
Reference to beat: handler.py:2848 tiled_decode (strictly serial).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import acestep_tpu.models.vae as vae_mod
from acestep_tpu.parallel import make_mesh
from tests.test_pipeline import TINY_DIT, TINY_TEXT, TINY_VAE


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, dp=2, tp=4)


def _latents(t, seed=0, scale=0.01, b=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((b, t, TINY_VAE.decoder_input_channels)) * scale,
        jnp.float32)


@pytest.mark.parametrize("t,chunk", [(96, 16), (72, 16), (48, 16)])
def test_sharded_tiled_decode_matches_serial(mesh, t, chunk):
    """fused_tiled_decode_int16 with mesh == without, including window counts
    that do NOT divide the 8-device mesh (pad-and-drop path)."""
    params = vae_mod.init_params(jax.random.key(0), TINY_VAE)
    latents = _latents(t)
    n_windows = len(vae_mod._window_plan(t, chunk, None))
    assert n_windows >= 2

    i16_ser, scale_ser = vae_mod.fused_tiled_decode_int16(
        params, TINY_VAE, latents, chunk_frames=chunk, max_window_batch=2)
    i16_sh, scale_sh = vae_mod.fused_tiled_decode_int16(
        params, TINY_VAE, latents, chunk_frames=chunk, max_window_batch=2,
        mesh=mesh)

    assert float(scale_ser) == float(scale_sh)
    np.testing.assert_array_equal(np.asarray(i16_ser), np.asarray(i16_sh))


def test_sharded_segment_decode_matches_serial(mesh):
    """The segmented path's per-segment program under the mesh."""
    params = vae_mod.init_params(jax.random.key(1), TINY_VAE)
    t, chunk = 64, 16
    latents = _latents(t, seed=3)
    windows = vae_mod._window_plan(t, chunk, None)
    seg = windows[:3]
    lo, hi = seg[0][2], seg[-1][3]
    rel = tuple((cs - lo, ce - lo, ws - lo, we - lo) for cs, ce, ws, we in seg)

    i16_ser, s_ser = vae_mod.fused_decode_windows_int16(
        params, TINY_VAE, latents[:, lo:hi, :], rel, max_window_batch=2)
    i16_sh, s_sh = vae_mod.fused_decode_windows_int16(
        params, TINY_VAE, latents[:, lo:hi, :], rel, max_window_batch=2,
        mesh=mesh)
    assert float(s_ser) == float(s_sh)
    np.testing.assert_array_equal(np.asarray(i16_ser), np.asarray(i16_sh))


def test_sharded_decode_merged_batch(mesh):
    """b > 1 merged continuous-batching requests shard (item, window) pairs."""
    params = vae_mod.init_params(jax.random.key(2), TINY_VAE)
    latents = _latents(48, seed=5, b=3)
    i16_ser, s_ser = vae_mod.fused_tiled_decode_int16(
        params, TINY_VAE, latents, chunk_frames=16, max_window_batch=2)
    i16_sh, s_sh = vae_mod.fused_tiled_decode_int16(
        params, TINY_VAE, latents, chunk_frames=16, max_window_batch=2,
        mesh=mesh)
    assert float(s_ser) == float(s_sh)
    np.testing.assert_array_equal(np.asarray(i16_ser), np.asarray(i16_sh))


def test_engine_uses_sharded_decode_under_mesh(monkeypatch):
    """The meshed engine auto-shards the window decode and its PCM matches the
    single-device engine bit-for-bit (<=1 LSB on the loud-rescale path)."""
    import dataclasses

    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.qwen as qwen_mod
    from acestep_tpu import memory_planner as mp
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    dit_p = dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32)
    vae_p = vae_mod.init_params(k2, TINY_VAE)
    text_p = qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32)

    single = AceStepEngine(dit_p, TINY_DIT, vae_p, TINY_VAE, text_p, TINY_TEXT)
    # TINY_DIT has 4/2 heads: tp=2 divides; windows still shard over all 8
    meshed = AceStepEngine(dit_p, TINY_DIT, vae_p, TINY_VAE, text_p, TINY_TEXT,
                           mesh=make_mesh(8, dp=4, tp=2))
    assert meshed._vae_mesh() is not None
    monkeypatch.setenv("ACESTEP_TPU_VAE_SHARD", "0")
    assert meshed._vae_mesh() is None       # env kill-switch
    monkeypatch.delenv("ACESTEP_TPU_VAE_SHARD")

    real_plan = mp.plan_request

    def small_chunk_plan(*a, **kw):
        return dataclasses.replace(real_plan(*a, **kw), vae_chunk_frames=256)

    monkeypatch.setattr(mp, "plan_request", small_chunk_plan)
    monkeypatch.setenv("ACESTEP_TPU_VAE_SEGMENT_WINDOWS", "0")  # whole-song path
    rng = np.random.default_rng(11)
    req = GenerationRequest(
        duration_s=60.0, style_token_ids=rng.integers(0, 250, (1, 8)), seeds=[3])

    # isolate the VAE leg: the SAME meshed engine with window sharding on vs
    # off must agree to <=1 LSB (the DiT TP sampler upstream carries its own
    # collective reduction-order noise, so single-vs-meshed only compares
    # approximately — that parity is test_mesh_engine's job)
    res_sharded = meshed.generate(req)
    monkeypatch.setenv("ACESTEP_TPU_VAE_SHARD", "0")
    res_serial = meshed.generate(req)
    monkeypatch.delenv("ACESTEP_TPU_VAE_SHARD")
    a, b = res_serial.audio_i16, res_sharded.audio_i16
    assert a.shape == b.shape
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1

    # and the meshed stack stays sane vs the single-device engine end-to-end
    res_single = single.generate(req)
    c = res_single.audio_i16.astype(np.float32)
    d = res_sharded.audio_i16.astype(np.float32)
    denom = float(np.linalg.norm(c)) or 1.0
    assert float(np.linalg.norm(c - d)) / denom < 5e-2
