"""Segmented VAE decode (overlapped d2h) parity with the single-dispatch path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import acestep_tpu.models.vae as vae_mod
from acestep_tpu.utils.audio import wav_bytes, write_wav
from tests.test_pipeline import TINY_DIT, TINY_TEXT, TINY_VAE


def _vae():
    params = vae_mod.init_params(jax.random.key(0), TINY_VAE)
    return params, TINY_VAE


def test_segment_windows_match_whole():
    """Relative-window segments reproduce fused_tiled_decode_int16 exactly
    (quiet audio: every scale is 32767, no rescale involved)."""
    params, cfg = _vae()
    t, chunk = 48, 16
    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, t, cfg.decoder_input_channels))
        * 0.01, jnp.float32)

    i16_whole, scale_whole = vae_mod.fused_tiled_decode_int16(
        params, cfg, latents, chunk_frames=chunk, max_window_batch=2)
    i16_whole = np.asarray(i16_whole)

    windows = vae_mod._window_plan(t, chunk, None)
    assert len(windows) >= 4
    segs = []
    scales = []
    for s0 in range(0, len(windows), 2):
        seg = windows[s0:s0 + 2]
        lo, hi = seg[0][2], seg[-1][3]
        rel = tuple((cs - lo, ce - lo, ws - lo, we - lo) for cs, ce, ws, we in seg)
        i16_g, scale_g = vae_mod.fused_decode_windows_int16(
            params, cfg, latents[:, lo:hi, :], rel, max_window_batch=2)
        segs.append(np.asarray(i16_g))
        scales.append(float(scale_g))

    joined = np.concatenate(segs)
    assert joined.shape == i16_whole.shape
    if all(s == float(scale_whole) for s in scales):
        np.testing.assert_array_equal(joined, i16_whole)
    else:  # loud path: <=1 LSB double-rounding after global rescale
        g = min(scales)
        parts = [np.round(p.astype(np.float32) * (g / s)).astype(np.int16)
                 for p, s in zip(segs, scales)]
        assert np.abs(np.concatenate(parts).astype(np.int32)
                      - i16_whole.astype(np.int32)).max() <= 1


def test_engine_segmented_matches_unsegmented(monkeypatch):
    """AceStepEngine.generate with segmentation on vs off: same PCM."""
    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.qwen as qwen_mod
    from acestep_tpu import memory_planner as mp
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    engine = AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    # force a small decode chunk so a 30 s request produces >= 4 windows
    real_plan = mp.plan_request

    def small_chunk_plan(*a, **kw):
        plan = real_plan(*a, **kw)
        import dataclasses
        return dataclasses.replace(plan, vae_chunk_frames=256)

    monkeypatch.setattr(mp, "plan_request", small_chunk_plan)
    rng = np.random.default_rng(1)
    req = GenerationRequest(
        duration_s=60.0, style_token_ids=rng.integers(0, 250, (1, 8)), seeds=[3])

    monkeypatch.setenv("ACESTEP_TPU_VAE_SEGMENT_WINDOWS", "2")
    seg_res = engine.generate(req)
    assert seg_res.time_costs.get("vae_overlapped") == 1.0
    assert len(seg_res.pcm16_segments()) >= 2

    monkeypatch.setenv("ACESTEP_TPU_VAE_SEGMENT_WINDOWS", "0")
    whole_res = engine.generate(req)
    assert "vae_overlapped" not in whole_res.time_costs

    a = seg_res.audio_i16          # lazy concat of segments
    b = whole_res.audio_i16
    assert a.shape == b.shape
    # scales match exactly in the quiet case; <=1 LSB when the loud rescale ran
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1
    assert seg_res.audio_lengths == whole_res.audio_lengths


def test_wav_writers_accept_segments(tmp_path):
    rng = np.random.default_rng(2)
    full = rng.integers(-30000, 30000, (1000, 2)).astype(np.int16)
    segs = [full[:300], full[300:700], full[700:]]
    assert wav_bytes(segs) == wav_bytes(full)
    p1, p2 = tmp_path / "a.wav", tmp_path / "b.wav"
    write_wav(str(p1), segs)
    write_wav(str(p2), full)
    assert p1.read_bytes() == p2.read_bytes()


def test_engine_short_clip_split(monkeypatch):
    """A 10 s clip (single window at the plan chunk) splits into two
    overlap-discard halves so the audio fetch overlaps decode compute; PCM
    must match the unsegmented whole-song decode."""
    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.qwen as qwen_mod
    from acestep_tpu.pipeline import AceStepEngine, GenerationRequest

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    engine = AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    rng = np.random.default_rng(4)
    req = GenerationRequest(
        duration_s=10.0, style_token_ids=rng.integers(0, 250, (1, 8)), seeds=[7])

    monkeypatch.delenv("ACESTEP_TPU_VAE_SEGMENT_WINDOWS", raising=False)
    monkeypatch.setenv("ACESTEP_TPU_SHORT_CLIP_SPLIT", "1")
    seg_res = engine.generate(req)
    assert seg_res.time_costs.get("vae_overlapped") == 1.0
    assert len(seg_res.pcm16_segments()) == 2
    assert "audio_fetch_time_cost" in seg_res.time_costs

    monkeypatch.setenv("ACESTEP_TPU_VAE_SEGMENT_WINDOWS", "0")
    whole_res = engine.generate(req)
    assert "vae_overlapped" not in whole_res.time_costs

    a, b = seg_res.audio_i16, whole_res.audio_i16
    assert a.shape == b.shape
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1
    assert seg_res.audio_lengths == whole_res.audio_lengths
