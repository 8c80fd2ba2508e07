"""E2E pipeline tests with tiny random models (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu import pipeline
from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.pipeline import AceStepEngine, GenerationRequest, pack_sequences

TINY_DIT = DiTConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
    sliding_window=8, text_hidden_dim=32,
    num_lyric_encoder_hidden_layers=1, num_timbre_encoder_hidden_layers=1,
    timbre_hidden_dim=8,
)
TINY_VAE = VAEConfig(
    audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
    decoder_input_channels=8, downsampling_ratios=(2, 4, 4),
    channel_multiples=(1, 2, 4),
)
TINY_TEXT = QwenConfig(
    vocab_size=256, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, num_key_value_heads=2, intermediate_size=64,
    head_dim=16,
)


class TestPack:
    def test_valid_first_ordering(self):
        h1 = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4) + 100     # lyric
        m1 = jnp.asarray([[1, 0, 1]], jnp.int32)
        h2 = jnp.arange(8, dtype=jnp.float32).reshape(1, 2, 4) + 200      # style
        m2 = jnp.asarray([[0, 1]], jnp.int32)
        packed_h, packed_m = pack_sequences([(h1, m1), (h2, m2)])
        assert packed_h.shape == (1, 5, 4)
        np.testing.assert_array_equal(np.asarray(packed_m), [[1, 1, 1, 0, 0]])
        # valid tokens in original order: lyric[0], lyric[2], style[1]
        np.testing.assert_array_equal(np.asarray(packed_h[0, 0]), np.asarray(h1[0, 0]))
        np.testing.assert_array_equal(np.asarray(packed_h[0, 1]), np.asarray(h1[0, 2]))
        np.testing.assert_array_equal(np.asarray(packed_h[0, 2]), np.asarray(h2[0, 1]))

    def test_all_valid_passthrough(self):
        h = jnp.ones((2, 4, 8))
        m = jnp.ones((2, 4), jnp.int32)
        ph, pm = pack_sequences([(h, m)])
        np.testing.assert_array_equal(np.asarray(ph), np.asarray(h))


@pytest.fixture(scope="module")
def engine():
    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.vae as vae_mod
    import acestep_tpu.models.qwen as qwen_mod

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    return AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )


def _style_lyric_request(**kw):
    rng = np.random.default_rng(0)
    return GenerationRequest(
        duration_s=10.0,
        style_token_ids=rng.integers(0, 256, (1, 6)),
        lyric_token_ids=rng.integers(0, 256, (1, 9)),
        **kw,
    )


class TestGenerate:
    def test_text2music_e2e(self, engine):
        req = _style_lyric_request(seeds=[42])
        res = engine.generate(req)
        t_valid = pipeline.frames_for_duration(10.0)
        assert res.latents.shape == (1, t_valid, TINY_DIT.audio_acoustic_hidden_dim)
        assert res.audio.shape == (1, t_valid * TINY_VAE.hop_length, 2)
        assert np.isfinite(res.audio).all()
        assert res.sample_rate == 48000
        for k in ("diffusion_time_cost", "vae_time_cost", "total_time_cost"):
            assert res.time_costs[k] > 0

    def test_seed_reproducibility(self, engine):
        a = engine.generate(_style_lyric_request(seeds=[7]))
        b = engine.generate(_style_lyric_request(seeds=[7]))
        np.testing.assert_array_equal(a.latents, b.latents)
        c = engine.generate(_style_lyric_request(seeds=[8]))
        assert np.abs(a.latents - c.latents).max() > 1e-3

    def test_batch_generation(self, engine):
        req = _style_lyric_request(batch_size=2, seeds=[1, 2])
        res = engine.generate(req)
        assert res.audio.shape[0] == 2
        # different seeds -> different outputs
        assert np.abs(res.latents[0] - res.latents[1]).max() > 1e-3

    def test_timbre_conditioning(self, engine):
        rng = np.random.default_rng(1)
        req = _style_lyric_request(seeds=[3])
        req.refer_latents = rng.standard_normal((1, 2, 5, TINY_DIT.timbre_hidden_dim))
        res = engine.generate(req)
        base = engine.generate(_style_lyric_request(seeds=[3]))
        assert np.abs(res.latents - base.latents).max() > 1e-4  # timbre changes output

    def test_repaint_task(self, engine):
        rng = np.random.default_rng(2)
        t_valid = pipeline.frames_for_duration(10.0)
        req = _style_lyric_request(seeds=[4])
        req.task = "repaint"
        req.src_latents = rng.standard_normal((1, t_valid, TINY_DIT.audio_acoustic_hidden_dim)).astype(np.float32)
        req.repaint_start_s = 2.0
        req.repaint_end_s = 6.0
        res = engine.generate(req)
        assert np.isfinite(res.latents).all()

    def test_duration_bucketing(self):
        assert pipeline.bucket_frames(250) == 256
        assert pipeline.bucket_frames(256) == 256
        assert pipeline.bucket_frames(257) == 512
        assert pipeline.frames_for_duration(10.0) == 250
        assert pipeline.frames_for_duration(5.0) == 250     # clamped to min 10 s
        assert pipeline.frames_for_duration(1200.0) == 15000  # clamped to max 600 s
