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


class TestCoverStrength:
    def test_cover_switch_changes_output(self, engine):
        """audio_cover_strength < 1 must switch conditions mid-schedule: output
        differs from strength=1.0 (always-cover) and from text2music."""
        rng = np.random.default_rng(7)
        src = rng.standard_normal((1, 250, TINY_DIT.audio_acoustic_hidden_dim)).astype(np.float32)
        refer = rng.standard_normal((1, 1, 20, TINY_DIT.timbre_hidden_dim)).astype(np.float32)
        base_kw = dict(
            duration_s=10.0,
            style_token_ids=rng.integers(0, 256, (1, 6)),
            task="cover", src_latents=src, refer_latents=refer,
            seeds=[3],
        )
        full = engine.generate(GenerationRequest(audio_cover_strength=1.0, **base_kw))
        half = engine.generate(GenerationRequest(audio_cover_strength=0.5, **base_kw))
        zero = engine.generate(GenerationRequest(audio_cover_strength=0.0, **base_kw))
        assert np.isfinite(half.latents).all()
        d_fh = np.abs(full.latents - half.latents).max()
        d_hz = np.abs(half.latents - zero.latents).max()
        assert d_fh > 1e-5           # switch actually happened
        assert d_hz > 1e-5           # and cover_steps count matters

    def test_cover_strength_one_matches_plain_cover(self, engine):
        rng = np.random.default_rng(8)
        src = rng.standard_normal((1, 250, TINY_DIT.audio_acoustic_hidden_dim)).astype(np.float32)
        kw = dict(
            duration_s=10.0,
            style_token_ids=rng.integers(0, 256, (1, 6)),
            task="cover", src_latents=src, seeds=[4],
        )
        a = engine.generate(GenerationRequest(audio_cover_strength=1.0, **kw))
        b = engine.generate(GenerationRequest(**kw))  # default strength 1.0
        np.testing.assert_array_equal(a.latents, b.latents)


class TestBaseModelCFG:
    def test_cfg_path_runs_and_guidance_matters(self, engine):
        kw = dict(duration_s=10.0, seeds=[5])
        rng = np.random.default_rng(9)
        style = rng.integers(0, 256, (1, 6))
        turbo = engine.generate(GenerationRequest(style_token_ids=style, **kw))
        g1 = engine.generate(GenerationRequest(
            style_token_ids=style, guidance_scale=3.0, infer_steps=10, **kw))
        g2 = engine.generate(GenerationRequest(
            style_token_ids=style, guidance_scale=7.0, infer_steps=10, **kw))
        assert np.isfinite(g1.latents).all() and np.isfinite(g2.latents).all()
        assert np.abs(g1.latents - g2.latents).max() > 1e-5   # scale matters
        assert np.abs(g1.latents - turbo.latents).max() > 1e-5

    def test_adg_and_interval(self, engine):
        rng = np.random.default_rng(10)
        style = rng.integers(0, 256, (1, 6))
        kw = dict(duration_s=10.0, seeds=[6], style_token_ids=style,
                  guidance_scale=5.0, infer_steps=6)
        plain = engine.generate(GenerationRequest(**kw))
        adg = engine.generate(GenerationRequest(use_adg=True, **kw))
        gated = engine.generate(GenerationRequest(
            cfg_interval_start=0.3, cfg_interval_end=0.7, **kw))
        assert np.isfinite(adg.latents).all()
        assert np.abs(plain.latents - adg.latents).max() > 1e-5
        assert np.abs(plain.latents - gated.latents).max() > 1e-5

    def test_base_schedule_shape(self):
        from acestep_tpu import sampler as smp
        s = smp.get_base_timestep_schedule(50, shift=1.0)
        assert len(s) == 50 and s[0] == 1.0 and s[-1] > 0
        assert all(a > b for a, b in zip(s, s[1:]))
        s3 = smp.get_base_timestep_schedule(10, shift=3.0)
        assert s3[5] > s[5] * 0  # shifted schedule stays in (0, 1]
        assert all(0 < t <= 1 for t in s3)


class TestLyricAlignmentAPI:
    def test_engine_lyric_timestamps_and_score(self, engine):
        rng = np.random.default_rng(11)
        req = GenerationRequest(
            duration_s=10.0,
            style_token_ids=rng.integers(0, 256, (1, 6)),
            lyric_token_ids=rng.integers(0, 256, (1, 9)),
            seeds=[7],
        )
        res = engine.generate(req)
        stamps, lrc = engine.get_lyric_timestamps(
            res.latents, req,
            lyric_lines=["line one", "line two", "line three"],
            line_token_counts=[3, 3, 3],
        )
        assert stamps.shape == (9,)
        assert (stamps >= 0).all() and (stamps <= 10.5).all()
        assert (np.diff(stamps) >= 0).all()       # monotonic timestamps
        assert lrc.count("\n") == 2 and lrc.startswith("[00:")
        score = engine.get_lyric_score(res.latents, req)
        assert np.isfinite(score)


class TestBaseTasks:
    """extract / lego / complete (base-model tasks, handler.py:2176-2204)."""

    def _src(self, rng):
        return rng.standard_normal((1, 250, TINY_DIT.audio_acoustic_hidden_dim)).astype(np.float32)

    def test_extract_complete_run_like_cover(self, engine):
        rng = np.random.default_rng(12)
        src = self._src(rng)
        style = rng.integers(0, 256, (1, 6))
        for task in ("extract", "complete"):
            res = engine.generate(GenerationRequest(
                duration_s=10.0, style_token_ids=style, task=task,
                src_latents=src, seeds=[8]))
            assert np.isfinite(res.latents).all()
        # identical latent mechanics to cover (instruction differs upstream)
        cov = engine.generate(GenerationRequest(
            duration_s=10.0, style_token_ids=style, task="cover",
            src_latents=src, seeds=[8]))
        ext = engine.generate(GenerationRequest(
            duration_s=10.0, style_token_ids=style, task="extract",
            src_latents=src, seeds=[8]))
        np.testing.assert_array_equal(cov.latents, ext.latents)

    def test_lego_span_masks_and_silences(self, engine):
        rng = np.random.default_rng(13)
        src = self._src(rng)
        style = rng.integers(0, 256, (1, 6))
        spanned = engine.generate(GenerationRequest(
            duration_s=10.0, style_token_ids=style, task="lego",
            src_latents=src, repaint_start_s=2.0, repaint_end_s=5.0, seeds=[9]))
        full = engine.generate(GenerationRequest(
            duration_s=10.0, style_token_ids=style, task="lego",
            src_latents=src, seeds=[9]))
        assert np.isfinite(spanned.latents).all()
        assert np.abs(spanned.latents - full.latents).max() > 1e-5

    def test_task_instruction_resolution(self):
        from acestep_tpu.constants import get_task_instruction

        assert get_task_instruction("extract", "drums") == \
            "Extract the DRUMS track from the audio:"
        assert get_task_instruction("extract") == "Extract the track from the audio:"
        assert get_task_instruction("lego", "bass") == \
            "Generate the BASS track based on the audio context:"
        assert get_task_instruction("complete", None, ["drums", "bass"]) == \
            "Complete the input track with DRUMS | BASS:"
        assert get_task_instruction("text2music") == \
            "Fill the audio semantic mask based on the given conditions:"


class TestReferAudioPath:
    def test_encode_refer_audio_and_generate(self, engine):
        sr = TINY_VAE.sampling_rate
        hop = TINY_VAE.hop_length
        t = np.arange(sr // 4) / sr
        clip = 0.3 * np.sin(2 * np.pi * 440 * t).astype(np.float32)   # mono
        refer = engine.encode_refer_audio([clip, clip * 0.5])
        assert refer.shape[0] == 1 and refer.shape[1] == 2
        assert refer.shape[3] == TINY_VAE.decoder_input_channels
        assert refer.shape[2] <= len(t) // hop + 1
        rng = np.random.default_rng(14)
        res = engine.generate(GenerationRequest(
            duration_s=10.0, style_token_ids=rng.integers(0, 256, (1, 6)),
            refer_latents=refer, seeds=[2]))
        assert np.isfinite(res.latents).all()
