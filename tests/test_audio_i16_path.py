"""The int16-through audio path: device-quantized PCM carried to the WAV/FLAC
writers with no host float round-trip (GenerationResult.audio_i16 / pcm16()).

Host economics: this sandbox page-faults large fresh allocations at ~20 MB/s,
so the old int16→f32→int16 round-trip cost ~19 s for a 600 s song.  These
tests pin the semantics: lazy .audio reconstruction, pcm16 parity with the
float path (reference peak-normalize semantics, acestep/audio_utils.py:24),
zero-copy WAV bytes, and batcher slicing of the int16 payload.
"""

import numpy as np
import pytest

from acestep_tpu.pipeline import GenerationResult
from acestep_tpu.utils.audio import read_wav, write_wav


def _result_from_f32(audio_f32):
    """Build the i16-payload result the fused decode path produces."""
    peak = float(np.abs(audio_f32).max())
    scale = 32767.0 * (0.99 / peak if peak > 0.99 else 1.0)
    i16 = np.clip(np.round(audio_f32 * scale), -32768, 32767).astype(np.int16)
    return GenerationResult(
        latents=np.zeros((audio_f32.shape[0], 4, 64), np.float32),
        sample_rate=48000,
        time_costs={},
        seeds=[0] * audio_f32.shape[0],
        audio_i16=i16,
        audio_scale=scale,
    )


class TestGenerationResultI16:
    def test_lazy_audio_reconstruction(self):
        rng = np.random.default_rng(0)
        f32 = (rng.standard_normal((1, 4800, 2)) * 0.5).astype(np.float32)
        res = _result_from_f32(f32)
        lsb = 1.0 / res.audio_scale
        assert np.abs(res.audio - f32).max() <= lsb * 0.51
        assert res.audio is res.audio          # cached

    def test_pcm16_matches_float_path_loud(self):
        """For peak > 0.99 the i16 payload must equal the reference flow
        (peak_normalize to 0.99, then clip+scale in the WAV writer)."""
        rng = np.random.default_rng(1)
        f32 = (rng.standard_normal((1, 4800, 2)) * 3.0).astype(np.float32)
        res_i16 = _result_from_f32(f32)
        res_f32 = GenerationResult(
            latents=res_i16.latents, sample_rate=48000, time_costs={},
            seeds=[0], audio=f32,
        )
        a, b = res_i16.pcm16(), res_f32.pcm16()
        assert a.dtype == b.dtype == np.int16
        assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1

    def test_pcm16_preserves_quiet_amplitude(self):
        """Quiet audio (peak <= 0.99) must NOT be amplified to full scale."""
        f32 = np.full((1, 100, 2), 0.25, np.float32)
        res = _result_from_f32(f32)
        assert abs(int(res.pcm16().max()) - round(0.25 * 32767)) <= 1

    def test_audio_property_without_payload_raises(self):
        res = GenerationResult(
            latents=np.zeros((1, 4, 64), np.float32), sample_rate=48000,
            time_costs={}, seeds=[0],
        )
        with pytest.raises(AttributeError):
            _ = res.audio


class TestWriteWavInt16:
    def test_int16_input_bytes_match_float_input(self, tmp_path):
        rng = np.random.default_rng(2)
        f32 = (rng.standard_normal((4800, 2)) * 0.7).astype(np.float32)
        pcm = np.round(np.clip(f32.astype(np.float64), -1, 1) * 32767).astype(np.int16)
        p1, p2 = tmp_path / "a.wav", tmp_path / "b.wav"
        write_wav(str(p1), f32, 48000)
        write_wav(str(p2), pcm, 48000)
        assert p1.read_bytes() == p2.read_bytes()

    def test_int16_roundtrip_via_read_wav(self, tmp_path):
        pcm = np.array([[-32768, 32767], [0, 1], [100, -100]], np.int16)
        p = tmp_path / "c.wav"
        write_wav(str(p), pcm, 48000)
        audio, sr = read_wav(str(p))
        assert sr == 48000
        assert np.abs(audio * 32767.0 - pcm.clip(-32767, None)).max() <= 1.01


class TestBatcherSplitI16:
    def test_split_result_slices_i16_payload(self):
        from acestep_tpu.serving.batcher import split_result

        rng = np.random.default_rng(3)
        f32 = (rng.standard_normal((3, 960, 2)) * 2.0).astype(np.float32)
        res = _result_from_f32(f32)
        res.audio_lengths = [960, 480, 240]
        parts = split_result(res, [1, 2])
        assert [p.audio_i16.shape[0] for p in parts] == [1, 2]
        assert parts[1].audio_scale == res.audio_scale
        np.testing.assert_array_equal(parts[1].audio_i16, res.audio_i16[1:])
        # lazy f32 still works on slices
        assert parts[0].audio.shape == (1, 960, 2)
