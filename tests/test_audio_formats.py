"""FLAC encoder round-trip + AudioSaver fallback + deterministic UUIDs."""

import numpy as np
import pytest

from acestep_tpu.utils import audio as au
from acestep_tpu.utils.flac import decode_flac, encode_flac


def _tone(n=9000, ch=2, sr=48000):
    t = np.arange(n) / sr
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.3 * np.sin(2 * np.pi * 660 * t)
    return np.stack([left, right], axis=1)[:, :ch].astype(np.float32)


def test_flac_roundtrip_multi_frame():
    x = _tone(9000)         # > 2 frames at BLOCK=4096
    data = encode_flac(x, 48000)
    assert data[:4] == b"fLaC"
    y, sr = decode_flac(data)
    assert sr == 48000
    assert y.shape == x.shape
    # verbatim is lossless up to the 16-bit quantization
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_flac_mono_and_exact_block():
    x = _tone(4096, ch=1)
    y, sr = decode_flac(encode_flac(x, 44100))
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_flac_streaminfo_md5_matches_payload():
    import hashlib
    x = _tone(1000)
    data = encode_flac(x, 48000)
    pcm = np.round(np.clip(x.astype(np.float64), -1, 1) * 32767).astype("<i2")
    md5 = hashlib.md5(pcm.tobytes()).digest()
    # STREAMINFO md5 at fixed offset: 4 magic + 4 block hdr + 18 body bytes
    assert data[8 + 18: 8 + 34] == md5


def test_audio_saver_formats(tmp_path):
    x = _tone(2000)
    saver = au.AudioSaver()
    p_wav = saver.save(x, str(tmp_path / "a.wav"), 48000, "wav")
    assert p_wav.endswith(".wav")
    y, sr = au.read_wav(p_wav)
    assert sr == 48000 and y.shape == x.shape

    p_flac = saver.save(x, str(tmp_path / "b.wav"), 48000, "flac")
    assert p_flac.endswith(".flac")
    y2, sr2 = decode_flac(open(p_flac, "rb").read())
    np.testing.assert_allclose(y2, x, atol=1.0 / 32000)

    from acestep_tpu.utils import mp3 as mp3_mod

    if mp3_mod.encoder_available():
        p_mp3 = saver.save(x, str(tmp_path / "c.mp3"), 48000, "mp3")
        assert p_mp3.endswith(".mp3")
        assert open(p_mp3, "rb").read(2)[0] == 0xFF     # MPEG frame sync
    else:
        with pytest.warns(UserWarning):
            p_mp3 = saver.save(x, str(tmp_path / "c.mp3"), 48000, "mp3")
        assert p_mp3.endswith(".wav")     # graceful fallback


def test_deterministic_uuid_stable():
    x = _tone(512)
    a = au.deterministic_uuid(x, 48000, "req1")
    b = au.deterministic_uuid(x, 48000, "req1")
    c = au.deterministic_uuid(x, 48000, "req2")
    d = au.deterministic_uuid(x * 0.5, 48000, "req1")
    assert a == b and a != c and a != d


def test_save_batch_content_names(tmp_path):
    x = _tone(512)
    saver = au.AudioSaver()
    paths = saver.save_batch([x, x * 0.7], 48000, str(tmp_path), "flac")
    assert len(paths) == 2 and paths[0] != paths[1]
    for p in paths:
        assert p.endswith(".flac")


def test_flac_compresses_tonal_audio():
    """Fixed-predictor + Rice subframes: tonal audio must land well under
    verbatim size; the stream still round-trips bit-exactly (int16 domain)."""
    x = _tone(48000)
    data = encode_flac(x, 48000)
    assert len(data) < 0.6 * x.shape[0] * x.shape[1] * 2
    pcm = np.round(np.clip(x.astype(np.float64), -1, 1) * 32767).astype(np.int16)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(
        np.round(y * 32767).astype(np.int16), pcm)


def test_flac_silence_collapses_to_constant():
    x = np.zeros((48000, 2), np.float32)
    data = encode_flac(x, 48000)
    assert len(data) < 2500            # ~12 frames of CONSTANT subframes
    y, _ = decode_flac(data)
    assert np.abs(y).max() == 0.0


def test_flac_noise_never_expands_past_verbatim():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((20000, 2)) * 0.4).clip(-1, 1).astype(np.float32)
    data = encode_flac(x, 48000)
    verbatim = encode_flac(x, 48000, compress=False)
    assert len(data) <= len(verbatim) * 1.01
    pcm = np.round(np.clip(x.astype(np.float64), -1, 1) * 32767).astype(np.int16)
    y, _ = decode_flac(data)
    np.testing.assert_array_equal(np.round(y * 32767).astype(np.int16), pcm)


def test_flac_fixed_order_warmup_roundtrip():
    """Force high-order predictors: a ramp makes order-2+ optimal; short and
    non-multiple-of-block lengths exercise the warmup + final-frame paths."""
    n = 5000
    ramp = (np.arange(n, dtype=np.float64) / n - 0.5) * 1.2
    x = np.clip(ramp, -1, 1).astype(np.float32)[:, None]
    data = encode_flac(x, 32000)
    assert len(data) < 0.3 * n * 2
    pcm = np.round(np.clip(x.astype(np.float64), -1, 1) * 32767).astype(np.int16)
    y, sr = decode_flac(data)
    assert sr == 32000
    np.testing.assert_array_equal(np.round(y * 32767).astype(np.int16), pcm)


# ---------------------------------------------------------------------------
# mp3 via the system libmp3lame / libmpg123 (utils/mp3.py ctypes binding)
# ---------------------------------------------------------------------------

mp3_mod = pytest.importorskip("acestep_tpu.utils.mp3")
needs_mp3 = pytest.mark.skipif(
    not (mp3_mod.encoder_available() and mp3_mod.decoder_available()),
    reason="libmp3lame/libmpg123 not on this host")


@needs_mp3
def test_mp3_roundtrip_tone():
    sr = 48000
    t = np.arange(sr * 2) / sr
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.5 * np.sin(2 * np.pi * 554 * t)], axis=1).astype(np.float32)
    data = mp3_mod.encode_mp3(x, sr, 320)
    assert len(data) > 70000                     # ~320 kbps x 2 s
    dec, rate = mp3_mod.decode_mp3_bytes(data)
    assert rate == sr and dec.shape[1] == 2
    # find the LAME encoder delay by correlation, then require near-identity
    ref = x[: sr, 0]
    best = max(
        (float(dec[d:d + sr, 0] @ ref)
         / (np.linalg.norm(dec[d:d + sr, 0]) * np.linalg.norm(ref) + 1e-12)
         for d in range(0, 4000, 7) if dec.shape[0] >= d + sr),
    )
    assert best > 0.995


@needs_mp3
def test_mp3_mono_and_rates():
    for sr in (44100, 48000):
        x = (np.sin(2 * np.pi * 330 * np.arange(sr) / sr) * 0.4).astype(np.float32)
        data = mp3_mod.encode_mp3(x, sr, 192)      # mono input upmixes
        dec, rate = mp3_mod.decode_mp3_bytes(data)
        assert rate == sr and dec.shape[0] > sr * 0.9


@needs_mp3
def test_mp3_upload_sniffed(tmp_path):
    """The serving upload decoder sniffs and decodes mp3 payloads."""
    import base64

    from acestep_tpu.serving.launch import _decode_audio_payload

    sr = 48000
    x = (np.sin(2 * np.pi * 220 * np.arange(sr) / sr)[:, None]
         * np.float32(0.4)).astype(np.float32)
    data = mp3_mod.encode_mp3(x, sr, 192)
    audio = _decode_audio_payload(base64.b64encode(data).decode())
    assert audio.ndim == 2 and audio.shape[0] > sr * 0.9
    assert np.isfinite(audio).all()
