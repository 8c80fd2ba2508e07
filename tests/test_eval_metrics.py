"""Quality-metric tests (definitions match the reference eval tools)."""

import numpy as np

from acestep_tpu.eval_metrics import cosine, lsd, mae, rmse, snr_db, waveform_metrics


def test_identical_signals():
    x = np.random.default_rng(0).standard_normal(48000)
    m = waveform_metrics(x, x)
    assert m["mae"] == 0 and m["rmse"] == 0
    assert m["cosine"] == 1.0
    assert m["snr_db"] == float("inf")
    assert m["lsd"] < 1e-9


def test_known_snr():
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(48000)
    noise = rng.standard_normal(48000)
    noise *= np.linalg.norm(sig) / np.linalg.norm(noise) / 10  # -> 20 dB
    assert abs(snr_db(sig, sig + noise) - 20.0) < 0.5


def test_cosine_orthogonal():
    t = np.arange(4096) / 48000
    a = np.sin(2 * np.pi * 440 * t)
    b = np.cos(2 * np.pi * 440 * t)
    assert abs(cosine(a, b)) < 0.02


def test_lsd_sensitive_to_spectrum():
    rng = np.random.default_rng(2)
    t = np.arange(48000) / 48000
    a = np.sin(2 * np.pi * 440 * t)
    b = np.sin(2 * np.pi * 880 * t)      # different spectrum
    c = a * 0.9                          # same spectrum, lower gain
    assert lsd(a, b) > lsd(a, c)


def test_stereo_input():
    x = np.random.default_rng(3).standard_normal((48000, 2))
    y = x + 0.01 * np.random.default_rng(4).standard_normal((48000, 2))
    m = waveform_metrics(x, y)
    assert 0.99 < m["cosine"] <= 1.0
    assert 35 < m["snr_db"] < 45
