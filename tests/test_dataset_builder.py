"""Dataset builder scan + label stages."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.training import dataset_builder as db
from acestep_tpu.utils.audio import write_wav


def _make_dir(tmp_path):
    sr = 48000
    t = np.arange(sr) / sr
    a = 0.4 * np.sin(2 * np.pi * 220 * t)[:, None].repeat(2, 1).astype(np.float32)
    write_wav(str(tmp_path / "song_a.wav"), a, sr)
    write_wav(str(tmp_path / "song_b.wav"), a * 0.5, sr)
    (tmp_path / "song_a.txt").write_text("warm analog pad")
    (tmp_path / "song_b.lyrics").write_text("la la la")
    (tmp_path / "metadata.csv").write_text(
        "filename,bpm,keyscale\nsong_b.wav,95,F minor\n")
    return tmp_path


def test_scan_directory(tmp_path):
    d = _make_dir(tmp_path)
    samples = db.scan_directory(str(d))
    assert [s.filename for s in samples] == ["song_a.wav", "song_b.wav"]
    a, b = samples
    assert a.caption == "warm analog pad" and a.is_instrumental
    assert b.lyrics == "la la la" and not b.is_instrumental
    assert b.bpm == 95 and b.keyscale == "F minor"
    assert abs(a.duration_s - 1.0) < 1e-3


def test_label_stage(tmp_path):
    from acestep_tpu.config import QwenConfig
    from acestep_tpu.models import codec, qwen
    from acestep_tpu.lm_pipeline import LMPipeline
    from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT
    from tests.test_lm_pipeline import MockTokenizer, TINY as TINY_LM
    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.vae as vae_mod
    import acestep_tpu.models.qwen as qwen_mod
    from acestep_tpu.pipeline import AceStepEngine

    d = _make_dir(tmp_path)
    samples = db.scan_directory(str(d))

    k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(0), 5)
    engine = AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    lm = LMPipeline(qwen.init_params(k4, TINY_LM, dtype=jnp.float32, scale=0.1),
                    TINY_LM, MockTokenizer())
    codec_params = codec.init_params(k5, hidden=32, latent_dim=TINY_VAE.decoder_input_channels)

    labeled = db.label_all(samples[:1], engine, lm, codec_params)
    assert labeled[0].labeled
    # caption survives (sidecar wins over LM)
    assert labeled[0].caption == "warm analog pad"
