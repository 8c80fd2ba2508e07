"""serving.launch glue: payload aliases, flac output, LRC return."""

import base64

import numpy as np
import jax
import jax.numpy as jnp

from acestep_tpu.serving.launch import make_generate_fn
from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT
import acestep_tpu.models.dit as dit_mod
import acestep_tpu.models.vae as vae_mod
import acestep_tpu.models.qwen as qwen_mod
from acestep_tpu.pipeline import AceStepEngine


def _engine():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    return AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )


class MiniTok:
    def encode(self, text):
        return [b % 250 for b in text.encode()][:64]


def test_generate_fn_flac_and_lrc():
    gen = make_generate_fn(_engine(), tokenizer=MiniTok())
    out = gen({
        "prompt": "soft piano",                       # alias for caption
        "lyrics": "line one\nline two",
        "audioDuration": "10",                        # alias for duration
        "audio_format": "flac",
        "return_lrc": True,
        "seed": 3,
    })
    assert out["audio_format"] == "flac"
    data = base64.b64decode(out["audio_base64"])
    assert data[:4] == b"fLaC"
    from acestep_tpu.utils.flac import decode_flac

    audio, sr = decode_flac(data)
    assert sr == out["sample_rate"] and audio.shape[0] > 0
    assert out["lrc"].count("\n") == 1                # two lines
    assert out["lrc"].startswith("[00:")
    assert np.isfinite(out["lyric_score"])
    assert out["metadata"]["caption"] == "soft piano"


def test_generate_fn_cfg_knobs():
    gen = make_generate_fn(_engine(), tokenizer=MiniTok())
    out = gen({"caption": "x", "duration": 10, "guidance_scale": 3.0,
               "inference_steps": 4})
    assert out["audio_format"] == "wav"
    assert out["time_costs"]["diffusion_time_cost"] > 0
