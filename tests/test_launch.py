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


def test_generate_fn_audio_uploads():
    """src/refer audio uploads reach the engine: the server VAE-encodes the
    upload into src_latents (repaint) / refer_latents (timbre) and the repaint
    span + cover strength knobs ride the payload (gradio events/generate.py
    audio-upload flow)."""
    from acestep_tpu.utils.audio import wav_bytes

    engine = _engine()
    gen = make_generate_fn(engine, tokenizer=MiniTok())
    sr = engine.vae_cfg.sampling_rate
    rng = np.random.default_rng(1)
    src = (rng.standard_normal((sr * 2, 2)) * 0.1).astype(np.float32)
    src_b64 = base64.b64encode(wav_bytes(src, sr)).decode()

    base = gen({"caption": "x", "duration": 10, "seed": 5})
    rep = gen({"caption": "x", "duration": 10, "seed": 5,
               "task_type": "repaint", "src_audio_base64": src_b64,
               "repaint_start": 2.0, "repaint_end": 6.0})
    assert rep["audio_base64"] != base["audio_base64"]     # src conditioning took
    cov = gen({"caption": "x", "duration": 10, "seed": 5,
               "task_type": "cover", "src_audio_base64": src_b64,
               "refer_audio_base64": "data:audio/wav;base64," + src_b64,
               "audio_cover_strength": 0.5})
    assert cov["audio_base64"] not in (base["audio_base64"], rep["audio_base64"])
    # duration defaults to the source length when unset
    auto = gen({"caption": "x", "task_type": "repaint",
                "src_audio_base64": src_b64, "seed": 5})
    assert auto["audio_base64"]


def test_generate_fn_cfg_knobs():
    gen = make_generate_fn(_engine(), tokenizer=MiniTok())
    out = gen({"caption": "x", "duration": 10, "guidance_scale": 3.0,
               "inference_steps": 4})
    assert out["audio_format"] == "wav"
    assert out["time_costs"]["diffusion_time_cost"] > 0


def test_full_generate_fn_lm_pipeline(monkeypatch):
    """make_full_generate_fn drives the FULL pipeline (LM CoT+codes ->
    metadata merge -> DiT) from a raw payload, incl. the per-phase temperature
    + constrained-decoding knobs of the reference param block
    (api_server.py:2280-2315)."""
    import acestep_tpu.lm_pipeline as lp
    from acestep_tpu.lm_pipeline import LMPipeline
    from acestep_tpu.serving.launch import make_full_generate_fn
    from tests.test_inference import MockTok, TINY_TEXT as LM_CFG

    monkeypatch.setattr(lp, "AUDIO_CODEBOOK_SIZE", 100)
    engine = _engine()
    lm = LMPipeline(
        qwen_mod.init_params(jax.random.key(4), LM_CFG, dtype=jnp.float32),
        LM_CFG, MockTok())
    gen = make_full_generate_fn(engine, lm)
    out = gen({
        "caption": "warm pads", "lyrics": "oh", "duration": 10,
        "seed": 2, "bpm": 128,
        "lm_codes_temperature": 0.0, "constrained_decoding": True,
    })
    data = base64.b64decode(out["audio_base64"])
    assert data[:4] == b"RIFF"
    assert out["metadata"].get("bpm") == 128      # user metadata wins
    assert out["cot_text"].startswith("<think>")
    assert "bpm: 128" in out["cot_text"]          # FSM injected user value
    assert "lm_phase2_time_cost" in out["time_costs"]


def test_generate_fn_mp3_output():
    """audio_format=mp3 returns a real LAME stream (decodable by mpg123) when
    the system libraries are present; wav fallback otherwise."""
    from acestep_tpu.utils import mp3 as mp3_mod

    gen = make_generate_fn(_engine(), tokenizer=MiniTok())
    out = gen({"caption": "retro beat", "duration": 10,
               "audio_format": "mp3", "seed": 4})
    data = base64.b64decode(out["audio_base64"])
    if mp3_mod.encoder_available():
        assert out["audio_format"] == "mp3"
        assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0   # frame sync
        if mp3_mod.decoder_available():
            audio, sr = mp3_mod.decode_mp3_bytes(data)
            assert sr == out["sample_rate"]
            assert audio.shape[0] > 0 and np.isfinite(audio).all()
    else:
        assert out["audio_format"] == "wav"
        assert data[:4] == b"RIFF"
