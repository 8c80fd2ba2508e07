"""Pluggable CLAP gate (acestep_tpu/eval_clap.py, VERDICT r4 item 8).

No CLAP checkpoint ships in the image, so the fixture SAVES a tiny random
``ClapModel`` + ``ClapProcessor`` in the real transformers on-disk format and
loads it back through the scorer — the exact code path a local laion/clap
download would take.  Covers: load/skip/fail-note semantics, score/delta
math, resampling + chunked long audio, and determinism (Δ of identical audio
is exactly 0).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

from acestep_tpu.eval_clap import load_scorer


@pytest.fixture(scope="module")
def clap_ckpt(tmp_path_factory):
    from transformers import (ClapConfig, ClapAudioConfig, ClapTextConfig,
                              ClapFeatureExtractor, ClapModel, ClapProcessor,
                              RobertaTokenizer)

    d = str(tmp_path_factory.mktemp("clap"))
    # the REAL laion-clap audio geometry (spec 256, 64 mels, 4-stage swin)
    # with tiny hidden dims — smaller spec sizes collapse to zero in the
    # later swin stages
    acfg = ClapAudioConfig(
        hidden_size=128,               # = patch_embeds_hidden_size * 2^3
        num_attention_heads=[1, 1, 1, 1], depths=[1, 1, 1, 1],
        patch_embeds_hidden_size=16, projection_dim=16, spec_size=256,
        num_mel_bins=64, window_size=2, patch_size=4, patch_stride=[4, 4])
    tcfg = ClapTextConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, vocab_size=300, projection_dim=16,
        max_position_embeddings=64)
    torch.manual_seed(0)
    model = ClapModel(ClapConfig(audio_config=acfg.to_dict(),
                                 text_config=tcfg.to_dict(),
                                 projection_dim=16))
    model.save_pretrained(d)
    # spec 256 / 64 mels -> freq_ratio 4 -> <=1024 frames; hop 480 at 48k
    # fits the standard 10 s window
    fe = ClapFeatureExtractor(feature_size=64, sampling_rate=48000,
                              hop_length=480, fft_window_size=1024,
                              max_length_s=10)
    vocab = {"<s>": 0, "</s>": 1, "<pad>": 2, "<unk>": 3, "<mask>": 4}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = 5 + i
    vocab["Ġ"] = 31                      # GPT2-BPE space marker
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = RobertaTokenizer(os.path.join(d, "vocab.json"),
                           os.path.join(d, "merges.txt"))
    ClapProcessor(feature_extractor=fe, tokenizer=tok).save_pretrained(d)
    return d


def test_load_skip_and_fail(tmp_path, capsys, monkeypatch):
    monkeypatch.delenv("ACESTEP_TPU_CLAP_CKPT", raising=False)
    assert load_scorer(None) is None          # unset -> silent skip
    bad = str(tmp_path / "nope")
    assert load_scorer(bad) is None           # unloadable -> None + note
    assert "clap columns skipped" in capsys.readouterr().err


def test_env_fallback(clap_ckpt, monkeypatch):
    monkeypatch.setenv("ACESTEP_TPU_CLAP_CKPT", clap_ckpt)
    assert load_scorer(None) is not None


def test_score_and_delta(clap_ckpt):
    s = load_scorer(clap_ckpt)
    assert s is not None
    rng = np.random.default_rng(0)
    sr = 48000
    a1 = (rng.standard_normal((sr * 2, 2)) * 0.1).astype(np.float32)
    a2 = (rng.standard_normal((sr * 2, 2)) * 0.1).astype(np.float32)
    sc = s.score("warm synth", a1, sr)
    assert -1.0 <= sc <= 1.0
    # identical audio -> exactly zero delta; different audio -> nonzero
    assert s.delta("warm synth", a1, a1, sr) == 0.0
    assert s.delta("warm synth", a2, a1, sr) != 0.0
    # deterministic across calls
    assert s.score("warm synth", a1, sr) == sc


def test_resample_and_chunking(clap_ckpt):
    """Audio at a foreign rate and longer than the window still embeds: the
    scorer resamples to the checkpoint rate and mean-pools window chunks."""
    s = load_scorer(clap_ckpt)
    rng = np.random.default_rng(1)
    audio_44k = (rng.standard_normal((44100 * 5,)) * 0.1).astype(np.float32)
    e = s.audio_embedding(audio_44k, 44100)
    assert e.shape == (16,)
    assert abs(float(np.linalg.norm(e)) - 1.0) < 1e-5


def test_eval_tool_clap_columns(clap_ckpt):
    """The eval_quant_pipeline summary emitter grows clap/clap_delta columns
    when a scorer is present (checked via the scorer contract the tool uses:
    score -> float, fp delta = quant - fp)."""
    s = load_scorer(clap_ckpt)
    rng = np.random.default_rng(2)
    sr = 48000
    fp = (rng.standard_normal((sr,)) * 0.1).astype(np.float32)
    q = fp + rng.standard_normal(fp.shape).astype(np.float32) * 0.01
    cap = "warm analog tape"
    fp_score = s.score(cap, fp, sr)
    q_score = s.score(cap, q, sr)
    assert abs((q_score - fp_score) - s.delta(cap, q, fp, sr)) < 1e-6
