"""CLI smoke tests (tiny engine via monkeypatched configs)."""

import json
import sys

import numpy as np
import pytest


def _tiny_engine(*a, **k):
    import jax
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
    from acestep_tpu.models import dit as dm, qwen as qm, vae as vm
    from acestep_tpu.pipeline import AceStepEngine

    dit_cfg = DiTConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        in_channels=24, audio_acoustic_hidden_dim=8, patch_size=2,
        sliding_window=8, text_hidden_dim=32,
        num_lyric_encoder_hidden_layers=0, num_timbre_encoder_hidden_layers=0,
        timbre_hidden_dim=8,
    )
    vae_cfg = VAEConfig(audio_channels=2, encoder_hidden_size=16, decoder_channels=8,
                        decoder_input_channels=8, downsampling_ratios=(2, 4, 4),
                        channel_multiples=(1, 2, 4))
    text_cfg = QwenConfig(vocab_size=151000 + 1024, hidden_size=32, num_hidden_layers=1,
                          num_attention_heads=2, num_key_value_heads=2,
                          intermediate_size=64, head_dim=16)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    return AceStepEngine(
        dm.init_params(k1, dit_cfg, dtype=jnp.float32), dit_cfg,
        vm.init_params(k2, vae_cfg), vae_cfg,
        qm.init_params(k3, text_cfg, dtype=jnp.float32), text_cfg,
    )


def test_cli_pipeline(tmp_path, monkeypatch, capsys):
    import cli as cli_mod
    import acestep_tpu.pipeline as pl

    monkeypatch.setattr(pl, "build_random_engine", _tiny_engine)
    out = tmp_path / "o.wav"
    rc = cli_mod.main(["--pipeline", "--audio-seconds", "10",
                       "--out", str(out), "--compile-cache", ""])
    assert rc == 0
    printed = capsys.readouterr().out.strip().splitlines()[-1]
    info = json.loads(printed)
    assert info["mode"] == "pipeline"
    assert out.exists()
    from acestep_tpu.utils.audio import read_wav

    audio, sr = read_wav(str(out))
    assert sr == 48000 and audio.shape[0] == info["samples"]


def test_cli_text_encoder(monkeypatch, capsys, tmp_path):
    import cli as cli_mod
    import acestep_tpu.pipeline as pl

    monkeypatch.setattr(pl, "build_random_engine", _tiny_engine)
    tok = tmp_path / "style.txt"
    tok.write_text("1 2 3 4 5")
    rc = cli_mod.main(["--text-encoder", "--style-tokens", str(tok), "--compile-cache", ""])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["mode"] == "text-encoder"
    assert info["shape"][1] == 5


def test_edit_formatted_prompt(tmp_path):
    """$EDITOR round-trip: a sed-as-editor rewrite lands in caption/lyrics."""
    import cli

    ed = tmp_path / "ed.sh"
    ed.write_text("#!/bin/sh\nsed -i 's/synthwave/jazz fusion/' \"$1\"\n")
    ed.chmod(0o755)
    cap, lyr = cli.edit_formatted_prompt(
        "dreamy synthwave", "la la", editor=str(ed))
    assert cap == "dreamy jazz fusion" and lyr == "la la"
    # failing editor leaves inputs untouched
    bad = tmp_path / "bad.sh"
    bad.write_text("#!/bin/sh\nexit 1\n")
    bad.chmod(0o755)
    assert cli.edit_formatted_prompt("a", "b", editor=str(bad)) == ("a", "b")
