"""Layered settings resolution: defaults < .env < process env < overrides."""

import os

from acestep_tpu.settings import Settings


def test_layered_resolution(tmp_path, monkeypatch):
    envf = tmp_path / ".env"
    envf.write_text("ACESTEP_TPU_QUANT=q4_k\nACESTEP_TPU_SAMPLER=scan\n# c\n")
    # scrub any knobs leaked by earlier tests (apply_env writes the namespace)
    import os as _os

    from acestep_tpu.settings import KNOBS

    for env, _t, _d in KNOBS.values():
        monkeypatch.delenv(env, raising=False)
    monkeypatch.setenv("ACESTEP_TPU_SAMPLER", "step")       # env beats .env

    s = Settings.load(env_file=str(envf), n_devices=8, quant=None)
    assert s.quant == "q4_k" and s.sources["quant"] == str(envf)
    assert s.sampler_mode == "step" and s.sources["sampler_mode"] == "env"
    assert s.blocked_attn_min == 1536 and s.sources["blocked_attn_min"] == "default"
    # tier defaults from device count
    assert s.values["tp"] == 4 and s.values["dp"] == 2
    assert s.values["max_batch"] == 16

    s2 = Settings.load(env_file=str(envf), quant="q8_0")
    assert s2.quant == "q8_0" and s2.sources["quant"] == "override"


def test_apply_env_roundtrip(tmp_path, monkeypatch):
    monkeypatch.delenv("ACESTEP_TPU_INT8_ACT", raising=False)
    s = Settings.load(env_file=str(tmp_path / "nope.env"), int8_act=False)
    s.apply_env()
    assert os.environ["ACESTEP_TPU_INT8_ACT"] == "0"
    assert os.environ["ACESTEP_TPU_SAMPLER"] == "scan"
    assert "quant" in s.describe()
