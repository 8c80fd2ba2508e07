"""Server-side dataset builder: scan + build over REST (reference gradio
dataset tab flow: scan dir -> label -> preprocess to training tensors)."""

import json
import os
import time
import urllib.request

import numpy as np
import pytest

from acestep_tpu.serving.api_server import ApiServer
from acestep_tpu.serving.dataset_manager import DatasetManager
from acestep_tpu.utils.audio import write_wav


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def engine():
    import jax
    import jax.numpy as jnp

    import acestep_tpu.models.dit as dit_mod
    import acestep_tpu.models.qwen as qwen_mod
    import acestep_tpu.models.vae as vae_mod
    from acestep_tpu.pipeline import AceStepEngine
    from tests.test_pipeline import TINY_DIT, TINY_TEXT, TINY_VAE

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    return AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )


@pytest.fixture()
def audio_dir(tmp_path, engine):
    sr = engine.vae_cfg.sampling_rate
    rng = np.random.default_rng(0)
    d = tmp_path / "songs"
    d.mkdir()
    for i in range(2):
        wav = rng.standard_normal((sr, 2)).astype(np.float32) * 0.1
        write_wav(str(d / f"song{i}.wav"), wav, sr)
        (d / f"song{i}.txt").write_text(f"test caption {i}")
    (d / "song0.lyrics").write_text("la la la")
    return str(d)


def test_scan_and_build(tmp_path, engine, audio_dir):
    mgr = DatasetManager(engine)
    out = mgr.scan({"directory": audio_dir})
    assert out["count"] == 2
    assert out["samples"][0]["caption"] == "test caption 0"
    assert out["samples"][0]["lyrics"] == "la la la"
    assert not out["samples"][1]["lyrics"]

    out_dir = str(tmp_path / "ds")
    r = mgr.start_build({"directory": audio_dir, "output_dir": out_dir,
                         "auto_label": False})
    assert r["state"] == "starting"
    for _ in range(600):
        st = mgr.status()
        if st["state"] in ("completed", "failed"):
            break
        time.sleep(0.5)
    assert st["state"] == "completed", st
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert manifest["count"] == 2

    # the output is loadable by the training dataset reader
    from acestep_tpu.training.data import PreprocessedDataset

    ds = PreprocessedDataset(out_dir)
    sample = ds.load(0)
    assert "latents" in sample and sample["latents"].ndim == 2


def test_rest_routes(engine, audio_dir, tmp_path):
    srv = ApiServer(lambda p: {"ok": True}, api_key="",
                    dataset_manager=DatasetManager(engine))
    port = srv.start(port=0)
    try:
        code, out = _post(port, "/v1/dataset/scan", {"directory": audio_dir})
        assert code == 200 and out["count"] == 2
        code, out = _post(port, "/v1/dataset/scan", {"directory": "/nope"})
        assert code == 400
        code, out = _post(port, "/v1/dataset/build", {"directory": audio_dir})
        assert code == 409 and "error" in out          # output_dir missing
        code, out = _post(port, "/v1/dataset/build", {
            "directory": audio_dir, "output_dir": str(tmp_path / "out"),
            "auto_label": False})
        assert code == 200
        for _ in range(600):
            code, st = _get(port, "/v1/dataset/status")
            if st["state"] in ("completed", "failed"):
                break
            time.sleep(0.5)
        assert st["state"] == "completed", st
    finally:
        srv.stop()


def test_not_attached():
    srv = ApiServer(lambda p: {"ok": True}, api_key="")
    port = srv.start(port=0)
    try:
        code, _ = _get(port, "/v1/dataset/status")
        assert code == 501
    finally:
        srv.stop()
