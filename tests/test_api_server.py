"""REST API server tests (real HTTP over localhost)."""

import json
import time
import urllib.request

import pytest

from acestep_tpu.serving.api_server import ApiServer


def _post(port, path, obj, api_key=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    if api_key:
        req.add_header("Authorization", f"Bearer {api_key}")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path, api_key=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
    if api_key:
        req.add_header("Authorization", f"Bearer {api_key}")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def server():
    def gen(payload):
        if payload.get("fail"):
            raise RuntimeError("boom")
        time.sleep(0.05)
        return {"audio_len": 42, "caption": payload.get("caption", "")}

    srv = ApiServer(
        gen,
        create_sample_fn=lambda q: {"caption": f"sample for {q}"},
        format_input_fn=lambda t: {"caption": t.upper()},
        api_key="",
    )
    port = srv.start(port=0)
    yield srv, port
    srv.stop()


def _wait_result(port, task_id, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        _, res = _post(port, "/query_result", {"task_id": task_id})
        if res["status"] in ("completed", "failed"):
            return res
        time.sleep(0.05)
    raise TimeoutError


def test_job_lifecycle(server):
    srv, port = server
    code, out = _post(port, "/release_task", {"caption": "piano"})
    assert code == 200 and "task_id" in out
    res = _wait_result(port, out["task_id"])
    assert res["status"] == "completed"
    assert res["result"]["caption"] == "piano"


def test_failed_job_reports_error(server):
    srv, port = server
    _, out = _post(port, "/release_task", {"fail": True})
    res = _wait_result(port, out["task_id"])
    assert res["status"] == "failed"
    assert "boom" in res["error"]


def test_health_models_stats(server):
    srv, port = server
    assert _get(port, "/health")[1]["status"] == "ok"
    assert "models" in _get(port, "/v1/models")[1]
    _post(port, "/release_task", {})
    stats = _get(port, "/v1/stats")[1]
    assert stats["submitted"] >= 1


def test_unknown_task(server):
    srv, port = server
    code, _ = _post(port, "/query_result", {"task_id": "nope"})
    assert code == 404


def test_lm_flows(server):
    srv, port = server
    _, out = _post(port, "/create_random_sample", {"query": "jazz"})
    assert out["caption"] == "sample for jazz"
    _, out = _post(port, "/format_input", {"text": "abc"})
    assert out["caption"] == "ABC"


def test_api_key_auth():
    srv = ApiServer(lambda p: {}, api_key="secret")
    port = srv.start(port=0)
    try:
        code, _ = _post(port, "/release_task", {})
        assert code == 401
        code, _ = _post(port, "/release_task", {}, api_key="secret")
        assert code == 200
        assert _get(port, "/health")[0] == 200  # health stays open
    finally:
        srv.stop()


def test_request_parser_aliases():
    from acestep_tpu.serving.api_server import RequestParser

    p = RequestParser({
        "prompt": "jazzy piano",
        "audioDuration": "45",
        "param_obj": {"keyScale": "C major"},
        "metas": '{"bpm": 120, "timeSignature": "4"}',
        "useRandomSeed": "false",
    })
    assert p.str("caption") == "jazzy piano"
    assert p.float("duration") == 45.0
    assert p.str("keyscale") == "C major"
    assert p.int("bpm") == 120
    assert p.str("timesignature") == "4"
    assert p.bool("use_random_seed", True) is False
    assert p.get("nonexistent", "dflt") == "dflt"
    # precedence: raw payload wins over param_obj/metas
    p2 = RequestParser({"bpm": 90, "metas": '{"bpm": 120}'})
    assert p2.int("bpm") == 90


def test_v1_audio_download_and_traversal_guard(tmp_path):
    import json as _json
    import urllib.request
    import urllib.error
    import numpy as np
    from acestep_tpu.serving.api_server import ApiServer
    from acestep_tpu.utils.audio import write_wav

    wav = np.zeros((100, 2), np.float32)
    write_wav(str(tmp_path / "x.wav"), wav, 48000)
    srv = ApiServer(lambda p: {"ok": True}, audio_dir=str(tmp_path))
    port = srv.start(port=0)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/audio?path=x.wav", timeout=10) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            assert len(r.read()) > 44
        # traversal blocked
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/audio?path=../../etc/passwd", timeout=10)
            blocked = False
        except urllib.error.HTTPError as e:
            blocked = e.code == 403
        assert blocked
    finally:
        srv.stop()
