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
        out = {"audio_len": 42, "caption": payload.get("caption", "")}
        if payload.get("return_lrc"):
            out["lrc"] = "[00:01.00]line one\n[00:03.50]line two"
            out["lyric_timestamps"] = [1.0, 3.5]
            out["lyric_score"] = 0.42
        return out

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


def test_jobs_listing(server):
    """GET /v1/jobs: newest-first summaries for the studio results tab, no
    audio payload (refetched per task via /query_result)."""
    srv, port = server
    _, a = _post(port, "/release_task", {"caption": "first", "duration": 30})
    _wait_result(port, a["task_id"])
    _, b = _post(port, "/release_task", {"caption": "second", "seed": 7})
    _wait_result(port, b["task_id"])
    code, out = _get(port, "/v1/jobs?limit=10")
    assert code == 200
    jobs = out["jobs"]
    assert [j["caption"] for j in jobs[:2]] == ["second", "first"]
    assert jobs[0]["status"] == "completed" and jobs[0]["seed"] == 7
    assert jobs[1]["duration"] == 30
    assert all("audio_base64" not in j for j in jobs)
    code, out = _get(port, "/v1/jobs?limit=1")
    assert len(out["jobs"]) == 1


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


# -- training + LoRA routes (reference gradio training tab / lora service) ----

class _FakeTrainer:
    def __init__(self, steps=5):
        self.step = 0
        self.history = []
        self.tc = type("TC", (), {"total_steps": steps})()

    def train(self, batches, max_steps=None, log_fn=None, metrics=None):
        for _ in batches:
            if self.step >= (max_steps or 5):
                break
            self.step += 1
            self.history.append(1.0 / self.step)
            time.sleep(0.01)
        return {"steps": self.step}

    def export(self, name="adapter"):
        return f"/tmp/{name}"


def _fake_factory(payload):
    def batches():
        while True:
            yield {}
    return _FakeTrainer(int(payload.get("total_steps", 5))), batches()


class _FakeLoraRuntime:
    def __init__(self):
        self.adapters = {}

    def list_adapters(self):
        return dict(self.adapters)

    def register_from_dir(self, name, path, alpha=16.0):
        self.adapters[name] = {"alpha": alpha, "scale": 1.0, "active": False}

    def activate(self, name, scale=1.0):
        self.adapters[name].update(active=True, scale=scale)

    def deactivate(self, name):
        self.adapters[name]["active"] = False

    def deactivate_all(self):
        for a in self.adapters.values():
            a["active"] = False

    def set_scale(self, name, scale):
        self.adapters[name]["scale"] = scale

    def unregister(self, name):
        self.adapters.pop(name, None)


@pytest.fixture()
def managed_server():
    from acestep_tpu.serving.training_manager import TrainingManager

    srv = ApiServer(
        lambda p: {"ok": True},
        api_key="",
        lora_runtime=_FakeLoraRuntime(),
        training_manager=TrainingManager(trainer_factory=_fake_factory),
    )
    port = srv.start(port=0)
    yield srv, port
    srv.stop()


def test_training_lifecycle(managed_server):
    _, port = managed_server
    code, out = _post(port, "/v1/training/start", {"total_steps": 5})
    assert code == 200 and out["state"] == "starting"
    # double-start rejected while running or completes fast; poll to terminal
    t0 = time.time()
    while time.time() - t0 < 5:
        code, st = _get(port, "/v1/training/status")
        if st["state"] in ("completed", "failed", "stopped"):
            break
        time.sleep(0.05)
    assert st["state"] == "completed", st
    assert st["step"] == 5
    assert st["export_path"] == "/tmp/adapter"
    # restart works after completion
    code, out = _post(port, "/v1/training/start", {"total_steps": 2})
    assert code == 200


def test_training_stop(managed_server):
    _, port = managed_server
    _post(port, "/v1/training/start", {"total_steps": 100000})
    time.sleep(0.2)
    code, out = _post(port, "/v1/training/stop", {})
    assert code == 200
    t0 = time.time()
    while time.time() - t0 < 5:
        _, st = _get(port, "/v1/training/status")
        if st["state"] in ("stopped", "completed"):
            break
        time.sleep(0.05)
    assert st["state"] == "stopped"


def test_training_double_start_conflict(managed_server):
    _, port = managed_server
    _post(port, "/v1/training/start", {"total_steps": 100000})
    time.sleep(0.1)
    code, out = _post(port, "/v1/training/start", {"total_steps": 5})
    assert code == 409 and "error" in out
    _post(port, "/v1/training/stop", {})


def test_lora_routes(managed_server):
    _, port = managed_server
    code, out = _get(port, "/v1/lora")
    assert code == 200 and out["adapters"] == {}
    code, out = _post(port, "/v1/lora",
                      {"action": "register", "name": "a", "path": "/x", "alpha": 8})
    assert code == 200 and out["adapters"]["a"]["alpha"] == 8
    code, out = _post(port, "/v1/lora",
                      {"action": "activate", "name": "a", "scale": 0.5})
    assert out["adapters"]["a"]["active"] and out["adapters"]["a"]["scale"] == 0.5
    code, out = _post(port, "/v1/lora", {"action": "scale", "name": "a", "scale": 2.0})
    assert out["adapters"]["a"]["scale"] == 2.0
    code, out = _post(port, "/v1/lora", {"action": "deactivate", "name": "a"})
    assert not out["adapters"]["a"]["active"]
    code, out = _post(port, "/v1/lora", {"action": "unregister", "name": "a"})
    assert out["adapters"] == {}
    code, out = _post(port, "/v1/lora", {"action": "nope", "name": "a"})
    assert code == 400


def test_training_lora_not_attached(server):
    _, port = server
    code, _ = _get(port, "/v1/training/status")
    assert code == 501
    code, _ = _get(port, "/v1/lora")
    assert code == 501


def test_v1_lyrics(server):
    """POST /v1/lyrics surfaces a completed job's LRC + timestamps (the
    studio's synced-lyrics display); jobs without alignment get an actionable
    409, unknown tasks a 404."""
    srv, port = server
    _, out = _post(port, "/release_task",
                   {"caption": "x", "lyrics": "a\nb", "return_lrc": True})
    _wait_result(port, out["task_id"])
    code, ly = _post(port, "/v1/lyrics", {"task_id": out["task_id"]})
    assert code == 200
    assert ly["lrc"].startswith("[00:01.00]")
    assert ly["lyric_timestamps"] == [1.0, 3.5]
    assert ly["lyric_score"] == 0.42

    _, out2 = _post(port, "/release_task", {"caption": "no-lrc"})
    _wait_result(port, out2["task_id"])
    code, err = _post(port, "/v1/lyrics", {"task_id": out2["task_id"]})
    assert code == 409 and "return_lrc" in err["error"]

    code, _ = _post(port, "/v1/lyrics", {"task_id": "nope"})
    assert code == 404


def test_jobs_delete_and_requeue(server):
    """Results management (VERDICT r4 item 9): delete drops the job from the
    store; requeue resubmits the ORIGINAL payload as a fresh task."""
    srv, port = server
    _, a = _post(port, "/release_task", {"caption": "managed", "seed": 3})
    _wait_result(port, a["task_id"])

    code, out = _post(port, "/v1/jobs/requeue", {"task_id": a["task_id"]})
    assert code == 200 and out["task_id"] != a["task_id"]
    res = _wait_result(port, out["task_id"])
    assert res["status"] == "completed"
    assert res["result"]["caption"] == "managed"     # original payload reran

    code, out = _post(port, "/v1/jobs/delete", {"task_id": a["task_id"]})
    assert code == 200 and out["deleted"] is True
    code, _ = _post(port, "/query_result", {"task_id": a["task_id"]})
    assert code == 404                               # gone from the store
    code, _ = _post(port, "/v1/jobs/delete", {"task_id": a["task_id"]})
    assert code == 404                               # idempotent-ish: 404 now
    code, _ = _post(port, "/v1/jobs/requeue", {"task_id": "nope"})
    assert code == 404
