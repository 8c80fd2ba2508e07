"""OpenRouter-compatible server tests."""

import base64
import json
import urllib.request

import numpy as np
import pytest

from acestep_tpu.serving.openrouter_server import OpenRouterServer, parse_chat_messages
from acestep_tpu.utils.audio import read_wav


class TestParse:
    def test_caption_metadata_lyrics(self):
        msg = [{"role": "user", "content":
                "dreamy synthwave with heavy bass\nbpm: 110\nduration: 30\n"
                "[verse]\nneon lights again\n[chorus]\nrun away"}]
        p = parse_chat_messages(msg)
        assert p["caption"] == "dreamy synthwave with heavy bass"
        assert p["metadata"]["bpm"] == 110 and p["metadata"]["duration"] == 30
        assert "[verse]" in p["lyrics"] and "run away" in p["lyrics"]

    def test_multipart_content(self):
        msg = [{"role": "user", "content": [
            {"type": "text", "text": "jazz piano"}, {"type": "image_url", "url": "x"}]}]
        assert parse_chat_messages(msg)["caption"] == "jazz piano"

    def test_takes_last_user_message(self):
        msg = [
            {"role": "user", "content": "first"},
            {"role": "assistant", "content": "ok"},
            {"role": "user", "content": "second request"},
        ]
        assert parse_chat_messages(msg)["caption"] == "second request"


def test_chat_completion_roundtrip(tmp_path):
    def gen(parsed):
        assert parsed["caption"] == "calm piano"
        audio = np.zeros((4800, 2), np.float32)
        audio[:, 0] = np.sin(np.arange(4800) * 0.05) * 0.5
        return {"audio": audio, "sample_rate": 48000,
                "metadata": {"bpm": 80, **parsed["metadata"]}}

    srv = OpenRouterServer(gen)
    port = srv.start(port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({
                "model": "acestep/v15-turbo-tpu",
                "messages": [{"role": "user", "content": "calm piano\nduration: 10"}],
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            out = json.loads(r.read())
        msg = out["choices"][0]["message"]
        meta = json.loads(msg["content"])
        assert meta["bpm"] == 80 and meta["duration"] == 10
        wav = base64.b64decode(msg["audio"]["data"])
        p = tmp_path / "x.wav"
        p.write_bytes(wav)
        audio, sr = read_wav(str(p))
        assert sr == 48000 and audio.shape == (4800, 2)
        # models endpoint
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/models", timeout=5) as r:
            models = json.loads(r.read())
        assert models["data"][0]["id"].startswith("acestep/")
    finally:
        srv.stop()


def test_streaming_chunks():
    """stream:true must yield SSE chunks: role -> content+audio -> finish -> [DONE]."""
    import json as _json
    import urllib.request
    import numpy as np
    from acestep_tpu.serving.openrouter_server import OpenRouterServer

    def fake_gen(parsed):
        return {"audio": np.zeros((100, 2), np.float32), "sample_rate": 48000,
                "metadata": {"bpm": 100}}

    srv = OpenRouterServer(fake_gen)
    port = srv.start(port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=_json.dumps({
                "messages": [{"role": "user", "content": "make music"}],
                "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.headers["Content-Type"].startswith("text/event-stream")
            raw = resp.read().decode()
    finally:
        srv.stop()
    events = [ln[6:] for ln in raw.split("\n") if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [_json.loads(e) for e in events[:-1]]
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    content_chunks = [c for c in chunks
                      if "audio" in c["choices"][0]["delta"]]
    assert len(content_chunks) == 1
    meta = _json.loads(content_chunks[0]["choices"][0]["delta"]["content"])
    assert meta == {"bpm": 100}
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"


def test_stats_latency_histogram():
    """/v1/stats exposes latency percentiles after a completed job."""
    import json as _json
    import time as _time
    import urllib.request
    from acestep_tpu.serving.api_server import ApiServer

    def gen(payload):
        return {"ok": True, "time_costs": {"diffusion_time_cost": 0.01}}

    srv = ApiServer(gen)
    port = srv.start(port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/release_task",
            data=b'{"duration": 30}', headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            task_id = _json.loads(r.read())["task_id"]
        for _ in range(100):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/query_result",
                data=_json.dumps({"task_id": task_id}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=10) as r:
                job = _json.loads(r.read())
            if job["status"] == "completed":
                break
            _time.sleep(0.05)
        assert job["status"] == "completed"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/stats", timeout=10) as r:
            stats = _json.loads(r.read())
    finally:
        srv.stop()
    assert "latency" in stats
    assert stats["latency"]["job_wall"]["count"] >= 1
    assert "p90" in stats["latency"]["job_wall"]
    assert stats["latency"]["diffusion_time_cost"]["count"] >= 1


def test_tagged_prompt_lyrics_parse():
    from acestep_tpu.serving.openrouter_server import parse_chat_messages

    out = parse_chat_messages([{
        "role": "user",
        "content": "make this: <prompt>dark techno</prompt>\n"
                   "<lyrics>[verse]\nmidnight run</lyrics>",
    }])
    assert out["caption"] == "dark techno"
    assert out["lyrics"] == "[verse]\nmidnight run"
