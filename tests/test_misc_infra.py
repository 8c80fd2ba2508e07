"""LocalCache / model resolver / studio route tests."""

import json
import urllib.request

import pytest

from acestep_tpu.local_cache import LocalCache
from acestep_tpu.model_downloader import resolve
from acestep_tpu.serving.api_server import ApiServer


def test_cache_roundtrip(tmp_path):
    c = LocalCache(str(tmp_path))
    c.set("a", {"x": 1})
    assert c.get("a") == {"x": 1}
    assert c.get("missing", 42) == 42
    c.delete("a")
    assert c.get("a") is None


def test_cache_ttl(tmp_path):
    c = LocalCache(str(tmp_path))
    c.set("short", "v", ttl_s=-1)      # already expired
    assert c.get("short") is None
    assert c.clear_expired() >= 1


def test_resolve_local_path(tmp_path):
    p = tmp_path / "ckpt"
    p.mkdir()
    assert resolve("dit_turbo", path=str(p)) == str(p)
    with pytest.raises(FileNotFoundError):
        resolve("dit_turbo", path=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        resolve("dit_turbo", cache_dir=str(tmp_path / "cache"), allow_download=False)


def test_studio_served():
    srv = ApiServer(lambda p: {}, api_key="")
    port = srv.start(port=0)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=5) as r:
            body = r.read().decode()
        assert "ACE-Step" in body and "release_task" in body
    finally:
        srv.stop()


def test_downloader_cli_check(tmp_path, capsys):
    from acestep_tpu.model_downloader import main

    (tmp_path / "ACE-Step__acestep-v15-turbo").mkdir()
    (tmp_path / "ACE-Step__acestep-v15-turbo" / "model.safetensors").write_bytes(b"x")
    rc = main(["--check", "dit_turbo", "--cache-dir", str(tmp_path)])
    assert rc == 0 and "dit_turbo:" in capsys.readouterr().out
    rc = main(["--check", "lm_4B", "--cache-dir", str(tmp_path)])
    assert rc == 1
