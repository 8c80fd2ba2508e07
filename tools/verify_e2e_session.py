"""Session verify driver (see .claude/skills/verify): real ApiServer + tiny
engine on CPU, driven over HTTP exactly as the studio JS does — generation,
LoRA determinism, lyrics route, stats.  Exits non-zero on any failure."""

import base64
import hashlib
import json
import sys
import time
import urllib.request

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import acestep_tpu.models.dit as dit_mod  # noqa: E402
import acestep_tpu.models.qwen as qwen_mod  # noqa: E402
import acestep_tpu.models.vae as vae_mod  # noqa: E402
from acestep_tpu.lora_runtime import LoRARuntime  # noqa: E402
from acestep_tpu.pipeline import AceStepEngine  # noqa: E402
from acestep_tpu.serving.api_server import ApiServer  # noqa: E402
from acestep_tpu.serving.launch import make_generate_fn  # noqa: E402
from acestep_tpu.serving.training_manager import TrainingManager  # noqa: E402
from tests.test_pipeline import TINY_DIT, TINY_TEXT, TINY_VAE  # noqa: E402


class MiniTok:
    def encode(self, text):
        return [b % 250 for b in text.encode()][:64]


def post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=60) as r:
        return r.read()


def gen_hash(port, seed=5):
    task = post(port, "/release_task",
                {"caption": "verify melody", "lyrics": "one line",
                 "duration": 10, "seed": seed, "return_lrc": True})
    tid = task["task_id"]
    for _ in range(120):
        res = post(port, "/query_result", {"task_id": tid})
        if res.get("status") == "completed":
            audio = base64.b64decode(res["result"]["audio_base64"])
            return hashlib.sha256(audio).hexdigest(), res["result"]
        if res.get("status") == "failed":
            raise RuntimeError(f"job failed: {res}")
        time.sleep(1.0)
    raise TimeoutError("generation did not complete")


def main():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    dit_unstacked = dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32)
    engine = AceStepEngine(
        dict(dit_unstacked), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    srv = ApiServer(
        make_generate_fn(engine, tokenizer=MiniTok()),
        lora_runtime=LoRARuntime(engine, dit_unstacked),
        training_manager=TrainingManager(),
        api_key="",
    )
    port = srv.start(port=8739)
    try:
        # health + models + studio page
        assert json.loads(get(port, "/health"))["status"] == "ok"
        assert b"lrc" in get(port, "/studio").lower()
        h1, res1 = gen_hash(port, seed=5)
        assert res1.get("lrc", "").startswith("[00:"), "LRC missing"
        h2, _ = gen_hash(port, seed=5)
        assert h1 == h2, "same-seed generation not deterministic"
        h3, _ = gen_hash(port, seed=6)
        assert h3 != h1, "different seed produced identical audio"
        stats = json.loads(get(port, "/v1/stats"))
        assert stats["completed"] >= 3, stats
        print(f"VERIFY OK: deterministic audio {h1[:16]}, "
              f"{stats['completed']} jobs completed")
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
