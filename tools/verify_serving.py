"""End-to-end serving drive for /verify: real ApiServer + tiny engine on CPU.

Starts the REST server with a tiny random-weight engine, then drives the
exact requests the studio JS sends: release_task -> query_result poll ->
audio_base64 WAV.  Exits 0 with "VERIFY OK" on success.
"""

import base64
import hashlib
import json
import sys
import time
import urllib.request

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT  # noqa: E402
import acestep_tpu.models.dit as dit_mod  # noqa: E402
import acestep_tpu.models.vae as vae_mod  # noqa: E402
import acestep_tpu.models.qwen as qwen_mod  # noqa: E402
from acestep_tpu.pipeline import AceStepEngine  # noqa: E402
from acestep_tpu.serving.api_server import ApiServer  # noqa: E402
from acestep_tpu.serving.launch import make_generate_fn  # noqa: E402


class MiniTok:
    def encode(self, text):
        return [b % 250 for b in text.encode()][:64]


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def main():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    engine = AceStepEngine(
        dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32), TINY_DIT,
        vae_mod.init_params(k2, TINY_VAE), TINY_VAE,
        qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32), TINY_TEXT,
    )
    srv = ApiServer(make_generate_fn(engine, tokenizer=MiniTok()), api_key="")
    port = srv.start(port=0)
    print(f"[verify] server on :{port}")
    try:
        r = _post(port, "/release_task",
                  {"caption": "soft piano", "duration": 10, "seed": 3})
        tid = r["task_id"]
        for _ in range(240):
            res = _post(port, "/query_result", {"task_id": tid})
            st = res.get("status")
            if st == "completed":
                break
            if st == "failed":
                print("[verify] FAILED:", res)
                return 1
            time.sleep(2)
        else:
            print("[verify] timeout")
            return 1
        data = base64.b64decode(res["result"]["audio_base64"])
        assert data[:4] == b"RIFF", data[:16]
        print(f"[verify] wav {len(data)} bytes sha1 "
              f"{hashlib.sha1(data).hexdigest()[:12]}")
        print("VERIFY OK")
        return 0
    finally:
        srv.stop()


if __name__ == "__main__":
    sys.exit(main())
