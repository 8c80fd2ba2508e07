"""REAL multi-process jax.distributed test (SURVEY.md §5.8, P2).

Spawns two OS processes that bootstrap through
``acestep_tpu.parallel.distributed.initialize`` (the multi-host entry point),
form the global (dp, tp) mesh spanning both processes, and run a
cross-process psum plus a dp-sharded jitted matmul — XLA:CPU routes the
collectives over Gloo exactly like DCN routes them between TPU hosts.

The reference never tests its NCCL TP path (SURVEY.md §4.6); this closes the
"bootstrap exists but multi-host is untested" gap to the extent one machine
allows: two processes, two device sets, real collective traffic between them.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, {repo!r})
from acestep_tpu.parallel import distributed

ok = distributed.initialize(coordinator_address=coord, num_processes=2,
                            process_id=pid)
assert ok and jax.process_count() == 2, "multi-process bootstrap failed"

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

devs = jax.devices()
assert len(devs) == 4, f"expected 4 global devices, got {{len(devs)}}"
mesh = Mesh(np.array(devs).reshape(2, 2), ("dp", "tp"))

# 1) cross-process psum over dp (dp spans the two processes)
f = shard_map(lambda x: jax.lax.psum(x, axis_name="dp"),
              mesh=mesh, in_specs=P("dp", None), out_specs=P(None, None))
gx = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp", None)),
    np.full((1, 8), pid + 1.0, np.float32))
out = np.asarray(f(gx).addressable_shards[0].data)
assert out[0, 0] == 3.0, out            # 1 (proc 0) + 2 (proc 1)

# 2) dp-sharded jitted matmul: batch spans processes, weights replicated
w = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4)), jnp.float32)
xb = np.random.default_rng(pid).standard_normal((2, 8)).astype(np.float32)
gxb = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp", None)), xb)
y = jax.jit(lambda x, w: x @ w,
            out_shardings=NamedSharding(mesh, P("dp", None)))(gxb, w)
local = np.asarray(y.addressable_shards[0].data)
np.testing.assert_allclose(local, xb @ np.asarray(w), rtol=1e-5)

print(f"proc {{pid}} MULTIPROC_OK", flush=True)
"""


_ENGINE_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, {repo!r})
from acestep_tpu.parallel import distributed

ok = distributed.initialize(coordinator_address=coord, num_processes=2,
                            process_id=pid)
assert ok and jax.process_count() == 2, "multi-process bootstrap failed"

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.experimental import multihost_utils as mhu

from tests.test_pipeline import TINY_DIT, TINY_VAE, TINY_TEXT
import acestep_tpu.models.dit as dit_mod
import acestep_tpu.models.vae as vae_mod
import acestep_tpu.models.qwen as qwen_mod
from acestep_tpu.pipeline import AceStepEngine, GenerationRequest
from acestep_tpu.serving.batcher import ContinuousBatcher, merge_requests

devs = jax.devices()
assert len(devs) == 4
mesh = Mesh(np.array(devs).reshape(2, 2), ("dp", "tp"))   # dp SPANS processes

k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
dit_p = dit_mod.init_params(k1, TINY_DIT, dtype=jnp.float32)
vae_p = vae_mod.init_params(k2, TINY_VAE)
text_p = qwen_mod.init_params(k3, TINY_TEXT, dtype=jnp.float32)

local = AceStepEngine(dit_p, TINY_DIT, vae_p, TINY_VAE, text_p, TINY_TEXT)
meshed = AceStepEngine(dit_p, TINY_DIT, vae_p, TINY_VAE, text_p, TINY_TEXT,
                       mesh=mesh)

STYLE = np.arange(16, dtype=np.int32).reshape(2, 8) % 250

def make_req(seeds):
    return GenerationRequest(
        duration_s=10.0, durations_s=[10.0, 10.0], batch_size=2,
        style_token_ids=STYLE.copy(),
        style_mask=np.ones_like(STYLE), seeds=list(seeds))

def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))

# 1) full engine.generate under the cross-process (dp=2, tp=2) mesh, with
#    latent parity vs the single-device engine on identical seeds
ref = local.generate(make_req([3, 4]))
out = meshed.generate(make_req([3, 4]))
err = rel_err(out.latents, ref.latents)
assert err < 2e-3, f"cross-process engine diverges: rel={{err:.2e}}"
assert out.audio_i16 is not None and out.audio_i16.shape == ref.audio_i16.shape
print(f"proc {{pid}} CROSSPROC_ENGINE_OK rel={{err:.2e}}", flush=True)

# 2) continuous batcher accepting requests ON PROCESS 0 with DP-sharded
#    execution: process 0 merges, broadcasts the merged batch over the
#    distributed runtime (the DCN control plane), both processes enter the
#    SAME SPMD computation; results return to the accepting host
PAY = 256
def encode(req):
    # merged requests pad token ids up to the frame/token bucket, so the
    # payload carries (batch, width) explicitly
    buf = np.zeros(PAY, np.float32)
    buf[0] = 1.0
    buf[1] = req.batch_size
    buf[2] = req.style_token_ids.shape[1]
    buf[3:3 + len(req.seeds)] = np.asarray(req.seeds, np.float32)
    ids = req.style_token_ids.ravel()
    buf[16:16 + ids.size] = ids
    mask = req.style_mask.ravel()
    buf[16 + ids.size:16 + 2 * ids.size] = mask
    return buf

def decode(buf):
    b, w = int(buf[1]), int(buf[2])
    seeds = [int(s) for s in buf[3:3 + b]]
    ids = buf[16:16 + b * w].astype(np.int32).reshape(b, w)
    mask = buf[16 + b * w:16 + 2 * b * w].astype(np.int32).reshape(b, w)
    return GenerationRequest(
        duration_s=10.0, durations_s=[10.0] * b, batch_size=b,
        style_token_ids=ids, style_mask=mask, seeds=seeds)

def run_merged(req):
    mhu.broadcast_one_to_all(encode(req), is_source=True)
    return meshed.generate(req)

if pid == 0:
    bat = ContinuousBatcher(run_merged, max_batch=2, max_wait_s=5.0).start()
    futs = [bat.submit(GenerationRequest(
                duration_s=10.0, batch_size=1,
                style_token_ids=STYLE[i:i + 1].copy(),
                style_mask=np.ones((1, 8), np.int32), seeds=[3 + i]))
            for i in range(2)]
    parts = [f.result(timeout=600) for f in futs]
    bat.stop()
    mhu.broadcast_one_to_all(np.zeros(PAY, np.float32), is_source=True)  # stop
    assert bat.stats["batches"] == 1, "requests did not merge into one batch"
    assert all(p.latents.shape[0] == 1 for p in parts)
    merged_lat = np.concatenate([p.latents for p in parts], axis=0)
    err = rel_err(merged_lat, ref.latents)      # same seeds/styles as ref
    assert err < 2e-3, f"batched cross-process result diverges: rel={{err:.2e}}"
else:
    while True:
        buf = mhu.broadcast_one_to_all(np.zeros(PAY, np.float32),
                                       is_source=False)
        if buf[0] < 0.5:
            break
        meshed.generate(decode(buf))
print(f"proc {{pid}} CROSSPROC_BATCH_OK", flush=True)
"""


def _run_two_procs(tmp_path, worker_src, timeout, n_local_devices=2):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(worker_src.format(repo=REPO))

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    return outs


@pytest.mark.slow
def test_two_process_bootstrap_and_collectives(tmp_path):
    outs = _run_two_procs(tmp_path, _WORKER, timeout=300)
    for i, out in enumerate(outs):
        assert f"proc {i} MULTIPROC_OK" in out


@pytest.mark.slow
def test_two_process_engine_and_batcher(tmp_path):
    """Full AceStepEngine.generate on a 2-process (dp=2, tp=2) mesh with
    latent parity vs single-process, then a ContinuousBatcher accepting
    requests on process 0 with DP-sharded execution across both — the first
    actual rehearsal of cross-host continuous batching (VERDICT r4 item 6;
    reference analog: nano-vllm rank processes, llm_engine.py:33-40)."""
    outs = _run_two_procs(tmp_path, _ENGINE_WORKER, timeout=900)
    for i, out in enumerate(outs):
        assert f"proc {i} CROSSPROC_ENGINE_OK" in out, out
        assert f"proc {i} CROSSPROC_BATCH_OK" in out, out
