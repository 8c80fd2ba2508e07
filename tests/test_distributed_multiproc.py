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


@pytest.mark.slow
def test_two_process_bootstrap_and_collectives(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    for i, out in enumerate(outs):
        assert f"proc {i} MULTIPROC_OK" in out
