"""Ring collective matmul (parallel/collective_matmul.py): parity with
matmul+psum on the virtual mesh, and the TP DiT forward under the flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from acestep_tpu.parallel.collective_matmul import (
    allgather_chunks, allreduce_matmul, reduce_scatter_matmul)


def _mesh(n):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs).reshape(n), ("tp",))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_allreduce_matmul_matches_psum(n):
    mesh = _mesh(n)
    rng = np.random.default_rng(0)
    k_total, nn, b = 64 * n, 32 * n, 6
    x = jnp.asarray(rng.standard_normal((b, k_total)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k_total, nn)), jnp.float32)

    @jax.jit
    def ref(x, w):
        def body(xl, wl):
            return jax.lax.psum(
                jnp.einsum("bk,kn->bn", xl, wl,
                           preferred_element_type=jnp.float32), "tp")

        return shard_map(body, mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
                         out_specs=P(None, None), check_rep=False)(x, w)

    @jax.jit
    def ring(x, w):
        def body(xl, wl):
            return allreduce_matmul(xl, wl, "tp")

        return shard_map(body, mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
                         out_specs=P(None, None), check_rep=False)(x, w)

    np.testing.assert_allclose(np.asarray(ring(x, w)), np.asarray(ref(x, w)),
                               rtol=1e-5, atol=1e-4)


def test_reduce_scatter_chunk_ownership():
    """Rank r's reduce-scatter output is exactly output chunk r."""
    n = 4
    mesh = _mesh(n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32 * n)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32 * n, 16 * n)), jnp.float32)
    full = np.asarray(x @ w)

    @jax.jit
    def rs(x, w):
        def body(xl, wl):
            return reduce_scatter_matmul(xl, wl, "tp")

        # each rank keeps its own chunk -> concatenating shards along the last
        # axis in rank order must reproduce the full product
        return shard_map(body, mesh=mesh, in_specs=(P(None, "tp"), P("tp", None)),
                         out_specs=P(None, "tp"), check_rep=False)(x, w)

    np.testing.assert_allclose(np.asarray(rs(x, w)), full, rtol=1e-5, atol=1e-4)


def test_allgather_chunks_rank_order():
    n = 4
    mesh = _mesh(n)

    @jax.jit
    def ag(y):
        def body(yl):
            return allgather_chunks(yl, "tp")

        return shard_map(body, mesh=mesh, in_specs=(P(None, "tp"),),
                         out_specs=P(None, None), check_rep=False)(y)

    y = jnp.arange(4 * 8, dtype=jnp.float32).reshape(4, 8)
    np.testing.assert_array_equal(np.asarray(ag(y)), np.asarray(y))


def test_tp_dit_forward_under_flag(monkeypatch):
    """The TP sampler with ACESTEP_TPU_COLLECTIVE_MATMUL=1 matches the plain
    psum TP path (and therefore the single-device forward)."""
    monkeypatch.setenv("ACESTEP_TPU_COLLECTIVE_MATMUL", "0")
    import tests.test_dit as td
    from acestep_tpu.models import dit
    from acestep_tpu.parallel.tp import make_tp_sampler
    from acestep_tpu import sampler as sampler_mod

    n = 2                                        # TINY has 4/2 heads
    mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n), ("dp", "tp"))
    params = dit.init_params(jax.random.key(0), td.TINY, dtype=jnp.float32)
    stacked = dit.stack_params(params)
    hs, ctx, enc, t = td._inputs()
    schedule = sampler_mod.get_timestep_schedule(3.0)[:2]

    tp = make_tp_sampler(td.TINY, mesh, stacked)
    base = tp(stacked, hs, ctx, enc, None,
              jax.random.key(1), None, schedule=schedule)
    monkeypatch.setenv("ACESTEP_TPU_COLLECTIVE_MATMUL", "1")
    tp2 = make_tp_sampler(td.TINY, mesh, stacked)
    ring = tp2(stacked, hs, ctx, enc, None,
               jax.random.key(1), None, schedule=schedule)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(base),
                               rtol=2e-4, atol=2e-4)


def test_bench_tool_cpu_mesh_smoke():
    """tools/bench_collective_matmul.py runs on a virtual CPU mesh and reports
    ring-vs-psum rows with parity asserted (VERDICT r4 item 9: the harness
    that measures ICI overlap the day >=2 real chips exist)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "bench_collective_matmul.py"),
         "--cpu-mesh", "2", "--reps", "2", "--tiny"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["decision_data"] is False          # CPU mesh != decision data
    assert out["rows"] and out["rows"][0]["max_rel_err"] < 2e-2
    assert out["rows"][0]["ring_ms"]["min"] > 0


class TestRowParallelCoverage:
    """VERDICT r4 item 7: every row-parallel projection can ride the ring path
    — LM serving o_proj/down_proj and the vocab-sharded head gather, on top of
    the DiT sites covered by test_tp_dit_forward_under_flag."""

    @pytest.mark.parametrize("tp", [2, 4, 8])
    def test_lm_tp_greedy_under_flag(self, tp, monkeypatch):
        import tests.test_lm_tp as tl
        from acestep_tpu.parallel.lm_tp import LMTPContext
        from acestep_tpu.serving import SamplingParams

        sp = SamplingParams(temperature=0.0, max_new_tokens=8)
        ids, lens = jnp.asarray(tl.PROMPT), jnp.asarray(tl.LENGTHS)

        monkeypatch.setenv("ACESTEP_TPU_COLLECTIVE_MATMUL", "0")
        ctx = tl._tp_ctx(tl.TINY, tl._mesh(1, tp))
        base, base_n = ctx.generate(ids, lens, jax.random.key(0), sp)

        monkeypatch.setenv("ACESTEP_TPU_COLLECTIVE_MATMUL", "1")
        ctx2 = tl._tp_ctx(tl.TINY, tl._mesh(1, tp))
        ring, ring_n = ctx2.generate(ids, lens, jax.random.key(0), sp)

        np.testing.assert_array_equal(np.asarray(base), np.asarray(ring))
        np.testing.assert_array_equal(np.asarray(base_n), np.asarray(ring_n))

    def test_lm_tp_quantized_head_ring_gather(self, monkeypatch):
        """q8 weights: the ring path dequantizes row-parallel kernels to bf16,
        so assert logits-level agreement (not bit-exact tokens) plus a stable
        greedy argmax on the first step."""
        import tests.test_lm_tp as tl
        from acestep_tpu.serving import SamplingParams

        sp = SamplingParams(temperature=0.0, max_new_tokens=4)
        ids, lens = jnp.asarray(tl.PROMPT), jnp.asarray(tl.LENGTHS)

        monkeypatch.setenv("ACESTEP_TPU_COLLECTIVE_MATMUL", "0")
        ctx = tl._tp_ctx(tl.QUANT, tl._mesh(1, 8), quant="q8_0")
        base, _ = ctx.generate(ids, lens, jax.random.key(0), sp)

        monkeypatch.setenv("ACESTEP_TPU_COLLECTIVE_MATMUL", "1")
        ctx2 = tl._tp_ctx(tl.QUANT, tl._mesh(1, 8), quant="q8_0")
        ring, _ = ctx2.generate(ids, lens, jax.random.key(0), sp)

        # bf16-dequant ring vs qmm psum: greedy paths agree at this scale
        np.testing.assert_array_equal(np.asarray(base), np.asarray(ring))

    def test_row_parallel_linear_non_divisible_falls_back(self):
        """Output dim not divisible by the axis -> silent psum fallback, same
        result (guards against the assert inside allreduce_matmul firing)."""
        import os

        from acestep_tpu.parallel.collective_matmul import row_parallel_linear

        n = 4
        mesh = _mesh(n)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 8 * n)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((8 * n, 30)), jnp.float32)  # 30 % 4 != 0
        os.environ["ACESTEP_TPU_COLLECTIVE_MATMUL"] = "1"
        try:
            @jax.jit
            def run(x, w):
                def body(xl, wl):
                    return row_parallel_linear(xl, wl, "tp")

                return shard_map(body, mesh=mesh,
                                 in_specs=(P(None, "tp"), P("tp", None)),
                                 out_specs=P(None, None), check_rep=False)(x, w)

            got = np.asarray(run(x, w))
        finally:
            os.environ.pop("ACESTEP_TPU_COLLECTIVE_MATMUL", None)
        np.testing.assert_allclose(got, np.asarray(x @ w), rtol=1e-5, atol=1e-4)
