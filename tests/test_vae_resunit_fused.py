"""Fused VAE res-unit kernel (ops/pallas/vae_resunit.py) parity vs the XLA
conv path, under pallas interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.models import vae
from acestep_tpu.ops.pallas import vae_resunit


def _unit_params(c, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    rng = np.random.default_rng(key)
    return {
        "snake1": {"alpha": jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32),
                   "beta": jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)},
        "conv1": {"w": jax.random.normal(k1, (7, c, c), jnp.float32) * 0.05,
                  "b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)},
        "snake2": {"alpha": jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32),
                   "beta": jnp.asarray(rng.standard_normal(c) * 0.3, jnp.float32)},
        "conv2": {"w": jax.random.normal(k2, (1, c, c), jnp.float32) * 0.05,
                  "b": jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)},
    }


@pytest.mark.parametrize("dilation", [1, 3, 9])
@pytest.mark.parametrize("length", [4096, 5000])   # exact grid + ragged tail
def test_parity_vs_xla(dilation, length):
    c = 128
    p = _unit_params(c)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, length, c)) * 0.5, jnp.float32)
    ref = np.asarray(vae._res_unit(p, x, dilation))
    got = np.asarray(vae_resunit.fused_res_unit(p, x, dilation,
                                                interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_c256_tile(length=2048):
    c = 256
    p = _unit_params(c, key=3)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, length, c)) * 0.5, jnp.float32)
    ref = np.asarray(vae._res_unit(p, x, 3))
    got = np.asarray(vae_resunit.fused_res_unit(p, x, 3, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_env_gate_off_by_default(monkeypatch):
    """Default path is unchanged (flag off -> XLA convs); flag on with a CPU
    backend also stays XLA (supported() requires a TPU backend)."""
    c = 128
    p = _unit_params(c, key=5)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 512, c)),
                    jnp.float32)
    base = np.asarray(vae._res_unit(p, x, 1))
    monkeypatch.setenv("ACESTEP_TPU_VAE_FUSED", "1")
    again = np.asarray(vae._res_unit(p, x, 1))     # CPU backend -> XLA path
    np.testing.assert_array_equal(base, again)


def test_lax_map_batching_rule():
    """The decode path wraps _res_unit in lax.map (window batching); the
    custom_vmap rule must fold the mapped axis into the kernel grid."""
    c = 128
    p = _unit_params(c, key=7)
    rng = np.random.default_rng(6)
    stack = jnp.asarray(rng.standard_normal((3, 1, 2048, c)) * 0.5, jnp.float32)
    ref = np.asarray(jax.lax.map(lambda x: vae._res_unit(p, x, 3), stack))
    got = np.asarray(jax.lax.map(
        lambda x: vae_resunit.fused_res_unit(p, x, 3, interpret=True),
        stack, batch_size=2))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_grad_through_fused_unit():
    """Training differentiates _res_unit (train_quality_eval VAE phase): the
    custom_vjp must route the backward through the identical-math XLA
    recompute and match the XLA path's gradients."""
    c = 128
    p = _unit_params(c, key=9)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 512, c)) * 0.5, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((1, 512, c)) * 0.5, jnp.float32)

    def loss_fused(w):
        pp = {**p, "conv1": {**p["conv1"], "w": w}}
        y = vae_resunit.fused_res_unit(pp, x, 3, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    def loss_xla(w):
        pp = {**p, "conv1": {**p["conv1"], "w": w}}
        return jnp.mean((vae._res_unit(pp, x, 3) - tgt) ** 2)

    g_fused = np.asarray(jax.grad(loss_fused)(p["conv1"]["w"]))
    g_xla = np.asarray(jax.grad(loss_xla)(p["conv1"]["w"]))
    np.testing.assert_allclose(g_fused, g_xla, atol=1e-5, rtol=1e-4)


def _trio_params(c, key=11):
    return ({"res1": _unit_params(c, key), "res2": _unit_params(c, key + 1),
             "res3": _unit_params(c, key + 2)})


@pytest.mark.parametrize("length", [2048, 3000])
def test_trio_parity_vs_sequential(length):
    """One-kernel trio == three sequential units, INCLUDING the sequence-edge
    zero-pad semantics (units 2/3 must see hard zeros outside the true
    sequence, not unit-1-of-padding values — the in-kernel masks)."""
    c = 128
    blk = _trio_params(c)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((2, length, c)) * 0.5, jnp.float32)
    ref = x
    for name, d in (("res1", 1), ("res2", 3), ("res3", 9)):
        ref = vae._res_unit(blk[name], ref, d)
    got = vae_resunit.fused_res_trio(
        (blk["res1"], blk["res2"], blk["res3"]), x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_trio_lax_map_and_grad():
    c = 128
    blk = _trio_params(c, key=21)
    rng = np.random.default_rng(12)
    stack = jnp.asarray(rng.standard_normal((2, 1, 1024, c)) * 0.5, jnp.float32)
    units = (blk["res1"], blk["res2"], blk["res3"])
    ref = np.asarray(jax.lax.map(
        lambda x: vae._res_unit(blk["res3"],
                                vae._res_unit(blk["res2"],
                                              vae._res_unit(blk["res1"], x, 1),
                                              3), 9), stack))
    got = np.asarray(jax.lax.map(
        lambda x: vae_resunit.fused_res_trio(units, x, interpret=True),
        stack, batch_size=2))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)

    x = stack[0]
    tgt = jnp.zeros_like(x)

    def loss(w):
        u = ({**blk["res1"], "conv1": {**blk["res1"]["conv1"], "w": w}},
             blk["res2"], blk["res3"])
        return jnp.mean((vae_resunit.fused_res_trio(u, x, interpret=True)
                         - tgt) ** 2)

    def loss_ref(w):
        u1 = {**blk["res1"], "conv1": {**blk["res1"]["conv1"], "w": w}}
        y = vae._res_unit(blk["res3"],
                          vae._res_unit(blk["res2"],
                                        vae._res_unit(u1, x, 1), 3), 9)
        return jnp.mean((y - tgt) ** 2)

    g = np.asarray(jax.grad(loss)(blk["res1"]["conv1"]["w"]))
    g_ref = np.asarray(jax.grad(loss_ref)(blk["res1"]["conv1"]["w"]))
    np.testing.assert_allclose(g, g_ref, atol=1e-5, rtol=1e-3)
