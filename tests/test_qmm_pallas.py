"""Pallas fused dequant-matmul kernel tests (interpret mode on CPU).

On-hardware parity is additionally exercised by bench.py on the real chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.quant import dequantize, quantize_np
from acestep_tpu.ops.pallas.qmm import qmm_pallas, qmm_pallas_nd


def _pair(fmt, k, n, m, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    return x, quantize_np(w, fmt)


def _xla_ref(x, qt):
    return np.asarray(
        jnp.dot(x, dequantize(qt, jnp.bfloat16), preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16), dtype=np.float32)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
@pytest.mark.parametrize("m,k,n", [(64, 512, 256), (100, 1024, 384 * 0 + 256), (7, 512, 128)])
def test_kernel_matches_xla_path(fmt, m, k, n):
    x, qt = _pair(fmt, k, n, m)
    out = np.asarray(qmm_pallas(x, qt, interpret=True), dtype=np.float32)
    ref = _xla_ref(x, qt)
    # identical math modulo f32 accumulation order; compare in units of ref scale
    denom = np.abs(ref).mean() + 1e-9
    assert np.abs(out - ref).max() / denom < 0.02
    assert (out == ref).mean() > 0.98


def test_fallback_small_n():
    # N=64 is tile-unfriendly -> XLA fallback path must be used and still be right
    x, qt = _pair("q8_0", 512, 64, 16)
    out = np.asarray(qmm_pallas(x, qt, interpret=True), dtype=np.float32)
    np.testing.assert_allclose(out, _xla_ref(x, qt), atol=1e-2)


def test_fallback_small_k_q8():
    # K=64 < BK: q8_0 single K-block path
    x, qt = _pair("q8_0", 64, 256, 16)
    out = np.asarray(qmm_pallas(x, qt, interpret=True), dtype=np.float32)
    denom = np.abs(_xla_ref(x, qt)).mean() + 1e-9
    assert np.abs(out - _xla_ref(x, qt)).max() / denom < 0.02


def test_nd_wrapper():
    x, qt = _pair("q4_0", 512, 256, 0)
    x3 = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 512)), jnp.bfloat16)
    out = qmm_pallas_nd(x3, qt, interpret=True)
    assert out.shape == (2, 5, 256)
    flat = qmm_pallas(x3.reshape(10, 512), qt, interpret=True)
    np.testing.assert_array_equal(np.asarray(out).reshape(10, 256), np.asarray(flat))


def test_linear_dispatch_uses_pallas(monkeypatch):
    """ops.linear with backend='pallas' must route through the kernel."""
    from acestep_tpu.ops import qlinear

    called = {}
    import acestep_tpu.ops.pallas.qmm as qmm_mod

    real = qmm_mod.qmm_pallas_nd

    def spy(x, qt, **kw):
        called["yes"] = True
        return real(x, qt, interpret=True)

    monkeypatch.setattr(qmm_mod, "qmm_pallas_nd", spy)
    x, qt = _pair("q8_0", 512, 256, 8)
    y = qlinear.linear(x, qt, backend="pallas")
    assert called.get("yes")
    assert y.shape == (8, 256)


# ---------------------------------------------------------------------------
# stacked-layer (scalar-prefetch) variant
# ---------------------------------------------------------------------------

def _stacked(fmt, L, k, n, seed=0):
    rng = np.random.default_rng(seed)
    ws = [rng.standard_normal((k, n)).astype(np.float32) * 0.05 for _ in range(L)]
    qts = [quantize_np(w, fmt) for w in ws]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    return qts, stacked


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
def test_stacked_matches_per_layer(fmt):
    """qmm_pallas_stacked(x, stacked, li) is BIT-identical to qmm_pallas on the
    sliced layer (same kernel body, same VMEM blocks)."""
    from acestep_tpu.ops.pallas.qmm import qmm_pallas_stacked

    qts, stacked = _stacked(fmt, 3, 512, 256)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 512)), jnp.bfloat16)
    for li in range(3):
        out = qmm_pallas_stacked(x, stacked, jnp.int32(li), interpret=True)
        ref = qmm_pallas(x, qts[li], interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stacked_fallback_tile_unfriendly():
    """N=64 forces the dynamic-index + XLA dequant fallback."""
    from acestep_tpu.ops.pallas.qmm import qmm_pallas_stacked

    qts, stacked = _stacked("q8_0", 2, 512, 64)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 512)), jnp.bfloat16)
    for li in range(2):
        out = np.asarray(qmm_pallas_stacked(x, stacked, jnp.int32(li),
                                            interpret=True), np.float32)
        np.testing.assert_allclose(out, _xla_ref(x, qts[li]), atol=1e-2)


def test_stacked_weight_linear_dispatch():
    """linear() on a StackedWeight matches per-layer linear on every backend."""
    from acestep_tpu.ops import qlinear

    qts, stacked = _stacked("q8_0", 3, 512, 256)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 512)), jnp.bfloat16)
    for li in range(3):
        sw = qlinear.StackedWeight(stacked, jnp.int32(li))
        y = qlinear.linear(x, sw, backend="xla")
        ref = qlinear.linear(x, qts[li], backend="xla")
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_stacked_weight_plain_array():
    from acestep_tpu.ops import qlinear

    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((3, 64, 32)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
    for li in range(3):
        y = qlinear.linear(x, qlinear.StackedWeight(w, jnp.int32(li)))
        ref = qlinear.linear(x, w[li])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6)


def test_stacked_inside_scan():
    """The intended usage: a lax.scan over layer indices with StackedWeight
    built in the body matches the scan-over-sliced-weights form exactly."""
    from acestep_tpu.ops import qlinear

    qts, stacked = _stacked("q8_0", 4, 512, 512, seed=5)
    x0 = jnp.asarray(np.random.default_rng(6).standard_normal((2, 512)), jnp.bfloat16)

    def body_ref(x, qt_l):
        return qlinear.linear(x, qt_l, backend="xla"), None

    def body_sw(x, li):
        return qlinear.linear(
            x, qlinear.StackedWeight(stacked, li), backend="xla"), None

    ref, _ = jax.lax.scan(body_ref, x0, stacked)
    out, _ = jax.lax.scan(body_sw, x0, jnp.arange(4, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("fmt", ["q4_0", "q4_k", "q6_k"])
def test_multigroup_bk_bit_identical(fmt, monkeypatch):
    """4-bit kernels unfold G = bk/256 fold groups per grid step; the group
    sub-dots accumulate in the same K-ascending f32 order regardless of bk,
    so results are BIT-identical across bk in {256, 512, 1024}."""
    x, qt = _pair(fmt, 1024, 512, 128)
    outs = []
    for bk in (256, 512, 1024):
        monkeypatch.setenv("ACESTEP_TPU_QMM_BK", str(bk))
        outs.append(np.asarray(qmm_pallas(x, qt, interpret=True)))
    monkeypatch.delenv("ACESTEP_TPU_QMM_BK")
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
    ref = _xla_ref(x, qt)
    denom = np.abs(ref).mean() + 1e-9
    assert np.abs(outs[0] - ref).max() / denom < 0.02


@pytest.mark.parametrize("fmt", ["q4_0", "q6_k"])
def test_stacked_multigroup_matches_per_layer(fmt):
    """Grouped stacked kernels (mid-M fat tiles, G>1) stay bit-identical to
    qmm_pallas on the sliced layer."""
    from acestep_tpu.ops.pallas.qmm import qmm_pallas_stacked

    qts, stacked = _stacked(fmt, 2, 1024, 512)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((128, 1024)),
                    jnp.bfloat16)
    for li in range(2):
        out = qmm_pallas_stacked(x, stacked, jnp.int32(li), interpret=True)
        ref = qmm_pallas(x, qts[li], interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
