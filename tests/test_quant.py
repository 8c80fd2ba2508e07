"""Golden tests for the block-quant formats.

Verifies the quantization math against the reference formulas
(acestep_ggml export path / ggml quantize kernels) and checks reconstruction
error budgets per bit width.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.quant import (
    BLOCK,
    SUPER,
    dequantize,
    dequantize_np,
    quantize_np,
    supported_format_for,
)


def _rand(k, n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((k, n)) * scale).astype(np.float32)


class TestQ80:
    def test_exact_formula_single_block(self):
        # one block, hand-checkable: d = amax/127, q = round(x/d)
        w = np.zeros((BLOCK, 1), dtype=np.float32)
        w[:4, 0] = [1.27, -0.635, 0.01, -1.27]
        qt = quantize_np(w, "q8_0")
        d = 1.27 / 127.0
        w_rec = dequantize_np(qt)
        assert abs(float(qt.scales[0, 0]) - d) < 1e-4
        np.testing.assert_allclose(w_rec[0, 0], 1.27, atol=1e-3)
        # fp16 scale storage adds a ~0.1% relative wobble on top of the d/2 lsb bound
        np.testing.assert_allclose(w_rec[1, 0], -0.635, atol=d / 2 * 1.05 + 1e-4)

    def test_roundtrip_error(self):
        w = _rand(256, 64)
        qt = quantize_np(w, "q8_0")
        err = np.abs(dequantize_np(qt) - w)
        # q8_0: error bounded by half an lsb of the per-block scale
        scales = np.repeat(np.asarray(qt.scales, dtype=np.float32), BLOCK, axis=0)
        # fp16 scale storage adds ~2^-11 relative wobble on top of the half-lsb bound
        assert np.all(err <= scales * 0.5 + np.abs(w) * 2.0**-10 + 1e-6)
        assert qt.bits_per_weight == pytest.approx(8.5, abs=0.01)

    def test_zero_block(self):
        w = np.zeros((BLOCK, 4), dtype=np.float32)
        qt = quantize_np(w, "q8_0")
        np.testing.assert_array_equal(dequantize_np(qt), w)


class TestQ40:
    def test_signed_absmax_scale(self):
        # reference picks the SIGNED max-|x| value: d = signed_max / -8
        w = np.zeros((SUPER, 1), dtype=np.float32)
        w[0, 0] = -2.0  # absmax is negative -> d = +0.25
        w[1, 0] = 1.0
        qt = quantize_np(w, "q4_0")
        assert float(qt.scales[0, 0]) == pytest.approx(0.25, abs=1e-3)
        rec = dequantize_np(qt)
        assert rec[0, 0] == pytest.approx(-2.0, abs=0.126)
        assert rec[1, 0] == pytest.approx(1.0, abs=0.126)

    def test_roundtrip_error(self):
        w = _rand(256, 64, seed=1)
        qt = quantize_np(w, "q4_0")
        err = np.abs(dequantize_np(qt) - w)
        scales = np.repeat(np.abs(np.asarray(qt.scales, dtype=np.float32)), BLOCK, axis=0)
        # q4_0's offset-8 grid clips the positive extreme to 7d -> full-lsb bound there
        assert np.all(err <= scales * 1.0 + np.abs(w) * 2.0**-10 + 1e-5)
        assert qt.bits_per_weight == pytest.approx(4.5, abs=0.01)

    def test_nibble_packing_order(self):
        # a distinct per-row staircase must survive the fold-256 pack/unpack
        w = (np.arange(SUPER, dtype=np.float32)[:, None] % 16 - 8) / 8.0
        qt = quantize_np(w, "q4_0")
        rec = dequantize_np(qt)
        np.testing.assert_allclose(rec, w, atol=0.13)


class TestQ4K:
    def test_roundtrip_error_beats_q4_0_on_shifted_data(self):
        # asymmetric data: q4_k's per-block min should beat q4_0
        rng = np.random.default_rng(2)
        w = (rng.standard_normal((SUPER * 2, 32)) * 0.5 + 1.5).astype(np.float32)
        err_k = np.abs(dequantize_np(quantize_np(w, "q4_k")) - w).mean()
        err_0 = np.abs(dequantize_np(quantize_np(w, "q4_0")) - w).mean()
        assert err_k < err_0

    def test_bpw(self):
        w = _rand(SUPER * 4, 128, seed=3)
        qt = quantize_np(w, "q4_k")
        assert qt.bits_per_weight < 4.7

    def test_all_positive_block(self):
        w = np.abs(_rand(SUPER, 8, seed=4)) + 0.1
        qt = quantize_np(w, "q4_k")
        rec = dequantize_np(qt)
        assert np.abs(rec - w).mean() < 0.05

    def test_rmse_budget(self):
        w = _rand(SUPER * 4, 256, seed=5)
        rec = dequantize_np(quantize_np(w, "q4_k"))
        rmse = np.sqrt(((rec - w) ** 2).mean())
        # 16-level block quant of N(0,1): step ~ 4.4sigma/15, rmse ~ step/sqrt(12) ~ 0.085
        assert rmse < 0.09
        rec0 = dequantize_np(quantize_np(w, "q4_0"))
        rmse0 = np.sqrt(((rec0 - w) ** 2).mean())
        assert rmse < rmse0  # asymmetric q4_k beats q4_0 at the same 4-bit width


class TestQ6K:
    def test_exact_formula_single_super(self):
        """Per 16-block: d_b = signed_absmax/-32; super d = max|d_b|/127;
        ls = round(d_b/d); q = round(x/(d*ls)) in [-32, 31] stored +32
        (ggml quantize_row_q6_K structure: 16x16 sub-blocks, int8 scales)."""
        w = _rand(SUPER, 4, seed=11, scale=0.3)
        qt = quantize_np(w, "q6_k")
        assert qt.data.shape == (SUPER // 2, 4)
        assert qt.data_hi.shape == (SUPER // 4, 4)
        assert qt.sub_scales.shape == (SUPER // 16, 4)
        assert np.asarray(qt.sub_scales).dtype == np.int8
        # hand-check block 0, column 0
        col = w[:16, 0]
        i = np.abs(col).argmax()
        d_b = col[i] / -32.0
        ds = np.asarray(qt.super_scales, np.float32)[0, 0]
        ls = np.asarray(qt.sub_scales)[0, 0]
        assert abs(ls - np.trunc(d_b / ds + np.copysign(0.5, d_b / ds))) <= 1
        rec = dequantize_np(qt)
        # the absmax element reconstructs within one 6-bit step
        assert abs(rec[i, 0] - col[i]) <= abs(d_b * ls) * (1.0 + 1e-3) + 1e-6

    def test_roundtrip_error_between_q8_and_q4(self):
        w = _rand(SUPER * 4, 128, seed=12)
        r8 = np.sqrt(((dequantize_np(quantize_np(w, "q8_0")) - w) ** 2).mean())
        r6 = np.sqrt(((dequantize_np(quantize_np(w, "q6_k")) - w) ** 2).mean())
        r4 = np.sqrt(((dequantize_np(quantize_np(w, "q4_k")) - w) ** 2).mean())
        assert r8 < r6 < r4
        # 64-level quant of N(0,1): step ~ 2sigma*... budget ~0.025
        assert r6 < 0.03

    def test_bpw(self):
        qt = quantize_np(_rand(SUPER * 4, 128, seed=13), "q6_k")
        assert abs(qt.bits_per_weight - 6.5625) < 0.01

    def test_crumb_packing_order(self):
        from acestep_tpu.quant.formats import _pack_crumbs, _unpack_crumbs_np
        rng = np.random.default_rng(14)
        q = rng.integers(0, 4, (512, 8)).astype(np.uint8)
        assert np.array_equal(_unpack_crumbs_np(_pack_crumbs(q)), q)

    def test_zero_and_constant_blocks(self):
        w = np.zeros((SUPER, 8), np.float32)
        rec = dequantize_np(quantize_np(w, "q6_k"))
        assert np.abs(rec).max() == 0.0
        w2 = np.full((SUPER, 8), -0.25, np.float32)
        rec2 = dequantize_np(quantize_np(w2, "q6_k"))
        assert np.abs(rec2 - w2).max() < 0.01


class TestInfra:
    def test_pytree_roundtrip(self):
        qt = quantize_np(_rand(SUPER, 16), "q4_k")
        leaves, treedef = jax.tree_util.tree_flatten(qt)
        qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert qt2.fmt == "q4_k" and qt2.shape == qt.shape

    def test_dequantize_jit(self):
        qt = quantize_np(_rand(SUPER, 16), "q8_0")
        out = jax.jit(lambda q: dequantize(q, jnp.float32))(qt)
        np.testing.assert_allclose(np.asarray(out), dequantize_np(qt), rtol=1e-6)

    def test_format_fallback(self):
        assert supported_format_for(384, "q4_k") == "q8_0"   # 384 % 256 != 0
        assert supported_format_for(2048, "q4_k") == "q4_k"
        assert supported_format_for(33, "q8_0") == "bf16"
        assert supported_format_for(64, "q4_0") == "q8_0"   # fold packing needs K % 256
        assert supported_format_for(512, "q4_0") == "q4_0"
