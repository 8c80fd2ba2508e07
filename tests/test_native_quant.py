"""Native C++ quantizers must match the numpy golden implementations."""

import numpy as np
import pytest

from acestep_tpu.native import get_native
from acestep_tpu.quant import quantize_np
from acestep_tpu.quant.native_bridge import f32_to_bf16_fast, quantize_native
from acestep_tpu.utils.safetensors_io import f32_to_bf16_raw

nat = get_native()
pytestmark = pytest.mark.skipif(nat is None, reason="native toolchain unavailable")


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
def test_matches_numpy(fmt):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((512, 96)) * 0.07).astype(np.float32)
    a = quantize_np(w, fmt)
    b = quantize_native(w, fmt)
    for f in ("data", "data_hi", "scales", "sub_scales", "sub_mins", "super_scales", "super_mins"):
        av, bv = getattr(a, f), getattr(b, f)
        assert (av is None) == (bv is None), f
        if av is not None:
            av = np.asarray(av).astype(np.float32)
            bv = np.asarray(bv).astype(np.float32)
            mismatch = (av != bv).mean()
            assert mismatch < 1e-3, f"{fmt}.{f}: mismatch {mismatch}"


def test_bf16_matches_numpy():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(100000) * 10).astype(np.float32)
    np.testing.assert_array_equal(f32_to_bf16_fast(x), f32_to_bf16_raw(x))


def test_speed_advantage():
    import time

    rng = np.random.default_rng(2)
    w = rng.standard_normal((2048, 2048)).astype(np.float32)
    t0 = time.perf_counter(); quantize_native(w, "q8_0"); t_nat = time.perf_counter() - t0
    t0 = time.perf_counter(); quantize_np(w, "q8_0"); t_np = time.perf_counter() - t0
    assert t_nat < t_np  # native must beat the numpy chain on this host
