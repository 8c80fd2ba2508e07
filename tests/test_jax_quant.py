"""Device-side quantizer must match the numpy converter bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acestep_tpu.quant import quantize_jax, quantize_np


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k", "q6_k"])
def test_matches_numpy_quantizer(fmt):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 128)).astype(np.float32) * 0.07
    a = quantize_np(w, fmt)
    b = quantize_jax(jnp.asarray(w), fmt)
    for f in ("data", "scales", "sub_scales", "sub_mins", "super_scales", "super_mins"):
        av, bv = getattr(a, f), getattr(b, f)
        assert (av is None) == (bv is None)
        if av is not None:
            av32 = np.asarray(av, dtype=np.float32)
            bv32 = np.asarray(bv, dtype=np.float32)
            mismatch = (av32 != bv32).mean()
            # float assoc. differences may flip an lsb on exact .5 ties; near-zero rate
            assert mismatch < 2e-3, f"{fmt}.{f}: {mismatch}"
