"""int8-activation q8_0 matmul path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from acestep_tpu.quant import dequantize, quantize_np
from acestep_tpu.ops.pallas.qmm import qmm_int8_act


def test_matches_fp_reference_within_act_quant_noise():
    rng = np.random.default_rng(0)
    K, N, M = 512, 256, 16
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    qt = quantize_np(w, "q8_0")
    ref = np.asarray(jnp.dot(x, dequantize(qt, jnp.bfloat16),
                             preferred_element_type=jnp.float32), dtype=np.float32)
    out = np.asarray(qmm_int8_act(x, qt, interpret=True), dtype=np.float32)
    denom = np.abs(ref).mean() + 1e-9
    # int8 activations add ~1% relative noise on N(0,1)-scale inputs
    assert np.abs(out - ref).mean() / denom < 0.02
    assert np.abs(out - ref).max() / denom < 0.15
