"""Fast host-side dtype helpers (ml_dtypes' bfloat16 astype is scalar-slow)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .safetensors_io import f32_to_bf16_raw


def np_astype_fast(x, dtype):
    """numpy-array cast with a vectorized f32->bf16 fast path (ml_dtypes' native
    astype runs ~1M elems/s; the raw-bits round-to-nearest-even path is ~100x)."""
    if isinstance(x, np.ndarray) and dtype == jnp.bfloat16:
        import ml_dtypes

        return f32_to_bf16_raw(np.ascontiguousarray(x, dtype=np.float32)).view(ml_dtypes.bfloat16)
    return x.astype(dtype)
