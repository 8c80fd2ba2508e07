"""Bridge to the native C++ quantizers (numpy fallback = formats.quantize_np)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .formats import BLOCK, FOLD, SUPER, QuantTensor, quantize_np


def quantize_native(w: np.ndarray, fmt: str) -> QuantTensor:
    """Quantize with the C++ kernels when available; bit-compatible with
    quantize_np (golden-tested)."""
    from acestep_tpu.native import get_native

    nat = get_native()
    w = np.ascontiguousarray(w, dtype=np.float32)
    if nat is None or w.ndim != 2:
        return quantize_np(w, fmt)
    k, n = w.shape
    if fmt == "q8_0" and k % BLOCK == 0:
        data = np.empty((k, n), np.int8)
        scales = np.empty((k // BLOCK, n), np.uint16)
        nat.quantize_q8_0(w, k, n, data, scales)
        return QuantTensor(fmt="q8_0", shape=(k, n), data=jnp.asarray(data),
                           scales=jnp.asarray(scales.view(np.float16)))
    if fmt == "q4_0" and k % FOLD == 0:
        data = np.empty((k // 2, n), np.uint8)
        scales = np.empty((k // BLOCK, n), np.uint16)
        nat.quantize_q4_0(w, k, n, data, scales)
        return QuantTensor(fmt="q4_0", shape=(k, n), data=jnp.asarray(data),
                           scales=jnp.asarray(scales.view(np.float16)))
    if fmt == "q6_k" and k % SUPER == 0 and hasattr(nat, "quantize_q6_k"):
        data = np.empty((k // 2, n), np.uint8)
        hi = np.empty((k // 4, n), np.uint8)
        ls = np.empty((k // 16, n), np.int8)
        ds = np.empty((k // SUPER, n), np.uint16)
        nat.quantize_q6_k(w, k, n, data, hi, ls, ds)
        return QuantTensor(fmt="q6_k", shape=(k, n), data=jnp.asarray(data),
                           data_hi=jnp.asarray(hi), sub_scales=jnp.asarray(ls),
                           super_scales=jnp.asarray(ds.view(np.float16)))
    if fmt == "q4_k" and k % SUPER == 0:
        data = np.empty((k // 2, n), np.uint8)
        ls = np.empty((k // BLOCK, n), np.uint8)
        lm = np.empty((k // BLOCK, n), np.uint8)
        ds = np.empty((k // SUPER, n), np.uint16)
        ms = np.empty((k // SUPER, n), np.uint16)
        nat.quantize_q4_k(w, k, n, data, ls, lm, ds, ms)
        return QuantTensor(fmt="q4_k", shape=(k, n), data=jnp.asarray(data),
                           sub_scales=jnp.asarray(ls), sub_mins=jnp.asarray(lm),
                           super_scales=jnp.asarray(ds.view(np.float16)),
                           super_mins=jnp.asarray(ms.view(np.float16)))
    return quantize_np(w, fmt)


def f32_to_bf16_fast(x: np.ndarray) -> np.ndarray:
    """Raw bf16 bits via the native kernel (numpy fallback)."""
    from acestep_tpu.native import get_native
    from acestep_tpu.utils.safetensors_io import f32_to_bf16_raw

    nat = get_native()
    x = np.ascontiguousarray(x, dtype=np.float32)
    if nat is None:
        return f32_to_bf16_raw(x)
    out = np.empty(x.shape, np.uint16)
    nat.bf16_from_f32(x.reshape(-1), out.reshape(-1), x.size)
    return out
