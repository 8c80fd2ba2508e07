"""Quantized linear: the single hot op of the engine.

``y = x @ W (+ b)`` where W is either a plain jax.Array kernel ``[K, N]`` or a
:class:`~acestep_tpu.quant.QuantTensor` in a GGML-style block format.

Two backends:
  * ``xla``    — dequantize to bf16 and let XLA fuse (reference path; works on any
                 backend, partitions cleanly under jit/NamedSharding).
  * ``pallas`` — fused dequant+matmul MXU kernel (TPU hot path), see
                 :mod:`acestep_tpu.ops.pallas.qmm`.

The reference forces f32 accumulation on attention matmuls
(acestep_ggml/cpp/acestep_dit_model.cpp:1239 GGML_PREC_F32); we accumulate every
matmul in f32 via ``preferred_element_type``.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp

from acestep_tpu.quant import QuantTensor, dequantize

Weight = Union[jax.Array, QuantTensor]

_BACKEND_ENV = "ACESTEP_TPU_QMM_BACKEND"  # auto | xla | pallas

# trace-time backend override (set by the engine per jit bucket, from the HBM
# plan): XLA-dequant wins when the transient bf16 weight copy fits — XLA hoists
# the dequant out of the sampler/decode scans so matmuls run at plain-bf16 MXU
# speed (measured faster than the fused kernels at every benched shape); the
# fused Pallas path streams the quantized bytes and never materializes the
# copy, which is what lets 600 s songs fit.  jit caches are duration-bucketed,
# so a bucket's first trace captures a consistent choice.
_trace_backend: contextvars.ContextVar = contextvars.ContextVar(
    "acestep_qmm_trace_backend", default=None
)


@contextlib.contextmanager
def trace_backend(backend: Optional[str]):
    """Set the trace-time qmm backend for jit traces entered in this scope."""
    token = _trace_backend.set(backend)
    try:
        yield
    finally:
        _trace_backend.reset(token)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def resolve_backend(backend: Optional[str] = None) -> str:
    b = backend or os.environ.get(_BACKEND_ENV) or _trace_backend.get() or "auto"
    if b == "auto":
        return "pallas" if _on_tpu() else "xla"
    return b


def linear(
    x: jax.Array,
    w: Weight,
    bias: Optional[jax.Array] = None,
    *,
    backend: Optional[str] = None,
) -> jax.Array:
    """``x [..., K] @ w [K, N] -> [..., N]`` with f32 accumulation.

    Output dtype follows ``x``.
    """
    out_dtype = x.dtype
    if isinstance(w, QuantTensor):
        b = resolve_backend(backend)
        if b == "pallas":
            from acestep_tpu.ops.pallas.qmm import qmm_pallas_nd

            y = qmm_pallas_nd(x, w)
        else:
            wd = dequantize(w, dtype=jnp.bfloat16)
            y = jnp.dot(
                x.astype(jnp.bfloat16), wd, preferred_element_type=jnp.float32
            )
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def weight_shape(w: Weight) -> tuple:
    return tuple(w.shape)
