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


class StackedWeight:
    """A stacked weight ``[L, K, N]`` (plain array or QuantTensor with stacked
    fields) plus a traced layer index — built INSIDE a layer scan body so
    :func:`linear` can stream layer ``idx`` directly from the stacked HBM
    buffer (pallas scalar-prefetch) instead of the scan materializing a per-
    layer slice copy each iteration.  Trace-local: never crosses jit
    boundaries, so it is not a pytree."""

    __slots__ = ("w", "idx")

    def __init__(self, w: Weight, idx: jax.Array):
        self.w = w
        self.idx = idx

    @property
    def shape(self):
        if isinstance(self.w, QuantTensor):
            return self.w.shape
        return self.w.shape[1:]


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
    if isinstance(w, StackedWeight):
        y = _linear_stacked(x, w.w, w.idx, backend=backend)
    elif isinstance(w, QuantTensor):
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


def _linear_stacked(
    x: jax.Array, w: Weight, li: jax.Array, *, backend: Optional[str] = None
) -> jax.Array:
    """``x [..., K] @ w[li] [K, N]`` for stacked weights (see StackedWeight)."""
    if isinstance(w, QuantTensor):
        b = resolve_backend(backend)
        if b == "pallas":
            from acestep_tpu.ops.pallas.qmm import qmm_pallas_stacked_nd

            return qmm_pallas_stacked_nd(x, w, li)
        from acestep_tpu.ops.pallas.qmm import _index_qt_fields

        wd = dequantize(_index_qt_fields(w, li), dtype=jnp.bfloat16)
        return jnp.dot(
            x.astype(jnp.bfloat16), wd, preferred_element_type=jnp.float32
        )
    w_l = jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
    return jnp.dot(x, w_l.astype(x.dtype), preferred_element_type=jnp.float32)


def weight_shape(w: Weight) -> tuple:
    return tuple(w.shape)


def concat_weights_n(ws):
    """Concatenate kernel weights along the output (N) axis.

    QuantTensor-aware: every quant format packs along K, so all fields concat
    cleanly along the last axis — the fused matmul is numerically EXACT
    column-for-column.  Used to fuse q||k||v and gate||up into single weight
    streams (serving/lm.py decode scan, models/dit.py layer scan)."""
    import dataclasses

    if isinstance(ws[0], QuantTensor):
        def cat(field):
            vals = [getattr(w, field) for w in ws]
            return None if vals[0] is None else jnp.concatenate(vals, axis=-1)

        return dataclasses.replace(
            ws[0],
            shape=(ws[0].shape[0], sum(w.shape[1] for w in ws)),
            data=cat("data"), data_hi=cat("data_hi"), scales=cat("scales"),
            sub_scales=cat("sub_scales"), sub_mins=cat("sub_mins"),
            super_scales=cat("super_scales"), super_mins=cat("super_mins"),
        )
    return jnp.concatenate(ws, axis=-1)


# ---------------------------------------------------------------------------
# stacked-layer scan support: keep the big quantized kernels OUT of scan xs
# (a scan materializes an HBM copy of each per-layer weight slice it feeds to
# a pallas_call, every iteration) and stream them by traced layer index via
# the scalar-prefetch kernel instead.
# ---------------------------------------------------------------------------

def split_stacked_weights(tree):
    """Split a stacked layer-param tree into (small_tree, [(path, QuantTensor)]).

    Big quantized kernels are replaced with ``None`` placeholders (empty pytree
    nodes, so scan xs skips them); :func:`rebuild_layer_params` re-inserts them
    as :class:`StackedWeight` handles inside the scan body."""
    big = []

    def rec(t, path):
        if isinstance(t, dict):
            return {k: rec(v, path + (k,)) for k, v in t.items()}
        if isinstance(t, QuantTensor):
            big.append((path, t))
            return None
        return t

    return rec(tree, ()), big


def rebuild_layer_params(small_slice, big, li):
    """Per-layer param dict: sliced small leaves + StackedWeight big kernels."""

    def copy(t):
        return {k: copy(v) for k, v in t.items()} if isinstance(t, dict) else t

    p = copy(small_slice)
    for path, qt in big:
        d = p
        for k in path[:-1]:
            d = d[k]
        d[path[-1]] = StackedWeight(qt, li)
    return p


def precast_quant_scales(tree):
    """Cast every QuantTensor's scale fields to f32 (exact upcast from f16).

    Mosaic rejects f16 scale loads, so kernels take f32 scales; pre-casting at
    param-prep time makes the in-trace ``astype`` a no-op instead of relying
    on XLA to hoist per-step conversions out of layer scans.  Costs ~2-3% more
    HBM residency (scales are 1/16 - 1/32 of weight bytes)."""
    import dataclasses as _dc

    def fix(qt):
        def up(a):
            return None if a is None else a.astype(jnp.float32)

        return _dc.replace(
            qt, scales=up(qt.scales), super_scales=up(qt.super_scales),
            super_mins=up(qt.super_mins),
        )

    return jax.tree_util.tree_map(
        lambda x: fix(x) if isinstance(x, QuantTensor) else x,
        tree, is_leaf=lambda x: isinstance(x, QuantTensor),
    )


def use_stacked_weights(layers, default: bool = False) -> bool:
    """True when stacked quantized layers should stream by index (pallas).

    Per-call-site defaults, from v5e measurements (ACESTEP_TPU_STACKED_W=0/1
    forces globally):
      * LM decode (M<=16): default OFF — the scalar-prefetch kernel loses to
        scan-xs slice copies + per-layer kernels (2.67 vs 1.99 ms/tok at 0.6B
        q8_0): the dynamically indexed operand defeats Mosaic's cross-grid-
        step DMA prefetch, and at tiny M the per-call overhead dominates.
      * DiT Euler scan (M=Tp>=128): default ON — longer grids amortize the
        prefetch, the per-layer slice copies it avoids scale with weight
        bytes (0.2019 vs 0.2397 s per 10 s clip vs per-layer pallas), and no
        transient bf16 weight copy is needed (vs the XLA-dequant path)."""
    if isinstance(layers, list):
        return False
    env = os.environ.get("ACESTEP_TPU_STACKED_W")
    if env in ("0", "1"):
        if env == "0":
            return False
    elif not default:
        return False
    if resolve_backend(None) != "pallas":
        return False
    return any(
        isinstance(leaf, QuantTensor)
        for leaf in jax.tree_util.tree_leaves(
            layers, is_leaf=lambda x: isinstance(x, QuantTensor))
    )
