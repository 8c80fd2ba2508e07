"""GGML-style weight-only block-quant formats, re-laid-out for TPU.

Capability reference: the GGML runtime in the ACE-Step 1.5 reference quantizes
weights on load / export to Q4_K / Q6_K / Q8_0 (acestep_ggml/cpp/acestep_dit_model.cpp:156-192,
acestep_ggml/tools/export_safetensors_to_gguf.py:103-117).  We keep the same
per-block numerics (block 32, super-block 256, fp16 block scales) so quality at a
given bit width is comparable, but the memory layout is TPU-native:

  * Weights are stored in "kernel" layout ``[K, N]`` (contraction axis first), so
    ``y = x @ W`` feeds the MXU directly and the quant blocks run along K.
  * 4-bit values are nibble-packed into uint8 along K (the axon TPU runtime cannot
    device_put int4 arrays); 8-bit values are plain int8.
  * Scales are separate dense fp16 arrays ``[K//32, N]`` — lane-contiguous along N so
    a Pallas kernel can broadcast them over an MXU tile with a single repeat.

Supported formats
  q8_0  : 32-elem blocks, fp16 scale, int8 values.                  8.5  bpw
  q4_0  : 32-elem blocks, fp16 scale, 4-bit offset-8 values.        4.5  bpw
  q4_k  : 256-elem super-blocks, 6-bit sub-scales/mins (stored as
          uint8 here), fp16 super scale/min, 4-bit values.          ~4.63 bpw
  q6_k  : 256-elem super-blocks of 16x16, int8 sub-scales, fp16
          super scale, 6-bit offset-32 values (low nibble + 2-bit
          high planes).                                             ~6.56 bpw

Quantization math is verified against the reference formulas in tests/test_quant.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 32       # elements per quant block (scale granularity)
SUPER = 256      # elements per super-block (q4_k / q6_k)
SUB16 = 16       # q6_k sub-block (16 sub-blocks of 16 per super-block)

QUANT_FORMATS = ("q8_0", "q4_0", "q4_k", "q6_k")
ALL_FORMATS = ("f32", "bf16", "f16") + QUANT_FORMATS


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "data_hi", "scales", "sub_scales", "sub_mins",
                 "super_scales", "super_mins"],
    meta_fields=["fmt", "shape"],
)
@dataclasses.dataclass
class QuantTensor:
    """A block-quantized 2-D weight in kernel layout ``[K, N]``.

    ``data`` packing depends on ``fmt``:
      q8_0: int8  [K, N]
      q4_0: uint8 [K//2, N]  (fold-256 nibble packing)
      q4_k: uint8 [K//2, N]  (same nibble packing; values are unsigned 0..15)
      q6_k: uint8 [K//2, N]  low 4 bits (fold-256 nibbles) + ``data_hi``
            uint8 [K//4, N] high 2 bits (fold-64 crumb packing)
    """

    fmt: str
    shape: Tuple[int, int]                  # logical (K, N)
    data: jax.Array
    data_hi: Optional[jax.Array] = None      # q6_k: uint8 [K//4, N] (2-bit planes)
    scales: Optional[jax.Array] = None       # q8_0/q4_0: f16 [K//32, N]
    sub_scales: Optional[jax.Array] = None   # q4_k: uint8 [K//32, N] (6-bit ls);
                                             # q6_k: int8 [K//16, N]
    sub_mins: Optional[jax.Array] = None     # q4_k: uint8 [K//32, N] (6-bit lm)
    super_scales: Optional[jax.Array] = None  # q4_k/q6_k: f16 [K//256, N]
    super_mins: Optional[jax.Array] = None    # q4_k: f16 [K//256, N]

    @property
    def nbytes(self) -> int:
        total = 0
        for f in ("data", "data_hi", "scales", "sub_scales", "sub_mins",
                  "super_scales", "super_mins"):
            a = getattr(self, f)
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total

    @property
    def bits_per_weight(self) -> float:
        k, n = self.shape
        return 8.0 * self.nbytes / (k * n)


# ---------------------------------------------------------------------------
# numpy quantizers (conversion / golden path)
# ---------------------------------------------------------------------------

def _roundf(x: np.ndarray) -> np.ndarray:
    """Round half away from zero (C roundf), matching the reference quantizers;
    numpy's rint rounds half to even."""
    return np.trunc(x + np.copysign(0.5, x))


def _check_2d(w: np.ndarray) -> Tuple[int, int]:
    if w.ndim != 2:
        raise ValueError(f"expected 2-D kernel [K, N], got shape {w.shape}")
    return w.shape


FOLD = 256  # 4-bit fold group: rows [g*256+r] in low nibble, [g*256+128+r] in high

def _pack_nibbles(q: np.ndarray) -> np.ndarray:
    """Pack unsigned 4-bit values [K, N] -> uint8 [K//2, N] with fold-256 layout:
    packed[g*128 + r] = q[g*256 + r] | q[g*256 + 128 + r] << 4.

    This layout lets the Pallas kernel unpack a 256-row K-tile with a single
    tile-repeat + row-parity select (no sublane interleave, which the TPU
    vector unit cannot do cheaply)."""
    k, n = q.shape
    assert k % FOLD == 0, f"4-bit packing requires K % {FOLD} == 0, got {k}"
    q = q.astype(np.uint8).reshape(k // FOLD, FOLD, n)
    lo = q[:, : FOLD // 2, :]
    hi = q[:, FOLD // 2:, :]
    return (lo | (hi << 4)).reshape(k // 2, n).astype(np.uint8)


def _unpack_nibbles_np(packed: np.ndarray) -> np.ndarray:
    k2, n = packed.shape
    k = k2 * 2
    p = packed.reshape(k // FOLD, FOLD // 2, n)
    lo = p & 0xF
    hi = p >> 4
    return np.concatenate([lo, hi], axis=1).reshape(k, n).astype(np.uint8)


def quantize_q8_0_np(w: np.ndarray) -> QuantTensor:
    """Reference formula: d = amax/127, q = round(x/d) (acestep_ggml export Q8_0)."""
    k, n = _check_2d(w)
    if k % BLOCK:
        raise ValueError(f"q8_0 requires K % {BLOCK} == 0, got K={k}")
    w = w.astype(np.float32)
    blocks = w.reshape(k // BLOCK, BLOCK, n)
    amax = np.abs(blocks).max(axis=1)                       # [K/32, N]
    d = (amax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
    q = _roundf(blocks * inv[:, None, :]).clip(-127, 127).astype(np.int8)
    return QuantTensor(
        fmt="q8_0",
        shape=(k, n),
        data=jnp.asarray(q.reshape(k, n)),
        scales=jnp.asarray(d.astype(np.float16)),
    )


def quantize_q4_0_np(w: np.ndarray) -> QuantTensor:
    """Reference formula: d = signed_absmax / -8, q = clip(x/d + 8.5, 0, 15)."""
    k, n = _check_2d(w)
    if k % FOLD:
        raise ValueError(f"q4_0 requires K % {FOLD} == 0 (fold packing), got K={k}")
    w = w.astype(np.float32)
    blocks = w.reshape(k // BLOCK, BLOCK, n)
    idx = np.abs(blocks).argmax(axis=1)                     # [K/32, N]
    signed_max = np.take_along_axis(blocks, idx[:, None, :], axis=1)[:, 0, :]
    d = (signed_max / -8.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    q = np.floor(blocks * inv[:, None, :] + 8.5).clip(0.0, 15.0).astype(np.uint8)
    return QuantTensor(
        fmt="q4_0",
        shape=(k, n),
        data=jnp.asarray(_pack_nibbles(q.reshape(k, n))),
        scales=jnp.asarray(d.astype(np.float16)),
    )


def quantize_q4_k_np(w: np.ndarray) -> QuantTensor:
    """Asymmetric 4-bit with a two-level scale hierarchy (Q4_K-equivalent).

    Per 32-block:   x ~= d_b * q - min_b,  q in [0, 15], min_b >= 0
    Per 256-super:  d_b  = d_super * ls   (ls 6-bit)
                    min_b = m_super * lm  (lm 6-bit)
    """
    k, n = _check_2d(w)
    if k % SUPER:
        raise ValueError(f"q4_k requires K % {SUPER} == 0, got K={k}")
    w = w.astype(np.float32)
    nb = k // BLOCK
    ns = k // SUPER
    blocks = w.reshape(nb, BLOCK, n)

    mn = np.minimum(blocks.min(axis=1), 0.0)                # [nb, N] (mins forced <= 0)
    mx = blocks.max(axis=1)
    d_b = (mx - mn) / 15.0                                  # [nb, N]
    min_b = -mn                                             # >= 0

    # super-block scale of scales
    d_sup = d_b.reshape(ns, SUPER // BLOCK, n).max(axis=1) / 63.0     # [ns, N]
    m_sup = min_b.reshape(ns, SUPER // BLOCK, n).max(axis=1) / 63.0

    d_sup_rep = np.repeat(d_sup, SUPER // BLOCK, axis=0)
    m_sup_rep = np.repeat(m_sup, SUPER // BLOCK, axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        ls = np.where(d_sup_rep > 0, _roundf(d_b / np.maximum(d_sup_rep, 1e-30)), 0.0)
        lm = np.where(m_sup_rep > 0, _roundf(min_b / np.maximum(m_sup_rep, 1e-30)), 0.0)
    ls = ls.clip(0, 63).astype(np.uint8)
    lm = lm.clip(0, 63).astype(np.uint8)

    # requantize values against the *quantized* effective scales
    d_eff = d_sup_rep * ls
    m_eff = m_sup_rep * lm
    inv = np.where(d_eff > 0, 1.0 / np.maximum(d_eff, 1e-30), 0.0)
    q = _roundf((blocks + m_eff[:, None, :]) * inv[:, None, :]).clip(0.0, 15.0).astype(np.uint8)

    return QuantTensor(
        fmt="q4_k",
        shape=(k, n),
        data=jnp.asarray(_pack_nibbles(q.reshape(k, n))),
        sub_scales=jnp.asarray(ls),
        sub_mins=jnp.asarray(lm),
        super_scales=jnp.asarray(d_sup.astype(np.float16)),
        super_mins=jnp.asarray(m_sup.astype(np.float16)),
    )


def _pack_crumbs(q: np.ndarray) -> np.ndarray:
    """Pack 2-bit values [K, N] -> uint8 [K//4, N] with fold-64 layout:
    packed[g*64 + r] holds rows g*256 + {0,64,128,192} + r in bit pairs
    0-1 / 2-3 / 4-5 / 6-7 (the 2-bit analog of the fold-256 nibble pack —
    unpacks in a Pallas kernel with one 4x tile-repeat + row-quarter shift)."""
    k, n = q.shape
    assert k % FOLD == 0, f"2-bit packing requires K % {FOLD} == 0, got {k}"
    q = q.astype(np.uint8).reshape(k // FOLD, 4, FOLD // 4, n)
    return (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)).reshape(
        k // 4, n).astype(np.uint8)


def _unpack_crumbs_np(packed: np.ndarray) -> np.ndarray:
    k4, n = packed.shape
    k = k4 * 4
    p = packed.reshape(k // FOLD, FOLD // 4, n)
    parts = [(p >> (2 * j)) & 0x3 for j in range(4)]
    return np.concatenate(parts, axis=1).reshape(k, n).astype(np.uint8)


def quantize_q6_k_np(w: np.ndarray) -> QuantTensor:
    """Symmetric 6-bit with int8 sub-scales (Q6_K-class; the reference's
    quantize_row_q6_K uses 16-elem sub-blocks with int8 scales against an fp16
    super scale — same structure here, with the straightforward round-to-
    nearest scale fit instead of ggml's iterative make_qx_quants search).

    Per 16-block:   x ~= d_eff * (q - 32),  q in [0, 63]
    Per 256-super:  d_eff = d_super * ls   (ls int8)
    """
    k, n = _check_2d(w)
    if k % SUPER:
        raise ValueError(f"q6_k requires K % {SUPER} == 0, got K={k}")
    w = w.astype(np.float32)
    nb = k // SUB16
    ns = k // SUPER
    blocks = w.reshape(nb, SUB16, n)

    # signed absmax per 16-block -> d_b so that q = x/d_b lands in [-32, 31]
    idx = np.abs(blocks).argmax(axis=1)
    signed_max = np.take_along_axis(blocks, idx[:, None, :], axis=1)[:, 0, :]
    d_b = signed_max / -32.0                                # [nb, N]

    d_sup = np.abs(d_b).reshape(ns, SUPER // SUB16, n).max(axis=1) / 127.0
    d_sup_rep = np.repeat(d_sup, SUPER // SUB16, axis=0)
    ls = np.where(d_sup_rep > 0,
                  _roundf(d_b / np.maximum(d_sup_rep, 1e-30)), 0.0)
    ls = ls.clip(-127, 127).astype(np.int8)

    d_eff = d_sup_rep * ls
    inv = np.where(d_eff != 0, 1.0 / np.where(d_eff == 0, 1.0, d_eff), 0.0)
    q = (_roundf(blocks * inv[:, None, :]).clip(-32.0, 31.0) + 32.0).astype(np.uint8)
    q = q.reshape(k, n)
    return QuantTensor(
        fmt="q6_k",
        shape=(k, n),
        data=jnp.asarray(_pack_nibbles(q & 0xF)),
        data_hi=jnp.asarray(_pack_crumbs(q >> 4)),
        sub_scales=jnp.asarray(ls),
        super_scales=jnp.asarray(d_sup.astype(np.float16)),
    )


_QUANTIZERS = {
    "q8_0": quantize_q8_0_np,
    "q4_0": quantize_q4_0_np,
    "q4_k": quantize_q4_k_np,
    "q6_k": quantize_q6_k_np,
}


def quantize_np(w: np.ndarray, fmt: str) -> QuantTensor:
    if fmt not in _QUANTIZERS:
        raise ValueError(f"unknown quant format: {fmt}")
    return _QUANTIZERS[fmt](np.asarray(w))


def supported_format_for(k: int, fmt: str) -> str:
    """Downgrade ``fmt`` to what a K-dim of ``k`` supports (reference does the same
    fallback for tensors whose row size is not a multiple of the block size)."""
    if fmt in ("f32", "bf16", "f16"):
        return fmt
    if fmt in ("q4_k", "q4_0", "q6_k"):
        if k % FOLD == 0:          # 4/6-bit fold packing needs K % 256 == 0
            return fmt
        fmt = "q8_0"
    if k % BLOCK == 0:
        return fmt
    return "bf16"


# ---------------------------------------------------------------------------
# JAX dequantizers (XLA reference path; Pallas kernels do this in VMEM)
# ---------------------------------------------------------------------------

def _unpack_nibbles(packed: jax.Array, k: int) -> jax.Array:
    """uint8 [K//2, N] -> [K, N] (fold-256 layout, see _pack_nibbles)."""
    n = packed.shape[1]
    p = packed.reshape(k // FOLD, FOLD // 2, n)
    lo = p & 0xF
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=1).reshape(k, n)


def _unpack_crumbs(packed: jax.Array, k: int) -> jax.Array:
    """uint8 [K//4, N] -> [K, N] (fold-64 layout, see _pack_crumbs)."""
    n = packed.shape[1]
    p = packed.reshape(k // FOLD, FOLD // 4, n)
    parts = [(p >> (2 * j)) & 0x3 for j in range(4)]
    return jnp.concatenate(parts, axis=1).reshape(k, n)


def dequantize(qt: QuantTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the full weight [K, N] in ``dtype`` (XLA fallback path)."""
    k, n = qt.shape
    if qt.fmt == "q8_0":
        scales = jnp.repeat(qt.scales.astype(jnp.float32), BLOCK, axis=0)
        return (qt.data.astype(jnp.float32) * scales).astype(dtype)
    if qt.fmt == "q4_0":
        q = _unpack_nibbles(qt.data, k).astype(jnp.int8) - 8
        scales = jnp.repeat(qt.scales.astype(jnp.float32), BLOCK, axis=0)
        return (q.astype(jnp.float32) * scales).astype(dtype)
    if qt.fmt == "q4_k":
        q = _unpack_nibbles(qt.data, k).astype(jnp.float32)
        d_eff = qt.super_scales.astype(jnp.float32) \
            if qt.sub_scales is None else (
                jnp.repeat(qt.super_scales.astype(jnp.float32), SUPER // BLOCK, axis=0)
                * qt.sub_scales.astype(jnp.float32))
        m_eff = (jnp.repeat(qt.super_mins.astype(jnp.float32), SUPER // BLOCK, axis=0)
                 * qt.sub_mins.astype(jnp.float32))
        w = q * jnp.repeat(d_eff, BLOCK, axis=0) - jnp.repeat(m_eff, BLOCK, axis=0)
        return w.astype(dtype)
    if qt.fmt == "q6_k":
        lo = _unpack_nibbles(qt.data, k).astype(jnp.int32)
        hi = _unpack_crumbs(qt.data_hi, k).astype(jnp.int32)
        q = (lo | (hi << 4)).astype(jnp.float32) - 32.0
        d_eff = (jnp.repeat(qt.super_scales.astype(jnp.float32), SUPER // SUB16, axis=0)
                 * qt.sub_scales.astype(jnp.float32))
        return (q * jnp.repeat(d_eff, SUB16, axis=0)).astype(dtype)
    raise ValueError(f"unknown quant format: {qt.fmt}")


def dequantize_np(qt: QuantTensor) -> np.ndarray:
    return np.asarray(dequantize(qt, dtype=jnp.float32))
