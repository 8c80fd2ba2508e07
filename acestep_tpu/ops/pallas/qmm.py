"""Fused dequant + matmul Pallas kernels (the engine's hot op).

Replaces the reference's ggml quantized vec_dot kernels (CPU/Metal) with MXU
kernels that dequantize weight tiles in VMEM and never materialize the bf16
weight matrix in HBM — at batch-1 DiT shapes the matmuls are HBM-bandwidth
bound, so streaming ~4.5-8.5 bits/weight instead of 16 is the main speedup
(BASELINE.md north star).

Layout notes (see acestep_tpu.quant.formats):
  * 4-bit data uses the fold-256 packing: a 256-row K-group's rows r / r+128
    share a byte (low/high nibble).  The kernel K-tile is exactly 256 for 4-bit
    formats, so unpack is ONE pltpu.repeat (tile-repeat along sublanes) plus a
    row-index select — the TPU has no cheap sublane interleave, and Mosaic on
    this backend rejects concatenate inside kernels.
  * fp16 scale loads are rejected by this backend's Mosaic, so scales are
    converted to f32 outside the kernel (XLA hoists the conversion out of the
    sampler's scan; adds ~0.25-1 bpw of stream traffic).
  * int4/int8 values are exact in bf16; dequant math runs in f32 and rounds to
    bf16 once (bit-matching the XLA dequant path); accumulation is f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acestep_tpu.quant import BLOCK, SUPER, QuantTensor, dequantize
from acestep_tpu.quant.formats import FOLD, SUB16

DEFAULT_BM = 256
DEFAULT_BN = 256
Q8_BK = 512
Q4_BK = FOLD  # 256: one fold group per K-tile


SMALL_M = 32             # decode-shaped: grid-step overhead dominates, so use
                         # the largest tiles VMEM allows (fewer, fatter steps)
MID_M = 1024             # batch-1 DiT Euler shapes (Tp 128-768): still fat
                         # tiles — thin 256x512 tiles measured 2x slower
                         # (3.0 vs 6.1 ms/step of kernel time at 10 s q8_0)
_TILE_BYTES_CAP = 1 << 21  # ~2 MB data tile (+ double buffering) well under VMEM


def _env_tile(name: str) -> Optional[int]:
    """Tuning override (ACESTEP_TPU_QMM_BN / _BK), used by the tile sweeps in
    tools/profile_dit_step.py; unset in production."""
    import os

    v = os.environ.get(name)
    return int(v) if v else None


def _pick_bn(n: int, m: Optional[int] = None, four_bit: bool = False) -> Optional[int]:
    env = _env_tile("ACESTEP_TPU_QMM_BN")
    if env and n % env == 0:
        return env
    # decode (m<=32) AND mid-M (DiT Euler at batch-1, m <= MID_M) both want fat
    # tiles: grid-step overhead dominates thin ones (a 10 s DiT step spent
    # 6.1 ms in qmm kernels at bn=256/bk=512 vs 3.0 at 1024x1024 — device
    # trace 2026-08, ~1.5 ms streaming floor).  4-bit kernels unfold nibbles
    # per tile, so their sweet spot caps at bn=1024 (m=8 sweep 2026-08:
    # bn=2048 measured 25-30 us vs 17-20 at bn=1024 on q4_0 LM shapes)
    cands = ((1024, 512, 256, 128) if four_bit else (2048, 1024, 512, 256, 128)) \
        if (m is not None and m <= SMALL_M) \
        else (1024, 512, DEFAULT_BN, 128) if (m is not None and m <= MID_M) \
        else (DEFAULT_BN, 128)
    for bn in cands:
        if n % bn == 0:
            return bn
    return None


def _pick_q8_bk(k_dim: int, m: int, bn: int) -> Optional[int]:
    """q8_0 K-tile: bigger for decode/mid-M shapes, capped by the VMEM tile
    budget."""
    env = _env_tile("ACESTEP_TPU_QMM_BK")
    if env and k_dim % env == 0:
        return env
    if m <= SMALL_M:
        for bk in (4096, 2048, 1024, Q8_BK):
            if k_dim % bk == 0 and bk * bn <= _TILE_BYTES_CAP:
                return bk
    elif m <= MID_M:
        for bk in (1024, Q8_BK):
            if k_dim % bk == 0 and bk * bn <= _TILE_BYTES_CAP:
                return bk
    if k_dim % Q8_BK == 0:
        return Q8_BK
    return k_dim if k_dim % BLOCK == 0 else None


def _pick_q4_bk(k_dim: int, m: int, bn: Optional[int]) -> Optional[int]:
    """4-bit K-tile: a multiple of the 256-row fold group (the kernels unfold
    G = bk/256 groups per grid step), fatter for small/mid M."""
    if bn is None:
        return None
    env = _env_tile("ACESTEP_TPU_QMM_BK")
    if env and k_dim % env == 0 and env % Q4_BK == 0:
        return env
    if m <= SMALL_M:
        # decode: fat bk halves wall time (m=8 sweep: bn=1024/bk=1024 16.7-20 us
        # vs 31-38 at bk=256 on q4_0 LM shapes); at mid-M bk=256 measured
        # best/tied (104.5 vs 107/112 us summed over the DiT layer shapes)
        for bk in (1024, 512):
            if k_dim % bk == 0 and bk * bn // 2 <= _TILE_BYTES_CAP:
                return bk
    return Q4_BK if k_dim % Q4_BK == 0 else None


def _pick_bm(m: int) -> int:
    if m >= DEFAULT_BM:
        return DEFAULT_BM
    return max(16, ((m + 15) // 16) * 16)


def _expand_rows(s, reps: int):
    """[B, N] -> [B*reps, N], each row repeated `reps` times (block broadcast)."""
    b, n = s.shape
    return jnp.broadcast_to(s[:, None, :], (b, reps, n)).reshape(b * reps, n)


def _unfold_nibbles(packed, bk: int):
    """uint8 [bk/2, BN] (one fold group) -> int32 [bk, BN] in original row order."""
    rep = pltpu.repeat(packed, 2, axis=0)                      # [bk, BN] tile-repeat
    row = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 0)
    r32 = rep.astype(jnp.int32)
    return jnp.where(row < bk // 2, r32 & 0xF, r32 >> 4)


def _unfold_crumbs(packed, bk: int):
    """uint8 [bk/4, BN] (fold-64 2-bit planes) -> int32 [bk, BN] original order."""
    rep = pltpu.repeat(packed, 4, axis=0)                      # [bk, BN]
    row = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 0)
    shift = (row // (bk // 4)) * 2
    return (rep.astype(jnp.int32) >> shift) & 0x3


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _q8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dequant in f32, single rounding to bf16 (bit-matches the XLA dequant path)
    w = w_ref[:].astype(jnp.float32)
    wd = (w * _expand_rows(s_ref[:], BLOCK)).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4_0_kernel(g_groups, x_ref, w_ref, s_ref, o_ref, acc_ref):
    """4-bit data arrives as a grouped view [G, 128, BN] (G fold groups per
    grid step, bk = G*256); each group unfolds independently and contributes
    one K=256 sub-dot.  G is static (functools.partial)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sb = Q4_BK // BLOCK
    for g in range(g_groups):
        q = _unfold_nibbles(w_ref[g], Q4_BK) - 8
        wd = (q.astype(jnp.float32)
              * _expand_rows(s_ref[g * sb:(g + 1) * sb], BLOCK)).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x_ref[:, g * Q4_BK:(g + 1) * Q4_BK], wd,
                              preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4_k_kernel(g_groups, x_ref, w_ref, d_ref, m_ref, o_ref, acc_ref):
    """q4_k with pre-expanded effective scales d_eff/m_eff [BK/32, BN] f32."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sb = Q4_BK // BLOCK
    for g in range(g_groups):
        q = _unfold_nibbles(w_ref[g], Q4_BK).astype(jnp.float32)
        wd = (q * _expand_rows(d_ref[g * sb:(g + 1) * sb], BLOCK)
              - _expand_rows(m_ref[g * sb:(g + 1) * sb], BLOCK)).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x_ref[:, g * Q4_BK:(g + 1) * Q4_BK], wd,
                              preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q6_k_kernel(g_groups, x_ref, w_ref, hi_ref, d_ref, o_ref, acc_ref):
    """q6_k with pre-expanded effective scales d_eff [BK/16, BN] f32."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s6 = Q4_BK // SUB16
    for g in range(g_groups):
        lo = _unfold_nibbles(w_ref[g], Q4_BK)
        hi = _unfold_crumbs(hi_ref[g], Q4_BK)
        q = (lo | (hi << 4)).astype(jnp.float32) - 32.0
        wd = (q * _expand_rows(d_ref[g * s6:(g + 1) * s6], SUB16)).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x_ref[:, g * Q4_BK:(g + 1) * Q4_BK], wd,
                              preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret",))
def qmm_pallas(x: jax.Array, qt: QuantTensor, *, interpret: bool = False) -> jax.Array:
    """x [M, K] @ dequant(qt) [K, N] -> [M, N] bf16 (f32 accumulation).

    Falls back to the XLA dequant path for tile-unfriendly shapes.
    """
    k_dim, n = qt.shape
    m = x.shape[0]
    bn = _pick_bn(n, m, four_bit=qt.fmt != "q8_0")
    if qt.fmt == "q8_0":
        bk = _pick_q8_bk(k_dim, m, bn) if bn is not None else None
    else:
        bk = _pick_q4_bk(k_dim, m, bn)
    if bn is None or bk is None:
        wd = dequantize(qt, dtype=jnp.bfloat16)
        return jnp.dot(x.astype(jnp.bfloat16), wd,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    g_groups = bk // Q4_BK

    bm = _pick_bm(m)
    m_pad = (-m) % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    mp = m + m_pad

    x = x.astype(jnp.bfloat16)
    grid = (mp // bm, n // bn, k_dim // bk)

    x_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM)
    scale_rows = bk // BLOCK
    s_spec = pl.BlockSpec((scale_rows, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k_dim * n,
            bytes_accessed=qt.nbytes + mp * k_dim * 2 + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    if qt.fmt == "q8_0":
        scales = qt.scales.astype(jnp.float32)   # Mosaic here rejects f16 loads
        out = pl.pallas_call(
            _q8_kernel,
            in_specs=[x_spec,
                      pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                      s_spec],
            **common,
        )(x, qt.data, scales)
    elif qt.fmt == "q4_0":
        scales = qt.scales.astype(jnp.float32)
        out = pl.pallas_call(
            functools.partial(_q4_0_kernel, g_groups),
            in_specs=[x_spec,
                      pl.BlockSpec((g_groups, FOLD // 2, bn),
                                   lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
                      s_spec],
            **common,
        )(x, qt.data.reshape(k_dim // FOLD, FOLD // 2, n), scales)
    elif qt.fmt == "q4_k":
        # effective per-32-block scale/min, computed outside (hoisted by XLA)
        sub_per_super = SUPER // BLOCK
        d_eff = _expand_rows(qt.super_scales.astype(jnp.float32), sub_per_super) \
            * qt.sub_scales.astype(jnp.float32)
        m_eff = _expand_rows(qt.super_mins.astype(jnp.float32), sub_per_super) \
            * qt.sub_mins.astype(jnp.float32)
        out = pl.pallas_call(
            functools.partial(_q4_k_kernel, g_groups),
            in_specs=[x_spec,
                      pl.BlockSpec((g_groups, FOLD // 2, bn),
                                   lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
                      s_spec, s_spec],
            **common,
        )(x, qt.data.reshape(k_dim // FOLD, FOLD // 2, n), d_eff, m_eff)
    elif qt.fmt == "q6_k":
        sub_per_super = SUPER // SUB16
        d_eff = _expand_rows(qt.super_scales.astype(jnp.float32), sub_per_super) \
            * qt.sub_scales.astype(jnp.float32)
        s16_spec = pl.BlockSpec((bk // SUB16, bn), lambda i, j, k: (k, j),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_q6_k_kernel, g_groups),
            in_specs=[x_spec,
                      pl.BlockSpec((g_groups, FOLD // 2, bn),
                                   lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
                      pl.BlockSpec((g_groups, FOLD // 4, bn),
                                   lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
                      s16_spec],
            **common,
        )(x, qt.data.reshape(k_dim // FOLD, FOLD // 2, n),
          qt.data_hi.reshape(k_dim // FOLD, FOLD // 4, n), d_eff)
    else:
        raise ValueError(f"unsupported quant format: {qt.fmt}")

    return out[:m] if m_pad else out


INT8_ACT_MAX_M = 16      # decode-shaped int8-activation variant (opt-in)
_INT8_ACT_ENV = "ACESTEP_TPU_INT8_ACT"   # 0 (default) | 1
# Default OFF: weights stream the same int8 bytes either way (dequant happens
# in VMEM), so int8xint8 only buys MXU throughput — irrelevant when decode is
# bandwidth/launch bound — and its 16 K=32 sub-dots + VPU rescale loop measured
# SLOWER than one bf16-dequant dot per tile (2.93 vs 2.66 ms/tok, 0.6B q8_0).


def qmm_pallas_nd(x: jax.Array, qt: QuantTensor, *, interpret: bool = False) -> jax.Array:
    """[..., K] @ qt [K, N] -> [..., N] bf16.

    q8_0 weights with decode-shaped activations (flat M <= INT8_ACT_MAX_M)
    route through the int8-activation kernel (qmm_int8_act): int8 x int8 MXU
    accumulation with exact per-row activation scales."""
    import os

    lead = x.shape[:-1]
    k = x.shape[-1]
    xf = x.reshape(-1, k)
    if (
        qt.fmt == "q8_0"
        and xf.shape[0] <= INT8_ACT_MAX_M
        and os.environ.get(_INT8_ACT_ENV, "0") == "1"
    ):
        y = qmm_int8_act(xf, qt, interpret=interpret)
    else:
        y = qmm_pallas(xf, qt, interpret=interpret)
    return y.reshape(*lead, qt.shape[1])


# ---------------------------------------------------------------------------
# int8 x int8 MXU variant (GGML-style): activations are dynamically quantized
# per 32-block along K (the reference quantizes activations to q8_1 for its
# quantized vec_dot), products accumulate in int32 on the MXU at 2x bf16
# throughput, and per-block scale products rescale the partial sums.
#
#   y[m, n] = sum_kb s_x[m, kb] * s_w[kb, n] * (qx[m, kb*32:...] . qw[..., n])
#
# Activations take one exact per-ROW scale (slightly coarser than GGML's
# per-32 q8_1 but exact to apply); weight scales stay per-32 exact by
# rescaling the int32 partial sums of each 32-wide sub-matmul on the VPU.
# K=32 sub-matmuls under-fill the MXU depth, so this path targets
# decode-shaped problems (small M) where weight streaming dominates anyway.
# ---------------------------------------------------------------------------

def qmm_int8_act(x: jax.Array, qt: QuantTensor, *, interpret: bool = False) -> jax.Array:
    """Experimental int8-activation path for q8_0 (decode shapes). Applies the
    per-row activation scale outside the kernel; per-32 weight scales exact."""
    if qt.fmt != "q8_0":
        raise ValueError("int8-act path supports q8_0 only")
    k_dim, n = qt.shape
    m = x.shape[0]
    bn = _pick_bn(n)
    bk = Q8_BK if k_dim % Q8_BK == 0 else (k_dim if k_dim % BLOCK == 0 else None)
    if bn is None or bk is None:
        from acestep_tpu.quant import dequantize as _deq

        return jnp.dot(x.astype(jnp.bfloat16), _deq(qt, jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    bm = _pick_bm(m)
    m_pad = (-m) % bm
    xp = jnp.pad(x, ((0, m_pad), (0, 0))) if m_pad else x
    mp = m + m_pad

    # per-row GLOBAL activation scale (slightly coarser than per-tile; exactness
    # of the rescale then allows applying it once at the end)
    xf = xp.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = amax / 127.0
    inv = jnp.where(xs > 0, 1.0 / jnp.maximum(xs, 1e-30), 0.0)
    xq = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)

    grid = (mp // bm, n // bn, k_dim // bk)
    scale_rows = bk // BLOCK
    out = pl.pallas_call(
        _int8_core_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((scale_rows, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xq, qt.data, qt.scales.astype(jnp.float32))
    out = out * xs            # per-row activation scale, exact
    out = out[:m] if m_pad else out
    return out.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# stacked-layer variant: x @ dequant(qt[li]) where every QuantTensor field
# carries a leading layer axis [L, ...].
#
# Motivation: scanning a transformer's layers with stacked weights as scan-xs
# makes XLA materialize each layer's quantized weight slice as an HBM COPY
# before it can feed a pallas_call (dynamic-slice -> bitcast fusions — the
# round-2 LM decode profile showed ~0.7 ms/step of these at 0.6B shapes, and
# the DiT Euler scan pays the same per diffusion step).  Here the layer index
# is a SCALAR-PREFETCH operand instead: the kernel's index_map addresses tiles
# of layer ``li`` directly in the stacked HBM buffer, so the weight bytes are
# read exactly once, by the kernel itself.  The kernel bodies are the same as
# the per-layer ones — identical blocks arrive in VMEM, so results are
# bit-identical to qmm_pallas on the sliced layer.
# ---------------------------------------------------------------------------

def _drop_scalar(kernel):
    def k2(li_ref, *refs):
        return kernel(*refs)

    return k2


def _index_qt_fields(qt: QuantTensor, li) -> QuantTensor:
    """Dynamic-index every stacked field at layer ``li`` (XLA fallback path)."""
    import dataclasses as _dc

    def ix(a):
        if a is None:
            return None
        return jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)

    return _dc.replace(
        qt, data=ix(qt.data), data_hi=ix(qt.data_hi), scales=ix(qt.scales),
        sub_scales=ix(qt.sub_scales), sub_mins=ix(qt.sub_mins),
        super_scales=ix(qt.super_scales), super_mins=ix(qt.super_mins),
    )


def qmm_pallas_stacked(
    x: jax.Array, qt: QuantTensor, li: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """x [M, K] @ dequant(qt[li]) [K, N] -> [M, N] bf16; ``qt`` fields are
    stacked [L, ...]; ``li`` is a traced int32 layer index (scalar prefetch).

    Tile-unfriendly shapes fall back to dynamic-index + XLA dequant dot.

    NOT wrapped in jax.jit: it is always called inside an outer jit (a layer
    scan body), and a nested-jit call boundary would pin the stacked scale
    f32 conversions INSIDE the decode loop (measured 3.8 ms/step at 0.6B) —
    inlined, XLA hoists them out as loop-invariant (and
    :func:`~acestep_tpu.serving.lm.fuse_serving_params` pre-casts them to f32
    so the hoisted work is a no-op)."""
    k_dim, n = qt.shape
    m = x.shape[0]
    bn = _pick_bn(n, m, four_bit=qt.fmt != "q8_0")
    if qt.fmt == "q8_0":
        bk = _pick_q8_bk(k_dim, m, bn) if bn is not None else None
    else:
        bk = _pick_q4_bk(k_dim, m, bn)
    if bn is None or bk is None:
        qt_l = _index_qt_fields(qt, li)
        wd = dequantize(qt_l, dtype=jnp.bfloat16)
        return jnp.dot(x.astype(jnp.bfloat16), wd,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    g_groups = bk // Q4_BK

    bm = _pick_bm(m)
    m_pad = (-m) % bm
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    mp = m + m_pad

    x = x.astype(jnp.bfloat16)
    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    grid = (mp // bm, n // bn, k_dim // bk)
    scale_rows = bk // BLOCK

    x_spec = pl.BlockSpec((bm, bk), lambda i, j, k, li_ref: (i, k),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, k, li_ref: (i, j),
                            memory_space=pltpu.VMEM)

    def _lspec(rows):
        return pl.BlockSpec((None, rows, bn),
                            lambda i, j, k, li_ref: (li_ref[0], k, j),
                            memory_space=pltpu.VMEM)

    def _call(kernel, in_specs, operands):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )
        return pl.pallas_call(
            _drop_scalar(kernel),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.bfloat16),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k_dim * n,
                bytes_accessed=qt.nbytes // qt.data.shape[0]
                + mp * k_dim * 2 + mp * n * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(li_arr, x, *operands)

    L = qt.data.shape[0]

    def _gspec(rows):
        # grouped 4-bit view [L, K/FOLD, rows, bn]: G fold groups per grid step
        return pl.BlockSpec((None, g_groups, rows, bn),
                            lambda i, j, k, li_ref: (li_ref[0], k, 0, j),
                            memory_space=pltpu.VMEM)

    if qt.fmt == "q8_0":
        scales = qt.scales.astype(jnp.float32)   # hoisted: loop-invariant
        out = _call(_q8_kernel, [x_spec, _lspec(bk), _lspec(scale_rows)],
                    (qt.data, scales))
    elif qt.fmt == "q4_0":
        scales = qt.scales.astype(jnp.float32)
        out = _call(functools.partial(_q4_0_kernel, g_groups),
                    [x_spec, _gspec(FOLD // 2), _lspec(scale_rows)],
                    (qt.data.reshape(L, k_dim // FOLD, FOLD // 2, n), scales))
    elif qt.fmt == "q4_k":
        sub_per_super = SUPER // BLOCK
        d_eff = _expand_rows_stacked(qt.super_scales.astype(jnp.float32),
                                     sub_per_super) \
            * qt.sub_scales.astype(jnp.float32)
        m_eff = _expand_rows_stacked(qt.super_mins.astype(jnp.float32),
                                     sub_per_super) \
            * qt.sub_mins.astype(jnp.float32)
        out = _call(functools.partial(_q4_k_kernel, g_groups),
                    [x_spec, _gspec(FOLD // 2), _lspec(scale_rows), _lspec(scale_rows)],
                    (qt.data.reshape(L, k_dim // FOLD, FOLD // 2, n), d_eff, m_eff))
    elif qt.fmt == "q6_k":
        sub_per_super = SUPER // SUB16
        d_eff = _expand_rows_stacked(qt.super_scales.astype(jnp.float32),
                                     sub_per_super) \
            * qt.sub_scales.astype(jnp.float32)
        out = _call(functools.partial(_q6_k_kernel, g_groups),
                    [x_spec, _gspec(FOLD // 2), _gspec(FOLD // 4),
                     _lspec(bk // SUB16)],
                    (qt.data.reshape(L, k_dim // FOLD, FOLD // 2, n),
                     qt.data_hi.reshape(L, k_dim // FOLD, FOLD // 4, n), d_eff))
    else:
        raise ValueError(f"unsupported quant format: {qt.fmt}")

    return out[:m] if m_pad else out


def _expand_rows_stacked(s, reps: int):
    """[L, B, N] -> [L, B*reps, N] (stacked-layer form of _expand_rows)."""
    l, b, n = s.shape
    return jnp.broadcast_to(s[:, :, None, :], (l, b, reps, n)).reshape(l, b * reps, n)


def qmm_pallas_stacked_nd(
    x: jax.Array, qt: QuantTensor, li: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """[..., K] @ dequant(qt[li]) [K, N] -> [..., N] bf16."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    y = qmm_pallas_stacked(xf, qt, li, interpret=interpret)
    return y.reshape(*lead, qt.shape[1])


def _int8_core_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    """int8 x int8 with per-32-block weight-scale rescale of int32 partials."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = x_ref[:]
    w = w_ref[:]
    s = s_ref[:].astype(jnp.float32)
    nb = s.shape[0]
    acc = acc_ref[:]
    for b in range(nb):
        p = jax.lax.dot_general(
            xq[:, b * BLOCK:(b + 1) * BLOCK], w[b * BLOCK:(b + 1) * BLOCK, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        acc = acc + p * s[b][None, :]
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]
