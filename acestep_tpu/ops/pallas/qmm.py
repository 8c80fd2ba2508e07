"""Fused dequant + matmul Pallas kernels (the engine's hot op).

Replaces the reference's ggml quantized vec_dot kernels (CPU/Metal) with MXU
kernels that dequantize weight tiles in VMEM and never materialize the bf16
weight matrix in HBM — at batch-1 DiT shapes the matmuls are HBM-bandwidth
bound, so streaming 4.5-8.5 bits/weight instead of 16 is the main speedup
(BASELINE.md north star).

Layout (see acestep_tpu.quant.formats):
  x       [M, K]        bf16 activations
  q8_0    data int8 [K, N], scales f16 [K/32, N]
  q4_0    data uint8 [K/2, N] (even k low nibble), scales f16 [K/32, N]
  q4_k    data uint8 [K/2, N], sub_scales/sub_mins uint8 [K/32, N],
          super_scales/super_mins f16 [K/256, N]

Precision: int8/int4 values are exactly representable in bf16; dequantized
weights are bf16 (8-bit mantissa ~ half an lsb of the 8-bit grid), accumulation
is f32 — matching the quality the XLA dequant path delivers (parity-tested).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acestep_tpu.quant import BLOCK, SUPER, QuantTensor, dequantize

DEFAULT_BM = 256
DEFAULT_BN = 256
DEFAULT_BK = 512


def _pick_bk(k: int) -> int:
    for bk in (512, 256):
        if k % bk == 0:
            return bk
    return k  # single K block (k is always a multiple of 32 for quant tensors)


def _pick_bn(n: int) -> Optional[int]:
    for bn in (DEFAULT_BN, 128):
        if n % bn == 0:
            return bn
    return None


def _pick_bm(m: int) -> int:
    if m >= DEFAULT_BM:
        return DEFAULT_BM
    # round up to the bf16 sublane tile
    return max(16, ((m + 15) // 16) * 16)


def _expand_scales(s, reps: int):
    """[B, N] -> [B*reps, N] with each row repeated (block scale broadcast)."""
    b, n = s.shape
    return jnp.broadcast_to(s[:, None, :], (b, reps, n)).reshape(b * reps, n)


def _unpack_nibbles_tile(packed, bk: int):
    """uint8 [BK/2, BN] -> int32 [BK, BN]; even k from low nibble (format spec)."""
    lo = (packed & 0xF).astype(jnp.int32)
    hi = (packed >> 4).astype(jnp.int32)
    half, n = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(bk, n)


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
    s = s_ref[:].astype(jnp.float32)
    wd = (w * _expand_scales(s, BLOCK)).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4_0_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk = w_ref.shape[0] * 2
    q = _unpack_nibbles_tile(w_ref[:], bk) - 8
    s = s_ref[:].astype(jnp.float32)
    wd = (q.astype(jnp.float32) * _expand_scales(s, BLOCK)).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _q4_k_kernel(x_ref, w_ref, ls_ref, lm_ref, dsup_ref, msup_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk = w_ref.shape[0] * 2
    q = _unpack_nibbles_tile(w_ref[:], bk).astype(jnp.float32)
    sub_per_super = SUPER // BLOCK
    d_eff = _expand_scales(dsup_ref[:].astype(jnp.float32), sub_per_super) \
        * ls_ref[:].astype(jnp.float32)                     # [BK/32, BN]
    m_eff = _expand_scales(msup_ref[:].astype(jnp.float32), sub_per_super) \
        * lm_ref[:].astype(jnp.float32)
    wd = (q * _expand_scales(d_eff, BLOCK) - _expand_scales(m_eff, BLOCK)).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)

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
    bn = _pick_bn(n)
    bk = _pick_bk(k_dim)
    if bn is None or k_dim % BLOCK or (qt.fmt == "q4_k" and bk % SUPER):
        wd = dequantize(qt, dtype=jnp.bfloat16)
        return jnp.dot(x.astype(jnp.bfloat16), wd,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

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
        out = pl.pallas_call(
            _q8_kernel,
            in_specs=[
                x_spec,
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((scale_rows, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            ],
            **common,
        )(x, qt.data, qt.scales)
    elif qt.fmt == "q4_0":
        out = pl.pallas_call(
            _q4_0_kernel,
            in_specs=[
                x_spec,
                pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((scale_rows, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            ],
            **common,
        )(x, qt.data, qt.scales)
    elif qt.fmt == "q4_k":
        super_rows = bk // SUPER
        out = pl.pallas_call(
            _q4_k_kernel,
            in_specs=[
                x_spec,
                pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((scale_rows, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((scale_rows, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((super_rows, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((super_rows, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            ],
            **common,
        )(x, qt.data, qt.sub_scales, qt.sub_mins, qt.super_scales, qt.super_mins)
    else:
        raise ValueError(f"unsupported quant format: {qt.fmt}")

    return out[:m] if m_pad else out


def qmm_pallas_nd(x: jax.Array, qt: QuantTensor, *, interpret: bool = False) -> jax.Array:
    """[..., K] @ qt [K, N] -> [..., N] bf16."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    y = qmm_pallas(x.reshape(-1, k), qt, interpret=interpret)
    return y.reshape(*lead, qt.shape[1])
