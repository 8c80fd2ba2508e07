"""Pallas decode-attention kernel over the stacked int8 KV cache.

Single-token GQA attention for the LM decode layer scan
(serving/lm.py:decode_step).  Replaces the XLA path's per-layer work —
``attention_int8_self`` plus the scan-xs cache slicing — with ONE kernel that:

  * streams K/V tiles of layer ``li`` straight out of the stacked
    ``[L, B, Hkv, T, D]`` int8 cache via a scalar-prefetch index map (the scan
    form materializes each layer's full cache slice as an HBM copy first —
    the same dynamic-slice copies the stacked-weight qmm path eliminates for
    weights, ops/pallas/qmm.py:qmm_pallas_stacked);
  * reads only the T blocks that hold valid positions: out-of-length grid
    steps revisit the last valid block (index map clamps, so the pipeline
    issues no new DMA) and skip compute, so a 1024-bucket cache at length 500
    costs ~500 positions of bandwidth, not 1024;
  * builds the validity mask from the per-sequence length scalar in-kernel
    (no [B, 1, T] f32 bias materialized per step);
  * folds the per-vector int8 scales into the score/value products exactly as
    the XLA path does (serving/lm.py:attention_int8_self), with f32 softmax
    state via online (flash) accumulation;
  * seeds the online softmax with the current token's SELF term (unquantized
    k_self/v_self), matching the explicit self-term semantics the layer scan
    relies on (the cache write happens once per step, after the scan).

Numerics: scores are bf16 q x int8->bf16 K dots accumulated in f32 (identical
operand dtypes to the XLA path), softmax state f32; results match
``attention_int8_self`` to f32-accumulation-order tolerance.

Reference analog: nano-vllm's paged decode attention
(acestep/third_parts/nano-vllm/nanovllm/layers/attention.py:124-290) — here
the "pages" are static T blocks of a dense bucketed cache, and layer paging
is the scalar-prefetch stacked-cache index.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128


def _pick_tb(t_max: int) -> Optional[int]:
    for tb in (1024, 512, 256, 128):
        if t_max % tb == 0:
            return tb
    return None


def _kernel(hkv, g, tb, nt, li_ref, len_ref, q_ref, kc_ref, ksc_ref, vc_ref,
            vsc_ref, kself_ref, vself_ref, o_ref, acc_ref, m_ref, l_ref):
    bi = pl.program_id(0)
    t = pl.program_id(1)
    d = q_ref.shape[-1]
    length = len_ref[bi]
    last_blk = jnp.maximum(length - 1, 0) // tb

    qg = q_ref[...].reshape(hkv, g, d)              # bf16
    sm_scale = 1.0 / math.sqrt(d)

    @pl.when(t == 0)
    def _init():
        # seed the online softmax with the current token's self term (f32
        # dot, matching attention_int8_self's s_self einsum): m0 = s_self,
        # l0 = exp(0) = 1, acc0 = v_self
        qf = qg.astype(jnp.float32)
        k_self = kself_ref[...].astype(jnp.float32)           # [Hkv, D]
        v_self = vself_ref[...].astype(jnp.float32)
        s_self = jnp.sum(qf * k_self[:, None, :], axis=-1,
                         keepdims=True) * sm_scale            # [Hkv, G, 1]
        m_ref[...] = jnp.broadcast_to(s_self, (hkv, g, _LANES))
        l_ref[...] = jnp.ones((hkv, g, _LANES), jnp.float32)
        acc_ref[...] = jnp.broadcast_to(v_self[:, None, :], (hkv, g, d))

    @pl.when(t <= last_blk)
    def _block():
        k = kc_ref[...].astype(jnp.bfloat16)                  # [Hkv, TB, D]
        ks = ksc_ref[...]                                     # [Hkv, TB] f32
        s = jax.lax.dot_general(
            qg, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                          # [Hkv, G, TB]
        s = s * ks[:, None, :]
        pos = t * tb + jax.lax.broadcasted_iota(jnp.int32, (hkv, g, tb), 2)
        s = jnp.where(pos < length, s, NEG_INF)

        m_old = m_ref[..., :1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[..., :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vsc_ref[...][:, None, :]).astype(jnp.bfloat16)
        v = vc_ref[...].astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            pv, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # [Hkv, G, D]
        acc_ref[...] = acc_ref[...] * alpha + o
        m_ref[...] = jnp.broadcast_to(m_new, (hkv, g, _LANES))
        l_ref[...] = jnp.broadcast_to(l_new, (hkv, g, _LANES))

    @pl.when(t == nt - 1)
    def _fin():
        out = acc_ref[...] / l_ref[..., :1]
        o_ref[...] = out.reshape(hkv * g, d)


def decode_attention_int8_stacked(
    q: jax.Array,        # [B, Hq, D] (bf16/f32, post-RoPE, current token)
    kc: jax.Array,       # [L, B, Hkv, T_max, D] int8 stacked cache
    ksc: jax.Array,      # [L, B, Hkv, T_max] f32 per-vector scales
    vc: jax.Array,       # [L, B, Hkv, T_max, D] int8
    vsc: jax.Array,      # [L, B, Hkv, T_max] f32
    lengths: jax.Array,  # [B] int32; cache positions < length are valid
    li: jax.Array,       # scalar int32 layer index (traced)
    k_self: jax.Array,   # [B, Hkv, D] current token's K (unquantized)
    v_self: jax.Array,   # [B, Hkv, D] current token's V
    *,
    interpret: bool = False,
) -> Optional[jax.Array]:
    """Single-token GQA attention for layer ``li`` -> [B, Hq, D] f32.

    Returns None for tile-unfriendly shapes (caller falls back to the XLA
    ``attention_int8_self`` path).
    """
    b, hq, d = q.shape
    n_l, _, hkv, t_max, _ = kc.shape
    if d % _LANES != 0 or hq % hkv != 0:
        return None
    tb = _pick_tb(t_max)
    if tb is None:
        return None
    g = hq // hkv
    nt = t_max // tb

    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    lengths = lengths.astype(jnp.int32)

    def _cmap(bi, t, li_ref, len_ref):
        lb = jnp.maximum(len_ref[bi] - 1, 0) // tb
        return (li_ref[0], bi, 0, jnp.minimum(t, lb), 0)

    def _smap(bi, t, li_ref, len_ref):
        lb = jnp.maximum(len_ref[bi] - 1, 0) // tb
        return (li_ref[0], bi, 0, jnp.minimum(t, lb))

    def _bmap(bi, t, li_ref, len_ref):
        return (bi, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((None, hq, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb, d), _cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb), _smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb, d), _cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb), _smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, d), _bmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, hq, d), _bmap, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv, g, d), jnp.float32),
            pltpu.VMEM((hkv, g, _LANES), jnp.float32),
            pltpu.VMEM((hkv, g, _LANES), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, hkv, g, tb, nt),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t_max * d,
            bytes_accessed=2 * b * hkv * t_max * (d + 4) + b * hq * d * 2,
            transcendentals=b * hq * t_max,
        ),
        interpret=interpret,
    )(li_arr, lengths, q.astype(jnp.bfloat16), kc, ksc, vc, vsc,
      k_self.astype(jnp.bfloat16), v_self.astype(jnp.bfloat16))
    return out
