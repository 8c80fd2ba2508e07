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


def _rotate_half_lanes(x):
    """NEOX rotate-half on the lane axis: (-x2, x1) for x = (x1, x2).

    roll(x, D/2) puts x2 in the first half and x1 in the second; a lane-index
    sign mask negates the first half (Mosaic rejects concatenate in kernels)."""
    d = x.shape[-1]
    rolled = pltpu.roll(x, d // 2, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < d // 2, -rolled, rolled)


def _rms_norm_rope(x, w, cos, sin, eps):
    """In-kernel rms_norm + NEOX rope, rounding where the XLA path rounds
    (ops/nn.py rms_norm -> bf16, apply_rope in bf16)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return (yf * cos + _rotate_half_lanes(yf) * sin).astype(jnp.bfloat16)


def _quantize_rows(x):
    """[..., D] f32 -> (int8, f32 scale over D) — kv_cache.quantize_kv math."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    return q, scale


def _fused_kernel(hkv, g, tb, nt, eps, li_ref, len_ref,
                  q_ref, k_ref, v_ref, qn_ref, kn_ref, cs_ref, sn_ref,
                  kc_ref, ksc_ref, vc_ref, vsc_ref,
                  o_ref, knew_ref, ksnew_ref, vnew_ref, vsnew_ref,
                  acc_ref, m_ref, l_ref, qro_ref):
    """decode_attention_int8_stacked PLUS the per-layer prologue the XLA path
    runs around it: q/k rms_norm, NEOX rope, and int8 KV quantization of the
    current token — ~12 small XLA fusions per layer collapsed into this
    kernel (the b=1 decode step is latency-bound on that op chain, not on
    bandwidth: docs/BENCHMARK.md round-3 A/B matrix)."""
    bi = pl.program_id(0)
    t = pl.program_id(1)
    d = q_ref.shape[-1]
    length = len_ref[bi]
    last_blk = jnp.maximum(length - 1, 0) // tb
    sm_scale = 1.0 / math.sqrt(d)

    @pl.when(t == 0)
    def _init():
        cos = cs_ref[...].astype(jnp.float32)                  # [1, D]
        sin = sn_ref[...].astype(jnp.float32)
        q = _rms_norm_rope(q_ref[...].reshape(hkv, g, d), qn_ref[...],
                           cos[None], sin[None], eps)          # [Hkv, G, D] bf16
        k = _rms_norm_rope(k_ref[...], kn_ref[...], cos, sin, eps)  # [Hkv, D]
        v = v_ref[...]                                          # [Hkv, D] raw
        kq, ks = _quantize_rows(k.astype(jnp.float32))
        vq, vs = _quantize_rows(v.astype(jnp.float32))
        knew_ref[...] = kq
        vnew_ref[...] = vq
        ksnew_ref[...] = jnp.broadcast_to(ks, (hkv, _LANES))
        vsnew_ref[...] = jnp.broadcast_to(vs, (hkv, _LANES))
        qro_ref[...] = q.astype(jnp.float32)
        # online-softmax seed: the current token's self term (unquantized)
        qf = q.astype(jnp.float32)
        s_self = jnp.sum(qf * k.astype(jnp.float32)[:, None, :], axis=-1,
                         keepdims=True) * sm_scale             # [Hkv, G, 1]
        m_ref[...] = jnp.broadcast_to(s_self, (hkv, g, _LANES))
        l_ref[...] = jnp.ones((hkv, g, _LANES), jnp.float32)
        acc_ref[...] = jnp.broadcast_to(
            v.astype(jnp.float32)[:, None, :], (hkv, g, d))

    @pl.when(t <= last_blk)
    def _block():
        qg = qro_ref[...].astype(jnp.bfloat16)
        kb = kc_ref[...].astype(jnp.bfloat16)                  # [Hkv, TB, D]
        ks = ksc_ref[...]
        s = jax.lax.dot_general(
            qg, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        s = s * ks[:, None, :]
        pos = t * tb + jax.lax.broadcasted_iota(jnp.int32, (hkv, g, tb), 2)
        s = jnp.where(pos < length, s, NEG_INF)

        m_old = m_ref[..., :1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_ref[..., :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = (p * vsc_ref[...][:, None, :]).astype(jnp.bfloat16)
        vb = vc_ref[...].astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            pv, vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + o
        m_ref[...] = jnp.broadcast_to(m_new, (hkv, g, _LANES))
        l_ref[...] = jnp.broadcast_to(l_new, (hkv, g, _LANES))

    @pl.when(t == nt - 1)
    def _fin():
        out = acc_ref[...] / l_ref[..., :1]
        o_ref[...] = out.reshape(hkv * g, d)


def decode_attention_fused_stacked(
    q_raw: jax.Array,    # [B, Hq, D] straight from the qkv matmul (pre-norm)
    k_raw: jax.Array,    # [B, Hkv, D]
    v_raw: jax.Array,    # [B, Hkv, D]
    q_norm_w: jax.Array,  # [D]
    k_norm_w: jax.Array,  # [D]
    cos: jax.Array,      # [B, D] rope terms at each sequence's position
    sin: jax.Array,      # [B, D]
    kc: jax.Array,       # [L, B, Hkv, T_max, D] int8 stacked cache
    ksc: jax.Array,      # [L, B, Hkv, T_max] f32
    vc: jax.Array,       # [L, B, Hkv, T_max, D] int8
    vsc: jax.Array,      # [L, B, Hkv, T_max] f32
    lengths: jax.Array,  # [B] int32
    li: jax.Array,       # scalar int32 layer index (traced)
    *,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """Fused decode attention: q/k norm + rope + KV quantize + flash attention
    over the stacked int8 cache, one kernel per layer.

    Returns (out [B, Hq, D] f32, k_new [B, Hkv, D] int8, k_scale [B, Hkv] f32,
    v_new, v_scale) or None for tile-unfriendly shapes."""
    b, hq, d = q_raw.shape
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

    def _wmap(bi, t, li_ref, len_ref):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((None, hq, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), _wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), _wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb, d), _cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb), _smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb, d), _cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, hkv, tb), _smap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, hq, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, _LANES),
                         lambda bi, t, li_ref, len_ref: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, d), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((None, hkv, _LANES),
                         lambda bi, t, li_ref, len_ref: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, g, d), jnp.float32),
            pltpu.VMEM((hkv, g, _LANES), jnp.float32),
            pltpu.VMEM((hkv, g, _LANES), jnp.float32),
            pltpu.VMEM((hkv, g, d), jnp.float32),
        ],
    )
    out, k_new, k_s, v_new, v_s = pl.pallas_call(
        functools.partial(_fused_kernel, hkv, g, tb, nt, eps),
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, d), jnp.int8),
            jax.ShapeDtypeStruct((b, hkv, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, d), jnp.int8),
            jax.ShapeDtypeStruct((b, hkv, _LANES), jnp.float32),
        ],
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
    )(li_arr, lengths,
      q_raw.astype(jnp.bfloat16), k_raw.astype(jnp.bfloat16),
      v_raw.astype(jnp.bfloat16),
      q_norm_w.reshape(1, d).astype(jnp.float32),
      k_norm_w.reshape(1, d).astype(jnp.float32),
      cos.reshape(b, 1, d).astype(jnp.float32),
      sin.reshape(b, 1, d).astype(jnp.float32),
      kc, ksc, vc, vsc)
    return out, k_new, k_s[:, :, 0], v_new, v_s[:, :, 0]


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
