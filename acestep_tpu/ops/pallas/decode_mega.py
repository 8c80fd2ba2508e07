"""Whole-model LM decode megakernel (VERDICT r4 item 3 — the bounded spike).

ONE ``pallas_call`` with ``grid=(num_layers,)`` runs EVERY transformer layer
of a single decode step: per-layer q8_0 weights stream HBM->VMEM through a
manually double-buffered DMA pipeline (uniform 1 MB chunks), the int8 KV cache
streams in T-chunks, and all glue (rms norms, NEOX rope, KV quantization, GQA
attention with the explicit self-term, SwiGLU) runs in-kernel on VMEM-resident
activations.  The residual stream lives in VMEM scratch across grid steps, so
the per-token serial chain collapses from ~75 XLA fusions + ~30 kernel
launches to ONE launch whose floor is the weight-stream time.

Why: round-3 measured b=1 decode at 1.83 ms/token vs a ~0.9 ms streaming
floor, and proved per-layer kernel fusion cannot close the gap (the
fused-prologue A/B in docs/BENCHMARK.md) — the remaining 2x is launch/fusion
boundary overhead, recoverable only by a single whole-model kernel.  The
reference's analog is nano-vllm's CUDA-graph decode capture
(third_parts/nano-vllm/nanovllm/engine/model_runner.py:637), which likewise
exists to delete per-op launch overhead at batch-1.

Scope (asserted, with graceful fallback in serving/lm.py):
  * q8_0 serving-fused stacked weights (qkv/gateup fused, scales pre-cast f32)
  * hidden_size == 1024 (Qwen3-0.6B, the serving default planner)
  * B <= 8, cache T a multiple of the 128-token KV chunk (TC), and the
    estimated VMEM scratch footprint under budget (see ``_vmem_estimate``)
Numerics mirror serving/lm.py decode_step: bf16 matmul operands, f32
accumulation, f32 softmax, bf16-rounded residual stream.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acestep_tpu.quant import BLOCK, QuantTensor

CH = 1024          # uniform weight-chunk edge (K or N) -> 1 MB int8 per chunk
TC = 128           # KV-cache T-chunk (kv_cache.round_len granularity, so any
                   # serving cache length divides evenly)
NEG = -1e30


def _vmem_estimate(cfg, b: int, t_max: int) -> int:
    """Bytes of VMEM scratch the kernel allocates (mirror of scratch_shapes).

    The only t_max-scaled term is the f32 scores buffer; everything else is
    the fixed double-buffered weight/KV stream (~2.5 MB) plus per-batch
    accumulators.  Gating on this keeps a long cache (large prompt +
    max_new_tokens) from failing Mosaic compilation at serving time instead
    of falling back to the layer-scan decode (ADVICE r4, medium).
    """
    d = cfg.head_dim
    hkv = cfg.num_key_value_heads
    inter = cfg.intermediate_size
    h = cfg.hidden_size
    qdim = cfg.num_attention_heads * d
    fixed = (
        2 * CH * CH                       # wbuf int8
        + 2 * (CH // BLOCK) * CH * 4      # sbuf f32
        + 2 * (2 * b * hkv * TC * d)      # k/v bufs int8
        + 2 * (2 * b * hkv * TC * 4)      # k/v scale bufs f32
    )
    per_b = (h + (qdim + 2 * hkv * d) + qdim + 2 * inter + inter + h) * 4
    scores = b * cfg.num_attention_heads * t_max * 4
    return fixed + b * per_b + scores


# leave >=4 MB of the ~16 MB/core VMEM for pipeline in/out blocks + compiler
VMEM_BUDGET = 12 * 1024 * 1024


def supported(layers: Dict[str, Any], cfg, b: int, t_max: int) -> bool:
    """Shape/format gate for the megakernel path."""
    try:
        qkv = layers["qkv_proj"]["kernel"]
        o = layers["o_proj"]["kernel"]
        gu = layers["gateup_proj"]["kernel"]
        dn = layers["down_proj"]["kernel"]
    except (KeyError, TypeError):
        return False
    for qt in (qkv, o, gu, dn):
        if not isinstance(qt, QuantTensor) or qt.fmt != "q8_0":
            return False
        if qt.scales.dtype != jnp.float32:
            return False
        k, n = qt.shape
        if k % CH or n % CH:
            return False
    if cfg.hidden_size != CH:
        return False
    if b > 8 or t_max % TC:
        return False
    if _vmem_estimate(cfg, b, t_max) > VMEM_BUDGET:
        return False
    return True


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _expand32(s):
    """[K/32, N] block scales -> [K, N] rows."""
    r, n = s.shape
    return jnp.broadcast_to(s[:, None, :], (r, BLOCK, n)).reshape(r * BLOCK, n)


def _build_schedule(cfg) -> Tuple[Tuple[str, int], ...]:
    hq = cfg.num_attention_heads * cfg.head_dim
    kv = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.intermediate_size
    sched = []
    sched += [("qkv", c) for c in range((hq + 2 * kv) // CH)]   # N-split
    sched += [("o", c) for c in range(hq // CH)]                # K-split
    sched += [("gu", c) for c in range(2 * inter // CH)]        # N-split
    sched += [("dn", c) for c in range(inter // CH)]            # K-split
    return tuple(sched)


def _mega_kernel(
    # static:
    cfg, b, t_max, sched,
    # scalar prefetch:
    lens_ref,
    # ANY (HBM) inputs:
    qkv_d, qkv_s, o_d, o_s, gu_d, gu_s, dn_d, dn_s,
    kc_ref, kcs_ref, vc_ref, vcs_ref,
    # VMEM blocked inputs:
    in_norm, post_norm, q_norm, k_norm, x0_ref, cos_ref, sin_ref,
    # outputs:
    x_out, k_new, ks_new, v_new, vs_new,
    # scratch:
    x_s, wbuf, sbuf, kbuf, ksbuf, vbuf, vsbuf,
    qkv_acc, attn_s, gu_acc, act_s, vec_acc, scores,
    wsem, ssem, ksem, kssem, vsem, vssem,
):
    eps = cfg.rms_norm_eps
    hq_heads, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    d = cfg.head_dim
    grp = hq_heads // hkv
    qdim = hq_heads * d
    kvdim = hkv * d
    inter = cfg.intermediate_size
    ntc = t_max // TC
    inv_sqrt_d = 1.0 / (d ** 0.5)
    l = pl.program_id(0)
    n_w = len(sched)

    def w_srcs(g):
        kind, c = sched[g]
        if kind == "qkv":
            return (qkv_d.at[l, :, pl.ds(c * CH, CH)],
                    qkv_s.at[l, :, pl.ds(c * CH, CH)])
        if kind == "o":
            return (o_d.at[l, pl.ds(c * CH, CH), :],
                    o_s.at[l, pl.ds(c * (CH // BLOCK), CH // BLOCK), :])
        if kind == "gu":
            return (gu_d.at[l, :, pl.ds(c * CH, CH)],
                    gu_s.at[l, :, pl.ds(c * CH, CH)])
        return (dn_d.at[l, pl.ds(c * CH, CH), :],
                dn_s.at[l, pl.ds(c * (CH // BLOCK), CH // BLOCK), :])

    def w_dmas(slot, g):
        dsrc, ssrc = w_srcs(g)
        return (pltpu.make_async_copy(dsrc, wbuf.at[slot], wsem.at[slot]),
                pltpu.make_async_copy(ssrc, sbuf.at[slot], ssem.at[slot]))

    def k_dmas(slot, tc):
        return (pltpu.make_async_copy(
                    kc_ref.at[l, :, :, pl.ds(tc * TC, TC), :],
                    kbuf.at[slot], ksem.at[slot]),
                pltpu.make_async_copy(
                    kcs_ref.at[l, :, :, pl.ds(tc * TC, TC)],
                    ksbuf.at[slot], kssem.at[slot]))

    def v_dmas(slot, tc):
        return (pltpu.make_async_copy(
                    vc_ref.at[l, :, :, pl.ds(tc * TC, TC), :],
                    vbuf.at[slot], vsem.at[slot]),
                pltpu.make_async_copy(
                    vcs_ref.at[l, :, :, pl.ds(tc * TC, TC)],
                    vsbuf.at[slot], vssem.at[slot]))

    # -- warm up the pipelines ------------------------------------------------
    for dma in w_dmas(0, 0) + w_dmas(1, 1):
        dma.start()
    for dma in k_dmas(0, 0) + v_dmas(0, 0):
        dma.start()
    if ntc > 1:
        for dma in k_dmas(1, 1) + v_dmas(1, 1):
            dma.start()

    @pl.when(l == 0)
    def _():
        x_s[:] = x0_ref[:].astype(jnp.float32)

    xnb = _rms(x_s[:], in_norm[:], eps).astype(jnp.bfloat16)   # [B, H]

    def dequant(slot):
        w = wbuf[slot].astype(jnp.float32)
        return (w * _expand32(sbuf[slot])).astype(jnp.bfloat16)

    def attention_glue():
        """qkv_acc -> attn_s; writes new-token K/V outputs."""
        q = qkv_acc[:, :qdim].reshape(b, hq_heads, d)
        k_ = qkv_acc[:, qdim:qdim + kvdim].reshape(b, hkv, d)
        v_ = qkv_acc[:, qdim + kvdim:].reshape(b, hkv, d)
        q = _rms(q, q_norm[:], eps)
        k_ = _rms(k_, k_norm[:], eps)
        cos = cos_ref[:][:, None, :].astype(jnp.float32)
        sin = sin_ref[:][:, None, :].astype(jnp.float32)
        q = q * cos + _rot_half(q) * sin
        k_ = k_ * cos + _rot_half(k_) * sin

        # quantize the new token's K/V for the cache (kv_cache.quantize_kv)
        def quant(x):
            amax = jnp.max(jnp.abs(x), axis=-1)
            scale = amax / 127.0
            inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
            qv = jnp.clip(jnp.round(x * inv[..., None]), -127, 127)
            return qv.astype(jnp.int8), scale
        kq8, ksc = quant(k_)
        vq8, vsc = quant(v_)
        k_new[:] = kq8
        ks_new[:] = ksc
        v_new[:] = vq8
        vs_new[:] = vsc

        # GQA block-diagonal trick: one [HQ, HKV*TC] dot per (batch, chunk)
        # computes every q-head x kv-head pair; a diagonal mask keeps the
        # GQA-valid ones.  8x padded FLOPs, but the MXU is idle at decode
        # shapes and this avoids 64 tiny per-head dots per chunk.
        ii = jax.lax.broadcasted_iota(jnp.int32, (hkv, 1, hkv, 1), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (hkv, 1, hkv, 1), 2)
        eye = (ii == jj).astype(jnp.float32)

        qb = q.astype(jnp.bfloat16)
        for tc in range(ntc):
            slot = tc % 2
            for dma in k_dmas(slot, tc):
                dma.wait()
            for bi in range(b):
                kcb = kbuf[slot][bi].reshape(hkv * TC, d).astype(jnp.bfloat16)
                sf = jax.lax.dot_general(
                    qb[bi], kcb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [HQ, HKV*TC]
                sf = sf.reshape(hkv, grp, hkv, TC)
                sf = jnp.sum(sf * eye, axis=2)               # [HKV, GRP, TC]
                sf = sf * inv_sqrt_d * ksbuf[slot][bi][:, None, :]
                scores[bi, :, tc * TC:(tc + 1) * TC] = sf.reshape(hq_heads, TC)
            if tc + 2 < ntc:
                for dma in k_dmas(slot, tc + 2):
                    dma.start()

        # softmax with length mask + explicit self-term (attention_int8_self)
        e_selfs, denoms = [], []
        for bi in range(b):
            sb = scores[bi, :, :]                             # [HQ, T]
            t_iota = jax.lax.broadcasted_iota(jnp.int32, (hq_heads, t_max), 1)
            valid = t_iota < lens_ref[bi]
            sb = jnp.where(valid, sb, NEG)
            s_self = jnp.sum(
                q[bi].reshape(hkv, grp, d)
                * k_[bi][:, None, :], axis=-1).reshape(hq_heads, 1) * inv_sqrt_d
            m = jnp.maximum(jnp.max(sb, axis=-1, keepdims=True), s_self)  # [HQ,1]
            e = jnp.where(valid, jnp.exp(sb - m), 0.0)
            e_self = jnp.exp(s_self - m)                      # [HQ, 1]
            denom = jnp.sum(e, axis=-1, keepdims=True) + e_self
            scores[bi, :, :] = e                              # reuse as probs
            e_selfs.append(e_self)
            denoms.append(denom)

        # weighted V pass
        outs = [jnp.zeros((hq_heads, d), jnp.float32) for _ in range(b)]
        for tc in range(ntc):
            slot = tc % 2
            for dma in v_dmas(slot, tc):
                dma.wait()
            for bi in range(b):
                p = scores[bi, :, tc * TC:(tc + 1) * TC].reshape(hkv, grp, TC)
                p = p * vsbuf[slot][bi][:, None, :]
                pf = (p[:, :, None, :] * eye).reshape(hq_heads, hkv * TC)
                vcb = vbuf[slot][bi].reshape(hkv * TC, d).astype(jnp.bfloat16)
                outs[bi] = outs[bi] + jax.lax.dot_general(
                    pf.astype(jnp.bfloat16), vcb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if tc + 2 < ntc:
                for dma in v_dmas(slot, tc + 2):
                    dma.start()

        for bi in range(b):
            v_self_rep = jnp.broadcast_to(
                v_[bi][:, None, :], (hkv, grp, d)).reshape(hq_heads, d)
            o_bi = (outs[bi] + e_selfs[bi] * v_self_rep) / denoms[bi]
            attn_s[bi, :] = o_bi.reshape(qdim)

    # -- the unified weight-stream loop ---------------------------------------
    n_qkv = (qdim + 2 * kvdim) // CH
    n_o = qdim // CH
    n_gu = 2 * inter // CH
    for g, (kind, c) in enumerate(sched):
        slot = g % 2
        for dma in w_dmas(slot, g):
            dma.wait()
        wd = dequant(slot)
        if kind == "qkv":
            qkv_acc[:, c * CH:(c + 1) * CH] = jnp.dot(
                xnb, wd, preferred_element_type=jnp.float32)
        elif kind == "o":
            if c == 0:
                attention_glue()
            part = attn_s[:, c * CH:(c + 1) * CH].astype(jnp.bfloat16)
            y = jnp.dot(part, wd, preferred_element_type=jnp.float32)
            vec_acc[:] = y if c == 0 else vec_acc[:] + y
            if c == n_o - 1:
                # bf16-rounded residual stream (decode_step's x dtype)
                x_s[:] = (x_s[:] + vec_acc[:]).astype(jnp.bfloat16) \
                    .astype(jnp.float32)
        elif kind == "gu":
            if c == 0:
                hn_b = _rms(x_s[:], post_norm[:], eps).astype(jnp.bfloat16)
                attn_s[:, :CH] = hn_b.astype(jnp.float32)  # stash for later chunks
            hn_now = attn_s[:, :CH].astype(jnp.bfloat16)
            gu_acc[:, c * CH:(c + 1) * CH] = jnp.dot(
                hn_now, wd, preferred_element_type=jnp.float32)
        else:  # dn
            if c == 0:
                gate = gu_acc[:, :inter]
                up = gu_acc[:, inter:]
                act = (gate * jax.nn.sigmoid(gate)).astype(jnp.bfloat16) \
                    .astype(jnp.float32) * up.astype(jnp.bfloat16)
                act_s[:] = act.astype(jnp.float32)
            part = act_s[:, c * CH:(c + 1) * CH].astype(jnp.bfloat16)
            y = jnp.dot(part, wd, preferred_element_type=jnp.float32)
            vec_acc[:] = y if c == 0 else vec_acc[:] + y
            if c == inter // CH - 1:
                x_s[:] = (x_s[:] + vec_acc[:]).astype(jnp.bfloat16) \
                    .astype(jnp.float32)
        if g + 2 < n_w:
            for dma in w_dmas(slot, g + 2):
                dma.start()

    x_out[:] = x_s[:]


def decode_layers_mega(
    layers: Dict[str, Any],
    cfg,
    cache_k: jax.Array,        # [L, B, Hkv, T, D] int8
    cache_ks: jax.Array,       # [L, B, Hkv, T] f32
    cache_v: jax.Array,
    cache_vs: jax.Array,
    lengths: jax.Array,        # [B] int32
    x0: jax.Array,             # [B, H]
    cos: jax.Array,            # [B, D] f32
    sin: jax.Array,            # [B, D] f32
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run every layer of one decode step; returns
    (x [B, H] f32, k_new [L,B,Hkv,D] int8, ks_new [L,B,Hkv] f32, v_new, vs_new)."""
    n_layers, b_c, hkv, t_max, d = cache_k.shape
    b, h = x0.shape
    qkv = layers["qkv_proj"]["kernel"]
    o = layers["o_proj"]["kernel"]
    gu = layers["gateup_proj"]["kernel"]
    dn = layers["down_proj"]["kernel"]
    qdim = cfg.num_attention_heads * d
    inter = cfg.intermediate_size
    sched = _build_schedule(cfg)

    kernel = functools.partial(_mega_kernel, cfg, b, t_max, sched)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    # norms are reshaped to [L, 1, H] so the per-layer block is (None, 1, H):
    # its trailing dims EQUAL the array dims, satisfying Mosaic's tiling rule
    # (a (1, H) block over [L, H] does not, and bf16 rows cannot be
    # dynamically indexed in-kernel due to sublane packing)
    def norm_spec(width):
        return pl.BlockSpec((None, 1, width), lambda l, lens: (l, 0, 0),
                            memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda l, lens: (0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_layers,),
        in_specs=[
            any_spec, any_spec, any_spec, any_spec,   # qkv_d/s, o_d/s
            any_spec, any_spec, any_spec, any_spec,   # gu_d/s, dn_d/s
            any_spec, any_spec, any_spec, any_spec,   # k, ks, v, vs
            norm_spec(h), norm_spec(h), norm_spec(d), norm_spec(d),
            const2((b, h)), const2((b, d)), const2((b, d)),  # x0, cos, sin
        ],
        out_specs=[
            pl.BlockSpec((b, h), lambda l, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b, hkv, d), lambda l, lens: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b, hkv), lambda l, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b, hkv, d), lambda l, lens: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, b, hkv), lambda l, lens: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),                 # x_s
            pltpu.VMEM((2, CH, CH), jnp.int8),               # wbuf
            pltpu.VMEM((2, CH // BLOCK, CH), jnp.float32),   # sbuf
            pltpu.VMEM((2, b, hkv, TC, d), jnp.int8),        # kbuf
            pltpu.VMEM((2, b, hkv, TC), jnp.float32),        # ksbuf
            pltpu.VMEM((2, b, hkv, TC, d), jnp.int8),        # vbuf
            pltpu.VMEM((2, b, hkv, TC), jnp.float32),        # vsbuf
            pltpu.VMEM((b, qdim + 2 * hkv * d), jnp.float32),  # qkv_acc
            pltpu.VMEM((b, qdim), jnp.float32),              # attn_s
            pltpu.VMEM((b, 2 * inter), jnp.float32),         # gu_acc
            pltpu.VMEM((b, inter), jnp.float32),             # act_s
            pltpu.VMEM((b, h), jnp.float32),                 # vec_acc
            pltpu.VMEM((b, cfg.num_attention_heads, t_max), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),                   # wsem
            pltpu.SemaphoreType.DMA((2,)),                   # ssem
            pltpu.SemaphoreType.DMA((2,)),                   # ksem
            pltpu.SemaphoreType.DMA((2,)),                   # kssem
            pltpu.SemaphoreType.DMA((2,)),                   # vsem
            pltpu.SemaphoreType.DMA((2,)),                   # vssem
        ],
    )

    total_bytes = sum(qt.nbytes for qt in (qkv, o, gu, dn))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, b, hkv, d), jnp.int8),
            jax.ShapeDtypeStruct((n_layers, b, hkv), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, b, hkv, d), jnp.int8),
            jax.ShapeDtypeStruct((n_layers, b, hkv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * total_bytes,
            bytes_accessed=total_bytes
            + cache_k.nbytes + cache_v.nbytes,
            transcendentals=b * cfg.num_attention_heads * t_max * n_layers,
        ),
    )(
        jnp.asarray(lengths, jnp.int32),
        qkv.data, qkv.scales, o.data, o.scales,
        gu.data, gu.scales, dn.data, dn.scales,
        cache_k, cache_ks, cache_v, cache_vs,
        layers["input_norm"].reshape(n_layers, 1, -1),
        layers["post_norm"].reshape(n_layers, 1, -1),
        layers["q_norm"].reshape(n_layers, 1, -1),
        layers["k_norm"].reshape(n_layers, 1, -1),
        x0.astype(jnp.float32), cos.astype(jnp.float32),
        sin.astype(jnp.float32),
    )
    return tuple(out)
