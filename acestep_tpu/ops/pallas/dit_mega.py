"""Whole-model DiT Euler-step megakernel (the round-5 perf spike).

ONE ``pallas_call`` with ``grid=(num_layers,)`` runs EVERY decoder layer of a
DiT forward: per-layer q8_0 weights stream HBM->VMEM through the same
manually double-buffered DMA pipeline as the LM decode megakernel
(ops/pallas/decode_mega.py), and all glue — AdaLN modulation from the 6-col
scale_shift_table, rms norms, NEOX rope, GQA self-attention with the
per-layer sliding-window flag, cross-attention over the cached condition
K/V, SwiGLU — runs in-kernel on VMEM-resident activations.  The residual
stream lives in VMEM scratch across grid steps.

Why: the round-5 roofline puts the 10 s Euler step at 39.9% of the HBM roof
(7.5 ms vs a ~3 ms weight-stream floor) while the qmm kernels alone account
for ~40% of device time at near-roof streaming — the remaining ~60% is
launch/fusion-boundary glue, the exact profile the LM decode had before its
megakernel recovered 1.46x.  Per-layer fusion was measured NOT to be the
lever there (docs/BENCHMARK.md round-4 fused-prologue study); the
whole-model kernel was.

Scope (asserted, with graceful fallback to the XLA layer scan in
models/dit.py):
  * batch 1, self-attn mask-free (full-length buckets; the sliding-window
    band IS applied in-kernel from the per-layer flag)
  * fused stacked q8_0 weights (qkv/gateup fused, scales pre-cast f32),
    every matmul dim divisible by the chunk edge
  * T tokens small enough that activations fit VMEM (configs[0]'s 10-20 s
    buckets; longer clips keep the scan+blocked-attention path)
Numerics mirror models/dit.py layer_body: bf16 matmul operands, f32
accumulation and softmax, f32 residual stream.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acestep_tpu.quant import BLOCK, QuantTensor

NEG = -1e30


def _chunk_edge(h: int) -> int:
    return h if h <= 1024 else 1024


def _weights(layers: Dict[str, Any]):
    sa, ca, mlp = layers["self_attn"], layers["cross_attn"], layers["mlp"]
    return (sa["qkv_proj"]["kernel"], sa["o_proj"]["kernel"],
            ca["q_proj"]["kernel"], ca["o_proj"]["kernel"],
            mlp["gateup_proj"]["kernel"], mlp["down_proj"]["kernel"])


def _vmem_estimate(cfg, t: int, lc: int) -> int:
    h = cfg.hidden_size
    ch = _chunk_edge(h)
    qdim = cfg.num_attention_heads * cfg.head_dim
    kvdim = cfg.num_key_value_heads * cfg.head_dim
    fixed = 2 * ch * ch + 2 * (ch // BLOCK) * ch * 4          # wbuf + sbuf
    acts = (
        t * h * 4            # x_s residual
        + t * h * 2          # xa stash (bf16)
        + t * (qdim + 2 * kvdim) * 4   # qkv_acc (doubles as cross-q acc)
        + t * qdim * 4       # attn_sf
        + t * h * 4          # vec_acc
        + 2 * t * ch * 4     # gate/up chunk accs
        + t * cfg.head_dim * 4 * 2     # cos/sin
    )
    crosskv = 2 * cfg.num_key_value_heads * lc * cfg.head_dim * 2  # bf16 blocks
    return fixed + acts + crosskv


VMEM_BUDGET = 12 * 1024 * 1024


def supported(layers: Dict[str, Any], cfg, b: int, t: int, lc: int) -> bool:
    """Shape/format gate; anything outside keeps the XLA scan path."""
    if b != 1:
        return False
    h = cfg.hidden_size
    ch = _chunk_edge(h)
    qdim = cfg.num_attention_heads * cfg.head_dim
    kvdim = cfg.num_key_value_heads * cfg.head_dim
    try:
        ws = _weights(layers)
    except (KeyError, TypeError):
        return False
    for qt in ws:
        if not isinstance(qt, QuantTensor) or qt.fmt != "q8_0":
            return False
        if qt.scales.dtype != jnp.float32:
            return False
        if qt.data.ndim != 3:                  # stacked [L, K, N]
            return False
        _, k, n = qt.data.shape
        if k % ch or n % ch:
            return False
    if h % ch or (qdim + 2 * kvdim) % ch or cfg.intermediate_size % ch:
        return False
    if cfg.head_dim % 128 or t % 8:
        return False
    if _vmem_estimate(cfg, t, lc) > VMEM_BUDGET:
        return False
    return True


def _build_schedule(cfg) -> Tuple[Tuple[str, int, int], ...]:
    """(kind, kk, nn) chunk walk per layer — every entry one [CH, CH] DMA."""
    h = cfg.hidden_size
    ch = _chunk_edge(h)
    qdim = cfg.num_attention_heads * cfg.head_dim
    kvdim = cfg.num_key_value_heads * cfg.head_dim
    inter = cfg.intermediate_size
    nk_h = h // ch
    sched = []
    for nn in range((qdim + 2 * kvdim) // ch):
        for kk in range(nk_h):
            sched.append(("qkv", kk, nn))
    for nn in range(h // ch):
        for kk in range(qdim // ch):
            sched.append(("so", kk, nn))
    for nn in range(qdim // ch):
        for kk in range(nk_h):
            sched.append(("cq", kk, nn))
    for nn in range(h // ch):
        for kk in range(qdim // ch):
            sched.append(("co", kk, nn))
    for nn in range(inter // ch):               # per inter-chunk: gate, up, dn
        for kk in range(nk_h):
            sched.append(("g", kk, nn))
        for kk in range(nk_h):
            sched.append(("u", kk, nn))
        for dn_nn in range(h // ch):
            sched.append(("d", nn, dn_nn))      # dn rows nn, cols dn_nn
    return tuple(sched)


def _rms_w(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _expand32(s):
    r, n = s.shape
    return jnp.broadcast_to(s[:, None, :], (r, BLOCK, n)).reshape(r * BLOCK, n)


def _mega_kernel(
    # static:
    cfg, t, lc, sched,
    # scalar prefetch:
    flags_ref,                       # [L] int32 sliding flags
    # ANY (HBM):
    qkv_d, qkv_s, so_d, so_s, cq_d, cq_s, co_d, co_s, gu_d, gu_s, dn_d, dn_s,
    # VMEM per-layer blocks:
    sa_norm, ca_norm, mlp_norm, sst,          # norms + [6, H] table
    q_norm, k_norm, cq_norm,
    ck_ref, cv_ref,                            # cross K/V [Hkv, Lc, D] bf16
    # VMEM consts:
    x0_ref, tproj_ref, cos_ref, sin_ref, encm_ref,
    # outputs:
    x_out,
    # scratch:
    x_s, xa, wbuf, sbuf, qkv_acc, attn_sf, vec_acc, g_acc, u_acc,
    wsem, ssem,
):
    eps = cfg.rms_norm_eps
    h = cfg.hidden_size
    ch = _chunk_edge(h)
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    grp = hq // hkv
    qdim = hq * d
    kvdim = hkv * d
    inter = cfg.intermediate_size
    window = cfg.sliding_window
    inv_sqrt_d = 1.0 / (d ** 0.5)
    l = pl.program_id(0)
    n_w = len(sched)
    nk_h = h // ch
    n_dn = h // ch

    def w_srcs(g):
        kind, kk, nn = sched[g]
        if kind == "qkv":
            dat, sc = qkv_d, qkv_s
        elif kind == "so":
            dat, sc = so_d, so_s
        elif kind == "cq":
            dat, sc = cq_d, cq_s
        elif kind == "co":
            dat, sc = co_d, co_s
        elif kind in ("g", "u"):
            dat, sc = gu_d, gu_s
            if kind == "u":
                nn = nn + inter // ch          # up columns follow gate columns
        else:                                   # "d": (kk=dn row chunk, nn=col)
            dat, sc = dn_d, dn_s
        return (dat.at[l, pl.ds(kk * ch, ch), pl.ds(nn * ch, ch)],
                sc.at[l, pl.ds(kk * (ch // BLOCK), ch // BLOCK),
                      pl.ds(nn * ch, ch)])

    def w_dmas(slot, g):
        dsrc, ssrc = w_srcs(g)
        return (pltpu.make_async_copy(dsrc, wbuf.at[slot], wsem.at[slot]),
                pltpu.make_async_copy(ssrc, sbuf.at[slot], ssem.at[slot]))

    for dma in w_dmas(0, 0) + w_dmas(1, 1):
        dma.start()

    @pl.when(l == 0)
    def _():
        x_s[:] = x0_ref[:].astype(jnp.float32)

    # AdaLN vectors for this layer: mod = scale_shift_table[l] + timestep_proj
    mod = sst[:].astype(jnp.float32) + tproj_ref[:].astype(jnp.float32)  # [6, H]

    # self-attn input: modulate(rms(x)) with (shift, scale) = mod[0], mod[1]
    # — stashed bf16, consumed chunk-wise by the qkv dots
    xn = _rms_w(x_s[:], sa_norm[0], eps)
    xa[:] = (xn * (1.0 + mod[1:2]) + mod[0:1]).astype(jnp.bfloat16)

    def dequant(slot):
        # f32 dequant then one bf16 round — measured FASTER than all-bf16
        # VPU math (7.03 vs 6.72 ms/step same-session; int8->bf16 converts
        # relayout worse than int8->f32 on v5e)
        w = wbuf[slot].astype(jnp.float32)
        return (w * _expand32(sbuf[slot])).astype(jnp.bfloat16)

    def self_attention_glue():
        """qkv_acc -> attn_sf [T, qdim] (pre-o_proj), f32."""
        q = qkv_acc[:, :qdim].reshape(t, hq, d)
        k = qkv_acc[:, qdim:qdim + kvdim].reshape(t, hkv, d)
        v = qkv_acc[:, qdim + kvdim:].reshape(t, hkv, d)
        q = _rms_w(q, q_norm[0], eps)
        k = _rms_w(k, k_norm[0], eps)
        cos = cos_ref[:][:, None, :].astype(jnp.float32)   # [T, 1, D]
        sin = sin_ref[:][:, None, :].astype(jnp.float32)
        q = q * cos + _rot_half(q) * sin
        k = k * cos + _rot_half(k) * sin

        # per-layer sliding band (bidirectional |i-j| <= window), traced flag
        qi = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        band_ok = jnp.abs(qi - ki) <= window
        sliding = flags_ref[l] != 0
        addmask = jnp.where(jnp.logical_or(jnp.logical_not(sliding), band_ok),
                            0.0, NEG)                       # [T, T] f32

        qb = q.astype(jnp.bfloat16)
        kb = k.astype(jnp.bfloat16)
        vb = v.astype(jnp.bfloat16)
        for g in range(hkv):
            qh = qb[:, g * grp:(g + 1) * grp, :].swapaxes(0, 1) \
                .reshape(grp * t, d)                        # [grp*T, D]
            kh = kb[:, g, :]                                # [T, D]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt_d
            s = s + jnp.tile(addmask, (grp, 1))
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vb[:, g, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [grp*T, D]
            o = o.reshape(grp, t, d).swapaxes(0, 1)         # [T, grp, D]
            attn_sf[:, g * grp * d:(g + 1) * grp * d] = o.reshape(t, grp * d)

    def cross_attention_glue():
        """qkv_acc[:, :qdim] (cross q) -> attn_sf [T, qdim], f32."""
        q = qkv_acc[:, :qdim].reshape(t, hq, d)
        q = _rms_w(q, cq_norm[0], eps)
        encm = encm_ref[:].astype(jnp.float32)              # [1, Lc] additive
        qb = q.astype(jnp.bfloat16)
        for g in range(hkv):
            qh = qb[:, g * grp:(g + 1) * grp, :].swapaxes(0, 1) \
                .reshape(grp * t, d)
            kh = ck_ref[g]                                  # [Lc, D] bf16
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * inv_sqrt_d
            s = s + encm                                    # broadcast rows
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), cv_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o = o.reshape(grp, t, d).swapaxes(0, 1)
            attn_sf[:, g * grp * d:(g + 1) * grp * d] = o.reshape(t, grp * d)

    for g, (kind, kk, nn) in enumerate(sched):
        slot = g % 2
        for dma in w_dmas(slot, g):
            dma.wait()
        wd = dequant(slot)
        if kind == "qkv":
            y = jnp.dot(xa[:, kk * ch:(kk + 1) * ch], wd,
                        preferred_element_type=jnp.float32)
            if kk == 0:
                qkv_acc[:, nn * ch:(nn + 1) * ch] = y
            else:
                qkv_acc[:, nn * ch:(nn + 1) * ch] = \
                    qkv_acc[:, nn * ch:(nn + 1) * ch] + y
        elif kind == "so":
            if kk == 0 and nn == 0:
                self_attention_glue()
            part = attn_sf[:, kk * ch:(kk + 1) * ch].astype(jnp.bfloat16)
            y = jnp.dot(part, wd, preferred_element_type=jnp.float32)
            if kk == 0:
                vec_acc[:, nn * ch:(nn + 1) * ch] = y
            else:
                vec_acc[:, nn * ch:(nn + 1) * ch] = \
                    vec_acc[:, nn * ch:(nn + 1) * ch] + y
            if kk == qdim // ch - 1 and nn == h // ch - 1:
                # x += attn_out * gate_msa; then stash cross-norm input
                x_s[:] = x_s[:] + vec_acc[:] * mod[2:3]
                xa[:] = _rms_w(x_s[:], ca_norm[0], eps).astype(jnp.bfloat16)
        elif kind == "cq":
            y = jnp.dot(xa[:, kk * ch:(kk + 1) * ch], wd,
                        preferred_element_type=jnp.float32)
            if kk == 0:
                qkv_acc[:, nn * ch:(nn + 1) * ch] = y
            else:
                qkv_acc[:, nn * ch:(nn + 1) * ch] = \
                    qkv_acc[:, nn * ch:(nn + 1) * ch] + y
        elif kind == "co":
            if kk == 0 and nn == 0:
                cross_attention_glue()
            part = attn_sf[:, kk * ch:(kk + 1) * ch].astype(jnp.bfloat16)
            y = jnp.dot(part, wd, preferred_element_type=jnp.float32)
            if kk == 0:
                vec_acc[:, nn * ch:(nn + 1) * ch] = y
            else:
                vec_acc[:, nn * ch:(nn + 1) * ch] = \
                    vec_acc[:, nn * ch:(nn + 1) * ch] + y
            if kk == qdim // ch - 1 and nn == h // ch - 1:
                # x += cross_out (no gate); then stash modulated mlp input
                x_s[:] = x_s[:] + vec_acc[:]
                xn2 = _rms_w(x_s[:], mlp_norm[0], eps)
                xa[:] = (xn2 * (1.0 + mod[4:5]) + mod[3:4]).astype(jnp.bfloat16)
        elif kind == "g":
            y = jnp.dot(xa[:, kk * ch:(kk + 1) * ch], wd,
                        preferred_element_type=jnp.float32)
            g_acc[:] = y if kk == 0 else g_acc[:] + y
        elif kind == "u":
            y = jnp.dot(xa[:, kk * ch:(kk + 1) * ch], wd,
                        preferred_element_type=jnp.float32)
            u_acc[:] = y if kk == 0 else u_acc[:] + y
        else:                                   # "d": kk=inter chunk, nn=col
            if nn == 0:
                # finalize this inter-chunk's activation: silu(g) * u
                act = (g_acc[:] * jax.nn.sigmoid(g_acc[:])) * u_acc[:]
                g_acc[:] = act                  # reuse as act stash (f32)
            part = g_acc[:].astype(jnp.bfloat16)
            y = jnp.dot(part, wd, preferred_element_type=jnp.float32)
            if kk == 0:
                vec_acc[:, nn * ch:(nn + 1) * ch] = y
            else:
                vec_acc[:, nn * ch:(nn + 1) * ch] = \
                    vec_acc[:, nn * ch:(nn + 1) * ch] + y
            if kk == inter // ch - 1 and nn == n_dn - 1:
                x_s[:] = x_s[:] + vec_acc[:] * mod[5:6]
        if g + 2 < n_w:
            for dma in w_dmas(slot, g + 2):
                dma.start()

    x_out[:] = x_s[:]


def dit_layers_mega(
    layers: Dict[str, Any],
    cfg,
    x: jax.Array,               # [1, T, H]
    k_stack: jax.Array,         # [L, 1, Hkv, Lc, D]
    v_stack: jax.Array,
    timestep_proj: jax.Array,   # [1, 6, H]
    cos: jax.Array,             # [T, D]
    sin: jax.Array,             # [T, D]
    sliding_flags,              # [L] bool/int
    enc_mask_add: jax.Array,    # [1, Lc] additive f32 (0 / NEG)
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run every decoder layer of one DiT forward; returns x [1, T, H] f32."""
    qkv, so, cq, co, gu, dn = _weights(layers)
    n_layers = qkv.data.shape[0]
    _, t, h = x.shape
    hkv, lc, d = k_stack.shape[2], k_stack.shape[3], k_stack.shape[4]
    ch = _chunk_edge(h)
    qdim = cfg.num_attention_heads * d
    kvdim = hkv * d
    inter = cfg.intermediate_size
    sched = _build_schedule(cfg)

    kernel = functools.partial(_mega_kernel, cfg, t, lc, sched)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    def norm_spec(width):
        return pl.BlockSpec((None, 1, width), lambda l, fl: (l, 0, 0),
                            memory_space=pltpu.VMEM)

    const = lambda shape: pl.BlockSpec(
        shape, lambda l, fl: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_layers,),
        in_specs=[
            any_spec, any_spec, any_spec, any_spec,   # qkv, so
            any_spec, any_spec, any_spec, any_spec,   # cq, co
            any_spec, any_spec, any_spec, any_spec,   # gu, dn
            norm_spec(h), norm_spec(h), norm_spec(h),             # 3 norms
            pl.BlockSpec((None, 6, h), lambda l, fl: (l, 0, 0),
                         memory_space=pltpu.VMEM),                # sst
            norm_spec(d), norm_spec(d), norm_spec(d),             # q/k/cq norms
            pl.BlockSpec((None, hkv, lc, d), lambda l, fl: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),                # cross K
            pl.BlockSpec((None, hkv, lc, d), lambda l, fl: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),                # cross V
            const((t, h)), const((6, h)), const((t, d)), const((t, d)),
            const((1, lc)),
        ],
        out_specs=pl.BlockSpec((t, h), lambda l, fl: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t, h), jnp.float32),                  # x_s
            pltpu.VMEM((t, h), jnp.bfloat16),                 # xa
            pltpu.VMEM((2, ch, ch), jnp.int8),                # wbuf
            pltpu.VMEM((2, ch // BLOCK, ch), jnp.float32),    # sbuf
            pltpu.VMEM((t, qdim + 2 * kvdim), jnp.float32),   # qkv_acc
            pltpu.VMEM((t, qdim), jnp.float32),               # attn_sf
            pltpu.VMEM((t, h), jnp.float32),                  # vec_acc
            pltpu.VMEM((t, ch), jnp.float32),                 # g_acc
            pltpu.VMEM((t, ch), jnp.float32),                 # u_acc
            pltpu.SemaphoreType.DMA((2,)),                    # wsem
            pltpu.SemaphoreType.DMA((2,)),                    # ssem
        ],
    )

    sa = layers["self_attn"]
    ca = layers["cross_attn"]
    total_bytes = sum(qt.nbytes for qt in (qkv, so, cq, co, gu, dn))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, h), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * total_bytes,
            bytes_accessed=total_bytes + k_stack.nbytes + v_stack.nbytes,
            transcendentals=t * (t + lc) * cfg.num_attention_heads * n_layers,
        ),
        interpret=interpret,
    )(
        jnp.asarray(sliding_flags, jnp.int32),
        qkv.data, qkv.scales, so.data, so.scales,
        cq.data, cq.scales, co.data, co.scales,
        gu.data, gu.scales, dn.data, dn.scales,
        layers["self_attn_norm"].reshape(n_layers, 1, h),
        layers["cross_attn_norm"].reshape(n_layers, 1, h),
        layers["mlp_norm"].reshape(n_layers, 1, h),
        layers["scale_shift_table"].reshape(n_layers, 6, h),
        sa["q_norm"].reshape(n_layers, 1, d),
        sa["k_norm"].reshape(n_layers, 1, d),
        ca["q_norm"].reshape(n_layers, 1, d),
        k_stack.reshape(n_layers, hkv, lc, d).astype(jnp.bfloat16),
        v_stack.reshape(n_layers, hkv, lc, d).astype(jnp.bfloat16),
        x[0].astype(jnp.float32),
        timestep_proj[0].astype(jnp.float32),
        cos.astype(jnp.float32), sin.astype(jnp.float32),
        enc_mask_add.astype(jnp.float32),
    )
    return out[None]
