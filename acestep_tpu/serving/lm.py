"""LM planner serving: batched prefill + on-device autoregressive decode.

TPU-native replacement for the reference's nano-vllm engine (paged KV, CUDA
graphs — acestep/third_parts/nano-vllm/): here the whole decode loop is ONE
jitted ``lax.scan`` over a dense int8 KV cache, so a generation call is a single
device dispatch (no per-token host round-trips; the tunnel/host latency that
dominates per-step dispatch makes this mandatory on TPU).

Supports the reference's generation semantics (llm_inference.py:1061+):
  * temperature / top-k / top-p sampling, per-call seed;
  * stop-token sets (phase 1 stops at ``</think>``);
  * codes phase: restrict sampling to the audio-code token range and BLOCK EOS
    until ``min_tokens``, then FORCE EOS at ``forced_eos_at``
    (constrained_logits_processor.py:155-156, :1606-1628);
  * classifier-free guidance with a paired uncond batch
    (llm_inference.py:2352; scheduler co-schedules pairs, scheduler.py:47-75).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen
from acestep_tpu.ops import apply_rope, attention, linear, make_attention_mask, rms_norm, rope_cos_sin
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving.kv_cache import KVCache

NEG_INF = -1e30


def _psum(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """All-reduce a row-parallel partial sum (no-op outside shard_map)."""
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _row_parallel(x: jax.Array, w, axis_name: Optional[str]) -> jax.Array:
    """Row-parallel projection ending in an all-reduce (o_proj under TP):
    ring collective matmul when ACESTEP_TPU_COLLECTIVE_MATMUL=1, else
    matmul + psum (no-op reduce outside shard_map)."""
    if axis_name is None:
        return linear(x, w)
    from acestep_tpu.parallel.collective_matmul import row_parallel_linear

    return row_parallel_linear(x, w, axis_name)


def _gather_cols(x: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Re-assemble column-sharded logits: tiled all_gather along the last axis
    (shards are contiguous column blocks, so vocab order is preserved).  Under
    the collective-matmul flag the gather rides the ring (n-1 ppermute hops)."""
    if axis_name is None:
        return x
    from acestep_tpu.parallel.collective_matmul import (
        allgather_chunks, collective_matmul_enabled)

    if collective_matmul_enabled():
        return allgather_chunks(x, axis_name)
    return jax.lax.all_gather(x, axis_name, axis=x.ndim - 1, tiled=True)


# ---------------------------------------------------------------------------
# model pieces with cache
# ---------------------------------------------------------------------------

def _rope_at(positions: jax.Array, head_dim: int, base: float):
    """positions [B] -> cos/sin [B, 1, head_dim] (for single-token decode)."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb)[:, None, :], jnp.sin(emb)[:, None, :]


def _mm_cast(x: jax.Array, dtype) -> jax.Array:
    """Matmul operand cast: bf16 feeds the MXU on TPU (int8 cache values are
    exactly representable); f32 off-TPU (XLA:CPU dot-thunk bf16 gaps)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return x.astype(jnp.float32)
    return x.astype(dtype)


def attention_int8_self(
    q: jax.Array,                  # [B, Hq, 1, D] (bf16/f32, post-RoPE)
    kq: jax.Array,                 # [B, Hkv, T, D] int8 (cache, read-only)
    ks: jax.Array,                 # [B, Hkv, T] f32
    vq: jax.Array,                 # [B, Hkv, T, D] int8
    vs: jax.Array,                 # [B, Hkv, T] f32
    bias: jax.Array,               # [B, 1, T] additive f32 (pos < length valid)
    k_self: jax.Array,             # [B, Hkv, D] this token's K (unquantized)
    v_self: jax.Array,             # [B, Hkv, D] this token's V
) -> jax.Array:
    """Single-token GQA attention over the int8 cache PLUS an explicit
    self-term for the current token, so the decode layer scan never writes the
    cache (writes happen once per step after the scan — serving profile showed
    per-layer cache scatters force full-cache copies on TPU)."""
    import math as _math

    b, hq, tq, d = q.shape
    hkv = kq.shape[1]
    rep = hq // hkv
    dtype = q.dtype
    scale = 1.0 / _math.sqrt(d)

    qg = q.reshape(b, hkv, rep, tq, d)
    s = jnp.einsum(
        "bgrqd,bgtd->bgrqt", _mm_cast(qg, dtype), _mm_cast(kq, dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s * ks[:, :, None, None, :]
    s = s + bias[:, None, None, :, :].astype(jnp.float32)
    s_self = jnp.einsum(
        "bgrqd,bgd->bgrq", _mm_cast(qg, jnp.float32), k_self.astype(jnp.float32),
    )[..., None] * scale                                  # [B,g,r,1,1]
    s = jnp.concatenate([s, s_self], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    p_cache, p_self = p[..., :-1], p[..., -1:]
    p_cache = p_cache * vs[:, :, None, None, :]
    out = jnp.einsum(
        "bgrqt,bgtd->bgrqd", _mm_cast(p_cache.astype(dtype), dtype), _mm_cast(vq, dtype),
        preferred_element_type=jnp.float32,
    )
    out = out + p_self * v_self.astype(jnp.float32)[:, :, None, None, :]
    return out.reshape(b, hq, tq, d).astype(dtype)


def attention_int8(
    q: jax.Array,                  # [B, Hq, Tq, D] (bf16/f32, post-RoPE)
    kq: jax.Array,                 # [B, Hkv, T, D] int8
    ks: jax.Array,                 # [B, Hkv, T] f32 per-vector scales
    vq: jax.Array,                 # [B, Hkv, T, D] int8
    vs: jax.Array,                 # [B, Hkv, T] f32
    bias: jax.Array,               # [B, Tq, T] or [B, 1, T] additive f32
) -> jax.Array:
    """GQA attention CONSUMING the int8 KV cache directly.

    Per-vector scales fold exactly into the matmuls instead of materializing a
    dequantized [B, H, T, D] cache copy every step (round-1 weak spot:
    serving/lm.py dequantize_kv per layer per token):
      scores[t] = (q . k_int8[t]) * k_scale[t]
      out       = sum_t (p[t] * v_scale[t]) * v_int8[t]
    """
    import math as _math

    b, hq, tq, d = q.shape
    hkv = kq.shape[1]
    rep = hq // hkv
    dtype = q.dtype
    scale = 1.0 / _math.sqrt(d)

    qg = q.reshape(b, hkv, rep, tq, d)
    s = jnp.einsum(
        "bgrqd,bgtd->bgrqt", _mm_cast(qg, dtype), _mm_cast(kq, dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s * ks[:, :, None, None, :]
    s = s + bias[:, None, None, :, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    p = p * vs[:, :, None, None, :]
    out = jnp.einsum(
        "bgrqt,bgtd->bgrqd", _mm_cast(p.astype(dtype), dtype), _mm_cast(vq, dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, hq, tq, d).astype(dtype)


def _layers_stacked(params) -> bool:
    return not isinstance(params["layers"], list)


def _use_stacked_weights(params) -> bool:
    """Stacked quantized weights + pallas backend -> stream-by-index path
    (see ops.qlinear.split_stacked_weights)."""
    from acestep_tpu.ops.qlinear import use_stacked_weights

    return use_stacked_weights(params["layers"])


def _pallas_decode_attn(t_max: int, nh: int, nkv: int, hd: int):
    """Return the pallas decode-attention kernel entry when explicitly
    requested, else None (ACESTEP_TPU_DECODE_ATTN = auto | pallas | xla).

    ``auto`` resolves to the XLA path: on a v5e chip the pallas kernel
    measured SLOWER than the fused XLA int8 path at real decode shapes
    (0.6B q8_0, bucket 3712: b=1 2.31 vs 2.15 ms/step, b=8 4.99 vs 4.37) —
    per-(layer, T-block) grid overhead outweighs the skip-invalid-block
    bandwidth savings when each block is only ~130 KB.  The kernel stays
    available under ``pallas`` for future tuning (off-TPU it runs in
    interpret mode for the CPU equivalence tests)."""
    import os as _os

    if _os.environ.get("ACESTEP_TPU_DECODE_ATTN", "auto") != "pallas":
        return None
    if hd % 128 != 0 or nkv == 0 or nh % nkv != 0 or t_max % 128 != 0:
        return None
    if kvc.kv_dtype_name() != "int8":       # kernel streams int8 KV chunks
        return None
    on_tpu = jax.default_backend() in ("tpu", "axon")
    from acestep_tpu.ops.pallas.decode_attn import decode_attention_int8_stacked

    return functools.partial(decode_attention_int8_stacked,
                             interpret=not on_tpu)


def _pallas_decode_attn_fused(t_max: int, nh: int, nkv: int, hd: int, eps: float):
    """Fused-prologue decode attention (q/k norm + rope + KV quantize +
    attention in ONE kernel per layer) when ACESTEP_TPU_DECODE_ATTN=fused.

    The round-3 A/B matrix showed b=1 decode is latency-bound on the per-step
    serial chain of small XLA fusions (docs/BENCHMARK.md); this collapses ~12
    of them per layer into the attention kernel."""
    import os as _os

    if _os.environ.get("ACESTEP_TPU_DECODE_ATTN", "auto") != "fused":
        return None
    if hd % 128 != 0 or nkv == 0 or nh % nkv != 0 or t_max % 128 != 0:
        return None
    if kvc.kv_dtype_name() != "int8":       # kernel streams int8 KV chunks
        return None
    on_tpu = jax.default_backend() in ("tpu", "axon")
    from acestep_tpu.ops.pallas.decode_attn import decode_attention_fused_stacked

    return functools.partial(decode_attention_fused_stacked,
                             eps=eps, interpret=not on_tpu)


def _qkv_proj(p, xn, b: int, t: int, nh: int, nkv: int, hd: int):
    """q/k/v projections, through the serving-fused qkv weight when present
    (one weight stream + one kernel launch instead of three)."""
    if "qkv_proj" in p:
        qkv = linear(xn, p["qkv_proj"]["kernel"])
        q = qkv[..., : nh * hd]
        k = qkv[..., nh * hd: (nh + nkv) * hd]
        v = qkv[..., (nh + nkv) * hd:]
    else:
        q = linear(xn, p["q_proj"]["kernel"])
        k = linear(xn, p["k_proj"]["kernel"])
        v = linear(xn, p["v_proj"]["kernel"])
    return (q.reshape(b, t, nh, hd), k.reshape(b, t, nkv, hd),
            v.reshape(b, t, nkv, hd))


from acestep_tpu.ops.qlinear import concat_weights_n as _concat_kernels


def fuse_serving_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fuse q||k||v and gate||up into single weights for the decode scan.

    The round-2 decode profile is launch/glue-bound, not bandwidth-bound: 7
    quantized matmul kernels per layer x 28 layers dominates wall time at
    batch-1.  Fusing drops that to 4 kernels/layer with identical numerics.
    Stacked-layer params only; no-op otherwise."""
    layers = params.get("layers")
    if layers is None or isinstance(layers, list) or "qkv_proj" in layers:
        return params
    new_layers = dict(layers)
    new_layers["qkv_proj"] = {"kernel": _concat_kernels(
        [layers["q_proj"]["kernel"], layers["k_proj"]["kernel"],
         layers["v_proj"]["kernel"]])}
    new_layers["gateup_proj"] = {"kernel": _concat_kernels(
        [layers["gate_proj"]["kernel"], layers["up_proj"]["kernel"]])}
    for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        del new_layers[k]
    out = dict(params)
    out["layers"] = new_layers
    from acestep_tpu.ops.qlinear import precast_quant_scales

    return precast_quant_scales(out)


def prefill(
    params: Dict[str, Any],
    cfg: QwenConfig,
    token_ids: jax.Array,          # [B, T] right-padded
    lengths: jax.Array,            # [B]
    cache: KVCache,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, KVCache]:
    """Full causal forward over the prompt; fills the cache; returns logits at the
    last valid position of each sequence [B, vocab].

    Stacked layer params run as ONE lax.scan over the layer axis (a single
    compiled layer body — 28x smaller compile units than the unrolled loop).

    ``axis_name`` set => running per-shard inside a shard_map: ``cfg`` is the
    LOCAL config (heads / tp), o_proj/down_proj outputs are psum'd, and the
    sharded lm_head is re-assembled by all_gather (parallel/lm_tp.py)."""
    b, t = token_ids.shape
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    x = params["embed_tokens"][token_ids]

    positions = jnp.arange(t)
    cos, sin = rope_cos_sin(positions, hd, base=cfg.rope_theta)
    valid = (positions[None, :] < lengths[:, None]).astype(jnp.int32)
    mask = make_attention_mask(t, t, kv_valid=valid, causal=True)

    def layer_fn(x, p):
        """Returns (x_out, (kq, ks, vq, vs)) for this layer."""
        xn = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv_proj(p, xn, b, t, nh, nkv, hd)
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)
        kq, ks = kvc.quantize_kv(k)
        vq, vs = kvc.quantize_kv(v)
        attn = attention(q, k, v, mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        x = x + _row_parallel(attn, p["o_proj"]["kernel"], axis_name)
        hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        x = x + qwen.mlp_block(p, hn, axis_name=axis_name)
        return x, (kq, ks, vq, vs)

    if _layers_stacked(params):
        x, (kq_all, ks_all, vq_all, vs_all) = jax.lax.scan(
            lambda c, p: layer_fn(c, p), x, params["layers"]
        )
    else:
        outs = []
        for p in params["layers"]:
            x, o = layer_fn(x, p)
            outs.append(o)
        kq_all, ks_all, vq_all, vs_all = (
            jnp.stack([o[i] for o in outs]) for i in range(4)
        )

    cache = KVCache(
        cache.k.at[:, :, :, :t, :].set(kq_all),
        cache.v.at[:, :, :, :t, :].set(vq_all),
        cache.k_scale.at[:, :, :, :t].set(ks_all),
        cache.v_scale.at[:, :, :, :t].set(vs_all),
        lengths,
    )
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    last = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]
    logits = qwen.lm_logits(params, cfg, last[:, None, :], axis_name=axis_name)[:, 0, :]
    return logits.astype(jnp.float32), cache


def decode_step(
    params: Dict[str, Any],
    cfg: QwenConfig,
    cache: KVCache,
    token_ids: jax.Array,          # [B] current input tokens
    head=None,                     # optional head weight [H, V'] (array/QuantTensor)
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, KVCache]:
    """One decode position at each sequence's current length -> logits [B, vocab].

    Attention consumes the int8 cache directly (scale folding, no dequantized
    copy).  Stacked params scan over layers with the FULL cache arrays in the
    scan carry and per-layer dynamic updates: inside the decode while-loop XLA
    aliases carry buffers in place, so each step writes only the new token's
    K/V vectors instead of re-staging the whole [L, B, H, T, D] cache as
    stacked scan outputs (the round-2 profile showed ~140 us/step of cache
    copies + ~60 us of per-layer restacking at 0.6B shapes).

    ``head`` overrides the final vocab projection (the codes phase passes a
    column-sliced quantized head; see ``_scan_decode``)."""
    b = token_ids.shape[0]
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    t_max = cache.max_len
    x = params["embed_tokens"][token_ids][:, None, :]     # [B, 1, H]
    cos, sin = _rope_at(cache.length, hd, cfg.rope_theta)

    pos_ids = jnp.arange(t_max)
    # new token sits AT position `length`; it may attend to [0, length]
    bias = jnp.where(
        pos_ids[None, :] <= cache.length[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)[:, None, :]                     # [B, 1, T_max]
    # strict version for the scan path: cache positions only (< length); the
    # current token contributes through the explicit self-term instead
    bias_strict = jnp.where(
        pos_ids[None, :] < cache.length[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)[:, None, :]
    bidx = jnp.arange(b)

    def layer_fn(x, p, kq_l, ks_l, vq_l, vs_l):
        """kq_l/vq_l: [B, Hkv, T, D] int8 slices (new token already written);
        returns (x, (kq_new, ks_new, vq_new, vs_new)) token vectors."""
        xn = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv_proj(p, xn, b, 1, nh, nkv, hd)
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos[:, None], sin[:, None])
        kq_new, ks_new = kvc.quantize_kv(k[:, :, 0, :])   # [B, Hkv, D], [B, Hkv]
        vq_new, vs_new = kvc.quantize_kv(v[:, :, 0, :])
        kq_l = kq_l.at[bidx, :, cache.length, :].set(kq_new)
        vq_l = vq_l.at[bidx, :, cache.length, :].set(vq_new)
        ks_l = ks_l.at[bidx, :, cache.length].set(ks_new)
        vs_l = vs_l.at[bidx, :, cache.length].set(vs_new)
        attn = attention_int8(q, kq_l, ks_l, vq_l, vs_l, bias)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, nh * hd)
        x = x + _row_parallel(attn, p["o_proj"]["kernel"], axis_name)
        hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        x = x + qwen.mlp_block(p, hn, axis_name=axis_name)
        return x, (kq_l, ks_l, vq_l, vs_l)

    # whole-model megakernel: DEFAULT on TPU backends (measured 1.243 vs
    # 1.815 ms/token b=1, 2.208 vs 2.834 b=8 same-day at 0.6B q8_0 —
    # docs/BENCHMARK.md round-4 megakernel study); "0" forces the layer scan,
    # "1" forces the kernel (tests drive it under interpret mode on CPU)
    mega_env = os.environ.get("ACESTEP_TPU_DECODE_MEGA", "auto")
    use_mega = (
        mega_env != "0"
        and (mega_env == "1" or jax.default_backend() in ("tpu", "axon"))
        and axis_name is None and _layers_stacked(params)
        and kvc.kv_dtype_name() == "int8"   # megakernel streams int8 KV
    )
    if use_mega:
        from acestep_tpu.ops.pallas.decode_mega import (
            decode_layers_mega, supported as _mega_supported)

        use_mega = _mega_supported(params["layers"], cfg, b, t_max)
    if use_mega:
        # whole-model megakernel: every layer in ONE pallas_call (weights
        # stream through an in-kernel DMA pipeline; docs/BENCHMARK.md round-4
        # megakernel study)
        x_res, k_new, ks_new, v_new, vs_new = decode_layers_mega(
            params["layers"], cfg, cache.k, cache.k_scale,
            cache.v, cache.v_scale, cache.length,
            x[:, 0, :], cos[:, 0, :], sin[:, 0, :],
        )
        x = x_res.astype(x.dtype)[:, None, :]
        kc, vc, ksc, vsc = cache.k, cache.v, cache.k_scale, cache.v_scale
        for i in range(b):
            pos = cache.length[i]
            kc = jax.lax.dynamic_update_slice(
                kc, k_new[:, i:i + 1, :, None, :], (0, i, 0, pos, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, v_new[:, i:i + 1, :, None, :], (0, i, 0, pos, 0))
            ksc = jax.lax.dynamic_update_slice(
                ksc, ks_new[:, i:i + 1, :, None], (0, i, 0, pos))
            vsc = jax.lax.dynamic_update_slice(
                vsc, vs_new[:, i:i + 1, :, None], (0, i, 0, pos))
        cache = KVCache(kc, vc, ksc, vsc, cache.length)
    elif _layers_stacked(params):
        # READ-ONLY layer scan over per-layer cache slices (scan-xs slicing
        # fuses into the attention reads); the current token enters through the
        # explicit self-term, and the cache write happens ONCE per step below
        # as an aliasable dynamic-update-slice (per-layer scatters inside the
        # scan forced full-cache copies: ~500 us/step at 0.6B shapes).
        # big quantized kernels leave the scan xs (StackedWeight handles keyed
        # by the traced layer index stream tiles straight from the stacked HBM
        # buffers — no per-layer weight-slice copy per step)
        from acestep_tpu.ops.qlinear import (
            rebuild_layer_params as _rebuild_layer_params,
            split_stacked_weights as _split_sw,
        )

        use_sw = _use_stacked_weights(params)
        if use_sw:
            layers_small, big_weights = _split_sw(params["layers"])
        else:
            layers_small, big_weights = params["layers"], []
        n_layers_s = cache.k.shape[0]
        li_range = jnp.arange(n_layers_s, dtype=jnp.int32)
        pattn = _pallas_decode_attn(t_max, nh, nkv, hd)
        pattn_fused = _pallas_decode_attn_fused(t_max, nh, nkv, hd,
                                                cfg.rms_norm_eps)

        def scan_body(x, xs):
            if pattn is not None or pattn_fused is not None:
                li, p_small = xs
                kq_l = ks_l = vq_l = vs_l = None
            else:
                li, p_small, kq_l, ks_l, vq_l, vs_l = xs
            p = _rebuild_layer_params(p_small, big_weights, li) if use_sw else p_small
            xn = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
            q, k, v = _qkv_proj(p, xn, b, 1, nh, nkv, hd)
            if pattn_fused is not None:
                # norm + rope + quantize + attention in one kernel per layer
                out, kq_new, ks_new, vq_new, vs_new = pattn_fused(
                    q[:, 0], k[:, 0], v[:, 0],
                    p["q_norm"], p["k_norm"], cos[:, 0], sin[:, 0],
                    cache.k, cache.k_scale, cache.v, cache.v_scale,
                    cache.length, li)
                attn = out.astype(x.dtype).reshape(b, 1, nh * hd)
                x = x + _row_parallel(attn, p["o_proj"]["kernel"], axis_name)
                hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
                x = x + qwen.mlp_block(p, hn, axis_name=axis_name)
                return x, (kq_new, ks_new, vq_new, vs_new)
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            q, k = apply_rope(q, k, cos[:, None], sin[:, None])
            k_self, v_self = k[:, :, 0, :], v[:, :, 0, :]
            kq_new, ks_new = kvc.quantize_kv(k_self)
            vq_new, vs_new = kvc.quantize_kv(v_self)
            if pattn is not None:
                # one kernel: streams layer li's K/V tiles from the stacked
                # cache (no per-layer slice copy), masks by length in-kernel,
                # reads only blocks that hold valid positions
                attn = pattn(q[:, :, 0, :], cache.k, cache.k_scale,
                             cache.v, cache.v_scale, cache.length, li,
                             k_self, v_self)
                attn = attn.astype(q.dtype).reshape(b, 1, nh * hd)
            else:
                attn = attention_int8_self(
                    q, kq_l, ks_l, vq_l, vs_l, bias_strict, k_self, v_self)
                attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, nh * hd)
            x = x + _row_parallel(attn, p["o_proj"]["kernel"], axis_name)
            hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
            x = x + qwen.mlp_block(p, hn, axis_name=axis_name)
            return x, (kq_new, ks_new, vq_new, vs_new)

        import os as _os

        if _os.environ.get("ACESTEP_TPU_DECODE_UNROLL", "0") == "1":
            # Unrolled layer loop with STATIC leading-dim slices: the slices
            # are contiguous views (no dynamic-slice materialization — the
            # scan form copies each layer's ~2 MB of K/V per step), at the
            # cost of a ~L-times larger compile unit for the decode body.
            outs = []
            for li in range(n_layers_s):
                p_l = jax.tree_util.tree_map(lambda a: a[li], layers_small)
                xs_l = ((jnp.int32(li), p_l)
                        if pattn is not None or pattn_fused is not None else (
                            jnp.int32(li), p_l, cache.k[li], cache.k_scale[li],
                            cache.v[li], cache.v_scale[li]))
                x, out = scan_body(x, xs_l)
                outs.append(out)
            k_new, ks_new, v_new, vs_new = (
                jnp.stack([o[i] for o in outs]) for i in range(4))
        else:
            xs = ((li_range, layers_small)
                  if pattn is not None or pattn_fused is not None else (
                      li_range, layers_small, cache.k, cache.k_scale,
                      cache.v, cache.v_scale))
            x, (k_new, ks_new, v_new, vs_new) = jax.lax.scan(
                scan_body, x, xs,
                unroll=int(_os.environ.get("ACESTEP_TPU_DECODE_SCAN_UNROLL", "1")),
            )
        # k_new: [L, B, Hkv, D] -> write at each sequence's position
        kc, vc, ksc, vsc = cache.k, cache.v, cache.k_scale, cache.v_scale
        for i in range(b):
            pos = cache.length[i]
            kc = jax.lax.dynamic_update_slice(
                kc, k_new[:, i:i + 1, :, None, :], (0, i, 0, pos, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, v_new[:, i:i + 1, :, None, :], (0, i, 0, pos, 0))
            ksc = jax.lax.dynamic_update_slice(
                ksc, ks_new[:, i:i + 1, :, None], (0, i, 0, pos))
            vsc = jax.lax.dynamic_update_slice(
                vsc, vs_new[:, i:i + 1, :, None], (0, i, 0, pos))
        cache = KVCache(kc, vc, ksc, vsc, cache.length)
    else:
        ks_list, vs_list, kq_list, vq_list = [], [], [], []
        for li, p in enumerate(params["layers"]):
            x, (kq_l, ks_l, vq_l, vs_l) = layer_fn(
                x, p, cache.k[li], cache.k_scale[li], cache.v[li], cache.v_scale[li]
            )
            kq_list.append(kq_l)
            ks_list.append(ks_l)
            vq_list.append(vq_l)
            vs_list.append(vs_l)
        cache = KVCache(
            jnp.stack(kq_list), jnp.stack(vq_list),
            jnp.stack(ks_list), jnp.stack(vs_list), cache.length,
        )

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if head is not None:
        # under TP the override head is column-sharded (reduced codes head):
        # gather the contiguous column blocks back into global order
        logits = _gather_cols(linear(x, head), axis_name)[:, 0, :]
    else:
        logits = qwen.lm_logits(params, cfg, x, axis_name=axis_name)[:, 0, :]
    return logits.astype(jnp.float32), cache


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def _top_p_threshold(probs: jax.Array, top_p: float, iters: int = 24) -> jax.Array:
    """Largest probability threshold t with mass{p >= t} >= top_p, per row.

    Bisection over t — `iters` masked sums over the vocab instead of a full
    151936-wide sort: a vocab sort on TPU costs milliseconds and sat inside
    the decode scan EVERY token (the round-2 LM-decode hot spot); the masked
    sums are bandwidth-trivial.  Keep-set semantics match the sorted-nucleus
    formulation up to ties at the cutoff (tie-inclusive, as before)."""
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    lo = jnp.zeros_like(pmax)                     # mass(0) = 1 >= top_p
    hi = pmax * (1.0 + 1e-6) + 1e-12              # mass(hi) = 0 < top_p

    # statically unrolled: a fori_loop of tiny masked sums pays per-iteration
    # loop overhead inside the decode scan; straight-line code lets XLA fuse
    # and pipeline the 24 reductions
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1, keepdims=True)
        ok = mass >= top_p
        lo, hi = jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)
    return lo


def sample_logits(
    key: jax.Array,
    logits: jax.Array,              # [B, V] f32
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1][:, None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        probs = jax.nn.softmax(logits, axis=-1)
        thr = _top_p_threshold(probs, top_p)
        logits = jnp.where(probs < thr, NEG_INF, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# generation (single dispatch, lax.scan)
# ---------------------------------------------------------------------------

def ensure_quantized_head(params: Dict[str, Any], fmt: Optional[str] = None) -> Dict[str, Any]:
    """Give tied-embedding LMs a QUANTIZED ``lm_head`` copy for serving.

    With tied embeddings ``lm_logits`` streams the full bf16 embedding matrix
    (0.3 GB at 0.6B) through HBM on EVERY decode step — the round-2 profile
    showed this head projection costs as much as all 28 layers combined, and
    it is why bf16 and q8_0 decode timed identically.  GGML quantizes
    ``output.weight`` like any other matmul weight (reference export keeps a
    quantized output tensor even for tied models), so a quantized head copy
    matches reference numerics at reference quality.

    No-op unless the layer weights are quantized (keeps tiny f32 test models
    bit-identical).  Format: ``ACESTEP_TPU_LM_HEAD_QUANT`` (default q8_0)."""
    import os

    from acestep_tpu.quant import QuantTensor as _QT
    from acestep_tpu.quant.jax_quant import quantize_jax

    if params.get("lm_head") is not None:
        return params
    layer_quantized = any(
        isinstance(leaf, _QT)
        for leaf in jax.tree_util.tree_leaves(
            params.get("layers"), is_leaf=lambda x: isinstance(x, _QT))
    )
    if not layer_quantized:
        return params
    fmt = fmt or os.environ.get("ACESTEP_TPU_LM_HEAD_QUANT", "q8_0")
    if fmt in ("none", "0", ""):
        return params
    emb = params["embed_tokens"]
    if emb.shape[1] % 256:        # block formats need K % 256 == 0
        return params
    # pad the vocab axis to a lane-friendly multiple (Qwen3's 151669 is odd —
    # unpadded it forces the Pallas qmm into its dequant fallback, which costs
    # MORE than the tied bf16 dot).  2048 lets the decode-shaped kernel take
    # bn=2048 tiles (~4x fewer grid steps over the head, the single biggest
    # decode matmul).  lm_logits slices back to vocab_size.
    pad = (-emb.shape[0]) % 2048

    def _build(e):
        w = e.astype(jnp.float32).T
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
        return quantize_jax(w, fmt)

    head = jax.jit(_build)(emb)
    out = dict(params)
    out["lm_head"] = {"kernel": head}
    return out


def _slice_head_cols(w, lo: int, hi: int, eos: Optional[int], pad_multiple: int = 2048):
    """Column-slice a head weight [K, V] to ``[lo, hi)`` (+ the EOS column),
    zero-padded to a lane multiple.  All quant formats pack along K, so every
    field slices cleanly along N.  Returns (reduced_weight, n_range, n_valid).
    """
    from acestep_tpu.quant import QuantTensor as _QT

    n_range = hi - lo
    n_valid = n_range + (1 if eos is not None else 0)
    pad = (-n_valid) % pad_multiple

    def cut(a):
        if a is None:
            return None
        parts = [a[:, lo:hi]]
        if eos is not None:
            parts.append(a[:, eos:eos + 1])
        if pad:
            parts.append(jnp.zeros((a.shape[0], pad), a.dtype))
        return jnp.concatenate(parts, axis=1)

    if isinstance(w, _QT):
        red = dataclasses.replace(
            w, shape=(w.shape[0], n_valid + pad),
            data=cut(w.data), data_hi=cut(w.data_hi), scales=cut(w.scales),
            sub_scales=cut(w.sub_scales), sub_mins=cut(w.sub_mins),
            super_scales=cut(w.super_scales), super_mins=cut(w.super_mins),
        )
    else:
        red = cut(w)
    return red, n_range, n_valid


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.85
    top_k: int = 0
    top_p: float = 0.95
    max_new_tokens: int = 256
    stop_tokens: Tuple[int, ...] = ()
    # constrained codes phase
    allowed_range: Optional[Tuple[int, int]] = None   # [lo, hi) inclusive-exclusive
    eos_token: Optional[int] = None
    min_tokens: int = 0               # EOS blocked before this many new tokens
    forced_eos_at: Optional[int] = None  # force EOS exactly at this count
    cfg_scale: float = 1.0            # >1 enables paired-uncond guidance


def _scan_decode(
    params, cfg, sp: SamplingParams, b: int,
    cache, logits, key,
    ucache=None, ulogits=None,
    min_tokens_arr=None, forced_eos_arr=None,
    axis_name=None, head_red_override=None,
):
    """Shared decode scan: sample from ``logits`` then run max_new_tokens-1
    cached decode steps.  ``min_tokens_arr`` / ``forced_eos_arr`` are TRACED
    per-item [B] overrides of the static sp.min_tokens / sp.forced_eos_at —
    mixed durations share one compiled scan (code-count bucketing).

    ``axis_name`` => per-shard execution inside a shard_map (parallel/lm_tp.py);
    the reduced codes head cannot be sliced from the LOCAL head shard, so the
    TP caller pre-slices the GLOBAL head and passes the shard via
    ``head_red_override``."""
    import os as _os

    use_cfg = sp.cfg_scale != 1.0 and ucache is not None
    if use_cfg:
        logits = ulogits + sp.cfg_scale * (logits - ulogits)

    # Codes-phase reduced head: slice the vocab projection to the allowed code
    # range (+EOS) — 64k of 152k columns — so each decode step streams ~2.4x
    # fewer head bytes and samples over the reduced space.  Distribution over
    # allowed tokens is unchanged (disallowed tokens carried ~0 mass).
    head_red = None
    n_range = n_valid = 0
    if head_red_override is not None:
        head_red = head_red_override
        n_range = sp.allowed_range[1] - sp.allowed_range[0]
        n_valid = n_range + (1 if sp.eos_token is not None else 0)
    elif (
        sp.allowed_range is not None
        and axis_name is None
        and _os.environ.get("ACESTEP_TPU_REDUCED_CODES_HEAD", "1") != "0"
    ):
        w_full = (params.get("lm_head") or {}).get("kernel")
        if w_full is None:
            w_full = params["embed_tokens"].T          # tied
        head_red, n_range, n_valid = _slice_head_cols(
            w_full, sp.allowed_range[0], sp.allowed_range[1], sp.eos_token)

    vocab = logits.shape[-1]
    vocab_ids = jnp.arange(vocab)
    range_mask = None
    if sp.allowed_range is not None:
        lo, hi = sp.allowed_range
        range_mask = (vocab_ids >= lo) & (vocab_ids < hi)
        if sp.eos_token is not None:
            range_mask = range_mask | (vocab_ids == sp.eos_token)
    stop_set = jnp.asarray(sp.stop_tokens, jnp.int32) if sp.stop_tokens else None

    def constrain(logits, step):
        if range_mask is not None:
            logits = jnp.where(range_mask[None, :], logits, NEG_INF)
        if sp.eos_token is not None:
            is_eos = vocab_ids[None, :] == sp.eos_token
            if min_tokens_arr is not None:
                logits = jnp.where(
                    (step < min_tokens_arr[:, None]) & is_eos, NEG_INF, logits
                )
            elif sp.min_tokens > 0:
                logits = jnp.where((step < sp.min_tokens) & is_eos, NEG_INF, logits)
            if forced_eos_arr is not None:
                logits = jnp.where(
                    (step >= forced_eos_arr[:, None]) & ~is_eos, NEG_INF, logits
                )
            elif sp.forced_eos_at is not None:
                force = step >= sp.forced_eos_at
                logits = jnp.where(force & ~is_eos, NEG_INF, logits)
        return logits

    def is_stop(tok):
        s = jnp.zeros_like(tok, dtype=bool)
        if stop_set is not None:
            s = s | jnp.any(tok[:, None] == stop_set[None, :], axis=-1)
        if sp.eos_token is not None:
            s = s | (tok == sp.eos_token)
        return s

    def constrain_red(lr, step):
        """Reduced-space analog of constrain(): col j <-> token lo+j,
        col n_range <-> EOS, cols >= n_valid are padding."""
        col = jnp.arange(lr.shape[-1])[None, :]
        lr = jnp.where(col >= n_valid, NEG_INF, lr)
        if sp.eos_token is not None:
            is_eos = col == n_range
            if min_tokens_arr is not None:
                lr = jnp.where((step < min_tokens_arr[:, None]) & is_eos, NEG_INF, lr)
            elif sp.min_tokens > 0:
                lr = jnp.where((step < sp.min_tokens) & is_eos, NEG_INF, lr)
            if forced_eos_arr is not None:
                lr = jnp.where((step >= forced_eos_arr[:, None]) & ~is_eos, NEG_INF, lr)
            elif sp.forced_eos_at is not None:
                lr = jnp.where((step >= sp.forced_eos_at) & ~is_eos, NEG_INF, lr)
        return lr

    def map_red(tok_red):
        full = sp.allowed_range[0] + tok_red
        if sp.eos_token is not None:
            full = jnp.where(tok_red == n_range, sp.eos_token, full)
        return full.astype(jnp.int32)

    k0, kloop = jax.random.split(key)
    first_logits = constrain(logits, 0)
    first_tok = sample_logits(k0, first_logits, sp.temperature, sp.top_k, sp.top_p)
    finished0 = is_stop(first_tok)

    # scan carry: (cache, ucache, cur_tok, finished, step)
    def scan_body(carry, k):
        cache, ucache, cur, finished, step = carry
        logits, cache2 = decode_step(params, cfg, cache, cur, head=head_red,
                                     axis_name=axis_name)
        cache2 = kvc.advance(cache2, jnp.ones((b,), bool))
        if use_cfg:
            ulog, ucache2 = decode_step(params, cfg, ucache, cur, head=head_red,
                                        axis_name=axis_name)
            ucache2 = kvc.advance(ucache2, jnp.ones((b,), bool))
            logits = ulog + sp.cfg_scale * (logits - ulog)
        else:
            ucache2 = ucache
        if head_red is not None:
            logits = constrain_red(logits, step + 1)
            nxt = map_red(sample_logits(k, logits, sp.temperature, sp.top_k, sp.top_p))
        else:
            logits = constrain(logits, step + 1)
            nxt = sample_logits(k, logits, sp.temperature, sp.top_k, sp.top_p)
        nxt = jnp.where(finished, cur, nxt)     # frozen once finished
        new_finished = finished | is_stop(nxt)
        out_tok = jnp.where(finished, -1, nxt)
        return (cache2, ucache2, nxt, new_finished, step + 1), out_tok

    keys = jax.random.split(kloop, sp.max_new_tokens - 1)
    init = (cache, ucache, first_tok, finished0, jnp.int32(0))
    (_, _, _, finished, _), rest = jax.lax.scan(scan_body, init, keys)

    tokens = jnp.concatenate([first_tok[:, None], rest.T], axis=1)  # [B, max_new]
    # n_generated = index of first stop + 1, or max_new
    stops = jnp.concatenate(
        [is_stop(first_tok)[:, None],
         (rest.T == -1) | is_stop(rest.T)], axis=1
    )
    any_stop = jnp.any(stops, axis=1)
    first_stop = jnp.argmax(stops, axis=1)
    n_gen = jnp.where(any_stop, first_stop + 1, sp.max_new_tokens)
    return tokens, n_gen.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "sp", "axis_name"))
def generate(
    params: Dict[str, Any],
    cfg: QwenConfig,
    prompt_ids: jax.Array,            # [B, T] right-padded int32
    prompt_lengths: jax.Array,        # [B]
    key: jax.Array,
    sp: SamplingParams,
    uncond_prompt_ids: Optional[jax.Array] = None,     # [B, T2] for CFG
    uncond_prompt_lengths: Optional[jax.Array] = None,
    min_tokens_arr: Optional[jax.Array] = None,        # [B] traced override
    forced_eos_arr: Optional[jax.Array] = None,        # [B] traced override
    axis_name: Optional[str] = None,
    head_red_override=None,
) -> Tuple[jax.Array, jax.Array]:
    """Generate up to max_new_tokens for each sequence; returns
    (tokens [B, max_new], n_generated [B]).  One device dispatch."""
    b, t_prompt = prompt_ids.shape
    max_len = kvc.round_len(t_prompt + sp.max_new_tokens + 1)
    n_layers = cfg.num_hidden_layers
    use_cfg = sp.cfg_scale != 1.0 and uncond_prompt_ids is not None

    cache = kvc.init_cache(n_layers, b, cfg.num_key_value_heads, max_len, cfg.head_dim)
    logits, cache = prefill(params, cfg, prompt_ids, prompt_lengths, cache, axis_name)

    ucache = ulogits = None
    if use_cfg:
        u_max = kvc.round_len(uncond_prompt_ids.shape[1] + sp.max_new_tokens + 1)
        ucache = kvc.init_cache(n_layers, b, cfg.num_key_value_heads, u_max, cfg.head_dim)
        ulogits, ucache = prefill(params, cfg, uncond_prompt_ids,
                                  uncond_prompt_lengths, ucache, axis_name)

    return _scan_decode(
        params, cfg, sp, b, cache, logits, key, ucache, ulogits,
        min_tokens_arr, forced_eos_arr, axis_name, head_red_override,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "sp", "axis_name"))
def decode_from_state(
    params: Dict[str, Any],
    cfg: QwenConfig,
    cache: KVCache,                   # post-prefill (lengths set)
    logits: jax.Array,                # [B, vocab] logits at the last position
    key: jax.Array,
    sp: SamplingParams,
    ucache: Optional[KVCache] = None,
    ulogits: Optional[jax.Array] = None,
    min_tokens_arr: Optional[jax.Array] = None,
    forced_eos_arr: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    head_red_override=None,
) -> Tuple[jax.Array, jax.Array]:
    """Decode loop starting from an existing prefilled cache (the prefix-cache
    path: the shared system+user prompt prefill is reused across the two-phase
    flow — nano-vllm block_manager.py:44-50 prefix reuse, dense-cache form)."""
    b = logits.shape[0]
    return _scan_decode(
        params, cfg, sp, b, cache, logits, key, ucache, ulogits,
        min_tokens_arr, forced_eos_arr, axis_name, head_red_override,
    )


# ---------------------------------------------------------------------------
# host-stepped constrained generation (metadata FSM CoT phase)
#
# The metadata FSM (acestep_tpu.constrained) tracks string state that cannot
# live on-device; like the reference's logits-processor hook it masks logits on
# the host between jitted decode steps.  CoT is short (~100 tokens) so the
# per-step host round-trip is acceptable; the codes phase stays on-device.
# ---------------------------------------------------------------------------

_decode_step_jit = jax.jit(decode_step, static_argnames=("cfg", "axis_name"))
_prefill_jit = jax.jit(prefill, static_argnames=("cfg", "axis_name"))


def generate_with_fsm(
    params: Dict[str, Any],
    cfg: QwenConfig,
    prompt_ids: Sequence[int],
    fsm,                                   # constrained.MetadataFSM
    vocab_strs: Sequence[str],             # token id -> string piece
    key: jax.Array,
    temperature: float = 0.7,
    max_new_tokens: int = 256,
    prefill_fn=None,                       # (ids, lengths, cache) -> (logits, cache)
    decode_fn=None,                        # (cache, tok) -> (logits, cache)
) -> Tuple[list, str]:
    """Generate one sequence under the FSM; returns (token_ids, text).

    ``prefill_fn`` / ``decode_fn`` override the single-device jits (the TP
    path injects LMTPContext.prefill / .decode_step so the FSM runs against
    the sharded model)."""
    import numpy as np

    if prefill_fn is None:
        prefill_fn = lambda i, l, c: _prefill_jit(params, cfg, i, l, c)  # noqa: E731
    if decode_fn is None:
        decode_fn = lambda c, t: _decode_step_jit(params, cfg, c, t)  # noqa: E731

    ids = jnp.asarray([list(prompt_ids)], jnp.int32)
    lengths = jnp.asarray([len(prompt_ids)], jnp.int32)
    max_len = kvc.round_len(len(prompt_ids) + max_new_tokens + 1)
    cache = kvc.init_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                           max_len, cfg.head_dim)
    logits, cache = prefill_fn(ids, lengths, cache)

    out_ids: list = []
    out_text: list = []
    vocab = len(vocab_strs)
    for step in range(max_new_tokens):
        if fsm.done:
            break
        mask = fsm.allowed(vocab_strs)
        if not mask.any():
            break
        lg = np.asarray(logits[0])[:vocab]
        lg = np.where(mask, lg, -1e30)
        if temperature <= 0:
            tok = int(lg.argmax())
        else:
            key, sub = jax.random.split(key)
            tok = int(jax.random.categorical(sub, jnp.asarray(lg) / temperature))
        piece = vocab_strs[tok]
        out_ids.append(tok)
        out_text.append(piece)
        fsm.step(piece)
        logits, cache = decode_fn(cache, jnp.asarray([tok], jnp.int32))
        cache = kvc.advance(cache, jnp.ones((1,), bool))
    return out_ids, "".join(out_text)


# ---------------------------------------------------------------------------
# on-device DFA-constrained generation (VERDICT r4 item 3): the compiled FSM
# (constrained.compile_dfa) uploads per-state packed mask rows + a sparse
# transition table; the whole CoT phase then runs as ONE jitted while_loop —
# no per-token host round-trip (through the dev tunnel each costs ~30 ms,
# which made a ~60-token metadata block ~2 s of pure dispatch).  The caption
# span's char budget is a device register fed by cap_len[V].
# Reference analog: constrained_logits_processor.py:548-648 static per-state
# mask tables (applied host-side there; gathered in-scan here).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "greedy"))
def _dfa_decode(
    params: Dict[str, Any],
    cfg: QwenConfig,
    prompt_ids: jax.Array,            # [1, T] int32
    prompt_lengths: jax.Array,        # [1]
    masks_packed: jax.Array,          # [S, W] uint32
    default_next: jax.Array,          # [S]
    exc_tok: jax.Array,               # [S, E]
    exc_next: jax.Array,              # [S, E]
    exc_cap: jax.Array,               # [S, E] caption chars carried
    is_caption: jax.Array,            # [S] bool
    cap_len: jax.Array,               # [V] int32
    has_nl: jax.Array,                # [V] bool
    limits: jax.Array,                # [3] int32: max_cap_chars, start, done
    key: jax.Array,
    temperature: jax.Array,           # scalar f32 (ignored when greedy)
    max_new_tokens: int,
    greedy: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Constrained decode of one sequence under the compiled DFA; returns
    (tokens [max_new_tokens] int32 padded -1, n_generated [])."""
    t_prompt = prompt_ids.shape[1]
    max_len = kvc.round_len(t_prompt + max_new_tokens + 1)
    cache = kvc.init_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                           max_len, cfg.head_dim)
    logits, cache = prefill(params, cfg, prompt_ids, prompt_lengths, cache)

    v = cap_len.shape[0]
    vocab_model = logits.shape[-1]
    vids = jnp.arange(v, dtype=jnp.int32)
    widx, wshift = vids // 32, (vids % 32).astype(jnp.uint32)
    max_cap = limits[0]

    def cond(carry):
        _, _, state, _, _, n, _, done = carry
        return (~done) & (n < max_new_tokens)

    def body(carry):
        cache, logits, state, used, toks, n, k, done = carry
        row = masks_packed[state]                         # [W] dynamic gather
        allowed = ((row[widx] >> wshift) & jnp.uint32(1)).astype(bool)
        cap_ok = ((used + cap_len <= max_cap)
                  & (~has_nl | (used + cap_len > 0)))
        allowed = allowed & jnp.where(is_caption[state], cap_ok, True)
        # dead state (empty mask): stop without emitting, like the host
        # loop's `if not mask.any(): break`
        stuck = ~jnp.any(allowed)
        lg = jnp.full((vocab_model,), NEG_INF, logits.dtype)
        lg = lg.at[:v].set(jnp.where(allowed, logits[0, :v], NEG_INF))
        if greedy:
            tok = jnp.argmax(lg).astype(jnp.int32)
            k2 = k
        else:
            k2, sub = jax.random.split(k)
            tok = jax.random.categorical(
                sub, lg.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)
            ).astype(jnp.int32)
        hits = exc_tok[state] == tok
        hit = jnp.any(hits)
        j = jnp.argmax(hits)
        nxt = jnp.where(hit, exc_next[state][j], default_next[state])
        # caption char register: exceptions carry an explicit delta (tokens
        # that overshoot the "caption: " forced text land chars in the value);
        # the caption self-loop default carries the piece's pre-\n length
        delta = jnp.where(
            hit, exc_cap[state][j],
            jnp.where(is_caption[state], cap_len[tok], 0),
        )
        used = used + delta
        toks = toks.at[n].set(jnp.where(stuck, jnp.int32(-1), tok))
        logits2, cache2 = decode_step(params, cfg, cache, tok[None])
        cache2 = kvc.advance(cache2, jnp.ones((1,), bool))
        done = (nxt == limits[2]) | stuck
        n2 = n + jnp.where(stuck, 0, 1)
        return (cache2, logits2, nxt, used, toks, n2, k2, done)

    toks0 = jnp.full((max_new_tokens,), -1, jnp.int32)
    init = (cache, logits, limits[1], jnp.int32(0), toks0, jnp.int32(0), key,
            jnp.asarray(False))
    out = jax.lax.while_loop(cond, body, init)
    return out[4], out[5]


def generate_with_fsm_device(
    params: Dict[str, Any],
    cfg: QwenConfig,
    prompt_ids: Sequence[int],
    dfa,                                   # constrained.CompiledDFA
    vocab_strs: Sequence[str],
    key: jax.Array,
    temperature: float = 0.7,
    max_new_tokens: int = 256,
) -> Tuple[list, str]:
    """On-device analog of generate_with_fsm: one dispatch for the whole
    constrained CoT block.  Returns (token_ids, text)."""
    import numpy as np

    ids = jnp.asarray([list(prompt_ids)], jnp.int32)
    lengths = jnp.asarray([len(prompt_ids)], jnp.int32)
    dev = getattr(dfa, "_device_arrays", None)
    if dev is None:       # upload the tables once per compiled DFA
        dev = tuple(jnp.asarray(a) for a in (
            dfa.masks_packed, dfa.default_next, dfa.exc_tok, dfa.exc_next,
            dfa.exc_cap, dfa.is_caption, dfa.cap_len, dfa.has_nl,
        )) + (jnp.asarray(
            [dfa.max_caption_chars, dfa.start_state, dfa.done_state],
            jnp.int32),)
        dfa._device_arrays = dev
    toks, n = _dfa_decode(
        params, cfg, ids, lengths, *dev,
        key, jnp.float32(temperature), max_new_tokens,
        greedy=temperature <= 0,
    )
    toks, n = np.asarray(toks), int(n)
    out_ids = [int(t) for t in toks[:n]]
    return out_ids, "".join(vocab_strs[t] for t in out_ids)


# ---------------------------------------------------------------------------
# prefix caching (nano-vllm block_manager.py:44-50 xxhash prefix reuse, adapted
# to dense caches): identical prompt prefixes skip re-prefill.  The two-phase
# flow re-prefills the system+user prompt for the codes phase; with the cache
# the shared prefix is restored and only the CoT suffix is prefilled.
# ---------------------------------------------------------------------------

def extend_prefill(
    params: Dict[str, Any],
    cfg: QwenConfig,
    cache: KVCache,
    new_ids: jax.Array,            # [B, T2] tokens to append (right-padded)
    start: jax.Array,              # [B] current lengths (== cache.length)
    suffix_lengths: Optional[jax.Array] = None,   # [B] valid tokens in new_ids
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, KVCache]:
    """Prefill a suffix at positions [start, start+len); returns logits at the
    last VALID suffix position.  ``new_ids`` may be right-padded to a bucket
    (suffix_lengths < T2): pad positions scatter out-of-bounds and are dropped,
    so compile caches are keyed by the bucket, not the exact suffix length."""
    b, t2 = new_ids.shape
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    t_max = cache.max_len
    if suffix_lengths is None:
        suffix_lengths = jnp.full((b,), t2, jnp.int32)
    x = params["embed_tokens"][new_ids]

    offs = jnp.arange(t2)[None, :]
    pos = start[:, None] + offs                                # [B, T2]
    pad = offs >= suffix_lengths[:, None]                      # [B, T2] True=pad
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = pos.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)            # [B, T2, hd]

    # suffix token i attends to cache positions <= start + i
    kpos = jnp.arange(t_max)[None, None, :]
    qpos = pos[:, :, None]
    cache_bias = jnp.where(kpos <= qpos, 0.0, NEG_INF).astype(jnp.float32)  # [B, T2, T_max]

    new_len = start + suffix_lengths
    # pad positions scatter out of bounds -> dropped
    tpos_write = jnp.where(pad, t_max, pos)
    bidx = jnp.arange(b)[:, None]
    hidx = jnp.arange(nkv)[None, :, None]
    tw = tpos_write[:, None, :]

    def layer_fn(x, p, kq_l, ks_l, vq_l, vs_l):
        xn = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv_proj(p, xn, b, t2, nh, nkv, hd)
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q = q * jnp.cos(emb)[:, None] + _rotate_half_4d(q) * jnp.sin(emb)[:, None]
        k = k * jnp.cos(emb)[:, None] + _rotate_half_4d(k) * jnp.sin(emb)[:, None]

        # write suffix K/V at [start, start+len) via broadcasted scatter
        kq, ks = kvc.quantize_kv(k)
        vq, vs = kvc.quantize_kv(v)
        kq_l = kq_l.at[bidx[:, None, :], hidx, tw].set(kq, mode="drop")
        vq_l = vq_l.at[bidx[:, None, :], hidx, tw].set(vq, mode="drop")
        ks_l = ks_l.at[bidx[:, None, :], hidx, tw].set(ks, mode="drop")
        vs_l = vs_l.at[bidx[:, None, :], hidx, tw].set(vs, mode="drop")
        attn = attention_int8(q, kq_l, ks_l, vq_l, vs_l, cache_bias)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t2, nh * hd)
        x = x + _row_parallel(attn, p["o_proj"]["kernel"], axis_name)
        hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        x = x + qwen.mlp_block(p, hn, axis_name=axis_name)
        return x, (kq_l, ks_l, vq_l, vs_l)

    if _layers_stacked(params):
        def scan_body(x, xs):
            p, kq_l, ks_l, vq_l, vs_l = xs
            return layer_fn(x, p, kq_l, ks_l, vq_l, vs_l)

        x, (k_new, ks_new, v_new, vs_new) = jax.lax.scan(
            scan_body, x,
            (params["layers"], cache.k, cache.k_scale, cache.v, cache.v_scale),
        )
        cache = KVCache(k_new, v_new, ks_new, vs_new, new_len)
    else:
        kq_list, ks_list, vq_list, vs_list = [], [], [], []
        for li, p in enumerate(params["layers"]):
            x, (kq_l, ks_l, vq_l, vs_l) = layer_fn(
                x, p, cache.k[li], cache.k_scale[li], cache.v[li], cache.v_scale[li]
            )
            kq_list.append(kq_l)
            ks_list.append(ks_l)
            vq_list.append(vq_l)
            vs_list.append(vs_l)
        cache = KVCache(
            jnp.stack(kq_list), jnp.stack(vq_list),
            jnp.stack(ks_list), jnp.stack(vs_list), new_len,
        )
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    last = jnp.take_along_axis(
        x, (suffix_lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )
    logits = qwen.lm_logits(params, cfg, last, axis_name=axis_name)[:, 0, :]
    return logits.astype(jnp.float32), cache


extend_prefill_jit = jax.jit(extend_prefill, static_argnames=("cfg", "axis_name"))


def _rotate_half_4d(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class PrefixCache:
    """LRU cache of prefill KV states keyed by the exact prompt-token prefix."""

    def __init__(self, max_entries: int = 8):
        self.max_entries = max_entries
        self._store: "dict[tuple, tuple]" = {}
        self._order: list = []
        self.hits = 0
        self.misses = 0

    def lookup(self, ids: Sequence[int]):
        """Longest cached prefix of ids -> (prefix_len, cache, logits) or None."""
        best = None
        for key in self._store:
            n = len(key)
            if n <= len(ids) and tuple(ids[:n]) == key:
                if best is None or n > best:
                    best = n
        if best is None:
            self.misses += 1
            return None
        self.hits += 1
        self._order.remove(tuple(ids[:best]))
        self._order.append(tuple(ids[:best]))
        cache, logits = self._store[tuple(ids[:best])]
        return best, cache, logits

    def insert(self, ids: Sequence[int], cache: KVCache, logits: jax.Array):
        key = tuple(ids)
        if key in self._store:
            return
        self._store[key] = (cache, logits)
        self._order.append(key)
        while len(self._order) > self.max_entries:
            old = self._order.pop(0)
            del self._store[old]
