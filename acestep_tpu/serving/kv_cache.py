"""INT8/FP8 KV cache for the LM planner (BASELINE.json north star: INT8/FP8 KV).

Layout is TPU-friendly dense + length-bucketed (the reference's nano-vllm uses
256-token paged blocks on GPU, block_manager.py:36-136; TPU prefers static dense
buffers — bucketing replaces paging, prefix reuse comes later).

K/V are stored per (layer, batch, kv_head, position) as int8 (default) or
float8_e4m3fn (``ACESTEP_TPU_KV_DTYPE=fp8`` — pays on v5p/v6e whose MXUs take
fp8 operands natively) with a per-vector f32 scale: int8 q = round(x/s),
s = amax/127; fp8 q = cast(x/s), s = amax/448 (e4m3fn full scale).  Both
dequantize as q*s lazily in attention; the scale-folded attention math in
serving/lm.py is dtype-agnostic (cache values cast exactly into bf16 either
way).  The pallas decode kernels stream int8 specifically, so fp8 routes
decode through the XLA scan path (serving/lm.py gates).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_FP8_MAX = 448.0                     # float8_e4m3fn largest finite value


def kv_dtype_name() -> str:
    """'int8' (default) or 'fp8' from ACESTEP_TPU_KV_DTYPE."""
    d = os.environ.get("ACESTEP_TPU_KV_DTYPE", "int8").lower()
    if d not in ("int8", "fp8"):
        raise ValueError(
            f"ACESTEP_TPU_KV_DTYPE={d!r}: expected 'int8' or 'fp8'")
    return d


def kv_store_dtype():
    return jnp.int8 if kv_dtype_name() == "int8" else jnp.float8_e4m3fn


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale", "length"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    """k/v: int8 [L, B, H_kv, T_max, D]; scales: f32 [L, B, H_kv, T_max];
    length: int32 [B] (valid positions per sequence)."""

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    length: jax.Array

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def round_len(n: int, mult: int = 128) -> int:
    """Round a cache time-axis length up to a tile multiple.  The pallas
    decode-attention kernel (ops/pallas/decode_attn.py) needs T_max divisible
    by its block size; rounding also coalesces nearby prompt+codes totals into
    one compiled bucket.  Padding slots are masked by ``length`` everywhere."""
    return ((int(n) + mult - 1) // mult) * mult


def init_cache(
    n_layers: int, batch: int, n_kv: int, max_len: int, head_dim: int
) -> KVCache:
    qt = kv_store_dtype()
    return KVCache(
        k=jnp.zeros((n_layers, batch, n_kv, max_len, head_dim), qt),
        v=jnp.zeros((n_layers, batch, n_kv, max_len, head_dim), qt),
        k_scale=jnp.zeros((n_layers, batch, n_kv, max_len), jnp.float32),
        v_scale=jnp.zeros((n_layers, batch, n_kv, max_len), jnp.float32),
        length=jnp.zeros((batch,), jnp.int32),
    )


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., D] -> (int8/fp8 values, f32 scale over last dim)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    if kv_dtype_name() == "fp8":
        # normalize to e4m3fn full scale; fp8 keeps a mantissa (vs int8's
        # uniform grid) so small-magnitude components lose less precision
        scale = amax / _FP8_MAX
        inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
        q = jnp.clip(xf * inv[..., None], -_FP8_MAX, _FP8_MAX).astype(
            jnp.float8_e4m3fn)
        return q, scale
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def write_prompt(
    cache: KVCache, layer: int, k: jax.Array, v: jax.Array, lengths: jax.Array
) -> KVCache:
    """Write prefill K/V [B, H_kv, T_prompt, D] at positions [0, T_prompt)."""
    t = k.shape[2]
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    new_k = cache.k.at[layer, :, :, :t, :].set(kq)
    new_v = cache.v.at[layer, :, :, :t, :].set(vq)
    new_ks = cache.k_scale.at[layer, :, :, :t].set(ks)
    new_vs = cache.v_scale.at[layer, :, :, :t].set(vs)
    return KVCache(new_k, new_v, new_ks, new_vs, lengths)


def append_token(
    cache: KVCache, layer: int, k: jax.Array, v: jax.Array
) -> KVCache:
    """Append one position of K/V [B, H_kv, 1, D] at each sequence's length."""
    b = k.shape[0]
    kq, ks = quantize_kv(k[:, :, 0, :])      # [B, H, D], [B, H]
    vq, vs = quantize_kv(v[:, :, 0, :])
    bidx = jnp.arange(b)
    pos = cache.length
    new_k = cache.k.at[layer, bidx, :, pos, :].set(kq)
    new_v = cache.v.at[layer, bidx, :, pos, :].set(vq)
    new_ks = cache.k_scale.at[layer, bidx, :, pos].set(ks)
    new_vs = cache.v_scale.at[layer, bidx, :, pos].set(vs)
    return KVCache(new_k, new_v, new_ks, new_vs, cache.length)


def grow_cache(cache: KVCache, new_max_len: int) -> KVCache:
    """Zero-pad the time axis to ``new_max_len`` (prefix-cache reuse: a cached
    prefill sized for phase 1 grows to hold phase 2's prompt + codes)."""
    cur = cache.max_len
    if new_max_len <= cur:
        return cache
    pad = new_max_len - cur
    return KVCache(
        jnp.pad(cache.k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
        jnp.pad(cache.v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
        jnp.pad(cache.k_scale, ((0, 0), (0, 0), (0, 0), (0, pad))),
        jnp.pad(cache.v_scale, ((0, 0), (0, 0), (0, 0), (0, pad))),
        cache.length,
    )


def broadcast_cache(cache: KVCache, batch: int) -> KVCache:
    """Tile a batch-1 cache to ``batch`` rows (one shared prompt prefill feeds
    a whole batch of candidate decodes)."""
    if cache.k.shape[1] == batch:
        return cache
    assert cache.k.shape[1] == 1, "can only broadcast a batch-1 cache"
    reps4 = (1, batch, 1, 1, 1)
    reps3 = (1, batch, 1, 1)
    return KVCache(
        jnp.tile(cache.k, reps4),
        jnp.tile(cache.v, reps4),
        jnp.tile(cache.k_scale, reps3),
        jnp.tile(cache.v_scale, reps3),
        jnp.tile(cache.length, (batch,)),
    )


def advance(cache: KVCache, active: jax.Array) -> KVCache:
    """Bump lengths for active (non-finished) sequences."""
    return KVCache(
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        cache.length + active.astype(jnp.int32),
    )
