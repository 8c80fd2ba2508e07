"""Core NN primitives shared by the DiT / Qwen / encoder stacks.

Numerics notes (parity with the reference):
  * RMSNorm computes in f32 (ggml_rms_norm is f32; HF Qwen3RMSNorm upcasts).
  * RoPE is NEOX-style rotate-half with ``emb = concat(freqs, freqs)``
    (acestep_ggml/cpp/acestep_dit_model.cpp:1203 GGML_ROPE_TYPE_NEOX;
    acestep/mlx_dit/model.py:16-35).
  * GQA head h reads kv head h // n_rep (HF/MLX/ggml all interleave the same way;
    acestep/mlx_dit/model.py:170-178).
  * Attention scores are scaled by 1/sqrt(head_dim), masked additively and
    softmaxed in f32 (GGML_PREC_F32 on the kq matmul, dit_model.cpp:1239).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite big-negative: keeps fully-masked padding rows NaN-free


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Rotary position embeddings (NEOX rotate-half)
# ---------------------------------------------------------------------------

def rope_cos_sin(
    positions: jax.Array, head_dim: int, base: float = 1e6, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """positions [L] (int or float) -> (cos, sin) each [L, head_dim]."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """q, k: [..., L, head_dim]; cos/sin: [L, head_dim] (broadcast over leading dims)."""
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q2 = q * cos + _rotate_half(q) * sin
    k2 = k * cos + _rotate_half(k) * sin
    return q2, k2


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def make_attention_mask(
    q_len: int,
    k_len: int,
    kv_valid: Optional[jax.Array] = None,   # [B, k_len] 1=attend, 0=masked
    causal: bool = False,
    sliding_window: Optional[int] = None,   # bidirectional band |i-j| <= w
) -> Optional[jax.Array]:
    """Build an additive f32 mask [B or 1, 1, q_len, k_len]; None if unmasked."""
    if kv_valid is None and not causal and sliding_window is None:
        return None
    qi = jnp.arange(q_len)[:, None]
    ki = jnp.arange(k_len)[None, :]
    allow = jnp.ones((q_len, k_len), dtype=bool)
    if causal:
        allow = allow & (ki <= qi)
        if sliding_window is not None:
            allow = allow & (qi - ki <= sliding_window)
    elif sliding_window is not None:
        allow = allow & (jnp.abs(qi - ki) <= sliding_window)
    mask = jnp.where(allow, 0.0, NEG_INF).astype(jnp.float32)[None, None]
    if kv_valid is not None:
        pad = jnp.where(kv_valid.astype(bool), 0.0, NEG_INF).astype(jnp.float32)
        mask = mask + pad[:, None, None, :]
    return mask


def attention(
    q: jax.Array,                 # [B, Hq, Lq, D]
    k: jax.Array,                 # [B, Hkv, Lk, D]
    v: jax.Array,                 # [B, Hkv, Lk, D]
    mask: Optional[jax.Array] = None,   # additive [B|1, 1, Lq, Lk]
) -> jax.Array:
    """Grouped-query attention with f32 softmax. Returns [B, Hq, Lq, D]."""
    b, hq, lq, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    scale = 1.0 / math.sqrt(d)

    qg = q.reshape(b, hkv, n_rep, lq, d)
    scores = jnp.einsum(
        "bgrqd,bgkd->bgrqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)[:, :, None, :, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bgrqk,bgkd->bgrqd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(b, hq, lq, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Activations / MLP
# ---------------------------------------------------------------------------

def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Timestep embedding (sinusoidal, cos-first; mlx_dit/model.py:369-391)
# ---------------------------------------------------------------------------

def sinusoidal_timestep_embedding(
    t: jax.Array, dim: int, scale: float = 1000.0, max_period: float = 10000.0
) -> jax.Array:
    """t [B] -> [B, dim]; embedding = concat(cos(args), sin(args))."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = (t.astype(jnp.float32) * scale)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
