"""Memory-scalable attention kernels: banded (sliding-window) and flash (blocked
online-softmax) — the long-context path for the DiT at 600 s songs.

The reference reaches 600 s on one device via per-layer sliding windows
(acestep_ggml/cpp/acestep_dit_model.cpp:1132-1173 builds a banded mask at graph
level; the Metal/CPU kernels stream the band).  Round-1's dense ``attention``
materializes f32 scores [B, H, Tp, Tp] for every layer — ~3.6 GB/layer at
Tp=7500 — which caps duration.  These kernels never hold more than
O(Tp * block) scores:

  * :func:`banded_attention` — for ``sliding_attention`` layers.  With block
    size S = window, query block i only attends key blocks {i-1, i, i+1}
    (the band |qi-kj| <= window is contained in the 3-block neighborhood), so
    compute and memory are O(Tp * 3S) instead of O(Tp^2).
  * :func:`flash_attention` — for ``full_attention`` layers.  Standard online
    softmax (running max / normalizer / weighted accumulator) scanned over key
    blocks; memory O(Tp * block_k).

Both are GQA-aware ([B, Hq, T, D] queries against [B, Hkv, T, D] keys/values,
Hq = rep * Hkv), softmax in f32, and match the dense ``ops.nn.attention``
numerics (same finite NEG_INF masking => fully-masked rows degrade to a uniform
average, never NaN).  Pure lax/XLA — runs on TPU and the CPU test mesh alike;
XLA fuses the per-block einsums onto the MXU.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _mm_cast(x: jax.Array) -> jax.Array:
    """Matmul operand dtype: keep bf16 for the MXU on TPU; upcast to f32 off-TPU
    (the XLA:CPU dot thunk rejects some bf16xbf16=f32 shapes)."""
    if x.dtype == jnp.bfloat16 and jax.default_backend() not in ("tpu", "axon"):
        return x.astype(jnp.float32)
    return x


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# banded attention (sliding-window layers)
# ---------------------------------------------------------------------------

def banded_attention(
    q: jax.Array,                    # [B, Hq, T, D]
    k: jax.Array,                    # [B, Hkv, T, D]
    v: jax.Array,                    # [B, Hkv, T, D]
    window: int,                     # bidirectional band |i-j| <= window
    kv_valid: Optional[jax.Array] = None,   # [B, T] 1=attend
) -> jax.Array:
    """Bidirectional sliding-window attention without dense Tp^2 scores.

    Equivalent to ``attention(q, k, v, make_attention_mask(..., sliding_window=
    window, kv_valid=kv_valid))`` on the band; O(T * 3*window) memory.
    """
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    rep = hq // hkv
    dtype = q.dtype
    scale = 1.0 / math.sqrt(d)

    s = max(int(window), 1)
    nb = _cdiv(t, s)
    t2 = nb * s

    q = _pad_axis(q, 2, t2)
    k = _pad_axis(k, 2, t2)
    v = _pad_axis(v, 2, t2)
    valid = jnp.ones((b, t2), dtype=bool)
    if t2 > t:
        valid = valid.at[:, t:].set(False)
    if kv_valid is not None:
        valid = valid & _pad_axis(kv_valid.astype(bool), 1, t2)

    # blocks + one zero pad block each side, then the 3-neighborhood per block
    qb = q.reshape(b, hkv, rep, nb, s, d)
    kb = k.reshape(b, hkv, nb, s, d)
    vb = v.reshape(b, hkv, nb, s, d)
    kb_ext = jnp.pad(kb, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    vb_ext = jnp.pad(vb, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    validb = valid.reshape(b, nb, s)
    validb_ext = jnp.pad(validb, ((0, 0), (1, 1), (0, 0)))

    k3 = jnp.concatenate([kb_ext[:, :, o:o + nb] for o in range(3)], axis=3)
    v3 = jnp.concatenate([vb_ext[:, :, o:o + nb] for o in range(3)], axis=3)
    valid3 = jnp.concatenate([validb_ext[:, o:o + nb] for o in range(3)], axis=2)

    # scores [B, Hkv, rep, nb, S, 3S]
    scores = jnp.einsum(
        "bgrnqd,bgnkd->bgrnqk", _mm_cast(qb), _mm_cast(k3),
        preferred_element_type=jnp.float32,
    ) * scale

    # band mask: key col c maps to relative position c - S - r from query row r
    r = jnp.arange(s)[:, None]
    c = jnp.arange(3 * s)[None, :]
    band = jnp.abs(c - s - r) <= window                       # [S, 3S]
    bias = jnp.where(band[None, None, :, :] & valid3[:, :, None, :], 0.0, NEG_INF)
    scores = scores + bias[:, None, None, :, :, :]

    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum(
        "bgrnqk,bgnkd->bgrnqd", _mm_cast(probs), _mm_cast(v3),
        preferred_element_type=jnp.float32,
    )
    out = out.reshape(b, hq, t2, d)[:, :, :t, :]
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# flash attention (full-attention layers): online softmax over key blocks
# ---------------------------------------------------------------------------

def flash_attention(
    q: jax.Array,                    # [B, Hq, Tq, D]
    k: jax.Array,                    # [B, Hkv, Tk, D]
    v: jax.Array,                    # [B, Hkv, Tk, D]
    kv_valid: Optional[jax.Array] = None,   # [B, Tk]
    block_k: int = 1024,
) -> jax.Array:
    """Full (bidirectional) attention with O(Tq * block_k) score memory.

    lax.scan over key blocks carrying the running (max, normalizer, weighted
    accumulator); numerically matches dense f32-softmax attention.
    """
    b, hq, tq, d = q.shape
    hkv = k.shape[1]
    rep = hq // hkv
    dtype = q.dtype
    scale = 1.0 / math.sqrt(d)

    tk = k.shape[2]
    bk = min(block_k, max(tk, 1))
    nb = _cdiv(tk, bk)
    t2 = nb * bk

    k = _pad_axis(k, 2, t2)
    v = _pad_axis(v, 2, t2)
    valid = jnp.ones((b, t2), dtype=bool)
    if t2 > tk:
        valid = valid.at[:, tk:].set(False)
    if kv_valid is not None:
        valid = valid & _pad_axis(kv_valid.astype(bool), 1, t2)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)   # [B, T2]

    qg = q.reshape(b, hkv, rep, tq, d)
    # scan inputs: key blocks leading axis [nb, ...]
    kb = jnp.moveaxis(k.reshape(b, hkv, nb, bk, d), 2, 0)
    vb = jnp.moveaxis(v.reshape(b, hkv, nb, bk, d), 2, 0)
    biasb = jnp.moveaxis(bias.reshape(b, nb, bk), 1, 0)         # [nb, B, bk]

    m0 = jnp.full((b, hkv, rep, tq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, hkv, rep, tq, 1), jnp.float32)
    acc0 = jnp.zeros((b, hkv, rep, tq, d), jnp.float32)

    def body(carry, blk):
        m, l, acc = carry
        k_i, v_i, bias_i = blk
        s = jnp.einsum(
            "bgrqd,bgkd->bgrqk", _mm_cast(qg), _mm_cast(k_i),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias_i[:, None, None, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bgrqk,bgkd->bgrqd", _mm_cast(p.astype(dtype)), _mm_cast(v_i),
            preferred_element_type=jnp.float32,
        )
        return (m_new, l_new, acc_new), None

    if nb == 1:
        (m, l, acc), _ = body((m0, l0, acc0), (kb[0], vb[0], biasb[0]))
    else:
        (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), (kb, vb, biasb))

    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(b, hq, tq, d).astype(dtype)


# ---------------------------------------------------------------------------
# dispatch: pick the scalable kernel per layer type above a size threshold
# ---------------------------------------------------------------------------

BLOCKED_ATTN_MIN_ENV = "ACESTEP_TPU_BLOCKED_ATTN_MIN"
_DEFAULT_BLOCKED_MIN = 1536        # patch tokens; below this dense wins (tiny
                                   # shapes, and the dense mask path is exact)


def blocked_attn_threshold() -> int:
    import os

    try:
        return int(os.environ.get(BLOCKED_ATTN_MIN_ENV, _DEFAULT_BLOCKED_MIN))
    except ValueError:
        return _DEFAULT_BLOCKED_MIN


def use_blocked_attention(seq_len: int, window: Optional[int]) -> bool:
    """True when the banded/flash path should replace dense masked attention."""
    return seq_len >= blocked_attn_threshold()
