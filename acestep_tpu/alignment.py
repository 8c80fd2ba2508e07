"""Lyric-to-audio alignment: cross-attention DTW -> LRC timestamps + score.

Analog of acestep/dit_alignment_score.py (numba DTW :40-117, MusicStampsAligner
:143+): re-noise the generated latents one step, run ONE DiT forward collecting
the cross-attention probabilities, average heads/layers, then dynamic-time-warp
the (audio-patch x lyric-token) attention matrix into a monotonic path that
yields per-token timestamps and an overall alignment quality score.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.ops import (
    apply_rope, attention, linear, make_attention_mask, rms_norm, rope_cos_sin,
)


# ---------------------------------------------------------------------------
# cross-attention map extraction (1-step re-noised forward)
# ---------------------------------------------------------------------------

def _cross_attn_probs(p, cfg: DiTConfig, x, kv, mask):
    """One cross-attention layer's probabilities [B, H, Tq, Lc] (f32)."""
    import math

    b, l, _ = x.shape
    hd, nh = cfg.head_dim, cfg.num_attention_heads
    q = linear(x, p["q_proj"]["kernel"]).reshape(b, l, nh, hd)
    q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    k, v = kv
    hkv = k.shape[1]
    n_rep = nh // hkv
    qg = q.reshape(b, hkv, n_rep, l, hd)
    scores = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)[:, :, None, :, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return probs.reshape(b, nh, l, k.shape[2])


def cross_attention_maps(
    params: Dict[str, Any],
    cfg: DiTConfig,
    latents: jax.Array,                  # [B, T, 64] clean latents
    context_latents: jax.Array,
    encoder_hidden_states: jax.Array,    # [B, Lc, H]
    encoder_attn_mask: Optional[jax.Array] = None,
    t_renoise: float = 0.3,
    noise_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Average cross-attention map over layers+heads -> [B, Tp, Lc] (f32).

    Re-noises x_t = t*eps + (1-t)*x0 and runs the decoder layer stack once,
    collecting every layer's cross-attn probabilities (the reference's 1-step
    attention probe, dit_alignment_score.py MusicStampsAligner)."""
    params = dit.stack_params(params)
    b, t_len, _ = latents.shape
    patch = cfg.patch_size
    dtype = jnp.bfloat16

    key = noise_key if noise_key is not None else jax.random.key(0)
    eps = jax.random.normal(key, latents.shape, jnp.float32)
    xt = t_renoise * eps + (1.0 - t_renoise) * latents.astype(jnp.float32)

    t_b = jnp.full((b,), t_renoise, jnp.float32)
    temb, timestep_proj = dit.compute_timestep_conditioning(params, cfg, t_b, t_b, dtype)

    x = jnp.concatenate([context_latents.astype(dtype), xt.astype(dtype)], axis=-1)
    pad = (-t_len) % patch
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    tp = (t_len + pad) // patch
    x = x.reshape(b, tp, patch * cfg.in_channels)
    x = linear(x, params["proj_in"]["kernel"], params["proj_in"]["bias"])

    enc = dit.compute_condition(params, cfg, encoder_hidden_states.astype(dtype))
    kv = dit.compute_all_cross_kv(params, cfg, enc)
    k_stack, v_stack = kv

    cos, sin = rope_cos_sin(jnp.arange(tp), cfg.head_dim, base=cfg.rope_theta)
    cos = cos.astype(dtype)
    sin = sin.astype(dtype)
    lc = enc.shape[1]
    cross_mask = (
        make_attention_mask(tp, lc, kv_valid=encoder_attn_mask)
        if encoder_attn_mask is not None else None
    )
    has_sliding = any(lt == "sliding_attention" for lt in cfg.layer_types)
    sliding_mask = (
        make_attention_mask(tp, tp, sliding_window=cfg.sliding_window)
        if has_sliding else None
    )
    sliding_flags = jnp.asarray([lt == "sliding_attention" for lt in cfg.layer_types])

    def scan_body(x, xs):
        p, k_l, v_l, flag = xs
        mod = p["scale_shift_table"].astype(jnp.float32)[None] + timestep_proj.astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            mod[:, j:j + 1, :].astype(dtype) for j in range(6)
        ]
        normed = rms_norm(x, p["self_attn_norm"], cfg.rms_norm_eps)
        normed = normed * (1.0 + scale_msa) + shift_msa
        sm = None
        if sliding_mask is not None:
            sm = jnp.where(flag, sliding_mask, jnp.zeros_like(sliding_mask))
        x = x + dit._self_attention(
            p["self_attn"], cfg, normed, cos, sin,
            lambda q, k, v: attention(q, k, v, mask=sm),
        ) * gate_msa

        normed = rms_norm(x, p["cross_attn_norm"], cfg.rms_norm_eps)
        probs = _cross_attn_probs(p["cross_attn"], cfg, normed, (k_l, v_l), cross_mask)
        x = x + dit._cross_attention(p["cross_attn"], cfg, normed, (k_l, v_l), cross_mask)

        normed = rms_norm(x, p["mlp_norm"], cfg.rms_norm_eps)
        normed = normed * (1.0 + c_scale) + c_shift
        x = x + dit._mlp(p["mlp"], normed) * c_gate
        return x, probs.mean(axis=1)            # average heads -> [B, Tp, Lc]

    _, maps = jax.lax.scan(scan_body, x, (params["layers"], k_stack, v_stack, sliding_flags))
    return maps.mean(axis=0)                      # average layers -> [B, Tp, Lc]


# ---------------------------------------------------------------------------
# DTW (monotonic alignment path; dit_alignment_score.py:40-117 semantics)
# ---------------------------------------------------------------------------

def dtw_path(similarity: np.ndarray) -> List[Tuple[int, int]]:
    """Best monotonic path through a [T, N] similarity matrix (maximize sum).

    Moves: (t+1, n), (t, n+1), (t+1, n+1) — standard DTW on -similarity cost.
    Returns the path as (t, n) pairs, start to end."""
    sim = np.asarray(similarity, dtype=np.float64)
    t_len, n_len = sim.shape
    move = np.zeros((t_len, n_len), dtype=np.int8)   # 0:diag 1:up(t) 2:left(n)

    # Row-vectorized DP (the reference needs numba for its scalar loop,
    # dit_alignment_score.py:40-117; this runs 7500x2048 in well under a
    # second in pure numpy).  Within a row the only dependency is the "left"
    # move: row[n] = max(ub[n], row[n-1]) + s[n] with ub[n] =
    # max(prev[n-1], prev[n]).  That max-plus recurrence has the closed form
    #   row[n] = S[n] + running_max_k<=n (g[k]),  g[k] = ub[k] - S[k-1]
    # with S the prefix sum of s — one cumsum + one maximum.accumulate.
    prev = np.cumsum(sim[0])               # cost[0, :] (left-only row)
    move[0, 1:] = 2
    for t in range(1, t_len):
        s = sim[t]
        S = np.cumsum(s)
        row0 = prev[0] + s[0]
        g = np.empty(n_len)
        g[0] = row0 - S[0]                 # == prev[0] (S[k-1] for k=0 is 0)
        ub = np.maximum(prev[:-1], prev[1:])
        g[1:] = ub - S[:-1]
        row = S + np.maximum.accumulate(g)
        row[0] = row0

        mv = np.zeros(n_len, np.int8)
        mv[0] = 1
        up_wins = (prev[1:] > prev[:-1]).astype(np.int8)       # up vs diag
        best_ud = np.maximum(prev[:-1], prev[1:])
        mv[1:] = np.where(row[:-1] > best_ud, np.int8(2), up_wins)
        move[t] = mv
        prev = row
    path = []
    t, n = t_len - 1, n_len - 1
    while True:
        path.append((t, n))
        if t == 0 and n == 0:
            break
        m = move[t, n]
        if m == 0:
            t, n = t - 1, n - 1
        elif m == 1:
            t -= 1
        else:
            n -= 1
        if t < 0 or n < 0:
            break
    path.reverse()
    return path


def token_timestamps(
    attn_map: np.ndarray,            # [Tp, Lc] averaged cross-attn
    n_lyric_tokens: int,
    patch_seconds: float,
) -> np.ndarray:
    """First-visit time (s) of each lyric token along the DTW path -> [Lc]."""
    path = dtw_path(attn_map[:, :n_lyric_tokens])
    stamps = np.full(n_lyric_tokens, -1.0)
    for t, n in path:
        if stamps[n] < 0:
            stamps[n] = t * patch_seconds
    # forward-fill any token never visited (degenerate paths)
    last = 0.0
    for i in range(n_lyric_tokens):
        if stamps[i] < 0:
            stamps[i] = last
        last = stamps[i]
    return stamps


def alignment_score(attn_map: np.ndarray, n_lyric_tokens: int) -> float:
    """Mean on-path attention mass (the reference's quality score idea: strong
    monotonic ridges score high, diffuse attention scores low)."""
    sub = np.asarray(attn_map[:, :n_lyric_tokens], dtype=np.float64)
    if sub.size == 0:
        return 0.0
    path = dtw_path(sub)
    on_path = np.mean([sub[t, n] for t, n in path])
    return float(on_path / (sub.mean() + 1e-12))


def to_lrc(
    lines: Sequence[str],
    line_token_counts: Sequence[int],
    stamps: np.ndarray,
) -> str:
    """Sentence-level LRC: each line gets the timestamp of its first token."""
    out = []
    tok = 0
    for line, n in zip(lines, line_token_counts):
        t = stamps[min(tok, len(stamps) - 1)] if len(stamps) else 0.0
        m, s = divmod(max(t, 0.0), 60.0)
        out.append(f"[{int(m):02d}:{s:05.2f}]{line}")
        tok += n
    return "\n".join(out)
