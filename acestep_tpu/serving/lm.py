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
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from acestep_tpu.config import QwenConfig
from acestep_tpu.models import qwen
from acestep_tpu.ops import apply_rope, attention, linear, make_attention_mask, rms_norm, rope_cos_sin
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving.kv_cache import KVCache

NEG_INF = -1e30


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


def prefill(
    params: Dict[str, Any],
    cfg: QwenConfig,
    token_ids: jax.Array,          # [B, T] right-padded
    lengths: jax.Array,            # [B]
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Full causal forward over the prompt; fills the cache; returns logits at the
    last valid position of each sequence [B, vocab].

    Stacked layer params run as ONE lax.scan over the layer axis (a single
    compiled layer body — 28x smaller compile units than the unrolled loop)."""
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
        q = linear(xn, p["q_proj"]["kernel"]).reshape(b, t, nh, hd)
        k = linear(xn, p["k_proj"]["kernel"]).reshape(b, t, nkv, hd)
        v = linear(xn, p["v_proj"]["kernel"]).reshape(b, t, nkv, hd)
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)
        kq, ks = kvc.quantize_kv(k)
        vq, vs = kvc.quantize_kv(v)
        attn = attention(q, k, v, mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, nh * hd)
        x = x + linear(attn, p["o_proj"]["kernel"])
        hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        x = x + qwen.mlp_block(p, hn)
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
    logits = qwen.lm_logits(params, cfg, last[:, None, :])[:, 0, :]
    return logits.astype(jnp.float32), cache


def decode_step(
    params: Dict[str, Any],
    cfg: QwenConfig,
    cache: KVCache,
    token_ids: jax.Array,          # [B] current input tokens
) -> Tuple[jax.Array, KVCache]:
    """One decode position at each sequence's current length -> logits [B, vocab].

    Attention consumes the int8 cache directly (scale folding, no dequantized
    copy); stacked params scan over layers with the per-layer cache slices as
    scan inputs/outputs."""
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
    bidx = jnp.arange(b)

    def layer_fn(x, p, kq_l, ks_l, vq_l, vs_l):
        """kq_l/vq_l: [B, Hkv, T, D] int8 slices; returns updated slices."""
        xn = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        q = linear(xn, p["q_proj"]["kernel"]).reshape(b, 1, nh, hd)
        k = linear(xn, p["k_proj"]["kernel"]).reshape(b, 1, nkv, hd)
        v = linear(xn, p["v_proj"]["kernel"]).reshape(b, 1, nkv, hd)
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
        x = x + linear(attn, p["o_proj"]["kernel"])
        hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        x = x + qwen.mlp_block(p, hn)
        return x, (kq_l, ks_l, vq_l, vs_l)

    if _layers_stacked(params):
        def scan_body(x, xs):
            p, kq_l, ks_l, vq_l, vs_l = xs
            return layer_fn(x, p, kq_l, ks_l, vq_l, vs_l)

        x, (k_new, ks_new, v_new, vs_new) = jax.lax.scan(
            scan_body, x,
            (params["layers"], cache.k, cache.k_scale, cache.v, cache.v_scale),
        )
        cache = KVCache(k_new, v_new, ks_new, vs_new, cache.length)
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
    logits = qwen.lm_logits(params, cfg, x)[:, 0, :]
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

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1, keepdims=True)
        ok = mass >= top_p
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
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
):
    """Shared decode scan: sample from ``logits`` then run max_new_tokens-1
    cached decode steps.  ``min_tokens_arr`` / ``forced_eos_arr`` are TRACED
    per-item [B] overrides of the static sp.min_tokens / sp.forced_eos_at —
    mixed durations share one compiled scan (code-count bucketing)."""
    use_cfg = sp.cfg_scale != 1.0 and ucache is not None
    if use_cfg:
        logits = ulogits + sp.cfg_scale * (logits - ulogits)

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

    k0, kloop = jax.random.split(key)
    first_logits = constrain(logits, 0)
    first_tok = sample_logits(k0, first_logits, sp.temperature, sp.top_k, sp.top_p)
    finished0 = is_stop(first_tok)

    # scan carry: (cache, ucache, cur_tok, finished, step)
    def scan_body(carry, k):
        cache, ucache, cur, finished, step = carry
        logits, cache2 = decode_step(params, cfg, cache, cur)
        cache2 = kvc.advance(cache2, jnp.ones((b,), bool))
        if use_cfg:
            ulog, ucache2 = decode_step(params, cfg, ucache, cur)
            ucache2 = kvc.advance(ucache2, jnp.ones((b,), bool))
            logits = ulog + sp.cfg_scale * (logits - ulog)
        else:
            ucache2 = ucache
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


@functools.partial(jax.jit, static_argnames=("cfg", "sp"))
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
) -> Tuple[jax.Array, jax.Array]:
    """Generate up to max_new_tokens for each sequence; returns
    (tokens [B, max_new], n_generated [B]).  One device dispatch."""
    b, t_prompt = prompt_ids.shape
    max_len = t_prompt + sp.max_new_tokens + 1
    n_layers = cfg.num_hidden_layers
    use_cfg = sp.cfg_scale != 1.0 and uncond_prompt_ids is not None

    cache = kvc.init_cache(n_layers, b, cfg.num_key_value_heads, max_len, cfg.head_dim)
    logits, cache = prefill(params, cfg, prompt_ids, prompt_lengths, cache)

    ucache = ulogits = None
    if use_cfg:
        u_max = uncond_prompt_ids.shape[1] + sp.max_new_tokens + 1
        ucache = kvc.init_cache(n_layers, b, cfg.num_key_value_heads, u_max, cfg.head_dim)
        ulogits, ucache = prefill(params, cfg, uncond_prompt_ids, uncond_prompt_lengths, ucache)

    return _scan_decode(
        params, cfg, sp, b, cache, logits, key, ucache, ulogits,
        min_tokens_arr, forced_eos_arr,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "sp"))
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
) -> Tuple[jax.Array, jax.Array]:
    """Decode loop starting from an existing prefilled cache (the prefix-cache
    path: the shared system+user prompt prefill is reused across the two-phase
    flow — nano-vllm block_manager.py:44-50 prefix reuse, dense-cache form)."""
    b = logits.shape[0]
    return _scan_decode(
        params, cfg, sp, b, cache, logits, key, ucache, ulogits,
        min_tokens_arr, forced_eos_arr,
    )


# ---------------------------------------------------------------------------
# host-stepped constrained generation (metadata FSM CoT phase)
#
# The metadata FSM (acestep_tpu.constrained) tracks string state that cannot
# live on-device; like the reference's logits-processor hook it masks logits on
# the host between jitted decode steps.  CoT is short (~100 tokens) so the
# per-step host round-trip is acceptable; the codes phase stays on-device.
# ---------------------------------------------------------------------------

_decode_step_jit = jax.jit(decode_step, static_argnames=("cfg",))
_prefill_jit = jax.jit(prefill, static_argnames=("cfg",))


def generate_with_fsm(
    params: Dict[str, Any],
    cfg: QwenConfig,
    prompt_ids: Sequence[int],
    fsm,                                   # constrained.MetadataFSM
    vocab_strs: Sequence[str],             # token id -> string piece
    key: jax.Array,
    temperature: float = 0.7,
    max_new_tokens: int = 256,
) -> Tuple[list, str]:
    """Generate one sequence under the FSM; returns (token_ids, text)."""
    import numpy as np

    ids = jnp.asarray([list(prompt_ids)], jnp.int32)
    lengths = jnp.asarray([len(prompt_ids)], jnp.int32)
    max_len = len(prompt_ids) + max_new_tokens + 1
    cache = kvc.init_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                           max_len, cfg.head_dim)
    logits, cache = _prefill_jit(params, cfg, ids, lengths, cache)

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
        logits, cache = _decode_step_jit(params, cfg, cache, jnp.asarray([tok], jnp.int32))
        cache = kvc.advance(cache, jnp.ones((1,), bool))
    return out_ids, "".join(out_text)


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
        q = linear(xn, p["q_proj"]["kernel"]).reshape(b, t2, nh, hd)
        k = linear(xn, p["k_proj"]["kernel"]).reshape(b, t2, nkv, hd)
        v = linear(xn, p["v_proj"]["kernel"]).reshape(b, t2, nkv, hd)
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
        x = x + linear(attn, p["o_proj"]["kernel"])
        hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        x = x + qwen.mlp_block(p, hn)
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
    logits = qwen.lm_logits(params, cfg, last)[:, 0, :]
    return logits.astype(jnp.float32), cache


extend_prefill_jit = jax.jit(extend_prefill, static_argnames=("cfg",))


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
