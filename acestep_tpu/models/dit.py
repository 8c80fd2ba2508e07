"""ACE-Step DiT denoiser (flow-matching diffusion transformer) in functional JAX.

Behavioral reference:
  * decoder graph — acestep/mlx_dit/model.py:413-629 and
    acestep_ggml/cpp/acestep_dit_model.cpp:1316-1560 (AdaLN with a 6-column
    scale_shift_table per layer, GQA self-attn with NEOX RoPE and per-layer
    sliding-window, cross-attn to the packed condition, SwiGLU MLP, dual timestep
    embeddings t and t-r, patchify via conv1d-as-linear and unpatchify via
    convtranspose1d-as-linear);
  * lyric encoder — acestep_dit_model.cpp:1562-1646 (project text embeddings then
    Qwen-style pre-norm encoder layers, final norm);
  * timbre encoder — acestep_dit_model.cpp:1648-1739 (same blocks over 64-dim
    refer-audio latents; returns the FIRST token only).

TPU-native deltas vs the reference:
  * the whole 8-step sampler jits once and reuses the compiled graph (the C++
    runtime rebuilds its ggml graph every step, acestep_ggml.cpp:1331-1429);
  * cross-attention K/V over the (step-constant) condition are computed once per
    request and reused by every diffusion step (the MLX port's
    MLXCrossAttentionCache, model.py:91-116 — here it is just hoisted code);
  * every linear may carry a block-quantized weight (acestep_tpu.quant).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig
from acestep_tpu.ops import (
    apply_rope,
    attention,
    banded_attention,
    flash_attention,
    linear,
    make_attention_mask,
    rms_norm,
    rope_cos_sin,
    sinusoidal_timestep_embedding,
    use_blocked_attention,
)

Params = Dict[str, Any]

TIME_EMBED_IN = 256  # sinusoidal embedding width (mlx_dit/model.py:358)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

_SAMPLER = None  # set temporarily by init_params for fast host-side init


def _normal(key, shape):
    if _SAMPLER is not None:
        return _SAMPLER(shape)
    return jax.random.normal(key, shape, jnp.float32)


def _cast(x, dtype):
    from acestep_tpu.utils import np_astype_fast

    return np_astype_fast(x, dtype)


def _dense(key, k, n, dtype, bias=True, scale=0.02):
    p = {"kernel": _cast(_normal(key, (k, n)) * scale, dtype)}
    if bias:
        p["bias"] = jnp.zeros((n,), dtype)
    return p


def _attn_params(key, q_in, kv_in, n_heads, n_kv, head_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q_proj": _dense(ks[0], q_in, n_heads * head_dim, dtype, bias=False),
        "k_proj": _dense(ks[1], kv_in, n_kv * head_dim, dtype, bias=False),
        "v_proj": _dense(ks[2], kv_in, n_kv * head_dim, dtype, bias=False),
        "o_proj": _dense(ks[3], n_heads * head_dim, q_in, dtype, bias=False),
        "q_norm": jnp.ones((head_dim,), dtype),
        "k_norm": jnp.ones((head_dim,), dtype),
    }


def _mlp_params(key, h, inter, dtype):
    ks = jax.random.split(key, 3)
    return {
        "gate_proj": _dense(ks[0], h, inter, dtype, bias=False),
        "up_proj": _dense(ks[1], h, inter, dtype, bias=False),
        "down_proj": _dense(ks[2], inter, h, dtype, bias=False),
    }


def _encoder_layer_params(key, cfg: DiTConfig, dtype):
    ks = jax.random.split(key, 2)
    h = cfg.hidden_size
    return {
        "input_norm": jnp.ones((h,), dtype),
        "self_attn": _attn_params(
            ks[0], h, h, cfg.num_attention_heads, cfg.num_key_value_heads,
            cfg.head_dim, dtype,
        ),
        "post_norm": jnp.ones((h,), dtype),
        "mlp": _mlp_params(ks[1], h, cfg.intermediate_size, dtype),
    }


def _timestep_embed_params(key, h, dtype):
    ks = jax.random.split(key, 3)
    return {
        "linear_1": _dense(ks[0], TIME_EMBED_IN, h, dtype),
        "linear_2": _dense(ks[1], h, h, dtype),
        "time_proj": _dense(ks[2], h, h * 6, dtype),
    }


def init_params(key: jax.Array, cfg: DiTConfig, dtype=jnp.bfloat16, sampler=None) -> Params:
    """``sampler(shape) -> f32 array`` overrides jax.random (numpy host init is
    ~50x faster for billion-param random engines; see pipeline.build_random_engine)."""
    global _SAMPLER
    _SAMPLER = sampler
    try:
        return _init_params_impl(key, cfg, dtype)
    finally:
        _SAMPLER = None


def _init_params_impl(key: jax.Array, cfg: DiTConfig, dtype) -> Params:
    h = cfg.hidden_size
    keys = jax.random.split(key, 16 + cfg.num_hidden_layers
                            + cfg.num_lyric_encoder_hidden_layers
                            + cfg.num_timbre_encoder_hidden_layers)
    ki = iter(range(len(keys)))

    def nk():
        return keys[next(ki)]

    def dit_layer(k):
        ks = jax.random.split(k, 3)
        return {
            "self_attn_norm": jnp.ones((h,), dtype),
            "self_attn": _attn_params(
                ks[0], h, h, cfg.num_attention_heads, cfg.num_key_value_heads,
                cfg.head_dim, dtype,
            ),
            "cross_attn_norm": jnp.ones((h,), dtype),
            "cross_attn": _attn_params(
                ks[1], h, h, cfg.num_attention_heads, cfg.num_key_value_heads,
                cfg.head_dim, dtype,
            ),
            "mlp_norm": jnp.ones((h,), dtype),
            "mlp": _mlp_params(ks[2], h, cfg.intermediate_size, dtype),
            "scale_shift_table": jnp.zeros((6, h), dtype),
        }

    return {
        "proj_in": _dense(nk(), cfg.in_channels * cfg.patch_size, h, dtype),
        "time_embed": _timestep_embed_params(nk(), h, dtype),
        "time_embed_r": _timestep_embed_params(nk(), h, dtype),
        "condition_embedder": _dense(nk(), h, h, dtype),
        "layers": [dit_layer(nk()) for _ in range(cfg.num_hidden_layers)],
        "norm_out": jnp.ones((h,), dtype),
        "out_scale_shift_table": jnp.zeros((2, h), dtype),
        # convtranspose1d-as-linear: kernel [H, patch*audio], bias [audio]
        # (per output channel, like torch ConvTranspose1d)
        "proj_out": {
            "kernel": _cast(
                _normal(nk(), (h, cfg.audio_acoustic_hidden_dim * cfg.patch_size)) * 0.02,
                dtype),
            "bias": jnp.zeros((cfg.audio_acoustic_hidden_dim,), dtype),
        },
        # conditioning encoders (encoder.* namespace in the checkpoint)
        "text_projector": _dense(nk(), cfg.text_hidden_dim, h, dtype, bias=False),
        "lyric_embed": _dense(nk(), cfg.text_hidden_dim, h, dtype),
        "lyric_layers": [
            _encoder_layer_params(nk(), cfg, dtype)
            for _ in range(cfg.num_lyric_encoder_hidden_layers)
        ],
        "lyric_norm": jnp.ones((h,), dtype),
        "timbre_embed": _dense(nk(), cfg.timbre_hidden_dim, h, dtype),
        "timbre_layers": [
            _encoder_layer_params(nk(), cfg, dtype)
            for _ in range(cfg.num_timbre_encoder_hidden_layers)
        ],
        "timbre_norm": jnp.ones((h,), dtype),
        "timbre_special_token": jnp.zeros((h,), dtype),
    }


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _self_attention(
    p: Params, cfg: DiTConfig, x: jax.Array, cos, sin, attn_fn,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """``attn_fn(q, k, v) -> out`` encapsulates masking/banding (dense mask,
    banded, or flash — see :func:`_make_self_attn_fns`).

    Megatron-style TP when ``axis_name`` is set: q/k/v are column-sharded
    (cfg carries the LOCAL head counts), o_proj is row-sharded, and the partial
    output is all-reduced here — the explicit psum the reference does with
    dist.all_reduce in RowParallelLinear (nano-vllm linear.py:152)."""
    b, l, _ = x.shape
    hd, nh, nkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    if "qkv_proj" in p:
        # serving-fused q||k||v: one weight stream + one kernel launch
        # (see fuse_params; exact column-for-column)
        qkv = linear(x, p["qkv_proj"]["kernel"])
        q = qkv[..., : nh * hd].reshape(b, l, nh, hd)
        k = qkv[..., nh * hd: (nh + nkv) * hd].reshape(b, l, nkv, hd)
        v = qkv[..., (nh + nkv) * hd:].reshape(b, l, nkv, hd)
    else:
        q = linear(x, p["q_proj"]["kernel"]).reshape(b, l, nh, hd)
        k = linear(x, p["k_proj"]["kernel"]).reshape(b, l, nkv, hd)
        v = linear(x, p["v_proj"]["kernel"]).reshape(b, l, nkv, hd)
    q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q, k = apply_rope(q, k, cos, sin)
    out = attn_fn(q, k, v).transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    if axis_name is not None:
        from acestep_tpu.parallel.collective_matmul import row_parallel_linear

        return row_parallel_linear(out, p["o_proj"]["kernel"], axis_name)
    return linear(out, p["o_proj"]["kernel"])


def _make_self_attn_fns(cfg: DiTConfig, seq_len: int, kv_valid):
    """Build (sliding_fn, full_fn, select_fn) for the decoder/encoder stacks.

    Below the blocked-attention threshold both are dense masked attention
    (exact, fastest for small Tp).  At or above it, sliding layers use the
    banded kernel and full layers the flash kernel — no dense Tp^2 scores ever
    materialize, which is what unlocks 600 s songs (dit_model.cpp:1132-1173
    banding semantics).

    ``select_fn(flag, q, k, v)`` handles a TRACED per-layer sliding flag (the
    scan-over-layers path): dense mode selects between masks with jnp.where
    (one attention call); blocked mode uses lax.cond (structurally different
    kernels, one executed per layer at runtime).
    """
    has_sliding = any(lt == "sliding_attention" for lt in cfg.layer_types)
    blocked = use_blocked_attention(seq_len, cfg.sliding_window)

    if blocked:
        def sliding_fn(q, k, v):
            return banded_attention(q, k, v, window=cfg.sliding_window, kv_valid=kv_valid)

        def full_fn(q, k, v):
            return flash_attention(q, k, v, kv_valid=kv_valid)

        def select_fn(flag, q, k, v):
            return jax.lax.cond(
                flag,
                lambda qkv: sliding_fn(*qkv),
                lambda qkv: full_fn(*qkv),
                (q, k, v),
            )

        return sliding_fn, full_fn, select_fn

    need_mask = kv_valid is not None
    full_mask = make_attention_mask(seq_len, seq_len, kv_valid=kv_valid) if need_mask else None
    sliding_mask = (
        make_attention_mask(seq_len, seq_len, kv_valid=kv_valid,
                            sliding_window=cfg.sliding_window)
        if has_sliding else None
    )

    def sliding_fn(q, k, v):
        return attention(q, k, v, mask=sliding_mask)

    def full_fn(q, k, v):
        return attention(q, k, v, mask=full_mask)

    def select_fn(flag, q, k, v):
        if sliding_mask is None:
            mask = full_mask
        elif full_mask is None:
            mask = jnp.where(flag, sliding_mask, jnp.zeros_like(sliding_mask))
        else:
            mask = jnp.where(flag, sliding_mask, full_mask)
        return attention(q, k, v, mask=mask)

    return sliding_fn, full_fn, select_fn


def cross_kv(
    p: Params, cfg: DiTConfig, enc: jax.Array, backend: Optional[str] = None
) -> Tuple[jax.Array, jax.Array]:
    """K/V for one layer's cross-attention from the projected condition [B, Lc, H]."""
    b, lc, _ = enc.shape
    hd, nkv = cfg.head_dim, cfg.num_key_value_heads
    k = linear(enc, p["k_proj"]["kernel"], backend=backend).reshape(b, lc, nkv, hd)
    k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    v = linear(enc, p["v_proj"]["kernel"], backend=backend).reshape(b, lc, nkv, hd).transpose(0, 2, 1, 3)
    return k, v


def _cross_attention(
    p: Params, cfg: DiTConfig, x: jax.Array, kv: Tuple[jax.Array, jax.Array], mask,
    axis_name: Optional[str] = None,
) -> jax.Array:
    b, l, _ = x.shape
    hd, nh = cfg.head_dim, cfg.num_attention_heads
    q = linear(x, p["q_proj"]["kernel"]).reshape(b, l, nh, hd)
    q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps).transpose(0, 2, 1, 3)
    k, v = kv
    out = attention(q, k, v, mask=mask).transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    if axis_name is not None:
        from acestep_tpu.parallel.collective_matmul import row_parallel_linear

        return row_parallel_linear(out, p["o_proj"]["kernel"], axis_name)
    return linear(out, p["o_proj"]["kernel"])


def _mlp(p: Params, x: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    if "gateup_proj" in p:
        # serving-fused gate||up (see fuse_params)
        gu = linear(x, p["gateup_proj"]["kernel"])
        inter = gu.shape[-1] // 2
        gate, up = gu[..., :inter], gu[..., inter:]
    else:
        gate = linear(x, p["gate_proj"]["kernel"])
        up = linear(x, p["up_proj"]["kernel"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    if axis_name is not None:
        # ICI-overlapped ring all-reduce matmul (scaling-book collective
        # matmul) under the flag: chunked dots overlap the ppermute hops
        # instead of one monolithic dot followed by a blocking psum.
        from acestep_tpu.parallel.collective_matmul import row_parallel_linear

        return row_parallel_linear(act, p["down_proj"]["kernel"], axis_name)
    return linear(act, p["down_proj"]["kernel"])


def _timestep_embed(p: Params, t: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """t [B] -> (temb [B, H], proj [B, 6, H]) — mlx_dit/model.py:392-406."""
    t_freq = sinusoidal_timestep_embedding(t, TIME_EMBED_IN).astype(dtype)
    temb = linear(t_freq, p["linear_1"]["kernel"], p["linear_1"]["bias"])
    temb = jax.nn.silu(temb.astype(jnp.float32)).astype(dtype)
    temb = linear(temb, p["linear_2"]["kernel"], p["linear_2"]["bias"])
    proj = jax.nn.silu(temb.astype(jnp.float32)).astype(dtype)
    proj = linear(proj, p["time_proj"]["kernel"], p["time_proj"]["bias"])
    return temb, proj.reshape(proj.shape[0], 6, -1)


def compute_timestep_conditioning(
    params: Params, cfg: DiTConfig, timestep: jax.Array, timestep_r: jax.Array,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """Dual timestep embedding: t and (t - r) — dit_model.cpp:1416-1424."""
    temb_t, proj_t = _timestep_embed(params["time_embed"], timestep, dtype)
    temb_r, proj_r = _timestep_embed(params["time_embed_r"], timestep - timestep_r, dtype)
    return temb_t + temb_r, proj_t + proj_r


def compute_condition(
    params: Params, cfg: DiTConfig, encoder_hidden_states: jax.Array
) -> jax.Array:
    """Project the packed condition once (condition_embedder)."""
    p = params["condition_embedder"]
    return linear(encoder_hidden_states, p["kernel"], p["bias"])


def compute_all_cross_kv(
    params: Params, cfg: DiTConfig, enc: jax.Array
):
    """Per-layer cross-attn K/V for a step-constant condition (computed once per
    request, reused by all diffusion steps).

    List-mode params -> list of (k, v); stacked params -> (k_stack, v_stack)
    with leading layer axis (computed via vmap over the stacked kernels)."""
    layers = params["layers"]
    if isinstance(layers, list):
        return [cross_kv(p["cross_attn"], cfg, enc) for p in layers]
    # vmap over the stacked layer axis; XLA backend (pallas has no batching rule)
    return jax.vmap(lambda p: cross_kv(p, cfg, enc, backend="xla"))(layers["cross_attn"])


# ---------------------------------------------------------------------------
# layer stacking (compile-time: scan over layers compiles ONE layer body
# instead of num_hidden_layers copies — essential for fast jit of the 24-layer
# turbo model; QuantTensor leaves stack/slice natively as registered pytrees)
# ---------------------------------------------------------------------------

def stack_layer_params(layers: List[Params]) -> Params:
    """List of per-layer pytrees -> one pytree with leading layer axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def stack_params(params: Params) -> Params:
    """Stack the decoder + conditioning-encoder layer lists for the scan path
    (idempotent; empty lists stay as-is)."""
    params = dict(params)
    for key in ("layers", "lyric_layers", "timbre_layers"):
        v = params.get(key)
        if isinstance(v, list) and v:
            params[key] = stack_layer_params(v)
    return params


def fuse_params(params: Params) -> Params:
    """Fuse the decoder's self-attn q||k||v and mlp gate||up into single
    stacked weights: one weight stream + one kernel launch instead of
    three/two (concat along N — exact column-for-column for every quant
    format, ops/qlinear.concat_weights_n).

    The 10 s Euler step is launch-bound, not bandwidth-bound (9 qmm kernels x
    24 layers per step); fusing drops that to 6/layer.  Single-device layout
    only — the TP path keeps per-projection weights (plain column sharding of
    a fused kernel would split q/k/v across ranks; cf. parallel/lm_tp.py
    rank-major fusion).  Idempotent; list-mode (unstacked) params pass
    through.  Mirrors serving/lm.py fuse_serving_params."""
    layers = params.get("layers")
    if not isinstance(layers, dict) or "self_attn" not in layers:
        return params
    sa, mlp = layers["self_attn"], layers["mlp"]
    if "qkv_proj" in sa or "gateup_proj" in mlp:
        return params
    from acestep_tpu.ops.qlinear import concat_weights_n

    sa = dict(sa)
    sa["qkv_proj"] = {"kernel": concat_weights_n(
        [sa.pop("q_proj")["kernel"], sa.pop("k_proj")["kernel"],
         sa.pop("v_proj")["kernel"]])}
    mlp = dict(mlp)
    mlp["gateup_proj"] = {"kernel": concat_weights_n(
        [mlp.pop("gate_proj")["kernel"], mlp.pop("up_proj")["kernel"]])}
    new_layers = dict(layers)
    new_layers["self_attn"], new_layers["mlp"] = sa, mlp
    out = dict(params)
    out["layers"] = new_layers
    return out


def _layers_as_list(layers) -> Optional[List[Params]]:
    return layers if isinstance(layers, list) else None


def _num_layers(layers) -> int:
    if isinstance(layers, list):
        return len(layers)
    return jax.tree_util.tree_leaves(layers)[0].shape[0]


def _pattern_period(flags: List[bool]) -> Optional[int]:
    """Smallest period p with flags[i] == flags[i % p] and p | len(flags).

    The turbo config alternates sliding/full (period 2): scanning over GROUPS
    of p layers lets every sub-layer keep a STATIC sliding flag — no lax.cond
    in the scan body, so XLA fuses/pipelines freely across the attention
    variants."""
    n = len(flags)
    for p in (1, 2, 3, 4):
        if n % p == 0 and all(flags[i] == flags[i % p] for i in range(n)):
            return p
    return None


def _group_stacked(tree, n_groups: int, period: int):
    """Reshape stacked leaves [L, ...] -> [L/p, p, ...]."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_groups, period) + x.shape[1:]), tree
    )


def _index_tree(tree, j: int):
    return jax.tree_util.tree_map(lambda x: x[j], tree)


# ---------------------------------------------------------------------------
# decoder forward
# ---------------------------------------------------------------------------

def forward(
    params: Params,
    cfg: DiTConfig,
    hidden_states: jax.Array,            # [B, T, 64] noisy latents
    timestep: jax.Array,                 # [B]
    timestep_r: jax.Array,               # [B]
    encoder_hidden_states: Optional[jax.Array] = None,   # [B, Lc, H] raw condition
    context_latents: jax.Array = None,   # [B, T, ctx_dim]
    attn_mask: Optional[jax.Array] = None,        # [B, T] 1=valid
    encoder_attn_mask: Optional[jax.Array] = None,  # [B, Lc]
    *,
    cross_kv_cache: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
    condition_projected: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Predict velocity v_t.  Returns [B, T, 64].

    Pass either ``encoder_hidden_states`` (full recompute) or the pair
    (``cross_kv_cache``,) precomputed via :func:`compute_all_cross_kv` on
    :func:`compute_condition` output.
    """
    b, t_len, _ = hidden_states.shape
    patch = cfg.patch_size
    dtype = hidden_states.dtype

    temb, timestep_proj = compute_timestep_conditioning(
        params, cfg, timestep, timestep_r, dtype
    )

    x = jnp.concatenate([context_latents.astype(dtype), hidden_states], axis=-1)

    pad = (-t_len) % patch
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    tp = (t_len + pad) // patch

    # patchify: [B, T, C] -> [B, Tp, patch*C] -> linear (conv1d stride=patch)
    x = x.reshape(b, tp, patch * cfg.in_channels)
    x = linear(x, params["proj_in"]["kernel"], params["proj_in"]["bias"])

    # condition projection + cross K/V (hoisted when cached)
    if cross_kv_cache is None:
        enc = compute_condition(params, cfg, encoder_hidden_states.astype(dtype)) \
            if condition_projected is None else condition_projected
        kv_list = compute_all_cross_kv(params, cfg, enc)
    else:
        kv_list = cross_kv_cache

    cos, sin = rope_cos_sin(jnp.arange(tp), cfg.head_dim, base=cfg.rope_theta)
    cos = cos.astype(dtype)
    sin = sin.astype(dtype)

    # patch-pooled self-attn mask (any valid frame in patch -> valid patch;
    # dit_model.cpp:1436-1452)
    patch_valid = None
    if attn_mask is not None:
        am = attn_mask
        if pad:
            am = jnp.pad(am, ((0, 0), (0, pad)))
        patch_valid = am.reshape(b, tp, patch).max(axis=-1)

    attn_sliding, attn_full, attn_select = _make_self_attn_fns(cfg, tp, patch_valid)
    cross_mask = (
        make_attention_mask(tp, encoder_attn_mask.shape[1], kv_valid=encoder_attn_mask)
        if encoder_attn_mask is not None else None
    )

    def layer_body(x, p, kv, sliding):
        mod = p["scale_shift_table"].astype(jnp.float32)[None] + \
            timestep_proj.astype(jnp.float32)          # [B, 6, H]
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            mod[:, j:j + 1, :].astype(dtype) for j in range(6)
        ]

        normed = rms_norm(x, p["self_attn_norm"], cfg.rms_norm_eps)
        normed = normed * (1.0 + scale_msa) + shift_msa
        if isinstance(sliding, bool):
            attn_fn = attn_sliding if sliding else attn_full
        else:  # traced per-layer flag (scan path)
            attn_fn = functools.partial(attn_select, sliding)
        x = x + _self_attention(
            p["self_attn"], cfg, normed, cos, sin, attn_fn, axis_name) * gate_msa

        normed = rms_norm(x, p["cross_attn_norm"], cfg.rms_norm_eps)
        x = x + _cross_attention(p["cross_attn"], cfg, normed, kv, cross_mask, axis_name)

        normed = rms_norm(x, p["mlp_norm"], cfg.rms_norm_eps)
        normed = normed * (1.0 + c_scale) + c_shift
        x = x + _mlp(p["mlp"], normed, axis_name) * c_gate
        return x

    layers = params["layers"]
    if isinstance(layers, list):
        for i, p in enumerate(layers):
            x = layer_body(
                x, p, kv_list[i], cfg.layer_types[i] == "sliding_attention"
            )
    else:
        flags = [lt == "sliding_attention" for lt in cfg.layer_types]
        k_stack, v_stack = kv_list
        n_layers = len(flags)
        # whole-model Euler-step megakernel (ops/pallas/dit_mega.py): every
        # layer in ONE pallas_call, weights streamed through an in-kernel DMA
        # pipeline — opt-in while hardware-gated (ACESTEP_TPU_DIT_MEGA=1),
        # falls back here whenever supported() declines
        import os as _os

        if (_os.environ.get("ACESTEP_TPU_DIT_MEGA", "0") == "1"
                and axis_name is None and b == 1 and attn_mask is None):
            from acestep_tpu.ops.pallas import dit_mega as _dm

            if _dm.supported(layers, cfg, b, tp, k_stack.shape[3]):
                if encoder_attn_mask is not None:
                    encm = jnp.where(encoder_attn_mask.astype(bool),
                                     0.0, -1e30).astype(jnp.float32)
                else:
                    encm = jnp.zeros((1, k_stack.shape[3]), jnp.float32)
                on_tpu = jax.default_backend() in ("tpu", "axon")
                x = _dm.dit_layers_mega(
                    layers, cfg, x.astype(jnp.float32), k_stack, v_stack,
                    timestep_proj.astype(jnp.float32),
                    cos.astype(jnp.float32), sin.astype(jnp.float32),
                    flags, encm, interpret=not on_tpu,
                ).astype(dtype)
                return _finalize_output(params, cfg, x, temb, dtype, t_len,
                                        patch)
        # big quantized kernels leave the scan xs and stream by traced layer
        # index instead (ops.qlinear.StackedWeight -> scalar-prefetch kernel):
        # scan-xs weight slices otherwise materialize an HBM copy of every
        # layer's quantized weights on EVERY diffusion step
        from acestep_tpu.ops import qlinear as _ql

        use_sw = _ql.use_stacked_weights(layers, default=True)
        if use_sw:
            layers_xs, big_w = _ql.split_stacked_weights(layers)
        else:
            layers_xs, big_w = layers, []
        period = _pattern_period(flags)
        if period is not None and period <= n_layers:
            # scan over GROUPS of `period` layers with STATIC sliding flags
            # (no lax.cond; the attention variant per sub-layer is fixed)
            n_groups = n_layers // period
            g_layers = _group_stacked(layers_xs, n_groups, period)
            g_k = _group_stacked(k_stack, n_groups, period)
            g_v = _group_stacked(v_stack, n_groups, period)

            def scan_body(x, xs):
                gi, pg, kg, vg = xs
                for j in range(period):
                    p = _index_tree(pg, j)
                    if use_sw:
                        p = _ql.rebuild_layer_params(p, big_w, gi * period + j)
                    x = layer_body(x, p, (kg[j], vg[j]), flags[j])
                return x, None

            x, _ = jax.lax.scan(
                scan_body, x,
                (jnp.arange(n_groups, dtype=jnp.int32), g_layers, g_k, g_v),
            )
        else:
            # irregular pattern: traced flag + runtime select
            sliding_flags = jnp.asarray(flags)

            def scan_body(x, xs):
                li, p, k_l, v_l, flag = xs
                if use_sw:
                    p = _ql.rebuild_layer_params(p, big_w, li)
                return layer_body(x, p, (k_l, v_l), flag), None

            x, _ = jax.lax.scan(
                scan_body, x,
                (jnp.arange(n_layers, dtype=jnp.int32), layers_xs,
                 k_stack, v_stack, sliding_flags),
            )

    return _finalize_output(params, cfg, x, temb, dtype, t_len, patch)


def _finalize_output(params, cfg, x, temb, dtype, t_len: int, patch: int):
    """Output AdaLN (2-col table) + unpatchify (convtranspose1d stride=patch)."""
    b, tp, _ = x.shape
    out_mod = params["out_scale_shift_table"].astype(jnp.float32)[None] + \
        temb.astype(jnp.float32)[:, None, :]
    out_shift = out_mod[:, 0:1, :].astype(dtype)
    out_scale = out_mod[:, 1:2, :].astype(dtype)
    x = rms_norm(x, params["norm_out"], cfg.rms_norm_eps) * (1.0 + out_scale) + out_shift

    y = linear(x, params["proj_out"]["kernel"])        # [B, Tp, patch*audio]
    y = y.reshape(b, tp * patch, cfg.audio_acoustic_hidden_dim)
    y = y + params["proj_out"]["bias"].astype(y.dtype)
    return y[:, :t_len, :]


# ---------------------------------------------------------------------------
# conditioning encoders
# ---------------------------------------------------------------------------

def _encoder_stack(
    layers,
    cfg: DiTConfig,
    x: jax.Array,
    valid: Optional[jax.Array],
    axis_name: Optional[str] = None,
) -> jax.Array:
    l = x.shape[1]
    dtype = x.dtype
    cos, sin = rope_cos_sin(jnp.arange(l), cfg.head_dim, base=cfg.rope_theta)
    cos = cos.astype(dtype)
    sin = sin.astype(dtype)
    attn_sliding, attn_full, attn_select = _make_self_attn_fns(cfg, l, valid)

    def body(x, p, attn_fn):
        xn = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        x = x + _self_attention(p["self_attn"], cfg, xn, cos, sin, attn_fn, axis_name)
        hn = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        return x + _mlp(p["mlp"], hn, axis_name)

    if isinstance(layers, list):
        for i, p in enumerate(layers):
            sliding = i < len(cfg.layer_types) and cfg.layer_types[i] == "sliding_attention"
            x = body(x, p, attn_sliding if sliding else attn_full)
        return x

    n = _num_layers(layers)
    flag_list = [
        i < len(cfg.layer_types) and cfg.layer_types[i] == "sliding_attention"
        for i in range(n)
    ]
    period = _pattern_period(flag_list)
    if period is not None and period <= n:
        n_groups = n // period
        g_layers = _group_stacked(layers, n_groups, period)

        def scan_body(x, pg):
            for j in range(period):
                x = body(x, _index_tree(pg, j),
                         attn_sliding if flag_list[j] else attn_full)
            return x, None

        x, _ = jax.lax.scan(scan_body, x, g_layers)
        return x

    flags = jnp.asarray(flag_list)

    def scan_body(x, xs):
        p, flag = xs
        return body(x, p, functools.partial(attn_select, flag)), None

    x, _ = jax.lax.scan(scan_body, x, (layers, flags))
    return x


def lyric_encoder(
    params: Params,
    cfg: DiTConfig,
    lyric_hidden_states: jax.Array,          # [B, L, text_hidden] (token embeddings)
    lyric_mask: Optional[jax.Array] = None,  # [B, L]
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Project + encode lyric token embeddings -> [B, L, H]."""
    p = params["lyric_embed"]
    x = linear(lyric_hidden_states, p["kernel"], p.get("bias"))
    x = _encoder_stack(params["lyric_layers"], cfg, x, lyric_mask, axis_name)
    return rms_norm(x, params["lyric_norm"], cfg.rms_norm_eps)


def timbre_encoder(
    params: Params,
    cfg: DiTConfig,
    refer_latents: jax.Array,                # [B, L, 64] refer-audio acoustic latents
    refer_mask: Optional[jax.Array] = None,  # [B, L]
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Encode one refer-audio clip -> a single timbre token [B, 1, H]
    (first output position; dit_model.cpp:1738)."""
    p = params["timbre_embed"]
    x = linear(refer_latents, p["kernel"], p.get("bias"))
    special = params.get("timbre_special_token")
    if special is not None:
        tok = jnp.broadcast_to(
            special.astype(x.dtype)[None, None, :], (x.shape[0], 1, x.shape[2])
        )
        x = jnp.concatenate([tok, x], axis=1)
        if refer_mask is not None:
            refer_mask = jnp.concatenate(
                [jnp.ones((x.shape[0], 1), refer_mask.dtype), refer_mask], axis=1
            )
    x = _encoder_stack(params["timbre_layers"], cfg, x, refer_mask, axis_name)
    x = rms_norm(x, params["timbre_norm"], cfg.rms_norm_eps)
    return x[:, :1, :]


def text_projector(params: Params, style_hidden: jax.Array) -> jax.Array:
    """Style branch: text-encoder hidden states -> DiT hidden size
    (acestep_ggml.cpp:2425-2438)."""
    return linear(style_hidden, params["text_projector"]["kernel"])
