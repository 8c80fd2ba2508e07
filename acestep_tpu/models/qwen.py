"""Qwen3 transformer in pure functional JAX.

Serves two roles in the stack (mirroring the reference):
  * text encoder — Qwen3-Embedding-0.6B full-sequence causal forward producing the
    style/lyric hidden states (acestep_ggml/cpp/qwen_model.cpp:528-695,
    acestep/handler.py:766-769);
  * LM planner backbone — acestep-5Hz-lm-{0.6B,1.7B,4B} Qwen3 fine-tunes
    (decode loop lives in acestep_tpu/serving).

Architecture per layer: RMSNorm -> GQA attention with per-head q/k RMSNorm +
NEOX RoPE -> residual -> RMSNorm -> SwiGLU MLP -> residual; final RMSNorm.

Params are a plain pytree; every ``*_proj`` kernel is stored ``[K, N]`` and may be
a QuantTensor (see acestep_tpu.quant).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from acestep_tpu.config import QwenConfig
from acestep_tpu.ops import (
    apply_rope,
    attention,
    linear,
    make_attention_mask,
    rms_norm,
    rope_cos_sin,
)

Params = Dict[str, Any]


def init_params(
    key: jax.Array, cfg: QwenConfig, dtype=jnp.bfloat16, scale: float = 0.02,
    sampler=None,
) -> Params:
    """Random-init params (used for tests/benches; real weights come from the converter).
    ``sampler(shape) -> f32 array`` overrides jax.random (fast numpy host init)."""
    normal = (lambda k, s: sampler(s)) if sampler is not None else (
        lambda k, s: jax.random.normal(k, s, jnp.float32))
    h, hd = cfg.hidden_size, cfg.head_dim
    nh, nkv, inter = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.intermediate_size
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)

    from acestep_tpu.utils import np_astype_fast

    def dense(k, kk, n):
        return {"kernel": np_astype_fast(normal(k, (kk, n)) * scale, dtype)}

    def layer(k):
        ks = jax.random.split(k, 7)
        return {
            "input_norm": jnp.ones((h,), dtype),
            "q_proj": dense(ks[0], h, nh * hd),
            "k_proj": dense(ks[1], h, nkv * hd),
            "v_proj": dense(ks[2], h, nkv * hd),
            "o_proj": dense(ks[3], nh * hd, h),
            "q_norm": jnp.ones((hd,), dtype),
            "k_norm": jnp.ones((hd,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "gate_proj": dense(ks[4], h, inter),
            "up_proj": dense(ks[5], h, inter),
            "down_proj": dense(ks[6], inter, h),
        }

    return {
        "embed_tokens": np_astype_fast(normal(keys[0], (cfg.vocab_size, h)) * scale, dtype),
        "layers": [layer(keys[i + 1]) for i in range(cfg.num_hidden_layers)],
        "norm": jnp.ones((h,), dtype),
    }


def attention_block(
    p: Params,
    cfg: QwenConfig,
    x: jax.Array,                    # [B, L, H]
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    axis_name: Optional[str] = None,
) -> jax.Array:
    b, l, _ = x.shape
    hd = cfg.head_dim
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads

    if "qkv_proj" in p:              # serving-fused q||k||v (one weight stream);
        # under TP the fusion is rank-major, so the per-shard split with the
        # LOCAL head counts is exact (parallel/lm_tp.py fuse path)
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
    out = attention(q, k, v, mask=mask)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    if axis_name is not None:
        from acestep_tpu.parallel.collective_matmul import row_parallel_linear

        return row_parallel_linear(out, p["o_proj"]["kernel"], axis_name)
    return linear(out, p["o_proj"]["kernel"])


def mlp_block(p: Params, x: jax.Array, axis_name: Optional[str] = None) -> jax.Array:
    """SwiGLU MLP.  Under tensor parallelism (``axis_name`` set inside a
    shard_map) gate/up are column-sharded and down_proj row-sharded, so the
    down_proj output is a partial sum -> one psum per MLP (Megatron layout;
    the reference hand-codes the same all-reduce in nano-vllm
    linear.py:126-152)."""
    if "gateup_proj" in p:        # serving-fused gate||up (one weight stream)
        gu = linear(x, p["gateup_proj"]["kernel"])
        inter = gu.shape[-1] // 2
        gate, up = gu[..., :inter], gu[..., inter:]
    else:
        gate = linear(x, p["gate_proj"]["kernel"])
        up = linear(x, p["up_proj"]["kernel"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    if axis_name is not None:
        from acestep_tpu.parallel.collective_matmul import row_parallel_linear

        return row_parallel_linear(act, p["down_proj"]["kernel"], axis_name)
    return linear(act, p["down_proj"]["kernel"])


def stack_params(params: Params) -> Params:
    """Stack the layer list along a leading axis for the scan path (compiles ONE
    layer body instead of num_hidden_layers copies — fast jit for 28-layer LMs)."""
    if isinstance(params.get("layers"), list):
        params = dict(params)
        params["layers"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params["layers"]
        )
    return params


def forward(
    params: Params,
    cfg: QwenConfig,
    token_ids: jax.Array,                    # [B, L] int32
    attn_mask: Optional[jax.Array] = None,   # [B, L] 1=valid
    *,
    causal: bool = True,
    num_layers: Optional[int] = None,
    final_norm: bool = True,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Full-sequence forward -> hidden states [B, L, H]."""
    b, l = token_ids.shape
    x = params["embed_tokens"][token_ids]

    positions = jnp.arange(l)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, base=cfg.rope_theta)
    mask = make_attention_mask(l, l, kv_valid=attn_mask, causal=causal)

    def layer_body(x, p):
        h = x + attention_block(
            p, cfg, rms_norm(x, p["input_norm"], cfg.rms_norm_eps), cos, sin,
            mask, axis_name,
        )
        return h + mlp_block(p, rms_norm(h, p["post_norm"], cfg.rms_norm_eps),
                             axis_name=axis_name)

    layers = params["layers"]
    if isinstance(layers, list):
        n = len(layers) if num_layers is None else num_layers
        for p in layers[:n]:
            x = layer_body(x, p)
        full = num_layers is None or num_layers == len(layers)
    else:
        assert num_layers is None, "num_layers not supported with stacked params"
        x, _ = jax.lax.scan(lambda c, p: (layer_body(c, p), None), x, layers)
        full = True

    if final_norm and full:
        x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x


def embeddings_only(params: Params, token_ids: jax.Array) -> jax.Array:
    """Embedding lookup only — the reference feeds raw embeddings to the DiT lyric
    encoder (acestep_ggml/cpp/qwen_model.cpp:680-695)."""
    return params["embed_tokens"][token_ids]


def lm_logits(
    params: Params, cfg: QwenConfig, hidden: jax.Array,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Project final hidden states to vocab logits (tied embeddings by default).

    Under tensor parallelism the quantized ``lm_head`` is column-sharded over
    the vocab (nano-vllm embed_head.py ParallelLMHead analog): each shard
    computes its vocab slice and the full logits are re-assembled with a tiled
    all_gather (vocab order is preserved because the shards are contiguous
    column blocks)."""
    head = params.get("lm_head")
    if head is not None:
        logits = linear(hidden, head["kernel"])
        if axis_name is not None:
            from acestep_tpu.parallel.collective_matmul import (
                allgather_chunks, collective_matmul_enabled)

            if collective_matmul_enabled():
                # ring all-gather of the per-rank vocab chunks: n-1 ppermute
                # hops that XLA's latency-hiding scheduler can overlap with
                # the sampler's softmax prologue, vs one blocking all-gather
                logits = allgather_chunks(logits, axis_name)
            else:
                logits = jax.lax.all_gather(
                    logits, axis_name, axis=logits.ndim - 1, tiled=True)
        # serving pads the head's vocab axis to a lane multiple (serving/lm.py
        # ensure_quantized_head); drop the pad columns
        if logits.shape[-1] != cfg.vocab_size:
            logits = logits[..., : cfg.vocab_size]
        return logits
    emb = params["embed_tokens"]
    return jnp.dot(
        hidden.astype(jnp.bfloat16),
        emb.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
