"""Checkpoint loading: reference safetensors -> our param trees (+ optional quant).

Converter-ahead-of-time design (replaces the reference's GGUF export +
on-load-requantize path, export_safetensors_to_gguf.py / dit_model.cpp:156-192):
convert once on host, save to the native sharded format, load instantly.

Name mappings are taken from the reference loaders:
  * DiT      — acestep_ggml/cpp/acestep_dit_model.cpp:788-1100
  * VAE      — acestep_ggml/cpp/acestep_vae_model.cpp:880-950 (weight-norm folding
               :520-589: w = v * g / ||v||_dim0)
  * Qwen3    — HF transformers state_dict names

Layout transforms (torch -> our kernel layout):
  Linear   [out, in]        -> [in, out]            (transpose)
  Conv1d   [out, in, k]     -> [k, in, out]         (transpose(2, 1, 0))
  ConvT1d  [in, out, k]     -> [k, in, out] reversed (transpose(2, 0, 1)[::-1])
  patchify Conv1d stride=p  -> linear [p*C, H]      (transpose(2, 1, 0).reshape)
  unpatch  ConvT1d stride=p -> linear [H, p*A]      (transpose(0, 2, 1).reshape)
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from acestep_tpu.config import DiTConfig, QwenConfig, VAEConfig
from acestep_tpu.quant import QuantTensor, quantize_np, supported_format_for
from acestep_tpu.quant.convert import MIN_QUANT_ELEMS
from acestep_tpu.utils.safetensors_io import SafetensorsFile, save_safetensors

TensorGetter = Callable[[str], np.ndarray]


def _getter(src) -> TensorGetter:
    if isinstance(src, SafetensorsFile):
        return lambda name: src.tensor(name, as_f32=True)
    if isinstance(src, dict):
        return lambda name: np.asarray(src[name], dtype=np.float32)
    raise TypeError(f"unsupported tensor source: {type(src)}")


def _has(src, name: str) -> bool:
    if isinstance(src, SafetensorsFile):
        return name in src.header
    return name in src


def _maybe_quant(w: np.ndarray, fmt: Optional[str], dtype):
    """w already in kernel layout [K, N]; uses the native C++ quantizer when built
    (the host numpy path is ~20x slower on the weak conversion CPUs)."""
    if fmt and w.ndim == 2 and w.size >= MIN_QUANT_ELEMS:
        eff = supported_format_for(w.shape[0], fmt)
        if eff not in ("f32", "bf16", "f16"):
            from acestep_tpu.quant.native_bridge import quantize_native

            return quantize_native(w, eff)
    return jnp.asarray(w, dtype)


def _linear(get, name: str, fmt, dtype, bias_name: Optional[str] = None, src=None):
    out = {"kernel": _maybe_quant(get(name).T.copy(), fmt, dtype)}
    if bias_name and src is not None and _has(src, bias_name):
        out["bias"] = jnp.asarray(get(bias_name), dtype)
    return out


# ---------------------------------------------------------------------------
# Qwen3 (text encoder / LM)
# ---------------------------------------------------------------------------

def load_qwen(src, cfg: QwenConfig, quant: Optional[str] = None,
              dtype=jnp.bfloat16, prefix: str = "") -> Dict[str, Any]:
    get = _getter(src)

    def pick(*names):
        for n in names:
            if _has(src, prefix + n):
                return prefix + n
        raise KeyError(f"none of {names} found (prefix={prefix!r})")

    emb_name = pick("model.embed_tokens.weight", "embed_tokens.weight")
    base = emb_name.rsplit("embed_tokens.weight", 1)[0]

    def lin(n):
        return {"kernel": _maybe_quant(get(n).T.copy(), quant, dtype)}

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"{base}layers.{i}."
        layers.append({
            "input_norm": jnp.asarray(get(p + "input_layernorm.weight"), dtype),
            "q_proj": lin(p + "self_attn.q_proj.weight"),
            "k_proj": lin(p + "self_attn.k_proj.weight"),
            "v_proj": lin(p + "self_attn.v_proj.weight"),
            "o_proj": lin(p + "self_attn.o_proj.weight"),
            "q_norm": jnp.asarray(get(p + "self_attn.q_norm.weight"), dtype),
            "k_norm": jnp.asarray(get(p + "self_attn.k_norm.weight"), dtype),
            "post_norm": jnp.asarray(get(p + "post_attention_layernorm.weight"), dtype),
            "gate_proj": lin(p + "mlp.gate_proj.weight"),
            "up_proj": lin(p + "mlp.up_proj.weight"),
            "down_proj": lin(p + "mlp.down_proj.weight"),
        })

    params = {
        "embed_tokens": jnp.asarray(get(emb_name), dtype),
        "layers": layers,
        "norm": jnp.asarray(get(base + "norm.weight"), dtype),
    }
    lm_head = prefix + "lm_head.weight"
    if _has(src, lm_head) and not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": _maybe_quant(get(lm_head).T.copy(), quant, dtype)}
    return params


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

def _attn(get, p: str, fmt, dtype):
    def lin(n):
        return {"kernel": _maybe_quant(get(p + n).T.copy(), fmt, dtype)}
    return {
        "q_proj": lin("q_proj.weight"),
        "k_proj": lin("k_proj.weight"),
        "v_proj": lin("v_proj.weight"),
        "o_proj": lin("o_proj.weight"),
        "q_norm": jnp.asarray(get(p + "q_norm.weight"), dtype),
        "k_norm": jnp.asarray(get(p + "k_norm.weight"), dtype),
    }


def _mlp(get, p: str, fmt, dtype):
    def lin(n):
        return {"kernel": _maybe_quant(get(p + n).T.copy(), fmt, dtype)}
    return {
        "gate_proj": lin("gate_proj.weight"),
        "up_proj": lin("up_proj.weight"),
        "down_proj": lin("down_proj.weight"),
    }


def _encoder_layer(get, p: str, cfg, fmt, dtype):
    return {
        "input_norm": jnp.asarray(get(p + "input_layernorm.weight"), dtype),
        "self_attn": _attn(get, p + "self_attn.", fmt, dtype),
        "post_norm": jnp.asarray(get(p + "post_attention_layernorm.weight"), dtype),
        "mlp": _mlp(get, p + "mlp.", fmt, dtype),
    }


def _timestep_embed(get, p: str, fmt, dtype, src):
    return {
        "linear_1": _linear(get, p + "linear_1.weight", None, dtype, p + "linear_1.bias", src),
        "linear_2": _linear(get, p + "linear_2.weight", None, dtype, p + "linear_2.bias", src),
        "time_proj": _linear(get, p + "time_proj.weight", fmt, dtype, p + "time_proj.bias", src),
    }


def load_dit(src, cfg: DiTConfig, quant: Optional[str] = None,
             dtype=jnp.bfloat16) -> Dict[str, Any]:
    get = _getter(src)
    fmt = quant

    # patchify conv1d [H, C, p] -> [p*C, H] (dit_model.cpp:334-411 repack)
    w_in = get("decoder.proj_in.1.weight")
    proj_in = {
        "kernel": _maybe_quant(
            w_in.transpose(2, 1, 0).reshape(-1, w_in.shape[0]).copy(), fmt, dtype),
        "bias": jnp.asarray(get("decoder.proj_in.1.bias"), dtype),
    }
    # unpatchify convtranspose1d [H, A, p] -> [H, p*A] (dit_model.cpp:413-490)
    w_out = get("decoder.proj_out.1.weight")
    proj_out = {
        "kernel": _maybe_quant(
            w_out.transpose(0, 2, 1).reshape(w_out.shape[0], -1).copy(), fmt, dtype),
        "bias": jnp.asarray(get("decoder.proj_out.1.bias"), dtype),
    }

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"decoder.layers.{i}."
        layers.append({
            "self_attn_norm": jnp.asarray(get(p + "self_attn_norm.weight"), dtype),
            "self_attn": _attn(get, p + "self_attn.", fmt, dtype),
            "cross_attn_norm": jnp.asarray(get(p + "cross_attn_norm.weight"), dtype),
            "cross_attn": _attn(get, p + "cross_attn.", fmt, dtype),
            "mlp_norm": jnp.asarray(get(p + "mlp_norm.weight"), dtype),
            "mlp": _mlp(get, p + "mlp.", fmt, dtype),
            "scale_shift_table": jnp.asarray(
                get(p + "scale_shift_table").reshape(6, -1), dtype),
        })

    params = {
        "proj_in": proj_in,
        "time_embed": _timestep_embed(get, "decoder.time_embed.", None, dtype, src),
        "time_embed_r": _timestep_embed(get, "decoder.time_embed_r.", None, dtype, src),
        "condition_embedder": _linear(
            get, "decoder.condition_embedder.weight", fmt, dtype,
            "decoder.condition_embedder.bias", src),
        "layers": layers,
        "norm_out": jnp.asarray(get("decoder.norm_out.weight"), dtype),
        "out_scale_shift_table": jnp.asarray(
            get("decoder.scale_shift_table").reshape(2, -1), dtype),
        "proj_out": proj_out,
    }

    if _has(src, "encoder.text_projector.weight"):
        params["text_projector"] = _linear(
            get, "encoder.text_projector.weight", fmt, dtype)
    if _has(src, "encoder.lyric_encoder.embed_tokens.weight"):
        params["lyric_embed"] = _linear(
            get, "encoder.lyric_encoder.embed_tokens.weight", fmt, dtype,
            "encoder.lyric_encoder.embed_tokens.bias", src)
        params["lyric_layers"] = [
            _encoder_layer(get, f"encoder.lyric_encoder.layers.{i}.", cfg, fmt, dtype)
            for i in range(cfg.num_lyric_encoder_hidden_layers)
        ]
        params["lyric_norm"] = jnp.asarray(get("encoder.lyric_encoder.norm.weight"), dtype)
    if _has(src, "encoder.timbre_encoder.embed_tokens.weight"):
        params["timbre_embed"] = _linear(
            get, "encoder.timbre_encoder.embed_tokens.weight", None, dtype,
            "encoder.timbre_encoder.embed_tokens.bias", src)
        params["timbre_layers"] = [
            _encoder_layer(get, f"encoder.timbre_encoder.layers.{i}.", cfg, fmt, dtype)
            for i in range(cfg.num_timbre_encoder_hidden_layers)
        ]
        params["timbre_norm"] = jnp.asarray(get("encoder.timbre_encoder.norm.weight"), dtype)
        if _has(src, "encoder.timbre_encoder.special_token"):
            params["timbre_special_token"] = jnp.asarray(
                get("encoder.timbre_encoder.special_token").reshape(-1), dtype)
    return params


# ---------------------------------------------------------------------------
# VAE (diffusers AutoencoderOobleck, weight-norm folded)
# ---------------------------------------------------------------------------

def _fold_weight_norm(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """w = v * g / ||v|| with the norm over dims (1, 2) per dim-0 slice
    (vae_model.cpp:520-589; matches torch.nn.utils.weight_norm dim=0)."""
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(1, 2), keepdims=True) + 1e-12)
    return (v * (g.reshape(-1, 1, 1) / norm)).astype(np.float32)


def _vae_conv(get, src, prefix: str, transposed: bool, dtype, with_bias=True):
    if _has(src, prefix + ".weight_v"):
        w = _fold_weight_norm(get(prefix + ".weight_v"), get(prefix + ".weight_g"))
    else:
        w = get(prefix + ".weight")
    if transposed:  # torch [in, out, k] -> reversed [k, in, out]
        w = w.transpose(2, 0, 1)[::-1].copy()
    else:           # torch [out, in, k] -> [k, in, out]
        w = w.transpose(2, 1, 0).copy()
    out = {"w": jnp.asarray(w, dtype)}
    if with_bias and _has(src, prefix + ".bias"):
        out["b"] = jnp.asarray(get(prefix + ".bias"), dtype)
    return out


def _vae_snake(get, prefix: str, dtype):
    return {
        "alpha": jnp.asarray(get(prefix + ".alpha").reshape(-1), dtype),
        "beta": jnp.asarray(get(prefix + ".beta").reshape(-1), dtype),
    }


def _res_unit(get, src, prefix: str, dtype):
    return {
        "snake1": _vae_snake(get, prefix + ".snake1", dtype),
        "conv1": _vae_conv(get, src, prefix + ".conv1", False, dtype),
        "snake2": _vae_snake(get, prefix + ".snake2", dtype),
        "conv2": _vae_conv(get, src, prefix + ".conv2", False, dtype),
    }


def load_vae(src, cfg: VAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
    get = _getter(src)

    enc_blocks = []
    for i in range(len(cfg.downsampling_ratios)):
        p = f"encoder.block.{i}"
        enc_blocks.append({
            "res1": _res_unit(get, src, p + ".res_unit1", dtype),
            "res2": _res_unit(get, src, p + ".res_unit2", dtype),
            "res3": _res_unit(get, src, p + ".res_unit3", dtype),
            "snake1": _vae_snake(get, p + ".snake1", dtype),
            "conv1": _vae_conv(get, src, p + ".conv1", False, dtype),
        })
    dec_blocks = []
    for i in range(len(cfg.upsampling_ratios)):
        p = f"decoder.block.{i}"
        dec_blocks.append({
            "snake1": _vae_snake(get, p + ".snake1", dtype),
            "conv_t1": _vae_conv(get, src, p + ".conv_t1", True, dtype),
            "res1": _res_unit(get, src, p + ".res_unit1", dtype),
            "res2": _res_unit(get, src, p + ".res_unit2", dtype),
            "res3": _res_unit(get, src, p + ".res_unit3", dtype),
        })
    return {
        "encoder": {
            "conv1": _vae_conv(get, src, "encoder.conv1", False, dtype),
            "blocks": enc_blocks,
            "snake1": _vae_snake(get, "encoder.snake1", dtype),
            "conv2": _vae_conv(get, src, "encoder.conv2", False, dtype),
        },
        "decoder": {
            "conv1": _vae_conv(get, src, "decoder.conv1", False, dtype),
            "blocks": dec_blocks,
            "snake1": _vae_snake(get, "decoder.snake1", dtype),
            "conv2": _vae_conv(get, src, "decoder.conv2", False, dtype, with_bias=False),
        },
    }


# ---------------------------------------------------------------------------
# native converted format: param tree <-> safetensors + manifest
# ---------------------------------------------------------------------------

def _flatten(tree: Any, path: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{path}/{k}" if path else k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{path}/{i}"))
    else:
        out[path] = tree
    return out


def save_params(path: str, params: Any, metadata: Optional[Dict[str, str]] = None) -> None:
    """Serialize a param tree (incl. QuantTensors) to <path>.safetensors + .json."""
    # one batched device->host transfer up front: per-leaf np.asarray fetches
    # stack one tunnel roundtrip per array on remote-device backends
    params = jax.device_get(params)
    flat = _flatten(params)
    tensors: Dict[str, np.ndarray] = {}
    dtype_map: Dict[str, str] = {}
    manifest: Dict[str, Any] = {"leaves": {}}
    for name, leaf in flat.items():
        if isinstance(leaf, QuantTensor):
            entry = {"type": "quant", "fmt": leaf.fmt, "shape": list(leaf.shape), "fields": []}
            for f in ("data", "data_hi", "scales", "sub_scales", "sub_mins", "super_scales", "super_mins"):
                a = getattr(leaf, f)
                if a is not None:
                    arr = np.asarray(a)
                    if arr.dtype == jnp.bfloat16:
                        from acestep_tpu.utils.safetensors_io import f32_to_bf16_raw
                        arr = f32_to_bf16_raw(arr.astype(np.float32))
                        entry.setdefault("bf16_fields", []).append(f)
                        dtype_map[f"{name}#{f}"] = "BF16"
                    tensors[f"{name}#{f}"] = arr
                    entry["fields"].append(f)
            manifest["leaves"][name] = entry
        elif leaf is None:
            continue
        else:
            arr = np.asarray(leaf)
            dt = str(leaf.dtype) if hasattr(leaf, "dtype") else str(arr.dtype)
            if dt == "bfloat16":
                from acestep_tpu.utils.safetensors_io import f32_to_bf16_raw
                tensors[name] = f32_to_bf16_raw(np.asarray(leaf, dtype=np.float32))
                dtype_map[name] = "BF16"
                manifest["leaves"][name] = {"type": "bf16"}
            else:
                tensors[name] = arr
                manifest["leaves"][name] = {"type": "array"}
    save_safetensors(path + ".safetensors", tensors, metadata or {}, dtype_map)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)


def load_params(path: str) -> Any:
    """Load a param tree saved by save_params."""
    from acestep_tpu.utils.safetensors_io import bf16_to_f32

    st = SafetensorsFile(path + ".safetensors")
    with open(path + ".json") as f:
        manifest = json.load(f)

    flat: Dict[str, Any] = {}
    for name, entry in manifest["leaves"].items():
        if entry["type"] == "quant":
            kw = {}
            bf16_fields = set(entry.get("bf16_fields", []))
            for f_name in entry["fields"]:
                arr = st.tensor(f"{name}#{f_name}")
                if f_name in bf16_fields:
                    arr = jnp.asarray(bf16_to_f32(arr)).astype(jnp.bfloat16)
                else:
                    arr = jnp.asarray(arr)
                kw[f_name] = arr
            flat[name] = QuantTensor(fmt=entry["fmt"], shape=tuple(entry["shape"]), **kw)
        elif entry["type"] == "bf16":
            flat[name] = jnp.asarray(bf16_to_f32(st.tensor(name))).astype(jnp.bfloat16)
        else:
            flat[name] = jnp.asarray(st.tensor(name))

    # unflatten
    root: Dict[str, Any] = {}
    for name, leaf in flat.items():
        parts = name.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)
