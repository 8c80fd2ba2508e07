"""Param-tree quantization: walk a model pytree and quantize linear kernels.

The converter-ahead-of-time design replaces the reference's slow on-load
requantization (Q4_K load cost 107 s+, BASELINE.md notes) — quantization happens
once here (numpy, host-side) and the packed arrays land directly in HBM.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .formats import QuantTensor, quantize_np, supported_format_for

# kernels smaller than this stay in bf16 — quant overhead dominates below it
MIN_QUANT_ELEMS = 64 * 1024


def default_policy(path: str, arr) -> bool:
    """Quantize 2-D matmul kernels only; skip norms, biases, tables, embeddings.

    The reference applies the same policy: ggml quantizes ``*_proj.weight`` style
    2-D mats and keeps norms/biases f32 (acestep_ggml/cpp/acestep_dit_model.cpp
    on-load quantize path).
    """
    if getattr(arr, "ndim", 0) != 2:
        return False
    if arr.size < MIN_QUANT_ELEMS:
        return False
    leaf = path.rsplit("/", 1)[-1]
    if leaf != "kernel":
        return False
    if "embed_tokens" in path or "norm" in path:
        return False
    return True


def quantize_tree(
    params: Any,
    fmt: str,
    policy: Callable[[str, Any], bool] = default_policy,
    path: str = "",
) -> Any:
    """Recursively quantize a param pytree (dicts/lists of arrays) to ``fmt``."""
    if fmt in ("f32", "bf16", "f16"):
        return params
    if isinstance(params, dict):
        return {
            k: quantize_tree(v, fmt, policy, f"{path}/{k}") for k, v in params.items()
        }
    if isinstance(params, (list, tuple)):
        out = [
            quantize_tree(v, fmt, policy, f"{path}/{i}") for i, v in enumerate(params)
        ]
        return type(params)(out)
    if isinstance(params, QuantTensor) or params is None:
        return params
    arr = params
    if policy(path, arr):
        k = arr.shape[0]
        eff = supported_format_for(k, fmt)
        if eff in ("f32", "bf16", "f16"):
            return arr
        return quantize_np(np.asarray(arr, dtype=np.float32), eff)
    return arr


def tree_nbytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
