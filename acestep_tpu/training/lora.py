"""LoRA adapters: init, apply/merge, and flow-matching LoRA training.

Analog of the reference LoRA stack (acestep/training/lora_utils.py:83-198 PEFT
injection, acestep/core/lora/ runtime manager, trainer.py LoRATrainer):

  * a LoRA tree mirrors the param tree, holding {"a": [K, r], "b": [r, N]} at
    each targeted kernel path; effective weight W = W0 + (alpha/r) * a @ b;
  * training keeps the base params frozen (grads flow only through the LoRA
    tree; the reference requires the non-quantized DiT preset for training,
    handler.switch_to_training_preset — same here: fp base for training);
  * inference-time merge works on quantized bases too: dequantize -> add ->
    requantize (the runtime load/unload/scale manager equivalent).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from acestep_tpu.config import DiTConfig
from acestep_tpu.quant import QuantTensor, dequantize, quantize_jax

# default targets: every attention / MLP projection (lora_utils.py target_modules)
DEFAULT_TARGETS = re.compile(
    r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)/kernel$"
)


def _walk(tree: Any, fn: Callable[[str, Any], Any], path: str = "") -> Any:
    if isinstance(tree, dict):
        return {k: _walk(v, fn, f"{path}/{k}") for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_walk(v, fn, f"{path}/{i}") for i, v in enumerate(tree))
    return fn(path, tree)


def init_lora(
    key: jax.Array,
    params: Any,
    rank: int = 16,
    targets: re.Pattern = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Any:
    """Build a LoRA tree matching ``params``: a ~ N(0, 1/r) init, b = 0
    (standard LoRA init: the adapter starts as a no-op)."""
    counter = [0]

    def make(path: str, leaf):
        if targets.search(path) is None:
            return None
        if isinstance(leaf, QuantTensor):
            k, n = leaf.shape
        elif getattr(leaf, "ndim", 0) == 2:
            k, n = leaf.shape
        else:
            return None
        counter[0] += 1
        sub = jax.random.fold_in(key, counter[0])
        return {
            "a": (jax.random.normal(sub, (k, rank), jnp.float32) / rank).astype(dtype),
            "b": jnp.zeros((rank, n), dtype),
        }

    return _walk(params, make)


def lora_delta(lora_leaf: Dict[str, jax.Array], alpha: float, rank: int) -> jax.Array:
    return (alpha / rank) * (
        lora_leaf["a"].astype(jnp.float32) @ lora_leaf["b"].astype(jnp.float32)
    )


def apply_lora(params: Any, lora: Any, alpha: float = 16.0) -> Any:
    """Return params with LoRA deltas merged into each targeted kernel.

    fp kernels: W + delta (same dtype).  Quantized kernels: dequantize, add,
    requantize in the same format (inference-time merge; adds one requant noise
    floor, matching the reference's merge-into-quantized behavior)."""

    def merge(pp, ll):
        if ll is None or not (isinstance(ll, dict) and "a" in ll):
            return pp
        rank = ll["a"].shape[1]
        delta = lora_delta(ll, alpha, rank)
        if isinstance(pp, QuantTensor):
            w = dequantize(pp, jnp.float32) + delta
            return quantize_jax(w, pp.fmt)
        return (pp.astype(jnp.float32) + delta).astype(pp.dtype)

    def walk(pp, ll):
        if isinstance(pp, dict):
            # ll may be None or missing subtrees (adapters saved to disk drop
            # untargeted None leaves — loader round-trip keeps only real arrays)
            def sub(k):
                return ll.get(k) if isinstance(ll, dict) else None

            return {
                k: (merge(pp[k], sub(k)) if _is_lora_leaf(sub(k)) and _is_weight(pp[k])
                    else walk(pp[k], sub(k)))
                for k in pp
            }
        if isinstance(pp, (list, tuple)):
            return type(pp)(
                walk(v, ll[i] if isinstance(ll, (list, tuple)) and i < len(ll) else None)
                for i, v in enumerate(pp)
            )
        return pp

    def _is_lora_leaf(x):
        return isinstance(x, dict) and set(x.keys()) == {"a", "b"}

    def _is_weight(x):
        return isinstance(x, QuantTensor) or getattr(x, "ndim", 0) == 2

    return walk(params, lora)


def scale_lora(lora: Any, factor: float) -> Any:
    """Scale adapter strength (runtime manager's per-adapter scaling)."""

    def walk(t):
        if isinstance(t, dict):
            if set(t.keys()) == {"a", "b"}:
                return {"a": t["a"], "b": t["b"] * factor}
            return {k: walk(v) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v) for v in t)
        return t

    return walk(lora)


# ---------------------------------------------------------------------------
# LoRA flow-matching training
# ---------------------------------------------------------------------------

def make_lora_train_step(
    base_params: Any,
    cfg: DiTConfig,
    optimizer: optax.GradientTransformation,
    alpha: float = 16.0,
    shift: float = 3.0,
    jit: bool = True,
):
    """Training step over the LoRA tree only (base frozen); same flow-matching
    loss / NaN guard as the full trainer."""
    from acestep_tpu.training.flow_matching import flow_matching_loss

    def loss_fn(lora, base, batch, key):
        merged = apply_lora(base, lora, alpha)
        return flow_matching_loss(merged, cfg, batch, key, shift)

    def step_impl(lora, base, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(lora, base, batch, key)
        finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
        ))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_state = optimizer.update(grads, opt_state, lora)
        new_lora = optax.apply_updates(lora, updates)
        new_lora = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_lora, lora
        )
        return new_lora, new_state, loss

    # base params ride as a jit argument (not a closure constant in the HLO)
    run = jax.jit(step_impl) if jit else step_impl

    def step(lora, opt_state, batch, key):
        return run(lora, base_params, opt_state, batch, key)

    return step
