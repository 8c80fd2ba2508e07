"""LoKr adapters: Kronecker-product low-rank fine-tuning.

Analog of the reference's LyCORIS LoKr path (acestep/training/lokr_utils.py:48-183,
LoKRTrainer trainer.py:1180+): the weight delta is

    dW = alpha * kron(A, B),   A: [k1, n1], B: [k2, n2],  k1*k2 = K, n1*n2 = N

with B optionally low-rank factored (B = B1 @ B2).  Far fewer params than LoRA
at equal expressivity on big mats.  Init: A = small-normal, B = 0 (no-op start).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from acestep_tpu.config import DiTConfig
from acestep_tpu.quant import QuantTensor, dequantize, quantize_jax
from acestep_tpu.training.lora import DEFAULT_TARGETS, _walk


def _factor_dim(n: int, target: int) -> Tuple[int, int]:
    """Split n = a*b with a as close to `target` as possible (lokr factorization)."""
    best = (1, n)
    for a in range(1, int(n ** 0.5) + 1):
        if n % a == 0:
            if abs(a - target) < abs(best[0] - target):
                best = (a, n // a)
    return best


def init_lokr(
    key: jax.Array,
    params: Any,
    factor: int = 8,
    targets: re.Pattern = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Any:
    """LoKr tree: {"a": [k1, n1], "b": [k2, n2]} per targeted kernel."""
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
        k1, k2 = _factor_dim(k, factor)
        n1, n2 = _factor_dim(n, factor)
        counter[0] += 1
        sub = jax.random.fold_in(key, counter[0])
        return {
            "a": (jax.random.normal(sub, (k1, n1), jnp.float32) * 0.1).astype(dtype),
            "b": jnp.zeros((k2, n2), dtype),
        }

    return _walk(params, make)


def lokr_delta(leaf: Dict[str, jax.Array], alpha: float) -> jax.Array:
    a = leaf["a"].astype(jnp.float32)
    b = leaf["b"].astype(jnp.float32)
    return alpha * jnp.kron(a, b)


def apply_lokr(params: Any, lokr: Any, alpha: float = 1.0) -> Any:
    """Merge LoKr deltas into targeted kernels (quantized bases requantize)."""

    def _is_leaf(x):
        return isinstance(x, dict) and set(x.keys()) == {"a", "b"}

    def _is_weight(x):
        return isinstance(x, QuantTensor) or getattr(x, "ndim", 0) == 2

    def merge(pp, ll):
        delta = lokr_delta(ll, alpha)
        if isinstance(pp, QuantTensor):
            w = dequantize(pp, jnp.float32) + delta
            return quantize_jax(w, pp.fmt)
        return (pp.astype(jnp.float32) + delta).astype(pp.dtype)

    def walk(pp, ll):
        if isinstance(pp, dict):
            return {
                k: (merge(pp[k], ll.get(k)) if _is_leaf(ll.get(k)) and _is_weight(pp[k])
                    else walk(pp[k], ll.get(k) if isinstance(ll, dict) else None))
                for k in pp
            }
        if isinstance(pp, (list, tuple)):
            return type(pp)(
                walk(v, ll[i] if isinstance(ll, (list, tuple)) else None)
                for i, v in enumerate(pp)
            )
        return pp

    return walk(params, lokr)


def make_lokr_train_step(
    base_params: Any,
    cfg: DiTConfig,
    optimizer: optax.GradientTransformation,
    alpha: float = 1.0,
    shift: float = 3.0,
    jit: bool = True,
):
    """Flow-matching training over the LoKr tree (base frozen; NaN-guarded)."""
    from acestep_tpu.training.flow_matching import flow_matching_loss

    def loss_fn(lokr, base, batch, key):
        merged = apply_lokr(base, lokr, alpha)
        return flow_matching_loss(merged, cfg, batch, key, shift)

    def step_impl(lokr, base, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(lokr, base, batch, key)
        finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
        ))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_state = optimizer.update(grads, opt_state, lokr)
        new_lokr = optax.apply_updates(lokr, updates)
        new_lokr = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), new_lokr, lokr
        )
        return new_lokr, new_state, loss

    run = jax.jit(step_impl) if jit else step_impl

    def step(lokr, opt_state, batch, key):
        return run(lokr, base_params, opt_state, batch, key)

    return step
