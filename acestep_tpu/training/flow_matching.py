"""Flow-matching training step for the DiT (LoRA/full fine-tune core).

Reference semantics (acestep/training/trainer.py:302-324, SURVEY.md §3.5):
  * sample a discrete timestep from the turbo shift schedule per example;
  * x_t = t * noise + (1 - t) * x0;
  * the DiT predicts velocity v; target is (noise - x0)  [d x_t / d t];
  * MSE over the masked (generated) region only;
  * bf16 compute, f32 master grads, global-norm clipping.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.sampler import SHIFT_TIMESTEPS


def sample_discrete_timesteps(key: jax.Array, batch: int, shift: float = 3.0) -> jax.Array:
    """Uniformly pick from the turbo schedule's discrete timesteps (trainer.py:302-324)."""
    schedule = jnp.asarray(SHIFT_TIMESTEPS[shift], jnp.float32)
    idx = jax.random.randint(key, (batch,), 0, schedule.shape[0])
    return schedule[idx]


def flow_matching_loss(
    params: Dict[str, Any],
    cfg: DiTConfig,
    batch: Dict[str, jax.Array],
    key: jax.Array,
    shift: float = 3.0,
) -> jax.Array:
    """batch: latents [B,T,64] (x0), context_latents [B,T,ctx], encoder_hidden_states
    [B,Lc,H], encoder_attn_mask [B,Lc], loss_mask [B,T] (1 = generated region)."""
    x0 = batch["latents"].astype(jnp.float32)
    b = x0.shape[0]
    k_t, k_n = jax.random.split(key)
    t = sample_discrete_timesteps(k_t, b, shift)
    noise = jax.random.normal(k_n, x0.shape, jnp.float32)
    t_b = t[:, None, None]
    xt = t_b * noise + (1.0 - t_b) * x0
    target = noise - x0

    v = dit.forward(
        params, cfg,
        xt.astype(jnp.bfloat16),
        t, t,
        batch.get("encoder_hidden_states"),
        batch["context_latents"],
        encoder_attn_mask=batch.get("encoder_attn_mask"),
    ).astype(jnp.float32)

    err = jnp.square(v - target)
    mask = batch.get("loss_mask")
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None]
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * x0.shape[-1], 1.0)
    return jnp.mean(err)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 100,
    total_steps: int = 10000,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + warmup->cosine, global-norm clip (trainer.py:614-979 Fabric setup)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr,
        warmup_steps=warmup_steps, decay_steps=total_steps,
    )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def make_train_step(
    cfg: DiTConfig,
    optimizer: optax.GradientTransformation,
    shift: float = 3.0,
    jit: bool = True,
):
    """Build the (optionally jitted) full training step:
    loss -> grads -> NaN guard -> clip -> update.

    Gradient NaN auditing mirrors trainer.py:103-183 (skip the update when any
    grad is non-finite instead of poisoning the weights)."""

    def step(
        params: Dict[str, Any],
        opt_state: Any,
        batch: Dict[str, jax.Array],
        key: jax.Array,
    ) -> Tuple[Dict[str, Any], Any, jax.Array]:
        loss, grads = jax.value_and_grad(flow_matching_loss)(params, cfg, batch, key, shift)
        grads_ok = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        )
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(grads_ok, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # keep old state entirely when grads were bad
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(grads_ok, new, old), new_params, params
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(grads_ok, new, old)
            if hasattr(new, "shape") and new.shape == getattr(old, "shape", None) else new,
            new_opt_state, opt_state,
        )
        return new_params, new_opt_state, loss

    return jax.jit(step) if jit else step
