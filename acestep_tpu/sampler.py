"""Flow-matching Euler sampler (turbo: 8 steps, CFG-free).

Schedule constants and step math mirror the reference exactly
(acestep/mlx_dit/generate.py:15-30 schedules; :155-199 ODE/SDE updates;
acestep_ggml/cpp/acestep_ggml.cpp:2056-2086 C++ loop).

TPU-native: the whole loop is one jitted ``lax.scan`` over a static schedule —
compiled once per (batch, seq-bucket), reused across requests; cross-attn K/V are
precomputed once per request (step-constant condition).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit

VALID_SHIFTS = (1.0, 2.0, 3.0)

VALID_TIMESTEPS = (
    1.0, 0.9545454545454546, 0.9333333333333333, 0.9, 0.875,
    0.8571428571428571, 0.8333333333333334, 0.7692307692307693, 0.75,
    0.6666666666666666, 0.6428571428571429, 0.625, 0.5454545454545454,
    0.5, 0.4, 0.375, 0.3, 0.25, 0.2222222222222222, 0.125,
)

SHIFT_TIMESTEPS = {
    1.0: (1.0, 0.875, 0.75, 0.625, 0.5, 0.375, 0.25, 0.125),
    2.0: (1.0, 0.9333333333333333, 0.8571428571428571, 0.7692307692307693,
          0.6666666666666666, 0.5454545454545454, 0.4, 0.2222222222222222),
    3.0: (1.0, 0.9545454545454546, 0.9, 0.8333333333333334, 0.75,
          0.6428571428571429, 0.5, 0.3),
}

MAX_CUSTOM_TIMESTEPS = 20


def get_timestep_schedule(
    shift: float = 3.0, timesteps: Optional[Sequence[float]] = None
) -> Tuple[float, ...]:
    """Resolve the step schedule; custom lists snap to the 20-value whitelist
    (generate.py:50-63)."""
    if timesteps is not None:
        ts = [float(t) for t in timesteps]
        while ts and ts[-1] == 0:
            ts.pop()
        if ts:
            ts = ts[:MAX_CUSTOM_TIMESTEPS]
            return tuple(min(VALID_TIMESTEPS, key=lambda x, t=t: abs(x - t)) for t in ts)
    shift = min(VALID_SHIFTS, key=lambda x: abs(x - shift))
    return SHIFT_TIMESTEPS[shift]


def make_noise(
    key_or_seeds, shape: Tuple[int, int, int], dtype=jnp.float32
) -> jax.Array:
    """Per-item seeded standard normal noise.

    ``key_or_seeds`` may be a jax PRNG key or a list of per-item int seeds
    (the reference threads per-item seeds, inference.py GenerationConfig.seeds).
    """
    b, t, c = shape
    if isinstance(key_or_seeds, (list, tuple)):
        parts = [
            jax.random.normal(jax.random.key(int(s)), (1, t, c), dtype)
            for s in key_or_seeds
        ]
        return jnp.concatenate(parts, axis=0)
    return jax.random.normal(key_or_seeds, shape, dtype)


def _select_kv(pred, kv_a, kv_b):
    return jax.tree_util.tree_map(lambda a, b: jnp.where(pred, a, b), kv_a, kv_b)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "schedule", "infer_method", "cover_steps", "use_attn_mask",
    ),
)
def sample_latents(
    params: Dict[str, Any],
    cfg: DiTConfig,
    noise: jax.Array,                       # [B, T, 64]
    context_latents: jax.Array,             # [B, T, ctx_dim]
    encoder_hidden_states: jax.Array,       # [B, Lc, H]
    encoder_attn_mask: Optional[jax.Array],
    schedule: Tuple[float, ...],
    *,
    infer_method: str = "ode",
    sde_key: Optional[jax.Array] = None,
    cover_steps: int = 0,
    encoder_hidden_states_non_cover: Optional[jax.Array] = None,
    context_latents_non_cover: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    use_attn_mask: bool = False,
) -> jax.Array:
    """Run the full Euler loop; returns clean latents x0 [B, T, 64].

    The condition is projected and its per-layer cross-attn K/V computed ONCE,
    then a lax.scan runs the 8 (or N) DiT evaluations.
    """
    b = noise.shape[0]
    dtype = jnp.bfloat16
    xt = noise.astype(jnp.float32)

    enc = dit.compute_condition(params, cfg, encoder_hidden_states.astype(dtype))
    kv = dit.compute_all_cross_kv(params, cfg, enc)

    has_cover_switch = encoder_hidden_states_non_cover is not None
    if has_cover_switch:
        enc_nc = dit.compute_condition(
            params, cfg, encoder_hidden_states_non_cover.astype(dtype)
        )
        kv_nc = dit.compute_all_cross_kv(params, cfg, enc_nc)

    n_steps = len(schedule)
    ts = jnp.asarray(schedule, jnp.float32)
    ts_next = jnp.asarray(list(schedule[1:]) + [0.0], jnp.float32)
    step_idx = jnp.arange(n_steps)

    if sde_key is None:
        sde_key = jax.random.key(0)
    sde_keys = jax.random.split(sde_key, n_steps)

    def body(xt, scan_in):
        i, t, t_next, skey = scan_in
        t_b = jnp.full((b,), t, jnp.float32)

        if has_cover_switch:
            use_nc = i >= cover_steps
            kv_i = _select_kv(use_nc, kv_nc, kv)
            ctx_i = jnp.where(use_nc, context_latents_non_cover, context_latents)
        else:
            kv_i = kv
            ctx_i = context_latents

        vt = dit.forward(
            params, cfg,
            xt.astype(dtype),
            t_b, t_b,
            context_latents=ctx_i,
            attn_mask=attn_mask if use_attn_mask else None,
            cross_kv_cache=kv_i,
        ).astype(jnp.float32)

        is_last = i == n_steps - 1
        x0 = xt - vt * t
        if infer_method == "sde":
            eps = jax.random.normal(skey, xt.shape, jnp.float32)
            pred_clean = xt - vt * t
            xt_sde = t_next * eps + (1.0 - t_next) * pred_clean
            xt_new = jnp.where(is_last, x0, xt_sde)
        else:
            xt_ode = xt - vt * (t - t_next)
            xt_new = jnp.where(is_last, x0, xt_ode)
        return xt_new, None

    xt, _ = jax.lax.scan(body, xt, (step_idx, ts, ts_next, sde_keys))
    return xt


# ---------------------------------------------------------------------------
# stepwise variant: jitted single step + host loop.
#
# Same math as sample_latents, but the compile unit is ONE DiT forward instead
# of scan(8 steps){...}: ~4x smaller XLA graph.  On backends with slow remote
# compilation (the dev tunnel) this is the difference between minutes and tens
# of minutes of cold compile; per-step dispatch overhead (~ms) is negligible
# against 100ms+ steps.  Select with ACESTEP_TPU_SAMPLER=scan|step.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "use_attn_mask"))
def _prepare_condition_kv(params, cfg, encoder_hidden_states, use_attn_mask=False):
    enc = dit.compute_condition(params, cfg, encoder_hidden_states.astype(jnp.bfloat16))
    return dit.compute_all_cross_kv(params, cfg, enc)


@functools.partial(jax.jit, static_argnames=("cfg", "is_last", "use_attn_mask"))
def _euler_step(
    params, cfg, xt, t, t_next, context_latents, kv, attn_mask,
    is_last=False, use_attn_mask=False,
):
    b = xt.shape[0]
    t_b = jnp.full((b,), t, jnp.float32)
    vt = dit.forward(
        params, cfg, xt.astype(jnp.bfloat16), t_b, t_b,
        context_latents=context_latents,
        attn_mask=attn_mask if use_attn_mask else None,
        cross_kv_cache=kv,
    ).astype(jnp.float32)
    if is_last:
        return xt - vt * t
    return xt - vt * (t - t_next)


def sample_latents_stepwise(
    params: Dict[str, Any],
    cfg: DiTConfig,
    noise: jax.Array,
    context_latents: jax.Array,
    encoder_hidden_states: jax.Array,
    encoder_attn_mask: Optional[jax.Array],
    schedule: Tuple[float, ...],
    *,
    infer_method: str = "ode",
    sde_key: Optional[jax.Array] = None,
    cover_steps: int = 0,
    encoder_hidden_states_non_cover: Optional[jax.Array] = None,
    context_latents_non_cover: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    use_attn_mask: bool = False,
) -> jax.Array:
    """Host-looped Euler sampler; numerically identical to sample_latents (ODE).

    SDE re-noising uses per-step folds of ``sde_key``."""
    kv = _prepare_condition_kv(params, cfg, encoder_hidden_states, use_attn_mask)
    has_cover = encoder_hidden_states_non_cover is not None
    if has_cover:
        kv_nc = _prepare_condition_kv(params, cfg, encoder_hidden_states_non_cover, use_attn_mask)

    xt = noise.astype(jnp.float32)
    n_steps = len(schedule)
    if sde_key is None:
        sde_key = jax.random.key(0)
    for i, t in enumerate(schedule):
        use_nc = has_cover and i >= cover_steps
        kv_i = kv_nc if use_nc else kv
        ctx_i = context_latents_non_cover if use_nc else context_latents
        is_last = i == n_steps - 1
        t_next = 0.0 if is_last else schedule[i + 1]
        if infer_method == "sde" and not is_last:
            # x0 prediction + re-noise (generate.py:187-192)
            x0 = _euler_step(params, cfg, xt, t, 0.0, ctx_i, kv_i, attn_mask,
                             is_last=True, use_attn_mask=use_attn_mask)
            eps = jax.random.normal(jax.random.fold_in(sde_key, i), xt.shape, jnp.float32)
            xt = t_next * eps + (1.0 - t_next) * x0
        else:
            xt = _euler_step(params, cfg, xt, t, t_next, ctx_i, kv_i, attn_mask,
                             is_last=is_last, use_attn_mask=use_attn_mask)
    return xt


def sample(params, cfg, *args, **kwargs):
    """Dispatch on ACESTEP_TPU_SAMPLER (step | scan); default step."""
    import os

    mode = os.environ.get("ACESTEP_TPU_SAMPLER", "step")
    fn = sample_latents if mode == "scan" else sample_latents_stepwise
    return fn(params, cfg, *args, **kwargs)
