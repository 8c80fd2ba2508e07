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


def get_base_timestep_schedule(num_steps: int, shift: float = 1.0) -> Tuple[float, ...]:
    """Non-turbo (base-model) schedule: ``num_steps`` descending flow-matching
    timesteps with the standard shift warp sigma = shift*t / (1 + (shift-1)*t)
    (the reference's base path takes infer_steps<=60 + free-form shift,
    handler.py:2549-2560; turbo uses the whitelist above)."""
    import numpy as _np

    ts = _np.linspace(1.0, 1.0 / num_steps, num_steps)
    shifted = shift * ts / (1.0 + (shift - 1.0) * ts)
    return tuple(float(t) for t in shifted)


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
        "axis_name",
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
    encoder_attn_mask_non_cover: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    use_attn_mask: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Run the full Euler loop; returns clean latents x0 [B, T, 64].

    The condition is projected and its per-layer cross-attn K/V computed ONCE,
    then a lax.scan runs the 8 (or N) DiT evaluations.

    ``axis_name``: set when running under shard_map tensor parallelism — the
    per-layer blocks psum partial outputs over that mesh axis (cfg must carry
    the LOCAL head counts; see parallel.tp).
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
            if encoder_attn_mask is not None and encoder_attn_mask_non_cover is not None:
                enc_mask_i = jnp.where(
                    use_nc, encoder_attn_mask_non_cover, encoder_attn_mask)
            else:
                enc_mask_i = encoder_attn_mask
        else:
            kv_i = kv
            ctx_i = context_latents
            enc_mask_i = encoder_attn_mask

        vt = dit.forward(
            params, cfg,
            xt.astype(dtype),
            t_b, t_b,
            context_latents=ctx_i,
            attn_mask=attn_mask if use_attn_mask else None,
            encoder_attn_mask=enc_mask_i,
            cross_kv_cache=kv_i,
            axis_name=axis_name,
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
# of minutes of cold compile.  Per-step dispatch costs ~0.5 ms, which at fast
# shapes (10 s clip: 8 ms/step) is significant -- scan is the default; select
# step via ACESTEP_TPU_SAMPLER=step for cold-cache first runs.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "use_attn_mask"))
def _prepare_condition_kv(params, cfg, encoder_hidden_states, use_attn_mask=False):
    enc = dit.compute_condition(params, cfg, encoder_hidden_states.astype(jnp.bfloat16))
    return dit.compute_all_cross_kv(params, cfg, enc)


@functools.partial(jax.jit, static_argnames=("cfg", "is_last", "use_attn_mask"))
def _euler_step(
    params, cfg, xt, t, t_next, context_latents, kv, attn_mask,
    encoder_attn_mask=None, is_last=False, use_attn_mask=False,
):
    b = xt.shape[0]
    t_b = jnp.full((b,), t, jnp.float32)
    vt = dit.forward(
        params, cfg, xt.astype(jnp.bfloat16), t_b, t_b,
        context_latents=context_latents,
        attn_mask=attn_mask if use_attn_mask else None,
        encoder_attn_mask=encoder_attn_mask,
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
    encoder_attn_mask_non_cover: Optional[jax.Array] = None,
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
        enc_mask_i = (encoder_attn_mask_non_cover if use_nc and
                      encoder_attn_mask_non_cover is not None else encoder_attn_mask)
        is_last = i == n_steps - 1
        t_next = 0.0 if is_last else schedule[i + 1]
        if infer_method == "sde" and not is_last:
            # x0 prediction + re-noise (generate.py:187-192)
            x0 = _euler_step(params, cfg, xt, t, 0.0, ctx_i, kv_i, attn_mask,
                             enc_mask_i,
                             is_last=True, use_attn_mask=use_attn_mask)
            eps = jax.random.normal(jax.random.fold_in(sde_key, i), xt.shape, jnp.float32)
            xt = t_next * eps + (1.0 - t_next) * x0
        else:
            xt = _euler_step(params, cfg, xt, t, t_next, ctx_i, kv_i, attn_mask,
                             enc_mask_i,
                             is_last=is_last, use_attn_mask=use_attn_mask)
    return xt


def sample(params, cfg, *args, **kwargs):
    """Dispatch on ACESTEP_TPU_SAMPLER (scan | step); default scan.

    scan is ONE device dispatch for the whole Euler loop; step is one dispatch
    per step.  On the remote-tunnel backend per-step dispatch costs ~0.5 ms,
    which at configs[0] shapes is ~4 ms/step of pure overhead (measured
    12.3 ms/step stepwise vs 8.1 scan, tools/bench_dit_step.py).  step remains
    as the cold-compile escape hatch: its compile unit is a single DiT forward
    (~4x smaller XLA graph), useful on first-ever runs with an empty
    .jax_cache."""
    import os

    mode = os.environ.get("ACESTEP_TPU_SAMPLER", "scan")
    fn = sample_latents_stepwise if mode == "step" else sample_latents
    return fn(params, cfg, *args, **kwargs)


# ---------------------------------------------------------------------------
# base-model (non-turbo) CFG sampler: guidance_scale / cfg_interval / ADG.
#
# The reference's base path accepts infer_steps<=60, guidance_scale (default
# 7.0), cfg_interval_start/end and use_adg (handler.py:2549-2560); the guidance
# math itself ships in the checkpoint's remote code, so this implements the
# standard formulation: cond and uncond are co-batched into ONE 2B DiT forward
# (full MXU tiles), v = v_u + g * (v_c - v_u) inside the CFG interval and
# v = v_c outside it.  use_adg applies norm-preserving (adaptive) guidance:
# the guidance delta is rescaled to ||v_c|| per item so large guidance scales
# do not blow up the velocity magnitude.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "schedule", "infer_method", "use_attn_mask", "use_adg",
        "axis_name",
    ),
)
def sample_latents_cfg(
    params: Dict[str, Any],
    cfg: DiTConfig,
    noise: jax.Array,                       # [B, T, 64]
    context_latents: jax.Array,             # [B, T, ctx]
    encoder_hidden_states: jax.Array,       # [B, Lc, H] cond
    encoder_attn_mask: Optional[jax.Array],
    uncond_hidden_states: jax.Array,        # [B, Lu, H] uncond (negative)
    uncond_attn_mask: Optional[jax.Array],
    schedule: Tuple[float, ...],
    *,
    guidance_scale: float = 7.0,
    cfg_interval_start: float = 0.0,
    cfg_interval_end: float = 1.0,
    use_adg: bool = False,
    infer_method: str = "ode",
    sde_key: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    use_attn_mask: bool = False,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Classifier-free-guidance Euler loop for base (non-turbo) checkpoints.

    ``axis_name``: set when running per-shard inside a shard_map (``cfg`` must
    be the LOCAL per-rank config) — the DiT forward psums o_proj/down_proj,
    cross-KV is computed per-shard for the local heads (parallel/tp.py
    make_tp_cfg_sampler)."""
    b = noise.shape[0]
    dtype = jnp.bfloat16
    xt = noise.astype(jnp.float32)

    # pad cond/uncond to a common Lc so they co-batch into one forward
    lc, lu = encoder_hidden_states.shape[1], uncond_hidden_states.shape[1]
    l = max(lc, lu)

    def pad_cond(h, m, tgt):
        padn = tgt - h.shape[1]
        if padn:
            h = jnp.pad(h, ((0, 0), (0, padn), (0, 0)))
            m = (jnp.pad(m, ((0, 0), (0, padn))) if m is not None
                 else jnp.pad(jnp.ones((h.shape[0], h.shape[1] - padn), jnp.int32),
                              ((0, 0), (0, padn))))
        return h, m

    if encoder_attn_mask is None:
        encoder_attn_mask = jnp.ones((b, lc), jnp.int32)
    if uncond_attn_mask is None:
        uncond_attn_mask = jnp.ones((b, lu), jnp.int32)
    enc_c, mask_c = pad_cond(encoder_hidden_states, encoder_attn_mask, l)
    enc_u, mask_u = pad_cond(uncond_hidden_states, uncond_attn_mask, l)
    enc2 = jnp.concatenate([enc_c, enc_u], axis=0)          # [2B, L, H]
    mask2 = jnp.concatenate([mask_c, mask_u], axis=0)

    proj = dit.compute_condition(params, cfg, enc2.astype(dtype))
    kv2 = dit.compute_all_cross_kv(params, cfg, proj)

    ctx2 = jnp.concatenate([context_latents, context_latents], axis=0)
    attn2 = (jnp.concatenate([attn_mask, attn_mask], axis=0)
             if (use_attn_mask and attn_mask is not None) else None)

    n_steps = len(schedule)
    ts = jnp.asarray(schedule, jnp.float32)
    ts_next = jnp.asarray(list(schedule[1:]) + [0.0], jnp.float32)
    step_idx = jnp.arange(n_steps)
    if sde_key is None:
        sde_key = jax.random.key(0)
    sde_keys = jax.random.split(sde_key, n_steps)

    def body(xt, scan_in):
        i, t, t_next, skey = scan_in
        xt2 = jnp.concatenate([xt, xt], axis=0)
        t2b = jnp.full((2 * b,), t, jnp.float32)
        vt2 = dit.forward(
            params, cfg, xt2.astype(dtype), t2b, t2b,
            context_latents=ctx2,
            attn_mask=attn2,
            encoder_attn_mask=mask2,
            cross_kv_cache=kv2,
            axis_name=axis_name,
        ).astype(jnp.float32)
        v_c, v_u = vt2[:b], vt2[b:]

        delta = v_c - v_u
        if use_adg:
            # norm-preserving guidance: rescale delta to the cond velocity norm
            nc = jnp.sqrt(jnp.sum(v_c * v_c, axis=(1, 2), keepdims=True))
            nd = jnp.sqrt(jnp.sum(delta * delta, axis=(1, 2), keepdims=True))
            delta = delta * (nc / jnp.maximum(nd, 1e-6))
        v_cfg = v_u + guidance_scale * delta
        # CFG interval gate: progress = 1 - t (t goes 1 -> 0)
        progress = 1.0 - t
        in_interval = (progress >= cfg_interval_start) & (progress <= cfg_interval_end)
        vt = jnp.where(in_interval, v_cfg, v_c)

        is_last = i == n_steps - 1
        x0 = xt - vt * t
        if infer_method == "sde":
            eps = jax.random.normal(skey, xt.shape, jnp.float32)
            xt_new = jnp.where(is_last, x0, t_next * eps + (1.0 - t_next) * x0)
        else:
            xt_new = jnp.where(is_last, x0, xt - vt * (t - t_next))
        return xt_new, None

    xt, _ = jax.lax.scan(body, xt, (step_idx, ts, ts_next, sde_keys))
    return xt
