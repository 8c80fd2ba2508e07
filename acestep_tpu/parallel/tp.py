"""Explicit-collective tensor parallelism via shard_map (scaling-book recipe).

The GSPMD path (parallel/sharding.py + jit) lets XLA place collectives; this
module is the EXPLICIT alternative: the DiT forward runs under ``shard_map``
with column/row-parallel weights and hand-placed ``psum`` after o_proj /
down_proj (dit.py blocks take ``axis_name``) — one all-reduce per block half,
exactly the Megatron layout the reference hand-codes with NCCL
(nano-vllm linear.py:54-152).  Per-shard bodies also let Pallas kernels run
under TP (GSPMD cannot partition a pallas_call).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from acestep_tpu.config import DiTConfig
from acestep_tpu.models import dit
from acestep_tpu.quant import QuantTensor
from acestep_tpu.parallel.sharding import spec_for_path


def _pad_spec(spec: P, ndim: int) -> P:
    """Left-pad a 2-D kernel spec with None for stacked leading axes."""
    parts = tuple(spec)
    if len(parts) < ndim:
        parts = (None,) * (ndim - len(parts)) + parts
    return P(*parts[:ndim])


def _spec_tree(params: Any, path: str = "") -> Any:
    """PartitionSpec pytree matching the param tree (QuantTensor leaves get the
    kernel's spec on every aux array — same K-major/N-minor axis order; stacked
    layer axes are unsharded)."""
    if isinstance(params, dict):
        return {k: _spec_tree(v, f"{path}/{k}") for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(_spec_tree(v, f"{path}/{i}") for i, v in enumerate(params))
    if params is None:
        return None
    if isinstance(params, QuantTensor):
        eff_path = path if path.endswith("kernel") else path + "/kernel"
        base = spec_for_path(eff_path, params)

        def field_spec(a):
            return None if a is None else _pad_spec(base, a.ndim)

        return QuantTensor(
            fmt=params.fmt, shape=params.shape,
            data=field_spec(params.data),
            data_hi=field_spec(params.data_hi),
            scales=field_spec(params.scales),
            sub_scales=field_spec(params.sub_scales),
            sub_mins=field_spec(params.sub_mins),
            super_scales=field_spec(params.super_scales),
            super_mins=field_spec(params.super_mins),
        )
    # plain arrays: biases/norms/tables replicate; kernels use the TP rules.
    # stacked layers add a leading axis -> strip it for the path rule, pad back.
    ndim = getattr(params, "ndim", 0)
    spec = spec_for_path(path, params)
    if len(tuple(spec)) not in (0, ndim):
        spec = _pad_spec(spec, ndim)
    return _pad_spec(spec, ndim) if tuple(spec) else P(*([None] * ndim))


def local_cfg(cfg: DiTConfig, tp: int) -> DiTConfig:
    """Per-shard config: each TP rank owns nh/tp query heads and nkv/tp KV heads."""
    assert cfg.num_attention_heads % tp == 0 and cfg.num_key_value_heads % tp == 0, (
        f"tp={tp} must divide heads ({cfg.num_attention_heads}/{cfg.num_key_value_heads})"
    )
    return dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp,
    )


def mesh_axis_sizes(mesh: Mesh):
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def make_tp_sampler(cfg: DiTConfig, mesh: Mesh, params_example: Any):
    """Jitted shard_map flow-matching sampler over the (dp, tp) mesh.

    The WHOLE Euler loop (condition projection + per-layer cross K/V + the
    8-step scan of DiT forwards) runs per-shard with hand-placed psum after
    o_proj/down_proj (sampler.sample_latents(axis_name="tp")); batch rides the
    dp axis when it divides, else replicates.  This is the engine's multi-chip
    inference path — the analog of nano-vllm's TP serving (linear.py:54-152),
    with Pallas qmm kernels running per-shard (GSPMD cannot partition a
    pallas_call).
    """
    from acestep_tpu import sampler as _sampler

    sizes = mesh_axis_sizes(mesh)
    tp, dp = sizes["tp"], sizes["dp"]
    cfg_l = local_cfg(cfg, tp)
    pspec = _spec_tree(params_example)

    @partial(
        jax.jit,
        static_argnames=("schedule", "infer_method", "use_attn_mask",
                         "batch_sharded", "cover_steps"),
    )
    def run(
        params, noise, ctx, enc, enc_mask, sde_key, attn_mask,
        *, schedule, infer_method="ode", use_attn_mask=False, batch_sharded=False,
        cover_steps=0,
        encoder_hidden_states_non_cover=None,
        context_latents_non_cover=None,
        encoder_attn_mask_non_cover=None,
    ):
        bspec = P("dp") if batch_sharded else P()

        def body(params, noise, ctx, enc, enc_mask, sde_key, attn_mask,
                 enc_nc, ctx_nc, enc_mask_nc):
            # de-correlate SDE noise across dp shards of the batch
            skey = jax.random.fold_in(sde_key, jax.lax.axis_index("dp"))
            return _sampler.sample_latents(
                params, cfg_l, noise, ctx, enc, enc_mask, schedule,
                infer_method=infer_method, sde_key=skey,
                attn_mask=attn_mask, use_attn_mask=use_attn_mask,
                cover_steps=cover_steps,
                encoder_hidden_states_non_cover=enc_nc,
                context_latents_non_cover=ctx_nc,
                encoder_attn_mask_non_cover=enc_mask_nc,
                axis_name="tp",
            )

        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(pspec, bspec, bspec, bspec, bspec, P(), bspec,
                      bspec, bspec, bspec),
            out_specs=bspec,
            check_rep=False,
        )
        return mapped(params, noise, ctx, enc, enc_mask, sde_key, attn_mask,
                      encoder_hidden_states_non_cover, context_latents_non_cover,
                      encoder_attn_mask_non_cover)

    return run


def make_tp_cfg_sampler(cfg: DiTConfig, mesh: Mesh, params_example: Any):
    """Jitted shard_map CFG sampler (base/non-turbo checkpoints) over (dp, tp).

    The co-batched cond/uncond 2B Euler loop (sampler.sample_latents_cfg) runs
    per-shard with hand-placed psum, so base checkpoints scale exactly like the
    turbo sampler (round-2 gap: pipeline.py ran base-model CFG replicated-only).
    """
    from acestep_tpu import sampler as _sampler

    sizes = mesh_axis_sizes(mesh)
    tp = sizes["tp"]
    cfg_l = local_cfg(cfg, tp)
    pspec = _spec_tree(params_example)

    @partial(
        jax.jit,
        static_argnames=("schedule", "infer_method", "use_attn_mask",
                         "use_adg", "guidance_scale", "cfg_interval_start",
                         "cfg_interval_end", "batch_sharded"),
    )
    def run(
        params, noise, ctx, enc, enc_mask, enc_u, enc_u_mask, sde_key, attn_mask,
        *, schedule, guidance_scale, cfg_interval_start=0.0, cfg_interval_end=1.0,
        use_adg=False, infer_method="ode", use_attn_mask=False,
        batch_sharded=False,
    ):
        bspec = P("dp") if batch_sharded else P()

        def body(params, noise, ctx, enc, enc_mask, enc_u, enc_u_mask,
                 sde_key, attn_mask):
            skey = jax.random.fold_in(sde_key, jax.lax.axis_index("dp"))
            return _sampler.sample_latents_cfg(
                params, cfg_l, noise, ctx, enc, enc_mask, enc_u, enc_u_mask,
                schedule,
                guidance_scale=guidance_scale,
                cfg_interval_start=cfg_interval_start,
                cfg_interval_end=cfg_interval_end,
                use_adg=use_adg, infer_method=infer_method, sde_key=skey,
                attn_mask=attn_mask, use_attn_mask=use_attn_mask,
                axis_name="tp",
            )

        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(pspec, bspec, bspec, bspec, bspec, bspec, bspec,
                      P(), bspec),
            out_specs=bspec,
            check_rep=False,
        )
        return mapped(params, noise, ctx, enc, enc_mask, enc_u, enc_u_mask,
                      sde_key, attn_mask)

    return run


def make_tp_condition(
    dit_cfg: DiTConfig, text_cfg, mesh: Mesh, dit_params_example: Any
):
    """Jitted shard_map condition builder (style + lyric + timbre -> packed
    [lyric|timbre|style]) matching pipeline.encode_condition semantics.

    DiT encoder params are TP-sharded (lyric/timbre encoder blocks psum over
    "tp"); the Qwen text encoder runs replicated per shard (it is small and has
    no axis_name path).  Batch replicates across dp (condition batches are tiny
    relative to the sampler).
    """
    from acestep_tpu.models import dit as _dit
    from acestep_tpu.models import qwen as _qwen

    sizes = mesh_axis_sizes(mesh)
    cfg_l = local_cfg(dit_cfg, sizes["tp"])
    pspec = _spec_tree(dit_params_example)

    @jax.jit
    def run(dit_params, text_params, style_ids, style_mask, lyric_ids, lyric_mask,
            refer_latents, refer_frame_mask, refer_clip_mask):
        from acestep_tpu.pipeline import pack_sequences

        def body(dit_params, text_params, style_ids, style_mask, lyric_ids,
                 lyric_mask, refer_latents, refer_frame_mask, refer_clip_mask):
            parts = []
            if lyric_ids is not None:
                emb = _qwen.embeddings_only(text_params, lyric_ids)
                lyr = _dit.lyric_encoder(dit_params, cfg_l, emb, lyric_mask,
                                         axis_name="tp")
                parts.append((lyr, lyric_mask))
            if refer_latents is not None:
                b, n, lr, c = refer_latents.shape
                flat = refer_latents.reshape(b * n, lr, c)
                fm = (refer_frame_mask.reshape(b * n, lr)
                      if refer_frame_mask is not None else None)
                toks = _dit.timbre_encoder(
                    dit_params, cfg_l, flat, fm, axis_name="tp"
                ).reshape(b, n, -1)
                parts.append((toks, refer_clip_mask))
            if style_ids is not None:
                hs = _qwen.forward(text_params, text_cfg, style_ids, style_mask)
                st = _dit.text_projector(dit_params, hs)
                parts.append((st, style_mask))
            return pack_sequences(parts)

        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(pspec, P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
        return mapped(dit_params, text_params, style_ids, style_mask, lyric_ids,
                      lyric_mask, refer_latents, refer_frame_mask, refer_clip_mask)

    return run


def make_tp_dit_forward(cfg: DiTConfig, mesh: Mesh, params_example: Any):
    """Build a jitted shard_map DiT forward over the mesh's "tp" axis.

    Returns fn(params, hidden_states, timestep, encoder_hidden_states,
    context_latents) -> velocity; params must be sharded with
    parallel.sharding.shard_params on the same mesh."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape))["tp"]
    cfg_l = local_cfg(cfg, tp)
    pspec = _spec_tree(params_example)

    def body(params, hs, t, enc, ctx):
        return dit.forward(
            params, cfg_l, hs, t, t, enc, ctx, axis_name="tp",
        )

    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, P(), P(), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(mapped)
