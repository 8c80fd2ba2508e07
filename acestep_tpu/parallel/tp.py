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
