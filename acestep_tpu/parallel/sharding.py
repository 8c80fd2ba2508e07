"""Parameter/activation sharding specs for the (dp, tp) mesh.

Tensor-parallel layout (scaling-book megatron recipe, one psum per block):
  * q/k/v, gate/up kernels [K, N]  -> shard N over tp  (column parallel)
  * o_proj, down_proj kernels      -> shard K over tp  (row parallel; XLA inserts
    the all-reduce that nano-vllm's RowParallelLinear does by hand, linear.py:152)
  * QuantTensor leaves (data/scales/sub_scales/...) share the kernel's partition:
    every aux array has the same [K-major, N-minor] axis order, so one spec fits.
  * norms, biases, tables, embeddings: replicated.
  * activations: batch over dp.

Used as jit sharding hints (GSPMD propagates the rest).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acestep_tpu.quant import QuantTensor

# path regex -> (spec for 2-D kernel-layout arrays)
# qkv_proj/gateup_proj are the serving-fused weights: ONLY valid column-
# parallel when fused rank-major (parallel/lm_tp.py fuse_rank_major), so that
# each contiguous column shard is [q_r|k_r|v_r] / [gate_r|up_r].
# lm_head shards the (padded) vocab axis; logits re-assemble via all_gather.
_COL_PARALLEL = re.compile(
    r"(q_proj|k_proj|v_proj|gate_proj|up_proj|qkv_proj|gateup_proj|lm_head)/kernel$"
)
_ROW_PARALLEL = re.compile(r"(o_proj|down_proj)/kernel$")
_COL_BIAS = re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/bias$")


def spec_for_path(path: str, leaf: Any) -> P:
    if _COL_PARALLEL.search(path):
        return P(None, "tp")
    if _ROW_PARALLEL.search(path):
        return P("tp", None)
    if _COL_BIAS.search(path):
        return P("tp")
    return P()  # replicate


def _apply_quant_spec(qt: QuantTensor, spec: P, mesh: Mesh) -> QuantTensor:
    """Place each aux array of a QuantTensor with the kernel's partition spec
    (all aux arrays are [K-blocks, N]-shaped, so the spec maps 1:1)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def ok(a):
        for dim, name in enumerate(spec):
            if name is not None and a.shape[dim] % axis_sizes[name] != 0:
                return False
        return True

    if spec != P() and not all(ok(a) for a in (
        qt.data, qt.data_hi, qt.scales, qt.sub_scales, qt.sub_mins, qt.super_scales, qt.super_mins
    ) if a is not None):
        spec = P()  # replicate when block granularity doesn't divide

    def put(a):
        if a is None:
            return None
        return jax.device_put(a, NamedSharding(mesh, spec))

    return QuantTensor(
        fmt=qt.fmt, shape=qt.shape,
        data=put(qt.data), data_hi=put(qt.data_hi), scales=put(qt.scales),
        sub_scales=put(qt.sub_scales), sub_mins=put(qt.sub_mins),
        super_scales=put(qt.super_scales), super_mins=put(qt.super_mins),
    )


def shard_params(params: Any, mesh: Mesh, path: str = "") -> Any:
    """Place a param pytree on the mesh according to the TP rules."""
    if isinstance(params, dict):
        return {k: shard_params(v, mesh, f"{path}/{k}") for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        out = [shard_params(v, mesh, f"{path}/{i}") for i, v in enumerate(params)]
        return type(params)(out)
    if params is None:
        return None
    if isinstance(params, QuantTensor):
        return _apply_quant_spec(params, spec_for_path(path + "/kernel" if not path.endswith("kernel") else path, params), mesh)
    spec = spec_for_path(path, params)
    # guard: only shard when the named axis divides the dim
    if spec != P():
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        for dim, name in enumerate(spec):
            if name is not None and params.shape[dim] % axis_sizes[name] != 0:
                spec = P()
                break
    return jax.device_put(params, NamedSharding(mesh, spec))


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard leading batch axis over dp, replicate the rest."""
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x
    )
