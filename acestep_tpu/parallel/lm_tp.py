"""Tensor-parallel LM planner serving (the reference's nano-vllm TP analog).

The reference TP-shards the Qwen LM 1-8 ways with hand-coded NCCL collectives:
ColumnParallelLinear / QKVParallelLinear / RowParallelLinear
(acestep/third_parts/nano-vllm/nanovllm/layers/linear.py:54-152), a sharded
vocab head (embed_head.py ParallelLMHead) and one rank process per shard
(llm_engine.py:33-40).  Here the same Megatron layout runs per-shard under a
``shard_map`` over the mesh's ``tp`` axis with explicit collectives:

  * fused qkv / gate-up weights are column-sharded **rank-major** (each
    contiguous column shard is ``[q_r|k_r|v_r]`` / ``[gate_r|up_r]``, so the
    per-shard ``_qkv_proj`` split with the LOCAL head counts is exact);
  * o_proj / down_proj are row-sharded with one ``psum`` per half-block
    (serving/lm.py ``axis_name`` threading);
  * the int8 KV cache is sharded along the KV-head axis — it crosses the
    shard_map boundary as a global array so the prefix-cache flow
    (prefill -> grow -> extend -> broadcast -> decode) works unchanged;
  * the quantized lm_head is column-sharded over the 2048-padded vocab; full
    logits re-assemble with a tiled ``all_gather`` and every shard samples the
    SAME token from the same key (replicated sampling, zero extra comms);
  * the reduced codes-phase head is sliced from the GLOBAL head up front and
    passed into the decode scan pre-sharded (``head_red_override``).

Decode stays ONE device dispatch per generation call (the whole loop is a
``lax.scan`` inside one shard_map) — collectives ride ICI inside the step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acestep_tpu.config import QwenConfig
from acestep_tpu.quant import QuantTensor
from acestep_tpu.parallel.tp import _pad_spec, _spec_tree, local_cfg, mesh_axis_sizes
from acestep_tpu.serving import kv_cache as kvc
from acestep_tpu.serving import lm as lm_serving
from acestep_tpu.serving.kv_cache import KVCache
from acestep_tpu.serving.lm import SamplingParams


# ---------------------------------------------------------------------------
# rank-major weight fusion
# ---------------------------------------------------------------------------

def _ncols(w) -> int:
    return w.shape[1] if isinstance(w, QuantTensor) else int(w.shape[-1])


def _slice_cols(w, lo: int, hi: int):
    """Slice output columns [lo, hi) of a kernel (array or QuantTensor,
    stacked [L, ...] ok) — every quant format packs along K, so all aux
    fields slice cleanly along N."""
    if isinstance(w, QuantTensor):
        def cut(a):
            return None if a is None else a[..., lo:hi]

        return dataclasses.replace(
            w, shape=(w.shape[0], hi - lo),
            data=cut(w.data), data_hi=cut(w.data_hi), scales=cut(w.scales),
            sub_scales=cut(w.sub_scales), sub_mins=cut(w.sub_mins),
            super_scales=cut(w.super_scales), super_mins=cut(w.super_mins),
        )
    return w[..., lo:hi]


def _rank_major(ws, tp: int):
    """Fuse kernels column-wise in RANK-MAJOR order: for each rank r the
    fused weight's contiguous shard holds [w0_r | w1_r | ...].  With tp=1
    this degenerates to the plain serving fusion (lm._concat_kernels)."""
    for w in ws:
        if _ncols(w) % tp:
            raise ValueError(
                f"TP={tp} must divide every fused output width, got {_ncols(w)}")
    if tp == 1:
        return lm_serving._concat_kernels(ws)
    parts = []
    for r in range(tp):
        for w in ws:
            n = _ncols(w) // tp
            parts.append(_slice_cols(w, r * n, (r + 1) * n))
    return lm_serving._concat_kernels(parts)


def _row_granule(w) -> int:
    """Minimum K-axis shard granularity: q8_0 packs scales per 32 rows; the
    4-bit/6-bit formats pack nibbles in fold-256 groups and super-blocks of
    256 rows."""
    if not isinstance(w, QuantTensor):
        return 1
    return 32 if w.fmt == "q8_0" else 256


def _validate_row_parallel(name: str, w, tp: int):
    k = w.shape[0] if isinstance(w, QuantTensor) else int(w.shape[-2])
    g = _row_granule(w)
    if k % tp or (k // tp) % g:
        raise ValueError(
            f"{name}: K={k} cannot be row-sharded {tp} ways with "
            f"{getattr(w, 'fmt', 'dense')} (per-rank K must be a multiple of "
            f"{g}); use a smaller tp or q8_0 for this weight")


def prepare_tp_params(
    params: Dict[str, Any], cfg: QwenConfig, mesh: Mesh, axis: str = "tp",
) -> Tuple[Dict[str, Any], Any]:
    """Fuse (rank-major) + validate + place LM serving params on the mesh.

    Input: STACKED, UNFUSED params (q_proj/k_proj/... separate), with the
    quantized head already ensured (lm.ensure_quantized_head pads the vocab
    to a 2048 multiple — divisible by any tp <= 16 with lane-aligned shards).
    Returns (sharded params, matching PartitionSpec tree)."""
    tp = mesh_axis_sizes(mesh)[axis]
    layers = params.get("layers")
    if isinstance(layers, list):
        raise ValueError("prepare_tp_params requires stacked layer params")
    if "qkv_proj" in layers:
        raise ValueError("params already fused — pass pre-fusion params")
    if cfg.num_attention_heads % tp or cfg.num_key_value_heads % tp:
        raise ValueError(
            f"tp={tp} must divide attention heads "
            f"({cfg.num_attention_heads}/{cfg.num_key_value_heads})")

    new_layers = dict(layers)
    new_layers["qkv_proj"] = {"kernel": _rank_major(
        [layers["q_proj"]["kernel"], layers["k_proj"]["kernel"],
         layers["v_proj"]["kernel"]], tp)}
    new_layers["gateup_proj"] = {"kernel": _rank_major(
        [layers["gate_proj"]["kernel"], layers["up_proj"]["kernel"]], tp)}
    for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        del new_layers[k]
    _validate_row_parallel("o_proj", new_layers["o_proj"]["kernel"], tp)
    _validate_row_parallel("down_proj", new_layers["down_proj"]["kernel"], tp)

    out = dict(params)
    out["layers"] = new_layers
    head = out.get("lm_head")
    if head is not None and _ncols(head["kernel"]) % tp:
        raise ValueError(
            f"lm_head width {_ncols(head['kernel'])} not divisible by tp={tp}")

    from acestep_tpu.ops.qlinear import precast_quant_scales

    out = precast_quant_scales(out)
    specs = _spec_tree(out)
    placed = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), out, specs)
    return placed, specs


def _cache_spec(axis: str) -> KVCache:
    """KVCache partition specs: shard the KV-head axis over tp (each rank owns
    nkv/tp heads — matching its column shard of the qkv projection)."""
    return KVCache(
        k=P(None, None, axis, None, None),
        v=P(None, None, axis, None, None),
        k_scale=P(None, None, axis, None),
        v_scale=P(None, None, axis, None),
        length=P(),
    )


def _weight_spec(w, base: P):
    """PartitionSpec pytree for a standalone kernel (array or QuantTensor)."""
    if isinstance(w, QuantTensor):
        def fs(a):
            return None if a is None else _pad_spec(base, a.ndim)

        return QuantTensor(
            fmt=w.fmt, shape=w.shape, data=fs(w.data), data_hi=fs(w.data_hi),
            scales=fs(w.scales), sub_scales=fs(w.sub_scales),
            sub_mins=fs(w.sub_mins), super_scales=fs(w.super_scales),
            super_mins=fs(w.super_mins),
        )
    return _pad_spec(base, w.ndim)


class LMTPContext:
    """Owns the sharded LM params and exposes jitted shard_map versions of the
    serving entry points (prefill / extend_prefill / decode_from_state /
    generate / decode_step) with signatures mirroring acestep_tpu.serving.lm.

    The KV cache crosses the boundary as a global array sharded on the
    KV-head axis, so LMPipeline's prefix-cache flow (grow_cache /
    broadcast_cache between calls) works unchanged.
    """

    def __init__(self, params: Dict[str, Any], cfg: QwenConfig, mesh: Mesh,
                 axis: str = "tp"):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.tp = mesh_axis_sizes(mesh)[axis]
        self.params, self.pspec = prepare_tp_params(params, cfg, mesh, axis)
        self.cfg_l = local_cfg(cfg, self.tp)
        self._cspec = _cache_spec(axis)
        self._fns: Dict[Any, Any] = {}
        self._head_red_cache: Dict[Any, Any] = {}

    # -- helpers -----------------------------------------------------------

    def _shmap(self, body, in_specs, out_specs):
        return shard_map(body, mesh=self.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)

    def _head_red(self, sp: SamplingParams):
        """Pre-sliced reduced codes head (global slice -> column-sharded), or
        None when the sp has no allowed_range / no quantized head."""
        import os as _os

        if (sp.allowed_range is None
                or _os.environ.get("ACESTEP_TPU_REDUCED_CODES_HEAD", "1") == "0"):
            return None
        w_full = (self.params.get("lm_head") or {}).get("kernel")
        if w_full is None:
            return None          # tied path: lm_logits uses the replicated embed
        key = (sp.allowed_range, sp.eos_token)
        if key not in self._head_red_cache:
            head_red, _, _ = lm_serving._slice_head_cols(
                w_full, sp.allowed_range[0], sp.allowed_range[1], sp.eos_token)
            spec = _weight_spec(head_red, P(None, self.axis))
            head_red = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, NamedSharding(self.mesh, s)),
                head_red, spec)
            self._head_red_cache[key] = (head_red, spec)
        return self._head_red_cache[key]

    # -- prefill -----------------------------------------------------------

    def prefill(self, prompt_ids, lengths, cache):
        if "prefill" not in self._fns:
            def body(params, ids, lens, cache):
                return lm_serving.prefill(
                    params, self.cfg_l, ids, lens, cache, axis_name=self.axis)

            self._fns["prefill"] = jax.jit(self._shmap(
                body,
                in_specs=(self.pspec, P(), P(), self._cspec),
                out_specs=(P(), self._cspec),
            ))
        return self._fns["prefill"](self.params, prompt_ids, lengths, cache)

    def extend_prefill(self, cache, new_ids, start, suffix_lengths):
        if "extend" not in self._fns:
            def body(params, cache, ids, start, slens):
                return lm_serving.extend_prefill(
                    params, self.cfg_l, cache, ids, start, slens,
                    axis_name=self.axis)

            self._fns["extend"] = jax.jit(self._shmap(
                body,
                in_specs=(self.pspec, self._cspec, P(), P(), P()),
                out_specs=(P(), self._cspec),
            ))
        return self._fns["extend"](self.params, cache, new_ids, start,
                                   suffix_lengths)

    def decode_step(self, cache, token_ids):
        """Single decode step (host-stepped FSM path)."""
        if "step" not in self._fns:
            def body(params, cache, tok):
                return lm_serving.decode_step(
                    params, self.cfg_l, cache, tok, axis_name=self.axis)

            self._fns["step"] = jax.jit(self._shmap(
                body,
                in_specs=(self.pspec, self._cspec, P()),
                out_specs=(P(), self._cspec),
            ))
        return self._fns["step"](self.params, cache, token_ids)

    # -- decode scans --------------------------------------------------------

    def decode_from_state(self, cache, logits, key, sp: SamplingParams,
                          ucache=None, ulogits=None,
                          min_tokens_arr=None, forced_eos_arr=None):
        hr = self._head_red(sp)
        head_red, hspec = hr if hr is not None else (None, None)
        flags = ("dec", sp, ucache is not None, min_tokens_arr is not None,
                 forced_eos_arr is not None, hr is not None)
        if flags not in self._fns:
            cs, ax = self._cspec, self.axis

            def body(params, cache, logits, key, ucache, ulogits,
                     min_arr, forced_arr, head_red):
                b = logits.shape[0]
                return lm_serving._scan_decode(
                    params, self.cfg_l, sp, b, cache, logits, key,
                    ucache, ulogits, min_arr, forced_arr,
                    axis_name=ax, head_red_override=head_red)

            self._fns[flags] = jax.jit(self._shmap(
                body,
                in_specs=(self.pspec, cs, P(), P(),
                          cs if ucache is not None else P(),
                          P(), P(), P(),
                          hspec if hr is not None else P()),
                out_specs=(P(), P()),
            ))
        return self._fns[flags](self.params, cache, logits, key, ucache,
                                ulogits, min_tokens_arr, forced_eos_arr,
                                head_red)

    def generate(self, prompt_ids, prompt_lengths, key, sp: SamplingParams,
                 uncond_prompt_ids=None, uncond_prompt_lengths=None,
                 min_tokens_arr=None, forced_eos_arr=None):
        hr = self._head_red(sp)
        head_red, hspec = hr if hr is not None else (None, None)
        flags = ("gen", sp, uncond_prompt_ids is not None,
                 min_tokens_arr is not None, forced_eos_arr is not None,
                 hr is not None)
        if flags not in self._fns:
            ax = self.axis

            def body(params, ids, lens, key, uids, ulens, min_arr, forced_arr,
                     head_red):
                return lm_serving.generate(
                    params, self.cfg_l, ids, lens, key, sp, uids, ulens,
                    min_arr, forced_arr, axis_name=ax,
                    head_red_override=head_red)

            self._fns[flags] = jax.jit(self._shmap(
                body,
                in_specs=(self.pspec, P(), P(), P(), P(), P(), P(), P(),
                          hspec if hr is not None else P()),
                out_specs=(P(), P()),
            ))
        return self._fns[flags](self.params, prompt_ids, prompt_lengths, key,
                                uncond_prompt_ids, uncond_prompt_lengths,
                                min_tokens_arr, forced_eos_arr, head_red)
