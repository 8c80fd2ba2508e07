"""Device-side (jitted) quantizers — fast engine builds and on-device requantize.

Same numerics as the numpy converters in formats.py (round-half-away-from-zero,
f16 scale storage), verified against them in tests.  Used by benches and the
on-load path where converting ~2B params through host numpy would dominate
startup (the reference's Q4_K on-load requantize cost 100+ s, BASELINE.md).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .formats import BLOCK, FOLD, SUB16, SUPER, QuantTensor
from .convert import default_policy


def _roundf(x):
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


@partial(jax.jit, static_argnames=())
def _quantize_q8_0_dev(w: jax.Array):
    k, n = w.shape
    w = w.astype(jnp.float32)
    blocks = w.reshape(k // BLOCK, BLOCK, n)
    amax = jnp.max(jnp.abs(blocks), axis=1)
    d = amax / 127.0
    inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
    q = jnp.clip(_roundf(blocks * inv[:, None, :]), -127, 127).astype(jnp.int8)
    return q.reshape(k, n), d.astype(jnp.float16)


def _pack_fold(q: jax.Array) -> jax.Array:
    """uint8 values [K, N] -> fold-256 packed [K//2, N] (formats._pack_nibbles)."""
    k, n = q.shape
    g = q.reshape(k // FOLD, FOLD, n)
    lo = g[:, : FOLD // 2, :]
    hi = g[:, FOLD // 2:, :]
    return (lo | (hi << 4)).reshape(k // 2, n).astype(jnp.uint8)


@partial(jax.jit, static_argnames=())
def _quantize_q4_0_dev(w: jax.Array):
    k, n = w.shape
    w = w.astype(jnp.float32)
    blocks = w.reshape(k // BLOCK, BLOCK, n)
    idx = jnp.argmax(jnp.abs(blocks), axis=1)
    signed_max = jnp.take_along_axis(blocks, idx[:, None, :], axis=1)[:, 0, :]
    d = signed_max / -8.0
    inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    q = jnp.clip(jnp.floor(blocks * inv[:, None, :] + 8.5), 0, 15).astype(jnp.uint8)
    return _pack_fold(q.reshape(k, n)), d.astype(jnp.float16)


@partial(jax.jit, static_argnames=())
def _quantize_q4_k_dev(w: jax.Array):
    k, n = w.shape
    w = w.astype(jnp.float32)
    nb, ns = k // BLOCK, k // SUPER
    blocks = w.reshape(nb, BLOCK, n)
    mn = jnp.minimum(jnp.min(blocks, axis=1), 0.0)
    mx = jnp.max(blocks, axis=1)
    d_b = (mx - mn) / 15.0
    min_b = -mn
    sub = SUPER // BLOCK
    d_sup = jnp.max(d_b.reshape(ns, sub, n), axis=1) / 63.0
    m_sup = jnp.max(min_b.reshape(ns, sub, n), axis=1) / 63.0
    d_rep = jnp.repeat(d_sup, sub, axis=0)
    m_rep = jnp.repeat(m_sup, sub, axis=0)
    ls = jnp.clip(jnp.where(d_rep > 0, _roundf(d_b / jnp.maximum(d_rep, 1e-30)), 0), 0, 63).astype(jnp.uint8)
    lm = jnp.clip(jnp.where(m_rep > 0, _roundf(min_b / jnp.maximum(m_rep, 1e-30)), 0), 0, 63).astype(jnp.uint8)
    d_eff = d_rep * ls
    m_eff = m_rep * lm
    inv = jnp.where(d_eff > 0, 1.0 / jnp.maximum(d_eff, 1e-30), 0.0)
    q = jnp.clip(_roundf((blocks + m_eff[:, None, :]) * inv[:, None, :]), 0, 15).astype(jnp.uint8)
    return _pack_fold(q.reshape(k, n)), ls, lm, d_sup.astype(jnp.float16), m_sup.astype(jnp.float16)


def _pack_fold_crumbs(q: jax.Array) -> jax.Array:
    """2-bit values [K, N] -> fold-64 packed [K//4, N] (formats._pack_crumbs)."""
    k, n = q.shape
    g = q.reshape(k // FOLD, 4, FOLD // 4, n)
    return (g[:, 0] | (g[:, 1] << 2) | (g[:, 2] << 4) | (g[:, 3] << 6)).reshape(
        k // 4, n).astype(jnp.uint8)


@partial(jax.jit, static_argnames=())
def _quantize_q6_k_dev(w: jax.Array):
    k, n = w.shape
    w = w.astype(jnp.float32)
    nb, ns = k // SUB16, k // SUPER
    blocks = w.reshape(nb, SUB16, n)
    idx = jnp.argmax(jnp.abs(blocks), axis=1)
    signed_max = jnp.take_along_axis(blocks, idx[:, None, :], axis=1)[:, 0, :]
    d_b = signed_max / -32.0
    sub = SUPER // SUB16
    d_sup = jnp.max(jnp.abs(d_b).reshape(ns, sub, n), axis=1) / 127.0
    d_rep = jnp.repeat(d_sup, sub, axis=0)
    ls = jnp.clip(jnp.where(d_rep > 0, _roundf(d_b / jnp.maximum(d_rep, 1e-30)), 0),
                  -127, 127).astype(jnp.int8)
    d_eff = d_rep * ls
    inv = jnp.where(d_eff != 0, 1.0 / jnp.where(d_eff == 0, 1.0, d_eff), 0.0)
    q = (jnp.clip(_roundf(blocks * inv[:, None, :]), -32, 31) + 32).astype(jnp.uint8)
    q = q.reshape(k, n)
    return (_pack_fold(q & 0xF), _pack_fold_crumbs(q >> 4), ls,
            d_sup.astype(jnp.float16))


def quantize_jax(w: jax.Array, fmt: str) -> QuantTensor:
    k, n = w.shape
    if fmt == "q8_0":
        data, scales = _quantize_q8_0_dev(w)
        return QuantTensor(fmt="q8_0", shape=(k, n), data=data, scales=scales)
    if fmt == "q4_0":
        data, scales = _quantize_q4_0_dev(w)
        return QuantTensor(fmt="q4_0", shape=(k, n), data=data, scales=scales)
    if fmt == "q4_k":
        data, ls, lm, ds, ms = _quantize_q4_k_dev(w)
        return QuantTensor(fmt="q4_k", shape=(k, n), data=data, sub_scales=ls,
                           sub_mins=lm, super_scales=ds, super_mins=ms)
    if fmt == "q6_k":
        data, data_hi, ls, ds = _quantize_q6_k_dev(w)
        return QuantTensor(fmt="q6_k", shape=(k, n), data=data, data_hi=data_hi,
                           sub_scales=ls, super_scales=ds)
    raise ValueError(f"unknown quant format: {fmt}")


def quantize_tree_jax(
    params: Any,
    fmt: str,
    policy: Callable[[str, Any], bool] = default_policy,
    path: str = "",
) -> Any:
    """Like quant.convert.quantize_tree but quantizes on-device (jitted)."""
    from .formats import supported_format_for

    if fmt in ("f32", "bf16", "f16"):
        return params
    if isinstance(params, dict):
        return {k: quantize_tree_jax(v, fmt, policy, f"{path}/{k}") for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        out = [quantize_tree_jax(v, fmt, policy, f"{path}/{i}") for i, v in enumerate(params)]
        return type(params)(out)
    if isinstance(params, QuantTensor) or params is None:
        return params
    arr = params
    if policy(path, arr):
        eff = supported_format_for(arr.shape[0], fmt)
        if eff not in ("f32", "bf16", "f16"):
            return quantize_jax(arr, eff)
    return arr
