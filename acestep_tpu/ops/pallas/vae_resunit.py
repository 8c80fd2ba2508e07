"""Fused VAE residual-unit kernel (the north-star "Pallas-fused VAE convs").

One ``pallas_call`` computes a whole Oobleck residual unit —
``x + conv2(snake2(conv1(snake1(x))))`` with the k=7 dilated conv and the
k=1 channel-mix — on VMEM-resident tiles.  The XLA path materializes every
intermediate ([L, C] f32 at full audio rate, ~0.5 GB per op at the 983k-sample
final stage) to HBM between the conv library calls and the Snake fusions;
the round-5 VAE study (docs/BENCHMARK.md) shows those late 128-channel
stages are activation-bandwidth-bound and carry ~45% of decode time.  This
kernel reads each input tile once (plus a 3·dilation halo), keeps
s1/y1/s2/y2 in VMEM, and writes the residual output once — ~5x less HBM
traffic per unit.

The convs run as 7 accumulated [TL, C] x [C, C] MXU dots (tap-shifted input
views), exactly conv1d's math with padding=3·dilation; Snake matches
models/vae.snake (logscale handled by pre-exponentiating alpha/beta in the
wrapper).  f32 throughout — the VAE's precision note applies (the reference
keeps it out of fp16).

Scope: channels a multiple of 128 (the late decoder stages; C<=256 tiles
stay under the VMEM budget), any length (wrapper pads to the tile grid).
Opt-in via ``ACESTEP_TPU_VAE_FUSED=1`` with graceful XLA fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_len(c: int) -> int:
    # Mosaic stack-allocates xt/s1/y1/s2/y2 + double-buffered out blocks
    # concurrently (~6 live [TL, C] f32 tiles); these sizes keep the scoped
    # VMEM under the 16 MB limit with margin
    return 2048 if c <= 128 else 1024


def _halo(dilation: int) -> int:
    # conv reach is 3*dilation; round up to 8 so the (tl + 2*halo) DMA slice
    # length satisfies Mosaic's sublane tiling (multiple-of-8 rows)
    return -(-3 * dilation // 8) * 8


def supported(c: int, backend: str) -> bool:
    return c % 128 == 0 and c <= 256 and backend in ("tpu", "axon")


def _kernel(d: int, tl: int, halo: int,
            x_hbm, w1_ref, b1_ref, w2_ref, b2_ref,
            a1_ref, be1_ref, a2_ref, be2_ref,
            o_ref, xbuf, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    c = o_ref.shape[1]

    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(t * tl, tl + 2 * halo), :], xbuf, sem)
    cp.start()
    cp.wait()

    xt = xbuf[:]                                      # [TL+2H, C] f32
    # snake1: x + sin^2(a x)/b (a/b pre-exponentiated by the wrapper)
    a1 = a1_ref[0]
    b1 = be1_ref[0]
    s1 = xt + (1.0 / (b1 + 1e-9)) * jnp.square(jnp.sin(a1 * xt))

    # conv1 k=7 dilation=d padding=3d: y[p] = sum_j s1[p + (j-3)*d] @ W1[j]
    acc = None
    for j in range(7):
        off = halo + (j - 3) * d
        piece = s1[off:off + tl, :]
        part = jnp.dot(piece, w1_ref[j],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y1 = acc + b1_ref[0]

    a2 = a2_ref[0]
    b2v = be2_ref[0]
    s2 = y1 + (1.0 / (b2v + 1e-9)) * jnp.square(jnp.sin(a2 * y1))

    y2 = jnp.dot(s2, w2_ref[0], preferred_element_type=jnp.float32) \
        + b2_ref[0]
    o_ref[:] = xt[halo:halo + tl, :] + y2


def _call_kernel(dilation: int, interpret: bool, xp, w1, b1, w2, b2,
                 a1, be1, a2, be2):
    """xp: [N, L_padded + 2*halo, C] f32 -> [N, L_padded, C] f32."""
    n, lp2, c = xp.shape
    tl = _tile_len(c)
    halo = _halo(dilation)
    n_tiles = (lp2 - 2 * halo) // tl
    kern = functools.partial(_kernel, dilation, tl, halo)
    const = lambda shape: pl.BlockSpec(
        shape, lambda nn, tt: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),         # x (HBM, halo DMA)
            const((7, c, c)), const((1, c)),              # w1, b1
            const((1, c, c)), const((1, c)),              # w2, b2
            const((1, c)), const((1, c)),                 # a1, be1
            const((1, c)), const((1, c)),                 # a2, be2
        ],
        out_specs=pl.BlockSpec((None, tl, c), lambda nn, tt: (nn, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tl, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tl + 2 * halo, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w1, b1, w2, b2, a1, be1, a2, be2)


def _xla_forward(dilation: int, xp, w1, b1, w2, b2, a1, be1, a2, be2):
    """The kernel's exact math in plain jnp (tap-shifted dot sum) — the
    reference for the custom_vjp backward (autodiff cannot enter pallas)."""
    n, lp2, c = xp.shape
    halo = _halo(dilation)
    lout = lp2 - 2 * halo
    s1 = xp + (1.0 / (be1[0] + 1e-9)) * jnp.square(jnp.sin(a1[0] * xp))
    y1 = None
    for j in range(7):
        off = halo + (j - 3) * dilation
        part = jnp.einsum("nlc,cd->nld", s1[:, off:off + lout, :], w1[j],
                          preferred_element_type=jnp.float32)
        y1 = part if y1 is None else y1 + part
    y1 = y1 + b1[0]
    s2 = y1 + (1.0 / (be2[0] + 1e-9)) * jnp.square(jnp.sin(a2[0] * y1))
    y2 = jnp.einsum("nlc,cd->nld", s2, w2[0],
                    preferred_element_type=jnp.float32) + b2[0]
    return xp[:, halo:halo + lout, :] + y2


def _batched_entry(dilation: int, interpret: bool):
    """Transform wrappers around the raw pallas_call:

    * ``custom_vjp`` (inner): training differentiates _res_unit (the VAE
      phase of tools/train_quality_eval.py) and autodiff cannot enter a
      pallas kernel — the backward recomputes through the identical-math XLA
      forward and vjps that (forward stays fused; backward pays one XLA
      recompute, training-only).
    * ``custom_vmap`` (outer): the decode path maps over window stacks
      (``lax.map`` in models/vae._decode_window_groups) and pallas cannot
      batch an ANY-space operand — batching folds the mapped axis into the
      kernel's native N grid dimension instead."""
    import jax.custom_batching as cb

    @cb.custom_vmap
    def inner(xp, w1, b1, w2, b2, a1, be1, a2, be2):
        return _call_kernel(dilation, interpret, xp, w1, b1, w2, b2,
                            a1, be1, a2, be2)

    @inner.def_vmap
    def _rule(axis_size, in_batched, xp, w1, b1, w2, b2, a1, be1, a2, be2):
        assert in_batched[0] and not any(in_batched[1:]), (
            "fused_res_unit batching folds the data axis only; weights are "
            "closure-constant across the map")
        bsz, n, lp2, c = xp.shape
        out = _call_kernel(dilation, interpret, xp.reshape(bsz * n, lp2, c),
                           w1, b1, w2, b2, a1, be1, a2, be2)
        return out.reshape(bsz, n, out.shape[1], c), True

    # custom_vjp OUTERMOST: grad must see it before the custom_vmap wrapper
    # (custom_vmap has no autodiff rule of its own)
    diff = jax.custom_vjp(lambda *args: inner(*args))

    def _fwd(*args):
        return inner(*args), args

    def _bwd(args, g):
        _, vjp = jax.vjp(
            lambda *a: _xla_forward(dilation, *a), *args)
        return vjp(g)

    diff.defvjp(_fwd, _bwd)
    return diff


def fused_res_unit(p, x: jax.Array, dilation: int, *,
                   interpret: bool = False) -> jax.Array:
    """models/vae._res_unit as one fused kernel.  x: [N, L, C] f32."""
    n, l, c = x.shape
    tl = _tile_len(c)
    halo = _halo(dilation)
    n_tiles = -(-l // tl)
    pad_r = n_tiles * tl - l
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (halo, halo + pad_r), (0, 0)))

    # pre-exponentiate the log-scale Snake params (models/vae.snake)
    a1 = jnp.exp(p["snake1"]["alpha"].astype(jnp.float32)).reshape(1, c)
    be1 = jnp.exp(p["snake1"]["beta"].astype(jnp.float32)).reshape(1, c)
    a2 = jnp.exp(p["snake2"]["alpha"].astype(jnp.float32)).reshape(1, c)
    be2 = jnp.exp(p["snake2"]["beta"].astype(jnp.float32)).reshape(1, c)
    w1 = p["conv1"]["w"].astype(jnp.float32)              # [7, C, C]
    b1 = p["conv1"].get("b")
    b1 = (jnp.zeros((c,), jnp.float32) if b1 is None
          else b1.astype(jnp.float32)).reshape(1, c)
    w2 = p["conv2"]["w"].astype(jnp.float32).reshape(1, c, c)   # k=1
    b2 = p["conv2"].get("b")
    b2 = (jnp.zeros((c,), jnp.float32) if b2 is None
          else b2.astype(jnp.float32)).reshape(1, c)

    out = _batched_entry(dilation, interpret)(
        xp, w1, b1, w2, b2, a1, be1, a2, be2)
    return out[:, :l, :].astype(x.dtype)


# ---------------------------------------------------------------------------
# Whole-block trio: res_unit(d=1) ∘ res_unit(d=3) ∘ res_unit(d=9) in ONE
# kernel — one HBM read + one write for the entire trio (the decoder runs
# exactly this chain per block, models/vae.decode).  Chained reach:
# 3·1 + 3·3 + 3·9 = 39 -> halo 40.
# ---------------------------------------------------------------------------

TRIO_D = (1, 3, 9)
TRIO_HALO = 40
_TRIO_TL = 1024            # ~8 live [TL, C] f32 tiles; stay far under 16 MB


def trio_supported(c: int, backend: str) -> bool:
    return c == 128 and backend in ("tpu", "axon")


def _unit_math(src, d, out_lo, out_len, w1, b1, w2, b2, a1, be1, a2, be2):
    """One res unit over ``src`` rows [out_lo, out_lo+out_len) (needs src
    valid on [out_lo-3d, out_lo+out_len+3d)) — shared by kernel and the
    XLA backward; src is [L, C] (kernel) or [N, L, C] (XLA)."""
    s1 = src + (1.0 / (be1 + 1e-9)) * jnp.square(jnp.sin(a1 * src))
    acc = None
    for j in range(7):
        off = out_lo + (j - 3) * d
        piece = s1[..., off:off + out_len, :]
        part = jnp.einsum("...lc,cd->...ld", piece, w1[j],
                          preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y1 = acc + b1
    s2 = y1 + (1.0 / (be2 + 1e-9)) * jnp.square(jnp.sin(a2 * y1))
    y2 = jnp.einsum("...lc,cd->...ld", s2, w2,
                    preferred_element_type=jnp.float32) + b2
    return src[..., out_lo:out_lo + out_len, :] + y2


def _trio_kernel(tl: int, l_true: int, x_hbm,
                 w1s, b1s, w2s, b2s, a1s, be1s, a2s, be2s,
                 o_ref, xbuf, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(t * tl, tl + 2 * TRIO_HALO), :], xbuf, sem)
    cp.start()
    cp.wait()

    # chained extents: u1 valid center±36, u2 center±27, u3 center.
    # After units 1/2, rows outside the TRUE sequence are zeroed so the next
    # unit's conv sees hard zero padding exactly like the sequential path
    # (its conv zero-pads at sequence edges, not unit-1-of-padding values).
    u = xbuf[:]
    lo = (TRIO_HALO - 36, 36 - 27, 27)
    ln = (tl + 72, tl + 54, tl)
    off0 = (-36, -27)                 # u_i row 0's true coord minus t*tl
    for i in range(3):
        u = _unit_math(u, TRIO_D[i], lo[i], ln[i],
                       w1s[i], b1s[i, 0], w2s[i, 0], b2s[i, 0],
                       a1s[i, 0], be1s[i, 0], a2s[i, 0], be2s[i, 0])
        if i < 2:
            rows = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
            abs_pos = t * tl + off0[i] + rows
            u = jnp.where((abs_pos >= 0) & (abs_pos < l_true), u, 0.0)
    o_ref[:] = u


def _trio_call(interpret: bool, l_true: int, xp,
               w1s, b1s, w2s, b2s, a1s, be1s, a2s, be2s):
    n, lp2, c = xp.shape
    tl = _TRIO_TL
    n_tiles = (lp2 - 2 * TRIO_HALO) // tl
    const = lambda shape: pl.BlockSpec(
        shape, lambda nn, tt: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_trio_kernel, tl, l_true),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            const((3, 7, c, c)), const((3, 1, c)),
            const((3, 1, c, c)), const((3, 1, c)),
            const((3, 1, c)), const((3, 1, c)),
            const((3, 1, c)), const((3, 1, c)),
        ],
        out_specs=pl.BlockSpec((None, tl, c), lambda nn, tt: (nn, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tl, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tl + 2 * TRIO_HALO, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, w1s, b1s, w2s, b2s, a1s, be1s, a2s, be2s)


def _xla_trio(l_true, xp, w1s, b1s, w2s, b2s, a1s, be1s, a2s, be2s):
    u = xp
    lo = (TRIO_HALO - 36, 36 - 27, 27)
    lout = xp.shape[1] - 2 * TRIO_HALO
    ln = (lout + 72, lout + 54, lout)
    off0 = (-36, -27)
    for i in range(3):
        u = _unit_math(u, TRIO_D[i], lo[i], ln[i],
                       w1s[i], b1s[i, 0], w2s[i, 0], b2s[i, 0],
                       a1s[i, 0], be1s[i, 0], a2s[i, 0], be2s[i, 0])
        if i < 2:
            rows = jnp.arange(u.shape[1])[None, :, None] + off0[i]
            u = jnp.where((rows >= 0) & (rows < l_true), u, 0.0)
    return u


def _trio_entry(interpret: bool, l_true: int):
    import jax.custom_batching as cb

    @cb.custom_vmap
    def inner(*args):
        return _trio_call(interpret, l_true, *args)

    @inner.def_vmap
    def _rule(axis_size, in_batched, xp, *rest):
        assert in_batched[0] and not any(in_batched[1:])
        bsz, n, lp2, c = xp.shape
        out = _trio_call(interpret, l_true, xp.reshape(bsz * n, lp2, c), *rest)
        return out.reshape(bsz, n, out.shape[1], c), True

    diff = jax.custom_vjp(lambda *args: inner(*args))

    def _fwd(*args):
        return inner(*args), args

    def _bwd(args, g):
        _, vjp = jax.vjp(functools.partial(_xla_trio, l_true), *args)
        return vjp(g)

    diff.defvjp(_fwd, _bwd)
    return diff


def _snake_vec(sn, c):
    return (jnp.exp(sn["alpha"].astype(jnp.float32)).reshape(1, c),
            jnp.exp(sn["beta"].astype(jnp.float32)).reshape(1, c))


def _bias_vec(conv, c):
    b = conv.get("b")
    return (jnp.zeros((c,), jnp.float32) if b is None
            else b.astype(jnp.float32)).reshape(1, c)


def fused_res_trio(units, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Three chained res units (dilations 1, 3, 9) in one kernel.
    ``units``: (res1, res2, res3) param dicts; x: [N, L, C]."""
    n, l, c = x.shape
    tl = _TRIO_TL
    n_tiles = -(-l // tl)
    pad_r = n_tiles * tl - l
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (TRIO_HALO, TRIO_HALO + pad_r), (0, 0)))
    w1s = jnp.stack([u["conv1"]["w"].astype(jnp.float32) for u in units])
    b1s = jnp.stack([_bias_vec(u["conv1"], c) for u in units])
    w2s = jnp.stack([u["conv2"]["w"].astype(jnp.float32).reshape(1, c, c)
                     for u in units])
    b2s = jnp.stack([_bias_vec(u["conv2"], c) for u in units])
    a1s = jnp.stack([_snake_vec(u["snake1"], c)[0] for u in units])
    be1s = jnp.stack([_snake_vec(u["snake1"], c)[1] for u in units])
    a2s = jnp.stack([_snake_vec(u["snake2"], c)[0] for u in units])
    be2s = jnp.stack([_snake_vec(u["snake2"], c)[1] for u in units])
    out = _trio_entry(interpret, l)(
        xp, w1s, b1s, w2s, b2s, a1s, be1s, a2s, be2s)
    return out[:, :l, :].astype(x.dtype)
