"""Collective matmuls: ICI-overlapped alternatives to matmul+psum / gather.

The shard_map TP blocks (parallel/tp.py, models/dit.py ``axis_name``) end each
row-parallel projection with ``jax.lax.psum`` — one monolithic all-reduce that
cannot start until the WHOLE matmul finishes.  On a real TPU slice the
all-reduce rides ICI while the MXU idles.  This module implements the
scaling-book "collective matmul" pattern instead: chunk the output axis into
``axis_size`` pieces and ring-accumulate partials with ``jax.lax.ppermute`` so
step s's hop overlaps step s+1's dot — XLA's latency-hiding scheduler issues
the ppermute DMA and the next chunk's matmul concurrently (the reference has
no analog: NCCL all-reduce in nano-vllm linear.py:152 is likewise post-hoc).

Numerics: each output element is produced by a ring of adds in a FIXED rank
order (starting from the owner of the chunk), so results are deterministic;
they can differ from psum's reduction order by float-add reassociation only —
the parity tests pin exactness for the sizes used.

Reduce-scatter + all-gather composition (2(n-1) hops of N/n-sized chunks)
matches the bandwidth-optimal ring all-reduce; for the TP=4..8 layer shapes
here each hop carries [B*T, N/n] bf16.

Opt-in: ``ACESTEP_TPU_COLLECTIVE_MATMUL=1`` routes the TP DiT mlp down_proj
through ``allreduce_matmul`` (models/dit.py:_mlp).  Single-chip and CPU-mesh
deployments keep plain psum (a ring of tiny host copies is slower there).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _axis_size(axis_name: str) -> int:
    return jax.lax.psum(1, axis_name)


def reduce_scatter_matmul(x: jax.Array, w: jax.Array, axis_name: str) -> jax.Array:
    """Row-parallel matmul with ring reduce-scatter over the output axis.

    x: [..., K_local] (replicated activations, K sharded across the axis)
    w: [K_local, N]   (this rank's rows)
    returns: [..., N/n] — rank r holds output chunk r, fully summed.

    Ring schedule: the accumulator starts at the rank AFTER the chunk's owner
    and travels the ring once, gathering every rank's partial; after n-1 hops
    it lands on the owner.  At step s, rank r adds its partial for chunk
    (r + s + 1) mod n and forwards — the dot for step s+1 overlaps the hop of
    step s (no dependency between them).
    """
    n = _axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    nn = w.shape[-1]
    assert nn % n == 0, f"output dim {nn} not divisible by axis size {n}"
    chunk = nn // n
    # [n, K_local, chunk] — static reshape; per-step chunk selection is a
    # dynamic slice on the leading axis (weight bytes move once per step, the
    # same total traffic as the monolithic dot's single pass)
    w_chunks = w.reshape(w.shape[0], n, chunk).transpose(1, 0, 2)

    def partial_for(step):
        c = jax.lax.rem(r + step + 1, n)
        wc = jax.lax.dynamic_index_in_dim(w_chunks, c, axis=0, keepdims=False)
        return jnp.einsum("...k,kc->...c", x, wc,
                          preferred_element_type=jnp.float32)

    perm = [(i, (i - 1) % n) for i in range(n)]     # send to the PREVIOUS rank
    acc = partial_for(0)
    for s in range(1, n):
        acc = jax.lax.ppermute(acc, axis_name, perm)
        acc = acc + partial_for(s)                   # dot overlaps the hop
    return acc.astype(x.dtype)


def allgather_chunks(y_local: jax.Array, axis_name: str) -> jax.Array:
    """Ring all-gather of per-rank output chunks -> full output, concatenated
    in rank order along the last axis (n-1 ppermute hops)."""
    n = _axis_size(axis_name)
    r = jax.lax.axis_index(axis_name)
    chunk = y_local.shape[-1]
    out = jnp.zeros(y_local.shape[:-1] + (n * chunk,), y_local.dtype)

    def place(buf, piece, owner):
        starts = (0,) * (buf.ndim - 1) + (owner * chunk,)
        return jax.lax.dynamic_update_slice(buf, piece.astype(buf.dtype), starts)

    out = place(out, y_local, r)
    perm = [(i, (i + 1) % n) for i in range(n)]      # send to the NEXT rank
    piece = y_local
    for s in range(1, n):
        piece = jax.lax.ppermute(piece, axis_name, perm)
        out = place(out, piece, jax.lax.rem(r - s + n, n))
    return out


def allreduce_matmul(x: jax.Array, w: jax.Array, axis_name: str) -> jax.Array:
    """matmul + all-reduce as ring reduce-scatter (compute-overlapped) followed
    by ring all-gather: drop-in for ``psum(x @ w, axis_name)``."""
    y_local = reduce_scatter_matmul(x, w, axis_name)
    return allgather_chunks(y_local, axis_name)


def collective_matmul_enabled() -> bool:
    import os

    return os.environ.get("ACESTEP_TPU_COLLECTIVE_MATMUL", "0") == "1"


def row_parallel_linear(x: jax.Array, w, axis_name: str) -> jax.Array:
    """Drop-in for ``psum(linear(x, w), axis_name)`` on row-parallel
    projections (attention o_proj, MLP down_proj — every TP site that ends in
    an all-reduce, nano-vllm linear.py:126-152).

    Routes through the ring collective matmul when the flag is on and the
    weight permits it: a plain or block-quantized 2-D weight (dequantized to
    bf16 — the ring path re-chunks the output axis, which the packed quant
    layouts cannot slice) whose output axis divides the TP size.  Scan-stacked
    weights (``StackedWeight``) and non-divisible shapes keep the monolithic
    matmul + blocking psum."""
    from acestep_tpu.ops import qlinear
    from acestep_tpu.quant.formats import QuantTensor, dequantize

    if collective_matmul_enabled():
        wd = w
        if isinstance(wd, QuantTensor):
            wd = dequantize(wd, dtype=jnp.bfloat16)
        if isinstance(wd, jax.Array) and wd.ndim == 2 \
                and wd.shape[-1] % _axis_size(axis_name) == 0:
            return allreduce_matmul(x, wd, axis_name)
    return jax.lax.psum(qlinear.linear(x, w), axis_name)
