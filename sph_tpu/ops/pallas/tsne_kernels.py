"""Fused Pallas t-SNE repulsion kernel.

Reference: the per-iteration attractive+repulsive gradient update inside
HDILib (CPU Barnes-Hut `SparseTSNEUserDefProbabilities` or the
`GradientDescentTSNETexture` GL compute shader, EmbedTsne.cpp:191-265) —
SURVEY.md's north-star Pallas target.

The kernel computes, for a block of embedding rows, the exact Student-t
repulsion against ALL points:

    rep_i = sum_j w_ij^2 (y_i - y_j),   Z = sum_{i != j} w_ij

in one pass: the [B, CB] weight tile lives only in VMEM registers — no
[B, N] weight matrix ever reaches HBM (the XLA path materializes it per
scan step).  y is stored transposed [2, Npad] so the point dimension rides
the 128-wide lanes.  Z partials come out per row-block and are reduced by
the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rep_kernel(n_ref, yt_ref, rept_ref, *, row_block: int,
                col_block: int, npad: int):
    i = pl.program_id(0)
    n_valid = n_ref[0]

    rx = yt_ref[0, pl.ds(i * row_block, row_block)]     # [B]
    ry = yt_ref[1, pl.ds(i * row_block, row_block)]
    rx = rx.reshape(row_block, 1)
    ry = ry.reshape(row_block, 1)
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (row_block, 1), 0)
               + i * row_block)

    num_chunks = npad // col_block

    def chunk(c, carry):
        accx, accy, s2, zrow = carry
        cx = yt_ref[0, pl.ds(c * col_block, col_block)].reshape(
            1, col_block)
        cy = yt_ref[1, pl.ds(c * col_block, col_block)].reshape(
            1, col_block)
        dx = rx - cx                                    # [B, CB]
        dy = ry - cy
        d2 = dx * dx + dy * dy
        w = 1.0 / (1.0 + d2)
        col_ids = (jax.lax.broadcasted_iota(jnp.int32,
                                            (row_block, col_block), 1)
                   + c * col_block)
        valid = ((col_ids != row_ids) & (col_ids < n_valid)
                 & (row_ids < n_valid))
        w = jnp.where(valid, w, 0.0)
        zrow = zrow + jnp.sum(w, axis=1, keepdims=True)
        w2 = w * w
        s2 = s2 + jnp.sum(w2, axis=1, keepdims=True)
        accx = accx + jnp.sum(w2 * cx, axis=1, keepdims=True)
        accy = accy + jnp.sum(w2 * cy, axis=1, keepdims=True)
        return accx, accy, s2, zrow

    zero = jnp.zeros((row_block, 1), jnp.float32)
    accx, accy, s2, zrow = jax.lax.fori_loop(
        0, num_chunks, chunk, (zero, zero, zero, zero))

    rept_ref[0, :] = (s2 * rx - accx).reshape(row_block)
    rept_ref[1, :] = (s2 * ry - accy).reshape(row_block)
    # Per-row Z partials ride the third output row (a separate scalar
    # output would need a (1, 1) blocked SMEM spec, which real-TPU
    # lowering rejects); the caller reduces them.
    rept_ref[2, :] = zrow.reshape(row_block)


@functools.partial(jax.jit, static_argnames=("row_block", "col_block",
                                             "interpret"))
def tsne_repulsion(y: jax.Array, n_valid: jax.Array, row_block: int = 256,
                   col_block: int = 2048, interpret: bool = False):
    """Fused repulsion: y [Npad, 2] -> (rep [Npad, 2], Z scalar).

    Npad must be a multiple of row_block and col_block (cheap to arrange;
    the t-SNE driver pads once).
    """
    npad = y.shape[0]
    assert npad % row_block == 0 and npad % col_block == 0, (
        npad, row_block, col_block)
    grid = npad // row_block

    yt = y.T  # [2, Npad]; point dim on lanes
    kernel = functools.partial(_rep_kernel, row_block=row_block,
                               col_block=col_block, npad=npad)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_valid [1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # yt [2, Npad], full
        ],
        out_specs=pl.BlockSpec((3, row_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32).reshape(1), yt)
    return out[:2].T, jnp.sum(out[2])


def _forces_kernel(n_ref, yt_ref, p_ref, out_ref, *, row_block: int,
                   col_block: int):
    """One (row-block, col-block) tile of the fused t-SNE force pass.

    For the tile's pairs it computes the Student-t weight w and streams the
    dense joint-P tile from HBM, accumulating SIX row reductions into
    out_ref (the [8, row_block] block for row-block i, revisited across the
    col grid): s2 = sum w^2, (ax, ay) = sum w^2 * y_j, z = sum w,
    sa = sum p w, (bx, by) = sum p w * y_j.  The caller finalizes
    rep = s2*y - a and attr = sa*y - b, so no [N, N] intermediate and no
    TPU gather ever materializes (gathers measured 14+ ms/iter at N=5.6k;
    this pass is HBM-bound on P at ~N^2*4 bytes)."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_valid = n_ref[0]

    rx = yt_ref[0, pl.ds(i * row_block, row_block)].reshape(row_block, 1)
    ry = yt_ref[1, pl.ds(i * row_block, row_block)].reshape(row_block, 1)
    cx = yt_ref[0, pl.ds(c * col_block, col_block)].reshape(1, col_block)
    cy = yt_ref[1, pl.ds(c * col_block, col_block)].reshape(1, col_block)
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (row_block, 1), 0)
               + i * row_block)
    col_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, col_block), 1)
               + c * col_block)

    dx = rx - cx
    dy = ry - cy
    w = 1.0 / (1.0 + dx * dx + dy * dy)
    valid = ((col_ids != row_ids) & (col_ids < n_valid)
             & (row_ids < n_valid))
    w = jnp.where(valid, w, 0.0)
    p = jnp.where(valid, p_ref[...], 0.0)

    w2 = w * w
    pw = p * w
    contrib = jnp.concatenate([
        jnp.sum(w2, axis=1).reshape(1, row_block),
        jnp.sum(w2 * cx, axis=1).reshape(1, row_block),
        jnp.sum(w2 * cy, axis=1).reshape(1, row_block),
        jnp.sum(w, axis=1).reshape(1, row_block),
        jnp.sum(pw, axis=1).reshape(1, row_block),
        jnp.sum(pw * cx, axis=1).reshape(1, row_block),
        jnp.sum(pw * cy, axis=1).reshape(1, row_block),
        jnp.zeros((1, row_block), jnp.float32),
    ], axis=0)

    @pl.when(c == 0)
    def _init():
        out_ref[...] = contrib

    @pl.when(c > 0)
    def _acc():
        out_ref[...] += contrib


@functools.partial(jax.jit, static_argnames=("row_block", "col_block",
                                             "interpret"))
def tsne_forces_dense(y: jax.Array, p_dense: jax.Array, n_valid: jax.Array,
                      row_block: int = 256, col_block: int = 1024,
                      interpret: bool = False):
    """Fused attraction+repulsion over a DENSE joint P.

    y [Npad, 2], p_dense [Npad, Npad] (zero off-support / on pads) ->
    (attr [Npad, 2], rep [Npad, 2], Z scalar).  P streams tile-by-tile from
    HBM, so the per-iteration cost is one N^2 f32 read — the TPU-idiomatic
    replacement for both the Barnes-Hut tree (EmbedTsne.cpp:165-178) and
    the GL texture splat (EmbedTsne.cpp:342-395) of the reference.
    """
    npad = y.shape[0]
    assert p_dense.shape == (npad, npad), (p_dense.shape, npad)
    assert npad % row_block == 0 and npad % col_block == 0, (
        npad, row_block, col_block)

    yt = y.T
    kernel = functools.partial(_forces_kernel, row_block=row_block,
                               col_block=col_block)
    out = pl.pallas_call(
        kernel,
        grid=(npad // row_block, npad // col_block),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_valid [1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # yt [2, Npad], full
            pl.BlockSpec((row_block, col_block), lambda i, c: (i, c)),
        ],
        out_specs=pl.BlockSpec((8, row_block), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32).reshape(1), yt, p_dense)

    s2, ax, ay, zrow, sa, bx, by = (out[j] for j in range(7))
    rep = jnp.stack([s2 * yt[0] - ax, s2 * yt[1] - ay], axis=1)
    attr = jnp.stack([sa * yt[0] - bx, sa * yt[1] - by], axis=1)
    return attr, rep, jnp.sum(zrow)
