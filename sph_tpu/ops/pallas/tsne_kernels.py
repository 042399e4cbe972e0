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


def _rep_kernel(n_ref, yt_ref, rept_ref, z_ref, *, row_block: int,
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
        accx, accy, s2, z = carry
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
        z = z + jnp.sum(w)
        w2 = w * w
        s2 = s2 + jnp.sum(w2, axis=1, keepdims=True)
        accx = accx + jnp.sum(w2 * cx, axis=1, keepdims=True)
        accy = accy + jnp.sum(w2 * cy, axis=1, keepdims=True)
        return accx, accy, s2, z

    zero = jnp.zeros((row_block, 1), jnp.float32)
    accx, accy, s2, z = jax.lax.fori_loop(
        0, num_chunks, chunk, (zero, zero, zero, jnp.float32(0.0)))

    rept_ref[0, :] = (s2 * rx - accx).reshape(row_block)
    rept_ref[1, :] = (s2 * ry - accy).reshape(row_block)
    z_ref[0, 0] = z


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
    rept, z_parts = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_valid [1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # yt [2, Npad], full
        ],
        out_specs=(
            pl.BlockSpec((2, row_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, npad), jnp.float32),
            jax.ShapeDtypeStruct((grid, 1), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32).reshape(1), yt)
    return rept.T, jnp.sum(z_parts)
