"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sph_tpu.models.tsne import _repulsive_forces
from sph_tpu.ops.pallas.tsne_kernels import tsne_forces_dense, tsne_repulsion

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("n,npad", [(100, 256), (256, 256), (500, 512)])
def test_pallas_repulsion_matches_xla(n, npad):
    rng = np.random.default_rng(0)
    y = np.zeros((npad, 2), np.float32)
    y[:n] = rng.standard_normal((n, 2)).astype(np.float32) * 5
    rep_ref, z_ref = _repulsive_forces(jnp.asarray(y), jnp.int32(n),
                                       min(128, npad))
    rep_p, z_p = tsne_repulsion(jnp.asarray(y), jnp.int32(n),
                                row_block=128, col_block=256,
                                interpret=INTERPRET)
    assert np.isclose(float(z_p), float(z_ref), rtol=1e-5)
    scale = np.abs(np.asarray(rep_ref)).max()
    assert np.allclose(np.asarray(rep_p), np.asarray(rep_ref),
                       atol=1e-4 * max(scale, 1.0))


def test_pallas_repulsion_pad_rows_zero():
    rng = np.random.default_rng(1)
    npad, n = 256, 100
    y = rng.standard_normal((npad, 2)).astype(np.float32)  # garbage pads
    rep, z = tsne_repulsion(jnp.asarray(y), jnp.int32(n), row_block=128,
                            col_block=256, interpret=INTERPRET)
    assert np.all(np.asarray(rep)[n:] == 0)


@pytest.mark.parametrize("n,npad", [(100, 256), (256, 256)])
def test_pallas_forces_dense_matches_numpy(n, npad):
    rng = np.random.default_rng(2)
    y = np.zeros((npad, 2), np.float32)
    y[:n] = rng.standard_normal((n, 2)).astype(np.float32) * 3
    p = np.zeros((npad, npad), np.float32)
    # sparse-ish symmetric P with zero diagonal
    sup = rng.random((n, n)) < 0.05
    p[:n, :n] = np.where(sup | sup.T, rng.random((n, n)), 0).astype(np.float32)
    p[:n, :n] = (p[:n, :n] + p[:n, :n].T) / 2
    np.fill_diagonal(p, 0.0)
    p /= max(p.sum(), 1e-12)

    d2 = ((y[:n, None, :] - y[None, :n, :]) ** 2).sum(-1)
    w = 1.0 / (1.0 + d2)
    np.fill_diagonal(w, 0.0)
    z_ref = w.sum()
    diff = y[:n, None, :] - y[None, :n, :]
    rep_ref = ((w ** 2)[:, :, None] * diff).sum(1)
    attr_ref = ((p[:n, :n] * w)[:, :, None] * diff).sum(1)

    attr, rep, z = tsne_forces_dense(
        jnp.asarray(y), jnp.asarray(p), jnp.int32(n),
        row_block=128, col_block=256, interpret=INTERPRET)
    assert np.isclose(float(z), z_ref, rtol=1e-5)
    assert np.allclose(np.asarray(rep)[:n], rep_ref,
                       atol=1e-4 * max(np.abs(rep_ref).max(), 1.0))
    assert np.allclose(np.asarray(attr)[:n], attr_ref,
                       atol=1e-5 * max(np.abs(attr_ref).max(), 1.0))
    assert np.all(np.asarray(rep)[n:] == 0)
    assert np.all(np.asarray(attr)[n:] == 0)
