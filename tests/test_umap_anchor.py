"""UMAP quality anchor: batched-epoch SGD (models/umap.py) vs a faithful
sequential per-edge optimizer (native umap_sequential — the semantics of
the reference's umappp optimizer, EmbedUmap.cpp:233-269, identical update
rules to umap-learn optimize_layout_euclidean).

Both optimizers run on IDENTICAL fuzzy-union memberships, identical
(a, b), epochs and init; quality is compared with sklearn's
trustworthiness of the embedding against the original high-dimensional
data — the batched deviation (acknowledged in COMPONENTS.md) must not
cost neighborhood preservation.
"""

import numpy as np
import pytest

from sklearn.manifold import trustworthiness

from sph_tpu import native
from sph_tpu.models.umap import (UmapComputation, UmapParameters, find_ab,
                                 make_epochs_per_sample)
from sph_tpu.ops.knn import knn_bruteforce
from sph_tpu.ops.sparse import SparseRows, symmetrize_umap
from sph_tpu.ops.distributions import smooth_knn_distributions
from sph_tpu.utils.testdata import create_3d_gaussians

import jax.numpy as jnp


def fuzzy_setup(n=600, k=15, seed=9):
    centers = np.array([[0, 0, 0], [14, 0, 0], [0, 14, 0], [9, 9, 9]])
    pos, labels = create_3d_gaussians(n, random_state=seed, centers=centers)
    idx, dist = knn_bruteforce(pos, k)
    mask = np.ones_like(idx, dtype=bool)
    mask[:, 0] = False
    sims = smooth_knn_distributions(jnp.asarray(dist), jnp.asarray(mask))
    rows = SparseRows(np.where(mask, idx, -1).astype(np.int32),
                      np.asarray(sims), n)
    return symmetrize_umap(rows), pos, labels


def membership_edges(m, n_epochs):
    mask = m.mask & (m.values > 0)
    src = np.broadcast_to(np.arange(m.num_rows)[:, None],
                          m.indices.shape)[mask].astype(np.int32)
    dst = m.indices[mask].astype(np.int32)
    eps = make_epochs_per_sample(m.values[mask], n_epochs)
    return src, dst, eps.astype(np.float32)


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native library unavailable")
def test_umap_batched_matches_sequential_anchor():
    m, pos, labels = fuzzy_setup()
    n = m.num_rows
    n_epochs = 300
    a, b = find_ab(1.0, 0.1)

    rng = np.random.default_rng(7)
    init = (rng.standard_normal((n, 2)) * 10.0).astype(np.float32)

    # sequential oracle
    src, dst, eps = membership_edges(m, n_epochs)
    emb_seq = native.umap_sequential(init, src, dst, eps, n_epochs,
                                     a, b, neg_rate=5, seed=42)
    assert emb_seq is not None and np.all(np.isfinite(emb_seq))

    # batched-epoch optimizer on the SAME memberships + init
    params = UmapParameters(num_epochs=n_epochs, seed=123)
    um = UmapComputation(params)
    um.set_neighbor_matrix(m)
    um.set_initial_embedding(init)
    # set_neighbor_matrix applies the fuzzy union itself; our m is already
    # the union — symmetrize_umap is idempotent on symmetric input up to
    # p + p - p*p vs p, so feed the pre-union rows path equivalently by
    # monkey-free direct call:
    um._memberships = lambda: m
    um.compute()
    emb_bat = um.embedding
    assert np.all(np.isfinite(emb_bat))

    t_seq = trustworthiness(pos, emb_seq, n_neighbors=12)
    t_bat = trustworthiness(pos, emb_bat, n_neighbors=12)
    # both preserve neighborhoods well, and the batched optimizer is
    # within a small margin of (or better than) the sequential anchor
    assert t_seq > 0.90
    assert t_bat > 0.90
    assert t_bat >= t_seq - 0.03

    # cluster structure: mean silhouette-style separation on both
    def sep(emb):
        cents = np.stack([emb[labels == c].mean(0)
                          for c in np.unique(labels)])
        intra = np.mean([np.linalg.norm(
            emb[labels == c] - cents[i], axis=1).mean()
            for i, c in enumerate(np.unique(labels))])
        inter = np.mean([np.linalg.norm(cents[i] - cents[j])
                         for i in range(len(cents)) for j in range(i)])
        return inter / max(intra, 1e-9)

    assert sep(emb_bat) > 1.5
    assert sep(emb_seq) > 1.5
