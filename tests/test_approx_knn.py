"""Approximate per-level component kNN: IVF cluster pruning on proxy
sketches + exact pair metrics (reference: computeApproximateKnn,
LevelSimilarities.cpp:254-334 — hnswlib HNSW over ComponentID spaces with
exactKnn=false)."""

import numpy as np
import pytest

from sph_tpu.ops import component_knn as ck
from sph_tpu.ops.similarities import walks_bhattacharyya_distance
from sph_tpu.ops.sparse import SparseRows


def make_clustered_rows(c=2000, r=24, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, c, (40, r))
    lab = rng.integers(0, 40, c)
    idx = np.sort((base[lab] + rng.integers(0, 5, (c, r))) % c,
                  axis=1).astype(np.int32)
    idx2 = np.full((c, r), -1, np.int32)
    for i in range(c):
        u = np.unique(idx[i])
        idx2[i, :len(u)] = u
    val = np.where(idx2 >= 0, rng.random((c, r)).astype(np.float32), 0)
    s = val.sum(1, keepdims=True)
    val = np.where(idx2 >= 0, val / s, 0).astype(np.float32)
    return SparseRows(idx2, val, c)


def test_approx_walks_knn_recall_and_agreement():
    walks = make_clustered_rows()
    c, k = walks.num_rows, 16
    ids_e, d_e = ck.knn_walks(walks, k)
    feats = ck.project_sparse_rows(walks, seed=1)
    ids_a, d_a = ck.approx_pair_metric_knn(
        lambda a, b: walks_bhattacharyya_distance(walks, a, b),
        feats, k, seed=1)

    assert ids_a.shape == (c, k)
    assert np.all(ids_a[:, 0] == np.arange(c))
    assert np.all(d_a[:, 0] == 0)
    recall = np.mean([
        len(set(ids_e[i][ids_e[i] >= 0]) & set(ids_a[i][ids_a[i] >= 0]))
        / max(1, int((ids_e[i] >= 0).sum())) for i in range(c)])
    assert recall > 0.85

    # where exact and approx agree on a neighbor, the distance is the
    # exact metric value (the approximation is only in candidate pruning)
    for i in (5, 100, 999):
        common = set(ids_e[i]) & set(ids_a[i])
        for cc in common:
            ea = d_e[i][list(ids_e[i]).index(cc)]
            aa = d_a[i][list(ids_a[i]).index(cc)]
            assert abs(ea - aa) < 1e-4


def test_approx_tier_in_pipeline(monkeypatch):
    """Force the threshold low: the NEIGH_OVERLAP level kNN runs through the
    approximate tier and still yields a valid symmetric probdist."""
    monkeypatch.setenv("SPH_APPROX_KNN_THRESHOLD", "20")
    from sph_tpu import (ComputeHierarchy, ComponentSim,
                         ImageHierarchySettings, ImageStack,
                         LevelSimilaritiesSettings,
                         NearestNeighborsSettings, RandomWalkSettings,
                         Scaler, scale)
    from sph_tpu.utils.testdata import create_checker_image

    img = create_checker_image(10, 10, channels=4, block=5, noise=0.03)
    stack = ImageStack.from_array(img)
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, stack.rows, stack.cols,
        ihs=ImageHierarchySettings(component_sim=ComponentSim.NEIGH_OVERLAP,
                                   merge_multiple=False,
                                   use_percentile=False),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_OVERLAP, ks=[13]),
        rws=RandomWalkSettings(num_random_walks=10, single_walk_length=5),
        nns=NearestNeighborsSettings(num_nearest_neighbors=13))
    ch.compute()
    h = ch.image_hierarchy.hierarchy
    approx_levels = [l for l in range(1, h.num_levels)
                     if h.num_components[l] > 20]
    assert approx_levels, "fixture too small to exercise the approx tier"
    for level in range(h.num_levels):
        pd = ch.level_similarities.get_prob_dist(level)
        assert pd.num_rows == h.num_components[level]
        d = pd.to_dense()
        assert np.allclose(d, d.T, atol=1e-5)
        assert np.all(np.isfinite(pd.values))


# ---------------------------------------------------------------------------
# product quantization (HNSW_IVFPQ tier, VERDICT r3 item 7)
# ---------------------------------------------------------------------------

def _clustered_points(n=3000, d=32, blobs=12, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(blobs, d)) * 10
    lab = rng.integers(0, blobs, n)
    return (centers[lab] + rng.normal(size=(n, d))).astype(np.float32)


def test_pq_codec_roundtrip_error_bounded():
    from sph_tpu.ops.knn import (pq_train, pq_encode, pq_reconstruct_rows,
                                 knn_ivf)
    import sph_tpu.ops.knn as knn_mod
    data = _clustered_points()
    n, d = data.shape
    # coarse quantizer like knn_ivf's
    import jax.numpy as jnp
    nlist = 64
    rng = np.random.default_rng(1)
    init = data[rng.choice(n, nlist, replace=False)]
    block = 1024
    npad = ((n + block - 1) // block) * block
    pad = np.zeros((npad, d), np.float32)
    pad[:n] = data
    cents_d, assign_d = knn_mod._kmeans(jnp.asarray(pad), jnp.int32(n),
                                        jnp.asarray(init), nlist, 10,
                                        block=block)
    cents = np.asarray(cents_d)
    assign = np.asarray(assign_d)[:n]

    cb = pq_train(data, cents, assign, m=16, seed=2)
    assert cb.shape[0] == 16 and cb.shape[1] == 256
    codes = pq_encode(data, cents, assign, cb)
    assert codes.shape == (n, 16) and codes.dtype == np.uint8
    rec = pq_reconstruct_rows(codes, cents, assign, cb, d)
    # residual PQ at 16x8 bits on 12-blob data: reconstruction error well
    # below the inter-blob scale
    err = np.linalg.norm(rec - data, axis=1)
    spread = np.linalg.norm(data - data.mean(0), axis=1).mean()
    assert err.mean() < 0.35 * spread


def test_pq_tier_recall_vs_exact():
    from sph_tpu.ops.knn import compute_knn, knn_bruteforce, KnnIndex
    data = _clustered_points()
    k = 10
    idx_pq, dist_pq = compute_knn(data, k, KnnIndex.HNSW_IVFPQ)
    idx_e, dist_e = knn_bruteforce(data, k)
    assert idx_pq.shape == idx_e.shape
    assert np.all(idx_pq[:, 0] == np.arange(data.shape[0]))
    # recall@k excluding self: the refine stage (exact re-rank of the ADC
    # shortlist) lifts this far above the ADC-only ~0.85 regime
    hits = 0
    for i in range(data.shape[0]):
        hits += len(np.intersect1d(idx_pq[i, 1:], idx_e[i, 1:]))
    recall = hits / (data.shape[0] * (k - 1))
    assert recall >= 0.97, recall
    # refined distances are exact full-precision (same scale as the flat
    # tier): agree with brute force wherever the ids agree
    same = idx_pq == idx_e
    np.testing.assert_allclose(dist_pq[same], dist_e[same],
                               rtol=1e-4, atol=1e-4)
    # distances ascending per row
    d = np.where(idx_pq >= 0, dist_pq, np.inf)
    assert np.all(np.diff(d, axis=1) >= -1e-5)


def test_rerank_block_pads_short_shortlist_to_k():
    """A shortlist narrower than k (small probe pool clamping ksearch) must
    still return [B, k] with -1/inf padding, not silently fewer columns
    (advisor r4: knn_ivf output shape contract)."""
    import jax.numpy as jnp
    from sph_tpu.ops.knn import _rerank_exact_block
    rng = np.random.default_rng(0)
    data = rng.standard_normal((32, 8)).astype(np.float32)
    q = jnp.asarray(data[:4])
    qids = jnp.arange(4, dtype=jnp.int32)
    # shortlist of width 3 < k=6
    ids = jnp.asarray([[0, 1, 2], [1, 2, 3], [2, 3, 4], [3, 4, 5]],
                      dtype=jnp.int32)
    si, sd = _rerank_exact_block(q, qids, jnp.asarray(data), ids, 6,
                                 "l2", False)
    assert si.shape == (4, 6)
    assert sd.shape == (4, 6)
    si = np.asarray(si)
    sd = np.asarray(sd)
    # the 3 real candidates come first (finite, exact), pads trail
    assert np.all(si[:, 3:] == -1)
    assert np.all(np.isinf(sd[:, 3:]))
    assert np.all(np.isfinite(sd[:, :3]))
    # row 0's own id (0) is in its shortlist: exact self distance is 0
    assert sd[0, 0] == 0.0
