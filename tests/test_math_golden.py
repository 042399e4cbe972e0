"""Golden cross-library checks (reference: tests/UtilsBenchmark.cpp:106-160 —
the scipy Hausdorff value 3.5227829907617076 embedded as a comment) plus
math utility fixtures."""

import numpy as np
import pytest

from sph_tpu.ops.math import (compute_quantile, invlin, pca,
                              random_disk_init, spectral_embedding,
                              symmetric_hausdorff)


def test_hausdorff_scipy_golden():
    """Reference golden: scipy directed_hausdorff on the 4x4 fixture
    (UtilsBenchmark.cpp:107-131)."""
    u = np.array([(2.6, 5.1), (3.4, 1.9), (6.4, 0.8), (3.7, 8.0)])
    v = np.array([(0.4, 2.1), (6.3, 9.1), (4.6, 8.0), (4.2, 0.8)])
    d = np.sqrt(((u[:, None, :] - v[None, :, :]) ** 2).sum(-1))
    assert np.isclose(symmetric_hausdorff(d), 3.5227829907617076, rtol=1e-6)
    # and against scipy directly
    from scipy.spatial.distance import directed_hausdorff
    ref = max(directed_hausdorff(u, v)[0], directed_hausdorff(v, u)[0])
    assert np.isclose(symmetric_hausdorff(d), ref, rtol=1e-6)


def test_hausdorff_device_kernel_matches_golden():
    from sph_tpu.ops.similarities import hausdorff_point_set_distance
    u = np.array([(2.6, 5.1), (3.4, 1.9), (6.4, 0.8), (3.7, 8.0)],
                 dtype=np.float32)
    v = np.array([(0.4, 2.1), (6.3, 9.1), (4.6, 8.0), (4.2, 0.8)],
                 dtype=np.float32)
    data = np.concatenate([u, v])
    rep_a = np.array([[0, 1, 2, 3]])
    rep_b = np.array([[4, 5, 6, 7]])
    out = hausdorff_point_set_distance(data, rep_a, rep_b)
    assert np.isclose(out[0], 3.5227829907617076, rtol=1e-5)


def test_quantile_with_ignores():
    data = np.array([0.0, -1.0, 1.0, 2.0, 3.0, 4.0, np.finfo(np.float32).max],
                    dtype=np.float32)
    q = compute_quantile(data, 0.5, ignore_vals=(0.0, -1.0,
                                                 float(np.finfo(
                                                     np.float32).max)),
                        interpolation=1)
    assert np.isclose(q, 2.5)
    # all filtered -> negative sentinel
    assert compute_quantile(np.zeros(3, np.float32), 0.5,
                            ignore_vals=(0.0,)) < 0


def test_quantile_interpolation_modes():
    data = np.array([1.0, 2.0, 3.0, 4.0])
    assert np.isclose(compute_quantile(data, 0.5, interpolation=1), 2.5)
    assert np.isclose(compute_quantile(data, 0.5, interpolation=0), 2.5)
    assert np.isclose(compute_quantile(data, 1.0), 4.0)
    assert np.isclose(compute_quantile(data, 0.0), 1.0)


def test_invlin():
    assert invlin(0.0) == 1.0
    assert np.isclose(invlin(1.0), 0.5)


def test_pca_projects_variance():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((200, 2)) @ np.array([[5.0, 0], [0, 0.3]])
    lift = np.concatenate([base, 0.01 * rng.standard_normal((200, 6))],
                          axis=1)
    proj, ok = pca(lift.astype(np.float32), 2)
    assert ok
    # first component captures the dominant direction
    assert proj[:, 0].std() > proj[:, 1].std() > 0


def test_spectral_embedding_ring():
    # ring graph: spectral coords should embed on a circle-like layout
    n = 40
    idx = np.stack([np.arange(n), (np.arange(n) - 1) % n,
                    (np.arange(n) + 1) % n], axis=1).astype(np.int32)
    dist = np.ones((n, 3), dtype=np.float32)
    dist[:, 0] = 0
    emb, ok = spectral_embedding(idx, dist, 2)
    assert ok
    r = np.linalg.norm(emb - emb.mean(0), axis=1)
    assert r.std() / r.mean() < 0.1  # near-constant radius


def test_random_disk_init_radius():
    pts = random_disk_init(5000, 0.1, seed=1)
    r = np.linalg.norm(pts, axis=1)
    assert r.max() <= 0.1 + 1e-6
    # sqrt sampling -> uniform density: mean radius = 2/3 R
    assert np.isclose(r.mean(), 0.1 * 2 / 3, rtol=0.05)


def test_jaccard_coefficient():
    from sph_tpu.ops.math import jaccard_coefficient
    a = np.array([1.0, 0.0, 2.0])
    b = np.array([0.5, 1.0, 2.0])
    assert np.isclose(jaccard_coefficient(a, b),
                      (0.5 + 0 + 2) / (1 + 1 + 2))
    assert jaccard_coefficient(np.zeros(3), np.zeros(3)) == 0.0


def test_hausdorff_knn_ragged_samples():
    """Regression: ragged per-component sample counts must not corrupt the
    validity mask (review finding: reshape-instead-of-broadcast scrambled
    column masks)."""
    from sph_tpu.ops.component_knn import knn_hausdorff
    rng = np.random.default_rng(0)
    data = rng.standard_normal((12, 3)).astype(np.float32)
    # 3 components with 2/4/3 samples
    rep = np.full((3, 4), -1, dtype=np.int64)
    rep[0, :2] = [0, 1]
    rep[1, :4] = [2, 3, 4, 5]
    rep[2, :3] = [6, 7, 8]
    ids, dists = knn_hausdorff(data, rep, k=3)

    def naive(ra, rb):
        a = data[[r for r in ra if r >= 0]]
        b = data[[r for r in rb if r >= 0]]
        d = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1))
        return max(d.min(1).max(), d.min(0).max())

    for i in range(3):
        for pos in range(3):
            j = ids[i, pos]
            expect = 0.0 if i == j else naive(rep[i], rep[j])
            assert np.isclose(dists[i, pos], expect, atol=1e-4), (i, j)
