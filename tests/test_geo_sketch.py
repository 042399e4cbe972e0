"""Bounded-hop geodesic sketch vs scipy exact shortest paths.

The sketch (ops/geo_sketch.py) replaces the reference's per-pair A* +
DistanceCache (ShortestPath.cpp:100-166) at large component counts; with
width >= N and 2^hops >= diameter it must reproduce exact graph geodesics,
and with truncation it must stay an upper bound that never invents
distances for unreachable pairs.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from sph_tpu.ops.geo_sketch import (build_geo_sketch, sketch_hausdorff_pairs,
                                    sketch_pair_distances)
from sph_tpu.ops.graph import KnnGraph
from sph_tpu.ops.knn import knn_bruteforce


def _sym_knn_graph(n, d, k, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((n, d)).astype(np.float32)
    idx, dist = knn_bruteforce(data, k)
    # symmetric union as a scipy matrix for the exact comparator
    rows = np.repeat(np.arange(n), k)
    a = sp.coo_matrix((dist.ravel(), (rows, idx.ravel())), shape=(n, n)).tocsr()
    a = a.maximum(a.T)
    return KnnGraph(idx, dist), a, data


def test_sketch_exact_on_small_graph():
    g, a, _ = _sym_knn_graph(60, 3, 8, seed=1)
    exact = csgraph.shortest_path(a, directed=False)
    si, sd = build_geo_sketch(g, width=64, hops=4, row_block=64)
    p, q = np.meshgrid(np.arange(60), np.arange(60), indexing="ij")
    got = sketch_pair_distances(si, sd, p.ravel(), q.ravel()).reshape(60, 60)
    fin = np.isfinite(exact)
    assert np.all(np.isfinite(got) == fin)
    assert np.allclose(got[fin], exact[fin], rtol=1e-5, atol=1e-6)


def test_sketch_truncated_is_upper_bound():
    g, a, _ = _sym_knn_graph(200, 4, 6, seed=2)
    exact = csgraph.shortest_path(a, directed=False)
    si, sd = build_geo_sketch(g, width=12, hops=2, row_block=128)
    rng = np.random.default_rng(3)
    p = rng.integers(0, 200, 500)
    q = rng.integers(0, 200, 500)
    got = sketch_pair_distances(si, sd, p, q)
    ex = exact[p, q]
    fin = np.isfinite(got)
    # never shorter than the true geodesic, exact where it meets
    assert np.all(got[fin] >= ex[fin] - 1e-5)
    # self pairs are zero through the self entry
    self_d = sketch_pair_distances(si, sd, np.arange(200), np.arange(200))
    assert np.allclose(self_d, 0.0)


def test_sketch_disconnected_pairs_are_inf():
    # two clusters far apart with k small enough to disconnect them
    rng = np.random.default_rng(4)
    a_pts = rng.standard_normal((30, 3)).astype(np.float32)
    b_pts = rng.standard_normal((30, 3)).astype(np.float32) + 1000.0
    data = np.concatenate([a_pts, b_pts])
    idx, dist = knn_bruteforce(data, 5)
    g = KnnGraph(idx, dist)
    si, sd = build_geo_sketch(g, width=64, hops=4, row_block=64)
    got = sketch_pair_distances(si, sd, np.arange(30), np.arange(30, 60))
    assert not np.any(np.isfinite(got))


def test_sketch_hausdorff_matches_manual():
    g, a, _ = _sym_knn_graph(80, 3, 8, seed=5)
    exact = csgraph.shortest_path(a, directed=False)
    si, sd = build_geo_sketch(g, width=96, hops=4, row_block=80)
    rng = np.random.default_rng(6)
    rep_a = rng.integers(0, 80, (40, 4)).astype(np.int64)
    rep_b = rng.integers(0, 80, (40, 4)).astype(np.int64)
    rep_a[:, 3] = -1                       # exercise padding
    got = sketch_hausdorff_pairs(si, sd, rep_a, rep_b)
    for e in range(40):
        pa = rep_a[e][rep_a[e] >= 0]
        pb = rep_b[e][rep_b[e] >= 0]
        m = exact[np.ix_(pa, pb)]
        want = max(m.min(axis=1).max(), m.min(axis=0).max())
        assert got[e] == pytest.approx(want, rel=1e-5)
