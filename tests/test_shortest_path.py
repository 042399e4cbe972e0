"""Shortest-path property tests on seeded manifolds (reference:
tests/AStarTest.cpp:33-183 — agreement of A*, Boost A*, Boost Dijkstra +
the geodesic >= euclidean invariant on swiss roll / S-curve data)."""

import numpy as np
import pytest

from sph_tpu.ops.graph import KnnGraph, symmetrize_graph
from sph_tpu.ops.knn import knn_bruteforce
from sph_tpu.ops.shortest_path import (compute_shortest_path,
                                       geodesic_component_distances,
                                       shortest_path_fields, sssp_fields,
                                       build_reverse_adjacency)
from sph_tpu.utils.testdata import create_s_curve, create_swiss_roll


def scipy_dijkstra(graph: KnnGraph, sources):
    import scipy.sparse as sp
    from scipy.sparse.csgraph import dijkstra
    n, k = graph.indices.shape
    rows = np.repeat(np.arange(n), k)
    cols = graph.indices.ravel()
    vals = graph.distances.ravel()
    keep = rows != cols
    m = sp.coo_matrix((vals[keep], (rows[keep], cols[keep])), shape=(n, n))
    return dijkstra(m.tocsr(), directed=True, indices=sources)


def test_fields_match_scipy_dijkstra_swiss_roll():
    pos, _ = create_swiss_roll(800, noise=0.01, random_state=5)
    idx, dist = knn_bruteforce(pos, 8)
    g = KnnGraph(idx, dist)
    sources = np.array([0, 100, 555])
    fields = shortest_path_fields(g, sources)
    ref = scipy_dijkstra(g, sources)
    both_finite = np.isfinite(fields) & np.isfinite(ref)
    assert np.allclose(fields[both_finite], ref[both_finite], atol=1e-3)
    assert np.array_equal(np.isfinite(fields), np.isfinite(ref))


def test_single_pair_and_direct_neighbor():
    pos, _ = create_s_curve(300, random_state=2)
    idx, dist = knn_bruteforce(pos, 6)
    g = KnnGraph(idx, dist)
    # direct neighbor early-out returns the edge weight
    nb = idx[10, 2]
    assert np.isclose(compute_shortest_path(g, 10, int(nb)), dist[10, 2])
    # self distance
    assert compute_shortest_path(g, 7, 7) == 0.0
    # general pair agrees with scipy
    ref = scipy_dijkstra(g, [10])[0]
    d = compute_shortest_path(g, 10, 250)
    if np.isfinite(ref[250]):
        assert np.isclose(d, ref[250], atol=1e-3)
    else:
        assert d == -1.0


def test_geodesic_geq_euclid_on_manifold():
    """Reference invariant: geodesic >= euclidean (AStar.cpp:109-115)."""
    pos, _ = create_swiss_roll(600, random_state=9)
    idx, dist = knn_bruteforce(pos, 8)
    g = KnnGraph(idx, dist)
    rng = np.random.default_rng(0)
    src = rng.integers(0, 600, 20)
    fields = shortest_path_fields(g, src)
    for i, s in enumerate(src):
        finite = np.isfinite(fields[i])
        euclid = np.linalg.norm(pos - pos[s], axis=1)
        assert np.all(fields[i][finite] >= euclid[finite] - 1e-3)


def test_unreachable_is_minus_one():
    # two disconnected pairs
    idx = np.array([[0, 1], [1, 0], [2, 3], [3, 2]], dtype=np.int32)
    dist = np.array([[0, 1], [0, 1], [0, 1], [0, 1]], dtype=np.float32)
    g = KnnGraph(idx, dist)
    assert compute_shortest_path(g, 0, 3) == -1.0
    assert np.isclose(compute_shortest_path(g, 2, 3), 1.0)


def test_geodesic_component_distances_level0():
    """GEO distances for pixel-level component pairs equal point-to-point
    geodesics (Hausdorff of singletons)."""
    pos, _ = create_s_curve(200, random_state=4)
    idx, dist = knn_bruteforce(pos, 8)
    g = KnnGraph(idx, dist)

    from sph_tpu.models.hierarchy import Hierarchy, HierarchySettings
    h = Hierarchy(HierarchySettings(num_rows=10, num_cols=20))
    h.init_first_level(200)

    a = np.array([0, 5, 17])
    b = np.array([150, 60, 90])
    out = geodesic_component_distances(g, pos, h, 0, a, b)
    ref = scipy_dijkstra(g, a)
    for i in range(3):
        da = ref[i][b[i]]
        db = scipy_dijkstra(g, [b[i]])[0][a[i]]
        # symmetric Hausdorff of two singletons = max of both directions
        expect = max(da, db)
        if np.isfinite(expect):
            assert np.isclose(out[i], expect, atol=1e-3), i


def test_contracted_geodesics_consistency():
    """The contracted component-graph geodesics must agree with direct edge
    weights for adjacent components and satisfy metric sanity (symmetry,
    triangle-ish) on a small hierarchy."""
    from sph_tpu.models.hierarchy import Hierarchy, HierarchySettings
    from sph_tpu.ops.shortest_path import (contracted_geodesic_knn,
                                           contracted_geodesic_pairs,
                                           contracted_geodesics)
    rng = np.random.default_rng(3)
    rows, cols = 6, 6
    data = rng.standard_normal((36, 4)).astype(np.float32)
    h = Hierarchy(HierarchySettings(num_rows=rows, num_cols=cols))
    h.init_first_level(36)
    # level 1: 9 components of 2x2 blocks
    labels = ((np.arange(36) // 12) * 3
              + (np.arange(36) % 6) // 2).astype(np.int64)
    from sph_tpu.settings import RandomWalkSettings
    h.settings.component_sim = None  # avoid walk updates

    h.parents.append(labels)
    h.num_components.append(9)
    h.pixel_components.append(labels)
    # spatial neighbors from the grid
    grid = h.spatial_neighbors_of(0)
    n, deg = grid.shape
    src = labels[np.repeat(np.arange(n), deg)]
    ok = grid.ravel() >= 0
    dst = labels[np.maximum(grid.ravel(), 0)]
    src, dst = src[ok], dst[ok]
    diff = src != dst
    key = np.unique(src[diff] * 9 + dst[diff])
    urow, ucol = key // 9, key % 9
    counts = np.bincount(urow, minlength=9)
    width = counts.max()
    adj = np.full((9, width), -1, dtype=np.int64)
    starts = np.zeros(10, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(len(urow)) - starts[urow]
    adj[urow, slot] = ucol
    h.spatial_neighbors.append(adj)

    d = contracted_geodesics(h, data, 1)
    assert d.shape == (9, 9)
    assert np.allclose(np.diag(d), 0.0)
    assert np.allclose(d, d.T, atol=1e-4)
    finite = np.isfinite(d)
    assert finite.all()  # grid adjacency is connected

    # pairs API agrees with the dense matrix
    a = np.array([0, 3, 7])
    b = np.array([8, 1, 2])
    pairs = contracted_geodesic_pairs(h, data, 1, a, b)
    assert np.allclose(pairs, d[a, b], atol=1e-4)

    # knn API: self first, ascending, consistent with dense
    ids, dists = contracted_geodesic_knn(h, data, 1, k=4)
    assert np.all(ids[:, 0] == np.arange(9))
    for i in range(9):
        assert np.all(np.diff(dists[i]) >= -1e-5)
        assert np.allclose(dists[i, 1:], np.sort(d[i])[1:4], atol=1e-4)
