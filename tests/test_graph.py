"""Graph container + restructuring tests (mirrors reference
tests/UtilsTests.cpp graph accessor / symmetrization / CC sections)."""

import numpy as np
import pytest

from sph_tpu.ops.graph import (KnnGraph, PaddedGraph, PAD_INDEX,
                               edge_list_components, ensure_self_first,
                               insert_edges_bidirectional,
                               strong_connected_components, symmetrize_graph,
                               weak_connected_components)


def tiny_graph():
    # 4 points on a line: 0-1-2   3 isolated-ish (points at 0, 1, 2, 10)
    idx = np.array([[0, 1, 2],
                    [1, 0, 2],
                    [2, 1, 0],
                    [3, 2, 1]], dtype=np.int32)
    dist = np.array([[0, 1, 2],
                     [0, 1, 1],
                     [0, 1, 2],
                     [0, 8, 9]], dtype=np.float32)
    return KnnGraph(idx, dist)


def test_knn_graph_valid():
    g = tiny_graph()
    assert g.is_valid()
    assert g.num_points == 4 and g.k == 3


def test_ensure_self_first_swap():
    idx = np.array([[1, 0, 2], [2, 1, 0]], dtype=np.int32)
    dist = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 3.0]], dtype=np.float32)
    nidx, ndist, adj = ensure_self_first(idx, dist)
    assert adj == 2
    assert nidx[0, 0] == 0 and ndist[0, 0] == 0
    assert nidx[1, 0] == 1 and ndist[1, 0] == 0
    # row 1: self was at slot 1; slot-0 entry (2) moved there
    assert nidx[1, 1] == 2


def test_ensure_self_first_missing():
    idx = np.array([[1, 2, 3]], dtype=np.int32)
    dist = np.array([[0.5, 1.0, 2.0]], dtype=np.float32)
    nidx, ndist, adj = ensure_self_first(idx, dist)
    assert adj == 1
    assert nidx[0, 0] == 0 and ndist[0, 0] == 0
    # most distant neighbor (3) dropped, rest shifted
    assert nidx[0].tolist() == [0, 1, 2]
    assert np.allclose(ndist[0], [0, 0.5, 1.0])


def test_symmetrize_union_min():
    # directed: 0->1 (d=1), 1->0 (d=3) => sym keeps min d=1 both ways
    idx = np.array([[0, 1], [1, 0], [2, 0]], dtype=np.int32)
    dist = np.array([[0, 1], [0, 3], [0, 5]], dtype=np.float32)
    g = symmetrize_graph(KnnGraph(idx, dist))
    assert g.is_valid()
    i0, d0 = g.row(0)
    # 0's neighbors: self, 1 (d=1), 2 (d=5)
    assert i0.tolist() == [0, 1, 2]
    assert np.allclose(d0, [0, 1, 5])
    i1, d1 = g.row(1)
    assert i1.tolist() == [1, 0]
    assert np.allclose(d1, [0, 1])
    i2, d2 = g.row(2)
    assert i2.tolist() == [2, 0]


def test_weak_components():
    # 2 components: {0,1}, {2,3} (mirrors reference CC labeling tests)
    idx = np.array([[0, 1], [1, 0], [2, 3], [3, 2]], dtype=np.int32)
    dist = np.zeros((4, 2), dtype=np.float32)
    dist[:, 1] = 1.0
    ncc, labels = weak_connected_components(KnnGraph(idx, dist))
    assert ncc == 2
    assert labels.tolist() == [0, 0, 1, 1]


def test_strong_components_directed_chain():
    # 0->1->2->0 cycle strongly connected; 3 alone (self loop only)
    idx = np.array([[0, 1], [1, 2], [2, 0], [3, 3]], dtype=np.int32)
    dist = np.zeros((4, 2), np.float32)
    dist[:3, 1] = 1.0
    ncc, labels = strong_connected_components(KnnGraph(idx, dist))
    assert ncc == 2
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] != labels[0]


def test_edge_list_components_first_occurrence_order():
    ncc, labels = edge_list_components(5, np.array([0, 3]), np.array([1, 4]))
    assert ncc == 3
    assert labels.tolist() == [0, 0, 1, 2, 2]


def test_insert_edges():
    g = tiny_graph().to_padded()
    g2 = insert_edges_bidirectional(g, np.array([[0, 3]]),
                                    np.array([4.0], dtype=np.float32))
    i0, d0 = g2.row(0)
    assert 3 in i0.tolist()
    # sorted by distance, self first
    assert d0[0] == 0 and np.all(np.diff(d0) >= 0)
    i3, d3 = g2.row(3)
    assert 0 in i3.tolist()
    # inserting an existing edge is a no-op
    g3 = insert_edges_bidirectional(g2, np.array([[0, 3]]),
                                    np.array([4.0], dtype=np.float32))
    assert g3.num_edges() == g2.num_edges()


def test_symmetrize_width_cap(monkeypatch):
    """Hub nodes must not blow the padded width: SPH_SYM_WIDTH_CAP keeps
    each row's closest edges (rows are distance-sorted)."""
    monkeypatch.setenv("SPH_SYM_WIDTH_CAP", "8")
    n, k = 40, 4
    rng = np.random.default_rng(0)
    idx = np.empty((n, k), np.int32)
    idx[:, 0] = np.arange(n)
    # every node points at node 0 -> node 0 becomes a mega-hub
    idx[:, 1] = 0
    idx[0, 1] = 1
    idx[:, 2:] = rng.integers(0, n, (n, k - 2))
    dist = np.sort(rng.random((n, k)).astype(np.float32), axis=1)
    dist[:, 0] = 0
    for use_native in (True, False):
        g = symmetrize_graph(KnnGraph(idx, dist), use_native=use_native)
        assert g.max_k <= 8
        assert g.indices[0, 0] == 0 and g.distances[0, 0] == 0
        row_d = g.distances[0][g.indices[0] >= 0]
        assert np.all(np.diff(row_d) >= 0)  # closest edges kept, sorted
