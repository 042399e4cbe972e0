"""Field-level DistanceCache (reference: sph/utils/DistanceCache.hpp:12-60,
ShortestPath.cpp:41-42 + :18-35 stats)."""

import numpy as np
import pytest

from sph_tpu.ops.graph import KnnGraph, symmetrize_graph
from sph_tpu.ops.knn import compute_knn
from sph_tpu.ops.shortest_path import compute_shortest_path
from sph_tpu.utils.distance_cache import DistanceCache


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(7)
    data = rng.standard_normal((120, 4)).astype(np.float32)
    idx, dist = compute_knn(data, 8)
    return symmetrize_graph(KnnGraph(idx, dist))


def test_query_matches_uncached(graph):
    dc = DistanceCache(graph)
    pairs = [(0, 77), (3, 50), (50, 3), (9, 9), (0, 1)]
    for s, e in pairs:
        assert dc.query(s, e) == pytest.approx(
            compute_shortest_path(graph, s, e), rel=1e-6)


def test_compute_shortest_path_accepts_cache(graph):
    dc = DistanceCache(graph)
    d0 = compute_shortest_path(graph, 2, 95)
    d1 = compute_shortest_path(graph, 2, 95, cache=dc)
    assert d1 == pytest.approx(d0, rel=1e-6)


def test_repeat_and_symmetric_queries_hit(graph):
    dc = DistanceCache(graph)
    dc.query(4, 88)
    m = dc.misses
    d_fwd = dc.query(4, 60)      # same source: field reuse
    assert dc.misses == m
    d_rev = dc.query(60, 4)      # symmetric: field(4)[60] answers (60, 4)
    assert dc.misses == m
    assert d_rev == pytest.approx(d_fwd, rel=1e-6)
    assert dc.hits >= 2


def test_direct_neighbor_early_out(graph):
    dc = DistanceCache(graph)
    s = 10
    e = int(graph.indices[s][graph.mask[s]][1])
    d = dc.query(s, e)
    assert dc.misses == 0  # no field was computed
    assert d > 0.0


def test_prefetch_batches_missing_fields(graph):
    dc = DistanceCache(graph)
    dc.prefetch([5, 6, 7, 5])
    assert dc.stats()["resident_fields"] == 3
    m = dc.misses
    for s in (5, 6, 7):
        dc.query(s, 99)
    assert dc.misses == m


def test_lru_eviction_bound(graph):
    dc = DistanceCache(graph, max_fields=2)
    dc.prefetch([1, 2, 3, 4])
    st = dc.stats()
    assert st["resident_fields"] == 2
    assert st["evictions"] == 2
    # evicted source recomputes (still correct)
    assert dc.query(1, 100) == pytest.approx(
        compute_shortest_path(graph, 1, 100), rel=1e-6)


def test_unreachable_sentinel():
    # two disconnected 2-cliques: k=2 keeps self + one neighbor
    data = np.array([[0.0, 0], [0.1, 0], [50.0, 0], [50.1, 0]],
                    np.float32)
    idx, dist = compute_knn(data, 2)
    g = symmetrize_graph(KnnGraph(idx, dist))
    dc = DistanceCache(g)
    assert dc.query(0, 2) == -1.0
