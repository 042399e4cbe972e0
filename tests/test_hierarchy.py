"""Hierarchy engine golden tests, ported from the reference's hand-computed
fixtures (reference: tests/HierarchyTest.cpp — pixel adjacency :78-155, kNN
overlap :157-228, full 4x4 NEIGH_OVERLAP pipeline :230-363)."""

import numpy as np
import pytest

from sph_tpu.models.hierarchy import Hierarchy, HierarchySettings, \
    pixel_neighbor_table
from sph_tpu.models.image_hierarchy import ImageHierarchy
from sph_tpu.ops.graph import KnnGraph
from sph_tpu.ops.similarities import build_union_neighborhoods, \
    neighbor_overlap_distance
from sph_tpu.settings import (ComponentSim, ImageHierarchySettings,
                              NeighConnection, RandomWalkHandling,
                              RandomWalkSettings)


def test_pixel_neighbors_four_connected():
    # 4x6 grid (reference: HierarchyTest.cpp:78-155)
    t = pixel_neighbor_table(4, 6, NeighConnection.FOUR)
    # corner 0: right (1) and down (6)
    assert sorted(t[0][t[0] >= 0].tolist()) == [1, 6]
    # pixel 7 (row 1, col 1): up 1, left 6, right 8, down 13
    assert sorted(t[7][t[7] >= 0].tolist()) == [1, 6, 8, 13]
    # last pixel 23: up 17, left 22
    assert sorted(t[23][t[23] >= 0].tolist()) == [17, 22]


def test_pixel_neighbors_eight_connected():
    t = pixel_neighbor_table(4, 6, NeighConnection.EIGHT)
    assert sorted(t[7][t[7] >= 0].tolist()) == [0, 1, 2, 6, 8, 12, 13, 14]
    assert sorted(t[0][t[0] >= 0].tolist()) == [1, 6, 7]


def make_24pt_hierarchy():
    """The 3-level hand-built tree of HierarchyTest.cpp:157-228."""
    children1 = [[0, 1], [2, 3, 4], [5, 6, 7], [8, 9], [10, 11],
                 [12, 13, 14, 15, 16], [17, 20, 22], [18, 21], [19, 23]]
    children2 = [[0, 1, 2], [3, 4], [5, 8], [6, 7]]
    pix1 = np.zeros(24, dtype=np.int64)
    for cid, kids in enumerate(children1):
        pix1[kids] = cid
    lab12 = np.zeros(9, dtype=np.int64)
    for cid, kids in enumerate(children2):
        lab12[kids] = cid
    pix2 = lab12[pix1]
    h = Hierarchy(HierarchySettings(num_rows=4, num_cols=6))
    h.num_components = [24, 9, 4]
    h.pixel_components = [np.arange(24), pix1, pix2]
    h.parents = [pix1, lab12]
    return h


KNN_24 = np.array([
    [0, 1, 2], [1, 8, 9], [2, 4, 20], [3, 7, 15], [4, 16, 18], [5, 16, 0],
    [6, 3, 8], [7, 8, 10], [8, 4, 21], [9, 21, 0], [10, 9, 3], [11, 10, 12],
    [12, 11, 22], [13, 1, 3], [14, 9, 18], [15, 2, 11], [16, 6, 15],
    [17, 16, 18], [18, 1, 19], [19, 2, 23], [20, 23, 21], [21, 23, 15],
    [22, 17, 14], [23, 13, 12]], dtype=np.int32)


def test_represented_overlap_fixture():
    """Golden values from HierarchyTest.cpp:190-228."""
    h = make_24pt_hierarchy()

    def unions_at(level):
        return build_union_neighborhoods(KNN_24, h.pixel_components[level],
                                         h.num_components[level])

    u1 = unions_at(1)
    u2 = unions_at(2)

    def members(u, cid):
        return sorted(u.indices[cid][u.indices[cid] >= 0].tolist())

    # ComponentID{1,0} vs {2,0}
    assert members(u1, 0) == [0, 1, 2, 8, 9]
    assert members(u2, 0) == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 15, 16,
                              18, 20]
    inter = len(set(members(u1, 0)) & set(members(u2, 0)))
    assert inter == 5

    # {1,8} vs {1,0}: overlap 1
    assert members(u1, 8) == [2, 12, 13, 19, 23]
    d = neighbor_overlap_distance(u1, np.array([8]), np.array([0]))
    assert np.isclose(1.0 - d[0], 1.0 / 5.0)

    # {2,1} vs {2,2}: overlap 4
    assert members(u2, 1) == [0, 3, 4, 8, 9, 10, 11, 12, 21]
    assert members(u2, 2) == [1, 2, 3, 6, 9, 11, 12, 13, 14, 15, 16, 18,
                              19, 22, 23]
    d = neighbor_overlap_distance(u2, np.array([1]), np.array([2]))
    assert np.isclose(1.0 - d[0], 4.0 / 9.0)


KNN_4x4 = np.array([
    [0, 1, 2, 4], [1, 2, 3, 4], [2, 3, 4, 5], [3, 2, 5, 6],
    [4, 8, 12, 3], [5, 6, 7, 15], [6, 10, 7, 1], [7, 11, 0, 15],
    [8, 12, 2, 3], [9, 5, 0, 15], [10, 9, 0, 7], [11, 15, 12, 9],
    [12, 8, 2, 3], [13, 14, 7, 2], [14, 13, 2, 11], [15, 11, 12, 5],
], dtype=np.int32)


def test_image_hierarchy_overlap_4x4_golden():
    """Full mini-pipeline golden test (reference:
    testImageHierarchyOverlap, HierarchyTest.cpp:230-363)."""
    dist = np.zeros_like(KNN_4x4, dtype=np.float32)
    graph = KnnGraph(KNN_4x4, dist)
    data = np.full((16, 2), -1.0, dtype=np.float32)

    ih = ImageHierarchy(graph, data, 4, 4)
    ihs = ImageHierarchySettings(
        component_sim=ComponentSim.NEIGH_OVERLAP,
        neighbor_connection=NeighConnection.FOUR,
        merge_multiple=False, use_percentile=False)
    ih.compute(ihs, RandomWalkSettings())

    h = ih.hierarchy
    assert h.num_levels == 4
    assert h.pixel_components[0].tolist() == list(range(16))
    assert h.pixel_components[1].tolist() == [
        0, 0, 0, 0, 1, 2, 2, 3, 1, 2, 2, 3, 1, 4, 4, 3]
    assert h.pixel_components[2].tolist() == [
        0, 0, 0, 0, 0, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1]
    assert h.pixel_components[3].tolist() == [0] * 16

    assert h.parents[0].tolist() == [0, 0, 0, 0, 1, 2, 2, 3, 1, 2, 2, 3,
                                     1, 4, 4, 3]
    assert h.parents[1].tolist() == [0, 0, 1, 1, 1]
    assert h.parents[2].tolist() == [0, 0]

    ch1 = [c.tolist() for c in h.children_of(1)]
    assert ch1 == [[0, 1, 2, 3], [4, 8, 12], [5, 6, 9, 10], [7, 11, 15],
                   [13, 14]]
    ch2 = [c.tolist() for c in h.children_of(2)]
    assert ch2 == [[0, 1], [2, 3, 4]]
    ch3 = [c.tolist() for c in h.children_of(3)]
    assert ch3 == [[0, 1]]

    def spn(level, cid):
        row = h.spatial_neighbors_of(level)[cid]
        return sorted(row[row >= 0].tolist())

    assert spn(1, 0) == [1, 2, 3]
    assert spn(1, 1) == [0, 2, 4]
    assert spn(1, 2) == [0, 1, 3, 4]
    assert spn(1, 3) == [0, 2, 4]
    assert spn(1, 4) == [1, 2, 3]
    assert spn(2, 0) == [1]
    assert spn(2, 1) == [0]
    assert spn(3, 0) == []


def test_image_hierarchy_walks_smoke():
    """NEIGH_WALKS end-to-end on a small random-ish image: structural
    invariants (counts decrease, parents partition, walks normalized)."""
    from sph_tpu.utils.testdata import create_checker_image
    from sph_tpu.data import ImageStack
    from sph_tpu.ops.knn import knn_bruteforce

    img = create_checker_image(8, 8, channels=4, block=2, noise=0.02)
    stack = ImageStack.from_array(img)
    idx, dist = knn_bruteforce(stack.data, 8)
    graph = KnnGraph(idx, dist)

    ih = ImageHierarchy(graph, stack.data, 8, 8)
    ihs = ImageHierarchySettings(
        component_sim=ComponentSim.NEIGH_WALKS,
        merge_multiple=False, use_percentile=False)
    rws = RandomWalkSettings(num_random_walks=20, single_walk_length=6,
                             random_seed=2)
    ih.compute(ihs, rws)

    h = ih.hierarchy
    assert h.num_levels >= 2
    counts = h.num_components
    assert all(counts[i] > counts[i + 1] for i in range(len(counts) - 1))
    for l in range(1, h.num_levels):
        par = h.parents[l - 1]
        assert par.shape[0] == counts[l - 1]
        assert par.max() == counts[l] - 1
        w = h.random_walks[l]
        sums = w.row_sums()
        nz = w.row_nnz() > 0
        assert np.allclose(sums[nz], 1.0, atol=1e-3)
    # reduction stats recorded
    assert len(ih.stats.reduction_rates) >= h.num_levels - 1


def test_always_merge_halves_components():
    """maxDist == -1 forces every component to merge (reference debug assert
    ImageHierarchy.cpp:473-487: every level at most half the components)."""
    from sph_tpu.utils.testdata import create_checker_image
    from sph_tpu.data import ImageStack
    from sph_tpu.ops.knn import knn_bruteforce

    img = create_checker_image(6, 6, channels=3, block=3, noise=0.01)
    stack = ImageStack.from_array(img)
    idx, dist = knn_bruteforce(stack.data, 6)
    graph = KnnGraph(idx, dist)

    ih = ImageHierarchy(graph, stack.data, 6, 6)
    ihs = ImageHierarchySettings(
        component_sim=ComponentSim.NEIGH_WALKS,
        merge_multiple=False, use_percentile=False, max_dist=-1.0)
    rws = RandomWalkSettings(num_random_walks=10, single_walk_length=4,
                             random_seed=3)
    ih.compute(ihs, rws)
    counts = ih.hierarchy.num_components
    for i in range(len(counts) - 1):
        assert counts[i + 1] <= counts[i]


KNN_6x4 = np.concatenate([KNN_4x4, np.array([
    [16, 17, 18, 20], [17, 16, 19, 18], [18, 19, 16, 17], [19, 18, 17, 16],
    [20, 21, 22, 16], [21, 20, 22, 23], [22, 23, 21, 20], [23, 22, 20, 0],
], dtype=np.int32)])


def test_image_hierarchy_overlap_nonsquare_golden():
    """Non-square (6x4) image golden (reference: testNonRectImageOverlap,
    HierarchyTest.cpp:637-787)."""
    dist = np.zeros_like(KNN_6x4, dtype=np.float32)
    graph = KnnGraph(KNN_6x4, dist)
    data = np.full((24, 2), -1.0, dtype=np.float32)

    ih = ImageHierarchy(graph, data, 6, 4)
    ihs = ImageHierarchySettings(
        component_sim=ComponentSim.NEIGH_OVERLAP,
        neighbor_connection=NeighConnection.FOUR,
        rw_handling=RandomWalkHandling.MERGE_RW_NEW_WALKS,
        merge_multiple=False, use_percentile=False)
    ih.compute(ihs, RandomWalkSettings())

    h = ih.hierarchy
    assert h.num_levels == 4
    assert h.pixel_components[0].tolist() == list(range(24))
    assert h.pixel_components[1].tolist() == [
        0, 0, 0, 0, 1, 2, 2, 3, 1, 2, 2, 3, 1, 4, 4, 3,
        5, 5, 5, 5, 6, 6, 6, 6]
    assert h.pixel_components[2].tolist() == [
        0, 0, 0, 0, 0, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1,
        2, 2, 2, 2, 2, 2, 2, 2]
    assert h.pixel_components[3].tolist() == [0] * 24

    assert h.parents[0].tolist() == [0, 0, 0, 0, 1, 2, 2, 3, 1, 2, 2, 3,
                                     1, 4, 4, 3, 5, 5, 5, 5, 6, 6, 6, 6]
    assert h.parents[1].tolist() == [0, 0, 1, 1, 1, 2, 2]
    assert h.parents[2].tolist() == [0, 0, 0]

    ch1 = [c.tolist() for c in h.children_of(1)]
    assert ch1 == [[0, 1, 2, 3], [4, 8, 12], [5, 6, 9, 10], [7, 11, 15],
                   [13, 14], [16, 17, 18, 19], [20, 21, 22, 23]]
    ch2 = [c.tolist() for c in h.children_of(2)]
    assert ch2 == [[0, 1], [2, 3, 4], [5, 6]]
    ch3 = [c.tolist() for c in h.children_of(3)]
    assert ch3 == [[0, 1, 2]]

    def spn(level, cid):
        row = h.spatial_neighbors_of(level)[cid]
        return sorted(row[row >= 0].tolist())

    assert spn(1, 0) == [1, 2, 3]
    assert spn(1, 1) == [0, 2, 4, 5]
    assert spn(1, 2) == [0, 1, 3, 4]
    assert spn(1, 3) == [0, 2, 4, 5]
    assert spn(1, 4) == [1, 2, 3, 5]
    assert spn(1, 5) == [1, 3, 4, 6]
    assert spn(1, 6) == [5]
    assert spn(2, 0) == [1, 2]
    assert spn(2, 1) == [0, 2]
    assert spn(2, 2) == [0, 1]
    assert spn(3, 0) == []


def test_hierarchy_traversal_golden():
    """Represented-data-point traversal fixture (reference:
    testHierarchyTraversal, HierarchyTest.cpp:38-90)."""
    h = Hierarchy()
    h.num_components = [12, 5, 2]
    h.parents = [
        np.array([0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 4]),
        np.array([0, 0, 0, 1, 1]),
    ]
    h.pixel_components = [np.arange(12)]
    for par in h.parents:
        h.pixel_components.append(par[h.pixel_components[-1]])

    ch1 = [c.tolist() for c in h.children_of(1)]
    assert ch1 == [[0, 1], [2, 3, 4], [5, 6, 7], [8, 9], [10, 11]]
    ch2 = [c.tolist() for c in h.children_of(2)]
    assert ch2 == [[0, 1, 2], [3, 4]]

    rep1 = [r.tolist() for r in h.represented_points(1)]
    assert rep1[0] == [0, 1]
    rep2 = [r.tolist() for r in h.represented_points(2)]
    assert rep2[0] == [0, 1, 2, 3, 4, 5, 6, 7]
    assert rep2[1] == [8, 9, 10, 11]
    rep0 = [r.tolist() for r in h.represented_points(0)]
    assert rep0[5] == [5]


def test_adaptive_walk_length_policies():
    """The 7 RandomWalkReduction policies (reference:
    ImageHierarchy.cpp:504-548): rate per policy, clamp to [min_len, len0]."""
    from sph_tpu.settings import (RandomWalkHandling, RandomWalkReduction,
                                  RandomWalkSettings)
    from sph_tpu.ops.graph import KnnGraph

    def next_len(policy, rate_pct, cur=10, min_len=2):
        g = KnnGraph(np.array([[0, 1], [1, 0]], np.int32),
                     np.array([[0.0, 1.0], [0.0, 1.0]], np.float32))
        ih = ImageHierarchy(g, np.zeros((2, 2), np.float32), 1, 2)
        ih._ihs = ImageHierarchySettings(
            component_sim=ComponentSim.NEIGH_WALKS,
            rw_handling=RandomWalkHandling.MERGE_RW_NEW_WALKS,
            rw_reduction=policy)
        ih._rws = RandomWalkSettings(minimum_single_walk_length=min_len)
        ih._rw_lengths = [cur]
        ih._adapt_walk_length(rate_pct)
        return ih._rw_lengths[-1]

    R = RandomWalkReduction
    assert next_len(R.NONE, 30.0) == 10
    assert next_len(R.PROPORTIONAL_COMPONENT_REDUCTION, 30.0) == 3
    assert next_len(R.PROPORTIONAL_DOUBLE, 30.0) == 6
    assert next_len(R.PROPORTIONAL_HALF, 30.0) == 2     # 1.5 -> clamp min 2
    assert next_len(R.CONSTANT, 30.0) == 5
    assert next_len(R.CONSTANT_LOW, 30.0) == 7
    assert next_len(R.CONSTANT_HIGH, 30.0) == 2        # 2.5 -> int 2
    # rate > 100% clamps to 1.0 (never grows past the initial length)
    assert next_len(R.PROPORTIONAL_DOUBLE, 80.0) == 10
    # MERGE_RW_ONLY skips adaptation entirely
    g = KnnGraph(np.array([[0, 1], [1, 0]], np.int32),
                 np.array([[0.0, 1.0], [0.0, 1.0]], np.float32))
    ih = ImageHierarchy(g, np.zeros((2, 2), np.float32), 1, 2)
    ih._ihs = ImageHierarchySettings(
        component_sim=ComponentSim.NEIGH_WALKS,
        rw_handling=RandomWalkHandling.MERGE_RW_ONLY,
        rw_reduction=R.CONSTANT)
    ih._rws = RandomWalkSettings()
    ih._rw_lengths = [10]
    ih._adapt_walk_length(30.0)
    assert ih._rw_lengths == [10]
