"""Golden fixtures ported from the reference's UtilsTests (exact expected
values: quantile table UtilsTests.cpp:89-211, 5x5 UMAP/TSNE symmetrization
matrices :1128-1226)."""

import numpy as np
import pytest

from sph_tpu.ops.math import compute_quantile
from sph_tpu.ops.sparse import SparseRows, symmetrize_tsne, symmetrize_umap

QVEC = np.array([-1, 3, 7, 5, 2, 5, 3, 6, 7, 8, 1, -1, -1, 9],
                dtype=np.float32)


@pytest.mark.parametrize("q,plain,ignore,linear", [
    (0.0, -1.0, 1.0, -1.0),
    (1.0, 9.0, 9.0, 9.0),
    (0.2, 0.0, 3.0, 0.2),
    (0.35, 2.5, 4.0, 2.55),
])
def test_quantile_reference_table(q, plain, ignore, linear):
    assert np.isclose(compute_quantile(QVEC, q), plain, atol=1e-4)
    assert np.isclose(compute_quantile(QVEC, q, ignore_vals=(-1.0,)),
                      ignore, atol=1e-4)
    assert np.isclose(compute_quantile(QVEC, q, interpolation=1), linear,
                      atol=1e-4)


SYM_IN = np.array([
    [0.0, 0.14390016, 0.06372394, 0.0, 0.07803991],
    [0.74610553, 0.0, 0.13938483, 0.22019774, 0.61344256],
    [0.0, 0.73846202, 0.0, 0.61216056, 0.82782903],
    [0.47865895, 0.65175803, 0.56427383, 0.0, 0.32879395],
    [0.68851214, 0.91365522, 0.61616717, 0.11410742, 0.0]], np.float32)

SYM_UMAP = np.array([
    [0.0, 0.78264098, 0.06372394, 0.47865895, 0.71282063],
    [0.78264098, 0.0, 0.77491645, 0.72844012, 0.96662278],
    [0.06372394, 0.77491645, 0.0, 0.83100821, 0.93391513],
    [0.47865895, 0.72844012, 0.83100821, 0.0, 0.40538354],
    [0.71282063, 0.96662278, 0.93391513, 0.40538354, 0.0]], np.float32)

SYM_TSNE = np.array([
    [0.0, 0.44500284, 0.03186197, 0.23932948, 0.38327603],
    [0.44500284, 0.0, 0.43892343, 0.43597789, 0.76354889],
    [0.03186197, 0.43892343, 0.0, 0.58821719, 0.7219981],
    [0.23932948, 0.43597789, 0.58821719, 0.0, 0.22145069],
    [0.38327603, 0.76354889, 0.7219981, 0.22145069, 0.0]], np.float32)


def test_symmetrize_umap_reference_matrix():
    out = symmetrize_umap(SparseRows.from_dense(SYM_IN)).to_dense()
    assert np.allclose(out, SYM_UMAP, atol=1e-6)
    assert np.allclose(out, out.T)


def test_symmetrize_tsne_reference_matrix():
    out = symmetrize_tsne(SparseRows.from_dense(SYM_IN)).to_dense()
    assert np.allclose(out, SYM_TSNE, atol=1e-6)
    assert np.allclose(out, out.T)


KNN_24_CC = np.array([
    [0, 1, 2], [1, 8, 9], [2, 4, 20], [3, 7, 15], [4, 16, 18], [5, 16, 0],
    [6, 3, 8], [7, 8, 10], [8, 4, 21], [9, 21, 0], [10, 9, 3], [11, 10, 12],
    [12, 11, 22], [13, 1, 3], [14, 9, 18], [15, 2, 11], [16, 6, 15],
    [17, 16, 18], [18, 1, 19], [19, 2, 23], [20, 23, 21], [21, 23, 15],
    [22, 17, 14], [23, 13, 12]], dtype=np.int32)


def test_cc_labeling_reference_fixture():
    """Reference: UtilsTests.cpp:274-340 — the 24-point graph where node 5
    has out-edges but no in-edges: weak CC = 1, strong CC = 2 with {5}
    isolated."""
    from sph_tpu.ops.graph import (KnnGraph, strong_connected_components,
                                   weak_connected_components)
    g = KnnGraph(KNN_24_CC, np.zeros_like(KNN_24_CC, dtype=np.float32))
    ncc, labels = weak_connected_components(g)
    assert ncc == 1
    assert np.all(labels == 0)
    nscc, slabels = strong_connected_components(g)
    assert nscc == 2
    # {5} alone; everyone else together
    assert (slabels == slabels[5]).sum() == 1


def test_merge_nodes_reference_fixture():
    """Golden merge fixture (reference: testMergeNodesSynth,
    HierarchyTest.cpp:787-890): 9 nodes -> 3 parents, unweighted sum
    merge must reproduce the exact merged matrix."""
    from sph_tpu.ops.sparse import SparseRows, merge_rows_by_parents
    dense = np.zeros((9, 9), np.float32)
    entries = [(0, 1, 7), (0, 2, 8), (1, 0, 9), (1, 2, 11), (1, 8, 6),
               (2, 0, 4), (2, 1, 2), (2, 3, 3), (2, 5, 13), (3, 2, 1),
               (3, 4, 7), (3, 5, 5), (4, 3, 9), (4, 6, 19), (5, 2, 2),
               (5, 3, 6), (5, 6, 21), (6, 4, 5), (6, 5, 9), (6, 7, 3),
               (6, 8, 8), (7, 6, 5), (7, 8, 9), (8, 1, 4), (8, 6, 6),
               (8, 7, 2)]
    for r, c, v in entries:
        dense[r, c] = v
    # NOTE: the reference's printed data-level matrix shows row 6 as
    # [0 0 0 0 6 9 0 3 8] but the inserted value is (6,4)=5; we follow the
    # inserted values (the asserts below match the reference's REQUIREs)
    sr = SparseRows.from_dense(dense)
    parents = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    merged = merge_rows_by_parents(sr, parents, 3, norm=False,
                                   weight_by_size=False)
    expect = np.array([[41, 16, 6], [3, 27, 40], [4, 14, 33]], np.float32)
    assert np.allclose(merged.to_dense(), expect)
