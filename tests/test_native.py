"""Native C++ graph ops vs numpy fallbacks (the native path mirrors the
reference's C++ GraphUtils/Boost implementations)."""

import numpy as np
import pytest

from sph_tpu import native
from sph_tpu.ops.graph import (KnnGraph, edge_list_components,
                               symmetrize_graph, weak_connected_components)


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native lib unavailable")


def random_graph(n=300, k=6, seed=0):
    rng = np.random.default_rng(seed)
    idx = np.empty((n, k), dtype=np.int32)
    idx[:, 0] = np.arange(n)
    for i in range(n):
        idx[i, 1:] = rng.choice(n, k - 1, replace=False)
    dist = np.sort(rng.random((n, k)).astype(np.float32), axis=1)
    dist[:, 0] = 0
    return KnnGraph(idx, dist)


@needs_native
def test_native_builds():
    assert native.get_lib() is not None


@needs_native
def test_weak_components_native_matches_scipy():
    g = random_graph(500, 4, seed=3)
    ncc_n, lab_n = weak_connected_components(g, use_native=True)
    ncc_s, lab_s = weak_connected_components(g, use_native=False)
    assert ncc_n == ncc_s
    assert np.array_equal(lab_n, lab_s)


@needs_native
def test_edge_list_components_native_matches():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 100, 80)
    dst = rng.integers(0, 100, 80)
    ncc_n, lab_n = edge_list_components(100, src, dst, use_native=True)
    ncc_s, lab_s = edge_list_components(100, src, dst, use_native=False)
    assert ncc_n == ncc_s
    assert np.array_equal(lab_n, lab_s)


@needs_native
def test_symmetrize_native_matches_numpy():
    g = random_graph(200, 5, seed=7)
    a = symmetrize_graph(g, use_native=True)
    b = symmetrize_graph(g, use_native=False)
    assert a.num_points == b.num_points
    assert np.array_equal(a.counts, b.counts)
    for i in range(200):
        ia, da = a.row(i)
        ib, db = b.row(i)
        # same neighbor sets and distances (order may differ on exact ties)
        assert sorted(ia.tolist()) == sorted(ib.tolist())
        assert np.allclose(np.sort(da), np.sort(db))
        assert ia[0] == i and da[0] == 0
        assert np.all(np.diff(da) >= 0)


@needs_native
def test_symmetrize_min_dedup_native():
    # 0->1 d=1 and 1->0 d=3: sym keeps 1
    idx = np.array([[0, 1], [1, 0], [2, 0]], dtype=np.int32)
    dist = np.array([[0, 1], [0, 3], [0, 5]], dtype=np.float32)
    g = symmetrize_graph(KnnGraph(idx, dist), use_native=True)
    i0, d0 = g.row(0)
    assert i0.tolist() == [0, 1, 2]
    assert np.allclose(d0, [0, 1, 5])


def test_native_merge_sum_matches_numpy():
    """The single-pass C++ merge must agree with the numpy path: identical
    entry layout, values equal up to f32 summation order (numpy reduceat is
    pairwise; C++ is sequential — same class of reordering as the
    reference's OpenMP accumulation)."""
    import os
    import numpy as np
    import sph_tpu.native as nat
    from sph_tpu.ops.sparse import SparseRows, _compact, \
        merge_rows_by_parents

    if nat.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(3)
    n, r = 3000, 24
    idx = np.sort(rng.integers(0, n, (n, r)).astype(np.int32), axis=1)
    dup = np.zeros_like(idx, bool)
    dup[:, 1:] = idx[:, 1:] == idx[:, :-1]
    idx = np.where(dup, -1, idx)
    val = np.where(idx >= 0, rng.random((n, r)).astype(np.float32), 0)
    sr = _compact(idx, val, n)
    parents = rng.integers(0, 700, n)

    for wbs in (True, False):
        out_nat = merge_rows_by_parents(sr, parents, 700,
                                        weight_by_size=wbs)
        os.environ["SPH_TPU_NO_NATIVE"] = "1"
        nat._lib = None
        nat._tried = False
        try:
            out_np = merge_rows_by_parents(sr, parents, 700,
                                           weight_by_size=wbs)
        finally:
            del os.environ["SPH_TPU_NO_NATIVE"]
            nat._lib = None
            nat._tried = False
        assert np.array_equal(out_nat.indices, out_np.indices)
        assert np.allclose(out_nat.values, out_np.values,
                           rtol=1e-5, atol=1e-7)


@needs_native
def test_weak_components_rejects_out_of_domain():
    """Out-of-domain neighbor ids must not corrupt memory: the native kernel
    returns -1 and the wrapper falls back (ADVICE r1)."""
    idx = np.array([[0, 1], [1, 999]], dtype=np.int32)  # 999 >= n
    assert native.weak_components(idx) is None
    # (the scipy fallback then raises a clean ValueError on such input —
    # an error, not silent memory corruption)


@needs_native
def test_edge_list_components_rejects_out_of_domain():
    src = np.array([0, 5], dtype=np.int64)  # 5 >= n
    dst = np.array([1, 1], dtype=np.int64)
    assert native.edge_list_components(3, src, dst) is None


@needs_native
def test_symmetrize_rejects_out_of_domain():
    idx = np.array([[0, 7], [1, 0]], dtype=np.int32)  # 7 >= n
    dist = np.array([[0, 1], [0, 1]], dtype=np.float32)
    assert native.symmetrize(idx, dist) is None
    # public API falls back to numpy and still raises/handles? the numpy
    # fallback clips nothing — it should still produce a graph over valid
    # ids only if the caller passes a well-formed graph; here we only
    # assert the native path refuses instead of reading out of bounds.


def test_umap_negative_sampling_coincident_push():
    """Coincident negative pairs (d2n == 0) must receive the constant +4
    push per dimension like umap-learn, not zero (ADVICE r1)."""
    import jax.numpy as jnp
    from sph_tpu.models.umap import _epoch_update
    import jax

    # two points at the same location; one scheduled edge 0->1
    y = jnp.zeros((2, 2), jnp.float32)
    src = jnp.array([0], jnp.int32)
    dst = jnp.array([1], jnp.int32)
    eps = jnp.array([1.0], jnp.float32)
    next_sample = jnp.array([0.0], jnp.float32)
    key = jax.random.PRNGKey(0)
    y2, _ = _epoch_update(y, src, dst, eps, next_sample, jnp.float32(0),
                          jnp.float32(1.0), jnp.float32(1.577),
                          jnp.float32(0.895), key, jnp.int32(2), 5)
    # attraction between coincident points is 0, so any movement comes
    # from the coincident-negative +4 push; with 5 negative samples at
    # n_valid=2 some draw != src, so the source point must have moved
    assert float(jnp.abs(y2[0]).sum()) > 0.0
