"""Stats / histogram / progress / vis smoke tests (reference: Statistics,
Histogram, ProgressBar utilities + the vis app's render paths)."""

import os

import numpy as np
import pytest

from sph_tpu.ops.histogram import Histogram
from sph_tpu.ops.sparse import SparseRows
from sph_tpu.utils.progress import ProgressBar
from sph_tpu.utils.stats import SparseMatrixStats, print_sparse_matrix_stats


def test_sparse_matrix_stats():
    sr = SparseRows.from_dense(np.array([[0, 1, 0], [2, 0, 3], [0, 0, 0]],
                                        np.float32))
    s = SparseMatrixStats.of(sr)
    assert s.non_zeros == 3
    assert s.total_entries == 9
    assert np.isclose(s.average_non_zeros, 1.0)
    assert np.isclose(s.sparsity, 1 - 3 / 9)
    print_sparse_matrix_stats(sr, "test")


def test_histogram_under_overflow():
    h = Histogram.create([-1, 0.1, 0.5, 0.9, 2.0], 4, lo=0.0, hi=1.0)
    assert h.underflow == 1
    assert h.overflow == 1
    assert h.counts.sum() == 3
    assert h.total() == 5
    assert h.num_bins == 4
    assert len(h.bin_centers()) == 4


def test_histogram_auto_range():
    h = Histogram.create(np.linspace(2, 4, 100), 10)
    assert h.underflow == 0 and h.overflow == 0
    assert h.counts.sum() == 100


def test_progress_bar():
    p = ProgressBar(10, verbose=False)
    for _ in range(10):
        p.update()
    p.finish()
    assert p.count == 10
    p.reset(5)
    assert p.count == 0 and p.total == 5


def test_vis_renders(tmp_path):
    from sph_tpu.vis import (plot_embedding, plot_knn_edges, plot_level_map,
                             plot_walk_mass)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((50, 2)).astype(np.float32)
    p1 = plot_embedding(emb, np.arange(50) % 3,
                        str(tmp_path / "emb.png"), "test")
    assert os.path.getsize(p1) > 1000

    labels = (np.arange(36) // 6).astype(np.int64)
    p2 = plot_level_map(labels, 6, 6, str(tmp_path / "lvl.png"))
    assert os.path.getsize(p2) > 1000

    pts = rng.standard_normal((30, 3)).astype(np.float32)
    idx = np.stack([np.arange(30), (np.arange(30) + 1) % 30], 1)
    p3 = plot_knn_edges(pts, idx.astype(np.int32),
                        str(tmp_path / "knn.png"))
    assert os.path.getsize(p3) > 1000

    walks = SparseRows.from_dense(
        rng.random((30, 30)).astype(np.float32) * (rng.random((30, 30)) > 0.8))
    p4 = plot_walk_mass(pts, walks, 0, str(tmp_path / "walks.png"))
    assert os.path.getsize(p4) > 1000


def test_vis_hierarchy_levels(tmp_path):
    from sph_tpu.models.hierarchy import Hierarchy, HierarchySettings
    from sph_tpu.vis import plot_hierarchy_levels
    h = Hierarchy(HierarchySettings(num_rows=4, num_cols=4))
    h.init_first_level(16)
    h.num_components.append(4)
    h.pixel_components.append(np.repeat(np.arange(4), 4))
    paths = plot_hierarchy_levels(h, 4, 4, str(tmp_path))
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)


def test_scaler_robust_and_none():
    """ROBUST = clamp to global 95-percentile, divide by it (reference:
    Scaler.cpp:32-45); NONE is identity."""
    from sph_tpu import Scaler, scale
    rng = np.random.default_rng(7)
    data = rng.random((200, 4)).astype(np.float32) * 10
    out = scale(data, Scaler.ROBUST)
    assert out.max() <= 1.0 + 1e-6
    assert out.min() >= 0.0
    from sph_tpu.ops.math import compute_quantile
    q95 = compute_quantile(data.ravel(), 0.95, interpolation=1)
    assert np.allclose(out, np.clip(data, 0, q95) / q95, atol=1e-6)
    assert np.array_equal(scale(data, Scaler.NONE), data)


def test_knn_inner_product_metric():
    """INNER_PRODUCT: ascending 'distance' = descending similarity; self is
    its own best match for non-negative data (reference: Knn.cpp
    knn_inner_product heaps, :56-108)."""
    from sph_tpu.ops.knn import knn_bruteforce
    from sph_tpu.settings import KnnMetric
    rng = np.random.default_rng(8)
    data = rng.random((64, 5)).astype(np.float32) + 0.1
    idx, dist = knn_bruteforce(data, 5, metric=KnnMetric.INNER_PRODUCT)
    ips = data @ data.T
    for i in range(64):
        top = np.argsort(-ips[i], kind="stable")[:5]
        # self-first invariant: self is forced into slot 0 (displacing the
        # last neighbor when it wasn't in the raw top-k, like the
        # reference's ensureClosestPointIsSelf, GraphUtils.cpp:23-96)
        assert idx[i][0] == i
        assert set(idx[i][1:]) <= set(top)
        if top[0] == i:
            # no swap happened: negated inner products stay ascending.
            # (After a self swap the displaced neighbor keeps its slot out
            # of order — the reference's std::swap does the same,
            # GraphUtils.cpp:78-80.)
            assert np.all(np.diff(dist[i][1:]) >= 0)
