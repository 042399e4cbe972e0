"""Edge-case robustness: tiny images, degenerate rows, single components
(mirrors the reference's 1-point short circuits and degenerate fallbacks)."""

import numpy as np
import pytest

from sph_tpu import (ComputeEmbedding, ComputeEmbeddingSettings,
                     ComputeHierarchy, ComponentSim, ImageHierarchySettings,
                     ImageStack, LevelSimilaritiesSettings,
                     NearestNeighborsSettings, RandomWalkSettings)
from sph_tpu.ops.sparse import SparseRows


def test_2x2_image_pipeline():
    data = np.array([[0, 0], [0, 0.1], [1, 1], [1, 0.9]], np.float32)
    ch = ComputeHierarchy().init(
        data, 2, 2,
        ihs=ImageHierarchySettings(component_sim=ComponentSim.NEIGH_WALKS,
                                   use_percentile=False),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_WALKS, ks=[3]),
        rws=RandomWalkSettings(num_random_walks=5, single_walk_length=3,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=3))
    ch.compute()
    h = ch.image_hierarchy.hierarchy
    assert h.num_components[0] == 4
    assert h.num_components[-1] >= 1


def test_uniform_image_degenerate_distances():
    # all pixels identical: every distance 0, sigma degenerate everywhere
    data = np.ones((16, 3), np.float32)
    ch = ComputeHierarchy().init(
        data, 4, 4,
        ihs=ImageHierarchySettings(component_sim=ComponentSim.NEIGH_WALKS,
                                   use_percentile=False),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_WALKS, ks=[4]),
        rws=RandomWalkSettings(num_random_walks=5, single_walk_length=3,
                               random_seed=2),
        nns=NearestNeighborsSettings(num_nearest_neighbors=4))
    ch.compute()
    pd = ch.level_similarities.get_prob_dist(0)
    assert np.all(np.isfinite(pd.values))


def test_umap_single_point():
    from sph_tpu.models.umap import UmapComputation
    u = UmapComputation()
    u.set_neighbor_matrix(SparseRows.from_dense(np.array([[1.0]],
                                                         np.float32)))
    u.compute()
    assert u.embedding.shape == (1, 2)


def test_umap_incremental_epochs():
    from sph_tpu.models.umap import UmapComputation, UmapParameters
    rng = np.random.default_rng(0)
    dense = rng.random((30, 30)).astype(np.float32)
    dense[dense < 0.7] = 0
    np.fill_diagonal(dense, 0)
    u = UmapComputation(UmapParameters(num_epochs=40, seed=1))
    u.set_neighbor_matrix(SparseRows.from_dense(dense))
    u.init_optimization()
    u.run_for_epochs(10)
    assert u.current_epoch == 10
    mid = u.embedding.copy()
    u.run_for_epochs(30)
    assert u.current_epoch == 40
    assert not np.allclose(mid, u.embedding)


def test_tsne_stop_flag():
    from sph_tpu.models.tsne import TsneComputation, TsneParameters
    rng = np.random.default_rng(1)
    dense = rng.random((20, 20)).astype(np.float32)
    np.fill_diagonal(dense, 0)
    dense /= dense.sum()
    t = TsneComputation(TsneParameters(num_iterations=50), block=24)
    t.set_probability_distribution(SparseRows.from_dense(dense))
    t.compute(10, verbose=False)
    it = t.current_iteration
    t.stop()
    t.continue_gradient_descent(10, verbose=False)
    assert t.current_iteration == it  # stopped: no progress
    t.reset_stop()
    t.continue_gradient_descent(10, verbose=False)
    assert t.current_iteration == it + 10


def test_scaler_zero_variance_channel():
    from sph_tpu.data import scale
    from sph_tpu.settings import Scaler
    data = np.zeros((10, 3), np.float32)
    data[:, 0] = np.arange(10)
    out = scale(data, Scaler.STANDARD)
    assert np.all(np.isfinite(out))
    out2 = scale(data, Scaler.UNIFORM)
    assert np.all(np.isfinite(out2))
