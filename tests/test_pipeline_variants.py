"""Pipeline variant coverage: GEO similarities, percentile thresholds,
merge-multiple, and all four RandomWalkHandling modes (reference: the eval
grid axes, eval_settings.json)."""

import numpy as np
import pytest

from sph_tpu import (ComputeHierarchy, ComponentSim, ImageHierarchySettings,
                     ImageStack, LevelSimilaritiesSettings,
                     NearestNeighborsSettings, NormalizationScheme,
                     RandomWalkHandling, RandomWalkSettings, Scaler, scale)
from sph_tpu.utils.testdata import create_checker_image


def build(component_sim, rw_handling=RandomWalkHandling.MERGE_RW_ONLY,
          merge_multiple=False, use_percentile=False, max_dist=0.0,
          rows=8, cols=8, sym=False, connect=False,
          num_geodesic_samples=0):
    img = create_checker_image(rows, cols, channels=4, block=4, noise=0.03)
    stack = ImageStack.from_array(img)
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, stack.rows, stack.cols,
        ihs=ImageHierarchySettings(
            component_sim=component_sim, merge_multiple=merge_multiple,
            use_percentile=use_percentile, max_dist=max_dist,
            rw_handling=rw_handling,
            num_geodesic_samples=num_geodesic_samples),
        lss=LevelSimilaritiesSettings(
            component_sim=component_sim, ks=[10],
            force_compute_distances=False),
        rws=RandomWalkSettings(num_random_walks=15, single_walk_length=5,
                               random_seed=4),
        nns=NearestNeighborsSettings(num_nearest_neighbors=10,
                                     symmetric_neighbors=sym,
                                     compute_connect_components=connect,
                                     neighbor_connect_components=connect))
    ch.compute()
    return ch


def check_basic(ch):
    h = ch.image_hierarchy.hierarchy
    assert h.num_levels >= 2
    counts = h.num_components
    assert all(counts[i] > counts[i + 1] for i in range(len(counts) - 1))
    for level in range(h.num_levels):
        pd = ch.level_similarities.get_prob_dist(level)
        assert pd.num_rows == counts[level]
        assert np.all(np.isfinite(pd.values))
    return h


def test_geo_centroid_pipeline():
    ch = build(ComponentSim.GEO_CENTROID, sym=True, connect=True,
               num_geodesic_samples=8)
    check_basic(ch)


def test_geo_walks_pipeline():
    ch = build(ComponentSim.GEO_WALKS, sym=True, connect=True,
               num_geodesic_samples=8)
    check_basic(ch)


def test_merge_rw_new_walks():
    ch = build(ComponentSim.NEIGH_WALKS,
               rw_handling=RandomWalkHandling.MERGE_RW_NEW_WALKS)
    h = check_basic(ch)
    # new walks are row-normalized at every level
    for w in h.random_walks:
        nz = w.row_nnz() > 0
        assert np.allclose(w.row_sums()[nz], 1.0, atol=1e-3)


def test_merge_rw_new_walks_and_knn():
    ch = build(ComponentSim.NEIGH_WALKS,
               rw_handling=RandomWalkHandling.MERGE_RW_NEW_WALKS_AND_KNN)
    h = check_basic(ch)
    # the AND_KNN path computes per-level distance graphs in walk space
    for level in range(1, h.num_levels):
        if h.num_components[level] > 1:
            assert ch.level_similarities.distance_graphs[level] is not None


def test_merge_data_new_walks():
    ch = build(ComponentSim.NEIGH_WALKS,
               rw_handling=RandomWalkHandling.MERGE_DATA_NEW_WALKS)
    h = check_basic(ch)
    # merged data graphs tracked per level
    assert len(h.merged_data_graphs) == h.num_levels


def test_percentile_threshold_merges_less():
    ch_all = build(ComponentSim.NEIGH_WALKS)
    ch_pct = build(ComponentSim.NEIGH_WALKS, use_percentile=True,
                   max_dist=0.3)
    # a 30th-percentile threshold merges fewer components per level
    assert (ch_pct.image_hierarchy.hierarchy.num_components[1]
            >= ch_all.image_hierarchy.hierarchy.num_components[1])


def test_merge_multiple_reduces_faster():
    ch_min = build(ComponentSim.NEIGH_WALKS)
    ch_all = build(ComponentSim.NEIGH_WALKS, merge_multiple=True)
    # merge-all collapses at least as fast as merge-min on level 1
    assert (ch_all.image_hierarchy.hierarchy.num_components[1]
            <= ch_min.image_hierarchy.hierarchy.num_components[1])


def test_single_overlap_sim_pipeline():
    ch = build(ComponentSim.NEIGH_WALKS_SINGLE_OVERLAP)
    check_basic(ch)
