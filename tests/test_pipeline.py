"""End-to-end pipeline tests: the full four-stage flow on a small image
(reference: the SPHTests end-to-end mini-pipeline style,
tests/HierarchyTest.cpp:230+, plus the eval driver path)."""

import numpy as np
import pytest

from sph_tpu import (ComputeEmbedding, ComputeEmbeddingSettings,
                     ComputeHierarchy, ComponentSim, ImageHierarchySettings,
                     ImageStack, LevelSimilaritiesSettings,
                     NearestNeighborsSettings, NormalizationScheme,
                     RandomWalkSettings, Scaler, scale)
from sph_tpu.settings import CacheSettings
from sph_tpu.utils.testdata import create_checker_image


def small_image(rows=10, cols=10):
    img = create_checker_image(rows, cols, channels=4, block=5, noise=0.03)
    return ImageStack.from_array(img, name="checker")


def run_pipeline(tmp_path=None, component_sim=ComponentSim.NEIGH_WALKS,
                 cache=None, norm=NormalizationScheme.TSNE):
    stack = small_image()
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, stack.rows, stack.cols,
        ihs=ImageHierarchySettings(component_sim=component_sim,
                                   merge_multiple=False,
                                   use_percentile=False),
        lss=LevelSimilaritiesSettings(
            component_sim=component_sim, ks=[13],
            normalize_prob_dist=norm,
            compute_symmetric_prob_dist=norm),
        rws=RandomWalkSettings(num_random_walks=20, single_walk_length=6,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=13),
        cache=cache)
    ch.compute()
    return ch


def test_full_pipeline_neigh_walks():
    ch = run_pipeline()
    h = ch.image_hierarchy.hierarchy
    assert h.num_levels >= 2
    # every level has a symmetrized probdist
    for level in range(h.num_levels):
        pd = ch.level_similarities.get_prob_dist(level)
        assert pd.num_rows == h.num_components[level]
        nz = pd.row_nnz() > 0
        if h.num_components[level] > 1:
            assert nz.sum() > 0
        # TSNE symmetrization: p[i][j] == p[j][i]
        d = pd.to_dense()
        assert np.allclose(d, d.T, atol=1e-5)


def test_pipeline_embeddings_all_levels():
    ch = run_pipeline()
    h = ch.image_hierarchy.hierarchy
    s = ComputeEmbeddingSettings()
    s.tsne.num_iterations = 120
    s.umap.num_epochs = 60
    ce = ComputeEmbedding(s)
    for level in range(h.num_levels):
        pd = ch.level_similarities.get_prob_dist(level)
        emb = ce.compute_tsne(pd)
        assert emb.shape == (h.num_components[level], 2)
        assert np.all(np.isfinite(emb))
    # UMAP on level 1
    pd = ch.level_similarities.get_prob_dist(min(1, h.num_levels - 1))
    emb = ce.compute_umap(pd)
    assert np.all(np.isfinite(emb))


def test_pipeline_euclid_centroid():
    ch = run_pipeline(component_sim=ComponentSim.EUCLID_CENTROID)
    h = ch.image_hierarchy.hierarchy
    assert h.num_levels >= 2
    for level in range(1, h.num_levels):
        # kNN-metric path produced per-level distance graphs
        if h.num_components[level] > 1:
            pd = ch.level_similarities.get_prob_dist(level)
            assert pd.row_nnz().max() > 0


def test_pipeline_neigh_overlap():
    ch = run_pipeline(component_sim=ComponentSim.NEIGH_OVERLAP)
    assert ch.image_hierarchy.hierarchy.num_levels >= 2


def test_pipeline_cache_roundtrip(tmp_path):
    cache = CacheSettings(path=str(tmp_path), file_name="t",
                          cache_active=True)
    ch1 = run_pipeline(cache=cache)
    h1 = ch1.image_hierarchy.hierarchy
    pd1 = ch1.level_similarities.get_prob_dist(1)

    # second run: all stages load from cache
    ch2 = run_pipeline(cache=CacheSettings(path=str(tmp_path),
                                           file_name="t",
                                           cache_active=True))
    h2 = ch2.image_hierarchy.hierarchy
    assert h1.num_components == h2.num_components
    for a, b in zip(h1.parents, h2.parents):
        assert np.array_equal(a, b)
    pd2 = ch2.level_similarities.get_prob_dist(1)
    assert np.allclose(pd1.to_dense(), pd2.to_dense())


def test_pipeline_cache_invalidation(tmp_path):
    cache = CacheSettings(path=str(tmp_path), file_name="t",
                          cache_active=True)
    run_pipeline(cache=cache)

    # different settings must refuse the cache (reference: checkEntry)
    stack = small_image()
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, stack.rows, stack.cols,
        ihs=ImageHierarchySettings(component_sim=ComponentSim.NEIGH_WALKS,
                                   merge_multiple=True,   # changed
                                   use_percentile=False),
        lss=LevelSimilaritiesSettings(component_sim=ComponentSim.NEIGH_WALKS,
                                      ks=[13]),
        rws=RandomWalkSettings(num_random_walks=20, single_walk_length=6),
        nns=NearestNeighborsSettings(num_nearest_neighbors=13),
        cache=CacheSettings(path=str(tmp_path), file_name="t",
                            cache_active=True))
    ch.compute()  # should recompute hierarchy + levels without error
    assert ch.image_hierarchy.hierarchy.num_levels >= 2


def test_pipeline_umap_normalization():
    ch = run_pipeline(norm=NormalizationScheme.UMAP)
    h = ch.image_hierarchy.hierarchy
    pd = ch.level_similarities.get_prob_dist(h.num_levels - 1)
    d = pd.to_dense()
    # UMAP fuzzy-union symmetrization keeps values in [0, 1]
    assert d.max() <= 1.0 + 1e-5
    assert np.allclose(d, d.T, atol=1e-5)


def test_cache_parent_recompute_invalidates_children(tmp_path):
    """A recomputed parent stage must invalidate child caches (reference:
    cacheDependencyIsValid — only loadCache marks a stage valid)."""
    cache = CacheSettings(path=str(tmp_path), file_name="t",
                          cache_active=True)
    ch1 = run_pipeline(cache=cache)
    h1 = ch1.image_hierarchy.hierarchy

    # same hierarchy/level settings but different kNN settings: the kNN
    # stage recomputes, so the hierarchy cache (built on the old graph)
    # must NOT load
    stack = small_image()
    data = scale(stack.data, Scaler.STANDARD)
    ch2 = ComputeHierarchy().init(
        data, stack.rows, stack.cols,
        ihs=ImageHierarchySettings(component_sim=ComponentSim.NEIGH_WALKS,
                                   merge_multiple=False,
                                   use_percentile=False),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_WALKS, ks=[9]),
        rws=RandomWalkSettings(num_random_walks=20, single_walk_length=6,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=9),  # changed
        cache=CacheSettings(path=str(tmp_path), file_name="t",
                            cache_active=True))
    ch2.compute()
    # recomputation happened: the stage cache marked 'nns' as not-loaded,
    # so hierarchy/levels recomputed against the new 9-NN graph
    assert ch2._cache._loaded_ok.get("nns") is False
    assert ch2._cache._loaded_ok.get("ihs") is False


def test_default_settings_seed_ks():
    """Library use without an explicit k schedule (the reference README's
    basic-usage flow, README.md:10-29): ComputeHierarchy seeds lss.ks from
    the data-level kNN like the eval driver does (RunEvaluation.cpp:268)."""
    stack = small_image()
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, stack.rows, stack.cols,
        ihs=ImageHierarchySettings(component_sim=ComponentSim.NEIGH_WALKS),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_WALKS),  # ks left empty
        rws=RandomWalkSettings(num_random_walks=10, single_walk_length=5),
        nns=NearestNeighborsSettings(num_nearest_neighbors=13))
    ch.compute()
    h = ch.image_hierarchy.hierarchy
    ks = ch.level_similarities._lss.ks
    assert ks[0] == 13
    assert len(ks) == h.num_levels
    for level in range(h.num_levels):
        pd = ch.level_similarities.get_prob_dist(level)
        assert pd.num_rows == h.num_components[level]


def test_pipeline_pinned_fingerprint():
    """The canonical 8x8 checker pipeline fingerprint (also recorded in the
    verify skill): pins level counts across refactors. Verified identical
    on round-1 HEAD c886d47 and the round-2 device-restructuring path."""
    img = create_checker_image(8, 8, channels=4, block=2, noise=0.02)
    stack = ImageStack.from_array(img)
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, 8, 8,
        ihs=ImageHierarchySettings(),
        lss=LevelSimilaritiesSettings(ks=[8]),
        rws=RandomWalkSettings(num_random_walks=10, single_walk_length=5,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=8))
    ch.compute()
    assert ch.image_hierarchy.hierarchy.num_components == [64, 19, 2, 1]
