"""Ground-truth (eager) vs compiled parity — the JAX analogue of the
reference's no-OpenMP debug builds (§5.2), plus non-square image support."""

import numpy as np
import pytest

import jax.numpy as jnp

from sph_tpu.utils.profiling import ground_truth_mode


def test_gaussian_rows_jit_vs_eager():
    from sph_tpu.ops.distributions import gaussian_row_distributions
    rng = np.random.default_rng(0)
    d = np.sort(rng.random((12, 9)).astype(np.float32), axis=1)
    d[:, 0] = 0
    mask = np.ones_like(d, dtype=bool)
    compiled = np.asarray(gaussian_row_distributions(
        jnp.asarray(d), jnp.asarray(mask), jnp.float32(2.5)))
    with ground_truth_mode():
        eager = np.asarray(gaussian_row_distributions(
            jnp.asarray(d), jnp.asarray(mask), jnp.float32(2.5)))
    assert np.allclose(compiled, eager, atol=1e-6)


def test_repulsion_jit_vs_eager():
    from sph_tpu.models.tsne import _repulsive_forces
    rng = np.random.default_rng(1)
    y = rng.standard_normal((64, 2)).astype(np.float32)
    rep_c, z_c = _repulsive_forces(jnp.asarray(y), jnp.int32(60), 32)
    with ground_truth_mode():
        rep_e, z_e = _repulsive_forces(jnp.asarray(y), jnp.int32(60), 32)
    assert np.isclose(float(z_c), float(z_e), rtol=1e-6)
    assert np.allclose(np.asarray(rep_c), np.asarray(rep_e), atol=1e-5)


def test_non_square_image_pipeline():
    """rows != cols end-to-end (reference: non-rectangular fixtures,
    HierarchyTest.cpp:458+)."""
    from sph_tpu import (ComputeHierarchy, ComponentSim,
                         ImageHierarchySettings, ImageStack,
                         LevelSimilaritiesSettings,
                         NearestNeighborsSettings, RandomWalkSettings)
    from sph_tpu.utils.testdata import create_checker_image

    img = create_checker_image(6, 10, channels=3, block=3, noise=0.02)
    stack = ImageStack.from_array(img)
    assert stack.rows == 6 and stack.cols == 10
    ch = ComputeHierarchy().init(
        stack.data, stack.rows, stack.cols,
        ihs=ImageHierarchySettings(component_sim=ComponentSim.NEIGH_WALKS,
                                   use_percentile=False),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_WALKS, ks=[8]),
        rws=RandomWalkSettings(num_random_walks=10, single_walk_length=4,
                               random_seed=6),
        nns=NearestNeighborsSettings(num_nearest_neighbors=8))
    ch.compute()
    h = ch.image_hierarchy.hierarchy
    assert h.num_levels >= 2
    assert h.pixel_components[0].shape == (60,)
    # spatial adjacency respects the 6x10 grid: pixel 9 (row 0, col 9) has
    # no right neighbor
    t = h.spatial_neighbors_of(0)
    assert 10 >= t.shape[1] >= 4
    nbrs = sorted(t[9][t[9] >= 0].tolist())
    assert nbrs == [8, 19]


def test_profiler_annotation_smoke():
    from sph_tpu.utils.profiling import annotate, device_memory_stats
    with annotate("test-region"):
        _ = jnp.arange(8).sum()
    device_memory_stats()  # may be None on CPU; must not raise
