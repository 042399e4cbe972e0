"""Distribution kernel tests: perplexity targets, sum-to-one invariants,
degenerate fallbacks (mirrors reference debug asserts in
GraphNormalization.cpp:295-326 and HDILibHelper semantics)."""

import numpy as np
import jax.numpy as jnp

from sph_tpu.ops.distributions import (gaussian_row_distributions,
                                       linear_row_distributions,
                                       normalize_knn_distances,
                                       smooth_knn_distributions)
from sph_tpu.settings import NormalizationScheme


def scalar_beta_search(dists, perplexity, ignore0=True):
    """Direct scalar transcription of HDILibHelper.hpp:23-109 for one row."""
    beta, lo, hi = 1.0, -np.finfo(np.float64).max, np.finfo(np.float64).max
    p = np.zeros_like(dists, dtype=np.float64)
    for _ in range(200):
        for i, d in enumerate(dists):
            p[i] = 0.0 if (ignore0 and i == 0) else np.exp(-beta * d)
        s = p.sum() + np.finfo(np.float64).tiny
        h = beta * (dists * p).sum() / s + np.log(s)
        hdiff = h - np.log(perplexity)
        if abs(hdiff) < 1e-6:
            return p / s
        if hdiff > 0:
            lo = beta
            beta = beta * 2 if hi >= np.finfo(np.float64).max else (
                beta + hi) / 2
        else:
            hi = beta
            beta = beta / 2 if lo <= -np.finfo(np.float64).max else (
                beta + lo) / 2
    return np.full(len(dists), 1.0 / (len(dists) - (1 if ignore0 else 0)))


def test_gaussian_matches_scalar_reference():
    rng = np.random.default_rng(0)
    d = np.sort(rng.random((16, 12)).astype(np.float32), axis=1)
    d[:, 0] = 0.0
    mask = np.ones_like(d, dtype=bool)
    p = np.asarray(gaussian_row_distributions(
        jnp.asarray(d), jnp.asarray(mask), jnp.float32(3.0)))
    for r in range(16):
        ref = scalar_beta_search(d[r].astype(np.float64), 3.0)
        assert np.allclose(p[r], ref, atol=2e-4), r
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-3)
    assert np.all(p[:, 0] == 0)


def test_gaussian_rows_sum_to_one_masked():
    rng = np.random.default_rng(1)
    d = np.sort(rng.random((8, 10)).astype(np.float32), axis=1)
    d[:, 0] = 0
    mask = np.ones_like(d, dtype=bool)
    mask[:, 7:] = False  # ragged rows
    p = np.asarray(gaussian_row_distributions(
        jnp.asarray(d), jnp.asarray(mask), jnp.float32(2.0)))
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-3)
    assert np.all(p[:, 7:] == 0)


def test_gaussian_degenerate_all_zero_distances():
    # all-zero distances -> sigma degenerate -> uniform fallback
    d = np.zeros((2, 6), dtype=np.float32)
    mask = np.ones_like(d, dtype=bool)
    p = np.asarray(gaussian_row_distributions(
        jnp.asarray(d), jnp.asarray(mask), jnp.float32(2.0)))
    assert np.allclose(p[:, 1:], 1.0 / 5.0, atol=1e-4)


def test_gaussian_perplexity_controls_entropy():
    d = np.sort(np.random.default_rng(2).random((4, 32)).astype(np.float32))
    d = np.sort(d, axis=1)
    d[:, 0] = 0
    mask = np.ones_like(d, dtype=bool)
    for perp in (2.0, 5.0, 10.0):
        p = np.asarray(gaussian_row_distributions(
            jnp.asarray(d), jnp.asarray(mask), jnp.float32(perp)))
        ent = -(p[p > 0] * np.log(p[p > 0]))
        row_ent = np.array([-(row[row > 0] * np.log(row[row > 0])).sum()
                            for row in p])
        assert np.allclose(np.exp(row_ent), perp, rtol=0.02)


def test_linear_distribution():
    d = np.array([[0.0, 1.0, 3.0]], dtype=np.float32)
    mask = np.array([[False, True, True]])
    p = np.asarray(linear_row_distributions(jnp.asarray(d),
                                            jnp.asarray(mask)))
    expect = np.array([0.0, 0.5, 0.25])
    expect[1:] /= expect[1:].sum()
    assert np.allclose(p[0], expect, atol=1e-6)


def test_smooth_knn_target():
    rng = np.random.default_rng(3)
    d = np.sort(0.5 + rng.random((32, 15)).astype(np.float32), axis=1)
    mask = np.ones_like(d, dtype=bool)
    sims = np.asarray(smooth_knn_distributions(jnp.asarray(d),
                                               jnp.asarray(mask)))
    # sum of similarities should hit log2(k)
    target = np.log2(15)
    assert np.allclose(sims.sum(axis=1), target, rtol=0.05)
    # nearest neighbor (d == rho) has similarity ~1
    assert np.all(sims.max(axis=1) > 0.95)


def test_normalize_knn_distances_dispatch():
    rng = np.random.default_rng(4)
    d = np.sort(rng.random((10, 8)).astype(np.float32), axis=1)
    d[:, 0] = 0
    for scheme in (NormalizationScheme.TSNE, NormalizationScheme.LINEAR):
        p = normalize_knn_distances(d, scheme, perplexity=2.0)
        assert p.shape == d.shape
        assert np.allclose(p.sum(axis=1), 1.0, atol=1e-3)
        assert np.all(p[:, 0] == 0)
    p = normalize_knn_distances(d, NormalizationScheme.UMAP)
    assert np.all(p[:, 0] == 0)
    assert np.all(p >= 0)
