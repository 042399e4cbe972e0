"""Random-walk engine tests: exact invariants (weight budgets per the
reference's debug asserts, SparseMatrixAlgorithms.cpp:203-217) and statistical
agreement with the stationary structure of small chains."""

import numpy as np
import pytest

from sph_tpu.ops.sparse import SparseRows
from sph_tpu.ops.walks import (derive_prune_value, do_random_walks,
                               step_linear, step_normal)
from sph_tpu.settings import ImportanceWeighting, RandomWalkSettings


def ring_probs(n):
    """Ring graph: each node moves to left/right neighbor with p=0.5."""
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        dense[i, (i - 1) % n] = 0.5
        dense[i, (i + 1) % n] = 0.5
    return SparseRows.from_dense(dense)


def test_step_weights_match_reference_docs():
    # reference comment examples (Settings.hpp:61-62)
    lin = [step_linear(s, 11) for s in range(10)]
    assert np.allclose(lin[:4], [1, 0.909, 0.818, 0.727], atol=1e-3)
    nrm = [step_normal(s, 9) for s in range(5)]
    assert np.allclose(nrm[:3], [1, 0.946, 0.801], atol=1e-2)


def test_derive_prune_value():
    s = RandomWalkSettings(single_walk_length=10, prune_steps=2,
                           importance_weighting=ImportanceWeighting.CONSTANT)
    # CONSTANT derives pruneStepInv = 10-2 = 8 -> clamped to 0.5
    assert derive_prune_value(s) == 0.5
    s2 = RandomWalkSettings(single_walk_length=10, prune_steps=8,
                            importance_weighting=ImportanceWeighting.LINEAR)
    # pruneStep = 8, inv = 2 -> stepLinear(2, 10) = 0.8 -> clamp 0.5
    assert derive_prune_value(s2) == 0.5
    s3 = RandomWalkSettings(single_walk_length=10, prune_steps=1,
                            importance_weighting=(
                                ImportanceWeighting.FIRST_VISIT))
    assert np.isclose(derive_prune_value(s3), 0.1)


def test_constant_walks_row_normalized():
    probs = ring_probs(16)
    settings = RandomWalkSettings(num_random_walks=20, single_walk_length=8,
                                  random_seed=7)
    rw = do_random_walks(probs, settings)
    sums = rw.row_sums()
    assert np.allclose(sums, 1.0, atol=1e-4)
    # diagonal removed
    d = rw.to_dense()
    assert np.all(np.diag(d) == 0)


def test_walk_weight_budget_unnormalized():
    # total accumulated weight per point == W * L for CONSTANT
    # (reference debug assert, SparseMatrixAlgorithms.cpp:208-209)
    probs = ring_probs(12)
    settings = RandomWalkSettings(num_random_walks=10, single_walk_length=6,
                                  normalize=False, remove_diagonal=False,
                                  random_seed=3)
    rw = do_random_walks(probs, settings)
    assert np.allclose(rw.row_sums(), 10 * 6, atol=1e-3)

    settings_l = RandomWalkSettings(
        num_random_walks=10, single_walk_length=6, normalize=False,
        remove_diagonal=False, random_seed=3,
        importance_weighting=ImportanceWeighting.LINEAR)
    rw_l = do_random_walks(probs, settings_l)
    # sum of linear weights = W * L*(L+1)/(2L) = W*(L+1)/2
    assert np.allclose(rw_l.row_sums(), 10 * 7 / 2.0, atol=1e-3)

    settings_o = RandomWalkSettings(
        num_random_walks=10, single_walk_length=6, normalize=False,
        remove_diagonal=False, random_seed=3,
        importance_weighting=ImportanceWeighting.ONLYLAST)
    rw_o = do_random_walks(probs, settings_o)
    assert np.allclose(rw_o.row_sums(), 10, atol=1e-3)


def test_walks_stay_local_on_ring():
    # on a ring with L steps, a walker can reach at most distance L
    n, l = 32, 4
    probs = ring_probs(n)
    settings = RandomWalkSettings(num_random_walks=30, single_walk_length=l,
                                  random_seed=1)
    rw = do_random_walks(probs, settings)
    for i in range(n):
        cols = rw.indices[i][rw.indices[i] >= 0]
        ring_dist = np.minimum((cols - i) % n, (i - cols) % n)
        assert ring_dist.max() <= l


def test_first_visit_values_in_unit_range():
    probs = ring_probs(16)
    settings = RandomWalkSettings(
        num_random_walks=25, single_walk_length=8, normalize=False,
        remove_diagonal=False, random_seed=5,
        importance_weighting=ImportanceWeighting.FIRST_VISIT)
    rw = do_random_walks(probs, settings)
    v = rw.values[rw.mask]
    assert np.all(v >= 0) and np.all(v <= 1.0 + 1e-6)
    # near neighbors (first visited early) have larger inverted values
    d = rw.to_dense()
    for i in range(16):
        assert d[i, (i + 1) % 16] > d[i, (i + 4) % 16] - 1e-6


def test_deterministic_given_seed():
    probs = ring_probs(10)
    s = RandomWalkSettings(num_random_walks=8, single_walk_length=5,
                           random_seed=42)
    a = do_random_walks(probs, s)
    b = do_random_walks(probs, s)
    assert np.array_equal(a.indices, b.indices)
    assert np.allclose(a.values, b.values)
    s2 = RandomWalkSettings(num_random_walks=8, single_walk_length=5,
                            random_seed=43)
    c = do_random_walks(probs, s2)
    assert not np.allclose(a.to_dense(), c.to_dense())


def test_two_cluster_separation():
    # two cliques weakly joined: walks should mostly stay inside the clique
    n = 8
    dense = np.zeros((2 * n, 2 * n), np.float32)
    for a in range(n):
        for b in range(n):
            if a != b:
                dense[a, b] = 1.0
                dense[n + a, n + b] = 1.0
    dense[0, n] = dense[n, 0] = 0.05
    dense /= dense.sum(1, keepdims=True)
    probs = SparseRows.from_dense(dense)
    settings = RandomWalkSettings(num_random_walks=40, single_walk_length=10,
                                  random_seed=11)
    rw = do_random_walks(probs, settings).to_dense()
    intra = rw[:n, :n].sum() / rw[:n].sum()
    assert intra > 0.9
