"""Micro-benchmarks (reference: tests/UtilsBenchmark.cpp Catch2 BENCHMARK
blocks — Hausdorff variants, shortest path, symmetrization, random-walk
similarity variants).  Gated behind SPH_RUN_BENCHMARKS=1 so the normal suite
stays fast; prints one timing line per case."""

import os
import time

import numpy as np
import pytest

RUN = os.environ.get("SPH_RUN_BENCHMARKS") == "1"
pytestmark = pytest.mark.skipif(not RUN, reason="SPH_RUN_BENCHMARKS != 1")


def _time(fn, repeats=3):
    import jax
    fn()  # warm-up / compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn()
        try:
            jax.block_until_ready(out)
        except Exception:
            pass
    return (time.perf_counter() - t0) / repeats


def test_bench_hausdorff():
    from sph_tpu.ops.similarities import hausdorff_point_set_distance
    rng = np.random.default_rng(0)
    data = rng.standard_normal((5000, 64)).astype(np.float32)
    rep_a = rng.integers(0, 5000, (512, 64))
    rep_b = rng.integers(0, 5000, (512, 64))
    dt = _time(lambda: hausdorff_point_set_distance(data, rep_a, rep_b))
    print(f"\n[bench] hausdorff 512 pairs x 64 samples: {dt * 1e3:.1f} ms")


def test_bench_shortest_path_fields():
    from sph_tpu.ops.graph import KnnGraph
    from sph_tpu.ops.shortest_path import shortest_path_fields
    from sph_tpu.ops.knn import knn_bruteforce
    from sph_tpu.utils.testdata import create_swiss_roll
    pos, _ = create_swiss_roll(20000, noise=0.01, random_state=1)
    idx, dist = knn_bruteforce(pos, 10)
    g = KnnGraph(idx, dist)
    src = np.arange(64)
    dt = _time(lambda: shortest_path_fields(g, src), repeats=1)
    print(f"\n[bench] 64 SSSP fields over 20k nodes: {dt:.2f} s")


def test_bench_symmetrize():
    from sph_tpu.ops.graph import KnnGraph, symmetrize_graph
    rng = np.random.default_rng(2)
    n, k = 50000, 30
    idx = np.empty((n, k), np.int32)
    idx[:, 0] = np.arange(n)
    idx[:, 1:] = rng.integers(0, n, (n, k - 1))
    dist = np.sort(rng.random((n, k)).astype(np.float32), axis=1)
    dist[:, 0] = 0
    g = KnnGraph(idx, dist)
    dt_native = _time(lambda: symmetrize_graph(g, use_native=True))
    dt_numpy = _time(lambda: symmetrize_graph(g, use_native=False))
    print(f"\n[bench] symmetrize 50k x 30: native {dt_native * 1e3:.0f} ms"
          f" / numpy {dt_numpy * 1e3:.0f} ms")


def test_bench_walk_similarities():
    from sph_tpu.ops.sparse import SparseRows, pairwise_similarities
    from sph_tpu.ops.walks import do_random_walks
    from sph_tpu.settings import RandomWalkSettings
    rng = np.random.default_rng(3)
    n, k = 4096, 16
    idx = np.empty((n, k), np.int32)
    idx[:, 0] = np.arange(n)
    idx[:, 1:] = rng.integers(0, n, (n, k - 1))
    val = rng.random((n, k)).astype(np.float32)
    val /= val.sum(1, keepdims=True)
    rows = SparseRows(idx, val, n)
    rws = RandomWalkSettings(num_random_walks=50, single_walk_length=10)
    dt_w = _time(lambda: do_random_walks(rows, rws), repeats=1)
    walks = do_random_walks(rows, rws)
    dt_s = _time(lambda: pairwise_similarities(walks, 32), repeats=1)
    print(f"\n[bench] walks 4096x50x10: {dt_w:.2f} s; "
          f"pairwise sims top-32: {dt_s:.2f} s")
