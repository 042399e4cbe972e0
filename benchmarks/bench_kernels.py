"""Kernel-tuning harness: times the hot device kernels at Pines scale and
sweeps their block-size knobs.  Run on the target TPU to pick the fastest
variants; prints one JSON line per measurement.

Usage:
    python benchmarks/bench_kernels.py            # full sweep
    python benchmarks/bench_kernels.py knn tsne   # subset

The hot ops (bench.py profile, SURVEY.md §6):
  knn    data-level kNN, 21025 x 200, k=91  (col_block sweep = how many
         distance columns are scored per streaming top-k merge)
  walks  21025 components x 50 walkers x 10 steps
  tsne   2000-iteration level-1 t-SNE at 5365 points (Pallas vs XLA)
  pairs  walk pairwise Bhattacharyya similarities (blocked sqrt-matmul)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

# SPH_BENCH_SCALE in (0, 1] shrinks every problem size for smoke runs on
# slow hosts; 1.0 = the Pines-scale shapes the TPU tuning run should use.
SCALE = float(os.environ.get("SPH_BENCH_SCALE", "1.0"))


def _s(n, lo=64):
    return max(lo, int(n * SCALE))


def _timeit(fn, repeats=3, warmup=1):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(repeats):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / repeats


def _emit(name, seconds, **extra):
    print(json.dumps({"kernel": name, "seconds": round(seconds, 4), **extra}),
          flush=True)


def _pines_like(n=None, d=200, seed=0):
    n = n or _s(21025)
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((16, d)).astype(np.float32) * 2
    lab = rng.integers(0, 16, n)
    return (centers[lab] + rng.standard_normal((n, d)).astype(np.float32)
            ).astype(np.float32)


def bench_knn():
    from sph_tpu.ops.knn import knn_bruteforce
    data = _pines_like()
    for col_block in (512, 1024, 2048, 4096, 8192):
        for row_block in (256, 512, 1024):
            dt = _timeit(lambda: knn_bruteforce(
                data, 91, row_block=row_block, col_block=col_block),
                repeats=2)
            _emit("knn", dt, row_block=row_block, col_block=col_block)
    # TPU hardware partial-reduce top-k (exact on CPU); compare best blocks
    os.environ["SPH_KNN_APPROX_TOPK"] = "1"
    try:
        for col_block in (2048, 8192):
            dt = _timeit(lambda: knn_bruteforce(
                data, 91, row_block=256, col_block=col_block), repeats=2)
            _emit("knn_approx_topk", dt, row_block=256, col_block=col_block)
    finally:
        del os.environ["SPH_KNN_APPROX_TOPK"]


def bench_walks():
    from sph_tpu.ops.sparse import SparseRows
    from sph_tpu.ops.walks import do_random_walks
    from sph_tpu.settings import RandomWalkSettings
    rng = np.random.default_rng(1)
    n, k = _s(21025), 92
    idx = np.empty((n, k), np.int32)
    idx[:, 0] = np.arange(n)
    idx[:, 1:] = rng.integers(0, n, (n, k - 1))
    val = rng.random((n, k)).astype(np.float32)
    val /= val.sum(1, keepdims=True)
    rows = SparseRows(idx, val, n)
    rws = RandomWalkSettings(num_random_walks=50, single_walk_length=10)
    dt = _timeit(lambda: do_random_walks(rows, rws), repeats=2)
    _emit("walks", dt, n=n, walkers=50, steps=10)


def bench_pairs():
    from sph_tpu.ops.sparse import SparseRows, pairwise_similarities
    from sph_tpu.ops.walks import do_random_walks
    from sph_tpu.settings import RandomWalkSettings
    rng = np.random.default_rng(2)
    n, k = _s(5365), 32
    idx = np.empty((n, k), np.int32)
    idx[:, 0] = np.arange(n)
    idx[:, 1:] = rng.integers(0, n, (n, k - 1))
    val = rng.random((n, k)).astype(np.float32)
    val /= val.sum(1, keepdims=True)
    walks = do_random_walks(SparseRows(idx, val, n),
                            RandomWalkSettings(num_random_walks=50,
                                               single_walk_length=10))
    topk = min(91, n - 1)
    dt = _timeit(lambda: pairwise_similarities(walks, topk), repeats=2)
    _emit("pairs", dt, n=n, topk=topk)


def bench_tsne():
    import jax
    from sph_tpu.models.tsne import TsneComputation, TsneParameters
    from sph_tpu.ops.sparse import SparseRows, symmetrize_tsne

    rng = np.random.default_rng(3)
    n, k = _s(5365), 92
    idx = np.empty((n, k), np.int32)
    idx[:, 0] = np.arange(n)
    idx[:, 1:] = rng.integers(0, n, (n, k - 1))
    val = rng.random((n, k)).astype(np.float32)
    val /= val.sum(1, keepdims=True)
    p = symmetrize_tsne(SparseRows(idx, val, n))

    on_tpu = jax.devices()[0].platform == "tpu"
    variants = [("xla", False)] + ([("pallas", True)] if on_tpu else [])
    for name, use_pallas in variants:
        def run():
            t = TsneComputation(TsneParameters(num_iterations=max(50, int(2000 * SCALE))),
                                use_pallas=use_pallas)
            t.set_probability_distribution(p)
            t.compute(verbose=False)
            return t.embedding
        dt = _timeit(run, repeats=1)
        _emit(f"tsne2000_{name}", dt, n=n)


def bench_merge():
    from sph_tpu.ops.sparse import SparseRows, _compact, \
        merge_rows_by_parents
    rng = np.random.default_rng(4)
    n, r = _s(21025), 500
    idx = np.sort(rng.integers(0, n, (n, r)).astype(np.int32), axis=1)
    dup = np.zeros_like(idx, bool)
    dup[:, 1:] = idx[:, 1:] == idx[:, :-1]
    idx = np.where(dup, -1, idx)
    val = np.where(idx >= 0, rng.random((n, r)).astype(np.float32), 0)
    sr = _compact(idx, val, n)
    parents = rng.integers(0, max(n // 4, 1), n)
    dt = _timeit(lambda: merge_rows_by_parents(sr, parents,
                                               max(n // 4, 1)), repeats=3)
    _emit("merge_host", dt, n=n, width=r)


def main():
    import jax
    which = set(sys.argv[1:]) or {"knn", "walks", "pairs", "tsne", "merge"}
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    if "knn" in which:
        bench_knn()
    if "walks" in which:
        bench_walks()
    if "pairs" in which:
        bench_pairs()
    if "tsne" in which:
        bench_tsne()
    if "merge" in which:
        bench_merge()


if __name__ == "__main__":
    main()