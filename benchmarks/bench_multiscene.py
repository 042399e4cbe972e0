"""BASELINE config #5: batched multi-scene evaluation — S hyperspectral
scenes' level embeddings computed concurrently, scenes sharded over the
device mesh (the reference runs scenes strictly serially,
RunEvaluation.cpp's outer loop).

Usage: python benchmarks/bench_multiscene.py [num_scenes] [n] [iters]
On a single chip the scenes still batch (vmap); on a v5e-16 slice the same
code spreads scenes over the mesh.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_sph"))
    import numpy as np
    from sph_tpu.parallel.mesh import make_mesh
    from sph_tpu.parallel.sharded import multi_scene_tsne
    from sph_tpu.ops.knn import knn_bruteforce
    from sph_tpu.ops.distributions import gaussian_row_distributions
    from sph_tpu.ops.sparse import SparseRows, symmetrize_tsne
    from sph_tpu.utils.testdata import create_hyperspectral_scene
    import jax.numpy as jnp

    s = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    side = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 250
    k = 16

    pis, pvs = [], []
    width = 0
    mats = []
    for i in range(s):
        img = create_hyperspectral_scene(side, side, 32, seed=i)
        data = img.reshape(side * side, 32)
        idx, dist = knn_bruteforce(data, k)
        p = gaussian_row_distributions(
            jnp.asarray(dist ** 2), jnp.ones_like(idx, dtype=bool),
            jnp.float32((k - 1) / 3), ignore_first=True)
        mat = symmetrize_tsne(SparseRows(idx.astype(np.int32),
                                         np.asarray(p), side * side))
        mats.append(mat)
        width = max(width, mat.width)
    n = side * side
    pi = np.full((s, n, width), -1, np.int32)
    pv = np.zeros((s, n, width), np.float32)
    for i, m in enumerate(mats):
        pi[i, :, :m.width] = m.indices
        pv[i, :, :m.width] = m.values

    mesh = make_mesh()
    t0 = time.perf_counter()
    embs = multi_scene_tsne(pi, pv, iters, mesh)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(embs))
    print(json.dumps({
        "metric": "multiscene_tsne", "value": round(dt, 2),
        "unit": "seconds",
        "detail": {"scenes": s, "points_per_scene": n, "iters": iters,
                   "devices": len(mesh.devices.ravel()),
                   "scene_iters_per_s": round(s * iters / dt, 1)}}))


if __name__ == "__main__":
    main()
