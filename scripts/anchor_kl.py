"""Independent KL anchor for the Pines level-1 t-SNE (VERDICT r1 item 4).

The C++ reference cannot be built in this image (zero egress; see
docs/reference_build_attempt.md), so the acceptance bar "KL within 1% of
reference" is anchored against an independent optimizer instead:
scikit-learn's Barnes-Hut t-SNE run on the same level-1 similarity
structure, with BOTH embeddings scored under the identical joint P
(tests/test_cross_library.py does this at toy scale; this script does it at
the flagship Pines-level-1 scale and records the result).

Writes docs/anchors_pines.json and prints a summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def kl_under_p(p, emb: np.ndarray) -> float:
    """Exact KL(P || Q(emb)) over P's off-diagonal support, full-Z Q."""
    emb = np.asarray(emb, np.float64)
    d2 = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    w = 1.0 / (1.0 + d2)
    np.fill_diagonal(w, 0.0)
    z = w.sum()
    pv = p.to_dense().astype(np.float64)
    np.fill_diagonal(pv, 0.0)
    pv /= pv.sum()
    q = np.maximum(w / z, 1e-12)
    mask = pv > 0
    return float((pv[mask] * np.log(pv[mask] / q[mask])).sum())


def main():
    from sph_tpu import (ComputeEmbedding, ComputeEmbeddingSettings,
                         ComputeHierarchy, ComponentSim,
                         ImageHierarchySettings, ImageStack,
                         ImportanceWeighting, LevelSimilaritiesSettings,
                         NearestNeighborsSettings, NormalizationScheme,
                         RandomWalkHandling, RandomWalkReduction,
                         RandomWalkSettings, Scaler, scale)
    from sph_tpu.utils.logging import set_level
    from sph_tpu.utils.testdata import create_hyperspectral_scene

    set_level("WARNING")
    rows, cols, channels = 145, 145, 200
    tsne_iters = int(os.environ.get("ANCHOR_TSNE_ITERS", 2000))
    k = 91

    img = create_hyperspectral_scene(rows, cols, channels, seed=7)
    stack = ImageStack.from_array(img, name="pines_synth")
    data = scale(stack.data, Scaler.NONE)

    t0 = time.perf_counter()
    ch = ComputeHierarchy().init(
        data, rows, cols,
        ihs=ImageHierarchySettings(
            component_sim=ComponentSim.NEIGH_WALKS,
            merge_multiple=False, use_percentile=False, max_dist=0.0,
            min_num_comp=1, min_reduction=98.0, max_levels=10,
            rw_handling=RandomWalkHandling.MERGE_RW_ONLY,
            rw_reduction=(
                RandomWalkReduction.PROPORTIONAL_COMPONENT_REDUCTION),
            norm_knn_distances=NormalizationScheme.TSNE),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_WALKS, ks=[k],
            random_walk_pair_sims=True,
            normalize_prob_dist=NormalizationScheme.TSNE,
            compute_symmetric_prob_dist=NormalizationScheme.TSNE),
        rws=RandomWalkSettings(
            num_random_walks=50, single_walk_length=10,
            importance_weighting=ImportanceWeighting.NORMAL, random_seed=1),
        nns=NearestNeighborsSettings(
            num_nearest_neighbors=k, symmetric_neighbors=True,
            compute_connect_components=True,
            neighbor_connect_components=True))
    ch.compute()
    hierarchy_s = time.perf_counter() - t0
    h = ch.image_hierarchy.hierarchy
    levels = [int(c) for c in h.num_components]
    level = min(1, h.num_levels - 1)
    p = ch.level_similarities.get_prob_dist(level)
    n = p.num_rows
    print(f"# hierarchy {hierarchy_s:.1f}s levels={levels}, level-1 n={n}",
          flush=True)

    # ours
    es = ComputeEmbeddingSettings()
    es.tsne.num_iterations = tsne_iters
    ce = ComputeEmbedding(es)
    t1 = time.perf_counter()
    emb_mine = ce.compute_tsne(p, track_kl=True)
    tsne_s = time.perf_counter() - t1
    kl_mine = kl_under_p(p, emb_mine)
    print(f"# ours: {tsne_s:.1f}s kl_under_p={kl_mine:.4f} "
          f"(tracked {ce.last_kl})", flush=True)

    # sklearn Barnes-Hut on the same similarity structure: precomputed
    # distances d = -log(p_sym) on the support, large off-support
    from sklearn.manifold import TSNE as SkTSNE
    pd_dense = p.to_dense().astype(np.float64)
    np.fill_diagonal(pd_dense, 0.0)
    pd_dense = (pd_dense + pd_dense.T) * 0.5
    with np.errstate(divide="ignore"):
        d = -np.log(np.maximum(pd_dense, 1e-300))
    far = np.nanmax(np.where(pd_dense > 0, d, np.nan)) * 2.0
    d = np.where(pd_dense > 0, d, far).astype(np.float64)
    np.fill_diagonal(d, 0.0)
    t2 = time.perf_counter()
    sk = SkTSNE(n_components=2, metric="precomputed", init="random",
                random_state=0, max_iter=tsne_iters,
                perplexity=min(30.0, (n - 1) / 3.0))
    emb_sk = sk.fit_transform(d)
    sk_s = time.perf_counter() - t2
    kl_sk = kl_under_p(p, emb_sk)
    print(f"# sklearn-BH: {sk_s:.1f}s kl_under_p={kl_sk:.4f} "
          f"(its own kl {sk.kl_divergence_:.4f})", flush=True)

    out = {
        "scene": "pines_synth 145x145x200",
        "levels": levels,
        "level": level,
        "n_components": n,
        "tsne_iters": tsne_iters,
        "kl_under_p_ours": round(kl_mine, 5),
        "kl_under_p_sklearn_bh": round(kl_sk, 5),
        "ratio_ours_over_sklearn": round(kl_mine / kl_sk, 4),
        "hierarchy_s": round(hierarchy_s, 1),
        "tsne_s_ours": round(tsne_s, 1),
        "tsne_s_sklearn": round(sk_s, 1),
        "note": "both embeddings scored under the identical joint P "
                "(level-1 walk similarities); sklearn optimizes its own "
                "P from -log(p) precomputed distances. Wall-clocks are "
                "single-core CPU and fluctuate 2-3x on this VM.",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "anchors_pines.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
