"""GEO at Salinas scale (VERDICT r1 item 8).

Two parts:
1. A driver-config GEO_CENTROID hierarchy on the 111k-pixel synthetic
   Salinas scene (512x217x224) — records wall-clock + levels.
2. Validation of the contracted-graph geodesic approximation
   (ops/shortest_path.py, used above CONTRACT_THRESHOLD components)
   against EXACT pixel-graph geodesics (Similarities.cpp:234-310
   semantics) on a random subsample of spatial-neighbor component pairs
   at the first contracted level: relative error, Spearman rank
   correlation, and per-component argmin agreement (the decision the
   merge step actually consumes).

Writes docs/geo_salinas_validation.json.
Env: GEO_ROWS/GEO_COLS/GEO_CHANNELS to shrink for smoke runs,
GEO_PAIRS (default 200 sampled pairs), GEO_SAMPLES (rep-point samples).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def spearman(x: np.ndarray, y: np.ndarray) -> float:
    rx = np.argsort(np.argsort(x)).astype(np.float64)
    ry = np.argsort(np.argsort(y)).astype(np.float64)
    rx -= rx.mean()
    ry -= ry.mean()
    den = np.sqrt((rx * rx).sum() * (ry * ry).sum())
    return float((rx * ry).sum() / den) if den > 0 else float("nan")


def main():
    from sph_tpu import (ComputeHierarchy, ComponentSim,
                         ImageHierarchySettings, ImageStack,
                         LevelSimilaritiesSettings, NearestNeighborsSettings,
                         NormalizationScheme, RandomWalkSettings, Scaler,
                         scale)
    from sph_tpu.ops.shortest_path import (CONTRACT_THRESHOLD,
                                           geodesic_component_distances,
                                           sketch_geodesic_pairs)
    from sph_tpu.utils.logging import set_level
    from sph_tpu.utils.testdata import create_hyperspectral_scene

    set_level("WARNING")
    rows = int(os.environ.get("GEO_ROWS", 512))
    cols = int(os.environ.get("GEO_COLS", 217))
    channels = int(os.environ.get("GEO_CHANNELS", 224))
    n_pairs = int(os.environ.get("GEO_PAIRS", 200))
    n_samples = int(os.environ.get("GEO_SAMPLES", 6))
    # comparison_rgb_bus_geo.json runs nKnns=90 (k=91 with self) on RGB
    k = int(os.environ.get("GEO_K", 31))

    img = create_hyperspectral_scene(rows, cols, channels, seed=13)
    stack = ImageStack.from_array(img, name="salinas_synth")
    data = scale(stack.data, Scaler.NONE)

    t0 = time.perf_counter()
    ch = ComputeHierarchy().init(
        data, rows, cols,
        ihs=ImageHierarchySettings(
            component_sim=ComponentSim.GEO_CENTROID,
            merge_multiple=False, use_percentile=False, max_dist=0.0,
            min_num_comp=1, min_reduction=98.0, max_levels=10,
            num_geodesic_samples=n_samples,
            norm_knn_distances=NormalizationScheme.TSNE),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.GEO_CENTROID, ks=[k],
            normalize_prob_dist=NormalizationScheme.TSNE,
            compute_symmetric_prob_dist=NormalizationScheme.TSNE),
        rws=RandomWalkSettings(random_seed=1),
        nns=NearestNeighborsSettings(
            num_nearest_neighbors=k, symmetric_neighbors=True,
            compute_connect_components=True,
            neighbor_connect_components=True))
    ch.compute_knn_graph()
    ch.compute_image_hierarchy()
    hierarchy_s = time.perf_counter() - t0
    h = ch.image_hierarchy.hierarchy
    levels = [int(c) for c in h.num_components]
    print(f"# GEO hierarchy {hierarchy_s:.1f}s levels={levels}", flush=True)

    # first level with C > CONTRACT_THRESHOLD (where the approximation is
    # actually used); if none (shrunken smoke run), take level 1
    level = next((lv for lv in range(1, h.num_levels)
                  if h.num_components[lv] > CONTRACT_THRESHOLD),
                 min(1, h.num_levels - 1))
    c = h.num_components[level]

    adj = h.spatial_neighbors_of(level)
    src = np.repeat(np.arange(c, dtype=np.int64), adj.shape[1])
    dst = adj.ravel()
    ok = (dst >= 0) & (src < dst)
    src, dst = src[ok], dst[ok]
    rng = np.random.default_rng(7)
    # sample per-source groups so argmin agreement is measurable: pick
    # n_pairs//4 sources and keep ALL their neighbor pairs
    uniq_src = rng.choice(np.unique(src), size=min(
        max(n_pairs // 4, 8), len(np.unique(src))), replace=False)
    sel = np.isin(src, uniq_src)
    a, b = src[sel], dst[sel]
    if len(a) > n_pairs * 4:
        keep = rng.choice(len(a), n_pairs * 4, replace=False)
        a, b = a[keep], b[keep]
    print(f"# validating level {level} (C={c}): {len(a)} pairs from "
          f"{len(uniq_src)} sources", flush=True)

    t1 = time.perf_counter()
    approx = sketch_geodesic_pairs(ch.knn_stage.sym_graph, h, data, level,
                                   a, b, num_samples=n_samples)
    approx_s = time.perf_counter() - t1
    print(f"# sketch: {approx_s:.1f}s", flush=True)

    if os.environ.get("GEO_SKIP_EXACT") == "1":
        # wall-clock-only mode for >=50k-px runs (the sketch's fidelity is
        # validated separately at sizes where exact SSSP is affordable)
        out = {
            "scene": f"{rows}x{cols}x{channels}",
            "geo_hierarchy_s": round(hierarchy_s, 1),
            "levels": levels,
            "sketched_level": int(level),
            "level_components": int(c),
            "contract_threshold": CONTRACT_THRESHOLD,
            "sketch_pairs": int(len(a)),
            "sketch_s": round(approx_s, 1),
            "finite_fraction": round(float(
                (approx < np.float32(np.finfo(np.float32).max)).mean()), 4),
            "method": "geo_sketch (exact comparison skipped)",
        }
        print(json.dumps(out))
        return

    t2 = time.perf_counter()
    graph = ch.knn_stage.sym_graph
    exact = geodesic_component_distances(
        graph, data, h, level, a, b, num_samples=n_samples)
    exact_s = time.perf_counter() - t2
    print(f"# exact: {exact_s:.1f}s", flush=True)

    fmax = np.float32(np.finfo(np.float32).max)
    fin = (approx < fmax) & (exact < fmax)
    rel_err = np.abs(approx[fin] - exact[fin]) / np.maximum(exact[fin], 1e-9)
    rho = spearman(approx[fin], exact[fin])

    # merge-decision agreement: per source, does the contracted argmin
    # neighbor match the exact argmin?
    agree, total = 0, 0
    for s in uniq_src:
        m = (a == s) & fin
        if m.sum() < 2:
            continue
        total += 1
        if int(np.argmin(approx[m])) == int(np.argmin(exact[m])):
            agree += 1

    out = {
        "scene": f"salinas_synth {rows}x{cols}x{channels}",
        "geo_hierarchy_s": round(hierarchy_s, 1),
        "levels": levels,
        "validated_level": int(level),
        "level_components": int(c),
        "contract_threshold": CONTRACT_THRESHOLD,
        "pairs": int(len(a)),
        "finite_pairs": int(fin.sum()),
        "rel_err_median": round(float(np.median(rel_err)), 4),
        "rel_err_p90": round(float(np.percentile(rel_err, 90)), 4),
        "spearman": round(rho, 4),
        "argmin_agreement": round(agree / max(total, 1), 4),
        "argmin_sources": total,
        "sketch_s": round(approx_s, 1),
        "exact_s": round(exact_s, 1),
        "geo_samples": n_samples,
        "method": "geo_sketch",
        "sketch_width": int(os.environ.get("SPH_GEO_SKETCH_WIDTH", "64")),
        "sketch_hops": int(os.environ.get("SPH_GEO_SKETCH_HOPS", "3")),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "geo_salinas_validation.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
