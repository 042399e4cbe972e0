"""Segmentation quality per hierarchy level on the labeled hard scene
(VERDICT r2 missing #4: real AVIRIS data cannot be fetched in this image,
so score a harder labeled synthetic — imbalanced Pines-like class areas,
within-class spectral modes, mixed boundary pixels, striping noise).

Runs the full hierarchy at Pines scale (145x145x200 default) and scores
every level: achievable accuracy, NMI, boundary recall, UE.

Writes docs/segmentation_quality.json.
Env: SEG_ROWS/SEG_COLS/SEG_CHANNELS/SEG_CLASSES shrink for smoke runs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    from sph_tpu import (ComputeHierarchy, ImageHierarchySettings,
                         ImageStack, LevelSimilaritiesSettings,
                         NearestNeighborsSettings, RandomWalkSettings,
                         Scaler, scale)
    from sph_tpu.evaluation.segmentation import score_hierarchy
    from sph_tpu.utils.testdata import create_labeled_scene

    rows = int(os.environ.get("SEG_ROWS", 145))
    cols = int(os.environ.get("SEG_COLS", 145))
    channels = int(os.environ.get("SEG_CHANNELS", 200))
    classes = int(os.environ.get("SEG_CLASSES", 16))

    img, labels = create_labeled_scene(rows, cols, channels, classes)
    stack = ImageStack.from_array(img, name="labeled_pines_synth")
    data = scale(stack.data, Scaler.STANDARD)

    t0 = time.perf_counter()
    ch = ComputeHierarchy().init(
        data, rows, cols,
        ihs=ImageHierarchySettings(),
        lss=LevelSimilaritiesSettings(ks=[31]),
        rws=RandomWalkSettings(num_random_walks=20, single_walk_length=10,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=31))
    ch.skip_level_similarities = True
    ch.compute()
    wall = time.perf_counter() - t0

    h = ch.image_hierarchy.hierarchy
    per_level = score_hierarchy(h, labels, rows, cols)
    out = {
        "scene": f"labeled_pines_synth {rows}x{cols}x{channels}",
        "num_classes": classes,
        "hierarchy_s": round(wall, 1),
        "levels": [int(c) for c in h.num_components],
        "per_level": per_level,
    }
    print(json.dumps(out, indent=1))
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "docs", "segmentation_quality.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
