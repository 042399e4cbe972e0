"""Build a small demo explorer HTML for browser validation.

Runs the full pipeline on a 24x24 4-channel checker scene (CPU is fine),
computes a level-1 t-SNE embedding, and exports the standalone HTML
explorer to the given path (default /tmp/explorer_demo.html).

Usage: JAX_PLATFORMS=cpu python scripts/make_explorer_demo.py [out.html]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from sph_tpu import (ComputeEmbedding, ComputeEmbeddingSettings,
                     ComputeHierarchy, ImageHierarchySettings, ImageStack,
                     LevelSimilaritiesSettings, NearestNeighborsSettings,
                     RandomWalkSettings, Scaler, scale)
from sph_tpu.utils.testdata import create_checker_image
from sph_tpu.vis_interactive import export_explorer


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/explorer_demo.html"
    rows = cols = 24
    img = create_checker_image(rows, cols, channels=4, block=4, noise=0.05)
    stack = ImageStack.from_array(img, name="checker_demo")
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, rows, cols,
        ihs=ImageHierarchySettings(),
        lss=LevelSimilaritiesSettings(ks=[12]),
        rws=RandomWalkSettings(num_random_walks=15, single_walk_length=6,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=12))
    ch.compute()

    h = ch.image_hierarchy.hierarchy
    embeddings = {}
    es = ComputeEmbeddingSettings()
    es.tsne.num_iterations = 300
    for lv in range(1, h.num_levels):
        if h.num_components[lv] < 3:
            break
        pd = ch.level_similarities.get_prob_dist(lv)
        embeddings[lv] = np.asarray(ComputeEmbedding(es).compute_tsne(pd))

    path = export_explorer(ch, embeddings=embeddings, path=out,
                           title="sph_tpu explorer demo (checker 24x24)")
    print(path)
    print("levels:", [int(c) for c in h.num_components])


if __name__ == "__main__":
    main()
