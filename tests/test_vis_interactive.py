"""Interactive HTML explorer export (reference parity: vis/Renderer.cpp
interactive explorer; here a standalone-HTML equivalent)."""

import json
import re

import numpy as np

from sph_tpu import (ComputeEmbedding, ComputeEmbeddingSettings,
                     ComputeHierarchy, ImageHierarchySettings, ImageStack,
                     LevelSimilaritiesSettings, NearestNeighborsSettings,
                     RandomWalkSettings, Scaler, scale)
from sph_tpu.utils.testdata import create_checker_image
from sph_tpu.vis_interactive import export_explorer


def small_hierarchy():
    img = create_checker_image(8, 8, channels=4, block=2, noise=0.02)
    stack = ImageStack.from_array(img)
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, 8, 8,
        ihs=ImageHierarchySettings(),
        lss=LevelSimilaritiesSettings(ks=[8]),
        rws=RandomWalkSettings(num_random_walks=10, single_walk_length=5,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=8))
    ch.compute()
    return ch


def test_export_explorer(tmp_path):
    ch = small_hierarchy()
    h = ch.image_hierarchy.hierarchy
    lv = min(1, h.num_levels - 1)
    pd = ch.level_similarities.get_prob_dist(lv)
    es = ComputeEmbeddingSettings()
    es.tsne.num_iterations = 50
    emb = ComputeEmbedding(es).compute_tsne(pd)

    out = tmp_path / "explorer.html"
    path = export_explorer(ch, embeddings={lv: np.asarray(emb)},
                           path=str(out))
    html = open(path).read()
    assert "<canvas" in html and "DATA" in html

    # embedded JSON payload parses and matches the hierarchy
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "DATA payload not found"
    data = json.loads(m.group(1))
    assert data["rows"] == 8 and data["cols"] == 8
    assert data["num_levels"] == h.num_levels
    level = data["levels"][str(lv)]
    n = h.num_components[lv]
    assert level["n"] == n
    assert len(level["labels"]) == 64
    assert max(level["labels"]) == n - 1
    assert len(level["emb"]) == n
    assert "walks" in level and len(level["walks"]) == n
    assert "edges" in level and len(level["edges"]) > 0
    # every edge endpoint in domain
    for a, b, w in level["edges"]:
        assert 0 <= a < n and 0 <= b < n and w > 0

    # level without an embedding still exports labels
    lv0 = data["levels"]["0"]
    assert len(lv0["labels"]) == 64 and "emb" not in lv0
