"""Headless visualization smoke tests (reference: vis/Renderer.cpp views;
here matplotlib renders, so each plot just has to produce a non-empty
PNG)."""

import os

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")


def test_vis_plots(tmp_path):
    from sph_tpu import vis
    from sph_tpu.ops.graph import KnnGraph
    from sph_tpu.ops.knn import knn_bruteforce
    from sph_tpu.ops.sparse import SparseRows
    from sph_tpu.ops.shortest_path import shortest_path_fields
    from sph_tpu.ops.walks import do_random_walks
    from sph_tpu.settings import RandomWalkSettings
    from sph_tpu.utils.testdata import create_swiss_roll

    pos, col = create_swiss_roll(300, noise=0.02, random_state=0)
    pos = pos.astype(np.float32)
    idx, dist = knn_bruteforce(pos, 6)
    g = KnnGraph(idx, dist)

    p1 = vis.plot_embedding(pos[:, :2], col, str(tmp_path / "emb.png"))
    p2 = vis.plot_level_map(np.arange(100) % 7, 10, 10,
                            str(tmp_path / "lvl.png"))
    p3 = vis.plot_knn_edges(pos, idx, str(tmp_path / "knn.png"), colors=col)

    field = np.asarray(shortest_path_fields(g, np.array([0]))[0])
    p4 = vis.plot_shortest_path(pos, field, 0, 150,
                                np.array([], dtype=np.int64),
                                str(tmp_path / "geo.png"))

    val = np.where(idx >= 0, 1.0 / 6, 0).astype(np.float32)
    rows = SparseRows(idx.astype(np.int32), val, len(pos))
    walks = do_random_walks(rows, RandomWalkSettings(num_random_walks=5,
                                                     single_walk_length=4))
    p5 = vis.plot_walk_mass(pos, walks, 0, str(tmp_path / "walk.png"))

    for p in (p1, p2, p3, p4, p5):
        assert os.path.getsize(p) > 1000
