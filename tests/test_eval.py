"""IO + evaluation driver tests (reference: EvalIO round trips and the
RunEvaluation grid expansion / memory-guard logic)."""

import json
import os

import numpy as np
import pytest

from sph_tpu.evaluation.run_evaluation import (default_k, run_evaluation,
                                               tsne_iterations_for,
                                               umap_epochs_for)
from sph_tpu.evaluation.settings import (expand_runs, load_eval_settings,
                                         only_geodesic_settings)
from sph_tpu.settings import ComponentSim
from sph_tpu.utils import io as evalio
from sph_tpu.utils.testdata import create_checker_image


def test_tiff_stack_roundtrip(tmp_path):
    from PIL import Image
    img = create_checker_image(6, 7, channels=3, block=2)
    pages = [Image.fromarray(img[:, :, c], mode="F") for c in range(3)]
    path = str(tmp_path / "stack.tiff")
    pages[0].save(path, save_all=True, append_images=pages[1:])
    stack = evalio.load_tiff_image_stack(path)
    assert stack.rows == 6 and stack.cols == 7
    assert stack.num_dimensions == 3
    assert np.allclose(stack.to_image(), img, atol=1e-6)


def test_rgb_roundtrip(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (5, 8, 3), dtype=np.uint8)
    path = str(tmp_path / "img.png")
    Image.fromarray(arr).save(path)
    stack = evalio.load_rgb_data(path)
    assert stack.rows == 5 and stack.cols == 8
    assert np.allclose(stack.to_image(), arr.astype(np.float32))


def test_label_image_roundtrip(tmp_path):
    from PIL import Image
    labels = np.arange(12, dtype=np.int64)
    path = str(tmp_path / "lab.tiff")
    evalio.save_label_image(labels, 3, 4, path)
    back = np.asarray(Image.open(path))
    assert np.allclose(back, labels.reshape(3, 4))


def test_embedding_roundtrip(tmp_path):
    emb = np.random.default_rng(1).standard_normal((10, 2)).astype(np.float32)
    path = str(tmp_path / "emb.bin")
    evalio.write_embedding(path, emb)
    assert np.allclose(evalio.read_embedding(path), emb)


def test_vec_of_vec_roundtrip(tmp_path):
    vecs = [np.array([1, 2, 3]), np.array([]), np.array([9])]
    path = str(tmp_path / "vv.bin")
    evalio.write_vec_of_vec(path, vecs)
    back = evalio.read_vec_of_vec(path)
    assert len(back) == 3
    assert back[0].tolist() == [1, 2, 3]
    assert back[1].size == 0


def test_schedules():
    # reference: RunEvaluation.cpp:497-509 / :462-468 / :241-248
    assert tsne_iterations_for(50) == 500
    assert tsne_iterations_for(50_000) == 1000
    assert tsne_iterations_for(150_000) == 2000
    assert tsne_iterations_for(250_000) == 4000
    assert umap_epochs_for(50, False) == 250
    assert umap_epochs_for(500, False) == 500
    assert umap_epochs_for(500, True) == 175
    assert default_k(21025) == 100 * 3 + 1  # Pines: perp clamps to 100


def test_reference_grid_json_parses():
    s = load_eval_settings("/root/reference/comparison/"
                           "comparison_pines_embed.json")
    assert s.image_names == ["indian_pines_corrected_normed"]
    assert s.component_sim == [ComponentSim.NEIGH_WALKS]
    assert s.n_knns == [90]
    runs = list(expand_runs(s))
    # 2 dataDistNorm axes only
    assert len(runs) == 2


def test_geo_sims_skip_rw_axes():
    s = load_eval_settings("/root/reference/eval_settings.json")
    runs = list(expand_runs(s))
    geo = [r for r in runs if only_geodesic_settings(r["component_sim"])]
    assert all(r["rw_num"] == 0 for r in geo)
    assert len(runs) > 100


def test_run_evaluation_end_to_end(tmp_path):
    # build a tiny grid json + image and execute one run
    from PIL import Image
    img = create_checker_image(8, 8, channels=3, block=4, noise=0.02)
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(str(tmp_path / "tiny.png"))
    spec = {
        "inputPath": str(tmp_path),
        "cachePathBase": str(tmp_path / "out"),
        "imgFormat": "RGB",
        "imageNames": ["tiny.png"],
        "componentSim": ["NEIGH_WALKS"],
        "dataInputNorm": ["STANDARD"],
        "dataDistNorm": ["TSNE"],
        "neighborConnection": ["FOUR"],
        "neighborSymmetries": [False],
        "neighborConnectComponents": [False],
        "nKnns": [8],
        "randomWalkNums": [10],
        "randomWalkLens": [5],
        "randomWalkStepWeight": ["CONSTANT"],
        "randomWalkHandling": ["MERGE_RW_ONLY"],
        "randomWalkReduction": ["NONE"],
        "randomWalkWeightSize": [True],
        "randomWalkPairSims": [True],
        "weightTransitionBySize": [False],
        "initEmbeddingDataLevel": "RANDOM",
        "skipEmbeddingUMAP": True,
    }
    spec_path = str(tmp_path / "grid.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    settings = load_eval_settings(spec_path)
    settings.skip_embedding_tsne = False
    # shrink the t-SNE schedule for test speed
    import sph_tpu.evaluation.run_evaluation as re_mod
    orig = re_mod.tsne_iterations_for
    re_mod.tsne_iterations_for = lambda n: 60
    try:
        dirs = run_evaluation(settings, max_runs=1)
    finally:
        re_mod.tsne_iterations_for = orig

    assert len(dirs) == 1
    out = dirs[0]
    files = os.listdir(out)
    assert "sph_settings.txt" in files
    assert "sph_stats_imh.txt" in files
    assert "level_0.tiff" in files
    assert any(f.startswith("emb_tsne_") for f in files)
    emb = evalio.read_embedding(os.path.join(out, "emb_tsne_0.bin"))
    assert emb.shape == (64, 2)
    assert np.all(np.isfinite(emb))


def test_eval_pca_and_spectral_init(tmp_path):
    """The RANDOM/PCA/SPECTRAL data-level init paths (reference:
    RunEvaluation.cpp:415-456)."""
    from PIL import Image
    from sph_tpu.evaluation.settings import EvalSettings
    import sph_tpu.evaluation.run_evaluation as re_mod

    img = create_checker_image(8, 8, channels=3, block=4, noise=0.02)
    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(str(tmp_path / "tiny.png"))
    spec = {
        "inputPath": str(tmp_path), "cachePathBase": str(tmp_path / "o"),
        "imgFormat": "RGB", "imageNames": ["tiny.png"],
        "componentSim": ["NEIGH_WALKS"], "dataInputNorm": ["STANDARD"],
        "dataDistNorm": ["TSNE"], "neighborConnection": ["FOUR"],
        "nKnns": [8], "randomWalkNums": [10], "randomWalkLens": [5],
        "randomWalkStepWeight": ["CONSTANT"],
        "randomWalkHandling": ["MERGE_RW_ONLY"],
        "randomWalkReduction": ["NONE"], "randomWalkWeightSize": [True],
        "randomWalkPairSims": [True], "weightTransitionBySize": [False],
        "initEmbeddingDataLevel": "PCA", "skipEmbeddingUMAP": True,
        "initLevelEmbWithPrevious": True,
    }
    p = str(tmp_path / "g.json")
    with open(p, "w") as f:
        json.dump(spec, f)
    orig = re_mod.tsne_iterations_for
    re_mod.tsne_iterations_for = lambda n: 40
    try:
        for init in ("PCA", "SPECTRAL"):
            spec["initEmbeddingDataLevel"] = init
            spec["cachePathBase"] = str(tmp_path / f"o_{init}")
            with open(p, "w") as f:
                json.dump(spec, f)
            from sph_tpu.evaluation.settings import load_eval_settings
            dirs = run_evaluation(load_eval_settings(p), max_runs=1)
            assert len(dirs) == 1
            embs = [f for f in os.listdir(dirs[0])
                    if f.startswith("emb_tsne_")]
            assert len(embs) >= 2  # multiple levels, previous-level init
    finally:
        re_mod.tsne_iterations_for = orig
