"""Labeled-scene generator + per-level segmentation metrics
(evaluation/segmentation.py; VERDICT r2 missing #4)."""

import numpy as np

from sph_tpu import (ComputeHierarchy, ImageHierarchySettings, ImageStack,
                     LevelSimilaritiesSettings, NearestNeighborsSettings,
                     RandomWalkSettings, Scaler, scale)
from sph_tpu.evaluation.segmentation import (boundary_recall,
                                             majority_accuracy, nmi,
                                             score_hierarchy)
from sph_tpu.utils.testdata import create_labeled_scene


def test_labeled_scene_shapes_and_classes():
    img, lab = create_labeled_scene(32, 40, channels=24, num_classes=8,
                                    seed=3)
    assert img.shape == (32, 40, 24) and img.dtype == np.float32
    assert lab.shape == (32, 40) and lab.dtype == np.int32
    assert 0 <= lab.min() and lab.max() < 8
    # imbalance actually materializes: largest class >> smallest
    counts = np.bincount(lab.ravel(), minlength=8)
    present = counts[counts > 0]
    assert len(present) >= 4
    assert present.max() > 3 * present.min()
    # deterministic given seed
    img2, lab2 = create_labeled_scene(32, 40, channels=24, num_classes=8,
                                      seed=3)
    assert np.array_equal(lab, lab2) and np.allclose(img, img2)


def test_metrics_identity_and_degenerate():
    lab = np.repeat(np.arange(4), 25).reshape(10, 10).astype(np.int32)
    # perfect segmentation: each pixel its own component
    ident = np.arange(100, dtype=np.int32)
    assert majority_accuracy(ident, lab) == 1.0
    assert boundary_recall(ident, lab, 10, 10) == 1.0
    # one-component segmentation: accuracy = largest class share
    ones = np.zeros(100, dtype=np.int32)
    assert abs(majority_accuracy(ones, lab) - 0.25) < 1e-9
    assert nmi(ones, lab) == 0.0
    # nmi of the labels with themselves is 1
    assert abs(nmi(lab, lab) - 1.0) < 1e-9


def test_hierarchy_segmentation_scores():
    img, lab = create_labeled_scene(24, 24, channels=12, num_classes=5,
                                    seed=1, noise=0.01)
    stack = ImageStack.from_array(img)
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, 24, 24,
        ihs=ImageHierarchySettings(),
        lss=LevelSimilaritiesSettings(ks=[8]),
        rws=RandomWalkSettings(num_random_walks=10, single_walk_length=5,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=8))
    ch.skip_level_similarities = True
    ch.compute()
    h = ch.image_hierarchy.hierarchy
    scores = score_hierarchy(h, lab, 24, 24)
    assert len(scores) == h.num_levels
    assert scores[0]["achievable_accuracy"] == 1.0
    accs = [s["achievable_accuracy"] for s in scores]
    # coarser levels cannot beat finer ones on the majority-vote bound
    assert all(a >= b - 1e-9 for a, b in zip(accs, accs[1:]))
    for s in scores:
        assert 0.0 <= s["nmi"] <= 1.0
        assert 0.0 <= s["boundary_recall"] <= 1.0
        assert abs(s["achievable_accuracy"]
                   + s["undersegmentation_error"] - 1.0) < 1e-6
    # mid-hierarchy should retain most of the class structure on an easy
    # low-noise scene: some level with far fewer components than pixels
    # still achieves >= 0.85 accuracy
    mid = [s for s in scores if 5 <= s["num_components"] <= 200]
    assert mid and max(s["achievable_accuracy"] for s in mid) >= 0.85
