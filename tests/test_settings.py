"""Settings JSON round-trip + parameter matching (reference: Settings.cpp
addToJson/readFromJson/checkSettings/checkEntry)."""

import numpy as np
import pytest

from sph_tpu.settings import (ComponentSim, ImageHierarchySettings,
                              ImportanceWeighting, LevelSimilaritiesSettings,
                              NearestNeighborsSettings, NormalizationScheme,
                              RandomWalkHandling, RandomWalkSettings,
                              settings_from_json, settings_match,
                              settings_to_dict, settings_to_json)


@pytest.mark.parametrize("obj", [
    RandomWalkSettings(num_random_walks=42,
                       importance_weighting=ImportanceWeighting.NORMAL),
    NearestNeighborsSettings(num_nearest_neighbors=13,
                             symmetric_neighbors=True),
    ImageHierarchySettings(component_sim=ComponentSim.GEO_WALKS,
                           max_dist=-1.0,
                           rw_handling=RandomWalkHandling.MERGE_RW_NEW_WALKS),
    LevelSimilaritiesSettings(normalize_prob_dist=NormalizationScheme.UMAP,
                              ks=[5, 3]),
])
def test_settings_roundtrip(obj):
    back = settings_from_json(settings_to_json(obj))
    assert back == obj


def test_settings_match_detects_change():
    a = RandomWalkSettings(num_random_walks=10)
    stored = settings_to_dict(a)
    assert settings_match(stored, RandomWalkSettings(num_random_walks=10))
    assert not settings_match(stored,
                              RandomWalkSettings(num_random_walks=11))
    # missing key also fails (reference checkEntry warns + returns false)
    partial = dict(stored)
    del partial["random_seed"]
    assert not settings_match(partial, a)


def test_is_always_merge():
    assert ImageHierarchySettings(max_dist=-1.0).is_always_merge
    assert not ImageHierarchySettings(max_dist=0.5).is_always_merge
