"""HTTP-level tests of the live explorer server (VERDICT r4 #8: the
reference's live recompute, vis/Renderer.cpp:467-551, as an on-demand
HTTP path — no browser needed to validate the recompute itself)."""

import json
import urllib.request

import numpy as np
import pytest

from sph_tpu import (ComponentSim, ComputeHierarchy, ImageHierarchySettings,
                     ImageStack, LevelSimilaritiesSettings,
                     NearestNeighborsSettings, RandomWalkHandling,
                     RandomWalkSettings, Scaler, scale)
from sph_tpu.utils.testdata import create_checker_image
from sph_tpu.vis_server import ExplorerServer


@pytest.fixture(scope="module")
def served():
    img = create_checker_image(10, 10, channels=4, block=5, noise=0.02)
    stack = ImageStack.from_array(img)
    data = scale(stack.data, Scaler.STANDARD)
    ch = ComputeHierarchy().init(
        data, 10, 10,
        ihs=ImageHierarchySettings(
            component_sim=ComponentSim.NEIGH_WALKS,
            rw_handling=RandomWalkHandling.MERGE_RW_ONLY),
        lss=LevelSimilaritiesSettings(
            component_sim=ComponentSim.NEIGH_WALKS, ks=[8],
            random_walk_pair_sims=True),
        rws=RandomWalkSettings(num_random_walks=10, single_walk_length=5,
                               random_seed=1),
        nns=NearestNeighborsSettings(num_nearest_neighbors=8))
    ch.compute()
    srv = ExplorerServer(ch)
    url = srv.start()
    yield ch, srv, url
    srv.stop()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _get_raw(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.read()


def test_index_serves_live_ui(served):
    ch, srv, url = served
    status, body = _get_raw(url)
    assert status == 200
    html = body.decode()
    assert '"live":true' in html
    assert "reKnn" in html and "reWalks" in html
    # the embedded script still passes the JS structural checker
    from sph_tpu.utils.jscheck import check_js_syntax
    script = html.split("<script>")[1].split("</script>")[0]
    assert check_js_syntax(script) > 100


def test_meta(served):
    ch, srv, url = served
    status, meta = _get(url + "api/meta")
    assert status == 200
    h = ch.image_hierarchy.hierarchy
    assert meta["num_levels"] == h.num_levels
    assert meta["num_components"] == [int(c) for c in h.num_components]
    assert meta["live"] is True


def test_live_knn_recompute_matches_direct_call(served):
    ch, srv, url = served
    h = ch.image_hierarchy.hierarchy
    level = 1
    n = int(h.num_components[level])
    status, out = _get(url + f"api/knn?level={level}&k=4")
    assert status == 200
    assert out["k"] == 4
    edges = out["edges"]
    assert edges, "live kNN returned no edges"
    for a, b, sim in edges:
        assert 0 <= a < b < n
        assert 0.0 <= sim <= 1.0
    # parity with the direct op under the same k
    from sph_tpu.ops.component_knn import knn_walks
    ids, dists = knn_walks(h.random_walks[level], 4)
    want = set()
    for i in range(n):
        for j in range(1, ids.shape[1]):
            t = int(ids[i, j])
            if 0 <= t < n and t != i:
                want.add((min(i, t), max(i, t)))
    got = {(a, b) for a, b, _ in edges}
    assert got <= want


def test_live_knn_changes_with_k(served):
    ch, srv, url = served
    _, e2 = _get(url + "api/knn?level=1&k=2")
    _, e8 = _get(url + "api/knn?level=1&k=8")
    assert len(e8["edges"]) >= len(e2["edges"])


def test_live_walks_recompute(served):
    ch, srv, url = served
    h = ch.image_hierarchy.hierarchy
    n = int(h.num_components[1])
    status, out = _get(url + "api/walks?level=1&num=20&len=5")
    assert status == 200
    assert len(out["walks"]) == n
    for cols, vals in out["walks"]:
        assert len(cols) == len(vals)
        for c in cols:
            assert 0 <= c < n
        if vals:
            # row-normalized walk rows
            assert abs(sum(vals) - 1.0) < 1e-2
    # different parameters -> genuinely recomputed (not a cache echo)
    _, out2 = _get(url + "api/walks?level=1&num=40&len=8")
    assert out2["num"] == 40 and out2["len"] == 8


def test_live_path(served):
    ch, srv, url = served
    h = ch.image_hierarchy.hierarchy
    n = int(h.num_components[1])
    a, b = 0, n - 1
    status, out = _get(url + f"api/path?level=1&a={a}&b={b}&k=6")
    assert status == 200
    if out["path"]:
        assert out["path"][0] == a and out["path"][-1] == b
        assert out["distance"] >= 0
        # consecutive path nodes are edges of the live kNN graph
        _, knn = _get(url + "api/knn?level=1&k=6")
        eset = {(x[0], x[1]) for x in knn["edges"]}
        eset |= {(b_, a_) for a_, b_ in eset}
        for u, v in zip(out["path"], out["path"][1:]):
            assert (min(u, v), max(u, v)) in {(min(x), max(x))
                                              for x in eset}


def test_error_paths(served):
    ch, srv, url = served
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(url + "api/knn?level=99&k=4")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(url + "api/nope")
    assert ei.value.code == 404
