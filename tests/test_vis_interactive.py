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

    # the embedded JS passes the syntax sanity checker (no JS runtime in
    # the image; this fails on unbalanced brackets / unterminated
    # strings, templates, regexes, or comments)
    from sph_tpu.utils.jscheck import check_js_syntax, extract_scripts
    scripts = extract_scripts(html)
    assert scripts, "no <script> block found"
    for script in scripts:
        assert check_js_syntax(script) > 100


def test_jscheck_catches_errors():
    from sph_tpu.utils.jscheck import JsSyntaxError, check_js_syntax
    import pytest

    # valid snippets
    ok = [
        "const f = (a, b) => { return a / b; };",
        "let re = /a[/]b/g; let s = `x ${1 + (2 * 3)} y`;",
        "// comment\nvar x = 'it\\'s';\n/* block\ncomment */ x++;",
        "for (let i = 0; i < 10; i++) { arr[i] = {k: [1, 2]}; }",
    ]
    for src in ok:
        assert check_js_syntax(src) > 0

    bad = [
        "function f() { return 1;",        # unclosed {
        "const a = [1, 2;",                # unclosed [
        "if (x) { y(); } }",               # stray }
        "const s = 'unterminated\n",       # string across newline
        "const t = `unterminated",         # template
        "/* never closed",                 # comment
        "const r = /re[;",                 # regex
        "f(a, b];",                        # mismatched closer
    ]
    for src in bad:
        with pytest.raises(JsSyntaxError):
            check_js_syntax(src)
