"""Record/replay round-trip of the parallel AOT warmup
(utils/warmup.py; VERDICT r4 #1 — the truly-cold compile bill)."""

import json
import subprocess
import sys


def test_record_then_replay_roundtrip(tmp_path):
    manifest = tmp_path / "m.json"
    # record in a subprocess: enable_recording wraps module attributes
    # in place, which must not leak into other tests
    code = f"""
import os
os.environ["SPH_WARMUP_RECORD"] = {str(manifest)!r}
import numpy as np
import sph_tpu  # triggers maybe_enable_from_env
from sph_tpu.ops.distributions import gaussian_rows_bucketed
from sph_tpu.ops.sparse import SparseRows, symmetrize_tsne
import jax.numpy as jnp
v = jnp.asarray(np.random.default_rng(0).random((20, 8)).astype(np.float32))
m = jnp.asarray(np.ones((20, 8), bool))
gaussian_rows_bucketed(v, m, 2.0, ignore_first=True)
idx = jnp.asarray(np.tile(np.arange(8, dtype=np.int32), (8, 1)))
val = jnp.asarray(np.random.default_rng(1).random((8, 8)).astype(np.float32))
symmetrize_tsne(SparseRows(idx, val, 8))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    data = json.loads(manifest.read_text())
    entries = data["entries"]
    assert entries, "nothing recorded"
    names = {e["name"] for e in entries}
    assert "gaussian_row_distributions" in names
    # every entry carries rebuildable specs
    for e in entries:
        for s in e["args"]:
            assert ("aval" in s) or ("lit" in s)

    # replay in a fresh process (no recording env): all programs compile
    code2 = f"""
import json
from sph_tpu.utils.warmup import replay
out = replay({str(manifest)!r}, threads=4)
print(json.dumps(out))
"""
    r2 = subprocess.run([sys.executable, "-c", code2], capture_output=True,
                        text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out["compiled"] >= len(names), out
    assert out["failed"] == 0, out
