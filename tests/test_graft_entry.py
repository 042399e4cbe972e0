"""Keep the driver entrypoints healthy: entry() must be jittable and
dryrun_multichip must compile+run the sharded paths on the virtual mesh."""

import importlib.util
import os

import jax
import numpy as np


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    y = np.asarray(out[0])
    assert y.shape == (2048, 2)
    assert np.all(np.isfinite(y))


def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(8)
