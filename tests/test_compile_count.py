"""count_compiles: the per-program compile counter used by bench.py
(VERDICT r2 weak #2 — count unique compiled programs per hierarchy)."""

import logging

import jax
import jax.numpy as jnp

from sph_tpu.utils.compile_count import count_compiles


def test_counts_fresh_compiles():
    @jax.jit
    def f(x):
        return x * 3 + 1

    with count_compiles() as cc:
        f(jnp.ones((4,)))          # compile 1
        f(jnp.ones((4,)))          # cached — no event
        f(jnp.ones((8,)))          # new shape -> compile 2
    assert cc.total >= 2
    assert sum(cc.by_name.values()) == cc.total
    assert any("f" in name for name in cc.by_name)


def test_restores_logging_state():
    lg = logging.getLogger("jax._src.dispatch")
    prev_level, prev_prop = lg.level, lg.propagate
    prev_flag = jax.config.jax_log_compiles
    with count_compiles():
        assert jax.config.jax_log_compiles is True
        assert lg.propagate is False
    assert lg.level == prev_level and lg.propagate is prev_prop
    assert jax.config.jax_log_compiles == prev_flag


def test_top_names():
    @jax.jit
    def g(x):
        return x - 1

    with count_compiles() as cc:
        for n in (2, 3, 4):
            g(jnp.ones((n,)))
    top = cc.top(2)
    assert len(top) <= 2
    if top:
        assert max(top.values()) == max(cc.by_name.values())
