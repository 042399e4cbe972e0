"""Timing helpers (reference: sph/utils/Timer.hpp — ScopedTimer RAII and the
`utils::timer` lambda wrapper).  On TPU, wall-clock timing must block on device
work, so `block=True` calls `jax.block_until_ready` on the result."""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Callable

from .logging import Log


@contextmanager
def scoped_timer(name: str, verbose: bool = True):
    """RAII-style timer (reference: Timer.hpp:48-60)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if verbose:
            Log.info("%s took %.3f s", name, dt)


def timer(fn: Callable[[], Any], name: str = "", block: bool = True):
    """Time a callable, returning (result, seconds).

    With block=True the result is blocked on (`jax.block_until_ready`) so
    asynchronous dispatch does not fake the measurement.
    """
    t0 = time.perf_counter()
    result = fn()
    if block:
        try:
            import jax
            result = jax.block_until_ready(result)
        except Exception:
            pass
    dt = time.perf_counter() - t0
    if name:
        Log.info("%s took %.3f s", name, dt)
    return result, dt
