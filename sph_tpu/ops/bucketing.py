"""Shape bucketing for jit boundaries.

The level loop shrinks component counts geometrically, so naive per-level
shapes would compile every kernel once per level (XLA compiles per static
shape; 20-40 s each on TPU).  Bucketing pads the varying dimensions to a
small set of canonical sizes — row counts to multiples of a block, widths
and k to powers of two — so all levels of all runs share a handful of
compiled programs, and the persistent compilation cache carries them across
processes.
"""

from __future__ import annotations

import numpy as np


def next_pow2(x: int, lo: int = 8) -> int:
    x = max(int(x), lo)
    return 1 << (x - 1).bit_length()


def ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_rows(x: int, base: int = 256) -> int:
    """Row-count bucket: next multiple of `base` (power-of-two-scaled so
    large levels don't over-fragment: 256, 512, 768... up to 2048 steps,
    then powers of two)."""
    if x <= 2048:
        return ceil_to(x, base)
    return next_pow2(x)


def pad_axis(arr: np.ndarray, axis: int, size: int, fill) -> np.ndarray:
    """Pad one axis up to `size` with `fill` (no-op when already there)."""
    cur = arr.shape[axis]
    if cur >= size:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, size - cur)
    return np.pad(arr, pad, constant_values=fill)


def pad_width_pow2(indices: np.ndarray, values: np.ndarray,
                   lo: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Pad sparse-row width to a power of two (pad index -1, value 0)."""
    w = next_pow2(indices.shape[1], lo)
    return (pad_axis(indices, 1, w, -1),
            pad_axis(values, 1, w, 0.0))


def bucket_k(k: int) -> int:
    """top_k bucket: next multiple of 16 (k is a static jit arg)."""
    return ceil_to(max(k, 1), 16)
