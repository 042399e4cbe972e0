"""Canonical shape-bucket policy (ops/bucketing.py) — the compile-bill
contract: small levels collapse to a handful of shapes, large ones to
bounded-waste multiples (VERDICT r4 #1, docs/performance.md round-5)."""

import numpy as np

from sph_tpu.ops.bucketing import (bucket_k, bucket_rows, bucket_width,
                                   ceil_to, next_pow2, pad_axis)


def test_bucket_rows_small_levels_collapse():
    # the whole shrinking tail shares {512, 1024, 2048}
    assert {bucket_rows(x) for x in (1, 5, 17, 53, 402, 512)} == {512}
    assert bucket_rows(513) == 1024
    assert bucket_rows(2048) == 2048
    buckets = {bucket_rows(x) for x in range(1, 2049)}
    assert buckets == {512, 1024, 2048}


def test_bucket_rows_large_levels_bounded_waste():
    for x in (2049, 5358, 21025, 28373, 111104):
        b = bucket_rows(x)
        assert b >= x
        assert b % 4096 == 0
        assert b - x < 4096          # waste bounded by one step
    # nearby sizes land on one shape (dataset-to-dataset reuse)
    assert bucket_rows(21025) == bucket_rows(22000)


def test_bucket_width_floor_and_pow2():
    assert {bucket_width(w) for w in (1, 7, 31, 32)} == {32}
    assert bucket_width(33) == 64
    assert bucket_width(442) == 512
    assert bucket_width(37) == 64
    # custom floor
    assert bucket_width(3, lo=8) == 8


def test_bucket_k_multiple_of_16():
    assert bucket_k(1) == 16
    assert bucket_k(16) == 16
    assert bucket_k(17) == 32
    assert bucket_k(91) == 96


def test_pad_axis_and_helpers():
    a = np.arange(6, dtype=np.int32).reshape(2, 3)
    p = pad_axis(a, 1, 5, -1)
    assert p.shape == (2, 5)
    assert (p[:, 3:] == -1).all()
    assert pad_axis(a, 0, 2, 0) is a          # no-op keeps identity
    assert ceil_to(5, 4) == 8
    assert next_pow2(5) == 8
    assert next_pow2(1, lo=8) == 8
