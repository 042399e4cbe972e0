"""FileIO round-trips (reference sph/utils/FileIO.hpp: LZ4-compressed
binary vectors, vec-of-vec, graphs, sparse matrices; auto chunking above
the lz4 INT_MAX bound, FileIO.hpp:207-292) and LZ4 block-spec conformance
of the native codec."""

import io
import os

import numpy as np
import pytest

from sph_tpu import native
from sph_tpu.ops.graph import KnnGraph, PaddedGraph
from sph_tpu.ops.sparse import SparseRows
from sph_tpu.utils import fileio

HAS_NATIVE = native.get_lib() is not None


# ---------------------------------------------------------------- codec

@pytest.mark.skipif(not HAS_NATIVE, reason="native library unavailable")
class TestLz4Codec:
    def test_roundtrip_shapes(self):
        rng = np.random.default_rng(0)
        cases = [
            b"",
            b"x",
            b"abcd" * 4000,                       # highly compressible
            rng.bytes(100_000),                   # incompressible
            bytes(500_000),                       # long zero runs
            rng.bytes(50) + bytes(10_000) + rng.bytes(50),
            bytes(range(256)) * 7,                # literals > 15 per run
        ]
        for data in cases:
            comp = native.lz4_compress(data)
            assert comp is not None
            out = native.lz4_decompress(comp, len(data))
            assert out == data

    def test_spec_conformance_handcrafted_block(self):
        # literals "0123", match offset 4 len 7, final literals "30123" —
        # hand-assembled from the public LZ4 block spec.  Validates the
        # decoder against the format, not just against our own encoder.
        comp = b"\x43" + b"0123" + b"\x04\x00" + b"\x50" + b"30123"
        assert native.lz4_decompress(comp, 16) == b"0123012301230123"

    def test_spec_extended_lengths(self):
        # 20 literals (15 + ext byte 5), then match offset 1 len 23
        # (token 15 + ext byte 4): "A"*23 copied from the last literal.
        lit = b"BCDEFGHIJKLMNOPQRST" + b"A"
        comp = (b"\xff" + b"\x05" + lit + b"\x01\x00" + b"\x04"
                + b"\x50" + b"AAAAA")
        out = native.lz4_decompress(comp, len(lit) + 23 + 5)
        assert out == lit + b"A" * 28

    def test_corrupt_input_fails_cleanly(self):
        comp = bytearray(native.lz4_compress(b"abcd" * 1000))
        comp[0] = 0xFF
        comp[1] = 0xFF
        assert native.lz4_decompress(bytes(comp), 4000) is None
        # truncation
        good = native.lz4_compress(b"abcd" * 1000)
        assert native.lz4_decompress(good[: len(good) // 2], 4000) is None
        # bad offset (match before start of output)
        assert native.lz4_decompress(b"\x04" + b"ab", 64) is None


# ------------------------------------------------------------ containers

def test_vec_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(1)
    for arr in [rng.standard_normal(1000).astype(np.float32),
                rng.integers(-5, 5, 777).astype(np.int32),
                rng.integers(0, 2**40, 33).astype(np.int64),
                np.empty(0, np.float32)]:
        path = str(tmp_path / "vec.bin")
        fileio.write_compressed_vec(path, arr)
        out = fileio.read_compressed_vec(path)
        assert out.dtype == arr.dtype
        np.testing.assert_array_equal(out, arr)


def test_vec_multichunk(tmp_path, monkeypatch):
    # tiny chunk size exercises the multi-chunk path (reference: payloads
    # above INT_MAX are batched, FileIO.hpp:207-292)
    monkeypatch.setenv("SPH_FILEIO_CHUNK", "1000")
    arr = np.random.default_rng(2).standard_normal(5000).astype(np.float32)
    path = str(tmp_path / "big.bin")
    fileio.write_compressed_vec(path, arr)
    monkeypatch.delenv("SPH_FILEIO_CHUNK")
    out = fileio.read_compressed_vec(path)
    np.testing.assert_array_equal(out, arr)


def test_zlib_fallback_interoperates(tmp_path, monkeypatch):
    # writer without native lz4 -> zlib codec byte; reader (with or
    # without native) must still decode it
    arr = np.arange(4096, dtype=np.int32)
    path = str(tmp_path / "z.bin")
    monkeypatch.setattr(native, "lz4_compress", lambda data: None)
    fileio.write_compressed_vec(path, arr)
    monkeypatch.undo()
    out = fileio.read_compressed_vec(path)
    np.testing.assert_array_equal(out, arr)


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.bin")
    with open(path, "wb") as f:
        f.write(b"NOPE" + bytes(64))
    with pytest.raises(ValueError, match="magic"):
        fileio.read_compressed_vec(path)


def test_vec_of_vec_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(n).astype(np.float32)
            for n in [0, 5, 1, 100, 0, 17]]
    path = str(tmp_path / "vov.bin")
    fileio.write_compressed_vec_of_vec(path, vecs)
    out = fileio.read_compressed_vec_of_vec(path)
    assert len(out) == len(vecs)
    for a, b in zip(vecs, out):
        np.testing.assert_array_equal(a, b)


def test_knn_graph_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    n, k = 50, 8
    idx = rng.integers(0, n, (n, k)).astype(np.int32)
    idx[:, 0] = np.arange(n)
    dist = np.sort(rng.random((n, k)).astype(np.float32), axis=1)
    dist[:, 0] = 0.0
    path = str(tmp_path / "kg.bin")
    fileio.write_knn_graph(path, KnnGraph(idx, dist))
    g = fileio.read_knn_graph(path)
    np.testing.assert_array_equal(g.indices, idx)
    np.testing.assert_array_equal(g.distances, dist)


def test_padded_graph_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    n, w = 40, 12
    counts = rng.integers(1, w + 1, n).astype(np.int32)
    idx = np.full((n, w), -1, np.int32)
    dist = np.full((n, w), np.inf, np.float32)
    for i in range(n):
        idx[i, : counts[i]] = rng.integers(0, n, counts[i])
        dist[i, : counts[i]] = np.sort(rng.random(counts[i]))
    path = str(tmp_path / "pg.bin")
    fileio.write_padded_graph(path, PaddedGraph(idx, dist, counts))
    g = fileio.read_padded_graph(path)
    np.testing.assert_array_equal(g.indices, idx)
    np.testing.assert_array_equal(g.distances, dist)
    np.testing.assert_array_equal(g.counts, counts)


def test_sparse_rows_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    n, r = 30, 6
    idx = np.where(rng.random((n, r)) < 0.7,
                   rng.integers(0, n, (n, r)), -1).astype(np.int32)
    idx.sort(axis=1)
    val = np.where(idx >= 0, rng.random((n, r)), 0.0).astype(np.float32)
    path = str(tmp_path / "sr.bin")
    fileio.write_sparse_rows(path, SparseRows(idx, val, n))
    out = fileio.read_sparse_rows(path)
    np.testing.assert_array_equal(out.indices, idx)
    np.testing.assert_array_equal(out.values, val)
    assert out.num_cols == n


def test_streamed_sections_share_one_file(tmp_path):
    # multiple sections written into one open file handle, read back in
    # order (the graph/sparse writers rely on this)
    path = str(tmp_path / "multi.bin")
    a = np.arange(10, dtype=np.int64)
    b = np.linspace(0, 1, 7).astype(np.float32)
    with open(path, "wb") as f:
        fileio.write_compressed_vec(f, a)
        fileio.write_compressed_vec(f, b)
    with open(path, "rb") as f:
        np.testing.assert_array_equal(fileio.read_compressed_vec(f), a)
        np.testing.assert_array_equal(fileio.read_compressed_vec(f), b)
