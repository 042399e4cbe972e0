"""LZ4-compressed binary (de)serialization — the reference's FileIO layer
(sph/utils/FileIO.hpp: writeCompressedVecToBinary / readCompressedVecFromBinary
and the vec-of-vec / Graph / sparse-matrix wrappers, with auto chunking when a
payload exceeds lz4's INT_MAX limit, FileIO.hpp:207-292).

Container format (little-endian):

  magic 'SPH4' | u32 version | u8 codec | dtype tag (8 bytes, NUL-padded)
  u64 total_bytes | u64 num_items | u32 num_chunks
  per chunk: u64 raw_bytes | u64 comp_bytes | payload

codec 1 = LZ4 block (native/graphops.cpp, original implementation of the
public block spec); codec 0 = zlib (fallback when the native library is
unavailable — readers handle both, so caches written either way stay
readable).  Chunking default mirrors the reference's INT_MAX bound;
SPH_FILEIO_CHUNK overrides it (tests use tiny chunks to exercise the
multi-chunk path).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import BinaryIO, List, Sequence

import numpy as np

from .. import native

_MAGIC = b"SPH4"
_VERSION = 1
_CODEC_ZLIB = 0
_CODEC_LZ4 = 1
# lz4's c_int API bound; the reference batches above INT_MAX
# (FileIO.hpp:207-292).  Same bound here, minus slack for expansion.
_DEFAULT_CHUNK = (1 << 31) - (1 << 24)


def _chunk_bytes() -> int:
    return int(os.environ.get("SPH_FILEIO_CHUNK", _DEFAULT_CHUNK))


def _compress(raw: bytes) -> tuple[int, bytes]:
    comp = native.lz4_compress(raw)
    if comp is not None:
        return _CODEC_LZ4, comp
    return _CODEC_ZLIB, zlib.compress(raw, 6)


def _decompress(codec: int, comp: bytes, raw_size: int) -> bytes:
    if codec == _CODEC_LZ4:
        raw = native.lz4_decompress(comp, raw_size)
        if raw is None:
            raise ValueError("corrupt LZ4 chunk (or native lib missing)")
        return raw
    if codec == _CODEC_ZLIB:
        raw = zlib.decompress(comp)
        if len(raw) != raw_size:
            raise ValueError("corrupt zlib chunk: size mismatch")
        return raw
    raise ValueError(f"unknown codec {codec}")


def write_compressed_vec(f: BinaryIO | str, arr: np.ndarray) -> None:
    """Compressed 1-D dump of `arr`'s flat bytes (reference
    writeCompressedVecToBinary semantics; multi-chunk above the lz4 bound).
    """
    if isinstance(f, str):
        with open(f, "wb") as fh:
            write_compressed_vec(fh, arr)
        return
    arr = np.ascontiguousarray(arr)
    raw = arr.tobytes()
    chunk = max(_chunk_bytes(), 1)
    n_chunks = max(1, (len(raw) + chunk - 1) // chunk)
    dtag = arr.dtype.str.encode()[:8].ljust(8, b"\0")
    pieces = [raw[i * chunk:(i + 1) * chunk] for i in range(n_chunks)]
    blobs = [_compress(p) for p in pieces]
    # one codec per file: if any chunk fell back to zlib, rewrite all
    codec = max(c for c, _ in blobs) if all(
        c == blobs[0][0] for c, _ in blobs) else None
    if codec is None:
        codec = _CODEC_ZLIB
        blobs = [(codec, zlib.compress(p, 6)) for p in pieces]
    f.write(_MAGIC)
    f.write(struct.pack("<IB8sQQI", _VERSION, codec, dtag, len(raw),
                        arr.size, n_chunks))
    for piece, (_, comp) in zip(pieces, blobs):
        f.write(struct.pack("<QQ", len(piece), len(comp)))
        f.write(comp)


def read_compressed_vec(f: BinaryIO | str) -> np.ndarray:
    """Inverse of write_compressed_vec; returns a 1-D array."""
    if isinstance(f, str):
        with open(f, "rb") as fh:
            return read_compressed_vec(fh)
    magic = f.read(4)
    if magic != _MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    version, codec, dtag, total, num_items, n_chunks = struct.unpack(
        "<IB8sQQI", f.read(struct.calcsize("<IB8sQQI")))
    if version != _VERSION:
        raise ValueError(f"unsupported version {version}")
    out = bytearray()
    for _ in range(n_chunks):
        raw_size, comp_size = struct.unpack("<QQ", f.read(16))
        out += _decompress(codec, f.read(comp_size), raw_size)
    if len(out) != total:
        raise ValueError("corrupt file: payload size mismatch")
    dtype = np.dtype(dtag.rstrip(b"\0").decode())
    arr = np.frombuffer(bytes(out), dtype=dtype)
    if arr.size != num_items:
        raise ValueError("corrupt file: item count mismatch")
    return arr


def write_compressed_vec_of_vec(f: BinaryIO | str,
                                vecs: Sequence[np.ndarray]) -> None:
    """Ragged list of 1-D arrays (reference write...VecOfVec): a lengths
    section followed by the flat concatenation, both compressed."""
    if isinstance(f, str):
        with open(f, "wb") as fh:
            write_compressed_vec_of_vec(fh, vecs)
        return
    lengths = np.array([len(v) for v in vecs], dtype=np.int64)
    flat = (np.concatenate([np.asarray(v).ravel() for v in vecs])
            if len(vecs) else np.empty(0, np.float32))
    write_compressed_vec(f, lengths)
    write_compressed_vec(f, flat)


def read_compressed_vec_of_vec(f: BinaryIO | str) -> List[np.ndarray]:
    if isinstance(f, str):
        with open(f, "rb") as fh:
            return read_compressed_vec_of_vec(fh)
    lengths = read_compressed_vec(f)
    flat = read_compressed_vec(f)
    offs = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    return [flat[offs[i]:offs[i + 1]] for i in range(len(lengths))]


def write_knn_graph(path: str, graph) -> None:
    """KnnGraph (fixed-k) — reference writeGraphToBinary for KGraph."""
    with open(path, "wb") as f:
        shape = np.array(graph.indices.shape, dtype=np.int64)
        write_compressed_vec(f, shape)
        write_compressed_vec(f, graph.indices)
        write_compressed_vec(f, graph.distances)


def read_knn_graph(path: str):
    from ..ops.graph import KnnGraph
    with open(path, "rb") as f:
        n, k = read_compressed_vec(f)
        idx = read_compressed_vec(f).reshape(n, k)
        dist = read_compressed_vec(f).reshape(n, k)
    return KnnGraph(idx, dist)


def write_padded_graph(path: str, graph) -> None:
    """PaddedGraph (variable-k) — reference writeGraphToBinary for Graph."""
    with open(path, "wb") as f:
        shape = np.array(graph.indices.shape, dtype=np.int64)
        write_compressed_vec(f, shape)
        write_compressed_vec(f, graph.indices)
        write_compressed_vec(f, graph.distances)
        write_compressed_vec(f, graph.counts)


def read_padded_graph(path: str):
    from ..ops.graph import PaddedGraph
    with open(path, "rb") as f:
        n, w = read_compressed_vec(f)
        idx = read_compressed_vec(f).reshape(n, w)
        dist = read_compressed_vec(f).reshape(n, w)
        counts = read_compressed_vec(f)
    return PaddedGraph(idx, dist, counts)


def write_sparse_rows(path: str, rows) -> None:
    """SparseRows — reference writeSparseMatrixToBinary semantics."""
    with open(path, "wb") as f:
        meta = np.array([rows.num_rows, rows.width, rows.num_cols],
                        dtype=np.int64)
        write_compressed_vec(f, meta)
        write_compressed_vec(f, rows.indices)
        write_compressed_vec(f, rows.values)


def read_sparse_rows(path: str):
    from ..ops.sparse import SparseRows
    with open(path, "rb") as f:
        n, w, num_cols = read_compressed_vec(f)
        idx = read_compressed_vec(f).reshape(n, w)
        val = read_compressed_vec(f).reshape(n, w)
    return SparseRows(idx, val, int(num_cols))


def write_dict(path: str, arrays: dict) -> None:
    """Named-array archive (LZ4 per section) — the StageCache payload
    format; replaces npz so cache IO uses the reference's codec."""
    import json
    index = {k: [np.asarray(v).dtype.str, list(np.asarray(v).shape)]
             for k, v in arrays.items()}
    blob = np.frombuffer(json.dumps(index).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        write_compressed_vec(f, blob)
        for k in index:
            write_compressed_vec(f, np.ascontiguousarray(arrays[k]).ravel())


def read_dict(path: str) -> dict:
    import json
    out = {}
    with open(path, "rb") as f:
        index = json.loads(read_compressed_vec(f).tobytes().decode())
        for k, (dstr, shape) in index.items():
            out[k] = read_compressed_vec(f).astype(
                np.dtype(dstr), copy=False).reshape(shape)
    return out
