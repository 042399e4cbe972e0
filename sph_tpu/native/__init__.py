"""Native runtime ops (C++ via ctypes).

The irregular host-side restructurings the reference does in C++
(GraphUtils/Boost CC, symmetrization, sparse merges) get a native fast path
here; every entry point has a pure-numpy fallback so the package works
without a toolchain.  The shared object is built on first use with g++ and
cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils.logging import Log

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphops.cpp")
_SO = os.path.join(_DIR, "libgraphops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        Log.info("native: build failed (%s); using numpy fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SPH_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        Log.info("native: load failed (%s); using numpy fallbacks", e)
        return None

    i64 = ctypes.c_int64
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.weak_components.restype = i64
    lib.weak_components.argtypes = [i64, i64, p_i32, p_i64]
    lib.edge_list_components.restype = i64
    lib.edge_list_components.argtypes = [i64, i64, p_i64, p_i64, p_i64]
    lib.symmetrize_degrees.restype = i64
    lib.symmetrize_degrees.argtypes = [i64, i64, p_i32, p_f32, p_i64]
    lib.symmetrize_fill.restype = None
    lib.symmetrize_fill.argtypes = [i64, i64, p_i32, p_f32, i64, p_i32,
                                    p_f32, p_i32]
    lib.argsort_i64.restype = None
    lib.argsort_i64.argtypes = [p_i64, i64, p_i64]
    lib.merge_sum.restype = i64
    lib.merge_sum.argtypes = [i64, i64, p_i32, p_f32, p_i64, i64,
                              ctypes.c_int, p_i64, p_i32, p_f32]
    lib.merge_min.restype = i64
    lib.merge_min.argtypes = [i64, i64, p_i32, p_f32, p_i64, i64,
                              p_i64, p_i32, p_f32]
    lib.pack_rows.restype = None
    lib.pack_rows.argtypes = [i64, p_i64, p_i32, p_f32, i64, i64, p_i32,
                              p_f32]
    lib.umap_sequential.restype = None
    lib.umap_sequential.argtypes = [i64, p_f32, i64, p_i32, p_i32, p_f32,
                                    i64, ctypes.c_float, ctypes.c_float,
                                    ctypes.c_float, i64, ctypes.c_uint64]
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.lz4_compress_bound.restype = i64
    lib.lz4_compress_bound.argtypes = [i64]
    lib.lz4_compress.restype = i64
    lib.lz4_compress.argtypes = [p_u8, i64, p_u8, i64]
    lib.lz4_decompress.restype = i64
    lib.lz4_decompress.argtypes = [p_u8, i64, p_u8, i64]
    _lib = lib
    Log.info("native: libgraphops loaded")
    return _lib


def weak_components(indices: np.ndarray) -> Optional[tuple]:
    """Native weak CC over padded [n, k] adjacency; None -> use fallback."""
    lib = get_lib()
    if lib is None:
        return None
    n, k = indices.shape
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    labels = np.empty(n, dtype=np.int64)
    ncc = lib.weak_components(n, k, idx, labels)
    if ncc < 0:  # out-of-domain neighbor id: use the scipy fallback
        return None
    return int(ncc), labels


def edge_list_components(num_nodes: int, src: np.ndarray, dst: np.ndarray
                         ) -> Optional[tuple]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    labels = np.empty(num_nodes, dtype=np.int64)
    ncc = lib.edge_list_components(num_nodes, len(src), src, dst, labels)
    if ncc < 0:  # out-of-domain endpoint: use the scipy fallback
        return None
    return int(ncc), labels


def merge_sum(indices: np.ndarray, values: np.ndarray,
              parents: np.ndarray, num_merged: int,
              weight_by_size: bool) -> Optional[tuple]:
    """Native sparse merge accumulation: returns (rows i64, cols i32,
    sums f32) sorted by (row, col), or None for the numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    n, r = indices.shape
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    val = np.ascontiguousarray(values, dtype=np.float32)
    par = np.ascontiguousarray(parents, dtype=np.int64)
    cap = n * r
    out_rows = np.empty(cap, dtype=np.int64)
    out_cols = np.empty(cap, dtype=np.int32)
    out_vals = np.empty(cap, dtype=np.float32)
    m = lib.merge_sum(n, r, idx, val, par, num_merged,
                      1 if weight_by_size else 0,
                      out_rows, out_cols, out_vals)
    if m < 0:
        return None
    return out_rows[:m], out_cols[:m], out_vals[:m]


def merge_min(indices: np.ndarray, values: np.ndarray,
              parents: np.ndarray, num_merged: int) -> Optional[tuple]:
    """Native min-merge accumulation; see merge_sum."""
    lib = get_lib()
    if lib is None:
        return None
    n, r = indices.shape
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    val = np.ascontiguousarray(values, dtype=np.float32)
    par = np.ascontiguousarray(parents, dtype=np.int64)
    cap = n * r
    out_rows = np.empty(cap, dtype=np.int64)
    out_cols = np.empty(cap, dtype=np.int32)
    out_vals = np.empty(cap, dtype=np.float32)
    m = lib.merge_min(n, r, idx, val, par, num_merged,
                      out_rows, out_cols, out_vals)
    if m < 0:
        return None
    return out_rows[:m], out_cols[:m], out_vals[:m]


def argsort_i64(keys: np.ndarray) -> Optional[np.ndarray]:
    """Native LSD-radix argsort of non-negative int64 keys (stable);
    None -> numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    if keys.size and int(keys.min()) < 0:
        return None  # radix assumes non-negative keys
    order = np.empty(len(keys), dtype=np.int64)
    lib.argsort_i64(keys, len(keys), order)
    return order


def pack_rows(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
              n: int, width: int) -> Optional[tuple]:
    """Native ragged->padded packing of row-sorted (row, col, val) triples;
    None -> numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    out_idx = np.empty((n, width), dtype=np.int32)
    out_val = np.empty((n, width), dtype=np.float32)
    lib.pack_rows(len(rows), rows, cols, vals, n, width, out_idx, out_val)
    return out_idx, out_val


def umap_sequential(embedding: np.ndarray, src: np.ndarray,
                    dst: np.ndarray, eps: np.ndarray, n_epochs: int,
                    a: float, b: float, initial_alpha: float = 1.0,
                    neg_rate: int = 5, seed: int = 42
                    ) -> Optional[np.ndarray]:
    """Sequential UMAP layout optimization — the ground-truth oracle for
    the batched-epoch SGD (models/umap.py).  Faithful per-edge sequential
    semantics of the reference's umappp optimizer (EmbedUmap.cpp:233-269).
    Returns the optimized embedding, or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    emb = np.ascontiguousarray(embedding, dtype=np.float32).copy()
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    eps = np.ascontiguousarray(eps, dtype=np.float32)
    lib.umap_sequential(emb.shape[0], emb, len(src), src, dst, eps,
                        n_epochs, a, b, initial_alpha, neg_rate, seed)
    return emb


def symmetrize(indices: np.ndarray, distances: np.ndarray,
               max_width: int = 0) -> Optional[tuple]:
    """Native symmetrize; returns (out_idx, out_dist, counts) or None.
    max_width > 0 caps the output row width at the source (hub rows keep
    their closest edges), avoiding a huge padded allocation."""
    lib = get_lib()
    if lib is None:
        return None
    n, k = indices.shape
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    dist = np.ascontiguousarray(distances, dtype=np.float32)
    degrees = np.empty(n, dtype=np.int64)
    max_deg = lib.symmetrize_degrees(n, k, idx, dist, degrees)
    if max_deg < 0:  # out-of-domain neighbor id: use the numpy fallback
        return None
    width = int(max_deg) + 1
    if max_width > 0:
        width = min(width, max_width)
    out_idx = np.empty((n, width), dtype=np.int32)
    out_dist = np.empty((n, width), dtype=np.float32)
    counts = np.empty(n, dtype=np.int32)
    lib.symmetrize_fill(n, k, idx, dist, width, out_idx, out_dist, counts)
    return out_idx, out_dist, counts


def lz4_compress(data: bytes | np.ndarray) -> Optional[bytes]:
    """LZ4 block-compress raw bytes; None -> use the zlib fallback."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8) if isinstance(data, bytes) \
        else np.ascontiguousarray(data, dtype=np.uint8).ravel()
    cap = int(lib.lz4_compress_bound(src.size))
    dst = np.empty(max(cap, 1), dtype=np.uint8)
    m = lib.lz4_compress(src if src.size else np.zeros(1, np.uint8),
                         src.size, dst, cap)
    if m < 0:
        return None
    return dst[:m].tobytes()


def lz4_decompress(data: bytes, original_size: int) -> Optional[bytes]:
    """Decompress an LZ4 block of known decompressed size; None on
    malformed input or when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    dst = np.empty(max(int(original_size), 1), dtype=np.uint8)
    m = lib.lz4_decompress(src if src.size else np.zeros(1, np.uint8),
                           src.size, dst, int(original_size))
    if m != original_size:
        return None
    return dst[:original_size].tobytes()
