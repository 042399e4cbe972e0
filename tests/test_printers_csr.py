"""PrintHelper / MatrixCSR parity tests."""

import numpy as np

from sph_tpu.ops.csr import MatrixCSR
from sph_tpu.ops.sparse import SparseRows
from sph_tpu.utils.printers import (format_graph_dense,
                                    format_image_components,
                                    format_sparse_dense)


def test_csr_roundtrip():
    dense = np.array([[0, 1, 0], [2, 0, 3], [0, 0, 0]], np.float32)
    sr = SparseRows.from_dense(dense)
    csr = MatrixCSR.from_sparse_rows(sr)
    assert csr.nnz == 3
    assert np.allclose(csr.to_scipy().toarray(), dense)
    back = csr.to_sparse_rows()
    assert np.allclose(back.to_dense(), dense)
    t = csr.transpose()
    assert np.allclose(t.to_scipy().toarray(), dense.T)


def test_image_component_printer():
    # the 4x4 golden layout from the reference hierarchy test
    pix = np.array([0, 0, 0, 0, 1, 2, 2, 3, 1, 2, 2, 3, 1, 4, 4, 3])
    s = format_image_components(pix, 4, 4)
    lines = s.splitlines()
    assert len(lines) == 4
    assert lines[0].split() == ["0", "0", "0", "0"]
    assert lines[1].split() == ["1", "2", "2", "3"]


def test_dense_format_helpers():
    sr = SparseRows.from_dense(np.eye(3, dtype=np.float32))
    out = format_sparse_dense(sr)
    assert "1" in out
    from sph_tpu.ops.graph import KnnGraph
    idx = np.array([[0, 1], [1, 0]], dtype=np.int32)
    dist = np.array([[0, 2.5], [0, 2.5]], dtype=np.float32)
    out2 = format_graph_dense(KnnGraph(idx, dist))
    assert "2.5" in out2
