"""Native + fallback MatrixMarket loader tests (native/src/mtx_reader.cpp,
clonealign_tpu/io/mtx.py)."""

import gzip
import os

import numpy as np
import pytest

from clonealign_tpu.io import mtx as mtx_mod
from clonealign_tpu.io.mtx import load_cellranger_dir, read_mtx, read_mtx_info

pytestmark = pytest.mark.slow


def _write_mtx(path, dense, gz=False, pattern=False):
    rows, cols = dense.shape
    nz = np.argwhere(dense != 0)
    lines = [
        f"%%MatrixMarket matrix coordinate {'pattern' if pattern else 'integer'} general",
        "% comment line",
        f"{rows} {cols} {len(nz)}",
    ]
    for r, c in nz:
        if pattern:
            lines.append(f"{r + 1} {c + 1}")
        else:
            lines.append(f"{r + 1} {c + 1} {int(dense[r, c])}")
    payload = ("\n".join(lines) + "\n").encode()
    if gz:
        with gzip.open(path, "wb") as fh:
            fh.write(payload)
    else:
        with open(path, "wb") as fh:
            fh.write(payload)


@pytest.fixture(scope="module")
def dense():
    rng = np.random.default_rng(0)
    d = rng.poisson(0.5, (60, 45)).astype(float)
    d[0, 0] = 7  # ensure a nonzero at the corner
    return d


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_dense(tmp_path, dense, gz):
    p = str(tmp_path / ("m.mtx" + (".gz" if gz else "")))
    _write_mtx(p, dense, gz=gz)
    rows, cols, nnz = read_mtx_info(p)
    assert (rows, cols) == dense.shape
    assert nnz == (dense != 0).sum()
    out = read_mtx(p, dense=True)
    np.testing.assert_array_equal(out, dense)
    out_t = read_mtx(p, dense=True, transpose=True)
    np.testing.assert_array_equal(out_t, dense.T)


def test_roundtrip_coo(tmp_path, dense):
    p = str(tmp_path / "m.mtx")
    _write_mtx(p, dense)
    coo = read_mtx(p, dense=False)
    np.testing.assert_array_equal(coo.todense(), dense)


def test_pattern_matrix(tmp_path, dense):
    p = str(tmp_path / "pat.mtx")
    _write_mtx(p, dense, pattern=True)
    out = read_mtx(p, dense=True)
    np.testing.assert_array_equal(out, (dense != 0).astype(float))


def test_python_fallback_agrees(tmp_path, dense, monkeypatch):
    p = str(tmp_path / "m.mtx")
    _write_mtx(p, dense)
    native = read_mtx(p, dense=True)
    monkeypatch.setenv("CLONEALIGN_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(mtx_mod, "_lib", None)
    fallback = read_mtx(p, dense=True)
    np.testing.assert_array_equal(native, fallback)


def test_malformed_inputs(tmp_path):
    p = str(tmp_path / "bad.mtx")
    with open(p, "w") as fh:
        fh.write("not a matrix market file\n1 2 3\n")
    with pytest.raises(ValueError):
        read_mtx(p)
    p2 = str(tmp_path / "oob.mtx")
    with open(p2, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n2 2 1\n5 5 1\n")
    with pytest.raises(ValueError, match="bounds|malformed"):
        read_mtx(p2)


def test_cellranger_dir(tmp_path, dense):
    d = tmp_path / "cr"
    d.mkdir()
    _write_mtx(str(d / "matrix.mtx"), dense, gz=False)  # genes x cells on disk
    with open(d / "genes.tsv", "w") as fh:
        for i in range(dense.shape[0]):
            fh.write(f"ENSG{i:05d}\tGene{i}\n")
    with gzip.open(d / "barcodes.tsv.gz", "wt") as fh:
        for j in range(dense.shape[1]):
            fh.write(f"BC{j:04d}\n")
    Y, genes, barcodes = load_cellranger_dir(str(d))
    import scipy.sparse as sp

    assert sp.issparse(Y)  # default is memory-lean CSR
    assert Y.shape == (dense.shape[1], dense.shape[0])  # cells x genes
    np.testing.assert_array_equal(Y.toarray(), dense.T)
    assert genes[0] == "ENSG00000" and len(genes) == dense.shape[0]
    assert barcodes[0] == "BC0000" and len(barcodes) == dense.shape[1]
    Yd, _, _ = load_cellranger_dir(str(d), dense=True)
    np.testing.assert_array_equal(Yd, dense.T)


def test_large_parallel_path(tmp_path):
    # big enough to exercise the multi-threaded chunked parser
    rng = np.random.default_rng(1)
    rows, cols, nnz = 3000, 800, 400_000
    ri = rng.integers(0, rows, nnz)
    ci = rng.integers(0, cols, nnz)
    # dedupe coordinates (general files don't carry duplicates)
    key = ri * cols + ci
    _, idx = np.unique(key, return_index=True)
    ri, ci = ri[idx], ci[idx]
    vv = rng.integers(1, 100, len(ri))
    p = str(tmp_path / "big.mtx")
    with open(p, "w") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n")
        fh.write(f"{rows} {cols} {len(ri)}\n")
        np.savetxt(fh, np.column_stack([ri + 1, ci + 1, vv]), fmt="%d")
    out = read_mtx(p, dense=True)
    assert out.shape == (rows, cols)
    assert out.sum() == vv.sum()
    assert out[ri[0], ci[0]] == vv[0]


def test_pattern_mtx_python_fallback(tmp_path, monkeypatch):
    """Coordinate-pattern files (2-column entries) read correctly through
    the pure-Python fallback (regression: ragged loadtxt crash)."""
    import numpy as np

    monkeypatch.setenv("CLONEALIGN_TPU_NO_NATIVE", "1")
    from clonealign_tpu.io.mtx import read_mtx

    p = tmp_path / "pat.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "3 4 3\n"
        "1 1\n"
        "2 3\n"
        "3 4\n"
    )
    Y = read_mtx(str(p), dense=True)
    expect = np.zeros((3, 4))
    expect[0, 0] = expect[1, 2] = expect[2, 3] = 1
    np.testing.assert_array_equal(Y, expect)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_lying_header_rejected_not_overflowed(tmp_path):
    """A body with more entries than the declared nnz must raise, not write
    past the caller-allocated triplet arrays (native heap-overflow fix)."""
    import pytest

    from clonealign_tpu.io.mtx import read_mtx

    p = _write(
        tmp_path, "lie.mtx",
        "%%MatrixMarket matrix coordinate integer general\n"
        "3 3 1\n" + "".join(f"{1 + i % 3} {1 + (i // 3) % 3} 1\n" for i in range(50)),
    )
    with pytest.raises(ValueError):
        read_mtx(p, dense=False)


def test_out_of_bounds_triplets_raise(tmp_path):
    """Indices beyond the declared dims raise on BOTH dense and COO paths."""
    import pytest

    from clonealign_tpu.io.mtx import read_mtx

    p = _write(
        tmp_path, "oob.mtx",
        "%%MatrixMarket matrix coordinate integer general\n3 3 1\n9 9 5\n",
    )
    with pytest.raises(ValueError):
        read_mtx(p, dense=True)
    with pytest.raises(ValueError):
        read_mtx(p, dense=False)


def test_skew_symmetric_mirrors_negated(tmp_path):
    import numpy as np

    from clonealign_tpu.io.mtx import read_mtx

    p = _write(
        tmp_path, "skew.mtx",
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "3 3 1\n3 1 2.5\n",
    )
    Y = read_mtx(p, dense=True)
    assert Y[2, 0] == 2.5 and Y[0, 2] == -2.5


def test_complex_files_rejected(tmp_path):
    import pytest

    from clonealign_tpu.io.mtx import read_mtx

    p = _write(
        tmp_path, "cplx.mtx",
        "%%MatrixMarket matrix coordinate complex general\n2 2 1\n1 1 2 3\n",
    )
    with pytest.raises(ValueError, match="complex"):
        read_mtx(p, dense=True)


def test_duplicate_coordinates_accumulate(tmp_path):
    import numpy as np

    from clonealign_tpu.io.mtx import read_mtx

    p = _write(
        tmp_path, "dup.mtx",
        "%%MatrixMarket matrix coordinate integer general\n"
        "2 2 4\n1 1 1\n1 1 2\n2 2 3\n1 1 4\n",
    )
    Y = read_mtx(p, dense=True)
    np.testing.assert_array_equal(Y, [[7, 0], [0, 3]])


def test_read_mtx_info_consistent_for_symmetric(tmp_path):
    """read_mtx_info returns the header's nnz regardless of backend."""
    from clonealign_tpu.io.mtx import read_mtx_info

    p = _write(
        tmp_path, "sym.mtx",
        "%%MatrixMarket matrix coordinate real symmetric\n3 3 2\n2 1 1.0\n3 2 4.0\n",
    )
    assert read_mtx_info(p) == (3, 3, 2)


def test_zero_index_rejected_both_paths(tmp_path, monkeypatch):
    """1-based index 0 must raise on both backends (the Python fallback used
    to wrap it to the last row via negative indexing)."""
    import pytest

    p = _write(
        tmp_path, "zero.mtx",
        "%%MatrixMarket matrix coordinate integer general\n3 3 1\n0 1 5\n",
    )
    from clonealign_tpu.io.mtx import _py_read_mtx, read_mtx

    with pytest.raises(ValueError):
        _py_read_mtx(p, dense=True)
    with pytest.raises(ValueError):
        read_mtx(p, dense=True)


def test_truncated_header_raises_value_error(tmp_path):
    import pytest

    from clonealign_tpu.io.mtx import read_mtx_info

    p = _write(tmp_path, "trunc.mtx", "%%MatrixMarket matrix coordinate real general\n% only comments\n")
    with pytest.raises(ValueError, match="dimensions"):
        read_mtx_info(p)
