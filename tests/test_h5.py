"""HDF5 ingestion tests (clonealign_tpu/io/h5.py): synthetic .h5ad and
CellRanger .h5 files round-trip into clonealign's input orientation."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
sp = pytest.importorskip("scipy.sparse")

from clonealign_tpu.io.h5 import read_10x_h5, read_h5ad

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dense():
    rng = np.random.default_rng(0)
    return rng.poisson(1.0, (30, 20)).astype(np.float64)  # cells x genes


def _write_h5ad(path, X, sparse=False, layer=None):
    with h5py.File(path, "w") as f:
        def write_X(key, arr):
            if sparse:
                m = sp.csr_matrix(arr)
                g = f.create_group(key)
                g.attrs["encoding-type"] = "csr_matrix"
                g.attrs["shape"] = arr.shape
                g["data"] = m.data
                g["indices"] = m.indices
                g["indptr"] = m.indptr
            else:
                f[key] = arr

        write_X("X", X)
        if layer:
            write_X(f"layers/{layer}", X * 2)
        obs = f.create_group("obs")
        obs.attrs["_index"] = "cell_id"
        obs["cell_id"] = np.array([f"cell{i}".encode() for i in range(X.shape[0])])
        var = f.create_group("var")
        var.attrs["_index"] = "gene_id"
        var["gene_id"] = np.array([f"gene{j}".encode() for j in range(X.shape[1])])


@pytest.mark.parametrize("sparse", [False, True])
def test_h5ad_roundtrip(tmp_path, dense, sparse):
    p = str(tmp_path / "t.h5ad")
    _write_h5ad(p, dense, sparse=sparse)
    cm = read_h5ad(p)
    # sparse X stays scipy-sparse (nnz-bound host memory), dense stays dense
    assert sp.issparse(cm.counts) == sparse
    got = cm.counts.toarray() if sparse else cm.counts
    np.testing.assert_array_equal(got, dense)
    assert cm.cell_names[0] == "cell0" and cm.gene_names[-1] == "gene19"


def test_h5ad_layer(tmp_path, dense):
    p = str(tmp_path / "t.h5ad")
    _write_h5ad(p, dense, layer="counts")
    cm = read_h5ad(p, layer="counts")
    np.testing.assert_array_equal(cm.counts, dense * 2)
    with pytest.raises(ValueError, match="not found"):
        read_h5ad(p, layer="bogus")


def test_10x_h5_roundtrip(tmp_path, dense):
    p = str(tmp_path / "t.h5")
    genes_by_cells = sp.csc_matrix(dense.T)
    with h5py.File(p, "w") as f:
        g = f.create_group("matrix")
        g["data"] = genes_by_cells.data
        g["indices"] = genes_by_cells.indices
        g["indptr"] = genes_by_cells.indptr
        g["shape"] = np.array(genes_by_cells.shape)
        g["barcodes"] = np.array([f"BC{i}".encode() for i in range(dense.shape[0])])
        feat = g.create_group("features")
        feat["id"] = np.array([f"ENSG{j}".encode() for j in range(dense.shape[1])])
    cm = read_10x_h5(p)
    assert sp.issparse(cm.counts)  # memory-lean: stays CSR
    np.testing.assert_array_equal(cm.counts.toarray(), dense)
    assert cm.gene_names[0] == "ENSG0" and cm.cell_names[0] == "BC0"


def test_h5ad_feeds_clonealign(tmp_path, dense):
    from clonealign_tpu import clonealign

    p = str(tmp_path / "t.h5ad")
    _write_h5ad(p, dense + 1)  # avoid zero-count cells
    cm = read_h5ad(p)
    L = np.tile([[2.0, 3.0]], (cm.counts.shape[1], 1))
    L[::2, 0] = 1
    fit = clonealign(cm.counts, L, max_iter=3, seed=0, verbose=False)
    assert len(fit.clone) == dense.shape[0]


def test_h5ad_csc_encoding(tmp_path, dense):
    p = str(tmp_path / "csc.h5ad")
    with h5py.File(p, "w") as f:
        m = sp.csc_matrix(dense)
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csc_matrix"
        g.attrs["shape"] = dense.shape
        g["data"] = m.data
        g["indices"] = m.indices
        g["indptr"] = m.indptr
    cm = read_h5ad(p)
    assert sp.issparse(cm.counts)
    np.testing.assert_array_equal(cm.counts.toarray(), dense)


def test_10x_h5_legacy_per_genome_group(tmp_path, dense):
    p = str(tmp_path / "legacy.h5")
    gxc = sp.csc_matrix(dense.T)
    with h5py.File(p, "w") as f:
        g = f.create_group("GRCh38")
        g["data"] = gxc.data
        g["indices"] = gxc.indices
        g["indptr"] = gxc.indptr
        g["shape"] = np.array(gxc.shape)
        g["genes"] = np.array([f"ENSG{j}".encode() for j in range(dense.shape[1])])
        g["barcodes"] = np.array([f"BC{i}".encode() for i in range(dense.shape[0])])
    cm = read_10x_h5(p)
    np.testing.assert_array_equal(cm.counts.toarray(), dense)
    assert cm.gene_names[1] == "ENSG1"


def test_h5ad_structured_dataset_obs_var(tmp_path):
    """pre-0.7 anndata stored obs/var as structured datasets; name lookup
    must not crash on the membership test (regression)."""
    import h5py
    import numpy as np

    from clonealign_tpu.io.h5 import read_h5ad

    p = str(tmp_path / "legacy.h5ad")
    with h5py.File(p, "w") as f:
        f.create_dataset("X", data=np.arange(6.0).reshape(2, 3))
        dt = np.dtype([("index", "S8"), ("val", "f8")])
        f.create_dataset("obs", data=np.array([(b"c1", 0.1), (b"c2", 0.2)], dtype=dt))
        f.create_dataset("var", data=np.array(
            [(b"g1", 1.0), (b"g2", 2.0), (b"g3", 3.0)], dtype=dt))
    cm = read_h5ad(p)
    assert cm.cell_names == ["c1", "c2"]
    assert cm.gene_names == ["g1", "g2", "g3"]


def test_h5ad_legacy_h5sparse_shape(tmp_path):
    """pre-0.7 sparse X uses the h5sparse_shape attribute (regression:
    KeyError on missing 'shape')."""
    import h5py
    import numpy as np
    import scipy.sparse as sp

    from clonealign_tpu.io.h5 import read_h5ad

    Y = sp.csr_matrix(np.arange(6.0).reshape(2, 3))
    p = str(tmp_path / "h5sparse.h5ad")
    with h5py.File(p, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["h5sparse_format"] = "csr"
        g.attrs["h5sparse_shape"] = np.asarray(Y.shape)
        g.create_dataset("data", data=Y.data)
        g.create_dataset("indices", data=Y.indices)
        g.create_dataset("indptr", data=Y.indptr)
    cm = read_h5ad(p)
    np.testing.assert_array_equal(cm.counts.toarray(), Y.toarray())


def test_h5ad_categorical_index(tmp_path, dense):
    """anndata >= 0.8 writes categorical obs/var index columns as groups
    with 'categories' + 'codes'."""
    p = str(tmp_path / "cat.h5ad")
    with h5py.File(p, "w") as f:
        f["X"] = dense
        var = f.create_group("var")
        var.attrs["_index"] = "gene_id"
        gi = var.create_group("gene_id")
        gi["categories"] = np.array([f"g{j}".encode() for j in range(dense.shape[1])])
        gi["codes"] = np.arange(dense.shape[1], dtype=np.int8)
        obs = f.create_group("obs")
        obs.attrs["_index"] = "cell_id"
        obs["cell_id"] = np.array([f"c{i}".encode() for i in range(dense.shape[0])])
    cm = read_h5ad(p)
    assert cm.gene_names == [f"g{j}" for j in range(dense.shape[1])]
    assert cm.cell_names[0] == "c0"


def test_h5ad_unknown_sparse_encoding_raises(tmp_path, dense):
    p = str(tmp_path / "bad.h5ad")
    with h5py.File(p, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "coo_matrix"
        g.attrs["shape"] = dense.shape
        g["data"] = np.ones(3)
        g["row"] = np.arange(3)
        g["col"] = np.arange(3)
    with pytest.raises(ValueError, match="unsupported sparse encoding"):
        read_h5ad(p)


def test_h5ad_unknown_index_encoding_raises(tmp_path, dense):
    p = str(tmp_path / "badidx.h5ad")
    with h5py.File(p, "w") as f:
        f["X"] = dense
        var = f.create_group("var")
        var.attrs["_index"] = "gene_id"
        gi = var.create_group("gene_id")
        gi["something_else"] = np.arange(3)
    with pytest.raises(ValueError, match="unsupported index encoding"):
        read_h5ad(p)


def test_h5ad_preserves_on_disk_dtype(tmp_path):
    """No float64 widening: int32 counts stay int32 (sparse and dense)."""
    rng = np.random.default_rng(5)
    X = rng.poisson(1.0, (10, 6)).astype(np.int32)
    p = str(tmp_path / "i32.h5ad")
    with h5py.File(p, "w") as f:
        f["X"] = X
    assert read_h5ad(p).counts.dtype == np.int32
    p2 = str(tmp_path / "i32s.h5ad")
    with h5py.File(p2, "w") as f:
        m = sp.csr_matrix(X)
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["shape"] = X.shape
        g["data"] = m.data  # int32
        g["indices"] = m.indices
        g["indptr"] = m.indptr
    cm = read_h5ad(p2)
    assert cm.counts.dtype == np.int32


def test_h5ad_undeclared_sparse_layout_inferred(tmp_path, dense):
    """data/indices/indptr with a shape attr but NO encoding attrs: inferred
    from the indptr length (CSR indptr has n_obs+1 entries)."""
    p = str(tmp_path / "noenc.h5ad")
    m = sp.csr_matrix(dense)
    with h5py.File(p, "w") as f:
        g = f.create_group("X")
        g.attrs["shape"] = dense.shape
        g["data"] = m.data
        g["indices"] = m.indices
        g["indptr"] = m.indptr
    cm = read_h5ad(p)
    np.testing.assert_array_equal(cm.counts.toarray(), dense)
