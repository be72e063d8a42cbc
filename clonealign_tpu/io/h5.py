"""HDF5 single-cell formats: AnnData ``.h5ad`` and 10x CellRanger ``.h5``.

Minimal readers via h5py — no anndata/scanpy dependency. Both return dense
cells-by-genes counts plus names, ready for :func:`clonealign_tpu.clonealign`.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class CountMatrix(NamedTuple):
    counts: np.ndarray  # (cells, genes)
    gene_names: list
    cell_names: list


def _decode(arr):
    return [x.decode() if isinstance(x, bytes) else str(x) for x in np.asarray(arr)]


def _sparse_group_to_dense(g, shape):
    """CSR/CSC group ('data', 'indices', 'indptr') -> dense array."""
    import scipy.sparse as sp

    enc = g.attrs.get("encoding-type", "csr_matrix")
    if isinstance(enc, bytes):
        enc = enc.decode()
    data = g["data"][:]
    indices = g["indices"][:]
    indptr = g["indptr"][:]
    cls = sp.csr_matrix if "csr" in enc else sp.csc_matrix
    return np.asarray(cls((data, indices, indptr), shape=shape).todense())


def _read_names(h5, group_name, fallback_n):
    """Extract the index column of an AnnData obs/var group."""
    if group_name not in h5:
        return [str(i) for i in range(fallback_n)]
    import h5py

    g = h5[group_name]
    index_col = g.attrs.get("_index", "index")
    if isinstance(index_col, bytes):
        index_col = index_col.decode()
    # membership tests on a DATASET iterate+compare rows (and crash on
    # structured dtypes), so branch on the container type first
    if isinstance(g, h5py.Group):
        if index_col in g:
            return _decode(g[index_col][:])
    elif g.dtype.names and "index" in g.dtype.names:
        # pre-0.7 anndata: obs/var stored as a structured dataset
        return _decode(g["index"])
    return [str(i) for i in range(fallback_n)]


def read_h5ad(path: str, layer: str = None) -> CountMatrix:
    """Read an AnnData ``.h5ad``: X (dense or sparse), obs_names, var_names.

    ``layer`` selects ``layers/<name>`` (e.g. "counts") instead of ``X`` —
    useful because scanpy pipelines usually leave normalized data in X.
    """
    import h5py

    with h5py.File(path, "r") as f:
        key = f"layers/{layer}" if layer else "X"
        if key not in f:
            raise ValueError(f"{key!r} not found in {path}")
        X = f[key]
        if isinstance(X, h5py.Group):
            for attr_src, attr in ((X.attrs, "shape"), (X.attrs, "h5sparse_shape"), (f.attrs, "shape")):
                if attr in attr_src:
                    shape = tuple(attr_src[attr])
                    break
            else:
                raise ValueError(
                    f"sparse group {key!r} has no shape attribute "
                    "(looked for 'shape' and legacy 'h5sparse_shape')"
                )
            counts = _sparse_group_to_dense(X, shape)
        else:
            counts = X[:]
        n_obs, n_var = counts.shape
        cell_names = _read_names(f, "obs", n_obs)
        gene_names = _read_names(f, "var", n_var)
    return CountMatrix(np.asarray(counts, np.float64), gene_names, cell_names)


def read_10x_h5(path: str) -> CountMatrix:
    """Read a CellRanger ``.h5`` (CSC genes x cells under the ``matrix``
    group, or legacy per-genome groups). Returns cells-by-genes counts."""
    import h5py
    import scipy.sparse as sp

    with h5py.File(path, "r") as f:
        if "matrix" in f:
            g = f["matrix"]
            features = _decode(g["features/id"][:]) if "features" in g else _decode(g["genes"][:])
        else:
            # legacy format: one group per genome
            genome = next(iter(f.keys()))
            g = f[genome]
            features = _decode(g["genes"][:])
        shape = tuple(g["shape"][:])  # (genes, cells)
        mat = sp.csc_matrix(
            (g["data"][:], g["indices"][:], g["indptr"][:]), shape=shape
        )
        barcodes = _decode(g["barcodes"][:])
    return CountMatrix(
        np.asarray(mat.T.todense(), np.float64), features, barcodes
    )
