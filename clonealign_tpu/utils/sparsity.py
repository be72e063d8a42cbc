"""Shared scipy-sparse detection (scipy is an optional dependency)."""

from __future__ import annotations


def is_scipy_sparse(x) -> bool:
    """True if ``x`` is a scipy sparse matrix/array; False when scipy is
    not installed (sparse inputs are then impossible anyway)."""
    try:
        import scipy.sparse as sp
    except ImportError:  # pragma: no cover
        return False
    return sp.issparse(x)


def device_dense_from_sparse_rows(Y, store_dtype, chunk: int = 32_768):
    """Assemble the dense device copy of a scipy CSR/CSC count matrix from
    row chunks at ``store_dtype``, so peak host memory is
    O(nnz + chunk x G) — the count matrix never exists densely on the host.
    Shared by the v2 (models/multinomial.prepare_data_sparse) and v1
    (models/negbin.prepare_negbin_data) ingestion paths."""
    import jax.numpy as jnp

    Y = Y.tocsr()
    N, G = Y.shape
    offs = list(range(0, N, chunk))
    if len(offs) == 1:
        return jnp.asarray(Y.toarray().astype(store_dtype))
    # donated in-place row writes: a concatenate of all chunks would
    # transiently hold two full storage copies on device (round-5 review)
    from ..models.multinomial import _fill_rows

    return _fill_rows(
        ((off, jnp.asarray(Y[off: off + chunk].toarray().astype(store_dtype)))
         for off in offs),
        N, G, store_dtype,
    )
