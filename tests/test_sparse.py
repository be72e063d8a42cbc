"""Sparse-aware ingestion: scipy CSR/CSC inputs flow through setup/fit with
no host-side N x G float64 densification (stats come from the sparse
structure; the device copy is assembled in chunks in the storage dtype) and
must give the same results as dense inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sp = pytest.importorskip("scipy.sparse")

from clonealign_tpu import clonealign
from clonealign_tpu.assign import compute_correlations
from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.synth import simulate_multinomial

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sim():
    return simulate_multinomial(N=80, G=50, C=3, seed=3, mean_total=150)


def test_prepare_data_sparse_matches_dense(sim):
    dense = mm.prepare_data(sim.Y, sim.L, dtype=jnp.float64)
    sparse = mm.prepare_data(sp.csr_matrix(sim.Y), sim.L, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(sparse.Y), np.asarray(dense.Y))
    np.testing.assert_allclose(np.asarray(sparse.s), np.asarray(dense.s))
    np.testing.assert_allclose(
        np.asarray(sparse.log_binom), np.asarray(dense.log_binom), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sparse.YlogL), np.asarray(dense.YlogL), rtol=1e-12
    )


def test_prepare_data_sparse_chunked_and_storage(sim):
    one = mm.prepare_data_sparse(
        sp.csr_matrix(sim.Y), sim.L, dtype=jnp.float64, chunk=7
    )
    np.testing.assert_array_equal(np.asarray(one.Y), np.asarray(sim.Y))
    stored = mm.prepare_data_sparse(
        sp.csr_matrix(sim.Y), sim.L, dtype=jnp.float32, y_storage=jnp.bfloat16
    )
    assert stored.Y.dtype == jnp.bfloat16
    # stats computed at full precision BEFORE the downcast
    np.testing.assert_allclose(
        np.asarray(stored.s), np.asarray(sim.Y.sum(axis=1)), rtol=1e-6
    )


@pytest.mark.parametrize("kind", ["csr", "csc"])
def test_sparse_fit_matches_dense(sim, kind):
    Ysp = sp.csr_matrix(sim.Y) if kind == "csr" else sp.csc_matrix(sim.Y)
    kw = dict(max_iter=20, dtype="float64", seed=4, verbose=False)
    fit_dense = clonealign(sim.Y, sim.L, **kw)
    fit_sparse = clonealign(Ysp, sim.L, **kw)
    np.testing.assert_allclose(
        fit_sparse.convergence_info.final_elbo,
        fit_dense.convergence_info.final_elbo,
        rtol=1e-10,
    )
    assert list(fit_sparse.clone) == list(fit_dense.clone)
    np.testing.assert_allclose(
        fit_sparse.correlations, fit_dense.correlations, rtol=1e-8, equal_nan=True
    )
    np.testing.assert_allclose(
        fit_sparse.ml_params["s"], fit_dense.ml_params["s"]
    )


def test_anndata_duck_with_sparse_X(sim):
    class FakeAnnData:
        pass

    ad = FakeAnnData()
    ad.X = sp.csr_matrix(sim.Y)
    ad.var_names = [f"g{i}" for i in range(sim.Y.shape[1])]
    ad.obs_names = [f"c{i}" for i in range(sim.Y.shape[0])]
    fit = clonealign(ad, sim.L, max_iter=5, seed=0, verbose=False)
    assert len(fit.clone) == sim.Y.shape[0]
    assert fit.retained_genes[0] == "g0"


def test_sparse_validation_errors(sim):
    Yz = sim.Y.copy()
    Yz[0] = 0  # a cell with no counts
    with pytest.raises(ValueError, match="no counts"):
        clonealign(sp.csr_matrix(Yz), sim.L, verbose=False)
    Yn = sim.Y.astype(float).copy()
    Yn[1, 1] = -3
    with pytest.raises(ValueError, match="non-negative"):
        clonealign(sp.csr_matrix(Yn), sim.L, verbose=False)


def test_correlations_sparse_matches_dense_and_naive(sim):
    rng = np.random.default_rng(0)
    clones = rng.choice(["clone_a", "clone_b", "clone_c", "unassigned"], 80)
    names = ["clone_a", "clone_b", "clone_c"]
    Y = sim.Y.astype(np.float64)
    Y[:, 0] = 5.0  # zero-variance gene -> NaN like R's cor
    dense = compute_correlations(Y, sim.L, clones, names)
    sparse = compute_correlations(sp.csr_matrix(Y), sim.L, clones, names)
    np.testing.assert_allclose(sparse, dense, rtol=1e-10, equal_nan=True)

    # naive per-gene corrcoef oracle
    keep = clones != "unassigned"
    idx = np.asarray([names.index(c) for c in clones[keep]])
    Yk = Y[keep]
    for g in [0, 1, 7, 23]:
        x = sim.L[g, idx]
        if np.std(x) == 0 or np.std(Yk[:, g]) == 0:
            assert np.isnan(dense[g])
        else:
            expected = np.corrcoef(x, Yk[:, g])[0, 1]
            np.testing.assert_allclose(dense[g], expected, rtol=1e-10)
