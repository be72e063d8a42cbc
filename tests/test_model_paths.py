"""Coverage for less-travelled model configurations through the public API:
K=2, covariates+allele jointly, saturation, determinism of the sweep."""

import numpy as np
import pytest

from clonealign_tpu import clonealign, run_clonealign, saturate
from clonealign_tpu.synth import assignment_accuracy, simulate_multinomial

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sim():
    return simulate_multinomial(N=90, G=70, C=3, K=2, seed=21, mean_total=800)


def test_k2_latent_space(sim):
    fit = clonealign(sim.Y, sim.L, K=2, max_iter=60, seed=0, verbose=False)
    assert fit.ml_params["psi"].shape == (90, 2)
    assert fit.ml_params["W"].shape == (70, 2)
    assert fit.ml_params["chi"].shape == (2,)
    assert assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx) > 0.9


def test_covariates_plus_allele_jointly(sim):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(90, 1))
    V = 15
    clone_allele = rng.integers(1, 4, (V, 3)).astype(float)
    cov = rng.integers(1, 12, (90, V)).astype(float)
    ref = np.floor(cov * rng.uniform(0, 1, cov.shape))
    fit = clonealign(
        sim.Y, sim.L, x=x, clone_allele=clone_allele, cov=cov, ref=ref,
        max_iter=10, seed=0, verbose=False,
    )
    assert fit.ml_params["beta"].shape == (70, 1)
    assert fit.clone_probs_from_snv is not None
    assert np.isfinite(fit.convergence_info.final_elbo)


def test_saturation_applied(sim):
    L = sim.L.copy()
    L[0, 0] = 50  # extreme CN
    fit_sat = clonealign(sim.Y, L, max_iter=5, seed=0, verbose=False,
                         saturation_threshold=6)
    fit_unsat = clonealign(sim.Y, L, max_iter=5, seed=0, verbose=False,
                           saturate=False)
    # saturated and unsaturated models see different L -> different ELBO
    assert fit_sat.convergence_info.final_elbo != fit_unsat.convergence_info.final_elbo
    np.testing.assert_array_equal(saturate(L, 6).max(), 6.0)


def test_run_clonealign_deterministic(sim):
    kw = dict(initial_shrinks=(0, 5), n_repeats=1, max_iter=8, seed=17,
              verbose=False, print_elbos=False)
    f1 = run_clonealign(sim.Y, sim.L, **kw)
    f2 = run_clonealign(sim.Y, sim.L, **kw)
    np.testing.assert_array_equal(f1.multirun_info["elbos"], f2.multirun_info["elbos"])
    assert f1.clone == f2.clone


def test_gene_filter_threshold(sim):
    Y = sim.Y.copy()
    Y[:, 5] = 0  # silent gene
    fit = clonealign(Y, sim.L, max_iter=3, seed=0, verbose=False)
    assert len(fit.retained_genes) == sim.Y.shape[1] - 1
    assert len(fit.ml_params["mu"]) == sim.Y.shape[1] - 1
    # higher threshold removes more genes
    fit2 = clonealign(Y, sim.L, max_iter=3, seed=0, verbose=False,
                      gene_filter_threshold=Y.sum(axis=0).mean())
    assert len(fit2.retained_genes) < len(fit.retained_genes)
