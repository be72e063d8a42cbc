"""Fit-object persistence, repr, example fit, and MSE QC
(reference R/clonealign.R:348-357,380-387,415-434)."""

import numpy as np
import pytest

from clonealign_tpu import clonealign
from clonealign_tpu.assign import compute_ca_fit_mse, recompute_clone_assignment
from clonealign_tpu.fit import ClonealignFit
from clonealign_tpu.io.datasets import load_example_clonealign_fit
from clonealign_tpu.synth import simulate_multinomial

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fit():
    sim = simulate_multinomial(N=80, G=60, C=3, seed=3, mean_total=600)
    return clonealign(sim.Y, sim.L, max_iter=20, seed=0, verbose=False), sim


def test_repr(fit):
    f, sim = fit
    r = repr(f)
    assert "80 cells" in r and "60 genes" in r and "3 clones" in r


def test_save_load_roundtrip(fit, tmp_path):
    f, _ = fit
    p = str(tmp_path / "fit.npz")
    f.save(p)
    g = ClonealignFit.load(p)
    assert g.clone == f.clone
    assert g.clone_names == f.clone_names
    np.testing.assert_array_equal(g.ml_params["clone_probs"], f.ml_params["clone_probs"])
    np.testing.assert_allclose(g.convergence_info.final_elbo, f.convergence_info.final_elbo)
    assert g.convergence_info.n_iters == f.convergence_info.n_iters
    np.testing.assert_array_equal(g.correlations, f.correlations)


def test_example_clonealign_fit_loads():
    f = load_example_clonealign_fit()
    assert len(f.clone) == 200
    assert f.ml_params["clone_probs"].shape == (200, 3)
    assert "200 cells" in repr(f)


def test_compute_ca_fit_mse(fit):
    f, sim = fit
    # drop any unassigned cells first (the reference would error on them too)
    f_all = recompute_clone_assignment(f, 0.0)
    mse = compute_ca_fit_mse(f_all, sim.Y, sim.L)
    assert np.isfinite(mse) and mse > 0
    mse_mu = compute_ca_fit_mse(f_all, sim.Y, sim.L, model_mu=True)
    assert np.isfinite(mse_mu)
    # random clones should fit no better (almost surely worse)
    rng = np.random.default_rng(0)
    mse_rand = compute_ca_fit_mse(f_all, sim.Y, sim.L, random_clones=True, rng=rng)
    assert mse_rand >= mse * 0.9


def test_save_load_preserves_multirun_info(tmp_path):
    """run_clonealign fits keep the sweep QC payload across save/load
    (regression: it was silently dropped)."""
    import numpy as np

    from clonealign_tpu import run_clonealign
    from clonealign_tpu.fit import ClonealignFit
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(N=40, G=30, C=3, seed=1, mean_total=400)
    fit = run_clonealign(
        sim.Y, sim.L, initial_shrinks=[0, 5], n_repeats=1, max_iter=5,
        verbose=False, print_elbos=False,
    )
    p = str(tmp_path / "fit.npz")
    fit.save(p)
    loaded = ClonealignFit.load(p)
    assert loaded.multirun_info is not None
    np.testing.assert_allclose(
        loaded.multirun_info["elbos"], fit.multirun_info["elbos"]
    )
    assert loaded.multirun_info["best_run"] == fit.multirun_info["best_run"]
    assert (
        loaded.multirun_info["clone_prevalences_at_different_shrinks"]
        == fit.multirun_info["clone_prevalences_at_different_shrinks"]
    )
