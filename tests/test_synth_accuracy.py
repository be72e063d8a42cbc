"""Ground-truth recovery on synthetic data: the model must assign cells to
the generating clone (BASELINE.md config 2; generator spec from reference
inst/create_model3_synthetic.R:3-29)."""

import numpy as np

from clonealign_tpu import clonealign
import pytest

from clonealign_tpu.synth import (
    assignment_accuracy,
    simulate_model3,
    simulate_multinomial,
)

pytestmark = pytest.mark.slow


def test_model3_generator_spec():
    sim = simulate_model3(N=100, G=50, C=4, seed=0)
    assert sim.Y.shape == (100, 50)
    assert sim.L.shape == (50, 4)
    assert set(np.unique(sim.L)) <= {1.0, 2.0, 3.0, 4.0}
    assert sim.clone_idx.max() < 4
    # Lp columns each normalized by the clone's mean CN
    np.testing.assert_allclose(sim.L_normalized.mean(axis=0), 1.0, rtol=1e-12)
    assert set(np.unique(sim.rho)) <= {0, 1}


def test_model3_mixture_sampler_matches_nb_moments():
    """sampler='mixture' is the gamma-Poisson representation of the SAME
    NB(mean, size) law — per-gene means and variances must agree with the
    direct sampler within sampling noise (the structural draws — rho, pi,
    mu, phi, L, s — share the seed stream, so the conditional NB means are
    identical array-for-array)."""
    a = simulate_model3(N=3000, G=40, C=3, seed=123, sampler="nb")
    b = simulate_model3(N=3000, G=40, C=3, seed=123, sampler="mixture")
    for x, y in ((a.rho, b.rho), (a.mu, b.mu), (a.phi, b.phi),
                 (a.s, b.s), (a.clone_idx, b.clone_idx), (a.L, b.L)):
        np.testing.assert_array_equal(x, y)
    # NB mean per gene: average over cells of s_n * rate; both samplers see
    # the same means, so their empirical gene means must agree to a few %
    ma, mb = a.Y.mean(axis=0), b.Y.mean(axis=0)
    np.testing.assert_allclose(ma, mb, rtol=0.15)
    # variance is mean + mean^2/phi (overdispersed) — compare log-variances
    va, vb = a.Y.var(axis=0), b.Y.var(axis=0)
    np.testing.assert_allclose(np.log(va + 1), np.log(vb + 1), rtol=0.1)
    with pytest.raises(ValueError):
        simulate_model3(N=10, G=5, C=2, seed=0, sampler="bogus")


def test_recovers_clones_well_specified():
    sim = simulate_multinomial(N=150, G=100, C=3, seed=1, mean_total=2000)
    fit = clonealign(sim.Y, sim.L, max_iter=100, seed=0, verbose=False)
    acc = assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx)
    assert acc > 0.95


def test_recovers_clones_model3_misspecified():
    # NB-generated data (model mis-specification): the multinomial model
    # should still recover the clone structure.
    sim = simulate_model3(N=150, G=100, C=3, seed=2)
    fit = clonealign(sim.Y, sim.L, max_iter=100, seed=0, verbose=False)
    acc = assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx)
    assert acc > 0.9


def test_simulate_multinomial_clone_probs():
    """Skewed ground-truth prevalences (used by the recovery study)."""
    import numpy as np
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(
        N=4000, G=30, C=3, seed=0, clone_probs=[0.7, 0.2, 0.1]
    )
    freq = np.bincount(sim.clone_idx, minlength=3) / 4000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.03)
    import pytest

    with pytest.raises(ValueError, match="clone_probs"):
        simulate_multinomial(N=10, G=5, C=3, clone_probs=[0.5, 0.5])


@pytest.mark.slow
def test_statistical_recovery_guard():
    """Small-scale version of benchmarks/recovery_study.py as a regression
    net: parameter recovery and posterior calibration must not silently
    degrade. Thresholds are loose (small N) — failures mean a real change to
    the inference, not noise."""
    import numpy as np
    from clonealign_tpu import clonealign
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(
        N=600, G=200, C=3, seed=0, mean_total=1500, clone_probs=[0.55, 0.3, 0.15]
    )
    fit = clonealign(sim.Y, sim.L, max_iter=150, seed=0, verbose=False, y_storage="auto")

    probs = np.asarray(fit.ml_params["clone_probs"])
    acc = float((probs.argmax(1) == sim.clone_idx).mean())
    assert acc > 0.98

    mu_fit = np.asarray(fit.ml_params["mu"], np.float64)
    lf = np.log(mu_fit / mu_fit.mean())
    lt = np.log(sim.mu / sim.mu.mean())
    assert float(np.corrcoef(lf, lt)[0, 1]) > 0.98

    alpha = np.asarray(fit.ml_params["alpha"], np.float64)
    alpha = alpha / alpha.sum()
    assert float(np.abs(alpha - [0.55, 0.3, 0.15]).sum()) < 0.1
