"""Serving path (clonealign_tpu/serve.py): train on one cohort, assign a
held-out cohort without refitting."""

import numpy as np
import pytest

from clonealign_tpu import clonealign
from clonealign_tpu.serve import assign_cells
from clonealign_tpu.synth import assignment_accuracy, simulate_multinomial

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def split_fit():
    sim = simulate_multinomial(N=300, G=100, C=3, K=0, seed=8, mean_total=1500)
    train, test = slice(0, 200), slice(200, 300)
    fit = clonealign(sim.Y[train], sim.L, max_iter=120, seed=0, verbose=False)
    return sim, fit, train, test


def test_heldout_assignment_accuracy(split_fit):
    sim, fit, train, test = split_fit
    clones, probs = assign_cells(fit, sim.Y[test], sim.L)
    acc = assignment_accuracy(clones, fit.clone_names, sim.clone_idx[test])
    assert acc > 0.95
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


def test_serving_matches_training_cells(split_fit):
    """Assigning the TRAINING cells through the serving path should agree
    with the fit's own calls for confidently-assigned cells."""
    sim, fit, train, test = split_fit
    clones, _ = assign_cells(fit, sim.Y[train], sim.L)
    fit_calls = np.asarray(fit.clone, dtype=object)
    serve_calls = np.asarray(clones, dtype=object)
    both = (fit_calls != "unassigned") & (serve_calls != "unassigned")
    agreement = (fit_calls[both] == serve_calls[both]).mean()
    assert agreement > 0.95


def test_shape_validation(split_fit):
    _, fit, _, _ = split_fit
    with pytest.raises(ValueError, match="retained_genes"):
        assign_cells(fit, np.ones((5, 3)), np.ones((3, 3)))
    with pytest.raises(ValueError, match="required"):
        assign_cells(fit, np.ones((5, len(fit.ml_params["mu"]))))


def test_heldout_accuracy_with_latent_factor_fit():
    """Serving sets rfe=1 for unseen cells; with a K=1 fit on data generated
    WITH a latent factor the approximation still assigns correctly (the
    clone signal dominates the per-cell factor)."""
    sim = simulate_multinomial(N=200, G=80, C=3, K=1, seed=13, mean_total=1200)
    fit = clonealign(sim.Y[:140], sim.L, K=1, max_iter=100, seed=0, verbose=False)
    clones, _ = assign_cells(fit, sim.Y[140:], sim.L)
    acc = assignment_accuracy(clones, fit.clone_names, sim.clone_idx[140:])
    assert acc > 0.9


def test_narrowest_exact_rejects_negatives():
    """Negative values below the int8/int16 min must not wrap during the
    narrowing transfer cast (advisor round-2 finding): fall back to f32."""
    from clonealign_tpu.serve import _narrowest_exact

    assert _narrowest_exact(np.array([[1, 200]])) == np.int16
    assert _narrowest_exact(np.array([[1, 5]])) == np.int8
    assert _narrowest_exact(np.array([[1.0, -200.0]])) == np.float32
    assert _narrowest_exact(np.array([[1, -200]], dtype=np.int32)) == np.float32
