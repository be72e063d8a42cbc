"""Fast end-to-end sanity: one tiny fit through the public API, kept OUT of
the slow set so `pytest -m "not slow"` still exercises the whole pipeline
(ingest -> init -> warm start -> Adam loop -> assignment -> fit object)."""

import numpy as np

from clonealign_tpu import clonealign
from clonealign_tpu.synth import simulate_multinomial


def test_tiny_fit_end_to_end():
    sim = simulate_multinomial(N=40, G=25, C=2, seed=0, mean_total=300)
    fit = clonealign(sim.Y, sim.L, max_iter=5, seed=0, verbose=False, K=0)
    assert len(fit.clone) == 40
    assert fit.ml_params["clone_probs"].shape == (40, 2)
    trace = np.asarray(fit.convergence_info.elbo)
    assert np.isfinite(trace).all() and trace.shape[0] == 6
    assert set(fit.clone) <= {"clone_a", "clone_b", "unassigned"}
