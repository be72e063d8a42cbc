"""Integration coverage for the memory-lean large-N machinery
(models/multinomial.py: _prepare_data_dense_chunked, _pca_scores_blocked,
gene-blocked _compute_Z). The gates are size thresholds; these tests force
them low and run the FULL public API so the blocked code paths execute
inside the jitted fit program (including under vmapped restarts), asserting
they change nothing observable."""

import numpy as np
import pytest

import clonealign_tpu.models.multinomial as mm
from clonealign_tpu import clonealign, run_clonealign
from clonealign_tpu.synth import simulate_multinomial


@pytest.fixture
def forced_blocking(monkeypatch):
    monkeypatch.setattr(mm, "_CHUNK_ELEMENTS", 2000)
    monkeypatch.setattr(mm, "_Z_BLOCK_ELEMENTS", 2500)


def test_clonealign_end_to_end_with_blocked_paths(forced_blocking):
    sim = simulate_multinomial(N=80, G=50, C=3, seed=6, mean_total=700)
    fit = clonealign(
        sim.Y, sim.L, max_iter=20, seed=3, verbose=False, y_storage="auto"
    )
    assert len(fit.clone) == 80
    assert np.isfinite(fit.convergence_info.final_elbo)


def test_blocked_paths_change_nothing_observable():
    """Same fit with and without forced blocking: identical assignments and
    matching ELBO (blocked sums reorder float ops, so allow float32 noise).

    The size gates are read at TRACE time, so the jit cache must be cleared
    between the two runs or the second would silently reuse the first's
    compiled (unblocked) program."""
    import jax

    sim = simulate_multinomial(N=80, G=50, C=3, seed=6, mean_total=700)
    jax.clear_caches()
    ref = clonealign(sim.Y, sim.L, max_iter=20, seed=3, verbose=False)

    orig_c, orig_z = mm._CHUNK_ELEMENTS, mm._Z_BLOCK_ELEMENTS
    mm._CHUNK_ELEMENTS, mm._Z_BLOCK_ELEMENTS = 2000, 2500
    jax.clear_caches()
    try:
        blk = clonealign(sim.Y, sim.L, max_iter=20, seed=3, verbose=False)
    finally:
        mm._CHUNK_ELEMENTS, mm._Z_BLOCK_ELEMENTS = orig_c, orig_z
        jax.clear_caches()

    assert list(blk.clone) == list(ref.clone)
    np.testing.assert_allclose(
        blk.convergence_info.final_elbo,
        ref.convergence_info.final_elbo,
        rtol=5e-4,  # different PCA block-matmul rounding shifts trajectories
    )


def test_multirestart_sweep_with_blocked_paths(forced_blocking):
    """The blocked init runs inside the vmapped restart program."""
    sim = simulate_multinomial(N=60, G=45, C=3, seed=8, mean_total=600)
    fit = run_clonealign(
        sim.Y, sim.L, initial_shrinks=[0, 5], n_repeats=1, max_iter=10,
        seed=2, verbose=False, print_elbos=False,
    )
    assert len(fit.multirun_info["elbos"]) == 2
    assert np.isfinite(fit.convergence_info.final_elbo)
