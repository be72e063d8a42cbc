"""The restart sweep shares the deterministic init passes (PCA scores, mu
guess) across lanes — reference semantics: prcomp and the data-driven mu
guess are deterministic per dataset, only the psi jitter differs per restart
(reference R/inference-tflow.R:204-235). These tests pin the sharing to be a
pure refactor of the per-lane path."""

import jax
import jax.numpy as jnp
import numpy as np

from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.synth import simulate_multinomial


def _data():
    sim = simulate_multinomial(N=60, G=40, C=3, seed=3, mean_total=300)
    return jnp.asarray(sim.Y, jnp.float32), jnp.asarray(sim.L, jnp.float32)


def test_precomputed_init_bitwise_equals_internal():
    """init_params(pca_scores=..., mu_guess=...) with the keys it would have
    derived itself is the identical computation (so lane 0 of a sweep — and
    therefore a 1-restart sweep — matches the single-fit path bitwise)."""
    Y, L = _data()
    lane_key = jax.random.PRNGKey(11)
    k_init, _ = jax.random.split(lane_key)

    pcs = mm.pca_init_scores(Y, 1, mm.lane0_pca_key(lane_key), jnp.float32)
    mu = mm.data_mu_guess(Y, jnp.float32)

    p_internal = mm.init_params(Y, L, k_init, K=1, dtype=jnp.float32)
    p_shared = mm.init_params(
        Y, L, k_init, K=1, dtype=jnp.float32, pca_scores=pcs, mu_guess=mu
    )
    for a, b in zip(p_internal, p_shared):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lanes_share_scores_differ_only_by_jitter():
    Y, L = _data()
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    pcs = mm.pca_init_scores(Y, 1, mm.lane0_pca_key(keys[0]), jnp.float32)
    psis = []
    for k in keys:
        k_init, _ = jax.random.split(k)
        p = mm.init_params(Y, L, k_init, K=1, dtype=jnp.float32, pca_scores=pcs)
        psis.append(np.asarray(p.psi))
    # same base scores, distinct jitters: differences bounded by the N(0,
    # 0.05) jitter scale, but not zero
    d01 = np.abs(psis[0] - psis[1])
    assert 0 < d01.max() < 1.0
    base = np.asarray(pcs)
    for ps in psis:
        assert np.abs(ps - base).max() < 1.0  # jitter-sized deviation only


def test_mu_guess_matches_reference_form():
    Y, _ = _data()
    mu = np.asarray(mm.data_mu_guess(Y, jnp.float32))
    Yn = np.asarray(Y, np.float64)
    expect = (Yn / Yn.mean(axis=1, keepdims=True)).mean(axis=0)
    np.testing.assert_allclose(mu, expect, rtol=1e-5)


def test_k0_shared_scores_empty():
    Y, _ = _data()
    pcs = mm.pca_init_scores(Y, 0, jax.random.PRNGKey(0), jnp.float32)
    assert pcs.shape == (Y.shape[0], 0)
