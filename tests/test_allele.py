"""Unit tests for the allele-specific beta-binomial likelihood
(reference R/allele-specific.R) against closed-form/naive references."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from clonealign_tpu.models.allele import (
    beta_binomial_log_prob,
    construct_ai_likelihood,
    sanitize_allele_info,
    snv_clone_probs,
)

pytestmark = pytest.mark.slow


def naive_beta_binomial_pmf(k, n, a, b):
    from math import comb, lgamma

    def beta_fn(x, y):
        return math.exp(lgamma(x) + lgamma(y) - lgamma(x + y))

    return comb(n, k) * beta_fn(k + a, n - k + b) / beta_fn(a, b)


@pytest.mark.parametrize("k,n,a,b", [(0, 5, 2.0, 2.0), (3, 7, 0.1, 1.9), (7, 7, 1.9, 0.1), (2, 4, 2.0, 2.0)])
def test_beta_binomial_against_naive(k, n, a, b):
    ours = float(
        beta_binomial_log_prob(
            jnp.asarray(float(k)), jnp.asarray(float(n)), a, b
        )
    )
    assert np.isclose(ours, math.log(naive_beta_binomial_pmf(k, n, a, b)), rtol=1e-6)


def test_beta_binomial_normalizes():
    # sum over k of pmf == 1
    n = 9
    for a, b in [(2.0, 2.0), (0.1, 1.9)]:
        total = sum(
            float(
                jnp.exp(
                    beta_binomial_log_prob(jnp.asarray(float(k)), jnp.asarray(float(n)), a, b)
                )
            )
            for k in range(n + 1)
        )
        assert np.isclose(total, 1.0, rtol=1e-6)


def test_ai_likelihood_matches_naive_where_reduce():
    """The two-matmul form equals the reference's stack/where/reduce form
    (reference R/allele-specific.R:37-47)."""
    rng = np.random.default_rng(0)
    V, N, C = 11, 7, 3
    cov = rng.integers(1, 20, (V, N)).astype(np.float64)
    alt = np.floor(cov * rng.uniform(0, 1, (V, N)))
    clone_allele = rng.integers(1, 4, (V, C)).astype(np.float64)

    ours = np.asarray(
        construct_ai_likelihood(jnp.asarray(clone_allele), jnp.asarray(alt), jnp.asarray(cov))
    )

    # naive: per clone, per variant select balanced/imbalanced, sum variants
    def bb(k, n, a, b):
        return np.vectorize(lambda kk, nn: math.log(naive_beta_binomial_pmf(int(kk), int(nn), a, b)))(k, n)

    p1 = np.logaddexp(np.log(0.5) + bb(alt, cov, 0.1, 1.9), np.log(0.5) + bb(alt, cov, 1.9, 0.1))
    p2 = bb(alt, cov, 2.0, 2.0)
    expected = np.zeros((N, C))
    for c in range(C):
        sel = np.where((clone_allele[:, c] == 2)[:, None], p2, p1)  # (V, N)
        expected[:, c] = sel.sum(axis=0)
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_snv_clone_probs_normalized():
    v = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)))
    p = np.asarray(snv_clone_probs(v))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-6)


def test_sanitize_shapes():
    V, N, C = 4, 6, 2
    ca = np.ones((V, C))
    cov = np.ones((N, V))
    ref = np.ones((N, V))
    assert sanitize_allele_info(ca, cov, ref, N, C) == V
    with pytest.raises(ValueError):
        sanitize_allele_info(ca, cov.T, ref, N, C)
    with pytest.raises(ValueError):
        sanitize_allele_info(np.ones((V, 3)), cov, ref, N, C)


def test_allele_mode_end_to_end():
    from clonealign_tpu import clonealign
    from clonealign_tpu.io.datasets import load_example_sce

    sce = load_example_sce()
    rng = np.random.default_rng(0)
    V = 12
    clone_allele = rng.integers(1, 4, (V, 3)).astype(float)
    cov = rng.integers(1, 10, (sce.n_cells, V)).astype(float)
    ref = np.floor(cov * rng.uniform(0, 1, cov.shape))
    fit = clonealign(
        sce.counts,
        dict(zip(sce.clone_names, sce.copy_number.T)),
        clone_allele=clone_allele,
        cov=cov,
        ref=ref,
        max_iter=3,
        seed=0,
        verbose=False,
    )
    assert fit.clone_probs_from_snv is not None
    assert fit.clone_probs_from_snv.shape == (sce.n_cells, 3)
    np.testing.assert_allclose(fit.clone_probs_from_snv.sum(axis=1), 1.0, rtol=1e-5)
    assert np.isfinite(fit.convergence_info.final_elbo)
