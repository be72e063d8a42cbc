"""Pallas fused-likelihood kernel vs the pure-XLA reference implementation:
values and VJPs must agree (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clonealign_tpu.ops.fused_likelihood import (
    fused_likelihood_terms,
    reference_likelihood_terms,
)

pytestmark = pytest.mark.slow


def _inputs(N=70, G=90, C=4, K=2, S=2, seed=0):
    rng = np.random.default_rng(seed)
    Y = jnp.asarray(rng.poisson(3.0, (N, G)), jnp.float32)
    psi = jnp.asarray(rng.normal(0, 1, (N, K)), jnp.float32)
    W = jnp.asarray(rng.normal(0, 0.3, (G, K)), jnp.float32)
    mu = jnp.asarray(rng.lognormal(0, 0.5, (S, G)), jnp.float32)
    L = jnp.asarray(rng.integers(1, 5, (G, C)), jnp.float32)
    log_mu = jnp.log(mu)
    muL = (mu[:, None, :] * L.T[None, :, :]).transpose(2, 0, 1).reshape(G, S * C)
    return Y, psi, W, log_mu, muL


@pytest.mark.parametrize("shape", [(70, 90, 4, 2, 2), (130, 257, 3, 1, 1), (64, 512, 10, 1, 1)])
def test_forward_matches_reference(shape):
    N, G, C, K, S = shape
    Y, psi, W, log_mu, muL = _inputs(N, G, C, K, S, seed=N)
    a1, a2, z = fused_likelihood_terms(Y, psi, W, log_mu, muL)
    ra1, ra2, rz = reference_likelihood_terms(Y, psi, W, log_mu, muL)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(ra1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(ra2), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(rz), rtol=2e-5, atol=1e-4)


def test_vjp_matches_reference():
    Y, psi, W, log_mu, muL = _inputs()

    def scalarize(f):
        def wrapped(psi, W, log_mu, muL):
            a1, a2, z = f(Y, psi, W, log_mu, muL)
            # arbitrary nonlinear reduction touching all outputs
            return jnp.sum(a1 * 1.3) + jnp.sum(a2**2) * 0.1 + jnp.sum(jnp.log(z))

        return wrapped

    g_fused = jax.grad(scalarize(fused_likelihood_terms), argnums=(0, 1, 2, 3))(
        psi, W, log_mu, muL
    )
    g_ref = jax.grad(scalarize(reference_likelihood_terms), argnums=(0, 1, 2, 3))(
        psi, W, log_mu, muL
    )
    for gf, gr, name in zip(g_fused, g_ref, ["psi", "W", "log_mu", "muL"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=3e-5, atol=1e-4, err_msg=name
        )


def test_nondivisible_tiles():
    # shapes deliberately not multiples of the tile sizes
    Y, psi, W, log_mu, muL = _inputs(N=37, G=41, C=2, K=1, S=1, seed=9)
    a1, a2, z = fused_likelihood_terms(Y, psi, W, log_mu, muL)
    ra1, ra2, rz = reference_likelihood_terms(Y, psi, W, log_mu, muL)
    np.testing.assert_allclose(np.asarray(z), np.asarray(rz), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(ra1), rtol=2e-5, atol=1e-4)
