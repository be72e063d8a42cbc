"""Chebyshev sufficient-statistics fast path for the v1 negbin VEM.

Validates, against the exact clone-scan implementation it replaces:
(a) float64 agreement of the M-step objective, its gradient, and both
E-step accumulators (the expansion's approximation error, isolated from
f32 noise); (b) full-fit equivalence on the reference's own generative
spec (identical assignments / dosage calls, final ELBO within the f32
parity bar); (c) the large-count tail treatment (gammaln(y+phi) via the
log-y expansion) and its guards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clonealign_tpu.models import negbin as nb
from clonealign_tpu.synth import simulate_model3


def _random_problem(seed=0, N=300, G=50, C=3, count_scale=1.0):
    rng = np.random.default_rng(seed)
    L = rng.integers(1, 5, (G, C)).astype(float)
    mu = np.exp(rng.normal(0, 0.5, G)) * count_scale
    z = rng.integers(0, C, N)
    s = np.exp(rng.normal(0, 0.6, N))
    rates = s[:, None] * mu[None, :] * (L / L.mean(0)).T[z]
    Y = rng.poisson(rates).astype(float)
    Y[Y.sum(1) == 0, 0] = 1
    return Y, L


def _point(data, seed=1):
    """A generic (params, posterior) point away from any optimum."""
    G = data.Lp.shape[0]
    C = data.Lp.shape[1]
    N = data.Y.shape[0]
    params = nb.init_negbin_params(data, data.Y.dtype)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = params._replace(
        log_mu=params.log_mu + 0.1 * jax.random.normal(k1, (G,), data.Y.dtype),
        log_beta=params.log_beta - 0.05,
        log_phi=params.log_phi + 0.2,
    )
    gamma = jax.nn.softmax(
        jax.random.normal(k2, (N, C), data.Y.dtype), axis=1
    )
    r = jax.nn.sigmoid(jax.random.normal(k3, (G,), data.Y.dtype))
    return params, nb.NegbinPosterior(gamma=gamma, r=r)


def test_objective_and_accumulators_match_exact_f64():
    Y, L = _random_problem()
    data = nb.prepare_negbin_data(Y, L, dtype=jnp.float64)
    params, post = _point(data)
    consts = nb._nb_constants(data)
    stats = nb.negbin_cheb_stats(data, degree=12)
    ps = nb._gamma_stats(data, stats, post.gamma)

    exact = nb._mstep_objective(params, data, post, 1.0, consts)
    cheb = nb._mstep_objective_cheb(
        params, data, stats, ps, post.r, 1.0, consts
    )
    assert abs((cheb - exact) / exact) < 1e-9

    coeffs = nb._netted_cheb_coeffs(params, data, stats)
    A_exact, B_exact = nb._accumulate(params, data, post.r, post.gamma)
    A_cheb = nb._estep_A_cheb(data, stats, coeffs, post.r)
    B_cheb = nb._B_from_stats(coeffs, ps)
    np.testing.assert_allclose(A_cheb, A_exact, atol=5e-6)
    np.testing.assert_allclose(B_cheb, B_exact, rtol=1e-7, atol=1e-6)


def test_gradient_matches_exact_f64():
    Y, L = _random_problem(seed=3)
    data = nb.prepare_negbin_data(Y, L, dtype=jnp.float64)
    params, post = _point(data, seed=4)
    consts = nb._nb_constants(data)
    stats = nb.negbin_cheb_stats(data, degree=12)
    ps = nb._gamma_stats(data, stats, post.gamma)

    def le(p3):
        p = params._replace(log_mu=p3[0], log_beta=p3[1], log_phi=p3[2])
        return nb._mstep_objective(p, data, post, 1.0, consts)

    def lc(p3):
        p = params._replace(log_mu=p3[0], log_beta=p3[1], log_phi=p3[2])
        return nb._mstep_objective_cheb(
            p, data, stats, ps, post.r, 1.0, consts
        )

    p3 = (params.log_mu, params.log_beta, params.log_phi)
    ge = jax.grad(le)(p3)
    gc = jax.grad(lc)(p3)
    for a, b in zip(ge, gc):
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(b, a, atol=1e-6 * scale)


def test_tail_expansion_large_counts_f64():
    """Counts far beyond the histogram cap route gammaln(y+phi) through
    the log-y Chebyshev tail; the objective must still match exactly."""
    Y, L = _random_problem(seed=5, count_scale=3000.0)
    assert Y.max() > 10_000  # tail genuinely engaged
    data = nb.prepare_negbin_data(Y, L, dtype=jnp.float64)
    params, post = _point(data, seed=6)
    consts = nb._nb_constants(data)
    stats = nb.negbin_cheb_stats(data, degree=12)
    assert stats.hist.shape[0] == 1024  # capped
    assert float(jnp.sum(stats.tailT[:, 0])) > 0  # tail elements exist
    ps = nb._gamma_stats(data, stats, post.gamma)
    exact = nb._mstep_objective(params, data, post, 1.0, consts)
    cheb = nb._mstep_objective_cheb(
        params, data, stats, ps, post.r, 1.0, consts
    )
    assert abs((cheb - exact) / exact) < 1e-8

    # histogram + tail basis count every element exactly once
    n_hist = float(jnp.sum(stats.hist))
    n_tail = float(jnp.sum(stats.tailT[:, 0]))
    assert n_hist + n_tail == Y.size


def test_full_fit_equivalence_model3():
    """End to end on the reference's generative spec: the cheb fit must
    reproduce the exact fit's assignments and dosage calls, with the
    final (exactly re-evaluated) ELBO inside the f32 parity bar."""
    sim = simulate_model3(N=400, G=150, C=3, seed=29)
    # same m_steps on both sides so the ONLY difference is the expansion
    # (the impl-default inner-loop depths differ: 5 exact vs 30 cheb)
    fe = nb.inference_em(sim.Y, sim.L, max_iter=40, m_steps=5,
                         verbose=False)
    fc = nb.inference_em(sim.Y, sim.L, max_iter=40, m_steps=5,
                         verbose=False, likelihood_impl="cheb")
    ae = np.argmax(fe.clone_probs, 1)
    ac = np.argmax(fc.clone_probs, 1)
    assert (ae == ac).mean() == 1.0
    assert (ac == sim.clone_idx).mean() > 0.97
    # dosage calls: identical wherever the exact fit is confident (genes
    # parked near r=0.5 can flip under any objective perturbation)
    confident = np.abs(fe.rho_probs - 0.5) > 0.1
    assert confident.mean() > 0.8
    assert (
        (fe.rho_probs[confident] > 0.5) == (fc.rho_probs[confident] > 0.5)
    ).all()
    assert abs((fc.final_elbo - fe.final_elbo) / fe.final_elbo) < 1e-4
    # the cheb trace is the surrogate objective; it must still be a
    # climbing, finite trace
    tr = fc.elbo_trace
    assert np.isfinite(tr).all()
    assert tr[-1] > tr[0]


def test_cheb_m_steps_default_deepens():
    """Inner Adam steps cost no Y pass under cheb, so the impl defaults to
    m_steps=30 (vs 5 exact); at matched ITERATION budgets the deeper inner
    refinement must land an equal-or-better exact final ELBO."""
    sim = simulate_model3(N=300, G=100, C=3, seed=17)
    fe = nb.inference_em(sim.Y, sim.L, max_iter=30, verbose=False)
    fc = nb.inference_em(sim.Y, sim.L, max_iter=30, verbose=False,
                         likelihood_impl="cheb")
    assert fc.final_elbo >= fe.final_elbo - 1e-5 * abs(fe.final_elbo)


def test_non_integer_counts_rejected():
    Y, L = _random_problem(seed=7)
    Y = Y + 0.5
    data = nb.prepare_negbin_data(Y, L)
    with pytest.raises(ValueError, match="integer counts"):
        nb.negbin_cheb_stats(data)
    with pytest.raises(ValueError, match="integer counts"):
        nb.inference_em(Y, L, verbose=False, likelihood_impl="cheb")


def test_bad_impl_rejected():
    Y, L = _random_problem(seed=8)
    with pytest.raises(ValueError, match="likelihood_impl"):
        nb.inference_em(Y, L, verbose=False, likelihood_impl="fast")


def test_resume_continues_cheb_trajectory():
    """Chunked cheb fits continue exactly like the exact-path resume
    contract (params + posterior + Adam moments carried)."""
    sim = simulate_model3(N=200, G=80, C=3, seed=11)
    data = nb.prepare_negbin_data(sim.Y, sim.L)
    stats = nb.negbin_cheb_stats(data)
    full = nb.run_negbin_em(data, None, stats, max_iter=12, rel_tol=0.0,
                            m_steps=10)
    first = nb.run_negbin_em(data, None, stats, max_iter=6, rel_tol=0.0,
                             m_steps=10)
    second = nb.run_negbin_em(data, None, stats, max_iter=6, rel_tol=0.0,
                              m_steps=10, resume_from=first)
    np.testing.assert_allclose(
        second.params.log_mu, full.params.log_mu, rtol=1e-6
    )
    np.testing.assert_allclose(
        second.post.gamma, full.post.gamma, atol=1e-6
    )
    np.testing.assert_allclose(
        float(second.final_elbo), float(full.final_elbo),
        rtol=1e-6,
    )


def test_resume_refuses_mixed_impl():
    """A NegbinResult carries its backend marker (cheb_degree); resuming
    with a different impl or degree must raise instead of silently
    continuing a mixed trajectory (advisor r3 finding)."""
    sim = simulate_model3(N=80, G=40, C=3, seed=13)
    data = nb.prepare_negbin_data(sim.Y, sim.L)
    stats = nb.negbin_cheb_stats(data, degree=12)
    r_exact = nb.run_negbin_em(data, max_iter=3, rel_tol=0.0)
    r_cheb = nb.run_negbin_em(data, None, stats, max_iter=3, rel_tol=0.0)
    assert r_exact.cheb_degree is None
    assert r_cheb.cheb_degree == 12
    with pytest.raises(ValueError, match="exact backend"):
        nb.run_negbin_em(data, None, stats, max_iter=3, resume_from=r_exact)
    with pytest.raises(ValueError, match="cheb \\(degree 12\\)"):
        nb.run_negbin_em(data, max_iter=3, resume_from=r_cheb)
    stats8 = nb.negbin_cheb_stats(data, degree=8)
    with pytest.raises(ValueError, match="degree 8"):
        nb.run_negbin_em(data, None, stats8, max_iter=3, resume_from=r_cheb)
    # matching impls still resume fine
    cont = nb.run_negbin_em(data, None, stats, max_iter=3, rel_tol=0.0,
                            resume_from=r_cheb)
    assert cont.cheb_degree == 12
    assert np.isfinite(float(cont.final_elbo))
