"""likelihood_impl="z_cheb": the Chebyshev-approximated log-normalizer
(models/multinomial._compute_logZ_cheb) must agree with the exact path far
below the tolerances that matter, in value, gradient, and whole-fit results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.synth import simulate_multinomial

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    sim = simulate_multinomial(N=400, G=150, C=4, K=1, seed=2, mean_total=1500)
    data = mm.prepare_data(sim.Y, sim.L, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    params = mm.init_params(sim.Y, sim.L, key, K=1, dtype=jnp.float64)
    # non-trivial psi/W so the normalizer actually varies across cells
    k1, k2 = jax.random.split(key)
    params = params._replace(
        psi=jax.random.normal(k1, params.psi.shape, jnp.float64) * 2.0,
        W=jax.random.normal(k2, params.W.shape, jnp.float64) * 0.3,
    )
    return sim, data, params


def test_logZ_value_agreement(setup):
    _, data, params = setup
    mu = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (2, data.L.shape[0]),
                                   jnp.float64)) + 0.3
    exact = jnp.log(mm._compute_Z(params, data, mu))
    approx = mm._compute_logZ_cheb(params, data, mu, 32)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact), rtol=1e-9)


def test_logZ_gradient_agreement(setup):
    _, data, params = setup
    mu = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (1, data.L.shape[0]),
                                   jnp.float64)) + 0.3

    def loss_exact(p):
        return jnp.sum(jnp.sin(jnp.log(mm._compute_Z(p, data, mu))))

    def loss_cheb(p):
        return jnp.sum(jnp.sin(mm._compute_logZ_cheb(p, data, mu, 32)))

    ge = jax.grad(loss_exact)(params)
    gs = jax.grad(loss_cheb)(params)
    for name in ("psi", "W"):
        # the offline study puts the D=32 Chebyshev derivative error at
        # ~1e-11; the end-to-end f64 path adds einsum/accumulation rounding
        # on top, and the worst cells (expansion-range ends) measure ~4e-6
        np.testing.assert_allclose(
            np.asarray(getattr(gs, name)), np.asarray(getattr(ge, name)),
            rtol=1e-5, atol=1e-9, err_msg=name,
        )


def test_elbo_agreement(setup):
    _, data, params = setup
    key = jax.random.PRNGKey(7)
    e_exact = float(mm.elbo(params, data, key, mm.ModelConfig(K=1)))
    e_spline = float(mm.elbo(params, data, key,
                             mm.ModelConfig(K=1, likelihood_impl="z_cheb")))
    np.testing.assert_allclose(e_spline, e_exact, rtol=1e-10)


def test_full_fit_equivalence(setup):
    """Same keys: the z_cheb fit must land on the same assignments with
    final ELBO within tight tolerance of the exact fit."""
    sim, _, _ = setup
    from clonealign_tpu import clonealign

    fits = {}
    for impl in ("auto", "z_cheb"):
        # float64: at f32 the ~1e-6 interpolation perturbation amplifies
        # through Adam's trajectory exactly like f32-vs-f64 rounding does
        # (see the precision study) — the backend comparison belongs at f64
        fits[impl] = clonealign(
            sim.Y, sim.L, max_iter=60, seed=5, verbose=False,
            likelihood_impl=impl, dtype="float64",
        )
    np.testing.assert_allclose(
        fits["z_cheb"].convergence_info.final_elbo,
        fits["auto"].convergence_info.final_elbo,
        rtol=1e-6,
    )
    assert fits["z_cheb"].clone == fits["auto"].clone


def test_z_cheb_validation():
    with pytest.raises(ValueError, match="z_cheb"):
        cfg = mm.ModelConfig(K=0, likelihood_impl="z_cheb")
        mm._use_z_cheb(cfg)
    with pytest.raises(ValueError, match="z_cheb"):
        cfg = mm.ModelConfig(K=1, P=2, likelihood_impl="z_cheb")
        mm._use_z_cheb(cfg)


def test_cheb_eval_custom_vjp_matches_autodiff():
    """cheb_eval's analytic VJP (derivative recurrence + Vandermonde matmul)
    must equal plain autodiff through the Clenshaw loop, alone and vmapped."""
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    S, C, D, N = 2, 4, 16, 37
    coef = jax.random.normal(k1, (S, C, D + 1), jnp.float64)
    x = jnp.tanh(jax.random.normal(k2, (N,), jnp.float64))  # inside [-1, 1]
    cot_seed = jax.random.normal(k3, (S, C, N), jnp.float64)

    def loss_custom(coef, x):
        return jnp.sum(cot_seed * jnp.sin(mm.cheb_eval(coef, x)))

    def loss_auto(coef, x):
        return jnp.sum(cot_seed * jnp.sin(mm._clenshaw(coef, x)))

    np.testing.assert_allclose(
        float(loss_custom(coef, x)), float(loss_auto(coef, x)), rtol=1e-12
    )
    gc = jax.grad(loss_custom, argnums=(0, 1))(coef, x)
    ga = jax.grad(loss_auto, argnums=(0, 1))(coef, x)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(ga[0]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(ga[1]), rtol=1e-10)

    # vmapped (the restart-sweep path): per-lane coef AND per-lane x
    R = 3
    coefs = jax.random.normal(k1, (R, S, C, D + 1), jnp.float64)
    xs = jnp.tanh(jax.random.normal(k2, (R, N), jnp.float64))

    def lane_loss(f):
        def one(coef, x):
            return jnp.sum(jnp.cos(f(coef, x)))
        return jnp.sum(jax.vmap(one)(coefs, xs))

    gvc = jax.grad(lambda c: lane_loss(mm.cheb_eval))(coefs)
    gva = jax.grad(lambda c: lane_loss(mm._clenshaw))(coefs)
    np.testing.assert_allclose(np.asarray(gvc), np.asarray(gva), rtol=1e-10)


def test_remat_auto_resolution_and_equivalence(setup):
    """remat="auto" skips jax.checkpoint under z_cheb (no N x G residuals to
    save) and keeps it for the exact path; either way the results agree to
    f64 rounding — checkpoint only changes WHEN intermediates are computed
    (recompute re-fuses, so the last few bits can differ)."""
    sim, _, _ = setup
    from clonealign_tpu import clonealign

    fits = {}
    for remat in ("auto", True, False):
        fits[remat] = clonealign(
            sim.Y, sim.L, max_iter=25, seed=11, verbose=False,
            likelihood_impl="z_cheb", dtype="float64", remat=remat,
        )
    ref = fits["auto"].convergence_info.final_elbo
    for remat in (True, False):
        np.testing.assert_allclose(
            fits[remat].convergence_info.final_elbo, ref, rtol=1e-12
        )
        assert fits[remat].clone == fits["auto"].clone


def test_auto_impl_size_gate():
    """"auto" resolves to z_cheb only past the ~1M-element gate: measured
    on-chip (round 4), z_cheb-TRAINED toy fits settle ~1e-4 relative from
    the f64 oracle (200x100 example: 1.17e-4; 1000x400 allele toy) while
    every gated-in scale passes the parity bar — and below the gate the
    exact normalizer's cost is unmeasurable anyway (api.setup_fit)."""
    from clonealign_tpu.api import setup_fit

    rng = np.random.default_rng(0)
    Ysmall = rng.poisson(3.0, (100, 200)).astype(np.float64)   # 20k elements
    Ybig = rng.poisson(3.0, (1000, 1000)).astype(np.float64)   # 1M elements
    Lsmall = rng.integers(1, 4, (200, 3)).astype(np.float64)
    Lbig = rng.integers(1, 4, (1000, 3)).astype(np.float64)

    assert setup_fit(Ysmall, Lsmall, verbose=False).config.likelihood_impl == "xla"
    assert setup_fit(Ybig, Lbig, verbose=False).config.likelihood_impl == "z_cheb"
    # float64 fits stay exact-path at every size (the oracle configuration)
    assert (
        setup_fit(Ybig, Lbig, verbose=False, dtype="float64").config.likelihood_impl
        == "xla"
    )
    # explicit requests are never second-guessed by the gate
    assert (
        setup_fit(Ysmall, Lsmall, verbose=False, likelihood_impl="z_cheb")
        .config.likelihood_impl
        == "z_cheb"
    )
