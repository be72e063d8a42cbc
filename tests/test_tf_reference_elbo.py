"""ELBO parity against a TensorFlow transcription of the reference graph.

The float64 NumPy oracle (tests/oracle.py) checks the math; this check adds
an independent axis: the reference's literal graph STRUCTURE — the
'sg,gc->scg' / 'scg,ng->sgcn' einsum chain that materializes the
(S, C, N, G) tensor, the normalization, the transpose, the full ELBO
assembly (reference R/inference-tflow.R:288-336) — executed by actual
TensorFlow float32 kernels (lgamma, log_softmax, einsum), versus the
decomposed JAX implementation at float32. TFP itself is not installed, so
its distribution log-probs are written out in their closed forms.

Auto-skips when TensorFlow is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from clonealign_tpu.models import multinomial as mm

pytestmark = pytest.mark.slow


def tf_reference_elbo(Y, L, mu_base, qmu_loc, qmu_log_scale, gamma_logits,
                      alpha_unconstr, psi, W, chi_unconstr):
    """float32 TF transcription of reference R/inference-tflow.R:276-336."""
    f32 = tf.float32
    Y = tf.constant(Y, f32)
    L = tf.constant(L, f32)
    mu_base = tf.constant(mu_base, f32)          # (S, G) base-normal draws
    loc = tf.constant(qmu_loc, f32)
    scale = tf.exp(tf.constant(qmu_log_scale, f32))
    gamma_logits = tf.constant(gamma_logits, f32)
    alpha_unconstr = tf.constant(alpha_unconstr, f32)
    psi = tf.constant(psi, f32)
    W = tf.constant(W, f32)
    chi = tf.exp(tf.constant(chi_unconstr, f32))

    S = mu_base.shape[0]
    C = L.shape[1]
    mu_samples = tf.math.softplus(mu_base)

    log_alpha = tf.nn.log_softmax(alpha_unconstr)
    gamma = tf.nn.softmax(gamma_logits)

    rfe = tf.exp(tf.matmul(psi, W, transpose_b=True))  # (N, G)

    # the reference's einsum chain, materializing (S, C, N, G)
    mu_scg = tf.einsum("sg,gc->scg", mu_samples, L)
    mu_sgcn = tf.einsum("scg,ng->sgcn", mu_scg, rfe)
    norm = 1.0 / tf.reduce_sum(mu_sgcn, 1)
    mu_sgcn_norm = tf.einsum("sgcn,scn->sgcn", mu_sgcn, norm)
    mu_scng = tf.transpose(mu_sgcn_norm, perm=[0, 2, 3, 1])  # (S, C, N, G)

    # Multinomial log-prob in lgamma form (what tfd.Multinomial computes)
    totals = tf.reduce_sum(Y, axis=1)
    log_comb = tf.math.lgamma(totals + 1.0) - tf.reduce_sum(tf.math.lgamma(Y + 1.0), axis=1)
    p_y_on_c = log_comb[None, None, :] + tf.reduce_sum(
        Y[None, None, :, :] * tf.math.log(mu_scng), axis=3
    )  # (S, C, N)

    E_p_y_on_c = tf.reduce_mean(p_y_on_c, 0)
    EE_p_y = tf.reduce_sum(gamma * tf.transpose(E_p_y_on_c))

    half_log2pi = 0.5 * np.log(2 * np.pi).astype(np.float32)

    w_scale = tf.sqrt(1.0 / chi)  # (K,)
    zW = W / w_scale[None, :]
    W_lp = tf.reduce_sum(-0.5 * tf.square(zW) - tf.math.log(w_scale)[None, :] - half_log2pi)
    chi_lp = tf.reduce_sum(tf.math.log(chi) - chi)  # Gamma(2,1)
    psi_lp = tf.reduce_sum(-0.5 * tf.square(psi) - half_log2pi)

    dir_x = tf.exp(log_alpha) + 1e-3
    conc = 1.0 / float(C)
    dirichlet_lp = tf.reduce_sum((conc - 1.0) * tf.math.log(dir_x)) - float(C) * tf.math.lgamma(
        tf.constant(conc, f32)
    )

    E_log_p_p = (
        tf.reduce_sum(log_alpha[None, :] * gamma)
        + tf.reduce_sum(-0.5 * tf.square(tf.math.log(mu_samples)) - half_log2pi) / float(S)
        + dirichlet_lp
        + W_lp + chi_lp + psi_lp
    )

    # qmu log-prob through the softplus bijector at the base draws
    zq = (mu_base - loc[None, :]) / scale[None, :]
    qmu_lp = -0.5 * tf.square(zq) - tf.math.log(scale)[None, :] - half_log2pi
    qmu_lp = qmu_lp - tf.math.log_sigmoid(mu_base)
    log_gamma = tf.nn.log_softmax(gamma_logits)
    E_log_q = tf.reduce_sum(tf.reduce_mean(qmu_lp, 0)) + tf.reduce_sum(
        tf.where(gamma == 0, tf.zeros_like(gamma), gamma * log_gamma)
    )

    return float(EE_p_y + E_log_p_p - E_log_q)


def test_elbo_matches_tf_float32_graph():
    rng = np.random.default_rng(7)
    N, G, C, K, S = 40, 30, 3, 1, 2
    Y = rng.poisson(4.0, (N, G)).astype(np.float32)
    Y[0] += 1
    L = rng.integers(1, 5, (G, C)).astype(np.float32)
    mu_base = rng.normal(0.5, 1.0, (S, G)).astype(np.float32)
    qmu_loc = rng.normal(0, 1, G).astype(np.float32)
    qmu_log_scale = rng.normal(0, 0.2, G).astype(np.float32)
    gamma_logits = rng.normal(0, 1, (N, C)).astype(np.float32)
    alpha_unconstr = rng.normal(0, 0.5, C).astype(np.float32)
    psi = rng.normal(0, 1, (N, K)).astype(np.float32)
    W = rng.normal(0, 0.3, (G, K)).astype(np.float32)
    chi_unconstr = rng.normal(0, 0.2, K).astype(np.float32)

    ref = tf_reference_elbo(Y, L, mu_base, qmu_loc, qmu_log_scale,
                            gamma_logits, alpha_unconstr, psi, W, chi_unconstr)

    params = mm.CloneAlignParams(
        W=jnp.asarray(W), chi_unconstr=jnp.asarray(chi_unconstr),
        psi=jnp.asarray(psi), beta=jnp.zeros((G, 0), jnp.float32),
        alpha_unconstr=jnp.asarray(alpha_unconstr),
        qmu_loc=jnp.asarray(qmu_loc), qmu_log_scale=jnp.asarray(qmu_log_scale),
        gamma_logits=jnp.asarray(gamma_logits),
    )
    data = mm.prepare_data(Y, L, dtype=jnp.float32)
    config = mm.ModelConfig(K=K, P=0, mc_samples=S)

    import clonealign_tpu.models.multinomial as m

    orig = m.sample_mu_base
    m.sample_mu_base = lambda p, k, s: jnp.asarray(mu_base)
    try:
        ours = float(m.elbo(params, data, jax.random.PRNGKey(0), config))
    finally:
        m.sample_mu_base = orig

    # float32 kernels on both sides; the (S,C,N,G) chain accumulates
    # differently than the decomposed form, so tolerance is f32-level
    np.testing.assert_allclose(ours, ref, rtol=5e-5)
