"""END-TO-END training-loop parity against the reference graph.

test_tf_reference_elbo.py checks the objective at a single parameter point;
this runs the reference's actual *loop* — likelihood-based gamma warm start →
initial ELBO → per-iteration (Adam step with fresh MC sample, ELBO re-eval
with another fresh sample) — as a real TF1 graph/session transcription of
reference R/inference-tflow.R:204-421, with tf.compat.v1.train.AdamOptimizer
(the very optimizer class the reference uses, R/inference-tflow.R:345-346).

Both sides get IDENTICAL initial parameters and an identical per-call MC
noise sequence: the JAX production loop threads keys as
(warm, init-eval, then per-iteration train/eval splits), exactly mirroring
the reference's sequence of resampling sess$run calls; the test replays that
key schedule to feed the same reparametrization draws into the TF graph via
a placeholder. Everything runs in float64, so the per-iteration ELBO
trajectory must agree to near machine precision and the final clone
assignments must be identical — if any term of the training step (gradient,
optimizer update, warm start, convergence bookkeeping) drifted from the
reference, this test fails.

Auto-skips when TensorFlow is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from clonealign_tpu.assign import clone_assignment
from clonealign_tpu.infer import run_inference
from clonealign_tpu.io.datasets import load_example_sce
from clonealign_tpu.models import multinomial as mm

pytestmark = pytest.mark.slow

tf1 = tf.compat.v1


def build_reference_graph(Y, L, params0, learning_rate, S):
    """float64 TF1 transcription of the reference graph + loop ops
    (reference R/inference-tflow.R:238-346,336-369): the literal
    'sg,gc->scg'/'scg,ng->sgcn' einsum chain materializing (S, C, N, G),
    the ELBO assembly with its quirks, the gamma warm-start assign op, and
    the AdamOptimizer train op. MC noise enters through an eps placeholder
    (the reference's qmu$sample resamples per sess$run)."""
    f = tf.float64
    N, G = Y.shape
    C = L.shape[1]
    graph = tf1.Graph()
    with graph.as_default():
        Yc = tf.constant(Y, f)
        Lc = tf.constant(L, f)
        W = tf1.Variable(np.asarray(params0.W, np.float64), dtype=f)
        chi_var = tf1.Variable(np.asarray(params0.chi_unconstr, np.float64), dtype=f)
        psi = tf1.Variable(np.asarray(params0.psi, np.float64), dtype=f)
        alpha_unconstr = tf1.Variable(
            np.asarray(params0.alpha_unconstr, np.float64), dtype=f
        )
        qmu_loc = tf1.Variable(np.asarray(params0.qmu_loc, np.float64), dtype=f)
        qmu_log_scale = tf1.Variable(
            np.asarray(params0.qmu_log_scale, np.float64), dtype=f
        )
        gamma_logits = tf1.Variable(
            np.asarray(params0.gamma_logits, np.float64), dtype=f
        )

        eps = tf1.placeholder(f, shape=(S, G))
        scale = tf.exp(qmu_log_scale)
        mu_base = qmu_loc[None, :] + scale[None, :] * eps
        mu_samples = tf.math.softplus(mu_base)

        chi = tf.exp(chi_var)
        log_alpha = tf.nn.log_softmax(alpha_unconstr)
        gamma = tf.nn.softmax(gamma_logits)
        rfe = tf.exp(tf.matmul(psi, W, transpose_b=True))  # (N, G)

        # reference R/inference-tflow.R:288-296
        mu_scg = tf.einsum("sg,gc->scg", mu_samples, Lc)
        mu_sgcn = tf.einsum("scg,ng->sgcn", mu_scg, rfe)
        norm = 1.0 / tf.reduce_sum(mu_sgcn, 1)
        mu_sgcn_norm = tf.einsum("sgcn,scn->sgcn", mu_sgcn, norm)
        mu_scng = tf.transpose(mu_sgcn_norm, perm=[0, 2, 3, 1])
        totals = tf.reduce_sum(Yc, axis=1)
        log_comb = tf.math.lgamma(totals + 1.0) - tf.reduce_sum(
            tf.math.lgamma(Yc + 1.0), axis=1
        )
        p_y_on_c = log_comb[None, None, :] + tf.reduce_sum(
            Yc[None, None, :, :] * tf.math.log(mu_scng), axis=3
        )  # (S, C, N)

        # reference R/inference-tflow.R:298-336
        E_p_y_on_c = tf.reduce_mean(p_y_on_c, 0)
        EE_p_y = tf.reduce_sum(gamma * tf.transpose(E_p_y_on_c))

        half_log2pi = 0.5 * np.log(2 * np.pi)
        w_scale = tf.sqrt(1.0 / chi)
        zW = W / w_scale[None, :]
        W_lp = tf.reduce_sum(
            -0.5 * tf.square(zW) - tf.math.log(w_scale)[None, :] - half_log2pi
        )
        chi_lp = tf.reduce_sum(tf.math.log(chi) - chi)  # Gamma(2, 1)
        psi_lp = tf.reduce_sum(-0.5 * tf.square(psi) - half_log2pi)

        dir_x = tf.exp(log_alpha) + 1e-3
        conc = 1.0 / C
        dirichlet_lp = tf.reduce_sum((conc - 1.0) * tf.math.log(dir_x)) - float(
            C
        ) * tf.math.lgamma(tf.constant(conc, f))

        E_log_p_p = (
            tf.reduce_sum(log_alpha[None, :] * gamma)
            + tf.reduce_sum(-0.5 * tf.square(tf.math.log(mu_samples)) - half_log2pi)
            / float(S)
            + dirichlet_lp
            + W_lp
            + chi_lp
            + psi_lp
        )

        zq = (mu_base - qmu_loc[None, :]) / scale[None, :]
        qmu_lp = -0.5 * tf.square(zq) - tf.math.log(scale)[None, :] - half_log2pi
        qmu_lp = qmu_lp - tf.math.log_sigmoid(mu_base)
        log_gamma = tf.nn.log_softmax(gamma_logits)
        E_log_q = tf.reduce_sum(tf.reduce_mean(qmu_lp, 0)) + tf.reduce_sum(
            tf.where(gamma == 0, tf.zeros_like(gamma), gamma * log_gamma)
        )

        elbo = EE_p_y + E_log_p_p - E_log_q

        # gamma warm start (reference R/inference-tflow.R:338-342,367-369)
        gi = tf.reduce_sum(p_y_on_c, axis=0)
        gi = gi - tf.reduce_logsumexp(gi, 0)
        gamma_init = tf.transpose(gi)
        gamma_init_ph = tf1.placeholder(f, shape=(N, C))
        init_gamma = tf1.assign(gamma_logits, gamma_init_ph)

        train = tf1.train.AdamOptimizer(learning_rate=learning_rate).minimize(-elbo)
        init = tf1.global_variables_initializer()
        mu_out = tf.math.softplus(qmu_loc)

    return graph, dict(
        eps=eps,
        elbo=elbo,
        gamma=gamma,
        gamma_init=gamma_init,
        gamma_init_ph=gamma_init_ph,
        init_gamma=init_gamma,
        train=train,
        init=init,
        mu=mu_out,
    )


def test_full_training_loop_matches_tf_reference():
    sce = load_example_sce()
    Y = np.asarray(sce.counts, np.float64)
    L = np.asarray(sce.copy_number, np.float64)
    N, G = Y.shape
    T, S, lr = 50, 1, 0.1
    dtype = jnp.float64

    key = jax.random.PRNGKey(11)
    k_init, k_fit = jax.random.split(key)
    params0 = mm.init_params(Y, L, k_init, K=1, dtype=dtype)
    data = mm.prepare_data(Y, L, dtype=dtype)
    config = mm.ModelConfig(K=1, P=0, mc_samples=S)

    # production jitted loop; rel_tol=0 disables early stop so both sides run
    # exactly T iterations
    res = run_inference(
        params0, data, k_fit, config, max_iter=T, rel_tol=0.0, learning_rate=lr
    )
    trace_jax = np.asarray(res.elbo_trace)
    assert int(res.n_iters) == T

    # replay the loop's key schedule (infer.py: split(key,3) for warm/init,
    # then split(key,3) per iteration) to extract the MC noise sequence
    def eps_of(k):
        return np.asarray(jax.random.normal(k, (S, G), dtype))

    kk, k_warm, k_init_eval = jax.random.split(k_fit, 3)
    eps_warm, eps_init = eps_of(k_warm), eps_of(k_init_eval)
    eps_train, eps_eval = [], []
    for _ in range(T):
        kk, k_train, k_eval = jax.random.split(kk, 3)
        eps_train.append(eps_of(k_train))
        eps_eval.append(eps_of(k_eval))

    graph, ops = build_reference_graph(Y, L, params0, lr, S)
    with tf1.Session(graph=graph) as sess:
        sess.run(ops["init"])
        gi = sess.run(ops["gamma_init"], {ops["eps"]: eps_warm})
        sess.run(ops["init_gamma"], {ops["gamma_init_ph"]: gi})
        trace_tf = [sess.run(ops["elbo"], {ops["eps"]: eps_init})]
        for i in range(T):
            sess.run(ops["train"], {ops["eps"]: eps_train[i]})
            trace_tf.append(sess.run(ops["elbo"], {ops["eps"]: eps_eval[i]}))
        gamma_tf = sess.run(ops["gamma"])
        mu_tf = sess.run(ops["mu"])
    trace_tf = np.asarray(trace_tf)

    # per-iteration ELBO trajectory: float64 both sides. The two autodiff
    # systems differ by ~1 ulp per gradient evaluation and Adam's sqrt(v)
    # normalization amplifies that over iterations (measured max rel diff
    # ~2e-7 at iteration 50) — still ~500x below BASELINE.md's 1e-4 bar, and
    # any genuine term drift (wrong prior, wrong bias correction, wrong warm
    # start) shows up at 1e-3+ within a few iterations.
    np.testing.assert_allclose(trace_jax[: T + 1], trace_tf, rtol=1e-6)

    gamma_jax = np.asarray(jax.nn.softmax(res.params.gamma_logits, axis=1))
    np.testing.assert_allclose(gamma_jax, gamma_tf, atol=1e-5)
    names = ["A", "B", "C"]
    assert list(clone_assignment(gamma_jax, names, 0.95)) == list(
        clone_assignment(gamma_tf, names, 0.95)
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.softplus(res.params.qmu_loc)), mu_tf, rtol=1e-5
    )
