"""tf1_adam against a NumPy transcription of TF1's AdamOptimizer update
(reference R/inference-tflow.R:345 uses tf$train$AdamOptimizer defaults),
and MC-sample variance sanity."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from clonealign_tpu.infer import tf1_adam


def numpy_tf1_adam_trajectory(grads, lr=0.1, b1=0.9, b2=0.999, eps=1e-8):
    """TF1 formula: lr_t = lr*sqrt(1-b2^t)/(1-b1^t); p -= lr_t*m/(sqrt(v)+eps)."""
    p = 0.0
    m = v = 0.0
    traj = []
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        p -= lr_t * m / (np.sqrt(v) + eps)
        traj.append(p)
    return np.asarray(traj)


def test_tf1_adam_matches_formula():
    rng = np.random.default_rng(0)
    grads = rng.normal(0, 1, 20)

    opt = tf1_adam(0.1)
    p = jnp.zeros(())
    state = opt.init(p)
    traj = []
    for g in grads:
        updates, state = opt.update(jnp.asarray(g, jnp.float32), state)
        p = optax.apply_updates(p, updates)
        traj.append(float(p))
    expected = numpy_tf1_adam_trajectory(grads)
    np.testing.assert_allclose(traj, expected, rtol=1e-4)  # f32 state


def test_tf1_adam_differs_from_optax_adam_early():
    """The epsilon placement differs from optax.adam in early steps with tiny
    gradients — the reason a custom transformation exists at all."""
    g = jnp.asarray(1e-7, jnp.float32)

    def first_step(opt):
        p = jnp.zeros(())
        state = opt.init(p)
        updates, _ = opt.update(g, state)
        return float(optax.apply_updates(p, updates))

    ours = first_step(tf1_adam(0.1))
    theirs = first_step(optax.adam(0.1))
    assert not np.isclose(ours, theirs, rtol=1e-3)


@pytest.mark.slow
def test_mc_samples_reduce_final_elbo_sd():
    from clonealign_tpu import clonealign
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(N=60, G=40, C=2, seed=0, mean_total=400)
    sds = {}
    for S in (1, 10):
        fit = clonealign(sim.Y, sim.L, max_iter=15, mc_samples=S, seed=0, verbose=False)
        sds[S] = fit.convergence_info.sd_final_elbo
    # more MC samples -> lower-variance ELBO estimate (allow generous margin)
    assert sds[10] < sds[1]


@pytest.mark.slow
def test_tf1_adam_matches_real_tensorflow():
    """Against the actual tf.compat.v1.train.AdamOptimizer (the very class
    the reference uses, R/inference-tflow.R:345), when TF is available."""
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    # build an explicit graph instead of disabling eager execution globally
    # (which would leak graph mode into other TF-using tests)

    rng = np.random.default_rng(0)
    grads = rng.normal(0, 1, 25).astype(np.float32)

    graph = tf1.Graph()
    with graph.as_default():
        g_ph = tf1.placeholder(tf.float32, shape=())
        var = tf1.Variable(0.0, dtype=tf.float32)
        train = tf1.train.AdamOptimizer(learning_rate=0.1).apply_gradients([(g_ph, var)])
        init = tf1.global_variables_initializer()
    traj_tf = []
    with tf1.Session(graph=graph) as sess:
        sess.run(init)
        for g in grads:
            sess.run(train, feed_dict={g_ph: g})
            traj_tf.append(float(sess.run(var)))

    opt = tf1_adam(0.1)
    p = jnp.zeros((), jnp.float32)
    state = opt.init(p)
    traj = []
    for g in grads:
        updates, state = opt.update(jnp.asarray(g), state)
        p = optax.apply_updates(p, updates)
        traj.append(float(p))

    np.testing.assert_allclose(traj, traj_tf, atol=5e-6)
