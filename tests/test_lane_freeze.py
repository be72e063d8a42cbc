"""The vmapped while_loop freeze (infer.py): under vmap the loop condition is
OR-reduced across lanes, so the body must freeze converged lanes. This is the
subtlest piece of the restart machinery — assert that batching restarts
changes NOTHING versus running each fit separately, even when lanes converge
at different iteration counts."""

import jax
import jax.numpy as jnp
import numpy as np

from clonealign_tpu.infer import run_inference
from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.synth import simulate_multinomial

import pytest

pytestmark = pytest.mark.slow


def test_vmapped_lanes_identical_to_separate_runs():
    sim = simulate_multinomial(N=50, G=40, C=2, seed=0, mean_total=400)
    data = mm.prepare_data(sim.Y, sim.L, dtype=jnp.float64)
    config = mm.ModelConfig(K=1, mc_samples=1)

    # loose tolerance so lanes converge EARLY and at DIFFERENT iterations
    kwargs = dict(max_iter=120, rel_tol=0.02, learning_rate=0.1)

    def one(k):
        ki, kf = jax.random.split(k)
        p0 = mm.init_params(data.Y, data.L, ki, K=1, dtype=jnp.float64)
        return run_inference(p0, data, kf, config, **kwargs)

    keys = jax.random.split(jax.random.PRNGKey(42), 4)

    batched = jax.jit(jax.vmap(one))(keys)
    singles = [jax.jit(one)(k) for k in keys]

    iters_b = np.asarray(batched.n_iters)
    iters_s = np.asarray([int(s.n_iters) for s in singles])
    np.testing.assert_array_equal(iters_b, iters_s)
    # lanes genuinely converged at different points (else the test is vacuous)
    assert len(set(iters_s.tolist())) > 1, iters_s
    assert (iters_s < 120).all()

    for i, s in enumerate(singles):
        np.testing.assert_allclose(
            float(batched.final_elbo[i]), float(s.final_elbo), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(batched.params.qmu_loc[i]), np.asarray(s.params.qmu_loc),
            rtol=1e-12,
        )
        # traces match including the NaN padding pattern
        tb = np.asarray(batched.elbo_trace[i])
        ts = np.asarray(s.elbo_trace)
        np.testing.assert_array_equal(np.isnan(tb), np.isnan(ts))
        np.testing.assert_allclose(tb[~np.isnan(tb)], ts[~np.isnan(ts)], rtol=1e-12)
