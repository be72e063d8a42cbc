"""The three fit entry points — clonealign, run_clonealign, sharded_fit —
must produce identical results for identical keys under their DEFAULT
optimization settings (VERDICT r1: sharded_fit had drifted to rel_tol=1e-5 /
max_iter=100 while the others used the reference defaults 1e-6 / 200,
reference R/clonealign.R:186-189)."""

import jax
import jax.numpy as jnp
import numpy as np

from clonealign_tpu import clonealign, run_clonealign
from clonealign_tpu.io.datasets import load_example_sce
from clonealign_tpu.parallel.sharding import make_mesh, sharded_fit

import pytest

pytestmark = pytest.mark.slow


def test_three_entry_points_identical_with_same_key():
    sce = load_example_sce()
    Y, L = sce.counts, sce.copy_number
    key = jax.random.PRNGKey(7)

    # clonealign consumes one key directly; the sweep drivers split the key
    # into per-restart keys first — so hand clonealign the single split key.
    fit_single = clonealign(
        Y, L, key=jax.random.split(key, 1)[0], dtype="float64", verbose=False
    )
    fit_sweep = run_clonealign(
        Y,
        L,
        initial_shrinks=[5],
        n_repeats=1,
        key=key,
        dtype="float64",
        verbose=False,
        print_elbos=False,
    )
    res_sharded = sharded_fit(
        np.asarray(Y, np.float64),
        np.asarray(L, np.float64),
        make_mesh(),
        n_restarts=1,
        key=key,
        dtype=jnp.float64,
    )

    e1 = fit_single.convergence_info.final_elbo
    e2 = fit_sweep.convergence_info.final_elbo
    e3 = float(np.asarray(res_sharded.final_elbo)[0])
    # vmapped (sweep) vs unbatched (single) programs may differ in reduction
    # order by a final ulp; everything else must agree exactly.
    np.testing.assert_allclose(e2, e1, rtol=1e-12)
    np.testing.assert_allclose(e3, e1, rtol=1e-12)
    assert fit_single.convergence_info.n_iters == fit_sweep.convergence_info.n_iters
    assert fit_single.convergence_info.n_iters == int(res_sharded.n_iters[0])
    assert list(fit_single.clone) == list(fit_sweep.clone)

    gamma_sharded = np.asarray(
        jax.nn.softmax(res_sharded.params.gamma_logits[0], axis=-1)
    )
    np.testing.assert_allclose(
        gamma_sharded, fit_single.ml_params["clone_probs"], rtol=1e-10, atol=1e-12
    )
