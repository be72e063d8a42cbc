"""Multi-host helpers on a single host (degenerate path) — the multi-process
branch uses jax.make_array_from_process_local_data with identical semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.parallel import distributed as dist
from clonealign_tpu.parallel.sharding import make_mesh
from clonealign_tpu.synth import simulate_multinomial

import pytest

pytestmark = pytest.mark.slow


def test_initialize_single_host_noop():
    assert dist.initialize() is False
    assert jax.process_count() == 1


def test_process_cell_slice_single():
    assert dist.process_cell_slice(100) == slice(0, 100)


def test_host_local_to_global_shards_cells():
    sim = simulate_multinomial(N=64, G=32, C=2, seed=0, mean_total=300)
    mesh = make_mesh()  # 8 virtual devices on the cell axis
    sl = dist.process_cell_slice(sim.Y.shape[0])
    global_Y = dist.host_local_to_global(sim.Y[sl], mesh)
    assert global_Y.shape == sim.Y.shape
    assert len(global_Y.addressable_shards) == 8
    assert global_Y.addressable_shards[0].data.shape == (8, 32)
    np.testing.assert_array_equal(np.asarray(global_Y), sim.Y)

    # a fit over the assembled global array works
    data = mm.prepare_data(global_Y, sim.L, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    params = mm.init_params(sim.Y, sim.L, key, K=1, dtype=jnp.float64)
    val = jax.jit(mm.elbo, static_argnames="config")(
        params, data, key, mm.ModelConfig(K=1)
    )
    assert np.isfinite(float(val))
