"""Multi-host helpers on a single host (degenerate path) — the multi-process
branch uses jax.make_array_from_process_local_data with identical semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.parallel import distributed as dist
from clonealign_tpu.parallel.sharding import make_mesh
from clonealign_tpu.synth import simulate_multinomial

import os
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


@pytest.mark.multiprocess
def test_two_process_sharded_elbo(tmp_path):
    """REAL multi-process execution: two local processes, a localhost
    coordinator, 4 virtual CPU devices each (8 global). Exercises
    jax.distributed.initialize's multi-process branch and
    host_local_to_global's make_array_from_process_local_data path, with one
    collectively-computed sharded ELBO compared against the single-process
    value."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_dist_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split() if "host_platform" not in f]
        + ["--xla_force_host_platform_device_count=4"]
    )
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )

    outs = [tmp_path / f"out{i}.txt" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-3000:]

    results = [o.read_text().split() for o in outs]
    assert results[0][0] == results[1][0] == "2"  # process_count seen inside
    elbo_mp = float(results[0][1])
    assert float(results[1][1]) == elbo_mp  # identical across processes

    # single-process reference on the same data/keys
    sim = simulate_multinomial(N=32, G=16, C=3, seed=0, mean_total=200)
    data = mm.prepare_data(sim.Y, sim.L, dtype=jnp.float64)
    params = mm.init_params(
        data.Y, data.L, jax.random.PRNGKey(0), K=1, dtype=jnp.float64
    )
    ref = float(
        jax.jit(mm.elbo, static_argnames=("config",))(
            params, data, jax.random.PRNGKey(1), mm.ModelConfig(K=1, P=0, mc_samples=1)
        )
    )
    np.testing.assert_allclose(elbo_mp, ref, rtol=1e-10)
