"""Worker for the multi-process distributed tests (test_distributed.py).

Each of the two processes owns 4 virtual CPU devices (8 global), holds only
its own rows of the count matrix, and exercises the multi-controller driver
surface (clonealign_tpu.parallel.distributed). Invoked as:

    python _dist_worker.py <process_id> <num_processes> <port> <out_file> [mode]

Modes:
    elbo   (default) — assemble the global sharded array via
           host_local_to_global (jax.make_array_from_process_local_data
           branch) and compute ONE sharded ELBO collectively.
    fit    — run a COMPLETE multi-restart fit through distributed_fit on the
           default all-cells mesh: PCA init, TF1-Adam training loop,
           convergence, final 20-sample ELBO — the full driver, collectively.
           Writes final ELBOs, iteration counts, and the (replicated) global
           clone assignments.
    fit2d  — same, on a 2-D (cells=4, genes=2) process-spanning mesh: the
           genes axis is intra-process, the process boundary is a cells-axis
           boundary (the layout distributed_fit documents).
"""

import sys

proc_id, nproc, port, out_file = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)
mode = sys.argv[5] if len(sys.argv) > 5 else "elbo"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.parallel import distributed as dist
from clonealign_tpu.parallel.sharding import make_mesh, shard_data
from clonealign_tpu.synth import simulate_multinomial


def run_elbo():
    N, G, C = 32, 16, 3
    sim = simulate_multinomial(N=N, G=G, C=C, seed=0, mean_total=200)
    rows = dist.process_cell_slice(N)

    mesh = make_mesh()  # all 8 global devices on the cells axis
    Y_global = dist.host_local_to_global(np.asarray(sim.Y, np.float64)[rows], mesh)
    assert not Y_global.is_fully_addressable  # really multi-process

    data = shard_data(
        mm.prepare_data(Y_global, jnp.asarray(sim.L, jnp.float64), dtype=jnp.float64),
        mesh,
    )
    params = mm.init_params(
        data.Y, data.L, jax.random.PRNGKey(0), K=1, dtype=jnp.float64
    )
    config = mm.ModelConfig(K=1, P=0, mc_samples=1)
    elbo = jax.jit(mm.elbo, static_argnames=("config",))(
        params, data, jax.random.PRNGKey(1), config
    )
    with open(out_file, "w") as f:
        f.write(f"{jax.process_count()} {float(elbo):.12e}\n")


def run_fit(two_d: bool):
    N, G, C = 48, 24, 3
    sim = simulate_multinomial(N=N, G=G, C=C, seed=3, mean_total=400)
    rows = dist.process_cell_slice(N)

    if two_d:
        mesh = make_mesh(cell_parallelism=4, gene_parallelism=2)
    else:
        mesh = make_mesh()

    res = dist.distributed_fit(
        np.asarray(sim.Y)[rows],
        sim.L,
        mesh,
        n_restarts=2,
        dtype=jnp.float64,
        key=jax.random.PRNGKey(7),
        max_iter=10,
        rel_tol=1e-12,
    )
    gamma = res.params.gamma_logits  # (R, N, C), sharded over cells
    assert not gamma.is_fully_addressable  # the fit really ran multi-process
    # replicate for a global host view (collective identity reshard)
    rep = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P(None, None, None))
    )(gamma)
    assign = np.argmax(np.asarray(rep), axis=-1)  # (R, N)
    elbos = np.asarray(res.final_elbo)
    iters = np.asarray(res.n_iters)
    with open(out_file, "w") as f:
        f.write(f"{jax.process_count()}\n")
        f.write(" ".join(f"{e:.12e}" for e in elbos) + "\n")
        f.write(" ".join(str(int(i)) for i in iters) + "\n")
        f.write(" ".join("".join(map(str, row)) for row in assign) + "\n")


if mode == "elbo":
    run_elbo()
elif mode == "fit":
    run_fit(two_d=False)
elif mode == "fit2d":
    run_fit(two_d=True)
else:  # pragma: no cover
    raise SystemExit(f"unknown mode {mode!r}")
