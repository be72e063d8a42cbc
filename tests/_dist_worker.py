"""Worker for the multi-process distributed test (test_distributed.py).

Each of the two processes owns 4 virtual CPU devices (8 global), holds only
its own rows of the count matrix, assembles the global sharded array via
clonealign_tpu.parallel.distributed.host_local_to_global — exercising the
jax.make_array_from_process_local_data branch — and computes one sharded
ELBO collectively. Invoked as:

    python _dist_worker.py <process_id> <num_processes> <port> <out_file>
"""

import sys

proc_id, nproc, port, out_file = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)

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

from clonealign_tpu.models import multinomial as mm
from clonealign_tpu.parallel import distributed as dist
from clonealign_tpu.parallel.sharding import make_mesh, shard_data
from clonealign_tpu.synth import simulate_multinomial

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
params = mm.init_params(data.Y, data.L, jax.random.PRNGKey(0), K=1, dtype=jnp.float64)
config = mm.ModelConfig(K=1, P=0, mc_samples=1)
elbo = jax.jit(mm.elbo, static_argnames=("config",))(
    params, data, jax.random.PRNGKey(1), config
)

with open(out_file, "w") as f:
    f.write(f"{jax.process_count()} {float(elbo):.12e}\n")
