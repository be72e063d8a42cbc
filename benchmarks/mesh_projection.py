"""8-chip projection evidence (VERDICT r4 next-round item 8).

bench.py claims "mesh-sharded when >1 device"; this probe makes that claim
falsifiable before an 8-chip slice exists. It AOT-lowers ONE vmapped
training step (10 restart lanes) of the headline shape (100k x 5k x 10,
int8 Y, z_cheb backend) over a virtual 8-device mesh, then reads out of the
compiled program:

* the per-device argument/temp footprint (XLA memory analysis where the
  backend reports it, analytic per-device argument bytes otherwise), and
* every cross-device collective in the step's HLO with its payload bytes —
  the ICI traffic a real v5e-8 would move per step.

From those plus the measured single-chip step time (the newest committed
BENCH_r*.json) it derives the expected v5e-8 sweep time, with the
assumptions printed alongside so the first real 8-chip run can check them
(docs/scaling.md "The v5e-8 projection").

Abstract lowering only — jax.ShapeDtypeStruct in, no 2 GB arrays are ever
materialized; safe on any host. Appends to results_tpu_r5.jsonl with
--commit (runs on CPU; the committed row is compiler output, not a timing).
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# public v5e ICI spec: 4 links x 400 Gbps/direction = 1600 Gbps = 200 GB/s
# aggregate per chip; assume half as sustained effective bandwidth
ICI_EFFECTIVE_GBPS = 100.0
# per-collective launch/sync overhead on ICI (conservative)
COLLECTIVE_LATENCY_US = 5.0


def _collectives(hlo_text):
    """Every collective op in the HLO with its payload bytes."""
    sizes = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4,
             "s8": 1, "u8": 1, "s16": 2, "u16": 2, "pred": 1}
    pat = re.compile(
        r"=\s+(?:\([^)]*\)|(\w+)\[([\d,]*)\][^ ]*)\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\b"
    )
    tuple_pat = re.compile(r"(\w+)\[([\d,]*)\]")
    out = []
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if not m:
            continue
        op = m.group(3)
        if m.group(1) is not None:
            shapes = [(m.group(1), m.group(2))]
        else:  # tuple-shaped collective: sum the members
            shapes = tuple_pat.findall(line.split("=")[1].split(op)[0])
        nbytes = 0
        for dt, dims in shapes:
            if dt not in sizes:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * sizes[dt]
        out.append({"op": op, "bytes": nbytes})
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")

    from clonealign_tpu.infer import tf1_adam
    from clonealign_tpu.models import multinomial as mm
    from clonealign_tpu.parallel.sharding import (
        CELL_AXIS, GENE_AXIS, data_shardings, make_mesh, param_specs,
    )

    N, G, C, R, K = 100_000, 5_000, 10, 10, 1
    max_iter = 100
    config = mm.ModelConfig(K=K, P=0, mc_samples=1, likelihood_impl="z_cheb")
    opt = tf1_adam(0.1)

    rows = {}
    for shape_name, kw in (
        ("cells8", dict()),                         # all 8 on the cell axis
        ("cells4_genes2", dict(gene_parallelism=2)),
    ):
        mesh = make_mesh(**kw)

        def sds(shape, dtype, spec):
            return jax.ShapeDtypeStruct(
                shape, dtype, sharding=NamedSharding(mesh, spec)
            )

        data = mm.ModelData(
            Y=sds((N, G), jnp.int8, P(CELL_AXIS, GENE_AXIS)),
            L=sds((G, C), jnp.float32, P(GENE_AXIS, None)),
            X=None,
            s=sds((N,), jnp.float32, P(CELL_AXIS)),
            log_binom=sds((N,), jnp.float32, P(CELL_AXIS)),
            YlogL=sds((N, C), jnp.float32, P(CELL_AXIS, None)),
            colsum_Y=sds((G,), jnp.float32, P(GENE_AXIS)),
        )
        specs = param_specs(batched=True)
        shapes = mm.CloneAlignParams(
            W=(R, G, K), chi_unconstr=(R, K), psi=(R, N, K), beta=(R, G, 0),
            alpha_unconstr=(R, C), qmu_loc=(R, G), qmu_log_scale=(R, G),
            gamma_logits=(R, N, C),
        )
        params = jax.tree.map(
            lambda sh, sp: sds(sh, jnp.float32, sp), shapes, specs,
            is_leaf=lambda x: isinstance(x, (tuple, P)) and not isinstance(x, mm.CloneAlignParams),
        )
        opt_state = optax.ScaleByAdamState(
            count=jax.ShapeDtypeStruct((), jnp.int32),
            mu=params, nu=params,
        )
        keys = jax.ShapeDtypeStruct((R, 2), jnp.uint32)

        def one_step(params, opt_state, keys, data):
            def one(p, k):
                loss = lambda pp, kk: -mm.elbo(pp, data, kk, config)
                neg, grads = jax.value_and_grad(loss)(p, k)
                return grads, -neg

            grads, elbos = jax.vmap(one)(params, keys)
            updates, new_opt = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), new_opt, elbos

        lowered = jax.jit(one_step).lower(params, opt_state, keys, data)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        colls = _collectives(hlo)
        per_step_bytes = sum(c["bytes"] for c in colls)
        by_op = {}
        for c in colls:
            by_op.setdefault(c["op"], {"count": 0, "bytes": 0})
            by_op[c["op"]]["count"] += 1
            by_op[c["op"]]["bytes"] += c["bytes"]

        try:
            ma = compiled.memory_analysis()
            mem = {
                "argument_MB": round(ma.argument_size_in_bytes / 1e6, 1),
                "output_MB": round(ma.output_size_in_bytes / 1e6, 1),
                "temp_MB": round(ma.temp_size_in_bytes / 1e6, 1),
            }
        except Exception as e:  # backend may not report it
            mem = {"unavailable": str(e)[:80]}
        # analytic per-device resident bytes (the sharded arguments)
        n_dev = mesh.devices.size
        y_dev = N * G / n_dev
        lane_state = R * (N * (K + C) * 3)  # params + 2 Adam moments, f32
        mem["analytic_per_device_MB"] = round(
            (y_dev + lane_state * 4 / n_dev + 3 * G * 4) / 1e6, 1
        )

        rows[shape_name] = {
            "mesh": dict(mesh.shape),
            "collectives_per_step": by_op,
            "ici_bytes_per_step": per_step_bytes,
            "memory": mem,
        }

    # projection from the newest committed single-chip bench artifact
    import glob

    bench_files = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_r*.json")))
    proj = {}
    if bench_files:
        b = json.load(open(bench_files[-1]))
        p = b.get("parsed", {})
        if "elapsed_s" in p:
            t1 = float(p["elapsed_s"])  # whole sweep, single chip
            n_coll = sum(v["count"] for v in rows["cells8"]["collectives_per_step"].values())
            ici_s_per_step = (
                rows["cells8"]["ici_bytes_per_step"] / (ICI_EFFECTIVE_GBPS * 1e9)
                + n_coll * COLLECTIVE_LATENCY_US * 1e-6
            )
            proj = {
                "from": os.path.basename(bench_files[-1]),
                "single_chip_sweep_s": t1,
                "assumed_ici_GBps": ICI_EFFECTIVE_GBPS,
                "assumed_collective_latency_us": COLLECTIVE_LATENCY_US,
                "ici_s_per_step": round(ici_s_per_step, 8),
                "projected_v5e8_sweep_s": round(t1 / 8 + max_iter * ici_s_per_step, 4),
                "projected_speedup": round(t1 / (t1 / 8 + max_iter * ici_s_per_step), 2),
            }

    out = {"probe": "mesh_projection", "hw": "virtual 8-device CPU mesh (AOT lowering)",
           "config": {"N": N, "G": G, "C": C, "restarts": R, "max_iter": max_iter,
                      "impl": "z_cheb", "y_storage": "int8"},
           "rows": rows, "projection": proj}
    print(json.dumps(out, indent=2))
    if "--commit" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_tpu_r5.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
