"""Attribute the out-of-box run_clonealign wall clock phase by phase.

out_of_box.py measured total 45.8 s / setup 18.3 s / fit 27.5 s at the
headline 100k x 5k x 10 — but default_gap.py shows the compiled sweep in
the same configuration is only ~1.36 s. This probe times each phase of a
plain ``run_clonealign`` call (compile-warm) so the missing ~26 s has a
name: setup sub-steps (validate / filter / y-storage scan / device upload),
the sweep program, result fetch, fit packaging (host-side correlation QC
over N x G), and the multirun-info loop.

Appends to benchmarks/results_tpu_r5.jsonl with --commit.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class T:
    def __init__(self):
        self.rows = []
        self.t0 = time.perf_counter()

    def lap(self, label):
        t = time.perf_counter()
        self.rows.append((label, round(t - self.t0, 3)))
        self.t0 = t


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clonealign_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import make_synthetic
    from clonealign_tpu import run_clonealign
    from clonealign_tpu.api import _mu_init_array, _package_fit, setup_fit
    from clonealign_tpu.restarts import _sweep_program

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    N, G, C = (512, 128, 4) if smoke else (100_000, 5_000, 10)

    key = jax.random.PRNGKey(0)
    k_data, _ = jax.random.split(key)
    Yd, Ld, _z = make_synthetic(k_data, N, G, C, jnp.float32, out_dtype=jnp.int16)
    Y = np.asarray(jax.device_get(Yd))
    L = np.asarray(jax.device_get(Ld), np.float64)
    del Yd, Ld

    # warm every compile path with a full call
    run_clonealign(Y, L, seed=0, verbose=False, print_elbos=False,
                   multirun_correlations=False)
    size0 = _sweep_program._cache_size()  # type: ignore[attr-defined]

    # Self-normalize the transfer-bound phases: the axon tunnel's bandwidth
    # swings >5x between runs (setup_phases probe: 2.9-20 s for the SAME
    # 0.5 GB int8 put), so each committed row carries its own link floor
    # measured in the same run — a bare device_put of the wire bytes
    # setup_fit ships (int8 N x G) and of the gamma fetch the multirun
    # phase pulls back (lanes x N x C f32).
    floors = {}
    y8 = Y.astype(np.int8)
    t0 = time.perf_counter()
    d = jax.device_put(y8)
    d.block_until_ready()
    floors["put_int8_s"] = round(time.perf_counter() - t0, 3)
    del d, y8

    t = T()
    ctx = setup_fit(Y, L, verbose=False)
    jax.block_until_ready(ctx.data.Y)
    t.lap("setup_fit (validate+filter+upload)")

    shrinks = np.asarray([s for s in (0, 5, 10) for _ in range(3)], np.float64)
    keys = jax.random.split(jax.random.PRNGKey(1), len(shrinks))
    results = _sweep_program(
        keys, jnp.asarray(shrinks, ctx.jdtype), ctx.data, ctx.extra_log_lik,
        _mu_init_array(ctx.data_init_mu, ctx.jdtype),
        config=ctx.config, data_init_mu=ctx.data_init_mu,
        jdtype_name=str(jnp.dtype(ctx.jdtype)), max_iter=200, rel_tol=1e-6,
        learning_rate=0.1, elbo_eval="fresh", restart_batching="vmap",
        loop_impl="while", unroll=1, remat="auto",
    )
    jax.block_until_ready(results)
    t.lap("sweep program (9 lanes, blocked)")

    final_elbos = np.asarray(results.final_elbo)
    best = int(np.nanargmax(final_elbos))
    best_result = jax.tree.map(lambda a: a[best], results)
    jax.block_until_ready(best_result)
    t.lap("best-lane gather")

    fit = _package_fit(best_result, ctx.Y, ctx.L, ctx.clone_names,
                       ctx.retained_genes, ctx.config, 0.95, None,
                       device_Y=ctx.data.Y,  # what run_clonealign passes
                       device_s=ctx.data.s)
    t.lap("_package_fit (fetch + device QC correlations)")

    import clonealign_tpu.assign as _assign

    all_gamma = np.asarray(jax.nn.softmax(results.params.gamma_logits, axis=-1))
    for r in range(len(shrinks)):
        _assign.clone_assignment(all_gamma[r], ctx.clone_names, 0.95)
    t.lap("multirun prevalences (9 lanes)")

    dev_gamma = jax.device_put(all_gamma)  # same bytes the phase fetched
    dev_gamma.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(dev_gamma)
    floors["fetch_gamma_s"] = round(time.perf_counter() - t0, 3)
    floors["gamma_MB"] = round(all_gamma.nbytes / 1e6, 1)

    sweep_misses = _sweep_program._cache_size() - size0  # type: ignore[attr-defined]
    out = {
        "probe": "out_of_box_phase_attribution", "hw": "v5e single chip",
        "config": {"N": N, "G": G, "C": C, "restarts": 9, "max_iter": 200},
        "phases_s": dict(t.rows),
        "link_floors": floors,
        "sweep_recompiles_after_warm": int(sweep_misses),
        "n_iters": [int(i) for i in results.n_iters],
        "best_elbo": float(fit.convergence_info.final_elbo),
    }
    print(json.dumps(out))
    if "--commit" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_tpu_r5.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
