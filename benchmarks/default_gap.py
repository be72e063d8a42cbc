"""Attribute the out-of-box vs tuned-sweep gap, one knob at a time.

out_of_box.py measured the plain ``run_clonealign`` defaults at 27.5 s of
fit time where the tuned bench sweep runs 0.57 s — far more than the step
count (1800 vs 1000) and the extra fresh-eval forward pass can explain.
This probe times the SWEEP PROGRAM ONLY (data prepared and resident, setup
excluded, compile excluded) for the cross of knobs between the two
configurations, so the gap decomposes into measured factors:

    loop_impl:  scan+unroll=4  vs  while (+unroll=1)
    elbo_eval:  reuse          vs  fresh
    max_iter:   100            vs  200
    lanes:      10             vs  9 (3 shrinks x 3 repeats default)

All variants: z_cheb likelihood, int8 storage, remat off, shared init —
the resolved out-of-box model configuration. Appends JSON to
benchmarks/results_tpu_r5.jsonl with --commit.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from clonealign_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import make_synthetic
    from clonealign_tpu.models import multinomial as mm
    from clonealign_tpu.restarts import _sweep_program

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    N, G, C = (512, 128, 4) if smoke else (100_000, 5_000, 10)

    key = jax.random.PRNGKey(0)
    k_data, k_fit = jax.random.split(key)
    Y, L, _z = make_synthetic(k_data, N, G, C, jnp.float32)
    data = mm.prepare_data(Y, L, dtype=jnp.float32, y_storage=jnp.int8)
    jax.block_until_ready(data.Y)
    config = mm.ModelConfig(K=1, P=0, mc_samples=1, likelihood_impl="z_cheb")

    variants = [
        # (label, loop, unroll, eval, max_iter, lanes)
        ("tuned (scan u4 reuse 100it 10L)", "scan", 4, "reuse", 100, 10),
        ("+200 iters", "scan", 4, "reuse", 200, 10),
        ("+fresh eval", "scan", 4, "fresh", 200, 10),
        ("+9 lanes", "scan", 4, "fresh", 200, 9),
        ("while u1 (out-of-box)", "while", 1, "fresh", 200, 9),
        ("while u1 reuse", "while", 1, "reuse", 200, 9),
        ("scan u1 fresh", "scan", 1, "fresh", 200, 9),
    ]
    if smoke:
        variants = [(lbl, lp, u, ev, 20, ln) for lbl, lp, u, ev, _m, ln in variants[:3]]

    rows = []
    for label, loop, unroll, ev, max_iter, lanes in variants:
        def run(seed):
            keys = jax.random.split(jax.random.fold_in(k_fit, seed), lanes)
            shrinks = jnp.full((lanes,), 5.0, jnp.float32)
            out = _sweep_program(
                keys, shrinks, data, None, None,
                config=config, data_init_mu=True, jdtype_name="float32",
                max_iter=max_iter, rel_tol=1e-6, learning_rate=0.1,
                elbo_eval=ev, restart_batching="vmap",
                loop_impl=loop, unroll=unroll, remat=False,
            )
            return jax.block_until_ready(out)

        run(0)  # compile
        best = float("inf")
        for rep in (1, 2):
            t0 = time.perf_counter()
            out = run(rep)
            best = min(best, time.perf_counter() - t0)
        n_iters = [int(i) for i in out.n_iters]
        steps = sum(n_iters)
        rows.append({
            "variant": label, "loop": loop, "unroll": unroll, "eval": ev,
            "max_iter": max_iter, "lanes": lanes, "elapsed_s": round(best, 3),
            "lane_steps": steps,
            "ms_per_lane_step": round(1e3 * best / max(steps, 1), 4),
        })
        print(json.dumps(rows[-1]))

    out = {"probe": "default_gap_attribution", "hw": "v5e single chip",
           "config": {"N": N, "G": G, "C": C, "impl": "z_cheb", "y": "int8"},
           "rows": rows}
    print(json.dumps(out))
    if "--commit" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_tpu_r5.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
