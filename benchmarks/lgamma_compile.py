"""Measure the XLA:TPU compile-time pathology behind the one-time data
statistics, and the fix.

Round-4 finding: compiling ANY program containing ``lax.lgamma`` on a 2-D
(rows, G) operand takes 30-42 s on v5e through the remote compiler, while
the identical program without the lgamma compiles in ~2.5 s — the compile
cost, not the runtime, dominated ``prepare_data`` at headline scale. The
fix (models/multinomial.py ``_log_factorial_table``) evaluates lgamma once
on a 1-D ramp (fast to compile) and turns the elementwise (rows, G) lgamma
into a table gather with bit-identical values.

Four variants, each under a fresh shape so the persistent compile cache
cannot hide the cold cost (pass --rows to re-randomize; re-running the
same rows value measures the warm cache instead):

  lgamma_2d      — the stats program with elementwise lax.lgamma (old path)
  no_lgamma      — the same program with the lgamma term removed (control)
  table_gather   — the shipped fix: log-factorial table + gather
  lgamma_1d_ramp — building the 65536-entry table itself (the 1-D lgamma)

Appends to results_tpu_r5.jsonl with --commit.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clonealign_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    G, C = 5_000, 10
    base = 53_600
    for a in sys.argv[1:]:
        if a.startswith("--rows="):
            base = int(a.split("=", 1)[1])

    rng = np.random.default_rng(0)
    L = rng.integers(1, 5, (G, C)).astype(np.float64)
    Lj = jnp.asarray(L, jnp.float32)
    log_L_safe = jnp.where(Lj > 0, jnp.log(jnp.where(Lj > 0, Lj, 1.0)), 0.0)
    zero_cols = (Lj <= 0).astype(jnp.float32)

    @jax.jit
    def stats_lgamma(yc8, log_L_safe, zero_cols):
        yc = yc8.astype(log_L_safe.dtype)
        with jax.default_matmul_precision("highest"):
            s = jnp.sum(yc, axis=1)
            lb = jax.lax.lgamma(s + 1.0) - jnp.sum(jax.lax.lgamma(yc + 1.0), axis=1)
            B = yc @ log_L_safe
            B = jnp.where((yc @ zero_cols) > 0, -jnp.inf, B)
        return s, lb, B, jnp.sum(yc, axis=0)

    @jax.jit
    def stats_none(yc8, log_L_safe, zero_cols):
        yc = yc8.astype(log_L_safe.dtype)
        with jax.default_matmul_precision("highest"):
            s = jnp.sum(yc, axis=1)
            B = yc @ log_L_safe
            B = jnp.where((yc @ zero_cols) > 0, -jnp.inf, B)
        return s, B, jnp.sum(yc, axis=0)

    @jax.jit
    def stats_table(yc8, table, log_L_safe, zero_cols):
        yc = yc8.astype(log_L_safe.dtype)
        lgam = jnp.take(table, yc8.astype(jnp.int32), axis=0)
        with jax.default_matmul_precision("highest"):
            s = jnp.sum(yc, axis=1)
            lb = jax.lax.lgamma(s + 1.0) - jnp.sum(lgam, axis=1)
            B = yc @ log_L_safe
            B = jnp.where((yc @ zero_cols) > 0, -jnp.inf, B)
        return s, lb, B, jnp.sum(yc, axis=0)

    rows = {"rows_base": base}

    def timed(label, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        rows[label] = round(time.perf_counter() - t0, 2)

    # distinct row counts -> distinct programs -> cold compiles
    y_lg = jnp.asarray(rng.integers(0, 10, (base, G), dtype=np.int8))
    y_no = jnp.asarray(rng.integers(0, 10, (base - 8, G), dtype=np.int8))
    y_tb = jnp.asarray(rng.integers(0, 10, (base - 16, G), dtype=np.int8))
    jax.block_until_ready((y_lg, y_no, y_tb))

    timed("lgamma_2d_cold_s", stats_lgamma, y_lg, log_L_safe, zero_cols)
    timed("no_lgamma_cold_s", stats_none, y_no, log_L_safe, zero_cols)
    t0 = time.perf_counter()
    table = jax.lax.lgamma(jnp.arange(1, 65537, dtype=jnp.float32))
    table.block_until_ready()
    rows["lgamma_1d_ramp_s"] = round(time.perf_counter() - t0, 2)
    timed("table_gather_cold_s", stats_table, y_tb, table, log_L_safe, zero_cols)
    timed("table_gather_warm_s", stats_table, y_tb, table, log_L_safe, zero_cols)

    out = {"probe": "lgamma_compile", "hw": "v5e single chip (axon tunnel)",
           "config": {"G": G, "C": C, "dtype": "int8->f32"}, "rows": rows}
    print(json.dumps(out))
    if "--commit" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_tpu_r5.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
