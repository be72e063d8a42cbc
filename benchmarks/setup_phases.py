"""Attribute setup_fit's wall clock at the headline shape.

oob_phases.py measured "setup_fit (validate+filter+upload)" at ~29.5 s of
the out-of-box 100k x 5k call — dwarfing the 1.36 s compiled sweep. This
probe times each sub-step separately, plus raw device_put rates for the
candidate fix (uploading Y in the storage dtype instead of float32):

  parse          — _parse_expression (host array normalization)
  colsum_f64     — the gene-filter statistic (one host pass)
  validate       — NaN/negativity/zero-cell checks (host passes)
  auto_storage   — integrality/max scan behind y_storage="auto"
  prepare_data   — chunked upload + on-device stats + int8 downcast
  put_int8/f32   — bare device_put of the same bytes (the link floor)

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

    from bench import make_synthetic
    from clonealign_tpu import api
    from clonealign_tpu.models import multinomial as mm

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    N, G, C = (512, 128, 4) if smoke else (100_000, 5_000, 10)

    key = jax.random.PRNGKey(0)
    k_data, _ = jax.random.split(key)
    Yd, Ld, _z = make_synthetic(k_data, N, G, C, jnp.float32, out_dtype=jnp.int16)
    Y = np.asarray(jax.device_get(Yd))
    L = np.asarray(jax.device_get(Ld), np.float64)
    del Yd, Ld

    rows = {}

    def lap(label, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        if hasattr(out, "block_until_ready"):
            out.block_until_ready()
        elif isinstance(out, mm.ModelData):
            jax.block_until_ready(out.Y)
        rows[label] = round(time.perf_counter() - t0, 3)
        return out

    Yp, _, _ = lap("parse_s", api._parse_expression, Y)
    lap("colsum_f64_s", api._colsum_f64, Yp, False)
    lap("validate_s", api._validate_counts, Yp, False)
    lap("auto_storage_s", api._auto_y_storage, Yp)

    # warm the jitted stats program on a tiny slice so prepare_data timing
    # is compile-free like a warm out-of-box call
    mm.prepare_data(Y[:256], L, dtype=jnp.float32, y_storage=jnp.int8)
    data = lap("prepare_data_s", mm.prepare_data, Y,  L,
               dtype=jnp.float32, y_storage=jnp.int8)
    del data

    # the link floor: a bare upload of the same logical bytes, measured in
    # the SAME run so each committed row carries its own link context —
    # the axon tunnel's bandwidth swings >5x between runs (measured 2.9 s
    # to 20 s for the identical 0.5 GB int8 put), so cross-run wall-clock
    # comparisons of transfer-bound phases are meaningless without it.
    # The f32 put alone costs ~200 s through the tunnel; opt in via
    # SETUP_PUT_F32=1.
    if os.environ.get("SETUP_SKIP_PUT") != "1":
        puts = [(Y.astype(np.int8), "put_int8_s")]
        if os.environ.get("SETUP_PUT_F32") == "1":
            puts.append((Y.astype(np.float32), "put_f32_s"))
        for arr, label in puts:
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            d.block_until_ready()
            rows[label] = round(time.perf_counter() - t0, 3)
            del d
    rows["Y_GB"] = {"int8": round(N * G / 1e9, 2), "f32": round(4 * N * G / 1e9, 2)}

    out = {"probe": "setup_phases", "hw": "v5e single chip (axon tunnel)",
           "variant": os.environ.get("SETUP_VARIANT", ""),
           "config": {"N": N, "G": G, "C": C, "host_dtype": "int16"},
           "rows": rows}
    print(json.dumps(out))
    if "--commit" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_tpu_r5.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
