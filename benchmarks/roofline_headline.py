"""Roofline attribution at the HEADLINE shape (VERDICT r3 weak item 9).

BENCH_r03 measured the 100k x 5k x 10-lane z_cheb/int8 training loop at
~0.58 ms per lane-step = 5.8 ms per sweep step, an effective 175 GB/s
against v5e's ~819 GB/s HBM peak. r3's step_attribution probe only covered
500k x 2k. This decomposes the headline step into named costs:

  y_read_int8 / y_read_f32   — one full pass over Y (random matvec; the
                               memory-rate floor, int8 vs f32 widening)
  A_fwd / A_fwdbwd           — the ONLY two Y passes the decomposed ELBO
                               keeps per step (forward Y @ W, backward
                               Y^T psi; models/multinomial.py elbo
                               docstring), 10 vmapped lanes, under the
                               pinned HIGHEST precision and under DEFAULT
                               for comparison (HIGHEST on f32 = multi-pass
                               bf16 decomposition - is it the gap?)
  elbo_fwd                   — full forward ELBO, 10 lanes (z_cheb)
  full_step                  — value_and_grad + TF1-Adam update, 10 lanes
                               (the production loop body, elbo_eval=reuse)
  adam_only                  — optimizer update alone (gamma_logits m/v
                               state is 10 lanes x N x C - not free)

All timings are in-loop (lax.scan inside ONE jit execution, carried state
chains the iterations so nothing is CSE'd or memoized; the axon tunnel's
per-call dispatch and memoization cannot distort them). Data always passed
as jit arguments. Appends to results_tpu_r5.jsonl with --commit.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 30


def timed(fn, *args, **kw):
    """Compile, then best-of-3 wall clock of the blocked scan program."""
    import jax

    out = jax.block_until_ready(fn(*args, **kw))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    del out
    return 1e3 * best / STEPS  # ms per step


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clonealign_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import make_synthetic
    from clonealign_tpu.infer import tf1_adam
    from clonealign_tpu.models import multinomial as mm

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    N, G, C, LANES = (512, 128, 4, 3) if smoke else (100_000, 5_000, 10, 10)

    key = jax.random.PRNGKey(0)
    k_data, k_fit = jax.random.split(key)
    Y, L, _z = make_synthetic(k_data, N, G, C, jnp.float32)
    data = mm.prepare_data(Y, L, dtype=jnp.float32, y_storage=jnp.int8)
    Yf32 = jnp.asarray(data.Y, jnp.float32)
    jax.block_until_ready((data.Y, Yf32))
    config = mm.ModelConfig(K=1, P=0, mc_samples=1, likelihood_impl="z_cheb")

    @jax.jit
    def init_lanes(dat, k):
        def one(kk):
            return mm.init_params(dat.Y, dat.L, kk, K=1, P=0,
                                  data_init_mu=True, dtype=jnp.float32)
        return jax.vmap(one)(jax.random.split(k, LANES))

    params0 = init_lanes(data, k_fit)
    jax.block_until_ready(params0)
    print("init done", file=sys.stderr)
    rows = {}

    # --- one full pass over Y: matvec with a carried vector (cannot be
    # hoisted or CSE'd: each iteration's vector depends on the last) ---
    @functools.partial(jax.jit, static_argnames=("prec",))
    def y_read(Ym, u0, prec):
        def body(u, _):
            out = jax.lax.dot_general(
                Ym.astype(jnp.float32), u, (((1,), (0,)), ((), ())),
                precision=prec,
            )  # (N,)
            return jnp.tanh(u + out[: u.shape[0]]), None

        return jax.lax.scan(body, u0, None, length=STEPS)[0]

    u0 = jnp.ones((G,), jnp.float32) / G
    rows["y_read_int8_default_ms"] = timed(y_read, data.Y, u0, prec="default")
    print("y_read int8 default done", file=sys.stderr)
    rows["y_read_f32_default_ms"] = timed(y_read, Yf32, u0, prec="default")
    rows["y_read_int8_highest_ms"] = timed(y_read, data.Y, u0, prec="highest")
    rows["y_read_f32_highest_ms"] = timed(y_read, Yf32, u0, prec="highest")
    gb = N * G / 1e9
    rows["Y_GB"] = {"int8": round(gb, 2), "f32": round(4 * gb, 2)}

    # --- the A1 group exactly as the ELBO computes it: 10 lanes,
    # sum(psi * (Y @ W)); fwd and fwd+bwd (adds the Y^T psi pass) ---
    def a1_loss(psi_w, Ym, prec):
        psi, W = psi_w
        with jax.default_matmul_precision(prec):
            return jnp.sum(jax.vmap(
                lambda p, w: jnp.sum(p * (Ym @ w)))(psi, W))

    @functools.partial(jax.jit, static_argnames=("prec",))
    def a1_fwd(psi, W, Ym, prec):
        def body(c, _):
            p, w = c
            val = a1_loss((p, w), Ym, prec)
            return (p + 1e-12 * val, w), None
        return jax.lax.scan(body, (psi, W), None, length=STEPS)[0]

    @functools.partial(jax.jit, static_argnames=("prec",))
    def a1_fwdbwd(psi, W, Ym, prec):
        def body(c, _):
            g = jax.grad(a1_loss)(c, Ym, prec)
            return jax.tree.map(lambda x, d: x - 1e-12 * d, c, g), None
        return jax.lax.scan(body, (psi, W), None, length=STEPS)[0]

    psi = params0.psi
    W = params0.W
    for prec, tag in (("highest", "pinned_highest"), ("default", "default")):
        rows[f"A_fwd_{tag}_ms"] = timed(a1_fwd, psi, W, data.Y, prec=prec)
        rows[f"A_fwdbwd_{tag}_ms"] = timed(a1_fwdbwd, psi, W, data.Y, prec=prec)
        print(f"A group {tag} done", file=sys.stderr)

    # --- the backward's Y^T psi contraction in isolation, against (a) the
    # row-major Y (what the loop does today: contracts Y's MAJOR axis) and
    # (b) a pre-transposed (G, N) copy (sequential reads; costs one extra
    # Y-sized HBM buffer if adopted) ---
    @functools.partial(jax.jit, static_argnames=("prec",))
    def yT_contract(Ym, psi0, prec):
        # psi0: (LANES, N, 1) -> out (G, LANES)
        def body(p, _):
            out = jax.lax.dot_general(
                Ym.astype(jnp.float32), p[:, :, 0].T,
                (((0,), (0,)), ((), ())), precision=prec,
            )  # contracts Y's leading (cells) axis -> (G, LANES)
            return p + 1e-12 * jnp.sum(out), None
        return jax.lax.scan(body, psi0, None, length=STEPS)[0]

    @functools.partial(jax.jit, static_argnames=("prec",))
    def yT_contract_pretransposed(YTm, psi0, prec):
        def body(p, _):
            out = jax.lax.dot_general(
                YTm.astype(jnp.float32), p[:, :, 0].T,
                (((1,), (0,)), ((), ())), precision=prec,
            )  # YT (G, N) contracts its MINOR axis -> (G, LANES)
            return p + 1e-12 * jnp.sum(out), None
        return jax.lax.scan(body, psi0, None, length=STEPS)[0]

    YT = jax.jit(jnp.transpose)(data.Y)  # materialized (G, N), on-device
    jax.block_until_ready(YT)
    rows["yT_rowmajor_ms"] = timed(yT_contract, data.Y, psi, prec="highest")
    rows["yT_pretransposed_ms"] = timed(
        yT_contract_pretransposed, YT, psi, prec="highest")
    del YT
    print("yT comparison done", file=sys.stderr)

    # --- forward ELBO and the full production step, 10 lanes ---
    def lane_elbo(p, dat, k):
        return mm.elbo(p, dat, k, config, None)

    @jax.jit
    def elbo_fwd(params, dat, k0):
        def body(c, i):
            params, acc = c
            ks = jax.random.split(jax.random.fold_in(k0, i), LANES)
            e = jax.vmap(lambda p, k: lane_elbo(p, dat, k))(params, ks)
            return (jax.tree.map(lambda x: x + 1e-12 * jnp.sum(e), params),
                    acc + jnp.sum(e)), None
        return jax.lax.scan(body, (params, 0.0), jnp.arange(STEPS))[0][1]

    rows["elbo_fwd_10lanes_ms"] = timed(elbo_fwd, params0, data, k_fit)
    print("elbo_fwd done", file=sys.stderr)

    opt = tf1_adam(0.1)
    opt_state0 = jax.jit(lambda p: jax.vmap(opt.init)(p))(params0)
    jax.block_until_ready(opt_state0)

    @jax.jit
    def full_step(params, opt_state, dat, k0):
        def body(c, i):
            params, opt_state = c
            ks = jax.random.split(jax.random.fold_in(k0, i), LANES)

            def one(p, st, k):
                neg, g = jax.value_and_grad(lambda q: -lane_elbo(q, dat, k))(p)
                upd, st = opt.update(g, st)
                import optax
                return optax.apply_updates(p, upd), st

            params, opt_state = jax.vmap(one)(params, opt_state, ks)
            return (params, opt_state), None
        return jax.lax.scan(body, (params, opt_state), jnp.arange(STEPS))[0][0]

    rows["full_step_10lanes_ms"] = timed(full_step, params0, opt_state0, data, k_fit)
    print("full_step done", file=sys.stderr)

    @jax.jit
    def adam_only(params, opt_state):
        def body(c, _):
            params, opt_state = c

            def one(p, st):
                import optax
                g = jax.tree.map(lambda x: 1e-9 * x, p)  # stand-in gradients
                upd, st = opt.update(g, st)
                return optax.apply_updates(p, upd), st

            return jax.vmap(one)(params, opt_state), None
        return jax.lax.scan(body, (params, opt_state), None, length=STEPS)[0][0]

    rows["adam_only_10lanes_ms"] = timed(adam_only, params0, opt_state0)

    rows = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in rows.items()}
    out = {"probe": "roofline_headline", "hw": "v5e single chip",
           "config": {"N": N, "G": G, "C": C, "lanes": LANES,
                      "impl": "z_cheb", "y": "int8", "steps": STEPS},
           "rows": rows}
    print(json.dumps(out))
    if "--commit" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_tpu_r5.jsonl")
        with open(path, "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
