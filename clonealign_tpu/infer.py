"""Variational-inference engine: the reference's Adam training loop
(reference R/inference-tflow.R:344-421) as a single jitted ``lax.while_loop``.

Where the reference crosses R -> Python -> TF C++ per iteration and re-feeds
the full N x G matrix as a placeholder every ``sess$run``, here the data is
device-resident and the *entire* optimization — warm start, Adam steps,
convergence monitoring, final 20-sample ELBO estimate — is one compiled XLA
program per fit. That is the main structural speedup over the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .models import multinomial as mm


def tf1_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Adam with TF1's update form (reference R/inference-tflow.R:345 uses
    ``tf$train$AdamOptimizer`` defaults).

    TF1 applies ``lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)`` — the
    epsilon sits *outside* the bias correction, unlike optax.adam. Matching it
    removes one source of trajectory divergence from the reference.
    """

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

        def scaled(m, v):
            # TF1 computes the bias-correction scalars in the variable's dtype
            # (cast of beta-power accumulators) — follow it so float64 fits
            # track the reference beyond f32 precision.
            t = count.astype(jnp.promote_types(m.dtype, jnp.float32))
            lr_t = learning_rate * jnp.sqrt(1 - b2**t) / (1 - b1**t)
            return (-lr_t * m / (jnp.sqrt(v) + eps)).astype(m.dtype)

        updates = jax.tree.map(scaled, mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class InferenceResult(NamedTuple):
    params: mm.CloneAlignParams
    elbo_trace: jax.Array      # (max_iter + 1,), NaN-padded after convergence
    n_iters: jax.Array         # scalar int
    final_elbo: jax.Array      # mean of 20 fresh stochastic evaluations
    sd_final_elbo: jax.Array   # ddof=1 sd of those evaluations


class _LoopState(NamedTuple):
    params: mm.CloneAlignParams
    opt_state: optax.ScaleByAdamState
    key: jax.Array
    elbo_val: jax.Array
    window: jax.Array  # (window_size,) recent relative ELBO diffs
    trace: jax.Array   # (max_iter + 1,)
    i: jax.Array


def run_inference(
    params: mm.CloneAlignParams,
    data: mm.ModelData,
    key: jax.Array,
    config: mm.ModelConfig,
    *,
    max_iter: int = 100,
    rel_tol: float = 1e-5,
    learning_rate: float = 0.1,
    initial_shrink: float = 5.0,
    window_size: int = 10,
    n_final_elbo_samples: int = 20,
    extra_log_lik: Optional[jax.Array] = None,
    remat="auto",
    elbo_eval: str = "fresh",
    progress: bool = False,
    loop_impl: str = "while",
    unroll: int = 1,
) -> InferenceResult:
    """Fit by reparametrization-gradient VI. Pure function of its inputs —
    safe under jit/vmap (multi-restart vmaps over ``key``).

    Loop semantics mirror the reference exactly: likelihood-based gamma warm
    start (scaled by ``initial_shrink``/5, see
    :func:`~clonealign_tpu.models.multinomial.gamma_warm_start_logits`);
    each iteration takes one Adam step on -ELBO with a fresh MC sample then
    re-evaluates the ELBO with another fresh sample
    (reference R/inference-tflow.R:401-403 runs separate ``sess$run`` calls,
    each resampling); stops when the mean |relative ELBO change| over the
    last ``window_size`` iterations drops below ``rel_tol``
    (reference R/inference-tflow.R:379,404-416).

    ``elbo_eval`` controls the convergence-monitoring stream: "fresh"
    (reference semantics) evaluates the ELBO after each update with a new MC
    sample — a second forward pass; "reuse" monitors the value already
    computed by value_and_grad (pre-update, training sample) — halves the
    per-iteration cost with an equally valid stochastic ELBO estimate, at the
    price of the trace lagging one update behind the reference's.

    ``loop_impl`` selects the iteration engine: "while" (lax.while_loop;
    stops early on convergence) or "scan" (lax.scan with per-step freeze
    masking and ``unroll``; same results, lower loop overhead, but always
    runs ``max_iter`` steps — best when convergence rarely precedes
    ``max_iter``, e.g. throughput benchmarking).
    """
    if elbo_eval not in ("fresh", "reuse"):
        raise ValueError(f"elbo_eval must be 'fresh' or 'reuse', got {elbo_eval!r}")
    if loop_impl not in ("while", "scan"):
        raise ValueError(f"loop_impl must be 'while' or 'scan', got {loop_impl!r}")
    opt = tf1_adam(learning_rate)
    dtype = params.qmu_loc.dtype

    key, k_warm, k_init_eval = jax.random.split(key, 3)
    warm_logits = mm.gamma_warm_start_logits(
        params, data, k_warm, config, initial_shrink, extra_log_lik
    )
    params = params._replace(gamma_logits=warm_logits)

    elbo0 = mm.elbo(params, data, k_init_eval, config, extra_log_lik)

    trace = jnp.full((max_iter + 1,), jnp.nan, dtype)
    trace = trace.at[0].set(elbo0)
    window = jnp.full((window_size,), 1e3, dtype)

    def loss_fn(p, k):
        return -mm.elbo(p, data, k, config, extra_log_lik)

    if remat == "auto":
        # The exact likelihood's backward otherwise stores several N x G
        # intermediates (rfe and friends — 2 GB each at 100k x 5k f32), so
        # remat pays for itself. z_cheb has no N x G residuals at all (its
        # normalizer is a G x (D+1) node table + Clenshaw with an analytic
        # VJP), so remat only re-runs cheap work: measured 1M x 2k sweep
        # 10.0 s with remat vs 6.96 s without (benchmarks/results_tpu_r3.jsonl).
        remat = not mm._use_z_cheb(config)
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    def active(st: _LoopState):
        return (st.i < max_iter) & (jnp.mean(jnp.abs(st.window)) >= rel_tol)

    def cond(st: _LoopState):
        # Under vmap (multi-restart), cond is OR-reduced across lanes; body
        # therefore freezes lanes whose own `active` flag has dropped.
        return active(st)

    def body(st: _LoopState):
        key, k_train, k_eval = jax.random.split(st.key, 3)
        neg_elbo, grads = jax.value_and_grad(loss_fn)(st.params, k_train)
        updates, opt_state = opt.update(grads, st.opt_state)
        params = optax.apply_updates(st.params, updates)
        if elbo_eval == "fresh":
            elbo_new = mm.elbo(params, data, k_eval, config, extra_log_lik)
        else:
            elbo_new = -neg_elbo
        diff = (elbo_new - st.elbo_val) / jnp.abs(st.elbo_val)
        window = jnp.roll(st.window, -1).at[-1].set(diff)
        trace = st.trace.at[st.i + 1].set(elbo_new)
        new = _LoopState(params, opt_state, key, elbo_new, window, trace, st.i + 1)
        keep = active(st)
        if progress:
            # opt-in analog of the reference's per-iteration progress bar
            # (reference R/inference-tflow.R:384-398); host callback per
            # step. The keep flag travels with the values: under
            # loop_impl="scan" the body still executes after convergence
            # (its results are frozen out by the jnp.where below), and
            # printing those phantom iterations would misreport both the
            # iteration count and the ELBO path (round-5 review finding).
            def _report(i, e, c, k):
                if bool(k):
                    print(
                        f"  VB iter {int(i):4d}  elbo {float(e):.4f}  "
                        f"mean|Δ| {float(c):.3e}"
                    )

            jax.debug.callback(
                _report, st.i + 1, elbo_new, jnp.mean(jnp.abs(window)), keep
            )
        return jax.tree.map(lambda n, o: jnp.where(keep, n, o), new, st)

    st = _LoopState(
        params=params,
        opt_state=opt.init(params),
        key=key,
        elbo_val=elbo0,
        window=window,
        trace=trace,
        i=jnp.zeros([], jnp.int32),
    )
    if loop_impl == "while":
        st = jax.lax.while_loop(cond, body, st)
    else:
        st, _ = jax.lax.scan(
            lambda s, _: (body(s), None), st, None, length=max_iter, unroll=unroll
        )

    # Final ELBO: mean/sd over fresh stochastic evaluations
    # (reference R/inference-tflow.R:447-454). When training used the
    # Chebyshev-approximated normalizer, the REPORTED ELBO is re-evaluated
    # through the exact one: these are forward-only evaluations, the
    # clone-normalizer matmul is sample-independent across the vmap (rfe
    # stays unbatched), and an exact report means z_cheb fits are directly
    # comparable to exact-path / reference ELBOs with no approximation term.
    final_config = (
        config._replace(likelihood_impl="xla")
        if mm._use_z_cheb(config)
        else config
    )
    eval_keys = jax.random.split(jax.random.fold_in(st.key, 7), n_final_elbo_samples)
    finals = jax.vmap(
        lambda k: mm.elbo(st.params, data, k, final_config, extra_log_lik)
    )(eval_keys)
    final_elbo = jnp.mean(finals)
    sd_final = jnp.std(finals, ddof=1)

    return InferenceResult(
        params=st.params,
        elbo_trace=st.trace,
        n_iters=st.i,
        final_elbo=final_elbo,
        sd_final_elbo=sd_final,
    )
