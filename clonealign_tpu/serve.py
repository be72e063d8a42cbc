"""Serving path: assign new cells against an already-fitted model.

The reference can only re-threshold existing assignments
(R/inference-tflow.R:36-46); assigning cells that arrive after the fit means
re-running the whole optimization. Here the fitted gene-level parameters
(mu, clone priors alpha) define a posterior over clones for ANY new cell in
closed form — no optimization:

    log p(z=c | y) ∝ log alpha_c + log Multinomial(y | t, p_c)
    p_c ∝ mu * L[:, c]                       (rfe = 1 for unseen cells)

which reuses the decomposed likelihood: Y_new @ log L − t · log Z(c) up to
per-cell constants. One matmul per batch of cells; thousands of cells per
millisecond on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import assign as _assign


@jax.jit
def _posterior_log_probs(Y, L, mu, log_alpha):
    """(N_new, C) unnormalized clone log-posteriors for new cells.

    ``Y`` may arrive in a narrow integer dtype (see :func:`assign_cells`) —
    contractions promote to f32 on the fly."""
    rates = mu[:, None] * L  # (G, C)
    log_rates = jnp.where(rates > 0, jnp.log(jnp.where(rates > 0, rates, 1.0)), -jnp.inf)
    ylogr = Y @ jnp.where(jnp.isfinite(log_rates), log_rates, 0.0)  # (N, C)
    hits_zero = (Y @ (rates <= 0).astype(jnp.float32)) > 0
    ylogr = jnp.where(hits_zero, -jnp.inf, ylogr)
    t = jnp.sum(Y.astype(jnp.float32), axis=1, keepdims=True)
    log_Z = jnp.log(jnp.sum(rates, axis=0))[None, :]  # (1, C)
    return log_alpha[None, :] + ylogr - t * log_Z


def _narrowest_exact(Y_new):
    """Host->device transfer dtype: counts are usually small integers, so
    ship int8/int16 (4x/2x less PCIe traffic than f32) and widen on device;
    fall back to f32 for fractional or large values."""
    if Y_new.size == 0:
        return np.float32
    if np.issubdtype(Y_new.dtype, np.integer):
        mx, mn = Y_new.max(), Y_new.min()
    elif float(np.max(np.abs(Y_new - np.round(Y_new)))) == 0.0:
        mx, mn = Y_new.max(), Y_new.min()
    else:
        return np.float32
    # counts should be non-negative, but assign_cells (unlike setup_fit) does
    # not validate that — never let a corrupt negative value wrap in the cast
    if mn < 0:
        return np.float32
    if mx <= np.iinfo(np.int8).max:
        return np.int8
    if mx <= np.iinfo(np.int16).max:
        return np.int16
    return np.float32


def assign_cells(
    fit,
    Y_new,
    copy_number_data=None,
    clone_call_probability: float = 0.95,
    saturate: bool = True,
    saturation_threshold: float = 6,
):
    """Assign new cells to clones using a fitted model's parameters.

    Args:
      fit: a :class:`~clonealign_tpu.fit.ClonealignFit` (from ``clonealign``
        or ``run_clonealign``).
      Y_new: (N_new, G') raw counts over the fit's ``retained_genes`` (same
        order). Subset your expression matrix to those genes first.
      copy_number_data: the (G', C) copy numbers used in the fit (saturated
        values are re-derived if you pass the raw matrix with the default
        threshold). Required because the fit object stores parameters, not
        the data.
      clone_call_probability: threshold for the "unassigned" fallback.
      saturate / saturation_threshold: MUST match the settings the model was
        fitted with (defaults mirror the fit API's defaults) so serving
        scores against the same saturated L the fit saw.

    Returns:
      (clones, clone_probs): list of labels and the (N_new, C) posterior.
    """
    from .api import _parse_copy_number

    Y_new = np.asarray(Y_new)
    G = len(fit.ml_params["mu"])
    if Y_new.ndim != 2 or Y_new.shape[1] != G:
        raise ValueError(
            f"Y_new must be (n_cells, {G}) over the fit's retained_genes; got "
            f"{Y_new.shape}"
        )
    if copy_number_data is None:
        raise ValueError("copy_number_data (genes x clones, over retained_genes) is required")
    L, _names = _parse_copy_number(copy_number_data, G)
    if saturate:
        L = np.minimum(L, float(saturation_threshold))

    mu = jnp.asarray(fit.ml_params["mu"], jnp.float32)
    alpha = np.asarray(fit.ml_params["alpha"], np.float64)
    log_alpha = jnp.asarray(np.log(alpha / alpha.sum()), jnp.float32)

    lp = _posterior_log_probs(
        jnp.asarray(Y_new.astype(_narrowest_exact(Y_new))),
        jnp.asarray(L, jnp.float32),
        mu,
        log_alpha,
    )
    probs = np.asarray(jax.nn.softmax(lp, axis=1))
    clones = _assign.clone_assignment(probs, fit.clone_names, clone_call_probability)
    return clones, probs
