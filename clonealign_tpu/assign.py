"""Clone calling and post-hoc QC (reference R/inference-tflow.R:22-46,
R/clonealign.R:318-334)."""

from __future__ import annotations

import numpy as np

UNASSIGNED = "unassigned"


def clone_assignment(clone_probs, clone_names, clone_assignment_probability: float = 0.95):
    """Threshold-argmax clone calls (reference R/inference-tflow.R:22-29):
    a cell gets its argmax clone if that probability reaches the threshold,
    otherwise ``"unassigned"``."""
    probs = np.asarray(clone_probs)
    names = np.asarray(list(clone_names) + [UNASSIGNED], dtype=object)
    best = probs.argmax(axis=1)
    called = np.where(probs.max(axis=1) < clone_assignment_probability, len(clone_names), best)
    return [str(x) for x in names[called]]


def recompute_clone_assignment(fit, clone_assignment_probability: float = 0.95):
    """Re-threshold an existing fit (reference R/inference-tflow.R:36-46)."""
    from dataclasses import replace

    clones = clone_assignment(
        fit.ml_params["clone_probs"], fit.clone_names, clone_assignment_probability
    )
    return replace(fit, clone=clones)


def compute_ca_fit_mse(fit, Y, L, model_mu: bool = False, random_clones: bool = False, rng=None):
    """Mean squared error of the fit's predicted expression
    (reference R/clonealign.R:415-434; unexported and uncalled there, kept
    for parity). ``random_clones`` replaces assignments with uniform draws
    from the distinct assigned clones as a baseline."""
    Y = np.asarray(Y, np.float64)
    L = np.asarray(L, np.float64)
    clones = list(fit.clone)
    if random_clones:
        rng = np.random.default_rng() if rng is None else rng
        distinct = sorted(set(clones))
        clones = list(rng.choice(distinct, Y.shape[0], replace=True))

    col_idx = {str(c): i for i, c in enumerate(fit.clone_names)}
    # reference indexes L[, clones] directly; unassigned cells would error
    # there too — require callers to re-threshold first
    idx = np.asarray([col_idx[str(c)] for c in clones])
    predicted = L[:, idx]  # (G, N)
    if model_mu:
        predicted = np.asarray(fit.ml_params["mu"])[:, None] * predicted
    normalizer = Y.sum(axis=1) / predicted.sum(axis=0)
    predicted = predicted.T * normalizer[:, None]
    return float(np.mean((predicted - Y) ** 2))


def compute_correlations(Y, L, clones, clone_names):
    """Per-gene Pearson correlation between z-scored expression and the copy
    number of each cell's assigned clone (reference R/clonealign.R:318-334).
    Unassigned cells are dropped; genes with zero variance in either series
    give NaN (matching R's ``cor`` returning NA)."""
    Y = np.asarray(Y, np.float64)
    L = np.asarray(L, np.float64)
    clones = np.asarray([str(c) for c in clones], dtype=object)
    keep = clones != UNASSIGNED
    Y = Y[keep]
    clones = clones[keep]
    G = Y.shape[1]
    if Y.shape[0] < 2:
        return np.full(G, np.nan)

    # z-score expression per gene (R scale(): center, sd with ddof=1)
    sd = Y.std(axis=0, ddof=1)
    Yz = (Y - Y.mean(axis=0)) / np.where(sd == 0, 1.0, sd)

    col_idx = {str(c): i for i, c in enumerate(clone_names)}
    idx = np.asarray([col_idx[c] for c in clones])
    x = L[:, idx].T  # (n_assigned_cells, G): CN of each cell's clone per gene

    xc = x - x.mean(axis=0)
    yc = Yz - Yz.mean(axis=0)
    num = (xc * yc).sum(axis=0)
    den = np.sqrt((xc * xc).sum(axis=0) * (yc * yc).sum(axis=0))
    with np.errstate(divide="ignore", invalid="ignore"):
        out = num / den
    out[den == 0] = np.nan
    return out
