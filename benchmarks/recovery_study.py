"""Parameter-recovery and calibration study.

Simulates from the clonealign generative model itself (synth.simulate_multinomial
— well-specified data with known ground truth) and checks the inference
recovers what it claims to estimate, which the reference never validated:

1. clone assignments (accuracy among assigned cells),
2. per-gene base rates mu (Pearson r of log fitted vs log true, after
   mean-normalizing both — mu is identified only up to the gene normalizer),
3. clone prevalences alpha vs the true skewed prevalences (L1 error),
4. calibration of the posterior clone probabilities: among cells whose max
   probability lands in a bin, the fraction correctly assigned should match
   the bin (reliability curve + expected calibration error).

Prints one JSON line per replicate + a summary line, and writes
recovery_study.png. Run: python benchmarks/recovery_study.py [--reps 5]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Okabe-Ito colorblind-safe hues (Wong 2011), fixed assignment:
C_FIT = "#0072B2"   # fitted quantities
C_TRUE = "#999999"  # ground truth / reference lines
C_ACCENT = "#D55E00"

N, G, C = 2000, 500, 4
TRUE_PREV = np.array([0.5, 0.25, 0.15, 0.10])
BINS = np.array([0.0, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0 + 1e-9])

# Calibration regime: clones that differ at only ~10% of genes with ~200
# counts/cell — the well-specified regime above assigns every cell with
# probability ~1 (posteriors saturate), which says nothing about whether
# intermediate probabilities are honest. This one spreads them over [0.4, 1].
CAL_N, CAL_G, CAL_MEAN_TOTAL, CAL_DIFF_FRAC = 1500, 200, 200, 0.10


def simulate_similar_clones(seed):
    """Ground-truth data whose clones share most of their CN profile."""
    rng = np.random.default_rng(seed)
    base = rng.integers(1, 5, CAL_G).astype(float)
    L = np.tile(base[:, None], (1, C))
    for c in range(1, C):
        idx = rng.choice(CAL_G, int(CAL_DIFF_FRAC * CAL_G), replace=False)
        L[idx, c] = np.clip(L[idx, c] + rng.choice([-1, 1], len(idx)), 1, 6)
    pi = rng.choice(C, CAL_N, p=TRUE_PREV)
    mu = rng.lognormal(0, 0.5, CAL_G)
    s = rng.poisson(CAL_MEAN_TOTAL, CAL_N) + 1
    rates = mu[None, :] * L[:, pi].T
    probs = rates / rates.sum(1, keepdims=True)
    Y = np.stack(
        [rng.multinomial(int(s[n]), probs[n]) for n in range(CAL_N)]
    ).astype(float)
    Y[Y.sum(1) == 0, 0] = 1
    return Y, L, pi


def one_rep(seed):
    from clonealign_tpu import clonealign
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(
        N=N, G=G, C=C, seed=seed, mean_total=2000, clone_probs=TRUE_PREV
    )
    fit = clonealign(
        sim.Y, sim.L, max_iter=200, seed=seed, verbose=False, y_storage="auto"
    )

    # 1. accuracy among assigned cells
    probs = np.asarray(fit.ml_params["clone_probs"])
    called = probs.argmax(axis=1)
    is_assigned = np.array([c != "unassigned" for c in fit.clone])
    correct = called == sim.clone_idx
    acc = float(correct[is_assigned].mean())

    # 2. mu recovery (normalize both; compare in log space)
    mu_fit = np.asarray(fit.ml_params["mu"], np.float64)
    mu_true = sim.mu
    lf = np.log(mu_fit / mu_fit.mean())
    lt = np.log(mu_true / mu_true.mean())
    mu_r = float(np.corrcoef(lf, lt)[0, 1])

    # 3. prevalence recovery
    alpha = np.asarray(fit.ml_params["alpha"], np.float64)
    alpha = alpha / alpha.sum()
    prev_l1 = float(np.abs(alpha - TRUE_PREV).sum())

    # 4. calibration, on the similar-clones regime (see its docstring)
    Yh, Lh, pih = simulate_similar_clones(seed + 1000)
    fit_h = clonealign(
        Yh, Lh, max_iter=200, seed=seed, verbose=False, y_storage="auto"
    )
    probs_h = np.asarray(fit_h.ml_params["clone_probs"])
    correct_h = probs_h.argmax(axis=1) == pih
    maxp = probs_h.max(axis=1)
    idx = np.digitize(maxp, BINS) - 1  # -> bin index in [0, len(BINS)-2]
    bin_conf, bin_acc, bin_n = [], [], []
    for b in range(len(BINS) - 1):
        m = idx == b
        if m.sum() == 0:
            continue
        bin_conf.append(float(maxp[m].mean()))
        bin_acc.append(float(correct_h[m].mean()))
        bin_n.append(int(m.sum()))
    ece = float(
        sum(n * abs(a - c) for a, c, n in zip(bin_acc, bin_conf, bin_n)) / sum(bin_n)
    )

    return {
        "seed": seed, "accuracy_assigned": round(acc, 4),
        "assigned_frac": round(float(is_assigned.mean()), 4),
        "mu_log_pearson_r": round(mu_r, 4),
        "prevalence_L1": round(prev_l1, 4), "ece": round(ece, 4),
        "_mu": (lt, lf), "_cal": (bin_conf, bin_acc, bin_n),
        "_alpha": alpha,
    }


def make_figure(reps, path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ink, muted = "#333333", "#777777"
    fig, axes = plt.subplots(1, 3, figsize=(12.5, 3.8))
    fig.subplots_adjust(wspace=0.32, left=0.06, right=0.98, bottom=0.16, top=0.86)

    # panel 1: mu recovery scatter (first replicate, representative)
    lt, lf = reps[0]["_mu"]
    ax = axes[0]
    ax.scatter(lt, lf, s=8, alpha=0.45, color=C_FIT, linewidths=0)
    lim = [min(lt.min(), lf.min()) - 0.1, max(lt.max(), lf.max()) + 0.1]
    ax.plot(lim, lim, color=C_TRUE, lw=1, zorder=0)
    ax.set_xlim(lim), ax.set_ylim(lim)
    ax.set_xlabel("true log mu (normalized)", color=ink)
    ax.set_ylabel("fitted log mu", color=ink)
    rs = [r["mu_log_pearson_r"] for r in reps]
    ax.set_title(
        f"Base-rate recovery  r = {np.mean(rs):.3f} ± {np.std(rs):.3f}",
        fontsize=10, color=ink,
    )

    # panel 2: prevalence recovery (true vs fitted alpha, all reps)
    ax = axes[1]
    x = np.arange(C)
    ax.bar(x - 0.18, TRUE_PREV, width=0.36, color=C_TRUE, label="true")
    alphas = np.stack([r["_alpha"] for r in reps])
    ax.bar(x + 0.18, alphas.mean(axis=0), width=0.36, color=C_FIT, label="fitted α")
    ax.errorbar(
        x + 0.18, alphas.mean(axis=0), yerr=alphas.std(axis=0),
        fmt="none", ecolor=ink, elinewidth=1, capsize=2,
    )
    ax.set_xticks(x, [f"clone {i}" for i in range(C)])
    ax.set_ylabel("prevalence", color=ink)
    l1 = [r["prevalence_L1"] for r in reps]
    ax.set_title(f"Prevalence recovery  L1 = {np.mean(l1):.3f}", fontsize=10, color=ink)
    ax.legend(frameon=False, fontsize=8)

    # panel 3: reliability curve (pooled over reps)
    ax = axes[2]
    ax.plot([0, 1], [0, 1], color=C_TRUE, lw=1, label="perfectly calibrated")
    for r in reps:
        conf, acc, n = r["_cal"]
        ax.plot(conf, acc, marker="o", ms=4, lw=1.2, color=C_FIT, alpha=0.6)
    ax.set_xlim(0.3, 1.02), ax.set_ylim(0.1, 1.02)
    ax.set_xlabel("max posterior clone probability", color=ink)
    ax.set_ylabel("fraction correct", color=ink)
    eces = [r["ece"] for r in reps]
    ax.set_title(
        f"Calibration (similar-clones regime)  ECE = {np.mean(eces):.3f}",
        fontsize=10, color=ink,
    )
    ax.legend(frameon=False, fontsize=8, loc="lower right")

    for ax in axes:
        ax.spines[["top", "right"]].set_visible(False)
        ax.tick_params(colors=muted, labelsize=8)
        ax.grid(axis="y", color="#eeeeee", lw=0.6, zorder=-5)

    fig.suptitle(
        f"Parameter recovery on well-specified data ({N} cells × {G} genes × "
        f"{C} clones, {len(reps)} replicates)",
        fontsize=11, color=ink,
    )
    fig.savefig(path, dpi=150)
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-figure", action="store_true")
    args = ap.parse_args()

    reps = []
    for seed in range(args.reps):
        r = one_rep(seed)
        print(json.dumps({k: v for k, v in r.items() if not k.startswith("_")}))
        reps.append(r)

    summary = {
        "summary": True,
        "accuracy_assigned_mean": round(
            float(np.mean([r["accuracy_assigned"] for r in reps])), 4
        ),
        "mu_log_pearson_r_mean": round(
            float(np.mean([r["mu_log_pearson_r"] for r in reps])), 4
        ),
        "prevalence_L1_mean": round(
            float(np.mean([r["prevalence_L1"] for r in reps])), 4
        ),
        "ece_mean": round(float(np.mean([r["ece"] for r in reps])), 4),
    }
    print(json.dumps(summary))
    if not args.no_figure:
        make_figure(reps, os.path.join(os.path.dirname(os.path.abspath(__file__)), "recovery_study.png"))


if __name__ == "__main__":
    main()
