"""Quickstart: simulate clone-structured data, fit, inspect, plot.

Run:  python examples/quickstart.py  (writes quickstart_*.png to CWD)
"""

import collections

import numpy as np

from clonealign_tpu import clonealign, preprocess_for_clonealign, run_clonealign
from clonealign_tpu.synth import assignment_accuracy, simulate_multinomial


def main():
    # --- simulate 1k cells x 400 genes x 4 clones with known ground truth ---
    sim = simulate_multinomial(N=1000, G=400, C=4, seed=0, mean_total=2000)
    print(f"simulated: {sim.Y.shape[0]} cells x {sim.Y.shape[1]} genes, "
          f"{sim.L.shape[1]} clones")

    # --- filter (reference-ordered pipeline) ---
    pp = preprocess_for_clonealign(sim.Y, sim.L)
    print(f"after preprocessing: {pp.gene_expression_data.shape}")

    # --- single fit ---
    fit = clonealign(pp.gene_expression_data, pp.copy_number_data,
                     max_iter=200, seed=1)
    print(fit)
    print("clone counts:", dict(collections.Counter(fit.clone)))

    # --- recommended: multi-restart sweep, best ELBO wins ---
    best = run_clonealign(pp.gene_expression_data, pp.copy_number_data,
                          initial_shrinks=(0, 5, 10), n_repeats=2,
                          max_iter=200, seed=2)
    print("restart ELBOs:", np.round(best.multirun_info["elbos"], 1))

    # --- accuracy vs ground truth (clone_a.. order matches L columns) ---
    # map retained genes back: preprocessing may drop genes but not cells here
    acc = assignment_accuracy(best.clone, best.clone_names, sim.clone_idx)
    print(f"assignment accuracy vs ground truth: {acc:.3f}")

    # --- plots ---
    try:
        import matplotlib

        matplotlib.use("Agg")
        from clonealign_tpu.plot import plot_clonealign, plot_elbo

        plot_elbo(best).savefig("quickstart_elbo.png", dpi=120)
        G = pp.gene_expression_data.shape[1]
        logcounts = np.log1p(
            pp.gene_expression_data
            / pp.gene_expression_data.sum(1, keepdims=True) * 1e4
        )
        fig = plot_clonealign(
            logcounts, best.clone, pp.copy_number_data,
            gene_chr=["1"] * G, gene_start=np.arange(G), gene_end=np.arange(G) + 1,
            chromosome="1", clone_names=best.clone_names,
            expression_ylim=None,
        )
        fig.savefig("quickstart_tracks.png", dpi=120)
        print("wrote quickstart_elbo.png, quickstart_tracks.png")
    except ImportError:
        print("matplotlib not available; skipping plots")

    # --- persist ---
    best.save("quickstart_fit.npz")
    print("saved quickstart_fit.npz")


if __name__ == "__main__":
    main()
