"""Smoke + unit tests for the diagnostic plot (reference R/plotting.R)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from clonealign_tpu.plot import _rank, plot_clonealign, segment_states


def test_rank_matches_r_semantics():
    np.testing.assert_allclose(_rank([10, 30, 20]), [1, 3, 2])
    # average ties like R's rank()
    np.testing.assert_allclose(_rank([5, 5, 1]), [2.5, 2.5, 1])


def test_segment_states():
    cnv = np.array([[2, 2], [2, 2], [2, 3], [2, 3], [1, 3]])
    np.testing.assert_array_equal(segment_states(cnv), [1, 1, 2, 2, 3])
    assert segment_states(np.zeros((0, 2))).size == 0


def test_plot_runs_and_returns_figure():
    rng = np.random.default_rng(0)
    N, G, C = 40, 25, 3
    logcounts = rng.normal(2, 1, (N, G))
    cnv = rng.integers(1, 4, (G, C)).astype(float)
    clones = rng.choice(["A", "B", "C", "unassigned"], N).tolist()
    fig = plot_clonealign(
        logcounts,
        clones,
        dict(A=cnv[:, 0], B=cnv[:, 1], C=cnv[:, 2]),
        gene_chr=["1"] * G,
        gene_start=np.arange(G),
        gene_end=np.arange(G) + 1,
        chromosome="1",
    )
    assert fig is not None
    assert len(fig.axes) == 2
    matplotlib.pyplot.close(fig)


def test_plot_wrong_chromosome_raises():
    with pytest.raises(ValueError, match="No genes on chromosome"):
        plot_clonealign(
            np.ones((5, 3)),
            ["A"] * 5,
            np.ones((3, 2)),
            gene_chr=["1", "1", "2"],
            gene_start=[0, 1, 2],
            gene_end=[1, 2, 3],
            chromosome="7",
        )


def test_plot_adata_wrapper():
    pd = pytest.importorskip("pandas")
    from clonealign_tpu.plot import plot_clonealign_adata

    rng = np.random.default_rng(1)
    N, G = 30, 20

    class FakeAnnData:
        pass

    adata = FakeAnnData()
    adata.X = rng.poisson(3, (N, G)).astype(float)
    adata.layers = {"logcounts": np.log1p(adata.X)}
    adata.var = pd.DataFrame(
        {
            "chr": ["1"] * G,
            "start_position": np.arange(G, dtype=float),
            "end_position": np.arange(G, dtype=float) + 1,
            "A": rng.integers(1, 4, G).astype(float),
            "B": rng.integers(1, 4, G).astype(float),
        }
    )
    clones = rng.choice(["A", "B", "unassigned"], N).tolist()

    fig = plot_clonealign_adata(adata, clones, cnv_cols=["A", "B"])
    assert len(fig.axes) == 2
    matplotlib.pyplot.close(fig)

    # reference-style error for a missing coordinate column
    with pytest.raises(ValueError, match="chr_str"):
        plot_clonealign_adata(adata, clones, cnv_cols=["A", "B"], chr_str="nope")
    with pytest.raises(ValueError, match="cnv_cols"):
        plot_clonealign_adata(adata, clones, cnv_cols=["A", "Z"])


def test_plot_default_clone_names_match_fit_api():
    """A bare-array fit labels cells clone_a/clone_b; the plot's defaults
    must match or every series silently renders empty (regression)."""
    import numpy as np

    from clonealign_tpu import clonealign
    from clonealign_tpu.plot import plot_clonealign
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(N=40, G=30, C=3, seed=3, mean_total=400)
    fit = clonealign(sim.Y, sim.L, max_iter=5, verbose=False)
    assert set(fit.clone) <= {"clone_a", "clone_b", "clone_c", "unassigned"}
    G = 30
    fig = plot_clonealign(
        np.log1p(sim.Y), fit.clone, sim.L,
        gene_chr=["1"] * G, gene_start=np.arange(G) * 100,
        gene_end=np.arange(G) * 100 + 50, chromosome="1",
    )
    # at least one RNA point must have been drawn for an assigned clone
    ax_rna = fig.axes[0]
    assert any(len(c.get_offsets()) > 0 for c in ax_rna.collections), (
        "RNA track is empty — clone-name defaults diverged from the fit API"
    )


def test_plot_elbo_accepts_v1_fit():
    from clonealign_tpu.models.negbin import inference_em
    from clonealign_tpu.plot import plot_elbo
    from clonealign_tpu.synth import simulate_model3

    sim = simulate_model3(N=80, G=40, C=3, seed=2)
    fit = inference_em(sim.Y, sim.L, max_iter=8, verbose=False)
    fig = plot_elbo(fit)
    assert fig is not None
    matplotlib.pyplot.close(fig)
