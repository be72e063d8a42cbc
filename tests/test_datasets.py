"""Golden-data tests: the converted .rda artifacts match the reference's
documented shapes (reference R/clonealign.R:360-387, tests/testthat/test_clonealign.R:4-14).
"""

import numpy as np

from clonealign_tpu.io.datasets import load_df_cnv, load_example_fit, load_example_sce


def test_example_sce_shapes():
    sce = load_example_sce()
    assert sce.counts.shape == (200, 100)  # N cells x G genes
    assert sce.copy_number.shape == (100, 3)
    assert sce.clone_names == ["A", "B", "C"]
    assert sce.gene_names[0] == "gene_1" and sce.gene_names[-1] == "gene_100"
    assert sce.cell_names[0] == "cell_1" and sce.cell_names[-1] == "cell_200"
    # raw integer counts, non-negative
    assert sce.counts.min() >= 0
    assert sce.counts.sum() == 16090
    # copy numbers are small positive integers
    assert sce.copy_number.min() >= 1 and sce.copy_number.max() <= 4


def test_df_cnv_columns():
    cnv = load_df_cnv()
    assert set(cnv) == {"chr", "start", "end", "copy_number", "clone"}
    assert set(np.unique(cnv["clone"])) == {"A", "B", "C"}
    assert (cnv["end"] >= cnv["start"]).all()


def test_example_fit_contract():
    fit = load_example_fit()
    n = len(fit["clone"])
    assert fit["clone_probs"].shape == (n, 3)
    # responsibilities are a distribution over clones
    np.testing.assert_allclose(fit["clone_probs"].sum(axis=1), 1.0, atol=1e-6)
    assert len(fit["retained_genes"]) == len(fit["mu"])
