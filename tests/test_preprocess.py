"""Unit tests for the preprocessing pipeline (reference R/preprocess.R),
covering the filter-order semantics the reference never unit-tested
(SURVEY.md §4)."""

import numpy as np

from clonealign_tpu.io.datasets import load_example_sce
from clonealign_tpu.preprocess import get_outlying_genes, mad, preprocess_for_clonealign


def test_mad_matches_r_definition():
    x = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    # R: mad(x) = 1.4826 * median(|x - median(x)|) = 1.4826 * 1 = 1.4826
    assert np.isclose(mad(x), 1.4826)


def test_outlier_gene_detection():
    rng = np.random.default_rng(0)
    Y = rng.poisson(5.0, (50, 20)).astype(float)
    Y[:, 3] = 10_000  # blatant outlier
    out = get_outlying_genes(Y, nmads=10)
    assert out[3]
    assert out.sum() == 1


def test_filter_order_and_outputs():
    sce = load_example_sce()
    res = preprocess_for_clonealign(
        sce.counts,
        dict(zip(sce.clone_names, sce.copy_number.T)),
        min_counts_per_gene=20,
        min_counts_per_cell=10,
    )
    Y, L = res.gene_expression_data, res.copy_number_data
    assert Y.shape[1] == L.shape[0]
    # post-conditions of each filter
    assert (L.max(axis=1) <= 6).all()
    assert (Y.sum(axis=0) > 20).all()
    assert (L.var(axis=1, ddof=1) > 0).all()
    assert (Y.sum(axis=1) > 10).all()
    assert res.clone_names == ["A", "B", "C"]


def test_each_filter_sees_previous_output():
    # gene that passes the count filter ONLY after a high-CN gene is removed
    # would change MAD statistics; construct a case where order matters:
    # a gene with CN>6 is also the expression outlier — removing it first
    # (reference order) means the outlier filter sees a clean matrix.
    rng = np.random.default_rng(1)
    N, G = 30, 10
    Y = rng.poisson(30.0, (N, G)).astype(float)
    Y[:, 0] = 5_000  # outlier expression
    L = np.ones((G, 3))
    L[:, 1] = 2  # ensure CN variance
    L[0, 2] = 9  # CN filter removes gene 0 first
    res = preprocess_for_clonealign(Y, L, min_counts_per_cell=0, nmads=10)
    # gene 0 removed by the CN filter, so no outliers remain for filter 3
    assert res.gene_expression_data.shape[1] == G - 1


def test_disable_flags():
    rng = np.random.default_rng(2)
    Y = rng.poisson(30.0, (30, 8)).astype(float)
    L = np.ones((8, 2))  # zero variance everywhere
    res = preprocess_for_clonealign(
        Y, L, remove_genes_same_copy_number=False, remove_outlying_genes=False,
        min_counts_per_cell=0, min_counts_per_gene=0,
    )
    assert res.gene_expression_data.shape[1] == 8


def test_preprocess_sparse_matches_dense():
    """scipy sparse input runs without densification and produces the same
    retained sets and counts as the dense path (filter order included)."""
    import numpy as np
    import scipy.sparse as sp

    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(N=300, G=120, C=3, seed=0, mean_total=500)
    # make some genes/cells filterable
    Y = sim.Y.copy()
    Y[:, 5] = 0            # low-count gene
    Y[7, :] = 0
    Y[7, 0] = 50           # low-coverage cell
    L = sim.L.copy()
    L[3] = 9               # over-max copy number
    L[10] = 2              # constant CN across clones

    ref = preprocess_for_clonealign(Y, L)
    out = preprocess_for_clonealign(sp.csr_matrix(Y), L)
    assert sp.issparse(out.gene_expression_data)
    np.testing.assert_array_equal(
        np.asarray(out.gene_expression_data.todense()), ref.gene_expression_data
    )
    np.testing.assert_array_equal(out.copy_number_data, ref.copy_number_data)
