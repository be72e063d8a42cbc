"""Tests for the region->gene CNV mapping
(reference vignettes/preparing_copy_number_data.Rmd:44-185)."""

import numpy as np

from clonealign_tpu.cnv import cnv_regions_to_genes
from clonealign_tpu.io.datasets import load_df_cnv


def _simple_case():
    # two clones; chr1 has two segments per clone, chr2 one per clone
    cnv = dict(
        chr=["1", "1", "1", "1", "2", "2"],
        start=[0, 100, 0, 100, 0, 0],
        end=[99, 200, 99, 200, 500, 500],
        copy_number=[2, 3, 2, 5, 1, 4],
        clone=["A", "A", "B", "B", "A", "B"],
    )
    genes = dict(
        gene_ids=["g_left", "g_right", "g_span", "g_chr2", "g_nohit"],
        gene_chr=["chr1", "1", "1", "2", "3"],
        gene_start=[10, 120, 90, 20, 0],
        gene_end=[50, 180, 150, 30, 10],
    )
    return cnv, genes


def test_basic_mapping_and_breakpoint_drop():
    cnv, genes = _simple_case()
    res = cnv_regions_to_genes(
        cnv["chr"], cnv["start"], cnv["end"], cnv["copy_number"], cnv["clone"],
        **genes,
    )
    assert res.clone_names == ["A", "B"]
    # g_span crosses the breakpoint (2 hits per clone) -> dropped;
    # g_nohit has no overlap -> dropped;
    # g_left has equal CN across clones (2,2) -> dropped by variance filter
    got = dict(zip(res.gene_ids, res.copy_number.tolist()))
    assert got == {"g_right": [3.0, 5.0], "g_chr2": [1.0, 4.0]}


def test_variance_and_max_cn_filters():
    cnv, genes = _simple_case()
    res_all = cnv_regions_to_genes(
        cnv["chr"], cnv["start"], cnv["end"], cnv["copy_number"], cnv["clone"],
        **genes, require_varying_copy_number=False,
    )
    assert "g_left" in res_all.gene_ids  # kept when variance filter off
    res_var = cnv_regions_to_genes(
        cnv["chr"], cnv["start"], cnv["end"], cnv["copy_number"], cnv["clone"],
        **genes,
    )
    assert "g_left" not in res_var.gene_ids

    # max_min_copy_number: raise clone CNs above 6 for g_chr2
    cnv2 = dict(cnv)
    cnv2["copy_number"] = [2, 3, 2, 5, 7, 8]
    res_cn = cnv_regions_to_genes(
        cnv2["chr"], cnv2["start"], cnv2["end"], cnv2["copy_number"], cnv2["clone"],
        **genes,
    )
    assert "g_chr2" not in res_cn.gene_ids


def test_chr_name_normalization():
    cnv, genes = _simple_case()
    # mixed chr naming on both sides already exercised ("chr1" vs "1")
    res = cnv_regions_to_genes(
        ["chr" + c for c in cnv["chr"]], cnv["start"], cnv["end"],
        cnv["copy_number"], cnv["clone"], **genes,
    )
    assert "g_right" in res.gene_ids


def test_on_bundled_df_cnv():
    cnv = load_df_cnv()
    # synthesize a gene annotation: one gene in the middle of every region
    mid = (cnv["start"] + cnv["end"]) / 2
    # take unique (chr, mid) to avoid multi-clone duplicates
    seen = {}
    for c, m in zip(cnv["chr"], mid):
        seen.setdefault((str(c), float(m)), len(seen))
    gc = [k[0] for k in seen]
    gm = np.asarray([k[1] for k in seen])
    res = cnv_regions_to_genes(
        cnv["chr"], cnv["start"], cnv["end"], cnv["copy_number"], cnv["clone"],
        gene_ids=[f"gene_{i}" for i in range(len(gc))],
        gene_chr=gc, gene_start=gm, gene_end=gm + 1,
    )
    assert res.clone_names == ["A", "B", "C"]
    assert res.copy_number.shape[1] == 3
    assert len(res.gene_ids) > 0
    # all retained genes vary across clones and have min CN <= 6
    assert (res.copy_number.min(axis=1) <= 6).all()
    assert (res.copy_number.var(axis=1, ddof=1) > 0).all()


def test_vectorized_overlap_matches_bruteforce_oracle():
    """The searchsorted interval join must agree with a brute-force overlap
    scan, including breakpoint-spanning (multi-hit) and unmapped genes."""
    rng = np.random.default_rng(7)
    C, chroms = 3, ["1", "2"]
    seg_chr, seg_s, seg_e, seg_cn, seg_cl = [], [], [], [], []
    for c in range(C):
        for ch in chroms:
            bounds = np.sort(rng.choice(10_000, 40, replace=False))
            for i in range(0, len(bounds) - 1, 2):
                seg_chr.append(ch)
                seg_s.append(int(bounds[i]))
                seg_e.append(int(bounds[i + 1]))
                seg_cn.append(int(rng.integers(0, 8)))
                seg_cl.append(f"cl{c}")
    G = 400
    g_chr = rng.choice(chroms + ["3"], G)  # "3" has no segments
    g_s = rng.integers(0, 10_000, G)
    g_e = g_s + rng.integers(1, 800, G)
    ids = [f"g{i}" for i in range(G)]

    out = cnv_regions_to_genes(
        seg_chr, seg_s, seg_e, seg_cn, seg_cl, ids, g_chr, g_s, g_e,
        max_min_copy_number=None, require_varying_copy_number=False,
    )

    kept = {g: i for i, g in enumerate(out.gene_ids)}
    for gi in range(G):
        hits = {}
        unique = True
        for c in range(C):
            k = [
                j
                for j in range(len(seg_chr))
                if seg_cl[j] == f"cl{c}"
                and seg_chr[j] == g_chr[gi]
                and seg_s[j] <= g_e[gi]
                and seg_e[j] >= g_s[gi]
            ]
            if len(k) != 1:
                unique = False
                break
            hits[f"cl{c}"] = seg_cn[k[0]]
        assert (ids[gi] in kept) == unique, (gi, unique)
        if unique:
            row = out.copy_number[kept[ids[gi]]]
            assert list(row) == [hits[c] for c in out.clone_names]


def test_align_expression_to_cnv():
    """The vignette's `sce <- sce[rownames(cnv_mat),]` subsetting step
    (reference vignettes/preparing_copy_number_data.Rmd:176-185)."""
    import numpy as np
    import pytest
    import scipy.sparse as sp

    from clonealign_tpu.cnv import GeneCNVMatrix, align_expression_to_cnv

    rng = np.random.default_rng(0)
    genes = [f"g{i}" for i in range(10)]
    Y = rng.poisson(3, (5, 10)).astype(float)
    cnv = GeneCNVMatrix(
        copy_number=np.array([[2, 3], [1, 1], [4, 2]], float),
        gene_ids=["g7", "g2", "g5"],
        clone_names=["A", "B"],
    )
    Ys, Ls, ids = align_expression_to_cnv(Y, genes, cnv)
    assert ids == ["g7", "g2", "g5"]
    np.testing.assert_array_equal(Ys, Y[:, [7, 2, 5]])
    np.testing.assert_array_equal(Ls, cnv.copy_number)

    # sparse input stays sparse
    Ys2, _, _ = align_expression_to_cnv(sp.csr_matrix(Y), genes, cnv)
    assert sp.issparse(Ys2)
    np.testing.assert_array_equal(np.asarray(Ys2.todense()), Y[:, [7, 2, 5]])

    # missing genes: error by default, droppable on request
    cnv_bad = GeneCNVMatrix(cnv.copy_number, ["g7", "nope", "g5"], ["A", "B"])
    with pytest.raises(ValueError, match="absent"):
        align_expression_to_cnv(Y, genes, cnv_bad)
    Ys3, Ls3, ids3 = align_expression_to_cnv(Y, genes, cnv_bad, on_missing="drop")
    assert ids3 == ["g7", "g5"]
    np.testing.assert_array_equal(Ls3, cnv.copy_number[[0, 2]])

    with pytest.raises(ValueError, match="duplicates"):
        align_expression_to_cnv(Y, ["g0"] * 10, cnv)
    with pytest.raises(ValueError, match="common"):
        align_expression_to_cnv(
            Y, genes,
            GeneCNVMatrix(cnv.copy_number, ["x", "y", "z"], ["A", "B"]),
            on_missing="drop",
        )


def test_nan_copy_number_segments_dropped():
    """Segments with NaN copy number must not leak NaN into the gene matrix
    (regression: the vectorized rewrite briefly dropped this guard)."""
    import numpy as np

    from clonealign_tpu.cnv import cnv_regions_to_genes

    res = cnv_regions_to_genes(
        cnv_chr=["1", "1"], cnv_start=[0, 0], cnv_end=[1000, 1000],
        cnv_copy_number=[np.nan, 2.0], cnv_clone=["A", "B"],
        gene_ids=["g1"], gene_chr=["1"], gene_start=[10], gene_end=[20],
        max_min_copy_number=None, require_varying_copy_number=False,
    )
    assert res.gene_ids == []
    assert not np.isnan(res.copy_number).any()


def test_align_expression_to_cnv_iterator_gene_names():
    """gene_names may be a one-shot iterator; the duplicate check must not
    consume it twice (advisor round-2 finding)."""
    import numpy as np

    from clonealign_tpu.cnv import GeneCNVMatrix, align_expression_to_cnv

    Y = np.arange(20, dtype=float).reshape(2, 10)
    cnv = GeneCNVMatrix(np.array([[2.0], [3.0]]), ["g4", "g1"], ["A"])
    Ys, Ls, ids = align_expression_to_cnv(Y, iter(f"g{i}" for i in range(10)), cnv)
    assert ids == ["g4", "g1"]
    np.testing.assert_array_equal(Ys, Y[:, [4, 1]])
