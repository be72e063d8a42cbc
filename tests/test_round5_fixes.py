"""Round-5 correctness fixes.

1. Negative counts must be rejected BEFORE any host wire downcast — a count
   below the wire dtype's lower bound (e.g. int16 -129 into the auto-selected
   int8 wire) would otherwise wrap positive and pass the post-upload device
   min guard (advisor finding, round 4).
2. ``compute_correlations(clones_idx=...)`` / ``multirun_calls_device`` are
   the device-side multirun path (restarts.py) — they must match the string/
   host path exactly.
3. bfloat16 ``device_Y`` storage is lossy above 256, so correlation QC falls
   back to the exact host pass.
4. Fractional float "counts" (normalized data) are rejected with a named fix
   unless ``allow_fractional=True`` (the reference's API shape makes this
   mistake impossible — it takes the counts assay, R/clonealign.R:212-224).
"""

import numpy as np
import pytest

import clonealign_tpu as ca
from clonealign_tpu import api as _api
from clonealign_tpu.assign import (
    clone_assignment,
    compute_correlations,
    multirun_calls_device,
)


def _toy(N=60, G=24, C=3, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.integers(1, 4, size=(G, C)).astype(np.float64)
    z = rng.integers(0, C, size=N)
    rates = L[:, z].T * rng.uniform(0.5, 2.0, size=G)[None, :]
    Y = rng.poisson(rates * 3.0).astype(np.int16)
    Y[Y.sum(axis=1) == 0, 0] = 1
    return Y, L


# --- 1. negative-count wrap through the wire downcast ----------------------

def test_negative_count_rejected_before_int8_wire_small_path():
    Y, L = _toy()
    Y[0, 0] = -129  # wraps to +127 under a silent int16 -> int8 cast
    with pytest.raises(ValueError, match="non-negative raw counts"):
        _api.setup_fit(Y, L, verbose=False)


def test_negative_count_rejected_chunked_path(monkeypatch):
    from clonealign_tpu.models import multinomial as mm

    Y, L = _toy()
    Y[3, 1] = -129
    # force the row-chunked prepare path at toy size
    monkeypatch.setattr(mm, "_CHUNK_ELEMENTS", 128)
    with pytest.raises(ValueError, match="non-negative raw counts"):
        _api.setup_fit(Y, L, verbose=False)


def test_negative_count_rejected_prepare_data_direct():
    from clonealign_tpu.models import multinomial as mm
    import jax.numpy as jnp

    Y, L = _toy()
    Y[2, 2] = -300
    with pytest.raises(ValueError, match="non-negative raw counts"):
        mm.prepare_data(Y, L, y_storage=jnp.int8)


# --- 2. device multirun calls == host path ---------------------------------

def test_multirun_calls_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    R, N, C = 4, 50, 3
    logits = rng.normal(size=(R, N, C)).astype(np.float32) * 4.0
    logits[1, 5] = np.nan  # diverged lane row -> unassigned
    names = ["a", "b", "c"]
    called, counts = multirun_calls_device(jnp.asarray(logits), 0.8)
    for r in range(R):
        import jax

        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits[r]), axis=1))
        host = clone_assignment(probs, names, 0.8)
        dev = [(names + ["unassigned"])[i] for i in called[r]]
        assert host == dev
        labels, n = np.unique(np.asarray(host, object), return_counts=True)
        host_counts = dict(zip([str(l) for l in labels], n.tolist()))
        dev_counts = {
            (names + ["unassigned"])[i]: int(c)
            for i, c in enumerate(counts[r])
            if c
        }
        assert host_counts == dev_counts


def test_compute_correlations_clones_idx_matches_strings():
    Y, L = _toy()
    names = ["a", "b", "c"]
    rng = np.random.default_rng(2)
    idx = rng.integers(-1, 3, size=Y.shape[0])  # -1 = unassigned
    clones = [(names[i] if i >= 0 else "unassigned") for i in idx]
    ref = compute_correlations(Y, L, clones, names)
    via_idx = compute_correlations(Y, L, None, names, clones_idx=idx)
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(via_idx))
    np.testing.assert_allclose(
        ref[np.isfinite(ref)], via_idx[np.isfinite(via_idx)], rtol=1e-12
    )
    # C as the unassigned sentinel (multirun_calls_device's convention)
    via_c = compute_correlations(
        Y, L, None, names, clones_idx=np.where(idx < 0, 3, idx)
    )
    np.testing.assert_allclose(
        ref[np.isfinite(ref)], via_c[np.isfinite(via_c)], rtol=1e-12
    )


def test_run_clonealign_multirun_info_device_path():
    """End-to-end: prevalences/medians via the device calls path."""
    Y, L = _toy(N=80, G=30)
    fit = ca.run_clonealign(
        Y, L, initial_shrinks=(5,), n_repeats=2, max_iter=8,
        verbose=False, print_elbos=False, seed=0,
    )
    info = fit.multirun_info
    assert len(info["clone_prevalences_at_different_shrinks"]) == 2
    for tab in info["clone_prevalences_at_different_shrinks"]:
        assert sum(tab.values()) == Y.shape[0]
        assert all(isinstance(v, int) for v in tab.values())
    assert len(info["median_correlations"]) == 2
    assert np.isfinite(info["median_correlations"]).any()


# --- 3. bfloat16 device_Y falls back to the exact host pass ----------------

def test_bf16_device_y_falls_back_to_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    N, G, C = 40, 8, 2
    # counts > 256 so bf16 rounding actually bites
    Y = rng.integers(200, 2000, size=(N, G)).astype(np.float64)
    L = rng.integers(1, 4, size=(G, C)).astype(np.float64)
    clones = ["a" if i % 2 else "b" for i in range(N)]
    exact = compute_correlations(Y, L, clones, ["a", "b"])
    via_bf16 = compute_correlations(
        Y, L, clones, ["a", "b"], device_Y=jnp.asarray(Y, jnp.bfloat16)
    )
    np.testing.assert_allclose(
        exact[np.isfinite(exact)], via_bf16[np.isfinite(via_bf16)], rtol=1e-12
    )


# --- 4. raw-counts contract --------------------------------------------------

def test_fractional_counts_rejected_dense():
    Y, L = _toy()
    Yn = np.log1p(Y.astype(np.float64))  # "lognormalized" data
    with pytest.raises(ValueError, match="raw integer counts"):
        ca.clonealign(Yn, L, max_iter=2, verbose=False)


def test_fractional_counts_rejected_sparse():
    sp = pytest.importorskip("scipy.sparse")
    Y, L = _toy()
    Yn = sp.csr_matrix(np.log1p(Y.astype(np.float64)))
    with pytest.raises(ValueError, match="raw integer counts"):
        _api.setup_fit(Yn, L, verbose=False)


def test_fractional_counts_allowed_with_escape_hatch():
    Y, L = _toy(N=40, G=16)
    Yn = Y.astype(np.float64) * 1.5  # fractional but valid non-negative
    fit = ca.clonealign(
        Yn, L, max_iter=3, verbose=False, allow_fractional=True
    )
    assert len(fit.clone) == 40


def test_integer_valued_floats_still_accepted():
    Y, L = _toy(N=40, G=16)
    fit = ca.clonealign(Y.astype(np.float64), L, max_iter=3, verbose=False)
    assert len(fit.clone) == 40


def test_fractional_counts_rejected_streaming():
    from clonealign_tpu.stream import fit_streaming

    Y, L = _toy(N=40, G=16)
    with pytest.raises(ValueError, match="raw integer counts"):
        fit_streaming(
            np.log1p(Y.astype(np.float64)), L, max_iter=2,
            chunk_cells=16, verbose=False,
        )


# --- 5. deferred device-side gene filter (int inputs skip the host colsum) --

def test_gene_filter_deferred_matches_host_path():
    """Integer (<=16-bit) dense inputs resolve the gene filter from the
    device stats colsum (no host pass); the retained set, fit, and QC must
    match the float-input host path exactly."""
    Y, L = _toy(N=70, G=28)
    Y[:, 5] = 0                      # silent gene -> dropped at threshold 0
    Y[:, 11] = 0
    kw = dict(max_iter=6, seed=3, verbose=False)
    f_int = ca.clonealign(Y, L, **kw)                       # deferred path
    f_float = ca.clonealign(Y.astype(np.float64), L, **kw)  # host path
    assert f_int.retained_genes == f_float.retained_genes
    assert len(f_int.retained_genes) == 26
    assert f_int.clone == f_float.clone
    np.testing.assert_allclose(
        f_int.convergence_info.final_elbo,
        f_float.convergence_info.final_elbo, rtol=5e-6,
    )
    np.testing.assert_allclose(
        f_int.correlations[np.isfinite(f_int.correlations)],
        f_float.correlations[np.isfinite(f_float.correlations)], rtol=1e-6,
    )


def test_gene_filter_deferred_nonzero_threshold():
    Y, L = _toy(N=50, G=20)
    thr = float(Y.sum(axis=0, dtype=np.float64).mean())
    f_int = ca.clonealign(Y, L, gene_filter_threshold=thr,
                          max_iter=4, seed=0, verbose=False)
    f_float = ca.clonealign(Y.astype(np.float64), L, gene_filter_threshold=thr,
                            max_iter=4, seed=0, verbose=False)
    assert f_int.retained_genes == f_float.retained_genes
    assert 0 < len(f_int.retained_genes) < 20


def test_gene_filter_deferred_named_genes():
    class SCE:
        pass

    Y, L = _toy(N=50, G=20)
    Y[:, 7] = 0
    obj = SCE()
    obj.counts = Y
    obj.gene_names = [f"g{j}" for j in range(20)]
    obj.cell_names = [f"c{i}" for i in range(50)]
    fit = ca.clonealign(obj, L, max_iter=4, seed=0, verbose=False)
    assert "g7" not in fit.retained_genes and len(fit.retained_genes) == 19


# --- 6. the double-buffered upload helper -----------------------------------

def test_prefetched_preserves_order_and_exceptions():
    from clonealign_tpu.models.multinomial import _prefetched

    seen = []

    def make(i):
        seen.append(i)
        return i * 10

    assert list(_prefetched([0, 1, 2, 3], make)) == [0, 10, 20, 30]
    assert seen == [0, 1, 2, 3]

    def boom(i):
        if i == 2:
            raise ValueError("bad chunk")
        return i

    out = []
    with pytest.raises(ValueError, match="bad chunk"):
        for v in _prefetched([0, 1, 2, 3], boom):
            out.append(v)
    # chunks before the bad one were produced; the bad one never yielded
    assert out == [0, 1]


# --- round-5 self-review fixes ---------------------------------------------

def test_defer_filter_bf16_rebuilds_from_exact_host_counts():
    """bf16 storage rounds counts above 256; when the deferred gene filter
    drops genes, the re-prepared statistics must come from the EXACT host
    counts, not the rounded device matrix (prepare_data's
    stats-before-downcast contract)."""
    Y, L = _toy(N=40, G=16)
    Y = Y.astype(np.int16)
    Y[0, 0] = 1001          # not bf16-representable (stores as 1000)
    Y[1, 1] = 517           # rounds to 516
    Y[:, 3] = 0             # trigger the deferred filter
    ctx_def = _api.setup_fit(Y, L, y_storage="bfloat16", verbose=False)
    # float input disables the deferred path -> host filter, exact stats
    ctx_host = _api.setup_fit(
        Y.astype(np.float64), L, y_storage="bfloat16", verbose=False
    )
    for field in ("s", "log_binom", "colsum_Y"):
        np.testing.assert_allclose(
            np.asarray(getattr(ctx_def.data, field), np.float64),
            np.asarray(getattr(ctx_host.data, field), np.float64),
            rtol=1e-6, err_msg=field,
        )


def test_defer_filter_exact_storage_gather_still_exact():
    """The device-gather rebuild (exact int storages) stays bit-exact."""
    Y, L = _toy(N=40, G=16)
    Y[:, 7] = 0
    ctx_int = _api.setup_fit(Y, L, y_storage="int16", verbose=False)
    ctx_host = _api.setup_fit(
        Y.astype(np.float64), L, y_storage="int16", verbose=False
    )
    np.testing.assert_allclose(
        np.asarray(ctx_int.data.s, np.float64),
        np.asarray(ctx_host.data.s, np.float64), rtol=1e-6,
    )


def test_assign_cells_sparse_duplicates_match_dense():
    """Duplicate COO entries sum on canonicalization; the serving wire dtype
    must be chosen AFTER that sum (two 100-entries at one position are a
    true count of 200 — an int8 wire picked from the raw .data would wrap
    it to -56)."""
    sp = pytest.importorskip("scipy.sparse")
    from clonealign_tpu.serve import assign_cells

    Y, L = _toy(N=50, G=20)
    fit = ca.clonealign(Y, L, max_iter=5, seed=1, verbose=False)
    kept = np.asarray([int(g) for g in fit.retained_genes])
    Lk = L[kept]
    rng = np.random.default_rng(0)
    Yn = rng.poisson(3.0, size=(8, len(kept))).astype(np.int64)
    Yn[Yn.sum(axis=1) == 0, 0] = 1
    Yn[0, 1] = 0
    base = sp.coo_matrix(Yn)
    rows = np.append(base.row, [0, 0])
    cols = np.append(base.col, [1, 1])
    vals = np.append(base.data, [100, 100])  # sums to 200 > int8 max
    dup = sp.coo_matrix((vals, (rows, cols)), shape=Yn.shape)
    dense_equiv = Yn.copy()
    dense_equiv[0, 1] = 200

    clones_sp, probs_sp = assign_cells(fit, dup, Lk)
    clones_d, probs_d = assign_cells(fit, dense_equiv, Lk)
    assert clones_sp == clones_d
    np.testing.assert_allclose(probs_sp, probs_d, rtol=1e-6, atol=1e-7)


def test_h5ad_square_undeclared_sparse_raises(tmp_path):
    """A square sparse X with no declared encoding is ambiguous (CSR and CSC
    have the same indptr length); guessing wrong would silently transpose
    the matrix, so the reader must refuse."""
    h5py = pytest.importorskip("h5py")
    sp = pytest.importorskip("scipy.sparse")
    from clonealign_tpu.io.h5 import read_h5ad

    m = sp.random(6, 6, density=0.5, format="csc", random_state=0)
    p = str(tmp_path / "sq.h5ad")
    with h5py.File(p, "w") as f:
        g = f.create_group("X")
        g.attrs["shape"] = m.shape
        g["data"] = m.data
        g["indices"] = m.indices
        g["indptr"] = m.indptr
    with pytest.raises(ValueError, match="square"):
        read_h5ad(p)


def test_z_cheb_config_error_raises_before_data_prep(monkeypatch):
    """An invalid z_cheb configuration (K>1) must fail BEFORE the host
    validation + device upload — at headline scale that work costs ~20 s."""
    from clonealign_tpu.models import multinomial as mm

    def bomb(*a, **k):
        raise AssertionError("prepare_data ran before config validation")

    monkeypatch.setattr(mm, "prepare_data", bomb)
    Y, L = _toy(N=30, G=12)
    with pytest.raises(ValueError, match="z_cheb"):
        _api.setup_fit(Y, L, K=2, likelihood_impl="z_cheb", verbose=False)


def test_coo_matrix_tocsr_sums_duplicates():
    from clonealign_tpu.io.mtx import COOMatrix

    m = COOMatrix(
        rows=np.array([0, 0, 1]), cols=np.array([1, 1, 0]),
        vals=np.array([2.0, 3.0, 4.0]), shape=(2, 2),
    )
    csr = m.tocsr()
    np.testing.assert_array_equal(csr.toarray(), m.todense())
    assert csr.toarray()[0, 1] == 5.0


def test_multirun_calls_device_borderline_threshold_float64():
    """The device call-threshold compare must happen in the LOGITS dtype:
    float64 probabilities densely straddling 0.95 (between float32(0.95)
    ~= 0.9499999880 and 0.95) must call exactly as the float64 host
    compare — a hard-coded float32 threshold on the device would call all
    of them."""
    import jax.numpy as jnp

    p = np.linspace(0.94999990, 0.95000010, 201)  # straddles f32(0.95)
    gl = np.stack([np.log(p), np.log1p(-p)], axis=-1)  # softmax ~= [p, 1-p]
    gl64 = jnp.asarray(gl[None], jnp.float64)          # (1, N, 2) lanes
    called, counts = multirun_calls_device(gl64, 0.95)

    import jax

    probs = np.asarray(jax.nn.softmax(gl64, axis=-1), np.float64)[0]
    host = clone_assignment(probs, ["a", "b"], 0.95)
    host_idx = np.asarray([2 if c == "unassigned" else ("a", "b").index(c)
                           for c in host])
    np.testing.assert_array_equal(called[0], host_idx)
    # both called and unassigned cells must appear in this window
    assert (called[0] == 2).any() and (called[0] != 2).any()


# --- round-5 core-path review fixes ----------------------------------------

def test_all_clones_impossible_cell_raises_typed_error():
    """A cell with nonzero counts at a zero-CN gene in EVERY clone has zero
    likelihood under the whole model; it used to defeat the warm-start
    pinning (uniform gamma x -inf clone_ll) and NaN the entire fit with a
    misleading 'inference diverged' error. Now it is a typed input error
    from prepare_data, on every ingestion path."""
    from clonealign_tpu.models import multinomial as mm

    Y, L = _toy(N=30, G=12)
    L = L.copy()
    L[2, :] = 0.0          # gene 2 impossible in every clone
    Y[:, 2] = 0
    Y[4, 2] = 3            # cell 4 expresses it -> infeasible everywhere
    with pytest.raises(ValueError, match="no clone can explain"):
        mm.prepare_data(np.asarray(Y, np.float64), L)
    # sparse path
    sp = pytest.importorskip("scipy.sparse")
    with pytest.raises(ValueError, match="no clone can explain"):
        mm.prepare_data_sparse(sp.csr_matrix(Y.astype(np.int32)), L)
    # and through the public driver
    with pytest.raises(ValueError, match="no clone can explain"):
        ca.clonealign(Y, L, max_iter=3, verbose=False)


def test_partially_impossible_cell_still_fits():
    """A cell that is impossible for SOME clones (but not all) keeps the
    documented xlogy semantics: zero responsibility there, finite fit."""
    Y, L = _toy(N=30, G=12)
    L = L.copy()
    L[2, 0] = 0.0          # clone 0 impossible for expressers of gene 2
    L[2, 1:] = 2.0
    Y[:, 2] = 0
    Y[4, 2] = 3
    fit = ca.clonealign(Y, L, max_iter=5, verbose=False)
    assert np.isfinite(fit.convergence_info.final_elbo)
    assert float(fit.ml_params["clone_probs"][4, 0]) == 0.0


def test_numpy_bool_data_init_mu():
    """np.True_/np.False_ (e.g. a flag read from a pandas/numpy config)
    must classify as the boolean switch, not as a mu init array."""
    Y, L = _toy(N=30, G=12)
    for flag in (np.bool_(True), np.bool_(False), np.array(True)):
        fit = ca.clonealign(Y, L, data_init_mu=flag, max_iter=3,
                            seed=0, verbose=False)
        assert np.isfinite(fit.convergence_info.final_elbo)
    ref = ca.clonealign(Y, L, data_init_mu=True, max_iter=3, seed=0,
                        verbose=False)
    got = ca.clonealign(Y, L, data_init_mu=np.bool_(True), max_iter=3,
                        seed=0, verbose=False)
    assert ref.convergence_info.final_elbo == got.convergence_info.final_elbo
    rs = ca.run_clonealign(Y, L, initial_shrinks=(5,), n_repeats=2,
                           data_init_mu=np.bool_(True), max_iter=3, seed=0,
                           print_elbos=False, verbose=False)
    assert np.isfinite(rs.convergence_info.final_elbo)


def test_sparse_negative_count_rejected_not_wrapped():
    """prepare_data_sparse with integer storage must reject negative counts
    (the direct sharded_fit path bypasses api._validate_counts); before,
    -129 wrapped to +127 in the int8 downcast while the host stats used
    the true value, NaNing the fit with a 'lower learning_rate' error."""
    sp = pytest.importorskip("scipy.sparse")
    import jax.numpy as jnp

    from clonealign_tpu.models import multinomial as mm

    Y, L = _toy(N=30, G=12)
    Ys = Y.astype(np.int32)
    Ys[0, 0] = -129
    with pytest.raises(ValueError, match="non-negative"):
        mm.prepare_data_sparse(sp.csr_matrix(Ys), L, y_storage=jnp.int8)


def test_fill_rows_matches_concatenate():
    """The donated row-writer assembly is value-identical to a concatenate
    of the same chunks (the memory-contract fix must not change content)."""
    import jax.numpy as jnp

    from clonealign_tpu.models.multinomial import _fill_rows

    rng = np.random.default_rng(0)
    A = rng.integers(0, 100, size=(37, 9)).astype(np.int8)
    chunks = [(0, jnp.asarray(A[0:16])), (16, jnp.asarray(A[16:32])),
              (32, jnp.asarray(A[32:37]))]
    out = _fill_rows(iter(chunks), 37, 9, jnp.int8)
    np.testing.assert_array_equal(np.asarray(out), A)
