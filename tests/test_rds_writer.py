"""RDS *writer* round-trip tests: ``write_rds`` output must parse back byte-
faithfully through the reader (which is itself validated against the
R-produced bundled ``.rda`` files and hand-encoded streams in
test_rds_roundtrip.py), and ``ClonealignFit.save_rds`` must export the slot
layout the reference builds in R (reference R/clonealign.R:286,303)."""

import gzip
import os

import numpy as np
import pytest

from clonealign_tpu.io.rds import (
    RObj,
    parse_r_serialized,
    r_serialize,
    read_rds,
    unwrap,
    write_rds,
)


def roundtrip(obj):
    return parse_r_serialized(r_serialize(obj))


def r_matrix(obj):
    """Reassemble an R matrix (flat column-major + dim) into a numpy array."""
    assert isinstance(obj, RObj)
    dim = tuple(int(d) for d in obj.attr("dim"))
    return np.asarray(unwrap(obj)).reshape(dim, order="F")


def test_header_is_xdr_v2():
    data = r_serialize(None)
    assert data[:2] == b"X\n"
    assert int.from_bytes(data[2:6], "big") == 2


def test_null_roundtrip():
    assert roundtrip(None) is None


def test_double_vector_roundtrip():
    v = np.array([1.5, -2.25, np.nan, np.inf])
    back = unwrap(roundtrip(v))
    np.testing.assert_array_equal(back, v)
    assert back.dtype == np.float64


def test_matrix_roundtrip_column_major():
    m = np.arange(12, dtype=np.float64).reshape(3, 4)
    back = roundtrip(m)
    np.testing.assert_array_equal(r_matrix(back), m)


def test_int_vector_roundtrip():
    v = np.array([1, -7, 2**31 - 1], dtype=np.int64)
    back = unwrap(roundtrip(v))
    assert back.dtype == np.int32
    np.testing.assert_array_equal(back, v)


def test_int_out_of_range_promotes_to_double():
    v = np.array([0, 2**31], dtype=np.int64)  # exceeds R's int32
    back = unwrap(roundtrip(v))
    assert back.dtype == np.float64
    np.testing.assert_array_equal(back, v.astype(np.float64))


def test_int_colliding_with_na_promotes():
    v = np.array([-(2**31)], dtype=np.int64)  # R's NA_integer_ bit pattern
    back = unwrap(roundtrip(v))
    assert back.dtype == np.float64 and back[0] == float(-(2**31))


def test_bool_vector_roundtrip():
    back = unwrap(roundtrip(np.array([True, False, True])))
    np.testing.assert_array_equal(np.asarray(back, bool), [True, False, True])


def test_logical_na_roundtrip():
    v = np.array([True, None, False], dtype=object)
    back = unwrap(roundtrip(v))
    assert list(back) == [True, None, False]


def test_string_vector_with_na_and_utf8():
    s = ["alpha", None, "naïve-β"]
    back = unwrap(roundtrip(s))
    assert back == s


def test_scalars_promote_to_length1_vectors():
    assert float(unwrap(roundtrip(3.5))[0]) == 3.5
    assert int(unwrap(roundtrip(7))[0]) == 7
    assert unwrap(roundtrip("x")) == ["x"]
    assert bool(unwrap(roundtrip(True))[0]) is True


def test_complex_roundtrip():
    v = np.array([1 + 2j, -3.5j])
    np.testing.assert_array_equal(unwrap(roundtrip(v)), v)


def test_named_list_roundtrip():
    obj = {"a": np.array([1.0, 2.0]), "b": ["x", "y"], "nested": {"c": 5}}
    back = roundtrip(obj)
    assert back.attr("names") == ["a", "b", "nested"]
    vals = back.value
    np.testing.assert_array_equal(unwrap(vals[0]), [1.0, 2.0])
    assert unwrap(vals[1]) == ["x", "y"]
    assert unwrap(vals[2].value[0])[0] == 5


def test_unnamed_list_roundtrip():
    back = roundtrip([np.array([1.0]), None, "s"])
    assert back.attr("names") is None
    assert unwrap(back.value[1]) is None


def test_class_and_dimnames_attributes():
    m = RObj(
        np.eye(2),
        {"class": ["mymat"], "dimnames": RObj([None, ["c1", "c2"]])},
    )
    back = roundtrip(m)
    assert back.rclass == ["mymat"]
    dn = back.attr("dimnames")
    assert unwrap(dn[0]) is None and unwrap(dn[1]) == ["c1", "c2"]
    np.testing.assert_array_equal(r_matrix(back), np.eye(2))


def test_unsupported_type_raises():
    with pytest.raises(TypeError):
        r_serialize({"bad": object()})


@pytest.mark.parametrize("compress", ["gzip", "bzip2", "xz", "none"])
def test_write_rds_compressions(tmp_path, compress):
    p = str(tmp_path / f"o_{compress}.rds")
    write_rds({"v": np.array([1.0, 2.0])}, p, compress=compress)
    back = read_rds(p)
    np.testing.assert_array_equal(unwrap(back.value[0]), [1.0, 2.0])
    if compress == "gzip":  # what R's default saveRDS emits
        with open(p, "rb") as fh:
            assert fh.read(2) == b"\x1f\x8b"
        with gzip.open(p, "rb") as fh:
            assert fh.read(2) == b"X\n"


@pytest.mark.slow
class TestSaveRdsFit:
    @pytest.fixture(scope="class")
    def fit(self):
        from clonealign_tpu import run_clonealign
        from clonealign_tpu.synth import simulate_multinomial

        sim = simulate_multinomial(N=40, G=30, C=3, seed=1, mean_total=400)
        return run_clonealign(
            sim.Y, sim.L, initial_shrinks=[0, 5], n_repeats=1, max_iter=5,
            verbose=False, print_elbos=False,
        )

    def test_save_rds_slot_layout(self, fit, tmp_path):
        p = str(tmp_path / "fit.rds")
        fit.save_rds(p)
        back = read_rds(p)
        assert back.rclass == ["clonealign_fit"]
        names = back.attr("names")
        # the slots the reference assembles (reference R/clonealign.R:303)
        for slot in (
            "clone", "ml_params", "convergence_info", "retained_genes",
            "correlations", "multirun_info",
        ):
            assert slot in names
        by = dict(zip(names, back.value))

        assert unwrap(by["clone"]) == list(fit.clone)

        ml = by["ml_params"]
        ml_by = dict(zip(ml.attr("names"), ml.value))
        cp = ml_by["clone_probs"]
        np.testing.assert_allclose(
            r_matrix(cp), np.asarray(fit.ml_params["clone_probs"], np.float64)
        )
        # clone names ride as column dimnames (reference R/clonealign.R:286)
        assert unwrap(cp.attr("dimnames")[1]) == list(fit.clone_names)
        for k in fit.ml_params:
            assert k in ml_by

        ci = by["convergence_info"]
        ci_by = dict(zip(ci.attr("names"), ci.value))
        assert float(unwrap(ci_by["final_elbo"])[0]) == pytest.approx(
            fit.convergence_info.final_elbo
        )
        assert int(unwrap(ci_by["n_iters"])[0]) == fit.convergence_info.n_iters

        mr = by["multirun_info"]
        mr_by = dict(zip(mr.attr("names"), mr.value))
        np.testing.assert_allclose(
            unwrap(mr_by["elbos"]), np.asarray(fit.multirun_info["elbos"])
        )
        tabs = mr_by["clone_prevalences_at_different_shrinks"].value
        first = tabs[0]
        assert sum(unwrap(first)) == len(fit.clone)  # counts cover every cell
        assert set(first.attr("names")) <= set(fit.clone_names) | {"unassigned"}
        assert int(unwrap(mr_by["best_run"])[0]) == fit.multirun_info["best_run"] + 1

    def test_save_rds_without_multirun(self, fit, tmp_path):
        import dataclasses

        solo = dataclasses.replace(fit)
        solo.multirun_info = None
        solo.clone_probs_from_snv = None
        p = str(tmp_path / "solo.rds")
        solo.save_rds(p)
        back = read_rds(p)
        names = back.attr("names")
        assert "multirun_info" not in names
        by = dict(zip(names, back.value))
        assert unwrap(by["clone_probs_from_snv"]) is None

    def test_load_rds_round_trips_the_fit(self, fit, tmp_path):
        from clonealign_tpu.fit import ClonealignFit

        p = str(tmp_path / "fit.rds")
        fit.save_rds(p)
        back = ClonealignFit.load_rds(p)
        assert back.clone == list(fit.clone)
        assert back.clone_names == list(fit.clone_names)
        assert back.retained_genes == [str(g) for g in fit.retained_genes]
        assert set(back.ml_params) == set(fit.ml_params)
        for k in fit.ml_params:
            np.testing.assert_allclose(
                back.ml_params[k],
                np.asarray(fit.ml_params[k], np.float64),
                err_msg=k,
            )
        assert back.convergence_info.final_elbo == pytest.approx(
            fit.convergence_info.final_elbo
        )
        assert back.convergence_info.n_iters == fit.convergence_info.n_iters
        np.testing.assert_allclose(
            back.multirun_info["elbos"], np.asarray(fit.multirun_info["elbos"])
        )
        assert back.multirun_info["best_run"] == fit.multirun_info["best_run"]
        assert (
            back.multirun_info["clone_prevalences_at_different_shrinks"]
            == fit.multirun_info["clone_prevalences_at_different_shrinks"]
        )
        # the loaded fit supports the downstream surface
        from clonealign_tpu import recompute_clone_assignment

        re = recompute_clone_assignment(back, 0.5)
        assert len(re.clone) == len(fit.clone)
        assert repr(back) == repr(fit)

    def test_load_rds_accepts_r_native_layout(self, tmp_path):
        """A fit saved by the ORIGINAL R package has no n_iters slot, a
        1-based best_run, and clone names only in clone_probs dimnames
        (reference R/clonealign.R:286,303; R/inference-tflow.R:459-461) —
        load_rds must reconstruct from that layout alone."""
        from clonealign_tpu.fit import ClonealignFit

        rng = np.random.default_rng(0)
        N, G, C = 7, 5, 3
        gamma = rng.dirichlet(np.ones(C), size=N)
        clone_names = ["A", "B", "C"]
        clones = [clone_names[i] for i in gamma.argmax(1)]
        trace = np.linspace(-100.0, -90.0, 13)
        r_fit = RObj(
            {
                "clone": np.asarray(clones, dtype=np.str_),
                "ml_params": {
                    "clone_probs": RObj(gamma, {"dimnames": RObj([None, clone_names])}),
                    "mu": rng.uniform(0.5, 2.0, G),
                    "s": rng.uniform(100, 200, N),
                    "alpha": np.asarray([0.3, 0.3, 0.4]),
                    "psi": rng.normal(size=(N, 1)),
                    "W": rng.normal(size=(G, 1)),
                    "chi": np.asarray([1.0]),
                },
                "convergence_info": {
                    "final_elbo": -90.0,
                    "sd_final_elbo": 0.25,
                    "elbo": trace,
                },
                "retained_genes": np.asarray([f"g{i}" for i in range(G)], np.str_),
                "correlations": rng.uniform(-1, 1, G),
                "clone_probs_from_snv": None,
                "multirun_info": {
                    "elbos": np.asarray([-95.0, -90.0]),
                    "clone_prevalences_at_different_shrinks": [
                        RObj(np.asarray([4, 3], np.int32), {"names": ["A", "B"]}),
                        RObj(np.asarray([7], np.int32), {"names": ["C"]}),
                    ],
                    "median_correlations": np.asarray([0.1, 0.2]),
                    "initial_shrinks": np.asarray([0.0, 5.0]),
                    "best_run": 2,  # R's 1-based index
                },
            },
            {"class": ["clonealign_fit"]},
        )
        p = str(tmp_path / "rfit.rds")
        write_rds(r_fit, p)
        fit = ClonealignFit.load_rds(p)
        assert fit.clone == clones
        assert fit.clone_names == clone_names
        np.testing.assert_allclose(fit.ml_params["clone_probs"], gamma)
        assert fit.ml_params["W"].shape == (G, 1)
        assert fit.convergence_info.n_iters == trace.size - 1  # derived
        assert fit.clone_probs_from_snv is None
        assert fit.multirun_info["best_run"] == 1  # back to 0-based
        assert fit.multirun_info["clone_prevalences_at_different_shrinks"][0] == {
            "A": 4,
            "B": 3,
        }


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data"), reason="reference data not mounted"
)
def test_load_rds_reads_the_reference_bundled_fit():
    """The REAL R-serialized artifact: the reference's bundled
    example_clonealign_fit.rda (a v1-era fit with clone/ml_params/log_lik/
    retained_genes/basis_means slots, saved by R itself — not by our
    writer). load_rds must ingest it, synthesize convergence_info from the
    log_lik trace, and support print + re-thresholding."""
    from clonealign_tpu import recompute_clone_assignment
    from clonealign_tpu.fit import ClonealignFit

    fit = ClonealignFit.load_rds("/root/reference/data/example_clonealign_fit.rda")
    assert len(fit.clone) == 200
    assert fit.clone_names == ["A", "B", "C"]  # from clone_probs dimnames
    assert fit.ml_params["clone_probs"].shape == (200, 3)
    assert fit.ml_params["phi"].shape == (200, 3, 100)  # v1 NB dispersion kept
    assert fit.ml_params["basis_means"].shape == (20,)
    assert len(fit.retained_genes) == 100
    assert fit.convergence_info.n_iters == 5  # 6-point log_lik trace
    assert np.isfinite(fit.convergence_info.final_elbo)
    assert "200 cells, 100 genes, and 3 clones" in repr(fit)
    re = recompute_clone_assignment(fit, 0.99)
    assert len(re.clone) == 200


def test_uint64_above_int64_max_exports_exact_double():
    """A uint64 past int64 max must not wrap negative on the way to R's
    double promotion (bounds are checked at the source dtype)."""
    v = np.array([2**63 + 2048, 3], dtype=np.uint64)
    back = np.asarray(unwrap(roundtrip(v)))
    assert back.dtype == np.float64
    np.testing.assert_array_equal(back, v.astype(np.float64))
    assert back[0] > 0


def test_empty_typed_string_array_exports_character0():
    """np.asarray([], dtype=np.str_) must serialize as STRSXP (R
    character(0)), not fall through to an empty numeric vector."""
    import struct

    data = r_serialize(np.asarray([], dtype=np.str_))
    from clonealign_tpu.io.rds import STRSXP

    assert struct.unpack(">i", data[14:18])[0] & 0xFF == STRSXP
    assert unwrap(parse_r_serialized(data)) == []
