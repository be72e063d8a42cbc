"""CLI tests (clonealign_tpu/__main__.py): fit -> show -> info round trip."""

import gzip

import numpy as np
import pytest

from clonealign_tpu.__main__ import main
from clonealign_tpu.synth import assignment_accuracy, simulate_multinomial

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cli_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    sim = simulate_multinomial(N=60, G=40, C=3, seed=9, mean_total=500)
    dense = sim.Y.T  # genes x cells on disk
    nz = np.argwhere(dense != 0)
    with gzip.open(d / "counts.mtx.gz", "wt") as fh:
        fh.write("%%MatrixMarket matrix coordinate integer general\n")
        fh.write(f"{dense.shape[0]} {dense.shape[1]} {len(nz)}\n")
        for r, c in nz:
            fh.write(f"{r + 1} {c + 1} {int(dense[r, c])}\n")
    with open(d / "cnv.csv", "w") as fh:
        fh.write("gene,A,B,C\n")
        for i, row in enumerate(sim.L):
            fh.write(f"g{i}," + ",".join(str(int(v)) for v in row) + "\n")
    return d, sim


def test_cli_fit_show_info(cli_files, capsys):
    d, sim = cli_files
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "fit.npz"), "--transpose", "--max-iter", "30",
        "--seed", "1", "--quiet",
    ])
    assert rc == 0

    from clonealign_tpu.fit import ClonealignFit

    fit = ClonealignFit.load(str(d / "fit.npz"))
    acc = assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx)
    assert acc > 0.9
    assert fit.clone_names == ["A", "B", "C"]  # from the CSV header

    rc = main(["show", str(d / "fit.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "clone_counts" in out and "final_elbo" in out

    rc = main(["info"])
    assert rc == 0
    assert "clonealign-tpu" in capsys.readouterr().out


def test_cli_fit_z_cheb_impl(cli_files, tmp_path):
    """--likelihood-impl z_cheb reaches the Chebyshev backend from the CLI
    and still recovers the clones."""
    d, sim = cli_files
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(tmp_path / "fit_cheb.npz"), "--transpose",
        "--max-iter", "30", "--seed", "1", "--quiet",
        "--likelihood-impl", "z_cheb",
    ])
    assert rc == 0

    from clonealign_tpu.fit import ClonealignFit

    fit = ClonealignFit.load(str(tmp_path / "fit_cheb.npz"))
    acc = assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx)
    assert acc > 0.9


def test_cli_cheb_impl_requires_negbin_v1(cli_files, tmp_path, capsys):
    """'cheb' is the negbin-v1 VEM backend; with the default v2 model the
    CLI must exit 2 with a clean error, not a raw ValueError traceback
    (advisor r3 finding)."""
    d, _sim = cli_files
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(tmp_path / "nope.npz"), "--transpose", "--quiet",
        "--likelihood-impl", "cheb",
    ])
    assert rc == 2
    err = capsys.readouterr().err
    assert "negbin-v1" in err and "z_cheb" in err


def test_cli_stream_fit(cli_files, tmp_path, capsys):
    """--stream reaches fit_streaming from the CLI (sparse mtx input) and
    recovers the clones; --stream --restarts is refused."""
    d, sim = cli_files
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(tmp_path / "fit_stream.npz"), "--transpose",
        "--max-iter", "30", "--seed", "1", "--quiet",
        "--stream", "--chunk-cells", "25",
    ])
    assert rc == 0

    from clonealign_tpu.fit import ClonealignFit

    fit = ClonealignFit.load(str(tmp_path / "fit_stream.npz"))
    acc = assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx)
    assert acc > 0.9

    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(tmp_path / "no.npz"), "--transpose", "--quiet",
        "--stream", "--restarts", "3",
    ])
    assert rc == 2
    assert "--stream does not support --restarts" in capsys.readouterr().err


def test_cli_rds_fit_out_and_show(cli_files, capsys):
    """`fit --out fit.rds` writes an R-readable fit; `show`/`assign --fit`
    accept .rds directly (reference users' saveRDS files work unchanged)."""
    d, sim = cli_files
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "fit.rds"), "--transpose", "--max-iter", "30",
        "--seed", "1", "--quiet",
    ])
    assert rc == 0

    rc = main(["show", str(d / "fit.rds")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "clone_counts" in out and "final_elbo" in out

    rc = main([
        "assign", "--fit", str(d / "fit.rds"),
        "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "assign.npz"), "--transpose", "--quiet",
    ])
    assert rc == 0
    z = np.load(d / "assign.npz")
    acc = assignment_accuracy(
        [str(c) for c in z["clone"]], [str(c) for c in z["clone_names"]],
        sim.clone_idx,
    )
    assert acc > 0.9


def test_cli_missing_file(cli_files):
    d, _ = cli_files
    with pytest.raises((FileNotFoundError, OSError, ValueError)):
        main([
            "fit", "--counts", "/nonexistent.mtx", "--cnv", str(d / "cnv.csv"),
            "--out", str(d / "x.npz"), "--quiet",
        ])


def test_cli_v1_fit_show_assign(cli_files, capsys):
    """The legacy v1 family end-to-end through the CLI: fit --model
    negbin-v1 -> show (v1 summary) -> assign (classify_cells dispatch)."""
    d, sim = cli_files
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "fit_v1.npz"), "--transpose", "--max-iter", "60",
        "--model", "negbin-v1", "--quiet",
    ])
    assert rc == 0

    from clonealign_tpu.models.negbin import ClonealignV1Fit

    fit = ClonealignV1Fit.load(str(d / "fit_v1.npz"))
    assert fit.clone_names == ["A", "B", "C"]
    acc = assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx)
    assert acc > 0.9

    rc = main(["show", str(d / "fit_v1.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "negbin_v1" in out and "dosage_genes" in out

    rc = main([
        "assign", "--fit", str(d / "fit_v1.npz"),
        "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "assign_v1.npz"), "--transpose", "--quiet",
    ])
    assert rc == 0
    z = np.load(d / "assign_v1.npz")
    acc = assignment_accuracy(
        [str(c) for c in z["clone"]], [str(c) for c in z["clone_names"]],
        sim.clone_idx,
    )
    assert acc > 0.9

    # v1 fits have no R-side layout to target
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "fit_v1.rds"), "--transpose", "--model", "negbin-v1",
        "--quiet",
    ])
    assert rc == 2


def test_cli_v1_rejects_v2_only_flags(cli_files, capsys):
    d, _ = cli_files
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "x.npz"), "--transpose", "--model", "negbin-v1",
        "--restarts", "5", "--quiet",
    ])
    assert rc == 2
    assert "--restarts" in capsys.readouterr().err

    # --latent is v2-only on assign
    rc = main([
        "fit", "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "fit_v1b.npz"), "--transpose", "--model", "negbin-v1",
        "--max-iter", "10", "--quiet",
    ])
    assert rc == 0
    rc = main([
        "assign", "--fit", str(d / "fit_v1b.npz"),
        "--counts", str(d / "counts.mtx.gz"), "--cnv", str(d / "cnv.csv"),
        "--out", str(d / "y.npz"), "--transpose", "--latent", "refine",
        "--quiet",
    ])
    assert rc == 2
    assert "--latent" in capsys.readouterr().err
