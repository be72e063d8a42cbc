"""Memory-lean CLI ingestion (VERDICT r4 next-round item 2).

The CLI/HDF5 path used to densify every input to host float64
(``__main__._load_counts`` cast + ``io/h5.py`` ``.todense()``) — 4 GB at
100k x 5k — re-introducing exactly the blowup the library ingestion avoids.
Now sparse formats stay scipy-sparse end to end:

* a 200k-cell sparse ``.h5ad`` reads with peak host RSS nnz-bound (probed
  in a fresh subprocess via VmHWM with a clear_refs reset);
* the sparse CLI path produces a fit identical to the dense path.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
sp = pytest.importorskip("scipy.sparse")

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_sparse_h5ad(path, m):
    with h5py.File(path, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["shape"] = m.shape
        g["data"] = m.data
        g["indices"] = m.indices
        g["indptr"] = m.indptr


_RSS_PROBE = r"""
import json, os, sys
import numpy as np

path = sys.argv[1]
from clonealign_tpu.__main__ import _load_counts  # imports before the reset

def vm_hwm_kb():
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmHWM:"):
                return int(line.split()[1])
    raise RuntimeError("no VmHWM")

# reset the peak-RSS watermark so the delta isolates the read itself
with open("/proc/self/clear_refs", "w") as fh:
    fh.write("5")
base = vm_hwm_kb()
Y, genes, cells = _load_counts(path, transpose=False)
peak = vm_hwm_kb()
import scipy.sparse as sp
print(json.dumps({
    "sparse": bool(sp.issparse(Y)),
    "dtype": str(Y.dtype),
    "shape": list(Y.shape),
    "nnz": int(Y.nnz) if sp.issparse(Y) else -1,
    "delta_kb": peak - base,
}))
"""


def test_200k_cell_sparse_h5ad_reads_nnz_bound(tmp_path):
    N, G = 200_000, 300
    rng = np.random.default_rng(0)
    nnz_per_row = 3
    rows = np.repeat(np.arange(N), nnz_per_row)
    cols = rng.integers(0, G, size=N * nnz_per_row)
    vals = rng.integers(1, 20, size=N * nnz_per_row).astype(np.int32)
    m = sp.csr_matrix((vals, (rows, cols)), shape=(N, G))
    p = str(tmp_path / "big.h5ad")
    _write_sparse_h5ad(p, m)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", _RSS_PROBE, p],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["sparse"] and info["shape"] == [N, G]
    assert info["dtype"] == "int32"  # on-disk dtype preserved
    dense_f64_kb = N * G * 8 // 1024          # 468 MB — the OLD path's cost
    nnz_kb = (m.data.nbytes + m.indices.nbytes + m.indptr.nbytes) // 1024
    # nnz-bound with generous slack for h5py buffers; far below densification
    assert info["delta_kb"] < max(8 * nnz_kb, dense_f64_kb // 4), (
        f"read peaked at {info['delta_kb']} kB; nnz payload is {nnz_kb} kB, "
        f"a dense float64 copy would be {dense_f64_kb} kB"
    )


def test_cli_sparse_h5ad_fit_matches_dense_npz(tmp_path):
    from clonealign_tpu.__main__ import main
    from clonealign_tpu.fit import ClonealignFit
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(N=50, G=30, C=2, seed=4, mean_total=400)
    _write_sparse_h5ad(
        str(tmp_path / "c.h5ad"), sp.csr_matrix(sim.Y.astype(np.int32))
    )
    np.savez(str(tmp_path / "c.npz"), counts=sim.Y.astype(np.int32))
    with open(tmp_path / "cnv.csv", "w") as fh:
        fh.write("A,B\n")
        for row in sim.L:
            fh.write(",".join(str(int(v)) for v in row) + "\n")

    for src, out in (("c.h5ad", "f1.npz"), ("c.npz", "f2.npz")):
        rc = main([
            "fit", "--counts", str(tmp_path / src),
            "--cnv", str(tmp_path / "cnv.csv"),
            "--out", str(tmp_path / out), "--max-iter", "15",
            "--seed", "3", "--quiet",
        ])
        assert rc == 0
    f1 = ClonealignFit.load(str(tmp_path / "f1.npz"))
    f2 = ClonealignFit.load(str(tmp_path / "f2.npz"))
    assert f1.clone == f2.clone
    # the sparse path computes the derived statistics (log_binom, YlogL) in
    # host float64, the dense path on device in f32 at HIGHEST — same math,
    # different rounding, so equality here is to float32-noise tolerance
    np.testing.assert_allclose(
        f1.convergence_info.final_elbo, f2.convergence_info.final_elbo,
        rtol=5e-6,
    )
    np.testing.assert_allclose(
        f1.ml_params["clone_probs"], f2.ml_params["clone_probs"], atol=1e-4
    )


def test_cli_sparse_assign_roundtrip(tmp_path):
    """`assign` (serve) accepts sparse counts from the CLI readers too."""
    from clonealign_tpu.__main__ import main

    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(N=40, G=25, C=2, seed=7, mean_total=400)
    _write_sparse_h5ad(
        str(tmp_path / "c.h5ad"), sp.csr_matrix(sim.Y.astype(np.int32))
    )
    with open(tmp_path / "cnv.csv", "w") as fh:
        fh.write("A,B\n")
        for row in sim.L:
            fh.write(",".join(str(int(v)) for v in row) + "\n")
    rc = main([
        "fit", "--counts", str(tmp_path / "c.h5ad"),
        "--cnv", str(tmp_path / "cnv.csv"),
        "--out", str(tmp_path / "fit.npz"), "--max-iter", "15",
        "--seed", "0", "--quiet",
    ])
    assert rc == 0
    rc = main([
        "assign", "--fit", str(tmp_path / "fit.npz"),
        "--counts", str(tmp_path / "c.h5ad"),
        "--cnv", str(tmp_path / "cnv.csv"),
        "--out", str(tmp_path / "asg.npz"), "--quiet",
    ])
    assert rc == 0
    z = np.load(str(tmp_path / "asg.npz"), allow_pickle=False)
    assert z["clone_probs"].shape == (40, 2)
    assert len(z["clone"]) == 40


def test_cli_h5ad_layer_and_allow_fractional(tmp_path):
    """Scanpy-shaped files (normalized X, raw counts in layers/counts) must
    be reachable from the CLI: --layer selects the counts layer; without it
    the integrality contract rejects the normalized X with the named fix,
    and --allow-fractional is the explicit escape hatch."""
    from clonealign_tpu.__main__ import main
    from clonealign_tpu.synth import simulate_multinomial

    sim = simulate_multinomial(N=40, G=25, C=2, seed=5, mean_total=400)
    counts = sp.csr_matrix(sim.Y.astype(np.int32))
    normalized = counts.astype(np.float64).copy()
    normalized.data = np.log1p(normalized.data)  # fractional values
    p = str(tmp_path / "scanpy.h5ad")
    with h5py.File(p, "w") as f:
        for key, m in (("X", normalized), ("layers/counts", counts)):
            g = f.create_group(key)
            g.attrs["encoding-type"] = "csr_matrix"
            g.attrs["shape"] = m.shape
            g["data"] = m.data
            g["indices"] = m.indices
            g["indptr"] = m.indptr
    with open(tmp_path / "cnv.csv", "w") as fh:
        fh.write("A,B\n")
        for row in sim.L:
            fh.write(",".join(str(int(v)) for v in row) + "\n")
    common = ["--cnv", str(tmp_path / "cnv.csv"), "--max-iter", "10",
              "--seed", "0", "--quiet"]

    # normalized X -> rejected, message names the layer fix
    with pytest.raises(ValueError, match="fractional"):
        main(["fit", "--counts", p, "--out", str(tmp_path / "f0.npz")]
             + common)

    # --layer counts -> the raw counts fit
    rc = main(["fit", "--counts", p, "--layer", "counts",
               "--out", str(tmp_path / "f1.npz")] + common)
    assert rc == 0

    # --allow-fractional -> explicit opt-in fits the normalized values
    rc = main(["fit", "--counts", p, "--allow-fractional",
               "--out", str(tmp_path / "f2.npz")] + common)
    assert rc == 0

    from clonealign_tpu.fit import ClonealignFit

    f1 = ClonealignFit.load(str(tmp_path / "f1.npz"))
    assert len(f1.clone) == 40
