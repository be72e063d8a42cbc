"""The shipped examples must actually run (they are the de-facto vignettes,
reference vignettes/introduction_to_clonealign.Rmd + the CNV-prep recipe)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy; runpy.run_path(r'{os.path.join(_REPO, 'examples', name)}', "
        "run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


def test_full_workflow_example(tmp_path):
    out = _run_example("full_workflow.py", tmp_path)
    assert "served 200 new cells" in out
    # both cohorts recover the ground truth on this easy config
    assert "accuracy vs ground truth: 1.000" in out
    assert "accuracy 1.000" in out
    assert (tmp_path / "full_workflow_fit.npz").exists()


def test_quickstart_example(tmp_path):
    out = _run_example("quickstart.py", tmp_path)
    assert "assignment accuracy vs ground truth" in out
