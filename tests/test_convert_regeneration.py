"""Guard: re-running the .rda -> .npz conversion reproduces the committed
golden artifacts bit-for-bit (protects against silent RDS-parser regressions).
Skipped when the reference checkout is absent (e.g. public CI)."""

import os

import numpy as np
import pytest

REF = "/root/reference/data"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")
def test_conversion_reproduces_committed_artifacts(tmp_path):
    from clonealign_tpu.io.datasets import _DATA_DIR, convert_reference_data

    convert_reference_data(REF, str(tmp_path))
    for name in ("example_sce.npz", "df_cnv.npz", "example_clonealign_fit.npz"):
        fresh = np.load(tmp_path / name, allow_pickle=False)
        committed = np.load(os.path.join(_DATA_DIR, name), allow_pickle=False)
        assert sorted(fresh.files) == sorted(committed.files), name
        for k in fresh.files:
            np.testing.assert_array_equal(fresh[k], committed[k], err_msg=f"{name}:{k}")
