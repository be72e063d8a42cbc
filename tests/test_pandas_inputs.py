"""pandas-flavoured inputs (the closest analog to the reference's
data.frame/DataFrame handling, R/clonealign.R:237-243)."""

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from clonealign_tpu import clonealign, preprocess_for_clonealign
from clonealign_tpu.synth import assignment_accuracy, simulate_multinomial


def test_dataframe_copy_number_names_flow_through():
    sim = simulate_multinomial(N=60, G=40, C=3, seed=4, mean_total=400)
    df = pd.DataFrame(sim.L, columns=["cloneX", "cloneY", "cloneZ"])
    fit = clonealign(sim.Y, df, max_iter=30, seed=0, verbose=False)
    assert fit.clone_names == ["cloneX", "cloneY", "cloneZ"]
    assert set(fit.clone) <= {"cloneX", "cloneY", "cloneZ", "unassigned"}
    acc = assignment_accuracy(fit.clone, fit.clone_names, sim.clone_idx)
    assert acc > 0.9


def test_dataframe_through_preprocess():
    sim = simulate_multinomial(N=60, G=40, C=2, seed=5, mean_total=400)
    df = pd.DataFrame(sim.L, columns=["A", "B"])
    pp = preprocess_for_clonealign(sim.Y, df, min_counts_per_cell=0)
    assert pp.clone_names == ["A", "B"]
    assert pp.copy_number_data.shape[1] == 2
