"""The fit object (reference's ``clonealign_fit`` S3 class,
R/clonealign.R:303,348-357) as a plain dataclass of NumPy arrays."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class ConvergenceInfo:
    """reference R/inference-tflow.R:451-461."""

    final_elbo: float
    sd_final_elbo: float
    elbo: np.ndarray  # trace, length n_iters + 1 (initial ELBO first)
    n_iters: int = 0


@dataclass
class ClonealignFit:
    """Result of :func:`clonealign_tpu.clonealign`.

    Field contract mirrors the reference fit object
    (reference tests/testthat/test_clonealign.R:35-37, SURVEY.md §2.3):
    ``clone``, ``ml_params`` (clone_probs/mu/s/alpha, plus psi/W/chi when
    K>0 and beta when P>0), ``convergence_info``, ``retained_genes``,
    ``correlations``, ``clone_probs_from_snv``; multi-restart fits add
    ``multirun_info``.
    """

    clone: List[str]
    ml_params: Dict[str, np.ndarray]
    convergence_info: ConvergenceInfo
    retained_genes: List
    correlations: np.ndarray
    clone_names: List[str]
    clone_probs_from_snv: Optional[np.ndarray] = None
    multirun_info: Optional[dict] = None

    def __repr__(self):  # reference R/clonealign.R:348-357
        n = len(self.clone)
        g = len(np.atleast_1d(self.ml_params.get("mu", [])))
        c = len(self.clone_names)
        return (
            f"A clonealign_fit for {n} cells, {g} genes, and {c} clones\n"
            "To access clone assignments, call fit.clone\n"
            "To access ML parameter estimates, call fit.ml_params"
        )
