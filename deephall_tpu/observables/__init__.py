"""Observable estimation on trained wavefunctions.

Standalone (netobs-free) equivalents of the reference's analysis stack: density
profile, pair correlation, one-body RDM, and Laughlin overlap, with a checkpoint-driven
runner.  The netobs-compatible plugin surface lives in ``deephall_tpu.netobs_bridge``.
"""

from deephall_tpu.observables.estimators import (
    ESTIMATORS,
    Estimator,
    make_density,
    make_one_rdm,
    make_overlap,
    make_pair_corr,
)
from deephall_tpu.observables.runner import evaluate_observable, load_run

__all__ = [
    "ESTIMATORS",
    "Estimator",
    "evaluate_observable",
    "load_run",
    "make_density",
    "make_one_rdm",
    "make_overlap",
    "make_pair_corr",
]
