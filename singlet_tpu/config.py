"""Typed configuration mirroring the reference's canonical argument set.

The reference has no config system; everything is function arguments with
documented defaults (reference:R/RunNMF.R:42-60, reference:R/ard_nmf.R:31-34).
:class:`NMFConfig` centralizes those names/defaults in one frozen dataclass;
it is consumed by ``Experiment.run_nmf`` (whose hyperparameter defaults come
from this class), the ``singlet_tpu.pipeline`` CLI (``--config`` plus
per-flag overrides), and the L3 drivers (``run_nmf`` / ``cross_validate_nmf``
/ ``ard_nmf`` accept ``config=``, which supplies their solver
hyperparameters).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union


@dataclasses.dataclass(frozen=True)
class NMFConfig:
    """Solver configuration.

    Defaults follow ``RunNMF.Seurat`` (reference:R/RunNMF.R:42-60) and
    ``ard_nmf`` (reference:R/ard_nmf.R:31-34). When passed to a driver via
    ``config=``, these fields take precedence over the driver's own
    per-argument defaults; to tweak single fields use :meth:`replace`.
    """

    # rank: None = automatic rank determination; int = fixed rank;
    # sequence = cross-validation grid.
    k: Union[None, int, Sequence[int]] = None
    reps: int = 3
    tol: float = 1e-5
    maxit: int = 100
    L1: float = 0.01
    L2: float = 0.0
    test_set_density: float = 0.05
    learning_rate: float = 0.8
    tol_overfit: float = 1e-4
    trace_test_mse: int = 5
    verbose: int = 1
    seed: int = 0

    # ARD-specific knobs (reference:R/ard_nmf.R:31-34). ``cv_tol`` is the
    # masked-fit convergence tolerance; None means 10 * tol, matching
    # RunNMF's implicit relaxation of the CV fits relative to the final fit.
    k_init: int = 2
    k_max: int = 100
    k_min: int = 2
    cv_tol: Optional[float] = None

    def __post_init__(self):
        # Validation rules from reference:R/ard_nmf.R:35-43.
        if self.L1 >= 1:
            raise ValueError("L1 penalty must be strictly in the range [0, 1)")
        if self.k_min < 2:
            raise ValueError("k_min cannot be less than 2")

    def replace(self, **kw) -> "NMFConfig":
        """A copy with the given fields replaced (unknown names raise)."""
        return dataclasses.replace(self, **kw)

    @property
    def cv_tol_effective(self) -> float:
        return self.cv_tol if self.cv_tol is not None else self.tol * 10

    def validate_density(self) -> Optional[str]:
        """Return a warning string if test_set_density is out of rule-of-thumb
        bounds (reference:R/ard_nmf.R:37-39)."""
        if self.test_set_density > 0.2 or self.test_set_density < 0.01:
            return (
                "'test_set_density' should not be greater than 0.2 or less "
                "than 0.01, as a general rule of thumb"
            )
        return None

    @property
    def inv_density(self) -> int:
        return round(1.0 / self.test_set_density)
