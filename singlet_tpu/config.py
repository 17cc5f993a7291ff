"""Typed configuration mirroring the reference's canonical argument set.

The reference has no config system; everything is function arguments with
documented defaults (reference:R/RunNMF.R:42-60, reference:R/ard_nmf.R:31-34).
We centralize those names/defaults in one frozen dataclass so every driver and
the CLI agree on them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union


@dataclasses.dataclass(frozen=True)
class NMFConfig:
    """Solver configuration.

    Defaults follow ``RunNMF.Seurat`` (reference:R/RunNMF.R:42-60) and
    ``ard_nmf`` (reference:R/ard_nmf.R:31-34).
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

    # ARD-specific knobs (reference:R/ard_nmf.R:31-34)
    k_init: int = 2
    k_max: int = 100
    k_min: int = 2
    cv_tol: float = 1e-4

    # TPU-specific knobs (no reference counterpart)
    block_size: int = 2048          # cells per masked-update block
    dtype: str = "float32"          # compute dtype for A products
    precision: str = "highest"      # jax matmul precision for f32 inputs

    def __post_init__(self):
        # Validation rules from reference:R/ard_nmf.R:35-43.
        if self.L1 >= 1:
            raise ValueError("L1 penalty must be strictly in the range [0, 1)")
        if self.k_min < 2:
            raise ValueError("k_min cannot be less than 2")

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
