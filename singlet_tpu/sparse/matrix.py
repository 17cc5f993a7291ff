"""Matrix providers — the storage layer the solvers compute against.

The reference iterates CSC structures column-by-column with scalar gathers
(Rcpp::SparseMatrix / IVSparse, reference:inst/include/). On TPU the same
products are MXU matmuls; the provider's job is to present a (rows x cols)
operand supporting:

  * ``t_matmul(X)``        -> P^T @ X                       (cols, k)
  * ``t_matmul_train(...)``-> P^T @ X over *training* (unmasked) entries
  * ``nonempty``           -> bool (cols,) columns with any nonzero
  * padding bookkeeping    -> true row/col counts vs padded device shapes

One implementation lives here:
  * DenseMatrix — the operand densified in HBM. For anything that fits
    (<=~100k cells on one chip) this is the fastest path: every product is a
    straight MXU matmul; "sparse optimization" on TPU means *not fighting the
    MXU*. Mask handling multiplies the operand tile by the mask tile (VPU
    fusion) rather than walking indices.

Matrices too large to densify do not use a provider at all: the drivers
route them to the transpose-free blocked-ELL engine
(parallel/sharded_ell.py) on a 1-device mesh — the single-chip sparse path
IS the multi-chip engine at mesh size 1.

Cell/gene orientation: A is (genes x cells) -> ``cols_are_cells=True``; the
transposed operand At is (cells x genes) -> ``cols_are_cells=False``. The CV
mask is always keyed (cell, gene) (see ops/rngmask.py), so providers map
(row, col) -> (cell, gene) with this flag.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from singlet_tpu.ops.linalg import MM_PRECISION
from singlet_tpu.ops.rngmask import mask_block


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseMatrix:
    """Dense (possibly zero-padded) operand, rows x cols in HBM."""

    data: jnp.ndarray                # (rows_pad, cols_pad)
    nonempty: jnp.ndarray            # bool (cols_pad,), False for padding
    rows_true: int = dataclasses.field(metadata=dict(static=True))
    cols_true: int = dataclasses.field(metadata=dict(static=True))
    cols_are_cells: bool = dataclasses.field(metadata=dict(static=True))
    # column-block size for masked/blocked updates; divides data.shape[1]
    block: int = dataclasses.field(metadata=dict(static=True), default=0)

    # ------------------------------------------------------------- factory
    @classmethod
    def from_array(cls, arr, cols_are_cells: bool = True,
                   pad_rows: int = 8, pad_cols: int = 8,
                   dtype=jnp.float32) -> "DenseMatrix":
        arr = np.asarray(arr)
        rows, cols = arr.shape
        rp, cp = _round_up(rows, pad_rows), _round_up(cols, pad_cols)
        buf = np.zeros((rp, cp), dtype=np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype))
        buf[:rows, :cols] = arr
        nonempty = np.zeros((cp,), dtype=bool)
        nonempty[:cols] = (np.abs(arr) > 0).any(axis=0)
        return cls(
            data=jnp.asarray(buf),
            nonempty=jnp.asarray(nonempty),
            rows_true=rows,
            cols_true=cols,
            cols_are_cells=cols_are_cells,
            block=cp,
        )

    @classmethod
    def pair_from_array(cls, arr, **kw) -> Tuple["DenseMatrix", "DenseMatrix"]:
        """(A, At) providers from a genes x cells array."""
        arr = np.asarray(arr)
        return (
            cls.from_array(arr, cols_are_cells=True, **kw),
            cls.from_array(arr.T, cols_are_cells=False, **kw),
        )

    # ----------------------------------------------------------- geometry
    @property
    def shape(self) -> Tuple[int, int]:
        return self.data.shape

    @property
    def rows_pad(self) -> int:
        return self.data.shape[0]

    @property
    def cols_pad(self) -> int:
        return self.data.shape[1]

    @property
    def n_cells(self) -> int:
        return self.cols_true if self.cols_are_cells else self.rows_true

    @property
    def n_genes(self) -> int:
        return self.rows_true if self.cols_are_cells else self.cols_true

    # ----------------------------------------------------------- products
    def t_matmul(self, X: jnp.ndarray) -> jnp.ndarray:
        """P^T @ X: the b-vector gather of the reference's ``predict``
        (reference:src/singlet.cpp:333-347) as one MXU matmul."""
        return jnp.dot(self.data.T, X, precision=MM_PRECISION)

    # ------------------------------------------------------------ masking
    def mask_tile(self, seed: jnp.ndarray, col_start, col_block: int,
                  inv_density: int) -> jnp.ndarray:
        """Test-set mask for a column block, shape (col_block, rows_pad).

        True = held-out. Padding rows/cols are never masked (False) so they
        contribute nothing to Gram corrections or test counts.

        Recomputed from the counter RNG at every access — materializing the
        full mask in HBM was measured *slower* than recomputation (XLA fuses
        the RNG into the consuming matmuls; a cached plane forces an HBM
        round trip), mirroring the reference's never-materialize design
        (reference:src/singlet.cpp:450,485).
        """
        rows_pad = self.data.shape[0]
        col_ids = col_start + jnp.arange(col_block)
        row_ids = jnp.arange(rows_pad)
        if self.cols_are_cells:
            m = mask_block(seed, col_ids, row_ids, inv_density)   # (bc, rows)
        else:
            m = mask_block(seed, row_ids, col_ids, inv_density).T  # (bc, rows)
        valid = (col_ids < self.cols_true)[:, None] & (row_ids < self.rows_true)[None, :]
        return m & valid

    def col_block(self, col_start, col_block: int) -> jnp.ndarray:
        """(rows_pad, col_block) slice of the operand."""
        return jax.lax.dynamic_slice_in_dim(self.data, col_start, col_block, axis=1)
