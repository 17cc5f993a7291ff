"""ELL-packed sparse operand: sparse storage, MXU-dense compute tiles.

The TPU answer to the reference's CSC/IVCSC storage layer
(reference:inst/include/, SURVEY.md L0): columns are nnz-padded into
rectangular (cols, max_nnz) index/value planes — fixed shapes XLA can work
with — and the solvers either

  * gather-reduce directly (``t_matmul``: B[c] = sum_p val[c,p] * X[idx[c,p]]),
    2*nnz_pad*k flops, for unmasked half-updates, or
  * densify one column block at a time (``col_block``) and fall into the same
    MXU-dense code path the dense provider uses — which the masked CV updates
    need anyway (the speckled mask is dense over genes).

HBM cost is 2 * cols * max_nnz * 4 bytes (vs rows * cols * 4 dense): ~8-20x
smaller for scRNA matrices, which is what lets million-cell problems fit.
Column order is preserved (no nnz bucketing) so cell indexing — and therefore
the counter-RNG CV masks — stay identical to the dense path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from singlet_tpu.ops.linalg import MM_PRECISION
from singlet_tpu.ops.rngmask import mask_block


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EllMatrix:
    """nnz-padded sparse operand, logically rows x cols.

    idx[c, p] / val[c, p]: row index / value of the p-th nonzero of column c;
    padding entries have idx == rows_pad_index_sentinel? No — padding uses
    idx = rows_pad - 1 with val = 0 (safe gather, contributes nothing).
    """

    idx: jnp.ndarray                 # (cols_pad, max_nnz) int32
    val: jnp.ndarray                 # (cols_pad, max_nnz) float32
    nonempty: jnp.ndarray            # bool (cols_pad,)
    rows_pad: int = dataclasses.field(metadata=dict(static=True))
    rows_true: int = dataclasses.field(metadata=dict(static=True))
    cols_true: int = dataclasses.field(metadata=dict(static=True))
    cols_are_cells: bool = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True), default=0)

    # ------------------------------------------------------------- factory
    @classmethod
    def from_csc(cls, A: sp.spmatrix, cols_are_cells: bool = True,
                 block: int = 2048, rows_pad_to: int = 256,
                 nnz_quantum: int = 8, rows_pad: int = 0,
                 cols_pad: int = 0) -> "EllMatrix":
        """Pack a CSC matrix into ELL planes. ``rows_pad``/``cols_pad`` > 0
        force exact padded dims (used by ``pair_from_csc`` to keep the A/At
        pair's geometry consistent); the native packer (singlet_io) is used
        when available."""
        from singlet_tpu import native

        A = sp.csc_matrix(A)
        rows, cols = A.shape
        nnz_per_col = np.diff(A.indptr)
        max_nnz = _round_up(max(int(nnz_per_col.max()), 1), nnz_quantum)
        blk = min(block, _round_up(cols, 256))
        if not cols_pad:
            cols_pad = _round_up(cols, blk)
        if not rows_pad:
            rows_pad = _round_up(rows, rows_pad_to)
        idx, val = native.csc_to_ell(A, cols_pad, max_nnz, rows_pad - 1)
        ne = np.zeros(cols_pad, bool)
        ne[:cols] = nnz_per_col > 0
        return cls(idx=jnp.asarray(idx), val=jnp.asarray(val),
                   nonempty=jnp.asarray(ne), rows_pad=rows_pad,
                   rows_true=rows, cols_true=cols,
                   cols_are_cells=cols_are_cells, block=blk)

    @classmethod
    def pair_from_csc(cls, A: sp.spmatrix, cell_block: int = 2048,
                      gene_block: int = 2048) -> Tuple["EllMatrix", "EllMatrix"]:
        """(A, At) ELL providers from a genes x cells sparse matrix.

        The pair's padded geometry is computed jointly so the solver
        invariants hold for every shape: ``Ap.cols_pad == Atp.rows_pad``
        (cells axis) and ``Ap.rows_pad == Atp.cols_pad`` (genes axis).
        """
        A = sp.csc_matrix(A)
        genes, cells = A.shape
        blk_c = min(cell_block, _round_up(max(cells, 1), 256))
        cells_pad = _round_up(cells, blk_c)
        blk_g = min(gene_block, _round_up(max(genes, 1), 256))
        genes_pad = _round_up(genes, blk_g)
        Ap = cls.from_csc(A, cols_are_cells=True, block=cell_block,
                          rows_pad=genes_pad, cols_pad=cells_pad)
        Atp = cls.from_csc(A.T.tocsc(), cols_are_cells=False,
                           block=gene_block, rows_pad=cells_pad,
                           cols_pad=genes_pad)
        return Ap, Atp

    # ----------------------------------------------------------- geometry
    @property
    def cols_pad(self) -> int:
        return self.idx.shape[0]

    @property
    def data(self):
        raise AttributeError("EllMatrix stores no dense plane; use col_block")

    # ----------------------------------------------------------- products
    def t_matmul(self, X: jnp.ndarray) -> jnp.ndarray:
        """P^T @ X: (cols_pad, k). X: (rows_pad, k).

        Small operands gather-reduce directly; large ones block over
        columns (densify one tile, one MXU matmul) because the gather's
        (cols, nnz, k) intermediate is materialized by XLA — at
        million-cell scale that is 100s of GB. The densified path spends
        1/density extra FLOPs on the MXU, orders of magnitude cheaper than
        the gather's HBM traffic."""
        k = X.shape[1]
        gathered_bytes = 4 * self.cols_pad * self.idx.shape[1] * k
        if gathered_bytes <= (1 << 28) or self.cols_pad % self.block != 0:
            gathered = jnp.take(X, self.idx, axis=0)      # (cols, nnz, k)
            return jnp.einsum("cp,cpk->ck", self.val, gathered,
                              precision=MM_PRECISION)

        block = self.block

        def body(_, bi):
            start = bi * block
            idx = jax.lax.dynamic_slice_in_dim(self.idx, start, block, 0)
            val = jax.lax.dynamic_slice_in_dim(self.val, start, block, 0)
            tile = jnp.zeros((block, self.rows_pad), val.dtype)
            rows = jnp.arange(block)[:, None]
            tile = tile.at[rows, idx].add(val)
            return None, jnp.dot(tile, X, precision=MM_PRECISION)

        _, Bs = jax.lax.scan(body, None,
                             jnp.arange(self.cols_pad // block))
        return Bs.reshape(self.cols_pad, k)

    def col_block(self, col_start, block: int) -> jnp.ndarray:
        """Densified (rows_pad, block) tile — scatter nz into zeros."""
        idx = jax.lax.dynamic_slice_in_dim(self.idx, col_start, block, 0)
        val = jax.lax.dynamic_slice_in_dim(self.val, col_start, block, 0)
        tile = jnp.zeros((block, self.rows_pad), val.dtype)
        cols = jnp.arange(block)[:, None]
        tile = tile.at[cols, idx].add(val)   # duplicate-safe scatter-add
        # padding rows sentinel (rows_pad-1) may receive zeros only
        return tile.T

    # ------------------------------------------------------------ masking
    def mask_tile(self, seed, col_start, col_block: int, inv_density: int):
        """Identical keying to DenseMatrix.mask_tile — shard/storage invariant."""
        col_ids = col_start + jnp.arange(col_block)
        row_ids = jnp.arange(self.rows_pad)
        if self.cols_are_cells:
            m = mask_block(seed, col_ids, row_ids, inv_density)
        else:
            m = mask_block(seed, row_ids, col_ids, inv_density).T
        valid = (col_ids < self.cols_true)[:, None] & \
                (row_ids < self.rows_true)[None, :]
        return m & valid
