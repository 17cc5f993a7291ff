"""NNLS projection of new data onto a frozen factor model (transfer learning).

Equivalent of ``project_model`` (reference:R/ProjectData.R:11-19) over
``c_project_model`` (reference:src/singlet.cpp:405-413): normalize the factor
columns of w, run one unmasked NNLS half-update for h (cold start), rescale.

Scale path: the operand routes through the same providers the fit engines
use — scipy-sparse inputs stay in ELL storage and, with a ``mesh``, cells
shard over the multi-chip sparse engine. The matrix is never densified on
the host (the reference's ``c_project_model`` similarly runs a single sparse
``predict`` pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from singlet_tpu.ops.linalg import MM_PRECISION, scale_columns
from singlet_tpu.ops.nnls import solve_nnls
from singlet_tpu.utils import enable_compilation_cache


@jax.jit
def _project_provider(Ap, W, L1, L2):
    """One cold-start h half-update against the column-normalized W over a
    provider (dense or ELL). W is (rows_pad, k) with zero padded rows."""
    W, _ = scale_columns(W)
    k = W.shape[1]
    a = jnp.dot(W.T, W, precision=MM_PRECISION) + 1e-15 * jnp.eye(k)
    B = Ap.t_matmul(W)
    H = solve_nnls(a, B, jnp.zeros_like(B), L1=L1, L2=L2,
                   update_mask=Ap.nonempty)
    return scale_columns(H)


def project_model(A, w, L1: float = 0.01, L2: float = 0.0, mesh=None):
    """Project columns of A (genes x cells) onto model w (genes x k).

    Accepts w as (genes, k) or (k, genes) like the reference's transpose
    check (reference:src/singlet.cpp:406). ``A`` may be dense, scipy sparse
    (kept in sparse ELL storage), a chunk list / staged directory, or a
    prebuilt ShardedEllEngine; ``mesh`` runs the projection cell-sharded on
    the multi-chip engine. Returns (h (k, cells), d (k,)).
    """
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine
    from singlet_tpu.solvers.drivers import _engine_or_providers

    enable_compilation_cache()
    P = _engine_or_providers(A, mesh)
    genes = (P.rows_true if isinstance(P, ShardedEllEngine)
             else P[0].rows_true)
    w = np.asarray(w, np.float32)
    if w.shape[0] != genes:
        if w.shape[1] == genes:
            w = w.T
        else:
            raise ValueError("'w' must share a common edge with the rows of 'A'")

    if isinstance(P, ShardedEllEngine):
        return P.project(w, L1=L1, L2=L2)

    Ap, _ = P
    W = jnp.zeros((Ap.rows_pad, w.shape[1]), jnp.float32)
    W = W.at[:genes].set(jnp.asarray(w))
    H, d = _project_provider(Ap, W, jnp.float32(L1), jnp.float32(L2))
    return np.asarray(H[: Ap.cols_true]).T, np.asarray(d)
