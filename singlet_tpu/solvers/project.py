"""NNLS projection of new data onto a frozen factor model (transfer learning).

Equivalent of ``project_model`` (reference:R/ProjectData.R:11-19) over
``c_project_model`` (reference:src/singlet.cpp:405-413): normalize the factor
columns of w, run one unmasked NNLS half-update for h (cold start), rescale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from singlet_tpu.ops.linalg import MM_PRECISION, gram, scale_columns
from singlet_tpu.ops.nnls import solve_nnls
from singlet_tpu.solvers.drivers import _coerce_dense
from singlet_tpu.utils import enable_compilation_cache


@jax.jit
def _project(A, W, L1, L2):
    W, _ = scale_columns(W)
    B = jnp.dot(A.T, W, precision=MM_PRECISION)
    nonempty = jnp.any(A != 0, axis=0)
    H = solve_nnls(gram(W), B, jnp.zeros_like(B), L1=L1, L2=L2,
                   update_mask=nonempty)
    return scale_columns(H)


def project_model(A, w, L1: float = 0.01, L2: float = 0.0):
    """Project columns of A (genes x cells) onto model w (genes x k).

    Accepts w as (genes, k) or (k, genes) like the reference's transpose
    check (reference:src/singlet.cpp:406). Returns (h (k, cells), d (k,)).
    """
    A = _coerce_dense(A)
    w = np.asarray(w, np.float32)
    if w.shape[0] != A.shape[0]:
        if w.shape[1] == A.shape[0]:
            w = w.T
        else:
            raise ValueError("'w' must share a common edge with the rows of 'A'")
    enable_compilation_cache()
    H, d = _project(jnp.asarray(A), jnp.asarray(w),
                    jnp.float32(L1), jnp.float32(L2))
    return np.asarray(H).T, np.asarray(d)
