"""Multiplicative-update NMF (alternative algorithm, parity surface).

Equivalent of ``c_mu_nmf_base`` (reference:src/singlet.cpp:1000-1049). Note:
the reference's update is a nonstandard Lee-Seung variant that *divides* by
the current factor value (``h(j,i) = numer(j) / (w_rowsq(j) * h(j,i))``) and
never applies the usual multiplicative ratio; the reference comments flag the
solver as unfinished/experimental. We reproduce those semantics verbatim for
parity (``faithful=True``) and also provide the standard Frobenius
multiplicative updates (``faithful=False``) as the usable variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from singlet_tpu.ops.linalg import MM_PRECISION, cor_distance


@jax.jit
def _mu_step_faithful(A, W, H):
    # h(j,i) = (W^T A)(j,i) / (||w_j||^2 * h(j,i))   [reference :1013-1021]
    w_rowsq = jnp.sum(W * W, axis=0)                       # (k,)
    numer_h = jnp.dot(W.T, A, precision=MM_PRECISION)      # (k, cells)
    H = numer_h / (w_rowsq[:, None] * H)
    h_rowsq = jnp.sum(H * H, axis=1)
    numer_w = jnp.dot(A, H.T, precision=MM_PRECISION)      # (genes, k)
    W_new = numer_w / (h_rowsq[None, :] * W)
    return W_new, H


@jax.jit
def _mu_step_standard(A, W, H):
    # classic Frobenius MU: H *= (W^T A)/(W^T W H); W *= (A H^T)/(W H H^T)
    WtA = jnp.dot(W.T, A, precision=MM_PRECISION)
    WtWH = jnp.dot(jnp.dot(W.T, W, precision=MM_PRECISION), H,
                   precision=MM_PRECISION)
    H = H * WtA / (WtWH + 1e-12)
    AHt = jnp.dot(A, H.T, precision=MM_PRECISION)
    WHHt = jnp.dot(W, jnp.dot(H, H.T, precision=MM_PRECISION),
                   precision=MM_PRECISION)
    W_new = W * AHt / (WHHt + 1e-12)
    return W_new, H


def mu_nmf(A, k: int, tol: float = 1e-4, maxit: int = 100, seed: int = 0,
           verbose: bool = False, faithful: bool = False):
    """Fit NMF by multiplicative updates. Returns dict(w, d, h, tol_trace)."""
    A = jnp.asarray(np.asarray(A, np.float32))
    genes, cells = A.shape
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    W = jax.random.uniform(k1, (genes, k), dtype=jnp.float32) + 1e-3
    H = jnp.abs(jax.random.normal(k2, (k, cells), dtype=jnp.float32)) + 1e-3
    step = _mu_step_faithful if faithful else _mu_step_standard
    tol_ = 1.0
    traces = []
    it = 0
    while it < maxit and tol_ > tol:
        W_prev = W
        W, H = step(A, W, H)
        tol_ = float(cor_distance(W, W_prev))
        traces.append(tol_)
        if verbose:
            print(f"{it + 1:4d} | {tol_:8.2e}")
        it += 1
    d = np.ones(k, np.float32)
    return dict(w=np.asarray(W), d=d, h=np.asarray(H), tol_trace=traces)
