"""Graph-convolutional NMF.

Equivalent of ``c_gcnmf`` (reference:src/singlet.cpp:1668-1730): the h-update
right-hand sides are convolved over a (cells x cells) graph G before the NNLS
solve (``b'_i = sum_j G(j,i) b_j``), and the w-update gathers graph-smoothed
embeddings (``b_gene = sum_c A(gene,c) * (G[:,c] . H)``) — on TPU both are
plain matmuls: B_h' = G^T B_h and B_w = A (G^T H^T)^T.

Also the edge-cluster utilities ``c_differentiate_model``
(reference:src/singlet.cpp:1733-1752) and ``c_assign_cells_to_edge_clusters``
(:1755-1768).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from singlet_tpu.model import NMFModel
from singlet_tpu.ops.linalg import MM_PRECISION, cor_distance, gram, scale_columns
from singlet_tpu.ops.nnls import solve_nnls, sweep_cap_update
from singlet_tpu.solvers.drivers import _coerce_dense, _finalize
from singlet_tpu.utils import enable_compilation_cache


@jax.jit
def _gcnmf_step(A, G, W, H, L1, L2, sweep_cap=None):
    """A: (genes, cells); G: dense (cells, cells); W: (genes,k); H: (cells,k)."""
    # h-update with graph convolution of the RHS. NO empty-column skip:
    # the reference's convolve+solve loop runs nnls for EVERY column
    # (reference:src/singlet.cpp:1683-1689) — a cell with an empty A column
    # but graph neighbors has a nonzero convolved RHS and must be solved.
    a_w = gram(W)
    B = jnp.dot(A.T, W, precision=MM_PRECISION)            # (cells, k)
    B = jnp.dot(G.T, B, precision=MM_PRECISION)            # convolve
    H = solve_nnls(a_w, B, H, L1=L1, L2=L2, sweep_cap=sweep_cap)
    H, d = scale_columns(H)
    # w-update over graph-smoothed embeddings
    a_h = gram(H)
    GH = jnp.dot(G.T, H, precision=MM_PRECISION)           # (cells, k)
    B_w = jnp.dot(A, GH, precision=MM_PRECISION)           # (genes, k)
    W_new = solve_nnls(a_h, B_w, W, L1=L1, L2=L2, sweep_cap=sweep_cap)
    W_new, d = scale_columns(W_new)
    tol = cor_distance(W_new, W)
    return W_new, H, d, tol


def gcnmf(A, G, k: int, tol: float = 1e-4, maxit: int = 100,
          L1: float = 0.01, L2: float = 0.0, seed: int = 0,
          w_init=None, verbose: bool = False,
          gene_names=None, cell_names=None, mesh=None) -> NMFModel:
    """Fit graph-convolutional NMF. G is a (cells x cells) graph.

    Without ``mesh``: the single-chip dense solver (A and G densified on
    device — suitable up to ~50k cells on one chip, matching the
    reference's single-node scale). With ``mesh``: the sharded ELL engine
    — A and G stay sparse as cell-sharded blocked-ELL planes, scaling to
    the same cell counts as every other solver (the graph convolution adds
    one (cells, k) all_gather per half-update)."""
    enable_compilation_cache()
    if mesh is not None:
        from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

        if not sp.issparse(A):
            A = sp.csc_matrix(np.asarray(A, np.float32))
        if w_init is not None:
            w_init = np.asarray(w_init, np.float32)
            if w_init.shape == (k, A.shape[0]) and k != A.shape[0]:
                w_init = w_init.T
        eng = ShardedEllEngine(A, mesh=mesh)
        out = eng.gcnmf_fit(sp.csc_matrix(G), k, tol=tol, maxit=maxit,
                            L1=L1, L2=L2, seed=seed, w_init=w_init,
                            verbose=verbose)
        return _finalize(out["w"], out["d"], out["h"],
                         gene_names, cell_names)
    A = _coerce_dense(A)
    Gd = np.asarray(G.todense(), np.float32) if sp.issparse(G) else \
        np.asarray(G, np.float32)
    if Gd.shape != (A.shape[1], A.shape[1]):
        raise ValueError("G must be cells x cells")
    genes, cells = A.shape
    if w_init is None:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5117)
        W = jax.random.uniform(key, (genes, k), dtype=jnp.float32)
    else:
        W = jnp.asarray(w_init, jnp.float32)
        if W.shape == (k, genes):
            W = W.T
    Aj = jnp.asarray(A)
    Gj = jnp.asarray(Gd)
    H = jnp.zeros((cells, k), jnp.float32)
    tol_ = 1.0
    it = 0
    exact = jnp.bool_(False)   # adaptive-sweep exact-phase latch
    while it < maxit and tol_ > tol:
        cap, exact = sweep_cap_update(exact, jnp.float32(tol_),
                                      jnp.float32(tol))
        W, H, d, tol_j = _gcnmf_step(Aj, Gj, W, H, jnp.float32(L1),
                                     jnp.float32(L2), sweep_cap=cap)
        tol_ = float(tol_j)
        if verbose:
            print(f"{it + 1:4d} | {tol_:8.2e}")
        it += 1
    return _finalize(np.asarray(W), np.asarray(d), np.asarray(H).T,
                     gene_names, cell_names)


def differentiate_model(h: np.ndarray, G: sp.spmatrix) -> np.ndarray:
    """Signed per-edge differences of h across graph edges
    (reference:src/singlet.cpp:1733-1752): for each edge (col1 -> row) emit a
    2k-vector with positive diffs in the first k rows and negative diffs in
    the second k."""
    h = np.asarray(h)
    if h.shape[0] == G.shape[1] and h.shape[0] != h.shape[1]:
        h = h.T
    if h.shape[1] != G.shape[1]:
        raise ValueError("dimensions of 'h' and 'G' are not compatible")
    G = sp.csc_matrix(G)
    # Vectorized over all edges at once: CSC structure gives (col, row) per
    # nonzero; the signed split is exactly max(diff, 0) / max(-diff, 0).
    cols = np.repeat(np.arange(G.shape[1]), np.diff(G.indptr))
    diff = h[:, cols] - h[:, G.indices]
    return np.concatenate([np.maximum(diff, 0.0), np.maximum(-diff, 0.0)],
                          axis=0)


def assign_cells_to_edge_clusters(G: sp.spmatrix,
                                  edge_clusters: np.ndarray) -> np.ndarray:
    """Count, per cell, how many incident edges fall in each edge cluster
    (reference:src/singlet.cpp:1755-1768). edge_clusters: 0-based labels per
    edge in CSC order."""
    G = sp.csc_matrix(G)
    edge_clusters = np.asarray(edge_clusters)
    n_clusters = int(edge_clusters.max()) + 1
    out = np.zeros((n_clusters, G.shape[1]), np.int64)
    cols = np.repeat(np.arange(G.shape[1]), np.diff(G.indptr))
    np.add.at(out, (edge_clusters, cols), 1)
    return out
