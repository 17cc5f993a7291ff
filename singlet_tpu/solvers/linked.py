"""Linked NMF — batch integration by factor-sample linking.

Equivalent of ``run_linked_nmf`` (reference:R/RunLNMF.R:18-66) over
``c_linked_nmf`` (reference:src/singlet.cpp:1059-1086): an ALS loop where the
NNLS right-hand side of a column is elementwise-multiplied by a 0/1 link
vector before the solve, zeroing unlinked factors for that sample. Factors
whose link is 0 decay to 0 under the L1 clamp, splitting the model into
shared and group-unique factors.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from singlet_tpu.model import NMFModel
from singlet_tpu.solvers.als import nmf_fit
from singlet_tpu.solvers.drivers import _engine_or_providers, _finalize
from singlet_tpu.utils import enable_compilation_cache


def _shape_of(P) -> tuple:
    """(genes, cells) of a matrix, provider pair, or sharded engine."""
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    if isinstance(P, ShardedEllEngine):
        return P.rows_true, P.cols_true
    Ap, _ = P
    return Ap.rows_true, Ap.cols_true


def run_linked_nmf(
    A,
    w: np.ndarray,
    link_h: Optional[np.ndarray] = None,
    link_w: Optional[np.ndarray] = None,
    tol: float = 1e-4,
    maxit: int = 100,
    verbose: bool = True,
    L1: float = 0.01,
    L2: float = 0.0,
    gene_names=None,
    cell_names=None,
    mesh=None,
) -> NMFModel:
    """Linked NMF initialized from an existing model's w (genes x k).

    link_h: (k, cells) 0/1 linking of factors to samples (reference
    orientation); link_w: (genes, k) linking of factors to features.

    ``A`` may be dense, scipy sparse (stays in ELL storage at scale — never
    densified), a chunk list / staged directory, or a prebuilt
    :class:`~singlet_tpu.parallel.sharded_ell.ShardedEllEngine`; with
    ``mesh`` the fit runs cell-sharded on the multi-chip sparse engine
    (reference ``c_linked_nmf`` runs on its sparse iterators,
    reference:src/singlet.cpp:1059-1086).
    """
    if link_h is None and link_w is None:
        raise ValueError(
            "both link_h and link_w cannot be None. Specify at least one "
            "linking matrix.")
    if L1 >= 1:
        raise ValueError("L1 penalty must be strictly in the range [0, 1)")
    enable_compilation_cache()
    P = _engine_or_providers(A, mesh)
    genes, cells = _shape_of(P)
    w = np.asarray(w, np.float32)
    if w.shape[0] != genes:
        raise ValueError("number of rows in 'w' must equal the number of "
                         "rows in 'A'")
    k = w.shape[1]
    if link_h is not None:
        link_h = np.asarray(link_h, np.float32)
        if link_h.shape[0] != k:
            raise ValueError("number of rows in 'link_h' must equal the "
                             "number of columns in 'w'")
        if link_h.shape[1] != cells:
            raise ValueError("number of columns in 'link_h' must equal the "
                             "number of columns in 'A'")
        link_h = link_h.T          # solver layout: (cells, k)
    if link_w is not None:
        link_w = np.asarray(link_w, np.float32)
        if link_w.shape != (genes, k):
            raise ValueError("'link_w' must have shape (nrow(A), k)")

    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    if isinstance(P, ShardedEllEngine):
        out = P.fit(k, tol=tol, maxit=maxit, L1=L1, L2=L2,
                    verbose=bool(verbose), w_init=w,
                    link_h=link_h, link_w=link_w)
        model = _finalize(out["w"], out["d"], out["h"], gene_names,
                          cell_names)
    else:
        Ap, Atp = P
        res = nmf_fit(Ap, k, At=Atp, w_init=w, tol=tol, maxit=maxit, L1=L1,
                      L2=L2, verbose=verbose, link_h=link_h, link_w=link_w)
        model = _finalize(res.w, res.d, res.h, gene_names, cell_names)
    model.misc["link_matrix"] = None if link_h is None else link_h.T
    return model


def build_link_matrix(embeddings: np.ndarray, groups, link_cutoff: float = 0.5):
    """Construct the (k, cells) link_h matrix from a fitted model.

    Reproduces the RunLNMF link rule (reference:R/RunLNMF.R:134-154): compute
    the mean embedding weight of each group per factor, row-normalize and
    scale by the number of groups; where a group's relative contribution to a
    factor falls below ``link_cutoff``, unlink that group's samples from the
    factor.

    Args:
      embeddings: (cells, k) cell embeddings (h^T).
      groups: length-cells array of group labels.
    Returns:
      (link_h (k, cells) float 0/1, unlink (k, n_groups) bool, levels)
    """
    embeddings = np.asarray(embeddings)
    groups = np.asarray(groups)
    levels = list(dict.fromkeys(groups.tolist()))  # unique, appearance order
    k = embeddings.shape[1]
    m = np.zeros((k, len(levels)))
    for li, level in enumerate(levels):
        sel = groups == level
        m[:, li] = embeddings[sel, :].mean(axis=0)
    rel = m / m.sum(axis=1, keepdims=True) * len(levels)
    unlink = rel < link_cutoff
    link_h = np.ones((k, embeddings.shape[0]), np.float32)
    for fi in range(k):
        for li, level in enumerate(levels):
            if unlink[fi, li]:
                link_h[fi, groups == level] = 0.0
    return link_h, unlink, levels
