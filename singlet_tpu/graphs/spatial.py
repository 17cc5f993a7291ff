"""Spatial graph kernels: radius graphs, local k-NN, shared-nearest-neighbor.

TPU-native equivalents of the reference's graph builders
(reference:src/singlet.cpp:1366-1665): instead of per-point scalar loops over
all pairs, distances are computed in (block x n) tiles — inner products on the
MXU for euclidean/cosine/jaccard, broadcast VPU reductions for manhattan/
hamming/KL — gated by the spatial radius, then top-k selected on device.
Results are returned as scipy CSC adjacency matrices (host graph objects).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from singlet_tpu.ops.linalg import MM_PRECISION


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def rescale_spatial(coords: np.ndarray, units: float = 1.0) -> np.ndarray:
    """Convert 0-1 normalized spatial coordinates to integer grid units
    (reference:R/RescaleSpatial.R:10-22): divide by the smallest nonzero
    coordinate spacing and round."""
    coords = np.asarray(coords, np.float64)
    out = np.empty_like(coords)
    for j in range(coords.shape[1]):
        c = coords[:, j]
        diffs = np.diff(np.unique(c))
        step = diffs[diffs > 0].min() if (diffs > 0).any() else 1.0
        out[:, j] = np.round(c / step * units)
    return out


@partial(jax.jit, static_argnames=("metric", "block"))
def _pairwise_block(M, coords, block_start, *, metric: str, block: int):
    """Distances from a block of points to all points.

    M: (features, n) column-major profiles; coords: (n, 2).
    Returns (dist (block, n), spatial_dist (block, n)).
    """
    Mb = jax.lax.dynamic_slice_in_dim(M, block_start, block, axis=1)  # (f, b)
    cb = jax.lax.dynamic_slice_in_dim(coords, block_start, block, axis=0)
    diff = cb[:, None, :] - coords[None, :, :]
    sdist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    if metric in ("euclidean",):
        x2 = jnp.sum(Mb * Mb, axis=0)[:, None]
        y2 = jnp.sum(M * M, axis=0)[None, :]
        xy = jnp.dot(Mb.T, M, precision=MM_PRECISION)
        d = jnp.sqrt(jnp.maximum(x2 + y2 - 2 * xy, 0.0))
    elif metric in ("cosine", "jaccard"):
        xy = jnp.dot(Mb.T, M, precision=MM_PRECISION)
        x2 = jnp.sum(Mb * Mb, axis=0)[:, None]
        y2 = jnp.sum(M * M, axis=0)[None, :]
        if metric == "cosine":
            d = 1.0 - xy / jnp.sqrt(jnp.maximum(x2 * y2, 1e-30))
        else:
            # continuous (Tanimoto) jaccard distance, reference:src/singlet.cpp:1427-1435
            d = 1.0 - xy / jnp.maximum(x2 + y2 - xy, 1e-30)
    elif metric == "manhattan":
        # reference takes sqrt of the L1 sum (reference:src/singlet.cpp:1446-1451)
        d = jnp.sqrt(jnp.sum(jnp.abs(Mb.T[:, None, :] - M.T[None, :, :]),
                             axis=-1))
    elif metric == "hamming":
        d = jnp.sum(Mb.T[:, None, :] != M.T[None, :, :], axis=-1).astype(
            jnp.float32)
    elif metric == "kl":
        # reference's KL-ish: sum(p) * log(sum(p/q)) over q != 0
        # (reference:src/singlet.cpp:1461-1469)
        q = M.T[None, :, :]
        ratio = jnp.where(q != 0, Mb.T[:, None, :] / q, 0.0)
        pdivq = jnp.sum(ratio, axis=-1)
        psum = jnp.sum(Mb.T, axis=-1)[:, None]
        d = psum * jnp.log(jnp.maximum(pdivq, 1e-30))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return d, sdist


def local_knn(M: np.ndarray, coord_x: np.ndarray, coord_y: np.ndarray,
              k: int, radius: float, metric: str = "jaccard",
              similarity: bool = True, max_dist: float = 0.0,
              block: int = 512, verbose: bool = False) -> sp.csc_matrix:
    """Local k-nearest-neighbor graph within a spatial radius
    (reference:src/singlet.cpp:1491-1603, ``c_LKNN``).

    M: (features, n) or (n, features); values = per-point profiles (e.g. h).
    For jaccard/cosine with ``similarity=False`` the reference stores
    1 - distance; we keep that rule. Returns an n x n CSC adjacency whose
    column j holds j's up-to-k selected neighbors.
    """
    M = np.asarray(M, np.float32)
    n = len(coord_x)
    if M.shape[1] != n:
        if M.shape[0] == n:
            M = M.T
        else:
            raise ValueError("number of columns in 'M' must equal number of "
                             "coordinates")
    coords = np.stack([np.asarray(coord_x, np.float32),
                       np.asarray(coord_y, np.float32)], axis=1)
    n_pad = _round_up(n, block)
    Mp = np.zeros((M.shape[0], n_pad), np.float32)
    Mp[:, :n] = M
    cp = np.full((n_pad, 2), 1e9, np.float32)
    cp[:n] = coords
    Mj = jnp.asarray(Mp)
    cj = jnp.asarray(cp)

    cols_i = []
    cols_x = []
    kk = min(k, n - 1)
    for start in range(0, n_pad, block):
        d, sdist = _pairwise_block(Mj, cj, start, metric=metric, block=block)
        d = np.asarray(d, np.float64)
        sdist = np.asarray(sdist)
        if metric in ("jaccard", "cosine") and not similarity:
            d = 1.0 - d
        for bi in range(block):
            p1 = start + bi
            if p1 >= n:
                break
            drow = d[bi, :n]
            ok = (sdist[bi, :n] <= radius)
            ok[p1] = False
            if max_dist != 0:
                ok &= drow <= max_dist
            idx = np.where(ok)[0]
            if idx.size > kk:
                sel = idx[np.argsort(drow[idx], kind="stable")[:kk]]
                sel = np.sort(sel)
            else:
                sel = idx
            cols_i.append(sel)
            cols_x.append(drow[sel])

    indptr = np.zeros(n + 1, np.int64)
    indptr[1:] = np.cumsum([len(c) for c in cols_i])
    indices = np.concatenate(cols_i) if cols_i else np.zeros(0, np.int64)
    data = np.concatenate(cols_x) if cols_x else np.zeros(0)
    G = sp.csc_matrix((data, indices, indptr), shape=(n, n))
    G.eliminate_zeros()
    if verbose:
        print(f"selected {G.nnz} edges")
    return G


def snn_graph(G: sp.spmatrix, min_similarity: float = 0.0,
              block: int = 1024) -> sp.csc_matrix:
    """Shared-nearest-neighbor Jaccard graph (reference:src/singlet.cpp:1606-1665,
    ``c_SNN``): similarity(i,j) = |N(i) ∩ N(j)| / |N(i) ∪ N(j)| over the
    neighbor index sets, 1 on the diagonal for non-empty columns, entries
    kept when > min_similarity.

    Intersections are computed as blocked 0/1 matmuls (MXU) instead of the
    reference's serial sorted-pointer walk (which it could not parallelize).
    """
    n = G.shape[1]
    B = sp.csc_matrix(G)
    pattern = sp.csc_matrix(
        (np.ones_like(B.data), B.indices, B.indptr), shape=B.shape)
    nnz = np.diff(pattern.indptr)
    n_pad = _round_up(n, block)
    Pdense = np.zeros((pattern.shape[0], n_pad), np.float32)
    Pdense[:, :n] = np.asarray(pattern.todense(), np.float32)
    Pd = jnp.asarray(Pdense)

    @partial(jax.jit, static_argnames=("blk",))
    def inter_block(Pd, start, blk):
        Pb = jax.lax.dynamic_slice_in_dim(Pd, start, blk, axis=1)
        return jnp.dot(Pb.T, Pd, precision=MM_PRECISION)

    cols_i, cols_x, indptr = [], [], [0]
    for start in range(0, n_pad, block):
        blk = min(block, n_pad - start)
        inter = np.asarray(inter_block(Pd, start, blk))[:, :n]
        for bi in range(blk):
            i = start + bi
            if i >= n:
                break
            if nnz[i] == 0:
                indptr.append(indptr[-1])
                continue
            union = nnz[i] + nnz - inter[bi]
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = np.where(union > 0, inter[bi] / union, 0.0)
            sim[nnz == 0] = 0.0
            keep = sim > min_similarity
            keep[i] = False
            js = np.where(keep)[0]
            vals = sim[js]
            # diagonal 1 inserted in index order
            pos = np.searchsorted(js, i)
            js = np.insert(js, pos, i)
            vals = np.insert(vals, pos, 1.0)
            cols_i.append(js)
            cols_x.append(vals)
            indptr.append(indptr[-1] + len(js))
    indices = np.concatenate(cols_i) if cols_i else np.zeros(0, np.int64)
    data = np.concatenate(cols_x) if cols_x else np.zeros(0)
    return sp.csc_matrix((data, indices, np.asarray(indptr)), shape=(n, n))


def spatial_graph(c1: np.ndarray, c2: np.ndarray, max_dist: float,
                  max_k: int = 100, block: int = 1024) -> sp.csc_matrix:
    """Radius-weighted ε-graph (reference:src/singlet.cpp:1366-1414): edge
    weight (max_dist - d)/max_dist for d < max_dist, at most max_k neighbors
    per point taken in index order, columns normalized to sum to 1."""
    coords = np.stack([np.asarray(c1, np.float64),
                       np.asarray(c2, np.float64)], axis=1)
    n = coords.shape[0]
    scale = 1.0 / max_dist
    cols_i, cols_x, indptr = [], [], [0]
    for start in range(0, n, block):
        blk = min(block, n - start)
        diff = coords[start:start + blk, None, :] - coords[None, :, :]
        d = np.sqrt((diff ** 2).sum(-1))
        for bi in range(blk):
            within = np.where(d[bi] < max_dist)[0][:max_k]
            w = (max_dist - d[bi, within]) * scale
            s = w.sum()
            if s > 0:
                w = w / s
            cols_i.append(within)
            cols_x.append(w)
            indptr.append(indptr[-1] + len(within))
    return sp.csc_matrix(
        (np.concatenate(cols_x), np.concatenate(cols_i), np.asarray(indptr)),
        shape=(n, n))
