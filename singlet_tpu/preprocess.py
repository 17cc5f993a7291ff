"""Preprocessing: log-normalization, group reweighting, rasterization, normit.

Equivalents of ``PreprocessData`` (reference:R/PreprocessData.R:12-65, i.e.
Seurat::LogNormalize with scale.factor 1e4), ``weight_by_split``
(reference:src/singlet.cpp:119-144), ``rowwise_compress``
(reference:src/singlet.cpp:147-180) and ``normit`` (reference:R/normit.R:22-28).
All operate on scipy sparse or numpy arrays on host — ingest-time transforms,
not hot-path kernels.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def log_normalize(counts, scale_factor: float = 1e4):
    """Seurat LogNormalize: per-cell unit normalization * scale_factor, then
    log1p. counts: genes x cells (sparse or dense). Returns same format."""
    if sp.issparse(counts):
        m = counts.tocsc().astype(np.float32, copy=True)
        colsums = np.asarray(m.sum(axis=0)).ravel()
        colsums[colsums == 0] = 1.0
        scale = (scale_factor / colsums).astype(np.float32)
        m = m.multiply(sp.csr_matrix(scale[None, :])).tocsc()
        m.data = np.log1p(m.data)
        return m
    m = np.asarray(counts, np.float32)
    colsums = m.sum(axis=0)
    colsums[colsums == 0] = 1.0
    return np.log1p(m * (scale_factor / colsums)[None, :])


def looks_like_counts(A) -> bool:
    """The reference's raw-counts heuristic: all values integral
    (reference:R/RunNMF.R:66-69)."""
    v = A.data if sp.issparse(A) else np.asarray(A).ravel()
    return bool(np.sum(v.astype(np.int64)) == np.sum(v))


def weight_by_split(A, split_by, n_groups: int | None = None):
    """Scale each group's columns so every group sums to the first group's
    total (equal contribution to the objective)
    (reference:src/singlet.cpp:119-144).

    split_by: integer group codes (0-based) per column.
    """
    split_by = np.asarray(split_by)
    if split_by.dtype.kind not in "iu":
        _, split_by = np.unique(split_by, return_inverse=True)
    n_groups = n_groups or int(split_by.max()) + 1
    dense = not sp.issparse(A)
    m = np.asarray(A, np.float32) if dense else A.tocsc().astype(np.float32)
    colsum = m.sum(axis=0) if dense else np.asarray(m.sum(axis=0)).ravel()
    sums = np.zeros(n_groups)
    for g in range(n_groups):
        sums[g] = colsum[split_by == g].sum()
    # factor relative to group 0; group 0 unchanged
    factor = np.ones(n_groups)
    factor[1:] = sums[1:] / sums[0]
    colscale = np.ones(m.shape[1], np.float32)
    for g in range(1, n_groups):
        colscale[split_by == g] = 1.0 / factor[g]
    if dense:
        return m * colscale[None, :]
    return m.multiply(sp.csr_matrix(colscale[None, :])).tocsc()


def rasterize_rowwise(A, n: int = 10):
    """Mean-pool every n rows (genomics binning),
    (reference:src/singlet.cpp:147-180). Returns dense (floor(rows/n) x cols);
    trailing rows beyond the last full bin are folded into binning by floor
    division exactly like the reference (row // n, rows with row//n >= n_out
    dropped)."""
    dense = not sp.issparse(A)
    rows = A.shape[0]
    n_out = rows // n
    if dense:
        m = np.asarray(A, np.float64)
        out = np.zeros((n_out, m.shape[1]))
        for r in range(rows):
            b = r // n
            if b < n_out:
                out[b] += m[r]
        return out / n
    m = A.tocoo()
    out = np.zeros((n_out, A.shape[1]))
    b = m.row // n
    keep = b < n_out
    np.add.at(out, (b[keep], m.col[keep]), m.data[keep])
    return out / n


def normit(x):
    """Rank -> Gaussian-quantile transform (reference:R/normit.R:22-28):
    ``qnorm((rank(x) - 0.5) / n_unique)`` with average ties, NaNs passed
    through."""
    from scipy.stats import norm, rankdata

    x = np.asarray(x, np.float64).copy()
    flat = x.ravel()
    ok = ~np.isnan(flat)
    vals = flat[ok]
    n_unique = np.unique(vals).size
    ranks = rankdata(vals, method="average")
    flat[ok] = norm.ppf((ranks - 0.5) / n_unique)
    return flat.reshape(x.shape)
