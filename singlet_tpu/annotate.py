"""Factor annotation: one-vs-all means models with moderated t statistics.

Equivalent of the reference's ``AnnotateNMF`` stack
(reference:R/AnnotateNMF.R:29-113, getModelMatrix.R:46-84, getModelFit.R:23-62,
getModelResults.R:27-56): for each categorical metadata column, build a
one-vs-all means-model design (``~ 0 + group``), fit row-wise least squares of
the (centered) factor embedding matrix h on it, shrink residual variances by
empirical Bayes (Smyth 2004 closed forms: fitFDist moment estimator +
squeezeVar), and report per-(factor, group) log-odds (lods/B statistic),
one-tailed moderated-t p-values and BH-FDR.

Deviation from the reference noted: limma is called there with
``robust=TRUE`` (outlier-robust hyperparameter fitting); we implement the
standard (non-robust) empirical Bayes closed forms — with k factors as "genes"
the hyperparameters are estimated from only k observations and the difference
is negligible for ranking.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
from scipy import special, stats


# ---------------------------------------------------------------------------
# design construction
# ---------------------------------------------------------------------------

def is_factor_like(col: np.ndarray, max_levels: int = 200) -> bool:
    """A column usable for annotation: categorical with 2..max_levels levels
    (reference:R/checkColumns.R)."""
    vals = [v for v in col if v is not None and v == v]
    if len(vals) == 0:
        return False
    if isinstance(vals[0], (int, np.integer, float, np.floating)) and not isinstance(
            vals[0], (bool, np.bool_)):
        return False  # numeric columns are not factors
    levels = set(vals)
    return 1 < len(levels) <= max_levels


def check_columns(meta: Dict[str, np.ndarray], columns: Optional[Sequence[str]],
                  max_levels: int = 200) -> List[str]:
    cols = list(columns) if columns is not None else list(meta.keys())
    return [c for c in cols if c in meta and
            is_factor_like(np.asarray(meta[c], dtype=object), max_levels)]


def model_matrix(groups: np.ndarray):
    """One-vs-all means model: indicator column per level, no intercept
    (reference:R/getModelMatrix.R:46-84 with ova=TRUE). Rows with missing
    values are dropped (limma drops NA design rows).

    Returns (design (n_kept, n_levels), level names, kept row indices)."""
    groups = np.asarray(groups, dtype=object)
    keep = np.array([g is not None and g == g for g in groups])
    kept = np.where(keep)[0]
    vals = groups[kept]
    levels = sorted(set(vals.tolist()), key=str)
    X = np.zeros((len(kept), len(levels)))
    for j, lv in enumerate(levels):
        X[np.asarray([v == lv for v in vals]), j] = 1.0
    return X, [str(lv) for lv in levels], kept


# ---------------------------------------------------------------------------
# row-wise least squares + empirical Bayes (limma semantics)
# ---------------------------------------------------------------------------

def lm_fit(data: np.ndarray, design: np.ndarray):
    """Row-wise OLS of data (rows x samples) on design (samples x coefs).

    Returns dict with coefficients, stdev_unscaled, sigma2, df_residual.
    """
    X = np.asarray(design, np.float64)
    Y = np.asarray(data, np.float64)
    n, p = X.shape
    XtX = X.T @ X
    XtX_inv = np.linalg.pinv(XtX)
    coef = Y @ X @ XtX_inv.T                      # (rows, p)
    resid = Y - coef @ X.T
    df_resid = n - np.linalg.matrix_rank(X)
    sigma2 = np.sum(resid ** 2, axis=1) / max(df_resid, 1)
    stdev_unscaled = np.sqrt(np.maximum(np.diag(XtX_inv), 0.0))[None, :]
    return dict(coefficients=coef,
                stdev_unscaled=np.broadcast_to(stdev_unscaled, coef.shape),
                sigma2=sigma2, df_residual=df_resid)


def trigamma_inverse(y: float) -> float:
    """Solve trigamma(x) = y (limma::trigammaInverse, Newton iteration)."""
    if y <= 0:
        return math.inf
    if y > 1e7:
        return 1.0 / math.sqrt(y)
    if y < 1e-6:
        return 1.0 / y
    x = 0.5 + 1.0 / y
    for _ in range(50):
        tri = float(special.polygamma(1, x))
        dif = tri * (1.0 - tri / y) / float(special.polygamma(2, x))
        x = x + dif
        if abs(dif) / x < 1e-8:
            break
    return x


def fit_f_dist(s2: np.ndarray, df1: float):
    """Moment estimator of the scaled-F prior (limma::fitFDist):
    s2 ~ s0^2 * F(df1, df0). Returns (s0^2, df0)."""
    s2 = np.asarray(s2, np.float64)
    ok = s2 > 0
    if ok.sum() == 0:
        return np.nan, np.nan
    z = np.log(s2[ok])
    e = z - special.digamma(df1 / 2) + math.log(df1 / 2)
    emean = e.mean()
    n = e.size
    if n > 1:
        evar = e.var(ddof=1) - float(special.polygamma(1, df1 / 2))
    else:
        evar = 0.0
    if evar > 0:
        df0 = 2 * trigamma_inverse(evar)
        s20 = math.exp(emean + special.digamma(df0 / 2) - math.log(df0 / 2))
    else:
        df0 = math.inf
        s20 = math.exp(emean)
    return s20, df0


def squeeze_var(sigma2: np.ndarray, df: float):
    s20, df0 = fit_f_dist(sigma2, df)
    if math.isinf(df0):
        s2_post = np.full_like(sigma2, s20)
    else:
        s2_post = (df0 * s20 + df * sigma2) / (df0 + df)
    return s2_post, s20, df0


def _tmixture_vector(tstat, stdev_unscaled, df, proportion, v0_lim):
    """limma::tmixture.vector — estimate the prior coefficient variance from
    the top `proportion` of t statistics."""
    tstat = np.abs(np.asarray(tstat, np.float64))
    n = tstat.size
    ntarget = math.ceil(proportion / 2 * n)
    if ntarget < 1:
        return np.nan
    p = max(ntarget / n, proportion)
    order = np.argsort(-tstat)[:ntarget]
    tt = tstat[order]
    v1 = np.asarray(stdev_unscaled, np.float64)[order] ** 2
    r = np.arange(1, ntarget + 1)
    p0 = 2 * stats.t.sf(tt, df)
    ptarget = ((r - 0.5) / n - (1.0 - p) * p0) / p
    v0 = np.zeros(ntarget)
    pos = ptarget > p0
    if pos.any():
        qtarget = stats.t.isf(ptarget[pos] / 2, df)
        v0[pos] = v1[pos] * ((tt[pos] / qtarget) ** 2 - 1.0)
    v0 = np.clip(v0, v0_lim[0], v0_lim[1])
    return float(np.mean(v0))


def ebayes(fit: dict, proportion: float = 0.01,
           stdev_coef_lim=(0.1, 4.0)) -> dict:
    """Empirical-Bayes moderation (limma::eBayes essentials): squeezed
    variances, moderated t, and the lods/B statistic."""
    coef = fit["coefficients"]
    su = fit["stdev_unscaled"]
    df = fit["df_residual"]
    s2_post, s20, df0 = squeeze_var(fit["sigma2"], df)
    df_total = df + df0
    df_pooled = df * coef.shape[0]
    df_total = min(df_total, df_pooled) if not math.isinf(df_total) else df_pooled
    t = coef / (su * np.sqrt(s2_post)[:, None])

    # lods per coefficient column
    v0_lim = (stdev_coef_lim[0] ** 2 / float(np.median(s2_post)),
              stdev_coef_lim[1] ** 2 / float(np.median(s2_post)))
    lods = np.empty_like(t)
    for j in range(t.shape[1]):
        v0 = _tmixture_vector(t[:, j], su[:, j], df_total, proportion, v0_lim)
        if not np.isfinite(v0) or v0 < 0:
            v0 = 0.0
        v1 = su[:, j] ** 2
        r = (v1 + v0) / v1
        t2 = t[:, j] ** 2
        if df_total > 1e6:
            kernel = t2 * (1 - 1 / r) / 2
        else:
            kernel = (1 + df_total) / 2 * np.log(
                (t2 + df_total) / (t2 / r + df_total))
        lods[:, j] = math.log(proportion / (1 - proportion)) - np.log(r) / 2 + kernel

    return dict(t=t, lods=lods, s2_post=s2_post, df_total=df_total,
                coefficients=coef, s2_prior=s20, df_prior=df0)


def bh_fdr(p: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg step-up adjustment (R p.adjust method='fdr')."""
    p = np.asarray(p, np.float64)
    n = p.size
    order = np.argsort(p)
    ranked = p[order] * n / np.arange(1, n + 1)
    ranked = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(n)
    out[order] = np.minimum(ranked, 1.0)
    return out


# ---------------------------------------------------------------------------
# public driver
# ---------------------------------------------------------------------------

def model_results(eb: dict, factor_names: Sequence[str],
                  group_names: Sequence[str], tail: str = "pos",
                  noneg: bool = True) -> pd.DataFrame:
    """Tidy per-(factor, group) results (reference:R/getModelResults.R:27-56):
    one-tailed moderated-t p-values, BH FDR, positive-lods filter."""
    t = eb["t"]
    lods = eb["lods"]
    df_total = eb["df_total"]
    rows = []
    for fi, fname in enumerate(factor_names):
        for gi, gname in enumerate(group_names):
            rows.append((gname, fname, lods[fi, gi], t[fi, gi]))
    df = pd.DataFrame(rows, columns=["group", "factor", "fc", "t"])
    if tail == "pos":
        df["p_raw"] = stats.t.sf(df["t"], df_total)
    elif tail == "neg":
        df["p_raw"] = stats.t.cdf(df["t"], df_total)
    elif tail == "std":
        df["p_raw"] = 2 * stats.t.sf(np.abs(df["t"]), df_total)
    else:
        raise ValueError("Invalid tail selection. Choose 'pos','neg', or 'std'")
    df["p"] = bh_fdr(df["p_raw"].to_numpy())
    if noneg:
        df = df[df["fc"] > 0]
    return df[["group", "factor", "fc", "p"]].reset_index(drop=True)


def annotate_nmf(model, meta: Dict[str, np.ndarray],
                 columns: Optional[Sequence[str]] = None,
                 center: bool = True, scale: bool = False,
                 max_levels: int = 200, tail: str = "pos",
                 annotation_name: str = "annotations"):
    """Annotate an NMFModel's factors against categorical metadata.

    Stores {column: DataFrame(group, factor, fc, p)} in
    ``model.misc[annotation_name]`` and returns it.
    """
    cols = check_columns(meta, columns, max_levels)
    h = np.asarray(model.h, np.float64)          # (k, cells)
    results = {}
    for col in cols:
        X, levels, kept = model_matrix(np.asarray(meta[col], dtype=object))
        dat = h[:, kept]
        if center:
            mu = dat.mean(axis=1, keepdims=True)
            dat = dat - mu
            if scale:
                sd = dat.std(axis=1, ddof=1, keepdims=True)
                sd[sd == 0] = 1.0
                dat = dat / sd
        fit = lm_fit(dat, X)
        eb = ebayes(fit)
        results[col] = model_results(eb, model.factor_names, levels, tail=tail)
    model.misc[annotation_name] = results
    return results
