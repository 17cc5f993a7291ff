"""Annotation engine tests: design construction, OLS, eBayes moderation,
and end-to-end factor-group association recovery."""

import numpy as np
import pandas as pd

from singlet_tpu.annotate import (
    annotate_nmf,
    bh_fdr,
    check_columns,
    ebayes,
    lm_fit,
    model_matrix,
    model_results,
    squeeze_var,
)
from singlet_tpu.model import NMFModel


def test_model_matrix_one_vs_all():
    groups = np.array(["b", "a", "b", None, "c"], dtype=object)
    X, levels, kept = model_matrix(groups)
    assert levels == ["a", "b", "c"]
    assert list(kept) == [0, 1, 2, 4]
    np.testing.assert_array_equal(X.sum(axis=1), 1.0)  # disjoint indicators
    np.testing.assert_array_equal(X[:, 1], [1, 0, 1, 0])


def test_check_columns_filters():
    meta = {
        "ok": np.array(["a", "b", "a"], dtype=object),
        "numeric": np.array([1.0, 2.0, 3.0]),
        "single": np.array(["x", "x", "x"], dtype=object),
    }
    assert check_columns(meta, None) == ["ok"]


def test_lm_fit_means_model_recovers_group_means(rng):
    groups = np.repeat(["a", "b", "c"], 10)
    X, levels, kept = model_matrix(groups)
    data = rng.normal(size=(4, 30))
    data[0, :10] += 5.0  # row 0 strongly up in group a
    fit = lm_fit(data, X)
    np.testing.assert_allclose(fit["coefficients"][0, 0], data[0, :10].mean(),
                               rtol=1e-10)
    assert fit["df_residual"] == 27
    # stdev.unscaled for a group mean = 1/sqrt(n_group)
    np.testing.assert_allclose(fit["stdev_unscaled"][0],
                               [1 / np.sqrt(10)] * 3, rtol=1e-10)


def test_ebayes_moderation_shrinks_towards_prior(rng):
    groups = np.repeat(["a", "b"], 8)
    X, _, _ = model_matrix(groups)
    data = rng.normal(size=(30, 16))
    fit = lm_fit(data, X)
    eb = ebayes(fit)
    s2 = fit["sigma2"]
    s2p = eb["s2_post"]
    # posterior variances are pulled towards the prior: reduced spread
    assert s2p.std() < s2.std()
    assert eb["df_total"] > fit["df_residual"]


def test_squeeze_var_handles_constant():
    # constant sample variances -> infinite prior df; prior scale carries the
    # chi-square log-moment correction exp(log(df/2) - digamma(df/2))
    from scipy.special import digamma
    s2 = np.full(10, 2.0)
    s2p, s20, df0 = squeeze_var(s2, df=5)
    assert np.isinf(df0)
    want = 2.0 * np.exp(np.log(2.5) - digamma(2.5))
    np.testing.assert_allclose(s2p, want, rtol=1e-6)


def test_bh_fdr_matches_known():
    p = np.array([0.01, 0.02, 0.03, 0.5])
    out = bh_fdr(p)
    np.testing.assert_allclose(out, [0.04, 0.04, 0.04, 0.5])


def test_annotate_recovers_planted_association(rng):
    # h: factor 0 loads on cells of type "T", factor 1 on "B"
    k, cells = 3, 60
    types = np.array(["T"] * 20 + ["B"] * 20 + ["NK"] * 20, dtype=object)
    h = rng.random((k, cells)) * 0.1
    h[0, types == "T"] += 1.0
    h[1, types == "B"] += 1.0
    model = NMFModel(w=rng.random((10, k)), d=np.ones(k), h=h)
    res = annotate_nmf(model, {"cell_type": types})
    df = res["cell_type"]
    assert set(df.columns) == {"group", "factor", "fc", "p"}
    top_T = df[df["group"] == "T"].sort_values("p").iloc[0]
    top_B = df[df["group"] == "B"].sort_values("p").iloc[0]
    assert top_T["factor"] == "NMF_1" and top_T["p"] < 1e-4
    assert top_B["factor"] == "NMF_2" and top_B["p"] < 1e-4
    assert "annotations" in model.misc


def test_robust_ebayes_resists_outlier_variances(rng):
    """The robust prior fit (limma robust=TRUE analogue) must keep the
    prior scale anchored to the bulk when a few rows have wildly inflated
    variances, and give those outlier rows near-zero prior df (their own
    variance survives the squeeze)."""
    from singlet_tpu.annotate import fit_f_dist, fit_f_dist_robust

    df1 = 20.0
    bulk = rng.chisquare(int(df1), 60) / df1 * 2.0   # s2 ~ 2.0 * chi2/df
    spiked = np.concatenate([bulk, [400.0, 900.0]])  # two huge outliers
    s20_plain, df0_plain = fit_f_dist(spiked, df1)
    s20_rob, df0_rob, df0_rows = fit_f_dist_robust(spiked, df1)
    s20_clean, _ = fit_f_dist(bulk, df1)
    # robust scale stays near the clean-bulk estimate; classic fit degrades
    assert abs(np.log(s20_rob / s20_clean)) < abs(np.log(s20_plain / s20_clean)) + 1e-12
    assert 0.5 < s20_rob / s20_clean < 2.0
    # outlier rows lose their prior df (own variance survives the squeeze);
    # bulk rows keep a large prior df
    assert df0_rows[-1] < 1e-3 and df0_rows[-2] < 1e-3
    assert np.median(df0_rows[:-2]) > 100.0


def test_annotate_robust_flag_paths(rng):
    k, cells = 4, 45
    types = np.array(["T"] * 15 + ["B"] * 15 + ["NK"] * 15, dtype=object)
    h = rng.random((k, cells)) * 0.1
    h[0, types == "T"] += 1.0
    h[3] += rng.normal(0, 5.0, cells)   # hypervariable factor (outlier row)
    h = np.abs(h)
    model = NMFModel(w=rng.random((10, k)), d=np.ones(k), h=h)
    res_r = annotate_nmf(model, {"ct": types}, robust=True,
                         annotation_name="a_r")
    res_p = annotate_nmf(model, {"ct": types}, robust=False,
                         annotation_name="a_p")
    for res in (res_r, res_p):
        df = res["ct"]
        top_T = df[df["group"] == "T"].sort_values("p").iloc[0]
        assert top_T["factor"] == "NMF_1" and top_T["p"] < 1e-3


# ---------------------------------------------------------------------------
# Golden-value fixtures (VERDICT r2). No R toolchain exists in this image,
# so the gold standard is (a) an INDEPENDENT reimplementation of the Smyth
# 2004 closed forms in this test — different solver (lstsq vs pinv; brentq
# on trigamma vs Newton trigammaInverse) — and (b) frozen end-to-end numeric
# outputs on a deterministic dataset (regression against silent drift).
# ---------------------------------------------------------------------------

def _gold_dataset():
    rng = np.random.default_rng(42)
    k, n = 12, 30
    groups = np.array(["A"] * 10 + ["B"] * 10 + ["C"] * 10, dtype=object)
    h = rng.normal(size=(k, n))
    h[0, :10] += 2.0
    h[3, 20:] += 1.5
    dat = h - h.mean(axis=1, keepdims=True)
    return dat, groups


def test_ebayes_matches_independent_formulas():
    """Non-robust eBayes == a from-the-paper reimplementation built with
    different numerics (per-row lstsq; fitFDist solved by brentq on the
    trigamma equation instead of Newton iteration)."""
    from scipy import optimize, special

    dat, groups = _gold_dataset()
    X, levels, kept = model_matrix(groups)
    k, n = dat.shape
    fit = lm_fit(dat, X)
    eb = ebayes(fit, robust=False)

    coef_i = np.stack([np.linalg.lstsq(X, dat[i], rcond=None)[0]
                       for i in range(k)])
    resid = dat - coef_i @ X.T
    dfr = n - np.linalg.matrix_rank(X)
    s2 = (resid ** 2).sum(axis=1) / dfr
    z = np.log(s2)
    e = z - special.digamma(dfr / 2) + np.log(dfr / 2)
    evar = e.var(ddof=1) - special.polygamma(1, dfr / 2)
    x = optimize.brentq(lambda v: special.polygamma(1, v) - evar, 1e-6, 1e8)
    df0_i = 2 * x
    s20_i = np.exp(e.mean() + special.digamma(x) - np.log(x))
    s2post_i = (df0_i * s20_i + dfr * s2) / (df0_i + dfr)
    su = np.sqrt(np.diag(np.linalg.pinv(X.T @ X)))
    t_i = coef_i / (su[None, :] * np.sqrt(s2post_i)[:, None])

    np.testing.assert_allclose(fit["coefficients"], coef_i, atol=1e-10)
    np.testing.assert_allclose(fit["sigma2"], s2, rtol=1e-12)
    np.testing.assert_allclose(eb["df_prior"], df0_i, rtol=1e-10)
    np.testing.assert_allclose(eb["s2_prior"], s20_i, rtol=1e-10)
    np.testing.assert_allclose(eb["s2_post"], s2post_i, rtol=1e-10)
    np.testing.assert_allclose(eb["t"], t_i, rtol=1e-6)


def test_ebayes_frozen_regression_values():
    """Frozen outputs on the deterministic dataset (values frozen
    2026-08-19, round 3) — catches silent formula drift in lmFit /
    fitFDist / squeezeVar / moderated-t / lods / the robust prior fit."""
    dat, groups = _gold_dataset()
    X, levels, _ = model_matrix(groups)
    fit = lm_fit(dat, X)

    eb = ebayes(fit, robust=False)
    np.testing.assert_allclose(eb["df_prior"], 115.97794134529025, rtol=1e-9)
    np.testing.assert_allclose(eb["s2_prior"], 0.911748328821201, rtol=1e-9)
    np.testing.assert_allclose(
        eb["t"][0], [3.368395254532648, -1.4208228890567594,
                     -1.9475723654758865], rtol=1e-9)
    np.testing.assert_allclose(
        eb["t"][3], [-2.7707466572988477, -1.4570183808940642,
                     4.227765038192913], rtol=1e-9)
    np.testing.assert_allclose(
        eb["lods"][0], [-0.920159170248076, -4.54855356405904,
                        -4.591024127071327], rtol=1e-8)
    np.testing.assert_allclose(
        eb["s2_post"][:4], [0.848097520585397, 0.8661870029577449,
                            0.8338090584492676, 0.8738066393516021],
        rtol=1e-9)

    ebr = ebayes(fit, robust=True)
    np.testing.assert_allclose(
        ebr["t"][0], [3.4436697136708534, -1.452574410604301,
                      -1.9910953030665506], rtol=1e-9)
    np.testing.assert_allclose(ebr["s2_prior"], 0.9123461110154631,
                               rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ebr["df_prior"])[:5],
        [63.33679341527092, 63.33679341527092, 63.26771780836071,
         63.33679341527092, 63.33679341527092], rtol=1e-8)

    res = model_results(ebr, [f"NMF_{i+1}" for i in range(dat.shape[0])],
                        levels)
    top = res.iloc[0]
    assert top["group"] == "C" and top["factor"] == "NMF_4"
    np.testing.assert_allclose(top["fc"], 1.7666630614742136, rtol=1e-9)
    np.testing.assert_allclose(top["p"], 0.0008318551373934803, rtol=1e-8)
