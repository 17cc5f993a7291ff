"""GSEA engine tests: ES statistic correctness and planted-signal recovery."""

import numpy as np
import pandas as pd

from singlet_tpu.gsea import _es_single, fgsea_simple, run_gsea
from singlet_tpu.model import NMFModel


def _brute_force_es(stats_sorted_desc, hit_mask, score_type="std"):
    """O(n) textbook running-sum ES for validation."""
    absstats = np.abs(stats_sorted_desc)
    NR = absstats[hit_mask].sum()
    n = stats_sorted_desc.size
    s = hit_mask.sum()
    running = 0.0
    pos_ext, neg_ext = -np.inf, np.inf
    for i in range(n):
        if hit_mask[i]:
            running += absstats[i] / NR
        else:
            running -= 1.0 / (n - s)
        pos_ext = max(pos_ext, running)
        neg_ext = min(neg_ext, running)
    if score_type == "pos":
        return pos_ext
    return pos_ext if pos_ext > -neg_ext else neg_ext


def test_es_matches_brute_force(rng):
    for trial in range(10):
        n = 50
        stats = np.sort(rng.normal(size=n))[::-1]
        hit = np.zeros(n, bool)
        hit[rng.choice(n, size=8, replace=False)] = True
        got = _es_single(hit, np.abs(stats), "std")
        want = _brute_force_es(stats, hit, "std")
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
        got_pos = _es_single(hit, np.abs(stats), "pos")
        want_pos = _brute_force_es(stats, hit, "pos")
        np.testing.assert_allclose(got_pos, want_pos, rtol=1e-10, atol=1e-12)


def test_fgsea_detects_enriched_set(rng):
    genes = [f"g{i}" for i in range(300)]
    vals = rng.random(300) * 0.1
    enriched = genes[:20]
    vals[:20] += 2.0  # top-ranked block
    ranks = pd.Series(vals, index=genes)
    pathways = {
        "ENRICHED": enriched,
        "RANDOM": list(rng.choice(genes, 25, replace=False)),
    }
    df = fgsea_simple(ranks, pathways, min_size=10, max_size=100, nperm=500,
                      score_type="pos", seed=1)
    df = df.set_index("pathway")
    assert df.loc["ENRICHED", "pval"] < 0.01
    assert df.loc["ENRICHED", "ES"] > df.loc["RANDOM", "ES"]
    assert df.loc["ENRICHED", "NES"] > 1.0


def test_run_gsea_matrices(rng):
    genes = [f"g{i}" for i in range(200)]
    k = 3
    w = rng.random((200, k)) * 0.1
    w[:15, 0] += 1.5  # factor 1 enriched for SET_A
    sets = {
        "SET_A": genes[:15],
        "SET_B": genes[50:80],
        "SET_C": list(rng.choice(genes, 20, replace=False)),
    }
    model = NMFModel(w=w, d=np.ones(k), h=rng.random((k, 30)),
                     gene_names=genes)
    out = run_gsea(model, sets, min_size=10, max_size=100, nperm=300, seed=2)
    assert set(out.keys()) == {"pval", "padj", "es", "nes"}
    padj = out["padj"]
    assert padj.shape[1] == k
    # the planted set should be the most significant entry for NMF_1
    assert padj["NMF_1"].idxmax() == "SET_A"
    assert "gsea" in model.misc


def test_multilevel_resolves_extreme_pvalues(rng):
    """The multilevel estimator must resolve p far below 1/sample_size —
    the capability fgseaMultilevel adds over the simple method."""
    from singlet_tpu.gsea import fgsea_multilevel

    genes = [f"g{i}" for i in range(400)]
    vals = rng.random(400) * 0.1
    vals[:25] += 5.0  # extreme planted block: truly astronomical enrichment
    ranks = pd.Series(vals, index=genes)
    pathways = {"PLANTED": genes[:25],
                "RANDOM": list(rng.choice(genes[30:], 25, replace=False))}
    df = fgsea_multilevel(ranks, pathways, min_size=10, max_size=100,
                          sample_size=51, score_type="pos", seed=3)
    df = df.set_index("pathway")
    # resolution far beyond 1/(sample_size+1) ~ 0.02
    assert df.loc["PLANTED", "pval"] < 1e-6
    assert df.loc["RANDOM", "pval"] > 0.05
    assert df.loc["PLANTED", "ES"] > 0.9


def test_multilevel_agrees_with_simple_in_resolvable_range(rng):
    """For moderate p-values both estimators must agree (same tail)."""
    from singlet_tpu.gsea import fgsea_multilevel

    genes = [f"g{i}" for i in range(300)]
    vals = rng.random(300)
    vals[:18] += 0.3  # mild enrichment: p in the simple-resolvable range
    ranks = pd.Series(vals, index=genes)
    pathways = {"MILD": genes[:18]}
    p_simple = fgsea_simple(ranks, pathways, min_size=10, max_size=100,
                            nperm=4000, score_type="pos",
                            seed=4)["pval"].iloc[0]
    p_multi = fgsea_multilevel(ranks, pathways, min_size=10, max_size=100,
                               sample_size=101, score_type="pos",
                               seed=4)["pval"].iloc[0]
    assert 0.0003 < p_simple < 0.6
    # same order of magnitude (both are Monte Carlo estimates)
    assert 0.2 < p_multi / p_simple < 5.0


def test_run_gsea_multilevel_default(rng):
    genes = [f"g{i}" for i in range(200)]
    w = rng.random((200, 2)) * 0.1
    w[:15, 0] += 2.0
    sets = {"SET_A": genes[:15], "SET_B": genes[50:80]}
    model = NMFModel(w=w, d=np.ones(2), h=rng.random((2, 20)),
                     gene_names=genes)
    out = run_gsea(model, sets, min_size=10, max_size=100, seed=2)
    assert out["padj"]["NMF_1"].idxmax() == "SET_A"
