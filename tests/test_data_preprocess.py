"""pbmc3k fixture loading and preprocessing parity tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from singlet_tpu.data import load_pbmc3k
from singlet_tpu.preprocess import (
    log_normalize,
    looks_like_counts,
    normit,
    rasterize_rowwise,
    weight_by_split,
)


@pytest.fixture(scope="module")
def pbmc3k():
    return load_pbmc3k()


def test_pbmc3k_shape_and_content(pbmc3k):
    # 2,700 PBMCs from 10x Genomics (reference:R/get_pbmc3k_data.R)
    assert pbmc3k.counts.shape[1] == 2700
    assert pbmc3k.counts.shape[0] > 10000
    assert pbmc3k.counts.nnz == 2282976
    assert len(pbmc3k.gene_names) == pbmc3k.counts.shape[0]
    assert len(pbmc3k.cell_names) == 2700
    assert len(pbmc3k.meta["cell_type"]) == 2700
    # counts are nonnegative integers
    assert (pbmc3k.counts.data >= 0).all()
    assert looks_like_counts(pbmc3k.counts)
    # known marker genes present
    assert "CD3E" in pbmc3k.gene_names
    types = {t for t in pbmc3k.meta["cell_type"] if t is not None}
    assert len(types) >= 5 and "B" in types


def test_log_normalize_matches_seurat_formula(pbmc3k):
    A = pbmc3k.counts[:, :50]
    N = log_normalize(A)
    assert not looks_like_counts(N)
    dense = np.asarray(A.todense(), np.float64)
    expected = np.log1p(dense / dense.sum(0, keepdims=True) * 1e4)
    np.testing.assert_allclose(np.asarray(N.todense()), expected, rtol=1e-5)


def test_weight_by_split():
    A = sp.csc_matrix(np.array([[1.0, 2.0, 4.0, 8.0],
                                [1.0, 2.0, 4.0, 8.0]], np.float32))
    groups = np.array([0, 0, 1, 1])
    W = weight_by_split(A, groups)
    sums = np.asarray(W.sum(axis=0)).ravel()
    # each group now sums to group 0's total (6)
    assert abs(sums[:2].sum() - 6) < 1e-5
    assert abs(sums[2:].sum() - 6) < 1e-5
    # group 0 unchanged
    np.testing.assert_allclose(np.asarray(W.todense())[:, :2],
                               np.asarray(A.todense())[:, :2])
    # string labels accepted
    W2 = weight_by_split(A, np.array(["x", "x", "y", "y"]))
    np.testing.assert_allclose(np.asarray(W2.todense()),
                               np.asarray(W.todense()))


def test_rasterize_rowwise_sparse_dense_agree(rng):
    A = rng.random((23, 7))
    A[A < 0.5] = 0
    d = rasterize_rowwise(A, n=5)
    s = rasterize_rowwise(sp.csc_matrix(A), n=5)
    assert d.shape == (4, 7)
    np.testing.assert_allclose(d, s, rtol=1e-12)
    # bin 0 = mean of rows 0..4
    np.testing.assert_allclose(d[0], A[:5].sum(0) / 5)


def test_normit_matches_r_formula():
    x = np.array([3.0, 1.0, 2.0, 2.0, np.nan])
    out = normit(x)
    from scipy.stats import norm
    # ranks (average ties): 4, 1, 2.5, 2.5; n_unique = 3
    expected = norm.ppf((np.array([4, 1, 2.5, 2.5]) - 0.5) / 3)
    np.testing.assert_allclose(out[:4], expected)
    assert np.isnan(out[4])


def test_h5ad_round_trip(tmp_path):
    import scipy.sparse as sp

    from singlet_tpu.experiment import Experiment
    from singlet_tpu.model import NMFModel

    rng = np.random.default_rng(3)
    A = sp.random(30, 40, density=0.3, random_state=3, dtype=np.float32,
                  format="csc")
    exp = Experiment(counts=A, gene_names=[f"g{i}" for i in range(30)],
                     cell_names=[f"c{i}" for i in range(40)],
                     meta={"cell_type": np.array(["a", "b"] * 20)})
    exp.reductions["nmf"] = NMFModel(
        w=rng.random((30, 3)).astype(np.float32),
        d=np.array([3.0, 2.0, 1.0], np.float32),
        h=rng.random((3, 40)).astype(np.float32))
    path = str(tmp_path / "exp.h5ad")
    exp.to_h5ad(path)

    back = Experiment.from_h5ad(path)
    assert (back.counts != A).nnz == 0
    assert back.gene_names == exp.gene_names
    assert back.cell_names == exp.cell_names
    assert list(back.meta["cell_type"]) == list(exp.meta["cell_type"])

    import h5py
    with h5py.File(path) as f:
        np.testing.assert_allclose(f["obsm"]["X_nmf"][:],
                                   exp.reductions["nmf"].embeddings)
        np.testing.assert_allclose(f["varm"]["nmf_loadings"][:],
                                   exp.reductions["nmf"].loadings)
        np.testing.assert_allclose(f["uns"]["nmf"]["d"][:],
                                   exp.reductions["nmf"].d)


def test_variable_features_vst_finds_high_variance_genes(rng):
    """Genes with real biological variance (bimodal across cells) must rank
    above Poisson-noise genes of the same mean."""
    import scipy.sparse as sp
    from singlet_tpu.preprocess import variable_features_vst

    genes, cells = 120, 400
    base = 10 ** rng.uniform(-1.0, 0.8, genes)  # continuous mean spectrum
    lam = np.tile(base[:, None], (1, cells))
    hv = [3, 17, 58, 99]  # planted variable genes: on/off across two halves
    for g in hv:
        lam[g, : cells // 2] = 0.05
        lam[g, cells // 2:] = 4.0   # mean ~2 (mid-spectrum), huge extra var
    counts = sp.csc_matrix(rng.poisson(lam).astype(np.float32))
    top = variable_features_vst(counts, n_features=10)
    assert set(hv).issubset(set(top.tolist()))


def test_experiment_var_features_path(rng):
    import scipy.sparse as sp
    from singlet_tpu.experiment import Experiment

    genes, cells = 80, 150
    base = 10 ** rng.uniform(-1.0, 0.7, genes)
    lam = np.tile(base[:, None], (1, cells))
    for g in (5, 40):
        lam[g, : cells // 2] = 0.1
        lam[g, cells // 2:] = 5.0
    counts = sp.csc_matrix(rng.poisson(lam).astype(np.float32))
    exp = Experiment(counts=counts,
                     gene_names=[f"g{i}" for i in range(genes)],
                     cell_names=[f"c{i}" for i in range(cells)])
    exp.find_variable_features(n_features=20)
    assert "g5" in exp.var_features and "g40" in exp.var_features
    exp.run_nmf(k=3, features="var.features", verbose=0)
    model = exp.reductions["nmf"]
    assert model.w.shape[0] == 20   # fit restricted to the variable genes


def test_bootstrap_expand_pbmc(pbmc3k):
    """The 30k real-data operand construction (benchmarks/pbmc30k_ard.py):
    column bootstrap + multinomial count resample must preserve per-cell
    depth exactly, stay on the source cell's gene support, and be
    seed-reproducible."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from benchmarks.pbmc30k_ard import bootstrap_expand

    C = sp.csc_matrix(pbmc3k.counts)
    n_out = 300
    rows, cols, vals, src = bootstrap_expand(C, n_out, seed=7)
    M = sp.csc_matrix(
        (vals.astype(np.int64),
         (rows.astype(np.int64), cols.astype(np.int64))),
        shape=(C.shape[0], n_out))
    # per-cell depth == the sampled source cell's depth, exactly
    np.testing.assert_array_equal(
        np.asarray(M.sum(axis=0)).ravel(),
        np.asarray(C.sum(axis=0)).ravel()[src])
    # gene support is a subset of the source cell's support
    for j in (0, 3, n_out - 1):
        s = src[j]
        sup_src = set(C.indices[C.indptr[s]:C.indptr[s + 1]])
        sup_new = set(M.indices[M.indptr[j]:M.indptr[j + 1]])
        assert sup_new <= sup_src
    # seeded determinism
    r2, c2, v2, s2 = bootstrap_expand(C, n_out, seed=7)
    np.testing.assert_array_equal(rows, r2)
    np.testing.assert_array_equal(vals, v2)
    np.testing.assert_array_equal(src, s2)
