"""Driver-level tests: run_nmf, ARD fit traces, CV grid, GetBestRank,
linked NMF, projection."""

import numpy as np
import pandas as pd
import pytest

import reference_impl as ref
from singlet_tpu import (
    GetBestRank,
    ard_nmf_fit,
    build_link_matrix,
    cross_validate_nmf,
    project_model,
    run_linked_nmf,
    run_nmf,
)


def _lowrank(rng, genes=60, cells=45, k=3, noise=0.01, sparsity=0.3):
    W = rng.random((genes, k)).astype(np.float32)
    H = rng.random((k, cells)).astype(np.float32)
    A = W @ H + noise * rng.random((genes, cells)).astype(np.float32)
    A[rng.random(A.shape) < sparsity] = 0
    return A.astype(np.float32)


def test_run_nmf_model_surface(rng):
    A = _lowrank(rng)
    model = run_nmf(A, 4, tol=1e-4, maxit=50, seed=7,
                    gene_names=[f"g{i}" for i in range(60)],
                    cell_names=[f"c{i}" for i in range(45)])
    assert model.w.shape == (60, 4)
    assert model.h.shape == (4, 45)
    assert model.d.shape == (4,)
    # d sorted decreasing, names follow the reference convention
    assert np.all(np.diff(model.d) <= 0)
    assert model.factor_names == ["NMF_1", "NMF_2", "NMF_3", "NMF_4"]
    assert model.embeddings.shape == (45, 4)
    assert (model.w >= 0).all() and (model.h >= 0).all()


def test_run_nmf_l1_validation(rng):
    with pytest.raises(ValueError):
        run_nmf(_lowrank(rng), 3, L1=1.0)


def test_ard_fit_traces_match_oracle(rng):
    A = _lowrank(rng, genes=24, cells=18)
    k, seed, inv_density = 3, 55, 5
    w0 = rng.random((24, k)).astype(np.float32)
    res = ard_nmf_fit(A, k, w_init=w0, mask_seed=seed, inv_density=inv_density,
                      tol=1e-3, maxit=6, L1=0.01, overfit_threshold=1e-3,
                      trace_test_mse=2)
    out = ref.ard_nmf(A.astype(np.float64), w0.T.copy(), seed, inv_density,
                      tol=1e-3, maxit=6, L1=0.01, overfit_threshold=1e-3,
                      trace_test_mse=2)
    assert res.iter == out["iter"]
    np.testing.assert_allclose(res.test_mse, out["test_mse"], rtol=5e-3)
    np.testing.assert_allclose(res.score_overfit, out["score_overfit"],
                               rtol=5e-2, atol=1e-4)


def test_cross_validate_and_best_rank(rng):
    A = _lowrank(rng, genes=50, cells=40, k=3, noise=0.05)
    df = cross_validate_nmf(A, ranks=[2, 3, 4, 6], n_replicates=2,
                            tol=1e-3, maxit=20, verbose=0, seed=11)
    assert set(df.columns) == {"k", "rep", "test_error", "iter", "tol"}
    assert set(df["k"].unique()) == {2, 3, 4, 6}
    assert set(df["rep"].unique()) == {1, 2}
    best = GetBestRank(df)
    assert 2 <= best <= 6


def test_get_best_rank_rule():
    # replicate 1: clean minimum at k=3; test errors fall then rise
    rows = []
    for k, err in [(2, 1.0), (3, 0.5), (4, 0.8), (5, 0.9)]:
        rows.append(dict(k=k, rep=1, test_error=err, iter=10, tol=1e-4))
    df = pd.DataFrame(rows)
    assert GetBestRank(df) == 3


def test_get_best_rank_overfit_cap():
    # k=4's own trace rises by more than tol_overfit -> max_rank capped at 4,
    # so k=4 (lowest final error) is excluded and k=3 wins
    rows = [
        dict(k=2, rep=1, test_error=1.0, iter=5, tol=1e-3),
        dict(k=2, rep=1, test_error=0.9, iter=10, tol=1e-4),
        dict(k=3, rep=1, test_error=0.6, iter=5, tol=1e-3),
        dict(k=3, rep=1, test_error=0.55, iter=10, tol=1e-4),
        dict(k=4, rep=1, test_error=0.50, iter=5, tol=1e-3),
        dict(k=4, rep=1, test_error=0.40, iter=10, tol=1e-3),
        dict(k=4, rep=1, test_error=0.53, iter=15, tol=1e-4),
    ]
    assert GetBestRank(pd.DataFrame(rows), tol_overfit=1e-4) == 3


def test_linked_nmf_unlinks_factors(rng):
    genes, cells, k = 40, 30, 3
    A = _lowrank(rng, genes, cells, k)
    base = run_nmf(A, k, maxit=30, seed=5)
    # explicitly unlink factor 0 from the second half of the cells
    link_h = np.ones((k, cells), np.float32)
    link_h[0, 15:] = 0.0
    model = run_linked_nmf(A, base.w, link_h=link_h, maxit=20, verbose=False)
    # sorting permutes factors; some factor must be exactly zero on the
    # unlinked cells and active on the linked ones
    hit = [
        r for r in range(k)
        if (model.h[r, 15:] == 0).all() and (model.h[r, :15] > 0).any()
    ]
    assert hit, model.h
    assert model.misc["link_matrix"] is not None


def test_build_link_matrix_rule():
    # factor 0 loaded only on group a -> unlinked from group b, and vice versa
    emb = np.zeros((20, 2), np.float32)
    emb[:10, 0] = 1.0
    emb[10:, 1] = 1.0
    groups = np.array(["a"] * 10 + ["b"] * 10)
    link_h, unlink, levels = build_link_matrix(emb, groups, link_cutoff=0.5)
    assert levels == ["a", "b"]
    assert unlink[0, 1] and unlink[1, 0]
    assert not unlink[0, 0] and not unlink[1, 1]
    assert (link_h[0, 10:] == 0).all() and (link_h[0, :10] == 1).all()
    assert (link_h[1, :10] == 0).all() and (link_h[1, 10:] == 1).all()


def test_projection_roundtrip(rng):
    genes, cells, k = 50, 40, 3
    W = rng.random((genes, k)).astype(np.float32)
    H = rng.random((k, cells)).astype(np.float32)
    A = W @ H
    h, d = project_model(A, W, L1=0.0)
    # reconstruction through the projected model: w_norm @ diag(d) @ h
    Wn = W / (W.sum(0, keepdims=True) + 1e-15)
    full = Wn @ (d[:, None] * h)
    rel = np.linalg.norm(full - A) / np.linalg.norm(A)
    assert rel < 0.02, rel
    # transposed w accepted
    h2, d2 = project_model(A, W.T, L1=0.0)
    np.testing.assert_allclose(h, h2, rtol=1e-5, atol=1e-6)


def test_rank_bucketing_is_exact(rng):
    """k_bucket pads factor columns that must stay exactly zero: a bucketed
    fit equals the unbucketed fit to float-reassociation noise, while ranks
    2..8 share one compiled program (the point of the bucketing)."""
    from singlet_tpu.solvers.ard import ard_nmf_fit

    W = rng.random((60, 5)).astype(np.float32)
    H = rng.random((5, 72)).astype(np.float32)
    A = (W @ H).astype(np.float32)
    A[rng.random(A.shape) < 0.4] = 0
    r_pad = ard_nmf_fit(A, 5, maxit=6, k_bucket=8)
    r_ref = ard_nmf_fit(A, 5, maxit=6, k_bucket=1)
    assert r_pad.w.shape == (60, 5) and r_pad.d.shape == (5,)
    np.testing.assert_allclose(r_pad.w, r_ref.w, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(r_pad.tol, r_ref.tol, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(r_pad.test_mse, r_ref.test_mse,
                               rtol=1e-5, atol=1e-8)


def test_fused_ard_loop_matches_host_loop(rng, tmp_path):
    """The device-fused masked fit (one sync per fit) must reproduce the
    host-side per-iteration loop (exercised via the checkpointing path)
    exactly: same traces, same early-stop iteration."""
    from singlet_tpu.checkpoint import CheckpointManager
    from singlet_tpu.solvers.ard import ard_nmf_fit

    W = rng.random((60, 4)).astype(np.float32)
    H = rng.random((4, 72)).astype(np.float32)
    A = (W @ H).astype(np.float32)
    A[rng.random(A.shape) < 0.4] = 0
    fused = ard_nmf_fit(A, 4, maxit=9, trace_test_mse=2)
    hostp = ard_nmf_fit(A, 4, maxit=9, trace_test_mse=2,
                        checkpoint=CheckpointManager(str(tmp_path), every=10**6))
    assert fused.iter == hostp.iter
    np.testing.assert_allclose(fused.test_mse, hostp.test_mse,
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(fused.tol, hostp.tol, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(fused.w, hostp.w, rtol=1e-4, atol=1e-6)


def test_fused_plain_loop_matches_host_loop(rng, tmp_path):
    from singlet_tpu.checkpoint import CheckpointManager
    from singlet_tpu.solvers.als import nmf_fit

    W = rng.random((50, 3)).astype(np.float32)
    H = rng.random((3, 64)).astype(np.float32)
    A = (W @ H).astype(np.float32)
    w0 = rng.random((50, 3)).astype(np.float32)
    fused = nmf_fit(A, 3, w_init=w0, tol=1e-6, maxit=7)
    hostp = nmf_fit(A, 3, w_init=w0, tol=1e-6, maxit=7,
                    checkpoint=CheckpointManager(str(tmp_path), every=10**6))
    assert fused.n_iter == hostp.n_iter
    np.testing.assert_allclose(fused.tol_trace, hostp.tol_trace,
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(fused.w, hostp.w, rtol=1e-4, atol=1e-6)
