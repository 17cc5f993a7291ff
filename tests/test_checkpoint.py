"""Checkpoint/resume + structured tracing subsystems."""

import json
import os

import numpy as np

from singlet_tpu.checkpoint import (
    CheckpointManager,
    load_fit_state,
    save_fit_state,
)
from singlet_tpu.solvers.als import nmf_fit
from singlet_tpu.solvers.ard import ard_nmf_fit
from singlet_tpu.tracing import metric_logging


def _data(rng, genes=40, cells=56):
    W = rng.gamma(0.5, 1.0, (genes, 4)).astype(np.float32)
    H = rng.gamma(0.5, 1.0, (4, cells)).astype(np.float32)
    return np.log1p(rng.poisson(W @ H).astype(np.float32))


def test_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "s.npz")
    state = dict(W=np.arange(6.0).reshape(2, 3), d=np.ones(3),
                 it=7, tol_trace=[0.5, 0.25], config="abc")
    save_fit_state(path, state)
    out = load_fit_state(path)
    np.testing.assert_array_equal(out["W"], state["W"])
    assert out["it"] == 7 and out["tol_trace"] == [0.5, 0.25]
    assert out["config"] == "abc"


def test_manager_rolls_and_restores(tmp_path):
    mgr = CheckpointManager(str(tmp_path), every=1, keep=2)
    cfg = CheckpointManager.config_of(k=3)
    for it in (1, 2, 3):
        mgr.save(it, dict(cfg, W=np.full((2, 2), float(it)), tol_trace=[]))
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 2  # keep=2
    st = mgr.restore(cfg)
    assert st["it"] == 3
    assert mgr.restore(CheckpointManager.config_of(k=4)) is None  # mismatch


def test_nmf_fit_resume_identical(rng, tmp_path):
    A = _data(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    full = nmf_fit(A, 3, w_init=w0, tol=0.0, maxit=6)

    # interrupted run: stops at iter 3, checkpointing every iteration
    mgr = CheckpointManager(str(tmp_path), every=1)
    nmf_fit(A, 3, w_init=w0, tol=0.0, maxit=3, checkpoint=mgr)
    # resumed run continues from iter 3 to 6
    res = nmf_fit(A, 3, w_init=w0, tol=0.0, maxit=6, checkpoint=mgr)
    np.testing.assert_array_equal(res.w, full.w)
    np.testing.assert_array_equal(res.h, full.h)
    assert res.tol_trace == full.tol_trace


def test_ard_fit_resume_identical(rng, tmp_path):
    A = _data(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    full = ard_nmf_fit(A, 3, w_init=w0, mask_seed=5, inv_density=8,
                       tol=0.0, maxit=6, trace_test_mse=1)
    mgr = CheckpointManager(str(tmp_path), every=2)
    ard_nmf_fit(A, 3, w_init=w0, mask_seed=5, inv_density=8,
                tol=0.0, maxit=4, trace_test_mse=1, checkpoint=mgr)
    res = ard_nmf_fit(A, 3, w_init=w0, mask_seed=5, inv_density=8,
                      tol=0.0, maxit=6, trace_test_mse=1, checkpoint=mgr)
    np.testing.assert_array_equal(res.w, full.w)
    assert res.test_mse == full.test_mse
    assert res.iter == full.iter


def test_ard_search_resume_identical(rng, tmp_path):
    """The ard_nmf SEARCH driver checkpoints its adaptive-walk state per
    completed rank fit; a valve-stopped (or killed) search resumed with the
    same arguments must reproduce the uninterrupted search's CV trace and
    final model exactly (drivers.py ard_nmf checkpoint=)."""
    from singlet_tpu.solvers.drivers import ard_nmf

    A = _data(rng, genes=48, cells=64)
    kw = dict(k_init=2, k_max=8, n_replicates=2, tol=0.0, cv_tol=0.0,
              maxit=4, trace_test_mse=2, seed=11, verbose=0)
    full = ard_nmf(A, **kw)

    ckdir = str(tmp_path / "ard_search")
    # interrupted: the max_fits valve stops the search after 3 fits with
    # the walk state checkpointed mid-replicate
    ard_nmf(A, max_fits=3, checkpoint=ckdir, **kw)
    assert os.path.exists(ckdir) and os.listdir(ckdir)
    # resumed with the full budget: must skip the 3 completed fits and
    # continue to the identical end state
    res = ard_nmf(A, checkpoint=ckdir, **kw)

    assert res.k == full.k
    np.testing.assert_array_equal(res.w, full.w)
    np.testing.assert_array_equal(res.d, full.d)
    np.testing.assert_array_equal(res.h, full.h)
    for col in ("k", "rep", "test_error", "iter", "tol"):
        np.testing.assert_array_equal(res.cv_data[col].to_numpy(),
                                      full.cv_data[col].to_numpy())
    assert res.cv_data.dtypes.equals(full.cv_data.dtypes)


def test_metric_logging_jsonl(rng, tmp_path):
    A = _data(rng, genes=24, cells=32)
    path = str(tmp_path / "metrics.jsonl")
    with metric_logging(path) as logger:
        nmf_fit(A, 2, tol=0.0, maxit=3)
        events = list(logger.events)
    names = [e["event"] for e in events]
    assert names[0] == "fit_start" and names[-1] == "fit_end"
    assert names.count("iteration") == 3
    iters = [e for e in events if e["event"] == "iteration"]
    assert all("tol" in e and "ms" in e and e["fit"] for e in iters)
    with open(path) as f:
        lines = [json.loads(line) for line in f]
    assert len(lines) == len(events)
