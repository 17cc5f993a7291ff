"""Masked (cross-validation) ALS fit with overfit early-stopping.

Equivalent of ``c_ard_nmf_base`` (reference:src/singlet.cpp:1091-1152): the
ALS loop runs with the speckled test set masked out of both half-updates;
every ``trace_test_mse`` iterations the held-out MSE is evaluated and an
overfit score ``(err - min_err) / (err + min_err)`` is tracked; fitting stops
early when the score exceeds ``overfit_threshold``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from singlet_tpu.checkpoint import CheckpointManager, resolve_manager
from singlet_tpu.ops.rngmask import seed_pair
from singlet_tpu.tracing import get_metric_logger
from singlet_tpu.solvers.als import (
    als_step_masked,
    init_w,
    make_dense_providers,
    mse_test,
)
from singlet_tpu.sparse.matrix import DenseMatrix
from singlet_tpu.utils import vprint


@dataclasses.dataclass
class ArdFitResult:
    w: np.ndarray           # (genes, k)
    d: np.ndarray           # (k,)
    h: np.ndarray           # (k, cells)
    test_mse: List[float]
    iter: List[int]
    tol: List[float]
    score_overfit: List[float]


def ard_nmf_fit(
    A: Union[np.ndarray, DenseMatrix],
    k: int,
    At: Optional[DenseMatrix] = None,
    w_init: Optional[jnp.ndarray] = None,
    mask_seed: int = 0,
    inv_density: int = 20,
    tol: float = 1e-4,
    maxit: int = 100,
    L1: float = 0.01,
    L2: float = 0.0,
    overfit_threshold: float = 1e-3,
    trace_test_mse: int = 1,
    verbose: int = 0,
    init_seed: int = 0,
    checkpoint: Optional[Union[str, CheckpointManager]] = None,
) -> ArdFitResult:
    """One masked fit at fixed rank k, returning factor matrices + traces.

    The trace schedule, overfit score, early stop and tail-trace semantics
    follow reference:src/singlet.cpp:1106-1141 exactly; the returned trace
    vectors feed the ``cross_validate_nmf_data`` frame
    (reference:R/ard_nmf.R:118).
    """
    if At is not None:
        Ap, Atp = A, At        # caller-built providers (dense or ELL)
    else:
        Ap, Atp = make_dense_providers(np.asarray(A))

    genes_pad, cells_pad = Ap.rows_pad, Ap.cols_pad
    cell_block = Ap.block
    gene_block = Atp.block
    sp = seed_pair(mask_seed)

    if w_init is None:
        W = init_w(k, genes_pad, Ap.rows_true, init_seed)
    else:
        W = jnp.zeros((genes_pad, k), jnp.float32)
        W = W.at[: w_init.shape[0]].set(jnp.asarray(w_init, jnp.float32))
    H = jnp.zeros((cells_pad, k), jnp.float32)
    d = jnp.ones((k,), jnp.float32)

    test_mse_t: List[float] = []
    iter_t: List[int] = []
    tol_t: List[float] = []
    score_t: List[float] = []

    mgr = resolve_manager(checkpoint)
    ckpt_config = CheckpointManager.config_of(
        algo="ard", k=int(k), genes_pad=int(genes_pad),
        cells_pad=int(cells_pad), L1=L1, L2=L2, mask_seed=int(mask_seed),
        inv_density=int(inv_density), trace=int(trace_test_mse),
    )
    tol_ = 1.0
    it = 0
    stopped_early = False
    if mgr is not None:
        st = mgr.restore(ckpt_config, verbose=verbose >= 1)
        if st is not None:
            W = jnp.asarray(st["W"])
            H = jnp.asarray(st["H"])
            d = jnp.asarray(st["d"])
            test_mse_t = list(st["test_mse"])
            iter_t = [int(i) for i in st["iter"]]
            tol_t = list(st["tol"])
            score_t = list(st["score_overfit"])
            it = int(st["it"])
            tol_ = tol_t[-1] if tol_t else 1.0

    logger = get_metric_logger()
    fit_id = logger.new_fit_id("ard")
    logger.log("fit_start", fit=fit_id, algo="ard_masked", k=int(k),
               genes=int(Ap.rows_true), cells=int(Ap.cols_true),
               inv_density=int(inv_density), maxit=maxit,
               resumed_at=it or None)
    while it < maxit and tol_ > tol:
        t0 = time.perf_counter()
        W, H, d, tol_j = als_step_masked(
            Ap, Atp, W, H, sp, L1, L2, inv_density, cell_block, gene_block
        )
        tol_ = float(tol_j)
        ms = round((time.perf_counter() - t0) * 1e3, 3)
        if it % trace_test_mse == 0:
            err = float(mse_test(Ap, W, d, H, sp, inv_density, cell_block))
            test_mse_t.append(err)
            iter_t.append(it)
            tol_t.append(tol_)
            min_err = min(test_mse_t)
            score = (err - min_err) / (err + min_err)
            score_t.append(score)
            logger.log("iteration", fit=fit_id, iter=it + 1, tol=tol_,
                       test_mse=err, overfit_score=score, ms=ms)
            vprint(verbose, 3, f"{it + 1:4d} | {tol_:8.2e} | {score:8.2e}")
            if score > overfit_threshold:
                stopped_early = True
                break
        else:
            logger.log("iteration", fit=fit_id, iter=it + 1, tol=tol_, ms=ms)
            vprint(verbose, 3, f"{it + 1:4d} | {tol_:8.2e} |        -")
        it += 1
        if mgr is not None:
            mgr.maybe_save(it, dict(
                ckpt_config, W=np.asarray(W), H=np.asarray(H),
                d=np.asarray(d), test_mse=test_mse_t, iter=iter_t,
                tol=tol_t, score_overfit=score_t))

    if (it % trace_test_mse != 0 and not stopped_early
            and (not iter_t or iter_t[-1] != it)):
        err = float(mse_test(Ap, W, d, H, sp, inv_density, cell_block))
        test_mse_t.append(err)
        iter_t.append(it)
        tol_t.append(tol_)
        min_err = min(test_mse_t)
        score_t.append((err - min_err) / (err + min_err))

    logger.log("fit_end", fit=fit_id, n_iter=it,
               test_mse=test_mse_t[-1] if test_mse_t else None,
               stopped_early=stopped_early)
    return ArdFitResult(
        w=np.asarray(W[: Ap.rows_true]),
        d=np.asarray(d),
        h=np.asarray(H[: Ap.cols_true]).T,
        test_mse=test_mse_t,
        iter=iter_t,
        tol=tol_t,
        score_overfit=score_t,
    )
