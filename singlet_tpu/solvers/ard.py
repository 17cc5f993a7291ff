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
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from singlet_tpu.checkpoint import CheckpointManager, resolve_manager
from singlet_tpu.ops.nnls import CD_EXACT_TOL, sweep_cap_update
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


@partial(jax.jit, static_argnames=("inv_density", "cell_block", "gene_block",
                                   "maxit", "trace_every", "max_traces"))
def _ard_loop_device(Ap, Atp, W, H, sp, L1, L2, inv_density: int,
                     cell_block: int, gene_block: int, k_true,
                     tol_target, overfit_threshold, maxit: int,
                     trace_every: int, max_traces: int):
    """The whole masked fit as ONE device program: lax.while_loop over
    als_step_masked with the trace/overfit-early-stop policy of
    ``c_ard_nmf_base`` (reference:src/singlet.cpp:1106-1141) evaluated on
    device. One host sync per fit instead of one per iteration — over a
    remote device the per-iteration sync RTT dominates the fit wall-clock.

    Returns (W, H, d, n_iter, stopped_early, n_traces, test_mse[max_traces],
    trace_iters[max_traces], scores[max_traces], tols[maxit]).
    """
    nanf = jnp.float32(jnp.nan)

    def cond(st):
        it, _, _, _, tolv, stopped = st[:6]
        return (~stopped) & (it < maxit) & (tolv > tol_target)

    def body(st):
        (it, W, H, d, tolv, stopped, min_err, n_tr, tmse, t_iters, scores,
         tols, exact) = st
        cap, exact = sweep_cap_update(exact, tolv, tol_target,
                                      masked=True)
        W, H, d, tolv = als_step_masked(Ap, Atp, W, H, sp, L1, L2,
                                        inv_density, cell_block, gene_block,
                                        k_true, sweep_cap=cap)
        tols = tols.at[it].set(tolv)

        def with_trace(args):
            min_err, n_tr, tmse, t_iters, scores, stopped = args
            err = mse_test(Ap, W, d, H, sp, inv_density, cell_block)
            min_err = jnp.minimum(min_err, err)
            score = (err - min_err) / (err + min_err)
            tmse = tmse.at[n_tr].set(err)
            t_iters = t_iters.at[n_tr].set(it)
            scores = scores.at[n_tr].set(score)
            return (min_err, n_tr + 1, tmse, t_iters, scores,
                    score > overfit_threshold)

        traced = (it % trace_every) == 0
        min_err, n_tr, tmse, t_iters, scores, stopped = jax.lax.cond(
            traced, with_trace, lambda a: a,
            (min_err, n_tr, tmse, t_iters, scores, stopped))
        it = jnp.where(stopped, it, it + 1)   # reference: break before it+=1
        return (it, W, H, d, tolv, stopped, min_err, n_tr, tmse, t_iters,
                scores, tols, exact)

    st0 = (jnp.int32(0), W, H, jnp.ones((W.shape[1],), W.dtype),
           jnp.float32(1.0), jnp.bool_(False), jnp.float32(jnp.inf),
           jnp.int32(0), jnp.full((max_traces,), nanf),
           jnp.full((max_traces,), -1, jnp.int32),
           jnp.full((max_traces,), nanf),
           jnp.full((maxit,), nanf), jnp.bool_(False))
    (it, W, H, d, _, stopped, _, n_tr, tmse, t_iters, scores,
     tols, _) = jax.lax.while_loop(cond, body, st0)
    return W, H, d, it, stopped, n_tr, tmse, t_iters, scores, tols


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
    k_bucket: int = 8,
) -> ArdFitResult:
    """One masked fit at fixed rank k, returning factor matrices + traces.

    The trace schedule, overfit score, early stop and tail-trace semantics
    follow reference:src/singlet.cpp:1106-1141 exactly; the returned trace
    vectors feed the ``cross_validate_nmf_data`` frame
    (reference:R/ard_nmf.R:118).

    ``k_bucket`` rounds the *compiled* factor count up to a multiple so the
    rank searches of ard_nmf / cross_validate_nmf (dozens of distinct k)
    share a handful of XLA programs instead of compiling one per rank.
    Padded factor columns start at exactly zero and stay exactly zero
    through every update (zero Gram row + zero RHS + clamp-at-zero), so
    results are identical to an unpadded fit up to float reassociation;
    only the Pearson tol's element count is corrected (k_true plumbed into
    the step). Set 0/1 to disable.
    """
    if At is not None:
        Ap, Atp = A, At        # caller-built providers (dense or ELL)
    else:
        Ap, Atp = make_dense_providers(np.asarray(A))

    genes_pad, cells_pad = Ap.rows_pad, Ap.cols_pad
    cell_block = Ap.block
    gene_block = Atp.block
    sp = seed_pair(mask_seed)

    k_pad = k if k_bucket <= 1 else ((k + k_bucket - 1) // k_bucket) * k_bucket
    W = jnp.zeros((genes_pad, k_pad), jnp.float32)
    if w_init is None:
        W = W.at[:, :k].set(init_w(k, genes_pad, Ap.rows_true, init_seed))
    else:
        w_init = jnp.asarray(w_init, jnp.float32)
        W = W.at[: w_init.shape[0], :k].set(w_init)
    H = jnp.zeros((cells_pad, k_pad), jnp.float32)
    d = jnp.ones((k_pad,), jnp.float32)
    k_true = jnp.int32(k)

    test_mse_t: List[float] = []
    iter_t: List[int] = []
    tol_t: List[float] = []
    score_t: List[float] = []

    mgr = resolve_manager(checkpoint)
    ckpt_config = CheckpointManager.config_of(
        algo="ard", k=int(k), k_pad=int(k_pad), genes_pad=int(genes_pad),
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

    if mgr is None:
        # fused device loop: the rank searches run dozens of these fits, and
        # a per-iteration host sync (tol check) costs a full device RTT each
        t0 = time.perf_counter()
        max_traces = (maxit + trace_test_mse - 1) // trace_test_mse + 1
        (W, H, d, it_j, stopped_j, n_tr_j, tmse_a, titer_a, score_a,
         tols_a) = _ard_loop_device(
            Ap, Atp, W, H, sp, jnp.float32(L1), jnp.float32(L2),
            int(inv_density), cell_block, gene_block, k_true,
            jnp.float32(tol), jnp.float32(overfit_threshold), int(maxit),
            int(trace_test_mse), int(max_traces))
        it = int(it_j)
        stopped_early = bool(stopped_j)
        n_tr = int(n_tr_j)
        total_ms = (time.perf_counter() - t0) * 1e3
        tols_np = np.asarray(tols_a)
        test_mse_t = [float(v) for v in np.asarray(tmse_a[:n_tr])]
        iter_t = [int(v) for v in np.asarray(titer_a[:n_tr])]
        tol_t = [float(tols_np[i]) for i in iter_t]
        score_t = [float(v) for v in np.asarray(score_a[:n_tr])]
        # the step of an early-stopped iteration wrote tols[it] (it is not
        # incremented on stop, mirroring the reference's break-before-++)
        last_idx = it if stopped_early else it - 1
        tol_ = float(tols_np[last_idx]) if last_idx >= 0 else tol_
        n_steps = it if not stopped_early else it + 1
        per_ms = round(total_ms / max(n_steps, 1), 3)
        ti = set(iter_t)
        for i in range(n_steps):
            if i in ti:
                j = iter_t.index(i)
                logger.log("iteration", fit=fit_id, iter=i + 1,
                           tol=float(tols_np[i]), test_mse=test_mse_t[j],
                           overfit_score=score_t[j], ms=per_ms)
                vprint(verbose, 3,
                       f"{i + 1:4d} | {tols_np[i]:8.2e} | {score_t[j]:8.2e}")
            else:
                logger.log("iteration", fit=fit_id, iter=i + 1,
                           tol=float(tols_np[i]), ms=per_ms)
                vprint(verbose, 3, f"{i + 1:4d} | {tols_np[i]:8.2e} |        -")

    # host-side twin of the fused loop's exact-phase latch, recovered from
    # the saved tol trace after a checkpoint resume
    thresh_ = max(10.0 * tol, CD_EXACT_TOL)
    exact = jnp.bool_(any(t <= thresh_ for t in tol_t))
    while mgr is not None and it < maxit and tol_ > tol:
        t0 = time.perf_counter()
        cap, exact = sweep_cap_update(exact, jnp.float32(tol_),
                                      jnp.float32(tol), masked=True)
        W, H, d, tol_j = als_step_masked(
            Ap, Atp, W, H, sp, L1, L2, inv_density, cell_block, gene_block,
            k_true, sweep_cap=cap,
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
        if mgr is not None and mgr.should_save(it):
            mgr.save(it, dict(
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
        w=np.asarray(W[: Ap.rows_true, :k]),
        d=np.asarray(d[:k]),
        h=np.asarray(H[: Ap.cols_true, :k]).T,
        test_mse=test_mse_t,
        iter=iter_t,
        tol=tol_t,
        score_overfit=score_t,
    )
