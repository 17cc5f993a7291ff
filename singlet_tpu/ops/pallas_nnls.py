"""Fused Pallas TPU kernels for batched coordinate-descent NNLS.

The XLA implementation in ops/nnls.py lowers each coordinate update to a
handful of separate VPU ops over HBM-resident (n, k) arrays; with up to
100 sweeps x k coordinates the op-dispatch latency dominates the entire ALS
iteration. These kernels keep a block of columns fully VMEM-resident and run
the whole Gauss-Seidel sweep loop inside one program.

Shared-Gram kernel (`nnls_batch_pallas`) — the unmasked half-update path:

  * layout is transposed to (k, bn): a coordinate update touches one sublane
    row (1, bn); no lane-strided access;
  * instead of maintaining the residual incrementally (k rank-1 VPU downdates
    per sweep — the reference's formulation, reference:src/singlet.cpp:244),
    each group of g coordinates *recomputes* its residual rows from the
    running update Delta = X - X0:

        Bg = B[grp, :] - a[grp, :] @ Delta        (MXU, full-k contraction)

    followed by scalar in-group corrections for deltas produced earlier in
    the same group. Same FLOPs, but ~90% of them land on the MXU (at
    Precision.HIGHEST — 6-pass bf16 = full f32 accuracy; the CD recurrence
    is numerically sensitive, bf16 single-pass diverges) instead of the VPU,
    and the per-sweep residual is recomputed fresh (no rounding accumulation
    across 100 sweeps);
  * in-group deltas live as SSA values (vector registers), with tree-summed
    correction terms, not VMEM scratch rows;
  * the sweep tolerance is accumulated from the per-coordinate deltas
    (``sum_i |dx_i| / (x_i + eps)``) — ops that pipeline with the coordinate
    chain — instead of an end-of-sweep (k, bn) snapshot pass;
  * the sweep loop is a fori_loop with a per-block convergence flag in SMEM
    (predicated body, so converged blocks pay ~nothing for remaining sweeps).

Semantics match ops/nnls.py (and thus reference:src/singlet.cpp:229-250)
per column: identical update rule, clamp handling, and convergence test;
the only divergence is float reassociation in the residual computation
(validated at ~1e-6 against the XLA path and the f64 oracle in tests).

Grid: one program per column block; different blocks converge independently —
finer-grained early exit than the XLA path's global while_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singlet_tpu.ops.nnls import CD_MAX_SWEEPS, CD_TOL


def _tree_sum(terms):
    """Balanced-tree sum: log2 dependency depth instead of a serial chain."""
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _nnls_kernel(scalars_ref, inv_ref, a_ref, Bt_ref, X0t_ref, mask_ref,
                 Xout_ref, Delta_ref, Bg_ref, active_ref, flag_ref, *,
                 k: int, g: int, max_sweeps: int):
    """One column block. Shapes: a (k,k); Bt/X0t/Xout (k, bn); mask (1, bn);
    inv (k,) in SMEM = 1/diag(a); Delta (k, bn) = X - X0 running update."""
    L1 = scalars_ref[0]
    L2 = scalars_ref[1]
    k_div = scalars_ref[2]   # convergence divisor (k_true under bucketing)
    cap = scalars_ref[3]     # traced sweep cap (adaptive schedule)

    Xout_ref[:, :] = X0t_ref[:, :]
    Delta_ref[:, :] = jnp.zeros_like(Delta_ref)
    active_ref[:, :] = mask_ref[:, :]
    flag_ref[0] = jnp.int32(1)  # block has active columns

    def sweep(s, carry):
        @pl.when(flag_ref[0] > 0)
        def _():
            act = active_ref[0, :]
            tol_terms = []
            for c0 in range(0, k, g):
                gsz = min(g, k - c0)
                # group residual rows, recomputed on the MXU:
                # Bg = B[grp] - a[grp, :] @ (X - X0)
                Bg_ref[:gsz, :] = Bt_ref[c0:c0 + gsz, :] - jnp.dot(
                    a_ref[c0:c0 + gsz, :], Delta_ref[:, :],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                deltas = []
                for t in range(gsz):  # static unroll: sequential Gauss-Seidel
                    i = c0 + t
                    x_i = Xout_ref[i, :]
                    b_i = Bg_ref[t, :]
                    if t > 0:  # corrections from this group's earlier deltas
                        b_i = b_i - _tree_sum(
                            [a_ref[i, c0 + s] * deltas[s] for s in range(t)])
                    diff = b_i * inv_ref[i] - L1 + L2 * x_i
                    # fused clamp-at-zero + no-op gating (see ops/nnls.py)
                    delta = jnp.maximum(diff, -x_i) * act
                    deltas.append(delta)
                    x_new = x_i + delta
                    Xout_ref[i, :] = x_new
                    Delta_ref[i, :] = Delta_ref[i, :] + delta
                    tol_terms.append(jnp.abs(delta) / (x_new + 1e-15))
            tol = _tree_sum(tol_terms)
            still = (act > 0) & (tol / k_div > CD_TOL) \
                & ((s + 1).astype(jnp.float32) < cap)
            active_ref[0, :] = still.astype(jnp.float32)
            flag_ref[0] = jnp.any(still).astype(jnp.int32)

        return carry

    jax.lax.fori_loop(0, max_sweeps, sweep, 0)


def _nnls_kernel_batched(scalars_ref, idiag_ref, at_ref, Bt_ref, X0t_ref,
                         mask_ref, Xout_ref, Bres_ref, active_ref,
                         flag_ref, *, k: int, max_sweeps: int):
    """Per-column Grams (masked-CV path). at: (k, k, bn) with at[i] the
    contiguous (k, bn) coordinate tile at[i, j, c] = a_c[j, i] (leading-axis
    indexing — a middle-axis slice would be sublane-strided, ~2x slower);
    idiag (k, bn) = reciprocals of the per-column diagonals. Per-lane Grams
    leave no shared matmul to hoist onto the MXU, so this kernel keeps the
    incremental rank-1 residual downdate."""
    L1 = scalars_ref[0]
    L2 = scalars_ref[1]
    k_div = scalars_ref[2]   # convergence divisor (k_true under bucketing)
    cap = scalars_ref[3]     # traced sweep cap (adaptive schedule)

    Xout_ref[:, :] = X0t_ref[:, :]
    Bres_ref[:, :] = Bt_ref[:, :]
    active_ref[:, :] = mask_ref[:, :]
    flag_ref[0] = jnp.int32(1)

    def sweep(s, carry):
        @pl.when(flag_ref[0] > 0)
        def _():
            act = active_ref[0, :]
            tol_terms = []
            for i in range(k):
                x_i = Xout_ref[i, :]
                diff = Bres_ref[i, :] * idiag_ref[i, :] - L1 + L2 * x_i
                delta = jnp.maximum(diff, -x_i) * act
                Bres_ref[:, :] = Bres_ref[:, :] - \
                    at_ref[i, :, :] * delta[None, :]
                x_new = x_i + delta
                Xout_ref[i, :] = x_new
                tol_terms.append(jnp.abs(delta) / (x_new + 1e-15))
            tol = _tree_sum(tol_terms)
            still = (act > 0) & (tol / k_div > CD_TOL) \
                & ((s + 1).astype(jnp.float32) < cap)
            active_ref[0, :] = still.astype(jnp.float32)
            flag_ref[0] = jnp.any(still).astype(jnp.int32)

        return carry

    jax.lax.fori_loop(0, max_sweeps, sweep, 0)


def _cap_scalar(sweep_cap, max_sweeps, dtype):
    """The kernel's 4th SMEM scalar: the traced sweep cap (adaptive
    schedule), clamped to the static loop bound; the static bound itself
    when no traced cap is active."""
    if sweep_cap is None:
        return jnp.asarray(max_sweeps, dtype)
    return jnp.minimum(jnp.asarray(sweep_cap, jnp.float32),
                       max_sweeps).astype(dtype)


@functools.partial(jax.jit,
                   static_argnames=("max_sweeps", "block", "interpret"))
def nnls_batch_pallas_batched_a(a, B, X0, L1=0.0, L2=0.0, update_mask=None,
                                max_sweeps: int = CD_MAX_SWEEPS,
                                block: int = 256, interpret: bool = False,
                                n_coord=None, sweep_cap=None):
    """Pallas CD-NNLS with a per-column Gram batch a: (n, k, k)."""
    n, k = B.shape
    assert a.ndim == 3 and a.shape == (n, k, k)

    # leading-axis coordinate tiles: at[i, j, c] = a[c, j, i] (by Gram
    # symmetry = a[c, i, j]); at[i] is then contiguous in the kernel
    at = jnp.transpose(a, (2, 1, 0))   # (k, k, n)
    return nnls_batch_pallas_batched_at(
        at, B, X0, L1=L1, L2=L2, update_mask=update_mask,
        max_sweeps=max_sweeps, block=block, interpret=interpret,
        n_coord=n_coord, sweep_cap=sweep_cap)


@functools.partial(jax.jit,
                   static_argnames=("max_sweeps", "block", "interpret"))
def nnls_batch_pallas_batched_at(at, B, X0, L1=0.0, L2=0.0, update_mask=None,
                                 max_sweeps: int = CD_MAX_SWEEPS,
                                 block: int = 256, interpret: bool = False,
                                 n_coord=None, sweep_cap=None):
    """Pallas CD-NNLS with per-column Grams ALREADY in the coordinate-tile
    layout ``at`` (k, k, n) with ``at[i, j, c] = a_c[j, i]`` — the layout
    the kernel consumes. Producers that can emit this directly (the masked
    packed-Gram path via ``ops.linalg.unpack_sym_t``) skip the (n, k, k)
    materialization and its minor-axis relayout entirely."""
    n, k = B.shape
    assert at.ndim == 3 and at.shape == (k, k, n)
    assert n % block == 0, (n, block)
    dtype = B.dtype

    # per-column diagonal reciprocals from the tile layout: at[i, i, :]
    diag = jnp.take(at.reshape(k * k, n),
                    jnp.arange(k) * (k + 1), axis=0)     # (k, n)
    idiag = 1.0 / diag
    Bt = B.T
    X0t = X0.astype(dtype).T
    if update_mask is None:
        mask = jnp.ones((1, n), dtype)
    else:
        mask = update_mask.astype(dtype)[None, :]
    k_div = jnp.float32(k) if n_coord is None else \
        jnp.asarray(n_coord, jnp.float32)
    scalars = jnp.stack([jnp.asarray(L1, dtype), jnp.asarray(L2, dtype),
                         k_div.astype(dtype),
                         _cap_scalar(sweep_cap, max_sweeps, dtype)])

    grid = (n // block,)
    # the (k, k, block) Gram tile dominates VMEM; the pipeline double-buffers
    # grid inputs, so budget two copies plus the (k, block) vectors and slack.
    # Raising the limit past the 16 MB scoped default lets the block grow to
    # 512-1024 columns — the sweep chain is a sequential per-coordinate
    # recurrence, so wider blocks amortize its latency over more lanes
    # (measured: the masked-CV NNLS phase is latency-bound at block=128).
    vmem_bytes = min(2 * (k * k * block * 4) + 12 * k * block * 4
                     + (4 << 20), 128 << 20)
    out = pl.pallas_call(
        functools.partial(_nnls_kernel_batched, k=k, max_sweeps=max_sweeps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                  # idiag
            pl.BlockSpec((k, k, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), dtype),
        scratch_shapes=[
            pltpu.VMEM((k, block), dtype),      # residual copy of Bt
            pltpu.VMEM((1, block), dtype),      # active mask
            pltpu.SMEM((1,), jnp.int32),        # block-active flag
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(scalars, idiag, at, Bt, X0t, mask)
    return out.T


@functools.partial(jax.jit,
                   static_argnames=("max_sweeps", "block", "g", "interpret"))
def nnls_batch_pallas(a, B, X0, L1=0.0, L2=0.0, update_mask=None,
                      max_sweeps: int = CD_MAX_SWEEPS, block: int = 4096,
                      g: int = 16, interpret: bool = False, n_coord=None,
                      sweep_cap=None):
    """Pallas-fused equivalent of ops.nnls.nnls_batch for a shared (k,k) Gram.

    a: (k, k); B, X0: (n, k) with n a multiple of `block`; `g` is the
    coordinate group size for the MXU-recomputed residual. Returns X (n, k).
    """
    n, k = B.shape
    assert a.ndim == 2, "pallas path requires a shared Gram"
    assert n % block == 0, (n, block)
    dtype = B.dtype
    g = max(1, min(g, k))

    inv_diag = 1.0 / jnp.diagonal(a)   # (k,) — SMEM scalars in the kernel
    Bt = B.T                      # (k, n) — fused into the kernel's prologue
    X0t = X0.astype(dtype).T
    if update_mask is None:
        mask = jnp.ones((1, n), dtype)
    else:
        mask = update_mask.astype(dtype)[None, :]
    k_div = jnp.float32(k) if n_coord is None else \
        jnp.asarray(n_coord, jnp.float32)
    scalars = jnp.stack([jnp.asarray(L1, dtype), jnp.asarray(L2, dtype),
                         k_div.astype(dtype),
                         _cap_scalar(sweep_cap, max_sweeps, dtype)])

    grid = (n // block,)
    out = pl.pallas_call(
        functools.partial(_nnls_kernel, k=k, g=g, max_sweeps=max_sweeps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # scalars
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # inv diag
            pl.BlockSpec((k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                  # a
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                  # Bt
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                  # X0t
            pl.BlockSpec((1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),                  # mask
        ],
        out_specs=pl.BlockSpec((k, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), dtype),
        scratch_shapes=[
            pltpu.VMEM((k, block), dtype),      # Delta = X - X0
            pltpu.VMEM((g, block), dtype),      # group residual rows
            pltpu.VMEM((1, block), dtype),      # active mask
            pltpu.SMEM((1,), jnp.int32),        # block-active flag
        ],
        interpret=interpret,
    )(scalars, inv_diag, a, Bt, X0t, mask)
    return out.T
