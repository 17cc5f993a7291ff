"""Multi-host runtime pieces, exercised single-process on the 8-device CPU
mesh: process-local ingest must reproduce the single-host ``shard_data``
operand exactly, and the fit run from the multi-host ingest path must match.
"""

import numpy as np
import jax
import pytest

from singlet_tpu.parallel.multihost import (
    cell_geometry,
    global_mesh,
    initialize,
    process_cell_range,
    shard_cells_from_local,
)
from singlet_tpu.parallel.sharded import (
    build_sharded_steps,
    make_mesh,
    shard_data,
    sharded_nmf_fit,
)
from singlet_tpu.solvers.als import init_w


def _synthetic(rng, genes=50, cells=70, k=4):
    W = rng.random((genes, k)).astype(np.float32)
    H = rng.random((k, cells)).astype(np.float32)
    A = (W @ H).astype(np.float32)
    A[rng.random(A.shape) < 0.5] = 0
    return A


def test_initialize_single_process_noop():
    initialize()          # must not raise without a coordinator
    assert jax.process_count() == 1


def test_geometry_matches_shard_data(rng):
    A = _synthetic(rng)
    mesh = make_mesh(8)
    sd = shard_data(A, mesh)
    gp, cp, cb, gb = cell_geometry(A.shape[0], A.shape[1], mesh)
    assert (gp, cp) == (sd.genes_pad, sd.cells_pad)
    assert (cb, gb) == (sd.cell_block, sd.gene_block)
    start, stop = process_cell_range(A.shape[0], A.shape[1], mesh)
    assert (start, stop) == (0, sd.cells_pad)   # 1 process owns everything


def test_local_ingest_equals_full_ingest(rng):
    A = _synthetic(rng)
    mesh = global_mesh()
    sd_full = shard_data(A, mesh)
    # single process: the "local chunk" is every true column
    sd_local = shard_cells_from_local(A, A.shape[1], mesh)
    np.testing.assert_array_equal(np.asarray(sd_local.A),
                                  np.asarray(sd_full.A))
    np.testing.assert_array_equal(np.asarray(sd_local.nonempty),
                                  np.asarray(sd_full.nonempty))
    assert sd_local.cell_block == sd_full.cell_block
    assert sd_local.gene_block == sd_full.gene_block


def test_fit_from_multihost_ingest_matches(rng):
    A = _synthetic(rng)
    mesh = make_mesh(8)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    ref = sharded_nmf_fit(A, 3, mesh=mesh, w_init=w0, tol=0.0, maxit=4)

    sd = shard_cells_from_local(A, A.shape[1], mesh)
    plain_step, _, _ = build_sharded_steps(
        mesh, genes_true=sd.genes_true, cells_true=sd.cells_true,
        genes_pad=sd.genes_pad, cells_pad=sd.cells_pad,
        cell_block=sd.cell_block, gene_block=sd.gene_block, inv_density=20)
    import jax.numpy as jnp
    W = jnp.zeros((sd.genes_pad, 3), jnp.float32).at[: A.shape[0]].set(w0)
    H = jnp.zeros((sd.cells_pad, 3), jnp.float32)
    from singlet_tpu.ops.nnls import sweep_cap_update
    exact = jnp.bool_(False)
    tol_ = 1.0
    for _ in range(4):
        # replicate sharded_nmf_fit's adaptive sweep schedule exactly
        cap, exact = sweep_cap_update(exact, jnp.float32(tol_),
                                      jnp.float32(0.0))
        cap = jnp.float32(1e9) if cap is None else cap
        W, H, d, tol = plain_step(sd.A, sd.nonempty, W, H,
                                  jnp.float32(0.01), jnp.float32(0.01),
                                  jnp.float32(0.0), jnp.float32(0.0), cap)
        tol_ = float(tol)
    np.testing.assert_allclose(np.asarray(W[: A.shape[0]]), ref["w"],
                               rtol=2e-4, atol=2e-5)
