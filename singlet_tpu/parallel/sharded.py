"""Multi-chip sharded ALS engine.

The reference's only compute parallelism is OpenMP threads over matrix
columns in one shared-memory process (reference:src/singlet.cpp:336-338 and
SURVEY.md §2.3). The TPU-native equivalent is a 1-D device mesh over *cells*:

  * A (genes x cells)  -> sharded on the cell axis, resident per chip
  * H (cells x k)      -> sharded on cells
  * W (genes x k)      -> replicated
  * h-update           -> embarrassingly parallel (each chip solves NNLS for
                          its local cells; the k x k Gram of W is replicated)
  * w-update           -> each chip computes partial (genes x k) products over
                          its local cells; one psum over ICI assembles the
                          global right-hand sides and Gram; the gene NNLS is
                          solved replicated (k x genes work is tiny vs the
                          cell axis)
  * CV masks           -> recomputed from the counter RNG with *global* cell
                          indices, so every chip derives identical test-set
                          membership with zero communication — the same
                          property the reference's stateless rng.draw(i,j)
                          provides across OpenMP threads
                          (reference:src/singlet.cpp:30-64,450).

Per-iteration communication: psum of a k x k Gram, a (block x k) RHS per gene
block and a packed (block x k(k+1)/2) Gram-correction — a few MB over ICI,
negligible against the cell-axis compute. This is a new component with no
reference counterpart (the reference has no distributed backend; SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from singlet_tpu.ops.linalg import (
    MM_PRECISION,
    cor_distance,
    mask_dot_t,
    packed_outer_products,
    triu_pairs,
)
from singlet_tpu.ops.nnls import (solve_nnls, solve_nnls_packed_t,
                                  sweep_cap_update)
from singlet_tpu.ops.rngmask import mask_block, seed_pair

AXIS = "cells"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class ShardedData:
    """Cell-sharded dense operand + geometry."""

    A: jnp.ndarray            # (genes_pad, cells_pad) sharded P(None, AXIS)
    nonempty: jnp.ndarray     # (cells_pad,) sharded P(AXIS)
    mesh: Mesh
    genes_true: int
    cells_true: int
    cell_block: int           # per-device column block for masked updates
    gene_block: int

    @property
    def genes_pad(self) -> int:
        return self.A.shape[0]

    @property
    def cells_pad(self) -> int:
        return self.A.shape[1]


def cell_geometry(genes: int, cells: int, mesh: Mesh, cell_block: int = 1024,
                  gene_block: int = 2048):
    """(genes_pad, cells_pad, cell_block, gene_block) for a cell-sharded
    operand on this mesh — the single source of truth shared by single-host
    ``shard_data`` and multi-host ``shard_cells_from_local`` so both produce
    bit-identical global operands."""
    n_dev = mesh.devices.size
    cell_block = min(cell_block, _round_up(max(cells // n_dev, 1), 256))
    cells_pad = _round_up(cells, n_dev * cell_block)
    gene_block = min(gene_block, _round_up(genes, 256))
    genes_pad = _round_up(genes, gene_block)
    return genes_pad, cells_pad, cell_block, gene_block


def shard_data(A: np.ndarray, mesh: Mesh, cell_block: int = 1024,
               gene_block: int = 2048) -> ShardedData:
    """Pad a genes x cells array and place it column-sharded on the mesh."""
    A = np.asarray(A, np.float32)
    genes, cells = A.shape
    genes_pad, cells_pad, cell_block, gene_block = cell_geometry(
        genes, cells, mesh, cell_block, gene_block)
    buf = np.zeros((genes_pad, cells_pad), np.float32)
    buf[:genes, :cells] = A
    ne = np.zeros((cells_pad,), bool)
    ne[:cells] = (np.abs(A) > 0).any(axis=0)
    Aj = jax.device_put(buf, NamedSharding(mesh, P(None, AXIS)))
    nej = jax.device_put(ne, NamedSharding(mesh, P(AXIS)))
    return ShardedData(A=Aj, nonempty=nej, mesh=mesh, genes_true=genes,
                       cells_true=cells, cell_block=cell_block,
                       gene_block=gene_block)


def _psum_gram(X_local, axis):
    a = jax.lax.psum(
        jnp.dot(X_local.T, X_local, precision=MM_PRECISION), axis)
    return a + 1e-15 * jnp.eye(a.shape[0], dtype=a.dtype)


def build_sharded_steps(mesh: Mesh, *, genes_true: int, cells_true: int,
                        genes_pad: int, cells_pad: int, cell_block: int,
                        gene_block: int, inv_density: int):
    """Build jitted sharded ALS steps (plain + masked) and mse_test for a
    fixed geometry. All functions are shard_map'ed over the cell mesh."""
    n_dev = mesh.shape[AXIS]
    cells_local = cells_pad // n_dev
    assert cells_local % cell_block == 0, (cells_local, cell_block)
    assert genes_pad % gene_block == 0

    in_specs_common = (P(None, AXIS), P(AXIS), P(None, None), P(AXIS, None))

    def _local_cell_ids(dev):
        return dev * cells_local + jnp.arange(cells_local)

    # ------------------------------------------------------------- plain
    def _plain(A_loc, ne_loc, W, H_loc, L1_h, L1_w, L2_h, L2_w,
               sweep_cap=None):
        k = W.shape[1]
        # h-update: fully local (W replicated, so its Gram is too)
        a_w = jnp.dot(W.T, W, precision=MM_PRECISION) + 1e-15 * jnp.eye(k)
        B_h = jnp.dot(A_loc.T, W, precision=MM_PRECISION)
        H_loc = solve_nnls(a_w, B_h, H_loc, L1=L1_h, L2=L2_h,
                           update_mask=ne_loc, sweep_cap=sweep_cap)
        d = jax.lax.psum(jnp.sum(H_loc, axis=0), AXIS) + 1e-15
        H_loc = H_loc / d[None, :]
        # w-update: psum partial products over cells
        a_h = _psum_gram(H_loc, AXIS)
        B_w = jax.lax.psum(
            jnp.dot(A_loc, H_loc, precision=MM_PRECISION), AXIS)
        gene_ne = jnp.any(A_loc != 0, axis=1)
        gene_ne = jax.lax.psum(gene_ne.astype(jnp.int32), AXIS) > 0
        W_new = solve_nnls(a_h, B_w, W, L1=L1_w, L2=L2_w,
                           update_mask=gene_ne, sweep_cap=sweep_cap)
        d = jnp.sum(W_new, axis=0) + 1e-15
        W_new = W_new / d[None, :]
        tol = cor_distance(W_new[:genes_true], W[:genes_true])
        return W_new, H_loc, d, tol

    # ------------------------------------------------------------ masked
    def _masked(A_loc, ne_loc, W, H_loc, seed, L1, L2, sweep_cap=None):
        k = W.shape[1]
        dev = jax.lax.axis_index(AXIS)
        cell_ids_local = _local_cell_ids(dev)
        gene_ids = jnp.arange(genes_pad)
        iu = triu_pairs(k)

        # ---- h-update over local cell blocks
        a_full = jnp.dot(W.T, W, precision=MM_PRECISION) + 1e-15 * jnp.eye(k)
        Pw = packed_outer_products(W, iu)

        def h_blk(_, bi):
            start = bi * cell_block
            ids = jax.lax.dynamic_slice_in_dim(cell_ids_local, start,
                                               cell_block)
            m = mask_block(seed, ids, gene_ids, inv_density)
            m = m & (ids < cells_true)[:, None] & (gene_ids < genes_true)[None, :]
            tile = jax.lax.dynamic_slice_in_dim(A_loc, start, cell_block, 1)
            keep = jnp.where(m.T, 0.0, 1.0).astype(W.dtype)
            B = jnp.dot((tile * keep).T, W, precision=MM_PRECISION)
            packed_t = mask_dot_t(Pw, m.astype(W.dtype), 1)
            Y0 = jax.lax.dynamic_slice_in_dim(H_loc, start, cell_block, 0)
            ne = jax.lax.dynamic_slice_in_dim(ne_loc, start, cell_block, 0)
            return None, solve_nnls_packed_t(a_full, packed_t, iu, B, Y0,
                                             L1=L1, L2=L2, update_mask=ne,
                                             sweep_cap=sweep_cap)

        _, Hs = jax.lax.scan(h_blk, None, jnp.arange(cells_local // cell_block))
        H_new = Hs.reshape(cells_local, k)
        d = jax.lax.psum(jnp.sum(H_new, axis=0), AXIS) + 1e-15
        H_new = H_new / d[None, :]

        # ---- w-update over gene blocks, partials psum'ed over cell shards
        a_h = _psum_gram(H_new, AXIS)
        Ph = packed_outer_products(H_new, iu)   # (cells_local, npairs)
        gene_ne = jax.lax.psum(
            jnp.any(A_loc != 0, axis=1).astype(jnp.int32), AXIS) > 0

        def w_blk(_, bi):
            start = bi * gene_block
            gids = start + jnp.arange(gene_block)
            m = mask_block(seed, cell_ids_local, gids, inv_density).T
            m = m & (gids < genes_true)[:, None] & (cell_ids_local < cells_true)[None, :]
            tile = jax.lax.dynamic_slice_in_dim(A_loc, start, gene_block, 0)
            keep = jnp.where(m, 0.0, 1.0).astype(W.dtype)
            B = jax.lax.psum(
                jnp.dot(tile * keep, H_new, precision=MM_PRECISION), AXIS)
            packed_t = jax.lax.psum(mask_dot_t(Ph, m.astype(W.dtype), 1),
                                    AXIS)
            Y0 = jax.lax.dynamic_slice_in_dim(W, start, gene_block, 0)
            ne = jax.lax.dynamic_slice_in_dim(gene_ne, start, gene_block, 0)
            return None, solve_nnls_packed_t(a_h, packed_t, iu, B, Y0,
                                             L1=L1, L2=L2, update_mask=ne,
                                             sweep_cap=sweep_cap)

        _, Ws = jax.lax.scan(w_blk, None, jnp.arange(genes_pad // gene_block))
        W_new = Ws.reshape(genes_pad, k)
        d = jnp.sum(W_new, axis=0) + 1e-15
        W_new = W_new / d[None, :]
        tol = cor_distance(W_new[:genes_true], W[:genes_true])
        return W_new, H_new, d, tol

    # --------------------------------------------------------------- mse
    def _mse(A_loc, W, d, H_loc, seed):
        dev = jax.lax.axis_index(AXIS)
        cell_ids_local = _local_cell_ids(dev)
        gene_ids = jnp.arange(genes_pad)
        Wd = W * d[None, :]

        def blk(acc, bi):
            start = bi * cell_block
            ids = jax.lax.dynamic_slice_in_dim(cell_ids_local, start,
                                               cell_block)
            m = mask_block(seed, ids, gene_ids, inv_density)
            m = m & (ids < cells_true)[:, None] & (gene_ids < genes_true)[None, :]
            tile = jax.lax.dynamic_slice_in_dim(A_loc, start, cell_block, 1)
            Hb = jax.lax.dynamic_slice_in_dim(H_loc, start, cell_block, 0)
            pred = jnp.dot(Hb, Wd.T, precision=MM_PRECISION)
            diff2 = jnp.square(pred - tile.T)
            s = jnp.sum(jnp.where(m, diff2, 0.0), axis=1)
            n = jnp.sum(m, axis=1)
            return acc + jnp.sum(jnp.where(n > 0, s / jnp.maximum(n, 1), 0.0)), None

        acc, _ = jax.lax.scan(blk, jnp.zeros((), W.dtype),
                              jnp.arange(cells_local // cell_block))
        return jax.lax.psum(acc, AXIS) / cells_true

    # trailing sweep_cap (traced scalar) = the adaptive inexact-solve
    # schedule, so the host fit loop matches the fused single-chip engine
    def _plain_w(*a):
        return _plain(*a[:-1], sweep_cap=a[-1])

    def _masked_w(*a):
        return _masked(*a[:-1], sweep_cap=a[-1])

    plain_step = jax.jit(jax.shard_map(
        _plain_w, mesh=mesh,
        in_specs=in_specs_common + (P(), P(), P(), P(), P()),
        out_specs=(P(None, None), P(AXIS, None), P(None), P()),
        check_vma=False,
    ))
    masked_step = jax.jit(jax.shard_map(
        _masked_w, mesh=mesh,
        in_specs=in_specs_common + (P(None), P(), P(), P()),
        out_specs=(P(None, None), P(AXIS, None), P(None), P()),
        check_vma=False,
    ))
    mse_fn = jax.jit(jax.shard_map(
        _mse, mesh=mesh,
        in_specs=(P(None, AXIS), P(None, None), P(None), P(AXIS, None), P(None)),
        out_specs=P(),
        check_vma=False,
    ))
    return plain_step, masked_step, mse_fn


# ---------------------------------------------------------------------------
# High-level sharded fit
# ---------------------------------------------------------------------------

def sharded_nmf_fit(A: np.ndarray, k: int, mesh: Optional[Mesh] = None,
                    tol: float = 1e-4, maxit: int = 100,
                    L1: float = 0.01, L2: float = 0.0, seed: int = 0,
                    masked: bool = False, inv_density: int = 20,
                    mask_seed: int = 0, verbose: bool = False,
                    w_init: Optional[np.ndarray] = None):
    """Fit NMF with cells sharded across the mesh. Returns (w, d, h, traces).

    Semantics match the single-chip engine (and therefore the reference);
    tests assert 1-chip vs N-chip equivalence.
    """
    mesh = mesh or make_mesh()
    data = shard_data(A, mesh)
    plain_step, masked_step, mse_fn = build_sharded_steps(
        mesh, genes_true=data.genes_true, cells_true=data.cells_true,
        genes_pad=data.genes_pad, cells_pad=data.cells_pad,
        cell_block=data.cell_block, gene_block=data.gene_block,
        inv_density=inv_density)

    k = int(k)
    if w_init is None:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5117)
        W = jax.random.uniform(key, (data.genes_pad, k), dtype=jnp.float32)
        W = jnp.where((jnp.arange(data.genes_pad) < data.genes_true)[:, None],
                      W, 0.0)
    else:
        W = jnp.zeros((data.genes_pad, k), jnp.float32)
        W = W.at[: w_init.shape[0]].set(jnp.asarray(w_init, jnp.float32))
    W = jax.device_put(W, NamedSharding(mesh, P(None, None)))
    H = jax.device_put(jnp.zeros((data.cells_pad, k), jnp.float32),
                       NamedSharding(mesh, P(AXIS, None)))
    d = jnp.ones((k,), jnp.float32)
    sp = seed_pair(mask_seed)

    tol_ = 1.0
    traces = []
    it = 0
    exact = jnp.bool_(False)   # adaptive-sweep exact-phase latch
    while it < maxit and tol_ > tol:
        cap, exact = sweep_cap_update(exact, jnp.float32(tol_),
                                      jnp.float32(tol), masked=bool(masked))
        cap = jnp.float32(1e9) if cap is None else cap
        if masked:
            W, H, d, tol_j = masked_step(data.A, data.nonempty, W, H, sp,
                                         jnp.float32(L1), jnp.float32(L2),
                                         cap)
        else:
            W, H, d, tol_j = plain_step(data.A, data.nonempty, W, H,
                                        jnp.float32(L1), jnp.float32(L1),
                                        jnp.float32(L2), jnp.float32(L2),
                                        cap)
        tol_ = float(tol_j)
        traces.append(tol_)
        if verbose:
            print(f"{it + 1:4d} | {tol_:8.2e}")
        it += 1

    out = dict(
        w=np.asarray(W[: data.genes_true]),
        d=np.asarray(d),
        h=np.asarray(H[: data.cells_true]).T,
        tol_trace=traces,
    )
    if masked:
        out["test_mse"] = float(mse_fn(data.A, W, d, H, sp))
    return out
