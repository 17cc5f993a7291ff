"""Fused blocked-ELL SpMM Pallas kernels (ops/pallas_bell.py) vs the XLA
tile formulation — bitwise/near-exact equivalence in interpret mode,
including the in-kernel nnz keep-mask against the dense mask_block path."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from singlet_tpu.ops.pallas_bell import bell_spmm, bell_spmm_t
from singlet_tpu.ops.rngmask import mask_block, seed_pair
from singlet_tpu.parallel.sharded_ell import _bell_tile


def _planes(rng, genes=96, cells=48, density=0.2, gene_block=32):
    A = sp.random(genes, cells, density=density, random_state=3,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    from singlet_tpu import native

    n_gb = genes // gene_block
    from singlet_tpu.parallel.sharded_ell import bell_width, bell_widths

    width = bell_width(bell_widths(A, n_gb, gene_block))
    from singlet_tpu.parallel.sharded_ell import planes_to_device_layout

    li, lv = native.csc_to_bell(A, cells, gene_block, n_gb, width)
    return (A, jnp.asarray(planes_to_device_layout(li)),
            jnp.asarray(planes_to_device_layout(lv)), gene_block, n_gb)


def _gb_rows(li, gb, n_gb):
    width = li.shape[0] // n_gb
    return slice(gb * width, (gb + 1) * width)


def _xla_b(li, lv, W, gene_block, n_gb, keep=None):
    B = jnp.zeros((li.shape[1], W.shape[1]), W.dtype)
    for gb in range(n_gb):
        sl = _gb_rows(li, gb, n_gb)
        tile = _bell_tile(li[sl], lv[sl], gene_block)
        if keep is not None:
            tile = tile * keep[:, gb * gene_block:(gb + 1) * gene_block]
        B = B + tile @ W[gb * gene_block:(gb + 1) * gene_block]
    return B


@pytest.mark.parametrize("masked", [False, True])
def test_bell_spmm_matches_xla_tiles(rng, masked):
    A, li, lv, gene_block, n_gb = _planes(rng)
    genes, cells = A.shape
    k = 7
    W = jnp.asarray(rng.random((genes, k)).astype(np.float32))
    seed = seed_pair(11)
    ids = jnp.arange(cells, dtype=jnp.int32)
    inv_density = 5

    keep = None
    if masked:
        m = mask_block(seed, ids, jnp.arange(genes), inv_density)
        keep = 1.0 - m.astype(jnp.float32)

    got = bell_spmm(li, lv, W, seed, ids, gene_block=gene_block,
                    inv_density=inv_density, masked=masked, interpret=True)
    want = _xla_b(li, lv, W, gene_block, n_gb, keep=keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # against the raw operand too (unmasked case)
    if not masked:
        np.testing.assert_allclose(
            np.asarray(got), (A.T @ np.asarray(W)), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_bell_spmm_t_matches_xla_tiles(rng, masked):
    A, li, lv, gene_block, n_gb = _planes(rng)
    genes, cells = A.shape
    k = 6
    H = jnp.asarray(rng.random((cells, k)).astype(np.float32))
    seed = seed_pair(23)
    ids = jnp.arange(cells, dtype=jnp.int32)
    inv_density = 4

    keep = None
    if masked:
        m = mask_block(seed, ids, jnp.arange(genes), inv_density)
        keep = 1.0 - m.astype(jnp.float32)

    got = bell_spmm_t(li, lv, H, seed, ids, gene_block=gene_block,
                      n_gb=n_gb, inv_density=inv_density, masked=masked,
                      interpret=True)

    parts = []
    for gb in range(n_gb):
        sl = _gb_rows(li, gb, n_gb)
        tile = _bell_tile(li[sl], lv[sl], gene_block)
        if keep is not None:
            tile = tile * keep[:, gb * gene_block:(gb + 1) * gene_block]
        parts.append(tile.T @ H)
    want = jnp.concatenate(parts, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_keep_at_nnz_matches_dense_mask_on_global_ids(rng):
    """The in-kernel hash must agree with mask_block for NON-ZERO cell-id
    offsets too (global ids on a sharded mesh)."""
    A, li, lv, gene_block, n_gb = _planes(rng, genes=64, cells=32,
                                          gene_block=32)
    genes, cells = A.shape
    k = 3
    W = jnp.asarray(rng.random((genes, k)).astype(np.float32))
    seed = seed_pair(7)
    ids = jnp.arange(1000, 1000 + cells, dtype=jnp.int32)   # shard offset
    m = mask_block(seed, ids, jnp.arange(genes), 6)
    keep = 1.0 - m.astype(jnp.float32)

    got = bell_spmm(li, lv, W, seed, ids, gene_block=gene_block,
                    inv_density=6, masked=True, interpret=True)
    want = _xla_b(li, lv, W, gene_block, n_gb, keep=keep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
