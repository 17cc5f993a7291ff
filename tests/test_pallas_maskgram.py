"""Fused masked packed-Gram product kernels (ops/pallas_maskgram.py) vs the
XLA dense-mask formulation — the mask hashed in-kernel must reproduce
mask_block exactly (incl. the validity clamp), and the transposed products
must match ``mask_dot_t`` up to bf16-operand rounding reassociation."""

import numpy as np
import jax.numpy as jnp
import pytest

from singlet_tpu.ops.linalg import (packed_outer_products, pad_pairs,
                                    triu_pairs, unpack_sym,
                                    unpack_sym_from_t)
from singlet_tpu.ops.pallas_maskgram import mask_packed_h_t, mask_packed_w_t
from singlet_tpu.ops.rngmask import mask_block, seed_pair

GENES, GENE_BLOCK, CELLS, K = 96, 32, 48, 5
INV_DENSITY = 5


def _mask(seed, ids, cells_true, genes_true):
    m = mask_block(seed, ids, jnp.arange(GENES), INV_DENSITY)
    return (m & (ids < cells_true)[:, None]
            & (jnp.arange(GENES) < genes_true)[None, :])


@pytest.mark.parametrize("clamped", [False, True])
def test_mask_packed_w_t_matches_dense(rng, clamped):
    cells_true = CELLS - 10 if clamped else CELLS
    genes_true = GENES - 7 if clamped else GENES
    k = K
    iu = triu_pairs(k)
    np_pad = 128
    iu_pad = pad_pairs(iu, np_pad)
    W = jnp.asarray(rng.random((GENES, k)).astype(np.float32))
    Pw = packed_outer_products(W, iu_pad)
    seed = seed_pair(13)
    ids = jnp.arange(CELLS, dtype=jnp.int32)

    got = mask_packed_w_t(Pw, seed, ids, gene_block=GENE_BLOCK,
                          inv_density=INV_DENSITY, cells_true=cells_true,
                          genes_true=genes_true, interpret=True)
    m = _mask(seed, ids, cells_true, genes_true).astype(jnp.float32)
    want = (jnp.dot(m.astype(jnp.bfloat16),
                    Pw.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)).T
    assert got.shape == (np_pad, CELLS)
    npairs = iu[0].shape[0]
    np.testing.assert_allclose(np.asarray(got[:npairs]),
                               np.asarray(want[:npairs]),
                               rtol=1e-5, atol=1e-5)


def test_mask_packed_h_t_matches_dense(rng):
    k = K
    iu = triu_pairs(k)
    np_pad = 128
    iu_pad = pad_pairs(iu, np_pad)
    H = jnp.asarray(rng.random((CELLS, k)).astype(np.float32))
    Ph = packed_outer_products(H, iu_pad)
    seed = seed_pair(29)
    ids = jnp.arange(CELLS, dtype=jnp.int32)
    cells_true, genes_true = CELLS - 5, GENES - 3

    acc0 = jnp.full((np_pad, GENES), 0.25, jnp.float32)
    got = mask_packed_h_t(Ph, seed, ids, acc0, gene_block=GENE_BLOCK,
                          inv_density=INV_DENSITY,
                          cells_true=cells_true, genes_true=genes_true,
                          interpret=True)
    m = _mask(seed, ids, cells_true, genes_true).astype(jnp.float32)
    # the kernel accumulates INTO the donated carry
    want = 0.25 + jnp.dot(Ph.astype(jnp.bfloat16).T,
                          m.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    assert got.shape == (np_pad, GENES)
    npairs = iu[0].shape[0]
    np.testing.assert_allclose(np.asarray(got[:npairs]),
                               np.asarray(want[:npairs]),
                               rtol=1e-5, atol=1e-5)


def test_unpack_sym_from_t_matches_unpack_sym(rng):
    """The transposed-packed Gram unpack must equal the batch unpack."""
    k = K
    iu = triu_pairs(k)
    npairs = k * (k + 1) // 2
    np_pad = 128
    n = 16
    a0 = rng.random((k, k)).astype(np.float32)
    a_full = jnp.asarray(a0 + a0.T)   # Grams are symmetric; the tile layout
    # identity at[i, j, c] = a_c[j, i] = a_c[i, j] relies on it
    packed = jnp.asarray(rng.random((n, npairs)).astype(np.float32))
    packed_t = jnp.zeros((np_pad, n), jnp.float32)
    packed_t = packed_t.at[:npairs].set(packed.T)
    # garbage in the pad rows must not leak into the unpack
    packed_t = packed_t.at[npairs:].set(1e6)

    at = unpack_sym_from_t(packed_t, k, iu, a_full)     # (k, k, n)
    want = a_full[None] - unpack_sym(packed, k, iu)     # (n, k, k)
    np.testing.assert_allclose(np.asarray(at),
                               np.asarray(want).transpose(2, 1, 0),
                               rtol=0, atol=0)
