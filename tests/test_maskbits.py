"""Bit-packed fit-invariant CV masks (ops/maskbits.py) and the hash-free
bits product kernels (ops/pallas_maskgram.py *_bits, interpret mode):

* pack -> unpack must reproduce ``mask_block`` bit-for-bit including the
  validity clamp (padded cells/genes never masked);
* the bits kernels must match the XLA dense-mask product computed with the
  SAME operand rounding (int8: dequantized-operand f32 reference, exact
  because int32 accumulation never rounds; bf16: bf16-operand reference).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from singlet_tpu.ops.linalg import packed_outer_products, pad_pairs, \
    triu_pairs
from singlet_tpu.ops.maskbits import (pack_mask_words, unpack_all,
                                      unpack_gene_block)
from singlet_tpu.ops.pallas_maskgram import (mask_packed_h_t_bits,
                                             mask_packed_w_t_bits,
                                             quantize_pairs)
from singlet_tpu.ops.rngmask import mask_block, seed_pair

GENES, GENE_BLOCK, CELLS, K = 96, 32, 48, 5
INV_DENSITY = 5


def _mask(seed, ids, cells_true, genes_true):
    m = mask_block(seed, ids, jnp.arange(GENES), INV_DENSITY)
    return (m & (ids < cells_true)[:, None]
            & (jnp.arange(GENES) < genes_true)[None, :])


@pytest.mark.parametrize("clamped", [False, True])
def test_pack_unpack_roundtrip(clamped):
    cells_true = CELLS - 10 if clamped else CELLS
    genes_true = GENES - 7 if clamped else GENES
    seed = seed_pair(13)
    ids = jnp.arange(CELLS, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=GENES,
                            gene_block=GENE_BLOCK, inv_density=INV_DENSITY,
                            cells_true=cells_true, genes_true=genes_true,
                            cell_block=16)
    n_gb = GENES // GENE_BLOCK
    assert words.shape == (CELLS, -(-n_gb // 32) * GENE_BLOCK)
    want = np.asarray(_mask(seed, ids, cells_true, genes_true))
    got = np.asarray(unpack_all(words, GENES, GENE_BLOCK))
    np.testing.assert_array_equal(got, want)
    # per-block unpack agrees with the full unpack
    for gb in range(n_gb):
        blk = np.asarray(unpack_gene_block(words, gb, GENE_BLOCK))
        np.testing.assert_array_equal(
            blk, want[:, gb * GENE_BLOCK:(gb + 1) * GENE_BLOCK])


def test_pack_many_gene_blocks_multi_group():
    """More than 32 gene blocks forces a second word group."""
    genes, gene_block = 8 * 64, 8          # 64 blocks -> n_t = 2
    seed = seed_pair(7)
    ids = jnp.arange(16, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=genes, gene_block=gene_block,
                            inv_density=3, cells_true=16, genes_true=genes,
                            cell_block=16)
    assert words.shape == (16, 2 * gene_block)
    m = mask_block(seed, ids, jnp.arange(genes), 3)
    np.testing.assert_array_equal(np.asarray(unpack_all(words, genes,
                                                        gene_block)),
                                  np.asarray(m))


def test_bits_kernels_multi_word_group(rng):
    """n_gb > 32 exercises word group 1+ (the g // 32 block-index maps and
    the g % 32 shifts) in BOTH bits product kernels — everywhere else in
    the suite and on the benchmark config g // 32 is always 0."""
    genes, gene_block, cells, k = 512, 8, 16, 3    # n_gb = 64, n_t = 2
    inv = 3
    iu = triu_pairs(k)
    np_pad = 128
    iu_pad = pad_pairs(iu, np_pad)
    W = jnp.asarray(rng.random((genes, k)).astype(np.float32))
    H = jnp.asarray(rng.random((cells, k)).astype(np.float32))
    Pw = packed_outer_products(W, iu_pad)
    Ph = packed_outer_products(H, iu_pad)
    seed = seed_pair(5)
    ids = jnp.arange(cells, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=genes,
                            gene_block=gene_block, inv_density=inv,
                            cells_true=cells, genes_true=genes)
    m = mask_block(seed, ids, jnp.arange(genes), inv).astype(jnp.float32)
    npairs = iu[0].shape[0]

    q, s = quantize_pairs(Pw, axis=0)
    got = mask_packed_w_t_bits(q, s, words.T, gene_block=gene_block,
                               interpret=True)
    want = jnp.dot(m, q.astype(jnp.float32) * s[None, :]).T
    np.testing.assert_allclose(np.asarray(got[:npairs]),
                               np.asarray(want[:npairs]),
                               rtol=1e-5, atol=1e-5)

    qh, sh = quantize_pairs(Ph, axis=0)
    acc0 = jnp.zeros((np_pad, genes), jnp.float32)
    goth = mask_packed_h_t_bits(qh, sh, words, acc0, gene_block=gene_block,
                                interpret=True)
    wanth = jnp.dot((qh.astype(jnp.float32) * sh[None, :]).T, m)
    np.testing.assert_allclose(np.asarray(goth[:npairs]),
                               np.asarray(wanth[:npairs]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
def test_mask_packed_w_t_bits_matches_dense(rng, dtype):
    cells_true, genes_true = CELLS - 10, GENES - 7
    k = K
    iu = triu_pairs(k)
    np_pad = 128
    iu_pad = pad_pairs(iu, np_pad)
    W = jnp.asarray(rng.random((GENES, k)).astype(np.float32))
    Pw = packed_outer_products(W, iu_pad)
    seed = seed_pair(13)
    ids = jnp.arange(CELLS, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=GENES,
                            gene_block=GENE_BLOCK, inv_density=INV_DENSITY,
                            cells_true=cells_true, genes_true=genes_true)
    m = _mask(seed, ids, cells_true, genes_true).astype(jnp.float32)
    if dtype == "int8":
        q, s = quantize_pairs(Pw, axis=0)
        got = mask_packed_w_t_bits(q, s, words.T, gene_block=GENE_BLOCK,
                                   interpret=True)
        # int32 accumulation is exact: the only rounding is the operand
        # quantization, so the dequantized-operand f32 product is the
        # bit-level reference
        want = jnp.dot(m, q.astype(jnp.float32) * s[None, :]).T
        tol = dict(rtol=1e-6, atol=1e-6)
    else:
        ones = jnp.ones((np_pad,), jnp.float32)
        got = mask_packed_w_t_bits(Pw.astype(jnp.bfloat16), ones, words.T,
                                   gene_block=GENE_BLOCK, interpret=True)
        want = jnp.dot(m.astype(jnp.bfloat16), Pw.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).T
        tol = dict(rtol=1e-5, atol=1e-5)
    npairs = iu[0].shape[0]
    assert got.shape == (np_pad, CELLS)
    np.testing.assert_allclose(np.asarray(got[:npairs]),
                               np.asarray(want[:npairs]), **tol)


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
def test_mask_packed_h_t_bits_matches_dense(rng, dtype):
    cells_true, genes_true = CELLS - 5, GENES - 3
    k = K
    iu = triu_pairs(k)
    np_pad = 128
    iu_pad = pad_pairs(iu, np_pad)
    H = jnp.asarray(rng.random((CELLS, k)).astype(np.float32))
    Ph = packed_outer_products(H, iu_pad)
    seed = seed_pair(29)
    ids = jnp.arange(CELLS, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=GENES,
                            gene_block=GENE_BLOCK, inv_density=INV_DENSITY,
                            cells_true=cells_true, genes_true=genes_true)
    m = _mask(seed, ids, cells_true, genes_true).astype(jnp.float32)
    acc0 = jnp.full((np_pad, GENES), 0.25, jnp.float32)
    if dtype == "int8":
        q, s = quantize_pairs(Ph, axis=0)
        got = mask_packed_h_t_bits(q, s, words, acc0, gene_block=GENE_BLOCK,
                                   interpret=True)
        want = 0.25 + jnp.dot((q.astype(jnp.float32) * s[None, :]).T, m)
        tol = dict(rtol=1e-6, atol=1e-6)
    else:
        ones = jnp.ones((np_pad,), jnp.float32)
        got = mask_packed_h_t_bits(Ph.astype(jnp.bfloat16), ones, words,
                                   acc0, gene_block=GENE_BLOCK,
                                   interpret=True)
        want = 0.25 + jnp.dot(Ph.astype(jnp.bfloat16).T,
                              m.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
        tol = dict(rtol=1e-5, atol=1e-5)
    npairs = iu[0].shape[0]
    assert got.shape == (np_pad, GENES)
    np.testing.assert_allclose(np.asarray(got[:npairs]),
                               np.asarray(want[:npairs]), **tol)


def test_bell_mse_bits_matches_xla(rng):
    """The fused masked-MSE kernel (interpret) vs the dense XLA formula on
    a small blocked-ELL operand."""
    import scipy.sparse as sp

    from singlet_tpu import native
    from singlet_tpu.ops.pallas_bell import bell_mse_bits
    from singlet_tpu.parallel.sharded_ell import (bell_width, bell_widths,
                                                  planes_to_device_layout)

    genes, gene_block, cells, k = 96, 32, 48, 5
    inv = 5
    A = sp.random(genes, cells, density=0.2, random_state=1, format="csc",
                  dtype=np.float32)
    n_gb = genes // gene_block
    width = bell_width(bell_widths(A, n_gb, gene_block))
    li, lv = native.csc_to_bell(A, cells, gene_block, n_gb, width)
    li2 = jnp.asarray(planes_to_device_layout(li))
    lv2 = jnp.asarray(planes_to_device_layout(lv))
    W = jnp.asarray(rng.random((genes, k)).astype(np.float32))
    d = jnp.asarray(rng.random((k,)).astype(np.float32)) + 0.5
    H = jnp.asarray(rng.random((cells, k)).astype(np.float32))
    seed = seed_pair(11)
    ids = jnp.arange(cells, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=genes,
                            gene_block=gene_block, inv_density=inv,
                            cells_true=cells, genes_true=genes)
    out = bell_mse_bits(li2, lv2, words.T, W * d[None, :], H,
                        gene_block=gene_block, interpret=True)
    m = np.asarray(mask_block(seed, ids, jnp.arange(genes), inv))
    pred = np.asarray(H) @ (np.asarray(W) * np.asarray(d)[None, :]).T
    diff2 = (pred - np.asarray(A.todense()).T) ** 2
    s_want = (diff2 * m).sum(axis=1)
    n_want = m.sum(axis=1)
    np.testing.assert_allclose(np.asarray(out[0]), s_want, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out[1]), n_want)


def test_bell_spmm_bits_matches_hash(rng):
    """The bits keep-mask bELL SpMM kernels (interpret) vs the in-kernel
    hash kernels — identical keep factors, identical products."""
    import scipy.sparse as sp

    from singlet_tpu import native
    from singlet_tpu.ops.pallas_bell import (bell_spmm, bell_spmm_bits,
                                             bell_spmm_t, bell_spmm_t_bits)
    from singlet_tpu.parallel.sharded_ell import (bell_width, bell_widths,
                                                  planes_to_device_layout)

    genes, gene_block, cells, k = 96, 32, 48, 5
    inv = 5
    A = sp.random(genes, cells, density=0.2, random_state=2, format="csc",
                  dtype=np.float32)
    A.data = np.abs(A.data) + 0.1
    n_gb = genes // gene_block
    width = bell_width(bell_widths(A, n_gb, gene_block))
    li, lv = native.csc_to_bell(A, cells, gene_block, n_gb, width)
    li2 = jnp.asarray(planes_to_device_layout(li))
    lv2 = jnp.asarray(planes_to_device_layout(lv))
    W = jnp.asarray(rng.random((genes, k)).astype(np.float32))
    H = jnp.asarray(rng.random((cells, k)).astype(np.float32))
    seed = seed_pair(17)
    ids = jnp.arange(cells, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=genes,
                            gene_block=gene_block, inv_density=inv,
                            cells_true=cells, genes_true=genes)

    want_b = bell_spmm(li2, lv2, W, seed, ids, gene_block=gene_block,
                       inv_density=inv, masked=True, interpret=True)
    got_b = bell_spmm_bits(li2, lv2, W, words.T, gene_block=gene_block,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-6, atol=1e-6)

    want_bw = bell_spmm_t(li2, lv2, H, seed, ids, gene_block=gene_block,
                          n_gb=n_gb, inv_density=inv, masked=True,
                          interpret=True)
    got_bw = bell_spmm_t_bits(li2, lv2, H, words.T, gene_block=gene_block,
                              n_gb=n_gb, interpret=True)
    np.testing.assert_allclose(np.asarray(got_bw), np.asarray(want_bw),
                               rtol=1e-6, atol=1e-6)


def test_bell_bits_kernels_multi_word_group(rng):
    """n_gb > 32 for the three bELL bits kernels (bell_spmm_bits,
    bell_spmm_t_bits, bell_mse_bits): they share the g // 32 word-group
    index maps and g % 32 shifts with the maskgram kernels, but every
    other test runs them at n_gb <= 3 (ADVICE r4)."""
    import scipy.sparse as sp

    from singlet_tpu import native
    from singlet_tpu.ops.pallas_bell import (bell_mse_bits, bell_spmm,
                                             bell_spmm_bits, bell_spmm_t,
                                             bell_spmm_t_bits)
    from singlet_tpu.parallel.sharded_ell import (bell_width, bell_widths,
                                                  planes_to_device_layout)

    genes, gene_block, cells, k = 512, 8, 16, 3    # n_gb = 64, n_t = 2
    inv = 3
    A = sp.random(genes, cells, density=0.15, random_state=3, format="csc",
                  dtype=np.float32)
    A.data = np.abs(A.data) + 0.1
    n_gb = genes // gene_block
    width = bell_width(bell_widths(A, n_gb, gene_block))
    li, lv = native.csc_to_bell(A, cells, gene_block, n_gb, width)
    li2 = jnp.asarray(planes_to_device_layout(li))
    lv2 = jnp.asarray(planes_to_device_layout(lv))
    W = jnp.asarray(rng.random((genes, k)).astype(np.float32))
    d = jnp.asarray(rng.random((k,)).astype(np.float32)) + 0.5
    H = jnp.asarray(rng.random((cells, k)).astype(np.float32))
    seed = seed_pair(23)
    ids = jnp.arange(cells, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=genes,
                            gene_block=gene_block, inv_density=inv,
                            cells_true=cells, genes_true=genes)

    want_b = bell_spmm(li2, lv2, W, seed, ids, gene_block=gene_block,
                       inv_density=inv, masked=True, interpret=True)
    got_b = bell_spmm_bits(li2, lv2, W, words.T, gene_block=gene_block,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=1e-6, atol=1e-6)

    want_bw = bell_spmm_t(li2, lv2, H, seed, ids, gene_block=gene_block,
                          n_gb=n_gb, inv_density=inv, masked=True,
                          interpret=True)
    got_bw = bell_spmm_t_bits(li2, lv2, H, words.T, gene_block=gene_block,
                              n_gb=n_gb, interpret=True)
    np.testing.assert_allclose(np.asarray(got_bw), np.asarray(want_bw),
                               rtol=1e-6, atol=1e-6)

    out = bell_mse_bits(li2, lv2, words.T, W * d[None, :], H,
                        gene_block=gene_block, interpret=True)
    m = np.asarray(mask_block(seed, ids, jnp.arange(genes), inv))
    pred = np.asarray(H) @ (np.asarray(W) * np.asarray(d)[None, :]).T
    diff2 = (pred - np.asarray(A.todense()).T) ** 2
    np.testing.assert_allclose(np.asarray(out[0]), (diff2 * m).sum(axis=1),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out[1]), m.sum(axis=1))


def test_quantize_pairs_precision(rng):
    """Per-pair int8 quantization error is bounded by scale/2 per element
    (comparable to the bf16 operand path's 2^-9 relative rounding)."""
    P = jnp.asarray(rng.random((256, 128)).astype(np.float32))
    q, s = quantize_pairs(P, axis=0)
    deq = q.astype(jnp.float32) * s[None, :]
    err = np.abs(np.asarray(deq - P))
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-12).all()


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
def test_mask_packed_m8_kernels_match_bits(rng, dtype):
    """The round-5 shared-unpack (prebuilt int8 mask) product kernels
    reproduce the *_bits kernels bit-for-bit on both paths."""
    from singlet_tpu.ops.maskbits import unpack_mask_bits
    from singlet_tpu.ops.pallas_maskgram import (mask_packed_h_t_m8,
                                                 mask_packed_w_t_m8)

    cells_true, genes_true = CELLS - 10, GENES - 7
    k = K
    iu = triu_pairs(k)
    np_pad = 128
    iu_pad = pad_pairs(iu, np_pad)
    W = jnp.asarray(rng.random((GENES, k)).astype(np.float32))
    H = jnp.asarray(rng.random((CELLS, k)).astype(np.float32))
    Pw = packed_outer_products(W, iu_pad)
    Ph = packed_outer_products(H, iu_pad)
    seed = seed_pair(31)
    ids = jnp.arange(CELLS, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=GENES,
                            gene_block=GENE_BLOCK, inv_density=INV_DENSITY,
                            cells_true=cells_true, genes_true=genes_true)
    m8 = unpack_mask_bits(words, gene_block=GENE_BLOCK, genes_pad=GENES,
                          interpret=True)
    acc0 = jnp.full((np_pad, GENES), 0.125, jnp.float32)
    if dtype == "int8":
        qw, sw = quantize_pairs(Pw, axis=0)
        qh, sh = quantize_pairs(Ph, axis=0)
    else:
        qw, sw = Pw.astype(jnp.bfloat16), jnp.ones((np_pad,), jnp.float32)
        qh, sh = Ph.astype(jnp.bfloat16), jnp.ones((np_pad,), jnp.float32)
    want_w = mask_packed_w_t_bits(qw, sw, words.T, gene_block=GENE_BLOCK,
                                  interpret=True)
    got_w = mask_packed_w_t_m8(qw, sw, m8.T, gene_block=GENE_BLOCK,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(want_w))
    want_h = mask_packed_h_t_bits(qh, sh, words, acc0,
                                  gene_block=GENE_BLOCK, interpret=True)
    got_h = mask_packed_h_t_m8(qh, sh, m8, acc0, gene_block=GENE_BLOCK,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))
