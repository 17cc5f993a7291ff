"""TPU (non-interpret) correctness check of the bits kernels at a
mid-size shape, vs the XLA dense-mask reference."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/singlet_tpu_jax_cache")

from singlet_tpu.ops.linalg import packed_outer_products, pad_pairs, \
    triu_pairs
from singlet_tpu.ops.maskbits import pack_mask_words
from singlet_tpu.ops.pallas_maskgram import (mask_packed_h_t_bits,
                                             mask_packed_w_t_bits,
                                             quantize_pairs)
from singlet_tpu.ops.rngmask import mask_block, seed_pair

GENES, GENE_BLOCK, CELLS, K = 2048, 512, 4096, 32
INV = 20
rng = np.random.default_rng(0)
iu = triu_pairs(K)
npairs = K * (K + 1) // 2
np_pad = -(-npairs // 128) * 128
iu_pad = pad_pairs(iu, np_pad)
W = jnp.asarray(rng.random((GENES, K)).astype(np.float32))
H = jnp.asarray(rng.random((CELLS, K)).astype(np.float32))
Pw = packed_outer_products(W, iu_pad)
Ph = packed_outer_products(H, iu_pad)
seed = seed_pair(123)
ids = jnp.arange(CELLS, dtype=jnp.int32)
words = pack_mask_words(seed, ids, genes_pad=GENES, gene_block=GENE_BLOCK,
                        inv_density=INV, cells_true=CELLS, genes_true=GENES)
m = mask_block(seed, ids, jnp.arange(GENES), INV).astype(jnp.float32)

# --- w-side ---
q, s = quantize_pairs(Pw, axis=0)
got = mask_packed_w_t_bits(q, s, words.T, gene_block=GENE_BLOCK)
want = jnp.dot(m, q.astype(jnp.float32) * s[None, :],
               precision=jax.lax.Precision.HIGHEST).T
d = np.abs(np.asarray(got[:npairs]) - np.asarray(want[:npairs]))
rel = d / (np.abs(np.asarray(want[:npairs])) + 1e-3)
print("mpw int8 max rel", rel.max())

ones = jnp.ones((np_pad,), jnp.float32)
got16 = mask_packed_w_t_bits(Pw.astype(jnp.bfloat16), ones, words.T,
                             gene_block=GENE_BLOCK)
want16 = jnp.dot(m, Pw, precision=jax.lax.Precision.HIGHEST).T
rel16 = np.abs(np.asarray(got16[:npairs]) - np.asarray(want16[:npairs])) / (
    np.abs(np.asarray(want16[:npairs])) + 1e-3)
print("mpw bf16 max rel", rel16.max())

# int8 vs true f32 product (quantization error, informative)
relq = np.abs(np.asarray(got[:npairs]) - np.asarray(want16[:npairs])) / (
    np.abs(np.asarray(want16[:npairs])) + 1e-3)
print("mpw int8-vs-f32 max rel", relq.max())

# --- h-side ---
qh, sh = quantize_pairs(Ph, axis=0)
acc0 = jnp.full((np_pad, GENES), 0.25, jnp.float32)
goth = mask_packed_h_t_bits(qh, sh, words, acc0, gene_block=GENE_BLOCK)
wanth = 0.25 + jnp.dot((qh.astype(jnp.float32) * sh[None, :]).T, m,
                       precision=jax.lax.Precision.HIGHEST)
dh = np.abs(np.asarray(goth[:npairs]) - np.asarray(wanth[:npairs]))
relh = dh / (np.abs(np.asarray(wanth[:npairs])) + 1e-3)
print("mph int8 max rel", relh.max())

# --- h-side, HASH kernel: the aliasing regression check. A revisited
# output block's VMEM window is NOT initialized from the aliased HBM
# content on hardware (interpret mode initializes it), so this kernel
# once silently dropped the carry ON DEVICE while its interpret test
# passed — keep this on-chip check alive.
from singlet_tpu.ops.pallas_maskgram import mask_packed_h_t

got_hash = mask_packed_h_t(Ph, seed, ids, acc0, gene_block=GENE_BLOCK,
                           inv_density=INV, cells_true=CELLS,
                           genes_true=GENES)
want_hash = 0.25 + jnp.dot(Ph.astype(jnp.bfloat16).T,
                           m.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
rel_hash = np.abs(np.asarray(got_hash[:npairs]) -
                  np.asarray(want_hash[:npairs])) / (
    np.abs(np.asarray(want_hash[:npairs])) + 1e-3)
print("mph hash max rel", rel_hash.max())
assert rel_hash.max() < 1e-4, "aliased-carry regression"

# --- bits keep-mask bELL SpMMs vs the hash kernels (bit-identical keep) -
from benchmarks.largescale import build_sharded_ell_synth
from singlet_tpu.ops.pallas_bell import (bell_spmm, bell_spmm_bits,
                                         bell_spmm_t, bell_spmm_t_bits)

data = build_sharded_ell_synth(GENES, CELLS, 96, gene_block=GENE_BLOCK)
li, lv = data.b_li, data.b_val
wb = bell_spmm(li, lv, W, seed, ids, gene_block=GENE_BLOCK,
               inv_density=INV, masked=True)
gb = bell_spmm_bits(li, lv, W, words.T, gene_block=GENE_BLOCK)
print("bell_spmm bits-vs-hash max abs",
      float(jnp.max(jnp.abs(wb - gb))))
wbw = bell_spmm_t(li, lv, H, seed, ids, gene_block=GENE_BLOCK,
                  n_gb=GENES // GENE_BLOCK, inv_density=INV, masked=True)
gbw = bell_spmm_t_bits(li, lv, H, words.T, gene_block=GENE_BLOCK,
                       n_gb=GENES // GENE_BLOCK)
print("bell_spmm_t bits-vs-hash max abs",
      float(jnp.max(jnp.abs(wbw - gbw))))
print("OK")
