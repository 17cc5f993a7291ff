"""Bit-packed, fit-invariant CV test-set masks.

The speckled CV mask is a pure function of (seed, cell, gene) and the seed
is FIXED for the whole fit (reference:src/singlet.cpp:30-64 recomputes it
per access because storing a dense mask is cache-hostile on CPU). On TPU
the balance flips: re-hashing costs ~20 64-bit VPU ops per (cell, gene)
element in every masked kernel of every iteration, while the mask fits in
HBM at 1 bit/entry (1 GiB at the 524k x 16k config, sharded over chips
with the cell axis like every other per-cell operand). So the sharded
masked fit packs the mask ONCE per fit program and every consumer unpacks
words with one shift+AND.

Layout — gene-BITPLANE words, tiled to the engine's gene blocks so a
kernel tile unpacks with a single dynamic-scalar shift:

  n_gb = genes_pad // gene_block,  n_t = ceil(n_gb / 32)
  words: uint32 (cells, n_t * gene_block)
  mask(c, gb*gene_block + w) = (words[c, t*gene_block + w] >> s) & 1
      where t = gb >> 5, s = gb & 31

i.e. bitplane s of word group t holds the WHOLE gene block 32t+s. A
consumer of gene block gb slices ``gene_block`` contiguous lanes and
shifts by a scalar — no lane shuffles, no sub-word concat, any
``gene_block`` that is a lane multiple. The transposed orientation
(``words_t``, (n_t * gene_block, cells)) serves kernels whose tiles put
genes on sublanes; it is materialized once per fit by a plain XLA
transpose of the packed array.

Validity is baked in at pack time: padded cells/genes are never masked,
so consumers need no clamps (matches the clamped use in
parallel/sharded_ell.py:_masked/_mse).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from singlet_tpu.ops.rngmask import mask_block

U32 = jnp.uint32


def n_word_groups(n_gb: int) -> int:
    return -(-n_gb // 32)


@partial(jax.jit, static_argnames=("genes_pad", "gene_block", "inv_density",
                                   "cells_true", "genes_true", "cell_block"))
def pack_mask_words(seed: jnp.ndarray, cell_ids: jnp.ndarray, *,
                    genes_pad: int, gene_block: int, inv_density: int,
                    cells_true: int, genes_true: int,
                    cell_block: int = 2048) -> jnp.ndarray:
    """Pack the (validity-clamped) CV mask of ``cell_ids`` x all genes into
    bitplane words, (len(cell_ids), n_t * gene_block) uint32.

    Runs as a scan over ``cell_block``-cell slabs so the dense bool mask
    temp stays (cell_block, genes_pad); a non-multiple ``cell_ids``
    length halves the slab until it divides (never the full-matrix slab
    — that temp is ~8.6 GB at the 524k x 16k config).
    """
    n_gb = genes_pad // gene_block
    n_t = n_word_groups(n_gb)
    cells = cell_ids.shape[0]
    while cells % cell_block:
        cell_block = max(cell_block // 2, 1)
    # A large odd factor (e.g. a prime cell count) collapses the halving
    # toward cell_block=1 and a cells-length scan: fail fast instead of
    # tracing a pathological program. Engine callers always pass a
    # power-of-two-aligned cell count.
    if cell_block < 64 and cells > 4096:
        raise ValueError(
            f"pack_mask_words: {cells} cells do not divide into "
            f">=64-cell slabs (largest dividing slab {cell_block}); pad "
            f"cell_ids to a multiple of a reasonable block first")
    gene_ids = jnp.arange(genes_pad)
    shifts = jnp.arange(32, dtype=U32)

    def slab(_, bi):
        ids = jax.lax.dynamic_slice_in_dim(cell_ids, bi * cell_block,
                                           cell_block)
        m = mask_block(seed, ids, gene_ids, inv_density)
        m = m & (ids < cells_true)[:, None] & (gene_ids < genes_true)[None, :]
        m = m.astype(U32).reshape(cell_block, n_gb, gene_block)
        if n_t * 32 != n_gb:
            m = jnp.pad(m, ((0, 0), (0, n_t * 32 - n_gb), (0, 0)))
        m = m.reshape(cell_block, n_t, 32, gene_block)
        w = jnp.sum(m << shifts[None, None, :, None], axis=2, dtype=U32)
        return None, w.reshape(cell_block, n_t * gene_block)

    _, words = jax.lax.scan(slab, None,
                            jnp.arange(cells // cell_block))
    return words.reshape(cells, n_t * gene_block)


def unpack_gene_block(words: jnp.ndarray, gb, gene_block: int) -> jnp.ndarray:
    """Dense bool mask (cells, gene_block) of gene block ``gb`` (static or
    traced scalar) from packed words — one slice, one shift, one AND."""
    t = gb // 32
    s = (gb % 32).astype(U32) if hasattr(gb, "astype") else U32(gb % 32)
    w = jax.lax.dynamic_slice_in_dim(words, t * gene_block, gene_block, 1)
    return ((w >> s) & U32(1)).astype(jnp.bool_)


def unpack_all(words: jnp.ndarray, genes_pad: int,
               gene_block: int) -> jnp.ndarray:
    """Full dense bool mask (cells, genes_pad) — test/benchmark helper."""
    n_gb = genes_pad // gene_block
    cols = [unpack_gene_block(words, gb, gene_block) for gb in range(n_gb)]
    return jnp.concatenate(cols, axis=1)
