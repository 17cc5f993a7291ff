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


def _unpack8_kernel(w_ref, out_ref, *, n_gb: int, gene_block: int):
    for g in range(n_gb):
        t0 = (g // 32) * gene_block
        w = w_ref[:, t0:t0 + gene_block]
        m32 = ((w >> U32(g % 32)) & U32(1)).astype(jnp.int32)
        m8 = m32.astype(jnp.float32).astype(jnp.int8)
        out_ref[:, g * gene_block:(g + 1) * gene_block] = m8


@partial(jax.jit, static_argnames=("gene_block", "genes_pad", "interpret"))
def unpack_mask_bits(words: jnp.ndarray, *, gene_block: int,
                     genes_pad: int | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Dense int8 0/1 TEST mask (cells, genes_pad) from packed words — the
    ONCE-per-consumer-group unpack (round 5). The mask-materialization VPU
    chain (shift, AND, i32->f32->i8 with its sublane relayout) measured
    ~0.16 s per full 524k x 16k pass and EVERY masked product kernel paid it
    independently; unpacking once into a transient int8 buffer and letting
    the int8 MXU kernels read mask tiles DIRECTLY pays it once."""
    cells, wcols = words.shape
    n_t = wcols // gene_block
    n_gb = (genes_pad // gene_block) if genes_pad else 32 * n_t
    bc = min(1024, cells)
    while cells % bc:
        bc //= 2
    bc = max(bc, 8)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    genes_pad = n_gb * gene_block
    vmem = min(2 * 4 * bc * wcols + 3 * bc * genes_pad
               + 16 * bc * gene_block + (16 << 20), 127 << 20)
    return pl.pallas_call(
        partial(_unpack8_kernel, n_gb=n_gb, gene_block=gene_block),
        grid=(cells // bc,),
        in_specs=[pl.BlockSpec((bc, wcols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bc, genes_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cells, genes_pad), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(words)
