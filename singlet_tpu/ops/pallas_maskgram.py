"""Fused Pallas TPU kernels for the masked packed-Gram products — the
masked-CV bottleneck — with the CV mask evaluated IN-KERNEL.

The masked half-updates need, per cell block (reference ``predict_mask``,
reference:src/singlet.cpp:436-531, via the packed-outer-product trick of
ops/linalg.py:packed_outer_products):

  * h-side   packed[p, c] = sum_g  mask(c, g) * Pw[g, p]     (npairs, block)
  * w-side   Pk[p, g]    += sum_c  mask(c, g) * Ph[c, p]     (npairs, genes)

The XLA formulation materializes the dense 0/1 mask tile (block x genes —
128 MB per block at the 524k-cell config) in HBM and feeds it to
``mask_dot`` as a matmul operand. These kernels build each (cells x
gene_block) mask sub-tile in VMEM from the counter-RNG hash
(ops/rngmask.py, bit-faithful to reference:src/singlet.cpp:30-64) and feed
the MXU directly — the mask never exists outside VMEM, and the hash is
generated straight in whichever orientation the product contracts
(elementwise hashes are layout-free), so no operand transposes exist.

Both kernels emit the product TRANSPOSED — (npairs, n) instead of the
mathematical (n, npairs) — because that is the orientation the batched
CD-NNLS Gram-correction unpack consumes (``ops.linalg.unpack_sym_from_t``):
a static row-gather with NO minor-axis relayout anywhere downstream.

Operands cross HBM as bf16 (exact for the 0/1 mask; the packed outer
products round once) with f32 accumulation — the same arithmetic as the
XLA path's MASK_MM_PRECISION=DEFAULT (single bf16 pass), which the
pbmc3k CV-curve guard licenses (benchmarks/precision_invariance.py).
``npairs`` must be padded to a lane multiple (128) by the caller; the pad
columns of Pw/Ph may hold garbage — pad rows of the outputs are never read
(the unpack's gather indexes only true pairs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singlet_tpu.ops.rngmask import _J_MIX, _XJ_MIX, _xs, hash_i, u64_add

# The packed-product operand (np_pad wide, ~165 MB bf16 at k=100/16k genes)
# is re-read once per cell sub-block: bc sets the re-read factor, so it is
# as LARGE as VMEM allows (the bell kernels use 256 because their per-block
# operands are k-wide and tiny; here bc=256 measured 8x the operand traffic
# of the XLA matmul and erased the fusion win). At bc=1024 the working set
# is ~60 MB: out (np_pad, bc) f32 + double-buffered operand blocks + the
# mask tile and its u64-hash temporaries.
_CELL_SUBBLOCK = 1024


def _sub_block(block: int) -> int:
    bc = min(_CELL_SUBBLOCK, block)
    while block % bc:
        bc //= 2
    return max(bc, 8)


def _mask_tile(seed_ref, cell_ids, g, gene_block: int, inv_density: int,
               cells_true: int, genes_true: int, genes_on_rows: bool):
    """Dense 0/1 test-mask tile of gene block ``g`` for ``cell_ids``,
    generated directly in the requested orientation: (gene_block, bc) when
    ``genes_on_rows`` else (bc, gene_block). Matches ops/rngmask.mask_block
    bit-for-bit, including the validity clamp (padded cells/genes are never
    masked — and never counted in test MSE — so their product contribution
    must be the 0 keep... here MASKED=0 contribution, i.e. clamp to 0)."""
    sh, sl = seed_ref[0, 0], seed_ref[0, 1]
    bc = cell_ids.shape[0]
    ci = (jnp.zeros_like(cell_ids, jnp.uint32), cell_ids.astype(jnp.uint32))
    xi = hash_i(sh, sl, ci)                                    # (bc,) pair
    gid = g * gene_block + jnp.arange(gene_block, dtype=jnp.int32)
    gj = (jnp.zeros_like(gid, jnp.uint32), gid.astype(jnp.uint32))
    jm = _xs(gj, _J_MIX)
    # validity clamps compare 2D int tiles (broadcasted_iota + an explicit
    # int broadcast): Mosaic rejects broadcasting 1D BOOL vectors into 2D
    if genes_on_rows:
        x = u64_add((xi[0][None, :], xi[1][None, :]),
                    (jm[0][:, None], jm[1][:, None]))
        gid2 = g * gene_block + jax.lax.broadcasted_iota(
            jnp.int32, (gene_block, bc), 0)
        cid2 = jnp.broadcast_to(cell_ids[None, :], (gene_block, bc))
    else:
        x = u64_add((xi[0][:, None], xi[1][:, None]),
                    (jm[0][None, :], jm[1][None, :]))
        gid2 = g * gene_block + jax.lax.broadcasted_iota(
            jnp.int32, (bc, gene_block), 1)
        cid2 = jnp.broadcast_to(cell_ids[:, None], (bc, gene_block))
    valid = (cid2 < cells_true) & (gid2 < genes_true)
    x = _xs(x, _XJ_MIX)
    d = jnp.uint32(inv_density)
    two32_mod = jnp.uint32((1 << 32) % inv_density)
    masked = ((x[0] % d) * two32_mod + x[1] % d) % d == 0
    # select in the f32 domain (the bools carry 32-bit (8,128) tiling) and
    # convert the RESULT to bf16 — selecting bf16 directly would need an
    # i1 relayout to 16-bit tiling, which Mosaic rejects
    m32 = jnp.where(masked & valid, jnp.ones((), jnp.float32),
                    jnp.zeros((), jnp.float32))
    return m32.astype(jnp.bfloat16)


def _mpw_kernel(seed_ref, ids_ref, Pw_ref, out_ref, *, gene_block: int,
                inv_density: int, cells_true: int, genes_true: int):
    """packed_t[p, c] = sum_g mask(c, g) Pw[g, p] for one cell sub-block;
    gene blocks (fastest grid dim) accumulate into the revisited output."""
    g = pl.program_id(1)
    m = _mask_tile(seed_ref, ids_ref[0, :], g, gene_block, inv_density,
                   cells_true, genes_true, genes_on_rows=True)   # (GB, bc)
    part = jax.lax.dot_general(Pw_ref[0], m, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(g == 0)
    def _():
        out_ref[:, :] = part

    @pl.when(g > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + part


def _mph_kernel(seed_ref, ids_ref, Ph_ref, acc_ref, out_ref, *,
                gene_block: int, inv_density: int, cells_true: int,
                genes_true: int):
    """out[p, g*GB:(g+1)*GB] = acc[...] + sum_c mask(c, g) Ph[c, p].

    ``acc_ref`` is ALIASED to the output (input_output_aliases), so the
    revisited output block already holds the running accumulator on first
    visit and the kernel just adds — the caller's (np_pad, genes_pad)
    carry is updated in place with no separate temp array (at the 524k
    config the carry is 335 MB; a kernel-temp + XLA add would move it
    twice more per pass)."""
    g = pl.program_id(0)
    i = pl.program_id(1)
    del acc_ref  # aliased: its content IS out_ref's initial content
    m = _mask_tile(seed_ref, ids_ref[0, :], g, gene_block, inv_density,
                   cells_true, genes_true, genes_on_rows=False)  # (bc, GB)
    part = jax.lax.dot_general(Ph_ref[:, :], m, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    out_ref[:, :] = out_ref[:, :] + part


@functools.partial(jax.jit, static_argnames=(
    "gene_block", "inv_density", "cells_true", "genes_true", "interpret"))
def mask_packed_w_t(Pw, seed, cell_ids, *, gene_block: int,
                    inv_density: int, cells_true: int, genes_true: int,
                    interpret: bool = False):
    """packed_t (np_pad, block) f32 = (mask @ Pw)^T with the mask hashed
    in-kernel. Pw: (genes_pad, np_pad) with np_pad % 128 == 0 (bf16 or
    convertible); cell_ids: (block,) int32 GLOBAL ids; seed: uint32[2]."""
    genes_pad, np_pad = Pw.shape
    block = cell_ids.shape[0]
    bc = _sub_block(block)
    n_gb = genes_pad // gene_block
    seed2 = jnp.asarray(seed, jnp.uint32).reshape(1, 2)
    ids2 = jnp.asarray(cell_ids, jnp.int32).reshape(1, block)
    Pw = Pw.astype(jnp.bfloat16).reshape(n_gb, gene_block, np_pad)
    # double-buffered bf16 Pw blocks + f32 out + mask tile + hash temps
    # (u64-pair xorshift chains keep ~a dozen (gene_block, bc) u32 live) +
    # generous slack — Mosaic's stack accounting runs above the analytic
    # sum (measured 33.9M vs a 32.5M budget at the 524k geometry)
    vmem = min(2 * 2 * gene_block * np_pad + 4 * np_pad * bc
               + 64 * gene_block * bc + (16 << 20), 128 << 20)
    return pl.pallas_call(
        functools.partial(_mpw_kernel, gene_block=gene_block,
                          inv_density=inv_density, cells_true=cells_true,
                          genes_true=genes_true),
        grid=(block // bc, n_gb),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gene_block, np_pad), lambda i, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_pad, bc), lambda i, g: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_pad, block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(seed2, ids2, Pw)


@functools.partial(jax.jit, static_argnames=(
    "gene_block", "inv_density", "cells_true", "genes_true", "interpret"))
def mask_packed_h_t(Ph, seed, cell_ids, acc, *, gene_block: int,
                    inv_density: int, cells_true: int, genes_true: int,
                    interpret: bool = False):
    """acc (np_pad, genes_pad) f32 += (mask^T @ Ph)^T, mask hashed
    in-kernel; ``acc`` is donated (input_output_aliases) and updated in
    place. Ph: (block, np_pad) with np_pad % 128 == 0."""
    block, np_pad = Ph.shape
    genes_pad = acc.shape[1]
    bc = _sub_block(block)
    n_gb = genes_pad // gene_block
    seed2 = jnp.asarray(seed, jnp.uint32).reshape(1, 2)
    ids2 = jnp.asarray(cell_ids, jnp.int32).reshape(1, block)
    Ph = Ph.astype(jnp.bfloat16)
    vmem = min(2 * 2 * bc * np_pad + 2 * 4 * np_pad * gene_block
               + 64 * gene_block * bc + (16 << 20), 128 << 20)
    return pl.pallas_call(
        functools.partial(_mph_kernel, gene_block=gene_block,
                          inv_density=inv_density, cells_true=cells_true,
                          genes_true=genes_true),
        grid=(n_gb, block // bc),
        in_specs=[
            pl.BlockSpec((1, 2), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda g, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, np_pad), lambda g, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_pad, gene_block), lambda g, i: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_pad, gene_block), lambda g, i: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_pad, genes_pad), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(seed2, ids2, Ph, acc)
