"""Fused Pallas TPU kernels for blocked-ELL SpMM — the sparse half-update
products without HBM tile round-trips.

The XLA formulation (parallel/sharded_ell.py:_bell_tile + jnp.dot) densifies
each (cell_block, gene_block) tile into HBM, then the matmul reads it back —
~100 GB of tile traffic per ALS iteration at the 524k-cell config. These
kernels build the tile in VMEM scratch (same multiply-compare-sum over the
per-block nnz window; pad entries li = -1 / val = 0 contribute zero) and
feed the MXU directly:

  * ``bell_spmm``     B  = sum_gb densify(li[gb], lv[gb]) @ W[gb]   (cells, k)
  * ``bell_spmm_t``   Bw[gb] = densify(li[gb], lv[gb])^T @ H        (genes, k)

Plane layout (since round 4): 2-D ``(n_gb * width, cells)`` with row
``gb*width + w`` = slot w of gene block gb — the CELL axis is the 128-lane
minor dimension, so the planes' natural TPU tiling is COMPACT. The previous
(n_gb, cells, width) layout put the tiny nnz width (32-56) on the lane axis:
XLA pads the minor dim to 128, and (after a compile-service update between
rounds) materializes 4x-padded whole-array copies of both planes — an
instant HBM OOM at the 524k config (8 GB per plane of pure padding; the 2-D
layout measures ZERO temp bytes for the same access pattern). The kernels
build each compute tile TRANSPOSED — (gene_block, bc), genes on sublanes —
which both matmuls contract directly (no tile transposes anywhere), and the
(width, bc) windows they read are lane-contiguous.

Both take an optional CV ``seed``: the speckled test-set keep-mask is then
evaluated IN-KERNEL at the nonzero positions only — the xorshift64 counter
hash (ops/rngmask.py, bit-faithful to reference:src/singlet.cpp:30-64) runs
on the (width, bc) nnz window instead of the dense (block, genes) grid,
and the training product ``tile * (1 - mask)`` never materializes either
operand. Validity clamps are unnecessary here: padded cells/genes have no
nonzeros, so their keep factor multiplies an exact zero.

The grid tiles BOTH axes — (cell sub-blocks, gene blocks) — because
Mosaic's scoped-VMEM stack accounting scales with the in-kernel tile
footprint; 256-cell sub-blocks keep every program's working set a few MB.
Accumulation happens in the revisited output block along the fastest grid
dimension (gene blocks for B, cell sub-blocks for Bw).

Numerics are identical to the XLA formulation: same per-gene-block
accumulation order, same dot precision, same mask hash.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singlet_tpu.ops.rngmask import _J_MIX, _XJ_MIX, _xs, hash_i, u64_add

_TILE_GROUP = 8
_CELL_SUBBLOCK = 256


def _build_tile_t(tile_ref, li, lv, gene_block: int, keep=None):
    """(width, bc) nnz window -> dense TRANSPOSED (gene_block, bc) tile in
    the VMEM scratch ``tile_ref``. ``keep`` (width, bc) optionally
    pre-multiplies the values (the masked-CV training product). Accumulates
    through the scratch ref in groups of ``_TILE_GROUP`` width steps to
    bound the live-temporary set."""
    if keep is not None:
        lv = lv * keep
    width = li.shape[0]
    iota = jax.lax.broadcasted_iota(li.dtype, (gene_block, 1), 0)
    tile_ref[:, :] = jnp.zeros(tile_ref.shape, lv.dtype)
    for w0 in range(0, width, _TILE_GROUP):
        part = None
        for w in range(w0, min(w0 + _TILE_GROUP, width)):
            term = lv[w:w + 1, :] * (li[w:w + 1, :] == iota)
            part = term if part is None else part + term
        tile_ref[:, :] = tile_ref[:, :] + part


def _keep_at_nnz(seed_ref, cell_ids, li, g, gene_block: int,
                 inv_density: int, dtype):
    """1 - testmask at the nnz positions of gene block ``g``: the counter
    hash of (seed, cell, global gene) on the (width, bc) window.
    Matches ops/rngmask.mask_block at every (cell, gene) it evaluates."""
    sh, sl = seed_ref[0, 0], seed_ref[0, 1]
    ci = (jnp.zeros_like(cell_ids, jnp.uint32), cell_ids.astype(jnp.uint32))
    xi = hash_i(sh, sl, ci)                       # per-cell stage, (bc,)
    gid = (g * gene_block + li).astype(jnp.uint32)  # pad li=-1: value is 0
    gj = (jnp.zeros_like(gid), gid)
    jm = _xs(gj, _J_MIX)
    x = u64_add((xi[0][None, :], xi[1][None, :]), jm)
    x = _xs(x, _XJ_MIX)
    d = jnp.uint32(inv_density)
    two32_mod = jnp.uint32((1 << 32) % inv_density)
    masked = ((x[0] % d) * two32_mod + x[1] % d) % d == 0
    return jnp.where(masked, jnp.zeros((), dtype), jnp.ones((), dtype))


def _spmm_kernel(seed_ref, ids_ref, li_ref, lv_ref, W_ref, out_ref,
                 tile_ref, *, gene_block: int, inv_density: int,
                 masked: bool, precision):
    g = pl.program_id(1)          # gene blocks: fastest dim, accumulated
    keep = None
    if masked:
        keep = _keep_at_nnz(seed_ref, ids_ref[0, :], li_ref[...], g,
                            gene_block, inv_density, lv_ref.dtype)
    _build_tile_t(tile_ref, li_ref[...], lv_ref[...], gene_block, keep=keep)
    part = jax.lax.dot_general(tile_ref[:, :], W_ref[0, :, :],
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)

    @pl.when(g == 0)
    def _():
        out_ref[:, :] = part

    @pl.when(g > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + part


def _spmm_t_kernel(seed_ref, ids_ref, li_ref, lv_ref, H_ref, out_ref,
                   tile_ref, *, gene_block: int, inv_density: int,
                   masked: bool, precision):
    g = pl.program_id(0)          # gene blocks: one output block each
    i = pl.program_id(1)          # cell sub-blocks: fastest, accumulated
    keep = None
    if masked:
        keep = _keep_at_nnz(seed_ref, ids_ref[0, :], li_ref[...], g,
                            gene_block, inv_density, lv_ref.dtype)
    _build_tile_t(tile_ref, li_ref[...], lv_ref[...], gene_block, keep=keep)
    part = jax.lax.dot_general(
        tile_ref[:, :], H_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(i == 0)
    def _():
        out_ref[0, :, :] = part

    @pl.when(i > 0)
    def _():
        out_ref[0, :, :] = out_ref[0, :, :] + part


def _sub_block(block: int) -> int:
    bc = min(_CELL_SUBBLOCK, block)
    while block % bc:
        bc //= 2
    return max(bc, 8)


def _vmem_budget(bc: int, gene_block: int, width: int, k: int) -> int:
    """Scoped-VMEM limit: double-buffered plane/W inputs + the tile scratch
    + a group of unrolled temporaries + slack, capped at 128 MB."""
    planes = 2 * 2 * bc * width * 4               # li + lv, double-buffered
    wk = 2 * gene_block * max(k, 128) * 4
    tile = bc * gene_block * 4
    group = (_TILE_GROUP + 4) * tile
    return min(planes + wk + tile + group + (16 << 20), 128 << 20)


@functools.partial(jax.jit, static_argnames=(
    "gene_block", "inv_density", "masked", "precision", "interpret"))
def bell_spmm(b_li, b_val, W, seed, cell_ids, *, gene_block: int,
              inv_density: int = 20, masked: bool = False,
              precision=None, interpret: bool = False):
    """B = sum_gb densify(b_li[gb], b_val[gb])[*keep] @ W[gb*GB:(gb+1)*GB].

    b_li/b_val: (n_gb*width, block) 2-D planes; W: (n_gb*gene_block, k);
    seed: uint32[2]; cell_ids: (block,) int32 global ids (masked only).
    Returns (block, k) float32.
    """
    k = W.shape[1]
    block = b_li.shape[1]
    n_gb = W.shape[0] // gene_block
    width = b_li.shape[0] // n_gb
    bc = _sub_block(block)
    seed2 = jnp.asarray(seed, jnp.uint32).reshape(1, 2)
    ids2 = jnp.asarray(cell_ids, jnp.int32).reshape(1, block)
    return pl.pallas_call(
        functools.partial(_spmm_kernel, gene_block=gene_block,
                          inv_density=inv_density, masked=masked,
                          precision=precision),
        grid=(block // bc, n_gb),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, g: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda i, g: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda i, g: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gene_block, k), lambda i, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, k), lambda i, g: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((block, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((gene_block, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_budget(bc, gene_block, width, k)),
        interpret=interpret,
    )(seed2, ids2, b_li, b_val, W.reshape(n_gb, gene_block, k))


def _mask_bits(wt_ref, g):
    """Dense 0/1 f32 TEST mask of gene block ``g`` from its bitplane word
    tile (ops/maskbits.py layout: word group g // 32, bitplane g % 32)."""
    s = (g % 32).astype(jnp.uint32) if hasattr(g, "astype") else g % 32
    m = ((wt_ref[:, :] >> s) & jnp.uint32(1)).astype(jnp.int32)
    return m.astype(jnp.float32)


def _keep_bits(wt_ref, g):
    """Dense KEEP factor (1 - test mask) — the bits twin of
    ``_keep_at_nnz`` applied to the densified tile instead of the nnz
    window (identical products: pad slots densify to exact zeros)."""
    return 1.0 - _mask_bits(wt_ref, g)


def _spmm_bits_kernel(wt_ref, li_ref, lv_ref, W_ref, out_ref, tile_ref, *,
                      gene_block: int, precision):
    g = pl.program_id(1)
    _build_tile_t(tile_ref, li_ref[...], lv_ref[...], gene_block)
    part = jax.lax.dot_general(
        tile_ref[:, :] * _keep_bits(wt_ref, g), W_ref[0, :, :],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(g == 0)
    def _():
        out_ref[:, :] = part

    @pl.when(g > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + part


def _spmm_t_bits_kernel(wt_ref, li_ref, lv_ref, H_ref, out_ref, tile_ref,
                        *, gene_block: int, precision):
    g = pl.program_id(0)
    i = pl.program_id(1)
    _build_tile_t(tile_ref, li_ref[...], lv_ref[...], gene_block)
    part = jax.lax.dot_general(
        tile_ref[:, :] * _keep_bits(wt_ref, g), H_ref[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(i == 0)
    def _():
        out_ref[0, :, :] = part

    @pl.when(i > 0)
    def _():
        out_ref[0, :, :] = out_ref[0, :, :] + part


@functools.partial(jax.jit, static_argnames=("gene_block", "precision",
                                             "interpret"))
def bell_spmm_bits(b_li, b_val, W, words_t, *, gene_block: int,
                   precision=None, interpret: bool = False):
    """Keep-masked ``bell_spmm`` with the CV mask read from the
    once-per-fit packed bitplane words (TRANSPOSED orientation, sliced to
    this cell block) instead of hashed in-kernel."""
    k = W.shape[1]
    block = b_li.shape[1]
    n_gb = W.shape[0] // gene_block
    width = b_li.shape[0] // n_gb
    bc = _sub_block(block)
    return pl.pallas_call(
        functools.partial(_spmm_bits_kernel, gene_block=gene_block,
                          precision=precision),
        grid=(block // bc, n_gb),
        in_specs=[
            pl.BlockSpec((gene_block, bc), lambda i, g: (g // 32, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda i, g: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda i, g: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gene_block, k), lambda i, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, k), lambda i, g: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((block, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((gene_block, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_budget(bc, gene_block, width, k)
            + 3 * gene_block * _sub_block(block) * 4),
        interpret=interpret,
    )(words_t, b_li, b_val, W.reshape(n_gb, gene_block, k))


@functools.partial(jax.jit, static_argnames=("gene_block", "n_gb",
                                             "precision", "interpret"))
def bell_spmm_t_bits(b_li, b_val, H, words_t, *, gene_block: int,
                     n_gb: int, precision=None, interpret: bool = False):
    """Keep-masked ``bell_spmm_t`` with the CV mask from packed bitplane
    words (TRANSPOSED orientation, sliced to this cell block)."""
    k = H.shape[1]
    block = b_li.shape[1]
    bc = _sub_block(block)
    width = b_li.shape[0] // n_gb
    out = pl.pallas_call(
        functools.partial(_spmm_t_bits_kernel, gene_block=gene_block,
                          precision=precision),
        grid=(n_gb, block // bc),
        in_specs=[
            pl.BlockSpec((gene_block, bc), lambda g, i: (g // 32, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda g, i: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda g, i: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, k), lambda g, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gene_block, k), lambda g, i: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_gb, gene_block, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((gene_block, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_budget(bc, gene_block, width, k)
            + 3 * gene_block * _sub_block(block) * 4),
        interpret=interpret,
    )(words_t, b_li, b_val, H)
    return out.reshape(n_gb * gene_block, k)


def _mse_kernel(li_ref, lv_ref, wt_ref, Wd_ref, H_ref, out_ref, tile_ref,
                *, gene_block: int, precision):
    """Held-out test-MSE partials of one (cell sub-block, gene block)
    tile, fully fused: densify the bELL tile in VMEM, predict
    ``Wd_blk @ Hb^T`` on the MXU, square the residual, and reduce at the
    bit-packed mask positions — neither the dense tile, the prediction,
    nor the mask ever leaves VMEM (the XLA formulation round-trips all
    three through HBM, ~0.5 s/pass at the 524k config). Accumulates
    s = sum(mask * diff^2) in out row 0 and n = sum(mask) in row 1, per
    cell, over the gene blocks (fastest grid dim)."""
    g = pl.program_id(1)
    _build_tile_t(tile_ref, li_ref[...], lv_ref[...], gene_block)
    m = _mask_bits(wt_ref, g)                          # (gene_block, bc)
    pred = jax.lax.dot_general(
        Wd_ref[0], H_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    diff2 = jnp.square(pred - tile_ref[:, :])
    s_part = jnp.sum(m * diff2, axis=0, keepdims=True)     # (1, bc)
    n_part = jnp.sum(m, axis=0, keepdims=True)

    @pl.when(g == 0)
    def _():
        # zero the WHOLE block: rows 2-7 are documented as zero pad, and
        # a never-written output block would hold uninitialized VMEM on
        # hardware (interpret mode zero-fills, hiding it)
        out_ref[:, :] = jnp.zeros(out_ref.shape, jnp.float32)
        out_ref[0:1, :] = s_part
        out_ref[1:2, :] = n_part

    @pl.when(g > 0)
    def _():
        out_ref[0:1, :] = out_ref[0:1, :] + s_part
        out_ref[1:2, :] = out_ref[1:2, :] + n_part


@functools.partial(jax.jit, static_argnames=("gene_block", "precision",
                                             "interpret"))
def bell_mse_bits(b_li, b_val, words_t, Wd, H, *, gene_block: int,
                  precision=None, interpret: bool = False):
    """Per-cell masked squared-error sums and counts of one cell block:
    returns (8, block) f32 with row 0 = sum over TEST-masked genes of
    (pred - A)^2 and row 1 = the masked-gene count (rows 2-7 zero pad).
    ``words_t``: (n_t * gene_block, block) u32 — the TRANSPOSED packed
    mask (ops/maskbits.py) sliced to this cell block. Validity is baked
    into the bits at pack time. Semantics of ``mse_test``
    (reference:src/singlet.cpp:536-568) before the per-cell s/n division.
    """
    k = H.shape[1]
    block = b_li.shape[1]
    n_gb = Wd.shape[0] // gene_block
    width = b_li.shape[0] // n_gb
    bc = _sub_block(block)
    return pl.pallas_call(
        functools.partial(_mse_kernel, gene_block=gene_block,
                          precision=precision),
        grid=(block // bc, n_gb),
        in_specs=[
            pl.BlockSpec((width, bc), lambda i, g: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda i, g: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gene_block, bc), lambda i, g: (g // 32, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gene_block, k), lambda i, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, k), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, bc), lambda i, g: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, block), jnp.float32),
        scratch_shapes=[pltpu.VMEM((gene_block, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_budget(bc, gene_block, width, k)
            + 2 * gene_block * _sub_block(block) * 4),
        interpret=interpret,
    )(b_li, b_val, words_t, Wd.reshape(n_gb, gene_block, k), H)


@functools.partial(jax.jit, static_argnames=(
    "gene_block", "n_gb", "inv_density", "masked", "precision",
    "interpret"))
def bell_spmm_t(b_li, b_val, H, seed, cell_ids, *, gene_block: int,
                n_gb: int, inv_density: int = 20, masked: bool = False,
                precision=None, interpret: bool = False):
    """Bw = concat_gb densify(b_li[gb], b_val[gb])[*keep]^T @ H —
    the w-update right-hand-side partials of one cell block.

    b_li/b_val: (n_gb*width, block) 2-D planes; H: (block, k). Returns
    (n_gb*gene_block, k) float32 (each gene block accumulated over the
    cell sub-blocks, the fastest grid dimension). ``n_gb`` is static —
    the plane rows split as n_gb * width.
    """
    k = H.shape[1]
    block = b_li.shape[1]
    bc = _sub_block(block)
    width = b_li.shape[0] // n_gb
    seed2 = jnp.asarray(seed, jnp.uint32).reshape(1, 2)
    ids2 = jnp.asarray(cell_ids, jnp.int32).reshape(1, block)
    out = pl.pallas_call(
        functools.partial(_spmm_t_kernel, gene_block=gene_block,
                          inv_density=inv_density, masked=masked,
                          precision=precision),
        grid=(n_gb, block // bc),
        in_specs=[
            pl.BlockSpec((1, 2), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda g, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda g, i: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, bc), lambda g, i: (g, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, k), lambda g, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gene_block, k), lambda g, i: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_gb, gene_block, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((gene_block, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_budget(bc, gene_block, width, k)),
        interpret=interpret,
    )(seed2, ids2, b_li, b_val, H)
    return out.reshape(n_gb * gene_block, k)
