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

Round-4 addendum — BIT-PACKED masks + int8 MXU (the default): the mask is
fit-invariant (one seed per fit), so the ``*_bits`` kernels below read it
from the once-per-fit packed bitplane words (ops/maskbits.py) instead of
re-hashing 64-bit xorshift chains per element per iteration — unpacking a
(gene_block) tile is ONE dynamic-scalar shift + AND. And because the mask
is exactly representable in int8, the products run on the MXU's int8 path
(~2x the bf16 rate on v5e): the packed outer products are quantized
per-PAIR (symmetric max scaling, the pair axis is the output row axis so
dequantization is a row-broadcast multiply), accumulation is EXACT int32
(max genes * 127 << 2^31), and the only rounding is the one int8
quantization of the operand. Precision caveat: the quantization error is
relative to each pair column's MAX (elements below max/254 round to 0),
not per-element like bf16's 2^-9 — for NMF packed outer products the
within-column dynamic range is modest (products of nonneg loadings),
and the ARD trace cross-checks (int8 vs xla: test-MSE rel 4e-6) license
the default; heavy-tailed columns are the case to watch, and
``SINGLET_TPU_MASKGRAM=bf16`` restores magnitude-independent rounding.
The env var selects int8 (default) / bf16 (bits, bf16 operand) / hash
(round-4.0 in-kernel hash kernels) / xla (dense-mask XLA fallback), and
is read at fit-build time (not import time) like the sibling knobs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from singlet_tpu.ops.rngmask import _J_MIX, _XJ_MIX, _xs, hash_i, u64_add

def maskgram_mode() -> str:
    """Masked-product kernel path, read from ``SINGLET_TPU_MASKGRAM`` at
    call time (fit-build time for the engines) so mid-session changes
    take effect like the sibling knobs. Unknown values fall back to the
    int8 default."""
    mode = os.environ.get("SINGLET_TPU_MASKGRAM", "int8").lower()
    return mode if mode in ("int8", "bf16", "hash", "xla") else "int8"

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

    ``acc_ref`` is ALIASED to the output (input_output_aliases) so the
    caller's (np_pad, genes_pad) carry is updated in place with no
    separate temp array (at the 524k config the carry is 335 MB; a
    kernel-temp + XLA add would move it twice more per pass). The carry
    must be READ from the input ref on the first cell sub-block — a
    revisited output block's VMEM window is NOT initialized from the
    aliased HBM content on TPU hardware (interpret mode initializes it,
    which is exactly the trap); its block index only changes with ``g``,
    so the input DMA runs once per gene block, not once per grid step."""
    g = pl.program_id(0)
    i = pl.program_id(1)
    m = _mask_tile(seed_ref, ids_ref[0, :], g, gene_block, inv_density,
                   cells_true, genes_true, genes_on_rows=False)  # (bc, GB)
    part = jax.lax.dot_general(Ph_ref[:, :], m, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = acc_ref[:, :] + part

    @pl.when(i > 0)
    def _():
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


# ---------------------------------------------------------------------------
# Bit-packed-mask kernels (round 4 default): the mask arrives as bitplane
# words (ops/maskbits.py layout) — no hashing, one shift+AND per tile — and
# the matmul runs int8 (per-pair-scaled, exact int32 accumulation) or bf16.
# ---------------------------------------------------------------------------


def quantize_pairs(P: jnp.ndarray, axis: int = 0):
    """Symmetric per-PAIR int8 quantization of a packed-outer-product
    operand. ``axis`` is the reduction (gene/cell) axis; the OTHER axis is
    the pair axis whose per-column max sets the scale. Returns (q int8,
    scales f32 (np_pad,)). Exact for zero columns (scale floor)."""
    s = jnp.max(jnp.abs(P), axis=axis) / 127.0
    s = jnp.maximum(s, 1e-30)
    sb = s[None, :] if axis == 0 else s[:, None]
    q = jnp.clip(jnp.round(P / sb), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _bits_tile(w_ref, g):
    """Dense 0/1 int32 tile of gene block ``g`` from its bitplane word tile
    (the block spec already selected word group g // 32). int32 because
    Mosaic has no uint32->float32 cast; the 0/1 payload is identical."""
    s = (g % 32).astype(jnp.uint32) if hasattr(g, "astype") else g % 32
    return ((w_ref[:, :] >> s) & jnp.uint32(1)).astype(jnp.int32)


_CAST_I8_DIRECT = os.environ.get("SINGLET_TPU_I8_DIRECT", "0") == "1"


def _to_i8(m32):
    """0/1 int32 -> int8 MXU operand. The f32 hop is the conservative
    Mosaic-supported chain; the direct i32->i8 cast is env-gated for
    measurement (relayout cost differs by generation)."""
    if _CAST_I8_DIRECT:
        return m32.astype(jnp.int8)
    return m32.astype(jnp.float32).astype(jnp.int8)


def _mpw_bits_kernel(wt_ref, P_ref, s_ref, out_ref, m_ref, *,
                     n_gb: int, gene_block: int, int8_path: bool):
    """packed_t[pair chunk p, cells bc] = sum_g mask(c, g) P[g, pair] for
    ONE (cell sub-block, pair chunk) grid step, with the gene-block loop
    UNROLLED IN-BODY over a per-step-resident P chunk.

    Round-5 finding (benchmarks/probe_grpflush.py): per-STEP operand
    fetches carry ~5-10 us of non-overlapped latency on this platform —
    a grid with one small step per (gene block, sub-block) pays ~2x its
    compute floor regardless of bandwidth (pure-dot floor 0.157 s/pass
    vs 0.33-0.39 measured). Fewer, bigger steps fix it: the grid is
    (cell sub-blocks, pair chunks) only; each step fetches one 20+ MB P
    chunk and runs n_gb dots, accumulating int32 (int8 path) / f32
    (bf16) in a local value — no accumulator scratch, one dequantized
    write. ``m_ref`` (when pair chunks > 1) caches the unpacked mask of
    ALL gene blocks at p == 0 of each cell sub-block (pair chunks are
    the FAST grid dim), so unpack VPU work stays once per (cell, gene)."""
    p = pl.program_id(1)

    def unpack(g):
        m32 = _bits_tile_row(wt_ref, g, gene_block)   # (gene_block, bc)
        if int8_path:
            return _to_i8(m32)
        return m32.astype(jnp.float32).astype(jnp.bfloat16)

    part = None
    for g in range(n_gb):
        if m_ref is None:
            m = unpack(g)
        else:
            sl = slice(g * gene_block, (g + 1) * gene_block)

            @pl.when(p == 0)
            def _():
                m_ref[sl, :] = unpack(g)

            m = m_ref[sl, :]
        Pg = P_ref[0, g * gene_block:(g + 1) * gene_block, :]
        d = jax.lax.dot_general(
            Pg, m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int8_path else jnp.float32)
        part = d if part is None else part + d
    if int8_path:
        out_ref[:, :] = part.astype(jnp.float32) * s_ref[:, :]
    else:
        out_ref[:, :] = part


def _bits_tile_row(wt_ref, g: int, gene_block: int):
    """Static-``g`` twin of :func:`_bits_tile` against a words tile that
    stacks ALL word groups' rows: rows [(g // 32) * gene_block, ...) hold
    gene block g's word group, bitplane g % 32."""
    r0 = (g // 32) * gene_block
    w = wt_ref[r0:r0 + gene_block, :]
    return ((w >> jnp.uint32(g % 32)) & jnp.uint32(1)).astype(jnp.int32)


def _mph_bits_kernel(w_ref, P_ref, s_ref, acc_in_ref, out_ref, *,
                     int8_path: bool, spb: int, ng: int, gene_block: int):
    """See the no-alias twin below; this variant reads the aliased carry."""
    _mph_bits_body(w_ref, P_ref, s_ref, acc_in_ref, out_ref,
                   int8_path=int8_path, spb=spb, ng=ng,
                   gene_block=gene_block)


def _mph_bits_kernel_noacc(w_ref, P_ref, s_ref, out_ref, *,
                           int8_path: bool, spb: int, ng: int,
                           gene_block: int):
    """Fresh-output twin: the caller adds the carry in XLA afterwards."""
    _mph_bits_body(w_ref, P_ref, s_ref, None, out_ref,
                   int8_path=int8_path, spb=spb, ng=ng,
                   gene_block=gene_block)


def _mph_bits_body(w_ref, P_ref, s_ref, acc_in_ref, out_ref, *,
                   int8_path: bool, spb: int, ng: int, gene_block: int):
    """out[p, slab] = acc[...] + dequant(sum_c mask(c, g) P[c, p]) for the
    ``ng`` gene blocks of slab ``s``; ``acc_in_ref`` aliases the output
    (in-place carry update) and is READ on the first cell sub-block — see
    :func:`_mph_kernel` on why the aliased content must come from the
    input ref, not the output window.

    The slab (ng > 1) exists to cut the kernel's dominant HBM traffic:
    the P operand re-streams once per OUTPUT WINDOW pass over the cells
    (86 GB/pass at 524k/k=100 with per-gene-block windows), so widening
    the resident window to ng gene blocks divides it by ng. The word
    tile covers a whole 32-plane word group; slabs must not straddle one
    (the caller keeps ng | 32).

    ``s_ref`` holds ALL quantization groups' scales (np_pad, n_scales) —
    a Mosaic-legal lane-1 block slice does not exist for n_scales > 1 —
    and sub-block ``i`` selects its group's column (i // spb) with a
    one-hot reduction (tiny: np_pad x n_scales VPU elements)."""
    s_id = pl.program_id(0)
    i = pl.program_id(1)
    if int8_path:
        n_scales = s_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_scales), 1)
        onehot = jnp.where(col == i // spb, jnp.ones((), jnp.float32),
                           jnp.zeros((), jnp.float32))
        s = jnp.sum(s_ref[:, :] * onehot, axis=1, keepdims=True)
    for j in range(ng):
        g = s_id * ng + j
        m32 = _bits_tile(w_ref, g)                    # (bc, gene_block)
        if int8_path:
            m = _to_i8(m32)
            part = jax.lax.dot_general(P_ref[:, :], m,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            d = part.astype(jnp.float32) * s
        else:
            m = m32.astype(jnp.float32).astype(jnp.bfloat16)
            d = jax.lax.dot_general(P_ref[:, :], m,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        sl = slice(j * gene_block, (j + 1) * gene_block)

        @pl.when(i == 0)
        def _():
            if acc_in_ref is None:
                out_ref[:, sl] = d
            else:
                out_ref[:, sl] = acc_in_ref[:, sl] + d

        @pl.when(i > 0)
        def _():
            out_ref[:, sl] = out_ref[:, sl] + d


def _mpw_geometry(np_pad: int, block: int, esz: int, genes_pad: int,
                  gene_block: int, n_t: int):
    """(bc, np_half, np_split) for :func:`mask_packed_w_t_bits` — shared
    with :func:`prechunk_pairs` so the engine can pre-transpose the P
    operand into the exact chunk layout the kernel will request."""
    bc = block
    while bc > 1024 or block % bc:
        bc //= 2
    bc = max(bc, 8)
    mcache_b = esz * genes_pad * bc

    def _budget(nph, cache):
        return (2 * esz * genes_pad * nph              # P chunk dbl
                + 3 * 4 * nph * bc                     # out dbl + acc value
                + (mcache_b if cache else 0)
                + 2 * 4 * n_t * gene_block * bc        # word tiles dbl
                + 12 * gene_block * bc)                # unpack temps

    np_half, np_split = np_pad, 1
    while (_budget(np_half, np_half < np_pad) > (88 << 20)
           and np_half % 256 == 0 and np_half > 1024):
        np_half //= 2
        np_split *= 2
    return bc, np_half, np_split, _budget(np_half, np_split > 1), mcache_b


def prechunk_pairs(P_op, *, block: int, genes_pad: int, gene_block: int,
                   n_t: int = 1):
    """Pre-transpose the (genes_pad, np_pad) packed operand into the
    (np_split, genes_pad, np_half) CONTIGUOUS chunk layout
    :func:`mask_packed_w_t_bits` consumes. Do this ONCE PER ITERATION in
    the engine — P is invariant across cell blocks, and leaving the
    relayout inside the per-block call measured +0.08 s/pass at the 524k
    config (the transpose re-ran 256 times)."""
    np_pad = P_op.shape[1]
    esz = 1 if P_op.dtype == jnp.int8 else 2
    _, np_half, np_split, _, _ = _mpw_geometry(
        np_pad, block, esz, genes_pad, gene_block, n_t)
    return P_op.reshape(genes_pad, np_split, np_half).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=("gene_block", "interpret"))
def mask_packed_w_t_bits(P_op, scales, words_t, *, gene_block: int,
                         interpret: bool = False):
    """packed_t (np_pad, block) f32 = (mask @ P)^T with the mask read from
    bitplane words. P_op: (genes_pad, np_pad) int8 (with ``scales``
    (np_pad,) f32 from :func:`quantize_pairs`) or bf16 (``scales`` may be
    a dummy) — or the 3-D pre-chunked layout from :func:`prechunk_pairs`
    (preferred in loops); words_t: (n_t * gene_block, block) u32 — the
    TRANSPOSED packed layout, sliced to this cell block by the caller."""
    block = words_t.shape[1]
    n_t = words_t.shape[0] // gene_block
    int8_path = P_op.dtype == jnp.int8
    esz = 1 if int8_path else 2
    if P_op.ndim == 3:
        np_split0, genes_pad, np_half0 = P_op.shape
        np_pad = np_split0 * np_half0
    else:
        genes_pad, np_pad = P_op.shape
    n_gb = genes_pad // gene_block
    bc, np_half, np_split, budget, mcache_b = _mpw_geometry(
        np_pad, block, esz, genes_pad, gene_block, n_t)
    if P_op.ndim == 3:
        assert (np_split0, np_half0) == (np_split, np_half), (
            "prechunk_pairs layout does not match the kernel geometry "
            f"({np_split0}x{np_half0} vs {np_split}x{np_half}) — was it "
            "built with a different block size?")
    use_mcache = np_split > 1
    vmem = min(budget + (25 << 20), 127 << 20)
    scales2 = jnp.asarray(scales, jnp.float32).reshape(np_pad, 1)
    if P_op.ndim == 3:
        P3 = P_op
    else:
        P3 = P_op.reshape(genes_pad, np_split, np_half).transpose(1, 0, 2)
    kernel = functools.partial(_mpw_bits_kernel, n_gb=n_gb,
                               gene_block=gene_block, int8_path=int8_path)
    if not use_mcache:
        def kernel(wt, P, s, out, _k=None):           # noqa: F811
            _mpw_bits_kernel(wt, P, s, out, None, n_gb=n_gb,
                             gene_block=gene_block, int8_path=int8_path)
    scratch = []
    if use_mcache:
        scratch.append(pltpu.VMEM(
            (genes_pad, bc), jnp.int8 if int8_path else jnp.bfloat16))
    return pl.pallas_call(
        kernel,
        grid=(block // bc, np_split),
        in_specs=[
            pl.BlockSpec((n_t * gene_block, bc), lambda i, p: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, genes_pad, np_half), lambda i, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_half, 1), lambda i, p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_half, bc), lambda i, p: (p, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_pad, block), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(words_t, P3, scales2)


def _mpw_m8_kernel(mt_ref, P_ref, s_ref, out_ref, *, n_gb: int,
                   gene_block: int, int8_path: bool):
    """:func:`_mpw_bits_kernel` twin reading a PREBUILT int8 mask tile
    (genes_pad, bc) — no unpack chain in the kernel at all; the engine
    unpacks once per group (ops/maskbits.py:unpack_mask_bits)."""
    part = None
    for g in range(n_gb):
        m = mt_ref[g * gene_block:(g + 1) * gene_block, :]
        if not int8_path:
            m = m.astype(jnp.float32).astype(jnp.bfloat16)
        Pg = P_ref[0, g * gene_block:(g + 1) * gene_block, :]
        d = jax.lax.dot_general(
            Pg, m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int8_path else jnp.float32)
        part = d if part is None else part + d
    if int8_path:
        out_ref[:, :] = part.astype(jnp.float32) * s_ref[:, :]
    else:
        out_ref[:, :] = part


@functools.partial(jax.jit, static_argnames=("gene_block", "interpret"))
def mask_packed_w_t_m8(P_op, scales, mask8_t, *, gene_block: int,
                       interpret: bool = False):
    """packed_t (np_pad, block) f32 = (mask @ P)^T with the mask read as
    a prebuilt dense int8 0/1 array ``mask8_t`` (genes_pad, block) —
    round-5 shared-unpack path. P_op: (genes_pad, np_pad) int8 or bf16."""
    genes_pad, np_pad = P_op.shape
    block = mask8_t.shape[1]
    int8_path = P_op.dtype == jnp.int8
    n_gb = genes_pad // gene_block
    esz = 1 if int8_path else 2
    bc = block
    while bc > 1024 or block % bc:
        bc //= 2
    bc = max(bc, 8)
    np_half, np_split = np_pad, 1

    def _budget(nph, bcc):
        return (2 * esz * genes_pad * nph              # P chunk dbl
                + 3 * 4 * nph * bcc                    # out dbl + acc value
                + 2 * esz * genes_pad * bcc)           # mask tiles dbl

    while (_budget(np_half, bc) > (88 << 20)
           and np_half % 256 == 0 and np_half > 1024):
        np_half //= 2
        np_split *= 2
    vmem = min(_budget(np_half, bc) + (25 << 20), 127 << 20)
    scales2 = jnp.asarray(scales, jnp.float32).reshape(np_pad, 1)
    P3 = P_op.reshape(genes_pad, np_split, np_half).transpose(1, 0, 2)
    return pl.pallas_call(
        functools.partial(_mpw_m8_kernel, n_gb=n_gb, gene_block=gene_block,
                          int8_path=int8_path),
        grid=(block // bc, np_split),
        in_specs=[
            pl.BlockSpec((genes_pad, bc), lambda i, p: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, genes_pad, np_half), lambda i, p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_half, 1), lambda i, p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_half, bc), lambda i, p: (p, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_pad, block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(mask8_t, P3, scales2)


def _mph_m8_kernel(m_ref, P_ref, s_ref, acc_in_ref, out_ref, *,
                   int8_path: bool, spb: int, ng: int, gene_block: int):
    """:func:`_mph_bits_body` twin reading prebuilt int8 mask tiles
    (bc, ng * gene_block) — no unpack chain."""
    i = pl.program_id(1)
    if int8_path:
        n_scales = s_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_scales), 1)
        onehot = jnp.where(col == i // spb, jnp.ones((), jnp.float32),
                           jnp.zeros((), jnp.float32))
        s = jnp.sum(s_ref[:, :] * onehot, axis=1, keepdims=True)
    for j in range(ng):
        m = m_ref[:, j * gene_block:(j + 1) * gene_block]
        if int8_path:
            part = jax.lax.dot_general(P_ref[:, :], m,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            d = part.astype(jnp.float32) * s
        else:
            m = m.astype(jnp.float32).astype(jnp.bfloat16)
            d = jax.lax.dot_general(P_ref[:, :], m,
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        sl = slice(j * gene_block, (j + 1) * gene_block)

        @pl.when(i == 0)
        def _():
            out_ref[:, sl] = acc_in_ref[:, sl] + d

        @pl.when(i > 0)
        def _():
            out_ref[:, sl] = out_ref[:, sl] + d


@functools.partial(jax.jit, static_argnames=(
    "gene_block", "scale_block", "interpret"))
def mask_packed_h_t_m8(P_op, scales, mask8, acc, *, gene_block: int,
                       scale_block: int | None = None,
                       interpret: bool = False):
    """acc (np_pad, genes_pad) f32 += dequant((mask^T @ P)^T) with the
    mask read as a prebuilt dense int8 array ``mask8`` (block, genes_pad)
    — round-5 shared-unpack twin of :func:`mask_packed_h_t_bits` (same
    scale_block batching contract)."""
    block, np_pad = P_op.shape
    genes_pad = acc.shape[1]
    int8_path = P_op.dtype == jnp.int8
    if scale_block is None:
        scale_block = block
    assert block % scale_block == 0
    n_scales = block // scale_block
    bc = min(_sub_block(block), _sub_block(scale_block))
    spb = scale_block // bc
    n_gb = genes_pad // gene_block
    scales2 = jnp.asarray(scales, jnp.float32).reshape(np_pad, n_scales)
    esz = 1 if int8_path else 2

    def _budget(ngg, bcc):
        return (2 * esz * bcc * np_pad                  # P dbl
                + 4 * np_pad * ngg * gene_block         # out (revisited)
                + 2 * 4 * np_pad * ngg * gene_block     # acc input dbl
                + 2 * 4 * np_pad * gene_block           # part/dequant temps
                + 2 * esz * bcc * ngg * gene_block)     # mask tiles dbl

    ng = 1
    for cand in (2, 4, 8):
        if n_gb % cand == 0 and _budget(cand, bc) <= (100 << 20):
            ng = cand
    vmem = min(_budget(ng, bc) + (25 << 20), 127 << 20)
    return pl.pallas_call(
        functools.partial(_mph_m8_kernel, int8_path=int8_path, spb=spb,
                          ng=ng, gene_block=gene_block),
        grid=(n_gb // ng, block // bc),
        in_specs=[
            pl.BlockSpec((bc, ng * gene_block), lambda s, i: (i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, np_pad), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_pad, n_scales), lambda s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_pad, ng * gene_block), lambda s, i: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_pad, ng * gene_block),
                               lambda s, i: (0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_pad, genes_pad), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(mask8, P_op, scales2, acc)


@functools.partial(jax.jit, static_argnames=(
    "gene_block", "scale_block", "interpret"))
def mask_packed_h_t_bits(P_op, scales, words, acc, *, gene_block: int,
                         scale_block: int | None = None,
                         interpret: bool = False):
    """acc (np_pad, genes_pad) f32 += dequant((mask^T @ P)^T), mask from
    bitplane words; ``acc`` donated and updated in place. P_op: (block,
    np_pad) int8 (+ ``scales``) or bf16; words: (block, n_t * gene_block)
    u32 — the natural packed layout, sliced to this cell block.

    ``scale_block`` (divides ``block``; default = ``block``) lets the
    caller BATCH independently int8-quantized cell blocks into ONE call:
    ``scales`` is then (np_pad, block // scale_block) — one column per
    quantization group — and each cell sub-block dequantizes against its
    group's column (the int32 partials never cross a group boundary: the
    grid sub-block size divides ``scale_block``). Batching is what makes
    the engine's grouped carry flush exact AND cheap: the (np_pad,
    genes_pad) carry (335 MB at the 524k config) crosses HBM once per
    GROUP instead of once per 2048-cell block."""
    block, np_pad = P_op.shape
    genes_pad = acc.shape[1]
    int8_path = P_op.dtype == jnp.int8
    if scale_block is None:
        scale_block = block
    assert block % scale_block == 0
    n_scales = block // scale_block
    bc = min(_sub_block(block), _sub_block(scale_block))
    spb = scale_block // bc
    n_gb = genes_pad // gene_block
    scales2 = jnp.asarray(scales, jnp.float32).reshape(np_pad, n_scales)
    esz = 1 if int8_path else 2

    def _budget(ngg, bcc):
        return (2 * esz * bcc * np_pad                  # P dbl
                + 4 * np_pad * ngg * gene_block         # out (revisited)
                + 2 * 4 * np_pad * ngg * gene_block     # acc input dbl
                + 2 * 4 * np_pad * gene_block           # part/dequant temps
                + 2 * 4 * gene_block * bcc)             # word tiles

    # Slab width: the P operand re-streams once per output-window pass
    # over the cells (n_gb / ng passes), so take the widest ng | 32 that
    # divides n_gb and fits VMEM (ng=4 cuts 86 -> 21.5 GB/pass at 524k).
    ng = 1
    for cand in (2, 4, 8):
        if n_gb % cand == 0 and 32 % cand == 0 and \
                _budget(cand, bc) <= (105 << 20):
            ng = cand
    # Mosaic's stack accounting measured ~18M above the analytic sum at
    # the 524k geometry (116.2M vs 98.5M); leave that headroom inside the
    # 128M physical VMEM
    vmem = min(_budget(ng, bc) + (25 << 20), 127 << 20)
    in_specs = [
        pl.BlockSpec((bc, gene_block),
                     lambda s, i: (i, (s * ng) // 32),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bc, np_pad), lambda s, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((np_pad, n_scales), lambda s, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    acc_spec = pl.BlockSpec((np_pad, ng * gene_block), lambda s, i: (0, s),
                            memory_space=pltpu.VMEM)
    common = dict(
        grid=(n_gb // ng, block // bc),
        out_specs=pl.BlockSpec((np_pad, ng * gene_block),
                               lambda s, i: (0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_pad, genes_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )
    if os.environ.get("SINGLET_TPU_MPH_NOALIAS", "0") == "1":
        prod = pl.pallas_call(
            functools.partial(_mph_bits_kernel_noacc, int8_path=int8_path,
                              spb=spb, ng=ng, gene_block=gene_block),
            in_specs=in_specs, **common,
        )(words, P_op, scales2)
        return acc + prod
    return pl.pallas_call(
        functools.partial(_mph_bits_kernel, int8_path=int8_path, spb=spb,
                          ng=ng, gene_block=gene_block),
        in_specs=in_specs + [acc_spec],
        input_output_aliases={3: 0},
        **common,
    )(words, P_op, scales2, acc)
