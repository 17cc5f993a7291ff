"""Micro-probe: per-block vs group-batched mask_packed_h_t_bits flush, and
mask_packed_w_t_bits, at the 524k operand geometry. Scalar-fetch sync.

Run: python benchmarks/probe_grpflush.py [--cells N] [--group F]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=524288)
    ap.add_argument("--genes", type=int, default=16384)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--group", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from singlet_tpu.ops.linalg import packed_outer_products, pad_pairs, \
        triu_pairs
    from singlet_tpu.ops.maskbits import pack_mask_words
    from singlet_tpu.ops.pallas_maskgram import (mask_packed_h_t_bits,
                                                 mask_packed_w_t_bits,
                                                 quantize_pairs)
    from singlet_tpu.ops.rngmask import seed_pair

    genes, cells, k = args.genes, args.cells, args.k
    mblock, F = args.block, args.group
    gene_block = 512
    n_blocks = cells // mblock
    npairs = k * (k + 1) // 2
    np_pad = -(-npairs // 128) * 128
    iu_pad = pad_pairs(triu_pairs(k), np_pad)
    seed = seed_pair(123)

    ids = jnp.arange(cells, dtype=jnp.int32)
    words = pack_mask_words(seed, ids, genes_pad=genes, gene_block=gene_block,
                            inv_density=20, cells_true=cells,
                            genes_true=genes, cell_block=mblock)
    H = jax.random.uniform(jax.random.PRNGKey(1), (cells, k), jnp.float32)
    W = jax.random.uniform(jax.random.PRNGKey(0), (genes, k), jnp.float32)
    Pw = packed_outer_products(W, iu_pad)
    Pw_q, Pw_s = quantize_pairs(Pw, axis=0)
    float(jnp.sum(words[0].astype(jnp.float32)))

    def timed(f, *a, n=2):
        float(f(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            float(f(*a))
        return (time.perf_counter() - t0) / n

    def slice2(arr, start, size):
        return jax.lax.dynamic_slice_in_dim(arr, start, size, 0)

    @jax.jit
    def per_block(H, words):
        def blk(carry, bi):
            acc, pk_t = carry
            Hb = slice2(H, bi * mblock, mblock)
            Ph = packed_outer_products(Hb + acc * 1e-30, iu_pad)
            q, s = quantize_pairs(Ph, axis=0)
            pk_t = mask_packed_h_t_bits(q, s, slice2(words, bi * mblock,
                                                     mblock), pk_t,
                                        gene_block=gene_block)
            return (acc + pk_t[0, 0] + pk_t[-1, -1], pk_t), None
        carry0 = (jnp.zeros(()), jnp.zeros((np_pad, genes), jnp.float32))
        (acc, _), _ = jax.lax.scan(blk, carry0, jnp.arange(n_blocks))
        return acc

    @jax.jit
    def grouped(H, words):
        def inner(carry, bi):
            acc = carry
            Hb = slice2(H, bi * mblock, mblock)
            Ph = packed_outer_products(Hb + acc * 1e-30, iu_pad)
            q, s = quantize_pairs(Ph, axis=0)
            return acc + q[0, 0].astype(jnp.float32) * 1e-30, (q, s)

        def grp(carry, gi):
            acc, pk_t = carry
            acc, (qs, ss) = jax.lax.scan(inner, acc,
                                         gi * F + jnp.arange(F))
            pk_t = mask_packed_h_t_bits(
                qs.reshape(F * mblock, np_pad), ss.T,
                slice2(words, gi * (F * mblock), F * mblock), pk_t,
                gene_block=gene_block, scale_block=mblock)
            return (acc + pk_t[0, 0] + pk_t[-1, -1], pk_t), None
        carry0 = (jnp.zeros(()), jnp.zeros((np_pad, genes), jnp.float32))
        (acc, _), _ = jax.lax.scan(grp, carry0, jnp.arange(n_blocks // F))
        return acc

    @jax.jit
    def kernel_only_grouped(H, words):
        """The flush kernel alone on pre-quantized group operands (no
        per-block emission/quantize): the pure kernel floor."""
        q0, s0 = quantize_pairs(
            packed_outer_products(H[:F * mblock], iu_pad), axis=0)
        ss = jnp.broadcast_to(s0[:, None], (np_pad, F))

        def grp(carry, gi):
            acc, pk_t = carry
            pk_t = mask_packed_h_t_bits(
                q0 + acc.astype(jnp.int8) * 0, ss,
                slice2(words, gi * (F * mblock), F * mblock), pk_t,
                gene_block=gene_block, scale_block=mblock)
            return (acc + pk_t[0, 0] + pk_t[-1, -1], pk_t), None
        carry0 = (jnp.zeros(()), jnp.zeros((np_pad, genes), jnp.float32))
        (acc, _), _ = jax.lax.scan(grp, carry0, jnp.arange(n_blocks // F))
        return acc

    @jax.jit
    def emission_only(H):
        """packed_outer_products + quantize per block, no flush kernel."""
        def blk(acc, bi):
            Hb = slice2(H, bi * mblock, mblock)
            Ph = packed_outer_products(Hb + acc * 1e-30, iu_pad)
            q, s = quantize_pairs(Ph, axis=0)
            return acc + q[0, 0].astype(jnp.float32) + s[0], None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    @jax.jit
    def wt_per_block(Pw_q, Pw_s, words):
        def blk(acc, bi):
            wt = slice2(words, bi * mblock, mblock).T
            pt = mask_packed_w_t_bits(Pw_q, Pw_s + acc * 0, wt,
                                      gene_block=gene_block)
            return acc + pt[0, 0] + pt[-1, -1], None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc


    def make_floor4_call(block, bc=1024):
        """Merged single-stream B-kernel prototype: ONE int8 operand
        (P ++ byte-plane mask columns); mask plane j contiguous at
        [np_pad + j*gene_block, +gene_block), bit r = g % 8; unpack is
        int8-native (shift+and, NO cast chain)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_gb = genes // gene_block

        def kern(F_ref, out_ref):
            g = pl.program_id(0)
            j = (g % 32) // 8
            r = g % 8
            P = F_ref[:, :np_pad]
            # static 4-way select of the byte plane, shift in int8 domain
            planes = [F_ref[:, np_pad + jj * gene_block:
                            np_pad + (jj + 1) * gene_block]
                      for jj in range(4)]
            wb = jax.lax.switch(j, [lambda a=a: a for a in planes])
            mb = (jnp.int32(1) << r).astype(jnp.int8)
            m = jnp.where((wb & mb) != jnp.int8(0), jnp.int8(1),
                          jnp.int8(0))
            part = jax.lax.dot_general(
                P, m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            i = pl.program_id(1)

            @pl.when(i == 0)
            def _():
                out_ref[:, :] = part.astype(jnp.float32)

            @pl.when(i > 0)
            def _():
                out_ref[:, :] = out_ref[:, :] + part.astype(jnp.float32)

        return pl.pallas_call(
            kern, grid=(n_gb, block // bc),
            in_specs=[
                pl.BlockSpec((bc, np_pad + 4 * gene_block),
                             lambda g, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((np_pad, gene_block),
                                   lambda g, i: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_pad, genes), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 << 20))


    def make_floor5_call(block, bc=1024):
        """B-kernel reading a PREBUILT int8 mask (no in-kernel unpack):
        tests whether a shared once-per-group unpack buffer removes the
        mask-materialization cost from the product kernels."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_gb = genes // gene_block

        def kern(m_ref, P_ref, out_ref):
            i = pl.program_id(1)
            part = jax.lax.dot_general(
                P_ref[:, :], m_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(i == 0)
            def _():
                out_ref[:, :] = part.astype(jnp.float32)

            @pl.when(i > 0)
            def _():
                out_ref[:, :] = out_ref[:, :] + part.astype(jnp.float32)

        return pl.pallas_call(
            kern, grid=(n_gb, block // bc),
            in_specs=[
                pl.BlockSpec((1, bc, gene_block), lambda g, i: (g, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bc, np_pad), lambda g, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((np_pad, gene_block),
                                   lambda g, i: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_pad, genes), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 << 20))

    def make_dot_floor2_call(block, bc=1024, shift_mode="dynamic",
                             semantics=("arbitrary", "arbitrary")):
        """Floor + the REAL words input stream and bit-unpack: isolates
        the cost of the (bc, gene_block) u32 stream and the dynamic-scalar
        shift vs the pure-dot floor."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_gb = genes // gene_block

        def kern(w_ref, P_ref, out_ref):
            g = pl.program_id(0)
            i = pl.program_id(1)
            if shift_mode == "dynamic":
                s = (g % 32).astype(jnp.uint32)
                m32 = ((w_ref[:, :] >> s) & jnp.uint32(1)).astype(jnp.int32)
            elif shift_mode == "static":
                m32 = ((w_ref[:, :] >> jnp.uint32(7))
                       & jnp.uint32(1)).astype(jnp.int32)
            else:  # mult: shift via multiply-free compare trick
                m32 = (w_ref[:, :] & jnp.uint32(1)).astype(jnp.int32)
            m = m32.astype(jnp.float32).astype(jnp.int8)
            part = jax.lax.dot_general(
                P_ref[:, :], m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(i == 0)
            def _():
                out_ref[:, :] = part.astype(jnp.float32)

            @pl.when(i > 0)
            def _():
                out_ref[:, :] = out_ref[:, :] + part.astype(jnp.float32)

        return pl.pallas_call(
            kern, grid=(n_gb, block // bc),
            in_specs=[
                pl.BlockSpec((bc, gene_block), lambda g, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bc, np_pad), lambda g, i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((np_pad, gene_block),
                                   lambda g, i: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_pad, genes), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 << 20))

    def make_dot_floor_call(block, bc=1024):
        """Pure int8 MXU rate at the h-kernel shape: same grid/specs as
        _mph_bits_kernel but the mask operand is a constant built
        in-register — no word read, no unpack, no dequant scale-select."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_gb = genes // gene_block

        def kern(P_ref, out_ref):
            i = pl.program_id(1)
            it = jax.lax.broadcasted_iota(jnp.int32, (bc, gene_block), 0)
            m = ((it + i) & 1).astype(jnp.float32).astype(jnp.int8)
            part = jax.lax.dot_general(
                P_ref[:, :], m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(i == 0)
            def _():
                out_ref[:, :] = part.astype(jnp.float32)

            @pl.when(i > 0)
            def _():
                out_ref[:, :] = out_ref[:, :] + part.astype(jnp.float32)

        return pl.pallas_call(
            kern, grid=(n_gb, block // bc),
            in_specs=[pl.BlockSpec((bc, np_pad), lambda g, i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((np_pad, gene_block),
                                   lambda g, i: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_pad, genes), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 << 20))

    out = {"metric": "probe_grpflush", "cells": cells, "k": k,
           "block": mblock, "group": F}
    what = os.environ.get("PROBE_WHAT", "all")
    if what in ("floor", "floor2", "floor4", "floor5"):
        chunk = 65536
        reps = cells // chunk
        Pq_c = quantize_pairs(
            packed_outer_products(H[:chunk], iu_pad), axis=0)[0]
        w_c = words[:chunk]

        def run(call, with_words):
            @jax.jit
            def f(Pq, wds):
                def body(acc, _):
                    p = Pq + acc.astype(jnp.int8)
                    r = call(wds, p) if with_words else call(p)
                    return acc + r[0, 0] + r[-1, -1], None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=reps)
                return acc
            return timed(f, Pq_c, w_c)

        if what == "floor":
            out["h_dot_floor_s"] = round(
                run(make_dot_floor_call(chunk), False), 3)
        elif what == "floor5":
            from singlet_tpu.ops.maskbits import unpack_mask_bits
            n_gb = genes // gene_block
            m8 = unpack_mask_bits(w_c, gene_block=gene_block)  # (c, genes) i8
            m83 = m8.reshape(chunk, n_gb, gene_block).transpose(1, 0, 2)
            call5 = make_floor5_call(chunk)

            @jax.jit
            def f5(m83, Pq):
                def body(acc, _):
                    r = call5(m83, Pq + acc.astype(jnp.int8))
                    return acc + r[0, 0] + r[-1, -1], None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=reps)
                return acc
            out["h_floor5_s"] = round(timed(f5, m83, Pq_c), 3)
        elif what == "floor4":
            # byte-plane repack of words (once; plane-major contiguous)
            wb = jax.lax.bitcast_convert_type(w_c, jnp.int8)  # (c, 512, 4)
            wb = wb.transpose(0, 2, 1).reshape(chunk, 4 * gene_block)
            Fq = jnp.concatenate([Pq_c, wb], axis=1)
            call4 = make_floor4_call(chunk)

            @jax.jit
            def f4(F):
                def body(acc, _):
                    r = call4(F + acc.astype(jnp.int8))
                    return acc + r[0, 0] + r[-1, -1], None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                                      length=reps)
                return acc
            out["h_floor4_s"] = round(timed(f4, Fq), 3)
        else:
            out["h_floor2_dyn_s"] = round(
                run(make_dot_floor2_call(chunk), True), 3)
            out["h_floor2_par_s"] = round(
                run(make_dot_floor2_call(chunk, semantics=("parallel",
                                                           "arbitrary")),
                    True), 3)
            out["h_floor2_bc2048_s"] = round(
                run(make_dot_floor2_call(chunk, bc=2048), True), 3)
        import json
        print(json.dumps(out))
        return
    what = os.environ.get("PROBE_WHAT", "all")
    if what in ("all", "h"):
        out["h_per_block_s"] = round(timed(per_block, H, words), 3)
        out["h_grouped_s"] = round(timed(grouped, H, words), 3)
    if what in ("all", "hk"):
        out["h_kernel_only_grouped_s"] = round(
            timed(kernel_only_grouped, H, words), 3)
    if what in ("all", "h"):
        out["h_emission_only_s"] = round(timed(emission_only, H), 3)
    if what in ("all", "w", "hk"):
        out["w_per_block_s"] = round(
            timed(wt_per_block, Pw_q, Pw_s, words), 3)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
