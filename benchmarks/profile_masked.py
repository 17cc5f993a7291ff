"""Decompose the masked (CV) large-scale iteration: RNG mask build vs
packed-Gram matmuls vs per-cell-Gram NNLS vs masked tile products, on the
real operand shapes (524k cells x 16k genes, k=100, 5% mask), current
blocked-ELL layout.

Sync discipline: scalar fetch per call (block_until_ready does not wait on
the tunneled platform); chained dependencies inside each probe prevent the
relay from deduping repeats.

Run: python benchmarks/profile_masked.py [--cells N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=524288)
    ap.add_argument("--genes", type=int, default=16384)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nnz", type=int, default=824)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from benchmarks.largescale import build_sharded_ell_synth
    from singlet_tpu.ops.linalg import (
        MASK_MM_PRECISION, MM_PRECISION, packed_outer_products, triu_pairs,
        unpack_sym)
    from singlet_tpu.ops.nnls import solve_nnls
    from singlet_tpu.ops.rngmask import mask_block, seed_pair
    from singlet_tpu.parallel.sharded_ell import _bell_tile

    genes, cells, k = args.genes, args.cells, args.k
    data = build_sharded_ell_synth(genes, cells, args.nnz)
    cell_block, gene_block = data.cell_block, data.gene_block
    n_blocks = cells // cell_block
    n_gb = genes // gene_block
    b_li, b_val = data.b_li, data.b_val
    float(jnp.sum(b_val[0]))
    inv_density = 20
    seed = seed_pair(123)
    iu = triu_pairs(k)
    npairs = k * (k + 1) // 2
    gene_ids = jnp.arange(genes)

    def slice_blk(arr, bi, blk=cell_block):
        return jax.lax.dynamic_slice_in_dim(arr, bi * blk, blk, 0)

    width = data.b_width

    def slice_planes(arr, bi):
        return jax.lax.dynamic_slice_in_dim(arr, bi * cell_block,
                                            cell_block, 1)

    def gb_rows(gb):
        return slice(gb * width, (gb + 1) * width)

    def mask_of(bi):
        ids = bi * cell_block + jnp.arange(cell_block)
        return mask_block(seed, ids, gene_ids, inv_density)

    def scan_blocks(blk_fn):
        acc, _ = jax.lax.scan(lambda a, bi: (blk_fn(a, bi), None),
                              jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    @jax.jit
    def mask_only(seed):
        return scan_blocks(
            lambda acc, bi: acc + jnp.sum(mask_of(bi)[::512, ::512]))

    @jax.jit
    def mask_pw(seed, Pw):
        """mask gen + h-side packed-Gram product (cells x genes @ genes x np)."""
        def blk(acc, bi):
            m = mask_of(bi)
            packed = jnp.dot(m.astype(jnp.float32), Pw,
                             precision=MASK_MM_PRECISION)
            return acc + packed[0, 0] + packed[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def tiles_only(b_li, b_val):
        """bELL tile densify alone (both passes do this)."""
        def blk(acc, bi):
            li, lv = slice_planes(b_li, bi), slice_planes(b_val, bi)
            s = jnp.zeros(())
            for gb in range(n_gb):
                tile = _bell_tile(li[gb_rows(gb)], lv[gb_rows(gb)],
                                  gene_block)
                s = s + tile[0, 0] + tile[-1, -1]
            return acc + s
        return scan_blocks(blk)

    @jax.jit
    def masked_tiles_dot(seed, b_val, b_li, W):
        """mask gen + keep-multiplied tile B product (the masked h RHS)."""
        def blk(acc, bi):
            m = mask_of(bi)
            keep = jnp.where(m, 0.0, 1.0)
            li, lv = slice_planes(b_li, bi), slice_planes(b_val, bi)
            B = jnp.zeros((cell_block, k), jnp.float32)
            for gb in range(n_gb):
                tile = _bell_tile(li[gb_rows(gb)], lv[gb_rows(gb)],
                                  gene_block)
                gsl = slice(gb * gene_block, (gb + 1) * gene_block)
                B = B + jnp.dot(tile * keep[:, gsl], W[gsl],
                                precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def packed_h_accum(seed, H):
        """mask gen + w-side packed accumulation (genes x cells @ cells x np)."""
        def blk(acc, bi):
            m = mask_of(bi)
            Hb = slice_blk(H, bi)
            Ph_b = packed_outer_products(Hb, iu)
            Pk = jnp.dot(m.astype(jnp.float32).T, Ph_b,
                         precision=MASK_MM_PRECISION)
            return acc + Pk[0, 0] + Pk[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def gram_prep_nnls(packed0, a_full, B, X0):
        """unpack + per-cell-Gram NNLS on one block's worth, scanned."""
        def blk(acc, bi):
            pk = packed0 + acc * 1e-30    # chain dependency
            a_blk = a_full[None] - unpack_sym(pk, k, iu)
            Hb = solve_nnls(a_blk, B, X0, L1=0.01)
            return acc + Hb[0, 0] + Hb[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def shared_gram_nnls(a_full, B, X0):
        """shared-Gram NNLS (the plain path's solve) for comparison."""
        def blk(acc, bi):
            Hb = solve_nnls(a_full * (1 + acc * 1e-30), B, X0, L1=0.01)
            return acc + Hb[0, 0] + Hb[-1, -1]
        return scan_blocks(blk)

    key = jax.random.PRNGKey(0)
    W = jax.random.uniform(key, (genes, k), jnp.float32)
    H = jax.random.uniform(jax.random.PRNGKey(1), (cells, k), jnp.float32)
    Pw = packed_outer_products(W, iu)
    a_full = jnp.dot(W.T, W) + 1e-15 * jnp.eye(k)
    packed0 = jax.random.uniform(jax.random.PRNGKey(2),
                                 (cell_block, npairs), jnp.float32)
    B0 = jax.random.uniform(jax.random.PRNGKey(3), (cell_block, k))
    X0 = jnp.zeros((cell_block, k), jnp.float32)

    def timed(f, *args, n=2):
        float(f(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            float(f(*args))
        return round((time.perf_counter() - t0) / n, 3)

    res = {"mask_mm_precision": str(MASK_MM_PRECISION),
           "cells": cells, "genes": genes, "k": k}
    for name, fn, fargs in [
        ("mask_only_s", mask_only, (seed,)),
        ("tiles_only_s", tiles_only, (b_li, b_val)),
        ("mask_pw_s", mask_pw, (seed, Pw)),
        ("masked_tiles_dot_s", masked_tiles_dot, (seed, b_val, b_li, W)),
        ("packed_h_accum_s", packed_h_accum, (seed, H)),
        ("gram_prep_nnls_s", gram_prep_nnls, (packed0, a_full, B0, X0)),
        ("shared_gram_nnls_s", shared_gram_nnls, (a_full, B0, X0)),
    ]:
        res[name] = timed(fn, *fargs)
        print(name, res[name], flush=True)
    print(json.dumps(res), flush=True)


def kernels():
    """Per-pass timing of the round-4 masked-pipeline kernels on the real
    operand shapes: the fused in-kernel-mask packed products
    (ops/pallas_maskgram.py), the masked bELL SpMMs (ops/pallas_bell.py),
    and the packed-t CD solve, each scanned over all cell blocks with a
    chained dependency (the relay dedupes unchained repeats).

    Run: python benchmarks/profile_masked.py --kernels [--cells N]
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", action="store_true")
    ap.add_argument("--cells", type=int, default=524288)
    ap.add_argument("--genes", type=int, default=16384)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nnz", type=int, default=824)
    args = ap.parse_args()

    import json
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from benchmarks.largescale import build_sharded_ell_synth
    from singlet_tpu.ops.linalg import (MM_PRECISION, packed_outer_products,
                                        pad_pairs, triu_pairs)
    from singlet_tpu.ops.nnls import solve_nnls_packed_t
    from singlet_tpu.ops.pallas_bell import bell_spmm, bell_spmm_t
    from singlet_tpu.ops.pallas_maskgram import (mask_packed_h_t,
                                                 mask_packed_w_t)
    from singlet_tpu.ops.rngmask import seed_pair

    genes, cells, k = args.genes, args.cells, args.k
    data = build_sharded_ell_synth(genes, cells, args.nnz)
    cell_block, gene_block = data.cell_block, data.gene_block
    n_blocks = cells // cell_block
    n_gb = genes // gene_block
    b_li, b_val = data.b_li, data.b_val
    float(jnp.sum(b_val[0]))
    inv_density = 20
    seed = seed_pair(123)
    iu = triu_pairs(k)
    npairs = k * (k + 1) // 2
    np_pad = -(-npairs // 128) * 128
    iu_pad = pad_pairs(iu, np_pad)

    key = jax.random.PRNGKey(0)
    W = jax.random.uniform(key, (genes, k), jnp.float32)
    Pw = packed_outer_products(W, iu_pad).astype(jnp.bfloat16)
    a_full = jnp.dot(W.T, W) + 1e-15 * jnp.eye(k)
    H = jax.random.uniform(jax.random.PRNGKey(1), (cells, k), jnp.float32)
    B0 = jax.random.uniform(jax.random.PRNGKey(3), (cell_block, k))
    X0 = jnp.zeros((cell_block, k), jnp.float32)
    pk0 = jax.random.uniform(jax.random.PRNGKey(2), (np_pad, cell_block),
                             jnp.float32)

    def scan_blocks(blk_fn):
        acc, _ = jax.lax.scan(lambda a, bi: (blk_fn(a, bi), None),
                              jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    def slice_planes(arr, bi):
        return jax.lax.dynamic_slice_in_dim(arr, bi * cell_block,
                                            cell_block, 1)

    def ids_of(bi):
        return bi * cell_block + jnp.arange(cell_block, dtype=jnp.int32)

    @jax.jit
    def mpw(seed, Pw):
        def blk(acc, bi):
            pt = mask_packed_w_t(Pw, seed, ids_of(bi) + acc.astype(jnp.int32)
                                 * 0, gene_block=gene_block,
                                 inv_density=inv_density, cells_true=cells,
                                 genes_true=genes)
            return acc + pt[0, 0] + pt[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def mph(seed, H):
        def blk(carry, bi):
            acc, pk_t = carry
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            Ph = packed_outer_products(Hb + acc * 1e-30, iu_pad)
            pk_t = mask_packed_h_t(Ph, seed, ids_of(bi), pk_t,
                                   gene_block=gene_block,
                                   inv_density=inv_density, cells_true=cells,
                                   genes_true=genes)
            return (acc + pk_t[0, 0] + pk_t[-1, -1], pk_t), None
        carry0 = (jnp.zeros(()), jnp.zeros((np_pad, genes), jnp.float32))
        (acc, _), _ = jax.lax.scan(
            lambda c, bi: blk(c, bi), carry0, jnp.arange(n_blocks))
        return acc

    @jax.jit
    def spmm_b_masked(seed, b_li, b_val, W):
        def blk(acc, bi):
            li, lv = slice_planes(b_li, bi), slice_planes(b_val, bi)
            B = bell_spmm(li, lv, W + acc * 1e-30, seed, ids_of(bi),
                          gene_block=gene_block, inv_density=inv_density,
                          masked=True, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def spmm_bw_masked(seed, b_li, b_val, H):
        def blk(acc, bi):
            li, lv = slice_planes(b_li, bi), slice_planes(b_val, bi)
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            Bw = bell_spmm_t(li, lv, Hb + acc * 1e-30, seed, ids_of(bi),
                             gene_block=gene_block, n_gb=n_gb,
                             inv_density=inv_density, masked=True,
                             precision=MM_PRECISION)
            return acc + Bw[0, 0] + Bw[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def nnls_packed_t32(pk0, a_full, B, X0):
        def blk(acc, bi):
            pk = pk0 + acc * 1e-30
            Hb = solve_nnls_packed_t(a_full, pk, iu, B, X0, L1=0.01,
                                     sweep_cap=jnp.float32(32.0))
            return acc + Hb[0, 0] + Hb[-1, -1]
        return scan_blocks(blk)

    def timed(f, *a, n=2):
        float(f(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            float(f(*a))
        return round((time.perf_counter() - t0) / n, 3)

    # --- round-4 bits kernels: fit-invariant packed mask + int8 MXU ---
    from singlet_tpu.ops.maskbits import pack_mask_words
    from singlet_tpu.ops.pallas_maskgram import (mask_packed_h_t_bits,
                                                 mask_packed_w_t_bits,
                                                 quantize_pairs)

    @jax.jit
    def pack_bits(seed):
        ids = jnp.arange(cells, dtype=jnp.int32)
        w = pack_mask_words(seed, ids, genes_pad=genes,
                            gene_block=gene_block, inv_density=inv_density,
                            cells_true=cells, genes_true=genes,
                            cell_block=cell_block)
        return w, w.T

    words, words_t = pack_bits(seed)
    float(jnp.sum(words[0, :8].astype(jnp.float32)))
    Pw_q, Pw_s = quantize_pairs(
        packed_outer_products(jax.random.uniform(key, (genes, k)), iu_pad),
        axis=0)

    @jax.jit
    def mpw_bits(words_t, Pw_q, Pw_s):
        def blk(acc, bi):
            wt = jax.lax.dynamic_slice_in_dim(
                words_t, bi * cell_block + acc.astype(jnp.int32) % 1,
                cell_block, 1)
            pt = mask_packed_w_t_bits(Pw_q, Pw_s, wt,
                                      gene_block=gene_block)
            return acc + pt[0, 0] + pt[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def mph_bits(words, H):
        def blk(carry, bi):
            acc, pk_t = carry
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            Ph = packed_outer_products(Hb + acc * 1e-30, iu_pad)
            Ph_q, Ph_s = quantize_pairs(Ph, axis=0)
            w_blk = jax.lax.dynamic_slice_in_dim(
                words, bi * cell_block, cell_block, 0)
            pk_t = mask_packed_h_t_bits(Ph_q, Ph_s, w_blk, pk_t,
                                        gene_block=gene_block)
            return (acc + pk_t[0, 0] + pk_t[-1, -1], pk_t), None
        carry0 = (jnp.zeros(()), jnp.zeros((np_pad, genes), jnp.float32))
        (acc, _), _ = jax.lax.scan(
            lambda c, bi: blk(c, bi), carry0, jnp.arange(n_blocks))
        return acc

    # --- bits keep-mask bELL SpMMs (the PRODUCTION masked-spmm path since
    # commit 3554770; the hash rows above are the non-default fallback) ---
    from singlet_tpu.ops.pallas_bell import bell_spmm_bits, bell_spmm_t_bits

    @jax.jit
    def spmm_b_bits(words_t, b_li, b_val, W):
        def blk(acc, bi):
            li, lv = slice_planes(b_li, bi), slice_planes(b_val, bi)
            wt = jax.lax.dynamic_slice_in_dim(
                words_t, bi * cell_block + acc.astype(jnp.int32) % 1,
                cell_block, 1)
            B = bell_spmm_bits(li, lv, W, wt, gene_block=gene_block,
                               precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1]
        return scan_blocks(blk)

    @jax.jit
    def spmm_bw_bits(words_t, b_li, b_val, H):
        def blk(acc, bi):
            li, lv = slice_planes(b_li, bi), slice_planes(b_val, bi)
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            wt = jax.lax.dynamic_slice_in_dim(
                words_t, bi * cell_block + acc.astype(jnp.int32) % 1,
                cell_block, 1)
            Bw = bell_spmm_t_bits(li, lv, Hb + acc * 1e-30, wt,
                                  gene_block=gene_block, n_gb=n_gb,
                                  precision=MM_PRECISION)
            return acc + Bw[0, 0] + Bw[-1, -1]
        return scan_blocks(blk)

    # --- round-5 grouped w-side flush (the production h_t path: int8
    # emission per block, ONE batched carry flush per 16 blocks) ---
    @jax.jit
    def mph_bits_grouped(words, H):
        F = 16 if n_blocks % 16 == 0 else 1

        def inner(acc, bi):
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            Ph = packed_outer_products(Hb + acc * 1e-30, iu_pad)
            q, s = quantize_pairs(Ph, axis=0)
            return acc + q[0, 0].astype(jnp.float32) * 1e-30, (q, s)

        def grp(carry, gi):
            acc, pk_t = carry
            acc, (qs, ss) = jax.lax.scan(inner, acc,
                                         gi * F + jnp.arange(F))
            w_grp = jax.lax.dynamic_slice_in_dim(
                words, gi * (F * cell_block), F * cell_block, 0)
            pk_t = mask_packed_h_t_bits(
                qs.reshape(F * cell_block, np_pad), ss.T, w_grp, pk_t,
                gene_block=gene_block, scale_block=cell_block)
            return (acc + pk_t[0, 0] + pk_t[-1, -1], pk_t), None
        carry0 = (jnp.zeros(()), jnp.zeros((np_pad, genes), jnp.float32))
        (acc, _), _ = jax.lax.scan(grp, carry0,
                                   jnp.arange(n_blocks // 16))
        return acc

    res = {"metric": "masked_kernels_per_pass", "cells": cells, "k": k}
    for name, fn, fa in [
        ("mask_packed_w_t_s", mpw, (seed, Pw)),
        ("mask_packed_h_t_s", mph, (seed, H)),
        ("pack_bits_once_s", lambda s: jnp.sum(
            pack_bits(s)[0][:, ::512].astype(jnp.float32)), (seed,)),
        ("mask_packed_w_t_bits_s", mpw_bits, (words_t, Pw_q, Pw_s)),
        ("mask_packed_h_t_bits_s", mph_bits, (words, H)),
        ("mask_packed_h_t_bits_grouped_s", mph_bits_grouped, (words, H)),
        ("bell_spmm_masked_hash_s", spmm_b_masked, (seed, b_li, b_val, W)),
        ("bell_spmm_t_masked_hash_s", spmm_bw_masked,
         (seed, b_li, b_val, H)),
        ("bell_spmm_bits_s", spmm_b_bits, (words_t, b_li, b_val, W)),
        ("bell_spmm_t_bits_s", spmm_bw_bits, (words_t, b_li, b_val, H)),
        ("nnls_packed_t_cap32_s", nnls_packed_t32,
         (pk0, a_full, B0, X0)),
    ]:
        res[name] = timed(fn, *fa)
        print(name, res[name], flush=True)
    print(json.dumps(res), flush=True)


def sweepcost():
    """Isolate the in-fit per-cell-Gram CD cost by running the SAME masked
    sharded step at several sweep caps — the cap is a RUNTIME argument of
    the per-step API (one compiled program), so iteration time as a
    function of cap separates the CD-sweep cost from everything else
    INSIDE the real program. This answers the round-3 'probe 0.27 s vs
    in-fit 0.85 s' anomaly with a decomposition that sums by construction:
    iter(cap) - iter(1) IS the marginal sweep cost at that cap.

    Run: python benchmarks/profile_masked.py --sweepcost [--cells N]
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sweepcost", action="store_true")
    ap.add_argument("--cells", type=int, default=524288)
    ap.add_argument("--genes", type=int, default=16384)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--nnz", type=int, default=824)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import time

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from benchmarks.largescale import build_sharded_ell_synth
    from singlet_tpu.ops.rngmask import seed_pair
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    data = build_sharded_ell_synth(args.genes, args.cells, args.nnz)
    eng = ShardedEllEngine(None, data=data)
    _, masked_step, _ = eng.steps(20)
    W0, H0, eargs, _ = eng._state(args.k, None, 0)
    f32 = jnp.float32
    sp_ = seed_pair(0)

    def iters(cap, n):
        # a short warm-started trajectory at the given cap; the scalar d
        # fetch at the end is the device sync
        W, H = W0, H0
        for _ in range(n):
            W, H, d, tol = masked_step(*eargs, W, H, sp_, f32(0.01),
                                       f32(0.01), f32(0.0), f32(0.0),
                                       jnp.int32(args.k), f32(cap))
        float(d[0])
        return W, H

    res = {"metric": "masked_sweepcost", "cells": args.cells, "k": args.k}
    iters(1e9, 1)                      # compile + warm
    for cap in (1, 8, 32, 100, 1e9):
        t0 = time.perf_counter()
        iters(cap, args.iters)
        per = (time.perf_counter() - t0) / args.iters
        res[f"iter_s_cap{int(cap)}"] = round(per, 3)
        print(f"cap {int(cap):>10}: {per:.3f} s/iter", flush=True)
    res["nnls_s_cap100_minus_cap1"] = round(
        res["iter_s_cap100"] - res["iter_s_cap1"], 3)
    import json as _json

    print(_json.dumps(res), flush=True)


if __name__ == "__main__":
    import sys
    if "--sweepcost" in sys.argv:
        sweepcost()
    elif "--kernels" in sys.argv:
        kernels()
    else:
        main()
