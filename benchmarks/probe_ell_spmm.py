"""Microbenchmark ELL->MXU strategies for the large-scale SpMM pass.

The fused ELL fit spends ~97% of each iteration in the scatter-add densify
(measured 4.4 s per pass vs 0.07 s matmul; see BASELINE.md). Candidates, all
timed on 16 cell blocks of the real operand shape (2048 cells x 16384
genes, 824 nnz/cell, k=128) and reported scaled to a full 256-block pass:

  scatter          tile.at[rows, idx].add(val)            (current engine)
  scatter_hints    same + unique/sorted hints on sorted planes
  gather_take      B[c] = sum_j val[c,j] * W[idx[c,j]]    (jnp.take rows)
  cmp_einsum       sorted planes + per-gene-block windows: build each
                   (cells, gene_block) tile by compare-einsum on the VPU,
                   then MXU matmul against W[gene_block]
  dense_floor      matmul on a prebuilt dense tile (lower bound)

Run: python benchmarks/probe_ell_spmm.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELL_BLOCK = 2048
GENES = 16384
P = 824
K = 128
N_BLOCKS = 8            # timed blocks; full pass = 256
GENE_BLOCK = 2048
WINDOW = 160            # max nnz of one cell inside one gene block (padded)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from singlet_tpu.ops.linalg import MM_PRECISION

    cells = CELL_BLOCK * N_BLOCKS
    n_gb = GENES // GENE_BLOCK
    # device-side generation (the tunnel uploads at ~3-6 MB/s; the planes
    # are ~220 MB). Sorted rows in CLOSED FORM (row-wise argsort on TPU is
    # pathologically slow): slot j spans [floor(j*G/P), floor((j+1)*G/P));
    # each cell picks a hash-jittered position inside its slot — sorted,
    # distinct, pseudo-random.
    from benchmarks.largescale import _hash_val

    @jax.jit
    def gen():
        j = jnp.arange(P, dtype=jnp.int32)[None, :]
        c = jnp.arange(cells, dtype=jnp.int32)[:, None]
        base = (j * GENES) // P
        gap = ((j + 1) * GENES) // P - base
        h = (c.astype(jnp.uint32) * jnp.uint32(2654435761)
             + j.astype(jnp.uint32) * jnp.uint32(40503))
        h = (h & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        i = base + (h % jnp.maximum(gap, 1))
        v = _hash_val(c + jnp.zeros_like(i), i)
        st = jnp.stack([(i < gb * GENE_BLOCK).sum(axis=1)
                        for gb in range(n_gb)], axis=1).astype(jnp.int32)
        cnt = jnp.diff(jnp.concatenate(
            [st, jnp.full((cells, 1), P, jnp.int32)], axis=1), axis=1)
        return i.astype(jnp.int32), v, st, cnt.max()

    print("generating operand on device...", flush=True)
    t0 = time.perf_counter()
    idx_d, val_d, starts_d, maxw = gen()
    max_window = int(maxw)
    print(f"gen done in {time.perf_counter() - t0:.1f}s, "
          f"max_window={max_window}", flush=True)
    assert max_window <= WINDOW, f"window {max_window} > {WINDOW}"
    W = jax.random.uniform(jax.random.PRNGKey(0), (GENES, K), jnp.float32)

    def blocks(fn, init):
        def blk(acc, bi):
            s = bi * CELL_BLOCK
            i = jax.lax.dynamic_slice_in_dim(idx_d, s, CELL_BLOCK, 0)
            v = jax.lax.dynamic_slice_in_dim(val_d, s, CELL_BLOCK, 0)
            st = jax.lax.dynamic_slice_in_dim(starts_d, s, CELL_BLOCK, 0)
            return fn(acc, i, v, st), None
        acc, _ = jax.lax.scan(blk, init, jnp.arange(N_BLOCKS))
        return acc

    rows = jnp.arange(CELL_BLOCK)[:, None]

    @jax.jit
    def scatter():
        def blk(acc, i, v, st):
            tile = jnp.zeros((CELL_BLOCK, GENES), jnp.float32)
            tile = tile.at[rows, i].add(v)
            B = jnp.dot(tile, W, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1]
        return blocks(blk, jnp.zeros(()))

    @jax.jit
    def scatter_hints():
        def blk(acc, i, v, st):
            tile = jnp.zeros((CELL_BLOCK, GENES), jnp.float32)
            tile = tile.at[rows, i].add(v, indices_are_sorted=True,
                                        unique_indices=True)
            B = jnp.dot(tile, W, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1]
        return blocks(blk, jnp.zeros(()))

    @jax.jit
    def gather_take():
        def blk(acc, i, v, st):
            Wg = jnp.take(W, i, axis=0)            # (blk, P, K)
            B = jnp.einsum("cj,cjk->ck", v, Wg)
            return acc + B[0, 0] + B[-1, -1]
        return blocks(blk, jnp.zeros(()))

    iota_g = jnp.arange(GENE_BLOCK, dtype=jnp.int32)[None, None, :]

    @jax.jit
    def cmp_einsum():
        def blk(acc, i, v, st):
            B = jnp.zeros((CELL_BLOCK, K), jnp.float32)
            for gb in range(n_gb):
                s = st[:, gb]                       # (blk,)
                jj = s[:, None] + jnp.arange(WINDOW, dtype=jnp.int32)[None]
                jj = jnp.minimum(jj, P - 1)
                li = jnp.take_along_axis(i, jj, axis=1) - gb * GENE_BLOCK
                lv = jnp.take_along_axis(v, jj, axis=1)
                inb = (li >= 0) & (li < GENE_BLOCK)
                lv = jnp.where(inb, lv, 0.0)
                li = jnp.where(inb, li, 0)
                onehot = (li[:, :, None] == iota_g)
                tile = jnp.einsum("cj,cjg->cg", lv,
                                  onehot.astype(jnp.float32))
                Wb = jax.lax.dynamic_slice_in_dim(W, gb * GENE_BLOCK,
                                                  GENE_BLOCK, 0)
                B = B + jnp.dot(tile, Wb, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1]
        return blocks(blk, jnp.zeros(()))

    @jax.jit
    def dense_floor():
        tile0 = jnp.zeros((CELL_BLOCK, GENES), jnp.float32) \
            .at[rows, idx_d[:CELL_BLOCK]].add(val_d[:CELL_BLOCK])

        def blk(acc, i, v, st):
            B = jnp.dot(tile0 + v[0, 0], W, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1]
        return blocks(blk, jnp.zeros(()))

    def timed(f, n=2):
        float(f())
        t0 = time.perf_counter()
        for _ in range(n):
            float(f())
        per16 = (time.perf_counter() - t0) / n
        return round(per16 * (256 / N_BLOCKS), 3)

    # ---- blocked-ELL: gene-block-partitioned planes with fixed width and
    # LOCAL indices, built at ingest. The tile build is contiguous loads +
    # multiply-compare-sum over a tiny window; no gathers at all.
    BELL_GB = 512
    bell_w = -(-P // (GENES // BELL_GB))        # 26 for the even pattern
    n_bgb = GENES // BELL_GB

    @jax.jit
    def gen_bell():
        c = jnp.arange(cells, dtype=jnp.int32)[:, None, None]
        gb = jnp.arange(n_bgb, dtype=jnp.int32)[None, :, None]
        w = jnp.arange(bell_w, dtype=jnp.int32)[None, None, :]
        base = (w * BELL_GB) // bell_w
        gap = ((w + 1) * BELL_GB) // bell_w - base
        h = (c.astype(jnp.uint32) * jnp.uint32(2654435761)
             + (gb * bell_w + w).astype(jnp.uint32) * jnp.uint32(40503))
        h = (h & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        li = base + h % jnp.maximum(gap, 1)          # local idx in [0, GB)
        gidx = gb * BELL_GB + li
        v = _hash_val(c + jnp.zeros_like(gidx), gidx)
        return (li.reshape(cells, n_bgb * bell_w),
                v.reshape(cells, n_bgb * bell_w))

    bli_d, bval_d = gen_bell()
    iota_b = jnp.arange(BELL_GB, dtype=jnp.int32)[None, None, :]

    @jax.jit
    def bell_xla():
        def blk(acc, bi):
            s = bi * CELL_BLOCK
            li = jax.lax.dynamic_slice_in_dim(bli_d, s, CELL_BLOCK, 0)
            lv = jax.lax.dynamic_slice_in_dim(bval_d, s, CELL_BLOCK, 0)
            B = jnp.zeros((CELL_BLOCK, K), jnp.float32)
            for gb in range(n_bgb):
                lig = li[:, gb * bell_w:(gb + 1) * bell_w]
                lvg = lv[:, gb * bell_w:(gb + 1) * bell_w]
                tile = jnp.sum(
                    lvg[:, :, None] * (lig[:, :, None] == iota_b),
                    axis=1)                          # (blk, BELL_GB), VPU
                Wb = jax.lax.dynamic_slice_in_dim(W, gb * BELL_GB,
                                                  BELL_GB, 0)
                B = B + jnp.dot(tile, Wb, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1], None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(N_BLOCKS))
        return acc

    iota_row = jnp.arange(BELL_GB, dtype=jnp.int32)[None, :]

    @jax.jit
    def bell_unroll():
        # static unroll over the window: a chain of (blk, GB) elementwise
        # FMAs that XLA fuses into ONE kernel — no 3D intermediate
        def blk(acc, bi):
            s = bi * CELL_BLOCK
            li = jax.lax.dynamic_slice_in_dim(bli_d, s, CELL_BLOCK, 0)
            lv = jax.lax.dynamic_slice_in_dim(bval_d, s, CELL_BLOCK, 0)
            B = jnp.zeros((CELL_BLOCK, K), jnp.float32)
            for gb in range(n_bgb):
                lig = li[:, gb * bell_w:(gb + 1) * bell_w]
                lvg = lv[:, gb * bell_w:(gb + 1) * bell_w]
                tile = jnp.zeros((CELL_BLOCK, BELL_GB), jnp.float32)
                for w in range(bell_w):
                    tile = tile + lvg[:, w:w + 1] * \
                        (lig[:, w:w + 1] == iota_row)
                Wb = jax.lax.dynamic_slice_in_dim(W, gb * BELL_GB,
                                                  BELL_GB, 0)
                B = B + jnp.dot(tile, Wb, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1], None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(N_BLOCKS))
        return acc

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    res = {}
    for name, f in [("bell_unroll", bell_unroll),
                    ("bell_xla", bell_xla), ("scatter", scatter),
                    ("scatter_hints", scatter_hints),
                    ("gather_take", gather_take), ("cmp_einsum", cmp_einsum),
                    ("dense_floor", dense_floor)]:
        if args.only and name not in args.only.split(","):
            continue
        try:
            res[name + "_pass_s"] = timed(f)
        except Exception as e:  # noqa: BLE001
            res[name + "_pass_s"] = f"ERR {type(e).__name__}"
        print(name, res[name + "_pass_s"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
