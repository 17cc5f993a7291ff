"""Decompose the large-scale blocked-ELL iteration cost: tile build vs
matmul vs NNLS, on the real operand shapes (524k cells x 16k genes, k=100).

Each phase is its own jitted program reduced to a SCALAR output that is
fetched with float() — on the tunneled platform block_until_ready does NOT
wait, so scalar fetch is the only honest sync (see
benchmarks/probe_loop_overhead.py).

Run: python benchmarks/profile_largescale.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from benchmarks.largescale import build_sharded_ell_synth
    from singlet_tpu.ops.linalg import MM_PRECISION
    from singlet_tpu.ops.nnls import solve_nnls
    from singlet_tpu.parallel.sharded_ell import _bell_tile

    genes, cells, p, k = 16384, 524288, 824, 100
    data = build_sharded_ell_synth(genes, cells, p)
    cell_block, gene_block = data.cell_block, data.gene_block
    n_blocks = cells // cell_block
    n_gb = genes // gene_block
    off = data.b_offsets
    b_li, b_val = data.b_li, data.b_val
    float(jnp.sum(b_val[0]))    # force plane materialization

    def slice_blk(arr, bi, blk=cell_block):
        return jax.lax.dynamic_slice_in_dim(arr, bi * blk, blk, 0)

    def tiles_of(li, lv):
        for gb in range(n_gb):
            yield gb, _bell_tile(li[:, off[gb]:off[gb + 1]],
                                 lv[:, off[gb]:off[gb + 1]], gene_block)

    @jax.jit
    def tiles_only(b_val, b_li):
        def blk(acc, bi):
            li, lv = slice_blk(b_li, bi), slice_blk(b_val, bi)
            for _, tile in tiles_of(li, lv):
                acc = acc + tile[0, 0] + tile[-1, -1]
            return acc, None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    @jax.jit
    def tiles_dot(b_val, b_li, W):
        def blk(acc, bi):
            li, lv = slice_blk(b_li, bi), slice_blk(b_val, bi)
            B = jnp.zeros((cell_block, k), jnp.float32)
            for gb, tile in tiles_of(li, lv):
                Wb = W[gb * gene_block:(gb + 1) * gene_block]
                B = B + jnp.dot(tile, Wb, precision=MM_PRECISION)
            return acc + B[0, 0] + B[-1, -1], None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    @jax.jit
    def h_update(b_val, b_li, W, H):
        a_w = jnp.dot(W.T, W, precision=MM_PRECISION) + 1e-15 * jnp.eye(k)

        def blk(acc, bi):
            li, lv = slice_blk(b_li, bi), slice_blk(b_val, bi)
            B = jnp.zeros((cell_block, k), jnp.float32)
            for gb, tile in tiles_of(li, lv):
                Wb = W[gb * gene_block:(gb + 1) * gene_block]
                B = B + jnp.dot(tile, Wb, precision=MM_PRECISION)
            Hb = solve_nnls(a_w, B, slice_blk(H, bi), L1=0.01)
            return acc + Hb[0, 0] + Hb[-1, -1], None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    @jax.jit
    def w_accumulate(b_val, b_li, H):
        def blk(Bw, bi):
            li, lv = slice_blk(b_li, bi), slice_blk(b_val, bi)
            Hb = slice_blk(H, bi)
            parts = [jnp.dot(tile.T, Hb, precision=MM_PRECISION)
                     for _, tile in tiles_of(li, lv)]
            return Bw + jnp.concatenate(parts, axis=0), None
        Bw, _ = jax.lax.scan(blk, jnp.zeros((genes, k), jnp.float32),
                             jnp.arange(n_blocks))
        return Bw.sum()

    @jax.jit
    def w_solve(a_h, W, Bw):
        def blk(acc, bi):
            B = slice_blk(Bw, bi, gene_block)
            Y0 = slice_blk(W, bi, gene_block)
            Ws = solve_nnls(a_h, B, Y0, L1=0.01)
            return acc + Ws[0, 0] + Ws[-1, -1], None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()),
                              jnp.arange(genes // gene_block))
        return acc

    W = jax.random.uniform(jax.random.PRNGKey(0), (genes, k), jnp.float32)
    H = jax.random.uniform(jax.random.PRNGKey(1), (cells, k), jnp.float32)
    a_h = jnp.dot(H.T, H) + 1e-15 * jnp.eye(k)
    Bw = jax.random.uniform(jax.random.PRNGKey(2), (genes, k), jnp.float32)

    def timed(f, *args, n=2):
        float(f(*args))              # compile + warm
        t0 = time.perf_counter()
        for _ in range(n):
            float(f(*args))          # scalar fetch = sync
        return round((time.perf_counter() - t0) / n, 3)

    res = {"gene_block": gene_block,
           "total_w": int(off[-1])}
    res["tiles_only_s"] = timed(tiles_only, b_val, b_li)
    res["tiles_dot_s"] = timed(tiles_dot, b_val, b_li, W)
    res["h_update_s"] = timed(h_update, b_val, b_li, W, H)
    res["w_accumulate_s"] = timed(w_accumulate, b_val, b_li, H)
    res["w_solve_s"] = timed(w_solve, a_h, W, Bw)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
