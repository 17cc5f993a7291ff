"""Decompose the large-scale ELL iteration cost: h-update vs w-accumulate
vs w-solve, on the real operand shapes (524k cells x 16k genes, k=100).

Times each phase of the sharded ELL plain step as its own jitted program
with chained inputs (the relay dedupes identical repeated requests).
Run: python benchmarks/profile_largescale.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from benchmarks.largescale import build_sharded_ell_synth
    from singlet_tpu.ops.linalg import MM_PRECISION
    from singlet_tpu.ops.nnls import solve_nnls
    from singlet_tpu.parallel.sharded_ell import _densify

    genes, cells, p, k = 16384, 524288, 824, 100
    cell_block, gene_block = 2048, 2048
    n_blocks = cells // cell_block
    data = build_sharded_ell_synth(genes, cells, p)
    a_idx, a_val = data.a_idx, data.a_val

    @jax.jit
    def h_update(a_val, a_idx, W, H):
        a_w = jnp.dot(W.T, W, precision=MM_PRECISION) + 1e-15 * jnp.eye(k)

        def blk(_, bi):
            idx = jax.lax.dynamic_slice_in_dim(a_idx, bi * cell_block,
                                               cell_block, 0)
            val = jax.lax.dynamic_slice_in_dim(a_val, bi * cell_block,
                                               cell_block, 0)
            tile = _densify(idx, val, genes)
            B = jnp.dot(tile, W, precision=MM_PRECISION)
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            return None, solve_nnls(a_w, B, Hb, L1=0.01)

        _, Hs = jax.lax.scan(blk, None, jnp.arange(n_blocks))
        return Hs.reshape(cells, k)

    @jax.jit
    def h_update_no_nnls(a_val, a_idx, W):
        def blk(acc, bi):
            idx = jax.lax.dynamic_slice_in_dim(a_idx, bi * cell_block,
                                               cell_block, 0)
            val = jax.lax.dynamic_slice_in_dim(a_val, bi * cell_block,
                                               cell_block, 0)
            tile = _densify(idx, val, genes)
            B = jnp.dot(tile, W, precision=MM_PRECISION)
            return acc + B.sum(), None

        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    @jax.jit
    def w_accumulate(a_val, a_idx, H):
        def blk(Bw, bi):
            idx = jax.lax.dynamic_slice_in_dim(a_idx, bi * cell_block,
                                               cell_block, 0)
            val = jax.lax.dynamic_slice_in_dim(a_val, bi * cell_block,
                                               cell_block, 0)
            tile = _densify(idx, val, genes)
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            return Bw + jnp.dot(tile.T, Hb, precision=MM_PRECISION), None

        Bw, _ = jax.lax.scan(blk, jnp.zeros((genes, k), jnp.float32),
                             jnp.arange(n_blocks))
        return Bw

    @jax.jit
    def w_solve(Bw, a_h, W):
        def blk(_, bi):
            B = jax.lax.dynamic_slice_in_dim(Bw, bi * gene_block,
                                             gene_block, 0)
            Y0 = jax.lax.dynamic_slice_in_dim(W, bi * gene_block,
                                              gene_block, 0)
            return None, solve_nnls(a_h, B, Y0, L1=0.01)

        _, Ws = jax.lax.scan(blk, None, jnp.arange(genes // gene_block))
        return Ws.reshape(genes, k)

    W = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(0), (genes, k)))
    H0 = jnp.zeros((cells, k), jnp.float32)

    def chained(f, seed, *args, n=3):
        out = jax.block_until_ready(f(seed, *args))
        t0 = time.perf_counter()
        for i in range(n):
            out = f(seed, *args)
            seed = seed + (jnp.ravel(out)[0] * 1e-30
                           + (i + 1) * 1e-7).astype(seed.dtype)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    res = {}
    res["h_update_s"] = round(chained(h_update, a_val, a_idx, W, H0), 3)
    res["h_update_no_nnls_s"] = round(
        chained(h_update_no_nnls, a_val, a_idx, W), 3)
    H = jax.block_until_ready(h_update(a_val, a_idx, W, H0))
    res["w_accumulate_s"] = round(chained(w_accumulate, a_val, a_idx, H), 3)
    Bw = jax.block_until_ready(w_accumulate(a_val, a_idx, H))
    a_h = jnp.dot(H.T, H, precision=MM_PRECISION) + 1e-15 * jnp.eye(k)
    res["w_solve_s"] = round(chained(w_solve, Bw, a_h, W), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
