"""Decompose the large-scale ELL iteration cost: densify vs matmul vs NNLS.

Times each stage of the sharded ELL plain step separately on the real
operand shapes to find the bottleneck. Run: python benchmarks/profile_largescale.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, n=3):
    out = f(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from benchmarks.largescale import synth_ell_planes
    from singlet_tpu.ops.linalg import MM_PRECISION
    from singlet_tpu.ops.nnls import solve_nnls

    genes, cells, p, k = 16384, 524288, 824, 100
    cell_block = 2048
    n_blocks = cells // cell_block
    gen = jax.jit(lambda: synth_ell_planes(genes, cells, p, xp=jnp))
    a_idx, a_val = gen()
    jax.block_until_ready(a_val)
    W = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(0), (genes, k)))
    H = jnp.zeros((cells, k), jnp.float32)

    def densify_all(a_idx, a_val):
        def blk(acc, bi):
            idx = jax.lax.dynamic_slice_in_dim(a_idx, bi * cell_block,
                                               cell_block, 0)
            val = jax.lax.dynamic_slice_in_dim(a_val, bi * cell_block,
                                               cell_block, 0)
            tile = jnp.zeros((cell_block, genes), val.dtype)
            rows = jnp.arange(cell_block)[:, None]
            tile = tile.at[rows, idx].add(val)
            return acc + tile.sum(), None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    def densify_matmul(a_idx, a_val, W):
        def blk(acc, bi):
            idx = jax.lax.dynamic_slice_in_dim(a_idx, bi * cell_block,
                                               cell_block, 0)
            val = jax.lax.dynamic_slice_in_dim(a_val, bi * cell_block,
                                               cell_block, 0)
            tile = jnp.zeros((cell_block, genes), val.dtype)
            rows = jnp.arange(cell_block)[:, None]
            tile = tile.at[rows, idx].add(val)
            B = jnp.dot(tile, W, precision=MM_PRECISION)
            return acc + B.sum(), None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    def gather_B(a_idx, a_val, W):
        def blk(acc, bi):
            idx = jax.lax.dynamic_slice_in_dim(a_idx, bi * cell_block,
                                               cell_block, 0)
            val = jax.lax.dynamic_slice_in_dim(a_val, bi * cell_block,
                                               cell_block, 0)
            g = jnp.take(W, idx, axis=0)               # (blk, p, k)
            B = jnp.einsum("cp,cpk->ck", val, g, precision=MM_PRECISION)
            return acc + B.sum(), None
        acc, _ = jax.lax.scan(blk, jnp.zeros(()), jnp.arange(n_blocks))
        return acc

    def nnls_all(a, B, H):
        def blk(_, bi):
            Bb = jax.lax.dynamic_slice_in_dim(B, bi * cell_block,
                                              cell_block, 0)
            Hb = jax.lax.dynamic_slice_in_dim(H, bi * cell_block,
                                              cell_block, 0)
            return None, solve_nnls(a, Bb, Hb, L1=0.01)
        _, Hs = jax.lax.scan(blk, None, jnp.arange(n_blocks))
        return Hs

    a = jnp.eye(k) + 0.01
    B = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(1), (cells, k)) * 2.0)

    jd = jax.jit(densify_all)
    jm = jax.jit(densify_matmul)
    jg = jax.jit(gather_B)
    jn = jax.jit(nnls_all)
    out = {
        "densify_only_s": round(timeit(jd, a_idx, a_val), 3),
        "densify_matmul_s": round(timeit(jm, a_idx, a_val, W), 3),
        "gather_B_s": round(timeit(jg, a_idx, a_val, W), 3),
        "nnls_cold_start_s": round(timeit(jn, a, B, H), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
