"""Measure the masked-Gram matmul (m @ Pw, the masked-path bottleneck:
~1.7 s per pass at f32 HIGHEST) under precision relaxations, on the real
operand shapes (2048x16384 mask @ 16384x5050 packed outer products).

Run: python benchmarks/probe_mask_mm.py
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
    from singlet_tpu.ops.rngmask import mask_block, seed_pair

    cell_block, genes, npairs, n_blocks = 2048, 16384, 5050, 256
    seed = seed_pair(123)
    gene_ids = jnp.arange(genes)
    Pw = jax.random.uniform(jax.random.PRNGKey(0), (genes, npairs),
                            jnp.float32)

    def build(prec=None, bf16=False):
        @jax.jit
        def f(seed, Pw):
            P2 = Pw.astype(jnp.bfloat16) if bf16 else Pw

            def blk(acc, bi):
                ids = bi * cell_block + jnp.arange(cell_block)
                m = mask_block(seed, ids, gene_ids, 20)
                mf = m.astype(jnp.bfloat16 if bf16 else jnp.float32)
                if bf16:
                    packed = jnp.dot(mf, P2,
                                     preferred_element_type=jnp.float32)
                else:
                    packed = jnp.dot(mf, P2, precision=prec)
                return acc + packed[0, 0] + packed[-1, -1], None
            acc, _ = jax.lax.scan(blk, jnp.zeros(()),
                                  jnp.arange(n_blocks))
            return acc
        return f

    def timed(f, n=2):
        float(f(seed, Pw))
        t0 = time.perf_counter()
        for _ in range(n):
            float(f(seed, Pw))
        return round((time.perf_counter() - t0) / n, 3)

    res = {}
    for name, kw in [("highest", dict(prec=jax.lax.Precision.HIGHEST)),
                     ("high", dict(prec=jax.lax.Precision.HIGH)),
                     ("default", dict(prec=jax.lax.Precision.DEFAULT)),
                     ("bf16", dict(bf16=True))]:
        res[name + "_pass_s"] = timed(build(**kw))
        print(name, res[name + "_pass_s"], flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
