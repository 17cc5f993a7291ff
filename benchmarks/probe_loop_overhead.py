"""Isolate where the large-scale ELL fit's wall-clock goes:
in-program iteration cost vs per-device-call overhead (tunneled relay).

Compiles ONE fused loop (maxit=5 — a longer single call can exceed the
relay's per-execution deadline) and times 1x5 / 5x1 iteration calls.
The slope vs call count is the per-call overhead; the remainder is the
true per-iteration device cost. Sync is by fetching a scalar output —
on the tunneled platform block_until_ready alone does not wait.

Run: python benchmarks/probe_loop_overhead.py [--cells 524288]
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
    ap.add_argument("--nnz", type=int, default=824)
    ap.add_argument("--k", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from benchmarks.largescale import build_sharded_ell_synth
    from singlet_tpu.parallel.sharded_ell import build_sharded_ell_fit_loop

    data = build_sharded_ell_synth(args.genes, args.cells, args.nnz)
    float(jnp.sum(data.b_val[0]))   # force materialization
    loop = build_sharded_ell_fit_loop(data, 20, maxit=5, masked=False)

    k = args.k
    W0 = jax.random.uniform(jax.random.PRNGKey(0), (args.genes, k))
    H0 = jnp.zeros((args.cells, k), jnp.float32)

    def run(n_steps):
        out = loop(data.b_li, data.b_val, data.nonempty, data.gene_nonempty,
                   W0, H0, 0.01, 0.01, 0.0, 0.0, jnp.float32(0.0),
                   jnp.int32(n_steps), jnp.float32(1.0), jnp.bool_(False))
        return int(out[3])   # scalar fetch = real sync through the relay

    t0 = time.perf_counter()
    it = run(5)  # compile + warm
    res = {"warm_s": round(time.perf_counter() - t0, 2), "it": it}

    for calls, steps in [(1, 5), (5, 1), (1, 5)]:
        t0 = time.perf_counter()
        for _ in range(calls):
            run(steps)
        secs = time.perf_counter() - t0
        key = f"{calls}x{steps}"
        res[key] = round(secs, 2) if key not in res \
            else (res[key], round(secs, 2))

    one_call_5 = res["1x5"] if not isinstance(res["1x5"], tuple) \
        else min(res["1x5"])
    per_call = (res["5x1"] - one_call_5) / 4.0
    per_iter = (one_call_5 - per_call) / 5.0
    res["per_call_overhead_s"] = round(per_call, 2)
    res["per_iter_device_s"] = round(per_iter, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
