"""Large-scale sparse NMF workload: half-million cells on one chip.

The "cellxgene million-cell" success criterion (BASELINE.md) needs a
demonstrated large fit in ELL storage. Host->device bandwidth through the
tunneled TPU is ~3-6 MB/s, so the operand cannot be shipped: it is generated
ON DEVICE in closed form — a regular sparse pattern whose transpose is also
elementwise-computable, with hash-derived values so A[g, c] agrees between
the A-planes and the At-planes (asserted by a CPU test on small shapes).

Pattern: cell c's j-th nonzero sits at gene (c + j*step) mod genes with
step coprime to genes; when genes divides cells, gene g's nonzeros are
exactly cells c = ((g - j*step) mod genes) + m*genes for j in [0, p),
m in [0, cells/genes) — a perfect (p, p*cells/genes)-regular bipartite
graph. Values are a (cell, gene) hash in [0.1, 1.1).

This measures the real production path — ShardedEllData + the fused
sharded fit loop (parallel/sharded_ell.py) — not a synthetic kernel.

Run: `python benchmarks/largescale.py [--cells 524288 --genes 16384
      --nnz 824 --k 100 --masked]`
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hash_val(c, g):
    """Deterministic value in [0.1, 1.1) from (cell, gene) — jnp/np agnostic."""
    h = (c.astype("uint32") * np.uint32(2654435761)
         + g.astype("uint32") * np.uint32(40503) + np.uint32(0x9E37))
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(2246822519)
    return (h >> np.uint32(16)).astype("float32") / np.float32(65536.0) \
        + np.float32(0.1)


def synth_ell_planes(genes: int, cells: int, nnz_per_cell: int,
                     step: int = 9973, xp=np):
    """(a_idx, a_val) closed-form ELL A-planes: cell c's j-th nonzero sits
    at gene (c + j*step) mod genes (distinct within a cell when
    gcd(step, genes) == 1 and nnz_per_cell <= genes); values are a
    (cell, gene) hash. The engine stores no transpose (the w-update
    accumulates over cell blocks), so A-planes fully define the operand.
    """
    assert nnz_per_cell <= genes
    p = nnz_per_cell
    c = xp.arange(cells, dtype=xp.int32)[:, None]
    j = xp.arange(p, dtype=xp.int32)[None, :]
    a_idx = (c + j * step) % genes
    a_val = _hash_val(c + xp.zeros_like(a_idx), a_idx)
    return a_idx, a_val


def build_sharded_ell_synth(genes: int, cells: int, nnz_per_cell: int,
                            mesh=None, cell_block: int = 2048,
                            gene_block: int = 2048):
    """Device-generated ShardedEllData for the synthetic regular operand
    (single-shard mesh; at-plane row ids are local cell indices)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from singlet_tpu.parallel.sharded import AXIS, make_mesh
    from singlet_tpu.parallel.sharded_ell import ShardedEllData

    mesh = mesh or make_mesh(1)
    n_dev = mesh.devices.size
    assert n_dev == 1, "synthetic generator builds one shard (one chip)"

    gen = jax.jit(lambda: synth_ell_planes(genes, cells, nnz_per_cell,
                                           xp=jnp))
    a_idx, a_val = gen()
    sh = lambda spec: NamedSharding(mesh, spec)
    data = ShardedEllData(
        a_idx=jax.device_put(a_idx, sh(P(AXIS, None))),
        a_val=jax.device_put(a_val, sh(P(AXIS, None))),
        nonempty=jax.device_put(jnp.ones((cells,), bool), sh(P(AXIS))),
        gene_nonempty=jax.device_put(jnp.ones((genes,), bool), sh(P())),
        mesh=mesh, genes_true=genes, cells_true=cells,
        genes_pad=genes, cells_pad=cells,
        cell_block=cell_block, gene_block=gene_block,
    )
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=524288)
    ap.add_argument("--genes", type=int, default=16384)
    ap.add_argument("--nnz", type=int, default=824)   # ~5% density
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--maxit", type=int, default=10)
    ap.add_argument("--masked", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    t0 = time.perf_counter()
    data = build_sharded_ell_synth(args.genes, args.cells, args.nnz)
    jax.block_until_ready(data.a_val)
    gen_s = time.perf_counter() - t0

    eng = ShardedEllEngine(None, data=data)
    plane_bytes = data.a_idx.nbytes + data.a_val.nbytes

    # fused loop in chunks of 5 iterations per device call: amortizes the
    # tunneled relay's per-call argument overhead (~7 s on 3.4 GB planes)
    # while staying under its single-execution deadline
    chunk = 5
    eng.fit(args.k, tol=0.0, maxit=chunk, masked=args.masked,
            inv_density=20, chunk_iters=chunk)      # compile + warm
    t0 = time.perf_counter()
    out = eng.fit(args.k, tol=0.0, maxit=args.maxit, masked=args.masked,
                  inv_density=20, chunk_iters=chunk)
    secs = time.perf_counter() - t0
    ips = args.maxit / secs

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        mem = {"hbm_bytes_in_use": int(stats.get("bytes_in_use", 0)),
               "hbm_peak_bytes": int(stats.get("peak_bytes_in_use", 0))}
    except Exception:
        pass

    print(json.dumps({
        "metric": "largescale_ell_fit",
        "cells": args.cells, "genes": args.genes, "k": args.k,
        "nnz_per_cell": args.nnz,
        "density": round(args.nnz / args.genes, 4),
        "masked": bool(args.masked),
        "plane_gib": round(plane_bytes / 2**30, 2),
        "gen_seconds": round(gen_s, 1),
        "iters_per_s": round(ips, 3),
        "cells_per_s": round(ips * args.cells, 1),
        "final_tol": float(out["tol_trace"][-1]),
        "device": str(jax.devices()[0]),
        **mem,
    }))


if __name__ == "__main__":
    main()
