"""Worker for the 2-process jax.distributed test (test_distributed.py).

Run as: python tests/_dist_worker.py <port> <process_id> <out_dir>

Each process owns 4 virtual CPU devices (8 global), joins the coordination
service for real, ingests ONLY its own cell-column slice via
``shard_ell_from_local``, and runs a 2-iteration sharded fit. Process 0
saves the model for comparison against the single-process twin.
"""

import os
import sys


def main():
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import scipy.sparse as sp

    from singlet_tpu.parallel import multihost
    from singlet_tpu.parallel.sharded_ell import (ShardedEllEngine,
                                                  ell_geometry,
                                                  shard_ell_from_local)

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = multihost.global_mesh()

    # both processes construct the same deterministic matrix, then each
    # passes ONLY its owned slice to the ingest (the full matrix exists here
    # only to make the test self-contained)
    genes, cells, k = 48, 96, 3
    A = sp.random(genes, cells, density=0.2, random_state=11,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1

    genes_pad, cells_pad, cb, gb = ell_geometry(genes, cells, mesh)
    cells_local = cells_pad // 8
    start = pid * 4 * cells_local
    stop = min((pid + 1) * 4 * cells_local, cells)
    local = A[:, start:stop].tocsc()

    data = shard_ell_from_local(local, cells, mesh)
    eng = ShardedEllEngine(None, data=data)
    rng = np.random.default_rng(5)
    w0 = rng.random((genes, k)).astype(np.float32)
    out = eng.fit(k, tol=0.0, maxit=2, w_init=w0)

    # staged-chunk ingest in the same 2-process world: every process reads
    # only the shards overlapping its owned cell range (header-only shape
    # pass), and the assembled operand matches the direct local ingest
    import json

    from singlet_tpu.parallel.sharded_ell import (shard_ell_from_chunks,
                                                  shard_ell_from_staged)
    from singlet_tpu.sparse.chunked import stage_chunks

    staged = os.path.join(out_dir, "staged")
    if pid == 0:
        bounds = [0, 37, 70, cells]
        stage_chunks(staged, [A[:, lo:hi].tocsc()
                              for lo, hi in zip(bounds[:-1], bounds[1:])])
        open(os.path.join(out_dir, "staged.done"), "w").write("ok")
    else:
        import time
        for _ in range(600):
            if os.path.exists(os.path.join(out_dir, "staged.done")):
                break
            time.sleep(0.1)
    # both multi-host ingest APIs: the manifest-driven staged reader and the
    # chunk-list streamer over raw .svc paths (header-only shape pass)
    data2 = shard_ell_from_staged(staged, mesh)
    with open(os.path.join(staged, "manifest.json")) as f:
        files = [os.path.join(staged, ch["file"])
                 for ch in json.load(f)["chunks"]]
    data3 = shard_ell_from_chunks(files, mesh)
    ref_shard = np.asarray(
        [s.data for s in data.b_li.addressable_shards][0])
    for d2 in (data2, data3):
        np.testing.assert_array_equal(
            np.asarray([s.data for s in d2.b_li.addressable_shards][0]),
            ref_shard)

    # rank-search drivers in the 2-process world: a small fixed-grid CV +
    # GetBestRank round on the SAME distributed engine — the reference's
    # multi-host HPC workflow (reference:R/run_nmf.R:79-107). Every process
    # runs the full driver loop (fits are collective); the traces and the
    # selected rank must match the single-process twin exactly.
    from singlet_tpu.solvers.drivers import cross_validate_nmf, get_best_rank

    df = cross_validate_nmf(eng, ranks=[2, 3, 4], n_replicates=1, tol=0.0,
                            maxit=4, trace_test_mse=2, seed=7, verbose=0)
    best = get_best_rank(df)

    # the third driver entry point: a small ard_nmf adaptive search on the
    # same distributed engine (reference:R/ard_nmf.R:31-193) — selected
    # rank + CV trace must match the single-process twin
    from singlet_tpu.solvers.drivers import ard_nmf

    ard = ard_nmf(eng, k_init=2, k_max=6, n_replicates=1, tol=0.0,
                  cv_tol=0.0, maxit=4, trace_test_mse=2, seed=7, verbose=0)

    # every process computes identical global results; process 0 persists
    if pid == 0:
        np.savez(os.path.join(out_dir, "dist_result.npz"),
                 w=out["w"], d=out["d"], h=out["h"],
                 cv_k=df["k"].to_numpy(), cv_rep=df["rep"].to_numpy(),
                 cv_err=df["test_error"].to_numpy(),
                 cv_iter=df["iter"].to_numpy(), cv_tol=df["tol"].to_numpy(),
                 best_rank=np.int64(best),
                 ard_k=np.int64(ard.k),
                 ard_cv_k=ard.cv_data["k"].to_numpy(),
                 ard_cv_err=ard.cv_data["test_error"].to_numpy(),
                 ard_d=ard.d)
    jax.distributed.shutdown()
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
