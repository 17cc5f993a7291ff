"""Real-TPU Pallas NNLS validation: fused kernels vs the op-by-op XLA path.

The Pallas CD-NNLS kernels (ops/pallas_nnls.py) are exercised in interpret
mode by the CPU test suite; this script is the on-device twin — it runs both
backends on the same problems ON THE TPU and reports the max divergence.
Run: `python benchmarks/pallas_check.py` (exits non-zero on mismatch).
"""

import json
import sys

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/singlet_tpu_jax_cache")
    if jax.default_backend() != "tpu":
        print(json.dumps({"metric": "pallas_vs_xla_nnls", "skipped":
                          f"backend={jax.default_backend()}"}))
        return 0

    from singlet_tpu.ops.nnls import nnls_batch, solve_nnls

    rng = np.random.default_rng(7)
    worst = {}
    for k, n in ((10, 1024), (50, 2048), (100, 1024)):
        X = rng.random((k, 256)).astype(np.float32)
        a = (X @ X.T + 1e-15 * np.eye(k)).astype(np.float32)
        B = rng.normal(0.5, 1.0, (n, k)).astype(np.float32)
        X0 = np.abs(rng.normal(0, 0.2, (n, k))).astype(np.float32)
        mask = rng.random(n) > 0.05

        ref = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B),
                                    jnp.asarray(X0), L1=0.01,
                                    update_mask=jnp.asarray(mask)))
        # solve_nnls dispatches to the Pallas kernels on TPU with its own
        # VMEM-safe block sizing (the thing actually shipped)
        got = np.asarray(solve_nnls(
            jnp.asarray(a), jnp.asarray(B), jnp.asarray(X0), L1=0.01,
            update_mask=jnp.asarray(mask)))
        denom = np.maximum(np.abs(ref), 1e-3)
        worst[f"shared_k{k}"] = float(np.max(np.abs(got - ref) / denom))

        # batched per-column Grams (the masked-CV path)
        ab = np.repeat(a[None], n, axis=0).copy()
        ab[:, np.arange(k), np.arange(k)] *= rng.uniform(
            1.0, 1.5, (n, k)).astype(np.float32)
        refb = np.asarray(nnls_batch(jnp.asarray(ab), jnp.asarray(B),
                                     jnp.asarray(X0), L1=0.01,
                                     update_mask=jnp.asarray(mask)))
        gotb = np.asarray(solve_nnls(
            jnp.asarray(ab), jnp.asarray(B), jnp.asarray(X0), L1=0.01,
            update_mask=jnp.asarray(mask)))
        worst[f"batched_k{k}"] = float(np.max(np.abs(gotb - refb)
                                              / np.maximum(np.abs(refb),
                                                           1e-3)))

    tol = 2e-3   # CD fixed points agree; bf16-pass matmul ordering differs
    ok = all(v < tol for v in worst.values())
    print(json.dumps({"metric": "pallas_vs_xla_nnls", "device":
                      str(jax.devices()[0]), "max_rel_divergence": worst,
                      "tol": tol, "ok": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
