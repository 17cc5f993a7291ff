"""Golden tests for the batched coordinate-descent NNLS solver.

Oracle 1: a straightforward per-column numpy implementation of the reference
CD semantics (reference:src/singlet.cpp:229-276), written independently in
float64 — validates exact algorithmic parity (warm starts, clamp/tolerance
rules, L1-matrix mode).
Oracle 2: scipy.optimize.nnls — validates that the cold-start solution is a
true NNLS optimum.
"""

import numpy as np
import jax.numpy as jnp
import scipy.optimize

from singlet_tpu.ops.nnls import nnls_batch


def nnls_cd_numpy(a, b, x, L1=0.0, L2=0.0, L1_vec=None):
    """Reference-semantics CD on one column (float64)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64).copy()
    x = np.asarray(x, np.float64).copy()
    k = b.size
    tol = 1.0
    it = 0
    while it < 100 and tol / k > 1e-8:
        tol = 0.0
        for i in range(k):
            diff = b[i] / a[i, i]
            if L1_vec is not None:
                diff -= L1_vec[i]
            if L1 != 0:
                diff -= L1
            if L2 != 0:
                diff += L2 * x[i]
            if -diff > x[i]:
                if x[i] != 0:
                    b -= a[:, i] * -x[i]
                    tol = 1.0
                    x[i] = 0.0
            elif diff != 0:
                x[i] += diff
                b -= a[:, i] * diff
                tol += abs(diff / (x[i] + 1e-15))
        it += 1
    return x


def _random_problem(rng, n, k, m=64):
    F = rng.random((m, k)).astype(np.float32)
    a = F.T @ F + 1e-15 * np.eye(k, dtype=np.float32)
    G = rng.random((m, n)).astype(np.float32)
    B = (F.T @ G).T  # (n, k)
    return F, a, G, B


def test_cold_start_matches_scipy(rng):
    F, a, G, B = _random_problem(rng, n=8, k=12)
    X = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B),
                              jnp.zeros_like(jnp.asarray(B))))
    for c in range(8):
        x_ref, _ = scipy.optimize.nnls(F.astype(np.float64), G[:, c].astype(np.float64))
        np.testing.assert_allclose(X[c], x_ref, rtol=2e-3, atol=2e-4)


def test_matches_reference_cd_semantics_cold(rng):
    _, a, _, B = _random_problem(rng, n=16, k=10)
    X = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B),
                              jnp.zeros((16, 10), jnp.float32)))
    for c in range(16):
        x_ref = nnls_cd_numpy(a, B[c], np.zeros(10))
        np.testing.assert_allclose(X[c], x_ref, rtol=2e-4, atol=2e-5)


def test_matches_reference_cd_semantics_warm(rng):
    """Warm starts reproduce the reference's damped-update behavior exactly."""
    _, a, _, B = _random_problem(rng, n=16, k=10)
    X0 = rng.random((16, 10)).astype(np.float32)
    X = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B), jnp.asarray(X0)))
    for c in range(16):
        x_ref = nnls_cd_numpy(a, B[c], X0[c])
        np.testing.assert_allclose(X[c], x_ref, rtol=5e-4, atol=5e-4)


def test_l1_l2_penalties(rng):
    _, a, _, B = _random_problem(rng, n=12, k=8)
    X = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B),
                              jnp.zeros((12, 8), jnp.float32), L1=0.05, L2=0.01))
    for c in range(12):
        x_ref = nnls_cd_numpy(a, B[c], np.zeros(8), L1=0.05, L2=0.01)
        np.testing.assert_allclose(X[c], x_ref, rtol=1e-3, atol=1e-4)
    # L1 increases sparsity
    X_plain = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B),
                                    jnp.zeros((12, 8), jnp.float32)))
    assert (X == 0).sum() >= (X_plain == 0).sum()


def test_l1_matrix_mode(rng):
    """Per-(column, factor) penalties, the batch-aware L1-matrix variant."""
    _, a, _, B = _random_problem(rng, n=6, k=8)
    L1m = (rng.random((6, 8)) * 0.1).astype(np.float32)
    X = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B),
                              jnp.zeros((6, 8), jnp.float32), L1=jnp.asarray(L1m)))
    for c in range(6):
        x_ref = nnls_cd_numpy(a, B[c], np.zeros(8), L1_vec=L1m[c])
        np.testing.assert_allclose(X[c], x_ref, rtol=1e-3, atol=1e-4)


def test_batched_gram(rng):
    """Per-column Gram batch — the masked-CV path."""
    k, n = 7, 9
    a_batch = np.zeros((n, k, k), np.float32)
    B = np.zeros((n, k), np.float32)
    for c in range(n):
        F = rng.random((32, k)).astype(np.float32)
        a_batch[c] = F.T @ F + 1e-15 * np.eye(k)
        B[c] = F.T @ rng.random(32).astype(np.float32)
    X = np.asarray(nnls_batch(jnp.asarray(a_batch), jnp.asarray(B),
                              jnp.zeros((n, k), jnp.float32)))
    for c in range(n):
        x_ref = nnls_cd_numpy(a_batch[c], B[c], np.zeros(k))
        np.testing.assert_allclose(X[c], x_ref, rtol=2e-3, atol=2e-4)


def test_update_mask_freezes_rows(rng):
    _, a, _, B = _random_problem(rng, n=10, k=6)
    X0 = rng.random((10, 6)).astype(np.float32)
    mask = np.array([True] * 5 + [False] * 5)
    X = np.asarray(nnls_batch(jnp.asarray(a), jnp.asarray(B), jnp.asarray(X0),
                              update_mask=jnp.asarray(mask)))
    np.testing.assert_array_equal(X[5:], X0[5:])
    assert not np.allclose(X[:5], X0[:5])


def test_nnls_sweep_instrumentation(rng):
    """return_sweeps reports per-column CD sweep counts without changing
    the solution (honest FLOP accounting for bench.py)."""
    from singlet_tpu.ops.nnls import nnls_batch

    k, n = 6, 32
    a = np.eye(k) + 0.1 * rng.random((k, k))
    a = (a + a.T) / 2 + k * np.eye(k)
    B = rng.random((n, k)).astype(np.float32)
    X0 = np.zeros((n, k), np.float32)
    X_plain = nnls_batch(jnp.asarray(a, jnp.float32), jnp.asarray(B),
                         jnp.asarray(X0))
    X, sweeps = nnls_batch(jnp.asarray(a, jnp.float32), jnp.asarray(B),
                           jnp.asarray(X0), return_sweeps=True)
    np.testing.assert_array_equal(np.asarray(X), np.asarray(X_plain))
    sweeps = np.asarray(sweeps)
    assert sweeps.shape == (n,)
    assert (sweeps >= 1).all() and (sweeps <= 100).all()
    # an empty (masked-out) column runs zero sweeps
    mask = np.ones(n, bool)
    mask[3] = False
    _, sw2 = nnls_batch(jnp.asarray(a, jnp.float32), jnp.asarray(B),
                        jnp.asarray(X0), update_mask=jnp.asarray(mask),
                        return_sweeps=True)
    assert np.asarray(sw2)[3] == 0
