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


def test_solve_nnls_packed_matches_explicit_batched_gram(rng):
    """solve_nnls_packed (packed Gram corrections, tile-layout emission on
    TPU) must equal the explicit a_full[None] - unpack_sym formulation."""
    from singlet_tpu.ops.linalg import packed_outer_products, triu_pairs, \
        unpack_sym
    from singlet_tpu.ops.nnls import solve_nnls_packed

    n, k, genes = 24, 5, 40
    F, a_full, _, B = _random_problem(rng, n, k, m=genes)
    iu = triu_pairs(k)
    Pw = packed_outer_products(jnp.asarray(F), iu)          # (genes, npairs)
    m = (rng.random((n, genes)) < 0.3).astype(np.float32)
    packed = jnp.asarray(m) @ Pw                            # (n, npairs)

    X0 = jnp.zeros((n, k), jnp.float32)
    got = solve_nnls_packed(jnp.asarray(a_full), packed, iu,
                            jnp.asarray(B), X0, L1=0.01)
    a_batch = jnp.asarray(a_full)[None] - unpack_sym(packed, k, iu)
    want = nnls_batch(a_batch, jnp.asarray(B), X0, L1=0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_unpack_sym_t_is_transposed_unpack_sym(rng):
    """unpack_sym_t emits at[i, j, c] = (a_full - unpack(packed_c))[j, i]."""
    from singlet_tpu.ops.linalg import triu_pairs, unpack_sym, unpack_sym_t

    n, k = 7, 4
    iu = triu_pairs(k)
    npairs = k * (k + 1) // 2
    packed = jnp.asarray(rng.random((n, npairs)).astype(np.float32))
    a_full = jnp.asarray(rng.random((k, k)).astype(np.float32))
    a_full = a_full + a_full.T

    at = unpack_sym_t(packed, k, iu, a_full)
    want = jnp.transpose(a_full[None] - unpack_sym(packed, k, iu), (2, 1, 0))
    np.testing.assert_array_equal(np.asarray(at), np.asarray(want))


def test_mask_dot_matches_plain_dot(rng):
    """mask_dot == x @ y / x.T @ y on CPU (exact f32 at every precision)."""
    from singlet_tpu.ops.linalg import mask_dot

    x = jnp.asarray(rng.random((12, 20)).astype(np.float32))
    y = jnp.asarray(rng.random((20, 9)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(mask_dot(x, y)),
                               np.asarray(x @ y), rtol=1e-6)
    y2 = jnp.asarray(rng.random((12, 9)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(mask_dot(x, y2, transpose_x=True)),
                               np.asarray(x.T @ y2), rtol=1e-6)
