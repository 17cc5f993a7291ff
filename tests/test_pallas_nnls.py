"""Pallas NNLS kernels validated (interpret mode on CPU) against the XLA
reference path. Both implement identical per-coordinate arithmetic; the only
permitted divergence is converged-tail wiggle: the sweep-end tolerance is a
reduction whose summation order differs between backends, so a borderline
column may run one extra/fewer converged-tail sweep (moves of ~CD_TOL
relative size)."""

import numpy as np
import jax.numpy as jnp

from singlet_tpu.ops.nnls import nnls_batch
from singlet_tpu.ops.pallas_nnls import (
    nnls_batch_pallas,
    nnls_batch_pallas_batched_a,
)


def _problem(rng, n, k):
    F = rng.random((64, k)).astype(np.float32)
    a = (F.T @ F + 1e-15 * np.eye(k)).astype(np.float32)
    B = (rng.random((n, 64)) @ F).astype(np.float32)
    X0 = (rng.random((n, k)) * (rng.random((n, k)) < 0.5)).astype(np.float32)
    mask = rng.random(n) < 0.9
    return a, B, X0, mask


def test_shared_gram_kernel_matches_xla(rng):
    a, B, X0, mask = _problem(rng, 256, 9)
    Xp = np.asarray(nnls_batch_pallas(
        jnp.asarray(a), jnp.asarray(B), jnp.asarray(X0), L1=0.01, L2=0.001,
        update_mask=jnp.asarray(mask), block=128, interpret=True))
    Xx = np.asarray(nnls_batch(
        jnp.asarray(a), jnp.asarray(B), jnp.asarray(X0), L1=0.01, L2=0.001,
        update_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(Xp, Xx, rtol=5e-3, atol=1e-6)
    np.testing.assert_array_equal(Xp[~mask], X0[~mask])


def test_batched_gram_kernel_matches_xla(rng):
    n, k = 256, 7
    a = np.zeros((n, k, k), np.float32)
    B = np.zeros((n, k), np.float32)
    for c in range(n):
        F = rng.random((32, k)).astype(np.float32)
        a[c] = F.T @ F + 1e-15 * np.eye(k)
        B[c] = F.T @ rng.random(32).astype(np.float32)
    X0 = np.zeros((n, k), np.float32)
    Xp = np.asarray(nnls_batch_pallas_batched_a(
        jnp.asarray(a), jnp.asarray(B), jnp.asarray(X0), L1=0.01,
        block=128, interpret=True))
    Xx = np.asarray(nnls_batch(
        jnp.asarray(a), jnp.asarray(B), jnp.asarray(X0), L1=0.01))
    np.testing.assert_allclose(Xp, Xx, rtol=5e-3, atol=1e-6)
