"""End-to-end parity of the ALS engine against the float64 oracle."""

import numpy as np
import jax.numpy as jnp

import reference_impl as ref
from singlet_tpu.ops.rngmask import seed_pair
from singlet_tpu.solvers.als import (
    als_step_masked,
    make_dense_providers,
    mse_test,
    nmf_fit,
)


def _synthetic(rng, genes=40, cells=30, k=4, sparsity=0.6):
    W = rng.random((genes, k)).astype(np.float32)
    H = rng.random((k, cells)).astype(np.float32)
    A = (W @ H).astype(np.float32)
    A[rng.random(A.shape) < sparsity] = 0.0
    return A


def test_nmf_fit_matches_oracle_trajectory(rng):
    A = _synthetic(rng)
    k = 5
    w_init = rng.random((A.shape[0], k)).astype(np.float32)

    res = nmf_fit(A, k, w_init=jnp.asarray(w_init), tol=0.0, maxit=4,
                  L1=0.01, L2=0.0)
    out = ref.nmf(A.astype(np.float64), w_init.T.copy(), tol=0.0, maxit=4,
                  L1_w=0.01, L1_h=0.01)

    np.testing.assert_allclose(res.w, out["w"].T, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(res.h, out["h"], rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(res.d, out["d"], rtol=5e-3)
    np.testing.assert_allclose(res.tol_trace, out["traces"], rtol=5e-3,
                               atol=1e-5)


def test_nmf_fit_recovers_low_rank(rng):
    genes, cells, k = 60, 50, 4
    W = rng.random((genes, k)).astype(np.float32)
    H = rng.random((k, cells)).astype(np.float32)
    A = W @ H
    res = nmf_fit(A, k, tol=1e-6, maxit=200, L1=0.0, L2=0.0, seed=3)
    recon = (res.w * res.d[None, :]) @ res.h
    rel = np.linalg.norm(recon - A) / np.linalg.norm(A)
    assert rel < 0.05, rel


def test_empty_columns_are_skipped(rng):
    A = _synthetic(rng)
    A[:, 7] = 0.0
    res = nmf_fit(A, 3, tol=0.0, maxit=3, seed=1)
    # empty column keeps its (zero-init) h values
    np.testing.assert_array_equal(res.h[:, 7], 0.0)


def test_masked_step_matches_oracle(rng):
    A = _synthetic(rng, genes=24, cells=18)
    k, seed, inv_density = 3, 909, 5
    w_init = rng.random((A.shape[0], k)).astype(np.float32)

    Ap, Atp = make_dense_providers(A)
    genes_pad, cells_pad = Ap.data.shape
    W = jnp.zeros((genes_pad, k), jnp.float32).at[: A.shape[0]].set(w_init)
    H = jnp.zeros((cells_pad, k), jnp.float32)
    sp = seed_pair(seed)

    # two masked ALS iterations on device
    for _ in range(2):
        W, H, d, tol = als_step_masked(
            Ap, Atp, W, H, sp, 0.01, 0.0, inv_density,
            cells_pad, genes_pad)

    # oracle
    w = w_init.T.astype(np.float64).copy()
    h = np.zeros((k, A.shape[1]))
    for _ in range(2):
        w_it = w.copy()
        h = ref.predict_mask(A.astype(np.float64), seed, inv_density, w, h,
                             0.01, 0.0, mask_t=False)
        h, dd = ref.scale(h)
        w = ref.predict_mask(A.T.astype(np.float64), seed, inv_density, h, w,
                             0.01, 0.0, mask_t=True)
        w, dd = ref.scale(w)
        tol_ref = ref.cor_distance(w, w_it)

    np.testing.assert_allclose(np.asarray(W[: A.shape[0]]), w.T,
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(H[: A.shape[1]]).T, h,
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(float(tol), tol_ref, rtol=5e-3, atol=1e-5)

    # test-set MSE parity
    got = float(mse_test(Ap, W, jnp.asarray(dd, jnp.float32), H, sp,
                         inv_density, cells_pad))
    want = ref.mse_test(A.astype(np.float64), w, dd, h, seed, inv_density)
    np.testing.assert_allclose(got, want, rtol=5e-3)


def test_mask_excludes_padding(rng):
    """Padded rows/cols must never count as masked test entries."""
    A = _synthetic(rng, genes=24, cells=18)
    Ap, _ = make_dense_providers(A)
    m = Ap.mask_tile(seed_pair(3), 0, Ap.data.shape[1], 4)
    m = np.asarray(m)
    assert not m[A.shape[1]:, :].any()
    assert not m[:, A.shape[0]:].any()
    assert m[: A.shape[1], : A.shape[0]].any()
