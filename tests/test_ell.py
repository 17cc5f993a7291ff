"""ELL sparse provider: storage roundtrip + solver equivalence with dense."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from singlet_tpu.ops.rngmask import seed_pair
from singlet_tpu.solvers.als import als_step_masked, mse_test, nmf_fit
from singlet_tpu.solvers.ard import ard_nmf_fit
from singlet_tpu.sparse.ell import EllMatrix


def _sparse(rng, genes=60, cells=40, density=0.15):
    A = sp.random(genes, cells, density=density, random_state=7,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    return A


def test_ell_roundtrip(rng):
    A = _sparse(rng)
    E = EllMatrix.from_csc(A)
    # densified blocks reconstruct the matrix
    tile = np.asarray(E.col_block(0, E.cols_pad))
    np.testing.assert_allclose(tile[: A.shape[0], : A.shape[1]],
                               np.asarray(A.todense()), rtol=1e-6)
    # padding region is zero
    assert tile[A.shape[0]:, :].sum() == 0
    assert tile[:, A.shape[1]:].sum() == 0


def test_ell_t_matmul_matches_dense(rng):
    A = _sparse(rng)
    E = EllMatrix.from_csc(A)
    X = jnp.asarray(rng.random((E.rows_pad, 5)).astype(np.float32))
    got = np.asarray(E.t_matmul(X))
    want = np.asarray(A.todense()).T @ np.asarray(X)[: A.shape[0]]
    np.testing.assert_allclose(got[: A.shape[1]], want, rtol=1e-5, atol=1e-6)


def test_ell_fit_matches_dense_fit(rng):
    A = _sparse(rng)
    k = 4
    w0 = rng.random((A.shape[0], k)).astype(np.float32)
    dense_res = nmf_fit(np.asarray(A.todense()), k, w_init=w0, tol=0.0,
                        maxit=4)
    Ap, Atp = EllMatrix.pair_from_csc(A)
    ell_res = nmf_fit(Ap, k, At=Atp, w_init=w0, tol=0.0, maxit=4)
    np.testing.assert_allclose(ell_res.w, dense_res.w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ell_res.h, dense_res.h, rtol=2e-4, atol=2e-5)


def test_ell_masked_fit_matches_dense(rng):
    A = _sparse(rng)
    k = 3
    w0 = rng.random((A.shape[0], k)).astype(np.float32)
    dres = ard_nmf_fit(np.asarray(A.todense()), k, w_init=w0, mask_seed=5,
                       inv_density=8, tol=0.0, maxit=3, trace_test_mse=1)
    Ap, Atp = EllMatrix.pair_from_csc(A)
    eres = ard_nmf_fit(Ap, k, At=Atp, w_init=w0, mask_seed=5,
                       inv_density=8, tol=0.0, maxit=3, trace_test_mse=1)
    np.testing.assert_allclose(eres.w, dres.w, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(eres.test_mse, dres.test_mse, rtol=1e-4)


def test_driver_routes_large_sparse_to_ell(rng):
    from singlet_tpu.solvers.drivers import _providers

    A = _sparse(rng)
    Ap, Atp = _providers(A, sparse_threshold=100)  # force ELL
    assert isinstance(Ap, EllMatrix) and isinstance(Atp, EllMatrix)
    assert Ap.cols_are_cells and not Atp.cols_are_cells
