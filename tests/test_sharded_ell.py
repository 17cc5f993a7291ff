"""Sharded ELL engine: equivalence with the single-chip dense engine."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from singlet_tpu.parallel.sharded import make_mesh
from singlet_tpu.parallel.sharded_ell import sharded_ell_nmf_fit
from singlet_tpu.solvers.als import nmf_fit
from singlet_tpu.solvers.ard import ard_nmf_fit


def _sparse(rng, genes=48, cells=64, density=0.2):
    A = sp.random(genes, cells, density=density, random_state=11,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    return A


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_sharded_ell_plain_matches_dense(rng, mesh8):
    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 4)).astype(np.float32)
    single = nmf_fit(np.asarray(A.todense()), 4, w_init=w0, tol=0.0, maxit=4)
    multi = sharded_ell_nmf_fit(A, 4, mesh=mesh8, w_init=w0, tol=0.0, maxit=4)
    np.testing.assert_allclose(multi["w"], single.w, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(multi["h"], single.h, rtol=3e-4, atol=3e-5)


def test_sharded_ell_masked_matches_dense(rng, mesh8):
    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    single = ard_nmf_fit(np.asarray(A.todense()), 3, w_init=w0, mask_seed=21,
                         inv_density=8, tol=0.0, maxit=3, trace_test_mse=10)
    multi = sharded_ell_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.0,
                                maxit=3, masked=True, inv_density=8,
                                mask_seed=21)
    np.testing.assert_allclose(multi["w"], single.w, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(multi["test_mse"], single.test_mse[-1],
                               rtol=1e-3)


def test_sharded_ell_mesh_invariance(rng):
    A = _sparse(rng, genes=40, cells=48)
    w0 = rng.random((40, 3)).astype(np.float32)
    r2 = sharded_ell_nmf_fit(A, 3, mesh=make_mesh(2), w_init=w0, tol=0.0,
                             maxit=3, masked=True, inv_density=8, mask_seed=5)
    r8 = sharded_ell_nmf_fit(A, 3, mesh=make_mesh(8), w_init=w0, tol=0.0,
                             maxit=3, masked=True, inv_density=8, mask_seed=5)
    np.testing.assert_allclose(r2["w"], r8["w"], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(r2["test_mse"], r8["test_mse"], rtol=1e-4)
