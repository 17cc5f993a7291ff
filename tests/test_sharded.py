"""Multi-chip equivalence: the sharded engine must reproduce the single-chip
engine (and therefore the reference semantics) exactly, on a virtual 8-device
CPU mesh."""

import numpy as np
import jax

import pytest

from singlet_tpu.parallel.sharded import make_mesh, sharded_nmf_fit
from singlet_tpu.solvers.als import nmf_fit
from singlet_tpu.solvers.ard import ard_nmf_fit


def _synthetic(rng, genes=50, cells=64, k=4):
    W = rng.random((genes, k)).astype(np.float32)
    H = rng.random((k, cells)).astype(np.float32)
    A = (W @ H).astype(np.float32)
    A[rng.random(A.shape) < 0.5] = 0
    return A


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


def test_plain_fit_matches_single_chip(rng, mesh8):
    A = _synthetic(rng)
    w0 = rng.random((A.shape[0], 4)).astype(np.float32)
    single = nmf_fit(A, 4, w_init=w0, tol=0.0, maxit=5)
    multi = sharded_nmf_fit(A, 4, mesh=mesh8, w_init=w0, tol=0.0, maxit=5)
    np.testing.assert_allclose(multi["w"], single.w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(multi["h"], single.h, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(multi["d"], single.d, rtol=2e-4)
    np.testing.assert_allclose(multi["tol_trace"], single.tol_trace,
                               rtol=1e-3, atol=1e-6)


def test_masked_fit_matches_single_chip(rng, mesh8):
    A = _synthetic(rng, genes=40, cells=48)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    single = ard_nmf_fit(A, 3, w_init=w0, mask_seed=77, inv_density=10,
                         tol=0.0, maxit=4, trace_test_mse=10)
    multi = sharded_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.0, maxit=4,
                            masked=True, inv_density=10, mask_seed=77)
    np.testing.assert_allclose(multi["w"], single.w, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(multi["h"], single.h, rtol=5e-4, atol=5e-5)
    # held-out MSE identical across topologies (mask is shard-invariant)
    np.testing.assert_allclose(multi["test_mse"], single.test_mse[-1],
                               rtol=1e-3)


def test_mesh_size_invariance(rng):
    """2-device and 8-device meshes produce identical models."""
    A = _synthetic(rng, genes=30, cells=32)
    w0 = rng.random((30, 3)).astype(np.float32)
    r2 = sharded_nmf_fit(A, 3, mesh=make_mesh(2), w_init=w0, tol=0.0, maxit=3,
                         masked=True, inv_density=8, mask_seed=5)
    r8 = sharded_nmf_fit(A, 3, mesh=make_mesh(8), w_init=w0, tol=0.0, maxit=3,
                         masked=True, inv_density=8, mask_seed=5)
    np.testing.assert_allclose(r2["w"], r8["w"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(r2["test_mse"], r8["test_mse"], rtol=1e-4)
