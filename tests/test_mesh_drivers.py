"""Drivers routed over a device mesh: whole rank-search stack multi-chip."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from singlet_tpu.parallel.sharded import make_mesh
from singlet_tpu.solvers.drivers import ard_nmf, cross_validate_nmf, run_nmf


def _sparse(genes=64, cells=96, density=0.15):
    A = sp.random(genes, cells, density=density, random_state=3,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    return A


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_run_nmf_mesh_matches_single(mesh8, rng):
    A = _sparse()
    w0 = rng.random((A.shape[0], 4)).astype(np.float32)
    single = run_nmf(np.asarray(A.todense()), rank=4, w_init=w0, tol=0.0,
                     maxit=4)
    multi = run_nmf(A, rank=4, w_init=w0, tol=0.0, maxit=4, mesh=mesh8)
    np.testing.assert_allclose(multi.w, single.w, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(multi.d, single.d, rtol=3e-4)


def test_cross_validate_mesh_matches_single(mesh8):
    A = _sparse()
    kw = dict(ranks=[2, 3], n_replicates=1, maxit=3, verbose=0,
              trace_test_mse=1, test_density=0.1, seed=4)
    df_s = cross_validate_nmf(np.asarray(A.todense()), **kw)
    df_m = cross_validate_nmf(A, mesh=mesh8, **kw)
    assert list(df_s["k"]) == list(df_m["k"])
    np.testing.assert_allclose(df_m["test_error"], df_s["test_error"],
                               rtol=2e-3)


def test_ard_nmf_on_mesh_runs(mesh8):
    A = _sparse(genes=48, cells=80)
    model = ard_nmf(A, k_max=6, maxit=3, verbose=0, trace_test_mse=1,
                    test_density=0.1, mesh=mesh8, max_fits=6)
    assert model.w.shape[0] == 48
    assert model.cv_data is not None and len(model.cv_data) > 0
