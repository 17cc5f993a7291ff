"""Chunked "sparse list" ingestion: streaming ELL build, staging, drivers."""

import numpy as np
import scipy.sparse as sp

from singlet_tpu.solvers.drivers import cross_validate_nmf, run_nmf
from singlet_tpu.sparse.chunked import (
    ell_pair_from_chunks,
    load_staged_chunks,
    stage_chunks,
    staged_chunk_loaders,
)
from singlet_tpu.sparse.ell import EllMatrix


def _mat(genes=120, cells=3000, density=0.05):
    A = sp.random(genes, cells, density=density, random_state=7,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    return A


def _split(A, n):
    bounds = np.linspace(0, A.shape[1], n + 1).astype(int)
    return [A[:, lo:hi].tocsc() for lo, hi in zip(bounds[:-1], bounds[1:])]


def test_chunked_planes_match_monolithic():
    A = _mat()
    Ap1, At1 = EllMatrix.pair_from_csc(A)
    Ap2, At2 = ell_pair_from_chunks(_split(A, 4))
    assert Ap1.cols_pad == Ap2.cols_pad and At1.rows_pad == At2.rows_pad
    np.testing.assert_array_equal(np.asarray(Ap1.val), np.asarray(Ap2.val))
    np.testing.assert_array_equal(np.asarray(Ap1.idx), np.asarray(Ap2.idx))
    # At planes: same per-gene entries (chunk-streamed transpose vs direct)
    np.testing.assert_array_equal(np.asarray(At1.val), np.asarray(At2.val))
    np.testing.assert_array_equal(np.asarray(At1.idx), np.asarray(At2.idx))


def test_stage_and_reload(tmp_path):
    A = _mat(genes=60, cells=500)
    chunks = _split(A, 3)
    d = stage_chunks(str(tmp_path / "staged"), chunks)
    loaders = staged_chunk_loaders(d)
    assert len(loaders) == 3
    R = sp.hstack([ld() for ld in loaders]).tocsc()
    assert (R != A).nnz == 0
    Ap, At = load_staged_chunks(d)
    Ap0, At0 = EllMatrix.pair_from_csc(A)
    np.testing.assert_array_equal(np.asarray(Ap.val), np.asarray(Ap0.val))


def test_run_nmf_list_input_matches_matrix(rng):
    A = _mat(genes=80, cells=400, density=0.1)
    dense = np.asarray(A.todense())
    m_list = run_nmf(_split(A, 3), rank=4, tol=0.0, maxit=5, seed=3)
    m_mono = run_nmf(dense, rank=4, tol=0.0, maxit=5, seed=3)
    np.testing.assert_allclose(m_list.w, m_mono.w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(m_list.d, m_mono.d, rtol=2e-4)


def test_cv_accepts_staged_dir(tmp_path):
    A = _mat(genes=60, cells=300, density=0.1)
    d = stage_chunks(str(tmp_path / "s"), _split(A, 2))
    df = cross_validate_nmf(d, ranks=[2, 3], n_replicates=1, maxit=3,
                            verbose=0, trace_test_mse=1)
    assert set(df["k"]) == {2, 3}
    assert np.isfinite(df["test_error"]).all()
