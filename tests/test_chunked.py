"""Chunked "sparse list" ingestion: streaming blocked-ELL build, staging,
drivers. Chunk lists and staged directories route to the transpose-free
blocked-ELL engine (single-chip = 1-device mesh), streamed one chunk at a
time (reference sparse-list mode: src/singlet.cpp:384-402; R distributed
transpose: R/ard_nmf.R:57-70 — made unnecessary by the transpose-free
engine)."""

import numpy as np
import scipy.sparse as sp

from singlet_tpu.solvers.drivers import (_engine_or_providers,
                                         cross_validate_nmf, run_nmf)
from singlet_tpu.sparse.chunked import stage_chunks, staged_chunk_loaders


def _mat(genes=120, cells=3000, density=0.05):
    A = sp.random(genes, cells, density=density, random_state=7,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    return A


def _split(A, n):
    bounds = np.linspace(0, A.shape[1], n + 1).astype(int)
    return [A[:, lo:hi].tocsc() for lo, hi in zip(bounds[:-1], bounds[1:])]


def test_chunked_planes_match_monolithic():
    """Streaming chunk ingest builds bit-identical blocked-ELL planes to
    monolithic ingest of the concatenated matrix."""
    from singlet_tpu.parallel.sharded import make_mesh
    from singlet_tpu.parallel.sharded_ell import (shard_ell_data,
                                                  shard_ell_from_chunks)

    A = _mat()
    mesh = make_mesh(1)
    d1 = shard_ell_from_chunks(_split(A, 4), mesh)
    d2 = shard_ell_data(A, mesh)
    assert d1.b_width == d2.b_width
    np.testing.assert_array_equal(np.asarray(d1.b_li), np.asarray(d2.b_li))
    np.testing.assert_array_equal(np.asarray(d1.b_val), np.asarray(d2.b_val))


def test_stage_and_reload(tmp_path):
    A = _mat(genes=60, cells=500)
    chunks = _split(A, 3)
    d = stage_chunks(str(tmp_path / "staged"), chunks)
    loaders = staged_chunk_loaders(d)
    assert len(loaders) == 3
    R = sp.hstack([ld() for ld in loaders]).tocsc()
    assert (R != A).nnz == 0


def test_run_nmf_list_input_matches_matrix(rng):
    A = _mat(genes=80, cells=400, density=0.1)
    dense = np.asarray(A.todense())
    m_list = run_nmf(_split(A, 3), rank=4, tol=0.0, maxit=5, seed=3)
    m_mono = run_nmf(dense, rank=4, tol=0.0, maxit=5, seed=3)
    np.testing.assert_allclose(m_list.w, m_mono.w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(m_list.d, m_mono.d, rtol=2e-4)


def test_list_input_routes_to_engine():
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    A = _mat(genes=60, cells=300, density=0.1)
    P = _engine_or_providers(_split(A, 2), None)
    assert isinstance(P, ShardedEllEngine)
    assert P.cols_true == 300


def test_cv_accepts_staged_dir(tmp_path):
    A = _mat(genes=60, cells=300, density=0.1)
    d = stage_chunks(str(tmp_path / "s"), _split(A, 2))
    df = cross_validate_nmf(d, ranks=[2, 3], n_replicates=1, maxit=3,
                            verbose=0, trace_test_mse=1)
    assert set(df["k"]) == {2, 3}
    assert np.isfinite(df["test_error"]).all()
