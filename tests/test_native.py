"""Native IO library tests (builds libsinglet_io.so on first run)."""

import gzip

import numpy as np
import pytest
import scipy.sparse as sp

from singlet_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")
    return True


def _random_csc(rng, rows=80, cols=50, density=0.1):
    A = sp.random(rows, cols, density=density, random_state=3,
                  dtype=np.float32, format="csc")
    A.data = np.round(np.abs(A.data) * 10 + 1, 3).astype(np.float32)
    return A


def test_mtx_roundtrip(lib_ok, tmp_path, rng):
    A = _random_csc(rng)
    coo = A.tocoo()
    lines = ["%%MatrixMarket matrix coordinate real general",
             f"{A.shape[0]} {A.shape[1]} {A.nnz}"]
    for r, c, v in zip(coo.row, coo.col, coo.data):
        lines.append(f"{r + 1} {c + 1} {v}")
    plain = tmp_path / "m.mtx"
    plain.write_text("\n".join(lines) + "\n")
    gz = tmp_path / "m.mtx.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))

    for path in (plain, gz):
        B = native.read_mtx(str(path))
        np.testing.assert_allclose(np.asarray(B.todense()),
                                   np.asarray(A.todense()), rtol=1e-6)


def test_csc_transpose(lib_ok, rng):
    A = _random_csc(rng)
    T = native.csc_transpose(A)
    np.testing.assert_allclose(np.asarray(T.todense()),
                               np.asarray(A.T.todense()))
    # row indices sorted within each column
    for c in range(T.shape[1]):
        seg = T.indices[T.indptr[c]:T.indptr[c + 1]]
        assert (np.diff(seg) > 0).all()


def test_csc_to_ell(lib_ok, rng):
    A = _random_csc(rng)
    max_nnz = int(np.diff(A.indptr).max()) + 3
    idx, val = native.csc_to_ell(A, cols_pad=64, max_nnz=max_nnz, pad_row=99)
    assert idx.shape == (64, max_nnz)
    dense = np.asarray(A.todense())
    for c in range(A.shape[1]):
        got = {(int(i), float(v)) for i, v in zip(idx[c], val[c]) if v != 0}
        want = {(int(r), float(dense[r, c])) for r in np.nonzero(dense[:, c])[0]}
        assert got == want
    # padding columns
    assert (idx[A.shape[1]:] == 99).all()
    assert (val[A.shape[1]:] == 0).all()


def test_log_normalize_native_matches_python(lib_ok, rng):
    from singlet_tpu.preprocess import log_normalize

    A = _random_csc(rng)
    got = native.log_normalize_inplace(A, 1e4)
    want = log_normalize(A, 1e4)
    np.testing.assert_allclose(np.asarray(got.todense()),
                               np.asarray(want.todense()), rtol=1e-5)


def test_svc_roundtrip(lib_ok, tmp_path, rng):
    A = _random_csc(rng, rows=300, cols=120, density=0.05)
    path = str(tmp_path / "shard.svc")
    native.svc_write(path, A)
    B = native.svc_read(path)
    assert B.shape == A.shape
    np.testing.assert_allclose(np.asarray(B.todense()),
                               np.asarray(A.todense()), rtol=1e-6)
    # compression: smaller than raw CSC (int32+float32 per nz)
    import os
    raw = A.nnz * 8 + (A.shape[1] + 1) * 8
    assert os.path.getsize(path) < raw


def test_svc_v2_value_compressed_roundtrip(rng, tmp_path):
    """v2 value-grouped shards (VCSC analogue) round-trip exactly and are
    smaller than v1 for value-redundant matrices."""
    import os
    from singlet_tpu import native

    if native._load() is None:
        import pytest
        pytest.skip("native lib unavailable")
    genes, cells = 300, 120
    # redundant values: raw-count-like small integers
    A = sp.random(genes, cells, density=0.2, random_state=7, format="csc",
                  dtype=np.float32)
    A.data = np.ceil(A.data * 4).astype(np.float32)  # values in {1..4}
    p1 = str(tmp_path / "v1.svc")
    p2 = str(tmp_path / "v2.svc")
    native.svc_write(p1, A)
    native.svc_write(p2, A, value_compress=True)
    B1 = native.svc_read(p1)
    B2 = native.svc_read(p2)
    np.testing.assert_array_equal(B1.toarray(), A.toarray())
    np.testing.assert_array_equal(B2.toarray(), A.toarray())
    assert os.path.getsize(p2) < os.path.getsize(p1)


def test_stage_chunks_value_compressed(rng, tmp_path):
    from singlet_tpu import native
    from singlet_tpu.sparse.chunked import stage_chunks, staged_chunk_loaders

    if native._load() is None:
        import pytest
        pytest.skip("native lib unavailable")
    chunks = []
    for s in (1, 2):
        M = sp.random(50, 40, density=0.3, random_state=s, format="csc",
                      dtype=np.float32)
        M.data = np.ceil(M.data * 3).astype(np.float32)
        chunks.append(M)
    d = stage_chunks(str(tmp_path / "staged"), chunks, value_compress=True)
    loaders = staged_chunk_loaders(d)
    got = sp.hstack([ld() for ld in loaders]).tocsc()
    want = sp.hstack(chunks).tocsc()
    np.testing.assert_array_equal(got.toarray(), want.toarray())


def test_csc_to_bell_native_matches_fallback(lib_ok, rng):
    """Native blocked-ELL packer == the vectorized numpy fallback, and both
    reconstruct the dense matrix."""
    import singlet_tpu.native as native
    from singlet_tpu.parallel.sharded_ell import bell_width, bell_widths

    A = sp.random(48, 30, density=0.25, random_state=5, format="csc",
                  dtype=np.float32)
    A.data = np.abs(A.data) + 0.1
    gene_block, n_gb = 16, 3
    width = bell_width(bell_widths(A, n_gb, gene_block))

    li_n, lv_n = native.csc_to_bell(A, 32, gene_block, n_gb, width)

    orig_load = native._load
    native._load = lambda: None          # force the numpy fallback
    try:
        li_f, lv_f = native.csc_to_bell(A, 32, gene_block, n_gb, width)
    finally:
        native._load = orig_load
    np.testing.assert_array_equal(li_n, li_f)
    np.testing.assert_array_equal(lv_n, lv_f)

    # reconstruction
    D = np.zeros((32, 48), np.float32)
    for gb in range(n_gb):
        for c in range(30):
            live = li_n[gb, c] >= 0
            D[c, gb * gene_block + li_n[gb, c][live]] = lv_n[gb, c][live]
    np.testing.assert_allclose(D[:30].T, A.toarray(), rtol=1e-6)


def test_csc_to_bell_underwidth_fails_loudly(lib_ok):
    """An under-counted plane width must raise (both native and fallback) —
    silent truncation would corrupt the operand."""
    import singlet_tpu.native as native

    A = sp.csc_matrix(np.ones((16, 4), np.float32))   # 16 nnz per (col, gb)
    for force_fallback in (False, True):
        orig_load = native._load
        if force_fallback:
            native._load = lambda: None
        try:
            with pytest.raises(ValueError, match="width"):
                native.csc_to_bell(A, 8, 16, 1, 8)    # width 8 < 16 needed
        finally:
            native._load = orig_load


def test_csc_to_bell_does_not_mutate_input(lib_ok):
    """Packing must not reorder the caller's CSC indices in place."""
    import singlet_tpu.native as native

    # build a CSC with deliberately unsorted indices inside a column
    data = np.array([1.0, 2.0, 3.0], np.float32)
    indices = np.array([5, 2, 9], np.int32)
    indptr = np.array([0, 3, 3], np.int64)
    A = sp.csc_matrix((data, indices, indptr), shape=(16, 2))
    A.has_sorted_indices = False
    before = A.indices.copy()
    native.csc_to_bell(A, 2, 16, 1, 8)
    np.testing.assert_array_equal(A.indices, before)
