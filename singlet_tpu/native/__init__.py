"""ctypes bindings for the native IO/runtime library (libsinglet_io.so).

Build with ``make -C singlet_tpu/native``. Every entry point has a pure-
Python/scipy fallback so the package works without the native build; the
native paths are the fast lane for ingest and out-of-core staging (the role
the reference's C++ header library plays, SURVEY.md L0).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

_HERE = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _HERE / "libsinglet_io.so"
    src = _HERE / "singlet_io.cpp"
    # rebuild when absent OR stale (a .so built before the current source
    # would load fine but lack newer symbols / fixes)
    stale = (not so.exists()
             or (src.exists() and src.stat().st_mtime > so.stat().st_mtime))
    if stale:
        try:
            subprocess.run(["make", "-C", str(_HERE), "-B",
                            "libsinglet_io.so"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            if not so.exists():
                return None
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.singlet_last_error.restype = ctypes.c_char_p
    _LIB = lib
    return lib


def _load_with(symbol: str) -> Optional[ctypes.CDLL]:
    """The library, but only if it exports ``symbol`` — a belt-and-braces
    guard against loading a stale binary (e.g. one built from an older
    source while this process was already running)."""
    lib = _load()
    if lib is None or not hasattr(lib, symbol):
        return None
    return lib


def available() -> bool:
    return _load() is not None


class _MtxResult(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int64),
        ("cols", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("coo_row", ctypes.POINTER(ctypes.c_int32)),
        ("coo_col", ctypes.POINTER(ctypes.c_int32)),
        ("coo_val", ctypes.POINTER(ctypes.c_float)),
    ]


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def read_mtx(path: str) -> sp.csc_matrix:
    """Fast MatrixMarket reader (plain or .gz). Falls back to scipy.io."""
    lib = _load()
    if lib is None:
        import scipy.io
        return scipy.io.mmread(path).tocsc().astype(np.float32)
    res = _MtxResult()
    rc = lib.singlet_mtx_read(path.encode(), ctypes.byref(res))
    if rc != 0:
        raise IOError(lib.singlet_last_error().decode())
    n = res.nnz
    try:
        row = np.ctypeslib.as_array(res.coo_row, (n,)).copy()
        col = np.ctypeslib.as_array(res.coo_col, (n,)).copy()
        val = np.ctypeslib.as_array(res.coo_val, (n,)).copy()
    finally:
        lib.singlet_free(res.coo_row)
        lib.singlet_free(res.coo_col)
        lib.singlet_free(res.coo_val)
    indptr = np.zeros(res.cols + 1, np.int64)
    indices = np.zeros(n, np.int32)
    data = np.zeros(n, np.float32)
    lib.singlet_coo_to_csc(res.rows, res.cols, n,
                           _ptr(row, ctypes.c_int32), _ptr(col, ctypes.c_int32),
                           _ptr(val, ctypes.c_float), _ptr(indptr, ctypes.c_int64),
                           _ptr(indices, ctypes.c_int32), _ptr(data, ctypes.c_float))
    return sp.csc_matrix((data, indices, indptr), shape=(res.rows, res.cols))


def csc_transpose(A: sp.csc_matrix) -> sp.csc_matrix:
    """O(nnz) transpose returning CSC of A.T. Fallback: scipy."""
    lib = _load()
    if lib is None:
        return A.T.tocsc()
    A = sp.csc_matrix(A)
    rows, cols = A.shape
    nnz = A.nnz
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int32)
    data = A.data.astype(np.float32)
    t_indptr = np.zeros(rows + 1, np.int64)
    t_indices = np.zeros(nnz, np.int32)
    t_data = np.zeros(nnz, np.float32)
    lib.singlet_csc_transpose(rows, cols, _ptr(indptr, ctypes.c_int64),
                              _ptr(indices, ctypes.c_int32),
                              _ptr(data, ctypes.c_float),
                              _ptr(t_indptr, ctypes.c_int64),
                              _ptr(t_indices, ctypes.c_int32),
                              _ptr(t_data, ctypes.c_float))
    return sp.csc_matrix((t_data, t_indices, t_indptr), shape=(cols, rows))


def csc_to_ell(A: sp.csc_matrix, cols_pad: int, max_nnz: int,
               pad_row: int) -> Tuple[np.ndarray, np.ndarray]:
    """CSC -> ELL planes (parallel). Fallback: python loop."""
    lib = _load()
    A = sp.csc_matrix(A)
    cols = A.shape[1]
    if lib is None:
        idx = np.full((cols_pad, max_nnz), pad_row, np.int32)
        val = np.zeros((cols_pad, max_nnz), np.float32)
        for c in range(cols):
            lo, hi = A.indptr[c], A.indptr[c + 1]
            n = min(hi - lo, max_nnz)
            idx[c, :n] = A.indices[lo:lo + n]
            val[c, :n] = A.data[lo:lo + n]
        return idx, val
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int32)
    data = A.data.astype(np.float32)
    idx = np.empty((cols_pad, max_nnz), np.int32)
    val = np.empty((cols_pad, max_nnz), np.float32)
    lib.singlet_csc_to_ell(cols, cols_pad, max_nnz, pad_row,
                           _ptr(indptr, ctypes.c_int64),
                           _ptr(indices, ctypes.c_int32),
                           _ptr(data, ctypes.c_float),
                           _ptr(idx, ctypes.c_int32), _ptr(val, ctypes.c_float))
    return idx, val


def csc_to_bell(A: sp.csc_matrix, cols_pad: int, gene_block: int,
                n_gb: int, width: int) -> Tuple[np.ndarray, np.ndarray]:
    """CSC -> gb-major blocked-ELL planes (the sharded engine's device
    layout, shape (n_gb, cols_pad, width)): local gene indices (pad -1) /
    values (pad 0) at one uniform width. Native parallel packer; fallback:
    vectorized numpy. Both paths fail loudly (ValueError) if ``width``
    under-counts any (column, gene-block) run — silent truncation would
    corrupt the operand. The input matrix is never mutated (sorting, when
    needed, happens on a copy)."""
    A = sp.csc_matrix(A)
    if not A.has_sorted_indices:
        A = A.copy()
        A.sort_indices()
    cols = A.shape[1]
    lib = _load_with("singlet_csc_to_bell")
    if lib is None:
        li = np.full((n_gb, cols_pad, width), -1, np.int32)
        lv = np.zeros((n_gb, cols_pad, width), np.float32)
        if A.nnz:
            nnz_col = np.diff(A.indptr)
            gb_of = A.indices.astype(np.int64) // gene_block
            col_of = np.repeat(np.arange(cols, dtype=np.int64), nnz_col)
            pos = np.arange(A.nnz, dtype=np.int64) - np.repeat(
                A.indptr[:-1].astype(np.int64), nnz_col)
            # rank within the (col, gb) run: runs are contiguous because
            # CSC column indices are sorted
            new_run = np.ones(A.nnz, bool)
            new_run[1:] = (col_of[1:] != col_of[:-1]) | \
                (gb_of[1:] != gb_of[:-1])
            run_id = np.cumsum(new_run) - 1
            rank = pos - pos[new_run][run_id]
            over = int(np.sum(rank >= width))
            if over:
                raise ValueError(
                    f"csc_to_bell: plane width {width} under-counts a "
                    f"(column, gene-block) run; {over} nonzeros would be "
                    "dropped")
            li[gb_of, col_of, rank] = (A.indices -
                                       gb_of * gene_block).astype(np.int32)
            lv[gb_of, col_of, rank] = A.data.astype(np.float32)
        return li, lv
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int32)
    data = A.data.astype(np.float32)
    li = np.empty((n_gb, cols_pad, width), np.int32)
    lv = np.empty((n_gb, cols_pad, width), np.float32)
    rc = lib.singlet_csc_to_bell(cols, cols_pad, gene_block, n_gb, width,
                                 _ptr(indptr, ctypes.c_int64),
                                 _ptr(indices, ctypes.c_int32),
                                 _ptr(data, ctypes.c_float),
                                 _ptr(li, ctypes.c_int32),
                                 _ptr(lv, ctypes.c_float))
    if rc != 0:
        raise ValueError(lib.singlet_last_error().decode())
    return li, lv


def log_normalize_inplace(A: sp.csc_matrix, scale_factor: float = 1e4
                          ) -> sp.csc_matrix:
    """Multithreaded LogNormalize on CSC data in place (fallback: preprocess)."""
    lib = _load()
    if lib is None:
        from singlet_tpu.preprocess import log_normalize
        return log_normalize(A, scale_factor)
    A = sp.csc_matrix(A, copy=True)
    A.data = A.data.astype(np.float32)
    indptr = A.indptr.astype(np.int64)
    lib.singlet_log_normalize(A.shape[1], _ptr(indptr, ctypes.c_int64),
                              _ptr(A.data, ctypes.c_float),
                              ctypes.c_double(scale_factor))
    return A


# ---------------------------------------------------------------------------
# SVC1 compressed shards (out-of-core staging, IVCSC analogue)
# ---------------------------------------------------------------------------

def svc_write(path: str, A: sp.csc_matrix,
              value_compress: bool = False) -> None:
    """Write a compressed SVC shard. ``value_compress`` engages the v2
    value-grouped encoding (VCSC analogue,
    reference:inst/include/src/VCSC/VCSC_SparseMatrix.hpp:20-30): each
    distinct value stored once per column — smaller for highly redundant
    values (raw counts, log-normalized counts)."""
    lib = _load_with("singlet_svc_write_v2" if value_compress
                     else "singlet_svc_write")
    A = sp.csc_matrix(A)
    if lib is None:
        np.savez_compressed(path, indptr=A.indptr, indices=A.indices,
                            data=A.data, shape=A.shape)
        return
    indptr = A.indptr.astype(np.int64)
    indices = A.indices.astype(np.int32)
    data = A.data.astype(np.float32)
    fn = lib.singlet_svc_write_v2 if value_compress else lib.singlet_svc_write
    rc = fn(path.encode(), A.shape[0], A.shape[1],
            _ptr(indptr, ctypes.c_int64),
            _ptr(indices, ctypes.c_int32),
            _ptr(data, ctypes.c_float))
    if rc != 0:
        raise IOError(lib.singlet_last_error().decode())


def svc_shape(path: str):
    """(rows, cols, nnz) of an SVC shard from its header — no data read."""
    lib = _load_with("singlet_svc_read_header")
    if lib is None:
        M = svc_read(path)
        return M.shape[0], M.shape[1], M.nnz
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    nnz = ctypes.c_int64()
    rc = lib.singlet_svc_read_header(path.encode(), ctypes.byref(rows),
                                     ctypes.byref(cols), ctypes.byref(nnz))
    if rc != 0:
        raise IOError(lib.singlet_last_error().decode())
    return rows.value, cols.value, nnz.value


def svc_read(path: str) -> sp.csc_matrix:
    lib = _load()
    if lib is None:
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        return sp.csc_matrix((z["data"], z["indices"], z["indptr"]),
                             shape=tuple(z["shape"]))
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    nnz = ctypes.c_int64()
    rc = lib.singlet_svc_read_header(path.encode(), ctypes.byref(rows),
                                     ctypes.byref(cols), ctypes.byref(nnz))
    if rc != 0:
        raise IOError(lib.singlet_last_error().decode())
    indptr = np.zeros(cols.value + 1, np.int64)
    indices = np.zeros(nnz.value, np.int32)
    data = np.zeros(nnz.value, np.float32)
    rc = lib.singlet_svc_read(path.encode(), _ptr(indptr, ctypes.c_int64),
                              _ptr(indices, ctypes.c_int32),
                              _ptr(data, ctypes.c_float))
    if rc != 0:
        raise IOError(lib.singlet_last_error().decode())
    return sp.csc_matrix((data, indices, indptr),
                         shape=(rows.value, cols.value))
