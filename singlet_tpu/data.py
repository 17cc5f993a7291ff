"""Bundled datasets and ingest helpers.

``load_pbmc3k`` reads the reference's bundled benchmark dataset directly from
its RData container (reference:data/pbmc3k.RData; loader semantics per
reference:R/get_pbmc3k_data.R:14-20: dgCMatrix slots i/p/Dim/Dimnames with an
rle-compressed x, plus a cell_type metadata vector). Also 10x matrix-market
ingest for external data.
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

_PBMC3K_PATH = "/root/reference/data/pbmc3k.RData"


@dataclass
class CellDataset:
    """genes x cells counts with names and per-cell metadata."""

    counts: sp.csc_matrix            # genes x cells
    gene_names: List[str]
    cell_names: List[str]
    meta: dict

    @property
    def n_genes(self) -> int:
        return self.counts.shape[0]

    @property
    def n_cells(self) -> int:
        return self.counts.shape[1]


def inverse_rle(lengths: np.ndarray, values: np.ndarray) -> np.ndarray:
    """R's inverse.rle: expand run-length encoding."""
    return np.repeat(np.asarray(values), np.asarray(lengths))


def load_pbmc3k(path: Optional[str] = None) -> CellDataset:
    """Load the 2,700-PBMC benchmark dataset from the reference's RData."""
    from singlet_tpu.sparse.rdata import r_to_python, read_rdata

    path = path or _PBMC3K_PATH
    ws = read_rdata(path)
    p = r_to_python(ws["pbmc3k"])
    x = inverse_rle(p["x"]["lengths"], p["x"]["values"]).astype(np.float32)
    dim = tuple(int(v) for v in p["Dim"])
    mat = sp.csc_matrix(
        (x, p["i"].astype(np.int32), p["p"].astype(np.int64)), shape=dim)
    gene_names, cell_names = [list(n) for n in p["Dimnames"]]
    return CellDataset(
        counts=mat,
        gene_names=gene_names,
        cell_names=cell_names,
        meta={"cell_type": np.asarray(p["cell_type"])},
    )


def read_10x_mtx(directory: str) -> CellDataset:
    """Read a 10x Genomics matrix-market directory (matrix.mtx[.gz],
    features/genes.tsv[.gz], barcodes.tsv[.gz])."""
    import scipy.io

    def _find(*names):
        for n in names:
            for suffix in ("", ".gz"):
                p = os.path.join(directory, n + suffix)
                if os.path.exists(p):
                    return p
        raise FileNotFoundError(f"none of {names} in {directory}")

    def _read_tsv_col(path, col=0):
        op = gzip.open if path.endswith(".gz") else open
        with op(path, "rt") as f:
            return [line.rstrip("\n").split("\t")[col] for line in f]

    mat = scipy.io.mmread(_find("matrix.mtx")).tocsc().astype(np.float32)
    genes = _read_tsv_col(_find("features.tsv", "genes.tsv"), col=1)
    if len(genes) != mat.shape[0]:
        genes = _read_tsv_col(_find("features.tsv", "genes.tsv"), col=0)
    cells = _read_tsv_col(_find("barcodes.tsv"))
    return CellDataset(counts=mat, gene_names=genes, cell_names=cells, meta={})


def read_h5ad(path: str) -> CellDataset:
    """Read an AnnData .h5ad file (via h5py; anndata not required).

    AnnData stores X as cells x genes; we return genes x cells.
    """
    import h5py

    with h5py.File(path, "r") as f:
        X = f["X"]
        if isinstance(X, h5py.Group):  # sparse
            enc = X.attrs.get("encoding-type", "csr_matrix")
            data = X["data"][:]
            indices = X["indices"][:]
            indptr = X["indptr"][:]
            shape = tuple(X.attrs["shape"])
            if "csr" in str(enc):
                m = sp.csr_matrix((data, indices, indptr), shape=shape)
            else:
                m = sp.csc_matrix((data, indices, indptr), shape=shape)
        else:
            m = sp.csr_matrix(X[:])
        mat = m.T.tocsc().astype(np.float32)

        def _names(group, fallback_n):
            try:
                g = f[group]
                idx_col = g.attrs.get("_index", "_index")
                col = g[idx_col][:]
                return [v.decode() if isinstance(v, bytes) else str(v)
                        for v in col]
            except Exception:
                return [str(i) for i in range(fallback_n)]

        cells = _names("obs", mat.shape[1])
        genes = _names("var", mat.shape[0])
        meta = {}
        try:
            obs = f["obs"]
            for key in obs:
                if key.startswith("_"):
                    continue
                item = obs[key]
                if isinstance(item, h5py.Group) and "codes" in item:
                    cats = [v.decode() if isinstance(v, bytes) else str(v)
                            for v in item["categories"][:]]
                    codes = item["codes"][:]
                    meta[key] = np.array(
                        [cats[c] if c >= 0 else None for c in codes])
        except Exception:
            pass
    return CellDataset(counts=mat, gene_names=genes, cell_names=cells,
                       meta=meta)
