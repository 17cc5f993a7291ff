"""Seurat RDS ingest: a synthetic S4 Seurat object is serialized with a
minimal from-scratch R-serialization WRITER (XDR v2 grammar), then read back
through the package's reader and loader (the input surface of the
reference's cellxgene_pipeline, reference:R/cellxgene_pipeline.R:19-21)."""

import struct

import numpy as np
import pytest
import scipy.sparse as sp

from singlet_tpu.data import read_seurat_rds
from singlet_tpu.sparse.rdata import r_class, read_rds, seurat_to_parts


# ---------------------------------------------------------------------------
# minimal XDR writer (independent of the reader; only what the test needs)
# ---------------------------------------------------------------------------

NILVALUE, SYM, LIST, CHAR, LGL, INT, REAL, STR, VEC, S4 = (
    254, 1, 2, 9, 10, 13, 14, 16, 19, 25)


class _W:
    def __init__(self):
        self.out = bytearray()

    def i32(self, v):
        self.out += struct.pack(">i", int(v))

    def flags(self, t, attr=False, tag=False, obj=False):
        self.i32(t | (0x100 if obj else 0) | (0x200 if attr else 0)
                 | (0x400 if tag else 0))

    def charsxp(self, s):
        b = s.encode()
        self.flags(CHAR)
        self.i32(len(b))
        self.out += b

    def symbol(self, name):
        self.flags(SYM)
        self.charsxp(name)

    def strvec(self, vals, attrs=None):
        self.flags(STR, attr=attrs is not None)
        self.i32(len(vals))
        for v in vals:
            self.charsxp(v)
        if attrs is not None:
            self.attrlist(attrs)

    def intvec(self, vals, attrs=None):
        self.flags(INT, attr=attrs is not None)
        self.i32(len(vals))
        for v in vals:
            self.i32(v)
        if attrs is not None:
            self.attrlist(attrs)

    def realvec(self, vals, attrs=None):
        self.flags(REAL, attr=attrs is not None)
        self.i32(len(vals))
        for v in vals:
            self.out += struct.pack(">d", float(v))
        if attrs is not None:
            self.attrlist(attrs)

    def rlist(self, items, attrs=None):
        """VECSXP: items are callables writing each element."""
        self.flags(VEC, attr=attrs is not None)
        self.i32(len(items))
        for write in items:
            write()
        if attrs is not None:
            self.attrlist(attrs)

    def nil(self):
        self.flags(NILVALUE)

    def attrlist(self, pairs):
        """Attribute pairlist: [(name, writer), ...]."""
        for name, write in pairs:
            self.flags(LIST, tag=True)
            self.symbol(name)
            write()
        self.nil()

    def s4(self, attrs):
        self.flags(S4, attr=True, obj=True)
        self.attrlist(attrs)

    def rds_bytes(self, write_root):
        self.out = bytearray()
        self.out += b"X\n"
        self.i32(2)            # serialization version 2
        self.i32(0x030603)     # writer R version
        self.i32(0x020300)     # min reader version
        write_root()
        return bytes(self.out)


def _write_seurat_rds(path, M, genes, cells, meta_types):
    """Serialize a Seurat-shaped S4 with an RNA Assay holding counts M."""
    w = _W()
    M = sp.csc_matrix(M)

    def dgc():
        w.s4([
            ("i", lambda: w.intvec(M.indices.tolist())),
            ("p", lambda: w.intvec(M.indptr.tolist())),
            ("Dim", lambda: w.intvec(list(M.shape))),
            ("Dimnames", lambda: w.rlist([
                lambda: w.strvec(genes), lambda: w.strvec(cells)])),
            ("x", lambda: w.realvec(M.data.tolist())),
            ("class", lambda: w.strvec(["dgCMatrix"])),
        ])

    def assay():
        w.s4([
            ("counts", dgc),
            ("class", lambda: w.strvec(["Assay"])),
        ])

    def meta_data():
        names = list(meta_types.keys())

        def col(v):
            if isinstance(v[0], str):
                return lambda: w.strvec(list(v))
            return lambda: w.realvec(list(v))

        w.rlist([col(v) for v in meta_types.values()], attrs=[
            ("names", lambda: w.strvec(names)),
            ("row.names", lambda: w.strvec(cells)),
            ("class", lambda: w.strvec(["data.frame"])),
        ])

    def root():
        w.s4([
            ("assays", lambda: w.rlist([assay], attrs=[
                ("names", lambda: w.strvec(["RNA"]))])),
            ("meta.data", meta_data),
            ("active.assay", lambda: w.strvec(["RNA"])),
            ("class", lambda: w.strvec(["Seurat"])),
        ])

    with open(path, "wb") as f:
        f.write(w.rds_bytes(root))


def _toy(rng):
    M = sp.random(30, 20, density=0.3, random_state=4, dtype=np.float64,
                  format="csc")
    M.data = np.round(np.abs(M.data) * 5 + 1)
    genes = [f"G{i}" for i in range(30)]
    cells = [f"C{i}" for i in range(20)]
    meta = {"cell_type": [("T" if i % 2 else "B") for i in range(20)],
            "n_counts": np.arange(20, dtype=float)}
    return M, genes, cells, meta


def test_seurat_rds_roundtrip(tmp_path, rng):
    M, genes, cells, meta = _toy(rng)
    path = str(tmp_path / "obj.rds")
    _write_seurat_rds(path, M, genes, cells, meta)

    obj = read_rds(path)
    assert "Seurat" in r_class(obj)
    M2, g2, c2, meta2 = seurat_to_parts(obj)
    assert (M2 != M).nnz == 0
    assert g2 == genes and c2 == cells
    assert list(meta2["cell_type"]) == meta["cell_type"]
    np.testing.assert_allclose(meta2["n_counts"], meta["n_counts"])

    ds = read_seurat_rds(path)
    assert ds.n_genes == 30 and ds.n_cells == 20
    assert ds.gene_names == genes
    assert list(ds.meta["cell_type"]) == meta["cell_type"]


def test_pipeline_accepts_rds(tmp_path, rng):
    """cellxgene_pipeline ingests a Seurat .rds end-to-end
    (reference:R/cellxgene_pipeline.R:17-47)."""
    from singlet_tpu.pipeline import cellxgene_pipeline, load_any

    M, genes, cells, meta = _toy(rng)
    path = str(tmp_path / "obj.rds")
    _write_seurat_rds(path, M, genes, cells, meta)
    ds = load_any(path)
    assert ds.n_cells == 20

    model = cellxgene_pipeline(path, out=str(tmp_path / "model"), k=3,
                               reps=1, verbose=0, maxit=5)
    assert model.k == 3
    assert (tmp_path / "model.summary.json").exists()


def test_rds_rejects_non_seurat(tmp_path):
    w = _W()
    with open(tmp_path / "x.rds", "wb") as f:
        f.write(w.rds_bytes(lambda: w.strvec(["hello"])))
    with pytest.raises(ValueError, match="not a Seurat"):
        read_seurat_rds(str(tmp_path / "x.rds"))


def _write_sce_rds(path, M, genes, cells, meta_types, dense=False,
                   assay_name="counts"):
    """Serialize a SingleCellExperiment-shaped S4: assays -> SimpleAssays
    (data slot = SimpleList with listData) + colData DFrame."""
    w = _W()
    M = sp.csc_matrix(M)

    def dgc():
        w.s4([
            ("i", lambda: w.intvec(M.indices.tolist())),
            ("p", lambda: w.intvec(M.indptr.tolist())),
            ("Dim", lambda: w.intvec(list(M.shape))),
            ("Dimnames", lambda: w.rlist([
                lambda: w.strvec(genes), lambda: w.strvec(cells)])),
            ("x", lambda: w.realvec(M.data.tolist())),
            ("class", lambda: w.strvec(["dgCMatrix"])),
        ])

    def dense_mat():
        vals = np.asarray(M.todense(), np.float64).T.ravel()  # col-major
        w.realvec(vals.tolist(), attrs=[
            ("dim", lambda: w.intvec(list(M.shape))),
            ("dimnames", lambda: w.rlist([
                lambda: w.strvec(genes), lambda: w.strvec(cells)])),
        ])

    def simple_list():
        w.s4([
            ("listData", lambda: w.rlist(
                [dense_mat if dense else dgc],
                attrs=[("names", lambda: w.strvec([assay_name]))])),
            ("class", lambda: w.strvec(["SimpleList"])),
        ])

    def assays():
        w.s4([
            ("data", simple_list),
            ("class", lambda: w.strvec(["SimpleAssays"])),
        ])

    def col_data():
        names = list(meta_types.keys())

        def col(v):
            if isinstance(v[0], str):
                return lambda: w.strvec(list(v))
            return lambda: w.realvec(list(v))

        w.s4([
            ("rownames", lambda: w.strvec(cells)),
            ("nrows", lambda: w.intvec([len(cells)])),
            ("listData", lambda: w.rlist(
                [col(v) for v in meta_types.values()],
                attrs=[("names", lambda: w.strvec(names))])),
            ("class", lambda: w.strvec(["DFrame"])),
        ])

    def root():
        w.s4([
            ("assays", assays),
            ("colData", col_data),
            ("class", lambda: w.strvec(["SingleCellExperiment"])),
        ])

    with open(path, "wb") as f:
        f.write(w.rds_bytes(root))


@pytest.mark.parametrize("dense", [False, True])
def test_sce_rds_roundtrip(tmp_path, rng, dense):
    """SingleCellExperiment .rds ingest (sparse dgCMatrix and dense-matrix
    assays), the reference's RunNMF.SingleCellExperiment input surface
    (reference:R/RunNMF.R:222-324)."""
    from singlet_tpu.sparse.rdata import sce_to_parts

    M, genes, cells, meta = _toy(rng)
    path = str(tmp_path / "sce.rds")
    _write_sce_rds(path, M, genes, cells, meta, dense=dense)

    obj = read_rds(path)
    assert "SingleCellExperiment" in r_class(obj)
    M2, g2, c2, meta2, assay = sce_to_parts(obj)
    assert assay == "counts"
    assert (sp.csc_matrix(M2) != sp.csc_matrix(M)).nnz == 0
    assert g2 == genes and c2 == cells
    assert list(meta2["cell_type"]) == meta["cell_type"]
    np.testing.assert_allclose(meta2["n_counts"], meta["n_counts"])

    ds = read_seurat_rds(path)
    assert ds.n_genes == 30 and ds.n_cells == 20
    assert list(ds.meta["cell_type"]) == meta["cell_type"]


def test_pipeline_accepts_sce_rds(tmp_path, rng):
    from singlet_tpu.pipeline import load_any

    M, genes, cells, meta = _toy(rng)
    path = str(tmp_path / "sce.rds")
    _write_sce_rds(path, M, genes, cells, meta)
    ds = load_any(path)
    assert ds.n_cells == 20 and ds.gene_names == genes


def test_sce_logcounts_only_marks_normalized(tmp_path, rng):
    """An SCE carrying only 'logcounts' must be ingested as ALREADY
    normalized (the reference SCE method uses logcounts without
    renormalizing, reference:R/RunNMF.R:222-324): the dataset is flagged,
    Experiment routes it to the normalized slot, and the pipeline skips
    LogNormalize instead of re-logging log-space data (ADVICE round 3)."""
    import warnings

    from singlet_tpu.experiment import Experiment

    M, genes, cells, meta = _toy(rng)
    path = str(tmp_path / "sce_log.rds")
    _write_sce_rds(path, M, genes, cells, meta, assay_name="logcounts")

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ds = read_seurat_rds(path)
    assert ds.normalized
    assert any("logcounts" in str(w.message) for w in rec)

    exp = Experiment.from_dataset(ds)
    assert exp.counts is None
    assert exp.data is not None
    got = exp._assay()
    # the assay is consumed as-is — no LogNormalize re-transform
    np.testing.assert_allclose(
        np.asarray(got.todense()), np.asarray(sp.csc_matrix(M).todense()))
