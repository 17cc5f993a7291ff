"""The NMF model container — the public result surface of every fit.

Mirrors the reference's model list/S4 surface: ``w`` (genes x k factor
loadings), ``d`` (k, factor scalings, sorted decreasing by the drivers),
``h`` (k x cells sample embeddings), factor names ``NMF_1..NMF_k``
(reference:R/run_nmf.R:65-76), plus ``cv_data`` traces and a ``misc`` dict
(annotations, GSEA results, link matrices — reference stores these in
``@misc``, reference:R/RunNMF.R:155-163).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class NMFModel:
    w: np.ndarray                      # (genes, k)
    d: np.ndarray                      # (k,)
    h: np.ndarray                      # (k, cells)
    gene_names: Optional[List[str]] = None
    cell_names: Optional[List[str]] = None
    cv_data: Optional[Any] = None      # pandas.DataFrame of CV traces
    misc: Dict[str, Any] = dataclasses.field(default_factory=dict)
    reduction_key: str = "NMF_"

    def __post_init__(self):
        self.w = np.asarray(self.w)
        self.d = np.asarray(self.d)
        self.h = np.asarray(self.h)

    @property
    def k(self) -> int:
        return int(self.d.shape[0])

    @property
    def factor_names(self) -> List[str]:
        return [f"{self.reduction_key}{i + 1}" for i in range(self.k)]

    @property
    def embeddings(self) -> np.ndarray:
        """Cell embeddings, cells x k (the reference's ``t(h)``
        cell.embeddings, reference:R/RunNMF.R:156)."""
        return self.h.T

    @property
    def loadings(self) -> np.ndarray:
        """Feature loadings, genes x k."""
        return self.w

    def sorted_by_d(self) -> "NMFModel":
        """Factors ordered by decreasing d (reference:R/run_nmf.R:65-68)."""
        order = np.argsort(-self.d, kind="stable")
        return dataclasses.replace(
            self, w=self.w[:, order], d=self.d[order], h=self.h[order, :]
        )

    def reconstruction(self) -> np.ndarray:
        """Dense model reconstruction w @ diag(d) @ h (genes x cells)."""
        return (self.w * self.d[None, :]) @ self.h

    # ------------------------------------------------------------------ I/O
    def save(self, path: str) -> None:
        """Persist to an .npz + sidecar JSON of names/misc."""
        path = Path(path)
        np.savez_compressed(path.with_suffix(".npz"), w=self.w, d=self.d, h=self.h)
        meta = {
            "gene_names": self.gene_names,
            "cell_names": self.cell_names,
            "reduction_key": self.reduction_key,
        }
        path.with_suffix(".json").write_text(json.dumps(meta))
        if self.cv_data is not None:
            try:
                self.cv_data.to_csv(path.with_suffix(".cv.csv"), index=False)
            except AttributeError:
                pass

    @classmethod
    def load(cls, path: str) -> "NMFModel":
        path = Path(path)
        arrs = np.load(path.with_suffix(".npz"))
        meta = {}
        jp = path.with_suffix(".json")
        if jp.exists():
            meta = json.loads(jp.read_text())
        cv = None
        cvp = path.with_suffix(".cv.csv")
        if cvp.exists():
            import pandas as pd
            cv = pd.read_csv(cvp)
        return cls(
            w=arrs["w"], d=arrs["d"], h=arrs["h"],
            gene_names=meta.get("gene_names"),
            cell_names=meta.get("cell_names"),
            reduction_key=meta.get("reduction_key", "NMF_"),
            cv_data=cv,
        )

    def align_genes(self, gene_names: Sequence[str]) -> "NMFModel":
        """Subset/reorder w rows to a gene list (projection intersects genes,
        reference:R/ProjectData.R:68-69)."""
        if self.gene_names is None:
            raise ValueError("model has no gene names")
        index = {g: i for i, g in enumerate(self.gene_names)}
        keep = [g for g in gene_names if g in index]
        rows = np.array([index[g] for g in keep], dtype=np.int64)
        return dataclasses.replace(self, w=self.w[rows], gene_names=keep)
