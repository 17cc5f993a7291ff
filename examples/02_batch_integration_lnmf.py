"""Batch integration with linked NMF (LNMF).

Python counterpart of the reference vignette
``vignettes/Batch_Integration_with_Linked_NMF.Rmd``: a two-condition dataset
(the vignette uses SeuratData's ifnb: IFN-beta-stimulated vs control PBMCs;
here a synthetic analogue with shared programs plus condition-specific ones,
since no network access) is factorized with group-weighted NMF
(``split.by``), then re-fit with linked NMF to separate shared from
condition-specific factors; downstream embedding should use only the shared
factors (vignette :75-84 passes ``GetSharedFactors`` dims to RunUMAP).

Run:  python examples/02_batch_integration_lnmf.py
"""

import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from singlet_tpu import Experiment
from singlet_tpu.data import CellDataset

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def make_ifnb_like(genes=1200, cells_per_group=800, k_shared=4, k_specific=2,
                   seed=0) -> CellDataset:
    """Two-batch counts: k_shared programs active in both conditions,
    k_specific programs exclusive to each condition (the structure LNMF is
    built to recover)."""
    rng = np.random.default_rng(seed)
    k_total = k_shared + 2 * k_specific
    W = rng.gamma(0.5, 1.0, (genes, k_total)).astype(np.float32)
    H = np.zeros((k_total, 2 * cells_per_group), np.float32)
    ctrl = slice(0, cells_per_group)
    stim = slice(cells_per_group, 2 * cells_per_group)
    H[:k_shared, :] = rng.gamma(0.5, 1.0, (k_shared, 2 * cells_per_group))
    H[k_shared:k_shared + k_specific, ctrl] = \
        rng.gamma(0.7, 1.5, (k_specific, cells_per_group))
    H[k_shared + k_specific:, stim] = \
        rng.gamma(0.7, 1.5, (k_specific, cells_per_group))
    lam = W @ H
    counts = rng.poisson(lam / lam.mean() * 0.2).astype(np.float32)
    stim_label = np.array(["CTRL"] * cells_per_group
                          + ["STIM"] * cells_per_group)
    return CellDataset(
        counts=sp.csc_matrix(counts),
        gene_names=[f"G{i}" for i in range(genes)],
        cell_names=[f"c{i}" for i in range(2 * cells_per_group)],
        meta={"stim": stim_label},
    )


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    exp = Experiment.from_dataset(make_ifnb_like())
    exp.preprocess_data()

    # RunNMF(ifnb, split.by = "stim"): equal group weighting in the
    # objective (vignette :34-38; weight_by_split reference:src/singlet.cpp:119)
    exp.run_nmf(k=10, split_by="stim", verbose=0)
    print("joint NMF fit:", exp.reductions["nmf"].w.shape)

    # RunLNMF (vignette :58-66): unlink factors dominated by one condition
    exp.run_lnmf(split_by="stim", link_cutoff=0.5, verbose=False)
    lnmf = exp.reductions["lnmf"]

    shared = exp.shared_factors("stim")
    unique = exp.unique_factors("stim")
    print(f"shared factors: {shared}")
    print(f"condition-specific factors: {unique}")

    # the synthetic truth has 2 specific programs per condition: LNMF should
    # unlink at least one factor per condition and keep several shared
    assert len(unique) >= 2, "expected condition-specific factors"
    assert len(shared) >= 2, "expected shared factors"

    # integrated embedding = shared factors only (vignette :81-84 passes
    # these dims to RunUMAP); condition mixing should be much higher there
    emb = lnmf.embeddings  # (cells, k)
    stim = exp.meta["stim"]
    def mix_score(cols):
        e = emb[:, cols]
        mu_c = e[stim == "CTRL"].mean(axis=0)
        mu_s = e[stim == "STIM"].mean(axis=0)
        denom = e.std(axis=0) + 1e-9
        return float(np.mean(np.abs(mu_c - mu_s) / denom))
    sep_shared = mix_score(shared)
    sep_unique = mix_score(unique)
    print(f"condition separation on shared dims {sep_shared:.3f} "
          f"vs specific dims {sep_unique:.3f}")
    assert sep_shared < sep_unique, \
        "shared factors should mix conditions better than specific ones"
    print("LNMF separated shared transcriptional programs from "
          "condition-specific response programs.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
