"""singlet-tpu: a TPU-native sparse NMF embedding engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``zdebruine/singlet`` R package (sparse ALS-NMF with coordinate-descent NNLS,
masked cross-validation for automatic rank determination, linked NMF for batch
integration, NNLS projection for transfer learning, and downstream
annotation/GSEA/graph analytics), built TPU-first:

- dense k-by-k math and all gather/accumulate products run on the MXU,
- the per-column sequential coordinate-descent NNLS is batched over columns
  (``vmap`` semantics, fixed sweep count with per-column convergence masks),
- masked cross-validation test sets are recomputed on the fly from a
  counter-based RNG (a bit-faithful xorshift64 reimplementation of the
  reference's stateless hash RNG, evaluated on device),
- multi-chip scaling uses a ``jax.sharding.Mesh`` over cells with XLA
  collectives (psum of k-by-genes partial products) instead of OpenMP threads.

Reference parity map: see SURVEY.md at the repo root. Citations of the form
``reference:src/singlet.cpp:NNN`` in docstrings point into /root/reference.
"""

from singlet_tpu.checkpoint import CheckpointManager
from singlet_tpu.config import NMFConfig
from singlet_tpu.data import (CellDataset, load_pbmc3k, read_10x_mtx,
                              read_h5ad, read_seurat_rds)
from singlet_tpu.experiment import Experiment
from singlet_tpu.model import NMFModel
from singlet_tpu.tracing import MetricLogger, metric_logging, profile
from singlet_tpu.solvers.als import nmf_fit
from singlet_tpu.solvers.ard import ard_nmf_fit
from singlet_tpu.solvers.drivers import (
    run_nmf,
    ard_nmf,
    cross_validate_nmf,
    get_best_rank,
    GetBestRank,
)
from singlet_tpu.solvers.linked import run_linked_nmf, build_link_matrix
from singlet_tpu.solvers.project import project_model
from singlet_tpu.solvers.gcnmf import (
    gcnmf,
    differentiate_model,
    assign_cells_to_edge_clusters,
)
from singlet_tpu.solvers.mu import mu_nmf
from singlet_tpu.solvers.batch import nmf_batch
from singlet_tpu.annotate import annotate_nmf
from singlet_tpu.parallel import make_mesh
from singlet_tpu.pipeline import cellxgene_pipeline
from singlet_tpu.gsea import msigdb_gene_sets, read_gmt, run_gsea
from singlet_tpu.plots import (
    annotation_plot,
    gsea_heatmap,
    metadata_heatmap,
    metadata_plot,
    factor_weights_ranges,
    plot_factor_weights,
    rank_plot,
)
from singlet_tpu.preprocess import (
    log_normalize,
    normit,
    rasterize_rowwise,
    weight_by_split,
)
from singlet_tpu.summary import (
    get_shared_factors,
    get_unique_factors,
    metadata_summary,
)
from singlet_tpu.graphs.spatial import (
    local_knn,
    rescale_spatial,
    snn_graph,
    spatial_graph,
)

__version__ = "0.1.0"

__all__ = [
    "CellDataset",
    "Experiment",
    "load_pbmc3k",
    "read_10x_mtx",
    "read_h5ad",
    "read_seurat_rds",
    "CheckpointManager",
    "MetricLogger",
    "metric_logging",
    "profile",
    "NMFConfig",
    "NMFModel",
    "nmf_fit",
    "ard_nmf_fit",
    "run_nmf",
    "ard_nmf",
    "cross_validate_nmf",
    "get_best_rank",
    "GetBestRank",
    "run_linked_nmf",
    "build_link_matrix",
    "project_model",
    "gcnmf",
    "mu_nmf",
    "nmf_batch",
    "differentiate_model",
    "assign_cells_to_edge_clusters",
    # downstream analytics (AnnotateNMF / RunGSEA surface)
    "annotate_nmf",
    "make_mesh",
    "cellxgene_pipeline",
    "run_gsea",
    "read_gmt",
    "msigdb_gene_sets",
    # plots (RankPlot / AnnotationPlot / Metadata* / GSEAHeatmap /
    # plotFactorWeights surface)
    "rank_plot",
    "annotation_plot",
    "metadata_plot",
    "metadata_heatmap",
    "gsea_heatmap",
    "factor_weights_ranges",
    "plot_factor_weights",
    # preprocessing (PreprocessData / weight_by_split / RasterizeRowwise /
    # normit surface)
    "log_normalize",
    "weight_by_split",
    "rasterize_rowwise",
    "normit",
    # summaries (MetadataSummary / GetShared/UniqueFactors surface)
    "metadata_summary",
    "get_shared_factors",
    "get_unique_factors",
    # spatial graphs (FindLocalNeighbors / RescaleSpatial surface)
    "local_knn",
    "snn_graph",
    "spatial_graph",
    "rescale_spatial",
    "__version__",
]
