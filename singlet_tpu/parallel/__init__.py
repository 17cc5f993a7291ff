"""Multi-chip / multi-host parallel engines (SURVEY.md §2.3/§5).

- sharded:    1-D cell-mesh dense ALS engine (shard_map + XLA collectives)
- sharded_ell: the same over sparse ELL planes
- multihost:  jax.distributed process runtime + per-host sharded ingest
"""

from singlet_tpu.parallel.multihost import (
    global_mesh,
    initialize,
    process_cell_range,
    shard_cells_from_local,
)
from singlet_tpu.parallel.sharded import make_mesh, shard_data, sharded_nmf_fit
from singlet_tpu.parallel.sharded_ell import ShardedEllEngine, sharded_ell_nmf_fit

__all__ = [
    "initialize",
    "global_mesh",
    "process_cell_range",
    "shard_cells_from_local",
    "make_mesh",
    "shard_data",
    "sharded_nmf_fit",
    "ShardedEllEngine",
    "sharded_ell_nmf_fit",
]
