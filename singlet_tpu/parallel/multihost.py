"""Multi-host distributed runtime: process initialization + sharded ingest.

The reference has **no** distributed backend — no MPI/NCCL/Gloo anywhere
(SURVEY.md §2.3/§5); its intended manual scale-out was SLURM scripts staging
chunk files (leftover ``distributed_transpose`` helpers,
reference:R/run_nmf.R:79-107). This module is the TPU-native replacement:

  * ``initialize()`` — one call per host process; wraps
    ``jax.distributed.initialize`` (TPU pods auto-discover the coordinator,
    so all arguments are optional there).
  * ``global_mesh()`` — a 1-D cell mesh over *all* devices of *all* hosts;
    collectives ride ICI within a slice and DCN across slices, inserted by
    XLA from the same ``shard_map`` code paths as single-host
    (parallel/sharded.py — nothing else changes).
  * ``shard_cells_from_local()`` — each host loads only its own column
    (cell) chunk from disk and contributes it to one logical global array
    (``jax.make_array_from_process_local_data``); no host ever materializes
    the full matrix. This replaces the reference's file-staging workflow.
  * CV masks need no coordination: the counter RNG keys membership by global
    (cell, gene) ids, so every host recomputes identical test sets — the
    same property the reference's stateless ``rng.draw(i,j)`` gives OpenMP
    threads (reference:src/singlet.cpp:30-64).

Single-process (tests, one chip) all of this degenerates to the local mesh:
``initialize()`` is a no-op, ``global_mesh()`` == ``make_mesh()``, and
``shard_cells_from_local`` produces exactly what ``shard_data`` would.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import warnings

from singlet_tpu.parallel.sharded import (
    AXIS,
    ShardedData,
    cell_geometry,
)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Join the multi-host runtime (idempotent; no-op single-process).

    On Cloud TPU pods every argument is discovered from the environment;
    elsewhere pass coordinator ``host:port``, world size, and this process's
    rank, mirroring ``jax.distributed.initialize``.
    """
    if num_processes in (None, 1) and coordinator_address is None \
            and process_id in (None, 0):
        try:
            jax.distributed.initialize()          # pod auto-detection
        except Exception as e:
            # a true single-process run lands here with "coordinator_address
            # should be defined" (no pod environment to auto-detect) — fine,
            # silently. Anything else (a pod whose coordinator FAILED) must
            # be surfaced, or the run silently degrades into independent
            # single-host fits.
            benign = ("coordinator_address" in str(e)
                      or "before any JAX calls" in str(e))
            if not benign:
                warnings.warn(
                    f"jax.distributed auto-initialization failed ({e!r}); "
                    "continuing single-process. On a multi-host pod this "
                    "means the run is NOT distributed — pass "
                    "coordinator_address/num_processes/process_id "
                    "explicitly.")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over every device of every host, in device-id order."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_cell_range(genes: int, cells: int, mesh: Mesh,
                       process_id: Optional[int] = None,
                       cell_block: int = 1024,
                       gene_block: int = 2048) -> Tuple[int, int]:
    """[start, stop) of the padded cell axis owned by a host process.

    Devices split the padded axis evenly in mesh order; a host owns the
    union of its local devices' ranges (contiguous under ``global_mesh``'s
    id-ordered layout). Cells >= ``cells`` inside the range are padding the
    host should leave zero.
    """
    pid = jax.process_index() if process_id is None else process_id
    n_dev = mesh.devices.size
    per_proc = n_dev // jax.process_count()
    _, cells_pad, _, _ = cell_geometry(genes, cells, mesh, cell_block,
                                       gene_block)
    per_dev = cells_pad // n_dev
    return pid * per_proc * per_dev, (pid + 1) * per_proc * per_dev


def shard_cells_from_local(local_cols: np.ndarray, cells_true: int,
                           mesh: Mesh, cell_block: int = 1024,
                           gene_block: int = 2048) -> ShardedData:
    """Assemble the global cell-sharded operand from per-host column chunks.

    ``local_cols`` is this host's (genes, <= range width) slice — the columns
    in ``process_cell_range(...)`` — zero-padded here to the exact range
    width. Returns the same ShardedData ``shard_data`` produces, without any
    host ever holding the full matrix.
    """
    genes = local_cols.shape[0]
    genes_pad, cells_pad, cb, gb = cell_geometry(
        genes, cells_true, mesh, cell_block, gene_block)
    start, stop = process_cell_range(genes, cells_true, mesh,
                                     cell_block=cell_block,
                                     gene_block=gene_block)
    width = stop - start
    # the host must supply exactly its owned true columns — anything less
    # would silently zero-fill real cells, anything more won't fit
    expected = max(0, min(stop, cells_true) - start)
    if local_cols.shape[1] != expected:
        raise ValueError(
            f"process {jax.process_index()} owns padded cell range "
            f"[{start}, {stop}) = {expected} true columns, got "
            f"{local_cols.shape[1]}")
    buf = np.zeros((genes_pad, width), np.float32)
    buf[:genes, : local_cols.shape[1]] = np.asarray(local_cols, np.float32)

    A = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, AXIS)), buf,
        global_shape=(genes_pad, cells_pad))
    # validate the contiguity assumption behind process_cell_range: this
    # process's addressable shards must cover exactly [start, stop) — if the
    # mesh's device order doesn't group contiguously by process, fail loudly
    # instead of assembling a silently column-permuted operand
    owned = sorted((sh.index[1].start or 0) for sh in A.addressable_shards)
    per_dev = cells_pad // mesh.devices.size
    expect_starts = list(range(start, stop, per_dev))
    if owned != expect_starts:
        raise RuntimeError(
            "mesh device order does not give this process a contiguous "
            f"cell range: owns column starts {owned}, expected "
            f"{expect_starts}. Build the mesh with global_mesh() (device-id "
            "order) or load columns matching the owned ranges.")
    ne_local = (np.abs(buf) > 0).any(axis=0)
    nonempty = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(AXIS)), ne_local, global_shape=(cells_pad,))
    return ShardedData(
        A=A, nonempty=nonempty, mesh=mesh, genes_true=genes,
        cells_true=cells_true, cell_block=cb, gene_block=gb,
    )
