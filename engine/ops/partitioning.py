"""Data-size-aware partition-count selection (SURVEY.md §4.2).

Why not ``ds.size_bytes()``: on any non-read dataset it EXECUTES the plan
to find out (measured: a lazy map_batches over 600k rows ran to completion
inside size_bytes()), so an operator that consults it would silently
compute its inputs twice. ``ds.input_files()`` is pure metadata: it
resolves to the source files without executing anything, and the on-disk
byte total is a good-enough proxy for sizing partitions (compressed disk
bytes under-estimate in-memory ~2-4x; the per-partition targets below are
chosen with that factor in mind).

Two regimes:

- ``shuffle_partitions``: sort-shuffle groupby/map_groups stages. More
  partitions are safe (no actor placement), but tiny partitions drown in
  per-task scheduling (measured on 600k rows: P=128 -> 12.4s, P=32 ->
  3.4s for the same fused as-of stage). Target ~32MB disk bytes per
  partition, floor = cluster CPUs, cap = 4x CPUs.

- ``join_partitions``: Ray's hash-shuffle ``Dataset.join`` spawns one
  aggregator ACTOR per partition and all must be placed before progress:
  P >> CPUs deadlocks a small cluster (observed: P=128 on 8 CPUs never
  starts) and each aggregator costs ~0.3s startup. Clamp to [2, 2x CPUs].
"""

from __future__ import annotations

import os


def _cpus() -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", 8))
    return os.cpu_count() or 8


def input_disk_bytes(*datasets) -> int:
    """Sum of source-file sizes across datasets; 0 if unknown (synthetic /
    in-memory sources). Never executes a plan."""
    total = 0
    for ds in datasets:
        # a transform appended to a read plan makes ds.input_files()
        # return [] — producers that know their source files tag the
        # Dataset with `_graft_input_files` (engine/queries.py `_read`)
        files = getattr(ds, "_graft_input_files", None)
        if files is None:
            try:
                files = ds.input_files()
            except Exception:  # noqa: BLE001 - non-file-backed source
                files = []
        for f in files:
            try:
                total += os.path.getsize(f)
            except OSError:
                pass
    return total


def shuffle_partitions(*datasets, per_partition_bytes: int = 32 << 20) -> int:
    cpus = _cpus()
    disk = input_disk_bytes(*datasets)
    by_bytes = -(-disk // per_partition_bytes) if disk else cpus
    return int(max(cpus, min(by_bytes, 4 * cpus)))


def join_partitions(left, right, per_partition_bytes: int = 32 << 20) -> int:
    cpus = _cpus()
    disk = input_disk_bytes(left, right)
    by_bytes = -(-disk // per_partition_bytes) if disk else 2 * cpus
    return int(max(2, min(by_bytes, 2 * cpus)))
