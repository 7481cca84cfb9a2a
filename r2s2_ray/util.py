"""Shared Ray Data helpers."""

from __future__ import annotations

import ray
import ray.data

#: inputs smaller than this may be repartitioned for parallelism — the shuffle is
#: cheaper than leaving (cpus - blocks) cores idle. Larger inputs are left alone:
#: Ray's parquet reader already splits them by file/row-group, and an all-to-all
#: over big data purely for block count would be a scale bug.
_FAN_OUT_MAX_BYTES = 4 << 30


def target_blocks(min_blocks: int = 16) -> int:
    """~2 tasks per CPU — enough granularity that no stage is capped below the
    cluster's parallelism while keeping per-task overhead amortized."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(min_blocks, 2 * cpus)


def fan_out(ds: ray.data.Dataset, min_blocks: int | None = None) -> ray.data.Dataset:
    """Ensure a small input Dataset has enough blocks to occupy the cluster.

    Ray Data schedules map tasks per BLOCK: a 5 MB single-file read yields 1-4
    blocks, capping every downstream ``map_batches`` at that parallelism no
    matter how many CPUs the cluster has (and making bigger clusters slower in
    wall time — pure scheduling overhead, zero extra concurrency). Repartition
    such inputs up-front; leave large multi-file inputs untouched (their reader
    already produces enough blocks, and reshuffling them would be an
    anti-pattern at scale).
    """
    target = min_blocks or target_blocks()
    try:
        nfiles = len(ds.input_files())
        size = ds.size_bytes() or 0
    except Exception:
        return ds
    if nfiles and nfiles >= target:
        return ds
    if size > _FAN_OUT_MAX_BYTES:
        return ds
    return ds.repartition(target)
