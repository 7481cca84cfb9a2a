"""Shared Ray Data helpers + filesystem-portable path operations.

Every side-effecting file operation in the pipeline (partition writes from
workers, _SUCCESS stamps, manifest files, dictionary files) routes through the
``fs_*`` helpers below, which resolve plain paths to the local filesystem and
``scheme://`` URIs through ``pyarrow.fs`` — so the single-node POSIX layout and
an object-store layout (s3://bucket/prefix) use the same code path. DuckDB
consumers (views.sql) get :func:`duckdb_path`, which strips the ``file://``
scheme DuckDB does not parse.
"""

from __future__ import annotations

import os

import ray
import ray.data


def fs_for(path: str):
    """(pyarrow FileSystem, fs-local path) for a plain path or URI."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def duckdb_path(path: str) -> str:
    """Path form DuckDB's read_parquet understands (no file:// scheme)."""
    return path[len("file://") :] if path.startswith("file://") else path


def fs_makedirs(path: str) -> None:
    f, p = fs_for(path)
    f.create_dir(p, recursive=True)


def fs_rmtree(path: str) -> None:
    f, p = fs_for(path)
    try:
        f.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def fs_exists(path: str) -> bool:
    from pyarrow import fs as pafs

    f, p = fs_for(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def fs_write_text(path: str, text: str) -> None:
    f, p = fs_for(path)
    with f.open_output_stream(p) as out:
        out.write(text.encode())


def fs_read_text(path: str) -> str:
    f, p = fs_for(path)
    with f.open_input_stream(p) as inp:
        return inp.read().decode()


def fs_list_parquet(dir_path: str) -> list[str]:
    """Sorted .parquet member paths of a directory (original scheme preserved)."""
    return [p for p, _ in fs_list_parquet_sizes(dir_path)]


def fs_list_parquet_sizes(dir_path: str) -> list[tuple[str, int]]:
    """Sorted (path, size_bytes) of a directory's .parquet members — sizes come
    free with the directory listing (no per-file footer reads)."""
    from pyarrow import fs as pafs

    f, p = fs_for(dir_path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p))
    except FileNotFoundError:
        return []
    scheme = dir_path[: len(dir_path) - len(p)] if "://" in dir_path else ""
    return sorted(
        (scheme + i.path, i.size) for i in infos if i.path.endswith(".parquet")
    )


def fs_write_table(table, path: str, row_group_size: int | None = None) -> None:
    import pyarrow.parquet as pq

    f, p = fs_for(path)
    pq.write_table(table, p, filesystem=f, row_group_size=row_group_size)


def fs_read_table(path: str, columns=None):
    import pyarrow.parquet as pq

    f, p = fs_for(path)
    return pq.read_table(p, columns=columns, filesystem=f)


def read_parquet_dir(root: str, columns=None, **kw) -> "ray.data.Dataset":
    """``read_parquet`` over an explicitly LISTED file set: handing Ray a
    directory makes its datasource resolve partitions and sample footers
    serially on the driver (~4s per 1400 local files, worse on object stores,
    and paid by EVERY stage that re-reads the store); one recursive listing is
    metadata-scale and hive partition columns still resolve from the paths."""
    from pyarrow import fs as pafs

    f, p = fs_for(root)
    sel = pafs.FileSelector(p, recursive=True)
    files = sorted(i.path for i in f.get_file_info(sel) if i.path.endswith(".parquet"))
    # fs-local paths + explicit filesystem: the reader rejects scheme URIs in
    # per-file entries
    return ray.data.read_parquet(files, filesystem=f, columns=columns, **kw)


def fs_parquet_rows(path: str) -> int:
    """Row count from parquet footer metadata only."""
    import pyarrow.parquet as pq

    f, p = fs_for(path)
    return pq.ParquetFile(p, filesystem=f).metadata.num_rows


def fs_parquet_row_group_rows(path: str) -> list[int]:
    """Per-row-group row counts from the footer (ONE metadata read)."""
    import pyarrow.parquet as pq

    f, p = fs_for(path)
    md = pq.ParquetFile(p, filesystem=f).metadata
    return [md.row_group(i).num_rows for i in range(md.num_row_groups)]


def fs_read_row_groups(path: str, lo: int, hi: int, columns=None):
    """Read row groups [lo, hi) of one parquet file."""
    import pyarrow.parquet as pq

    f, p = fs_for(path)
    return pq.ParquetFile(p, filesystem=f).read_row_groups(
        list(range(lo, hi)), columns=columns
    )


def fs_remove(path: str) -> None:
    f, p = fs_for(path)
    f.delete_file(p)

#: inputs smaller than this may be repartitioned for parallelism — the shuffle is
#: cheaper than leaving (cpus - blocks) cores idle. Larger inputs are left alone:
#: Ray's parquet reader already splits them by file/row-group, and an all-to-all
#: over big data purely for block count would be a scale bug.
_FAN_OUT_MAX_BYTES = 4 << 30


def target_blocks(min_blocks: int = 16) -> int:
    """Fan-out width for small inputs — a CONSTANT, never a function of cluster
    width (same rule as materialize.chunk_target_rows): a width-derived count
    (the previous ``2 x cpus``) gave a 4x wider cluster 4x the map tasks and 4x
    the sort sample/reduce partitions on the SAME input, i.e. a scheduling
    floor that grows with exactly the leg the N-vs-4N scaling comparison
    showcases. 64 blocks keep any plausible single node busy (2 waves at 32
    cpus) while the 8-cpu leg pays the identical task graph; inputs large
    enough to exceed ``_FAN_OUT_MAX_BYTES`` never reach this path — their
    decomposition is data-bound (file/row-group splits)."""
    return int(os.environ.get("GRAFT_TARGET_BLOCKS", "64"))


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
