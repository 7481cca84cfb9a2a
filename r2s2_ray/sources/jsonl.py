"""JSONL (newline-delimited JSON) source/sink — the interchange format of
LLM training-data pipelines (every open-data corpus ships as JSONL shards).

The reference's format surface is RDF-file parsing (SURVEY.md §2.1 S2/S3 —
mapped to the parquet-native transcript front end); this module widens the
Ray-side IO surface the way a training-data user expects: read a directory of
JSONL shards as a streaming Dataset, write a Dataset back out as one JSONL
file per block (resumable: each input shard maps to its own output file, a
re-run can skip finished ones).

Scale notes: ``ray.data.read_json`` streams shard-by-shard (no driver
materialization) and pyarrow's JSON reader parses each shard vectorized;
``write_jsonl`` is ``Dataset.write_json`` — one file per block, so block size
(not corpus size) bounds worker memory.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def read_jsonl(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """Directory / file / list of JSONL shards -> streaming Dataset.

    Thin, intentional wrapper (one place to pin JSONL read defaults);
    pyarrow's block-based ndjson reader does the vectorized parsing."""
    return ray.data.read_json(paths, **kwargs)


def write_jsonl(ds: ray.data.Dataset, out_dir: str, **kwargs) -> None:
    """Dataset -> ``out_dir`` of ``*.json`` line-delimited shards, one per
    block (partitioned output — never one giant file)."""
    ds.write_json(out_dir, **kwargs)


def read_csv(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """Directory / file / list of CSV shards -> streaming Dataset (pyarrow's
    vectorized CSV reader under the hood)."""
    return ray.data.read_csv(paths, **kwargs)


def write_csv(ds: ray.data.Dataset, out_dir: str, **kwargs) -> None:
    """Dataset -> ``out_dir`` of CSV shards, one per block."""
    ds.write_csv(out_dir, **kwargs)


def write_ipc(ds: ray.data.Dataset, out_dir: str) -> list[dict]:
    """Dataset -> one Arrow IPC (Feather V2) file per block — the zero-copy
    interchange format for handing blocks to non-parquet consumers (feature
    stores, local tooling). Ray Data has no IPC datasink, so this is the
    custom-sink pattern: a map_batches side-effect write with content-tagged
    file names (a retried task overwrites its own file — idempotent), and
    only (path, rows) metadata rows return to the driver."""
    import pyarrow as pa

    from ..stages.fold import block_tag
    from ..util import fs_makedirs

    fs_makedirs(out_dir)

    def w(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
        tag = block_tag(b, cols=tuple(b.column_names))
        path = f"{out_dir}/part-{tag}.arrow"
        with pa.OSFile(path, "wb") as f:
            with pa.ipc.new_file(f, b.schema) as wr:
                wr.write_table(b)
        return pa.table({"path": pa.array([path]), "rows": pa.array([b.num_rows], pa.int64())})

    return ds.map_batches(w, batch_format="pyarrow").take_all()


def read_ipc(out_dir: str) -> ray.data.Dataset:
    """Directory of Arrow IPC files -> streaming Dataset, one read task per
    file (the custom-source pattern: a tiny work-list Dataset of paths,
    decode inside map_batches — memory bounded by file size, not corpus)."""
    import pyarrow as pa
    import pyarrow.fs as pafs

    from ..util import fs_for

    fs, root = fs_for(out_dir)
    files = sorted(
        f.path
        for f in fs.get_file_info(pafs.FileSelector(root, recursive=False))
        if f.path.endswith(".arrow")
    )

    def rd(b: pa.Table) -> pa.Table:
        tabs = [
            pa.ipc.open_file(pa.memory_map(p, "r")).read_all()
            for p in b["path"].to_pylist()
        ]
        return pa.concat_tables(tabs, promote_options="default")

    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        rd, batch_format="pyarrow", batch_size=1
    )


def write_orc(ds: ray.data.Dataset, out_dir: str) -> list[dict]:
    """Dataset -> one ORC file per block (the columnar interchange format of
    the Hadoop/Hive world — the second storage-format surface after parquet,
    covering the reference's codec breadth S3 on the Ray side). Ray Data has
    no ORC datasink, so same custom-sink pattern as :func:`write_ipc`:
    map_batches side-effect write with content-tagged names (retry
    overwrites its own file — idempotent), metadata rows to the driver."""
    import pyarrow as pa
    import pyarrow.orc as orc

    from ..stages.fold import block_tag
    from ..util import fs_makedirs

    fs_makedirs(out_dir)

    def w(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
        tag = block_tag(b, cols=tuple(b.column_names))
        path = f"{out_dir}/part-{tag}.orc"
        orc.write_table(b, path)
        return pa.table({"path": pa.array([path]), "rows": pa.array([b.num_rows], pa.int64())})

    return ds.map_batches(w, batch_format="pyarrow").take_all()


def read_orc(out_dir: str) -> ray.data.Dataset:
    """Directory of ORC files -> streaming Dataset, one read task per file
    (work-list Dataset of paths + decode inside map_batches)."""
    import pyarrow as pa
    import pyarrow.fs as pafs
    import pyarrow.orc as orc

    from ..util import fs_for

    fs, root = fs_for(out_dir)
    files = sorted(
        f.path
        for f in fs.get_file_info(pafs.FileSelector(root, recursive=False))
        if f.path.endswith(".orc")
    )

    def rd(b: pa.Table) -> pa.Table:
        tabs = [orc.ORCFile(p).read() for p in b["path"].to_pylist()]
        return pa.concat_tables(tabs, promote_options="default")

    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        rd, batch_format="pyarrow", batch_size=1
    )


def write_tar(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    payload_cols: dict[str, str],
) -> list[dict]:
    """Dataset -> WebDataset-style tar shards, one ``shard-<tag>.tar`` per
    block: each row becomes members ``<key>.<ext>`` (one per entry of
    ``payload_cols``, mapping extension -> column; string columns encode
    UTF-8, binary pass through). The tar-of-samples layout is THE interchange
    format multimodal training loaders stream (WebDataset et al.) — members
    of one sample are adjacent, so a reader never seeks. Same custom-sink
    contract as write_ipc: content-tagged shard names (a retried task
    overwrites its own shard — idempotent), fixed mtime/uid so the bytes are
    deterministic, only (path, rows) metadata back to the driver."""
    import io
    import tarfile

    import pyarrow as pa

    from ..stages.fold import block_tag
    from ..util import fs_makedirs

    fs_makedirs(out_dir)
    exts = sorted(payload_cols)

    def w(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())}
            )
        tag = block_tag(b, cols=tuple(sorted({key_col, *payload_cols.values()})))
        path = f"{out_dir}/shard-{tag}.tar"
        buf = io.BytesIO()
        keys = b[key_col].to_pylist()
        cols = {e: b[payload_cols[e]].to_pylist() for e in exts}
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for i, k in enumerate(keys):
                for e in exts:
                    v = cols[e][i]
                    data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    info = tarfile.TarInfo(name=f"{k}.{e}")
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes: content tags must
                    info.uid = info.gid = 0  # not depend on wall clock / uid
                    tf.addfile(info, io.BytesIO(data))
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        return pa.table(
            {"path": pa.array([path]), "rows": pa.array([b.num_rows], pa.int64())}
        )

    return ds.map_batches(w, batch_format="pyarrow").take_all()


def read_tar(out_dir: str, payload_cols: dict[str, str], key_col: str = "key") -> ray.data.Dataset:
    """Directory of WebDataset-style tar shards -> streaming Dataset: one
    read task per shard (work-list custom source), samples regrouped from
    adjacent ``<key>.<ext>`` members, one output row per key with the columns
    named by ``payload_cols`` (extension -> column; values decode UTF-8).
    Memory is bounded by shard size, not corpus size."""
    import tarfile

    import pyarrow as pa
    import pyarrow.fs as pafs

    from ..util import fs_for

    fs, root = fs_for(out_dir)
    files = sorted(
        f.path
        for f in fs.get_file_info(pafs.FileSelector(root, recursive=False))
        if f.path.endswith(".tar")
    )
    exts = sorted(payload_cols)

    def rd(b: pa.Table) -> pa.Table:
        rows: dict[str, dict] = {}
        for p in b["path"].to_pylist():
            with tarfile.open(p, mode="r") as tf:
                for m in tf:
                    key, dot, ext = m.name.rpartition(".")
                    if not dot or ext not in payload_cols:
                        raise ValueError(f"unexpected tar member: {m.name!r}")
                    data = tf.extractfile(m).read()
                    rows.setdefault(key, {})[ext] = data.decode("utf-8")
        keys = sorted(rows)
        cols = {key_col: pa.array(keys, pa.string())}
        for e in exts:
            missing = [k for k in keys if e not in rows[k]]
            if missing:
                raise ValueError(f"samples missing .{e} member: {missing[:3]}")
            cols[payload_cols[e]] = pa.array([rows[k][e] for k in keys], pa.string())
        return pa.table(cols)

    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        rd, batch_format="pyarrow", batch_size=1
    )


def write_jsonl_gz(ds: ray.data.Dataset, out_dir: str) -> list[dict]:
    """Dataset -> gzip-compressed JSONL shards (``part-<tag>.jsonl.gz``, one
    per block) — how open-data corpora actually ship (C4, The Pile, RedPajama
    are all .jsonl.gz/.zst shards). Same custom-sink contract as write_ipc:
    deterministic bytes (gzip mtime pinned to 0, fixed compresslevel) so a
    retried task overwrites its own shard byte-identically; (path, rows)
    metadata back to the driver."""
    import gzip
    import io
    import json

    import pyarrow as pa

    from ..stages.fold import block_tag
    from ..util import fs_makedirs

    fs_makedirs(out_dir)

    def w(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "rows": pa.array([], pa.int64())}
            )
        tag = block_tag(b, cols=tuple(b.column_names))
        path = f"{out_dir}/part-{tag}.jsonl.gz"
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0, compresslevel=6) as gz:
            for row in b.to_pylist():
                gz.write(json.dumps(row, sort_keys=True, default=str).encode("utf-8"))
                gz.write(b"\n")
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        return pa.table(
            {"path": pa.array([path]), "rows": pa.array([b.num_rows], pa.int64())}
        )

    return ds.map_batches(w, batch_format="pyarrow").take_all()


def read_jsonl_gz(out_dir: str) -> ray.data.Dataset:
    """Directory of ``*.jsonl.gz`` shards -> streaming Dataset, one read task
    per shard (work-list custom source): gunzip in-memory, then pyarrow's
    vectorized ndjson reader parses the shard. Memory bounded by shard size."""
    import gzip

    import pyarrow as pa
    import pyarrow.fs as pafs
    import pyarrow.json as pajson

    from ..util import fs_for

    fs, root = fs_for(out_dir)
    files = sorted(
        f.path
        for f in fs.get_file_info(pafs.FileSelector(root, recursive=False))
        if f.path.endswith(".jsonl.gz")
    )

    def rd(b: pa.Table) -> pa.Table:
        tabs = []
        for p in b["path"].to_pylist():
            with open(p, "rb") as f:
                raw = gzip.decompress(f.read())
            tabs.append(pajson.read_json(pa.BufferReader(raw)))
        return pa.concat_tables(tabs, promote_options="default")

    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        rd, batch_format="pyarrow", batch_size=1
    )


def read_parquet_unified(paths: list[str]) -> ray.data.Dataset:
    """Schema-evolution-tolerant Parquet read: files written across pipeline
    versions drift (columns added, dropped, reordered); a plain multi-file
    read_parquet requires one schema. This reader probes each file's FOOTER
    (metadata-scale driver work — a few KB per file, no data bytes), takes
    the UNION of the schemas in first-seen column order with per-column type
    agreement enforced loudly, then reads every file normally and pads the
    missing columns with typed nulls in a vectorized map — the
    union-by-name contract (DuckDB's read_parquet(union_by_name=true),
    Iceberg/Delta schema evolution) as a Ray Data source. Each file keeps
    its own parallel read; the pad is O(1) per batch."""
    import pyarrow.parquet as pq

    cols: dict[str, pa.DataType] = {}
    file_schemas: list[pa.Schema] = []
    for p in paths:
        s = pq.read_schema(p)
        file_schemas.append(s)
        for f in s:
            if f.name in cols:
                if cols[f.name] != f.type:
                    raise ValueError(
                        f"schema evolution type conflict on {f.name!r}: "
                        f"{cols[f.name]} vs {f.type} ({p})"
                    )
            else:
                cols[f.name] = f.type

    def pad_to_union(b: pa.Table) -> pa.Table:
        out = {}
        for name, typ in cols.items():
            if name in b.column_names:
                out[name] = b[name]
            else:
                out[name] = pa.nulls(b.num_rows, typ)
        return pa.table(out)

    parts = [
        ray.data.read_parquet(p).map_batches(pad_to_union, batch_format="pyarrow")
        for p in paths
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def compact_parquet(
    in_dir: str,
    out_dir: str,
    *,
    target_bytes: int = 128 << 20,
) -> list[str]:
    """Small-file compaction (the lakehouse OPTIMIZE/compact maintenance
    job): bin-pack a directory of Parquet files into ~``target_bytes``
    outputs — footer/size metadata only on the driver (first-fit-decreasing
    over file sizes, metadata scale), then each bin rewrites ITS OWN files
    in one task (`read_parquet(bin).repartition(1).write` per bin would
    re-exchange; instead the bin's rows stream through a single map task) —
    no global shuffle, resumable per bin (content-stable bin ids). Returns
    the output file list."""
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".parquet")
    )
    sizes = {f: os.path.getsize(f) for f in files}
    bins: list[list[str]] = []
    loads: list[int] = []
    for f in sorted(files, key=lambda x: -sizes[x]):  # first-fit-decreasing
        for i, ld in enumerate(loads):
            if ld + sizes[f] <= target_bytes:
                bins[i].append(f)
                loads[i] += sizes[f]
                break
        else:
            bins.append([f])
            loads.append(sizes[f])

    os.makedirs(out_dir, exist_ok=True)

    def write_bin(b: pa.Table) -> pa.Table:
        i = int(b["bin"][0].as_py())
        tabs = [pq.read_table(p) for p in bins[i]]
        out = pa.concat_tables(tabs)
        pq.write_table(out, os.path.join(out_dir, f"compact-{i:05d}.parquet"))
        return pa.table({"bin": pa.array([i], pa.int64()),
                         "n_rows": pa.array([out.num_rows], pa.int64())})

    stats = (
        ray.data.from_items([{"bin": i} for i in range(len(bins))])
        .repartition(max(1, len(bins)))
        .map_batches(write_bin, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    assert sum(r["n_rows"] for r in stats) == sum(
        pq.ParquetFile(f).metadata.num_rows for f in files
    ), "compaction lost rows"
    import os as _os

    return sorted(
        _os.path.join(out_dir, f)
        for f in _os.listdir(out_dir)
        if f.endswith(".parquet")
    )


def tar_index(out_dir: str) -> ray.data.Dataset:
    """Random-access INDEX over WebDataset tar shards: (shard, member, key,
    ext, offset, size) — offset is the payload's absolute byte position, so
    a loader can serve sample i with ONE ranged read (seek + read size) and
    no tar walk; this is the .idx sidecar pattern of streaming multimodal
    loaders. One index task per shard (work-list Dataset of paths), header
    walking only — payload bytes are never read. Pair with a pyarrow
    ranged-read to fetch members; `test_tar_index_random_access` pins that
    (offset, size) slices reproduce the exact member bytes."""
    import os
    import tarfile

    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".tar")
    )

    def index_shard(b: pa.Table) -> pa.Table:
        shards, members, keys, exts, offs, sizes = [], [], [], [], [], []
        for p in b["path"].to_pylist():
            with tarfile.open(p, "r") as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    name = m.name
                    key, _, ext = name.rpartition(".")
                    shards.append(os.path.basename(p))
                    members.append(name)
                    keys.append(key)
                    exts.append(ext)
                    offs.append(m.offset_data)
                    sizes.append(m.size)
        return pa.table(
            {
                "shard": pa.array(shards, pa.string()),
                "member": pa.array(members, pa.string()),
                "key": pa.array(keys, pa.string()),
                "ext": pa.array(exts, pa.string()),
                "offset": pa.array(offs, pa.int64()),
                "size": pa.array(sizes, pa.int64()),
            }
        )

    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        index_shard, batch_format="pyarrow", batch_size=1
    )


def rowgroup_prune(
    paths: list[str],
    key_col: str,
    lo,
    hi,
    columns: list[str],
) -> tuple[ray.data.Dataset, dict]:
    """Row-group-level predicate pushdown from footer statistics — the
    Iceberg/Delta data-skipping shape: probe every file's FOOTER (metadata
    only, one task per file), keep only row groups whose [min, max] on
    ``key_col`` intersects ``[lo, hi]``, then read exactly those row groups
    and apply the residual filter vectorized. On key-sorted/clustered
    storage this touches O(selectivity) of the bytes; correctness never
    depends on the stats (a group with no stats is kept and re-filtered).

    Returns ``(dataset, stats)`` with ``stats = {n_groups, n_scanned}`` so
    callers can assert real skipping happened (driver traffic: two ints +
    the group list, metadata scale)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # The residual filter reads t[key_col], so the key column must come back
    # from the row-group read even if the caller didn't list it.
    read_cols = list(columns) if key_col in columns else [*columns, key_col]
    # Typed empty-table schema for the all-pruned case: a null-typed
    # pa.table({c: []}) would fail unification against typed blocks.
    file_schema = pq.ParquetFile(sorted(paths)[0]).schema_arrow
    empty_schema = pa.schema([file_schema.field(c) for c in columns])

    def probe(b: pa.Table) -> pa.Table:
        out_p: list[str] = []
        out_rg: list[int] = []
        out_keep: list[bool] = []
        for p in b["path"].to_pylist():
            f = pq.ParquetFile(p)
            for i in range(f.num_row_groups):
                rg = f.metadata.row_group(i)
                st = None
                for j in range(rg.num_columns):
                    col = rg.column(j)
                    if col.path_in_schema == key_col:
                        st = col.statistics
                        break
                keep = True
                if st is not None and st.has_min_max:
                    keep = not (st.max < lo or st.min > hi)
                out_p.append(p)
                out_rg.append(i)
                out_keep.append(keep)
        return pa.table(
            {
                "path": pa.array(out_p, pa.string()),
                "rg": pa.array(out_rg, pa.int64()),
                "keep": pa.array(out_keep, pa.bool_()),
            }
        )

    meta = (
        ray.data.from_items([{"path": p} for p in sorted(paths)])
        .map_batches(probe, batch_format="pyarrow", batch_size=1)
        .materialize()
    )
    n_groups = meta.count()
    kept = meta.map_batches(
        lambda b: b.filter(b["keep"]).drop_columns(["keep"]),
        batch_format="pyarrow",
    ).materialize()
    stats = {"n_groups": n_groups, "n_scanned": kept.count()}
    if stats["n_scanned"] == 0:
        # zero blocks downstream would leave the dataset schema-less; hand
        # back a typed empty table instead so consumers can still unify
        return ray.data.from_arrow(empty_schema.empty_table()), stats

    def read_groups(b: pa.Table) -> pa.Table:
        outs = []
        for p, rg in zip(b["path"].to_pylist(), b["rg"].to_pylist()):
            t = pq.ParquetFile(p).read_row_group(rg, columns=read_cols)
            m = pc.and_(
                pc.greater_equal(t[key_col], lo), pc.less_equal(t[key_col], hi)
            )
            outs.append(t.filter(m).select(columns))
        if not outs:
            return empty_schema.empty_table()
        return pa.concat_tables(outs, promote_options="default")

    return (
        kept.map_batches(read_groups, batch_format="pyarrow", batch_size=1),
        stats,
    )
