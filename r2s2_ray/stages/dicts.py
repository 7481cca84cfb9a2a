"""Dictionary / census stage.

Parity targets: the reference's insertion-ordered ``TemporaryIriIdMap`` for predicates
and graphs persisted as 2-column tables (TemporaryIriIdMap.java:23-56,
ParseIntoSOGTables.java:455-470), the class census driving type splitting
(RdfTypeSplitting.java:60-69), and the global scheme/host enum censuses
(IntroduceIriSchemeEnum.java:27-53, IntroduceHostEnums.java:27-52).

Deliberate deviation (SURVEY.md §7.5.2): the reference's ids are arrival-ordered, which
is non-deterministic under parallelism; ours are CONTENT-ordered (sorted) so every run
and every cluster size produces identical ids. Parity tests compare triple sets, which
are id-agnostic.

Scale notes: every census here is a two-phase distinct — a per-block ``pc.unique``
combiner inside ``map_batches`` (the salting/pre-aggregation step: a hot predicate
contributes at most one row per block to the shuffle, so skew cannot concentrate on one
reducer) followed by a global distinct over the tiny residue. Only the final, already
-small result is pulled to the driver; the big terms dictionary stays distributed and
is written as sorted Parquet.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _j1_pair_counts(tagged):
    """J1 subject-overlap fold shared by both term-dictionary paths: a
    (term, tbl) polars frame -> distinct-term overlap counts per unordered
    table pair (a < b, column dtype = tbl's). A term lives in exactly one
    bucket, so per-bucket counts sum globally without double-counting."""
    import polars as pl

    sets = (
        tagged.unique(["term", "tbl"])
        .group_by("term")
        .agg(pl.col("tbl").sort().alias("tbls"))
        .filter(pl.col("tbls").list.len() > 1)
    )
    ex = sets.explode("tbls")
    return (
        ex.rename({"tbls": "a"})
        .join(ex.rename({"tbls": "b"}), on="term")
        .filter(pl.col("a") < pl.col("b"))
        .group_by(["a", "b"])
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
    )


def _per_block_unique(col: str):
    def fn(t: pa.Table) -> pa.Table:
        u = pc.unique(t[col])
        return pa.table({col: pc.drop_null(u)})

    return fn


def distinct_large(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """Distinct values of a potentially huge column as a sorted Dataset (stays
    distributed; groupby shuffle with per-block combiner)."""
    pre = ds.select_columns([col]).map_batches(_per_block_unique(col), batch_format="pyarrow")
    return pre.groupby(col).count().drop_columns(["count()"]).sort(col)


import ray


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _attach_ids(t: pa.Table, offset: int) -> pa.Table:
    return t.append_column(
        "id", pa.array(range(offset, offset + t.num_rows), pa.int64())
    )


def distinct_with_ids(ds: ray.data.Dataset, col: str = "term") -> ray.data.Dataset:
    """Sorted distinct values with contiguous content-ordered int64 ids, fully
    distributed: after the range-partitioned sort the blocks are globally
    ordered, so only per-block ROW COUNTS visit the driver (metadata-scale);
    the prefix-summed offsets ship back to per-block tasks that append the id
    column in place. Raw Ray tasks are justified here — the Dataset API has no
    notion of a block's global row offset."""
    sorted_ds = distinct_large(ds, col)
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    offsets = [0]
    for c in counts[:-1]:
        offsets.append(offsets[-1] + c)
    out_refs = [_attach_ids.remote(r, o) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def build_term_dictionary(
    triples: ray.data.Dataset,
    out_path: str,
    num_buckets: int = 64,
    probe_tables: list[str] | None = None,
) -> tuple[int, dict[tuple[str, str], int] | None]:
    """Global IRI/literal term dictionary (north-star requirement): distinct
    union of subject and object lexical forms, written as bucketed sorted
    Parquet. Returns (count, overlap) where overlap is the J1 subject-overlap
    probe result (or None when ``probe_tables`` is not given).

    Id contract: id(term) = prefix-sum of earlier buckets' row counts (file
    metadata) + the term's rank inside its bucket's sorted file — deterministic
    and reproducible at ANY parallelism (content-hash bucket + content sort),
    vs TemporaryIriIdMap's arrival order. Deviation from round 1: ids follow
    (hash-bucket, term) order rather than global term order — the global string
    range-sort was the single most shuffle-hungry stage in the pipeline (the
    named scaling bottleneck in VERDICT r1); the exchange now keys on an int32
    bucket (cheap sampling/comparisons, same payload), buckets sort locally in
    parallel, and each bucket lands in ONE deterministically-named file
    (idempotent under task retries, per-partition resumable).

    J1 fusion: the merge planner's subject-overlap probe
    (TableMergingConcurence.java:46-268; ``probe_tables`` = the A5-passing
    candidates) needs subjects co-located by VALUE across tables — exactly what
    this exchange already does for every term. Subject terms of candidate
    tables carry an int32 table id through the shuffle (+4 bytes on rows that
    ship anyway); the bucket reducers fold per-term table sets into pair
    counts. This deletes the separate probe job and its full (subj, table)
    scan+exchange of the lean store."""
    import os

    import polars as pl

    from ..util import fs_makedirs, fs_rmtree, fs_write_table

    fs_rmtree(out_path)
    fs_makedirs(out_path)
    probe = list(probe_tables or [])
    probe_arr = pa.array(probe, pa.string())

    def both(t: pa.Table) -> pa.Table:
        if probe:
            # candidate-table subj rows ship TAGGED (they double as dictionary
            # rows, so plain subj only ships for non-candidate tables)
            tidx = pc.index_in(t["table_key"], value_set=probe_arr)
            is_cand = pc.is_valid(tidx)
            tagged = pl.from_arrow(
                pa.table(
                    {
                        "term": t["subj"].filter(is_cand),
                        "tbl": pc.cast(tidx, pa.int32()).filter(is_cand),
                    }
                )
            ).unique()
            s = pc.drop_null(pc.unique(t["subj"].filter(pc.invert(is_cand))))
        else:
            tagged = None
            s = pc.drop_null(pc.unique(t["subj"]))
        o = pc.drop_null(pc.unique(t["obj"]))
        term = pa.concat_arrays(
            [
                s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s,
                o.combine_chunks() if isinstance(o, pa.ChunkedArray) else o,
            ]
        )
        df = pl.from_arrow(pa.table({"term": term})).with_columns(
            pl.lit(-1, dtype=pl.Int32).alias("tbl")
        )
        if tagged is not None and len(tagged):
            df = pl.concat([tagged.select("term", "tbl"), df])
        # bucket assigned in the same pass (one fewer map stage)
        return df.with_columns(
            pl.col("term").hash(seed=3).mod(num_buckets).cast(pl.Int32).alias("bucket")
        ).to_arrow()

    def finish(t: pa.Table) -> pa.Table:
        # the int-keyed range sort lands every bucket wholly in one block; each
        # bucket becomes one sorted, deduped, deterministically-named file
        out = {"kind": [], "bucket": [], "n": [], "a": [], "b": [], "cnt": []}

        def emit(kind, bucket, n, a, b, cnt):
            out["kind"].append(kind)
            out["bucket"].append(bucket)
            out["n"].append(n)
            out["a"].append(a)
            out["b"].append(b)
            out["cnt"].append(cnt)

        for key, g in pl.from_arrow(t).partition_by("bucket", as_dict=True).items():
            terms = g["term"].unique().sort()
            bk = int(key[0])
            fs_write_table(
                pa.table({"term": terms.to_arrow()}),
                os.path.join(out_path, f"bucket-{bk:05d}.parquet"),
            )
            emit(0, bk, len(terms), -1, -1, 0)
            tagged = g.filter(pl.col("tbl") >= 0)
            if len(tagged):
                for a, b, cnt in _j1_pair_counts(tagged.select("term", "tbl")).iter_rows():
                    emit(1, bk, 0, a, b, cnt)
        return pa.table(
            {
                "kind": pa.array(out["kind"], pa.int8()),
                "bucket": pa.array(out["bucket"], pa.int32()),
                "n": pa.array(out["n"], pa.int64()),
                "a": pa.array(out["a"], pa.int32()),
                "b": pa.array(out["b"], pa.int32()),
                "cnt": pa.array(out["cnt"], pa.int64()),
            }
        )

    cols = ["subj", "obj"] + (["table_key"] if probe else [])
    # large bundles (512k rows) double as the pre-sort combiner: the per-block
    # unique removes most duplicate terms before they ship (measured 13.6s ->
    # 8.7s on the old sort at 20M triples / 32 cpus vs 64k bundles)
    rows = (
        triples.select_columns(cols)
        .map_batches(both, batch_format="pyarrow", batch_size=512_000)
        .sort("bucket")
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    # buckets no term hashed into still get an EMPTY dictionary file, matching
    # compact_term_fragments exactly — the id prefix-sum contract (and any
    # reader enumerating bucket-{i:05d}) must see every bucket on BOTH paths
    seen = {r["bucket"] for r in rows if r["kind"] == 0}
    for bk in range(num_buckets):
        if bk not in seen:
            fs_write_table(
                pa.table({"term": pa.array([], pa.string())}),
                os.path.join(out_path, f"bucket-{bk:05d}.parquet"),
            )
    n_terms = int(sum(r["n"] for r in rows if r["kind"] == 0))
    if not probe:
        return n_terms, None
    overlap: dict[tuple[str, str], int] = {}
    for r in rows:
        if r["kind"] == 1:
            key = (probe[r["a"]], probe[r["b"]])
            key = (min(key), max(key))
            overlap[key] = overlap.get(key, 0) + r["cnt"]
    return n_terms, overlap


def compact_term_fragments(
    frag_dir: str,
    out_path: str,
    num_buckets: int,
    probe_tables: list[str] | None = None,
) -> tuple[int, dict[tuple[str, str], int] | None]:
    """Reduce side of the fold-fused term-dictionary exchange: each task
    compacts ONE term-hash bucket's fragment files (written by the fold
    reducers, see fold._write_census_fn) into the bucket's sorted, deduped
    dictionary file, and folds the J1 subject-overlap pair counts from the
    fragments' table tags. Same outputs and id contract as
    :func:`build_term_dictionary` — identical bucket hash, identical per-bucket
    sort, identical file names — but the map side (a full subj/obj scan of the
    lean store plus a sort exchange) never runs: this job is a flat
    ``from_items`` over bucket ids with no all-to-all, so its launch floor is
    width-independent and near-zero.

    Fragments are deleted after a successful compaction (they duplicate the
    dictionary's bytes; a step re-run regenerates them via step 0, and the
    lean-store fallback path covers resumes from stores that predate
    fragments)."""
    import os

    import polars as pl
    from pyarrow import fs as pafs

    from ..util import fs_for, fs_makedirs, fs_rmtree, fs_write_table

    fs_rmtree(out_path)
    fs_makedirs(out_path)
    probe = set(probe_tables or [])

    def one(batch: pa.Table) -> pa.Table:
        out = {"kind": [], "n": [], "a": [], "b": [], "cnt": []}
        import pyarrow.parquet as pq

        for bk in batch["bucket"].to_pylist():
            f, d = fs_for(os.path.join(frag_dir, f"bucket={bk:05d}"))
            try:
                files = sorted(
                    i.path
                    for i in f.get_file_info(pafs.FileSelector(d))
                    if i.path.endswith(".parquet")
                )
            except FileNotFoundError:
                files = []
            if not files:
                # a bucket no term hashed into still emits an EMPTY dictionary
                # file so the id prefix-sum contract sees every bucket
                fs_write_table(
                    pa.table({"term": pa.array([], pa.string())}),
                    os.path.join(out_path, f"bucket-{bk:05d}.parquet"),
                )
                out["kind"].append(0); out["n"].append(0)
                out["a"].append(""); out["b"].append(""); out["cnt"].append(0)
                continue
            # one multi-file read per bucket (pyarrow fans the fragment files
            # out over its IO thread pool) instead of a serial per-file loop
            frags = pq.ParquetDataset(files, filesystem=f).read(
                columns=["term", "tbl"]
            )
            df = pl.from_arrow(frags)
            terms = df["term"].unique().sort()
            fs_write_table(
                pa.table({"term": terms.to_arrow()}),
                os.path.join(out_path, f"bucket-{bk:05d}.parquet"),
            )
            out["kind"].append(0); out["n"].append(len(terms))
            out["a"].append(""); out["b"].append(""); out["cnt"].append(0)
            if probe:
                tagged = df.filter(pl.col("tbl").is_in(sorted(probe)))
                if len(tagged):
                    for a, b, cnt in _j1_pair_counts(tagged.select("term", "tbl")).iter_rows():
                        out["kind"].append(1); out["n"].append(0)
                        out["a"].append(a); out["b"].append(b); out["cnt"].append(cnt)
        return pa.table(
            {
                "kind": pa.array(out["kind"], pa.int8()),
                "n": pa.array(out["n"], pa.int64()),
                "a": pa.array(out["a"], pa.string()),
                "b": pa.array(out["b"], pa.string()),
                "cnt": pa.array(out["cnt"], pa.int64()),
            }
        )

    rows = (
        ray.data.from_items(
            [{"bucket": b} for b in range(num_buckets)],
            override_num_blocks=num_buckets,  # one task per bucket, never serial
        )
        .map_batches(one, batch_format="pyarrow")
        .take_all()
    )
    n_terms = int(sum(r["n"] for r in rows if r["kind"] == 0))
    overlap: dict[tuple[str, str], int] | None = None
    if probe_tables is not None:
        overlap = {}
        for r in rows:
            if r["kind"] == 1:
                key = (min(r["a"], r["b"]), max(r["a"], r["b"]))
                overlap[key] = overlap.get(key, 0) + r["cnt"]
    fs_rmtree(frag_dir)
    return n_terms, overlap


def write_small_dict(values: list[str], path: str, col: str = "iri") -> None:
    """Persist a small content-ordered dictionary as one Parquet file
    (parity: ``predicates``/``graphs`` tables, ParseIntoSOGTables.java:455-470)."""
    import os

    from ..util import fs_makedirs, fs_write_table

    fs_makedirs(os.path.dirname(path))
    fs_write_table(
        pa.table({"id": pa.array(range(len(values)), pa.int32()), col: pa.array(values)}),
        path,
    )
