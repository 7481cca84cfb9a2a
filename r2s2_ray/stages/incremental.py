"""Incremental (delta) KG load — per-bucket quad state merged LSM-style.

The reference's load is strictly one-shot: the store is read-only after the
12-step batch (Loader.java:151-159) and "resume" only means re-entering a
crashed step. At 10^12-turn scale a daily re-load of the whole lake is not a
plan, so the engine adds DELTA ingestion at the dedup exchange, with the one
property that matters at 100 TB: **historical data never crosses the exchange
again.** Only the delta is shuffled; every touched bucket then folds old + new
LOCALLY (read its own files, union, dedup, rewrite), and untouched buckets are
not even read.

State layout: ``state_dir/bucket=NNNNN/quads-<tag>.parquet`` — the DISTINCT
quad rows (combo, subj, obj, graph) of that fold bucket, i.e. the fold
exchange's payload persisted per bucket (the same composite bucket function as
``fold._add_bucket``, so dedup groups are bucket-complete by construction).
Storing pre-fold quads (not folded graph-lists) makes the merge a plain set
union; the fold to graph-list rows happens at read via the SAME
``_fold_bucket`` kernel the batch path uses, so both paths produce
byte-identical folded tables (pinned by test).

Idempotency / resume: the per-bucket rewrite is convergent — file names are
content tags over the SORTED merged quads, so re-running the same delta
produces the same file name and content (overwrite-in-place), and stale
generations are removed only after the new one is written. A crashed merge
re-run therefore heals itself bucket by bucket.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray.data

from ..util import (
    fs_exists,
    fs_list_parquet,
    fs_makedirs,
    fs_read_table,
    fs_remove,
    fs_rmtree,
    fs_write_table,
)
from .fold import _add_bucket, _decode_dicts, _fold_bucket, block_tag

#: the exchange payload = dedup-relevant quad identity
QUAD_COLS = ["combo", "subj", "obj", "graph"]

_STATS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n_old", pa.int64()),
        ("n_delta", pa.int64()),
        ("n_quads", pa.int64()),
    ]
)


def _bucket_dir(state_dir: str, bucket: int) -> str:
    return f"{state_dir}/bucket={bucket:07d}"


def _write_bucket(state_dir: str, bucket: int, quads: pl.DataFrame) -> None:
    """Deterministic content-tagged write + stale-generation cleanup."""
    quads = quads.sort(QUAD_COLS)
    tbl = quads.to_arrow()
    tag = block_tag(tbl, cols=("combo", "subj", "obj"))
    d = _bucket_dir(state_dir, bucket)
    fs_makedirs(d)
    path = f"{d}/quads-{tag}.parquet"
    fs_write_table(tbl, path)
    for f in fs_list_parquet(d):
        if not f.endswith(f"quads-{tag}.parquet"):
            fs_remove(f)


def _apply_blocks(state_dir: str, merge: bool):
    """Per-block body shared by build and merge: the sorted block is
    bucket-complete, so each bucket's new quad set is final here."""

    def fn(t: pa.Table) -> pa.Table:
        t = _decode_dicts(t)
        df = pl.from_arrow(t)
        rows = []
        for key, g in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            delta = g.select(QUAD_COLS).unique()
            n_old = 0
            parts = [delta]
            if merge:
                d = _bucket_dir(state_dir, b)
                if fs_exists(d):
                    for f in fs_list_parquet(d):
                        old = pl.from_arrow(fs_read_table(f))
                        n_old += old.height
                        parts.append(old)
            merged = pl.concat(parts).unique() if len(parts) > 1 else delta
            _write_bucket(state_dir, b, merged)
            rows.append(
                {
                    "bucket": b,
                    "n_old": n_old,
                    "n_delta": delta.height,
                    "n_quads": merged.height,
                }
            )
        if not rows:
            return _STATS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_STATS_SCHEMA)

    return fn


def quad_state_build(
    routed: ray.data.Dataset, state_dir: str, num_buckets: int = 64
) -> list[dict]:
    """Initial state: route+fold-bucket the corpus, persist per-bucket
    distinct quads. Returns metadata-scale per-bucket stats rows."""
    fs_rmtree(state_dir)
    return (
        routed.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(
            _apply_blocks(state_dir, merge=False),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )


def quad_state_merge(
    routed_delta: ray.data.Dataset, state_dir: str, num_buckets: int = 64
) -> list[dict]:
    """Delta merge: ONLY the delta crosses the exchange (same bucket function
    as the initial build — mandatory, and asserted by the equivalence test);
    each touched bucket unions its existing files with the delta locally and
    rewrites one content-tagged generation. Untouched buckets are not read.

    Returns per-touched-bucket stats rows (n_old, n_delta, n_quads) — the
    per-partition lineage/metrics record for the increment."""
    return (
        routed_delta.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(
            _apply_blocks(state_dir, merge=True),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()
    )


def state_folded(state_dir: str, namespaces=None) -> ray.data.Dataset:
    """Fold the persisted state to the batch path's folded-triples shape
    (DEDUP_KEY + combo + graphs), one parallel task per bucket, NO exchange:
    every bucket directory is dedup-group-complete, so ``_fold_bucket`` over
    its files is exact. Output is byte-identical to ``fold(route(...))`` over
    the union corpus (equivalence pinned by test_incremental_*)."""
    import pyarrow.fs as pafs

    from ..util import fs_for

    fs, root = fs_for(state_dir)
    sel = pafs.FileSelector(root, recursive=False)
    dirs = sorted(
        f.path for f in fs.get_file_info(sel) if f.type == pafs.FileType.Directory
    )

    def fold_dir(b: pa.Table) -> pa.Table:
        outs = []
        for d in b["dir"].to_pylist():
            files = fs_list_parquet(d)
            if not files:
                continue
            quads = pa.concat_tables([fs_read_table(f) for f in files])
            outs.append(_fold_bucket(quads, namespaces))
        if not outs:
            from .fold import DEDUP_KEY

            fields = []
            for c in DEDUP_KEY + ["combo"]:
                fields.append(
                    (c, pa.int8() if c in ("s_kind", "o_kind") else pa.string())
                )
            fields.append(("graphs", pa.list_(pa.string())))
            return pa.schema(fields).empty_table()
        return pa.concat_tables(outs, promote_options="default")

    items = [{"dir": d} for d in dirs]
    return ray.data.from_items(items).map_batches(
        fold_dir, batch_format="pyarrow", batch_size=1
    )


# ---------------------------------------------------------------------------
# Incremental EXACT-DEDUP state over document fingerprints — the corpus-side
# twin of the quad state above: dedup each day's delta against everything
# already ingested without rescanning it.
# ---------------------------------------------------------------------------

_FP_STATS_SCHEMA = pa.schema(
    [("bucket", pa.int64()), ("n_old", pa.int64()), ("n_new", pa.int64())]
)


def _fp_bucket_rows(id_col: str, text_col: str, num_buckets: int):
    """(id, text, fp, bucket) rows — fp = 64-bit polynomial content hash
    (the SQL-mirrorable family), bucket = fp mod B. Block-local."""
    import numpy as np

    from ..functions.hashing import poly_hash_arr

    def fn(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        fp = poly_hash_arr(col)
        return pa.table(
            {
                id_col: b[id_col],
                text_col: col,
                "fp": pa.array(fp.astype(np.int64), pa.int64()),
                "bucket": pa.array((fp % np.uint64(num_buckets)).astype(np.int64)),
            }
        )

    return fn


def _fp_write(state_dir: str, bucket: int, fps: pl.DataFrame) -> None:
    fps = fps.sort("fp")
    tbl = fps.to_arrow()
    tag = block_tag(tbl, cols=("fp",))
    d = _bucket_dir(state_dir, bucket)
    fs_makedirs(d)
    fs_write_table(tbl, f"{d}/fps-{tag}.parquet")
    for f in fs_list_parquet(d):
        if not f.endswith(f"fps-{tag}.parquet"):
            fs_remove(f)


def _fp_read(state_dir: str, bucket: int) -> pl.DataFrame | None:
    d = _bucket_dir(state_dir, bucket)
    if not fs_exists(d):
        return None
    files = fs_list_parquet(d)
    if not files:
        return None
    return pl.concat([pl.from_arrow(fs_read_table(f)) for f in files])


def fp_state_build(
    docs: ray.data.Dataset,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> list[dict]:
    """Initial fingerprint state: one file of DISTINCT content fingerprints
    per hash bucket. One exchange over the corpus, then never again."""
    fs_rmtree(state_dir)

    def write(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        rows = []
        for key, g in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            fps = g.select("fp").unique()
            _fp_write(state_dir, b, fps)
            rows.append({"bucket": b, "n_old": 0, "n_new": fps.height})
        return (
            pa.Table.from_pylist(rows, schema=_FP_STATS_SCHEMA)
            if rows
            else _FP_STATS_SCHEMA.empty_table()
        )

    return (
        docs.map_batches(_fp_bucket_rows(id_col, text_col, num_buckets), batch_format="pyarrow")
        .map_batches(lambda t: t.drop([text_col, id_col]), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(write, batch_format="pyarrow", batch_size=None)
        .take_all()
    )


def fp_dedup_delta(
    docs_delta: ray.data.Dataset,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """PHASE 1 (pure read — safe under task retries): the delta's survivors.
    A delta row survives iff its fingerprint is absent from the state AND it
    is the delta's first occurrence of that fingerprint (min id). Only the
    delta crosses the exchange; each bucket's state file is read locally by
    the task that owns that bucket.

    State is NOT modified here — call :func:`fp_state_append` with the
    survivors afterwards (the convergent second phase), so a retried phase-1
    task can never observe its own side effects."""

    def keep(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(_decode_dicts(t))
        outs = []
        for key, g in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            first = (
                g.sort([id_col])
                .unique(subset=["fp"], keep="first", maintain_order=True)
            )
            st = _fp_read(state_dir, b)
            if st is not None and st.height:
                first = first.join(st.select("fp"), on="fp", how="anti")
            outs.append(first.select([id_col, text_col, "fp"]))
        if not outs:
            return pa.schema(
                [(id_col, pa.int64()), (text_col, pa.string()), ("fp", pa.int64())]
            ).empty_table()
        return pl.concat(outs).to_arrow()

    return (
        docs_delta.map_batches(
            _fp_bucket_rows(id_col, text_col, num_buckets), batch_format="pyarrow"
        )
        .sort("bucket")
        .map_batches(keep, batch_format="pyarrow", batch_size=None)
    )


def fp_state_append(
    kept: ray.data.Dataset, state_dir: str, num_buckets: int = 32
) -> list[dict]:
    """PHASE 2 (convergent union — idempotent): fold the survivors'
    fingerprints into the state, one content-tagged generation per touched
    bucket. Re-running the same survivors rewrites identical files."""
    import numpy as np

    def bucket(t: pa.Table) -> pa.Table:
        fp = t["fp"]
        fp = fp.combine_chunks() if isinstance(fp, pa.ChunkedArray) else fp
        u = fp.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"fp": fp, "bucket": pa.array((u % np.uint64(num_buckets)).astype(np.int64))}
        )

    def write(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        rows = []
        for key, g in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            new = g.select("fp").unique()
            st = _fp_read(state_dir, b)
            n_old = st.height if st is not None else 0
            merged = pl.concat([st, new]).unique() if st is not None else new
            _fp_write(state_dir, b, merged)
            rows.append({"bucket": b, "n_old": n_old, "n_new": merged.height - n_old})
        return (
            pa.Table.from_pylist(rows, schema=_FP_STATS_SCHEMA)
            if rows
            else _FP_STATS_SCHEMA.empty_table()
        )

    return (
        kept.select_columns(["fp"])
        .map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(write, batch_format="pyarrow", batch_size=None)
        .take_all()
    )


# ---------------------------------------------------------------------------
# Incremental MinHash-LSH NEAR-DUP state — the near-duplicate twin of the
# exact fingerprint state above: which docs of today's delta near-duplicate
# anything already ingested (or earlier in the same delta), WITHOUT ever
# rescanning the historical corpus. State = the LSH band keys themselves,
# bucketed by (band, bh) hash, so a delta band row only ever meets the state
# rows that could collide with it. Same two-phase retry discipline as the
# fingerprint state: phase 1 (pairs) is a pure read, phase 2 (append) is a
# convergent content-tagged union.
# ---------------------------------------------------------------------------

_LSH_STATS_SCHEMA = pa.schema(
    [("bucket", pa.int64()), ("n_old", pa.int64()), ("n_new", pa.int64())]
)

_LSH_PAIRS_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _lsh_band_rows(id_col: str, text_col: str, num_perm: int, bands: int,
                   shingle_k: int, num_buckets: int):
    """(doc, band, bh, bucket) long rows — the MinHasher signature exploded to
    one row per band, bucketed by a band-salted hash of the band key so a hot
    band value still spreads across band indexes. Hasher built once per task
    process (closure memo), work fully vectorized."""
    import numpy as np

    from ..functions.dedup import MinHasher

    memo: dict = {}

    def fn(b: pa.Table) -> pa.Table:
        mh = memo.setdefault(
            "mh", MinHasher(id_col, text_col, num_perm, bands, shingle_k)
        )
        sig = pl.from_arrow(mh(b))
        longs = [
            sig.select(
                pl.col(id_col).alias("doc"),
                pl.lit(bi, dtype=pl.Int64).alias("band"),
                pl.col(f"band{bi}").alias("bh"),
            )
            for bi in range(bands)
        ]
        out = pl.concat(longs)
        with np.errstate(over="ignore"):
            bkt = (
                out["bh"].to_numpy().astype(np.uint64) * np.uint64(1315423911)
                + out["band"].to_numpy().astype(np.uint64)
            ) % np.uint64(num_buckets)
        return out.to_arrow().append_column(
            "bucket", pa.array(bkt.astype(np.int64), pa.int64())
        )

    return fn


def _lsh_write(state_dir: str, bucket: int, rows: pl.DataFrame) -> None:
    rows = rows.unique().sort(["band", "bh", "doc"])
    tbl = rows.to_arrow()
    tag = block_tag(tbl, cols=("doc", "band", "bh"))
    d = _bucket_dir(state_dir, bucket)
    fs_makedirs(d)
    fs_write_table(tbl, f"{d}/bands-{tag}.parquet")
    for f in fs_list_parquet(d):
        if not f.endswith(f"bands-{tag}.parquet"):
            fs_remove(f)


def _lsh_read(state_dir: str, bucket: int) -> pl.DataFrame | None:
    d = _bucket_dir(state_dir, bucket)
    if not fs_exists(d):
        return None
    files = fs_list_parquet(d)
    if not files:
        return None
    return pl.concat([pl.from_arrow(fs_read_table(f)) for f in files])


def lsh_state_build(
    docs: ray.data.Dataset,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    num_buckets: int = 32,
) -> list[dict]:
    """Initial LSH state: one file of DISTINCT (doc, band, bh) rows per
    bucket. One exchange over the corpus, then never again."""
    fs_rmtree(state_dir)

    def write(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        rows = []
        for key, g in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            body = g.drop("bucket")
            _lsh_write(state_dir, b, body)
            rows.append({"bucket": b, "n_old": 0, "n_new": body.unique().height})
        return (
            pa.Table.from_pylist(rows, schema=_LSH_STATS_SCHEMA)
            if rows
            else _LSH_STATS_SCHEMA.empty_table()
        )

    return (
        docs.map_batches(
            _lsh_band_rows(id_col, text_col, num_perm, bands, shingle_k, num_buckets),
            batch_format="pyarrow",
        )
        .sort("bucket")
        .map_batches(write, batch_format="pyarrow", batch_size=None)
        .take_all()
    )


def lsh_pairs_delta(
    docs_delta: ray.data.Dataset,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """PHASE 1 (pure read): near-dup candidate pairs TOUCHING the delta —
    delta x state collisions plus delta x delta collisions, (a, b) with
    a < b, distinct. Only the delta crosses the exchange; each bucket's
    state files are read locally by the task that owns the bucket. State is
    NOT modified — call :func:`lsh_state_append` afterwards."""
    from ..functions.dedup import _fold_pairs

    def pairs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(_decode_dicts(t))
        outs = []
        for key, g in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            g = g.drop("bucket").unique()
            st = _lsh_read(state_dir, b)
            cands = [
                g.join(g, on=["band", "bh"], suffix="_r").filter(
                    pl.col("doc") < pl.col("doc_r")
                )
            ]
            if st is not None and st.height:
                cands.append(
                    g.join(st, on=["band", "bh"], suffix="_r").filter(
                        pl.col("doc") != pl.col("doc_r")
                    )
                )
            cand = pl.concat([c.select(["doc", "doc_r"]) for c in cands])
            outs.append(
                cand.select(
                    pl.min_horizontal("doc", "doc_r").alias("a"),
                    pl.max_horizontal("doc", "doc_r").alias("b"),
                ).unique()
            )
        if not outs:
            return _LSH_PAIRS_SCHEMA.empty_table()
        return pl.concat(outs).to_arrow()

    raw = (
        docs_delta.map_batches(
            _lsh_band_rows(id_col, text_col, num_perm, bands, shingle_k, num_buckets),
            batch_format="pyarrow",
        )
        .sort("bucket")
        .map_batches(pairs, batch_format="pyarrow", batch_size=None)
    )
    # a pair can collide in several (band, bh) buckets -> global distinct
    return _fold_pairs(raw)


def lsh_state_append(
    docs_delta: ray.data.Dataset,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    num_buckets: int = 32,
) -> list[dict]:
    """PHASE 2 (convergent union — idempotent): fold the delta's band rows
    into the state, one content-tagged generation per touched bucket.
    ``lsh_state_build(A); lsh_state_append(B)`` leaves byte-identical files
    to ``lsh_state_build(A ∪ B)`` (pinned by test)."""

    def write(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(_decode_dicts(t))
        rows = []
        for key, g in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            new = g.drop("bucket").unique()
            st = _lsh_read(state_dir, b)
            n_old = st.unique().height if st is not None else 0
            merged = pl.concat([st, new]).unique() if st is not None else new
            _lsh_write(state_dir, b, merged)
            rows.append({"bucket": b, "n_old": n_old, "n_new": merged.height - n_old})
        return (
            pa.Table.from_pylist(rows, schema=_LSH_STATS_SCHEMA)
            if rows
            else _LSH_STATS_SCHEMA.empty_table()
        )

    return (
        docs_delta.map_batches(
            _lsh_band_rows(id_col, text_col, num_perm, bands, shingle_k, num_buckets),
            batch_format="pyarrow",
        )
        .sort("bucket")
        .map_batches(write, batch_format="pyarrow", batch_size=None)
        .take_all()
    )


_RETRACT_STATS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n_before", pa.int64()),
        ("n_removed", pa.int64()),
        ("n_after", pa.int64()),
    ]
)


def quad_state_retract(state_dir: str, graphs) -> list[dict]:
    """Retraction / right-to-be-forgotten over the quad state: remove every
    quad whose ``graph`` is in the forget set (one graph per conversation, so
    deleting a user's conversations = deleting their graphs). The reference
    has no delete at all (read-only store, Loader.java:151-159); at 10^12
    turns a GDPR request cannot mean a full rebuild.

    Scale shape: NO exchange. The forget set ships once via ``ray.put``
    (deletion batches are request-sized, not corpus-sized); one task per
    bucket reads ITS OWN files, anti-filters, and rewrites one content-tagged
    generation (convergent — rerunning the same retraction is a no-op that
    produces the same file name). A bucket left empty drops its directory.
    Returns per-bucket stats rows — the lineage record of the deletion."""
    import pyarrow.compute as pc
    import pyarrow.fs as pafs
    import ray

    from ..util import fs_for

    ref = ray.put(pa.array(sorted(set(graphs)), pa.large_string()))
    fs, root = fs_for(state_dir)
    sel = pafs.FileSelector(root, recursive=False)
    dirs = sorted(
        f.path for f in fs.get_file_info(sel) if f.type == pafs.FileType.Directory
    )

    def retract_dir(t: pa.Table) -> pa.Table:
        forget = ray.get(ref)
        rows = []
        for d in t["dir"].to_pylist():
            files = fs_list_parquet(d)
            if not files:
                continue
            quads = pa.concat_tables([fs_read_table(f) for f in files])
            n_before = quads.num_rows
            keep = pc.invert(
                pc.is_in(
                    pc.cast(quads["graph"], pa.large_string()), value_set=forget
                )
            )
            kept = quads.filter(keep)
            bucket = int(d.rstrip("/").rsplit("=", 1)[1])
            if kept.num_rows == 0:
                fs_rmtree(d)
            elif kept.num_rows != n_before:
                _write_bucket(state_dir, bucket, pl.from_arrow(kept))
            rows.append(
                {
                    "bucket": bucket,
                    "n_before": n_before,
                    "n_removed": n_before - kept.num_rows,
                    "n_after": kept.num_rows,
                }
            )
        if not rows:
            return _RETRACT_STATS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_RETRACT_STATS_SCHEMA)

    items = [{"dir": d} for d in dirs]
    return (
        ray.data.from_items(items)
        .map_batches(retract_dir, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
