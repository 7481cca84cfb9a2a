"""Table merging: narrow per-predicate tables -> wide entity tables.

Parity target: TableMergingConcurence.java:46-268 (T7/J1/J2/A5/O2):

* gate A5   — only subject-unique tables merge (no subject repeats);
* gate      — same subject kind, DISJOINT predicate sets;
* probe J1  — positive subject overlap with the merge target;
* order O2  — ``type_*`` tables first, then ascending row count, tie-break by name
  ("merge into small tables to generate denser columns");
* semantics — the newer reference variant UPDATE-joins matching rows into the target
  and DELETEs only matched rows from the source: unmatched source rows STAY in the
  source table (SURVEY.md §7.5.3). Reproduced here as a subject-keyed outer merge
  that splits each group into a merged row (target subject present) or per-source
  leftover rows.

Shuffle design: all gates/probes are computed in ONE pass — union the candidate
tables' (subj, table) pairs, hash-bucket by subject, and fold each bucket vectorized
(same sort-by-bucket + whole-block map pattern as stages/fold.py; subject hashing
spreads hot subjects). The merge itself is a second bucketed exchange over the
cohort's rows whose reduce tasks write their output slices directly (no
materialized wide intermediate).
Post-merge re-optimization (ReOptimizeForR2RML.java:24-25) is a no-op for our
decision set: pre-merge virtual/datatype/LCS decisions are value-distribution facts
that an outer join cannot change (it only adds NULLs, which every decision rule
already tolerates or ignores), so decisions carry over unchanged.
"""

from __future__ import annotations

import os
from collections import defaultdict

import polars as pl
import pyarrow as pa
import ray.data

from ..state.manifest import TableSpec

_LEFTOVER_SUFFIX = "__leftover"


def _lean_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "lean", f"table_key={name}")


def _merge_order(tables: list[TableSpec]) -> list[TableSpec]:
    """O2 heuristic (TableMergingConcurence.java:40-44,81-100)."""
    return sorted(
        tables,
        key=lambda t: (0 if t.name.startswith("type_") else 1, t.row_count, t.name),
    )


def _subject_census(
    out_dir: str,
    tables: list[TableSpec],
    num_buckets: int = 16,
    uniqueness: dict[str, bool] | None = None,
):
    """One bucketed pass over candidate tables' subjects. Returns
    (uniqueness: {table: bool}, overlap: {(a, b): count}).

    When ``uniqueness`` is already known (the fold stage's fused census computes
    A5 exactly — see stats.census_block_rows), only the J1 overlap probe runs,
    and only over the tables that passed the gate: non-unique tables can never
    merge, so their rows need not leave disk at all.

    Reads the lean root ONCE (hive ``table_key`` partition column) instead of
    unioning per-table read plans — at N tables a union is N read stages of fixed
    overhead each; one filtered scan is one."""
    if uniqueness is not None:
        tables = [t for t in tables if uniqueness.get(t.name)]
    if not tables:
        return dict(uniqueness or {}), {}
    import pyarrow.compute as pc

    names = pa.array([t.name for t in tables], pa.string())

    def project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["table_key"], value_set=names))
        return pa.table({"subj": b["subj"], "tbl": pc.cast(b["table_key"], pa.string())})

    from ..util import read_parquet_dir

    # batch_size bundles the lean store's many small files into few map tasks
    # (and thus few sort-map tasks downstream)
    u = read_parquet_dir(
        os.path.join(out_dir, "lean"), columns=["subj", "table_key"]
    ).map_batches(project, batch_format="pyarrow", batch_size=256_000)

    def add_bucket(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return b.append_column(
            "bucket",
            df.select(pl.col("subj").hash(seed=7).mod(num_buckets).cast(pl.Int32).alias("x"))["x"].to_arrow(),
        )

    def fold(b: pa.Table) -> pa.Table:
        from .dicts import _j1_pair_counts

        df = pl.from_arrow(b)
        # per (subj, tbl) multiplicity + the SHARED J1 pair-count fold (one
        # implementation for every subject-overlap probe — dicts._j1_pair_counts)
        per = df.group_by(["subj", "tbl"]).agg(pl.len().alias("n"))
        dup = per.group_by("tbl").agg((pl.col("n") > 1).any().alias("has_dup"))
        pairs = _j1_pair_counts(per.select(pl.col("subj").alias("term"), "tbl"))
        out = pl.concat(
            [
                dup.select(pl.col("tbl").alias("a"), pl.lit("").alias("b"), pl.col("has_dup").cast(pl.Int64).alias("cnt")),
                pairs.select("a", "b", "cnt"),
            ]
        )
        return out.to_arrow()

    # sort(bucket) + per-block map instead of map_groups: fold() partitions by
    # (subj, tbl) itself, and bucket-complete blocks are guaranteed by the
    # range-partitioned sort (see stages/fold.py fold() note on why)
    rows = (
        u.map_batches(add_bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    has_dup: dict[str, bool] = defaultdict(bool)
    overlap: dict[tuple[str, str], int] = defaultdict(int)
    for r in rows:
        if r["b"] == "":
            has_dup[r["a"]] |= bool(r["cnt"])
        else:
            overlap[(r["a"], r["b"])] += r["cnt"]
    if uniqueness is not None:
        return dict(uniqueness), dict(overlap)
    return {t.name: not has_dup[t.name] for t in tables}, dict(overlap)


def plan_cohorts(tables: list[TableSpec], uniqueness: dict, overlap: dict) -> list[list[TableSpec]]:
    ordered = _merge_order(tables)
    taken: set[str] = set()
    cohorts: list[list[TableSpec]] = []
    for target in ordered:
        if target.name in taken or not uniqueness.get(target.name, False):
            continue
        members = [target]
        preds = {pm.predicate for pm in target.predicates}
        for cand in ordered:
            if cand.name in taken or cand.name == target.name:
                continue
            if not uniqueness.get(cand.name, False) or cand.subj_kind != target.subj_kind:
                continue
            cpreds = {pm.predicate for pm in cand.predicates}
            if cpreds & preds:
                continue  # disjoint predicate sets required
            key = (min(target.name, cand.name), max(target.name, cand.name))
            if overlap.get(key, 0) <= 0:
                continue  # J1 probe: no shared subjects -> no merge
            members.append(cand)
            preds |= cpreds
        if len(members) > 1:
            cohorts.append(members)
            taken.update(m.name for m in members)
    return cohorts


def _build_all_merged(
    out_dir: str,
    cohorts: list[list[TableSpec]],
    num_buckets: int = 16,
    graph_enum: list[str] | None = None,
) -> dict[str, int]:
    """Outer-merge EVERY cohort in one shuffle: rows are tagged
    (cohort, member_idx), bucketed by subject hash, folded per (cohort, bucket)
    with columns padded to the widest cohort, then split per cohort at write.
    Returns {output_name: row_count}."""
    import pyarrow.compute as pc

    kmax = max(len(c) for c in cohorts)
    name_list, cohort_ids, member_ids = [], [], []
    for ci, members in enumerate(cohorts):
        for mi, m in enumerate(members):
            name_list.append(m.name)
            cohort_ids.append(ci)
            member_ids.append(mi)
    names = pa.array(name_list, pa.string())
    cohort_arr = pa.array(cohort_ids, pa.int32())
    member_arr = pa.array(member_ids, pa.int32())

    genum = pa.array(graph_enum, pa.string()) if graph_enum else None

    def project(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["table_key"], value_set=names)
        b = b.append_column("cohort", pc.take(cohort_arr, idx))
        b = b.append_column("src", pc.take(member_arr, idx))
        b = b.filter(pc.is_valid(b["src"]))
        if genum is not None:
            # graph IRIs -> enum ids BEFORE the exchange: the fat list<string>
            # column becomes list<int32> (materialize passes pre-encoded lists
            # through untouched, so nothing downstream decodes)
            from .materialize import _encode_graph_list

            gi = b.schema.get_field_index("graphs")
            b = b.set_column(gi, "graphs", _encode_graph_list(b["graphs"], genum))
        df = pl.from_arrow(b.select(["subj", "s_kind", "obj", "graphs", "cohort", "src"]))
        return df.with_columns(
            pl.col("subj").hash(seed=9).mod(num_buckets).cast(pl.Int32).alias("bucket")
        ).to_arrow()

    # list ONLY the cohort members' hive directories: non-cohort tables' bytes
    # never leave disk (the previous whole-store scan decoded every table's
    # subj/obj/graphs columns only for project() to drop the rows). Paths are
    # fs-local (explicit filesystem=) — the reader rejects scheme URIs in
    # per-file entries.
    from pyarrow import fs as pafs

    from ..util import fs_for

    fs, _ = fs_for(out_dir)
    member_files: list[str] = []
    for members in cohorts:
        for m in members:
            _, mp = fs_for(_lean_path(out_dir, m.name))
            member_files += [
                i.path
                for i in fs.get_file_info(pafs.FileSelector(mp))
                if i.path.endswith(".parquet")
            ]
    member_files.sort()
    u = ray.data.read_parquet(
        member_files,
        filesystem=fs,
        columns=["subj", "s_kind", "obj", "graphs", "table_key"],
    ).map_batches(project, batch_format="pyarrow", batch_size=256_000)

    def fold(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        aggs = [
            pl.col("s_kind").first().alias("s_kind"),
            (pl.col("src") == 0).any().alias("__has_target__"),
        ]
        for i in range(kmax):
            aggs.append(pl.col("obj").filter(pl.col("src") == i).first().alias(f"obj__{i}"))
            aggs.append(pl.col("graphs").filter(pl.col("src") == i).first().alias(f"graphs__{i}"))
        return df.group_by(["cohort", "subj"]).agg(aggs).sort("subj").to_arrow()

    # ONE consuming pass: every task splits its folded batch into the per-cohort
    # merged slice + per-member leftover slices, writes each slice straight to its
    # destination directory, and returns only (cohort, kind, n) count rows. This
    # replaces materialize() + a count pass + O(cohorts x members) filtered write
    # jobs — at bench scale those fixed job costs dominated the whole merge stage,
    # and at 100 TB the wide intermediate never needs to sit in the object store.
    from ..util import fs_makedirs, fs_rmtree, fs_write_table

    # clear any partial output of a crashed prior attempt (the step re-enters
    # only when its manifest is absent), then rely on content-derived filenames
    # below for within-execution task-retry idempotency
    fs_rmtree(os.path.join(out_dir, "lean_merged"))
    dests: dict[tuple[int, int], str] = {}
    for ci, members in enumerate(cohorts):
        dests[(ci, 0)] = os.path.join(out_dir, "lean_merged", members[0].name)
        for i, m in enumerate(members[1:], start=1):
            dests[(ci, i)] = os.path.join(out_dir, "lean_merged", m.name + _LEFTOVER_SUFFIX)
    for d in dests.values():
        fs_makedirs(d)
    cohort_sizes = [len(c) for c in cohorts]

    def split_write(b: pa.Table) -> pa.Table:
        # deterministic per-block tag: a retried task re-processes the same
        # block and OVERWRITES its own files instead of appending duplicates.
        # Hashes the FULL subj + cohort columns (raw buffers, zero-copy) so
        # distinct blocks can't collide — no reliance on the shuffle keeping
        # cross-block subjects disjoint. Shared tested impl: fold.block_tag.
        from .fold import block_tag

        tag = block_tag(b, cols=("subj", "cohort"))
        rows = {"cohort": [], "kind": [], "n": []}
        for ci, k in enumerate(cohort_sizes):
            sub = b.filter(pc.equal(b["cohort"], ci))
            if sub.num_rows == 0:
                continue
            ht = sub["__has_target__"]
            merged = sub.filter(ht)
            if merged.num_rows:
                keep = (
                    ["subj", "s_kind"]
                    + [f"obj__{i}" for i in range(k)]
                    + [f"graphs__{i}" for i in range(k)]
                )
                # row count in the filename + 128k row groups: see fold.py
                # _write_census_fn (materialize packs chunks by rows)
                fs_write_table(
                    merged.select(keep),
                    os.path.join(dests[(ci, 0)], f"part-{tag}-r{merged.num_rows}.parquet"),
                    row_group_size=131072,
                )
            rows["cohort"].append(ci)
            rows["kind"].append(0)
            rows["n"].append(merged.num_rows)
            left = sub.filter(pc.invert(ht))
            for i in range(1, k):
                li = left.filter(pc.is_valid(left[f"obj__{i}"]))
                if li.num_rows:
                    out = pa.table(
                        {
                            "subj": li["subj"],
                            "s_kind": li["s_kind"],
                            "obj": li[f"obj__{i}"],
                            "graphs": li[f"graphs__{i}"],
                        }
                    )
                    fs_write_table(
                        out,
                        os.path.join(dests[(ci, i)], f"part-{tag}-r{li.num_rows}.parquet"),
                        row_group_size=131072,
                    )
                rows["cohort"].append(ci)
                rows["kind"].append(i)
                rows["n"].append(li.num_rows)
        return pa.table(
            {
                "cohort": pa.array(rows["cohort"], pa.int32()),
                "kind": pa.array(rows["kind"], pa.int32()),
                "n": pa.array(rows["n"], pa.int64()),
            }
        )

    # sort + per-block map, not map_groups (see stages/fold.py fold() note);
    # fold() groups by (cohort, subj) itself, and a subject's rows share a bucket
    wide = u.sort("bucket").map_batches(fold, batch_format="pyarrow", batch_size=None)
    agg: dict[tuple[int, int], int] = defaultdict(int)
    for r in wide.map_batches(split_write, batch_format="pyarrow").take_all():
        agg[(r["cohort"], r["kind"])] += r["n"]
    counts: dict[str, int] = {}
    for ci, members in enumerate(cohorts):
        counts[members[0].name] = agg.get((ci, 0), 0)
        for i, m in enumerate(members[1:], start=1):
            counts[m.name + _LEFTOVER_SUFFIX] = agg.get((ci, i), 0)
    return counts


def run_merge(
    out_dir: str,
    tables: list[TableSpec],
    graph_enum: list[str] | None = None,
    num_buckets: int = 64,
    overlap: dict[tuple[str, str], int] | None = None,
) -> list[TableSpec]:
    """Plan + execute merging; returns the post-merge table list (manifest state).

    One subject census over ALL candidate tables (bnode labels and IRIs cannot
    collide, so a single keyspace is safe), cohorts planned per subject kind,
    then one combined merge shuffle for every cohort. ``num_buckets`` must be
    >= cluster parallelism: the post-sort fold runs one task per bucket RANGE,
    so a low bucket count caps the exchange's reduce width.

    A5 uniqueness comes from the specs' ``subject_unique`` (censused exactly in
    the fold stage) when every spec carries it, and the J1 ``overlap`` probe
    result can be passed in precomputed (the pipeline folds it into the term
    -dictionary exchange — stages/dicts.py); direct callers with bare specs
    fall back to computing both here."""
    known = {t.name: t.subject_unique for t in tables if t.subject_unique is not None}
    if overlap is not None and len(known) == len(tables):
        uniqueness = known
    else:
        uniqueness, overlap = _subject_census(
            out_dir,
            tables,
            num_buckets=num_buckets,
            uniqueness=known if len(known) == len(tables) else None,
        )
    by_kind: dict[int, list[TableSpec]] = defaultdict(list)
    for t in tables:
        by_kind[t.subj_kind].append(t)
    cohorts: list[list[TableSpec]] = []
    for kind_tables in by_kind.values():
        cohorts.extend(plan_cohorts(kind_tables, uniqueness, overlap))
    out: list[TableSpec] = []
    merged_names: set[str] = set()
    if cohorts:
        counts = _build_all_merged(out_dir, cohorts, num_buckets=num_buckets, graph_enum=graph_enum)
        for members in cohorts:
            target = members[0]
            out.append(
                TableSpec(
                    name=target.name,
                    subj_kind=target.subj_kind,
                    subject_columns=target.subject_columns,
                    predicates=[pm for m in members for pm in m.predicates],
                    class_iri=target.class_iri,
                    row_count=counts[target.name],
                    path=os.path.join(out_dir, "lean_merged", target.name),
                    # unique by construction: the merge folds per subject
                    subject_unique=True,
                )
            )
            merged_names.update(m.name for m in members)
            for m in members[1:]:
                n_left = counts.get(m.name + _LEFTOVER_SUFFIX, 0)
                if n_left:
                    # unmatched rows stay behind under the original table name
                    out.append(
                        TableSpec(
                            name=m.name,
                            subj_kind=m.subj_kind,
                            subject_columns=m.subject_columns,
                            predicates=m.predicates,
                            class_iri=m.class_iri,
                            row_count=n_left,
                            path=os.path.join(out_dir, "lean_merged", m.name + _LEFTOVER_SUFFIX),
                            # subset of a gate-passing (unique-subject) table
                            subject_unique=True,
                        )
                    )
    for t in tables:
        if t.name not in merged_names:
            out.append(t)
    return out
