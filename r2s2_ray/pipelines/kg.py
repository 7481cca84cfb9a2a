"""The full KG-construction pipeline — the Ray-Data rebuild of the reference's
12-step checkpointed load (Loader.java:151-159, SURVEY.md §3.4).

Step map (each writes a manifest checkpoint; resume skips completed steps — parity
with the description-file contract, Loader.java:207-213):

  0 fold         — extract -> link -> route (table-key computed per batch, class
                   cracking at route time; no census pass needed) -> exact dedup +
                   graph fold -> ONE partitioned Parquet write keyed by table_key
                   (replaces ParseIntoSOGTables tables + RdfTypeSplitting +
                   ReintroduceRdfSetSemantics). Afterwards the combo/graph
                   dictionaries, predicate/class dicts and the global sorted term
                   dictionary are derived from the LEAN STORE with column-pruned
                   bundled scans — the input transcripts are read exactly ONCE in
                   the whole pipeline (vs the reference re-reading tables once per
                   optimizer).
  1 stats        — distributed column censuses -> virtual/datatype/LCS/graph-list
                   decisions + the scheme/host enum domains into the manifest
                   (IntroduceVirtualColumns, OptimizeForDatatype,
                   OptimizeForLongestCommonSubstring, IntroduceIriSchemeEnum/
                   IntroduceHostEnums censuses — all in the same pass)
  2 merge        — wide entity tables via subject-keyed outer merge
                   (TableMergingConcurence) [see stages/merge.py]
  3 materialize  — decompose + optimize + sort + write per table
  4 serve        — R2RML Turtle + DuckDB view DDL over the Parquet layout
"""

from __future__ import annotations

import os


import pyarrow as pa

import ray.data

from ..extract.batch import extract_triples
from ..linking import canonicalize
from ..state.manifest import (
    Manifest,
    StageTimer,
    load_manifest,
    manifest_path,
    save_manifest,
)

from ..transcripts import read_transcripts
from ..stages import merge as merge_stage
from ..stages.dicts import build_term_dictionary, write_small_dict
from ..stages.fold import fold_write_census, route
from ..stages.specs import spec_from_combo
from ..stages.stats import decide_columns


def triples_dataset(sf_dir: str, concurrency=None, replicate: int = 1) -> ray.data.Dataset:
    """transcripts -> extracted -> entity-linked lean triples (streaming)."""
    return canonicalize(
        extract_triples(read_transcripts(sf_dir, replicate=replicate), concurrency=concurrency)
    )


def _input_inventory(sf_dir: str) -> list[dict]:
    """Per-partition lineage record: every input parquet file with size and
    mtime (one fs listing, no footer reads — O(files) metadata only)."""
    from pyarrow import fs as pafs

    from ..util import fs_for

    fs, path = fs_for(f"{sf_dir}/documents.parquet")
    info = fs.get_file_info(path)
    if info.type == pafs.FileType.Directory:
        infos = [
            i
            for i in fs.get_file_info(pafs.FileSelector(path))
            if i.path.endswith(".parquet")
        ]
    else:
        infos = [info]
    return [
        {
            "path": i.path,
            "bytes": i.size,
            "mtime": i.mtime.isoformat() if i.mtime else None,
        }
        for i in sorted(infos, key=lambda i: i.path)
    ]


def _census_path(out_dir: str) -> str:
    # lives OUTSIDE the lean dir so lean-store scans never pick it up as data
    return os.path.join(out_dir, "_manifest", "census.parquet")


def _write_census(rows: list[dict], path: str) -> None:
    from ..util import fs_makedirs, fs_write_table

    fs_makedirs(os.path.dirname(path))
    fs_write_table(
        pa.table(
            {
                "kind": pa.array([r["kind"] for r in rows], pa.int8()),
                "table": pa.array([r["table"] for r in rows], pa.string()),
                "column": pa.array([r["column"] for r in rows], pa.string()),
                "blob": pa.array([r["blob"] for r in rows], pa.binary()),
            }
        ),
        path,
    )


def _read_census(path: str) -> list[dict]:
    from ..util import fs_read_table

    return fs_read_table(path).to_pylist()


def _load_or_none(out_dir: str, step: int, stage: str, resume: bool):
    from ..util import fs_exists

    p = manifest_path(out_dir, step, stage)
    if resume and fs_exists(p):
        return load_manifest(p)
    return None


#: term-dictionary bucket count — a DATA-layout constant, decoupled from the
#: fold exchange's ``num_buckets`` (which scales with data/cluster): every fold
#: reducer writes one fragment file per term bucket, so a width- or data-
#: -derived count multiplies tiny-file writes across all reducers (measured:
#: 128 buckets x 64 reducers = 8192 fragment writes added ~15s to the 8-cpu
#: fold leg). 32 buckets bound the per-reducer spill fan-out while keeping the
#: compaction one task per bucket; raise explicitly for term universes beyond
#: ~10^9 where per-bucket sort memory becomes the binding constraint.
TERM_BUCKETS = 32

#: input bytes of transcript parquet per fold bucket when the caller does not
#: size the exchange: parquet transcripts expand ~10x into in-flight triple
#: rows, so 32 MiB of input keeps a bucket's sorted block comfortably inside a
#: worker heap (~0.5 GB) while leaving enough buckets for full reduce width.
_INPUT_BYTES_PER_BUCKET = 32 << 20


def default_num_buckets(sf_dir: str, replicate: int = 1, min_buckets: int = 16) -> int:
    """DATA-derived fold bucket count: total input bytes / 32 MiB, floored.

    A fixed constant is wrong in both directions at scale — too few buckets
    overflow worker heaps (a bucket's rows form ONE sorted block) and cap
    reduce width; too many fragment the lean store. Deriving from the input
    volume keeps the per-bucket block size roughly constant from test fixtures
    to 100 TB, and stays CLUSTER-WIDTH-independent so the N-vs-4N comparison
    runs the identical plan (see BASELINE.md)."""
    total = sum(i["bytes"] for i in _input_inventory(sf_dir)) * max(1, replicate)
    return max(min_buckets, -(-total // _INPUT_BYTES_PER_BUCKET))


def run_pipeline(
    sf_dir: str,
    out_dir: str,
    *,
    num_buckets: int | None = None,
    resume: bool = True,
    with_terms_dict: bool = True,
    with_merge: bool = True,
    replicate: int = 1,
    stop_after: int | None = None,
) -> Manifest:
    from ..util import fs_makedirs

    fs_makedirs(out_dir)
    metrics: dict = {}
    if stop_after is not None and stop_after < 0:
        raise ValueError("stop_after must be >= 0")
    if num_buckets is None:
        num_buckets = default_num_buckets(sf_dir, replicate)

    # ---- step 0: route + dedup/fold + partitioned write + dictionaries -------
    terms_frag_dir = os.path.join(out_dir, "dict", "terms_frags")
    m1 = _load_or_none(out_dir, 0, "fold", resume)
    if m1 is not None:
        from ..util import fs_exists

        if not fs_exists(_census_path(out_dir)):
            # a store checkpointed before the fused-census change (or whose
            # _manifest dir was pruned) has a step-0 manifest but no census
            # rows; step 1 cannot rebuild them from metadata, so step 0 is
            # INCOMPLETE by this version's contract — re-run it (the fold
            # write clears and regenerates the lean dir idempotently)
            m1 = None
    if m1 is None:
        with StageTimer(metrics, "step0_s"):
            with StageTimer(metrics, "step0_fold_s"):
                tri = triples_dataset(sf_dir, replicate=replicate)
                routed = route(tri)
                # fold exchange + partitioned lean write + the FULL step-1
                # census in ONE job: the reducers direct-write each table's
                # slice and return only metadata-scale census rows (no second
                # scan of the data, no separate census job launch). The term
                # -dictionary map side rides the same reducers as per-bucket
                # fragment spills — step 1 compacts them without re-reading
                # the lean store or paying a second sort exchange.
                census = fold_write_census(
                    routed,
                    os.path.join(out_dir, "lean"),
                    num_buckets=num_buckets,
                    terms_frag_dir=terms_frag_dir if with_terms_dict else None,
                    num_term_buckets=TERM_BUCKETS,
                )
                _write_census(census, _census_path(out_dir))

            m1 = Manifest(
                stage="fold",
                step=0,
                tables=[],  # table specs are censused in step 1's fused scan
                dictionaries={},
                enums={},
                lineage={
                    "sf_dir": sf_dir,
                    "num_buckets": num_buckets,
                    "replicate": replicate,
                    # per-partition input inventory (north rule: per-partition
                    # lineage): exactly which input files, at which size/mtime,
                    # produced this lean store — a resumed or audited run can
                    # detect input drift before trusting the checkpoints
                    "input_partitions": _input_inventory(sf_dir),
                },
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m1)

    if stop_after == 0:
        return m1
    # ---- step 1: term dictionary + optimizer decisions ------------------------
    # The census itself (table/combo census with the sql-name-collision check,
    # per-table row counts, graph domain, column stats, A5 subject uniqueness)
    # was computed INSIDE step 0's fold reducers and persisted as metadata-scale
    # rows — this step is the term-dictionary exchange plus driver-side
    # decisions over those rows; no data scan.
    m2 = _load_or_none(out_dir, 1, "stats", resume)
    if m2 is None:
        with StageTimer(metrics, "step1_s"):

            from ..naming import DEFAULT_NAMESPACES, discover_namespaces
            from ..stages.stats import parse_census_rows
            from ..util import read_parquet_dir

            with StageTimer(metrics, "step1_census_parse_s"):
                all_stats, by_key, graphs, counts, subj_unique = parse_census_rows(
                    _read_census(_census_path(out_dir))
                )
            # J1 probe candidates: A5-passing tables (exact census, step 0) —
            # the overlap probe rides the term-dictionary exchange below, so
            # the merge step needs no probe job of its own
            candidates = sorted(name for name, u in subj_unique.items() if u)
            n_terms = None
            overlap = None
            if with_terms_dict:
                with StageTimer(metrics, "step1_terms_s"):
                    from ..util import fs_exists

                    tpath = os.path.join(out_dir, "dict", "terms")
                    if fs_exists(terms_frag_dir):
                        # normal path: compact the fragments step 0 spilled
                        from ..stages.dicts import compact_term_fragments

                        n_terms, overlap = compact_term_fragments(
                            terms_frag_dir,
                            tpath,
                            num_buckets=TERM_BUCKETS,
                            probe_tables=candidates or None,
                        )
                    else:
                        # resume from a store that predates the fused spill
                        # (or whose fragments were already consumed): rebuild
                        # from the lean store with the standalone exchange
                        cols = ["subj", "obj"] + (["table_key"] if candidates else [])
                        lean = read_parquet_dir(
                            os.path.join(out_dir, "lean"), columns=cols
                        )
                        n_terms, overlap = build_term_dictionary(
                            lean,
                            tpath,
                            num_buckets=TERM_BUCKETS,
                            probe_tables=candidates or None,
                        )
            clashes = {k: v for k, v in by_key.items() if len(v) > 1}
            if clashes:
                raise ValueError(
                    "table-key collision: multiple routing combos share a "
                    f"mangled sql name: {sorted(clashes)[:5]}"
                )
            combos = sorted(next(iter(v)) for v in by_key.values())
            preds = sorted({c.split("\x1f")[0] for c in combos})
            classes = sorted({c.split("\x1f")[5] for c in combos if c.split("\x1f")[5]})
            # M7 namespace accumulation: discovered from the censused vocabulary
            # and persisted like the reference's namespaces table
            # (ParseIntoSOGTables.java:349-351, 455-470)
            namespaces = discover_namespaces(preds + classes + graphs, DEFAULT_NAMESPACES)
            write_small_dict(preds, os.path.join(out_dir, "dict", "predicates.parquet"))
            write_small_dict(graphs, os.path.join(out_dir, "dict", "graphs.parquet"))
            write_small_dict(classes, os.path.join(out_dir, "dict", "classes.parquet"))
            import pyarrow.parquet as _pq

            _pq.write_table(
                pa.table(
                    {
                        "prefix": pa.array(sorted(namespaces), pa.string()),
                        "namespace": pa.array(
                            [namespaces[k] for k in sorted(namespaces)], pa.string()
                        ),
                    }
                ),
                os.path.join(out_dir, "dict", "namespaces.parquet"),
            )
            dicts = {
                **m1.dictionaries,
                "predicates": os.path.join(out_dir, "dict", "predicates.parquet"),
                "graphs": os.path.join(out_dir, "dict", "graphs.parquet"),
                "classes": os.path.join(out_dir, "dict", "classes.parquet"),
                "namespaces": os.path.join(out_dir, "dict", "namespaces.parquet"),
            }
            if n_terms is not None:
                metrics["n_terms"] = n_terms
                dicts["terms"] = os.path.join(out_dir, "dict", "terms")
            tables = [spec_from_combo(c) for c in combos]
            schemes: set[str] = set()
            hosts: set[str] = set()
            for spec in tables:
                spec.row_count = counts.get(spec.name, 0)
                # A5 gate input for merge + T10 unique-index manifest record
                # (IntroduceIndexes.java:22-46 semantics)
                spec.subject_unique = subj_unique.get(spec.name)
                col_stats, graph_stats = all_stats[spec.name]
                decide_columns(spec, col_stats, graph_stats)
                for name, st in col_stats.items():
                    dom = getattr(st, "domain", None)
                    if dom is None or not name.startswith("object_"):
                        continue  # subject-side columns stay TEXT (reference parity)
                    if name.endswith("_scheme"):
                        schemes |= {v for v in dom if v is not None}
                    elif name.endswith("_host"):
                        hosts |= {v for v in dom if v is not None}
            lineage = {**m1.lineage, "combos": combos, "namespaces": namespaces}
            if overlap is not None:
                # J1 probe result (computed on the terms exchange) for step 2;
                # JSON-safe key encoding
                lineage["subject_overlap"] = {
                    "\x1f".join(k): v for k, v in overlap.items()
                }
            m2 = Manifest(
                stage="stats",
                step=1,
                tables=tables,
                dictionaries=dicts,
                enums={"graph": graphs, "scheme": sorted(schemes), "host": sorted(hosts)},
                lineage=lineage,
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m2)

    if stop_after == 1:
        return m2
    # ---- step 2: table merging ------------------------------------------------
    m3 = _load_or_none(out_dir, 2, "merge", resume)
    if m3 is None:
        with StageTimer(metrics, "step2_s"):
            if with_merge:
                raw_ov = m2.lineage.get("subject_overlap")
                overlap = (
                    {tuple(k.split("\x1f")): v for k, v in raw_ov.items()}
                    if raw_ov is not None
                    else None
                )
                tables = merge_stage.run_merge(
                    out_dir,
                    m2.tables,
                    graph_enum=m2.enums.get("graph"),
                    num_buckets=num_buckets,
                    overlap=overlap,
                )
            else:
                tables = m2.tables
            m3 = Manifest(
                stage="merge",
                step=2,
                tables=tables,
                dictionaries=m2.dictionaries,
                enums=m2.enums,
                lineage=m2.lineage,
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m3)

    if stop_after == 2:
        return m3
    # ---- step 3: materialize ---------------------------------------------------
    m4 = _load_or_none(out_dir, 3, "materialize", resume)
    if m4 is None:
        with StageTimer(metrics, "step3_s"):
            # ONE Ray job over bin-packed per-file chunks of every table (the
            # per-table-job ThreadPool variant anti-scaled: N concurrent
            # streaming executors contend on the driver GIL). Doubles as the
            # final compaction pass (T11): output file count is bounded by
            # ceil(rows / target_rows) per table.
            from ..stages.materialize import materialize_all

            materialize_all(out_dir, m3.tables, m3.enums)
            m4 = Manifest(
                stage="materialize",
                step=3,
                tables=m3.tables,
                dictionaries=m3.dictionaries,
                enums=m3.enums,
                lineage=m3.lineage,
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m4)

    if stop_after == 3:
        return m4
    # ---- step 4: serving artifacts (R2RML + DuckDB views) ---------------------
    m5 = _load_or_none(out_dir, 4, "serve", resume)
    if m5 is not None:
        # the serving artifacts are pure derivations of the manifest (~ms to
        # emit) — rewrite them on resume so an out-dir built by an older
        # binary always serves with the current view schema
        from . import serve

        serve.write_views_sql(out_dir, m5)
        serve.write_r2rml(out_dir, m5)
        serve.write_capabilities(out_dir)
    if m5 is None:
        with StageTimer(metrics, "step4_s"):
            from . import serve

            serve.write_views_sql(out_dir, m4)
            serve.write_r2rml(out_dir, m4)
            serve.write_capabilities(out_dir)
        # manifest built AFTER the timer exits so its own duration is recorded
        m5 = Manifest(
            stage="serve",
            step=4,
            tables=m4.tables,
            dictionaries=m4.dictionaries,
            enums=m4.enums,
            lineage=m4.lineage,
            metrics=dict(metrics),
        )
        save_manifest(out_dir, m5)
    return m5


_STAGE_NAMES = {0: "fold", 1: "stats", 2: "merge", 3: "materialize", 4: "serve"}


def run_step(sf_dir: str, out_dir: str, step: int, **kw) -> Manifest:
    """Re-run exactly ONE step (parity: the reference CLI's step argument,
    Loader.java:106-121): earlier steps are loaded from their manifests (they
    must exist), this step's manifest is cleared so it re-executes, and the run
    stops before the next step. Later steps' manifests are also cleared — their
    inputs just changed, so keeping them would serve stale state on resume."""
    from ..util import fs_exists, fs_remove

    for s in range(step, 5):
        p = manifest_path(out_dir, s, _STAGE_NAMES[s])
        if fs_exists(p):
            fs_remove(p)
    return run_pipeline(sf_dir, out_dir, resume=True, stop_after=step, **kw)


def _main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="KG-construction pipeline (steps: 0 fold, 1 stats, 2 merge, "
        "3 materialize, 4 serve)"
    )
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--step", type=int, default=None, help="re-run exactly this step")
    ap.add_argument(
        "--num-buckets",
        type=int,
        default=None,
        help="fold exchange bucket count (default: derived from input bytes)",
    )
    ap.add_argument("--fresh", action="store_true", help="ignore existing manifests")
    args = ap.parse_args()
    import ray

    if not ray.is_initialized():  # the driver contract owns the session otherwise
        # under `ray job submit` RAY_ADDRESS points at the cluster; forcing
        # "local" there would boot a fresh single-node Ray INSIDE the job and
        # silently ignore the cluster. Sandbox presets RAY_ADDRESS=local.
        import os as _os

        ray.init(
            address=_os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        if args.step is not None:
            m = run_step(args.sf_dir, args.out_dir, args.step, num_buckets=args.num_buckets)
        else:
            m = run_pipeline(
                args.sf_dir, args.out_dir, num_buckets=args.num_buckets, resume=not args.fresh
            )
        print({t.name: t.row_count for t in m.tables})
    finally:
        ray.shutdown()


if __name__ == "__main__":
    _main()
