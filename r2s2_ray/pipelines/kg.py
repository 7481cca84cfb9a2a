"""The full KG-construction pipeline — the Ray-Data rebuild of the reference's
12-step checkpointed load (Loader.java:151-159, SURVEY.md §3.4).

Step map (each writes a manifest checkpoint; resume skips completed steps — parity
with the description-file contract, Loader.java:207-213):

  0 dicts        — predicate/graph/class/scheme/host censuses + the global sorted
                   term dictionary (replaces ParseIntoSOGTables step 0's
                   TemporaryIriIdMap side outputs + IntroduceGraphEnum/Scheme/Host
                   censuses, with content-ordered ids)
  1 fold         — extract -> link -> route (class cracking at route time) -> exact
                   dedup + graph fold -> ONE partitioned Parquet write keyed by
                   table_key (replaces ParseIntoSOGTables tables + RdfTypeSplitting +
                   ReintroduceRdfSetSemantics)
  2 stats        — distributed column censuses -> virtual/datatype/LCS/graph-list
                   decisions into the manifest (IntroduceVirtualColumns,
                   OptimizeForDatatype, OptimizeForLongestCommonSubstring)
  3 merge        — wide entity tables via subject-keyed outer merge
                   (TableMergingConcurence) [see stages/merge.py]
  4 materialize  — decompose + optimize + sort + write per table
  5 serve        — R2RML Turtle + DuckDB view DDL over the Parquet layout

Input scans: steps 0 and 1 each stream the transcripts once (extraction is an
embarrassingly parallel map; re-running it is cheaper at scale than persisting the
raw pre-dedup triple stream, which is ~40x the transcript bytes).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
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
from ..terms import KIND_IRI
from ..transcripts import read_transcripts
from ..stages import merge as merge_stage
from ..stages.dicts import build_term_dictionary, distinct_small, write_small_dict
from ..stages.fold import combo_string, fold, route, write_lean
from ..stages.materialize import materialize_table, table_lean_path
from ..stages.specs import spec_from_combo
from ..stages.stats import decide_columns, run_stats
from ..stages.materialize import decompose_lean


def triples_dataset(sf_dir: str, concurrency=None, replicate: int = 1) -> ray.data.Dataset:
    """transcripts -> extracted -> entity-linked lean triples (streaming)."""
    return canonicalize(
        extract_triples(read_transcripts(sf_dir, replicate=replicate), concurrency=concurrency)
    )


def _load_or_none(out_dir: str, step: int, stage: str, resume: bool):
    p = manifest_path(out_dir, step, stage)
    if resume and os.path.exists(p):
        return load_manifest(p)
    return None


def run_pipeline(
    sf_dir: str,
    out_dir: str,
    *,
    num_buckets: int = 32,
    resume: bool = True,
    with_terms_dict: bool = True,
    with_merge: bool = True,
    replicate: int = 1,
) -> Manifest:
    os.makedirs(out_dir, exist_ok=True)
    metrics: dict = {}

    # ---- step 0: censuses + dictionaries -------------------------------------
    m0 = _load_or_none(out_dir, 0, "dicts", resume)
    if m0 is None:
        with StageTimer(metrics, "step0_s"):
            tri = triples_dataset(sf_dir, replicate=replicate)

            def _census(t: pa.Table) -> pa.Table:
                """ONE pass emitting every small census as (cat, val) rows — the
                per-block pc.unique combiner is the anti-skew pre-aggregation."""
                from ..decompose import split_iri_arrays

                cats, vals = [], []

                def emit(cat: str, arr):
                    u = pc.drop_null(pc.unique(arr)).to_pylist()
                    cats.extend([cat] * len(u))
                    vals.extend(u)

                emit("combo", combo_string(t))
                emit("graph", t["graph"])
                objs = t.filter(pc.equal(t["o_kind"], KIND_IRI))["obj"]
                objs = objs.combine_chunks() if isinstance(objs, pa.ChunkedArray) else objs
                parts = split_iri_arrays(objs)
                emit("scheme", parts["scheme"])
                emit("host", parts["host"])
                return pa.table({"cat": pa.array(cats), "val": pa.array(vals, pa.string())})

            rows = (
                tri.map_batches(_census, batch_format="pyarrow")
                .groupby(["cat", "val"])
                .count()
                .take_all()
            )
            by_cat: dict[str, list[str]] = {}
            for r in rows:
                by_cat.setdefault(r["cat"], []).append(r["val"])
            combos = sorted(by_cat.get("combo", []))
            graphs = sorted(by_cat.get("graph", []))
            schemes = sorted(by_cat.get("scheme", []))
            hosts = sorted(by_cat.get("host", []))
            preds = sorted({c.split("\x1f")[0] for c in combos})
            classes = sorted({c.split("\x1f")[5] for c in combos if c.split("\x1f")[5]})
            dicts = {}
            write_small_dict(preds, os.path.join(out_dir, "dict", "predicates.parquet"))
            write_small_dict(graphs, os.path.join(out_dir, "dict", "graphs.parquet"))
            write_small_dict(classes, os.path.join(out_dir, "dict", "classes.parquet"))
            dicts = {
                "predicates": os.path.join(out_dir, "dict", "predicates.parquet"),
                "graphs": os.path.join(out_dir, "dict", "graphs.parquet"),
                "classes": os.path.join(out_dir, "dict", "classes.parquet"),
            }
            m0 = Manifest(
                stage="dicts",
                step=0,
                dictionaries=dicts,
                enums={"scheme": schemes, "host": hosts, "graph": graphs},
                lineage={"sf_dir": sf_dir, "combos": combos},
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m0)

    combos = m0.lineage["combos"]
    graphs = m0.enums["graph"]

    # ---- step 1: route + dedup/fold + partitioned write ----------------------
    m1 = _load_or_none(out_dir, 1, "fold", resume)
    if m1 is None:
        with StageTimer(metrics, "step1_s"):
            with StageTimer(metrics, "step1_fold_s"):
                tri = triples_dataset(sf_dir, replicate=replicate)
                routed = route(tri, combos, graphs)
                folded = fold(routed, num_buckets=num_buckets)
                write_lean(folded, os.path.join(out_dir, "lean"))
            tables = [spec_from_combo(c) for c in combos]
            import pyarrow.dataset as pads

            with StageTimer(metrics, "step1_counts_s"):
                for t in tables:
                    t.row_count = pads.dataset(table_lean_path(out_dir, t.name)).count_rows()
            dicts1 = dict(m0.dictionaries)
            if with_terms_dict:
                # the global term dictionary is the distinct union of subj/obj —
                # dedup preserves the term set, so build it from the just-written
                # lean store instead of a second extraction pass over the input
                with StageTimer(metrics, "step1_terms_s"):
                    tpath = os.path.join(out_dir, "dict", "terms")
                    lean = ray.data.read_parquet(
                        os.path.join(out_dir, "lean"), columns=["subj", "obj"]
                    )
                    metrics["n_terms"] = build_term_dictionary(lean, tpath)
                    dicts1["terms"] = tpath
            m1 = Manifest(
                stage="fold",
                step=1,
                tables=tables,
                dictionaries=dicts1,
                enums=m0.enums,
                lineage={"sf_dir": sf_dir, "num_buckets": num_buckets},
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m1)

    # ---- step 2: stats + optimizer decisions ---------------------------------
    m2 = _load_or_none(out_dir, 2, "stats", resume)
    if m2 is None:
        with StageTimer(metrics, "step2_s"):
            from ..stages.stats import run_stats_all

            specs = {t.name: t for t in m1.tables}
            all_stats = run_stats_all(os.path.join(out_dir, "lean"), specs, decompose_lean)
            for spec in m1.tables:
                col_stats, graph_stats = all_stats[spec.name]
                decide_columns(spec, col_stats, graph_stats)
            m2 = Manifest(
                stage="stats",
                step=2,
                tables=m1.tables,
                dictionaries=m1.dictionaries,
                enums=m1.enums,
                lineage=m1.lineage,
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m2)

    # ---- step 3: table merging ------------------------------------------------
    m3 = _load_or_none(out_dir, 3, "merge", resume)
    if m3 is None:
        with StageTimer(metrics, "step3_s"):
            if with_merge:
                tables = merge_stage.run_merge(out_dir, m2.tables)
            else:
                tables = m2.tables
            m3 = Manifest(
                stage="merge",
                step=3,
                tables=tables,
                dictionaries=m2.dictionaries,
                enums=m2.enums,
                lineage=m2.lineage,
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m3)

    # ---- step 4: materialize ---------------------------------------------------
    m4 = _load_or_none(out_dir, 4, "materialize", resume)
    if m4 is None:
        with StageTimer(metrics, "step4_s"):
            # per-table pipelines are independent; submit a few concurrently so
            # driver-side latency doesn't serialize (the cluster still arbitrates
            # CPU via the shared scheduler)
            from concurrent.futures import ThreadPoolExecutor

            def _mat(spec):
                materialize_table(out_dir, spec, m3.enums, lean_path=spec.path)
                spec.path = os.path.join(out_dir, "tables", spec.name)

            with ThreadPoolExecutor(max_workers=min(16, max(1, len(m3.tables)))) as pool:
                list(pool.map(_mat, m3.tables))
            m4 = Manifest(
                stage="materialize",
                step=4,
                tables=m3.tables,
                dictionaries=m3.dictionaries,
                enums=m3.enums,
                lineage=m3.lineage,
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m4)

    # ---- step 5: serving artifacts (R2RML + DuckDB views) ---------------------
    m5 = _load_or_none(out_dir, 5, "serve", resume)
    if m5 is None:
        with StageTimer(metrics, "step5_s"):
            from . import serve

            serve.write_views_sql(out_dir, m4)
            serve.write_r2rml(out_dir, m4)
            m5 = Manifest(
                stage="serve",
                step=5,
                tables=m4.tables,
                dictionaries=m4.dictionaries,
                enums=m4.enums,
                lineage=m4.lineage,
                metrics=dict(metrics),
            )
            save_manifest(out_dir, m5)
    return m5
