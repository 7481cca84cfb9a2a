"""Routing + RDF set-semantics dedup + per-graph list folding — the engine's main
all-to-all exchange.

Parity targets:
* Statement router / TargetKey  — LoadIntoTable.java:242-281 (vectorized here: the
  whole batch gets a ``table_key`` column; routing becomes a partitioned write, no
  locks — SURVEY.md §2.2 M3).
* Class cracking                — RdfTypeSplitting.java:36-154: rdf:type triples are
  routed STRAIGHT to their per-class table (``type_<class>``) instead of a post-hoc
  split; the class census (A2) runs first.
* Set-semantics dedup + fold    — ReintroduceRdfSetSemantics.java:25-149 (D1/A6/A7):
  duplicates collapse, graphs fold into a sorted distinct list per triple.

Shuffle design (north rule: "partitioning / shuffle / skew handled explicitly"):
dedup keys are full triple contents, so key cardinality ~= row cardinality and a naive
``groupby(key).map_groups`` would invoke Python once per distinct TRIPLE. Instead rows
are hash-bucketed (``bucket = hash(triple) % B``) and ``groupby("bucket")`` calls one
vectorized polars ``group_by`` per bucket. Content hashing distributes hot predicates
uniformly — a predicate with 10^9 identical-shaped rows still spreads over all B
buckets, which is the skew story the reference lacked (its per-predicate writer lock,
LoadIntoTable.java:60). B scales with cluster size; each bucket must fit one worker's
heap.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..naming import iri_to_sql_name_part
from ..terms import KIND_CODE, KIND_LITERAL, RDF_TYPE, TableKey

_SEP = "\x1f"

DEDUP_KEY = ["table_key", "subj", "s_kind", "pred", "obj", "o_kind", "o_lang", "o_dt"]


def combo_string(t: pa.Table) -> pa.Array:
    """Row-wise routing-combo string: (pred, s_kind, o_kind, lang, dt, class-obj).

    The class-obj component is only set for rdf:type rows (class cracking key)."""
    is_type = pc.equal(t["pred"], RDF_TYPE)
    cls = pc.if_else(is_type, t["obj"], pa.scalar("", pa.string()))
    return pc.binary_join_element_wise(
        t["pred"].combine_chunks() if isinstance(t["pred"], pa.ChunkedArray) else t["pred"],
        pc.cast(t["s_kind"], pa.string()),
        pc.cast(t["o_kind"], pa.string()),
        pc.coalesce(t["o_lang"], ""),
        pc.coalesce(t["o_dt"], ""),
        cls,
        _SEP,
    )


def combo_to_table_key(combo: str, namespaces=None) -> tuple[str, TableKey, str | None]:
    """Driver-side: combo string -> (table name/key, TableKey, class_iri)."""
    pred, s_kind, o_kind, lang, dt, cls = combo.split(_SEP)
    tk = TableKey(
        predicate=pred,
        subj_kind=int(s_kind),
        obj_kind=int(o_kind),
        lang=lang or None,
        datatype=dt or None,
    )
    if cls:
        # rdf:type + class -> its own table, named for the class
        # (RdfTypeSplitting.java:96-120 naming via the class IRI)
        name = "type_" + iri_to_sql_name_part(cls, namespaces)
        return name, tk, cls
    return tk.key_string(namespaces), tk, None


class RouteEncoder:
    """Adds ``table_key`` (string) + ``graph_id`` (int32) columns; drops ``graph``.

    Lookup tables are built once per actor from the (small) combo and graph
    dictionaries — broadcast, never shuffled."""

    def __init__(self, combos: list[str], graphs: list[str], namespaces=None):
        self.combo_arr = pa.array(combos, pa.string())
        self.key_arr = pa.array(
            [combo_to_table_key(c, namespaces)[0] for c in combos], pa.string()
        )
        self.graph_arr = pa.array(graphs, pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        combo = combo_string(t)
        kidx = pc.index_in(combo, value_set=self.combo_arr)
        table_key = pc.take(self.key_arr, kidx)
        gidx = pc.cast(pc.index_in(t["graph"], value_set=self.graph_arr), pa.int32())
        t = t.drop_columns(["graph"])
        t = t.append_column("table_key", table_key)
        return t.append_column("graph_id", gidx)


def route(
    triples: ray.data.Dataset,
    combos: list[str],
    graphs: list[str],
    namespaces=None,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """Stateless tasks by default: the combo/graph lookup arrays are dictionary
    -sized, so shipping the prepared encoder per task beats actor-pool spin-up.
    Use the actor pool when the graph dictionary is large enough to matter."""
    if not use_actors:
        return triples.map_batches(
            RouteEncoder(combos, graphs, namespaces), batch_format="pyarrow"
        )
    return triples.map_batches(
        RouteEncoder,
        fn_constructor_args=(combos, graphs, namespaces),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _add_bucket(num_buckets: int):
    def fn(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        b = (
            df.select(
                pl.concat_str(
                    [
                        pl.col("table_key"),
                        pl.col("subj"),
                        pl.col("obj"),
                        pl.col("o_lang").fill_null(""),
                        pl.col("o_dt").fill_null(""),
                    ],
                    separator=_SEP,
                )
                .hash(seed=42)
                .mod(num_buckets)
                .cast(pl.Int32)
                .alias("bucket")
            )
        )["bucket"]
        return t.append_column("bucket", b.to_arrow())

    return fn


def _fold_bucket(t: pa.Table) -> pa.Table:
    """Vectorized per-bucket fold: exact dedup + sorted distinct graph list.

    (ReintroduceRdfSetSemantics.java:71-109 — DISTINCT + LIST(DISTINCT graph) with
    ORDER BY on the non-graph columns.)"""
    df = pl.from_arrow(t)
    out = (
        df.group_by(DEDUP_KEY)
        .agg(pl.col("graph_id").unique().sort().alias("graphs"))
        .sort(["subj", "obj"])
    )
    return out.to_arrow()


def fold(
    routed: ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Dedup + graph-fold. Output columns: DEDUP_KEY + ``graphs`` (list<int32>)."""
    with_bucket = routed.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
    return with_bucket.groupby("bucket").map_groups(_fold_bucket, batch_format="pyarrow")


def write_lean(folded: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned write keyed by table_key — ONE write for every logical table
    (avoids O(tables) driver-side pipelines; SURVEY.md §4 consequence 2)."""
    folded.write_parquet(out_dir, partition_cols=["table_key"])
