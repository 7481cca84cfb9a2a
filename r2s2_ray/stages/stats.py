"""Distributed column-stats pass + optimizer decisions.

One streaming pass per table over its lean partition computes, per decomposed
physical column, an associative partial-stat row per block; the driver folds the
tiny residue and decides:

* virtual single-value columns  — IntroduceVirtualColumns.java:21-76 (T2):
  <=1 distinct value (nulls count as a value, mirroring SQL DISTINCT) -> column
  dropped, constant recorded. The "last column" edge (all-virtual table,
  IntroduceVirtualColumns.java:66-74) is represented as a table with row_count>0
  and zero physical columns.
* datatype narrowing            — OptimizeForDatatype.java:27-147 (T3/T4): literal
  columns promoted per their DECLARED xsd datatype when every value parses
  round-trip-safely; IRI ``port`` always INTEGER; ``path``/``query``/``fragment``
  INTEGER only when every value round-trips without leading zeros
  (OptimizeForDatatype.java:65-93). Deviation: we require round-trip-safe lexicals
  (no leading zeros) even for declared ints, so reconstruction is lossless — the
  reference's SQL CAST would accept "007" and emit "7".
* longest-common-prefix         — OptimizeForLongestCommonSubstring.java:23-100 (T5):
  per-block fold of (min, max) -> global LCP (LCP of a set = LCP(min,max), an O(1)
  merge); nulls skipped, any zero-length value or empty LCP aborts
  (OptimizeForLongestCommonSubstring.java:70-81 parity).
* graph-list flattening         — ReintroduceRdfSetSemantics.java:111-141 (A6): if no
  (s,o) pair lives in >1 graph, the graphs list collapses to a scalar id column.

The per-block stat row is tiny (a few hundred bytes x columns x blocks), so the
driver fold is metadata-scale even at 10^12 rows.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state.manifest import ColumnSpec, TableSpec
from ..terms import (
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_GYEAR,
    XSD_INT,
    XSD_INTEGER,
    XSD_LONG,
    XSD_STRING,
)

#: declared xsd datatype -> (logical SQL datatype, all-values predicate kind)
_DT_RULES: dict[str, tuple[str, str]] = {
    XSD_INT: ("INTEGER", "int32"),
    XSD_INTEGER: ("BIGINT", "int"),
    XSD_LONG: ("BIGINT", "int"),
    XSD_DECIMAL: ("DOUBLE", "float"),
    XSD_DOUBLE: ("DOUBLE", "float"),
    XSD_FLOAT: ("FLOAT", "float"),
    XSD_BOOLEAN: ("BOOLEAN", "bool"),
    XSD_DATE: ("DATE", "date"),
    XSD_DATETIME: ("TIMESTAMP", "datetime"),
    XSD_GYEAR: ("GYEAR", "gyear"),
}

_INT_RE = r"^(0|-?[1-9][0-9]*)$"
_FLOAT_RE = r"^-?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][-+]?[0-9]+)?$"
_DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
_DATETIME_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}$"
_GYEAR_RE = r"^-?[0-9]{4}$"
_BOOL_RE = r"^(true|false)$"

_PRED_RE = {
    "int": _INT_RE,
    "int32": _INT_RE,
    "float": _FLOAT_RE,
    "bool": _BOOL_RE,
    "date": _DATE_RE,
    "datetime": _DATETIME_RE,
    "gyear": _GYEAR_RE,
}

#: the regex is a lexical-SHAPE check; Arrow's cast is the ground truth the
#: materialize stage will apply, and it rejects values the shape accepts
#: (30-digit "integers", 2023-02-30 calendar impossibilities, int32 overflow)
#: — a narrowing decision must never crash step 3, so each predicate is
#: additionally confirmed with the actual cast on the block's values
_PRED_CAST = {
    "int": pa.int64(),
    "int32": pa.int32(),
    "float": pa.float64(),
    "date": pa.date32(),
    "datetime": pa.timestamp("us"),
}


@dataclass
class ColStats:
    """Associative partial stats for one column (mergeable across blocks)."""

    n: int = 0
    nulls: int = 0
    distinct: set = field(default_factory=set)  # capped at 3 (we only need <=1 / ==2)
    minv: str | None = None
    maxv: str | None = None
    has_empty: bool = False
    pred_ok: dict[str, bool] = field(default_factory=dict)  # predicate kind -> all-match
    #: FULL distinct set — only collected for bounded-domain enum columns
    #: (scheme/host; IntroduceIriSchemeEnum/IntroduceHostEnums censuses, A3)
    domain: set | None = None

    def merge(self, o: "ColStats") -> "ColStats":
        self.n += o.n
        self.nulls += o.nulls
        self.distinct |= o.distinct
        while len(self.distinct) > 3:
            self.distinct.pop()
        if self.domain is not None or o.domain is not None:
            self.domain = (self.domain or set()) | (o.domain or set())
        self.minv = min(x for x in (self.minv, o.minv) if x is not None) if (self.minv or o.minv) else None
        self.maxv = max(x for x in (self.maxv, o.maxv) if x is not None) if (self.maxv or o.maxv) else None
        self.has_empty |= o.has_empty
        for k, v in o.pred_ok.items():
            self.pred_ok[k] = self.pred_ok.get(k, True) and v
        return self


def block_col_stats(col: pa.Array, preds: list[str], collect_domain: bool = False) -> ColStats:
    s = ColStats(n=len(col), nulls=col.null_count)
    nn = pc.drop_null(col)
    if not pa.types.is_string(nn.type) and not pa.types.is_large_string(nn.type):
        nn = pc.cast(nn, pa.string())
    u = pc.unique(nn)
    if collect_domain:
        s.domain = set(u.to_pylist())
    cap = u.slice(0, 3).to_pylist()
    s.distinct = set(cap)
    if col.null_count:
        s.distinct.add(None)
    if len(nn):
        s.minv = pc.min(nn).as_py()
        s.maxv = pc.max(nn).as_py()
        s.has_empty = bool(pc.any(pc.equal(nn, "")).as_py())
        for p in preds:
            ok = bool(pc.all(pc.match_substring_regex(nn, _PRED_RE[p])).as_py())
            if ok and p in _PRED_CAST:
                try:
                    pc.cast(nn, _PRED_CAST[p])
                except pa.ArrowInvalid:
                    ok = False
            if ok and p == "gyear":
                # the GYEAR encoding is a dictionary over the reference's FIXED
                # domain -5999..2999 (OptimizeForDatatype.java:27-50); a year
                # outside it would force a per-chunk observed-value dictionary
                # that diverges between files — reject the narrowing instead
                yrs = pc.cast(nn, pa.int64())
                ok = pc.min(yrs).as_py() >= -5999 and pc.max(yrs).as_py() <= 2999
            s.pred_ok[p] = ok
    return s


def _common_prefix(a: str, b: str) -> str:
    i = 0
    m = min(len(a), len(b))
    while i < m and a[i] == b[i]:
        i += 1
    return a[:i]


def decide_columns(spec: TableSpec, stats: dict[str, ColStats], graph_stats: dict) -> None:
    """Mutates ``spec`` in place with virtual / datatype / LCS decisions.

    Optimizer order matches OptimizeForR2RML.java:26-28: virtual -> datatype -> LCS
    (set-semantics dedup already ran in the fold stage)."""
    dt_cols: dict[str, tuple[str, str]] = {}
    for pm in spec.predicates:
        if pm.datatype in _DT_RULES:
            logical, predkind = _DT_RULES[pm.datatype]
            for c in pm.object_columns:
                if c.name.endswith("_litvalue"):
                    dt_cols[c.name] = (logical, predkind)
    for c in spec.all_columns():
        st = stats.get(c.name)
        if st is None:
            continue
        c.nullable = st.nulls > 0
        # T2 virtual: 0 or 1 distinct value (None = all-null column)
        vals = st.distinct
        if len(vals) <= 1:
            c.physical = False
            c.virtual_value = next(iter(vals), None)
            continue
        # T3: declared-datatype narrowing on litvalue columns
        if c.name in dt_cols:
            logical, predkind = dt_cols[c.name]
            if st.nulls == 0 and st.pred_ok.get(predkind, False):
                c.datatype = logical
                continue
        # T4: IRI part narrowing (port guarded: an adversarial IRI can carry a
        # port lexeme that overflows int32, and the decision must not crash
        # the materialize cast)
        if c.name.endswith("_port"):
            if st.pred_ok.get("int32", False):
                c.datatype = "INTEGER"
            continue
        if c.name.rsplit("_", 1)[-1] in ("path", "query", "fragment") and st.pred_ok.get("int", False) and st.nulls < st.n:
            c.datatype = "BIGINT"
            continue
        # T5 LCS on remaining TEXT columns
        if c.datatype == "TEXT" and st.minv is not None and not st.has_empty:
            lcp = _common_prefix(st.minv, st.maxv)
            if lcp:
                c.lcs_prefix = lcp
    # graph-list flattening per predicate map
    for pm in spec.predicates:
        g = graph_stats.get(pm.graph_column or "", {})
        pm.graph_is_list = bool(g.get("max_len", 1) > 1)


def _emit_stats_rows(cols: dict, graphs_cols: dict, prefix: str, rows: dict) -> None:
    import pickle

    for name, arr in cols.items():
        base = name.rsplit("_", 1)[-1]
        if name.endswith("_litvalue"):
            preds = list(_PRED_RE)
        elif base in ("path", "query", "fragment"):
            preds = ["int"]  # BIGINT narrowing candidates (decide_columns T4)
        elif base == "port":
            preds = ["int32"]  # INTEGER decision gate
        else:
            preds = []  # bnode id columns are already integers — no regex pass
        # enum censuses (A3) ride the same pass: object-side scheme/host domains
        collect = name.startswith("object_") and base in ("scheme", "host")
        st = block_col_stats(arr, preds, collect_domain=collect)
        rows["table"].append(prefix)
        rows["column"].append(name)
        rows["blob"].append(pickle.dumps(st))
    for gname, glist in graphs_cols.items():
        max_len = pc.max(pc.list_value_length(glist)).as_py() or 0
        rows["table"].append(prefix)
        rows["column"].append("\x00graph\x00" + gname)
        rows["blob"].append(pickle.dumps({"max_len": max_len}))


def census_block_rows(batch: pa.Table, spec_factory, decompose_factory, memo: dict) -> pa.Table:
    """Per-BLOCK census emitter computing EVERYTHING step 1 needs from one folded
    block: per-table column stats (kind 0), the (table_key, combo) census with
    the sql-name-collision check input (kind 1), the graph-IRI domain (kind 2),
    per-table row counts (kind 3), and the A5 subject-uniqueness partial
    (kind 4) — fused into the fold stage's reducer so the data is scanned ONCE
    in the whole pipeline (a separate census job costs a full re-read of the
    lean store plus fixed Ray-job overhead; at 100 TB that is a wasted pass).

    The uniqueness partial is EXACT, not sampled: the fold exchange buckets by
    (combo-major, subject-minor) hash, so every row of a given (table, subject)
    pair lands in this one block — a per-block duplicate check ORs into the
    global answer (TableMergingConcurence.java:46-268 gate A5).

    A batch's spec is derived on the worker from its own ``combo`` column via
    ``spec_factory`` (memoized per process in ``memo``) — no driver round-trip
    needed before the scan."""
    import pickle

    rows: dict = {"kind": [], "table": [], "column": [], "blob": []}

    def emit(kind: int, table: str, column: str, blob: bytes) -> None:
        rows["kind"].append(kind)
        rows["table"].append(table)
        rows["column"].append(column)
        rows["blob"].append(blob)

    keys = pc.drop_null(pc.unique(batch["table_key"])).to_pylist()
    for k in keys:
        k = str(k)
        sub = batch.filter(pc.equal(batch["table_key"], k)) if len(keys) > 1 else batch
        combos = [str(c) for c in pc.unique(sub["combo"]).to_pylist()]
        for cb in combos:
            emit(1, k, cb, b"")
        emit(3, k, "", pickle.dumps(sub.num_rows))
        # A5 partial: folded rows are unique on (combo, subj, obj), so a
        # repeated subject here means >1 object row for it in this table
        has_dup = pc.count_distinct(sub["subj"]).as_py() < sub.num_rows
        emit(4, k, "", pickle.dumps(bool(has_dup)))
        spec = memo.get(combos[0])
        if spec is None:
            spec = memo[combos[0]] = spec_factory(combos[0])
        cols, gcols = decompose_factory(spec)(sub)
        srows: dict = {"table": [], "column": [], "blob": []}
        _emit_stats_rows(cols, gcols, k, srows)
        for t, c, b in zip(srows["table"], srows["column"], srows["blob"]):
            emit(0, t, c, b)
    g = pc.drop_null(pc.unique(pc.list_flatten(batch["graphs"])))
    for gv in g.to_pylist():
        emit(2, "", str(gv), b"")
    return pa.table(
        {
            "kind": pa.array(rows["kind"], pa.int8()),
            "table": pa.array(rows["table"], pa.string()),
            "column": pa.array(rows["column"], pa.string()),
            "blob": pa.array(rows["blob"], pa.binary()),
        }
    )


def parse_census_rows(parts):
    """Driver-side fold of the tiny per-block census rows. Returns
    (stats: {table: (col_stats, graph_stats)}, combos_by_key, graphs,
    row_counts, subject_unique: {table: bool})."""
    import pickle

    stats: dict[str, tuple[dict, dict]] = {}
    combos_by_key: dict[str, set] = {}
    graphs: set[str] = set()
    counts: dict[str, int] = {}
    has_dup: dict[str, bool] = {}
    for r in parts:
        kind = r["kind"]
        if kind == 1:
            combos_by_key.setdefault(r["table"], set()).add(r["column"])
        elif kind == 2:
            graphs.add(r["column"])
        elif kind == 3:
            counts[r["table"]] = counts.get(r["table"], 0) + pickle.loads(r["blob"])
        elif kind == 4:
            has_dup[r["table"]] = has_dup.get(r["table"], False) or pickle.loads(r["blob"])
        else:
            col_stats, graph_stats = stats.setdefault(r["table"], ({}, {}))
            name, blob = r["column"], pickle.loads(r["blob"])
            if name.startswith("\x00graph\x00"):
                g = graph_stats.setdefault(name.split("\x00")[2], {"max_len": 0})
                g["max_len"] = max(g["max_len"], blob["max_len"])
            elif name in col_stats:
                col_stats[name].merge(blob)
            else:
                col_stats[name] = blob
    unique = {t: not d for t, d in has_dup.items()}
    return stats, combos_by_key, sorted(graphs), counts, unique
