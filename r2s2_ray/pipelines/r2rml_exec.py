"""R2RML consumer: parse the engine's emitted ``r2rml.ttl`` and MATERIALIZE
triples from the Parquet store according to the mapping — the analog of the
reference's end-state check, where Ontop executes the emitted R2RML over the
store and SPARQL results are asserted
(SparqlOnLoadedTest.java:92-145, R2RMLFromTables.java:42-217).

No RDF library ships in this environment, so this is a subset parser for
exactly the grammar ``serve.r2rml_ttl`` emits (one TriplesMap per table;
subject/object maps via rr:template, rr:column, or rr:constant; language tags
and datatypes). The materializer generates its own SQL from the PARSED mapping
— independent of ``views.sql`` — so template bugs (missing '?'/'#' separators,
wrong LCS inlining, constant-vs-column confusion) surface as set differences
against ``all_triples`` instead of shipping silently.

R2RML null semantics: a term map whose referenced column is NULL generates no
term, hence no triple (R2RML spec §11.1). The SQL below reproduces that with
per-referenced-column IS NOT NULL guards.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import pyarrow as pa


@dataclass
class TermMap:
    kind: str  # "template" | "column" | "constant"
    value: str  # template string / column name / constant lexical
    term_type: str = "iri"  # "iri" | "bnode" | "literal"
    lang: str | None = None
    datatype: str | None = None


@dataclass
class POM:
    predicate: str
    obj: TermMap


@dataclass
class TriplesMap:
    table: str
    subject: TermMap
    poms: list[POM] = field(default_factory=list)
    where: str | None = None  # rr:sqlQuery row filter (R2RML R2RML-view)


_MAP_RE = re.compile(r"<#map_([^>]+)> a rr:TriplesMap")
_TABLE_RE = re.compile(r'rr:tableName "([^"]+)"')
_SQLQ_RE = re.compile(r'rr:sqlQuery "SELECT \* FROM (\S+) WHERE ([^"]+)"')
_SUBJ_TMPL_RE = re.compile(r'rr:subjectMap \[ rr:template "([^"]*)" \]')
_SUBJ_COL_RE = re.compile(r'rr:subjectMap \[ rr:column "([^"]+)" ; rr:termType rr:BlankNode \]')
_POM_RE = re.compile(r"rr:predicateObjectMap \[ rr:predicate <([^>]+)> ; (rr:objectMap \[.*\]) \]")
_OBJ_TMPL_RE = re.compile(r'rr:objectMap \[ rr:template "([^"]*)" \]')
_OBJ_TMPL_LANG_RE = re.compile(
    r'rr:objectMap \[ rr:template "([^"]*)" ; rr:termType rr:Literal ; rr:language "([^"]+)" \]'
)
_OBJ_TMPL_DT_RE = re.compile(
    r'rr:objectMap \[ rr:template "([^"]*)" ; rr:termType rr:Literal ; rr:datatype <([^>]+)> \]'
)
_OBJ_BNODE_RE = re.compile(r'rr:objectMap \[ rr:column "([^"]+)" ; rr:termType rr:BlankNode \]')
_OBJ_LANG_RE = re.compile(r'rr:objectMap \[ rr:column "([^"]+)" ; rr:language "([^"]+)" \]')
_OBJ_DT_RE = re.compile(r'rr:objectMap \[ rr:column "([^"]+)" ; rr:datatype <([^>]+)> \]')
_OBJ_CONST_LANG_RE = re.compile(r'rr:objectMap \[ rr:constant "((?:[^"\\]|\\.)*)"@([A-Za-z-]+) \]')
_OBJ_CONST_DT_RE = re.compile(r'rr:objectMap \[ rr:constant "((?:[^"\\]|\\.)*)"\^\^<([^>]+)> \]')
_OBJ_CONST_IRI_RE = re.compile(r"rr:objectMap \[ rr:constant <([^>]+)> \]")


def _unescape(s: str) -> str:
    return s.replace("\\\\", "\x00").replace('\\"', '"').replace("\x00", "\\")


def parse_r2rml(ttl: str) -> list[TriplesMap]:
    maps: list[TriplesMap] = []
    cur: TriplesMap | None = None
    for raw in ttl.splitlines():
        line = raw.strip().rstrip(".").rstrip(";").strip()
        m = _MAP_RE.search(raw)
        if m:
            cur = TriplesMap(table="", subject=TermMap("column", ""))
            maps.append(cur)
            continue
        if cur is None or not line:
            continue
        if m := _TABLE_RE.search(line):
            cur.table = m.group(1)
        elif m := _SQLQ_RE.search(line):
            cur.table, cur.where = m.group(1), m.group(2)
        elif m := _SUBJ_COL_RE.search(line):
            cur.subject = TermMap("column", m.group(1), term_type="bnode")
        elif m := _SUBJ_TMPL_RE.search(line):
            cur.subject = TermMap("template", m.group(1))
        elif m := _POM_RE.search(line):
            pred, om = m.group(1), m.group(2)
            if mm := _OBJ_TMPL_LANG_RE.search(om):
                obj = TermMap("template", mm.group(1), term_type="literal", lang=mm.group(2))
            elif mm := _OBJ_TMPL_DT_RE.search(om):
                obj = TermMap("template", mm.group(1), term_type="literal", datatype=mm.group(2))
            elif mm := _OBJ_TMPL_RE.search(om):
                obj = TermMap("template", mm.group(1))
            elif mm := _OBJ_BNODE_RE.search(om):
                obj = TermMap("column", mm.group(1), term_type="bnode")
            elif mm := _OBJ_LANG_RE.search(om):
                obj = TermMap("column", mm.group(1), term_type="literal", lang=mm.group(2))
            elif mm := _OBJ_DT_RE.search(om):
                obj = TermMap("column", mm.group(1), term_type="literal", datatype=mm.group(2))
            elif mm := _OBJ_CONST_LANG_RE.search(om):
                obj = TermMap("constant", _unescape(mm.group(1)), term_type="literal", lang=mm.group(2))
            elif mm := _OBJ_CONST_DT_RE.search(om):
                obj = TermMap("constant", _unescape(mm.group(1)), term_type="literal", datatype=mm.group(2))
            elif mm := _OBJ_CONST_IRI_RE.search(om):
                obj = TermMap("constant", mm.group(1), term_type="iri")
            else:
                raise ValueError(f"unrecognized objectMap: {om}")
            cur.poms.append(POM(pred, obj))
    return [m for m in maps if m.table]


_PLACEHOLDER_RE = re.compile(r"\{([^{}]+)\}")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _col_lexical(name: str, schema) -> str:
    """Column -> lexical-form SQL, by PHYSICAL Parquet type (the executor, like
    any R2RML processor, natural-maps SQL datatypes to lexical forms)."""
    import pyarrow as pa

    ident = f'"{name}"'
    f = schema.field(name)
    t = f.type
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_timestamp(t):
        return f"strftime({ident}, '%Y-%m-%dT%H:%M:%S')"
    if pa.types.is_date(t):
        return f"strftime({ident}, '%Y-%m-%d')"
    if pa.types.is_boolean(t):
        return f"CASE WHEN {ident} IS NULL THEN NULL WHEN {ident} THEN 'true' ELSE 'false' END"
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return f"CAST({ident} AS VARCHAR)"
    return ident


def _term_sql(tm: TermMap, schema) -> tuple[str, str]:
    """(value_expr, guard_expr): guard is TRUE when the map generates a term
    (R2RML: any NULL referenced column -> no term)."""
    if tm.kind == "constant":
        return _sql_quote(tm.value), "TRUE"
    if tm.kind == "column":
        lex = _col_lexical(tm.value, schema)
        prefix = "'_:' || " if tm.term_type == "bnode" else ""
        return f"{prefix}{lex}", f'"{tm.value}" IS NOT NULL'
    # template
    parts: list[str] = []
    guards: list[str] = []
    pos = 0
    for m in _PLACEHOLDER_RE.finditer(tm.value):
        if m.start() > pos:
            parts.append(_sql_quote(tm.value[pos : m.start()]))
        col = m.group(1)
        parts.append(_col_lexical(col, schema))
        guards.append(f'"{col}" IS NOT NULL')
        pos = m.end()
    if pos < len(tm.value):
        parts.append(_sql_quote(tm.value[pos:]))
    expr = " || ".join(parts) if parts else "''"
    return expr, " AND ".join(guards) if guards else "TRUE"


def materialize_triples(out_dir: str, maps: list[TriplesMap] | None = None):
    """Run the parsed mapping over the Parquet store: one SELECT per
    predicateObjectMap, UNION ALL, DISTINCT. Returns a pyarrow Table with
    columns (subj, pred, obj, o_lang, o_dt) — graph maps are not part of the
    emitted mapping (parity: the reference emits none either)."""
    import duckdb
    import pyarrow.parquet as pq

    if maps is None:
        with open(os.path.join(out_dir, "r2rml.ttl")) as f:
            maps = parse_r2rml(f.read())
    con = duckdb.connect()
    selects: list[str] = []
    for tm in maps:
        path = os.path.join(out_dir, "tables", tm.table)
        files = [os.path.join(path, x) for x in sorted(os.listdir(path)) if x.endswith(".parquet")]
        if not files:
            continue
        schema = pq.ParquetFile(files[0]).schema_arrow
        src = f"read_parquet('{path}/*.parquet')"
        row_filter = f" AND ({tm.where})" if tm.where else ""
        s_expr, s_guard = _term_sql(tm.subject, schema)
        for pom in tm.poms:
            o_expr, o_guard = _term_sql(pom.obj, schema)
            o_lang = _sql_quote(pom.obj.lang) if pom.obj.lang else "CAST(NULL AS VARCHAR)"
            o_dt = _sql_quote(pom.obj.datatype) if pom.obj.datatype else "CAST(NULL AS VARCHAR)"
            selects.append(
                f"SELECT {s_expr} AS subj, {_sql_quote(pom.predicate)} AS pred, "
                f"{o_expr} AS obj, {o_lang} AS o_lang, {o_dt} AS o_dt "
                f"FROM {src} WHERE ({s_guard}) AND ({o_guard}){row_filter}"
            )
    if not selects:
        # no parsed maps / no parquet files: empty store -> empty triple table
        return pa.table(
            {c: pa.array([], pa.string()) for c in ("subj", "pred", "obj", "o_lang", "o_dt")}
        )
    sql = "SELECT DISTINCT * FROM (" + " UNION ALL ".join(selects) + ")"
    return con.execute(sql).arrow()
