"""Serving artifacts: DuckDB view DDL + R2RML mapping over the Parquet layout.

Parity targets:
* R2RML emission — R2RMLFromTables.java:42-217 (TriplesMap / subjectMap /
  predicateObjectMap with rr:template strings rebuilding IRIs from part columns,
  virtual constants inlined).
* SPARQL serving — the reference hands DuckDB+R2RML to Ontop
  (SparqlOnLoadedTest.java:104-127); here ``views.sql`` gives DuckDB a
  triple-reassembly view per (table, predicate) plus ``all_triples``, which is both
  the serving surface and the round-trip P/R harness (FIXTURES.md §D): the view
  output must equal the extracted triple set.
"""

from __future__ import annotations

import os

from ..state.manifest import ColumnSpec, Manifest, PredicateMapSpec, TableSpec
from ..terms import IRI_PARTS, KIND_BNODE, KIND_IRI, KIND_LITERAL


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _lex(c: ColumnSpec) -> str:
    """SQL expression yielding the column's lexical string (NULL when absent)."""
    if not c.physical:
        return "NULL" if c.virtual_value is None else _q(c.virtual_value)
    ident = f'"{c.name}"'
    if c.datatype in ("INTEGER", "BIGINT", "DOUBLE", "FLOAT"):
        expr = f"CAST({ident} AS VARCHAR)"
    elif c.datatype == "BOOLEAN":
        expr = f"CASE WHEN {ident} IS NULL THEN NULL WHEN {ident} THEN 'true' ELSE 'false' END"
    elif c.datatype == "TIMESTAMP":
        expr = f"strftime({ident}, '%Y-%m-%dT%H:%M:%S')"
    elif c.datatype == "DATE":
        expr = f"strftime({ident}, '%Y-%m-%d')"
    else:
        expr = ident
    if c.lcs_prefix:
        expr = f"{_q(c.lcs_prefix)} || {expr}"
    return expr


def _iri_expr(cols: list[ColumnSpec]) -> str:
    p = dict(zip(IRI_PARTS, cols))
    s = {k: _lex(v) for k, v in p.items()}
    hostful = (
        f"{s['scheme']} || '://' || coalesce({s['user_info']} || '@', '') || {s['host']}"
        f" || coalesce(':' || {s['port']}, '') || coalesce({s['path']}, '')"
        f" || coalesce('?' || {s['query']}, '') || coalesce('#' || {s['fragment']}, '')"
    )
    opaque = f"{s['scheme']} || ':' || coalesce({s['scheme_specific_part']}, '') || coalesce('#' || {s['fragment']}, '')"
    return f"CASE WHEN {s['host']} IS NOT NULL THEN {hostful} ELSE {opaque} END"


def _subject_expr(t: TableSpec) -> str:
    if t.subj_kind == KIND_IRI:
        return _iri_expr(t.subject_columns)
    return f"'_:' || {_lex(t.subject_columns[0])}"


def _object_exprs(pm: PredicateMapSpec) -> tuple[str, str, str]:
    """(obj lexical, o_lang, o_dt) SQL expressions."""
    if pm.obj_kind == KIND_IRI:
        return _iri_expr(pm.object_columns), "NULL", "NULL"
    if pm.obj_kind == KIND_BNODE:
        return f"'_:' || {_lex(pm.object_columns[0])}", "NULL", "NULL"
    meta, value = pm.object_columns
    if pm.lang is not None:
        return _lex(value), _lex(meta), "NULL"
    return _lex(value), "NULL", _lex(meta)


def _graph_case(graphs: list[str]) -> str:
    whens = " ".join(f"WHEN {i} THEN {_q(g)}" for i, g in enumerate(graphs))
    return f"CASE gid {whens} END"


def pm_view_sql(t: TableSpec, i: int, pm: PredicateMapSpec, graphs: list[str]) -> str:
    src = f"read_parquet('{t.path}/*.parquet')"
    subj = _subject_expr(t)
    obj, o_lang, o_dt = _object_exprs(pm)
    g = f'"{pm.graph_column}"'
    gid = f"unnest({g})" if pm.graph_is_list else g
    inner = (
        f"SELECT {subj} AS subj, {_q(pm.predicate)} AS pred, {obj} AS obj, "
        f"{o_lang} AS o_lang, {o_dt} AS o_dt, {gid} AS gid "
        f"FROM {src} WHERE {g} IS NOT NULL"
    )
    return (
        f"CREATE OR REPLACE VIEW v_{t.name}_{i} AS "
        f"SELECT subj, pred, obj, o_lang, o_dt, {_graph_case(graphs)} AS graph FROM ({inner});"
    )


def views_sql(m: Manifest) -> str:
    graphs = m.enums.get("graph", [])
    stmts: list[str] = []
    names: list[str] = []
    for t in m.tables:
        for i, pm in enumerate(t.predicates):
            stmts.append(pm_view_sql(t, i, pm, graphs))
            names.append(f"v_{t.name}_{i}")
    union = " UNION ALL ".join(f"SELECT * FROM {n}" for n in names)
    stmts.append(f"CREATE OR REPLACE VIEW all_triples AS {union};")
    return "\n".join(stmts) + "\n"


def write_views_sql(out_dir: str, m: Manifest) -> str:
    p = os.path.join(out_dir, "views.sql")
    with open(p, "w") as f:
        f.write(views_sql(m))
    return p


# ---------------------------------------------------------------------------
# R2RML (Turtle)
# ---------------------------------------------------------------------------


def _template(cols: list[ColumnSpec], hostful_hint: bool = True) -> str:
    """rr:template string with virtual constants + LCS prefixes inlined
    (R2RMLFromTables.java:139-217 equivalent)."""
    p = dict(zip(IRI_PARTS, cols))

    def piece(c: ColumnSpec, wrap: str = "{{{name}}}") -> str:
        if not c.physical:
            return c.virtual_value or ""
        ref = wrap.format(name=c.name)
        return (c.lcs_prefix or "") + ref

    host = p["host"]
    host_present = host.physical or host.virtual_value is not None
    if host_present and hostful_hint:
        out = piece(p["scheme"]) + "://"
        ui = p["user_info"]
        if ui.physical or ui.virtual_value:
            out += piece(ui) + "@"
        out += piece(host)
        port = p["port"]
        if port.physical or port.virtual_value:
            out += ":" + piece(port)
        out += piece(p["path"])
        q = p["query"]
        if q.physical or q.virtual_value is not None:
            out += "?" + piece(q)
        f = p["fragment"]
        if f.physical or f.virtual_value is not None:
            out += "#" + piece(f)
        return out
    out = piece(p["scheme"]) + ":" + piece(p["scheme_specific_part"])
    f = p["fragment"]
    if f.physical or f.virtual_value is not None:
        out += "#" + piece(f)
    return out


def r2rml_ttl(m: Manifest) -> str:
    lines = [
        "@prefix rr: <http://www.w3.org/ns/r2rml#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
    ]
    for t in m.tables:
        lines.append(f"<#map_{t.name}> a rr:TriplesMap ;")
        lines.append(f'  rr:logicalTable [ rr:tableName "{t.name}" ] ;')
        if t.subj_kind == KIND_IRI:
            lines.append(f'  rr:subjectMap [ rr:template "{_template(t.subject_columns)}" ] ;')
        else:
            lines.append(
                f'  rr:subjectMap [ rr:column "{t.subject_columns[0].name}" ; rr:termType rr:BlankNode ] ;'
            )
        for pm in t.predicates:
            if pm.obj_kind == KIND_IRI:
                om = f'rr:objectMap [ rr:template "{_template(pm.object_columns)}" ]'
            elif pm.obj_kind == KIND_BNODE:
                om = f'rr:objectMap [ rr:column "{pm.object_columns[0].name}" ; rr:termType rr:BlankNode ]'
            elif pm.lang is not None:
                om = (
                    f'rr:objectMap [ rr:column "{pm.object_columns[1].name}" ; '
                    f'rr:language "{pm.lang}" ]'
                )
            else:
                om = (
                    f'rr:objectMap [ rr:column "{pm.object_columns[1].name}" ; '
                    f"rr:datatype <{pm.datatype}> ]"
                )
            lines.append(
                f"  rr:predicateObjectMap [ rr:predicate <{pm.predicate}> ; {om} ] ;"
            )
        if lines[-1].endswith(";"):
            lines[-1] = lines[-1][:-1] + "."
        lines.append("")
    return "\n".join(lines)


def write_r2rml(out_dir: str, m: Manifest) -> str:
    p = os.path.join(out_dir, "r2rml.ttl")
    with open(p, "w") as f:
        f.write(r2rml_ttl(m))
    return p


def reassemble_triples(out_dir: str):
    """Round-trip: execute views.sql in DuckDB and return the all_triples table
    (the P/R harness input, FIXTURES.md §D). Returns a pyarrow Table."""
    import duckdb

    con = duckdb.connect()
    with open(os.path.join(out_dir, "views.sql")) as f:
        for stmt in f.read().split(";\n"):
            if stmt.strip():
                con.execute(stmt)
    return con.execute("SELECT * FROM all_triples").arrow()
