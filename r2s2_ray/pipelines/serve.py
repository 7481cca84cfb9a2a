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

import logging
import os

from ..state.manifest import ColumnSpec, Manifest, PredicateMapSpec, TableSpec
from ..terms import IRI_PARTS, KIND_BNODE, KIND_IRI, KIND_LITERAL

#: cap on TriplesMaps emitted per (table, predicate map): the subject x object
#: null-pattern cross product is 2^(nullable IRI parts) on each side
MAX_MAPS_PER_PREDICATE = 512


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
    from ..util import duckdb_path

    src = f"read_parquet('{duckdb_path(t.path)}/*.parquet')"
    subj = _subject_expr(t)
    obj, o_lang, o_dt = _object_exprs(pm)
    g = f'"{pm.graph_column}"'
    gid = f"unnest({g})" if pm.graph_is_list else g
    inner = (
        f"SELECT {subj} AS subj, {_q(pm.predicate)} AS pred, {obj} AS obj, "
        f"{o_lang} AS o_lang, {o_dt} AS o_dt, {gid} AS gid "
        f"FROM {src} WHERE {g} IS NOT NULL"
    )
    # s_kind / o_kind are STATIC per predicate-map (the table split is by
    # kind), so the views expose them as constants — exact isIRI/isBlank/
    # isLiteral SPARQL filters at zero storage cost
    return (
        f"CREATE OR REPLACE VIEW v_{t.name}_{i} AS "
        f"SELECT subj, pred, obj, o_lang, o_dt, {_graph_case(graphs)} AS graph, "
        f"{t.subj_kind} AS s_kind, {pm.obj_kind} AS o_kind FROM ({inner});"
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
    from ..util import fs_write_text

    p = os.path.join(out_dir, "views.sql")
    fs_write_text(p, views_sql(m))
    return p


#: what the SPARQL front end (pipelines/sparql.py + update.py) answers —
#: machine-readable so a client can probe the store instead of trial-running
#: queries; the unsupported list names the LOUD rejections (each raises with
#: this feature name, pinned by tests) rather than generic parse errors.
CAPABILITIES = {
    "query_forms": ["SELECT", "ASK", "CONSTRUCT", "DESCRIBE"],
    "update_forms": [
        "INSERT DATA", "DELETE DATA", "DELETE WHERE", "INSERT WHERE",
        "DELETE/INSERT/WHERE (Modify)", "WITH <g> (Modify graph scoping)",
        "CLEAR", "DROP", "CREATE", "ADD", "MOVE", "COPY", "LOAD",
    ],
    "features": [
        "BGP joins", "OPTIONAL (nested)", "UNION", "MINUS", "VALUES (UNDEF)",
        "GRAPH (constant and variable)", "FROM / FROM NAMED",
        "FILTER (comparisons, IN, EXISTS, BOUND, REGEX, string/date fns)",
        "BIND / expressions", "property paths (sequences, inverse, "
        "alternation, negated sets, +/*/? closures incl. sequence closures)",
        "aggregates + GROUP BY / HAVING", "subselects", "ORDER BY expr",
        "LIMIT / OFFSET", "blank-node property lists",
    ],
    "unsupported": {
        "SERVICE": "federated query needs network calls at evaluation time; "
                   "this store is local-only (loud rejection by name)",
        "USING": "Modify dataset re-targeting; use WITH <g> or GRAPH blocks "
                 "(loud rejection by name)",
        "RDF-star": "quoted triples are rejected at load (reference parity)",
    },
    "graph_semantics": "union default graph (bare patterns match all graphs; "
                       "GRAPH ?g also binds the default graph)",
}


def write_capabilities(out_dir: str) -> str:
    """Emit the capabilities manifest next to views.sql so a consumer of the
    served store can discover the supported SPARQL surface without probing."""
    import json

    from ..util import fs_write_text

    p = os.path.join(out_dir, "capabilities.json")
    fs_write_text(p, json.dumps(CAPABILITIES, indent=2) + "\n")
    return p


# ---------------------------------------------------------------------------
# R2RML (Turtle)
# ---------------------------------------------------------------------------


#: optional IRI parts per branch: (part, separator-before, separator-after)
_HOSTFUL_OPT = [("user_info", "", "@"), ("port", ":", ""), ("path", "", ""), ("query", "?", ""), ("fragment", "#", "")]
_OPAQUE_OPT = [("scheme_specific_part", "", ""), ("fragment", "#", "")]


def _piece(c: ColumnSpec) -> str:
    if not c.physical:
        return c.virtual_value or ""
    return (c.lcs_prefix or "") + "{" + c.name + "}"


def iri_variants(cols: list[ColumnSpec]) -> list[tuple[str, list[str]]]:
    """All (template, SQL-null-conditions) variants of an IRI column group.

    R2RML templates generate NO term when a referenced column is NULL (spec
    §11.1), but the store's optional IRI parts (query, fragment, port, ...) are
    nullable WITHIN one table — a single template cannot express "append
    '#'||fragment only when present". So each null-pattern over the nullable
    optional parts becomes its own template + rr:sqlQuery WHERE conditions
    (R2RMLFromTables.java:139-217 is the reference's single-template
    equivalent, which its Ontop round-trip only exercises on null-free parts).
    """
    p = dict(zip(IRI_PARTS, cols))
    host = p["host"]
    if host.physical:
        host_states = [True, False] if host.nullable else [True]
    else:
        host_states = [host.virtual_value is not None]
    out: list[tuple[str, list[str]]] = []
    for hostful in host_states:
        conds: list[str] = []
        if host.physical:
            conds.append(f"{host.name} IS {'NOT ' if hostful else ''}NULL")
        opt = _HOSTFUL_OPT if hostful else _OPAQUE_OPT
        enum = [(x, pre, post) for x, pre, post in opt if p[x].physical and p[x].nullable]
        fixed = {x for x, _, _ in opt if (p[x].physical and not p[x].nullable) or (not p[x].physical and p[x].virtual_value is not None)}
        for mask in range(1 << len(enum)):
            present = set(fixed)
            vconds = list(conds)
            for bit, (x, _, _) in enumerate(enum):
                if mask >> bit & 1:
                    present.add(x)
                    vconds.append(f"{p[x].name} IS NOT NULL")
                else:
                    vconds.append(f"{p[x].name} IS NULL")
            if hostful:
                t = _piece(p["scheme"]) + "://"
                for x, pre, post in _HOSTFUL_OPT[:1]:  # user_info
                    if x in present:
                        t += pre + _piece(p[x]) + post
                t += _piece(host) if host.physical else (host.virtual_value or "")
                for x, pre, post in _HOSTFUL_OPT[1:]:
                    if x in present:
                        t += pre + _piece(p[x]) + post
            else:
                t = _piece(p["scheme"]) + ":"
                if "scheme_specific_part" in present:
                    t += _piece(p["scheme_specific_part"])
                if "fragment" in present:
                    t += "#" + _piece(p["fragment"])
            out.append((t, vconds))
    return out


def _template(cols: list[ColumnSpec]) -> str:
    """Single most-complete template (all parts present) — kept for callers
    that only need the canonical shape; the emitter uses :func:`iri_variants`."""
    return iri_variants(cols)[0][0]


def _object_map_variants(pm: PredicateMapSpec) -> list[tuple[str, list[str]]]:
    """(objectMap turtle, extra SQL null-conditions) variants for one
    predicate map. Empty list => the map can never generate a triple."""
    if pm.obj_kind == KIND_IRI:
        return [
            (f'rr:objectMap [ rr:template "{tpl}" ]', conds)
            for tpl, conds in iri_variants(pm.object_columns)
        ]
    if pm.obj_kind == KIND_BNODE:
        c = pm.object_columns[0]
        return [(f'rr:objectMap [ rr:column "{c.name}" ; rr:termType rr:BlankNode ]', [])]
    val = pm.object_columns[1]
    tag = f'rr:language "{pm.lang}"' if pm.lang is not None else f"rr:datatype <{pm.datatype}>"
    if not val.physical:
        # VIRTUAL value column: a column reference would name a nonexistent
        # physical column — emit rr:constant (all-null virtual: no triples)
        if val.virtual_value is None:
            return []
        lit = val.virtual_value.replace("\\", "\\\\").replace('"', '\\"')
        suffix = f'"@{pm.lang}' if pm.lang is not None else f'"^^<{pm.datatype}>'
        return [(f'rr:objectMap [ rr:constant "{lit}{suffix} ]', [])]
    if val.lcs_prefix:
        # LCS-factored literal: a bare rr:column would drop the stripped
        # prefix — use a literal-typed template
        return [
            (
                f'rr:objectMap [ rr:template "{val.lcs_prefix}{{{val.name}}}" ; '
                f"rr:termType rr:Literal ; {tag} ]",
                [],
            )
        ]
    return [(f'rr:objectMap [ rr:column "{val.name}" ; {tag} ]', [])]


def r2rml_ttl(m: Manifest) -> str:
    """One TriplesMap per (table, predicate map, subject/object null-pattern).

    Two store facts force this shape on any CONFORMANT R2RML processor:
    * a wide (merged) table marks "this row has predicate P" via P's graph
      column — rows lacking P must not produce P-triples, so each predicate
      map's logical table is ``rr:sqlQuery .. WHERE <graph col> IS NOT NULL``
      (a plain per-table map with an rr:constant object would over-generate);
    * optional IRI parts (query/fragment/port/...) are nullable within a table
      — see :func:`iri_variants`.
    """
    lines = [
        "@prefix rr: <http://www.w3.org/ns/r2rml#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
    ]
    # accumulated namespaces (M7): declared for downstream consumers even
    # though term maps below use absolute IRIs
    for pfx, ns in sorted((m.lineage.get("namespaces") or {}).items()):
        if pfx not in ("rr", "xsd"):
            lines.append(f"@prefix {pfx}: <{ns}> .")
    lines.append("")
    for t in m.tables:
        if t.subj_kind == KIND_IRI:
            subj_variants = [
                (f'rr:subjectMap [ rr:template "{tpl}" ]', conds)
                for tpl, conds in iri_variants(t.subject_columns)
            ]
        else:
            subj_variants = [
                (
                    f'rr:subjectMap [ rr:column "{t.subject_columns[0].name}" ; rr:termType rr:BlankNode ]',
                    [],
                )
            ]
        for i, pm in enumerate(t.predicates):
            base = [f"{pm.graph_column} IS NOT NULL"] if pm.graph_column else []
            obj_variants = _object_map_variants(pm)
            n_maps = len(subj_variants) * len(obj_variants)
            if n_maps > MAX_MAPS_PER_PREDICATE:
                # 2^(nullable parts) x 2^(nullable parts) blowup guard: emit the
                # first MAX_MAPS_PER_PREDICATE null-patterns (enumeration order is
                # deterministic) and warn — rarer patterns past the cap are dropped
                # from the mapping rather than letting a pathological table emit
                # thousands of TriplesMaps (and r2rml_exec run one SELECT each)
                logging.getLogger(__name__).warning(
                    "r2rml_ttl: %s predicate %s has %d template variants; capping at %d",
                    t.name, pm.predicate, n_maps, MAX_MAPS_PER_PREDICATE,
                )
            emitted = 0
            for si, (smap, sconds) in enumerate(subj_variants):
                if emitted >= MAX_MAPS_PER_PREDICATE:
                    break
                for oi, (omap, oconds) in enumerate(obj_variants):
                    if emitted >= MAX_MAPS_PER_PREDICATE:
                        break
                    emitted += 1
                    conds = base + sconds + oconds
                    if conds:
                        lt = (
                            "rr:logicalTable [ rr:sqlQuery "
                            f'"SELECT * FROM {t.name} WHERE {" AND ".join(conds)}" ]'
                        )
                    else:
                        lt = f'rr:logicalTable [ rr:tableName "{t.name}" ]'
                    lines.append(f"<#map_{t.name}_{i}_{si}_{oi}> a rr:TriplesMap ;")
                    lines.append(f"  {lt} ;")
                    lines.append(f"  {smap} ;")
                    lines.append(
                        f"  rr:predicateObjectMap [ rr:predicate <{pm.predicate}> ; {omap} ] ."
                    )
                    lines.append("")
    return "\n".join(lines)


def write_r2rml(out_dir: str, m: Manifest) -> str:
    from ..util import fs_write_text

    p = os.path.join(out_dir, "r2rml.ttl")
    fs_write_text(p, r2rml_ttl(m))
    return p


def reassemble_triples(out_dir: str):
    """Round-trip: execute views.sql in DuckDB and return the all_triples table
    (the P/R harness input, FIXTURES.md §D). Returns a pyarrow Table."""
    import duckdb

    from ..util import fs_read_text

    con = duckdb.connect()
    for stmt in fs_read_text(os.path.join(out_dir, "views.sql")).split(";\n"):
        if stmt.strip():
            con.execute(stmt)
    # explicit columns: the round-trip contract is the six triple columns —
    # the views' constant s_kind/o_kind serving columns stay out of it
    return con.execute(
        "SELECT subj, pred, obj, o_lang, o_dt, graph FROM all_triples"
    ).arrow()
