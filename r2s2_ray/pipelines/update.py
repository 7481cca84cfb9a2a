"""SPARQL 1.1 UPDATE (INSERT DATA / DELETE DATA / DELETE WHERE) over the
per-bucket quad state.

Reference parity: none to copy — the reference's store is strictly read-only
after the 12-step batch load (Loader.java:151-159). SPARQL Update is the
user-visible mutation surface it lacks, implemented over the engine's
incremental quad state (stages/incremental.py) so the 100-TB scale contracts
carry over unchanged:

* ``INSERT DATA``  -> ``quad_state_merge`` of a request-sized routed delta:
  only the inserted quads cross the exchange; touched buckets fold old+new
  locally; untouched buckets are never read.
* ``DELETE DATA`` / ``DELETE WHERE`` -> the exchange-FREE retraction pattern
  (``quad_state_retract``): the constraint set ships once via ``ray.put``
  (requests are request-sized, not corpus-sized), one task per bucket reads
  ITS OWN files, anti-filters, rewrites one convergent content-tagged
  generation. Re-running the same script is a byte-identical no-op (pinned).

Graph semantics match the serving path (pipelines/sparql.py): a pattern
without ``GRAPH`` ranges over the union of named graphs (union default graph);
``GRAPH <g> { ... }`` restricts to that graph; ``GRAPH ?g { ... }`` is the
union again. ``INSERT DATA`` triples outside a ``GRAPH`` block land in
``DEFAULT_GRAPH``. RDF set semantics make inserts of already-present quads
no-ops by construction (the state stores DISTINCT quads).

**DELIBERATE DIVERGENCE from strict SPARQL 1.1 dataset semantics** (pinned
here, not just in helper docstrings): per the spec, a pattern outside
``GRAPH`` matches the *default graph only* and ``GRAPH ?g`` binds *named
graphs only*. This engine uses the *union default graph* convention instead
(common in triple stores: bare patterns see the union of ALL graphs, and
``GRAPH ?g`` also binds ``DEFAULT_GRAPH``), consistently across serving and
UPDATE and across every oracle. Requests ported from a strict-spec store
that rely on the bare-pattern/default-graph distinction must add explicit
``GRAPH`` blocks.

Supported grammar (anything else raises loudly, never misparses):

    PREFIX decls
    op ( ';' op )*   where op is one of
      INSERT DATA  '{' quad-block '}'
      DELETE DATA  '{' quad-block '}'         (constants only)
      DELETE WHERE '{' quad-block '}'         (vars allowed)
      INSERT '{' quad-block '}' WHERE '{' quad-block '}'
                                              (pattern-driven insert: the
                                              WHERE BGP joins on shared vars
                                              against the state, the template
                                              instantiates per solution;
                                              see quad_state_insert_where)
      ( WITH iri )?                           (Modify forms only: the WITH
                                              graph becomes the graph of
                                              every template quad and WHERE
                                              pattern outside an explicit
                                              GRAPH block — spec semantics,
                                              overriding the union default)
      DELETE '{' quad-block '}' [ INSERT '{' quad-block '}' ]
             WHERE '{' quad-block '}'         (the full Modify form: both
                                              templates instantiate from the
                                              SAME pre-state solutions;
                                              GRAPH ?g binds in WHERE and
                                              re-targets template quads;
                                              see quad_state_modify)
      CLEAR  (SILENT)? ( GRAPH iri | DEFAULT | NAMED | ALL )
      DROP   (SILENT)? ( GRAPH iri | DEFAULT | NAMED | ALL )
      CREATE (SILENT)? GRAPH iri
      ADD | MOVE | COPY (SILENT)?
             ( (GRAPH)? iri | DEFAULT ) TO ( (GRAPH)? iri | DEFAULT )
      LOAD   (SILENT)? iri ( INTO GRAPH iri )?
    quad-block := ( triples | GRAPH (<g>|?g) '{' triples '}' )*
    triples    := s p o ( ';' p o )* '.'      (``a`` = rdf:type)

Graph-management semantics (SPARQL 1.1 Update §3.2, adapted to a store that
records NO empty graphs — a graph "exists" iff it holds at least one quad,
the spec-sanctioned reading for such stores): ``CREATE`` is a no-op that
errors if the graph already holds quads (unless SILENT); ``DROP`` and
``CLEAR`` coincide; ``CLEAR/DROP GRAPH g`` on an absent graph, and
``ADD/MOVE/COPY`` from an absent source, error unless SILENT. All of them
are EXCHANGE-FREE: the bucket key is hash(combo, subj) — graph-independent —
so retagging or dropping a graph is one task per bucket rewriting its own
files (`_graph_rewrite`). ``LOAD`` reads a local parquet / JSONL(.gz) file
in the extract schema (``file://`` URIs accepted) and merges it as a routed
delta, optionally re-targeted by ``INTO GRAPH``.

``DELETE WHERE`` with multiple triple patterns is supported only when the
patterns share no variables (each then deletes its own matches exactly);
shared-variable templates would require a join-then-delete and are rejected.
"""

from __future__ import annotations

import re

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.fold import _SEP, route
from ..stages.incremental import (
    _write_bucket,
    quad_state_merge,
)
from ..terms import KIND_BNODE, KIND_IRI, KIND_LITERAL, XSD_STRING
from ..util import fs_for, fs_list_parquet, fs_read_table, fs_rmtree
from .sparql import _PREFIX_RE, _TERM_RE, Term, _parse_term

#: where INSERT DATA triples outside a GRAPH block land
DEFAULT_GRAPH = "https://graphs.example.org/default"

_OP_RE = re.compile(
    r"(INSERT\s+DATA|DELETE\s+DATA|DELETE\s+WHERE|INSERT|DELETE)\s*\{", re.I
)
_WHERE_RE = re.compile(r"\s*WHERE\s*\{", re.I)
_INSERT_RE = re.compile(r"\s*INSERT\s*\{", re.I)
_GRAPH_RE = re.compile(r"GRAPH\s+(<[^>]+>|\?\w+)\s*\{", re.I)


def _match_brace(src: str, open_idx: int) -> int:
    """Index just past the ``}`` matching ``src[open_idx] == '{'`` (quote-aware)."""
    depth, i, n = 0, open_idx, len(src)
    while i < n:
        c = src[i]
        if c == '"':  # skip string literal
            i += 1
            while i < n and (src[i] != '"' or src[i - 1] == "\\"):
                i += 1
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced braces in UPDATE request")


def _term_kind(t: Term) -> int:
    if t.kind == "iri":
        return KIND_IRI
    if t.kind == "lit":
        return KIND_LITERAL
    if t.kind == "bnode":
        return KIND_BNODE
    raise ValueError(f"unexpected term kind in UPDATE: {t.kind}")


_BNODE_RE = re.compile(r"_:(\w[\w.-]*)")


def _scan_terms(block: str, prefixes: dict[str, str]):
    """Yield (term, sep_before) over a triples block; seps are '.', ';' or ''.

    Bnode labels (``_:x``) are recognised here (the SELECT-side tokenizer
    handles them elsewhere); gap text may contain only whitespace and
    separators — anything else is a loud reject."""
    pos = 0
    combined = re.compile(_BNODE_RE.pattern + "|" + _TERM_RE.pattern, re.X)
    for m in combined.finditer(block):
        gap = block[pos : m.start()]
        seps = [c for c in gap if c in ".;"]
        if gap.strip(" \t\n.;") != "":
            raise ValueError(f"unsupported syntax in UPDATE data block: {gap!r}")
        if len(seps) > 1:
            raise ValueError(f"stray separators in UPDATE data block: {gap!r}")
        if m.group(0).startswith("_:"):
            yield Term("bnode", m.group(0)), (seps[0] if seps else "")
        else:
            yield _parse_term(m.group(0), prefixes), (seps[0] if seps else "")
        pos = m.end()
    tail = block[pos:]
    if tail.strip(" \t\n.;") != "":
        raise ValueError(f"unsupported trailing syntax in UPDATE data block: {tail!r}")


def _parse_triples(block: str, graph: Term | None, prefixes: dict[str, str]):
    """triples block -> list of (s, p, o, graph_term) Term tuples; supports
    ``s p o ; p2 o2 .`` predicate-object lists."""
    out = []
    slot, cur, first = 0, [None, None, None], True  # s p o
    for term, sep in _scan_terms(block, prefixes):
        if sep == ".":
            if slot != 0:
                raise ValueError("'.' inside an incomplete triple in UPDATE block")
        elif sep == ";":
            if slot != 0:
                raise ValueError("';' inside an incomplete triple in UPDATE block")
            slot = 1  # keep subject
        elif slot == 0 and not first:
            raise ValueError("missing '.' between triples in UPDATE block")
        first = False
        cur[slot] = term
        slot += 1
        if slot == 3:
            out.append((cur[0], cur[1], cur[2], graph))
            cur = [cur[0], None, None]
            slot = 0
    if slot != 0:
        raise ValueError("dangling terms at end of UPDATE data block")
    return out


def _split_quad_block(block: str, prefixes: dict[str, str]):
    """quad-block -> list of (s, p, o, graph_term|None); GRAPH groups handled."""
    quads, pos = [], 0
    while True:
        m = _GRAPH_RE.search(block, pos)
        if not m:
            quads.extend(_parse_triples(block[pos:], None, prefixes))
            break
        quads.extend(_parse_triples(block[pos : m.start()], None, prefixes))
        end = _match_brace(block, m.end() - 1)
        gtok = m.group(1)
        gterm = (
            Term("var", gtok[1:]) if gtok.startswith("?") else Term("iri", gtok[1:-1])
        )
        quads.extend(_parse_triples(block[m.end() : end - 1], gterm, prefixes))
        pos = end
    return quads


_MANAGE_HEAD_RE = re.compile(r"(CLEAR|DROP|CREATE|ADD|MOVE|COPY|LOAD)\b", re.I)
_WS_RE = re.compile(r"\s*")


def _iri_at(body: str, pos: int, prefixes: dict[str, str]):
    """Parse ``<iri>`` or ``pfx:local`` at pos -> (iri, new_pos) or (None, pos)."""
    pos = _WS_RE.match(body, pos).end()
    m = re.compile(r"<([^<>\s]+)>").match(body, pos)
    if m:
        return m.group(1), m.end()
    m = re.compile(r"(\w[\w-]*):([\w.\-/]+)").match(body, pos)
    if m:
        if m.group(1) not in prefixes:
            raise ValueError(f"unknown prefix {m.group(1)!r} in UPDATE request")
        return prefixes[m.group(1)] + m.group(2), m.end()
    return None, pos


def _graph_ref_at(body: str, pos: int, prefixes: dict[str, str]):
    """``(GRAPH)? iri | DEFAULT`` -> (iri, new_pos); DEFAULT -> DEFAULT_GRAPH."""
    pos = _WS_RE.match(body, pos).end()
    m = re.compile(r"DEFAULT\b", re.I).match(body, pos)
    if m:
        return DEFAULT_GRAPH, m.end()
    m = re.compile(r"GRAPH\s+", re.I).match(body, pos)
    if m:
        pos = m.end()
    iri, pos2 = _iri_at(body, pos, prefixes)
    if iri is None:
        raise ValueError(f"expected graph reference at: {body[pos:pos + 40]!r}")
    return iri, pos2


def _parse_manage(body: str, m, prefixes: dict[str, str]):
    """One graph-management op starting at match ``m`` -> (spec dict, end)."""
    verb = m.group(1).upper()
    pos = m.end()
    sm = re.compile(r"\s*SILENT\b", re.I).match(body, pos)
    silent = sm is not None
    if sm:
        pos = sm.end()
    spec: dict = {"verb": verb, "silent": silent}
    if verb in ("CLEAR", "DROP"):
        p = _WS_RE.match(body, pos).end()
        kw = re.compile(r"(DEFAULT|NAMED|ALL)\b", re.I).match(body, p)
        if kw:
            spec["target"] = kw.group(1).upper()
            return spec, kw.end()
        spec["target"], pos = _graph_ref_at(body, pos, prefixes)
        return spec, pos
    if verb == "CREATE":
        spec["target"], pos = _graph_ref_at(body, pos, prefixes)
        return spec, pos
    if verb == "LOAD":
        uri, pos = _iri_at(body, pos, prefixes)
        if uri is None:
            raise ValueError("LOAD requires a <source-uri>")
        spec["uri"] = uri
        im = re.compile(r"\s*INTO\b", re.I).match(body, pos)
        if im:
            spec["into"], pos = _graph_ref_at(body, im.end(), prefixes)
        else:
            spec["into"] = None
        return spec, pos
    # ADD / MOVE / COPY
    spec["src"], pos = _graph_ref_at(body, pos, prefixes)
    tm = re.compile(r"\s*TO\b", re.I).match(body, pos)
    if not tm:
        raise ValueError(f"{verb} requires 'TO' between source and destination")
    spec["dst"], pos = _graph_ref_at(body, tm.end(), prefixes)
    return spec, pos


def parse_update(src: str):
    """UPDATE request -> list of ('insert_data'|'delete_data'|'delete_where'|
    'insert_where'|'modify'|'manage', payload) ops in request order."""
    prefixes = dict(_PREFIX_RE.findall(src))
    body = _PREFIX_RE.sub(" ", src)
    def _with_graph(quads, g: str):
        gt = Term("iri", g)
        return [(s, p, o, gq if gq is not None else gt) for s, p, o, gq in quads]

    ops, pos = [], 0
    while True:
        pos = re.compile(r"[\s;]*").match(body, pos).end()
        if pos >= len(body):
            break
        # WITH <g> (SPARQL 1.1 Modify): g becomes the graph of every
        # template quad AND every WHERE pattern outside an explicit GRAPH
        # block (spec semantics — WITH pins the operation's graph, unlike
        # the engine's union-default for bare patterns without WITH)
        with_iri = None
        wm = re.compile(r"WITH\b", re.I).match(body, pos)
        if wm:
            with_iri, pos = _iri_at(body, wm.end(), prefixes)
            if with_iri is None:
                raise ValueError("WITH requires an IRI graph name")
            pos = _WS_RE.match(body, pos).end()
        m = _OP_RE.match(body, pos)
        if not m:
            if with_iri is not None:
                raise ValueError("WITH must be followed by DELETE/INSERT ... WHERE")
            mm = _MANAGE_HEAD_RE.match(body, pos)
            if mm:
                spec, pos = _parse_manage(body, mm, prefixes)
                ops.append(("manage", spec))
                continue
            raise ValueError(
                f"unsupported syntax in UPDATE request: {body[pos:pos + 60]!r}"
            )
        end = _match_brace(body, m.end() - 1)
        kind = re.sub(r"\s+", "_", m.group(1).lower())
        quads = _split_quad_block(body[m.end() : end - 1], prefixes)
        if kind == "insert":
            w = _WHERE_RE.match(body, end)
            if not w:
                raise ValueError(
                    "bare INSERT { ... } must be followed by WHERE { ... } "
                    "(use INSERT DATA for constant quads)"
                )
            wend = _match_brace(body, w.end() - 1)
            where = _split_quad_block(body[w.end() : wend - 1], prefixes)
            if with_iri is not None:
                quads = _with_graph(quads, with_iri)
                where = _with_graph(where, with_iri)
            ops.append(("insert_where", (quads, where)))
            pos = wend
            continue
        if kind == "delete":
            ins: list = []
            im = _INSERT_RE.match(body, end)
            if im:
                iend = _match_brace(body, im.end() - 1)
                ins = _split_quad_block(body[im.end() : iend - 1], prefixes)
                end = iend
            if re.compile(r"\s*USING\b", re.I).match(body, end):
                raise ValueError(
                    "USING / USING NAMED dataset clauses are not supported: "
                    "scope the WHERE with WITH <g> or explicit GRAPH blocks"
                )
            w = _WHERE_RE.match(body, end)
            if not w:
                raise ValueError(
                    "bare DELETE { ... } must be followed by "
                    "[INSERT { ... }] WHERE { ... } "
                    "(use DELETE DATA / DELETE WHERE for constant forms)"
                )
            wend = _match_brace(body, w.end() - 1)
            where = _split_quad_block(body[w.end() : wend - 1], prefixes)
            if with_iri is not None:
                quads = _with_graph(quads, with_iri)
                ins = _with_graph(ins, with_iri)
                where = _with_graph(where, with_iri)
            ops.append(("modify", (quads, ins, where)))
            pos = wend
            continue
        if with_iri is not None:
            raise ValueError(
                "WITH applies only to the Modify forms "
                "(DELETE/INSERT ... WHERE), not to DATA / DELETE WHERE ops"
            )
        ops.append((kind, quads))
        pos = end
    if not ops:
        raise ValueError("no UPDATE op found (INSERT/DELETE/Modify or "
                         "CLEAR/DROP/CREATE/ADD/MOVE/COPY/LOAD)")
    return ops


def _lit_fields(t: Term) -> tuple[str | None, str | None]:
    """RDF 1.1 normalization: plain literal == xsd:string (matches extract)."""
    if t.kind != "lit":
        return None, None
    if t.lang is not None:
        return t.lang, None
    return None, t.datatype or XSD_STRING


def _quads_to_table(quads) -> pa.Table:
    """Constant quads -> the extract-schema triple table (batch.py:12-13)."""
    rows = {k: [] for k in
            ("subj", "s_kind", "pred", "obj", "o_kind", "o_lang", "o_dt", "graph")}
    for s, p, o, g in quads:
        for t, role in ((s, "subject"), (p, "predicate"), (o, "object")):
            if t.kind == "var":
                raise ValueError(f"variable ?{t.value} illegal in a DATA block")
        if p.kind != "iri":
            raise ValueError("predicate in a DATA block must be an IRI")
        lang, dt = _lit_fields(o)
        rows["subj"].append(s.value)
        rows["s_kind"].append(_term_kind(s))
        rows["pred"].append(p.value)
        rows["obj"].append(o.value)
        rows["o_kind"].append(_term_kind(o))
        rows["o_lang"].append(lang)
        rows["o_dt"].append(dt)
        if g is not None and g.kind == "var":
            raise ValueError(f"variable graph ?{g.value} illegal in a DATA block")
        rows["graph"].append(g.value if g is not None else DEFAULT_GRAPH)
    return pa.table(
        {
            "subj": pa.array(rows["subj"], pa.string()),
            "s_kind": pa.array(rows["s_kind"], pa.int8()),
            "pred": pa.array(rows["pred"], pa.string()),
            "obj": pa.array(rows["obj"], pa.string()),
            "o_kind": pa.array(rows["o_kind"], pa.int8()),
            "o_lang": pa.array(rows["o_lang"], pa.string()),
            "o_dt": pa.array(rows["o_dt"], pa.string()),
            "graph": pa.array(rows["graph"], pa.string()),
        }
    )


def _quads_to_constraints(quads, exact: bool):
    """Quad patterns -> per-triple constraint dicts for the bucket anti-filter.

    ``exact=True`` (DELETE DATA) rejects variables. DELETE WHERE templates with
    a variable shared across two patterns would need join-then-delete — reject.
    """
    seen_vars: dict[str, int] = {}
    cons = []
    for i, (s, p, o, g) in enumerate(quads):
        c: dict = {}
        local: list[str] = []
        for t, key in ((s, "subj"), (p, "pred"), (o, "obj")):
            if t.kind == "var":
                if exact:
                    raise ValueError(f"variable ?{t.value} illegal in DELETE DATA")
                if t.value in local or seen_vars.setdefault(t.value, i) != i:
                    raise ValueError(
                        f"?{t.value} repeated across/within DELETE WHERE patterns"
                        " — join-constrained templates are not supported"
                    )
                local.append(t.value)
        if s.kind != "var":
            c["subj"], c["s_kind"] = s.value, _term_kind(s)
        if p.kind != "var":
            if p.kind != "iri":
                raise ValueError("predicate pattern must be an IRI or variable")
            c["pred"] = p.value
        if o.kind != "var":
            c["obj"], c["o_kind"] = o.value, _term_kind(o)
            if o.kind == "lit":
                lang, dt = _lit_fields(o)
                c["o_lang"], c["o_dt"] = lang or "", dt or ""
        if g is not None and g.kind != "var":
            c["graph"] = g.value
        if not c:
            raise ValueError("refusing DELETE WHERE { ?s ?p ?o } — unconstrained "
                             "wholesale deletion (drop the state dir instead)")
        cons.append(c)
    return cons


def _combo_ok(combo: str, c: dict) -> bool:
    pred, s_kind, o_kind, lang, dt, _cls = combo.split(_SEP)
    if "pred" in c and pred != c["pred"]:
        return False
    if "s_kind" in c and int(s_kind) != c["s_kind"]:
        return False
    if "o_kind" in c and int(o_kind) != c["o_kind"]:
        return False
    if "o_lang" in c and (lang, dt) != (c["o_lang"], c["o_dt"]):
        return False
    return True


_DELETE_STATS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n_before", pa.int64()),
        ("n_removed", pa.int64()),
        ("n_after", pa.int64()),
    ]
)


def quad_state_delete(state_dir: str, constraints: list[dict]) -> list[dict]:
    """Exchange-free anti-filter: drop every quad matching ANY constraint.

    Same scale shape as quad_state_retract (incremental.py:382): constraints
    ship once via ray.put, one task per bucket rewrites its own files into one
    convergent content-tagged generation. Returns per-bucket lineage rows."""
    import pyarrow.fs as pafs

    ref = ray.put(constraints)
    fs, root = fs_for(state_dir)
    sel = pafs.FileSelector(root, recursive=False)
    dirs = sorted(
        f.path for f in fs.get_file_info(sel) if f.type == pafs.FileType.Directory
    )
    if not dirs:
        return []

    def delete_dir(t: pa.Table) -> pa.Table:
        cons = ray.get(ref)
        rows = []
        for d in t["dir"].to_pylist():
            files = fs_list_parquet(d)
            if not files:
                continue
            quads = pa.concat_tables([fs_read_table(f) for f in files])
            n_before = quads.num_rows
            combo = pc.cast(quads["combo"], pa.large_string())
            uniq = pc.unique(combo).to_pylist()
            remove = pa.array([False] * n_before, pa.bool_())
            for c in cons:
                ok = [u for u in uniq if _combo_ok(u, c)]
                if not ok:
                    continue
                m = pc.is_in(combo, value_set=pa.array(ok, pa.large_string()))
                for col, key in (("subj", "subj"), ("obj", "obj"), ("graph", "graph")):
                    if key in c:
                        m = pc.and_(
                            m,
                            pc.equal(
                                pc.cast(quads[col], pa.large_string()), c[key]
                            ),
                        )
                remove = pc.or_(remove, m)
            kept = quads.filter(pc.invert(remove))
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
            return _DELETE_STATS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_DELETE_STATS_SCHEMA)

    items = [{"dir": d} for d in dirs]
    return (
        ray.data.from_items(items)
        .map_batches(delete_dir, batch_format="pyarrow", batch_size=1)
        .take_all()
    )


# ---------------------------------------------------------------------------
# Graph management: CLEAR / DROP / CREATE / ADD / MOVE / COPY / LOAD
# ---------------------------------------------------------------------------

_MANAGE_STATS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n_before", pa.int64()),
        ("n_after", pa.int64()),
        ("n_retagged", pa.int64()),
    ]
)


def _state_dirs(state_dir: str) -> list[str]:
    import pyarrow.fs as pafs

    fs, root = fs_for(state_dir)
    sel = pafs.FileSelector(root, recursive=False)
    try:
        infos = fs.get_file_info(sel)
    except FileNotFoundError:
        return []
    return sorted(
        f.path for f in infos if f.type == pafs.FileType.Directory
    )


def quad_state_graphs(state_dir: str) -> set[str]:
    """Distinct graph IRIs in the state — per-bucket DISTINCT, enum-scale
    driver traffic (graph names only, never quads)."""
    dirs = _state_dirs(state_dir)
    if not dirs:
        return set()

    def uniq(b: pa.Table) -> pa.Table:
        gs: set[str] = set()
        for d in b["dir"].to_pylist():
            for f in fs_list_parquet(d):
                col = fs_read_table(f, columns=["graph"]).column("graph")
                gs.update(pc.unique(pc.cast(col, pa.large_string())).to_pylist())
        return pa.table({"graph": pa.array(sorted(gs), pa.large_string())})

    rows = (
        ray.data.from_items([{"dir": d} for d in dirs])
        .map_batches(uniq, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
    return {r["graph"] for r in rows}


def _graph_rewrite(
    state_dir: str,
    kind: str,
    graphs: set[str] | None = None,
    src: str | None = None,
    dst: str | None = None,
) -> list[dict]:
    """Per-bucket graph retag / drop — the exchange-free shape shared with
    quad_state_retract: the bucket key is hash(combo, subj), independent of
    graph, so every graph op is local to a bucket's own files. ``kind`` is
    'clear' (drop ``graphs``; None = everything), 'add' (union src rows
    retagged to dst), 'copy' (dst := src) or 'move' (copy + drop src).
    Convergent: rerunning writes the identical content-tagged generation."""
    from ..stages.incremental import QUAD_COLS

    spec = {
        "kind": kind,
        "graphs": sorted(graphs) if graphs is not None else None,
        "src": src,
        "dst": dst,
    }
    ref = ray.put(spec)
    dirs = _state_dirs(state_dir)
    if not dirs:
        return []

    def rewrite_dir(t: pa.Table) -> pa.Table:
        sp = ray.get(ref)
        rows = []
        for d in t["dir"].to_pylist():
            files = fs_list_parquet(d)
            if not files:
                continue
            quads = pa.concat_tables([fs_read_table(f) for f in files])
            n_before = quads.num_rows
            df = pl.from_arrow(quads)
            g = pl.col("graph").cast(pl.Utf8)
            n_retag = 0
            if sp["kind"] == "clear":
                new = (
                    df.filter(~g.is_in(sp["graphs"]))
                    if sp["graphs"] is not None
                    else df.clear()
                )
            else:
                s, t2 = sp["src"], sp["dst"]
                retag = df.filter(g == s).with_columns(
                    pl.lit(t2).cast(df.schema["graph"]).alias("graph")
                )
                n_retag = retag.height
                if sp["kind"] == "add":
                    base = df
                elif sp["kind"] == "copy":
                    base = df.filter(g != t2)
                else:  # move
                    base = df.filter(~g.is_in([s, t2]))
                new = pl.concat(
                    [base, retag.select(base.columns)]
                ).unique(subset=QUAD_COLS)
            bucket = int(d.rstrip("/").rsplit("=", 1)[1])
            changed = new.height != n_before or n_retag > 0
            if changed and new.height == 0:
                fs_rmtree(d)
            elif changed:
                _write_bucket(state_dir, bucket, new)
            rows.append(
                {
                    "bucket": bucket,
                    "n_before": n_before,
                    "n_after": new.height,
                    "n_retagged": n_retag,
                }
            )
        if not rows:
            return _MANAGE_STATS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_MANAGE_STATS_SCHEMA)

    return (
        ray.data.from_items([{"dir": d} for d in dirs])
        .map_batches(rewrite_dir, batch_format="pyarrow", batch_size=1)
        .take_all()
    )


def _load_graph(
    state_dir: str, spec: dict, num_buckets: int, namespaces
) -> list[dict]:
    """LOAD <uri> (INTO GRAPH g): read a local parquet / JSONL(.gz) file in
    the extract schema and merge it as a routed delta — only the loaded
    quads cross the exchange (quad_state_merge semantics)."""
    import os

    uri = spec["uri"]
    path = uri[len("file://"):] if uri.startswith("file://") else uri
    if not os.path.exists(path):
        if spec["silent"]:
            return []
        raise ValueError(f"LOAD <{uri}>: source not found (use LOAD SILENT)")
    if path.endswith(".parquet"):
        ds = ray.data.read_parquet(path)
    elif path.endswith((".jsonl", ".jsonl.gz", ".json")):
        from ..sources.jsonl import read_jsonl

        ds = read_jsonl(path)
    else:
        raise ValueError(
            f"LOAD <{uri}>: unsupported format (parquet / jsonl / jsonl.gz)"
        )
    into = spec["into"]

    def norm(b: pa.Table) -> pa.Table:
        cols = set(b.column_names)
        need = {"subj", "pred", "obj"}
        if not need <= cols:
            raise ValueError(
                f"LOAD source must carry the extract schema columns {sorted(need)}"
            )
        n = b.num_rows

        def col(name, default, typ):
            if name in cols:
                return pc.cast(b[name], typ)
            return pa.array([default] * n, typ)

        if into is not None:
            graph = pa.array([into] * n, pa.string())
        else:
            graph = col("graph", DEFAULT_GRAPH, pa.string())
        return pa.table(
            {
                "subj": pc.cast(b["subj"], pa.string()),
                "s_kind": col("s_kind", KIND_IRI, pa.int8()),
                "pred": pc.cast(b["pred"], pa.string()),
                "obj": pc.cast(b["obj"], pa.string()),
                "o_kind": col("o_kind", KIND_IRI, pa.int8()),
                "o_lang": col("o_lang", None, pa.string()),
                "o_dt": col("o_dt", None, pa.string()),
                "graph": graph,
            }
        )

    delta = ds.map_batches(norm, batch_format="pyarrow")
    return quad_state_merge(route(delta, namespaces), state_dir, num_buckets)


def quad_state_manage(
    state_dir: str, spec: dict, num_buckets: int = 64, namespaces=None
) -> list[dict]:
    """Execute one graph-management op (see the module docstring for the
    exact existence/SILENT semantics of this no-empty-graphs store)."""
    verb, silent = spec["verb"], spec["silent"]
    if verb == "LOAD":
        return _load_graph(state_dir, spec, num_buckets, namespaces)
    existing = quad_state_graphs(state_dir)
    if verb == "CREATE":
        g = spec["target"]
        if g in existing and not silent:
            raise ValueError(
                f"CREATE GRAPH <{g}>: graph already exists (use CREATE SILENT)"
            )
        return []  # the store records no empty graphs — documented no-op
    if verb in ("CLEAR", "DROP"):
        t = spec["target"]
        if t == "ALL":
            return _graph_rewrite(state_dir, "clear", graphs=None)
        if t == "DEFAULT":
            gset = {DEFAULT_GRAPH} & existing
        elif t == "NAMED":
            gset = existing - {DEFAULT_GRAPH}
        else:
            if t not in existing:
                if silent:
                    return []
                raise ValueError(
                    f"{verb} GRAPH <{t}>: no such graph (use {verb} SILENT)"
                )
            gset = {t}
        if not gset:
            return []
        return _graph_rewrite(state_dir, "clear", graphs=gset)
    # ADD / COPY / MOVE
    src, dst = spec["src"], spec["dst"]
    if src == dst:
        return []
    if src not in existing:
        if silent:
            return []
        raise ValueError(
            f"{verb}: source graph <{src}> does not exist (use {verb} SILENT)"
        )
    return _graph_rewrite(state_dir, verb.lower(), src=src, dst=dst)


def apply_update(
    state_dir: str, src: str, num_buckets: int = 64, namespaces=None
) -> list[dict]:
    """Parse + execute an UPDATE request against the quad state, op by op
    (SPARQL 1.1 says ops in a request run in order against the prior op's
    result). Returns the concatenated per-bucket lineage rows, each tagged
    with its op index and kind."""
    out = []
    for i, (kind, quads) in enumerate(parse_update(src)):
        if kind == "insert_data":
            tbl = _quads_to_table(quads)
            stats = quad_state_merge(
                route(ray.data.from_arrow(tbl), namespaces), state_dir, num_buckets
            )
        elif kind == "insert_where":
            tmpl, where = quads
            stats = quad_state_insert_where(
                state_dir, tmpl, where, num_buckets, namespaces
            )
        elif kind == "modify":
            del_tmpl, ins_tmpl, where = quads
            stats = quad_state_modify(
                state_dir, del_tmpl, ins_tmpl, where, num_buckets, namespaces
            )
        elif kind == "manage":
            stats = quad_state_manage(state_dir, quads, num_buckets, namespaces)
        else:
            cons = _quads_to_constraints(quads, exact=(kind == "delete_data"))
            stats = quad_state_delete(state_dir, cons)
        tag = (
            f"manage_{quads['verb'].lower()}" if kind == "manage" else kind
        )
        for r in stats:
            out.append({"op": i, "kind": tag, **r})
    return out


# ---------------------------------------------------------------------------
# INSERT { template } WHERE { BGP } — pattern-driven insert over the state.
# ---------------------------------------------------------------------------

#: the template/WHERE var binding encoding: kind SEP lang SEP dt SEP value —
#: the three fixed-vocabulary fields lead, so splitn(3 seps) recovers the
#: value exactly even if it contains U+001F
def _enc_cols(kind, lang, dt, value) -> pa.Array:
    ls = pa.large_string()
    return pc.binary_join_element_wise(
        pc.cast(kind, ls),
        pc.cast(lang, ls),
        pc.cast(dt, ls),
        pc.cast(value, ls),
        pa.scalar(_SEP, ls),
    )


def state_quads(state_dir: str) -> ray.data.Dataset:
    """The state's DISTINCT quads re-expanded to the extract schema + graph
    (combo -> pred/s_kind/o_kind/o_lang/o_dt) — one task per bucket, no
    exchange; the WHERE side of INSERT..WHERE matches against this."""
    import pyarrow.fs as pafs

    from ..util import fs_for

    fs, root = fs_for(state_dir)
    sel = pafs.FileSelector(root, recursive=False)
    dirs = sorted(
        f.path for f in fs.get_file_info(sel) if f.type == pafs.FileType.Directory
    )

    def read_dir(b: pa.Table) -> pa.Table:
        outs = []
        for d in b["dir"].to_pylist():
            files = fs_list_parquet(d)
            if not files:
                continue
            quads = pa.concat_tables([fs_read_table(f) for f in files])
            df = pl.from_arrow(quads)
            df = (
                df.with_columns(
                    pl.col("combo")
                    .cast(pl.Utf8)
                    .str.splitn(_SEP, 6)
                    .struct.rename_fields(
                        ["pred", "s_kind", "o_kind", "o_lang", "o_dt", "_cls"]
                    )
                    .alias("_c")
                )
                .unnest("_c")
                .select(
                    pl.col("subj").cast(pl.Utf8),
                    pl.col("s_kind").cast(pl.Int8),
                    pl.col("pred"),
                    pl.col("obj").cast(pl.Utf8),
                    pl.col("o_kind").cast(pl.Int8),
                    pl.when(pl.col("o_lang") == "")
                    .then(None)
                    .otherwise(pl.col("o_lang"))
                    .alias("o_lang"),
                    pl.when(pl.col("o_dt") == "")
                    .then(None)
                    .otherwise(pl.col("o_dt"))
                    .alias("o_dt"),
                    pl.col("graph").cast(pl.Utf8),
                )
            )
            outs.append(df.to_arrow())
        if not outs:
            return pa.schema(
                [
                    ("subj", pa.string()),
                    ("s_kind", pa.int8()),
                    ("pred", pa.string()),
                    ("obj", pa.string()),
                    ("o_kind", pa.int8()),
                    ("o_lang", pa.string()),
                    ("o_dt", pa.string()),
                    ("graph", pa.string()),
                ]
            ).empty_table()
        return pa.concat_tables(outs, promote_options="default")

    items = [{"dir": d} for d in dirs]
    return ray.data.from_items(items).map_batches(
        read_dir, batch_format="pyarrow", batch_size=1
    )


def _pat_vars(pat) -> set[str]:
    s, p, o, g = pat
    terms = (s, p, o) if g is None else (s, p, o, g)
    return {t.value for t in terms if t.kind == "var"}


def _match_pattern(quads: ray.data.Dataset, pat) -> ray.data.Dataset:
    """One triple pattern -> DISTINCT binding rows, columns ``b_<var>``
    (term-encoded). Constants become vectorized equality filters; a variable
    repeated within the pattern becomes an equality filter between its two
    positions. A pattern with graph=None ranges over the union of graphs."""
    from ray.data.aggregate import Count

    s, p, o, g = pat
    names = sorted(_pat_vars(pat))
    if not names:
        raise ValueError("WHERE pattern with no variables is unsupported")

    def fn(b: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(b.num_rows, np.bool_))
        if s.kind != "var":
            mask = pc.and_(mask, pc.equal(b["subj"], s.value))
            mask = pc.and_(mask, pc.equal(b["s_kind"], _term_kind(s)))
        if p.kind != "var":
            mask = pc.and_(mask, pc.equal(b["pred"], p.value))
        if o.kind != "var":
            mask = pc.and_(mask, pc.equal(b["obj"], o.value))
            mask = pc.and_(mask, pc.equal(b["o_kind"], _term_kind(o)))
            if o.kind == "lit":
                lang, dt = _lit_fields(o)
                mask = pc.and_(
                    mask, pc.equal(pc.coalesce(b["o_lang"], ""), lang or "")
                )
                mask = pc.and_(mask, pc.equal(pc.coalesce(b["o_dt"], ""), dt or ""))
        if g is not None and g.kind != "var":
            mask = pc.and_(mask, pc.equal(b["graph"], g.value))
        t = b.filter(mask)
        empty = pa.array([""] * t.num_rows, pa.string())
        enc: dict[str, pa.Array] = {}
        terms = [
            (s, t["s_kind"], t["subj"], empty, empty),
            (p, None, t["pred"], empty, empty),
            (o, t["o_kind"], t["obj"], pc.coalesce(t["o_lang"], ""), pc.coalesce(t["o_dt"], "")),
        ]
        if g is not None and g.kind == "var":
            terms.append((g, None, t["graph"], empty, empty))
        # Build ALL encodings from the unfiltered t first; within-pattern
        # repeated-variable equalities accumulate into one row mask applied
        # at the end. (Filtering enc in place mid-loop would desync lengths
        # against encodings built later — e.g. GRAPH ?g { ?x <p> ?x }.)
        keep = None
        for term, kind_col, val_col, lang_col, dt_col in terms:
            if term.kind != "var":
                continue
            kind = kind_col if kind_col is not None else pa.array(
                np.full(t.num_rows, KIND_IRI, np.int8)
            )
            e = _enc_cols(kind, lang_col, dt_col, val_col)
            key = f"b_{term.value}"
            if key in enc:  # ?x p ?x — equality within the pattern
                cond = pc.equal(enc[key], e)
                keep = cond if keep is None else pc.and_(keep, cond)
            else:
                enc[key] = e
        out = pa.table({k: enc[k] for k in sorted(enc)})
        return out if keep is None else out.filter(keep)

    cols = [f"b_{v}" for v in names]
    return (
        quads.map_batches(fn, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Count(alias_name="_m"))
        .select_columns(cols)
    )


def _solutions(quads: ray.data.Dataset, body) -> tuple[ray.data.Dataset, set[str]]:
    """Join the body patterns' binding tables on shared variables (first
    shared var through one key-partitioned hash_join, further shared vars as
    post-join equality filters). Patterns are joined in request order; a
    pattern sharing NO variable with the running solution would be a
    cartesian product and is rejected."""
    from ..relational import hash_join

    sol = _match_pattern(quads, body[0])
    bound = _pat_vars(body[0])
    for pat in body[1:]:
        vs = _pat_vars(pat)
        shared = sorted(bound & vs)
        new = sorted(vs - bound)
        if not shared:
            raise ValueError(
                "WHERE patterns must chain on shared variables "
                f"(pattern with vars {sorted(vs)} shares none with {sorted(bound)})"
            )
        right = _match_pattern(quads, pat)
        sol = hash_join(
            sol,
            right,
            on=f"b_{shared[0]}",
            right_cols=[f"b_{v}" for v in shared[1:] + new],
            suffix="_r",
        )

        def post(
            b: pa.Table, _extra=tuple(shared[1:]), _new=tuple(new)
        ) -> pa.Table:
            # extra shared vars: equality filter, drop the right copy;
            # new vars: strip hash_join's disambiguation suffix
            m = pa.array(np.ones(b.num_rows, np.bool_))
            for v in _extra:
                m = pc.and_(m, pc.equal(b[f"b_{v}"], b[f"b_{v}_r"]))
            t = b.filter(m).drop_columns([f"b_{v}_r" for v in _extra])
            return t.rename_columns(
                [
                    c[: -len("_r")] if c.endswith("_r") and c[: -len("_r")] in
                    {f"b_{v}" for v in _new} else c
                    for c in t.column_names
                ]
            )

        sol = sol.map_batches(post, batch_format="pyarrow")
        bound |= vs
    return sol, bound


def _instantiate(sol: ray.data.Dataset, tmpl, tvars: set[str]) -> ray.data.Dataset:
    """Template x solutions -> extract-schema quad rows (vectorized decode;
    ill-formed instantiations — literal subjects, non-IRI predicates — are
    skipped per SPARQL 1.1). Template GRAPH may be a constant or a bound
    variable; triples outside GRAPH land in the default graph."""

    def inst(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        for v in sorted(tvars):
            df = df.with_columns(
                pl.col(f"b_{v}")
                .cast(pl.Utf8)
                .str.splitn(_SEP, 4)
                .struct.rename_fields([f"k_{v}", f"l_{v}", f"d_{v}", f"v_{v}"])
                .alias(f"s_{v}")
            ).unnest(f"s_{v}")
        outs = []
        for s, p, o, g in tmpl:
            def val(t, dflt_kind):
                if t.kind == "var":
                    return (
                        pl.col(f"v_{t.value}"),
                        pl.col(f"k_{t.value}").cast(pl.Int8),
                        pl.when(pl.col(f"l_{t.value}") == "")
                        .then(None)
                        .otherwise(pl.col(f"l_{t.value}")),
                        pl.when(pl.col(f"d_{t.value}") == "")
                        .then(None)
                        .otherwise(pl.col(f"d_{t.value}")),
                    )
                lang, dt = _lit_fields(t)
                return (
                    pl.lit(t.value),
                    pl.lit(_term_kind(t)).cast(pl.Int8),
                    pl.lit(lang, dtype=pl.Utf8),
                    pl.lit(dt, dtype=pl.Utf8),
                )

            sv, sk, _sl, _sd = val(s, KIND_IRI)
            pv, pk, _pl_, _pd = val(p, KIND_IRI)
            ov, ok, olang, odt = val(o, KIND_IRI)
            if g is None:
                gexpr = pl.lit(DEFAULT_GRAPH)
            elif g.kind == "var":
                gexpr = pl.col(f"v_{g.value}")
            else:
                gexpr = pl.lit(g.value)
            row = df.select(
                sv.alias("subj"),
                sk.alias("s_kind"),
                pv.alias("pred"),
                ov.alias("obj"),
                ok.alias("o_kind"),
                olang.cast(pl.Utf8).alias("o_lang"),
                odt.cast(pl.Utf8).alias("o_dt"),
                gexpr.alias("graph"),
                pk.alias("_pk"),
            )
            # SPARQL 1.1: skip ill-formed instantiations rather than failing
            row = row.filter(
                (pl.col("s_kind") != KIND_LITERAL) & (pl.col("_pk") == KIND_IRI)
            ).drop("_pk")
            outs.append(row.to_arrow())
        out = pa.concat_tables(outs, promote_options="default")
        # polars emits large_string; the route encoder's combo kernel expects
        # the extract path's plain-string schema
        return out.cast(
            pa.schema(
                [
                    ("subj", pa.string()),
                    ("s_kind", pa.int8()),
                    ("pred", pa.string()),
                    ("obj", pa.string()),
                    ("o_kind", pa.int8()),
                    ("o_lang", pa.string()),
                    ("o_dt", pa.string()),
                    ("graph", pa.string()),
                ]
            )
        )

    return sol.map_batches(inst, batch_format="pyarrow")


_MODIFY_STATS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n_before", pa.int64()),
        ("n_removed", pa.int64()),
        ("n_after", pa.int64()),
    ]
)


def quad_state_delete_quads(
    state_dir: str, routed_delta: ray.data.Dataset, num_buckets: int = 64
) -> list[dict]:
    """Exact-quad deletion of a request-derived quad SET (the delete side of
    a Modify): the delete delta is routed with the SAME bucket function as
    the state build, so each bucket's removals arrive at the one task that
    owns its files; per-bucket polars ANTI-join + convergent content-tagged
    rewrite. Only the delete delta crosses the exchange; untouched buckets
    are never read. Quads in the delta that are absent from the state are
    no-ops (SPARQL set semantics)."""
    from ..stages.fold import _decode_dicts
    from ..stages.incremental import QUAD_COLS, _add_bucket, _bucket_dir
    from ..util import fs_exists

    def apply(t: pa.Table) -> pa.Table:
        t = _decode_dicts(t)
        df = pl.from_arrow(t)
        rows = []
        for key, grp in df.partition_by("bucket", as_dict=True).items():
            b = int(key[0])
            dels = grp.select(QUAD_COLS).unique()
            d = _bucket_dir(state_dir, b)
            if not fs_exists(d):
                continue
            files = fs_list_parquet(d)
            if not files:
                continue
            old = pl.concat(
                [pl.from_arrow(fs_read_table(f)) for f in files]
            )
            kept = old.join(dels, on=QUAD_COLS, how="anti")
            if kept.height == 0:
                fs_rmtree(d)
            elif kept.height != old.height:
                _write_bucket(state_dir, b, kept)
            rows.append(
                {
                    "bucket": b,
                    "n_before": old.height,
                    "n_removed": old.height - kept.height,
                    "n_after": kept.height,
                }
            )
        if not rows:
            return _MODIFY_STATS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_MODIFY_STATS_SCHEMA)

    return (
        routed_delta.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(apply, batch_format="pyarrow", batch_size=None)
        .take_all()
    )


def quad_state_modify(
    state_dir: str,
    del_tmpl,
    ins_tmpl,
    body,
    num_buckets: int = 64,
    namespaces=None,
) -> list[dict]:
    """The SPARQL 1.1 Modify operation — ``DELETE { t } INSERT { t } WHERE
    { BGP }`` (either template may be empty): the WHERE BGP is evaluated
    ONCE against the pre-state (distributed binding joins; GRAPH ?g binds
    the graph), BOTH templates are instantiated from the same solution set
    and MATERIALIZED before any mutation (spec semantics: deletes and
    inserts are computed against the state as it was), then deletes apply
    as per-bucket anti-joins and inserts as a delta merge — in both
    directions only request-derived quads cross an exchange.

    Idempotency caveat (documented, matches the spec): a Modify whose
    delete side consumes its own WHERE matches converges after one run;
    re-running finds no solutions and is a no-op."""
    from ray.data.aggregate import Count

    tvars: set[str] = set()
    for q in list(del_tmpl) + list(ins_tmpl):
        tvars |= _pat_vars(q)
    sol, bound = _solutions(state_quads(state_dir), body)
    missing = tvars - bound
    if missing:
        raise ValueError(f"template variables unbound in WHERE: {sorted(missing)}")
    proj = [f"b_{v}" for v in sorted(tvars)]
    if proj:
        sol = sol.groupby(proj).aggregate(Count(alias_name="_m")).select_columns(proj)
    # Pin the solution set once: both templates instantiate from it, and
    # without this the whole WHERE evaluation (state scan + joins) would
    # re-execute inside each delta's materialize().
    sol = sol.materialize()
    # materialize BOTH deltas before mutating: the instantiation pipelines
    # read the state's bucket files lazily — mutating first would race the
    # reads (and break pre-state semantics)
    del_delta = (
        route(_instantiate(sol, del_tmpl, tvars), namespaces).materialize()
        if del_tmpl
        else None
    )
    ins_delta = (
        route(_instantiate(sol, ins_tmpl, tvars), namespaces).materialize()
        if ins_tmpl
        else None
    )
    out: list[dict] = []
    if del_delta is not None:
        for r in quad_state_delete_quads(state_dir, del_delta, num_buckets):
            out.append({"phase": "delete", **r})
    if ins_delta is not None:
        for r in quad_state_merge(ins_delta, state_dir, num_buckets):
            out.append({"phase": "insert", **r})
    return out


def quad_state_insert_where(
    state_dir: str, tmpl, body, num_buckets: int = 64, namespaces=None
) -> list[dict]:
    """INSERT { template } WHERE { BGP } — Modify with an empty delete side
    (see :func:`quad_state_modify`)."""
    return quad_state_modify(state_dir, [], tmpl, body, num_buckets, namespaces)
