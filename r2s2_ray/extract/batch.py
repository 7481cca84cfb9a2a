"""Vectorized triple extraction: the hot ``map_batches`` stage of the KG pipeline.

Implements exactly the spec in :mod:`r2s2_ray.extract.oracle` (R1-R11) with
``pyarrow.compute`` kernels only — no per-row Python in the hot path. Shipped as a
callable CLASS (``TripleExtractor``) so it runs on a Ray actor pool
(``map_batches(TripleExtractor, concurrency=N, batch_format="pyarrow")``): the
gazetteer value-set arrays and constant scalars are built once per actor in
``__init__`` (the stateful-stage pattern replacing the reference's shared writer
registry, ParseIntoSOGTables.java:66-80).

Output "lean triple" batch schema (one row per triple):
  subj:string, s_kind:int8, pred:string, obj:string, o_kind:int8,
  o_lang:string, o_dt:string, graph:string
IRI decomposition into the 9 part columns happens later, per materialized table
(:mod:`r2s2_ray.stages.materialize`) — shuffling lean rows is ~3x narrower than
shuffling decomposed ones, which matters because dedup + sort are the all-to-all
exchanges (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import vocab
from ..terms import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_TYPE,
    XSD_DATETIME,
    XSD_INTEGER,
    XSD_STRING,
)

TRIPLE_SCHEMA = pa.schema(
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

_NULL_STR = pa.scalar(None, pa.string())


def _flat(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _cc(*parts):
    """element-wise concat; string scalars broadcast."""
    conv = [
        p if isinstance(p, (pa.Array, pa.ChunkedArray)) else pa.scalar(str(p))
        for p in parts
    ]
    return pc.binary_join_element_wise(*conv, "")


def _arr(x, n, typ=pa.string()):
    if isinstance(x, pa.ChunkedArray):
        return x.combine_chunks()
    if isinstance(x, pa.Array):
        return x
    return pa.nulls(n, typ) if x is None else pa.array([x] * n, typ)


def triples(n, subj, s_kind, pred, obj, o_kind, o_lang=None, o_dt=None, graph=None) -> pa.Table:
    return pa.table(
        {
            "subj": _arr(subj, n),
            "s_kind": _arr(s_kind, n, pa.int8()) if not isinstance(s_kind, int) else pa.array([s_kind] * n, pa.int8()),
            "pred": _arr(pred, n),
            "obj": _arr(obj, n),
            "o_kind": _arr(o_kind, n, pa.int8()) if not isinstance(o_kind, int) else pa.array([o_kind] * n, pa.int8()),
            "o_lang": _arr(o_lang, n),
            "o_dt": _arr(o_dt, n),
            "graph": _arr(graph, n),
        },
        schema=TRIPLE_SCHEMA,
    )


class TripleExtractor:
    """Actor-pool batch extractor; transcripts in, lean triples out."""

    def __init__(self) -> None:
        self.gaz = pa.array(list(vocab.GAZETTEER), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return TRIPLE_SCHEMA.empty_table()
        conv_id = _flat(batch["conv_id"])
        turn_idx = batch["turn_idx"]
        idx_str = pc.cast(turn_idx, pa.string())
        text = _flat(batch["text"])
        tool = batch["tool"]
        T = _flat(_cc(vocab.CONV, conv_id, "/turn/", idx_str))
        C = _flat(_cc(vocab.CONV, conv_id))
        conv_num = pc.cast(pc.utf8_slice_codeunits(conv_id, 5, 32), pa.int64()).to_numpy()
        G = _flat(_cc(
            f"{vocab.GRAPHS}g", pa.array((conv_num % vocab.N_GRAPHS).astype("U"), pa.string())
        ))
        if "graph" in batch.column_names:
            # M1 graph defaulting (ParseIntoSOGTables.java:354-357): an explicit
            # per-file graph wins; a null falls back to the derived graph
            G = _flat(pc.coalesce(batch["graph"], G))

        out = [
            # R1 / R2 / R3 / R4 / R6
            triples(n, T, KIND_IRI, RDF_TYPE, vocab.C_TURN, KIND_IRI, graph=G),
            triples(n, C, KIND_IRI, vocab.P_HAS_TURN, T, KIND_IRI, graph=G),
            triples(n, T, KIND_IRI, vocab.P_TURN_INDEX, idx_str, KIND_LITERAL, o_dt=XSD_INTEGER, graph=G),
            triples(n, T, KIND_IRI, vocab.P_ROLE, batch["role"], KIND_LITERAL, o_dt=XSD_STRING, graph=G),
            triples(
                n, T, KIND_IRI, vocab.P_TS,
                # cast to seconds first: Arrow's %S emits fractional digits, the
                # spec (and DuckDB's strftime) wants whole seconds
                pc.strftime(pc.cast(batch["ts"], pa.timestamp("s")), format="%Y-%m-%dT%H:%M:%S"),
                KIND_LITERAL, o_dt=XSD_DATETIME, graph=G,
            ),
        ]

        # R5: text, lang-tagged when prefixed "[ll] "
        ext = pc.extract_regex(text, r"^\[(?P<lang>[a-z]{2})\] (?P<rest>(?s:.*))$")
        has_lang = pc.is_valid(ext)
        lang_f = pc.struct_field(ext, "lang")
        rest_f = pc.struct_field(ext, "rest")
        out.append(
            triples(
                n, T, KIND_IRI, vocab.P_TEXT,
                pc.if_else(has_lang, rest_f, text), KIND_LITERAL,
                o_lang=pc.if_else(has_lang, lang_f, _NULL_STR),
                o_dt=pc.if_else(has_lang, _NULL_STR, pa.scalar(XSD_STRING)),
                graph=G,
            )
        )

        # R7: tool turns -> tool literal + invocation bnode + bnode toolName
        tmask = pc.is_valid(tool)
        if pc.any(tmask).as_py():
            sel = pc.filter(pa.table({"T": T, "conv": conv_id, "idx": idx_str, "tool": tool, "G": G}), tmask)
            m = sel.num_rows
            b = _flat(_cc("_:inv_", sel["conv"], "_", sel["idx"]))
            out.append(triples(m, sel["T"], KIND_IRI, vocab.P_TOOL, sel["tool"], KIND_LITERAL, o_dt=XSD_STRING, graph=sel["G"]))
            out.append(triples(m, sel["T"], KIND_IRI, vocab.P_INVOCATION, b, KIND_BNODE, graph=sel["G"]))
            out.append(triples(m, b, KIND_BNODE, vocab.P_TOOL_NAME, sel["tool"], KIND_LITERAL, o_dt=XSD_STRING, graph=sel["G"]))

        # R8: "Tell me about document <d> from <s>."
        ext = pc.extract_regex(text, r"^Tell me about document (?P<d>\d+) from (?P<s>[A-Za-z0-9]+)\.$")
        mask = pc.is_valid(ext)
        if pc.any(mask).as_py():
            sel = pc.filter(pa.table({"C": C, "G": G, "d": pc.struct_field(ext, "d"), "s": pc.struct_field(ext, "s")}), mask)
            m = sel.num_rows
            D = _flat(_cc(vocab.DOC, sel["d"]))
            out.append(triples(m, sel["C"], KIND_IRI, RDF_TYPE, vocab.C_CONVERSATION, KIND_IRI, graph=sel["G"]))
            out.append(triples(m, sel["C"], KIND_IRI, vocab.P_ABOUT, D, KIND_IRI, graph=sel["G"]))
            out.append(triples(m, D, KIND_IRI, RDF_TYPE, vocab.C_DOCUMENT, KIND_IRI, graph=sel["G"]))
            out.append(triples(m, D, KIND_IRI, vocab.P_SOURCE, _cc(vocab.SRC, sel["s"]), KIND_IRI, graph=sel["G"]))

        # R9: "Document <d> is written in <l> and has <n> characters."
        ext = pc.extract_regex(text, r"^Document (?P<d>\d+) is written in (?P<l>[a-z]+) and has (?P<n>\d+) characters\.")
        mask = pc.is_valid(ext)
        if pc.any(mask).as_py():
            sel = pc.filter(
                pa.table({"G": G, "d": pc.struct_field(ext, "d"), "l": pc.struct_field(ext, "l"), "nn": pc.struct_field(ext, "n")}),
                mask,
            )
            m = sel.num_rows
            D = _flat(_cc(vocab.DOC, sel["d"]))
            out.append(triples(m, D, KIND_IRI, vocab.P_LANGUAGE, sel["l"], KIND_LITERAL, o_dt=XSD_STRING, graph=sel["G"]))
            out.append(triples(m, D, KIND_IRI, vocab.P_CHAR_COUNT, sel["nn"], KIND_LITERAL, o_dt=XSD_INTEGER, graph=sel["G"]))

        # R10: URL references — whitespace tokens containing https://
        toks = pc.utf8_split_whitespace(text)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        uext = pc.extract_regex(flat, r"(?P<url>https://(?s:.*))$")
        umask = pc.is_valid(uext)
        if pc.any(umask).as_py():
            url = pc.utf8_rtrim(pc.struct_field(uext, "url"), characters=".,")
            pi = pc.filter(parent, umask)
            out.append(
                triples(
                    len(pi), pc.take(T, pi), KIND_IRI, vocab.P_REFERENCES,
                    pc.filter(url, umask), KIND_IRI, graph=pc.take(G, pi),
                )
            )

        # R11: gazetteer mentions — distinct (turn, token)
        low = pc.utf8_lower(text)
        wtoks = pc.split_pattern_regex(low, "[^a-z]+")
        wflat = pc.list_flatten(wtoks)
        wparent = pc.list_parent_indices(wtoks)
        gmask = pc.is_in(wflat, value_set=self.gaz)
        hits = pa.table({"pi": pc.filter(wparent, gmask), "tok": pc.filter(wflat, gmask)})
        if hits.num_rows:
            distinct = hits.group_by(["pi", "tok"]).aggregate([])
            pi = distinct["pi"]
            ent = _flat(_cc(vocab.ENT, distinct["tok"]))
            m = distinct.num_rows
            out.append(triples(m, pc.take(T, pi), KIND_IRI, vocab.P_MENTIONS, ent, KIND_IRI, graph=pc.take(G, pi)))
            out.append(triples(m, ent, KIND_IRI, RDF_TYPE, vocab.C_ENTITY, KIND_IRI, graph=pc.take(G, pi)))

        return pa.concat_tables(out)


def extract_triples(transcripts, **map_kwargs):
    """transcripts Dataset -> lean triple Dataset (streaming, no shuffle).

    ``batch_size=None`` on purpose: a positive batch_size makes Ray BUNDLE input
    blocks until a task holds that many input rows — on a small corpus that
    collapses the whole fused extract chain into one task (zero parallelism).
    Task granularity belongs to upstream block sizing (util.fan_out /
    target_max_block_size), not to a row quota here."""
    kwargs = dict(batch_format="pyarrow", batch_size=None, concurrency=None)
    kwargs.update(map_kwargs)
    if kwargs.get("concurrency") is None:
        kwargs.pop("concurrency")
        return transcripts.map_batches(TripleExtractor(), **kwargs)
    return transcripts.map_batches(TripleExtractor, **kwargs)
