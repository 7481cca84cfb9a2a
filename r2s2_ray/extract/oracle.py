"""Single-threaded pure-Python reference extractor — the SPEC for transcript->triple
extraction (FIXTURES.md §A oracle). The distributed vectorized extractor
(:mod:`r2s2_ray.extract.batch`) must emit exactly this triple set; the P/R>=0.95 gate
(BASELINE.md) is measured against it and the DuckDB SQL oracles mirror it.

A triple is the tuple
``(subj, subj_kind, pred, obj_lex, obj_kind, obj_lang, obj_dt, graph)`` where subj /
obj_lex are lexical term strings (IRIs verbatim, bnodes as ``_:label``, literals as
their lexical form), kinds are the codes in :mod:`r2s2_ray.terms`, and graph is the
named-graph IRI. Comparison is id-agnostic (term strings, never internal ids —
SURVEY.md §7.5.2).

Per-turn rules (each also has a DuckDB-SQL mirror in __ray_entry__.py):

  R1  (T,  rdf:type, ex:Turn)                                   [every turn]
  R2  (C,  ex:hasTurn, T)                                       [every turn]
  R3  (T,  ex:turnIndex, turn_idx  ^^xsd:integer)               [every turn]
  R4  (T,  ex:role, role ^^xsd:string)                          [every turn]
  R5  (T,  ex:text, ...) — if text matches ``^[ll] rest`` the object is rest@ll
      (lang-tagged), else the raw text ^^xsd:string             [every turn]
  R6  (T,  ex:ts, strftime(%Y-%m-%dT%H:%M:%S) ^^xsd:dateTime)   [every turn]
  R7  tool turns: (T, ex:tool, tool ^^xsd:string),
      (T, ex:invocation, _:inv_<conv>_<idx>),
      (_:inv_<conv>_<idx>, ex:toolName, tool ^^xsd:string)
  R8  turn matching "Tell me about document <d> from <s>.":
      (C, rdf:type, ex:Conversation), (C, ex:about, D),
      (D, rdf:type, ex:Document), (D, ex:source, <source-iri>)
  R9  turn matching "Document <d> is written in <l> and has <n> characters.":
      (D, ex:language, l ^^xsd:string), (D, ex:charCount, n ^^xsd:integer)
  R10 every whitespace token containing ``https://``: substring from the scheme to the
      end, trailing ``.``/``,`` stripped -> (T, ex:references, <url>)
  R11 every distinct lowercase-alpha token in the GAZETTEER ->
      (T, ex:mentions, ent:<token>) and (ent:<token>, rdf:type, ex:Entity)

Graph = ``https://graphs.example.org/g{doc_num % 4}`` from the conv_id
(vocab.graph_iri_for_conv). Entity linking (alias->canonical) is a SEPARATE stage
(:mod:`r2s2_ray.linking`); this extractor emits raw surface-form entities.
"""

from __future__ import annotations

import re
from typing import Iterable

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

Triple = tuple[str, int, str, str, int, str | None, str | None, str]

_TOKEN = re.compile(r"[a-z]+")
_LANG_TEXT = re.compile(r"^\[([a-z]{2})\] (.*)$", re.S)
_ABOUT = re.compile(r"^Tell me about document (\d+) from ([A-Za-z0-9]+)\.$")
_WRITTEN = re.compile(r"^Document (\d+) is written in ([a-z]+) and has (\d+) characters\.")
_GAZ = set(vocab.GAZETTEER)


def extract_turn(
    conv_id: str, turn_idx: int, role: str, text: str, tool: str | None, ts
) -> list[Triple]:
    """All triples for one turn, per the rules above. ``ts`` is a datetime."""
    T = vocab.turn_iri(conv_id, turn_idx)
    C = vocab.conv_iri(conv_id)
    G = vocab.graph_iri_for_conv(conv_id)
    out: list[Triple] = [
        (T, KIND_IRI, RDF_TYPE, vocab.C_TURN, KIND_IRI, None, None, G),
        (C, KIND_IRI, vocab.P_HAS_TURN, T, KIND_IRI, None, None, G),
        (T, KIND_IRI, vocab.P_TURN_INDEX, str(turn_idx), KIND_LITERAL, None, XSD_INTEGER, G),
        (T, KIND_IRI, vocab.P_ROLE, role, KIND_LITERAL, None, XSD_STRING, G),
        (T, KIND_IRI, vocab.P_TS, ts.strftime("%Y-%m-%dT%H:%M:%S"), KIND_LITERAL, None, XSD_DATETIME, G),
    ]
    m = _LANG_TEXT.match(text)
    if m:
        out.append((T, KIND_IRI, vocab.P_TEXT, m.group(2), KIND_LITERAL, m.group(1), None, G))
    else:
        out.append((T, KIND_IRI, vocab.P_TEXT, text, KIND_LITERAL, None, XSD_STRING, G))
    if tool is not None:
        b = f"_:inv_{conv_id}_{turn_idx}"
        out.append((T, KIND_IRI, vocab.P_TOOL, tool, KIND_LITERAL, None, XSD_STRING, G))
        out.append((T, KIND_IRI, vocab.P_INVOCATION, b, KIND_BNODE, None, None, G))
        out.append((b, KIND_BNODE, vocab.P_TOOL_NAME, tool, KIND_LITERAL, None, XSD_STRING, G))
    m = _ABOUT.match(text)
    if m:
        D = vocab.doc_iri(int(m.group(1)))
        out.append((C, KIND_IRI, RDF_TYPE, vocab.C_CONVERSATION, KIND_IRI, None, None, G))
        out.append((C, KIND_IRI, vocab.P_ABOUT, D, KIND_IRI, None, None, G))
        out.append((D, KIND_IRI, RDF_TYPE, vocab.C_DOCUMENT, KIND_IRI, None, None, G))
        out.append((D, KIND_IRI, vocab.P_SOURCE, vocab.source_iri(m.group(2)), KIND_IRI, None, None, G))
    m = _WRITTEN.match(text)
    if m:
        D = vocab.doc_iri(int(m.group(1)))
        out.append((D, KIND_IRI, vocab.P_LANGUAGE, m.group(2), KIND_LITERAL, None, XSD_STRING, G))
        out.append((D, KIND_IRI, vocab.P_CHAR_COUNT, m.group(3), KIND_LITERAL, None, XSD_INTEGER, G))
    for tok in text.split():
        i = tok.find("https://")
        if i >= 0:
            url = tok[i:].rstrip(".,")
            out.append((T, KIND_IRI, vocab.P_REFERENCES, url, KIND_IRI, None, None, G))
    seen: set[str] = set()
    for tok in _TOKEN.findall(text.lower()):
        if tok in _GAZ and tok not in seen:
            seen.add(tok)
    for tok in sorted(seen):
        e = vocab.entity_iri(tok)
        out.append((T, KIND_IRI, vocab.P_MENTIONS, e, KIND_IRI, None, None, G))
        out.append((e, KIND_IRI, RDF_TYPE, vocab.C_ENTITY, KIND_IRI, None, None, G))
    return out


def extract_all(turns: Iterable[dict]) -> list[Triple]:
    """Extract over an iterable of turn dicts (conv_id, turn_idx, role, text, tool, ts)."""
    out: list[Triple] = []
    for t in turns:
        out.extend(
            extract_turn(t["conv_id"], t["turn_idx"], t["role"], t["text"], t["tool"], t["ts"])
        )
    return out
