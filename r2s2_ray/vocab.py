"""Vocabulary of the transcript->KG extraction spec.

The reference ingests RDF files; this engine's front end (per BASELINE.json
``north_rule``) extracts (subj, pred, obj) triples from conversation transcripts.
This module is the single source of truth for the extraction vocabulary — predicates,
classes, the entity gazetteer with alias groups (entity linking), and graph
assignment — shared by the pure-Python oracle extractor, the vectorized Ray extractor,
and the DuckDB oracle-SQL generators, so all three implement the identical spec.
"""

from __future__ import annotations

EX = "https://ex.org/vocab/"
ENT = "https://ex.org/entity/"
CONV = "https://ex.org/conv/"
DOC = "https://ex.org/doc/"
SRC = "https://ex.org/source/"
GRAPHS = "https://graphs.example.org/"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# predicates
P_HAS_TURN = EX + "hasTurn"
P_TURN_INDEX = EX + "turnIndex"
P_ROLE = EX + "role"
P_TEXT = EX + "text"
P_TS = EX + "ts"
P_TOOL = EX + "tool"
P_INVOCATION = EX + "invocation"
P_TOOL_NAME = EX + "toolName"
P_MENTIONS = EX + "mentions"
P_REFERENCES = EX + "references"
P_LANGUAGE = EX + "language"
P_CHAR_COUNT = EX + "charCount"
P_SOURCE = EX + "source"
P_ABOUT = EX + "about"

# classes
C_CONVERSATION = EX + "Conversation"
C_TURN = EX + "Turn"
C_DOCUMENT = EX + "Document"
C_ENTITY = EX + "Entity"

#: number of named graphs; graph of a conversation = GRAPHS + f"g{doc_num % N_GRAPHS}"
N_GRAPHS = 4

#: Entity gazetteer: surface token -> itself (mention detection matches exact lowercase
#: alphabetic tokens). Sorted tuple so every consumer iterates deterministically.
GAZETTEER: tuple[str, ...] = (
    "agg",
    "batch",
    "column",
    "customer",
    "filter",
    "group",
    "hash",
    "join",
    "merge",
    "order",
    "query",
    "row",
    "scan",
    "sort",
    "spark",
    "stream",
    "table",
    "vector",
    "window",
)

#: Alias groups for entity linking/canonicalization: alias token -> canonical token.
#: Tokens absent from this map are their own canonical form.
ALIAS_TO_CANONICAL: dict[str, str] = {
    "sort": "sorting",
    "order": "sorting",
    "agg": "aggregation",
    "group": "aggregation",
    "join": "join",
    "merge": "join",
}


def canonical_entity(alias: str) -> str:
    return ALIAS_TO_CANONICAL.get(alias, alias)


def conv_iri(conv_id: str) -> str:
    return CONV + conv_id


def turn_iri(conv_id: str, turn_idx: int) -> str:
    return f"{CONV}{conv_id}/turn/{turn_idx}"


def graph_iri_for_conv(conv_id: str) -> str:
    """conv-00000042 -> https://graphs.example.org/g2 (doc_num % N_GRAPHS)."""
    return f"{GRAPHS}g{int(conv_id[5:]) % N_GRAPHS}"


def entity_iri(token: str) -> str:
    return ENT + token


def doc_iri(doc_num: int | str) -> str:
    return f"{DOC}{doc_num}"


def source_iri(source: str) -> str:
    return SRC + source
