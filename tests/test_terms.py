"""Unit tests for the core term model (FIXTURES.md §B.8 — IRI decomposition corner
cases, reference parity LoadIntoTable.java:318-368, GroupOfColumns.java:43-68)."""

import pytest

from r2s2_ray.naming import iri_to_sql_name_part
from r2s2_ray.terms import (
    IRI_PARTS,
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    TableKey,
    join_iri,
    object_columns,
    split_iri,
    split_literal,
    subject_columns,
)

ROUND_TRIP_IRIS = [
    "https://ex.org/doc/42",
    "https://ex.org/doc/42#intro",
    "https://user@ex.org:8080/p/q?x=1&y=2#frag",
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    "urn:uuid:1234-abcd",
    "mailto:someone@example.org",
    "https://ex.org",
    "https://ex.org/",
    "file:///tmp/x.txt",
    "https://ex.org/path%20with%20escape?q=a%2Fb",
]


@pytest.mark.parametrize("iri", ROUND_TRIP_IRIS)
def test_split_join_roundtrip(iri):
    parts = split_iri(iri)
    assert len(parts) == 9
    assert join_iri(parts) == iri


def test_split_host_quirk():
    # host present -> scheme_specific_part / authority stay null
    # (parity LoadIntoTable.java:328-334)
    parts = split_iri("https://user@ex.org:8080/p?x=1#f")
    d = dict(zip(IRI_PARTS, parts))
    assert d["scheme"] == "https"
    assert d["scheme_specific_part"] is None
    assert d["authority"] is None
    assert d["user_info"] == "user"
    assert d["host"] == "ex.org"
    assert d["port"] == "8080"
    assert d["path"] == "/p"
    assert d["query"] == "x=1"
    assert d["fragment"] == "f"


def test_split_opaque():
    d = dict(zip(IRI_PARTS, split_iri("urn:uuid:99#z")))
    assert d["scheme"] == "urn"
    assert d["scheme_specific_part"] == "uuid:99"
    assert d["host"] is None
    assert d["fragment"] == "z"


def test_literal_invariant():
    assert split_literal("en", None) == ("lang", "en")
    assert split_literal(None, "http://www.w3.org/2001/XMLSchema#int") == (
        "datatype",
        "http://www.w3.org/2001/XMLSchema#int",
    )
    with pytest.raises(ValueError):
        split_literal(None, None)


def test_naming_rules():
    # xsd/rdf shortcut branch (Naming.java:19-27)
    assert iri_to_sql_name_part("http://www.w3.org/2001/XMLSchema#dateTime") == "xsd_datetime"
    assert iri_to_sql_name_part("http://www.w3.org/1999/02/22-rdf-syntax-ns#type") == "rdf_type"
    # namespace-prefix branch
    assert iri_to_sql_name_part("https://ex.org/vocab/hasTurn") == "ex_hasturn"
    # base64 fallback produces a sanitised identifier
    frag = iri_to_sql_name_part("ftp://unknown.example/x")
    assert frag and all(c.isalnum() or c == "_" for c in frag)


def test_namespace_accumulation():
    """M7: unseen vocabularies get readable discovered prefixes (no Base64
    fallback), deterministically, without clobbering existing prefixes."""
    from r2s2_ray.naming import DEFAULT_NAMESPACES, discover_namespaces

    iris = [
        "https://new.example.com/onto/hasPart",
        "https://new.example.com/onto/partOf",
        "http://purl.obolibrary.org/obo/GO_0005634",
        "https://ex.org/vocab/mentions",  # covered by defaults already
    ]
    ns = discover_namespaces(iris)
    added = {k: v for k, v in ns.items() if k not in DEFAULT_NAMESPACES}
    assert added == {
        "obo": "http://purl.obolibrary.org/obo/",
        "onto": "https://new.example.com/onto/",
    }
    assert iri_to_sql_name_part("https://new.example.com/onto/hasPart", ns) == "onto_haspart"
    # deterministic under reordering
    assert discover_namespaces(list(reversed(iris))) == ns
    # prefix-name clash gets a numeric suffix, not a silent overwrite
    ns2 = discover_namespaces(iris + ["https://other.example.net/onto/x"])
    assert ns2["onto"] == "https://new.example.com/onto/"
    assert ns2["onto2"] == "https://other.example.net/onto/"


def test_table_key_and_columns():
    tk = TableKey("https://ex.org/vocab/text", KIND_IRI, KIND_LITERAL, lang="en")
    assert tk.key_string() == "ex_text_sI_oL_lang_en"
    tk2 = TableKey(
        "https://ex.org/vocab/turnIndex", KIND_IRI, KIND_LITERAL,
        datatype="http://www.w3.org/2001/XMLSchema#integer",
    )
    assert tk2.key_string() == "ex_turnindex_sI_oL_xsd_integer"
    assert subject_columns("ex_text", KIND_IRI)[0] == "subject_ex_text_scheme"
    assert subject_columns("ex_toolname", KIND_BNODE) == ["subject_ex_toolname_id"]
    assert object_columns("ex_text", KIND_LITERAL, "en", None) == [
        "object_ex_text_lang",
        "object_ex_text_langvalue",
    ]
    assert object_columns("ex_turnindex", KIND_LITERAL, None, "xsd_integer") == [
        "object_ex_turnindex_xsd_integer_datatype",
        "object_ex_turnindex_xsd_integer_litvalue",
    ]
