"""SQL-identifier mangling for IRIs — behavioral parity with the reference's
``Naming.iriToSqlNamePart`` (reference: src/main/java/swiss/sib/swissprot/r2s2/sql/
Naming.java:17-46).

Rules, in order:
1. XSD / RDF / GEO core datatypes -> ``xsd_<local>`` / ``rdf_<local>`` / ``geo_<local>``
   (lower-cased local name).
2. Longest-prefix match against a namespace map -> ``<prefix>_<localpart>`` lower-cased.
3. Fallback: URL-safe-free Base64 of the IRI bytes with the trailing ``=`` padding
   removed, lower-cased.

The output is further sanitised (non ``[a-z0-9_]`` chars -> ``_``) so it is always a
valid SQL / Parquet-partition identifier fragment; the reference relies on its inputs
being benign, we do not.
"""

from __future__ import annotations

import base64
import re

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
GEO = "http://www.opengis.net/ont/geosparql#"

#: default namespace table (mirrors the seeding in reference Loader.java:99-103,
#: swapped to this engine's vocabulary namespaces).
DEFAULT_NAMESPACES: dict[str, str] = {
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "ex": "https://ex.org/vocab/",
    "ent": "https://ex.org/entity/",
    "conv": "https://ex.org/conv/",
    "doc": "https://ex.org/doc/",
    "g": "https://graphs.example.org/",
}

_SANITIZE = re.compile(r"[^a-z0-9_]")


def _sanitize(s: str) -> str:
    return _SANITIZE.sub("_", s.lower())


def discover_namespaces(
    iris: list[str], existing: dict[str, str] | None = None
) -> dict[str, str]:
    """M7 namespace accumulation (ParseIntoSOGTables.java:349-351 analog): derive
    prefix -> namespace entries from observed vocabulary IRIs not covered by the
    existing map, so unseen vocabularies get readable table names instead of
    Base64 fallbacks. The namespace of an IRI is everything up to the last
    '#' or '/'; the prefix name comes from the last meaningful path segment,
    uniquified with a numeric suffix on clashes. Deterministic given the same
    IRI set (sorted iteration)."""
    ns = dict(existing or DEFAULT_NAMESPACES)
    taken = set(ns)
    out = dict(ns)
    for iri in sorted(set(iris)):
        if any(iri.startswith(v) for v in out.values()):
            continue
        cut = max(iri.rfind("#"), iri.rfind("/"))
        if cut <= len("https://"):
            continue  # no meaningful namespace component
        namespace = iri[: cut + 1]
        seg = re.split(r"[/#:.]+", namespace.rstrip("/#").split("//")[-1])
        base = _sanitize(seg[-1] if seg and seg[-1] else "ns") or "ns"
        name, k = base, 1
        while name in taken:
            k += 1
            name = f"{base}{k}"
        taken.add(name)
        out[name] = namespace
    return out


def iri_to_sql_name_part(iri: str, namespaces: dict[str, str] | None = None) -> str:
    """IRI -> SQL identifier part (see module docstring for rule order)."""
    ns = namespaces if namespaces is not None else DEFAULT_NAMESPACES
    for short, long in ((("xsd", XSD)), ("rdf", RDF), ("geo", GEO)):
        if iri.startswith(long):
            return _sanitize(f"{short}_{iri[len(long):]}")
    best_prefix = ""
    best_key = None
    for key, val in ns.items():
        if key and iri.startswith(val) and len(val) > len(best_prefix):
            best_prefix, best_key = val, key
    if best_key is not None:
        return _sanitize(f"{best_key}_{iri[len(best_prefix):]}")
    enc = base64.b64encode(iri.encode("utf-8")).decode("ascii").rstrip("=")
    return _sanitize(enc)
