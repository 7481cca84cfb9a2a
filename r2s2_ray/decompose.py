"""Vectorized term decomposition: lean triple columns -> the reference's physical
column layout (IRI 9-part split, literal 2-part split, bnode BIGINT ids).

Parity: LoadIntoTable.java:318-368 (see terms.split_iri for the scalar spec — the
Arrow kernels here are parity-tested against it), GroupOfColumns.java:43-68 for
column naming.

Everything is ``pyarrow.compute`` regex/string kernels — no per-row Python except
bnode-id hashing, which runs only on bnode-kind columns (tiny fraction of rows;
the scale path is dictionary-encoding the labels, noted inline).
"""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc

from .state.manifest import PredicateMapSpec, TableSpec
from .terms import IRI_PARTS, KIND_BNODE, KIND_IRI, KIND_LITERAL

_HOSTFUL = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?:(?P<userinfo>[^@/?#]*)@)?"
    r"(?P<host>[^/?#:@]*)(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>(?s:.*)))?$"
)
_OPAQUE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*):(?P<ssp>[^#]*)(?:#(?P<fragment>(?s:.*)))?$"


def _nz(arr: pa.Array) -> pa.Array:
    """empty string -> null (split_iri returns None for absent parts)."""
    return pc.if_else(pc.equal(arr, ""), pa.scalar(None, pa.string()), arr)


def split_iri_arrays(arr: pa.Array) -> dict[str, pa.Array]:
    """Vectorized equivalent of terms.split_iri over a string array.

    Precondition: absolute IRIs (scheme present) — guaranteed by extraction.
    Returns {part_suffix: string array} for all 9 parts.
    """
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    h = pc.extract_regex(arr, _HOSTFUL)
    o = pc.extract_regex(arr, _OPAQUE)
    # hostful only counts when the host group is non-empty (java.net.URI treats
    # "file:///x" as host-less -> opaque branch; LoadIntoTable.java:328-334 quirk)
    h_ok = pc.and_(pc.is_valid(h), pc.not_equal(pc.coalesce(pc.struct_field(h, "host"), ""), ""))

    def hf(name):
        return pc.if_else(h_ok, pc.struct_field(h, name), pa.scalar(None, pa.string()))

    def of(name):
        return pc.if_else(h_ok, pa.scalar(None, pa.string()), pc.struct_field(o, name))

    # RE2 optional groups come back as "" whether absent or present-empty, so
    # presence of query/fragment is recovered from delimiter positions:
    # query exists iff '?' occurs before any '#'; fragment exists iff '#' occurs.
    qpos = pc.find_substring(arr, "?")
    hpos = pc.find_substring(arr, "#")
    has_frag = pc.greater_equal(hpos, 0)
    has_query = pc.and_(
        pc.greater_equal(qpos, 0),
        pc.or_(pc.less(hpos, 0), pc.less(qpos, hpos)),
    )
    null_s = pa.scalar(None, pa.string())
    # urlsplit lowercases scheme and hostname; match it
    out = {
        "scheme": pc.utf8_lower(pc.if_else(h_ok, pc.struct_field(h, "scheme"), pc.struct_field(o, "scheme"))),
        "scheme_specific_part": _nz(of("ssp")),
        "authority": pa.nulls(len(arr), pa.string()),
        "user_info": _nz(hf("userinfo")),
        "host": pc.utf8_lower(_nz(hf("host"))),
        "port": _nz(hf("port")),
        "path": _nz(hf("path")),
        "query": pc.if_else(has_query, hf("query"), null_s),
        "fragment": pc.if_else(
            has_frag,
            pc.if_else(h_ok, pc.struct_field(h, "fragment"), pc.struct_field(o, "fragment")),
            null_s,
        ),
    }
    return {k: (v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v) for k, v in out.items()}


def bnode_ids(labels: pa.Array) -> pa.Array:
    """Deterministic 63-bit ids from bnode labels (replaces the reference's global
    AtomicLong, ParseIntoSOGTables.java:65 — content-derived, no coordination).

    Vectorized: polars' fixed-seed 64-bit string hash over the whole column
    (no per-row Python), shifted into the non-negative int63 contract. Content
    hashing keeps ids stable across partitions and retries; the alternative
    (partition-salted counters, (partition_index << 40) | local_counter,
    SURVEY.md §1.4) trades that stability for guaranteed uniqueness."""
    import polars as pl

    if isinstance(labels, pa.ChunkedArray):
        labels = labels.combine_chunks()
    s = pl.Series("l", labels)
    ids = (
        pl.DataFrame({"l": s})
        .select(
            pl.when(pl.col("l").is_null())
            .then(None)
            .otherwise(
                (pl.col("l").hash(seed=0x5EED_B10C) // 2).reinterpret(signed=True)
            )
            .alias("id")
        )["id"]
    )
    return ids.to_arrow().cast(pa.int64())


def decompose_subject(t: pa.Table, spec: TableSpec, pred_part: str) -> dict[str, pa.Array]:
    subj = t["subj"].combine_chunks() if isinstance(t["subj"], pa.ChunkedArray) else t["subj"]
    if spec.subj_kind == KIND_IRI:
        parts = split_iri_arrays(subj)
        return {f"subject_{pred_part}_{p}": parts[p] for p in IRI_PARTS}
    return {f"subject_{pred_part}_id": bnode_ids(subj)}


def decompose_object(
    t: pa.Table, pm: PredicateMapSpec, pred_part: str, dt_part: str | None
) -> dict[str, pa.Array]:
    obj = t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"]
    if pm.obj_kind == KIND_IRI:
        parts = split_iri_arrays(obj)
        return {f"object_{pred_part}_{p}": parts[p] for p in IRI_PARTS}
    if pm.obj_kind == KIND_BNODE:
        return {f"object_{pred_part}_id": bnode_ids(obj)}
    if pm.lang is not None:
        n = t.num_rows
        return {
            f"object_{pred_part}_lang": pa.array([pm.lang] * n, pa.string()),
            f"object_{pred_part}_langvalue": obj,
        }
    n = t.num_rows
    return {
        f"object_{pred_part}_{dt_part}_datatype": pa.array([pm.datatype] * n, pa.string()),
        f"object_{pred_part}_{dt_part}_litvalue": obj,
    }
