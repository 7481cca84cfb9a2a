"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2 as a
callable over an sf_dir; ``oracle_sql()`` holds the DuckDB-equivalent SQL for every
SQL-expressible one (same column names both sides). Ray is initialised by the
driver BEFORE this module is imported — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from r2s2_ray import oracles, oracles_td, relational, vocab
from r2s2_ray.extract.batch import extract_triples
from r2s2_ray.linking import canonicalize
from r2s2_ray.terms import RDF_TYPE
from r2s2_ray.transcripts import read_transcripts

_KIND32 = {"s_kind": pa.int32(), "o_kind": pa.int32()}


def _kinds32(b: pa.Table) -> pa.Table:
    for col, typ in _KIND32.items():
        i = b.schema.get_field_index(col)
        b = b.set_column(i, col, pc.cast(b[col], typ))
    return b


def _triples(sf_dir: str, linked: bool):
    ds = extract_triples(read_transcripts(sf_dir))
    if linked:
        ds = canonicalize(ds)
    return ds.map_batches(_kinds32, batch_format="pyarrow")


def _pipeline_out(sf_dir: str) -> str:
    """Run (or resume) the full KG pipeline into a per-sf cache dir."""
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/r2s2_entry/{tag}"
    from r2s2_ray.pipelines.kg import run_pipeline

    run_pipeline(sf_dir, out)
    return out


def entry() -> Any:
    """Flagship: full KG construction on sf0.001; returns the deduped, linked,
    graph-folded triple set reassembled from the materialized store."""
    out = _pipeline_out("/root/testdata/sf0.001")
    from r2s2_ray.pipelines.serve import reassemble_triples

    return reassemble_triples(out)


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------


def _kg_transcripts(sf_dir: str):
    ds = read_transcripts(sf_dir)

    def fmt(b: pa.Table) -> pa.Table:
        ts_s = pc.strftime(pc.cast(b["ts"], pa.timestamp("s")), format="%Y-%m-%dT%H:%M:%S")
        return b.drop_columns(["ts"]).append_column("ts_s", ts_s)

    return ds.map_batches(fmt, batch_format="pyarrow")


def _td_conv_stats(sf_dir: str):
    """Per-conversation profile: turns, roles, chars, tool calls, span."""
    from r2s2_ray.pipelines.training_data import conv_stats

    return conv_stats(read_transcripts(sf_dir))


def _td_role_transitions(sf_dir: str):
    """Dialog-structure census: (role -> next_role) transition counts."""
    from r2s2_ray.pipelines.training_data import role_transitions

    return role_transitions(read_transcripts(sf_dir))


def _td_turn_dedup(sf_dir: str):
    """Turn-level exact dedup across conversations: keep-first survivor per
    distinct turn text + duplicate count (text-bucketed sort, block-local)."""
    from r2s2_ray.pipelines.training_data import turn_dedup

    return turn_dedup(read_transcripts(sf_dir))


def _td_render_dialogs(sf_dir: str):
    """Chat-template rendering: each conversation becomes ONE training
    document (turns joined in turn_idx order as 'role: text' lines) —
    conv-bucketed sort + whole-block stitch, per-turn text preserved
    verbatim."""
    from r2s2_ray.pipelines.training_data import render_dialogs

    return render_dialogs(read_transcripts(sf_dir))


def _td_loss_masks(sf_dir: str):
    """Instruction-tuning loss masks: per-turn [start_tok, end_tok) spans of
    the rendered dialog with assistant-only trainable flags — the masking
    step between rendering and packing. One conv-bucketed sort, vectorized
    per-conv running offsets."""
    from r2s2_ray.pipelines.training_data import loss_masks

    return loss_masks(read_transcripts(sf_dir))


def _kg_triples_dedup(sf_dir: str):
    from r2s2_ray.pipelines.kg import triples_dataset
    from r2s2_ray.stages.fold import fold, route

    folded = fold(route(triples_dataset(sf_dir)))

    def fmt(b: pa.Table) -> pa.Table:
        # graphs are IRI strings already (sorted in the fold agg): join to a string
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "o_lang": b["o_lang"],
                "o_dt": b["o_dt"],
                "graphs_s": pc.binary_join(b["graphs"], pa.scalar(",", pa.large_string())),
                "n_graphs": pc.cast(pc.list_value_length(b["graphs"]), pa.int64()),
            }
        )

    return folded.map_batches(fmt, batch_format="pyarrow")


def _kg_incremental(sf_dir: str):
    """Incremental (delta) load equivalence, served end-to-end: build the
    per-bucket quad state from HALF the corpus (even conv ids), merge the
    other half as a delta (only the delta crosses the exchange; touched
    buckets fold old+new locally — stages/incremental.py), then fold the
    state. The oracle is the FULL-corpus dedup SQL, so the value-hash match
    proves incremental == one-shot."""
    import tempfile

    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.linking import canonicalize
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import (
        quad_state_build,
        quad_state_merge,
        state_folded,
    )

    def half(parity: int):
        ds = read_transcripts(sf_dir)

        def f(b: pa.Table) -> pa.Table:
            digits = pc.utf8_slice_codeunits(b["conv_id"], 5, 99)
            par = pc.bit_wise_and(pc.cast(digits, pa.int64()), 1)
            return b.filter(pc.equal(par, parity))

        return route(
            canonicalize(extract_triples(ds.map_batches(f, batch_format="pyarrow")))
        )

    state = tempfile.mkdtemp(prefix="kg_incr_state_")
    quad_state_build(half(0), state, num_buckets=32)
    quad_state_merge(half(1), state, num_buckets=32)

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "o_lang": b["o_lang"],
                "o_dt": b["o_dt"],
                "graphs_s": pc.binary_join(b["graphs"], pa.scalar(",", pa.large_string())),
                "n_graphs": pc.cast(pc.list_value_length(b["graphs"]), pa.int64()),
            }
        )

    return state_folded(state).map_batches(fmt, batch_format="pyarrow")


_FORGET_GRAPHS = [
    "https://graphs.example.org/g1",
    "https://graphs.example.org/g3",
]


def _kg_retract(sf_dir: str):
    """Named-graph retraction (right-to-be-forgotten), served end-to-end:
    build the per-bucket quad state from the FULL corpus, retract two named
    graphs (no exchange — each bucket anti-filters its own files; the forget
    set ships once via ray.put), fold what remains. The oracle is a
    from-scratch dedup over the corpus MINUS those graphs, so the hash match
    proves retract == rebuild-without."""
    import tempfile

    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.linking import canonicalize
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import (
        quad_state_build,
        quad_state_retract,
        state_folded,
    )

    routed = route(canonicalize(extract_triples(read_transcripts(sf_dir))))
    state = tempfile.mkdtemp(prefix="kg_retract_state_")
    quad_state_build(routed, state, num_buckets=32)
    stats = quad_state_retract(state, _FORGET_GRAPHS)
    assert sum(r["n_removed"] for r in stats) > 0, "retraction removed nothing"

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "o_lang": b["o_lang"],
                "o_dt": b["o_dt"],
                "graphs_s": pc.binary_join(b["graphs"], pa.scalar(",", pa.large_string())),
                "n_graphs": pc.cast(pc.list_value_length(b["graphs"]), pa.int64()),
            }
        )

    return state_folded(state).map_batches(fmt, batch_format="pyarrow")


#: SPARQL 1.1 UPDATE request served by kg_sparql_update — two exchange-free
#: DELETE WHERE passes (one graph-scoped) and a request-sized INSERT DATA
#: merge over the per-bucket quad state (pipelines/update.py). The oracle
#: (oracles.sparql_update_oracle) mirrors these constants verbatim.
_KG_UPDATE_SRC = """
PREFIX ex: <https://ex.org/vocab/>
DELETE WHERE { ?t ex:tool ?name } ;
DELETE WHERE { GRAPH <https://graphs.example.org/g2> { ?t ex:role "tool" } } ;
INSERT DATA {
  GRAPH <https://graphs.example.org/g0> {
    <https://ex.org/conv/manual-0> a ex:Conversation ;
        ex:source <https://ex.org/source/manual> .
    <https://ex.org/conv/manual-0> ex:charCount "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
  }
}
"""


_KG_INSERTWHERE_SRC = """
PREFIX ex: <https://ex.org/vocab/>
INSERT { ?e ex:mentionedIn ?c . ?t ex:inConversation ?c }
WHERE { ?c ex:hasTurn ?t . ?t ex:mentions ?e }
"""


#: Full SPARQL 1.1 Modify served by kg_sparql_modify: a graph-preserving
#: in-place rename (role "user" -> "human" in WHATEVER named graph the quad
#: lives in, via GRAPH ?g binding + template re-targeting) plus a provenance
#: triple into the default graph. Both templates instantiate from the SAME
#: pre-state solution set (pipelines/update.py quad_state_modify).
_KG_MODIFY_SRC = """
PREFIX ex: <https://ex.org/vocab/>
DELETE { GRAPH ?g { ?t ex:role "user" } }
INSERT { GRAPH ?g { ?t ex:role "human" } . ?t ex:renamedFrom "user" }
WHERE  { GRAPH ?g { ?t ex:role "user" } }
"""


#: Graph-management script served by kg_sparql_manage — every verb class:
#: COPY (dst absent = plain copy), ADD (set-semantics union), MOVE (source
#: gone), SILENT no-ops, CREATE on a store with no empty-graph registry, and
#: CLEAR. All exchange-free per-bucket rewrites (pipelines/update.py
#: _graph_rewrite). The oracle (oracles.sparql_manage_oracle) mirrors these
#: constants verbatim.
_KG_MANAGE_SRC = """
COPY GRAPH <https://graphs.example.org/g0> TO GRAPH <urn:work> ;
ADD GRAPH <https://graphs.example.org/g1> TO GRAPH <urn:work> ;
MOVE GRAPH <https://graphs.example.org/g2> TO GRAPH <urn:archive> ;
DROP SILENT GRAPH <urn:nothing> ;
CREATE SILENT GRAPH <urn:work> ;
CLEAR GRAPH <https://graphs.example.org/g3>
"""


def _kg_sparql_manage(sf_dir: str):
    """SPARQL UPDATE graph management end-to-end: build the quad state, run
    COPY/ADD/MOVE/DROP SILENT/CREATE SILENT/CLEAR (each an exchange-free
    per-bucket rewrite — the bucket key is graph-independent), then LOAD a
    two-row parquet delta INTO a fresh graph (routed delta merge). Hash-
    matching the rebuild-with-graph-edits SQL proves the in-place graph ops
    equal a from-scratch load of the re-graphed corpus."""
    import tempfile

    import pyarrow.parquet as _pq

    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.linking import canonicalize
    from r2s2_ray.pipelines.update import apply_update
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build, state_folded

    routed = route(canonicalize(extract_triples(read_transcripts(sf_dir))))
    state = tempfile.mkdtemp(prefix="kg_manage_state_")
    quad_state_build(routed, state, num_buckets=32)
    stats = apply_update(state, _KG_MANAGE_SRC, num_buckets=32)
    assert sum(r.get("n_retagged", 0) for r in stats) > 0, "manage retagged nothing"

    delta = pa.table(
        {
            "subj": pa.array(
                ["https://ex.org/loaded/1", "https://ex.org/loaded/2"], pa.string()
            ),
            "s_kind": pa.array([1, 1], pa.int8()),
            "pred": pa.array([vocab.P_SOURCE] * 2, pa.string()),
            "obj": pa.array([vocab.SRC + "load"] * 2, pa.string()),
            "o_kind": pa.array([1, 1], pa.int8()),
            "o_lang": pa.array([None, None], pa.string()),
            "o_dt": pa.array([None, None], pa.string()),
        }
    )
    src = tempfile.mktemp(prefix="kg_manage_load_", suffix=".parquet")
    _pq.write_table(delta, src)
    lstats = apply_update(
        state, f"LOAD <file://{src}> INTO GRAPH <urn:loaded>", num_buckets=32
    )
    assert sum(r.get("n_delta", 0) for r in lstats) == 2, "LOAD merged nothing"

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "o_lang": b["o_lang"],
                "o_dt": b["o_dt"],
                "graphs_s": pc.binary_join(b["graphs"], pa.scalar(",", pa.large_string())),
                "n_graphs": pc.cast(pc.list_value_length(b["graphs"]), pa.int64()),
            }
        )

    return state_folded(state).map_batches(fmt, batch_format="pyarrow")


def _kg_sparql_insertwhere(sf_dir: str):
    """SPARQL UPDATE INSERT..WHERE end-to-end: the WHERE BGP (a two-pattern
    join on ?t) is evaluated distributed against the quad state, the
    two-triple template is instantiated per solution, and only the inserted
    delta crosses the merge exchange. Hash-matching the rebuild-with-derived
    SQL proves the pattern-driven insert equals a from-scratch load of the
    corpus plus the SQL-derived triples."""
    import tempfile

    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.linking import canonicalize
    from r2s2_ray.pipelines.update import apply_update
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build, state_folded

    routed = route(canonicalize(extract_triples(read_transcripts(sf_dir))))
    state = tempfile.mkdtemp(prefix="kg_iw_state_")
    quad_state_build(routed, state, num_buckets=32)
    stats = apply_update(state, _KG_INSERTWHERE_SRC, num_buckets=32)
    assert sum(r.get("n_delta", 0) for r in stats) > 0, "insert-where inserted nothing"

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "o_lang": b["o_lang"],
                "o_dt": b["o_dt"],
                "graphs_s": pc.binary_join(b["graphs"], pa.scalar(",", pa.large_string())),
                "n_graphs": pc.cast(pc.list_value_length(b["graphs"]), pa.int64()),
            }
        )

    return state_folded(state).map_batches(fmt, batch_format="pyarrow")


def _kg_sparql_modify(sf_dir: str):
    """Full SPARQL 1.1 Modify (DELETE{..}INSERT{..}WHERE{..}) end-to-end:
    GRAPH ?g in the WHERE binds the named graph of each match, the delete
    template removes the matched quad from exactly that graph, and the insert
    template writes the renamed quad back into the SAME bound graph (plus a
    default-graph provenance triple). Both deltas derive from one pre-state
    solution set; only request-derived quads cross an exchange. Hash-matching
    the rebuild-with-rename SQL proves modify == from-scratch edited load."""
    import tempfile

    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.linking import canonicalize
    from r2s2_ray.pipelines.update import apply_update
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build, state_folded

    routed = route(canonicalize(extract_triples(read_transcripts(sf_dir))))
    state = tempfile.mkdtemp(prefix="kg_modify_state_")
    quad_state_build(routed, state, num_buckets=32)
    stats = apply_update(state, _KG_MODIFY_SRC, num_buckets=32)
    assert sum(r.get("n_removed", 0) for r in stats) > 0, "modify removed nothing"
    assert sum(r.get("n_delta", 0) for r in stats) > 0, "modify inserted nothing"

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "o_lang": b["o_lang"],
                "o_dt": b["o_dt"],
                "graphs_s": pc.binary_join(b["graphs"], pa.scalar(",", pa.large_string())),
                "n_graphs": pc.cast(pc.list_value_length(b["graphs"]), pa.int64()),
            }
        )

    return state_folded(state).map_batches(fmt, batch_format="pyarrow")


def _kg_sparql_update(sf_dir: str):
    """SPARQL UPDATE end-to-end: build the per-bucket quad state from the full
    corpus, run _KG_UPDATE_SRC against it (deletes = per-bucket anti-filters,
    no exchange; insert = delta merge, only the inserted quads shuffle), fold
    what remains. Hash-matching the rebuild-with-edits SQL proves the applied
    state equals a from-scratch load of the edited corpus."""
    import tempfile

    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.linking import canonicalize
    from r2s2_ray.pipelines.update import apply_update
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build, state_folded

    routed = route(canonicalize(extract_triples(read_transcripts(sf_dir))))
    state = tempfile.mkdtemp(prefix="kg_update_state_")
    quad_state_build(routed, state, num_buckets=32)
    stats = apply_update(state, _KG_UPDATE_SRC, num_buckets=32)
    assert sum(r.get("n_removed", 0) for r in stats) > 0, "update removed nothing"

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "o_lang": b["o_lang"],
                "o_dt": b["o_dt"],
                "graphs_s": pc.binary_join(b["graphs"], pa.scalar(",", pa.large_string())),
                "n_graphs": pc.cast(pc.list_value_length(b["graphs"]), pa.int64()),
            }
        )

    return state_folded(state).map_batches(fmt, batch_format="pyarrow")


def _kg_pred_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return _triples(sf_dir, linked=True).groupby("pred").aggregate(Count(alias_name="n"))


def _kg_class_census(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _triples(sf_dir, linked=True).map_batches(
        lambda b: b.filter(pc.equal(b["pred"], RDF_TYPE)), batch_format="pyarrow"
    )
    out = ds.groupby("obj").aggregate(Count(alias_name="n"))
    return out.map_batches(
        lambda b: pa.table({"class_iri": b["obj"], "n": b["n"]}), batch_format="pyarrow"
    )


def _kg_mentions(sf_dir: str):
    ds = _triples(sf_dir, linked=True).map_batches(
        lambda b: pa.table(
            {
                "turn": b.filter(pc.equal(b["pred"], vocab.P_MENTIONS))["subj"],
                "entity": b.filter(pc.equal(b["pred"], vocab.P_MENTIONS))["obj"],
            }
        ),
        batch_format="pyarrow",
    )
    return ds.groupby(["turn", "entity"]).count().drop_columns(["count()"])


def _kg_bfs_khop(sf_dir: str):
    """Bounded-depth BFS (k-hop neighborhood / blast radius) from the
    lexicographically first conversation over the undirected
    hasTurn+mentions edge set: only the frontier re-shuffles each round
    (settled distances stay put), 3 rounds, (node, dist) out."""
    from ray.data.aggregate import Count, Min

    from r2s2_ray.functions.graph import bfs_distances

    t = _triples(sf_dir, linked=True)

    def edge_rows(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred").is_in([vocab.P_HAS_TURN, vocab.P_MENTIONS]))
            .select(pl.col("subj").alias("src"), pl.col("obj").alias("dst"))
            .unique()
            .to_arrow()
        )

    edges = (
        t.map_batches(edge_rows, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
    )

    def ht_subj(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["pred"], vocab.P_HAS_TURN))
        return pa.table({"subj": keep["subj"]})

    seed_rows = (
        t.map_batches(ht_subj, batch_format="pyarrow")
        .aggregate(Min("subj", alias_name="seed"))
    )
    seed = seed_rows["seed"]
    return bfs_distances(edges, [seed], max_depth=3)


def _kg_void_summary(sf_dir: str):
    """VoID dataset description over the dedup'd triple view: triple count +
    distinct subjects/properties/objects/classes in one post-fold exchange."""
    from r2s2_ray.functions.graph import void_summary
    from r2s2_ray.pipelines.kg import triples_dataset
    from r2s2_ray.stages.fold import fold, route
    from r2s2_ray.terms import RDF_TYPE

    return void_summary(fold(route(triples_dataset(sf_dir))), RDF_TYPE)


def _kg_literal_stats(sf_dir: str):
    """Per-(datatype, lang) literal census: count + min/max lexical length —
    the T3/T4 datatype-profiling pass as a queryable table."""
    from r2s2_ray.functions.graph import literal_stats

    return literal_stats(_triples(sf_dir, linked=True))


def _kg_char_sets(sf_dir: str):
    """Characteristic-set census (per-subject predicate-set shapes + subject
    counts) — RDF schema discovery over the linked triple stream."""
    from r2s2_ray.functions.graph import characteristic_sets

    return characteristic_sets(_triples(sf_dir, linked=True))


def _kg_degree_hist(sf_dir: str):
    """Subject out-degree distribution over the linked triple stream."""
    from r2s2_ray.functions.graph import degree_histogram

    return degree_histogram(_triples(sf_dir, linked=True))


def _kg_entity_cards(sf_dir: str):
    """Per-entity profile table (entity cards): mention-edge count, distinct
    conversations reached via hasTurn, and the top co-mentioned entity —
    every step key-partitioned (turn-bucketed join + pair generation,
    entity-keyed groupbys, one stitch sort)."""
    from r2s2_ray.functions.graph import entity_cards

    t = _triples(sf_dir, linked=True)

    def m_rows(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["pred"], vocab.P_MENTIONS))
        return pa.table({"turn": keep["subj"], "entity": keep["obj"]})

    def h_rows(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["pred"], vocab.P_HAS_TURN))
        return pa.table({"conv": keep["subj"], "turn": keep["obj"]})

    mentions = (
        t.map_batches(m_rows, batch_format="pyarrow")
        .groupby(["turn", "entity"])
        .count()
        .drop_columns(["count()"])
    )
    has_turn = (
        t.map_batches(h_rows, batch_format="pyarrow")
        .groupby(["conv", "turn"])
        .count()
        .drop_columns(["count()"])
    )
    return entity_cards(mentions, has_turn)


def _kg_term_dict(sf_dir: str):
    from r2s2_ray.stages.dicts import distinct_with_ids

    # fully distributed content-ordered id assignment (no driver materialization
    # of the term universe; only per-block row counts visit the driver)
    return distinct_with_ids(
        _triples(sf_dir, linked=True).map_batches(
            lambda b: pa.table(
                {
                    "term": pa.concat_arrays(
                        [b["subj"].combine_chunks(), b["obj"].combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        "term",
    )


def _kg_subject_functional(sf_dir: str):
    import pandas as pd
    from ray.data.aggregate import Count

    tri = _triples(sf_dir, linked=True)
    n_rows = tri.groupby("pred").aggregate(Count(alias_name="n_rows")).to_pandas()
    d = (
        tri.map_batches(
            lambda b: pa.table({"pred": b["pred"], "subj": b["subj"]}), batch_format="pyarrow"
        )
        .groupby(["pred", "subj"])
        .count()
        .groupby("pred")
        .aggregate(Count(alias_name="n_subjects"))
        .to_pandas()
    )
    out = n_rows.merge(d, on="pred")
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_subjects"] = out["n_subjects"].astype("int64")
    return out


def _kg_lcs_bounds(sf_dir: str):
    from ray.data.aggregate import Max, Min

    return (
        _triples(sf_dir, linked=True)
        .groupby("pred")
        .aggregate(Min("subj", alias_name="min_subj"), Max("subj", alias_name="max_subj"))
    )


def _kg_sparql(sf_dir: str):
    """SPARQL served end-to-end: full pipeline -> materialized store -> BGP
    translator (join + OPTIONAL + FILTER + DISTINCT) over the serving views —
    the reference's end state (Ontop over DuckDB, SparqlOnLoadedTest.java:104-127)."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?turn ?role ?e WHERE {\n"
        "  ?turn a ex:Turn .\n"
        "  ?turn ex:role ?role .\n"
        "  OPTIONAL { ?turn ex:mentions ?e }\n"
        '  FILTER(?role != "assistant")\n'
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_graph(sf_dir: str):
    """GRAPH patterns served end-to-end: the graph VARIABLE binds the store's
    graph column per pattern, so the query enumerates (graph, class) pairs —
    named-graph awareness the reference serves via Ontop's quad mode."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    return run_sparql(
        out, "SELECT DISTINCT ?g ?type WHERE { GRAPH ?g { [] a ?type } }"
    )


def _kg_sparql_graphgroups(sf_dir: str):
    """Nested groups INSIDE a variable GRAPH group served end-to-end:
    ``GRAPH ?g { ?turn a ex:Turn . OPTIONAL { ?turn ex:mentions ?e } }`` —
    the OPTIONAL distributes out with ?g re-applied (sparql.py
    _rewrite_graph_groups), so optionality is evaluated PER GRAPH."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?g ?turn ?e WHERE {\n"
        "  GRAPH ?g { ?turn a ex:Turn . OPTIONAL { ?turn ex:mentions ?e } }\n"
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_describe_where(sf_dir: str):
    """DESCRIBE with a pattern (DESCRIBE ?e WHERE { ?t ex:mentions ?e }):
    the body's bindings select the description subjects — the DescribeQuery
    form the constant-only path couldn't answer."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "DESCRIBE ?e WHERE { ?t ex:mentions ?e }"
    )
    return run_sparql(out, q)


def _kg_sparql_antijoin(sf_dir: str):
    """Round-3 SPARQL widening served end-to-end: VALUES inline data, a
    FILTER NOT EXISTS anti-join, DESC ordering and OFFSET in one query."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?turn ?role WHERE {\n"
        "  ?turn a ex:Turn .\n"
        "  ?turn ex:role ?role .\n"
        '  VALUES ?role { "user" "system" }\n'
        "  FILTER NOT EXISTS { ?turn ex:mentions ?e }\n"
        "} ORDER BY DESC(?turn) OFFSET 5"
    )
    return run_sparql(out, q)


def _kg_sparql_boundexpr(sf_dir: str):
    """BOUND inside boolean connectives (round-4 widening): the classic
    'unmatched OR matched-with-property' disjunction —
    FILTER(!BOUND(?e) || CONTAINS(?e, "ray")) over an OPTIONAL mentions
    group. The filter defers to after the LEFT JOIN (Filter(LeftJoin(...))
    placement), so unmatched turns survive the NULL test."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?turn ?e WHERE {\n"
        "  ?turn a ex:Turn .\n"
        "  OPTIONAL { ?turn ex:mentions ?e }\n"
        '  FILTER(!BOUND(?e) || CONTAINS(?e, "ray"))\n'
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_agg(sf_dir: str):
    """SPARQL aggregates served end-to-end: per-class instance counts via
    (COUNT(?s) AS ?n) + GROUP BY over the loaded store."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    return run_sparql(
        out, "SELECT ?type (COUNT(?s) AS ?n) WHERE { ?s a ?type } GROUP BY ?type"
    )


def _kg_sparql_path(sf_dir: str):
    """Property paths + BIND served end-to-end: the sequence path
    ex:hasTurn/ex:mentions joins through a never-projected intermediate
    variable, and BIND computes a derived projection column."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?conv ?e ?tag WHERE {\n"
        "  ?conv ex:hasTurn/ex:mentions ?e .\n"
        '  BIND(CONCAT("m:", ?e) AS ?tag)\n'
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_construct(sf_dir: str):
    """CONSTRUCT served end-to-end: instantiates a new predicate over the
    same sequence path; the result is the DISTINCT (subj, pred, obj) graph."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "CONSTRUCT { ?conv ex:mentionsEntity ?e } "
        "WHERE { ?conv ex:hasTurn/ex:mentions ?e }"
    )
    return run_sparql(out, q)


def _kg_sparql_subselect(sf_dir: str):
    """Nested SELECT + HAVING served end-to-end: conversations whose
    hasTurn/mentions path yields >= 6 solution rows, aggregated in a
    subquery and joined back to the typed conversation pattern."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?conv ?n WHERE {\n"
        "  ?conv a ex:Conversation .\n"
        "  { SELECT ?conv (COUNT(?e) AS ?n) WHERE {\n"
        "      ?conv ex:hasTurn/ex:mentions ?e\n"
        "    } GROUP BY ?conv HAVING(?n >= 6) }\n"
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_groupconcat(sf_dir: str):
    """GROUP_CONCAT served end-to-end: each turn's DISTINCT mentioned
    entities joined into one deterministic comma-separated string."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        'SELECT ?turn (GROUP_CONCAT(DISTINCT ?e; SEPARATOR=",") AS ?ents) '
        "WHERE { ?turn ex:mentions ?e } GROUP BY ?turn"
    )
    return run_sparql(out, q)


def _kg_sparql_proplist(sf_dir: str):
    """Round-4 SPARQL widening served end-to-end: a bracketed property list
    ``[ ex:role ?role ; ex:mentions ?e ]`` desugars to a fresh never-projected
    turn variable carrying both predicate-object pairs."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?conv ?role ?e WHERE {\n"
        "  ?conv ex:hasTurn [ ex:role ?role ; ex:mentions ?e ]\n"
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_optnested(sf_dir: str):
    """Nested OPTIONAL served end-to-end: LeftJoin(conv, LeftJoin(hasTurn,
    mentions)) — the inner group extends or stays unbound independently per
    turn row."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?conv ?turn ?e WHERE {\n"
        "  ?conv a ex:Conversation .\n"
        "  OPTIONAL { ?conv ex:hasTurn ?turn . OPTIONAL { ?turn ex:mentions ?e } }\n"
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_optsubselect(sf_dir: str):
    """Subselect nested inside OPTIONAL plus a bare group-graph-pattern,
    served end-to-end: each (turn, role) row — the required part is a BARE
    ``{ ?turn ex:role ?r }`` group (SPARQL group join) — LEFT JOINed to an
    aggregate subquery counting the turn's mentions; turns that mention
    nothing keep ?n unbound (NULL)."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT ?turn ?r ?n WHERE {\n"
        "  { ?turn ex:role ?r }\n"
        "  OPTIONAL { { SELECT ?turn (COUNT(?e) AS ?n) WHERE {\n"
        "      ?turn ex:mentions ?e\n"
        "    } GROUP BY ?turn } }\n"
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_star(sf_dir: str):
    """Zero-or-more closure served end-to-end: ex:hasTurn/ex:mentions* pairs
    every turn with itself (zero-length path) plus its mentioned entities —
    the recursive-CTE closure with the zero-length seed."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?conv ?e WHERE { ?conv ex:hasTurn/ex:mentions* ?e }"
    )
    return run_sparql(out, q)


def _kg_sparql_seqpath(sf_dir: str):
    """Parenthesized SEQUENCE closure served end-to-end:
    (ex:hasTurn/ex:mentions)+ closes over the conv->entity composed edge
    relation (the chain join is the closed-over edge set; on this graph the
    composed edges cannot chain — entities have no hasTurn — so depth is 1,
    while the recursive machinery is fuzz-tested to arbitrary depth)."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?conv ?e WHERE { ?conv (ex:hasTurn/ex:mentions)+ ?e }"
    )
    return run_sparql(out, q)


def _kg_sparql_mixedpath(sf_dir: str):
    """MIXED-direction alternation closure served end-to-end:
    (ex:hasTurn|^ex:hasTurn)+ closes over the union of forward and reversed
    hasTurn edges, so each conv + its turns is one reachability component
    (self-pairs arise from the two-step there-and-back walks); grouping by
    the start node counts the component size."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT ?x (COUNT(?y) AS ?n) "
        "WHERE { ?x (ex:hasTurn|^ex:hasTurn)+ ?y } GROUP BY ?x"
    )
    return run_sparql(out, q)


def _kg_sparql_strfuncs(sf_dir: str):
    """ENCODE_FOR_URI (pure-SQL byte-fold percent-encoding), SHA256 and TZ
    served end-to-end over the mentions edges and turn timestamps (the corpus
    timestamps carry no timezone suffix, so TZ yields the simple literal ""
    everywhere — the accessor still runs through the whole stack)."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?turn ?enc ?h ?z WHERE {\n"
        "  ?turn ex:mentions ?e . ?turn ex:ts ?t .\n"
        "  BIND(ENCODE_FOR_URI(?e) AS ?enc) .\n"
        "  BIND(SHA256(?e) AS ?h) .\n"
        "  BIND(TZ(?t) AS ?z)\n"
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_undef(sf_dir: str):
    """VALUES UNDEF + expression ORDER BY served end-to-end: the UNDEF cell
    constrains nothing on its row and leaves ?prio unbound (NULL) there."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?turn ?role ?prio WHERE {\n"
        "  ?turn ex:role ?role .\n"
        '  VALUES (?role ?prio) { ("user" "1") ("assistant" UNDEF) }\n'
        "} ORDER BY DESC(STRLEN(?turn)) ?turn"
    )
    return run_sparql(out, q)


def _kg_sparql_bool(sf_dir: str):
    """Boolean FILTER connectives served end-to-end: ||, && and ! over
    comparison and CONTAINS atoms in one filter (SQL 3VL = SPARQL EBV)."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT DISTINCT ?turn ?role ?text WHERE {\n"
        "  ?turn ex:role ?role .\n"
        "  ?turn ex:text ?text .\n"
        '  FILTER((?role = "assistant" || ?role = "tool") && STRLEN(?text) > 80'
        ' && !CONTAINS(?text, "vector"))\n'
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_having(sf_dir: str):
    """Direct-aggregate HAVING served end-to-end: turns mentioning at least
    three distinct entities — HAVING(COUNT(DISTINCT ?e) >= 3) with no aliased
    aggregate projection, only the grouped key selected."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT ?turn WHERE { ?turn ex:mentions ?e } "
        "GROUP BY ?turn HAVING(COUNT(DISTINCT ?e) >= 3)"
    )
    return run_sparql(out, q)


def _kg_sparql_aggexpr(sf_dir: str):
    """SELECT expressions over aggregates served end-to-end: inline aggregate
    calls inside the expression ((SUM(?i)/COUNT(?t)) AS ?avgidx) extract into
    internal projections and evaluate in an outer wrapper over the grouped
    result, alongside a string expression over the grouping key."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT ?role (COUNT(?t) AS ?n) ((SUM(?i) / COUNT(?t)) AS ?avgidx) "
        "(CONCAT(?role, \"!\") AS ?tag)\n"
        "WHERE { ?t ex:role ?role . ?t ex:turnIndex ?i } GROUP BY ?role"
    )
    return run_sparql(out, q)


def _kg_sparql_dates(sf_dir: str):
    """dateTime component accessors served end-to-end: per (day, hour) turn
    counts from BIND(DAY/HOURS(?ts)) grouped over the bind targets."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT ?d ?h (COUNT(*) AS ?n) WHERE {\n"
        "  ?t ex:ts ?ts BIND(DAY(?ts) AS ?d) BIND(HOURS(?ts) AS ?h)\n"
        "} GROUP BY ?d ?h"
    )
    return run_sparql(out, q)


def _kg_sparql_union(sf_dir: str):
    """Round-4 UNION widening served end-to-end: branches are full groups (a
    FILTER scoped to one branch, an OPTIONAL left-joining inside the other)
    and the COUNT + GROUP BY aggregate runs over the union's multiset."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        "SELECT ?turn (COUNT(?e) AS ?n) WHERE {\n"
        '  { ?turn ex:mentions ?e . FILTER(CONTAINS(?e, "or")) }\n'
        "  UNION\n"
        '  { ?turn ex:role "assistant" . OPTIONAL { ?turn ex:mentions ?e } }\n'
        "} GROUP BY ?turn"
    )
    return run_sparql(out, q)


def _kg_sparql_expr(sf_dir: str):
    """Round-4 expression widening served end-to-end: plain SELECT
    expressions desugar to trailing BINDs, COALESCE over an OPTIONAL-only
    variable defers past the LEFT JOIN, and IF compiles its comparison
    condition to CASE WHEN."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "PREFIX ex: <https://ex.org/vocab/>\n"
        'SELECT ?turn (COALESCE(?tool, "none") AS ?tool_name) '
        '(IF(STRLEN(?text) > 120, "long", "short") AS ?sz) WHERE {\n'
        "  ?turn ex:text ?text .\n"
        "  OPTIONAL { ?turn ex:tool ?tool }\n"
        "}"
    )
    return run_sparql(out, q)


def _kg_sparql_kinds(sf_dir: str):
    """Round-4 term-kind filters served end-to-end: isLiteral/isBlank compile
    onto the serving views' constant s_kind/o_kind columns (exact — the
    store's table split is by kind), here selecting every literal statement
    about non-bnode subjects across a variable predicate."""
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.sparql import run_sparql

    q = (
        "SELECT DISTINCT ?s ?p ?o WHERE { ?s ?p ?o . "
        "FILTER(isLiteral(?o)) . FILTER(!isBlank(?s)) }"
    )
    return run_sparql(out, q)


def _kg_roundtrip(sf_dir: str):
    out = _pipeline_out(sf_dir)
    from r2s2_ray.pipelines.serve import reassemble_triples

    t = reassemble_triples(out)
    mask = pc.and_(
        pc.invert(pc.starts_with(t["subj"], "_:")),
        pc.invert(pc.starts_with(t["obj"], "_:")),
    )
    return t.filter(mask)


# ---- training-data ops ------------------------------------------------------


def _dd_exact_docs(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.dedup import exact_dedup

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(docs, ["text"], "doc_id")


def _dd_dup_rate(sf_dir: str):
    """Per-source exact-duplicate rate (corpus-health ingest gate): docs
    reduced per batch to (source, 64-bit text fingerprint), one count
    exchange + one fingerprint-keyed join back, tiny per-source fold."""
    import ray.data

    from r2s2_ray.functions.dedup import dup_rate_by_source

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )
    return dup_rate_by_source(docs, "text", "source")


def _dd_chunk_dedup(sf_dir: str):
    """Segment-level exact dedup with reassembly (C4/paragraph-dedup shape
    over fixed 32-token windows): global keep-first per exact chunk text,
    surviving chunks stitched back per document — (doc_id, text_dedup,
    n_kept, n_total)."""
    import ray.data

    from r2s2_ray.functions.dedup import chunk_dedup

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return chunk_dedup(docs, "doc_id", "text", chunk_size=32)


def _dd_incremental_dedup(sf_dir: str):
    """Incremental exact dedup against persisted fingerprint state (the
    corpus-side twin of kg_incremental): build the per-bucket fingerprint
    state from EVEN doc ids, then dedup the ODD half as a delta — only the
    delta crosses the exchange, each bucket's state file is read locally.
    Returns the delta's survivors; phase-2 state append runs too (convergent
    union), exercising the full increment cycle."""
    import tempfile

    import ray.data

    from r2s2_ray.stages.incremental import (
        fp_dedup_delta,
        fp_state_append,
        fp_state_build,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def parity(p: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(pc.bit_wise_and(b["doc_id"], 1), p))

        return fn

    state = tempfile.mkdtemp(prefix="dd_incr_state_")
    fp_state_build(docs.map_batches(parity(0), batch_format="pyarrow"), state)
    kept = fp_dedup_delta(
        docs.map_batches(parity(1), batch_format="pyarrow"), state
    ).materialize()
    fp_state_append(kept, state)
    return kept.select_columns(["doc_id", "text"])


def _txt_token_stats(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.textstats import token_stats

    return token_stats(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _txt_quality(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.textstats import quality_score

    return quality_score(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _dd_substring_pairs(sf_dir: str):
    """Exact substring near-dup pairs (Lee et al. 2021 style): docs sharing
    any >=20-char substring, via the complete char-20-gram witness set."""
    import ray.data

    from r2s2_ray.functions.dedup import substring_dup_pairs

    return substring_dup_pairs(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _txt_rare_terms(sf_dir: str):
    """Per-document rarest tokens with corpus document frequency (the IDF
    signal, integer-exact)."""
    import ray.data

    from r2s2_ray.functions.textstats import rare_terms

    return rare_terms(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _txt_vocab_coverage(sf_dir: str):
    """Per-document OOV rate against the corpus's own top-V vocabulary — the
    tokenizer-coverage signal (one token exchange, V-row driver traffic,
    vocabulary broadcast into a vectorized is_in pass)."""
    import ray.data

    from r2s2_ray.functions.textstats import vocab_coverage

    return vocab_coverage(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        vocab_size=16,
    )


def _td_budget_sample(sf_dir: str):
    """Token-budget corpus selection in deterministic shuffle order."""
    import ray.data

    from r2s2_ray.functions.textstats import budget_sample

    return budget_sample(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _td_source_mix(sf_dir: str):
    """Per-source corpus mix: doc count, char mass, language spread and
    exact-duplicate mass — the provenance report behind mixing weights."""
    import ray.data

    from r2s2_ray.functions.textstats import source_mix

    return source_mix(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "lang", "text"]
        )
    )


def _td_shuffle(sf_dir: str):
    """Deterministic global training-order shuffle: dense rank under the
    keyed (affine64(doc_id), doc_id) order — reproducible, RNG-free."""
    import ray.data

    from r2s2_ray.functions.textstats import training_shuffle

    return training_shuffle(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        "doc_id",
    )


def _td_epoch_plan(sf_dir: str):
    """Multi-epoch training-order plan: a distinct deterministic permutation
    per epoch (per-epoch affine constants), one exchange for all epochs,
    driver traffic = epochs x buckets counts."""
    import ray.data

    from r2s2_ray.functions.textstats import epoch_plan

    return epoch_plan(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]),
        "doc_id",
        n_epochs=3,
    )


def _dd_neardup_clusters(sf_dir: str):
    """Near-dup clusters: MinHash-LSH pairs -> distributed connected
    components -> per-doc cluster_id (min doc id of the component)."""
    import ray.data

    from r2s2_ray.functions.dedup import neardup_clusters

    return neardup_clusters(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _dd_cluster_keep_best(sf_dir: str):
    """Near-dup clusters -> keep-longest representative per cluster
    (n_chars DESC, doc_id ASC) with cluster sizes — the dedup pipeline's
    final selection step."""
    import ray.data

    from r2s2_ray.functions.dedup import cluster_keep_best

    return cluster_keep_best(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        ),
        "doc_id",
        "text",
    )


def _dd_ngram_containment(sf_dir: str):
    """Directed n-gram containment pairs (asymmetric near-dup: short doc
    embedded in long doc) over the shared inverted-index core."""
    import ray.data

    from r2s2_ray.functions.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        threshold=0.98,
    )


def _txt_lm_surprisal(sf_dir: str):
    """Per-document surprisal under the corpus's own unigram LM (the
    CCNet-style quality signal). The driver entry projects the integer-exact
    whole-bit column; the float cross-entropy is pytest-pinned."""
    import ray.data

    from r2s2_ray.functions.textstats import lm_surprisal

    return lm_surprisal(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    ).select_columns(["doc_id", "n_tokens", "surprisal_bits"])


def _txt_repetition(sf_dir: str):
    """Gopher-style repetition signals (duplicate lines/words, top-bigram
    share) as integer counts per document."""
    import ray.data

    from r2s2_ray.functions.textstats import repetition_signals

    return repetition_signals(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _td_contamination(sf_dir: str):
    """Benchmark-contamination flags: word-5-shingle overlap of every
    non-benchmark document against the deterministic benchmark stand-in
    (doc_id % 97 == 0); broadcast benchmark set with a distributed hash-join
    fallback past the size guard."""
    import ray.data

    from r2s2_ray.functions.dedup import contamination_flags

    return contamination_flags(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _mm_binary_stats(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.multimodal import binary_stats

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_binary(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())}
        )

    media = docs.map_batches(to_binary, batch_format="pyarrow")
    return binary_stats(media, "doc_id", "payload")


def _queries_matrix(sf_dir: str, n: int = 8) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id").slice(0, n)
    return np.asarray(t["embedding"].to_pylist(), dtype=np.float64)


def _sim_ann_bruteforce(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.similarity import brute_force_topk

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = brute_force_topk(ds, q, "vec_id", "embedding", k=5)
    return pa.table(
        {
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        }
    )


def _sim_range_search(sf_dir: str):
    """Radius search: every corpus vector within cosine >= 0.2 of each of the
    8 query vectors — broadcast queries, per-batch matmul + filter, streaming
    (qid, vec_id) out (no driver merge; result size is data-dependent)."""
    import ray.data

    from r2s2_ray.functions.similarity import range_search

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return range_search(ds, q, "vec_id", "embedding", radius=0.2)


def _sim_mmr(sf_dir: str):
    """MMR diversified top-5 per query (lambda=1/2): distributed exact
    top-32 candidate pool + pool-budget greedy re-rank — integer output,
    hash-matched vs the unrolled greedy-CTE SQL oracle."""
    import ray.data

    from r2s2_ray.functions.similarity import mmr_topk

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return mmr_topk(ds, q, "vec_id", "embedding", k=5, pool=32)


def _sim_knn_classify(sf_dir: str):
    """kNN label classification: exact cosine top-10 per query vector with
    labels carried through the scorer (no second scan), driver majority vote
    (tie -> smallest label) — deterministic, hash-matched vs the window-
    function SQL oracle."""
    import ray.data

    from r2s2_ray.functions.similarity import knn_classify

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    rows = knn_classify(ds, q, "vec_id", "embedding", "label", k=10)
    return pa.table(
        {
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "label_pred": pa.array([r["label_pred"] for r in rows], pa.int64()),
            "n_votes": pa.array([r["n_votes"] for r in rows], pa.int64()),
        }
    )


def _sim_ann_lsh(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.similarity import lsh_topk

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = lsh_topk(ds, q, "vec_id", "embedding", k=5)
    return pa.table(
        {
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        }
    )


def _sim_lsh_recall(sf_dir: str):
    """Recall meta-metric: per-query overlap of the LSH top-k with the exact
    top-k (the 'measure, don't guess' gauge for every approximate index —
    run it after any nprobe/planes change). Both sides already exist as
    operators; the recall is an integer contract (hits, 100·hits//k)."""
    import ray.data

    from r2s2_ray.functions.similarity import brute_force_topk, lsh_topk

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, q, "vec_id", "embedding", k=5)
    approx = lsh_topk(ds, q, "vec_id", "embedding", k=5)
    ex: dict[int, set[int]] = {}
    for r in exact:
        ex.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    ap: dict[int, set[int]] = {}
    for r in approx:
        ap.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    qids = sorted(ex)
    hits = [len(ex[i] & ap.get(i, set())) for i in qids]
    return pa.table(
        {
            "qid": pa.array(qids, pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "recall_pct": pa.array([100 * h // 5 for h in hits], pa.int64()),
        }
    )


def _td_dsir(sf_dir: str):
    """DSIR-style importance weights: hashed unigram+bigram features, target
    (lang='en') vs raw corpus, whole-bit log-likelihood-ratio — integer-exact
    vs the SQL oracle."""
    import ray.data

    from r2s2_ray.functions.textstats import dsir_weights

    return dsir_weights(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        ),
        "doc_id",
        "text",
    )


def _td_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (A-ES analog,
    RNG-free): (affine64(id) >> 1) // n_chars keys, global 100 smallest —
    local top-k per block + driver heap merge, exact vs the SQL oracle."""
    import ray.data

    from r2s2_ray.functions.textstats import weighted_sample

    return weighted_sample(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        ),
        "doc_id",
        "n_chars",
        k=100,
    )


def _txt_hashed_bow(sf_dir: str):
    """Feature-hashing bag-of-words (hashing-trick vectorizer for
    classifier-based filtering): poly_hash(token) & 255 buckets, sparse
    (doc, dim, count) rows — bit-exact vs the SQL oracle, no exchange."""
    import ray.data

    from r2s2_ray.functions.textstats import hashed_bow

    return hashed_bow(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        dim_bits=8,
    )


def _txt_classifier_score(sf_dir: str):
    """Linear quality classifier over the hashed BoW (fasttext-style
    score-and-threshold filter): deterministic signed bucket weights from the
    shared affine64 family, per-doc weight sum + keep flag — bit-exact vs the
    SQL oracle, zero exchanges."""
    import ray.data

    from r2s2_ray.functions.textstats import classifier_score

    return classifier_score(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        dim_bits=8,
    )


def _td_interleave_plan(sf_dir: str):
    """Weighted-fair source interleaving schedule (deterministic data-mixing
    order): per-source rank + integer virtual time — sources appear in
    ORDER BY vt proportionally to their affine-hash weights. Dense-rank
    distribution: driver traffic = one count per (source, id-range
    bucket)."""
    import ray.data

    from r2s2_ray.functions.textstats import interleave_plan

    return interleave_plan(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        )
    )


def _td_filter_chain(sf_dir: str):
    """Composite corpus-filter decision pass (C4/Gopher-style): five
    integer rules (length, alpha ratio, word repetition, top-bigram spam,
    hashed-BoW classifier) evaluated in ONE block-local sweep — per-doc
    reason bitmask + keep flag, zero exchanges."""
    import ray.data

    from r2s2_ray.functions.textstats import filter_chain

    return filter_chain(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
    )


def _io_jsonl_roundtrip(sf_dir: str):
    """JSONL sink -> source roundtrip (the LLM-corpus interchange format):
    documents written as line-delimited JSON shards (one file per block,
    resumable), read back as a streaming Dataset — values identical to the
    parquet source, proven by the identity SQL oracle."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import read_jsonl, write_jsonl

    out = tempfile.mkdtemp(prefix="jsonl_rt_")
    write_jsonl(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet"), out
    )
    return read_jsonl(out).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _io_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather V2) sink -> source roundtrip: one content-tagged
    IPC file per block (custom-sink pattern, retry-idempotent), read back
    one task per file — values identical to the parquet source (identity
    oracle)."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import read_ipc, write_ipc

    out = tempfile.mkdtemp(prefix="ipc_rt_")
    write_ipc(ray.data.read_parquet(f"{sf_dir}/documents.parquet"), out)
    return read_ipc(out).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _io_jsonl_gz_roundtrip(sf_dir: str):
    """Gzip JSONL shard sink -> source roundtrip (the .jsonl.gz layout open
    corpora ship): deterministic shard bytes (gzip mtime pinned), one read
    task per shard, values identical to the parquet source."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import read_jsonl_gz, write_jsonl_gz

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    out = tempfile.mkdtemp(prefix="jsonlgz_rt_")
    write_jsonl_gz(docs, out)
    return read_jsonl_gz(out).select_columns(["doc_id", "text", "lang", "n_chars"])


def _mm_tar_index(sf_dir: str):
    """Random-access index over WebDataset tar shards (the .idx sidecar):
    header-walk only, (key, ext, offset, size) per member — one ranged read
    serves any sample. Oracle: two index rows (txt + cls) per document with
    honest member names and payload sizes."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import tar_index, write_tar

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def keyed(b: pa.Table) -> pa.Table:
        key = pc.utf8_lpad(pc.cast(b["doc_id"], pa.string()), 12, "0")
        return pa.table({"key": key, "text": b["text"], "lang": b["lang"]})

    out = tempfile.mkdtemp(prefix="tar_idx_")
    write_tar(
        docs.map_batches(keyed, batch_format="pyarrow"),
        out,
        "key",
        {"txt": "text", "cls": "lang"},
    )
    idx = tar_index(out)
    return idx.map_batches(
        lambda b: pa.table(
            {"key": b["key"], "ext": b["ext"], "size": b["size"]}
        ),
        batch_format="pyarrow",
    )


def _io_tar_roundtrip(sf_dir: str):
    """WebDataset-style tar-shard sink -> source roundtrip: each document
    becomes adjacent ``<key>.txt`` + ``<key>.cls`` members of a
    content-tagged shard (deterministic bytes, retry-idempotent), read back
    one task per shard and regrouped to one row per sample — values
    identical to the parquet source (identity oracle)."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import read_tar, write_tar

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def keyed(b: pa.Table) -> pa.Table:
        key = pc.utf8_lpad(pc.cast(b["doc_id"], pa.string()), 12, "0")
        return pa.table({"key": key, "text": b["text"], "lang": b["lang"]})

    out = tempfile.mkdtemp(prefix="tar_rt_")
    write_tar(
        docs.map_batches(keyed, batch_format="pyarrow"),
        out,
        "key",
        {"txt": "text", "cls": "lang"},
    )
    rt = read_tar(out, {"txt": "text", "cls": "lang"})

    def unkey(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["key"], pa.int64()),
                "text": b["text"],
                "lang": b["lang"],
            }
        )

    return rt.map_batches(unkey, batch_format="pyarrow")


def _io_orc_roundtrip(sf_dir: str):
    """ORC sink -> source roundtrip: one content-tagged ORC file per block
    (custom-sink pattern, retry-idempotent), read back one task per file —
    identity oracle vs the parquet source."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import read_orc, write_orc

    out = tempfile.mkdtemp(prefix="orc_rt_")
    write_orc(ray.data.read_parquet(f"{sf_dir}/documents.parquet"), out)
    return read_orc(out).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _io_hive_partition(sf_dir: str):
    """Hive-partitioned write + partition-PRUNED read-back: documents written
    partitioned by lang (one directory per partition — the resumable-output
    layout), then ONLY the lang=en directory is read (path-level pruning: no
    other partition's bytes leave storage) and aggregated per source. The
    oracle filters WHERE lang = 'en', so the hash match proves the pruned
    read saw exactly the right rows."""
    import tempfile

    import ray.data
    from ray.data.aggregate import Count, Sum

    out = tempfile.mkdtemp(prefix="hive_part_")
    ray.data.read_parquet(f"{sf_dir}/documents.parquet").write_parquet(
        out, partition_cols=["lang"]
    )
    en = ray.data.read_parquet(f"{out}/lang=en")

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {"source": b["source"], "n_chars": pc.cast(b["n_chars"], pa.int64())}
        )

    return (
        en.map_batches(shape, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
    )


def _io_bucket_join(sf_dir: str, num_buckets: int = 8):
    """Co-partitioned BUCKETED-STORAGE join — the zero-shuffle join layout
    for repeated large x large joins at 100 TB: both sides are written ONCE
    bucketed by the join key (hash-partitioned directories), then every join
    over that key reads bucket-pairwise — task i joins orders/bucket=i with
    lineitem/bucket=i locally, NO exchange ever touches the fact tables
    again. Only the per-bucket partial aggregates (num_buckets x 5 rows)
    meet in the final combine. The plain-SQL join oracle proves the
    bucket-pairwise union IS the join."""
    import tempfile

    import ray.data
    from ray.data.aggregate import Count, Sum

    root = tempfile.mkdtemp(prefix="bucket_join_")
    mask = num_buckets - 1  # power of two

    def bucketed(key):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "bucket",
                pc.cast(pc.bit_wise_and(pc.cast(b[key], pa.int64()), mask), pa.int32()),
            )

        return fn

    ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(bucketed("o_orderkey"), batch_format="pyarrow").write_parquet(
        f"{root}/orders", partition_cols=["bucket"]
    )
    ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).map_batches(bucketed("l_orderkey"), batch_format="pyarrow").write_parquet(
        f"{root}/lineitem", partition_cols=["bucket"]
    )

    def join_one(b: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.parquet as pq

        import os

        outs = []
        for i in b["id"].to_pylist():
            od, ld = f"{root}/orders/bucket={i}", f"{root}/lineitem/bucket={i}"
            if not (os.path.isdir(od) and os.path.isdir(ld)):
                continue  # empty bucket on either side joins to nothing
            o = pl.from_arrow(pq.read_table(od))
            l = pl.from_arrow(pq.read_table(ld))
            j = l.join(o, left_on="l_orderkey", right_on="o_orderkey", how="inner")
            outs.append(
                j.group_by("o_orderpriority")
                .agg(
                    pl.len().cast(pl.Int64).alias("n_items"),
                    (pl.col("l_extendedprice") * 100)
                    .round(0)
                    .cast(pl.Int64)
                    .sum()
                    .alias("sum_price_cents"),
                )
                .to_arrow()
            )
        if not outs:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.large_string()),
                    "n_items": pa.array([], pa.int64()),
                    "sum_price_cents": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    return (
        ray.data.range(num_buckets)
        .map_batches(join_one, batch_format="pyarrow", batch_size=1)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
        )
    )


def _sim_pq_codes(sf_dir: str):
    """Product-quantization codes (IVF-PQ compression step): 8 subspaces x
    integer-exact kmeans, (vec_id, subspace, code) — bit-exact vs the
    per-subspace unrolled-CTE SQL oracle."""
    import ray.data

    from r2s2_ray.functions.similarity import pq_codes

    return pq_codes(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        "vec_id",
        "embedding",
        m=8,
        k=8,
        n_iters=2,
    )


def _sim_ann_pq(sf_dir: str):
    """Asymmetric-distance PQ search (IVF-PQ query side): per-subspace
    integer kmeans codebooks + broadcast nq x k distance tables, m lookups
    per vector, top-5 per query — exact vs the reconstruction SQL oracle."""
    import ray.data

    from r2s2_ray.functions.similarity import pq_adc_topk

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return pq_adc_topk(ds, q, "vec_id", "embedding", m=8, k_codes=8, n_iters=2, k=5)


def _dd_setsim_prefix(sf_dir: str):
    """PPJoin-style prefix-filtered EXACT token-set Jaccard join (t = 9/10,
    integer-rational threshold): candidates only from each doc's rarest-token
    prefix + length filter, exact intersection for survivors via two hash
    joins — the unfiltered all-pairs SQL oracle proves the filters lossless."""
    import ray.data

    from r2s2_ray.functions.dedup import setsim_prefix_pairs

    return setsim_prefix_pairs(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        threshold=(9, 10),
    )


def _q_profile_docs(sf_dir: str):
    """Per-column data profile of the documents table (count / nulls / exact
    distinct / varchar min-max) — the ingest sanity check, census family
    generalized to any table; exact vs the per-column UNION SQL oracle."""
    import ray.data

    from r2s2_ray.relational import profile_table

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    return profile_table(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols), cols
    )


def _sim_quantize(sf_dir: str):
    """Symmetric per-dimension int8 embedding quantization (ANN memory
    reduction): corpus max-abs scales via a metadata-scale block reduce,
    floor((x*127)/s) in float64 — bit-exact vs the SQL oracle; long-format
    (vec_id, i, q) output for integer-for-integer comparison."""
    import ray.data

    from r2s2_ray.functions.similarity import quantize_embeddings

    return quantize_embeddings(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        "vec_id",
        "embedding",
    )


def _io_csv_roundtrip(sf_dir: str):
    """CSV sink -> source roundtrip: documents written as CSV shards (one per
    block), read back via pyarrow's vectorized CSV reader — values identical
    to the parquet source, proven by the identity SQL oracle."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import read_csv, write_csv

    out = tempfile.mkdtemp(prefix="csv_rt_")
    write_csv(ray.data.read_parquet(f"{sf_dir}/documents.parquet"), out)
    return read_csv(out).select_columns(
        ["doc_id", "text", "lang", "source", "n_chars"]
    )


def _td_temperature_sample(sf_dir: str):
    """Temperature-weighted source mixing (size^(1/2) quotas, largest-remainder
    rounding, per-source content-hash ranking) — integer-exact vs the SQL
    oracle; the standard multi-source data-mixing step."""
    import ray.data

    from r2s2_ray.functions.textstats import temperature_sample

    return temperature_sample(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "source", "n_chars"],
        ),
        "doc_id",
        "text",
    )


def _txt_top_ngrams(sf_dir: str):
    """Corpus-wide top-k bigrams by frequency (count DESC, gram ASC) —
    per-batch combiner -> one gram-keyed exchange -> local top-k -> k-row
    driver merge. Exact vs the positional-self-join SQL oracle."""
    import ray.data

    from r2s2_ray.functions.textstats import top_ngrams

    return top_ngrams(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        n=2,
        k=20,
    )


def _txt_bpe_pairs(sf_dir: str):
    """BPE merge-candidate table (iteration 1): corpus-wide adjacent char-pair
    counts within words, rank 1-based, count DESC / pair ASC."""
    import ray.data

    from r2s2_ray.functions.textstats import bpe_pair_counts

    return bpe_pair_counts(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
        "text",
        k=50,
    )


_BM25_QUERIES = ["merge sort window", "customer order line", "spark vector hash join"]


def _sim_bm25(sf_dir: str):
    """BM25 top-k retrieval over the documents corpus — integer-exact scoring
    contract (scaled multiplicative idf + rational-saturation floor division
    in Int128), bit-exact vs the HUGEINT SQL oracle."""
    import ray.data

    from r2s2_ray.functions.retrieval import bm25_topk

    return bm25_topk(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        "doc_id",
        "text",
        _BM25_QUERIES,
        k=10,
    )


def _sim_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table — per-vector
    cluster assignment after 3 iterations, bit-exact vs the unrolled-CTE SQL
    oracle because every step is integer arithmetic."""
    import ray.data

    from r2s2_ray.functions.similarity import kmeans

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans(ds, "vec_id", "embedding", k=8, n_iters=3)


def _sim_ann_ivf(sf_dir: str):
    """IVF-flat ANN: deterministic coarse codebook, nearest-centroid inverted
    lists, nprobe-nearest-list search — the partition-pruned scale path next
    to the LSH variant."""
    import ray.data

    from r2s2_ray.functions.similarity import ivf_topk

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = ivf_topk(ds, q, "vec_id", "embedding", k=5)
    return pa.table(
        {
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        }
    )


def _sim_ivf_persist(sf_dir: str):
    """Persisted IVF index: build writes the codebook + HIVE-partitioned
    inverted lists to parquet (the index IS the directory layout); the query
    cold-starts from those files and reads ONLY the probed partitions —
    shares sim_ann_ivf's oracle, so the hash match proves the persisted
    path returns the identical top-k."""
    import tempfile

    import ray.data

    from r2s2_ray.functions.similarity import ivf_persist, ivf_persist_topk

    q = _queries_matrix(sf_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    idx = tempfile.mkdtemp(prefix="ivf_idx_")
    ivf_persist(ds, "vec_id", "embedding", idx, n_centroids=16)
    rows = ivf_persist_topk(idx, q, "vec_id", "embedding", k=5, nprobe=2)
    return pa.table(
        {
            "qid": pa.array([r["qid"] for r in rows], pa.int64()),
            "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        }
    )


def _dd_minhash(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.dedup import minhash_lsh_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_pairs(docs, "doc_id", "text")


def _dd_simhash(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.dedup import simhash

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash(docs, "doc_id", "text")


def _dd_embedding(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.dedup import embedding_cosine_pairs_exact

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_cosine_pairs_exact(ds, "vec_id", "embedding", threshold=0.4)


def _sim_rrf(sf_dir: str):
    """Reciprocal Rank Fusion of BM25 relevance with the query-independent
    quality ranking — hybrid retrieval, all-floor-division integer contract;
    the quality rank of each candidate computes distributed via the
    rank-of-selected-rows pattern (broadcast candidates, per-block
    count-above partials)."""
    import ray.data

    from r2s2_ray.functions.retrieval import rrf_fuse

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return rrf_fuse(docs, "doc_id", "text", _BM25_QUERIES, k=10)


def _dd_cdc_chunks(sf_dir: str):
    """Content-defined chunking: boundaries where the k-gram poly hash has
    zero low bits — edit-stable chunk identities, block-local, no exchange."""
    import ray.data

    from r2s2_ray.functions.dedup import cdc_chunks

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return cdc_chunks(docs, "doc_id", "text", k=8, mask_bits=6)


def _td_bernoulli_sample(sf_dir: str):
    """Deterministic Bernoulli sample at 1/8: affine64(doc_id) below the
    rate threshold — reproducible across runs/partitionings/engines."""
    import ray.data

    from r2s2_ray.functions.textstats import bernoulli_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return bernoulli_sample(docs, "doc_id", rate_num=1, rate_den=8)


def _txt_compress_ratio(sf_dir: str):
    """Compression-ratio quality signal (Gopher/CCNet boilerplate filter):
    1000*len(zlib(text))//len(text) per document — deterministic integer
    contract; zlib has no SQL twin, so this is a rows-only entry whose
    properties (monotone under repetition, byte counts) are pinned in
    pytest."""
    import ray.data

    from r2s2_ray.functions.textstats import compress_ratio

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return compress_ratio(docs, "doc_id", "text")


def _sim_jl_project(sf_dir: str):
    """Johnson-Lindenstrauss Rademacher projection 64 -> 16 dims: integer-
    exact (floor-quantized coords x +-1 planes, int64 sums) so the oracle is
    bit-exact with no float-accumulation drift."""
    import ray.data

    from r2s2_ray.functions.similarity import jl_project

    return jl_project(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
    )


def _io_schema_evolution(sf_dir: str):
    """Schema-evolution read (union-by-name): documents split into two
    parquet files with DIFFERENT schemas — evens carry (doc_id, text, lang),
    odds carry (doc_id, lang, source, n_chars) — then read back through
    read_parquet_unified, which probes footers only (metadata scale) and
    pads typed nulls. The oracle rebuilds the same null pattern from
    documents, so the hash match proves column alignment and null padding."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import read_parquet_unified

    out = tempfile.mkdtemp(prefix="schema_evo_")
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

    def evens(b: pa.Table) -> pa.Table:
        m = pc.equal(pc.bit_wise_and(b["doc_id"], 1), 0)
        return b.filter(m).select(["doc_id", "text", "lang"])

    def odds(b: pa.Table) -> pa.Table:
        m = pc.equal(pc.bit_wise_and(b["doc_id"], 1), 1)
        t = b.filter(m)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "source": t["source"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    docs.map_batches(evens, batch_format="pyarrow").repartition(1).write_parquet(
        f"{out}/v1"
    )
    docs.map_batches(odds, batch_format="pyarrow").repartition(1).write_parquet(
        f"{out}/v2"
    )
    import os

    paths = [
        os.path.join(d, f)
        for d in (f"{out}/v1", f"{out}/v2")
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return read_parquet_unified(paths)


def _dd_edit_neardup(sf_dir: str):
    """Levenshtein verification of MinHash-LSH candidates (fuzzy-dedup final
    gate): banded LSH recall, texts attached to the candidate-scale pair
    list via two hash_joins, row-vectorized DP per pair — oracle = identical
    band keys + DuckDB levenshtein()."""
    import ray.data

    from r2s2_ray.functions.dedup import edit_neardup_pairs

    return edit_neardup_pairs(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        "doc_id",
        "text",
    )


def _td_bucket_batches(sf_dir: str):
    """Length-bucketed batch formation (padding-efficient dynamic batching):
    length bands x greedy fixed-budget packing in id order — the composite
    (band, id-range) metadata prefix-sum keeps driver traffic at cell scale."""
    import ray.data

    from r2s2_ray.functions.textstats import bucket_batches

    return bucket_batches(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        "doc_id",
        "text",
    )


def _dd_simhash_pairs(sf_dir: str):
    """SimHash Hamming-ball near-dup pairs (Manku et al. 2007): pigeonhole
    chunk buckets (lossless for hamming <= 3) + in-bucket popcount verify —
    the brute-force SQL oracle proves the recall."""
    import ray.data

    from r2s2_ray.functions.dedup import simhash_pairs

    return simhash_pairs(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        "doc_id",
        "text",
    )


def _io_rowgroup_prune(sf_dir: str):
    """Row-group data skipping (the Iceberg/Delta pushdown shape): lineitem
    key-sorted into small row groups, then a range predicate answered by
    probing footers only and reading the surviving groups — the run asserts
    real skipping (n_scanned < n_groups) and the SQL equality proves the
    pruned read loses nothing at the edges."""
    import os
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import rowgroup_prune

    base = tempfile.mkdtemp(prefix="rgprune_")
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    ds.sort("l_orderkey").write_parquet(f"{base}/sorted", row_group_size=2048)
    paths = [
        f"{base}/sorted/{f}"
        for f in sorted(os.listdir(f"{base}/sorted"))
        if f.endswith(".parquet")
    ]
    # scale-independent 20% key band derived from the source FOOTER max
    # (the oracle derives the same bounds with a SQL max)
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata
    mx = max(
        next(
            md.row_group(i).column(j).statistics.max
            for j in range(md.row_group(i).num_columns)
            if md.row_group(i).column(j).path_in_schema == "l_orderkey"
        )
        for i in range(md.num_row_groups)
    )
    lo, hi = mx // 5, (2 * mx) // 5
    out, stats = rowgroup_prune(
        paths, "l_orderkey", lo, hi, ["l_orderkey", "l_quantity"]
    )
    assert 0 < stats["n_scanned"] < stats["n_groups"], stats

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "qty": pc.cast(b["l_quantity"], pa.int64()),
            }
        )

    return out.map_batches(fmt, batch_format="pyarrow")


def _io_compact(sf_dir: str):
    """Small-file compaction (lakehouse OPTIMIZE): documents scattered into
    16 tiny parquet files, bin-packed (first-fit-decreasing over footer
    sizes — driver sees metadata only) and rewritten one task per bin, then
    read back — the oracle equality proves zero rows lost or duplicated."""
    import tempfile

    import ray.data

    from r2s2_ray.sources.jsonl import compact_parquet

    base = tempfile.mkdtemp(prefix="compact_")
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    docs.repartition(16).write_parquet(f"{base}/small")
    # target sized to force real bin-packing (several files per bin, >1 bin)
    import os

    sizes = [
        os.path.getsize(f"{base}/small/{f}")
        for f in os.listdir(f"{base}/small")
        if f.endswith(".parquet")
    ]
    target = max(max(sizes) + 1, sum(sizes) // 3)
    out = compact_parquet(f"{base}/small", f"{base}/big", target_bytes=target)
    assert 1 < len(out) < 16, (len(out), len(sizes))
    return ray.data.read_parquet(out).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "lang": b["lang"],
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _sim_label_centroids(sf_dir: str):
    """Per-label centroid prototypes as exact rationals (int64 sums/counts
    over floor-quantized coordinates — order-independent, no float-mean
    drift): block-level partials ride the groupby combiner."""
    import ray.data

    from r2s2_ray.functions.similarity import label_centroids

    return label_centroids(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
    )


def _td_cap_per_source(sf_dir: str):
    """Per-source document cap (C4/Dolma domain capping): keep the 5 rows per
    source ranking first under (affine64(doc_id), doc_id) — deterministic,
    RNG-free; per-block top-k combiner then ONE sort exchange, so a hot
    source exchanges at most k rows per input block regardless of its size."""
    import ray.data

    from r2s2_ray.functions.textstats import cap_per_source

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return cap_per_source(docs, "doc_id", "source", k=5)


def _txt_bigram_surprisal(sf_dir: str):
    """Bigram LM surprisal (add-1 smoothed, whole-bit integer contract) —
    the sequential-context quality signal; both count-attach paths
    (broadcast / distributed hash_join) are equality-pinned in pytest."""
    import ray.data

    from r2s2_ray.functions.textstats import bigram_surprisal

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bigram_surprisal(docs, "doc_id", "text")


def _txt_winnow_fp(sf_dir: str):
    """Winnowing (MOSS) fingerprints: per-window minimum shingle hash —
    position-robust local fingerprinting, block-local, no exchange."""
    import ray.data

    from r2s2_ray.functions.textstats import winnow_fingerprints

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return winnow_fingerprints(docs, "doc_id", "text", shingle_k=3, window=4)


def _dd_incremental_minhash(sf_dir: str):
    """Incremental NEAR-dup detection against persisted LSH state: band keys
    of the even-doc half persist per bucket; the odd-doc delta finds every
    candidate pair touching it without rescanning the history (phase 1 pure
    read), then appends its own band rows convergently (phase 2). Oracle =
    the full-corpus minhash pair SQL restricted to pairs touching the delta,
    so the hash match proves incremental == one-shot."""
    import tempfile

    import ray.data

    from r2s2_ray.stages.incremental import (
        lsh_pairs_delta,
        lsh_state_append,
        lsh_state_build,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            par = pc.bit_wise_and(b["doc_id"], 1)
            return b.filter(pc.equal(par, parity))

        return docs.map_batches(f, batch_format="pyarrow")

    state = tempfile.mkdtemp(prefix="dd_lsh_state_")
    lsh_state_build(half(0), state)
    pairs = lsh_pairs_delta(half(1), state).materialize()
    lsh_state_append(half(1), state)
    return pairs


def _dd_semdedup(sf_dir: str):
    """SemDeDup: integer-exact k-means buckets, exact cosine only within each
    cluster — the cluster structure bounds the quadratic term (dedup.py)."""
    import ray.data

    from r2s2_ray.functions.dedup import semdedup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return semdedup_pairs(ds, "vec_id", "embedding", k=8, n_iters=2, threshold=0.4)


def _dd_embedding_lsh(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.dedup import embedding_neardup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_neardup_pairs(
        ds, "vec_id", "embedding", threshold=0.4, num_planes=4, num_tables=8
    )


def _dd_ngram(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.dedup import ngram_jaccard_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)


def _txt_langid(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.textstats import lang_id

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return lang_id(docs, "doc_id", "text")


def _txt_fingerprint(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.textstats import fingerprint

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return fingerprint(docs, "doc_id", "text")


def _td_pack(sf_dir: str):
    """Sequence packing: docs laid end-to-end in id order, assigned to fixed
    256-token-budget packs via a distributed prefix sum."""
    import ray.data

    from r2s2_ray.functions.textstats import sequence_pack

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return sequence_pack(docs, "doc_id", "text", budget=256)


def _td_split(sf_dir: str):
    """Content-hash stratified train/val/test split (90/5/5 by default)."""
    import ray.data

    from r2s2_ray.functions.textstats import stratified_split

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return stratified_split(docs, "doc_id", "text")


def _txt_pii_scrub(sf_dir: str):
    """PII redaction over a deterministically PII-injected corpus (the
    synthetic text has no digits/@, so the query plants emails/IPs/phones
    derived from doc_id — same expression as oracles_td.PII_INJECT_SQL)."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.textstats import pii_scrub

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def inject(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks() if isinstance(b["doc_id"], pa.ChunkedArray) else b["doc_id"]
        idn = ids.to_numpy(zero_copy_only=False)
        s = lambda a: pa.array(np.asarray(a).astype(str), pa.string())  # noqa: E731
        text = pc.binary_join_element_wise(
            b["text"],
            pa.scalar(" contact doc"),
            s(idn),
            pa.scalar("@example.com from 10."),
            s(idn % 200),
            pa.scalar(".0."),
            s(idn % 250),
            pa.scalar(" tel +41"),
            s(70000000 + idn),
            pc.if_else(
                pa.array(idn % 5 == 0), pa.scalar(" cc admin@example.org"), pa.scalar("")
            ),
            pa.scalar(""),
        )
        return pa.table({"doc_id": ids, "text": text})

    return pii_scrub(docs.map_batches(inject, batch_format="pyarrow"), "doc_id", "text")


def _txt_token_chunks(sf_dir: str):
    """Fixed 32-token training-window chunking: one row per (doc, window)."""
    import ray.data

    from r2s2_ray.functions.textstats import token_chunks

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return token_chunks(docs, "doc_id", "text", chunk_size=32)


def _mm_image_features(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.multimodal import image_features

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table(
            {"media_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())}
        )

    return image_features(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_phash_neardup(sf_dir: str):
    """Perceptual-hash near-dup canonicalization over the multimodal family's
    deterministic decode stand-in: average-hash signature per payload (actor
    pool), exact-signature groups canonicalized by one signature-bucketed
    sort — the image-dedup shape with real Ray plumbing and a bit-exact SQL
    oracle."""
    import ray.data

    from r2s2_ray.functions.multimodal import phash_neardup

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table(
            {"media_id": b["doc_id"], "payload": pc.cast(b["text"], pa.binary())}
        )

    return phash_neardup(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_audio_frames(sf_dir: str):
    import ray.data

    from r2s2_ray.functions.multimodal import audio_frames

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "media_id": b["doc_id"],
                "payload": pc.cast(b["text"], pa.binary()),
                "meta": pa.array(['{"n_samples": 1600}'] * n, pa.string()),
            }
        )

    return audio_frames(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_wav_energy(sf_dir: str):
    """REAL audio decode path: every document synthesizes a deterministic
    PCM-16 mono waveform (s_k = ((a·k + c) mod 65536) − 32768 with a, c
    derived from doc_id), encodes it into an actual RIFF/WAVE container
    (stdlib wave writer), and the OPERATOR parses the container back and
    emits per-window integer energies. The SQL oracle reproduces the sample
    recurrence directly — so a decode bug (header offsets, endianness,
    sample width) breaks the hash match. Closes the audio-decode stand-in
    for the one audio container the standard library really parses."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.multimodal import wav_encode, wav_energy

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for did in b["doc_id"].to_pylist():
            a = 2 * (did % 32747) + 1
            c = did % 65536
            k = np.arange(1600, dtype=np.int64)
            samples = (a * k + c) % 65536 - 32768
            payloads.append(wav_encode(samples))
        return pa.table(
            {"media_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return wav_energy(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_png_pixels(sf_dir: str):
    """REAL image decode path: every document synthesizes a 16x16 8-bit
    grayscale image (p_k = (a·k + c) mod 256), encodes it into an actual PNG
    (chunked, CRC'd, zlib-deflated, scanlines filtered with None/Sub/Up),
    and the OPERATOR decodes the container — CRC-checked chunk walk,
    inflate, unfilter — and emits integer pixel stats. SQL oracle = the
    pixel formula, so any parser/unfilter bug breaks the hash match."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.multimodal import png_encode_gray, png_pixel_stats

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for did in b["doc_id"].to_pylist():
            a = 2 * (did % 127) + 1
            c = did % 251
            k = np.arange(256, dtype=np.int64)
            px = ((a * k + c) % 256).astype(np.uint8).reshape(16, 16)
            payloads.append(png_encode_gray(px))
        return pa.table(
            {"media_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return png_pixel_stats(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_jpeg_pixels(sf_dir: str):
    """REAL compressed-photo decode path: every document synthesizes a 16x16
    grayscale image of four FLAT 8x8 tiles (tile i = (7*doc_id + 59*i) mod
    256), encodes it into an actual baseline JFIF/JPEG (DCT + flat
    quantization + standard Annex K Huffman + byte stuffing), and the
    OPERATOR decodes the container — marker walk, file-defined Huffman
    tables, DC DPCM, dequant, IDCT — and emits integer pixel stats.
    DC-only blocks reconstruct bit-exactly, so the SQL oracle is the tile
    formula: any Huffman/DPCM/zigzag/IDCT bug breaks the hash match."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.multimodal import jpeg_encode_gray, jpeg_pixel_stats

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        ones = np.ones((8, 8), dtype=np.uint8)
        for did in b["doc_id"].to_pylist():
            v = [(7 * did + 59 * i) % 256 for i in range(4)]
            tiles = np.array([[v[0], v[1]], [v[2], v[3]]], dtype=np.uint8)
            payloads.append(jpeg_encode_gray(np.kron(tiles, ones)))
        return pa.table(
            {"media_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return jpeg_pixel_stats(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_bmp_channels(sf_dir: str):
    """REAL image decode path #2 (BMP): every document synthesizes an 8x10
    RGB image (channel c pixel k = ((3+2c)*k + doc_id + c) mod 256), encodes
    it into an actual 24bpp BMP (bottom-up rows, BGR order, 4-byte row
    padding — width 10 makes the padding non-zero), and the OPERATOR decodes
    the container and emits per-channel integer sums. SQL oracle = the pixel
    formula, so a padding/BGR/row-order bug breaks the hash match."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.multimodal import bmp_channel_stats, bmp_encode_rgb

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    h, w = 8, 10

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        k = np.arange(h * w, dtype=np.int64)
        for did in b["doc_id"].to_pylist():
            chans = [((3 + 2 * c) * k + did + c) % 256 for c in range(3)]
            px = np.stack(chans, axis=1).astype(np.uint8).reshape(h, w, 3)
            payloads.append(bmp_encode_rgb(px))
        return pa.table(
            {"media_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return bmp_channel_stats(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_bmp_resize(sf_dir: str):
    """REAL decode + RESIZE plumbing: the same synthesized 8x10 24bpp BMPs
    as mm_bmp_channels, decoded for real, nearest-neighbor downsampled with
    integer stride 2 (out[r,c] = in[2r,2c] -> 4x5), per-channel sums of the
    RESIZED pixels. The oracle enumerates the surviving source pixels
    (k = 2r*10 + 2c), so a stride/offset bug in the resize breaks the hash."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.multimodal import bmp_encode_rgb, bmp_resize_stats

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    h, w = 8, 10

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        k = np.arange(h * w, dtype=np.int64)
        for did in b["doc_id"].to_pylist():
            chans = [((3 + 2 * c) * k + did + c) % 256 for c in range(3)]
            px = np.stack(chans, axis=1).astype(np.uint8).reshape(h, w, 3)
            payloads.append(bmp_encode_rgb(px))
        return pa.table(
            {"media_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return bmp_resize_stats(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_media_meta(sf_dir: str):
    """Heterogeneous media sniffing: each document's payload is a REAL
    container chosen by doc_id % 3 (PNG 16x16 / BMP 8x10 / WAV with
    doc_id%50+20 samples) plus junk bytes for doc_id % 31 == 0; the operator
    sniffs magic bytes and extracts typed metadata from the real headers.
    SQL oracle = the synthesis rule."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.multimodal import (
        bmp_encode_rgb,
        media_meta,
        png_encode_gray,
        wav_encode,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for did in b["doc_id"].to_pylist():
            if did % 31 == 0:
                payloads.append(b"\x00junk" + bytes([did % 256]) * 16)
            elif did % 3 == 0:
                k = np.arange(256, dtype=np.int64)
                payloads.append(
                    png_encode_gray(((3 * k + did) % 256).astype(np.uint8).reshape(16, 16))
                )
            elif did % 3 == 1:
                k = np.arange(80, dtype=np.int64)
                px = np.stack([((3 + 2 * c) * k + did) % 256 for c in range(3)], axis=1)
                payloads.append(bmp_encode_rgb(px.astype(np.uint8).reshape(8, 10, 3)))
            else:
                n = did % 50 + 20
                s = (np.arange(n, dtype=np.int64) * 7 + did) % 2048 - 1024
                payloads.append(wav_encode(s.astype(np.int16)))
        return pa.table(
            {"media_id": b["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return media_meta(docs.map_batches(to_media, batch_format="pyarrow"))


def _mm_video_frames(sf_dir: str):
    """Video frame sampling (stride row-expansion) over synthetic media rows:
    each document declares a DATA-DEPENDENT frame count (len(text) % 97 + 4)
    in its meta JSON, the sampler emits one row per strided frame index."""
    import ray.data

    from r2s2_ray.functions.multimodal import video_frames

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        import numpy as np

        # pyarrow.compute has no mod kernel in this version — numpy on the
        # combined length chunks stays vectorized
        lens = pc.utf8_length(b["text"]).combine_chunks().to_numpy(zero_copy_only=False)
        n_frames = pa.array(lens % 97 + 4, pa.int64())
        meta = pc.binary_join_element_wise(
            pa.scalar('{"n_frames": '),
            pc.cast(n_frames, pa.string()),
            pa.scalar("}"),
            pa.scalar(""),
        )
        return pa.table({"media_id": b["doc_id"], "meta": meta})

    return video_frames(docs.map_batches(to_media, batch_format="pyarrow"))


def _kg_connected_components(sf_dir: str):
    from r2s2_ray.functions.graph import cc_demo_edges, connected_components_distributed

    # the SCALE path (fully distributed min-label propagation, no driver-side
    # node map) over a multi-10k-node synthetic edge list spanning >1 block;
    # oracle: DuckDB recursive CTE over the same construction
    return connected_components_distributed(cc_demo_edges(sf_dir))


def _kg_scc(sf_dir: str):
    from r2s2_ray.functions.graph import scc_demo_edges, scc_partition_scoped

    # strongly connected components (directed) on the partition-scoped path:
    # the demo graph is document-scoped (node ids embed the doc number), so
    # every per-doc fixpoint runs block-locally via iterative Tarjan in ONE
    # job; the distributed trim+color rounds (scc_distributed) fire only for
    # partitions sharing a node — none here, and tests pin the residue path
    # at volume. Oracle: DuckDB transitive closure (SCC by definition) over
    # the same synthetic cycles-plus-tails construction.
    edges = scc_demo_edges(sf_dir).map_batches(
        lambda b: b.append_column("part", pc.utf8_slice_codeunits(b["src"], 1, 9)),
        batch_format="pyarrow",
    )
    return scc_partition_scoped(edges)


def _kg_sssp(sf_dir: str):
    from r2s2_ray.functions.graph import sssp_demo_edges, sssp_distances

    # weighted shortest paths (directed, integer weights): Bellman-Ford with
    # the improved-only frontier — settled regions stop shuffling; oracle:
    # recursive-CTE path enumeration + min over the same synthetic DAG
    return sssp_distances(sssp_demo_edges(sf_dir), ["R"])


def _kg_topo_layers(sf_dir: str):
    """DAG layer assignment (topological levels = longest hop path from the
    in-degree-0 roots) over the synthetic SSSP DAG: sssp with unit negative
    weights from the distributed root set; oracle = recursive-CTE walk from
    roots + max(layer)."""
    from r2s2_ray.functions.graph import sssp_demo_edges, topo_layers

    return topo_layers(sssp_demo_edges(sf_dir))


def _kg_pagerank(sf_dir: str):
    """Integer-exact distributed PageRank over the distinct hasTurn+mentions
    edge set (3 iterations, scale 1e6, d = 85/100): per-iteration rank
    shipping via key-partitioned hash_joins, per-block contribution combiners
    — bit-exact vs the unrolled-CTE SQL oracle."""
    import polars as pl

    from ray.data.aggregate import Count

    from r2s2_ray.functions.graph import pagerank

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))

    def edge_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred").is_in([vocab.P_HAS_TURN, vocab.P_MENTIONS]))
            .select(pl.col("subj").alias("src"), pl.col("obj").alias("dst"))
            .unique()
            .to_arrow()
        )

    edges = (
        ds.map_batches(edge_rows, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["src", "dst"])
    )
    return pagerank(edges, n_iters=3)


def _kg_ppr(sf_dir: str):
    """Personalized (topic-sensitive) PageRank: identical integer recurrence
    to _kg_pagerank but r0 and the restart term are paid only to the SEED
    set (conversation nodes) — rank concentrates around conversations and
    flows to turns/entities. Seeds join the node set via one left hash_join;
    bit-exact vs the seeded unrolled-CTE oracle."""
    import polars as pl

    from ray.data.aggregate import Count

    from r2s2_ray.functions.graph import pagerank

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))

    def edge_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred").is_in([vocab.P_HAS_TURN, vocab.P_MENTIONS]))
            .select(pl.col("subj").alias("src"), pl.col("obj").alias("dst"))
            .unique()
            .to_arrow()
        )

    def seed_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred"]))
        return (
            df.filter(pl.col("pred") == vocab.P_HAS_TURN)
            .select(pl.col("subj").alias("v"))
            .unique()
            .to_arrow()
        )

    tri = ds.materialize()
    edges = (
        tri.map_batches(edge_rows, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["src", "dst"])
    )
    seeds = (
        tri.map_batches(seed_rows, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Count(alias_name="_m"))
        .select_columns(["v"])
    )
    return pagerank(edges, n_iters=3, seeds=seeds)


def _kg_random_walks(sf_dir: str):
    """Deterministic hash-guided random walks (DeepWalk corpus generation
    without RNG) over the symmetrized hasTurn+mentions graph, one walk per
    conversation node, 4 steps: per step the frontier joins the edge list
    once and the per-walk argmin folds in one groupby via an order-encoding
    Min — bit-exact vs the unrolled-CTE SQL oracle that replays every hash
    choice."""
    import polars as pl

    from ray.data.aggregate import Count

    from r2s2_ray.functions.graph import random_walks

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))

    def edge_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred").is_in([vocab.P_HAS_TURN, vocab.P_MENTIONS]))
            .select(pl.col("subj").alias("src"), pl.col("obj").alias("dst"))
            .unique()
            .to_arrow()
        )

    def seed_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred"]))
        return (
            df.filter(pl.col("pred") == vocab.P_HAS_TURN)
            .select(pl.col("subj").alias("node"))
            .unique()
            .to_arrow()
        )

    tri = ds.materialize()
    edges = (
        tri.map_batches(edge_rows, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["src", "dst"])
    )
    seeds = (
        tri.map_batches(seed_rows, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_m"))
        .select_columns(["node"])
    )
    return random_walks(edges, seeds, n_steps=4)


def _kg_copmi(sf_dir: str):
    """Entity co-mention PMI (whole-bit quantized — the lm_surprisal integer
    log2 contract): turn-keyed pair generation + pair fold + gazetteer-sized
    count broadcast; bit-exact vs the self-join SQL oracle."""
    import polars as pl

    from r2s2_ray.functions.graph import comention_pmi

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))

    def mention_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred") == vocab.P_MENTIONS)
            .select(pl.col("subj").alias("turn"), pl.col("obj").alias("ent"))
            .unique()
            .to_arrow()
        )

    return comention_pmi(ds.map_batches(mention_rows, batch_format="pyarrow"))


#: RDFS ontology for kg_rdfs_infer: domain/range typing + a subclass chain.
_RDFS_DOMAINS = {
    vocab.P_HAS_TURN: vocab.C_CONVERSATION,
    vocab.P_ROLE: vocab.C_TURN,
    vocab.P_TURN_INDEX: vocab.C_TURN,
    vocab.P_MENTIONS: vocab.C_TURN,
    vocab.P_ABOUT: vocab.C_CONVERSATION,
}
_RDFS_RANGES = {
    vocab.P_HAS_TURN: vocab.C_TURN,
    vocab.P_MENTIONS: vocab.C_ENTITY,
    vocab.P_ABOUT: vocab.C_DOCUMENT,
}
_RDFS_SUBCLASS = {
    vocab.C_TURN: vocab.EX + "Utterance",
    vocab.EX + "Utterance": vocab.EX + "Resource",
    vocab.C_CONVERSATION: vocab.EX + "Resource",
    vocab.C_DOCUMENT: vocab.EX + "Resource",
    vocab.C_ENTITY: vocab.EX + "Resource",
}


def _kg_rdfs_infer(sf_dir: str):
    """RDFS entailment materialization (rdfs2/3/9/11): the complete entailed
    rdf:type set — asserted + domain/range-inferred, closed over subClassOf.
    The ontology ships in the task closure (schema-sized); entailment is a
    vectorized map + one distinct exchange, never a data-sized join."""
    from r2s2_ray.functions.graph import rdfs_infer_types

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))
    return rdfs_infer_types(
        ds, domains=_RDFS_DOMAINS, ranges=_RDFS_RANGES, subclass_of=_RDFS_SUBCLASS
    )


#: SHACL-lite shapes validated by kg_shacl: sh:minCount/sh:maxCount per
#: (class, predicate). role/text are clean (no violations); tool and
#: mentions surface the real absences; hasTurn >= 5 fails for every typed
#: conversation (they have 4) — exercising min, max-satisfied and absence.
_SHACL_SHAPES = [
    {"cls": vocab.C_TURN, "pred": vocab.P_ROLE, "min": 1, "max": 1},
    {"cls": vocab.C_TURN, "pred": vocab.P_TEXT, "min": 1, "max": 1},
    {"cls": vocab.C_TURN, "pred": vocab.P_TOOL, "min": 1, "max": 1},
    {"cls": vocab.C_TURN, "pred": vocab.P_MENTIONS, "min": 1, "max": None},
    {"cls": vocab.C_CONVERSATION, "pred": vocab.P_HAS_TURN, "min": 5, "max": None},
]


def _kg_lpa_communities(sf_dir: str):
    """Bounded-round deterministic label propagation over the strong
    co-mention graph — labels ship to edges via hash_join each round, argmax
    folds block-locally; oracle = the same two rounds unrolled in SQL."""
    import polars as pl

    from r2s2_ray.functions.graph import comention_pmi, lpa_communities

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))

    def mention_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred") == vocab.P_MENTIONS)
            .select(pl.col("subj").alias("turn"), pl.col("obj").alias("ent"))
            .unique()
            .to_arrow()
        )

    edges = comention_pmi(ds.map_batches(mention_rows, batch_format="pyarrow"))
    strong = edges.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_ab"], 300)),
        batch_format="pyarrow",
    )
    return lpa_communities(strong, rounds=2)


def _kg_shacl(sf_dir: str):
    """SHACL-lite validation over the extracted triples: cardinality shapes
    per (class, predicate), violations out (absence = count 0 included)."""
    from r2s2_ray.functions.graph import shacl_validate

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))
    return shacl_validate(ds, _SHACL_SHAPES)


def _kg_link_predict(sf_dir: str):
    """Link prediction (Resource-Allocation index — the integer-exact
    Adamic-Adar cousin) over the STRONG entity co-mention graph (pairs
    co-mentioned >= 300 times; the raw gazetteer graph is complete, so the
    thresholded graph is where missing links exist): for every non-edge pair
    with common neighbors, ra_scaled = sum_w 2^20 // deg(w)."""
    import polars as pl

    from r2s2_ray.functions.graph import comention_pmi, link_predict

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))

    def mention_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred") == vocab.P_MENTIONS)
            .select(pl.col("subj").alias("turn"), pl.col("obj").alias("ent"))
            .unique()
            .to_arrow()
        )

    edges = comention_pmi(ds.map_batches(mention_rows, batch_format="pyarrow"))
    strong = edges.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_ab"], 300)),
        batch_format="pyarrow",
    )
    return link_predict(strong)


def _kg_triangles(sf_dir: str):
    """Distributed triangle enumeration over the entity co-mention graph:
    the PMI operator's distinct ordered pairs feed two key-partitioned
    hash_joins (wedge + closing edge) — each triangle once as a < b < c."""
    from r2s2_ray.functions.graph import triangles

    return triangles(_kg_copmi(sf_dir).select_columns(["a", "b"]))


def _kg_clustering(sf_dir: str):
    """Per-node clustering coefficient as an exact rational: triangle count
    per vertex (each enumerated triangle credits its three corners) over
    wedge count deg*(deg-1)/2 — emitted as integer (node, tri, wedges) so no
    float division enters the contract."""
    import polars as pl

    from ray.data.aggregate import Count, Sum

    edges = _kg_copmi(sf_dir).select_columns(["a", "b"]).materialize()
    from r2s2_ray.functions.graph import triangles

    tri = triangles(edges)

    def corners(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return pl.concat(
            [df.select(pl.col(c).alias("node")) for c in ("a", "b", "c")]
        ).to_arrow()

    tri_per_node = (
        tri.map_batches(corners, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="tri"))
    )

    def ends(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return pl.concat(
            [df.select(pl.col(c).alias("node")) for c in ("a", "b")]
        ).to_arrow()

    deg = (
        edges.map_batches(ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )
    from r2s2_ray.relational import hash_join

    joined = hash_join(deg, tri_per_node, on="node", right_cols=["tri"], how="left")

    def finish(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.select(
            pl.col("node"),
            pl.col("tri").fill_null(0).cast(pl.Int64).alias("tri"),
            (pl.col("deg") * (pl.col("deg") - 1) // 2).cast(pl.Int64).alias("wedges"),
        ).to_arrow()

    return joined.map_batches(finish, batch_format="pyarrow")


def _kg_kcore(sf_dir: str):
    """Fixed-round 2-core peeling over the ordered turn-entity mention
    bipartite graph (4 unrolled rounds, two semi-joins per round): surviving
    (node, deg) — exact vs the unrolled-CTE oracle."""
    import polars as pl

    from r2s2_ray.functions.graph import kcore

    ds = canonicalize(extract_triples(read_transcripts(sf_dir)))

    def pair_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        return (
            df.filter(pl.col("pred") == vocab.P_MENTIONS)
            .select(
                pl.min_horizontal("subj", "obj").alias("a"),
                pl.max_horizontal("subj", "obj").alias("b"),
            )
            .unique()
            .to_arrow()
        )

    from ray.data.aggregate import Count

    edges = (
        ds.map_batches(pair_rows, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["a", "b"])
    )
    return kcore(edges, k=2, rounds=4)


def _td_prepare(sf_dir: str):
    from r2s2_ray.pipelines.training_data import prepare_corpus

    return prepare_corpus(sf_dir)


_BF_TOPK_SQL = """(WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 8),
                 s AS (SELECT q.qid, e.vec_id,
                              list_cosine_similarity(q.embedding, e.embedding) AS cos
                       FROM q CROSS JOIN embeddings e)
            SELECT qid, vec_id
            FROM (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn FROM s)
            WHERE rn <= 5)"""


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # KG pipeline (SURVEY.md §2 operators)
        "kg_transcripts": _kg_transcripts,
        "kg_triples_raw": lambda sf: _triples(sf, linked=False),
        "kg_triples_linked": lambda sf: _triples(sf, linked=True),
        "kg_triples_dedup": _kg_triples_dedup,
        "kg_incremental": _kg_incremental,
        "kg_retract": _kg_retract,
        "kg_sparql_update": _kg_sparql_update,
        "kg_sparql_insertwhere": _kg_sparql_insertwhere,
        "kg_sparql_modify": _kg_sparql_modify,
        "kg_sparql_manage": _kg_sparql_manage,
        "kg_pred_counts": _kg_pred_counts,
        "kg_class_census": _kg_class_census,
        "kg_mentions": _kg_mentions,
        "kg_entity_cards": _kg_entity_cards,
        "kg_bfs_khop": _kg_bfs_khop,
        "kg_char_sets": _kg_char_sets,
        "kg_void_summary": _kg_void_summary,
        "kg_literal_stats": _kg_literal_stats,
        "kg_degree_hist": _kg_degree_hist,
        "kg_term_dict": _kg_term_dict,
        "kg_subject_functional": _kg_subject_functional,
        "kg_lcs_bounds": _kg_lcs_bounds,
        "kg_roundtrip": _kg_roundtrip,
        "kg_sparql": _kg_sparql,
        "kg_sparql_graph": _kg_sparql_graph,
        "kg_sparql_graphgroups": _kg_sparql_graphgroups,
        "kg_sparql_describe_where": _kg_sparql_describe_where,
        "kg_sparql_antijoin": _kg_sparql_antijoin,
        "kg_sparql_boundexpr": _kg_sparql_boundexpr,
        "kg_sparql_agg": _kg_sparql_agg,
        "kg_sparql_path": _kg_sparql_path,
        "kg_sparql_construct": _kg_sparql_construct,
        "kg_sparql_subselect": _kg_sparql_subselect,
        "kg_sparql_groupconcat": _kg_sparql_groupconcat,
        "kg_sparql_proplist": _kg_sparql_proplist,
        "kg_sparql_optnested": _kg_sparql_optnested,
        "kg_sparql_optsubselect": _kg_sparql_optsubselect,
        "kg_sparql_star": _kg_sparql_star,
        "kg_sparql_seqpath": _kg_sparql_seqpath,
        "kg_sparql_mixedpath": _kg_sparql_mixedpath,
        "kg_sparql_strfuncs": _kg_sparql_strfuncs,
        "kg_sparql_undef": _kg_sparql_undef,
        "kg_sparql_bool": _kg_sparql_bool,
        "kg_sparql_having": _kg_sparql_having,
        "kg_sparql_aggexpr": _kg_sparql_aggexpr,
        "kg_sparql_dates": _kg_sparql_dates,
        "kg_sparql_union": _kg_sparql_union,
        "kg_sparql_expr": _kg_sparql_expr,
        "kg_sparql_kinds": _kg_sparql_kinds,
        "kg_connected_components": _kg_connected_components,
        "kg_scc": _kg_scc,
        "kg_sssp": _kg_sssp,
        "kg_topo_layers": _kg_topo_layers,
        "kg_pagerank": _kg_pagerank,
        "kg_ppr": _kg_ppr,
        "kg_random_walks": _kg_random_walks,
        "kg_copmi": _kg_copmi,
        "kg_link_predict": _kg_link_predict,
        "kg_shacl": _kg_shacl,
        "kg_rdfs_infer": _kg_rdfs_infer,
        "kg_lpa_communities": _kg_lpa_communities,
        "kg_triangles": _kg_triangles,
        "kg_clustering": _kg_clustering,
        "kg_kcore": _kg_kcore,
        # relational operators (joins/aggregates/sorts/windows/sessions)
        "q_lineitem_agg": relational.q_lineitem_agg,
        "q_join_revenue": relational.q_join_revenue,
        "q_topk_orders": relational.q_topk_orders,
        "q_filter_agg": relational.q_filter_agg,
        "q_distinct_events": relational.q_distinct_events,
        "q_user_cumsum": relational.q_user_cumsum,
        "q_rollup_docs": relational.q_rollup_docs,
        "q_cube_docs": relational.q_cube_docs,
        "q_funnel": relational.q_funnel,
        "q_retention_cohorts": relational.q_retention_cohorts,
        "q_cust_without_orders": relational.q_cust_without_orders,
        "q_quantile_sketch": relational.q_quantile_sketch,
        "q_ntile_users": relational.q_ntile_users,
        "q_grouping_sets": relational.q_grouping_sets,
        "q_user_outliers": relational.q_user_outliers,
        "q_ship_priority": relational.q_ship_priority,
        "q_dau_wau": relational.q_dau_wau,
        "q_late_orders": relational.q_late_orders,
        "q_nation_revenue": relational.q_nation_revenue,
        "q_user_spend_rank": relational.q_user_spend_rank,
        "q_user_median": relational.q_user_median,
        "q_cusum_alerts": relational.q_cusum_alerts,
        "q_value_hour_corr": relational.q_value_hour_corr,
        "q_value_histogram": relational.q_value_histogram,
        "q_sliding_user_count": relational.q_sliding_user_count,
        "q_lead_lag_delta": relational.q_lead_lag_delta,
        "q_pivot_event_types": relational.q_pivot_event_types,
        "q_unpivot": relational.q_unpivot,
        "q_sessions": relational.q_sessions,
        "q_hourly_window": relational.q_hourly_window,
        "q_asof_clicks": relational.q_asof_clicks,
        "q_range_join": relational.q_range_join,
        "q_top_orders_per_cust": relational.q_top_orders_per_cust,
        "q_user_value_quantiles": relational.q_user_value_quantiles,
        "q_hash_join_orders": relational.q_hash_join_orders,
        "q_hash_join_salted": relational.q_hash_join_salted,
        "q_zorder_cluster": relational.q_zorder_cluster,
        "q_meta_count": relational.q_meta_count,
        "q_table_diff": relational.q_table_diff,
        "q_running_distinct": relational.q_running_distinct,
        "q_user_top_event": relational.q_user_top_event,
        "q_user_streaks": relational.q_user_streaks,
        "q_moving_window": relational.q_moving_window,
        "q_interval_union": relational.q_interval_union,
        "q_supplier_by_region": relational.q_supplier_by_region,
        "q_part_brand_stats": relational.q_part_brand_stats,
        "q_json_props": relational.q_json_props,
        "q_hll_distinct": relational.q_hll_distinct,
        "q_heavy_hitters": relational.q_heavy_hitters,
        "q_bloom_semijoin": relational.q_bloom_semijoin,
        # training-data ops
        "dd_exact_docs": _dd_exact_docs,
        "dd_dup_rate": _dd_dup_rate,
        "dd_chunk_dedup": _dd_chunk_dedup,
        "dd_incremental_dedup": _dd_incremental_dedup,
        "td_prepare": _td_prepare,
        "td_render_dialogs": _td_render_dialogs,
        "td_conv_stats": _td_conv_stats,
        "td_turn_dedup": _td_turn_dedup,
        "td_role_transitions": _td_role_transitions,
        "td_loss_masks": _td_loss_masks,
        "dd_minhash_pairs": _dd_minhash,
        "dd_simhash": _dd_simhash,
        "dd_embedding_neardup": _dd_embedding,
        "dd_semdedup": _dd_semdedup,
        "dd_incremental_minhash": _dd_incremental_minhash,
        "dd_cdc_chunks": _dd_cdc_chunks,
        "dd_embedding_lsh": _dd_embedding_lsh,
        "dd_ngram_jaccard": _dd_ngram,
        "dd_ngram_containment": _dd_ngram_containment,
        "sim_ann_bruteforce": _sim_ann_bruteforce,
        "sim_range_search": _sim_range_search,
        "sim_ann_lsh": _sim_ann_lsh,
        "sim_lsh_recall": _sim_lsh_recall,
        "sim_knn_classify": _sim_knn_classify,
        "sim_mmr": _sim_mmr,
        "txt_token_stats": _txt_token_stats,
        "txt_quality": _txt_quality,
        "txt_langid": _txt_langid,
        "txt_fingerprint": _txt_fingerprint,
        "txt_winnow_fp": _txt_winnow_fp,
        "txt_bigram_surprisal": _txt_bigram_surprisal,
        "txt_repetition": _txt_repetition,
        "dd_substring_pairs": _dd_substring_pairs,
        "sim_ann_ivf": _sim_ann_ivf,
        "sim_kmeans": _sim_kmeans,
        "dd_neardup_clusters": _dd_neardup_clusters,
        "dd_cluster_keep_best": _dd_cluster_keep_best,
        "td_shuffle": _td_shuffle,
        "td_epoch_plan": _td_epoch_plan,
        "td_source_mix": _td_source_mix,
        "td_budget_sample": _td_budget_sample,
        "txt_rare_terms": _txt_rare_terms,
        "txt_vocab_coverage": _txt_vocab_coverage,
        "txt_lm_surprisal": _txt_lm_surprisal,
        "td_contamination": _td_contamination,
        "txt_pii_scrub": _txt_pii_scrub,
        "txt_token_chunks": _txt_token_chunks,
        "td_split": _td_split,
        "td_pack": _td_pack,
        "mm_binary_stats": _mm_binary_stats,
        "mm_image_features": _mm_image_features,
        "mm_phash_neardup": _mm_phash_neardup,
        "mm_audio_frames": _mm_audio_frames,
        "mm_wav_energy": _mm_wav_energy,
        "mm_png_pixels": _mm_png_pixels,
        "mm_jpeg_pixels": _mm_jpeg_pixels,
        "mm_bmp_channels": _mm_bmp_channels,
        "mm_bmp_resize": _mm_bmp_resize,
        "mm_media_meta": _mm_media_meta,
        "mm_video_frames": _mm_video_frames,
        "sim_bm25": _sim_bm25,
        "sim_rrf": _sim_rrf,
        "td_dsir_weights": _td_dsir,
        "txt_top_ngrams": _txt_top_ngrams,
        "txt_bpe_pairs": _txt_bpe_pairs,
        "td_temperature_sample": _td_temperature_sample,
        "io_jsonl_roundtrip": _io_jsonl_roundtrip,
        "io_ipc_roundtrip": _io_ipc_roundtrip,
        "io_tar_roundtrip": _io_tar_roundtrip,
        "io_jsonl_gz_roundtrip": _io_jsonl_gz_roundtrip,
        "io_orc_roundtrip": _io_orc_roundtrip,
        "io_hive_partition": _io_hive_partition,
        "io_bucket_join": _io_bucket_join,
        "io_csv_roundtrip": _io_csv_roundtrip,
        "sim_quantize": _sim_quantize,
        "q_profile_docs": _q_profile_docs,
        "dd_setsim_prefix": _dd_setsim_prefix,
        "sim_pq_codes": _sim_pq_codes,
        "sim_ann_pq": _sim_ann_pq,
        "txt_hashed_bow": _txt_hashed_bow,
        "txt_classifier_score": _txt_classifier_score,
        "td_filter_chain": _td_filter_chain,
        "td_interleave_plan": _td_interleave_plan,
        "td_weighted_sample": _td_weighted_sample,
        "td_bernoulli_sample": _td_bernoulli_sample,
        "td_cap_per_source": _td_cap_per_source,
        "txt_compress_ratio": _txt_compress_ratio,
        "sim_jl_project": _sim_jl_project,
        "io_schema_evolution": _io_schema_evolution,
        "dd_edit_neardup": _dd_edit_neardup,
        "td_bucket_batches": _td_bucket_batches,
        "dd_simhash_pairs": _dd_simhash_pairs,
        "io_compact": _io_compact,
        "io_rowgroup_prune": _io_rowgroup_prune,
        "sim_label_centroids": _sim_label_centroids,
        "sim_ivf_persist": _sim_ivf_persist,
        "mm_tar_index": _mm_tar_index,
        "q_users_retained": relational.q_users_retained,
        "q_morning_only_days": relational.q_morning_only_days,
        "q_decayed_counts": relational.q_decayed_counts,
        "q_pushdown_lang": relational.q_pushdown_lang,
        "q_global_rank": relational.q_global_rank,
        "q_skyline": relational.q_skyline,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_transcripts": oracles.transcripts_oracle(),
        "kg_triples_raw": oracles.raw_triples_sql(linked=False),
        "kg_triples_linked": oracles.raw_triples_sql(linked=True),
        "kg_triples_dedup": oracles.dedup_triples_oracle(),
        # incremental two-phase load must equal the ONE-SHOT dedup SQL
        "kg_incremental": oracles.dedup_triples_oracle(),
        "kg_retract": oracles.retract_oracle(_FORGET_GRAPHS),
        "kg_sparql_update": oracles.sparql_update_oracle(),
        "kg_sparql_manage": oracles.sparql_manage_oracle(),
        "kg_sparql_insertwhere": oracles.sparql_insertwhere_oracle(),
        "kg_sparql_modify": oracles.sparql_modify_oracle(),
        "kg_pred_counts": oracles.pred_counts_oracle(),
        "kg_class_census": oracles.class_census_oracle(),
        "kg_mentions": oracles.mentions_oracle(),
        "kg_entity_cards": oracles.entity_cards_oracle(),
        "kg_bfs_khop": oracles.bfs_khop_oracle(max_depth=3),
        "kg_char_sets": oracles.characteristic_sets_oracle(),
        "kg_void_summary": oracles.void_summary_oracle(),
        "kg_literal_stats": oracles.literal_stats_oracle(),
        "kg_degree_hist": oracles.degree_histogram_oracle(),
        "kg_term_dict": oracles.term_dict_oracle(),
        "kg_subject_functional": oracles.subject_functional_oracle(),
        "kg_lcs_bounds": oracles.lcs_bounds_oracle(),
        "kg_roundtrip": oracles.roundtrip_oracle(),
        "kg_sparql": oracles.sparql_turns_oracle(),
        "kg_sparql_graph": oracles.sparql_graph_oracle(),
        "kg_sparql_graphgroups": oracles.sparql_graphgroups_oracle(),
        "kg_sparql_describe_where": oracles.sparql_describe_where_oracle(),
        "kg_sparql_path": oracles.sparql_path_oracle(),
        "kg_sparql_construct": oracles.sparql_construct_oracle(),
        "kg_sparql_subselect": oracles.sparql_subselect_oracle(),
        "kg_sparql_groupconcat": oracles.sparql_groupconcat_oracle(),
        "kg_sparql_antijoin": oracles.sparql_antijoin_oracle(),
        "kg_sparql_boundexpr": oracles.sparql_boundexpr_oracle(),
        "kg_sparql_agg": oracles.sparql_agg_oracle(),
        "kg_sparql_proplist": oracles.sparql_proplist_oracle(),
        "kg_sparql_optnested": oracles.sparql_optnested_oracle(),
        "kg_sparql_optsubselect": oracles.sparql_optsubselect_oracle(),
        "kg_sparql_star": oracles.sparql_star_oracle(),
        "kg_sparql_seqpath": oracles.sparql_seqpath_oracle(),
        "kg_sparql_mixedpath": oracles.sparql_mixedpath_oracle(),
        "kg_pagerank": oracles.pagerank_oracle(n_iters=3),
        "kg_ppr": oracles.pagerank_oracle(n_iters=3, personalized=True),
        "kg_random_walks": oracles.random_walks_oracle(n_steps=4),
        "kg_copmi": oracles.comention_pmi_oracle(),
        "kg_link_predict": oracles.link_predict_oracle(),
        "kg_shacl": oracles.shacl_oracle(_SHACL_SHAPES),
        "kg_lpa_communities": oracles.lpa_oracle(rounds=2),
        "kg_rdfs_infer": oracles.rdfs_infer_oracle(
            _RDFS_DOMAINS, _RDFS_RANGES, _RDFS_SUBCLASS
        ),
        "kg_triangles": oracles.triangles_oracle(),
        "kg_clustering": oracles.clustering_oracle(),
        "kg_kcore": oracles.kcore_oracle(k=2, rounds=4),
        "kg_sparql_strfuncs": oracles.sparql_strfuncs_oracle(),
        "kg_sparql_undef": oracles.sparql_undef_oracle(),
        "kg_sparql_bool": oracles.sparql_bool_oracle(),
        "kg_sparql_having": oracles.sparql_having_oracle(),
        "kg_sparql_aggexpr": oracles.sparql_aggexpr_oracle(),
        "kg_sparql_dates": oracles.sparql_dates_oracle(),
        "kg_sparql_union": oracles.sparql_union_oracle(),
        "kg_sparql_expr": oracles.sparql_expr_oracle(),
        "kg_sparql_kinds": oracles.sparql_kinds_oracle(),
        **relational.ORACLES,
        "dd_exact_docs": "SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text",
        "dd_chunk_dedup": oracles_td.chunk_dedup_oracle(chunk_size=32),
        "dd_dup_rate": oracles_td.dup_rate_oracle(),
        # delta survivors: odd-id docs whose text is absent from the even
        # half, first occurrence (min id) within the delta
        "dd_incremental_dedup": """
            WITH a AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
                 b AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)
            SELECT min(doc_id) AS doc_id, text FROM b
            WHERE text NOT IN (SELECT text FROM a)
            GROUP BY text""",
        "txt_token_stats": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_distinct_tokens,
                   CAST(list_max(list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> len(x))) AS BIGINT) AS max_token_len
            FROM documents""",
        "q_json_props": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
            FROM events GROUP BY event_type""",
        "txt_quality": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
                   CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_spaces
            FROM documents""",
        "mm_binary_stats": """
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS sha256
            FROM documents""",
        "sim_ann_bruteforce": """
            WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 8),
                 s AS (SELECT q.qid, e.vec_id,
                              list_cosine_similarity(q.embedding, e.embedding) AS cos
                       FROM q CROSS JOIN embeddings e)
            SELECT qid, vec_id
            FROM (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn FROM s)
            WHERE rn <= 5""",
        "sim_range_search": """
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings WHERE vec_id < 8)
            SELECT CAST(q.qid AS BIGINT) AS qid, e2.vec_id
            FROM q CROSS JOIN embeddings e2
            WHERE list_cosine_similarity(q.e, CAST(e2.embedding AS DOUBLE[])) >= 0.2""",
        "dd_embedding_neardup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4""",
        "dd_semdedup": oracles_td.semdedup_oracle(k=8, n_iters=2, threshold=0.4),
        "sim_mmr": oracles_td.mmr_oracle(nq=8, k=5, pool=32),
        "dd_incremental_minhash": (
            f"SELECT a, b FROM ({oracles_td.minhash_pairs_oracle()}) "
            f"WHERE a % 2 = 1 OR b % 2 = 1"
        ),
        "dd_ngram_containment": """
            WITH sh AS (
              SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                FROM (SELECT doc_id,
                             list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
                      FROM documents)
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            common AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            ),
            directed AS (
              SELECT a AS src, b AS dst, c * 1.0 / na.n AS cont
              FROM common JOIN cnt na ON na.doc_id = a
              UNION ALL
              SELECT b AS src, a AS dst, c * 1.0 / nb.n AS cont
              FROM common JOIN cnt nb ON nb.doc_id = b
            )
            SELECT src, dst, round(cont, 6) AS containment
            FROM directed WHERE cont >= 0.98""",
        "dd_ngram_jaccard": """
            WITH sh AS (
              SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
                FROM (SELECT doc_id,
                             list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
                      FROM documents)
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            common AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
            FROM common JOIN cnt na ON na.doc_id = a JOIN cnt nb ON nb.doc_id = b
            WHERE c * 1.0 / (na.n + nb.n - c) >= 0.8""",
        # training-data family oracles: bit-exact SQL replicas of the hash-based
        # operators (possible because the operators use the SQL-expressible hash
        # family in r2s2_ray/functions/hashing.py)
        "td_prepare": oracles_td.td_prepare_oracle(),
        "td_render_dialogs": oracles.render_dialogs_oracle(),
        "td_conv_stats": oracles.conv_stats_oracle(),
        "td_turn_dedup": oracles.turn_dedup_oracle(),
        "td_role_transitions": oracles.role_transitions_oracle(),
        "td_loss_masks": oracles.loss_masks_oracle(),
        "txt_fingerprint": oracles_td.fingerprint_oracle(),
        "txt_winnow_fp": oracles_td.winnow_oracle(shingle_k=3, window=4),
        "txt_bigram_surprisal": oracles_td.bigram_surprisal_oracle(),
        "txt_repetition": oracles_td.repetition_oracle(),
        "dd_substring_pairs": oracles_td.substring_pairs_oracle(),
        "sim_ann_ivf": oracles_td.ann_ivf_oracle(),
        "sim_ivf_persist": oracles_td.ann_ivf_oracle(),
        "sim_kmeans": oracles_td.kmeans_oracle(),
        "dd_neardup_clusters": oracles_td.neardup_clusters_oracle(),
        "dd_cluster_keep_best": oracles_td.cluster_keep_best_oracle(),
        "td_shuffle": oracles_td.training_shuffle_oracle(),
        "td_epoch_plan": oracles_td.epoch_plan_oracle(n_epochs=3),
        "q_hll_distinct": oracles_td.hll_distinct_oracle(),
        "td_budget_sample": oracles_td.budget_sample_oracle(),
        "txt_rare_terms": oracles_td.rare_terms_oracle(),
        "txt_vocab_coverage": oracles_td.vocab_coverage_oracle(vocab_size=16),
        "txt_lm_surprisal": oracles_td.lm_surprisal_oracle(),
        "sim_bm25": oracles_td.bm25_oracle(_BM25_QUERIES, k=10),
        "sim_rrf": oracles_td.rrf_oracle(_BM25_QUERIES, k=10),
        "td_dsir_weights": oracles_td.dsir_oracle(),
        "txt_top_ngrams": oracles_td.top_ngrams_oracle(n=2, k=20),
        "txt_bpe_pairs": oracles_td.bpe_pairs_oracle(k=50),
        "td_temperature_sample": oracles_td.temperature_sample_oracle(),
        "io_jsonl_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "io_ipc_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "io_tar_roundtrip": "SELECT doc_id, text, lang FROM documents",
        "io_jsonl_gz_roundtrip": "SELECT doc_id, text, lang, n_chars FROM documents",
        "io_orc_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "io_bucket_join": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority""",
        "io_hive_partition": """
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM documents WHERE lang = 'en' GROUP BY source""",
        "io_csv_roundtrip": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "sim_quantize": oracles_td.quantize_embeddings_oracle(),
        "dd_setsim_prefix": oracles_td.setsim_prefix_oracle(9, 10),
        "txt_hashed_bow": oracles_td.hashed_bow_oracle(dim_bits=8),
        "txt_classifier_score": oracles_td.classifier_score_oracle(dim_bits=8),
        "td_filter_chain": oracles_td.filter_chain_oracle(dim_bits=8),
        "td_interleave_plan": oracles_td.interleave_plan_oracle(),
        "td_weighted_sample": oracles_td.weighted_sample_oracle(k=100),
        "td_bernoulli_sample": oracles_td.bernoulli_sample_oracle(1, 8),
        "td_cap_per_source": oracles_td.cap_per_source_oracle(5),
        "dd_edit_neardup": oracles_td.edit_neardup_oracle(),
        "td_bucket_batches": oracles_td.bucket_batches_oracle(),
        "dd_simhash_pairs": oracles_td.simhash_pairs_oracle(),
        "mm_tar_index": """
            SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0') AS key, 'txt' AS ext,
                   CAST(octet_length(encode(text)) AS BIGINT) AS size
            FROM documents
            UNION ALL
            SELECT lpad(CAST(doc_id AS VARCHAR), 12, '0'), 'cls',
                   CAST(octet_length(encode(lang)) AS BIGINT)
            FROM documents""",
        "io_compact": """
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
            FROM documents""",
        "io_rowgroup_prune": """
            SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS qty
            FROM lineitem
            WHERE l_orderkey BETWEEN (SELECT max(l_orderkey) // 5 FROM lineitem)
                                 AND (SELECT (2 * max(l_orderkey)) // 5 FROM lineitem)""",
        "sim_jl_project": oracles_td.jl_project_oracle(),
        "sim_label_centroids": oracles_td.label_centroids_oracle(),
        "io_schema_evolution": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN text END AS text,
                   lang,
                   CASE WHEN doc_id % 2 = 1 THEN source END AS source,
                   CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
            FROM documents""",
        "dd_cdc_chunks": oracles_td.cdc_chunks_oracle(k=8, mask_bits=6),
        "sim_pq_codes": oracles_td.pq_codes_oracle(m=8, dim=64, k=8, n_iters=2),
        "sim_ann_pq": oracles_td.pq_adc_oracle(m=8, dim=64, k_codes=8, n_iters=2, nq=8, k=5),
        "q_profile_docs": " UNION ALL ".join(
            f"SELECT '{c}' AS \"column\", CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls, "
            f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"min(CAST({c} AS VARCHAR)) AS min_v, "
            f"max(CAST({c} AS VARCHAR)) AS max_v FROM documents"
            for c in ["doc_id", "text", "lang", "source", "n_chars"]
        ),
        "q_heavy_hitters": oracles_td.heavy_hitters_oracle(),
        "q_bloom_semijoin": oracles_td.bloom_semijoin_oracle(),
        "td_source_mix": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                   CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs
            FROM documents GROUP BY source""",
        "td_contamination": oracles_td.contamination_oracle(),
        "txt_pii_scrub": oracles_td.pii_scrub_oracle(),
        "txt_token_chunks": oracles_td.token_chunks_oracle(),
        "td_split": oracles_td.stratified_split_oracle(),
        "td_pack": oracles_td.sequence_pack_oracle(),
        "txt_langid": oracles_td.langid_oracle(),
        "dd_simhash": oracles_td.simhash_oracle(),
        "dd_minhash_pairs": oracles_td.minhash_pairs_oracle(),
        "dd_embedding_lsh": oracles_td.embedding_lsh_oracle(),
        "sim_ann_lsh": oracles_td.ann_lsh_oracle(),
        "sim_lsh_recall": f"""
            WITH x AS {_BF_TOPK_SQL},
                 l AS ({oracles_td.ann_lsh_oracle()})
            SELECT x.qid, CAST(count(l.vec_id) AS BIGINT) AS n_hits,
                   CAST(100 * count(l.vec_id) // 5 AS BIGINT) AS recall_pct
            FROM x LEFT JOIN l ON l.qid = x.qid AND l.vec_id = x.vec_id
            GROUP BY x.qid""",
        "sim_knn_classify": """
            WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 8),
                 s AS (SELECT q.qid, e.vec_id, e.label,
                              list_cosine_similarity(q.embedding, e.embedding) AS cos
                       FROM q CROSS JOIN embeddings e),
                 top AS (SELECT qid, label FROM (
                           SELECT qid, label,
                                  row_number() OVER (PARTITION BY qid
                                      ORDER BY cos DESC, vec_id ASC) AS rn
                           FROM s) WHERE rn <= 10),
                 votes AS (SELECT qid, label, count(*) AS n
                           FROM top GROUP BY qid, label)
            SELECT CAST(qid AS BIGINT) AS qid,
                   CAST(label AS BIGINT) AS label_pred,
                   CAST(n AS BIGINT) AS n_votes
            FROM (SELECT qid, label, n,
                         row_number() OVER (PARTITION BY qid
                             ORDER BY n DESC, label ASC) AS rn
                  FROM votes) WHERE rn = 1""",
        "mm_image_features": oracles_td.image_features_oracle(),
        "mm_phash_neardup": oracles_td.phash_neardup_oracle(),
        "mm_audio_frames": oracles_td.audio_frames_oracle(),
        "mm_wav_energy": """
            WITH d AS (SELECT doc_id, 2 * (doc_id % 32747) + 1 AS a, doc_id % 65536 AS c
                       FROM documents),
                 fr AS (SELECT doc_id, a, c, CAST(f AS BIGINT) AS frame_idx
                        FROM d, unnest(generate_series(0, 7)) t(f)),
                 s AS (SELECT doc_id, frame_idx,
                              (a * (frame_idx * 160 + j) + c) % 65536 - 32768 AS v
                       FROM fr, unnest(generate_series(0, 399)) u(j))
            SELECT doc_id AS media_id, frame_idx,
                   CAST(sum(v * v) AS BIGINT) AS energy
            FROM s GROUP BY 1, 2""",
        "mm_png_pixels": """
            WITH d AS (SELECT doc_id, 2 * (doc_id % 127) + 1 AS a, doc_id % 251 AS c
                       FROM documents),
                 px AS (SELECT doc_id, (a * k + c) % 256 AS p
                        FROM d, unnest(generate_series(0, 255)) t(k))
            SELECT doc_id AS media_id,
                   CAST(sum(p) AS BIGINT) AS pixel_sum,
                   CAST(min(p) AS BIGINT) AS pixel_min,
                   CAST(max(p) AS BIGINT) AS pixel_max
            FROM px GROUP BY doc_id""",
        "mm_bmp_resize": """
            WITH rc AS (SELECT doc_id, 2 * (i // 5) * 10 + 2 * (i % 5) AS k
                        FROM documents, unnest(generate_series(0, 19)) t(i))
            SELECT doc_id AS media_id,
                   CAST(4 AS BIGINT) AS out_h, CAST(5 AS BIGINT) AS out_w,
                   CAST(sum((3 * k + doc_id) % 256) AS BIGINT) AS sum_r,
                   CAST(sum((5 * k + doc_id + 1) % 256) AS BIGINT) AS sum_g,
                   CAST(sum((7 * k + doc_id + 2) % 256) AS BIGINT) AS sum_b
            FROM rc GROUP BY doc_id""",
        "mm_jpeg_pixels": """
            WITH tv AS (SELECT doc_id, (7 * doc_id + 59 * i) % 256 AS v
                        FROM documents, unnest(generate_series(0, 3)) t(i))
            SELECT doc_id AS media_id,
                   CAST(64 * sum(v) AS BIGINT) AS pixel_sum,
                   CAST(min(v) AS BIGINT) AS pixel_min,
                   CAST(max(v) AS BIGINT) AS pixel_max
            FROM tv GROUP BY doc_id""",
        "mm_bmp_channels": """
            WITH px AS (SELECT doc_id, k FROM documents,
                        unnest(generate_series(0, 79)) t(k))
            SELECT doc_id AS media_id,
                   CAST(sum((3 * k + doc_id) % 256) AS BIGINT) AS sum_r,
                   CAST(sum((5 * k + doc_id + 1) % 256) AS BIGINT) AS sum_g,
                   CAST(sum((7 * k + doc_id + 2) % 256) AS BIGINT) AS sum_b
            FROM px GROUP BY doc_id""",
        "mm_media_meta": """
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 31 = 0 THEN 'unknown'
                        WHEN doc_id % 3 = 0 THEN 'png'
                        WHEN doc_id % 3 = 1 THEN 'bmp'
                        ELSE 'wav' END AS kind,
                   CAST(CASE WHEN doc_id % 31 = 0 THEN -1
                        WHEN doc_id % 3 = 0 THEN 16
                        WHEN doc_id % 3 = 1 THEN 10
                        ELSE -1 END AS BIGINT) AS width,
                   CAST(CASE WHEN doc_id % 31 = 0 THEN -1
                        WHEN doc_id % 3 = 0 THEN 16
                        WHEN doc_id % 3 = 1 THEN 8
                        ELSE -1 END AS BIGINT) AS height,
                   CAST(CASE WHEN doc_id % 31 = 0 OR doc_id % 3 < 2 THEN -1
                        ELSE doc_id % 50 + 20 END AS BIGINT) AS n_samples
            FROM documents""",
        "mm_video_frames": oracles_td.video_frames_oracle(),
        "kg_connected_components": oracles_td.connected_components_oracle(),
        "kg_scc": oracles_td.scc_oracle(),
        "kg_sssp": oracles_td.sssp_oracle(),
        "kg_topo_layers": oracles_td.topo_layers_oracle(),
    }
