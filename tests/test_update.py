"""SPARQL 1.1 UPDATE over the quad state (pipelines/update.py): grammar
strictness, delete/insert semantics, set-semantics no-ops, and convergence
(re-running the same request is a byte-identical no-op)."""

from __future__ import annotations

import glob

import pytest

from conftest import SF_SMALL

EX = "https://ex.org/vocab/"
G0 = "https://graphs.example.org/g0"


def _routed():
    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.stages.fold import route
    from r2s2_ray.transcripts import read_transcripts

    return route(extract_triples(read_transcripts(SF_SMALL)))


def _state_files(state: str) -> dict[str, int]:
    import os

    return {
        f: os.path.getsize(f)
        for f in sorted(glob.glob(f"{state}/bucket=*/quads-*.parquet"))
    }


def test_parse_update_rejects():
    from r2s2_ray.pipelines.update import parse_update, _quads_to_constraints

    with pytest.raises(ValueError, match="unsupported syntax"):
        parse_update("SELECT * WHERE { ?s ?p ?o }")
    with pytest.raises(ValueError, match="no UPDATE op"):
        parse_update("   ;  ")
    with pytest.raises(ValueError, match="missing '.' between triples"):
        parse_update(f"INSERT DATA {{ <a:s> <a:p> <a:o> <a:s2> <a:p> <a:o> }}")
    with pytest.raises(ValueError, match="illegal in a DATA block"):
        from r2s2_ray.pipelines.update import _quads_to_table

        _quads_to_table(parse_update("INSERT DATA { ?s <a:p> <a:o> }")[0][1])
    # join-constrained DELETE WHERE templates reject loudly
    ops = parse_update("DELETE WHERE { ?s <a:p> ?x . ?x <a:q> ?y . }")
    with pytest.raises(ValueError, match="join-constrained"):
        _quads_to_constraints(ops[0][1], exact=False)
    # unconstrained wholesale deletion rejects
    ops = parse_update("DELETE WHERE { ?s ?p ?o }")
    with pytest.raises(ValueError, match="wholesale"):
        _quads_to_constraints(ops[0][1], exact=False)
    # variables illegal in DELETE DATA
    ops = parse_update("DELETE DATA { <a:s> <a:p> <a:o> }")
    ops_bad = parse_update("DELETE WHERE { <a:s> <a:p> ?o }")
    _quads_to_constraints(ops[0][1], exact=True)
    with pytest.raises(ValueError, match="illegal in DELETE DATA"):
        _quads_to_constraints(ops_bad[0][1], exact=True)


def test_update_semantics_and_convergence(ray_session, tmp_path):
    from r2s2_ray.pipelines.update import apply_update
    from r2s2_ray.stages.incremental import quad_state_build, state_folded

    state = str(tmp_path / "state")
    quad_state_build(_routed(), state, num_buckets=8)

    src = f"""
    PREFIX ex: <{EX}>
    DELETE WHERE {{ ?t ex:tool ?name }} ;
    INSERT DATA {{
      GRAPH <{G0}> {{ <https://ex.org/conv/manual-0> a ex:Conversation . }}
    }}
    """
    stats = apply_update(state, src, num_buckets=8)
    removed = sum(r.get("n_removed", 0) for r in stats if r["kind"] == "delete_where")
    assert removed > 0
    files_once = _state_files(state)

    folded = state_folded(state).to_pandas()
    assert (folded["pred"] == EX + "tool").sum() == 0
    ins = folded[folded["subj"] == "https://ex.org/conv/manual-0"]
    assert len(ins) == 1 and ins.iloc[0]["obj"] == EX + "Conversation"

    # re-running the identical request converges: delete finds nothing new,
    # set-semantics insert is a no-op, every state file is byte-identical
    stats2 = apply_update(state, src, num_buckets=8)
    assert sum(r.get("n_removed", 0) for r in stats2 if r["kind"] == "delete_where") == 0
    assert _state_files(state) == files_once

    # DELETE DATA of the quad just inserted removes exactly one quad
    src_del = (
        f"DELETE DATA {{ GRAPH <{G0}> {{ <https://ex.org/conv/manual-0> "
        f"<http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{EX}Conversation> }} }}"
    )
    stats3 = apply_update(state, src_del, num_buckets=8)
    assert sum(r.get("n_removed", 0) for r in stats3) == 1
    folded3 = state_folded(state).to_pandas()
    assert (folded3["subj"] == "https://ex.org/conv/manual-0").sum() == 0


def test_delete_where_literal_exactness(ray_session, tmp_path):
    """A plain-literal pattern ("x" == "x"^^xsd:string) must not delete
    lang-tagged or differently-typed literals with the same lexical form."""
    import pyarrow as pa
    import ray.data

    from r2s2_ray.pipelines.update import apply_update
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build, state_folded
    from r2s2_ray.terms import XSD_STRING

    tbl = pa.table(
        {
            "subj": pa.array(["a:s1", "a:s2", "a:s3"], pa.string()),
            "s_kind": pa.array([1, 1, 1], pa.int8()),
            "pred": pa.array(["a:p"] * 3, pa.string()),
            "obj": pa.array(["x", "x", "x"], pa.string()),
            "o_kind": pa.array([2, 2, 2], pa.int8()),
            "o_lang": pa.array([None, "en", None], pa.string()),
            "o_dt": pa.array([XSD_STRING, None, "a:customType"], pa.string()),
            "graph": pa.array(["g", "g", "g"], pa.string()),
        }
    )
    state = str(tmp_path / "state")
    quad_state_build(route(ray.data.from_arrow(tbl)), state, num_buckets=4)
    stats = apply_update(state, 'DELETE WHERE { ?s <a:p> "x" }', num_buckets=4)
    assert sum(r["n_removed"] for r in stats) == 1
    left = state_folded(state).to_pandas()
    assert sorted(left["subj"]) == ["a:s2", "a:s3"]


def test_delete_where_graph_variable_is_union_semantics():
    """GRAPH ?g { pattern } in DELETE WHERE constrains nothing about the
    graph (union semantics, matching the serving path): the parsed
    constraint set must equal the plain-pattern form."""
    from r2s2_ray.pipelines.update import _quads_to_constraints, parse_update

    plain = parse_update("DELETE WHERE { ?s <a:p> ?o }")
    wrapped = parse_update("DELETE WHERE { GRAPH ?g { ?s <a:p> ?o } }")
    assert _quads_to_constraints(plain[0][1], exact=False) == _quads_to_constraints(
        wrapped[0][1], exact=False
    )
    pinned = parse_update("DELETE WHERE { GRAPH <g:1> { ?s <a:p> ?o } }")
    cons = _quads_to_constraints(pinned[0][1], exact=False)
    assert cons[0]["graph"] == "g:1"
