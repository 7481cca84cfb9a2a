"""Edge-case pins for the full SPARQL 1.1 Modify form (DELETE/INSERT/WHERE)
landed in session 7 — oracle equality runs in the entry-contract sweep
(kg_sparql_modify); these pin what the sweep can't see: parser shapes,
pre-state instantiation semantics (the classic swap), GRAPH ?g re-targeting,
convergence, and DATA-block rejections."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from r2s2_ray.terms import XSD_STRING

IRI = 1
LIT = 2
DG = "https://graphs.example.org/default"


def _state(tmp_path, rows):
    """rows: (subj, pred, obj, o_kind, o_dt, graph) -> built per-bucket state."""
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build

    tbl = pa.table(
        {
            "subj": [r[0] for r in rows],
            "s_kind": pa.array([IRI] * len(rows), pa.int8()),
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "o_kind": pa.array([r[3] for r in rows], pa.int8()),
            "o_lang": pa.array([None] * len(rows), pa.string()),
            "o_dt": pa.array([r[4] for r in rows], pa.string()),
            "graph": [r[5] for r in rows],
        }
    )
    state = str(tmp_path / "state")
    quad_state_build(route(ray.data.from_arrow(tbl)), state, num_buckets=4)
    return state


def _quadset(state):
    from r2s2_ray.pipelines.update import state_quads

    return {
        (r["subj"], r["pred"], r["obj"], r["graph"])
        for r in state_quads(state).take_all()
    }


def test_modify_parser_shapes():
    from r2s2_ray.pipelines.update import parse_update

    ops = parse_update(
        "DELETE { ?s <https://p/x> ?o } INSERT { ?o <https://p/x> ?s } "
        "WHERE { ?s <https://p/x> ?o }"
    )
    assert ops[0][0] == "modify"
    dels, ins, where = ops[0][1]
    assert len(dels) == 1 and len(ins) == 1 and len(where) == 1
    # DELETE-only Modify (no INSERT) is legal
    ops = parse_update(
        "DELETE { ?s <https://p/x> ?o } WHERE { ?s <https://p/x> ?o }"
    )
    assert ops[0][0] == "modify" and ops[0][1][1] == []
    # bare DELETE template with no WHERE is NOT a valid form
    with pytest.raises(ValueError, match="WHERE"):
        parse_update("DELETE { <https://s/1> <https://p/x> <https://o/1> }")


def test_variable_graph_rejected_in_data_blocks():
    from r2s2_ray.pipelines.update import _quads_to_table, parse_update

    ops = parse_update(
        "INSERT DATA { GRAPH ?g { <https://s/1> <https://p/x> <https://o/1> } }"
    )
    with pytest.raises(ValueError, match="variable graph"):
        _quads_to_table(ops[0][1])


def test_modify_swap_uses_prestate_solutions(tmp_path):
    """DELETE {?s p ?o} INSERT {?o p ?s} WHERE {?s p ?o} over a->b->c must
    yield exactly {b->a, c->b}: both templates instantiate from the SAME
    pre-state matches — sequential per-solution mutation would let the
    inserted b->a re-match and corrupt the result."""
    from r2s2_ray.pipelines.update import apply_update

    # templates without GRAPH target the DEFAULT graph, so the pre-state
    # edges must live there for the delete side to hit
    p = "https://p/x"
    state = _state(
        tmp_path,
        [
            ("https://n/a", p, "https://n/b", IRI, None, DG),
            ("https://n/b", p, "https://n/c", IRI, None, DG),
        ],
    )
    apply_update(
        state,
        f"DELETE {{ ?s <{p}> ?o }} INSERT {{ ?o <{p}> ?s }} WHERE {{ ?s <{p}> ?o }}",
        num_buckets=4,
    )
    assert _quadset(state) == {
        ("https://n/b", p, "https://n/a", DG),
        ("https://n/c", p, "https://n/b", DG),
    }


def test_modify_graph_var_retargets_per_match(tmp_path):
    """GRAPH ?g binds each match's own graph and the templates write back
    into exactly that graph — no cross-graph contamination."""
    from r2s2_ray.pipelines.update import apply_update

    role = "https://p/role"
    state = _state(
        tmp_path,
        [
            ("https://t/1", role, "user", LIT, XSD_STRING, "https://g/1"),
            ("https://t/2", role, "user", LIT, XSD_STRING, "https://g/2"),
            ("https://t/3", role, "tool", LIT, XSD_STRING, "https://g/1"),
        ],
    )
    src = (
        f'DELETE {{ GRAPH ?g {{ ?t <{role}> "user" }} }} '
        f'INSERT {{ GRAPH ?g {{ ?t <{role}> "human" }} }} '
        f'WHERE  {{ GRAPH ?g {{ ?t <{role}> "user" }} }}'
    )
    stats = apply_update(state, src, num_buckets=4)
    assert sum(r.get("n_removed", 0) for r in stats) == 2
    assert _quadset(state) == {
        ("https://t/1", role, "human", "https://g/1"),
        ("https://t/2", role, "human", "https://g/2"),
        ("https://t/3", role, "tool", "https://g/1"),
    }
    # convergence: the WHERE no longer matches, so a re-run is a no-op
    quads_before = _quadset(state)
    stats2 = apply_update(state, src, num_buckets=4)
    assert sum(r.get("n_removed", 0) for r in stats2) == 0
    assert _quadset(state) == quads_before


def test_modify_delete_only_and_absent_quads_noop(tmp_path):
    """DELETE-only Modify removes matched quads; delete-template rows that
    instantiate to quads absent from the state are silent no-ops (SPARQL
    set semantics)."""
    from r2s2_ray.pipelines.update import apply_update

    p, q = "https://p/x", "https://p/y"
    state = _state(
        tmp_path,
        [
            ("https://n/a", p, "https://n/b", IRI, None, DG),
            ("https://n/a", q, "https://n/c", IRI, None, DG),
        ],
    )
    # the template deletes (?o q ?s) reversed pairs: (b q a) is absent -> no-op;
    # the (a q c) row survives because WHERE binds on p, and (c q a) is absent
    apply_update(
        state,
        f"DELETE {{ ?s <{p}> ?o . ?o <{q}> ?s }} WHERE {{ ?s <{p}> ?o }}",
        num_buckets=4,
    )
    assert _quadset(state) == {("https://n/a", q, "https://n/c", DG)}
