"""Table-merging unit tests (FIXTURES.md §B.6): subject-unique functional
predicates merge into a wide table; non-unique tables don't; unmatched source rows
stay behind (TableMergingConcurence leftover semantics)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from r2s2_ray.state.manifest import ColumnSpec, PredicateMapSpec, TableSpec
from r2s2_ray.stages.merge import plan_cohorts, run_merge
from r2s2_ray.terms import KIND_IRI, KIND_LITERAL, XSD_STRING


def _lean_rows(subjects, objs):
    return pa.table(
        {
            "subj": pa.array(subjects, pa.string()),
            "s_kind": pa.array([KIND_IRI] * len(subjects), pa.int8()),
            "pred": pa.array(["p"] * len(subjects), pa.string()),
            "obj": pa.array(objs, pa.string()),
            "o_kind": pa.array([KIND_LITERAL] * len(subjects), pa.int8()),
            "o_lang": pa.nulls(len(subjects), pa.string()),
            "o_dt": pa.array([XSD_STRING] * len(subjects), pa.string()),
            "graphs": pa.array([[0]] * len(subjects), pa.list_(pa.int32())),
        }
    )


def _spec(name, predicate, rows):
    return TableSpec(
        name=name,
        subj_kind=KIND_IRI,
        subject_columns=[ColumnSpec(name=f"subject_{name}_path")],
        predicates=[
            PredicateMapSpec(
                predicate=predicate,
                obj_kind=KIND_LITERAL,
                datatype=XSD_STRING,
                object_columns=[
                    ColumnSpec(name=f"object_{name}_datatype"),
                    ColumnSpec(name=f"object_{name}_litvalue"),
                ],
                graph_column=f"object_{name}_graph",
            )
        ],
        row_count=rows,
    )


@pytest.fixture()
def merge_env(tmp_path):
    out = str(tmp_path)
    S = [f"https://e/{i}" for i in range(6)]
    tables = {
        # target candidate: subject-unique, subjects 0..3
        "ta": _lean_rows(S[0:4], [f"a{i}" for i in range(4)]),
        # mergeable: subject-unique, subjects 2..5 -> 2,3 merge; 4,5 leftover
        "tb": _lean_rows(S[2:6], [f"b{i}" for i in range(4)]),
        # NOT subject-unique -> must not merge
        "tc": _lean_rows([S[0], S[0], S[1]], ["c0", "c1", "c2"]),
    }
    for name, tbl in tables.items():
        d = os.path.join(out, "lean", f"table_key={name}")
        os.makedirs(d)
        pq.write_table(tbl.drop_columns([]), os.path.join(d, "part-0.parquet"))
    specs = [
        _spec("ta", "https://ex.org/vocab/pa", 4),
        _spec("tb", "https://ex.org/vocab/pb", 4),
        _spec("tc", "https://ex.org/vocab/pc", 3),
    ]
    return out, specs


def test_merge_with_leftovers(merge_env):
    out, specs = merge_env
    result = run_merge(out, specs)
    by_name = {t.name: t for t in result}
    # ta+tb merged under ta (smaller/alphabetical target), 2 predicates wide
    merged = by_name["ta"]
    assert len(merged.predicates) == 2
    assert merged.row_count == 4  # target's subjects
    # tb keeps its 2 unmatched rows
    assert by_name["tb"].row_count == 2
    assert by_name["tb"].path and "leftover" in by_name["tb"].path
    # tc untouched
    assert len(by_name["tc"].predicates) == 1 and by_name["tc"].row_count == 3
    # merged lean holds coalesced objects for overlapping subjects
    merged_tbl = pq.read_table(os.path.join(out, "lean_merged", "ta"))
    rows = {
        r["subj"]: (r["obj__0"], r["obj__1"]) for r in merged_tbl.to_pylist()
    }
    assert rows["https://e/2"] == ("a2", "b0")
    assert rows["https://e/0"] == ("a0", None)
    left_tbl = pq.read_table(os.path.join(out, "lean_merged", "tb__leftover"))
    assert sorted(left_tbl["subj"].to_pylist()) == ["https://e/4", "https://e/5"]


def test_plan_requires_disjoint_predicates():
    a = _spec("a", "https://ex.org/vocab/same", 2)
    b = _spec("b", "https://ex.org/vocab/same", 2)
    cohorts = plan_cohorts([a, b], {"a": True, "b": True}, {("a", "b"): 2})
    assert cohorts == []


def test_plan_requires_overlap():
    a = _spec("a", "https://ex.org/vocab/pa", 2)
    b = _spec("b", "https://ex.org/vocab/pb", 2)
    assert plan_cohorts([a, b], {"a": True, "b": True}, {}) == []
    assert len(plan_cohorts([a, b], {"a": True, "b": True}, {("a", "b"): 1})) == 1
