"""Operator-level optimizer tests — ports of the reference's optimization tests
(FIXTURES.md §B.4/B.5: OptimizeForDatatypeTest.java:24-94,
IntroduceVirtualColumns.java:29-76, OptimizeForLongestCommonSubstring.java:33-100)."""

import pyarrow as pa

from r2s2_ray.state.manifest import ColumnSpec, PredicateMapSpec, TableSpec
from r2s2_ray.stages.stats import block_col_stats, decide_columns
from r2s2_ray.terms import KIND_IRI, KIND_LITERAL, XSD_GYEAR, XSD_INTEGER


def _spec(datatype=XSD_INTEGER):
    return TableSpec(
        name="t",
        subj_kind=KIND_IRI,
        subject_columns=[ColumnSpec(name="subject_p_path")],
        predicates=[
            PredicateMapSpec(
                predicate="https://ex.org/vocab/p",
                obj_kind=KIND_LITERAL,
                datatype=datatype,
                object_columns=[
                    ColumnSpec(name="object_p_dt_datatype"),
                    ColumnSpec(name="object_p_dt_litvalue"),
                ],
                graph_column="object_p_graph",
            )
        ],
    )


def _decide(values, datatype=XSD_INTEGER, subj_values=None):
    spec = _spec(datatype)
    stats = {
        "object_p_dt_litvalue": block_col_stats(
            pa.array(values, pa.string()), ["int", "gyear", "bool", "float", "date", "datetime"]
        ),
        "object_p_dt_datatype": block_col_stats(pa.array([datatype] * len(values)), []),
        "subject_p_path": block_col_stats(
            pa.array(subj_values or [f"/x/{i}" for i in range(len(values))]), ["int"]
        ),
    }
    decide_columns(spec, stats, {"object_p_graph": {"max_len": 1}})
    return spec


def test_int_promotion():
    # 100 ints -> promoted (OptimizeForDatatypeTest: numeric path)
    spec = _decide([str(i) for i in range(100)])
    lit = spec.predicates[0].object_columns[1]
    assert lit.datatype == "BIGINT" and lit.physical


def test_leading_zero_rejection():
    # zero-padded lexicals must NOT promote (round-trip would change them)
    spec = _decide([f"{i:03d}" for i in range(100)])
    lit = spec.predicates[0].object_columns[1]
    assert lit.datatype == "TEXT"


def test_mixed_alpha_rejection():
    spec = _decide([str(i) for i in range(100)] + ["A"])
    lit = spec.predicates[0].object_columns[1]
    assert lit.datatype == "TEXT"


def test_gyear_promotion():
    spec = _decide([f"{i:04d}" for i in range(10)], datatype=XSD_GYEAR)
    lit = spec.predicates[0].object_columns[1]
    assert lit.datatype == "GYEAR"


def test_virtual_single_value():
    # constant column -> dropped with recorded constant; datatype col is always
    # constant per table
    spec = _decide(["7"] * 50)
    dt_col = spec.predicates[0].object_columns[0]
    assert not dt_col.physical and dt_col.virtual_value == XSD_INTEGER
    lit = spec.predicates[0].object_columns[1]
    assert not lit.physical and lit.virtual_value == "7"


def test_all_null_virtual():
    spec = _decide([None, None, None])
    lit = spec.predicates[0].object_columns[1]
    assert not lit.physical and lit.virtual_value is None


def test_lcs_prefix():
    spec = _decide(
        ["x" + str(i) for i in range(10)],
        subj_values=[f"/conv/c{i}/turn/0" for i in range(10)],
    )
    subj = spec.subject_columns[0]
    assert subj.lcs_prefix == "/conv/c"


def test_lcs_aborts_on_empty_string():
    # zero-length value -> LCS abort (OptimizeForLongestCommonSubstring.java:70-81)
    spec = _decide(["x1", "x2"], subj_values=["/a/1", ""])
    assert spec.subject_columns[0].lcs_prefix is None


def test_graph_list_decision():
    spec = _spec()
    stats = {
        "object_p_dt_litvalue": block_col_stats(pa.array(["1", "2"]), ["int"]),
        "object_p_dt_datatype": block_col_stats(pa.array([XSD_INTEGER] * 2), []),
        "subject_p_path": block_col_stats(pa.array(["/a", "/b"]), []),
    }
    decide_columns(spec, stats, {"object_p_graph": {"max_len": 3}})
    assert spec.predicates[0].graph_is_list
