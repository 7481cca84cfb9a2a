"""TableSpec construction from routing combos (the logical-schema registry —
mirror of the reference's ``List<Table>`` built during parsing,
ParseIntoSOGTables.java:100-124 + Table.java:21-38)."""

from __future__ import annotations

from ..naming import DEFAULT_NAMESPACES, iri_to_sql_name_part
from ..state.manifest import ColumnSpec, PredicateMapSpec, TableSpec
from ..terms import (
    IRI_PARTS,
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    object_columns,
    subject_columns,
)
from .fold import combo_to_table_key


def spec_from_combo(combo: str, namespaces=None) -> TableSpec:
    ns = namespaces or DEFAULT_NAMESPACES
    name, tk, class_iri = combo_to_table_key(combo, ns)
    pred_part = iri_to_sql_name_part(tk.predicate, ns)
    dt_part = iri_to_sql_name_part(tk.datatype, ns) if tk.datatype else None
    subj_cols = [ColumnSpec(name=n, datatype="BIGINT" if tk.subj_kind == KIND_BNODE else "TEXT")
                 for n in subject_columns(pred_part, tk.subj_kind)]
    obj_cols = [ColumnSpec(name=n, datatype="BIGINT" if tk.obj_kind == KIND_BNODE else "TEXT")
                for n in object_columns(pred_part, tk.obj_kind, tk.lang, dt_part)]
    pm = PredicateMapSpec(
        predicate=tk.predicate,
        obj_kind=tk.obj_kind,
        lang=tk.lang,
        datatype=tk.datatype,
        object_columns=obj_cols,
        graph_column=f"object_{pred_part}_graph",
    )
    return TableSpec(
        name=name,
        subj_kind=tk.subj_kind,
        subject_columns=subj_cols,
        predicates=[pm],
        class_iri=class_iri,
    )
