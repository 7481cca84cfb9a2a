"""Per-stage manifest: the engine's checkpoint IR.

Parity target: the reference serializes its ``List<Table>`` schema state to a Turtle
description file after every step and reloads it to resume any step
(TableDescriptionAsRdf.java:91-214, Loader.java:139-143,207-213). Here the same state —
logical tables, physical/virtual columns, dictionary paths, per-stage lineage + metrics —
is JSON under ``<out>/_manifest/step-NN-<stage>.json``; a stage whose manifest exists is
skipped on resume (per-partition outputs are additionally guarded by ``_SUCCESS``
markers, see stages/materialize.py). That is the "resumable from per-partition
checkpoints with lineage + metrics" requirement in the north rule.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class ColumnSpec:
    """Physical or virtual column (parity Column.java:8-41 /
    VirtualSingleValueColumn.java:3-24). ``lcs_prefix`` holds the factored common
    prefix (OptimizeForLongestCommonSubstring.java:33-100): the physical column stores
    suffixes, reconstruction prepends the prefix."""

    name: str
    datatype: str = "TEXT"
    physical: bool = True
    virtual_value: str | None = None
    lcs_prefix: str | None = None
    #: True when the stats census saw >=1 NULL — drives the R2RML emitter's
    #: null-pattern TriplesMap variants (a template referencing a NULL column
    #: generates no term under R2RML semantics, so optional IRI parts need
    #: per-pattern maps)
    nullable: bool = False


@dataclass
class PredicateMapSpec:
    """(predicate, object column group, objKind, lang, datatype) — parity
    PredicateMap.java:7-13. A table holds many of these after merging."""

    predicate: str
    obj_kind: int
    lang: str | None = None
    datatype: str | None = None
    object_columns: list[ColumnSpec] = field(default_factory=list)
    graph_column: str | None = None
    graph_is_list: bool = False


@dataclass
class TableSpec:
    """One vertically-partitioned logical table (parity Table.java:21-38)."""

    name: str
    subj_kind: int
    subject_columns: list[ColumnSpec] = field(default_factory=list)
    predicates: list[PredicateMapSpec] = field(default_factory=list)
    class_iri: str | None = None  # set for rdf:type-split tables (RdfTypeSplitting)
    row_count: int = -1
    path: str | None = None  # parquet directory of this table's data
    #: T10/A5 record (IntroduceIndexes.java:22-46 semantics): True when the
    #: fold census proved no subject repeats — the table could carry a unique
    #: subject index; False = the duplicate-subject fallback (plain sort only).
    #: None when censused state is unavailable (specs built outside the pipeline).
    subject_unique: bool | None = None

    def all_columns(self) -> list[ColumnSpec]:
        out = list(self.subject_columns)
        for pm in self.predicates:
            out.extend(pm.object_columns)
        return out

    def physical_names(self) -> list[str]:
        return [c.name for c in self.all_columns() if c.physical] + [
            pm.graph_column for pm in self.predicates if pm.graph_column
        ]


@dataclass
class Manifest:
    stage: str
    step: int
    tables: list[TableSpec] = field(default_factory=list)
    dictionaries: dict[str, str] = field(default_factory=dict)  # name -> parquet path
    enums: dict[str, list[str]] = field(default_factory=dict)  # enum name -> ordered values
    lineage: dict = field(default_factory=dict)  # inputs, params
    metrics: dict = field(default_factory=dict)  # wall times, row counts

    def table(self, name: str) -> TableSpec:
        for t in self.tables:
            if t.name == name:
                return t
        raise KeyError(name)


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, step: int, stage: str) -> str:
    return os.path.join(_manifest_dir(out_dir), f"step-{step:02d}-{stage}.json")


def save_manifest(out_dir: str, m: Manifest) -> str:
    from ..util import fs_for, fs_makedirs, fs_write_text

    fs_makedirs(_manifest_dir(out_dir))
    p = manifest_path(out_dir, m.step, m.stage)
    tmp = p + ".tmp"
    fs_write_text(tmp, json.dumps(asdict(m), indent=1))
    f, pp = fs_for(p)
    _, tmp_local = fs_for(tmp)
    f.move(tmp_local, pp)  # atomic on the local FS; single PUT on object stores
    return p


def load_manifest(path: str) -> Manifest:
    from ..util import fs_read_text

    d = json.loads(fs_read_text(path))
    tables = [
        TableSpec(
            name=t["name"],
            subj_kind=t["subj_kind"],
            subject_columns=[ColumnSpec(**c) for c in t["subject_columns"]],
            predicates=[
                PredicateMapSpec(
                    predicate=pm["predicate"],
                    obj_kind=pm["obj_kind"],
                    lang=pm["lang"],
                    datatype=pm["datatype"],
                    object_columns=[ColumnSpec(**c) for c in pm["object_columns"]],
                    graph_column=pm["graph_column"],
                    graph_is_list=pm["graph_is_list"],
                )
                for pm in t["predicates"]
            ],
            class_iri=t["class_iri"],
            row_count=t["row_count"],
            path=t["path"],
            subject_unique=t.get("subject_unique"),
        )
        for t in d["tables"]
    ]
    return Manifest(
        stage=d["stage"],
        step=d["step"],
        tables=tables,
        dictionaries=d["dictionaries"],
        enums=d["enums"],
        lineage=d["lineage"],
        metrics=d["metrics"],
    )


def latest_manifest(out_dir: str) -> Manifest | None:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return None
    files = sorted(f for f in os.listdir(d) if f.endswith(".json"))
    return load_manifest(os.path.join(d, files[-1])) if files else None


class StageTimer:
    """Context manager collecting per-stage wall time into a metrics dict."""

    def __init__(self, metrics: dict, key: str):
        self.metrics, self.key = metrics, key

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.metrics[self.key] = round(time.perf_counter() - self.t0, 3)
