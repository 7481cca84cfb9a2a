"""File-list source — S1 parity (SURVEY.md §2.1).

The reference's input is a "to-load" TSV work list, one ``filename<TAB>graphIRI``
line per parse task (Loader.java:106-121, ParseIntoSOGTables.java:126-153); a
malformed line aborts the load (exit code 7). The Ray-Data analog reads ALL listed
Parquet files in ONE ``read_parquet`` call (each file is just blocks of the same
Dataset — no per-file task plumbing) and attaches each file's graph IRI as a
``graph`` column resolved from a broadcast path->graph lookup, never a shuffle.

Downstream, :class:`~r2s2_ray.extract.batch.TripleExtractor` applies the M1
graph-defaulting rule (ParseIntoSOGTables.java:354-357): a row whose ``graph`` is
null falls back to the engine-derived graph, mirroring "statement with null
context gets the file's graph; a statement with a context keeps it" with the
roles inverted for transcript inputs (the file-level graph is the explicit
context here).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


class MalformedFileListError(ValueError):
    """Parity with the reference's exit code 7 (Loader.java:71-84)."""


def parse_file_list(tsv_path: str) -> list[tuple[str, str | None]]:
    """``path<TAB>graphIRI`` lines -> [(path, graph|None)]. Blank lines skipped;
    a line with more than two fields is malformed (exit-7 analog). A line with
    no graph field yields graph=None (M1 defaulting applies downstream)."""
    out: list[tuple[str, str | None]] = []
    with open(tsv_path) as f:
        for ln, line in enumerate(f, start=1):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            parts = line.split("\t")
            if len(parts) > 2 or not parts[0].strip():
                raise MalformedFileListError(f"{tsv_path}:{ln}: malformed work-list line: {line!r}")
            path = parts[0].strip()
            graph = parts[1].strip() if len(parts) == 2 and parts[1].strip() else None
            out.append((path, graph))
    return out


def read_transcript_files(tsv_path: str) -> ray.data.Dataset:
    """Work-list TSV -> transcript Dataset with a per-file ``graph`` column.

    One ``read_parquet`` over every listed file (``include_paths=True`` carries
    the source file per row); the path->graph map is dictionary-sized and shipped
    inside the batch fn — no join, no shuffle.
    """
    entries = parse_file_list(tsv_path)
    if not entries:
        raise MalformedFileListError(f"{tsv_path}: empty work list")
    paths = [os.path.abspath(p) for p, _ in entries]
    path_arr = pa.array(paths, pa.string())
    graph_arr = pa.array([g for _, g in entries], pa.string())

    def attach_graph(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["path"], value_set=path_arr)
        g = pc.take(graph_arr, idx)
        return b.drop_columns(["path"]).append_column("graph", g)

    ds = ray.data.read_parquet(paths, include_paths=True)
    return ds.map_batches(attach_graph, batch_format="pyarrow")
