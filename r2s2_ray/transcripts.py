"""Deterministic transcript corpus (the engine's primary input, per BASELINE.json
``input_hint``): Parquet table (conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp).

Transcripts are derived 1:1 from the driver-provided ``documents`` table by a pure,
seeded-free, SQL-mirrorable rule (4 turns per document), so the DuckDB correctness
oracle can re-derive the identical corpus from the pre-registered ``documents`` view —
no external data, deterministic at every scale factor (TESTDATA.md).

The builder is a vectorized ``map_batches`` stage (zero-copy Arrow in/out) so transcript
construction itself streams: at 10^12-turn scale the "documents" input is simply the
upstream Parquet lake and this stage is an embarrassingly parallel 4x row expansion
with no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

#: base timestamp for turn ts synthesis (microseconds since epoch of 2024-01-01)
_BASE_US = 1_704_067_200_000_000

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _concat(*parts) -> pa.ChunkedArray:
    """Element-wise string concat of arrays/scalars."""
    return pc.binary_join_element_wise(*[_as_str(p) for p in parts], "")


def _as_str(p):
    if isinstance(p, (pa.Array, pa.ChunkedArray)):
        if not pa.types.is_string(p.type) and not pa.types.is_large_string(p.type):
            return pc.cast(p, pa.string())
        return p
    return pa.scalar(str(p))


def documents_to_transcripts(batch: pa.Table) -> pa.Table:
    """One document -> 4 turns. Mirrored exactly by :func:`transcripts_sql`."""
    n = batch.num_rows
    doc_id = batch["doc_id"]
    text = batch["text"]
    lang = batch["lang"]
    source = batch["source"]
    n_chars = batch["n_chars"]

    doc_id_str = pc.cast(doc_id, pa.string())
    conv_id = _concat("conv-", pc.utf8_lpad(doc_id_str, 8, "0"))
    url = _concat("https://ex.org/doc/", doc_id_str)

    t0 = _concat("Tell me about document ", doc_id_str, " from ", source, ".")
    t1 = _concat("[", lang, "] ", pc.utf8_slice_codeunits(text, 0, 240))
    t2 = _concat("result: lang=", lang, " chars=", pc.cast(n_chars, pa.string()), " url=", url)
    t3 = _concat(
        "Document ",
        doc_id_str,
        " is written in ",
        lang,
        " and has ",
        pc.cast(n_chars, pa.string()),
        " characters. See ",
        url,
        "#summary",
    )

    base_us = pc.add(
        pa.scalar(_BASE_US, pa.int64()),
        pc.multiply(pc.cast(doc_id, pa.int64()), pa.scalar(60_000_000, pa.int64())),
    )
    roles = ["user", "assistant", "tool", "assistant"]
    tools = [None, None, "search", None]
    texts = [t0, t1, t2, t3]

    out_conv, out_idx, out_role, out_text, out_tool, out_ts = [], [], [], [], [], []
    for i in range(4):
        out_conv.append(conv_id)
        out_idx.append(pa.array([i] * n, pa.int32()))
        out_role.append(pa.array([roles[i]] * n, pa.string()))
        out_text.append(texts[i])
        out_tool.append(pa.array([tools[i]] * n, pa.string()))
        ts_us = pc.add(base_us, pa.scalar(i * 1_000_000, pa.int64()))
        out_ts.append(pc.cast(ts_us, pa.timestamp("us")))

    def cat(chunks):
        return pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in chunks]
        )

    tbl = pa.table(
        {
            "conv_id": cat(out_conv),
            "turn_idx": cat(out_idx),
            "role": cat(out_role),
            "text": cat(out_text),
            "tool": cat(out_tool),
            "ts": cat(out_ts),
        }
    )
    # stable (conv_id, turn_idx) order within the block — the north-rule ordering
    # invariant is carried by the key columns, never by arrival order
    return tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _replicate_docs(r: int):
    """Deterministic corpus scaling for benchmarks: each document appears r times
    with disjoint doc_id ranges (offset 1e6 per replica), so conversations stay
    unique and every pipeline stage does r x the real work — used to make the
    two-parallelism scaling measurement compute-bound rather than
    fixed-overhead-bound."""

    def fn(b: pa.Table) -> pa.Table:
        outs = []
        for i in range(r):
            t = b
            if i:
                off = pc.add(t["doc_id"], pa.scalar(i * 1_000_000, pa.int64()))
                t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", off)
            outs.append(t)
        return pa.concat_tables(outs)

    return fn


def read_transcripts(
    sf_dir: str, *, columns: list[str] | None = None, replicate: int = 1
) -> ray.data.Dataset:
    """documents.parquet -> streaming transcript Dataset (no shuffle, no materialize)."""
    from .util import fan_out

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    # fan out BEFORE the 4x (x replicate) row expansion: repartition moves the
    # small raw documents, and every downstream stage gets full parallelism
    ds = fan_out(ds)
    if replicate > 1:
        ds = ds.map_batches(_replicate_docs(replicate), batch_format="pyarrow")
    ds = ds.map_batches(documents_to_transcripts, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds


#: DuckDB SQL deriving the identical transcript table from the `documents` view.
#: Every KG oracle query CTEs this fragment.
TRANSCRIPTS_SQL = """
SELECT * FROM (
  SELECT 'conv-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS conv_id,
         CAST(0 AS INTEGER) AS turn_idx, 'user' AS role,
         'Tell me about document ' || doc_id || ' from ' || source || '.' AS text,
         CAST(NULL AS VARCHAR) AS tool,
         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts
  FROM documents
  UNION ALL
  SELECT 'conv-' || lpad(CAST(doc_id AS VARCHAR), 8, '0'),
         CAST(1 AS INTEGER), 'assistant',
         '[' || lang || '] ' || substr(text, 1, 240),
         CAST(NULL AS VARCHAR),
         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE + INTERVAL 1 SECOND
  FROM documents
  UNION ALL
  SELECT 'conv-' || lpad(CAST(doc_id AS VARCHAR), 8, '0'),
         CAST(2 AS INTEGER), 'tool',
         'result: lang=' || lang || ' chars=' || n_chars || ' url=https://ex.org/doc/' || doc_id,
         'search',
         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE + INTERVAL 2 SECOND
  FROM documents
  UNION ALL
  SELECT 'conv-' || lpad(CAST(doc_id AS VARCHAR), 8, '0'),
         CAST(3 AS INTEGER), 'assistant',
         'Document ' || doc_id || ' is written in ' || lang || ' and has ' || n_chars
           || ' characters. See https://ex.org/doc/' || doc_id || '#summary',
         CAST(NULL AS VARCHAR),
         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE + INTERVAL 3 SECOND
  FROM documents
)
"""
