"""Composite training-data preparation pipeline — the end-to-end flagship of
the training-data operator family: quality filter -> exact dedup -> MinHash-LSH
near-dedup, each stage the operator already certified by its own DuckDB oracle
(functions/textstats.py, functions/dedup.py). The composition itself is
oracle-checked too (td_prepare in __ray_entry__).

Scale shape: the quality filter and exact dedup are map + hash-partitioned
groupby (no all-pairs anywhere); the near-dup pair list is bounded by the
duplicate mass, so the keep-list subtraction is a small-side broadcast filter
(ray.put once, is_in per batch) — never a shuffle join.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.dedup import exact_dedup, minhash_lsh_pairs

#: quality gate defaults (mirrored verbatim in the SQL oracle)
MIN_TOKENS = 5
MAX_CHARS = 20_000


def quality_filter(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = MIN_TOKENS,
    max_chars: int = MAX_CHARS,
) -> ray.data.Dataset:
    """Keep documents passing the integer quality gates (same token/alpha
    definitions as functions.textstats.quality_score)."""

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        keep = df.filter(
            (pl.col(text_col).str.count_matches(r"[a-z0-9]+") >= min_tokens)
            & (pl.col(text_col).str.len_chars() <= max_chars)
            & (pl.col(text_col).str.count_matches(r"[A-Za-z]") >= 1)
        )
        return keep.to_arrow()

    return docs.map_batches(fn, batch_format="pyarrow")


def prepare_corpus(
    sf_dir: str,
    *,
    min_tokens: int = MIN_TOKENS,
    max_chars: int = MAX_CHARS,
) -> ray.data.Dataset:
    """documents.parquet -> surviving doc_ids after quality gate, exact dedup
    (keep min id per identical text) and MinHash-LSH near-dedup (drop the
    larger id of every candidate pair)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    kept = quality_filter(docs, min_tokens=min_tokens, max_chars=max_chars)
    deduped = exact_dedup(kept, ["text"], "doc_id")  # (text, doc_id=min)
    pairs = minhash_lsh_pairs(deduped, "doc_id", "text")
    # near-dup keep-list: pair count is duplicate-mass-bounded -> broadcast set
    drop = {r["b"] for r in pairs.take_all()}
    drop_arr = pa.array(sorted(drop), pa.int64())
    drop_ref = ray.put(drop_arr)

    def keep_fn(b: pa.Table, _ref=drop_ref) -> pa.Table:
        d = ray.get(_ref)
        mask = pc.invert(pc.is_in(b["doc_id"], value_set=d))
        return pa.table({"doc_id": b.filter(mask)["doc_id"]})

    return deduped.map_batches(keep_fn, batch_format="pyarrow")
