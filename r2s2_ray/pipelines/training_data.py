"""Composite training-data preparation pipeline — the end-to-end flagship of
the training-data operator family: quality filter -> exact dedup -> MinHash-LSH
near-dedup, each stage the operator already certified by its own DuckDB oracle
(functions/textstats.py, functions/dedup.py). The composition itself is
oracle-checked too (td_prepare in __ray_entry__).

Scale shape: the quality filter and exact dedup are map + hash-partitioned
groupby (no all-pairs anywhere). The near-dup keep-list subtraction is
size-guarded: when the candidate-pair count is driver-small the drop set is a
broadcast filter (ray.put once, is_in per batch); past the guard it becomes a
DISTRIBUTED bucketed anti-join (union doc ids + drop ids, hash-bucket by id,
per-block set subtraction) — at web scale 30-50% of a corpus can be near-dup,
so the pair list is NOT driver-sized even though it is duplicate-mass-bounded.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.dedup import exact_dedup, minhash_lsh_pairs

#: quality gate defaults (mirrored verbatim in the SQL oracle)
MIN_TOKENS = 5
MAX_CHARS = 20_000

#: pair counts up to this take the broadcast path (one Arrow array shipped via
#: ray.put); beyond it the anti-join runs distributed. ~2M int64 pairs = 16 MB
#: broadcast — comfortably below worker-heap concerns.
NEAR_DUP_BROADCAST_MAX = 2_000_000


def _anti_join_ids(
    deduped: ray.data.Dataset, pairs: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """doc_ids of ``deduped`` minus ``pairs.b`` — bucketed anti-join, no
    driver-side pair materialization. Same sort-by-bucket + whole-block-map
    pattern as the fold/merge exchanges (hash bucketing spreads any hot id)."""

    def tag(src: int, col: str):
        def fn(b: pa.Table) -> pa.Table:
            ids = pc.cast(b[col], pa.int64())
            return pa.table(
                {"id": ids, "src": pa.array(np.full(len(ids), src, np.int8))}
            )

        return fn

    u = deduped.map_batches(tag(0, "doc_id"), batch_format="pyarrow").union(
        pairs.map_batches(tag(1, "b"), batch_format="pyarrow")
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return b.append_column(
            "bucket",
            df.select(pl.col("id").hash(seed=11).mod(num_buckets).cast(pl.Int32).alias("x"))[
                "x"
            ].to_arrow(),
        )

    def subtract(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        keep = (
            df.group_by("id")
            .agg(
                (pl.col("src") == 0).any().alias("present"),
                (pl.col("src") == 1).any().alias("dropped"),
            )
            .filter(pl.col("present") & ~pl.col("dropped"))
            .select(pl.col("id").alias("doc_id"))
        )
        return keep.to_arrow()

    return (
        u.map_batches(add_bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(subtract, batch_format="pyarrow", batch_size=None)
    )


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
    broadcast_max: int = NEAR_DUP_BROADCAST_MAX,
) -> ray.data.Dataset:
    """documents.parquet -> surviving doc_ids after quality gate, exact dedup
    (keep min id per identical text) and MinHash-LSH near-dedup (drop the
    larger id of every candidate pair)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    kept = quality_filter(docs, min_tokens=min_tokens, max_chars=max_chars)
    deduped = exact_dedup(kept, ["text"], "doc_id")  # (text, doc_id=min)
    # materialized so the size probe and the consuming path share one execution
    # (pair-scale data sits in the distributed object store, never the driver)
    pairs = minhash_lsh_pairs(deduped, "doc_id", "text").materialize()
    if pairs.count() > broadcast_max:
        # web-scale duplicate mass: distributed anti-join, no driver traffic
        return _anti_join_ids(deduped, pairs)
    # small pair list: one broadcast drop set, filtered per batch
    drop = {r["b"] for r in pairs.take_all()}
    drop_arr = pa.array(sorted(drop), pa.int64())
    drop_ref = ray.put(drop_arr)

    def keep_fn(b: pa.Table, _ref=drop_ref) -> pa.Table:
        d = ray.get(_ref)
        mask = pc.invert(pc.is_in(b["doc_id"], value_set=d))
        return pa.table({"doc_id": b.filter(mask)["doc_id"]})

    return deduped.map_batches(keep_fn, batch_format="pyarrow")


def render_dialogs(
    transcripts: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Render each conversation to ONE training document (the chat-template
    step every instruction-tuning pipeline runs before packing): turns joined
    in ``turn_idx`` order as ``role: text`` lines. Output one row per
    conversation — ``(conv_id, rendered, n_turns, n_chars)``.

    A conversation's turns can span input files at corpus scale, so the
    stitch co-locates them with one conv-bucketed sort (the q_user_cumsum
    ordered-log shape), then a whole-block polars group-join; per-turn text
    equality and stable turn ordering (the BASELINE per-row invariant) are
    preserved verbatim inside the rendered string."""

    def bucket(b: pa.Table) -> pa.Table:
        from ..functions.hashing import poly_hash_arr

        cid = b["conv_id"]
        cid = cid.combine_chunks() if isinstance(cid, pa.ChunkedArray) else cid
        h = poly_hash_arr(cid) % np.uint64(num_buckets)
        return b.append_column("bucket", pa.array(h.astype(np.int64)))

    def stitch(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["conv_id", "turn_idx"])
        out = df.group_by("conv_id", maintain_order=False).agg(
            (pl.col("role") + pl.lit(": ") + pl.col("text"))
            .str.join("\n")
            .alias("rendered"),
            pl.len().cast(pl.Int64).alias("n_turns"),
        )
        return out.with_columns(
            pl.col("rendered").str.len_chars().cast(pl.Int64).alias("n_chars")
        ).to_arrow()

    return (
        transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
        .map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(stitch, batch_format="pyarrow", batch_size=None)
    )


def loss_masks(
    transcripts: ray.data.Dataset, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Per-turn LOSS-MASK spans for instruction tuning over the rendered
    dialog (see :func:`render_dialogs`): each turn's ``role: text`` line
    occupies tokens ``[start_tok, end_tok)`` of the whitespace-tokenized
    rendered document, and only assistant turns train (``trainable = 1``) —
    the masking step that turns rendered conversations into supervised
    examples.

    Same one-exchange shape as render_dialogs: a conv-bucketed sort
    co-locates each conversation's turns; the block pass computes per-line
    token counts and their per-conv running offsets vectorized."""

    def bucket(b: pa.Table) -> pa.Table:
        from ..functions.hashing import poly_hash_arr

        cid = b["conv_id"]
        cid = cid.combine_chunks() if isinstance(cid, pa.ChunkedArray) else cid
        h = poly_hash_arr(cid) % np.uint64(num_buckets)
        return b.append_column("bucket", pa.array(h.astype(np.int64)))

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["conv_id", "turn_idx"])
        df = df.with_columns(
            (pl.col("role") + pl.lit(": ") + pl.col("text"))
            .str.split(" ")
            .list.len()
            .cast(pl.Int64)
            .alias("n_tok")
        )
        df = df.with_columns(
            (pl.col("n_tok").cum_sum().over("conv_id") - pl.col("n_tok")).alias(
                "start_tok"
            )
        )
        out = df.select(
            pl.col("conv_id"),
            pl.col("turn_idx"),
            pl.col("start_tok"),
            (pl.col("start_tok") + pl.col("n_tok")).alias("end_tok"),
            (pl.col("role") == "assistant").cast(pl.Int64).alias("trainable"),
        )
        return out.to_arrow()

    return (
        transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
        .map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def conv_stats(transcripts: ray.data.Dataset, *, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-conversation profile — n_turns, distinct roles, total chars,
    tool-call count, wall-clock span in seconds — the first table every
    transcript-corpus audit builds. One conv-bucketed sort + whole-block
    grouped aggregation (turns can span input files; the bucket co-locates
    them), metadata-free and exchange-minimal like render_dialogs."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    def bucket(b: pa.Table) -> pa.Table:
        from ..functions.hashing import poly_hash_arr

        cid = b["conv_id"]
        cid = cid.combine_chunks() if isinstance(cid, pa.ChunkedArray) else cid
        h = poly_hash_arr(cid) % np.uint64(num_buckets)
        return b.append_column("bucket", pa.array(h.astype(np.int64)))

    def prof(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.drop_columns(["bucket"]))
        out = df.group_by("conv_id").agg(
            pl.len().cast(pl.Int64).alias("n_turns"),
            pl.col("role").n_unique().cast(pl.Int64).alias("n_roles"),
            pl.col("text").str.len_chars().sum().cast(pl.Int64).alias("n_chars"),
            pl.col("tool").is_not_null().sum().cast(pl.Int64).alias("n_tool_calls"),
            (
                (pl.col("ts").max() - pl.col("ts").min()).dt.total_seconds()
            ).cast(pl.Int64).alias("span_s"),
        )
        return out.to_arrow()

    return (
        transcripts.map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(prof, batch_format="pyarrow", batch_size=None)
    )


def role_transitions(transcripts: ray.data.Dataset, *, num_buckets: int = 32) -> ray.data.Dataset:
    """Role-transition counts (role_i -> role_{i+1} within a conversation,
    turn_idx order): the dialog-structure census behind turn-taking QA
    (assistant-after-assistant, orphaned tool turns). Conv-bucketed sort +
    vectorized shift-within-conv, then a tiny (role, role) groupby —
    transition rows per block are |roles|² bounded, not turn-sized."""
    import numpy as np
    import polars as pl
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def bucket(b: pa.Table) -> pa.Table:
        from ..functions.hashing import poly_hash_arr

        cid = b["conv_id"]
        cid = cid.combine_chunks() if isinstance(cid, pa.ChunkedArray) else cid
        h = poly_hash_arr(cid) % np.uint64(num_buckets)
        return b.append_column("bucket", pa.array(h.astype(np.int64)))

    def trans(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["conv_id", "turn_idx", "role"])).sort(
            ["conv_id", "turn_idx"]
        )
        out = (
            df.with_columns(pl.col("role").shift(-1).over("conv_id").alias("next_role"))
            .drop_nulls("next_role")
            .group_by(["role", "next_role"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        return out.to_arrow()

    return (
        transcripts.map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(trans, batch_format="pyarrow", batch_size=None)
        .groupby(["role", "next_role"])
        .aggregate(Sum("n", alias_name="n"))
    )


def turn_dedup(transcripts: ray.data.Dataset, *, num_buckets: int = 32) -> ray.data.Dataset:
    """Turn-LEVEL exact dedup across conversations (templated assistant
    replies, canned tool outputs): one survivor per distinct turn text —
    keep-first under (conv_id, turn_idx) order — plus its duplicate count.
    Text-bucketed sort co-locates equal texts; per-block grouped first+count
    is exact because buckets are key-complete. The survivor set feeds
    loss-mask zeroing of duplicated turns (train on a canned reply once)."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    def bucket(b: pa.Table) -> pa.Table:
        from ..functions.hashing import poly_hash_arr

        txt = b["text"]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt
        h = poly_hash_arr(txt) % np.uint64(num_buckets)
        return b.append_column("bucket", pa.array(h.astype(np.int64)))

    def first(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["conv_id", "turn_idx", "text"])).sort(
            ["text", "conv_id", "turn_idx"]
        )
        out = df.group_by("text", maintain_order=True).agg(
            pl.col("conv_id").first(),
            pl.col("turn_idx").first(),
            pl.len().cast(pl.Int64).alias("n_dups"),
        )
        return out.select(["conv_id", "turn_idx", "n_dups"]).to_arrow()

    return (
        transcripts.map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(first, batch_format="pyarrow", batch_size=None)
    )
