"""Text-analysis operators: token counting, quality scoring, language-ID heuristic,
document fingerprinting. All vectorized per batch (pyarrow/polars/numpy); the
language profiles are actor-pool state (loaded once per actor)."""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

#: tiny per-language stopword profiles for the n-gram/stopword langid heuristic
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "un", "une"},
    "es": {"el", "la", "los", "y", "es", "un", "una"},
    "zh": set(),  # zh detected by CJK-codepoint ratio instead
}


def token_stats(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    """(id, n_tokens, n_distinct_tokens, max_token_len) — whitespace+alnum tokens.

    Token-less documents are KEPT (n_tokens=0, max_token_len=null), matching the
    SQL oracle's one-row-per-document contract: the aggregated stats are
    left-joined back onto the batch's id column so explode+group_by cannot drop
    rows."""

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.extract_all(r"[a-z0-9]+").alias("tok")
            )
            .explode("tok")
            .drop_nulls("tok")
        )
        agg = toks.group_by(id_col).agg(
            pl.len().cast(pl.Int64).alias("n_tokens"),
            pl.col("tok").n_unique().cast(pl.Int64).alias("n_distinct_tokens"),
            pl.col("tok").str.len_chars().max().cast(pl.Int64).alias("max_token_len"),
        )
        out = (
            df.select(pl.col(id_col))
            .join(agg, on=id_col, how="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("n_distinct_tokens").fill_null(0),
            )
        )
        return out.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    """Integer quality signals (SQL-mirrorable): (id, n_chars, n_tokens, n_alpha,
    n_spaces). Ratios are left to the consumer to avoid float-hash instability."""

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        stats = df.select(
            pl.col(id_col),
            pl.col(text_col).str.len_chars().cast(pl.Int64).alias("n_chars"),
            pl.col(text_col).str.count_matches(r"[a-z0-9]+").cast(pl.Int64).alias("n_tokens"),
            pl.col(text_col).str.count_matches(r"[A-Za-z]").cast(pl.Int64).alias("n_alpha"),
            pl.col(text_col).str.count_matches(r" ").cast(pl.Int64).alias("n_spaces"),
        )
        return stats.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Actor-pool language-ID: stopword-profile voting + CJK codepoint ratio.
    Profiles built once per actor (stateful-stage pattern)."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col
        self.profiles = {k: pa.array(sorted(v), pa.string()) for k, v in LANG_PROFILES.items() if v}

    def __call__(self, b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([self.id_col, self.text_col]))
        toks = (
            df.with_columns(pl.col(self.text_col).str.to_lowercase().str.extract_all(r"\w+").alias("tok"))
            .explode("tok")
            .drop_nulls("tok")
        )
        scores = toks.group_by(self.id_col).agg(
            *[
                pl.col("tok").is_in(sorted(LANG_PROFILES[lang])).sum().cast(pl.Int64).alias(lang)
                for lang in LANG_PROFILES
                if LANG_PROFILES[lang]
            ]
        )
        cjk = df.select(
            pl.col(self.id_col),
            (pl.col(self.text_col).str.count_matches(r"[一-鿿]") * 4).cast(pl.Int64).alias("zh"),
        )
        joined = scores.join(cjk, on=self.id_col, how="full", coalesce=True).fill_null(0)
        langs = [c for c in joined.columns if c != self.id_col]
        arr = joined.select(langs).to_numpy()
        best = np.asarray(langs)[arr.argmax(axis=1)]
        best = np.where(arr.max(axis=1) == 0, "unknown", best)
        return pa.table(
            {
                self.id_col: joined[self.id_col].to_arrow(),
                "lang_pred": pa.array(best.tolist(), pa.string()),
            }
        )


def lang_id(ds: ray.data.Dataset, id_col: str, text_col: str, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        LangId, fn_constructor_args=(id_col, text_col), batch_format="pyarrow", concurrency=concurrency
    )


def sequence_pack(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    budget: int = 256,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Sequence packing for LLM training: lay documents end-to-end in id
    order and assign each to the fixed-token-budget pack where it STARTS —
    (id, n_tokens, pack_id, pack_offset), where pack_id = prefix // budget
    and pack_offset = prefix % budget over the global running token count.

    The global prefix sum is distributed the same way the term dictionary
    assigns ids (stages/dicts.py metadata prefix-sums): pass 1 aggregates one
    token-count sum per id-range bucket (num_buckets values to the driver —
    metadata scale, never row scale), the driver folds them into bucket
    offsets, pass 2 re-buckets, sorts on the bucket key alone and computes
    each block's within-bucket cumulative sum plus its bucket offset. Ids
    must be non-negative and unique; bucket ranges derive from max(id)+1 so
    the decomposition is cluster-width-independent."""
    import polars as pl
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        out = df.select(
            pl.col(id_col),
            pl.col(text_col).str.split(" ").list.len().cast(pl.Int64).alias("n_tokens"),
        )
        return out.to_arrow()

    # materialize the tiny (id, n_tokens) projection ONCE: three consumers
    # follow (max, per-bucket sums, the bucketed sort) and each would
    # otherwise re-read and re-tokenize the full corpus
    with_counts = ds.map_batches(counts, batch_format="pyarrow").materialize()
    n_ids = int(with_counts.max(id_col)) + 1
    span = -(-n_ids // num_buckets)

    def bucket(b: pa.Table) -> pa.Table:
        bk = pc.cast(pc.divide(b[id_col], span), pa.int32())
        return b.append_column("bucket", bk)

    bucketed = with_counts.map_batches(bucket, batch_format="pyarrow")
    # pass 1: one Int64 per bucket to the driver, folded into exclusive offsets
    sums = {r["bucket"]: r["sum(n_tokens)"] for r in bucketed.groupby("bucket").aggregate(Sum("n_tokens")).take_all()}
    offsets: dict[int, int] = {}
    acc = 0
    for bk in range(num_buckets):
        offsets[bk] = acc
        acc += int(sums.get(bk, 0))

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["bucket", id_col])
        off = pl.col("bucket").replace_strict(
            list(offsets.keys()), list(offsets.values()), return_dtype=pl.Int64
        )
        prefix = pl.col("n_tokens").cum_sum().over("bucket") - pl.col("n_tokens") + off
        out = df.select(
            pl.col(id_col),
            pl.col("n_tokens"),
            (prefix // budget).cast(pl.Int64).alias("pack_id"),
            (prefix % budget).cast(pl.Int64).alias("pack_offset"),
        )
        return out.to_arrow()

    return bucketed.sort("bucket").map_batches(block, batch_format="pyarrow", batch_size=None)


def stratified_split(
    ds: ray.data.Dataset, id_col: str, text_col: str, *, test_pct: int = 5, val_pct: int = 5
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment by CONTENT hash (not row id):
    bucket = unsigned 64-bit polynomial fingerprint mod 100; test = buckets
    [0, test_pct), val = [test_pct, test_pct+val_pct), train = the rest.
    Content-based splitting keeps a document in the same split across
    re-shards / re-ingests and sends exact duplicates to the same split
    (no train/test leakage from dup pairs). Embarrassingly parallel — no
    shuffle; SQL-mirrorable via the poly-hash oracle family."""
    from .hashing import poly_hash_arr

    def fn(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        bucket = poly_hash_arr(col) % np.uint64(100)
        split = np.where(
            bucket < test_pct, "test", np.where(bucket < test_pct + val_pct, "val", "train")
        )
        return pa.table(
            {
                id_col: b[id_col],
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


#: PII redaction patterns (RE2 — identical semantics in pyarrow and DuckDB).
#: Order matters: email first (contains no '+'), then IPv4 (dotted digits),
#: then international phone (leading '+') — the three never overlap.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+\d{7,15}", "<PHONE>"),
]


def pii_scrub(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    """Redact emails / IPv4s / international phone numbers from a text column:
    (id, clean_text, n_emails, n_ips, n_phones). Counts are taken on the
    ORIGINAL text, then the patterns are replaced in order. Fully vectorized
    (pyarrow RE2 kernels, no per-row Python); SQL-mirrorable because DuckDB's
    regexp functions are RE2 too (see oracles_td.pii_scrub_oracle)."""

    def fn(b: pa.Table) -> pa.Table:
        text = b[text_col]
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        cols: dict = {id_col: b[id_col]}
        clean = text
        for name, pat, token in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            clean = pc.replace_substring_regex(clean, pat, token)
        cols["clean_text"] = clean
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def token_chunks(
    ds: ray.data.Dataset, id_col: str, text_col: str, *, chunk_size: int = 32
) -> ray.data.Dataset:
    """Fixed-size token-window chunking for LLM training-data prep: split each
    document on single spaces and emit one row per ``chunk_size``-token window
    — (id, chunk_idx, n_tokens, chunk_text). Row expansion is per-document
    (explode + cum-count + group_by inside one polars pass), so it is safe in
    ``map_batches`` regardless of batch boundaries; the last chunk of a
    document may be short."""

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        ex = (
            df.with_columns(pl.col(text_col).str.split(" ").alias("tok"))
            .drop(text_col)
            .explode("tok")
            .with_columns(
                ((pl.col("tok").cum_count().over(id_col) - 1) // chunk_size)
                .cast(pl.Int32)
                .alias("chunk_idx")
            )
        )
        out = ex.group_by([id_col, "chunk_idx"], maintain_order=True).agg(
            pl.len().cast(pl.Int64).alias("n_tokens"),
            pl.col("tok").str.join(" ").alias("chunk_text"),
        )
        return out.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


def fingerprint(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    """64-bit polynomial rolling-hash document fingerprint (content-identity key
    for incremental dedup): fp = sum(byte_i * P^i) mod 2^64. Fully vectorized
    across the batch (one pass over the concatenated byte buffer — see
    functions/hashing.py) and SQL-expressible: the DuckDB oracle computes the
    same value as a Horner ``list_reduce`` over the reversed byte list."""
    from .hashing import poly_hash_arr

    def fn(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        out = poly_hash_arr(col)
        return pa.table(
            {id_col: b[id_col], "fingerprint": pa.array(out.astype(np.int64), pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_signals(ds: ray.data.Dataset, id_col: str, text_col: str) -> ray.data.Dataset:
    """Gopher-style repetition quality signals, one row per document, all
    integer counts (fraction thresholds are the consumer's policy):

    - ``n_lines`` / ``n_dup_lines``: non-empty ``\\n``-split lines and how many
      of them are repeats of an earlier line (n_lines - distinct lines)
    - ``n_words`` / ``n_dup_words``: lowercase space-split tokens and repeats
    - ``n_bigrams`` / ``top_bigram_n``: adjacent-word-pair instances and the
      count of the most frequent pair (high top share = templated/spammy text)

    Fully batch-local (each document is one row): explode + group_by inside
    one polars frame, left-joined back onto the batch's id column so empty
    documents keep a row of zeros. Mirrors the duplicate-line / top-n-gram
    fraction rules of Rae et al. 2021 (Gopher) §A1.1 as integer counts."""

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        base = df.select(id_col)
        ln = (
            df.with_columns(pl.col(text_col).str.split("\n").alias("ln"))
            .explode("ln")
            .filter(pl.col("ln").str.len_chars() > 0)
            .group_by(id_col)
            .agg(
                n_lines=pl.len().cast(pl.Int64),
                n_dup_lines=(pl.len() - pl.col("ln").n_unique()).cast(pl.Int64),
            )
        )
        tok = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.split(" ").alias("tok")
            )
            .explode("tok")
            .filter(pl.col("tok").str.len_chars() > 0)
            .select([id_col, "tok"])
        )
        wd = tok.group_by(id_col).agg(
            n_words=pl.len().cast(pl.Int64),
            n_dup_words=(pl.len() - pl.col("tok").n_unique()).cast(pl.Int64),
        )
        bg = (
            tok.with_columns(pl.col("tok").shift(-1).over(id_col).alias("nxt"))
            .drop_nulls("nxt")
            .with_columns(
                pl.concat_str([pl.col("tok"), pl.col("nxt")], separator=" ").alias("bg")
            )
            .group_by([id_col, "bg"])
            .len()
            .group_by(id_col)
            .agg(
                n_bigrams=pl.col("len").sum().cast(pl.Int64),
                top_bigram_n=pl.col("len").max().cast(pl.Int64),
            )
        )
        out = (
            base.join(ln, on=id_col, how="left")
            .join(wd, on=id_col, how="left")
            .join(bg, on=id_col, how="left")
            .fill_null(0)
        )
        return out.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


def training_shuffle(
    ds: ray.data.Dataset, id_col: str, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Deterministic global training-order shuffle: every row gets a dense
    ``shuffle_rank`` (0..n-1) equal to its position under the keyed order
    (affine64(id), id) — a reproducible permutation with no RNG state, so a
    resumed run and the SQL oracle produce bit-identical order. This is the
    "global shuffle for training order" step of a data pipeline expressed as
    a rank assignment: downstream writers emit shards in rank order.

    Distribution mirrors sequence_pack: the hash's TOP BITS are the bucket
    key (bucket order == hash order), pass 1 moves one row count per bucket
    to the driver, pass 2 sorts on the bucket alone and ranks each block
    locally plus its bucket offset. Scale-safe: driver traffic is
    num_buckets integers."""
    from .hashing import K_A, K_B

    shift = np.uint64(64 - max(1, (num_buckets - 1).bit_length()))
    n_buckets = 1 << (64 - int(shift))  # next power of two >= num_buckets

    def hashed(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            b[id_col].combine_chunks().to_numpy(zero_copy_only=False), dtype=np.int64
        ).astype(np.uint64)
        h = ids * np.uint64(K_A) + np.uint64(K_B)
        return pa.table(
            {
                id_col: b[id_col],
                "h": pa.array(h, pa.uint64()),
                "bucket": pa.array((h >> shift).astype(np.int32), pa.int32()),
            }
        )

    hashed_ds = ds.select_columns([id_col]).map_batches(
        hashed, batch_format="pyarrow"
    ).materialize()
    if hashed_ds.count() == 0:
        # keep the documented (id, shuffle_rank) schema even for an empty input
        def empty(b: pa.Table) -> pa.Table:
            return pa.table(
                {id_col: b[id_col], "shuffle_rank": pa.nulls(0, pa.int64())}
            )

        return hashed_ds.select_columns([id_col]).map_batches(
            empty, batch_format="pyarrow"
        )

    from ray.data.aggregate import Count

    counts = {
        r["bucket"]: r["n"]
        for r in hashed_ds.groupby("bucket").aggregate(Count(alias_name="n")).take_all()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for bk in range(n_buckets):
        offsets[bk] = acc
        acc += int(counts.get(bk, 0))

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["bucket", "h", id_col])
        off = pl.col("bucket").replace_strict(
            list(offsets.keys()), list(offsets.values()), return_dtype=pl.Int64
        )
        rank = pl.col("bucket").cum_count().over("bucket") - 1 + off
        return df.select(
            pl.col(id_col), rank.cast(pl.Int64).alias("shuffle_rank")
        ).to_arrow()

    return hashed_ds.sort("bucket").map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def source_mix(ds: ray.data.Dataset, *, source_col: str = "source") -> ray.data.Dataset:
    """Corpus-mix report per source: document count, total characters,
    distinct languages, and exact-duplicate mass (docs minus distinct texts)
    — the per-provenance numbers a data-mixing decision needs. Per-block
    polars partials (count/chars sum + distinct text hashes capped at block
    scope would undercount, so texts ride the exchange as first-class
    distinct rows) then one grouped fold per source."""

    def rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.select(
            pl.col(source_col),
            pl.col("lang"),
            pl.col("text"),
            pl.col("text").str.len_chars().cast(pl.Int64).alias("n_chars"),
        ).to_arrow()

    base = ds.select_columns([source_col, "lang", "text"]).map_batches(
        rows, batch_format="pyarrow"
    )

    def fold(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = df.group_by(source_col).agg(
            n_docs=pl.len().cast(pl.Int64),
            n_chars=pl.col("n_chars").sum().cast(pl.Int64),
            n_langs=pl.col("lang").n_unique().cast(pl.Int64),
            n_dup_docs=(pl.len() - pl.col("text").n_unique()).cast(pl.Int64),
        )
        return out.to_arrow()

    # sources are low-cardinality: one sort co-locates each source's rows,
    # the block fold computes exact distincts (no approximate sketches)
    return base.sort(source_col).map_batches(fold, batch_format="pyarrow", batch_size=None)


def budget_sample(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    budget: int = 10_000,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Token-budget corpus selection: walk documents in the deterministic
    shuffle order (affine64(id), id — same permutation as training_shuffle)
    and keep each document whose INCLUSIVE running token count still fits
    ``budget`` — the standard "sample N tokens for this mixture slot" step,
    reproducible with no RNG. Emits (id, n_tokens, keep) for every document.

    Same metadata-scale machinery as sequence_pack, but bucketed on the
    HASH top bits so bucket order == shuffle order: pass 1 moves one token
    sum per bucket to the driver, pass 2 ranks blocks locally plus their
    bucket offset."""
    from .hashing import K_A, K_B

    shift = np.uint64(64 - max(1, (num_buckets - 1).bit_length()))
    n_buckets = 1 << (64 - int(shift))
    from ray.data.aggregate import Sum

    def prep(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        out = df.select(
            pl.col(id_col),
            pl.col(text_col).str.split(" ").list.len().cast(pl.Int64).alias("n_tokens"),
        )
        t = out.to_arrow()
        ids = np.asarray(
            t[id_col].combine_chunks().to_numpy(zero_copy_only=False), dtype=np.int64
        ).astype(np.uint64)
        h = ids * np.uint64(K_A) + np.uint64(K_B)
        return t.append_column("h", pa.array(h, pa.uint64())).append_column(
            "bucket", pa.array((h >> shift).astype(np.int32), pa.int32())
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    sums = {
        r["bucket"]: r["sum(n_tokens)"]
        for r in prepped.groupby("bucket").aggregate(Sum("n_tokens")).take_all()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for bk in range(n_buckets):
        offsets[bk] = acc
        acc += int(sums.get(bk, 0))

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["bucket", "h", id_col])
        off = pl.col("bucket").replace_strict(
            list(offsets.keys()), list(offsets.values()), return_dtype=pl.Int64
        )
        incl = pl.col("n_tokens").cum_sum().over("bucket") + off
        return df.select(
            pl.col(id_col),
            pl.col("n_tokens"),
            (incl <= budget).cast(pl.Int64).alias("keep"),
        ).to_arrow()

    return prepped.sort("bucket").map_batches(block, batch_format="pyarrow", batch_size=None)


#: vocabulary size under which rare_terms broadcasts the df table
RARE_TERMS_BROADCAST_MAX = 5_000_000


def rare_terms(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    broadcast_max: int = RARE_TERMS_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Per-document rarest terms — the integer core of an IDF signal: for
    every document, its ``k`` lowest-document-frequency tokens (ties by
    token), each with its corpus df. Rank 0 = rarest. Integer/string only —
    no float idf, so the SQL oracle is exact.

    Stage shape: distinct (doc, token) explode -> distributed df groupby ->
    df attached to every token row (broadcast map under ``broadcast_max``,
    generic hash_join beyond it — web-scale vocabularies don't broadcast) ->
    per-doc top-k via one sort + block-local fold."""

    def tok_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        out = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.split(" ").alias("tok")
            )
            .explode("tok")
            .filter(pl.col("tok").str.len_chars() > 0)
            .select([id_col, "tok"])
            .unique()
        )
        return out.to_arrow()

    toks = ds.map_batches(tok_rows, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Count

    dfreq = toks.groupby("tok").aggregate(Count(alias_name="df")).materialize()
    if dfreq.count() <= broadcast_max:
        rows = dfreq.take_all()
        keys = pa.array([r["tok"] for r in rows], pa.large_string())
        vals = pa.array([int(r["df"]) for r in rows], pa.int64())
        ref = ray.put((keys, vals))

        def attach(b: pa.Table, _ref=ref) -> pa.Table:
            ks, vs = ray.get(_ref)
            idx = pc.index_in(pc.cast(b["tok"], pa.large_string()), value_set=ks)
            return b.append_column("df", pc.take(vs, idx))

        joined = toks.map_batches(attach, batch_format="pyarrow")
    else:
        from ..relational import hash_join

        joined = hash_join(toks, dfreq, on="tok", right_cols=["df"], how="inner")

    def topk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, "tok", "df"]))
        out = (
            df.sort([id_col, "df", "tok"])
            .with_columns(rank=pl.col("tok").cum_count().over(id_col) - 1)
            .filter(pl.col("rank") < k)
            .select(
                pl.col(id_col),
                pl.col("rank").cast(pl.Int64),
                pl.col("tok"),
                pl.col("df").cast(pl.Int64),
            )
        )
        return out.to_arrow()

    return joined.sort(id_col).map_batches(topk, batch_format="pyarrow", batch_size=None)


#: broadcast the unigram table only below this vocabulary size — web-scale
#: vocabularies take the distributed hash_join path instead
LM_VOCAB_BROADCAST_MAX = 5_000_000


def lm_surprisal(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    broadcast_max: int = LM_VOCAB_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Per-document surprisal under a unigram language model estimated from
    the corpus itself — the CCNet/Gopher-style "how unusual is this document"
    quality signal, self-contained (no external LM).

    Returns (id, n_tokens, surprisal_bits, xent_nats) for every document with
    at least one ``[a-z0-9]+`` token (the ``token_stats`` convention):

    - ``surprisal_bits`` = sum over tokens (with multiplicity) of
      ``floor(log2(N)) - floor(log2(c_t))`` where ``c_t`` is the token's
      corpus term frequency and ``N`` the corpus token total. Whole-bit
      quantization keeps the column INTEGER-EXACT — ``floor(log2(x))`` of an
      int is its bit length minus one on both engines (numpy ``frexp`` here,
      ``length(bin(x)) - 1`` in the SQL oracle) — so the oracle comparison is
      bit-exact with no float-rounding hazard.
    - ``xent_nats`` = mean token negative log-likelihood
      ``sum(ln(N) - ln(c_t)) / n_tokens`` — the conventional float
      cross-entropy, pinned by pytest against an exact reference rather than
      the 1e-9-rounded oracle hash.

    Stage shape (one token-explode pass feeds both the model estimate and the
    scoring): explode (doc, token) with multiplicity -> term-frequency
    groupby (the vocabulary exchange) -> counts attached back to every token
    row (broadcast map under ``broadcast_max``, distributed hash_join beyond
    — a web-scale vocabulary never lands on the driver) -> per-doc fold via
    sort + block-local group_by (equal keys never split across sort output
    blocks; avoids the Aggregate operator's empty-input hang)."""

    def tok_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        out = (
            df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+")
                .alias("tok")
            )
            .explode("tok")
            .drop_nulls("tok")
            .select([id_col, "tok"])
        )
        return out.to_arrow()

    toks = ds.map_batches(tok_rows, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Count

    counts = toks.groupby("tok").aggregate(Count(alias_name="c")).materialize()
    # the corpus token total: one int per count block to the driver
    total = sum(
        int(pc.sum(b["c"]).as_py() or 0)
        for b in counts.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if total == 0:
        id_type = pa.large_string()
        for f in ds.schema().base_schema:
            if f.name == id_col:
                id_type = f.type
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], id_type),
                    "n_tokens": pa.array([], pa.int64()),
                    "surprisal_bits": pa.array([], pa.int64()),
                    "xent_nats": pa.array([], pa.float64()),
                }
            )
        )
    total_bits = int(total).bit_length() - 1
    ln_total = float(np.log(float(total)))

    if counts.count() <= broadcast_max:
        rows = counts.take_all()
        keys = pa.array([r["tok"] for r in rows], pa.large_string())
        vals = pa.array([int(r["c"]) for r in rows], pa.int64())
        ref = ray.put((keys, vals))

        def attach(b: pa.Table, _ref=ref) -> pa.Table:
            ks, vs = ray.get(_ref)
            idx = pc.index_in(pc.cast(b["tok"], pa.large_string()), value_set=ks)
            return b.append_column("c", pc.take(vs, idx))

        joined = toks.map_batches(attach, batch_format="pyarrow")
    else:
        from ..relational import hash_join

        joined = hash_join(toks, counts, on="tok", right_cols=["c"], how="inner")

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "n_tokens": pa.array([], pa.int64()),
                    "surprisal_bits": pa.array([], pa.int64()),
                    "xent_nats": pa.array([], pa.float64()),
                }
            )
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        # floor(log2(c)) == frexp exponent - 1, exact for counts < 2**53
        bits = (total_bits - (np.frexp(c.astype(np.float64))[1] - 1)).astype(np.int64)
        nats = ln_total - np.log(c.astype(np.float64))
        df = pl.from_arrow(b.select([id_col])).with_columns(
            bits=pl.Series(bits), nats=pl.Series(nats)
        )
        out = (
            df.group_by(id_col, maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_tokens"),
                pl.col("bits").sum().cast(pl.Int64).alias("surprisal_bits"),
                pl.col("nats").sum().alias("xent_sum"),
            )
            .with_columns(
                (pl.col("xent_sum") / pl.col("n_tokens")).alias("xent_nats")
            )
            .drop("xent_sum")
        )
        return out.to_arrow()

    return joined.sort(id_col).map_batches(
        score, batch_format="pyarrow", batch_size=None
    )


def dsir_weights(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    num_buckets: int = 1024,
) -> ray.data.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by how
    much its hashed n-gram feature distribution looks like a TARGET subset of
    the corpus versus the corpus as a whole — the signal used to resample raw
    web data toward a high-quality target domain.

    Integer-exact contract (bit-exact vs the SQL oracle):

    * features: lowercase ``[a-z0-9]+`` unigrams plus space-joined bigrams,
      hashed with the SQL-expressible polynomial hash into ``num_buckets``
      buckets (``poly_hash(f) mod B`` — hashed n-gram features are the paper's
      construction).
    * per-bucket counts with +1 smoothing: ``ct_b`` over target documents
      (``target_col == target_value``), ``cr_b`` over all documents;
      ``Nt = sum(ct_b + 1)``, ``Nr = sum(cr_b + 1)`` over all B buckets.
    * whole-bit log-likelihood-ratio ``lam_b = flog2(ct_b+1) - flog2(Nt)
      - flog2(cr_b+1) + flog2(Nr)`` (integer; ``flog2`` = bit length - 1).
    * ``weight_bits(d) = sum_b c_db * lam_b`` and ``n_features(d) = sum_b
      c_db`` — documents with no token are excluded.

    Stage shape: ONE feature pass per batch (a document never splits across
    input batches, so per-batch (doc, bucket) counts are globally exact) ->
    a B-row bucket-count exchange (B is a constant — driver-safe take_all)
    -> lam broadcast as a dense array -> per-doc fold via the range sort
    (equal ids land in one block)."""
    from .hashing import poly_hash_arr

    is_target_expr = pl.col(target_col) == target_value

    def feat_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col, target_col]))
        toks = (
            df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+")
                .alias("tok"),
                is_target_expr.cast(pl.Int64).alias("is_target"),
            )
            .select([id_col, "tok", "is_target"])
            .explode("tok")
            .drop_nulls("tok")
        )
        if toks.height == 0:
            return pa.table(
                {
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "bucket": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "is_target": pa.array([], pa.int64()),
                }
            )
        bi = toks.with_columns(pl.col("tok").shift(-1).over(id_col).alias("nxt"))
        bigrams = bi.drop_nulls("nxt").with_columns(
            (pl.col("tok") + pl.lit(" ") + pl.col("nxt")).alias("tok")
        ).select([id_col, "tok", "is_target"])
        feats = pl.concat([toks, bigrams])
        h = poly_hash_arr(feats["tok"].to_arrow())
        feats = feats.with_columns(
            pl.Series("bucket", (h % np.uint64(num_buckets)).astype(np.int64))
        )
        out = feats.group_by([id_col, "bucket", "is_target"]).agg(
            pl.len().cast(pl.Int64).alias("c")
        )
        return out.select([id_col, "bucket", "c", "is_target"]).to_arrow()

    dcb = ds.map_batches(feat_rows, batch_format="pyarrow").materialize()

    # bucket-count exchange: at most num_buckets output rows (constant)
    from ray.data.aggregate import Sum

    def tgt_part(b: pa.Table) -> pa.Table:
        ct = pc.multiply(b["c"], b["is_target"])
        return b.select(["bucket", "c"]).append_column("ct", ct)

    bc_rows = (
        dcb.map_batches(tgt_part, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c", alias_name="cr"), Sum("ct", alias_name="ct"))
        .take_all()
    )
    cr_tot = sum(int(r["cr"]) for r in bc_rows)
    ct_tot = sum(int(r["ct"]) for r in bc_rows)
    nr = cr_tot + num_buckets
    nt = ct_tot + num_buckets
    lam = np.zeros(num_buckets, dtype=np.int64)
    base = nr.bit_length() - nt.bit_length()
    lam[:] = base  # empty buckets: ct=cr=0 -> bitlens cancel
    for r in bc_rows:
        lam[int(r["bucket"])] = (
            (int(r["ct"]) + 1).bit_length()
            - nt.bit_length()
            - (int(r["cr"]) + 1).bit_length()
            + nr.bit_length()
        )
    lam_ref = ray.put(lam)

    def fold(b: pa.Table, _ref=lam_ref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "n_features": pa.array([], pa.int64()),
                    "weight_bits": pa.array([], pa.int64()),
                }
            )
        lam_arr = ray.get(_ref)
        bk = b["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False)
        df = pl.from_arrow(b.select([id_col])).with_columns(
            c=pl.Series(c.astype(np.int64)),
            wb=pl.Series((c * lam_arr[bk]).astype(np.int64)),
        )
        out = (
            df.group_by(id_col, maintain_order=True)
            .agg(
                pl.col("c").sum().cast(pl.Int64).alias("n_features"),
                pl.col("wb").sum().cast(pl.Int64).alias("weight_bits"),
            )
        )
        return out.to_arrow()

    return dcb.sort(id_col).map_batches(fold, batch_format="pyarrow", batch_size=None)


def top_ngrams(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    k: int = 20,
) -> pa.Table:
    """Corpus-wide top-k token n-grams by frequency — the classic corpus
    profile (boilerplate phrases, templated spans) that drives stop-phrase
    lists and repetition filters at web scale.

    Deterministic contract: tokens are lowercase ``[a-z0-9]+``; n-grams are
    space-joined WITHIN a document (never across documents); ranking is
    ``count DESC, gram ASC`` (lexicographic tie-break), rank 1-based.

    Stage shape: per-batch n-gram explode + partial counts (the combiner —
    vocabulary-sized, not token-sized, rows enter the exchange) -> one
    groupby-sum exchange (each gram lands in exactly one block) -> per-block
    local top-k (count DESC, gram ASC) -> a k x nblocks driver merge.
    Returns a k-row arrow table (rank, gram, count) — driver-safe by
    construction."""
    import heapq

    def grams(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (
            df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+")
                .alias("tok")
            )
            .select([id_col, "tok"])
            .explode("tok")
            .drop_nulls("tok")
        )
        if toks.height == 0:
            return pa.table(
                {"gram": pa.array([], pa.large_string()), "c": pa.array([], pa.int64())}
            )
        parts = [pl.col("tok")]
        for j in range(1, n):
            parts.extend([pl.lit(" "), pl.col("tok").shift(-j).over(id_col)])
        out = (
            toks.with_columns(pl.concat_str(parts).alias("gram"))
            .drop_nulls("gram")
            .group_by("gram")
            .agg(pl.len().cast(pl.Int64).alias("c"))
        )
        return out.select(["gram", "c"]).to_arrow()

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(grams, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("c", alias_name="count"))
    )

    def local_topk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return (
            df.sort(["count", "gram"], descending=[True, False]).head(k).to_arrow()
        )

    rows = counts.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    ).take_all()
    best = heapq.nsmallest(k, ((-int(r["count"]), r["gram"]) for r in rows))
    return pa.table(
        {
            "rank": pa.array(range(1, len(best) + 1), pa.int64()),
            "gram": pa.array([g for _, g in best], pa.large_string()),
            "count": pa.array([-c for c, _ in best], pa.int64()),
        }
    )


def temperature_sample(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    source_col: str = "source",
    weight_col: str = "n_chars",
    *,
    denom: int = 4,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Temperature-weighted source mixing (the mT5 / Llama data-mixing step):
    sample a fixed document budget across sources with per-source quotas
    proportional to size^alpha, alpha = 1/2, flattening the source
    distribution so small sources are not drowned out.

    Deterministic, integer-exact contract (no RNG, no floats):

    - per-source weight ``w_s = isqrt(sum(weight_col))`` (integer sqrt)
    - budget ``B = total_docs // denom``; quota ``q_s = B * w_s // W``
      (``W = sum w_s``), leftover ``B - sum q_s`` distributed by largest
      remainder (``B * w_s % W`` DESC, source ASC tie-break)
    - within a source, documents are ranked by ``(poly_hash(text), id)`` —
      the SQL-expressible content hash — and the first ``q_s`` kept.

    Emits ``(id, source, rk)`` for the selected documents. Stage shape: one
    source-keyed aggregate (num_sources rows to the driver — metadata scale),
    quota dict broadcast in the block closure, then the bucket-sort +
    whole-block grouped-rank pattern (no global sort, no per-group Python).
    A quota larger than a source's row count degrades to "take all" on both
    the Ray and SQL sides."""
    import math

    from ray.data.aggregate import Count, Sum

    from .hashing import poly_hash_arr

    stats = (
        ds.groupby(source_col)
        .aggregate(Sum(weight_col, alias_name="toks"), Count(alias_name="nd"))
        .take_all()
    )
    total = sum(int(r["nd"]) for r in stats)
    budget = total // denom
    w = {r[source_col]: math.isqrt(int(r["toks"])) for r in stats}
    wsum = sum(w.values()) or 1
    quota = {s: budget * ws // wsum for s, ws in w.items()}
    leftover = budget - sum(quota.values())
    for s in sorted(w, key=lambda s: (-(budget * w[s] % wsum), s))[:leftover]:
        quota[s] += 1
    qtab = pl.DataFrame(
        {
            source_col: list(quota.keys()),
            "quota": pl.Series(list(quota.values()), dtype=pl.Int64),
        }
    )

    def prep(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        f = poly_hash_arr(col).astype(np.int64)
        t = b.select([id_col, source_col]).append_column("f", pa.array(f, pa.int64()))
        bk = pl.from_arrow(t.select([source_col])).select(
            pl.col(source_col).hash(seed=17).mod(num_buckets).cast(pl.Int32).alias("bucket")
        )["bucket"]
        return t.append_column("bucket", bk.to_arrow())

    def block(b: pa.Table, _q=qtab) -> pa.Table:
        df = pl.from_arrow(b).sort([source_col, "f", id_col])
        return (
            df.with_columns(
                pl.col(id_col).cum_count().over(source_col).cast(pl.Int64).alias("rk")
            )
            .join(_q, on=source_col, how="left")
            .filter(pl.col("rk") <= pl.col("quota"))
            .select([id_col, source_col, "rk"])
            .to_arrow()
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def hashed_bow(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    dim_bits: int = 8,
) -> ray.data.Dataset:
    """Feature-hashing bag-of-words vectorizer (the HashingVectorizer /
    hashing-trick step that turns raw text into fixed-width features for
    classifier-based quality filtering at corpus scale): every token maps to
    ``poly_hash(token) mod 2**dim_bits`` — the SQL-expressible hash family —
    and the document's feature value is the token count in that bucket.

    Emits sparse long-format ``(id, dim, count)`` integer rows (zero buckets
    omitted), so the oracle compares integer-for-integer and downstream
    stages densify only if they must. One vectorized explode + a per-doc
    polars group count; no exchange at all — the rows stay in their
    document's block."""
    from .hashing import poly_hash_arr

    mask = np.uint64((1 << dim_bits) - 1)

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (
            df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+")
                .alias("tok")
            )
            .select([id_col, "tok"])
            .explode("tok")
            .drop_nulls("tok")
        )
        if toks.height == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "count": pa.array([], pa.int64()),
                }
            )
        t = toks.to_arrow()
        col = t["tok"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = (poly_hash_arr(col) & mask).astype(np.int64)
        out = (
            pl.DataFrame(
                {
                    id_col: pl.from_arrow(t[id_col]),
                    "dim": dim,
                }
            )
            .group_by([id_col, "dim"])
            .agg(pl.len().cast(pl.Int64).alias("count"))
        )
        return out.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    *,
    k: int = 100,
) -> pa.Table:
    """Deterministic weighted sampling without replacement (the RNG-free
    analog of A-ES reservoir sampling): every row gets the integer key
    ``(affine64(id) >> 1) // weight`` — a fixed pseudo-random draw scaled
    DOWN by the weight, so heavier rows rank earlier — and the global k
    smallest (key, id) win. Reproducible across runs, partitionings and
    engines: the affine hash is the SQL-expressible family and the key stays
    below 2**63 by construction (the >> 1).

    Stage shape: per-block local top-k (one vectorized lexsort), k x nblocks
    rows to the driver, heap merge — shuffle-free and linear in the corpus."""
    import heapq

    from .hashing import K_A, K_B

    def local(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        w = np.asarray(b[weight_col].to_pylist(), dtype=np.int64)
        if not len(ids):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    weight_col: pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                }
            )
        h = ids.astype(np.uint64) * np.uint64(K_A) + np.uint64(K_B)
        key = ((h >> np.uint64(1)) // w.astype(np.uint64)).astype(np.int64)
        order = np.lexsort((ids, key))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                weight_col: pa.array(w[order], pa.int64()),
                "key": pa.array(key[order], pa.int64()),
            }
        )

    rows = ds.map_batches(local, batch_format="pyarrow").take_all()
    best = heapq.nsmallest(k, ((int(r["key"]), int(r[id_col]), int(r[weight_col])) for r in rows))
    return pa.table(
        {
            id_col: pa.array([i for _, i, _ in best], pa.int64()),
            weight_col: pa.array([w for _, _, w in best], pa.int64()),
            "key": pa.array([x for x, _, _ in best], pa.int64()),
        }
    )


def classifier_score(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    dim_bits: int = 8,
) -> ray.data.Dataset:
    """Linear quality classifier over the hashed bag-of-words (the
    fasttext-style score-and-threshold filter every LLM corpus pipeline runs
    after vectorization): each token maps to ``poly_hash(token) mod
    2**dim_bits`` and the model weight for bucket ``b`` is the deterministic
    signed integer ``((affine64(b) >> 4) % 17) - 8`` — the same
    SQL-expressible affine family as the MinHash permutations, so the oracle
    reproduces the scores bit-for-bit without shipping a weight table.

    Emits ``(id, score, keep)`` with ``score = sum of weights over token
    occurrences`` (docs with zero tokens drop, matching SQL GROUP BY) and
    ``keep = score >= 0``. The weight table (2**dim_bits int64s) is built once
    per closure; scoring is one explode + vectorized gather + per-doc sum,
    all block-local — zero exchanges at any corpus size."""
    from .hashing import K_A, K_B, poly_hash_arr

    n_buckets = 1 << dim_bits
    mask = np.uint64(n_buckets - 1)
    b = np.arange(n_buckets, dtype=np.uint64)
    weights = (
        ((b * np.uint64(K_A) + np.uint64(K_B)) >> np.uint64(4)) % np.uint64(17)
    ).astype(np.int64) - 8

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, text_col]))
        toks = (
            df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+")
                .alias("tok")
            )
            .select([id_col, "tok"])
            .explode("tok")
            .drop_nulls("tok")
        )
        if toks.height == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        t = toks.to_arrow()
        col = t["tok"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = (poly_hash_arr(col) & mask).astype(np.int64)
        out = (
            pl.DataFrame(
                {
                    id_col: pl.from_arrow(t[id_col]),
                    "wt": weights[dim],
                }
            )
            .group_by(id_col)
            .agg(pl.col("wt").sum().cast(pl.Int64).alias("score"))
            .with_columns((pl.col("score") >= 0).cast(pl.Int64).alias("keep"))
        )
        return out.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_chain(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    dim_bits: int = 8,
    min_tokens: int = 20,
) -> ray.data.Dataset:
    """The composite corpus-filter DECISION pass (C4/Gopher-style): every
    heuristic evaluated in ONE block-local sweep, emitting an integer reason
    BITMASK per document plus the final keep flag — the auditability shape a
    production pipeline needs (why did this doc drop?), without re-scanning
    the corpus once per rule.

    Bits (all-integer rules, SQL-mirrored by the oracle):
      1  too_short        n_tokens < min_tokens
      2  low_alpha        2*n_alpha < n_chars        (alpha ratio < 0.5)
      4  repetitive       5*n_dup_words > n_words    (dup fraction > 0.2)
      8  bigram_spam      10*top_bigram_n > n_bigrams AND n_bigrams >= 10
      16 classifier       hashed-BoW linear score < 0 (see classifier_score)

    keep = reasons == 0. Zero exchanges at any corpus size."""
    from .hashing import K_A, K_B, poly_hash_arr

    n_buckets = 1 << dim_bits
    mask = np.uint64(n_buckets - 1)
    b = np.arange(n_buckets, dtype=np.uint64)
    weights = (
        ((b * np.uint64(K_A) + np.uint64(K_B)) >> np.uint64(4)) % np.uint64(17)
    ).astype(np.int64) - 8

    def fn(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, text_col]))
        base = df.select(
            pl.col(id_col),
            pl.col(text_col).str.len_chars().cast(pl.Int64).alias("n_chars"),
            pl.col(text_col).str.count_matches(r"[a-z0-9]+").cast(pl.Int64).alias("n_tokens"),
            pl.col(text_col).str.count_matches(r"[A-Za-z]").cast(pl.Int64).alias("n_alpha"),
        )
        words = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.split(" ").alias("tok")
            )
            .explode("tok")
            .filter(pl.col("tok").str.len_chars() > 0)
            .select([id_col, "tok"])
        )
        wd = words.group_by(id_col).agg(
            n_words=pl.len().cast(pl.Int64),
            n_dup_words=(pl.len() - pl.col("tok").n_unique()).cast(pl.Int64),
        )
        bg = (
            words.with_columns(pl.col("tok").shift(-1).over(id_col).alias("nxt"))
            .drop_nulls("nxt")
            .with_columns(
                pl.concat_str([pl.col("tok"), pl.col("nxt")], separator=" ").alias("bg")
            )
            .group_by([id_col, "bg"])
            .len()
            .group_by(id_col)
            .agg(
                n_bigrams=pl.col("len").sum().cast(pl.Int64),
                top_bigram_n=pl.col("len").max().cast(pl.Int64),
            )
        )
        ctoks = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.extract_all(r"[a-z0-9]+").alias("ct")
            )
            .select([id_col, "ct"])
            .explode("ct")
            .drop_nulls("ct")
        )
        if ctoks.height:
            t = ctoks.to_arrow()
            col = t["ct"]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            dim = (poly_hash_arr(col) & mask).astype(np.int64)
            cls = (
                pl.DataFrame({id_col: pl.from_arrow(t[id_col]), "wt": weights[dim]})
                .group_by(id_col)
                .agg(pl.col("wt").sum().cast(pl.Int64).alias("score"))
            )
        else:
            cls = pl.DataFrame(
                {id_col: pl.Series([], dtype=base[id_col].dtype), "score": pl.Series([], dtype=pl.Int64)}
            )
        out = (
            base.join(wd, on=id_col, how="left")
            .join(bg, on=id_col, how="left")
            .join(cls, on=id_col, how="left")
            .fill_null(0)
        )
        out = out.with_columns(
            (
                (pl.col("n_tokens") < min_tokens).cast(pl.Int64) * 1
                + (2 * pl.col("n_alpha") < pl.col("n_chars")).cast(pl.Int64) * 2
                + (5 * pl.col("n_dup_words") > pl.col("n_words")).cast(pl.Int64) * 4
                + (
                    (10 * pl.col("top_bigram_n") > pl.col("n_bigrams"))
                    & (pl.col("n_bigrams") >= 10)
                ).cast(pl.Int64)
                * 8
                + (pl.col("score") < 0).cast(pl.Int64) * 16
            ).alias("reasons")
        ).with_columns((pl.col("reasons") == 0).cast(pl.Int64).alias("keep"))
        return out.select([id_col, "reasons", "keep"]).to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


def interleave_plan(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    source_col: str = "source",
    *,
    scale: int = 840,
    bucket_shift: int = 10,
) -> ray.data.Dataset:
    """Weighted-fair source interleaving plan (the deterministic data-mixing
    schedule a training job consumes instead of an RNG sampler): every
    document gets a virtual time ``vt = ((r + 1) * scale) // weight(source)``
    where ``r`` is its rank WITHIN its source (doc-id order) and the weight
    is the deterministic ``1 + poly_hash(source) % 4`` — sources with weight
    w appear w times as often in ``ORDER BY vt`` (weighted fair queueing's
    virtual-finish-time rule, integer-exact).

    Distribution is the dense-rank shape (see training_shuffle): ranks come
    from order-preserving doc-id RANGE buckets (``id >> bucket_shift``) —
    pass 1 aggregates one count per (source, bucket) (metadata-scale for
    dense ids; the counts table is the only driver traffic), pass 2 sorts on
    the bucket alone and ranks blocks locally plus their (source, bucket)
    offset. Output: (id, source, r, vt)."""
    from ray.data.aggregate import Count

    from .hashing import poly_hash_one

    def keyed(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            b[id_col].combine_chunks().to_numpy(zero_copy_only=False), dtype=np.int64
        )
        return pa.table(
            {
                id_col: b[id_col],
                source_col: b[source_col],
                "bucket": pa.array(ids >> bucket_shift, pa.int64()),
            }
        )

    keyed_ds = (
        ds.select_columns([id_col, source_col])
        .map_batches(keyed, batch_format="pyarrow")
        .materialize()
    )
    counts = (
        keyed_ds.groupby([source_col, "bucket"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    by_source: dict[str, list[tuple[int, int]]] = {}
    for r in counts:
        by_source.setdefault(r[source_col], []).append((int(r["bucket"]), int(r["n"])))
    off_rows = []
    for s, pairs in by_source.items():
        acc = 0
        for bk, n in sorted(pairs):
            off_rows.append({source_col: s, "bucket": bk, "off": acc})
            acc += n
    offsets = pl.DataFrame(
        off_rows,
        schema={source_col: pl.Utf8, "bucket": pl.Int64, "off": pl.Int64},
    )
    weights = pl.DataFrame(
        {
            source_col: pl.Series(sorted(by_source), dtype=pl.Utf8),
            "wgt": pl.Series(
                [1 + int(poly_hash_one(s) % 4) for s in sorted(by_source)],
                dtype=pl.Int64,
            ),
        }
    )

    def block(b: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(b)
            .sort([source_col, "bucket", id_col])
            .with_columns(
                (pl.col(id_col).cum_count().over([source_col, "bucket"]) - 1)
                .cast(pl.Int64)
                .alias("lr")
            )
            .join(offsets, on=[source_col, "bucket"], how="left")
            .join(weights, on=source_col, how="left")
        )
        out = df.select(
            pl.col(id_col),
            pl.col(source_col),
            (pl.col("off") + pl.col("lr")).alias("r"),
            (((pl.col("off") + pl.col("lr") + 1) * scale) // pl.col("wgt")).alias("vt"),
        )
        return out.to_arrow()

    return keyed_ds.sort("bucket").map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def bpe_pair_counts(
    ds: ray.data.Dataset,
    text_col: str,
    *,
    k: int = 50,
) -> pa.Table:
    """First iteration of BPE tokenizer training: corpus-wide counts of
    ADJACENT CHARACTER pairs within words, ranked — the merge-candidate table
    a byte-pair-encoding trainer (Sennrich et al., 2016) consults each round.
    At web scale this is the inner loop of training a tokenizer on your own
    corpus rather than shipping GPT-2's.

    Deterministic contract: words are lowercase ``[a-z]+`` runs; pairs never
    cross a word boundary; ranking is ``count DESC, pair ASC``, rank 1-based.

    Stage shape mirrors :func:`top_ngrams`: per-batch explode to chars +
    shift-within-word pair build + partial counts (the exchange carries at
    most 26x26 rows per block, not character-sized data) -> one groupby-sum
    -> per-block top-k -> k x nblocks driver merge. Returns a k-row arrow
    table (rank, pair, count)."""
    import heapq

    def pairs(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([text_col]))
        words = (
            df.select(
                pl.col(text_col).str.to_lowercase().str.extract_all(r"[a-z]+").alias("w")
            )
            .explode("w")
            .drop_nulls("w")
            .filter(pl.col("w").str.len_chars() >= 2)
            .with_row_index("wid")
        )
        if words.height == 0:
            return pa.table(
                {"pair": pa.array([], pa.large_string()), "c": pa.array([], pa.int64())}
            )
        chars = words.select(["wid", pl.col("w").str.extract_all(".").alias("ch")]).explode("ch")
        out = (
            chars.with_columns(
                pl.concat_str([pl.col("ch"), pl.col("ch").shift(-1).over("wid")]).alias("pair")
            )
            .drop_nulls("pair")
            .group_by("pair")
            .agg(pl.len().cast(pl.Int64).alias("c"))
        )
        return out.select(["pair", "c"]).to_arrow()

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("c", alias_name="count"))
    )

    def local_topk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.sort(["count", "pair"], descending=[True, False]).head(k).to_arrow()

    rows = counts.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    ).take_all()
    best = heapq.nsmallest(k, ((-int(r["count"]), r["pair"]) for r in rows))
    return pa.table(
        {
            "rank": pa.array(range(1, len(best) + 1), pa.int64()),
            "pair": pa.array([p for _, p in best], pa.large_string()),
            "count": pa.array([-c for c, _ in best], pa.int64()),
        }
    )


def winnow_fingerprints(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 3,
    window: int = 4,
) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    MOSS local fingerprinting scheme): hash every ORDERED word k-shingle,
    slide a window of ``window`` consecutive hashes over the document, keep
    each window's MINIMUM — the selected set is position-robust (any match
    of at least w+k-1 tokens shares a fingerprint) and ~1/w the size of the
    full shingle set. Output: DISTINCT (id, fp) rows, fp int64 (the uint64
    polynomial hash viewed signed — the SQL-mirrorable family).

    Scale shape: entirely block-local (a document lives in one row) — one
    explode + shifted concat, one byte-buffer poly hash pass, one per-doc
    rolling min; NO exchange. Downstream dedup joins group on fp."""
    from .hashing import poly_hash_arr

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.split(" ").alias("tok")
            )
            .select([id_col, "tok"])
            .explode("tok")
            .filter(pl.col("tok").str.len_chars() > 0)
        )
        parts = [pl.col("tok")]
        for i in range(1, shingle_k):
            parts.append(pl.col("tok").shift(-i).over(id_col))
        sh = (
            toks.with_columns(
                pl.concat_str(parts, separator=" ", ignore_nulls=False).alias("sh")
            )
            .drop_nulls("sh")
            .select([id_col, "sh"])
        )
        if not sh.height:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "fp": pa.array([], pa.int64())}
            )
        h = poly_hash_arr(sh["sh"].to_arrow())  # ordered uint64 per shingle
        out = (
            sh.with_columns(pl.Series("h", h, dtype=pl.UInt64))
            .with_columns(
                pl.col("h")
                .rolling_min(window_size=window, min_samples=window)
                .over(id_col)
                .alias("m")
            )
            .drop_nulls("m")
            .select(
                pl.col(id_col),
                pl.col("m").reinterpret(signed=True).cast(pl.Int64).alias("fp"),
            )
            .unique()
        )
        return out.to_arrow()

    return ds.map_batches(fn, batch_format="pyarrow")


def bigram_surprisal(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    broadcast_max: int = LM_VOCAB_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Per-document surprisal under an add-1-smoothed BIGRAM language model
    estimated from the corpus itself — the sequential-context upgrade of
    :func:`lm_surprisal` (a doc of common words in an unusual ORDER now
    scores high). Whole-bit contract per bigram position i:
    ``floor(log2(c1(w_{i-1}) + V)) - floor(log2(c2(w_{i-1}, w_i) + 1))``
    with c1 = corpus unigram count, c2 = corpus bigram count, V = vocabulary
    size (the add-1 denominator), summed over the document. Output:
    (id, n_bigrams, surprisal_bits) for docs with >= 2 tokens — integer-exact
    vs the SQL oracle on both engines.

    Stage shape: ONE ordered token explode (block-local shift-within-doc
    builds the bigram rows), a bigram-count exchange and a unigram-count
    exchange (both vocabulary-bounded), counts attached back to the bigram
    rows — broadcast under ``broadcast_max``, distributed ``hash_join``
    beyond (both paths equality-pinned) — then the per-doc sort + block fold."""
    _SEP = "\x1f"

    def tok_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        return (
            df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+")
                .alias("tok")
            )
            .explode("tok")
            .drop_nulls("tok")
            .select([id_col, "tok"])
            .to_arrow()
        )

    toks = ds.map_batches(tok_rows, batch_format="pyarrow").materialize()

    def bigram_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = (
            df.with_columns(prev=pl.col("tok").shift(1).over(id_col))
            .drop_nulls("prev")
            .select(
                pl.col(id_col),
                pl.col("prev"),
                pl.concat_str([pl.col("prev"), pl.col("tok")], separator=_SEP).alias(
                    "bg"
                ),
            )
        )
        return out.to_arrow()

    bg = toks.map_batches(bigram_rows, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Count

    uni = toks.groupby("tok").aggregate(Count(alias_name="c1")).materialize()
    bgc = bg.groupby("bg").aggregate(Count(alias_name="c2")).materialize()
    vocab_n = uni.count()
    empty = pa.table(
        {
            id_col: pa.array([], pa.large_string()),
            "n_bigrams": pa.array([], pa.int64()),
            "surprisal_bits": pa.array([], pa.int64()),
        }
    )
    if vocab_n == 0 or bgc.count() == 0:
        return ray.data.from_arrow(empty)

    if max(vocab_n, bgc.count()) <= broadcast_max:
        urows = uni.take_all()
        brows = bgc.take_all()
        ref = ray.put(
            (
                pa.array([r["tok"] for r in urows], pa.large_string()),
                pa.array([int(r["c1"]) for r in urows], pa.int64()),
                pa.array([r["bg"] for r in brows], pa.large_string()),
                pa.array([int(r["c2"]) for r in brows], pa.int64()),
            )
        )

        def attach(b: pa.Table, _ref=ref) -> pa.Table:
            uk, uv, bk, bv = ray.get(_ref)
            ui = pc.index_in(pc.cast(b["prev"], pa.large_string()), value_set=uk)
            bi = pc.index_in(pc.cast(b["bg"], pa.large_string()), value_set=bk)
            return b.append_column("c1", pc.take(uv, ui)).append_column(
                "c2", pc.take(bv, bi)
            )

        joined = bg.map_batches(attach, batch_format="pyarrow")
    else:
        from ..relational import hash_join

        uni_k = uni.map_batches(
            lambda t: pa.table({"prev": t["tok"], "c1": t["c1"]}),
            batch_format="pyarrow",
        )
        joined = hash_join(
            hash_join(bg, bgc, on="bg", right_cols=["c2"]),
            uni_k,
            on="prev",
            right_cols=["c1"],
        )

    def fold(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return empty
        c1 = np.asarray(b["c1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        c2 = np.asarray(b["c2"].to_numpy(zero_copy_only=False), dtype=np.int64)

        def flog2(x: np.ndarray) -> np.ndarray:
            return (np.frexp(x.astype(np.float64))[1] - 1).astype(np.int64)

        bits = flog2(c1 + vocab_n) - flog2(c2 + 1)
        df = pl.from_arrow(b.select([id_col])).with_columns(
            pl.Series("bits", bits, dtype=pl.Int64)
        )
        out = df.group_by(id_col, maintain_order=True).agg(
            pl.len().cast(pl.Int64).alias("n_bigrams"),
            pl.col("bits").sum().cast(pl.Int64).alias("surprisal_bits"),
        )
        return out.to_arrow()

    return joined.sort(id_col).map_batches(fold, batch_format="pyarrow", batch_size=None)


def bernoulli_sample(
    ds: ray.data.Dataset,
    id_col: str,
    *,
    rate_num: int = 1,
    rate_den: int = 8,
) -> ray.data.Dataset:
    """Deterministic Bernoulli sampling at rate num/den: keep a row iff
    ``affine64(id) * den < num * 2^64`` — the RNG-free per-row coin flip
    every corpus pipeline needs to be REPRODUCIBLE across runs, partitionings
    and engines (same affine family as weighted_sample; re-running the
    pipeline keeps the identical subset, which is what makes ablations
    comparable). Shuffle-free, one vectorized filter per block."""
    from .hashing import K_A, K_B

    if not (0 < rate_num <= rate_den):
        raise ValueError(f"rate {rate_num}/{rate_den} out of (0, 1]")
    # threshold in the uint64 draw domain: floor(num * 2^64 / den)
    thr = np.uint64((rate_num << 64) // rate_den) if rate_num < rate_den else None

    def keep(b: pa.Table) -> pa.Table:
        if thr is None:
            return b
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(K_A) + np.uint64(K_B)
        return b.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def cap_per_source(
    ds: ray.data.Dataset,
    id_col: str,
    source_col: str,
    *,
    k: int = 5,
) -> ray.data.Dataset:
    """Deterministic per-source document cap — the domain/source capping step
    of C4/Dolma-style corpus curation (no single domain may contribute more
    than ``k`` documents): within each source keep the ``k`` rows that rank
    first under the RNG-free uniform order ``(affine64(id), id)``, and emit
    ``(id, source, keep_rank)`` with keep_rank 1..k.

    Two-phase, shuffle-light: each input block first reduces to its OWN
    per-source top-k (a combiner — at most k rows per source leave any
    block, so exchange traffic is O(k * sources_per_block * blocks), not
    O(rows)), then one sort exchange on the source co-locates survivors
    (equal keys never straddle block boundaries after ``Dataset.sort``) and
    a block-local vectorized rank finalizes. No driver materialization; a
    hot source costs at most k * nblocks exchanged rows regardless of its
    row count."""
    from .hashing import K_A, K_B

    def local_topk(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            b[id_col].combine_chunks().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(K_A) + np.uint64(K_B)
        df = pl.DataFrame(
            {
                id_col: ids,
                source_col: pl.Series(b[source_col].to_pylist(), dtype=pl.Utf8),
                "h": h,
            }
        ).sort([source_col, "h", id_col])
        return (
            df.with_columns(
                pl.col(id_col).cum_count().over(source_col).alias("rk")
            )
            .filter(pl.col("rk") <= k)
            .drop("rk")
            .to_arrow()
        )

    def finalize(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort([source_col, "h", id_col])
        return (
            df.with_columns(
                pl.col(id_col)
                .cum_count()
                .over(source_col)
                .cast(pl.Int64)
                .alias("keep_rank")
            )
            .filter(pl.col("keep_rank") <= k)
            .select([id_col, source_col, "keep_rank"])
            .to_arrow()
        )

    return (
        ds.select_columns([id_col, source_col])
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(source_col)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def compress_ratio(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    level: int = 6,
) -> ray.data.Dataset:
    """Compression-ratio quality signal (the Gopher/CCNet duplication-and-
    boilerplate filter): ``ratio_x1000 = 1000 * len(zlib(text)) //
    len(utf8(text))`` — repetitive/templated documents compress far below
    natural prose, so a low ratio flags boilerplate and a very high one
    flags noise. zlib level is pinned and zlib output is deterministic for
    a given (input, level), so the integer contract is stable across runs
    and machines; NOT SQL-expressible (no DEFLATE in DuckDB) — rows-only
    driver entry, properties pinned in pytest.

    The per-row zlib.compress call is C-dominated (the Python loop is
    dispatch only); emitted columns stay integer-exact."""
    import zlib

    def block(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        n_raw = np.empty(len(texts), np.int64)
        n_z = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            raw = (t or "").encode("utf-8")
            n_raw[i] = len(raw)
            n_z[i] = len(zlib.compress(raw, level))
        ratio = np.where(n_raw > 0, 1000 * n_z // np.maximum(n_raw, 1), 0)
        return pa.table(
            {
                id_col: b[id_col],
                "n_bytes": pa.array(n_raw, pa.int64()),
                "n_zbytes": pa.array(n_z, pa.int64()),
                "ratio_x1000": pa.array(ratio, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow"
    )


def bucket_batches(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    band: int = 16,
    budget: int = 256,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Length-bucketed training-batch formation: documents group into
    LENGTH BANDS (``lband = n_tokens // band``) and, within a band in id
    order, pack greedily into fixed-token-budget batches — homogeneous-length
    batches minimize padding waste, the standard dynamic-batching move.
    Output (id, n_tokens, lband, batch_id) with batch_id dense within band.

    Distribution is the sequence_pack metadata-prefix-sum shape over the
    COMPOSITE (lband, id-range bucket) key: pass 1 ships one token sum per
    cell to the driver (cells = bands x num_buckets — metadata scale), the
    driver folds per-band exclusive offsets in id-bucket order, pass 2 sorts
    on the cell key alone and each block adds its cell offset to a local
    cumulative sum. Bit-exact against the SQL window oracle."""
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        return df.select(
            pl.col(id_col),
            pl.col(text_col)
            .str.split(" ")
            .list.len()
            .cast(pl.Int64)
            .alias("n_tokens"),
        ).to_arrow()

    with_counts = ds.map_batches(counts, batch_format="pyarrow").materialize()
    if with_counts.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "lband": pa.array([], pa.int64()),
                    "batch_id": pa.array([], pa.int64()),
                }
            )
        )
    n_ids = int(with_counts.max(id_col)) + 1
    span = -(-n_ids // num_buckets)

    def keyed(b: pa.Table) -> pa.Table:
        lb = pc.divide(b["n_tokens"], band)
        ib = pc.divide(b[id_col], span)
        cell = pc.add(
            pc.multiply(pc.cast(lb, pa.int64()), num_buckets),
            pc.cast(ib, pa.int64()),
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": b["n_tokens"],
                "lband": pc.cast(lb, pa.int64()),
                "cell": cell,
            }
        )

    cells = with_counts.map_batches(keyed, batch_format="pyarrow")
    sums = {
        int(r["cell"]): int(r["sum(n_tokens)"])
        for r in cells.groupby("cell").aggregate(Sum("n_tokens")).take_all()
    }
    offsets: dict[int, int] = {}
    for cell in sorted(sums):
        b_band = cell // num_buckets
        prev = offsets.get(("acc", b_band), 0)  # type: ignore[arg-type]
        offsets[cell] = prev
        offsets[("acc", b_band)] = prev + sums[cell]  # type: ignore[index]
    cell_off = {c: v for c, v in offsets.items() if isinstance(c, int)}

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["cell", id_col])
        off = pl.col("cell").replace_strict(
            list(cell_off.keys()), list(cell_off.values()), return_dtype=pl.Int64
        )
        prefix = (
            pl.col("n_tokens").cum_sum().over("cell") - pl.col("n_tokens") + off
        )
        return (
            df.select(
                pl.col(id_col),
                pl.col("n_tokens"),
                pl.col("lband"),
                (prefix // budget).cast(pl.Int64).alias("batch_id"),
            )
            .to_arrow()
        )

    return cells.sort("cell").map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def vocab_coverage(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    vocab_size: int = 16,
) -> ray.data.Dataset:
    """Per-document OOV rate against the corpus's own top-``vocab_size``
    vocabulary (occurrence count DESC, token ASC at ties) — the tokenizer
    coverage signal used to size vocabularies before training: ``(id,
    n_tokens, n_oov, oov_ppm)`` with ``oov_ppm = n_oov * 1_000_000 //
    n_tokens`` (0 for token-less docs). Integer-only, so the SQL oracle is
    exact.

    Stage shape: per-batch token-count combiner -> one token-keyed groupby
    sum -> V-row sort+limit (the only driver traffic; V is the vocabulary
    budget, metadata-scale by construction) -> vocabulary broadcast into the
    per-batch vectorized ``is_in`` pass. Empty documents are kept by joining
    the per-doc aggregate back onto the batch's id column."""
    from ray.data.aggregate import Sum

    def tok_counts(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([text_col]))
        out = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.split(" ").alias("tok")
            )
            .explode("tok")
            .filter(pl.col("tok").str.len_chars() > 0)
            .group_by("tok")
            .agg(pl.len().cast(pl.Int64).alias("c"))
        )
        return out.to_arrow()

    cnt = (
        ds.map_batches(tok_counts, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("c", alias_name="c"))
    )
    top = cnt.sort(["c", "tok"], descending=[True, False]).limit(vocab_size).take_all()
    vocab = sorted(r["tok"] for r in top)

    def cover(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (
            df.with_columns(
                pl.col(text_col).str.to_lowercase().str.split(" ").alias("tok")
            )
            .explode("tok")
            .filter(pl.col("tok").str.len_chars() > 0)
        )
        agg = toks.group_by(id_col).agg(
            pl.len().cast(pl.Int64).alias("n_tokens"),
            (~pl.col("tok").is_in(vocab)).sum().cast(pl.Int64).alias("n_oov"),
        )
        out = (
            df.select(pl.col(id_col))
            .join(agg, on=id_col, how="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("n_oov").fill_null(0),
            )
            .with_columns(
                pl.when(pl.col("n_tokens") == 0)
                .then(0)
                .otherwise(pl.col("n_oov") * 1_000_000 // pl.col("n_tokens"))
                .cast(pl.Int64)
                .alias("oov_ppm")
            )
        )
        return out.to_arrow()

    return ds.map_batches(cover, batch_format="pyarrow")


def epoch_plan(
    ds: ray.data.Dataset,
    id_col: str,
    *,
    n_epochs: int = 3,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Multi-epoch training-order plan: each epoch gets its OWN deterministic
    permutation — rank under (affine64(id; a_e, b_e), id) with the per-epoch
    MinHash constants — so repeated-epoch training sees a different document
    order every epoch with zero RNG state and bit-reproducible resume.
    Output: one (id, epoch, rank) row per document x epoch.

    Distribution is training_shuffle's metadata-prefix-sum generalized over
    the epoch axis: hash top-bits bucket within each epoch, ONE exchange for
    all epochs keyed (epoch, bucket), driver traffic = n_epochs x
    num_buckets counts."""
    from ray.data.aggregate import Count

    from .hashing import perm_constants

    shift = np.uint64(64 - max(1, (num_buckets - 1).bit_length()))
    n_buckets = 1 << (64 - int(shift))
    consts = [perm_constants(e) for e in range(n_epochs)]

    def hashed(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            b[id_col].combine_chunks().to_numpy(zero_copy_only=False), dtype=np.int64
        ).astype(np.uint64)
        n = len(ids)
        out_id = np.tile(ids, n_epochs)
        out_e = np.repeat(np.arange(n_epochs, dtype=np.int64), n)
        hs = np.concatenate(
            [ids * np.uint64(a) + np.uint64(bb) for a, bb in consts]
        ) if n else np.zeros(0, np.uint64)
        return pa.table(
            {
                id_col: pa.array(out_id.astype(np.int64)),
                "epoch": pa.array(out_e),
                "h": pa.array(hs, pa.uint64()),
                "bucket": pa.array((hs >> shift).astype(np.int32), pa.int32()),
            }
        )

    hashed_ds = (
        ds.select_columns([id_col]).map_batches(hashed, batch_format="pyarrow").materialize()
    )
    counts = {
        (r["epoch"], r["bucket"]): r["n"]
        for r in hashed_ds.groupby(["epoch", "bucket"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    }
    offsets: dict[tuple[int, int], int] = {}
    for e in range(n_epochs):
        acc = 0
        for bk in range(n_buckets):
            offsets[(e, bk)] = acc
            acc += int(counts.get((e, bk), 0))

    keys = [e * n_buckets + bk for (e, bk) in offsets]
    vals = [offsets[k] for k in offsets]

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["epoch", "bucket", "h", id_col])
        cell = pl.col("epoch") * n_buckets + pl.col("bucket")
        off = cell.replace_strict(keys, vals, return_dtype=pl.Int64)
        rank = cell.cum_count().over("epoch", "bucket") - 1 + off
        return df.select(
            pl.col(id_col),
            pl.col("epoch").cast(pl.Int64),
            rank.cast(pl.Int64).alias("rank"),
        ).to_arrow()

    return hashed_ds.sort(["epoch", "bucket"]).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )
