"""Full-text retrieval over a document corpus — BM25 top-k as a Ray Data
pipeline, with an integer-exact scoring contract so the SQL oracle comparison
is bit-exact.

The reference engine has no retrieval operator; this is part of the
LLM-training-data surface (query-based corpus probing / eval-set mining).

Scoring contract (documented; all arithmetic exact in 128-bit integers):

* tokens: lowercase ``[a-z0-9]+`` (the ``token_stats`` convention); only
  documents with >= 1 token participate.
* ``tf(d,t)`` term frequency, ``dl(d)`` document length in tokens,
  ``N`` = participating documents, ``avgdl = total_tokens // N``.
* idf surrogate ``W(t) = (N << idf_scale_bits) // df(t)`` — a scaled
  multiplicative idf, monotone in the classic BM25 idf (both decrease in
  ``df``); integer division keeps it bit-exact across engines.
* per-term contribution with the standard k1=1.2, b=0.75 saturation, cleared
  of floats by multiplying through (k1 = 6/5, b = 3/4):

      contrib = (W(t) * 44 * avgdl * tf) // (20*avgdl*tf + 6*avgdl + 18*dl)

  which is ``W * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with one floor
  at the end (and one inside ``W``). 128-bit intermediates (polars Int128
  here, HUGEINT in the oracle) make the product safe at web scale
  (N=1e10, dl=1e5 stays under 2**90).
* ``score_q(q,d) = sum over q's DISTINCT terms of contrib`` — BIGINT in the
  output (bounded by ~|q| * W_max * 2.2, far under 2**63).
* top-k per query: ``ORDER BY score_q DESC, doc_id ASC LIMIT k`` — ties are
  deterministic on the id.

Stage shape (shuffle-minimal): ONE tokenize+group pass per batch emits exact
``(doc, tok, tf, dl)`` rows (a document's tokens never split across input
batches, so per-batch polars group_by is already global truth — no tf/df
exchange at all); corpus N/total ride out as two per-batch marker sums; rows
are filtered to the broadcast query vocabulary (tiny) so ``df`` is a
metadata-scale groupby; scoring is vectorized Int128; the only global
exchange is the final sort on ``(query_id, doc_id)`` whose equal keys land in
one block (Ray range sort), folded block-locally, then a per-block local
top-k and a k x nq x nblocks driver merge (the :mod:`similarity` pattern).
"""

from __future__ import annotations

import heapq
import re

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_TOKEN_RE = re.compile(r"[a-z0-9]+")

_I128 = pl.Int128


def _tok_tf_rows(id_col: str, text_col: str):
    """Per-batch exact (id, tok, tf, dl, first) rows: a document lives wholly
    inside one input batch, so batch-local group_by is globally exact."""

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (
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
        if toks.height == 0:
            return pa.table(
                {
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "tok": pa.array([], pa.large_string()),
                    "tf": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                    "first": pa.array([], pa.int64()),
                }
            )
        tf = toks.group_by([id_col, "tok"]).agg(pl.len().cast(pl.Int64).alias("tf"))
        tf = tf.sort([id_col, "tok"])  # deterministic "first" marker placement
        tf = tf.with_columns(
            pl.col("tf").sum().over(id_col).alias("dl"),
            (pl.col("tok").cum_count().over(id_col) == 1)
            .cast(pl.Int64)
            .alias("first"),
        )
        return tf.to_arrow()

    return fn


def query_terms(queries: list[str]) -> list[tuple[int, str]]:
    """(query_id, token) pairs, DISTINCT per query, tokenized with the corpus
    convention."""
    out = []
    for qid, q in enumerate(queries):
        seen = set()
        for t in _TOKEN_RE.findall(q.lower()):
            if t not in seen:
                seen.add(t)
                out.append((qid, t))
    return out


def bm25_topk(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    queries: list[str],
    *,
    k: int = 10,
    idf_scale_bits: int = 10,
) -> pa.Table:
    """BM25 top-k documents per query under the integer-exact contract above.

    Returns a small arrow table (query_id, <id_col>, score_q, rank) with at
    most ``k * len(queries)`` rows — driver-safe by construction."""
    qterms = query_terms(queries)
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "score_q": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if not qterms:
        return empty
    qvocab = pa.array(sorted({t for _, t in qterms}), pa.large_string())

    tok_tf = ds.map_batches(
        _tok_tf_rows(id_col, text_col), batch_format="pyarrow"
    ).materialize()

    # corpus stats: two ints per block to the driver ("first" marks one row
    # per document, so both are plain block-safe sums)
    n_docs = 0
    total = 0
    for b in tok_tf.iter_batches(batch_format="pyarrow", batch_size=None):
        n_docs += int(pc.sum(b["first"]).as_py() or 0)
        # dl is repeated per (doc, tok) row; sum tf instead (== sum of dl once)
        total += int(pc.sum(b["tf"]).as_py() or 0)
    if n_docs == 0:
        return empty
    avgdl = max(1, total // n_docs)

    def keep_query_toks(b: pa.Table) -> pa.Table:
        mask = pc.is_in(pc.cast(b["tok"], pa.large_string()), value_set=qvocab)
        return b.filter(mask).select([id_col, "tok", "tf", "dl"])

    qtf = tok_tf.map_batches(keep_query_toks, batch_format="pyarrow").materialize()

    # df per query token: each (doc, tok) appears exactly once globally, so a
    # Count aggregate IS the document frequency; output is bounded by the
    # query vocabulary (tiny) — driver-safe take_all.
    from ray.data.aggregate import Count

    df_rows = qtf.groupby("tok").aggregate(Count(alias_name="df")).take_all()
    dfs = {r["tok"]: int(r["df"]) for r in df_rows}
    if not dfs:
        return empty
    scale = 1 << idf_scale_bits
    w_map = {t: (n_docs * scale) // df for t, df in dfs.items()}

    # (tok -> [query_ids], W) expansion table: tiny, captured in the closure
    expand = pl.DataFrame(
        {
            "tok": [t for _, t in qterms],
            "query_id": pl.Series([q for q, _ in qterms], dtype=pl.Int64),
        }
    ).filter(pl.col("tok").is_in(list(w_map)))
    w_tbl = pl.DataFrame(
        {"tok": list(w_map), "w": pl.Series(list(w_map.values()), dtype=_I128)}
    )

    def contribs(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        if df.height == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "contrib": pa.array([], pa.int64()),
                }
            )
        df = df.join(expand, on="tok").join(w_tbl, on="tok")
        tf = pl.col("tf").cast(_I128)
        dl = pl.col("dl").cast(_I128)
        num = pl.col("w") * 44 * avgdl * tf
        den = 20 * avgdl * tf + 6 * avgdl + 18 * dl
        df = df.with_columns((num // den).cast(pl.Int64).alias("contrib"))
        return df.select(["query_id", id_col, "contrib"]).to_arrow()

    scored = qtf.map_batches(contribs, batch_format="pyarrow")

    def fold_topk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        if df.height == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score_q": pa.array([], pa.int64()),
                }
            )
        out = (
            df.group_by(["query_id", id_col], maintain_order=True)
            .agg(pl.col("contrib").sum().cast(pl.Int64).alias("score_q"))
            .sort(["query_id", "score_q", id_col], descending=[False, True, False])
            .group_by("query_id", maintain_order=True)
            .head(k)
        )
        return out.to_arrow()

    # equal (query_id, id) keys land in one block after the range sort, so the
    # block-local fold is globally exact; the local top-k then bounds driver
    # traffic to k x nq rows per block.
    local = (
        scored.sort(["query_id", id_col])
        .map_batches(fold_topk, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    heaps: dict[int, list] = {}
    for r in local:
        heaps.setdefault(int(r["query_id"]), []).append(
            (-int(r["score_q"]), int(r[id_col]))
        )
    qids, ids, scores, ranks = [], [], [], []
    for qid in sorted(heaps):
        for rank, (negs, did) in enumerate(heapq.nsmallest(k, heaps[qid]), start=1):
            qids.append(qid)
            ids.append(did)
            scores.append(-negs)
            ranks.append(rank)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            id_col: pa.array(ids, pa.int64()),
            "score_q": pa.array(scores, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
        }
    )


def rrf_fuse(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    queries: list[str],
    *,
    k: int = 10,
    rrf_k: int = 60,
    scale_bits: int = 20,
) -> pa.Table:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. SIGIR'09):
    fuse the per-query BM25 ranking with a query-independent document-quality
    ranking (the hashed-BoW linear classifier — the static-rank signal web
    search fuses with relevance). Integer contract: ``rrf_scaled =
    2^scale_bits // (rrf_k + r_bm25) + 2^scale_bits // (rrf_k + r_quality)``
    — floor divisions only, bit-exact across engines.

    The quality rank of a candidate is its row_number in the FULL corpus
    ordering (score DESC, id ASC), computed distributed: the <= k*|queries|
    candidate (score, id) pairs broadcast once, every block counts its
    documents ranked strictly above each candidate (vectorized comparison
    matrix), and the driver sums nblocks x ncand partial counts — the
    rank-of-selected-rows pattern, no global sort. Returns a driver-safe
    (query_id, doc_id, rrf_scaled, fused_rank) table."""
    import ray as _ray

    from .textstats import classifier_score

    bm = bm25_topk(ds, id_col, text_col, queries, k=k)
    if bm.num_rows == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "rrf_scaled": pa.array([], pa.int64()),
                "fused_rank": pa.array([], pa.int64()),
            }
        )
    scores = classifier_score(ds, id_col, text_col).select_columns(
        [id_col, "score"]
    ).materialize()

    cand_ids = sorted(set(bm[id_col].to_pylist()))
    cand_scores = {
        int(r[id_col]): int(r["score"])
        for batch in scores.map_batches(
            lambda b, _c=pa.array(cand_ids, pa.int64()): b.filter(
                pc.is_in(pc.cast(b[id_col], pa.int64()), value_set=_c)
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        for r in batch.to_pylist()
    }
    missing = [d for d in cand_ids if d not in cand_scores]
    if missing:
        raise ValueError(f"candidates without a quality score: {missing[:3]}")
    cs = np.asarray([cand_scores[d] for d in cand_ids], dtype=np.int64)
    cd = np.asarray(cand_ids, dtype=np.int64)
    ref = _ray.put((cs, cd))

    def above_partials(b: pa.Table) -> pa.Table:
        s, d = _ray.get(ref)
        S = np.asarray(b["score"].to_numpy(zero_copy_only=False), dtype=np.int64)
        D = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        if not len(S):
            return pa.table(
                {"i": pa.array([], pa.int64()), "n_above": pa.array([], pa.int64())}
            )
        gt = (S[:, None] > s[None, :]).sum(axis=0)
        tie = ((S[:, None] == s[None, :]) & (D[:, None] < d[None, :])).sum(axis=0)
        return pa.table(
            {
                "i": pa.array(np.arange(len(s)), pa.int64()),
                "n_above": pa.array((gt + tie).astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    parts = (
        scores.map_batches(above_partials, batch_format="pyarrow")
        .groupby("i")
        .aggregate(_Sum("n_above", alias_name="n_above"))
        .take_all()
    )
    qrank = {int(cd[int(r["i"])]): int(r["n_above"]) + 1 for r in parts}
    scale = 1 << scale_bits

    rows = sorted(
        (
            int(r["query_id"]),
            -(scale // (rrf_k + int(r["rank"])) + scale // (rrf_k + qrank[int(r[id_col])])),
            int(r[id_col]),
        )
        for r in bm.to_pylist()
    )
    qids, dids, fs, fr = [], [], [], []
    prev_q, rank = None, 0
    for q, negf, d in rows:
        rank = rank + 1 if q == prev_q else 1
        prev_q = q
        qids.append(q)
        dids.append(d)
        fs.append(-negf)
        fr.append(rank)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            id_col: pa.array(dids, pa.int64()),
            "rrf_scaled": pa.array(fs, pa.int64()),
            "fused_rank": pa.array(fr, pa.int64()),
        }
    )
