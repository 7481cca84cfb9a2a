"""Training-data operator tests: dedup family, similarity search, text stats,
multimodal plumbing, connected components."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _docs():
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},  # exact dup of 0
        {"doc_id": 2, "text": base.replace("dog", "cat")},  # near dup
        {"doc_id": 3, "text": "completely different content about databases and queries here now"},
        {"doc_id": 4, "text": "another unrelated text mentioning vectors tables and columns often"},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_exact_dedup():
    from r2s2_ray.functions.dedup import exact_dedup

    out = exact_dedup(_docs(), ["text"], "doc_id").to_pandas()
    assert len(out) == 4  # doc 1 collapsed into 0
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])


def test_minhash_finds_near_dups():
    from r2s2_ray.functions.dedup import jaccard_pairs, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs(), "doc_id", "text").to_pandas()
    got = {tuple(p) for p in pairs[["a", "b"]].itertuples(index=False)}
    assert (0, 1) in got  # exact dup always collides
    assert (0, 2) in got or (1, 2) in got  # near dup found
    verified = jaccard_pairs(_docs(), [(0, 1), (0, 2), (0, 3)], "doc_id", "text")
    j = {(a, b): v for a, b, v in verified}
    assert j[(0, 1)] == 1.0
    assert 0.3 < j[(0, 2)] < 1.0
    assert j[(0, 3)] < 0.1


def test_ngram_jaccard_exact_vs_duckdb():
    import duckdb

    from r2s2_ray.functions.dedup import ngram_jaccard_pairs

    got = (
        ngram_jaccard_pairs(_docs(), "doc_id", "text", threshold=0.3)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", _docs().to_pandas())
    want = con.sql("""
        WITH sh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
            FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> len(x) > 0) AS toks
                  FROM documents))),
        cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
                   FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2)
        SELECT a, b, round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
        FROM common JOIN cnt na ON na.doc_id = a JOIN cnt nb ON nb.doc_id = b
        WHERE c * 1.0 / (na.n + nb.n - c) >= 0.3 ORDER BY a, b
    """).df()
    assert got[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist()
    assert np.allclose(got["jaccard"], want["jaccard"])
    assert (1, 0.0) not in got  # sanity: exact dup pair present at j=1
    assert got.set_index(["a", "b"]).loc[(0, 1), "jaccard"] == 1.0


def test_embedding_cosine_pairs_exact():
    from r2s2_ray.functions.dedup import embedding_cosine_pairs_exact

    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + 0.01 * rng.standard_normal(16)).tolist()},
        {"vec_id": 2, "embedding": (-base).tolist()},
        {"vec_id": 3, "embedding": rng.standard_normal(16).tolist()},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = embedding_cosine_pairs_exact(ds, "vec_id", "embedding", threshold=0.95).to_pandas()
    assert {(0, 1)} == {tuple(p) for p in out[["a", "b"]].itertuples(index=False)}
    assert out["cosine"].iloc[0] > 0.99


def test_simhash_close_for_near_dups():
    from r2s2_ray.functions.dedup import simhash

    sigs = {r["doc_id"]: r["simhash"] for r in simhash(_docs(), "doc_id", "text").take_all()}
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(sigs[0], sigs[1]) == 0
    assert ham(sigs[0], sigs[2]) < ham(sigs[0], sigs[3])


def test_embedding_neardup_and_ann():
    from r2s2_ray.functions.dedup import embedding_neardup_pairs
    from r2s2_ray.functions.similarity import brute_force_topk, lsh_topk

    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + 0.01 * rng.standard_normal(16)).tolist()},
        {"vec_id": 2, "embedding": (-base).tolist()},
        {"vec_id": 3, "embedding": rng.standard_normal(16).tolist()},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    pairs = embedding_neardup_pairs(ds, "vec_id", "embedding", threshold=0.95).to_pandas()
    assert {(0, 1)} == {tuple(p) for p in pairs[["a", "b"]].itertuples(index=False)}

    top = brute_force_topk(ds, np.array([base]), "vec_id", "embedding", k=2)
    assert [r["vec_id"] for r in top] == [0, 1]
    approx = lsh_topk(ds, np.array([base]), "vec_id", "embedding", k=2, num_planes=4)
    assert approx[0]["vec_id"] == 0  # the exact vector always survives bucketing


def test_token_stats_and_quality():
    from r2s2_ray.functions.textstats import quality_score, token_stats

    t = token_stats(_docs(), "doc_id", "text").to_pandas().set_index("doc_id")
    assert t.loc[0, "n_tokens"] == 14
    assert t.loc[0, "n_distinct_tokens"] == 13  # "the" twice
    q = quality_score(_docs(), "doc_id", "text").to_pandas().set_index("doc_id")
    assert q.loc[0, "n_spaces"] == 13


def test_langid():
    from r2s2_ray.functions.textstats import lang_id

    rows = [
        {"doc_id": 0, "text": "the cat and the dog of a house"},
        {"doc_id": 1, "text": "der hund und die katze ist ein tier"},
        {"doc_id": 2, "text": "le chat et la maison est une idee"},
        {"doc_id": 3, "text": "这 是 一个 中文 文本 杭州市"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id(ds, "doc_id", "text").take_all()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "zh"


def test_fingerprint_deterministic():
    from r2s2_ray.functions.textstats import fingerprint

    a = {r["doc_id"]: r["fingerprint"] for r in fingerprint(_docs(), "doc_id", "text").take_all()}
    b = {r["doc_id"]: r["fingerprint"] for r in fingerprint(_docs(), "doc_id", "text").take_all()}
    assert a == b
    assert a[0] == a[1] and a[0] != a[3]


def test_multimodal_plumbing():
    from r2s2_ray.functions.multimodal import (
        ImageDecode,
        binary_stats,
        image_features,
        sample_frames,
    )

    rows = [
        {"media_id": i, "media_type": "video", "payload": bytes([i] * 32), "meta": '{"n_frames": 25}'}
        for i in range(4)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    stats = binary_stats(ds, "media_id", "payload").to_pandas()
    assert (stats["n_bytes"] == 32).all()
    feats = image_features(ds).to_pandas()
    assert len(feats.loc[0, "feature"]) == 64
    frames = sample_frames(ds, stride=10).to_pandas()
    assert sorted(frames[frames.media_id == 0]["frame_idx"]) == [0, 10, 20]
    with pytest.raises(NotImplementedError):
        ImageDecode(fake=False)(pa.Table.from_pylist(rows))


def test_td_prepare_composition(tmp_path):
    """Composite corpus prep: kept set passes the quality gate, contains no
    exact-duplicate texts, and drops the larger id of every near-dup pair."""
    import pyarrow.parquet as pq

    from r2s2_ray.pipelines.training_data import prepare_corpus

    base = "word " * 60
    rows = [
        {"doc_id": 0, "text": base + "alpha beta gamma"},
        {"doc_id": 1, "text": base + "alpha beta gamma"},  # exact dup of 0
        {"doc_id": 2, "text": base + "alpha beta delta"},  # near dup of 0
        {"doc_id": 3, "text": "completely different content about ships and stars " * 5},
        {"doc_id": 4, "text": "x"},  # fails min_tokens
        {"doc_id": 5, "text": "123 456 789 000 111"},  # no alpha
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    kept = sorted(r["doc_id"] for r in prepare_corpus(str(tmp_path)).take_all())
    assert 0 in kept and 3 in kept
    assert 1 not in kept  # exact dup dropped
    assert 2 not in kept  # near dup dropped
    assert 4 not in kept and 5 not in kept  # quality gate


def test_td_prepare_distributed_anti_join(tmp_path):
    """High-dup corpus: the distributed anti-join path (broadcast_max=0) must
    keep exactly the same doc ids as the broadcast path — the web-scale guard
    (VERDICT r2: a 30-50%-near-dup corpus makes the pair list driver-unsized)
    cannot change results."""
    import pyarrow.parquet as pq

    from r2s2_ray.pipelines.training_data import prepare_corpus

    base = "common shared boilerplate text repeated across the corpus " * 8
    rows = []
    # 40 near-dup clusters of 5 docs each + 50 unique docs
    for c in range(40):
        for i in range(5):
            rows.append({"doc_id": c * 5 + i, "text": base + f"cluster {c} tail {'x' * i}"})
    for u in range(50):
        rows.append({"doc_id": 1000 + u, "text": f"unique document number {u} " + "verbiage distinct " * (u % 7 + 3)})
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    broadcast = sorted(r["doc_id"] for r in prepare_corpus(str(tmp_path)).take_all())
    dist = sorted(
        r["doc_id"] for r in prepare_corpus(str(tmp_path), broadcast_max=0).take_all()
    )
    assert dist == broadcast
    # the corpus is dominated by near-dup mass: most docs must drop, some survive
    assert 0 < len(broadcast) < 100


def test_connected_components():
    from r2s2_ray.linking import connected_components

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["a", "b", "x", "y"]),
                "dst": pa.array(["b", "c", "y", "z"]),
            }
        )
    )
    labels = {r["node"]: r["label"] for r in connected_components(edges).take_all()}
    assert labels["a"] == labels["b"] == labels["c"] == "a"
    assert labels["x"] == labels["y"] == labels["z"] == "x"


def test_connected_components_distributed_matches_broadcast():
    import random

    from r2s2_ray.functions.graph import connected_components_distributed
    from r2s2_ray.linking import connected_components

    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(30)]
    edges = []
    # chains + a ring (small diameter: per-round shuffle cost dominates in CI)
    for c in range(6):
        members = nodes[c * 5 : (c + 1) * 5]
        rng.shuffle(members)
        edges += list(zip(members, members[1:]))
        if c % 3 == 0:
            edges.append((members[-1], members[0]))  # ring
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges]),
            "dst": pa.array([b for _, b in edges]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    want = {r["node"]: r["label"] for r in connected_components(ds).take_all()}
    got = {r["node"]: r["label"] for r in connected_components_distributed(ds).take_all()}
    assert got == want


def test_audio_frames_windowing():
    from r2s2_ray.functions.multimodal import AudioFrames, audio_frames

    rows = [
        {"media_id": i, "media_type": "audio", "payload": bytes([i] * 64), "meta": '{"n_samples": 880}'}
        for i in range(3)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = audio_frames(ds, win=400, hop=160).to_pandas()
    # 880 samples, win 400 hop 160 -> starts at 0,160,320,480 -> 4 frames/doc
    assert sorted(out[out.media_id == 0]["frame_idx"]) == [0, 1, 2, 3]
    assert (out["energy"] > 0).all()
    # deterministic across runs
    out2 = audio_frames(ds, win=400, hop=160).to_pandas()
    assert out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True).equals(
        out2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    )
    with pytest.raises(NotImplementedError):
        AudioFrames(fake=False)(pa.Table.from_pylist(rows))


def test_poly_hash_arr_matches_scalar_reference():
    from r2s2_ray.functions.hashing import poly_hash_arr, poly_hash_one

    cases = [
        ["ab", ""],                      # trailing empty after non-empty (ADVICE r2 bug)
        ["", "ab"],
        ["ab", "", ""],
        ["", "", ""],
        ["a", "bc", "", "def", ""],
        ["héllo", "世界", ""],           # multibyte UTF-8
        [],
    ]
    for strings in cases:
        got = poly_hash_arr(pa.array(strings, type=pa.string()))
        want = np.array([poly_hash_one(s) for s in strings], dtype=np.uint64)
        assert got.tolist() == want.tolist(), strings


def test_exact_cosine_blocked_matches_broadcast():
    """Above the broadcast guard the exact path switches to blocked chunk-pair
    tasks — still EXACT: identical pair set and cosines as the broadcast
    matmul on the same corpus (no silent LSH recall loss)."""
    from r2s2_ray.functions.dedup import embedding_cosine_pairs_exact

    rng = np.random.default_rng(7)
    base = rng.standard_normal((8, 12))
    rows = [
        {"vec_id": i, "embedding": (base[i % 8] + 0.02 * rng.standard_normal(12)).tolist()}
        for i in range(90)
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))

    def norm(res):
        df = res.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        return [(int(r.a), int(r.b), round(float(r.cosine), 6)) for r in df.itertuples()]

    broadcast = norm(embedding_cosine_pairs_exact(ds, "vec_id", "embedding", threshold=0.9))
    import r2s2_ray.functions.dedup as dd

    old = dd._EXACT_CHUNK_ROWS
    dd._EXACT_CHUNK_ROWS = 16  # force several chunks
    try:
        blocked = norm(
            embedding_cosine_pairs_exact(
                ds, "vec_id", "embedding", threshold=0.9, max_rows=10
            )
        )
    finally:
        dd._EXACT_CHUNK_ROWS = old
    assert blocked == broadcast and len(blocked) > 50


def test_frame_sampler_vectorized_expansion():
    """FrameSampler's strided row-expansion: ceil(n/stride) rows per input,
    zero-frame and null-meta rows emit nothing, indices are multiples of the
    stride below the declared count."""
    from r2s2_ray.functions.multimodal import FrameSampler

    fs = FrameSampler(stride=10)
    b = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "meta": ['{"n_frames": 25}', '{"n_frames": 0}', None, '{"n_frames": 10}'],
        }
    )
    t = fs(b)
    assert list(zip(t["media_id"].to_pylist(), t["frame_idx"].to_pylist())) == [
        (1, 0), (1, 10), (1, 20), (4, 0),
    ]
    empty = fs(pa.table({"media_id": pa.array([], pa.int64()), "meta": pa.array([], pa.string())}))
    assert empty.num_rows == 0 and empty.column_names == ["media_id", "frame_idx"]


def test_pii_scrub_counts_and_redaction():
    """Counts taken on the original text; email -> ip -> phone replaced in
    order; PII-free text passes through unchanged."""
    from r2s2_ray.functions.textstats import pii_scrub

    rows = [
        {"doc_id": 0, "text": "mail a@b.co and c@d.org ip 10.0.0.1 tel +41791234567"},
        {"doc_id": 1, "text": "nothing sensitive here"},
    ]
    out = (
        pii_scrub(ray.data.from_arrow(pa.Table.from_pylist(rows)), "doc_id", "text")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.loc[0, ["n_emails", "n_ips", "n_phones"]]) == [2, 1, 1]
    assert out.loc[0, "clean_text"] == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE>"
    assert list(out.loc[1, ["n_emails", "n_ips", "n_phones"]]) == [0, 0, 0]
    assert out.loc[1, "clean_text"] == "nothing sensitive here"


def test_token_chunks_window_boundaries():
    """5 tokens at chunk_size=2 -> windows of 2/2/1; empty text -> one
    single-empty-token chunk (string_split semantics, matches the oracle)."""
    from r2s2_ray.functions.textstats import token_chunks

    rows = [{"doc_id": 7, "text": "a b c d e"}, {"doc_id": 8, "text": ""}]
    out = (
        token_chunks(
            ray.data.from_arrow(pa.Table.from_pylist(rows)), "doc_id", "text", chunk_size=2
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    got = list(out.itertuples(index=False, name=None))
    assert got == [
        (7, 0, 2, "a b"),
        (7, 1, 2, "c d"),
        (7, 2, 1, "e"),
        (8, 0, 1, ""),
    ]


def test_asof_join_backward_with_gaps():
    """Left rows before any right row keep nulls; matches pick the LATEST
    right row at-or-before the left timestamp, per group."""
    from datetime import datetime as dt

    from r2s2_ray.relational import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "user_id": pa.array([10, 10, 10, 20], pa.int64()),
                "ts": pa.array(
                    [dt(2024, 1, 1, 0), dt(2024, 1, 1, 6), dt(2024, 1, 1, 12), dt(2024, 1, 1, 6)],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([100, 101], pa.int64()),
                "user_id": pa.array([10, 10], pa.int64()),
                "ts": pa.array([dt(2024, 1, 1, 5), dt(2024, 1, 1, 6)], pa.timestamp("us")),
            }
        )
    )
    out = (
        asof_join(left, right, on="ts", by="user_id", right_cols=["event_id"], suffix="_view", num_buckets=4)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert out.loc[1].isna()["event_id_view"]  # before any view
    assert out.loc[2, "event_id_view"] == 101  # exact-time match wins (<=)
    assert out.loc[3, "event_id_view"] == 101  # latest prior
    assert out.loc[4].isna()["event_id_view"]  # user 20 has no views


def test_stratified_split_deterministic_and_leak_free():
    """Exact duplicate text lands in the same split; labels derive from the
    content-hash bucket thresholds."""
    from r2s2_ray.functions.textstats import stratified_split

    rows = [{"doc_id": i, "text": f"document number {i % 7}"} for i in range(50)]
    out = (
        stratified_split(ray.data.from_arrow(pa.Table.from_pylist(rows)), "doc_id", "text")
        .to_pandas()
    )
    # duplicates (same i%7 text) always share bucket+split
    for _, grp in out.assign(key=[r["text"] for r in rows]).groupby("key"):
        assert grp["split"].nunique() == 1 and grp["bucket"].nunique() == 1
    assert ((out["bucket"] >= 0) & (out["bucket"] < 100)).all()
    lab = out.apply(
        lambda r: "test" if r["bucket"] < 5 else ("val" if r["bucket"] < 10 else "train"), axis=1
    )
    assert (lab == out["split"]).all()


def test_sequence_pack_prefix_sum():
    """Global prefix-sum packing: pack boundaries land where the running
    token count crosses the budget, across bucket boundaries."""
    from r2s2_ray.functions.textstats import sequence_pack

    # 10 docs x 7 tokens, budget 16: prefixes 0,7,14,21,... -> packs 0,0,0,1,1,2,...
    rows = [{"doc_id": i, "text": " ".join(["tok"] * 7)} for i in range(10)]
    out = (
        sequence_pack(
            ray.data.from_arrow(pa.Table.from_pylist(rows)),
            "doc_id",
            "text",
            budget=16,
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    prefix = [7 * i for i in range(10)]
    assert out["n_tokens"].tolist() == [7] * 10
    assert out["pack_id"].tolist() == [p // 16 for p in prefix]
    assert out["pack_offset"].tolist() == [p % 16 for p in prefix]


def test_hash_join_inner_left_and_collision_guard():
    """hash_join: inner drops unmatched, left keeps them with nulls, right
    column name collisions are rejected up front."""
    import pytest

    from r2s2_ray.relational import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "lv": pa.array([10, 20, 30], pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1, 3], pa.int64()), "rv": pa.array([7, 8, 9], pa.int64())})
    )
    inner = (
        hash_join(left, right, on="k", right_cols=["rv"], num_buckets=4)
        .to_pandas()
        .sort_values(["k", "rv"])
    )
    assert list(inner.itertuples(index=False, name=None)) == [(1, 10, 7), (1, 10, 8), (3, 30, 9)]
    lj = hash_join(left, right, on="k", right_cols=["rv"], num_buckets=4, how="left").to_pandas()
    assert len(lj) == 4 and lj.loc[lj["k"] == 2, "rv"].isna().all()
    with pytest.raises(ValueError, match="collide"):
        hash_join(left, right.map_batches(lambda b: b.rename_columns(["k", "lv"]), batch_format="pyarrow"), on="k", right_cols=["lv"])


def test_repetition_signals_counts():
    """Integer repetition signals match hand counts, empty documents keep a
    zero row, and every count column is int64 (oracle hash contract)."""
    from r2s2_ray.functions.textstats import repetition_signals

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a b\nc d\na b\n\na b", "x x x y", "", "one two"],
        }
    )
    out = repetition_signals(ray.data.from_arrow(t), "doc_id", "text").take_all()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 4
    # doc 1: 4 non-empty lines, "a b" repeats twice beyond the first
    assert rows[1]["n_lines"] == 4 and rows[1]["n_dup_lines"] == 2
    # words split on SPACE only ("b\nc" is one token) — 5 tokens, none dup
    assert rows[1]["n_words"] == 5 and rows[1]["n_dup_words"] == 0
    # doc 2: bigrams "x x","x x","x y" -> 3 total, top count 2
    assert rows[2]["n_bigrams"] == 3 and rows[2]["top_bigram_n"] == 2
    assert rows[2]["n_dup_words"] == 2
    # empty doc keeps a row of zeros
    assert rows[3] == {
        "doc_id": 3, "n_lines": 0, "n_dup_lines": 0, "n_words": 0,
        "n_dup_words": 0, "n_bigrams": 0, "top_bigram_n": 0,
    }
    assert rows[4]["n_bigrams"] == 1 and rows[4]["top_bigram_n"] == 1


def test_contamination_broadcast_matches_distributed():
    """The broadcast (small benchmark) and distributed (hash-join) paths of
    contamination_flags agree row-for-row, benchmark docs are excluded, and
    shingle-less (short) docs keep an uncontaminated row."""
    from r2s2_ray.functions.dedup import contamination_flags

    texts = {
        0: "alpha beta gamma delta epsilon zeta",       # benchmark (id % 3 == 0)
        1: "alpha beta gamma delta epsilon eta",        # shares 2 5-shingles? no — 1
        2: "totally different words here now folks",
        3: "benchmark two text goes here okay",          # benchmark
        4: "short doc",                                  # < 5 words: no shingles
        5: "zz alpha beta gamma delta epsilon yy",       # shares interior shingle
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": [texts[k] for k in sorted(texts)],
        }
    )
    ds = ray.data.from_arrow(t)
    a = sorted(
        contamination_flags(ds, "doc_id", "text", bench_mod=3).take_all(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        contamination_flags(ds, "doc_id", "text", bench_mod=3, broadcast_max=0).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert a == b
    ids = [r["doc_id"] for r in a]
    assert ids == [1, 2, 4, 5]  # benchmark ids 0/3 excluded
    by = {r["doc_id"]: r for r in a}
    # doc 1 shares the shingle "alpha beta gamma delta epsilon" with doc 0
    assert by[1]["contaminated"] == 1 and by[1]["n_shared"] == 1
    assert by[2] == {"doc_id": 2, "n_shared": 0, "contaminated": 0}
    assert by[4] == {"doc_id": 4, "n_shared": 0, "contaminated": 0}
    assert by[5]["contaminated"] == 1 and by[5]["n_shared"] == 1


def test_substring_dup_pairs_witness_and_cap():
    """Exact substring pairs: a shared >=k-char span is found through its
    k-gram witness windows regardless of alignment; disjoint texts produce no
    pair; max_bucket drops a boilerplate bucket (documented recall cap)."""
    from r2s2_ray.functions.dedup import substring_dup_pairs

    boiler = "COMMON-BOILERPLATE-FOOTER-TEXT"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "unique prefix one THIS-SHARED-SPAN-IS-LONG tail x",
                "other lead-in text THIS-SHARED-SPAN-IS-LONG suffix",
                "totally unrelated content with nothing shared at all",
                "first boiler doc " + boiler,
                "second boiler doc " + boiler,
            ],
        }
    )
    ds = ray.data.from_arrow(t)
    pairs = sorted(
        tuple(sorted((r["a"], r["b"])))
        for r in substring_dup_pairs(ds, "doc_id", "text", min_len=20).take_all()
    )
    assert pairs == [(1, 2), (4, 5)]
    # shorter-than-k docs are shingle-less and never pair
    t2 = pa.table({"doc_id": pa.array([9], pa.int64()), "text": ["short"]})
    assert substring_dup_pairs(ray.data.from_arrow(t2), "doc_id", "text").take_all() == []
    # cap: every bucket here has size 2, so max_bucket=1 drops all pairs
    capped = substring_dup_pairs(ds, "doc_id", "text", min_len=20, max_bucket=1).take_all()
    assert capped == []


def test_ivf_topk_probes_and_full_probe_equals_exact():
    """IVF-flat ANN: probing every list reproduces the exact brute-force
    top-k; probing few lists returns <= k rows per query from the probed
    partition only (partition pruning, the approximation knob)."""
    import numpy as np

    from r2s2_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(80, 16)).astype(np.float64)
    t = pa.table(
        {
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(t)
    q = vecs[:3]
    exact = brute_force_topk(ds, q, "vec_id", "embedding", k=4)
    full = ivf_topk(ds, q, "vec_id", "embedding", k=4, n_centroids=8, nprobe=8)
    assert full == exact
    few = ivf_topk(ds, q, "vec_id", "embedding", k=4, n_centroids=8, nprobe=1)
    assert few == ivf_topk(ds, q, "vec_id", "embedding", k=4, n_centroids=8, nprobe=1)
    per_q: dict = {}
    for r in few:
        per_q.setdefault(r["qid"], []).append(r)
    # each query still finds itself (cos=1 with its own corpus row lives in
    # the probed nearest list by construction)
    for qi in range(3):
        assert per_q[qi][0]["vec_id"] == qi and abs(per_q[qi][0]["cosine"] - 1) < 1e-12


def test_neardup_clusters_composite():
    """MinHash pairs -> distributed CC -> per-doc cluster ids: near-identical
    docs share the min-id cluster, unrelated docs are singleton clusters, and
    a corpus with no candidate pairs takes the own-cluster fast path."""
    from r2s2_ray.functions.dedup import neardup_clusters

    dup = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [dup, dup, dup + " tail", "completely different words entirely here"],
        }
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(ray.data.from_arrow(t), "doc_id", "text").take_all()
    }
    assert out[1] == 1 and out[2] == 1 and out[3] == 1 and out[4] == 4
    # the distributed-CC path (forced past the union-find guard) agrees
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(
            ray.data.from_arrow(t), "doc_id", "text", cc_broadcast_max=0
        ).take_all()
    }
    assert dist == out
    t2 = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": ["alpha beta gamma delta epsilon", "one two three four five six"],
        }
    )
    out2 = {
        r["doc_id"]: r["cluster_id"]
        for r in neardup_clusters(ray.data.from_arrow(t2), "doc_id", "text").take_all()
    }
    assert out2 == {7: 7, 8: 8}


def test_training_shuffle_dense_deterministic():
    """training_shuffle assigns a dense 0..n-1 permutation, identical across
    runs and block layouts, and different from the id order (it actually
    shuffles)."""
    from r2s2_ray.functions.textstats import training_shuffle

    t = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    a = {r["doc_id"]: r["shuffle_rank"] for r in training_shuffle(ray.data.from_arrow(t), "doc_id").take_all()}
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in training_shuffle(ray.data.from_arrow(t).repartition(7), "doc_id").take_all()}
    assert a == b
    assert sorted(a.values()) == list(range(100))
    assert [a[i] for i in range(100)] != list(range(100))


def test_hll_distinct_accuracy():
    """The HLL sketch estimate lands within the expected m=64 error band
    (~1.04/sqrt(64) = 13% sigma) of the true distinct count, and the
    construction is deterministic across block layouts."""
    import numpy as np
    import pyarrow.parquet as pq

    from r2s2_ray.relational import q_hll_distinct

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r["hll_estimate"] for r in q_hll_distinct(sf).take_all()}
    t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    import collections
    truth = collections.defaultdict(set)
    for et, uid in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        truth[et].add(uid)
    assert set(got) == set(truth)
    for et, est in got.items():
        n = len(truth[et])
        assert 0.55 * n <= est <= 1.8 * n, (et, est, n)
    again = {r["event_type"]: r["hll_estimate"] for r in q_hll_distinct(sf).take_all()}
    assert again == got


def test_heavy_hitters_cms_one_sided():
    """CMS point estimates are one-sided: cms_n >= true_n for every reported
    key (collisions only inflate), and keys whose count dominates the
    epsilon*N collision mass are estimated exactly."""
    from r2s2_ray.relational import q_heavy_hitters

    t = q_heavy_hitters("/root/testdata/sf0.001")
    true_n = t["true_n"].to_pylist()
    cms_n = t["cms_n"].to_pylist()
    assert len(true_n) == 10
    assert all(c >= tn for c, tn in zip(cms_n, true_n))
    # sorted output: counts non-increasing
    assert true_n == sorted(true_n, reverse=True)


def test_bloom_semijoin_one_sided_and_tight():
    """Bloom prefilter: pass count >= true-match count per group (one-sided),
    and with 4096 bits over a few hundred build keys the false-positive mass
    stays a small fraction of the probe side."""
    from r2s2_ray.relational import q_bloom_semijoin

    rows = q_bloom_semijoin("/root/testdata/sf0.001").take_all()
    assert rows
    tot_orders = sum(r["n_orders"] for r in rows)
    tot_pass = sum(r["n_bloom_pass"] for r in rows)
    tot_true = sum(r["n_true_match"] for r in rows)
    for r in rows:
        assert r["n_bloom_pass"] >= r["n_true_match"]
        assert r["n_orders"] >= r["n_bloom_pass"]
    # the filter actually filters: false positives are a small minority of
    # the non-matching probe mass
    assert (tot_pass - tot_true) <= 0.2 * (tot_orders - tot_true)


def test_budget_sample_prefix_of_shuffle_order():
    """budget_sample keeps exactly the longest prefix of the deterministic
    shuffle order whose inclusive token sum fits the budget."""
    from r2s2_ray.functions.textstats import budget_sample, training_shuffle

    t = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": [" ".join(["w"] * (3 + i % 5)) for i in range(30)],
        }
    )
    ds = ray.data.from_arrow(t)
    rows = {r["doc_id"]: r for r in budget_sample(ds, "doc_id", "text", budget=40).take_all()}
    order = sorted(
        (r["shuffle_rank"], r["doc_id"])
        for r in training_shuffle(ds, "doc_id").take_all()
    )
    run = 0
    for _, did in order:
        run += rows[did]["n_tokens"]
        assert rows[did]["keep"] == (1 if run <= 40 else 0)
    kept_tokens = sum(r["n_tokens"] for r in rows.values() if r["keep"])
    assert kept_tokens <= 40


def test_rare_terms_broadcast_matches_join():
    """rare_terms: rank 0 is each doc's lowest-df token (ties by token), and
    the broadcast-df and distributed hash_join paths agree exactly."""
    from r2s2_ray.functions.textstats import rare_terms

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "common shared words unique1",
                "common shared words unique2",
                "common other tail unique3",
            ],
        }
    )
    ds = ray.data.from_arrow(t)
    a = sorted(
        (r["doc_id"], r["rank"], r["tok"], r["df"])
        for r in rare_terms(ds, "doc_id", "text").take_all()
    )
    b = sorted(
        (r["doc_id"], r["rank"], r["tok"], r["df"])
        for r in rare_terms(ds, "doc_id", "text", broadcast_max=0).take_all()
    )
    assert a == b
    by = {(d, rk): (tok, df) for d, rk, tok, df in a}
    assert by[(1, 0)] == ("unique1", 1)
    assert by[(2, 0)] == ("unique2", 1)
    assert by[(3, 0)] == ("other", 1)  # tie on df=1 broken by token
    # every doc contributes exactly k=3 rows (docs have >= 3 distinct tokens)
    assert len(a) == 9


def test_lm_surprisal_exact_and_paths_agree():
    """lm_surprisal: surprisal_bits matches a direct integer reference
    (floor-log2 per token, summed with multiplicity), xent_nats matches the
    float cross-entropy to 1e-12, and the broadcast and distributed
    hash_join paths agree exactly."""
    import math

    from r2s2_ray.functions.textstats import lm_surprisal

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "aa aa bb",
                "aa bb cc cc",
                "dd",
            ],
        }
    )
    # corpus counts: aa=3 bb=2 cc=2 dd=1, N=8 -> floor(log2): N=3, aa=1,
    # bb=1, cc=1, dd=0
    expect_bits = {1: (3, (3 - 1) * 2 + (3 - 1)), 2: (4, 8), 3: (1, 3)}
    counts = {"aa": 3, "bb": 2, "cc": 2, "dd": 1}
    docs = {1: ["aa", "aa", "bb"], 2: ["aa", "bb", "cc", "cc"], 3: ["dd"]}

    ds = ray.data.from_arrow(t)
    rows = {r["doc_id"]: r for r in lm_surprisal(ds, "doc_id", "text").take_all()}
    for d, (n, bits) in expect_bits.items():
        assert rows[d]["n_tokens"] == n
        assert rows[d]["surprisal_bits"] == bits
        ref = sum(math.log(8) - math.log(counts[tok]) for tok in docs[d]) / n
        assert abs(rows[d]["xent_nats"] - ref) < 1e-12
    dist = {
        r["doc_id"]: r
        for r in lm_surprisal(ds, "doc_id", "text", broadcast_max=0).take_all()
    }
    assert {
        d: (r["n_tokens"], r["surprisal_bits"]) for d, r in rows.items()
    } == {d: (r["n_tokens"], r["surprisal_bits"]) for d, r in dist.items()}
    for d in rows:
        assert abs(rows[d]["xent_nats"] - dist[d]["xent_nats"]) < 1e-12


def test_kmeans_matches_local_reference():
    """kmeans: the distributed integer-exact Lloyd iterations match a
    single-process NumPy reference of the same contract (quantize ->
    lowest-id init -> argmin assignment -> round-half-up integer mean,
    empty clusters keep their centroid) on a multi-block input."""
    import numpy as np

    from r2s2_ray.functions.similarity import kmeans

    rng = np.random.default_rng(7)
    n, dim, k, iters, bits = 120, 8, 4, 3, 20
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(6)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(ds, "vec_id", "embedding", k=k, n_iters=iters,
                        scale_bits=bits).take_all()
    }

    X = np.floor(vecs.astype(np.float64) * (1 << bits) + 0.5).astype(np.int64)
    order = np.argsort(ids)
    cent = X[order[:k]].copy()

    def assign(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        a = assign(cent)
        for c in range(k):
            m = a == c
            if m.any():
                s, cnt = X[m].sum(axis=0), int(m.sum())
                cent[c] = (2 * s + cnt) // (2 * cnt)
    want = assign(cent)
    assert got == {int(i): int(c) for i, c in zip(ids, want)}
    assert len(set(got.values())) > 1  # the clustering is non-trivial


def test_bm25_topk_matches_integer_reference():
    """bm25_topk: scores match a pure-Python implementation of the documented
    integer contract (scaled multiplicative idf, k1=6/5 b=3/4 saturation,
    floors in the stated places), ranks are deterministic on ties, and
    queries with no corpus hit yield no rows."""
    from r2s2_ray.functions.retrieval import bm25_topk, query_terms

    docs = {
        1: "red fox jumps over the lazy dog",
        2: "red red red wine",
        3: "the quick brown fox",
        4: "lazy summer day with the dog and the fox",
        5: "wine and dine",
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": [docs[d] for d in sorted(docs)],
        }
    )
    queries = ["red fox", "lazy dog wine", "zebra"]
    got = bm25_topk(
        ray.data.from_arrow(t).repartition(3), "doc_id", "text", queries, k=3
    ).to_pylist()

    # pure-Python reference of the same contract
    toks = {d: [w for w in s.lower().split()] for d, s in docs.items()}
    dl = {d: len(ws) for d, ws in toks.items()}
    n = len(docs)
    avgdl = max(1, sum(dl.values()) // n)
    df = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    expect = []
    for qid, q in enumerate(queries):
        scores = {}
        terms = [tok for i, tok in query_terms([q])]
        for d, ws in toks.items():
            s = 0
            for term in terms:
                tf = ws.count(term)
                if tf == 0 or term not in df:
                    continue
                w_t = (n << 10) // df[term]
                s += (w_t * 44 * avgdl * tf) // (
                    20 * avgdl * tf + 6 * avgdl + 18 * dl[d]
                )
            if s > 0:
                scores[d] = s
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (d, s) in enumerate(best, start=1):
            expect.append((qid, d, s, rank))
    assert [(r["query_id"], r["doc_id"], r["score_q"], r["rank"]) for r in got] == expect
    assert all(r["query_id"] != 2 for r in got)  # zebra: no corpus hit


def test_dsir_weights_matches_integer_reference():
    """dsir_weights: matches a pure-Python mirror of the documented contract
    (poly-hash feature buckets, +1-smoothed target/raw counts, whole-bit
    log-ratio) on a multi-block corpus with a real target/raw split."""
    from r2s2_ray.functions.hashing import poly_hash_one
    from r2s2_ray.functions.textstats import dsir_weights

    docs = {
        1: ("the quick brown fox", "en"),
        2: ("der schnelle braune fuchs", "de"),
        3: ("the lazy dog sleeps", "en"),
        4: ("fox and dog and fox", "de"),
        5: ("the the the", "en"),
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": [docs[d][0] for d in sorted(docs)],
            "lang": [docs[d][1] for d in sorted(docs)],
        }
    )
    B = 64
    got = {
        r["doc_id"]: (r["n_features"], r["weight_bits"])
        for r in dsir_weights(
            ray.data.from_arrow(t).repartition(3), "doc_id", "text", num_buckets=B
        ).take_all()
    }

    def feats(s):
        ws = s.lower().split()
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    dcb = {}
    for d, (s, lang) in docs.items():
        for f in feats(s):
            b = poly_hash_one(f) % B
            dcb[(d, b)] = dcb.get((d, b), 0) + 1
    cr, ct = {}, {}
    for (d, b), c in dcb.items():
        cr[b] = cr.get(b, 0) + c
        if docs[d][1] == "en":
            ct[b] = ct.get(b, 0) + c
    nr = sum(cr.values()) + B
    nt = sum(ct.values()) + B
    expect = {}
    for (d, b), c in dcb.items():
        lam = (
            (ct.get(b, 0) + 1).bit_length()
            - nt.bit_length()
            - (cr[b] + 1).bit_length()
            + nr.bit_length()
        )
        n, w = expect.get(d, (0, 0))
        expect[d] = (n + c, w + c * lam)
    assert got == expect


def test_classifier_score_matches_pure_python(ray_session):
    """classifier_score == a per-doc pure-Python rendering of the same
    contract: weight(b) = ((b*K_A + K_B mod 2^64) >> 4) % 17 - 8 over
    poly_hash(token) & 255 buckets, summed per doc; keep = score >= 0."""
    import ray.data

    from r2s2_ray.functions.hashing import K_A, K_B, poly_hash_one
    from r2s2_ray.functions.textstats import classifier_score

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spark spark spark spark"),
        (3, ""),  # zero tokens -> dropped
        (4, "Mixed CASE tokens 123 and-punct!"),
        (5, "a b c d e f g h i j k l m n o p"),
    ]
    want = {}
    for did, text in docs:
        import re

        toks = re.findall(r"[a-z0-9]+", text.lower())
        if not toks:
            continue
        s = 0
        for t in toks:
            b = poly_hash_one(t) & 255
            s += int(((b * K_A + K_B) % (1 << 64)) >> 4) % 17 - 8
        want[did] = (s, int(s >= 0))

    ds = ray.data.from_items([{"doc_id": d, "text": t} for d, t in docs])
    got = {
        r["doc_id"]: (r["score"], r["keep"])
        for r in classifier_score(ds, "doc_id", "text").take_all()
    }
    assert got == want


def test_chunk_dedup_keep_first_and_reassembly(ray_session):
    """chunk_dedup: global keep-first on exact chunk text, in-document
    duplicate windows drop too, fully-duplicated docs survive as empty rows,
    and surviving chunks reassemble in chunk_idx order."""
    import ray.data

    from r2s2_ray.functions.dedup import chunk_dedup

    w = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    shared = w(4, "s")  # one full 4-token window shared across docs
    docs = [
        # doc 1: unique A + shared window
        {"doc_id": 1, "text": w(4, "a") + " " + shared},
        # doc 2: shared window (dropped: doc 1 owns it) + unique B
        {"doc_id": 2, "text": shared + " " + w(4, "b")},
        # doc 3: the SAME window twice in one doc -> second drops
        {"doc_id": 3, "text": w(4, "c") + " " + w(4, "c")},
        # doc 4: nothing but the shared window -> fully deduplicated
        {"doc_id": 4, "text": shared},
    ]
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"], r["n_total"])
        for r in chunk_dedup(
            ray.data.from_items(docs), "doc_id", "text", chunk_size=4
        ).take_all()
    }
    assert out[1] == (w(4, "a") + " " + shared, 2, 2)
    assert out[2] == (w(4, "b"), 1, 2)
    assert out[3] == (w(4, "c"), 1, 2)
    assert out[4] == ("", 0, 1)


def test_render_dialogs_cross_block_order(ray_session):
    """render_dialogs stitches a conversation whose turns arrive shuffled
    across MANY blocks, in strict turn_idx order."""
    import ray.data

    from r2s2_ray.pipelines.training_data import render_dialogs

    rows = []
    for conv in ("c1", "c2"):
        for i in (3, 0, 2, 1):  # shuffled on purpose
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": i,
                    "role": "user" if i % 2 == 0 else "assistant",
                    "text": f"{conv}-t{i}",
                    "tool": "",
                }
            )
    ds = ray.data.from_items(rows).repartition(8)  # turns split across blocks
    got = {r["conv_id"]: r for r in render_dialogs(ds).take_all()}
    for conv in ("c1", "c2"):
        want = "\n".join(
            f"{'user' if i % 2 == 0 else 'assistant'}: {conv}-t{i}" for i in range(4)
        )
        assert got[conv]["rendered"] == want
        assert got[conv]["n_turns"] == 4
        assert got[conv]["n_chars"] == len(want)


def test_filter_chain_bits(ray_session):
    """filter_chain: each rule's bit fires on a doc crafted to trip exactly
    it (modulo the classifier, whose sign is data-dependent — asserted via
    the shared weight contract), and a clean long document keeps."""
    import re

    import ray.data

    from r2s2_ray.functions.hashing import K_A, K_B, poly_hash_one
    from r2s2_ray.functions.textstats import filter_chain

    def cls_bit(text: str) -> int:
        s = 0
        for t in re.findall(r"[a-z0-9]+", text.lower()):
            b = poly_hash_one(t) & 255
            s += int(((b * K_A + K_B) % (1 << 64)) >> 4) % 17 - 8
        return 16 if s < 0 else 0

    # 30 distinct fully-alphabetic words -> not short, high alpha ratio,
    # no dups, bigrams all unique
    al = "abcdefghij"
    clean = " ".join(f"{al[i // 10]}{al[i % 10]}z" for i in range(30))
    short = "one two three"
    low_alpha = "1 2 3 4 5 6 7 8 9 0 " * 4  # digits tokenize but aren't alpha
    # >20% duplicate words, still 30 tokens
    repet = " ".join(["dup"] * 12 + [f"u{i}q" for i in range(18)])
    # one bigram dominating: "ab cd ab cd ..." (top pair > 10% of >= 10)
    spam = " ".join(["ab", "cd"] * 15)

    docs = [
        {"doc_id": 1, "text": clean},
        {"doc_id": 2, "text": short},
        {"doc_id": 3, "text": low_alpha},
        {"doc_id": 4, "text": repet},
        {"doc_id": 5, "text": spam},
    ]
    got = {
        r["doc_id"]: (r["reasons"], r["keep"])
        for r in filter_chain(ray.data.from_items(docs), "doc_id", "text").take_all()
    }
    assert got[1] == (cls_bit(clean), 1 if cls_bit(clean) == 0 else 0)
    assert got[2][0] & 1  # too short
    assert got[3][0] & 2  # low alpha ratio
    assert got[4][0] & 4 and not got[4][0] & 1  # repetitive, not short
    assert got[5][0] & 8  # bigram spam
    for did in (2, 3, 4, 5):
        assert got[did][1] == 0


def test_funnel_strict_ordering(ray_session, tmp_path):
    """q_funnel: stage k counts only users whose stage-k event happens
    strictly AFTER their first stage-(k-1) completion — crafted users drop
    out at every stage, including the view-BEFORE-signup trap."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from r2s2_ray.relational import q_funnel

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, uid, offset_min, typ):
        return {
            "event_id": i,
            "ts": t0 + dt.timedelta(minutes=offset_min),
            "user_id": uid,
            "event_type": typ,
            "value": 1.0,
            "props": "{}",
        }

    rows = [
        # u1: full funnel in order
        ev(1, 1, 0, "signup"), ev(2, 1, 10, "view"), ev(3, 1, 20, "purchase"),
        # u2: view BEFORE signup only -> counts for signup, NOT view
        ev(4, 2, 0, "view"), ev(5, 2, 10, "signup"),
        # u3: signup + view, purchase BEFORE view -> not counted at stage 3
        ev(6, 3, 0, "signup"), ev(7, 3, 5, "purchase"), ev(8, 3, 10, "view"),
        # u4: never signs up -> appears nowhere
        ev(9, 4, 0, "view"), ev(10, 4, 5, "purchase"),
    ]
    tbl = pa.Table.from_pylist(rows)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = {r["stage"]: r["n_users"] for r in q_funnel(str(d)).to_pylist()}
    assert got == {"1_signup": 3, "2_view": 2, "3_purchase": 1}


def test_phash_neardup_groups(ray_session):
    """phash_neardup: identical payloads share a signature and canonicalize
    to the min media_id; distinct payloads keep their own canon."""
    import pyarrow as pa
    import ray.data

    from r2s2_ray.functions.multimodal import phash_neardup

    rows = [
        {"media_id": 1, "payload": b"same-bytes"},
        {"media_id": 2, "payload": b"other-bytes"},
        {"media_id": 5, "payload": b"same-bytes"},  # dup of 1
        {"media_id": 7, "payload": b"third"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = {r["media_id"]: (r["phash"], r["canon_id"]) for r in phash_neardup(ds).take_all()}
    assert got[1][0] == got[5][0] and got[5][1] == 1 and got[1][1] == 1
    assert got[2][1] == 2 and got[7][1] == 7
    assert len({got[1][0], got[2][0], got[7][0]}) == 3


def test_bfs_distances_layers(ray_session):
    """bfs_distances: hop counts over an undirected path + branch, seeds at
    0, unreached nodes absent, cap at max_depth."""
    import pyarrow as pa
    import ray.data

    from r2s2_ray.functions.graph import bfs_distances

    # a - b - c - d - e (path), b - x (branch), isolated: z (via self pair? absent)
    edges = ray.data.from_arrow(
        pa.Table.from_pylist(
            [
                {"src": "a", "dst": "b"},
                {"src": "b", "dst": "c"},
                {"src": "c", "dst": "d"},
                {"src": "d", "dst": "e"},
                {"src": "b", "dst": "x"},
                {"src": "y", "dst": "z"},  # unreachable component
            ]
        )
    ).repartition(3)
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, ["a"], max_depth=3).take_all()}
    assert got == {"a": 0, "b": 1, "c": 2, "x": 2, "d": 3}
    # e is 4 hops -> absent at max_depth=3; y/z unreachable -> absent


def test_semdedup_pairs_matches_composed_reference():
    """semdedup_pairs == (reference kmeans assignment) x (within-cluster exact
    cosine >= threshold), on a multi-block input — the pair set must contain
    exactly the within-cluster near-dups and nothing cross-cluster."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.dedup import semdedup_pairs
    from r2s2_ray.functions.similarity import kmeans

    rng = np.random.default_rng(11)
    n, dim, k, iters, thr = 90, 6, 4, 2, 0.8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[30] = vecs[10] * 2.0  # same direction, different norm -> cosine 1
    vecs[55] = vecs[54] + 0.01 * rng.normal(size=dim).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    got = {
        (r["a"], r["b"]): (r["cluster"], r["cosine"])
        for r in semdedup_pairs(
            ds, "vec_id", "embedding", k=k, n_iters=iters, threshold=thr
        ).take_all()
    }

    asn = {
        r["vec_id"]: r["cluster"]
        for r in kmeans(ds, "vec_id", "embedding", k=k, n_iters=iters).take_all()
    }
    V = vecs.astype(np.float64)
    nv = V / np.linalg.norm(V, axis=1, keepdims=True)
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            if asn[i] == asn[j]:
                c = float(nv[i] @ nv[j])
                if c >= thr:
                    want[(i, j)] = (asn[i], round(c, 6))
    assert got == want
    assert (10, 30) in got  # collinear pair must cluster together and hit 1.0


def test_winnow_guarantee_and_density():
    """Winnowing guarantee: two documents sharing a run of >= window+k-1
    tokens share at least one fingerprint; and the selected set is a subset
    of the full shingle-hash set, ~1/window the size."""
    import numpy as np
    import ray.data

    from r2s2_ray.functions.hashing import poly_hash_arr
    from r2s2_ray.functions.textstats import winnow_fingerprints

    common = "alpha beta gamma delta epsilon zeta"  # 6 tokens >= w+k-1 = 6
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "one two " + common + " three four five six seven",
                    "nine ten eleven " + common + " twelve",
                    "totally different words everywhere here now then always",
                ],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(docs).repartition(2)
    rows = winnow_fingerprints(ds, "doc_id", "text", shingle_k=3, window=4).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared >= w+k-1 token run must share a fp"
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # subset of the full shingle-hash set, and smaller
    toks = docs["text"][0].as_py().lower().split()
    shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    full = set(
        np.asarray(poly_hash_arr(pa.array(shingles, pa.string()))).astype(np.int64).tolist()
    )
    assert by_doc[1] <= full and len(by_doc[1]) < len(full)


def test_bigram_surprisal_paths_agree_and_rewards_common_order():
    """bigram_surprisal: the broadcast and distributed count-attach paths are
    bit-identical (broadcast_max=0 forces the hash_join path), and a document
    of corpus-common words in an UNSEEN order scores strictly higher per
    bigram than the order every other document uses."""
    import ray.data

    from r2s2_ray.functions.textstats import bigram_surprisal

    texts = ["alpha beta gamma delta"] * 9 + ["delta gamma beta alpha"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    a = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_bits"])
        for r in bigram_surprisal(ds, "doc_id", "text").take_all()
    }
    b = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_bits"])
        for r in bigram_surprisal(ds, "doc_id", "text", broadcast_max=0).take_all()
    }
    assert a == b and len(a) == 10
    assert all(n == 3 for n, _ in a.values())
    common_bits = a[0][1]
    assert all(a[i] == a[0] for i in range(9))
    assert a[9][1] > common_bits  # unseen order -> higher surprisal


def test_cdc_chunks_edit_stability():
    """The CDC property: a PREFIX insertion shifts every boundary by the
    edit length, so the chunk LENGTH sequence after the first boundary is
    unchanged — fixed-size blocks would re-key everything."""
    import ray.data

    from r2s2_ray.functions.dedup import cdc_chunks

    base = " ".join(f"tok{i % 37}x{i % 11}" for i in range(400))
    edited = "INSERTED PREAMBLE " + base
    t = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array([base, edited], pa.string())}
    )
    rows = cdc_chunks(ray.data.from_arrow(t), "doc_id", "text").take_all()
    by = {1: [], 2: []}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by[r["doc_id"]].append((r["start"], r["len"]))
    lens1 = [l for _, l in by[1]]
    lens2 = [l for _, l in by[2]]
    assert len(lens1) > 3, "corpus fixture must produce interior boundaries"
    # every interior boundary of the base doc reappears in the edited doc,
    # shifted by exactly the insertion length (the insertion may ADD an
    # early boundary of its own, so containment — not equality — is the law)
    shift = len("INSERTED PREAMBLE ")
    assert {s + shift for s, _ in by[1][1:]} <= {s for s, _ in by[2]}
    # the chunk-length tail (far from the edit) is identical
    assert lens1[-3:] == lens2[-3:]
    # coverage: chunks tile each document exactly
    for did, chunks in by.items():
        total = sum(l for _, l in chunks)
        n = len(base) if did == 1 else len(edited)
        assert total == n and chunks[0][0] == 1
