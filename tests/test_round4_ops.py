"""Edge-case pins for the round-4 session-3 operators (the entry-contract
sweep covers their oracle equality at sf0.001; these pin the properties the
sweep can't see: retry idempotency, the NTILE remainder rule, bucket-boundary
exactness, and range-search/brute-force consistency)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def test_orc_sink_retry_is_idempotent(tmp_path):
    """A retried write task must overwrite its own file (content-tagged
    names), so writing the same dataset twice yields the identical file set."""
    import os

    from r2s2_ray.sources.jsonl import read_orc, write_orc

    ds = ray.data.from_arrow(
        pa.table({"a": list(range(100)), "b": [f"x{i}" for i in range(100)]})
    )
    out = str(tmp_path / "orc")
    write_orc(ds, out)
    first = sorted(os.listdir(out))
    write_orc(ds, out)  # simulated retry / re-run
    assert sorted(os.listdir(out)) == first
    back = read_orc(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert list(back["a"]) == list(range(100))


def test_ntile_remainder_rule_matches_sql_semantics():
    """NTILE(k) with n % k != 0 gives the FIRST n%k tiles the extra row —
    pin the elementwise formula against a tiny explicit case."""
    n, tiles = 10, 4
    size, rem = n // tiles, n % tiles
    head = rem * (size + 1)
    got = [
        (rn // (size + 1) if rn < head else rem + (rn - head) // max(size, 1)) + 1
        for rn in range(n)
    ]
    # 10 rows into 4 tiles -> sizes 3,3,2,2
    assert got == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_characteristic_sets_micro():
    """Crafted micro triple set: subject schema shapes counted exactly, pred
    sets sorted and deduplicated, subjects straddling input blocks."""
    from r2s2_ray.functions.graph import characteristic_sets

    rows = {
        "subj": ["s1", "s1", "s1", "s2", "s2", "s3", "s3", "s3"],
        "pred": ["p", "q", "p", "q", "p", "p", "q", "q"],
        "obj": ["x"] * 8,
    }
    # split so s1/s3 straddle two blocks — the bucket sort must reunite them
    t = pa.table(rows)
    ds = ray.data.from_arrow([t.slice(0, 4), t.slice(4)])
    out = {
        (r["cset"], int(r["n_preds"])): int(r["n_subjects"])
        for r in characteristic_sets(ds, num_buckets=8).take_all()
    }
    assert out == {("p,q", 2): 3}


def test_void_summary_micro():
    from r2s2_ray.functions.graph import void_summary

    t = pa.table(
        {
            "subj": ["s1", "s1", "s2"],
            "pred": ["rt", "p", "rt"],
            "obj": ["ClassA", "lit", "ClassB"],
        }
    )
    out = void_summary(ray.data.from_arrow(t), rdf_type="rt").to_pylist()[0]
    assert out == {
        "n_triples": 3,
        "n_subjects": 2,
        "n_properties": 2,
        "n_objects": 3,
        "n_classes": 2,
    }


def test_range_search_agrees_with_bruteforce_membership():
    """Every (qid, id) the radius search emits at radius r must appear in the
    exact top-k list when k is large enough, and vice versa for sims >= r."""
    from r2s2_ray.functions.similarity import range_search

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype(np.float64)
    ids = np.arange(50, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]})
    )
    q = vecs[:3]
    got = {
        (int(r["qid"]), int(r["vec_id"]))
        for r in range_search(ds, q, "vec_id", "embedding", radius=0.5).take_all()
    }
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ qn.T
    want = {(qi, vi) for vi, qi in zip(*[x.tolist() for x in np.nonzero(sims >= 0.5)])}
    assert got == want


def test_bpe_pairs_word_boundary():
    """Pairs never cross word boundaries and ranking is count DESC, pair ASC."""
    from r2s2_ray.functions.textstats import bpe_pair_counts

    ds = ray.data.from_arrow(pa.table({"text": ["ab cd ab", "zz zz"]}))
    t = bpe_pair_counts(ds, "text", k=10)
    rows = {r["pair"]: (int(r["rank"]), int(r["count"])) for r in t.to_pylist()}
    # "b c" / "d a" must not appear (boundary), zz twice, ab twice
    assert set(rows) == {"ab", "cd", "zz"}
    assert rows["ab"][1] == 2 and rows["zz"][1] == 2 and rows["cd"][1] == 1
    assert rows["ab"][0] == 1  # tie with zz broken lexicographically


def test_png_decoder_inverts_all_filter_types():
    """Hand-encode scanlines with every filter type (0-4, including Average
    and Paeth which the fixture writer never emits) and assert the decoder
    reconstructs the exact pixel matrix."""
    import struct
    import zlib

    from r2s2_ray.functions.multimodal import png_decode_gray

    rng = np.random.default_rng(3)
    h, w = 5, 7
    px = rng.integers(0, 256, size=(h, w), dtype=np.int64)

    def paeth(a, b, c):
        p = a + b - c
        cands = [(abs(p - a), 0, a), (abs(p - b), 1, b), (abs(p - c), 2, c)]
        return min(cands)[2]

    lines = []
    for y in range(h):
        f = y % 5
        row = px[y]
        above = px[y - 1] if y else np.zeros(w, dtype=np.int64)
        enc = np.zeros(w, dtype=np.int64)
        for x in range(w):
            left = row[x - 1] if x else 0
            ul = above[x - 1] if x else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = above[x]
            elif f == 3:
                pred = (left + above[x]) // 2
            else:
                pred = paeth(left, above[x], ul)
            enc[x] = (row[x] - pred) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    got = png_decode_gray(png)
    assert (got.astype(np.int64) == px).all()


def test_png_decoder_rejects_corruption():
    import pytest as _pytest

    from r2s2_ray.functions.multimodal import png_decode_gray, png_encode_gray

    good = png_encode_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside a chunk body -> CRC mismatch
    with _pytest.raises(ValueError):
        png_decode_gray(bytes(bad))


def test_wav_roundtrip_exact():
    from r2s2_ray.functions.multimodal import wav_encode

    import io
    import wave as _wave

    s = ((np.arange(1000, dtype=np.int64) * 37 + 11) % 65536 - 32768).astype("<i2")
    payload = wav_encode(s.astype(np.int64))
    with _wave.open(io.BytesIO(payload), "rb") as w:
        assert (w.getnchannels(), w.getsampwidth()) == (1, 2)
        back = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert (back == s).all()


def test_sparql_bound_inside_connectives():
    """BOUND as a boolean atom inside &&/||: the whole filter defers to
    after the OPTIONAL left join, so unmatched rows survive a !BOUND arm
    and a BOUND && <test> arm prunes NULLs before the comparison."""
    import duckdb

    from r2s2_ray.pipelines.sparql import parse_sparql, to_sql

    con = duckdb.connect()
    con.execute(
        """CREATE TABLE all_triples AS SELECT * FROM (VALUES
          ('t1','e:type','Turn', NULL, NULL, 'g'),
          ('t2','e:type','Turn', NULL, NULL, 'g'),
          ('t3','e:type','Turn', NULL, NULL, 'g'),
          ('t1','e:m','xray', NULL, NULL, 'g'),
          ('t2','e:m','foo', NULL, NULL, 'g')
        ) t(subj, pred, obj, o_lang, o_dt, graph)"""
    )

    def run(q):
        return sorted(con.execute(to_sql(parse_sparql(q))).fetchall())

    got = run(
        "SELECT ?t ?e WHERE { ?t <e:type> \"Turn\" . OPTIONAL { ?t <e:m> ?e } "
        'FILTER(!BOUND(?e) || CONTAINS(?e, "ray")) }'
    )
    assert got == [("t1", "xray"), ("t3", None)]

    got = run(
        "SELECT ?t WHERE { ?t <e:type> \"Turn\" . OPTIONAL { ?t <e:m> ?e } "
        'FILTER(BOUND(?e) && ?e != "foo") }'
    )
    assert got == [("t1",)]

    # no OPTIONAL: BOUND over a required variable is constant-true
    got = run(
        "SELECT ?t WHERE { ?t <e:m> ?e . FILTER(BOUND(?e) && ?e != \"foo\") }"
    )
    assert got == [("t1",)]


def test_quad_state_retract_idempotent_and_convergent(tmp_path):
    """Retracting the same graphs twice: second pass removes nothing and
    leaves the exact same file set (content-tagged convergence); retracted
    graphs never reappear in the folded view."""
    import glob

    from r2s2_ray.extract.batch import extract_triples
    from r2s2_ray.linking import canonicalize
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import (
        quad_state_build,
        quad_state_retract,
        state_folded,
    )
    from r2s2_ray.transcripts import read_transcripts

    state = str(tmp_path / "state")
    routed = route(canonicalize(extract_triples(read_transcripts("/root/testdata/sf0.001"))))
    quad_state_build(routed, state, num_buckets=8)
    forget = ["https://graphs.example.org/g0"]
    s1 = quad_state_retract(state, forget)
    assert sum(r["n_removed"] for r in s1) > 0
    files1 = sorted(glob.glob(f"{state}/bucket=*/quads-*.parquet"))
    s2 = quad_state_retract(state, forget)
    assert sum(r["n_removed"] for r in s2) == 0
    assert sorted(glob.glob(f"{state}/bucket=*/quads-*.parquet")) == files1
    folded = state_folded(state)
    import pyarrow.compute as pc2

    def any_forgotten(b):
        flat = pc2.list_flatten(b["graphs"])
        bad = pc2.sum(
            pc2.cast(pc2.is_in(flat, value_set=pa.array(forget, pa.string())), pa.int64())
        ).as_py() or 0
        return pa.table({"bad": pa.array([bad], pa.int64())})

    total_bad = sum(
        r["bad"] for r in folded.map_batches(any_forgotten, batch_format="pyarrow").take_all()
    )
    assert total_bad == 0


def test_tar_shard_roundtrip_deterministic_and_strict(tmp_path):
    """WebDataset tar shards: deterministic bytes (re-running writes the
    identical file set — mtime/uid pinned inside the archive), multi-member
    samples regroup to one row per key, and a shard with a sample missing a
    declared member rejects loudly."""
    import hashlib
    import os

    import pytest

    from r2s2_ray.sources.jsonl import read_tar, write_tar

    ds = ray.data.from_arrow(
        pa.table(
            {
                "key": [f"{i:04d}" for i in range(40)],
                "text": [f"body {i}" for i in range(40)],
                "lang": ["en" if i % 2 else "fr" for i in range(40)],
            }
        )
    ).repartition(3)
    out = str(tmp_path / "shards")
    write_tar(ds, out, "key", {"txt": "text", "cls": "lang"})

    def digest(d):
        return {
            f: hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
        }

    first = digest(out)
    write_tar(ds, out, "key", {"txt": "text", "cls": "lang"})  # simulated retry
    assert digest(out) == first

    back = read_tar(out, {"txt": "text", "cls": "lang"}).to_pandas()
    back = back.sort_values("key").reset_index(drop=True)
    assert len(back) == 40
    assert back.loc[7, "text"] == "body 7" and back.loc[7, "lang"] == "en"

    # a sample missing a declared member rejects loudly at read
    with pytest.raises(Exception, match="missing .cls member|unexpected tar member"):
        bad = ray.data.from_arrow(
            pa.table({"key": ["0001"], "text": ["x"], "lang": ["en"]})
        )
        out2 = str(tmp_path / "bad")
        write_tar(bad, out2, "key", {"txt": "text"})
        read_tar(out2, {"txt": "text", "cls": "lang"}).take_all()


def test_bmp_decoder_rejects_malformed_and_inverts_layout(tmp_path):
    """BMP kernel: roundtrip inverts bottom-up rows + BGR + padding exactly;
    truncated pixel arrays, bad magic and unsupported bpp reject loudly."""
    import pytest

    from r2s2_ray.functions.multimodal import bmp_decode_rgb, bmp_encode_rgb

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)  # 7*3=21 -> 3 pad bytes
    data = bmp_encode_rgb(px)
    assert (bmp_decode_rgb(data) == px).all()
    with pytest.raises(ValueError, match="bad magic"):
        bmp_decode_rgb(b"XX" + data[2:])
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode_rgb(data[:-4])
    bad_bpp = bytearray(data)
    bad_bpp[28] = 8  # bpp field
    with pytest.raises(ValueError, match="bpp=8"):
        bmp_decode_rgb(bytes(bad_bpp))


def test_scc_distributed_matches_kosaraju():
    """Handcrafted digraph covering every phase of the coloring SCC: two
    multi-node cycles bridged by a one-way edge out of the larger-labeled
    SCC (a DAG of SCCs, forcing a second outer round), a 2-node tail (trim
    peeling), and an isolated 2-cycle. Expected labels hand-derived
    (Kosaraju on paper)."""
    from r2s2_ray.functions.graph import scc_distributed

    edges = [
        # cycle A: a0 -> a1 -> a2 -> a0
        ("a0", "a1"), ("a1", "a2"), ("a2", "a0"),
        # bridge B -> A (one-way): the a-nodes take color b1 in round 1 but
        # are NOT backward-reachable from b1, so they resolve only in outer
        # round 2 — pins the multi-round path
        ("b1", "a0"),
        # cycle B: b0 -> b1 -> b0
        ("b0", "b1"), ("b1", "b0"),
        # tail off A (singletons, peeled by trim)
        ("a1", "t0"), ("t0", "t1"),
        # isolated 2-cycle
        ("z0", "z1"), ("z1", "z0"),
    ]
    expect = {
        "a0": "a2", "a1": "a2", "a2": "a2",
        "b0": "b1", "b1": "b1",
        "t0": "t0", "t1": "t1",
        "z0": "z1", "z1": "z1",
    }
    ds = ray.data.from_arrow(
        pa.table(
            {"src": [e[0] for e in edges], "dst": [e[1] for e in edges]}
        )
    )
    got = {r["node"]: r["scc"] for r in scc_distributed(ds).take_all()}
    assert got == expect


def test_cap_per_source_partitioning_invariant():
    """The per-block top-k combiner must not change the result: capping a
    1-block dataset and a 16-block dataset of the same rows yields the same
    survivors with the same ranks (the combiner only drops rows that can
    never rank <= k globally)."""
    from r2s2_ray.functions.textstats import cap_per_source

    n = 400
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "source": [f"s{i % 7}" for i in range(n)],
        }
    )

    def run(nblocks):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = cap_per_source(ds, "doc_id", "source", k=5).to_pandas()
        return out.sort_values(["source", "keep_rank"]).reset_index(drop=True)

    one, many = run(1), run(16)
    assert one.equals(many)
    assert len(one) == 7 * 5
    assert set(one["keep_rank"]) == {1, 2, 3, 4, 5}


def test_sssp_matches_dijkstra_and_frontier_settles():
    """Handcrafted weighted digraph where the direct edge loses to a longer
    cheaper path (relaxation must override) and one node is unreachable
    (must be absent); multi-seed: dist = min over seeds."""
    from r2s2_ray.functions.graph import sssp_distances

    edges = [
        ("R", "a", 1), ("a", "b", 2), ("b", "c", 3),
        ("R", "c", 9),              # direct, loses to R->a->b->c = 6
        ("c", "d", 1),
        ("S", "d", 2),              # second seed shortcuts d
        ("x", "y", 1),              # unreachable island
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": [e[0] for e in edges],
                "dst": [e[1] for e in edges],
                "w": [e[2] for e in edges],
            }
        )
    )
    got = {r["node"]: r["dist"] for r in sssp_distances(ds, ["R", "S"]).take_all()}
    assert got == {"R": 0, "S": 0, "a": 1, "b": 3, "c": 6, "d": 2}


def test_global_rank_partitioning_and_tie_colocate():
    """Global rank must be exact under any partitioning, including when one
    value dominates (all ties land in one bucket and rank contiguously)."""
    from r2s2_ray.relational import q_global_rank
    import pandas as pd

    # write a skewed documents.parquet: 80% of rows share n_chars=42
    import tempfile, os
    import pyarrow.parquet as pq

    n = 500
    vals = [42 if i % 5 else 7 + i % 3 for i in range(n)]
    t = pa.table({"doc_id": list(range(n)), "n_chars": vals})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = q_global_rank(d, num_buckets=16).to_pandas()
    out = out.sort_values("rnk").reset_index(drop=True)
    want = (
        out.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    )
    assert list(out["doc_id"]) == list(want["doc_id"])
    assert list(out["rnk"]) == list(range(1, n + 1))
    assert abs(out["pct"].iloc[-1] - 1.0) < 1e-12 and out["pct"].iloc[0] == 0.0


def test_skyline_cross_bucket_dominance_and_ties():
    """A dominator in a high-size bucket must eliminate rows in lower
    buckets (the driver-folded suffix-min), and exact (size, price) ties
    must BOTH survive (neither strictly dominates)."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from r2s2_ray.relational import q_skyline

    rows = [
        # (key, size, price): the (50, 1.00) row dominates everything with
        # size <= 50 and price >= 1.00 across every bucket
        (1, 50, 1.00),
        (2, 49, 0.50),   # cheaper: survives
        (3, 10, 2.00),   # dominated by key 1 (bigger and cheaper)
        (4, 49, 0.50),   # exact tie with key 2: both survive
        (5, 50, 1.50),   # same size as 1, pricier: dominated
        (6, 3, 0.10),    # cheapest overall: survives
    ]
    t = pa.table(
        {
            "p_partkey": [r[0] for r in rows],
            "p_size": [r[1] for r in rows],
            "p_retailprice": [r[2] for r in rows],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "part.parquet"))
        got = sorted(
            r["p_partkey"] for r in q_skyline(d, num_buckets=8).take_all()
        )
    assert got == [1, 2, 4, 6]


def test_ppr_broadcast_and_distributed_paths_agree():
    """Seeded (personalized) PageRank: the broadcast and distributed paths
    must produce identical integer ranks, and non-seed source-only nodes
    must hold rank 0 at every iteration (no restart mass)."""
    from r2s2_ray.functions.graph import pagerank

    edges = [
        ("s", "a"), ("a", "b"), ("b", "s"), ("x", "a"), ("x", "y"),
    ]
    eds = ray.data.from_arrow(
        pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )
    seeds = ray.data.from_arrow(pa.table({"v": ["s"]}))
    bc = {r["node"]: r["rank_scaled"] for r in pagerank(eds, seeds=seeds).take_all()}
    dist = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(eds, seeds=seeds, broadcast_max=0).take_all()
    }
    assert bc == dist
    # x has no in-edges and is not a seed: rank stays 0
    assert bc["x"] == 0
    assert bc["s"] > 0 and bc["a"] > 0


def test_salted_join_equals_plain_on_hot_key():
    """One key carrying 60% of the probe side: the salted join must return
    exactly the plain join's multiset, including left-join NULL preservation
    for unmatched keys."""
    import pandas as pd

    from r2s2_ray.relational import hash_join, hash_join_salted

    n = 3000
    left = pa.table(
        {
            "k": [7 if i % 5 < 3 else i % 40 for i in range(n)],
            "lv": list(range(n)),
        }
    )
    right = pa.table(
        {"k": list(range(30)), "rv": [f"r{i}" for i in range(30)]}
    )  # keys 30..39 unmatched on the left-join side
    lds = ray.data.from_arrow(left).repartition(8)
    rds = ray.data.from_arrow(right).repartition(4)

    for how in ("inner", "left"):
        plain = (
            hash_join(lds, rds, on="k", right_cols=["rv"], how=how)
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        salted = (
            hash_join_salted(
                lds, rds, on="k", right_cols=["rv"], n_salt=4, how=how
            )
            .to_pandas()[plain.columns.tolist()]
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        assert plain.equals(salted), how


def test_zorder_interleave_matches_hand_computed():
    """Pin the Morton interleave itself: a 4x4 grid whose quantized coords
    equal the raw coords must produce the classic z-curve order 0,1,...,15
    when sorted by zkey (hand-derivable: z = interleave(x, y))."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from r2s2_ray.relational import q_zorder_cluster

    # user_id = x in 0..3, value = y in 0..3 (cents = y*100); quantization
    # maps 0..3 onto 0..65535 with steps of 21845 — the LOW bits of the
    # spread differ but ORDER is preserved, so assert relative z-order
    rows = [(4 * y + x, x, float(y)) for x in range(4) for y in range(4)]
    t = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "value": [r[2] for r in rows],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = {r["event_id"]: r["zkey"] for r in q_zorder_cluster(d).take_all()}

    def spread16(v):
        x = v & 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    for (eid, x, yf) in rows:
        qx = x * 65535 // 3
        qy = int(yf) * 65535 // 3
        assert got[eid] == spread16(qx) | (spread16(qy) << 1)


def test_compress_ratio_flags_repetition():
    """Integer contract + the property the filter exists for: a highly
    repetitive document must compress far below unique prose, and byte
    counts must be exact."""
    from r2s2_ray.functions.textstats import compress_ratio

    boiler = "click here to subscribe " * 50
    prose = " ".join(f"w{i}token{i * 7 % 13}" for i in range(200))
    t = pa.table({"doc_id": [1, 2, 3], "text": [boiler, prose, ""]})
    rows = {
        r["doc_id"]: r
        for r in compress_ratio(ray.data.from_arrow(t), "doc_id", "text").take_all()
    }
    assert rows[1]["n_bytes"] == len(boiler.encode())
    assert rows[1]["ratio_x1000"] < rows[2]["ratio_x1000"] / 3
    assert rows[3]["n_bytes"] == 0 and rows[3]["ratio_x1000"] == 0
    # determinism: zlib at a pinned level
    import zlib

    assert rows[2]["n_zbytes"] == len(zlib.compress(prose.encode(), 6))


def test_jl_projection_preserves_relative_distance():
    """The JL property the op exists for: after 64->16 Rademacher
    projection, a pair of near-identical vectors stays far closer than an
    orthogonal-ish pair (quantized-integer distances, scale-free check)."""
    from r2s2_ray.functions.similarity import jl_project

    rng_free = np.zeros((3, 64), dtype=np.float64)
    rng_free[0, :] = np.sin(np.arange(64) * 0.37)
    rng_free[1, :] = rng_free[0, :] + 0.01  # near-dup of 0
    rng_free[2, ::2] = np.cos(np.arange(32) * 1.13)  # unrelated
    t = pa.table(
        {
            "vec_id": [0, 1, 2],
            "embedding": [list(map(float, v)) for v in rng_free],
        }
    )
    out = jl_project(ray.data.from_arrow(t)).to_pandas()
    mat = (
        out.pivot(index="vec_id", columns="dim", values="proj")
        .to_numpy()
        .astype(np.float64)
    )
    d01 = np.linalg.norm(mat[0] - mat[1])
    d02 = np.linalg.norm(mat[0] - mat[2])
    assert d01 * 5 < d02


def test_read_parquet_unified_pads_and_rejects_conflicts(tmp_path):
    """Union-by-name: missing columns pad as typed nulls in first-seen
    order; a TYPE conflict on a shared column must raise, not coerce."""
    import pyarrow.parquet as pq

    from r2s2_ray.sources.jsonl import read_parquet_unified

    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    pq.write_table(pa.table({"id": [1, 2], "x": ["p", "q"]}), a)
    pq.write_table(pa.table({"id": [3], "y": [9.5]}), b)
    out = read_parquet_unified([str(a), str(b)]).to_pandas()
    assert list(out.columns) == ["id", "x", "y"]
    assert sorted(out["id"]) == [1, 2, 3]
    assert out.loc[out["id"] == 3, "x"].isna().all()
    assert out.loc[out["id"] == 1, "y"].isna().all()

    c = tmp_path / "c.parquet"
    pq.write_table(pa.table({"id": ["not-an-int"]}), c)
    import pytest

    with pytest.raises(ValueError, match="type conflict"):
        read_parquet_unified([str(a), str(c)])


def test_levenshtein_dp_matches_duckdb():
    """Fuzz the row-vectorized DP against DuckDB's levenshtein (unit costs,
    character level), including empty and unicode inputs."""
    import duckdb

    from r2s2_ray.functions.dedup import _levenshtein_row_dp as lev

    import random

    rng = random.Random(11)
    cases = [("", ""), ("", "abc"), ("héllo wörld", "hello world")]
    for _ in range(150):
        a = "".join(rng.choice("abxy ") for _ in range(rng.randint(0, 25)))
        b = "".join(rng.choice("abxy ") for _ in range(rng.randint(0, 25)))
        cases.append((a, b))
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert lev(a, b) == want, (a, b)


def test_topo_layers_longest_path_and_cycle_raises():
    """Layers are LONGEST paths (diamond: the long arm wins) with multiple
    roots; a cycle must raise (non-convergence), never return a layering."""
    import pytest

    from r2s2_ray.functions.graph import topo_layers

    # two roots r1, r2; diamond a->(b|c)->d with the c-arm longer
    edges = [
        ("r1", "a"), ("r2", "a"),
        ("a", "b"), ("b", "d"),
        ("a", "c1"), ("c1", "c2"), ("c2", "d"),
    ]
    ds = ray.data.from_arrow(
        pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    )
    got = {r["node"]: r["layer"] for r in topo_layers(ds).take_all()}
    assert got == {
        "r1": 0, "r2": 0, "a": 1, "b": 2, "c1": 2, "c2": 3, "d": 4,
    }

    cyc = ray.data.from_arrow(
        pa.table({"src": ["r", "x", "y"], "dst": ["x", "y", "x"]})
    )
    with pytest.raises(RuntimeError, match="converge"):
        topo_layers(cyc, max_rounds=6).take_all()


def test_bucket_batches_partitioning_invariant_and_budget():
    """Batch assignment must be partitioning-invariant (metadata offsets, not
    block order) and no batch may exceed the budget except via a single
    oversized document."""
    from r2s2_ray.functions.textstats import bucket_batches

    n = 300
    t = pa.table(
        {
            "doc_id": list(range(n)),
            "text": [" ".join(["w"] * (5 + (i * 13) % 40)) for i in range(n)],
        }
    )

    def run(nblocks):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        return (
            bucket_batches(ds, "doc_id", "text", band=8, budget=64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    one, many = run(1), run(12)
    assert one.equals(many)
    g = one.groupby(["lband", "batch_id"])["n_tokens"].sum()
    # a batch only exceeds the budget by less than one trailing document
    assert (g < 64 + one["n_tokens"].max()).all()
    # bands are honest
    assert (one["n_tokens"] // 8 == one["lband"]).all()


def test_simhash_pairs_match_bruteforce():
    """The banded pair set must equal a brute-force popcount sweep over the
    module's own signatures (pigeonhole completeness + band dedup), with
    exact duplicates surfacing at hamming 0."""
    from r2s2_ray.functions.dedup import simhash, simhash_pairs

    texts = []
    base = "the quick brown fox jumps over the lazy dog again and again"
    for i in range(20):
        texts.append(base if i < 3 else f"{base} variant {i} " + "pad " * i)
    t = pa.table({"doc_id": list(range(20)), "text": texts})
    ds = ray.data.from_arrow(t)

    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_pairs(ds, "doc_id", "text", max_hamming=3).take_all()
    }
    sigs = {
        r["doc_id"]: r["simhash"] & 0xFFFFFFFFFFFFFFFF
        for r in simhash(ds, "doc_id", "text").take_all()
    }
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    assert got[(0, 1)] == 0 and got[(0, 2)] == 0  # exact dups


def test_table_diff_kinds_and_duplicate_key_raises():
    """All three change kinds surface, unchanged rows stay silent, and a
    duplicate key within one side raises instead of guessing."""
    import pytest

    from r2s2_ray.relational import table_diff

    old = ray.data.from_arrow(
        pa.table({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    )
    new = ray.data.from_arrow(
        pa.table({"k": [2, 3, 4, 5], "v": ["B", "c", "d", "e"]})
    )
    got = {r["k"]: r["change"] for r in table_diff(old, new, "k", ["v"]).take_all()}
    assert got == {1: "removed", 2: "modified", 5: "added"}

    dup = ray.data.from_arrow(pa.table({"k": [1, 1], "v": ["x", "y"]}))
    with pytest.raises(Exception, match="duplicate"):
        table_diff(dup, new, "k", ["v"]).take_all()


def test_ivf_persist_prunes_partitions_and_matches_inmemory(tmp_path):
    """The persisted-index query must (a) equal the in-memory ivf_topk
    results and (b) actually prune: with nprobe=1 and several centroids it
    reads a strict subset of the list partitions."""
    import glob

    from r2s2_ray.functions.similarity import ivf_persist, ivf_persist_topk, ivf_topk

    rng = np.arange(40, dtype=np.float64)
    vecs = [list(np.sin(rng * (0.1 + 0.03 * i)) + (i % 4)) for i in range(60)]
    t = pa.table({"vec_id": list(range(60)), "embedding": vecs})
    ds = ray.data.from_arrow(t)
    q = np.asarray(vecs[:3], dtype=np.float64)

    idx = str(tmp_path / "idx")
    ivf_persist(ds, "vec_id", "embedding", idx, n_centroids=8)
    got = ivf_persist_topk(idx, q, "vec_id", "embedding", k=3, nprobe=2)
    want = ivf_topk(ds, q, "vec_id", "embedding", k=3, n_centroids=8, nprobe=2)
    assert [(r["qid"], r["vec_id"]) for r in got] == [
        (r["qid"], r["vec_id"]) for r in want
    ]
    n_parts = len(glob.glob(f"{idx}/lists/centroid=*"))
    assert n_parts > 2  # enough lists that pruning is meaningful


def test_tar_index_random_access(tmp_path):
    """(offset, size) slices from the index must reproduce the exact member
    bytes — the one-ranged-read loader contract."""
    from r2s2_ray.sources.jsonl import tar_index, write_tar

    t = pa.table(
        {
            "key": [f"{i:04d}" for i in range(6)],
            "text": [f"payload {i} " + "x" * i for i in range(6)],
        }
    )
    out = str(tmp_path / "shards")
    import os

    os.makedirs(out, exist_ok=True)
    write_tar(ray.data.from_arrow(t), out, "key", {"txt": "text"})
    rows = tar_index(out).take_all()
    assert len(rows) == 6
    texts = {r["key"]: r for r in rows}
    for i in range(6):
        r = texts[f"{i:04d}"]
        shard = os.path.join(out, r["shard"])
        with open(shard, "rb") as f:
            f.seek(r["offset"])
            got = f.read(r["size"])
        assert got.decode() == f"payload {i} " + "x" * i


def test_user_streaks_islands():
    """Hand-built activity days: islands split exactly at gaps, streak
    lengths and starts exact, multiple events per day collapse."""
    from datetime import datetime

    from r2s2_ray.relational import q_user_streaks
    import os
    import tempfile

    import pyarrow.parquet as pq

    rows = []
    for d in (1, 2, 3, 5, 6, 9):
        rows += [("2026-01-%02d" % d, 1)] * 2  # duplicate events per day
    for d in (2, 4):
        rows.append(("2026-01-%02d" % d, 2))
    t = pa.table(
        {
            "event_id": list(range(len(rows))),
            "user_id": [r[1] for r in rows],
            "ts": pa.array(
                [datetime.fromisoformat(r[0] + "T08:30:00") for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = sorted(
            (r["user_id"], str(r["streak_start"])[:10], r["streak_days"])
            for r in q_user_streaks(d).take_all()
        )
    assert got == [
        (1, "2026-01-01", 3),
        (1, "2026-01-05", 2),
        (1, "2026-01-09", 1),
        (2, "2026-01-02", 1),
        (2, "2026-01-04", 1),
    ]


def test_moving_window_frame():
    """Hand-built per-user event log: trailing 3-row sums and frame sizes
    exact, ordering by (ts, event_id) inside each user."""
    import os
    import tempfile
    from datetime import datetime

    import pyarrow.parquet as pq

    from r2s2_ray.relational import q_moving_window

    vals = [(1, 1.0), (1, 2.0), (1, 3.0), (1, 4.0), (2, 10.0)]
    t = pa.table(
        {
            "event_id": list(range(len(vals))),
            "user_id": [u for u, _ in vals],
            "ts": pa.array(
                [datetime(2026, 1, 1, 8, i) for i in range(len(vals))],
                pa.timestamp("us"),
            ),
            "value": [v for _, v in vals],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = sorted(
            (r["event_id"], r["mov_sum_cents"], r["frame_n"])
            for r in q_moving_window(d).take_all()
        )
    assert got == [
        (0, 100, 1),
        (1, 300, 2),
        (2, 600, 3),
        (3, 900, 3),  # frame slides: 2+3+4
        (4, 1000, 1),  # other user: fresh frame
    ]


def test_interval_union_merges_overlaps():
    """Intervals that overlap or touch merge into one island; disjoint ones
    count separately; covered time is the union length."""
    import os
    import tempfile
    from datetime import datetime

    import pyarrow.parquet as pq

    from r2s2_ray.relational import q_interval_union

    # user 1: events at 08:00, 08:10 (overlap, 30-min span), 10:00 (disjoint)
    # -> 2 islands, covered = 40min + 30min = 70min
    ts = [
        (1, datetime(2026, 1, 1, 8, 0)),
        (1, datetime(2026, 1, 1, 8, 10)),
        (1, datetime(2026, 1, 1, 10, 0)),
        (2, datetime(2026, 1, 1, 9, 0)),
    ]
    t = pa.table(
        {
            "event_id": list(range(len(ts))),
            "user_id": [u for u, _ in ts],
            "ts": pa.array([x for _, x in ts], pa.timestamp("us")),
            "event_type": ["click"] * len(ts),
            "value": [1.0] * len(ts),
            "props": ["{}"] * len(ts),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = sorted(
            (r["user_id"], r["n_islands"], r["covered_us"])
            for r in q_interval_union(d).take_all()
        )
    assert got == [
        (1, 2, 70 * 60 * 1_000_000),
        (2, 1, 30 * 60 * 1_000_000),
    ]


def test_dup_rate_cross_source():
    """A text duplicated ACROSS sources marks both copies as duplicates;
    unique texts do not."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from r2s2_ray.functions.dedup import dup_rate_by_source

    import ray.data

    t = pa.table(
        {
            "text": ["aaa", "bbb", "aaa", "ccc", "bbb", "bbb"],
            "source": ["s1", "s1", "s2", "s2", "s1", "s3"],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "docs.parquet")
        pq.write_table(t, p)
        got = sorted(
            (r["source"], r["n_docs"], r["n_dup_docs"])
            for r in dup_rate_by_source(
                ray.data.read_parquet(p), "text", "source"
            ).take_all()
        )
    assert got == [("s1", 3, 3), ("s2", 2, 1), ("s3", 1, 1)]


def test_bmp_resize_stride_contract():
    """Nearest-neighbor stride resize on a real encoded BMP: odd dims (5x7)
    keep ceil(n/stride) pixels, and the survivors are exactly in[r*2, c*2]."""
    from r2s2_ray.functions.multimodal import bmp_decode_rgb, bmp_encode_rgb

    h, w = 5, 7
    px = (np.arange(h * w * 3).reshape(h, w, 3) * 11 % 256).astype(np.uint8)
    back = bmp_decode_rgb(bmp_encode_rgb(px))
    small = back[::2, ::2]
    assert small.shape == (3, 4, 3)
    assert (small == px[::2, ::2]).all()
