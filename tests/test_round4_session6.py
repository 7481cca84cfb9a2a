"""Edge-case pins for the round-4 session-6 operators (oracle equality is
covered by the entry-contract sweep; these pin what it can't see: parser
rejections, stats-missing pruning safety, permutation properties, walk
determinism, MMR greedy invariants)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


# --------------------------------------------------------------- INSERT WHERE
def test_insert_where_parser_rejections():
    from r2s2_ray.pipelines.update import parse_update

    with pytest.raises(ValueError, match="must be followed by WHERE"):
        parse_update("INSERT { <s> <p> <o> }")
    ops = parse_update(
        "INSERT { ?a <https://p/derived> ?b } WHERE { ?a <https://p/x> ?b }"
    )
    assert ops[0][0] == "insert_where"
    tmpl, body = ops[0][1]
    assert len(tmpl) == 1 and len(body) == 1


def test_insert_where_cartesian_and_unbound_rejected(tmp_path):
    from r2s2_ray.pipelines.update import apply_update
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build

    tbl = pa.table(
        {
            "subj": ["https://s/1", "https://s/2"],
            "s_kind": pa.array([1, 1], pa.int8()),
            "pred": ["https://p/x", "https://p/y"],
            "obj": ["https://o/1", "https://o/2"],
            "o_kind": pa.array([1, 1], pa.int8()),
            "o_lang": pa.array([None, None], pa.string()),
            "o_dt": pa.array([None, None], pa.string()),
            "graph": ["https://g/0", "https://g/0"],
        }
    )
    state = str(tmp_path / "state")
    quad_state_build(route(ray.data.from_arrow(tbl)), state, num_buckets=4)
    # two WHERE patterns sharing no variable -> cartesian product, rejected
    with pytest.raises(ValueError, match="shared variables"):
        apply_update(
            state,
            "INSERT { ?a <https://p/d> ?c } "
            "WHERE { ?a <https://p/x> ?b . ?c <https://p/y> ?d }",
            num_buckets=4,
        )
    # template var not bound anywhere in WHERE -> rejected
    with pytest.raises(ValueError, match="unbound"):
        apply_update(
            state,
            "INSERT { ?a <https://p/d> ?zzz } WHERE { ?a <https://p/x> ?b }",
            num_buckets=4,
        )


def test_insert_where_inserts_derived_and_is_idempotent(tmp_path):
    from r2s2_ray.pipelines.update import apply_update, state_quads
    from r2s2_ray.stages.fold import route
    from r2s2_ray.stages.incremental import quad_state_build

    tbl = pa.table(
        {
            "subj": ["https://c/1", "https://t/1"],
            "s_kind": pa.array([1, 1], pa.int8()),
            "pred": ["https://p/hasTurn", "https://p/mentions"],
            "obj": ["https://t/1", "https://e/1"],
            "o_kind": pa.array([1, 1], pa.int8()),
            "o_lang": pa.array([None, None], pa.string()),
            "o_dt": pa.array([None, None], pa.string()),
            "graph": ["https://g/0", "https://g/0"],
        }
    )
    state = str(tmp_path / "state")
    quad_state_build(route(ray.data.from_arrow(tbl)), state, num_buckets=4)
    src = (
        "INSERT { ?e <https://p/mentionedIn> ?c } "
        "WHERE { ?c <https://p/hasTurn> ?t . ?t <https://p/mentions> ?e }"
    )
    apply_update(state, src, num_buckets=4)
    rows = {
        (r["subj"], r["pred"], r["obj"], r["graph"])
        for r in state_quads(state).take_all()
    }
    assert (
        "https://e/1",
        "https://p/mentionedIn",
        "https://c/1",
        "https://graphs.example.org/default",
    ) in rows
    # set semantics: re-running the same request is a no-op
    apply_update(state, src, num_buckets=4)
    rows2 = {
        (r["subj"], r["pred"], r["obj"], r["graph"])
        for r in state_quads(state).take_all()
    }
    assert rows2 == rows


# ------------------------------------------------------------- rowgroup prune
def test_rowgroup_prune_safe_without_stats_and_skips_with(tmp_path):
    from r2s2_ray.sources.jsonl import rowgroup_prune

    t = pa.table({"k": list(range(1000)), "v": list(range(1000))})
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    pq.write_table(t, p1, row_group_size=100)  # 10 groups, sorted -> prunable
    pq.write_table(t, p2, row_group_size=100, write_statistics=False)
    ds, stats = rowgroup_prune([p1, p2], "k", 250, 349, ["k", "v"])
    got = sorted(r["k"] for r in ds.take_all())
    # both copies contribute their matching rows; the no-stats file is fully
    # scanned (safe) while the stats file skips non-overlapping groups
    assert got == sorted(list(range(250, 350)) * 2)
    assert stats["n_groups"] == 20
    assert 10 + 1 <= stats["n_scanned"] < 20


# ----------------------------------------------------------------- epoch plan
def test_epoch_plan_is_per_epoch_permutation_and_differs():
    from r2s2_ray.functions.textstats import epoch_plan

    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(97))}))
    rows = epoch_plan(ds, "doc_id", n_epochs=3, num_buckets=8).take_all()
    by_epoch: dict[int, dict[int, int]] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["rank"]
    assert set(by_epoch) == {0, 1, 2}
    orders = []
    for e, m in sorted(by_epoch.items()):
        assert sorted(m.values()) == list(range(97))  # dense permutation
        orders.append(tuple(sorted(m, key=m.get)))
    assert orders[0] != orders[1] and orders[1] != orders[2]


# ------------------------------------------------------------------------ MMR
def test_mmr_first_pick_is_top1_and_ids_distinct():
    from r2s2_ray.functions.similarity import brute_force_topk, mmr_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float64)
    t = pa.table(
        {
            "vec_id": list(range(60)),
            "embedding": [list(map(float, v)) for v in vecs],
        }
    )
    ds = ray.data.from_arrow(t)
    q = vecs[:2]
    got = mmr_topk(ds, q, "vec_id", "embedding", k=4, pool=16)
    top1 = {
        r["qid"]: r["vec_id"]
        for r in brute_force_topk(ds, q, "vec_id", "embedding", k=1)
    }
    per_q: dict[int, list[int]] = {}
    for qid, rank, vid in zip(
        got["qid"].to_pylist(), got["rank"].to_pylist(), got["vec_id"].to_pylist()
    ):
        per_q.setdefault(qid, []).append((rank, vid))
    for qid, pairs in per_q.items():
        pairs.sort()
        ids = [v for _, v in pairs]
        assert ids[0] == top1[qid]  # rank 0 == pure relevance argmax
        assert len(set(ids)) == len(ids) == 4


# --------------------------------------------------------------- random walks
def test_random_walks_deterministic_and_complete():
    from r2s2_ray.functions.graph import random_walks

    edges = pa.table(
        {
            "src": ["a", "a", "b", "c"],
            "dst": ["b", "c", "c", "d"],
        }
    )
    seeds = pa.table({"node": ["a", "d"]})

    def run():
        return sorted(
            (r["walk"], r["step"], r["node"])
            for r in random_walks(
                ray.data.from_arrow(edges),
                ray.data.from_arrow(seeds),
                n_steps=3,
                num_buckets=4,
            ).take_all()
        )

    one, two = run(), run()
    assert one == two  # deterministic replay
    # undirected + connected: every walk has exactly n_steps+1 positions
    per_walk: dict[str, int] = {}
    for w, _s, _n in one:
        per_walk[w] = per_walk.get(w, 0) + 1
    assert per_walk == {"a": 4, "d": 4}
    assert [s for w, s, _ in one if w == "a"] == [0, 1, 2, 3]


# ------------------------------------------------------------- vocab coverage
def test_vocab_coverage_empty_doc_and_full_vocab():
    from r2s2_ray.functions.textstats import vocab_coverage

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["x y x", "", "x z q"],
        }
    )
    rows = {
        r["doc_id"]: r
        for r in vocab_coverage(
            ray.data.from_arrow(t), "doc_id", "text", vocab_size=2
        ).take_all()
    }
    # corpus counts: x=3, y=1, z=1, q=1 -> vocab (count DESC, tok ASC) = {x, q}
    assert rows[2]["n_tokens"] == 0 and rows[2]["oov_ppm"] == 0
    assert rows[1]["n_oov"] == 1  # y OOV
    assert rows[3]["n_oov"] == 1  # z OOV (q in vocab by tie-break)
    assert rows[3]["oov_ppm"] == 1_000_000 // 3
