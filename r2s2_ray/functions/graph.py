"""Generic large-scale graph operators.

:func:`connected_components_distributed` is the scale path for alias-merge /
``owl:sameAs`` closure (north-star entity canonicalization): min-label
propagation where BOTH the edge list and the label table stay distributed —
no driver-side node map (contrast :func:`r2s2_ray.linking.connected_components`,
which broadcasts the label table and is the right choice only while the node
set is entity-surface-form sized).

Each round is three narrow groupby shuffles (attach labels to edge endpoints;
min per edge; min per node). A label moves one hop per round, so convergence
takes O(eccentricity of the component's min node) rounds — BFS-like, NOT
logarithmic (there is no pointer doubling); ``max_rounds`` bounds pathological
chains and exhaustion RAISES rather than returning half-merged labels.
Convergence is detected with a content hash of the label table (cheap
distributed aggregate, no join against the previous round).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min

from ..terms import RDF_TYPE

_HASH_SEED = 0x9E3779B97F4A7C15


def cc_demo_edges(sf_dir: str, per_doc: int = 20, groups: int = 50) -> ray.data.Dataset:
    """Deterministic multi-10k-node edge list derived from the documents table
    (drives the driver-contract CC query at >1 block): every document spawns a
    ``per_doc``-node star, and star centers link to a modular group-anchor node
    (``g<k>``), giving ``groups`` components whose lexicographic-min label is the
    anchor. Mirrored exactly by oracles_td.connected_components_oracle."""
    import polars as pl

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def gen(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        base = d * per_doc
        star_src = (base[:, None] + np.arange(1, per_doc, dtype=np.int64)).ravel()
        star_dst = np.repeat(base, per_doc - 1)
        df = pl.DataFrame(
            {
                "s": np.concatenate([star_src, base]),
                "kind": np.concatenate(
                    [np.zeros(len(star_src), np.int8), np.ones(len(base), np.int8)]
                ),
                "t": np.concatenate([star_dst, d % groups]),
            }
        )
        out = df.select(
            ("n" + pl.col("s").cast(pl.Utf8).str.zfill(8)).alias("src"),
            pl.when(pl.col("kind") == 0)
            .then("n" + pl.col("t").cast(pl.Utf8).str.zfill(8))
            .otherwise("g" + pl.col("t").cast(pl.Utf8).str.zfill(8))
            .alias("dst"),
        )
        return out.to_arrow()

    return ds.map_batches(gen, batch_format="pyarrow").repartition(8)


def _label_fingerprint(labels: ray.data.Dataset) -> int:
    """Order-independent fingerprint of the (node, label) table: sum of 64-bit
    row hashes. Min-label propagation changes at least one row per non-converged
    round, and a changed row flips the sum except with ~2^-64 collision odds."""

    def h(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        # struct hash, NOT a separator-joined concat: node ids are arbitrary
        # strings (entity surface forms), and ("a\x1fb","c") vs ("a","b\x1fc")
        # must not alias
        v = df.select(pl.struct(["node", "label"]).hash(seed=7).alias("h"))
        # per-block partial sum WRAPPED to uint64 (a plain int64 Sum aggregate
        # overflows into Python bigints and kills the reduce task)
        part = np.uint64(v["h"].to_numpy().astype(np.uint64, copy=False).sum())
        return pa.table({"h": pa.array([np.int64(part.astype(np.int64))], pa.int64())})

    rows = labels.map_batches(h, batch_format="pyarrow").take_all()
    # cross-block combine on the driver: one 8-byte row per block (metadata-scale)
    acc = np.uint64(0)
    for r in rows:
        acc = acc + np.uint64(np.int64(r["h"]).astype(np.uint64))
    return int(acc)


def connected_components_distributed(
    edges: ray.data.Dataset, max_rounds: int = 64
) -> ray.data.Dataset:
    """Connected components over an undirected edge list (string columns
    ``src``, ``dst``). Returns (node, label) with label = the component's
    lexicographic-min node id. Fully distributed: per-round state is the
    (node, label) Dataset, shuffled by node / edge id — nothing is pulled to
    the driver except a per-round 8-byte fingerprint.

    Raises RuntimeError if the labels are still changing after ``max_rounds``
    (a component whose min-node eccentricity exceeds the bound — e.g. a long
    alias CHAIN); returning silently would hand back a half-merged labeling.
    Edge identity is a 128-bit content hash (two independent 64-bit hashes):
    at web scale (1e8+ edges) a single 64-bit id has birthday-real collision
    odds, and a collision would permanently merge unrelated components."""

    def init(t: pa.Table) -> pa.Table:
        node = pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()]
        )
        label = pa.concat_arrays(
            [pc.min_element_wise(t["src"].combine_chunks(), t["dst"].combine_chunks())] * 2
        )
        return pa.table({"node": node, "label": label})

    def edge_rows(t: pa.Table) -> pa.Table:
        """Each edge becomes two (node, eid, eid2) rows; (eid, eid2) = two
        independent 64-bit content hashes of the edge = a 128-bit identity
        (stable across rounds, no global counter, collision odds ~2^-128)."""
        import polars as pl

        df = pl.from_arrow(t)
        # struct hash, NOT a separator-joined concat: node ids are arbitrary
        # strings and ("a\x1fb","c") vs ("a","b\x1fc") would alias under a
        # joined key — an ALIASED edge id min-merges unrelated components
        key = pl.struct(["src", "dst"])
        ids = df.select(
            key.hash(seed=13).reinterpret(signed=True).alias("eid"),
            key.hash(seed=1031).reinterpret(signed=True).alias("eid2"),
        ).to_arrow().combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()]),
                "eid": pa.concat_arrays([ids["eid"].combine_chunks()] * 2),
                "eid2": pa.concat_arrays([ids["eid2"].combine_chunks()] * 2),
            }
        )

    # materialize ONCE: every round reads endpoint_rows twice, and a lazy
    # dataset would re-execute the whole upstream edge pipeline each time
    endpoint_rows = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()
    # materialize ONCE: the fingerprint, round 1's lab_rows and the round-1
    # union each consume this — lazy, that is three executions of the full
    # init + groupby-Min shuffle over the edge set
    labels = (
        edges.map_batches(init, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
    ).materialize()
    fp = _label_fingerprint(labels)

    converged = False
    for _ in range(max_rounds):
        # 1) attach each node's current label to its incident edge endpoints:
        #    union (node, eid) rows with (node, label) rows, sort by node, and
        #    broadcast the node's label to its eid rows per block
        def attach(t: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.from_arrow(t)
            out = (
                df.with_columns(pl.col("label").max().over("node").alias("lab"))
                .filter(pl.col("eid").is_not_null())
                .select([pl.col("eid"), pl.col("eid2"), pl.col("lab")])
            )
            return out.to_arrow()

        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "eid": pa.nulls(t.num_rows, pa.int64()),
                    "eid2": pa.nulls(t.num_rows, pa.int64()),
                    "label": t["label"],
                }
            ),
            batch_format="pyarrow",
        )
        ep = endpoint_rows.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "eid": t["eid"],
                    "eid2": t["eid2"],
                    "label": pa.nulls(t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        attached = (
            lab_rows.union(ep)
            .sort("node")
            .map_batches(attach, batch_format="pyarrow", batch_size=None)
        )
        # 2+3 fused: one shuffle by eid — attached (eid, lab) rows union the
        # endpoint (eid, node) rows; per eid-run the min label is broadcast to
        # the endpoint rows, emitting (node, candidate-label) directly
        def back(t: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.from_arrow(t)
            out = (
                df.with_columns(pl.col("lab").min().over(["eid", "eid2"]).alias("mm"))
                .filter(pl.col("node").is_not_null())
                .select([pl.col("node"), pl.col("mm").alias("label")])
            )
            return out.to_arrow()

        em_rows = attached.map_batches(
            lambda t: pa.table(
                {
                    "eid": t["eid"],
                    "eid2": t["eid2"],
                    "node": pa.nulls(t.num_rows, pa.string()),
                    "lab": t["lab"],
                }
            ),
            batch_format="pyarrow",
        )
        ep2 = endpoint_rows.map_batches(
            lambda t: pa.table(
                {
                    "eid": t["eid"],
                    "eid2": t["eid2"],
                    "node": t["node"],
                    "lab": pa.nulls(t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        candidates = (
            em_rows.union(ep2)
            .sort("eid")
            .map_batches(back, batch_format="pyarrow", batch_size=None)
        )
        labels = (
            candidates.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        new_fp = _label_fingerprint(labels)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} rounds "
            "(a component's min-node eccentricity exceeds the bound — raise "
            "max_rounds); refusing to return half-merged labels"
        )
    return labels


def pagerank(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iters: int = 3,
    scale: int = 1_000_000,
    d_num: int = 85,
    d_den: int = 100,
    broadcast_max: int = 2_000_000,
    seeds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Distributed PageRank in EXACT integer arithmetic (fixed iteration
    count, scaled ranks): deterministic across block orders and engines, so
    the SQL oracle unrolls the identical iterations.

    ``seeds`` (a Dataset with one column ``v``) switches to PERSONALIZED
    PageRank: ``r_0(v) = scale * 1[seed]`` and the restart term
    ``(d_den - d_num) * scale // d_den`` is paid only to seed nodes — rank
    concentrates around the seed set (topic-sensitive PageRank, Haveliwala
    2002). ``seeds=None`` keeps the classic uniform restart. The seed flag
    joins the node set via one left hash_join (or a set lookup under the
    broadcast guard); everything else is the identical recurrence.

    Contract: ``r_0(v) = scale``; each iteration a node receives
    ``floor(r(u) / outdeg(u))`` from every in-edge and
    ``r'(v) = (d_den - d_num) * scale // d_den + d_num * sum // d_den``
    (floor divisions at exactly these two points — both engines agree because
    every intermediate is a non-negative int64). Dangling-node mass is NOT
    redistributed (the plain sparse-propagation variant; the contract is the
    fixed-point of THIS recurrence, documented rather than hidden).

    Dual path, the repo's standard split: with at most ``broadcast_max``
    nodes the (rank // outdeg) table ships once per iteration via ``ray.put``
    and an iteration is ONE dst-keyed groupby-sum whose result (node-scale,
    guarded) rebuilds the broadcast; beyond the guard each iteration is one
    hash_join shipping ranks to their out-edges (key-partitioned), a
    per-block dst combiner, one groupby-sum, and a left hash_join rebasing
    onto the node set — ranks materialize between iterations so lineage
    stays O(1), and nothing reaches the driver. The two paths are
    equality-pinned in tests."""
    import polars as pl
    from ray.data.aggregate import Count, Sum

    from ..relational import hash_join

    base = (d_den - d_num) * scale // d_den

    def to_nodes(col: str):
        def fn(b: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(b.select([col]))
                .rename({col: "v"})
                .unique()
                .to_arrow()
            )

        return fn

    nodes = (
        edges.map_batches(to_nodes(src_col), batch_format="pyarrow")
        .union(edges.map_batches(to_nodes(dst_col), batch_format="pyarrow"))
        .groupby("v")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["v"])
        .materialize()
    )
    outdeg = (
        edges.map_batches(
            lambda b: pa.table({"v": b[src_col]}), batch_format="pyarrow"
        )
        .groupby("v")
        .aggregate(Count(alias_name="outdeg"))
    )

    if nodes.count() <= broadcast_max:
        # broadcast path: per iteration ship {src: r // outdeg} once, run ONE
        # dst-keyed groupby-sum, pull the node-scale sums (guarded) back
        od = {r["v"]: int(r["outdeg"]) for r in outdeg.take_all()}
        node_list = [r["v"] for r in nodes.take_all()]
        seed_set = (
            None
            if seeds is None
            else {r["v"] for r in seeds.take_all()}
        )
        ranks_d = {
            v: (scale if seed_set is None or v in seed_set else 0)
            for v in node_list
        }
        e_small = edges.map_batches(
            lambda b: pa.table({"src": b[src_col], "dst": b[dst_col]}),
            batch_format="pyarrow",
        ).materialize()
        for _ in range(n_iters):
            share = {v: ranks_d[v] // od[v] for v in od}
            sref = ray.put(share)

            def contrib_bc(b: pa.Table, _ref=sref) -> pa.Table:
                sh = ray.get(_ref)
                df = pl.from_arrow(b)
                return (
                    df.with_columns(
                        pl.col("src")
                        .replace_strict(
                            list(sh.keys()), list(sh.values()), return_dtype=pl.Int64
                        )
                        .alias("c")
                    )
                    .group_by("dst")
                    .agg(pl.col("c").sum())
                    .to_arrow()
                )

            sums = {
                r["dst"]: int(r["sum(c)"])
                for r in e_small.map_batches(contrib_bc, batch_format="pyarrow")
                .groupby("dst")
                .aggregate(Sum("c"))
                .take_all()
            }
            ranks_d = {
                v: (base if seed_set is None or v in seed_set else 0)
                + (d_num * sums.get(v, 0)) // d_den
                for v in node_list
            }
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_list, pa.large_string()),
                    "rank_scaled": pa.array(
                        [ranks_d[v] for v in node_list], pa.int64()
                    ),
                }
            )
        )

    # (src, dst, outdeg) — built once, reused every iteration
    eo = hash_join(
        edges.map_batches(
            lambda b: pa.table({"v": b[src_col], "dst": b[dst_col]}),
            batch_format="pyarrow",
        ),
        outdeg,
        on="v",
        right_cols=["outdeg"],
    ).materialize()

    if seeds is None:
        nodesf = nodes.map_batches(
            lambda b: pa.table(
                {"v": b["v"], "sd": pa.array(np.ones(b.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        nodesf = hash_join(
            nodes,
            seeds.map_batches(
                lambda b: pa.table(
                    {"v": b["v"], "sd": pa.array(np.ones(b.num_rows, np.int64))}
                ),
                batch_format="pyarrow",
            ),
            on="v",
            right_cols=["sd"],
            how="left",
        ).map_batches(
            lambda b: pa.table(
                {"v": b["v"], "sd": pc.coalesce(b["sd"], pa.scalar(0, pa.int64()))}
            ),
            batch_format="pyarrow",
        ).materialize()

    ranks = nodesf.map_batches(
        lambda b: pa.table(
            {"v": b["v"], "r": pc.multiply(b["sd"], pa.scalar(scale, pa.int64()))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_iters):
        contrib = hash_join(eo, ranks, on="v", right_cols=["r"])

        def part(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b)
            return (
                df.with_columns((pl.col("r") // pl.col("outdeg")).alias("c"))
                .group_by("dst")
                .agg(pl.col("c").sum())
                .to_arrow()
            )

        sums = (
            contrib.map_batches(part, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(
                lambda b: pa.table({"v": b["dst"], "c": b["c"]}),
                batch_format="pyarrow",
            )
        )
        joined = hash_join(nodesf, sums, on="v", right_cols=["c"], how="left")

        def rebase(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b)
            return df.select(
                pl.col("v"),
                (
                    pl.col("sd") * base
                    + (d_num * pl.col("c").fill_null(0)) // d_den
                ).cast(pl.Int64).alias("r"),
            ).to_arrow()

        ranks = joined.map_batches(rebase, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: pa.table({"node": b["v"], "rank_scaled": b["r"]}),
        batch_format="pyarrow",
    )


def comention_pmi(
    mentions: ray.data.Dataset,
    *,
    turn_col: str = "turn",
    ent_col: str = "ent",
    num_buckets: int = 32,
    broadcast_max: int = 2_000_000,
) -> ray.data.Dataset:
    """Entity co-mention pointwise mutual information, whole-bit quantized:
    for every entity pair co-mentioned in a turn,
    ``pmi_bits = flog2(n_ab * N) - flog2(n_a * n_b)`` with
    ``flog2(x) = bit_length(x) - 1`` — the same integer log2 contract the
    unigram-LM surprisal uses (oracle: ``length(bin(x)) - 1``), so the
    iterative-free statistic is bit-exact across engines.

    Stage shape: one turn-keyed bucket sort + block pair generation (the
    fold.py shuffle pattern), one (a, b) pair fold; the entity-count table
    broadcasts once via ``ray.put`` under ``broadcast_max`` entities
    (vectorized lookup) and beyond the guard attaches to the pair stream by
    two key-partitioned hash_joins (n_a on ``a``, n_b on ``b``) — the
    pagerank dual path, equality-pinned in tests. Emits
    (a, b, n_ab, pmi_bits)."""
    import polars as pl
    import ray as _ray
    from ray.data.aggregate import Count

    from ..relational import _bucket_by, hash_join
    from .dedup import _fold_pairs, _group_pair_indices

    m = (
        mentions.groupby([turn_col, ent_col])
        .aggregate(Count(alias_name="_m"))
        .select_columns([turn_col, ent_col])
        .materialize()
    )
    ecounts = (
        m.groupby(ent_col)
        .aggregate(Count(alias_name="n"))
        .materialize()
    )
    n_turns = m.groupby(turn_col).aggregate(Count()).count()

    def pair_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.large_string()), "b": pa.array([], pa.large_string())}
        )
        n = t.num_rows
        if n < 2:
            return empty
        t = t.sort_by([(turn_col, "ascending"), (ent_col, "ascending")])
        tc = t[turn_col]
        tc = tc.combine_chunks() if isinstance(tc, pa.ChunkedArray) else tc
        neq = pc.not_equal(tc.slice(1), tc.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        bounds = np.concatenate([[0], np.flatnonzero(neq) + 1, [n]]).astype(np.int64)
        ents = np.asarray(t[ent_col].to_pylist(), dtype=object)
        ia, jb = _group_pair_indices(bounds)
        if not len(ia):
            return empty
        return pa.table(
            {
                "a": pa.array(list(ents[ia]), pa.large_string()),
                "b": pa.array(list(ents[jb]), pa.large_string()),
            }
        )

    pairs = _fold_pairs(
        m.map_batches(_bucket_by(turn_col, num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(pair_block, batch_format="pyarrow", batch_size=None),
        {"n_ab": pl.len().cast(pl.Int64)},
    )

    if ecounts.count() <= broadcast_max:
        # broadcast path: vocabulary-scale {ent: n} ships once
        n_e = {r[ent_col]: int(r["n"]) for r in ecounts.take_all()}
        eref = _ray.put(n_e)

        def attach_counts(b: pa.Table, _ref=eref) -> pa.Table:
            ne = _ray.get(_ref)
            ks, vs = list(ne.keys()), list(ne.values())
            return (
                pl.from_arrow(b)
                .with_columns(
                    pl.col("a").replace_strict(ks, vs, return_dtype=pl.Int64)
                    .alias("n_a"),
                    pl.col("b").replace_strict(ks, vs, return_dtype=pl.Int64)
                    .alias("n_b"),
                )
                .to_arrow()
            )

        counted = pairs.map_batches(attach_counts, batch_format="pyarrow")
    else:
        # data-sized entity set: two key-partitioned count-attaching joins
        ca = ecounts.map_batches(
            lambda b: pa.table({"a": b[ent_col], "n_a": b["n"]}),
            batch_format="pyarrow",
        )
        cb = ecounts.map_batches(
            lambda b: pa.table({"b": b[ent_col], "n_b": b["n"]}),
            batch_format="pyarrow",
        )
        counted = hash_join(
            hash_join(pairs, ca, on="a", right_cols=["n_a"]),
            cb,
            on="b",
            right_cols=["n_b"],
        )

    def finish(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return pa.table(
                {
                    "a": pa.array([], pa.large_string()),
                    "b": pa.array([], pa.large_string()),
                    "n_ab": pa.array([], pa.int64()),
                    "pmi_bits": pa.array([], pa.int64()),
                }
            )
        n_ab = np.asarray(b["n_ab"].to_pylist(), dtype=np.int64)
        na = np.asarray(b["n_a"].to_pylist(), dtype=np.int64)
        nb = np.asarray(b["n_b"].to_pylist(), dtype=np.int64)

        def flog2(x: np.ndarray) -> np.ndarray:
            # exact for x < 2**53: frexp exponents of exactly-representable ints
            return (np.frexp(x.astype(np.float64))[1] - 1).astype(np.int64)

        pmi = flog2(n_ab * n_turns) - flog2(na * nb)
        return pa.table(
            {
                "a": b["a"],
                "b": b["b"],
                "n_ab": pa.array(n_ab, pa.int64()),
                "pmi_bits": pa.array(pmi, pa.int64()),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow")


def triangles(
    edges: ray.data.Dataset, *, a_col: str = "a", b_col: str = "b"
) -> ray.data.Dataset:
    """Distributed triangle enumeration over an undirected edge set stored as
    ordered pairs (a < b): two key-partitioned hash_joins — wedges
    ``(a,b)·(b,c)`` first, then the closing edge ``(a,c)`` probed on a
    composite key. Because every edge is stored once in (min, max) order,
    each triangle is emitted exactly once as (a < b < c). No broadcast, no
    driver materialization; the wedge join is the classic skew point —
    degree-ordering already bounds it (a wedge's center is the middle vertex
    only when b < c, which the ordered representation enforces)."""
    import polars as pl

    from ..relational import hash_join

    left = edges.map_batches(
        lambda b: pa.table({"a0": b[a_col], "k": b[b_col]}), batch_format="pyarrow"
    )
    right = edges.map_batches(
        lambda b: pa.table({"k": b[a_col], "c": b[b_col]}), batch_format="pyarrow"
    )
    wedges = hash_join(left, right, on="k", right_cols=["c"])

    def wedge_key(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return (
            df.with_columns(
                pl.concat_str([pl.col("a0"), pl.col("c")], separator="\x1f").alias("kk")
            )
            .select(["a0", "k", "c", "kk"])
            .to_arrow()
        )

    def edge_key(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({"x": b[a_col], "y": b[b_col]}))
        return (
            df.with_columns(
                pl.concat_str([pl.col("x"), pl.col("y")], separator="\x1f").alias("kk"),
                pl.lit(1, dtype=pl.Int64).alias("hit"),
            )
            .select(["kk", "hit"])
            .to_arrow()
        )

    closed = hash_join(
        wedges.map_batches(wedge_key, batch_format="pyarrow"),
        edges.map_batches(edge_key, batch_format="pyarrow"),
        on="kk",
        right_cols=["hit"],
    )
    return closed.map_batches(
        lambda b: pa.table({"a": b["a0"], "b": b["k"], "c": b["c"]}),
        batch_format="pyarrow",
    )


def kcore(
    edges: ray.data.Dataset,
    *,
    k: int = 2,
    rounds: int = 4,
    a_col: str = "a",
    b_col: str = "b",
    broadcast_max: int = 2_000_000,
) -> ray.data.Dataset:
    """Fixed-round k-core peeling over an ordered (a < b) edge set: each
    round computes degrees over the CURRENT edge set, keeps nodes with
    ``deg >= k``, and restricts edges to kept endpoints. The contract is
    ``rounds`` peels — deterministic and SQL-unrollable; on graphs whose
    peeling converges faster the result IS the k-core.

    Dual path, the repo's standard split: with at most ``broadcast_max``
    surviving nodes the keep-set ships once per round via ``ray.put`` and the
    edge restriction is one vectorized ``is_in`` filter (ONE exchange per
    round — the degree groupby); beyond the guard both endpoint restrictions
    run as key-partitioned hash_join semi-joins (no driver materialization at
    any node count). The two paths are equality-pinned in
    tests/test_functions.py. Emits surviving (node, deg)."""
    import polars as pl
    from ray.data.aggregate import Count

    from ..relational import hash_join

    def ends(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return pl.concat(
            [df.select(pl.col(c).alias("node")) for c in (a_col, b_col)]
        ).to_arrow()

    e = edges.select_columns([a_col, b_col]).materialize()
    for _ in range(rounds):
        deg = (
            e.map_batches(ends, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="deg"))
            .materialize()
        )
        if deg.count() <= broadcast_max:
            keep_rows = deg.map_batches(
                lambda b: pa.table(
                    {"node": pc.array_filter(b["node"], pc.greater_equal(b["deg"], k))}
                ),
                batch_format="pyarrow",
            ).take_all()
            keep_set = pa.array(sorted(r["node"] for r in keep_rows), pa.large_string())
            kref = ray.put(keep_set)

            def restrict(b: pa.Table, _ref=kref) -> pa.Table:
                ks = ray.get(_ref)
                m = pc.and_(
                    pc.is_in(b[a_col].cast(pa.large_string()), value_set=ks),
                    pc.is_in(b[b_col].cast(pa.large_string()), value_set=ks),
                )
                return b.filter(m)

            e = e.map_batches(restrict, batch_format="pyarrow").materialize()
        else:
            keep = deg.map_batches(
                lambda b: pa.table(
                    {
                        "node": pc.array_filter(
                            b["node"], pc.greater_equal(b["deg"], k)
                        ),
                        "ok": pc.array_filter(
                            pc.cast(pc.greater_equal(b["deg"], k), pa.int64()),
                            pc.greater_equal(b["deg"], k),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            ea = hash_join(
                e.map_batches(
                    lambda b: pa.table({"node": b[a_col], b_col: b[b_col]}),
                    batch_format="pyarrow",
                ),
                keep,
                on="node",
                right_cols=["ok"],
            ).map_batches(
                lambda b: pa.table({a_col: b["node"], "node": b[b_col]}),
                batch_format="pyarrow",
            )
            e = (
                hash_join(ea, keep, on="node", right_cols=["ok"], suffix="_b")
                .map_batches(
                    lambda b: pa.table({a_col: b[a_col], b_col: b["node"]}),
                    batch_format="pyarrow",
                )
                .materialize()
            )
    return (
        e.map_batches(ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )


def entity_cards(
    mentions: ray.data.Dataset,
    has_turn: ray.data.Dataset,
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity PROFILE materialization (the "entity card" table a KG
    serves to applications): mention-edge count, distinct conversations
    reached through hasTurn, and the top co-mentioned entity (count DESC,
    entity ASC ties). Inputs: DISTINCT mention edges (turn, entity) and
    hasTurn edges (conv, turn).

    Every step is key-partitioned (no broadcast, no driver materialization):
    turn-bucketed sort joins mentions<->hasTurn and generates same-turn
    co-mention pairs block-locally; entity-keyed groupbys aggregate counts;
    one final entity-bucketed sort stitches the three facets. Output:
    (entity, n_mentions, n_convs, top_co, top_co_n)."""
    import polars as pl

    from ray.data.aggregate import Count, Sum

    from .hashing import poly_hash_arr

    def bucket_on(col: str):
        def fn(b: pa.Table) -> pa.Table:
            c = b[col]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            h = poly_hash_arr(c) % np.uint64(num_buckets)
            return b.append_column("bucket", pa.array(h.astype(np.int64)))

        return fn

    # ---- facet 1: mention-edge count per entity (one groupby) -------------
    n_mentions = (
        mentions.groupby("entity").aggregate(Count(alias_name="n_mentions"))
    )

    # ---- facets 2+3 ride ONE turn-keyed exchange ---------------------------
    def tag_m(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "turn": b["turn"],
                "entity": b["entity"],
                "conv": pa.nulls(b.num_rows, pa.string()),
            }
        )

    def tag_h(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "turn": b["turn"],
                "entity": pa.nulls(b.num_rows, pa.string()),
                "conv": b["conv"],
            }
        )

    both = (
        mentions.map_batches(tag_m, batch_format="pyarrow")
        .union(has_turn.map_batches(tag_h, batch_format="pyarrow"))
        .map_batches(bucket_on("turn"), batch_format="pyarrow")
        .sort("bucket")
    )

    def per_turn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        m = df.filter(pl.col("entity").is_not_null()).select(["turn", "entity"])
        h = df.filter(pl.col("conv").is_not_null()).select(["turn", "conv"])
        ec = (
            m.join(h, on="turn", how="inner")
            .unique(subset=["entity", "conv"])
            .select(["entity", "conv"])
        )
        pairs = (
            m.join(m, on="turn", how="inner", suffix="_b")
            .filter(pl.col("entity") != pl.col("entity_b"))
            .group_by(["entity", "entity_b"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        # one union'd output: kind 0 = (entity, conv) rows, kind 1 = co-pairs
        out = pl.concat(
            [
                ec.with_columns(
                    pl.lit(0, pl.Int8).alias("kind"),
                    pl.lit(None, pl.String).alias("entity_b"),
                    pl.lit(0, pl.Int64).alias("n"),
                ).select(["kind", "entity", "conv", "entity_b", "n"]),
                pairs.with_columns(
                    pl.lit(1, pl.Int8).alias("kind"),
                    pl.lit(None, pl.String).alias("conv"),
                ).select(["kind", "entity", "conv", "entity_b", "n"]),
            ]
        )
        return out.to_arrow()

    facets = both.map_batches(per_turn, batch_format="pyarrow", batch_size=None)

    def keep_kind(kind: int, cols: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["kind"], kind)).select(cols)

        return fn

    # entity-conv pairs may repeat across turn buckets -> distinct, then count
    n_convs = (
        facets.map_batches(keep_kind(0, ["entity", "conv"]), batch_format="pyarrow")
        .groupby(["entity", "conv"])
        .aggregate(Count(alias_name="_c"))
        .groupby("entity")
        .aggregate(Count(alias_name="n_convs"))
    )
    # co-mention counts merge across buckets, then per-entity top-1
    co = (
        facets.map_batches(
            keep_kind(1, ["entity", "entity_b", "n"]), batch_format="pyarrow"
        )
        .groupby(["entity", "entity_b"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def top1(b: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(b)
            .sort(["entity", "n", "entity_b"], descending=[False, True, False])
            .unique(subset=["entity"], keep="first", maintain_order=True)
        )
        return df.select(
            pl.col("entity"),
            pl.col("entity_b").alias("top_co"),
            pl.col("n").cast(pl.Int64).alias("top_co_n"),
        ).to_arrow()

    top_co = (
        co.map_batches(bucket_on("entity"), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(top1, batch_format="pyarrow", batch_size=None)
    )

    # ---- final stitch: one entity-bucketed sort over the three facets -----
    def pad(kind: int, cols: dict):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            out = {"entity": b["entity"], "kind": pa.array(np.full(n, kind, np.int8))}
            for name, typ in [
                ("n_mentions", pa.int64()),
                ("n_convs", pa.int64()),
                ("top_co", pa.string()),
                ("top_co_n", pa.int64()),
            ]:
                out[name] = (
                    pc.cast(b[cols[name]], typ) if name in cols else pa.nulls(n, typ)
                )
            return pa.table(out)

        return fn

    stitched = (
        n_mentions.map_batches(pad(0, {"n_mentions": "n_mentions"}), batch_format="pyarrow")
        .union(n_convs.map_batches(pad(1, {"n_convs": "n_convs"}), batch_format="pyarrow"))
        .union(
            top_co.map_batches(
                pad(2, {"top_co": "top_co", "top_co_n": "top_co_n"}),
                batch_format="pyarrow",
            )
        )
        .map_batches(bucket_on("entity"), batch_format="pyarrow")
        .sort("bucket")
    )

    def merge(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = df.group_by("entity").agg(
            pl.col("n_mentions").max().fill_null(0).alias("n_mentions"),
            pl.col("n_convs").max().fill_null(0).alias("n_convs"),
            pl.col("top_co").drop_nulls().first().alias("top_co"),
            pl.col("top_co_n").max().fill_null(0).alias("top_co_n"),
        )
        return out.to_arrow()

    return stitched.map_batches(merge, batch_format="pyarrow", batch_size=None)


def bfs_distances(
    edges: ray.data.Dataset,
    seeds: list[str],
    *,
    max_depth: int = 3,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Bounded-depth BFS distances from a seed set over an UNDIRECTED edge
    list (columns ``src``, ``dst``) — the iterative-frontier graph shape
    (k-hop neighborhoods, blast-radius queries). ``dist(v)`` = fewest hops
    from any seed, 0 for seeds, capped at ``max_depth``; unreached nodes are
    absent.

    Scale shape: each round ships ONLY THE FRONTIER through one
    key-partitioned hash_join against the (symmetrized) edge list — settled
    distances never re-shuffle — then a groupby-min folds the candidates.
    The distance table is materialized per round (O(1) lineage, same as
    pagerank's iteration discipline); rounds are bounded by ``max_depth``,
    so the plan is static."""
    import polars as pl

    from ray.data.aggregate import Min as _Min

    from ..relational import hash_join

    def sym(b: pa.Table) -> pa.Table:
        src = b["src"].combine_chunks() if isinstance(b["src"], pa.ChunkedArray) else b["src"]
        dst = b["dst"].combine_chunks() if isinstance(b["dst"], pa.ChunkedArray) else b["dst"]
        return pa.table(
            {
                "src": pa.concat_arrays([src, dst]),
                "dst": pa.concat_arrays([dst, src]),
            }
        )

    edges_sym = edges.map_batches(sym, batch_format="pyarrow").materialize()

    dist = ray.data.from_items([{"node": s, "dist": 0} for s in seeds]).materialize()
    frontier = dist
    for d in range(1, max_depth + 1):
        def fsrc(b: pa.Table, _d=d) -> pa.Table:
            return pa.table({"src": b["node"]})

        cand = hash_join(
            frontier.map_batches(fsrc, batch_format="pyarrow"),
            edges_sym,
            on="src",
            right_cols=["dst"],
            num_buckets=num_buckets,
        )

        def to_dist(b: pa.Table, _d=d) -> pa.Table:
            dst = b["dst"]
            return pa.table(
                {
                    "node": dst,
                    "dist": pa.array(np.full(b.num_rows, _d, np.int64)),
                }
            )

        dist = (
            dist.union(cand.map_batches(to_dist, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(_Min("dist", alias_name="dist"))
            .materialize()
        )

        def at_depth(b: pa.Table, _d=d) -> pa.Table:
            return b.filter(pc.equal(b["dist"], _d))

        frontier = dist.map_batches(at_depth, batch_format="pyarrow")

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b["node"], "dist": pc.cast(b["dist"], pa.int64())}
        )

    return dist.map_batches(fin, batch_format="pyarrow")


def characteristic_sets(
    triples: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """Characteristic-set census (Neumann & Moerkotte, ICDE'11): for every
    subject, the SET of predicates it carries; output one row per distinct
    predicate set with its subject count. The workhorse of RDF schema
    discovery and cardinality estimation — the reference's census family
    (A1-A8, CalculateStatistics.java) counts per-column domains, this counts
    per-SUBJECT schema shapes.

    Scale shape: subjects are hash-bucketed so equal subjects never straddle
    a range partition (the fold.py shuffle invariant), each bucket block
    groups locally (vectorized polars: unique predicates -> sorted ","-join)
    and emits per-(cset) PARTIAL counts, so the only global exchange after
    the bucket sort is a groupby over distinct schema shapes — a set whose
    cardinality is bounded by the vocabulary, not the data (tens to
    thousands at 10^12 triples).
    """
    import polars as pl
    from ray.data.aggregate import Sum

    sel = triples.select_columns(["subj", "pred"])

    def bucket(b: pa.Table) -> pa.Table:
        bk = (
            pl.from_arrow(b)
            .select(pl.col("subj").hash(seed=17).mod(num_buckets).cast(pl.Int32).alias("bucket"))
        )["bucket"]
        return b.append_column("bucket", bk.to_arrow())

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.drop_columns(["bucket"]))
        per_subj = df.group_by("subj").agg(
            pl.col("pred").unique().sort().str.join(",").alias("cset"),
            pl.col("pred").n_unique().cast(pl.Int64).alias("n_preds"),
        )
        part = per_subj.group_by(["cset", "n_preds"]).agg(
            pl.len().cast(pl.Int64).alias("n")
        )
        return part.to_arrow()

    parts = (
        sel.map_batches(bucket, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )
    return parts.groupby(["cset", "n_preds"]).aggregate(Sum("n", alias_name="n_subjects"))


def degree_histogram(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Subject out-degree distribution: (degree, #subjects with that degree).
    Two groupbys; the second runs over the distinct-degree set (log-scale
    cardinality), so the only data-sized exchange is the per-subject count —
    and that one pre-aggregates inside blocks via Ray's groupby combiner."""
    from ray.data.aggregate import Count, Sum

    deg = triples.select_columns(["subj"]).groupby("subj").aggregate(Count(alias_name="deg"))

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {"deg": pc.cast(b["deg"], pa.int64()), "one": pa.nulls(len(b), pa.int64()).fill_null(1)}
        )

    return (
        deg.map_batches(shape, batch_format="pyarrow")
        .groupby("deg")
        .aggregate(Sum("one", alias_name="n_subjects"))
    )


def void_summary(dedup_triples: ray.data.Dataset, rdf_type: str) -> pa.Table:
    """VoID dataset-description summary (the W3C vocabulary every published
    RDF dataset ships): triple count plus distinct subjects / properties /
    objects / classes, over the set-semantics (deduplicated) triple view.

    One pass emits (kind, value) pairs for subj/pred/obj (+ a class pair when
    pred is rdf:type); one groupby dedups pairs, per-block partial counts per
    kind follow, and the driver receives <= 4 x nblocks tiny rows. The triple
    count rides the same stream as a fifth kind (one row per triple, counted
    without dedup), so the whole summary is a single exchange after the fold."""
    import polars as pl
    from ray.data.aggregate import Count, Sum

    def pairs(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        outs = [
            df.select(pl.lit("s").alias("kind"), pl.col("subj").alias("v")),
            df.select(pl.lit("p").alias("kind"), pl.col("pred").alias("v")),
            df.select(pl.lit("o").alias("kind"), pl.col("obj").alias("v")),
            df.filter(pl.col("pred") == rdf_type).select(
                pl.lit("c").alias("kind"), pl.col("obj").alias("v")
            ),
        ]
        return pl.concat(outs).to_arrow()

    distinct = (
        dedup_triples.map_batches(pairs, batch_format="pyarrow")
        .groupby(["kind", "v"])
        .aggregate(Count(alias_name="_n"))
    )

    def per_kind(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["kind"]))
        return df.group_by("kind").agg(pl.len().cast(pl.Int64).alias("n")).to_arrow()

    kind_rows = (
        distinct.map_batches(per_kind, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    counts = {r["kind"]: int(r["n"]) for r in kind_rows}
    n_triples = dedup_triples.count()
    return pa.table(
        {
            "n_triples": pa.array([n_triples], pa.int64()),
            "n_subjects": pa.array([counts.get("s", 0)], pa.int64()),
            "n_properties": pa.array([counts.get("p", 0)], pa.int64()),
            "n_objects": pa.array([counts.get("o", 0)], pa.int64()),
            "n_classes": pa.array([counts.get("c", 0)], pa.int64()),
        }
    )


def literal_stats(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Per-datatype literal census over the triple stream: for every
    (datatype, language) class of literal objects, the count plus min/max
    lexical length — the datatype-profiling pass behind the reference's T3/T4
    narrowing decisions (OptimizeForDatatype.java:27-147), surfaced as a
    queryable table instead of an optimizer internal. Per-block partials
    (count/min/max are all mergeable) keep the exchange at
    #distinct-(dt,lang) rows per block."""
    import polars as pl
    from ray.data.aggregate import Max, Min, Sum

    def part(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["o_kind", "obj", "o_lang", "o_dt"]))
        lit = df.filter(pl.col("o_kind") == 2)
        out = (
            lit.with_columns(
                pl.col("o_dt").fill_null("").alias("dt"),
                pl.col("o_lang").fill_null("").alias("lang"),
                pl.col("obj").str.len_chars().cast(pl.Int64).alias("len"),
            )
            .group_by(["dt", "lang"])
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                pl.col("len").min().alias("min_len"),
                pl.col("len").max().alias("max_len"),
            )
        )
        return out.select(["dt", "lang", "n", "min_len", "max_len"]).to_arrow()

    return (
        triples.map_batches(part, batch_format="pyarrow")
        .groupby(["dt", "lang"])
        .aggregate(
            Sum("n", alias_name="n"),
            Min("min_len", alias_name="min_len"),
            Max("max_len", alias_name="max_len"),
        )
    )


def link_predict(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    scale_bits: int = 20,
    broadcast_max: int = 2_000_000,
) -> ray.data.Dataset:
    """Link prediction over an undirected edge set (ordered pairs a < b) via
    the Resource-Allocation index (Zhou et al. 2009, the integer-exact cousin
    of Adamic-Adar): for every NON-edge pair (u, v) with common neighbors,
    ``ra_scaled = sum_w 2^scale_bits // deg(w)`` over the common neighbors w,
    plus the common-neighbor count. Floor division keeps the score an exact
    integer contract across engines (Adamic-Adar's 1/log deg is float-fuzzy;
    RA's 1/deg needs no log and predicts at least as well in the literature).

    Scale shape: wedges via ONE key-partitioned hash_join of the
    symmetrized edge list with itself (the triangles pattern); existing
    edges removed by a LEFT hash_join anti-filter on the composite pair key;
    one pair-keyed fold sums the scores. Degrees come from a distributed
    groupby on the symmetrized list; with at most ``broadcast_max`` nodes
    the 2^bits//deg share table ships once via ``ray.put`` (vectorized
    lookup), beyond the guard it attaches to the wedge stream by one
    key-partitioned hash_join on the wedge-center key — the pagerank dual
    path, equality-pinned in tests."""
    import polars as pl
    import ray as _ray
    from ray.data.aggregate import Count

    from ..relational import hash_join
    from .dedup import _fold_pairs

    scale = 1 << scale_bits
    edges = edges.select_columns([a_col, b_col]).materialize()

    def symm(b: pa.Table) -> pa.Table:
        fwd = pa.table({"u": b[a_col], "w": b[b_col]})
        rev = pa.table({"u": b[b_col], "w": b[a_col]})
        return pa.concat_tables([fwd, rev])

    s = edges.map_batches(symm, batch_format="pyarrow")
    # deg(v) = symmetrized-endpoint count, distributed (never a driver loop)
    deg_ds = (
        s.map_batches(
            lambda b: pa.table({"k": b["u"]}), batch_format="pyarrow"
        )
        .groupby("k")
        .aggregate(Count(alias_name="deg"))
        .materialize()
    )
    left = s.map_batches(
        lambda b: pa.table({"u": b["u"], "k": b["w"]}), batch_format="pyarrow"
    )
    right = s.map_batches(
        lambda b: pa.table({"k": b["u"], "v": b["w"]}), batch_format="pyarrow"
    )
    wedges = hash_join(left, right, on="k", right_cols=["v"])

    if deg_ds.count() <= broadcast_max:
        # broadcast path: node-scale {center: scale // deg} ships once
        share = {r["k"]: scale // int(r["deg"]) for r in deg_ds.take_all()}
        sref = _ray.put(share)

        def attach_ra(b: pa.Table, _ref=sref) -> pa.Table:
            sh = _ray.get(_ref)
            return (
                pl.from_arrow(b)
                .with_columns(
                    pl.col("k")
                    .replace_strict(
                        list(sh.keys()), list(sh.values()), return_dtype=pl.Int64
                    )
                    .alias("ra")
                )
                .to_arrow()
            )

        scored_in = wedges.map_batches(attach_ra, batch_format="pyarrow")
    else:
        # data-sized node set: key-partitioned deg-attaching join instead
        scored_in = hash_join(
            wedges, deg_ds, on="k", right_cols=["deg"]
        ).map_batches(
            lambda b: pl.from_arrow(b)
            .with_columns((scale // pl.col("deg")).cast(pl.Int64).alias("ra"))
            .drop("deg")
            .to_arrow(),
            batch_format="pyarrow",
        )

    def score_rows(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).filter(pl.col("u") < pl.col("v"))
        return df.select(
            pl.col("u").alias("a"),
            pl.col("v").alias("b"),
            pl.concat_str([pl.col("u"), pl.col("v")], separator="\x1f").alias("kk"),
            pl.col("ra").cast(pl.Int64),
        ).to_arrow()

    def edge_key(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({"x": b[a_col], "y": b[b_col]}))
        return (
            df.select(
                pl.concat_str([pl.col("x"), pl.col("y")], separator="\x1f").alias("kk"),
                pl.lit(1, dtype=pl.Int64).alias("hit"),
            )
            .to_arrow()
        )

    non_edges = hash_join(
        scored_in.map_batches(score_rows, batch_format="pyarrow"),
        edges.map_batches(edge_key, batch_format="pyarrow"),
        on="kk",
        right_cols=["hit"],
        how="left",
    ).map_batches(
        lambda b: b.filter(pc.is_null(b["hit"])).drop_columns(["kk", "hit"]),
        batch_format="pyarrow",
    )
    return _fold_pairs(
        non_edges,
        {
            "ra_scaled": pl.col("ra").sum().cast(pl.Int64),
            "n_common": pl.len().cast(pl.Int64),
        },
    )


def shacl_validate(
    triples: ray.data.Dataset,
    shapes: list[dict],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SHACL-lite node-shape validation — the KG-construction QA pass the
    reference's read-only store has no analog of: each shape constrains the
    cardinality of one predicate on subjects of one class,
    ``{"cls": C, "pred": p, "min": lo, "max": hi}`` (``max`` None =
    unbounded, sh:minCount / sh:maxCount semantics). Output: one row per
    violation — (subj, cls, pred, n, kind) with kind "min" / "max"; a
    subject of class C with ZERO p-triples violates a min >= 1 shape (the
    absence case most validators get wrong under distribution).

    Scale shape: only the shape-relevant predicates (plus rdf:type rows of
    the shaped classes) are selected at the read; subjects hash-bucket so a
    subject's rows never straddle a partition, and validation is one
    vectorized polars pass per block — counts, the class join, and BOTH
    violation directions, absence included, entirely block-local. No
    exchange after the bucket sort; output is violation-sized."""
    import polars as pl

    for s in shapes:
        if s.get("min", 0) < 0 or (s.get("max") is not None and s["max"] < s.get("min", 0)):
            raise ValueError(f"malformed shape: {s}")
    shaped_cls = sorted({s["cls"] for s in shapes})
    shaped_pred = sorted({s["pred"] for s in shapes})
    shape_df_rows = [
        {
            "cls": s["cls"],
            "pred": s["pred"],
            "lo": int(s.get("min", 0)),
            "hi": -1 if s.get("max") is None else int(s["max"]),
        }
        for s in shapes
    ]

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.is_in(b["pred"], value_set=pa.array(shaped_pred, pa.string())),
            pc.and_(
                pc.equal(b["pred"], RDF_TYPE),
                pc.is_in(b["obj"], value_set=pa.array(shaped_cls, pa.string())),
            ),
        )
        t = b.select(["subj", "pred", "obj"]).filter(keep)
        bk = (
            pl.from_arrow(t)
            .select(
                pl.col("subj").hash(seed=17).mod(num_buckets).cast(pl.Int32).alias("bucket")
            )
        )["bucket"]
        return t.append_column("bucket", bk.to_arrow())

    empty = pa.table(
        {
            "subj": pa.array([], pa.large_string()),
            "cls": pa.array([], pa.large_string()),
            "pred": pa.array([], pa.large_string()),
            "n": pa.array([], pa.int64()),
            "kind": pa.array([], pa.large_string()),
        }
    )

    def block(b: pa.Table) -> pa.Table:
        # RDF set semantics: cardinalities count DISTINCT triples; a subject's
        # rows are bucket-complete, so the local unique() is the global one
        df = pl.from_arrow(b.drop_columns(["bucket"])).unique()
        if not df.height:
            return empty
        sh = pl.DataFrame(shape_df_rows)
        typ = (
            df.filter(pl.col("pred") == RDF_TYPE)
            .select(pl.col("subj"), pl.col("obj").alias("cls"))
            .unique()
        )
        if not typ.height:
            return empty
        cnt = (
            df.filter(pl.col("pred") != RDF_TYPE)
            .group_by(["subj", "pred"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
        )
        # every (shaped subject, shape) pair — LEFT join so absence counts 0
        full = (
            typ.join(sh, on="cls")
            .join(cnt, on=["subj", "pred"], how="left")
            .with_columns(pl.col("n").fill_null(0))
        )
        out = full.with_columns(
            pl.when(pl.col("n") < pl.col("lo"))
            .then(pl.lit("min"))
            .when((pl.col("hi") >= 0) & (pl.col("n") > pl.col("hi")))
            .then(pl.lit("max"))
            .otherwise(pl.lit(None))
            .alias("kind")
        ).drop_nulls("kind")
        return out.select(["subj", "cls", "pred", "n", "kind"]).to_arrow()

    return (
        triples.map_batches(prep, batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def rdfs_infer_types(
    triples: ray.data.Dataset,
    *,
    domains: dict[str, str],
    ranges: dict[str, str],
    subclass_of: dict[str, str],
) -> ray.data.Dataset:
    """RDFS entailment for the type system (rules rdfs2/rdfs3/rdfs9/rdfs11):
    materialize the COMPLETE entailed ``rdf:type`` set — asserted types,
    domain/range-inferred types (``(s p o)`` with ``domain(p)=C`` entails
    ``s rdf:type C``; ``range(p)=C`` entails it for the object), all closed
    upward over the ``subClassOf`` hierarchy. Output: DISTINCT (node, type).

    Scale shape: the ontology is schema-sized — the subclass TRANSITIVE
    closure is computed once on the driver (cycle-checked) and shipped in the
    task closure together with the domain/range maps; per block one
    vectorized pyarrow pass emits candidate (node, class) rows and explodes
    them through the closure (take-gather, no Python per row); ONE distinct
    exchange (groupby on the pair) finishes. The data never joins the
    ontology — entailment here is a map, not a join."""
    import polars as pl

    # driver-side transitive closure over the (tiny) class hierarchy
    closure: dict[str, list[str]] = {}
    classes = set(subclass_of) | set(subclass_of.values()) | set(domains.values()) | set(ranges.values())
    for c in classes:
        seen, cur = [c], subclass_of.get(c)
        while cur is not None:
            if cur in seen:
                raise ValueError(f"subClassOf cycle through {cur!r}")
            seen.append(cur)
            cur = subclass_of.get(cur)
        closure[c] = seen

    dom_k = pa.array(sorted(domains), pa.large_string())
    dom_v = pa.array([domains[k] for k in sorted(domains)], pa.large_string())
    rng_k = pa.array(sorted(ranges), pa.large_string())
    rng_v = pa.array([ranges[k] for k in sorted(ranges)], pa.large_string())

    def infer(b: pa.Table) -> pa.Table:
        pred = pc.cast(b["pred"], pa.large_string())
        subj = pc.cast(b["subj"], pa.large_string())
        obj = pc.cast(b["obj"], pa.large_string())
        outs = []
        # asserted types
        is_type = pc.equal(pred, RDF_TYPE)
        outs.append(
            pa.table({"node": subj.filter(is_type), "cls": obj.filter(is_type)})
        )
        # rdfs2: domain typing of subjects
        di = pc.index_in(pred, value_set=dom_k)
        has_d = pc.is_valid(di)
        outs.append(
            pa.table(
                {"node": subj.filter(has_d), "cls": pc.take(dom_v, di.filter(has_d))}
            )
        )
        # rdfs3: range typing of IRI/bnode objects (literals have no type here)
        ri = pc.index_in(pred, value_set=rng_k)
        has_r = pc.and_(
            pc.is_valid(ri), pc.not_equal(pc.cast(b["o_kind"], pa.int32()), 2)
        )
        outs.append(
            pa.table(
                {"node": obj.filter(has_r), "cls": pc.take(rng_v, ri.filter(has_r))}
            )
        )
        cand = pa.concat_tables(outs)
        if cand.num_rows == 0:
            return pa.table(
                {"node": pa.array([], pa.large_string()), "cls": pa.array([], pa.large_string())}
            )
        # rdfs9/rdfs11: explode through the precomputed subclass closure
        df = pl.from_arrow(cand)
        cl = pl.DataFrame(
            {
                "cls": list(closure),
                "anc": [closure[c] for c in closure],
            }
        )
        out = (
            df.join(cl, on="cls", how="left")
            .with_columns(pl.col("anc").fill_null([]))
            .with_columns(
                # a class outside the ontology still entails itself
                pl.when(pl.col("anc").list.len() == 0)
                .then(pl.concat_list(pl.col("cls")))
                .otherwise(pl.col("anc"))
                .alias("anc")
            )
            .explode("anc")
            .select(pl.col("node"), pl.col("anc").alias("cls"))
            .unique()
        )
        return out.to_arrow()

    from ray.data.aggregate import Count

    return (
        triples.map_batches(infer, batch_format="pyarrow")
        .groupby(["node", "cls"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
    )


def lpa_communities(
    edges: ray.data.Dataset,
    *,
    a_col: str = "a",
    b_col: str = "b",
    rounds: int = 2,
) -> ray.data.Dataset:
    """Community detection via synchronous label propagation (Raghavan et al.
    2007), run for a FIXED number of rounds with a deterministic update rule
    — new label = the most frequent label among neighbors, ties to the
    smallest label — so the iterative result is a reproducible contract
    (free-running LPA oscillates; a bounded-round deterministic variant is
    the oracle-comparable form, like the engine's fixed-iteration PageRank).
    Returns (node, label) after ``rounds`` updates from label(v) = v.

    Scale shape per round: one ``hash_join`` ships each node's current label
    to its incident edges (labels and edges both stay distributed), one
    (node, label) groupby counts neighbor labels, and the argmax folds
    block-locally after a node-bucketed sort. State materializes per round —
    O(1) lineage, no driver materialization at any point."""
    import polars as pl

    from ..relational import hash_join

    def symm(b: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"u": b[a_col], "w": b[b_col]}),
                pa.table({"u": b[b_col], "w": b[a_col]}),
            ]
        )

    s = edges.select_columns([a_col, b_col]).map_batches(
        symm, batch_format="pyarrow"
    ).materialize()
    labels = (
        s.groupby("u")
        .aggregate(Min("w", alias_name="_m"))
        .map_batches(
            lambda b: pa.table({"node": b["u"], "label": b["u"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    from ray.data.aggregate import Count

    for _ in range(rounds):
        contribs = hash_join(
            s.map_batches(
                lambda b: pa.table({"node": b["w"], "u": b["u"]}),
                batch_format="pyarrow",
            ),
            labels,
            on="node",
            right_cols=["label"],
        )
        counted = (
            contribs.select_columns(["u", "label"])
            .groupby(["u", "label"])
            .aggregate(Count(alias_name="c"))
        )

        def argmax(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b)
            if not df.height:
                return pa.table(
                    {
                        "node": pa.array([], pa.large_string()),
                        "label": pa.array([], pa.large_string()),
                    }
                )
            out = (
                df.sort(["u", "c", "label"], descending=[False, True, False])
                .group_by("u", maintain_order=True)
                .agg(pl.col("label").first())
                .rename({"u": "node"})
            )
            return out.to_arrow()

        labels = (
            counted.sort("u")
            .map_batches(argmax, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    return labels


def scc_distributed(
    edges: ray.data.Dataset,
    nodes: ray.data.Dataset | None = None,
    max_outer: int = 32,
    max_inner: int = 64,
) -> ray.data.Dataset:
    """Strongly connected components over a DIRECTED edge list (string
    columns ``src``, ``dst``). Returns (node, scc) with scc = the component's
    lexicographic-MAX node id. Coloring algorithm (Orzan 2004 / the MultiStep
    family -- public literature; the reference has no graph algorithms):

    per outer round, on the remaining subgraph:

    1. **trim** to a fixpoint: a node with no remaining in-edge or no
       remaining out-edge is a singleton SCC (peels DAG tails/chains fast);
    2. **color**: forward MAX-label propagation to a fixpoint --
       ``color(v)`` = the largest node id that reaches v (v included);
    3. a node with ``color(v) == v`` is a color ROOT r; r's SCC is exactly
       the backward-reachable set of r along edges whose two endpoints share
       color r (any member m reaches r and r reaches m; m <= r because
       color(r) = r). All roots resolve in parallel in one backward
       fixpoint;
    4. emit those SCCs, drop their nodes/edges, repeat on the remainder.

    Fully distributed: per-round state (edges, nodes, labels) stays in
    Datasets co-located by one sort exchange per step -- the driver sees only
    8-byte fingerprints and counts. Rounds are BFS-like: inner fixpoints cost
    O(diameter), outer rounds O(nesting depth of non-root color classes);
    both RAISE on exhaustion rather than returning a partial labeling. At
    web scale prefer per-partition-key scoping (this engine's
    conversation-scoped transition graphs keep every fixpoint
    conversation-local) or FW-BW pivoting for one giant component."""
    import polars as pl

    # ---- schema-free sort-based primitives. NO .schema() probes and NO
    # generic hash_join here: building a join plan must never execute
    # upstream lineage (hash_join probes schemas eagerly), because a fixpoint
    # loop over an eager-probing join re-executes its whole lazy prefix every
    # round — measured super-linear blowup. Instead: tag + union + one
    # sort(key) exchange + per-key-run polars window, the same message-
    # passing shape as connected_components_distributed above.

    def _i8(n: int, v: int) -> pa.Array:
        return pa.array(np.full(n, v, dtype=np.int8))

    # Every sort emits ~one block per input block and every union adds them,
    # so the nested fixpoint loops compound the block count geometrically and
    # per-exchange scheduling cost follows (measured: 3 -> 1815 blocks and
    # 0.04s -> 163s per materialize on a 10-edge graph). Re-bin each
    # materialized round state to the INPUT edge list's own block count —
    # data-derived, so the same plan holds at toy and web scale.
    block_cap = 1 << 62  # seed materializations are uncapped

    def _mat(ds) -> ray.data.Dataset:
        m = ds.materialize()
        if m.num_blocks() > block_cap:
            m = m.repartition(block_cap).materialize()
        return m

    def _semi_sort(base, base_cols, keys, key_col, on, anti=False):
        """``base`` rows whose ``on`` value appears (anti: does not appear)
        in ``keys[key_col]``. One sort exchange; duplicate keys are fine."""

        def wb(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in base_cols}
            cols["_t"] = _i8(t.num_rows, 0)
            return pa.table(cols)

        def wk(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                c: (t[key_col] if c == on else pa.nulls(n, pa.string()))
                for c in base_cols
            }
            cols["_t"] = _i8(n, 1)
            return pa.table(cols)

        def blk(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            hit = pl.col("_t").max().over(on) == 1
            keep = hit.not_() if anti else hit
            return df.filter((pl.col("_t") == 0) & keep).drop("_t").to_arrow()

        return (
            base.map_batches(wb, batch_format="pyarrow")
            .union(keys.map_batches(wk, batch_format="pyarrow"))
            .sort(on)
            .map_batches(blk, batch_format="pyarrow", batch_size=None)
        )

    def _attach(ds, ds_cols, labels, key):
        """``ds`` rows + a ``label`` column looked up from ``labels`` (node,
        label) by ``ds[key] == labels.node``; NULL where the key has no
        label row. One sort exchange (equal keys never straddle blocks)."""

        def wd(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in ds_cols}
            cols["label"] = pa.nulls(t.num_rows, pa.string())
            cols["_t"] = _i8(t.num_rows, 0)
            return pa.table(cols)

        def wl(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                c: (t["node"] if c == key else pa.nulls(n, pa.string()))
                for c in ds_cols
            }
            cols["label"] = t["label"]
            cols["_t"] = _i8(n, 1)
            return pa.table(cols)

        def blk(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            return (
                df.with_columns(pl.col("label").max().over(key).alias("label"))
                .filter(pl.col("_t") == 0)
                .drop("_t")
                .to_arrow()
            )

        return (
            ds.map_batches(wd, batch_format="pyarrow")
            .union(labels.map_batches(wl, batch_format="pyarrow"))
            .sort(key)
            .map_batches(blk, batch_format="pyarrow", batch_size=None)
        )

    def _self_labeled(ds):
        return ds.map_batches(
            lambda t: pa.table({"node": t["node"], "scc": t["node"]}),
            batch_format="pyarrow",
        ).materialize()

    if nodes is None:
        nodes = edges.map_batches(
            lambda t: pa.table(
                {
                    "node": pc.unique(
                        pa.concat_arrays(
                            [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        ).groupby("node").aggregate(Min("node", alias_name="__d")).map_batches(
            lambda t: t.drop_columns("__d"), batch_format="pyarrow"
        )
    E = edges.materialize()
    block_cap = max(8, E.num_blocks())
    N = _mat(nodes)
    done: list[ray.data.Dataset] = []

    for _ in range(max_outer):
        if N.count() == 0:
            if not done:
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "node": pa.array([], pa.string()),
                            "scc": pa.array([], pa.string()),
                        }
                    )
                )
            out = done[0]
            for d in done[1:]:
                out = out.union(d)
            return out
        # ---- 1. trim fixpoint: a node missing a remaining in-edge or
        # out-edge is a singleton SCC (peels DAG tails/chains). One sort
        # exchange per pass computes both degree flags.
        for _t in range(max_inner):
            if E.count() == 0:
                done.append(_self_labeled(N))
                N = ray.data.from_arrow(
                    pa.table({"node": pa.array([], pa.string())})
                ).materialize()
                break

            def flag_blk(t: pa.Table) -> pa.Table:
                df = pl.from_arrow(t)
                return (
                    df.with_columns(
                        (
                            (pl.col("_o").max().over("node") == 1)
                            & (pl.col("_i").max().over("node") == 1)
                        )
                        .cast(pl.Int8)
                        .alias("alive")
                    )
                    .filter(pl.col("_n") == 1)
                    .select("node", "alive")
                    .to_arrow()
                )

            flags = (
                N.map_batches(
                    lambda t: pa.table(
                        {
                            "node": t["node"],
                            "_n": _i8(t.num_rows, 1),
                            "_o": _i8(t.num_rows, 0),
                            "_i": _i8(t.num_rows, 0),
                        }
                    ),
                    batch_format="pyarrow",
                )
                .union(
                    E.map_batches(
                        lambda t: pa.table(
                            {
                                "node": t["src"],
                                "_n": _i8(t.num_rows, 0),
                                "_o": _i8(t.num_rows, 1),
                                "_i": _i8(t.num_rows, 0),
                            }
                        ),
                        batch_format="pyarrow",
                    )
                )
                .union(
                    E.map_batches(
                        lambda t: pa.table(
                            {
                                "node": t["dst"],
                                "_n": _i8(t.num_rows, 0),
                                "_o": _i8(t.num_rows, 0),
                                "_i": _i8(t.num_rows, 1),
                            }
                        ),
                        batch_format="pyarrow",
                    )
                )
                .sort("node")
                .map_batches(flag_blk, batch_format="pyarrow", batch_size=None)
            )
            flags = _mat(flags)
            keep = _mat(
                flags.map_batches(
                    lambda t: t.filter(pc.equal(t["alive"], 1)).drop_columns("alive"),
                    batch_format="pyarrow",
                )
            )
            if keep.count() == N.count():
                break
            done.append(
                _self_labeled(
                    flags.map_batches(
                        lambda t: t.filter(pc.equal(t["alive"], 0)).drop_columns(
                            "alive"
                        ),
                        batch_format="pyarrow",
                    )
                )
            )
            N = keep
            E = _mat(
                _semi_sort(
                    _semi_sort(E, ("src", "dst"), N, "node", on="src"),
                    ("src", "dst"),
                    N,
                    "node",
                    on="dst",
                )
            )
        else:
            raise RuntimeError(f"SCC trim did not converge in {max_inner} passes")
        if N.count() == 0:
            continue
        # ---- 2. forward MAX-coloring fixpoint: color(v) = max id reaching v
        labels = _mat(
            N.map_batches(
                lambda t: pa.table({"node": t["node"], "label": t["node"]}),
                batch_format="pyarrow",
            )
        )
        fp = _label_fingerprint(labels)
        for _c in range(max_inner):
            msgs = _attach(E, ("src", "dst"), labels, key="src").map_batches(
                lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
                batch_format="pyarrow",
            )
            labels = _mat(
                labels.union(msgs)
                .groupby("node")
                .aggregate(Max("label", alias_name="label"))
            )
            fp2 = _label_fingerprint(labels)
            if fp2 == fp:
                break
            fp = fp2
        else:
            raise RuntimeError(f"SCC coloring did not converge in {max_inner} rounds")
        # ---- 3. backward reachability from each color root, restricted to
        # edges whose endpoints share the color (sufficient: every vertex on
        # a v->root path inside a color class keeps that class's color)
        e1 = _attach(E, ("src", "dst"), labels, key="src").map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"], "c_src": t["label"]}),
            batch_format="pyarrow",
        )
        ec = _mat(
            _attach(e1, ("src", "dst", "c_src"), labels, key="dst").map_batches(
                lambda t: t.filter(pc.equal(t["c_src"], t["label"])).select(
                    ["src", "dst"]
                ),
                batch_format="pyarrow",
            )
        )
        reached = _mat(
            labels.map_batches(
                lambda t: t.filter(pc.equal(t["node"], t["label"])),
                batch_format="pyarrow",
            )
        )
        fp = _label_fingerprint(reached)
        for _b in range(max_inner):
            msgs = _attach(ec, ("src", "dst"), reached, key="dst").map_batches(
                lambda t: pa.table(
                    {"node": t["src"], "label": t["label"]}
                ).filter(pc.is_valid(t["label"])),
                batch_format="pyarrow",
            )
            reached = _mat(
                reached.union(msgs)
                .groupby("node")
                .aggregate(Max("label", alias_name="label"))
            )
            fp2 = _label_fingerprint(reached)
            if fp2 == fp:
                break
            fp = fp2
        else:
            raise RuntimeError(
                f"SCC backward pass did not converge in {max_inner} rounds"
            )
        done.append(
            reached.map_batches(
                lambda t: pa.table({"node": t["node"], "scc": t["label"]}),
                batch_format="pyarrow",
            ).materialize()
        )
        # ---- 4. drop resolved nodes and their edges; iterate on the rest
        N = _mat(_semi_sort(N, ("node",), reached, "node", on="node", anti=True))
        E = _mat(
            _semi_sort(
                _semi_sort(E, ("src", "dst"), reached, "node", on="src", anti=True),
                ("src", "dst"),
                reached,
                "node",
                on="dst",
                anti=True,
            )
        )
    raise RuntimeError(f"SCC did not resolve every node in {max_outer} outer rounds")


def _tarjan_iter(si: np.ndarray, di: np.ndarray, n: int) -> np.ndarray:
    """Iterative Tarjan over an integer-encoded edge list — component id per
    node. Explicit call stack (no recursion limit), CSR adjacency from one
    argsort; O(V + E) per partition."""
    order = np.argsort(si, kind="stable")
    d_sorted = di[order]
    starts = np.searchsorted(si[order], np.arange(n + 1))
    index = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    onstack = np.zeros(n, bool)
    comp = np.full(n, -1, np.int64)
    it = starts[:-1].copy()
    stack: list[int] = []
    counter = 0
    ncomp = 0
    for root in range(n):
        if index[root] != -1:
            continue
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        onstack[root] = True
        call = [root]
        while call:
            v = call[-1]
            if it[v] < starts[v + 1]:
                w = int(d_sorted[it[v]])
                it[v] += 1
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    onstack[w] = True
                    call.append(w)
                elif onstack[w] and index[w] < low[v]:
                    low[v] = index[w]
            else:
                call.pop()
                if call and low[v] < low[call[-1]]:
                    low[call[-1]] = low[v]
                if low[v] == index[v]:
                    while True:
                        w = stack.pop()
                        onstack[w] = False
                        comp[w] = ncomp
                        if w == v:
                            break
                    ncomp += 1
    return comp


def scc_partition_scoped(
    edges: ray.data.Dataset,
    *,
    part_col: str = "part",
    num_buckets: int = 32,
    stats: dict | None = None,
    max_outer: int = 32,
    max_inner: int = 64,
) -> ray.data.Dataset:
    """SCCs over a DIRECTED edge list (``src``, ``dst``) carrying a
    partition key per edge (``part_col`` — e.g. the conversation id of a
    conversation-scoped transition graph). Output contract identical to
    :func:`scc_distributed`: (node, scc), scc = the component's
    lexicographic-MAX node id.

    This is the job-floor amortization the scc_distributed docstring
    promises: a partition whose node set touches NO other partition is
    closed under reachability in both directions, so its SCCs resolve
    entirely inside ONE ``map_batches`` job — each bucket-sorted block runs
    iterative Tarjan per partition locally, no per-round driver
    coordination. Only the residue — partitions that SHARE a node with
    another partition, where an SCC could genuinely span the key — goes
    through the distributed trim+color fixpoints, and only when it is
    non-empty. Cost: three metadata-scale exchanges to find boundary nodes
    and split the edge set, one bucket sort for the local pass, plus the
    distributed rounds on the (normally tiny or empty) residue.

    ``stats`` (optional dict) receives ``n_clean_edges`` / ``n_dirty_edges``
    / ``dirty_ran`` so tests can assert which path fired at volume."""
    import polars as pl
    from ray.data.aggregate import Count

    from ..relational import _bucket_by, hash_join

    E = edges.select_columns(["src", "dst", part_col]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [b["src"].combine_chunks(), b["dst"].combine_chunks()]
                ),
                part_col: pa.concat_arrays(
                    [b[part_col].combine_chunks(), b[part_col].combine_chunks()]
                ),
            }
        )

    endpoints_ds = E.map_batches(endpoints, batch_format="pyarrow")
    # boundary node ⟺ it appears under >1 distinct partition key ⟺
    # min(part) != max(part) — ONE combiner-aggregated exchange, no
    # distinct-pairs shuffle; the common all-clean case pays exactly this
    # plus the bucket sort below.
    boundary = (
        endpoints_ds.groupby("node")
        .aggregate(
            Min(part_col, alias_name="_pmin"), Max(part_col, alias_name="_pmax")
        )
        .map_batches(
            lambda b: b.filter(
                pc.not_equal(b["_pmin"], b["_pmax"])
            ).select(["node"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    if boundary.count():
        dirty_parts = (
            hash_join(endpoints_ds, boundary, on="node", right_cols=[])
            .groupby(part_col)
            .aggregate(Count(alias_name="_m"))
            .select_columns([part_col])
            .materialize()
        )
        flagged = hash_join(
            E,
            dirty_parts.map_batches(
                lambda b: pa.table(
                    {
                        part_col: b[part_col],
                        "_dirty": pa.array(np.ones(b.num_rows, np.int8)),
                    }
                ),
                batch_format="pyarrow",
            ),
            on=part_col,
            right_cols=["_dirty"],
            how="left",
        ).materialize()
        clean = flagged.map_batches(
            lambda b: b.filter(pc.is_null(b["_dirty"])).drop_columns(["_dirty"]),
            batch_format="pyarrow",
        )
        dirty = flagged.map_batches(
            lambda b: b.filter(pc.is_valid(b["_dirty"])).select(["src", "dst"]),
            batch_format="pyarrow",
        ).materialize()
    else:
        clean, dirty = E, None

    def local_scc(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table(
                {"node": pa.array([], pa.string()), "scc": pa.array([], pa.string())}
            )
        df = pl.from_arrow(t)
        outs = []
        for g in df.partition_by(part_col):
            src = g["src"].to_list()
            dst = g["dst"].to_list()
            nodes = sorted(set(src) | set(dst))
            idx = {x: i for i, x in enumerate(nodes)}
            si = np.fromiter((idx[x] for x in src), np.int64, len(src))
            di = np.fromiter((idx[x] for x in dst), np.int64, len(dst))
            comp = _tarjan_iter(si, di, len(nodes))
            outs.append(
                pl.DataFrame({"node": nodes, "_c": comp}).select(
                    pl.col("node"),
                    pl.col("node").max().over("_c").alias("scc"),
                )
            )
        return pl.concat(outs).to_arrow()

    local = (
        clean.map_batches(_bucket_by(part_col, num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(local_scc, batch_format="pyarrow", batch_size=None)
    )
    if stats is not None:
        stats["n_dirty_edges"] = dirty.count() if dirty is not None else 0
        stats["dirty_ran"] = dirty is not None
        stats["n_clean_edges"] = E.count() - stats["n_dirty_edges"]
    if dirty is None:
        return local
    residue = scc_distributed(dirty, max_outer=max_outer, max_inner=max_inner)
    return local.union(residue)


def scc_demo_edges(sf_dir: str) -> ray.data.Dataset:
    """Deterministic DIRECTED edge list for the driver-contract SCC query:
    every document spawns one directed cycle of length ``3 + doc_id % 5``
    (nodes ``c<doc8>x<j>``, a genuine multi-node SCC whose max node is
    ``c<doc8>x<k-1>``) plus a 2-node directed tail hanging off cycle node 0
    (``t<doc8>x0 -> t<doc8>x1``, singleton SCCs that exercise the trim
    phase). Mirrored exactly by oracles_td.scc_oracle's transitive-closure
    definition of SCC."""
    import polars as pl

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def gen(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = 3 + (d % 5)
        # ragged per-doc arange 0..k-1 (vectorized, no Python loop)
        total = int(k.sum())
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(k)[:-1]])
        j = np.arange(total, dtype=np.int64) - np.repeat(offs, k)
        doc_rep = np.repeat(d, k)
        k_rep = np.repeat(k, k)
        df = pl.DataFrame({"d": doc_rep, "j": j, "jn": (j + 1) % k_rep})
        d8 = pl.col("d").cast(pl.Utf8).str.zfill(8)
        cyc = df.select(
            ("c" + d8 + "x" + pl.col("j").cast(pl.Utf8)).alias("src"),
            ("c" + d8 + "x" + pl.col("jn").cast(pl.Utf8)).alias("dst"),
        )
        td = pl.DataFrame({"d": d})
        d8t = pl.col("d").cast(pl.Utf8).str.zfill(8)
        tails = pl.concat(
            [
                td.select(
                    ("c" + d8t + "x0").alias("src"), ("t" + d8t + "x0").alias("dst")
                ),
                td.select(
                    ("t" + d8t + "x0").alias("src"), ("t" + d8t + "x1").alias("dst")
                ),
            ]
        )
        return pl.concat([cyc, tails]).to_arrow()

    return ds.map_batches(gen, batch_format="pyarrow").repartition(8)


def sssp_distances(
    edges: ray.data.Dataset,
    seeds: list[str] | ray.data.Dataset,
    *,
    max_rounds: int = 24,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Weighted single-source(-set) shortest paths over a DIRECTED edge list
    (columns ``src``, ``dst``, integer ``w`` >= 0) — distributed Bellman-Ford
    with the frontier optimization: per round only the nodes whose distance
    IMPROVED last round re-send ``dist + w`` along their out-edges, so
    settled regions stop shuffling (the delta-stepping family's
    message-passing core; the reference has no graph algorithms —
    this extends :func:`bfs_distances` from hop counts to weights).

    Per round: ONE key-partitioned hash_join ships the frontier to its
    out-edges, one tag+union+sort(node) exchange folds candidates into the
    distance table and flags improvements block-locally (equal keys never
    straddle blocks after ``Dataset.sort``); the table materializes per round
    (O(1) lineage, pagerank's iteration discipline) and the driver sees only
    a row count per round. Terminates when no distance improves; RAISES on
    round exhaustion rather than returning a partial relaxation. Unreached
    nodes are absent; integer weights keep the min-fold exact. ``seeds``
    may be a list or a Dataset with column ``node`` (kept distributed —
    large seed sets never reach the driver). Negative weights are legal on
    a DAG (rounds bounded by depth): ``topo_layers`` runs this with w = -1
    to get longest-path layers."""
    import polars as pl

    # per-round states re-bin to the edge list's own block count — the sort
    # and hash_join exchanges otherwise compound the block count round over
    # round (the lesson scc_distributed pins above)
    E = edges.materialize()
    block_cap = max(8, E.num_blocks())

    def _mat(ds) -> ray.data.Dataset:
        m = ds.materialize()
        if m.num_blocks() > block_cap:
            m = m.repartition(block_cap).materialize()
        return m

    if isinstance(seeds, ray.data.Dataset):
        # seed Dataset (column "node"): stays distributed — no driver list
        dist = _mat(
            seeds.map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "dist": pa.array(np.zeros(b.num_rows, np.int64)),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    else:
        dist = ray.data.from_items(
            [{"node": s, "dist": 0} for s in seeds]
        ).materialize()
    frontier = dist
    for _ in range(max_rounds):
        if frontier.count() == 0:
            return dist.map_batches(
                lambda b: pa.table(
                    {"node": b["node"], "dist": pc.cast(b["dist"], pa.int64())}
                ),
                batch_format="pyarrow",
            )

        from ..relational import hash_join

        cand = hash_join(
            frontier.map_batches(
                lambda b: pa.table({"src": b["node"], "d0": b["dist"]}),
                batch_format="pyarrow",
            ),
            E,
            on="src",
            right_cols=["dst", "w"],
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"],
                    "dist": pc.add_checked(
                        pc.cast(b["d0"], pa.int64()), pc.cast(b["w"], pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )

        def tag(side: int):
            def fn(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "node": b["node"],
                        "dist": pc.cast(b["dist"], pa.int64()),
                        "_t": pa.array(np.full(b.num_rows, side, np.int8)),
                    }
                )

            return fn

        def fold(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b)
            cand_min = pl.col("dist").filter(pl.col("_t") == 1).min()
            old_min = pl.col("dist").filter(pl.col("_t") == 0).min()
            return (
                df.group_by("node")
                .agg(
                    pl.col("dist").min().alias("dist"),
                    # improved: newly reached (no old row) or a strictly
                    # smaller candidate; an untouched settled node (no
                    # candidate this round) must NOT re-enter the frontier
                    pl.when(old_min.is_null())
                    .then(pl.lit(True))
                    .otherwise((cand_min < old_min).fill_null(False))
                    .cast(pl.Int8)
                    .alias("improved"),
                )
                .to_arrow()
            )

        both = (
            dist.map_batches(tag(0), batch_format="pyarrow")
            .union(cand.map_batches(tag(1), batch_format="pyarrow"))
            .sort("node")
            .map_batches(fold, batch_format="pyarrow", batch_size=None)
        )
        both = _mat(both)
        dist = _mat(both.map_batches(
            lambda b: pa.table({"node": b["node"], "dist": b["dist"]}),
            batch_format="pyarrow",
        ))
        frontier = _mat(both.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "dist": b["dist"]}
            ).filter(pc.equal(b["improved"], 1)),
            batch_format="pyarrow",
        ))
    raise RuntimeError(f"SSSP did not converge in {max_rounds} rounds")


def sssp_demo_edges(sf_dir: str) -> ray.data.Dataset:
    """Deterministic weighted DIRECTED DAG for the driver-contract SSSP
    query: a global root ``R`` fans out to one 5-node chain per document
    (``R -> n<doc8>x0 -> ... -> x4``; root-edge weight ``doc %% 13 + 1``,
    chain weights ``(doc + j) %% 5 + 2``) plus a weight-7 shortcut
    ``x0 -> x2`` that beats the two-hop chain path for some documents and
    loses for others — the min-relaxation is exercised both ways. Depth <= 5
    so Bellman-Ford settles in <= 6 rounds at every scale factor. Mirrored
    exactly by oracles_td.sssp_oracle (recursive CTE over the same DAG)."""
    import polars as pl

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def gen(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        base = pl.DataFrame({"d": d})
        d8 = pl.col("d").cast(pl.Utf8).str.zfill(8)
        root = base.select(
            pl.lit("R").alias("src"),
            ("n" + d8 + "x0").alias("dst"),
            (pl.col("d") % 13 + 1).alias("w"),
        )
        chain_parts = [
            base.select(
                ("n" + d8 + f"x{j}").alias("src"),
                ("n" + d8 + f"x{j + 1}").alias("dst"),
                ((pl.col("d") + j) % 5 + 2).alias("w"),
            )
            for j in range(4)
        ]
        short = base.select(
            ("n" + d8 + "x0").alias("src"),
            ("n" + d8 + "x2").alias("dst"),
            pl.lit(7, dtype=pl.Int64).alias("w"),
        )
        return pl.concat([root, *chain_parts, short]).to_arrow()

    return ds.map_batches(gen, batch_format="pyarrow").repartition(8)


def topo_layers(
    edges: ray.data.Dataset,
    *,
    max_rounds: int = 24,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """DAG layer assignment (topological levels): ``layer(v)`` = the LONGEST
    hop distance from any root (in-degree-0 node) — the stage schedule of a
    dependency DAG (every node's inputs live in strictly earlier layers, so
    layer k can execute as one parallel wave after k-1). Implemented as
    :func:`sssp_distances` over unit NEGATIVE weights (longest path = shortest
    negated path; legal on a DAG, rounds bounded by depth) from the
    distributed root set (distinct src anti-joined against distinct dst —
    roots never reach the driver). Raises via sssp on round exhaustion,
    which on a cyclic input manifests as non-convergence rather than a wrong
    answer. Returns (node, layer); unreachable-from-roots nodes (cycle
    members) are absent."""
    from ray.data.aggregate import Min as _Min

    from ..relational import hash_join

    def side(col: str):
        def fn(b: pa.Table) -> pa.Table:
            arr = (
                b[col].combine_chunks()
                if isinstance(b[col], pa.ChunkedArray)
                else b[col]
            )
            return pa.table({"node": pc.unique(arr)})

        return fn

    srcs = (
        edges.map_batches(side("src"), batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Min("node", alias_name="_d"))
        .select_columns(["node"])
    )
    def dst_side(b: pa.Table) -> pa.Table:
        arr = (
            b["dst"].combine_chunks()
            if isinstance(b["dst"], pa.ChunkedArray)
            else b["dst"]
        )
        u = pc.unique(arr)  # block-level dedup keeps the join input lean
        return pa.table({"node": u, "f": pa.array(np.ones(len(u), np.int64))})

    dsts = edges.map_batches(dst_side, batch_format="pyarrow")
    roots = hash_join(
        srcs, dsts, on="node", right_cols=["f"], how="left", num_buckets=num_buckets
    ).map_batches(
        lambda b: b.filter(pc.is_null(b["f"])).select(["node"]),
        batch_format="pyarrow",
    )
    neg = edges.map_batches(
        lambda b: pa.table(
            {
                "src": b["src"],
                "dst": b["dst"],
                "w": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    dist = sssp_distances(
        neg, roots, max_rounds=max_rounds, num_buckets=num_buckets
    )
    return dist.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "layer": pc.negate_checked(b["dist"])}
        ),
        batch_format="pyarrow",
    )


def random_walks(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    n_steps: int = 4,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Deterministic hash-guided random walks over an UNDIRECTED edge list
    (columns ``src``, ``dst``) — the DeepWalk/node2vec corpus-generation
    shape with the RNG replaced by the repo's SQL-expressible hash family:
    a walk seeded at ``s`` sitting on node ``v`` moves at step ``t`` to the
    neighbor ``u`` minimizing ``(fp(s)*K_A + t*K_B + fp(u)*P) mod 2^64``
    (ties: ``u`` ASC), ``fp`` = the polynomial byte hash from
    :mod:`r2s2_ray.functions.hashing`. Every choice is a pure function of
    (seed, step, candidate), so re-runs and the DuckDB oracle replay the
    walks bit-for-bit — resume-safe corpus generation at 100 TB.

    Output: one row per visited position ``(walk, step, node)``; step 0 is
    the seed; a walk whose node has no neighbor simply stops (inner join).

    Scale shape: per step, ONLY the frontier (one row per live walk) ships
    through a key-partitioned :func:`hash_join` against the symmetrized edge
    list, and the per-walk argmin folds inside ONE groupby via an
    order-encoding ``hex16(h) || u`` Min aggregate — lexicographic min of
    the zero-padded hex prefix IS the numeric min of ``h`` with ties broken
    by ``u`` ASC. No map_groups, no driver materialization: walk count never
    touches the driver.

    ``seeds``: Dataset with one ``node`` column (one walk per seed)."""
    import binascii

    from ..relational import hash_join
    from .hashing import K_A, K_B, P, poly_hash_arr

    def sym(b: pa.Table) -> pa.Table:
        src = b["src"].combine_chunks() if isinstance(b["src"], pa.ChunkedArray) else b["src"]
        dst = b["dst"].combine_chunks() if isinstance(b["dst"], pa.ChunkedArray) else b["dst"]
        return pa.table(
            {"src": pa.concat_arrays([src, dst]), "dst": pa.concat_arrays([dst, src])}
        )

    edges_sym = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def _hex16(h: np.ndarray) -> pa.Array:
        # big-endian raw bytes -> lowercase hex; fixed 16-char prefix keeps
        # string order == uint64 order (matches the oracle's printf('%08x%08x'))
        be = np.ascontiguousarray(h.astype(">u8")).tobytes()
        fsb = pa.Array.from_buffers(
            pa.binary(16), len(h), [None, pa.py_buffer(binascii.hexlify(be))]
        )
        return fsb.cast(pa.string())

    def step0(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "walk": b["node"],
                "step": pa.array(np.zeros(n, np.int64)),
                "node": b["node"],
            }
        )

    frontier = seeds.map_batches(
        lambda b: pa.table({"walk": b["node"], "node": b["node"]}),
        batch_format="pyarrow",
    ).materialize()
    parts = [frontier.map_batches(step0, batch_format="pyarrow")]

    for t in range(1, n_steps + 1):
        tb = np.uint64((t * K_B) % (1 << 64))

        cand = hash_join(
            frontier.map_batches(
                lambda b: pa.table({"walk": b["walk"], "src": b["node"]}),
                batch_format="pyarrow",
            ),
            edges_sym,
            on="src",
            right_cols=["dst"],
            num_buckets=num_buckets,
        )

        def score(b: pa.Table, _tb=tb) -> pa.Table:
            walk = pc.cast(b["walk"], pa.string())
            dst = pc.cast(b["dst"], pa.string())
            fw = poly_hash_arr(walk)
            fd = poly_hash_arr(dst)
            h = fw * np.uint64(K_A) + _tb + fd * P
            k = pc.binary_join_element_wise(_hex16(h), dst, "")
            return pa.table({"walk": walk, "k": k})

        nxt = (
            cand.map_batches(score, batch_format="pyarrow")
            .groupby("walk")
            .aggregate(Min("k", alias_name="k"))
        )

        def decode(b: pa.Table, _t=t) -> pa.Table:
            node = pc.utf8_slice_codeunits(pc.cast(b["k"], pa.string()), 16)
            return pa.table(
                {
                    "walk": b["walk"],
                    "step": pa.array(np.full(b.num_rows, _t, np.int64)),
                    "node": node,
                }
            )

        stepped = nxt.map_batches(decode, batch_format="pyarrow").materialize()
        parts.append(stepped)
        frontier = stepped.select_columns(["walk", "node"])

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
