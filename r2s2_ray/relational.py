"""General relational operators exercised over the driver's TPC-H-ish tables —
aggregation with pre-combining, broadcast joins, top-k, distinct, windowed /
sessionized event processing. Each function has a DuckDB oracle in ORACLES.

Determinism discipline for the oracle value-hash: money columns are summed as
integer cents (double addition is order-dependent across blocks; integer addition
is associative), and every ordered computation carries an explicit tie-break key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def q_lineitem_agg(sf_dir: str):
    """Q1-style grouped aggregate; revenue in exact integer 1e-4 units."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        price_c = _cents(b["l_extendedprice"])
        disc_c = _cents(b["l_discount"])
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "l_quantity": b["l_quantity"],
                "price_cents": price_c,
                "revenue_e4": rev,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_base_price_cents"),
            Sum("revenue_e4", alias_name="sum_revenue_e4"),
            Count(alias_name="n_rows"),
        )
    )


def q_join_revenue(sf_dir: str):
    """orders x customer x nation via BROADCAST join: the two small sides travel
    through the object store once (ray.put), each batch does two dictionary takes —
    no shuffle (SURVEY.md guide: broadcast small sides)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust_ref = ray.put(cust)
    nat_ref = ray.put(nat)

    class Joiner:
        def __init__(self):
            c = ray.get(cust_ref)
            n = ray.get(nat_ref)
            self.custkeys = c["c_custkey"].combine_chunks()
            nk = c["c_nationkey"].to_numpy()
            names = n["n_name"].to_pylist()
            order = {k: i for i, k in enumerate(n["n_nationkey"].to_pylist())}
            self.cust_nation_name = pa.array([names[order[k]] for k in nk], pa.string())

        def __call__(self, b: pa.Table) -> pa.Table:
            idx = pc.index_in(b["o_custkey"], value_set=self.custkeys)
            return pa.table(
                {
                    "n_name": pc.take(self.cust_nation_name, idx),
                    "price_cents": _cents(b["o_totalprice"]),
                }
            )

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(Joiner, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("n_name")
        .aggregate(Sum("price_cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
    )


def q_topk_orders(sf_dir: str, k: int = 10):
    """Top-k by (price DESC, key ASC): per-block partial top-k first, then the
    global sort runs over only blocks x k rows — a full distributed sort of the
    whole table to keep 10 rows is the all-to-all-for-nothing anti-pattern."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def local_topk(b: pa.Table) -> pa.Table:
        return b.sort_by(
            [("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        ).slice(0, k)

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def q_filter_agg(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_shipdate", "l_discount"])
    cutoff = pa.scalar(pd.Timestamp("1995-09-01"), pa.timestamp("us"))

    def filt(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.less(b["l_shipdate"], cutoff),
            pc.greater_equal(b["l_discount"], 0.02),
        )
        return b.filter(mask)

    return (
        ds.map_batches(filt, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"), Count(alias_name="n_rows"))
    )


def q_distinct_events(sf_dir: str):
    vals = sorted(_read(sf_dir, "events", ["event_type"]).unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def _bucket_by(col: str, num_buckets: int, seed: int = 17):
    """Append a ``bucket = hash(col) % B`` column (the fold.py shuffle pattern:
    the distributed sort keys on bucket ALONE, so equal keys can never straddle a
    range partition, and hot keys spread over B buckets)."""
    import polars as pl

    def fn(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        bk = df.select(
            pl.col(col).hash(seed=seed).mod(num_buckets).cast(pl.Int32).alias("bucket")
        )["bucket"]
        return b.append_column("bucket", bk.to_arrow())

    return fn


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Distributed backward as-of join: for each left row, attach the LATEST
    right row with ``right.on <= left.on`` within the same ``by`` group
    (left rows with no earlier right row keep nulls).

    Ray Data has no asof primitive, so this composes one: both sides are
    hash-bucketed on ``by`` and UNIONED into one aligned schema with a side
    tag, a single ``sort("bucket")`` co-locates each group's rows (range
    partition assignment is a function of the key value, so equal buckets
    never straddle output partitions), and one vectorized polars
    ``join_asof`` runs per block — no per-group Python. One exchange total;
    skew spreads over ``num_buckets`` via the hash.

    ``right_cols`` are the right-side columns to attach; they and the right
    ``on`` column are emitted as ``<name><suffix>``. Rows with null ``on`` /
    ``by`` are not supported (synthetic event streams have none)."""
    import polars as pl

    ls, rs = left.schema(), right.schema()
    ltypes = dict(zip(ls.names, ls.types))  # ray.data.Schema, not pyarrow
    rt = dict(zip(rs.names, rs.types))
    left_names = list(ls.names)
    out_right = [f"{c}{suffix}" for c in right_cols + [on]]
    rtypes = {f"{c}{suffix}": rt[c] for c in right_cols + [on]}

    # align both sides onto ONE schema (left cols + suffixed right cols +
    # side tag), null-padding the columns the side doesn't have, so a plain
    # Dataset.union works and the whole join needs a single exchange
    def _widen(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols: dict = {}
            for c in left_names:
                if side == 0 or c in (on, by):
                    cols[c] = b[c]
                else:
                    cols[c] = pa.nulls(n, ltypes[c])
            for oc, t in rtypes.items():
                cols[oc] = b[oc.removesuffix(suffix)] if side == 1 else pa.nulls(n, t)
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    unioned = left.map_batches(_widen(0), batch_format="pyarrow").union(
        right.map_batches(_widen(1), batch_format="pyarrow")
    )

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        lf = df.filter(pl.col("_side") == 0).drop(["_side", "bucket"] + out_right).sort(on)
        rf = (
            df.filter(pl.col("_side") == 1)
            .select([by] + out_right)
            .rename({f"{on}{suffix}": on})
            .with_columns(pl.col(on).alias(f"{on}{suffix}"))
            # tie-break on the value columns too: join_asof backward attaches
            # the LAST right row at a duplicate (by, on) key, so sorting by
            # the full column set makes the pick deterministic (max values
            # win) rather than dependent on block row order. NOTE: an oracle
            # comparison (e.g. DuckDB ASOF JOIN) is only well-defined when
            # (by, on) pairs are unique on the right side — SQL picks its own
            # arbitrary tie row.
            .sort([on] + sorted(f"{c}{suffix}" for c in right_cols))
        )
        out = lf.join_asof(rf, on=on, by=by, strategy="backward").drop(on + "_right", strict=False)
        return out.to_arrow()

    return (
        unioned.map_batches(_bucket_by(by, num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_cols: list[str],
    suffix: str = "",
    num_buckets: int = 32,
    how: str = "inner",
) -> ray.data.Dataset:
    """Generic LARGE x LARGE equi-join (the broadcast join in q_join_revenue
    only fits small sides): both sides are hash-bucketed on the key and
    UNIONED onto one aligned schema with a side tag, a single
    ``sort("bucket")`` co-locates each key's rows (equal buckets never
    straddle output partitions), and one vectorized polars join runs per
    block. One exchange total, no driver materialization. A pathologically
    hot key still lands in one bucket — equi-join semantics require
    co-location; salt upstream if one key carries a double-digit share.

    ``right_cols`` are attached as ``<name><suffix>``; ``how`` is ``inner``
    or ``left``. The right side must carry the join key under the same name."""
    import polars as pl

    ls, rs = left.schema(), right.schema()
    ltypes = dict(zip(ls.names, ls.types))
    rt = dict(zip(rs.names, rs.types))
    left_names = list(ls.names)
    out_right = [f"{c}{suffix}" for c in right_cols]
    clash = [c for c in out_right if c in left_names]
    if clash:
        raise ValueError(f"right columns collide with left: {clash} (set suffix)")
    rtypes = {f"{c}{suffix}": rt[c] for c in right_cols}

    def _widen(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols: dict = {}
            for c in left_names:
                if side == 0 or c == on:
                    cols[c] = b[c]
                else:
                    cols[c] = pa.nulls(n, ltypes[c])
            for oc, t in rtypes.items():
                cols[oc] = b[oc.removesuffix(suffix)] if side == 1 else pa.nulls(n, t)
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    unioned = left.map_batches(_widen(0), batch_format="pyarrow").union(
        right.map_batches(_widen(1), batch_format="pyarrow")
    )

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        lf = df.filter(pl.col("_side") == 0).drop(["_side", "bucket"] + out_right)
        rf = df.filter(pl.col("_side") == 1).select([on] + out_right)
        out = lf.join(rf, on=on, how=how)
        return out.to_arrow()

    return (
        unioned.map_batches(_bucket_by(on, num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def hash_join_salted(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_cols: list[str],
    n_salt: int = 8,
    suffix: str = "",
    num_buckets: int = 32,
    how: str = "inner",
) -> ray.data.Dataset:
    """:func:`hash_join` for HOT-KEY SKEW: a pathologically hot key in plain
    hash_join lands every one of its rows in ONE bucket (equi-join semantics
    demand co-location), so one reducer carries a double-digit share of the
    probe side. The standard fix, packaged: the LEFT (probe/large) side takes
    a deterministic round-robin salt 0..n_salt-1, the RIGHT (build/smaller)
    side REPLICATES each row n_salt times — so a hot key's probe rows spread
    over n_salt buckets at the cost of shipping the build side n_salt times.
    Composite join key = key + salt (joined via one widened key column);
    results are identical to the unsalted join for every ``how`` this
    supports (inner/left — the replicate side must be the non-preserved
    side). Use when one key carries a double-digit row share and the build
    side is small enough to ship n_salt x; otherwise plain hash_join wins."""

    def salt_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        s = (np.arange(n, dtype=np.int64) % n_salt).astype(np.int64)
        k = pc.binary_join_element_wise(
            pc.cast(b[on], pa.string()),
            pa.array(s.astype("U"), pa.string()),
            "\x1f",
        )
        return b.append_column("_sk", k)

    def salt_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), n_salt)
        rep = b.take(pa.array(idx))
        s = np.tile(np.arange(n_salt, dtype=np.int64), n)
        k = pc.binary_join_element_wise(
            pc.cast(rep[on], pa.string()),
            pa.array(s.astype("U"), pa.string()),
            "\x1f",
        )
        return rep.append_column("_sk", k)

    joined = hash_join(
        left.map_batches(salt_left, batch_format="pyarrow"),
        right.map_batches(salt_right, batch_format="pyarrow").drop_columns([on]),
        on="_sk",
        right_cols=right_cols,
        suffix=suffix,
        num_buckets=num_buckets,
        how=how,
    )
    return joined.drop_columns(["_sk"])


def q_hash_join_orders(sf_dir: str, num_buckets: int = 32):
    """orders ⋈ customer as a LARGE x LARGE hash-bucket join (no broadcast):
    every order row annotated with its customer's name and nation key."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep_o(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "price_cents": _cents(b["o_totalprice"]),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    def prep_c(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["c_custkey"],
                "c_name": b["c_name"],
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            }
        )

    return hash_join(
        orders.map_batches(prep_o, batch_format="pyarrow"),
        cust.map_batches(prep_c, batch_format="pyarrow"),
        on="o_custkey",
        right_cols=["c_name", "c_nationkey"],
        num_buckets=num_buckets,
    )


def q_user_cumsum(sf_dir: str, num_buckets: int = 32):
    """Per-user running total ordered by (ts, event_id) — the ordered-log pattern.

    sort(bucket) + whole-block polars ``cum_sum().over()`` instead of
    ``groupby.map_groups`` (one Python+pandas call PER USER is the measured ~10x
    slow path; see stages/fold.py fold() note)."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["user_id", "ts", "event_id"])
        out = df.with_columns(
            (pl.col("value") * 100)
            .round(0)
            .cast(pl.Int64)
            .cum_sum()
            .over("user_id")
            .alias("cum_value_cents")
        )
        return out.select(["event_id", "user_id", "cum_value_cents"]).to_arrow()

    return (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def q_sessions(sf_dir: str, gap_minutes: int = 30, num_buckets: int = 32):
    """Sessionization (30-min gap): same sort(bucket) + whole-block pattern —
    per-user gap detection is a vectorized diff-over-partition, one call per
    BLOCK, not per user."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["user_id", "ts", "event_id"])
        out = (
            df.with_columns(
                (
                    pl.col("ts").diff().over("user_id")
                    > pl.duration(minutes=gap_minutes)
                )
                .fill_null(False)
                .alias("brk")
            )
            .group_by("user_id")
            .agg((pl.col("brk").sum() + 1).cast(pl.Int64).alias("n_sessions"))
        )
        return out.to_arrow()

    return (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def q_hourly_window(sf_dir: str):
    """Tumbling 1h window per user: vectorized bucket column + grouped aggregate
    (no per-row state; windows = keys)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        return pa.table(
            {"user_id": b["user_id"], "hour": hour, "value_cents": _cents(b["value"])}
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="sum_value_cents"))
    )


def q_supplier_by_region(sf_dir: str):
    """Suppliers per region via a two-hop BROADCAST join (supplier -> nation ->
    region): both small sides are plain Python lookups shipped in the batch fn —
    dimension tables never shuffle."""
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()))
    r2name = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nk = pa.array(sorted(n2r), pa.int64())
    rname = pa.array([r2name[n2r[k]] for k in sorted(n2r)], pa.string())

    def attach(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["s_nationkey"], pa.int64()), value_set=nk)
        return pa.table(
            {"r_name": pc.take(rname, idx), "acctbal_cents": _cents(b["s_acctbal"])}
        )

    return (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("acctbal_cents", alias_name="sum_acctbal_cents"))
    )


def q_part_brand_stats(sf_dir: str):
    """Per-brand part census: pre-combined grouped aggregate over the part table
    (count, max size, sum retail price in integer cents)."""
    ds = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": b["p_brand"],
                "p_size": pc.cast(b["p_size"], pa.int64()),
                "price_cents": _cents(b["p_retailprice"]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Max("p_size", alias_name="max_size"),
            Sum("price_cents", alias_name="sum_price_cents"),
        )
    )


def q_asof_clicks(sf_dir: str, num_buckets: int = 32):
    """Stream-to-stream as-of join: each click event is joined to the SAME
    user's most recent view event at or before it (nulls when none) — the
    classic event-attribution pattern. Exercises the generic
    :func:`asof_join` operator (one exchange, per-block vectorized
    polars join_asof); the DuckDB oracle is a native ASOF LEFT JOIN."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def side(kind: str):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.equal(b["event_type"], kind)
            return b.filter(m).select(["event_id", "user_id", "ts"])

        return fn

    clicks = ds.map_batches(side("click"), batch_format="pyarrow")
    views = ds.map_batches(side("view"), batch_format="pyarrow")
    return asof_join(
        clicks,
        views,
        on="ts",
        by="user_id",
        right_cols=["event_id"],
        suffix="_view",
        num_buckets=num_buckets,
    )


def q_range_join(sf_dir: str, window_minutes: int = 60, num_buckets: int = 32):
    """Range (interval) join: for each click event, the count of the SAME
    user's view events inside the sliding window ``(ts - 1h, ts]``.

    A naive inequality join explodes quadratically on hot users; instead the
    per-block kernel computes a cumulative view count per user and answers the
    window with TWO vectorized as-of lookups — ``c(ts) - c(ts - 1h)`` — so the
    whole operator is one hash-bucket exchange plus O(n log n) per block."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def keep(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array(["click", "view"]))
        return b.filter(m)

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        views = (
            df.filter(pl.col("event_type") == "view")
            .sort("ts")
            .with_columns(pl.col("ts").cum_count().over("user_id").cast(pl.Int64).alias("cnt"))
            .select(["user_id", "ts", "cnt"])
        )
        clicks = df.filter(pl.col("event_type") == "click").select(["event_id", "user_id", "ts"]).sort("ts")
        at_now = clicks.join_asof(views, on="ts", by="user_id", strategy="backward").rename(
            {"cnt": "c_now"}
        )
        lo = (
            clicks.with_columns((pl.col("ts") - pl.duration(minutes=window_minutes)).alias("ts"))
            .sort("ts")
            .join_asof(views, on="ts", by="user_id", strategy="backward")
            .select(["event_id", pl.col("cnt").alias("c_lo")])
        )
        out = (
            at_now.join(lo, on="event_id", how="left")
            .with_columns(
                (pl.col("c_now").fill_null(0) - pl.col("c_lo").fill_null(0)).alias("n_views_1h")
            )
            .select(["event_id", "user_id", "ts", "n_views_1h"])
        )
        return out.to_arrow()

    return (
        ds.map_batches(keep, batch_format="pyarrow")
        .map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def q_top_orders_per_cust(sf_dir: str, k: int = 3, num_buckets: int = 32):
    """Per-group top-k (top 3 orders by price per customer, orderkey
    tie-break): bucket-sort + whole-block vectorized rank — no per-group
    Python, no global sort."""
    import polars as pl

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(
            ["o_custkey", "o_totalprice", "o_orderkey"], descending=[False, True, False]
        )
        out = (
            df.with_columns(
                pl.col("o_orderkey").cum_count().over("o_custkey").cast(pl.Int64).alias("rk")
            )
            .filter(pl.col("rk") <= k)
            .with_columns((pl.col("o_totalprice") * 100).round(0).cast(pl.Int64).alias("price_cents"))
            .select(["o_custkey", "rk", "o_orderkey", "price_cents"])
        )
        return out.to_arrow()

    return (
        ds.map_batches(_bucket_by("o_custkey", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def q_user_value_quantiles(sf_dir: str, num_buckets: int = 32):
    """Per-group EXACT discrete quantiles (median + p90 of event value per
    user): an operator Ray Data's aggregate API lacks. Bucket-sort +
    whole-block grouped selection; the quantile index is computed in integer
    arithmetic — sorted[ceil(p·n/100) − 1] — which is bit-for-bit DuckDB's
    ``quantile_disc`` convention (float interpolation conventions differ
    between engines; integer selection cannot)."""
    import polars as pl

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"], "vc": _cents(b["value"])})

    def qidx(p: int):
        return ((p * pl.len() + 99) // 100 - 1).cast(pl.Int64)

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = df.group_by("user_id").agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("vc").sort().get(qidx(50)).alias("p50_cents"),
            pl.col("vc").sort().get(qidx(90)).alias("p90_cents"),
        )
        return out.to_arrow()

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


ORACLES: dict[str, str] = {
    "q_sliding_user_count": """
        SELECT event_id,
               CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_1h
        FROM events""",
    "q_value_histogram": """
        SELECT CAST(round(value * 100) AS BIGINT) // 50 AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY bin""",
    "q_rollup_docs": """
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY ROLLUP (source, lang)""",
    "q_supplier_by_region": """
        SELECT r_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""",
    "q_part_brand_stats": """
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(max(p_size) AS BIGINT) AS max_size,
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM part GROUP BY p_brand""",
    "q_lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_revenue_e4,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_join_revenue": """
        SELECT n_name,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""",
    "q_topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_filter_agg": """
        SELECT l_returnflag, sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-09-01' AND l_discount >= 0.02
        GROUP BY l_returnflag""",
    "q_distinct_events": "SELECT DISTINCT event_type FROM events",
    "q_user_cumsum": """
        SELECT event_id, user_id,
               CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS cum_value_cents
        FROM events""",
    "q_sessions": """
        SELECT user_id,
               CAST(count(*) - sum(CASE WHEN prev_ts IS NOT NULL AND ts - prev_ts <= INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events)
        GROUP BY user_id""",
    "q_hourly_window": """
        SELECT user_id, date_trunc('hour', ts) AS hour,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY user_id, date_trunc('hour', ts)""",
    "q_asof_clicks": """
        SELECT c.event_id, c.user_id, c.ts,
               v.event_id AS event_id_view, v.ts AS ts_view
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts >= v.ts""",
    "q_range_join": """
        SELECT c.event_id, c.user_id, c.ts, CAST(count(v.event_id) AS BIGINT) AS n_views_1h
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND v.ts > c.ts - INTERVAL 60 MINUTE AND v.ts <= c.ts
        GROUP BY c.event_id, c.user_id, c.ts""",
    "q_top_orders_per_cust": """
        SELECT o_custkey, rk, o_orderkey, price_cents FROM (
            SELECT o_custkey, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
            FROM orders)
        WHERE rk <= 3""",
    "q_hash_join_orders": """
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
               c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey
        FROM orders JOIN customer ON o_custkey = c_custkey""",
    "q_user_value_quantiles": """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.50) AS p50_cents,
               quantile_disc(CAST(round(value * 100) AS BIGINT), 0.90) AS p90_cents
        FROM events GROUP BY user_id""",
}


def q_json_props(sf_dir: str):
    """Semi-structured column handling: parse the events ``props`` JSON string
    per batch (vectorized polars json_path_match — no Python json.loads loop),
    extract the integer field ``k`` and aggregate per event_type. NULL-safe:
    rows whose props lack ``k`` (or carry malformed JSON) drop out of the sum
    but still count into n_events, exactly like the SQL oracle's
    json_extract."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def part(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = (
            df.with_columns(
                k=pl.col("props").str.json_path_match("$.k").cast(pl.Int64, strict=False)
            )
            .group_by("event_type")
            .agg(
                n_events=pl.len().cast(pl.Int64),
                # polars sums an all-null group to 0; SQL's sum() yields NULL —
                # keep the SQL semantics so the oracle hash matches even for a
                # type whose props never carry a castable k
                sum_k=pl.when(pl.col("k").count() > 0)
                .then(pl.col("k").sum())
                .otherwise(None)
                .cast(pl.Int64),
                max_k=pl.col("k").max().cast(pl.Int64),
            )
        )
        return out.to_arrow()

    # per-block partial aggregation, then one tiny groupby over the partials
    return (
        ds.map_batches(part, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def q_hll_distinct(sf_dir: str, *, p_bits: int = 6):
    """Approximate distinct users per event_type via a HyperLogLog sketch
    built from the repo's SQL-expressible hash family — the mergeable-sketch
    pattern for COUNT(DISTINCT) at 100 TB, where the exact groupby ships
    every key and the sketch ships 2^p_bits small integers per group.

    Bit-reproducibility contract (what makes this ORACLE-comparable, unlike
    library HLLs): h = affine64(user_id); register index = top p bits; the
    rank is computed from the NEXT 40 bits only (rank = 41 - bitlen(w >> 18),
    capped at 41 — the cap changes estimates with probability 2^-40) via
    float64 frexp, which is EXACT for integers < 2^53; and the raw estimate
    alpha * m^2 / sum(2^-M_j) sums 64 exact powers of two whose exponent
    spread (< 53 bits) keeps every partial sum exactly representable, so the
    final double is identical in numpy and SQL. No small/large-range
    corrections (they need ln(), whose last-bit rounding is libm-specific);
    the raw estimate and the zero-register count are both emitted so callers
    can apply any correction they like."""
    import polars as pl

    from .functions.hashing import K_A, K_B

    m = 1 << p_bits
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def registers(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            b["user_id"].combine_chunks().to_numpy(zero_copy_only=False), dtype=np.int64
        ).astype(np.uint64)
        h = ids * np.uint64(K_A) + np.uint64(K_B)
        reg = (h >> np.uint64(64 - p_bits)).astype(np.int64)
        w = (h << np.uint64(p_bits)) >> np.uint64(p_bits + 18)  # top 40 payload bits
        v = w.astype(np.float64)  # exact: w < 2^40 < 2^53
        bitlen = np.where(w > 0, np.frexp(v)[1], 0).astype(np.int64)
        rank = np.where(w > 0, 41 - bitlen, 41).astype(np.int64)
        df = pl.DataFrame(
            {
                "event_type": pl.Series(b["event_type"].to_pylist()),
                "reg": reg,
                "rank": rank,
            }
        )
        return df.group_by(["event_type", "reg"]).agg(pl.col("rank").max()).to_arrow()

    from ray.data.aggregate import Max

    regs = (
        ds.map_batches(registers, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "reg"])
        .aggregate(Max("rank", alias_name="rank"))
    )

    # alpha_m per Flajolet et al. 2007 (m >= 128 uses the asymptotic form)
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)

    def estimate(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = []
        for key, grp in df.group_by("event_type", maintain_order=False):
            ranks = dict(zip(grp["reg"].to_list(), grp["rank"].to_list()))
            # absent registers contribute 2^0 each (rank 0)
            s = 0.0
            for j in range(m):
                s += 2.0 ** (-ranks.get(j, 0))
            zeros = m - len([r for r in ranks.values() if r > 0])
            raw = alpha * m * m / s
            # small-range (linear counting) correction, standard HLL rule.
            # m/zeros takes only m rational values, so the ln() is over a
            # closed set both sides compute with the same libm — the oracle
            # builder embeds the identical Python-computed constants.
            if zeros > 0 and raw <= 2.5 * m:
                import math

                est = m * math.log(m / zeros)
            else:
                est = raw
            out.append(
                {
                    "event_type": key[0],
                    "hll_estimate": est,
                    "zero_registers": zeros,
                }
            )
        return pl.DataFrame(out).cast({"zero_registers": pl.Int64}).to_arrow()

    # one tiny block per event_type after the register groupby: sort on the
    # type so each group folds whole
    return regs.sort("event_type").map_batches(
        estimate, batch_format="pyarrow", batch_size=None
    )


def q_heavy_hitters(sf_dir: str, *, depth: int = 4, width: int = 256, k: int = 10):
    """Heavy hitters via a count-min sketch — the hot-key detector a shuffle
    planner needs at 100 TB (the exact per-key groupby ships every key; the
    sketch ships depth x width integers per block). Counters are built as a
    per-block partial grouped count (mergeable by addition), the true top-k
    keys (count DESC, id ASC — deterministic ties) are then point-queried
    against the sketch: estimate = min over the key's depth counters, always
    >= the true count (one-sided CMS error). Output per top-k user_id:
    (user_id, true_n, cms_n) — integer-exact, oracle-reproducible."""
    import polars as pl

    from .functions.hashing import perm_constants

    if width & (width - 1) or width <= 0:
        raise ValueError(
            f"width must be a power of two (buckets are the hash's top "
            f"log2(width) bits): {width}"
        )
    cms_shift = np.uint64(64 - (width - 1).bit_length())
    ds = _read(sf_dir, "events", ["user_id"])
    consts = [perm_constants(3 + i) for i in range(depth)]

    def partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(
            b["user_id"].combine_chunks().to_numpy(zero_copy_only=False), dtype=np.int64
        ).astype(np.uint64)
        rows = []
        for d, (a, c) in enumerate(consts):
            bucket = ((ids * np.uint64(a) + np.uint64(c)) >> cms_shift).astype(np.int64)
            rows.append(
                pl.DataFrame({"d": np.full(len(bucket), d, dtype=np.int64), "bucket": bucket})
            )
        df = pl.concat(rows).group_by(["d", "bucket"]).agg(n=pl.len().cast(pl.Int64))
        return df.to_arrow()

    counters = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["d", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # depth x width rows — metadata scale
    cms = {(r["d"], r["bucket"]): int(r["n"]) for r in counters}

    # exact top-k (small user domain here; at scale this arrives from the
    # sketch's candidate heap — the point-query path below is the same)
    top = (
        ds.groupby("user_id")
        .aggregate(Count(alias_name="true_n"))
        .sort(["true_n", "user_id"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    out_ids, out_true, out_est = [], [], []
    for r in top:
        uid = np.uint64(np.int64(r["user_id"]))
        est = min(
            cms.get((d, int((uid * np.uint64(a) + np.uint64(c)) >> cms_shift)), 0)
            for d, (a, c) in enumerate(consts)
        )
        out_ids.append(r["user_id"])
        out_true.append(int(r["true_n"]))
        out_est.append(est)
    return pa.table(
        {
            "user_id": pa.array(out_ids, pa.int64()),
            "true_n": pa.array(out_true, pa.int64()),
            "cms_n": pa.array(out_est, pa.int64()),
        }
    )


def q_bloom_semijoin(sf_dir: str, *, m_bits: int = 4096, k_hashes: int = 3):
    """Bloom-join prefilter: the classic shuffle-avoidance optimization — a
    small build side (BUILDING-segment customers) becomes an m-bit bloom
    filter broadcast once; the large probe side (orders) tests membership
    per batch and only survivors would enter the real join. Output per
    order priority: probe count, bloom-pass count and true-match count
    (pass >= true always; the gap is the false-positive mass, a direct
    read on the filter's sizing). Integer-exact: positions are the top
    log2(m) bits of the affine64 hash family, so the SQL oracle reproduces
    every bit."""
    import polars as pl

    from .functions.hashing import perm_constants

    if m_bits & (m_bits - 1) or m_bits <= 0:
        raise ValueError(
            f"m_bits must be a power of two (positions are the hash's top "
            f"log2(m) bits): {m_bits}"
        )
    shift = np.uint64(64 - (m_bits - 1).bit_length())
    consts = [perm_constants(11 + i) for i in range(k_hashes)]

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def building(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).select(["c_custkey"])

    keys = np.asarray(
        [r["c_custkey"] for r in cust.map_batches(building, batch_format="pyarrow").take_all()],
        dtype=np.int64,
    ).astype(np.uint64)
    bits = np.zeros(m_bits, dtype=bool)
    for a, c in consts:
        bits[((keys * np.uint64(a) + np.uint64(c)) >> shift).astype(np.int64)] = True
    # INTENTIONAL exact-set broadcast: this operator is a false-positive-rate
    # METRIC (it reports bloom-pass vs true-match counts side by side), so it
    # ships the exact build-side key set alongside the filter to label the
    # truth. A production bloom SEMI-JOIN must broadcast ONLY `bits` — copying
    # this pattern with `true_set` included defeats the bloom's size advantage.
    true_set = pa.array(sorted(int(x) for x in keys.astype(np.int64)), pa.int64())
    bits_ref = ray.put(bits)
    true_ref = ray.put(true_set)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def probe(b: pa.Table, _bits=bits_ref, _true=true_ref) -> pa.Table:
        bl = ray.get(_bits)
        ids = np.asarray(
            b["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False), dtype=np.int64
        ).astype(np.uint64)
        ok = np.ones(len(ids), dtype=bool)
        for a, c in consts:
            ok &= bl[((ids * np.uint64(a) + np.uint64(c)) >> shift).astype(np.int64)]
        tm = pc.is_in(b["o_custkey"], value_set=ray.get(_true))
        df = pl.DataFrame(
            {
                "o_orderpriority": pl.Series(b["o_orderpriority"].to_pylist()),
                "pass_": ok,
                "true_": np.asarray(tm.to_numpy(zero_copy_only=False), dtype=bool),
            }
        )
        return (
            df.group_by("o_orderpriority")
            .agg(
                n_orders=pl.len().cast(pl.Int64),
                n_bloom_pass=pl.col("pass_").sum().cast(pl.Int64),
                n_true_match=pl.col("true_").sum().cast(pl.Int64),
            )
            .to_arrow()
        )

    return (
        orders.map_batches(probe, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_bloom_pass", alias_name="n_bloom_pass"),
            Sum("n_true_match", alias_name="n_true_match"),
        )
    )


def profile_table(ds: ray.data.Dataset, columns: list[str]) -> pa.Table:
    """Per-column data profile — ``(column, n, nulls, n_distinct, min_v,
    max_v)`` with min/max over the VARCHAR rendering (type-uniform output).
    The ingest-side sanity check every pipeline runs before committing a new
    source (the reference's census family generalized to ANY table).

    Stage shape: counts ride per-block partials into a tiny column-keyed
    groupby; distinct/min/max ride ONE exchange of per-block-distinct
    ``(column, v)`` pairs (for a high-cardinality column that exchange is the
    unavoidable exact-distinct cost; per-block dedup is the combiner that
    collapses low-cardinality columns to a handful of rows). Nulls are
    excluded from distinct/min/max — the SQL convention. Output is
    num_columns rows: driver-safe by construction."""
    import polars as pl

    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    def counts(b: pa.Table) -> pa.Table:
        rows = {
            "column": [],
            "n": [],
            "nulls": [],
        }
        for c in columns:
            rows["column"].append(c)
            rows["n"].append(len(b))
            rows["nulls"].append(b[c].null_count)
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.large_string()),
                "n": pa.array(rows["n"], pa.int64()),
                "nulls": pa.array(rows["nulls"], pa.int64()),
            }
        )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(columns))
        parts = []
        for c in columns:
            parts.append(
                df.select(
                    pl.lit(c).alias("column"),
                    pl.col(c).cast(pl.Utf8).alias("v"),
                )
                .drop_nulls("v")
                .unique()
            )
        return pl.concat(parts).to_arrow()

    cnt = {
        r["column"]: r
        for r in ds.map_batches(counts, batch_format="pyarrow")
        .groupby("column")
        .aggregate(_Sum("n", alias_name="n"), _Sum("nulls", alias_name="nulls"))
        .take_all()
    }
    dst = {
        r["column"]: r
        for r in ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["column", "v"])
        .aggregate(_Count(alias_name="_m"))
        .groupby("column")
        .aggregate(
            _Count(alias_name="n_distinct"),
            _Min("v", alias_name="min_v"),
            _Max("v", alias_name="max_v"),
        )
        .take_all()
    }
    return pa.table(
        {
            "column": pa.array(columns, pa.large_string()),
            "n": pa.array([int(cnt[c]["n"]) for c in columns], pa.int64()),
            "nulls": pa.array([int(cnt[c]["nulls"]) for c in columns], pa.int64()),
            "n_distinct": pa.array(
                [int(dst[c]["n_distinct"]) if c in dst else 0 for c in columns],
                pa.int64(),
            ),
            "min_v": pa.array(
                [dst[c]["min_v"] if c in dst else None for c in columns],
                pa.large_string(),
            ),
            "max_v": pa.array(
                [dst[c]["max_v"] if c in dst else None for c in columns],
                pa.large_string(),
            ),
        }
    )


def q_rollup_docs(sf_dir: str):
    """GROUP BY ROLLUP (source, lang) over documents — the OLAP subtotal
    operator Ray Data lacks. Scale design: only the FINEST level runs as a
    distributed groupby (that is the one real exchange); the coarser levels
    (per-source, grand total) aggregate from the finest RESULT, which is
    group-cardinality-sized — never a second scan of the input."""
    import polars as pl

    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def pre(b: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(b)
            .group_by(["source", "lang"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_chars").sum().alias("n_chars"),
            )
            .to_arrow()
        )

    finest = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
        .take_all()
    )
    df = pl.DataFrame(
        {
            "source": [r["source"] for r in finest],
            "lang": [r["lang"] for r in finest],
            "n_docs": pl.Series([int(r["n_docs"]) for r in finest], dtype=pl.Int64),
            "n_chars": pl.Series([int(r["n_chars"]) for r in finest], dtype=pl.Int64),
        }
    )
    by_source = df.group_by("source").agg(
        pl.col("n_docs").sum(), pl.col("n_chars").sum()
    ).with_columns(pl.lit(None, dtype=pl.Utf8).alias("lang"))
    total = df.select(
        pl.lit(None, dtype=pl.Utf8).alias("source"),
        pl.lit(None, dtype=pl.Utf8).alias("lang"),
        pl.col("n_docs").sum(),
        pl.col("n_chars").sum(),
    )
    cols = ["source", "lang", "n_docs", "n_chars"]
    return pl.concat([df.select(cols), by_source.select(cols), total.select(cols)]).to_arrow()


def q_value_histogram(sf_dir: str, bin_cents: int = 50):
    """Equal-width histogram of event values (cents-exact binning:
    ``round(value*100) // bin_cents`` — the cents convention every money
    column in this repo uses, so the float never enters the contract): the
    aggregation-before-exchange shape — per-block bin counts are the
    combiner, the groupby moves one row per bin per block."""
    import polars as pl

    ds = _read(sf_dir, "events", ["value"])

    def pre(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return (
            df.select(
                ((pl.col("value") * 100).round(0).cast(pl.Int64) // bin_cents).alias(
                    "bin"
                )
            )
            .group_by("bin")
            .agg(pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_sliding_user_count(sf_dir: str, num_buckets: int = 32):
    """Per-event SLIDING time-window aggregate (count of the same user's
    events in the trailing hour, value-range semantics — RANGE, not ROWS, so
    equal-timestamp peers all count): the windowed-aggregate shape Ray Data
    lacks. Bucket-sort on user co-locates each user's events; polars'
    time-rolling kernel does the in-block work vectorized."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["user_id", "ts", "event_id"])
        # rolling emits one row per input row IN ORDER, so the counts column
        # aligns positionally with the sorted frame
        n = df.rolling(
            index_column="ts", period="1h", group_by="user_id", closed="both"
        ).agg(pl.len().cast(pl.Int64).alias("n_1h"))
        return df.select(["event_id"]).hstack(n.select(["n_1h"])).to_arrow()

    return (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def q_lead_lag_delta(sf_dir: str, num_buckets: int = 32):
    """Per-event LAG: microseconds since the same user's PREVIOUS event
    (NULL for a user's first event) — the lead/lag window shape Ray Data has
    no kernel for. Same sort(bucket) + whole-block pattern as q_user_cumsum:
    bucketing co-locates each user's events in one block, polars'
    ``diff().over()`` does the shift vectorized, and no block ever sees a
    partial user, so the result is exact regardless of block boundaries."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["user_id", "ts", "event_id"])
        out = df.with_columns(
            pl.col("ts")
            .diff()
            .over("user_id")
            .dt.total_microseconds()
            .cast(pl.Int64)
            .alias("delta_us")
        )
        return out.select(["event_id", "user_id", "delta_us"]).to_arrow()

    return (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def q_pivot_event_types(sf_dir: str):
    """PIVOT: per-user event counts spread into one fixed column per event
    type (the conditional-aggregation / crosstab shape). The type set is
    pinned (schema contract), so this is a single groupby over per-block
    partials — each block pre-aggregates its users' counts into the wide
    layout, then one narrow exchange sums the partials; no per-type scan,
    no second pass."""
    import polars as pl

    from ray.data.aggregate import Sum

    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def part(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = df.group_by("user_id").agg(
            [
                (pl.col("event_type") == t).sum().cast(pl.Int64).alias(f"n_{t}")
                for t in types
            ]
        )
        return out.to_arrow()

    agg = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types])
    )

    def finish(b: pa.Table) -> pa.Table:
        cols = {"user_id": b["user_id"]}
        for t in types:
            c = b[f"n_{t}"]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            cols[f"n_{t}"] = c.cast(pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLES["q_lead_lag_delta"] = """
    SELECT event_id, user_id,
           CAST(date_diff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) AS BIGINT) AS delta_us
    FROM events"""

ORACLES["q_pivot_event_types"] = """
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
    FROM events GROUP BY user_id"""


def q_cube_docs(sf_dir: str):
    """GROUP BY CUBE (source, lang) — all four grouping sets. Same scale
    shape as q_rollup_docs: the finest level is the ONE distributed exchange;
    the other three sets ((source), (lang), ()) aggregate from the finest
    RESULT (group-cardinality-sized), never a second input scan. The CUBE
    adds the (lang)-only set ROLLUP omits."""
    import polars as pl

    ds = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def pre(b: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(b)
            .group_by(["source", "lang"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_chars").sum().alias("n_chars"),
            )
            .to_arrow()
        )

    finest = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
        .take_all()
    )
    df = pl.DataFrame(
        {
            "source": [r["source"] for r in finest],
            "lang": [r["lang"] for r in finest],
            "n_docs": pl.Series([int(r["n_docs"]) for r in finest], dtype=pl.Int64),
            "n_chars": pl.Series([int(r["n_chars"]) for r in finest], dtype=pl.Int64),
        }
    )
    by_source = (
        df.group_by("source")
        .agg(pl.col("n_docs").sum(), pl.col("n_chars").sum())
        .with_columns(pl.lit(None, dtype=pl.Utf8).alias("lang"))
    )
    by_lang = (
        df.group_by("lang")
        .agg(pl.col("n_docs").sum(), pl.col("n_chars").sum())
        .with_columns(pl.lit(None, dtype=pl.Utf8).alias("source"))
    )
    total = df.select(
        pl.lit(None, dtype=pl.Utf8).alias("source"),
        pl.lit(None, dtype=pl.Utf8).alias("lang"),
        pl.col("n_docs").sum(),
        pl.col("n_chars").sum(),
    )
    cols = ["source", "lang", "n_docs", "n_chars"]
    return pl.concat(
        [df.select(cols), by_source.select(cols), by_lang.select(cols), total.select(cols)]
    ).to_arrow()


ORACLES["q_cube_docs"] = """
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents GROUP BY CUBE (source, lang)"""


def q_funnel(sf_dir: str, num_buckets: int = 32):
    """Ordered-event FUNNEL (signup -> view -> purchase): per-stage user
    counts where each stage must happen strictly AFTER the user's first
    completion of the previous stage — the product-analytics shape that
    needs per-user event-time ordering, not plain filters.

    One bucket-sort co-locates each user's events; the per-block pass
    computes first-signup, first-view-after-signup, first-purchase-after-
    that-view (three vectorized conditional mins); stage totals are the one
    tiny aggregate that leaves the blocks."""
    import polars as pl

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        s = (
            df.filter(pl.col("event_type") == "signup")
            .group_by("user_id")
            .agg(pl.col("ts").min().alias("t_signup"))
        )
        v = (
            df.filter(pl.col("event_type") == "view")
            .join(s, on="user_id", how="inner")
            .filter(pl.col("ts") > pl.col("t_signup"))
            .group_by("user_id")
            .agg(pl.col("ts").min().alias("t_view"))
        )
        p = (
            df.filter(pl.col("event_type") == "purchase")
            .join(v, on="user_id", how="inner")
            .filter(pl.col("ts") > pl.col("t_view"))
            .group_by("user_id")
            .agg(pl.col("ts").min().alias("t_purchase"))
        )
        return pa.table(
            {
                "n_signup": pa.array([s.height], pa.int64()),
                "n_view_after": pa.array([v.height], pa.int64()),
                "n_purchase_after": pa.array([p.height], pa.int64()),
            }
        )

    partials = (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    tot = {
        k: sum(int(r[k]) for r in partials)
        for k in ("n_signup", "n_view_after", "n_purchase_after")
    }
    return pa.table(
        {
            "stage": pa.array(["1_signup", "2_view", "3_purchase"], pa.string()),
            "n_users": pa.array(
                [tot["n_signup"], tot["n_view_after"], tot["n_purchase_after"]],
                pa.int64(),
            ),
        }
    )


def q_retention_cohorts(sf_dir: str, num_buckets: int = 32):
    """Cohort retention: users grouped by FIRST-event day (the cohort), then
    distinct active users per (cohort_day, day_offset) — the other standard
    product-analytics table. One bucket-sort co-locates each user's events,
    so cohort assignment AND per-(cohort, offset, user) dedup are block-local;
    the only exchange after the sort is the tiny (cohort, offset) count."""
    import polars as pl

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).with_columns(pl.col("ts").dt.date().alias("day"))
        first = df.group_by("user_id").agg(pl.col("day").min().alias("cohort_day"))
        act = (
            df.join(first, on="user_id", how="inner")
            .with_columns(
                (pl.col("day") - pl.col("cohort_day")).dt.total_days().cast(pl.Int64).alias("day_offset")
            )
            .unique(subset=["cohort_day", "day_offset", "user_id"])
            .group_by(["cohort_day", "day_offset"])
            .agg(pl.len().cast(pl.Int64).alias("n_users"))
            .with_columns(pl.col("cohort_day").cast(pl.Utf8).alias("cohort_day"))
        )
        return act.to_arrow()

    return (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("n_users"),
                "n_users",
                pc.cast(t["n_users"], pa.int64()),
            ),
            batch_format="pyarrow",
        )
    )


ORACLES["q_funnel"] = """
    WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
         v AS (SELECT e.user_id, min(e.ts) AS t_view
               FROM events e JOIN s USING (user_id)
               WHERE e.event_type = 'view' AND e.ts > s.t_signup
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t_purchase
               FROM events e JOIN v USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > v.t_view
               GROUP BY e.user_id)
    SELECT * FROM (VALUES
      ('1_signup',   (SELECT CAST(count(*) AS BIGINT) FROM s)),
      ('2_view',     (SELECT CAST(count(*) AS BIGINT) FROM v)),
      ('3_purchase', (SELECT CAST(count(*) AS BIGINT) FROM p))
    ) t(stage, n_users)"""

ORACLES["q_retention_cohorts"] = """
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
               FROM events GROUP BY user_id)
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
             AS day_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN f USING (user_id)
    GROUP BY f.cohort_day, day_offset"""


def q_cust_without_orders(sf_dir: str, num_buckets: int = 32, min_price: float = 450000.0):
    """Distributed ANTI-JOIN (customers with no order above ``min_price`` —
    the NOT EXISTS shape): both sides bucket on the key's hash, one sort
    co-locates each key's rows from both sides, and a block-local polars
    anti join keeps build-side rows with no probe match. No broadcast:
    both sides stream, so the probe side may be arbitrarily large."""
    import polars as pl

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def big(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["o_totalprice"], min_price)).select(["o_custkey"])

    orders = orders.map_batches(big, batch_format="pyarrow")

    def tag(side: int, key: str):
        def fn(b: pa.Table) -> pa.Table:
            k = pc.cast(b[key], pa.int64())
            name = b["c_name"] if side == 0 else pa.nulls(b.num_rows, pa.string())
            return pa.table(
                {
                    "k": k,
                    "c_name": name,
                    "side": pa.array(np.full(b.num_rows, side, dtype=np.int8)),
                }
            )

        return fn

    def dedup_probe(b: pa.Table) -> pa.Table:
        # probe side only needs DISTINCT keys per block (combiner)
        df = pl.from_arrow(b)
        probe = df.filter(pl.col("side") == 1).unique(subset=["k"])
        return pl.concat([df.filter(pl.col("side") == 0), probe]).to_arrow()

    both = (
        cust.map_batches(tag(0, "c_custkey"), batch_format="pyarrow")
        .union(orders.map_batches(tag(1, "o_custkey"), batch_format="pyarrow"))
        .map_batches(dedup_probe, batch_format="pyarrow")
        .map_batches(_bucket_by("k", num_buckets), batch_format="pyarrow")
        .sort("bucket")
    )

    def anti(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        build = df.filter(pl.col("side") == 0)
        probe = df.filter(pl.col("side") == 1).select("k").unique()
        out = build.join(probe, on="k", how="anti")
        return out.select(
            pl.col("k").alias("c_custkey"), pl.col("c_name")
        ).to_arrow()

    return both.map_batches(anti, batch_format="pyarrow", batch_size=None)


ORACLES["q_cust_without_orders"] = """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)"""


def q_quantile_sketch(sf_dir: str, bin_cents: int = 50):
    """Mergeable histogram-quantile SKETCH (the equi-width analog of
    t-digest/KLL for a bounded-range money column): per-block bin counts are
    the mergeable partial (the q_value_histogram combiner), quantiles read
    off the cumulative bin counts on the driver — the estimate is the bin's
    UPPER cent bound, a deterministic integer contract the SQL oracle
    reproduces exactly. Error is bounded by bin width; the exact per-group
    quantile operator (q_user_value_quantiles) is the no-sketch path."""
    import polars as pl

    hist = q_value_histogram(sf_dir, bin_cents=bin_cents).take_all()
    df = pl.DataFrame(
        {
            "bin": pl.Series([int(r["bin"]) for r in hist], dtype=pl.Int64),
            "n": pl.Series([int(r["n"]) for r in hist], dtype=pl.Int64),
        }
    ).sort("bin")
    total = int(df["n"].sum())
    cum = df.with_columns(pl.col("n").cum_sum().alias("c"))
    rows = []
    for q in (50, 90, 99):
        target = (total * q + 99) // 100  # ceil(total*q/100): rank of the quantile
        hit = cum.filter(pl.col("c") >= target).head(1)
        est = (int(hit["bin"][0]) + 1) * bin_cents  # upper cent bound of the bin
        rows.append({"q": q, "est_cents": est})
    return pa.table(
        {
            "q": pa.array([r["q"] for r in rows], pa.int64()),
            "est_cents": pa.array([r["est_cents"] for r in rows], pa.int64()),
        }
    )


ORACLES["q_quantile_sketch"] = """
    WITH h AS (SELECT CAST(round(value * 100) AS BIGINT) // 50 AS bin,
                      count(*) AS n
               FROM events GROUP BY bin),
         c AS (SELECT bin, sum(n) OVER (ORDER BY bin) AS c,
                      (SELECT sum(n) FROM h) AS total
               FROM h)
    SELECT q, CAST(est_cents AS BIGINT) AS est_cents FROM (
      SELECT 50 AS q,
             (SELECT min(bin) + 1 FROM c WHERE c >= (total * 50 + 99) // 100) * 50 AS est_cents
      UNION ALL
      SELECT 90,
             (SELECT min(bin) + 1 FROM c WHERE c >= (total * 90 + 99) // 100) * 50
      UNION ALL
      SELECT 99,
             (SELECT min(bin) + 1 FROM c WHERE c >= (total * 99 + 99) // 100) * 50
    )"""


def q_value_hour_corr(sf_dir: str):
    """Pearson correlation between event value (cents) and hour-of-day, as
    an EXACT integer contract: the five sufficient statistics (n, Σx, Σy,
    Σx², Σy², Σxy) accumulate as per-block int partials (the mergeable
    statistical-aggregate shape — one tiny exchange), and the output is the
    covariance/variance NUMERATORS, integer-exact — the caller (and oracle)
    derive the float only for display, so the hash compare never touches a
    float. Headroom contract: n * Σx² must stay below 2^63 (holds to ~1e6
    events at cents scale; beyond that, rescale x or widen to the HUGEINT
    helpers in oracles_td)."""
    import polars as pl

    ds = _read(sf_dir, "events", ["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            (pl.col("value") * 100).round(0).cast(pl.Int64).alias("x"),
            pl.col("ts").dt.hour().cast(pl.Int64).alias("y"),
        )
        s = df.select(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("x").sum().alias("sx"),
            pl.col("y").sum().alias("sy"),
            (pl.col("x") * pl.col("x")).sum().alias("sxx"),
            (pl.col("y") * pl.col("y")).sum().alias("syy"),
            (pl.col("x") * pl.col("y")).sum().alias("sxy"),
        )
        return s.to_arrow()

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    sy = sum(int(r["sy"]) for r in parts)
    sxx = sum(int(r["sxx"]) for r in parts)
    syy = sum(int(r["syy"]) for r in parts)
    sxy = sum(int(r["sxy"]) for r in parts)
    cov_num = n * sxy - sx * sy
    varx_num = n * sxx - sx * sx
    vary_num = n * syy - sy * sy
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "cov_num": pa.array([cov_num], pa.int64()),
            "varx_num": pa.array([varx_num], pa.int64()),
            "vary_num": pa.array([vary_num], pa.int64()),
        }
    )


ORACLES["q_value_hour_corr"] = """
    WITH s AS (SELECT CAST(round(value * 100) AS BIGINT) AS x,
                      CAST(extract(hour FROM ts) AS BIGINT) AS y
               FROM events),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                      CAST(sum(x * x) AS BIGINT) AS sxx,
                      CAST(sum(y * y) AS BIGINT) AS syy,
                      CAST(sum(x * y) AS BIGINT) AS sxy
               FROM s)
    SELECT n,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
           CAST(n * syy - sy * sy AS BIGINT) AS vary_num
    FROM a"""


def q_ntile_users(sf_dir: str, tiles: int = 4, num_buckets: int = 32):
    """NTILE(4) of users by total spend — the quantile-bucketing window
    function Ray Data lacks, built as a distributed rank: per-user totals
    (one combiner-backed groupby), then a VALUE-ordered bucket key (monotone
    affine rescale of total into <=num_buckets range buckets, so bucket
    order == total order and equal totals can't straddle buckets), per-bucket
    counts to the driver (num_buckets ints — metadata, not data), and a
    bucket-sorted whole-block rank + offset. NTILE's remainder rule (first
    ``n % tiles`` tiles get the extra row) is applied elementwise from the
    global rank, bit-matching the SQL window function under the deterministic
    (total_cents, user_id) order."""
    import polars as pl
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
        return pa.table({"user_id": b["user_id"], "cents": v})

    totals = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="total_cents"))
        .materialize()
    )
    bounds = totals.aggregate(
        Min("total_cents", alias_name="lo"), Max("total_cents", alias_name="hi")
    )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(1, hi - lo + 1)

    def with_bucket(b: pa.Table) -> pa.Table:
        t = pc.cast(b["total_cents"], pa.int64())
        bk = pc.cast(
            pc.divide(pc.multiply(pc.subtract(t, lo), num_buckets), span), pa.int32()
        )
        return b.append_column("bucket", bk)

    bucketed = totals.map_batches(with_bucket, batch_format="pyarrow").materialize()
    counts = {
        int(r["bucket"]): int(r["n"])
        for r in bucketed.groupby("bucket").aggregate(Count(alias_name="n")).take_all()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for bk in range(num_buckets + 1):
        offsets[bk] = acc
        acc += counts.get(bk, 0)
    size, rem = n // tiles, n % tiles

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["bucket", "total_cents", "user_id"])
        off = pl.col("bucket").replace_strict(
            list(offsets.keys()), list(offsets.values()), return_dtype=pl.Int64
        )
        rn = (pl.col("bucket").cum_count().over("bucket") - 1 + off).cast(pl.Int64)
        head = rem * (size + 1)
        tile = (
            pl.when(rn < head)
            .then(rn // (size + 1))
            .otherwise(rem + (rn - head) // pl.lit(max(size, 1)))
            + 1
        )
        return df.select(
            pl.col("user_id"),
            pl.col("total_cents").cast(pl.Int64),
            tile.cast(pl.Int64).alias("quartile"),
        ).to_arrow()

    return bucketed.sort("bucket").map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


ORACLES["q_ntile_users"] = """
    WITH t AS (SELECT user_id,
                      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
               FROM events GROUP BY user_id)
    SELECT user_id, total_cents,
           CAST(ntile(4) OVER (ORDER BY total_cents, user_id) AS BIGINT) AS quartile
    FROM t"""


def q_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((event_type, dow), (event_type), (hour)) over
    events — arbitrary (non-hierarchical) grouping sets, the general form of
    ROLLUP/CUBE. Scale design (same as q_rollup_docs): ONE distributed
    groupby at the finest level (the union of all set columns, with a
    per-block combiner), then every requested set aggregates from that
    group-cardinality-sized result on the driver — never a second input scan."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            pl.col("event_type"),
            pl.col("ts").dt.hour().cast(pl.Int64).alias("hour"),
            (pl.col("ts").dt.weekday() % 7).cast(pl.Int64).alias("dow"),
            (pl.col("value") * 100).round(0).cast(pl.Int64).alias("cents"),
        )
        return (
            df.group_by(["event_type", "hour", "dow"])
            .agg(pl.len().cast(pl.Int64).alias("n"), pl.col("cents").sum().alias("value_cents"))
            .to_arrow()
        )

    finest = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["event_type", "hour", "dow"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .take_all()
    )
    df = pl.DataFrame(
        {
            "event_type": [r["event_type"] for r in finest],
            "hour": pl.Series([int(r["hour"]) for r in finest], dtype=pl.Int64),
            "dow": pl.Series([int(r["dow"]) for r in finest], dtype=pl.Int64),
            "n": pl.Series([int(r["n"]) for r in finest], dtype=pl.Int64),
            "value_cents": pl.Series([int(r["value_cents"]) for r in finest], dtype=pl.Int64),
        }
    )
    cols = ["event_type", "hour", "dow", "n", "value_cents"]
    ni = pl.lit(None, dtype=pl.Int64)
    s1 = (
        df.group_by(["event_type", "dow"])
        .agg(pl.col("n").sum(), pl.col("value_cents").sum())
        .with_columns(ni.alias("hour"))
    )
    s2 = (
        df.group_by("event_type")
        .agg(pl.col("n").sum(), pl.col("value_cents").sum())
        .with_columns(ni.alias("hour"), ni.alias("dow"))
    )
    s3 = (
        df.group_by("hour")
        .agg(pl.col("n").sum(), pl.col("value_cents").sum())
        .with_columns(pl.lit(None, dtype=pl.Utf8).alias("event_type"), ni.alias("dow"))
    )
    return pl.concat([s.select(cols) for s in (s1, s2, s3)]).to_arrow()


ORACLES["q_grouping_sets"] = """
    WITH base AS (SELECT event_type,
                         CAST(extract(hour FROM ts) AS BIGINT) AS hour,
                         CAST(extract(dow FROM ts) AS BIGINT) AS dow,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
    SELECT event_type, hour, dow,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS value_cents
    FROM base
    GROUP BY GROUPING SETS ((event_type, dow), (event_type), (hour))"""


def q_user_outliers(sf_dir: str):
    """Users whose total spend deviates more than 2 population-σ from the
    mean user total — anomaly flagging as an EXACT integer contract (the
    q_value_hour_corr trick applied to a z-score): with n users, Σx, Σx²
    over per-user cent totals, |z| > 2 is equivalent to
    (n·x − Σx)² > 4·(n·Σx² − (Σx)²), all in int64 — no float ever enters the
    comparison or the output. Two tiny aggregates after the per-user groupby
    (driver sees 3 ints), then a broadcast-scalar filter pass. Headroom:
    n²·x² < 2^63 holds to ~1e5 users at ~1e4-dollar totals; beyond, rescale
    to whole dollars or widen via the HUGEINT helpers in oracles_td."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(b["value"], 100.0)), pa.int64())
        return pa.table({"user_id": b["user_id"], "cents": v})

    totals = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="total_cents"))
        .materialize()
    )

    def sq(b: pa.Table) -> pa.Table:
        t = pc.cast(b["total_cents"], pa.int64())
        return pa.table({"t": t, "t2": pc.multiply(t, t)})

    stats = totals.map_batches(sq, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("t", alias_name="sx"), Sum("t2", alias_name="sxx")
    )
    n, sx, sxx = int(stats["n"]), int(stats["sx"]), int(stats["sxx"])
    varx4 = 4 * (n * sxx - sx * sx)

    def flag(b: pa.Table) -> pa.Table:
        t = pc.cast(b["total_cents"], pa.int64())
        dev = pc.subtract(pc.multiply(t, n), sx)
        keep = pc.greater(pc.multiply(dev, dev), varx4)
        out = pa.table({"user_id": b["user_id"], "total_cents": t, "dev_num": dev})
        return out.filter(keep)

    return totals.map_batches(flag, batch_format="pyarrow")


ORACLES["q_user_outliers"] = """
    WITH t AS (SELECT user_id,
                      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total
               FROM events GROUP BY user_id),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(total) AS BIGINT) AS sx,
                      CAST(sum(total * total) AS BIGINT) AS sxx
               FROM t)
    SELECT user_id, total AS total_cents, CAST(n * total - sx AS BIGINT) AS dev_num
    FROM t, s
    WHERE (n * total - sx) * (n * total - sx) > 4 * (n * sxx - sx * sx)"""


def q_ship_priority(sf_dir: str, k: int = 10, num_buckets: int = 32):
    """TPC-H Q3 shape (shipping priority): lineitem x orders x customer with
    segment + two date filters, revenue per order, global top-k. The classic
    multi-join benchmark composition, done scale-honest: BOTH joins are
    large x large hash-bucket joins (at 100 TB customer and orders are
    data-sized too — no broadcast anywhere), filters pushed to the reads so
    only qualifying rows enter either exchange, revenue in integer micros
    (cents x (100 - discount_pct)) so the aggregate is order-free exact,
    and top-k as per-block (revenue DESC, orderkey ASC) heads merged on the
    driver — k x nblocks rows, never the full group result."""
    import datetime as _dt
    import heapq

    import polars as pl

    cutoff = _dt.datetime(1998, 1, 1)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def prep_c(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
        return pa.table({"o_custkey": keep["c_custkey"]})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["o_orderdate"], pa.scalar(cutoff)))

    orders_f = hash_join(
        orders.map_batches(prep_o, batch_format="pyarrow"),
        cust.map_batches(prep_c, batch_format="pyarrow"),
        on="o_custkey",
        right_cols=[],
    )

    def as_l(b: pa.Table) -> pa.Table:
        return pa.table(
            {"l_orderkey": b["o_orderkey"], "o_orderdate": b["o_orderdate"]}
        )

    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def prep_l(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.greater(b["l_shipdate"], pa.scalar(cutoff)))
        cents = pc.cast(pc.round(pc.multiply(keep["l_extendedprice"], 100.0)), pa.int64())
        dpct = pc.cast(pc.round(pc.multiply(keep["l_discount"], 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))
        return pa.table({"l_orderkey": keep["l_orderkey"], "rev": rev})

    joined = hash_join(
        line.map_batches(prep_l, batch_format="pyarrow"),
        orders_f.map_batches(as_l, batch_format="pyarrow"),
        on="l_orderkey",
        right_cols=["o_orderdate"],
    )
    grouped = joined.groupby("l_orderkey").aggregate(
        Sum("rev", alias_name="revenue_micros"),
        Max("o_orderdate", alias_name="o_orderdate"),
    )

    def local_topk(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return (
            df.sort(["revenue_micros", "l_orderkey"], descending=[True, False])
            .head(k)
            .to_arrow()
        )

    rows = grouped.map_batches(
        local_topk, batch_format="pyarrow", batch_size=None
    ).take_all()
    best = heapq.nsmallest(
        k, ((-int(r["revenue_micros"]), int(r["l_orderkey"]), r["o_orderdate"]) for r in rows)
    )
    return pa.table(
        {
            "l_orderkey": pa.array([ok for _, ok, _ in best], pa.int64()),
            "o_orderdate": pa.array([d for _, _, d in best], pa.timestamp("us")),
            "revenue_micros": pa.array([-rv for rv, _, _ in best], pa.int64()),
        }
    )


ORACLES["q_ship_priority"] = """
    SELECT l_orderkey, o_orderdate, revenue_micros FROM (
      SELECT l.l_orderkey, o.o_orderdate,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_micros
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        AND l.l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    ORDER BY revenue_micros DESC, l_orderkey
    LIMIT 10"""


def q_dau_wau(sf_dir: str):
    """DAU/WAU: per-day distinct active users and the 7-day trailing
    distinct-user count — the rolling-DISTINCT window SQL window functions
    cannot express (COUNT(DISTINCT) OVER RANGE is illegal) and Ray Data has
    no operator for. Design: one (day, user) dedup exchange; DAU is a tiny
    per-day count; WAU EXPLODES each active (day, user) to its 7 target days
    (a x7 fan-out of the DEDUP'D pairs, not the raw events) and dedups
    (target_day, user) — turning a rolling distinct into two plain groupbys.
    Day domain = days observed in the data (driver-side calendar-sized set).
    Output (day, dau, wau) is #days rows — driver-safe by construction."""
    import polars as pl
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def to_pairs(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            pl.col("ts").cast(pl.Date).cast(pl.Int32).cast(pl.Int64).alias("day"),
            pl.col("user_id"),
        )
        return df.unique().to_arrow()

    pairs = (
        ds.map_batches(to_pairs, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .materialize()
    )
    dau = {int(r["day"]): int(r["n"]) for r in pairs.groupby("day").aggregate(Count(alias_name="n")).take_all()}

    def fan(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = (
            df.with_columns(pl.int_ranges(pl.col("day"), pl.col("day") + 7).alias("t"))
            .explode("t")
            .select(pl.col("t").alias("day"), pl.col("user_id"))
        )
        return out.to_arrow()

    wau_rows = (
        pairs.map_batches(fan, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
        .groupby("day")
        .aggregate(Count(alias_name="wau"))
        .take_all()
    )
    wau = {int(r["day"]): int(r["wau"]) for r in wau_rows}
    days = sorted(dau)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "dau": pa.array([dau[d] for d in days], pa.int64()),
            "wau": pa.array([wau[d] for d in days], pa.int64()),
        }
    )


ORACLES["q_dau_wau"] = """
    WITH a AS (SELECT DISTINCT
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
                 user_id AS u
               FROM events),
         days AS (SELECT DISTINCT d FROM a)
    SELECT days.d AS day,
           CAST((SELECT count(*) FROM a WHERE a.d = days.d) AS BIGINT) AS dau,
           CAST((SELECT count(DISTINCT u) FROM a
                 WHERE a.d BETWEEN days.d - 6 AND days.d) AS BIGINT) AS wau
    FROM days"""


def q_late_orders(sf_dir: str, late_days: int = 90, num_buckets: int = 32):
    """TPC-H Q4 shape (order priority checking): count orders per priority
    having AT LEAST ONE line item shipped more than ``late_days`` after the
    order date — the predicated SEMI-join (EXISTS with a correlated
    comparison) the bloom semi-join can't express. Scale design: one
    large x large hash-bucket join ships only the 2+2 needed columns, the
    late predicate filters inside the join blocks, the distinct-order
    reduction is a combiner-backed groupby over (order, priority) — order
    keys, not line items, cross the second exchange — and the final
    per-priority count is vocabulary-sized."""
    import polars as pl

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def as_o(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": b["l_orderkey"], "l_shipdate": b["l_shipdate"]}
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = hash_join(
        line.map_batches(as_o, batch_format="pyarrow"),
        orders,
        on="o_orderkey",
        right_cols=["o_orderdate", "o_orderpriority"],
        num_buckets=num_buckets,
    )

    def late(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = (
            df.filter(
                pl.col("l_shipdate") > pl.col("o_orderdate") + pl.duration(days=late_days)
            )
            .select(["o_orderkey", "o_orderpriority"])
            .unique()
        )
        return out.to_arrow()

    distinct_orders = (
        joined.map_batches(late, batch_format="pyarrow")
        .groupby(["o_orderkey", "o_orderpriority"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])
    )
    return (
        distinct_orders.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_late_orders"))
    )


ORACLES["q_late_orders"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority"""


def q_nation_revenue(sf_dir: str, region: str = "ASIA", num_buckets: int = 32):
    """TPC-H Q5 shape (local supplier volume): revenue per nation where the
    CUSTOMER's and the SUPPLIER's nation coincide inside one region, over a
    two-year order window. Scale shape: the two data-sized joins
    (orders x region-customers, lineitem x qualified-orders) are hash-bucket
    exchanges; region/nation are constant-sized and the supplier->nation map
    broadcasts once via ray.put (supplier is TPC-H's smallest fact table —
    1/15th of customer; swap the lookup for a third hash_join on l_suppkey
    if suppliers ever become data-sized). The co-location condition
    c_nationkey = s_nationkey evaluates block-locally after the joins;
    revenue is integer micros (order-free exact sums)."""
    import datetime as _dt

    import numpy as np
    import ray

    from ray.data.aggregate import Sum

    lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1998, 1, 1)

    nat = {
        int(r["n_nationkey"]): str(r["n_name"])
        for r in _read(sf_dir, "nation").take_all()
    }
    reg = {
        int(r["r_regionkey"]): str(r["r_name"])
        for r in _read(sf_dir, "region").take_all()
    }
    region_nations = {
        int(r["n_nationkey"])
        for r in _read(sf_dir, "nation").take_all()
        if reg[int(r["n_regionkey"])] == region
    }

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def prep_c(b: pa.Table) -> pa.Table:
        keep = b.filter(
            pc.is_in(
                pc.cast(b["c_nationkey"], pa.int64()),
                value_set=pa.array(sorted(region_nations), pa.int64()),
            )
        )
        return pa.table(
            {
                "o_custkey": keep["c_custkey"],
                "c_nationkey": pc.cast(keep["c_nationkey"], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_o(b: pa.Table) -> pa.Table:
        keep = b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        )
        return keep.drop_columns(["o_orderdate"])

    orders_f = hash_join(
        orders.map_batches(prep_o, batch_format="pyarrow"),
        cust.map_batches(prep_c, batch_format="pyarrow"),
        on="o_custkey",
        right_cols=["c_nationkey"],
    )

    def as_l(b: pa.Table) -> pa.Table:
        return pa.table(
            {"l_orderkey": b["o_orderkey"], "c_nationkey": b["c_nationkey"]}
        )

    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def prep_l(b: pa.Table) -> pa.Table:
        cents = _cents(b["l_extendedprice"])
        dpct = _cents(b["l_discount"])  # discount fraction -> integer percent
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), dpct))
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"], "rev": rev}
        )

    joined = hash_join(
        line.map_batches(prep_l, batch_format="pyarrow"),
        orders_f.map_batches(as_l, batch_format="pyarrow"),
        on="l_orderkey",
        right_cols=["c_nationkey"],
    )

    sup = sorted(
        (int(r["s_suppkey"]), int(r["s_nationkey"]))
        for r in _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    )
    skeys = np.asarray([k for k, _ in sup], dtype=np.int64)
    snats = np.asarray([v for _, v in sup], dtype=np.int64)
    sref = ray.put((skeys, snats))

    def local_supplier(b: pa.Table) -> pa.Table:
        keys, nats = ray.get(sref)
        lk = np.asarray(b["l_suppkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pos = np.searchsorted(keys, lk)
        pos = np.clip(pos, 0, len(keys) - 1)
        s_nat = np.where(keys[pos] == lk, nats[pos], -1)
        c_nat = np.asarray(b["c_nationkey"].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep = s_nat == c_nat
        return pa.table(
            {
                "nationkey": pa.array(c_nat[keep], pa.int64()),
                "rev": pa.array(
                    np.asarray(b["rev"].to_numpy(zero_copy_only=False), dtype=np.int64)[keep],
                    pa.int64(),
                ),
            }
        )

    grouped = (
        joined.map_batches(local_supplier, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("rev", alias_name="revenue_micros"))
    )

    def name(b: pa.Table) -> pa.Table:
        nk = b["nationkey"].to_pylist()
        return pa.table(
            {
                "n_name": pa.array([nat[int(k)] for k in nk], pa.string()),
                "revenue_micros": b["revenue_micros"],
            }
        )

    return grouped.map_batches(name, batch_format="pyarrow")


ORACLES["q_nation_revenue"] = """
    SELECT n_name,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             AS revenue_micros
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name"""


def q_user_spend_rank(sf_dir: str, num_buckets: int = 32):
    """DENSE_RANK() of users by total spend (ties share a rank, no gaps) —
    the rank-family window function, distributed with the same monotone
    range-bucket pattern as q_ntile_users: per-user totals, a VALUE-ordered
    bucket key (equal totals can't straddle buckets), ONE bucket sort, then
    two block-local passes over the materialized sorted data — per-bucket
    DISTINCT-total counts to the driver (num_buckets ints), suffix offsets,
    and an elementwise dense rank (descending) + offset per block."""
    import polars as pl
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"], "cents": _cents(b["value"])})

    totals = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="total_cents"))
        .materialize()
    )
    bounds = totals.aggregate(
        Min("total_cents", alias_name="lo"), Max("total_cents", alias_name="hi")
    )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(1, hi - lo + 1)

    def with_bucket(b: pa.Table) -> pa.Table:
        t = pc.cast(b["total_cents"], pa.int64())
        bk = pc.cast(
            pc.divide(pc.multiply(pc.subtract(t, lo), num_buckets), span), pa.int32()
        )
        return b.append_column("bucket", bk)

    sorted_ds = (
        totals.map_batches(with_bucket, batch_format="pyarrow")
        .sort("bucket")
        .materialize()
    )

    def bucket_stats(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return (
            df.group_by("bucket")
            .agg(pl.col("total_cents").n_unique().alias("nd"))
            .to_arrow()
        )

    nd = {
        int(r["bucket"]): int(r["nd"])
        for r in sorted_ds.map_batches(
            bucket_stats, batch_format="pyarrow", batch_size=None
        ).take_all()
    }
    # descending rank: a bucket's offset = distinct totals in HIGHER buckets
    offsets, acc = {}, 0
    for bk in sorted(nd, reverse=True):
        offsets[bk] = acc
        acc += nd[bk]

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        off = pl.col("bucket").replace_strict(
            list(offsets.keys()), list(offsets.values()), return_dtype=pl.Int64
        )
        local = pl.col("total_cents").rank("dense", descending=True).over("bucket")
        return df.select(
            pl.col("user_id"),
            pl.col("total_cents").cast(pl.Int64),
            (local.cast(pl.Int64) + off).alias("spend_rank"),
        ).to_arrow()

    return sorted_ds.map_batches(block, batch_format="pyarrow", batch_size=None)


ORACLES["q_user_spend_rank"] = """
    SELECT user_id, total_cents,
           CAST(dense_rank() OVER (ORDER BY total_cents DESC) AS BIGINT) AS spend_rank
    FROM (SELECT user_id,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
          FROM events GROUP BY user_id)"""


def q_user_median(sf_dir: str, num_buckets: int = 32):
    """Per-user CONTINUOUS median of event values (the PERCENTILE_CONT(0.5)
    window shape) as an EXACT integer: median2x_cents = the sum of the two
    middle elements of the user's sorted cents (equal elements when n is
    odd) — twice the interpolated median, so no float ever enters the
    contract. One user-bucketed sort (a user's rows never straddle a
    partition), block-local vectorized middle-element selection."""
    import polars as pl

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b["user_id"], "cents": _cents(b["value"])})

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).drop("bucket")
        if not df.height:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "median2x_cents": pa.array([], pa.int64()),
                }
            )
        out = (
            df.sort(["user_id", "cents"])
            .group_by("user_id", maintain_order=True)
            .agg(
                (
                    pl.col("cents").get((pl.len() - 1) // 2)
                    + pl.col("cents").get(pl.len() // 2)
                )
                .cast(pl.Int64)
                .alias("median2x_cents")
            )
        )
        return out.to_arrow()

    return (
        ds.map_batches(cents, batch_format="pyarrow")
        .map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


ORACLES["q_user_median"] = """
    WITH c AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
    r AS (SELECT user_id, cents,
                 row_number() OVER (PARTITION BY user_id ORDER BY cents) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM c)
    SELECT user_id,
           CAST(sum(cents * (CAST(rn = (n + 1) // 2 AS INT)
                             + CAST(rn = n // 2 + 1 AS INT))) AS BIGINT)
             AS median2x_cents
    FROM r GROUP BY user_id"""


def q_cusum_alerts(
    sf_dir: str,
    target_cents: int = 5000,
    h_cents: int = 50_000,
    num_buckets: int = 32,
):
    """Per-user CUSUM change-point detection (Page 1954): the sequential
    recurrence ``S_i = max(0, S_{i-1} + (x_i - target))`` looks
    unvectorizable, but the closed form ``S_i = P_i - min(0, min_{j<=i} P_j)``
    (P = running sum of deviations) turns it into one cum_sum + one cum_min —
    fully vectorized per user. Emits the events where the statistic crosses
    ``h_cents`` (the upward-shift alarms), deterministic (ts, event_id)
    order. One user-bucketed sort; a user's events never straddle a block."""
    import polars as pl

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        d = pc.subtract(_cents(b["value"]), pa.scalar(target_cents, pa.int64()))
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "d": d,
            }
        )

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).drop("bucket")
        if not df.height:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "cusum_cents": pa.array([], pa.int64()),
                }
            )
        out = (
            df.sort(["user_id", "ts", "event_id"])
            .with_columns(P=pl.col("d").cum_sum().over("user_id"))
            .with_columns(
                S=pl.col("P")
                - pl.min_horizontal(pl.col("P").cum_min().over("user_id"), pl.lit(0))
            )
            .filter(pl.col("S") > h_cents)
            .select(
                pl.col("user_id"),
                pl.col("event_id"),
                pl.col("S").cast(pl.Int64).alias("cusum_cents"),
            )
        )
        return out.to_arrow()

    return (
        ds.map_batches(cents, batch_format="pyarrow")
        .map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


ORACLES["q_cusum_alerts"] = """
    WITH c AS (SELECT user_id, event_id, ts,
                      CAST(round(value * 100) AS BIGINT) - 5000 AS d
               FROM events),
    p AS (SELECT user_id, event_id, ts,
                 sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS P
          FROM c),
    m AS (SELECT user_id, event_id, P,
                 min(P) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS mn
          FROM p)
    SELECT user_id, event_id, CAST(P - least(mn, 0) AS BIGINT) AS cusum_cents
    FROM m WHERE P - least(mn, 0) > 50000"""


def _user_half_counts(sf_dir: str):
    """Per-user event counts in the two halves of the observation window —
    one combiner-backed groupby over (pre-aggregated) per-block partials."""
    import datetime as _dt

    from ray.data.aggregate import Sum

    split = _dt.datetime(2024, 1, 16)
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def flags(b: pa.Table) -> pa.Table:
        first = pc.less(b["ts"], pa.scalar(split))
        return pa.table(
            {
                "user_id": b["user_id"],
                "n_a": pc.cast(first, pa.int64()),
                "n_b": pc.cast(pc.invert(first), pa.int64()),
            }
        )

    return (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
    )


def q_users_retained(sf_dir: str):
    """INTERSECT shape: users active in BOTH halves of the window, with both
    counts — the retention set as one groupby, no self-join."""
    g = _user_half_counts(sf_dir)
    return g.map_batches(
        lambda b: b.filter(pc.and_(pc.greater(b["n_a"], 0), pc.greater(b["n_b"], 0))),
        batch_format="pyarrow",
    )


def q_morning_only_days(sf_dir: str):
    """EXCEPT shape at (user, day) grain: days where a user was active in the
    morning and silent in the afternoon — one groupby over per-block flag
    partials, the set-difference without a self-join (the user-level churn
    variant is empty on this corpus; the finer key keeps the shape honest)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def flags(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        am = pc.less(pc.hour(b["ts"]), 12)
        return pa.table(
            {
                "user_id": b["user_id"],
                "day": day,
                "n_am": pc.cast(am, pa.int64()),
                "n_pm": pc.cast(pc.invert(am), pa.int64()),
            }
        )

    g = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Sum("n_am", alias_name="n_am"), Sum("n_pm", alias_name="n_pm"))
    )
    out = g.map_batches(
        lambda b: b.filter(pc.and_(pc.greater(b["n_am"], 0), pc.equal(b["n_pm"], 0))),
        batch_format="pyarrow",
    )
    return out.drop_columns(["n_pm"])


ORACLES["q_users_retained"] = """
    SELECT user_id,
           CAST(sum(CAST(ts < TIMESTAMP '2024-01-16' AS INT)) AS BIGINT) AS n_a,
           CAST(sum(CAST(ts >= TIMESTAMP '2024-01-16' AS INT)) AS BIGINT) AS n_b
    FROM events GROUP BY user_id
    HAVING n_a > 0 AND n_b > 0"""

ORACLES["q_morning_only_days"] = """
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
           CAST(sum(CAST(extract(hour FROM ts) < 12 AS INT)) AS BIGINT) AS n_am
    FROM events GROUP BY user_id, day
    HAVING n_am > 0 AND sum(CAST(extract(hour FROM ts) >= 12 AS INT)) = 0"""


def q_decayed_counts(sf_dir: str, half_life_days: int = 1, window_days: int = 10):
    """Time-decayed popularity per event type (the streaming-analytics
    "recent counts matter more" aggregate) as an EXACT integer: each event
    contributes ``2^(window - age_days)`` where age_days counts back from
    the corpus max day (events older than the window contribute 1 — the
    floor keeps every event scored). Power-of-two decay makes the sum
    order-free integer-exact — no float EWMA drift, same result on any
    partitioning. Two passes: a metadata-scale max-ts reduce, then one
    combiner-backed groupby."""
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts"])
    hi = ds.aggregate(Max("ts", alias_name="hi"))["hi"]

    def score(b: pa.Table) -> pa.Table:
        age_us = pc.subtract(pa.scalar(hi), b["ts"])
        age_days = pc.cast(
            pc.divide(pc.cast(age_us, pa.int64()), 86_400_000_000), pa.int64()
        )
        exp = pc.max_element_wise(
            pc.subtract(pa.scalar(window_days, pa.int64()), age_days),
            pa.scalar(0, pa.int64()),
        )
        w = pc.shift_left(pa.scalar(1, pa.int64()), exp)
        return pa.table({"event_type": b["event_type"], "w": w})

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("w", alias_name="decayed_weight"))
    )


ORACLES["q_decayed_counts"] = """
    WITH hi AS (SELECT max(ts) AS hi FROM events),
    s AS (SELECT event_type,
                 CAST(1 AS BIGINT) << GREATEST(
                   10 - CAST(date_diff('microseconds', ts, hi.hi)
                             // 86400000000 AS BIGINT), 0) AS w
          FROM events CROSS JOIN hi)
    SELECT event_type, CAST(sum(w) AS BIGINT) AS decayed_weight
    FROM s GROUP BY event_type"""


def q_pushdown_lang(sf_dir: str):
    """Predicate-pushdown read: the filter rides INTO read_parquet, so only
    row groups whose stats can match leave storage (the "prune at the read"
    rule as an explicit operator — a filter AFTER the read would ship every
    row). Returns English docs' (doc_id, n_chars)."""
    import pyarrow.dataset as pads

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=pads.field("lang") == "en",
    ).drop_columns(["lang"])


ORACLES["q_pushdown_lang"] = (
    "SELECT doc_id, n_chars FROM documents WHERE lang = 'en'"
)


def q_global_rank(sf_dir: str, num_buckets: int = 64):
    """Global order statistics without a global sort bottleneck: every
    document gets its exact global ``rnk`` (row_number under
    (n_chars, doc_id)) and ``pct`` (percent_rank) — the calibration step
    that turns a raw quality score into a corpus percentile at 100 TB.

    Mechanism (the sequence_pack metadata-prefix-sum shape, keyed by VALUE
    RANGE instead of id range): min/max of the column reach the driver (2
    ints), rows bucket by value range, pass 1 ships ONE count per bucket to
    the driver (metadata scale), the driver folds exclusive offsets, pass 2
    sorts on the bucket key alone and each block ranks its runs locally plus
    the bucket offset. A pathologically hot VALUE lands in one bucket (ties
    must co-locate to rank); skew in the value distribution — not in any
    key — is the only hazard, and the bucket count is a free dial.

    pct = (rnk-1)/(n-1) computed in float64 identically on both sides."""
    import polars as pl
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).materialize()
    lo, hi = int(ds.min("n_chars")), int(ds.max("n_chars"))
    span = max(1, -(-(hi - lo + 1) // num_buckets))

    def bucket(b: pa.Table) -> pa.Table:
        bk = pc.cast(
            pc.divide(pc.subtract(b["n_chars"], lo), span), pa.int32()
        )
        return b.append_column("bucket", bk)

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    counts = {
        r["bucket"]: r["count()"]
        for r in bucketed.groupby("bucket").aggregate(Count()).take_all()
    }
    n = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for bk in range(num_buckets + 1):
        offsets[bk] = acc
        acc += int(counts.get(bk, 0))

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["bucket", "n_chars", "doc_id"])
        off = pl.col("bucket").replace_strict(
            list(offsets.keys()), list(offsets.values()), return_dtype=pl.Int64
        )
        rnk = pl.col("doc_id").cum_count().over("bucket").cast(pl.Int64) + off
        return (
            df.with_columns(rnk.alias("rnk"))
            .select(
                pl.col("doc_id"),
                pl.col("n_chars"),
                pl.col("rnk"),
                ((pl.col("rnk") - 1) / max(n - 1, 1)).alias("pct"),
            )
            .to_arrow()
        )

    return bucketed.sort("bucket").map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


ORACLES["q_global_rank"] = """
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
           percent_rank() OVER (ORDER BY n_chars, doc_id) AS pct
    FROM documents"""


def q_skyline(sf_dir: str, num_buckets: int = 32):
    """Distributed 2-D skyline (Pareto frontier): the parts no other part
    dominates — bigger-or-equal size AND cheaper-or-equal price with one
    strict — i.e. maximize p_size while minimizing price. The multi-objective
    shortlist shape (best docs per quality/length tradeoff) at 100-TB scale.

    Mechanism: size-range buckets; pass 1 ships ONE min-price per bucket to
    the driver (metadata scale), the driver folds the suffix-min coming from
    strictly-higher buckets; pass 2 sorts on the bucket key alone and each
    block resolves its buckets locally (per-size min, cumulative min over
    strictly larger sizes, both vectorized). No all-pairs dominance test
    anywhere; integer cents keep the comparisons exact."""
    import polars as pl
    from ray.data.aggregate import Min

    SENT = 1 << 62

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": b["p_partkey"],
                "p_size": b["p_size"],
                "price_cents": _cents(b["p_retailprice"]),
            }
        )

    ds = (
        _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )
    lo, hi = int(ds.min("p_size")), int(ds.max("p_size"))
    span = max(1, -(-(hi - lo + 1) // num_buckets))

    def bucket(b: pa.Table) -> pa.Table:
        bk = pc.cast(pc.divide(pc.subtract(b["p_size"], lo), span), pa.int32())
        return b.append_column("bucket", bk)

    bucketed = ds.map_batches(bucket, batch_format="pyarrow")
    mins = {
        r["bucket"]: int(r["min"])
        for r in bucketed.groupby("bucket")
        .aggregate(Min("price_cents", alias_name="min"))
        .take_all()
    }
    # incoming[bk] = min price over all STRICTLY HIGHER size buckets
    incoming: dict[int, int] = {}
    acc = SENT
    for bk in range(num_buckets, -1, -1):
        incoming[bk] = acc
        acc = min(acc, mins.get(bk, SENT))

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        per_size = (
            df.group_by(["bucket", "p_size"])
            .agg(pl.col("price_cents").min().alias("msize"))
            .sort(["bucket", "p_size"], descending=[False, True])
            .with_columns(
                pl.col("msize").cum_min().shift(1).over("bucket").alias("m_in")
            )
            .with_columns(
                pl.min_horizontal(
                    pl.col("m_in"),
                    pl.col("bucket").replace_strict(
                        list(incoming.keys()),
                        list(incoming.values()),
                        return_dtype=pl.Int64,
                    ),
                ).alias("m1")
            )
        )
        out = (
            df.join(per_size, on=["bucket", "p_size"], how="inner")
            .filter(
                (pl.col("price_cents") == pl.col("msize"))
                & (pl.col("price_cents") < pl.col("m1"))
            )
            .select(["p_partkey", "p_size", "price_cents"])
        )
        return out.to_arrow()

    return bucketed.sort("bucket").map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


ORACLES["q_skyline"] = """
    WITH p AS (SELECT p_partkey, p_size,
                      CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
               FROM part)
    SELECT a.p_partkey, a.p_size, a.price_cents
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
        AND (b.p_size > a.p_size OR b.price_cents < a.price_cents))"""


def q_hash_join_salted(sf_dir: str, num_buckets: int = 32, n_salt: int = 8):
    """q_hash_join_orders through the SALTED join — identical semantics and
    oracle, with the hot-key spread active: probe rows take a round-robin
    salt, the customer build side ships n_salt x. The driver's value-hash
    comparison against the same SQL proves salting is result-invariant."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def prep_o(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "price_cents": _cents(b["o_totalprice"]),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    def prep_c(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["c_custkey"],
                "c_name": b["c_name"],
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            }
        )

    return hash_join_salted(
        orders.map_batches(prep_o, batch_format="pyarrow"),
        cust.map_batches(prep_c, batch_format="pyarrow"),
        on="o_custkey",
        right_cols=["c_name", "c_nationkey"],
        n_salt=n_salt,
        num_buckets=num_buckets,
    )


ORACLES["q_hash_join_salted"] = ORACLES["q_hash_join_orders"]


def q_zorder_cluster(sf_dir: str, bits: int = 16):
    """Z-order (Morton) clustering keys over events (user_id x value): each
    dimension quantizes to ``bits`` bits against the corpus min/max (driver
    traffic: 4 ints — metadata scale), the two are bit-interleaved into one
    int64 ``zkey``, and sorting/partitioning the table by zkey co-locates
    2-D range neighborhoods — the layout step behind Delta/Iceberg
    OPTIMIZE ZORDER, as an oracled operator. The interleave is the classic
    Part1By1 spread (5 shift-mask steps, vectorized in numpy; the SQL oracle
    runs the identical steps with BIGINT bit ops, so keys are bit-exact).

    Returns (event_id, zkey); downstream layout = sort by zkey + ranged
    Parquet writes."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"]).materialize()

    lo_u, hi_u = int(ds.min("user_id")), int(ds.max("user_id"))
    vmin, vmax = ds.min("value"), ds.max("value")
    lo_v, hi_v = int(round(vmin * 100)), int(round(vmax * 100))
    top = (1 << bits) - 1

    def spread(x: np.ndarray) -> np.ndarray:
        # Part1By1: 16-bit -> even bit positions of a 32-bit lane
        x = x.astype(np.int64) & 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    def zkeys(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        v = np.asarray(
            pc.round(pc.multiply(b["value"], 100.0)).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        qu = (u - lo_u) * top // max(1, hi_u - lo_u)
        qv = (v - lo_v) * top // max(1, hi_v - lo_v)
        z = spread(qu) | (spread(qv) << 1)
        return pa.table(
            {"event_id": b["event_id"], "zkey": pa.array(z, pa.int64())}
        )

    return ds.map_batches(zkeys, batch_format="pyarrow")


def _sql_spread(x: str) -> str:
    """The Part1By1 bit spread as SQL over a BIGINT expression — the exact
    numpy steps in q_zorder_cluster."""
    s = f"(({x}) & 65535)"
    for sh, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        s = f"((({s}) | (({s}) << {sh})) & {mask})"
    return s


ORACLES["q_zorder_cluster"] = f"""
    WITH b AS (SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
                      CAST(round(min(value) * 100) AS BIGINT) AS lo_v,
                      CAST(round(max(value) * 100) AS BIGINT) AS hi_v
               FROM events),
    q AS (SELECT event_id,
                 (user_id - b.lo_u) * 65535 // greatest(1, b.hi_u - b.lo_u) AS qu,
                 (CAST(round(value * 100) AS BIGINT) - b.lo_v) * 65535
                   // greatest(1, b.hi_v - b.lo_v) AS qv
          FROM events CROSS JOIN b)
    SELECT event_id,
           CAST({_sql_spread('qu')} | ({_sql_spread('qv')} << 1) AS BIGINT) AS zkey
    FROM q"""


def q_meta_count(sf_dir: str):
    """COUNT(*) answered from Parquet FOOTERS only — zero data bytes read
    (the planner shortcut every lakehouse applies; at 100 TB the difference
    between a footer sweep and a table scan is the whole job). File paths
    fan out as a Dataset and each task reads just its files' metadata
    blocks; the oracle's count(*) over the data proves the footers tell the
    truth."""
    import glob

    paths = sorted(
        glob.glob(f"{sf_dir}/lineitem.parquet")
        + glob.glob(f"{sf_dir}/lineitem.parquet/*.parquet")
    )

    def footer_counts(b: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        n = np.int64(0)
        for p in b["path"].to_pylist():
            n += pq.ParquetFile(p).metadata.num_rows
        return pa.table({"n_rows": pa.array([int(n)], pa.int64())})

    from ray.data.aggregate import Sum

    per_file = ray.data.from_items([{"path": p} for p in paths]).map_batches(
        footer_counts, batch_format="pyarrow"
    )
    total = per_file.aggregate(Sum("n_rows", alias_name="n_rows"))
    return pa.table({"n_rows": pa.array([int(total["n_rows"])], pa.int64())})


ORACLES["q_meta_count"] = "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem"


def table_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_col: str,
    value_cols: list[str],
    *,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Snapshot diff / change-data-capture between two keyed table versions:
    emits (key, change) with change ∈ {'added','removed','modified'} —
    unchanged rows emit nothing (the sparse CDC contract). One tag + union +
    bucketed-sort exchange; each block resolves its key runs with a
    vectorized polars fold (no driver materialization, no full outer join
    operator needed). Keys must be unique per side; duplicate keys raise."""
    import polars as pl

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            cols = {key_col: b[key_col]}
            for c in value_cols:
                cols[c] = pc.cast(b[c], pa.string())
            cols["_s"] = pa.array(np.full(b.num_rows, side, np.int8))
            return pa.table(cols)

        return fn

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        g = df.group_by(key_col).agg(
            pl.col("_s").n_unique().alias("sides"),
            pl.col("_s").count().alias("n"),
            pl.col("_s").min().alias("smin"),
            *[pl.col(c).n_unique().alias(f"u_{c}") for c in value_cols],
        )
        if (g["n"] > g["sides"]).any():
            raise ValueError(f"duplicate {key_col} within one side")
        changed = pl.any_horizontal(
            *[pl.col(f"u_{c}") > 1 for c in value_cols]
        )
        out = g.with_columns(
            pl.when(pl.col("sides") == 2)
            .then(pl.when(changed).then(pl.lit("modified")).otherwise(pl.lit(None)))
            .otherwise(
                pl.when(pl.col("smin") == 0)
                .then(pl.lit("removed"))
                .otherwise(pl.lit("added"))
            )
            .alias("change")
        )
        return (
            out.filter(pl.col("change").is_not_null())
            .select([key_col, "change"])
            .to_arrow()
        )

    unioned = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow")
    )
    return (
        unioned.map_batches(_bucket_by(key_col, num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(
            lambda t: block(t.drop_columns("bucket")),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def q_table_diff(sf_dir: str):
    """CDC diff between documents and a deterministically edited v2 (drop
    doc_id%7==0, edit text of the %5==0 survivors, add fresh ids for
    %11==0): emits only changed keys — oracled by the same derivation plus
    a FULL OUTER JOIN in SQL."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def v2(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b)
        keep = df.filter(pl.col("doc_id") % 7 != 0).with_columns(
            pl.when(pl.col("doc_id") % 5 == 0)
            .then(pl.col("text") + pl.lit(" [edited]"))
            .otherwise(pl.col("text"))
            .alias("text")
        )
        added = df.filter(pl.col("doc_id") % 11 == 0).select(
            (pl.col("doc_id") + 10_000_000).alias("doc_id"),
            pl.lit("fresh row").alias("text"),
        )
        return pl.concat([keep, added]).to_arrow()

    return table_diff(docs, docs.map_batches(v2, batch_format="pyarrow"), "doc_id", ["text"])


ORACLES["q_table_diff"] = """
    WITH v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]' ELSE text END AS text
      FROM documents WHERE doc_id % 7 != 0
      UNION ALL
      SELECT doc_id + 10000000, 'fresh row' FROM documents WHERE doc_id % 11 = 0)
    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.doc_id IS NULL THEN 'added'
                ELSE 'modified' END AS change
    FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
    WHERE b.doc_id IS NULL OR a.doc_id IS NULL OR a.text != b.text"""


def q_running_distinct(sf_dir: str, num_buckets: int = 32):
    """Cumulative DISTINCT users per day (the growth-curve query): running
    distinct is exact without any running state — a user counts exactly on
    their FIRST-SEEN day, so the curve is a prefix sum over per-day
    first-seen counts. One user-keyed groupby-min (pre-aggregated per block
    by the combiner), one day-level count (days = metadata scale), and the
    prefix sum folds on the driver over day rows only."""
    import polars as pl
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_day(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us"))
        return pa.table({"user_id": b["user_id"], "day": day})

    first_seen = (
        ds.map_batches(to_day, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
    )
    per_day = (
        first_seen.groupby("first_day").aggregate(Count(alias_name="n_new")).take_all()
    )
    per_day.sort(key=lambda r: r["first_day"])
    days, cum = [], []
    acc = 0
    for r in per_day:
        acc += int(r["n_new"])
        days.append(r["first_day"])
        cum.append(acc)
    return pa.table(
        {
            "day": pa.array(days, pa.timestamp("us")),
            "cum_users": pa.array(cum, pa.int64()),
        }
    )


ORACLES["q_running_distinct"] = """
    WITH fs AS (
      SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY user_id),
    pd AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM fs GROUP BY day)
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM pd"""


def q_user_top_event(sf_dir: str, num_buckets: int = 32):
    """Per-group argmax (each user's most frequent event type, ties to the
    lexicographically smallest type): two-phase — (user, type) counts
    pre-aggregate inside blocks and ride the groupby combiner, then ONE
    user-bucketed sort co-locates each user's handful of type rows and a
    vectorized block argmax picks the winner. The mode/argmax shape without
    shipping raw events twice."""
    import polars as pl
    from ray.data.aggregate import Count

    counts = (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
    )

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(
            ["user_id", "n", "event_type"], descending=[False, True, False]
        )
        return (
            df.group_by("user_id", maintain_order=True)
            .agg(
                pl.col("event_type").first().alias("top_event"),
                pl.col("n").first().cast(pl.Int64).alias("n"),
            )
            .to_arrow()
        )

    return (
        counts.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(
            lambda t: block(t.drop_columns("bucket")),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


ORACLES["q_user_top_event"] = """
    SELECT user_id, event_type AS top_event, n FROM (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rk
      FROM events GROUP BY user_id, event_type)
    WHERE rk = 1"""


def q_user_streaks(sf_dir: str, num_buckets: int = 32):
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active days
    (streaks) — the retention-analysis shape. Per user the classic
    row_number difference (day_rank - dense_day_index is constant within an
    island) runs vectorized per block after one user-bucketed sort of the
    DISTINCT (user, day) rows (pre-deduped per block so the exchange ships
    days, not events). Output: (user_id, streak_start, streak_days)."""
    import polars as pl
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def days(b: pa.Table) -> pa.Table:
        import polars as pl

        day = pc.cast(pc.floor_temporal(b["ts"], unit="day"), pa.timestamp("us"))
        ed = pc.divide(pc.cast(day, pa.int64()), 86_400_000_000)
        df = pl.from_arrow(pa.table({"user_id": b["user_id"], "ed": ed}))
        # integer epoch-day key: exchange keys stay int64 (timestamp groupby
        # keys are the hazard class), block-level dedup shrinks the exchange
        return df.unique().to_arrow()

    distinct_days = (
        ds.map_batches(days, batch_format="pyarrow")
        .groupby(["user_id", "ed"])
        .aggregate(Count(alias_name="_n"))
    )

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["user_id", "ed"])
        idx = pl.col("ed").cum_count().over("user_id").cast(pl.Int64)
        df = df.with_columns((pl.col("ed") - idx).alias("island"))
        return (
            df.group_by(["user_id", "island"])
            .agg(
                (pl.col("ed").min() * 86_400_000_000)
                .cast(pl.Datetime("us"))
                .alias("streak_start"),
                pl.len().cast(pl.Int64).alias("streak_days"),
            )
            .select(["user_id", "streak_start", "streak_days"])
            .to_arrow()
        )

    return (
        distinct_days.map_batches(
            _bucket_by("user_id", num_buckets), batch_format="pyarrow"
        )
        .sort("bucket")
        .map_batches(
            lambda t: block(t.drop_columns(["bucket", "_n"])),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


ORACLES["q_user_streaks"] = """
    WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    r AS (SELECT user_id, day,
                 CAST(epoch(day) // 86400 AS BIGINT)
                   - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
          FROM d)
    SELECT user_id, CAST(min(day) AS TIMESTAMP) AS streak_start,
           CAST(count(*) AS BIGINT) AS streak_days
    FROM r GROUP BY user_id, island"""


def q_moving_window(sf_dir: str, frame: int = 3, num_buckets: int = 32):
    """Per-event ROWS-frame moving aggregate (trailing ``frame``-row sum +
    actual frame size, ordered by (ts, event_id) within each user) — the
    ROWS BETWEEN k PRECEDING window shape, distinct from the RANGE/time
    window in q_sliding_user_count. Same sort(bucket) + whole-block pattern:
    the bucketed sort co-locates each user's full history, and the in-block
    kernel is a cum-sum difference (cs - cs.shift(frame)) — exact integer
    arithmetic, no rolling-kernel float drift, one vectorized pass per
    block regardless of user count."""
    import polars as pl

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["user_id", "ts", "event_id"])
        df = df.with_columns(
            (pl.col("value") * 100).round(0).cast(pl.Int64).alias("cents")
        ).with_columns(pl.col("cents").cum_sum().over("user_id").alias("cs"))
        out = df.with_columns(
            (
                pl.col("cs")
                - pl.col("cs").shift(frame).over("user_id").fill_null(0)
            ).alias("mov_sum_cents"),
            pl.min_horizontal(
                pl.col("cents").cum_count().over("user_id").cast(pl.Int64),
                pl.lit(frame, pl.Int64),
            ).alias("frame_n"),
        )
        return out.select(
            ["event_id", "user_id", "mov_sum_cents", "frame_n"]
        ).to_arrow()

    return (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


ORACLES["q_moving_window"] = """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS mov_sum_cents,
           CAST(count(*) OVER w AS BIGINT) AS frame_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""


def q_interval_union(sf_dir: str, span_minutes: int = 30, num_buckets: int = 32):
    """Per-user interval-union coverage: each event opens a [ts, ts+span)
    interval; overlapping intervals merge into islands and the output is
    (user_id, n_islands, covered_us) — the coverage/uptime shape (ad
    exposure, sensor on-time, session coverage). Classic running-max
    gaps-and-islands, vectorized per block after one user-bucketed sort:
    an interval starts a new island iff its start exceeds the cumulative
    max end of all earlier intervals. Tie-safe by construction: equal
    timestamps yield identical intervals, so cum-max and the break flag
    are order-invariant within ties."""
    import polars as pl

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def block(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).sort(["user_id", "ts"])
        df = df.with_columns(
            pl.col("ts").alias("s"),
            (pl.col("ts") + pl.duration(minutes=span_minutes)).alias("e"),
        ).with_columns(
            pl.col("e").cum_max().shift(1).over("user_id").alias("prev_max")
        )
        df = df.with_columns(
            (pl.col("prev_max").is_null() | (pl.col("s") > pl.col("prev_max")))
            .cast(pl.Int64)
            .alias("brk")
        ).with_columns(pl.col("brk").cum_sum().over("user_id").alias("island"))
        g = df.group_by(["user_id", "island"]).agg(
            pl.col("s").min().alias("s0"), pl.col("e").max().alias("e1")
        )
        return (
            g.group_by("user_id")
            .agg(
                pl.len().cast(pl.Int64).alias("n_islands"),
                (pl.col("e1") - pl.col("s0"))
                .dt.total_microseconds()
                .sum()
                .cast(pl.Int64)
                .alias("covered_us"),
            )
            .to_arrow()
        )

    return (
        ds.map_batches(_bucket_by("user_id", num_buckets), batch_format="pyarrow")
        .sort("bucket")
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


ORACLES["q_interval_union"] = """
    WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
    o AS (SELECT user_id, s, e,
            max(e) OVER (PARTITION BY user_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
          FROM iv),
    b AS (SELECT user_id, s, e,
            CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS brk
          FROM o),
    i AS (SELECT user_id, s, e,
            sum(brk) OVER (PARTITION BY user_id ORDER BY s
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM b),
    g AS (SELECT user_id, island, min(s) AS s0, max(e) AS e1
          FROM i GROUP BY user_id, island)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(date_diff('microsecond', s0, e1)) AS BIGINT) AS covered_us
    FROM g GROUP BY user_id"""


def q_unpivot(sf_dir: str):
    """UNPIVOT (wide -> long melt): the per-user event-type count matrix of
    q_pivot_event_types melted back to (user_id, event_type, n) rows, zeros
    KEPT — so this is the crosstab-inverse shape, not a plain groupby (a
    user contributes one row per pinned type whether or not they fired it).
    Scale shape: the pivot's single narrow exchange, then a per-block
    vectorized melt (5x row expansion happens post-aggregate, at user
    cardinality, never at event cardinality)."""
    import polars as pl

    types = ["click", "error", "purchase", "signup", "view"]
    wide = q_pivot_event_types(sf_dir)

    def melt(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        out = (
            df.unpivot(
                on=[f"n_{t}" for t in types],
                index="user_id",
                variable_name="event_type",
                value_name="n",
            )
            .with_columns(
                pl.col("event_type").str.strip_prefix("n_"),
                pl.col("n").cast(pl.Int64),
            )
        )
        return out.to_arrow()

    return wide.map_batches(melt, batch_format="pyarrow")


ORACLES["q_unpivot"] = """
    WITH wide AS (
      SELECT user_id,
             CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
             CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
             CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
             CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
      FROM events GROUP BY user_id)
    SELECT user_id, replace(event_type, 'n_', '') AS event_type, n
    FROM (UNPIVOT wide
          ON n_click, n_error, n_purchase, n_signup, n_view
          INTO NAME event_type VALUE n)"""
