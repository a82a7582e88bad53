"""Relational operator coverage over the generic testdata tables.

These pipelines exercise the engine-level operator surface the crawl uses
(grouped aggregation with partial pre-aggregation, broadcast hash joins,
filters, sort/top-k, distinct, windowed/bucketed aggregation — SURVEY §2.4,
§2.5) on the driver-provided TPC-H-ish tables, each with an exact DuckDB
oracle (see ``__ray_entry__.oracle_sql``).

Scale patterns demonstrated (and measured — see git history of BENCH):
- **low-cardinality keys** (returnflag, brand, lang, hour buckets): a
  per-batch partial aggregate inside ``map_batches`` (combiner) so the
  all-to-all moves one row per (batch, key) — the 100 TB-safe shape;
- **high-cardinality keys** (custkey): direct ``groupby().aggregate`` —
  a combiner would shrink nothing and just adds a pass;
- **blocks stay Arrow end-to-end**: pandas-formatted blocks make Ray's
  aggregate shuffle ~8× slower (measured 40s vs 5s on 150k rows), so every
  partial-aggregate stage emits ``pyarrow.Table``;
- small sides (customer, nation, region) are broadcast (``ray.put``) and
  probed per batch — never a shuffle join;
- reads prune columns at the source (``read_parquet(columns=...)``).

All fractional aggregates are rounded so the value-hash comparison against
DuckDB is stable across summation orders.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Sum

from ..io_utils import read_parquet_clean

_PARTIAL_BATCH = 65536  # large partial-agg batches → fewer shuffle rows


def _pq(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"),
                              columns=columns)


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-flavored pricing summary (Arrow partial-agg → 6-key groupby)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity",
                      "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
             "sum_disc_price", "count_order"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(2)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_qty", "count_order"]
    ]


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Revenue top-k per customer. Even for the high-cardinality custkey a
    per-batch partial aggregate pays off (≈10 orders/customer → 10× fewer
    shuffle rows); the tiny top-k result then probes the customer dim via a
    pruned parquet row filter."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )
        return g.rename_columns(["o_custkey", "revenue", "n_orders"])

    agg = (
        _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby("o_custkey")
        .aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    agg["revenue"] = agg["revenue"].round(2)
    agg["n_orders"] = agg["n_orders"].astype("int64")
    out = agg.sort_values(["revenue", "o_custkey"], ascending=[False, True]).head(k)
    # only the k winning keys leave the customer dim: the parquet row filter
    # prunes row groups at the read — never the whole dimension to the driver
    keys = out["o_custkey"].astype("int64").tolist()
    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
        filter=pc.field("c_custkey").isin(keys),
    ).to_pandas()
    out = out.rename(columns={"o_custkey": "c_custkey"}).merge(cust, on="c_custkey")
    return out.reset_index(drop=True)[["c_custkey", "c_name", "revenue", "n_orders"]]


def supplier_stats(sf_dir: str) -> pd.DataFrame:
    """3-way broadcast join supplier⋈nation⋈region → per-region stats."""
    nation = _pq(sf_dir, "nation").to_pandas()
    region = _pq(sf_dir, "region").to_pandas()
    n2r = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put(
        {"keys": pa.array(n2r["n_nationkey"], type=pa.int64()),
         "vals": pa.array(n2r["r_name"], type=pa.string())}
    )

    class Tag:
        def __init__(self):
            lk = ray.get(lookup_ref)  # once per actor
            self.keys, self.vals = lk["keys"], lk["vals"]

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["s_nationkey"].cast(pa.int64()),
                              value_set=self.keys)
            r_name = pc.take(self.vals, idx)  # vectorized dim probe
            t = t.append_column("r_name", r_name)
            g = t.group_by("r_name").aggregate(
                [("s_suppkey", "count"), ("s_acctbal", "sum")]
            )
            return g.rename_columns(["r_name", "n_suppliers", "total_acctbal"])

    out = (
        _pq(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
        .map_batches(Tag, batch_format="pyarrow", batch_size=_PARTIAL_BATCH,
                     concurrency=(1, 2))
        .groupby("r_name")
        .aggregate(Sum("n_suppliers", alias_name="n_suppliers"),
                   Sum("total_acctbal", alias_name="total_acctbal"))
        .to_pandas()
    )
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    out["total_acctbal"] = out["total_acctbal"].round(2)
    return out.sort_values("r_name").reset_index(drop=True)


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (bucketed aggregate — the
    batch-engine form of a streaming window)."""

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        t = t.append_column("hour", hour)
        g = t.group_by(["event_type", "hour"]).aggregate(
            [("event_id", "count"), ("value", "sum")]
        )
        return g.rename_columns(["event_type", "hour", "n", "sum_value"])

    out = (
        _pq(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def part_brand_stats(sf_dir: str) -> pd.DataFrame:
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("p_brand").aggregate(
            [("p_size", "count"), ("p_retailprice", "sum"), ("p_size", "max")]
        )
        return g.rename_columns(["p_brand", "n", "sum_retail", "max_size"])

    out = (
        _pq(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])
        .map_batches(partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby("p_brand")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_retail", alias_name="sum_retail"),
                   Max("max_size", alias_name="max_size"))
        .to_pandas()
    )
    out["avg_retail"] = (out["sum_retail"] / out["n"]).round(2)
    out["n"] = out["n"].astype("int64")
    out["max_size"] = out["max_size"].astype("int32")
    return out.sort_values("p_brand").reset_index(drop=True)[
        ["p_brand", "n", "avg_retail", "max_size"]
    ]


def order_priority_count(sf_dir: str) -> pd.DataFrame:
    """Filter (row-group pushdown at the read) → count by priority."""
    lo = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), type=pa.timestamp("us"))
    ds = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([("o_orderdate", "count")])
        return g.rename_columns(["o_orderpriority", "n"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def distinct_segments(sf_dir: str) -> pd.DataFrame:
    """Distinct values (shuffle) — ``Dataset.unique``."""
    vals = _pq(sf_dir, "customer", columns=["c_mktsegment"]).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


_USER_BUCKETS = 32  # coarse hash-partitions for per-user window ops


def _bucket_users(t: pa.Table) -> pa.Table:
    """Coarse user hash-partition key: one Ray group per BUCKET (≈32), not
    per user — ``map_groups`` costs ~1 ms of Python per group, so millions
    of tiny per-user groups would dominate; inside a bucket the per-user
    work is a vectorized pandas sort + segment scan."""
    b = pc.cast(
        pc.bit_wise_and(t["user_id"].cast(pa.int64()),
                        pa.scalar(_USER_BUCKETS - 1, pa.int64())),
        pa.int32(),
    )
    return t.append_column("bucket", b)


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Sessionization — the stream-shaped op as a batch groupby (guide
    §streaming-shaped): events hash-partitioned by user into coarse buckets,
    sorted by (user, ts, event_id) within the bucket, vectorized
    session-break detection (user change OR gap > ``gap_minutes``), one
    pandas groupby-agg per bucket. Tie-break inside a user: (ts, event_id).
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift(1))
        gap_break = (g["ts"] - g["ts"].shift(1)) > gap
        g = g.assign(ns=(new_user | gap_break))
        agg = g.groupby("user_id", as_index=False).agg(
            n_sessions=("ns", "sum"), n_events=("ns", "size")
        )
        return agg

    out = (
        _pq(sf_dir, "events", columns=["user_id", "event_id", "ts"])
        .map_batches(_bucket_users, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def events_with_gap(sf_dir: str) -> pd.DataFrame:
    """LAG window: each event's microsecond gap to the SAME user's previous
    event (NULL for a user's first event) — the offset-window flavor next
    to the RANGE frame (:func:`events_sliding_window`) and sessionization.

    Same coarse user-bucket co-partition; inside a bucket the lag is one
    mergesort + vectorized shift, never a per-user Python call. Order
    inside a user is (ts, event_id) — the frozen tie-break shared with
    the sibling window ops and the SQL oracle."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]].astype("float64")
        gap[g["user_id"].ne(g["user_id"].shift(1)).to_numpy()] = np.nan
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "gap_us": gap,
        })

    out = (
        _pq(sf_dir, "events", columns=["user_id", "event_id", "ts"])
        .map_batches(_bucket_users, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def top_events_per_user(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-key top-k (window-function shape): the k highest-value events of
    each user, ranked. Tie-break: higher value first, then lower event_id.
    Same coarse-bucket partitioning as sessionization; ranking inside a
    bucket is one sort + cumcount, never a per-user Python call."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.assign(rank=g.groupby("user_id").cumcount() + 1)
        g = g[g["rank"] <= k]
        return g[["user_id", "event_id", "rank"]]

    out = (
        _pq(sf_dir, "events", columns=["user_id", "event_id", "value"])
        .map_batches(_bucket_users, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.astype({"user_id": "int64", "event_id": "int64", "rank": "int64"})
        .sort_values(["user_id", "rank"])
        .reset_index(drop=True)
    )


def priority_revenue(sf_dir: str, num_buckets: int = 16) -> pd.DataFrame:
    """Large⋈large partitioned hash join (guide §joins): lineitem revenue
    joined to orders on orderkey, aggregated per order priority.

    Neither side is broadcastable at scale; the join is the shared
    :func:`licenta_crawler_ray.pipelines.joins.hash_join` utility (one
    tagged-union ``groupby(bucket)`` shuffle, optional skew salting —
    unneeded for uniform orderkeys). The lineitem side pre-aggregates
    revenue per orderkey inside ``map_batches`` before the shuffle, and
    joined rows partial-aggregate per batch before the tiny final
    priority groupby."""
    from .joins import hash_join

    def left_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return (
            pa.table({"orderkey": t["l_orderkey"], "revenue": rev})
            .group_by("orderkey").aggregate([("revenue", "sum")])
            .rename_columns(["orderkey", "revenue"])
        )

    left = _pq(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])         .map_batches(left_partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
    right = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])         .map_batches(
        lambda t: pa.table({"orderkey": t["o_orderkey"],
                            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow", batch_size=_PARTIAL_BATCH,
    )

    def batch_partial(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_orderpriority", as_index=False).agg(
            total_revenue=("revenue", "sum")
        )

    out = (
        hash_join(left, right, "orderkey", num_buckets=num_buckets)
        .map_batches(batch_partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("total_revenue", alias_name="total_revenue"))
        .to_pandas()
    )
    out["total_revenue"] = out["total_revenue"].round(2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def _tag_bucket(t: pa.Table, key: str) -> pa.Table:
    """Coarse hash-partition key over an arbitrary int column (same policy
    as :func:`_bucket_users` — one Ray group per bucket, vectorized work
    inside)."""
    b = pc.cast(
        pc.bit_wise_and(t[key].cast(pa.int64()),
                        pa.scalar(_USER_BUCKETS - 1, pa.int64())),
        pa.int32(),
    )
    return t.append_column("bucket", b)


def events_asof_orders(sf_dir: str) -> pd.DataFrame:
    """As-of join (time-series point lookup): each event matched to the most
    recent order of the same user at or before the event's timestamp —
    the operator Ray Data lacks natively, composed per SURVEY's custom-op
    recipe (a): tagged union of both sides → one ``groupby(bucket)``
    shuffle co-locating each user's events AND orders → a vectorized
    ``pd.merge_asof`` per bucket (C-speed backward search, never a
    per-user Python loop).

    Partitioning assumption: both sides hash-partition on the SAME user
    key, so the join is local within a bucket; skewed users stay bounded
    because a single user's rows always fit one bucket's worth of the two
    time-sorted frames. Tie-break among equal order dates: the highest
    ``o_orderkey`` (right side sorted ascending — ``merge_asof`` takes the
    last match). Events whose user has no prior order are dropped (inner
    as-of), keeping the output hash-stable (no NULL columns)."""
    ev = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"]) \
        .map_batches(
            lambda t: pa.table({
                "key": t["user_id"], "kind": pa.nulls(len(t), pa.int8()).fill_null(1),
                "event_id": t["event_id"], "ts": t["ts"],
                "o_orderkey": pa.nulls(len(t), pa.int64()),
                "o_orderdate": pa.nulls(len(t), pa.timestamp("us")),
            }),
            batch_format="pyarrow", batch_size=_PARTIAL_BATCH,
        )
    od = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(
            lambda t: pa.table({
                "key": t["o_custkey"], "kind": pa.nulls(len(t), pa.int8()).fill_null(0),
                "event_id": pa.nulls(len(t), pa.int64()),
                "ts": pa.nulls(len(t), pa.timestamp("us")),
                "o_orderkey": t["o_orderkey"], "o_orderdate": t["o_orderdate"],
            }),
            batch_format="pyarrow", batch_size=_PARTIAL_BATCH,
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g.loc[g["kind"] == 1, ["event_id", "key", "ts"]] \
            .sort_values("ts", kind="mergesort")
        o = g.loc[g["kind"] == 0, ["key", "o_orderkey", "o_orderdate"]] \
            .sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        if e.empty or o.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "o_orderkey": pd.Series([], dtype="int64"),
                                 "o_orderdate": pd.Series([], dtype="datetime64[us]")})
        m = pd.merge_asof(e, o, left_on="ts", right_on="o_orderdate",
                          by="key", direction="backward")
        m = m.dropna(subset=["o_orderkey"])
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["key"].astype("int64"),
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "o_orderdate": m["o_orderdate"],
        })

    out = (
        ev.union(od)
        .map_batches(lambda t: _tag_bucket(t, "key"), batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def events_sliding_window(sf_dir: str, minutes: int = 60) -> pd.DataFrame:
    """Sliding-window aggregate (RANGE frame): per event, the count and
    value-sum of the same user's events in the trailing ``minutes`` window
    (peers at the exact boundary and at the current timestamp included —
    SQL RANGE ... CURRENT ROW semantics).

    Same coarse-bucket partitioning as sessionization; inside a bucket the
    window bounds come from TWO ``np.searchsorted`` calls over a composite
    (dense-user, ts) key — fully vectorized, no per-user loop. Sums run in
    integer cents over prefix sums, so they are exact (no float drift
    between a prefix-sum difference and the oracle's direct window sum)."""
    W = np.int64(minutes) * 60_000_000  # window in microseconds

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uidx = pd.factorize(g["user_id"])[0].astype(np.int64)  # dense, sorted
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = ts.min()
        span = ts.max() - base + W + 2  # composite key stride (no overlap)
        # scale bound: the composite key needs users-per-bucket × span <
        # 2^63 (~3e5 users per bucket at a 1-year microsecond span). Guard
        # explicitly — silent int64 wraparound would corrupt searchsorted
        # window bounds. Remedy at scale: raise _USER_BUCKETS (fewer users
        # per bucket) or bucket time coarser than microseconds.
        n_users = int(uidx[-1]) + 1 if len(uidx) else 0
        if n_users and int(span) > (2**63 - 1) // n_users:
            raise ValueError(
                f"sliding-window composite key would overflow int64: "
                f"{n_users} users x span {int(span)} us in one bucket; "
                f"increase _USER_BUCKETS"
            )
        key = uidx * span + (ts - base)
        lo = np.searchsorted(key, uidx * span + (ts - base - W), side="left")
        hi = np.searchsorted(key, key, side="right")
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(cents)])
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "w_count": (hi - lo).astype("int64"),
            "w_sum": np.round((csum[hi] - csum[lo]) / 100.0, 2),
        })

    out = (
        _pq(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
        .map_batches(_bucket_users, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


INACTIVE_CUTOFF = "2000-01-01"  # frozen spec, shared with the SQL oracle


def inactive_customers(sf_dir: str) -> pd.DataFrame:
    """Anti join (``NOT IN`` / ``NOT EXISTS``): customers with no order
    since :data:`INACTIVE_CUTOFF` — the join flavor the inner hash join
    can't express.

    Scale shape (partitioned hash anti-join): the orders side prunes at
    the READ (row-group filter on the cutoff) and pre-distincts its
    custkeys per batch (the combiner — ships distinct keys only), both
    streams co-partition ONCE on a coarse custkey hash bucket, and the
    anti filter is one vectorized ``isin`` per bucket. Neither side
    broadcasts; skewed customers stay inside one bucket."""
    cut = pa.scalar(pd.Timestamp(INACTIVE_CUTOFF), type=pa.timestamp("us"))
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_name"]) \
        .map_batches(
            lambda t: pa.table({
                "key": t["c_custkey"],
                "kind": pa.nulls(len(t), pa.int8()).fill_null(1),
                "c_name": t["c_name"],
            }),
            batch_format="pyarrow", batch_size=_PARTIAL_BATCH,
        )

    def ods_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t["o_custkey"])
        return pa.table({
            "key": u,
            "kind": pa.nulls(len(u), pa.int8()).fill_null(0),
            "c_name": pa.nulls(len(u), pa.string()),
        })

    ords = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= cut,
    ).map_batches(ods_partial, batch_format="pyarrow",
                  batch_size=_PARTIAL_BATCH)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["kind"] == 0, "key"].to_numpy()
        c = g.loc[g["kind"] == 1]
        keep = ~c["key"].isin(have)
        return pd.DataFrame({
            "c_custkey": c.loc[keep, "key"].astype("int64"),
            "c_name": c.loc[keep, "c_name"],
        })

    out = (
        cust.union(ords)
        .map_batches(lambda t: _tag_bucket(t, "key"), batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:  # an all-empty grouped result arrives column-less
        return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                             "c_name": pd.Series([], dtype="object")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def customer_order_profile(sf_dir: str) -> pd.DataFrame:
    """Grouped LEFT OUTER join: every customer with order count and total
    spend — zero rows preserved (the flavor the inner join drops and the
    anti join only detects).

    Scale shape: the orders side pre-aggregates per batch (one
    (custkey, n, cents) row per batch-distinct customer — the combiner),
    both streams co-partition ONCE on the coarse custkey bucket, and the
    per-bucket merge is a vectorized pandas groupby + left merge. Spend
    is summed in integer CENTS (each price quantizes identically on both
    engines; integer addition is order-independent) so the value hash is
    stable at any parallelism."""
    cust = _pq(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: pa.table({
            "key": t["c_custkey"],
            "kind": pa.nulls(len(t), pa.int8()).fill_null(1),
            "n": pa.nulls(len(t), pa.int64()),
            "cents": pa.nulls(len(t), pa.int64()),
        }),
        batch_format="pyarrow", batch_size=_PARTIAL_BATCH,
    )

    def ods_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        g = pa.table({"key": t["o_custkey"], "cents": cents}) \
            .group_by("key").aggregate([("cents", "sum"), ("cents", "count")])
        g = g.rename_columns(["key", "cents", "n"])
        return pa.table({
            "key": g["key"],
            "kind": pa.nulls(len(g), pa.int8()).fill_null(0),
            "n": g["n"].cast(pa.int64()),
            "cents": g["cents"],
        })

    ords = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]) \
        .map_batches(ods_partial, batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.loc[g["kind"] == 0, ["key", "n", "cents"]]
               .groupby("key", as_index=False).sum())
        c = g.loc[g["kind"] == 1, ["key"]].merge(agg, on="key", how="left")
        return pd.DataFrame({
            "c_custkey": c["key"].astype("int64"),
            "n_orders": c["n"].fillna(0).astype("int64"),
            "spent_cents": c["cents"].fillna(0).astype("int64"),
        })

    out = (
        cust.union(ords)
        .map_batches(lambda t: _tag_bucket(t, "key"), batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                             "n_orders": pd.Series([], dtype="int64"),
                             "spent_cents": pd.Series([], dtype="int64")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def pricing_rollup(sf_dir: str) -> pd.DataFrame:
    """Multi-level aggregate (``GROUP BY ROLLUP``): per (returnflag,
    linestatus) plus per-returnflag subtotals plus the grand total, in one
    pass over lineitem.

    Scale shape: ONE streamed partial-aggregate + leaf groupby (identical
    to :func:`pricing_summary`'s shuffle — one row per (batch, leaf key));
    the subtotal and grand-total levels derive from the LEAF aggregate,
    which is bounded by key cardinality, not corpus size, so the rollup
    costs nothing extra at 100 TB. Measures are integer (count + cents)
    for hash-stable totals. NULL group markers follow SQL ROLLUP."""

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        t = pa.table({"l_returnflag": t["l_returnflag"],
                      "l_linestatus": t["l_linestatus"], "cents": cents})
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "price_cents", "n_items"])

    leaf = (
        _pq(sf_dir, "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("price_cents", alias_name="price_cents"),
                   Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    leaf["n_items"] = leaf["n_items"].astype("int64")
    leaf["price_cents"] = leaf["price_cents"].astype("int64")
    sub = (leaf.groupby("l_returnflag", as_index=False)
           [["price_cents", "n_items"]].sum())
    sub["l_linestatus"] = None
    total = pd.DataFrame({
        "l_returnflag": [None], "l_linestatus": [None],
        "price_cents": [leaf["price_cents"].sum()],
        "n_items": [leaf["n_items"].sum()],
    })
    out = pd.concat([leaf, sub, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "price_cents", "n_items"]]
    for c in ("price_cents", "n_items"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="last"
    ).reset_index(drop=True)


# Round count shared with the SQL oracle (__ray_entry__._pagerank_sql
# unrolls exactly this many CTE rounds) — deriving both sides from ONE
# constant keeps the parity gate honest if the default ever changes
# (round-4 advice: a hard-pinned oracle silently failed other values).
_PR_ITERS = 4


def supplier_pagerank(sf_dir: str, iters: int = _PR_ITERS,
                      workdir: str | None = None) -> pd.DataFrame:
    """Link analysis: fixed-point integer PageRank over the bipartite
    customer→supplier purchase graph (an edge per DISTINCT (customer,
    supplier) pair observed in orders⋈lineitem).

    Scale shape: the edge build broadcasts the orders side and probes it
    per lineitem batch (no join shuffle) while orders fits a worker heap,
    falling back to the reusable partitioned
    :func:`~licenta_crawler_ray.pipelines.joins.hash_join` above the cap
    (see :func:`_supplier_pagerank_edges`); the per-batch-distinct
    stream SINKS straight to the shard-partitioned directed-edge layout
    (``graph.write_directed_edges`` — a worker-side streaming write,
    the edge set never passes through the driver) where each shard
    dedupes its own slice exactly on load — the whole edge intake costs
    ZERO all-to-all exchanges — and the iteration runs on self-loading
    Pregel-lite actor shards
    (:func:`~licenta_crawler_ray.pipelines.graph.pagerank_from_edge_partitions`
    — edges stay resident, only per-target pre-aggregated integer sums
    move per round). Only the node-set-sized rank table reaches the
    driver — and that IS this query's result; at corpus scale use
    :func:`supplier_pagerank_to_parquet`, where even the ranks leave
    through the shards. Node ids namespace the bipartition (customer →
    2k, supplier → 2k+1 — mirrored in the SQL oracle); fixed-point
    integer arithmetic makes the result bit-identical at any
    parallelism."""
    pr = _supplier_pagerank_ranks(sf_dir, iters, workdir)
    return pd.DataFrame({
        "kind": np.where(pr["node"] % 2 == 0, "c", "s"),
        "key": (pr["node"] // 2).astype("int64"),
        "pr": pr["pr"].astype("int64"),
    })


# Broadcast cap for the orders side of the PageRank edge build: 8M rows
# of two int64 columns ≈ 128 MB — ONE ray.put, read once per probe actor.
# Above the cap the dim no longer fits a worker heap comfortably and the
# build falls back to the partitioned hash_join shuffle form.
_PR_ORDERS_BCAST_CAP = 8_000_000


def _supplier_pagerank_edges(sf_dir: str):
    """The per-batch-DISTINCT namespaced edge stream (src=2·cust,
    dst=2·supp+1) — NOT globally distinct: cross-batch duplicate pairs
    survive (≤ one copy per batch). Global exactness is the edge
    LAYOUT's contract — ``graph.write_directed_edges`` routes every
    copy of (u,v) to shard ``u % P`` and ``_PageRankShard`` dedupes its
    slice on load — so the build pays no distinct all-to-all.

    Two builds, same distinct edge coverage. Below
    ``_PR_ORDERS_BCAST_CAP`` the orders side broadcasts once as a
    sorted (o_orderkey → o_custkey) int64 pair via ``ray.put`` and the
    lineitem scan probes it with a vectorized ``searchsorted`` — the
    l_orderkey equi-join costs NO shuffle either, leaving the whole
    edge intake exchange-free (the round-5 probe matrix showed the
    operator's wall was its 8-16M-row exchanges — eff 0.30@1M/0.50@2M,
    the one-box DRAM-bandwidth signature). Above the cap: the reusable
    partitioned :func:`~.joins.hash_join` form (one exchange)."""
    ods = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    n_orders = ods.count()  # parquet-metadata count on a fresh read

    def edge_rows(t: pa.Table) -> pa.Table:
        src = pc.multiply(t["o_custkey"].cast(pa.int64()), pa.scalar(2, pa.int64()))
        dst = pc.add(pc.multiply(t["l_suppkey"].cast(pa.int64()),
                                 pa.scalar(2, pa.int64())), pa.scalar(1, pa.int64()))
        e = pa.table({"src": src, "dst": dst})
        # per-batch distinct (volume combiner; the layout dedupes exactly)
        return e.group_by(["src", "dst"]).aggregate([])

    if n_orders <= _PR_ORDERS_BCAST_CAP:
        ot = pa.concat_tables(ray.get(ods.to_arrow_refs()))
        ok = np.asarray(ot["o_orderkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        ck = np.asarray(ot["o_custkey"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
        srt = np.argsort(ok, kind="stable")
        lookup_ref = ray.put({"ok": ok[srt], "ck": ck[srt]})

        def edge_probe(t: pa.Table) -> pa.Table:
            # task-pool stage: ray.get of a shared ref is a zero-copy
            # local-object-store read per task — no actor-pool width cap,
            # the scan parallelizes like any other read→map stage
            lk = ray.get(lookup_ref)
            ok_s, ck_s = lk["ok"], lk["ck"]
            empty = pa.table({"src": pa.array([], pa.int64()),
                              "dst": pa.array([], pa.int64())})
            if ok_s.size == 0 or t.num_rows == 0:
                return empty
            lo = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            sk = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False),
                            dtype=np.int64)
            pos = np.searchsorted(ok_s, lo)
            np.minimum(pos, ok_s.size - 1, out=pos)
            hit = ok_s[pos] == lo  # inner-join semantics ≡ hash_join
            if not hit.any():
                return empty
            e = pa.table({
                "src": pa.array(ck_s[pos[hit]] * 2, type=pa.int64()),
                "dst": pa.array(sk[hit] * 2 + 1, type=pa.int64()),
            })
            return e.group_by(["src", "dst"]).aggregate([])

        return _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"]) \
            .map_batches(edge_probe, batch_format="pyarrow",
                         batch_size=_PARTIAL_BATCH)

    from .joins import hash_join

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"]) \
        .map_batches(lambda t: pa.table({"o_orderkey": t["l_orderkey"],
                                         "l_suppkey": t["l_suppkey"]}),
                     batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
    return hash_join(li, ods, key="o_orderkey") \
        .map_batches(edge_rows, batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)


def _supplier_pagerank_ranks(sf_dir: str, iters: int,
                             workdir: str | None = None,
                             ranks_dir: str | None = None,
                             num_shards: int | None = None):
    """Sink the per-batch-distinct edge stream shard-partitioned (the
    shards dedupe their slices exactly on load), then iterate on
    self-loading shards. The stream is materialized (thin 2-int64 rows,
    object-store-resident) only to size the shard count from its row
    count — an upper bound of the distinct count, which only ever
    rounds the adaptive shard sizing up — before the sink."""
    import shutil
    import tempfile

    from .graph import pagerank_from_edge_partitions, write_directed_edges

    edges = _supplier_pagerank_edges(sf_dir).materialize()
    if num_shards is None:
        # same adaptive sizing as graph.pagerank: spin up actors only
        # when there is work for them (count() on materialized = metadata)
        num_shards = max(2, min(16, edges.count() // 100_000 + 1))
    own = workdir is None
    if own:
        workdir = tempfile.mkdtemp(prefix="lcr_pagerank_")
    layout = os.path.join(workdir, "edge_layout")
    shutil.rmtree(layout, ignore_errors=True)
    try:
        write_directed_edges(edges, "src", "dst", layout, num_shards)
        return pagerank_from_edge_partitions(
            layout, iters=iters, num_shards=num_shards, write_dir=ranks_dir)
    finally:
        # the layout is an edge-set-sized INTERNAL intermediate, fully
        # consumed by the shards — never leave it in a caller's workdir
        # (review finding); ranks_dir is the deliverable and stays
        shutil.rmtree(workdir if own else layout, ignore_errors=True)


def supplier_pagerank_to_parquet(
    sf_dir: str, workdir: str, iters: int = _PR_ITERS, num_shards: int = 16
) -> dict:
    """Corpus-scale form: shards write their (node, pr) rank partitions
    straight to ``{workdir}/ranks`` — nothing node- or edge-sized ever
    passes through the driver; only this summary dict does."""
    import shutil

    ranks_dir = os.path.join(workdir, "ranks")
    shutil.rmtree(ranks_dir, ignore_errors=True)
    n = _supplier_pagerank_ranks(sf_dir, iters, workdir,
                                 ranks_dir=ranks_dir, num_shards=num_shards)
    return {"workdir": workdir, "ranks_dir": ranks_dir, "nodes": int(n)}


# Bloom sizing for the semi join's pruning filter. At sf0.1 the build side
# has ~1e5 distinct keys → fill ≈ n·k/m ≈ 0.07, FP ≈ fill^k ≈ 0.03%; at
# corpus scale m grows with the build-side estimate. The filter is a
# pruning ACCELERATOR only — exactness comes from the co-partitioned
# verify below, so an undersized filter costs shuffle volume, not answers.
_BLOOM_BITS = 1 << 22
_BLOOM_HASHES = 3


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """``(k, n)`` bit positions per key via double hashing
    (Kirsch–Mitzenmacher ``g_i = h1 + i·h2 mod m``; two SplitMix64
    streams — same public mix the HLL sketch uses)."""
    from .sketches import _splitmix64

    k = keys.astype(np.uint64)
    h1 = _splitmix64(k)
    h2 = _splitmix64(k ^ np.uint64(0xA5A5A5A5DEADBEEF))
    i = np.arange(_BLOOM_HASHES, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(_BLOOM_BITS)


def returned_orders(sf_dir: str) -> pd.DataFrame:
    """Semi join (``IN`` / ``EXISTS``): orders with at least one returned
    lineitem — the third join flavor next to the inner hash join and the
    anti join, with a DISTRIBUTED Bloom-filter build as the pruning step.

    Scale shape: the build side (returned lineitems) pre-distincts per
    batch and emits nonzero Bloom WORDS only (≤ m/64 tiny rows/batch);
    words OR-merge inside ≤64 coarse buckets, the driver assembles the
    m-bit filter (512 KiB — constant, never corpus-sized) and broadcasts
    it via ``ray.put``. The probe side (orders) drops Bloom misses inside
    ``map_batches`` BEFORE the shuffle — at realistic selectivity the
    all-to-all moves only matching rows + the FP trickle. Survivors then
    co-partition ONCE with the build-side distinct keys on a coarse key
    bucket and a vectorized ``isin`` keeps true matches, so the output is
    EXACT regardless of filter sizing. The build side is streamed twice
    (filter build + verify keys) — both passes are column-pruned,
    filter-at-read scans, each smaller than shuffling unpruned orders."""
    build = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey"],
        filter=pc.field("l_returnflag") == "R",
    )

    def bloom_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t["l_orderkey"]).to_numpy(zero_copy_only=False)
        pos = _bloom_positions(u).reshape(-1)
        words = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        idx = np.flatnonzero(words)
        return pa.table({
            "idx": pa.array(idx.astype(np.int32)),
            "word": pa.array(words[idx].view(np.int64)),
            "bbucket": pa.array((idx & 63).astype(np.int32)),
        })

    def or_merge(g: pd.DataFrame) -> pd.DataFrame:
        idx = g["idx"].to_numpy()
        order = np.argsort(idx, kind="stable")
        idx = idx[order]
        w = g["word"].to_numpy()[order].view(np.uint64)
        starts = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
        return pd.DataFrame({
            "idx": idx[starts],
            "word": np.bitwise_or.reduceat(w, starts).view(np.int64),
        })

    words = (
        build.map_batches(bloom_partial, batch_format="pyarrow",
                          batch_size=_PARTIAL_BATCH)
        .groupby("bbucket")
        .map_groups(or_merge, batch_format="pandas")
        .to_pandas()
    )
    bloom = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
    if len(words):
        bloom[words["idx"].to_numpy()] = words["word"].to_numpy().view(np.uint64)
    bloom_ref = ray.put(bloom)

    class Prune:
        def __init__(self):
            self.bloom = ray.get(bloom_ref)  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
            pos = _bloom_positions(keys)
            hit = np.ones(len(keys), dtype=bool)
            for r in range(_BLOOM_HASHES):
                p = pos[r]
                hit &= (self.bloom[(p >> np.uint64(6)).astype(np.int64)]
                        >> (p & np.uint64(63))) & np.uint64(1) != 0
            t = t.filter(pa.array(hit))
            return pa.table({
                "key": t["o_orderkey"],
                "kind": pa.nulls(len(t), pa.int8()).fill_null(1),
                "o_custkey": t["o_custkey"],
                "o_totalprice": t["o_totalprice"],
            })

    def build_keys(t: pa.Table) -> pa.Table:
        u = pc.unique(t["l_orderkey"])
        return pa.table({
            "key": u,
            "kind": pa.nulls(len(u), pa.int8()).fill_null(0),
            "o_custkey": pa.nulls(len(u), pa.int64()),
            "o_totalprice": pa.nulls(len(u), pa.float64()),
        })

    survivors = _pq(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(Prune, batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH, concurrency=(1, 4))
    keys = build.map_batches(build_keys, batch_format="pyarrow",
                             batch_size=_PARTIAL_BATCH)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["kind"] == 0, "key"].to_numpy()
        o = g.loc[g["kind"] == 1]
        keep = o["key"].isin(have)
        return pd.DataFrame({
            "o_orderkey": o.loc[keep, "key"].astype("int64"),
            "o_custkey": o.loc[keep, "o_custkey"].astype("int64"),
            "o_totalprice": o.loc[keep, "o_totalprice"].astype("float64"),
        })

    out = (
        survivors.union(keys)
        .map_batches(lambda t: _tag_bucket(t, "key"), batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:  # an all-empty grouped result arrives column-less
        return pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_custkey": pd.Series([], dtype="int64"),
            "o_totalprice": pd.Series([], dtype="float64"),
        })
    return out.sort_values("o_orderkey").reset_index(drop=True)


def user_value_median(sf_dir: str) -> pd.DataFrame:
    """Per-KEY exact discrete quantile (``quantile_disc(value, 0.5)`` per
    user) — the grouped sibling of the global ``token_quantiles``.

    Same coarse-bucket co-partition as the other per-user ops; inside a
    bucket ONE sort by (user, value) and a vectorized per-group pick at
    1-based index ``ceil(n/2)`` (first-offset + ceil arithmetic — no
    per-user Python). The reported median is an element OF the data, so
    the float compares bit-exact against the SQL oracle."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value"], kind="mergesort")
        uid, first = np.unique(g["user_id"].to_numpy(), return_index=True)
        counts = np.diff(np.append(first, len(g)))
        pick = first + np.ceil(counts * 0.5).astype(np.int64) - 1
        return pd.DataFrame({
            "user_id": uid.astype(np.int64),
            "median_value": g["value"].to_numpy()[pick],
        })

    out = (
        _pq(sf_dir, "events", columns=["user_id", "value"])
        .map_batches(_bucket_users, batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id").reset_index(drop=True)


def order_window_shipments(sf_dir: str, days: int = 30,
                           hot_bin_salt: int = 1) -> pd.DataFrame:
    """Range (interval) join with NO equality key — the third custom join
    the brief names alongside as-of and windowed, and the one a hash join
    cannot express: each order matched to EVERY lineitem whose
    ``l_shipdate`` falls in ``[o_orderdate, o_orderdate + days)``,
    aggregated to a per-order shipment count + revenue.

    Scale shape (textbook band join): bin the time axis at exactly the
    window width W. A probe row (lineitem) lands in ONE bin
    (``shipdate // W``); a build row (order) overlaps AT MOST TWO
    consecutive bins, so it is replicated into ≤ 2 rows. One
    ``groupby(bin)`` co-partitions them; inside a bin the probe side
    sorts once and every order resolves its bin-local window slice with
    two ``np.searchsorted`` calls over prefix sums — the 1.1M matching
    (order, lineitem) pairs at sf0.01 are never materialized, per-bin
    work is O(n log n). The ≤ 2 partial rows per order then merge in a
    second, tiny ``groupby(o_orderkey)`` (2·|orders| rows enter it —
    orders-of-magnitude below the pair count a nested-loop join ships).

    Revenue accumulates in integer cents (``floor(price·(1-disc)·100 +
    0.5)`` per item) so partial sums merge exactly and match the oracle
    independent of summation order. Orders with an empty window are
    dropped (inner join) to keep the output hash-stable.

    Partitioning assumption: one bin's lineitems fit a worker (bin width
    = W). ``hot_bin_salt`` = S > 1 is the skew knob for when they don't
    (a traffic spike putting one window-width bin on one worker): probe
    rows scatter across S sub-bins of their bin by a row hash, build
    rows replicate ×S (the same replicate-small-side trade as
    ``joins.hash_join``'s salting), and the per-order partial rows —
    now ≤ 2·S per order — still merge exactly in the final groupby
    because the sub-bins partition each bin's items. Output is
    salt-invariant (unit-tested with every item in one bin)."""
    W = np.int64(days) * 86_400_000_000  # window/bin width in microseconds
    S = int(hot_bin_salt)
    assert S >= 1

    def li_partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"])),
            pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        # bin with FLOOR division (numpy //) to match od_partial — Arrow
        # pc.divide truncates toward zero, which disagrees on negative
        # (pre-1970) timestamps and would silently drop matches
        ship_np = ship.to_numpy(zero_copy_only=False)
        bins = ship_np // W
        if S > 1:  # scatter probe rows across S sub-bins by a row hash
            h = (ship_np.astype(np.uint64) * np.uint64(2654435761)
                 + cents.to_numpy(zero_copy_only=False).astype(np.uint64))
            bins = bins * S + (h % np.uint64(S)).astype(np.int64)
        return pa.table({
            "bin": pa.array(bins, pa.int64()),
            "kind": pa.nulls(len(t), pa.int8()).fill_null(1),
            "ts": ship,
            "cents": cents,
            "o_orderkey": pa.nulls(len(t), pa.int64()),
        })

    def od_partial(t: pa.Table) -> pa.Table:
        start = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = start // W
        b1 = (start + W - 1) // W  # last bin the half-open window touches
        two = b1 != b0
        bins = np.concatenate([b0, b1[two]])
        starts = np.concatenate([start, start[two]])
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        keys = np.concatenate([keys, keys[two]])
        if S > 1:  # build rows replicate into every sub-bin of their bin
            bins = np.repeat(bins * S, S) + np.tile(np.arange(S, dtype=np.int64),
                                                    len(bins))
            starts = np.repeat(starts, S)
            keys = np.repeat(keys, S)
        n = len(bins)
        return pa.table({
            "bin": pa.array(bins, pa.int64()),
            "kind": pa.nulls(n, pa.int8()).fill_null(0),
            "ts": pa.array(starts, pa.int64()),
            "cents": pa.nulls(n, pa.int64()),
            "o_orderkey": pa.array(keys, pa.int64()),
        })

    li = _pq(sf_dir, "lineitem",
             columns=["l_shipdate", "l_extendedprice", "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)
    od = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(od_partial, batch_format="pyarrow", batch_size=_PARTIAL_BATCH)

    def per_bin(g: pd.DataFrame) -> pd.DataFrame:
        # the empty frame must carry the SAME 4-column schema as the
        # populated branch (incl. obucket) — heterogeneous block schemas
        # feeding groupby('obucket') are undefined behavior across Ray
        # versions (round-3 advice)
        empty = pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                              "n_items": pd.Series([], dtype="int64"),
                              "cents": pd.Series([], dtype="int64"),
                              "obucket": pd.Series([], dtype="int32")})
        items = g.loc[g["kind"] == 1]
        orders = g.loc[g["kind"] == 0]
        if items.empty or orders.empty:
            return empty
        ship = np.sort(items["ts"].to_numpy().astype(np.int64))
        order = np.argsort(items["ts"].to_numpy().astype(np.int64), kind="stable")
        csum = np.concatenate(
            [[np.int64(0)],
             np.cumsum(items["cents"].to_numpy().astype(np.int64)[order])])
        start = orders["ts"].to_numpy().astype(np.int64)
        lo = np.searchsorted(ship, start, side="left")
        hi = np.searchsorted(ship, start + W, side="left")  # end exclusive
        n = hi - lo
        keep = n > 0  # an order's other-bin replica reports its own slice
        keys = orders["o_orderkey"].to_numpy().astype(np.int64)[keep]
        return pd.DataFrame({
            "o_orderkey": keys,
            "n_items": n[keep].astype(np.int64),
            "cents": (csum[hi[keep]] - csum[lo[keep]]).astype(np.int64),
            "obucket": (keys & 31).astype(np.int32),
        })

    def merge_partials(g: pd.DataFrame) -> pd.DataFrame:
        # one group per ORDER KEY through Ray's groupby is pathologically
        # slow (measured 25 s for 29k rows / 15k keys); coarse buckets +
        # a vectorized pandas groupby inside do the same merge in ms —
        # the same lesson the distinct-count sketch learned (see
        # sketches.distinct_order_count)
        m = g.groupby("o_orderkey", sort=False)[["n_items", "cents"]].sum()
        return pd.DataFrame({
            "o_orderkey": m.index.to_numpy().astype(np.int64),
            "n_items": m["n_items"].to_numpy().astype(np.int64),
            "revenue": np.round(m["cents"].to_numpy() / 100.0, 2),
        })

    out = (
        li.union(od)
        .groupby("bin")
        .map_groups(per_bin, batch_format="pandas")
        .repartition(8)  # coalesce one-tiny-block-per-bin before the sort
        .groupby("obucket")
        .map_groups(merge_partials, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def user_running_value(sf_dir: str) -> pd.DataFrame:
    """ROWS-frame running total: each event's cumulative value (in exact
    integer cents) over the SAME user's events so far — the
    unbounded-preceding ROWS window next to the RANGE frame
    (:func:`events_sliding_window`) and the LAG offset
    (:func:`events_with_gap`).

    Same coarse user-bucket co-partition as every per-user window op;
    inside a bucket the running sum is one mergesort + a vectorized
    pandas groupby-cumsum — never a per-user Python call. Order inside a
    user is (ts, event_id), the frozen tie-break shared with the sibling
    window ops and the SQL oracle; cents arithmetic keeps the partial
    sums exact and hash-comparable."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        run = g.assign(c=cents).groupby("user_id")["c"].cumsum()
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "running_cents": run.astype("int64"),
        })

    out = (
        _pq(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
        .map_batches(_bucket_users, batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def nation_balance(sf_dir: str) -> pd.DataFrame:
    """Grouped FULL OUTER join: per-nation supplier aggregates ⟗
    per-nation customer aggregates — nations with only one side present
    keep their row with the other side zero-filled (the outer-join
    flavor missing from the left/semi/anti family).

    Scale shape: each side pre-aggregates per batch (Arrow ``group_by``
    combiner) and reduces in one nation-keyed ``groupby`` — the shuffle
    carries ≤ |nations| rows per batch, never raw rows; the FULL OUTER
    merge itself runs on two nation-cardinality aggregate tables (25
    rows each), which is exactly where an outer join belongs at scale
    (joining the RAW tables outer-style would shuffle everything to
    produce the same 25 rows). Cents arithmetic keeps sums exact."""

    def side(table: str, key: str, bal: str, cnt: str, cents: str):
        def partial(t: pa.Table) -> pa.Table:
            c = pc.cast(pc.floor(pc.add(pc.multiply(
                t[bal].cast(pa.float64()), pa.scalar(100.0)),
                pa.scalar(0.5))), pa.int64())
            g = (t.select([key]).append_column("c", c)
                 .group_by(key).aggregate([("c", "sum"), ("c", "count")]))
            return g.rename_columns(["nationkey", cents, cnt])

        out = (
            _pq(sf_dir, table, columns=[key, bal])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=_PARTIAL_BATCH)
            .groupby("nationkey")
            .aggregate(Sum(cents, alias_name=cents), Sum(cnt, alias_name=cnt))
            .to_pandas()
        )
        return out

    s = side("supplier", "s_nationkey", "s_acctbal",
             "n_suppliers", "supp_bal_cents")
    c = side("customer", "c_nationkey", "c_acctbal",
             "n_customers", "cust_bal_cents")
    out = s.merge(c, on="nationkey", how="outer")
    for col in ("n_suppliers", "supp_bal_cents", "n_customers",
                "cust_bal_cents"):
        out[col] = out[col].fillna(0).astype("int64")
    out["nationkey"] = out["nationkey"].astype("int64")
    return out.sort_values("nationkey").reset_index(drop=True)[
        ["nationkey", "n_suppliers", "supp_bal_cents",
         "n_customers", "cust_bal_cents"]]


def supplier_distinct_parts(sf_dir: str) -> pd.DataFrame:
    """Grouped exact COUNT(DISTINCT): distinct parts supplied per
    supplier — the per-key flavor of :func:`distinct_order_count` (a
    classic shuffle-heavy op: the pairs must co-locate per key before
    they can be deduped).

    Scale shape: per batch, a (suppkey, partkey) Arrow ``group_by``
    combiner collapses duplicates BEFORE the shuffle (per-batch output ≤
    distinct pairs, not rows); pairs then co-partition by supplier into
    coarse hash buckets — the same supplier always lands in the same
    bucket, so bucket-local dedup is globally exact — and each bucket
    dedups + counts in one vectorized pass. The shuffle volume is the
    distinct-pair count, the irreducible minimum for an exact answer."""

    def partial(t: pa.Table) -> pa.Table:
        e = (t.select(["l_suppkey", "l_partkey"])
             .group_by(["l_suppkey", "l_partkey"]).aggregate([]))
        b = pc.cast(pc.bit_wise_and(e["l_suppkey"].cast(pa.int64()),
                                    pa.scalar(63, pa.int64())), pa.int32())
        return e.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["l_suppkey", "l_partkey"])
        c = u.groupby("l_suppkey", as_index=False).size()
        return c.rename(columns={"size": "n_parts"})

    out = (
        _pq(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=_PARTIAL_BATCH)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = out.astype({"l_suppkey": "int64", "n_parts": "int64"})
    return out.sort_values("l_suppkey").reset_index(drop=True)
