"""Relational operator coverage over the generic testdata tables.

These pipelines exercise the engine-level operator surface the crawl uses
(grouped aggregation with partial pre-aggregation, broadcast hash joins,
filters, sort/top-k, distinct, windowed/bucketed aggregation — SURVEY §2.4,
§2.5) on the driver-provided TPC-H-ish tables, each with an exact DuckDB
oracle (see ``__ray_entry__.oracle_sql``).

Scale patterns demonstrated:
- every ``groupby`` is preceded by a per-batch partial aggregate inside
  ``map_batches`` (combiner), so the all-to-all only moves one row per
  (batch, key) — the 100 TB-safe shape;
- small sides (customer, nation, region) are broadcast with ``ray.put``
  and probed per batch — never a shuffle join;
- reads prune columns at the source (``read_parquet(columns=...)``).

All aggregate outputs are rounded where fractional so the value-hash
comparison against DuckDB is stable across summation orders.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _pq(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _partial_group_sum(keys: list[str], sums: dict[str, str], counts: str | None = None):
    """Per-batch combiner: pandas groupby → one partial row per key-combo.

    ``sums`` maps output column → input column. Returns a map_batches fn.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        agg = {out: (src, "sum") for out, src in sums.items()}
        if counts:
            agg[counts] = (keys[0], "size")
        return df.groupby(keys, as_index=False, sort=False).agg(**agg)

    return fn


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-flavored pricing summary (partial-aggregate → small groupby)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity",
                      "l_extendedprice", "l_discount"])

    def add_disc(df: pd.DataFrame) -> pd.DataFrame:
        df["disc_price"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return df

    partial = (
        ds.map_batches(add_disc, batch_format="pandas")
        .map_batches(
            _partial_group_sum(
                ["l_returnflag", "l_linestatus"],
                {"sum_qty": "l_quantity", "sum_base_price": "l_extendedprice",
                 "sum_disc_price": "disc_price"},
                counts="count_order",
            ),
            batch_format="pandas",
        )
    )
    out = (
        partial.groupby(["l_returnflag", "l_linestatus"])
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
    """Revenue top-k: broadcast customer (small side) into an orders scan."""
    partial = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]) \
        .map_batches(
            _partial_group_sum(["o_custkey"], {"revenue": "o_totalprice"},
                               counts="n_orders"),
            batch_format="pandas",
        )
    out = (
        partial.groupby("o_custkey")
        .aggregate(Sum("revenue", alias_name="revenue"),
                   Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    out = out.sort_values(["revenue", "o_custkey"], ascending=[False, True]).head(k)
    # top-k result is tiny → the dimension probe happens driver-side
    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    out = out.rename(columns={"o_custkey": "c_custkey"}).merge(cust, on="c_custkey")
    return out.reset_index(drop=True)[["c_custkey", "c_name", "revenue", "n_orders"]]


def supplier_stats(sf_dir: str) -> pd.DataFrame:
    """3-way broadcast join supplier⋈nation⋈region → per-region stats."""
    nation = _pq(sf_dir, "nation").to_pandas()
    region = _pq(sf_dir, "region").to_pandas()
    n2r = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put(dict(zip(n2r["n_nationkey"], n2r["r_name"])))

    class Tag:
        def __init__(self):
            self.r_of_n = ray.get(lookup_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["r_name"] = df["s_nationkey"].map(self.r_of_n)
            return df.groupby("r_name", as_index=False, sort=False).agg(
                n_suppliers=("s_suppkey", "size"), total_acctbal=("s_acctbal", "sum")
            )

    out = (
        _pq(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
        .map_batches(Tag, batch_format="pandas", concurrency=2)
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
    batch-engine form of a streaming window, SURVEY guide 'streaming-shaped')."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        return df.groupby(["event_type", "hour"], as_index=False, sort=False).agg(
            n=("event_id", "size"), sum_value=("value", "sum")
        )

    out = (
        _pq(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])
        .map_batches(bucket, batch_format="pandas")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def part_brand_stats(sf_dir: str) -> pd.DataFrame:
    out = (
        _pq(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])
        .map_batches(
            lambda df: df.groupby("p_brand", as_index=False, sort=False).agg(
                n=("p_size", "size"), sum_retail=("p_retailprice", "sum"),
                max_size=("p_size", "max")),
            batch_format="pandas",
        )
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
    """Filter (predicate pushdown-shaped) → count by priority."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    lo = pa.scalar(pd.Timestamp("1996-01-01"), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), type=pa.timestamp("us"))
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )
    out = (
        ds.map_batches(
            lambda df: df.groupby("o_orderpriority", as_index=False, sort=False)
            .agg(n=("o_orderdate", "size")),
            batch_format="pandas",
        )
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
