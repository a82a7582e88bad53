"""Mimics the driver's correctness gate: run each queries() entry and its
oracle_sql() side-by-side at a given sf, compare row-count + schema +
order-insensitive values (sorted columns by name, rows by all columns).

Usable standalone:  python tests/driver_mimic.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare_query(name: str, fn, sql: str | None, sf_dir: str, con) -> tuple[bool, str]:
    got = _canon(_to_pandas(fn(sf_dir)))
    if sql is None:
        return True, f"rows-only ({len(got)} rows)"
    exp = _canon(con.execute(sql).df())
    if list(got.columns) != list(exp.columns):
        return False, f"columns ray={list(got.columns)} sql={list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"rowcount ray={len(got)} sql={len(exp)}"
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return False, str(e).split("\n")[0] + " (first diff rows: " + _first_diff(got, exp) + ")"
    return True, f"match ({len(got)} rows)"


def _first_diff(a: pd.DataFrame, b: pd.DataFrame) -> str:
    for i in range(min(len(a), len(b))):
        if not a.iloc[i].equals(b.iloc[i]):
            return f"ray={a.iloc[i].to_dict()} sql={b.iloc[i].to_dict()}"
    return "?"


def run_all(sf_dir: str, only: list[str] | None = None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = e.queries()
    sqls = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ok, msg = compare_query(name, fn, sqls.get(name), sf_dir, con)
        except Exception as ex:
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {ex}"
        print(f"{'OK ' if ok else 'FAIL'} {name}: {msg}")
        failures += (not ok)
    return failures


if __name__ == "__main__":
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    n = run_all(sf, only)
    ray.shutdown()
    sys.exit(1 if n else 0)
