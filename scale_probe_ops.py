"""Operator-family scale probe — term family + interval join at ~1M rows.

The dedup pipeline's 1M/2M-doc probe (scale_probe.py) is the repo's
strongest amortized-scale evidence; this extends the same 4-vs-16-CPU
protocol to the OTHER corpus-scale families the round-3 verdict named:

- ``heavy_tokens`` (exact heavy hitters) — plus an in-process A/B against
  the pre-round-4 Python-token-list partial, isolating the shared Arrow
  tokenizer kernel's speedup on identical input;
- ``heavy_tokens_sketch`` (Misra-Gries);
- ``distinctive_terms`` (integer tf-idf keyword gate) over a skewed
  corpus (Zipf-ish common head that the df gate filters, rare tail that
  survives — the realistic regime; a uniform vocab would pass everything);
- ``order_window_shipments`` (no-equality-key interval join) over ~1M
  lineitems x 250k orders (~10^10 logical pairs, never materialized).

Protocol (same as bench.py --scaling / scale_probe.py): each CPU level
runs in a FRESH process (subprocess self-invocation), one untimed sf0.001
warm-up per op family, corpus cached per size under /tmp. Efficiency =
(t_4 / t_16) / 4. Results are recorded in BASELINE.md.

Run: ``python scale_probe_ops.py [out_json]``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = int(os.environ.get("LCR_PROBE_DOCS", "1000000"))
PROBE_DIR = f"/tmp/lcr_ops_probe_{N_DOCS}"
COMMON_VOCAB = 1000     # Zipf-ish head: high df, filtered by the term gate
RARE_VOCAB = 100_000    # tail: low df, survives the gate
COMMON_PER_DOC = 38
RARE_PER_DOC = 2
N_ITEMS = 8 * N_DOCS      # interval-join probe side (the op is much
N_ORDERS = 2 * N_DOCS     # cheaper per row than the text ops — larger
                          # input amortizes fixed session cost)


def build_corpus() -> str:
    os.makedirs(PROBE_DIR, exist_ok=True)
    meta = os.path.join(PROBE_DIR, "probe_meta.json")
    want = {"n": N_DOCS, "common": COMMON_VOCAB, "rare": RARE_VOCAB,
            "cpd": COMMON_PER_DOC, "rpd": RARE_PER_DOC,
            "items": N_ITEMS, "orders": N_ORDERS}
    if os.path.exists(meta) and json.load(open(meta)) == want:
        return PROBE_DIR
    rng = np.random.default_rng(20260817)
    common = np.array([f"c{i:04d}" for i in range(COMMON_VOCAB)])
    rare = np.array([f"r{i:06d}" for i in range(RARE_VOCAB)])
    # Zipf-ish head draw (bounded) + uniform tail; assemble row-wise text
    # in chunks to bound builder memory
    docs_path = os.path.join(PROBE_DIR, "documents.parquet")
    writer = None
    CHUNK = 100_000
    for lo in range(0, N_DOCS, CHUNK):
        n = min(CHUNK, N_DOCS - lo)
        zipf = np.minimum(rng.zipf(1.3, size=(n, COMMON_PER_DOC)) - 1,
                          COMMON_VOCAB - 1)
        tail = rng.integers(0, RARE_VOCAB, size=(n, RARE_PER_DOC))
        words = np.concatenate([common[zipf], rare[tail]], axis=1)
        texts = [" ".join(row) for row in words]
        t = pa.table({
            "doc_id": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n),
        })
        if writer is None:
            writer = pq.ParquetWriter(docs_path, t.schema)
        writer.write_table(t, row_group_size=8192)
    writer.close()
    # interval-join tables: ~10^11 logical (order, item) pairs at 8M items
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    span_us = np.int64(730) * 86_400_000_000
    ship = base + rng.integers(0, span_us, size=N_ITEMS)
    pq.write_table(pa.table({
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
        "l_extendedprice": pa.array(rng.uniform(10, 1000, N_ITEMS).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, N_ITEMS).round(2)),
    }), os.path.join(PROBE_DIR, "lineitem.parquet"), row_group_size=65536)
    odate = base + rng.integers(0, span_us, size=N_ORDERS)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS, dtype=np.int64)),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
    }), os.path.join(PROBE_DIR, "orders.parquet"), row_group_size=65536)
    json.dump(want, open(meta, "w"))
    return PROBE_DIR


def heavy_tokens_pylist(sf_dir: str, min_share: float = 0.03):
    """The pre-round-4 heavy_tokens partial (Python token-list explode),
    kept ONLY as the A/B baseline for the Arrow tokenizer measurement."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from licenta_crawler_ray.pipelines.textops import _docs

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words = [w for t in df["text"] for w in t.split()]
        s = pd.Series(words, dtype="object").value_counts()
        return s.rename_axis("word").reset_index(name="n")

    counts = (
        _docs(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts["n"] = counts["n"].astype("int64")
    total = float(counts["n"].sum())
    out = counts[counts["n"] >= min_share * total]
    return out.sort_values(["n", "word"], ascending=[False, True]).reset_index(drop=True)


def run_level(num_cpus: int, with_ab: bool) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import shutil

    from licenta_crawler_ray.pipelines.relational import order_window_shipments
    from licenta_crawler_ray.pipelines.sketches import (
        heavy_tokens, heavy_tokens_sketch,
    )
    from licenta_crawler_ray.pipelines.textops import distinctive_terms_to_parquet

    sf = build_corpus()
    warm = "/root/testdata/sf0.001"
    out: dict = {"cpus": num_cpus}

    def dt_sink(d):
        # the scale form: worker-side parquet sink — the driver-DataFrame
        # query form spends its wall time in a 9M-row to_pandas at this
        # scale, which measures the driver, not the engine
        o = os.path.join(PROBE_DIR, f"dt_out_{num_cpus}")
        shutil.rmtree(o, ignore_errors=True)
        return distinctive_terms_to_parquet(d, o)["rows"]

    ops = [
        ("heavy_tokens", lambda d: len(heavy_tokens(d))),
        ("heavy_tokens_sketch", lambda d: len(heavy_tokens_sketch(d))),
        ("distinctive_terms_to_parquet", dt_sink),
        ("order_window_shipments", lambda d: len(order_window_shipments(d))),
    ]
    for name, fn in ops:
        fn(warm)  # untimed session/path warm-up at 1/1000 scale
        os.sync()
        t0 = time.perf_counter()
        rows = fn(sf)
        out[name] = {"sec": round(time.perf_counter() - t0, 2),
                     "rows": int(rows)}
    if with_ab:
        # tokenizer A/B on identical input, same session (hi level only)
        heavy_tokens_pylist(warm)
        t0 = time.perf_counter()
        r = heavy_tokens_pylist(sf)
        out["heavy_tokens_pylist"] = {
            "sec": round(time.perf_counter() - t0, 2), "rows": int(len(r))}
    ray.shutdown()
    return out


def main() -> None:
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        n = int(sys.argv[i + 1])
        print(json.dumps(run_level(n, with_ab="--ab" in sys.argv)))
        return
    build_corpus()  # generate once so neither child pays it
    results = {}
    for n, ab in ((4, False), (16, True)):
        os.sync()
        time.sleep(2)
        args = [sys.executable, os.path.abspath(__file__), "--level", str(n)]
        if ab:
            args.append("--ab")
        out = subprocess.run(args, capture_output=True, text=True,
                             check=True).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
    summary = {"docs": N_DOCS, "items": N_ITEMS, "orders": N_ORDERS, "ops": {}}
    for name in ("heavy_tokens", "heavy_tokens_sketch",
                 "distinctive_terms_to_parquet", "order_window_shipments"):
        t4 = results[4][name]["sec"]
        t16 = results[16][name]["sec"]
        assert results[4][name]["rows"] == results[16][name]["rows"]
        summary["ops"][name] = {
            "sec_4cpu": t4, "sec_16cpu": t16,
            "rows": results[16][name]["rows"],
            "efficiency": round((t4 / t16) / 4, 2),
        }
    ab = results[16].get("heavy_tokens_pylist")
    if ab:
        summary["tokenizer_ab_16cpu"] = {
            "arrow_sec": results[16]["heavy_tokens"]["sec"],
            "pylist_sec": ab["sec"],
            "speedup": round(ab["sec"] / results[16]["heavy_tokens"]["sec"], 2),
        }
    print(json.dumps(summary))
    if len(sys.argv) > 1 and not sys.argv[1].startswith("--"):
        json.dump(summary, open(sys.argv[1], "w"))


if __name__ == "__main__":
    main()
