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
  lineitems x 250k orders (~10^10 logical pairs, never materialized);
- ``ngram_contamination`` (round-4 repeated-5-gram signal) over the same
  1M-doc corpus — the planted Zipf head guarantees real cross-document
  gram sharing at every scale;
- ``supplier_pagerank_to_parquet`` (round-5: the driver-free PageRank —
  8M-row hash join → distinct-edge shard sink → self-loading shards →
  per-shard rank parquet) over ~8M lineitems x 2M orders (~8M distinct
  customer→supplier edges, 320k nodes);
- ``neardup_admit_incremental`` (round-5: incremental dedup of a 20% new
  batch against the persisted 80%-corpus band index) over the dup-planted
  1M-doc corpus shared with scale_probe.py — the split + index build are
  cached setup (the operator's semantics: the index EXISTS), the timed
  path is signatures-for-new + ONE band co-group + grid verify + CC.

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
    import shutil

    meta = os.path.join(PROBE_DIR, "probe_meta.json")
    want = {"n": N_DOCS, "common": COMMON_VOCAB, "rare": RARE_VOCAB,
            "cpd": COMMON_PER_DOC, "rpd": RARE_PER_DOC,
            "items": N_ITEMS, "orders": N_ORDERS, "sharded": 32,
            "graph_cols": True}  # round-5: l_orderkey/l_suppkey/o_custkey
    if os.path.exists(meta) and json.load(open(meta)) == want:
        return PROBE_DIR
    shutil.rmtree(PROBE_DIR, ignore_errors=True)  # stale layout/params
    os.makedirs(PROBE_DIR, exist_ok=True)
    rng = np.random.default_rng(20260817)
    common = np.array([f"c{i:04d}" for i in range(COMMON_VOCAB)])
    rare = np.array([f"r{i:06d}" for i in range(RARE_VOCAB)])
    # Every table is written as a DIRECTORY of part files (a .parquet
    # directory reads identically through rd.read_parquet). A single
    # monolithic file was the probe's own bottleneck: Ray fuses
    # read→tokenize→count into the read tasks, and one file yields so few
    # read tasks that the whole scan ran ~serial — heavy_tokens measured
    # t₄ ≈ t₁₆ ≈ 12.5 s (efficiency 0.24) on the one-file corpus vs real
    # scaling on shards. That is the production lesson (the brief's
    # "never one giant file"), not an engine property: a 100 TB corpus is
    # always many shards.
    CHUNK = 31_250  # one part file per chunk → 32 read/map tasks at 1M
    # docs (10 parts measured eff 0.44 at 4-vs-16: map parallelism is
    # one task per block, so shard count IS the scan's parallelism cap)
    docs_dir = os.path.join(PROBE_DIR, "documents.parquet")
    os.makedirs(docs_dir, exist_ok=True)
    for part, lo in enumerate(range(0, N_DOCS, CHUNK)):
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
        pq.write_table(t, os.path.join(docs_dir, f"part-{part:04d}.parquet"),
                       row_group_size=8192)
    # interval-join tables: ~10^11 logical (order, item) pairs at 8M items
    base = np.datetime64("1995-01-01", "us").astype(np.int64)
    span_us = np.int64(730) * 86_400_000_000

    def _write_parts(name: str, total: int, nparts: int, make):
        d = os.path.join(PROBE_DIR, name)
        os.makedirs(d, exist_ok=True)
        per = (total + nparts - 1) // nparts
        for part, lo in enumerate(range(0, total, per)):
            n = min(per, total - lo)
            pq.write_table(make(lo, n),
                           os.path.join(d, f"part-{part:04d}.parquet"),
                           row_group_size=65536)

    # graph columns (round-5 pagerank probe): ~8M lineitems over 2M orders
    # and 20k suppliers; orders map to 300k customers — ~8M distinct
    # customer→supplier edges after the distinct co-partition
    _write_parts("lineitem.parquet", N_ITEMS, 32, lambda lo, n: pa.table({
        "l_orderkey": pa.array(rng.integers(0, N_ORDERS, n).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, 20_000, n).astype(np.int64)),
        "l_shipdate": pa.array(
            (base + rng.integers(0, span_us, size=n)).astype("datetime64[us]")),
        "l_extendedprice": pa.array(rng.uniform(10, 1000, n).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n).round(2)),
    }))
    _write_parts("orders.parquet", N_ORDERS, 16, lambda lo, n: pa.table({
        "o_orderkey": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, 300_000, n).astype(np.int64)),
        "o_orderdate": pa.array(
            (base + rng.integers(0, span_us, size=n)).astype("datetime64[us]")),
    }))
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

    from licenta_crawler_ray.pipelines.relational import (
        order_window_shipments, supplier_pagerank_to_parquet,
    )
    from licenta_crawler_ray.pipelines.sketches import (
        heavy_tokens, heavy_tokens_sketch,
    )
    from licenta_crawler_ray.pipelines.textops import (
        distinctive_terms_to_parquet, neardup_admit_incremental,
        ngram_contamination_to_parquet,
    )

    sf = build_corpus()
    import scale_probe

    # pin the dup corpus to THIS probe's size (scale_probe defaults to
    # 100k when LCR_PROBE_DOCS is unset; the families probe wants 1M)
    scale_probe.N_DOCS = N_DOCS
    scale_probe.PROBE_DIR = f"/tmp/lcr_scale_probe_{N_DOCS}"
    dup_sf = scale_probe.build_corpus()  # dup-planted corpus (cached)
    warm = "/root/testdata/sf0.001"
    out: dict = {"cpus": num_cpus}

    def nc_sink(d):
        # scale form: worker-side parquet sink (the query form's 1M-row
        # to_pandas would measure the driver, not the engine)
        o = os.path.join(PROBE_DIR, f"nc_out_{num_cpus}")
        shutil.rmtree(o, ignore_errors=True)
        return ngram_contamination_to_parquet(d, o)["rows"]

    def dt_sink(d):
        # the scale form: worker-side parquet sink — the driver-DataFrame
        # query form spends its wall time in a 9M-row to_pandas at this
        # scale, which measures the driver, not the engine
        o = os.path.join(PROBE_DIR, f"dt_out_{num_cpus}")
        shutil.rmtree(o, ignore_errors=True)
        return distinctive_terms_to_parquet(d, o)["rows"]

    def pr_sink(d):
        o = os.path.join(PROBE_DIR, f"pr_out_{num_cpus}")
        shutil.rmtree(o, ignore_errors=True)
        return supplier_pagerank_to_parquet(d, o)["nodes"]

    def incr(_):
        # timed input is the DUP-PLANTED corpus; the 80/20 split and the
        # band index are cached setup under /tmp/lcr_incr_* (built by the
        # untimed first call below), so the timed path is the operator
        # itself: new-batch signatures + band co-group vs index + verify
        # + incremental CC admit decisions
        return len(neardup_admit_incremental(dup_sf))

    ops = [
        ("heavy_tokens", lambda d: len(heavy_tokens(d))),
        ("heavy_tokens_sketch", lambda d: len(heavy_tokens_sketch(d))),
        ("distinctive_terms_to_parquet", dt_sink),
        ("order_window_shipments", lambda d: len(order_window_shipments(d))),
        ("ngram_contamination", lambda d: nc_sink(d)),
        ("supplier_pagerank_to_parquet", pr_sink),
        ("neardup_admit_incremental", incr),
    ]
    only = os.environ.get("LCR_PROBE_OPS")
    if only:  # targeted rerun of a subset (co-tenancy-window control)
        names = set(only.split(","))
        ops = [(n, f) for n, f in ops if n in names]
    for name, fn in ops:
        fn(warm)  # untimed session/path warm-up at 1/1000 scale
        best, rows = float("inf"), None
        for _ in range(2):  # best-of-2 timed (headline protocol): the
            # box's co-tenancy band swung 3-4x between probe runs this
            # round; min-of-2 per level is the controlled estimate
            os.sync()
            t0 = time.perf_counter()
            rows = fn(sf)
            best = min(best, time.perf_counter() - t0)
        out[name] = {"sec": round(best, 2), "rows": int(rows)}
    if with_ab and any(n == "heavy_tokens" for n, _ in ops):
        # tokenizer A/B on identical input, same session (hi level only);
        # skipped on targeted reruns that exclude heavy_tokens — the
        # pylist pass alone costs ~380 s and its number would be unused
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
        proc = subprocess.run(args, capture_output=True, text=True)
        if proc.returncode != 0:
            # transient child deaths happen (co-tenant OOM; once a Ray-core
            # reference_count.cc:581 race in a fresh process) — retry the
            # level ONCE before failing, and never silently discard the
            # dead child's stderr or the other level's results
            sys.stderr.write(proc.stderr[-4000:])
            sys.stderr.write(f"\nlevel-{n} child died; retrying once\n")
            time.sleep(5)
            proc = subprocess.run(args, capture_output=True, text=True)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(f"level-{n} child failed (see stderr above)")
        results[n] = json.loads(proc.stdout.strip().splitlines()[-1])
        # persist each level as it lands — a later-level failure keeps it
        json.dump(results[n], open(f"/tmp/lcr_ops_level_{n}.json", "w"))
    summary = {"docs": N_DOCS, "items": N_ITEMS, "orders": N_ORDERS, "ops": {}}
    op_names = ("heavy_tokens", "heavy_tokens_sketch",
                "distinctive_terms_to_parquet", "order_window_shipments",
                "ngram_contamination", "supplier_pagerank_to_parquet",
                "neardup_admit_incremental")
    if os.environ.get("LCR_PROBE_OPS"):
        op_names = tuple(os.environ["LCR_PROBE_OPS"].split(","))
    for name in op_names:
        t4 = results[4][name]["sec"]
        t16 = results[16][name]["sec"]
        assert results[4][name]["rows"] == results[16][name]["rows"]
        summary["ops"][name] = {
            "sec_4cpu": t4, "sec_16cpu": t16,
            "rows": results[16][name]["rows"],
            "efficiency": round((t4 / t16) / 4, 2),
        }
    ab = results[16].get("heavy_tokens_pylist")
    if ab and "heavy_tokens" in results[16]:
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
