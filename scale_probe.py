"""Scale probe — the dedup path at 20× the driver testdata, realistic density.

The driver's sf0.1 documents table is adversarially DENSE (24% of all pairs
are true near-dups), which makes candidate volume ≈ output volume and hides
the regime LSH is built for. This probe generates a corpus shaped like real
web text — 100k docs, 50k-word vocabulary, ~5% near-duplicate rate — and
runs the full dedup path end-to-end with NOTHING pair-shaped materialized
on the driver:

    minhash → banding → grid-join verify → streaming parquet pair sink
    → connected components (actor shards) → cluster assignment

Run: ``python scale_probe.py [out_json]`` (owns its Ray session).
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = int(os.environ.get("LCR_PROBE_DOCS", "100000"))
PROBE_DIR = f"/tmp/lcr_scale_probe_{N_DOCS}"
VOCAB = 50_000
DOC_LEN = 40
DUP_RATE = 0.05


def build_corpus() -> str:
    import shutil

    os.makedirs(PROBE_DIR, exist_ok=True)
    path = os.path.join(PROBE_DIR, "documents.parquet")
    meta = os.path.join(PROBE_DIR, "probe_meta.json")
    want = {"n": N_DOCS, "vocab": VOCAB, "len": DOC_LEN, "dup": DUP_RATE,
            "sharded": 32}
    if os.path.exists(meta) and json.load(open(meta)) == want:
        return PROBE_DIR
    rng = np.random.default_rng(20260817)
    vocab = np.array([f"w{i:05d}" for i in range(VOCAB)])
    n_base = int(N_DOCS * (1 - DUP_RATE))
    texts = []
    base_words = rng.integers(0, VOCAB, size=(n_base, DOC_LEN))
    for row in base_words:
        texts.append(" ".join(vocab[row]))
    # near-dups: copy a random base doc, substitute 1-3 words (J ≈ 0.86-0.95)
    srcs = rng.integers(0, n_base, size=N_DOCS - n_base)
    for s in srcs:
        w = base_words[s].copy()
        for _ in range(int(rng.integers(1, 4))):
            w[rng.integers(0, DOC_LEN)] = rng.integers(0, VOCAB)
        texts.append(" ".join(vocab[w]))
    order = rng.permutation(N_DOCS)
    # 32 part files, not one: Ray's map parallelism is ~one task per read
    # block and one parquet file ≈ one block, so a monolithic corpus caps
    # the fused read→signature stage at ~1-way regardless of CPUs (the
    # probe-corpus sharding trap documented in BASELINE round 4; the ops
    # probe writes parts for the same reason).
    if os.path.isfile(path):  # pre-round-5 layout: one monolithic file
        os.unlink(path)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    chunk = (N_DOCS + 31) // 32
    for part, lo in enumerate(range(0, N_DOCS, chunk)):
        sel = order[lo: lo + chunk]
        t = pa.table({
            "doc_id": pa.array(np.arange(lo, lo + len(sel), dtype=np.int64)),
            "text": pa.array([texts[i] for i in sel], type=pa.string()),
            "lang": pa.array(["en"] * len(sel)),
        })
        pq.write_table(t, os.path.join(path, f"part-{part:04d}.parquet"),
                       row_group_size=8192)
    json.dump(want, open(meta, "w"))
    return PROBE_DIR


def main() -> None:
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sf = build_corpus()
    import pyarrow.dataset as pads

    from licenta_crawler_ray.pipelines.graph import (
        connected_components_from_edge_partitions,
        write_id_sidecar,
    )
    from licenta_crawler_ray.pipelines.textops import write_neardup_edges

    wd = os.path.join(PROBE_DIR, "dedup_out")
    edges_dir = os.path.join(wd, "edges")
    ids_dir = os.path.join(wd, "ids")
    clusters_dir = os.path.join(wd, "clusters")
    shutil.rmtree(wd, ignore_errors=True)
    # untimed warm-up at 1/100 scale (same steady-state protocol as
    # bench.py): the session's first shuffle pipeline pays a one-time
    # worker/path warm-up that is not a property of the pipeline
    warm_dir = os.path.join(PROBE_DIR, "warmup_edges")
    shutil.rmtree(warm_dir, ignore_errors=True)
    write_neardup_edges("/root/testdata/sf0.001", warm_dir, threshold=0.8)
    t0 = time.perf_counter()
    write_neardup_edges(sf, edges_dir, threshold=0.8)
    t_pairs = time.perf_counter() - t0
    n_pairs = pads.dataset(edges_dir, format="parquet",
                           partitioning="hive").count_rows() // 2

    t0 = time.perf_counter()
    write_id_sidecar(os.path.join(sf, "documents.parquet"), ids_dir)
    connected_components_from_edge_partitions(
        edges_dir, os.path.join(sf, "documents.parquet"),
        write_dir=clusters_dir, ids_dir=ids_dir,
    )
    t_cc = time.perf_counter() - t0
    import ray.data as rd
    n_groups = len(
        rd.read_parquet(clusters_dir, columns=["group_id"]).unique("group_id")
    )
    result = {
        "docs": N_DOCS, "vocab": VOCAB, "dup_rate": DUP_RATE,
        "pairs_found": int(n_pairs),
        "pairs_sec": round(t_pairs, 2),
        "cc_sec": round(t_cc, 2),
        "docs_per_sec": round(N_DOCS / t_pairs, 0),
        "clusters": n_groups,
        "dedup_removed": N_DOCS - n_groups,
    }
    ray.shutdown()
    print(json.dumps(result))
    if len(sys.argv) > 1:
        json.dump(result, open(sys.argv[1], "w"))


if __name__ == "__main__":
    main()
