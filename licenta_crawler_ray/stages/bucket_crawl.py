"""Per-bucket local crawl — the zero-global-barrier engine core.

Key structural fact: the reference's standing same-domain scope filter
(O5, ``CrawlJobResource.java:121-139``) makes every discovered URL
host-local, and hosts are partitioned by ``host_bucket``. Therefore no URL
can ever cross buckets, the URL-seen set decomposes exactly into
independent per-bucket sets, and the crawl factorizes into ``num_buckets``
fully independent sub-crawls — the global wave barrier of the wave engine
is coordination the problem doesn't require.

:func:`crawl_bucket_local` runs one bucket's entire crawl (all its hosts'
pagination chains and sitemap queues, politeness budget per host per local
wave, first-seen-wins via a bucket-local cuckoo filter) inside ONE actor
call, writing visited parquet parts + a lineage row per local wave into the
bucket's checkpoint dir and committing it atomically (tmp → rename).
A killed run resumes by skipping committed buckets — the north_rule's
per-partition lineage/resume, at the partition granularity that actually
scales (10^10 URLs / 2^14 buckets ≈ 6×10^5 URLs per bucket sub-crawl).

Record ranks are identical to the wave engine and the serial oracle
(priority = logical discovery time — parallelism-invariant).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.urls import hash_strings
from ..state.seen import CuckooFilter


def crawl_bucket_local(
    fetch_process,
    bucket_id: int,
    frontier: pa.Table,
    seed_urls: list[str],
    out_dir: str,
    host_budget: int = 256,
    fetch_leaves: bool = True,
    seen_log2_buckets: int = 16,
    crawl_delays: dict[str, float] | None = None,
) -> dict:
    """Run bucket ``bucket_id``'s crawl to frontier exhaustion.

    ``frontier`` holds this bucket's seed rows (FRONTIER schema +
    host_bucket); ``seed_urls`` are pre-marked seen. Returns the bucket's
    summary dict (also persisted as lineage.json in the committed dir).
    """
    t_start = time.perf_counter()
    tmp = out_dir + ".tmp"
    import shutil

    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    seen = CuckooFilter(log2_buckets=seen_log2_buckets, seed=0x5EED ^ bucket_id)
    if seed_urls:
        seen.contains_and_add(
            hash_strings(pa.array(seed_urls, type=pa.string()))
        )

    from ..state.politeness import PolitenessClock, select_with_clock

    clock = PolitenessClock(crawl_delays or {}, host_budget)
    lineage: list[dict] = []
    wave = 0
    total_recorded = 0
    total_fetched = 0
    while frontier.num_rows > 0:
        t0 = time.perf_counter()
        throttled = 0
        # politeness budget: fast path when no host exceeds it (record order
        # is logical — rank-encoded — so no sort is needed to select all);
        # a bucket containing Crawl-delay hosts always takes the clocked path
        host_counts = pc.value_counts(frontier.column("host"))
        max_per_host = int(pc.max(host_counts.field("counts")).as_py() or 0)
        delayed_here = clock.delay and any(
            h in clock.delay for h in host_counts.field("values").to_pylist()
        )
        # (select_with_clock ticks the clock when it receives one)
        if max_per_host <= host_budget and not delayed_here:
            batch = frontier
            leftovers = None
        else:
            # shared selection kernel — identical semantics to the wave
            # engine by construction (state/politeness.select_with_clock)
            selected, leftovers, throttled = select_with_clock(
                frontier.to_pandas(), clock if delayed_here else None,
                host_budget,
            )
            if len(selected) == 0:
                if throttled:
                    # all candidates are waiting on their crawl-delay clock:
                    # an idle local wave advances logical time only (tokens
                    # accrue monotonically → terminates)
                    lineage.append({
                        "bucket": bucket_id, "wave": wave, "urls_in": 0,
                        "recorded": 0, "dedup_hits": 0, "throttled": throttled,
                        "frontier_out": int(frontier.num_rows),
                        "wall_sec": round(time.perf_counter() - t0, 4),
                    })
                    wave += 1
                    continue
                break
            batch = pa.Table.from_pandas(selected, preserve_index=False)
        out = fetch_process(batch)
        kind = out.column("kind")
        visited = out.filter(pc.equal(kind, "visited")).drop_columns(["kind"])
        cand = out.filter(pc.equal(kind, "candidate")).select(
            ["url", "host", "referer", "page_type", "seed_idx", "depth",
             "doc_order", "priority"]
        )

        # in-wave first-wins (sort by rank, keep first per url) then the
        # bucket-local cuckoo for cross-wave dedup
        dedup_hits = 0
        if cand.num_rows:
            idx = pc.sort_indices(cand, sort_keys=[("priority", "ascending"),
                                                   ("url", "ascending")])
            cand = cand.take(idx)
            keep = ~cand.column("url").to_pandas().duplicated().to_numpy()
            cand = cand.filter(pa.array(keep))
            was_seen = seen.contains_and_add(hash_strings(cand.column("url")))
            dedup_hits = int(was_seen.sum())
            cand = cand.filter(pa.array(~was_seen))

        fetchable = ["shelf", "sitemap"] + (["product"] if fetch_leaves else [])
        fmask = pc.is_in(cand.column("page_type"), value_set=pa.array(fetchable))
        to_frontier = cand.filter(fmask)
        recorded_now = cand.filter(pc.invert(fmask))
        if recorded_now.num_rows:
            n = recorded_now.num_rows
            rec = recorded_now \
                .append_column("fetched", pa.array([False] * n)) \
                .append_column("error", pa.array([""] * n, type=pa.string())) \
                .append_column("text", pa.array([""] * n, type=pa.string())) \
                .append_column("retrieved_ts", pa.array([None] * n, type=pa.timestamp("us"))) \
                .append_column("retry_count", pa.array([0] * n, type=pa.int32()))
            # align enrichment columns (null-filled) so every part of this
            # bucket shares one schema
            for name in visited.column_names[rec.num_columns:]:
                rec = rec.append_column(
                    name, pa.nulls(n, visited.schema.field(name).type)
                )
            visited = pa.concat_tables([visited, rec])

        if visited.num_rows:
            pq.write_table(visited, os.path.join(tmp, f"visited-{wave:05d}.parquet"),
                           compression="zstd")
        # host_bucket column travels with leftovers for the next local wave
        lo_t = (
            pa.Table.from_pandas(leftovers, preserve_index=False)
            if leftovers is not None and len(leftovers)
            else batch.slice(0, 0)
        )
        frontier = pa.concat_tables([
            lo_t.select(batch.column_names),
            to_frontier.append_column(
                "host_bucket",
                pa.array(np.full(to_frontier.num_rows, bucket_id, dtype=np.int32)),
            ).select(batch.column_names),
        ])
        total_recorded += visited.num_rows
        total_fetched += int(pc.sum(visited.column("fetched")).as_py() or 0)
        lineage.append({
            "bucket": bucket_id,
            "wave": wave,
            "urls_in": int(batch.num_rows),
            "recorded": int(visited.num_rows),
            "dedup_hits": dedup_hits,
            "throttled": throttled,
            "frontier_out": int(frontier.num_rows),
            "wall_sec": round(time.perf_counter() - t0, 4),
        })
        wave += 1

    seen.save(os.path.join(tmp, "seen.npz"))
    summary = {
        "bucket": bucket_id,
        "waves": wave,
        "recorded": total_recorded,
        "fetched": total_fetched,
        "seen_count": seen.count,
        "wall_sec": round(time.perf_counter() - t_start, 4),
        "lineage": lineage,
    }
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump(summary, f)
    final = out_dir
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)  # atomic bucket commit
    return {k: v for k, v in summary.items() if k != "lineage"}
