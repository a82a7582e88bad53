"""Fused fetch+process actor stage.

One ``map_batches`` actor pool that probes the pages Parquet for a frontier
batch AND runs parse/sanitize/extract in the same ``__call__`` — the html
bytes never enter the object store (they are consumed where they are read),
which at 100 TB scale removes the single largest inter-stage transfer. The
individual :class:`~licenta_crawler_ray.stages.fetch.Fetcher` and
:class:`~licenta_crawler_ray.stages.process.ProcessPage` stages remain
available for pipelines that need them separately.
"""

from __future__ import annotations

import pyarrow as pa

from .fetch import Fetcher
from .process import ProcessPage


class FetchProcess:
    """Actor-pool callable: frontier batch → combined visited/candidate table."""

    def __init__(self, pages_dir: str, num_buckets: int, rules_ref, fetch_leaves: bool,
                 enrich: bool = False):
        self.fetcher = Fetcher(pages_dir, num_buckets)
        self.processor = ProcessPage(rules_ref, fetch_leaves, enrich)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.processor(self.fetcher(batch))


import ray


@ray.remote(num_cpus=1)
class CrawlWorker:
    """Persistent fetch+process worker for the wave loop.

    The crawl is cyclic dataflow (wave t's output is wave t+1's input), which
    a single Ray Data ``Dataset`` cannot express; per-wave ``map_batches``
    executions would re-create the actor pool (and re-open the corpus
    handles) every wave. This is the one documented drop to raw Ray actors
    (SURVEY §7.2): ONE pool created per job run, holding the pages-dataset
    handle + robots rules for its whole life; each wave round-robins Arrow
    frontier chunks over the pool. The pure-Dataset path remains available
    via ``CrawlPipeline(use_ray_data_stages=True)`` and is parity-tested.
    """

    def __init__(self, pages_dir: str, num_buckets: int, rules_ref, fetch_leaves: bool,
                 enrich: bool = False):
        self.inner = FetchProcess(pages_dir, num_buckets, rules_ref, fetch_leaves, enrich)
        self.busy_sec = 0.0  # cumulative wall time inside process calls

    def process(self, batch: pa.Table) -> pa.Table:
        return self.inner(batch)

    def stats(self) -> float:
        return self.busy_sec

    def prefetch(self, buckets: list[int]) -> int:
        """Warm this worker's owned corpus partitions (bucket affinity)."""
        return self.inner.fetcher.prefetch(buckets)

    def process_and_write(self, batch: pa.Table, visited_path: str) -> tuple[pa.Table, int]:
        """Fetch+process one frontier block; write its visited rows (the
        text-heavy side) straight to a parquet part under the wave's
        checkpoint dir and return ONLY the small candidate table + count.

        Extracted text never crosses the object store to the driver — at
        100 TB the record stream is written where it is produced (partitioned
        output, one part per block, atomically committed by the wave rename).
        """
        import time as _time

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        _t0 = _time.perf_counter()
        out = self.inner(batch)
        kind = out.column("kind")
        visited = out.filter(pc.equal(kind, "visited")).drop_columns(["kind"])
        candidates = out.filter(pc.equal(kind, "candidate")).select(
            ["url", "host", "referer", "page_type", "seed_idx", "depth",
             "doc_order", "priority"]
        )
        if visited.num_rows:
            pq.write_table(visited, visited_path, compression="zstd")
        self.busy_sec += _time.perf_counter() - _t0
        return candidates, visited.num_rows

    def crawl_bucket(self, bucket_id: int, frontier: pa.Table,
                     seed_urls: list[str], out_dir: str,
                     host_budget: int, fetch_leaves: bool,
                     seen_log2_buckets: int = 16) -> dict:
        """Run one bucket's ENTIRE crawl locally (see stages/bucket_crawl.py):
        zero global coordination — the scalable engine mode."""
        import time as _time

        from .bucket_crawl import crawl_bucket_local

        _t0 = _time.perf_counter()
        out = crawl_bucket_local(
            self.inner, bucket_id, frontier, seed_urls, out_dir,
            host_budget=host_budget, fetch_leaves=fetch_leaves,
            seen_log2_buckets=seen_log2_buckets,
            # Crawl-delay map rides with the broadcast robots rules the
            # worker already holds — no extra plumbing from the driver
            crawl_delays=self.inner.processor.rules.crawl_delay,
        )
        self.busy_sec += _time.perf_counter() - _t0
        return out
