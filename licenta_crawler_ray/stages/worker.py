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

    def __init__(self, pages_dir: str, num_buckets: int, rules_ref, fetch_leaves: bool):
        self.fetcher = Fetcher(pages_dir, num_buckets)
        self.processor = ProcessPage(rules_ref, fetch_leaves)

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

    def __init__(self, pages_dir: str, num_buckets: int, rules_ref, fetch_leaves: bool):
        self.inner = FetchProcess(pages_dir, num_buckets, rules_ref, fetch_leaves)

    def process(self, batch: pa.Table) -> pa.Table:
        return self.inner(batch)
