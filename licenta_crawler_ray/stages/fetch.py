"""Fetch stage — the in-sandbox "network" (SURVEY §2.1 S1/S2, §2.4).

The reference fetched live with a headless browser
(``BrowserCrawler.java:94-99,128,133-134``) or ``HttpURLConnection``
(``SitemapSaxCrawler.java:56-67``). Per ``BASELINE.json.input_hint`` the
rebuild's fetch is a **url→html probe of the Common-Crawl-style pages
Parquet**: an actor-pool ``map_batches`` stage whose actors hold a lazy
``pyarrow.dataset`` handle over the hive-partitioned corpus and, per
frontier batch, read only the ``host_bucket`` partitions and row groups
that can contain the probed URLs (the corpus is written sorted-by-url with
small row groups, so url min/max statistics prune).

Scale: the big side (pages) never moves — each probe ships only the batch's
URLs to the scan and returns only matching rows. Frontier batches arrive
grouped by host_bucket (the engine-wide partition key), so a probe touches
O(1) partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..functions.urls import hash_strings


class Fetcher:
    """Actor-pool callable: frontier batch → batch + ``html`` + ``fetch_error``.

    ``__init__`` (once per actor) opens the dataset handle; ``__call__``
    (per batch) runs the pruned probe. Mirrors the reference's one-browser-
    per-crawler lifecycle (``BrowserCrawler.java:71,94-99,119``) with the
    browser replaced by the corpus handle.

    Memory contract: per-actor corpus residency is bounded in BYTES
    (``cache_bytes``, default 256 MiB, env ``LCR_FETCH_CACHE_BYTES``). With
    bucket-affinity routing (the wave loop sends bucket b to actor b % pool)
    the hot buckets stay LRU-cached; any bucket that does not fit — or any
    probe after the cache is full — falls back to a **filtered scan**
    (``url isin(batch)`` + the hive ``host_bucket`` partition filter), which
    prunes at the row-group level because the corpus is written
    sorted-by-url with small row groups. Per-actor RSS therefore never
    scales with corpus size, only with the cap.
    """

    DEFAULT_CACHE_BYTES = 256 << 20

    MAX_REDIRECTS = 5  # mirrors the reference cap (SitemapSaxCrawler.java:102)
    # retry budget for transient (timeout-class) failures, as data: the
    # reference retries a page up to 3 times on timeout before giving up
    # (``BrowserCrawler.java:47,197``); the sandbox's deterministic stand-in
    # is ``flaky.json`` (url → number of transient failures before success).
    # A url with k ≤ cap succeeds with ``retry_count = k``; k > cap records
    # a ``timeout`` error with ``retry_count = cap``.
    MAX_TIMEOUT_RETRIES = 3

    def __init__(self, pages_dir: str, num_buckets: int, cache_bytes: int | None = None):
        import json
        import os
        from collections import OrderedDict

        self.ds = pads.dataset(pages_dir, partitioning="hive")
        self.num_buckets = num_buckets
        self._cache: "OrderedDict[int, pa.Table]" = OrderedDict()
        self._cache_nbytes = 0
        self._size_est: dict[int, int] = {}
        self.cache_bytes = (
            cache_bytes if cache_bytes is not None
            else int(os.environ.get("LCR_FETCH_CACHE_BYTES", self.DEFAULT_CACHE_BYTES))
        )
        # redirect map (url → url), the sandbox form of 301/302/303 chasing
        # (``SitemapSaxCrawler.java:96-128``); same-host redirects only, so
        # the resolved url stays in the probe's bucket
        rpath = os.path.join(os.path.dirname(pages_dir.rstrip("/")), "redirects.json")
        self.redirects: dict[str, str] = {}
        if os.path.exists(rpath):
            with open(rpath) as f:
                self.redirects = json.load(f)
        fpath = os.path.join(os.path.dirname(pages_dir.rstrip("/")), "flaky.json")
        self.flaky: dict[str, int] = {}
        if os.path.exists(fpath):
            with open(fpath) as f:
                self.flaky = {u: int(k) for u, k in json.load(f).items()}

    def resolve_redirects(self, url: str) -> str:
        """Chase the redirect map ≤ MAX_REDIRECTS hops (relative targets are
        resolved against the current url, mirroring ``new URL(url, location)``
        at ``SitemapSaxCrawler.java:116``)."""
        from ..functions.urls import absolutize

        for _ in range(self.MAX_REDIRECTS):
            nxt = self.redirects.get(url)
            if nxt is None:
                return url
            url = absolutize(url, nxt)
        return url

    def _insert_cache(self, b: int, t: pa.Table) -> None:
        nb = t.nbytes
        while self._cache and self._cache_nbytes + nb > self.cache_bytes:
            _, old = self._cache.popitem(last=False)  # LRU eviction
            self._cache_nbytes -= old.nbytes
        self._cache[b] = t
        self._cache_nbytes += nb

    def _bucket_size_estimate(self, b: int) -> int:
        """Uncompressed in-memory estimate of bucket ``b``'s probe columns,
        from parquet row-group METADATA only (no data read) — so an
        oversized bucket is never loaded-then-discarded (round-2 advice:
        the old path violated the per-actor RSS ≤ cache_bytes contract by
        materializing the whole bucket before checking its size)."""
        est = self._size_est.get(b)
        if est is not None:
            return est
        est = 0
        want = {"url", "html", "warc_ts"}
        for frag in self.ds.get_fragments(filter=pc.field("host_bucket") == b):
            md = frag.metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema.split(".")[0] in want:
                        est += col.total_uncompressed_size
        self._size_est[b] = est
        return est

    def _lookup(self, b: int, urls: list[str]) -> pa.Table:
        """Bucket table covering ``urls``: the LRU-cached whole bucket when
        its METADATA size estimate fits the byte budget, else a row-group-
        pruned filtered scan of just the probed urls. Probing is an Arrow
        ``index_in`` against the url column (no Python dict index)."""
        hit = self._cache.get(b)
        if hit is not None:
            self._cache.move_to_end(b)
            return hit
        bucket_filter = pc.field("host_bucket") == b
        if (
            self._cache_nbytes < self.cache_bytes
            and self._bucket_size_estimate(b) <= self.cache_bytes
        ):
            t = self.ds.to_table(
                columns=["url", "html", "warc_ts"], filter=bucket_filter
            )
            if t.nbytes <= self.cache_bytes:
                self._insert_cache(b, t.combine_chunks())
                return self._cache[b]
        # probe mode: ship only the batch's urls to the scan; url min/max
        # statistics prune row groups (corpus written sorted-by-url)
        return self.ds.to_table(
            columns=["url", "html", "warc_ts"],
            filter=bucket_filter & pc.field("url").isin(urls),
        )

    @staticmethod
    def _probe_indices(t: pa.Table, urls: list[str]) -> pa.Array:
        """Row index per probed url (null = miss) via vectorized
        ``pc.index_in`` — replaces the per-bucket Python url→row dict."""
        return pc.index_in(
            pa.array(urls, type=pa.string()), value_set=t.column("url")
        ).cast(pa.int64())

    def prefetch(self, buckets: list[int]) -> int:
        """Warm the given bucket partitions (bucket-affinity), within the
        byte budget; buckets that don't fit stay in probe mode."""
        for b in buckets:
            if self._cache_nbytes >= self.cache_bytes:
                break
            self._lookup(int(b), [])
        return len(self._cache)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return self._empty_like(batch)
        urls = batch.column("url").to_pylist()
        bucket_col = batch.column("host_bucket").to_pylist()
        distinct = sorted(set(bucket_col))
        if self.redirects:
            urls = [self.resolve_redirects(u) for u in urls]
        retries, dead = self._flaky_info(urls)
        if len(distinct) == 1:
            # hot path (blocks are single-bucket by construction): zero-copy
            # null-aware take — html bytes never pass through Python objects,
            # and the probe itself is a vectorized Arrow index_in
            t = self._lookup(int(distinct[0]), urls)
            ind0 = self._probe_indices(t, urls)
            dead_arr = pa.array(dead, type=pa.bool_())
            indices = pc.if_else(dead_arr, pa.scalar(None, pa.int64()), ind0)
            html = t.column("html").take(indices).combine_chunks()
            ts = t.column("warc_ts").take(indices).combine_chunks()
            errs = pc.if_else(
                dead_arr, pa.scalar("timeout"),
                pc.if_else(pc.is_null(ind0), pa.scalar("fetch_miss"), pa.scalar("")),
            )
            return batch.append_column("html", html) \
                        .append_column("retrieved_ts", ts) \
                        .append_column("fetch_error", errs) \
                        .append_column("retry_count", pa.array(retries, type=pa.int32()))
        # general path: probe per bucket (ray_data engine batches may span);
        # html bytes move via null-aware takes, never through Python objects
        parts = []
        order = []
        for b in distinct:
            sel = [i for i, ub in enumerate(bucket_col) if ub == b]
            b_urls = [urls[i] for i in sel]
            t = self._lookup(int(b), b_urls)
            ind0 = self._probe_indices(t, b_urls)
            dead_b = pa.array([dead[i] for i in sel], type=pa.bool_())
            indices = pc.if_else(dead_b, pa.scalar(None, pa.int64()), ind0)
            errs = pc.if_else(
                dead_b, pa.scalar("timeout"),
                pc.if_else(pc.is_null(ind0), pa.scalar("fetch_miss"), pa.scalar("")),
            )
            parts.append(pa.table({
                "html": t.column("html").take(indices).combine_chunks(),
                "retrieved_ts": t.column("warc_ts").take(indices).combine_chunks(),
                "fetch_error": errs,
            }))
            order.extend(sel)
        merged = pa.concat_tables(parts)
        inv = pa.array(np.argsort(np.asarray(order)))
        merged = merged.take(inv)  # back to input row order
        return batch.append_column("html", merged.column("html")) \
                    .append_column("retrieved_ts", merged.column("retrieved_ts")) \
                    .append_column("fetch_error", merged.column("fetch_error")) \
                    .append_column("retry_count", pa.array(retries, type=pa.int32()))

    def _flaky_info(self, urls: list[str]) -> tuple[list[int], list[bool]]:
        """(retry_count, retries-exhausted) per url under the ≤3-timeout cap."""
        n = len(urls)
        retries = [0] * n
        dead = [False] * n
        if self.flaky:
            for i, u in enumerate(urls):
                k = self.flaky.get(u)
                if k:
                    if k <= self.MAX_TIMEOUT_RETRIES:
                        retries[i] = k
                    else:
                        retries[i] = self.MAX_TIMEOUT_RETRIES
                        dead[i] = True
        return retries, dead

    @staticmethod
    def _empty_like(batch: pa.Table) -> pa.Table:
        return batch.append_column("html", pa.array([], type=pa.binary())) \
                    .append_column("retrieved_ts", pa.array([], type=pa.timestamp("us"))) \
                    .append_column("fetch_error", pa.array([], type=pa.string())) \
                    .append_column("retry_count", pa.array([], type=pa.int32()))


def add_host_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Attach the engine-wide host-hash partition key."""
    import numpy as np

    h = hash_strings(batch.column("host"))
    col = pa.array((h % np.uint64(num_buckets)).astype(np.int32))
    if "host_bucket" in batch.column_names:
        return batch.set_column(
            batch.column_names.index("host_bucket"), "host_bucket", col
        )
    return batch.append_column("host_bucket", col)
