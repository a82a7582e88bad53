"""licenta_crawler_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch rebuild (NOT a port) of the data-processing capabilities of the
reference crawler ``mcdobr/licenta-crawler`` (see SURVEY.md):

- ``schemas``      — fixed pyarrow schemas for pages / frontier / visited /
                     lineage tables (upgrades the reference's dynamic Mongo
                     documents, SURVEY §1.4).
- ``functions``    — pure, deterministic kernels: html→text extraction (the
                     byte-identical north invariant), link/pagination/sitemap
                     extraction, URL scalar functions, priority encoding.
- ``state``        — sharded cuckoo-filter URL-seen actors + politeness /
                     robots gate (replaces ``CrawlDatabaseManager`` upsert
                     dedup, reference ``BrowserCrawler.java:145``).
- ``stages``       — Ray Data ``map_batches`` stages: fetch (url→html probe of
                     the pages Parquet), parse+extract, seen-filter.
- ``pipelines``    — the wave-loop crawl driver, plus the large-scale text /
                     dedup / similarity operator suite over generic tables.
- ``fixtures``     — deterministic synthetic Common-Crawl-style pages corpus
                     (seeded site graph; no external data).

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions are
owned by bench.py / CLI entry points / the test fixture.
"""

__version__ = "0.1.0"
