"""Fixed Arrow schemas for every logical table in the engine.

The reference persisted dynamic Mongo documents (``ObjectNode`` in,
POJO→BSON out — ``ObjectMapperProvider.java:16-20``); the rebuild pins
columnar schemas per SURVEY.md §1.4 and ``BASELINE.json.input_hint``.
"""

from __future__ import annotations

import pyarrow as pa

# Input corpus — Common-Crawl-style pages table (input_hint is authoritative).
# ``html`` replaces the live network: fetch = lookup url→html in this table.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),  # oracle extraction output; validation only
        pa.field("lang", pa.string()),
    ]
)

# The explicit, spillable form of what Mongo held implicitly (SURVEY §1.3/§1.4).
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("referer", pa.string()),
        pa.field("page_type", pa.string()),  # shelf | product | sitemap
        pa.field("depth", pa.int32()),
        pa.field("seed_idx", pa.int32()),
        pa.field("doc_order", pa.int64()),
        pa.field("priority", pa.int64()),  # encoded (seed_idx, depth, doc_order)
    ]
)

# Crawl output — replaces Mongo ``Page`` upserts (``BrowserCrawler.java:137-145``).
VISITED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("referer", pa.string()),
        pa.field("page_type", pa.string()),
        pa.field("seed_idx", pa.int32()),
        pa.field("depth", pa.int32()),
        pa.field("doc_order", pa.int64()),
        pa.field("priority", pa.int64()),
        pa.field("fetched", pa.bool_()),  # False = recorded-only (products) or miss
        pa.field("error", pa.string()),  # fetch-miss / robots-denied reason, '' = ok
        pa.field("text", pa.string()),  # extracted text for fetched pages, '' otherwise
        pa.field("retrieved_ts", pa.timestamp("us")),
        # transient-failure retries spent (≤3, BrowserCrawler.java:47,197);
        # error='timeout' when the budget was exhausted
        pa.field("retry_count", pa.int32()),
    ]
)

# Per-wave, per-partition lineage + metrics rows (north_rule checkpoint surface).
LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("job_id", pa.string()),
        pa.field("wave", pa.int32()),
        pa.field("urls_in", pa.int64()),
        pa.field("fetched", pa.int64()),
        pa.field("recorded", pa.int64()),
        pa.field("links_extracted", pa.int64()),
        pa.field("dedup_hits", pa.int64()),
        pa.field("frontier_out", pa.int64()),
        pa.field("wall_sec", pa.float64()),
    ]
)

PAGE_TYPE_SHELF = "shelf"
PAGE_TYPE_PRODUCT = "product"
PAGE_TYPE_SITEMAP = "sitemap"
