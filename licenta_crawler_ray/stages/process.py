"""Parse + sanitize + extract stage (SURVEY §2.2 O1-O4, O7-O8).

Stateless ``map_batches`` transform over fetched Arrow batches. Per page
type it applies the frozen kernels from
:mod:`licenta_crawler_ray.functions.extract` and emits one combined Arrow
table tagged by ``kind``:

- ``kind='visited'`` — record rows for fetched pages (shelves always; leaf
  products when ``fetch_leaves``; sitemap *documents are never recorded*,
  matching ``SitemapSaxCrawler.java:79-87`` which upserts only page URLs).
- ``kind='candidate'`` — discovered URLs: product links in document order
  (``BrowserCrawler.java:153-164``), the pagination successor
  (``BrowserCrawler.java:172-194``), sitemap children / page URLs
  (``SitemapSaxCrawler.java:69-87``), already filtered by the same-host
  scope rule (O5) and robots disallow rules (broadcast small side — one
  ``ray.get`` per worker, never per batch).

Record-rank scheme: see :mod:`licenta_crawler_ray.oracle` (the executable
spec); both use ``encode_priority`` with the same step/doc_order rules, so
parallel execution reproduces the serial record order exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.extract import (
    extract_next_page,
    extract_product_links,
    extract_text,
    parse_sitemap,
)
from ..functions.urls import encode_priority, host_of_url
from ..oracle import DOC_MAX, SITEMAP_FANOUT, SITEMAP_PAGE_CAP, SITEMAP_SLOT_CAP
from ..state.politeness import RobotRules

_OUT_FIELDS = [
    ("kind", pa.string()),
    ("url", pa.string()),
    ("host", pa.string()),
    ("referer", pa.string()),
    ("page_type", pa.string()),
    ("seed_idx", pa.int32()),
    ("depth", pa.int32()),
    ("doc_order", pa.int64()),
    ("priority", pa.int64()),
    ("fetched", pa.bool_()),
    ("error", pa.string()),
    ("text", pa.string()),
    ("retrieved_ts", pa.timestamp("us")),
    ("retry_count", pa.int32()),  # transient-failure retries spent (cap 3)
]
OUT_SCHEMA = pa.schema([pa.field(n, t) for n, t in _OUT_FIELDS])


class ProcessPage:
    """Callable for ``map_batches`` (stateless task or actor pool).

    Holds only the broadcast robots rules + flags — cheap enough for task
    compute; written as a class so the robots ref resolves once per worker.
    """

    def __init__(self, rules_ref, fetch_leaves: bool, enrich: bool = False):
        self.rules: RobotRules = (
            ray.get(rules_ref) if not isinstance(rules_ref, RobotRules) else rules_ref
        )
        self.fetch_leaves = fetch_leaves
        self.enrich = enrich
        if enrich:
            from ..functions.enrich import TextEnricher

            self.enricher = TextEnricher()

    def _append_enrichment(self, out: pa.Table) -> pa.Table:
        """Annotate fetched visited rows with ingest-time analysis columns
        (token/quality counts, lang-id, simhash, fingerprint); null for
        candidates and unfetched records."""
        import pyarrow.compute as pc

        from ..functions.enrich import ENRICH_FIELDS, null_enrichment

        n = out.num_rows
        mask = pc.and_(pc.equal(out.column("kind"), "visited"), out.column("fetched"))
        mask_np = mask.to_numpy(zero_copy_only=False).astype(bool)
        idx = np.nonzero(mask_np)[0]
        cols = null_enrichment(n)
        if len(idx):
            texts = out.column("text").take(pa.array(idx)).to_pylist()
            enr = self.enricher.enrich(texts)
            for name, typ in ENRICH_FIELDS:
                src = enr[name]
                if len(idx) == n:
                    cols[name] = src  # whole batch enriched — no scatter
                elif pa.types.is_integer(typ):
                    vals = np.zeros(n, dtype=np.int64)
                    vals[idx] = src.to_numpy()
                    cols[name] = pa.array(vals, mask=~mask_np)
                else:
                    strs = np.empty(n, dtype=object)
                    strs[idx] = src.to_pylist()
                    cols[name] = pa.array(strs, type=typ)
        for name, _ in ENRICH_FIELDS:
            out = out.append_column(name, cols[name])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # fast path: leaf-product rows (the bulk of a crawl) need only
        # text extraction — no link/pagination/sitemap parsing and no
        # per-row emit bookkeeping; assemble their output table directly
        # from arrays and run the row loop only for shelves/sitemaps
        is_product = pc.equal(batch.column("page_type"), "product")
        products = batch.filter(is_product)
        rest = batch.filter(pc.invert(is_product))
        parts = []
        if products.num_rows:
            parts.append(self._products_table(products))
        if rest.num_rows:
            parts.append(self._rows_table(rest))
        if not parts:
            out = pa.Table.from_pylist([], schema=OUT_SCHEMA)
        else:
            out = pa.concat_tables(parts)
        if self.enrich:
            out = self._append_enrichment(out)
        return out

    def _products_table(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        htmls = batch.column("html").to_pylist()
        ferr = batch.column("fetch_error").to_pylist()
        miss = [bool(e) for e in ferr]
        texts = pa.array(
            ["" if (m or h is None) else extract_text(h) for m, h in zip(miss, htmls)],
            type=pa.string(),
        )
        fetched = pa.array([not m for m in miss])
        errors = pa.array(ferr, type=pa.string())  # '' | fetch_miss | timeout
        ts = pa.compute.if_else(
            pa.array(miss), pa.nulls(n, pa.timestamp("us")), batch.column("retrieved_ts")
        )
        return pa.table(
            {
                "kind": pa.array(["visited"] * n, type=pa.string()),
                "url": batch.column("url"),
                "host": batch.column("host"),
                "referer": batch.column("referer"),
                "page_type": batch.column("page_type"),
                "seed_idx": batch.column("seed_idx"),
                "depth": batch.column("depth"),
                "doc_order": batch.column("doc_order"),
                "priority": batch.column("priority"),
                "fetched": fetched,
                "error": errors,
                "text": texts,
                "retrieved_ts": ts,
                "retry_count": batch.column("retry_count"),
            }
        ).cast(OUT_SCHEMA)

    def _rows_table(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n, _ in _OUT_FIELDS}

        def emit(kind, url, host, referer, page_type, seed_idx, depth, doc_order,
                 priority, fetched, error, text, ts, retry=0):
            cols["kind"].append(kind)
            cols["url"].append(url)
            cols["host"].append(host)
            cols["referer"].append(referer)
            cols["page_type"].append(page_type)
            cols["seed_idx"].append(seed_idx)
            cols["depth"].append(depth)
            cols["doc_order"].append(doc_order)
            cols["priority"].append(priority)
            cols["fetched"].append(fetched)
            cols["error"].append(error)
            cols["text"].append(text)
            cols["retrieved_ts"].append(ts)
            cols["retry_count"].append(retry)

        rows = batch.to_pylist()
        for r in rows:
            url, host = r["url"], r["host"]
            ptype = r["page_type"]
            seed_idx, depth = int(r["seed_idx"]), int(r["depth"])
            miss = bool(r["fetch_error"])
            html = r["html"]
            ts = r["retrieved_ts"]
            retry = int(r.get("retry_count") or 0)

            if ptype == "shelf":
                step = depth
                if miss:
                    # chain ends; recorded with the error as data (SURVEY §4)
                    emit("visited", url, host, r["referer"], "shelf", seed_idx,
                         depth, 0, int(encode_priority(seed_idx, step, DOC_MAX)),
                         False, r["fetch_error"], "", None, retry)
                    continue
                text = extract_text(html)
                emit("visited", url, host, r["referer"], "shelf", seed_idx, depth,
                     0, int(encode_priority(seed_idx, step, DOC_MAX)), True, "",
                     text, ts, retry)
                for k, link in enumerate(extract_product_links(html, url)):
                    if host_of_url(link) != host:
                        continue
                    if not self.rules.allowed_one(link, host):
                        continue
                    emit("candidate", link, host, url, "product", seed_idx,
                         depth + 1, k, int(encode_priority(seed_idx, step, k)),
                         False, "", "", None)
                nxt = extract_next_page(html, url)
                if nxt is not None and host_of_url(nxt) == host and self.rules.allowed_one(nxt, host):
                    emit("candidate", nxt, host, url, "shelf", seed_idx, depth + 1,
                         0, int(encode_priority(seed_idx, depth + 1, DOC_MAX)),
                         False, "", "", None)

            elif ptype == "product":
                # leaf fetch (rebuild extension); rank fixed at discovery
                if miss:
                    emit("visited", url, host, r["referer"], "product", seed_idx,
                         depth, int(r["doc_order"]), int(r["priority"]),
                         False, r["fetch_error"], "", None, retry)
                else:
                    emit("visited", url, host, r["referer"], "product", seed_idx,
                         depth, int(r["doc_order"]), int(r["priority"]),
                         True, "", extract_text(html), ts, retry)

            elif ptype == "sitemap":
                if miss:
                    continue  # job continues (SitemapSaxCrawler.java:42-49)
                gen = depth
                m = int(r["doc_order"])  # hierarchical FIFO slot
                try:
                    result = parse_sitemap(html)
                except Exception:
                    continue
                if result.is_index:
                    for c, child in enumerate(result.urls[:SITEMAP_FANOUT]):
                        if host_of_url(child) != host or not self.rules.allowed_one(child, host):
                            continue
                        cm = m * SITEMAP_FANOUT + c
                        if cm >= SITEMAP_SLOT_CAP:
                            continue  # frozen slot cap (see oracle.py) — keeps
                            # m * 2^14 + j inside the 30-bit doc field
                        emit("candidate", child, host, url, "sitemap", seed_idx,
                             gen + 1, cm,
                             int(encode_priority(seed_idx, gen + 1, cm)),
                             False, "", "", None)
                else:
                    for j, page_url in enumerate(result.urls[:SITEMAP_PAGE_CAP]):
                        if host_of_url(page_url) != host or not self.rules.allowed_one(page_url, host):
                            continue
                        emit("candidate", page_url, host, "sitemap", "product",
                             seed_idx, gen + 1, j,
                             int(encode_priority(seed_idx, gen, m * SITEMAP_PAGE_CAP + j)),
                             False, "", "", None)
            else:
                raise ValueError(f"unknown page_type {ptype!r}")

        arrays = [pa.array(cols[n], type=t) for n, t in _OUT_FIELDS]
        return pa.Table.from_arrays(arrays, schema=OUT_SCHEMA)


def first_wins(group) -> "object":
    """In-wave exact dedup: keep the lowest-rank occurrence of each URL.

    Used as ``candidates.groupby("url").map_groups(first_wins,
    batch_format="pandas")`` — the Ray-native hash-partitioned equivalent of
    the reference's upsert-by-url (``BrowserCrawler.java:145``) within one
    wave; cross-wave dedup is the cuckoo seen-set.
    """
    idx = np.argmin(group["priority"].to_numpy())
    return group.iloc[idx : idx + 1]
