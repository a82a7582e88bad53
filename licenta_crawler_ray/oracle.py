"""Single-process oracle crawler — the executable spec (SURVEY §5.1).

Implements the reference's crawl semantics directly over the pages table,
serially, with zero Ray: the Ray wave-loop pipeline
(:mod:`licenta_crawler_ray.pipelines.crawl`) must produce an identical
visited table (same rows, same record ranks, byte-identical extracted text
per url) and identical URL-seen set.

Semantics reproduced (reference file:line):
- Strategy choice: sitemap if robots.txt advertises one, else browser
  (``CrawlJobResource.java:111-119``).
- Browser strategy: per seed, follow the pagination chain; per shelf record
  product URLs in document order then the shelf itself (referer = previous
  shelf) — ``BrowserCrawler.java:113-116,137,141-149``; products are
  *recorded*, not fetched (leaves), unless ``fetch_leaves=True`` (rebuild
  extension: leaf pages are fetched + text-extracted in the next wave).
- Sitemap strategy: strictly-FIFO queue over (possibly gzipped) sitemap
  documents, index documents re-enqueued, leaf page URLs recorded with the
  literal referer ``"sitemap"`` — ``SitemapSaxCrawler.java:52-91,82``.
- First-seen wins upsert-by-url dedup (``BrowserCrawler.java:145``).
- Robots disallow prefixes filter every candidate URL (rebuild makes core's
  [inferred] robots enforcement explicit); denied URLs are dropped, never
  recorded or seen-marked.

Record-rank encoding (total order of the serial record stream):
``rank = encode_priority(seed_idx, step, doc_order)`` where ``step`` is the
processing step of the *discovering* page (a shelf's own record uses
``doc_order = DOC_MAX`` so it sorts after its products, reproducing the
products-then-shelf batch order of ``BrowserCrawler.java:141-144``), and
sitemap-discovered pages use ``doc_order = sitemap_fifo_idx * 2**14 + j``.

Caveat (documented, frozen): with multiple seeds per job whose link graphs
overlap, first-seen attribution follows wave order (depth-major), which for
the reference's one-chain-per-seed model equals serial order; the URL-seen
SET is identical in all cases.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow.dataset as pads

from .functions.extract import (
    extract_next_page,
    extract_product_links,
    extract_text,
    parse_sitemap,
)
from .functions.urls import encode_priority, host_of_url, is_valid_http_url, same_host
from .state.politeness import RobotRules

DOC_MAX = (1 << 30) - 1  # must equal 2^urls._DOC_BITS - 1
# Sitemap FIFO slots are numbered hierarchically so they are computable
# locally under parallelism (no global counter): a child of the sitemap in
# slot m gets slot m*64 + idx; a page URL j of leaf sitemap (gen, m) gets
# record rank encode(0, gen, m * 2**14 + j). Caps (frozen): ≤64 children
# per index sitemap, ≤16384 page URLs per sitemap, slot < 2^16 — ENFORCED:
# children whose slot would reach the cap are dropped (both here and in the
# pipeline), so m * 2^14 + j always fits the 30-bit doc field of
# ``encode_priority`` and the encoded order equals true FIFO at any index
# nesting depth. The hierarchical numbering sorts identically to the
# reference's strict FIFO (generation-major, parent-order, child-order —
# ``SitemapSaxCrawler.java:53-77``).
SITEMAP_FANOUT = 64
SITEMAP_PAGE_CAP = 1 << 14
SITEMAP_SLOT_CAP = 1 << 16


MAX_TIMEOUT_RETRIES = 3  # reference retry cap (``BrowserCrawler.java:47,197``)


@dataclass
class VisitedRow:
    url: str
    host: str
    referer: str
    page_type: str
    seed_idx: int
    depth: int
    doc_order: int
    priority: int  # record rank
    fetched: bool
    error: str
    text: str
    retry_count: int = 0  # transient-failure retries spent (cap 3)


@dataclass
class OracleResult:
    visited: list[VisitedRow] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)

    def sorted_visited(self) -> list[VisitedRow]:
        return sorted(self.visited, key=lambda r: r.priority)


def load_pages_map(fixture_dir: str) -> dict[str, bytes]:
    """url → html for the whole fixture (oracle only — tiny scales)."""
    ds = pads.dataset(os.path.join(fixture_dir, "pages"), partitioning="hive")
    t = ds.to_table(columns=["url", "html"])
    return dict(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))


def load_jobs(fixture_dir: str) -> list[dict]:
    with open(os.path.join(fixture_dir, "jobs.json")) as f:
        return json.load(f)


def load_robots(fixture_dir: str) -> RobotRules:
    with open(os.path.join(fixture_dir, "robots.json")) as f:
        return RobotRules(json.load(f))


def load_redirects(fixture_dir: str) -> dict[str, str]:
    p = os.path.join(fixture_dir, "redirects.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def load_flaky(fixture_dir: str) -> dict[str, int]:
    """url → number of transient (timeout-class) failures before success."""
    p = os.path.join(fixture_dir, "flaky.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {u: int(k) for u, k in json.load(f).items()}


def resolve_redirects(url: str, redirects: dict[str, str], max_hops: int = 5) -> str:
    """≤5-hop redirect chase (``SitemapSaxCrawler.java:96-128``)."""
    from .functions.urls import absolutize

    for _ in range(max_hops):
        nxt = redirects.get(url)
        if nxt is None:
            return url
        url = absolutize(url, nxt)
    return url


def admit_job(job: dict) -> list[str]:
    """Validated seed list (``CrawlJobResource.java:97-100,121-139``)."""
    homepage = job["homepage"]
    if not is_valid_http_url(homepage):
        raise ValueError(f"invalid homepage: {homepage}")
    seeds = []
    for s in job.get("seeds", []):
        if not is_valid_http_url(s) or not same_host(s, homepage):
            raise ValueError(f"seed {s} invalid or not on host of {homepage}")
        seeds.append(s)
    return seeds


def crawl_oracle(
    fixture_dir: str,
    fetch_leaves: bool = False,
    max_depth: int = 1 << 19,
) -> OracleResult:
    """Serial reference crawl over every job in the fixture."""
    pages_raw = load_pages_map(fixture_dir)
    redirects = load_redirects(fixture_dir)
    flaky = load_flaky(fixture_dir)

    class _Pages:
        def fetch(self, url):
            """(html | None, error, retry_count) under the ≤3-timeout cap:
            k ≤ 3 transient failures are retried away (retry_count = k);
            k > 3 exhausts the budget → permanent ``timeout`` error."""
            u = resolve_redirects(url, redirects)
            k = flaky.get(u, 0)
            if k > MAX_TIMEOUT_RETRIES:
                return None, "timeout", MAX_TIMEOUT_RETRIES
            html = pages_raw.get(u)
            if html is None:
                return None, "fetch_miss", k
            return html, "", k

        def get(self, url):
            return self.fetch(url)[0]

    pages = _Pages()
    robots = load_robots(fixture_dir)
    jobs = load_jobs(fixture_dir)
    res = OracleResult()
    global_seed_idx = 0

    for job in jobs:
        homepage = job["homepage"]
        host = host_of_url(homepage)
        sitemaps = robots.sitemaps_for(host) + list(job.get("additionalSitemaps", []))
        if sitemaps:
            _crawl_sitemaps(pages, robots, host, sitemaps, global_seed_idx, res,
                            fetch_leaves)
            global_seed_idx += max(1, len(job.get("seeds", [])))
            continue
        for seed in admit_job(job):
            if not robots.allowed_one(seed, host):
                global_seed_idx += 1
                continue
            if seed not in res.seen:
                res.seen.add(seed)
                _crawl_chain(pages, robots, host, seed, global_seed_idx, res,
                             fetch_leaves, max_depth)
            global_seed_idx += 1
    return res


def _record_leaf(
    pages: dict[str, bytes],
    res: OracleResult,
    url: str,
    host: str,
    referer: str,
    page_type: str,
    seed_idx: int,
    depth: int,
    doc_order: int,
    rank: int,
    fetch_leaves: bool,
) -> None:
    if fetch_leaves:
        html, err, retry = pages.fetch(url)
        if html is None:
            res.visited.append(VisitedRow(url, host, referer, page_type, seed_idx,
                                          depth, doc_order, rank, False, err, "", retry))
        else:
            res.visited.append(VisitedRow(url, host, referer, page_type, seed_idx,
                                          depth, doc_order, rank, True, "",
                                          extract_text(html), retry))
    else:
        res.visited.append(VisitedRow(url, host, referer, page_type, seed_idx,
                                      depth, doc_order, rank, False, "", ""))


def _crawl_chain(
    pages: dict[str, bytes],
    robots: RobotRules,
    host: str,
    seed: str,
    seed_idx: int,
    res: OracleResult,
    fetch_leaves: bool,
    max_depth: int,
) -> None:
    url, referer, depth = seed, "", 0
    while url is not None and depth < max_depth:
        step = depth
        html, err, retry = pages.fetch(url)
        if html is None:
            res.visited.append(VisitedRow(url, host, referer, "shelf", seed_idx, depth,
                                          0, int(encode_priority(seed_idx, step, DOC_MAX)),
                                          False, err, "", retry))
            return
        text = extract_text(html)
        links = extract_product_links(html, url)
        for k, link in enumerate(links):
            if host_of_url(link) != host:  # standing same-domain scope filter (O5)
                continue
            if not robots.allowed_one(link, host):
                continue
            if link in res.seen:
                continue
            res.seen.add(link)
            _record_leaf(pages, res, link, host, url, "product", seed_idx, depth + 1,
                         k, int(encode_priority(seed_idx, step, k)), fetch_leaves)
        res.visited.append(VisitedRow(url, host, referer, "shelf", seed_idx, depth, 0,
                                      int(encode_priority(seed_idx, step, DOC_MAX)),
                                      True, "", text, retry))
        nxt = extract_next_page(html, url)
        if nxt is not None and (
            host_of_url(nxt) != host
            or not robots.allowed_one(nxt, host)
            or nxt in res.seen
        ):
            nxt = None
        if nxt is not None:
            res.seen.add(nxt)
        referer, url, depth = url, nxt, depth + 1


def _crawl_sitemaps(
    pages: dict[str, bytes],
    robots: RobotRules,
    host: str,
    sitemaps: list[str],
    seed_idx: int,
    res: OracleResult,
    fetch_leaves: bool,
) -> None:
    # FIFO queue of (url, generation, hierarchical fifo slot m)
    queue: list[tuple[str, int, int]] = []
    for m, sm in enumerate(sitemaps):
        if sm not in res.seen and robots.allowed_one(sm, host):
            res.seen.add(sm)
            queue.append((sm, 0, m))
    qi = 0
    while qi < len(queue):
        sm_url, gen, m = queue[qi]
        qi += 1
        data = pages.get(sm_url)
        if data is None:
            continue  # sitemap fetch-miss: job continues (SitemapSaxCrawler.java:42-49)
        try:
            result = parse_sitemap(data)
        except Exception:
            continue  # unknown format aborts this sitemap gracefully
        if result.is_index:
            for c, child in enumerate(result.urls[:SITEMAP_FANOUT]):
                if host_of_url(child) != host or not robots.allowed_one(child, host):
                    continue
                if child in res.seen:
                    continue
                cm = m * SITEMAP_FANOUT + c
                if cm >= SITEMAP_SLOT_CAP:
                    continue  # frozen cap: rank space exhausted for this branch
                res.seen.add(child)
                queue.append((child, gen + 1, cm))
        else:
            for j, page_url in enumerate(result.urls[:SITEMAP_PAGE_CAP]):
                if host_of_url(page_url) != host or not robots.allowed_one(page_url, host):
                    continue
                if page_url in res.seen:
                    continue
                res.seen.add(page_url)
                _record_leaf(
                    pages, res, page_url, host, "sitemap", "product", seed_idx, gen + 1, j,
                    int(encode_priority(seed_idx, gen, m * SITEMAP_PAGE_CAP + j)),
                    fetch_leaves,
                )
