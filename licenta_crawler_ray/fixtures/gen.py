"""Deterministic synthetic Common-Crawl-style ``pages`` corpus (FIXTURES.md §1).

Seeded site graph mirroring the reference's page taxonomy
(``PageType.SHELF``/``PRODUCT``, ``BrowserCrawler.java:137,142``; sitemap
discovery ``SitemapSaxCrawler.java:52-91``): per host a paginated shelf
chain whose shelves contain product blocks matching the reference's
extraction selector (class contains 'produ', has <img> and <a href> —
``BrowserCrawler.java:155``) plus a pagination <ul> (XPath at
``BrowserCrawler.java:43``); leaf product pages with sanitizer noise;
sitemap XML (some hosts gzip + index-expanded). Duplicate product links
across shelves exercise first-seen-wins dedup; a small fraction of linked
URLs have no pages row (fetch-miss path); a '/private/' slice exercises the
robots gate.

Same seed → same bytes. No external data. The ``text`` column is generated
with the SAME frozen kernel the pipeline uses
(:func:`licenta_crawler_ray.functions.extract.extract_text`) — the
byte-parity oracle by construction.

Output layout (hive-partitioned on the engine-wide host-hash key so fetch
probes prune to one bucket):
    {out_dir}/pages/host_bucket={b}/part-0.parquet   (rows sorted by url)
    {out_dir}/jobs.json      one crawl-job spec per host (schema per
                             ``CrawlJobResource.java:57-60``)
    {out_dir}/robots.json    per-host robots rules (disallow prefixes +
                             advertised sitemaps)
    {out_dir}/meta.json      generation parameters
"""

from __future__ import annotations

import gzip
import json
import os
import random
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_text
from ..functions.urls import fnv1a64
from ..schemas import PAGES_SCHEMA

_TLDS = ["com", "ro", "net"]
_WORDS = (
    "carte istorie roman poezie eseu filosofie stiinta arta muzica teatru "
    "copii aventura mister dragoste calatorie biografie clasic modern "
    "traducere original ilustrat cartonat brosat editie volum autor pagini"
).split()
_AUTHORS = (
    "Eminescu Creanga Caragiale Sadoveanu Rebreanu Eliade Cioran Ionesco "
    "Stanescu Blandiana Cartarescu Muller"
).split()

DEFAULT_NUM_BUCKETS = 16
# bump when generator output changes for the same params (ensure_fixture
# compares it, so stale /tmp fixtures regenerate)
GEN_VERSION = 4


def host_name(i: int) -> str:
    return f"shop{i:03d}.example.{_TLDS[i % len(_TLDS)]}"


def _ts(host: str, path: str) -> datetime:
    base = datetime(2018, 6, 1, tzinfo=timezone.utc).timestamp()
    off = fnv1a64(f"{host}{path}") % 86_400_000
    return datetime.fromtimestamp(base + off / 1000.0, tz=timezone.utc).replace(tzinfo=None)


def _product_html(rng: random.Random, host: str, j: int, desc_scale: int = 1) -> bytes:
    title = " ".join(rng.choice(_WORDS).capitalize() for _ in range(rng.randint(2, 5)))
    author = rng.choice(_AUTHORS)
    price = f"{rng.randint(10, 300)}.{rng.randint(0, 99):02d}"
    desc = " ".join(rng.choices(_WORDS, k=rng.randint(20, 60) * desc_scale))
    return (
        f"<!DOCTYPE html>\n<html><head><title>{title} - {host}</title>\n"
        f"<style>.price {{ color: red; }}</style>\n"
        f"<script>var tracker = {rng.randint(0, 10**9)};</script>\n"
        f"</head><body>\n"
        f"<!-- product page {j} -->\n"
        f"<noscript>Activeaza JavaScript</noscript>\n"
        f"<h1>{title}</h1>\n"
        f"<p class='author'>de <a href='/autor/{author.lower()}'>{author}</a></p>\n"
        f"<span class='price'>{price} lei</span>\n"
        f"<div class='descriere'><p>{desc}</p></div>\n"
        f"<a href='../shelf/0'>inapoi la raft</a>\n"
        f"</body></html>\n"
    ).encode("utf-8")


def _shelf_html(
    rng: random.Random,
    host: str,
    shelf_idx: int,
    num_shelves: int,
    product_hrefs: list[str],
) -> bytes:
    blocks = []
    for k, href in enumerate(product_hrefs):
        name = " ".join(rng.choice(_WORDS).capitalize() for _ in range(2))
        blocks.append(
            f"<div class='product-item produ-box'>\n"
            f"  <img src='/img/{shelf_idx}-{k}.jpg' alt='{name}'>\n"
            f"  <a href='{href}'>{name}</a>\n"
            f"  <span class='pret'>{rng.randint(10, 300)} lei</span>\n"
            f"</div>"
        )
    # pagination: active = current shelf; last shelf's successor is disabled
    lis = []
    for p in range(num_shelves):
        cls = " class='active'" if p == shelf_idx else ""
        lis.append(f"<li{cls}><a href='/shelf/{p}'>{p + 1}</a></li>")
    if shelf_idx == num_shelves - 1:
        lis.append("<li class='disabled'><a href='#'>&raquo;</a></li>")
    return (
        f"<!DOCTYPE html>\n<html><head><title>Raft {shelf_idx} - {host}</title>\n"
        f"<script type='text/javascript'>window.shelf={shelf_idx};</script>\n"
        f"</head><body>\n<h2>Raftul {shelf_idx + 1}</h2>\n"
        # wrapper class also contains 'produ' → exercises leaf-most narrowing
        f"<div class='produse-wrapper'>\n" + "\n".join(blocks) + "\n</div>\n"
        f"<ul class='pagination'>\n" + "\n".join(lis) + "\n</ul>\n"
        f"</body></html>\n"
    ).encode("utf-8")


def _sitemap_xml(urls: list[str], index: bool = False) -> bytes:
    tag = "sitemapindex" if index else "urlset"
    inner = "sitemap" if index else "url"
    locs = "\n".join(f"  <{inner}><loc>{u}</loc></{inner}>" for u in urls)
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<{tag} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n{locs}\n</{tag}>\n'
    ).encode("utf-8")


def generate(
    out_dir: str,
    num_hosts: int = 4,
    shelves_per_host: int = 5,
    products_per_shelf: int = 10,
    seed: int = 42,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    dup_fraction: float = 0.15,
    miss_fraction: float = 0.04,
    private_fraction: float = 0.04,
    sitemap_every: int = 4,
    desc_scale: int = 1,
) -> dict:
    """Generate the corpus; returns meta dict. Idempotent for a given seed."""
    rows: list[dict] = []
    jobs: list[dict] = []
    robots: dict[str, dict] = {}
    redirects: dict[str, str] = {}
    flaky: dict[str, int] = {}

    for hi in range(num_hosts):
        host = host_name(hi)
        base = f"http://{host}"
        hrng = random.Random(f"{seed}:{host}")
        n_products_total = shelves_per_host * products_per_shelf

        # --- product pages (a slice is missing → fetch-miss; a slice private)
        missing: set[int] = set()
        private: set[int] = set()
        for j in range(n_products_total):
            r = hrng.random()
            if r < miss_fraction:
                missing.add(j)
            elif r < miss_fraction + private_fraction:
                private.add(j)

        def product_path(j: int) -> str:
            return (f"/private/product/{j}" if j in private else f"/product/{j}")

        for j in range(n_products_total):
            if j in missing:
                continue
            prng = random.Random(f"{seed}:{host}:product:{j}")
            html = _product_html(prng, host, j, desc_scale)
            path = product_path(j)
            rows.append(
                {
                    "url": base + path,
                    "warc_ts": _ts(host, path),
                    "html": html,
                    "text": extract_text(html),
                    "lang": "ro" if hi % 3 != 2 else "en",
                }
            )

        # --- shelf chain; each shelf lists its K products (relative hrefs),
        # with some slots replaced by duplicates of earlier-shelf products
        for s in range(shelves_per_host):
            srng = random.Random(f"{seed}:{host}:shelf:{s}")
            hrefs = []
            for k in range(products_per_shelf):
                j = s * products_per_shelf + k
                if s > 0 and srng.random() < dup_fraction:
                    j = srng.randrange(0, s * products_per_shelf)  # dup edge
                hrefs.append(product_path(j))
            html = _shelf_html(srng, host, s, shelves_per_host, hrefs)
            path = f"/shelf/{s}"
            rows.append(
                {
                    "url": base + path,
                    "warc_ts": _ts(host, path),
                    "html": html,
                    "text": extract_text(html),
                    "lang": "ro" if hi % 3 != 2 else "en",
                }
            )

        # --- flaky urls (transient-failure counts → flaky.json): one product
        # that recovers within the ≤3-timeout retry cap and, on every third
        # host, one that exhausts it (permanent ``timeout`` error). Exercises
        # the retry-count-as-data contract (``BrowserCrawler.java:47,197``).
        existing = [j for j in range(n_products_total)
                    if j not in missing and j not in private]
        if existing:
            flaky[base + product_path(existing[0])] = 1 + hi % 3  # recovers
            if hi % 3 == 0 and len(existing) > 1:
                flaky[base + product_path(existing[1])] = 5  # exhausts cap

        # --- robots + sitemap strategy for every ``sitemap_every``-th host
        advertises_sitemap = sitemap_every > 0 and hi % sitemap_every == sitemap_every - 1
        # robots advertises /sitemap.xml which 30x-redirects (2 hops) to the
        # real index — exercising the redirect chase of the sitemap fetcher
        # (manual ≤5-hop loop, SitemapSaxCrawler.java:96-128)
        robots[host] = {
            "disallow": ["/private/"],
            "sitemaps": [f"{base}/sitemap.xml"] if advertises_sitemap else [],
        }
        if advertises_sitemap:
            redirects[f"{base}/sitemap.xml"] = f"{base}/sitemaps/index.xml"
            redirects[f"{base}/sitemaps/index.xml"] = f"{base}/sitemap-index.xml"

        if advertises_sitemap:
            # gzipped child sitemaps listed by a plain index (exercises O7+O8)
            child_urls = []
            all_products = [base + product_path(j) for j in range(n_products_total) if j not in missing]
            n_children = max(1, shelves_per_host // 2)
            chunk = (len(all_products) + n_children - 1) // max(1, n_children)
            for c in range(n_children):
                part = all_products[c * chunk: (c + 1) * chunk]
                if not part:
                    continue
                cpath = f"/sitemap-{c}.xml.gz"
                child_urls.append(base + cpath)
                gz = gzip.compress(_sitemap_xml(part), mtime=0)
                rows.append(
                    {
                        "url": base + cpath,
                        "warc_ts": _ts(host, cpath),
                        "html": gz,
                        "text": "",
                        "lang": "",
                    }
                )
            idx_xml = _sitemap_xml(child_urls, index=True)
            rows.append(
                {
                    "url": f"{base}/sitemap-index.xml",
                    "warc_ts": _ts(host, "/sitemap-index.xml"),
                    "html": idx_xml,
                    "text": "",
                    "lang": "",
                }
            )

        jobs.append(
            {
                "homepage": base + "/",
                "seeds": [f"{base}/shelf/0"],
                "additionalSitemaps": [],
                "disallowCookies": bool(hi % 2),
            }
        )

    # --- write hive-partitioned by host_bucket, sorted by url within bucket
    os.makedirs(out_dir, exist_ok=True)
    pages_dir = os.path.join(out_dir, "pages")
    buckets: dict[int, list[dict]] = {}
    for r in rows:
        host = r["url"].split("/")[2]
        b = fnv1a64(host) % num_buckets
        buckets.setdefault(b, []).append(r)
    for b, brows in sorted(buckets.items()):
        brows.sort(key=lambda r: r["url"])
        t = pa.Table.from_pylist(brows, schema=PAGES_SCHEMA)
        d = os.path.join(pages_dir, f"host_bucket={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "part-0.parquet"), row_group_size=2048)

    with open(os.path.join(out_dir, "jobs.json"), "w") as f:
        json.dump(jobs, f, indent=1)
    with open(os.path.join(out_dir, "robots.json"), "w") as f:
        json.dump(robots, f, indent=1)
    with open(os.path.join(out_dir, "redirects.json"), "w") as f:
        json.dump(redirects, f, indent=1)
    with open(os.path.join(out_dir, "flaky.json"), "w") as f:
        json.dump(flaky, f, indent=1)
    meta = {
        "gen_version": GEN_VERSION,
        "seed": seed,
        "num_hosts": num_hosts,
        "shelves_per_host": shelves_per_host,
        "products_per_shelf": products_per_shelf,
        "num_buckets": num_buckets,
        "rows": len(rows),
        "sitemap_every": sitemap_every,
        "desc_scale": desc_scale,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def ensure_fixture(out_dir: str, **kwargs) -> dict:
    """Generate only if absent (same seed → same bytes, so presence = done)."""
    meta_path = os.path.join(out_dir, "meta.json")
    want = dict(kwargs, gen_version=GEN_VERSION)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            have = json.load(f)
        if all(have.get(k) == v for k, v in want.items()):
            return have
    return generate(out_dir, **kwargs)


TINY = dict(num_hosts=4, shelves_per_host=5, products_per_shelf=10)
SMALL = dict(num_hosts=20, shelves_per_host=8, products_per_shelf=12)
# bench corpus: more host buckets than any pool size so bucket-affinity
# routing can use the whole pool (parallelism ≤ #buckets); short chains
# (few waves → less fixed per-wave cost) with wide shelves and heavy pages
# so per-wave compute dominates scheduling overhead at both CPU levels
BENCH = dict(num_hosts=384, shelves_per_host=4, products_per_shelf=60,
             num_buckets=256, desc_scale=32)

if __name__ == "__main__":
    import sys

    scale = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/lcr_fixture_{scale}"
    params = {"tiny": TINY, "small": SMALL, "bench": BENCH}[scale]
    print(json.dumps(generate(out, **params)))
