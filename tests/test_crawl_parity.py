"""The north invariant: Ray pipeline ≡ single-process oracle (SURVEY §5.1).

(a) byte-identical extracted text per url, (b) identical final URL-seen
set, (c) identical visit order (record ranks) under the same seeds +
politeness budget.
"""

import os

import pyarrow as pa
import pytest

from licenta_crawler_ray.oracle import crawl_oracle
from licenta_crawler_ray.pipelines.crawl import CrawlPipeline


def _compare(fixture_dir, workdir, fetch_leaves, host_budget=64, **kw):
    pipe = CrawlPipeline(
        fixture_dir,
        workdir,
        fetch_leaves=fetch_leaves,
        host_budget=host_budget,
        **kw,
    )
    summary = pipe.run()
    got = pipe.visited_table()
    pipe.close()
    oracle = crawl_oracle(fixture_dir, fetch_leaves=fetch_leaves)
    exp_rows = oracle.sorted_visited()

    assert got.num_rows == len(exp_rows), (
        f"row count: ray={got.num_rows} oracle={len(exp_rows)}"
    )
    got_rows = got.to_pylist()
    for g, e in zip(got_rows, exp_rows):
        assert g["url"] == e.url
        assert g["priority"] == e.priority, (g["url"], g["priority"], e.priority)
        assert g["referer"] == e.referer, g["url"]
        assert g["page_type"] == e.page_type
        assert g["seed_idx"] == e.seed_idx
        assert g["depth"] == e.depth
        assert g["doc_order"] == e.doc_order
        assert g["fetched"] == e.fetched, (g["url"], g["error"], e.error)
        assert g["error"] == e.error
        assert g["retry_count"] == e.retry_count, g["url"]
        assert g["text"] == e.text, f"text mismatch for {g['url']}"  # byte-identical

    # URL-seen set equality: visited urls ∪ frontier-admitted == oracle seen
    assert summary["seen_count"] == len(oracle.seen)
    return summary


def test_parity_tiny_record_only(tiny_fixture, workdir):
    """Reference mode: products recorded, not fetched."""
    _compare(tiny_fixture, workdir, fetch_leaves=False)


def test_parity_tiny_fetch_leaves(tiny_fixture, workdir):
    """Rebuild extension: leaves fetched + text-extracted."""
    _compare(tiny_fixture, workdir, fetch_leaves=True)


def test_parity_budget_throttle(tiny_fixture, workdir):
    """A tight per-host budget changes wave count, never the output."""
    s1 = _compare(tiny_fixture, workdir + "-b3", fetch_leaves=True, host_budget=3)
    s2 = _compare(tiny_fixture, workdir + "-big", fetch_leaves=True, host_budget=1000)
    assert s1["waves"] > s2["waves"]
    assert s1["visited_rows"] == s2["visited_rows"]


def test_parity_crawl_delay_clock(tiny_fixture, workdir, tmp_path):
    """Crawl-delay spaces a host's fetch waves on the logical clock while
    the visited table (set, order, ranks, bytes) stays identical — oracle
    parity is checked against the delay-free single-process oracle, pinning
    the SURVEY §4 invariant that politeness never changes output."""
    import json
    import shutil

    from licenta_crawler_ray.pipelines.crawl import CrawlPipeline

    fix2 = str(tmp_path / "fixture_delay")
    shutil.copytree(tiny_fixture, fix2)
    with open(os.path.join(fix2, "robots.json")) as f:
        robots = json.load(f)
    slow_host = sorted(robots)[0]
    robots[slow_host]["crawl_delay"] = 2.0  # 1 fetch per 2 logical waves
    with open(os.path.join(fix2, "robots.json"), "w") as f:
        json.dump(robots, f)

    # oracle parity holds under delay (and the oracle knows nothing of it)
    s_delay = _compare(fix2, workdir + "-delay", fetch_leaves=True)
    s_plain = _compare(tiny_fixture, workdir + "-plain", fetch_leaves=True)
    assert s_delay["visited_rows"] == s_plain["visited_rows"]
    assert s_delay["waves"] > s_plain["waves"]  # fetches were spaced out

    # lineage records the throttling; both engines agree on the output
    p = CrawlPipeline(fix2, workdir + "-lin", fetch_leaves=True)
    p.run()
    t_wave = p.visited_table()
    assert sum(r.get("throttled", 0) for r in p.lineage) > 0
    p.close()
    b = CrawlPipeline(fix2, workdir + "-bkt", fetch_leaves=True, engine="bucket")
    b.run()
    t_bucket = b.visited_table()
    b.close()
    assert t_wave.equals(t_bucket)


def test_parity_small(small_fixture, workdir):
    _compare(small_fixture, workdir, fetch_leaves=True)


def test_retry_caps_as_data(small_fixture, workdir):
    """flaky.json urls: k ≤ 3 transient failures succeed with retry_count=k;
    k > 3 exhausts the reference's retry cap → error='timeout', retries=3."""
    pipe = CrawlPipeline(small_fixture, workdir, fetch_leaves=True)
    pipe.run()
    t = pipe.visited_table()
    pipe.close()
    rows = t.to_pylist()
    recovered = [r for r in rows if r["fetched"] and r["retry_count"] > 0]
    timed_out = [r for r in rows if r["error"] == "timeout"]
    assert recovered, "fixture should contain recovering flaky urls"
    assert all(1 <= r["retry_count"] <= 3 for r in recovered)
    assert timed_out, "fixture should contain retry-exhausted urls"
    assert all(r["retry_count"] == 3 and not r["fetched"] for r in timed_out)


@pytest.fixture(scope="session")
def deep_sitemap_fixture(tmp_path_factory):
    """3-level sitemap hierarchy (index → index → leaf): exercises the
    hierarchical FIFO slot numbering at slots ≥ 64·64, which the old 24-bit
    doc field could overflow into the depth bits."""
    import json
    import os

    import pyarrow.parquet as pq

    from licenta_crawler_ray.fixtures.gen import _sitemap_xml
    from licenta_crawler_ray.functions.extract import extract_text
    from licenta_crawler_ray.functions.urls import fnv1a64
    from licenta_crawler_ray.schemas import PAGES_SCHEMA

    d = str(tmp_path_factory.mktemp("deep_sitemap"))
    host = "deep.example.com"
    base = f"http://{host}"
    num_buckets = 4
    rows, ts = [], __import__("datetime").datetime(2018, 6, 1)

    def page(path, html, text=""):
        rows.append({"url": base + path, "warc_ts": ts, "html": html,
                     "text": text, "lang": "en"})

    # 18 mid indexes: leaf sitemap slots reach 17*64 = 1088 > 1024, i.e.
    # doc_order = slot * 2^14 exceeds the OLD 24-bit doc field — the exact
    # overflow this fixture exists to catch
    mid_urls = []
    for i in range(18):  # root index → 18 mid indexes
        leaf_urls = []
        for j in range(2):  # each mid index → 2 leaf sitemaps
            prod_urls = []
            for k in range(3):
                p = f"/product/{i}-{j}-{k}"
                html = f"<html><body><p>item {i} {j} {k}</p></body></html>".encode()
                page(p, html, extract_text(html))
                prod_urls.append(base + p)
            lp = f"/sitemap-leaf-{i}-{j}.xml"
            page(lp, _sitemap_xml(prod_urls))
            leaf_urls.append(base + lp)
        mp = f"/sitemap-mid-{i}.xml"
        page(mp, _sitemap_xml(leaf_urls, index=True))
        mid_urls.append(base + mp)
    page("/sitemap-root.xml", _sitemap_xml(mid_urls, index=True))

    b = fnv1a64(host) % num_buckets
    pdir = os.path.join(d, "pages", f"host_bucket={b}")
    os.makedirs(pdir)
    rows.sort(key=lambda r: r["url"])
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
                   os.path.join(pdir, "part-0.parquet"), row_group_size=64)
    with open(os.path.join(d, "jobs.json"), "w") as f:
        json.dump([{"homepage": base + "/", "seeds": [],
                    "additionalSitemaps": []}], f)
    with open(os.path.join(d, "robots.json"), "w") as f:
        json.dump({host: {"disallow": [],
                          "sitemaps": [base + "/sitemap-root.xml"]}}, f)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "gen_version": 0}, f)
    return d


@pytest.mark.parametrize("engine", ["bucket", "pool", "ray_data"])
def test_parity_three_level_sitemap(deep_sitemap_fixture, workdir, engine):
    """Deep index nesting: record ranks must still equal the serial FIFO —
    in every engine."""
    from licenta_crawler_ray.functions.urls import decode_priority

    s = _compare(deep_sitemap_fixture, workdir + engine, fetch_leaves=True,
                 engine=engine)
    assert s["visited_rows"] == 18 * 2 * 3
    oracle = crawl_oracle(deep_sitemap_fixture, fetch_leaves=True)
    max_doc = 0
    for r in oracle.sorted_visited():
        si, dep, doc = decode_priority(r.priority)
        assert int(dep) == r.depth - 1  # sitemap pages rank at discovery gen
        max_doc = max(max_doc, int(doc))
    assert max_doc >= (1 << 24)  # the fixture really exercises the old overflow
