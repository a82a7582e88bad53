"""The north invariant: Ray pipeline ≡ single-process oracle (SURVEY §5.1).

(a) byte-identical extracted text per url, (b) identical final URL-seen
set, (c) identical visit order (record ranks) under the same seeds +
politeness budget.
"""

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


def test_parity_small(small_fixture, workdir):
    _compare(small_fixture, workdir, fetch_leaves=True)
