"""Engine-path equivalence + checkpoint/resume (SURVEY §5.3-§5.4)."""

import pyarrow as pa
import pytest

from licenta_crawler_ray.oracle import crawl_oracle
from licenta_crawler_ray.pipelines.crawl import CrawlPipeline


def _visited(fixture, workdir, fetch_leaves=True, **kw):
    p = CrawlPipeline(fixture, workdir, fetch_leaves=fetch_leaves, **kw)
    p.run()
    t = p.visited_table()
    p.close()
    return t


def test_ray_data_engine_matches_pool(tiny_fixture, tmp_path):
    a = _visited(tiny_fixture, str(tmp_path / "pool"), engine="pool")
    b = _visited(tiny_fixture, str(tmp_path / "rd"), engine="ray_data")
    assert a.to_pylist() == b.to_pylist()


def test_ray_data_distributed_dedup_matches(tiny_fixture, tmp_path):
    a = _visited(tiny_fixture, str(tmp_path / "pool"), engine="pool")
    c = _visited(tiny_fixture, str(tmp_path / "rdd"), engine="ray_data_distributed")
    assert a.to_pylist() == c.to_pylist()


def test_kill_and_resume_equals_uninterrupted(small_fixture, tmp_path):
    wd = str(tmp_path / "killed")
    p1 = CrawlPipeline(small_fixture, wd, fetch_leaves=True)
    p1.run(max_waves=3)  # simulate a kill after wave 2's commit
    p1.close()

    p2 = CrawlPipeline(small_fixture, wd, fetch_leaves=True)
    p2.run(resume=True)
    got = p2.visited_table()
    p2.close()

    oracle = crawl_oracle(small_fixture, fetch_leaves=True)
    exp = oracle.sorted_visited()
    assert got.num_rows == len(exp)
    for g, e in zip(got.to_pylist(), exp):
        assert g["url"] == e.url and g["priority"] == e.priority
        assert g["text"] == e.text


def test_resume_noop_when_complete(tiny_fixture, tmp_path):
    wd = str(tmp_path / "full")
    p1 = CrawlPipeline(tiny_fixture, wd, fetch_leaves=True)
    p1.run()
    n1 = p1.visited_table().num_rows
    p1.close()
    p2 = CrawlPipeline(tiny_fixture, wd, fetch_leaves=True)
    p2.run(resume=True)
    n2 = p2.visited_table().num_rows
    p2.close()
    assert n2 == n1


def test_bucket_engine_matches_pool(tiny_fixture, tmp_path):
    a = _visited(tiny_fixture, str(tmp_path / "pool"), engine="pool")
    d = _visited(tiny_fixture, str(tmp_path / "bk"), engine="bucket")
    assert a.to_pylist() == d.to_pylist()


@pytest.mark.parametrize("fetch_leaves", [True, False])
def test_enriched_engines_match(tiny_fixture, tmp_path, fetch_leaves):
    """Enrichment columns (incl. null-filled discovery-only rows) must be
    identical across engines — guards the per-engine visited-schema
    assembly (fetched parts vs record-only parts vs retry columns)."""
    a = _visited(tiny_fixture, str(tmp_path / f"pool{fetch_leaves}"),
                 engine="pool", enrich=True, fetch_leaves=fetch_leaves)
    b = _visited(tiny_fixture, str(tmp_path / f"bk{fetch_leaves}"),
                 engine="bucket", enrich=True, fetch_leaves=fetch_leaves)
    assert a.column_names == b.column_names
    assert {"n_tokens", "simhash", "fingerprint", "retry_count"} <= set(a.column_names)
    assert a.to_pylist() == b.to_pylist()


def test_bucket_engine_workdir_on_second_filesystem(tiny_fixture, tmp_path):
    """Cluster-seam smoke (COVERAGE.md second-node table): the checkpoint
    workdir lives on a DIFFERENT filesystem mount (/dev/shm tmpfs) than
    the fixture corpus, proving the commit path (worker-side part writes,
    atomic tmp→rename, resume scan) never assumes fixture and workdir
    share a device — the shared-FS swap is a mount point, not a rewrite."""
    import os
    import shutil
    import uuid

    if os.stat("/dev/shm").st_dev == os.stat(tiny_fixture).st_dev:
        pytest.skip("no second filesystem mount available")
    wd = f"/dev/shm/lcr_seam_{uuid.uuid4().hex[:8]}"
    try:
        p1 = CrawlPipeline(tiny_fixture, wd, fetch_leaves=True, engine="bucket")
        p1.run()
        full = p1.visited_table()
        p1.close()
        # kill one committed bucket partition and resume across the mount
        victims = sorted(d for d in os.listdir(wd) if d.startswith("bucket-"))[:1]
        for v in victims:
            shutil.rmtree(os.path.join(wd, v))
        p2 = CrawlPipeline(tiny_fixture, wd, fetch_leaves=True, engine="bucket")
        s = p2.run(resume=True)
        got = p2.visited_table()
        p2.close()
        assert s["buckets"] == len(victims)
        assert got.to_pylist() == full.to_pylist()
        exp = crawl_oracle(tiny_fixture, fetch_leaves=True).sorted_visited()
        assert got.num_rows == len(exp)
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def test_bucket_engine_resume_skips_committed(small_fixture, tmp_path):
    import shutil
    import os

    wd = str(tmp_path / "bkr")
    p1 = CrawlPipeline(small_fixture, wd, fetch_leaves=True, engine="bucket")
    p1.run()
    full = p1.visited_table()
    p1.close()
    # simulate a killed run: two bucket partitions never committed
    victims = sorted(d for d in os.listdir(wd) if d.startswith("bucket-"))[:2]
    for v in victims:
        shutil.rmtree(os.path.join(wd, v))
    p2 = CrawlPipeline(small_fixture, wd, fetch_leaves=True, engine="bucket")
    s = p2.run(resume=True)
    got = p2.visited_table()
    p2.close()
    assert s["buckets"] == len(victims)  # only the missing partitions re-ran
    assert got.to_pylist() == full.to_pylist()
