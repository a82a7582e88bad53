"""WARC-lite source format: round-trip + crawl-through-ingested-corpus."""

import os
import shutil

import pyarrow.dataset as pads
import pytest

from licenta_crawler_ray.sources.warc_lite import (
    ingest_warc_lite,
    read_archive,
    read_warc_lite,
    write_warc,
    write_warc_lite,
)


@pytest.mark.parametrize("writer", [write_warc_lite, write_warc],
                         ids=["warclite", "warc_gz"])
def test_warc_roundtrip(tiny_fixture, tmp_path, writer):
    """pages → archive segments → streamed read: identical url/html/ts,
    for both the lite framing and real WARC/1.0 gzip members."""
    warc = str(tmp_path / "warc")
    s = writer(os.path.join(tiny_fixture, "pages"), warc, records_per_file=64)
    assert s["segments"] >= 2
    back = read_archive(warc).to_pandas().sort_values("url").reset_index(drop=True)
    orig = (
        pads.dataset(os.path.join(tiny_fixture, "pages"), partitioning="hive")
        .to_table(columns=["url", "warc_ts", "html", "lang"])
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert len(back) == len(orig) == s["records"]
    assert (back["url"] == orig["url"]).all()
    assert (back["html"] == orig["html"]).all()
    assert (back["warc_ts"] == orig["warc_ts"]).all()
    assert (back["lang"] == orig["lang"]).all()


@pytest.mark.parametrize("writer", [write_warc_lite, write_warc],
                         ids=["warclite", "warc_gz"])
def test_crawl_over_ingested_warc_corpus(tiny_fixture, tmp_path, writer):
    """Full ingest story: archive → hive/sorted pages layout → the crawl
    over the ingested corpus equals the crawl over the original fixture."""
    import json

    from licenta_crawler_ray.pipelines.crawl import CrawlPipeline

    warc = str(tmp_path / "warc")
    writer(os.path.join(tiny_fixture, "pages"), warc, records_per_file=64)

    # assemble a fixture dir around the ingested pages
    fix2 = str(tmp_path / "fixture2")
    os.makedirs(fix2)
    s = ingest_warc_lite(warc, os.path.join(fix2, "pages"), num_buckets=16)
    assert s["written"] and not s["skipped"]
    # bucket partitions are written by WORKERS (groupby shuffle →
    # map_groups), never assembled in the driver process
    assert s["writer_pids"] and os.getpid() not in s["writer_pids"]
    for b in s["written"]:
        with open(os.path.join(fix2, "pages", f"host_bucket={b}", "_SUCCESS")) as f:
            marker = json.load(f)
        assert marker["writer_pid"] != os.getpid() and marker["rows"] > 0
    for f in ("jobs.json", "robots.json", "redirects.json", "flaky.json",
              "meta.json"):
        shutil.copy(os.path.join(tiny_fixture, f), os.path.join(fix2, f))

    a = CrawlPipeline(tiny_fixture, str(tmp_path / "job_a"), fetch_leaves=True)
    a.run()
    ta = a.visited_table()
    a.close()
    b = CrawlPipeline(fix2, str(tmp_path / "job_b"), fetch_leaves=True)
    b.run()
    tb = b.visited_table()
    b.close()
    assert ta.equals(tb)

    # resume: a second ingest skips every committed bucket partition
    s2 = ingest_warc_lite(warc, os.path.join(fix2, "pages"), num_buckets=16)
    assert not s2["written"] and s2["skipped"]


def test_cli_ingest(tiny_fixture, tmp_path):
    """`cli ingest` drives the archive→corpus path: summary JSON on stdout,
    resume skip on the second invocation."""
    import contextlib
    import io
    import json

    from licenta_crawler_ray.cli import main

    warc = str(tmp_path / "warc")
    write_warc(os.path.join(tiny_fixture, "pages"), warc, records_per_file=64)
    pages = str(tmp_path / "pages_cli")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["ingest", "--warc-dir", warc, "--pages-dir", pages,
                   "--num-cpus", "4"])
    assert rc == 0
    s = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert s["written"] and not s["skipped"] and s["rows"] > 0
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        rc2 = main(["ingest", "--warc-dir", warc, "--pages-dir", pages,
                    "--num-cpus", "4"])
    s2 = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert rc2 == 0 and not s2["written"] and s2["skipped"] == s["written"]


def test_read_documents_formats_agree(tmp_path):
    """parquet / jsonl / csv sources of the same corpus normalize to
    identical Datasets."""
    import json

    import pyarrow.parquet as pq

    from licenta_crawler_ray.sources.text_corpus import read_documents

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    rows = src.to_pylist()
    jdir = tmp_path / "docs_jsonl"; jdir.mkdir()
    with open(jdir / "part-0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cdir = tmp_path / "docs_csv"; cdir.mkdir()
    import csv

    with open(cdir / "part-0.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "lang"])
        w.writeheader()
        w.writerows(rows)
    pdir = tmp_path / "docs_parquet"; pdir.mkdir()
    pq.write_table(src, pdir / "part-0.parquet")

    frames = {}
    for name, d in (("parquet", pdir), ("jsonl", jdir), ("csv", cdir)):
        frames[name] = (
            read_documents(str(d)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
    assert frames["parquet"].equals(frames["jsonl"])
    assert frames["parquet"].equals(frames["csv"])
    assert len(frames["parquet"]) == src.num_rows


def test_warc_lite_bad_magic_raises(tmp_path):
    from licenta_crawler_ray.sources.warc_lite import parse_segment

    with pytest.raises(ValueError, match="magic"):
        parse_segment(b"NOT-A-WARC\n")
