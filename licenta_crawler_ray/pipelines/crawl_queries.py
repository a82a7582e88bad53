"""Crawl-pipeline results exposed as ``queries()`` entries.

The crawl operates on the synthetic Common-Crawl-style fixture (generated
deterministically under /tmp per ``BASELINE.json.input_hint`` — the driver
testdata has no pages table), so these entries have no DuckDB oracle and
the driver records rows-only checks; full value-level verification lives in
``tests/test_crawl_parity.py`` against the single-process oracle.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa

from ..fixtures.gen import SMALL, TINY, ensure_fixture
from ..pipelines.crawl import CrawlPipeline

_FIXTURE_FOR_SF = {"0.001": ("tiny", TINY), "0.01": ("small", SMALL)}


def _fixture_for(sf_dir: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    name, params = _FIXTURE_FOR_SF.get(sf, ("small", SMALL))
    d = f"/tmp/lcr_fixture_{name}"
    ensure_fixture(d, **params)
    return d


def _run(sf_dir: str, tag: str, **kw) -> CrawlPipeline:
    fixture = _fixture_for(sf_dir)
    wd = f"/tmp/lcr_query_runs/{os.path.basename(fixture)}-{tag}"
    shutil.rmtree(wd, ignore_errors=True)
    pipe = CrawlPipeline(fixture, wd, **kw)
    pipe.run()
    # release actors promptly (results are read back from the committed
    # checkpoint on disk; the next query should not wait on GC for CPUs)
    pipe.close()
    return pipe


def crawl_visited(sf_dir: str) -> pa.Table:
    """Full crawl (leaves fetched): visited table in record-rank order."""
    pipe = _run(sf_dir, "visited", fetch_leaves=True)
    return pipe.visited_table().drop_columns(["retrieved_ts"])


def crawl_visited_record_only(sf_dir: str) -> pa.Table:
    """Reference mode (products recorded, not fetched)."""
    pipe = _run(sf_dir, "record-only", fetch_leaves=False)
    return pipe.visited_table().drop_columns(["retrieved_ts"])


def crawl_url_seen(sf_dir: str) -> pd.DataFrame:
    """Final URL-seen set (sorted) — the north_rule's set invariant."""
    pipe = _run(sf_dir, "seen", fetch_leaves=True)
    urls = sorted(set(pipe.visited_table().column("url").to_pylist()))
    return pd.DataFrame({"url": urls})


def crawl_lineage(sf_dir: str) -> pd.DataFrame:
    """Per-wave lineage/metrics rows (checkpoint audit surface)."""
    pipe = _run(sf_dir, "lineage", fetch_leaves=True)
    return pd.DataFrame(pipe.lineage).drop(
        columns=["wall_sec", "gather_sec", "seen_sec", "blocks", "job_id"]
    )


def crawl_extracted_text(sf_dir: str) -> pa.Table:
    """Byte-exact extracted text per fetched url (the north invariant)."""
    pipe = _run(sf_dir, "extract", fetch_leaves=True)
    t = pipe.visited_table()
    mask = pa.compute.equal(t.column("fetched"), True)
    return t.filter(mask).select(["url", "text"])


def media_stats(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing demo (rows-only): decode/frame-sample the
    deterministic fake media corpus through ONE actor-pool ``map_batches``
    pass over binary columns (``stages/multimodal.py`` ``MediaDispatch``
    splits each batch by type and routes it to the matching decoder —
    round-2 verdict replaced three filtered corpus scans), then aggregate
    per media type. Deterministic for a given sf (row count scales)."""
    import ray.data as rd

    from ..stages.multimodal import MediaDispatch, synth_media_table

    n = 200 if "0.01" in sf_dir or "0.1" in sf_dir else 50
    units = (
        rd.from_arrow(synth_media_table(n))
        .map_batches(MediaDispatch, batch_format="pyarrow", batch_size=8,
                     concurrency=(1, 2))
        .to_pandas()
    )
    out = units.groupby("media_type", as_index=False).agg(
        n=("units", "size"), total_px_or_frames=("units", "sum")
    )
    return (
        out[["media_type", "n", "total_px_or_frames"]]
        .astype({"n": "int64", "total_px_or_frames": "int64"})
        .sort_values("media_type")
        .reset_index(drop=True)
    )
