"""Partitioned, resumable Parquet sinks (brief: "Resumable output").

Two layers:

- :func:`write_corpus_partitioned` — the resumable form for a
  LOW-CARDINALITY partition key (e.g. ``lang``): one output directory per
  key value, each written by a streaming ``write_parquet`` into a ``.tmp``
  dir and committed atomically by rename (the same tmp→rename contract as
  the crawl's wave/bucket checkpoints). A re-run skips committed
  partitions, so a killed job resumes at partition granularity and readers
  never observe half-written directories. Reads prune at the source: each
  partition pass pushes a parquet row filter, so only that key's row
  groups leave storage.

- For HIGH-cardinality keys, pre-bucket with a hash column and partition by
  the bucket (the engine-wide pattern); Ray's native
  ``write_parquet(partition_cols=...)`` remains available when atomicity
  per partition is not required.

The reference's sink was an unpartitioned Mongo upsert stream
(``CrawlDatabaseManager.upsertManyPages``, ``BrowserCrawler.java:145``);
partitioned+atomic output is the 100-TB replacement.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.compute as pc
import ray.data as rd

from ..io_utils import read_parquet_clean


def write_corpus_partitioned(
    sf_dir: str,
    out_dir: str,
    by: str = "lang",
    table: str = "documents",
    resume: bool = True,
) -> dict:
    """Write ``table`` partitioned by column ``by``; returns a summary dict.

    Layout: ``{out_dir}/{by}={value}/*.parquet`` + an empty ``_SUCCESS``
    marker per committed partition. ``resume=True`` skips partitions whose
    marker exists.
    """
    src = os.path.join(sf_dir, f"{table}.parquet")
    values = sorted(
        read_parquet_clean(src, columns=[by]).unique(by)
    )
    os.makedirs(out_dir, exist_ok=True)
    written, skipped = [], []
    for v in values:
        pdir = os.path.join(out_dir, f"{by}={v}")
        if resume and os.path.exists(os.path.join(pdir, "_SUCCESS")):
            skipped.append(v)
            continue
        tmp = pdir + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # half-written leftovers from a killed run
        ds = read_parquet_clean(src, filter=pc.field(by) == v)
        ds.write_parquet(tmp)  # streams block-by-block, one file per block
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        os.rename(tmp, pdir)  # atomic partition commit
        written.append(v)
    return {
        "out_dir": out_dir,
        "partition_key": by,
        "written": [str(v) for v in written],
        "skipped": [str(v) for v in skipped],
    }
