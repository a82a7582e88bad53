"""WARC-lite source — a Common-Crawl-style archive format + Ray-native ingest.

Real web corpora arrive as WARC archives, not Parquet. This module defines
a minimal deterministic framing ("WARC-lite") with the same shape — length-
prefixed records of headers + raw payload bytes concatenated into segment
files — and the two halves a production pipeline needs:

- :func:`write_warc_lite` — export a pages table into N segment files
  (fixture/export side; also how tests fabricate archives).
- :func:`read_warc_lite` — a streaming Ray Dataset over archives:
  ``read_binary_files`` (one record batch per segment) → a ``flat_map``-
  style parse stage emitting PAGES_SCHEMA batches. Segments parse
  independently, so ingest parallelism = number of segment files — the
  standard WARC processing shape.
- :func:`ingest_warc_lite` — archives → the engine's hive-partitioned,
  sorted-by-url pages layout (``host_bucket={b}/``), the physical design
  every fetch probe relies on. Ingest is resumable per bucket partition
  (same atomic tmp→rename contract as the corpus sink).

Record framing (all ASCII headers, payload raw)::

    WARC-LITE/1\n
    url: <absolute url>\n
    ts: <iso8601 microseconds>\n
    lang: <tag or empty>\n
    content-length: <payload bytes>\n
    \n
    <payload>\n
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.urls import hash_strings, host_of_url
from ..schemas import PAGES_SCHEMA

MAGIC = b"WARC-LITE/1\n"


def _format_record(url: str, ts, lang: str, payload: bytes) -> bytes:
    ts_s = ts.isoformat() if isinstance(ts, datetime) else str(ts)
    head = (
        f"url: {url}\nts: {ts_s}\nlang: {lang or ''}\n"
        f"content-length: {len(payload)}\n\n"
    ).encode()
    return MAGIC + head + payload + b"\n"


def write_warc_lite(pages_dir: str, out_dir: str, records_per_file: int = 512) -> dict:
    """Export a hive-partitioned pages corpus into WARC-lite segment files."""
    t = pads.dataset(pages_dir, partitioning="hive").to_table(
        columns=["url", "warc_ts", "html", "lang"]
    )
    order = np.argsort(np.asarray(t.column("url").to_pylist(), dtype=object))
    t = t.take(pa.array(order))
    os.makedirs(out_dir, exist_ok=True)
    n_files = 0
    for start in range(0, t.num_rows, records_per_file):
        chunk = t.slice(start, records_per_file)
        buf = b"".join(
            _format_record(u, ts, lang, payload)
            for u, ts, lang, payload in zip(
                chunk.column("url").to_pylist(),
                chunk.column("warc_ts").to_pylist(),
                chunk.column("lang").to_pylist(),
                chunk.column("html").to_pylist(),
            )
        )
        with open(os.path.join(out_dir, f"segment-{n_files:05d}.warclite"), "wb") as f:
            f.write(buf)
        n_files += 1
    return {"out_dir": out_dir, "records": t.num_rows, "segments": n_files}


def parse_segment(data: bytes) -> pa.Table:
    """One segment file → PAGES_SCHEMA table (text column empty: extraction
    is the pipeline's job, not the source's)."""
    urls, tss, htmls, langs = [], [], [], []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos: pos + len(MAGIC)] != MAGIC:
            raise ValueError(f"bad WARC-lite magic at byte {pos}")
        pos += len(MAGIC)
        head_end = data.index(b"\n\n", pos)
        headers = dict(
            line.split(": ", 1)
            for line in data[pos:head_end].decode().split("\n")
        )
        pos = head_end + 2
        clen = int(headers["content-length"])
        payload = data[pos: pos + clen]
        pos += clen + 1  # trailing \n
        urls.append(headers["url"])
        tss.append(datetime.fromisoformat(headers["ts"]))
        langs.append(headers.get("lang", ""))
        htmls.append(payload)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array([""] * len(urls), type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    ).cast(PAGES_SCHEMA)


def read_warc_lite(warc_dir: str) -> rd.Dataset:
    """Streaming Dataset of PAGES_SCHEMA rows over a WARC-lite archive dir."""

    def parse(batch: dict) -> pa.Table:
        tables = [parse_segment(bytes(b)) for b in batch["bytes"]]
        return pa.concat_tables(tables) if tables else PAGES_SCHEMA.empty_table()

    return rd.read_binary_files(warc_dir, file_extensions=["warclite"]).map_batches(
        parse, batch_format="numpy", batch_size=1
    )


def ingest_warc_lite(
    warc_dir: str, pages_dir: str, num_buckets: int = 16, resume: bool = True
) -> dict:
    """Archives → the engine's corpus layout: hive ``host_bucket={b}/``
    partitions, rows sorted by url, small row groups (url min/max statistics
    prune fetch probes). Resumable per bucket (atomic tmp→rename + marker).
    """
    import shutil

    ds = read_warc_lite(warc_dir)

    def tag(t: pa.Table) -> pa.Table:
        hosts = pa.array([host_of_url(u) for u in t.column("url").to_pylist()])
        b = (hash_strings(hosts) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("host_bucket", pa.array(b))

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()
    os.makedirs(pages_dir, exist_ok=True)
    written, skipped = [], []
    for b in range(num_buckets):
        pdir = os.path.join(pages_dir, f"host_bucket={b}")
        if resume and os.path.exists(os.path.join(pdir, "_SUCCESS")):
            skipped.append(b)
            continue
        import ray

        part = tagged.filter(expr=f"host_bucket == {b}").drop_columns(["host_bucket"])
        # empty post-filter blocks can carry a degenerate schema — keep only
        # non-empty ones, normalized to the pages schema
        chunks = [
            x.select(PAGES_SCHEMA.names).cast(PAGES_SCHEMA)
            for x in ray.get(part.to_arrow_refs())
            if x.num_rows
        ]
        if not chunks:
            continue
        t = pa.concat_tables(chunks)
        idx = pa.compute.sort_indices(t, sort_keys=[("url", "ascending")])
        t = t.take(idx)
        tmp = pdir + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(t.cast(PAGES_SCHEMA), os.path.join(tmp, "part-0.parquet"),
                       row_group_size=2048)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        os.rename(tmp, pdir)
        written.append(b)
    return {"pages_dir": pages_dir, "written": written, "skipped": skipped}
