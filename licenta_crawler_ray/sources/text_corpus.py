"""Documents-table sources — one normalized reader over multiple formats.

Text corpora show up as Parquet, JSONL dumps, or CSV exports; every textops
pipeline should read them identically. :func:`read_documents` dispatches on
the path's extension and normalizes to the canonical schema
``(doc_id int64, text string, lang string)``; all three go through Ray's
native streaming readers (``read_parquet`` / ``read_json`` / ``read_csv``),
so block parallelism and backpressure are identical regardless of format.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from ..io_utils import read_parquet_clean

DOCS_SCHEMA = pa.schema([
    pa.field("doc_id", pa.int64()),
    pa.field("text", pa.string()),
    pa.field("lang", pa.string()),
])


def _normalize(t: pa.Table) -> pa.Table:
    cols = {}
    for f in DOCS_SCHEMA:
        if f.name in t.column_names:
            cols[f.name] = t.column(f.name).cast(f.type)
        elif f.name == "lang":
            cols[f.name] = pa.array([""] * t.num_rows, type=pa.string())
        else:
            raise ValueError(f"documents source missing required column {f.name!r}")
    return pa.table(cols).cast(DOCS_SCHEMA)


def read_documents(path: str) -> rd.Dataset:
    """Streaming normalized documents Dataset from .parquet / .jsonl / .csv
    (a directory of same-extension files also works)."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if not ext and os.path.isdir(path):
        names = [n for n in os.listdir(path) if not n.startswith((".", "_"))]
        exts = {os.path.splitext(n)[1].lower() for n in names}
        if len(exts) != 1:
            raise ValueError(f"mixed/unknown extensions in {path}: {sorted(exts)}")
        ext = exts.pop()
    if ext == ".parquet":
        ds = read_parquet_clean(path)
    elif ext in (".jsonl", ".json"):
        ds = rd.read_json(path)
    elif ext == ".csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported documents format: {ext!r}")
    return ds.map_batches(_normalize, batch_format="pyarrow")
