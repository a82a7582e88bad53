"""Shared parquet-read helper: strip schema metadata at the source.

Parquet files written via pandas carry a ``b"pandas"`` schema-metadata
blob; on this pyarrow a schema holding that blob is UNHASHABLE
(``hash(schema)`` → ``unhashable type: 'dict'``), so every Ray Data
schema-unification point downstream logs
``Failed to hash the schemas (for deduplication)`` — pages of benign
warning spam per pipeline that bury real warnings (round-4 verdict
item). Dropping the metadata in a map stage fused directly onto the read
normalizes every block's schema once; the swap is zero-copy (Arrow
tables share buffers, only the schema object changes) and runs on whole
blocks, not re-batched slices.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(path, *, columns=None, **kw) -> rd.Dataset:
    """``ray.data.read_parquet`` + schema-metadata strip (see module doc).

    Drop-in replacement for the testdata-facing reads; files this engine
    writes itself carry no pandas metadata and may keep using
    ``read_parquet`` directly."""
    return rd.read_parquet(path, columns=columns, **kw).map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )
