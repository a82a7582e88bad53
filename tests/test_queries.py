"""Queries-vs-DuckDB gate (mimics the driver) + approximate-operator quality."""

import duckdb
import pandas as pd
import pytest

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.driver_mimic import compare_query

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def entry_mod():
    import __ray_entry__ as e

    return e


SQL_CHECKED = [
    "pricing_summary", "top_customers", "supplier_stats", "events_hourly",
    "user_sessions", "top_events_per_user", "priority_revenue",
    "part_brand_stats", "order_priority_count", "distinct_segments",
    "lang_hist", "lang_id", "token_counts", "quality_scores",
    "exact_dedup", "ngram_jaccard_pairs", "embedding_knn",
    "embedding_neardup_pairs",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con, entry_mod):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    ok, msg = compare_query(name, fn, sql, SF_DIR, con)
    assert ok, msg


def test_minhash_recall_vs_exact(entry_mod):
    from licenta_crawler_ray.pipelines.textops import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = set(map(tuple, ngram_jaccard_pairs(SF_DIR).itertuples(index=False)))
    approx = set(map(tuple, minhash_lsh_pairs(SF_DIR).itertuples(index=False)))
    assert approx <= exact  # verify step guarantees no false positives
    assert len(approx) >= 0.95 * len(exact)


def test_ivf_recall_vs_exact(entry_mod):
    from licenta_crawler_ray.pipelines.similarity import embedding_knn, embedding_knn_ivf

    exact = embedding_knn(SF_DIR)
    approx = embedding_knn_ivf(SF_DIR)
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    a = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(a & e) >= 0.6 * len(e)  # nprobe=4/16 buckets — recall floor


def test_entry_smoke(entry_mod):
    df = entry_mod.entry()
    assert len(df) > 0
    assert {"url", "text", "priority", "page_type"} <= set(df.columns)


def test_multimodal_plumbing():
    import ray.data as rd

    from licenta_crawler_ray.stages.multimodal import (
        AudioFrameSample, ImageDecode, synth_media_table,
    )

    t = synth_media_table(20)
    ds = rd.from_arrow(t)
    imgs = (
        ds.map_batches(lambda b: b.filter(
            __import__("pyarrow").compute.equal(b.column("media_type"), "image")),
            batch_format="pyarrow")
        .map_batches(ImageDecode, batch_format="pyarrow", batch_size=4, concurrency=2)
        .to_pandas()
    )
    assert len(imgs) == 10
    assert {"media_id", "width", "height", "mean_pixel"} <= set(imgs.columns)
    assert (imgs["width"] > 0).all()
    aud = (
        ds.map_batches(lambda b: b.filter(
            __import__("pyarrow").compute.equal(b.column("media_type"), "audio")),
            batch_format="pyarrow")
        .map_batches(AudioFrameSample, batch_format="pyarrow", batch_size=4, concurrency=2)
        .to_pandas()
    )
    assert len(aud) == 10 and (aud["n_frames"] > 0).all()


def test_multimodal_real_format_raises():
    from licenta_crawler_ray.stages.multimodal import ImageDecode

    import pyarrow as pa

    batch = pa.Table.from_pylist(
        [{"media_id": 0, "media_type": "image", "payload": b"\x89PNG\r\n\x1a\n....",
          "meta": "{}"}],
    )
    with pytest.raises(NotImplementedError):
        ImageDecode()(batch)
