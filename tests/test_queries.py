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


# Derived, not hand-listed: every oracle_sql() entry is gated — a new
# SQL-checked query can't be silently left out of the in-repo driver
# mimic (the round-4 coverage gap was exactly a stale hand-kept list).
import __ray_entry__ as _entry

SQL_CHECKED = sorted(_entry.oracle_sql().keys())


def test_every_sql_checked_query_in_driver_window(entry_mod):
    """The driver records only the FIRST 50 queries() entries; every
    oracle_sql() key must sit inside that window or its green row is
    silently dropped from CORRECTNESS_r{N}.json."""
    first50 = set(list(entry_mod.queries())[:50])
    missing = set(entry_mod.oracle_sql()) - first50
    assert not missing, f"oracle-checked queries outside the first 50: {missing}"


def test_neardup_dedup_minhash_matches_exact():
    """Approx clustering on the test corpus: no FP edges + ≥95% recall means
    groups match the exact clustering almost everywhere; assert exact-group
    agreement on the small corpus (banding recall is ~0.99 here)."""
    from licenta_crawler_ray.pipelines.textops import (
        neardup_dedup, neardup_dedup_minhash,
    )

    exact = neardup_dedup(SF_DIR)
    approx = neardup_dedup_minhash(SF_DIR)
    assert len(exact) == len(approx)
    # group structure comparison: proportion of docs with identical group id
    agree = (exact["group_id"].to_numpy() == approx["group_id"].to_numpy()).mean()
    assert agree >= 0.95


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, con, entry_mod):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    ok, msg = compare_query(name, fn, sql, SF_DIR, con)
    assert ok, msg


def test_interval_join_hot_bin_salt(tmp_path):
    """Hot-bin sub-split: with EVERY lineitem in a single window-width bin
    (the all-data-in-one-window spike), salt S>1 engages — probe rows
    scatter across sub-bins, orders replicate ×S — and the output is
    byte-identical to the unsalted run and to a pandas reference."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from licenta_crawler_ray.pipelines.relational import order_window_shipments

    rng = np.random.default_rng(7)
    n_items, n_orders = 5000, 40
    base = np.datetime64("1995-06-01", "us")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    # all shipments inside ONE 30-day bin; orders start inside it too
    ship = base + (rng.integers(0, 25, n_items) * day)
    odate = base + (rng.integers(0, 25, n_orders) * day)
    pq.write_table(pa.table({
        "l_shipdate": pa.array(ship),
        "l_extendedprice": pa.array(rng.uniform(10, 1000, n_items).round(2)),
        "l_discount": pa.array(rng.uniform(0, 0.1, n_items).round(2)),
    }), f"{tmp_path}/lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
        "o_orderdate": pa.array(odate),
    }), f"{tmp_path}/orders.parquet")
    d = str(tmp_path)
    unsalted = order_window_shipments(d)
    salted = order_window_shipments(d, hot_bin_salt=8)
    pd.testing.assert_frame_equal(salted, unsalted)
    # independent reference: brute-force window per order in integer cents
    cents = np.floor(
        pq.read_table(f"{tmp_path}/lineitem.parquet").to_pandas()
        .eval("l_extendedprice * (1 - l_discount)").to_numpy() * 100 + 0.5
    ).astype(np.int64)
    ship_i = ship.astype(np.int64)
    W = np.int64(30) * 86_400_000_000
    for _, row in salted.iterrows():
        m = (ship_i >= np.int64(odate[int(row.o_orderkey)].astype(np.int64))) & \
            (ship_i < np.int64(odate[int(row.o_orderkey)].astype(np.int64)) + W)
        assert row.n_items == int(m.sum())
        assert row.revenue == round(int(cents[m].sum()) / 100.0, 2)


def test_minhash_recall_vs_exact(entry_mod):
    from licenta_crawler_ray.pipelines.textops import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = set(map(tuple, ngram_jaccard_pairs(SF_DIR).itertuples(index=False)))
    approx = set(map(tuple, minhash_lsh_pairs(SF_DIR).itertuples(index=False)))
    assert approx <= exact  # verify step guarantees no false positives
    assert len(approx) >= 0.95 * len(exact)


def test_simhash_bucketed_equals_exact():
    """Manku rotation-block bucketing must be EXACT (pigeonhole guarantee)."""
    from licenta_crawler_ray.pipelines.textops import simhash_pairs, simhash_pairs_exact

    assert simhash_pairs(SF_DIR).equals(simhash_pairs_exact(SF_DIR))


def test_embedding_neardup_ivf_equals_exact():
    from licenta_crawler_ray.pipelines.similarity import (
        embedding_neardup_pairs, embedding_neardup_pairs_ivf,
    )

    assert embedding_neardup_pairs_ivf(SF_DIR).equals(embedding_neardup_pairs(SF_DIR))


def test_embedding_neardup_dedup_to_parquet_driver_free(tmp_path):
    """The driver-free embedding dedup (IVF pairs → sharded edge sink →
    self-loading CC shards → per-shard cluster parquet) produces the same
    cluster assignment as the exact-pair driver query."""
    import ray.data as rd

    from licenta_crawler_ray.pipelines.similarity import (
        embedding_neardup_dedup, embedding_neardup_dedup_to_parquet,
    )

    s = embedding_neardup_dedup_to_parquet(SF_DIR, str(tmp_path / "wd"))
    q = embedding_neardup_dedup(SF_DIR)
    assert s["vectors"] == len(q) and s["clusters"] == q["group_id"].nunique()
    got = (
        rd.read_parquet(str(tmp_path / "wd" / "clusters"))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (got["doc_id"].to_numpy() == q["vec_id"].to_numpy()).all()
    assert (got["group_id"].to_numpy() == q["group_id"].to_numpy()).all()


def test_supplier_pagerank_to_parquet_driver_free(tmp_path):
    """The driver-free PageRank (distinct-edge sink → self-loading shards
    → per-shard rank parquet) produces the same rank table as the
    registered query (which itself runs the same sink; the parity gate vs
    the unrolled SQL CTEs covers the values)."""
    import numpy as np
    import ray.data as rd

    from licenta_crawler_ray.pipelines.relational import (
        supplier_pagerank, supplier_pagerank_to_parquet,
    )

    s = supplier_pagerank_to_parquet(SF_DIR, str(tmp_path / "wd"))
    q = supplier_pagerank(SF_DIR)
    assert s["nodes"] == len(q)
    got = (
        rd.read_parquet(s["ranks_dir"]).to_pandas()
        .sort_values("node").reset_index(drop=True)
    )
    key = got["node"].to_numpy()
    assert (np.where(key % 2 == 0, "c", "s") == q["kind"].to_numpy()).all()
    assert (key // 2 == q["key"].to_numpy()).all()
    assert (got["pr"].to_numpy() == q["pr"].to_numpy()).all()


def test_pagerank_edge_build_broadcast_matches_shuffle():
    """The broadcast searchsorted edge build (orders ≤ cap) covers exactly
    the edge set of the partitioned hash_join fallback — same distinct
    pairs, inner-join semantics included. (Both streams are per-batch
    distinct only; global exactness lives in the shard loader's
    dedupe-on-load, pinned by
    test_pagerank_layout_dedupes_duplicate_pairs_on_load.)"""
    import licenta_crawler_ray.pipelines.relational as rel

    def edges():
        return (rel._supplier_pagerank_edges(SF_DIR).to_pandas()
                .drop_duplicates(["src", "dst"])
                .sort_values(["src", "dst"]).reset_index(drop=True))

    bcast = edges()
    cap = rel._PR_ORDERS_BCAST_CAP
    rel._PR_ORDERS_BCAST_CAP = 0  # force the shuffle fallback
    try:
        shuf = edges()
    finally:
        rel._PR_ORDERS_BCAST_CAP = cap
    assert bcast.equals(shuf)


def test_cc_id_sidecar_per_shard_reads_only(tmp_path):
    """The shard-partitioned id sidecar: layout partitions ids by
    ``id % P``, and the CC shards resolve their node partitions from it
    WITHOUT ever opening the corpus parquet (proved by handing them a
    nonexistent corpus path) — the O(P·N) full-column scans are gone."""
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads

    from licenta_crawler_ray.pipelines.graph import (
        connected_components_from_edge_partitions,
        write_id_sidecar,
        write_symmetric_edges,
    )

    P = 4
    ids_dir = str(tmp_path / "ids")
    edges_dir = str(tmp_path / "edges")
    # a 3-chain + isolated nodes over ids 0..9
    import ray.data as rd
    pairs = rd.from_arrow(__import__("pyarrow").table(
        {"doc_a": [0, 1, 5], "doc_b": [1, 2, 7]}))
    write_symmetric_edges(pairs, "doc_a", "doc_b", edges_dir, num_shards=P)
    write_id_sidecar(os.path.join(SF_DIR, "documents.parquet"), ids_dir,
                     num_shards=P)
    for s in range(P):
        part = pads.dataset(os.path.join(ids_dir, f"shard={s}"),
                            format="parquet").to_table()
        got = part.column("doc_id").to_numpy()
        assert (got % P == s).all() and len(got) > 0
    out = connected_components_from_edge_partitions(
        edges_dir, nodes="/nonexistent/corpus.parquet",
        num_shards=P, ids_dir=ids_dir,
    )
    all_ids = pads.dataset(os.path.join(SF_DIR, "documents.parquet"),
                           format="parquet").to_table(columns=["doc_id"])
    exp_ids = np.sort(all_ids.column("doc_id").to_numpy())
    assert (out["doc_id"].to_numpy() == exp_ids).all()
    grp = dict(zip(out["doc_id"], out["group_id"]))
    assert grp[0] == grp[1] == grp[2] == 0 and grp[5] == grp[7] == 5
    assert grp[3] == 3 and grp[9] == 9  # isolated nodes are singletons


def test_minhash_unbounded_vocab(tmp_path):
    """The verify join must work on corpora far beyond the old 512-word cap."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from licenta_crawler_ray.pipelines.textops import (
        minhash_lsh_pairs, ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(1234)
    # > 4096 words: exercises the packed-popcount fallback of the exact
    # Jaccard kernel (the float32-matmul fast path stops at MM_VOCAB_CAP)
    vocab = [f"w{i:04d}" for i in range(5000)]
    texts, n_base = [], 60
    for _ in range(n_base):
        words = rng.choice(vocab, size=40, replace=False)
        texts.append(" ".join(words))
        dup = words.copy()
        dup[rng.integers(0, len(dup))] = rng.choice(vocab)  # 1 substitution
        texts.append(" ".join(dup))
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    d = str(tmp_path)
    pq.write_table(t, f"{d}/documents.parquet")
    exact = ngram_jaccard_pairs(d)      # no vocab cap anymore
    approx = minhash_lsh_pairs(d)
    es = set(map(tuple, exact.itertuples(index=False)))
    ms = set(map(tuple, approx.itertuples(index=False)))
    assert len(es) >= n_base            # the substituted dups are J≈0.9 pairs
    assert ms <= es                     # exact verify: no false positives
    assert len(ms) >= 0.95 * len(es)


def test_ivf_recall_vs_exact(entry_mod):
    from licenta_crawler_ray.pipelines.similarity import embedding_knn, embedding_knn_ivf

    exact = embedding_knn(SF_DIR)
    approx = embedding_knn_ivf(SF_DIR)
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    a = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(a & e) >= 0.6 * len(e)  # nprobe=4/16 buckets — recall floor


def test_lsh_knn_recall_vs_exact(entry_mod):
    from licenta_crawler_ray.pipelines.similarity import embedding_knn, embedding_knn_lsh

    exact = embedding_knn(SF_DIR)
    approx = embedding_knn_lsh(SF_DIR)
    e = set(map(tuple, exact[["query_id", "vec_id"]].itertuples(index=False)))
    a = set(map(tuple, approx[["query_id", "vec_id"]].itertuples(index=False)))
    assert len(a & e) >= 0.6 * len(e)  # 16 tables x 4 planes — recall floor


def test_entry_smoke(entry_mod):
    df = entry_mod.entry()
    assert len(df) > 0
    assert {"url", "text", "priority", "page_type"} <= set(df.columns)


def test_multimodal_plumbing():
    import ray.data as rd

    from licenta_crawler_ray.stages.multimodal import (
        AudioFrameSample, ImageDecode, synth_media_table,
    )

    from licenta_crawler_ray.stages.multimodal import VideoFrameSample

    t = synth_media_table(20)
    ds = rd.from_arrow(t)
    imgs = (
        ds.map_batches(lambda b: b.filter(
            __import__("pyarrow").compute.equal(b.column("media_type"), "image")),
            batch_format="pyarrow")
        .map_batches(ImageDecode, batch_format="pyarrow", batch_size=4, concurrency=2)
        .to_pandas()
    )
    assert len(imgs) == 7  # 20 ids: i%3==2 → video, else even → image
    assert {"media_id", "width", "height", "mean_pixel"} <= set(imgs.columns)
    assert (imgs["width"] > 0).all()
    aud = (
        ds.map_batches(lambda b: b.filter(
            __import__("pyarrow").compute.equal(b.column("media_type"), "audio")),
            batch_format="pyarrow")
        .map_batches(AudioFrameSample, batch_format="pyarrow", batch_size=4, concurrency=2)
        .to_pandas()
    )
    assert len(aud) == 7 and (aud["n_frames"] > 0).all()
    vid = (
        ds.map_batches(lambda b: b.filter(
            __import__("pyarrow").compute.equal(b.column("media_type"), "video")),
            batch_format="pyarrow")
        .map_batches(VideoFrameSample, batch_format="pyarrow", batch_size=4, concurrency=2)
        .to_pandas()
    )
    assert len(vid) == 6 and (vid["n_frames"] > 0).all()
    assert all(len(m) >= 1 for m in vid["sampled_frame_means"])


def test_incremental_dedup_matches_full_run(tmp_path):
    """Incremental dedup (new batch vs persisted band index) must agree
    with the from-scratch full-corpus pipeline: identical new-involving
    verified pairs, and identical keep/drop decisions for every new doc
    (keep ⇔ the doc is its own component min in the full clustering —
    holds even when the 'historical' 80% still contains internal dups,
    because an all-new component can never be reached by old-old edges)."""
    import numpy as np

    from licenta_crawler_ray.pipelines.textops import (
        minhash_lsh_pairs, minhash_lsh_pairs_incremental,
        neardup_admit_incremental, neardup_dedup_minhash,
    )

    full_pairs = minhash_lsh_pairs(SF_DIR)
    full_groups = neardup_dedup_minhash(SF_DIR)
    adm = neardup_admit_incremental(SF_DIR)
    new_ids = set(adm["doc_id"].tolist())
    assert len(new_ids) > 0
    # pair equality on the new-involving subset (same scratch key the
    # wrapper derives)
    import hashlib

    import pyarrow.dataset as pads
    ids = pads.dataset(os.path.join(SF_DIR, "documents.parquet"),
                       format="parquet").to_table(columns=["doc_id"]) \
        .column("doc_id").to_numpy()
    cut = np.sort(ids)[int(len(ids) * 0.8)]
    key = hashlib.sha1(
        f"{os.path.abspath(SF_DIR)}:{len(ids)}:{cut}".encode()).hexdigest()[:12]
    inc_dir = f"/tmp/lcr_incr_{key}"
    pairs_inc = minhash_lsh_pairs_incremental(
        f"{inc_dir}/corpus", f"{inc_dir}/new", f"{inc_dir}/index")
    mask = full_pairs["doc_a"].isin(new_ids) | full_pairs["doc_b"].isin(new_ids)
    exp = full_pairs[mask].reset_index(drop=True)
    pd.testing.assert_frame_equal(pairs_inc, exp)
    # keep/drop equality vs the full clustering
    g = dict(zip(full_groups["doc_id"], full_groups["group_id"]))
    for _, row in adm.iterrows():
        assert row["keep"] == (g[row["doc_id"]] == row["doc_id"]), row.to_dict()
        if not row["keep"]:
            assert row["dup_of"] != row["doc_id"] and row["dup_of"] >= 0


def test_neardup_pairs_streaming_sink(tmp_path):
    """write_neardup_pairs streams the verified pair Dataset to parquet;
    rows match the driver-materialized query exactly."""
    from licenta_crawler_ray.pipelines.textops import (
        minhash_lsh_pairs, write_neardup_pairs,
    )

    out = str(tmp_path / "pairs")
    s = write_neardup_pairs(SF_DIR, out)
    assert s["rows"] == len(minhash_lsh_pairs(SF_DIR))


def test_neardup_dedup_pipeline_driver_free(tmp_path):
    """End-to-end parquet dedup pipeline: sharded edge sink → shard-loaded
    CC → per-shard cluster parts; assignment must equal the in-memory
    clustering exactly."""
    import pyarrow.dataset as pads

    from licenta_crawler_ray.pipelines.textops import (
        neardup_dedup_minhash, neardup_dedup_to_parquet,
    )

    wd = str(tmp_path / "dedup")
    s = neardup_dedup_to_parquet(SF_DIR, wd)
    ref = neardup_dedup_minhash(SF_DIR)
    assert s["docs"] == len(ref)
    assert s["clusters"] == ref["group_id"].nunique()
    got = (
        pads.dataset(os.path.join(wd, "clusters"), format="parquet")
        .to_table().to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(ref)


def test_partitioned_sink_resume(tmp_path):
    """Atomic per-partition commit + resume skip; counts match the source."""
    import duckdb
    import pyarrow.dataset as pads

    from licenta_crawler_ray.pipelines.sinks import write_corpus_partitioned

    out = str(tmp_path / "corpus")
    s1 = write_corpus_partitioned(SF_DIR, out)
    assert s1["written"] and not s1["skipped"]
    # re-run: everything committed → all skipped
    s2 = write_corpus_partitioned(SF_DIR, out)
    assert not s2["written"] and set(s2["skipped"]) == set(s1["written"])
    # knock out one partition's marker → only it rewrites
    victim = s1["written"][0]
    os.remove(os.path.join(out, f"lang={victim}", "_SUCCESS"))
    s3 = write_corpus_partitioned(SF_DIR, out)
    assert s3["written"] == [victim]
    # per-partition counts equal the source's group counts
    con = duckdb.connect()
    exp = dict(con.execute(
        f"SELECT lang, count(*) FROM read_parquet('{SF_DIR}/documents.parquet') GROUP BY 1"
    ).fetchall())
    for lang, n in exp.items():
        t = pads.dataset(os.path.join(out, f"lang={lang}")).to_table()
        assert t.num_rows == n


def test_multimodal_real_format_raises():
    """Formats that STILL need a library raise: interlaced/palette PNG,
    non-PCM WAV, compressed BMP, and all real video (BMP, PCM WAV and
    8-bit gray/RGB PNG decode for real now)."""
    import struct
    import zlib

    import pyarrow as pa

    from licenta_crawler_ray.stages.multimodal import (
        AudioFrameSample, ImageDecode, VideoFrameSample,
    )

    def img(payload):
        return pa.Table.from_pylist([{"media_id": 0, "media_type": "image",
                                      "payload": payload, "meta": "{}"}])

    def png_chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    # Adam7-interlaced grayscale PNG: valid container, undecodable stdlib-only
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    interlaced = (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr)
                  + png_chunk(b"IDAT", zlib.compress(b"\x00" * 20))
                  + png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        ImageDecode()(img(interlaced))
    # BMP with RLE8 compression (biCompression=1) is not decodable stdlib-only
    hdr = (b"BM" + struct.pack("<IHHI", 200, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, 64, 0, 0, 0, 0))
    with pytest.raises(NotImplementedError):
        ImageDecode()(img(hdr + b"\x00" * 146))
    # IEEE-float WAV (format 3) is non-PCM
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 0))
    aud = pa.Table.from_pylist([{"media_id": 0, "media_type": "audio",
                                 "payload": wav, "meta": "{}"}])
    with pytest.raises(NotImplementedError):
        AudioFrameSample()(aud)
    vid = pa.Table.from_pylist([{"media_id": 0, "media_type": "video",
                                 "payload": b"\x00\x00\x00\x18ftypmp42",
                                 "meta": "{}"}])
    with pytest.raises(NotImplementedError):
        VideoFrameSample()(vid)


def test_multimodal_bmp_wav_real_decode():
    """Stdlib-encoded BMP/WAV round-trip through the real decode paths
    with exact pixel/sample counts (incl. BMP row padding: w=5)."""
    import numpy as np
    import pyarrow as pa

    from licenta_crawler_ray.stages.multimodal import (
        AudioFrameSample, ImageDecode, encode_bmp, encode_wav,
    )

    px = np.arange(35, dtype=np.uint8).reshape(7, 5)  # stride 16 > 15: padded
    batch = pa.Table.from_pylist([{"media_id": 1, "media_type": "image",
                                   "payload": encode_bmp(px), "meta": "{}"}])
    out = ImageDecode()(batch)
    assert out.column("width")[0].as_py() == 5
    assert out.column("height")[0].as_py() == 7
    assert out.column("mean_pixel")[0].as_py() == round(float(px.mean()), 4)

    samples = (np.sin(np.arange(1000) / 10.0) * 20000).astype(np.int16)
    wav = pa.Table.from_pylist([{"media_id": 2, "media_type": "audio",
                                 "payload": encode_wav(samples, 8000),
                                 "meta": "{}"}])
    aout = AudioFrameSample(stride=100)(wav)
    assert aout.column("n_frames")[0].as_py() == 1000
    got = np.frombuffer(aout.column("sampled_frames")[0].as_py(), dtype="<i2")
    assert (got == samples[::100]).all()


def test_multimodal_png_real_decode():
    """Stdlib-encoded PNG round-trips through the real decode path (gray
    AND RGB), and a hand-filtered PNG exercising ALL FIVE scanline
    filters reconstructs the exact pixels."""
    import struct
    import zlib

    import numpy as np
    import pyarrow as pa

    from licenta_crawler_ray.stages.multimodal import (
        ImageDecode, _decode_png, encode_png,
    )

    rng = np.random.default_rng(3)
    for shape in ((9, 7), (6, 5, 3)):
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        batch = pa.Table.from_pylist([{"media_id": 1, "media_type": "image",
                                       "payload": encode_png(px), "meta": "{}"}])
        out = ImageDecode()(batch)
        assert out.column("width")[0].as_py() == shape[1]
        assert out.column("height")[0].as_py() == shape[0]
        assert out.column("mean_pixel")[0].as_py() == round(float(px.mean()), 4)

    # all five filters, RGB (bpp=3): filter each recon row per the spec's
    # inverse, decode, and demand the exact original mean back
    h, w, bpp = 5, 4, 3
    px = rng.integers(0, 256, size=(h, w * bpp), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)

    raw = b""
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for r in range(h):
        f = r % 5
        rec = px[r]
        filt = np.zeros(w * bpp, dtype=np.uint8)
        for x in range(w * bpp):
            left = int(rec[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[f]
            filt[x] = (int(rec[x]) - pred) & 0xFF
        raw += bytes([f]) + filt.tobytes()
        prev = rec

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    gw, gh, gmean = _decode_png(payload)
    assert (gw, gh) == (w, h)
    assert gmean == float(px.mean())


# ---------------------------------------------------------------------------
# Sketches & sampling (round 3)
# ---------------------------------------------------------------------------
def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_heavy_tokens_sketch_superset_on_skew(tmp_path):
    """Misra-Gries guarantee on a genuinely skewed corpus (the testdata
    vocab is near-uniform, so skew is constructed): every exact heavy
    hitter survives the sketch, and sketch counters never overcount."""
    import numpy as np

    from licenta_crawler_ray.pipelines.sketches import heavy_tokens, heavy_tokens_sketch

    rng = np.random.default_rng(7)
    # Zipf-flavored: 3 planted heavies (~10% each), 2000-word tail
    tail = [f"t{i:04d}" for i in range(2000)]
    texts = []
    for _ in range(300):
        words = list(rng.choice(tail, size=14))
        words += ["alpha", "beta", "gamma"] * 2  # 6/20 heavy mass per doc
        rng.shuffle(words)
        texts.append(" ".join(words))
    d = _write_docs(tmp_path, texts)
    exact = heavy_tokens(d, min_share=0.05)
    sketch = heavy_tokens_sketch(d, k=64, min_share=0.05)
    assert set(exact["word"]) == {"alpha", "beta", "gamma"}
    assert set(exact["word"]) <= set(sketch["word"])
    true_counts = dict(zip(exact["word"], exact["n"]))
    for w, n_est in zip(sketch["word"], sketch["n_est"]):
        if w in true_counts:
            assert n_est <= true_counts[w]  # MG counters undercount only


def test_hll_error_bound(con):
    from licenta_crawler_ray.pipelines.sketches import approx_distinct_orders

    exact = con.execute("SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    est = int(approx_distinct_orders(SF_DIR)["n_orders_est"].iloc[0])
    assert abs(est - exact) / exact < 0.05  # p=12 → σ ≈ 1.6%


def test_clz_rho_unit():
    import numpy as np

    from licenta_crawler_ray.pipelines.sketches import _clz_rho

    rng = np.random.default_rng(3)
    w = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64) << np.uint64(1)
    w[:5] = [0, 1, 1 << 63, 1 << 62, 3]
    width = 52
    got = _clz_rho(w.copy(), width)
    for wi, g in zip(w.tolist(), got.tolist()):
        expect = min(64 - wi.bit_length() + 1, width + 1) if wi else width + 1
        assert g == expect, (wi, g, expect)


def test_kmeans_deterministic_and_monotone():
    from licenta_crawler_ray.pipelines.similarity import _kmeans_fit, embedding_kmeans

    _, hist = _kmeans_fit(SF_DIR, 8, 4)
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
    a = embedding_kmeans(SF_DIR)
    b = embedding_kmeans(SF_DIR)
    assert a.equals(b)
    assert a["cluster"].nunique() > 1


def test_asof_join_tie_break(tmp_path):
    """Orders sharing the as-of date must resolve to the max o_orderkey
    (the SQL oracle's ORDER BY o_orderdate DESC, o_orderkey DESC)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from licenta_crawler_ray.pipelines.relational import events_asof_orders

    ts = pd.Timestamp("2024-01-10")
    ev = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "user_id": pa.array([5, 6], type=pa.int64()),
        "ts": pa.array([ts, ts]).cast(pa.timestamp("us")),
        "value": pa.array([1.0, 1.0]),
    })
    od = pa.table({
        "o_orderkey": pa.array([10, 11, 12, 20], type=pa.int64()),
        "o_custkey": pa.array([5, 5, 5, 6], type=pa.int64()),
        # user 5: two orders tie on the latest date ≤ ts → pick key 12;
        # a later order (key 10 at 2024-02-01) must NOT match
        "o_orderdate": pa.array(
            [pd.Timestamp("2024-02-01"), pd.Timestamp("2024-01-09"),
             pd.Timestamp("2024-01-09"), pd.Timestamp("2024-01-01")]
        ).cast(pa.timestamp("us")),
    })
    pq.write_table(ev, f"{tmp_path}/events.parquet")
    pq.write_table(od, f"{tmp_path}/orders.parquet")
    out = events_asof_orders(str(tmp_path))
    assert out["o_orderkey"].tolist() == [12, 20]


def test_lsh_knn_sparse_probe_matches_reference():
    """The sparse (table,bucket)-key probe must equal an independent
    brute-force LSH evaluation — including plane counts far beyond the old
    dense-table cap of 16 (memory there scaled with 2^planes)."""
    import numpy as np
    import pandas as pd

    from licenta_crawler_ray.pipelines.similarity import (
        _normalize, _query_frame, _to_matrix, embedding_knn_lsh,
    )
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    am = _normalize(_to_matrix(full))
    aids = full["vec_id"].to_numpy()

    for num_planes, num_tables in [(4, 16), (20, 8)]:
        qdf = _query_frame(SF_DIR, 5)
        qm = _normalize(_to_matrix(qdf))
        qids = qdf["vec_id"].to_numpy()
        rng = np.random.default_rng(0xB00C)
        planes = rng.standard_normal((num_tables, num_planes, qm.shape[1]))
        pow2 = (1 << np.arange(num_planes)).astype(np.int64)
        qsig = np.stack([((qm @ planes[t].T) > 0) @ pow2
                         for t in range(num_tables)], axis=1)
        asig = np.stack([((am @ planes[t].T) > 0) @ pow2
                         for t in range(num_tables)], axis=1)
        rows = []
        for qi, qid in enumerate(qids):
            cand = (asig == qsig[qi][None, :]).any(axis=1)
            cand &= aids != qid
            sims = qm[qi] @ am[cand].T
            g = pd.DataFrame({"vec_id": aids[cand], "sim": sims})
            g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(10)
            for r, vid in enumerate(g["vec_id"], 1):
                rows.append((int(qid), int(vid), r))
        exp = pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"]) \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        got = embedding_knn_lsh(SF_DIR, num_planes=num_planes,
                                num_tables=num_tables)
        pd.testing.assert_frame_equal(
            got, exp, check_dtype=False), (num_planes, num_tables)


def test_value_quantiles_rank_error_bound(con):
    """Histogram-sketch quantiles: true rank of each estimate within 2%."""
    import numpy as np

    from licenta_crawler_ray.pipelines.sketches import value_quantiles

    vq = value_quantiles(SF_DIR)
    svals = np.sort(con.execute("SELECT value FROM events").df()["value"].to_numpy())
    n = len(svals)
    assert len(vq) == 5
    for q, ve in zip(vq["q"], vq["value_est"]):
        rank_err = abs(np.searchsorted(svals, ve, side="right") - q * n) / n
        assert rank_err <= 0.02, (q, ve, rank_err)


def test_sketch_ops_empty_corpus(tmp_path):
    """Quantiles/heavy-hitters/samples must degrade to empty results, not
    crash, on an empty documents table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from licenta_crawler_ray.pipelines.sketches import (
        heavy_tokens, heavy_tokens_sketch, reservoir_sample, token_quantiles,
    )

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    d = str(tmp_path)
    assert len(token_quantiles(d)) == 0
    assert len(heavy_tokens(d)) == 0
    assert len(heavy_tokens_sketch(d)) == 0
    assert len(reservoir_sample(d)) == 0


def test_value_quantiles_empty_events(tmp_path):
    """The continuous-value sketch degrades like its token sibling on an
    empty events table (round-3 advice: it crashed on the None aggregate
    and the column-less grouped frame)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from licenta_crawler_ray.pipelines.sketches import value_quantiles

    t = pa.table({"event_id": pa.array([], type=pa.int64()),
                  "value": pa.array([], type=pa.float64())})
    pq.write_table(t, f"{tmp_path}/events.parquet")
    out = value_quantiles(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == ["q", "value_est"]
