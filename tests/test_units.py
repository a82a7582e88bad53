"""Unit tests per operator (SURVEY §5.2)."""

import numpy as np
import pyarrow as pa
import pytest

from licenta_crawler_ray.functions import urls as U
from licenta_crawler_ray.functions.extract import (
    extract_next_page,
    extract_product_links,
    extract_text,
    maybe_gunzip,
    parse_sitemap,
)
from licenta_crawler_ray.state.seen import CuckooFilter


class TestUrlFns:
    def test_host_of_url(self):
        assert U.host_of_url("http://Shop.Example.RO:8080/x?y=1") == "shop.example.ro"
        assert U.host_of_url("http://user:pw@h.com/p") == "h.com"
        assert U.host_of_url("not a url") == ""

    def test_hosts_of_urls_matches_scalar(self):
        """The Arrow extract_regex kernel ≡ the scalar urlparse form on
        absolute urls (property-tested over adversarial paths/ports/userinfo)."""
        from hypothesis import given, settings, strategies as st

        host_chars = st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.-",
            min_size=1, max_size=20)
        tail = st.text(alphabet="abc/:?#@%.=&~ ", max_size=15)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(
            st.tuples(st.sampled_from(["http", "https", "ftp"]),
                      st.sampled_from(["", "user@", "u:p@"]),
                      host_chars,
                      st.sampled_from(["", ":80", ":8080"]),
                      tail),
            min_size=1, max_size=20))
        def check(parts):
            urls = [f"{s}://{ui}{h}{port}/{t}" for s, ui, h, port, t in parts]
            got = U.hosts_of_urls(pa.array(urls, type=pa.string())).to_pylist()
            assert got == [U.host_of_url(u) for u in urls]

        check()

    def test_absolutize(self):
        assert U.absolutize("http://h.com/shelf/1", "/product/2") == "http://h.com/product/2"
        assert U.absolutize("http://h.com/a/b", "../c") == "http://h.com/c"
        assert U.absolutize("http://h.com/", "http://other.com/x") == "http://other.com/x"

    def test_validation(self):
        assert U.is_valid_http_url("https://a.b/c")
        assert not U.is_valid_http_url("ftp://a.b/c")
        assert not U.is_valid_http_url("/relative")
        assert U.same_host("http://a.b/x", "https://A.B/y")
        assert not U.same_host("http://a.b/x", "http://c.d/y")

    def test_hash_strings_matches_scalar(self):
        vals = ["", "a", "http://shop000.example.com/product/7", "αβγ"]
        arr = pa.array(vals, type=pa.string())
        vec = U.hash_strings(arr)
        for v, h in zip(vals, vec):
            assert U.fnv1a64(v) == int(h)

    def test_hash_strings_sliced_and_chunked(self):
        """Buffer-offset handling: slices (non-zero array offset) and
        multi-chunk arrays hash identically to the scalar form."""
        vals = [f"url-{i}-" + "x" * (i % 7) for i in range(50)]
        arr = pa.array(vals, type=pa.string())
        sl = arr.slice(13, 20)
        assert [int(h) for h in U.hash_strings(sl)] == \
            [U.fnv1a64(v) for v in vals[13:33]]
        ch = pa.chunked_array([arr.slice(0, 10), arr.slice(10, 15)])
        assert [int(h) for h in U.hash_strings(ch)] == \
            [U.fnv1a64(v) for v in vals[:25]]

    def test_priority_roundtrip(self):
        si, d, o = U.decode_priority(U.encode_priority(37, 1023, 99999))
        assert (int(si), int(d), int(o)) == (37, 1023, 99999)
        # lexicographic order preserved (field widths from the module consts)
        DB, OB = U._DEPTH_BITS, U._DOC_BITS
        assert U.encode_priority(0, 4, (1 << OB) - 1) < U.encode_priority(0, 5, 0)
        assert U.encode_priority(1, 0, 0) > U.encode_priority(0, (1 << DB) - 1, (1 << OB) - 1)


class TestExtract:
    def test_text_spec(self):
        html = (
            b"<html><head><title>T</title><script>x<1</script>"
            b"<style>a{}</style></head><body><!-- c -->"
            b"<h1>A  B</h1><p>c&amp;d\xc4\x83</p><span>in</span><span>line</span>"
            b"<noscript>no</noscript><br>tail</body></html>"
        )
        assert extract_text(html) == "T\nA B\nc&dă\ninline\ntail"

    def test_text_deterministic(self):
        html = b"<div>x <b>y</b>\n\n z</div>"
        assert extract_text(html) == extract_text(html)

    def test_product_links_leafmost_docorder(self):
        html = (
            b"<div class='produse-wrap'>"  # outer also matches 'produ' but is not leaf-most
            b"<div class='produ-box'><img src='a'><a href='/p/1'>x</a></div>"
            b"<div class='produ-box'><a href='/p/skip-no-img'>y</a></div>"
            b"<div class='produ-box'><img src='b'><a href='/p/2'>z</a></div>"
            b"<img src='outer'><a href='/outer'>o</a>"
            b"</div>"
        )
        assert extract_product_links(html, "http://h.com/s") == [
            "http://h.com/p/1",
            "http://h.com/p/2",
        ]

    def test_next_page(self):
        mid = (
            b"<ul class='pagination'><li><a href='/shelf/0'>1</a></li>"
            b"<li class='active'><a href='/shelf/1'>2</a></li>"
            b"<li><a href='/shelf/2'>3</a></li></ul>"
        )
        assert extract_next_page(mid, "http://h.com/shelf/1") == "http://h.com/shelf/2"
        last = (
            b"<ul class='pagination'><li class='active'><a href='/shelf/1'>2</a></li>"
            b"<li class='disabled'><a href='#'>next</a></li></ul>"
        )
        assert extract_next_page(last, "http://h.com/shelf/1") is None
        assert extract_next_page(b"<div>no pagination</div>", "http://h.com/") is None

    def test_sitemap_parse_and_gunzip(self):
        import gzip

        xml = (
            b'<?xml version="1.0"?><urlset><url><loc>http://h.com/a</loc></url>'
            b"<url><loc> http://h.com/b </loc></url></urlset>"
        )
        res = parse_sitemap(gzip.compress(xml, mtime=0))
        assert not res.is_index and res.urls == ["http://h.com/a", "http://h.com/b"]
        idx = b"<sitemapindex><sitemap><loc>http://h.com/s1.xml</loc></sitemap></sitemapindex>"
        res2 = parse_sitemap(idx)
        assert res2.is_index and res2.urls == ["http://h.com/s1.xml"]
        assert maybe_gunzip(xml) == xml

    def test_sitemap_namespace_prefixes(self):
        ns = (
            b'<?xml version="1.0"?>'
            b'<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<sm:url><sm:loc>http://h.com/a</sm:loc>"
            b"<sm:lastmod>2018-06-01</sm:lastmod></sm:url></sm:urlset>"
        )
        res = parse_sitemap(ns)
        assert not res.is_index and res.urls == ["http://h.com/a"]
        nsidx = (
            b'<ns1:sitemapindex xmlns:ns1="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<ns1:sitemap><ns1:loc>http://h.com/s.xml</ns1:loc></ns1:sitemap>"
            b"</ns1:sitemapindex>"
        )
        res2 = parse_sitemap(nsidx)
        assert res2.is_index and res2.urls == ["http://h.com/s.xml"]


class TestCuckoo:
    def test_no_false_negatives_under_overload(self):
        f = CuckooFilter(log2_buckets=7)  # 512 slots, insert 3x capacity
        rng = np.random.default_rng(7)
        keys = rng.integers(1, 2**63, size=1536, dtype=np.uint64)
        f.contains_and_add(keys)
        assert f.contains(keys).all()

    def test_fp_rate_bounded(self):
        f = CuckooFilter(log2_buckets=14)
        rng = np.random.default_rng(8)
        f.contains_and_add(rng.integers(1, 2**63, size=20_000, dtype=np.uint64))
        fresh = rng.integers(1, 2**63, size=50_000, dtype=np.uint64)
        assert f.contains(fresh).mean() < 0.01

    def test_in_batch_first_wins(self):
        f = CuckooFilter(log2_buckets=8)
        out = f.contains_and_add(np.array([5, 5, 6, 5, 6], dtype=np.uint64))
        assert out.tolist() == [False, True, False, True, True]

    def test_snapshot_roundtrip(self, tmp_path):
        f = CuckooFilter(log2_buckets=7)
        rng = np.random.default_rng(9)
        keys = rng.integers(1, 2**63, size=1000, dtype=np.uint64)
        f.contains_and_add(keys)
        p = str(tmp_path / "s.npz")
        f.save(p)
        g = CuckooFilter.load(p)
        assert g.count == f.count
        assert g.contains(keys).all()


class TestFetcherCache:
    def test_oversized_bucket_never_materialized(self, small_fixture):
        """The cache decision reads parquet METADATA only: a bucket whose
        size estimate exceeds the budget goes straight to the probe scan —
        it is never loaded whole and then discarded (round-2 advice)."""
        import pyarrow.dataset as pads

        from licenta_crawler_ray.stages.fetch import Fetcher

        pages = f"{small_fixture}/pages"
        f = Fetcher(pages, 16, cache_bytes=1024)
        sample = pads.dataset(pages, partitioning="hive").to_table(
            columns=["url", "host_bucket"]
        )
        b = int(sample.column("host_bucket")[0].as_py())
        url = sample.column("url")[0].as_py()
        assert f._bucket_size_estimate(b) > 1024
        t = f._lookup(b, [url])
        assert len(f._cache) == 0 and f._cache_nbytes == 0
        assert t.num_rows == 1 and t.column("url")[0].as_py() == url

    def test_byte_capped_probe_parity(self, small_fixture):
        """A Fetcher with a ~zero byte budget must fall back to row-group-
        pruned filtered scans and return IDENTICAL results to the cached
        path, with per-actor residency bounded by the cap."""
        import pyarrow.dataset as pads

        from licenta_crawler_ray.stages.fetch import Fetcher

        pages = f"{small_fixture}/pages"
        sample = pads.dataset(pages, partitioning="hive").to_table(
            columns=["url", "host_bucket"]
        )
        # one present and one absent url per bucket probed
        urls = sample.column("url").to_pylist()[:20]
        buckets = sample.column("host_bucket").to_pylist()[:20]
        batch = pa.table({
            "url": pa.array(
                urls + [f"http://nowhere{i}.example.com/x" for i in range(3)]
            ),
            "host_bucket": pa.array(buckets + buckets[:3],
                                    type=sample.column("host_bucket").type),
        })
        cached = Fetcher(pages, 16)(batch)
        probed_f = Fetcher(pages, 16, cache_bytes=1)
        probed = probed_f(batch)
        assert cached.equals(probed)
        assert probed_f._cache_nbytes <= 1
        assert len(probed_f._cache) == 0
        errs = probed.column("fetch_error").to_pylist()
        # the 3 absent urls miss; sampled urls may add deterministic timeouts
        assert errs.count("fetch_miss") == 3


class TestRobots:
    def test_disallow_prefix(self):
        from licenta_crawler_ray.state.politeness import RobotRules

        r = RobotRules({"h.com": {"disallow": ["/private/"], "sitemaps": []}})
        assert r.allowed_one("http://h.com/product/1", "h.com")
        assert not r.allowed_one("http://h.com/private/p", "h.com")
        assert r.allowed_one("http://other.com/private/p", "other.com")


class TestProperties:
    """Property-based checks (hypothesis) for the frozen kernels."""

    def test_priority_encoding_order_preserving(self):
        from hypothesis import given, settings, strategies as st

        trip = st.tuples(st.integers(0, 2**19 - 1), st.integers(0, 2**14 - 1),
                         st.integers(0, 2**30 - 1))

        @settings(max_examples=200, deadline=None)
        @given(trip, trip)
        def check(a, b):
            ea, eb = U.encode_priority(*a), U.encode_priority(*b)
            assert (a < b) == (int(ea) < int(eb))  # lexicographic ⇔ numeric
            da = tuple(int(x) for x in U.decode_priority(ea))
            assert da == a

        check()

    def test_fnv_vectorized_matches_scalar(self):
        from hypothesis import given, settings, strategies as st
        import pyarrow as pa

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.text(max_size=64), min_size=1, max_size=20))
        def check(strs):
            vec = U.hash_strings(pa.array(strs, type=pa.string()))
            for s, h in zip(strs, vec):
                assert U.fnv1a64(s) == int(h)

        check()

    def test_cuckoo_never_false_negative(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=30, deadline=None)
        @given(st.lists(st.integers(1, 2**63 - 1), min_size=1, max_size=500,
                        unique=True))
        def check(keys):
            f = CuckooFilter(log2_buckets=6)  # deliberately tiny → overflow
            arr = np.array(keys, dtype=np.uint64)
            f.contains_and_add(arr)
            assert f.contains(arr).all()

        check()

    def test_whitespace_fastpath_equals_regex_spec(self):
        """extract_text's split/join whitespace step must stay byte-equal to
        the frozen regex definition (kept in the module as the spec)."""
        from hypothesis import given, settings, strategies as st

        from licenta_crawler_ray.functions import extract as E

        alphabet = st.sampled_from(list("ab c\t\n\r\xa0") + ["\x1c", "\x85", " ", "　"])

        @settings(max_examples=300, deadline=None)
        @given(st.lists(alphabet, max_size=30).map("".join))
        def check(s):
            old = E._NL_RUN_RE.sub(
                "\n", E._NL_SPACE_RE.sub("\n", E._HSPACE_RE.sub(" ", s))
            ).strip()
            new = "\n".join(
                p for p in (" ".join(ln.split()) for ln in s.split("\n")) if p
            )
            assert old == new

        check()

    def test_connected_components_vs_union_find(self):
        """Actor-sharded min-label propagation vs a serial union-find."""
        import pandas as pd
        from hypothesis import given, settings, strategies as st

        from licenta_crawler_ray.pipelines.graph import connected_components

        @settings(max_examples=15, deadline=None)
        @given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                        max_size=60))
        def check(edge_list):
            nodes = np.arange(41)
            parent = list(range(41))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for u, v in edge_list:
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
            # canonical: min node id per component
            expected = {}
            for n in nodes:
                r = find(int(n))
                expected.setdefault(r, []).append(int(n))
            exp_label = {}
            for members in expected.values():
                m = min(members)
                for x in members:
                    exp_label[x] = m
            edges = pd.DataFrame({
                "doc_a": [u for u, v in edge_list],
                "doc_b": [v for u, v in edge_list],
            })
            got = connected_components(edges, nodes, num_shards=4)
            assert dict(zip(got["doc_id"], got["group_id"])) == exp_label

        check()

    def test_connected_components_long_chain(self):
        """A 300-node path graph has diameter ≈ 300 — far past any plain
        per-round propagation budget; pointer doubling must converge it
        (round-2 advice: long chains silently split before)."""
        import pandas as pd

        from licenta_crawler_ray.pipelines.graph import connected_components

        n = 300
        edges = pd.DataFrame({"doc_a": np.arange(n - 1),
                              "doc_b": np.arange(1, n)})
        got = connected_components(edges, np.arange(n), num_shards=4,
                                   max_rounds=16)
        assert (got["group_id"] == 0).all()

    def test_pagerank_from_edge_partitions_matches_driver_intake(self):
        """The self-loading sharded form ≡ the driver-intake form, rank
        for rank, on a random graph with dangling and dst-only nodes —
        and at two different shard counts (fixed-point invariance)."""
        import os
        import shutil

        import pandas as pd
        import ray.data as rd

        from licenta_crawler_ray.pipelines.graph import (
            pagerank, pagerank_from_edge_partitions, write_directed_edges)

        rng = np.random.default_rng(11)
        src = rng.integers(0, 400, 3000)
        dst = rng.integers(0, 500, 3000)  # ids 400-499 are dst-only
        pairs = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
        exp = pagerank(pairs, iters=4, num_shards=4)
        for P in (3, 8):
            layout = f"/tmp/lcr_test_pr_layout_{P}"
            shutil.rmtree(layout, ignore_errors=True)
            write_directed_edges(rd.from_pandas(pairs), "src", "dst",
                                 layout, num_shards=P)
            got = pagerank_from_edge_partitions(layout, iters=4,
                                                num_shards=P)
            assert got.equals(exp), P
            # write_dir form: same ranks leave through the shards
            ranks = os.path.join(layout, "ranks")
            n = pagerank_from_edge_partitions(layout, iters=4,
                                              num_shards=P, write_dir=ranks)
            assert n == len(exp)
            import pyarrow.dataset as pads
            w = pads.dataset(ranks, format="parquet").to_table().to_pandas() \
                .sort_values("node").reset_index(drop=True)
            assert w.equals(exp)
            shutil.rmtree(layout, ignore_errors=True)

    def test_pagerank_layout_dedupes_duplicate_pairs_on_load(self):
        """The directed-edge layout accepts a NON-distinct pair stream:
        every copy of (u,v) lands in shard u%P, so the shard loader's
        pair-dedup is globally exact — ranks must equal the distinct
        input's (this is what lets the edge build skip its distinct
        all-to-all and ship per-batch-distinct streams only)."""
        import shutil

        import pandas as pd
        import ray.data as rd

        from licenta_crawler_ray.pipelines.graph import (
            pagerank, pagerank_from_edge_partitions, write_directed_edges)

        rng = np.random.default_rng(23)
        src = rng.integers(0, 300, 2000)
        dst = rng.integers(0, 400, 2000)
        distinct = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
        # triplicate + shuffle row order: cross-batch duplicates guaranteed
        dup = pd.concat([distinct] * 3, ignore_index=True).sample(
            frac=1.0, random_state=7).reset_index(drop=True)
        exp = pagerank(distinct, iters=4, num_shards=4)
        layout = "/tmp/lcr_test_pr_dup_layout"
        shutil.rmtree(layout, ignore_errors=True)
        write_directed_edges(
            rd.from_pandas(dup).repartition(6), "src", "dst",
            layout, num_shards=4)
        got = pagerank_from_edge_partitions(layout, iters=4, num_shards=4)
        assert got.equals(exp)
        shutil.rmtree(layout, ignore_errors=True)

    def test_pagerank_update_overflow_guard(self):
        """The fixed-point update refuses in-mass past the int64 bound
        instead of wrapping silently (round-4 advice)."""
        import pytest as _pytest

        from licenta_crawler_ray.pipelines.graph import _pr_apply_update

        ok = _pr_apply_update(np.array([(2**63 - 1) // 85], dtype=np.int64))
        assert ok[0] > 0
        with _pytest.raises(OverflowError):
            _pr_apply_update(np.array([(2**63 - 1) // 85 + 1], dtype=np.int64))

    def test_minhash_arrow_tokenization_matches_frozen_spec(self):
        """The Arrow split/hash signature path ≡ the scalar frozen-spec
        ``signature()`` per doc, including whitespace runs, empties, and
        exotic unicode separators."""
        from hypothesis import given, settings, strategies as st

        from licenta_crawler_ray.pipelines.textops import MinHasher

        mh = MinHasher()
        word = st.text(alphabet="abcdefgé0.,!", min_size=1, max_size=8)
        # includes NBSP / IDEOGRAPHIC SPACE separators, which route the
        # batch through the scalar fallback path
        sep = st.sampled_from([" ", "  ", "\t", "\n", " \x0b ", "\u2003",
                               "\x1c", "\xa0", "\u3000"])
        doc = st.lists(st.tuples(word, sep), max_size=12).map(
            lambda ps: "".join(w + s for w, s in ps))

        @settings(max_examples=60, deadline=None)
        @given(st.lists(doc, min_size=1, max_size=8))
        def check(texts):
            got = mh.signatures_arrow(pa.array(texts, type=pa.string()))
            for i, t in enumerate(texts):
                assert (got[i] == mh.signature(t)).all(), repr(t)

        check()

    def test_token_hash_lists_arrow_matches_frozen_spec(self):
        """The Arrow verify-set builder ≡ the scalar frozen-spec fallback
        (same hash values, same per-doc sorted order, same offsets) —
        non-ASCII-whitespace docs route the batch through the fallback."""
        from hypothesis import given, settings, strategies as st

        from licenta_crawler_ray.pipelines.textops import (
            _token_hash_lists, _token_hash_lists_scalar)

        word = st.text(alphabet="abcdefgé0.,!", min_size=1, max_size=8)
        sep = st.sampled_from([" ", "  ", "\t", "\n", " \x0b ", " ",
                               "\x1c", "\xa0", "　"])
        doc = st.lists(st.tuples(word, sep), max_size=12).map(
            lambda ps: "".join(w + s for w, s in ps))

        @settings(max_examples=60, deadline=None)
        @given(st.lists(doc, min_size=1, max_size=8))
        def check(texts):
            flat_a, offs_a = _token_hash_lists(pa.array(texts, type=pa.string()))
            flat_s, offs_s = _token_hash_lists_scalar(texts)
            assert np.array_equal(offs_a, offs_s)
            assert np.array_equal(flat_a, flat_s)

        check()

    def test_simhash_arrow_matches_frozen_spec(self):
        """The Arrow SimHasher batch path ≡ the scalar frozen-spec
        ``simhash()`` per doc (and the scalar batch fallback), including
        empty docs and non-ASCII whitespace routed through the fallback."""
        from hypothesis import given, settings, strategies as st

        from licenta_crawler_ray.pipelines.textops import SimHasher

        sh = SimHasher()
        word = st.text(alphabet="abcdefgé0.,!", min_size=1, max_size=8)
        sep = st.sampled_from([" ", "  ", "\t", "\n", " \x0b ", " ",
                               "\x1c", "\xa0", "　"])
        doc = st.lists(st.tuples(word, sep), max_size=12).map(
            lambda ps: "".join(w + s for w, s in ps))

        @settings(max_examples=60, deadline=None)
        @given(st.lists(doc, min_size=1, max_size=8))
        def check(texts):
            t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                          "text": pa.array(texts, pa.string())})
            got = sh(t).column("simhash").to_numpy().view(np.uint64)
            for i, txt in enumerate(texts):
                assert int(got[i]) == sh.simhash(txt), repr(txt)

        check()

    def test_hash_join_skew_salted(self):
        """The shared partitioned hash join: identical output with and
        without skew salting, on a 60%-hot key distribution."""
        import pandas as pd
        import ray.data as rd

        from licenta_crawler_ray.pipelines.joins import hash_join

        rng = np.random.default_rng(7)
        n = 5000
        keys = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 200, n))
        left = pd.DataFrame({"k": keys.astype("int64"),
                             "lv": np.arange(n, dtype="int64")})
        right = pd.DataFrame({"k": np.arange(200, dtype="int64"),
                              "rv": np.arange(200, dtype="int64") * 10,
                              "rname": [f"key-{i}" for i in range(200)]})
        expected = left.merge(right, on="k").sort_values(["k", "lv"]) \
            .reset_index(drop=True)
        for salt in (1, 4):
            got = hash_join(
                rd.from_pandas(left), rd.from_pandas(right), "k",
                num_buckets=8, salt=salt,
            ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
            assert got[expected.columns.tolist()].equals(expected), salt

        import pytest as _pytest
        with _pytest.raises(ValueError, match="collision"):
            hash_join(rd.from_pandas(left), rd.from_pandas(left), "k")

    def test_extract_text_deterministic_and_idempotent_shape(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=50, deadline=None)
        @given(st.text(max_size=200))
        def check(s):
            html = f"<html><body><p>{s.replace('<', '&lt;')}</p></body></html>".encode()
            out1 = extract_text(html)
            out2 = extract_text(html)
            assert out1 == out2
            assert out1 == out1.strip()
            assert "\n\n" not in out1

        check()


class TestBloomSemiJoin:
    def test_no_false_negatives(self):
        """Every inserted key must pass the membership test (prune can never
        drop a true match — the exact verify only sees Bloom survivors)."""
        from licenta_crawler_ray.pipelines.relational import (
            _BLOOM_BITS, _BLOOM_HASHES, _bloom_positions,
        )

        rng = np.random.default_rng(11)
        keys = rng.integers(1, 2**62, size=50_000, dtype=np.int64)
        pos = _bloom_positions(keys).reshape(-1)
        words = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        p = _bloom_positions(keys)
        hit = np.ones(len(keys), dtype=bool)
        for r in range(_BLOOM_HASHES):
            q = p[r]
            hit &= (words[(q >> np.uint64(6)).astype(np.int64)]
                    >> (q & np.uint64(63))) & np.uint64(1) != 0
        assert hit.all()

    def test_prune_rate_on_non_members(self):
        """Fresh keys are pruned at ~(1 - fill^k): with 50k keys in 2^22
        bits the FP rate is well under 1% — the shuffle sees only the
        matching rows plus that trickle."""
        from licenta_crawler_ray.pipelines.relational import (
            _BLOOM_BITS, _BLOOM_HASHES, _bloom_positions,
        )

        rng = np.random.default_rng(12)
        keys = rng.integers(1, 2**62, size=50_000, dtype=np.int64)
        pos = _bloom_positions(keys).reshape(-1)
        words = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        fresh = rng.integers(2**62, 2**63, size=100_000, dtype=np.int64)
        p = _bloom_positions(fresh)
        hit = np.ones(len(fresh), dtype=bool)
        for r in range(_BLOOM_HASHES):
            q = p[r]
            hit &= (words[(q >> np.uint64(6)).astype(np.int64)]
                    >> (q & np.uint64(63))) & np.uint64(1) != 0
        assert hit.mean() < 0.01


class TestPageRank:
    def test_matches_dense_reference(self):
        """Sharded fixed-point PageRank ≡ a single-process numpy loop
        applying the identical integer formula (the arithmetic spec is
        frozen, so any parallelism must be bit-identical)."""
        from licenta_crawler_ray.pipelines.graph import _PR_BASE, pagerank

        rng = np.random.default_rng(13)
        n_nodes, n_edges = 200, 1500
        eu = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        ev = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        import pandas as pd
        edges = pd.DataFrame({"src": eu, "dst": ev}).drop_duplicates()
        got = pagerank(edges, iters=5, num_shards=4)

        key = np.unique(np.stack([edges["src"], edges["dst"]], axis=1), axis=0)
        du, dv = key[:, 0], key[:, 1]
        nodes = np.unique(np.concatenate([du, dv]))
        idx = {v: i for i, v in enumerate(nodes)}
        src_i = np.array([idx[v] for v in du])
        dst_i = np.array([idx[v] for v in dv])
        outdeg = np.bincount(src_i, minlength=len(nodes)).astype(np.int64)
        rank = np.full(len(nodes), _PR_BASE, dtype=np.int64)
        for _ in range(5):
            contrib = np.where(outdeg > 0, rank // np.maximum(outdeg, 1), 0)
            s = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(s, dst_i, contrib[src_i])
            rank = (15 * _PR_BASE) // 100 + (85 * s) // 100
        assert got["node"].to_numpy().tolist() == nodes.tolist()
        assert got["pr"].to_numpy().tolist() == rank.tolist()


class TestEmbeddingPCA:
    def test_matches_numpy_reference(self):
        """Distributed one-pass covariance combiner ≡ single-process numpy
        PCA (same covariance, same eigensolve, same sign rule) up to
        floating summation order."""
        import pyarrow.parquet as pq

        from licenta_crawler_ray.pipelines.similarity import embedding_pca

        sf = "/root/testdata/sf0.001"
        got = embedding_pca(sf, k=2)

        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        m = np.stack([np.asarray(e) for e in t["embedding"].to_pylist()]
                     ).astype(np.float64)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        mean = m.mean(0)
        cov = (m - mean).T @ (m - mean) / len(m)
        w, v = np.linalg.eigh(cov)
        comps = v[:, ::-1][:, :2].T.copy()
        for i in range(2):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        ref = (m - mean) @ comps.T
        assert got["vec_id"].to_numpy().tolist() == ids.tolist()
        np.testing.assert_allclose(
            got[["pc0", "pc1"]].to_numpy(), ref, rtol=1e-8, atol=1e-8)

    def test_shift_stable_on_uncentered_data(self, tmp_path):
        """The Chan pairwise combiner keeps precision when the data mean
        dwarfs the variance (round-4 advice: the naive E[xxT] − μμT form
        cancels catastrophically there): projections on data shifted by
        1e6 must match the unshifted projections."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from licenta_crawler_ray.pipelines.similarity import embedding_pca

        rng = np.random.default_rng(9)
        n, d = 400, 8
        base = rng.normal(0, 1e-3, size=(n, d))  # tiny variance
        for name, shift in (("plain", 0.0), ("shifted", 1e6)):
            m = base + shift
            t = pa.table({
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(m), pa.list_(pa.float64())),
            })
            out = tmp_path / name
            out.mkdir()
            pq.write_table(t, str(out / "embeddings.parquet"))
        plain = embedding_pca(str(tmp_path / "plain"), k=2)
        shifted = embedding_pca(str(tmp_path / "shifted"), k=2)
        np.testing.assert_allclose(
            shifted[["pc0", "pc1"]].to_numpy(),
            plain[["pc0", "pc1"]].to_numpy(), rtol=1e-5, atol=1e-9)
