"""URL scalar functions (SURVEY.md §2.6).

Reference equivalents: ``HtmlUtil.getDomainOfUrl`` (called at
``CrawlJobResource.java:73``), ``absUrl`` (``BrowserCrawler.java:160``),
URI parse + host compare (``CrawlJobResource.java:127-131``), URL-decode +
relative resolve (``SitemapSaxCrawler.java:115-116``).

All pure, deterministic, stdlib-only; vectorized wrappers operate on Arrow
string arrays and return Arrow arrays so they can run zero-copy-in inside
``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse, unquote

import numpy as np
import pyarrow as pa


def host_of_url(url: str) -> str:
    """Registrable host of an absolute URL ('' when unparseable).

    Mirrors ``HtmlUtil.getDomainOfUrl`` [inferred] / ``URI.getHost()``
    (``CrawlJobResource.java:127-131``): lowercased netloc without port or
    userinfo.
    """
    try:
        netloc = urlparse(url).netloc
    except ValueError:
        return ""
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if ":" in netloc:
        netloc = netloc.split(":", 1)[0]
    return netloc.lower()


def absolutize(base: str, href: str) -> str:
    """Resolve ``href`` against ``base`` (jsoup ``absUrl`` / ``new URL(url, loc)``)."""
    try:
        return urljoin(base, href)
    except ValueError:
        return ""


def url_decode(url: str) -> str:
    """Percent-decode (``URLDecoder.decode``, ``SitemapSaxCrawler.java:115``)."""
    return unquote(url)


def is_valid_http_url(url: str) -> bool:
    """Well-formed absolute http(s) URL (job admission, ``CrawlJobResource.java:97-100``)."""
    try:
        p = urlparse(url)
    except ValueError:
        return False
    return p.scheme in ("http", "https") and bool(p.netloc)


def same_host(a: str, b: str) -> bool:
    """Seed/homepage host equality check (``CrawlJobResource.java:121-139``)."""
    ha, hb = host_of_url(a), host_of_url(b)
    return bool(ha) and ha == hb


# ---------------------------------------------------------------------------
# Vectorized wrappers (Arrow in / Arrow out)
# ---------------------------------------------------------------------------

def hosts_of_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``host_of_url`` over an Arrow string array of ABSOLUTE
    urls — one ``extract_regex`` kernel, no per-row Python. Matches
    ``host_of_url`` exactly on scheme-qualified urls (property-tested);
    scheme-less input (which the validators reject upstream) yields ''."""
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(
        urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#]*@)?(?P<h>[^/?#:@]*)"
    )
    host = pc.struct_field(m, "h")
    return pc.if_else(
        pc.is_null(host), pa.scalar("", pa.string()), pc.utf8_lower(host)
    )


_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def fnv1a64(s: str) -> int:
    """Deterministic 64-bit FNV-1a hash of a UTF-8 string.

    Used everywhere a stable partition key is needed (host buckets, url
    shards, cuckoo fingerprints) — Python's builtin ``hash`` is salted per
    process and therefore unusable across Ray workers.
    """
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_bytes_np(data: np.ndarray, offsets: np.ndarray = None,
                     starts: np.ndarray = None,
                     lengths: np.ndarray = None) -> np.ndarray:
    """Vectorized FNV-1a over byte slices of a flat buffer.

    Either ``offsets`` (N+1 entries for N adjacent strings) or explicit
    ``starts``/``lengths`` (slices need not be adjacent — e.g. tokens cut
    out of a document buffer). Returns uint64[N]. Iterates
    byte-position-wise (max string length passes), not row-wise —
    O(max_len) numpy ops instead of a Python loop over rows, which
    matters at 10^10-URL scale.
    """
    if offsets is not None:
        starts = offsets[:-1].astype(np.int64)
        lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    else:
        starts = starts.astype(np.int64)
        lengths = lengths.astype(np.int64)
    n = len(starts)
    h = np.full(n, _FNV64_OFFSET, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    for i in range(max_len):
        live = lengths > i
        idx = starts[live] + i
        b = data[idx].astype(np.uint64)
        hl = h[live]
        hl = (hl ^ b) * _FNV64_PRIME  # uint64 wraps naturally
        h[live] = hl
    return h


def hash_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 FNV-1a hash of each element of an Arrow string array (vectorized)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = arr.cast(pa.large_string())
    buf_offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                                count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return fnv1a64_bytes_np(data, buf_offsets)


# 16-bit-chunk popcount lookup: ~10x faster than np.unpackbits on this
# numpy (1.26 has no np.bitwise_count); 64 KiB table built once per process
_POPCNT16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def popcount_u64(x: np.ndarray) -> np.ndarray:
    """Elementwise popcount of a uint64 array (any shape), as int64."""
    v = np.ascontiguousarray(x).view(np.uint16).reshape(x.shape + (4,))
    return _POPCNT16[v].sum(axis=-1, dtype=np.int64)


def host_bucket(hosts: pa.Array | pa.ChunkedArray, num_buckets: int) -> pa.Array:
    """Stable bucket id per host — the engine-wide partitioning key.

    One partitioning key, reused across politeness gating, fetch probes and
    output layout (SURVEY §4: host-hash partitioning is the core physical
    design decision).
    """
    h = hash_strings(hosts)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


# ---------------------------------------------------------------------------
# Priority encoding (SURVEY §2.5 / §4 ordering rule)
# ---------------------------------------------------------------------------
# priority = seed_idx * 2^44 + depth * 2^30 + doc_order, all int64 — a single
# sortable key encoding the reference's lexicographic visit order
# (seeds in order → pagination depth → document order of links).
# The doc field is 30 bits so hierarchical sitemap FIFO slots
# (slot * 2^14 + page_idx, slot < 2^16 — see oracle.SITEMAP_SLOT_CAP) can
# never overflow into the depth bits; a 2-level index under the previous
# 24-bit field could.
_DEPTH_BITS = 14
_DOC_BITS = 30


def encode_priority(seed_idx, depth, doc_order):
    """Encode (seed_idx, depth, doc_order) into one sortable int64.

    Accepts scalars or numpy arrays. Caps: depth < 2^14, doc_order < 2^30,
    seed_idx < 2^19 — far beyond any real crawl frontier's fan-out.
    """
    si = np.asarray(seed_idx, dtype=np.int64)
    d = np.asarray(depth, dtype=np.int64)
    o = np.asarray(doc_order, dtype=np.int64)
    return (si << (_DEPTH_BITS + _DOC_BITS)) | (d << _DOC_BITS) | o


def decode_priority(priority):
    """Inverse of :func:`encode_priority` → (seed_idx, depth, doc_order)."""
    p = np.asarray(priority, dtype=np.int64)
    o = p & ((1 << _DOC_BITS) - 1)
    d = (p >> _DOC_BITS) & ((1 << _DEPTH_BITS) - 1)
    si = p >> (_DEPTH_BITS + _DOC_BITS)
    return si, d, o
