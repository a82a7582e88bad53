"""The frozen HTML → text / link extraction kernels (the north invariant).

The reference sanitized with jsoup then extracted links/text in-flight
(``HtmlUtil.sanitizeHtml`` called at ``BrowserCrawler.java:169``; product-link
selector ``[class*='produ']:has(img):has(a)`` at ``BrowserCrawler.java:155``;
pagination XPath at ``BrowserCrawler.java:43``). jsoup's exact whitespace
model is not reproducible from the missing core module, so per SURVEY §7.3
this module *pins* ONE deterministic spec, used by BOTH the single-process
oracle and the Ray pipeline — never two implementations. Byte-identical
per-url output is the correctness gate (``BASELINE.json.input_hint``).

EXTRACTION SPEC (frozen — do not change without regenerating fixtures):
 1. Drop HTML comments and everything inside <script> <style> <noscript>
    <template> elements.
 2. Every other tag boundary of a BLOCK-level element emits '\n'; inline
    tags emit ''. <br> emits '\n'.
 3. Remaining text nodes are entity-unescaped (html.unescape) and NFC
    normalized.
 4. Runs of spaces/tabs (and any unicode whitespace except '\n') collapse to
    one space; spaces adjacent to newlines are dropped; runs of newlines
    collapse to one; leading/trailing whitespace stripped.

Implementation is a single compiled-regex pass over the document (no
HTML-parser dependency → version-independent determinism) — valid because
kernels only ever see the synthetic corpus, which is well-formed.
"""

from __future__ import annotations

import gzip
import html as _html
import re
import unicodedata
from typing import NamedTuple

# Block-level elements whose boundaries become newlines (frozen list).
_BLOCK_TAGS = (
    "address|article|aside|blockquote|body|br|caption|dd|div|dl|dt|fieldset|"
    "figcaption|figure|footer|form|h1|h2|h3|h4|h5|h6|head|header|hr|html|li|"
    "main|nav|ol|option|p|pre|section|select|table|tbody|td|tfoot|th|thead|"
    "title|tr|ul"
)

_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_DROP_RE = re.compile(
    rb"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_BLOCK_TAG_RE = re.compile(
    ("</?(?:%s)\\b[^>]*>" % _BLOCK_TAGS).encode(), re.I
)
_ANY_TAG_RE = re.compile(rb"<[^>]*>")
_DOCTYPE_RE = re.compile(rb"<![^>]*>")
# unicode horizontal whitespace (incl. NBSP after unescape); kept as the
# executable definition of steps 4's character classes — extract_text now
# applies them via the equivalent (tested) split/join fast path
_HSPACE_RE = re.compile(r"[^\S\n]+")
_NL_SPACE_RE = re.compile(r" ?\n ?")
_NL_RUN_RE = re.compile(r"\n+")


def extract_text(html_bytes: bytes) -> str:
    """html bytes → extracted text per the frozen spec above. Deterministic."""
    b = _COMMENT_RE.sub(b"", html_bytes)
    b = _DROP_RE.sub(b"", b)
    b = _DOCTYPE_RE.sub(b"", b)
    b = _BLOCK_TAG_RE.sub(b"\n", b)
    b = _ANY_TAG_RE.sub(b"", b)
    s = b.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    s = unicodedata.normalize("NFC", s)
    # whitespace steps of the spec via C-speed split/join — verified exactly
    # equivalent to the regex form (`[^\S\n]+`→' ', ' ?\n ?'→'\n', '\n+'→'\n',
    # strip): str.split() and re's \s agree on every codepoint, per-line
    # split() collapses hspace runs and strips line ends, and the filtered
    # join collapses newline runs. ~10x less memory traffic per page — the
    # whitespace passes dominated extract cost on heavy pages.
    return "\n".join(
        p for p in (" ".join(ln.split()) for ln in s.split("\n")) if p
    )


# ---------------------------------------------------------------------------
# Product-link extraction (operator O3, ``BrowserCrawler.java:153-164``)
# ---------------------------------------------------------------------------
# Reference: CSS ``[class*='produ']:has(img):has(a)`` narrowed to leaf-most
# matches, then selectFirst("a[href]").absUrl("href"), preserving document
# order. Rebuild spec: scan elements whose class attribute contains 'produ';
# within each, require an <img ...> and take the FIRST href of an <a ...>
# before the element's closing tag; leaf-most = a matching element that
# contains no other matching element (the regex scan below finds each opening
# tag and reads forward only to its own closing tag, so nested outer matches
# that also contain inner matches are rejected when an inner match exists).

_PRODU_OPEN_RE = re.compile(
    rb"<(\w+)\b[^>]*\bclass\s*=\s*(?:\"[^\"]*produ[^\"]*\"|'[^']*produ[^']*')[^>]*>",
    re.I,
)
_HREF_RE = re.compile(rb"<a\b[^>]*\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)')", re.I)
_IMG_RE = re.compile(rb"<img\b", re.I)


def _element_span(html: bytes, open_match: re.Match) -> tuple[int, int]:
    """(content_start, content_end) of the element opened at ``open_match``,
    by counting same-tag open/close pairs (well-formed synthetic HTML)."""
    tag = open_match.group(1)
    open_re = re.compile(rb"<" + re.escape(tag) + rb"\b[^>]*>", re.I)
    close_re = re.compile(rb"</" + re.escape(tag) + rb"\s*>", re.I)
    pos = open_match.end()
    depth = 1
    while depth:
        m_open = open_re.search(html, pos)
        m_close = close_re.search(html, pos)
        if m_close is None:
            return open_match.end(), len(html)
        if m_open is not None and m_open.start() < m_close.start():
            depth += 1
            pos = m_open.end()
        else:
            depth -= 1
            pos = m_close.end()
    return open_match.end(), pos - len(m_close.group(0))


def extract_product_links(html_bytes: bytes, base_url: str) -> list[str]:
    """Absolutized product hrefs in document order (leaf-most 'produ' blocks)."""
    from .urls import absolutize

    spans: list[tuple[int, int, int]] = []  # (content_start, content_end, order)
    for m in _PRODU_OPEN_RE.finditer(html_bytes):
        cs, ce = _element_span(html_bytes, m)
        spans.append((cs, ce, m.start()))
    # leaf-most: drop any span that strictly contains another matching span
    leaf = [
        (cs, ce, st)
        for (cs, ce, st) in spans
        if not any(cs < cs2 and ce2 <= ce for (cs2, ce2, st2) in spans if (cs2, ce2) != (cs, ce))
    ]
    out: list[str] = []
    for cs, ce, _ in sorted(leaf, key=lambda t: t[2]):
        content = html_bytes[cs:ce]
        if not _IMG_RE.search(content):
            continue
        a = _HREF_RE.search(content)
        if a is None:
            continue
        href = (a.group(1) or a.group(2) or b"").decode("utf-8", errors="replace")
        url = absolutize(base_url, href)
        if url:
            out.append(url)
    return out


# ---------------------------------------------------------------------------
# Pagination successor (operator O4, ``BrowserCrawler.java:43,172-194``)
# ---------------------------------------------------------------------------
# Reference XPath: //ul[contains(@class,'pagination')]/li[contains(@class,
# 'active')]/following-sibling::li[not(contains(@class,'disabled'))][1]/a.
# Rebuild spec: inside the first <ul class~pagination>, find the <li ...
# active ...>, then the first following <li> NOT containing 'disabled' in its
# class; return its first <a href> absolutized, else None.

_UL_PAG_RE = re.compile(
    rb"<ul\b[^>]*\bclass\s*=\s*(?:\"[^\"]*pagination[^\"]*\"|'[^']*pagination[^']*')[^>]*>(.*?)</ul\s*>",
    re.I | re.S,
)
_LI_RE = re.compile(rb"<li\b([^>]*)>(.*?)</li\s*>", re.I | re.S)


def extract_next_page(html_bytes: bytes, base_url: str) -> str | None:
    """URL of the pagination successor shelf, or None at chain end."""
    from .urls import absolutize

    ul = _UL_PAG_RE.search(html_bytes)
    if ul is None:
        return None
    lis = list(_LI_RE.finditer(ul.group(1)))
    active_idx = None
    for i, li in enumerate(lis):
        attrs = li.group(1)
        if re.search(rb"\bclass\s*=\s*(?:\"[^\"]*active[^\"]*\"|'[^']*active[^']*')", attrs, re.I):
            active_idx = i
            break
    if active_idx is None:
        return None
    for li in lis[active_idx + 1:]:
        attrs = li.group(1)
        if re.search(rb"\bclass\s*=\s*(?:\"[^\"]*disabled[^\"]*\"|'[^']*disabled[^']*')", attrs, re.I):
            continue
        a = _HREF_RE.search(li.group(2))
        if a is None:
            return None
        href = (a.group(1) or a.group(2) or b"").decode("utf-8", errors="replace")
        return absolutize(base_url, href) or None
    return None


# ---------------------------------------------------------------------------
# Sitemap parsing (operator O8, ``SitemapSaxCrawler.java:69-87``) + gunzip (O7)
# ---------------------------------------------------------------------------

class SitemapResult(NamedTuple):
    is_index: bool
    urls: list[str]  # child sitemap URLs when is_index, else page URLs


# namespace-prefix tolerant (<sm:loc>, <ns1:sitemapindex> …): crawler-commons
# parses the full sitemap protocol with namespaces (SitemapSaxCrawler.java:69-70);
# real-world sitemaps routinely carry a prefix, so the scan accepts an
# optional `prefix:` on both tags (the prefix must match within a tag pair)
_LOC_RE = re.compile(rb"<(?:\w+:)?loc\s*>\s*(.*?)\s*</(?:\w+:)?loc\s*>", re.I | re.S)
_SITEMAPINDEX_RE = re.compile(rb"<\s*(?:\w+:)?sitemapindex\b", re.I)
_GZIP_MAGIC = b"\x1f\x8b"


def maybe_gunzip(data: bytes) -> bytes:
    """Gunzip when gzip-framed (``SitemapSaxCrawler.java:63-66`` sniffing)."""
    if data[:2] == _GZIP_MAGIC:
        return gzip.decompress(data)
    return data


def parse_sitemap(data: bytes) -> SitemapResult:
    """Parse a (possibly gzipped) sitemap or sitemap-index document.

    Index documents (``<sitemapindex>``) yield child sitemap URLs that the
    wave loop re-enqueues FIFO (the reference's queue recursion,
    ``SitemapSaxCrawler.java:72-77``); leaf documents yield page URLs.
    """
    data = maybe_gunzip(data)
    is_index = _SITEMAPINDEX_RE.search(data) is not None
    urls = [
        _html.unescape(m.group(1).decode("utf-8", errors="replace"))
        for m in _LOC_RE.finditer(data)
    ]
    return SitemapResult(is_index=is_index, urls=urls)
