"""Per-page enrichment kernels — ingest-time text analysis (SURVEY + brief).

A production crawl pipeline annotates every fetched page at ingest with the
signals later stages (dedup, quality filtering, language routing) need, so
the expensive text pass happens once, where the bytes already are. The
kernels here are the per-row forms of the corpus-level operators in
``pipelines/textops.py`` (same regexes / hash functions — one spec).

All state (compiled regexes, permutation salts) is built once per
:class:`TextEnricher` instance — actor-pool lifecycle.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .urls import hash_strings

_FNV_PRIME = np.uint64(0x100000001B3)


def rolling_min_hash(data: bytes, k: int = 16) -> int:
    """Winnowing-style fingerprint: min over all k-gram polynomial hashes.

    Vectorized O(n) numpy (uint64 wraparound arithmetic; the base is odd so
    it is invertible mod 2^64): window sums of ``b[i] * B^(n-1-i)`` are
    differences of a cumulative sum, renormalized by powers of B^-1.
    """
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b)
    B = _FNV_PRIME
    if n < k:
        h = np.uint64(0xCBF29CE484222325)
        for c in data:
            h = (h ^ np.uint64(c)) * B
        return int(h)
    powB = np.empty(n, dtype=np.uint64)
    powB[0] = 1
    np.multiply.accumulate(np.full(n - 1, B, dtype=np.uint64), out=powB[1:])
    weights = powB[::-1]  # B^(n-1-i)
    csum = np.cumsum(b * weights, dtype=np.uint64)
    wsum = csum[k - 1:].copy()
    wsum[1:] -= csum[: n - k]
    Binv = np.uint64(pow(int(B), -1, 1 << 64))
    powInv = np.empty(n - k + 1, dtype=np.uint64)
    powInv[0] = 1
    np.multiply.accumulate(np.full(n - k, Binv, dtype=np.uint64), out=powInv[1:])
    h = wsum * powInv[::-1]  # normalize so H[i] = sum b[i+j] * B^(k-1-j)
    return int(h.min())


class TextEnricher:
    """Batch text → analysis columns (token counts, quality, lang, hashes)."""

    LANG_STOPWORDS = {
        "en": ["the", "and", "of", "to", "a"],
        "es": ["el", "la", "de", "los", "y"],
        "de": ["der", "die", "das", "und", "ist"],
        "fr": ["le", "la", "les", "et", "des"],
    }
    LANG_ORDER = ["en", "es", "de", "fr"]

    def __init__(self):
        self.ws = re.compile(r"\S+")
        self.bpe = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        self.punct = re.compile(r"[.,!?;:]")
        self.lang_pats = {
            lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b")
            for lang, ws in self.LANG_STOPWORDS.items()
        }

    def _simhash(self, words: list[str], word_hash: dict[str, int]) -> int:
        if not words:
            return 0
        hs = np.fromiter((word_hash[w] for w in words), dtype=np.uint64, count=len(words))
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
        out = np.uint64(0)
        out |= np.packbits((acc > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return int(out)

    # fingerprint covers the first FP_CAP bytes (winnowing prefix —
    # keeps the numpy rolling pass off the memory-bandwidth critical path)
    FP_CAP = 4096

    def enrich(self, texts: list[str]) -> dict[str, pa.Array]:
        """Single-pass-per-doc design: the text is split ONCE; every other
        signal (token count, lang-id via stopword counts, simhash) derives
        from the word list / a Counter over it, avoiding repeated regex
        scans of the full text (memory-bandwidth dominated at high worker
        counts)."""
        n = len(texts)
        n_tokens = np.empty(n, dtype=np.int64)
        n_chars = np.empty(n, dtype=np.int64)
        n_punct = np.empty(n, dtype=np.int64)
        lang = []
        simhash = np.empty(n, dtype=np.int64)
        fingerprint = np.empty(n, dtype=np.int64)
        word_lists = [t.split() for t in texts]
        # one vectorized FNV pass over the batch's distinct words
        distinct = sorted({w for ws in word_lists for w in set(ws)})
        if distinct:
            wh = dict(zip(distinct, hash_strings(pa.array(distinct, type=pa.string()))))
        else:
            wh = {}
        all_stop = frozenset(w for ws in self.LANG_STOPWORDS.values() for w in ws)
        for i, t in enumerate(texts):
            words = word_lists[i]
            n_tokens[i] = len(words)
            n_chars[i] = len(t)
            n_punct[i] = sum(t.count(c) for c in ".,!?;:")
            # stopword hit counts: lower the whole text once (C-speed) and
            # count only stopword tokens via one set-gated pass — same counts
            # as a full Counter over lowered words, without hashing every word
            counts: dict[str, int] = {}
            for w in t.lower().split():
                if w in all_stop:
                    counts[w] = counts.get(w, 0) + 1
            scores = [
                sum(counts.get(w, 0) for w in self.LANG_STOPWORDS[l])
                for l in self.LANG_ORDER
            ]
            best = max(scores) if scores else 0
            lang.append("und" if best == 0 else self.LANG_ORDER[scores.index(best)])
            simhash[i] = np.uint64(
                self._simhash(sorted(set(words)), wh)
            ).astype(np.int64)
            fingerprint[i] = np.uint64(
                rolling_min_hash(t.encode("utf-8")[: self.FP_CAP])
            ).astype(np.int64)
        return {
            "n_tokens": pa.array(n_tokens),
            "n_chars": pa.array(n_chars),
            "n_punct": pa.array(n_punct),
            "lang_pred": pa.array(lang, type=pa.string()),
            "simhash": pa.array(simhash),
            "fingerprint": pa.array(fingerprint),
        }


ENRICH_FIELDS = [
    ("n_tokens", pa.int64()),
    ("n_chars", pa.int64()),
    ("n_punct", pa.int64()),
    ("lang_pred", pa.string()),
    ("simhash", pa.int64()),
    ("fingerprint", pa.int64()),
]


def null_enrichment(n: int) -> dict[str, pa.Array]:
    """Null-filled enrichment columns (for discovery-only records)."""
    return {
        name: pa.nulls(n, typ) for name, typ in ENRICH_FIELDS
    }
