"""Large-scale text operators over the ``documents`` table.

The training-data-pipeline operator set: language-ID, quality scoring,
token counting (whitespace + BPE-ish regex), document fingerprinting,
exact dedup, n-gram Jaccard near-dup, MinHash+LSH near-dup, SimHash
near-dup. Each runs as vectorized / per-batch ``map_batches`` stages with
partial pre-aggregation before any shuffle; stateful pieces (compiled
regexes, hash permutation tables) live in actor ``__init__``.

SQL-checkable ops share EXACT frozen specs with their DuckDB oracles
(see ``__ray_entry__.oracle_sql``): token = maximal run of non-whitespace;
stopword lists below; tie-breaks documented per function.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..functions.urls import fnv1a64


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# Language ID (stopword-count heuristic) — frozen spec shared with SQL oracle
# ---------------------------------------------------------------------------
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "los", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
}
_LANG_ORDER = ["en", "es", "de", "fr"]  # tie-break: earlier wins; all-zero → 'und'


class LangId:
    """Actor-pool stage: per-doc predicted language by stopword hit count."""

    def __init__(self):
        self.pats = {
            lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b")
            for lang, ws in LANG_STOPWORDS.items()
        }

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        lower = df["text"].str.lower()
        scores = {lang: lower.str.count(p) for lang, p in self.pats.items()}
        sc = pd.DataFrame(scores)
        best = sc[_LANG_ORDER].idxmax(axis=1)  # idxmax: first max in column order
        best[sc.max(axis=1) == 0] = "und"
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": best})


def lang_id(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(LangId, batch_format="pandas", concurrency=2)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_hist(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, columns=["lang"])
        .map_batches(
            lambda df: df.groupby("lang", as_index=False, sort=False).agg(n=("lang", "size")),
            batch_format="pandas",
        )
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Token counting — whitespace + BPE-ish pre-tokenizer regex (both SQL-checkable)
# ---------------------------------------------------------------------------
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # frozen; RE2- and re-compatible


class TokenCount:
    def __init__(self):
        self.ws = re.compile(r"\S+")
        self.bpe = re.compile(BPE_PATTERN)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["text"].str.count(self.ws).astype("int64"),
                "n_bpe_tokens": df["text"].str.count(self.bpe).astype("int64"),
            }
        )


def token_counts(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(TokenCount, batch_format="pandas", concurrency=2)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Quality scoring — integer counts only (hash-stable vs SQL)
# ---------------------------------------------------------------------------
QUALITY_STOPWORDS = ["the", "a", "and", "of", "to", "in"]


class QualityScore:
    def __init__(self):
        self.word = re.compile(r"\S+")
        self.punct = re.compile(r"[.,!?;:]")
        self.stop = re.compile(r"\b(?:" + "|".join(QUALITY_STOPWORDS) + r")\b")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        lower = df["text"].str.lower()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": df["text"].str.len().astype("int64"),
                "n_words": df["text"].str.count(self.word).astype("int64"),
                "n_punct": df["text"].str.count(self.punct).astype("int64"),
                "n_stopwords": lower.str.count(self.stop).astype("int64"),
            }
        )


def quality_scores(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(QualityScore, batch_format="pandas", concurrency=2)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Exact dedup — hash-partitioned first-wins (min doc_id per identical text)
# ---------------------------------------------------------------------------
def exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Keeper doc_ids after exact-content dedup.

    Per-batch: hash text (FNV-1a 64) and keep min doc_id per hash;
    global: ``groupby(text_hash).aggregate(Min)`` over the partials — the
    shuffle moves one row per (batch, distinct text), never the text bodies.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["text"].map(fnv1a64).astype("uint64")
        g = pd.DataFrame({"text_hash": h.astype("int64"), "doc_id": df["doc_id"]})
        return g.groupby("text_hash", as_index=False, sort=False).agg(doc_id=("doc_id", "min"))

    out = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .to_pandas()
    )
    return (
        out[["doc_id"]].astype("int64").sort_values("doc_id").reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Word-set n-gram Jaccard near-dup (exact; SQL-checkable)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """All pairs (a<b) with Jaccard(word-set) ≥ threshold.

    Jaccard = |A∩B| / |A∪B| over DISTINCT whitespace tokens. The corpus
    vocabulary is compact, so word sets become uint64 bitmasks per doc
    (vocab collected in a first distributed pass, broadcast in the second);
    pair comparison is a vectorized popcount matrix block. At 100 TB the
    same two-pass shape holds with LSH pre-bucketing (see minhash) to avoid
    the quadratic pair space; here the exact answer doubles as the oracle
    for the approximate variants.
    """
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    # pass 1: distributed vocab collection (tiny result)
    def words_of(df: pd.DataFrame) -> pd.DataFrame:
        w = set()
        for t in df["text"]:
            w.update(t.split())
        return pd.DataFrame({"word": sorted(w)})

    vocab = sorted(set(docs.map_batches(words_of, batch_format="pandas").to_pandas()["word"]))
    if len(vocab) > 512:
        raise NotImplementedError(
            "bitmask jaccard supports ≤512-word vocabularies; larger corpora "
            "use minhash_lsh_pairs (approximate) instead"
        )
    vocab_ref = ray.put({w: i for i, w in enumerate(vocab)})
    nwords = len(vocab)
    nlimbs = (nwords + 63) // 64

    class Bitmask:
        def __init__(self):
            self.index = ray.get(vocab_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            masks = np.zeros((len(df), nlimbs), dtype=np.uint64)
            for r, t in enumerate(df["text"]):
                for w in set(t.split()):
                    i = self.index[w]
                    masks[r, i >> 6] |= np.uint64(1) << np.uint64(i & 63)
            out = {"doc_id": df["doc_id"].to_numpy()}
            for l in range(nlimbs):
                out[f"m{l}"] = masks[:, l].astype("int64")  # bit-cast for arrow
            return pd.DataFrame(out)

    bm = docs.map_batches(Bitmask, batch_format="pandas", concurrency=2).to_pandas()
    bm = bm.sort_values("doc_id").reset_index(drop=True)
    ids = bm["doc_id"].to_numpy()
    masks = np.stack([bm[f"m{l}"].to_numpy().astype(np.uint64) for l in range(nlimbs)], axis=1)

    # pairwise popcounts via byte-LUT (vectorized); block to bound memory
    popcnt = np.unpackbits(masks.view(np.uint8), axis=1).sum(axis=1)
    n = len(ids)
    out_a, out_b = [], []
    block = 512
    for s in range(0, n, block):
        blk = masks[s : s + block]
        inter = np.zeros((blk.shape[0], n), dtype=np.int64)
        for l in range(nlimbs):
            x = blk[:, l][:, None] & masks[:, l][None, :]
            inter += np.unpackbits(
                x.view(np.uint8).reshape(blk.shape[0], n, 8), axis=2
            ).sum(axis=2)
        union = popcnt[s : s + block][:, None] + popcnt[None, :] - inter
        jac = inter / np.maximum(union, 1)
        ai, bi = np.nonzero(jac >= threshold)
        keep = (s + ai) < bi  # a < b, no self-pairs
        out_a.extend(ids[s + ai[keep]])
        out_b.extend(ids[bi[keep]])
    return (
        pd.DataFrame({"doc_a": np.array(out_a, dtype="int64"),
                      "doc_b": np.array(out_b, dtype="int64")})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the 10^10-scale path; verified against exact)
# ---------------------------------------------------------------------------
NUM_PERM = 64
NUM_BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = NUM_PERM // NUM_BANDS


class MinHasher:
    """Per-batch word-shingle minhash signatures (stateful: permutation salts)."""

    def __init__(self, shingle: int = 1):
        self.shingle = shingle
        rng = np.random.default_rng(0xC0FFEE)
        self.a = rng.integers(1, 2**61, size=NUM_PERM, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61, size=NUM_PERM, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        toks = text.split()
        if self.shingle > 1:
            items = {
                " ".join(toks[i : i + self.shingle])
                for i in range(max(0, len(toks) - self.shingle + 1))
            }
        else:
            items = set(toks)
        if not items:
            return np.full(NUM_PERM, np.uint64(2**63), dtype=np.uint64)
        hs = np.array([fnv1a64(x) for x in items], dtype=np.uint64)
        # universal-hash permutations: min over (a*h + b)
        vals = (hs[:, None] * self.a[None, :]) + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in df["text"]])
        # explode to (band_id, band_hash, doc_id) rows for the LSH groupby
        rows = {"doc_id": np.repeat(df["doc_id"].to_numpy(), NUM_BANDS),
                "band_id": np.tile(np.arange(NUM_BANDS, dtype=np.int32), len(df))}
        bands = sigs.reshape(len(df), NUM_BANDS, ROWS_PER_BAND)
        bh = np.zeros((len(df), NUM_BANDS), dtype=np.uint64)
        for r in range(ROWS_PER_BAND):
            bh = bh * np.uint64(0x100000001B3) + bands[:, :, r]
        rows["band_hash"] = bh.reshape(-1).astype("int64")
        return pd.DataFrame(rows)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    shingle → minhash → (band_id, band_hash) explode → groupby bucket →
    candidate pairs → exact word-set Jaccard verify ≥ threshold. The
    verify step re-reads only candidate docs (broadcast candidate id set).
    """
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    bands = docs.map_batches(MinHasher, batch_format="pandas", concurrency=2)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")

    # exact verify on candidates only
    need = set(cand["doc_a"]).union(cand["doc_b"])
    texts = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda df: df[df["doc_id"].isin(need)], batch_format="pandas"
        )
        .to_pandas()
    )
    word_sets = {r.doc_id: set(r.text.split()) for r in texts.itertuples()}
    keep = []
    for r in cand.itertuples():
        A, B = word_sets[r.doc_a], word_sets[r.doc_b]
        inter = len(A & B)
        union = len(A) + len(B) - inter
        if union and inter / union >= threshold:
            keep.append((r.doc_a, r.doc_b))
    return (
        pd.DataFrame(keep, columns=["doc_a", "doc_b"])
        .astype("int64")
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------
class SimHasher:
    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in set(text.split()):
            h = fnv1a64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": np.array(
                    [self.simhash(t) for t in df["text"]], dtype=np.uint64
                ).astype("int64"),
            }
        )


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Pairs with simhash hamming distance ≤ ``max_hamming``.

    Signatures computed distributed; the pair scan blocks over the compact
    (doc_id, simhash) table. At 10^10 scale the scan becomes 4-table
    rotation bucketing (Manku et al., WWW'07); signature computation — the
    expensive part — is unchanged.
    """
    sig = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(SimHasher, batch_format="pandas", concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    ids = sig["doc_id"].to_numpy()
    hs = sig["simhash"].to_numpy().astype(np.uint64)
    out_a, out_b = [], []
    block = 1024
    n = len(ids)
    for s in range(0, n, block):
        x = hs[s : s + block][:, None] ^ hs[None, :]
        d = np.unpackbits(x.view(np.uint8).reshape(x.shape[0], n, 8), axis=2).sum(axis=2)
        ai, bi = np.nonzero(d <= max_hamming)
        keep = (s + ai) < bi
        out_a.extend(ids[s + ai[keep]])
        out_b.extend(ids[bi[keep]])
    return (
        pd.DataFrame({"doc_a": np.array(out_a, dtype="int64"),
                      "doc_b": np.array(out_b, dtype="int64")})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling hash / winnowing-style)
# ---------------------------------------------------------------------------
class Fingerprinter:
    """Min-sampled rolling-hash fingerprint (k-gram winnowing flavor)."""

    def __init__(self, k: int = 8):
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fps = []
        for t in df["text"]:
            b = t.encode("utf-8")
            if len(b) < self.k:
                fps.append(fnv1a64(t))
                continue
            best = np.uint64(0xFFFFFFFFFFFFFFFF)
            h = 0
            # FNV over each k-gram via recomputation on a stride for bound cost
            for i in range(0, len(b) - self.k + 1):
                h = 0xCBF29CE484222325
                for c in b[i : i + self.k]:
                    h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                if h < best:
                    best = h
            fps.append(int(best))
        return pd.DataFrame(
            {"doc_id": df["doc_id"],
             "fingerprint": np.array(fps, dtype=np.uint64).astype("int64")}
        )


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(Fingerprinter, batch_format="pandas", concurrency=2)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)
