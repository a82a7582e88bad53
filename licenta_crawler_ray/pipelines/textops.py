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
        .map_batches(LangId, batch_format="pandas", concurrency=(1, 2))
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def lang_hist(sf_dir: str) -> pd.DataFrame:
    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("lang").aggregate([("lang", "count")]).rename_columns(["lang", "n"])

    out = (
        _docs(sf_dir, columns=["lang"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
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
        .map_batches(TokenCount, batch_format="pandas", concurrency=(1, 2))
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
        .map_batches(QualityScore, batch_format="pandas", concurrency=(1, 2))
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

    from ..functions.urls import hash_strings

    def partial(t: pa.Table) -> pa.Table:
        h = hash_strings(t.column("text")).view(np.int64)  # vectorized FNV-1a
        tt = pa.table({"text_hash": pa.array(h), "doc_id": t.column("doc_id")})
        g = tt.group_by("text_hash").aggregate([("doc_id", "min")])
        return g.rename_columns(["text_hash", "doc_id"])

    out = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
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
def _word_bitmasks(sf_dir: str):
    """Distributed word-set → uint64-bitmask computation (shared by the
    exact Jaccard op and the MinHash verify step).

    Pass 1 collects the vocabulary (tiny result, distributed scan); pass 2
    broadcasts the word index and emits one fixed-width bitmask row per doc.
    Returns (ids, masks[n, nlimbs], popcnt). Raises NotImplementedError for
    vocabularies > 512 words (bigger corpora verify with per-pair sets).
    """
    docs = _docs(sf_dir, columns=["doc_id", "text"])

    def words_of(df: pd.DataFrame) -> pd.DataFrame:
        w = set()
        for t in df["text"]:
            w.update(t.split())
        return pd.DataFrame({"word": sorted(w)})

    vocab = sorted(set(docs.map_batches(words_of, batch_format="pandas").to_pandas()["word"]))
    if len(vocab) > 512:
        raise NotImplementedError(
            "bitmask jaccard supports <=512-word vocabularies; larger corpora "
            "verify candidates with per-pair sets / minhash_lsh_pairs"
        )
    vocab_ref = ray.put({w: i for i, w in enumerate(vocab)})
    nlimbs = (len(vocab) + 63) // 64

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

    bm = docs.map_batches(Bitmask, batch_format="pandas", concurrency=(1, 2)).to_pandas()
    bm = bm.sort_values("doc_id").reset_index(drop=True)
    ids = bm["doc_id"].to_numpy()
    masks = np.stack([bm[f"m{l}"].to_numpy().astype(np.uint64) for l in range(nlimbs)], axis=1)
    popcnt = np.unpackbits(masks.view(np.uint8), axis=1).sum(axis=1).astype(np.int64)
    return ids, masks, popcnt


def _pair_jaccard(masks: np.ndarray, popcnt: np.ndarray, ai: np.ndarray, bi: np.ndarray) -> np.ndarray:
    """Vectorized Jaccard for explicit index pairs (positions, not doc ids)."""
    nlimbs = masks.shape[1]
    inter = np.zeros(len(ai), dtype=np.int64)
    for l in range(nlimbs):
        x = masks[ai, l] & masks[bi, l]
        inter += np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)
    union = popcnt[ai] + popcnt[bi] - inter
    return inter / np.maximum(union, 1)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """All pairs (a<b) with Jaccard(word-set) >= threshold (exact).

    Jaccard over DISTINCT whitespace tokens; word sets are uint64 bitmasks
    (:func:`_word_bitmasks`), pair comparison is a vectorized popcount
    matrix block. At 100 TB the same shape runs after LSH pre-bucketing
    (see minhash) to avoid the quadratic pair space; here the exact answer
    doubles as the oracle for the approximate variants.
    """
    ids, masks, popcnt = _word_bitmasks(sf_dir)
    state_ref = ray.put({"ids": ids, "masks": masks, "popcnt": popcnt})
    n = len(ids)
    block = 512

    def block_score(df: pd.DataFrame) -> pd.DataFrame:
        # stateless task: the broadcast state resolves zero-copy from the
        # local object store per task (no actor pool spin-up for ~10 tasks)
        st = ray.get(state_ref)
        ids_l, masks_l, popcnt_l = st["ids"], st["masks"], st["popcnt"]
        nlimbs = masks_l.shape[1]
        N = len(ids_l)
        out_a, out_b = [], []
        for s in df["start"]:
            s = int(s)
            blk = masks_l[s : s + block]
            inter = np.zeros((blk.shape[0], N), dtype=np.int64)
            for l in range(nlimbs):
                x = blk[:, l][:, None] & masks_l[:, l][None, :]
                inter += np.unpackbits(
                    x.view(np.uint8).reshape(blk.shape[0], N, 8), axis=2
                ).sum(axis=2).astype(np.int64)
            union = popcnt_l[s : s + block][:, None] + popcnt_l[None, :] - inter
            jac = inter / np.maximum(union, 1)
            ai, bi = np.nonzero(jac >= threshold)
            keep = (s + ai) < bi  # a < b, no self-pairs
            out_a.append(ids_l[s + ai[keep]])
            out_b.append(ids_l[bi[keep]])
        return pd.DataFrame({
            "doc_a": np.concatenate(out_a).astype("int64") if out_a else
                     np.array([], dtype="int64"),
            "doc_b": np.concatenate(out_b).astype("int64") if out_b else
                     np.array([], dtype="int64"),
        })

    starts = pa.table({"start": pa.array(range(0, n, block), type=pa.int64())})
    out = (
        rd.from_arrow(starts)
        .map_batches(block_score, batch_format="pandas", batch_size=1)
        .to_pandas()
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the 10^10-scale path; verified against exact)
# ---------------------------------------------------------------------------
NUM_PERM = 128
NUM_BANDS = 16  # 16 bands x 8 rows: S-curve threshold (1/16)^(1/8) ~= 0.71
ROWS_PER_BAND = NUM_PERM // NUM_BANDS
_PAIR_PARTITIONS = 64  # hash-partitions for the bucket-pair shuffle


class MinHasher:
    """Per-batch word-shingle minhash signatures (stateful: permutation salts).

    Shingle hashing is vectorized: the batch's distinct shingles hash once
    through the byte-position FNV kernel, then 128 universal-hash
    permutations reduce per doc with a single (shingles x perms) min.
    """

    def __init__(self, shingle: int = 1):
        self.shingle = shingle
        rng = np.random.default_rng(0xC0FFEE)
        self.a = rng.integers(1, 2**61, size=NUM_PERM, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**61, size=NUM_PERM, dtype=np.uint64)

    def _shingles(self, text: str) -> set[str]:
        toks = text.split()
        if self.shingle > 1:
            return {
                " ".join(toks[i : i + self.shingle])
                for i in range(max(0, len(toks) - self.shingle + 1))
            }
        return set(toks)

    def signature(self, text: str) -> np.ndarray:
        items = self._shingles(text)
        if not items:
            return np.full(NUM_PERM, np.uint64(2**63), dtype=np.uint64)
        hs = np.array([fnv1a64(x) for x in items], dtype=np.uint64)
        vals = (hs[:, None] * self.a[None, :]) + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # hash each distinct shingle in the batch ONCE (vectorized FNV),
        # then per-doc min over its shingles' permuted hashes
        from ..functions.urls import hash_strings
        import pyarrow as _pa

        doc_shingles = [sorted(self._shingles(t)) for t in df["text"]]
        flat = [w for ds_ in doc_shingles for w in ds_]
        if flat:
            uniq = sorted(set(flat))
            uh = hash_strings(_pa.array(uniq, type=_pa.string()))
            hmap = dict(zip(uniq, uh))
        sigs = np.empty((len(df), NUM_PERM), dtype=np.uint64)
        for r, ds_ in enumerate(doc_shingles):
            if not ds_:
                sigs[r] = np.uint64(2**63)
                continue
            hs = np.fromiter((hmap[w] for w in ds_), dtype=np.uint64, count=len(ds_))
            vals = (hs[:, None] * self.a[None, :]) + self.b[None, :]
            sigs[r] = vals.min(axis=0)
        # explode to (bucket, band_id, band_hash, doc_id) rows
        rows = {"doc_id": np.repeat(df["doc_id"].to_numpy(), NUM_BANDS),
                "band_id": np.tile(np.arange(NUM_BANDS, dtype=np.int32), len(df))}
        bands = sigs.reshape(len(df), NUM_BANDS, ROWS_PER_BAND)
        bh = np.zeros((len(df), NUM_BANDS), dtype=np.uint64)
        for r in range(ROWS_PER_BAND):
            bh = bh * np.uint64(0x100000001B3) + bands[:, :, r]
        rows["band_hash"] = bh.reshape(-1).astype("int64")
        # hash-partition key: ONE groupby over 64 partitions instead of one
        # Ray group per (band, hash) bucket (per-group overhead dominates)
        rows["bucket"] = (
            (bh.reshape(-1) ^ np.uint64(0x9E3779B97F4A7C15)) % np.uint64(_PAIR_PARTITIONS)
        ).astype("int32")
        return pd.DataFrame(rows)


def _emit_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for one hash-partition: vectorized groupby inside,
    deduped per partition before leaving the worker (a pair recurring in
    several of this partition's buckets ships once)."""
    outs = []
    for (_, _), grp in g.groupby(["band_id", "band_hash"], sort=False):
        ids = np.unique(grp["doc_id"].to_numpy())
        if len(ids) < 2:
            continue
        a, b = np.triu_indices(len(ids), k=1)
        outs.append(np.stack([ids[a], ids[b]], axis=1))
    if not outs:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    allp = np.unique(np.concatenate(outs), axis=0)
    return pd.DataFrame({"doc_a": allp[:, 0], "doc_b": allp[:, 1]})


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    shingle -> minhash -> (band_id, band_hash) explode -> hash-partitioned
    bucket groupby -> candidate pairs -> vectorized bitmask Jaccard verify
    >= threshold (no false positives; recall governed by the 16x8 banding
    S-curve, measured >=95% at J=0.8 in tests). On this corpus near-dup
    density is high, so candidate volume ~ true-pair volume — the banding
    still prunes the J<0.5 mass that dominates real corpora.
    """
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    bands = docs.map_batches(MinHasher, batch_format="pandas", concurrency=(1, 2))
    cand = (
        bands.groupby("bucket")
        .map_groups(_emit_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})

    ids, masks, popcnt = _word_bitmasks(sf_dir)
    pos = np.full(int(ids.max()) + 1, -1, dtype=np.int64)
    pos[ids] = np.arange(len(ids))
    a = cand["doc_a"].to_numpy()
    b = cand["doc_b"].to_numpy()
    # de-dup candidates across bands (vectorized)
    key = a.astype(np.int64) * (int(ids.max()) + 1) + b
    _, first = np.unique(key, return_index=True)
    a, b = a[first], b[first]
    jac = _pair_jaccard(masks, popcnt, pos[a], pos[b])
    keep = jac >= threshold
    return (
        pd.DataFrame({"doc_a": a[keep].astype("int64"), "doc_b": b[keep].astype("int64")})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------
class SimHasher:
    """Batch-vectorized simhash: each distinct word in the batch hashes once
    (vectorized FNV), per-doc signatures reduce over the word-bit matrix."""

    def __init__(self):
        pass

    @staticmethod
    def simhash(text: str) -> int:
        """Scalar reference form (kept as the frozen spec for tests)."""
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
        import pyarrow as _pa

        from ..functions.urls import hash_strings

        word_sets = [sorted(set(t.split())) for t in df["text"]]
        distinct = sorted({w for ws in word_sets for w in ws})
        if distinct:
            uh = hash_strings(_pa.array(distinct, type=_pa.string()))
            bitmat = ((uh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                      & np.uint64(1)).astype(np.int8) * 2 - 1  # ±1 per bit
            pos = {w: i for i, w in enumerate(distinct)}
        sigs = np.zeros(len(df), dtype=np.uint64)
        for i, ws in enumerate(word_sets):
            if not ws:
                continue
            rows = np.fromiter((pos[w] for w in ws), dtype=np.int64, count=len(ws))
            acc = bitmat[rows].sum(axis=0)
            sigs[i] = np.packbits((acc > 0).astype(np.uint8),
                                  bitorder="little").view(np.uint64)[0]
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "simhash": sigs.astype("int64")})


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Pairs with simhash hamming distance ≤ ``max_hamming``.

    Signatures computed distributed; the pair scan blocks over the compact
    (doc_id, simhash) table. At 10^10 scale the scan becomes 4-table
    rotation bucketing (Manku et al., WWW'07); signature computation — the
    expensive part — is unchanged.
    """
    sig = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(SimHasher, batch_format="pandas", concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
    )
    ids = sig["doc_id"].to_numpy()
    hs = sig["simhash"].to_numpy().astype(np.uint64)
    sig_ref = ray.put({"ids": ids, "hs": hs})
    block = 1024
    n = len(ids)

    def hamming_block(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(sig_ref)
        ids_l, hs_l = st["ids"], st["hs"]
        N = len(ids_l)
        out_a, out_b = [], []
        for s in df["start"]:
            s = int(s)
            x = hs_l[s : s + block][:, None] ^ hs_l[None, :]
            d = np.unpackbits(
                x.view(np.uint8).reshape(x.shape[0], N, 8), axis=2
            ).sum(axis=2)
            ai, bi = np.nonzero(d <= max_hamming)
            keep = (s + ai) < bi
            out_a.append(ids_l[s + ai[keep]])
            out_b.append(ids_l[bi[keep]])
        return pd.DataFrame({
            "doc_a": np.concatenate(out_a).astype("int64") if out_a else
                     np.array([], dtype="int64"),
            "doc_b": np.concatenate(out_b).astype("int64") if out_b else
                     np.array([], dtype="int64"),
        })

    starts = pa.table({"start": pa.array(range(0, n, block), type=pa.int64())})
    out = (
        rd.from_arrow(starts)
        .map_batches(hamming_block, batch_format="pandas", batch_size=1)
        .to_pandas()
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


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
        .map_batches(Fingerprinter, batch_format="pandas", concurrency=(1, 2))
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)
