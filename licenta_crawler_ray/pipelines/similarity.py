"""Similarity search over the ``embeddings`` table (``list<float>`` column).

- :func:`embedding_knn` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul, partial
  top-k rows flow to a tiny final reduction. SQL-checkable via DuckDB
  ``list_cosine_similarity``.
- :func:`embedding_neardup_pairs` — all pairs above a cosine threshold
  (embedding near-dup dedup).
- :func:`embedding_knn_ivf` — IVF-bucketed approximate variant (the scale
  path): k-means-lite centroids on a sample, per-batch assignment, probe
  only the ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _emb(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=columns)


def _to_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


class KnnScorer:
    """Per-batch cosine scores against the broadcast query matrix; emits each
    batch's top-k candidate rows per query (partial top-k combiner)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)  # once per actor
        self.qids = q["ids"]
        qm = q["matrix"]
        self.qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(df)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = self.qnorm @ m.T  # (Q, B)
        ids = df["vec_id"].to_numpy()
        out = []
        kk = min(self.k + 1, sims.shape[1])  # +1: self may be present
        for qi, qid in enumerate(self.qids):
            part = np.argpartition(-sims[qi], kk - 1)[:kk]
            out.append(
                pd.DataFrame({"query_id": qid, "vec_id": ids[part], "sim": sims[qi, part]})
            )
        return pd.concat(out, ignore_index=True)


def embedding_knn(sf_dir: str, num_queries: int = 5, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k (self excluded). Output: query_id, vec_id, rank.

    Tie-break: higher sim first, then lower vec_id (ties are measure-zero on
    this corpus; the rank column is hash-compared against DuckDB).
    """
    qdf = (
        _emb(sf_dir)
        .map_batches(lambda df: df[df["vec_id"] < num_queries], batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries_ref = ray.put({"ids": qdf["vec_id"].to_numpy(), "matrix": _to_matrix(qdf)})

    partials = _emb(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        KnnScorer,
        fn_constructor_args=(queries_ref, k),
        batch_format="pandas",
        concurrency=(1, 2),
    ).to_pandas()

    out = []
    for qid, g in partials.groupby("query_id"):
        g = g[g["vec_id"] != qid]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        out.append(
            pd.DataFrame(
                {"query_id": qid, "vec_id": g["vec_id"],
                 "rank": np.arange(1, len(g) + 1, dtype=np.int64)}
            )
        )
    return (
        pd.concat(out, ignore_index=True)
        .astype({"query_id": "int64", "vec_id": "int64"})
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """All pairs (a<b) with cosine ≥ threshold — embedding near-dup.

    The full normalized matrix is broadcast once; each batch computes its
    block-row of the similarity matrix (block × all matmul). At 10^9+
    vectors the same stage runs after LSH/IVF bucketing so blocks only span
    one bucket; flagged here because the testdata corpus is small.
    """
    all_df = _emb(sf_dir, columns=["vec_id", "embedding"]).to_pandas().sort_values("vec_id")
    ids_all = all_df["vec_id"].to_numpy()
    m = _to_matrix(all_df)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    mat_ref = ray.put({"ids": ids_all, "matrix": m})

    class BlockScore:
        def __init__(self):
            d = ray.get(mat_ref)
            self.ids, self.m = d["ids"], d["matrix"]
            self.pos = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = np.array([self.pos[int(v)] for v in df["vec_id"]])
            sims = self.m[rows] @ self.m.T
            ai, bi = np.nonzero(sims >= threshold)
            a_ids = self.ids[rows[ai]]
            b_ids = self.ids[bi]
            keep = a_ids < b_ids
            return pd.DataFrame(
                {"vec_a": a_ids[keep].astype("int64"), "vec_b": b_ids[keep].astype("int64")}
            )

    out = (
        _emb(sf_dir, columns=["vec_id"])
        .map_batches(BlockScore, batch_format="pandas", concurrency=(1, 2))
        .to_pandas()
    )
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_knn_ivf(
    sf_dir: str, num_queries: int = 5, k: int = 10,
    num_centroids: int = 16, nprobe: int = 8, iters: int = 5,
) -> pd.DataFrame:
    """IVF approximate top-k: deterministic k-means-lite on a sample →
    bucket assignment per batch → probe only ``nprobe`` closest buckets.

    Recall measured against :func:`embedding_knn` in tests. Output schema
    matches the exact variant.
    """
    sample = (
        _emb(sf_dir, columns=["vec_id", "embedding"])
        .map_batches(lambda df: df[df["vec_id"] % 7 == 0], batch_format="pandas")
        .to_pandas()
    )
    sm = _to_matrix(sample)
    sm = sm / np.maximum(np.linalg.norm(sm, axis=1, keepdims=True), 1e-30)
    # deterministic k-means-lite (fixed init: first C sample points)
    C = min(num_centroids, len(sm))
    cent = sm[:C].copy()
    for _ in range(iters):
        assign = np.argmax(sm @ cent.T, axis=1)
        for c in range(C):
            mask = assign == c
            if mask.any():
                v = sm[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-30)
    cent_ref = ray.put(cent)

    qdf = (
        _emb(sf_dir)
        .map_batches(lambda df: df[df["vec_id"] < num_queries], batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
    )
    qm = _to_matrix(qdf)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    probe_buckets = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    wanted: dict[int, set[int]] = {}
    for qi, qid in enumerate(qdf["vec_id"]):
        for b in probe_buckets[qi]:
            wanted.setdefault(int(b), set()).add(int(qid))
    wanted_ref = ray.put(wanted)
    queries_ref = ray.put({"ids": qdf["vec_id"].to_numpy(), "matrix": qm})

    class IvfScorer:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.wanted = ray.get(wanted_ref)
            q = ray.get(queries_ref)
            self.qids, self.qm = q["ids"], q["matrix"]
            self.qpos = {int(v): i for i, v in enumerate(self.qids)}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = _to_matrix(df)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            buckets = np.argmax(m @ self.cent.T, axis=1)
            ids = df["vec_id"].to_numpy()
            frames = []
            for b in np.unique(buckets):
                qids = self.wanted.get(int(b))
                if not qids:
                    continue
                sel = buckets == b
                sub_ids, sub_m = ids[sel], m[sel]
                for qid in sorted(qids):
                    sims = self.qm[self.qpos[qid]] @ sub_m.T
                    frames.append(
                        pd.DataFrame({"query_id": qid, "vec_id": sub_ids, "sim": sims})
                    )
            if not frames:
                return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                     "vec_id": pd.Series([], dtype="int64"),
                                     "sim": pd.Series([], dtype="float64")})
            return pd.concat(frames, ignore_index=True)

    partials = _emb(sf_dir, columns=["vec_id", "embedding"]).map_batches(
        IvfScorer, batch_format="pandas", concurrency=(1, 2)
    ).to_pandas()

    out = []
    for qid, g in partials.groupby("query_id"):
        g = g[g["vec_id"] != qid]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
        out.append(pd.DataFrame({"query_id": qid, "vec_id": g["vec_id"],
                                 "rank": np.arange(1, len(g) + 1, dtype=np.int64)}))
    return (
        pd.concat(out, ignore_index=True)
        .astype({"query_id": "int64", "vec_id": "int64"})
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
