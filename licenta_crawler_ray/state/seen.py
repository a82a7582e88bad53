"""Sharded cuckoo-filter URL-seen set (SURVEY §2.3 T2).

Replaces the reference's global Mongo upsert-by-URL dedup
(``CrawlDatabaseManager.instance.upsertManyPages``, called at
``BrowserCrawler.java:145`` / ``SitemapSaxCrawler.java:86``): the pages
collection *was* the URL-seen set. Here it is S independent shard actors,
shard = ``hash(url) % S``; each shard holds a numpy-backed cuckoo filter
plus an exact overflow stash, guaranteeing **no false negatives** (a false
negative would re-crawl a URL; a false positive only drops one — the filter
is sized so FP ≈ 2^-13 per probe).

Scale notes (10^10 URLs): a (2^27 buckets × 4 slots × u16) shard is 1 GiB
and holds ~5×10^8 fingerprints at 95% load; 20-40 shards spread across the
cluster cover 10^10 URLs with horizontal growth. Calls are batched (one RPC
per shard per wave-batch, numpy arrays in/out — never per URL). Shards
snapshot to ``.npz`` each wave for exact resume; snapshots are versioned
with their insert count and verified on load (SURVEY §7.3).
"""

from __future__ import annotations

import os

import numpy as np
import ray

_EMPTY = np.uint16(0)
_MAX_KICKS = 128


class CuckooFilter:
    """Single-shard cuckoo filter over uint64 key hashes.

    Layout: ``table[num_buckets, slots]`` of uint16 fingerprints (0 = empty).
    Bucket1 = high bits of the key hash; bucket2 = b1 XOR spread(fp)
    (partial-key cuckoo hashing, Fan et al., CoNLL'14 — public algorithm).
    """

    def __init__(self, log2_buckets: int = 16, slots: int = 4, seed: int = 0x5EED):
        self.log2_buckets = log2_buckets
        self.num_buckets = 1 << log2_buckets
        self.slots = slots
        self.table = np.zeros((self.num_buckets, slots), dtype=np.uint16)
        # Overflow stash → no-false-negative guarantee. Entries are
        # ``bucket * 65536 + fp`` codes for fingerprints that lost the kick
        # loop; a key's membership probe checks the codes of BOTH its
        # candidate buckets (the homeless fp's recorded bucket is always one
        # of its two valid buckets, since buckets alternate by XOR).
        self.stash: set[int] = set()
        self.count = 0
        self._mask = np.uint64(self.num_buckets - 1)
        self._rng = np.random.default_rng(seed)  # eviction slot choice (deterministic)

    # -- hashing ------------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty marker
        return fp

    def _b1(self, h: np.ndarray) -> np.ndarray:
        return ((h >> np.uint64(16)) & self._mask).astype(np.int64)

    def _alt(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # spread the 16-bit fp over the bucket index space (odd multiplier)
        spread = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & self._mask
        return (b.astype(np.uint64) ^ spread).astype(np.int64)

    # -- vectorized membership ---------------------------------------------
    def contains(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(h)
        b1 = self._b1(h)
        b2 = self._alt(b1, fp)
        hit = (self.table[b1] == fp[:, None]).any(axis=1)
        hit |= (self.table[b2] == fp[:, None]).any(axis=1)
        if self.stash:
            c1 = b1 * 65536 + fp.astype(np.int64)
            c2 = b2 * 65536 + fp.astype(np.int64)
            codes = np.fromiter(self.stash, dtype=np.int64, count=len(self.stash))
            hit |= np.isin(c1, codes) | np.isin(c2, codes)
        return hit

    # -- insert (per-item cuckoo kicks; batch-level entry point) ------------
    def _insert_one(self, h: int) -> None:
        ha = np.array([h], dtype=np.uint64)
        fp = int(self._fp(ha)[0])
        b1 = int(self._b1(ha)[0])
        b2 = int(self._alt(np.array([b1]), np.array([fp], dtype=np.uint16))[0])
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        # evict loop
        b = b1 if (self._rng.integers(0, 2) == 0) else b2
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(0, self.slots))
            cur, self.table[b, slot] = self.table[b, slot], cur
            b = int(self._alt(np.array([b]), np.array([cur], dtype=np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == _EMPTY)[0]
            if len(empty):
                row[empty[0]] = cur
                return
        # Kick loop failed: ``cur`` is a homeless *fingerprint* whose last
        # intended bucket is ``b`` (one of its two valid buckets). Record the
        # (bucket, fp) code in the stash — ``contains`` probes these codes for
        # both candidate buckets, preserving the no-false-negative guarantee.
        self.stash.add(int(b) * 65536 + int(cur))

    def contains_and_add(self, h: np.ndarray) -> np.ndarray:
        """For each key hash: True if already seen, else insert and False.

        Duplicates WITHIN the batch resolve in array order (first occurrence
        wins) — matching first-seen-wins upsert semantics.
        """
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        seen = self.contains(h)
        out = seen.copy()
        # first occurrence of each new key inserts; later in-batch dups hit
        new_idx = np.nonzero(~seen)[0]
        batch_inserted: set[int] = set()
        for i in new_idx:
            key = int(h[i])
            if key in batch_inserted:
                out[i] = True
                continue
            # re-check table: an earlier insert this batch may have added a
            # colliding fingerprint — acceptable FP, but never re-insert
            self._insert_one(key)
            batch_inserted.add(key)
            self.count += 1
        return out

    # -- snapshot / restore (exact, versioned) ------------------------------
    def save(self, path: str) -> None:
        """Atomic snapshot; ``path`` should end in .npz."""
        tmp = path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f,
                table=self.table,
                stash=np.array(sorted(self.stash), dtype=np.int64),
                count=np.array([self.count], dtype=np.int64),
                log2_buckets=np.array([self.log2_buckets]),
                slots=np.array([self.slots]),
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "CuckooFilter":
        z = np.load(path)
        f = cls(log2_buckets=int(z["log2_buckets"][0]), slots=int(z["slots"][0]))
        f.table = z["table"]
        f.stash = set(int(x) for x in z["stash"])
        f.count = int(z["count"][0])
        occupied = int((f.table != _EMPTY).sum()) + len(f.stash)
        if occupied > f.count:
            raise ValueError(
                f"seen-shard snapshot corrupt: {occupied} occupied slots > {f.count} inserts"
            )
        return f


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the distributed URL-seen set (plain Ray actor, SURVEY §7.2).

    Addressed by ``hash(url) % num_shards`` from the dedup stage; all calls
    are batched numpy arrays. ``num_cpus=0`` — shards are bookkeeping that
    must never compete with (or deadlock against) the fetch/extract pools
    for CPU slots; their work is short batched lookups.
    """

    def __init__(self, shard_id: int, log2_buckets: int = 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(log2_buckets=log2_buckets, seed=0x5EED ^ shard_id)

    def contains_and_add(self, h: np.ndarray) -> np.ndarray:
        return self.filter.contains_and_add(h)

    def add(self, h: np.ndarray) -> int:
        self.filter.contains_and_add(h)
        return self.filter.count

    def count(self) -> int:
        return self.filter.count

    def snapshot(self, path: str) -> str:
        self.filter.save(path)
        return path

    def restore(self, path: str) -> int:
        self.filter = CuckooFilter.load(path)
        return self.filter.count


class SeenSet:
    """Driver-side handle over the shard actors."""

    def __init__(self, num_shards: int = 4, log2_buckets: int = 16):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.options(name=None).remote(i, log2_buckets) for i in range(num_shards)
        ]

    def _split(self, h: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
        # route shards from the TOP hash bits: the cuckoo fingerprint uses
        # bits 0-15 and the bucket index bits 16+, so low-bit routing would
        # cost each shard log2(num_shards) bits of fingerprint entropy
        # (~4x the documented 2^-13 FP rate at 4 shards); bits 48-63 are
        # disjoint from both, keeping the per-probe FP bound at
        # slots/2^16 * 2 ≈ 2^-13 regardless of shard count
        shard_of = ((h >> np.uint64(48)) % np.uint64(self.num_shards)).astype(np.int64)
        return shard_of, [h[shard_of == s] for s in range(self.num_shards)]

    def contains_and_add(self, h: np.ndarray) -> np.ndarray:
        """Batched first-seen test across shards; one RPC per non-empty shard."""
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        shard_of, parts = self._split(h)
        refs = {
            s: self.shards[s].contains_and_add.remote(part)
            for s, part in enumerate(parts)
            if len(part)
        }
        results = {s: r for s, r in zip(refs, ray.get(list(refs.values())))}
        out = np.zeros(len(h), dtype=bool)
        for s, res in results.items():
            out[shard_of == s] = res
        return out

    def count(self) -> int:
        return int(sum(ray.get([s.count.remote() for s in self.shards])))

    def snapshot(self, dir_path: str) -> None:
        ray.get(self.snapshot_async(dir_path))

    def snapshot_async(self, dir_path: str) -> list:
        """Fire shard snapshots WITHOUT blocking; returns refs to gather later.

        Correctness under async commit: each shard actor processes messages
        from this driver in submission order, so a snapshot fired before the
        next wave's ``contains_and_add`` calls captures exactly the
        pre-next-wave state even though the driver doesn't wait.
        """
        os.makedirs(dir_path, exist_ok=True)
        return [
            s.snapshot.remote(os.path.join(dir_path, f"shard-{i}.npz"))
            for i, s in enumerate(self.shards)
        ]

    def restore(self, dir_path: str) -> None:
        ray.get(
            [
                s.restore.remote(os.path.join(dir_path, f"shard-{i}.npz"))
                for i, s in enumerate(self.shards)
            ]
        )
