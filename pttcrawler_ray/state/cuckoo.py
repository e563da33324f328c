"""Cuckoo filter — the deletable fallback for the URL-seen set.

The reference's ``--upgrade`` mode re-fetches already-seen articles
(reference ``crawler/article.py:55,152-157``): with a plain bloom filter a
URL can never be un-seen, so upgrade/re-crawl needs deletions.  Per the
north rule, frontier shards switch to (or pair with) a cuckoo filter when
deletion support is required.

Standard design (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT'14): 4-slot buckets of 16-bit fingerprints, partial-key
cuckoo hashing — bucket i1 = h & mask, i2 = i1 ^ mix(fp) — insert with
bounded eviction kicks, O(1) delete of one fingerprint copy.  Lookups are
vectorized over numpy arrays; inserts are per-item (insert volume per batch
is small relative to membership tests).
"""

from __future__ import annotations

import numpy as np

from ..util.hashing import splitmix64

_SLOTS = 4
_FP_BITS = 16
_MAX_KICKS = 500


class CuckooFilterFull(RuntimeError):
    pass


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        nbuckets = 1 << max(4, int(np.ceil(np.log2(max(1, capacity) / _SLOTS / 0.84))))
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.buckets = np.zeros((nbuckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)

    # fingerprint 1..65535 (0 = empty slot)
    def _fp(self, hashes: np.ndarray) -> np.ndarray:
        fp = (hashes >> np.uint64(48)).astype(np.uint64) & np.uint64(0xFFFF)
        return np.where(fp == 0, np.uint64(1), fp).astype(np.uint16)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (idx.astype(np.uint64) ^ (splitmix64(fp.astype(np.uint64)) & self.mask)) & self.mask

    def add_many(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.uint64)
        fps = self._fp(hashes)
        i1s = hashes & self.mask
        for fp, i1 in zip(fps.tolist(), i1s.tolist()):
            self._insert_one(np.uint16(fp), int(i1))

    def _insert_one(self, fp: np.uint16, i1: int) -> None:
        i2 = int(self._alt_index(np.array([i1], dtype=np.uint64), np.array([fp]))[0])
        for idx in (i1, i2):
            row = self.buckets[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # evict
        idx = i1 if self._rng.integers(2) else i2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            cur, self.buckets[idx][slot] = self.buckets[idx][slot], cur
            idx = int(self._alt_index(np.array([idx], dtype=np.uint64), np.array([cur]))[0])
            row = self.buckets[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        raise CuckooFilterFull(f"cuckoo filter full at {self.count} items")

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fp(hashes)
        i1 = hashes & self.mask
        i2 = self._alt_index(i1, fps)
        in1 = (self.buckets[i1.astype(np.int64)] == fps[:, None]).any(axis=1)
        in2 = (self.buckets[i2.astype(np.int64)] == fps[:, None]).any(axis=1)
        return in1 | in2

    def __contains__(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h], dtype=np.uint64))[0])

    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove one stored copy per present hash; returns number removed."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        removed = 0
        fps = self._fp(hashes)
        i1s = hashes & self.mask
        i2s = self._alt_index(i1s, fps)
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            for idx in (int(i1), int(i2)):
                row = self.buckets[idx]
                hit = np.flatnonzero(row == fp)
                if len(hit):
                    row[hit[0]] = 0
                    self.count -= 1
                    removed += 1
                    break
        return removed

    # --- checkpoint / resume ------------------------------------------------
    def snapshot(self) -> dict:
        return {"nbuckets": self.nbuckets, "count": self.count,
                "buckets": self.buckets.tobytes()}

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.nbuckets = snap["nbuckets"]
        f.mask = np.uint64(f.nbuckets - 1)
        f.count = snap["count"]
        f.buckets = np.frombuffer(snap["buckets"], dtype=np.uint16).reshape(f.nbuckets, _SLOTS).copy()
        f._rng = np.random.default_rng(7)
        return f
