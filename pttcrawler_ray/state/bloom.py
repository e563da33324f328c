"""Sharded-bloom-filter building block for the URL-seen set.

The reference keeps its seen set as SQLite primary keys consulted per record
(reference ``crawler/article.py:152-157`` and the frontier anti-join at
``:528-531``).  At 10^10-URL scale that must become an in-memory approximate
membership structure sharded across frontier actors: this is one shard.

Standard partitioned design: a flat bit array, k probe positions per key via
Kirsch–Mitzenmacher double hashing (h1 + i*h2 with h2 odd), vectorized over
numpy uint64 arrays so a whole frontier batch is tested/added in a few numpy
kernels.  Sizing: ``bits_per_key≈10`` → ~0.8% FP at k=7; 10^10 urls × 10
bits ≈ 12.5 GB total across all shards (e.g. 256 shards × ~49 MB).

No false negatives, ever — a FP only makes the crawler skip a URL it has not
fetched, which is the same failure mode as the reference's page-skip
heuristic and is bounded by the configured FP rate.
"""

from __future__ import annotations

import numpy as np

from ..util.hashing import splitmix64

_ONE = np.uint64(1)


class BloomFilter:
    def __init__(self, capacity: int, bits_per_key: int = 10):
        nbits = 1 << max(8, int(np.ceil(np.log2(max(1, capacity) * bits_per_key))))
        self.nbits = nbits
        self.mask = np.uint64(nbits - 1)
        self.k = max(1, int(round(bits_per_key * np.log(2))))
        self.words = np.zeros(nbits >> 6, dtype=np.uint64)
        self.count = 0  # approximate insert count (pre-dedup)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(n, k) probe bit positions."""
        h1 = hashes.astype(np.uint64, copy=False)
        h2 = splitmix64(h1) | _ONE
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return (h1[:, None] + i * h2[:, None]) & self.mask

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(np.asarray(hashes, dtype=np.uint64)).ravel()
        np.bitwise_or.at(self.words, pos >> np.uint64(6), _ONE << (pos & np.uint64(63)))
        self.count += len(hashes)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Boolean array: True ⇒ possibly seen; False ⇒ definitely unseen."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(hashes, dtype=np.uint64))
        bits = (self.words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & _ONE
        return bits.all(axis=1)

    def __contains__(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h], dtype=np.uint64))[0])

    # --- checkpoint / resume ------------------------------------------------
    def snapshot(self) -> dict:
        return {"nbits": self.nbits, "k": self.k, "count": self.count,
                "words": self.words.tobytes()}

    @classmethod
    def restore(cls, snap: dict) -> "BloomFilter":
        f = cls.__new__(cls)
        f.nbits = snap["nbits"]
        f.mask = np.uint64(f.nbits - 1)
        f.k = snap["k"]
        f.count = snap["count"]
        f.words = np.frombuffer(snap["words"], dtype=np.uint64).copy()
        return f
