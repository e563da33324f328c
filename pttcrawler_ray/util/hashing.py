"""Stable 64-bit URL hashing.

The frontier's seen-set keys every URL by a stable 64-bit hash of its
canonical form (SURVEY.md §1.2, T2).  xxhash is not available in this
environment, so the stable hash is the first 8 bytes of BLAKE2b (stdlib
``hashlib``, C-accelerated, ~1M urls/s/core) — same role, same width,
documented here so the on-disk ``seen`` table is reproducible.

``splitmix64`` is the standard public-domain mixer (Steele et al., used by
Java's SplittableRandom); we use it to derive independent probe hashes for
the bloom/cuckoo filters from one base hash (Kirsch–Mitzenmacher double
hashing).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash_u64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string (first 8 bytes of BLAKE2b, little-endian)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(blake2b(s, digest_size=8).digest(), "little")


def hash_u64_many(strings) -> np.ndarray:
    """Vectorized-ish stable hash over an iterable of strings → uint64 array.

    hashlib's C core dominates; a list comprehension is the hot loop and is
    fast enough (~1M urls/s/core) for per-batch hashing inside map_batches.
    """
    b2 = blake2b
    fb = int.from_bytes
    return np.fromiter(
        (fb(b2(s.encode("utf-8") if isinstance(s, str) else s, digest_size=8).digest(), "little") for s in strings),
        dtype=np.uint64,
        count=len(strings) if hasattr(strings, "__len__") else -1,
    )


def splitmix64(x: np.ndarray | int):
    """SplitMix64 finalizer — maps uint64 → well-mixed uint64 (vectorized)."""
    scalar = not isinstance(x, np.ndarray)
    z = np.uint64(x) if scalar else x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
        z = z ^ (z >> np.uint64(31))
    return int(z) if scalar else z
