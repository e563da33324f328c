from .canonical import canonicalize_url, host_of
from .hashing import hash_u64, hash_u64_many, splitmix64

__all__ = [
    "canonicalize_url",
    "host_of",
    "hash_u64",
    "hash_u64_many",
    "splitmix64",
]
