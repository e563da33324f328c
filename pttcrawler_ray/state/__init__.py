from .bloom import BloomFilter
from .cuckoo import CuckooFilter

__all__ = ["BloomFilter", "CuckooFilter"]
