"""Unit tests: hashing, canonicalization, bloom filter, cuckoo filter.

Frontier-semantics requirements per SURVEY.md §5(2): no false negatives,
FP rate below configured bound, deletion support on the cuckoo path.
"""

import numpy as np
import pytest

from pttcrawler_ray.state import BloomFilter, CuckooFilter
from pttcrawler_ray.util import canonicalize_url, hash_u64, hash_u64_many, host_of


def test_hash_stable_and_distinct():
    assert hash_u64("https://www.ptt.cc/") == hash_u64("https://www.ptt.cc/")
    assert hash_u64("a") != hash_u64("b")
    arr = hash_u64_many(["a", "b", "a"])
    assert arr.dtype == np.uint64
    assert arr[0] == arr[2] == hash_u64("a")
    assert arr[0] != arr[1]


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTPS://WWW.PTT.CC/bbs/Gossiping/index1.html", "https://www.ptt.cc/bbs/Gossiping/index1.html"),
        ("https://www.ptt.cc:443/bbs/X/a.html#frag", "https://www.ptt.cc/bbs/X/a.html"),
        ("http://host:8080/a/../b/./c.html", "http://host:8080/b/c.html"),
        ("https://host", "https://host/"),
        ("https://host/p?q=1&z=2", "https://host/p?q=1&z=2"),
    ],
)
def test_canonicalize(raw, canon):
    assert canonicalize_url(raw) == canon


def test_host_of():
    assert host_of("https://WWW.Ptt.cc/bbs/a.html") == "www.ptt.cc"


def test_bloom_no_false_negatives_and_fp_rate():
    n = 20_000
    f = BloomFilter(capacity=n, bits_per_key=10)
    ins = hash_u64_many([f"https://h{i % 7}.example/{i}" for i in range(n)])
    f.add_many(ins)
    assert f.contains_many(ins).all()  # no false negatives, ever

    probe = hash_u64_many([f"https://other/{i}" for i in range(n)])
    fp_rate = f.contains_many(probe).mean()
    assert fp_rate < 0.02  # ~0.8% theoretical at 10 bits/key


def test_bloom_snapshot_roundtrip():
    f = BloomFilter(capacity=1000)
    ins = hash_u64_many([str(i) for i in range(500)])
    f.add_many(ins)
    g = BloomFilter.restore(f.snapshot())
    assert g.contains_many(ins).all()
    assert g.nbits == f.nbits and g.k == f.k and g.count == f.count


def test_cuckoo_membership_and_delete():
    n = 10_000
    f = CuckooFilter(capacity=2 * n)
    ins = hash_u64_many([f"u{i}" for i in range(n)])
    f.add_many(ins)
    assert f.contains_many(ins).all()

    probe = hash_u64_many([f"v{i}" for i in range(n)])
    assert f.contains_many(probe).mean() < 0.01  # 16-bit fp → ~0.1%

    # deletion: the --upgrade re-crawl path (reference crawler/article.py:152-157)
    victims = ins[:100]
    assert f.delete_many(victims) == 100
    assert not f.contains_many(victims).any()  # fully removable (no collisions among 100)
    assert f.contains_many(ins[100:]).all()  # others untouched


def test_cuckoo_snapshot_roundtrip():
    f = CuckooFilter(capacity=1000)
    ins = hash_u64_many([str(i) for i in range(400)])
    f.add_many(ins)
    g = CuckooFilter.restore(f.snapshot())
    assert g.contains_many(ins).all()
    assert g.count == f.count
