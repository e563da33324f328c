"""Property-based tests (hypothesis) for the pure frontier-state libraries."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pttcrawler_ray.state import BloomFilter, CuckooFilter
from pttcrawler_ray.textops.dedup import MinHasher, _shingle_hashes
from pttcrawler_ray.util import canonicalize_url, hash_u64, hash_u64_many

_url_paths = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=8),
    min_size=0, max_size=4)


@given(host=st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-", min_size=1,
                    max_size=20).filter(lambda h: not h.startswith("-") and ".." not in h
                                        and not h.startswith(".") and not h.endswith("-")),
       path=_url_paths,
       scheme=st.sampled_from(["http", "https"]))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host, path, scheme):
    url = f"{scheme}://{host}/" + "/".join(path)
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once  # idempotence


@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_hash_consistency(strings):
    arr = hash_u64_many(strings)
    assert [int(x) for x in arr] == [hash_u64(s) for s in strings]


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1,
                max_size=500, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(hashes):
    f = BloomFilter(capacity=len(hashes))
    arr = np.array(hashes, dtype=np.uint64)
    f.add_many(arr)
    assert f.contains_many(arr).all()


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1,
                max_size=300, unique=True),
       st.data())
@settings(max_examples=50, deadline=None)
def test_cuckoo_membership_after_deletes(hashes, data):
    f = CuckooFilter(capacity=4 * len(hashes) + 64)
    arr = np.array(hashes, dtype=np.uint64)
    f.add_many(arr)
    n_del = data.draw(st.integers(min_value=0, max_value=len(hashes) // 2))
    victims = arr[:n_del]
    f.delete_many(victims)
    # survivors are never false-negative
    assert f.contains_many(arr[n_del:]).all()


@given(st.lists(st.text(alphabet="abcdefg ", min_size=10, max_size=80),
                min_size=2, max_size=2))
@settings(max_examples=50, deadline=None)
def test_minhash_estimates_jaccard(texts):
    a, b = (_shingle_hashes(t, 2) for t in texts)
    if len(a) == 0 or len(b) == 0:
        return
    inter = len(np.intersect1d(a, b, assume_unique=True))
    true_j = inter / (len(a) + len(b) - inter)
    mh = MinHasher(num_perm=256)
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    assert abs(est - true_j) < 0.25  # 256 perms → se ~0.03; generous bound
