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


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_oracle_scalars_match_engine(s):
    """The sequential oracle's scalar reimplementations (queryoracle) must
    agree with the engine's (parsing.scalars) on ARBITRARY input — they are
    written independently, so agreement here is evidence both encode the
    reference semantics, not each other."""
    from pttcrawler_ray.oracle.queryoracle import (_oracle_article_date,
                                                   _oracle_parse_author,
                                                   _oracle_push_ipdt)
    from pttcrawler_ray.parsing.scalars import (parse_article_date,
                                                parse_author,
                                                parse_push_ipdatetime)

    eng_author = parse_author(s)
    assert (eng_author if eng_author else "") == _oracle_parse_author(s)
    assert parse_push_ipdatetime(s) == _oracle_push_ipdt(s)
    assert parse_article_date(s) == _oracle_article_date(s)


@given(st.text(alphabet="ab 不明時xyz0123:/.()", max_size=40))
@settings(max_examples=200, deadline=None)
def test_oracle_quality_langid_match_engine(s):
    """Pure-python oracle quality/langid vs the vectorized engine stages —
    bit-identical floats (same IEEE op order) on arbitrary text."""
    import pyarrow as pa

    from pttcrawler_ray.oracle.queryoracle import (_oracle_langid,
                                                   _oracle_quality)
    from pttcrawler_ray.textops.analysis import LangId, quality_score_batch

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([s], pa.string())})
    q = quality_score_batch(t)
    oa, os_, od, oq = _oracle_quality(s)
    assert q["alpha_ratio"][0].as_py() == oa
    assert q["stop_ratio"][0].as_py() == os_
    assert q["distinct_ratio"][0].as_py() == od
    assert q["quality"][0].as_py() == oq

    li = LangId()(t)
    lang, conf = _oracle_langid(s)
    assert li["pred_lang"][0].as_py() == lang
    assert li["lang_confidence"][0].as_py() == conf
