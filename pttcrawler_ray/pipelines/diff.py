"""Snapshot diff (CDC) between two crawl outputs — which urls a
re-crawl ADDED, CHANGED, or REMOVED relative to an earlier run.

The continuous-crawl consumer story: a scheduled re-crawl (reference
crontab mode, ``pipelines/schedule.py``) produces a new output dir; the
downstream training-data pipeline only wants the delta (feed `added` +
`changed` into :func:`..textops.incremental.minhash_dedup_incremental`,
apply `removed` — plus the superseded old versions of `changed` — via
:func:`..textops.incremental.apply_removals`; the composed loop is
pinned exact against a from-scratch batch run in
tests/test_cdc_dedup.py).  ``diff_crawls(out_a, out_b)`` compares the
two latest-article views:

- ``added``    — url in B only
- ``removed``  — url in A only
- ``changed``  — url in both, RECORD differs (warc_ts, title, author,
  date, content, ip, or any push message — i.e. a different fetched
  version or any field edit)
- unchanged urls are NOT emitted (the overwhelming majority at scale).

Scale shape: each side reduces per batch to narrow ``(url_hash, side,
url, record_hash)`` rows — article payloads and push lists never cross
the object store — then ONE coarse hash shuffle co-partitions both
sides' rows per url and a vectorized partition fn assigns statuses.
Error rows (fetch/parse failures, SURVEY.md M11) are excluded from both
sides: the diff is over successfully parsed articles.

Exactness: the DuckDB twin (:func:`diff_sql`) FULL-OUTER-JOINs the same
two parquet views and compares the same fields with ``IS DISTINCT
FROM`` (nested ``messages`` compared natively).  The engine frames
every field (and every push field) as a netstring — ``len:value``, or
``N`` for null — before concatenating and hashing, so the
serialization is INJECTIVE (no separator-injection aliasing from
arbitrary crawled text) and "hashes equal" == "fields equal" up to a
2^-64 collision; null vs empty is distinguished on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util.hashing import hash_u64_many

_FIELDS = ["article_title", "author", "date", "content", "ip"]
_MSG_FIELDS = ("push_tag", "push_userid", "push_content", "push_ipdatetime")


def _frame(col) -> pa.Array:
    """Netstring framing: ``len:value`` per element, ``N`` for null —
    concatenation of framed fields is injective (no value can smuggle a
    separator, because there is none: the length is the delimiter)."""
    filled = pc.fill_null(col, "")
    framed = pc.binary_join_element_wise(
        pc.cast(pc.utf8_length(filled), pa.string()), filled, ":")
    return pc.if_else(pc.is_null(col), pa.scalar("N", pa.string()), framed)


def _record_serial(t: pa.Table) -> pa.Array:
    """Injective serialization of the compared record fields —
    vectorized Arrow kernels only, one string per row."""
    parts = [_frame(pc.cast(pc.cast(t["warc_ts"], pa.int64()), pa.string()))]
    for f in _FIELDS:
        parts.append(_frame(t[f]))

    msgs = t["messages"]
    if isinstance(msgs, pa.ChunkedArray):
        msgs = msgs.combine_chunks()
    flat = pc.list_flatten(msgs)
    mp = [_frame(pc.struct_field(flat, f)) for f in _MSG_FIELDS]
    push_str = (pc.binary_join_element_wise(*mp, "") if len(flat)
                else pa.array([], pa.string()))
    # rebuild list<string> on the original offsets (engine-produced
    # lists: null slots have empty offset ranges), join per row, then
    # frame the whole list (null list vs empty list distinguished)
    rebuilt = pa.ListArray.from_arrays(msgs.offsets, push_str)
    joined = pc.if_else(pc.is_null(msgs), pa.scalar(None, pa.string()),
                        pc.binary_join(rebuilt, ""))
    parts.append(_frame(joined))
    return pc.binary_join_element_wise(*parts, "")


def _side_batch(t: pa.Table, *, side: int) -> pa.Table:
    if "error" in t.column_names:
        t = t.filter(pc.is_null(t["error"]))
    serial = _record_serial(t)
    return pa.table({
        "bkey": pa.array(hash_u64_many(t["url"].to_pylist()), pa.uint64()),
        "side": pa.array(np.full(len(t), side, np.int8), pa.int8()),
        "url": t["url"],
        "chash": pa.array(hash_u64_many(serial.to_pylist()), pa.uint64()),
    })


def _diff_partition(g: pa.Table) -> pa.Table:
    """Status per url of this partition (both sides of a url co-locate
    via bkey; the compare keys on the REAL url string, so a bkey
    collision cannot cross two urls)."""
    import pandas as pd

    codes, uniq = pd.factorize(g["url"].to_numpy(zero_copy_only=False))
    side = g["side"].to_numpy(zero_copy_only=False).astype(np.int64)
    ch = g["chash"].to_numpy(zero_copy_only=False)
    n = len(uniq)
    has = np.zeros((2, n), bool)
    h = np.zeros((2, n), np.uint64)
    has[side, codes] = True
    h[side, codes] = ch
    status = np.where(~has[0] & has[1], "added",
                      np.where(has[0] & ~has[1], "removed",
                               np.where(h[0] != h[1], "changed", "")))
    keep = status != ""
    return pa.table({
        "url": pa.array(np.asarray(uniq, object)[keep].tolist(), pa.string()),
        "status": pa.array(status[keep].tolist(), pa.string()),
    })


def diff_latest(ds_a, ds_b, n_parts: int | None = None):
    """Diff two latest-article-view Datasets (one row per url per side):
    ``(url, status)`` rows, unchanged urls omitted."""
    from ..util.rayops import partitioned_map_groups

    rows = ds_a.map_batches(_side_batch, fn_kwargs={"side": 0},
                            batch_format="pyarrow").union(
        ds_b.map_batches(_side_batch, fn_kwargs={"side": 1},
                         batch_format="pyarrow"))
    return partitioned_map_groups(rows, "bkey", _diff_partition,
                                  n_parts=n_parts or 8)


def diff_crawls(out_a: str, out_b: str, n_parts: int | None = None):
    """:func:`diff_latest` over two crawl output dirs' latest views."""
    from .crawl import latest_articles

    return diff_latest(latest_articles(out_a), latest_articles(out_b),
                       n_parts=n_parts)


def diff_sql(latest_a: str, latest_b: str) -> str:
    """DuckDB twin of :func:`diff_crawls` over the two MATERIALIZED
    latest-view parquet dirs — independent join + field-by-field
    ``IS DISTINCT FROM`` (nested messages compared natively)."""
    fields = ["warc_ts"] + _FIELDS + ["messages"]
    differs = " OR ".join(f"a.{f} IS DISTINCT FROM b.{f}" for f in fields)
    return f"""
WITH a AS (SELECT * FROM read_parquet('{latest_a}/*.parquet')
           WHERE error IS NULL),
     b AS (SELECT * FROM read_parquet('{latest_b}/*.parquet')
           WHERE error IS NULL)
SELECT COALESCE(a.url, b.url) AS url,
       CASE WHEN a.url IS NULL THEN 'added'
            WHEN b.url IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM a FULL JOIN b ON a.url = b.url
WHERE a.url IS NULL OR b.url IS NULL OR {differs}
"""
