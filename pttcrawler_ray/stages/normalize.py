"""Normalization stages: pushes explode + article scalar normalization.

- :func:`explode_pushes_batch` — the Push child table (reference
  ``models/article.py:111-154``): one row per push per article version with
  a 1-based ``floor`` (reference crawler/article.py:211,230) and the push
  ip/datetime split (reference ``parser_push_ipdatetime``,
  crawler/article.py:119-132 — its '%m/%d %M:%S' format bug is preserved
  via :func:`..parsing.scalars.parse_push_ipdatetime`).  List-flatten is
  done with Arrow kernels (list_flatten / list_parent_indices), no Python
  loop over articles.

- :func:`normalize_articles_batch` — adds ``author_username`` (reference
  ``parse_author``, crawler/article.py:134-147: empty → '') and
  ``post_datetime`` (strptime '%a %b %d %H:%M:%S %Y', failure → null,
  crawler/article.py:170-172).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..parsing.scalars import parse_article_date, parse_author, parse_push_ipdatetime


def _floors(list_array: pa.ChunkedArray | pa.ListArray) -> np.ndarray:
    """1-based position within each list, concatenated."""
    chunks = list_array.chunks if isinstance(list_array, pa.ChunkedArray) else [list_array]
    out = []
    for chunk in chunks:
        # null lists have offset[i+1]==offset[i] after combine_chunks? guard via value_lengths
        lengths = pc.list_value_length(chunk).fill_null(0).to_numpy(zero_copy_only=False)
        for n in lengths:
            out.append(np.arange(1, n + 1, dtype=np.int32))
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int32)


def explode_pushes_batch(batch: pa.Table) -> pa.Table:
    """ARTICLES-schema batch → PUSHES-schema batch (flat_map expansion)."""
    batch = batch.combine_chunks()
    msgs = batch["messages"]
    flat = pc.list_flatten(msgs)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()  # → StructArray
    parents = pc.list_parent_indices(msgs)

    urls = pc.take(batch["url"], parents)
    article_ids = pc.take(batch["article_id"], parents)
    warc_ts = pc.take(batch["warc_ts"], parents)
    floors = _floors(msgs)

    ipdt = flat.field("push_ipdatetime").to_pylist() if len(flat) else []
    ips, dts = [], []
    for v in ipdt:
        ip, dt = parse_push_ipdatetime(v)
        ips.append(ip or None)
        dts.append(dt)

    return pa.table(
        {
            "url": urls,
            "article_id": article_ids,
            "warc_ts": warc_ts,
            "floor": pa.array(floors, pa.int32()),
            "push_tag": flat.field("push_tag") if len(flat) else pa.array([], pa.string()),
            "push_userid": flat.field("push_userid") if len(flat) else pa.array([], pa.string()),
            "push_content": flat.field("push_content") if len(flat) else pa.array([], pa.string()),
            "push_ip": pa.array(ips, pa.string()),
            "push_datetime": pa.array(dts, pa.timestamp("us")),
        }
    )


def normalize_articles_batch(batch: pa.Table) -> pa.Table:
    """Adds author_username + post_datetime columns (M3, M5)."""
    authors = batch["author"].to_pylist()
    usernames = []
    for a in authors:
        u = parse_author(a)
        usernames.append(u if u else "")  # empty → '' (crawler/article.py:144-147)
    dates = [parse_article_date(d) for d in batch["date"].to_pylist()]
    out = batch.append_column("author_username", pa.array(usernames, pa.string()))
    return out.append_column("post_datetime", pa.array(dates, pa.timestamp("us")))
