"""Compaction / maintenance pipelines: version rotation + board watermarks.

- :func:`rotate_versions` — the reference keeps at most ``VERSION_ROTATE``
  (default 30) history rows per article, deleting the oldest (reference
  ``crawler/article.py:256-259``, config ``config_example.ini:19``; O3).
  Append-only Parquet version rows are compacted per url with a
  top-k-by-warc_ts ``map_groups``.

- :func:`board_watermarks` — the resume watermark min/max index per board
  (reference ``crawler/article_index.py:72-88``; A2), read from the
  frontier checkpoint, which records successfully FETCHED index pages only
  (a popped-but-404 page never widens the range).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..util.rayops import grouped_topk, parquet_grouped_topk


def rotate_versions(versions: "rd.Dataset", keep: int = 30,
                    tiebreak: list[tuple[str, str]] | None = None,
                    approx_rows: int | None = None) -> "rd.Dataset":
    """Per url keep the newest ``keep`` versions by warc_ts (top-k/group).

    Pass ``tiebreak`` extra sort keys when warc_ts can repeat per url —
    e.g. ``[("index_no", "descending"), ("page_pos", "descending")]`` for
    article stores (crawl.latest_articles uses those keys via grouped_topk
    directly); without it, ties resolve arrival-dependently.
    ``approx_rows`` scales the partition count to the version store (see
    rayops.grouped_topk).  For a parquet-backed store prefer
    :func:`rotate_versions_store`, which goes payload-light at scale."""

    return grouped_topk(versions, "url",
                        [("warc_ts", "descending"), *(tiebreak or [])],
                        k=keep, approx_rows=approx_rows,
                        target_rows_per_part=32_768)


def rotate_versions_store(store_dir: str, keep: int = 30,
                          tiebreak: list[tuple[str, str]] | None = None,
                          payload_light: bool | None = None) -> "rd.Dataset":
    """:func:`rotate_versions` over a parquet version store by path.

    With ``payload_light=True`` (or adaptively, when the narrow-pass
    probe measures version multiplicity ≥ 6 — see
    rayops.parquet_grouped_topk) the winners
    are selected over a column-pruned narrow read and only output-sized
    payloads ever cross the shuffle (rayops.parquet_grouped_topk) — at a
    30-version store the one-pass plan moves ~versions/keep times the
    output through the object store."""
    return parquet_grouped_topk(
        store_dir, "url", [("warc_ts", "descending"), *(tiebreak or [])],
        k=keep, payload_light=payload_light, target_rows_per_part=32_768)


def board_watermarks(out_dir: str) -> pa.Table:
    """(board, min_index, max_index) per board (A2) — from the frontier
    checkpoint, which records successfully FETCHED index pages only (the
    reference's ArticleIndex min/max reflects recorded pages,
    article_index.py:72-88; a popped-but-404 page must not widen the
    range — watermarks moved to the fetch ack in round 2)."""
    from .crawl import load_watermarks

    wm = load_watermarks(out_dir)
    boards = sorted(wm)
    return pa.table({
        "board": pa.array(boards, pa.string()),
        "min_index": pa.array([int(wm[b][0]) for b in boards], pa.int32()),
        "max_index": pa.array([int(wm[b][1]) for b in boards], pa.int32()),
    })
