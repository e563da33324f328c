"""Compaction / maintenance pipelines: version rotation + board watermarks.

- :func:`rotate_versions` — the reference keeps at most ``VERSION_ROTATE``
  (default 30) history rows per article, deleting the oldest (reference
  ``crawler/article.py:256-259``, config ``config_example.ini:19``; O3).
  Append-only Parquet version rows are compacted per url with a
  top-k-by-warc_ts ``map_groups``.

- :func:`board_watermarks` — the resume watermark min/max index per board
  (reference ``crawler/article_index.py:72-88``; A2), computed from the
  crawled index-page urls.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_INDEX_URL = re.compile(r"/bbs/([^/]+)/index(\d+)\.html$")


def rotate_versions(versions: "rd.Dataset", keep: int = 30) -> "rd.Dataset":
    """Per url keep the newest ``keep`` versions by warc_ts (top-k/group)."""

    def topk(group: pa.Table) -> pa.Table:
        if group.num_rows <= keep:
            return group
        idx = pc.array_sort_indices(
            group["warc_ts"].combine_chunks() if isinstance(group["warc_ts"], pa.ChunkedArray)
            else group["warc_ts"],
            order="descending")
        return group.take(idx[:keep])

    return versions.groupby("url").map_groups(topk, batch_format="pyarrow")


def board_watermarks(out_dir: str) -> "rd.Dataset":
    """(board, min_index, max_index) from the seen index-page urls (A2)."""
    import os

    seen = rd.read_parquet(os.path.join(out_dir, "seen"))

    def extract(t: pa.Table) -> pa.Table:
        boards, idxs = [], []
        for u in t["url"].to_pylist():
            m = _INDEX_URL.search(u)
            if m:
                boards.append(m.group(1))
                idxs.append(int(m.group(2)))
        return pa.table({"board": pa.array(boards, pa.string()),
                         "index_no": pa.array(idxs, pa.int32())})

    from ray.data.aggregate import Max, Min

    ds = seen.map_batches(extract, batch_format="pyarrow")
    return ds.groupby("board").aggregate(
        Min("index_no", alias_name="min_index"),
        Max("index_no", alias_name="max_index"),
    )
