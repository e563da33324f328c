"""Pages ingest: alternative source formats → the hash-bucketed pages layout.

A deployment's crawl snapshots arrive as WARC-derived JSONL or Parquet
dumps; this module lands them in the engine's canonical layout
(``pages/bucket=<k>/`` hash-partitioned on url, the partitioning every
fetch actor and frontier route relies on).  The write is a streaming Ray
Data pipeline — no driver materialization — and each bucket directory is
written by the tasks that own its rows.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .. import schemas
from ..util.hashing import hash_u64_many


def _add_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    hashes = hash_u64_many(batch["url"].to_pylist())
    bucket = (hashes % n_buckets).astype("int64")
    return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def _conform(batch: pa.Table) -> pa.Table:
    """Coerce incoming rows to the PAGES schema (html may arrive as text)."""
    html = batch["html"]
    if pa.types.is_string(html.type):
        html = pc.cast(html, pa.binary())
    ts = batch["warc_ts"]
    if not pa.types.is_timestamp(ts.type):
        ts = pc.cast(ts, pa.timestamp("us"))
    return pa.table({
        "url": pc.cast(batch["url"], pa.string()),
        "warc_ts": pc.cast(ts, pa.timestamp("us")),
        "html": html,
        "text": pc.cast(batch["text"], pa.string()) if "text" in batch.column_names
        else pa.nulls(len(batch), pa.string()),
        "lang": pc.cast(batch["lang"], pa.string()) if "lang" in batch.column_names
        else pa.nulls(len(batch), pa.string()),
    })


def ingest_pages(src, dest_corpus_dir: str, n_buckets: int = 32,
                 fmt: str = "jsonl") -> int:
    """Ingest JSONL/Parquet page dumps into ``dest/pages/bucket=*``.

    Returns the row count.  Partitioned write via ``write_parquet``'s
    ``partition_cols`` so rows stream straight to their bucket directory.
    """
    if fmt == "jsonl":
        ds = rd.read_json(src)
    elif fmt == "parquet":
        ds = rd.read_parquet(src)
    else:
        raise ValueError(f"unknown ingest format: {fmt}")

    ds = ds.map_batches(_conform, batch_format="pyarrow")
    ds = ds.map_batches(lambda t, n=n_buckets: _add_bucket(t, n),
                        batch_format="pyarrow")
    pages_dir = os.path.join(dest_corpus_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    ds.write_parquet(pages_dir, partition_cols=["bucket"])
    # partition_cols only creates directories for NON-empty buckets, but
    # lookups route by hash % n_buckets — persist the configured count so
    # PagesStore uses the write-time modulus, not a directory count
    import json as _json

    with open(os.path.join(pages_dir, "_manifest.json"), "w") as f:
        _json.dump({"n_buckets": n_buckets}, f)
    # count from the written files' metadata — no second pipeline execution
    import glob as _glob

    import pyarrow.parquet as _pq

    return sum(_pq.read_metadata(f).num_rows
               for f in _glob.glob(os.path.join(pages_dir, "bucket=*", "*.parquet")))
