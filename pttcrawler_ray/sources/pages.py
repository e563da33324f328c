"""Fetch stage: the engine's "HTTP layer" (SURVEY.md S1/S2).

The reference fetches live pages with ``requests.get`` + UA header +
``over18=1`` cookie (reference ``crawler/article.py:267-276,426-436``).
Here the web is the ``pages`` Parquet table (Common-Crawl-style snapshots);
a fetch is a keyed lookup serving the newest ``warc_ts`` snapshot for a url,
and a miss is the reference's non-200 path (``{"error": "invalid url"}``).

Scale design: the pages table is hash-partitioned on ``url`` into
``bucket=<k>`` directories (written that way by the corpus generator /
ingest job, with the bucket count persisted in ``pages/_manifest.json`` so
the lookup modulus always equals the write-time modulus even when some
buckets are empty).  The scale path is BUCKET-ROUTED fetch: the crawl
driver routes each popped frontier batch to the worker owning
``url_hash % n_buckets``, and each fetch actor lazily loads ONLY its own
buckets (``PagesStore``) — per-actor memory is bounded by its bucket
subset, and no stage ever materializes the whole pages table.  The
``build_shared_index`` full-table zero-copy index remains as an explicit
small-corpus fast path (one Arrow table in the object store shared by all
actors on the node); on a multi-node cluster it would hold one node's
bucket shard, never the global corpus.  The per-host over18/robots gate is
actor state, checked once per (host, actor).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..util.hashing import hash_u64

_EMPTY_COLS = ("warc_ts", "html", "text", "lang")


class _SnapshotIndex:
    """Vectorized url-hash → snapshot-row index over one pages Arrow table.

    Holds a hash-sorted view: ``hashes``/``rows`` pick the newest snapshot
    per url; ``hashes_full``/``ts_full``/``rows_full`` support as-of
    lookups (newest snapshot with warc_ts <= asof).  The same math backs
    both the per-bucket store and the shared full-corpus index.
    """

    __slots__ = ("table", "hashes", "rows", "hashes_full", "ts_full", "rows_full")

    def __init__(self, table: pa.Table, hashes: np.ndarray | None = None):
        self.table = table
        if hashes is None:
            urls = table["url"].to_pylist()
            hashes = np.fromiter((hash_u64(u) for u in urls),
                                 dtype=np.uint64, count=len(urls))
        ts = table["warc_ts"].to_numpy(zero_copy_only=False)
        ts_i = ts.astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts_i, hashes))  # by hash, then warc_ts ascending
        h_sorted = hashes[order]
        # keep the LAST row of each hash run = newest snapshot for that url
        last_of_run = np.ones(len(h_sorted), dtype=bool)
        if len(h_sorted) > 1:
            last_of_run[:-1] = h_sorted[1:] != h_sorted[:-1]
        self.hashes = h_sorted[last_of_run]
        self.rows = order[last_of_run].astype(np.int64)
        self.hashes_full = h_sorted
        self.ts_full = ts_i[order]
        self.rows_full = order.astype(np.int64)

    @classmethod
    def _from_parts(cls, table, hashes, rows, hashes_full, ts_full, rows_full):
        obj = cls.__new__(cls)
        obj.table = table
        obj.hashes = hashes
        obj.rows = rows
        obj.hashes_full = hashes_full
        obj.ts_full = ts_full
        obj.rows_full = rows_full
        return obj

    def resolve(self, h: np.ndarray, asof_i64: int | None = None) -> np.ndarray:
        """Row id of the snapshot to serve per hash, -1 for miss."""
        if asof_i64 is None:
            pos = np.searchsorted(self.hashes, h)
            pos_c = np.minimum(pos, max(len(self.hashes) - 1, 0))
            found = (self.hashes[pos_c] == h) if len(self.hashes) else np.zeros(len(h), bool)
            out = np.full(len(h), -1, dtype=np.int64)
            out[found] = self.rows[pos_c[found]]
            return out
        # as-of: newest snapshot with warc_ts <= asof (404 if none yet).
        # Vectorized: asof is ONE scalar per call, so "elements <= asof
        # inside [lo, hi)" is a prefix-sum range count over the whole
        # sorted view (ts ascending within each hash run) — two
        # searchsorteds + one cumsum, no per-row Python.
        lo = np.searchsorted(self.hashes_full, h, side="left")
        hi = np.searchsorted(self.hashes_full, h, side="right")
        prefix = np.zeros(len(self.ts_full) + 1, np.int64)
        np.cumsum(self.ts_full <= asof_i64, out=prefix[1:])
        cnt = prefix[hi] - prefix[lo]
        out = np.full(len(h), -1, dtype=np.int64)
        found = cnt > 0
        out[found] = self.rows_full[lo[found] + cnt[found] - 1]
        return out


def _read_n_buckets(pages_dir: str) -> int:
    """Bucket-count for hash routing: the write-time modulus from the
    manifest when present, else a directory count (pre-manifest layouts,
    where the generator wrote every bucket=k dir including empty ones)."""
    manifest = os.path.join(pages_dir, "_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            return int(json.load(f)["n_buckets"])
    bucket_dirs = glob.glob(os.path.join(pages_dir, "bucket=*"))
    if not bucket_dirs:
        raise FileNotFoundError(f"no pages buckets under {pages_dir}")
    # only safe for layouts that materialize EVERY bucket=k dir (the corpus
    # generator does; ingest_pages layouts may skip empty buckets, where a
    # dir count would silently mis-route every lookup as a 404)
    import logging

    logging.getLogger(__name__).warning(
        "%s has no _manifest.json; falling back to a directory count "
        "(n_buckets=%d) — WRONG if any bucket of this corpus is empty. "
        "Re-ingest or write the manifest.", pages_dir, len(bucket_dirs))
    return len(bucket_dirs)


class PagesStore:
    """Lazy bucket-indexed view of a pages/ directory.

    Each loaded bucket becomes a vectorized :class:`_SnapshotIndex`;
    bucket-routed fetch actors only ever load the buckets their routed
    urls hash into, so memory per actor ≈ corpus_size / n_workers.
    """

    def __init__(self, corpus_dir: str):
        self.pages_dir = os.path.join(corpus_dir, "pages")
        self.n_buckets = _read_n_buckets(self.pages_dir)
        self._cache: dict[int, _SnapshotIndex | None] = {}

    def bucket_index(self, k: int) -> _SnapshotIndex | None:
        """The snapshot index for bucket k (None = empty bucket)."""
        if k in self._cache:
            return self._cache[k]
        files = sorted(glob.glob(os.path.join(self.pages_dir, f"bucket={k}", "*.parquet")))
        idx = None
        if files:
            table = pa.concat_tables([pq.read_table(f) for f in files])
            if table.num_rows:
                idx = _SnapshotIndex(table.combine_chunks())
        self._cache[k] = idx
        return idx


def build_shared_index(corpus_dir: str):
    """Build the url→newest-snapshot index ONCE and share it zero-copy.

    Returns object refs for the full pages Arrow table plus the sorted
    hash/row arrays of :class:`_SnapshotIndex`.  Every fetch actor
    ``ray.get``s these in ``__init__`` — Arrow tables and numpy arrays are
    served zero-copy from the local object store, so N actors share ONE
    copy instead of each parsing the bucket files.

    SCALE NOTE: this materializes the whole corpus into one object-store
    table, so it is the explicit SMALL-CORPUS fast path (and, on a real
    multi-node cluster, would be built per node over that node's bucket
    shard only).  The default crawl fetch path is bucket-routed
    ``PagesStore`` (``CrawlConfig.fetch='routed'``), which never loads more
    than one worker's bucket subset anywhere.
    """
    import ray

    files = sorted(glob.glob(os.path.join(corpus_dir, "pages", "bucket=*", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no pages buckets under {os.path.join(corpus_dir, 'pages')}")
    import pyarrow.dataset as pads

    table = pads.dataset(files).to_table(use_threads=True).combine_chunks()
    idx = _SnapshotIndex(table)
    return {
        "table": ray.put(table),
        "hashes": ray.put(idx.hashes),
        "rows": ray.put(idx.rows),
        "hashes_full": ray.put(idx.hashes_full),
        "ts_full": ray.put(idx.ts_full),
        "rows_full": ray.put(idx.rows_full),
    }


class FetchPages:
    """map_batches actor: frontier rows in → page snapshots out.

    Input batch needs a ``url`` column; all input columns pass through.
    Output adds (warc_ts, html, text, lang) and a ``fetch_ok`` bool; rows
    may be reordered within the batch (hits first, then 404s) — downstream
    stages are order-free, crawl ordering is recorded at pop time.

    Construct with ``corpus_dir=`` (bucket-routed ``PagesStore``, the scale
    path — each actor lazily loads only the buckets its urls hash into) or
    ``index=`` (shared zero-copy index refs from :func:`build_shared_index`,
    the small-corpus fast path).
    """

    def __init__(self, corpus_dir: str | None = None, index: dict | None = None,
                 asof_ts=None):
        import ray

        self.asof_i64 = (None if asof_ts is None
                         else np.datetime64(asof_ts, "us").astype(np.int64))
        if index is not None:
            self.shared = _SnapshotIndex._from_parts(
                ray.get(index["table"]), ray.get(index["hashes"]),
                ray.get(index["rows"]), ray.get(index["hashes_full"]),
                ray.get(index["ts_full"]), ray.get(index["rows_full"]))
            self.store = None
        else:
            self.shared = None
            self.store = PagesStore(corpus_dir)
        # per-host gate (T1): the reference sends over18=1 and carries
        # cookies per request (crawler/article.py:42-44,272-273); here the
        # gate additionally enforces robots.txt.  Rules are resolved ONCE
        # per (host, actor): the host's /robots.txt url is looked up through
        # the same snapshot store the pages come from (a live deployment
        # fetches it over HTTP instead) and parsed with stdlib
        # urllib.robotparser semantics.  No robots page → no rules → allow
        # all (the default corpora).  Disallowed urls 404 (the reference's
        # non-200 "invalid url" record); the robots lookup may lazily load
        # at most one extra bucket per distinct host on the routed path.
        self._host_gate: dict[str, object] = {}

    def _lookup_html(self, url: str) -> str | None:
        """The newest snapshot's decoded ``html`` for one url, else None.

        Decodes the raw html body (same as the oracle's ``build_web``,
        ``oracle/refcrawl.py:31``) rather than reading the extracted
        ``text`` column, which may be absent or whitespace-collapsed on
        ingested corpora.  Collision-verified like ``_assemble``.
        """
        h = np.array([hash_u64(url)], dtype=np.uint64)
        if self.shared is not None:
            idx = self.shared
        else:
            idx = self.store.bucket_index(int(h[0] % np.uint64(self.store.n_buckets)))
            if idx is None:
                return None
        r = idx.resolve(h, self.asof_i64)
        if r[0] < 0 or idx.table["url"][int(r[0])].as_py() != url:
            return None
        body = idx.table["html"][int(r[0])].as_py()
        return None if body is None else bytes(body).decode("utf-8")

    def _gate_rules(self, host: str):
        """Parsed robots rules for a host (None = no rules, allow all)."""
        if host in self._host_gate:
            return self._host_gate[host]
        rules = None
        body = self._lookup_html(f"https://{host}/robots.txt") if host else None
        if body:
            from urllib.robotparser import RobotFileParser

            rules = RobotFileParser()
            rules.parse(body.splitlines())
        self._host_gate[host] = rules
        return rules

    def _assemble(self, batch: pa.Table, urls: list[str],
                  resolved: np.ndarray, source_tables: list,
                  src_of: np.ndarray) -> pa.Table:
        """Hits (collision-verified) + null-filled misses → output table.

        ``resolved[i]`` is the row id within ``source_tables[src_of[i]]``
        (-1 = miss); the shared path has one source table, the bucket path
        one per touched bucket.
        """
        found = resolved >= 0
        # verify against hash collisions on the url column ONLY, then take
        # the full (html-bearing) rows once for the verified subset
        ok = np.zeros(len(urls), dtype=bool)
        fidx = np.flatnonzero(found)
        for s, table in enumerate(source_tables):
            sel = fidx[src_of[fidx] == s]
            if not len(sel):
                continue
            stored = table.column("url").take(pa.array(resolved[sel], pa.int64()))
            req = pa.array([urls[i] for i in sel], pa.string())
            ok[sel] = pc.equal(stored, req).to_numpy(zero_copy_only=False)

        hit_idx = np.flatnonzero(ok)
        miss_idx = np.flatnonzero(~ok)

        parts = []
        if len(hit_idx):
            # take per source table, preserving hit order within each source
            col_arrays: dict[str, list] = {name: [] for name in _EMPTY_COLS}
            order_parts = []
            for s, table in enumerate(source_tables):
                sel = hit_idx[src_of[hit_idx] == s]
                if not len(sel):
                    continue
                order_parts.append(sel)
                taken = table.take(pa.array(resolved[sel], pa.int64()))
                for name in _EMPTY_COLS:
                    col_arrays[name].extend(taken[name].chunks)
            order = np.concatenate(order_parts)
            hits = batch.take(pa.array(order, pa.int64()))
            for name in _EMPTY_COLS:
                hits = hits.append_column(
                    name, pa.chunked_array(col_arrays[name],
                                           type=taken[name].type))
            hits = hits.append_column(
                "fetch_ok", pa.array(np.ones(len(order), bool)))
            parts.append(hits)

        misses = batch.take(pa.array(miss_idx, pa.int64()))
        misses = misses.append_column("warc_ts", pa.nulls(len(miss_idx), pa.timestamp("us")))
        misses = misses.append_column("html", pa.nulls(len(miss_idx), pa.binary()))
        misses = misses.append_column("text", pa.nulls(len(miss_idx), pa.string()))
        misses = misses.append_column("lang", pa.nulls(len(miss_idx), pa.string()))
        misses = misses.append_column("fetch_ok", pa.array(np.zeros(len(miss_idx), bool)))
        parts.append(misses)
        return pa.concat_tables(parts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # consult the per-host robots gate: a disallowed url becomes a fetch
        # miss (the error-row path — acks/lineage still flow downstream).
        # Hosts without robots rules (the common case) skip the per-url
        # check entirely.
        urls = batch["url"].to_pylist()
        hosts = [u.split("/", 3)[2] if "//" in u else "" for u in urls]
        gates = {hh: self._gate_rules(hh) for hh in set(hosts)}
        if any(g is not None for g in gates.values()):
            blocked = np.fromiter(
                ((g := gates[hh]) is not None and not g.can_fetch("*", u)
                 for u, hh in zip(urls, hosts)),
                dtype=bool, count=len(urls))
        else:
            blocked = np.zeros(len(urls), dtype=bool)

        if "warc_ts" in batch.column_names:
            batch = batch.drop_columns(["warc_ts"])

        h = np.fromiter((hash_u64(u) for u in urls), dtype=np.uint64, count=len(urls))

        if self.shared is not None:
            resolved = self.shared.resolve(h, self.asof_i64)
            if blocked.any():
                resolved[blocked] = -1  # gate-blocked hosts read as 404
            return self._assemble(batch, urls, resolved,
                                  [self.shared.table],
                                  np.zeros(len(urls), dtype=np.int64))

        # bucket-routed path: group by bucket, resolve per bucket index
        b = (h % np.uint64(self.store.n_buckets)).astype(np.int64)
        resolved = np.full(len(urls), -1, dtype=np.int64)
        src_of = np.zeros(len(urls), dtype=np.int64)
        tables = []
        for k in np.unique(b):
            sel = np.flatnonzero(b == k)
            idx = self.store.bucket_index(int(k))
            if idx is None:
                continue
            src_of[sel] = len(tables)
            tables.append(idx.table)
            resolved[sel] = idx.resolve(h[sel], self.asof_i64)
        # tables may be empty (every bucket missed): all rows are misses and
        # _assemble's miss branch never consults source_tables
        if blocked.any():
            resolved[blocked] = -1
        return self._assemble(batch, urls, resolved, tables, src_of)
