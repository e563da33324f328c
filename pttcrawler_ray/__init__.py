"""pttcrawler_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference crawler (gundambox/PttCrawler, studied read-only at
/root/reference) as idiomatic Ray Data pipelines:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches for all per-record work (fetch-lookup, parse, normalize, project);
- stateful actor pools for frontier shards (bloom/cuckoo URL-seen set,
  per-host politeness budget, priority queues, watermarks);
- ``groupby`` / ``sort`` for the wide steps (dedupe-latest, version
  rotation, watermark aggregation, report aggregates);
- checkpointed, partitioned Parquet sinks with per-partition lineage.

The "web" being crawled is a Parquet ``pages`` table of Common-Crawl-style
page snapshots (url, warc_ts, html, text, lang); a fetch is a keyed lookup
into that table, serving the newest snapshot.  See SURVEY.md for the full
operator inventory and the mapping from the reference's behavior.
"""

__version__ = "0.1.0"
