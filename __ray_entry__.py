"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline over a deterministic synthetic
PTT-web corpus; ``queries()`` exposes one callable per implemented operator
family from SURVEY.md §2 (plus the training-data ops); ``oracle_sql()``
provides DuckDB-equivalent SQL for everything SQL-expressible over the
pre-registered testdata views.  Crawl/parse operators run over the
synthetic ``pages`` corpus (not representable as a DuckDB view) and are
covered by the rows-only check here plus the byte-identical golden suite
under ``tests/`` (``python -m pytest -x -q``).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable
from typing import Any

# the package lives next to this file; make the import robust to the
# driver's working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ctx():
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_tensor_extension_casting = False  # keep list<struct> columns Arrow-native
    return ctx


# --------------------------------------------------------------------------
# crawl-backed queries: run the crawl once per scale, cache under /tmp
# --------------------------------------------------------------------------
_SCALE_BY_SF = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "t2"}
_CRAWL_CACHE: dict[str, str] = {}
_IP_ASN_CACHE: dict[str, dict] = {}


def _ip_asn_for(scale: str) -> dict:
    """The IpAsn broadcast dim, built once per crawl scale."""
    if scale not in _IP_ASN_CACHE:
        from pttcrawler_ray.fixtures import corpus_for_scale
        from pttcrawler_ray.pipelines.export import build_ip_asn_map

        _IP_ASN_CACHE[scale] = build_ip_asn_map(_crawl_out(scale),
                                                corpus_for_scale(scale))
    return _IP_ASN_CACHE[scale]


def _scale_of(sf_dir: str) -> str:
    return _SCALE_BY_SF.get(os.path.basename(os.path.normpath(sf_dir)), "t1")


def _crawl_out(scale: str) -> str:
    """Crawl the synthetic corpus for ``scale`` (cached on disk per scale)."""
    if scale in _CRAWL_CACHE:
        return _CRAWL_CACHE[scale]
    _ctx()
    from pttcrawler_ray.fixtures import corpus_for_scale
    from pttcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    corpus = corpus_for_scale(scale)
    out = f"/tmp/ptt_crawl/{scale}"
    # cache validity: the crawl must match the corpus it was built from
    # (fixtures changes regenerate the corpus with new manifest params)
    with open(os.path.join(corpus, "manifest.json")) as f:
        corpus_params = json.load(f)["params"]
    marker = os.path.join(out, "corpus_params.json")
    stale = True
    if os.path.exists(os.path.join(out, "summary.json")) and os.path.exists(marker):
        with open(marker) as f:
            stale = json.load(f) != corpus_params
    if stale:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(num_shards=4, strict_order=False, round_seconds=3600.0,
                          fetch_concurrency=4, process_concurrency=4,
                          engine="actors", seen_capacity=1_000_000)
        run_crawl(corpus, out, cfg)
        with open(marker, "w") as f:
            json.dump(corpus_params, f)
    from pttcrawler_ray.pipelines.crawl import materialize_latest

    materialize_latest(out)  # the dedupe view is read by several queries
    _CRAWL_CACHE[scale] = out
    return out


def _flatten_articles(ds):
    """Latest articles with nested columns flattened (driver-conversion safe)."""

    def flat(t: pa.Table) -> pa.Table:
        mc = t["message_count"].combine_chunks() if isinstance(t["message_count"], pa.ChunkedArray) else t["message_count"]
        n_msgs = pc.fill_null(mc.field("all") if hasattr(mc, "field") else pa.nulls(len(t), pa.int32()), 0)
        return pa.table({
            "url": t["url"], "board": t["board"], "article_id": t["article_id"],
            "article_title": t["article_title"], "author": t["author"],
            "date": t["date"], "content": t["content"], "ip": t["ip"],
            "n_messages": pc.cast(n_msgs, pa.int64()),
            "warc_ts": t["warc_ts"],
        })

    return ds.map_batches(flat, batch_format="pyarrow")


def entry() -> Any:
    """Flagship: crawl the t1 synthetic web end-to-end (frontier shards →
    fetch → parse → dedupe-latest) and return the latest-article Dataset."""
    from pttcrawler_ray.pipelines.crawl import latest_articles

    out = _crawl_out("t1")
    return _flatten_articles(latest_articles(out))


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------
def queries() -> dict[str, Callable[[str], Any]]:
    import pttcrawler_ray.relational as R

    def crawl_latest(sf_dir):
        from pttcrawler_ray.pipelines.crawl import latest_articles

        return _flatten_articles(latest_articles(_crawl_out(_scale_of(sf_dir))))

    def crawl_pushes(sf_dir):
        from pttcrawler_ray.pipelines.crawl import latest_articles
        from pttcrawler_ray.stages.normalize import explode_pushes_batch

        ds = latest_articles(_crawl_out(_scale_of(sf_dir)))
        return ds.map_batches(explode_pushes_batch, batch_format="pyarrow")

    def crawl_seen(sf_dir):
        import ray.data as rd

        return rd.read_parquet(os.path.join(_crawl_out(_scale_of(sf_dir)), "seen"))

    def crawl_export(sf_dir):
        from pttcrawler_ray.fixtures import corpus_for_scale
        from pttcrawler_ray.pipelines.export import export_articles

        scale = _scale_of(sf_dir)
        return export_articles(_crawl_out(scale), corpus_for_scale(scale),
                               ip_asn=_ip_asn_for(scale))

    def crawl_report(sf_dir):
        from pttcrawler_ray.fixtures import corpus_for_scale
        from pttcrawler_ray.pipelines.query import board_ip_report

        scale = _scale_of(sf_dir)
        return board_ip_report(_crawl_out(scale), corpus_for_scale(scale),
                               "gossiping", ip_asn=_ip_asn_for(scale))

    def crawl_users(sf_dir):
        from pttcrawler_ray.fixtures import corpus_for_scale
        from pttcrawler_ray.pipelines.users import users_dataset

        return users_dataset(corpus_for_scale(_scale_of(sf_dir)))

    def crawl_watermarks(sf_dir):
        from pttcrawler_ray.pipelines.compact import board_watermarks

        return board_watermarks(_crawl_out(_scale_of(sf_dir)))

    def exact_dedup_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.dedup import exact_dedup

        _ctx()
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        return exact_dedup(docs).select_columns(["doc_id"])

    def token_counts_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.analysis import token_count_batch

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        return docs.map_batches(token_count_batch, batch_format="pyarrow") \
                   .select_columns(["doc_id", "n_tokens"])

    def quality_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.analysis import quality_score_batch

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        return docs.map_batches(quality_score_batch, batch_format="pyarrow") \
                   .select_columns(["doc_id", "alpha_ratio", "stop_ratio",
                                    "distinct_ratio", "quality"])

    def langid_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.analysis import LangId

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        return docs.map_batches(LangId, batch_format="pyarrow",
                                concurrency=(1, 2)) \
                   .select_columns(["doc_id", "pred_lang", "lang_confidence"])

    def fingerprint_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.analysis import fingerprint_batch

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        return docs.map_batches(fingerprint_batch, batch_format="pyarrow") \
                   .select_columns(["doc_id", "text_hash"])

    def minhash_pairs_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.dedup import minhash_lsh_pairs

        _ctx()
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        return minhash_lsh_pairs(docs, threshold=0.5)

    def ngram_jaccard_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.dedup import ngram_jaccard_pairs

        _ctx()
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        return ngram_jaccard_pairs(docs, threshold=0.5)

    def simhash_pairs_docs(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.dedup import simhash_pairs

        _ctx()
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        return simhash_pairs(docs, max_hamming=3)

    def embedding_neardup(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.dedup import embedding_neardup_pairs

        _ctx()
        embs = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
        return embedding_neardup_pairs(embs, dim=64, threshold=0.95, bits=8)

    def knn_ivf_q(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.textops.similarity import knn_ivf

        _ctx()
        embs = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
        qdf = embs.limit(3).to_pandas()
        q = np.stack(qdf["embedding"])
        return knn_ivf(embs, q, k=5, n_clusters=8, nprobe=4)

    def curate_docs(sf_dir):
        """Composed training-data curation: quality-score → langid →
        quality/lang filter → near-dup removal; the end-to-end pipeline a
        100TB curation job would run (rows-only check)."""
        import ray.data as rd
        from pttcrawler_ray.textops.analysis import LangId, quality_score_batch
        from pttcrawler_ray.textops.dedup import minhash_dedup

        _ctx()
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        docs = docs.map_batches(quality_score_batch, batch_format="pyarrow")
        docs = docs.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2))
        docs = docs.map_batches(
            lambda t: t.filter(pc.and_(pc.greater(t["quality"], 0.3),
                                       pc.greater(t["stop_ratio"], 0.0))),
            batch_format="pyarrow")
        kept = minhash_dedup(docs.select_columns(["doc_id", "text", "quality",
                                                  "pred_lang"]), threshold=0.8)
        return kept

    def multimodal_decode(sf_dir):
        import ray.data as rd
        from pttcrawler_ray.multimodal import decode_media, make_fake_blob

        _ctx()
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id"])
        blobs = docs.map_batches(
            lambda t: pa.table({
                "media_id": t["doc_id"],
                "payload": pa.array([make_fake_blob(i) for i in t["doc_id"].to_pylist()],
                                    pa.binary()),
            }), batch_format="pyarrow")
        return decode_media(blobs, fake=True).select_columns(
            ["media_id", "kind", "width", "height", "channels"])

    return {
        # --- SQL-checked relational operators over the testdata views -----
        "latest_event_per_user": R.latest_event_per_user,
        "event_type_watermarks": R.event_type_watermarks,
        "topk_events_per_user": R.topk_events_per_user,
        "customers_without_orders": R.customers_without_orders,
        "orders_of_segment": R.orders_of_segment,
        "orders_per_customer": R.orders_per_customer,
        "customers_balance_by_nation": R.customers_balance_by_nation,
        "distinct_doc_dims": R.distinct_doc_dims,
        "top_orders": R.top_orders,
        "orders_denorm": R.orders_denorm,
        "lineitem_summary": R.lineitem_summary,
        "high_value_events": R.high_value_events,
        "events_hourly": R.events_hourly,
        "knn_top1": R.knn_top1,
        "exact_dedup_docs": exact_dedup_docs,
        "token_counts_docs": token_counts_docs,
        "doc_stats_by_lang": _doc_stats_by_lang,
        "lineitem_order_join": R.lineitem_order_join,
        "events_asof_orders": R.events_asof_orders,
        "user_sessions": R.user_sessions,
        # --- crawl engine (synthetic pages corpus; rows-only check) -------
        "crawl_latest_articles": crawl_latest,
        "crawl_pushes": crawl_pushes,
        "crawl_seen": crawl_seen,
        "crawl_export_articles": crawl_export,
        "crawl_board_report": crawl_report,
        "crawl_users": crawl_users,
        "crawl_watermarks": crawl_watermarks,
        # --- training-data ops (rows-only) --------------------------------
        "quality_docs": quality_docs,
        "langid_docs": langid_docs,
        "fingerprint_docs": fingerprint_docs,
        "minhash_pairs_docs": minhash_pairs_docs,
        "ngram_jaccard_docs": ngram_jaccard_docs,
        "simhash_pairs_docs": simhash_pairs_docs,
        "embedding_neardup": embedding_neardup,
        "knn_ivf": knn_ivf_q,
        "multimodal_decode": multimodal_decode,
        "curate_docs": curate_docs,
    }


def _doc_stats_by_lang(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "n_chars"])
    return docs.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------
def oracle_sql() -> dict[str, str]:
    return {
        "latest_event_per_user": """
            SELECT user_id, event_id, ts, event_type, value FROM (
              SELECT e.*, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events e) t
            WHERE rn = 1
        """,
        "event_type_watermarks": """
            SELECT event_type, min(ts) AS min_ts, max(ts) AS max_ts
            FROM events GROUP BY event_type
        """,
        "topk_events_per_user": """
            SELECT user_id, event_id, ts FROM (
              SELECT user_id, event_id, ts, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) t
            WHERE rn <= 3
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
              SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """,
        "orders_of_segment": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_custkey IN (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """,
        "orders_per_customer": """
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_custkey
        """,
        "customers_balance_by_nation": """
            SELECT n_name AS nation,
                   CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS positive_bal,
                   CAST(sum(CASE WHEN c_acctbal > 0 THEN 0 ELSE 1 END) AS BIGINT)
                     AS non_positive_bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "distinct_doc_dims": "SELECT DISTINCT lang, source FROM documents",
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "orders_denorm": """
            SELECT o_orderkey, c_name, n_name, o_totalprice
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
        """,
        "lineitem_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "high_value_events": """
            SELECT event_id, user_id FROM events WHERE value >= 90.0
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   CAST(count(*) AS BIGINT) AS n_events,
                   max(value) AS max_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "knn_top1": """
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 3 AND e.vec_id != q.vec_id
            QUALIFY row_number() OVER (
              PARTITION BY q.vec_id
              ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                       e.vec_id) = 1
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "token_counts_docs": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "doc_stats_by_lang": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "lineitem_order_join": """
            SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        "events_asof_orders": """
            SELECT event_id, o_orderkey FROM (
              SELECT e.event_id, o.o_orderkey,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
              FROM events e
              JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
            ) t WHERE rn = 1
        """,
        "user_sessions": """
            SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM (
              SELECT user_id, event_id, ts,
                     CAST(sum(CASE WHEN gap THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM (
                SELECT *, (ts - lag(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id))
                  > INTERVAL 60 MINUTE AS gap
                FROM events) g
            ) s GROUP BY user_id, session_id
        """,
    }
