"""Snapshot-CDC soak: diff two crawls of the 400k-article corpus.

Evidence tool for :mod:`pttcrawler_ray.pipelines.diff` (BASELINE.md):
crawl the ``scaling`` corpus twice — side A as of ``DIFF_ASOF_DAYS``
past the epoch (later-snapshotted urls are misses, later re-edits
resolve an earlier version), side B full latest — then diff the two
latest views and check the delta EXACTLY against DuckDB's independent
FULL JOIN / IS DISTINCT FROM over the same materialized parquet.

Run from the repo root:  python tools/soak_diff_scale.py
"""
import json
import os
import resource
import shutil
import sys
import time
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.fixtures import _EPOCH, corpus_for_scale
    from pttcrawler_ray.pipelines.crawl import (CrawlConfig,
                                                materialize_latest,
                                                run_crawl)
    from pttcrawler_ray.pipelines.diff import diff_crawls, diff_sql

    corpus = corpus_for_scale("scaling")
    # fixtures place article snapshot i at epoch+30d+i minutes, so the
    # corpus MIDPOINT gives a balanced window: side A sees ~half the
    # urls (added ≈ half), re-edits (+1..3 d) near the cut → changed
    with open(os.path.join(corpus, "manifest.json")) as f:
        total = json.load(f)["params"]["total_articles"]
    asof = _EPOCH + timedelta(days=30, minutes=total // 2)
    base = dict(num_shards=8, strict_order=False, round_seconds=1e6,
                fetch_concurrency=8, process_concurrency=8,
                engine="actors", seen_capacity=2_000_000,
                split={"www.ptt.cc/gossiping": 8})
    out = {}
    root = "/tmp/ptt_diff_soak"
    shutil.rmtree(root, ignore_errors=True)

    t0 = time.time()
    run_crawl(corpus, f"{root}/a", CrawlConfig(**base, asof_ts=asof))
    out["crawl_a_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    run_crawl(corpus, f"{root}/b", CrawlConfig(**base))
    out["crawl_b_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    delta = diff_crawls(f"{root}/a", f"{root}/b").to_pandas() \
        .sort_values("url").reset_index(drop=True)
    out["diff_s"] = round(time.time() - t0, 1)
    la, lb = materialize_latest(f"{root}/a"), materialize_latest(f"{root}/b")
    ray.shutdown()

    import duckdb

    t0 = time.time()
    want = duckdb.connect().execute(diff_sql(la, lb)).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    out["sql_twin_s"] = round(time.time() - t0, 1)

    exact = delta.equals(want[["url", "status"]])
    counts = delta["status"].value_counts().to_dict()
    out.update({
        "urls_b": int(duckdb.connect().execute(
            f"SELECT count(*) FROM read_parquet('{lb}/*.parquet')").fetchone()[0]),
        "added": int(counts.get("added", 0)),
        "changed": int(counts.get("changed", 0)),
        "removed": int(counts.get("removed", 0)),
        "driver_peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        "exact_match": bool(exact),
    })
    print(json.dumps(out))
    sys.exit(0 if exact else 1)


if __name__ == "__main__":
    main()
