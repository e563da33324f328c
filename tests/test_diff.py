"""Crawl snapshot diff (pipelines/diff.py): synthetic all-status unit
test, and an e2e re-crawl diff (date-filtered as-of run vs full run)
exact against the DuckDB FULL-JOIN twin."""

from datetime import timedelta

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pttcrawler_ray.fixtures import _EPOCH


def _view(rows):
    """A latest-article-view-shaped table from (url, ts_min, content,
    msgs, error) tuples."""
    msg = pa.list_(pa.struct([("push_tag", pa.string()),
                              ("push_userid", pa.string()),
                              ("push_content", pa.string()),
                              ("push_ipdatetime", pa.string())]))
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([_EPOCH + timedelta(minutes=r[1]) for r in rows],
                            pa.timestamp("us")),
        "article_title": pa.array(["t"] * len(rows), pa.string()),
        "author": pa.array(["a"] * len(rows), pa.string()),
        "date": pa.array(["d"] * len(rows), pa.string()),
        "content": pa.array([r[2] for r in rows], pa.string()),
        "ip": pa.array(["1.2.3.4"] * len(rows), pa.string()),
        "messages": pa.array([r[3] for r in rows], msg),
        "error": pa.array([r[4] for r in rows], pa.string()),
    })


def test_diff_latest_statuses(ray_session):
    from pttcrawler_ray.pipelines.diff import diff_latest

    push = [{"push_tag": "推", "push_userid": "u", "push_content": "c",
             "push_ipdatetime": "ip"}]
    a = _view([
        ("u/same", 0, "body", [], None),
        ("u/gone", 0, "body", [], None),
        ("u/edit", 0, "body", [], None),
        ("u/push", 0, "body", [], None),
        ("u/null", 0, None, [], None),      # null vs "" must differ
        ("u/err", 0, "body", [], "404"),    # error rows excluded
        ("u/inj", 0, "x\x1dy", [], None),   # separator injection: the
    ])                                       # framing must stay injective
    b = _view([
        ("u/same", 0, "body", [], None),
        ("u/new", 1, "body", [], None),
        ("u/edit", 5, "body v2", [], None),
        ("u/push", 0, "body", push, None),  # same ts, push edit
        ("u/null", 0, "", [], None),
        ("u/err", 0, "body", [], "500"),
        ("u/inj", 0, "x", [], None),
    ])
    # shift the u/inj difference into the ADJACENT field: a naive
    # separator-joined serialization aliases A(content="x\x1dy", ip="z")
    # with B(content="x", ip="y\x1dz")
    ipi = a.column_names.index("ip")
    a = a.set_column(ipi, "ip", pa.array(["1.2.3.4"] * 6 + ["z"]))
    b = b.set_column(ipi, "ip", pa.array(["1.2.3.4"] * 6 + ["y\x1dz"]))
    got = diff_latest(rd.from_arrow(a), rd.from_arrow(b)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = {"u/gone": "removed", "u/new": "added", "u/edit": "changed",
            "u/push": "changed", "u/null": "changed", "u/inj": "changed"}
    assert dict(zip(got["url"], got["status"])) == want


def test_diff_crawls_e2e_matches_duckdb(ray_session, tmp_path):
    """Two real crawls of one versioned corpus — run A date-filtered and
    as-of (the incremental window), run B full at latest — diff classes
    non-vacuous and row-for-row equal to the SQL twin."""
    import duckdb

    from pttcrawler_ray.fixtures import generate_corpus
    from pttcrawler_ray.pipelines.crawl import (CrawlConfig,
                                                materialize_latest,
                                                run_crawl)
    from pttcrawler_ray.pipelines.diff import diff_crawls, diff_sql

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, total_articles=150, n_boards=2,
                    dup_fraction=0.3)
    base = dict(num_shards=2, strict_order=False, record_order=False,
                round_seconds=3600.0, fetch_concurrency=2,
                process_concurrency=2)
    out_a = str(tmp_path / "a")
    run_crawl(corpus, out_a, CrawlConfig(
        **base, asof_ts=_EPOCH + timedelta(days=31, hours=2),
        start_date=_EPOCH + timedelta(hours=6)))
    out_b = str(tmp_path / "b")
    run_crawl(corpus, out_b, CrawlConfig(**base))

    got = diff_crawls(out_a, out_b).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    la, lb = materialize_latest(out_a), materialize_latest(out_b)
    con = duckdb.connect()
    want = con.execute(diff_sql(la, lb)).fetchdf() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(want[["url", "status"]])
    # the corpus shape makes both classes real: the date filter hides
    # old articles from A (added), re-edit snapshots after the as-of
    # change records (changed)
    counts = got["status"].value_counts()
    assert counts.get("added", 0) > 0, counts
    assert counts.get("changed", 0) > 0, counts
