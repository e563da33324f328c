"""Robots gate e2e (T1, north-rule "robots gating per host").

A corpus is planted with a /robots.txt page: board1's ARTICLE pages are
disallowed (indexes crawlable → links discovered, fetch blocked → typed
"invalid url" error rows, the reference's non-200 record) and board2 is
disallowed entirely (probe + indexes blocked → nothing discovered).  The
engine must agree with the sequential oracle, which reads the same rules.
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pttcrawler_ray.fixtures import generate_corpus
from pttcrawler_ray.oracle.refcrawl import sequential_crawl
from pttcrawler_ray.pipelines.crawl import CrawlConfig, latest_articles, run_crawl

_ROBOTS = """User-agent: *
Disallow: /bbs/board1/M.
Disallow: /bbs/board2/
"""


@pytest.fixture(scope="module")
def robots_crawl(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("robots_corpus"))
    generate_corpus(d, total_articles=150, robots_txt=_ROBOTS)
    pages = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{d}/pages/bucket=*/part-0.parquet"))]
    )
    boards = pq.read_table(f"{d}/seed_boards.parquet")["board"].to_pylist()
    golden = sequential_crawl(pages, boards)
    out = str(tmp_path_factory.mktemp("robots_crawl"))
    summary = run_crawl(d, out, CrawlConfig(
        num_shards=2, round_seconds=30.0, default_delay_s=2.0,
        strict_order=True, record_order=True,
        fetch_concurrency=1, process_concurrency=1,
        seen_capacity=100_000, checkpoint_every=0))
    return d, golden, out, summary


def _read_seen(out):
    files = sorted(glob.glob(os.path.join(out, "seen", "round=*", "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_robots_seen_and_articles_match_oracle(robots_crawl):
    _, golden, out, _ = robots_crawl
    assert set(_read_seen(out)["url"].to_pylist()) == golden["seen"]
    latest = latest_articles(out).to_pandas()
    assert set(latest["url"]) == set(golden["articles"])


def test_robots_blocks_disallowed_paths(robots_crawl):
    import ray.data as rd

    _, golden, out, _ = robots_crawl
    allrows = rd.read_parquet(os.path.join(out, "articles")).to_pandas()
    ok = allrows[allrows["error"].isna()]
    errs = allrows[allrows["error"].notna()]

    # no successfully-fetched article from a disallowed path
    assert not ok["url"].str.contains("/bbs/board1/M.", regex=False).any()
    assert not ok["url"].str.contains("/bbs/board2/", regex=False).any()
    # board1 articles WERE discovered (indexes allowed) and surfaced as the
    # reference's typed non-200 rows
    b1_errs = errs[errs["url"].str.contains("/bbs/board1/M.", regex=False)]
    assert len(b1_errs) > 0
    assert (b1_errs["error"] == "invalid url").all()
    assert set(errs["url"]) == set(golden["errors"])
    # board2 fully hidden: its indexes 404 → no article links discovered
    assert not allrows["url"].str.contains("/bbs/board2/", regex=False).any()
    # the allowed board crawled normally
    assert ok["url"].str.contains("/bbs/gossiping/", regex=False).sum() > 0


def test_robots_gate_reads_html_on_ingested_corpus(ray_session, tmp_path):
    """The gate must parse rules from the raw ``html`` body (like the
    oracle's build_web) — ingested WARC-style dumps carry no ``text``
    column, and even when present it may be whitespace-collapsed."""
    from pttcrawler_ray.sources.ingest import ingest_pages
    from pttcrawler_ray.sources.pages import FetchPages

    src = tmp_path / "dump.parquet"
    host = "www.example.org"
    pq.write_table(pa.table({
        "url": [f"https://{host}/robots.txt", f"https://{host}/a", f"https://{host}/b"],
        "warc_ts": pa.array([1_000_000] * 3, pa.timestamp("us")),
        "html": [_ROBOTS.replace("/bbs/board1/M.", "/a").replace("/bbs/board2/", "/zz/")
                 .encode(), b"<html>A</html>", b"<html>B</html>"],
    }), src)
    corpus = tmp_path / "corpus"
    ingest_pages(str(src), str(corpus), n_buckets=4, fmt="parquet")

    fp = FetchPages(corpus_dir=str(corpus))
    rules = fp._gate_rules(host)
    assert rules is not None
    assert not rules.can_fetch("*", f"https://{host}/a")
    assert rules.can_fetch("*", f"https://{host}/b")
    # unknown host: no robots page → allow-all sentinel
    assert fp._gate_rules("nowhere.invalid") is None


def test_robots_strict_order_matches_oracle(robots_crawl):
    _, golden, _, summary = robots_crawl
    per_lane: dict[str, list[str]] = {}
    for log in summary["order_logs"]:
        for lane, _, url in log:
            per_lane.setdefault(lane, []).append(url)
    for site, urls in golden["per_site_order"].items():
        assert per_lane[f"{site}#0"] == urls, site
