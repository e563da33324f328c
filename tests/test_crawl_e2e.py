"""End-to-end crawl vs the sequential oracle (SURVEY.md §5(3,4)).

The engine and the reference-shaped sequential crawler run over the same
synthetic pages table and seed boards; the engine must reproduce the URL-seen
set exactly, the per-site visit order exactly (strict mode, split=1), and the
same latest-version articles with byte-identical content.  A second run is
interrupted and resumed from checkpoint and must converge to the same state.
"""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pttcrawler_ray.fixtures import corpus_for_scale
from pttcrawler_ray.oracle.refcrawl import sequential_crawl
from pttcrawler_ray.pipelines.crawl import CrawlConfig, latest_articles, run_crawl


@pytest.fixture(scope="module")
def corpus_and_oracle(ray_session):
    d = corpus_for_scale("t1")
    pages = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{d}/pages/bucket=*/part-0.parquet"))]
    )
    boards = pq.read_table(f"{d}/seed_boards.parquet")["board"].to_pylist()
    golden = sequential_crawl(pages, boards)
    return d, golden


def _cfg(**kw):
    base = dict(num_shards=2, round_seconds=30.0, default_delay_s=2.0,
                strict_order=True, record_order=True,
                fetch_concurrency=1, process_concurrency=1,
                seen_capacity=100_000, checkpoint_every=0)
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def crawl_result(corpus_and_oracle, tmp_path_factory):
    d, golden = corpus_and_oracle
    out = str(tmp_path_factory.mktemp("crawl_full"))
    summary = run_crawl(d, out, _cfg())
    return d, golden, out, summary


def _read_seen(out):
    files = sorted(glob.glob(os.path.join(out, "seen", "round=*", "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_seen_set_matches_oracle(crawl_result):
    _, golden, out, _ = crawl_result
    seen = set(_read_seen(out)["url"].to_pylist())
    assert seen == golden["seen"]


def test_per_site_order_matches_oracle(crawl_result):
    _, golden, out, summary = crawl_result
    per_lane: dict[str, list[str]] = {}
    for log in summary["order_logs"]:
        for lane, _, url in log:
            per_lane.setdefault(lane, []).append(url)
    # split=1 ⇒ lane 'site#0' carries the whole site
    assert set(per_lane) == {f"{site}#0" for site in golden["per_site_order"]}
    for site, urls in golden["per_site_order"].items():
        assert per_lane[f"{site}#0"] == urls, site


def test_articles_match_oracle(crawl_result):
    _, golden, out, _ = crawl_result
    latest = latest_articles(out).to_pandas()
    latest_by_url = {r["url"]: r for _, r in latest.iterrows()}
    golden_ok = golden["articles"]
    assert set(latest_by_url) == set(golden_ok)
    for url, g in golden_ok.items():
        row = latest_by_url[url]
        assert row["content"] == g["content"], url  # byte-identical
        assert row["author"] == g["author"] and row["article_title"] == g["article_title"]
        assert row["warc_ts"].to_pydatetime() == g["warc_ts"], url  # newest snapshot served

    # error pages surfaced as typed error rows, not silently dropped
    import ray.data as rd

    allrows = rd.read_parquet(os.path.join(out, "articles")).to_pandas()
    errs = allrows[allrows["error"].notna()]
    assert set(errs["url"]) == set(golden["errors"])


def test_politeness_budget_respected(crawl_result):
    _, _, _, summary = crawl_result
    # budget = round_seconds / delay = 30 / 2.0 = 15 per lane per round
    for log in summary["politeness_logs"]:
        for _, _, released in log:
            assert released <= 15


def test_resume_converges(corpus_and_oracle, tmp_path_factory):
    d, golden = corpus_and_oracle
    out = str(tmp_path_factory.mktemp("crawl_resume"))
    partial = run_crawl(d, out, _cfg(checkpoint_every=2, max_rounds=6, record_order=False))
    assert partial["rounds"] == 6  # interrupted mid-crawl
    resumed = run_crawl(d, out, _cfg(checkpoint_every=2, record_order=False), resume=True)
    assert resumed["rounds"] > 6

    seen = set(_read_seen(out)["url"].to_pylist())
    assert seen == golden["seen"]
    latest = latest_articles(out).to_pandas()
    assert set(latest["url"]) == set(golden["articles"])
    by_url = dict(zip(latest["url"], latest["content"]))
    for url, g in golden["articles"].items():
        assert by_url[url] == g["content"], url

    # per-partition lineage in the checkpoint: every recorded round carries
    # per-shard fetch counts, frontier depth, and dedupe hit rate
    import json

    with open(os.path.join(out, "checkpoint", "run.json")) as f:
        run_meta = json.load(f)
    logged = [r for r in run_meta["rounds_log"] if "shards" in r]
    assert logged, "no per-shard lineage in rounds_log"
    for r in logged:
        assert {s["shard_id"] for s in r["shards"]} == {0, 1}
        for s in r["shards"]:
            assert s["popped"] >= 0 and s["depth"] >= 0
            assert 0.0 <= s["dedup_hit_rate"] <= 1.0
    last = logged[-1]["shards"]
    assert sum(s["popped"] for s in last) == len(seen)
