"""Crawl-mode coverage: date-filter cutoff (M8), upgrade/as-of versioning
(M9/D2/O3), watermark seed modes (--before/--after), per-page JSON sink (K1)."""

import glob
import json
import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pttcrawler_ray.fixtures import corpus_for_scale, _EPOCH
from pttcrawler_ray.oracle.refcrawl import sequential_crawl
from pttcrawler_ray.pipelines.crawl import (CrawlConfig, latest_articles,
                                            load_watermarks, run_crawl)


@pytest.fixture(scope="module")
def corpus(ray_session):
    d = corpus_for_scale("t1")
    pages = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{d}/pages/bucket=*/part-0.parquet"))])
    boards = pq.read_table(f"{d}/seed_boards.parquet")["board"].to_pylist()
    return d, pages, boards


def _read_seen(out):
    files = sorted(glob.glob(os.path.join(out, "seen", "round=*", "*.parquet")))
    return set(pa.concat_tables([pq.read_table(f) for f in files])["url"].to_pylist())


def _cfg(**kw):
    base = dict(num_shards=2, round_seconds=30.0, default_delay_s=2.0,
                strict_order=True, fetch_concurrency=1, process_concurrency=1,
                seen_capacity=100_000)
    base.update(kw)
    return CrawlConfig(**base)


def test_date_filter_matches_oracle(corpus, tmp_path):
    d, pages, boards = corpus
    start = _EPOCH + timedelta(hours=40)
    golden = sequential_crawl(pages, boards, start_date=start)

    out = str(tmp_path / "datefilter")
    run_crawl(d, out, _cfg(start_date=start))

    assert _read_seen(out) == golden["seen"]  # cutoff stops the same pages
    latest = latest_articles(out).to_pandas()
    assert set(latest["url"]) == set(golden["articles"])  # same kept articles
    by_url = dict(zip(latest["url"], latest["content"]))
    for url, g in golden["articles"].items():
        assert by_url[url] == g["content"], url
    # the cutoff actually cut something (not a vacuous pass)
    full = sequential_crawl(pages, boards)
    assert len(golden["seen"]) < len(full["seen"])


def test_upgrade_asof_versioning_and_rotation(corpus, tmp_path):
    import ray.data as rd
    from pttcrawler_ray.pipelines.compact import rotate_versions

    d, pages, boards = corpus
    asof_a = _EPOCH + timedelta(days=31, hours=2)  # before the re-edit snapshots

    out_a = str(tmp_path / "crawl_a")
    out_b = str(tmp_path / "crawl_b")
    run_crawl(d, out_a, _cfg(strict_order=False, round_seconds=3600.0, asof_ts=asof_a))
    run_crawl(d, out_b, _cfg(strict_order=False, round_seconds=3600.0, upgrade=True))

    assert _read_seen(out_a) == _read_seen(out_b)  # upgrade re-visits everything

    a = latest_articles(out_a).to_pandas().set_index("url")
    b = latest_articles(out_b).to_pandas().set_index("url")
    assert set(a.index) == set(b.index)
    edited = [u for u in a.index if b.loc[u, "warc_ts"] > a.loc[u, "warc_ts"]]
    assert len(edited) > 10  # the multi-snapshot urls got newer versions
    u = edited[0]
    assert b.loc[u, "message_count"]["all"] > a.loc[u, "message_count"]["all"]

    # union of both runs = the version store; rotation keeps the newest k
    versions = rd.read_parquet(os.path.join(out_a, "articles")).union(
        rd.read_parquet(os.path.join(out_b, "articles")))
    versions = versions.map_batches(
        lambda t: t.filter(pa.compute.is_null(t["error"])), batch_format="pyarrow")
    rotated = rotate_versions(versions, keep=1).to_pandas()
    assert len(rotated) == len(b)
    rot = rotated.set_index("url")
    for u in edited[:5]:
        assert rot.loc[u, "warc_ts"] == b.loc[u, "warc_ts"]


def test_seed_modes(corpus, tmp_path):
    d, pages, boards = corpus
    out_full = str(tmp_path / "full")
    run_crawl(d, out_full, _cfg(strict_order=False, round_seconds=3600.0))
    wm = load_watermarks(out_full)
    assert set(wm) == set(boards)
    for board, (lo, hi) in wm.items():
        assert lo == 1 and hi >= 1

    # after-mode: re-crawl only [prior max watermark, live last]
    out_after = str(tmp_path / "after")
    run_crawl(d, out_after, _cfg(strict_order=False, round_seconds=3600.0,
                                 seed_mode="after", prior_watermarks=wm))
    seen_after = _read_seen(out_after)
    idx_after = {u for u in seen_after if "/index" in u}
    expected_idx = {f"https://www.ptt.cc/bbs/{b}/index{wm[b][1]}.html" for b in boards}
    assert idx_after == expected_idx

    # incremental after-mode on the ORIGINAL out dir EXTENDS it (no wipe)
    n_before = len(_read_seen(out_full))
    run_crawl(d, out_full, _cfg(strict_order=False, round_seconds=3600.0,
                                seed_mode="after", prior_watermarks=wm))
    seen_inc = _read_seen(out_full)
    assert len(seen_inc) == n_before  # prior data intact, overlap re-visited
    from pttcrawler_ray.pipelines.crawl import latest_articles

    assert latest_articles(out_full).count() > 0  # dedupe absorbs the overlap

    # before-mode with a fake floor watermark: only pages [1, floor]
    fake = {b: [3, wm[b][1]] for b in boards}
    out_before = str(tmp_path / "before")
    run_crawl(d, out_before, _cfg(strict_order=False, round_seconds=3600.0,
                                  seed_mode="before", prior_watermarks=fake))
    idx_before = {u for u in _read_seen(out_before) if "/index" in u}
    assert idx_before == {f"https://www.ptt.cc/bbs/{b}/index{n}.html"
                          for b in boards for n in (1, 2, 3)}


def test_index_only_then_fetch(corpus, tmp_path):
    """The reference two-phase workflow: article_index (discovery only,
    S3/A2) grows the frontier; article --database (S4) fetches from it."""
    from pttcrawler_ray.pipelines.crawl import frontier_table

    d, pages, boards = corpus
    golden = sequential_crawl(pages, boards)
    out = str(tmp_path / "twophase")

    # phase 1: discovery only
    s1 = run_crawl(d, out, _cfg(strict_order=False, round_seconds=3600.0,
                                index_only=True))
    idx_urls = {u for u in golden["seen"] if "/index" in u}
    art_urls = golden["seen"] - idx_urls
    assert s1["popped"] == len(idx_urls)  # only index pages fetched
    frontier = frontier_table(out).to_pandas()
    assert set(frontier["url"]) == art_urls  # the ArticleIndex analog
    assert (frontier["kind"] == "article").all()

    # phase 2: fetch from the recorded frontier
    s2 = run_crawl(d, out, _cfg(strict_order=False, round_seconds=3600.0),
                   resume=True)
    assert s2["popped"] == len(art_urls)  # phase 2 fetches exactly the frontier
    assert set(_read_seen(out)) == golden["seen"]  # both phases together
    latest = latest_articles(out).to_pandas()
    assert set(latest["url"]) == set(golden["articles"])
    by_url = dict(zip(latest["url"], latest["content"]))
    for url, g in list(golden["articles"].items())[:50]:
        assert by_url[url] == g["content"], url


def test_index_range_seeding(corpus, tmp_path):
    """Reference `article --index START END`: crawl only those pages."""
    d, pages, boards = corpus
    out = str(tmp_path / "range")
    run_crawl(d, out, _cfg(strict_order=False, round_seconds=3600.0,
                           index_range=(2, 4)))
    idx = {u for u in _read_seen(out) if "/index" in u}
    assert idx == {f"https://www.ptt.cc/bbs/{b}/index{n}.html"
                   for b in boards for n in (2, 3, 4)}


def test_realtime_pacing(corpus, tmp_path):
    """realtime mode: wall time >= rounds x round_seconds (politeness is
    enforced in real time by the scheduler, never by sleeping workers)."""
    import time

    d, _, _ = corpus
    out = str(tmp_path / "rt")
    t0 = time.monotonic()
    # seed delays are 2.0s → budget 1 url/lane/round at round_seconds=1.0
    s = run_crawl(d, out, _cfg(strict_order=False, round_seconds=1.0,
                               realtime=True, max_rounds=4,
                               index_range=(1, 1)))
    wall = time.monotonic() - t0
    assert s["rounds"] == 4
    assert wall >= 4.0  # each politeness epoch took its full wall time
    for log in s["politeness_logs"]:
        for _, _, released in log:
            assert released <= 1  # 1 url per 2s-delay lane per 1s epoch


def test_page_json_golden(corpus, tmp_path):
    from pttcrawler_ray.oracle.refparse import ref_parse_index
    from pttcrawler_ray.pipelines.export import write_page_json

    d, pages, boards = corpus
    golden = sequential_crawl(pages, boards)

    out = str(tmp_path / "crawl")
    run_crawl(d, out, _cfg(strict_order=False, round_seconds=3600.0))
    dest = str(tmp_path / "json")
    n_files = write_page_json(out, dest, prefix="ptt_")
    assert n_files > 20

    # byte-stable vs the reference's json.dump formatting, for two pages
    by_url = {u: {k: v for k, v in a.items() if k != "warc_ts"}
              for u, a in golden["articles"].items()}
    checked = 0
    for board, page_no in [("gossiping", 3), (boards[1], 2)]:
        html = next(pages["html"][i].as_py().decode("utf-8")
                    for i in range(pages.num_rows)
                    if pages["url"][i].as_py() == f"https://www.ptt.cc/bbs/{board}/index{page_no}.html")
        expected_list = [by_url[link] for _, link, _ in ref_parse_index(html, page_no)
                         if link in by_url]
        expected = json.dumps(expected_list, sort_keys=True, indent=4, ensure_ascii=False)
        with open(os.path.join(dest, f"ptt_{board}_{page_no}.json"), encoding="utf-8") as f:
            actual = f.read()
        assert actual == expected, (board, page_no)
        checked += 1
    assert checked == 2


def test_date_filter_interrupted_resume(corpus, tmp_path):
    """An interrupted (max_rounds) date-filtered crawl must NOT emit held
    undated rows early, and the resumed run must emit them exactly once —
    final article set equals the sequential oracle (review finding r2)."""
    d, pages, boards = corpus
    start = _EPOCH + timedelta(hours=40)
    golden = sequential_crawl(pages, boards, start_date=start)

    out = str(tmp_path / "df_resume")
    s1 = run_crawl(d, out, _cfg(start_date=start, checkpoint_every=2,
                                max_rounds=6))
    assert s1["rounds"] == 6  # genuinely interrupted mid-crawl
    # interrupt: no undated reconciliation round was written
    import pyarrow.parquet as _pq

    def all_urls():
        files = glob.glob(os.path.join(out, "articles", "round=*", "*.parquet"))
        return [u for f in files for u in _pq.read_table(f, columns=["url"])["url"].to_pylist()]

    undated_urls = {u for u, a in sequential_crawl(pages, boards)["articles"].items()
                    if a["date"] and "不明" in a["date"]}
    # at the interrupt NO undated reconciliation round was written (their
    # pages' too-old articles may still be in flight)
    assert not (set(all_urls()) & undated_urls)
    # resumed run completes the crawl and reconciles exactly once
    run_crawl(d, out, _cfg(start_date=start, checkpoint_every=2), resume=True)
    urls = all_urls()
    assert set(latest_articles(out).to_pandas()["url"]) == set(golden["articles"])
    from collections import Counter
    undated_counts = Counter(u for u in urls if u in undated_urls)
    kept_undated = set(golden["articles"]) & undated_urls
    assert set(undated_counts) == kept_undated  # survivors only, no cut-page rows
    assert all(c == 1 for c in undated_counts.values())  # emitted exactly once


def test_fetch_paths_equivalent(corpus):
    """The bucket-routed PagesStore path (scale default) and the shared
    zero-copy index path must serve IDENTICAL snapshots — newest and
    as-of (as-of on the bucket path is new in round 2)."""
    from datetime import timedelta

    import pyarrow as pa

    from pttcrawler_ray.fixtures import _EPOCH
    from pttcrawler_ray.sources.pages import FetchPages, build_shared_index

    d, pages, boards = corpus
    urls = [u for u in pages["url"].to_pylist()[:300]]
    urls.append("https://www.ptt.cc/bbs/nope/M.0.A.000.html")  # 404 row
    probe = pa.table({"url": pa.array(urls, pa.string())})

    shared = build_shared_index(d)
    for asof in (None, _EPOCH + timedelta(days=31)):
        a = FetchPages(index=shared, asof_ts=asof)(probe)
        b = FetchPages(corpus_dir=d, asof_ts=asof)(probe)

        def snap(t):
            return {u: (ts, h, ok) for u, ts, h, ok in zip(
                t["url"].to_pylist(), t["warc_ts"].to_pylist(),
                t["html"].to_pylist(), t["fetch_ok"].to_pylist())}

        sa, sb = snap(a), snap(b)
        assert sa == sb
        assert sa["https://www.ptt.cc/bbs/nope/M.0.A.000.html"] == (None, None, False)
        hits = sum(1 for v in sa.values() if v[2])
        assert hits > 200  # not vacuously all-miss
