"""Regression tests for the code-review findings (round-1 review pass)."""

import numpy as np
import pyarrow as pa
import pytest

from pttcrawler_ray.oracle.refparse import ref_parse_article, ref_parse_index
from pttcrawler_ray.parsing.article import parse_article_html, parse_article_html_dom
from pttcrawler_ray.parsing.index import extract_index_links, extract_index_links_dom
from pttcrawler_ray.parsing.scalars import parse_push_ipdatetime
from pttcrawler_ray.state.frontier import FrontierShard


def test_push_ipdatetime_leap_day_no_crash():
    """'02/29 …' is invalid in strptime's default (non-leap) year 1900; the
    engine keeps the push with a null datetime instead of crashing."""
    ip, dt = parse_push_ipdatetime("1.2.3.4 02/29 13:40")
    assert ip == "1.2.3.4" and dt is None
    ip2, dt2 = parse_push_ipdatetime("1.2.3.4 02/28 13:40")
    assert ip2 == "1.2.3.4" and dt2 is not None


def test_user_screen_malformed_datetime_is_error_row(ray_session):
    import ray.data as rd

    from pttcrawler_ray.pipelines.users import extract_users_batch

    batch = pa.table({
        "username": pa.array(["u1"]),
        # matches the regex but 02/30 is not a valid date
        "text": pa.array(["《登入次數》5 次\n《有效文章》2 篇\n"
                          "《上次上站》02/30/2024 10:00:00 Mon\n《上次故鄉》1.2.3.4\n"]),
    })
    out = extract_users_batch(batch)
    assert out["error"][0].as_py() == "screen parse failed"


_MESSY_ARTICLE = (
    '<HTML><body><DIV id="main-content" class=\'bbs-screen\'>'
    '<div class="article-metaline"><span class="article-meta-tag">作者</span>'
    "<span class='article-meta-value'>userx (nick)</span></div>"
    '<div class="article-metaline"><span class="article-meta-tag">標題</span>'
    '<span class="article-meta-value">[問卦] t</span></div>'
    '<div class="article-metaline"><span class="article-meta-tag">時間</span>'
    '<span class="article-meta-value">Mon Oct 21 12:00:00 2024</span></div>'
    "\nbody before<!-- hidden comment -->body after\n"
    '<SPAN class="f2">※ 發信站: 批踢踢實業坊(ptt.cc), 來自: 1.2.3.4</SPAN>\n'
    "<DIV class='push'><span class=\"hl push-tag\">推 </span>"
    '<span class="f3 hl push-userid">px</span>'
    "<span class='f3 push-content'>: hello</span>"
    '<span class="push-ipdatetime"> 1.2.3.4 10/21 13:00\n</span></DIV>'
    "</DIV></body></HTML>"
)


def test_fastscan_handles_case_quotes_comments():
    """Uppercase tags, single-quoted attrs and comments must parse the same
    through the fast scanner, the DOM parser and the oracle."""
    fast = parse_article_html(_MESSY_ARTICLE, "M.1.A.1", "b", "u")
    dom = parse_article_html_dom(_MESSY_ARTICLE, "M.1.A.1", "b", "u")
    oracle = ref_parse_article(_MESSY_ARTICLE, "M.1.A.1", "b", "u")
    assert fast == dom
    assert fast["content"] == oracle["content"]
    assert fast["author"] == "userx (nick)" and fast["ip"] == "1.2.3.4"
    assert fast["messages"] == oracle["messages"] and len(fast["messages"]) == 1
    # comment-adjacent text merged exactly like the html.parser DOM
    assert "body before" in fast["content"] and "hidden comment" not in fast["content"]


def test_fast_index_scanner_case_and_quotes():
    html = ('<html><body><DIV class="r-list-container action-bar-margin bbs-screen">'
            "<div class='r-ent'><div class='title'><A href='/bbs/b/M.1.A.1.html'>t</A></div></div>"
            '<!-- sep --><div class="r-list-sep"></div>'
            '<div class="r-ent"><div class="title"><a href="/bbs/b/M.2.A.2.html">p</a></div></div>'
            "</DIV></body></html>")
    fast = extract_index_links(html, 3)
    dom = extract_index_links_dom(html, 3)
    oracle = ref_parse_index(html, 3)
    assert fast == dom == oracle
    assert [w for w, _, _ in fast] == ["M.1.A.1"]  # pinned post excluded


def _tbl(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "board": pa.array([r[1] for r in rows], pa.string()),
        "kind": pa.array([r[2] for r in rows], pa.string()),
        "index_no": pa.array([r[3] for r in rows], pa.int32()),
    })


def test_force_adds_never_duplicate_cuckoo_entries():
    f = FrontierShard(shard_id=0, num_shards=1, use_cuckoo=True,
                      seen_capacity=1000, strict_order=False)
    rows = [(f"https://www.ptt.cc/bbs/b/M.{i}.A.0.html", "b", "article", 1)
            for i in range(50)]
    f.add(_tbl(rows))
    count_after_first = f.seen.count
    for _ in range(5):  # repeated upgrade passes
        f.add(_tbl(rows), force=True)
    assert f.seen.count == count_after_first  # no fingerprint accumulation
    assert f.unsee([rows[0][0]]) == 1  # single delete fully un-sees
    assert f.add(_tbl(rows[:1]))["fresh"] == 1


def test_politeness_credit_never_exceeds_rate():
    """delay > round_seconds: releases accrue fractionally, never flooring
    to 1 per round (review finding on the politeness bound)."""
    f = FrontierShard(shard_id=0, num_shards=1, strict_order=False,
                      round_seconds=1.0, default_delay_s=4.0, seen_capacity=1000)
    rows = [(f"https://www.ptt.cc/bbs/b/M.{i}.A.0.html", "b", "article", 1)
            for i in range(6)]
    f.add(_tbl(rows))
    released_per_round = []
    for _ in range(24):
        released_per_round.append(f.pop_round().num_rows)
    # 1 url per 4 rounds (rate 0.25/round), never bursts past it
    assert sum(released_per_round) == 6
    assert max(released_per_round) == 1
    for i in range(0, 20, 4):
        assert sum(released_per_round[i:i + 4]) <= 1


def test_resume_shard_count_mismatch_raises(ray_session, tmp_path):
    from pttcrawler_ray.fixtures import corpus_for_scale
    from pttcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    d = corpus_for_scale("t1")
    out = str(tmp_path / "mismatch")
    run_crawl(d, out, CrawlConfig(num_shards=2, strict_order=False,
                                  round_seconds=3600.0))
    with pytest.raises(ValueError, match="num_shards=2"):
        run_crawl(d, out, CrawlConfig(num_shards=4, strict_order=False,
                                      round_seconds=3600.0), resume=True)


def test_resume_cleans_stale_tmp_partitions(ray_session, tmp_path):
    """A crash mid-round leaves a .tmp-round dir; resume must discard it."""
    import os

    from pttcrawler_ray.fixtures import corpus_for_scale
    from pttcrawler_ray.pipelines.crawl import CrawlConfig, latest_articles, run_crawl

    d = corpus_for_scale("t1")
    out = str(tmp_path / "crash")
    cfg = CrawlConfig(num_shards=2, strict_order=False, round_seconds=3600.0,
                      checkpoint_every=1)
    run_crawl(d, out, cfg)
    n = latest_articles(out).count()

    # simulate a crashed partial round write + an uncommitted extra round
    os.makedirs(os.path.join(out, "articles", ".tmp-round=99"))
    os.makedirs(os.path.join(out, "articles", "round=99"))
    resumed = run_crawl(d, out, cfg, resume=True)
    assert resumed["popped"] == 0  # nothing left to crawl
    assert not os.path.exists(os.path.join(out, "articles", ".tmp-round=99"))
    assert not os.path.exists(os.path.join(out, "articles", "round=99"))
    assert latest_articles(out).count() == n


def test_index_only_resume_stays_deferred():
    f = FrontierShard(shard_id=0, num_shards=1, index_only=True,
                      strict_order=False, seen_capacity=1000)
    f.add(_tbl([("https://www.ptt.cc/bbs/b/index2.html", "b", "index", 2),
                ("https://www.ptt.cc/bbs/b/M.1.A.0.html", "b", "article", 2)]))
    import os
    ckpt = "/tmp/idxonly_ckpt"
    os.makedirs(ckpt, exist_ok=True)
    f.snapshot(ckpt)

    g = FrontierShard(shard_id=0, num_shards=1, index_only=True,
                      strict_order=False, seen_capacity=1000)
    g.restore(ckpt)
    popped = g.pop_round()
    assert popped["kind"].to_pylist() == ["index"]  # article stays deferred
    assert g.get_stats()["deferred"] == 1