"""Live-HTTP fetch adapter (sources/http.FetchHttp) against the in-process
replay server (sources/httpstub) — the reference's real network path
(crawler/article.py:267-276 requests.get + cookie carry + timeout), with
the crawl e2e required to equal the parquet-snapshot crawl on the same
corpus."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pttcrawler_ray.sources.http import FetchHttp
from pttcrawler_ray.sources.httpstub import CorpusHttpServer


@pytest.fixture()
def stub():
    ts = int(np.datetime64("2024-05-01T12:00:00.123456", "us").astype(np.int64))
    snaps = {
        "https://site.test/a.html": (ts, "<b>中文 A</b>".encode()),
        "https://site.test/b.html": (ts + 1, b"<b>B</b>"),
        "https://other.test/c.html": (ts + 2, b"<b>C</b>"),
    }
    srv = CorpusHttpServer(snaps).start()
    yield srv, snaps
    srv.close()


def _fetch(srv, urls, **kw):
    f = FetchHttp(rewrite=srv.rewrite(), retry_backoff_s=0.0, **kw)
    return f, f(pa.table({"url": pa.array(urls, pa.string())}))


def test_fetch_http_hits_and_misses(stub):
    srv, snaps = stub
    urls = ["https://site.test/a.html", "https://site.test/missing.html",
            "https://other.test/c.html"]
    _, out = _fetch(srv, urls)
    rows = {r["url"]: r for r in out.to_pylist()}
    assert rows["https://site.test/a.html"]["fetch_ok"]
    assert rows["https://other.test/c.html"]["fetch_ok"]
    assert not rows["https://site.test/missing.html"]["fetch_ok"]
    assert rows["https://site.test/missing.html"]["html"] is None
    # html bytes byte-identical; warc_ts microsecond-exact from X-Warc-Ts
    assert rows["https://site.test/a.html"]["html"] == snaps["https://site.test/a.html"][1]
    got_us = np.datetime64(rows["https://site.test/a.html"]["warc_ts"], "us").astype(np.int64)
    assert int(got_us) == snaps["https://site.test/a.html"][0]


def test_fetch_http_cookie_carry(stub):
    """Reference crawler/article.py:272-273: the jar is replaced by the
    response cookies and over18=1 is forced after EVERY response."""
    srv, _ = stub
    _fetch(srv, ["https://site.test/a.html", "https://site.test/b.html"])
    cookies = [c for _, c in srv.requests_seen]
    assert all("over18=1" in c for c in cookies)  # sent from the first GET on
    # the stub's Set-Cookie from response 1 must ride request 2
    assert "stubsess=1" in cookies[-1]


def test_fetch_http_transport_retry(stub):
    """Transport faults (connection dies before a status line) retry up to
    `retries`; exhaustion yields a miss row, not an exception."""
    srv, snaps = stub
    url = "https://site.test/a.html"
    srv.fail_first(url, 2)
    f, out = _fetch(srv, [url], retries=3, respect_robots=False)
    assert out["fetch_ok"][0].as_py()  # 2 failures + 1 success within budget
    assert bytes(out["html"][0].as_py()) == snaps[url][1]
    assert len(srv.requests_seen) == 3

    srv.requests_seen.clear()
    srv.fail_first(url, 5)
    _, out = _fetch(srv, [url], retries=2, respect_robots=False)
    assert not out["fetch_ok"][0].as_py()
    assert len(srv.requests_seen) == 2  # bounded attempts


def test_fetch_http_non200_is_not_retried(stub):
    """A served non-200 is the reference's error-row path
    (crawler/article.py:273-275) — one attempt, no retry."""
    srv, _ = stub
    url = "https://site.test/a.html"
    srv.status_override[url] = 500
    _, out = _fetch(srv, [url], retries=3, respect_robots=False)
    assert not out["fetch_ok"][0].as_py()
    assert len([u for u, _ in srv.requests_seen if u == url]) == 1


def test_fetch_http_robots_gate(stub):
    """Per-host robots rules fetched once per actor and enforced."""
    srv, _ = stub
    srv.snapshots["https://site.test/robots.txt"] = (
        0, b"User-agent: *\nDisallow: /b.html\n")
    f, out = _fetch(srv, ["https://site.test/a.html",
                          "https://site.test/b.html"])
    rows = {r["url"]: r["fetch_ok"] for r in out.to_pylist()}
    assert rows["https://site.test/a.html"]
    assert not rows["https://site.test/b.html"]  # blocked reads as a 404
    # gate resolved ONCE per (host, actor): both urls are site.test, so
    # exactly one robots.txt request total
    robots_reqs = [u for u, _ in srv.requests_seen if u.endswith("/robots.txt")]
    assert robots_reqs == ["https://site.test/robots.txt"]


def test_crawl_over_http_equals_snapshot_crawl(ray_session, tmp_path):
    """The full crawl engine with fetch='http' against the replay server
    must produce the SAME latest articles and seen set as the parquet
    snapshot crawl on the same corpus (VERDICT r3 directive 9)."""
    from pttcrawler_ray.fixtures import corpus_for_scale
    from pttcrawler_ray.pipelines.crawl import (CrawlConfig, latest_articles,
                                                run_crawl)

    d = corpus_for_scale("t1")
    cfg = dict(num_shards=2, strict_order=False, round_seconds=3600.0,
               fetch_concurrency=1, process_concurrency=1,
               seen_capacity=100_000)
    out_snap = str(tmp_path / "snap")
    run_crawl(d, out_snap, CrawlConfig(**cfg))

    srv = CorpusHttpServer.from_corpus_dir(d).start()
    try:
        out_http = str(tmp_path / "http")
        run_crawl(d, out_http, CrawlConfig(
            **cfg, http={"rewrite": srv.rewrite(), "timeout": 10.0,
                         "retries": 3, "retry_backoff_s": 0.0}))
    finally:
        srv.close()

    def _latest(out):
        df = latest_articles(out).to_pandas()
        return (df.drop(columns=["messages"])
                  .sort_values("url").reset_index(drop=True))

    a, b = _latest(out_snap), _latest(out_http)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)

    def _seen(out):
        files = sorted(glob.glob(f"{out}/seen/round=*/*.parquet"))
        return set(pa.concat_tables([pq.read_table(f) for f in files])["url"].to_pylist())

    assert _seen(out_snap) == _seen(out_http)

    # the actors engine (strict mode) wires http_cfg through the persistent
    # CrawlWorker pool — same seen set again
    srv2 = CorpusHttpServer.from_corpus_dir(d).start()
    try:
        out_strict = str(tmp_path / "http_strict")
        run_crawl(d, out_strict, CrawlConfig(
            num_shards=2, strict_order=True, round_seconds=30.0,
            fetch_concurrency=1, process_concurrency=1,
            seen_capacity=100_000,
            http={"rewrite": srv2.rewrite(), "retry_backoff_s": 0.0}))
    finally:
        srv2.close()
    assert _seen(out_strict) == _seen(out_snap)
    # `round` is engine lineage (strict mode = many small rounds), not
    # article content — drop it for the cross-engine comparison
    pd.testing.assert_frame_equal(_latest(out_strict).drop(columns=["round"]),
                                  a.drop(columns=["round"]))
