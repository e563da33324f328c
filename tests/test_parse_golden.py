"""Golden parser conformance (SURVEY.md §5(1), BASELINE.json per-row invariant).

Every article page in the synthetic corpus is parsed by (a) the vendored
row-at-a-time reference-faithful oracle and (b) the engine's single-pass
batch parser; ``content`` must match byte-for-byte and every other field
must be identical.  Index-page extraction and the last-page probe are
likewise compared.
"""

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pttcrawler_ray.fixtures import corpus_for_scale
from pttcrawler_ray.oracle import PostException, ref_get_last_page, ref_parse_article, ref_parse_index
from pttcrawler_ray.parsing import parse_articles_batch, parse_index_batch
from pttcrawler_ray.parsing.article import split_article_url
from pttcrawler_ray.parsing.index import get_last_page, index_no_of


@pytest.fixture(scope="module")
def corpus():
    import glob

    d = corpus_for_scale("t1")
    table = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{d}/pages/bucket=*/part-0.parquet"))]
    )
    return d, table


def _is_article(url: str) -> bool:
    return re.search(r"/M\.\d+\.A\.[0-9A-F]+\.html$", url) is not None


def test_article_parse_byte_identical(corpus):
    _, pages = corpus
    mask = [_is_article(u) for u in pages["url"].to_pylist()]
    articles = pages.filter(pa.array(mask))
    assert articles.num_rows > 300

    engine_out = parse_articles_batch(articles)
    assert engine_out.num_rows == articles.num_rows

    n_errors = 0
    for i in range(articles.num_rows):
        url = articles["url"][i].as_py()
        html = articles["html"][i].as_py().decode("utf-8")
        board, article_id = split_article_url(url)

        row = {c: engine_out[c][i].as_py() for c in engine_out.column_names}
        try:
            golden = ref_parse_article(html, article_id, board, url)
        except PostException:
            assert row["error"] and row["error"].startswith("parse:"), url
            n_errors += 1
            continue

        assert row["error"] is None, (url, row["error"])
        assert row["content"] == golden["content"], url  # byte-identical invariant
        for field in ("board", "article_id", "article_title", "author", "date", "ip"):
            assert row[field] == golden[field], (url, field)
        assert row["message_count"] == golden["message_count"], url
        assert row["messages"] == golden["messages"], url

    assert n_errors > 0  # the PostException branch is exercised


def test_fast_scanner_matches_dom_parser(corpus):
    """The hot-path single-pass scanner must agree with the DOM engine
    parser on every article page (incl. the same failures)."""
    from pttcrawler_ray.parsing.article import parse_article_html, parse_article_html_dom

    _, pages = corpus
    mask = [_is_article(u) for u in pages["url"].to_pylist()]
    articles = pages.filter(pa.array(mask))
    n_err = 0
    for i in range(articles.num_rows):
        url = articles["url"][i].as_py()
        html = articles["html"][i].as_py().decode("utf-8")
        board, article_id = split_article_url(url)
        try:
            dom = parse_article_html_dom(html, article_id, board, url)
        except Exception as exc:
            with pytest.raises(type(exc)):
                parse_article_html(html, article_id, board, url)
            n_err += 1
            continue
        fast = parse_article_html(html, article_id, board, url)
        assert fast == dom, url
    assert n_err > 0  # failure parity exercised too


def test_index_extraction_matches_oracle(corpus):
    _, pages = corpus
    mask = [re.search(r"/index\d+\.html$", u) is not None for u in pages["url"].to_pylist()]
    idx_pages = pages.filter(pa.array(mask))
    assert idx_pages.num_rows > 20

    out = parse_index_batch(idx_pages)
    engine_links = {}
    for i in range(out.num_rows):
        engine_links.setdefault(out["src_url"][i].as_py(), []).append(
            (out["web_id"][i].as_py(), out["url"][i].as_py(), out["index_no"][i].as_py())
        )

    from pttcrawler_ray.parsing.index import extract_index_links, extract_index_links_dom

    pinned_seen = 0
    for i in range(idx_pages.num_rows):
        url = idx_pages["url"][i].as_py()
        html = idx_pages["html"][i].as_py().decode("utf-8")
        golden = ref_parse_index(html, index_no_of(url))
        assert engine_links.get(url, []) == golden, url
        # fast scanner == DOM twin == oracle
        assert extract_index_links(html, index_no_of(url)) == golden, url
        assert extract_index_links_dom(html, index_no_of(url)) == golden, url
        if "r-list-sep" in html:
            pinned_seen += 1
    assert pinned_seen > 0  # the stop-at-separator rule is exercised


def test_last_page_probe(corpus):
    d, pages = corpus
    import json

    manifest = json.load(open(f"{d}/manifest.json"))
    by_url = {pages["url"][i].as_py(): pages["html"][i].as_py().decode("utf-8")
              for i in range(pages.num_rows)}
    for board, info in manifest["boards"].items():
        probe = by_url[f"https://www.ptt.cc/bbs/{board}/index.html"]
        assert get_last_page(probe) == ref_get_last_page(probe) == info["last_page"]

    # single-page board: no '‹' anchor → 1 (reference crawler/article.py:400-401)
    one_page = '<html><body><a class="btn wide disabled">&lsaquo; 上頁</a></body></html>'
    assert get_last_page(one_page) == ref_get_last_page(one_page) == 1
