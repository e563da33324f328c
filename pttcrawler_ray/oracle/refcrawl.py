"""Sequential oracle crawler — the reference-shaped end-to-end baseline.

Reproduces the reference's exact crawl loop over the synthetic pages table
(reference ``crawler/article.py:414-512`` ``_crawling_from_arg``): for each
seed board, probe the last index page (``getLastPage``, :387-402), then walk
index pages newest→oldest; per page extract links in DOM order and fetch +
parse each unseen article before moving to the previous page.

Used by tests to define the golden visit order (per site), the golden
URL-seen set, and the golden article set the Ray engine must reproduce
(SURVEY.md §5(3)).  Single-threaded and slow by design — this is the
semantics oracle, not the engine.
"""

from __future__ import annotations

from .refparse import PostException, ref_get_last_page, ref_parse_article, ref_parse_index

PTT_URL = "https://www.ptt.cc"


def build_web(pages_table) -> dict[str, tuple[object, str]]:
    """url → (newest warc_ts, html str) from a pages Arrow table."""
    urls = pages_table["url"].to_pylist()
    ts = pages_table["warc_ts"].to_pylist()
    htmls = pages_table["html"].to_pylist()
    web: dict[str, tuple[object, str]] = {}
    for u, t, h in zip(urls, ts, htmls):
        cur = web.get(u)
        if cur is None or t > cur[0]:
            web[u] = (t, h.decode("utf-8"))
    return web


def sequential_crawl(pages_table, seed_boards: list[str], start_date=None) -> dict:
    """Returns {'visit_order': [(site, url)], 'per_site_order': {site: [url]},
    'seen': set[url], 'articles': {url: parsed dict + warc_ts},
    'errors': {url: reason}}.

    ``start_date`` replicates the reference's date-filter mode
    (crawler/article.py:486-506): a page's articles are all fetched, then
    ``tmp_article_list`` collects valid-date articles >= start_date
    (unparsable dates decrement the comparison denominator).  The
    replacement ``article_list = tmp_article_list`` fires ONLY when
    ``len(tmp) < len_article_list`` — i.e. when a valid-dated too-old
    article exists on the page — and that also stops older index pages.
    On pages with no too-old article the ORIGINAL list is output, undated
    articles included."""
    from datetime import datetime

    web = build_web(pages_table)
    # robots gate parity: the engine's fetch stage 404s urls disallowed by
    # the host's /robots.txt (served from the same snapshot table); the
    # oracle reads the page dict through the same rule set.
    robots = web.get(f"{PTT_URL}/robots.txt")
    rules = None
    if robots is not None:
        from urllib.robotparser import RobotFileParser

        rules = RobotFileParser()
        rules.parse(robots[1].splitlines())

    def get_page(url: str):
        if rules is not None and not rules.can_fetch("*", url):
            return None  # robots-blocked reads as a 404
        return web.get(url)

    visit_order: list[tuple[str, str]] = []
    per_site: dict[str, list[str]] = {}
    seen: set[str] = set()
    articles: dict[str, dict] = {}
    errors: dict[str, str] = {}

    def visit(site: str, url: str):
        visit_order.append((site, url))
        per_site.setdefault(site, []).append(url)
        seen.add(url)

    for board in seed_boards:
        site = f"www.ptt.cc/{board}"
        probe = get_page(f"{PTT_URL}/bbs/{board}/index.html")
        last = ref_get_last_page(probe[1]) if probe else 1
        seen_ids: set[str] = set()
        stop_below = 0
        for page_no in range(last, 0, -1):
            if page_no < stop_below:
                break
            index_url = f"{PTT_URL}/bbs/{board}/index{page_no}.html"
            visit(site, index_url)
            page = get_page(index_url)
            if page is None:
                continue  # 404 index → raise_for_status in the reference; skip here
            page_articles: list[tuple[str, dict]] = []
            for article_id, link, _ in ref_parse_index(page[1], page_no):
                if article_id in seen_ids:
                    continue
                seen_ids.add(article_id)
                visit(site, link)
                art = get_page(link)
                if art is None:
                    errors[link] = "invalid url"
                    continue
                try:
                    parsed = ref_parse_article(art[1], article_id, board, link)
                except PostException as exc:
                    errors[link] = f"parse: {exc}"
                    continue
                parsed["warc_ts"] = art[0]
                page_articles.append((link, parsed))

            if start_date is not None:
                kept, n_valid = [], len(page_articles)
                for link, parsed in page_articles:
                    try:
                        dt = datetime.strptime(parsed["date"], "%a %b %d %H:%M:%S %Y")
                    except (TypeError, ValueError):
                        n_valid -= 1  # undated: excluded from the comparison (:494-499)
                        continue
                    if dt >= start_date:
                        kept.append((link, parsed))
                if len(kept) < n_valid:
                    # a valid-dated too-old article: swap in the filtered
                    # list (undated rows dropped WITH it) and stop older
                    # pages (:501-503).  Without the swap the original
                    # list — undated rows included — is output.
                    stop_below = page_no
                    page_articles = kept
            for link, parsed in page_articles:
                articles[link] = parsed

    return {
        "visit_order": visit_order,
        "per_site_order": per_site,
        "seen": seen,
        "articles": articles,
        "errors": errors,
    }
