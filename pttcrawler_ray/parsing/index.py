"""Engine index-page link extractor + last-page probe (SURVEY.md M1, S3).

Semantics of the reference extractor (reference ``crawler/article.py:438-459``
and twin ``crawler/article_index.py:138-166``): direct div children of the
``r-list-container action-bar-margin bbs-screen`` container, in DOM order,
stopping at the first ``r-list-sep`` (pinned-post separator); each ``r-ent``
contributes its first anchor's href (divs without an anchor are deleted
posts and are skipped); ``web_id`` is the href basename minus ``.html``.

Batch entry point :func:`parse_index_batch` expands one index page row into
N discovered-link rows (the frontier-growth step).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..htmlmini import parse_html

PTT_URL = "https://www.ptt.cc"
_LAST_PAGE = re.compile(r'href="/bbs/\w+/index(\d+).html">&lsaquo;')
_INDEX_NO = re.compile(r"/index(\d+)\.html")
_HTML_EXT = re.compile(r"\.html")


_SCAN_TAG = re.compile(r"<(/?)(div|a)\b((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)/?>",
                       re.IGNORECASE)
_ATTR_CLASS = re.compile(r"class\s*=\s*(?:\"([^\"]*)\"|'([^']*)')", re.IGNORECASE)
_ATTR_HREF = re.compile(r"href\s*=\s*(?:\"([^\"]*)\"|'([^']*)')", re.IGNORECASE)
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_CONTAINER_CLASS = "r-list-container action-bar-margin bbs-screen"


def _attr(m) -> str:
    return m.group(1) if m.group(1) is not None else m.group(2)


def extract_index_links(html_text: str, index_no: int) -> list[tuple[str, str, int]]:
    """[(web_id, absolute link, index_no)] in page DOM order.

    Hot-path single-pass scanner over div/a tags only (index pages are
    ~40% of fetches in a full crawl); semantics identical to the DOM
    extractor :func:`extract_index_links_dom` (parity-tested vs the
    oracle): direct container children, stop at r-list-sep, first anchor
    per r-ent, skip anchor-less (deleted) entries.
    """
    if "<!--" in html_text:
        html_text = _COMMENT.sub("", html_text)
    out: list[tuple[str, str, int]] = []
    depth = 0                 # div depth relative to document
    container_depth = -1      # depth of the container div; -1 = not inside
    child_is_rent = False     # current direct child is an r-ent
    child_depth = -1
    anchor_taken = False

    for m in _SCAN_TAG.finditer(html_text):
        closing, tag, rawattrs = m.groups()
        if tag.lower() == "div":
            if closing:
                depth -= 1
                if container_depth >= 0 and depth < container_depth:
                    break  # container closed
                if child_is_rent and depth < child_depth:
                    child_is_rent = False
            else:
                depth += 1
                cm = _ATTR_CLASS.search(rawattrs) if rawattrs else None
                cls = _attr(cm) if cm else ""
                if container_depth < 0:
                    if cls == _CONTAINER_CLASS:
                        container_depth = depth
                elif depth == container_depth + 1:
                    classes = cls.split()
                    if "r-list-sep" in classes:
                        return out  # pinned-post separator: stop
                    child_is_rent = "r-ent" in classes
                    child_depth = depth
                    anchor_taken = False
        elif not closing and child_is_rent and not anchor_taken:
            # FIRST anchor decides (div.find('a')['href'] semantics): an
            # href-less first anchor drops the entry, like the reference's
            # KeyError → skip (crawler/article.py:451-457)
            anchor_taken = True
            hm = _ATTR_HREF.search(rawattrs) if rawattrs else None
            if hm:
                href = _attr(hm)
                web_id = _HTML_EXT.sub("", href.split("/")[-1])
                out.append((web_id, PTT_URL + href, index_no))
    return out


def extract_index_links_dom(html_text: str, index_no: int) -> list[tuple[str, str, int]]:
    """DOM-based twin of :func:`extract_index_links` (conformance cross-check)."""
    root = parse_html(html_text)
    container = root.find("div", class_="r-list-container action-bar-margin bbs-screen")
    if container is None:
        return []
    links = []
    for div in container.find_children("div"):
        cls = div.classes
        if "r-list-sep" in cls:
            break
        if "r-ent" not in cls:
            continue
        anchor = div.find("a")
        if anchor is None or "href" not in anchor.attrs:
            continue  # deleted post (href-404 path)
        href = anchor.attrs["href"]
        web_id = _HTML_EXT.sub("", href.split("/")[-1])
        links.append((web_id, PTT_URL + href, index_no))
    return links


def get_last_page(index_html_text: str) -> int:
    """'‹' pagination anchor regex over raw HTML, +1; missing → 1
    (reference crawler/article.py:397-402)."""
    m = _LAST_PAGE.search(index_html_text)
    return 1 if m is None else int(m.group(1)) + 1


def index_no_of(url: str) -> int:
    m = _INDEX_NO.search(url)
    return int(m.group(1)) if m else -1


def parse_index_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: index-page rows → discovered article-link rows.

    Input needs columns (url, html); output one row per extracted link:
    (web_id, url, board, index_no, src_url).
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()

    web_ids, links, boards, index_nos, src_urls, poss = [], [], [], [], [], []
    for url, html in zip(urls, htmls):
        if html is None:
            continue
        m = re.search(r"/bbs/([^/]+)/", url)
        board = m.group(1) if m else ""
        idx = index_no_of(url)
        for pos, (web_id, link, _) in enumerate(
                extract_index_links(html.decode("utf-8"), idx), start=1):
            web_ids.append(web_id)
            links.append(link)
            boards.append(board)
            index_nos.append(idx)
            src_urls.append(url)
            poss.append(pos)  # 1-based DOM position on the page

    return pa.Table.from_pydict(
        {
            "web_id": pa.array(web_ids, pa.string()),
            "url": pa.array(links, pa.string()),
            "board": pa.array(boards, pa.string()),
            "index_no": pa.array(index_nos, pa.int32()),
            "src_url": pa.array(src_urls, pa.string()),
            "page_pos": pa.array(poss, pa.int32()),
        }
    )
