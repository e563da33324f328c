"""Vendored conformance oracle: a faithful, row-at-a-time reimplementation of
the reference parser algorithms, used ONLY by the test suite and the
sequential-oracle crawler to define golden outputs.

This follows the reference's exact sequence of operations:

- article parse:   reference ``crawler/article.py:265-384`` (``parse``)
- index extract:   reference ``crawler/article.py:438-459`` and its twin
                   ``crawler/article_index.py:138-166``
- last-page probe: reference ``crawler/article.py:387-402`` (``getLastPage``)

Known reference quirks are preserved as spec (SURVEY.md §7.4): the
``--``-prefix line drop, the drop-any-line-containing-article_id rule, the
whitelist character regex, and the space-join + whitespace-collapse order.
The engine's independent batch parser (``pttcrawler_ray/parsing``) must match
this oracle byte-for-byte on ``content`` (BASELINE.json per-row invariant).
"""

from __future__ import annotations

import re
from datetime import datetime

from ..htmlmini import parse_html

PTT_URL = "https://www.ptt.cc"


class PostException(Exception):
    """Reference ``utils.py:66-67``."""


# the content whitelist — reference crawler/article.py:330-333
_WHITELIST = re.compile(
    r"[^\u4e00-\u9fa5\u3002\uff1b\uff0c\uff1a\u201c\u201d\uff08\uff09\u3001\uff1f\u300a\u300b\s\w:/-_.?~%()]"
)
_TRANSCRIBER = re.compile("※ 轉錄者:")
_TRANSCRIBER_DETAIL = re.compile(
    r"\W(\w+)\W\([0-9]*\.[0-9]*\.[0-9]*\.[0-9]*\),\W([0-9]+\/[0-9]+\/[0-9]+\W[0-9]+:[0-9]+:[0-9]+)"
)
_POST_HOST = re.compile("※ 發信站:")
_IPV4 = re.compile(r"[0-9]*\.[0-9]*\.[0-9]*\.[0-9]*")
_WS_RUN = re.compile(r"(\s)+")
_LAST_PAGE = re.compile(r'href="/bbs/\w+/index(\d+).html">&lsaquo;')


def ref_parse_article(html_text: str, article_id: str, board: str, link: str) -> dict:
    """Reference ``parse()`` (crawler/article.py:277-384), HTML already fetched."""
    root = parse_html(html_text)
    main_content = root.find(id="main-content")
    metas = main_content.select("div.article-metaline")
    author = ""
    title = ""
    date = ""
    if metas:
        # .string may be None for empty spans — preserved (crawler/article.py:284-292)
        author = metas[0].select("span.article-meta-value")[0].string
        title = metas[1].select("span.article-meta-value")[0].string
        date = metas[2].select("span.article-meta-value")[0].string
        for meta in metas:
            meta.extract()
        for meta in main_content.select("div.article-metaline-right"):
            meta.extract()
    else:
        transcription = main_content.find_text(_TRANSCRIBER)
        if transcription:
            m = _TRANSCRIBER_DETAIL.search(transcription)
            if m:
                author = m.group(1)
                date = datetime.strptime(m.group(2), "%m/%d/%Y %H:%M:%S").strftime(
                    "%a %b %d %H:%M:%S %Y"
                )
        else:
            raise PostException("此文章被編輯過，解析出現問題。")

    pushes = main_content.find_all("div", class_="push")
    for push in pushes:
        push.extract()

    # post IP — crawler/article.py:320-324 (any failure → None)
    try:
        ip_line = main_content.find_text(_POST_HOST)
        ip = _IPV4.search(ip_line).group()
    except Exception:
        ip = None

    # content assembly — crawler/article.py:328-339, exact filter order
    filtered = [
        v
        for v in main_content.stripped_strings
        if v[0] not in ["※", "◆"] and v[:2] not in ["--"]
    ]
    filtered = [_WHITELIST.sub("", v) for v in filtered]
    filtered = [v for v in filtered if v]
    filtered = [v for v in filtered if article_id not in v]
    content = _WS_RUN.sub(" ", " ".join(filtered))

    # push messages — crawler/article.py:343-365
    p = b = n = 0
    messages = []
    for push in pushes:
        if not push.find("span", class_="push-tag"):
            continue
        push_tag = (push.find("span", class_="push-tag").string or "").strip(" \t\n\r")
        push_userid = (push.find("span", class_="push-userid").string or "").strip(" \t\n\r")
        push_content = " ".join(push.find("span", class_="push-content").strings)[1:].strip(" \t\n\r")
        push_ipdatetime = (push.find("span", class_="push-ipdatetime").string or "").strip(" \t\n\r")
        messages.append(
            {
                "push_tag": push_tag,
                "push_userid": push_userid,
                "push_content": push_content,
                "push_ipdatetime": push_ipdatetime,
            }
        )
        if push_tag == "推":
            p += 1
        elif push_tag == "噓":
            b += 1
        else:
            n += 1

    message_count = {"all": p + b + n, "count": p - b, "push": p, "boo": b, "neutral": n}
    return {
        "url": link,
        "board": board,
        "article_id": article_id,
        "article_title": title,
        "author": author,
        "date": date,
        "content": content,
        "ip": ip,
        "message_count": message_count,
        "messages": messages,
    }


def ref_parse_index(html_text: str, index_no: int) -> list[tuple[str, str, int]]:
    """Reference index-link extraction (crawler/article.py:438-459):
    direct children of the r-list container, stop at the pinned-post
    separator, skip r-ent divs without an anchor (deleted posts)."""
    root = parse_html(html_text)
    container = root.find("div", class_="r-list-container action-bar-margin bbs-screen")
    out = []
    for div in container.find_children("div"):
        cls = div["class"]
        if "r-list-sep" in cls:
            break
        if "r-ent" not in cls:
            continue
        try:
            href = div.find("a")["href"]
        except Exception:
            continue  # href 404 path (crawler/article.py:456-457)
        link = PTT_URL + href
        article_id = re.sub(r"\.html", "", href.split("/")[-1])
        out.append((article_id, link, index_no))
    return out


def ref_get_last_page(index_html_text: str) -> int:
    """Reference ``getLastPage`` (crawler/article.py:397-402): regex over raw
    HTML for the '‹ previous' pagination anchor, +1; missing → 1."""
    m = _LAST_PAGE.search(index_html_text)
    if m is None:
        return 1
    return int(m.group(1)) + 1
