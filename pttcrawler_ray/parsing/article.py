"""Engine article parser — the golden-spec operator (SURVEY.md M2).

An independent, single-traversal implementation of the extraction semantics
of the reference ``parse()`` (reference ``crawler/article.py:265-384``).
Where the reference mutates a BeautifulSoup tree in several passes (select
metas → extract → extract pushes → find ip → stripped_strings), this
implementation classifies every text node in ONE walk of the ``main-content``
subtree and then applies the same filter chain — producing byte-identical
``content`` per url (verified against the vendored oracle in
``tests/test_parse_golden.py``; that conformance is the per-row invariant in
BASELINE.json).

Batch entry point: :func:`parse_articles_batch`, a stateless
``map_batches(fn, batch_format='pyarrow')`` transform over the ``pages``
schema.  HTML parsing is inherently per-document; the batch wrapper amortizes
Arrow column construction and keeps errors as typed error rows (reference
behavior: non-200 → ``{"error": "invalid url"}`` at crawler/article.py:274-276,
parse failures logged-and-dropped at :481-483 — the engine keeps them as rows
with an ``error`` reason so nothing is silently lost, SURVEY.md §4).
"""

from __future__ import annotations

import re
from datetime import datetime

import pyarrow as pa

from ..htmlmini import Node, parse_html
from .. import schemas

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
_URL_PARTS = re.compile(r"/bbs/([^/]+)/([^/]+)\.html")

# text-node region flags
_PLAIN, _META, _META_RIGHT, _PUSH = 0, 1, 2, 3


class ParseError(Exception):
    pass


def _first_meta_value_string(metaline: Node):
    """bs4 ``metas[i].select('span.article-meta-value')[0].string`` semantics:
    IndexError if the span is missing (propagates, as in the reference)."""
    spans = metaline.select("span.article-meta-value")
    return spans[0].string


def parse_article_html(html_text: str, article_id: str, board: str, link: str) -> dict:
    """Hot-path parse: single-pass scanner (see fastscan.py), no DOM build.
    Byte-identical to :func:`parse_article_html_dom` and the vendored
    oracle (triple-checked in tests/test_parse_golden.py)."""
    from .fastscan import META, META_RIGHT, PUSH, scan_article

    texts, metaline_values, push_recs, found_main = scan_article(html_text)
    if not found_main:
        raise ParseError("no main-content")

    author = ""
    title = ""
    date = ""
    if metaline_values:
        if len(metaline_values) < 3:
            raise ParseError("missing metalines")

        def val(x):
            if x is ...:  # reference select(...)[0] would raise IndexError
                raise ParseError("missing article-meta-value span")
            return x.string

        author = val(metaline_values[0])
        title = val(metaline_values[1])
        date = val(metaline_values[2])
        excluded = (META, META_RIGHT, PUSH)
    else:
        transcription = next((t for _, t in texts if _TRANSCRIBER.search(t)), None)
        if transcription is None:
            raise ParseError("此文章被編輯過，解析出現問題。")  # PostException path
        m = _TRANSCRIBER_DETAIL.search(transcription)
        if m:
            author = m.group(1)
            date = datetime.strptime(m.group(2), "%m/%d/%Y %H:%M:%S").strftime(
                "%a %b %d %H:%M:%S %Y"
            )
        excluded = (PUSH,)

    remaining = [t for r, t in texts if r not in excluded]

    ip = None
    ip_line = next((t for t in remaining if _POST_HOST.search(t)), None)
    if ip_line is not None:
        m = _IPV4.search(ip_line)
        if m:
            ip = m.group()

    kept = []
    for t in remaining:
        s = t.strip()
        if not s or s[0] in "※◆" or s[:2] == "--":
            continue
        s = _WHITELIST.sub("", s)
        if s and article_id not in s:
            kept.append(s)
    content = _WS_RUN.sub(" ", " ".join(kept))

    p = b = n = 0
    messages = []
    for rec in push_recs:
        tag_rec = rec.get("push-tag")
        if tag_rec is None:
            continue
        push_tag = (tag_rec.string or "").strip(" \t\n\r")
        push_userid = (rec["push-userid"].string or "").strip(" \t\n\r")
        push_content = " ".join(rec["push-content"].texts)[1:].strip(" \t\n\r")
        push_ipdatetime = (rec["push-ipdatetime"].string or "").strip(" \t\n\r")
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

    return {
        "url": link,
        "board": board,
        "article_id": article_id,
        "article_title": title,
        "author": author,
        "date": date,
        "content": content,
        "ip": ip,
        "message_count": {"all": p + b + n, "count": p - b, "push": p, "boo": b, "neutral": n},
        "messages": messages,
    }


def parse_article_html_dom(html_text: str, article_id: str, board: str, link: str) -> dict:
    root = parse_html(html_text)
    main = root.find(id="main-content")
    if main is None:
        raise ParseError("no main-content")

    # --- one classification walk --------------------------------------------
    texts: list[tuple[int, str]] = []  # (region, text) in document order
    metalines: list[Node] = []
    push_divs: list[Node] = []

    def walk(node: Node, region: int):
        for child in node.children:
            if child.tag is None:
                texts.append((region, child.text))
                continue
            r = region
            if region == _PLAIN and child.tag == "div":
                cls = child.classes
                if "article-metaline" in cls:
                    metalines.append(child)
                    r = _META
                elif "article-metaline-right" in cls:
                    r = _META_RIGHT
                elif "push" in cls:
                    push_divs.append(child)
                    r = _PUSH
            walk(child, r)

    walk(main, _PLAIN)

    # --- metas / transcription fallback -------------------------------------
    author = ""
    title = ""
    date = ""
    if metalines:
        author = _first_meta_value_string(metalines[0])
        title = _first_meta_value_string(metalines[1])
        date = _first_meta_value_string(metalines[2])
        excluded = (_META, _META_RIGHT, _PUSH)
    else:
        # searched before push removal in the reference → all regions eligible
        transcription = next((t for _, t in texts if _TRANSCRIBER.search(t)), None)
        if transcription is None:
            raise ParseError("此文章被編輯過，解析出現問題。")  # PostException path
        m = _TRANSCRIBER_DETAIL.search(transcription)
        if m:
            author = m.group(1)
            date = datetime.strptime(m.group(2), "%m/%d/%Y %H:%M:%S").strftime(
                "%a %b %d %H:%M:%S %Y"
            )
        excluded = (_PUSH,)

    remaining = [t for r, t in texts if r not in excluded]

    # --- post IP -------------------------------------------------------------
    ip = None
    ip_line = next((t for t in remaining if _POST_HOST.search(t)), None)
    if ip_line is not None:
        m = _IPV4.search(ip_line)
        if m:
            ip = m.group()

    # --- content filter chain (same order as the reference) ------------------
    kept = []
    for t in remaining:
        s = t.strip()
        if not s or s[0] in "※◆" or s[:2] == "--":
            continue
        s = _WHITELIST.sub("", s)
        if s and article_id not in s:
            kept.append(s)
    content = _WS_RUN.sub(" ", " ".join(kept))

    # --- pushes --------------------------------------------------------------
    p = b = n = 0
    messages = []
    for push in push_divs:
        spans = {}
        for node in push.iter_nodes():
            if node.tag == "span":
                for c in node.classes:
                    if c.startswith("push-") and c not in spans:
                        spans[c] = node
        tag_span = spans.get("push-tag")
        if tag_span is None:
            continue
        push_tag = (tag_span.string or "").strip(" \t\n\r")
        push_userid = (spans["push-userid"].string or "").strip(" \t\n\r")
        push_content = " ".join(spans["push-content"].strings)[1:].strip(" \t\n\r")
        push_ipdatetime = (spans["push-ipdatetime"].string or "").strip(" \t\n\r")
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

    return {
        "url": link,
        "board": board,
        "article_id": article_id,
        "article_title": title,
        "author": author,
        "date": date,
        "content": content,
        "ip": ip,
        "message_count": {"all": p + b + n, "count": p - b, "push": p, "boo": b, "neutral": n},
        "messages": messages,
    }


def split_article_url(url: str) -> tuple[str, str]:
    """(board, article_id) from a PTT article url — the reference derives
    article_id as the href basename minus '.html' (crawler/article.py:453-454)."""
    m = _URL_PARTS.search(url)
    if not m:
        return "", ""
    return m.group(1), m.group(2)


def parse_articles_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches fn: pages-schema batch in → ARTICLES-schema out.

    ``index_no`` / ``page_pos`` input columns (the board page an article
    url was discovered on, and its 1-based DOM position there) pass
    through when present — they key the per-page JSON sink (K1) and the
    date-filter crawl cutoff (M8)."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    ts = batch["warc_ts"].to_pylist()
    names = batch.column_names
    idxs = batch["index_no"].to_pylist() if "index_no" in names else [None] * len(urls)
    poss = batch["page_pos"].to_pylist() if "page_pos" in names else [None] * len(urls)

    rows = []
    for url, html, warc_ts, idx, pos in zip(urls, htmls, ts, idxs, poss):
        board, article_id = split_article_url(url)
        base = {
            "url": url,
            "board": board,
            "article_id": article_id,
            "article_title": None,
            "author": None,
            "date": None,
            "content": None,
            "ip": None,
            "message_count": None,
            "messages": None,
            "warc_ts": warc_ts,
            "error": None,
            "index_no": idx,
            "page_pos": pos,
        }
        if html is None:
            base["error"] = "invalid url"  # the reference's 404 record
            rows.append(base)
            continue
        try:
            parsed = parse_article_html(html.decode("utf-8"), article_id, board, url)
        except Exception as exc:  # logged-and-dropped in the reference; typed row here
            base["error"] = f"parse: {exc}"
            rows.append(base)
            continue
        parsed.update({"warc_ts": warc_ts, "error": None,
                       "index_no": idx, "page_pos": pos})
        rows.append(parsed)

    return pa.Table.from_pylist(rows, schema=schemas.ARTICLES)
