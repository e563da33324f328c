"""Deterministic synthetic PTT-structured web corpus (FIXTURES.md).

Generates the ``pages`` Parquet table (BASELINE.json input_hint shape:
url, warc_ts, html, text, lang) plus the auxiliary ``seed_boards``,
``asn_db`` and ``user_screens`` tables.  Pure function of the seed — same
arguments ⇒ byte-identical corpus.

The HTML deliberately exercises every branch of the reference parser
(reference ``crawler/article.py:265-384``, ``:438-459``; see FIXTURES.md):
pinned-post separators, deleted posts, transcription articles, articles
raising PostException, unparsable dates, whitelist-stripped characters
(emoji/box drawing), multi-string push-content, missing push-tag spans,
empty userids, ipdatetime without ip, and multi-snapshot urls (the
versioning/dedupe path).

Layout on disk::

    out_dir/
      pages/bucket=<k>/part-0.parquet   # hash-partitioned by url (fetch locality)
      seed_boards.parquet
      asn_db.parquet
      user_screens.parquet
      manifest.json                     # params + per-board last_page

Hot-board skew: one "gossiping"-like board holds ``hot_share`` of all
articles (Zipf-ish head) to exercise the frontier's skew splitting.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from . import schemas
from .util.hashing import hash_u64

PTT_URL = "https://www.ptt.cc"
_EPOCH = datetime(2024, 10, 1, 0, 0, 0)

_CJK_PHRASES = [
    "今天天氣真的很好", "有沒有人知道這個的八卦", "我覺得這樣不太對",
    "大家覺得如何呢", "認真回覆一下這篇文章", "這個問題其實很簡單",
    "樓主說得很有道理", "先說結論再說原因", "以下是個人淺見",
    "之前有人發過類似的文", "補充一點資料來源", "這件事情的來龍去脈",
]
_ASCII_WORDS = ["data", "ray", "cluster", "parquet", "arrow", "stream",
                "shard", "crawl", "frontier", "batch", "queue", "index"]
_PUNCT = ["，", "。", "：", "？", "《", "》", "（", "）"]
_JUNK = ["😀", "😂", "🔥", "─", "━", "│", "┌", "♥", "★", "☺"]
_NICKNAMES = ["神人", "路人甲", "鄉民", "老司機", "新手"]
_TITLES_PREFIX = ["[問卦]", "[新聞]", "[爆卦]", "Re: [問卦]", "[公告]", "[心得]"]
_TW_IP_PREFIXES = ["140.112", "1.160", "36.230"]
_NON_TW_IP_PREFIXES = ["8.8", "142.250", "133.11"]


def _ip(rng: random.Random) -> str:
    prefix = rng.choice(_TW_IP_PREFIXES * 3 + _NON_TW_IP_PREFIXES)  # ~TW-heavy
    return f"{prefix}.{rng.randrange(256)}.{rng.randrange(1, 255)}"


def _sentence(rng: random.Random) -> str:
    bits = rng.sample(_CJK_PHRASES, 2) + rng.sample(_ASCII_WORDS, 2)
    rng.shuffle(bits)
    return rng.choice(_PUNCT).join(bits) + rng.choice(_PUNCT)


def _fmt_date(dt: datetime) -> str:
    return dt.strftime("%a %b %d %H:%M:%S %Y")


def _article_html(rng: random.Random, board: str, web_id: str, author: str,
                  title: str, post_dt: datetime, ip: str, n_pushes: int,
                  flavor: str, extra_pushes: int = 0) -> str:
    """flavor ∈ {normal, transcription, broken, baddate}."""
    url_line = f"{PTT_URL}/bbs/{board}/{web_id}.html"
    body_lines = [_sentence(rng) for _ in range(rng.randrange(2, 6))]
    if rng.random() < 0.4:
        body_lines.append("參考網址 https://example.com/" + rng.choice(_ASCII_WORDS))
    if rng.random() < 0.3:
        body_lines.append("".join(rng.sample(_JUNK, 3)) + _sentence(rng))
    if rng.random() < 0.25:
        body_lines.append(f"舊文連結 {url_line} 請參考")  # article_id-drop rule

    parts = ["<html><head><title>", title, "</title></head><body>",
             '<div id="main-container"><div id="main-content" class="bbs-screen bbs-content">']

    if flavor == "normal" or flavor == "baddate":
        date_str = "不明時間" if flavor == "baddate" else _fmt_date(post_dt)
        # ~6%: meta-value with a single ELEMENT child — bs4 .string recurses
        # through it (htmlmini Node.string), so author must still extract
        author_text = f"{author} ({rng.choice(_NICKNAMES)})"
        if rng.random() < 0.06:
            author_html = f"<b>{author_text}</b>"
        else:
            author_html = author_text
        parts.append(
            '<div class="article-metaline"><span class="article-meta-tag">作者</span>'
            f'<span class="article-meta-value">{author_html}</span></div>'
            '<div class="article-metaline-right"><span class="article-meta-tag">看板</span>'
            f'<span class="article-meta-value">{board}</span></div>'
            '<div class="article-metaline"><span class="article-meta-tag">標題</span>'
            f'<span class="article-meta-value">{title}</span></div>'
            '<div class="article-metaline"><span class="article-meta-tag">時間</span>'
            f'<span class="article-meta-value">{date_str}</span></div>'
        )
    elif flavor == "transcription":
        parts.append(
            f"\n※ 轉錄者: {author} ({ip}), {post_dt.strftime('%m/%d/%Y %H:%M:%S')}\n"
        )
    # flavor == broken: no metalines, no transcription → PostException path

    parts.append("\n" + "\n".join(body_lines) + "\n")
    # an inline link splits the text nodes so the signature is its own node
    parts.append(f'<a href="https://example.com/{rng.choice(_ASCII_WORDS)}" rel="nofollow">'
                 f"https://example.com/{rng.choice(_ASCII_WORDS)}</a>")
    parts.append(f"\n--\n{rng.choice(_CJK_PHRASES)} 簽名檔\n")
    parts.append(f'<span class="f2">※ 發信站: 批踢踢實業坊(ptt.cc), 來自: {ip} (臺灣)</span>\n')
    if rng.random() < 0.5:
        parts.append(f'<span class="f2">◆ From: {ip}</span>\n')
    parts.append(f'<span class="f2">※ 文章網址: {url_line}</span>\n')

    total_pushes = n_pushes + extra_pushes
    for i in range(total_pushes):
        roll = rng.random()
        tag = "推" if roll < 0.55 else ("噓" if roll < 0.75 else "→")
        pusher = f"pusher{rng.randrange(200):03d}"
        push_ip = _ip(rng)
        push_dt = post_dt + timedelta(minutes=5 * (i + 1))
        ipdt = f"{push_ip} {push_dt.strftime('%m/%d %H:%M')}"
        content = rng.choice(_CJK_PHRASES)
        edge = rng.random()
        if edge < 0.04:  # missing push-tag span → skipped by parser
            parts.append(f'<div class="push"><span class="f3 hl push-userid">{pusher}</span>'
                         f'<span class="f3 push-content">: {content}</span>'
                         f'<span class="push-ipdatetime"> {ipdt}\n</span></div>')
            continue
        if edge < 0.08:  # empty userid
            userid_html = '<span class="f3 hl push-userid"></span>'
        else:
            userid_html = f'<span class="f3 hl push-userid">{pusher}</span>'
        if edge < 0.12:  # multi-string push-content (link inside)
            content_html = (f'<span class="f3 push-content">: {content} '
                            f'<a href="https://example.com/x">https://example.com/x</a> 推薦</span>')
        else:
            content_html = f'<span class="f3 push-content">: {content}</span>'
        if 0.12 <= edge < 0.16:  # ipdatetime without ip
            ipdt = push_dt.strftime("%m/%d %H:%M")
        parts.append(f'<div class="push"><span class="hl push-tag">{tag} </span>'
                     f"{userid_html}{content_html}"
                     f'<span class="push-ipdatetime"> {ipdt}\n</span></div>')

    parts.append("</div></div></body></html>")
    return "".join(parts)


def _index_html(board: str, index_no: int, entries: list[tuple[str, str, bool]],
                has_prev: bool, pinned: list[tuple[str, str]]) -> str:
    """entries: [(web_id, title, deleted)]; pinned after the separator."""
    parts = ["<html><body>", '<div id="action-bar-container"><div class="action-bar">']
    if has_prev:
        parts.append(f'<a class="btn wide" href="/bbs/{board}/index{index_no - 1}.html">&lsaquo; 上頁</a>')
    else:
        parts.append('<a class="btn wide disabled">&lsaquo; 上頁</a>')
    parts.append("</div></div>")
    parts.append('<div class="r-list-container action-bar-margin bbs-screen">')
    for web_id, title, deleted in entries:
        if deleted:
            parts.append('<div class="r-ent"><div class="nrec"></div>'
                         '<div class="title"> (本文已被刪除) </div></div>')
        else:
            parts.append(f'<div class="r-ent"><div class="nrec"><span class="hl f3">12</span></div>'
                         f'<div class="title"><a href="/bbs/{board}/{web_id}.html">{title}</a></div>'
                         f'<div class="meta"><div class="author">someone</div></div></div>')
    if pinned:
        parts.append('<div class="r-list-sep"></div>')
        for web_id, title in pinned:
            parts.append(f'<div class="r-ent"><div class="title">'
                         f'<a href="/bbs/{board}/{web_id}.html">{title}</a></div></div>')
    parts.append("</div></body></html>")
    return "".join(parts)


def _crude_text(html: str) -> str:
    """The generator's own (non-oracle) text column — a crude tag strip."""
    import re
    return re.sub(r"\s+", " ", re.sub(r"<[^>]+>", " ", html)).strip()


def generate_corpus(out_dir: str, seed: int = 42, n_boards: int = 3,
                    total_articles: int = 600, articles_per_page: int = 15,
                    hot_share: float = 0.5, dup_fraction: float = 0.08,
                    n_buckets: int = 8, robots_txt: str | None = None,
                    force: bool = False) -> dict:
    """Write the corpus; returns the manifest dict.  Cached: if the manifest
    on disk matches the parameters, generation is skipped.

    ``robots_txt``: when set, a ``<PTT_URL>/robots.txt`` page carrying the
    body is planted so the fetch stage's per-host robots gate has real
    rules to enforce (default corpora have none → gate allows all)."""
    params = {
        "seed": seed, "n_boards": n_boards, "total_articles": total_articles,
        "articles_per_page": articles_per_page, "hot_share": hot_share,
        "dup_fraction": dup_fraction, "n_buckets": n_buckets, "version": 4,
    }
    if robots_txt is not None:  # keyed only when present → old manifests stay valid
        params["robots_txt"] = robots_txt
    manifest_path = os.path.join(out_dir, "manifest.json")
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            existing = json.load(f)
        if existing.get("params") == params:
            return existing

    rng = random.Random(seed)
    boards = ["gossiping"] + [f"board{i}" for i in range(1, n_boards)]
    # hot board takes hot_share, the rest split the remainder evenly
    counts = [max(articles_per_page, int(total_articles * hot_share))]
    rest = max(1, n_boards - 1)
    for _ in range(rest):
        counts.append(max(1, int(total_articles * (1 - hot_share) / rest)))

    page_urls, page_ts, page_html, page_text, page_lang = [], [], [], [], []
    manifest_boards = {}
    article_seq = 0

    def emit(url: str, ts: datetime, html: str):
        page_urls.append(url)
        page_ts.append(ts)
        page_html.append(html.encode("utf-8"))
        page_text.append(_crude_text(html))
        page_lang.append("zh" if rng.random() > 0.05 else "en")

    for board, n_articles in zip(boards, counts):
        n_pages = max(1, (n_articles + articles_per_page - 1) // articles_per_page)
        # pinned posts shared by all pages of the board (excluded from crawl)
        pinned = []
        for _ in range(rng.randrange(0, 3)):
            web_id = f"M.{1690000000 + article_seq}.A.{article_seq:03X}"
            article_seq += 1
            pinned.append((web_id, "[公告] 置底文章"))
            # pinned article pages exist but are never reachable via the frontier
            dt = _EPOCH + timedelta(minutes=article_seq)
            emit(f"{PTT_URL}/bbs/{board}/{web_id}.html", dt,
                 _article_html(rng, board, web_id, "sysop", "[公告] 置底文章",
                               dt, _ip(rng), 2, "normal"))

        made = 0
        for page_no in range(1, n_pages + 1):
            entries = []
            on_page = min(articles_per_page, n_articles - made)
            for _ in range(max(1, on_page)):
                web_id = f"M.{1700000000 + article_seq}.A.{article_seq:03X}"
                article_seq += 1
                made += 1
                deleted = rng.random() < 0.05
                title = f"{rng.choice(_TITLES_PREFIX)} {rng.choice(_CJK_PHRASES)}"
                entries.append((web_id, title, deleted))
                if deleted:
                    continue
                author = f"user{rng.randrange(300):03d}"
                post_dt = (_EPOCH + timedelta(hours=page_no * 4)
                           + timedelta(minutes=rng.randrange(240)))
                ip = _ip(rng)
                roll = rng.random()
                flavor = ("transcription" if roll < 0.04
                          else "broken" if roll < 0.06
                          else "baddate" if roll < 0.09 else "normal")
                n_pushes = rng.randrange(0, 8)
                url = f"{PTT_URL}/bbs/{board}/{web_id}.html"
                snap_ts = _EPOCH + timedelta(days=30, minutes=article_seq)
                emit(url, snap_ts,
                     _article_html(rng, board, web_id, author, title, post_dt,
                                   ip, n_pushes, flavor))
                if rng.random() < dup_fraction:  # re-edited snapshots (versioning)
                    for extra in range(1, rng.randrange(2, 4)):
                        emit(url, snap_ts + timedelta(days=extra),
                             _article_html(rng, board, web_id, author, title,
                                           post_dt, ip, n_pushes, flavor,
                                           extra_pushes=extra))

            idx_ts = _EPOCH + timedelta(days=31, minutes=page_no)
            html = _index_html(board, page_no, entries, page_no > 1, pinned)
            emit(f"{PTT_URL}/bbs/{board}/index{page_no}.html", idx_ts, html)
            if page_no == n_pages:  # the live 'index.html' alias (last-page probe)
                emit(f"{PTT_URL}/bbs/{board}/index.html", idx_ts, html)

        manifest_boards[board] = {"last_page": n_pages, "articles": made}

    if robots_txt is not None:  # served by the fetch stage's per-host gate
        page_urls.append(f"{PTT_URL}/robots.txt")
        page_ts.append(_EPOCH)
        page_html.append(robots_txt.encode("utf-8"))
        page_text.append(robots_txt)
        page_lang.append("en")

    # --- write pages, hash-partitioned by url ------------------------------
    os.makedirs(out_dir, exist_ok=True)
    table = pa.Table.from_pydict(
        {"url": page_urls, "warc_ts": page_ts, "html": page_html,
         "text": page_text, "lang": page_lang},
        schema=schemas.PAGES,
    )
    buckets = [hash_u64(u) % n_buckets for u in page_urls]
    table = table.append_column("bucket", pa.array(buckets, pa.int32()))
    for k in range(n_buckets):
        sub = table.filter(pa.compute.equal(table["bucket"], k)).drop_columns(["bucket"])
        bdir = os.path.join(out_dir, "pages", f"bucket={k}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(sub, os.path.join(bdir, "part-0.parquet"))
    # persist the routing modulus (PagesStore reads this, not a dir count)
    with open(os.path.join(out_dir, "pages", "_manifest.json"), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)

    # --- seed boards --------------------------------------------------------
    pq.write_table(
        pa.Table.from_pydict(
            {"board": boards,
             "politeness_delay_s": [2.0] * len(boards)},
            schema=schemas.SEED_BOARDS),
        os.path.join(out_dir, "seed_boards.parquet"),
    )

    # --- asn_db: cidr prefixes covering generated IPs ----------------------
    cidrs, asns, ccs, regs, descs, dates = [], [], [], [], [], []
    for i, p in enumerate(_TW_IP_PREFIXES):
        cidrs.append(f"{p}.0.0/16"); asns.append(f"AS{3462 + i}"); ccs.append("TW")
        regs.append("apnic"); descs.append("HINET-TW"); dates.append(_EPOCH)
    for i, p in enumerate(_NON_TW_IP_PREFIXES):
        cidrs.append(f"{p}.0.0/16"); asns.append(f"AS{15169 + i}")
        ccs.append(["US", "US", "JP"][i % 3])
        regs.append("arin"); descs.append("EXAMPLE-NET"); dates.append(_EPOCH)
    pq.write_table(
        pa.Table.from_pydict(
            {"cidr": cidrs, "asn": asns, "asn_country_code": ccs,
             "asn_registry": regs, "asn_description": descs, "asn_date": dates},
            schema=schemas.ASN_DB),
        os.path.join(out_dir, "asn_db.parquet"),
    )

    # --- user_screens -------------------------------------------------------
    names, texts = [], []
    for i in range(60):
        name = f"user{i:03d}"
        names.append(name)
        if i % 10 == 9:  # non-matching buffer → error path
            texts.append("系統維護中，請稍後再試\n")
            continue
        dt = _EPOCH + timedelta(days=i % 20, hours=i % 24)
        texts.append(
            "歡迎使用 PTT\n"
            f"《ID暱稱》{name}\n"
            f"《登入次數》{100 + i * 7} 次 (同天內只算一次)\n"
            f"《有效文章》{i * 3} 篇\n"
            f"《上次上站》{dt.strftime('%m/%d/%Y %H:%M:%S %a')}\n"
            f"《上次故鄉》{_ip(rng)}\n"
        )
    pq.write_table(
        pa.Table.from_pydict({"username": names, "text": texts},
                             schema=schemas.USER_SCREENS),
        os.path.join(out_dir, "user_screens.parquet"),
    )

    # --- login_records: append-only UserLastRecord facts --------------------
    # (reference models/user.py:35-61: one row per observed login, consumed
    # via desc(created_at)[0] at export.py:111-113).  The newest record of a
    # user carries their screen snapshot's login datetime; older records are
    # synthetic history.
    rec_ids, rec_users, rec_dts, rec_ips, rec_created = [], [], [], [], []
    rid = 0
    for i, name in enumerate(names):
        n_rec = 1 + (i % 4)
        last_dt = _EPOCH + timedelta(days=i % 20, hours=i % 24)
        for j in range(n_rec):
            rec_ids.append(rid); rid += 1
            rec_users.append(name)
            back = n_rec - 1 - j  # 0 for the newest record (== screen dt)
            dt = last_dt - timedelta(days=3 * back, hours=back)
            rec_dts.append(dt)
            rec_ips.append(_ip(rng))
            rec_created.append(dt + timedelta(minutes=1))
    pq.write_table(
        pa.table({
            "record_id": pa.array(rec_ids, pa.int64()),
            "username": pa.array(rec_users, pa.string()),
            "last_login_datetime": pa.array(rec_dts, pa.timestamp("us")),
            "last_login_ip": pa.array(rec_ips, pa.string()),
            "created_at": pa.array(rec_created, pa.timestamp("us")),
        }),
        os.path.join(out_dir, "login_records.parquet"),
    )

    manifest = {"params": params, "boards": manifest_boards,
                "n_pages_rows": len(page_urls), "n_buckets": n_buckets,
                "login_records": rid}
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


_SCALE_PRESETS = {
    # sf → total articles across boards (pages rows ≈ articles × (1+dup) + index pages)
    "t1": dict(total_articles=600),
    "t2": dict(total_articles=6000),
    "bench": dict(total_articles=60000, n_boards=6, n_buckets=32),
    # scaling evidence runs: big enough that fixed per-run overheads
    # (index build, seed, round boundaries) are noise vs the parallel work
    "scaling": dict(total_articles=400000, n_boards=8, n_buckets=32),
    # stress evidence: a 10^6-URL frontier on the routed scale-default path
    # (per-worker memory = one url-hash bucket subset, 64 buckets)
    "stress": dict(total_articles=1000000, n_boards=10, n_buckets=64),
}


def corpus_for_scale(scale: str, base_dir: str = "/tmp/ptt_corpus") -> str:
    """Generate (cached) and return the corpus dir for a named scale."""
    out = os.path.join(base_dir, scale)
    generate_corpus(out, **_SCALE_PRESETS[scale])
    return out
