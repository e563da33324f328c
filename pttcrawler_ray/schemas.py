"""Fixed, declared Arrow schemas for every logical table (SURVEY.md §1.2).

The reference declares its schema up-front via Alembic migrations
(``db_migration/versions/77eaebfa8062_create_initial_table.py:20-115``);
the Ray engine does the same here — no inference anywhere.
"""

from __future__ import annotations

import pyarrow as pa

# --- input: the synthetic web (BASELINE.json input_hint shape) --------------
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# --- frontier rows (the ArticleIndex analog, reference models/article.py:20-30)
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("board", pa.string()),
        ("kind", pa.string()),  # 'index' | 'article'
        ("index_no", pa.int32()),
        ("priority", pa.int64()),
        ("discovered_ts", pa.timestamp("us")),
    ]
)

# --- parsed article record (reference parse() dict, crawler/article.py:371-384)
MESSAGE = pa.struct(
    [
        ("push_tag", pa.string()),
        ("push_userid", pa.string()),
        ("push_content", pa.string()),
        ("push_ipdatetime", pa.string()),
    ]
)
MESSAGE_COUNT = pa.struct(
    [
        ("all", pa.int32()),
        ("count", pa.int32()),
        ("push", pa.int32()),
        ("boo", pa.int32()),
        ("neutral", pa.int32()),
    ]
)
ARTICLES = pa.schema(
    [
        ("url", pa.string()),
        ("board", pa.string()),
        ("article_id", pa.string()),
        ("article_title", pa.string()),
        ("author", pa.string()),
        ("date", pa.string()),  # reference keeps the raw '%a %b %d %H:%M:%S %Y' string
        ("content", pa.string()),
        ("ip", pa.string()),
        ("message_count", MESSAGE_COUNT),
        ("messages", pa.list_(MESSAGE)),
        ("warc_ts", pa.timestamp("us")),  # version key (ArticleHistory analog)
        ("error", pa.string()),  # non-200 → 'invalid url' (crawler/article.py:274-276)
        ("index_no", pa.int32()),   # board index page the url was found on
        ("page_pos", pa.int32()),   # 1-based DOM position within that page
    ]
)

# --- exploded pushes (Push child table, reference models/article.py:111-154)
PUSHES = pa.schema(
    [
        ("url", pa.string()),
        ("article_id", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("floor", pa.int32()),  # 1-based, crawler/article.py:230
        ("push_tag", pa.string()),
        ("push_userid", pa.string()),
        ("push_content", pa.string()),
        ("push_ip", pa.string()),
        ("push_datetime", pa.timestamp("us")),
    ]
)

# --- seen set materialization (checkpoint / verification)
SEEN = pa.schema([("url", pa.string()), ("url_hash", pa.uint64())])

# --- dims -------------------------------------------------------------------
SEED_BOARDS = pa.schema(
    [("board", pa.string()), ("politeness_delay_s", pa.float64())]
)
ASN_DB = pa.schema(
    [
        ("cidr", pa.string()),
        ("asn", pa.string()),
        ("asn_country_code", pa.string()),
        ("asn_registry", pa.string()),
        ("asn_description", pa.string()),
        ("asn_date", pa.timestamp("us")),
    ]
)
USER_SCREENS = pa.schema([("username", pa.string()), ("text", pa.string())])
