"""User-screen extraction (SURVEY.md M6, S7).

The reference drives a headless terminal session against term.ptt.cc and
regex-scrapes the user-info screen buffer (reference
``crawler/user.py:255-269``; datetime format '%m/%d/%Y %H:%M:%S %a' parsed
at ``:184-185``).  The interactive session is out of engine scope; the data
path is a ``map_batches`` transform over the synthetic ``user_screens``
table with the reference's exact buffer regex.  Non-matching buffers become
typed error rows (the reference logs and skips, crawler/user.py:275-278).
"""

from __future__ import annotations

import re
from datetime import datetime

import pyarrow as pa

import ray.data as rd

# the reference buffer regex, verbatim semantics (crawler/user.py:255)
_SCREEN = re.compile(
    r"[\w\W]*《登入次數》(\d*)\D*次\D*《有效文章》\D*(\d*)[\w\W]*《上次上站》\D*"
    r"([\d]{1,2}\/[\d]{1,2}\/[\d]{4}\W*[\d]{1,2}:\W*[\d]{1,2}:\W*[\d]{1,2}\W*\w*)"
    r"\D*《上次故鄉》([\d.]*)"
)


def extract_users_batch(batch: pa.Table) -> pa.Table:
    names = batch["username"].to_pylist()
    texts = batch["text"].to_pylist()
    out = {"username": [], "login_times": [], "valid_article_count": [],
           "last_login_datetime": [], "last_login_ip": [], "error": []}
    for name, text in zip(names, texts):
        m = _SCREEN.match(text or "")
        dt = None
        if m:
            try:
                dt = datetime.strptime(m.group(3), "%m/%d/%Y %H:%M:%S %a")
            except ValueError:  # regex-matching but malformed datetime
                m = None
        if not m:
            out["username"].append(name)
            out["login_times"].append(None)
            out["valid_article_count"].append(None)
            out["last_login_datetime"].append(None)
            out["last_login_ip"].append(None)
            out["error"].append("screen parse failed")
            continue
        out["username"].append(name)
        out["login_times"].append(int(m.group(1)))
        out["valid_article_count"].append(int(m.group(2)))
        out["last_login_datetime"].append(dt)
        out["last_login_ip"].append(m.group(4))
        out["error"].append(None)
    return pa.table(
        {
            "username": pa.array(out["username"], pa.string()),
            "login_times": pa.array(out["login_times"], pa.int64()),
            "valid_article_count": pa.array(out["valid_article_count"], pa.int64()),
            "last_login_datetime": pa.array(out["last_login_datetime"], pa.timestamp("us")),
            "last_login_ip": pa.array(out["last_login_ip"], pa.string()),
            "error": pa.array(out["error"], pa.string()),
        }
    )


def user_last_records(corpus_dir: str) -> "rd.Dataset":
    """Latest login record per user from the append-only ``login_records``
    fact table — the reference's UserLastRecord model (models/user.py:35-61)
    consumed via ``desc(created_at)`` top-1 (export.py:111-113, O7).
    One groupby-argmax shuffle; groups stay Arrow."""
    import os

    from ..util.rayops import grouped_topk, parquet_rows

    path = os.path.join(corpus_dir, "login_records.parquet")
    ds = rd.read_parquet(path)

    return grouped_topk(ds, "username",
                        [("created_at", "descending"), ("record_id", "descending")],
                        k=1, approx_rows=parquet_rows(path))


def users_dataset(corpus_dir: str) -> "rd.Dataset":
    """User dimension from the synthetic screens, scan-ordered like the
    reference's id source (login_times then id — crawler/user.py:158, O6).

    login_times is NULL on error rows, so the sort goes through the
    null-safe surrogate (Ray 2.49 duplicates rows when sorting a nullable
    key at high parallelism — see util.rayops)."""
    import os

    from ..util.rayops import sort_nullable_ts

    ds = rd.read_parquet(os.path.join(corpus_dir, "user_screens.parquet"))
    ds = ds.map_batches(extract_users_batch, batch_format="pyarrow")
    return sort_nullable_ts(ds, "login_times", extra_cols=["username"])
