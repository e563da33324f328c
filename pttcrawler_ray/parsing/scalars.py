"""Scalar normalizers used by the sink/export stages (SURVEY.md M3–M5).

Reference quirks preserved as spec:

- :func:`parse_push_ipdatetime` parses the push time with ``"%m/%d %M:%S"``
  — minute:second, not hour:minute — exactly as the reference does
  (reference ``crawler/article.py:119-132``; SURVEY.md M4 'bug as spec').
"""

from __future__ import annotations

import re
from datetime import datetime

_AUTHOR = re.compile(r"([\S]*)\D\((.*)\)")
_PUSH_IPDT = re.compile(r"([\d.]*)\W?(\d{2}\/\d{2}\ \d{2}:\d{2})")


def parse_author(author):
    """Username without the nickname — reference crawler/article.py:134-140."""
    if author:
        m = _AUTHOR.search(author)
        if m:
            return m.group(1)
    return author


def parse_push_ipdatetime(push_ipdatetime):
    """(push_ip, push_datetime|None) — reference crawler/article.py:119-132.

    Dates invalid in year 1900 (e.g. '02/29 …' — strptime's default year
    is not a leap year) raise inside the reference and make it drop the
    whole article record (its per-record except at crawler/article.py:262);
    the engine keeps the push with a null datetime instead of crashing the
    batch (documented divergence: typed nulls over silent record loss)."""
    if push_ipdatetime:
        m = _PUSH_IPDT.search(push_ipdatetime)
        if m:
            push_ip = m.group(1)
            try:
                push_dt = datetime.strptime(m.group(2), "%m/%d %M:%S")
            except ValueError:
                return push_ip or None, None
            return push_ip, push_dt
    return None, None


def parse_article_date(date_str):
    """'%a %b %d %H:%M:%S %Y' → datetime | None (reference crawler/article.py:170-172)."""
    try:
        return datetime.strptime(date_str, "%a %b %d %H:%M:%S %Y")
    except (TypeError, ValueError):
        return None
