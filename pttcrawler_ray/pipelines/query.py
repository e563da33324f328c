"""The TW-vs-non-TW IP report (SURVEY.md A3/K5/J4; reference ``query.py``).

Reference semantics: for a board, count article post-IPs and push IPs whose
ASN country code is 'TW' vs not (CASE asn_country_code='TW' — reference
``query.py:83-86``); articles are inner-joined to IpAsn (null post_ip rows
drop out), pushes are semi-joined to the selected articles' history rows
(``query.py:106-109``; the engine uses the latest version's pushes).

Reference quirk documented in SURVEY.md §3.4: ``--date-range`` is required
and echoed into the output but never applied as a filter.  The engine
reproduces that by default (``apply_date_range=False``) and can apply it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..stages.normalize import explode_pushes_batch, normalize_articles_batch
from .crawl import latest_articles
from .export import _AsnLookup, build_ip_asn_map


def board_ip_report(out_dir: str, corpus_dir: str, board: str,
                    date_range: tuple | None = None,
                    apply_date_range: bool = False,
                    ip_asn: dict | None = None) -> pa.Table:
    """Small result table: (type, board, start_date, end_date, tw_ip, not_tw_ip)."""
    ip_asn = ip_asn if ip_asn is not None else build_ip_asn_map(out_dir, corpus_dir)
    ref = ray.put(ip_asn)
    start, end = (date_range or (None, None))

    arts = latest_articles(out_dir)
    arts = arts.map_batches(
        lambda t, b=board: t.filter(pc.equal(t["board"], b)), batch_format="pyarrow")
    if apply_date_range and date_range:
        arts = arts.map_batches(normalize_articles_batch, batch_format="pyarrow")
        arts = arts.map_batches(
            lambda t, s=start, e=end: t.filter(
                pc.and_(pc.greater_equal(t["post_datetime"], pa.scalar(s, pa.timestamp("us"))),
                        pc.less_equal(t["post_datetime"], pa.scalar(e, pa.timestamp("us"))))),
            batch_format="pyarrow")

    def tw_counts(ds, ip_col):
        with_asn = ds.map_batches(
            _AsnLookup, fn_constructor_kwargs={"ip_asn_ref": ref, "ip_col": ip_col},
            batch_format="pyarrow", concurrency=(1, 2))

        def partial(t: pa.Table) -> pa.Table:
            # inner-join semantics: rows with a null ip drop out (query.py:86-93)
            t = t.filter(pc.is_valid(t[ip_col]))
            is_tw = pc.equal(t["asn_country_code"], "TW")
            tw = pc.sum(pc.cast(pc.fill_null(is_tw, False), pa.int64())).as_py() or 0
            return pa.table({"tw_ip": pa.array([tw], pa.int64()),
                             "not_tw_ip": pa.array([len(t) - tw], pa.int64())})

        # pre-aggregate per batch, then a tiny final sum (no row-level shuffle)
        parts = with_asn.map_batches(partial, batch_format="pyarrow").to_pandas()
        if parts.empty or "tw_ip" not in parts.columns:  # zero input batches
            return 0, 0
        return int(parts["tw_ip"].sum()), int(parts["not_tw_ip"].sum())

    a_tw, a_not = tw_counts(arts, "ip")
    pushes = arts.map_batches(explode_pushes_batch, batch_format="pyarrow")
    p_tw, p_not = tw_counts(pushes, "push_ip")

    fmt = lambda d: str(d) if d is not None else ""
    return pa.table({
        "type": pa.array(["Article", "Push"], pa.string()),
        "board": pa.array([board, board], pa.string()),
        "start_date": pa.array([fmt(start)] * 2, pa.string()),
        "end_date": pa.array([fmt(end)] * 2, pa.string()),
        "tw_ip": pa.array([a_tw, p_tw], pa.int64()),
        "not_tw_ip": pa.array([a_not, p_not], pa.int64()),
    })
