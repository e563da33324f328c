"""Parity of the two dedupe-latest plans (SURVEY.md D2/O2): the one-pass
payload shuffle and the payload-light winner-selection plan
(narrow shuffle + bloom prefilter + exact re-check) must produce
identical rows on a multi-round version store."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pttcrawler_ray.pipelines.crawl import latest_articles


@pytest.fixture()
def version_store(tmp_path):
    """3-round article store: 250 urls, re-crawled with newer warc_ts each
    round (some rounds skip some urls), plus error rows that must be
    excluded from the latest view."""
    out = str(tmp_path / "store")
    rng = np.random.default_rng(3)
    for rnd in range(3):
        keep = rng.random(250) < (0.9 if rnd else 1.0)
        ids = np.flatnonzero(keep)
        n = len(ids)
        t = pa.table({
            "url": pa.array([f"https://www.ptt.cc/bbs/b/M.{i}.html" for i in ids]),
            "warc_ts": pa.array((rnd * 10_000 + ids).astype("int64"),
                                pa.int64()).cast(pa.timestamp("us")),
            "index_no": pa.array(np.full(n, rnd, np.int64)),
            "page_pos": pa.array(ids % 20, pa.int64()),
            "error": pa.array([None if i % 41 else "http_404" for i in ids],
                              pa.string()),
            "content": pa.array([f"round {rnd} body of {i} " + "x" * 500
                                 for i in ids]),
        })
        d = os.path.join(out, "articles", f"round={rnd}")
        os.makedirs(d)
        pq.write_table(t, os.path.join(d, "part-0.parquet"))
    return out


def test_rotation_payload_light_parity(ray_session, version_store):
    # k=3 over the same store: payload-light rotation == one-pass rotation
    from pttcrawler_ray.pipelines.compact import rotate_versions_store

    store = os.path.join(version_store, "articles")
    tiebreak = [("index_no", "descending"), ("page_pos", "descending")]

    def run(payload_light):
        df = rotate_versions_store(store, keep=2, tiebreak=tiebreak,
                                   payload_light=payload_light).to_pandas()
        cols = sorted(df.columns)
        return df.sort_values(["url", "warc_ts"]).reset_index(drop=True)[cols]

    pd.testing.assert_frame_equal(run(False), run(True))
    got = run(True)
    # rotation keeps error rows too (it compacts the raw store): at most
    # `keep` rows per url, no url lost, and per url exactly the newest
    # `keep` warc_ts values are retained
    assert got.groupby("url").size().max() <= 2
    import glob
    raw = pd.concat([pq.read_table(f).to_pandas() for f in
                     glob.glob(os.path.join(store, "**", "*.parquet"),
                               recursive=True)])
    want = (raw.sort_values(["url", "warc_ts"], ascending=[True, False])
               .groupby("url").head(2))
    assert set(got["url"]) == set(want["url"])
    got_ts = got.groupby("url")["warc_ts"].apply(lambda s: sorted(s))
    want_ts = want.groupby("url")["warc_ts"].apply(lambda s: sorted(s))
    pd.testing.assert_series_equal(got_ts, want_ts)


def test_payload_light_parity(ray_session, version_store):
    def run(payload_light):
        df = latest_articles(version_store, payload_light=payload_light).to_pandas()
        return df.sort_values("url").reset_index(drop=True)[sorted(df.columns)]

    one_pass = run(False)
    light = run(True)
    # exactness: winners, all columns, byte-equal payloads
    pd.testing.assert_frame_equal(one_pass, light)
    # sanity on the expected winners: every url's newest non-error round
    assert one_pass["url"].is_unique
    assert len(one_pass) > 200
    newest = one_pass.set_index("url")["index_no"]
    assert (newest >= 1).any() and newest.max() == 2
    assert one_pass["content"].str.startswith("round ").all()
