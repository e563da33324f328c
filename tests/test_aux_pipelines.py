"""Aux capability tests: pushes explode, export sheets, query report, asn
enrichment, user extraction, version rotation, watermarks (SURVEY.md §2.2-2.7)."""

import glob
import os
import sys
from datetime import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pttcrawler_ray.fixtures import corpus_for_scale
from pttcrawler_ray.oracle.refcrawl import sequential_crawl
from pttcrawler_ray.parsing.scalars import parse_push_ipdatetime
from pttcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
from pttcrawler_ray.stages.normalize import explode_pushes_batch, normalize_articles_batch


@pytest.fixture(scope="module")
def crawled(ray_session, tmp_path_factory):
    d = corpus_for_scale("t1")
    out = str(tmp_path_factory.mktemp("aux_crawl"))
    run_crawl(d, out, CrawlConfig(num_shards=2, strict_order=False,
                                  round_seconds=3600.0, fetch_concurrency=1,
                                  process_concurrency=1, seen_capacity=100_000))
    pages = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(f"{d}/pages/bucket=*/part-0.parquet"))])
    boards = pq.read_table(f"{d}/seed_boards.parquet")["board"].to_pylist()
    golden = sequential_crawl(pages, boards)
    return d, out, golden


def test_explode_pushes(crawled):
    d, out, golden = crawled
    from pttcrawler_ray.pipelines.crawl import latest_articles

    latest = latest_articles(out)
    pushes = latest.map_batches(explode_pushes_batch, batch_format="pyarrow").to_pandas()

    expected_total = sum(len(a["messages"]) for a in golden["articles"].values())
    assert len(pushes) == expected_total

    url = next(u for u, a in golden["articles"].items() if len(a["messages"]) >= 2)
    g = golden["articles"][url]
    sub = pushes[pushes["url"] == url].sort_values("floor")
    assert list(sub["floor"]) == list(range(1, len(g["messages"]) + 1))  # 1-based (O5)
    for (_, row), msg in zip(sub.iterrows(), g["messages"]):
        assert row["push_tag"] == msg["push_tag"]
        assert row["push_content"] == msg["push_content"]
        ip, dt = parse_push_ipdatetime(msg["push_ipdatetime"])
        assert (row["push_ip"] or None) == (ip or None)
        got = row["push_datetime"]
        assert (got.to_pydatetime() if got is not None and got == got else None) == dt


def test_normalize_articles(crawled):
    _, out, golden = crawled
    from pttcrawler_ray.pipelines.crawl import latest_articles

    df = latest_articles(out).map_batches(
        normalize_articles_batch, batch_format="pyarrow").to_pandas()
    assert (df["author_username"].notna()).all()
    # nickname stripped: 'user123 (暱稱)' → 'user123'
    sample = df[df["author"].str.contains(r"\(", na=False)].iloc[0]
    assert "(" not in sample["author_username"]
    # unparsable dates → null post_datetime (M5)
    bad = df[df["date"] == "不明時間"]
    assert len(bad) > 0 and bad["post_datetime"].isna().all()


def test_asn_enrichment(crawled):
    d, _, _ = crawled
    from pttcrawler_ray.pipelines.asn import AsnEnrich

    enr = AsnEnrich(os.path.join(d, "asn_db.parquet"))
    hit = enr.lookup("140.112.3.4")
    assert hit is not None and hit["asn_country_code"] == "TW"
    assert enr.lookup("8.8.1.2")["asn_country_code"] == "US"
    assert enr.lookup("203.0.113.9") is None  # no covering cidr
    assert enr.lookup("not-an-ip") is None


def test_export_sheets(crawled, tmp_path):
    d, out, golden = crawled
    from pttcrawler_ray.pipelines.export import export_articles, export_run

    arts = export_articles(out, d).to_pandas()
    assert len(arts) == len(golden["articles"])
    # post_datetime global ordering (O4)
    dts = arts["post_datetime"].dropna().tolist()
    assert dts == sorted(dts)
    assert set(arts.columns) >= {"web_id", "board", "author", "title", "content",
                                 "post_ip", "asn", "asn_country_code", "post_datetime"}
    # TW ip got enriched
    tw = arts[arts["post_ip"].str.startswith("140.112", na=False)]
    assert (tw["asn_country_code"] == "TW").all()

    counts = export_run(out, d, str(tmp_path / "exp"), fmt="csv")
    assert counts["article"] == len(arts) and counts["push"] > 0 and counts["user"] > 0
    assert glob.glob(str(tmp_path / "exp" / "article" / "*"))


def test_query_report_matches_independent_calc(crawled):
    d, out, golden = crawled
    from pttcrawler_ray.pipelines.asn import AsnEnrich
    from pttcrawler_ray.pipelines.query import board_ip_report

    board = "gossiping"
    report = board_ip_report(out, d, board).to_pandas().set_index("type")

    enr = AsnEnrich(os.path.join(d, "asn_db.parquet"))

    def is_tw(ip):
        hit = enr.lookup(ip)
        return hit is not None and hit["asn_country_code"] == "TW"

    arts = [a for a in golden["articles"].values() if a["board"] == board]
    a_tw = sum(1 for a in arts if a["ip"] and is_tw(a["ip"]))
    a_not = sum(1 for a in arts if a["ip"] and not is_tw(a["ip"]))
    push_ips = [parse_push_ipdatetime(m["push_ipdatetime"])[0]
                for a in arts for m in a["messages"]]
    p_tw = sum(1 for ip in push_ips if ip and is_tw(ip))
    p_not = sum(1 for ip in push_ips if ip and not is_tw(ip))

    assert report.loc["Article", "tw_ip"] == a_tw
    assert report.loc["Article", "not_tw_ip"] == a_not
    assert report.loc["Push", "tw_ip"] == p_tw
    assert report.loc["Push", "not_tw_ip"] == p_not


def test_user_extraction(crawled):
    d, _, _ = crawled
    from pttcrawler_ray.pipelines.users import users_dataset

    df = users_dataset(d).to_pandas()
    # one row per screen, no sort-null duplication (Ray 2.49 bug: a sort on
    # a nullable key duplicates rows at high parallelism — users_dataset
    # must go through the null-safe surrogate sort)
    assert len(df) == df["username"].nunique()
    assert not df.duplicated().any()
    ok = df[df["error"].isna()]
    bad = df[df["error"].notna()]
    assert len(ok) > 0 and len(bad) > 0  # error path exercised
    assert ok["login_times"].notna().all()
    # scan order (login_times, username) — O6
    keys = list(zip(ok["login_times"], ok["username"]))
    assert keys == sorted(keys)
    assert isinstance(ok.iloc[0]["last_login_datetime"].to_pydatetime(), datetime)


def test_version_rotation(ray_session):
    import ray.data as rd
    from pttcrawler_ray.pipelines.compact import rotate_versions

    rows = [{"url": f"u{i % 3}", "warc_ts": datetime(2024, 1, 1 + d), "v": d}
            for i in range(3) for d in range(10)]
    ds = rd.from_items(rows)
    out = rotate_versions(ds, keep=4).to_pandas()
    assert len(out) == 12
    per = out.groupby("url")["v"].apply(lambda s: sorted(s.tolist()))
    for url, vs in per.items():
        assert vs == [6, 7, 8, 9]  # newest 4 kept


def test_board_watermarks(crawled):
    d, out, _ = crawled
    import json

    from pttcrawler_ray.pipelines.compact import board_watermarks

    wm = board_watermarks(out).to_pandas().set_index("board")
    manifest = json.load(open(os.path.join(d, "manifest.json")))
    for board, info in manifest["boards"].items():
        assert wm.loc[board, "min_index"] == 1
        assert wm.loc[board, "max_index"] == info["last_page"]


def test_user_last_record_argmax(ray_session):
    """UserLastRecord (reference models/user.py:35-61): append-only login
    records, latest by created_at wins (O7, export.py:111-113)."""
    import pyarrow.parquet as pq

    from pttcrawler_ray.fixtures import corpus_for_scale
    from pttcrawler_ray.pipelines.users import user_last_records, users_dataset

    d = corpus_for_scale("t1")
    recs = pq.read_table(os.path.join(d, "login_records.parquet")).to_pandas()
    got = user_last_records(d).to_pandas().set_index("username")

    expected = (recs.sort_values(["created_at", "record_id"])
                .groupby("username").tail(1).set_index("username"))
    assert set(got.index) == set(expected.index)
    assert (got["record_id"].sort_index() == expected["record_id"].sort_index()).all()

    # the newest record mirrors the screen snapshot's login datetime
    screens = users_dataset(d).to_pandas()
    ok = screens[screens["error"].isna()].set_index("username")
    for u in list(ok.index)[:10]:
        assert got.loc[u, "last_login_datetime"] == ok.loc[u, "last_login_datetime"]


def test_export_ods_roundtrip(crawled, tmp_path):
    """K4 ods sink (reference _export_ods, export.py:288-296): one
    Ptt_report_<date>.ods, sheets Article/Push/User, header + data rows,
    ODF package structure (uncompressed mimetype first)."""
    import zipfile

    from pttcrawler_ray.pipelines.export import export_run
    from pttcrawler_ray.pipelines.ods import read_ods_rows

    d, out, golden = crawled
    dest = str(tmp_path / "ods")
    counts = export_run(out, d, dest, fmt="ods")
    files = glob.glob(os.path.join(dest, "Ptt_report_*.ods"))
    assert len(files) == 1

    z = zipfile.ZipFile(files[0])
    infos = z.infolist()
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED
    assert z.read("mimetype") == b"application/vnd.oasis.opendocument.spreadsheet"

    sheets = read_ods_rows(files[0])
    assert set(sheets) == {"Article", "Push", "User"}
    art = sheets["Article"]
    assert len(art) - 1 == counts["article"]  # header + one row per article
    hdr = art[0]
    assert {"web_id", "board", "author", "content", "post_ip"} <= set(hdr)
    row = dict(zip(hdr, art[1]))
    assert row["web_id"] and row["board"]
    pu = sheets["Push"]
    assert len(pu) - 1 == counts["push"]
    assert "floor" in pu[0]
    # floor survives as a number, not a string
    assert isinstance(dict(zip(pu[0], pu[1]))["floor"], int)


def test_ods_writer_escaping(tmp_path):
    """XML-special characters, unicode, numbers, and None survive the ODF
    round-trip (no Ray needed — pure writer/parser)."""
    from pttcrawler_ray.pipelines.ods import read_ods_rows, save_ods

    rows = [
        ["col<1>", 'col"&2"', "col'3'"],
        ["a<b>&c", "中文 & <tags>", None],
        [42, 3.5, "x&amp;y"],  # pre-escaped text must NOT double-unescape
    ]
    path = str(tmp_path / "esc.ods")
    save_ods(path, {"S&heet<1>": rows})
    got = read_ods_rows(path)
    assert set(got) == {"S&heet<1>"}
    assert got["S&heet<1>"] == [
        ["col<1>", 'col"&2"', "col'3'"],
        ["a<b>&c", "中文 & <tags>", None],
        [42, 3.5, "x&amp;y"],
    ]


def test_schedule_crontab_text():
    """Cron scheduling (reference schedule.py:68-111): upsert-by-(module,
    args), minute/hour pinned to start, dom every N days, remove drops the
    entry.  Pure text transport — no cron binary needed."""
    from pttcrawler_ray.pipelines.schedule import apply_schedule

    store = {"text": "0 1 * * * /bin/other-job\n"}

    def fake_run(new_text=None):
        if new_text is None:
            return store["text"]
        store["text"] = new_text
        return new_text

    start = datetime(2024, 10, 5, 7, 42)
    out = apply_schedule("update", "crawl", "--scale t1", start=start,
                         cycle_days=3, _run=fake_run)
    line = [ln for ln in out.splitlines() if "pttcrawler_ray crawl" in ln][0]
    assert line.startswith("42 7 */3 * * ")
    assert "/bin/other-job" in out  # foreign entries untouched

    # upsert: same (module, args) replaces, different args appends
    out = apply_schedule("update", "crawl", "--scale t1",
                         start=datetime(2024, 10, 5, 8, 5), cycle_days=1,
                         _run=fake_run)
    ours = [ln for ln in out.splitlines() if "pttcrawler_ray crawl" in ln]
    assert len(ours) == 1 and ours[0].startswith("5 8 * * * ")
    out = apply_schedule("update", "crawl", "--scale t2",
                         start=start, cycle_days=2, _run=fake_run)
    assert len([ln for ln in out.splitlines() if "pttcrawler_ray crawl" in ln]) == 2

    out = apply_schedule("remove", "crawl", "--scale t1", _run=fake_run)
    assert "--scale t1" not in out and "--scale t2" in out
    assert "/bin/other-job" in out

    # crontab(5) hazards: % is stdin-split unless escaped; upsert/remove
    # must still match their own escaped tag
    out = apply_schedule("update", "export", "--fmt a%b", start=start,
                         cycle_days=1, _run=fake_run)
    ours = [ln for ln in out.splitlines() if "pttcrawler_ray export" in ln]
    assert len(ours) == 1 and "%" not in ours[0].replace(r"\%", "")
    out = apply_schedule("update", "export", "--fmt a%b", start=start,
                         cycle_days=2, _run=fake_run)
    assert len([ln for ln in out.splitlines()
                if "pttcrawler_ray export" in ln]) == 1  # replaced, not appended
    out = apply_schedule("remove", "export", "--fmt a%b", _run=fake_run)
    assert "pttcrawler_ray export" not in out

    # the installed command uses the invoking interpreter, not bare
    # "python" (cron's minimal PATH may lack the venv)
    from pttcrawler_ray.pipelines.schedule import module_command

    assert module_command("crawl", "").startswith(sys.executable)


def test_export_asn_plans_parity(crawled):
    """The broadcast IpAsn dict and the exact bucketed dim join must
    produce identical sheets (the K2-style adaptive-plan guarantee for
    the export/report dim lookups)."""
    import pandas as pd

    from pttcrawler_ray.pipelines.export import (export_articles,
                                                 export_pushes, export_users)

    d, out, golden = crawled

    def canon(df, keys):
        df = df[sorted(df.columns)]
        return df.sort_values(keys).reset_index(drop=True)

    for fn, keys in ((export_articles, ["web_id"]),
                     (export_pushes, ["article_web_id", "floor"]),
                     (export_users, ["username"])):
        a = canon(fn(out, d, plan="broadcast").to_pandas(), keys)
        b = canon(fn(out, d, plan="distributed").to_pandas(), keys)
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      obj=fn.__name__)
    # article/user order contracts hold under the distributed plan too
    arts = export_articles(out, d, plan="distributed").to_pandas()
    dts = arts["post_datetime"].dropna().tolist()
    assert dts == sorted(dts)
    users = export_users(out, d, plan="distributed").to_pandas()
    lt = users["login_times"].dropna().tolist()
    assert lt == sorted(lt)


# --------------------------------------------------------------------------
# S7 terminal session driver (pipelines/terminal.py) over the fake server
# --------------------------------------------------------------------------
def _screens_map(corpus_dir):
    t = pq.read_table(os.path.join(corpus_dir, "user_screens.parquet"))
    return dict(zip(t["username"].to_pylist(), t["text"].to_pylist()))


def test_terminal_session_matches_batch_extraction():
    """A clean session over the fake terminal yields exactly the rows the
    M6 batch extractor produces from the same screens — the S7 driver
    half and the data path agree."""
    from pttcrawler_ray.pipelines.terminal import (FakeTermServer,
                                                   TerminalUserSession)
    from pttcrawler_ray.pipelines.users import extract_users_batch

    corpus = corpus_for_scale("t1")
    screens = _screens_map(corpus)
    ids = sorted(screens)
    srv = FakeTermServer(screens, interstitials=2)
    got = TerminalUserSession(srv, "acc", "pw").crawl_users(ids) \
        .to_pandas().sort_values("username").reset_index(drop=True)
    exp = extract_users_batch(pa.table({
        "username": pa.array(ids, pa.string()),
        "text": pa.array([screens[u] for u in ids], pa.string()),
    })).to_pandas().sort_values("username").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # the login dismissal loop ran: connect + id + pw + 2 interstitials
    dismissals = [b for op, b in srv.log[:6] if op == "send"]
    assert dismissals[:4] == ["acc", "pw", "", ""]


def test_terminal_session_relogin_and_third_error():
    """Reference crawler/user.py:285-293: a disconnect re-logins and the
    interrupted user is retried on the next queue pass; the THIRD
    disconnect raises."""
    from pttcrawler_ray.pipelines.terminal import (FakeTermServer,
                                                   PttDisconnectException,
                                                   TerminalUserSession)

    corpus = corpus_for_scale("t1")
    screens = _screens_map(corpus)
    ids = sorted(screens)[:4]
    # send numbering (no interstitials): acc=1, pw=2, T=3, then per user
    # j: Q=4+3j, id=5+3j, dismiss=6+3j.  Kill send 4 (the first 'Q',
    # BEFORE any capture): one recovery, the interrupted user is retried
    # on the next queue pass, every id crawled exactly once.
    srv = FakeTermServer(screens, disconnect_on_send={4})
    got = TerminalUserSession(srv, "acc", "pw").crawl_users(ids).to_pandas()
    assert sorted(got["username"]) == ids
    assert got["error"].isna().all()

    # a disconnect on the DISMISSAL send lands after the record was
    # captured but before the id left the queue → the user is queried
    # again (the reference's crawler_result.append/:281 queue ordering
    # produces the same duplicate — pinned as reference parity)
    srv_d = FakeTermServer(screens, disconnect_on_send={6})
    got_d = TerminalUserSession(srv_d, "acc", "pw").crawl_users(ids) \
        .to_pandas()
    assert sorted(got_d["username"]) == sorted(ids + [ids[0]])

    srv3 = FakeTermServer(screens, disconnect_on_send={4, 9, 14})
    with pytest.raises(PttDisconnectException):
        TerminalUserSession(srv3, "acc", "pw").crawl_users(ids)


def test_terminal_session_flush_cadence():
    """Records flush every N with a final partial flush (reference
    buffers of 100, crawler/user.py:271-274)."""
    from pttcrawler_ray.pipelines.terminal import (FakeTermServer,
                                                   TerminalUserSession)

    corpus = corpus_for_scale("t1")
    screens = _screens_map(corpus)
    ids = sorted(screens)[:5]
    flushes = []
    srv = FakeTermServer(screens)
    TerminalUserSession(srv, "a", "p").crawl_users(
        ids, flush_every=2, on_flush=lambda n, b: flushes.append(list(n)))
    assert [len(f) for f in flushes] == [2, 2, 1]
    assert [u for f in flushes for u in f] == ids
