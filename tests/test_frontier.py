"""Frontier shard semantics (SURVEY.md §5(2)) — plain-Python, no Ray."""

import pyarrow as pa

from pttcrawler_ray.state.frontier import FrontierShard, lane_of, shard_of


def _tbl(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "board": pa.array([r[1] for r in rows], pa.string()),
        "kind": pa.array([r[2] for r in rows], pa.string()),
        "index_no": pa.array([r[3] for r in rows], pa.int32()),
    })


def _mk(**kw):
    defaults = dict(shard_id=0, num_shards=1, round_seconds=10.0,
                    default_delay_s=2.0, seen_capacity=10_000)
    defaults.update(kw)
    return FrontierShard(**defaults)


def u(board, name):
    return f"https://www.ptt.cc/bbs/{board}/{name}.html"


def test_priority_order_and_index_barrier():
    """O1: index pages before their articles, descending index number."""
    f = _mk(strict_order=True)
    f.add(_tbl([(u("b", "index2"), "b", "index", 2),
                (u("b", "index1"), "b", "index", 1)]))
    r1 = f.pop_round()
    assert r1["url"].to_pylist() == [u("b", "index2")]  # barrier: stops at index
    # articles of page 2 arrive; lane is blocked until the ack
    assert f.pop_round().num_rows == 0
    f.add(_tbl([(u("b", "M.1.A.001"), "b", "article", 2),
                (u("b", "M.2.A.002"), "b", "article", 2)]),
          acks=["www.ptt.cc/b#0"])
    r2 = f.pop_round()
    # budget 5/round: both articles, then index1 (and block again)
    assert r2["url"].to_pylist() == [u("b", "M.1.A.001"), u("b", "M.2.A.002"), u("b", "index1")]
    f.add(_tbl([]), acks=["www.ptt.cc/b#0"])
    assert f.pop_round().num_rows == 0
    assert f.depth() == 0


def test_politeness_budget_per_round():
    f = _mk(strict_order=False, round_seconds=6.0, default_delay_s=2.0)  # budget 3
    rows = [(u("b", f"M.{i}.A.{i:03X}"), "b", "article", 9) for i in range(10)]
    f.add(_tbl(rows))
    sizes = []
    while True:
        r = f.pop_round()
        if r.num_rows == 0:
            break
        sizes.append(r.num_rows)
    assert sizes == [3, 3, 3, 1]
    log = f.get_politeness_log()
    assert all(count <= 3 for _, _, count in log)


def test_dedup_and_stats():
    f = _mk(strict_order=False)
    rows = [(u("b", f"M.{i}.A.0"), "b", "article", 1) for i in range(5)]
    out1 = f.add(_tbl(rows))
    assert out1 == {"fresh": 5, "dedup_hits": 0}
    out2 = f.add(_tbl(rows))  # re-discovered urls are dropped (D1)
    assert out2["fresh"] == 0 and out2["dedup_hits"] == 5
    assert f.depth() == 5


def test_force_and_cuckoo_unsee():
    f = _mk(strict_order=False, use_cuckoo=True)
    rows = [(u("b", "M.9.A.9"), "b", "article", 1)]
    f.add(_tbl(rows))
    f.pop_round()
    assert f.add(_tbl(rows))["fresh"] == 0  # seen
    assert f.unsee([u("b", "M.9.A.9")]) == 1  # upgrade path: deletable seen set
    assert f.add(_tbl(rows))["fresh"] == 1


def test_watermarks_track_fetched_pages():
    """Watermarks advance only when an index page is successfully FETCHED
    (reported back via add(watermarks=...)), not when queued or popped —
    a 404ing index page must not advance the resume range (reference:
    ArticleIndex min/max reflects recorded pages, article_index.py:72-88)."""
    f = _mk(strict_order=False, round_seconds=4.0)  # budget 2/round
    f.add(_tbl([(u("b", "index7"), "b", "index", 7),
                (u("b", "index3"), "b", "index", 3),
                (u("c", "index5"), "c", "index", 5)]))
    assert f.get_stats()["watermarks"] == {}  # queued ≠ crawled
    f.pop_round()  # pops b:7, b:3 (budget 2) + c:5 (own lane)
    assert f.get_stats()["watermarks"] == {}  # popped ≠ fetched (may 404)
    # processing stage reports b:7 and c:5 fetched OK; b:3 404'd → no update
    f.add(_tbl([]), watermarks=[("b", 7), ("c", 5)])
    wm = f.get_stats()["watermarks"]
    assert wm["b"] == [7, 7] and wm["c"] == [5, 5]


def test_in_batch_duplicates_enqueue_once():
    f = _mk(strict_order=False)
    rows = [(u("b", "M.1.A.0"), "b", "article", 1)] * 3 + \
           [(u("b", "M.2.A.0"), "b", "article", 1)]
    out = f.add(_tbl(rows))
    assert out["fresh"] == 2 and f.depth() == 2  # each url once


def test_snapshot_restore_preserves_order(tmp_path):
    f = _mk(strict_order=False, round_seconds=4.0)  # budget 2
    rows = [(u("b", f"M.{i}.A.0"), "b", "article", 5 - (i // 3)) for i in range(9)]
    f.add(_tbl(rows))
    first = f.pop_round()["url"].to_pylist()

    f.snapshot(str(tmp_path))
    g = _mk(strict_order=False, round_seconds=4.0)
    g.restore(str(tmp_path))

    rest_f, rest_g = [], []
    for shard, acc in ((f, rest_f), (g, rest_g)):
        while True:
            r = shard.pop_round()
            if r.num_rows == 0:
                break
            acc.extend(r["url"].to_pylist())
    assert rest_f == rest_g  # resumed pop order identical to uninterrupted
    assert g.add(_tbl(rows))["fresh"] == 0  # seen set survived the snapshot


def test_skew_split_divides_budget_and_lanes():
    split = {"www.ptt.cc/hot": 4}
    f = _mk(strict_order=False, split=split, round_seconds=40.0, default_delay_s=2.0)
    rows = [(u("hot", f"M.{i}.A.0"), "hot", "article", 1) for i in range(100)]
    f.add(_tbl(rows))
    r = f.pop_round()
    lanes = set(r["lane"].to_pylist())
    assert len(lanes) > 1  # urls spread over sublanes
    # site budget 20/round divided by 4 sublanes → ≤5 per lane
    from collections import Counter

    per_lane = Counter(r["lane"].to_pylist())
    assert all(c <= 5 for c in per_lane.values())
    # different sublanes of a hot site may live on different shards
    shards = {shard_of(ln, 8) for ln in lanes}
    assert len(shards) >= 1


def test_lane_routing_stable():
    assert lane_of("https://www.ptt.cc/bbs/b/x.html", "b", {}) == "www.ptt.cc/b#0"
    s = shard_of("www.ptt.cc/b#0", 4)
    assert 0 <= s < 4 and s == shard_of("www.ptt.cc/b#0", 4)
