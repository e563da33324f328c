"""One-call continuous-crawl CDC driver (pipelines/cdc.py): bootstrap,
round ingestion, url↔id map maintenance, store composition (dedup +
BM25), idempotent crash-resume."""

import json
import os
from datetime import timedelta

import pyarrow as pa
import pytest

import ray.data as rd

from pttcrawler_ray.fixtures import _EPOCH


def _view(rows):
    """Latest-view-shaped table: (url, ts_min, content, error)."""
    msg = pa.list_(pa.struct([("push_tag", pa.string()),
                              ("push_userid", pa.string()),
                              ("push_content", pa.string()),
                              ("push_ipdatetime", pa.string())]))
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([_EPOCH + timedelta(minutes=r[1]) for r in rows],
                            pa.timestamp("us")),
        "article_title": pa.array(["t"] * len(rows), pa.string()),
        "author": pa.array(["a"] * len(rows), pa.string()),
        "date": pa.array(["d"] * len(rows), pa.string()),
        "content": pa.array([r[2] for r in rows], pa.string()),
        "ip": pa.array(["1.2.3.4"] * len(rows), pa.string()),
        "messages": pa.array([[] for _ in rows], msg),
        "error": pa.array([r[3] for r in rows], pa.string()),
    })


def _doc(i):
    return " ".join(f"d{i}w{j}" for j in range(30))


A = [
    ("u/1", 0, _doc(1), None),
    ("u/2", 0, _doc(2), None),
    ("u/3", 0, _doc(3), None),
    ("u/err", 0, "body", "404"),     # error: no doc, no map entry
    ("u/empty", 0, "", None),        # empty: no doc, no map entry
]
B = [
    ("u/1", 0, _doc(1), None),       # unchanged
    ("u/2", 5, _doc(20), None),      # changed (new version)
    # u/3 removed
    ("u/7", 1, _doc(7), None),       # added
    ("u/err", 1, _doc(8), None),     # error -> success: added
    ("u/empty", 5, _doc(9), None),   # changed, doc appears
]


def _map_of(work):
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(work, "url_map")).to_table()
    return dict(zip(t["url"].to_pylist(), t["doc_id"].to_pylist()))


def _keeper_ids(work):
    from pttcrawler_ray.textops.incremental import current_keepers

    return set(current_keepers(os.path.join(work, "dedup_state"))
               .to_pandas()["doc_id"])


def test_cdc_bootstrap_and_round(ray_session, tmp_path):
    from pttcrawler_ray.pipelines.cdc import _cdc_bootstrap, _cdc_round
    from pttcrawler_ray.textops.bm25index import bm25_topk_indexed

    work = str(tmp_path / "w")
    s0 = _cdc_bootstrap(rd.from_arrow(_view(A)), work, threshold=0.7,
                        num_perm=64, bands=16, shingle_k=3, bm25=True,
                        bm25_parts=4)
    assert s0["docs"] == 3 and s0["kept"] == 3
    m0 = _map_of(work)
    assert set(m0) == {"u/1", "u/2", "u/3"}
    assert sorted(m0.values()) == [0, 1, 2]
    assert _keeper_ids(work) == set(m0.values())

    s1 = _cdc_round(rd.from_arrow(_view(B)), work)
    assert (s1["added"], s1["changed"], s1["removed"]) == (2, 2, 1)
    assert s1["new_docs"] == 4 and s1["kept"] == 4
    m1 = _map_of(work)
    assert set(m1) == {"u/1", "u/2", "u/7", "u/err", "u/empty"}
    assert m1["u/1"] == m0["u/1"]            # unchanged keeps its id
    new_ids = {m1[u] for u in ("u/2", "u/7", "u/err", "u/empty")}
    assert min(new_ids) >= 3 and len(new_ids) == 4
    assert _keeper_ids(work) == set(m1.values())

    # BM25 followed: index == the surviving docs (doc for u/2's NEW text)
    res = bm25_topk_indexed(os.path.join(work, "bm25"),
                            [(0, "d20w0 d20w1")], topk=3).to_pandas()
    assert res["doc_id"].tolist() == [m1["u/2"]]
    manifest = json.load(open(os.path.join(work, "manifest.json")))
    assert manifest["rounds"] == 2 and manifest["next_id"] == 7

    # ingesting the SAME crawl again is a clean no-op round
    s2 = _cdc_round(rd.from_arrow(_view(B)), work)
    assert (s2["added"], s2["changed"], s2["removed"],
            s2["new_docs"]) == (0, 0, 0, 0)
    assert _map_of(work) == m1

    # double-init refuses
    with pytest.raises(FileExistsError):
        _cdc_bootstrap(rd.from_arrow(_view(A)), work, threshold=0.7,
                       num_perm=64, bands=16, shingle_k=3, bm25=False,
                       bm25_parts=4)


def test_cdc_round_resume_after_partial_apply(ray_session, tmp_path):
    """Crash simulation: a round whose deletes, dedup increment, AND
    bm25 append already committed — but whose map/manifest did not —
    must finish to EXACTLY the clean-run state when re-driven."""
    import pyarrow.parquet as pq

    from pttcrawler_ray.pipelines.cdc import (_cdc_bootstrap, _cdc_round,
                                              _latest_docs, _stage_round)
    from pttcrawler_ray.textops.bm25index import append_bm25_index
    from pttcrawler_ray.textops.incremental import (
        apply_removals, minhash_dedup_incremental)

    clean, crash = str(tmp_path / "clean"), str(tmp_path / "crash")
    for w in (clean, crash):
        _cdc_bootstrap(rd.from_arrow(_view(A)), w, threshold=0.7,
                       num_perm=64, bands=16, shingle_k=3, bm25=True,
                       bm25_parts=4)
    s_clean = _cdc_round(rd.from_arrow(_view(B)), clean)

    # crash path: stage, then apply every store mutation "by hand" (as a
    # crashed _cdc_round would have), leaving map/manifest uncommitted
    manifest = json.load(open(os.path.join(crash, "manifest.json")))
    new_latest = rd.from_arrow(_view(B)).materialize()
    staged = _stage_round(new_latest, crash, manifest)
    pdir = os.path.join(crash, "_round_pending")
    gone_ids = pq.read_table(os.path.join(pdir, "gone.parquet"))[
        "doc_id"].to_pylist()
    newmap = pq.read_table(os.path.join(pdir, "newmap.parquet"))
    url2id = dict(zip(newmap["url"].to_pylist(),
                      newmap["doc_id"].to_pylist()))
    state = os.path.join(crash, "dedup_state")
    apply_removals(state, gone_ids)
    import ray

    from pttcrawler_ray.pipelines.cdc import _assign_ids

    inc = _latest_docs(new_latest).map_batches(
        _assign_ids, fn_kwargs={"ids_ref": ray.put(url2id)},
        batch_format="pyarrow")
    minhash_dedup_incremental(inc, state, threshold=0.7, num_perm=64,
                              bands=16, shingle_k=3)
    append_bm25_index(inc, os.path.join(crash, "bm25"),
                      op_id=f"cdc-round-{staged['round']}")

    # plus a TORN bm25 write from a second crash: stage the marker and
    # an orphan postings file — the round must auto-repair it
    from pttcrawler_ray.textops.bm25index import _stage_pending

    bdir = os.path.join(crash, "bm25")
    _stage_pending(bdir, "append", "postings")
    orphan = os.path.join(bdir, "postings", "part=0", "orphan.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    pq.write_table(pa.table({"term": ["x"], "doc_id": [10 ** 9],
                             "tf": [1], "dl": [1]}), orphan)

    # resume: must not double-apply anything
    s_resumed = _cdc_round(new_latest, crash)
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.join(bdir, "pending.json"))
    for k in ("added", "changed", "removed", "new_docs"):
        assert s_resumed[k] == s_clean[k], k
    assert _map_of(crash) == _map_of(clean)
    assert _keeper_ids(crash) == _keeper_ids(clean)
    bm = json.load(open(os.path.join(crash, "bm25", "meta.json")))
    bm_clean = json.load(open(os.path.join(clean, "bm25", "meta.json")))
    assert (bm["n_docs"], bm["n_tokens"]) == (bm_clean["n_docs"],
                                              bm_clean["n_tokens"])