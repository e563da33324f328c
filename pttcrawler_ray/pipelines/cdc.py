"""Continuous-crawl CDC driver — crawl → diff → dedup/index maintenance
in ONE call, with persisted url↔doc_id state.

:mod:`.diff` classifies a re-crawl's delta and
:mod:`..textops.incremental` / :mod:`..textops.bm25index` consume adds
and deletes exactly; this module packages the composition the two sides
document (and tests pin) behind a work-dir state store:

- :func:`cdc_init` bootstraps from a first crawl: every parse-successful
  non-empty url gets a dense int64 ``doc_id`` (distributed
  :func:`~..textops.sampling.shuffle_rank` over the url hash — no
  payload sort, nothing corpus-sized on the driver), the docs feed
  increment 0 of a minhash-dedup store (and optionally a BM25 index
  build), and the crawl's latest view is materialized as the diff base.
- :func:`cdc_update` ingests a re-crawl: diff against the stored base;
  ``removed`` + superseded ``changed`` urls resolve to doc_ids via the
  url map and apply as deletes (``apply_removals`` /
  ``remove_from_bm25_index``); ``added`` + ``changed`` docs get fresh
  monotone ids (``next_id`` + rank within the churn-bounded delta) and
  feed ``minhash_dedup_incremental`` / ``append_bm25_index``; then the
  url map, diff base, and manifest commit.

Per-round driver state is bounded by the CHURN (the delta url list),
never the corpus.  Equality contract (pinned by tests/test_cdc_dedup.py
and the store-level tests): after any number of rounds,
``current_keepers(work_dir/dedup_state)`` equals a from-scratch batch
:func:`~..textops.dedup.minhash_dedup` over the final corpus under the
same id assignment, and an indexed BM25 query equals a rebuild over the
final corpus.

Crash safety: the dedup/BM25 stores carry their own commit protocols;
the round itself stages its computed delta under ``_round_pending/``
BEFORE mutating anything, re-applies idempotently on re-entry (store
deletes are natural no-ops; the increment/append re-run guards are the
stores' own committed counters), and commits map/base/manifest last —
``manifest.json``'s round counter is the commit point.

Layout under ``work_dir``::

    manifest.json        {next_id, rounds, dedup/bm25 params}
    url_map/             (url, doc_id) parquet — live urls only
    prev_latest/         materialized latest view of the last crawl
    dedup_state/         minhash_dedup_incremental store
    bm25/                optional BM25 index store
    _round_pending/      staged delta of an in-flight round

Note: doc_ids derive from blake2b-64 url hashes; two distinct urls
colliding (2^-64 per pair) would alias one rank — detectable as a
duplicate id in the map, astronomically unlikely at any corpus size.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

_MANIFEST = "manifest.json"
_PENDING = "_round_pending"


def _latest_docs(latest_ds: "rd.Dataset") -> "rd.Dataset":
    """(url, text) of parse-successful non-empty docs — the
    docs_from_crawl row rule (error rows and empty bodies dropped)."""

    def to_docs(t: pa.Table) -> pa.Table:
        body = pc.coalesce(t["content"], pa.scalar("", pa.string()))
        sub = t.filter(pc.and_(pc.is_null(t["error"]),
                               pc.greater(pc.utf8_length(body), 0)))
        return pa.table({"url": sub["url"], "text": sub["content"]})

    return latest_ds.map_batches(to_docs, batch_format="pyarrow")


def _add_url_hash(t: pa.Table) -> pa.Table:
    from ..util.hashing import hash_u64_many

    uh = hash_u64_many(t["url"].to_pylist()).view(np.int64)
    return t.append_column("uh", pa.array(uh, pa.int64()))


def _assign_ids(t: pa.Table, *, ids_ref) -> pa.Table:
    """(url, text) → (doc_id, text) for urls in the broadcast
    churn-bounded url→id dict; other urls drop (vectorized membership;
    the Python dict walk is delta-sized, not corpus-sized)."""
    from ..util.rayops import bcast_get

    url2id = bcast_get(ids_ref)
    vs = pa.array(sorted(url2id), pa.string())
    keep = pc.fill_null(pc.is_in(t["url"], value_set=vs), False)
    sub = t.filter(keep)
    ids = [url2id[u] for u in sub["url"].to_pylist()]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": sub["text"]})


def _write_replace(ds: "rd.Dataset", dest: str) -> None:
    tmp = dest + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    shutil.rmtree(dest, ignore_errors=True)
    os.replace(tmp, dest)


def _dedup_kw(manifest: dict) -> dict:
    return {k: manifest[k]
            for k in ("threshold", "num_perm", "bands", "shingle_k")}


def cdc_init(out_dir: str, work_dir: str, *, threshold: float = 0.7,
             num_perm: int = 128, bands: int = 16, shingle_k: int = 3,
             bm25: bool = False, bm25_parts: int = 32) -> dict:
    """Bootstrap the CDC store from a first crawl output dir."""
    from .crawl import latest_articles

    return _cdc_bootstrap(latest_articles(out_dir), work_dir,
                          threshold=threshold, num_perm=num_perm,
                          bands=bands, shingle_k=shingle_k, bm25=bm25,
                          bm25_parts=bm25_parts)


def _cdc_bootstrap(latest_ds: "rd.Dataset", work_dir: str, *,
                   threshold: float, num_perm: int, bands: int,
                   shingle_k: int, bm25: bool, bm25_parts: int) -> dict:
    from ..textops.incremental import minhash_dedup_incremental
    from ..textops.sampling import shuffle_rank
    from ..util.rayops import bucketed_lookup_join, scale_parts

    mpath = os.path.join(work_dir, _MANIFEST)
    if os.path.exists(mpath):
        raise FileExistsError(f"{work_dir} is already a CDC store — use "
                              "cdc_update, or wipe it to re-init")
    # a crashed previous init leaves partial state: wipe and restart
    for sub in ("url_map", "prev_latest", "dedup_state", "bm25", _PENDING):
        shutil.rmtree(os.path.join(work_dir, sub), ignore_errors=True)
    os.makedirs(work_dir, exist_ok=True)

    latest = latest_ds.materialize()
    docs = _latest_docs(latest).map_batches(
        _add_url_hash, batch_format="pyarrow").materialize()
    n_docs = docs.count()
    n_buckets = scale_parts(max(n_docs, 1) * 2)
    ranks = shuffle_rank(docs.select_columns(["uh"]), key="uh",
                         approx_rows=n_docs)
    with_ids = bucketed_lookup_join(
        docs, ranks, "uh", "uh", "shuffle_rank", "doc_id", pa.int64(),
        carry=[("url", pa.string()), ("text", pa.string())],
        n_buckets=n_buckets).materialize()

    state = os.path.join(work_dir, "dedup_state")
    kept = minhash_dedup_incremental(
        with_ids.select_columns(["doc_id", "text"]), state,
        threshold=threshold, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k)
    n_kept = kept.count()
    if bm25:
        from ..textops.bm25index import build_bm25_index

        build_bm25_index(with_ids.select_columns(["doc_id", "text"]),
                         os.path.join(work_dir, "bm25"),
                         n_parts=bm25_parts)
    _write_replace(with_ids.select_columns(["url", "doc_id"]),
                   os.path.join(work_dir, "url_map"))
    _write_replace(latest, os.path.join(work_dir, "prev_latest"))
    manifest = {"next_id": n_docs, "rounds": 1, "threshold": threshold,
                "num_perm": num_perm, "bands": bands,
                "shingle_k": shingle_k, "bm25": bm25}
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    return {"round": 0, "docs": n_docs, "kept": n_kept,
            "added": n_docs, "changed": 0, "removed": 0}


def cdc_update(out_dir: str, work_dir: str) -> dict:
    """Ingest a re-crawl output dir as one CDC round."""
    from .crawl import latest_articles

    return _cdc_round(latest_articles(out_dir), work_dir)


def _cdc_round(new_latest_ds: "rd.Dataset", work_dir: str) -> dict:
    from ..util.rayops import read_parquet_clean

    mpath = os.path.join(work_dir, _MANIFEST)
    with open(mpath) as f:
        manifest = json.load(f)
    new_latest = new_latest_ds.materialize()
    pdir = os.path.join(work_dir, _PENDING)
    meta_path = os.path.join(pdir, "meta.json")

    if os.path.exists(meta_path):
        with open(meta_path) as f:
            staged = json.load(f)
        if staged["round"] != manifest["rounds"]:
            raise RuntimeError(
                f"stale pending round {staged['round']} != "
                f"{manifest['rounds']} — remove {pdir} to discard")
    else:
        staged = _stage_round(new_latest, work_dir, manifest)

    gone = pq.read_table(os.path.join(pdir, "gone.parquet"))
    newmap = pq.read_table(os.path.join(pdir, "newmap.parquet"))
    gone_ids = [int(x) for x in gone["doc_id"].to_pylist()]
    url2id = {u: int(i) for u, i in zip(newmap["url"].to_pylist(),
                                        newmap["doc_id"].to_pylist())}

    # 1. deletes (idempotent: both stores setdiff against their lists)
    from ..textops.incremental import (apply_removals,
                                       minhash_dedup_incremental)

    state = os.path.join(work_dir, "dedup_state")
    resurrected = apply_removals(state, gone_ids)["doc_id"].to_pylist()
    if manifest.get("bm25"):
        from ..textops.bm25index import (append_bm25_index,
                                         remove_from_bm25_index,
                                         repair_bm25_index)

        bdir = os.path.join(work_dir, "bm25")
        if os.path.exists(os.path.join(bdir, "pending.json")):
            # only our own crashed round can have staged this store —
            # roll the torn write back and re-apply below
            repair_bm25_index(bdir)
        remove_from_bm25_index(bdir, gone_ids)

    # 2. increment (skip when a crashed attempt already committed it —
    #    the stores' own counters are the resume guards)
    n_kept = 0
    if url2id:
        with open(os.path.join(state, "manifest.json")) as f:
            applied = json.load(f)["max_id"] >= staged["max_new_id"]
        inc_ds = _latest_docs(new_latest).map_batches(
            _assign_ids, fn_kwargs={"ids_ref": ray.put(url2id)},
            batch_format="pyarrow")
        if not applied:
            n_kept = minhash_dedup_incremental(
                inc_ds, state, **_dedup_kw(manifest)).count()
        if manifest.get("bm25"):
            # op_id makes the append an exact no-op on crash-resume
            append_bm25_index(inc_ds, bdir,
                              op_id=f"cdc-round-{staged['round']}")

    # 3. commit: url map rewrite, diff base, manifest (the commit point)
    map_dir = os.path.join(work_dir, "url_map")
    gone_urls = set(staged["gone_urls"])
    old_map = read_parquet_clean(map_dir)
    if gone_urls:
        gset = pa.array(sorted(gone_urls), pa.string())
        old_map = old_map.map_batches(
            lambda t, vs=gset: t.filter(
                pc.invert(pc.fill_null(pc.is_in(t["url"], value_set=vs),
                                       False))),
            batch_format="pyarrow")
    new_rows = rd.from_arrow(newmap) if url2id else None
    _write_replace(old_map.union(new_rows) if new_rows else old_map,
                   map_dir)
    _write_replace(new_latest, os.path.join(work_dir, "prev_latest"))
    manifest["next_id"] = staged["next_id_after"]
    manifest["rounds"] += 1
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(pdir, ignore_errors=True)
    return {"round": staged["round"], "added": staged["n_added"],
            "changed": staged["n_changed"], "removed": staged["n_removed"],
            "new_docs": len(url2id), "kept": n_kept,
            "removed_ids": len(gone_ids), "resurrected": resurrected}


def _stage_round(new_latest: "rd.Dataset", work_dir: str,
                 manifest: dict) -> dict:
    """Compute and persist the round's delta from the PRE-round state
    (url map + prev_latest untouched): gone ids, fresh-id assignments,
    resume guards.  All churn-bounded."""
    import pyarrow.dataset as pads

    from ..util.rayops import read_parquet_clean
    from .diff import diff_latest

    prev = read_parquet_clean(os.path.join(work_dir, "prev_latest"))
    diff = diff_latest(prev, new_latest).to_pandas()
    status = dict(zip(diff["url"], diff["status"])) if len(diff) else {}
    gone_urls = sorted(u for u, s in status.items()
                       if s in ("removed", "changed"))
    delta_urls = {u for u, s in status.items()
                  if s in ("added", "changed")}

    gone_tab = pa.table({"doc_id": pa.array([], pa.int64())})
    if gone_urls:
        gone_tab = pads.dataset(
            os.path.join(work_dir, "url_map")).to_table(
            columns=["doc_id"],
            filter=pc.field("url").isin(gone_urls))
    # delta docs actually present in the new corpus (empty/error urls in
    # the diff produce no doc): churn-bounded url collect
    new_doc_urls: list = []
    if delta_urls:
        vs = pa.array(sorted(delta_urls), pa.string())
        hits = _latest_docs(new_latest).map_batches(
            lambda t: t.select(["url"]).filter(
                pc.fill_null(pc.is_in(t["url"], value_set=vs), False)),
            batch_format="pyarrow").to_pandas()
        new_doc_urls = sorted(hits["url"]) if len(hits) else []
    next_id = int(manifest["next_id"])
    newmap = pa.table({
        "url": pa.array(new_doc_urls, pa.string()),
        "doc_id": pa.array(range(next_id, next_id + len(new_doc_urls)),
                           pa.int64())})

    pdir = os.path.join(work_dir, _PENDING)
    shutil.rmtree(pdir, ignore_errors=True)
    os.makedirs(pdir)
    pq.write_table(gone_tab, os.path.join(pdir, "gone.parquet"))
    pq.write_table(newmap, os.path.join(pdir, "newmap.parquet"))
    staged = {"round": manifest["rounds"],
              "gone_urls": gone_urls,
              "n_added": int((diff["status"] == "added").sum())
              if len(diff) else 0,
              "n_changed": int((diff["status"] == "changed").sum())
              if len(diff) else 0,
              "n_removed": int((diff["status"] == "removed").sum())
              if len(diff) else 0,
              "max_new_id": next_id + len(new_doc_urls) - 1,
              "next_id_after": next_id + len(new_doc_urls)}
    tmp = os.path.join(pdir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(staged, f)
    os.replace(tmp, os.path.join(pdir, "meta.json"))
    return staged
