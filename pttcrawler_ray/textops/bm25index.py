"""Persisted inverted index for BM25 — the write-once scale path of
:mod:`.retrieval` (the same split as ANN's one-shot :func:`~.similarity.knn_top1`
vs the persisted :func:`~.similarity.build_ivf_index` store).

:func:`bm25_topk` streams the WHOLE corpus twice per query set; fine for
one-off selection runs, wrong for a repeated query workload.  Here the
corpus is tokenized ONCE into a term-hash-partitioned postings store::

    <index_dir>/postings/part=<h>/   (term, doc_id, tf, dl)
    <index_dir>/meta.json            (n_docs, n_tokens, n_parts, version)

- ``part = blake2b-64(term) % n_parts`` — every posting of a term lives
  in exactly one hive partition, so a query reads ONLY the partitions
  its terms hash to (asserted via ``stats_out`` like the IVF store).
- postings are sorted by ``part`` before the partitioned write (the IVF
  lesson: unsorted, every block × partition pair becomes its own file).
- ``dl`` (doc token count) is DENORMALIZED onto each posting row, so
  scoring never joins back to a docs table.
- document frequencies need no sidecar: ``df(t)`` is the posting count
  of ``t``, counted from the same pruned read the scoring pass uses.

Exactness contract: identical results to :func:`~.retrieval.bm25_topk`
on the same corpus/queries.  Both plans floor each (doc, term)
contribution to int ppm BEFORE any summation, so the per-(query, doc)
score is an integer sum — associative and order-free — and the float
inputs (idf via ``math.log`` over the same integer df/N, ``avgdl`` =
the same integer division, the identical contribution op order) are
bit-equal.  Pinned by ``tests/test_textops.py`` (indexed == scan on two
partitionings) and the ``bm25_indexed_docs`` query, which shares
``bm25_docs``'s sequential oracle.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..util.hashing import hash_u64_many
from .analysis import _tokens_flat
from .retrieval import _query_terms, build_bm25_model

_INDEX_VERSION = 1

_EMPTY_TOPK = pa.table({
    "query_id": pa.array([], pa.int64()),
    "doc_id": pa.array([], pa.int64()),
    "score_ppm": pa.array([], pa.int64()),
})


def _write_meta(index_dir: str, meta: dict) -> None:
    """Atomic meta rewrite — temp + os.replace is the commit point."""
    path = os.path.join(index_dir, "meta.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)


def _load_meta(index_dir: str, *, allow_pending: bool = False) -> dict:
    """Load + validate the store meta: version must match
    _INDEX_VERSION (the store's invalidation key — a mismatched store
    must be rebuilt, never silently read), and an uncommitted
    append/remove (crash between the data write and the meta commit)
    blocks everything until :func:`repair_bm25_index`."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version") != _INDEX_VERSION:
        raise RuntimeError(
            f"bm25 index at {index_dir} has version {meta.get('version')} "
            f"!= {_INDEX_VERSION} — rebuild it with build_bm25_index")
    if not allow_pending and os.path.exists(
            os.path.join(index_dir, "pending.json")):
        raise RuntimeError(
            f"bm25 index at {index_dir} has an uncommitted write (crash "
            "mid-append/remove) — run repair_bm25_index first")
    return meta


def _read_deleted(index_dir: str) -> np.ndarray:
    """Sorted doc_ids on the delete list (bounded by churn between
    compactions)."""
    files = sorted(glob.glob(os.path.join(index_dir, "deleted",
                                          "*.parquet")))
    if not files:
        return np.array([], np.int64)
    import pyarrow.parquet as pq

    ids = np.concatenate([
        pq.read_table(f, columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False).astype(np.int64) for f in files])
    return np.unique(ids)


def _live_mask(doc: np.ndarray, del_ids: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(del_ids, doc)
    pos[pos == len(del_ids)] = 0
    return del_ids[pos] != doc


def repair_bm25_index(index_dir: str) -> dict:
    """Roll back an uncommitted append/remove: delete the data files the
    crashed attempt wrote (recorded in ``pending.json`` before any data
    write), clear the marker.  The caller re-runs the operation."""
    meta = _load_meta(index_dir, allow_pending=True)
    ppath = os.path.join(index_dir, "pending.json")
    if not os.path.exists(ppath):
        return meta
    with open(ppath) as f:
        pending = json.load(f)
    before = set(pending.get("files_before", []))
    sub = "deleted" if pending.get("op") == "remove" else "postings"
    pat = os.path.join(index_dir, sub, "**", "*.parquet")
    for f in glob.glob(pat, recursive=True):
        if f not in before:
            os.remove(f)
    os.remove(ppath)
    return meta


def _stage_pending(index_dir: str, op: str, sub: str) -> None:
    files = sorted(glob.glob(os.path.join(index_dir, sub, "**",
                                          "*.parquet"), recursive=True))
    tmp = os.path.join(index_dir, "pending.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"op": op, "files_before": files}, f)
    os.replace(tmp, os.path.join(index_dir, "pending.json"))


def _postings_batch(batch: pa.Table, *, id_col: str, text_col: str,
                    n_parts: int) -> pa.Table:
    """(part, term, doc_id, tf, dl) rows — one per (doc, term) pair of
    this batch; term hashing runs once per batch-distinct term."""
    flat, parents, counts = _tokens_flat(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) == 0:
        return pa.table({"part": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         id_col: pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64()),
                         "dl": pa.array([], pa.int64())})
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    v = len(vocab)
    uniq, tf = np.unique(parents * v + codes, return_counts=True)
    pdoc = uniq // v
    pterm = (uniq % v).astype(np.int64)
    part = (hash_u64_many(vocab.to_pylist())
            % np.uint64(n_parts)).astype(np.int64)
    return pa.table({
        "part": pa.array(part[pterm], pa.int64()),
        "term": vocab.take(pa.array(pterm)),
        id_col: pa.array(ids[pdoc], pa.int64()),
        "tf": pa.array(tf, pa.int64()),
        "dl": pa.array(counts[pdoc], pa.int64()),
    })


def build_bm25_index(docs_ds: "rd.Dataset", index_dir: str, *,
                     n_parts: int = 32, id_col: str = "doc_id",
                     text_col: str = "text") -> dict:
    """Build the postings store.  Two streaming passes over the corpus
    (stats + tokenize — the same count as ONE :func:`bm25_topk` call,
    paid once instead of per query set); the only shuffle is the sort
    by ``part`` feeding the partitioned write.  Returns the meta dict.
    An existing store at ``index_dir`` is REPLACED (a partitioned write
    into a non-empty hive layout would silently append duplicate
    postings — that behavior is reserved for :func:`append_bm25_index`)."""
    import shutil

    from .retrieval import corpus_bm25_stats

    for sub in ("postings", "deleted"):
        shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    for f in ("meta.json", "pending.json"):
        try:
            os.remove(os.path.join(index_dir, f))
        except FileNotFoundError:
            pass
    stats = corpus_bm25_stats(docs_ds, [], text_col=text_col)
    postings = docs_ds.map_batches(
        _postings_batch,
        fn_kwargs={"id_col": id_col, "text_col": text_col,
                   "n_parts": n_parts},
        batch_format="pyarrow")
    postings.sort("part").write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["part"])
    meta = {"n_docs": stats["n_docs"], "n_tokens": stats["n_tokens"],
            "n_parts": n_parts, "id_col": id_col, "text_col": text_col,
            "version": _INDEX_VERSION}
    _write_meta(index_dir, meta)
    return meta


def append_bm25_index(docs_ds: "rd.Dataset", index_dir: str,
                      op_id: "str | None" = None) -> dict:
    """Append an increment of NEW documents (ids must not repeat across
    increments — the same contract as incremental dedup) to an existing
    store: tokenize against the persisted ``n_parts``, sort by part,
    write new files into the same hive layout, and advance the meta
    counts.  df is computed at query time from the pruned read, so the
    very next query scores EXACTLY like a from-scratch rebuild over the
    union corpus (pinned by test).  File count grows by ≤ ``n_parts``
    per increment (the sorted-write bound).

    Crash-safe: ``pending.json`` (listing the pre-append postings
    files) is staged before any data write and cleared only after the
    atomic meta commit — a crash in between leaves a store that refuses
    reads until :func:`repair_bm25_index` rolls the orphans back, never
    one that silently scores with df/N out of sync.

    ``op_id``: optional idempotency key — when the store meta's
    ``last_op`` already equals it, the append is a committed replay and
    returns untouched (the key rides the atomic meta commit, so a
    caller resuming a crashed multi-store transaction re-calls
    safely)."""
    from .retrieval import corpus_bm25_stats

    meta = _load_meta(index_dir)
    if op_id is not None and meta.get("last_op") == op_id:
        return meta
    text_col = meta.get("text_col", "text")   # the BUILD's text column
    stats = corpus_bm25_stats(docs_ds, [], text_col=text_col)
    _stage_pending(index_dir, "append", "postings")
    postings = docs_ds.map_batches(
        _postings_batch,
        fn_kwargs={"id_col": meta.get("id_col", "doc_id"),
                   "text_col": text_col, "n_parts": meta["n_parts"]},
        batch_format="pyarrow")
    postings.sort("part").write_parquet(
        os.path.join(index_dir, "postings"), partition_cols=["part"])
    meta["n_docs"] += stats["n_docs"]
    meta["n_tokens"] += stats["n_tokens"]
    if op_id is not None:
        meta["last_op"] = op_id
    _write_meta(index_dir, meta)
    os.remove(os.path.join(index_dir, "pending.json"))
    return meta


def remove_from_bm25_index(index_dir: str, doc_ids) -> dict:
    """CDC deletes: drop documents from the index — the ``removed`` side
    of :func:`~..pipelines.diff.diff_crawls` (a ``changed`` url =
    remove old id + append the new doc).  The doc_ids land on a
    ``deleted/`` list honored at query time (both the df pass and the
    scoring pass skip their postings), and the meta N / total-token
    counts are adjusted by ONE streaming scan of the store for the
    removed ids' denormalized ``dl`` — so the very next query scores
    EXACTLY like a rebuild over the surviving corpus (idf/avgdl
    included; pinned by test).  :func:`compact_bm25_index` applies the
    deletes physically.

    Ids with no postings are treated as absent (no meta adjustment) —
    zero-token docs are invisible to the index; the crawl CDC feed
    (``docs_from_crawl``) never emits them.  Crash-safe via the same
    pending-marker protocol as append."""
    meta = _load_meta(index_dir)
    id_col = meta.get("id_col", "doc_id")
    already = _read_deleted(index_dir)
    ids = np.setdiff1d(np.asarray(sorted({int(i) for i in doc_ids}),
                                  np.int64), already)
    if not len(ids):
        return meta
    files = glob.glob(os.path.join(index_dir, "postings", "part=*",
                                   "*.parquet"))
    n_docs_rm = n_tokens_rm = 0
    if files:
        hits = rd.read_parquet(
            files, columns=[id_col, "dl"],
            filter=pc.field(id_col).isin(ids.tolist())).map_batches(
            lambda t: pa.table({
                id_col: t[id_col].cast(pa.int64()),
                "dl": t["dl"].cast(pa.int64())}),
            batch_format="pyarrow").to_pandas()
        if len(hits):
            per_doc = hits.drop_duplicates(id_col)
            n_docs_rm = len(per_doc)
            n_tokens_rm = int(per_doc["dl"].sum())
    _stage_pending(index_dir, "remove", "deleted")
    ddir = os.path.join(index_dir, "deleted")
    os.makedirs(ddir, exist_ok=True)
    import pyarrow.parquet as pq

    k = int(meta.get("removal_batches", 0))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}),
                   os.path.join(ddir, f"del-{k}.parquet"))
    meta["n_docs"] -= n_docs_rm
    meta["n_tokens"] -= n_tokens_rm
    meta["removal_batches"] = k + 1
    _write_meta(index_dir, meta)
    os.remove(os.path.join(index_dir, "pending.json"))
    return meta


def compact_bm25_index(index_dir: str) -> dict:
    """Apply the delete list physically and merge per-increment files:
    rewrite the postings store without the deleted docs' rows (part is
    recomputed from the term hash), then clear ``deleted/``.  Meta is
    already delete-adjusted, so this changes no query result; a crash
    after the atomic postings swap merely leaves a no-op delete list."""
    import shutil

    meta = _load_meta(index_dir)
    id_col = meta.get("id_col", "doc_id")
    del_ids = _read_deleted(index_dir)
    pdir = os.path.join(index_dir, "postings")
    files = glob.glob(os.path.join(pdir, "part=*", "*.parquet"))
    if not files:
        shutil.rmtree(os.path.join(index_dir, "deleted"),
                      ignore_errors=True)
        return meta

    def live_rows(t: pa.Table) -> pa.Table:
        part = (hash_u64_many(t["term"].to_pylist())
                % np.uint64(meta["n_parts"])).astype(np.int64)
        t = t.append_column("part", pa.array(part, pa.int64()))
        if len(del_ids):
            doc = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.filter(pa.array(_live_mask(doc, del_ids)))
        return t

    tmp = os.path.join(index_dir, "_postings_compact")
    shutil.rmtree(tmp, ignore_errors=True)
    rd.read_parquet(files, columns=["term", id_col, "tf", "dl"]) \
        .map_batches(live_rows, batch_format="pyarrow") \
        .sort("part").write_parquet(tmp, partition_cols=["part"])
    shutil.rmtree(pdir)
    os.replace(tmp, pdir)
    shutil.rmtree(os.path.join(index_dir, "deleted"), ignore_errors=True)
    return meta


def _df_batch(batch: pa.Table, *, tset: pa.Array, n_terms: int,
              id_col: str = "doc_id",
              del_ids: "np.ndarray | None" = None) -> pa.Table:
    idx = pc.fill_null(pc.index_in(batch["term"], value_set=tset), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    if del_ids is not None and len(del_ids):
        doc = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = idx[_live_mask(doc, del_ids)]
    df = np.bincount(idx[idx >= 0], minlength=n_terms).astype(np.int64)
    return pa.table({"df": pa.array([df.tolist()], pa.list_(pa.int64()))})


def _score_postings_batch(batch: pa.Table, *, tset: pa.Array,
                          mat: np.ndarray, qids: np.ndarray, model: dict,
                          id_col: str,
                          del_ids: "np.ndarray | None" = None) -> pa.Table:
    """Pruned postings rows → per-(query, doc) PARTIAL integer score
    rows with the mixed uint64 shuffle key (the repo-standard
    coarse-partition shape, never a native two-key groupby)."""
    idx = pc.fill_null(pc.index_in(batch["term"], value_set=tset), -1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    hit = idx >= 0
    if del_ids is not None and len(del_ids):
        hit &= _live_mask(
            batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            del_ids)
    ti = idx[hit]
    tf = batch["tf"].to_numpy(zero_copy_only=False)[hit].astype(np.float64)
    dl = batch["dl"].to_numpy(zero_copy_only=False)[hit].astype(np.float64)
    doc = batch[id_col].to_numpy(zero_copy_only=False)[hit].astype(np.int64)
    k1, b = model["k1"], model["b"]
    # op order identical to retrieval._score_batch (the ppm contract)
    bb = k1 * (1.0 - b + b * dl / model["avgdl"])
    contrib = model["idf"][ti] * ((tf * (k1 + 1.0)) / (tf + bb))
    ppm = np.floor(contrib * 1e6).astype(np.int64)

    out_q, out_d, out_s = [], [], []
    for qi in range(len(qids)):
        m = mat[qi, ti] > 0
        if m.any():
            out_q.append(np.full(int(m.sum()), qids[qi], np.int64))
            out_d.append(doc[m])
            out_s.append(ppm[m])
    if not out_q:
        return pa.table({"bkey": pa.array([], pa.uint64()),
                         "query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "score_ppm": pa.array([], pa.int64())})
    q = np.concatenate(out_q)
    d = np.concatenate(out_d)
    s = np.concatenate(out_s)
    # in-batch partial sum per (query, doc) before the shuffle
    order = np.lexsort((d, q))
    q, d, s = q[order], d[order], s[order]
    first = np.r_[True, (q[1:] != q[:-1]) | (d[1:] != d[:-1])]
    starts = np.flatnonzero(first)
    q, d = q[starts], d[starts]
    s = np.add.reduceat(s, starts)
    from .dedup import _mixed_bucket_key

    part = pa.table({"a": pa.array(q.view(np.uint64), pa.uint64()),
                     "b": pa.array(d.view(np.uint64), pa.uint64())})
    return pa.table({
        "bkey": pa.array(_mixed_bucket_key(part, ["a", "b"]), pa.uint64()),
        "query_id": pa.array(q, pa.int64()),
        id_col: pa.array(d, pa.int64()),
        "score_ppm": pa.array(s, pa.int64()),
    })


def _make_pair_sum(id_col: str):
    def pair_sum(g: pa.Table) -> pa.Table:
        """Total score per REAL (query, doc) pair — bkey only
        co-partitions — then the scan plan's score>0 filter (every
        partial of a pair is in this partition, so the filter is
        final)."""
        q = g["query_id"].to_numpy(zero_copy_only=False)
        d = g[id_col].to_numpy(zero_copy_only=False)
        s = g["score_ppm"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, q))
        q, d, s = q[order], d[order], s[order]
        first = np.r_[True, (q[1:] != q[:-1]) | (d[1:] != d[:-1])]
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(s, starts)
        keep = tot > 0
        return pa.table({"query_id": pa.array(q[starts][keep], pa.int64()),
                         id_col: pa.array(d[starts][keep], pa.int64()),
                         "score_ppm": pa.array(tot[keep], pa.int64())})
    return pair_sum


def bm25_topk_indexed(index_dir: str, queries: "list[tuple[int, str]]", *,
                      topk: int = 10, k1: float = 1.2, b: float = 0.75,
                      stats_out: "dict | None" = None):
    """Top-``topk`` docs per query over a :func:`build_bm25_index`
    store, reading ONLY the partitions the query terms hash to —
    identical rows to :func:`~.retrieval.bm25_topk` on the indexed
    corpus.  ``stats_out`` receives ``{parts_total, parts_probed,
    files_total, files_read}`` so callers/tests can assert the pruning
    really happened.  Returns a Dataset of (query_id, doc_id,
    score_ppm) rows."""
    from ..util.rayops import grouped_topk, partitioned_map_groups

    meta = _load_meta(index_dir)
    del_ids = _read_deleted(index_dir)
    id_col = meta.get("id_col", "doc_id")
    terms, mat, qids = _query_terms(queries)
    wanted = sorted({int(h) for h in
                     hash_u64_many(terms) % np.uint64(meta["n_parts"])}) \
        if terms else []
    dirs = [p for c in wanted
            if os.path.isdir(p := os.path.join(index_dir, "postings",
                                               f"part={c}"))]
    probed_files = sorted(f for p in dirs
                          for f in glob.glob(os.path.join(p, "*.parquet")))
    if stats_out is not None:
        all_files = glob.glob(os.path.join(index_dir, "postings",
                                           "part=*", "*.parquet"))
        stats_out.update({"parts_total": meta["n_parts"],
                          "parts_probed": len(wanted),
                          "files_total": len(all_files),
                          "files_read": len(probed_files)})
    if not probed_files:
        return rd.from_arrow(_EMPTY_TOPK.rename_columns(
            ["query_id", id_col, "score_ppm"]))
    tset = pa.array(terms, pa.string())

    # row filter pushed INTO the read: parquet row-group stats (min/max
    # term within the sorted-by-part files) skip groups with no query
    # term, on top of the partition pruning
    row_filter = pc.field("term").isin(terms)

    # pass 1 (narrow): df per query term from the pruned partitions
    # (deleted docs' postings excluded — df must count LIVE docs only)
    df_cols = ["term"] if not len(del_ids) else ["term", id_col]
    sub_terms = rd.read_parquet(probed_files, columns=df_cols,
                                filter=row_filter)
    df = np.zeros(len(terms), np.int64)
    dfp = sub_terms.map_batches(
        _df_batch, fn_kwargs={"tset": tset, "n_terms": len(terms),
                              "id_col": id_col, "del_ids": del_ids},
        batch_format="pyarrow").to_pandas()
    if "df" in dfp.columns:   # all-pruned read → 0 blocks, no columns
        for row in dfp["df"]:
            df += np.asarray(row, np.int64)
    if int(df.sum()) == 0:   # no query term has any posting: stable
        return rd.from_arrow(_EMPTY_TOPK.rename_columns(  # empty schema
            ["query_id", id_col, "score_ppm"]))
    model = build_bm25_model(
        {"n_docs": meta["n_docs"], "n_tokens": meta["n_tokens"], "df": df},
        terms, k1=k1, b=b)

    # pass 2: score the pruned postings, ONE coarse pair-sum shuffle
    scored = rd.read_parquet(
        probed_files, columns=["term", id_col, "tf", "dl"],
        filter=row_filter).map_batches(
        _score_postings_batch,
        fn_kwargs={"tset": tset, "mat": mat, "qids": qids,
                   "model": model, "id_col": id_col, "del_ids": del_ids},
        batch_format="pyarrow")
    pairs = partitioned_map_groups(scored, "bkey", _make_pair_sum(id_col),
                                   n_parts=8)
    return grouped_topk(pairs, "query_id",
                        [("score_ppm", "descending"), (id_col, "ascending")],
                        k=topk, n_parts=max(1, min(len(queries) // 4, 64)))
