"""Incremental MinHash dedup — the continuous-crawl form.

A 100-TB pipeline doesn't re-dedup the whole corpus per crawl round: it
dedups each INCREMENT against (a) itself and (b) a persisted state store
of every document seen so far.  The store holds two narrow tables under
``state_dir``:

- ``bands/``: (band_id, band_hash, doc_id) LSH rows — ~20 B × bands/doc;
- ``shingles/``: (doc_id, shingles list<uint64>) — the exact-verify side,
  ~1 KB/doc (≈1% of corpus size), needed so cross-increment candidate
  pairs get the SAME exact-Jaccard verification as the batch path.

Both tables keep ALL seen docs (kept AND dropped): a new doc that
near-dups a previously-dropped doc must still join that component (the
full-run connected-components semantics — transitivity through dropped
docs).

Semantics (append-only): previously kept docs stay kept; a new doc is
dropped iff its verified-pair component contains any smaller doc_id
(older increment or earlier-id in its own increment).  With doc_ids
monotonically increasing across increments — enforced via the store
manifest — this equals a from-scratch :func:`minhash_dedup` over the
union, EXCEPT when one new doc bridges two previously-separate old
components: the batch run would retro-drop one of the two old keepers,
and an incremental system cannot un-emit a doc.  For that case the
store tracks per-doc component roots (``comps/``: (doc_id, root) rows,
appended only for docs whose root differs from themselves; roots only
ever DECREASE, so min-per-doc = newest) and each increment emits the
retro-dropped old keepers as TOMBSTONES under ``retro/inc=N`` —
downstream consumers apply them the way they would a CDC delete.  With
tombstones applied, the kept set equals the from-scratch batch run
exactly, bridging included (pinned by test).  Read them back with
:func:`read_retro_drops`.

Per-increment cost: banding + shingling of the increment, ONE bloom-
filtered scan of the old bands store (only buckets colliding with the
increment survive the filter), and candidate-sized joins — never a
rescan of old text.

CDC deletes (the consumer side of :func:`..pipelines.diff.diff_crawls`):
:func:`apply_removals` ingests removed doc_ids — scan-time delete list +
candidate-bounded component recompute emitting ``resurrected/`` records;
:func:`compact_state` applies the deletes physically;
:func:`current_keepers` is the store's authoritative kept set and equals
a from-scratch batch run over the surviving corpus (pinned by the
crawl → diff → incremental composed test in tests/test_cdc_dedup.py).

Degenerate-bucket caveat (discovered by the round-5 20k-crawl soak,
tools/soak_cdc_driver.py): the batch-equality contract is EXACT only
while no LSH bucket exceeds ``dedup.MAX_BUCKET_DOCS`` anywhere in the
store's history.  The cap keeps each bucket's 256 smallest ids, and
that window is history-dependent: removing low-id docs slides a
from-scratch run's window up, creating pairs the incremental history
never generated.  The divergence is structurally ONE-SIDED — ids are
monotone, so later additions never displace earlier docs from a cap
window, and removals only ADD pairs to the batch side — hence the
incremental kept set is a SUPERSET of the batch kept set (it never
over-drops), and every excess keeper is batch-dominated by a smaller
id.  A real pipeline layers exact/paragraph dedup before MinHash, which
collapses such boilerplate families below the cap.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..util.rayops import normalize_blocks, read_parquet_clean
from .dedup import (_anti_join_ids, _candidate_pairs, _dedupe_pairs,
                    _mixed_bucket_key, _minhash_bands_batch, _scale_parts,
                    _shingle_hashes, _verify_jaccard_joined,
                    connected_components)


def _all_shingles_batch(batch: pa.Table, *, shingle_k: int) -> pa.Table:
    """(doc_id, shingles) for EVERY row — the increment's verify-side
    rows, persisted to the store (unlike the candidate-only variants in
    dedup.py)."""
    sh = [_shingle_hashes(t, shingle_k) for t in batch["text"].to_pylist()]
    return pa.table({
        "doc_id": batch["doc_id"].cast(pa.int64()),
        "shingles": pa.array([s.tolist() for s in sh], pa.list_(pa.uint64())),
    })


def _bloom_of_keys(ds: "rd.Dataset", key_fn, capacity_hint: int):
    """Stream a Dataset through the driver ONCE into a BloomFilter
    (driver memory = filter bits, the _verify_jaccard_joined pattern)."""
    from ..state.bloom import BloomFilter

    bloom = BloomFilter(capacity=max(capacity_hint, 1024))
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        bloom.add_many(key_fn(b))
    return bloom


def _filter_bands_bloom(batch: pa.Table, *, bloom_ref) -> pa.Table:
    from ..state.bloom import BloomFilter
    from .dedup import _bcast_get

    bloom = _bcast_get(bloom_ref, transform=BloomFilter.restore)
    keys = _mixed_bucket_key(batch, ["band_id", "band_hash"])
    return batch.filter(pa.array(bloom.contains_many(keys)))


# canonical store schemas; reads prune to these so the hive-parsed
# ``inc`` partition column never rides along (it is directory metadata,
# not data — and a string column per band row is real bytes at scale)
_BAND_COLS = ["band_id", "band_hash", "doc_id"]
_SHINGLE_COLS = ["doc_id", "shingles"]
_COMP_COLS = ["doc_id", "root"]


def _resolve_roots(state_dir: str, ids) -> dict:
    """Current component root for each id: chase (doc_id → root) rows in
    the ``comps/`` store until fixpoint.  A doc with no row is its own
    root (keepers and singletons never get a row).  Roots only decrease
    over time, so min-per-doc picks the newest row and chains are
    acyclic.  Cost: one ``isin``-filtered store scan per chain level —
    candidate-sized, and path-compression rows written at every merge
    keep chains short."""
    ids = [int(i) for i in ids]
    comps_dir = os.path.join(state_dir, "comps")
    if not ids or not os.path.isdir(comps_dir):
        return {i: i for i in ids}
    import pyarrow.dataset as pads

    dset = pads.dataset(comps_dir)
    mapping: dict[int, int] = {}
    frontier, seen = set(ids), set(ids)
    while frontier:
        t = dset.to_table(columns=_COMP_COLS,
                          filter=pc.field("doc_id").isin(list(frontier)))
        frontier = set()
        if t.num_rows == 0:
            break
        import pandas as pd

        newest = t.to_pandas().groupby("doc_id")["root"].min()
        for d, r in newest.items():
            mapping[int(d)] = int(r)
            if int(r) not in seen:
                seen.add(int(r))
                frontier.add(int(r))

    def final(x: int) -> int:
        path = []
        while mapping.get(x, x) != x:
            path.append(x)
            x = mapping[x]
        for p in path:
            mapping[p] = x
        return x

    return {i: final(i) for i in ids}


def _component_bookkeeping(comp_df, min_new: int, state_dir: str):
    """From this increment's component table (node, comp — comp = min
    node id), derive (a) the ``comps/`` rows to append (doc → final
    root, with path compression) and (b) the retro-drop tombstones: old
    roots that stop being keepers because a new doc bridged their
    component into one with a smaller root.  All work is candidate-
    bounded (nodes of this increment's non-trivial components)."""
    import pandas as pd

    old = comp_df[comp_df["node"] < min_new]
    rows_doc, rows_root, retro = [], [], []
    final_root: dict[int, int] = {}
    if len(old):
        roots_map = _resolve_roots(state_dir, old["node"].unique())
        old_roots = old["node"].map(roots_map)
        for c, rs in pd.Series(old_roots.values,
                               index=old["comp"].values).groupby(level=0):
            uniq = sorted(set(int(r) for r in rs))
            m = uniq[0]
            final_root[int(c)] = m
            for r in uniq[1:]:
                retro.append(r)          # was a keeper, now merged under m
                rows_doc.append(r)
                rows_root.append(m)
        # path compression: every old candidate points straight at the
        # merged root so future resolutions stay one store scan deep
        fr = old["comp"].map(final_root).to_numpy()
        stale = old_roots.to_numpy() != fr
        rows_doc.extend(int(x) for x in old["node"].to_numpy()[stale])
        rows_root.extend(int(x) for x in fr[stale])
    newd = comp_df[(comp_df["node"] >= min_new)
                   & (comp_df["node"] != comp_df["comp"])]
    if len(newd):
        fr = newd["comp"].map(lambda c: final_root.get(int(c), int(c)))
        rows_doc.extend(int(x) for x in newd["node"])
        rows_root.extend(int(x) for x in fr)
    rows = pd.DataFrame({"doc_id": rows_doc, "root": rows_root}
                        ).drop_duplicates()
    return (pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                      "root": pa.array(rows["root"], pa.int64())}),
            sorted(set(retro)))


def _fresh_part(state_dir: str, sub: str, inc: int) -> str:
    """Path of a new single-file parquet part under ``sub/inc=N/``."""
    d = os.path.join(state_dir, sub, f"inc={inc}")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "part-0.parquet")


def read_retro_drops(state_dir: str) -> pa.Table:
    """All retro-drop tombstones emitted so far: previously-kept doc_ids
    a later increment's bridge demoted.  Apply as deletes downstream;
    (union of per-increment kept sets) minus these == a from-scratch
    batch :func:`minhash_dedup` over everything seen."""
    d = os.path.join(state_dir, "retro")
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if not os.path.isdir(d):
        return empty
    import pyarrow.dataset as pads

    dset = pads.dataset(d)
    if "doc_id" not in dset.schema.names:  # dir exists but holds no files
        return empty
    return dset.to_table(columns=["doc_id"]).combine_chunks()


def compact_state(state_dir: str) -> dict:
    """Rewrite the band/shingle stores into one ``inc=0`` generation.

    The store gains one directory (and ≥1 file) per increment; after many
    small increments the bloom-filtered bands scan pays per-file open
    costs.  Compaction is a pure rewrite (no dedup semantics change —
    both tables are append-only row sets), safe to run between
    increments.  Returns the updated manifest."""
    manifest_path = os.path.join(state_dir, "manifest.json")
    manifest = json.load(open(manifest_path))
    if _pending_removal_batch(state_dir, manifest) is not None:
        raise RuntimeError(
            "uncommitted apply_removals batch — re-run apply_removals "
            "before compacting")
    from ..util.rayops import parquet_rows

    # CDC deletes applied PHYSICALLY here: the bands/shingles rewrite
    # drops removed docs' rows, then the delete list is cleared (the
    # scan-time exclusion in increments becomes unnecessary)
    removed = read_removed(state_dir)
    rm_ref = (ray.put(np.sort(np.fromiter(removed, np.int64)))
              if removed else None)
    subs = [("bands", _BAND_COLS), ("shingles", _SHINGLE_COLS)]
    for sub, cols in (("comps", _COMP_COLS), ("retro", ["doc_id"]),
                      ("resurrected", ["doc_id"])):
        # comps: min-per-doc rows stay min-per-doc under a plain rewrite.
        # retro MUST be renumbered with everything else: compaction resets
        # the increment counter, and a stale retro/inc=N dir would be
        # rmtree'd by the next increment's idempotency cleanup.
        # (resurrected/removed dirs are keyed by the never-resetting
        # removal counter, but rewriting resurrected keeps it one file.)
        if glob.glob(os.path.join(state_dir, sub, "**", "*.parquet"),
                     recursive=True):
            subs.append((sub, cols))
    for sub, cols in subs:
        src = os.path.join(state_dir, sub)
        tmp = os.path.join(state_dir, f"_{sub}_compact")
        shutil.rmtree(tmp, ignore_errors=True)
        n_parts = max(1, parquet_rows(src) // 2_000_000 + 1)
        # select_columns drops the hive-parsed ``inc`` partition column —
        # without it the rewrite would bake stale inc values INTO the
        # data files under the new inc=0 directory
        ds = read_parquet_clean(src).select_columns(cols)
        if rm_ref is not None and sub in ("bands", "shingles"):
            ds = ds.map_batches(
                _filter_doc_ids,
                fn_kwargs={"ids_ref": rm_ref, "col": "doc_id",
                           "keep_in": False},
                batch_format="pyarrow")
        ds.repartition(n_parts).write_parquet(os.path.join(tmp, "inc=0"))
        shutil.rmtree(src)
        os.replace(tmp, src)
    if removed:
        shutil.rmtree(os.path.join(state_dir, "removed"),
                      ignore_errors=True)
    manifest["increments"] = 1
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return manifest


def minhash_dedup_incremental(new_docs: "rd.Dataset", state_dir: str,
                              threshold: float = 0.7, num_perm: int = 128,
                              bands: int = 16,
                              shingle_k: int = 3) -> "rd.Dataset":
    """Dedup an increment of ``(doc_id, text)`` rows against itself and
    the ``state_dir`` history; returns the kept new docs and appends the
    increment's bands+shingles to the store."""
    manifest_path = os.path.join(state_dir, "manifest.json")
    manifest = (json.load(open(manifest_path))
                if os.path.exists(manifest_path) else
                {"max_id": -1, "increments": 0, "num_perm": num_perm,
                 "bands": bands, "shingle_k": shingle_k, "comps": True,
                 "threshold": threshold, "removal_batches": 0})
    if _pending_removal_batch(state_dir, manifest) is not None:
        raise RuntimeError(
            "uncommitted apply_removals batch in the store — re-run "
            "apply_removals (it resumes the crashed batch) before the "
            "next increment")
    # root tracking needs the comps table maintained from increment 0;
    # a store created before the feature existed skips it (and emits no
    # tombstones) rather than resolving against missing history
    track_comps = bool(manifest.get("comps", False))
    assert (manifest["num_perm"], manifest["bands"], manifest["shingle_k"]) \
        == (num_perm, bands, shingle_k), "store built with other params"

    new_docs = new_docs.materialize()
    n_new = new_docs.count()
    if n_new == 0:
        # a crawl round with no new docs is a normal event: clean no-op,
        # store untouched
        return new_docs
    agg = new_docs.aggregate(rd.aggregate.Min("doc_id"),
                             rd.aggregate.Max("doc_id"))
    min_new, max_new = agg["min(doc_id)"], agg["max(doc_id)"]
    assert min_new > manifest["max_id"], \
        f"doc_ids must be monotone across increments: {min_new} <= {manifest['max_id']}"

    kw = {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k}
    bands_new = new_docs.map_batches(
        _minhash_bands_batch, fn_kwargs=kw, batch_format="pyarrow").materialize()
    shingles_new = new_docs.map_batches(
        _all_shingles_batch, fn_kwargs={"shingle_k": shingle_k},
        batch_format="pyarrow").materialize()

    bands_dir = os.path.join(state_dir, "bands")
    sh_dir = os.path.join(state_dir, "shingles")
    inc = manifest["increments"]

    all_bands = bands_new
    sh_ds = shingles_new
    if inc > 0:
        # ONE bloom-filtered scan of the old bands store: only old rows in
        # buckets the increment also touches survive (bucket collision is
        # exactly the LSH candidate condition)
        bloom = _bloom_of_keys(
            bands_new,
            lambda b: _mixed_bucket_key(b, ["band_id", "band_hash"]),
            capacity_hint=n_new * bands)
        bloom_ref = ray.put(bloom.snapshot())
        old_bands = read_parquet_clean(
            bands_dir, columns=_BAND_COLS).map_batches(
            _filter_bands_bloom, fn_kwargs={"bloom_ref": bloom_ref},
            batch_format="pyarrow")
        # CDC deletes: docs removed via apply_removals stay in the store
        # files until compact_state, but must not suppress new near-dups
        # — exclude them from the candidate side (exact anti-membership
        # against the bounded-by-churn delete list)
        removed = read_removed(state_dir)
        if removed:
            rm_ref = ray.put(np.sort(np.fromiter(removed, np.int64)))
            old_bands = old_bands.map_batches(
                _filter_doc_ids,
                fn_kwargs={"ids_ref": rm_ref, "col": "doc_id",
                           "keep_in": False},
                batch_format="pyarrow")
        all_bands = bands_new.union(old_bands)
        # verify side: old shingles join only for candidate ids — the
        # candidate-id bloom inside _verify_jaccard_joined prunes them,
        # so the union here can stay lazy and store-wide
        sh_ds = shingles_new.union(
            read_parquet_clean(sh_dir, columns=_SHINGLE_COLS))

    cand = _candidate_pairs(all_bands, ["band_id", "band_hash"],
                            _scale_parts((n_new + 1) * bands * 2)).materialize()
    # doc_b = max of each normalized pair: >= min_new keeps new-new and
    # old-new pairs, drops old-old (already resolved in prior increments)
    cand = cand.map_batches(
        lambda t, m=min_new: t.filter(pc.greater_equal(t["doc_b"], m)),
        batch_format="pyarrow").materialize()
    n_pairs = cand.count()

    kept = new_docs
    comp_rows = retro = None
    if n_pairs:
        verified = _verify_jaccard_joined(
            _dedupe_pairs(cand, n_pairs), None, shingle_k, threshold,
            n_pairs, shingle_ds=sh_ds)
        verified = normalize_blocks(verified.materialize())
        if verified.count():
            comp = connected_components(verified.map_batches(
                lambda t: t.select(["doc_a", "doc_b"]),
                batch_format="pyarrow")).materialize()
            drops = comp.map_batches(
                lambda t: t.filter(pc.not_equal(t["node"], t["comp"]))
                           .select(["node"]),
                batch_format="pyarrow")
            kept = _anti_join_ids(new_docs, drops)
            if track_comps:
                # candidate-bounded collect: rows = nodes of this
                # increment's non-trivial components, not the corpus
                comp_rows, retro = _component_bookkeeping(
                    comp.to_pandas(), min_new, state_dir)

    # append-only state update (written AFTER the result is computed so a
    # failed increment can simply re-run; the inc=N dirs are cleaned
    # first so a partial write from a crashed attempt cannot leave
    # duplicate rows in the store — write_parquet's uuid-named files
    # would otherwise coexist with the crashed attempt's)
    shutil.rmtree(os.path.join(bands_dir, f"inc={inc}"), ignore_errors=True)
    shutil.rmtree(os.path.join(sh_dir, f"inc={inc}"), ignore_errors=True)
    for extra in ("comps", "retro"):
        shutil.rmtree(os.path.join(state_dir, extra, f"inc={inc}"),
                      ignore_errors=True)
    bands_new.write_parquet(os.path.join(bands_dir, f"inc={inc}"))
    shingles_new.write_parquet(os.path.join(sh_dir, f"inc={inc}"))
    if comp_rows is not None and comp_rows.num_rows:
        pq.write_table(comp_rows,
                       _fresh_part(state_dir, "comps", inc))
    if retro:
        pq.write_table(pa.table({"doc_id": pa.array(retro, pa.int64())}),
                       _fresh_part(state_dir, "retro", inc))
    manifest.update({"max_id": int(max_new), "increments": inc + 1,
                     "comps": track_comps})
    manifest.setdefault("threshold", threshold)
    manifest.setdefault("removal_batches", 0)
    os.makedirs(state_dir, exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return kept


# ---------------------------------------------------------------------------
# CDC-delete ingestion — the consumer step diff.py promises ("apply
# `removed` as deletes").  A url deleted (or re-crawled: its OLD version
# superseded) upstream must stop suppressing future near-dups of itself,
# and docs it alone was suppressing must come back.
#
# Design (the BM25-index delete-list shape): removals append to a
# ``removed/`` doc-id list honored at scan time (increments exclude those
# ids from the old-bands candidate side); :func:`compact_state` applies
# them physically and clears the list.  Because dedup keep-decisions are
# component minima, deleting a doc can RESURRECT previously-dropped docs
# (the deleted doc was the component min, or the only bridge between two
# sub-groups); :func:`apply_removals` recomputes the affected components
# exactly — candidate-bounded work: only the removed docs' components are
# touched — and emits ``resurrected/`` doc-id records (the countervailing
# log to ``retro/`` tombstones).  With removals applied,
# :func:`current_keepers` equals a from-scratch batch
# :func:`~.dedup.minhash_dedup` over the surviving corpus (pinned by the
# crawl → diff → incremental composed test).
#
# Crash safety: the uncommitted batch is detected via
# ``removed/inc=<k>`` existing with ``manifest.removal_batches == k``;
# re-running apply_removals resumes it deterministically (event files
# are written atomically first, the comps rewrite is a tmp+rename, the
# manifest bump is the commit point), and increments refuse to run over
# an uncommitted batch.

_REMOVED_COLS = ["doc_id"]


def _read_id_log(state_dir: str, sub: str, max_inc: int | None = None) -> set:
    """All doc_ids under ``sub/inc=*/`` (optionally only inc < max_inc)."""
    d = os.path.join(state_dir, sub)
    if not os.path.isdir(d):
        return set()
    out: set[int] = set()
    for f in glob.glob(os.path.join(d, "inc=*", "*.parquet")):
        inc = int(os.path.basename(os.path.dirname(f)).split("=", 1)[1])
        if max_inc is not None and inc >= max_inc:
            continue
        out.update(int(x) for x in pq.read_table(
            f, columns=_REMOVED_COLS)["doc_id"].to_pylist())
    return out


def read_removed(state_dir: str) -> set:
    """Doc_ids removed via :func:`apply_removals` and not yet physically
    compacted away (driver set — bounded by churn between compactions)."""
    return _read_id_log(state_dir, "removed")


def read_resurrections(state_dir: str) -> pa.Table:
    """All resurrection records emitted so far: previously-dropped (or
    tombstoned) doc_ids that became keepers because a removal deleted
    the doc that dominated them.  Apply downstream as CDC re-adds, the
    inverse of :func:`read_retro_drops` tombstones."""
    d = os.path.join(state_dir, "resurrected")
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if not os.path.isdir(d):
        return empty
    import pyarrow.dataset as pads

    dset = pads.dataset(d)
    if "doc_id" not in dset.schema.names:
        return empty
    return dset.to_table(columns=["doc_id"]).combine_chunks()


def _pending_removal_batch(state_dir: str, manifest: dict):
    """Ids of an uncommitted apply_removals batch (crash between the
    event-file write and the manifest bump), else None."""
    k = manifest.get("removal_batches", 0)
    d = os.path.join(state_dir, "removed", f"inc={k}")
    if not os.path.isdir(d) or not glob.glob(os.path.join(d, "*.parquet")):
        return None
    return _read_id_log(state_dir, "removed") - _read_id_log(
        state_dir, "removed", max_inc=k)


def _filter_doc_ids(batch: pa.Table, *, ids_ref, col: str,
                    keep_in: bool) -> pa.Table:
    """Exact membership (semi/anti) filter against a broadcast SORTED
    int64 id array (per-worker LRU via bcast_get)."""
    from .dedup import _bcast_get

    ids = _bcast_get(ids_ref)
    vals = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids):
        pos = np.searchsorted(ids, vals)
        pos[pos == len(ids)] = 0
        member = ids[pos] == vals
    else:
        member = np.zeros(len(vals), bool)
    return batch.filter(pa.array(member if keep_in else ~member))


def _reverse_members(state_dir: str, roots: set) -> set:
    """All docs whose CURRENT component root is in ``roots``: reverse
    chase over the ``comps/`` (doc → root) rows (candidate-bounded
    ``isin``-filtered store scans per chain level; path compression keeps
    chains ~1 deep), then a forward re-resolve filters out docs whose
    newest row points elsewhere (stale non-min rows also match the
    reverse scan)."""
    comps_dir = os.path.join(state_dir, "comps")
    if not roots or not os.path.isdir(comps_dir):
        return set(roots)
    import pyarrow.dataset as pads

    dset = pads.dataset(comps_dir)
    if "doc_id" not in dset.schema.names:
        return set(roots)
    found: set[int] = set()
    frontier = set(int(r) for r in roots)
    while frontier:
        t = dset.to_table(columns=_COMP_COLS,
                          filter=pc.field("root").isin(list(frontier)))
        docs = set(int(x) for x in t["doc_id"].to_pylist())
        frontier = docs - found - roots
        found |= docs
    if not found:
        return set(roots)
    final = _resolve_roots(state_dir, found)
    return set(roots) | {d for d, r in final.items() if r in roots}


def _atomic_id_file(state_dir: str, sub: str, k: int, ids) -> None:
    """Write ``sub/inc=k/part-0.parquet`` atomically (tmp + rename);
    skip if it already exists (crash-resume keeps the first attempt's
    deterministic content)."""
    path = _fresh_part(state_dir, sub, k)
    if os.path.exists(path):
        return
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(sorted(ids), pa.int64())}),
                   tmp)
    os.replace(tmp, path)


def apply_removals(state_dir: str, doc_ids, threshold: float | None = None
                   ) -> pa.Table:
    """Ingest CDC deletes into the dedup store: the ``removed`` side of
    :func:`~..pipelines.diff.diff_crawls` (plus the OLD doc_ids of
    ``changed`` urls when the new versions are fed as an increment).

    Returns the resurrection table ``(doc_id,)`` — previously-dropped
    docs that become keepers now that their dominating doc is gone.
    After this call, future increments no longer collide with the
    removed docs, and ``current_keepers(state_dir)`` equals a
    from-scratch batch run over the surviving corpus."""
    manifest_path = os.path.join(state_dir, "manifest.json")
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if not os.path.exists(manifest_path):
        if list(doc_ids):
            raise FileNotFoundError(f"no dedup store at {state_dir}")
        return empty
    manifest = json.load(open(manifest_path))
    if not manifest.get("comps", False):
        raise RuntimeError(
            "store predates component tracking — removals need the "
            "comps/ table; rebuild the store")
    if threshold is None:
        threshold = float(manifest.get("threshold", 0.7))
    bands_n = int(manifest["bands"])
    shingle_k = int(manifest["shingle_k"])
    k = int(manifest.get("removal_batches", 0))

    prior_removed = _read_id_log(state_dir, "removed", max_inc=k)
    pending = _pending_removal_batch(state_dir, manifest) or set()
    requested = {int(i) for i in doc_ids} | pending
    r_new = sorted(requested - prior_removed)
    if not r_new:
        return empty

    # only ids actually in the store matter (diff `removed` may name
    # urls that never produced a doc — error rows, empty bodies)
    import pyarrow.dataset as pads

    sh_dir = os.path.join(state_dir, "shingles")
    known = pads.dataset(sh_dir).to_table(
        columns=["doc_id"], filter=pc.field("doc_id").isin(r_new))
    r_new = sorted(int(x) for x in known["doc_id"].to_pylist())
    if not r_new:
        return empty

    # 1. affected components (pre-rewrite state): roots of the removed
    #    docs, then every doc resolving to those roots
    roots = _resolve_roots(state_dir, r_new)
    affected = set(roots.values())
    members = _reverse_members(state_dir, affected)
    all_gone = set(r_new) | prior_removed
    remaining = sorted(members - all_gone)
    prior_keepers = affected - all_gone

    # 2. recompute sub-components among the remaining members: bands →
    #    candidate pairs → exact-Jaccard verify → connected components.
    #    Everything is filtered to the member set, so the work is
    #    bounded by the affected components, not the corpus.
    sub_root: dict[int, int] = {}
    if remaining:
        rem_ref = ray.put(np.asarray(remaining, np.int64))
        bands_m = read_parquet_clean(
            os.path.join(state_dir, "bands"), columns=_BAND_COLS
        ).map_batches(
            _filter_doc_ids,
            fn_kwargs={"ids_ref": rem_ref, "col": "doc_id", "keep_in": True},
            batch_format="pyarrow")
        cand = _candidate_pairs(
            bands_m, ["band_id", "band_hash"],
            _scale_parts(len(remaining) * bands_n * 2)).materialize()
        n_pairs = cand.count()
        if n_pairs:
            sh_m = read_parquet_clean(
                sh_dir, columns=_SHINGLE_COLS).map_batches(
                _filter_doc_ids,
                fn_kwargs={"ids_ref": rem_ref, "col": "doc_id",
                           "keep_in": True},
                batch_format="pyarrow")
            verified = normalize_blocks(_verify_jaccard_joined(
                _dedupe_pairs(cand, n_pairs), None, shingle_k, threshold,
                n_pairs, shingle_ds=sh_m).materialize())
            if verified.count():
                comp = connected_components(verified.map_batches(
                    lambda t: t.select(["doc_a", "doc_b"]),
                    batch_format="pyarrow")).to_pandas()
                sub_root = {int(n): int(c)
                            for n, c in zip(comp["node"], comp["comp"])}
    new_keepers = {d for d in remaining if sub_root.get(d, d) == d}
    resurrected = sorted(new_keepers - prior_keepers)

    # 3. commit: event files (atomic, resume-safe), comps rewrite
    #    (tmp + rename), manifest bump LAST (the commit point)
    _atomic_id_file(state_dir, "removed", k, r_new)
    if resurrected:
        _atomic_id_file(state_dir, "resurrected", k, resurrected)
    comps_dir = os.path.join(state_dir, "comps")
    if glob.glob(os.path.join(comps_dir, "**", "*.parquet"),
                 recursive=True):
        mem_ref = ray.put(np.asarray(sorted(members), np.int64))
        kept_rows = read_parquet_clean(
            comps_dir, columns=_COMP_COLS).map_batches(
            _filter_doc_ids,
            fn_kwargs={"ids_ref": mem_ref, "col": "doc_id",
                       "keep_in": False},
            batch_format="pyarrow").materialize()
        tmp = os.path.join(state_dir, "_comps_cdc")
        shutil.rmtree(tmp, ignore_errors=True)
        if kept_rows.count():
            kept_rows.write_parquet(os.path.join(tmp, "inc=0"))
        else:
            os.makedirs(tmp)  # all rows belonged to affected components
        shutil.rmtree(comps_dir)
        os.replace(tmp, comps_dir)
    rerooted = [(d, r) for d, r in sub_root.items() if r != d]
    if rerooted:
        os.makedirs(os.path.join(comps_dir, "inc=0"), exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": pa.array([d for d, _ in rerooted],
                                         pa.int64()),
                      "root": pa.array([r for _, r in rerooted],
                                       pa.int64())}),
            os.path.join(comps_dir, "inc=0", f"cdc-{k}.parquet"))
    if (os.path.isdir(comps_dir) and not glob.glob(
            os.path.join(comps_dir, "**", "*.parquet"), recursive=True)):
        shutil.rmtree(comps_dir)  # empty store == no store (reader guards)
    manifest["removal_batches"] = k + 1
    manifest.setdefault("threshold", threshold)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return pa.table({"doc_id": pa.array(resurrected, pa.int64())})


def current_keepers(state_dir: str) -> "rd.Dataset":
    """The store's authoritative kept set: every seen doc minus removed
    docs minus docs whose component root is another doc.  Equals a
    from-scratch batch :func:`~.dedup.minhash_dedup` over the surviving
    corpus (kept-set semantics; pinned by test).  The drop/removed sets
    broadcast from the driver (bounded by duplicate count + churn — a
    verification/bookkeeping surface, not a per-batch hot path)."""
    comps_dir = os.path.join(state_dir, "comps")
    dropped: set[int] = set()
    if os.path.isdir(comps_dir) and glob.glob(
            os.path.join(comps_dir, "**", "*.parquet"), recursive=True):
        t = read_parquet_clean(comps_dir, columns=_COMP_COLS).to_pandas()
        newest = t.groupby("doc_id")["root"].min()
        mapping = {int(d): int(r) for d, r in newest.items()}

        def final(x: int) -> int:
            path = []
            while mapping.get(x, x) != x:
                path.append(x)
                x = mapping[x]
            for p in path:
                mapping[p] = x
            return x

        dropped = {d for d in list(mapping) if final(d) != d}
    bad = dropped | read_removed(state_dir)
    ids = read_parquet_clean(os.path.join(state_dir, "shingles"),
                             columns=["doc_id"])
    if not bad:
        return ids
    bad_ref = ray.put(np.sort(np.fromiter(bad, np.int64)))
    return ids.map_batches(
        _filter_doc_ids,
        fn_kwargs={"ids_ref": bad_ref, "col": "doc_id", "keep_in": False},
        batch_format="pyarrow")
