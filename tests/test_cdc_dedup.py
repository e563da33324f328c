"""CDC-delete ingestion for the incremental dedup store
(textops/incremental.apply_removals): removals stop suppressing future
near-dups, resurrect the docs the removed doc dominated, survive
compaction, and the crawl → diff → incremental composition equals a
from-scratch batch run on the final corpus."""

import glob
import os
from datetime import timedelta

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

KW = dict(threshold=0.55, num_perm=128, bands=64, shingle_k=3)


def _variant(words, *positions):
    v = list(words)
    for p in positions:
        v[p] = f"x{p}"
    return " ".join(v)


def _corpus():
    """Planted components under KW (40-token docs, 38 shingles; one
    changed token kills 3 shingles → j=35/41≈0.854; two docs differing
    at 4 positions → j=26/50=0.52 < 0.55 — candidate but verify-dropped):

    - comp {0, 1}: doc1 ~ doc0 (j .854)
    - comp {2, 3, 4}: chain 2–3 (j .854), 3–4 (j .617), but 2–4 only
      j .52 — connected ONLY through 3
    - {10, 11, 12}: wc-based: 10 full, 11/12 singleton word sets
    """
    wa = [f"a{j}" for j in range(40)]
    wb = [f"b{j}" for j in range(40)]
    wc = [f"c{j}" for j in range(40)]
    return [
        {"doc_id": 0, "text": " ".join(wa)},
        {"doc_id": 1, "text": _variant(wa, 7)},
        {"doc_id": 2, "text": " ".join(wb)},
        {"doc_id": 3, "text": _variant(wb, 5)},
        {"doc_id": 4, "text": _variant(wb, 5, 12, 20, 28)},
        {"doc_id": 10, "text": " ".join(wc)},
        {"doc_id": 11, "text": " ".join(f"d{j}" for j in range(40))},
        {"doc_id": 12, "text": " ".join(f"e{j}" for j in range(40))},
    ]


def _keepers(state):
    from pttcrawler_ray.textops.incremental import current_keepers

    return set(current_keepers(state).to_pandas()["doc_id"])


def _batch_keepers(rows):
    from pttcrawler_ray.textops.dedup import minhash_dedup

    return set(minhash_dedup(rd.from_items(rows), **KW)
               .to_pandas()["doc_id"])


def test_apply_removals_resurrects_and_matches_batch(ray_session, tmp_path):
    from pttcrawler_ray.textops.incremental import (apply_removals,
                                                    minhash_dedup_incremental,
                                                    read_removed,
                                                    read_resurrections)

    rows = _corpus()
    state = str(tmp_path / "st")
    kept = minhash_dedup_incremental(rd.from_items(rows), state, **KW)
    assert set(kept.to_pandas()["doc_id"]) == {0, 2, 10, 11, 12}

    # removing the root of {0,1} resurrects 1
    res = apply_removals(state, [0])
    assert res["doc_id"].to_pylist() == [1]
    assert _keepers(state) == {1, 2, 10, 11, 12}
    assert _keepers(state) == _batch_keepers(
        [r for r in rows if r["doc_id"] != 0])

    # removing the BRIDGE 3 splits {2,3,4}: 2 stays keeper, 4 comes back
    res = apply_removals(state, [3])
    assert res["doc_id"].to_pylist() == [4]
    survivors = [r for r in rows if r["doc_id"] not in (0, 3)]
    assert _keepers(state) == {1, 2, 4, 10, 11, 12} == _batch_keepers(survivors)

    # singleton removal: no resurrection; unknown / already-removed: no-op
    assert apply_removals(state, [10]).num_rows == 0
    assert apply_removals(state, [999]).num_rows == 0
    assert apply_removals(state, [0, 3]).num_rows == 0
    assert read_removed(state) == {0, 3, 10}
    assert set(read_resurrections(state)["doc_id"].to_pylist()) == {1, 4}
    survivors = [r for r in rows if r["doc_id"] not in (0, 3, 10)]
    assert _keepers(state) == {1, 2, 4, 11, 12} == _batch_keepers(survivors)


def test_increment_after_removal_no_longer_suppressed(ray_session,
                                                      tmp_path):
    """A new doc near-dupping ONLY a removed doc must be kept; near-dup
    of a resurrected doc must still drop; final keepers == batch run on
    the surviving union (both removal orders)."""
    from pttcrawler_ray.textops.incremental import (apply_removals,
                                                    minhash_dedup_incremental)

    rows = _corpus()
    wc = [f"c{j}" for j in range(40)]
    wa = [f"a{j}" for j in range(40)]
    new_rows = [
        # ~10 only (removed) → kept
        {"doc_id": 30, "text": _variant(wc, 5)},
        # ~1 (resurrected; doc1 = wa@7): differs from doc1 at pos 15 →
        # j .727 ≥ .55 → dropped (1 < 31)
        {"doc_id": 31, "text": _variant(wa, 7, 15)},
    ]
    for order in ("remove_first", "increment_first"):
        state = str(tmp_path / f"st_{order}")
        minhash_dedup_incremental(rd.from_items(rows), state, **KW)
        if order == "remove_first":
            apply_removals(state, [0, 10])
            k2 = minhash_dedup_incremental(rd.from_items(new_rows), state,
                                           **KW)
            assert set(k2.to_pandas()["doc_id"]) == {30}
        else:
            k2 = minhash_dedup_incremental(rd.from_items(new_rows), state,
                                           **KW)
            # with 0 and 10 still present, 30 dups 10 and 31 dups 0/1
            assert k2.count() == 0
            apply_removals(state, [0, 10])
        survivors = [r for r in rows + new_rows
                     if r["doc_id"] not in (0, 10)]
        assert _keepers(state) == _batch_keepers(survivors), order


def test_removals_survive_compaction(ray_session, tmp_path):
    """compact_state applies deletes physically: removed ids disappear
    from bands/shingles files, the delete list clears, keepers are
    unchanged, and post-compaction increments still un-suppress."""
    import pyarrow.dataset as pads

    from pttcrawler_ray.textops.incremental import (apply_removals,
                                                    compact_state,
                                                    minhash_dedup_incremental,
                                                    read_removed)

    rows = _corpus()
    state = str(tmp_path / "st")
    minhash_dedup_incremental(rd.from_items(rows), state, **KW)
    apply_removals(state, [0, 10])
    before = _keepers(state)

    compact_state(state)
    assert read_removed(state) == set()
    for sub in ("bands", "shingles"):
        ids = set(pads.dataset(os.path.join(state, sub))
                  .to_table(columns=["doc_id"])["doc_id"].to_pylist())
        assert not ids & {0, 10}, sub
    assert _keepers(state) == before

    wc = [f"c{j}" for j in range(40)]
    k2 = minhash_dedup_incremental(
        rd.from_items([{"doc_id": 30, "text": _variant(wc, 5)}]),
        state, **KW)
    assert set(k2.to_pandas()["doc_id"]) == {30}
    survivors = [r for r in rows if r["doc_id"] not in (0, 10)] \
        + [{"doc_id": 30, "text": _variant(wc, 5)}]
    assert _keepers(state) == _batch_keepers(survivors)


def test_composed_crawl_diff_incremental_equals_batch(ray_session,
                                                      tmp_path):
    """The engine's continuous-crawl loop end-to-end, two CDC rounds:
    crawl A → re-crawl B (diff: added + changed) → re-crawl C (a pruning
    re-crawl; diff: removed).  Each round feeds `added`+`changed` docs
    (fresh monotone ids) into minhash_dedup_incremental and the
    `removed` + superseded changed-old ids into apply_removals.  After
    both rounds the store's keeper set equals a from-scratch batch
    minhash_dedup over the FINAL corpus — the diff.py/incremental.py
    composition contract."""
    from pttcrawler_ray.fixtures import _EPOCH, generate_corpus
    from pttcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from pttcrawler_ray.textops.prepare import docs_from_crawl

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, total_articles=150, n_boards=2,
                    dup_fraction=0.3)
    base = dict(num_shards=2, strict_order=False, record_order=False,
                round_seconds=3600.0, fetch_concurrency=2,
                process_concurrency=2)
    out_a = str(tmp_path / "a")
    run_crawl(corpus, out_a, CrawlConfig(
        **base, asof_ts=_EPOCH + timedelta(days=31, hours=2),
        start_date=_EPOCH + timedelta(hours=6)))
    out_b = str(tmp_path / "b")
    run_crawl(corpus, out_b, CrawlConfig(**base))
    out_c = str(tmp_path / "c")  # pruning re-crawl: drops old articles
    # (article dates span ~0-20h — page_no*4h + minutes — so 10h prunes
    # a real slice while keeping the rest)
    run_crawl(corpus, out_c, CrawlConfig(
        **base, start_date=_EPOCH + timedelta(hours=10)))

    # drive the whole loop through the ONE-CALL driver (pipelines/cdc.py)
    from pttcrawler_ray.pipelines.cdc import cdc_init, cdc_update

    work = str(tmp_path / "work")
    s0 = cdc_init(out_a, work, threshold=0.6)
    assert s0["docs"] > 0
    s1 = cdc_update(out_b, work)
    assert s1["added"] > 0 and s1["changed"] > 0, s1
    s2 = cdc_update(out_c, work)
    assert s2["removed"] > 0, s2

    # from-scratch batch over the FINAL corpus with the SAME id
    # assignment (read back from the persisted url map)
    import pyarrow.dataset as pads

    m = pads.dataset(os.path.join(work, "url_map")).to_table()
    id_of = dict(zip(m["url"].to_pylist(), m["doc_id"].to_pylist()))
    docs_c = docs_from_crawl(out_c).to_pandas()
    assert set(docs_c["url"]) == set(id_of)
    final_rows = [{"doc_id": id_of[u], "text": t}
                  for u, t in zip(docs_c["url"], docs_c["text"])]
    from pttcrawler_ray.textops.dedup import minhash_dedup

    want = set(minhash_dedup(rd.from_items(final_rows),
                             threshold=0.6).to_pandas()["doc_id"])
    assert _keepers(os.path.join(work, "dedup_state")) == want


def test_increment_refuses_uncommitted_removal_batch(ray_session,
                                                     tmp_path):
    """Crash simulation: a removed/inc=k dir without the manifest bump
    must block increments, and re-running apply_removals resumes it."""
    import json

    from pttcrawler_ray.textops.incremental import (apply_removals,
                                                    minhash_dedup_incremental,
                                                    read_resurrections)

    rows = _corpus()
    state = str(tmp_path / "st")
    minhash_dedup_incremental(rd.from_items(rows), state, **KW)
    apply_removals(state, [0])
    # roll the manifest commit back — the batch is now "uncommitted"
    mpath = os.path.join(state, "manifest.json")
    m = json.load(open(mpath))
    m["removal_batches"] = 0
    json.dump(m, open(mpath, "w"))

    with pytest.raises(RuntimeError, match="uncommitted"):
        minhash_dedup_incremental(
            rd.from_items([{"doc_id": 50,
                            "text": " ".join(f"z{j}" for j in range(40))}]),
            state, **KW)
    # resume with no extra ids: replays batch 0 deterministically
    apply_removals(state, [])
    assert json.load(open(mpath))["removal_batches"] == 1
    assert _keepers(state) == {1, 2, 10, 11, 12}
    assert set(read_resurrections(state)["doc_id"].to_pylist()) == {1}
