"""Dedup-at-scale soak: minhash_dedup end-to-end on a 10^6-doc corpus.

Evidence tool for the at-scale dedup tail (BASELINE.md "Dedup soak"):
a generated 1M-document corpus with planted near-dup clusters AND
degenerate boilerplate classes pushes the pipeline through every
at-scale branch at once —

- raw candidate pairs >> _VERIFY_BCAST_MAX_PAIRS → the bloom-semi-join
  + two-bucketed-hash-join verify (`_verify_jaccard_joined`), never a
  driver-side shingle dict;
- degenerate identical-text classes (2,000 docs/class) → the
  MAX_BUCKET_DOCS cap (smallest 256 ids kept per bucket, logged);
- verified pairs > _CC_UNIONFIND_MAX → distributed min-label
  connected components + pointer jumping, and the keep filter as an
  exact bucketed anti-join.  Nothing graph- or corpus-sized ever sits
  on the driver — the JSON line reports driver peak RSS to prove it.

The corpus is fully deterministic, so the kept-count is EXACT:

- 60,000 clusters x 4 variants (ids 0..239,999): 40 shared namespaced
  tokens + 1 variant token → within-cluster jaccard 38/40 = 0.95;
  dedup keeps the min id per cluster → 180,000 drops.
- 8 boilerplate classes x 2,000 identical docs (ids 240,000..255,999):
  every LSH bucket is the whole class, capped to the 256 smallest ids;
  pairs connect only those 256 → 255 drops/class (the other 1,744
  identical docs survive BY DESIGN — the cap trades exhaustive
  boilerplate collapse for bounded task size; a real pipeline layers
  exact_dedup first) → 2,040 drops.
- 744,000 unique docs (namespaced random tokens, vocab 10^7): no
  shared trigrams → no pairs, all kept.

Expected kept = 1,000,000 - 182,040 = 817,960.

Every doc carries stopwords at fixed positions (1 in 5) so --curate
mode (quality → langid → filter → dedup, the curate_docs composition)
keeps the same planted structure alive through the quality filter.

Run from the repo root:  python tools/soak_dedup_scale.py [--docs N]
[--curate].  ~4-8 min at 1M docs depending on the host window.
"""
import argparse
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = 60_000
CLUSTER_SZ = 4
N_CLASSES = 8
CLASS_SZ = 2_000
STOPS = ["the", "and", "of", "to", "in"]  # stop_ratio > 0 for --curate


def _tokens_to_text(tok_rows):
    return [" ".join(r) for r in tok_rows]


def gen_corpus(out_dir: str, n_docs: int, chunk: int = 50_000,
               n_clusters: int = N_CLUSTERS, n_classes: int = N_CLASSES) -> dict:
    """Deterministic planted corpus; returns the expected-count manifest."""
    n_cluster_docs = n_clusters * CLUSTER_SZ
    n_class_docs = n_classes * CLASS_SZ
    assert n_docs > n_cluster_docs + n_class_docs
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260818)

    def doc_tokens(i: int) -> list[str]:
        if i < n_cluster_docs:
            c, v = divmod(i, CLUSTER_SZ)
            toks = [f"c{c}w{j}" if j % 5 != 2 else STOPS[j // 5 % len(STOPS)]
                    for j in range(40)]
            return toks + [f"v{v}"]
        if i < n_cluster_docs + n_class_docs:
            k = (i - n_cluster_docs) // CLASS_SZ
            return [f"k{k}b{j}" if j % 5 != 2 else STOPS[j // 5 % len(STOPS)]
                    for j in range(40)]
        vals = rng.integers(0, 10_000_000, size=40)
        return [f"u{v}" if j % 5 != 2 else STOPS[j // 5 % len(STOPS)]
                for j, v in enumerate(vals)]

    t0 = time.time()
    for start in range(0, n_docs, chunk):
        end = min(start + chunk, n_docs)
        texts = _tokens_to_text([doc_tokens(i) for i in range(start, end)])
        pq.write_table(
            pa.table({"doc_id": pa.array(range(start, end), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(out_dir, f"part-{start:08d}.parquet"))
    cluster_drops = n_clusters * (CLUSTER_SZ - 1)
    class_drops = n_classes * 255  # cap keeps 256 smallest ids per class
    return {"n_docs": n_docs, "n_clusters": n_clusters, "n_classes": n_classes,
            "gen_sec": round(time.time() - t0, 1),
            "expected_drops": cluster_drops + class_drops,
            "expected_kept": n_docs - cluster_drops - class_drops,
            "expected_pairs": n_clusters * (CLUSTER_SZ * (CLUSTER_SZ - 1) // 2)
                              + n_classes * (256 * 255 // 2)}


def _rss_gb() -> float:
    """Current driver VmRSS in GB (peak is reported separately)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1e6, 2)
    return -1.0


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (any shape)."""
    return np.unpackbits(x.view(np.uint8)).reshape(*x.shape, 64).sum(axis=-1)


def _sequential_simhash_pairs(ids: np.ndarray, sims: np.ndarray,
                              max_hamming: int = 3,
                              cap: int = 256) -> dict:
    """Sequential reference for the simhash banding pipeline: per 16-bit
    band, bucket by value, cap each bucket to the ``cap`` smallest unique
    ids (the MAX_BUCKET_DOCS rule), emit pairs with Hamming ≤ max.
    Independent of every distributed mechanism being soaked (the explode
    shuffle, coarse partitions, vectorized run scan, carry-distinct);
    the simhash VALUES themselves are conformance-checked against the
    brute-force oracle at small scale (queryoracle simhash_pairs_docs)."""
    out: dict = {}
    for band in range(4):
        bv = (sims >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        order = np.lexsort((ids, bv))
        b_s, id_s, sim_s = bv[order], ids[order], sims[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        ends = np.r_[starts[1:], b_s.size]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run_ids, first = np.unique(id_s[s:e], return_index=True)
            run_sims = sim_s[s:e][first][:cap]
            run_ids = run_ids[:cap]
            if run_ids.size < 2:
                continue
            hm = _popcount64(run_sims[:, None] ^ run_sims[None, :])
            ia, ib = np.where(np.triu(hm <= max_hamming, k=1))
            for p, q, h in zip(run_ids[ia], run_ids[ib], hm[ia, ib]):
                out[(int(p), int(q))] = int(h)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--curate", action="store_true",
                    help="run the composed quality->langid->filter->dedup "
                         "pipeline instead of plain minhash_dedup")
    ap.add_argument("--simhash", action="store_true",
                    help="soak the simhash banding pipeline instead "
                         "(pairs vs a sequential banding+cap oracle)")
    ap.add_argument("--out", default="/tmp/ptt_dedup_soak")
    ap.add_argument("--clusters", type=int, default=N_CLUSTERS)
    ap.add_argument("--classes", type=int, default=N_CLASSES)
    args = ap.parse_args()

    corpus = os.path.join(args.out, "docs")
    marker = os.path.join(args.out, "manifest.json")
    manifest = None
    if os.path.exists(marker):
        with open(marker) as f:
            manifest = json.load(f)
        if (manifest.get("n_docs") != args.docs
                or manifest.get("n_clusters") != args.clusters
                or manifest.get("n_classes") != args.classes):
            manifest = None
    if manifest is None:
        shutil.rmtree(corpus, ignore_errors=True)
        print(f"generating {args.docs:,} docs ...", file=sys.stderr)
        manifest = gen_corpus(corpus, args.docs, n_clusters=args.clusters,
                              n_classes=args.classes)
        with open(marker, "w") as f:
            json.dump(manifest, f)
    print(f"corpus ready ({manifest['n_docs']:,} docs)", file=sys.stderr)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops import dedup as D
    from pttcrawler_ray.util.rayops import read_parquet_clean

    docs = read_parquet_clean(corpus)
    rss_phases = {"start": _rss_gb()}

    if args.simhash:
        import pandas as pd

        # oracle input: (doc_id, simhash) — 16 B/doc, driver-safe at any
        # soak scale; values computed by the (small-scale-conformance-
        # checked) SimHash stage, machinery checked sequentially
        t0 = time.time()
        sdf = (docs.map_batches(D.SimHash(), batch_format="pyarrow")
               .select_columns(["doc_id", "simhash"]).to_pandas())
        t_sims = time.time() - t0
        ids = sdf["doc_id"].to_numpy(np.int64)
        sims = sdf["simhash"].to_numpy(np.uint64)
        exp = _sequential_simhash_pairs(ids, sims)
        t_oracle = time.time() - t0 - t_sims
        rss_phases["after_oracle"] = _rss_gb()

        t1 = time.time()
        pairs = D.simhash_pairs(docs, max_hamming=3,
                                as_dataset=True).materialize()
        n_pairs = pairs.count()
        t_pairs = time.time() - t1
        rss_phases["after_pairs"] = _rss_gb()
        got = pairs.to_pandas()  # output-sized driver check, soak-side only
        gmap = {(int(a), int(b)): int(h) for a, b, h in
                zip(got["doc_a"], got["doc_b"], got["hamming"])}
        ok = gmap == exp

        peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        ray.shutdown()
        print(json.dumps({
            "metric": "simhash banding soak (explode shuffle + capped runs "
                      "+ carry-distinct) vs sequential banding oracle",
            "mode": "simhash",
            "n_docs": manifest["n_docs"],
            "pairs": n_pairs,
            "expected_pairs": len(exp),
            "sims_sec": round(t_sims, 1),
            "oracle_sec": round(t_oracle, 1),
            "pairs_sec": round(t_pairs, 1),
            "docs_per_sec": round(manifest["n_docs"] / t_pairs, 0),
            "driver_peak_rss_gb": round(peak_rss_gb, 2),
            "driver_rss_phases_gb": rss_phases,
            "exact_match": ok,
        }))
        assert ok, (n_pairs, len(exp))
        return

    t0 = time.time()
    if args.curate:
        import pyarrow.compute as pc

        from pttcrawler_ray.textops.analysis import (LangId,
                                                     quality_score_batch)

        docs = docs.map_batches(quality_score_batch, batch_format="pyarrow")
        docs = docs.map_batches(LangId, batch_format="pyarrow",
                                concurrency=(1, 4))
        docs = docs.map_batches(
            lambda t: t.filter(pc.and_(pc.greater(t["quality"], 0.3),
                                       pc.greater(t["stop_ratio"], 0.0)))
                       .select(["doc_id", "text"]),
            batch_format="pyarrow")
        # pin the curated projection ONCE: both the pair stage (via
        # minhash_lsh_pairs' internal materialize) and the final
        # anti-join consume it — without this the anti-join re-executes
        # the whole quality→langid scoring pass (measured +60 s at 1M)
        docs = docs.materialize()

    # pair stage first (timed separately): the same pipeline minhash_dedup
    # runs internally, through the joined-verify path
    pairs = D.minhash_lsh_pairs(docs, threshold=0.8, num_perm=64, bands=16,
                                as_dataset=True).materialize()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0
    rss_phases["after_pairs"] = _rss_gb()
    if manifest["expected_pairs"] > D._CC_UNIONFIND_MAX:
        assert n_pairs > D._CC_UNIONFIND_MAX, \
            f"soak must exercise distributed CC: {n_pairs} <= {D._CC_UNIONFIND_MAX}"

    comp = D.connected_components(
        pairs.map_batches(lambda t: t.select(["doc_a", "doc_b"]),
                          batch_format="pyarrow"))
    import pyarrow.compute as pc

    drops = comp.map_batches(
        lambda t: t.filter(pc.not_equal(t["node"], t["comp"])).select(["node"]),
        batch_format="pyarrow")
    comp = comp.materialize()
    t_cc = time.time() - t0 - t_pairs
    rss_phases["after_cc"] = _rss_gb()
    kept = D._anti_join_ids(docs, drops)
    n_kept = kept.count()
    t_total = time.time() - t0
    rss_phases["after_anti"] = _rss_gb()

    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()

    ok_pairs = n_pairs == manifest["expected_pairs"]
    ok_kept = n_kept == manifest["expected_kept"]
    print(json.dumps({
        "metric": "minhash dedup soak (joined verify + distributed CC + bucketed anti-join)",
        "mode": "curate" if args.curate else "dedup",
        "n_docs": manifest["n_docs"],
        "verified_pairs": n_pairs,
        "expected_pairs": manifest["expected_pairs"],
        "kept": n_kept,
        "expected_kept": manifest["expected_kept"],
        "pairs_sec": round(t_pairs, 1),
        "cc_sec": round(t_cc, 1),
        "anti_sec": round(t_total - t_pairs - t_cc, 1),
        "total_sec": round(t_total, 1),
        "docs_per_sec": round(manifest["n_docs"] / t_total, 0),
        "driver_peak_rss_gb": round(peak_rss_gb, 2),
        "driver_rss_phases_gb": rss_phases,
        "exact_match": ok_pairs and ok_kept,
    }))
    assert ok_pairs, (n_pairs, manifest["expected_pairs"])
    assert ok_kept, (n_kept, manifest["expected_kept"])


if __name__ == "__main__":
    main()
