"""Partitioned-decontamination soak: the corpus-proportional-benchmark
scenario the broadcast plan can't scale to, at 10^6 docs.

The round-3 advisor flagged that ``decontaminate_docs``'s benchmark side
(``doc_id % 29 == 0``, ~1/29 of the corpus) grows linearly with corpus
scale, so the driver-side gram-hash broadcast is a latent bottleneck.
This soak evidences the fix (``build_benchmark_store`` +
``decontaminate_partitioned``) at 1M docs on the SAME planted corpus and
closed-form oracle as tools/soak_corpus_stats.py:

- both plans must return EXACTLY the expected {doc_id: n_hits} dict
  (planted phrase classes, modular arithmetic — no sampling);
- the partitioned plan's driver/broadcast object is the bloom filter
  (~2 B/gram at bits_per_key=16) instead of the raw 8 B/gram hash
  array, and the exact gram set lives in sharded parquet read
  one-shard-at-a-time by workers — the JSON reports both sizes;
- the bloom prefilter's shuffle selectivity is measured: candidate
  (bshard, gram_h, doc_id) rows that cross the one hash shuffle vs the
  corpus's total distinct (doc, gram) pairs.

Run from the repo root:  python tools/soak_decontam_partitioned.py [--docs N]
"""
import argparse
import json
import os
import resource
import shutil
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_corpus_stats import (BENCH_MOD, expected_decontam,  # noqa: E402
                               gen_corpus)


def _peak_rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/ptt_corpus_stats_soak")
    args = ap.parse_args()
    n = args.docs

    corpus = os.path.join(args.out, "docs")
    marker = os.path.join(args.out, "manifest.json")
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = json.load(f).get("n_docs")
    if have != n:
        shutil.rmtree(corpus, ignore_errors=True)
        print(f"generating {n:,} docs ...", file=sys.stderr)
        t0 = time.time()
        gen_corpus(corpus, n)
        with open(marker, "w") as f:
            json.dump({"n_docs": n, "gen_sec": round(time.time() - t0, 1)}, f)
    print(f"corpus ready ({n:,} docs)", file=sys.stderr)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops import decontam as dc
    from pttcrawler_ray.util.rayops import read_parquet_clean

    def is_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD == 0))

    def not_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD != 0))

    def fresh():
        d = read_parquet_clean(corpus)
        return (d.map_batches(not_bench, batch_format="pyarrow"),
                d.map_batches(is_bench, batch_format="pyarrow"))

    exp = expected_decontam(n)
    timings: dict[str, float] = {}

    # --- partitioned plan (store build + scan) ----------------------------
    store = os.path.join(args.out, "bench_store")
    shutil.rmtree(store, ignore_errors=True)
    corpus_ds, bench_ds = fresh()
    t0 = time.time()
    mf = dc.build_benchmark_store(bench_ds, store, n=5)
    timings["store_build"] = round(time.time() - t0, 1)
    t0 = time.time()
    got = dc.decontaminate_partitioned(corpus_ds, store).to_pandas()
    timings["partitioned_scan"] = round(time.time() - t0, 1)
    got_p = dict(zip(got["doc_id"].astype(int), got["n_hits"].astype(int)))
    assert got_p == exp, (len(got_p), len(exp))
    rss_after_partitioned = _peak_rss_gb()
    print(f"partitioned: exact {len(exp):,}-doc hit set in "
          f"{timings['partitioned_scan']}s (store {timings['store_build']}s)",
          file=sys.stderr)

    # --- shuffle selectivity of the bloom prefilter -----------------------
    import numpy as np

    z = np.load(os.path.join(store, "bloom.npz"), allow_pickle=False)
    snap = {"nbits": int(z["nbits"]), "k": int(z["k"]),
            "count": int(z["count"]), "words": z["words"].tobytes()}
    bloom_ref = ray.put(snap)
    corpus_ds, _ = fresh()
    cand = corpus_ds.map_batches(
        dc._corpus_candidates_batch,
        fn_kwargs={"bloom_ref": bloom_ref, "n": 5,
                   "n_shards": mf["n_shards"], "id_col": "doc_id",
                   "text_col": "text"},
        batch_format="pyarrow").count()

    def all_pairs(t: pa.Table) -> pa.Table:
        gh, gp = dc._gram_hashes(t["text"], 5)
        gh, gp = dc._distinct_per_parent(gh, gp)
        return pa.table({"c": pa.array([len(gh)], pa.int64())})

    corpus_ds, _ = fresh()
    total_pairs = int(corpus_ds.map_batches(
        all_pairs, batch_format="pyarrow").sum("c"))

    # --- broadcast plan (the pre-existing path, same oracle) ---------------
    corpus_ds, bench_ds = fresh()
    t0 = time.time()
    got = dc.decontaminate(corpus_ds, bench_ds, n=5).to_pandas()
    timings["broadcast_scan"] = round(time.time() - t0, 1)
    got_b = dict(zip(got["doc_id"].astype(int), got["n_hits"].astype(int)))
    assert got_b == exp

    bloom_mb = round(int(z["nbits"]) / 8 / 1e6, 2)
    raw_mb = round(mf["n_grams"] * 8 / 1e6, 2)
    print(json.dumps({
        "metric": "decontam_partitioned_soak", "n_docs": n,
        "bench_docs_frac": f"1/{BENCH_MOD}", "n_bench_grams": mf["n_grams"],
        "timings_sec": timings,
        "docs_per_sec_partitioned": int(n / timings["partitioned_scan"]),
        "driver_broadcast_mb": {"bloom_partitioned": bloom_mb,
                                "raw_hashes_broadcast": raw_mb},
        "shuffled_candidate_rows": cand,
        "corpus_doc_gram_pairs": total_pairs,
        "shuffle_selectivity": round(cand / max(total_pairs, 1), 6),
        "contaminated_docs": len(exp),
        "driver_peak_rss_gb_after_partitioned": rss_after_partitioned,
        "driver_peak_rss_gb": _peak_rss_gb(),
        "exact_match_both_plans": True,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
