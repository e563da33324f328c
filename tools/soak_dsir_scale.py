"""DSIR-at-scale soak: hashed-ngram importance resampling on 10^6 docs.

Evidence tool for :mod:`pttcrawler_ray.textops.dsir` (BASELINE.md "DSIR
soak"): a deterministic planted corpus gives the selection a closed-form
answer AND every weight an exact sequential replay —

- target corpus: 2,000 docs over a 50-token domain vocabulary
  (``t0..t49``, doc i = 25 consecutive tokens starting at ``i % 50``);
- raw corpus: N docs; ``i % 10 == 0`` are target-like (same pattern),
  the rest junk (``c{i%97}`` + 24 globally unique tokens).  With B=10k
  buckets the ~100 target-hot buckets carry ratio ≈ +2.1 nats and the
  cold buckets ≈ −2.4, so target-like docs score ≈ +100e6 ppm and junk
  ≈ −110e6 ppm — a gap no Gumbel draw (±40e6 ppm) can cross, hence
  ``selected == (doc_id % 10 == 0)`` exactly at ``k = N/10``;
- the replay recomputes counts, the math.log ratio table, per-doc
  add.at sums in the engine's flat order, and the integer top-k cut
  over the full corpus in one numpy pass per parquet file (no Ray),
  asserting EVERY (n_grams, logw_ppm, key_ppm, selected) row equal.

Run from the repo root:  python tools/soak_dsir_scale.py [--docs N]
"""
import argparse
import json
import math
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS, SALT, ALPHA, KR = 10_000, 7, 1.0, np.uint64(1000003)
N_TARGET, VOCAB, DLEN = 2_000, 50, 25


def target_tokens(i: int) -> list[str]:
    return [f"t{(i + j) % VOCAB}" for j in range(DLEN)]


def raw_tokens(i: int) -> list[str]:
    if i % 10 == 0:
        return target_tokens(i)
    return [f"c{i % 97}"] + [f"u{i}_{j}" for j in range(DLEN - 1)]


def gen(out_dir: str, n_docs: int, fn, chunk: int = 50_000) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for start in range(0, n_docs, chunk):
        end = min(start + chunk, n_docs)
        texts = [" ".join(fn(i)) for i in range(start, end)]
        pq.write_table(
            pa.table({"doc_id": pa.array(range(start, end), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(out_dir, f"part-{start:08d}.parquet"))


def replay_counts_and_sums(files, ratio=None):
    """One numpy pass per file: bucket counts, and (when ``ratio`` is
    given) per-doc (n_grams, weight-sum) in the engine's flat add.at
    order.  Sequential (no Ray), memory = one file at a time."""
    from pttcrawler_ray.textops.decontam import _gram_hashes

    counts = np.zeros(BUCKETS, np.int64)
    ids_all, ng_all, sums_all = [], [], []
    for f in files:
        t = pq.read_table(f)
        ng = np.zeros(t.num_rows, np.int64)
        sums = np.zeros(t.num_rows, np.float64)
        for n in (1, 2):
            gh, parents = _gram_hashes(t["text"], n)
            if not len(gh):
                continue
            bk = (gh % np.uint64(BUCKETS)).astype(np.int64)
            counts += np.bincount(bk, minlength=BUCKETS)
            if ratio is not None:
                np.add.at(sums, parents, ratio[bk])
                ng += np.bincount(parents, minlength=t.num_rows)
        if ratio is not None:
            ids_all.append(t["doc_id"].to_numpy())
            ng_all.append(ng)
            sums_all.append(sums)
    if ratio is None:
        return counts
    return (np.concatenate(ids_all), np.concatenate(ng_all),
            np.concatenate(sums_all))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/ptt_dsir_soak")
    ap.add_argument("--classifier", action="store_true",
                    help="soak the GPT-3-style quality classifier "
                         "(textops/classifier.py) on the same corpus "
                         "instead of DSIR")
    args = ap.parse_args()
    k = args.docs // 10

    raw_dir = os.path.join(args.out, "raw")
    tgt_dir = os.path.join(args.out, "target")
    marker = os.path.join(args.out, "manifest.json")
    key = {"n": args.docs, "v": 1}
    if not (os.path.exists(marker) and json.load(open(marker)) == key):
        shutil.rmtree(raw_dir, ignore_errors=True)
        shutil.rmtree(tgt_dir, ignore_errors=True)
        print(f"generating {args.docs:,} raw docs ...", file=sys.stderr)
        gen(raw_dir, args.docs, raw_tokens)
        gen(tgt_dir, N_TARGET, target_tokens)
        with open(marker, "w") as f:
            json.dump(key, f)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.dsir import dsir_select
    from pttcrawler_ray.util.rayops import read_parquet_clean

    if args.classifier:
        _classifier_soak(args, raw_dir, tgt_dir)
        return

    t0 = time.time()
    marked = dsir_select(read_parquet_clean(raw_dir),
                         read_parquet_clean(tgt_dir), k=k,
                         buckets=BUCKETS, salt=SALT).materialize()
    n_rows = marked.count()
    t_engine = time.time() - t0
    got = marked.to_pandas().sort_values("doc_id")  # 4 int cols, soak-only

    # sequential replay (numpy, no Ray, engine's documented op order)
    t1 = time.time()
    raw_files = sorted(os.path.join(raw_dir, f) for f in os.listdir(raw_dir))
    tgt_files = sorted(os.path.join(tgt_dir, f) for f in os.listdir(tgt_dir))
    tc = replay_counts_and_sums(tgt_files)
    rc = replay_counts_and_sums(raw_files)
    tp = float(int(tc.sum()) + ALPHA * BUCKETS)
    rp = float(int(rc.sum()) + ALPHA * BUCKETS)
    ratio = np.array(
        [math.log((int(t) + ALPHA) / tp) - math.log((int(r) + ALPHA) / rp)
         for t, r in zip(tc, rc)], np.float64)
    ids, ng, sums = replay_counts_and_sums(raw_files, ratio=ratio)
    order = np.argsort(ids, kind="stable")
    ids, ng, sums = ids[order], ng[order], sums[order]
    logw = np.floor(sums * 1e6).astype(np.int64)
    from pttcrawler_ray.util.hashing import splitmix64

    h = splitmix64(ids.astype(np.uint64) + np.uint64(SALT))
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0 ** -53
    kk = logw + np.floor(-np.log(-np.log(u)) * 1e6).astype(np.int64)
    cut = np.lexsort((ids, -kk))[k - 1]
    ck, ci = int(kk[cut]), int(ids[cut])
    sel = ((kk > ck) | ((kk == ck) & (ids <= ci)))
    t_oracle = time.time() - t1

    ok = (n_rows == args.docs
          and np.array_equal(got["doc_id"].to_numpy(np.int64), ids)
          and np.array_equal(got["n_grams"].to_numpy(np.int64), ng)
          and np.array_equal(got["logw_ppm"].to_numpy(np.int64), logw)
          and np.array_equal(got["key_ppm"].to_numpy(np.int64), kk)
          and np.array_equal(got["selected"].to_numpy(np.int32), sel.astype(np.int32)))
    closed_form = bool((sel == (ids % 10 == 0)).all())

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    print(json.dumps({
        "metric": "DSIR soak (2 count passes + ratio broadcast + score "
                  "pass + integer gumbel-top-k) vs sequential replay",
        "n_raw_docs": args.docs, "n_target_docs": N_TARGET,
        "buckets": BUCKETS, "k": k,
        "selected": int(sel.sum()),
        "selection_is_target_class": closed_form,
        "engine_sec": round(t_engine, 1), "oracle_sec": round(t_oracle, 1),
        "docs_per_sec": round(args.docs / t_engine, 0),
        "driver_peak_rss_gb": round(peak, 2),
        "exact_match": bool(ok),
    }))
    assert ok and closed_form


def _classifier_soak(args, raw_dir: str, tgt_dir: str) -> None:
    """Quality-classifier soak on the DSIR corpus: engine scores + Pareto
    keeps vs a sequential numpy replay of the documented spec; the
    planted class structure gives the keep rates a closed-form shape
    (target-like docs score ~0.89, junk ~0.09 → keep ~38% vs ~0.3% at
    alpha=9)."""
    import ray

    from pttcrawler_ray.textops.classifier import quality_classifier
    from pttcrawler_ray.util.hashing import splitmix64
    from pttcrawler_ray.util.rayops import read_parquet_clean

    CLF_SALT, CLF_ALPHA = 13, 9.0
    t0 = time.time()
    marked = quality_classifier(read_parquet_clean(raw_dir),
                                read_parquet_clean(tgt_dir),
                                buckets=BUCKETS, pareto_alpha=CLF_ALPHA,
                                salt=CLF_SALT).materialize()
    n_rows = marked.count()
    t_engine = time.time() - t0
    got = marked.to_pandas().sort_values("doc_id")  # 5 int cols, soak-only

    t1 = time.time()
    raw_files = sorted(os.path.join(raw_dir, f) for f in os.listdir(raw_dir))
    tgt_files = sorted(os.path.join(tgt_dir, f) for f in os.listdir(tgt_dir))
    tc = replay_counts_and_sums(tgt_files)
    rc = replay_counts_and_sums(raw_files)
    tp = float(int(tc.sum()) + ALPHA * BUCKETS)
    rp = float(int(rc.sum()) + ALPHA * BUCKETS)
    ratio = np.array(
        [math.log((int(t) + ALPHA) / tp) - math.log((int(r) + ALPHA) / rp)
         for t, r in zip(tc, rc)], np.float64)
    ids, ng, sums = replay_counts_and_sums(raw_files, ratio=ratio)
    order = np.argsort(ids, kind="stable")
    ids, ng, sums = ids[order], ng[order], sums[order]
    logit = sums / np.maximum(ng, 1)
    score_ppm = np.floor(1.0 / (1.0 + np.exp(-logit)) * 1e6).astype(np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(CLF_SALT))
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0 ** -53
    pareto_ppm = np.floor((u ** (-1.0 / CLF_ALPHA) - 1.0) * 1e6) \
        .astype(np.int64)
    kept = (score_ppm + pareto_ppm > 10 ** 6).astype(np.int32)
    t_oracle = time.time() - t1

    ok = (n_rows == args.docs
          and np.array_equal(got["doc_id"].to_numpy(np.int64), ids)
          and np.array_equal(got["n_grams"].to_numpy(np.int64), ng)
          and np.array_equal(got["score_ppm"].to_numpy(np.int64), score_ppm)
          and np.array_equal(got["pareto_ppm"].to_numpy(np.int64),
                             pareto_ppm)
          and np.array_equal(got["kept"].to_numpy(np.int32), kept))
    is_target = ids % 10 == 0
    rate_t = float(kept[is_target].mean())
    rate_j = float(kept[~is_target].mean())

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    print(json.dumps({
        "metric": "quality-classifier soak (NB fit + sigmoid score + "
                  "integer Pareto keep) vs sequential replay",
        "n_raw_docs": args.docs, "n_target_docs": N_TARGET,
        "buckets": BUCKETS, "pareto_alpha": CLF_ALPHA,
        "kept": int(kept.sum()),
        "keep_rate_target_class": round(rate_t, 4),
        "keep_rate_junk_class": round(rate_j, 5),
        "engine_sec": round(t_engine, 1), "oracle_sec": round(t_oracle, 1),
        "docs_per_sec": round(args.docs / t_engine, 0),
        "driver_peak_rss_gb": round(peak, 2),
        "exact_match": bool(ok),
    }))
    assert ok and rate_t > 10 * max(rate_j, 1e-9)


if __name__ == "__main__":
    main()
