"""Prepare-pipeline soak: the FULL training-data composition at 10^6 docs.

`textops/prepare.prepare` chains curate → decontaminate → split →
domain-mix → pack and writes the training layout; each stage is soaked
individually (BASELINE.md), but a real user runs the composition, and
interface drift between stages is exactly what per-op soaks can't catch.
This tool runs `prepare()` end-to-end on the same planted 1M-doc corpus
as `soak_dedup_scale.py` and asserts EVERY count and EVERY written row
against an oracle that composes:

- a closed-form expected curated-id set (the planted dedup structure:
  min-id per 4-doc cluster, 256-cap per boilerplate class — see
  soak_dedup_scale.py's docstring for the arithmetic);
- a closed-form contaminated set: the benchmark parquet is built from
  the variant-0 text of every 100th cluster, so exactly those kept docs
  share a word 5-gram with it;
- DuckDB as the independent engine for everything hash- or
  prefix-sum-shaped: the library's own SQL twins (`split_sql`,
  `stratified_sample_sql` — pinned to the engine at small scale by the
  driver's †queries) run over the expected id set, and the pack map is
  re-derived with a DuckDB window sum over (doc_id, n_tok).

Asserted exactly: curated / contaminated / per-split doc counts, the
full sorted doc_id array of every written split, every row of the
written pack_train map, and the token totals in the manifest.

Run from the repo root:  python tools/soak_prepare_scale.py [--docs N]
(~3-6 min at 1M docs depending on the host window).
"""
import argparse
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from soak_dedup_scale import (CLASS_SZ, CLUSTER_SZ, N_CLASSES,  # noqa: E402
                              N_CLUSTERS, _rss_gb, gen_corpus)

BENCH_EVERY = 100        # every 100th cluster's keeper seeds the benchmark
BENCH_ID_OFFSET = 10**9  # benchmark doc ids live in their own range
RATIOS = {"train": 0.98, "val": 0.01, "test": 0.01}
MIX_RATES = {"en": 0.8}  # all planted docs LangId to 'en' (8 en stopword
                         # hits vs 1 de) — asserted below before relying on it
SEQ_LEN = 512
QUALITY_MIN = 0.3
DEDUP_THRESHOLD = 0.8
DECONTAM_N = 5
SPLIT_SALT, MIX_SALT = 0, 1


def expected_curated_ids(manifest: dict) -> np.ndarray:
    """The exact post-curate id set (sorted) for the planted corpus."""
    n_clusters, n_classes = manifest["n_clusters"], manifest["n_classes"]
    n_docs = manifest["n_docs"]
    cluster_keep = CLUSTER_SZ * np.arange(n_clusters, dtype=np.int64)
    base = n_clusters * CLUSTER_SZ
    class_keep = []
    for k in range(n_classes):
        lo = base + k * CLASS_SZ
        # bucket capped to the 256 smallest ids; CC keeps the min id,
        # drops the other 255; ids 256.. survive untouched
        class_keep.append(np.r_[lo, np.arange(lo + 256, lo + CLASS_SZ)])
    unique = np.arange(base + n_classes * CLASS_SZ, n_docs, dtype=np.int64)
    return np.sort(np.concatenate([cluster_keep, *class_keep, unique]))


def expected_contaminated_ids(manifest: dict) -> np.ndarray:
    """Kept docs sharing a 5-gram with the benchmark: exactly the
    variant-0 docs whose cluster seeded it (exact-text copies)."""
    cs = np.arange(0, manifest["n_clusters"], BENCH_EVERY, dtype=np.int64)
    return cs * CLUSTER_SZ


def expected_n_tok(ids: np.ndarray, manifest: dict) -> np.ndarray:
    """Whitespace token count per planted doc: cluster docs carry the
    extra variant token (41), class/unique docs are 40."""
    n_cluster_docs = manifest["n_clusters"] * CLUSTER_SZ
    return np.where(ids < n_cluster_docs, 41, 40).astype(np.int64)


def gen_benchmark(corpus: str, bench_dir: str, manifest: dict) -> int:
    """Benchmark parquet = exact text of every BENCH_EVERY-th cluster's
    keeper, re-keyed into its own id range."""
    import duckdb

    os.makedirs(bench_dir, exist_ok=True)
    n_cluster_docs = manifest["n_clusters"] * CLUSTER_SZ
    con = duckdb.connect()
    t = con.execute(
        f"SELECT doc_id + {BENCH_ID_OFFSET} AS doc_id, text "
        f"FROM read_parquet('{corpus}/*.parquet') "
        f"WHERE doc_id < {n_cluster_docs} AND doc_id % {CLUSTER_SZ} = 0 "
        f"  AND (doc_id // {CLUSTER_SZ}) % {BENCH_EVERY} = 0 "
        f"ORDER BY doc_id").arrow()
    pq.write_table(t, os.path.join(bench_dir, "bench.parquet"))
    con.close()
    return t.num_rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/ptt_dedup_soak")
    ap.add_argument("--dest", default="/tmp/ptt_prepare_soak")
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

    bench_dir = os.path.join(args.out, "bench")
    n_bench = gen_benchmark(corpus, bench_dir, manifest)
    shutil.rmtree(args.dest, ignore_errors=True)

    # ---------------- oracle side (numpy closed form + DuckDB twins)
    import duckdb
    import pandas as pd

    from pttcrawler_ray.textops.sampling import (split_sql,
                                                 stratified_sample_sql)

    t_or = time.time()
    kept_ids = expected_curated_ids(manifest)
    contaminated = expected_contaminated_ids(manifest)
    assert np.isin(contaminated, kept_ids).all()
    post = np.setdiff1d(kept_ids, contaminated)
    exp_tbl = pd.DataFrame({"doc_id": post,
                            "n_tok": expected_n_tok(post, manifest),
                            "pred_lang": "en"})
    con = duckdb.connect()
    con.register("kept", exp_tbl)
    con.execute("CREATE TABLE split AS " +
                split_sql("kept", RATIOS, salt=SPLIT_SALT,
                          columns="n_tok, pred_lang"))
    exp_split_counts = dict(con.execute(
        "SELECT split, count(*) FROM split GROUP BY split").fetchall())
    con.execute(
        "CREATE TABLE train_mixed AS " +
        stratified_sample_sql("(SELECT * FROM split WHERE split = 'train')",
                              MIX_RATES, "pred_lang", salt=MIX_SALT,
                              columns="n_tok"))
    exp_docs = {"train": con.execute(
                    "SELECT count(*) FROM train_mixed").fetchone()[0],
                "val": exp_split_counts.get("val", 0),
                "test": exp_split_counts.get("test", 0)}
    exp_pack = con.execute("""
        SELECT doc_id, n_tok,
               CAST(coalesce(sum(n_tok + 1) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS tok_start,
               CAST(coalesce(sum(n_tok + 1) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) // {s} AS start_example,
               CAST(coalesce(sum(n_tok + 1) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) % {s} AS start_offset,
               (CAST(coalesce(sum(n_tok + 1) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) + n_tok) // {s} AS end_example
        FROM train_mixed ORDER BY doc_id""".format(s=SEQ_LEN)).fetchdf()
    exp_train_ids = exp_pack["doc_id"].to_numpy(np.int64)
    exp_val_ids = np.sort(con.execute(
        "SELECT doc_id FROM split WHERE split='val'").fetchdf()
        ["doc_id"].to_numpy(np.int64))
    exp_test_ids = np.sort(con.execute(
        "SELECT doc_id FROM split WHERE split='test'").fetchdf()
        ["doc_id"].to_numpy(np.int64))
    exp_total_tok = int((exp_pack["n_tok"] + 1).sum())
    con.close()
    t_oracle = time.time() - t_or

    # ---------------- engine side
    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.prepare import prepare
    from pttcrawler_ray.util.rayops import read_parquet_clean

    docs = read_parquet_clean(corpus)
    bench = read_parquet_clean(bench_dir)
    rss_phases = {"start": _rss_gb()}
    t0 = time.time()
    m = prepare(docs, bench, args.dest, quality_min=QUALITY_MIN,
                dedup_threshold=DEDUP_THRESHOLD, decontam_n=DECONTAM_N,
                ratios=RATIOS, mix_rates=MIX_RATES, seq_len=SEQ_LEN,
                split_salt=SPLIT_SALT, mix_salt=MIX_SALT)
    t_prepare = time.time() - t0
    rss_phases["after_prepare"] = _rss_gb()

    # ---------------- compare (all driver reads are output-sized)
    checks = {
        "curated": (m["stages"]["curated_docs"], int(kept_ids.size)),
        "contaminated": (m["stages"]["contaminated_docs"],
                         int(contaminated.size)),
        "docs_train": (m["stages"]["docs_train"], int(exp_docs["train"])),
        "docs_val": (m["stages"]["docs_val"], int(exp_docs["val"])),
        "docs_test": (m["stages"]["docs_test"], int(exp_docs["test"])),
        "pack_rows": (m["stages"]["pack_rows"], len(exp_pack)),
        "train_tokens": (m["stages"]["train_tokens_with_eos"],
                         exp_total_tok),
        "bench_docs": (n_bench, int(contaminated.size)),
    }
    # every written row: split membership is the exact expected id set
    for label, exp_ids in (("train", exp_train_ids), ("val", exp_val_ids),
                           ("test", exp_test_ids)):
        got = pq.read_table(os.path.join(args.dest, "docs",
                                         f"split={label}"),
                            columns=["doc_id"])["doc_id"] \
            .to_numpy(zero_copy_only=False)
        checks[f"ids_{label}"] = (bool(np.array_equal(np.sort(got),
                                                      np.sort(exp_ids))), True)
    got_pack = pq.read_table(os.path.join(args.dest, "pack_train")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pack_cols = ["doc_id", "n_tok", "tok_start", "start_example",
                 "start_offset", "end_example"]
    pd_ok = True
    try:
        pd.testing.assert_frame_equal(
            got_pack[pack_cols].astype("int64"),
            exp_pack[pack_cols].astype("int64"))
    except AssertionError:
        pd_ok = False
    checks["pack_rows_exact"] = (pd_ok, True)

    ok = all(g == e for g, e in checks.values())
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    print(json.dumps({
        "metric": "prepare-pipeline soak (curate→decontam→split→mix→pack "
                  "composition) vs closed-form + DuckDB-twin oracle",
        "n_docs": manifest["n_docs"],
        "manifest_stages": m["stages"],
        "expected": {k: e for k, (g, e) in checks.items()},
        "got": {k: g for k, (g, e) in checks.items()},
        "prepare_sec": round(t_prepare, 1),
        "oracle_sec": round(t_oracle, 1),
        "docs_per_sec": round(manifest["n_docs"] / t_prepare, 0),
        "driver_peak_rss_gb": round(peak, 2),
        "driver_rss_phases_gb": rss_phases,
        "exact_match": ok,
    }))
    bad = {k: v for k, v in checks.items() if v[0] != v[1]}
    assert ok, bad


if __name__ == "__main__":
    main()
