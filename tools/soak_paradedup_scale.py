"""Paragraph-dedup-at-scale soak: paragraph_dedup on a 10^6-doc corpus.

Evidence tool for the paragraph-level boilerplate remover
(``textops/paradedup.py``; BASELINE.md "Paragraph-dedup soak"): a
deterministic planted corpus pushes both rewrite plans through their
at-scale branches and checks the output EXACTLY against two independent
oracles — a closed-form drop count from the planted structure, and a
full-content DuckDB run of :func:`paragraph_dedup_sql` (which groups by
the paragraph STRING, so it also cross-checks the 64-bit hash identity
at 8M paragraphs).

Planted structure (n_docs docs x 8 paragraphs each, sep = blank line):

- paragraph slot (i % 5) of every doc i is one of B=40 boilerplate
  strings (``i % B``): each repeats n_docs/B times corpus-wide, so with
  keep_first the expected drops from boilerplate = n_docs - B;
- docs 2m and 2m+1 (m < n_pairs) share one paragraph ``s{m} ...`` in
  their last slot → exactly-twice repeats at the min_count=2 boundary,
  + n_pairs drops;
- every other slot is a namespaced unique paragraph (never repeats).

Expected: n_paras = 8*n_docs; dropped = (n_docs - B) + n_pairs.  With
~1.1M drop keys at 1M docs the broadcast rewrite plan engages naturally
(< _BCAST_DROP_MAX = 2M); the soak then forces the doc_id co-partition
plan (_BCAST_DROP_MAX = 0) and requires a byte-identical content hash —
both plans, one corpus, same exact answer.

Content equality is a full-corpus check without a driver-side frame
sort: each side reduces to sum-mod-2^64 of blake2b-64("doc_id|text_clean")
(Ray side distributed via map_batches; DuckDB side hashed in-driver from
the fetched frame).

Run from the repo root:  python tools/soak_paradedup_scale.py [--docs N]
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

N_BOILER = 40
SEP = "\n\n"


def gen_corpus(out_dir: str, n_docs: int, n_pairs: int,
               chunk: int = 50_000) -> dict:
    """Deterministic planted corpus; returns the expected-count manifest."""
    assert 2 * n_pairs <= n_docs
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(20260819)
    boiler = [" ".join(f"b{b}w{j}" for j in range(10)) for b in range(N_BOILER)]

    t0 = time.time()
    for start in range(0, n_docs, chunk):
        end = min(start + chunk, n_docs)
        texts = []
        uniq = rng.integers(0, 1 << 62, size=(end - start, 8))
        for i in range(start, end):
            paras = [f"d{i}p{j} u{uniq[i - start, j]}" for j in range(8)]
            paras[i % 5] = boiler[i % N_BOILER]
            if i < 2 * n_pairs:
                paras[7] = f"s{i // 2} shared tail paragraph"
            texts.append(SEP.join(paras))
        pq.write_table(
            pa.table({"doc_id": pa.array(range(start, end), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(out_dir, f"part-{start:08d}.parquet"))
    return {"n_docs": n_docs, "n_pairs": n_pairs,
            "gen_sec": round(time.time() - t0, 1),
            "expected_paras": 8 * n_docs,
            "expected_drops": (n_docs - N_BOILER) + n_pairs}


def _rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1e6, 2)
    return -1.0


def _content_sum_batch(t: pa.Table) -> pa.Table:
    """One uint64 partial per batch: sum mod 2^64 of
    blake2b-64(doc_id|text_clean)."""
    from pttcrawler_ray.util.hashing import hash_u64_many

    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    txt = t["text_clean"].to_pylist()
    h = hash_u64_many([f"{i}|{s}" for i, s in zip(ids, txt)])
    acc = np.uint64(np.sum(h.astype(np.uint64), dtype=np.uint64))
    return pa.table({"part": pa.array([acc], pa.uint64()),
                     "n_dropped": pa.array(
                         [int(t["n_dropped"].to_numpy().sum())], pa.int64()),
                     "n_paras": pa.array(
                         [int(t["n_paras"].to_numpy().sum())], pa.int64()),
                     "n_rows": pa.array([len(t)], pa.int64())})


def _run_plan(corpus: str) -> dict:
    from pttcrawler_ray.textops.paradedup import paragraph_dedup
    from pttcrawler_ray.util.rayops import read_parquet_clean

    t0 = time.time()
    out = paragraph_dedup(read_parquet_clean(corpus), sep=SEP)
    parts = out.map_batches(_content_sum_batch, batch_format="pyarrow") \
        .to_pandas()
    return {"sec": round(time.time() - t0, 1),
            "rows": int(parts["n_rows"].sum()),
            "dropped": int(parts["n_dropped"].sum()),
            "paras": int(parts["n_paras"].sum()),
            "content_sum": int(np.sum(parts["part"].to_numpy(np.uint64),
                                      dtype=np.uint64))}


def _duckdb_oracle(corpus: str) -> dict:
    import duckdb

    from pttcrawler_ray.textops.paradedup import paragraph_dedup_sql
    from pttcrawler_ray.util.hashing import hash_u64_many

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus}/*.parquet')")
    t0 = time.time()
    df = con.execute(paragraph_dedup_sql("documents", SEP)).fetch_df()
    h = hash_u64_many([f"{i}|{s}" for i, s in
                       zip(df["doc_id"].to_numpy(np.int64), df["text_clean"])])
    return {"sec": round(time.time() - t0, 1), "rows": len(df),
            "dropped": int(df["n_dropped"].sum()),
            "paras": int(df["n_paras"].sum()),
            "content_sum": int(np.sum(h.astype(np.uint64), dtype=np.uint64))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--pairs", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/ptt_paradedup_soak")
    args = ap.parse_args()

    corpus = os.path.join(args.out, "docs")
    marker = os.path.join(args.out, "manifest.json")
    manifest = None
    if os.path.exists(marker):
        with open(marker) as f:
            manifest = json.load(f)
        if (manifest.get("n_docs") != args.docs
                or manifest.get("n_pairs") != args.pairs):
            manifest = None
    if manifest is None:
        shutil.rmtree(corpus, ignore_errors=True)
        print(f"generating {args.docs:,} docs ...", file=sys.stderr)
        manifest = gen_corpus(corpus, args.docs, args.pairs)
        with open(marker, "w") as f:
            json.dump(manifest, f)
    print(f"corpus ready ({manifest['n_docs']:,} docs)", file=sys.stderr)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops import paradedup

    rss = {"start": _rss_gb()}
    bcast = _run_plan(corpus)
    rss["after_broadcast_plan"] = _rss_gb()

    paradedup._BCAST_DROP_MAX = 0  # force the doc_id co-partition plan
    shuf = _run_plan(corpus)
    rss["after_copartition_plan"] = _rss_gb()
    ray.shutdown()

    oracle = _duckdb_oracle(corpus)
    rss["after_duckdb_oracle"] = _rss_gb()

    expected = {"rows": manifest["n_docs"],
                "paras": manifest["expected_paras"],
                "dropped": manifest["expected_drops"]}
    exact = all(
        plan[k] == expected[k]
        for plan in (bcast, shuf, oracle) for k in expected
    ) and bcast["content_sum"] == shuf["content_sum"] == oracle["content_sum"]

    peak = round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    print(json.dumps({
        "metric": "paragraph-dedup soak (both rewrite plans) vs closed-form "
                  "+ string-grouped DuckDB twin",
        "n_docs": manifest["n_docs"],
        "expected": expected,
        "broadcast_plan": bcast,
        "copartition_plan": shuf,
        "duckdb_oracle": oracle,
        "docs_per_sec": round(manifest["n_docs"] / bcast["sec"], 0),
        "driver_peak_rss_gb": peak,
        "driver_rss_phases_gb": rss,
        "exact_match": exact,
    }))
    sys.exit(0 if exact else 1)


if __name__ == "__main__":
    main()
