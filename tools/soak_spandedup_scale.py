"""Span-dedup-at-scale soak: repeated-span removal on a 10^6-doc corpus.

Evidence tool for the exact-substring dedup (``textops/spandedup.py``;
BASELINE.md "Span-dedup soak"): a deterministic planted corpus pushes
both rewrite plans through their branches and checks the output EXACTLY
against two independent oracles — closed-form counts from the planted
structure, and a full-content DuckDB run of :func:`span_dedup_sql`
(which groups by the span's token STRING, cross-checking the 64-bit
Karp-Rabin hash at ~33M windows).

Planted structure (n_docs docs x 40 tokens each, k = 8):

- tokens [8, 24) of every doc i are one of B=40 boilerplate 16-token
  sentences (``i % B``): each repeats n_docs/B times corpus-wide; all 9
  of its k-windows repeat, and their interval union is exactly the 16
  boilerplate tokens, so every non-first occurrence loses 16 tokens;
- docs 2m and 2m+1 (m < n_pairs) share one exactly-k-token span at the
  tail (the min_count=2 boundary, one window): doc 2m+1 loses 8 tokens;
- every other token is namespaced-unique, so windows crossing a planted
  boundary never repeat.

Expected: rows = n_docs; sum n_tokens = 40 n_docs; sum n_dropped =
16 (n_docs - B) + 8 n_pairs.  At 1M docs the drop map is ~9M rows
(> _BCAST_DROP_MAX = 2M), so the doc_id co-partition rewrite engages
NATURALLY; the soak then forces the broadcast plan (_BCAST_DROP_MAX =
10^9) and requires a byte-identical content hash — both plans, one
corpus, same exact answer.

Content equality is a full-corpus check without a driver-side frame
sort: sum mod 2^64 of blake2b-64("doc_id|text_clean") per side.

The string-grouped DuckDB twin runs on the FIRST ``--duckdb-docs``
(default 250k) documents: its ~8M gram-string explode is the measured
DuckDB ceiling on this host (the full 33M-window query dies on a bad
allocation even at memory_limit=100GB), and the planted structure is
PREFIX-CLOSED — every repeat of a doc < N' lives entirely below N'
(boilerplate firsts are docs 0..39, pair spans are adjacent ids), so
the engine run over the prefix corpus equals the full run restricted to
it.  The 1M run is still checked exactly via the closed form + the
cross-plan content hash.

Run from the repo root:  python tools/soak_spandedup_scale.py [--docs N]
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
K = 8


def gen_corpus(out_dir: str, n_docs: int, n_pairs: int,
               chunk: int = 50_000) -> dict:
    """Deterministic planted corpus; returns the expected-count manifest."""
    assert 2 * n_pairs <= n_docs
    os.makedirs(out_dir, exist_ok=True)
    boiler = [" ".join(f"b{b}w{j}" for j in range(16)) for b in range(N_BOILER)]

    t0 = time.time()
    for start in range(0, n_docs, chunk):
        end = min(start + chunk, n_docs)
        texts = []
        for i in range(start, end):
            toks = [f"d{i}t{j}" for j in range(40)]
            head = " ".join(toks[:8])
            mid = boiler[i % N_BOILER]
            tail = toks[24:]
            if i < 2 * n_pairs:
                tail[-K:] = [f"s{i // 2}w{j}" for j in range(K)]
            texts.append(f"{head} {mid} " + " ".join(tail))
        pq.write_table(
            pa.table({"doc_id": pa.array(range(start, end), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(out_dir, f"part-{start:08d}.parquet"))
    return {"n_docs": n_docs, "n_pairs": n_pairs,
            "gen_sec": round(time.time() - t0, 1),
            "expected_tokens": 40 * n_docs,
            "expected_dropped": 16 * (n_docs - N_BOILER) + K * n_pairs}


def _rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1e6, 2)
    return -1.0


def _content_sum_batch(t: pa.Table) -> pa.Table:
    from pttcrawler_ray.util.hashing import hash_u64_many

    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    txt = t["text_clean"].to_pylist()
    h = hash_u64_many([f"{i}|{s}" for i, s in zip(ids, txt)])
    acc = np.uint64(np.sum(h.astype(np.uint64), dtype=np.uint64))
    return pa.table({"part": pa.array([acc], pa.uint64()),
                     "n_dropped": pa.array(
                         [int(t["n_dropped"].to_numpy().sum())], pa.int64()),
                     "n_tokens": pa.array(
                         [int(t["n_tokens"].to_numpy().sum())], pa.int64()),
                     "n_rows": pa.array([len(t)], pa.int64())})


def _run_plan(corpus: str, files: "list[str] | None" = None) -> dict:
    from pttcrawler_ray.textops.spandedup import span_dedup
    from pttcrawler_ray.util.rayops import read_parquet_clean

    src = corpus if files is None else \
        [os.path.join(corpus, f) for f in files]
    t0 = time.time()
    out = span_dedup(read_parquet_clean(src), k=K)
    parts = out.map_batches(_content_sum_batch, batch_format="pyarrow") \
        .to_pandas()
    return {"sec": round(time.time() - t0, 1),
            "rows": int(parts["n_rows"].sum()),
            "dropped": int(parts["n_dropped"].sum()),
            "tokens": int(parts["n_tokens"].sum()),
            "content_sum": int(np.sum(parts["part"].to_numpy(np.uint64),
                                      dtype=np.uint64))}


def _duckdb_oracle(corpus: str, files: "list[str]") -> dict:
    import duckdb

    from pttcrawler_ray.textops.spandedup import span_dedup_sql
    from pttcrawler_ray.util.hashing import hash_u64_many

    con = duckdb.connect()
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET memory_limit='48GB'; "
                "SET temp_directory='/tmp/duck_spill'")
    flist = ", ".join(f"'{os.path.join(corpus, f)}'" for f in files)
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet([{flist}])")
    t0 = time.time()
    df = con.execute(span_dedup_sql("documents", k=K)).fetch_df()
    h = hash_u64_many([f"{i}|{s}" for i, s in
                       zip(df["doc_id"].to_numpy(np.int64), df["text_clean"])])
    return {"sec": round(time.time() - t0, 1), "rows": len(df),
            "dropped": int(df["n_dropped"].sum()),
            "tokens": int(df["n_tokens"].sum()),
            "content_sum": int(np.sum(h.astype(np.uint64), dtype=np.uint64))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--pairs", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/ptt_spandedup_soak")
    ap.add_argument("--duckdb-docs", type=int, default=250_000,
                    help="prefix size for the string-grouped DuckDB twin "
                         "(~8M gram strings is the host's DuckDB ceiling)")
    ap.add_argument("--skip-duckdb", action="store_true",
                    help="closed-form + cross-plan check only")
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

    from pttcrawler_ray.textops import spandedup

    rss = {"start": _rss_gb()}
    copart = _run_plan(corpus)  # ~9M drop rows > 2M: co-partition, naturally
    rss["after_copartition_plan"] = _rss_gb()

    spandedup._BCAST_DROP_MAX = 10 ** 9  # force the broadcast rewrite
    bcast = _run_plan(corpus)
    rss["after_broadcast_plan"] = _rss_gb()

    # prefix engine run for the string-grouped DuckDB comparison (the
    # planted structure is prefix-closed: full-run restriction == prefix
    # run, so this is a real slice of the same computation)
    prefix = oracle = None
    pfiles: "list[str]" = []
    if not args.skip_duckdb:
        all_files = sorted(f for f in os.listdir(corpus)
                           if f.endswith(".parquet"))
        n_pref = 0
        for f in all_files:
            if n_pref >= args.duckdb_docs:
                break
            pfiles.append(f)
            n_pref += pq.read_metadata(os.path.join(corpus, f)).num_rows
        prefix = _run_plan(corpus, pfiles)
        rss["after_prefix_plan"] = _rss_gb()
    ray.shutdown()

    if not args.skip_duckdb:
        oracle = _duckdb_oracle(corpus, pfiles)
        rss["after_duckdb_oracle"] = _rss_gb()

    expected = {"rows": manifest["n_docs"],
                "tokens": manifest["expected_tokens"],
                "dropped": manifest["expected_dropped"]}
    exact = all(p[k] == expected[k] for p in (copart, bcast)
                for k in expected) \
        and copart["content_sum"] == bcast["content_sum"]
    if oracle is not None:
        n_pref = prefix["rows"]
        pairs_in = min(manifest["n_pairs"], n_pref // 2)
        exp_pref = {"rows": n_pref, "tokens": 40 * n_pref,
                    "dropped": 16 * (n_pref - N_BOILER) + K * pairs_in}
        exact = exact \
            and all(p[k] == exp_pref[k] for p in (prefix, oracle)
                    for k in exp_pref) \
            and prefix["content_sum"] == oracle["content_sum"]

    peak = round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    print(json.dumps({
        "metric": "span-dedup soak (both rewrite plans) vs closed-form "
                  "+ string-grouped DuckDB twin",
        "n_docs": manifest["n_docs"],
        "expected": expected,
        "copartition_plan": copart,
        "broadcast_plan": bcast,
        "prefix_engine": prefix,
        "duckdb_oracle": oracle,
        "docs_per_sec": round(manifest["n_docs"] / copart["sec"], 1),
        "driver_peak_rss_gb": peak,
        "rss_gb": rss,
        "exact_match": bool(exact),
    }))
    sys.exit(0 if exact else 1)


if __name__ == "__main__":
    main()
