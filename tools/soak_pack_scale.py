"""Sequence-packing soak: pack_offsets over the 10^6-doc corpus.

Exercises the distributed-prefix-sum decomposition at real range counts
(default range_size 2^20 → 1 range per 1M dense ids; ``--range-size``
forces many ranges to prove the per-range base + intra-range cumsum
composition) and compares EVERY row against DuckDB's window prefix sum
over the same parquet — an exact, order-sensitive, corpus-scale check.

Run from the repo root:  python tools/soak_pack_scale.py [--docs N]
(reuses /tmp/ptt_dedup_soak's corpus; generates it if absent)
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEQ_LEN = 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/ptt_dedup_soak")
    ap.add_argument("--range-size", type=int, default=1 << 16,
                    help="ids per prefix-sum range (small → many ranges)")
    args = ap.parse_args()

    corpus = os.path.join(args.out, "docs")
    if not os.path.exists(os.path.join(args.out, "manifest.json")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "soak_dedup_scale.py"),
                        "--docs", str(args.docs), "--out", args.out],
                       check=True, timeout=3000)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.packing import pack_offsets, pack_sql
    from pttcrawler_ray.util.rayops import read_parquet_clean

    docs = read_parquet_clean(corpus, columns=["doc_id", "text"])
    t0 = time.time()
    got = pack_offsets(docs, seq_len=SEQ_LEN,
                       range_size=args.range_size).to_pandas()
    t_pack = time.time() - t0
    got = got.sort_values("doc_id").reset_index(drop=True)
    n_ranges = int((got["doc_id"].max() // args.range_size) + 1)

    import duckdb

    t1 = time.time()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus}/*.parquet')")
    want = con.execute(pack_sql("documents", SEQ_LEN)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    t_oracle = time.time() - t1

    import pandas as pd

    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)
    total_tokens = int(got["tok_start"].iloc[-1] + got["n_tok"].iloc[-1] + 1)
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    print(json.dumps({
        "metric": "sequence-packing soak (distributed prefix sum) vs "
                  "DuckDB window prefix sum — exact row match",
        "n_docs": len(got), "seq_len": SEQ_LEN,
        "range_size": args.range_size, "n_ranges": n_ranges,
        "total_tokens": total_tokens,
        "n_examples": (total_tokens + SEQ_LEN - 1) // SEQ_LEN,
        "pack_sec": round(t_pack, 1),
        "docs_per_sec": round(len(got) / t_pack),
        "oracle_sec": round(t_oracle, 1),
        "exact_match": True,
        "driver_peak_rss_gb": round(peak, 2),
    }))


if __name__ == "__main__":
    main()
