"""Sketch-at-scale soak: HLL + Count-Min over 10^7 integer keys.

Evidence tool for :mod:`pttcrawler_ray.sketches` (BASELINE.md "Sketch
soak"): a zipf-ish planted key stream (known distinct count, known
per-key frequencies) is sketched by the engine's streaming partials and
checked three ways —

- the integer register/counter tables EXACTLY equal the pure-SQL DuckDB
  twins (the same splitmix64 INT128 expression) over the same parquet;
- the HLL estimate lands within the p=12 error envelope (±5%) of the
  true distinct count;
- CMS point estimates are >= the true counts (structural guarantee)
  and exact for the top heavy hitters (width >> distinct tail).

Run from the repo root:  python tools/soak_sketches_scale.py [--rows N]
"""
import argparse
import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P, HLL_SALT = 12, 3
DEPTH, WIDTH, CMS_SALT = 4, 4096, 5
QSK_BITS, QSK_QS = 7, (0.1, 0.5, 0.9, 0.99, 0.999)


def gen(path: str, n_rows: int, n_distinct: int, chunk: int = 2_000_000):
    rng = np.random.default_rng(20260819)
    os.makedirs(path, exist_ok=True)
    # zipf-ish: rank r drawn with prob ~ 1/(r+1); key = r * 7919 (spread)
    w = 1.0 / np.arange(1, n_distinct + 1)
    w /= w.sum()
    files = []
    for i, start in enumerate(range(0, n_rows, chunk)):
        m = min(chunk, n_rows - start)
        r = rng.choice(n_distinct, size=m, p=w)
        f = f"{path}/part-{i:04d}.parquet"
        pq.write_table(pa.table({"k": pa.array(r * 7919, pa.int64())}), f)
        files.append(f)
    return files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--distinct", type=int, default=200_000)
    ap.add_argument("--out", default="/tmp/ptt_sketch_soak")
    args = ap.parse_args()

    data = os.path.join(args.out, "keys")
    marker = os.path.join(args.out, "manifest.json")
    key = {"rows": args.rows, "distinct": args.distinct, "v": 1}
    if not (os.path.exists(marker)
            and json.load(open(marker)) == key):
        import shutil

        shutil.rmtree(data, ignore_errors=True)
        print(f"generating {args.rows:,} keys ...", file=sys.stderr)
        gen(data, args.rows, args.distinct)
        with open(marker, "w") as f:
            json.dump(key, f)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pttcrawler_ray.sketches import (cms_counts, cms_estimate, cms_sql,
                                         hll_estimate, hll_registers,
                                         hll_sql, qsketch_counts,
                                         qsketch_quantiles, qsketch_sql)
    from pttcrawler_ray.util.rayops import read_parquet_clean

    ds = read_parquet_clean(data)
    t0 = time.time()
    hll = hll_registers(ds, "k", p=P, salt=HLL_SALT).to_pandas() \
        .sort_values("register").reset_index(drop=True)
    t_hll = time.time() - t0
    t0 = time.time()
    cms = cms_counts(ds, "k", depth=DEPTH, width=WIDTH, salt=CMS_SALT) \
        .to_pandas().sort_values(["depth", "col"]).reset_index(drop=True)
    t_cms = time.time() - t0
    t0 = time.time()
    qsk = qsketch_counts(ds, "k", sub_bits=QSK_BITS).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    t_qsk = time.time() - t0
    ray.shutdown()

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM "
                f"read_parquet('{data}/*.parquet')")
    t0 = time.time()
    hll_o = con.execute(hll_sql("t", "k", p=P, salt=HLL_SALT)).fetch_df() \
        .sort_values("register").reset_index(drop=True)
    cms_o = con.execute(cms_sql("t", "k", depth=DEPTH, width=WIDTH,
                                salt=CMS_SALT)).fetch_df() \
        .sort_values(["depth", "col"]).reset_index(drop=True)
    t_sql = time.time() - t0

    qsk_o = con.execute(qsketch_sql("t", "k", sub_bits=QSK_BITS)).fetch_df() \
        .sort_values("bucket").reset_index(drop=True)

    hll_exact = hll.astype("int64").equals(hll_o.astype("int64"))
    cms_exact = cms.astype("int64").equals(cms_o.astype("int64"))
    qsk_exact = qsk.astype("int64").equals(qsk_o.astype("int64"))

    # quantile readouts within the guaranteed 2^-QSK_BITS relative error
    # of the exact (DuckDB quantile_disc) answers
    q_est = qsketch_quantiles(qsk["bucket"].to_numpy(),
                              qsk["cnt"].to_numpy(), QSK_QS,
                              sub_bits=QSK_BITS)
    q_true = np.array([con.execute(
        f"SELECT quantile_disc(k, {q}) FROM t").fetchone()[0]
        for q in QSK_QS], np.int64)
    qsk_in_bound = bool(np.all((q_est <= q_true)
                               & (q_true <= q_est * (1 + 2.0 ** -QSK_BITS)
                                  + 1)))

    # accuracy readouts vs planted truth
    true_counts = con.execute(
        "SELECT k, count(*) c FROM t GROUP BY k").fetch_df()
    true_d = len(true_counts)
    est_d = hll_estimate(hll["register"].to_numpy(), hll["rho"].to_numpy(),
                         p=P)
    hll_err = abs(est_d - true_d) / true_d
    top = true_counts.nlargest(100, "c")
    est_c = cms_estimate(cms["depth"].to_numpy(), cms["col"].to_numpy(),
                         cms["cnt"].to_numpy(), top["k"].to_numpy(),
                         depth=DEPTH, width=WIDTH, salt=CMS_SALT)
    never_under = bool((est_c >= top["c"].to_numpy()).all())
    top_exact = int((est_c == top["c"].to_numpy()).sum())

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ok = (hll_exact and cms_exact and qsk_exact and hll_err < 0.05
          and never_under and qsk_in_bound)
    print(json.dumps({
        "metric": "sketch soak (HLL p=12 + CMS 4x4096 + qsketch k=7) "
                  "vs pure-SQL twins",
        "n_rows": args.rows, "true_distinct": true_d,
        "hll_sec": round(t_hll, 1), "cms_sec": round(t_cms, 1),
        "qsketch_sec": round(t_qsk, 1),
        "qsketch_table_exact": bool(qsk_exact),
        "qsketch_buckets": len(qsk),
        "qsketch_quantiles_in_bound": qsk_in_bound,
        "sql_twin_sec": round(t_sql, 1),
        "rows_per_sec_hll": round(args.rows / t_hll, 0),
        "hll_table_exact": bool(hll_exact),
        "cms_table_exact": bool(cms_exact),
        "hll_estimate": round(float(est_d), 1),
        "hll_rel_err": round(float(hll_err), 4),
        "cms_never_undercounts": never_under,
        "cms_top100_exact": top_exact,
        "driver_peak_rss_gb": round(peak, 2),
        "exact_match": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
