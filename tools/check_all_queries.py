"""Driver-style correctness sweep over EVERY registered query.

Runs each ``queries()`` entry at the driver's compare scale (sf0.01)
against its ``oracle_sql()`` twin (DuckDB over the same parquet views /
the sequential path oracles), in ONE fresh process, and emits the
per-query rows/schema/values verdict table — the builder-side equivalent
of the driver's CORRECTNESS gate, covering the queries the driver's
50-query sample never picked.

Usage:  python tools/check_all_queries.py [--sf-dir /root/testdata/sf0.01]
                                          [--out /tmp/check_all_queries.json]

Prints one markdown row per query and a final JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("int64", errors="ignore")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/check_all_queries.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False

    import duckdb

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(qs) if args.only is None else args.only.split(",")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    results: dict[str, dict] = {}
    print(f"| query | rows | schema | values | engine_rows | sec |")
    print(f"|---|---|---|---|---|---|")
    for name in names:
        t0 = time.perf_counter()
        rec: dict = {"rows_match": None, "schema_match": None,
                     "values_match": None, "rows": None, "err": None}
        try:
            ray_df = _to_df(qs[name](args.sf_dir))
            rec["rows"] = len(ray_df)
            if name in oracles:
                sql_df = con.execute(oracles[name]).fetchdf()
                rec["rows_match"] = len(ray_df) == len(sql_df)
                rec["schema_match"] = (sorted(ray_df.columns)
                                       == sorted(sql_df.columns))
                if rec["rows_match"] and rec["schema_match"]:
                    try:
                        pd.testing.assert_frame_equal(
                            _canon(ray_df), _canon(sql_df),
                            check_dtype=False, check_exact=False,
                            rtol=1e-9, atol=1e-9)
                        rec["values_match"] = True
                    except AssertionError as e:
                        rec["values_match"] = False
                        rec["err"] = str(e).split("\n")[0][:200]
                else:
                    rec["values_match"] = False
            else:  # rows-only query (no SQL-expressible oracle)
                rec["rows_match"] = rec["schema_match"] = None
                rec["values_match"] = None
        except Exception as e:  # noqa: BLE001 — sweep must finish
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        rec["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = rec

        def _m(v):
            return {True: "ok", False: "FAIL", None: "-"}[v]

        print(f"| {name} | {_m(rec['rows_match'])} | "
              f"{_m(rec['schema_match'])} | {_m(rec['values_match'])} | "
              f"{rec['rows']} | {rec['sec']} |", flush=True)

    n_oracle = sum(1 for n in names if n in oracles)
    n_green = sum(1 for n in names
                  if n in oracles and results[n]["values_match"] is True)
    n_err = sum(1 for r in results.values() if r["err"])
    summary = {"checked": len(names), "with_oracle": n_oracle,
               "green": n_green, "errors": n_err, "sf_dir": args.sf_dir}
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()
    return 0 if (n_green == n_oracle and n_err == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
