"""Incremental dedup at scale: the 1M-doc corpus fed as three increments.

Evidence tool for :func:`textops.incremental.minhash_dedup_incremental`
(the continuous-crawl form): the planted 1M-doc corpus from
``soak_dedup_scale.py`` arrives as two id-ordered increments, followed by
a third "echo" increment of 20,000 NEW docs that near-duplicate stored
cluster docs from increment 1 (cross-increment components through the
state store — the case a from-scratch re-run never has to handle) plus
30,000 fresh unique docs.  Every expected count is exact:

- inc1 (ids < 500k: all planted clusters/classes): kept = 317,960
- inc2 (ids 500k..1M: all unique): kept = 500,000
- inc3 (echoes + fresh): every echo must be dropped against the STORE
  (its component contains old ids), every fresh doc kept → 30,000

Run from the repo root:  python tools/soak_dedup_incremental.py
(generates/reuses /tmp/ptt_dedup_soak's corpus)
"""
import glob
import json
import os
import resource
import shutil
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.soak_dedup_scale import (CLASS_SZ, CLUSTER_SZ, N_CLASSES,
                                    N_CLUSTERS, STOPS, _rss_gb)

N_ECHO, N_FRESH = 20_000, 30_000
THRESHOLD, NUM_PERM, BANDS = 0.8, 64, 16


def _echo_increment(out_path: str) -> None:
    """ids 1,000,000+i: variant v4 of cluster i (near-dup of STORED docs);
    ids 1,020,000+: fresh unique docs."""
    rng = np.random.default_rng(777)
    ids, texts = [], []
    for c in range(N_ECHO):
        toks = [f"c{c}w{j}" if j % 5 != 2 else STOPS[j // 5 % len(STOPS)]
                for j in range(40)] + ["v4"]
        ids.append(1_000_000 + c)
        texts.append(" ".join(toks))
    for i in range(N_FRESH):
        vals = rng.integers(0, 10_000_000, size=40)
        toks = [f"f{v}" if j % 5 != 2 else STOPS[j // 5 % len(STOPS)]
                for j, v in enumerate(vals)]
        ids.append(1_020_000 + i)
        texts.append(" ".join(toks))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}), out_path)


def main():
    base = "/tmp/ptt_dedup_soak"
    if not os.path.exists(os.path.join(base, "manifest.json")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "soak_dedup_scale.py"),
                        "--docs", "1000000"], check=True, timeout=3000)
    parts = sorted(glob.glob(os.path.join(base, "docs", "part-*.parquet")))
    inc1 = [p for p in parts if int(p.split("part-")[1][:8]) < 500_000]
    inc2 = [p for p in parts if int(p.split("part-")[1][:8]) >= 500_000]
    echo_path = os.path.join(base, "echo_inc.parquet")
    if not os.path.exists(echo_path):
        _echo_increment(echo_path)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.incremental import minhash_dedup_incremental
    from pttcrawler_ray.util.rayops import read_parquet_clean

    state = os.path.join(base, "inc_state")
    shutil.rmtree(state, ignore_errors=True)

    expected = {
        "inc1": 500_000 - (N_CLUSTERS * (CLUSTER_SZ - 1) + N_CLASSES * 255),
        "inc2": 500_000,
        "inc3": N_FRESH,
    }
    results, rss_phases = {}, {"start": _rss_gb()}
    for name, src in [("inc1", inc1), ("inc2", inc2), ("inc3", [echo_path])]:
        t0 = time.time()
        kept = minhash_dedup_incremental(
            read_parquet_clean(src), state, threshold=THRESHOLD,
            num_perm=NUM_PERM, bands=BANDS)
        n = kept.count()
        results[name] = {"kept": n, "expected": expected[name],
                         "sec": round(time.time() - t0, 1)}
        rss_phases[f"after_{name}"] = _rss_gb()

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    ok = all(r["kept"] == r["expected"] for r in results.values())
    print(json.dumps({
        "metric": "incremental dedup soak (3 increments vs persisted state "
                  "store; cross-increment echoes must drop via the store)",
        "n_docs_total": 1_000_000 + N_ECHO + N_FRESH,
        "increments": results,
        "driver_peak_rss_gb": round(peak, 2),
        "driver_rss_phases_gb": rss_phases,
        "exact_match": ok,
    }))
    assert ok, results


if __name__ == "__main__":
    main()
