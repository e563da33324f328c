"""Incremental dedup at scale: the 1M-doc corpus fed as four increments.

Evidence tool for :func:`textops.incremental.minhash_dedup_incremental`
(the continuous-crawl form): the planted 1M-doc corpus from
``soak_dedup_scale.py`` arrives as two id-ordered increments, followed by
a third "echo" increment of 20,000 NEW docs that near-duplicate stored
cluster docs from increment 1 (cross-increment components through the
state store — the case a from-scratch re-run never has to handle) plus
30,000 fresh unique docs and 5,000 planted (A, B) keeper pairs (mutual
shingle-jaccard 0.75 < threshold: both kept), then a fourth "bridge"
increment of 15,000 docs, three near-identical variants per pair, each
j≈0.87/0.81 to BOTH A and B — merging the two old keepers' components,
the case where an incremental run must emit retro-drop TOMBSTONES to
match a from-scratch batch run.  Every expected count is exact,
including the exact tombstone id set:

- inc1 (ids < 500k: all planted clusters/classes): kept = 317,960
- inc2 (ids 500k..1M: all unique): kept = 500,000
- inc3 (echoes + fresh + A/B pairs): every echo must be dropped against
  the STORE (its component contains old ids) → 40,000 kept
- inc4 (bridges): all 15,000 drop, and read_retro_drops == exactly the
  5,000 B-side keepers (the larger root of each bridged pair)

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

N_ECHO, N_FRESH, N_BRIDGE = 20_000, 30_000, 5_000
THRESHOLD, NUM_PERM, BANDS = 0.8, 64, 16
AB_BASE, BR_BASE = 1_050_000, 1_100_000

# bridge geometry over 3-token shingles: bridge = 100 fresh tokens
# g{i}w0..99; A shares the FIRST 93 (+7 own), B the LAST 93 (+7 own).
# j(bridge, A) = 91/105 ≈ 0.867 ≥ t; j(A, B) = 84/112 = 0.75 < t — so A
# and B both survive inc3, and only the inc4 bridge merges them.  Three
# bridge variants (v0 exact, v1/v2 one mid-window token swapped → j ≈
# 0.815, independent signatures) make an all-variants LSH miss
# (p ≈ 1.7e-6 each at r=4×16 bands) astronomically unlikely.
_BR_SHARE = 93


def _bridge_tokens(i: int) -> list:
    return [f"g{i}w{j}" for j in range(100)]


def _ab_doc(i: int, side: str) -> str:
    br = _bridge_tokens(i)
    shared = br[:_BR_SHARE] if side == "a" else br[100 - _BR_SHARE:]
    return " ".join(shared + [f"{side}{i}own{j}" for j in range(7)])


def _echo_increment(out_path: str) -> None:
    """ids 1,000,000+i: variant v4 of cluster i (near-dup of STORED docs);
    ids 1,020,000+: fresh unique docs; ids 1,050,000+2i / +2i+1: the
    (A, B) keeper pairs a later bridge increment will merge."""
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
    for i in range(N_BRIDGE):
        for k, side in enumerate("ab"):
            ids.append(AB_BASE + 2 * i + k)
            texts.append(_ab_doc(i, side))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}), out_path)


def _bridge_increment(out_path: str) -> None:
    """ids 1,100,000+3i+v: variant v of bridge i (near-dup of the STORED
    A and B keepers of pair i — the component-merge case)."""
    ids, texts = [], []
    for i in range(N_BRIDGE):
        for v in range(3):
            toks = _bridge_tokens(i)
            if v:
                toks[46 + v] = f"g{i}x{v}"
            ids.append(BR_BASE + 3 * i + v)
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
    echo_path = os.path.join(base, "echo_inc_v2.parquet")
    if not os.path.exists(echo_path):
        _echo_increment(echo_path)
    bridge_path = os.path.join(base, "bridge_inc.parquet")
    if not os.path.exists(bridge_path):
        _bridge_increment(bridge_path)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.incremental import (
        minhash_dedup_incremental, read_retro_drops)
    from pttcrawler_ray.util.rayops import read_parquet_clean

    state = os.path.join(base, "inc_state")
    shutil.rmtree(state, ignore_errors=True)

    expected = {
        "inc1": 500_000 - (N_CLUSTERS * (CLUSTER_SZ - 1) + N_CLASSES * 255),
        "inc2": 500_000,
        "inc3": N_FRESH + 2 * N_BRIDGE,
        "inc4": 0,
    }
    results, rss_phases = {}, {"start": _rss_gb()}
    for name, src in [("inc1", inc1), ("inc2", inc2), ("inc3", [echo_path]),
                      ("inc4", [bridge_path])]:
        t0 = time.time()
        kept = minhash_dedup_incremental(
            read_parquet_clean(src), state, threshold=THRESHOLD,
            num_perm=NUM_PERM, bands=BANDS)
        n = kept.count()
        results[name] = {"kept": n, "expected": expected[name],
                         "sec": round(time.time() - t0, 1)}
        rss_phases[f"after_{name}"] = _rss_gb()

    # the bridge increment must tombstone EXACTLY the 5,000 B-side
    # keepers (larger root of each merged pair) — nothing else, ever
    retro = sorted(read_retro_drops(state)["doc_id"].to_pylist())
    retro_ok = retro == [AB_BASE + 2 * i + 1 for i in range(N_BRIDGE)]

    # --- CDC-removal leg (round-5): apply_removals at the 1M scale ---------
    # 1. remove the first 5,000 CLUSTER KEEPERS (ids 4c): each cluster
    #    {4c..4c+3, echo 1,000,000+c} must resurrect exactly 4c+1;
    # 2. remove 1,000 already-tombstoned B-side docs: no resurrection
    #    (A stays the component min);
    # 3. remove 1,000 unique keepers (ids 500,000..500,999): plain
    #    deletes, no resurrection.
    # Then a post-removal increment of 200 near-dups — 100 echoing the
    # REMOVED uniques (must be KEPT: the store no longer suppresses
    # them) and 100 echoing LIVE uniques (must drop) — and finally
    # current_keepers() compared to the closed-form expected keeper SET.
    from pttcrawler_ray.textops.incremental import (apply_removals,
                                                    current_keepers)

    R_CL, R_UNIQ = 5_000, 1_000
    t0 = time.time()
    res1 = sorted(apply_removals(
        state, [4 * c for c in range(R_CL)])["doc_id"].to_pylist())
    res1_ok = res1 == [4 * c + 1 for c in range(R_CL)]
    res2 = apply_removals(
        state, [AB_BASE + 2 * i + 1 for i in range(1_000)]).num_rows
    res3 = apply_removals(
        state, list(range(500_000, 500_000 + R_UNIQ))).num_rows
    removal_sec = round(time.time() - t0, 1)
    rss_phases["after_removals"] = _rss_gb()

    # post-removal increment: mutate token 0 of 100 removed uniques and
    # 100 live uniques (j = 35/41 ≈ 0.854 ≥ 0.8 to their source only)
    inc5_path = os.path.join(base, "postremoval_inc.parquet")
    ids5, texts5 = [], []
    for part_start, base_id in ((500_000, 1_300_000), (600_000, 1_300_100)):
        src = pq.read_table(os.path.join(
            base, "docs", f"part-{part_start:08d}.parquet"))
        for i in range(100):
            toks = src["text"][i].as_py().split()
            toks[0] = f"z{part_start + i}"
            ids5.append(base_id + i)
            texts5.append(" ".join(toks))
    pq.write_table(pa.table({"doc_id": pa.array(ids5, pa.int64()),
                             "text": pa.array(texts5, pa.string())}),
                   inc5_path)
    t0 = time.time()
    kept5 = sorted(minhash_dedup_incremental(
        read_parquet_clean([inc5_path]), state, threshold=THRESHOLD,
        num_perm=NUM_PERM, bands=BANDS).to_pandas()["doc_id"])
    inc5_sec = round(time.time() - t0, 1)
    kept5_ok = kept5 == list(range(1_300_000, 1_300_100))

    # closed-form final keeper set
    exp = set()
    for c in range(N_CLUSTERS):
        exp.add(4 * c + 1 if c < R_CL else 4 * c)
    for k in range(N_CLASSES):
        cb = N_CLUSTERS * CLUSTER_SZ + k * CLASS_SZ
        exp.add(cb)
        exp.update(range(cb + 256, cb + CLASS_SZ))
    exp.update(range(N_CLUSTERS * CLUSTER_SZ + N_CLASSES * CLASS_SZ,
                     500_000))                       # inc1 uniques
    exp.update(range(500_000 + R_UNIQ, 1_000_000))   # inc2 minus removed
    exp.update(range(1_020_000, 1_020_000 + N_FRESH))
    exp.update(AB_BASE + 2 * i for i in range(N_BRIDGE))  # A-side keepers
    exp.update(range(1_300_000, 1_300_100))
    t0 = time.time()
    got_keepers = set(current_keepers(state).to_pandas()["doc_id"])
    keepers_ok = got_keepers == exp
    rss_phases["after_keepers"] = _rss_gb()

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    ok = (all(r["kept"] == r["expected"] for r in results.values())
          and retro_ok and res1_ok and res2 == 0 and res3 == 0
          and kept5_ok and keepers_ok)
    print(json.dumps({
        "metric": "incremental dedup soak (4 increments vs persisted state "
                  "store + CDC-removal leg: exact resurrections, "
                  "un-suppression, closed-form final keeper set)",
        "n_docs_total": 1_000_000 + N_ECHO + N_FRESH + 5 * N_BRIDGE + 200,
        "increments": results,
        "retro_tombstones": len(retro),
        "retro_exact": retro_ok,
        "removals": {"removed": R_CL + 1_000 + R_UNIQ,
                     "resurrected": len(res1), "resurrect_exact": res1_ok,
                     "sec": removal_sec},
        "post_removal_inc": {"kept": len(kept5), "expected": 100,
                             "sec": inc5_sec},
        "final_keepers": {"n": len(got_keepers), "expected": len(exp),
                          "set_exact": keepers_ok},
        "driver_peak_rss_gb": round(peak, 2),
        "driver_rss_phases_gb": rss_phases,
        "exact_match": ok,
    }))
    assert ok, (results, len(retro), res1[:5], res2, res3,
                len(kept5), len(got_keepers), len(exp))


if __name__ == "__main__":
    main()
