"""Deterministic random walks beyond the broadcast regime: 10M+ edges
through the co-partition plan, exact-replayed per sampled walk.

Evidence tool for :func:`pttcrawler_ray.graph.random_walks`'s
co-partition plan (``edge_bcast_max`` exceeded — the VERDICT r4 gap:
"random_walks materializes the distinct edge set on the driver").  The
graph is procedurally generated, so any single walk can be replayed
exactly on the driver by regenerating just the visited nodes' neighbor
lists — no full-topology oracle materialization:

- node s has ``1 + (s % 5)`` edge rows (plus planted duplicate rows that
  the distinct step must collapse), dst_j = splitmix64(s*31+j) % N;
- a 2,000-walk random sample is replayed step-by-step with the
  documented choice hash and compared row-for-row;
- step-0 rows must equal the distinct src set; per-step row counts are
  monotone non-increasing (walks only ever stop).

Reports wall time, edge-steps/s, and driver peak RSS (the point of the
plan: topology never sits on the driver).

Run from the repo root:  python tools/soak_walks_scale.py [--edges 10000000]
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WALK_LEN = 4
SALT = 17


def _peak_rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def _neighbors(s: int, n_nodes: int) -> np.ndarray:
    """The node's DISTINCT sorted neighbor list, regenerated on demand."""
    from pttcrawler_ray.textops.sampling import splitmix64

    k = 1 + (s % 5)
    j = np.arange(k, dtype=np.uint64)
    d = splitmix64(np.uint64(s * 31) + j) % np.uint64(n_nodes)
    return np.unique(d.astype(np.int64))


def _edge_batch(batch: pa.Table, *, n_nodes: int) -> pa.Table:
    """Edge rows for a block of src ids — includes one DUPLICATE row per
    even src (the distinct step must collapse them)."""
    from pttcrawler_ray.textops.sampling import splitmix64

    s = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = 1 + (s % 5)
    src = np.repeat(s, k)
    jj = np.arange(src.size, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(k)])[:-1], k)
    dst = (splitmix64(src.astype(np.uint64) * np.uint64(31)
                      + jj.astype(np.uint64))
           % np.uint64(n_nodes)).astype(np.int64)
    dup = s[s % 2 == 0]
    src = np.concatenate([src, dup])
    dst = np.concatenate([dst, (splitmix64(dup.astype(np.uint64)
                                           * np.uint64(31))
                                % np.uint64(n_nodes)).astype(np.int64)])
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pttcrawler_ray.graph import _walk_choice, random_walks

    # avg 3 distinct-ish edges + 0.5 dup rows per src
    n_src = args.edges // 3
    n_nodes = int(n_src * 1.1)  # ~10% of dst ids are danglers

    edges = rd.range(n_src).map_batches(
        _edge_batch, fn_kwargs={"n_nodes": n_nodes},
        batch_format="pyarrow")

    t0 = time.perf_counter()
    walks = random_walks(edges, walk_len=WALK_LEN, salt=SALT,
                         edge_bcast_max=0)  # force the co-partition plan
    wpd = walks.to_pandas()
    wall = time.perf_counter() - t0

    n_rows = len(wpd)
    per_step = wpd.groupby("step").size()
    assert int(per_step[0]) == n_src, (per_step[0], n_src)
    assert (per_step.sort_index().diff().dropna() <= 0).all(), per_step

    # exact replay of a 2,000-walk sample
    rng = np.random.default_rng(3)
    sample = rng.choice(n_src, size=2000, replace=False)
    by_walk = {int(w): g.sort_values("step")["node"].tolist()
               for w, g in wpd[wpd["walk_id"].isin(sample)]
               .groupby("walk_id")}
    for w in sample:
        w = int(w)
        v, expect = w, [w]
        for t in range(WALK_LEN):
            if v >= n_src:  # dangling dst (>= n_src has no out-edges)
                break
            nb = _neighbors(v, n_nodes)
            h = _walk_choice(np.array([v], np.int64),
                             np.array([w], np.int64), t, SALT)[0]
            v = int(nb[int(h % np.uint64(nb.size))])
            expect.append(v)
        assert by_walk[w] == expect, (w, by_walk[w], expect)

    out = {
        "edges": args.edges, "n_src": n_src, "n_nodes": n_nodes,
        "walk_len": WALK_LEN, "walk_rows": n_rows,
        "replayed_walks": len(sample), "replay_exact": True,
        "wall_sec": round(wall, 1),
        "edge_steps_per_sec": int(args.edges * WALK_LEN / wall),
        "driver_peak_rss_gb": _peak_rss_gb(),
        "num_cpus": args.num_cpus,
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
