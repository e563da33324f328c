"""SemDeDup at scale: clustered semantic dedup verdicts on 10^6 vectors.

Companion to ``soak_embedding_scale.py`` (BASELINE.md "Dedup soak"):
reuses its deterministic 1M-vector corpus with planted near-twin pairs,
runs :func:`~pttcrawler_ray.textops.semdedup.semdedup` (assignment
map_batches → ONE coarse cluster-partition shuffle → per-partition
chunked triangular scan) as a Dataset pipeline, and compares every
``(vec_id, cluster, kept)`` verdict EXACTLY against an independent
sequential replay of the documented determinism spec (numpy, no Ray,
no chunking) — validating the distributed machinery (batch-boundary
independence of the csim tiebreak, the coarse shuffle, the chunked
scan) at a scale the unit tests never reach.  Also reports how many
planted twin pairs lost exactly one member (the semantic-dup property
the operator exists for) and driver peak RSS.

Centroids are generated seeded in this script and passed to BOTH sides:
the codebook trainer has its own soak (``soak_knn_scale.py``); this one
isolates the semdedup semantics.

Run from the repo root:  python tools/soak_semdedup_scale.py
[--vectors N] [--dim D] [--twins T] [--clusters K]
"""
import argparse
import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from soak_embedding_scale import gen_vectors  # noqa: E402  (same corpus)

THRESHOLD, CSEED = 0.95, 77


def make_centroids(k: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(CSEED)
    c = rng.standard_normal((k, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def sequential_verdicts(ids: np.ndarray, vecs: np.ndarray, c: np.ndarray,
                        d4_frac: "float | None" = None):
    """Sequential replay of textops/semdedup.py's determinism spec:
    argmax assignment, fixed-order einsum csim, (cluster, csim, vec_id)
    lexsort, UNCHUNKED full-matrix triangular prior-max per cluster;
    with ``d4_frac`` the prototype stage runs over the survivors."""
    emb = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    assign = (emb @ c.T).argmax(axis=1).astype(np.int64)
    csim = np.einsum("nd,nd->n", emb, c[assign])
    order = np.lexsort((ids, csim, assign))
    o_cl, o_id, o_m = assign[order], ids[order], emb[order]
    o_cs = csim[order]
    kept = np.ones(o_id.size, bool)
    starts = np.flatnonzero(np.r_[True, o_cl[1:] != o_cl[:-1]])
    ends = np.r_[starts[1:], o_cl.size]
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        sims = o_m[s:e] @ o_m[s:e].T
        prior = np.where(np.tri(e - s, k=-1, dtype=bool), sims,
                         -np.inf).max(axis=1)
        kept[s:e] = prior < THRESHOLD
    stage = np.where(kept, 0, 1).astype(np.int32)
    if d4_frac is not None:
        for s, e in zip(starts, ends):
            surv = np.flatnonzero(stage[s:e] == 0) + s
            n_drop = int(np.floor(d4_frac * surv.size))
            if n_drop:
                proto = surv[np.lexsort((o_id[surv], -o_cs[surv]))[:n_drop]]
                stage[proto] = 2
        kept = stage == 0
    back = np.argsort(o_id, kind="stable")
    return o_id[back], o_cl[back], kept[back], stage[back]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--twins", type=int, default=30_000)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--d4-drop-frac", type=float, default=None,
                    help="soak the fused D4 scan instead of plain semdedup")
    ap.add_argument("--out", default="/tmp/ptt_emb_soak")
    args = ap.parse_args()

    corpus = os.path.join(args.out, "vectors")
    marker = os.path.join(args.out, "manifest.json")
    key = {"n": args.vectors, "dim": args.dim, "twins": args.twins, "v": 1}
    if not (os.path.exists(marker) and json.load(open(marker)) == key):
        import shutil

        shutil.rmtree(corpus, ignore_errors=True)
        print(f"generating {args.vectors:,} vectors ...", file=sys.stderr)
        gen_vectors(corpus, args.vectors, args.dim, args.twins)
        with open(marker, "w") as f:
            json.dump(key, f)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.semdedup import d4, semdedup
    from pttcrawler_ray.util.rayops import read_parquet_clean

    c = make_centroids(args.clusters, args.dim)

    # oracle input: the full vector matrix (1M x 32 x 8B = 256 MB) — a
    # soak-tool allowance, NOT a pipeline pattern; the engine side never
    # drivers the vectors
    t0 = time.time()
    vdf = pq.read_table(corpus).to_pandas()
    ids = vdf["vec_id"].to_numpy(np.int64)
    vecs = np.stack(vdf["embedding"])
    e_id, e_cl, e_kept, e_stage = sequential_verdicts(
        ids, vecs, c, d4_frac=args.d4_drop_frac)
    t_oracle = time.time() - t0
    del vdf, vecs

    t1 = time.time()
    ds = read_parquet_clean(corpus)
    if args.d4_drop_frac is not None:
        verdicts = d4(ds, threshold=THRESHOLD, centroids=c,
                      drop_frac=args.d4_drop_frac).materialize()
    else:
        verdicts = semdedup(ds, threshold=THRESHOLD,
                            centroids=c).materialize()
    n_rows = verdicts.count()
    t_engine = time.time() - t1
    got = verdicts.to_pandas().sort_values("vec_id")  # output-sized, soak-only
    g_id = got["vec_id"].to_numpy(np.int64)
    g_cl = got["cluster"].to_numpy(np.int64)
    g_kept = got["kept"].to_numpy(np.int32).astype(bool)
    ok = (n_rows == args.vectors and np.array_equal(g_id, e_id)
          and np.array_equal(g_cl, e_cl) and np.array_equal(g_kept, e_kept))
    if args.d4_drop_frac is not None:
        ok = ok and np.array_equal(got["drop_stage"].to_numpy(np.int32),
                                   e_stage)

    kept_by_id = dict(zip(g_id.tolist(), g_kept.tolist()))
    twin_one_kept = sum(kept_by_id[2 * i] + kept_by_id[2 * i + 1] == 1
                        for i in range(args.twins))

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    print(json.dumps({
        "metric": ("d4 soak (fused semdedup + prototype scan)"
                   if args.d4_drop_frac is not None else
                   "semdedup soak (assign + coarse cluster shuffle + "
                   "chunked triangular scan)") + " vs sequential spec replay",
        "n_vectors": args.vectors, "dim": args.dim,
        "clusters": args.clusters, "threshold": THRESHOLD,
        "d4_drop_frac": args.d4_drop_frac,
        "kept": int(g_kept.sum()), "dropped": int((~g_kept).sum()),
        "twin_pairs_one_kept": twin_one_kept, "twin_pairs": args.twins,
        "oracle_sec": round(t_oracle, 1), "engine_sec": round(t_engine, 1),
        "vectors_per_sec": round(args.vectors / t_engine, 0),
        "driver_peak_rss_gb": round(peak, 2),
        "exact_match": bool(ok),
    }))
    assert ok


if __name__ == "__main__":
    main()
