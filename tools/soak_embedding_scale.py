"""Embedding near-dup at scale: sign-LSH bucketed matmul on 10^6 vectors.

Companion to ``soak_dedup_scale.py`` (BASELINE.md "Dedup soak"): generates
a deterministic 1M-vector corpus with planted near-twin pairs, runs
:func:`embedding_neardup_pairs` (sign-LSH explode → per-bucket matmul →
carry-distinct across tables) as a Dataset pipeline, and compares the
result EXACTLY against an independent sequential implementation of the
same bucket/cap/threshold semantics (numpy, no Ray) — validating the
distributed machinery (explode shuffle, per-bucket map_groups, the
cross-table carry-distinct) at a scale the unit tests never reach.
Also reports planted-twin recall (an LSH property, identical in engine
and oracle by construction) and driver peak RSS.

Run from the repo root:  python tools/soak_embedding_scale.py
[--vectors N] [--dim D] [--twins T]
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

BITS, TABLES, SEED, THRESHOLD = 12, 2, 99, 0.98
CAP = 16 * 256  # bucket_pairs' degenerate-bucket cap (16 * MAX_BUCKET_DOCS)


def gen_vectors(out_dir: str, n: int, dim: int, twins: int,
                chunk: int = 100_000) -> None:
    """ids 0..2*twins-1 are twin pairs (2i, 2i+1): v and v + 0.01*noise;
    the rest are iid normal (random cosine ~ N(0, 1/dim), never near
    threshold)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(4242)
    written = 0
    part = 0
    while written < n:
        m = min(chunk, n - written)
        vecs = rng.standard_normal((m, dim))
        for i in range(written, written + m):
            if i < 2 * twins and i % 2 == 1:
                # twin of the previous row: regenerate deterministically
                # from the pair index so chunk boundaries don't matter
                pair_rng = np.random.default_rng(10_000_000 + i // 2)
                base = pair_rng.standard_normal(dim)
                vecs[i - written] = base + 0.01 * pair_rng.standard_normal(dim)
            elif i < 2 * twins:
                pair_rng = np.random.default_rng(10_000_000 + i // 2)
                vecs[i - written] = pair_rng.standard_normal(dim)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(written, written + m), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"part-{part:04d}.parquet"))
        written += m
        part += 1


def sequential_pairs(ids: np.ndarray, vecs: np.ndarray) -> dict:
    """Sequential reference: same seeded planes, same bucket/cap/threshold
    semantics as SignLSH + bucket_pairs, pure numpy."""
    rng = np.random.default_rng(SEED)
    planes = rng.standard_normal((TABLES, vecs.shape[1], BITS))
    emb = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    out: dict = {}
    for t in range(TABLES):
        signs = (emb @ planes[t]) > 0
        bucket = (signs * (1 << np.arange(BITS))).sum(axis=1)
        order = np.argsort(bucket, kind="stable")
        b_s = bucket[order]
        starts = np.flatnonzero(np.r_[True, b_s[1:] != b_s[:-1]])
        ends = np.r_[starts[1:], b_s.size]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            rows = order[s:e]
            rows = rows[np.argsort(ids[rows], kind="stable")][:CAP]
            bids = ids[rows]
            m = emb[rows]
            sim = m @ m.T
            ia, ib = np.where(np.triu(sim >= THRESHOLD, k=1))
            a = np.minimum(bids[ia], bids[ib])
            b = np.maximum(bids[ia], bids[ib])
            for p, q, c in zip(a, b, sim[ia, ib]):
                out.setdefault((int(p), int(q)), float(c))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--twins", type=int, default=30_000)
    ap.add_argument("--out", default="/tmp/ptt_emb_soak")
    args = ap.parse_args()

    corpus = os.path.join(args.out, "vectors")
    marker = os.path.join(args.out, "manifest.json")
    key = {"n": args.vectors, "dim": args.dim, "twins": args.twins, "v": 1}
    if not (os.path.exists(marker) and json.load(open(marker)) == key):
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

    from pttcrawler_ray.textops.dedup import embedding_neardup_pairs
    from pttcrawler_ray.util.rayops import read_parquet_clean

    rss = {"start": round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)}

    # oracle input: the full vector matrix (1M x 32 x 8B = 256 MB) — a
    # soak-tool allowance, NOT a pipeline pattern; the engine side never
    # drivers the vectors
    t0 = time.time()
    vdf = pq.read_table(corpus).to_pandas()
    ids = vdf["vec_id"].to_numpy(np.int64)
    vecs = np.stack(vdf["embedding"])
    exp = sequential_pairs(ids, vecs)
    t_oracle = time.time() - t0
    del vdf, vecs

    t1 = time.time()
    ds = read_parquet_clean(corpus)
    pairs = embedding_neardup_pairs(ds, dim=args.dim, threshold=THRESHOLD,
                                    bits=BITS, tables=TABLES,
                                    as_dataset=True).materialize()
    n_pairs = pairs.count()
    t_pairs = time.time() - t1
    got = pairs.to_pandas()  # output-sized driver check, soak-side only
    gmap = {(int(a), int(b)): float(c) for a, b, c in
            zip(got["doc_a"], got["doc_b"], got["cosine"])}
    ok_ids = set(gmap) == set(exp)
    ok_cos = ok_ids and all(abs(gmap[k] - exp[k]) < 1e-9 for k in gmap)
    twin_recall = (sum((2 * i, 2 * i + 1) in exp for i in range(args.twins))
                   / max(args.twins, 1))

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    print(json.dumps({
        "metric": "embedding near-dup soak (sign-LSH bucketed matmul + "
                  "carry-distinct) vs sequential bucket oracle",
        "n_vectors": args.vectors, "dim": args.dim,
        "pairs": n_pairs, "expected_pairs": len(exp),
        "planted_twin_recall": round(twin_recall, 4),
        "oracle_sec": round(t_oracle, 1), "pairs_sec": round(t_pairs, 1),
        "vectors_per_sec": round(args.vectors / t_pairs, 0),
        "driver_peak_rss_gb": round(peak, 2), "rss_phases_gb": rss,
        "exact_match": ok_ids and ok_cos,
    }))
    assert ok_ids, (n_pairs, len(exp))
    assert ok_cos


if __name__ == "__main__":
    main()
