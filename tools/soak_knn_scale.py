"""Similarity search at scale: persisted IVF over 10^6 vectors.

Completes the similarity-family evidence matrix (BASELINE.md): builds the
``ivf_cluster``-partitioned index over the 1M-vector corpus from
``soak_embedding_scale.py`` — centroids trained with the FULL-DATA
distributed Lloyd (``train_centroids_distributed``) — then queries it via
:func:`knn_ivf_indexed` and reports:

- the probe-read fraction (files/partitions actually read vs the store),
- recall@k against the exact brute-force answer on the same queries,
- build / brute / indexed-query wall times and driver peak RSS.

Run from the repo root:  python tools/soak_knn_scale.py [--vectors N]
(reuses /tmp/ptt_emb_soak's corpus; generates it if absent)

``--pq`` soaks the IVF-PQ variant instead: same corpus, per-subspace uint8
code columns, ADC scan over codes only + exact rerank — reports the
measured code-bytes vs embedding-bytes of the probed partitions (the
working-set reduction that matters at 100 TB) alongside recall vs brute.
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CLUSTERS, NPROBE, K, N_QUERIES = 64, 8, 10, 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--out", default="/tmp/ptt_emb_soak")
    ap.add_argument("--pq", action="store_true",
                    help="soak the IVF-PQ code-column index instead")
    ap.add_argument("--refine", type=int, default=8,
                    help="IVF-PQ rerank multiplier (k*refine ADC survivors)")
    args = ap.parse_args()

    corpus = os.path.join(args.out, "vectors")
    if not os.path.exists(os.path.join(args.out, "manifest.json")):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "soak_embedding_scale.py"),
                        "--vectors", str(args.vectors), "--out", args.out],
                       check=True, timeout=3000)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.similarity import (build_ivf_index, knn_brute,
                                                   knn_ivf_indexed)
    from pttcrawler_ray.util.rayops import read_parquet_clean

    ds = read_parquet_clean(corpus)

    # queries from the UNIQUE region (the twin region spans ids
    # 0..2*twins-1 = 0..59,999 at defaults; twin queries would make
    # recall trivially easy — the planted near-identical twin is a
    # guaranteed top-1).  part-0000 covers ids 0..99,999, so rows
    # 70,000.. are unique.
    first = pq.read_table(os.path.join(corpus, "part-0000.parquet"),
                          columns=["vec_id", "embedding"])
    q = np.stack(first["embedding"].to_pylist()[70_000:70_000 + N_QUERIES])

    import shutil

    if args.pq:
        from pttcrawler_ray.textops.similarity import (build_ivfpq_index,
                                                       knn_ivfpq_indexed)

        index_dir = os.path.join(args.out, "ivfpq_index")
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        build_ivfpq_index(ds, index_dir, n_clusters=N_CLUSTERS, m_sub=8,
                          iters=4, distributed_train=True)
        t_build = time.time() - t0

        t1 = time.time()
        stats: dict = {}
        ivf = knn_ivfpq_indexed(index_dir, q, k=K, nprobe=NPROBE,
                                refine=args.refine,
                                stats_out=stats).to_pandas()
        t_ivf = time.time() - t1

        t2 = time.time()
        brute = knn_brute(ds, q, k=K).to_pandas()
        t_brute = time.time() - t2

        recalls = []
        for qi in range(N_QUERIES):
            b = set(brute[brute["query_id"] == qi]["vec_id"])
            a = set(ivf[ivf["query_id"] == qi]["vec_id"])
            recalls.append(len(a & b) / max(len(b), 1))

        peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        ray.shutdown()
        print(json.dumps({
            "metric": "persisted IVF-PQ soak (uint8 ADC scan over code "
                      "columns + exact rerank) vs exact brute force",
            "n_vectors": args.vectors, "dim": args.dim, "m_sub": 8,
            "n_clusters": N_CLUSTERS, "nprobe": NPROBE, "k": K,
            "refine": args.refine, "queries": N_QUERIES,
            "build_sec": round(t_build, 1),
            "pq_query_sec_16q": round(t_ivf, 1),
            "brute_query_sec_16q": round(t_brute, 1),
            "bytes_codes_read": stats["bytes_codes_read"],
            "bytes_embedding_probed": stats["bytes_embedding_probed"],
            "code_bytes_fraction": round(
                stats["bytes_codes_read"]
                / max(stats["bytes_embedding_probed"], 1), 4),
            "refine_rows": stats["refine_rows"],
            "files_read_16q": stats["files_read"],
            "mean_recall_at_k": round(float(np.mean(recalls)), 4),
            "driver_peak_rss_gb": round(peak, 2),
        }))
        # the ADC working set must be a small fraction of the raw
        # embedding bytes it displaced, and recall must beat the
        # random floor by a wide margin
        assert stats["bytes_codes_read"] * 3 < stats["bytes_embedding_probed"], stats
        assert stats["refine_rows"] <= N_QUERIES * K * args.refine, stats
        assert np.mean(recalls) >= 0.6, recalls
        return

    index_dir = os.path.join(args.out, "ivf_index")
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    build_ivf_index(ds, index_dir, n_clusters=N_CLUSTERS, iters=4,
                    distributed_train=True)
    t_build = time.time() - t0

    t1 = time.time()
    stats: dict = {}
    ivf = knn_ivf_indexed(index_dir, q, k=K, nprobe=NPROBE,
                          stats_out=stats).to_pandas()
    t_ivf = time.time() - t1

    # the per-QUERY pruning claim: one query reads exactly nprobe
    # partitions (a batch of 16 unions its probes — that's recall, not
    # a pruning failure)
    one_stats: dict = {}
    t1b = time.time()
    knn_ivf_indexed(index_dir, q[:1], k=K, nprobe=NPROBE,
                    stats_out=one_stats)
    t_one = time.time() - t1b

    t2 = time.time()
    brute = knn_brute(ds, q, k=K).to_pandas()
    t_brute = time.time() - t2

    recalls = []
    for qi in range(N_QUERIES):
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        a = set(ivf[ivf["query_id"] == qi]["vec_id"])
        recalls.append(len(a & b) / max(len(b), 1))
    read_frac = stats["files_read"] / max(stats["files_total"], 1)

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ray.shutdown()
    print(json.dumps({
        "metric": "persisted-IVF similarity soak (distributed Lloyd train + "
                  "probe-pruned partitioned reads) vs exact brute force",
        "n_vectors": args.vectors, "dim": args.dim,
        "n_clusters": N_CLUSTERS, "nprobe": NPROBE, "k": K,
        "queries": N_QUERIES,
        "build_sec": round(t_build, 1),
        "ivf_query_sec_16q": round(t_ivf, 1),
        "ivf_query_sec_1q": round(t_one, 1),
        "brute_query_sec_16q": round(t_brute, 1),
        "files_read_16q": stats["files_read"],
        "files_total": stats["files_total"],
        "read_fraction_16q": round(read_frac, 3),
        "files_read_1q": one_stats["files_read"],
        "partitions_read_1q": one_stats["partition_dirs_read"],
        "mean_recall_at_k": round(float(np.mean(recalls)), 4),
        "driver_peak_rss_gb": round(peak, 2),
    }))
    # one query must read exactly its nprobe partitions; recall must beat
    # the random-read floor by a wide margin
    assert one_stats["partition_dirs_read"] <= NPROBE, one_stats
    assert np.mean(recalls) >= 0.6, recalls


if __name__ == "__main__":
    main()
