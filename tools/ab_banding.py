"""Interleaved A/B of the MinHash banding stage: committed batch-flat
vectorized ``MinhashBands`` (round 4) vs the round-3 per-document loop
(reconstructed here from ``_shingle_hashes`` + ``MinHasher.signature``,
which are still the library's small-side reference path).

Single-process, no Ray — this isolates the per-batch UDF the actor pool
runs, which is where the round-3 dedup soak was throughput-bound.
Absolute times on this host swing with the hypervisor window (see
BASELINE.md), so the runs interleave old/new/old/new and report the
per-variant medians from ONE window, plus a value-identity check on the
full (band_id, band_hash, doc_id) output.

Run from the repo root:  python tools/ab_banding.py [--docs N] [--reps R]
"""
import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pttcrawler_ray.textops.dedup import MinhashBands, _shingle_hashes
from pttcrawler_ray.util.hashing import hash_u64_many


class OldMinhashBands(MinhashBands):
    """The round-3 per-doc loop, byte-identical output contract."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.mh.signature(_shingle_hashes(text, self.mh.shingle_k))
            view = sig.reshape(self.bands, self.rows_per_band)
            bh = hash_u64_many([v.tobytes() for v in view])
            band_ids.extend(range(self.bands))
            band_hashes.extend(int(x) for x in bh)
            doc_ids.extend([doc_id] * self.bands)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.uint64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        })


def gen_batch(n_docs: int) -> pa.Table:
    """Near-dup-shaped batch: 60% clustered docs (40 shared tokens + a
    variant token, 4 docs/cluster), 40% unique docs — the soak corpus
    recipe at batch size."""
    rng = np.random.default_rng(7)
    texts = []
    n_clustered = int(n_docs * 0.6)
    for i in range(n_docs):
        if i < n_clustered:
            c, v = divmod(i, 4)
            texts.append(" ".join(f"c{c}w{j}" for j in range(40)) + f" v{v}")
        else:
            vals = rng.integers(0, 10_000_000, size=40)
            texts.append(" ".join(f"u{v}" for v in vals))
    return pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=16_384,
                    help="batch size (the actor-pool batch_size shape)")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    batch = gen_batch(args.docs)
    new_fn, old_fn = MinhashBands(), OldMinhashBands()

    # identity check first (also warms both paths)
    a, b = new_fn(batch), old_fn(batch)
    same = a.equals(b)

    times = {"old": [], "new": []}
    for _ in range(args.reps):
        t0 = time.perf_counter(); old_fn(batch)
        t1 = time.perf_counter(); new_fn(batch)
        t2 = time.perf_counter()
        times["old"].append(t1 - t0)
        times["new"].append(t2 - t1)

    med_old = float(np.median(times["old"]))
    med_new = float(np.median(times["new"]))
    print(json.dumps({
        "metric": "MinhashBands per-batch A/B (interleaved, one window)",
        "n_docs": args.docs,
        "output_identical": same,
        "old_sec_median": round(med_old, 3),
        "new_sec_median": round(med_new, 3),
        "old_docs_per_sec": round(args.docs / med_old, 0),
        "new_docs_per_sec": round(args.docs / med_new, 0),
        "speedup": round(med_old / med_new, 2),
        "all_times": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }))


if __name__ == "__main__":
    main()
