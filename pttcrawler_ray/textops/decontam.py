"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

Standard LLM-pipeline hygiene (the GPT-3/Gopher "13-gram overlap" family,
here parameterized): the EVAL side is small by definition (benchmark
suites are MBs even when the corpus is 100 TB), so it is the broadcast
side — its distinct n-gram hashes are collected once (per-batch unique →
driver union, bounded by the benchmark's gram universe, independent of
corpus size), ``ray.put`` once, and read per worker through the
:func:`~pttcrawler_ray.util.rayops.bcast_get` LRU.  The corpus side
streams: one vectorized ``map_batches`` pass computing rolling-hash
grams + a ``searchsorted`` membership probe per batch; nothing
corpus-sized ever lands on the driver.

Gram identity is a 64-bit position-weighted Karp–Rabin combination of
BLAKE2b token hashes (the :mod:`..util.hashing` stable hash) — identical
token windows always agree, distinct windows collide with ~2^-64
probability, which is what lets the membership probe stay a numpy
``searchsorted`` instead of a string shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .analysis import _run_firsts, _tokens_flat
from .dedup import _bcast_get
from ..util.hashing import hash_u64_many
from ..util.rayops import partitioned_map_groups

_KR_BASE = np.uint64(1000003)


def _gram_hashes(texts, n: int):
    """(uint64 gram hashes, parent doc indices) for word n-grams of a
    text column — windows never cross a document boundary."""
    if n < 1:
        raise ValueError(f"n-gram width must be >= 1, got {n}")
    flat, parents, _ = _tokens_flat(texts)
    th = hash_u64_many(flat.to_pylist())
    if len(th) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    win = np.lib.stride_tricks.sliding_window_view(th, n)
    ok = parents[: len(parents) - n + 1] == parents[n - 1:]
    powers = _KR_BASE ** np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        gh = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return gh[ok], parents[: len(parents) - n + 1][ok]


def _bench_grams_batch(batch: pa.Table, *, n: int,
                       text_col: str = "text") -> pa.Table:
    gh, _ = _gram_hashes(batch[text_col], n)
    return pa.table({"gram_h": pa.array(np.unique(gh), pa.uint64())})


def benchmark_ngram_hashes(bench_ds, n: int = 5,
                           text_col: str = "text") -> np.ndarray:
    """Sorted unique gram hashes of the benchmark set.  Driver memory is
    bounded by the BENCHMARK's distinct grams (the small side), not the
    corpus.

    "Small by definition" holds for real eval suites (MBs at 100-TB
    corpus scale) but NOT automatically for a caller-supplied slice: the
    bench entry ``decontaminate_docs`` uses a ``doc_id % 29 == 0`` slice
    (~1/29 of the corpus), so ITS broadcast side grows linearly with sf
    (0.37 GB driver RSS at the 1M-doc soak).  If a corpus-proportional
    benchmark side is ever the real workload, use the partitioned plan
    (:func:`build_benchmark_store` + :func:`decontaminate_partitioned`)
    instead of broadcasting."""
    import ray

    parts = bench_ds.map_batches(_bench_grams_batch,
                                 fn_kwargs={"n": n, "text_col": text_col},
                                 batch_format="pyarrow")
    arrs = [t["gram_h"].to_numpy(zero_copy_only=False)
            for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not arrs:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(arrs))


def _distinct_per_parent(gh: np.ndarray, gp: np.ndarray):
    """Keep one instance of each (parent, gram) pair — matches the SQL
    oracle's ``count(DISTINCT gram)`` semantics."""
    if not len(gh):
        return gh, gp
    order, first = _run_firsts(gp, gh)
    return gh[order][first], gp[order][first]


def _decontam_batch(batch: pa.Table, *, bench_ref, n: int,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    bench = _bcast_get(bench_ref)  # sorted uint64 array
    gh, gp = _gram_hashes(batch[text_col], n)
    gh, gp = _distinct_per_parent(gh, gp)
    hits = np.zeros(len(batch), np.int64)
    if len(gh) and len(bench):
        pos = np.searchsorted(bench, gh)
        pos[pos == len(bench)] = len(bench) - 1
        member = bench[pos] == gh
        np.add.at(hits, gp[member], 1)
    keep = hits > 0
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table({id_col: pa.array(ids[keep]),
                     "n_hits": pa.array(hits[keep], pa.int64())})


def decontaminate(docs_ds, bench_ds, n: int = 5,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Streaming contamination scan: rows ``(id_col, n_hits)`` for every
    corpus document sharing ≥1 distinct word ``n``-gram with the
    benchmark set.  ``docs_ds`` should already EXCLUDE the benchmark
    documents (they trivially self-match)."""
    import ray

    bench = benchmark_ngram_hashes(bench_ds, n=n, text_col=text_col)
    bench_ref = ray.put(bench)
    return docs_ds.map_batches(
        _decontam_batch,
        fn_kwargs={"bench_ref": bench_ref, "n": n,
                   "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# partitioned plan: benchmark side too big to broadcast
# ---------------------------------------------------------------------------
# When the "benchmark" side is corpus-proportional (cross-corpus overlap
# scans, contamination against another big training set), the broadcast
# array above would grow without bound on the driver.  The at-scale plan
# spills the bench gram hashes to a SHARDED PARQUET STORE (distributed
# write — the driver never holds them) plus a compact bloom filter
# (~2 bytes/gram, the only driver/broadcast-sized object).  The corpus
# side then bloom-prefilters its gram stream (false positives only, no
# misses) and ships ONLY near-hit (bshard, gram_h, doc_id) rows through
# ONE hash shuffle; each shard group loads just its own sorted shard
# file for the exact recheck.  Results are EXACTLY equal to the
# broadcast plan (bloom FPs die in the shard probe) — pinned by test.

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bshard_of(gh: np.ndarray, n_shards: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ((gh * _GOLD) >> np.uint64(64 - int(n_shards).bit_length() + 1)
                ).astype(np.int32) % n_shards


def _bench_shard_batch(batch: pa.Table, *, n: int, n_shards: int,
                       text_col: str) -> pa.Table:
    gh, _ = _gram_hashes(batch[text_col], n)
    gh = np.unique(gh)
    return pa.table({"bshard": pa.array(_bshard_of(gh, n_shards), pa.int32()),
                     "gram_h": pa.array(gh, pa.uint64())})


def build_benchmark_store(bench_ds, store_dir: str, n: int = 5,
                          n_shards: int = 64, bits_per_key: int = 16,
                          text_col: str = "text") -> dict:
    """Spill the benchmark gram-hash set to ``store_dir`` as
    bshard-partitioned parquet (workers write their own shards; sorted by
    shard before the partitioned write so each shard is one file) plus a
    bloom snapshot (``bloom.npz``).  Driver memory = the bloom bits, not
    the gram set.  Returns the manifest (also written as JSON)."""
    import json
    import os

    import ray

    from ..state.bloom import BloomFilter

    grams = bench_ds.map_batches(
        _bench_shard_batch,
        fn_kwargs={"n": n, "n_shards": n_shards, "text_col": text_col},
        batch_format="pyarrow").materialize()
    n_grams = grams.count()
    bloom = BloomFilter(capacity=max(n_grams, 1), bits_per_key=bits_per_key)
    for b in grams.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        bloom.add_many(b["gram_h"].to_numpy(zero_copy_only=False))
    grams.sort("bshard").write_parquet(
        os.path.join(store_dir, "shards"), partition_cols=["bshard"])
    snap = bloom.snapshot()
    np.savez(os.path.join(store_dir, "bloom.npz"),
             nbits=np.int64(snap["nbits"]), k=np.int64(snap["k"]),
             count=np.int64(snap["count"]),
             words=np.frombuffer(snap["words"], np.uint64))
    manifest = {"n": n, "n_shards": n_shards, "n_grams": int(n_grams),
                "bits_per_key": bits_per_key}
    with open(os.path.join(store_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def _corpus_candidates_batch(batch: pa.Table, *, bloom_ref, n: int,
                             n_shards: int, id_col: str,
                             text_col: str) -> pa.Table:
    from ..state.bloom import BloomFilter

    bloom = _bcast_get(bloom_ref, transform=BloomFilter.restore)
    gh, gp = _gram_hashes(batch[text_col], n)
    gh, gp = _distinct_per_parent(gh, gp)
    if len(gh):
        m = bloom.contains_many(gh)
        gh, gp = gh[m], gp[m]
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table({
        "bshard": pa.array(_bshard_of(gh, n_shards), pa.int32()),
        "gram_h": pa.array(gh, pa.uint64()),
        id_col: pa.array(ids[gp], pa.int64())})


def _probe_partition(group: pa.Table, *, store_dir: str,
                     id_col: str) -> pa.Table:
    """One coarse hash partition holding MANY whole bshard groups: sort
    by shard once, then one parquet read + one searchsorted per shard
    PRESENT in the partition (the loop is over ≤ n_shards file reads,
    not rows)."""
    import os

    import pyarrow.parquet as pq

    bs = group["bshard"].to_numpy(zero_copy_only=False)
    gh = group["gram_h"].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(bs, kind="stable")
    bs, gh, ids = bs[order], gh[order], ids[order]
    member = np.zeros(len(gh), bool)
    shards, starts = np.unique(bs, return_index=True)
    bounds = np.append(starts, len(bs))
    for i, shard in enumerate(shards):
        path = os.path.join(store_dir, "shards", f"bshard={int(shard)}")
        if not os.path.isdir(path):
            # every gram routed here was a bloom false positive and the
            # bench side had nothing in this shard — no file was written
            continue
        bench = np.unique(pq.read_table(path, columns=["gram_h"])["gram_h"]
                          .to_numpy(zero_copy_only=False))
        if not len(bench):
            continue
        lo, hi = bounds[i], bounds[i + 1]
        pos = np.searchsorted(bench, gh[lo:hi])
        pos[pos == len(bench)] = len(bench) - 1
        member[lo:hi] = bench[pos] == gh[lo:hi]
    uids, hits = np.unique(ids[member], return_counts=True)
    return pa.table({id_col: pa.array(uids, pa.int64()),
                     "hits": pa.array(hits, pa.int64())})


def decontaminate_partitioned(docs_ds, store_dir: str,
                              id_col: str = "doc_id",
                              text_col: str = "text"):
    """Contamination scan against a :func:`build_benchmark_store` store —
    same output contract as :func:`decontaminate` (``(id_col, n_hits)``
    rows, ``n_hits`` = distinct shared grams), exactly equal results.

    Scale shape: bloom broadcast (compact) → one narrow hash shuffle of
    bloom-surviving (bshard, gram_h, doc_id) rows → per-shard exact
    searchsorted against ONLY that shard's parquet → single-int64-key
    sum of per-shard hits."""
    import json
    import os

    import ray

    with open(os.path.join(store_dir, "manifest.json")) as f:
        mf = json.load(f)
    z = np.load(os.path.join(store_dir, "bloom.npz"), allow_pickle=False)
    snap = {"nbits": int(z["nbits"]), "k": int(z["k"]),
            "count": int(z["count"]), "words": z["words"].tobytes()}
    bloom_ref = ray.put(snap)
    cands = docs_ds.map_batches(
        _corpus_candidates_batch,
        fn_kwargs={"bloom_ref": bloom_ref, "n": mf["n"],
                   "n_shards": mf["n_shards"], "id_col": id_col,
                   "text_col": text_col},
        batch_format="pyarrow").materialize()
    # materialize seam before the shuffle: cap the block fan-out and size
    # the partition count from the MEASURED candidate rows (floor 1 —
    # empty hash-range sort partitions spray schema-less blocks)
    rows = cands.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    shuffle_blocks = max(16, min(256, cpus * 2))
    want = max(1, min(shuffle_blocks, rows // 50_000 + 1))
    if cands.num_blocks() > want:
        cands = cands.repartition(want).materialize()
    n_parts = max(1, min(mf["n_shards"], rows // 200_000 + 1))

    def probe(g: pa.Table) -> pa.Table:
        return _probe_partition(g, store_dir=store_dir, id_col=id_col)

    per_part = partitioned_map_groups(cands, "bshard", probe,
                                      n_parts=n_parts)
    out = per_part.groupby(id_col).sum("hits")
    return out.map_batches(
        lambda t: t.rename_columns([id_col, "n_hits"]),
        batch_format="pyarrow")
