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
    benchmark side is ever the real workload, spill this sorted array to
    parquet and probe per partition instead of broadcasting."""
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
