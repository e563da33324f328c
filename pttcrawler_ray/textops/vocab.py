"""Corpus-level n-gram statistics: distributed top-K vocabulary.

The classic wordcount shape done scale-right (a tokenizer-vocabulary /
corpus-statistics pass is a standard first stage of an LLM training-data
pipeline): a per-batch PARTIAL count (``map_batches`` — shrinks the
corpus to per-batch-distinct grams before anything shuffles), ONE coarse
hash shuffle keyed on the gram string (:func:`partitioned_map_groups` —
every gram lands wholly in one partition), a vectorized per-partition
exact sum + local top-k, and a driver merge of the tiny per-partition
winners (≤ parts × k rows).  Full text never shuffles; the wide exchange
carries only narrow ``(gram, partial_count)`` rows, and the driver never
sees more than the winner set.

Correctness of the local-topk-then-merge: each gram's rows land in
exactly one hash partition, so the per-partition sums are exact totals;
any gram in the global top-k is therefore in its own partition's top-k
(same ``(n DESC, gram ASC)`` tie-break applied at both levels).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _tokens_flat
from ..util.rayops import partitioned_map_groups


def _flat_grams(texts, n: int):
    """Flat string array of word n-grams (space-joined) for a column of
    texts.  n=1 → the tokens themselves; n>1 → adjacent windows that stay
    inside one document.  Tokens are ``\\S+`` runs, so the space join is
    injective (a gram string maps back to exactly one token window)."""
    flat, parents, _ = _tokens_flat(texts)
    if n == 1:
        return flat
    if len(flat) < n:
        return pa.array([], pa.string())
    # windows [i, i+n) valid iff the first and last token share a parent
    ok = parents[: len(parents) - n + 1] == parents[n - 1:]
    parts = [flat.slice(j, len(flat) - n + 1) for j in range(n)]
    joined = pc.binary_join_element_wise(*parts, " ")
    return joined.filter(pa.array(ok))


def ngram_count_batch(batch: pa.Table, *, n: int = 1,
                      text_col: str = "text") -> pa.Table:
    """Per-batch PARTIAL gram counts — the pre-aggregation combiner that
    runs before the shuffle.  Output: narrow (gram, n) rows, one per
    gram distinct WITHIN this batch."""
    grams = _flat_grams(batch[text_col], n)
    if len(grams) == 0:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    vc = pc.value_counts(grams)
    return pa.table({"gram": vc.field("values"),
                     "n": pc.cast(vc.field("counts"), pa.int64())})


def _topk_table(t: pa.Table, k: int) -> pa.Table:
    order = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                          ("gram", "ascending")])
    return t.take(order.slice(0, min(k, len(t))))


def _make_partition_topk(k: int):
    def part_fn(g: pa.Table) -> pa.Table:
        sums = g.group_by("gram").aggregate([("n", "sum")])
        sums = sums.rename_columns(
            ["n" if c == "n_sum" else c for c in sums.column_names])
        return _topk_table(sums, k)
    return part_fn


def vocab_topk(ds, k: int = 200, n: int = 1,
               text_col: str = "text") -> pa.Table:
    """Global top-``k`` word ``n``-grams by corpus frequency.

    Returns a small pyarrow Table (gram, n) sorted by
    (n DESC, gram ASC) — driver-side data is bounded by
    partitions × k regardless of corpus size.  Partition sizing comes
    from the MEASURED partial row count (a doc count would under-size it
    by the tokens-per-doc factor).
    """
    import ray

    if n < 1:
        raise ValueError(f"n-gram width must be >= 1, got {n}")

    partials = ds.map_batches(ngram_count_batch,
                              fn_kwargs={"n": n, "text_col": text_col},
                              batch_format="pyarrow")
    # Cap the partials' block count at this materialize seam: the groupby
    # sort fans out per INPUT block, so block count — not row count — is
    # the superlinear term (measured at 1M docs / 38M partial rows:
    # 200 blocks → 93 s for the group stage, 48 blocks → 22 s).  Target a
    # small multiple of the CPU budget, and size partitions from the
    # MEASURED partial rows (≈ corpus tokens, not docs — web-text junk
    # grams are mostly count-1, so partials barely shrink).
    mat = partials.materialize()
    rows = mat.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    shuffle_blocks = max(16, min(256, cpus * 2))
    if mat.num_blocks() > shuffle_blocks:
        mat = mat.repartition(shuffle_blocks).materialize()
    # floor the partition count at 1, not _resolve_parts' 256: with a
    # small gram universe most of 256 hash ranges would be EMPTY sort
    # partitions, which Ray emits as schema-less blocks (the
    # "new schema: ." warning spray)
    n_parts = max(1, min(256, rows // 200_000 + 1))
    winners = partitioned_map_groups(mat, "gram",
                                     _make_partition_topk(k),
                                     n_parts=n_parts)
    tabs = [t for t in ray.get(winners.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    merged = pa.concat_tables([t.select(["gram", "n"]) for t in tabs])
    return _topk_table(merged.combine_chunks(), k)
