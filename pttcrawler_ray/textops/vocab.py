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
from ..util.rayops import normalize_blocks, partitioned_map_groups


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
               approx_rows: int | None = None,
               text_col: str = "text") -> pa.Table:
    """Global top-``k`` word ``n``-grams by corpus frequency.

    Returns a small pyarrow Table (gram, n) sorted by
    (n DESC, gram ASC) — driver-side data is bounded by
    partitions × k regardless of corpus size.
    """
    import ray

    partials = ds.map_batches(ngram_count_batch,
                              fn_kwargs={"n": n, "text_col": text_col},
                              batch_format="pyarrow")
    # the partials are narrow and much smaller than the corpus (per-batch
    # distinct grams); cap the block count at this materialize seam so the
    # groupby sort doesn't fan out one (mostly empty) output block per
    # input block — see util.rayops.normalize_blocks
    partials = normalize_blocks(partials.materialize())
    winners = partitioned_map_groups(partials, "gram",
                                     _make_partition_topk(k),
                                     approx_rows=approx_rows)
    tabs = [t for t in ray.get(winners.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    merged = pa.concat_tables([t.select(["gram", "n"]) for t in tabs])
    return _topk_table(merged.combine_chunks(), k)
