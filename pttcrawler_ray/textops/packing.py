"""Sequence-packing offsets for LLM pretraining batches.

Constant-length packing: tokenize every document, append one EOS, lay the
token streams end-to-end in ``key`` order, and slice the global stream
into ``seq_len``-token training examples.  The deliverable of a data
ENGINE is the offset map — for each doc, where its tokens land
(``tok_start``, ``start_example``, ``start_offset``, ``end_example``) —
from which a trainer materializes examples with a pure lookup.

Scale design (the reason this is not a sequential concat): the global
offset is a PREFIX SUM, computed in three payload-free steps —

1. one vectorized pass tokenize-counts each doc → a NARROW
   ``(key, n_tok)`` dataset (16 bytes/doc; the text never moves again),
2. per-range partial sums (``range_id = key // range_size``) reduce to
   one tiny driver-side table (10^4 rows at 10^10 docs), whose exclusive
   scan gives each range's base offset,
3. a coarse-partitioned vectorized group pass (``partitioned_map_groups``
   over ranges) adds base + intra-range cumsum per doc.

No all-to-all of anything wider than (key, n_tok); text is read once.
Requires integer keys; ids may be sparse (ranges just come out uneven).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util.rayops import partitioned_map_groups

_RANGE_SIZE = 1 << 20


def _ntok_batch(batch: pa.Table, *, key: str, text_col: str,
                range_size: int) -> pa.Table:
    from .analysis import _tokens_flat

    _, _, counts = _tokens_flat(batch[text_col])
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        key: pa.array(ids, pa.int64()),
        "n_tok": pa.array(counts.astype(np.int64), pa.int64()),
        "range_id": pa.array(ids // range_size, pa.int64()),
    })


def _range_sums(batch: pa.Table) -> pa.Table:
    import pandas as pd

    df = batch.select(["range_id", "n_tok"]).to_pandas()
    # EOS: every doc contributes n_tok + 1 to the stream
    df["eff"] = df["n_tok"] + 1
    g = df.groupby("range_id", sort=False)["eff"].sum().reset_index()
    return pa.table({"range_id": pa.array(g["range_id"], pa.int64()),
                     "eff_sum": pa.array(g["eff"], pa.int64())})


def pack_offsets(docs, seq_len: int, key: str = "doc_id",
                 text_col: str = "text", range_size: int = _RANGE_SIZE):
    """Per-doc packing offsets as a Dataset with columns ``(key, n_tok,
    tok_start, start_example, start_offset, end_example)`` — all int64.
    ``end_example`` is the example holding the doc's EOS (inclusive); a
    doc longer than ``seq_len`` simply spans several examples, exactly
    like the standard concat-and-chunk recipe."""
    assert seq_len > 0
    narrow = docs.map_batches(
        _ntok_batch,
        fn_kwargs={"key": key, "text_col": text_col,
                   "range_size": range_size},
        batch_format="pyarrow").materialize()

    # tiny: one row per (batch, range) partial, reduced on the driver
    parts = narrow.map_batches(_range_sums, batch_format="pyarrow") \
                  .to_pandas()
    sums = parts.groupby("range_id", sort=True)["eff_sum"].sum()
    # range-base offsets: one int per range (10^4 at 10^10 docs) — small
    # enough to ship in the task closure
    bases = {int(r): int(b) for r, b in
             zip(sums.index, np.concatenate([[0], np.cumsum(sums)[:-1]]))}

    def per_range(t: pa.Table) -> pa.Table:
        b = bases
        df = t.to_pandas().sort_values([key]).reset_index(drop=True)
        eff = (df["n_tok"] + 1).to_numpy(np.int64)
        # grouped exclusive cumsum in key order (ranges are contiguous
        # key intervals, so sorting by key sorts by range too)
        csum = np.cumsum(eff) - eff
        rid = df["range_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, rid[1:] != rid[:-1]])
        group_base0 = csum[starts]  # cumsum value at each range's start
        base = np.array([b[int(r)] for r in rid[starts]], dtype=np.int64)
        tok_start = csum - np.repeat(group_base0, np.diff(
            np.r_[starts, len(rid)])) + np.repeat(base, np.diff(
                np.r_[starts, len(rid)]))
        last = tok_start + df["n_tok"].to_numpy(np.int64)  # EOS position
        return pa.table({
            key: pa.array(df[key], pa.int64()),
            "n_tok": pa.array(df["n_tok"], pa.int64()),
            "tok_start": pa.array(tok_start, pa.int64()),
            "start_example": pa.array(tok_start // seq_len, pa.int64()),
            "start_offset": pa.array(tok_start % seq_len, pa.int64()),
            "end_example": pa.array(last // seq_len, pa.int64()),
        })

    return partitioned_map_groups(narrow, "range_id", per_range)


def pack_sql(table: str, seq_len: int, key: str = "doc_id",
             text_col: str = "text", columns: str = "") -> str:
    """DuckDB twin of :func:`pack_offsets` (window prefix sum; identical
    whitespace tokenizer semantics as ``token_counts_docs``)."""
    cols = f"{key}{', ' + columns if columns else ''}"
    return rf"""
        SELECT {cols}, n_tok, tok_start,
               tok_start // {seq_len} AS start_example,
               tok_start % {seq_len} AS start_offset,
               (tok_start + n_tok) // {seq_len} AS end_example
        FROM (
          SELECT {key},
                 CAST(len(regexp_extract_all({text_col}, '\S+')) AS BIGINT)
                   AS n_tok,
                 CAST(coalesce(sum(len(regexp_extract_all({text_col},
                     '\S+')) + 1) OVER (ORDER BY {key}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS tok_start
          FROM {table})
    """
