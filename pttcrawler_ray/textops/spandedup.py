"""Repeated-span (exact-substring) dedup over a ``(doc_id, text)`` corpus.

The Lee et al. 2021 operator ("Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499) at k-token granularity:
find every span of ``k`` consecutive tokens whose exact token sequence
occurs more than once corpus-wide (across documents or within one),
keep the globally-first occurrence (min ``(doc_id, pos)``), and cut the
token range ``[pos, pos + k)`` of every other occurrence out of its
document.  Overlapping cut ranges merge naturally (interval union), so
a long duplicated passage disappears as one gap, exactly like the
suffix-array spans of the paper.

Scale shape (the 100-TB contract):

- the explode emits only ``(span_h, doc_id, pos)`` — 24 B/token; token
  TEXT never shuffles.  ``span_h`` is the same 64-bit position-weighted
  Karp-Rabin combination of BLAKE2b token hashes the decontamination
  operator uses (``decontam._gram_hashes`` math), so identical windows
  always agree and the repeat scan needs no strings;
- repeat detection is ONE coarse hash-partition pass
  (``rayops.partitioned_map_groups`` on ``span_h``): inside a partition
  every occurrence of a span hash is present, so count + global-first
  is one vectorized run scan and only DROP rows (output-sized) leave
  the task;
- the rewrite is adaptive like :mod:`.paradedup`: below
  ``_BCAST_DROP_MAX`` drop rows the packed sorted key array broadcasts
  (``ray.put`` once, per-doc ``searchsorted`` range probe per batch);
  above it, docs and drops co-partition by ``doc_id`` in one
  tagged-union shuffle and each partition rewrites its own docs.
- interval removal is a batch-flat difference array (+1 at span start,
  -1 at span end over the flat token stream, cumsum > 0 = covered) —
  no per-doc Python loop.

The DuckDB twin (:func:`span_dedup_sql`) groups by the span's token
STRING itself, so the driver's †query would surface any 64-bit hash
collision at compare scale (same trade as exact/paragraph dedup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .analysis import _tokens_flat
from .decontam import _gram_hashes
from ..util.hashing import hash_u64_many

_BCAST_DROP_MAX = 2_000_000  # drop rows; ~16 MB broadcast ceiling
_POS_BITS = 20               # tokens per doc < 2^20 for the packed key
_KR_BASE = np.uint64(1000003)


def _pack_key(ids: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) << np.uint64(_POS_BITS)) \
        | pos.astype(np.uint64)


def _explode_spans_batch(batch: pa.Table, *, k: int, id_col: str,
                         text_col: str) -> pa.Table:
    """(span_h, doc_id, pos) — one narrow row per k-token window.  Same
    token split (``str.split()`` whitespace semantics) and the same
    Karp-Rabin hash combination as :func:`..decontam._gram_hashes`, but
    keeping the window's token position inside its document."""
    flat, parents, counts = _tokens_flat(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    assert counts.max(initial=0) < (1 << _POS_BITS), \
        f"doc with >= 2^{_POS_BITS} tokens"
    th = hash_u64_many(flat.to_pylist())
    if len(th) < k:
        return pa.table({"span_h": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    ok = parents[: len(parents) - k + 1] == parents[k - 1:]
    powers = _KR_BASE ** np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        gh = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    starts = np.r_[np.int64(0), np.cumsum(counts)][:-1]
    gidx = np.flatnonzero(ok)
    gpar = parents[gidx]
    return pa.table({
        "span_h": pa.array(gh[ok], pa.uint64()),
        "doc_id": pa.array(ids[gpar], pa.int64()),
        "pos": pa.array(gidx - starts[gpar], pa.int64()),
    })


def _drops_from_partition(g: pa.Table, *, min_count: int) -> pa.Table:
    """Vectorized per-hash run scan over one coarse partition: emit the
    non-first (doc_id, pos) occurrences of every repeated span."""
    sh = g["span_h"].to_numpy(zero_copy_only=False)
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    pos = g["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, ids, sh))
    sh_s, ids_s, pos_s = sh[order], ids[order], pos[order]
    is_first = np.r_[True, sh_s[1:] != sh_s[:-1]]
    sizes = np.diff(np.r_[np.flatnonzero(is_first), sh_s.size])
    dup = np.repeat(sizes >= min_count, sizes)
    drop = dup & ~is_first
    return pa.table({"doc_id": pa.array(ids_s[drop], pa.int64()),
                     "pos": pa.array(pos_s[drop], pa.int64())})


def _ranges_concat(lo: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(lo_i, lo_i + lens_i)`` without a loop."""
    total = int(lens.sum())
    if not total:
        return np.empty(0, np.int64)
    return (np.arange(total, dtype=np.int64)
            - np.repeat(np.r_[np.int64(0), np.cumsum(lens)][:-1], lens)
            + np.repeat(lo, lens))


def _rebuild_batch(batch: pa.Table, *, k: int, id_col: str, text_col: str,
                   drop_keys_sorted: np.ndarray) -> pa.Table:
    """Cut every dropped span's token range out of its doc — batch-flat
    difference array over the token stream, then one list re-pack."""
    flat, parents, counts = _tokens_flat(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.r_[np.int64(0), np.cumsum(counts)]
    if drop_keys_sorted.size and len(batch):
        # per-doc packed-key range probe into the global sorted drop set
        lo = np.searchsorted(drop_keys_sorted,
                             _pack_key(ids, np.zeros(len(ids), np.int64)))
        hi = np.searchsorted(drop_keys_sorted,
                             _pack_key(ids + 1, np.zeros(len(ids), np.int64)))
        lens = (hi - lo).astype(np.int64)
        take = _ranges_concat(lo.astype(np.int64), lens)
        dk = drop_keys_sorted[take]
        drow = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        dpos = (dk & np.uint64((1 << _POS_BITS) - 1)).astype(np.int64)
        span_start = offs[drow] + dpos
        diff = np.zeros(len(flat) + 1, np.int64)
        np.add.at(diff, span_start, 1)
        np.add.at(diff, span_start + k, -1)
        covered = np.cumsum(diff[:-1]) > 0
        keep = ~covered
    else:
        keep = np.ones(len(flat), bool)
    # segment sums via cumsum differences — exact for zero-token docs
    # anywhere in the batch (reduceat would reject or corrupt trailing
    # empty segments)
    cs = np.r_[np.int64(0), np.cumsum(keep.astype(np.int64))]
    kept_counts = (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)
    new_offs = np.r_[np.int64(0), np.cumsum(kept_counts)].astype(np.int32)
    kept_list = pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep)))
    import pyarrow.compute as pc

    clean = pc.binary_join(kept_list, " ")
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "text_clean": clean.cast(pa.string()),
        "n_tokens": pa.array(counts.astype(np.int64), pa.int64()),
        "n_dropped": pa.array(counts - kept_counts, pa.int64()),
    })


def span_drops(docs: "rd.Dataset", k: int = 8, min_count: int = 2,
               id_col: str = "doc_id", text_col: str = "text") -> "rd.Dataset":
    """The (doc_id, pos) span occurrences :func:`span_dedup` will cut —
    the narrow half of the pipeline, exposed for repeat-map callers."""
    from ..util.rayops import partitioned_map_groups

    spans = docs.map_batches(
        _explode_spans_batch,
        fn_kwargs={"k": k, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")
    return partitioned_map_groups(
        spans, "span_h",
        lambda g: _drops_from_partition(g, min_count=min_count))


def span_dedup(docs: "rd.Dataset", k: int = 8, min_count: int = 2,
               id_col: str = "doc_id", text_col: str = "text") -> "rd.Dataset":
    """Rewrite every doc with repeated k-token spans removed (first
    occurrence kept).  Returns ``(id_col, text_clean, n_tokens,
    n_dropped)`` — one row per input doc."""
    import ray

    from ..util.rayops import (bcast_get, normalize_blocks,
                               partitioned_map_groups)

    # consumed by explode AND rebuild; block count capped at the seam
    # (the union below feeds a sort-based groupby, which fans out one
    # partition per input block — CLAUDE.md fragmentation rule)
    docs = normalize_blocks(docs.materialize())
    drops = normalize_blocks(span_drops(docs, k=k, min_count=min_count,
                                        id_col=id_col,
                                        text_col=text_col).materialize())
    n_drops = drops.count()
    if n_drops <= _BCAST_DROP_MAX:
        if n_drops:
            dd = drops.to_pandas()
            keys = np.sort(_pack_key(dd["doc_id"].to_numpy(np.int64),
                                     dd["pos"].to_numpy(np.int64)))
        else:
            keys = np.empty(0, np.uint64)
        ref = ray.put(keys)

        def rebuild(t: pa.Table) -> pa.Table:
            return _rebuild_batch(t, k=k, id_col=id_col, text_col=text_col,
                                  drop_keys_sorted=bcast_get(ref))

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # at-scale path: co-partition docs and drops by doc_id in one
    # tagged-union shuffle; drop rows are output-sized and doc-aligned,
    # so per-task memory is one coarse partition of each
    import pyarrow.compute as pc

    def tag_doc(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         text_col: t[text_col].cast(pa.string()),
                         "pos": pa.nulls(len(t), pa.int64())})

    def tag_drop(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["doc_id"].cast(pa.int64()),
                         text_col: pa.nulls(len(t), pa.string()),
                         "pos": t["pos"].cast(pa.int64())})

    union = docs.map_batches(tag_doc, batch_format="pyarrow").union(
        drops.map_batches(tag_drop, batch_format="pyarrow"))

    def rebuild_group(g: pa.Table) -> pa.Table:
        is_drop = pc.is_valid(g["pos"])
        drop_rows = g.filter(is_drop)
        doc_rows = g.filter(pc.invert(is_drop))
        keys = np.sort(_pack_key(
            drop_rows[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            drop_rows["pos"].to_numpy(zero_copy_only=False).astype(np.int64)))
        return _rebuild_batch(doc_rows.select([id_col, text_col]), k=k,
                              id_col=id_col, text_col=text_col,
                              drop_keys_sorted=keys)

    return partitioned_map_groups(union, id_col, rebuild_group)


def span_dedup_sql(table: str, k: int = 8, min_count: int = 2,
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`span_dedup` — identical ``\\S+`` tokens,
    identical first-occurrence rule (min packed ``doc_id``/``pos`` key),
    identical interval union; groups by the span's token STRING
    (collision-free reference)."""
    pb = 1 << _POS_BITS
    return f"""
WITH toks AS (
  SELECT {id_col}, regexp_extract_all(coalesce({text_col}, ''), '\\S+') AS ts
  FROM {table}
), grams AS (
  SELECT {id_col}, p1 - 1 AS pos,
         array_to_string(ts[p1:p1+{k - 1}], ' ') AS g
  FROM (SELECT {id_col}, ts,
               unnest(generate_series(1, len(ts) - {k} + 1)) AS p1
        FROM toks WHERE len(ts) >= {k})
), stats AS (
  SELECT g, count(*) AS cnt, min({id_col} * {pb} + pos) AS fk
  FROM grams GROUP BY g
), drops AS (
  SELECT {id_col}, pos
  FROM (SELECT {id_col}, pos, g, {id_col} * {pb} + pos AS kk FROM grams) gg
  JOIN stats USING (g)
  WHERE cnt >= {min_count} AND kk <> fk
), covered AS (
  SELECT DISTINCT {id_col}, unnest(generate_series(pos, pos + {k - 1})) AS tpos
  FROM drops
), tokpos AS (
  SELECT {id_col}, unnest(ts) AS tok,
         unnest(generate_series(1, len(ts))) - 1 AS tpos
  FROM toks
), kept AS (
  SELECT t.{id_col}, t.tok, t.tpos
  FROM tokpos t LEFT JOIN covered c
    ON t.{id_col} = c.{id_col} AND t.tpos = c.tpos
  WHERE c.{id_col} IS NULL
)
SELECT d.{id_col},
       coalesce(kk.text_clean, '') AS text_clean,
       CAST(len(regexp_extract_all(coalesce(d.{text_col}, ''), '\\S+'))
            AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(coalesce(d.{text_col}, ''), '\\S+'))
            - coalesce(kk.n_kept, 0) AS BIGINT) AS n_dropped
FROM {table} d
LEFT JOIN (SELECT {id_col},
                  string_agg(tok, ' ' ORDER BY tpos) AS text_clean,
                  count(*) AS n_kept
           FROM kept GROUP BY {id_col}) kk USING ({id_col})
"""
