"""Paragraph-level exact dedup over a ``(doc_id, text)`` corpus.

The C4/RefinedWeb-style intra-corpus boilerplate remover: split every
document into paragraphs on a separator, find paragraphs whose exact
text repeats across the corpus, and rewrite each document with the
repeats removed — either keeping the globally-first occurrence
(``keep_first=True``, the conservative default) or dropping every
occurrence of a repeated paragraph (``keep_first=False``, the C4 rule).

Scale shape (the 100-TB contract):

- the explode emits only ``(doc_id, pidx, phash)`` — 20 B/paragraph;
  paragraph TEXT never shuffles;
- repeat detection is ONE coarse hash-partition pass
  (``rayops.partitioned_map_groups`` keyed on the 64-bit paragraph
  hash): inside a partition every occurrence of a hash is present, so
  count + global-first (min ``(doc_id, pidx)``) is a vectorized
  run-scan, and only DROP rows (output-sized) leave the task;
- the rewrite is adaptive like the repo's other drop filters: below
  ``_BCAST_DROP_MAX`` drop keys the sorted key array is broadcast
  (``ray.put`` once, ``searchsorted`` per batch — document text never
  moves); above it, docs and drops co-partition by ``doc_id`` in one
  tagged-union shuffle and each partition rewrites its own docs.

Identity is the corpus-standard BLAKE2b-64 text hash
(``util.hashing.hash_u64_many``); a cross-text collision (2^-64 per
pair) would merge two distinct paragraphs — acceptable for boilerplate
removal, same trade as the exact-dedup operator.  The DuckDB twin
(:func:`paragraph_dedup_sql`) groups by the paragraph STRING itself, so
the driver's †query would catch any collision at test scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..util.hashing import hash_u64_many

_BCAST_DROP_MAX = 2_000_000  # drop keys; ~16 MB broadcast ceiling
_PIDX_BITS = 20              # paragraphs per doc < 2^20 for the packed key


def _explode_batch(batch: pa.Table, *, sep: str, id_col: str,
                   text_col: str) -> pa.Table:
    """(doc_id, pidx, phash) — one narrow row per paragraph."""
    paras = pc.split_pattern(pc.fill_null(batch[text_col], ""), pattern=sep)
    if isinstance(paras, pa.ChunkedArray):
        paras = paras.combine_chunks()
    counts = pc.list_value_length(paras).to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = paras.flatten()
    pidx = np.arange(len(flat), dtype=np.int64) - np.repeat(
        paras.offsets.to_numpy(zero_copy_only=False)[:-1], counts)
    assert counts.max(initial=0) < (1 << _PIDX_BITS), \
        f"doc with >= 2^{_PIDX_BITS} paragraphs"
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
        "pidx": pa.array(pidx, pa.int64()),
        "phash": pa.array(hash_u64_many(flat.to_pylist()), pa.uint64()),
    })


def _drops_from_partition(g: pa.Table, *, min_count: int,
                          keep_first: bool) -> pa.Table:
    """Vectorized per-hash run scan over one coarse partition: emit the
    (doc_id, pidx) occurrences to DROP."""
    ph = g["phash"].to_numpy(zero_copy_only=False)
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    px = g["pidx"].to_numpy(zero_copy_only=False)
    order = np.lexsort((px, ids, ph))
    ph_s, ids_s, px_s = ph[order], ids[order], px[order]
    starts = np.flatnonzero(np.r_[True, ph_s[1:] != ph_s[:-1]])
    sizes = np.diff(np.r_[starts, ph_s.size])
    dup = np.repeat(sizes >= min_count, sizes)
    if keep_first:
        is_first = np.r_[True, ph_s[1:] != ph_s[:-1]]
        drop = dup & ~is_first
    else:
        drop = dup
    return pa.table({"doc_id": pa.array(ids_s[drop], pa.int64()),
                     "pidx": pa.array(px_s[drop], pa.int64())})


def _pack_key(ids: np.ndarray, pidx: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) << np.uint64(_PIDX_BITS)) \
        | pidx.astype(np.uint64)


def _rebuild_batch(batch: pa.Table, *, sep: str, id_col: str, text_col: str,
                   drop_keys_sorted: np.ndarray) -> pa.Table:
    """Re-split each doc, drop flagged paragraph positions, re-join.
    Fully vectorized: Arrow list offsets + searchsorted + binary_join."""
    paras = pc.split_pattern(pc.fill_null(batch[text_col], ""), pattern=sep)
    if isinstance(paras, pa.ChunkedArray):
        paras = paras.combine_chunks()
    counts = pc.list_value_length(paras).to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    flat = paras.flatten()
    offs = paras.offsets.to_numpy(zero_copy_only=False)
    pidx = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], counts)
    key = _pack_key(np.repeat(ids, counts), pidx)
    if drop_keys_sorted.size:
        pos = np.searchsorted(drop_keys_sorted, key)
        pos[pos == drop_keys_sorted.size] = drop_keys_sorted.size - 1
        dropped = drop_keys_sorted[pos] == key
    else:
        dropped = np.zeros(key.size, bool)
    keep = ~dropped
    kept_counts = np.add.reduceat(keep, offs[:-1]) if len(batch) else \
        np.zeros(0, np.int64)
    kept_counts = np.where(counts > 0, kept_counts, 0)
    new_offs = np.r_[0, np.cumsum(kept_counts)].astype(np.int32)
    kept_list = pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()),
        flat.filter(pa.array(keep)))
    clean = pc.binary_join(kept_list, sep)
    out = batch.select([id_col]).append_column(
        "text_clean", clean.cast(pa.string()))
    out = out.append_column("n_paras", pa.array(counts, pa.int64()))
    return out.append_column(
        "n_dropped", pa.array(counts - kept_counts, pa.int64()))


def paragraph_drops(docs: "rd.Dataset", sep: str = "\n\n",
                    min_count: int = 2, keep_first: bool = True,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> "rd.Dataset":
    """The (doc_id, pidx) occurrences that :func:`paragraph_dedup` will
    remove — the narrow half of the pipeline, exposed for callers that
    only need the repeat map."""
    from ..util.rayops import partitioned_map_groups

    paras = docs.map_batches(
        _explode_batch,
        fn_kwargs={"sep": sep, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")
    return partitioned_map_groups(
        paras, "phash",
        lambda g: _drops_from_partition(g, min_count=min_count,
                                        keep_first=keep_first))


def paragraph_dedup(docs: "rd.Dataset", sep: str = "\n\n",
                    min_count: int = 2, keep_first: bool = True,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> "rd.Dataset":
    """Rewrite every doc with repeated paragraphs removed.  Returns
    ``(id_col, text_clean, n_paras, n_dropped)`` — one row per input doc
    (``text_clean == ''`` when everything was boilerplate).
    """
    import ray

    from ..util.rayops import bcast_get

    docs = docs.materialize()  # consumed by explode AND rebuild
    drops = paragraph_drops(docs, sep=sep, min_count=min_count,
                            keep_first=keep_first, id_col=id_col,
                            text_col=text_col).materialize()
    n_drops = drops.count()
    if n_drops <= _BCAST_DROP_MAX:
        if n_drops:
            dd = drops.to_pandas()
            keys = np.sort(_pack_key(dd["doc_id"].to_numpy(np.int64),
                                     dd["pidx"].to_numpy(np.int64)))
        else:
            keys = np.empty(0, np.uint64)
        ref = ray.put(keys)

        def rebuild(t: pa.Table) -> pa.Table:
            return _rebuild_batch(t, sep=sep, id_col=id_col,
                                  text_col=text_col,
                                  drop_keys_sorted=bcast_get(ref))

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # at-scale path: co-partition docs and drops by doc_id in one
    # tagged-union shuffle; each partition rewrites its own docs with a
    # partition-local sorted key array (drop rows are output-sized and
    # doc-aligned, so per-task memory is one coarse partition of each)
    from ..util.rayops import partitioned_map_groups

    def tag_doc(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         text_col: t[text_col].cast(pa.string()),
                         "pidx": pa.nulls(len(t), pa.int64())})

    def tag_drop(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t["doc_id"].cast(pa.int64()),
                         text_col: pa.nulls(len(t), pa.string()),
                         "pidx": t["pidx"].cast(pa.int64())})

    union = docs.map_batches(tag_doc, batch_format="pyarrow").union(
        drops.map_batches(tag_drop, batch_format="pyarrow"))

    def rebuild_group(g: pa.Table) -> pa.Table:
        is_drop = pc.is_valid(g["pidx"])
        drop_rows = g.filter(is_drop)
        doc_rows = g.filter(pc.invert(is_drop))
        keys = np.sort(_pack_key(
            drop_rows[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            drop_rows["pidx"].to_numpy(zero_copy_only=False).astype(np.int64)))
        return _rebuild_batch(doc_rows.select([id_col, text_col]),
                              sep=sep, id_col=id_col, text_col=text_col,
                              drop_keys_sorted=keys)

    return partitioned_map_groups(union, id_col, rebuild_group)


def paragraph_dedup_sql(table: str, sep: str, min_count: int = 2,
                        keep_first: bool = True, id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`paragraph_dedup` — identical split, identical
    first-occurrence rule (min packed ``doc_id``/``pidx`` key), identical
    join; groups by the paragraph STRING (collision-free reference)."""
    first_rule = f"AND NOT (k = fk)" if keep_first else ""
    return f"""
WITH p AS (
  SELECT {id_col}, unnest(paras) AS para,
         unnest(generate_series(1, len(paras))) - 1 AS pidx
  FROM (SELECT {id_col},
               string_split(coalesce({text_col}, ''), '{sep}') AS paras
        FROM {table})
), stats AS (
  SELECT para, count(*) AS cnt,
         min({id_col} * {1 << _PIDX_BITS} + pidx) AS fk
  FROM p GROUP BY para
), drops AS (
  SELECT p.{id_col}, p.pidx
  FROM (SELECT *, {id_col} * {1 << _PIDX_BITS} + pidx AS k FROM p) p
  JOIN stats USING (para)
  WHERE cnt >= {min_count} {first_rule}
), kept AS (
  SELECT p.{id_col}, p.pidx, p.para
  FROM p LEFT JOIN drops d
    ON p.{id_col} = d.{id_col} AND p.pidx = d.pidx
  WHERE d.{id_col} IS NULL
)
SELECT t.{id_col},
       coalesce(k.text_clean, '') AS text_clean,
       len(string_split(coalesce(t.{text_col}, ''), '{sep}')) AS n_paras,
       len(string_split(coalesce(t.{text_col}, ''), '{sep}'))
         - coalesce(k.n_kept, 0) AS n_dropped
FROM {table} t
LEFT JOIN (SELECT {id_col},
                  string_agg(para, '{sep}' ORDER BY pidx) AS text_clean,
                  count(*) AS n_kept
           FROM kept GROUP BY {id_col}) k USING ({id_col})
"""
