"""Small Ray Data helpers.

:func:`sort_nullable_ts` works around a Ray 2.49 sort defect observed in
this environment: ``Dataset.sort`` on a column containing nulls, downstream
of a ``groupby().map_groups`` chain, duplicates rows nondeterministically
(reproduced in isolation; see tests/test_aux_pipelines.py history).  The
workaround sorts on a non-null int64 surrogate (epoch micros; nulls mapped
to an extreme sentinel).  Nulls-first ascending matches SQLite's ``ORDER
BY`` semantics the reference relies on (reference ``export.py:60``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_SENTINEL_LOW = -(2**62)
_SENTINEL_HIGH = 2**62
_KEY = "__sort_surrogate"


def sort_nullable_ts(ds, col: str, descending: bool = False, nulls_first: bool = True,
                     extra_cols: list[str] | None = None):
    """Sort by a NULLABLE timestamp/int column (plus non-null tiebreak
    columns) without tripping the Ray 2.49 null-key duplication bug: the
    nullable key is replaced by a non-null int64 surrogate.  The bug is
    parallelism-dependent (never fires in 4-cpu test sessions, reliably
    fires at 32 cpus), so every nullable-key sort in the repo must come
    through here."""
    sentinel = _SENTINEL_LOW if (nulls_first != descending) else _SENTINEL_HIGH

    def add_key(t: pa.Table) -> pa.Table:
        micros = pc.cast(t[col], pa.int64())
        return t.append_column(_KEY, pc.fill_null(micros, sentinel))

    keys = [_KEY, *(extra_cols or [])]
    out = ds.map_batches(add_key, batch_format="pyarrow").sort(
        keys if len(keys) > 1 else _KEY, descending=descending)
    return out.map_batches(lambda t: t.drop_columns([_KEY]), batch_format="pyarrow")


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def read_parquet_clean(path, **kw):
    """``rd.read_parquet`` with schema metadata stripped at the READ.

    Parquet written via pandas carries a ``b'pandas'`` schema-metadata blob
    that makes ``pa.Schema`` unhashable; Ray's block-schema dedup then
    falls back to re-unifying schemas in EVERY reduce/merge task (and logs
    "Failed to hash the schemas" per task).  A post-read strip stage is
    not enough — the warning already fires INSIDE the read operator's
    SplitBlocks dedup — so pass an explicit metadata-free ``schema`` to
    the reader (pruned to ``columns`` when given: Ray requires the
    explicit schema to match the projected one).  Falls back to the strip
    stage for multi-file globs/dirs where a single footer isn't cheap to
    pick, or when the caller supplied a schema.
    """
    import ray.data as rd

    if "schema" not in kw and isinstance(path, str) and path.endswith(".parquet"):
        try:
            full = pq.read_schema(path).remove_metadata()
            cols = kw.get("columns")
            kw["schema"] = (pa.schema([full.field(c) for c in cols])
                            if cols else full)
            return rd.read_parquet(path, **kw)
        except Exception:
            kw.pop("schema", None)  # unexpected layout: strip downstream
    ds = rd.read_parquet(path, **kw)
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")


# ------------------------------------------------------------- broadcast get
# per-worker-process cache for broadcast ObjectRefs used by STATELESS
# map_batches tasks: for stages whose setup is just a ray.get of a small
# broadcast object, plain tasks in Ray's prestarted workers beat an actor
# pool (whose spin-up often costs more wall time than the stage computes);
# the cache makes the ray.get once-per-process instead of once-per-batch.
#
# LRU of 2: a stage uses at most a couple of refs at a time, and a tiny
# capacity means a LARGE broadcast object (e.g. a verify-stage shingle
# dict) is dropped from every long-lived worker as soon as the next
# stage's refs pass through, instead of pinning worker RSS for the rest
# of the session.  Eviction is per-entry (oldest first), never a
# wholesale clear that would also evict the running stage's hot entry.
from collections import OrderedDict

_BCAST_CACHE: "OrderedDict[str, object]" = OrderedDict()
_BCAST_CAPACITY = 2


def bcast_get(ref, transform=None):
    """ray.get(ref), LRU-cached per worker process.

    With ``transform``, the TRANSFORMED value is cached — e.g. a
    BloomFilter restored from its broadcast snapshot once per worker
    process instead of once per batch (restore copies the whole bit
    array, so per-batch restoration is O(filter bits) per batch).
    ``transform`` must be a MODULE-LEVEL named callable: the cache key is
    (module, qualname) because the function object itself is deserialized
    fresh per task (id() would never hit), and two lambdas from one
    enclosing function would share a qualname and collide."""
    if transform is None:
        key = (ref.hex(), "", "")
    else:
        qn = getattr(transform, "__qualname__", "")
        mod = getattr(transform, "__module__", "")
        if not qn or not mod or "<lambda>" in qn or "<locals>" in qn:
            # no/empty qualname (functools.partial, callable instances)
            # would degenerate to the no-transform key and collide
            raise TypeError(
                "bcast_get transform must be a module-level named callable "
                f"(got {transform!r}) — closure-local or anonymous callables "
                "collide in the per-worker cache key")
        key = (ref.hex(), mod, qn)
    if key in _BCAST_CACHE:
        _BCAST_CACHE.move_to_end(key)
        return _BCAST_CACHE[key]
    import ray

    val = ray.get(ref)
    if transform is not None:
        val = transform(val)
    _BCAST_CACHE[key] = val
    while len(_BCAST_CACHE) > _BCAST_CAPACITY:
        _BCAST_CACHE.popitem(last=False)
    return val


# ------------------------------------------------- coarse hash partitioning
# THE shared partitioner: every coarse-partition stage in the repo (LSH
# pair generation in textops.dedup, grouped top-k, partitioned map-groups)
# routes through this one golden-ratio mixer so the partitioning behavior
# can never silently diverge between subsystems.
PART_TARGET_ROWS = 2_000_000  # ~50 MB of narrow rows per partition task
GOLDEN64 = 0x9E3779B97F4A7C15  # 64-bit golden-ratio multiplier (Fibonacci hashing)


def scale_parts(rows: int, floor: int = 64,
                target_rows: int = PART_TARGET_ROWS) -> int:
    """Partition count sized to the data: enough partitions that one
    map_groups task sees ~``target_rows`` rows (narrow rows → the default
    2M ≈ 50 MB; pass a smaller target for KB-wide rows)."""
    return max(floor, min(65536, rows // target_rows + 1))


def bucket_partition_col(key: "np.ndarray", n_parts: int) -> pa.Array:
    """uint64 key array → int32 partition-id column (golden-ratio mix)."""
    import numpy as np

    with np.errstate(over="ignore"):
        mixed = key * np.uint64(GOLDEN64)
        mixed ^= mixed >> np.uint64(29)
    return pa.array((mixed % np.uint64(n_parts)).astype(np.int32), pa.int32())


def _key_hash_col(col: "pa.ChunkedArray", n_parts: int) -> pa.Array:
    """Coarse partition id from an arbitrary-typed key column.  Nulls all
    hash to one partition (groupby semantics: nulls form ONE group), via
    fill_null(0) on the int path and ""-substitution on the string path."""
    import numpy as np

    from .hashing import hash_u64_many

    typ = col.type
    if pa.types.is_integer(typ) or pa.types.is_timestamp(typ):
        # fill nulls BEFORE to_numpy: a nullable int column otherwise
        # converts to float64-with-NaN, and NaN.astype(uint64) is UB;
        # temporal keys hash via their int64 representation (unsigned
        # ints stay unsigned — casting uint64 >= 2^63 to int64 raises)
        if not pa.types.is_unsigned_integer(typ):
            col = col.cast(pa.int64())
        k = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
        return bucket_partition_col(k, n_parts)
    if pa.types.is_floating(typ):
        # (common via pandas: an int column with nulls arrives as float64)
        # hash the bit pattern; normalize null/NaN -> 0.0 and -0.0 -> 0.0
        # so equal keys always land in one partition
        k = col.to_numpy(zero_copy_only=False).astype(np.float64)
        k = np.nan_to_num(k, nan=0.0, posinf=np.inf, neginf=-np.inf)
        k = np.where(k == 0.0, 0.0, k)
        return bucket_partition_col(k.view(np.uint64), n_parts)
    k = hash_u64_many([v if v is not None else "" for v in col.to_pylist()])
    return pa.array((k % np.uint64(n_parts)).astype(np.int32), pa.int32())


def normalize_blocks(mat_ds, target_rows_per_block: int = 50_000,
                     floor: int = 16):
    """Cap a MATERIALIZED dataset's block count.

    Ray 2.49's sort-based groupby/aggregate fans out one partition per
    INPUT BLOCK, and map_groups/aggregate stages emit one block per task —
    so chained shuffles snowball fragmentation: a 621k-row pair set came
    out of the verify join as 600 × ~1k-row blocks, making every
    downstream shuffle (CC rounds, the keep anti-join) run ~1,200 tiny
    tasks for 64 bucket keys (measured 273 s for one CC round that runs
    in ~13 s with sane blocks; the empty sort partitions are also what
    sprays the "new schema: ." warnings).  One cheap narrow-data
    repartition at a materialize point resets the fan-out for the whole
    downstream chain.  No-op when the input is not over-fragmented."""
    rows = mat_ds.count()
    blocks = mat_ds.num_blocks()
    want = max(floor, min(4096, rows // target_rows_per_block + 1))
    if blocks > want * 2:
        return mat_ds.repartition(want).materialize()
    return mat_ds


def list_col_matrix(col, dtype=np.float64) -> "np.ndarray":
    """(n, d) numpy matrix from a fixed-width Arrow ``list`` column via a
    flattened zero-copy reshape — measured 100× faster than
    ``np.stack(col.to_pylist())`` (3.55 s → 0.03 s per 200k dim-32 rows),
    which was the hidden per-row Python conversion in every
    embedding-family stage.  Falls back to the Python path for
    ragged/null rows (identical semantics)."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(ca) == 0:
        return np.zeros((0, 0), dtype)
    try:
        widths = np.diff(ca.offsets.to_numpy(zero_copy_only=False))
        if ca.null_count == 0 and (widths == widths[0]).all():
            if widths[0] == 0:
                # all-empty lists: np.stack's (n, 0) shape, not a reshape
                # error (reshape(-1, 0) rejects size-0 arrays)
                return np.zeros((len(ca), 0), dtype)
            flat = ca.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(-1, int(widths[0])).astype(dtype, copy=False)
    except AttributeError:
        pass
    return np.stack(ca.to_pylist()).astype(dtype, copy=False)


def parquet_rows(path: str) -> int:
    """Total row count under ``path`` (a parquet file or a directory tree)
    from footer metadata only — no data pages are read.  Cheap enough to
    size partition counts before building a pipeline."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = ([path] if os.path.isfile(path) else
             glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def parquet_null_count(path: str, col: str) -> int | None:
    """Total null count of ``col`` under ``path`` from parquet footer
    statistics only (no data pages).  Returns None when any row group
    lacks statistics for the column — callers fall back to a scan."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = ([path] if os.path.isfile(path) else
             glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        try:
            ci = md.schema.names.index(col)
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or st.null_count is None:
                return None
            total += st.null_count
    return total


# ---------------------------------------------------------- grouped top-k
# one map_groups UDF call PER DISTINCT KEY does not scale (a dedupe-latest
# over 10^10 urls = 10^10 Python calls).  grouped_topk instead hashes the
# key into coarse partitions and runs ONE vectorized pass per partition:
# an Arrow C++ sort on (key, *sort_keys), run-length key boundaries in
# numpy, and a single take of the first k rows of every run.


def _local_topk(g: pa.Table, key: str, sort_keys, k: int) -> pa.Table:
    """First k rows per key-run of ``g`` sorted by (key, *sort_keys) —
    one Arrow C++ sort + numpy run-length boundary pass, no per-key loop.
    Null keys (and float-NaN keys) form ONE run (groupby semantics).

    Exactness notes: a nullable int64 key must NOT be compared in its
    to_numpy float64 form — distinct keys above 2^53 collapse to the
    same float and would silently merge groups — so the int path compares
    exact fill_null values with a separate null mask; the float path
    treats NaN (whether from nulls or genuine NaN values) as one run."""
    import numpy as np

    idx = pc.sort_indices(g, sort_keys=[(key, "ascending"), *sort_keys])
    s = g.take(idx)
    key_arr = s[key]
    typ = key_arr.type
    miss = None  # rows whose key is "missing" (null / NaN) — one group
    if pa.types.is_integer(typ) or pa.types.is_timestamp(typ):
        # exact int compare (float64 round-trip is lossy above 2^53);
        # temporal keys ride the same path via their int64 representation
        filled = pc.fill_null(key_arr.cast(
            pa.uint64() if pa.types.is_unsigned_integer(typ) else pa.int64()), 0)
        keys_np = filled.to_numpy(zero_copy_only=False)
        if key_arr.null_count:
            miss = pc.is_null(key_arr).to_numpy(zero_copy_only=False)
    else:
        keys_np = key_arr.to_numpy(zero_copy_only=False)
        if keys_np.dtype.kind == "f":
            # covers Arrow nulls (→ NaN) AND genuine NaN values
            miss = np.isnan(keys_np)
        elif key_arr.null_count:
            miss = pc.is_null(key_arr).to_numpy(zero_copy_only=False)
            if keys_np.dtype == object:
                # stable compare for None-holding object arrays
                keys_np = np.where(miss, "", keys_np)
            # non-object numpy dtypes (datetime64/NaT residue): compare
            # directly — the miss corrections below unify missing rows
    if keys_np.size == 0:
        return s
    neq = keys_np[1:] != keys_np[:-1]
    if miss is not None and miss.any():
        # adjacent missing: same run; missing vs present: always a boundary
        neq = (neq & ~(miss[1:] & miss[:-1])) | (miss[1:] ^ miss[:-1])
    new_run = np.r_[True, neq]
    starts = np.flatnonzero(new_run)
    run_id = np.cumsum(new_run) - 1
    rank = np.arange(keys_np.size) - starts[run_id]
    return s.take(pa.array(np.flatnonzero(rank < k), pa.int64()))


def _resolve_parts(n_parts, approx_rows, target_rows_per_part) -> int:
    if n_parts is not None:
        return n_parts
    if approx_rows is not None:
        return scale_parts(approx_rows, floor=256,
                           target_rows=target_rows_per_part)
    return 256


def grouped_topk(ds, key: str, sort_keys: list[tuple[str, str]], k: int = 1,
                 n_parts: int | None = None, approx_rows: int | None = None,
                 target_rows_per_part: int = PART_TARGET_ROWS):
    """Top-k rows per ``key`` ordered by ``sort_keys`` (Arrow sort-key
    tuples, e.g. ``[("ts", "descending"), ("event_id", "descending")]``).

    Equivalent to ``groupby(key).map_groups(take first k of the sorted
    group)`` but scale-shaped twice over: (1) top-k is algebraic, so a
    per-batch PARTIAL top-k runs before the shuffle (combiner pattern —
    shuffle volume drops from all rows to <= k rows per key per input
    block); (2) the final pass is one vectorized task per coarse hash
    partition instead of one Python call per distinct key.  Ties beyond
    ``sort_keys`` resolve arrival-dependently (same as the per-group
    formulation — give total sort keys for determinism).

    Partition sizing: pass ``approx_rows`` (e.g. ``parquet_rows(path)``)
    so the partition count scales with the input instead of the fixed
    256 floor; pass a smaller ``target_rows_per_part`` for KB-wide rows
    (full article rows want ~32k rows/task, not the 2M narrow-row
    default)."""
    n_parts = _resolve_parts(n_parts, approx_rows, target_rows_per_part)
    part_col = "__gtk_part"

    def combine(t: pa.Table) -> pa.Table:
        # strip pandas schema metadata BEFORE the shuffle: an unhashable
        # schema disables Ray's reduce-side schema dedup on exactly this
        # hot path (one "Failed to hash the schemas" log line per task)
        t = t.replace_schema_metadata(None)
        t = t.append_column(part_col, _key_hash_col(t[key], n_parts))
        return _local_topk(t, key, sort_keys, k)

    def topk_partition(g: pa.Table) -> pa.Table:
        g = g.replace_schema_metadata(None)
        return _local_topk(g.drop_columns([part_col]), key, sort_keys, k)

    exploded = ds.map_batches(combine, batch_format="pyarrow")
    return exploded.groupby(part_col).map_groups(topk_partition,
                                                 batch_format="pyarrow")


# ------------------------------------- exact bucketed membership join
# The at-scale replacement for a broadcast key-set semi/anti join when
# the key side no longer fits a broadcast: tagged-union shape (the
# relational.lineitem_order_join pattern) — both sides bucket by key
# hash, one groupby, an is_in filter inside each bucket task.  Per-task
# memory = one bucket; nothing materializes on the driver.  Exact (no
# bloom FP semantics to reason about) — a bloom would wrongly DROP rows
# in the anti case and wrongly KEEP rows in the semi case.

_JN_RESERVED = ("__jn_bucket", "__jn_tag", "__jn_jk", "__jn_val")


def _tag_side(t: pa.Table, src_col: str, tag_val: int, carry: list,
              n_buckets: int, value_col: str | None = None,
              value_type=None) -> pa.Table:
    """One side of the tagged union: bucket id from the (null-filled)
    integer join key, int8 tag, the key itself, null-padded carry
    columns, and — for lookup joins — the value column.  Null keys all
    bucket together (fill_null(0)) so their handling is deterministic.
    uint64 keys keep their unsigned representation (casting >= 2^63 to
    int64 raises); mixing signedness ACROSS the two sides fails loudly
    at the union (schema mismatch), never silently."""
    import numpy as np

    typ = t[src_col].type
    jk = (t[src_col] if pa.types.is_unsigned_integer(typ) and typ.bit_width == 64
          else t[src_col].cast(pa.int64()))
    cols = {
        "__jn_bucket": bucket_partition_col(
            pc.fill_null(jk, 0).to_numpy(zero_copy_only=False)
              .astype(np.uint64), n_buckets),
        "__jn_tag": pa.array(np.full(t.num_rows, tag_val, np.int8), pa.int8()),
        "__jn_jk": jk,
    }
    for c, typ in carry:
        cols[c] = t[c] if tag_val == 0 else pa.nulls(t.num_rows, typ)
    if value_type is not None:
        cols["__jn_val"] = (pa.nulls(t.num_rows, value_type)
                            if value_col is None else t[value_col])
    return pa.table(cols)


def _check_carry(carry: list) -> None:
    clash = [c for c, _ in carry if c in _JN_RESERVED]
    if clash:
        raise ValueError(
            f"input schema uses reserved join column names {clash}; rename "
            "them before a bucketed join")


def bucketed_membership_join(data, keys_ds, data_key: str, keys_col: str,
                             keep_members: bool,
                             rows_per_bucket: int = 100_000,
                             carry: list | None = None,
                             approx_rows: int | None = None,
                             n_buckets: int | None = None):
    """Keep (``keep_members=True``, semi join) or drop (False, anti join)
    the rows of ``data`` whose integer ``data_key`` appears in column
    ``keys_col`` of ``keys_ds``.  Full input schema carried through; row
    multiplicity preserved (no dedup of data rows).  A null ``data_key``
    never matches (dropped by the semi join, kept by the anti join) —
    deterministic, unlike hashing NaN.

    Pass ``carry`` ((column, type) pairs of the data schema) and
    ``approx_rows`` to keep the data side LAZY — without them the data
    pipeline is materialized just to infer its schema and row count,
    which defeats the at-scale purpose for parquet-born inputs whose
    schema the caller already knows.  ``n_buckets`` overrides the
    row-count-derived bucket count (tests / callers with better
    knowledge)."""
    if carry is None or (approx_rows is None and n_buckets is None):
        # normalize blocks to Arrow (zero-copy for parquet-born datasets;
        # pandas-backed blocks report a non-Arrow base_schema)
        data = data.map_batches(lambda t: t, batch_format="pyarrow").materialize()
        if carry is None:
            carry = [(f.name, f.type) for f in data.schema().base_schema]
        if approx_rows is None:
            approx_rows = data.count()
    _check_carry(carry)
    if n_buckets is None:
        n_buckets = scale_parts(approx_rows, floor=64,
                                target_rows=rows_per_bucket)

    # per-block distinct of the keys side before anything crosses the
    # shuffle: only distinct key values matter to is_in, and the keys
    # side is often a fact table (many rows per key)
    keys_ds = keys_ds.map_batches(
        lambda t: pa.table({keys_col: pc.unique(t[keys_col])}),
        batch_format="pyarrow")
    both = data.map_batches(
        lambda t: _tag_side(t, data_key, 0, carry, n_buckets),
        batch_format="pyarrow").union(keys_ds.map_batches(
        lambda t: _tag_side(t, keys_col, 1, carry, n_buckets),
        batch_format="pyarrow"))

    def filter_bucket(g: pa.Table) -> pa.Table:
        tags = g["__jn_tag"].to_numpy(zero_copy_only=False)
        keys = g.filter(pa.array(tags == 1))["__jn_jk"].combine_chunks()
        keys = keys.drop_null()  # null keys on the keys side match nothing
        d = g.filter(pa.array(tags == 0))
        if len(keys):
            # fill_null(False): a null data key is a NON-member always
            mask = pc.fill_null(pc.is_in(d["__jn_jk"], value_set=keys), False)
            d = d.filter(mask if keep_members else pc.invert(mask))
        elif keep_members:
            d = d.slice(0, 0)
        return d.select([c for c, _ in carry])

    return both.groupby("__jn_bucket").map_groups(filter_bucket,
                                                  batch_format="pyarrow")


def bucketed_lookup_join(data, lookup_ds, data_key: str, lookup_key: str,
                         value_col: str, out_col: str, value_type,
                         carry: list, n_buckets: int):
    """Same tagged-union bucketed shape as
    :func:`bucketed_membership_join`, but a LOOKUP join: append column
    ``out_col`` (= ``value_col`` of the ``lookup_ds`` row whose
    ``lookup_key`` equals the data row's integer ``data_key``; null when
    absent or when the key is null) to every data row.  ``carry``
    declares the data-side (column, type) pairs to keep — declared
    rather than inferred so a lazy data pipeline is not forced just to
    read its schema."""
    _check_carry(carry)

    both = data.map_batches(
        lambda t: _tag_side(t, data_key, 0, carry, n_buckets,
                            value_col=None, value_type=value_type),
        batch_format="pyarrow").union(lookup_ds.map_batches(
        lambda t: _tag_side(t, lookup_key, 1, carry, n_buckets,
                            value_col=value_col, value_type=value_type),
        batch_format="pyarrow"))

    def join_bucket(g: pa.Table) -> pa.Table:
        import numpy as np

        tags = g["__jn_tag"].to_numpy(zero_copy_only=False)
        l_rows = g.filter(pa.array(tags == 1))
        # a null LOOKUP key provides nothing (a null data key joins to
        # null, never to a null key row)
        l_rows = l_rows.filter(pc.is_valid(l_rows["__jn_jk"]))
        d = g.filter(pa.array(tags == 0))
        cols = {c: d[c] for c, _ in carry}
        vals = l_rows["__jn_val"].combine_chunks()
        pk = l_rows["__jn_jk"].to_numpy(zero_copy_only=False)
        if pk.size == 0:
            cols[out_col] = pa.nulls(d.num_rows, value_type)
            return pa.table(cols)
        # vectorized hash lookup: sort provider keys once, searchsorted the
        # data keys (no per-row Python; values taken straight from the Arrow
        # array, so list values never round-trip through Python objects).
        # side="right"-1 lands on the LAST occurrence of a duplicated lookup
        # key under the stable sort — the dict-build semantics this replaced.
        order = np.argsort(pk, kind="stable")
        pk_sorted = pk[order]
        dk_col = d["__jn_jk"]
        dk = pc.fill_null(dk_col, 0).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk_sorted, dk, side="right") - 1
        pos_c = np.maximum(pos, 0)
        hit = (pos >= 0) & (pk_sorted[pos_c] == dk)
        if dk_col.null_count:
            hit &= pc.is_valid(dk_col).to_numpy(zero_copy_only=False)
        # misses point at an appended null slot — one Arrow take, no branch
        vals_ext = pa.concat_arrays([vals, pa.nulls(1, value_type)])
        take_idx = np.where(hit, order[pos_c], len(vals))
        cols[out_col] = vals_ext.take(pa.array(take_idx, pa.int64()))
        return pa.table(cols)

    return both.groupby("__jn_bucket").map_groups(join_bucket,
                                                  batch_format="pyarrow")


def bucketed_dim_join(data, dim_ds, data_key: str, dim_key: str,
                      value_fields: list, carry: list, n_buckets: int):
    """Tagged-union bucketed lookup join on an ARBITRARY-typed key
    (string keys like ips/usernames match EXACTLY inside each bucket —
    no integer-hash collision on the value path).  Appends every
    ``(name, type)`` in ``value_fields`` from the ``dim_ds`` row whose
    ``dim_key`` equals the data row's ``data_key`` (null when absent, or
    when the data key is null).  Duplicate dim keys: last occurrence
    wins (the dict-build semantics of the broadcast plan this replaces).
    ``carry`` declares the data-side (column, type) pairs to keep —
    declared, not inferred, so the data pipeline stays lazy.

    This is the at-scale alternative to a ``ray.put`` broadcast dim
    (pipelines/export._AsnLookup): per-task memory = one bucket of each
    side instead of the whole dim on every worker and the driver."""
    import numpy as np

    _check_carry(list(carry) + list(value_fields))

    def tag(t: pa.Table, *, src: str, tagv: int) -> pa.Table:
        cols = {
            "__jn_bucket": _key_hash_col(t[src], n_buckets),
            "__jn_tag": pa.array(np.full(t.num_rows, tagv, np.int8), pa.int8()),
            "__jn_jk": t[src],
        }
        for c, typ in carry:
            cols[c] = t[c] if tagv == 0 else pa.nulls(t.num_rows, typ)
        for c, typ in value_fields:
            cols[c] = (t[c].cast(typ) if tagv == 1
                       else pa.nulls(t.num_rows, typ))
        return pa.table(cols)

    both = data.map_batches(lambda t: tag(t, src=data_key, tagv=0),
                            batch_format="pyarrow") \
        .union(dim_ds.map_batches(lambda t: tag(t, src=dim_key, tagv=1),
                                  batch_format="pyarrow"))

    def join_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        tags = g["__jn_tag"].to_numpy(zero_copy_only=False)
        dimr = g.filter(pa.array(tags == 1))
        dimr = dimr.filter(pc.is_valid(dimr["__jn_jk"]))
        d = g.filter(pa.array(tags == 0))
        cols = {c: d[c] for c, _ in carry}
        n_dim = dimr.num_rows
        if n_dim == 0:
            for c, typ in value_fields:
                cols[c] = pa.nulls(d.num_rows, typ)
            return pa.table(cols)
        # exact match via a pandas Index (the broadcast plan's machinery,
        # scoped to one bucket); duplicated dim keys keep the LAST row
        ser = pd.Series(np.arange(n_dim),
                        index=pd.Index(dimr["__jn_jk"].to_pylist()))
        ser = ser[~ser.index.duplicated(keep="last")]
        pos = ser.index.get_indexer(d["__jn_jk"].to_pylist())
        dim_pos = ser.to_numpy()
        take = pa.array(np.where(pos >= 0, dim_pos[np.maximum(pos, 0)],
                                 n_dim), pa.int64())
        for c, typ in value_fields:
            vals_ext = pa.concat_arrays(
                [dimr[c].combine_chunks().cast(typ), pa.nulls(1, typ)])
            cols[c] = vals_ext.take(take)
        return pa.table(cols)

    return both.groupby("__jn_bucket").map_groups(join_bucket,
                                                  batch_format="pyarrow")


# ------------------------------------------------- payload-light top-k
# grouped_topk shuffles FULL rows to their key partition; over a store of
# KB-wide rows (article payloads) that is versions/keep times the output
# size through the object store.  parquet_grouped_topk instead:
#   1. selects winners over a COLUMN-PRUNED read (key + sort columns,
#      ~tens of bytes/row) — the only all-to-all handles narrow rows;
#   2. puts winner-tuple fingerprints in a bloom filter (vector adds of
#      per-batch uint64 arrays; snapshot broadcast once via ray.put);
#   3. filters the full-payload read LOCALLY per batch by membership —
#      no shuffle; survivors ~= winners + rare false positives;
#   4. runs the exact top-k over the (output-sized) survivors.
# Exact by construction: blooms have no false negatives, so every true
# winner reaches step 4, which applies the same total order as the
# one-pass plan.  On a multi-node cluster step 2's driver-side build
# becomes a per-partition bloom OR-merge (bitwise union); at sandbox
# scale the driver adds ~1e6 fingerprints/s, not the bottleneck.


def _col_as_u64(c: "pa.ChunkedArray") -> "np.ndarray":
    """Any column → uint64 array for fingerprint mixing.  Deterministic
    per value (the only requirement: the winner pass and the full pass
    must fingerprint equal values equally); nulls/NaN map to a stable
    sentinel."""
    import numpy as np

    from .hashing import hash_u64_many

    t = c.type
    if pa.types.is_unsigned_integer(t):
        return (pc.fill_null(c, 0).cast(pa.uint64())
                  .to_numpy(zero_copy_only=False).astype(np.uint64))
    if pa.types.is_integer(t) or pa.types.is_timestamp(t):
        return (pc.fill_null(c.cast(pa.int64()), -1)
                  .to_numpy(zero_copy_only=False).astype(np.uint64))
    if pa.types.is_floating(t):
        k = c.to_numpy(zero_copy_only=False).astype(np.float64)
        k = np.nan_to_num(k, nan=0.0, posinf=np.inf, neginf=-np.inf)
        k = np.where(k == 0.0, 0.0, k)  # normalize -0.0
        return k.view(np.uint64)
    return hash_u64_many([v if v is not None else "" for v in c.to_pylist()])


def winner_fingerprints(batch: pa.Table, key: str,
                        sort_cols: list[str]) -> "np.ndarray":
    """uint64 fingerprint of each row's (key, *sort_cols) winner tuple."""
    import numpy as np

    h = _col_as_u64(batch[key])
    with np.errstate(over="ignore"):
        g = np.uint64(GOLDEN64)
        for c in sort_cols:
            h = (h ^ _col_as_u64(batch[c])) * g
            h ^= h >> np.uint64(29)
    return h


def _bloom_member_batch(batch: pa.Table, *, bloom_ref, key: str,
                        sort_cols: list[str]) -> pa.Table:
    """Keep rows whose winner-tuple fingerprint is in the broadcast bloom."""
    from ..state.bloom import BloomFilter

    bloom = bcast_get(bloom_ref, transform=BloomFilter.restore)
    return batch.filter(
        pa.array(bloom.contains_many(winner_fingerprints(batch, key, sort_cols))))


def parquet_grouped_topk(path: str, key: str,
                         sort_keys: list[tuple[str, str]], k: int = 1,
                         drop_where_not_null: str | None = None,
                         payload_light: bool | None = None,
                         probe_min_rows: int = 500_000,
                         min_multiplicity: float = 6.0,
                         target_rows_per_part: int = 32_768):
    """Top-k rows per ``key`` over a parquet store, payload-light at scale
    (see the block comment above).  ``drop_where_not_null`` names a column
    (e.g. a crawl ``error`` column) whose non-null rows are excluded
    before selection.  Both plans produce identical rows (ties beyond
    ``sort_keys`` arrival-dependent in both).

    ``payload_light=None`` decides ADAPTIVELY: above ``probe_min_rows``
    store rows, the narrow winner pass runs first (it is the cheap,
    column-pruned half of either plan) and payload-light proceeds only
    when the measured version multiplicity rows/winners ≥
    ``min_multiplicity`` — below that the probe is discarded (one wasted
    narrow read) and the one-pass plan runs.  Measured single-node
    crossover behind the default (BASELINE.md, 8 cpus, 1 KB payloads):
    multiplicity 3 → one-pass wins 1.4× (29.8 s vs 41.2 s); multiplicity
    12 → payload-light wins 1.5× (22.5 s vs 34.0 s).  On a multi-node
    cluster the payload shuffle crosses the NETWORK while the bloom
    prefilter stays block-local, so the crossover drops — set
    ``payload_light=True`` or lower ``min_multiplicity`` there."""
    import ray
    import ray.data as rd

    rows = parquet_rows(path)
    flt = drop_where_not_null

    def read(columns: list[str] | None = None) -> "rd.Dataset":
        ds = rd.read_parquet(path, columns=columns)
        if flt:
            drop = [flt] if columns is not None else []
            ds = ds.map_batches(
                lambda t: t.filter(pc.is_null(t[flt])).drop_columns(drop),
                batch_format="pyarrow")
        return ds

    def one_pass():
        return grouped_topk(read(), key, sort_keys, k, approx_rows=rows,
                            target_rows_per_part=target_rows_per_part)

    if payload_light is False or (payload_light is None and rows < probe_min_rows):
        return one_pass()

    sort_cols = [c for c, _ in sort_keys]
    narrow_cols = [key, *sort_cols] + ([flt] if flt else [])
    eligible = rows
    if flt and payload_light is None:
        # the multiplicity probe must compare ELIGIBLE rows (error rows
        # excluded) to winners, or an error-heavy store overstates
        # multiplicity.  eligible == null_count(flt), read from parquet
        # footer statistics alone; a streaming count is the fallback when
        # stats are absent (never a materialization pinning the whole
        # projection)
        eligible = parquet_null_count(path, flt)
        if eligible is None:
            eligible = read(narrow_cols).count()
    # narrow winner pass: the only all-to-all, over ~tens of bytes/row
    winners = grouped_topk(read(narrow_cols), key, sort_keys, k,
                           approx_rows=rows).materialize()
    n_winners = winners.count()
    if payload_light is None and eligible < min_multiplicity * max(n_winners, 1):
        return one_pass()  # low multiplicity: local payload shuffle is cheaper

    from ..state.bloom import BloomFilter

    fp_ds = winners.map_batches(
        lambda t: pa.table({"fp": pa.array(winner_fingerprints(t, key, sort_cols),
                                           pa.uint64())}),
        batch_format="pyarrow")
    bloom = BloomFilter(capacity=max(n_winners, 1024), bits_per_key=12)
    for b in fp_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        bloom.add_many(b["fp"].to_numpy(zero_copy_only=False))
    bloom_ref = ray.put(bloom.snapshot())

    survivors = read().map_batches(
        _bloom_member_batch,
        fn_kwargs={"bloom_ref": bloom_ref, "key": key, "sort_cols": sort_cols},
        batch_format="pyarrow")
    return grouped_topk(survivors, key, sort_keys, k, approx_rows=n_winners,
                        target_rows_per_part=target_rows_per_part)


def partitioned_map_groups(ds, key: str, fn, n_parts: int | None = None,
                           approx_rows: int | None = None,
                           target_rows_per_part: int = PART_TARGET_ROWS):
    """``groupby(key).map_groups(fn)`` replacement for vectorizable group
    UDFs: ``fn`` receives a COARSE hash partition containing MANY whole
    key-groups (every row of a key lands in exactly one partition) and
    must compute per-key results vectorized (numpy segment ops / pandas
    groupby).  One Python call per partition instead of one per distinct
    key — the difference between 256 tasks and 10^8 UDF calls at scale.
    Partition sizing as in :func:`grouped_topk` (``approx_rows`` scales
    the count; here every input row reaches its partition, so size to the
    FULL dataset)."""
    n_parts = _resolve_parts(n_parts, approx_rows, target_rows_per_part)
    part_col = "__pmg_part"

    def add_part(t: pa.Table) -> pa.Table:
        # metadata strip: see grouped_topk.combine (keeps the shuffle's
        # reduce-side schema dedup working over pandas-born blocks)
        t = t.replace_schema_metadata(None)
        return t.append_column(part_col, _key_hash_col(t[key], n_parts))

    def run(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns([part_col]))

    return ds.map_batches(add_part, batch_format="pyarrow").groupby(
        part_col).map_groups(run, batch_format="pyarrow")
