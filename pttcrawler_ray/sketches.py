"""Mergeable sketches over integer key columns: HyperLogLog distinct
count and Count-Min frequency.

The 100-TB shape for "how many distinct users / how often does each key
appear" questions where the exact answer would be a corpus-wide shuffle
(``unique`` / ``groupby``): every batch reduces to a tiny dense partial
(4096 register maxima / a d x w counter grid), partials merge with MAX /
SUM — associative and order-free, so Ray's streaming aggregate is exact
over any partitioning — and the driver sees at most ``m`` (HLL) or
``d*w`` (CMS) rows no matter the input size.

Determinism spec (what the pure-SQL DuckDB twins replay):

- the row hash is ``splitmix64(key + salt)`` — the same integer mixer
  (and the same exact INT128 SQL expression,
  :func:`..textops.sampling.splitmix64_sql`) the split/shuffle
  operators already pin;
- HLL (Flajolet et al. 2007): register = top ``p`` hash bits,
  ``rho`` = position of the leftmost 1-bit in the remaining ``64 - p``
  bits (``64 - p + 1`` when they are all zero); the sketch IS the
  ``(register, max rho)`` table, pure integers, so the engine/SQL
  comparison is exact — the float estimate
  (:func:`hll_estimate`) is a driver-side readout of that table;
- CMS (Cormode & Muthukrishnan 2005): row ``i`` of ``d`` uses
  ``splitmix64(key + salt + i * 0x9E3779B9) % width``; the sketch is
  the ``(depth, col, count)`` table; :func:`cms_estimate` reads
  ``min`` over depths.

Bit-length of the suffix word is computed with a 6-step binary
reduction (exact integer ops — no float ``log2``, whose rounding at
powers of two could differ from SQL's string ``bin()`` length).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .textops.sampling import splitmix64, splitmix64_sql

_GOLD32 = 0x9E3779B9  # per-depth salt stride (golden-ratio odd constant)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length over uint64 (0 -> 0)."""
    bl = np.zeros(w.shape, np.int64)
    v = w.astype(np.uint64, copy=True)
    for s in (32, 16, 8, 4, 2, 1):
        m = (v >> np.uint64(s)) > 0
        bl[m] += s
        v[m] >>= np.uint64(s)
    return bl + (v == 1)


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------
def _hll_batch(batch: pa.Table, *, key: str, p: int, salt: int) -> pa.Table:
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids + np.uint64(salt))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rho = np.where(w == 0, 64 - p + 1, 64 - p - _bit_length_u64(w) + 1)
    # dense per-batch partial: max rho per touched register
    dense = np.zeros(1 << p, np.int64)
    np.maximum.at(dense, reg, rho)
    nz = np.flatnonzero(dense)
    return pa.table({"register": pa.array(nz, pa.int64()),
                     "rho": pa.array(dense[nz], pa.int64())})


def hll_registers(ds, key: str, p: int = 12, salt: int = 0):
    """The HLL sketch as a Dataset of ``(register, rho)`` rows — one row
    per register observed at least once (empty registers are implicit
    zeros).  Partials are per-batch dense maxima; the merge is ONE
    bounded single-key ``groupby.max`` (<= 2^p groups)."""
    agg = ds.map_batches(
        _hll_batch, fn_kwargs={"key": key, "p": p, "salt": salt},
        batch_size=8192, batch_format="pyarrow").groupby("register").max("rho")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"register": t["register"].cast(pa.int64()),
                         "rho": t["max(rho)"].cast(pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")


def hll_estimate(registers: np.ndarray, rhos: np.ndarray, p: int = 12) -> float:
    """Bias-corrected HLL cardinality readout of a ``(register, rho)``
    table (empty registers implicit).  Driver-side float — the exactness
    contract lives on the integer register table, not here."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m))
    dense = np.zeros(m, np.int64)
    dense[np.asarray(registers, np.int64)] = np.asarray(rhos, np.int64)
    est = alpha * m * m / float(np.sum(np.exp2(-dense.astype(np.float64))))
    zeros = int(np.sum(dense == 0))
    if est <= 2.5 * m and zeros:            # small-range correction
        return m * math.log(m / zeros)
    return est


def hll_sql(table: str, key_expr: str, p: int = 12, salt: int = 0) -> str:
    """DuckDB twin of :func:`hll_registers` — identical splitmix64 hash
    (INT128 expression), identical register/rho split; bit_length of the
    suffix via ``length(bin(w))`` (exact string form, no float log)."""
    q = 64 - p
    mask = (1 << q) - 1
    hv = splitmix64_sql(f"({key_expr})::HUGEINT + {salt}")
    return f"""
WITH h AS (SELECT {hv} AS hv FROM {table})
SELECT CAST(hv >> {q} AS BIGINT) AS register,
       CAST(MAX(CASE WHEN (hv % {mask + 1}) = 0 THEN {q + 1}
                     ELSE {q} - length(bin((hv % {mask + 1})::UBIGINT)) + 1
                END) AS BIGINT) AS rho
FROM h GROUP BY 1
"""


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------
def _cms_batch(batch: pa.Table, *, key: str, depth: int, width: int,
               salt: int) -> pa.Table:
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
    packed = np.zeros(depth * width, np.int64)
    for d in range(depth):
        h = splitmix64(ids + np.uint64(salt + d * _GOLD32))
        col = (h % np.uint64(width)).astype(np.int64)
        packed[d * width:(d + 1) * width] += np.bincount(col, minlength=width)
    nz = np.flatnonzero(packed)
    return pa.table({"cell": pa.array(nz, pa.int64()),
                     "cnt": pa.array(packed[nz], pa.int64())})


def cms_counts(ds, key: str, depth: int = 4, width: int = 1024,
               salt: int = 0):
    """The Count-Min sketch as a Dataset of ``(depth, col, cnt)`` rows —
    one row per touched counter.  Per-batch dense ``d x w`` bincount
    partials, ONE bounded single-key ``groupby.sum`` (<= d*w groups)."""
    agg = ds.map_batches(
        _cms_batch,
        fn_kwargs={"key": key, "depth": depth, "width": width, "salt": salt},
        batch_size=8192, batch_format="pyarrow").groupby("cell").sum("cnt")

    def unpack(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False)
        return pa.table({"depth": pa.array(cell // width, pa.int64()),
                         "col": pa.array(cell % width, pa.int64()),
                         "cnt": t["sum(cnt)"].cast(pa.int64())})

    return agg.map_batches(unpack, batch_format="pyarrow")


def cms_estimate(depths: np.ndarray, cols: np.ndarray, cnts: np.ndarray,
                 keys: np.ndarray, depth: int = 4, width: int = 1024,
                 salt: int = 0) -> np.ndarray:
    """Point frequency estimates (min over depths) for ``keys`` from a
    ``(depth, col, cnt)`` table.  Always >= the true count."""
    dense = np.zeros((depth, width), np.int64)
    dense[np.asarray(depths, np.int64), np.asarray(cols, np.int64)] = \
        np.asarray(cnts, np.int64)
    keys = np.asarray(keys, np.uint64)
    est = np.full(len(keys), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        h = splitmix64(keys + np.uint64(salt + d * _GOLD32))
        est = np.minimum(est, dense[d, (h % np.uint64(width)).astype(np.int64)])
    return est


def cms_sql(table: str, key_expr: str, depth: int = 4, width: int = 1024,
            salt: int = 0) -> str:
    """DuckDB twin of :func:`cms_counts` — one UNION ALL branch per
    depth, each hashing with the identical per-depth salt."""
    branches = []
    for d in range(depth):
        hv = splitmix64_sql(f"({key_expr})::HUGEINT + {salt + d * _GOLD32}")
        branches.append(
            f"SELECT {d} AS depth, CAST(({hv}) % {width} AS BIGINT) AS col "
            f"FROM {table}")
    u = " UNION ALL ".join(branches)
    return f"""
SELECT depth, col, CAST(count(*) AS BIGINT) AS cnt
FROM ({u}) GROUP BY depth, col
"""


# --------------------------------------------------------------------------
# grouped HyperLogLog (distinct count per group)
# --------------------------------------------------------------------------
def _hll_group_batch(batch: pa.Table, *, key: str, group_col: str, p: int,
                     salt: int) -> pa.Table:
    import pandas as pd

    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids + np.uint64(salt))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rho = np.where(w == 0, 64 - p + 1, 64 - p - _bit_length_u64(w) + 1)
    codes, uniques = pd.factorize(
        batch[group_col].to_numpy(zero_copy_only=False))
    uniq = list(uniques)
    if (codes < 0).any():        # repo convention: null keys = one group
        codes = np.where(codes < 0, len(uniq), codes)
        uniq.append(None)
    m = 1 << p
    dense = np.zeros(len(uniq) * m, np.int64)
    np.maximum.at(dense, codes * m + reg, rho)
    nz = np.flatnonzero(dense)
    from .util.hashing import hash_u64_many

    gidx = nz // m
    gh = hash_u64_many([u if u is not None else "" for u in uniq])
    return pa.table({
        group_col: pa.array(np.asarray(uniq, object)[gidx].tolist(),
                            pa.string()),
        "register": pa.array(nz % m, pa.int64()),
        "rho": pa.array(dense[nz], pa.int64()),
        # mixed single-int shuffle key: group hash's top bits + register
        # (the repo-standard alternative to a native two-key groupby)
        "bkey": pa.array(((gh[gidx] >> np.uint64(p))
                          << np.uint64(p)) | (nz % m).astype(np.uint64),
                         pa.uint64()),
    })


def _hll_group_merge(g: pa.Table) -> pa.Table:
    """Max rho per REAL (group, register) pair — bkey is only the
    shuffle key (same pair always co-partitions); the dedup itself uses
    the group value, so a top-bits group-hash collision cannot merge two
    groups' registers."""
    import pandas as pd

    gcol = g.column_names[0]
    codes, _uniq = pd.factorize(g[gcol].to_numpy(zero_copy_only=False))
    reg = g["register"].to_numpy(zero_copy_only=False)
    rho = g["rho"].to_numpy(zero_copy_only=False)
    order = np.lexsort((-rho, reg, codes))
    c_s, r_s = codes[order], reg[order]
    first = np.r_[True, (c_s[1:] != c_s[:-1]) | (r_s[1:] != r_s[:-1])]
    take = order[first]
    return pa.table({
        gcol: g[gcol].take(pa.array(take)),
        "register": g["register"].take(pa.array(take)),
        "rho": pa.array(rho[take], pa.int64()),
    })


def hll_registers_by_group(ds, key: str, group_col: str, p: int = 12,
                           salt: int = 0, n_parts: int = 8):
    """Per-group HLL sketch: ``(group_col, register, rho)`` rows.  The
    per-batch partial collapses to <= groups x 2^p narrow rows, so the
    ONE coarse shuffle (mixed uint64 key = group-hash top bits +
    register — never a native two-key groupby) carries only partials;
    the merge is a vectorized first-of-run max per partition."""
    from .util.rayops import partitioned_map_groups

    parts = ds.map_batches(
        _hll_group_batch,
        fn_kwargs={"key": key, "group_col": group_col, "p": p, "salt": salt},
        batch_size=8192, batch_format="pyarrow")
    return partitioned_map_groups(parts, "bkey", _hll_group_merge,
                                  n_parts=n_parts)


def hll_group_sql(table: str, key_expr: str, group_col: str, p: int = 12,
                  salt: int = 0) -> str:
    """DuckDB twin of :func:`hll_registers_by_group`."""
    q = 64 - p
    mask = (1 << q) - 1
    hv = splitmix64_sql(f"({key_expr})::HUGEINT + {salt}")
    return f"""
WITH h AS (SELECT {group_col}, {hv} AS hv FROM {table})
SELECT {group_col},
       CAST(hv >> {q} AS BIGINT) AS register,
       CAST(MAX(CASE WHEN (hv % {mask + 1}) = 0 THEN {q + 1}
                     ELSE {q} - length(bin((hv % {mask + 1})::UBIGINT)) + 1
                END) AS BIGINT) AS rho
FROM h GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Log-linear quantile histogram (HdrHistogram-style single-pass quantiles)
# --------------------------------------------------------------------------
# The single-pass, order-invariant complement to stats.exact_quantiles
# (which needs log(range) passes): every non-negative int64 value maps to
# one of <= (65 - sub_bits) * 2**sub_bits buckets — exact below
# 2**sub_bits, then 2**sub_bits sub-buckets per power of two, i.e. a
# guaranteed relative value error <= 2**-sub_bits per readout.  The
# sketch IS the integer (bucket, cnt) table: counts are sums, so any
# partitioning / merge order yields the identical table, and the DuckDB
# twin (same integer bucket expression via string bin(), never float
# log2) is exact at any scale.  Readouts (quantile estimates) are
# driver-side like hll_estimate.
def qsketch_bucket(v: np.ndarray, sub_bits: int = 7) -> np.ndarray:
    """Vectorized log-linear bucket index over non-negative int64.

    ``m = max(bit_length(v) - 1, sub_bits)``;
    ``bucket = (m - sub_bits) * 2**sub_bits + (v >> (m - sub_bits))`` —
    identity for ``v < 2**(sub_bits + 1)``, then top ``sub_bits + 1``
    significant bits, contiguous across powers of two."""
    v = np.maximum(np.asarray(v, np.int64), 0)
    m = np.maximum(_bit_length_u64(v.astype(np.uint64)) - 1, sub_bits)
    return ((m - sub_bits) << sub_bits) + (v >> (m - sub_bits))


def qsketch_bounds(bucket: np.ndarray, sub_bits: int = 7):
    """(lo, hi) inclusive value range of each bucket index —
    ``hi - lo + 1 == 2**(m - sub_bits)``, so ``hi/lo <= 1 + 2**-sub_bits``."""
    b = np.asarray(bucket, np.int64)
    m_k = np.maximum((b >> sub_bits) - 1, 0)
    top = b - (m_k << sub_bits)
    lo = top << m_k
    return lo, lo + (np.int64(1) << m_k) - 1


def _qsketch_batch(batch: pa.Table, *, key: str, sub_bits: int) -> pa.Table:
    # the documented contract is non-negative BIGINT with no nulls: a
    # null int64 column converts to float64 + NaN, and NaN -> int64 is
    # undefined (typically INT64_MIN -> clamped into bucket 0) while the
    # SQL twin propagates NULL — fail loudly instead of silently
    # corrupting bucket 0
    if batch[key].null_count:
        raise ValueError(
            f"qsketch: column {key!r} has {batch[key].null_count} nulls "
            "— the sketch contract is non-null non-negative BIGINT "
            "(pc.drop_null upstream if null-skip semantics are wanted)")
    v = batch[key].to_numpy(zero_copy_only=False)
    dense = np.bincount(qsketch_bucket(v, sub_bits))
    nz = np.flatnonzero(dense)
    return pa.table({"bucket": pa.array(nz, pa.int64()),
                     "cnt": pa.array(dense[nz], pa.int64())})


def qsketch_counts(ds, key: str, sub_bits: int = 7):
    """The quantile sketch as a Dataset of ``(bucket, cnt)`` rows — one
    row per touched bucket.  Per-batch dense bincount partials, ONE
    bounded single-key ``groupby.sum`` (<= (65 - sub_bits) * 2**sub_bits
    groups); the driver sees at most that many rows at ANY input size."""
    agg = ds.map_batches(
        _qsketch_batch, fn_kwargs={"key": key, "sub_bits": sub_bits},
        batch_size=8192, batch_format="pyarrow").groupby("bucket").sum("cnt")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"bucket": t["bucket"].cast(pa.int64()),
                         "cnt": t["sum(cnt)"].cast(pa.int64())})

    return agg.map_batches(rename, batch_format="pyarrow")


def qsketch_quantiles(buckets: np.ndarray, cnts: np.ndarray,
                      qs, sub_bits: int = 7) -> np.ndarray:
    """Quantile readout of a ``(bucket, cnt)`` table: for each q, the
    lower bound of the bucket holding rank ``floor(q * (n - 1))``
    (``quantile_disc`` convention).  True value is in
    ``[est, est * (1 + 2**-sub_bits))`` — driver-side like
    :func:`hll_estimate`; the exactness contract lives on the table."""
    if len(np.asarray(buckets)) == 0:
        raise ValueError("quantile readout of an empty sketch")
    order = np.argsort(np.asarray(buckets, np.int64), kind="stable")
    b = np.asarray(buckets, np.int64)[order]
    cum = np.cumsum(np.asarray(cnts, np.int64)[order])
    n = int(cum[-1])
    ranks = np.minimum((np.asarray(qs, np.float64) * max(n - 1, 0)).astype(np.int64),
                       max(n - 1, 0))
    idx = np.searchsorted(cum, ranks + 1)
    lo, _hi = qsketch_bounds(b[idx], sub_bits)
    return lo


def qsketch_sql(table: str, int_expr: str, sub_bits: int = 7) -> str:
    """DuckDB twin of :func:`qsketch_counts` — identical integer bucket
    expression; bit_length via ``length(bin())`` (no float log2).
    ``int_expr`` must yield a non-negative BIGINT (clamped like the
    engine)."""
    k, w = sub_bits, 1 << sub_bits
    return f"""
WITH c AS (SELECT GREATEST(CAST({int_expr} AS BIGINT), 0) AS v FROM {table}),
     b AS (SELECT v, GREATEST(length(bin(v::UBIGINT)) - 1, {k}) AS m FROM c)
SELECT CAST((m - {k}) * {w} + (v >> (m - {k})) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1
"""


# -- grouped variant (quantile sketch per group) ---------------------------
def _qsketch_group_batch(batch: pa.Table, *, key: str, group_col: str,
                         sub_bits: int) -> pa.Table:
    import pandas as pd

    from .util.hashing import hash_u64_many

    if batch[key].null_count:  # see _qsketch_batch: out-of-contract input
        raise ValueError(
            f"qsketch: column {key!r} has {batch[key].null_count} nulls "
            "— the sketch contract is non-null non-negative BIGINT "
            "(pc.drop_null upstream if null-skip semantics are wanted)")
    idx = qsketch_bucket(batch[key].to_numpy(zero_copy_only=False), sub_bits)
    codes, uniques = pd.factorize(
        batch[group_col].to_numpy(zero_copy_only=False))
    uniq = list(uniques)
    if (codes < 0).any():        # repo convention: null keys = one group
        codes = np.where(codes < 0, len(uniq), codes)
        uniq.append(None)
    size = (65 - sub_bits) << sub_bits          # max buckets per group
    # sparse per-batch partial (np.unique, not a dense groups x buckets
    # bincount — high-cardinality group cols would allocate GBs)
    pairs, cnt = np.unique(codes.astype(np.int64) * size + idx,
                           return_counts=True)
    gidx = pairs // size
    gh = hash_u64_many([u if u is not None else "" for u in uniq])
    bucket = (pairs % size).astype(np.int64)
    return pa.table({
        group_col: pa.array(np.asarray(uniq, object)[gidx].tolist(),
                            pa.string()),
        "bucket": pa.array(bucket, pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        # mixed single-int shuffle key (repo standard, never a native
        # two-key groupby): group-hash top bits + bucket in the low 16
        "bkey": pa.array(((gh[gidx] >> np.uint64(16)) << np.uint64(16))
                         | bucket.astype(np.uint64), pa.uint64()),
    })


def _qsketch_group_merge(g: pa.Table) -> pa.Table:
    """Sum cnt per REAL (group, bucket) pair — bkey only co-partitions;
    a top-bits hash collision cannot merge two groups' buckets."""
    import pandas as pd

    gcol = g.column_names[0]
    codes, _uniq = pd.factorize(g[gcol].to_numpy(zero_copy_only=False))
    b = g["bucket"].to_numpy(zero_copy_only=False)
    c = g["cnt"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, codes))
    c_s, b_s = codes[order], b[order]
    first = np.r_[True, (c_s[1:] != c_s[:-1]) | (b_s[1:] != b_s[:-1])]
    starts = np.flatnonzero(first)
    take = order[starts]
    return pa.table({
        gcol: g[gcol].take(pa.array(take)),
        "bucket": g["bucket"].take(pa.array(take)),
        "cnt": pa.array(np.add.reduceat(c[order], starts), pa.int64()),
    })


def qsketch_counts_by_group(ds, key: str, group_col: str, sub_bits: int = 7,
                            n_parts: int = 8):
    """Per-group quantile sketch: ``(group_col, bucket, cnt)`` rows.
    Per-batch partials collapse to <= groups x buckets narrow rows; the
    ONE coarse shuffle rides a mixed uint64 key; the merge is a
    vectorized first-of-run reduceat sum per partition."""
    from .util.rayops import partitioned_map_groups

    parts = ds.map_batches(
        _qsketch_group_batch,
        fn_kwargs={"key": key, "group_col": group_col, "sub_bits": sub_bits},
        batch_size=8192, batch_format="pyarrow")
    return partitioned_map_groups(parts, "bkey", _qsketch_group_merge,
                                  n_parts=n_parts)


def qsketch_group_sql(table: str, int_expr: str, group_col: str,
                      sub_bits: int = 7) -> str:
    """DuckDB twin of :func:`qsketch_counts_by_group`."""
    k, w = sub_bits, 1 << sub_bits
    return f"""
WITH c AS (SELECT {group_col},
                  GREATEST(CAST({int_expr} AS BIGINT), 0) AS v FROM {table}),
     b AS (SELECT {group_col}, v,
                  GREATEST(length(bin(v::UBIGINT)) - 1, {k}) AS m FROM c)
SELECT {group_col},
       CAST((m - {k}) * {w} + (v >> (m - {k})) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1, 2
"""
