"""Deterministic, coordination-free splitting and domain mixing.

The primitive is a vectorized splitmix64 hash of an integer key column:
any worker can decide any row's fate independently — no shuffle, no
shared state, no RNG stream to synchronize — so the assignment is stable
across runs, cluster sizes, partitionings and resumes (the property that
matters when a 100-TB corpus is re-split after an incremental append:
previously-assigned rows never move).

- :func:`split_assign` — train/val/test (any label set) by cumulative
  hash thresholds.
- :func:`stratified_sample` — per-group keep rates over the same hash
  (domain/language rebalancing for training-data mixes).
- :func:`splitmix64_sql` — a DuckDB expression computing the IDENTICAL
  hash (32-bit-split multiplies keep every intermediate inside INT128),
  so both operators have pure-SQL oracles at any scale.

Rates/ratios are quantized to ppm and turned into integer thresholds on
the hash's uint64 range; the same integers are inlined into the SQL, so
engine and oracle agree exactly (no float-boundary drift).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_INC = 0x9E3779B97F4A7C15
_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB
_U64 = 1 << 64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (Steele et al. 2014,
    public domain reference constants)."""
    z = x.astype(np.uint64) + np.uint64(_INC)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(_M1)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(_M2)
    return z ^ (z >> np.uint64(31))


def ppm_threshold(rate_ppm: int) -> int:
    """uint64 threshold for a ppm rate: h < threshold ⇔ keep.  Integer
    arithmetic only — the identical value is inlined into the SQL twin."""
    return (int(rate_ppm) * _U64) // 10**6


def _mulmod_sql(a: str, b: int) -> str:
    lo, hi = b % (1 << 32), b >> 32
    return (f"((({a}) % 4294967296) * {lo} + "
            f"(((({a}) % 4294967296) * {hi} + (({a}) // 4294967296) * {lo})"
            f" % 4294967296) * 4294967296) % 18446744073709551616")


def _xorshift_sql(z: str, n: int) -> str:
    return f"xor(({z})::UBIGINT, ({z})::UBIGINT >> {n})::HUGEINT"


def splitmix64_sql(x_expr: str) -> str:
    """DuckDB scalar subquery computing ``splitmix64(x_expr)`` exactly
    (returns UBIGINT).  ``x_expr`` must be a non-negative integer
    expression < 2^63 (doc ids)."""
    s0 = f"((({x_expr})::HUGEINT + {_INC}) % 18446744073709551616)"
    z1 = _mulmod_sql(_xorshift_sql(s0, 30), _M1)
    z2 = _mulmod_sql(_xorshift_sql("z1", 27), _M2)
    return (f"(SELECT xor(z2::UBIGINT, z2::UBIGINT >> 31) FROM "
            f"(SELECT {z2} AS z2 FROM (SELECT {z1} AS z1)))")


def _split_batch(batch: pa.Table, *, key: str, salt: int, labels: list,
                 bounds: np.ndarray) -> pa.Table:
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids + np.uint64(salt))
    idx = np.searchsorted(bounds, h, side="right")
    lab = np.asarray(labels, dtype=object)[idx]
    return batch.append_column("split", pa.array(lab, pa.string()))


def split_assign(ds, ratios: "dict[str, float]", key: str = "doc_id",
                 salt: int = 0):
    """Append a ``split`` label column: row goes to the i-th label iff its
    hash falls in that label's cumulative-ratio interval of uint64 space.
    Ratios are quantized to ppm and must sum to 1.0 (±1 ppm rounding is
    absorbed by the final label, which catches everything above the last
    boundary).  One stateless map_batches — no shuffle, no materialize."""
    labels = list(ratios)
    ppms = [int(round(r * 10**6)) for r in ratios.values()]
    assert len(labels) >= 2 and abs(sum(ppms) - 10**6) <= len(labels), ratios
    cum = np.cumsum(ppms)[:-1]
    bounds = np.array([ppm_threshold(int(c)) for c in cum], dtype=np.uint64)
    return ds.map_batches(
        _split_batch,
        fn_kwargs={"key": key, "salt": salt, "labels": labels,
                   "bounds": bounds},
        batch_format="pyarrow")


def split_sql(table: str, ratios: "dict[str, float]", key: str = "doc_id",
              salt: int = 0, columns: str = "") -> str:
    """The DuckDB twin of :func:`split_assign` over ``table`` — identical
    thresholds, identical hash."""
    labels = list(ratios)
    ppms = [int(round(r * 10**6)) for r in ratios.values()]
    cum = np.cumsum(ppms)[:-1]
    cases = " ".join(
        f"WHEN h::HUGEINT < {ppm_threshold(int(c))} THEN '{lab}'"
        for c, lab in zip(cum, labels[:-1]))
    cols = f"{key}{', ' + columns if columns else ''}"
    return (f"SELECT {cols}, CASE {cases} ELSE '{labels[-1]}' END AS split "
            f"FROM (SELECT *, {splitmix64_sql(f'{key} + {salt}')} AS h "
            f"FROM {table})")


def _sample_batch(batch: pa.Table, *, key: str, group_col: str, salt: int,
                  thr_map: dict, default_thr: int) -> pa.Table:
    import pandas as pd

    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids + np.uint64(salt))
    codes, uniques = pd.factorize(
        pd.Series(batch[group_col].to_pandas()), use_na_sentinel=False)
    thrs = [thr_map.get(u, default_thr) for u in uniques]
    # keep ⇔ h < thr, expressed as h <= thr-1 so a rate-1.0 threshold of
    # 2^64 fits uint64; thr == 0 (rate 0) keeps nothing via the mask
    thr_m1 = np.array([max(t - 1, 0) for t in thrs], dtype=np.uint64)
    nonzero = np.array([t > 0 for t in thrs], dtype=bool)
    return batch.filter(pa.array((h <= thr_m1[codes]) & nonzero[codes]))


def stratified_sample(ds, rates: "dict[str, float]", group_col: str,
                      key: str = "doc_id", default_rate: float = 1.0,
                      salt: int = 0):
    """Keep each row iff its hash clears its group's rate threshold —
    per-domain/language downsampling for training mixes.  Deterministic
    and subset-monotone: lowering a group's rate keeps a strict subset of
    the rows the higher rate kept (same hash, lower threshold), which is
    what lets a data recipe be tightened without churning the corpus.
    Stateless map_batches; group→threshold is a tiny broadcast dict."""
    thr_map = {g: ppm_threshold(int(round(r * 10**6)))
               for g, r in rates.items()}
    return ds.map_batches(
        _sample_batch,
        fn_kwargs={"key": key, "group_col": group_col, "salt": salt,
                   "thr_map": thr_map,
                   "default_thr": ppm_threshold(int(round(default_rate * 10**6)))},
        batch_format="pyarrow")


def _rank_hash_batch(batch: pa.Table, *, key: str, salt: int,
                     shift: int) -> pa.Table:
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = splitmix64(ids + np.uint64(salt))
    return pa.table({
        key: pa.array(ids.astype(np.int64), pa.int64()),
        "__sr_h": pa.array(h.astype(np.int64), pa.int64()),
        "__sr_part": pa.array((h >> np.uint64(shift)).astype(np.int32),
                              pa.int32()),
    })


def _rank_count_batch(batch: pa.Table, *, key: str, salt: int, shift: int,
                      n_parts: int) -> pa.Table:
    ids = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
    p = splitmix64(ids + np.uint64(salt)) >> np.uint64(shift)
    cnt = np.bincount(p.astype(np.int64), minlength=n_parts)
    nz = np.nonzero(cnt)[0]
    return pa.table({"part": pa.array(nz, pa.int64()),
                     "cnt": pa.array(cnt[nz], pa.int64())})


def _rank_group(t: pa.Table, *, key: str, base: np.ndarray) -> pa.Table:
    p = t["__sr_part"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = t["__sr_h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((h, p))
    ps, n = p[order], len(p)
    new_run = np.r_[True, ps[1:] != ps[:-1]]
    starts = np.flatnonzero(new_run)
    within = np.arange(n, dtype=np.int64) - starts[np.cumsum(new_run) - 1]
    return pa.table({
        key: t[key].take(pa.array(order)),
        "shuffle_rank": pa.array(base[ps] + within, pa.int64()),
    })


def shuffle_rank(ds, key: str = "doc_id", salt: int = 0,
                 n_parts: "int | None" = None,
                 approx_rows: "int | None" = None):
    """Global training-order shuffle as a RANK column: row ``i``'s
    position in the corpus ordered by ``splitmix64(key + salt)`` — the
    deterministic, seed-reproducible "global shuffle" an epoch scheduler
    wants, without ever calling ``random_shuffle`` (whose order is
    scheduler-dependent) or sorting the payload (only ``(key, hash)``
    moves).

    Three payload-free steps, same family as ``packing.pack_offsets``:
    (1) a streaming counts pass — per-block bincount over the hash's TOP
    BITS (a range partition, so partition order == hash order), reduced
    to one tiny driver array whose exclusive scan gives each range's
    base rank; (2) one narrow ``(key, h, part)`` shuffle via the coarse
    group machinery; (3) per-partition vectorized lexsort + base offset.
    Requires distinct keys (splitmix64 is a bijection, so distinct keys
    guarantee a total order — no ties exist).

    Returns rows ``(key, shuffle_rank)``; join rank back to payload by
    key, or feed it to a trainer as the epoch permutation."""
    from ..util.rayops import _resolve_parts, partitioned_map_groups

    want = _resolve_parts(n_parts, approx_rows, 2_000_000)
    bits = max(1, int(want - 1).bit_length())
    n_ranges, shift = 1 << bits, 64 - bits

    counts = ds.map_batches(
        _rank_count_batch,
        fn_kwargs={"key": key, "salt": salt, "shift": shift,
                   "n_parts": n_ranges},
        batch_format="pyarrow").to_pandas()
    total = np.zeros(n_ranges, np.int64)
    np.add.at(total, counts["part"].to_numpy(), counts["cnt"].to_numpy())
    base = np.concatenate(([0], np.cumsum(total)[:-1]))

    import functools
    narrow = ds.map_batches(
        _rank_hash_batch,
        fn_kwargs={"key": key, "salt": salt, "shift": shift},
        batch_format="pyarrow")
    return partitioned_map_groups(
        narrow, "__sr_part",
        functools.partial(_rank_group, key=key, base=base),
        n_parts=min(n_ranges, 256) if n_parts is None else n_parts)


def shuffle_rank_sql(table: str, key: str = "doc_id", salt: int = 0) -> str:
    """DuckDB twin of :func:`shuffle_rank` (identical hash, dense ranks
    from 0 in hash order)."""
    return (f"SELECT {key}, ROW_NUMBER() OVER (ORDER BY h) - 1 "
            f"AS shuffle_rank FROM (SELECT {key}, "
            f"{splitmix64_sql(f'{key} + {salt}')} AS h FROM {table})")


def stratified_sample_sql(table: str, rates: "dict[str, float]",
                          group_col: str, key: str = "doc_id",
                          default_rate: float = 1.0, salt: int = 0,
                          columns: str = "") -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    cases = " ".join(
        f"WHEN '{g}' THEN {ppm_threshold(int(round(r * 10**6)))}"
        for g, r in rates.items())
    dthr = ppm_threshold(int(round(default_rate * 10**6)))
    cols = f"{key}{', ' + columns if columns else ''}"
    return (f"SELECT {cols} FROM "
            f"(SELECT *, {splitmix64_sql(f'{key} + {salt}')} AS h FROM {table}) "
            f"WHERE h::HUGEINT < CASE {group_col} {cases} ELSE {dthr} END")
