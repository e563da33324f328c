"""Distributed EXACT quantiles (DuckDB ``quantile_disc`` semantics) over
a numeric column, global or grouped by a low-cardinality key.

The scale shape is multi-pass selection, NOT a sort: a 100-TB exact
quantile needs no all-to-all exchange at all —

1. **extent pass** (one streaming ``map_batches``): per-batch partial
   ``(group, n, min, max)`` rows; the driver merges a handful of rows
   and turns each (group, q) into a 1-based rank ``max(ceil(q*n)-1,0)+1``
   (the ``quantile_disc`` index rule, validated against DuckDB on a
   randomized sweep — see tests).
2. **histogram pass(es)**: per batch, bincount values of each active
   task's closed interval into K buckets and track per-bucket min/max
   (``np.minimum.at``).  The bucket function is monotone in the value,
   so the per-bucket [min, max] intervals are DISJOINT — the next
   round's membership test is a plain closed-interval filter on the
   ORIGINAL values (no float-edge consistency traps, and int64 columns
   never round-trip through float for membership).  A bucket whose
   min == max is resolved without collecting anything, which is what
   kills heavy-duplicate skew.
3. **collect pass**: for the surviving small intervals, per-batch
   ``value_counts`` (duplicates collapse before leaving the worker),
   driver aggregates the narrow (value, count) rows and picks the rank.

Every pass is a stateless streaming ``map_batches`` whose output is
partial-aggregate-sized; driver state is O(groups × K) counts.  Typical
cost: 3 passes over the column (extent, one histogram round, collect).
The input dataset is re-executed per pass (lazy plan re-run — pass a
column-pruned read so each pass scans only the value/group columns).

NaN policy: NULLs are ignored (SQL aggregate semantics); float NaN is a
counted value that sorts LAST (SQL ``ORDER BY`` order, same as numpy).
DuckDB's ``quantile_disc`` runs ``std::nth_element`` with raw double
comparisons, so its NaN placement is unspecified — oracle parity is
therefore only claimed for NaN-free columns (tests pin the NaN path
against a numpy sort instead).

Int columns never round-trip through float for correctness: the bucket
function uses float64(x), which is monotone in x, so bucket value-ranges
stay disjoint and interval membership/final selection compare original
values; float collisions above 2^53 only coarsen buckets (tested).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_K = 4096  # histogram buckets per round; each round shrinks a task by ~K×


def disc_rank(q: float, n: int) -> int:
    """1-based rank of ``quantile_disc(x, q)`` among n sorted non-null
    values: ``max(ceil(q*n) - 1, 0) + 1``."""
    return max(int(math.ceil(q * n)) - 1, 0) + 1


def _col_np(batch: pa.Table, col: str):
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = ~np.asarray(arr.is_null())
    return arr, valid


def _group_codes(batch: pa.Table, group_col, groups: "list"):
    """int32 code per row (index into ``groups``), -1 for unseen/null."""
    if group_col is None:
        return np.zeros(batch.num_rows, np.int32)
    g = batch[group_col]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    idx = pc.index_in(g, pa.array(groups, g.type))
    return np.asarray(idx.fill_null(-1), dtype=np.int32)


# ---------------------------------------------------------------- pass A

def _extent_batch(batch: pa.Table, *, col: str, group_col=None) -> pa.Table:
    """Partial (group, n, n_nan, vmin, vmax) — one row per group seen in
    the batch.  ``n`` counts non-null values INCLUDING NaN; ``vmin/vmax``
    span the finite-comparable (non-NaN) values.  DuckDB sorts NaN above
    everything, so NaNs are tracked as a tail count, never binned."""
    arr, valid = _col_np(batch, col)
    if group_col is None:
        keys = [None]
        subs = [np.asarray(arr.drop_null().to_numpy(zero_copy_only=False))]
    else:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        gv = np.asarray(enc.indices.fill_null(-1))
        uniq = enc.dictionary
        keys, subs = [], []
        for code in range(len(uniq)):
            m = (gv == code) & valid
            keys.append(uniq[code].as_py())
            subs.append(np.asarray(arr.filter(pa.array(m)).to_numpy(
                zero_copy_only=False)))
    rows = {"grp": [], "n": [], "n_nan": [], "vmin": [], "vmax": []}
    for k, v in zip(keys, subs):
        v = np.asarray(v, dtype=np.float64) if v.dtype.kind == "f" else v
        nan = int(np.isnan(v).sum()) if v.dtype.kind == "f" else 0
        fin = v[~np.isnan(v)] if nan else v
        rows["grp"].append("" if k is None else str(k))
        rows["n"].append(int(v.size))
        rows["n_nan"].append(nan)
        rows["vmin"].append(float(fin.min()) if fin.size else np.inf)
        rows["vmax"].append(float(fin.max()) if fin.size else -np.inf)
    return pa.table({"grp": pa.array(rows["grp"], pa.string()),
                     "n": pa.array(rows["n"], pa.int64()),
                     "n_nan": pa.array(rows["n_nan"], pa.int64()),
                     "vmin": pa.array(rows["vmin"], pa.float64()),
                     "vmax": pa.array(rows["vmax"], pa.float64())})


# ------------------------------------------------------------ histogram

def _hist_batch(batch: pa.Table, *, col: str, group_col, groups,
                tasks) -> pa.Table:
    """Per-batch partials for every active task: (task, bucket, cnt,
    bmin, bmax).  ``tasks`` = list of (gcode, lo, hi) closed intervals."""
    arr, valid = _col_np(batch, col)
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    gc = _group_codes(batch, group_col, groups)
    out = {"task": [], "bucket": [], "cnt": [], "bmin": [], "bmax": []}
    for ti, (gcode, lo, hi) in enumerate(tasks):
        m = valid & (gc == gcode) & (x >= lo) & (x <= hi)
        if not m.any():
            continue
        xv = x[m]
        if hi > lo:
            b = np.floor((xv - lo) * (_K / (hi - lo))).astype(np.int64)
            np.clip(b, 0, _K - 1, out=b)
        else:
            b = np.zeros(xv.size, np.int64)
        cnt = np.bincount(b, minlength=_K)
        bmin = np.full(_K, np.inf)
        bmax = np.full(_K, -np.inf)
        np.minimum.at(bmin, b, xv)
        np.maximum.at(bmax, b, xv)
        nz = np.flatnonzero(cnt)
        out["task"].extend([ti] * nz.size)
        out["bucket"].extend(nz.tolist())
        out["cnt"].extend(cnt[nz].tolist())
        out["bmin"].extend(bmin[nz].tolist())
        out["bmax"].extend(bmax[nz].tolist())
    return pa.table({"task": pa.array(out["task"], pa.int32()),
                     "bucket": pa.array(out["bucket"], pa.int32()),
                     "cnt": pa.array(out["cnt"], pa.int64()),
                     "bmin": pa.array(out["bmin"], pa.float64()),
                     "bmax": pa.array(out["bmax"], pa.float64())})


# -------------------------------------------------------------- collect

def _collect_batch(batch: pa.Table, *, col: str, group_col, groups,
                   tasks) -> pa.Table:
    """(task, value, cnt) for values inside each task's interval —
    per-batch value_counts so duplicates collapse before leaving the
    worker.  Values keep the ORIGINAL column type."""
    arr, valid = _col_np(batch, col)
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    gc = _group_codes(batch, group_col, groups)
    parts = []
    for ti, (gcode, lo, hi) in enumerate(tasks):
        m = valid & (gc == gcode) & (x >= lo) & (x <= hi)
        if not m.any():
            continue
        vc = pc.value_counts(arr.filter(pa.array(m)))
        parts.append(pa.table({
            "task": pa.array(np.full(len(vc), ti, np.int32)),
            "value": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64())}))
    if not parts:
        return pa.table({"task": pa.array([], pa.int32()),
                         "value": pa.array([], arr.type),
                         "cnt": pa.array([], pa.int64())})
    return pa.concat_tables(parts)


# ---------------------------------------------- high-cardinality groups

def grouped_quantiles(ds, col: str, qs, group_col: str,
                      n_parts: int = None, approx_rows: int = None):
    """Exact per-group ``quantile_disc`` for HIGH-cardinality group keys
    (per-user / per-domain percentiles — millions of groups), where
    :func:`exact_quantiles`'s per-(group, q) driver state won't fit.

    Shape: ONE coarse hash shuffle on the group key
    (``partitioned_map_groups`` — every group lands whole in one
    partition), then a single vectorized pass per partition: one Arrow
    multi-key sort, numpy segment boundaries, and a gather per q — no
    per-group Python.  Output is one row per (group, q): narrow and
    group-count-sized, never corpus-sized.

    Matches SQL semantics: NULL values are ignored per group (``n`` is
    the non-null count; all-null groups yield a NULL value row); NULL
    group keys form one group; float NaN sorts last (Arrow sort order).
    Returns (group_col, q_bp int64, value <col type>, n int64).
    """
    from .util.rayops import partitioned_map_groups

    qs = [float(q) for q in qs]
    qs_bp = [int(round(q * 10000)) for q in qs]

    def part_fn(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), (col, "ascending")],
            null_placement="at_end")
        g = t[group_col].take(idx)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t[col].take(idx)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        codes = np.asarray(g.dictionary_encode().indices.fill_null(-1),
                           dtype=np.int64)
        # nulls (code -1) sort together at the end → still one segment
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        valid = np.asarray(v.is_valid())
        cumv = np.r_[0, np.cumsum(valid)]
        n_valid = cumv[ends] - cumv[starts]  # nulls sit at segment end
        gkeys = g.take(pa.array(starts))
        parts = []
        for q, bp in zip(qs, qs_bp):
            rank = np.maximum(np.ceil(q * n_valid).astype(np.int64) - 1, 0)
            pick = starts + np.minimum(rank, np.maximum(n_valid - 1, 0))
            vals = v.take(pa.array(pick))
            vals = pc.if_else(pa.array(n_valid > 0), vals,
                              pa.nulls(len(starts), v.type))
            parts.append(pa.table({
                group_col: gkeys,
                "q_bp": pa.array(np.full(len(starts), bp), pa.int64()),
                "value": vals,
                "n": pa.array(n_valid, pa.int64())}))
        return pa.concat_tables(parts)

    return partitioned_map_groups(ds, group_col, part_fn, n_parts=n_parts,
                                  approx_rows=approx_rows)


# ----------------------------------------------------------------- API

def exact_quantiles(ds, col: str, qs, *, group_col: str = None,
                    collect_cap: int = 2_000_000, max_rounds: int = 6,
                    batch_size: int = 65_536) -> pa.Table:
    """Exact ``quantile_disc`` values of ``ds[col]`` for each q in
    ``qs`` (and each group when ``group_col`` is set — low-cardinality
    keys only; the driver holds one rank state per (group, q)).

    Returns (group_col?, q_bp int64, value <col type>, n int64) with
    ``q_bp`` = basis points (q × 10000, rounded).  Groups with zero
    non-null values get a null value row, like SQL."""
    qs = list(qs)

    def _mb(fn, **kw):
        return ds.map_batches(fn, batch_format="pyarrow",
                              batch_size=batch_size, fn_kwargs=kw)

    # pass A — per-group extent
    ext = _mb(_extent_batch, col=col, group_col=group_col).to_arrow_refs()
    import ray
    ext_t = pa.concat_tables([ray.get(r) for r in ext])
    gnames = sorted(set(ext_t["grp"].to_pylist()))
    agg = {}
    for g, n, nnan, lo, hi in zip(
            ext_t["grp"].to_pylist(), ext_t["n"].to_pylist(),
            ext_t["n_nan"].to_pylist(), ext_t["vmin"].to_pylist(),
            ext_t["vmax"].to_pylist()):
        cur = agg.get(g, (0, 0, np.inf, -np.inf))
        agg[g] = (cur[0] + n, cur[1] + nnan,
                  min(cur[2], lo), max(cur[3], hi))
    groups = gnames if group_col is not None else [""]

    # state per (group, q): dict -> (rank_in_interval, lo, hi, count_in)
    state, done = {}, {}
    for gi, g in enumerate(groups):
        n, nnan, lo, hi = agg.get(g, (0, 0, np.inf, -np.inf))
        for q in qs:
            key = (gi, q)
            if n == 0:
                done[key] = (None, 0)
                continue
            rank = disc_rank(q, n)
            if rank > n - nnan:  # lands in the NaN tail (sorts last)
                done[key] = (float("nan"), n)
            else:
                state[key] = (rank, lo, hi, n - nnan)

    col_type = None
    rounds = 0
    while state:
        # build deduped interval tasks for whatever still needs narrowing
        need_hist = {k: v for k, v in state.items()
                     if v[3] > collect_cap and v[1] < v[2]
                     and rounds < max_rounds}
        if need_hist:
            tasks, tmap = [], {}
            for k, (rank, lo, hi, cnt) in need_hist.items():
                tk = (k[0], lo, hi)
                if tk not in tmap:
                    tmap[tk] = len(tasks)
                    tasks.append(tk)
            hrefs = _mb(_hist_batch, col=col, group_col=group_col,
                        groups=groups, tasks=tasks).to_arrow_refs()
            ht = pa.concat_tables([ray.get(r) for r in hrefs])
            t_ = np.asarray(ht["task"]); b_ = np.asarray(ht["bucket"])
            c_ = np.asarray(ht["cnt"]); mn = np.asarray(ht["bmin"])
            mx = np.asarray(ht["bmax"])
            cnts = np.zeros((len(tasks), _K), np.int64)
            mins = np.full((len(tasks), _K), np.inf)
            maxs = np.full((len(tasks), _K), -np.inf)
            np.add.at(cnts, (t_, b_), c_)
            np.minimum.at(mins, (t_, b_), mn)
            np.maximum.at(maxs, (t_, b_), mx)
            cums = np.cumsum(cnts, axis=1)
            for k, (rank, lo, hi, cnt) in need_hist.items():
                ti = tmap[(k[0], lo, hi)]
                b = int(np.searchsorted(cums[ti], rank, side="left"))
                below = int(cums[ti][b - 1]) if b else 0
                state[k] = (rank - below, float(mins[ti][b]),
                            float(maxs[ti][b]), int(cnts[ti][b]))
            rounds += 1
            continue

        # collect pass for everything that remains
        tasks, tmap = [], {}
        for k, (rank, lo, hi, cnt) in state.items():
            tk = (k[0], lo, hi)
            if tk not in tmap:
                tmap[tk] = len(tasks)
                tasks.append(tk)
        crefs = _mb(_collect_batch, col=col, group_col=group_col,
                    groups=groups, tasks=tasks).to_arrow_refs()
        ct = pa.concat_tables([ray.get(r) for r in crefs])
        col_type = ct["value"].type
        tarr = np.asarray(ct["task"])
        for k, (rank, lo, hi, cnt) in list(state.items()):
            ti = tmap[(k[0], lo, hi)]
            sub = ct.filter(pa.array(tarr == ti))
            vc = sub.group_by("value").aggregate([("cnt", "sum")])
            vc = vc.sort_by("value")
            cum = np.cumsum(np.asarray(vc["cnt_sum"]))
            j = int(np.searchsorted(cum, rank, side="left"))
            done[k] = (vc["value"][j].as_py(), int(agg[groups[k[0]]][0]))
            del state[k]

    # assemble output
    if col_type is None:
        col_type = pa.float64()
    out = {"q_bp": [], "value": [], "n": []}
    gout = []
    for gi, g in enumerate(groups):
        for q in qs:
            v, n = done[(gi, q)]
            gout.append(g)
            out["q_bp"].append(int(round(q * 10000)))
            out["value"].append(v)
            out["n"].append(n)
    cols = {}
    if group_col is not None:
        cols[group_col] = pa.array(gout, pa.string())
    cols["q_bp"] = pa.array(out["q_bp"], pa.int64())
    cols["value"] = pa.array(out["value"], col_type)
    cols["n"] = pa.array(out["n"], pa.int64())
    return pa.table(cols)
