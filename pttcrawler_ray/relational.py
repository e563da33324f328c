"""Relational operator layer over the testdata star schema — each function
is one SURVEY.md §2 operator family expressed Ray-Data-first, with a
matching DuckDB oracle in ``__ray_entry__.oracle_sql``.

Patterns (per the Ray guide):
- reads prune columns (`read_parquet(columns=[...])`) and push filters;
- small sides broadcast (``ray.put`` once, dict/set lookup per batch) —
  no shuffle joins for dimension tables;
- aggregations pre-combine inside map_batches where the group count is
  small, else use the built-in partial+final groupby aggregates;
- per-group argmax / top-k via ``groupby().map_groups`` on Arrow tables.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from .util.rayops import (bucketed_membership_join, grouped_topk, parquet_rows,
                          partitioned_map_groups, read_parquet_clean)


def _read(sf_dir: str, name: str, columns: list[str] | None = None,
          **kw) -> "rd.Dataset":
    # read_parquet_clean strips pandas schema metadata so Ray's reduce-side
    # schema dedup works (see util.rayops)
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"),
                              columns=columns, **kw)


def _rows(sf_dir: str, name: str) -> int:
    """Footer-metadata row count — sizes coarse partition counts."""
    return parquet_rows(os.path.join(sf_dir, f"{name}.parquet"))


# ------------------------------------------------------------ D2/O2: latest
def latest_event_per_user(sf_dir: str) -> "rd.Dataset":
    """Latest event per user (ties → max event_id) — the dedupe-latest
    pattern (groupby key, keep max ts), same shape as the crawl sink."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type", "value"])
    # one vectorized task per coarse partition, not one call per user
    return grouped_topk(ds, "user_id",
                        [("ts", "descending"), ("event_id", "descending")], k=1,
                        approx_rows=_rows(sf_dir, "events"))


# ----------------------------------------------------------- A2: watermarks
def event_type_watermarks(sf_dir: str) -> "rd.Dataset":
    ds = _read(sf_dir, "events", ["event_type", "ts"])
    return ds.groupby("event_type").aggregate(
        Min("ts", alias_name="min_ts"), Max("ts", alias_name="max_ts"))


# -------------------------------------------------------- O3: top-k / group
def topk_events_per_user(sf_dir: str, k: int = 3) -> "rd.Dataset":
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    return grouped_topk(ds, "user_id",
                        [("ts", "descending"), ("event_id", "descending")], k=k,
                        approx_rows=_rows(sf_dir, "events"))


class _KeySetFilter:
    """Broadcast semi/anti filter: keep rows whose ``col`` is (or is not)
    in the broadcast key set — the shared shape of J1/J4."""

    def __init__(self, key_ref, col: str, keep_members: bool):
        # once per actor: the broadcast key set becomes an Arrow value_set
        # so the membership test is a vectorized pc.is_in, not a row loop
        self.value_set = pa.array(sorted(ray.get(key_ref)))
        self.col = col
        self.keep = keep_members

    def __call__(self, t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[self.col], value_set=self.value_set)
        return t.filter(mask if self.keep else pc.invert(mask))


def _distinct_key_set(ds: "rd.Dataset", col: str) -> frozenset:
    """Distinct key set, deduped INSIDE map_batches before the driver
    gather — only each block's unique keys cross the object store, not
    every qualifying row.  The driver holds the final distinct set (the
    broadcast small side); at 100TB this becomes a bloom-filter broadcast
    + exact bucketed pass (same shape as the frontier's seen-set
    anti-join)."""
    uniq = ds.map_batches(
        lambda t, c=col: pa.table({c: pc.unique(t[c])}), batch_format="pyarrow")
    keys: set = set()
    for b in uniq.iter_batches(batch_format="pyarrow", batch_size=65536):
        keys.update(b[col].to_pylist())
    return frozenset(keys)


# ------------------------------------------------------------- J1: anti-join
def customers_without_orders(sf_dir: str, min_total: float = 400_000.0,
                             distributed: bool = False) -> "rd.Dataset":
    """Anti-join: customers with no order above ``min_total``.  Default
    plan broadcasts the distinct qualifying custkey set (rides the object
    store once; the filter is pushed into the orders read for row-group
    pruning).  ``distributed=True`` switches to the exact bucketed
    membership join (rayops.bucketed_membership_join) for key sets too
    large to broadcast — a bloom cannot substitute here: an FP would
    wrongly DROP a customer."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"],
                   filter=(pc.field("o_totalprice") > min_total))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    if distributed:
        # declared carry + footer row count keep the fact pipeline lazy
        return bucketed_membership_join(
            cust, orders, "c_custkey", "o_custkey", keep_members=False,
            carry=[("c_custkey", pa.int64()), ("c_name", pa.string())],
            approx_rows=_rows(sf_dir, "customer"))
    ref = ray.put(_distinct_key_set(orders, "o_custkey"))
    return cust.map_batches(
        _KeySetFilter,
        fn_constructor_kwargs={"key_ref": ref, "col": "c_custkey", "keep_members": False},
        batch_format="pyarrow", concurrency=(1, 2))


# ------------------------------------------------------------- J4: semi-join
def orders_of_segment(sf_dir: str, segment: str = "BUILDING",
                      distributed: bool = False) -> "rd.Dataset":
    """Semi-join: orders of one customer segment.  Plans as in
    :func:`customers_without_orders` (broadcast set vs exact bucketed
    membership join at scale)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    seg = cust.map_batches(
        lambda t, s=segment: t.filter(pc.equal(t["c_mktsegment"], s)),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    if distributed:
        return bucketed_membership_join(
            orders, seg, "o_custkey", "c_custkey", keep_members=True,
            carry=[("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                   ("o_totalprice", pa.float64())],
            approx_rows=_rows(sf_dir, "orders"))
    ref = ray.put(_distinct_key_set(seg, "c_custkey"))
    return orders.map_batches(
        _KeySetFilter,
        fn_constructor_kwargs={"key_ref": ref, "col": "o_custkey", "keep_members": True},
        batch_format="pyarrow", concurrency=(1, 2))


# -------------------------------------------------------- A4: grouped count
def orders_per_customer(sf_dir: str) -> "rd.Dataset":
    ds = _read(sf_dir, "orders", ["o_custkey"])
    return ds.groupby("o_custkey").aggregate(Count(alias_name="n_orders"))


# -------------------------------------------- A3: conditional counts (TW-ish)
def customers_balance_by_nation(sf_dir: str) -> "rd.Dataset":
    """Per nation name: customers with positive vs non-positive balance —
    the TW/non-TW conditional-count shape with a broadcast dim join."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put(nmap)
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    class Partial:
        """Pre-aggregate inside the batch: one row per nation per batch."""

        def __init__(self, nref):
            nmap = ray.get(nref)
            self.index = pd.Index(list(nmap))
            self.names = np.array([nmap[k] for k in self.index], dtype=object)

        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized conditional count: hash-indexer + two bincounts,
            # no per-row Python
            pos_ix = self.index.get_indexer(
                t["c_nationkey"].to_numpy(zero_copy_only=False))
            # fill_null(False): a null balance counts as non-positive (the
            # per-row formulation's falsy-None behavior), and keeps the
            # mask bool-dtyped instead of object-with-None
            p = pc.fill_null(pc.greater(t["c_acctbal"], 0.0),
                             False).to_numpy(zero_copy_only=False)
            npos = np.bincount(pos_ix[p], minlength=len(self.index))
            nneg = np.bincount(pos_ix[~p], minlength=len(self.index))
            seen = (npos + nneg) > 0
            return pa.table({
                "nation": pa.array(self.names[seen], pa.string()),
                "positive_bal": pa.array(npos[seen], pa.int64()),
                "non_positive_bal": pa.array(nneg[seen], pa.int64()),
            })

    partials = cust.map_batches(Partial, fn_constructor_kwargs={"nref": ref},
                                batch_format="pyarrow", concurrency=(1, 2))
    return partials.groupby("nation").aggregate(
        Sum("positive_bal", alias_name="positive_bal"),
        Sum("non_positive_bal", alias_name="non_positive_bal"))


# ----------------------------------------------------------- A5/D3: distinct
def distinct_doc_dims(sf_dir: str) -> "rd.Dataset":
    ds = _read(sf_dir, "documents", ["lang", "source"])
    return ds.groupby(["lang", "source"]).count().select_columns(["lang", "source"])


# --------------------------------------------------------- O4: sort + limit
def top_orders(sf_dir: str, k: int = 10) -> "rd.Dataset":
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


# ----------------------------------------------- J3/M12: export denorm join
def orders_denorm(sf_dir: str) -> "rd.Dataset":
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    # pre-join nation onto the customer dim ONCE (vectorized), broadcast
    # the flat arrays; per batch the lookup is one hash-indexer call + two
    # numpy takes — no per-row Python in the hot path
    nmap = pd.Series(nation["n_name"].values, index=nation["n_nationkey"])
    cust["n_name"] = nmap.reindex(cust["c_nationkey"]).values
    ref = ray.put((cust["c_custkey"].to_numpy(), cust["c_name"].to_numpy(),
                   cust["n_name"].to_numpy()))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    class Denorm:
        def __init__(self, r):
            keys, names, nations = ray.get(r)
            self.index = pd.Index(keys)
            self.names, self.nations = names, nations

        def __call__(self, t: pa.Table) -> pa.Table:
            pos = self.index.get_indexer(
                t["o_custkey"].to_numpy(zero_copy_only=False))
            if pos.min(initial=0) < 0:
                # get_indexer's -1 would silently fancy-index the LAST
                # customer; fail loudly like the dict lookup it replaced
                bad = t["o_custkey"].to_numpy(zero_copy_only=False)[pos < 0]
                raise KeyError(f"o_custkey not in customer dim: {bad[:5]}")
            return pa.table({
                "o_orderkey": t["o_orderkey"],
                "c_name": pa.array(self.names[pos], pa.string()),
                "n_name": pa.array(self.nations[pos], pa.string()),
                "o_totalprice": t["o_totalprice"],
            })

    return orders.map_batches(Denorm, fn_constructor_kwargs={"r": ref},
                              batch_format="pyarrow", concurrency=(1, 2))


# ------------------------------------------------------ TPC-H Q1-ish summary
def lineitem_summary(sf_dir: str) -> "pa.Table":
    """TPC-H Q1 shape.  The group key space is tiny and FIXED (flag ×
    status ≈ 6), so the scale-right plan is a per-batch vectorized
    partial aggregate followed by a driver merge of ≤ 6-row partials —
    never Ray's native multi-key groupby over the raw rows (its
    tuple-key sort machinery measured 69.8 s for a 10M-row two-key
    count; nothing here shuffles at all).  Exactness: l_quantity is
    integer-valued, so float64 partial sums are order-independent."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "sum_qty", "count_order"])

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    tabs = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"l_returnflag": pa.array([], pa.string()),
                         "l_linestatus": pa.array([], pa.string()),
                         "sum_qty": pa.array([], pa.float64()),
                         "count_order": pa.array([], pa.int64())})
    merged = pa.concat_tables(tabs).group_by(
        ["l_returnflag", "l_linestatus"]).aggregate(
        [("sum_qty", "sum"), ("count_order", "sum")])
    return merged.rename_columns(["l_returnflag", "l_linestatus",
                                  "sum_qty", "count_order"])


# ----------------------------------------------------- M8: filter + pushdown
def high_value_events(sf_dir: str, min_value: float = 90.0) -> "rd.Dataset":
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"],
               filter=(pc.field("value") >= min_value))  # row-group pushdown at the read
    return ds.map_batches(
        lambda t: pa.table({"event_id": t["event_id"], "user_id": t["user_id"]}),
        batch_format="pyarrow")


# ----------------------------------------- streaming-shaped: tumbling window
def events_hourly(sf_dir: str) -> "rd.Dataset":
    """Tumbling 1h event-time window per event_type: count + max value.
    Ray Data has no native event-time windows; the window key is computed
    per batch and the aggregate shuffles on (type, window) — the guide's
    pattern for stream-shaped references."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        """Per-batch combiner: collapse to one row per (type, window)
        BEFORE the shuffle — the wide exchange then carries only
        key-cardinality × blocks rows, not every event."""
        t = t.append_column("window_start",
                            pc.floor_temporal(t["ts"], unit="hour"))
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [([], "count_all"), ("value", "max")])
        return g.rename_columns(["event_type", "window_start",
                                 "n_events", "max_value"])

    # batch_size must be >> key cardinality (types × hours in range) or
    # the combiner doesn't shrink anything; 64k rows per partial call
    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536) \
        .groupby(["event_type", "window_start"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Max("max_value", alias_name="max_value"))


# ------------------------------------------- big-big partitioned hash join
def lineitem_order_join(sf_dir: str, n_buckets: int = 16) -> "rd.Dataset":
    """Both sides large → explicit bucketed hash join (the guide's portable
    pattern): add ``bucket = key % B`` to both sides, tag the side, union,
    groupby(bucket), and hash-join each bucket pairwise inside map_groups.
    Skewed keys would be salted into sub-buckets the same way the frontier
    splits hot sites.  Output: one row per lineitem with its order's
    totalprice.  ``n_buckets`` must be a power of two (bit-mask bucketing)."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def tag_li(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["l_orderkey"], n_buckets - 1), pa.int32())
        return pa.table({"bucket": b, "side": pa.array(["l"] * len(t)),
                         "key": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "l_quantity": t["l_quantity"],
                         "o_totalprice": pa.nulls(len(t), pa.float64())})

    def tag_o(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["o_orderkey"], n_buckets - 1), pa.int32())
        return pa.table({"bucket": b, "side": pa.array(["o"] * len(t)),
                         "key": t["o_orderkey"],
                         "l_linenumber": pa.nulls(len(t), pa.int32()),
                         "l_quantity": pa.nulls(len(t), pa.float64()),
                         "o_totalprice": t["o_totalprice"]})

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_o, batch_format="pyarrow"))

    def join_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        left = df[df["side"] == "l"][["key", "l_linenumber", "l_quantity"]]
        right = df[df["side"] == "o"][["key", "o_totalprice"]]
        out = left.merge(right, on="key", how="inner")
        return pa.table({
            "l_orderkey": pa.array(out["key"], pa.int64()),
            "l_linenumber": pa.array(out["l_linenumber"], pa.int32()),
            "l_quantity": pa.array(out["l_quantity"], pa.float64()),
            "o_totalprice": pa.array(out["o_totalprice"], pa.float64()),
        })

    return both.groupby("bucket").map_groups(join_bucket, batch_format="pyarrow")


# ------------------------------------------------------ as-of join (events)
def events_asof_orders(sf_dir: str) -> "rd.Dataset":
    """As-of join (SURVEY.md §2.4 'none in the reference' → engine
    extension per the guide): for each event, the most recent order of the
    same key with o_orderdate <= ts.  Pattern: bucket by key, sort within
    group, ``pd.merge_asof`` per bucket inside map_groups."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_e(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["user_id"], "side": pa.array(["e"] * len(t)),
                         "event_id": t["event_id"], "ts": t["ts"],
                         "o_orderkey": pa.nulls(len(t), pa.int64()),
                         "o_orderdate": pa.nulls(len(t), pa.timestamp("us"))})

    def tag_o(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["o_custkey"], "side": pa.array(["o"] * len(t)),
                         "event_id": pa.nulls(len(t), pa.int64()),
                         "ts": pa.nulls(len(t), pa.timestamp("us")),
                         "o_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"]})

    both = ev.map_batches(tag_e, batch_format="pyarrow").union(
        orders.map_batches(tag_o, batch_format="pyarrow"))

    def asof_bucket(g: pa.Table) -> pa.Table:
        # one coarse partition holds MANY users; merge_asof(by="key")
        # does every user's as-of lookup in a single vectorized pass
        import pandas as pd

        df = g.to_pandas()
        left = (df[df["side"] == "e"][["key", "event_id", "ts"]]
                .sort_values(["ts", "event_id"], kind="mergesort"))
        right = (df[df["side"] == "o"][["key", "o_orderkey", "o_orderdate"]]
                 .sort_values(["o_orderdate", "o_orderkey"], kind="mergesort"))
        if left.empty:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64())})
        # ties on o_orderdate: keep max o_orderkey (deterministic, matches
        # the oracle's row_number ordering)
        out = pd.merge_asof(left, right, left_on="ts", right_on="o_orderdate",
                            by="key", direction="backward")
        out = out[out["o_orderkey"].notna()]  # events before any order drop out
        return pa.table({
            "event_id": pa.array(out["event_id"].astype("int64"), pa.int64()),
            "o_orderkey": pa.array(out["o_orderkey"].astype("int64"), pa.int64()),
        })

    return partitioned_map_groups(
        both, "key", asof_bucket,
        approx_rows=_rows(sf_dir, "events") + _rows(sf_dir, "orders"))


# ----------------------------------------------------------- range join
def events_range_orders(sf_dir: str, window_days: int = 30) -> "rd.Dataset":
    """Bounded-interval RANGE JOIN + aggregate (SURVEY.md §2.4 engine
    extension alongside the as-of join): per event, the number of the same
    user's orders with o_orderdate in [ts - window, ts].  Pattern: bucket
    both sides by the key (one shuffle), then a vectorized double
    ``searchsorted`` over each user's date-sorted orders inside map_groups
    — no per-row loop, no cross-bucket traffic; skewed keys would be
    salted like the frontier's hot-site lanes."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_e(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["user_id"], "side": pa.array(["e"] * len(t)),
                         "event_id": t["event_id"], "ts": t["ts"],
                         "o_orderdate": pa.nulls(len(t), pa.timestamp("us"))})

    def tag_o(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["o_custkey"], "side": pa.array(["o"] * len(t)),
                         "event_id": pa.nulls(len(t), pa.int64()),
                         "ts": pa.nulls(len(t), pa.timestamp("us")),
                         "o_orderdate": t["o_orderdate"]})

    both = ev.map_batches(tag_e, batch_format="pyarrow").union(
        orders.map_batches(tag_o, batch_format="pyarrow"))

    def range_bucket(g: pa.Table) -> pa.Table:
        # one coarse partition holds MANY users.  Count-in-window per user
        # via two merge_asof(by="key") passes against a per-user cumulative
        # order count: hi = orders with date <= ts (exact matches in),
        # lo = orders with date < ts - window (exact matches out);
        # n_orders = hi - lo.  Equivalent to the per-key searchsorted
        # formulation but vectorized across every user in the partition.
        import numpy as np
        import pandas as pd

        df = g.to_pandas()
        evs = df[df["side"] == "e"][["key", "event_id", "ts"]]
        if evs.empty:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        od = (df[df["side"] == "o"][["key", "o_orderdate"]]
              .sort_values(["key", "o_orderdate"], kind="mergesort"))
        od["cum"] = od.groupby("key", sort=False).cumcount() + 1
        od = od.sort_values("o_orderdate", kind="mergesort")
        hi = pd.merge_asof(evs.sort_values("ts", kind="mergesort"), od,
                           left_on="ts", right_on="o_orderdate", by="key",
                           direction="backward", allow_exact_matches=True)
        evs_lo = evs.copy()
        evs_lo["ts_lo"] = (evs_lo["ts"] - pd.Timedelta(days=window_days)) \
            .astype(evs_lo["ts"].dtype)
        lo = pd.merge_asof(evs_lo.sort_values("ts_lo", kind="mergesort"), od,
                           left_on="ts_lo", right_on="o_orderdate", by="key",
                           direction="backward", allow_exact_matches=False)
        hi_c = hi.set_index("event_id")["cum"].fillna(0)
        lo_c = lo.set_index("event_id")["cum"].fillna(0)
        n = (hi_c - lo_c.reindex(hi_c.index)).astype("int64")
        return pa.table({
            "event_id": pa.array(n.index.to_numpy().astype("int64"), pa.int64()),
            "n_orders": pa.array(n.to_numpy(), pa.int64()),
        })

    return partitioned_map_groups(
        both, "key", range_bucket,
        approx_rows=_rows(sf_dir, "events") + _rows(sf_dir, "orders"))


# ------------------------------------------------- gap-based sessionization
def user_sessions(sf_dir: str, gap_minutes: int = 60) -> "rd.Dataset":
    """Stateful-streaming-shaped op: gap-based sessions per user (new
    session when the inter-event gap exceeds ``gap_minutes``); windowing
    runs inside map_groups over ts-sorted groups (the guide's pattern for
    stream-shaped work).  Output: one row per session with count + span."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def sessions(g: pa.Table) -> pa.Table:
        # one vectorized pass over a coarse partition holding MANY users:
        # sort by (user, ts), session breaks at user boundaries or gaps,
        # per-user 0-based ids by subtracting each user's first break count
        import numpy as np
        import pandas as pd

        df = g.to_pandas().sort_values(["user_id", "ts", "event_id"])
        new_user = df["user_id"].ne(df["user_id"].shift())
        gaps = df["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        new_sess = new_user | gaps
        glob = new_sess.cumsum()
        df["session_id"] = (glob - glob.where(new_user).ffill()).astype(np.int64)
        agg = df.groupby(["user_id", "session_id"], sort=False).agg(
            n_events=("event_id", "count"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        ).reset_index()
        return pa.table({
            "user_id": pa.array(agg["user_id"], pa.int64()),
            "session_id": pa.array(agg["session_id"], pa.int64()),
            "n_events": pa.array(agg["n_events"], pa.int64()),
            "session_start": pa.array(agg["session_start"], pa.timestamp("us")),
            "session_end": pa.array(agg["session_end"], pa.timestamp("us")),
        })

    return partitioned_map_groups(ev, "user_id", sessions,
                                  approx_rows=_rows(sf_dir, "events"))


def knn_top1(sf_dir: str, n_queries: int = 3) -> pa.Table:
    """Top-1 non-self cosine neighbor for the first n vec_ids (ints only —
    float-free result columns so the hash compare is exact)."""
    from .textops.similarity import knn_brute

    embs = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # pushed-down read of ONLY the query rows — never materialize the table
    qds = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                filter=(pc.field("vec_id") < n_queries))
    qdf = qds.to_pandas().set_index("vec_id").sort_index()
    q = np.stack(qdf.loc[range(n_queries), "embedding"])
    out = knn_brute(embs, q, k=2).to_pandas()
    out = out[out["vec_id"] != out["query_id"]]
    out = out.sort_values(["query_id", "rank"]).groupby("query_id").head(1)
    return pa.table({
        "query_id": pa.array(out["query_id"].astype("int64")),
        "vec_id": pa.array(out["vec_id"].astype("int64")),
    })
