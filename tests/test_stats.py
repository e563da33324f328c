"""Distributed exact quantiles (stats.exact_quantiles) vs DuckDB
quantile_disc — global, grouped, int64 beyond 2^53, heavy-duplicate
skew with forced refinement rounds, NaN tail (numpy-pinned: DuckDB's
NaN placement is unspecified), and all-null groups."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def quant_data():
    rng = np.random.default_rng(42)
    n = 60_000
    vals = rng.normal(1000, 300, n).round(2)
    null_mask = rng.random(n) < 0.02
    grp = rng.choice(["A", "B", "C"], n)
    t = pa.table({
        "v": pa.array([None if m else float(x)
                       for m, x in zip(null_mask, vals)], pa.float64()),
        "g": pa.array(grp)})
    import duckdb

    con = duckdb.connect()
    con.register("t", t)
    return t, con


QS = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def test_exact_quantiles_global(ray_session, quant_data):
    import ray.data as rd

    from pttcrawler_ray.stats import exact_quantiles

    t, con = quant_data
    out = exact_quantiles(rd.from_arrow(t).repartition(16), "v", QS)
    for q_bp, v, n in zip(out["q_bp"].to_pylist(), out["value"].to_pylist(),
                          out["n"].to_pylist()):
        exp, nn = con.execute(
            f"SELECT quantile_disc(v, {q_bp / 10000.0}), count(v) FROM t"
        ).fetchone()
        assert v == exp and n == nn, (q_bp, v, exp)


def test_exact_quantiles_grouped(ray_session, quant_data):
    import ray.data as rd

    from pttcrawler_ray.stats import exact_quantiles

    t, con = quant_data
    out = exact_quantiles(rd.from_arrow(t).repartition(16), "v",
                          [0.5, 0.9], group_col="g")
    assert out.num_rows == 6
    for g, q_bp, v in zip(out["g"].to_pylist(), out["q_bp"].to_pylist(),
                          out["value"].to_pylist()):
        exp = con.execute(
            f"SELECT quantile_disc(v, {q_bp / 10000.0}) FROM t WHERE g = ?",
            [g]).fetchone()[0]
        assert v == exp, (g, q_bp, v, exp)


def test_exact_quantiles_int64_heavy_dup_refinement(ray_session):
    """collect_cap=100 forces histogram refinement rounds; half the
    column is one duplicated value (skew resolved without collection,
    via per-bucket min==max); magnitudes exceed 2^53 so float64 bucket
    collisions occur but selection stays on original ints."""
    import duckdb
    import ray.data as rd

    from pttcrawler_ray.stats import exact_quantiles

    rng = np.random.default_rng(7)
    t = pa.table({"v": pa.array(
        np.r_[np.full(30_000, 7), rng.integers(0, 2**62, 30_000)],
        pa.int64())})
    con = duckdb.connect()
    con.register("ti", t)
    out = exact_quantiles(rd.from_arrow(t).repartition(8), "v", QS,
                          collect_cap=100)
    assert out["value"].type == pa.int64()
    for q_bp, v in zip(out["q_bp"].to_pylist(), out["value"].to_pylist()):
        exp = con.execute(
            f"SELECT quantile_disc(v, {q_bp / 10000.0}) FROM ti").fetchone()[0]
        assert v == exp, (q_bp, v, exp)


def test_exact_quantiles_nan_sorts_last(ray_session):
    import ray.data as rd

    from pttcrawler_ray.stats import exact_quantiles

    rng = np.random.default_rng(3)
    vn = np.r_[rng.normal(size=5_000), np.full(300, np.nan)]
    rng.shuffle(vn)
    out = exact_quantiles(
        rd.from_arrow(pa.table({"v": pa.array(vn, pa.float64())}))
        .repartition(4), "v", QS)
    ref = np.sort(vn)  # numpy sorts NaN last, the documented policy
    for q_bp, v in zip(out["q_bp"].to_pylist(), out["value"].to_pylist()):
        exp = ref[max(int(np.ceil(q_bp / 10000.0 * len(vn))) - 1, 0)]
        assert v == exp or (np.isnan(v) and np.isnan(exp)), (q_bp, v, exp)


def test_exact_quantiles_all_null_group(ray_session):
    import ray.data as rd

    from pttcrawler_ray.stats import exact_quantiles

    t = pa.table({"v": pa.array([None, None, 3.5], pa.float64()),
                  "g": pa.array(["only", "only", "z"])})
    out = exact_quantiles(rd.from_arrow(t), "v", [0.5], group_col="g")
    d = out.to_pydict()
    assert d["value"] == [None, 3.5] and d["n"] == [0, 1]


def test_grouped_quantiles_high_cardinality(ray_session):
    """grouped_quantiles (one shuffle, segment-vectorized selection) vs
    DuckDB at ~10k groups, with null group keys and null values."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.stats import grouped_quantiles

    rng = np.random.default_rng(5)
    n = 80_000
    gid = rng.integers(0, 10_000, n)
    vals = rng.normal(100, 25, n).round(3)
    null_v = rng.random(n) < 0.03
    null_g = rng.random(n) < 0.01
    t = pa.table({
        "g": pa.array([None if m else int(x)
                       for m, x in zip(null_g, gid)], pa.int64()),
        "v": pa.array([None if m else float(x)
                       for m, x in zip(null_v, vals)], pa.float64())})
    out = grouped_quantiles(rd.from_arrow(t).repartition(16), "v",
                            [0.5, 0.9], "g").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute("""
        SELECT g, 5000 AS q_bp, quantile_disc(v, 0.5) AS value,
               count(v) AS n FROM t GROUP BY g
        UNION ALL
        SELECT g, 9000, quantile_disc(v, 0.9), count(v) FROM t GROUP BY g
    """).df()
    cols = ["g", "q_bp", "value", "n"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# --------------------------------------------------------------------------
# mergeable sketches (sketches.py)
# --------------------------------------------------------------------------
def test_hll_registers_match_duckdb_and_estimate(ray_session):
    """Engine HLL register table == the pure-SQL twin on a planted key
    stream (dups + skew), and the float readout lands within the p=12
    error envelope on 50k distinct keys."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.sketches import hll_estimate, hll_registers, hll_sql

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50_000, 200_000)  # ~49.2k distinct, heavy dups
    t = pa.table({"k": pa.array(keys, pa.int64())})
    got = hll_registers(rd.from_arrow(t), "k", p=12, salt=3) \
        .to_pandas().sort_values("register").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(hll_sql("t", "k", p=12, salt=3)).fetch_df() \
        .sort_values("register").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    true_d = len(np.unique(keys))
    est = hll_estimate(got["register"].to_numpy(), got["rho"].to_numpy(), p=12)
    assert abs(est - true_d) / true_d < 0.05  # ~1.6% std error at p=12

    # merge property: sketch of two halves merged by max == full sketch
    h1 = hll_registers(rd.from_arrow(t.slice(0, 100_000)), "k", p=12, salt=3) \
        .to_pandas()
    h2 = hll_registers(rd.from_arrow(t.slice(100_000)), "k", p=12, salt=3) \
        .to_pandas()
    merged = pd.concat([h1, h2]).groupby("register", as_index=False)["rho"] \
        .max().sort_values("register").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, got, check_dtype=False)


def test_cms_counts_match_duckdb_and_bounds(ray_session):
    """Engine CMS counter table == the pure-SQL twin; point estimates
    are never below the true count and exact for uncollided keys."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.sketches import cms_counts, cms_estimate, cms_sql

    rng = np.random.default_rng(11)
    # zipf-ish: key i appears ~ 1/(i+1) — heavy hitters + long tail
    keys = np.repeat(np.arange(300), (2000 / np.arange(1, 301)).astype(int))
    rng.shuffle(keys)
    t = pa.table({"k": pa.array(keys, pa.int64())})
    got = cms_counts(rd.from_arrow(t), "k", depth=4, width=512, salt=5) \
        .to_pandas().sort_values(["depth", "col"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(cms_sql("t", "k", depth=4, width=512, salt=5)) \
        .fetch_df().sort_values(["depth", "col"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    uniq, true_cnt = np.unique(keys, return_counts=True)
    est = cms_estimate(got["depth"].to_numpy(), got["col"].to_numpy(),
                       got["cnt"].to_numpy(), uniq, depth=4, width=512,
                       salt=5)
    assert (est >= true_cnt).all()          # CMS never undercounts
    assert np.median(est - true_cnt) <= 32  # d=4 keeps collisions modest


def test_hll_grouped_matches_duckdb(ray_session):
    """Per-group HLL over a planted (group, key) stream == the pure-SQL
    twin; per-group estimates track per-group distinct counts."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.sketches import (hll_estimate, hll_group_sql,
                                         hll_registers_by_group)

    rng = np.random.default_rng(3)
    n = 120_000
    grp = rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1]).astype(object)
    # distinct universes differ by group: ~30k / ~3k / ~300
    key = np.where(grp == "a", rng.integers(0, 30_000, n),
                   np.where(grp == "b", rng.integers(0, 3_000, n),
                            rng.integers(0, 300, n)))
    grp[rng.random(n) < 0.01] = None  # null keys = one group (convention)
    t = pa.table({"g": pa.array(grp), "k": pa.array(key, pa.int64())})
    got = hll_registers_by_group(rd.from_arrow(t), "k", "g", p=12, salt=9) \
        .to_pandas().sort_values(["g", "register"]).reset_index(drop=True)
    assert got["g"].isna().any()      # the null group is present
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(hll_group_sql("t", "k", "g", p=12, salt=9)).fetch_df() \
        .sort_values(["g", "register"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "register", "rho"]], exp,
                                  check_dtype=False)
    for g in ("a", "b", "c"):
        sub = got[got["g"] == g]
        true_d = len(np.unique(key[grp == g]))
        est = hll_estimate(sub["register"].to_numpy(),
                           sub["rho"].to_numpy(), p=12)
        assert abs(est - true_d) / true_d < 0.06, (g, est, true_d)


def test_qsketch_rejects_nulls(ray_session):
    """Out-of-contract null input must fail loudly, not corrupt bucket 0
    (NaN -> int64 is undefined; the SQL twin propagates NULL instead)."""
    import ray.data as rd

    from pttcrawler_ray.sketches import (qsketch_counts,
                                         qsketch_counts_by_group)

    ds = rd.from_arrow(pa.table({
        "v": pa.array([1, None, 5], pa.int64()),
        "g": pa.array(["a", "b", "a"], pa.string())}))
    with pytest.raises(Exception, match="null"):
        qsketch_counts(ds, "v").to_pandas()
    with pytest.raises(Exception, match="null"):
        qsketch_counts_by_group(ds, "v", "g").to_pandas()


def test_qsketch_bucket_decode_and_error_bound():
    """Every non-negative int64 lands inside its decoded [lo, hi] bucket
    range; bucket indices are monotone in the value; the width obeys the
    2**-sub_bits relative-error guarantee — incl. 0, the exact region,
    power-of-two edges, and values near 2**62."""
    from pttcrawler_ray.sketches import qsketch_bounds, qsketch_bucket

    k = 7
    edges = [0, 1, 2, 127, 128, 129, 255, 256, 257, 65535, 65536,
             (1 << 40) - 1, 1 << 40, (1 << 62) + 12345]
    rng = np.random.default_rng(11)
    v = np.r_[edges, rng.integers(0, 1 << 50, 5000)].astype(np.int64)
    b = qsketch_bucket(v, k)
    lo, hi = qsketch_bounds(b, k)
    assert np.all((lo <= v) & (v <= hi))
    assert np.all(hi[v > 0] <= lo[v > 0] * (1 + 2.0 ** -k) + 1)
    order = np.argsort(v, kind="stable")
    assert np.all(np.diff(b[order]) >= 0)          # monotone
    assert np.all(b[v < (1 << (k + 1))] == v[v < (1 << (k + 1))])  # exact region


def test_qsketch_matches_duckdb_order_invariant_and_quantiles(ray_session):
    """Engine quantile-sketch table == the pure-SQL twin on a skewed
    stream; the table is identical under a different partitioning (order
    invariance = the mergeability contract); quantile readouts are
    within the guaranteed relative error of numpy's exact answer."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.sketches import (qsketch_counts, qsketch_quantiles,
                                         qsketch_sql)

    rng = np.random.default_rng(5)
    vals = np.r_[rng.lognormal(8, 2, 120_000).astype(np.int64),
                 np.zeros(500, np.int64), np.arange(300)].astype(np.int64)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    got = qsketch_counts(rd.from_arrow(t), "v", sub_bits=7) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(qsketch_sql("t", "v", sub_bits=7)).fetch_df() \
        .sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # order invariance: a different block layout yields the same table
    re = qsketch_counts(rd.from_arrow(t).repartition(13), "v", sub_bits=7) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(re, got, check_dtype=False)

    qs = [0.1, 0.5, 0.9, 0.99]
    est = qsketch_quantiles(got["bucket"].to_numpy(), got["cnt"].to_numpy(),
                            qs, sub_bits=7)
    srt = np.sort(vals)
    for q, e in zip(qs, est):
        true = srt[int(q * (len(srt) - 1))]
        assert e <= true <= e * (1 + 2.0 ** -7) + 1, (q, e, true)


def test_qsketch_grouped_matches_duckdb_and_sequential(ray_session):
    """Grouped quantile sketch == the SQL twin AND == a per-group
    sequential rebuild (the bkey shuffle cannot merge or drop groups)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.sketches import (qsketch_bucket,
                                         qsketch_counts_by_group,
                                         qsketch_group_sql)

    rng = np.random.default_rng(17)
    n = 90_000
    grp = rng.choice(["a", "b", "c", "d"], n).astype(object)
    grp[rng.random(n) < 0.02] = None   # null keys = one group (convention)
    val = rng.lognormal(6, 3, n).astype(np.int64)
    t = pa.table({"g": pa.array(grp), "v": pa.array(val, pa.int64())})
    got = qsketch_counts_by_group(rd.from_arrow(t), "v", "g", sub_bits=7) \
        .to_pandas().sort_values(["g", "bucket"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(qsketch_group_sql("t", "v", "g", sub_bits=7)).fetch_df() \
        .sort_values(["g", "bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "bucket", "cnt"]], exp,
                                  check_dtype=False)
    assert got["g"].isna().any()      # the null group is present

    for g in "abcd":
        sub = got[got["g"] == g]
        seq = pd.Series(qsketch_bucket(val[grp == g], 7)).value_counts() \
            .sort_index()
        assert sub["bucket"].tolist() == seq.index.tolist()
        assert sub["cnt"].tolist() == seq.values.tolist()


def test_pagerank_matches_duckdb_and_semantics(ray_session):
    """pagerank == the chained-CTE integer fixed-point twin on a planted
    graph; a hub pointed at by everything outranks leaf nodes."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.graph import pagerank, pagerank_sql

    # star into node 0 + a 2-cycle + a dangling sink, with multi-edges
    src = [1, 2, 3, 4, 5, 1, 2, 2, 0]
    dst = [0, 0, 0, 0, 0, 2, 1, 1, 6]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    got = pagerank(rd.from_arrow(t), iters=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.register("e", t)
    exp = con.execute(pagerank_sql("SELECT src, dst FROM e", iters=4)) \
        .fetch_df().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    r = dict(zip(got["node"], got["rank_fp"]))
    assert r[0] > r[3] and r[6] > r[3]  # hub & hub-fed sink beat a leaf
    assert min(r.values()) > 0          # teleport keeps everyone positive
    assert sum(r.values()) <= 10 ** 9   # mass only leaks (dangling spec)

    # at-scale plan: force the co-partition rank join — bit-identical
    got2 = pagerank(rd.from_arrow(t), iters=4, node_bcast_max=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, got)


def test_random_walks_match_duckdb_and_semantics(ray_session):
    """Deterministic walks == the chained-CTE twin; dangling nodes stop
    a walk early; choices actually follow the documented hash."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.graph import (_walk_choice, random_walks,
                                      random_walks_sql)

    # 0 -> {1, 2}; 1 -> {0}; 2 is dangling; dup edge must collapse
    t = pa.table({"src": pa.array([0, 0, 1, 0], pa.int64()),
                  "dst": pa.array([1, 2, 0, 1], pa.int64())})
    got = random_walks(rd.from_arrow(t), walk_len=3, salt=5).to_pandas() \
        .sort_values(["walk_id", "step"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("e", t)
    exp = con.execute(random_walks_sql("SELECT src, dst FROM e",
                                       walk_len=3, salt=5)).fetch_df() \
        .sort_values(["walk_id", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # step-0 rows are the start nodes with out-edges (not the dangler)
    starts = set(got.loc[got["step"] == 0, "node"])
    assert starts == {0, 1}
    # replay walk 0's first choice by hand
    h = _walk_choice(np.array([0], np.int64), np.array([0], np.int64),
                     0, 5)[0]
    first = [1, 2][int(h % np.uint64(2))]
    w0 = got[(got["walk_id"] == 0) & (got["step"] == 1)]["node"].iloc[0]
    assert w0 == first
    # a walk reaching the dangler has no further steps
    for wid, g in got.groupby("walk_id"):
        nodes = g.sort_values("step")["node"].tolist()
        if 2 in nodes:
            assert nodes.index(2) == len(nodes) - 1


def test_random_walks_copartition_plan_parity(ray_session):
    """The beyond-broadcast co-partition plan (edge_bcast_max=0) must be
    row-identical to the broadcast-CSR plan on a graph with dup edges,
    danglers, multi-neighbor fanout, and enough nodes to spread over
    partitions."""
    import pandas as pd
    import ray.data as rd

    from pttcrawler_ray.graph import random_walks

    rng = np.random.default_rng(11)
    n = 400
    src = rng.integers(0, n, 3000)
    dst = rng.integers(0, n + 40, 3000)  # nodes n..n+39 are danglers
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    a = random_walks(rd.from_arrow(t), walk_len=4, salt=9).to_pandas() \
        .sort_values(["walk_id", "step"]).reset_index(drop=True)
    b = random_walks(rd.from_arrow(t), walk_len=4, salt=9,
                     edge_bcast_max=0).to_pandas() \
        .sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert len(a) > n  # walks actually advanced
    pd.testing.assert_frame_equal(a, b)
