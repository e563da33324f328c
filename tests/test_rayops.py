"""Direct tests for the coarse-partition group helpers in util.rayops.

``grouped_topk`` / ``partitioned_map_groups`` replace every per-distinct-key
``groupby().map_groups`` in the repo; these tests pin their semantics
against a pandas reference on multi-block inputs (so the pre-shuffle
combiner actually runs across block boundaries)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from pttcrawler_ray.util.rayops import grouped_topk, partitioned_map_groups


def _events(n=5_000, n_keys=137, seed=7, string_keys=False):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n)
    df = pd.DataFrame({
        "key": [f"user-{k}" for k in keys] if string_keys else keys.astype("int64"),
        "ts": rng.integers(0, 10_000, n).astype("int64"),
        "uid": np.arange(n, dtype="int64"),  # total tiebreak
    })
    return df


@pytest.mark.parametrize("k", [1, 3])
@pytest.mark.parametrize("string_keys", [False, True])
def test_grouped_topk_matches_pandas(ray_session, k, string_keys):
    df = _events(string_keys=string_keys)
    ds = rd.from_pandas(df).repartition(13)  # many blocks → combiner engages
    out = grouped_topk(ds, "key",
                       [("ts", "descending"), ("uid", "descending")],
                       k=k, n_parts=16).to_pandas()
    ref = (df.sort_values(["key", "ts", "uid"],
                          ascending=[True, False, False])
             .groupby("key").head(k))
    got = out.sort_values(["key", "ts", "uid"]).reset_index(drop=True)
    want = ref.sort_values(["key", "ts", "uid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["key", "ts", "uid"]],
                                  want[["key", "ts", "uid"]])


def test_grouped_topk_small_groups_pass_through(ray_session):
    # k larger than every group: output == input (no row invented/lost)
    df = _events(n=300, n_keys=250)
    ds = rd.from_pandas(df).repartition(7)
    out = grouped_topk(ds, "key", [("ts", "descending")], k=50,
                       n_parts=8).to_pandas()
    assert sorted(out["uid"]) == sorted(df["uid"])


def test_partitioned_map_groups_key_integrity(ray_session):
    # every distinct key must arrive WHOLE in exactly one partition call
    df = _events(n=2_000, n_keys=61)
    ds = rd.from_pandas(df).repartition(11)

    def per_partition(g: pa.Table) -> pa.Table:
        pdf = g.to_pandas()
        agg = pdf.groupby("key").agg(n=("uid", "count")).reset_index()
        return pa.table({"key": pa.array(agg["key"], pa.int64()),
                         "n": pa.array(agg["n"], pa.int64())})

    out = partitioned_map_groups(ds, "key", per_partition,
                                 n_parts=16).to_pandas()
    # one output row per key (a split key would produce duplicates)...
    assert out["key"].is_unique
    # ...and counts equal the global per-key counts
    want = df.groupby("key").size()
    got = out.set_index("key")["n"]
    assert got.sort_index().equals(want.sort_index().astype("int64"))


@pytest.mark.parametrize("string_keys", [False, True])
def test_grouped_topk_nullable_keys_one_group(ray_session, string_keys):
    # nulls in the key column must form ONE group (groupby semantics), not
    # one group per null row (NaN != NaN) — and must not trip NaN->uint64
    # conversion in the partition hash
    df = _events(n=1_200, n_keys=40, string_keys=string_keys)
    df.loc[df.index % 7 == 0, "key"] = None
    ds = rd.from_pandas(df).repartition(5)
    out = grouped_topk(ds, "key", [("ts", "descending"), ("uid", "descending")],
                       k=1, n_parts=8).to_pandas()

    want = (df.sort_values(["ts", "uid"], ascending=False)
              .groupby("key", dropna=False).head(1))
    assert len(out) == len(want)
    assert out["key"].isna().sum() == 1  # exactly one winner for the null group
    null_want = want[want["key"].isna()]["uid"].iloc[0]
    assert out[out["key"].isna()]["uid"].iloc[0] == null_want
    a = out.dropna(subset=["key"]).sort_values("uid")["uid"].tolist()
    b = want.dropna(subset=["key"]).sort_values("uid")["uid"].tolist()
    assert a == b


def test_anti_join_ids_survives_reserved_column_names(ray_session):
    # user schemas may legitimately contain columns named tag/bucket/jk —
    # the join scaffolding must not collide with them
    from pttcrawler_ray.textops.dedup import _anti_join_ids

    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype="int64"),
        "tag": np.arange(20, dtype="int64") * 10,
        "bucket": ["b"] * 20,
        "jk": np.ones(20, dtype="int64"),
    })
    drops = pd.DataFrame({"node": np.array([3, 7, 11], dtype="int64")})
    out = _anti_join_ids(rd.from_pandas(docs).repartition(3),
                         rd.from_pandas(drops)).to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(20) if i not in (3, 7, 11)]
    kept = out.sort_values("doc_id")
    assert (kept["tag"].to_numpy() == kept["doc_id"].to_numpy() * 10).all()
    assert set(out.columns) == {"doc_id", "tag", "bucket", "jk"}


def test_grouped_topk_large_int_keys_with_nulls_stay_distinct(ray_session):
    # nullable int64 keys above 2^53: the float64 to_numpy form collapses
    # 2^60 and 2^60+1 to the same value — exact int compare must not
    df = pd.DataFrame({
        "key": pd.array([2**60, 2**60, 2**60 + 1, 2**60 + 1, None, None],
                        dtype="Int64"),
        "ts": [1, 2, 1, 5, 3, 9],
        "uid": [0, 1, 2, 3, 4, 5],
    })
    ds = rd.from_pandas(df).repartition(2)
    out = grouped_topk(ds, "key", [("ts", "descending")], k=1,
                       n_parts=4).to_pandas()
    assert len(out) == 3  # 2^60, 2^60+1, null — three distinct groups
    assert sorted(out["uid"]) == [1, 3, 5]


def test_grouped_topk_nan_float_keys_one_group(ray_session):
    # GENUINE NaN keys (null_count == 0 in Arrow) must form one group too
    tbl = pa.table({
        "key": pa.array(np.array([1.5, np.nan, np.nan, 1.5, np.nan]),
                        from_pandas=False),
        "ts": pa.array([1, 2, 9, 5, 4], pa.int64()),
        "uid": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    assert tbl["key"].null_count == 0
    out = grouped_topk(rd.from_arrow(tbl), "key", [("ts", "descending")],
                       k=1, n_parts=4).to_pandas()
    assert len(out) == 2
    assert sorted(out["uid"]) == [2, 3]  # NaN group -> uid 2; 1.5 group -> uid 3


def test_parquet_grouped_topk_float_sort_column(ray_session, tmp_path):
    # payload-light fingerprints must handle float sort columns (and the
    # plans must agree) — previously crashed in hash_u64_many
    import os

    import pyarrow.parquet as pq

    from pttcrawler_ray.util.rayops import parquet_grouped_topk

    d = str(tmp_path / "store")
    os.makedirs(d)
    n = 3_000
    rng = np.random.default_rng(5)
    pq.write_table(pa.table({
        "key": pa.array((np.arange(n) % 500).astype("int64")),
        "score": pa.array(rng.random(n)),
        "payload": pa.array(["x" * 50] * n),
    }), os.path.join(d, "part-0.parquet"))
    kw = dict(k=1, probe_min_rows=1)
    a = parquet_grouped_topk(d, "key", [("score", "descending")],
                             payload_light=True, **kw).to_pandas()
    b = parquet_grouped_topk(d, "key", [("score", "descending")],
                             payload_light=False, **kw).to_pandas()
    a = a.sort_values("key").reset_index(drop=True)
    b = b.sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 500


def test_bcast_get_rejects_anonymous_transforms(ray_session):
    import functools

    import ray

    from pttcrawler_ray.util.rayops import bcast_get

    ref = ray.put({"x": 1})
    with pytest.raises(TypeError):
        bcast_get(ref, transform=lambda s: s)
    with pytest.raises(TypeError):
        bcast_get(ref, transform=functools.partial(dict))
    assert bcast_get(ref) == {"x": 1}


def test_membership_join_plans_agree(ray_session):
    # the exact bucketed membership join (scale plan) must equal the
    # broadcast key-set plan for both the semi and the anti join
    from pttcrawler_ray.relational import (customers_without_orders,
                                           orders_of_segment)

    sf = "/root/testdata/sf0.001"

    def norm(ds, cols):
        return (ds.to_pandas()[cols].sort_values(cols)
                  .reset_index(drop=True))

    a = norm(customers_without_orders(sf), ["c_custkey", "c_name"])
    b = norm(customers_without_orders(sf, distributed=True),
             ["c_custkey", "c_name"])
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0

    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    a = norm(orders_of_segment(sf), cols)
    b = norm(orders_of_segment(sf, distributed=True), cols)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_grouped_topk_nullable_timestamp_key(ray_session):
    # nullable timestamp keys ride the exact-int path (previously the
    # ""-substitution crashed on datetime64 promotion)
    tbl = pa.table({
        "key": pa.array([1_000_000, 1_000_000, None, 2_000_000, None],
                        pa.timestamp("us")),
        "ts": pa.array([1, 5, 2, 3, 9], pa.int64()),
        "uid": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    out = grouped_topk(rd.from_arrow(tbl), "key", [("ts", "descending")],
                       k=1, n_parts=4).to_pandas()
    assert len(out) == 3  # two timestamps + one null group
    assert sorted(out["uid"]) == [1, 3, 4]


def test_membership_join_null_keys_deterministic(ray_session):
    # null data keys never match: dropped by semi, kept by anti —
    # regardless of bucket count (previously NaN->uint64 UB bucketing)
    from pttcrawler_ray.util.rayops import bucketed_membership_join

    data = pa.table({
        "k": pa.array([1, 2, None, 3, None], pa.int64()),
        "v": pa.array(list("abcde")),
    })
    keys = pa.table({"key": pa.array([2, 3, None], pa.int64())})
    for buckets in (1, 2, 7):  # n_buckets override: keys genuinely split
        semi = bucketed_membership_join(
            rd.from_arrow(data), rd.from_arrow(keys), "k", "key",
            keep_members=True, n_buckets=buckets,
            carry=[("k", pa.int64()), ("v", pa.string())]).to_pandas()
        assert sorted(semi["v"]) == ["b", "d"], buckets
        anti = bucketed_membership_join(
            rd.from_arrow(data), rd.from_arrow(keys), "k", "key",
            keep_members=False, n_buckets=buckets,
            carry=[("k", pa.int64()), ("v", pa.string())]).to_pandas()
        assert sorted(anti["v"]) == ["a", "c", "e"], buckets


def test_membership_join_rejects_reserved_columns(ray_session):
    from pttcrawler_ray.util.rayops import bucketed_membership_join

    data = pa.table({"__jn_jk": pa.array([1], pa.int64()),
                     "k": pa.array([1], pa.int64())})
    keys = pa.table({"key": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        bucketed_membership_join(rd.from_arrow(data), rd.from_arrow(keys),
                                 "k", "key", keep_members=True)


from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.one_of(st.integers(min_value=-5, max_value=5), st.none())


@given(data_keys=st.lists(_keys, min_size=1, max_size=30),
       member_keys=st.lists(_keys, min_size=0, max_size=10),
       keep=st.booleans())
@settings(max_examples=8, deadline=None)
def test_membership_join_matches_pandas_reference(ray_session, data_keys,
                                                  member_keys, keep):
    # randomized parity vs the obvious pandas formulation: null keys
    # never match, duplicates preserved, both join directions
    from pttcrawler_ray.util.rayops import bucketed_membership_join

    data = pa.table({"k": pa.array(data_keys, pa.int64()),
                     "row": pa.array(range(len(data_keys)), pa.int64())})
    keys = pa.table({"key": pa.array(member_keys, pa.int64())})
    out = bucketed_membership_join(
        rd.from_arrow(data), rd.from_arrow(keys), "k", "key",
        keep_members=keep, rows_per_bucket=7,
        carry=[("k", pa.int64()), ("row", pa.int64())],
        approx_rows=len(data_keys)).to_pandas()

    members = {k for k in member_keys if k is not None}
    want = [i for i, k in enumerate(data_keys)
            if (k is not None and k in members) == keep]
    # Ray quirk: to_pandas of a 0-row Dataset drops the columns entirely
    got = sorted(out["row"]) if "row" in out.columns else []
    assert got == want


def test_normalize_blocks_caps_fragmentation_and_preserves_rows(ray_session):
    """normalize_blocks must (a) collapse an over-fragmented materialized
    dataset to ~rows/target blocks, (b) no-op on sane inputs (no extra
    shuffle), (c) preserve rows/values exactly.  This is the round-3
    fix for shuffle-seam fragmentation (one block per input block in
    sort-based groupby fan-out — see BASELINE.md dedup soak)."""
    from pttcrawler_ray.util.rayops import normalize_blocks

    df = pd.DataFrame({"x": np.arange(3_000, dtype="int64")})
    # 300 blocks of 10 rows = the pathological shape
    frag = rd.from_pandas([df.iloc[i:i + 10] for i in range(0, 3_000, 10)])
    frag = frag.materialize()
    assert frag.num_blocks() == 300
    fixed = normalize_blocks(frag, target_rows_per_block=1_000)
    assert fixed.num_blocks() <= 32  # floor(16) .. rows/target*2
    assert sorted(fixed.to_pandas()["x"]) == list(range(3_000))

    sane = rd.from_pandas(df).materialize()
    assert normalize_blocks(sane, target_rows_per_block=1_000) is sane


@given(pairs=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                      min_size=0, max_size=60),
       carry_vals=st.booleans())
@settings(max_examples=8, deadline=None)
def test_dedupe_pairs_matches_pandas(ray_session, pairs, carry_vals):
    """_dedupe_pairs == drop_duplicates on (doc_a, doc_b); carried column
    keeps the group's (identical-by-construction) value."""
    from pttcrawler_ray.textops.dedup import _dedupe_pairs

    if not pairs:
        return
    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    cols = {"doc_a": a, "doc_b": b}
    if carry_vals:
        # value is a function of the pair (as hamming/cosine are)
        cols["val"] = pa.array([p[0] * 100 + p[1] for p in pairs], pa.int64())
    ds = rd.from_arrow(pa.table(cols))
    out = _dedupe_pairs(ds, len(pairs),
                        carry=("val",) if carry_vals else ()).to_pandas()
    want = pd.DataFrame({k: v.to_pylist() for k, v in cols.items()}) \
        .drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]) \
        .reset_index(drop=True)
    got = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_list_col_matrix_matches_stack():
    from pttcrawler_ray.util.rayops import list_col_matrix

    vecs = np.random.default_rng(5).standard_normal((50, 8))
    col = pa.chunked_array([pa.array(list(vecs[:20]), pa.list_(pa.float64())),
                            pa.array(list(vecs[20:]), pa.list_(pa.float64()))])
    np.testing.assert_array_equal(list_col_matrix(col), vecs)
    # sliced offsets (non-zero start) must reshape correctly
    arr = pa.array(list(vecs), pa.list_(pa.float64())).slice(10, 30)
    np.testing.assert_array_equal(list_col_matrix(arr), vecs[10:40])
    # ragged rows fall back to the python path
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64()))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        list_col_matrix(ragged)  # np.stack raises on ragged — same as before
    assert list_col_matrix(pa.array([], pa.list_(pa.float64()))).shape == (0, 0)
    # all-empty lists: the old np.stack path gave (n, 0) — keep it
    allempty = pa.array([[], [], []], pa.list_(pa.float64()))
    assert list_col_matrix(allempty).shape == (3, 0)
