"""Distributed PageRank over an edge Dataset — the canonical web-graph
rank op (Page et al. 1999), in EXACT integer fixed-point so the
distributed sums are order-free and the pure-SQL twin is bit-equal.

Determinism spec (what :func:`pagerank_sql` replays):

- the graph is a MULTIGRAPH: every edge row contributes (no distinct);
  out-degree counts edge rows per ``src``;
- ranks are int64 fixed-point at ``SCALE = 10^9``:
  ``r0 = SCALE // n_nodes`` for every node;
- one iteration, all floor/integer arithmetic::

      contrib(dst) = sum over in-edges of  r(src) // outdeg(src)
      r'(node)     = TELEPORT + (85 * contrib(node)) // 100
      TELEPORT     = (15 * (SCALE // n_nodes)) // 100

  (the classic 0.85 damping as exact integer ops; dangling-node mass
  leaks, the standard simplified variant — documented, mirrored in
  SQL);
- integer sums are associative and order-free, so ANY partitioning of
  the groupby produces the identical result — this is what lets an
  iterative float algorithm become driver-checkable.

Scale shape — two plans, bit-identical results (pinned by test):

- **broadcast plan** (node count <= ``node_bcast_max``, the repo's
  adaptive small-side convention): the rank vector is ``ray.put`` once
  per iteration (aligned to a sorted node array), each edge batch
  resolves ranks with one ``searchsorted`` — NO join shuffle — and the
  only exchange per iteration is the single-key int64 ``groupby.sum``
  of contributions; the bounded contrib table returns to the driver
  (explicitly within the broadcast regime, like the IpAsn dim plan).
- **co-partition plan** (huge node sets): the per-iteration rank join
  rides the tagged-union co-partition pattern (rank rows and edge rows
  hash-partition by ``src`` together; each partition resolves ranks
  with one vectorized ``searchsorted``), contributions reduce via the
  same single-key ``groupby.sum``, and nothing node- or edge-sized
  touches the driver.

In both plans the teleport-only rows (nodes with NO in-edges) are
constant across iterations, so they are computed once and unioned in —
never re-shuffled.  Rounds materialize once each, exactly like
``textops.dedup.connected_components``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

SCALE = 10 ** 9
_DAMP_NUM, _DAMP_DEN = 85, 100


def _prep_edges(edges: "rd.Dataset", n_buckets: int) -> "rd.Dataset":
    """(src, dst, d): every edge row with its src out-degree pre-joined
    (one co-partition by src, done once)."""
    from .util.rayops import partitioned_map_groups

    deg = edges.groupby("src").count()

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"].cast(pa.int64()),
                         "dst": t["dst"].cast(pa.int64()),
                         "d": pa.nulls(len(t), pa.int64())})

    def tag_deg(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"].cast(pa.int64()),
                         "dst": pa.nulls(len(t), pa.int64()),
                         "d": t["count()"].cast(pa.int64())})

    union = edges.map_batches(tag_edge, batch_format="pyarrow").union(
        deg.map_batches(tag_deg, batch_format="pyarrow"))

    def join_deg(g: pa.Table) -> pa.Table:
        is_deg = pc.is_valid(g["d"])
        drows = g.filter(is_deg)
        erows = g.filter(pc.invert(is_deg))
        dsrc = drows["src"].to_numpy(zero_copy_only=False)
        dval = drows["d"].to_numpy(zero_copy_only=False)
        order = np.argsort(dsrc, kind="stable")
        dsrc, dval = dsrc[order], dval[order]
        esrc = erows["src"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dsrc, esrc)
        return pa.table({"src": erows["src"], "dst": erows["dst"],
                         "d": pa.array(dval[pos], pa.int64())})

    return partitioned_map_groups(union, "src", join_deg,
                                  n_parts=n_buckets)


def _contrib_bcast_batch(t: pa.Table, *, node_ref, rank_ref,
                         deg_ref) -> pa.Table:
    """Per-batch PARTIAL contribution sums (the repo's combiner-first
    move): ranks AND out-degrees resolve from broadcast arrays aligned
    to the sorted node array, and the batch collapses to one row per
    distinct dst BEFORE the shuffle — integer sums, order-free."""
    from .util.rayops import bcast_get

    node_sorted = bcast_get(node_ref)
    rank_arr = bcast_get(rank_ref)
    deg_arr = bcast_get(deg_ref)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(node_sorted, src)
    contrib = rank_arr[pos] // deg_arr[pos]
    ud, codes = np.unique(dst, return_inverse=True)
    sums = np.zeros(ud.size, np.int64)
    np.add.at(sums, codes, contrib)
    return pa.table({"dst": pa.array(ud, pa.int64()),
                     "contrib": pa.array(sums, pa.int64())})


def _node_partial_batch(t: pa.Table) -> pa.Table:
    node = np.concatenate([
        t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)])
    return pa.table({"node": pa.array(np.unique(node), pa.int64())})


def _node_deg_partial_batch(t: pa.Table) -> pa.Table:
    """One row per batch-distinct node with its batch out-count (0 for
    dst-only nodes) — the setup partial the broadcast plan merges
    driver-side instead of paying two distributed groupbys."""
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    node = np.concatenate([src, dst])
    u, inv = np.unique(node, return_inverse=True)
    cnt = np.zeros(u.size, np.int64)
    np.add.at(cnt, inv[: src.size], 1)
    return pa.table({"node": pa.array(u, pa.int64()),
                     "cnt": pa.array(cnt, pa.int64())})


def pagerank(edges: "rd.Dataset", iters: int = 4,
             node_bcast_max: int = 5_000_000) -> "rd.Dataset":
    """(node, rank_fp) after ``iters`` exact fixed-point iterations over
    ``(src, dst)`` edge rows."""
    import ray

    from .util.rayops import normalize_blocks, partitioned_map_groups

    edges = normalize_blocks(edges.materialize())
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank_fp": pa.array([], pa.int64())}))
    n_buckets = max(1, min(64, n_edges // 500_000 + 1))

    # --- setup: node universe + out-degrees --------------------------------
    # small-edge fast path: ONE streaming partial pass, merged driver-side
    # (bounded: partial rows <= 2x edges <= 10M); big graphs pay the
    # distributed groupby instead
    if n_edges <= 5_000_000:
        parts = edges.map_batches(_node_deg_partial_batch,
                                  batch_format="pyarrow").to_pandas()
        node_sorted, inv = np.unique(parts["node"].to_numpy(np.int64),
                                     return_inverse=True)
        n_nodes = node_sorted.size
        deg_arr = np.zeros(n_nodes, np.int64)
        np.add.at(deg_arr, inv, parts["cnt"].to_numpy(np.int64))
        nodes = None
    else:
        nodes = edges.map_batches(  # per-batch unique partial, then distinct
            _node_partial_batch,
            batch_format="pyarrow").groupby("node").count().select_columns(
                ["node"]).materialize()
        n_nodes = nodes.count()
        node_sorted = deg_arr = None
    r0 = SCALE // n_nodes
    teleport = (15 * r0) // 100

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum(contrib)"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": t["dst"].cast(pa.int64()),
            "rank_fp": pa.array(teleport + (_DAMP_NUM * s) // _DAMP_DEN,
                                pa.int64())})

    if n_nodes <= node_bcast_max:
        # broadcast plan: rank AND out-degree vectors aligned to a sorted
        # node array, shipped via the object store; per iteration the
        # per-batch PARTIAL contribution sums (blocks x distinct-dst
        # rows, bounded by the regime) merge driver-side with integer
        # add.at — the same value as the distributed groupby.sum, no
        # exchange at all
        if node_sorted is None:
            node_sorted = np.sort(
                nodes.to_pandas()["node"].to_numpy(np.int64))
            deg_pd = edges.groupby("src").count().to_pandas()
            deg_arr = np.zeros(n_nodes, np.int64)
            deg_arr[np.searchsorted(
                node_sorted, deg_pd["src"].to_numpy(np.int64))] = \
                deg_pd["count()"].to_numpy(np.int64)
        deg_arr = np.maximum(deg_arr, 1)  # non-src rows never divide
        node_ref = ray.put(node_sorted)
        deg_ref = ray.put(deg_arr)
        rank_arr = np.full(n_nodes, r0, np.int64)
        for _ in range(iters):
            rank_ref = ray.put(rank_arr)
            cparts = edges.map_batches(
                _contrib_bcast_batch,
                fn_kwargs={"node_ref": node_ref, "rank_ref": rank_ref,
                           "deg_ref": deg_ref},
                batch_format="pyarrow").to_pandas()
            sums = np.zeros(n_nodes, np.int64)
            np.add.at(sums, np.searchsorted(
                node_sorted, cparts["dst"].to_numpy(np.int64)),
                cparts["contrib"].to_numpy(np.int64))
            # zero-contrib nodes land exactly on the teleport floor
            rank_arr = teleport + (_DAMP_NUM * sums) // _DAMP_DEN
        return rd.from_arrow(pa.table({
            "node": pa.array(node_sorted, pa.int64()),
            "rank_fp": pa.array(rank_arr, pa.int64())}))
    if nodes is None:  # tiny edges but a forced co-partition plan (tests)
        nodes = rd.from_arrow(pa.table({"node": pa.array(node_sorted,
                                                         pa.int64())}))

    edges_deg = normalize_blocks(_prep_edges(edges, n_buckets).materialize())

    # nodes with NO in-edges keep rank == teleport after iteration 1 and
    # forever: computed once, unioned in, never re-shuffled.  (Every node
    # WITH in-edges gets a contrib row each iteration — all srcs rank.)
    in_nodes = edges_deg.groupby("dst").count().map_batches(
        lambda t: pa.table({"node": t["dst"].cast(pa.int64()),
                            "flag": pa.array(np.ones(len(t), np.int8))}),
        batch_format="pyarrow")

    def only_nodes(g: pa.Table) -> pa.Table:
        flags = pc.is_valid(g["flag"])
        node = g["node"].to_numpy(zero_copy_only=False)
        flagged = np.unique(node[flags.to_numpy(zero_copy_only=False)])
        keep = ~np.isin(node, flagged)
        keep &= ~flags.to_numpy(zero_copy_only=False)
        out = np.unique(node[keep])
        return pa.table({
            "node": pa.array(out, pa.int64()),
            "rank_fp": pa.array(np.full(out.size, teleport, np.int64),
                                pa.int64())})

    tele_union = nodes.map_batches(
        lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                            "flag": pa.nulls(len(t), pa.int8())}),
        batch_format="pyarrow").union(in_nodes)
    tele_rows = partitioned_map_groups(tele_union, "node", only_nodes,
                                       n_parts=n_buckets).materialize()

    # co-partition plan: rank rows join edge rows by src in one
    # tagged-union shuffle per iteration; nothing node-sized on the driver
    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"], "dst": t["dst"], "d": t["d"],
                         "r": pa.nulls(len(t), pa.int64())})

    def tag_rank(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["node"].cast(pa.int64()),
                         "dst": pa.nulls(len(t), pa.int64()),
                         "d": pa.nulls(len(t), pa.int64()),
                         "r": t["rank_fp"].cast(pa.int64())})

    def contrib_rows(g: pa.Table) -> pa.Table:
        is_rank = pc.is_valid(g["r"])
        rrows = g.filter(is_rank)
        erows = g.filter(pc.invert(is_rank))
        if not len(erows):
            return pa.table({"dst": pa.array([], pa.int64()),
                             "contrib": pa.array([], pa.int64())})
        rsrc = rrows["src"].to_numpy(zero_copy_only=False)
        rval = rrows["r"].to_numpy(zero_copy_only=False)
        order = np.argsort(rsrc, kind="stable")
        rsrc, rval = rsrc[order], rval[order]
        esrc = erows["src"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rsrc, esrc)
        d = erows["d"].to_numpy(zero_copy_only=False)
        contrib = rval[pos] // d
        # per-partition partial sums: collapse to one row per distinct
        # dst before the groupby exchange
        dst = erows["dst"].to_numpy(zero_copy_only=False)
        ud, codes = np.unique(dst, return_inverse=True)
        sums = np.zeros(ud.size, np.int64)
        np.add.at(sums, codes, contrib)
        return pa.table({
            "dst": pa.array(ud, pa.int64()),
            "contrib": pa.array(sums, pa.int64()),
        })

    ranks = nodes.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "rank_fp": pa.array(
                                np.full(len(t), r0, np.int64), pa.int64())}),
        batch_format="pyarrow").materialize()
    for _ in range(iters):
        both = edges_deg.map_batches(tag_edge, batch_format="pyarrow").union(
            ranks.map_batches(tag_rank, batch_format="pyarrow"))
        contribs = partitioned_map_groups(both, "src", contrib_rows,
                                          n_parts=n_buckets) \
            .groupby("dst").sum("contrib") \
            .map_batches(finish, batch_format="pyarrow")
        ranks = normalize_blocks(
            contribs.union(tele_rows).materialize())
    return ranks


def pagerank_sql(edges_sql: str, iters: int = 4) -> str:
    """DuckDB twin of :func:`pagerank` — the identical integer
    fixed-point recurrence unrolled as chained CTEs.  ``edges_sql`` must
    select ``(src, dst)``."""
    n_expr = "(SELECT n FROM params)"
    tele = f"(15 * ({SCALE} // {n_expr})) // 100"
    ctes = [f"edges AS ({edges_sql})",
            "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d "
            "FROM edges GROUP BY src)",
            "nodes AS (SELECT DISTINCT n FROM (SELECT src AS n FROM edges "
            "UNION ALL SELECT dst FROM edges))",
            "params AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
            f"r0 AS (SELECT n, CAST({SCALE} // {n_expr} AS BIGINT) AS r "
            f"FROM nodes)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS n, "
            f"CAST(sum(r.r // d.d) AS BIGINT) AS s "
            f"FROM edges e JOIN r{i - 1} r ON e.src = r.n "
            f"JOIN deg d ON e.src = d.src GROUP BY e.dst)")
        ctes.append(
            f"r{i} AS (SELECT nodes.n, "
            f"CAST({tele} + ({_DAMP_NUM} * COALESCE(c{i}.s, 0)) "
            f"// {_DAMP_DEN} AS BIGINT) AS r "
            f"FROM nodes LEFT JOIN c{i} ON nodes.n = c{i}.n)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT n AS node, r AS rank_fp FROM r{iters}")


# --------------------------------------------------------------------------
# deterministic random walks (DeepWalk-style corpus generation)
# --------------------------------------------------------------------------
_WALK_C1 = 1000003  # step stride inside the choice hash


def _walk_choice(v: np.ndarray, w: np.ndarray, t: int,
                 salt: int) -> np.ndarray:
    """The walk's edge-choice hash — a pure function of (node, walk,
    step): ``splitmix64(splitmix64(v + salt + t*C1) XOR w)``.  The SQL
    twin composes the identical nested expression."""
    from .textops.sampling import splitmix64 as _smx

    inner = _smx(v.astype(np.uint64)
                 + np.uint64(salt + t * _WALK_C1))
    return _smx(inner ^ w.astype(np.uint64))


def _ranked_edges_part(g: pa.Table) -> pa.Table:
    """Per-partition distinct (src, dst) with per-src neighbor rank (dst
    ASC) and out-degree — all rows of a src co-locate, so dedup/rank/deg
    are exact partition-locally (vectorized run ops)."""
    src = g["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = g["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    keep = np.ones(s.size, bool)
    keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
    s, d = s[keep], d[keep]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]]) if s.size else \
        np.array([], np.int64)
    runlen = np.diff(np.r_[starts, s.size])
    rnk = np.arange(s.size, dtype=np.int64) - np.repeat(starts, runlen)
    deg = np.repeat(runlen, runlen)
    return pa.table({"src": pa.array(s, pa.int64()),
                     "dst": pa.array(d, pa.int64()),
                     "deg": pa.array(deg, pa.int64()),
                     "rnk": pa.array(rnk, pa.int64())})


def random_walks(edges: "rd.Dataset", walk_len: int = 4, salt: int = 0,
                 edge_bcast_max: int = 5_000_000):
    """(walk_id, step, node) rows: one deterministic walk per node with
    out-edges, ``walk_len`` steps (a walk stops early at a dangling
    node).  Step semantics (what :func:`random_walks_sql` replays):

    - the graph is the DISTINCT (src, dst) edge set; v's out-neighbors
      are ordered dst ASC and the walk at step t takes neighbor
      ``choice_hash(v, walk, t) % outdeg(v)``;
    - walk_id = the start node.

    Scale shape — two plans, bit-identical results (pinned by test,
    the pagerank adaptive split):

    - **broadcast plan** (edge rows <= ``edge_bcast_max``): the distinct
      edge set's CSR arrays (sorted src offsets + dst) broadcast once;
      each step is ONE stateless map over the walk frontier, no shuffle
      anywhere.
    - **co-partition plan** (beyond-broadcast topology): ranked distinct
      edges are built by ONE coarse hash partition by src (all rows of a
      src co-locate), and each step tags frontier rows into the SAME
      src-hash partitioning as the edge rows — a partition-local CSR
      resolves the choice; nothing edge- or node-sized ever sits on the
      driver."""
    import ray

    from .util.rayops import (bcast_get, normalize_blocks,
                              partitioned_map_groups)

    edges = normalize_blocks(edges.materialize())
    n_edges = edges.count()

    def step_col(ds, t):
        return ds.map_batches(
            lambda b, _t=t: b.append_column("step", pa.array(
                np.full(len(b), _t, np.int64), pa.int64())),
            batch_format="pyarrow")

    if n_edges <= edge_bcast_max:
        # distinct edges -> CSR (driver-side, within the broadcast regime)
        epd = edges.to_pandas().drop_duplicates(["src", "dst"]) \
            .sort_values(["src", "dst"])
        src = epd["src"].to_numpy(np.int64)
        dst = epd["dst"].to_numpy(np.int64)
        usrc, starts_idx = np.unique(src, return_index=True)
        offs = np.r_[starts_idx, src.size]
        usrc_ref = ray.put(usrc)
        offs_ref = ray.put(offs)
        dst_ref = ray.put(dst)

        frontier = rd.from_arrow(pa.table({
            "walk_id": pa.array(usrc, pa.int64()),
            "node": pa.array(usrc, pa.int64())}))

        def step_fn(t: int):
            def advance(b: pa.Table) -> pa.Table:
                us = bcast_get(usrc_ref)
                of = bcast_get(offs_ref)
                dv = bcast_get(dst_ref)
                v = b["node"].to_numpy(zero_copy_only=False)
                w = b["walk_id"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(us, v)
                pos_c = np.minimum(pos, us.size - 1)
                alive = us[pos_c] == v      # dangling nodes stop the walk
                deg = of[pos_c + 1] - of[pos_c]
                h = _walk_choice(v, w, t, salt)
                r = (h % np.maximum(deg, 1).astype(np.uint64)) \
                    .astype(np.int64)
                nxt = dv[of[pos_c] + r]
                keep = pa.array(alive)
                return pa.table({
                    "walk_id": b["walk_id"].filter(keep),
                    "node": pa.array(nxt[alive], pa.int64())})
            return advance

        out = [step_col(frontier, 0)]
        cur = frontier
        for t in range(walk_len):
            cur = cur.map_batches(step_fn(t), batch_format="pyarrow") \
                .materialize()
            out.append(step_col(cur, t + 1))
        res = out[0]
        for o in out[1:]:
            res = res.union(o)
        return res.select_columns(["walk_id", "step", "node"])

    # ---- co-partition plan -----------------------------------------------
    n_buckets = max(1, min(64, n_edges // 500_000 + 1))
    edges_r = normalize_blocks(partitioned_map_groups(
        edges.map_batches(
            lambda t: pa.table({"src": t["src"].cast(pa.int64()),
                                "dst": t["dst"].cast(pa.int64())}),
            batch_format="pyarrow"),
        "src", _ranked_edges_part, n_parts=n_buckets).materialize())

    frontier = edges_r.map_batches(
        lambda t: pa.table(
            {"walk_id": t.filter(pc.equal(t["rnk"], 0))["src"],
             "node": t.filter(pc.equal(t["rnk"], 0))["src"]}),
        batch_format="pyarrow").materialize()

    def tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["src"], "dst": t["dst"],
                         "rnk": t["rnk"],
                         "walk": pa.nulls(len(t), pa.int64())})

    def tag_frontier(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["node"].cast(pa.int64()),
                         "dst": pa.nulls(len(t), pa.int64()),
                         "rnk": pa.nulls(len(t), pa.int64()),
                         "walk": t["walk_id"].cast(pa.int64())})

    def advance_part(t: int):
        def advance(g: pa.Table) -> pa.Table:
            is_f = pc.is_valid(g["walk"])
            e = g.filter(pc.invert(is_f))
            f = g.filter(is_f)
            empty = pa.table({"walk_id": pa.array([], pa.int64()),
                              "node": pa.array([], pa.int64())})
            if not len(f) or not len(e):
                return empty  # no walks here, or all-dangling partition
            es = e["key"].to_numpy(zero_copy_only=False)
            ernk = e["rnk"].to_numpy(zero_copy_only=False)
            edst = e["dst"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ernk, es))
            es, edst = es[order], edst[order]
            usrc, sidx = np.unique(es, return_index=True)
            offs = np.r_[sidx, es.size]
            v = f["key"].to_numpy(zero_copy_only=False)
            w = f["walk"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(usrc, v)
            pos_c = np.minimum(pos, usrc.size - 1)
            alive = usrc[pos_c] == v
            deg = offs[pos_c + 1] - offs[pos_c]
            h = _walk_choice(v, w, t, salt)
            r = (h % np.maximum(deg, 1).astype(np.uint64)).astype(np.int64)
            nxt = edst[offs[pos_c] + r]
            return pa.table({
                "walk_id": pa.array(w[alive], pa.int64()),
                "node": pa.array(nxt[alive], pa.int64())})
        return advance

    edges_tagged = edges_r.map_batches(tag_edge, batch_format="pyarrow")
    out = [step_col(frontier, 0)]
    cur = frontier
    for t in range(walk_len):
        both = edges_tagged.union(
            cur.map_batches(tag_frontier, batch_format="pyarrow"))
        cur = partitioned_map_groups(both, "key", advance_part(t),
                                     n_parts=n_buckets).materialize()
        out.append(step_col(cur, t + 1))
    res = out[0]
    for o in out[1:]:
        res = res.union(o)
    return res.select_columns(["walk_id", "step", "node"])


def random_walks_sql(edges_sql: str, walk_len: int = 4,
                     salt: int = 0) -> str:
    """DuckDB twin of :func:`random_walks` — ranked distinct neighbors +
    one chained CTE per step with the identical nested splitmix64
    choice expression."""
    from .textops.sampling import splitmix64_sql

    def choice(walk_col: str, node_col: str, t: int) -> str:
        inner = splitmix64_sql(
            f"({node_col})::HUGEINT + {salt + t * _WALK_C1}")
        outer = splitmix64_sql(
            f"xor(({inner})::UBIGINT, ({walk_col})::UBIGINT)::HUGEINT")
        return outer

    ctes = [f"edges_d AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
            "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d "
            "FROM edges_d GROUP BY src)",
            "ranked AS (SELECT src, dst, CAST(row_number() OVER ("
            "PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS rnk "
            "FROM edges_d)",
            "w0 AS (SELECT src AS walk_id, src AS node FROM deg)"]
    for t in range(walk_len):
        ch = choice("w.walk_id", "w.node", t)
        ctes.append(
            f"w{t + 1} AS (SELECT w.walk_id, r.dst AS node "
            f"FROM w{t} w JOIN deg d ON w.node = d.src "
            f"JOIN ranked r ON r.src = w.node "
            f"AND r.rnk = CAST(({ch}) % d.d::UBIGINT AS BIGINT))")
    selects = [f"SELECT walk_id, {t} AS step, node FROM w{t}"
               for t in range(walk_len + 1)]
    return "WITH " + ",\n".join(ctes) + "\n" + " UNION ALL ".join(selects)
