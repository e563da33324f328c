"""SemDeDup — semantic deduplication over an embedding column.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
cluster every embedding with spherical k-means, then WITHIN each cluster
order the members and drop any member whose cosine similarity to an
EARLIER member reaches the threshold — one representative survives per
semantic-duplicate group, and the pairwise work is confined to clusters
instead of the full corpus (choose ``n_clusters`` ∝ corpus size so the
per-cluster O(c²) scan stays bounded; that is the algorithm's published
cost model, not an implementation shortcut).

Determinism spec (both the engine and the sequential oracle replay it):

- members are ordered by ``(centroid_sim ASC, vec_id ASC)`` — ascending
  centroid similarity, so the surviving representative of each duplicate
  group is the LEAST prototypical member (the paper's keep-low-centroid-
  similarity choice, which preserves diversity);
- member ``i`` is dropped iff ``max_{j earlier} cos(i, j) >= threshold``
  over ALL earlier members (the released SemDeDup triangular-max form,
  which vectorizes — NOT a kept-set-dependent greedy);
- ``centroid_sim`` is computed per row with a fixed-order reduction
  (``np.einsum`` over the row, never a shape-dependent BLAS call) so two
  byte-identical vectors land in an exact tie regardless of which batch
  they arrive in, and the ``vec_id`` tiebreak decides.

Ray shape: one broadcast of the (k × dim) centroids, one assignment
``map_batches`` pass, ONE coarse-partition shuffle of the narrow
``(cluster, vec_id, centroid_sim, embedding)`` projection (clusters never
split across partitions), then a fully vectorized per-partition scan —
the repo-standard :func:`~pttcrawler_ray.util.rayops.partitioned_map_groups`
shape, with the pairwise matmul chunked so a degenerate cluster costs
time, never memory.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from ..util.rayops import bcast_get, list_col_matrix, scale_parts
from .similarity import _normalize, train_centroids, train_centroids_distributed

_OUT_SCHEMA = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64()),
                         ("kept", pa.int32())])

# per-chunk pairwise-similarity budget: chunk_rows × cluster_rows floats
_CHUNK_CELLS = 4_000_000  # ≈32 MB of float64 per chunk


def _assign_batch(batch: pa.Table, *, centroids_ref, n_parts: int,
                  id_col: str) -> pa.Table:
    """Cluster assignment + narrow shuffle projection for one batch."""
    c = centroids_ref if isinstance(centroids_ref, np.ndarray) \
        else bcast_get(centroids_ref)
    m = _normalize(list_col_matrix(batch["embedding"]))
    if m.shape[0] == 0:
        return pa.table({"part": pa.array([], pa.int32()),
                         "cluster": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "csim": pa.array([], pa.float64()),
                         "embedding": pa.array([], pa.list_(pa.float64()))})
    assign = (m @ c.T).argmax(axis=1).astype(np.int64)
    # fixed-order per-row reduction: byte-identical vectors tie EXACTLY
    # even when they arrive in different batches (see module docstring)
    csim = np.einsum("nd,nd->n", m, c[assign])
    return pa.table({
        "part": pa.array((assign % n_parts).astype(np.int32), pa.int32()),
        "cluster": pa.array(assign, pa.int64()),
        "vec_id": batch[id_col].cast(pa.int64()),
        "csim": pa.array(csim, pa.float64()),
        "embedding": batch["embedding"],
    })


def triangular_prior_max(m: np.ndarray) -> np.ndarray:
    """``out[i] = max_{j<i} m[i]·m[j]`` (rows already unit-norm, already
    in scan order); ``out[0] = -inf``.  Chunked so memory stays
    O(chunk × c) while a degenerate cluster only costs time."""
    c = m.shape[0]
    out = np.full(c, -np.inf)
    if c < 2:
        return out
    chunk = max(1, _CHUNK_CELLS // c)
    for s in range(1, c, chunk):
        e = min(s + chunk, c)
        sims = m[s:e] @ m[:e].T                      # (e-s, e)
        mask = np.arange(e)[None, :] >= np.arange(s, e)[:, None]
        sims[mask] = -np.inf
        out[s:e] = sims.max(axis=1)
    return out


def _semdedup_partition(group: pa.Table, *, threshold: float) -> pa.Table:
    """One coarse partition = several WHOLE clusters: sort once by
    (cluster, csim, vec_id), then one chunked triangular scan per
    cluster run."""
    if group.num_rows == 0:
        return _OUT_SCHEMA.empty_table()
    cluster = group["cluster"].to_numpy(zero_copy_only=False)
    ids = group["vec_id"].to_numpy(zero_copy_only=False)
    csim = group["csim"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, csim, cluster))
    cluster, ids = cluster[order], ids[order]
    m = _normalize(list_col_matrix(group["embedding"]))[order]
    kept = np.ones(len(ids), bool)
    starts = np.flatnonzero(np.r_[True, cluster[1:] != cluster[:-1]])
    ends = np.r_[starts[1:], cluster.size]
    for s, e in zip(starts, ends):
        if e - s >= 2:
            kept[s:e] = triangular_prior_max(m[s:e]) < threshold
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(cluster, pa.int64()),
                     "kept": pa.array(kept.astype(np.int32), pa.int32())})


def _rank_in_runs(starts: np.ndarray, size: int) -> np.ndarray:
    """0-based position of each element within its run."""
    out = np.arange(size, dtype=np.int64)
    run_base = np.zeros(size, np.int64)
    run_base[starts] = starts
    np.maximum.accumulate(run_base, out=run_base)
    return out - run_base


def _proto_partition(group: pa.Table, *, drop_frac: float) -> pa.Table:
    """Prototype pruning within whole clusters: order each cluster by
    (csim DESC, vec_id ASC) and drop the first floor(drop_frac × size)
    members — the MOST prototypical (closest to centroid) ones, keeping
    the diverse tail (SSL-prototypes, Sorscher et al. 2022)."""
    if group.num_rows == 0:
        return _OUT_SCHEMA.empty_table()
    cluster = group["cluster"].to_numpy(zero_copy_only=False)
    ids = group["vec_id"].to_numpy(zero_copy_only=False)
    csim = group["csim"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -csim, cluster))
    cluster, ids = cluster[order], ids[order]
    starts = np.flatnonzero(np.r_[True, cluster[1:] != cluster[:-1]])
    ends = np.r_[starts[1:], cluster.size]
    rank = _rank_in_runs(starts, cluster.size)
    sizes = (ends - starts)
    drop_n = np.floor(drop_frac * sizes).astype(np.int64)
    per_row_drop = np.repeat(drop_n, sizes)
    kept = rank >= per_row_drop
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(cluster, pa.int64()),
                     "kept": pa.array(kept.astype(np.int32), pa.int32())})


_D4_SCHEMA = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64()),
                        ("kept", pa.int32()), ("drop_stage", pa.int32())])


def _d4_partition(group: pa.Table, *, threshold: float,
                  drop_frac: float) -> pa.Table:
    """Fused D4 (Tirumala et al. 2023): the SemDeDup triangular scan,
    then prototype pruning over the SURVIVORS — one shuffle, one pass.
    ``drop_stage``: 0 kept, 1 dropped by semdedup, 2 by prototypes."""
    if group.num_rows == 0:
        return _D4_SCHEMA.empty_table()
    cluster = group["cluster"].to_numpy(zero_copy_only=False)
    ids = group["vec_id"].to_numpy(zero_copy_only=False)
    csim = group["csim"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, csim, cluster))
    cluster, ids, csim = cluster[order], ids[order], csim[order]
    m = _normalize(list_col_matrix(group["embedding"]))[order]
    stage = np.zeros(len(ids), np.int32)
    starts = np.flatnonzero(np.r_[True, cluster[1:] != cluster[:-1]])
    ends = np.r_[starts[1:], cluster.size]
    for s, e in zip(starts, ends):
        if e - s >= 2:
            dup = triangular_prior_max(m[s:e]) >= threshold
            stage[s:e][dup] = 1
        surv = np.flatnonzero(stage[s:e] == 0) + s
        n_drop = int(np.floor(drop_frac * surv.size))
        if n_drop:
            proto = surv[np.lexsort((ids[surv], -csim[surv]))[:n_drop]]
            stage[proto] = 2
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "cluster": pa.array(cluster, pa.int64()),
                     "kept": pa.array((stage == 0).astype(np.int32),
                                      pa.int32()),
                     "drop_stage": pa.array(stage, pa.int32())})


def _clustered_scan(emb_ds, partition_fn, *, n_clusters, id_col, centroids,
                    seed, distributed_train, n_parts, keep_embedding):
    """Shared plumbing: train/normalize centroids, assignment pass, ONE
    coarse cluster-partition shuffle, per-partition vectorized scan."""
    if centroids is None:
        train = (train_centroids_distributed if distributed_train
                 else train_centroids)
        centroids = train(emb_ds, n_clusters=n_clusters, seed=seed)
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    if n_parts is None:
        # size partitions to ~50 MB of shuffle payload, never more
        # partitions than clusters (empty groups emit schema-less blocks)
        row_bytes = c.shape[1] * 8 if keep_embedding else 24
        target = max(20_000, 50_000_000 // max(row_bytes, 1))
        approx = emb_ds.count()
        n_parts = min(len(c), scale_parts(approx, floor=1, target_rows=target))
    narrow = emb_ds.map_batches(
        _assign_batch,
        fn_kwargs={"centroids_ref": ray.put(c), "n_parts": n_parts,
                   "id_col": id_col},
        batch_format="pyarrow")
    if not keep_embedding:
        # scans that never look at the vectors shuffle only
        # (part, cluster, vec_id, csim) — drop BEFORE the exchange
        narrow = narrow.drop_columns(["embedding"])

    def run(g: pa.Table) -> pa.Table:
        return partition_fn(g.drop_columns(["part"]))

    return narrow.groupby("part").map_groups(run, batch_format="pyarrow")


def semdedup(emb_ds: "rd.Dataset", n_clusters: int = 16,
             threshold: float = 0.9, id_col: str = "vec_id",
             centroids: "np.ndarray | None" = None, seed: int = 7,
             distributed_train: bool = False,
             n_parts: "int | None" = None) -> "rd.Dataset":
    """Per-vector SemDeDup verdicts: ``(vec_id, cluster, kept)``.

    ``kept == 0`` rows are the semantic duplicates to drop; filter with
    ``kept == 1`` and join back to the payload by id.  Pass ``centroids``
    to reuse a trained codebook (e.g. the IVF index's), or
    ``distributed_train=True`` for the full-data Lloyd pass
    (:func:`~.similarity.train_centroids_distributed`) when the corpus
    exceeds the driver-sample regime."""
    return _clustered_scan(
        emb_ds, functools.partial(_semdedup_partition, threshold=threshold),
        n_clusters=n_clusters, id_col=id_col, centroids=centroids,
        seed=seed, distributed_train=distributed_train, n_parts=n_parts,
        keep_embedding=True)


def prototype_prune(emb_ds: "rd.Dataset", n_clusters: int = 16,
                    drop_frac: float = 0.1, id_col: str = "vec_id",
                    centroids: "np.ndarray | None" = None, seed: int = 7,
                    distributed_train: bool = False,
                    n_parts: "int | None" = None) -> "rd.Dataset":
    """SSL-prototypes pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws"): drop the ``drop_frac`` MOST prototypical members
    (highest centroid cosine, vec_id ASC tiebreak) of every cluster.
    Returns ``(vec_id, cluster, kept)``.  The shuffle payload is only
    ``(cluster, vec_id, csim)`` — the pruning decision never needs the
    vectors themselves, so embeddings stay at the read."""
    return _clustered_scan(
        emb_ds, functools.partial(_proto_partition, drop_frac=drop_frac),
        n_clusters=n_clusters, id_col=id_col, centroids=centroids,
        seed=seed, distributed_train=distributed_train, n_parts=n_parts,
        keep_embedding=False)


def d4(emb_ds: "rd.Dataset", n_clusters: int = 16, threshold: float = 0.9,
       drop_frac: float = 0.1, id_col: str = "vec_id",
       centroids: "np.ndarray | None" = None, seed: int = 7,
       distributed_train: bool = False,
       n_parts: "int | None" = None) -> "rd.Dataset":
    """D4 (Tirumala et al. 2023, "D4: Improving LLM Pretraining via
    Document De-Duplication and Diversification"): SemDeDup, then
    prototype pruning over the survivors — fused into the SAME
    cluster-partition scan, so the composition costs one assignment
    pass and one shuffle total.  Returns ``(vec_id, cluster, kept,
    drop_stage)`` with ``drop_stage`` 0=kept, 1=semdedup, 2=prototype."""
    return _clustered_scan(
        emb_ds, functools.partial(_d4_partition, threshold=threshold,
                                  drop_frac=drop_frac),
        n_clusters=n_clusters, id_col=id_col, centroids=centroids,
        seed=seed, distributed_train=distributed_train, n_parts=n_parts,
        keep_embedding=True)
