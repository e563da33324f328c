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
    if centroids is None:
        train = (train_centroids_distributed if distributed_train
                 else train_centroids)
        centroids = train(emb_ds, n_clusters=n_clusters, seed=seed)
    c = _normalize(np.asarray(centroids, dtype=np.float64))
    if n_parts is None:
        # embedding payloads are dim×8 B/row: size partitions to ~50 MB,
        # never more partitions than clusters (empty groups emit
        # schema-less blocks)
        dim = c.shape[1]
        target = max(20_000, 50_000_000 // max(dim * 8, 1))
        approx = emb_ds.count()
        n_parts = min(len(c), scale_parts(approx, floor=1, target_rows=target))
    narrow = emb_ds.map_batches(
        _assign_batch,
        fn_kwargs={"centroids_ref": ray.put(c), "n_parts": n_parts,
                   "id_col": id_col},
        batch_format="pyarrow")
    fn = functools.partial(_semdedup_partition, threshold=threshold)

    def run(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["part"]))

    return narrow.groupby("part").map_groups(run, batch_format="pyarrow")
