"""Deduplication suite over the ``documents`` table (training-data ops).

Each flavor follows the scale pattern from the Ray guide: compute
per-batch signatures vectorized inside ``map_batches``, explode to
(bucket, doc) rows, ``groupby`` the bucket (the only shuffle), generate
candidate pairs within buckets, then verify pairs exactly.

- :func:`exact_dedup` — hash-partitioned exact dedup, keep min doc_id per
  distinct text.
- :func:`minhash_lsh_pairs` / :func:`minhash_dedup` — shingle → minhash
  (vectorized universal hashing) → banded LSH → candidates → exact
  Jaccard verify; connected components by union-find over the (small)
  verified pair set, min-id representative kept.
- :func:`simhash_pairs` — 64-bit simhash, 4×16-bit band blocking,
  Hamming-distance verification.
- :func:`embedding_neardup_pairs` — sign-LSH (random hyperplanes) buckets
  over normalized embeddings, within-bucket cosine via one matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..util.hashing import hash_u64_many

_MERSENNE = np.uint64((1 << 61) - 1)


# --------------------------------------------------------------- exact dedup
def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    return batch.append_column(
        "text_hash", pa.array(hash_u64_many([t or "" for t in batch[col].to_pylist()]),
                              pa.uint64()))


def exact_dedup(docs: "rd.Dataset", id_col: str = "doc_id") -> "rd.Dataset":
    """One row per distinct text (min id wins) — groupby on the 64-bit hash."""
    ds = docs.map_batches(add_text_hash, batch_format="pyarrow")

    def first(group: pa.Table) -> pa.Table:
        idx = pc.array_sort_indices(
            group[id_col].combine_chunks() if isinstance(group[id_col], pa.ChunkedArray)
            else group[id_col])
        return group.take([idx[0].as_py()])

    return ds.groupby("text_hash").map_groups(first, batch_format="pyarrow")


# ------------------------------------------------------------------ minhash
def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    toks = (text or "").split()
    if len(toks) < k:
        return hash_u64_many([" ".join(toks)]) if toks else np.zeros(0, np.uint64)
    return np.unique(hash_u64_many([" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]))


class MinHasher:
    """Vectorized minhash signatures: h_i(x) = (a_i*x + b_i) mod 2^61-1."""

    def __init__(self, num_perm: int = 128, seed: int = 1337, shingle_k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            hv = (shingles[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return hv.min(axis=1)


class MinhashBands:
    """map_batches actor: text → (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perm=128, bands=16, seed=1337, shingle_k=3,
                 id_col="doc_id", text_col="text"):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, seed, shingle_k)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.mh.signature(_shingle_hashes(text, self.mh.shingle_k))
            view = sig.reshape(self.bands, self.rows_per_band)
            bh = hash_u64_many([v.tobytes() for v in view])
            band_ids.extend(range(self.bands))
            band_hashes.extend(int(x) for x in bh)
            doc_ids.extend([doc_id] * self.bands)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.uint64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        })


def _pairs_from_groups(group: pa.Table) -> pa.Table:
    ids = sorted(set(group["doc_id"].to_pylist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i]); b.append(ids[j])
    return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})


def _verify_jaccard(cand_df, docs: "rd.Dataset", shingle_k: int,
                    threshold: float) -> pa.Table:
    """Exact n-gram Jaccard verification of candidate (doc_a, doc_b) pairs;
    texts of only the candidate-involved docs are gathered."""
    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                       ("jaccard", pa.float64())])
    if cand_df.empty:
        return schema.empty_table()
    involved = set(cand_df["doc_a"]) | set(cand_df["doc_b"])
    texts = {}
    for b in docs.iter_batches(batch_format="pyarrow", batch_size=8192):
        for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if i in involved:
                texts[i] = t
    sh = {i: _shingle_hashes(t, shingle_k) for i, t in texts.items()}
    out_a, out_b, out_j = [], [], []
    for a, b_ in cand_df[["doc_a", "doc_b"]].itertuples(index=False):
        sa, sb = sh.get(a), sh.get(b_)
        if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out_a.append(a); out_b.append(b_); out_j.append(j)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


class _AnchorShingles:
    """map_batches fn-object: emit each doc's m smallest shingle hashes as
    (anchor, doc_id) rows — the blocking key for the exact Jaccard join."""

    def __init__(self, shingle_k: int, m: int):
        self.k = shingle_k
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        anchors, ids = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = _shingle_hashes(text, self.k)
            for h in sh[: self.m]:  # _shingle_hashes returns sorted-unique
                anchors.append(int(h)); ids.append(doc_id)
        return pa.table({"anchor": pa.array(anchors, pa.uint64()),
                         "doc_id": pa.array(ids, pa.int64())})


def ngram_jaccard_pairs(docs: "rd.Dataset", threshold: float = 0.5,
                        shingle_k: int = 3, anchors_m: int = 4) -> pa.Table:
    """Exact token n-gram Jaccard similarity join.

    Blocking: docs sharing one of their ``anchors_m`` smallest shingle
    hashes become candidates (minhash-anchor blocking: a pair with true
    jaccard ≥ t shares its smallest shingle hash with probability ≥ t, so
    m anchors give recall ≈ 1-(1-t)^m ≈ 94% at t=0.5, m=4); candidates
    are verified with EXACT jaccard — precision is 1.0 by construction.
    Use :func:`minhash_lsh_pairs` when banding-tunable recall at higher
    thresholds is preferred.
    """
    anchors = docs.map_batches(_AnchorShingles(shingle_k, anchors_m),
                               batch_format="pyarrow")
    cand = anchors.groupby("anchor").map_groups(_pairs_from_groups,
                                                batch_format="pyarrow")
    cand_df = cand.to_pandas().drop_duplicates()
    return _verify_jaccard(cand_df, docs, shingle_k, threshold)


def minhash_lsh_pairs(docs: "rd.Dataset", threshold: float = 0.7,
                      num_perm: int = 128, bands: int = 16, shingle_k: int = 3,
                      concurrency: int = 2) -> pa.Table:
    """Verified near-dup pairs (doc_a < doc_b, jaccard ≥ threshold).

    The LSH explode + bucket groupby is fully distributed; candidate pairs
    (a tiny fraction of n²) are verified against broadcast texts of only the
    candidate-involved docs.  Returns a driver-side table (pair sets are
    small by construction; at larger scale the verify step stays in a
    map_batches over the pairs dataset).
    """
    bands_ds = docs.map_batches(
        MinhashBands,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow", concurrency=concurrency)
    cand = (bands_ds.groupby(["band_id", "band_hash"])
            .map_groups(_pairs_from_groups, batch_format="pyarrow"))
    cand_df = cand.to_pandas().drop_duplicates()
    return _verify_jaccard(cand_df, docs, shingle_k, threshold)


def minhash_dedup(docs: "rd.Dataset", threshold: float = 0.7, **kw) -> "rd.Dataset":
    """Drop near-duplicates: connected components over verified pairs,
    min doc_id kept per component (union-find on the small pair set)."""
    # pin the upstream pipeline once: it is otherwise executed three times
    # (bands pass, jaccard-verify scan, final keep filter)
    docs = docs.materialize()
    pairs = minhash_lsh_pairs(docs, threshold=threshold, **kw)
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    drop = {x for x in parent if find(x) != x}

    def keep(batch: pa.Table) -> pa.Table:
        mask = [i not in drop for i in batch["doc_id"].to_pylist()]
        return batch.filter(pa.array(mask))

    return docs.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------------ simhash
class SimHash:
    """map_batches fn-object: adds a 64-bit simhash + 4×16-bit band columns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sims = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            h = hash_u64_many(toks)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = bits.sum(axis=0) * 2 - len(h)
            sims[i] = np.uint64(sum(1 << k for k in range(64) if v[k] > 0))
        out = batch.append_column("simhash", pa.array(sims, pa.uint64()))
        for band in range(4):
            part = (sims >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out = out.append_column(f"sim_band{band}", pa.array(part, pa.uint64()))
        return out


def simhash_pairs(docs: "rd.Dataset", max_hamming: int = 3,
                  id_col: str = "doc_id") -> pa.Table:
    """Near-dup pairs by simhash banding (a pair within Hamming ≤ 3 of a
    64-bit simhash must agree on ≥1 of 4 16-bit bands)."""
    ds = docs.map_batches(SimHash(), batch_format="pyarrow")
    ds = ds.select_columns([id_col, "simhash", "sim_band0", "sim_band1",
                            "sim_band2", "sim_band3"])
    # signatures are consumed 5x (4 band groupbys + the sims scan): compute once
    ds = ds.materialize()
    sims: dict[int, int] = {}
    cand: set[tuple[int, int]] = set()
    for band in range(4):
        grouped = ds.groupby(f"sim_band{band}").map_groups(
            _pairs_from_groups, batch_format="pyarrow")
        df = grouped.to_pandas()
        cand.update(map(tuple, df.values.tolist()))
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        sims.update(zip(b[id_col].to_pylist(), b["simhash"].to_pylist()))
    out_a, out_b, out_d = [], [], []
    for a, b_ in sorted(cand):
        d = bin(sims[a] ^ sims[b_]).count("1")
        if d <= max_hamming:
            out_a.append(a); out_b.append(b_); out_d.append(d)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "hamming": pa.array(out_d, pa.int32())})


# ------------------------------------------------- embedding cosine near-dup
class SignLSH:
    """map_batches actor: adds a hyperplane-sign bucket for embeddings."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        signs = (emb @ self.planes) > 0
        bucket = (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket.astype(np.int64), pa.int64()))


def embedding_neardup_pairs(emb_ds: "rd.Dataset", dim: int, threshold: float = 0.95,
                            bits: int = 12, concurrency: int = 2) -> pa.Table:
    """Pairs with cosine ≥ threshold among same-bucket embeddings (one
    matmul per bucket inside map_groups)."""
    ds = emb_ds.map_batches(SignLSH, fn_constructor_kwargs={"dim": dim, "bits": bits},
                            batch_format="pyarrow", concurrency=concurrency)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_pylist()
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        m = np.stack(group["embedding"].to_pylist()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sim = m @ m.T
        a, b = np.where(np.triu(sim >= threshold, k=1))
        ids_np = np.asarray(ids)
        return pa.table({"doc_a": pa.array(np.minimum(ids_np[a], ids_np[b]), pa.int64()),
                         "doc_b": pa.array(np.maximum(ids_np[a], ids_np[b]), pa.int64()),
                         "cosine": pa.array(sim[a, b], pa.float64())})

    pairs = ds.groupby("lsh_bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    df = pairs.to_pandas()
    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                        ("cosine", pa.float64())])
    if df.empty:
        return schema.empty_table()
    return pa.Table.from_pandas(df.drop_duplicates(["doc_a", "doc_b"]),
                                preserve_index=False).cast(schema)
