"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169).

Given a small TARGET corpus (the domain you want more of) and a large
RAW corpus (the web crawl), DSIR selects raw documents whose hashed
n-gram distribution looks like the target:

- features: word unigrams + bigrams hashed into ``B`` buckets
  (the paper's 10k-bucket hashed n-gram generative model);
- bag-of-buckets models with add-``alpha`` smoothing fit on each side;
- per-doc importance weight ``log w = sum over grams of
  (log p_target[b] - log p_raw[b])``;
- Gumbel-top-k resampling (Vieira 2014): select the ``k`` docs
  maximizing ``log w + Gumbel(u)`` — sampling without replacement with
  probability proportional to ``w`` — with ``u`` derived from
  ``splitmix64(doc_id + salt)`` so the draw is a pure function of the
  row, stable under any partitioning.

Determinism spec (the sequential oracle replays it exactly):

- gram hashes are :func:`~..util.hashing.hash_u64_many` token hashes
  combined with the decontam rolling polynomial (``_gram_hashes``);
  bucket = ``gram_hash % B``;
- the two count vectors are integer (order-free); the ``log_ratio``
  table is built on the DRIVER with ``math.log`` (B entries — numpy's
  SIMD log may differ from libm by an ulp);
- per-doc weight accumulates via ``np.add.at`` over the flat gram
  stream — all of a doc's unigram contributions in token order, then
  its bigrams — the identical float addition order as a sequential
  per-doc loop; quantized ``logw_ppm = floor(logw * 1e6)``;
- ``gumbel_ppm = floor(-log(-log(u)) * 1e6)`` with
  ``u = ((h >> 11) + 0.5) * 2^-53`` (strictly inside (0, 1), so neither
  log can hit 0);
  the selection key is the INTEGER sum ``logw_ppm + gumbel_ppm`` with
  ``doc_id`` ASC tiebreak, so the global top-k cut is exact integer
  arithmetic.

Scale shape: two streaming count passes (per-batch dense bincount →
nonzero ``(bucket, cnt)`` rows → one single-key int64 groupby of ≤ B
groups), one bounded broadcast (B doubles), one streaming score pass,
then global top-k as per-block partial top-k → driver merge of
``blocks × k`` rows → broadcast integer threshold + one marking pass.
Nothing corpus-sized touches the driver or shuffles with payload.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..util.hashing import splitmix64
from ..util.rayops import bcast_get as _bcast_get
from .decontam import _gram_hashes

_NGRAMS = (1, 2)


def _bucket_counts_batch(batch: pa.Table, *, buckets: int,
                         text_col: str) -> pa.Table:
    """Per-batch partial: dense bincount over hashed-gram buckets,
    emitted as narrow nonzero (bucket, cnt) rows."""
    dense = np.zeros(buckets, np.int64)
    for n in _NGRAMS:
        gh, _ = _gram_hashes(batch[text_col], n)
        if len(gh):
            dense += np.bincount((gh % np.uint64(buckets)).astype(np.int64),
                                 minlength=buckets)
    nz = np.flatnonzero(dense)
    return pa.table({"bucket": pa.array(nz, pa.int64()),
                     "cnt": pa.array(dense[nz], pa.int64())})


def fit_bucket_counts(ds, buckets: int = 10_000,
                      text_col: str = "text") -> np.ndarray:
    """Corpus hashed-n-gram bucket counts: one streaming pass, one
    ≤ B-group single-key aggregate; the driver sees ≤ B rows."""
    rows = ds.map_batches(
        _bucket_counts_batch,
        fn_kwargs={"buckets": buckets, "text_col": text_col},
        # coarse batches: each partial is a dense B-bincount, so bigger
        # batches shrink the (bucket, cnt) row stream into the aggregate
        batch_size=8192,
        batch_format="pyarrow").groupby("bucket").sum("cnt").take_all()
    out = np.zeros(buckets, np.int64)
    for r in rows:
        out[int(r["bucket"])] = int(r["sum(cnt)"])
    return out


def log_ratio_table(target_counts: np.ndarray, raw_counts: np.ndarray,
                    alpha: float = 1.0) -> np.ndarray:
    """``log p_target[b] - log p_raw[b]`` with add-``alpha`` smoothing,
    built with ``math.log`` per bucket (driver-side, B entries)."""
    b = len(target_counts)
    tp = float(int(target_counts.sum()) + alpha * b)
    rp = float(int(raw_counts.sum()) + alpha * b)
    return np.array(
        [math.log((int(t) + alpha) / tp) - math.log((int(r) + alpha) / rp)
         for t, r in zip(target_counts, raw_counts)], np.float64)


def _gumbel_ppm(ids: np.ndarray, salt: int) -> np.ndarray:
    """floor(Gumbel(0,1) * 1e6) from the row's hash — identical numpy
    expression on the engine and oracle sides (elementwise, value-pure)."""
    h = splitmix64(ids.astype(np.uint64) + np.uint64(salt))
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0 ** -53
    return np.floor(-np.log(-np.log(u)) * 1e6).astype(np.int64)


def _weights_batch(batch: pa.Table, *, ratio_ref, buckets: int, salt: int,
                   id_col: str, text_col: str) -> pa.Table:
    ratio = _bcast_get(ratio_ref)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sums = np.zeros(len(batch), np.float64)
    n_grams = np.zeros(len(batch), np.int64)
    # one concatenated add.at per order keeps each doc's float additions
    # in (unigrams in token order, then bigrams) — the oracle's order
    for n in _NGRAMS:
        gh, parents = _gram_hashes(batch[text_col], n)
        if len(gh):
            np.add.at(sums, parents,
                      ratio[(gh % np.uint64(buckets)).astype(np.int64)])
            n_grams += np.bincount(parents, minlength=len(batch))
    logw_ppm = np.floor(sums * 1e6).astype(np.int64)
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_grams": pa.array(n_grams, pa.int64()),
        "logw_ppm": pa.array(logw_ppm, pa.int64()),
        "key_ppm": pa.array(logw_ppm + _gumbel_ppm(ids, salt), pa.int64()),
    })


def dsir_weights(raw_ds, log_ratio: np.ndarray, salt: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Streaming per-doc importance weights under a fitted ratio table:
    rows ``(id_col, n_grams, logw_ppm, key_ppm)``."""
    import ray

    return raw_ds.map_batches(
        _weights_batch,
        fn_kwargs={"ratio_ref": ray.put(np.asarray(log_ratio, np.float64)),
                   "buckets": len(log_ratio), "salt": int(salt),
                   "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")


def _partial_topk(batch: pa.Table, *, k: int, id_col: str) -> pa.Table:
    key = batch["key_ppm"].to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[:k]
    return pa.table({"key_ppm": pa.array(key[order], pa.int64()),
                     id_col: pa.array(ids[order], pa.int64())})


def topk_cut(weights_ds, k: int, id_col: str = "doc_id"):
    """Global (key_ppm DESC, id ASC) top-k boundary as an exact integer
    pair ``(key_kth, id_kth)`` — per-block partial top-k, then a
    blocks × k driver merge.  Returns ``None`` when the corpus has
    fewer than ``k`` rows (everything selected)."""
    rows = weights_ds.map_batches(
        _partial_topk, fn_kwargs={"k": int(k), "id_col": id_col},
        batch_format="pyarrow").take_all()
    if len(rows) < k:
        return None
    key = np.array([r["key_ppm"] for r in rows], np.int64)
    ids = np.array([r[id_col] for r in rows], np.int64)
    j = np.lexsort((ids, -key))[k - 1]
    return int(key[j]), int(ids[j])


def _mark_batch(batch: pa.Table, *, cut, id_col: str) -> pa.Table:
    key = batch["key_ppm"].to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    if cut is None:
        sel = np.ones(len(key), np.int32)
    else:
        ck, ci = cut
        sel = ((key > ck) | ((key == ck) & (ids <= ci))).astype(np.int32)
    return batch.append_column("selected", pa.array(sel, pa.int32()))


def dsir_select(raw_ds, target_ds, k: int, buckets: int = 10_000,
                alpha: float = 1.0, salt: int = 7, id_col: str = "doc_id",
                text_col: str = "text"):
    """The full DSIR pass: fit both sides, weight the raw corpus, and
    mark the Gumbel-top-k resample.  Returns rows
    ``(id_col, n_grams, logw_ppm, key_ppm, selected)`` for EVERY raw
    doc; filter ``selected == 1`` and join back by id for the payload."""
    tc = fit_bucket_counts(target_ds, buckets=buckets, text_col=text_col)
    rc = fit_bucket_counts(raw_ds, buckets=buckets, text_col=text_col)
    ratio = log_ratio_table(tc, rc, alpha=alpha)
    w = dsir_weights(raw_ds, ratio, salt=salt, id_col=id_col,
                     text_col=text_col).materialize()
    cut = topk_cut(w, k, id_col=id_col)
    return w.map_batches(_mark_batch, fn_kwargs={"cut": cut,
                                                 "id_col": id_col},
                         batch_format="pyarrow")
