"""Unigram-LM perplexity scoring (CCNet-style corpus quality signal).

CCNet/Gopher-class pipelines score each document's cross-entropy under
a language model trained on a reference corpus and filter or bucket by
the score (low perplexity ≈ fluent text, high ≈ junk).  The real thing
uses a KenLM 5-gram; this engine ships the same pipeline SHAPE with a
unigram LM and add-one smoothing — the distributed machinery (partial
count combiner → one narrow shuffle for training; bounded model
broadcast + one streaming score pass) is identical at any model order,
and the fixed model keeps every score exactly checkable against a
sequential oracle.

Model: vocab = top-``V`` corpus tokens by frequency (ties broken
(count DESC, token ASC), same as :func:`..vocab.vocab_topk`); with
``N`` = total corpus tokens,

    logp(w)   = ln((c_w + 1) / (N + V + 1))   for vocab tokens
    logp(OOV) = ln(      1   / (N + V + 1))

Per-doc cross-entropy = -(sum over tokens of logp) / n_tokens, 0.0 for
empty docs.  The logp TABLE is computed once on the driver with
``math.log`` — numpy's SIMD log kernels may differ from libm by an ulp,
which would break exact-oracle comparison; the table is V+1 entries, so
driver cost is nil.  Per-token scoring is vectorized: one Arrow
``index_in`` against the broadcast vocab + a ``np.add.at`` segment sum
per batch (np.add.at accumulates in flat (= token) order, so the float
additions happen in exactly the sequential oracle's order).

Scale shape: training reuses the ``vocab_topk`` partial-count machinery
(per-batch combiner, one narrow shuffle, driver sees V rows); scoring
broadcasts the bounded model (V strings + V+1 doubles) once via
``ray.put``/``bcast_get`` and streams the corpus in one ``map_batches``
pass — nothing corpus-sized ever lands on the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _tokens_flat
from .dedup import _bcast_get
from .vocab import vocab_topk


def _ntok_batch(batch: pa.Table, *, text_col: str) -> pa.Table:
    """Whitespace token count per row — null-type-safe (all-None text
    blocks from from_items have a null-typed column; _tokens_flat casts)."""
    _, _, counts = _tokens_flat(batch[text_col])
    return pa.table({"n_tokens": pa.array(counts.astype(np.int64),
                                          pa.int64())})


def train_unigram_lm(ds, top_v: int = 50_000,
                     text_col: str = "text") -> dict:
    """Distributed LM fit: ``{vocab, logp, logp_oov, total_tokens}``.
    Driver memory is bounded by ``top_v`` regardless of corpus size."""
    tbl = vocab_topk(ds, k=top_v, n=1, text_col=text_col)
    total = ds.map_batches(_ntok_batch, fn_kwargs={"text_col": text_col},
                           batch_format="pyarrow").sum("n_tokens") or 0
    vocab = tbl["gram"].to_pylist()
    counts = tbl["n"].to_pylist()
    denom = float(int(total) + len(vocab) + 1)
    logp = np.array([math.log((int(c) + 1) / denom) for c in counts],
                    np.float64)
    return {"vocab": vocab, "logp": logp,
            "logp_oov": math.log(1.0 / denom),
            "total_tokens": int(total)}


def _lm_arrays(lm: dict) -> dict:
    return {"vs": pa.array(lm["vocab"], pa.string()),
            "logp": np.asarray(lm["logp"], np.float64),
            "oov": float(lm["logp_oov"])}


def _score_batch(batch: pa.Table, *, lm_ref, id_col: str,
                 text_col: str) -> pa.Table:
    lm = _bcast_get(lm_ref, transform=_lm_arrays)
    flat, parents, counts = _tokens_flat(batch[text_col])
    sums = np.zeros(len(batch), np.float64)
    if len(flat):
        idx = pc.fill_null(pc.index_in(flat, value_set=lm["vs"]), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tok_logp = np.where(idx >= 0, lm["logp"][np.maximum(idx, 0)],
                            lm["oov"])
        np.add.at(sums, parents, tok_logp)
    nt = counts.astype(np.int64)
    xent = np.where(nt > 0, -sums / np.maximum(nt, 1), 0.0)
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(nt, pa.int64()),
        "xent_ppm": pa.array(np.floor(xent * 1e6).astype(np.int64),
                             pa.int64())})


def score_perplexity(docs_ds, lm: dict, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Streaming per-doc cross-entropy under a trained LM: rows
    ``(id_col, n_tokens, xent_ppm)`` with ``xent_ppm =
    floor(cross_entropy_nats * 1e6)`` (int column — float-hash-safe,
    same quantization the sequential oracle applies)."""
    import ray

    lm_ref = ray.put(lm)
    return docs_ds.map_batches(
        _score_batch,
        fn_kwargs={"lm_ref": lm_ref, "id_col": id_col,
                   "text_col": text_col},
        batch_format="pyarrow")


def perplexity_docs(docs_ds, top_v: int = 50_000, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Train-on-self + score: the one-call corpus quality signal."""
    lm = train_unigram_lm(docs_ds, top_v=top_v, text_col=text_col)
    return score_perplexity(docs_ds, lm, id_col=id_col, text_col=text_col)


def _filter_batch(batch: pa.Table, *, lm_ref, xent_max_ppm: int,
                  id_col: str, text_col: str) -> pa.Table:
    scored = _score_batch(batch, lm_ref=lm_ref, id_col=id_col,
                          text_col=text_col)
    x = scored["xent_ppm"].to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(x <= xent_max_ppm))


def filter_by_perplexity(docs_ds, lm: dict, xent_max_ppm: int,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Keep rows whose cross-entropy under ``lm`` is ≤ ``xent_max_ppm``
    (the CCNet "drop the high-perplexity tail" move).  Score and filter
    happen in ONE streaming pass over the original rows — no join, no
    shuffle, all input columns preserved.  Empty docs score 0 and are
    kept (filter emptiness with the quality ops, not the LM)."""
    import ray

    lm_ref = ray.put(lm)
    return docs_ds.map_batches(
        _filter_batch,
        fn_kwargs={"lm_ref": lm_ref, "xent_max_ppm": int(xent_max_ppm),
                   "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")
