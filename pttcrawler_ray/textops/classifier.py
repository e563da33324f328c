"""Quality classifier + Pareto-threshold keep rule — the GPT-3 /
LLaMA-style CommonCrawl filter (Brown et al. 2020, appendix A; Touvron
et al. 2023 use the same shape with fastText).

A binary hashed-ngram Naive Bayes model distinguishes a small TARGET
corpus (known high quality, e.g. curated reference pages) from the RAW
crawl; each raw doc gets a length-normalized quality score in (0, 1),
and the keep decision is the GPT-3 stochastic rule

    keep  iff  pareto_draw(alpha) > 1 - score

so high-scoring docs are mostly kept but low scorers still survive with
small probability (keeps the tail diverse instead of a hard cutoff).

Relationship to :mod:`.dsir` (shared fit machinery, different op): DSIR
ranks by TOTAL log-weight and takes a global Gumbel top-k (a fixed-size
resample); the classifier scores each doc independently by the MEAN
gram log-odds through a sigmoid (fastText's averaged-feature shape, so
long docs don't dominate) and keeps per-row — no global cut, no
driver-side merge at all beyond the bounded model fit.

Determinism spec (the sequential oracle replays it exactly):

- bucket model and ``math.log`` ratio table exactly as
  :func:`.dsir.fit_bucket_counts` / :func:`.dsir.log_ratio_table`;
- per-doc gram-ratio sums accumulate via ``np.add.at`` over the flat
  gram stream (all of a doc's unigrams in token order, then bigrams) —
  the identical float addition order as a sequential per-doc loop;
- ``logit = sum / max(n_grams, 1)``; ``score = 1 / (1 + exp(-logit))``
  — value-pure elementwise numpy on both sides;
- ``score_ppm = floor(score * 1e6)``;
- the Pareto draw is a pure function of the row:
  ``u = ((splitmix64(id + salt) >> 11) + 0.5) * 2^-53``,
  ``draw = u^(-1/alpha) - 1`` (numpy's Lomax inverse-CDF),
  ``pareto_ppm = floor(draw * 1e6)``;
- ``kept = int(score_ppm + pareto_ppm > 10^6)`` — the keep rule is
  exact INTEGER arithmetic on the two quantized columns.

Scale shape: two bounded count passes (the model fit, <= B rows to the
driver), one B-double broadcast, one streaming score pass.  Nothing
corpus-sized touches the driver or shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util.hashing import splitmix64
from ..util.rayops import bcast_get as _bcast_get
from .decontam import _gram_hashes
from .dsir import _NGRAMS, fit_bucket_counts, log_ratio_table


def _score_batch(batch: pa.Table, *, ratio_ref, buckets: int, salt: int,
                 alpha: float, id_col: str, text_col: str,
                 append: bool = False) -> pa.Table:
    ratio = _bcast_get(ratio_ref)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sums = np.zeros(len(batch), np.float64)
    n_grams = np.zeros(len(batch), np.int64)
    for n in _NGRAMS:
        gh, parents = _gram_hashes(batch[text_col], n)
        if len(gh):
            np.add.at(sums, parents,
                      ratio[(gh % np.uint64(buckets)).astype(np.int64)])
            n_grams += np.bincount(parents, minlength=len(batch))
    logit = sums / np.maximum(n_grams, 1)
    score = 1.0 / (1.0 + np.exp(-logit))
    score_ppm = np.floor(score * 1e6).astype(np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(salt))
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) * 2.0 ** -53
    draw = u ** (-1.0 / alpha) - 1.0
    pareto_ppm = np.floor(draw * 1e6).astype(np.int64)
    kept = (score_ppm + pareto_ppm > 10 ** 6).astype(np.int32)
    if append:  # keep the payload columns (streaming gate, no re-join)
        out = batch.append_column("score_ppm",
                                  pa.array(score_ppm, pa.int64()))
        return out.append_column("kept", pa.array(kept, pa.int32()))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_grams": pa.array(n_grams, pa.int64()),
        "score_ppm": pa.array(score_ppm, pa.int64()),
        "pareto_ppm": pa.array(pareto_ppm, pa.int64()),
        "kept": pa.array(kept, pa.int32()),
    })


def classifier_scores(raw_ds, log_ratio: np.ndarray, *,
                      pareto_alpha: float = 9.0, salt: int = 13,
                      id_col: str = "doc_id", text_col: str = "text",
                      append: bool = False):
    """Streaming per-doc quality scores + keep decisions under a fitted
    ratio table: rows ``(id_col, n_grams, score_ppm, pareto_ppm, kept)``,
    or the input batch + ``(score_ppm, kept)`` when ``append=True`` (the
    in-pipeline gate form — filter ``kept == 1`` downstream, nothing
    id-sized ever reaches the driver)."""
    import ray

    return raw_ds.map_batches(
        _score_batch,
        fn_kwargs={"ratio_ref": ray.put(np.asarray(log_ratio, np.float64)),
                   "buckets": len(log_ratio), "salt": int(salt),
                   "alpha": float(pareto_alpha), "append": append,
                   "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")


def quality_classifier(raw_ds, target_ds, buckets: int = 4096,
                       alpha: float = 1.0, pareto_alpha: float = 9.0,
                       salt: int = 13, id_col: str = "doc_id",
                       text_col: str = "text"):
    """The full filter: fit the target-vs-raw hashed-ngram NB model,
    score every raw doc, apply the Pareto keep rule.  Filter
    ``kept == 1`` and join back by id for the payload."""
    tc = fit_bucket_counts(target_ds, buckets=buckets, text_col=text_col)
    rc = fit_bucket_counts(raw_ds, buckets=buckets, text_col=text_col)
    ratio = log_ratio_table(tc, rc, alpha=alpha)
    return classifier_scores(raw_ds, ratio, pareto_alpha=pareto_alpha,
                             salt=salt, id_col=id_col, text_col=text_col)
