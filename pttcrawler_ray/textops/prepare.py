"""End-to-end training-data preparation: the composition a real user runs.

``prepare()`` chains the individually-soaked stages into ONE run over a
``(doc_id, text)`` corpus:

    curate (quality → langid → filter → near-dup removal)
      → decontaminate (drop docs sharing a word n-gram with a held-out
        benchmark set)
      → split (deterministic splitmix64 train/val/test)
      → domain-mix (per-language stratified keep rates, train split only —
        eval splits are never resampled)
      → pack (sequence-packing offset map for the train split)

and writes a training-ready parquet layout::

    dest/docs/split=train|val|test/   (doc_id, text, quality, pred_lang)
    dest/pack_train/                  (doc_id, n_tok, tok_start, ...)
    dest/manifest.json                (counts + parameters per stage)

Scale notes (the shape at 100 TB):

- every stage is a streaming map_batches / coarse-partition shuffle from
  the underlying modules; ``prepare`` adds NO new shuffle of its own.
- the curated+split dataset is materialized ONCE and consumed by the
  three per-split writes and the pack pass — without the pin, each
  consumer would re-run the whole curate pipeline.
- the contaminated-id set is output-sized (bounded by the benchmark's
  gram overlap); below ``_BCAST_DROP_MAX`` ids it is a broadcast
  ``is_in`` filter, above it the exact bucketed anti-join
  (``dedup._anti_join_ids``) keeps the driver id-free — the same
  adaptive plan as the K2 upsert sink.
- per-split writes are filters over the materialized blocks (3 cheap
  scans), NOT ``write_parquet(partition_cols=...)`` over unsorted blocks
  (which fans out one file per block × split).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_BCAST_DROP_MAX = 2_000_000  # ids; ~16 MB broadcast ceiling

_SPLITS_DEFAULT = {"train": 0.98, "val": 0.01, "test": 0.01}


def docs_from_crawl(out_dir: str) -> "rd.Dataset":
    """Bridge a finished crawl into the training-corpus shape: the
    latest-article view (one row per url, newest warc_ts) as
    ``(doc_id, text, url)`` rows ready for :func:`prepare`.

    ``doc_id`` is the int64 view of the 64-bit url hash — stable,
    coordination-free, identical across reruns and partitionings, so
    incremental re-preparation of a re-crawl keeps ids aligned.  Error
    rows (fetch/parse failures carry a reason, SURVEY.md M11) and empty
    bodies are dropped; ``url`` is carried for traceability (callers
    pass ``select_columns(["doc_id", "text"])`` into :func:`prepare`
    and may persist the (doc_id, url) map separately)."""
    from ..pipelines.crawl import latest_articles
    from ..util.hashing import hash_u64_many

    def to_docs(t: pa.Table) -> pa.Table:
        body = pc.coalesce(t["content"], pa.scalar("", pa.string()))
        sub = t.filter(pc.and_(pc.is_null(t["error"]),
                               pc.greater(pc.utf8_length(body), 0)))
        ids = hash_u64_many(sub["url"].to_pylist()).view(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": sub["content"],
                         "url": sub["url"]})

    return latest_articles(out_dir).map_batches(
        to_docs, batch_format="pyarrow")


def _drop_ids_broadcast(ds: "rd.Dataset", ids: np.ndarray,
                        id_col: str = "doc_id") -> "rd.Dataset":
    """Streaming anti-filter against a broadcast sorted id array."""
    import ray

    from ..util.rayops import bcast_get

    ref = ray.put(np.sort(ids.astype(np.int64)))

    def keep(t: pa.Table) -> pa.Table:
        drop = bcast_get(ref)
        col = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(drop, col)
        pos[pos == len(drop)] = max(len(drop) - 1, 0)
        member = (drop[pos] == col) if len(drop) else np.zeros(len(col), bool)
        return t.filter(pa.array(~member))

    return ds.map_batches(keep, batch_format="pyarrow")


def _split_label_filter(t: pa.Table, *, label: str, keep_eq: bool) -> pa.Table:
    m = pc.equal(t["split"], label)
    return t.filter(m if keep_eq else pc.invert(m))


def _split_filter(ds: "rd.Dataset", label: str, keep_eq: bool) -> "rd.Dataset":
    """Vectorized split filter (Arrow kernel, not per-row Python)."""
    return ds.map_batches(_split_label_filter,
                          fn_kwargs={"label": label, "keep_eq": keep_eq},
                          batch_format="pyarrow")


def prepare(docs: "rd.Dataset", benchmark: "rd.Dataset | None", dest: str,
            *, quality_min: float = 0.3, langs: "list[str] | None" = None,
            dedup_threshold: float = 0.8, decontam_n: int = 5,
            ratios: "dict[str, float] | None" = None,
            mix_rates: "dict[str, float] | None" = None,
            mix_group: str = "pred_lang", seq_len: int = 512,
            split_salt: int = 0, mix_salt: int = 1,
            xent_max_ppm: "int | None" = None,
            ppl_top_v: int = 50_000,
            require_stopwords: bool = True,
            span_k: "int | None" = None,
            classifier_target: "rd.Dataset | None" = None,
            pareto_alpha: float = 9.0,
            clf_buckets: int = 4096, clf_salt: int = 13) -> dict:
    """Run the full preparation pipeline and write the training layout
    under ``dest``.  Returns the manifest dict (also written as
    ``dest/manifest.json``).  ``require_stopwords`` passes through to
    :func:`.curate.curate`.

    ``benchmark=None`` skips decontamination; ``mix_rates=None`` skips
    domain mixing.  ``ratios`` defaults to 98/1/1 train/val/test.
    ``xent_max_ppm`` (CCNet-style) trains a unigram LM on the CURATED
    corpus (vocab ≤ ``ppl_top_v`` — driver-bounded) and drops docs whose
    cross-entropy exceeds it, before decontamination.

    ``span_k`` (Lee et al. 2021) rewrites every doc FIRST, cutting
    non-first occurrences of repeated ``span_k``-token spans — dedup
    before scoring, so boilerplate never inflates quality/LM stats.
    ``classifier_target`` (GPT-3 App. A) fits the hashed-ngram quality
    classifier (target vs the curated corpus) and applies the
    ``pareto_draw > 1 - score`` keep rule as a streaming gate after
    curation.
    """
    from .curate import curate
    from .decontam import decontaminate
    from .dedup import _anti_join_ids
    from .packing import pack_offsets
    from .sampling import split_assign, stratified_sample

    ratios = dict(ratios or _SPLITS_DEFAULT)
    manifest: dict = {
        "params": {"quality_min": quality_min, "langs": langs,
                   "dedup_threshold": dedup_threshold,
                   "decontam_n": decontam_n, "ratios": ratios,
                   "mix_rates": mix_rates, "mix_group": mix_group,
                   "seq_len": seq_len, "split_salt": split_salt,
                   "mix_salt": mix_salt, "xent_max_ppm": xent_max_ppm,
                   "ppl_top_v": ppl_top_v if xent_max_ppm is not None
                   else None,
                   "span_k": span_k,
                   "pareto_alpha": pareto_alpha if classifier_target
                   is not None else None},
        "stages": {},
    }
    n_input = docs.count()
    manifest["stages"]["input_docs"] = n_input

    if span_k is not None:
        from .spandedup import span_dedup

        spanned = span_dedup(docs, k=span_k).materialize()
        manifest["stages"]["span_tokens_dropped"] = int(
            spanned.sum("n_dropped") or 0)
        docs = spanned.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "text": t["text_clean"]}),
            batch_format="pyarrow")

    kept = curate(docs, quality_min=quality_min, langs=langs,
                  require_stopwords=require_stopwords,
                  dedup_threshold=dedup_threshold).materialize()
    n_curated = kept.count()
    manifest["stages"]["curated_docs"] = n_curated

    if classifier_target is not None:
        from .classifier import (classifier_scores, fit_bucket_counts,
                                 log_ratio_table)

        tc = fit_bucket_counts(classifier_target, buckets=clf_buckets)
        rc = fit_bucket_counts(kept, buckets=clf_buckets)
        ratio = log_ratio_table(tc, rc)
        scored = classifier_scores(kept, ratio, pareto_alpha=pareto_alpha,
                                   salt=clf_salt, append=True)
        kept = scored.filter(expr="kept == 1").drop_columns(
            ["score_ppm", "kept"]).materialize()
        n_classified = kept.count()
        manifest["stages"]["classifier_dropped"] = n_curated - n_classified
        n_curated = n_classified

    if xent_max_ppm is not None:
        from .perplexity import filter_by_perplexity, train_unigram_lm

        lm = train_unigram_lm(kept, top_v=ppl_top_v)
        kept = filter_by_perplexity(kept, lm,
                                    xent_max_ppm=xent_max_ppm).materialize()
        n_fluent = kept.count()
        manifest["stages"]["perplexity_dropped"] = n_curated - n_fluent
        n_curated = n_fluent

    if benchmark is not None:
        hits = decontaminate(kept, benchmark, n=decontam_n).materialize()
        n_contaminated = hits.count()
        if n_contaminated <= _BCAST_DROP_MAX:
            drop_ids = np.asarray(hits.to_pandas()["doc_id"], np.int64) \
                if n_contaminated else np.empty(0, np.int64)
            kept = _drop_ids_broadcast(kept, drop_ids)
        else:
            kept = _anti_join_ids(
                kept, hits.map_batches(
                    lambda t: t.select(["doc_id"]).rename_columns(["node"]),
                    batch_format="pyarrow"))
        manifest["stages"]["contaminated_docs"] = n_contaminated

    kept = split_assign(kept, ratios, salt=split_salt)
    if mix_rates:
        # resample the TRAIN split only: eval splits must stay a fixed,
        # unresampled sample of the curated corpus
        mixed = stratified_sample(_split_filter(kept, "train", True),
                                  mix_rates, mix_group, salt=mix_salt)
        kept = mixed.union(_split_filter(kept, "train", False))
    kept = kept.select_columns(["doc_id", "text", "quality", "pred_lang",
                                "split"]).materialize()

    os.makedirs(dest, exist_ok=True)
    out_cols = ["doc_id", "text", "quality", "pred_lang"]
    from ..util.rayops import parquet_rows

    for label in ratios:
        part = _split_filter(kept, label, True).select_columns(out_cols)
        part_dir = os.path.join(dest, "docs", f"split={label}")
        part.write_parquet(part_dir)
        # row counts from the written footers — no second filter scan
        manifest["stages"][f"docs_{label}"] = parquet_rows(part_dir)

    train = _split_filter(kept, "train", True)
    pack = pack_offsets(train, seq_len=seq_len).materialize()
    pack.write_parquet(os.path.join(dest, "pack_train"))
    manifest["stages"]["pack_rows"] = pack.count()
    total_tok = pack.map_batches(
        lambda t: pa.table({"s": [pc.sum(pc.add(t["n_tok"], 1)).as_py() or 0]}),
        batch_format="pyarrow").to_pandas()["s"].sum()
    manifest["stages"]["train_tokens_with_eos"] = int(total_tok)
    manifest["stages"]["train_examples"] = int(
        -(-int(total_tok) // seq_len)) if total_tok else 0

    with open(os.path.join(dest, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
