"""BM25 keyword retrieval over a document corpus.

The keyword-side complement of the embedding ANN family
(:mod:`.similarity`): given a SMALL query set (data-selection prompts,
eval probes, targeted-domain seed queries — think DSIR-style relevance
weighting), score every corpus document with Okapi BM25 and return the
top-k documents per query.

Scale shape (the 100-TB plan):

1. **Stats pass** — one streaming ``map_batches`` over the corpus
   computing, per block, the document count, total token count, and the
   per-QUERY-TERM document frequencies (``pc.index_in`` against the
   tiny term vocabulary + a presence bincount).  Only
   ``O(blocks × n_terms)`` rows reach the driver — never a corpus-sized
   anything.
2. **Model build** — driver-side idf table over the ≤ dozens of query
   terms (``math.log``, not numpy, so the sequential oracle's libm
   calls produce bit-identical doubles).
3. **Score pass** — second streaming ``map_batches``: per block, a
   (docs × terms) tf matrix via one flat-token ``index_in`` + bincount,
   the BM25 kernel fully vectorized, each (doc, term) contribution
   quantized to int ppm BEFORE the per-query summation (an INTEGER
   matmul against the query/term incidence matrix) — float addition
   order can therefore never differ between engine and oracle.
4. **Top-k** — ``grouped_topk`` per query id (partial top-k combiner in
   every block, one narrow k-rows-per-query shuffle).

The corpus is read twice (stats + score) but both passes are narrow
streaming scans; nothing is materialized and no corpus-sized shuffle
exists — the only exchange is ≤ ``topk`` rows per query per block.

Float-exactness contract (mirrored by ``oracle/queryoracle.py``): with
``dl`` = doc token count, ``avgdl = total_tokens / n_docs``,

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))          # math.log
    bb      = k1 * (1 - b + b * dl / avgdl)                     # per doc
    contrib = idf(t) * ((tf * (k1 + 1)) / (tf + bb))            # per term
    score   = sum_t floor(contrib_t * 1e6)                      # int sum

Repeated terms inside one query count once (the incidence matrix is
0/1).  Docs with score 0 (no term hit) are not returned.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import _tokens_flat


def _query_terms(queries: "list[tuple[int, str]]"):
    """(sorted unique term list, int8 incidence matrix M[q_idx, t_idx],
    query-id array) for a query set."""
    terms = sorted({w for _, q in queries for w in (q or "").split()})
    t_idx = {w: i for i, w in enumerate(terms)}
    mat = np.zeros((len(queries), len(terms)), np.int64)
    for qi, (_, q) in enumerate(queries):
        for w in set((q or "").split()):
            mat[qi, t_idx[w]] = 1
    qids = np.asarray([qid for qid, _ in queries], np.int64)
    return terms, mat, qids


def _stats_batch(batch: pa.Table, *, terms: "list[str]",
                 text_col: str) -> pa.Table:
    """One row per block: (n_docs, n_tokens, df list) partials."""
    flat, parents, counts = _tokens_flat(batch[text_col])
    T = len(terms)
    df = np.zeros(T, np.int64)
    if len(flat) and T:
        idx = pc.fill_null(
            pc.index_in(flat, value_set=pa.array(terms, pa.string())),
            -1).to_numpy(zero_copy_only=False).astype(np.int64)
        hit = idx >= 0
        if hit.any():
            pairs = np.unique(parents[hit] * T + idx[hit])
            df = np.bincount(pairs % T, minlength=T).astype(np.int64)
    return pa.table({
        "n_docs": pa.array([len(batch)], pa.int64()),
        "n_tokens": pa.array([int(counts.sum())], pa.int64()),
        "df": pa.array([df.tolist()], pa.list_(pa.int64())),
    })


def corpus_bm25_stats(docs_ds, terms: "list[str]",
                      text_col: str = "text") -> dict:
    """Streaming corpus statistics for a BM25 model over ``terms``:
    ``{n_docs, n_tokens, df}`` — driver memory is O(blocks × terms)."""
    part = docs_ds.map_batches(
        _stats_batch, fn_kwargs={"terms": terms, "text_col": text_col},
        batch_format="pyarrow").to_pandas()
    df = np.zeros(len(terms), np.int64)
    for row in part["df"]:
        df += np.asarray(row, np.int64)
    return {"n_docs": int(part["n_docs"].sum()),
            "n_tokens": int(part["n_tokens"].sum()),
            "df": df}


def build_bm25_model(stats: dict, terms: "list[str]",
                     k1: float = 1.2, b: float = 0.75) -> dict:
    """idf table + length normalizer from corpus stats (``math.log``
    per term — the V-entry table is driver-trivial and bit-stable)."""
    n = max(stats["n_docs"], 1)
    avgdl = stats["n_tokens"] / n
    idf = np.array([math.log(1.0 + (n - int(d) + 0.5) / (int(d) + 0.5))
                    for d in stats["df"]], np.float64)
    return {"idf": idf, "avgdl": avgdl, "k1": float(k1), "b": float(b)}


def _score_batch(batch: pa.Table, *, terms: "list[str]", mat: np.ndarray,
                 qids: np.ndarray, model: dict, id_col: str,
                 text_col: str) -> pa.Table:
    flat, parents, counts = _tokens_flat(batch[text_col])
    n, T = len(batch), len(terms)
    tf = np.zeros((n, T), np.float64)
    if len(flat) and T:
        idx = pc.fill_null(
            pc.index_in(flat, value_set=pa.array(terms, pa.string())),
            -1).to_numpy(zero_copy_only=False).astype(np.int64)
        hit = idx >= 0
        if hit.any():
            tf = np.bincount(parents[hit] * T + idx[hit],
                             minlength=n * T).astype(np.float64) \
                .reshape(n, T)
    k1, b = model["k1"], model["b"]
    dl = counts.astype(np.float64)
    # op order mirrored EXACTLY by the sequential oracle (see module doc)
    bb = k1 * (1.0 - b + b * dl / model["avgdl"])          # (n,)
    contrib = model["idf"][None, :] * ((tf * (k1 + 1.0)) /
                                       (tf + bb[:, None]))  # (n, T)
    contrib_ppm = np.floor(contrib * 1e6).astype(np.int64)
    scores = contrib_ppm @ mat.T                            # (n, Q) int
    di, qi = np.nonzero(scores > 0)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "query_id": pa.array(qids[qi], pa.int64()),
        id_col: pa.array(ids[di], pa.int64()),
        "score_ppm": pa.array(scores[di, qi], pa.int64()),
    })


def bm25_topk(docs_ds, queries: "list[tuple[int, str]]", *, topk: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text", approx_rows: "int | None" = None):
    """Top-``topk`` documents per query by BM25: rows ``(query_id,
    doc_id, score_ppm)``, deterministically tie-broken by ascending
    ``doc_id``.  ``queries`` is a small in-memory list of
    ``(query_id, query_text)`` — the corpus side streams."""
    from ..util.rayops import grouped_topk

    terms, mat, qids = _query_terms(queries)
    stats = corpus_bm25_stats(docs_ds, terms, text_col=text_col)
    model = build_bm25_model(stats, terms, k1=k1, b=b)
    scored = docs_ds.map_batches(
        _score_batch,
        fn_kwargs={"terms": terms, "mat": mat, "qids": qids,
                   "model": model, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow")
    # tiny group cardinality (one group per query): a few partitions is
    # plenty — the combiner already shrank each block to <= topk rows per
    # query.  Keep >= ~4 keys per partition so no hash partition comes up
    # empty (empty sort partitions emit schema-less blocks — the
    # "new schema: ." warning spray; see textops/vocab.py)
    return grouped_topk(scored, "query_id",
                        [("score_ppm", "descending"), (id_col, "ascending")],
                        k=topk, n_parts=max(1, min(len(queries) // 4, 64)))
