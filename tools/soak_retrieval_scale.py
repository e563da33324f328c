"""Perplexity / BM25 / shuffle-rank soak at 10^6 docs, exact-match.

Planted corpus (same modular family as soak_corpus_stats): doc ``i`` is
40 tokens — ``h{i%100}`` then ``g{i%1000}`` then 38 globally-unique junk
tokens — so every statistic the three round-4 operators compute has a
closed form:

- **unigram-LM perplexity** (top_v = 1100 = exactly the h+g vocabulary;
  junk is OOV by construction): per-doc cross-entropy is
  ``-(logp[h] + logp[g] + 38*oov)/40`` with the engine's exact
  accumulation order (h first, then g, then 38 junk adds — replicated
  here as 38 successive vectorized adds, because float addition is
  order-sensitive and the match is asserted EXACT in int ppm).
- **BM25**: query "h77 g777" splits the corpus into three exact score
  classes (both terms: i%1000==777; h77 only: i%100==77 minus those;
  neither: the rest, score 0).  dl is 40 for every doc, so the length
  normalizer is constant and every class score is one closed-form
  number; the expected top-k is the both-class's 10 lowest doc ids.
  A second query carries an out-of-corpus term (df=0 → idf exists but
  tf=0 everywhere) and a third is single-term.
- **shuffle_rank**: the expected permutation is
  ``argsort(splitmix64(ids + salt))`` computed directly in numpy.

Prints one JSON line: per-op wall, docs/s, exact_match, driver peak RSS.

Run from the repo root:  python tools/soak_retrieval_scale.py [--docs N]
"""
import argparse
import json
import math
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_H, N_G, DOC_LEN = 100, 1_000, 40
TOP_V = N_H + N_G
SALT = 7


def gen_corpus(out_dir: str, n_docs: int, chunk: int = 100_000) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for start in range(0, n_docs, chunk):
        end = min(start + chunk, n_docs)
        texts = [
            " ".join([f"h{i % N_H}", f"g{i % N_G}"] +
                     [f"u{i}_{j}" for j in range(2, DOC_LEN)])
            for i in range(start, end)]
        pq.write_table(
            pa.table({"doc_id": pa.array(range(start, end), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(out_dir, f"part-{start:08d}.parquet"))


def _mod_count(n: int, mod: int, r: int) -> int:
    return (n - r + mod - 1) // mod if r < n else 0


def expected_xent_ppm(n: int) -> np.ndarray:
    """Closed-form per-doc xent (int ppm), engine accumulation order."""
    total = n * DOC_LEN
    # vocab = all h (count n/100-ish) + all g (count n/1000-ish); junk
    # count-1 tokens lose every (count DESC, gram ASC) tie against them
    denom = float(total + TOP_V + 1)
    logp_h = np.array([math.log((_mod_count(n, N_H, a) + 1) / denom)
                       for a in range(N_H)])
    logp_g = np.array([math.log((_mod_count(n, N_G, b) + 1) / denom)
                       for b in range(N_G)])
    oov = math.log(1.0 / denom)
    ids = np.arange(n)
    s = logp_h[ids % N_H].copy()
    s += logp_g[ids % N_G]
    for _ in range(DOC_LEN - 2):   # 38 junk tokens, added one by one —
        s += oov                   # float addition order must match
    return np.floor((-s / DOC_LEN) * 1e6).astype(np.int64)


def expected_bm25(n: int, queries, topk: int, k1: float, b: float):
    """Closed-form expected (query_id, doc_id, score_ppm) rows."""
    df = {}
    for _, q in queries:
        for w in q.split():
            if w.startswith("h") and w[1:].isdigit() and int(w[1:]) < N_H:
                df[w] = _mod_count(n, N_H, int(w[1:]))
            elif w.startswith("g") and w[1:].isdigit() and int(w[1:]) < N_G:
                df[w] = _mod_count(n, N_G, int(w[1:]))
            else:
                df[w] = 0
    avgdl = (n * DOC_LEN) / n
    bb = k1 * (1.0 - b + b * float(DOC_LEN) / avgdl)

    def contrib(w):
        idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
        tf = 1.0
        return int(math.floor(idf * ((tf * (k1 + 1.0)) / (tf + bb)) * 1e6))

    rows = []
    for qid, q in queries:
        terms = sorted(set(q.split()))
        # score classes by which terms a doc carries; docs carry term w
        # iff doc_id % mod == r — enumerate ids per class cheaply
        def has(w, ids):
            if df[w] == 0:
                return np.zeros(len(ids), bool)
            mod = N_H if w.startswith("h") else N_G
            return ids % mod == int(w[1:])

        ids = np.arange(n, dtype=np.int64)
        score = np.zeros(n, np.int64)
        for w in terms:
            score = score + np.where(has(w, ids), contrib(w), 0)
        hit = score > 0
        order = np.lexsort((ids[hit], -score[hit]))
        top = order[:topk]
        for s, d in zip(score[hit][top], ids[hit][top]):
            rows.append((qid, int(d), int(s)))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()
    n = args.docs

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from pttcrawler_ray.textops.perplexity import perplexity_docs
    from pttcrawler_ray.textops.retrieval import bm25_topk
    from pttcrawler_ray.textops.sampling import shuffle_rank, splitmix64

    corpus = f"/tmp/ptt_soak_retrieval/{n}"
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        shutil.rmtree(corpus, ignore_errors=True)
        t0 = time.monotonic()
        gen_corpus(corpus, n)
        open(os.path.join(corpus, "_DONE"), "w").write("ok")
        gen_s = time.monotonic() - t0
    else:
        gen_s = 0.0

    out = {"docs": n, "gen_s": round(gen_s, 1), "exact_match": True}

    def load():
        return rd.read_parquet(corpus, columns=["doc_id", "text"])

    # ---- perplexity ------------------------------------------------------
    t0 = time.monotonic()
    ppl = perplexity_docs(load(), top_v=TOP_V).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    wall = time.monotonic() - t0
    exp = expected_xent_ppm(n)
    ok = (len(ppl) == n and (ppl["xent_ppm"].to_numpy() == exp).all()
          and (ppl["n_tokens"] == DOC_LEN).all())
    out["perplexity"] = {"wall_s": round(wall, 1),
                         "docs_per_s": round(n / wall),
                         "exact": bool(ok)}
    out["exact_match"] &= ok

    # ---- bm25 ------------------------------------------------------------
    queries = [(0, "h77 g777"), (1, "h12 nosuchtoken"), (2, "g5")]
    t0 = time.monotonic()
    bm = bm25_topk(load(), queries, topk=10).to_pandas()
    wall = time.monotonic() - t0
    got = sorted(map(tuple, bm[["query_id", "doc_id", "score_ppm"]]
                     .itertuples(index=False, name=None)))
    want = sorted(expected_bm25(n, queries, 10, 1.2, 0.75))
    ok = got == want
    out["bm25"] = {"wall_s": round(wall, 1), "docs_per_s": round(n / wall),
                   "exact": bool(ok)}
    out["exact_match"] &= ok

    # ---- bm25 over the persisted inverted index ---------------------------
    from pttcrawler_ray.textops.bm25index import (bm25_topk_indexed,
                                                  build_bm25_index)

    index_dir = f"/tmp/ptt_soak_retrieval/{n}_bm25idx"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.monotonic()
    build_bm25_index(load(), index_dir, n_parts=32)
    build_s = time.monotonic() - t0
    stats: dict = {}
    t0 = time.monotonic()
    bi = bm25_topk_indexed(index_dir, queries, topk=10,
                           stats_out=stats).to_pandas()
    wall = time.monotonic() - t0
    got_i = sorted(map(tuple, bi[["query_id", "doc_id", "score_ppm"]]
                       .itertuples(index=False, name=None)))
    ok = got_i == want and stats["parts_probed"] < stats["parts_total"]
    out["bm25_indexed"] = {
        "build_s": round(build_s, 1), "query_s": round(wall, 1),
        "docs_per_s_query": round(n / wall),
        "parts_probed": stats["parts_probed"],
        "parts_total": stats["parts_total"],
        "files_read": stats["files_read"],
        "files_total": stats["files_total"],
        "exact": bool(ok)}
    out["exact_match"] &= ok

    # ---- shuffle_rank ----------------------------------------------------
    t0 = time.monotonic()
    sr = shuffle_rank(rd.read_parquet(corpus, columns=["doc_id"]),
                      salt=SALT, approx_rows=n).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    wall = time.monotonic() - t0
    ids = np.arange(n, dtype=np.uint64)
    h = splitmix64(ids + np.uint64(SALT))
    exp_rank = np.empty(n, np.int64)
    exp_rank[np.argsort(h, kind="stable")] = np.arange(n)
    ok = len(sr) == n and (sr["shuffle_rank"].to_numpy() == exp_rank).all()
    out["shuffle_rank"] = {"wall_s": round(wall, 1),
                           "docs_per_s": round(n / wall),
                           "exact": bool(ok)}
    out["exact_match"] &= ok

    out["driver_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    out["exact_match"] = bool(out["exact_match"])
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
