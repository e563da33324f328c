"""Corpus-stats-at-scale soak: vocab top-K, repetition filters, and
benchmark decontamination end-to-end on a 10^6-doc corpus.

Evidence tool for the round-3 corpus-statistics ops (BASELINE.md
"Corpus-stats soak"): a deterministic planted corpus makes every result
EXACTLY computable in closed form, so the soak asserts equality, not
plausibility —

- vocab/bigram top-K: 100 head tokens ``h{a}`` (one per doc at position
  0, count = #{i: i%100==a}), 1,000 mid tokens ``g{b}`` (position 1,
  count = #{i: i%1000==b}); every other token is globally unique junk.
  Bigram ``h{b%100} g{b}`` therefore has the same count as ``g{b}``;
  the expected top-K lists (including the (count DESC, gram ASC)
  boundary tie-break) are reconstructed by exact modular arithmetic.
- repetition: docs with ``i % 503 == 3`` carry a 5x repeated token at
  positions 30..34 (top_token 5/40, top_bigram 4/39); all other docs
  are max-count-1 (1/40, 1/39) — a two-class ppm histogram checked
  exactly over all 10^6 rows.
- decontamination: eval phrase A (``e0..e4``) planted at positions
  10..14 of docs ``i % 9973 == 1``, phrase B (``f0..f4``) at 20..24 of
  docs ``i % 14983 == 2``; both phrases are carried by benchmark doc 0
  (0 % 29 == 0).  Junk neighbours keep every other 5-gram unique, so
  the expected hit set is {i in a plant class, i % 29 != 0} with
  n_hits = #phrases planted in i — asserted as an exact dict.

The JSON line reports per-op wall time, corpus throughput, and driver
peak RSS (the driver holds only winner rows + the benchmark gram set).

Run from the repo root:  python tools/soak_corpus_stats.py [--docs N]
"""
import argparse
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 200
N_H, N_G = 100, 1_000
REP_MOD, REP_AT = 503, 3          # 5x repeated token at positions 30..34
A_MOD, A_AT = 9_973, 1           # phrase A at positions 10..14
B_MOD, B_AT = 14_983, 2         # phrase B at positions 20..24
BENCH_MOD = 29
PHRASE_A = [f"e{j}" for j in range(5)]
PHRASE_B = [f"f{j}" for j in range(5)]


def doc_tokens(i: int) -> list[str]:
    toks = [f"h{i % N_H}", f"g{i % N_G}"] + [f"u{i}_{j}" for j in range(2, 40)]
    if i % A_MOD == A_AT or i == 0:
        toks[10:15] = PHRASE_A
    if i % B_MOD == B_AT or i == 0:
        toks[20:25] = PHRASE_B
    if i % REP_MOD == REP_AT:
        toks[30:35] = [f"r{i}"] * 5
    return toks


def gen_corpus(out_dir: str, n_docs: int, chunk: int = 50_000) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for start in range(0, n_docs, chunk):
        end = min(start + chunk, n_docs)
        texts = [" ".join(doc_tokens(i)) for i in range(start, end)]
        pq.write_table(
            pa.table({"doc_id": pa.array(range(start, end), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(out_dir, f"part-{start:08d}.parquet"))


def _mod_count(n: int, mod: int, r: int) -> int:
    """#{i in [0, n): i % mod == r}"""
    return (n - r + mod - 1) // mod if r < n else 0


def expected_topk(n: int, bigram: bool) -> list[tuple[str, int]]:
    counts: dict[str, int] = {}
    if not bigram:
        for a in range(N_H):
            counts[f"h{a}"] = _mod_count(n, N_H, a)
        for b in range(N_G):
            counts[f"g{b}"] = _mod_count(n, N_G, b)
    else:
        for b in range(N_G):
            counts[f"h{b % N_H} g{b}"] = _mod_count(n, N_G, b)
    # everything else (junk / phrase / repeat grams) must sit strictly
    # below the K boundary for the closed form to hold
    tail_max = max(_mod_count(n, A_MOD, A_AT) + 1,
                   _mod_count(n, B_MOD, B_AT) + 1, 5)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    assert top[-1][1] > tail_max, "planted boundary must clear the junk tail"
    return top


def expected_decontam(n: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for i in range(A_AT, n, A_MOD):
        if i % BENCH_MOD != 0:
            out[i] = out.get(i, 0) + 1
    for i in range(B_AT, n, B_MOD):
        if i % BENCH_MOD != 0:
            out[i] = out.get(i, 0) + 1
    return out


def _peak_rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/ptt_corpus_stats_soak")
    args = ap.parse_args()
    n = args.docs

    corpus = os.path.join(args.out, "docs")
    marker = os.path.join(args.out, "manifest.json")
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = json.load(f).get("n_docs")
    if have != n:
        shutil.rmtree(corpus, ignore_errors=True)
        print(f"generating {n:,} docs ...", file=sys.stderr)
        t0 = time.time()
        gen_corpus(corpus, n)
        with open(marker, "w") as f:
            json.dump({"n_docs": n, "gen_sec": round(time.time() - t0, 1)}, f)
    print(f"corpus ready ({n:,} docs)", file=sys.stderr)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    from pttcrawler_ray.textops.analysis import repetition_batch
    from pttcrawler_ray.textops.decontam import decontaminate
    from pttcrawler_ray.textops.vocab import vocab_topk
    from pttcrawler_ray.util.rayops import read_parquet_clean

    timings: dict[str, float] = {}

    # --- vocab + bigram top-K -------------------------------------------
    for bigram in (False, True):
        name = "bigram_topk" if bigram else "vocab_topk"
        docs = read_parquet_clean(corpus, columns=["text"])
        t0 = time.time()
        got = vocab_topk(docs, k=K, n=2 if bigram else 1)
        timings[name] = round(time.time() - t0, 1)
        got_pairs = list(zip(got["gram"].to_pylist(),
                             got["n"].to_pylist()))
        exp = expected_topk(n, bigram)
        assert got_pairs == exp, (name, got_pairs[:5], exp[:5])
        print(f"{name}: exact top-{K} match in {timings[name]}s",
              file=sys.stderr)

    # --- repetition ------------------------------------------------------
    docs = read_parquet_clean(corpus)
    t0 = time.time()
    rep = docs.map_batches(repetition_batch, batch_format="pyarrow") \
              .select_columns(["doc_id", "top_token_frac", "top_bigram_frac"])
    parts = [
        (t["doc_id"].to_numpy(zero_copy_only=False),
         np.floor(t["top_token_frac"].to_numpy(zero_copy_only=False) * 1e6),
         np.floor(t["top_bigram_frac"].to_numpy(zero_copy_only=False) * 1e6))
        for t in ray.get(rep.to_arrow_refs()) if t.num_rows]
    ids = np.concatenate([p[0] for p in parts])
    tok_ppm = np.concatenate([p[1] for p in parts]).astype(np.int64)
    bg_ppm = np.concatenate([p[2] for p in parts]).astype(np.int64)
    timings["repetition"] = round(time.time() - t0, 1)
    is_rep = ids % REP_MOD == REP_AT
    exp_tok = np.where(is_rep, int(5 / 40 * 1e6), int(1 / 40 * 1e6))
    exp_bg = np.where(is_rep, np.floor(4 / 39 * 1e6), np.floor(1 / 39 * 1e6))
    assert len(ids) == n
    assert (tok_ppm == exp_tok).all() and (bg_ppm == exp_bg).all()
    print(f"repetition: exact two-class ppm over {n:,} rows "
          f"in {timings['repetition']}s", file=sys.stderr)

    # --- decontamination --------------------------------------------------
    docs = read_parquet_clean(corpus)

    def is_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD == 0))

    def not_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD != 0))

    t0 = time.time()
    got = decontaminate(docs.map_batches(not_bench, batch_format="pyarrow"),
                        docs.map_batches(is_bench, batch_format="pyarrow"),
                        n=5).to_pandas()
    timings["decontaminate"] = round(time.time() - t0, 1)
    got_d = dict(zip(got["doc_id"].astype(int), got["n_hits"].astype(int)))
    exp_d = expected_decontam(n)
    assert got_d == exp_d, (len(got_d), len(exp_d))
    print(f"decontaminate: exact {len(exp_d):,}-doc hit set "
          f"in {timings['decontaminate']}s", file=sys.stderr)

    total = sum(timings.values())
    print(json.dumps({
        "metric": "corpus_stats_soak", "n_docs": n,
        "timings_sec": timings, "total_sec": round(total, 1),
        "docs_per_sec_total": int(4 * n / total),
        "contaminated_docs": len(exp_d),
        "driver_peak_rss_gb": _peak_rss_gb(),
        "exact_match": True,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
