"""BPE-at-scale soak: tokenizer training + streaming encode on 10^6 docs.

Evidence tool for :mod:`pttcrawler_ray.textops.bpe` (BASELINE.md "BPE
soak"): a zipf-drawn corpus over a bounded 30k-word vocabulary (the
realistic shape — distinct words ≪ tokens, so the per-actor encode
cache collapses the work) is trained and encoded by the engine, then
replayed sequentially (independent Counter word count, same documented
tie-breaks, cached greedy encode) and checked EXACTLY: the merge table
row-for-row and every per-doc (n_tokens, n_bpe_tokens) pair.

The corpus-sized work is ONE distributed word-count pass (vocab_topk)
plus ONE streaming encode pass; merge learning is driver-side over the
bounded (word, count) table.

Run from the repo root:  python tools/soak_bpe_scale.py [--docs N]
"""
import argparse
import json
import os
import resource
import shutil
import sys
import time
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB, DLEN = 30_000, 40
TOP_V, N_MERGES, MIN_FREQ = 50_000, 200, 2

# deterministic synthetic word list: letter 5-7-grams from a seeded rng
_rng = np.random.default_rng(20260819)
_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))
_WORDS = ["".join(_LETTERS[_rng.integers(0, 26, int(n))])
          for n in _rng.integers(5, 8, VOCAB)]


def gen(path: str, n_docs: int, chunk: int = 50_000) -> None:
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(7)
    w = 1.0 / np.arange(1, VOCAB + 1)
    w /= w.sum()
    words = np.array(_WORDS, dtype=object)
    for i, start in enumerate(range(0, n_docs, chunk)):
        m = min(chunk, n_docs - start)
        draw = rng.choice(VOCAB, size=(m, DLEN), p=w)
        texts = [" ".join(words[r]) for r in draw]
        pq.write_table(
            pa.table({"doc_id": pa.array(range(start, start + m), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(path, f"part-{i:04d}.parquet"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/ptt_bpe_soak")
    args = ap.parse_args()

    data = os.path.join(args.out, "docs")
    marker = os.path.join(args.out, "manifest.json")
    key = {"docs": args.docs, "v": 1}
    if not (os.path.exists(marker) and json.load(open(marker)) == key):
        shutil.rmtree(data, ignore_errors=True)
        print(f"generating {args.docs:,} docs ...", file=sys.stderr)
        gen(data, args.docs)
        with open(marker, "w") as f:
            json.dump(key, f)

    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pttcrawler_ray.textops.bpe import (bpe_token_counts,
                                            train_bpe_distributed)
    from pttcrawler_ray.util.rayops import read_parquet_clean

    ds = read_parquet_clean(data)
    t0 = time.time()
    merges = train_bpe_distributed(ds, n_merges=N_MERGES, top_v=TOP_V,
                                   min_freq=MIN_FREQ)
    t_train = time.time() - t0
    t0 = time.time()
    got = bpe_token_counts(read_parquet_clean(data), merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)  # 3 int cols
    t_encode = time.time() - t0
    ray.shutdown()

    # sequential replay: independent Counter count + same documented spec
    t0 = time.time()
    wcount: "Counter[str]" = Counter()
    files = sorted(os.path.join(data, f) for f in os.listdir(data))
    texts_by_file = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "text"])
        texts_by_file.append((t["doc_id"].to_numpy(), t["text"].to_pylist()))
        for s in texts_by_file[-1][1]:
            wcount.update(s.split())
    wtop = sorted(wcount.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_V]
    from pttcrawler_ray.textops.bpe import encode_word, train_bpe

    exp_merges = train_bpe(wtop, n_merges=N_MERGES, min_freq=MIN_FREQ)
    ranks = {p: i for i, p in enumerate(exp_merges)}
    cache: "dict[str, int]" = {}
    ids_all, nt_all, nb_all = [], [], []
    for fids, ftexts in texts_by_file:
        for did, s in zip(fids, ftexts):
            ws = s.split()
            n = 0
            for w in ws:
                c = cache.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    cache[w] = c
                n += c
            ids_all.append(int(did))
            nt_all.append(len(ws))
            nb_all.append(n)
    t_oracle = time.time() - t0
    order = np.argsort(np.array(ids_all))
    ids_a = np.array(ids_all)[order]
    nt_a = np.array(nt_all)[order]
    nb_a = np.array(nb_all)[order]

    ok = (merges == exp_merges
          and np.array_equal(got["doc_id"].to_numpy(np.int64), ids_a)
          and np.array_equal(got["n_tokens"].to_numpy(np.int64), nt_a)
          and np.array_equal(got["n_bpe_tokens"].to_numpy(np.int64), nb_a))

    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "metric": "BPE soak (distributed word count -> driver merges -> "
                  "streaming encode) vs sequential replay",
        "n_docs": args.docs, "vocab_words": VOCAB, "n_merges": len(merges),
        "train_sec": round(t_train, 1), "encode_sec": round(t_encode, 1),
        "oracle_sec": round(t_oracle, 1),
        "docs_per_sec_encode": round(args.docs / t_encode, 0),
        "tokens_encoded": int(got["n_tokens"].sum()),
        "bpe_tokens_out": int(got["n_bpe_tokens"].sum()),
        "driver_peak_rss_gb": round(peak, 2),
        "exact_match": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
