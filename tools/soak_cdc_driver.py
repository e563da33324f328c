"""End-to-end soak of the one-call continuous-crawl driver
(pipelines/cdc.py) at a real crawl scale.

Three crawls of a ~20k-article versioned corpus (A: as-of + date
filter, B: full latest, C: pruning re-crawl) run through
cdc_init → cdc_update → cdc_update with BM25 maintenance on, then the
whole composition is verified:

- the persisted url map covers exactly the final corpus' docs;
- `current_keepers(dedup_state)` satisfies the dedup equality contract
  vs a from-scratch batch `minhash_dedup` over the final corpus under
  the persisted ids: EXACT when no LSH bucket exceeds MAX_BUCKET_DOCS
  anywhere in history, else one-sided — the incremental set never
  over-drops (want ⊆ got) and every excess keeper must be
  batch-dominated by a smaller id (a cap-window artifact; this corpus'
  boilerplate families exceed the cap, which is how the round-5 soak
  DISCOVERED the history-dependence — see incremental.py);
- an indexed BM25 query over the maintained store EXACTLY equals the
  same query over a from-scratch rebuild on the final corpus.

Reports per-phase wall times, churn counts, and the cap-excess count.

Run from the repo root:  python tools/soak_cdc_driver.py [--articles N]
"""

import argparse
import json
import os
import resource
import sys
import time
from datetime import timedelta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _peak_rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", type=int, default=20_000)
    ap.add_argument("--out", default="/tmp/ptt_cdc_soak")
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().enable_tensor_extension_casting = False

    import ray.data as rd

    from pttcrawler_ray.fixtures import _EPOCH, generate_corpus
    from pttcrawler_ray.pipelines.cdc import cdc_init, cdc_update
    from pttcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    from pttcrawler_ray.textops.prepare import docs_from_crawl

    corpus = os.path.join(args.out, "corpus")
    if not os.path.exists(os.path.join(corpus, "manifest.json")):
        generate_corpus(corpus, total_articles=args.articles, n_boards=4,
                        dup_fraction=0.3)
    times: dict = {}
    base = dict(num_shards=4, strict_order=False, record_order=False,
                round_seconds=3600.0)
    # snapshot timeline: base versions at day 30 + 1 min per article, so
    # an as-of 80% through it makes crawl A see ~80% of the corpus (a
    # corpus-sized bootstrap), B add the rest + re-edits, C prune by date
    crawls = {
        "a": CrawlConfig(**base,
                         asof_ts=_EPOCH + timedelta(
                             days=30, minutes=int(args.articles * 0.8)),
                         start_date=_EPOCH + timedelta(hours=6)),
        "b": CrawlConfig(**base),
        "c": CrawlConfig(**base, start_date=_EPOCH + timedelta(hours=10)),
    }
    for name, cfg in crawls.items():
        out = os.path.join(args.out, name)
        if not os.path.exists(os.path.join(out, "summary.json")):
            t0 = time.time()
            run_crawl(corpus, out, cfg)
            times[f"crawl_{name}"] = round(time.time() - t0, 1)

    import shutil

    work = os.path.join(args.out, "work")
    shutil.rmtree(work, ignore_errors=True)
    t0 = time.time()
    s0 = cdc_init(os.path.join(args.out, "a"), work, threshold=0.6,
                  bm25=True)
    times["cdc_init"] = round(time.time() - t0, 1)
    rounds = [s0]
    for name in ("b", "c"):
        t0 = time.time()
        rounds.append(cdc_update(os.path.join(args.out, name), work))
        times[f"cdc_update_{name}"] = round(time.time() - t0, 1)

    # final-corpus truth under the persisted id assignment
    import pyarrow.dataset as pads

    m = pads.dataset(os.path.join(work, "url_map")).to_table()
    id_of = dict(zip(m["url"].to_pylist(), m["doc_id"].to_pylist()))
    docs_c = docs_from_crawl(os.path.join(args.out, "c")).to_pandas()
    assert set(docs_c["url"]) == set(id_of), (
        len(set(docs_c["url"]) ^ set(id_of)))
    final_rows = [{"doc_id": id_of[u], "text": t}
                  for u, t in zip(docs_c["url"], docs_c["text"])]

    from pttcrawler_ray.textops.dedup import minhash_dedup
    from pttcrawler_ray.textops.incremental import current_keepers

    t0 = time.time()
    want = set(minhash_dedup(rd.from_items(final_rows),
                             threshold=0.6).to_pandas()["doc_id"])
    times["batch_oracle"] = round(time.time() - t0, 1)
    got = set(current_keepers(os.path.join(work, "dedup_state"))
              .to_pandas()["doc_id"])
    # Equality contract under degenerate buckets (incremental.py
    # docstring): the MAX_BUCKET_DOCS cap is HISTORY-DEPENDENT — this
    # corpus' boilerplate families exceed the cap, and removing low-id
    # docs slides the batch run's 256-smallest window up, creating
    # pairs the incremental history never saw.  The divergence is
    # structurally ONE-SIDED: monotone ids mean later adds never
    # displace earlier docs from a cap window and removals only ADD
    # batch pairs, so incremental keeps a SUPERSET and never over-drops.
    # Assert exactly that: want ⊆ got, and every excess keeper is
    # batch-dominated (dropped there by a smaller-id pair) — i.e. a cap
    # artifact, not a lost drop.
    over_dropped = want - got
    excess = sorted(got - want)
    keepers_ok = not over_dropped
    if excess:
        from pttcrawler_ray.textops.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(rd.from_items(final_rows),
                                  threshold=0.6).to_pandas()
        import collections

        comp_min: dict = {}
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        keepers_ok = keepers_ok and all(find(x) < x for x in excess)

    # BM25: maintained store == rebuild over the final corpus
    from pttcrawler_ray.textops.bm25index import (bm25_topk_indexed,
                                                  build_bm25_index)

    # query terms drawn from the corpus itself (the generated content is
    # CJK-ish — fixed English terms would match nothing)
    from collections import Counter

    tok_counts = Counter()
    for t in docs_c["text"].head(500):
        tok_counts.update(t.split())
    common = [w for w, _ in tok_counts.most_common(6)]
    queries = [(0, " ".join(common[:3])), (1, " ".join(common[3:6]))]
    rebuilt = os.path.join(args.out, "bm25_rebuilt")
    build_bm25_index(
        rd.from_items(final_rows).map_batches(
            lambda t: t, batch_format="pyarrow"),
        rebuilt, n_parts=32)
    cols = ["query_id", "score_ppm", "doc_id"]
    got_ds = bm25_topk_indexed(os.path.join(work, "bm25"), queries,
                               topk=20)
    want_ds = bm25_topk_indexed(rebuilt, queries, topk=20)
    n_hits = got_ds.count()
    assert n_hits > 0, "query terms matched nothing — vacuous compare"
    got_q = got_ds.to_pandas().sort_values(cols).reset_index(drop=True)
    want_q = want_ds.to_pandas().sort_values(cols).reset_index(drop=True)
    bm25_ok = got_q[cols].equals(want_q[cols])

    ok = keepers_ok and bm25_ok
    print(json.dumps({
        "metric": "one-call CDC driver soak (3 crawls; dedup + BM25 "
                  "maintenance == from-scratch over the final corpus)",
        "articles": args.articles,
        "rounds": rounds,
        "final_docs": len(final_rows),
        "final_keepers": len(got),
        "batch_keepers": len(want),
        "over_dropped": len(over_dropped),
        "cap_excess_keepers": len(excess),
        "keepers_contract_ok": keepers_ok,
        "bm25_exact": bm25_ok,
        "times_sec": times,
        "driver_peak_rss_gb": _peak_rss_gb(),
        "exact_match": ok,
    }))
    assert ok
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
