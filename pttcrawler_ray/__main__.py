"""CLI — the engine's counterpart to the reference's module registry
(reference ``crawler/__main__.py:57-76`` dispatching CrawlerModule members,
plus the standalone export.py / query.py entry points).

Subcommands::

    python -m pttcrawler_ray gen      --out DIR [--articles N] [--boards N]
    python -m pttcrawler_ray crawl    --corpus DIR --out DIR [--strict]
        [--start-date YYYY-MM-DD] [--upgrade] [--resume]
        [--seed-mode full|before|after] [--shards N] [--num-cpus N]
    python -m pttcrawler_ray export   --corpus DIR --crawl DIR --dest DIR
        [--format csv|json]
    python -m pttcrawler_ray pagejson --crawl DIR --dest DIR [--prefix P]
    python -m pttcrawler_ray query    --corpus DIR --crawl DIR --board-name B
        [--date-range START END]
    python -m pttcrawler_ray users    --corpus DIR
    python -m pttcrawler_ray asn      --corpus DIR --crawl DIR
    python -m pttcrawler_ray curate   --input DOCS.parquet --dest DIR
        [--quality-min Q] [--threshold J] [--langs L ...]
    python -m pttcrawler_ray dedup-inc [--input INC.parquet --dest DIR]
        --state DIR [--threshold J] [--remove IDS|PARQUET]
    python -m pttcrawler_ray cdc [--init] --crawl OUT --work DIR [--bm25]

The CLI owns its Ray session (``ray.init(address='local')``); library code
never initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime


def _valid_date(s: str) -> datetime:
    # the reference CLI validators accept both forms (utils.py:41-57)
    for fmt in ("%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise argparse.ArgumentTypeError(
        f'Given date ({s}) not valid! Expected "YYYY-MM-DD" or '
        f'"YYYY-MM-DD HH:MM"!')


def _init_ray(num_cpus: int | None):
    import ray

    kwargs = dict(address="local", include_dashboard=False,
                  ignore_reinit_error=True, logging_level="ERROR")
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    if not ray.is_initialized():
        ray.init(**kwargs)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="pttcrawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a synthetic pages corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--articles", type=int, default=600)
    g.add_argument("--boards", type=int, default=3)
    g.add_argument("--seed", type=int, default=42)

    c = sub.add_parser("crawl", help="run the frontier crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--strict", action="store_true",
                   help="exact reference per-site ordering (default: throughput mode)")
    c.add_argument("--start-date", type=_valid_date, default=None)
    c.add_argument("--upgrade", action="store_true")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--seed-mode", choices=["full", "before", "after"], default="full")
    c.add_argument("--index", nargs=2, type=int, metavar=("START", "END"),
                   help="explicit index-page range (reference --index)")
    c.add_argument("--index-only", action="store_true",
                   help="grow the frontier without fetching articles "
                        "(reference article_index module); fetch later with --resume")
    c.add_argument("--shards", type=int, default=4)
    c.add_argument("--num-cpus", type=int, default=None)

    e = sub.add_parser("export", help="denormalized Article/Push/User sheets")
    e.add_argument("--corpus", required=True)
    e.add_argument("--crawl", required=True)
    e.add_argument("--dest", required=True)
    e.add_argument("--format", choices=["csv", "json", "ods"], default="csv")

    pj = sub.add_parser("pagejson", help="per-index-page JSON files (reference layout)")
    pj.add_argument("--crawl", required=True)
    pj.add_argument("--dest", required=True)
    pj.add_argument("--prefix", default="")

    q = sub.add_parser("query", help="TW vs non-TW ip report for a board")
    q.add_argument("--corpus", required=True)
    q.add_argument("--crawl", required=True)
    q.add_argument("--board-name", required=True, type=str.lower)
    q.add_argument("--date-range", nargs=2, type=_valid_date, metavar=("START", "END"))

    u = sub.add_parser("users", help="user-screen extraction table")
    u.add_argument("--corpus", required=True)

    a = sub.add_parser("asn", help="enrich crawled ips against the asn db")
    a.add_argument("--corpus", required=True)
    a.add_argument("--crawl", required=True)

    cu = sub.add_parser("curate", help="training-data curation: quality -> "
                        "langid -> filter -> near-dup removal over a "
                        "(doc_id, text) parquet")
    cu.add_argument("--input", required=True, help="documents parquet file/dir")
    cu.add_argument("--dest", required=True, help="output parquet directory")
    cu.add_argument("--quality-min", type=float, default=0.3)
    cu.add_argument("--threshold", type=float, default=0.8,
                    help="near-dup Jaccard threshold")
    cu.add_argument("--langs", nargs="*", default=None,
                    help="keep only these predicted languages")
    cu.add_argument("--num-cpus", type=int, default=None)

    sp = sub.add_parser("spandedup", help="repeated-span exact-substring "
                        "dedup (Lee et al. 2021): cut non-first occurrences "
                        "of repeated K-token spans over a (doc_id, text) "
                        "parquet")
    sp.add_argument("--input", required=True, help="documents parquet file/dir")
    sp.add_argument("--dest", required=True, help="output parquet directory")
    sp.add_argument("--k", type=int, default=50,
                    help="span width in tokens (Lee et al. use 50)")
    sp.add_argument("--min-count", type=int, default=2)
    sp.add_argument("--num-cpus", type=int, default=None)

    pr = sub.add_parser("prepare", help="full training-data preparation: "
                        "curate -> decontaminate -> split -> domain-mix -> "
                        "pack, writing a training-ready parquet layout")
    pr.add_argument("--input", required=True, help="documents parquet file/dir")
    pr.add_argument("--dest", required=True, help="output layout directory")
    pr.add_argument("--from-crawl", action="store_true",
                    help="treat --input as a crawl output dir: build the "
                         "corpus from its latest-article view (doc_id = "
                         "url hash; error rows and empty bodies dropped) "
                         "and write the (doc_id, url) map to "
                         "<dest>/url_map/")
    pr.add_argument("--benchmark",
                    help="held-out benchmark (doc_id, text) parquet to "
                         "decontaminate against; omit to skip.  Benchmark "
                         "rows also present in --input will self-report as "
                         "contaminated (and be dropped) — exclude eval doc "
                         "ids from --input if that is not wanted")
    pr.add_argument("--quality-min", type=float, default=0.3)
    pr.add_argument("--no-require-stopwords", action="store_true",
                    help="keep docs with zero (whitespace-token) stopword "
                         "ratio — required for CJK corpora (e.g. a "
                         "--from-crawl run), whose text has no spaces")
    pr.add_argument("--threshold", type=float, default=0.8,
                    help="near-dup Jaccard threshold")
    pr.add_argument("--langs", nargs="*", default=None)
    pr.add_argument("--decontam-ngram", type=int, default=5)
    pr.add_argument("--ratios", nargs="*",
                    default=["train=0.98", "val=0.01", "test=0.01"],
                    metavar="LABEL=FRAC")
    pr.add_argument("--mix", nargs="*", default=None, metavar="LANG=RATE",
                    help="per-language keep rates for the train split")
    pr.add_argument("--seq-len", type=int, default=512)
    pr.add_argument("--max-xent-ppm", type=int, default=None,
                    help="CCNet-style perplexity gate: drop curated docs "
                         "whose unigram-LM cross-entropy (nats, ppm) "
                         "exceeds this; omit to skip the LM stage")
    pr.add_argument("--ppl-top-v", type=int, default=50_000,
                    help="LM vocabulary size for --max-xent-ppm")
    pr.add_argument("--span-k", type=int, default=None,
                    help="repeated-span dedup (Lee et al. 2021): cut "
                         "non-first occurrences of repeated K-token spans "
                         "BEFORE curation; omit to skip")
    pr.add_argument("--classifier-target", default=None,
                    help="high-quality target (doc_id, text) parquet: fit "
                         "the GPT-3-style hashed-ngram quality classifier "
                         "against the curated corpus and keep docs by the "
                         "pareto_draw > 1 - score rule; omit to skip")
    pr.add_argument("--pareto-alpha", type=float, default=9.0,
                    help="Pareto shape for --classifier-target (GPT-3: 9)")
    pr.add_argument("--num-cpus", type=int, default=None)

    di = sub.add_parser("dedup-inc", help="incremental near-dup removal: "
                        "dedup a (doc_id, text) increment against a "
                        "persisted state store of all previously seen docs")
    di.add_argument("--input", help="increment parquet file/dir (omit to "
                    "only apply --remove deletes)")
    di.add_argument("--state", required=True, help="state store directory "
                    "(created on first increment)")
    di.add_argument("--dest", help="output parquet directory (required "
                    "with --input)")
    di.add_argument("--threshold", type=float, default=0.7)
    di.add_argument("--remove", help="CDC deletes applied BEFORE the "
                    "increment: comma-separated doc_ids or a parquet "
                    "file/dir with a doc_id column (the `removed` side "
                    "of `diff` plus superseded changed-old ids)")
    di.add_argument("--num-cpus", type=int, default=None)

    an = sub.add_parser("ann", help="similarity index: build/append/query a "
                        "persisted IVF or IVF-PQ store over a "
                        "(vec_id, embedding) parquet")
    an.add_argument("--action", choices=["build", "append", "query"],
                    required=True)
    an.add_argument("--index", required=True, help="index directory")
    an.add_argument("--input", required=True,
                    help="embeddings parquet (vectors for build/append; "
                         "query vectors are read from it by --query-ids)")
    an.add_argument("--pq", action="store_true",
                    help="build an IVF-PQ code-column store (append/query "
                         "auto-detect the store kind)")
    an.add_argument("--clusters", type=int, default=16)
    an.add_argument("--query-ids", nargs="*", type=int, default=[0])
    an.add_argument("--k", type=int, default=5)
    an.add_argument("--nprobe", type=int, default=4)
    an.add_argument("--refine", type=int, default=4,
                    help="IVF-PQ rerank multiplier")
    an.add_argument("--num-cpus", type=int, default=None)

    df = sub.add_parser("diff", help="snapshot CDC: diff two crawl "
                        "outputs' latest views into (url, status in "
                        "added/changed/removed) rows")
    df.add_argument("--a", required=True, help="earlier crawl output dir")
    df.add_argument("--b", required=True, help="later crawl output dir")
    df.add_argument("--dest", help="write the delta parquet here "
                                   "(omit to print counts only)")
    df.add_argument("--num-cpus", type=int, default=None)

    cd = sub.add_parser("cdc", help="continuous-crawl driver: diff a "
                        "re-crawl against the stored base and maintain "
                        "the dedup store / BM25 index + url-id map in "
                        "one call")
    cd.add_argument("--crawl", required=True, help="crawl output dir "
                    "(the first one with --init, a re-crawl after)")
    cd.add_argument("--work", required=True, help="CDC state directory")
    cd.add_argument("--init", action="store_true",
                    help="bootstrap the store from the first crawl")
    cd.add_argument("--threshold", type=float, default=0.7,
                    help="near-dup Jaccard threshold (init only)")
    cd.add_argument("--bm25", action="store_true",
                    help="also maintain a BM25 index (init only)")
    cd.add_argument("--num-cpus", type=int, default=None)

    bx = sub.add_parser("bm25", help="keyword index: build/append/remove/"
                        "compact/query a persisted term-hash-partitioned "
                        "inverted index over a (doc_id, text) parquet")
    bx.add_argument("--action", choices=["build", "append", "remove",
                                         "compact", "repair", "query"],
                    required=True)
    bx.add_argument("--index", required=True, help="index directory")
    bx.add_argument("--input",
                    help="documents parquet (required for build/append)")
    bx.add_argument("--parts", type=int, default=32,
                    help="term-hash partition count (build only)")
    bx.add_argument("--query", nargs="*", default=[],
                    metavar="TEXT", help="query strings (query only)")
    bx.add_argument("--remove", help="CDC deletes (remove only): "
                    "comma-separated doc_ids or a parquet with a doc_id "
                    "column (a changed url = remove old id + append new)")
    bx.add_argument("--topk", type=int, default=10)
    bx.add_argument("--num-cpus", type=int, default=None)

    sd = sub.add_parser("semdedup", help="semantic dedup (SemDeDup): "
                        "cluster a (vec_id, embedding) parquet and drop "
                        "per-cluster semantic duplicates, writing "
                        "(vec_id, cluster, kept) verdicts")
    sd.add_argument("--input", required=True, help="embeddings parquet file/dir")
    sd.add_argument("--dest", required=True, help="verdicts parquet directory")
    sd.add_argument("--clusters", type=int, default=16)
    sd.add_argument("--threshold", type=float, default=0.9)
    sd.add_argument("--distributed-train", action="store_true",
                    help="full-data Lloyd training instead of the "
                         "driver-sample trainer (the at-scale path)")
    sd.add_argument("--d4-drop-frac", type=float, default=None,
                    help="run the fused D4 plan (Tirumala et al. 2023): "
                         "after the SemDeDup scan also drop this fraction "
                         "of the most prototypical survivors per cluster "
                         "(adds a drop_stage column)")
    sd.add_argument("--num-cpus", type=int, default=None)

    di = sub.add_parser("dsir", help="DSIR importance resampling (Xie et "
                        "al. 2023): weight a raw (doc_id, text) corpus by "
                        "hashed-ngram similarity to a target corpus and "
                        "mark the Gumbel-top-k resample")
    di.add_argument("--raw", required=True, help="raw corpus parquet file/dir")
    di.add_argument("--target", required=True,
                    help="target-domain (doc_id, text) parquet file/dir")
    di.add_argument("--dest", required=True,
                    help="weights parquet directory (doc_id, n_grams, "
                         "logw_ppm, key_ppm, selected)")
    di.add_argument("--k", type=int, required=True,
                    help="resample size (docs to select)")
    di.add_argument("--buckets", type=int, default=10_000)
    di.add_argument("--salt", type=int, default=7)
    di.add_argument("--num-cpus", type=int, default=None)

    cs = sub.add_parser("corpus-stats", help="corpus statistics: top-K gram "
                        "counts, per-doc repetition scores, optional "
                        "benchmark decontamination over a (doc_id, text) "
                        "parquet")
    cs.add_argument("--input", required=True, help="documents parquet file/dir")
    cs.add_argument("--top-k", type=int, default=None,
                    help="top-K gram count (default 50; the full-corpus "
                         "count+shuffle is SKIPPED when only "
                         "--repetition-dest/--benchmark outputs are asked "
                         "for and --top-k is not given explicitly)")
    cs.add_argument("--ngram", type=int, default=1,
                    help="gram width for the top-K count (1=vocab, 2=bigrams)")
    cs.add_argument("--repetition-dest",
                    help="write per-doc repetition scores parquet here")
    cs.add_argument("--benchmark",
                    help="held-out benchmark (doc_id, text) parquet; reports "
                         "corpus docs sharing a word n-gram with it.  "
                         "Benchmark rows also present in --input will "
                         "self-report as contaminated — exclude eval doc "
                         "ids from --input if that is not wanted")
    cs.add_argument("--decontam-ngram", type=int, default=5)
    cs.add_argument("--benchmark-store",
                    help="use the partitioned contamination plan (for "
                         "benchmark sides too big to broadcast): the "
                         "sharded gram store is (re)built at this "
                         "directory, the corpus is bloom-prefiltered and "
                         "exactly rechecked per shard.  Same results as "
                         "the default broadcast plan")
    cs.add_argument("--num-cpus", type=int, default=None)

    sch = sub.add_parser("schedule", help="upsert/remove a recurring cron job "
                         "(reference schedule.py semantics)")
    sch.add_argument("--action", choices=["update", "remove"], required=True)
    sch.add_argument("--module", required=True,
                     help="engine CLI subcommand to schedule (e.g. crawl)")
    sch.add_argument("--args", default="", help="arguments for the subcommand")
    sch.add_argument("--start-datetime", type=_valid_date,
                     help="first-fire minute/hour anchor (update only)")
    sch.add_argument("--cycle-time", type=int, default=1,
                     help="run every N days of month (dom */N)")

    args = p.parse_args(argv)

    if args.cmd == "schedule":  # no Ray session needed
        from .pipelines.schedule import apply_schedule

        new = apply_schedule(args.action, args.module, args.args,
                             start=args.start_datetime,
                             cycle_days=args.cycle_time)
        print(new, end="")
        return 0

    if args.cmd == "gen":
        from .fixtures import generate_corpus

        manifest = generate_corpus(args.out, seed=args.seed,
                                   total_articles=args.articles,
                                   n_boards=args.boards)
        print(json.dumps({"boards": manifest["boards"],
                          "pages": manifest["n_pages_rows"]}))
        return 0

    _init_ray(getattr(args, "num_cpus", None))
    import ray

    try:
        if args.cmd == "crawl":
            from .pipelines.crawl import CrawlConfig, load_watermarks, run_crawl

            wm = (load_watermarks(args.out)
                  if args.seed_mode in ("before", "after") else None)
            cfg = CrawlConfig(num_shards=args.shards, strict_order=args.strict,
                              round_seconds=(30.0 if args.strict else 3600.0),
                              start_date=args.start_date, upgrade=args.upgrade,
                              seed_mode=args.seed_mode, prior_watermarks=wm,
                              index_range=tuple(args.index) if args.index else None,
                              index_only=args.index_only,
                              fetch_concurrency=4, process_concurrency=4)
            s = run_crawl(args.corpus, args.out, cfg, resume=args.resume)
            print(json.dumps({k: s[k] for k in ("rounds", "popped", "elapsed_s",
                                                "urls_per_sec")}))
        elif args.cmd == "curate":
            import shutil

            from .textops.curate import curate
            from .util.rayops import parquet_rows, read_parquet_clean

            # clean --dest first: write_parquet's uuid-named files would
            # otherwise coexist with a previous run's (stale rows in the
            # output, inflated kept_docs)
            shutil.rmtree(args.dest, ignore_errors=True)
            docs = read_parquet_clean(args.input)
            kept = curate(docs, quality_min=args.quality_min,
                          langs=args.langs, dedup_threshold=args.threshold)
            kept.write_parquet(args.dest)
            n_in = parquet_rows(args.input)
            n_kept = parquet_rows(args.dest)
            print(json.dumps({"input_docs": n_in, "kept_docs": n_kept,
                              "dropped": n_in - n_kept, "dest": args.dest}))
        elif args.cmd == "spandedup":
            import os
            import shutil

            import pyarrow.compute as pc

            from .textops.spandedup import span_dedup
            from .util.rayops import parquet_rows, read_parquet_clean

            shutil.rmtree(args.dest, ignore_errors=True)  # see curate
            out = span_dedup(read_parquet_clean(args.input), k=args.k,
                             min_count=args.min_count)
            out.write_parquet(args.dest)
            import pyarrow.parquet as _pq

            tot = dropped = 0
            for part in sorted(os.listdir(args.dest)):
                t = _pq.read_table(os.path.join(args.dest, part),
                                   columns=["n_tokens", "n_dropped"])
                tot += int(pc.sum(t["n_tokens"]).as_py() or 0)
                dropped += int(pc.sum(t["n_dropped"]).as_py() or 0)
            print(json.dumps({"input_docs": parquet_rows(args.input),
                              "docs": parquet_rows(args.dest),
                              "tokens": tot, "tokens_dropped": dropped,
                              "dest": args.dest}))
        elif args.cmd == "prepare":
            import os
            import shutil

            from .textops.prepare import docs_from_crawl, prepare
            from .util.rayops import read_parquet_clean

            shutil.rmtree(args.dest, ignore_errors=True)  # see curate

            def _kv(pairs, cast):
                return {k: cast(v) for k, v in
                        (s.split("=", 1) for s in pairs)} if pairs else None

            if args.from_crawl:
                from .pipelines.crawl import materialize_latest

                # pin the latest view ON DISK once, then stream the
                # bridge twice (url-map write + prepare input) — never
                # the whole corpus in the object store
                materialize_latest(args.input)
                docs_from_crawl(args.input) \
                    .select_columns(["doc_id", "url"]).write_parquet(
                        os.path.join(args.dest, "url_map"))
                docs_in = docs_from_crawl(args.input) \
                    .select_columns(["doc_id", "text"])
            else:
                docs_in = read_parquet_clean(args.input)
            manifest = prepare(
                docs_in,
                read_parquet_clean(args.benchmark) if args.benchmark else None,
                args.dest, quality_min=args.quality_min, langs=args.langs,
                dedup_threshold=args.threshold,
                decontam_n=args.decontam_ngram,
                ratios=_kv(args.ratios, float), mix_rates=_kv(args.mix, float),
                require_stopwords=not args.no_require_stopwords,
                seq_len=args.seq_len, xent_max_ppm=args.max_xent_ppm,
                ppl_top_v=args.ppl_top_v, span_k=args.span_k,
                classifier_target=read_parquet_clean(args.classifier_target)
                if args.classifier_target else None,
                pareto_alpha=args.pareto_alpha)
            print(json.dumps(manifest["stages"]))
        elif args.cmd == "dedup-inc":
            import os
            import shutil

            from .textops.incremental import (apply_removals,
                                              minhash_dedup_incremental,
                                              read_retro_drops)
            from .util.rayops import parquet_rows, read_parquet_clean

            if not args.input and not args.remove:
                p.error("dedup-inc needs --input and/or --remove")
            if args.input and not args.dest:
                p.error("--dest is required with --input")
            out = {"state": args.state}
            if args.remove:
                if os.path.exists(args.remove):
                    rm_ids = read_parquet_clean(
                        args.remove, columns=["doc_id"]
                    ).to_pandas()["doc_id"].tolist()
                else:
                    rm_ids = [int(x) for x in args.remove.split(",")]
                res = apply_removals(args.state, rm_ids,
                                     threshold=args.threshold)
                out.update(removed=len(rm_ids),
                           resurrected=res["doc_id"].to_pylist())
            if args.input:
                shutil.rmtree(args.dest, ignore_errors=True)  # see curate
                n_retro_before = read_retro_drops(args.state).num_rows
                kept = minhash_dedup_incremental(
                    read_parquet_clean(args.input), args.state,
                    threshold=args.threshold)
                kept.write_parquet(args.dest)
                n_in = parquet_rows(args.input)
                n_kept = parquet_rows(args.dest)
                n_retro = read_retro_drops(args.state).num_rows
                # retro_dropped: previously-KEPT docs this increment
                # demoted (a new doc bridged their component into
                # another); apply as deletes downstream — see
                # read_retro_drops
                out.update(input_docs=n_in, kept_docs=n_kept,
                           dropped=n_in - n_kept,
                           retro_dropped=n_retro - n_retro_before,
                           retro_total=n_retro, dest=args.dest)
            print(json.dumps(out))
        elif args.cmd == "diff":
            import shutil

            import pyarrow as pa

            from .pipelines.diff import diff_crawls

            delta = diff_crawls(args.a, args.b)
            if args.dest:
                shutil.rmtree(args.dest, ignore_errors=True)  # see curate
                delta = delta.materialize()
                delta.write_parquet(args.dest)

            def _status_counts(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                vc = pc.value_counts(t["status"])
                return pa.table({"status": vc.field("values"),
                                 "n": pc.cast(vc.field("counts"),
                                              pa.int64())})

            # streaming partial counts — never the full delta on the driver
            cdf = delta.map_batches(_status_counts,
                                    batch_format="pyarrow").to_pandas()
            counts = (cdf.groupby("status")["n"].sum().to_dict()
                      if len(cdf) else {})
            print(json.dumps({"a": args.a, "b": args.b,
                              "added": int(counts.get("added", 0)),
                              "changed": int(counts.get("changed", 0)),
                              "removed": int(counts.get("removed", 0)),
                              "dest": args.dest}))
        elif args.cmd == "cdc":
            from .pipelines.cdc import cdc_init, cdc_update

            if args.init:
                out = cdc_init(args.crawl, args.work,
                               threshold=args.threshold, bm25=args.bm25)
            else:
                out = cdc_update(args.crawl, args.work)
            print(json.dumps(out))
        elif args.cmd == "bm25":
            from .textops import bm25index as BX
            from .util.rayops import read_parquet_clean

            if args.action == "build":
                meta = BX.build_bm25_index(
                    read_parquet_clean(args.input,
                                       columns=["doc_id", "text"]),
                    args.index, n_parts=args.parts)
                print(json.dumps({"built": args.index, **meta}))
            elif args.action == "append":
                meta = BX.append_bm25_index(
                    read_parquet_clean(args.input,
                                       columns=["doc_id", "text"]),
                    args.index)
                print(json.dumps({"appended": args.index, **meta}))
            elif args.action == "remove":
                import os as _os

                if not args.remove:
                    p.error("--remove is required with --action remove")
                if _os.path.exists(args.remove):
                    rm_ids = read_parquet_clean(
                        args.remove, columns=["doc_id"]
                    ).to_pandas()["doc_id"].tolist()
                else:
                    rm_ids = [int(x) for x in args.remove.split(",")]
                meta = BX.remove_from_bm25_index(args.index, rm_ids)
                print(json.dumps({"removed": len(rm_ids), **meta}))
            elif args.action == "compact":
                meta = BX.compact_bm25_index(args.index)
                print(json.dumps({"compacted": args.index, **meta}))
            elif args.action == "repair":
                meta = BX.repair_bm25_index(args.index)
                print(json.dumps({"repaired": args.index, **meta}))
            else:
                queries = list(enumerate(args.query))
                stats: dict = {}
                res = BX.bm25_topk_indexed(args.index, queries,
                                           topk=args.topk,
                                           stats_out=stats).to_pandas()
                print(json.dumps({
                    "results": res.to_dict("records"),
                    "queries": {i: q for i, q in queries}, **stats}))
        elif args.cmd == "ann":
            import os

            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            from .textops import similarity as S
            from .util.rayops import read_parquet_clean

            def _is_pq_store() -> bool:
                return os.path.exists(os.path.join(args.index, "pq_meta.json"))

            if args.action == "build":
                ds = read_parquet_clean(args.input,
                                        columns=["vec_id", "embedding"])
                build = S.build_ivfpq_index if args.pq else S.build_ivf_index
                build(ds, args.index, n_clusters=args.clusters)
                print(json.dumps({"built": args.index, "pq": args.pq,
                                  "clusters": args.clusters}))
            elif args.action == "append":
                ds = read_parquet_clean(args.input,
                                        columns=["vec_id", "embedding"])
                app = S.append_ivfpq_index if _is_pq_store() else S.append_ivf_index
                n = app(ds, args.index)
                print(json.dumps({"appended": n, "pq": _is_pq_store()}))
            else:
                ids = sorted(set(args.query_ids))
                qds = read_parquet_clean(
                    args.input, columns=["vec_id", "embedding"],
                    filter=pc.field("vec_id").isin(pa.array(ids, pa.int64())))
                qdf = qds.to_pandas().set_index("vec_id").sort_index()
                q = np.stack(qdf.loc[ids, "embedding"])
                stats: dict = {}
                if _is_pq_store():
                    res = S.knn_ivfpq_indexed(args.index, q, k=args.k,
                                              nprobe=args.nprobe,
                                              refine=args.refine,
                                              stats_out=stats)
                else:
                    res = S.knn_ivf_indexed(args.index, q, k=args.k,
                                            nprobe=args.nprobe,
                                            stats_out=stats)
                out = res.to_pylist()
                for r in out:  # query_id -> the caller's vec_id
                    r["query_vec_id"] = ids[r.pop("query_id")]
                    r["cosine"] = round(r["cosine"], 6)
                print(json.dumps({
                    "pq": _is_pq_store(), "k": args.k, "nprobe": args.nprobe,
                    "stats": {k: v for k, v in stats.items()
                              if not isinstance(v, list)},
                    "neighbors": out}))
        elif args.cmd == "semdedup":
            from .textops.semdedup import d4, semdedup
            from .util.rayops import read_parquet_clean

            ds = read_parquet_clean(args.input,
                                    columns=["vec_id", "embedding"])
            if args.d4_drop_frac is not None:
                verdicts = d4(ds, n_clusters=args.clusters,
                              threshold=args.threshold,
                              drop_frac=args.d4_drop_frac,
                              distributed_train=args.distributed_train)
            else:
                verdicts = semdedup(ds, n_clusters=args.clusters,
                                    threshold=args.threshold,
                                    distributed_train=args.distributed_train)
            verdicts.write_parquet(args.dest)
            import ray.data as rd

            vd = rd.read_parquet(args.dest, columns=["kept"])
            total = vd.count()
            kept = vd.filter(expr="kept == 1").count()
            out = {"vectors": total, "kept": kept,
                   "dropped": total - kept, "clusters": args.clusters,
                   "threshold": args.threshold, "dest": args.dest}
            if args.d4_drop_frac is not None:
                sd_ = rd.read_parquet(args.dest, columns=["drop_stage"])
                out["d4_drop_frac"] = args.d4_drop_frac
                out["dropped_semdedup"] = sd_.filter(
                    expr="drop_stage == 1").count()
                out["dropped_prototype"] = sd_.filter(
                    expr="drop_stage == 2").count()
            print(json.dumps(out))
        elif args.cmd == "dsir":
            import ray.data as rd

            from .textops.dsir import dsir_select
            from .util.rayops import read_parquet_clean

            raw = read_parquet_clean(args.raw, columns=["doc_id", "text"])
            target = read_parquet_clean(args.target,
                                        columns=["doc_id", "text"])
            marked = dsir_select(raw, target, k=args.k,
                                 buckets=args.buckets, salt=args.salt)
            marked.write_parquet(args.dest)
            md = rd.read_parquet(args.dest, columns=["selected"])
            total = md.count()
            selected = md.filter(expr="selected == 1").count()
            print(json.dumps({"raw_docs": total, "selected": selected,
                              "k": args.k, "buckets": args.buckets,
                              "salt": args.salt, "dest": args.dest}))
        elif args.cmd == "corpus-stats":
            from .util.rayops import read_parquet_clean

            # run the (full-corpus count+shuffle) top-K pass only when
            # asked for: explicitly via --top-k, or implicitly when no
            # other output was requested
            want_top = (args.top_k is not None
                        or not (args.repetition_dest or args.benchmark))
            out = {"ngram": args.ngram}
            if want_top:
                from .textops.vocab import vocab_topk

                top = vocab_topk(read_parquet_clean(args.input),
                                 k=args.top_k or 50, n=args.ngram)
                out["top_grams"] = [[g, int(c)] for g, c in
                                    zip(top["gram"].to_pylist(),
                                        top["n"].to_pylist())]
            if args.repetition_dest:
                import shutil

                from .textops.analysis import repetition_batch

                shutil.rmtree(args.repetition_dest, ignore_errors=True)
                read_parquet_clean(args.input) \
                    .map_batches(repetition_batch, batch_format="pyarrow") \
                    .select_columns(["doc_id", "top_token_frac",
                                     "top_bigram_frac"]) \
                    .write_parquet(args.repetition_dest)
                out["repetition_dest"] = args.repetition_dest
            if args.benchmark:
                if args.benchmark_store:
                    import shutil

                    from .textops.decontam import (build_benchmark_store,
                                                   decontaminate_partitioned)

                    shutil.rmtree(args.benchmark_store, ignore_errors=True)
                    build_benchmark_store(read_parquet_clean(args.benchmark),
                                          args.benchmark_store,
                                          n=args.decontam_ngram)
                    hits = decontaminate_partitioned(
                        read_parquet_clean(args.input),
                        args.benchmark_store).to_pandas()
                else:
                    from .textops.decontam import decontaminate

                    hits = decontaminate(read_parquet_clean(args.input),
                                         read_parquet_clean(args.benchmark),
                                         n=args.decontam_ngram).to_pandas()
                out["contaminated_docs"] = int(len(hits))
                # sum of per-doc DISTINCT-hit counts (doc × gram pairs),
                # not a distinct-gram count
                out["contaminated_doc_gram_pairs"] = \
                    int(hits["n_hits"].sum()) if len(hits) else 0
            print(json.dumps(out))
        elif args.cmd == "export":
            from .pipelines.export import export_run

            print(json.dumps(export_run(args.crawl, args.corpus, args.dest,
                                        fmt=args.format)))
        elif args.cmd == "pagejson":
            from .pipelines.export import write_page_json

            n = write_page_json(args.crawl, args.dest, prefix=args.prefix)
            print(json.dumps({"files": n}))
        elif args.cmd == "query":
            from .pipelines.query import board_ip_report

            tbl = board_ip_report(args.crawl, args.corpus, args.board_name,
                                  date_range=tuple(args.date_range) if args.date_range else None)
            df = tbl.to_pandas()
            print(df.to_string(index=False))
        elif args.cmd == "users":
            from .pipelines.users import users_dataset

            df = users_dataset(args.corpus).to_pandas()
            print(df.to_string(index=False, max_rows=50))
        elif args.cmd == "asn":
            import os

            from .pipelines.asn import distinct_ips, enrich_ips
            from .pipelines.crawl import latest_articles
            from .stages.normalize import explode_pushes_batch

            latest = latest_articles(args.crawl)
            pushes = latest.map_batches(explode_pushes_batch, batch_format="pyarrow")
            dim = enrich_ips(distinct_ips(latest, pushes),
                             os.path.join(args.corpus, "asn_db.parquet"))
            df = dim.to_pandas()
            print(df.to_string(index=False, max_rows=30))
            print(json.dumps({"ips": len(df),
                              "resolved": int(df["asn"].notna().sum())}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
