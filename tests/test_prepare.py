"""End-to-end test of the composed training-data preparation pipeline
(``textops/prepare.py``): every stage's expected effect is planted into
the corpus, the split/mix assignments are recomputed with the pure hash
functions, and the packing offsets are checked against the DuckDB window
oracle over the WRITTEN train split — catching interface drift between
stages that the per-op tests can't."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def _mk_corpus():
    """Planted corpus: 40 clean docs, 5 junk (no stopwords), a near-dup
    pair (200, 201), and two contaminated docs (300, 301) sharing a
    5-gram with the benchmark."""
    ids, texts = [], []
    for i in range(40):
        ids.append(i)
        texts.append(f"the quick brown fox number{i} jumps over the lazy dog "
                     f"and it runs to the river bend{i} where the water is "
                     f"cold and the evening was long for the walk {i}")
    for i in range(5):
        ids.append(100 + i)
        texts.append(" ".join(f"zz{i}x{j}" for j in range(40)))  # no stopwords
    base = ("the cat sat on the mat and the dog sat too while the bird "
            "flew over the tall green tree by the old red barn") * 3
    ids += [200, 201]
    texts += [base, base + " extra tail tokens"]
    marker = "alpha bravo charlie delta echo"
    fillers = ["the rain fell on the quiet hill as the morning came slowly",
               "a boat drifted down the wide calm river past the small town"]
    for j, did in enumerate((300, 301)):
        ids.append(did)
        texts.append(f"this is a clean document about the weather {j} and "
                     f"it contains the marker phrase {marker} in the middle "
                     f"while {fillers[j]} for the contamination check {j}")
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())}), marker


def test_prepare_end_to_end(ray_session, tmp_path):
    from pttcrawler_ray.textops.prepare import prepare
    from pttcrawler_ray.textops.sampling import ppm_threshold, splitmix64

    corpus, marker = _mk_corpus()
    bench = pa.table({
        "doc_id": pa.array([9000], pa.int64()),
        "text": pa.array([f"benchmark question mentioning {marker} verbatim"]),
    })
    dest = tmp_path / "layout"
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    mix = {"en": 0.8}
    m = prepare(rd.from_arrow(corpus), rd.from_arrow(bench), str(dest),
                quality_min=0.3, dedup_threshold=0.7, decontam_n=5,
                ratios=ratios, mix_rates=mix, mix_group="pred_lang",
                seq_len=64, split_salt=7, mix_salt=11)

    # ---- stage counts: junk dropped by curate, 201 deduped, 300/301
    # contaminated
    s = m["stages"]
    assert s["input_docs"] == 49
    assert s["curated_docs"] == 43          # -5 junk, -1 near-dup
    assert s["contaminated_docs"] == 2

    # ---- expected post-decontam id set
    expect_ids = sorted(set(range(40)) | {200})
    # per-doc predicted language for the mix-rate lookup (LangId's own
    # correctness is pinned in test_textops; here it only names the group)
    from pttcrawler_ray.textops.analysis import LangId

    id2text = dict(zip(corpus["doc_id"].to_pylist(),
                       corpus["text"].to_pylist()))
    pred = LangId()(pa.table({
        "doc_id": pa.array(expect_ids, pa.int64()),
        "text": pa.array([id2text[i] for i in expect_ids]),
    }))["pred_lang"].to_pylist()
    # ---- recompute split + mix with the pure hash (the deterministic,
    # coordination-free contract)
    arr = np.array(expect_ids, np.uint64)
    h = splitmix64(arr + np.uint64(7))
    b_train = np.uint64(ppm_threshold(800_000))
    b_val = np.uint64(ppm_threshold(900_000))
    split = np.where(h < b_train, "train", np.where(h < b_val, "val", "test"))
    hm = splitmix64(arr + np.uint64(11))
    expect = {}
    for did, sp, hmix, lang in zip(arr, split, hm, pred):
        rate_thr = ppm_threshold(800_000) if lang == "en" else None
        if sp == "train" and rate_thr is not None and \
                not hmix <= np.uint64(max(rate_thr - 1, 0)):
            continue  # mixed out of the train split
        expect.setdefault(str(sp), set()).add(int(did))

    for label in ratios:
        got = pq.read_table(str(dest / "docs" / f"split={label}"))
        assert set(got["doc_id"].to_pylist()) == expect.get(label, set()), label
        assert set(got.column_names) == {"doc_id", "text", "quality",
                                         "pred_lang"}
        assert s[f"docs_{label}"] == len(expect.get(label, set()))

    # ---- packing offsets vs the DuckDB window oracle over the WRITTEN
    # train split (composition check: pack consumed exactly what was
    # written)
    import duckdb

    from pttcrawler_ray.textops.packing import pack_sql

    con = duckdb.connect()
    con.execute(f"CREATE VIEW tr AS SELECT * FROM "
                f"read_parquet('{dest}/docs/split=train/*.parquet')")
    oracle = con.execute(
        pack_sql("tr", seq_len=64) + " ORDER BY doc_id").fetch_arrow_table()
    got = pq.read_table(str(dest / "pack_train")).sort_by("doc_id")
    assert got.num_rows == oracle.num_rows == s["pack_rows"]
    for col in ("doc_id", "n_tok", "tok_start", "start_example",
                "start_offset", "end_example"):
        assert got[col].to_pylist() == oracle[col].to_pylist(), col
    total = con.execute(
        "SELECT coalesce(sum(len(regexp_extract_all(text, '\\S+')) + 1), 0) "
        "FROM tr").fetchone()[0]
    assert s["train_tokens_with_eos"] == int(total)

    # manifest round-trips from disk
    on_disk = json.loads((dest / "manifest.json").read_text())
    assert on_disk["stages"] == s


def test_prepare_cli(ray_session, tmp_path):
    """CLI subprocess smoke (own process = own Ray session)."""
    import subprocess
    import sys

    corpus, marker = _mk_corpus()
    src = tmp_path / "docs.parquet"
    bsrc = tmp_path / "bench.parquet"
    pq.write_table(corpus, src)
    pq.write_table(pa.table({
        "doc_id": pa.array([9000], pa.int64()),
        "text": pa.array([f"eval row with {marker} inside"])}), bsrc)
    dest = tmp_path / "layout"
    out = subprocess.run(
        [sys.executable, "-m", "pttcrawler_ray", "prepare",
         "--input", str(src), "--benchmark", str(bsrc), "--dest", str(dest),
         "--threshold", "0.7", "--ratios", "train=0.9", "val=0.1",
         "--seq-len", "128", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["input_docs"] == 49 and stats["contaminated_docs"] == 2
    assert stats["docs_train"] + stats["docs_val"] == 41
    assert (dest / "manifest.json").exists()


def test_prepare_perplexity_gate(ray_session, tmp_path):
    """The CCNet-style LM gate sits between curate and decontamination:
    junk docs (disjoint gibberish vocab → OOV-heavy → high cross-entropy)
    are dropped by xent_max_ppm, the manifest counts them, and no gated
    doc reaches any split file."""
    from pttcrawler_ray.textops.perplexity import (perplexity_docs,
                                                   train_unigram_lm)
    from pttcrawler_ray.textops.prepare import prepare

    corpus, _ = _mk_corpus()
    # disarm the quality/stopword filters so the junk docs survive curate
    # and the LM gate is the only thing that can remove them; near-dup
    # still drops 201
    curated_ids = sorted(set(corpus["doc_id"].to_pylist()) - {201})
    cur_tbl = corpus.filter(
        pa.compute.is_in(corpus["doc_id"],
                         value_set=pa.array(curated_ids, pa.int64())))
    scores = perplexity_docs(rd.from_arrow(cur_tbl), top_v=24).to_pandas() \
        .set_index("doc_id")["xent_ppm"]
    junk = [100 + i for i in range(5)]
    thr = int(min(scores.loc[junk]) - 1)
    assert max(scores.drop(junk)) <= thr, "corpus no longer separates"

    dest = tmp_path / "gated"
    m = prepare(rd.from_arrow(corpus), None, str(dest), quality_min=-1.0,
                dedup_threshold=0.7, ratios={"train": 0.9, "val": 0.1},
                seq_len=64, split_salt=7, xent_max_ppm=thr, ppl_top_v=24,
                require_stopwords=False)
    s = m["stages"]
    assert s["curated_docs"] == len(curated_ids)  # pre-gate curate count
    assert s["perplexity_dropped"] == 5
    assert s["docs_train"] + s["docs_val"] == len(curated_ids) - 5
    assert m["params"]["xent_max_ppm"] == thr
    written = set()
    for label in ("train", "val"):
        written |= set(pq.read_table(
            str(dest / "docs" / f"split={label}"))["doc_id"].to_pylist())
    assert written == set(curated_ids) - set(junk)

    # the bounded-vocab LM the gate trains is the same one scored above
    lm = train_unigram_lm(rd.from_arrow(cur_tbl), top_v=24)
    assert len(lm["vocab"]) == 24


def test_prepare_span_and_classifier_gates(ray_session, tmp_path):
    """The two round-4 gates compose: span-dedup rewrites BEFORE curation
    (boilerplate never inflates quality stats) and the Pareto classifier
    gate drops after curation; manifest counts equal a manual replay of
    the same stages over the same intermediates."""
    from pttcrawler_ray.textops.classifier import (classifier_scores,
                                                   fit_bucket_counts,
                                                   log_ratio_table)
    from pttcrawler_ray.textops.curate import curate
    from pttcrawler_ray.textops.prepare import prepare
    from pttcrawler_ray.textops.spandedup import span_dedup

    corpus, _ = _mk_corpus()
    # plant a repeated 4-token span: doc 0's opener spliced into doc 5
    texts = corpus["text"].to_pylist()
    texts[5] = "the quick brown fox number0 " + texts[5]
    corpus = pa.table({"doc_id": corpus["doc_id"],
                       "text": pa.array(texts, pa.string())})
    target = pa.table({
        "doc_id": pa.array([9100, 9101], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog "
                          "and the evening was long",
                          "the rain fell on the quiet hill and the water "
                          "is cold by the river"])})

    dest = tmp_path / "layout"
    m = prepare(rd.from_arrow(corpus), None, str(dest),
                quality_min=0.3, dedup_threshold=0.7,
                ratios={"train": 0.8, "val": 0.1, "test": 0.1},
                split_salt=7, seq_len=64, span_k=4,
                classifier_target=rd.from_arrow(target),
                pareto_alpha=2.0)
    s = m["stages"]

    # manual replay of the same stage chain
    spanned = span_dedup(rd.from_arrow(corpus), k=4).materialize()
    exp_span_dropped = int(spanned.to_pandas()["n_dropped"].sum())
    assert exp_span_dropped > 0
    assert s["span_tokens_dropped"] == exp_span_dropped

    clean = spanned.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": t["text_clean"]}),
        batch_format="pyarrow")
    kept = curate(clean, quality_min=0.3, dedup_threshold=0.7).materialize()
    assert s["curated_docs"] == kept.count()

    ratio = log_ratio_table(
        fit_bucket_counts(rd.from_arrow(target), buckets=4096),
        fit_bucket_counts(kept, buckets=4096))
    scored = classifier_scores(kept, ratio, pareto_alpha=2.0,
                               append=True).to_pandas()
    exp_kept_ids = set(scored.loc[scored["kept"] == 1, "doc_id"])
    assert 0 < len(exp_kept_ids) < len(scored)   # gate is non-vacuous
    assert s["classifier_dropped"] == len(scored) - len(exp_kept_ids)

    got_ids = set()
    for label in ("train", "val", "test"):
        part = dest / "docs" / f"split={label}"
        if part.exists():
            got_ids |= set(pq.read_table(str(part))["doc_id"].to_pylist())
    assert got_ids == exp_kept_ids


def test_docs_from_crawl_bridge_and_prepare(ray_session, tmp_path):
    """The crawl→training-corpus bridge: docs_from_crawl over a real
    crawl output equals the pandas oracle (url-hash ids, error rows and
    empty bodies dropped), and prepare() runs end-to-end over it."""
    from pttcrawler_ray.fixtures import generate_corpus
    from pttcrawler_ray.pipelines.crawl import (CrawlConfig, latest_articles,
                                                run_crawl)
    from pttcrawler_ray.textops.prepare import docs_from_crawl, prepare
    from pttcrawler_ray.util.hashing import hash_u64_many

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "crawl")
    generate_corpus(corpus, total_articles=120, n_boards=2)
    run_crawl(corpus, out, CrawlConfig(num_shards=2, strict_order=False,
                                       record_order=False,
                                       fetch_concurrency=1,
                                       process_concurrency=1))

    got = docs_from_crawl(out).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)

    # pandas oracle straight off the latest view
    arts = latest_articles(out).to_pandas()
    arts = arts[arts["error"].isna() & arts["content"].fillna("").ne("")]
    exp = arts.assign(
        doc_id=hash_u64_many(arts["url"].tolist()).view(np.int64),
        text=arts["content"])[["doc_id", "text", "url"]] \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 50
    assert got["doc_id"].is_unique
    pq_cols = ["doc_id", "text", "url"]
    assert got[pq_cols].equals(exp[pq_cols])

    # prepare over the bridge (permissive gates: CJK bodies have no
    # whitespace-token stopwords)
    dest = tmp_path / "layout"
    m = prepare(docs_from_crawl(out).select_columns(["doc_id", "text"]),
                None, str(dest), quality_min=-1.0, require_stopwords=False,
                dedup_threshold=0.95, ratios={"train": 0.9, "val": 0.1},
                seq_len=128)
    s = m["stages"]
    assert s["input_docs"] == len(exp)
    assert s["docs_train"] + s["docs_val"] == s["curated_docs"] > 0
    got_ids = set()
    for label in ("train", "val"):
        part = dest / "docs" / f"split={label}"
        if part.exists():
            got_ids |= set(pq.read_table(str(part))["doc_id"].to_pylist())
    assert got_ids <= set(exp["doc_id"])


def test_prepare_cli_from_crawl(ray_session, tmp_path):
    """CLI subprocess: prepare --from-crawl over a crawl output dir
    writes the (doc_id, url) map and a non-empty training layout."""
    import subprocess
    import sys

    from pttcrawler_ray.fixtures import generate_corpus
    from pttcrawler_ray.pipelines.crawl import CrawlConfig, run_crawl

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "crawl")
    generate_corpus(corpus, total_articles=80, n_boards=2)
    run_crawl(corpus, out, CrawlConfig(num_shards=2, strict_order=False,
                                       record_order=False,
                                       fetch_concurrency=1,
                                       process_concurrency=1))
    dest = tmp_path / "layout"
    res = subprocess.run(
        [sys.executable, "-m", "pttcrawler_ray", "prepare",
         "--input", out, "--dest", str(dest), "--from-crawl",
         "--quality-min=-1", "--no-require-stopwords",
         "--threshold", "0.95", "--ratios", "train=0.9", "val=0.1",
         "--seq-len", "128", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    umap = pq.read_table(str(dest / "url_map"))
    assert stats["input_docs"] == umap.num_rows > 30
    assert stats["docs_train"] + stats["docs_val"] > 0
    assert (dest / "manifest.json").exists()
