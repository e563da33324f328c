"""Training-data ops: text analysis, dedup suite, similarity search,
multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(ray_session):
    return rd.read_parquet(f"{SF}/embeddings.parquet")


def test_token_count(docs):
    from pttcrawler_ray.textops.analysis import token_count_batch

    df = docs.map_batches(token_count_batch, batch_format="pyarrow").to_pandas()
    expect = df["text"].str.split().str.len()
    assert (df["n_tokens"] == expect).all()
    assert (df["n_subwords"] >= df["n_tokens"]).all()


def test_quality_score(docs):
    from pttcrawler_ray.textops.analysis import quality_score_batch

    df = docs.map_batches(quality_score_batch, batch_format="pyarrow").to_pandas()
    for col in ("alpha_ratio", "stop_ratio", "distinct_ratio", "quality"):
        assert df[col].between(0, 1).all(), col
    assert df["mean_token_len"].gt(0).all()
    # independent check on one row
    row = df.iloc[0]
    toks = row["text"].split()
    stop = sum(t.lower() in {"the", "a", "an", "and", "or", "of", "to", "in", "is",
                             "are", "was", "were", "be", "been", "on", "for",
                             "with", "as", "at", "by", "from", "that", "this",
                             "it", "not", "no"} for t in toks)
    assert row["stop_ratio"] == pytest.approx(stop / len(toks))
    assert row["distinct_ratio"] == pytest.approx(len(set(toks)) / len(toks))


def test_lang_id(ray_session):
    from pttcrawler_ray.textops.analysis import LangId

    ds = rd.from_items([
        {"i": 0, "text": "the cat sat on the mat and it was happy with that"},
        {"i": 1, "text": "der hund und die katze sind nicht in den garten"},
        {"i": 2, "text": "le chat et les chiens sont dans la maison pour une nuit"},
        {"i": 3, "text": "今天 天氣 真好 我們 一起 去 公園"},
        {"i": 4, "text": ""},
    ])
    # keyed, not positional: Ray Data only preserves block order with
    # preserve_order set, so under load rows may arrive reordered
    df = (ds.map_batches(LangId, batch_format="pyarrow", concurrency=1)
          .to_pandas().set_index("i").sort_index())
    assert df["pred_lang"].tolist()[:4] == ["en", "de", "fr", "zh"]
    assert df["pred_lang"].loc[4] == "und"
    assert df["lang_confidence"].loc[0] > 0.5


def test_fingerprint_deterministic(docs):
    from pttcrawler_ray.textops.analysis import fingerprint_batch

    df1 = docs.map_batches(fingerprint_batch, batch_format="pyarrow").to_pandas()
    df2 = docs.map_batches(fingerprint_batch, batch_format="pyarrow").to_pandas()
    m1 = dict(zip(df1["doc_id"], df1["text_hash"]))
    m2 = dict(zip(df2["doc_id"], df2["text_hash"]))
    assert m1 == m2
    fp = df1.iloc[0]["fingerprint"]
    assert len(fp) > 0


def test_exact_dedup(ray_session):
    from pttcrawler_ray.textops.dedup import exact_dedup

    rows = [{"doc_id": i, "text": f"unique text {i}"} for i in range(20)]
    rows += [{"doc_id": 100 + i, "text": "duplicated body"} for i in range(5)]
    out = exact_dedup(rd.from_items(rows)).to_pandas()
    assert len(out) == 21
    dups = out[out["text"] == "duplicated body"]
    assert dups["doc_id"].tolist() == [100]  # min id survives


def test_minhash_lsh(ray_session):
    from pttcrawler_ray.textops.dedup import minhash_dedup, minhash_lsh_pairs

    base = ("spark ray data cluster parquet arrow stream shard crawl frontier "
            "batch queue index sort merge join filter group window agg " * 3).split()
    rows = []
    for i in range(30):  # unrelated docs
        rng = np.random.default_rng(1000 + i)
        rows.append({"doc_id": i, "text": " ".join(rng.permutation([f"w{i}_{j}" for j in range(60)]))})
    rows.append({"doc_id": 200, "text": " ".join(base)})
    near = list(base)
    near[5] = "changed"
    rows.append({"doc_id": 201, "text": " ".join(near)})  # near-dup of 200

    ds = rd.from_items(rows)
    pairs = minhash_lsh_pairs(ds, threshold=0.6).to_pandas()
    assert [(200, 201)] == list(zip(pairs["doc_a"], pairs["doc_b"]))
    assert pairs["jaccard"].iloc[0] > 0.6

    kept = minhash_dedup(ds, threshold=0.6).to_pandas()
    assert 200 in set(kept["doc_id"]) and 201 not in set(kept["doc_id"])
    assert len(kept) == 31


def test_ngram_jaccard(ray_session):
    from pttcrawler_ray.textops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    base = [f"tok{i}" for i in range(60)]
    near = list(base)
    near[7] = "swapped"
    rows = [{"doc_id": 1, "text": " ".join(base)},
            {"doc_id": 2, "text": " ".join(near)}]
    for i in range(10, 40):
        rng = np.random.default_rng(i)
        rows.append({"doc_id": i, "text": " ".join(f"q{i}_{j}" for j in range(60))})
    ds = rd.from_items(rows)
    pairs = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    assert set(zip(pairs["doc_a"], pairs["doc_b"])) == {(1, 2)}
    # exact jaccard value: 58 shingles each (k=3), sharing all but 3+3 windows
    j = pairs["jaccard"].iloc[0]
    mh = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert j == mh[ (mh["doc_a"]==1) & (mh["doc_b"]==2) ]["jaccard"].iloc[0]


def test_simhash(ray_session):
    from pttcrawler_ray.textops.dedup import simhash_pairs

    base = [f"token{i}" for i in range(80)]
    near = list(base)
    near[3] = "spoon"
    rows = [{"doc_id": 1, "text": " ".join(base)},
            {"doc_id": 2, "text": " ".join(near)}]
    for i in range(10, 30):
        rng = np.random.default_rng(i)
        rows.append({"doc_id": i, "text": " ".join(f"z{i}_{j}" for j in range(80))})
    pairs = simhash_pairs(rd.from_items(rows), max_hamming=6).to_pandas()
    assert (1, 2) in set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert not any(a >= 10 for a in pairs["doc_a"])  # unrelated not paired


def test_embedding_neardup(ray_session):
    from pttcrawler_ray.textops.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16))
    vecs[7] = vecs[3] + rng.standard_normal(16) * 0.01  # near-dup pair (3,7)
    rows = [{"vec_id": i, "embedding": [float(x) for x in v]} for i, v in enumerate(vecs)]
    pairs = embedding_neardup_pairs(rd.from_items(rows), dim=16, threshold=0.98,
                                    bits=6).to_pandas()
    assert (3, 7) in set(zip(pairs["doc_a"], pairs["doc_b"]))


def test_knn_brute_matches_numpy(embs):
    from pttcrawler_ray.textops.similarity import knn_brute

    all_df = embs.to_pandas()
    mat = np.stack(all_df["embedding"])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = mat[:3]
    expected_sets = []
    for qi in range(3):
        sims = mat @ q[qi]
        top = np.argsort(-sims)[:5]
        expected_sets.append(set(all_df["vec_id"].iloc[top]))

    out = knn_brute(embs, q, k=5).to_pandas()
    for qi in range(3):
        got = set(out[out["query_id"] == qi]["vec_id"])
        assert got == expected_sets[qi]
    assert out.groupby("query_id")["rank"].apply(
        lambda s: s.tolist() == [1, 2, 3, 4, 5]).all()


def test_knn_ivf_recall(embs):
    from pttcrawler_ray.textops.similarity import knn_brute, knn_ivf

    all_df = embs.to_pandas()
    mat = np.stack(all_df["embedding"])
    q = mat[:5]
    brute = knn_brute(embs, q, k=5).to_pandas()
    ivf = knn_ivf(embs, q, k=5, n_clusters=8, nprobe=4).to_pandas()
    recalls = []
    for qi in range(5):
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        a = set(ivf[ivf["query_id"] == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6  # probing 4/8 clusters


def test_multimodal_stub(ray_session):
    from pttcrawler_ray.multimodal import FrameSample, decode_media, make_fake_blob

    with pytest.raises(NotImplementedError):
        FrameSample(3, fake=False)  # video codecs absent → marked stub

    # fake containers in real mode come back as typed error rows, never
    # silently fake-decoded
    strict = decode_media(
        rd.from_items([{"media_id": 1, "payload": make_fake_blob(1)}]),
        fake=False).to_pandas()
    assert strict["error"].iloc[0].startswith("codec unavailable")

    rows = [{"media_id": i, "payload": make_fake_blob(i)} for i in range(20)]
    rows.append({"media_id": 99, "payload": b"garbage-not-a-blob"})
    out = decode_media(rd.from_items(rows), fake=True, batch_size=8).to_pandas()
    ok = out[out["error"].isna()]
    assert len(ok) == 20
    assert (ok["channels"] == 3).all()
    assert ok["feature"].map(len).eq(16).all()
    f1 = out[out["media_id"] == 5]["feature"].iloc[0]
    f2 = decode_media(rd.from_items(rows[:6]), fake=True).to_pandas()
    assert list(f2[f2["media_id"] == 5]["feature"].iloc[0]) == list(f1)  # deterministic
    bad = out[out["media_id"] == 99]
    assert bad["error"].iloc[0] == "decode failed"


def test_degenerate_bucket_capped(ray_session):
    """Every LSH family must survive a degenerate class: identical/empty
    docs share one signature, putting the whole class in ONE band bucket.
    The MAX_BUCKET_DOCS cap bounds pair generation (O(cap²), not O(n²))
    while real near-dup pairs are still found and verified."""
    import random

    from pttcrawler_ray.textops.dedup import (MAX_BUCKET_DOCS,
                                              minhash_lsh_pairs,
                                              simhash_pairs)

    rng = random.Random(5)
    words = [f"w{i:04d}" for i in range(600)]
    base = " ".join(rng.choices(words, k=300))
    near = base.rsplit(" ", 6)[0] + " zz yy xx"  # high-jaccard twin
    rows = [{"doc_id": i, "text": ""} for i in range(2000)]  # degenerate class
    rows += [{"doc_id": 5000, "text": base}, {"doc_id": 5001, "text": near}]
    docs = rd.from_items(rows)

    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    got = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    assert (5000, 5001) in got
    # empty docs have no shingles → the verify stage rejects them all
    assert got == {(5000, 5001)}

    sp = simhash_pairs(docs, max_hamming=3)
    sgot = set(zip(sp["doc_a"].to_pylist(), sp["doc_b"].to_pylist()))
    assert (5000, 5001) in sgot
    # identical (empty) docs ARE hamming-0 near-dups, but the cap bounds
    # the per-bucket explosion to MAX_BUCKET_DOCS choose 2
    assert len(sgot) <= MAX_BUCKET_DOCS * (MAX_BUCKET_DOCS - 1) // 2 + 1


def test_embedding_neardup_planted(ray_session):
    """Near-dup embedding pairs with PLANTED twins: the query must find
    exactly the planted pairs (round-1 verdict: a 0-row result proves
    nothing).  Multi-table sign-LSH gives the recall."""
    from pttcrawler_ray.textops.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((200, 32))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(200)]
    for j in range(5):  # tiny-perturbation twins (cosine ≈ 0.999)
        v = base[j] + 0.01 * rng.standard_normal(32)
        rows.append({"vec_id": 1000 + j, "embedding": v.tolist()})

    pairs = embedding_neardup_pairs(rd.from_items(rows), dim=32,
                                    threshold=0.95, bits=8, tables=4)
    got = set(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    assert got == {(j, 1000 + j) for j in range(5)}  # exactly the planted twins
    assert all(c >= 0.95 for c in pairs["cosine"].to_pylist())


def test_verify_joined_path_matches_broadcast(ray_session, docs, monkeypatch):
    """The at-scale verify path (bloom semi-join + bucketed shingle joins,
    no driver-side shingle dict) must produce byte-identical pairs to the
    broadcast fast path on the same corpus."""
    from pttcrawler_ray.textops import dedup

    baseline = dedup.minhash_lsh_pairs(docs, threshold=0.7).to_pandas()
    assert len(baseline) > 0  # the fixture corpus plants near-dups

    monkeypatch.setattr(dedup, "_VERIFY_BCAST_MAX_PAIRS", 0)  # force joined
    joined = dedup.minhash_lsh_pairs(docs, threshold=0.7).to_pandas()
    assert joined.equals(baseline)

    ng_joined = dedup.ngram_jaccard_pairs(docs, threshold=0.7).to_pandas()
    monkeypatch.setattr(dedup, "_VERIFY_BCAST_MAX_PAIRS", 200_000)
    ng_base = dedup.ngram_jaccard_pairs(docs, threshold=0.7).to_pandas()
    assert ng_joined.equals(ng_base)


def test_connected_components_matches_union_find(ray_session):
    """Distributed min-label propagation == sequential union-find on a
    random graph (chains force multi-round propagation)."""
    from pttcrawler_ray.textops.dedup import connected_components

    rng = np.random.default_rng(11)
    e = rng.integers(0, 1500, size=(1200, 2))
    e = e[e[:, 0] != e[:, 1]]
    # add a long chain so convergence needs several propagation rounds
    chain = np.array([(9000 + i, 9001 + i) for i in range(40)])
    e = np.vstack([e, chain])
    pairs = rd.from_arrow(pa.table({"doc_a": pa.array(e[:, 0], pa.int64()),
                                    "doc_b": pa.array(e[:, 1], pa.int64())}))
    got = connected_components(pairs).to_pandas()
    gotmap = dict(zip(got["node"].astype(int), got["comp"].astype(int)))

    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in e:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    import collections
    members = collections.defaultdict(list)
    for n in set(e.flatten().tolist()):
        members[find(int(n))].append(int(n))
    expect = {n: min(ms) for ms in members.values() for n in ms}
    assert gotmap == expect
    # the chain is one component rooted at its min id
    assert all(gotmap[9000 + i] == 9000 for i in range(41))


def test_minhash_dedup_distributed_path_matches(ray_session, monkeypatch):
    """Forcing the CC + anti-join path must keep the exact same survivor
    set as the driver union-find fast path."""
    from pttcrawler_ray.textops import dedup

    base = ("spark ray data cluster parquet arrow stream shard crawl frontier "
            "batch queue index sort merge join filter group window agg " * 3).split()
    rows = []
    for i in range(30):
        rng = np.random.default_rng(1000 + i)
        rows.append({"doc_id": i,
                     "text": " ".join(rng.permutation([f"w{i}_{j}" for j in range(60)]))})
    rows.append({"doc_id": 200, "text": " ".join(base)})
    near = list(base)
    near[5] = "changed"
    rows.append({"doc_id": 201, "text": " ".join(near)})
    ds = rd.from_items(rows)

    baseline = sorted(dedup.minhash_dedup(ds, threshold=0.6).to_pandas()["doc_id"])
    monkeypatch.setattr(dedup, "_CC_UNIONFIND_MAX", -1)  # force CC path
    distributed = sorted(dedup.minhash_dedup(ds, threshold=0.6).to_pandas()["doc_id"])
    assert distributed == baseline
    assert 201 not in distributed and 200 in distributed


def test_joined_verify_engages_beyond_200k_pairs_e2e(ray_session, monkeypatch):
    """End-to-end pin of the at-scale verify branch (round-2 verdict item 1):
    planted boilerplate classes generate >200k RAW candidate pairs, so
    minhash_dedup must route through _verify_jaccard_joined (bloom semi-join
    + two bucketed hash joins — no driver shingle dict) and still produce
    the exactly predictable kept set, including the MAX_BUCKET_DOCS cap
    semantics (smallest 256 ids per degenerate bucket participate in pairs;
    identical docs beyond the cap survive by design)."""
    import pyarrow as pa

    from pttcrawler_ray.textops import dedup

    calls = {}
    orig = dedup._verify_jaccard_joined

    def spy(cand, docs, shingle_k, threshold, n_pairs):
        calls["n_pairs"] = n_pairs
        return orig(cand, docs, shingle_k, threshold, n_pairs)

    monkeypatch.setattr(dedup, "_verify_jaccard_joined", spy)

    # 3 identical classes of 300 docs: every LSH band bucket is a whole
    # class, capped to its 256 smallest ids -> 3 * 16 bands * C(256,2)
    # = 1,566,720 raw candidate rows (>> the 200k broadcast ceiling),
    # deduping to 3 * 32,640 = 97,920 verified pairs (jaccard 1.0)
    ids, texts = [], []
    for k in range(3):
        t = " ".join(f"k{k}w{j}" for j in range(40))
        for i in range(300):
            ids.append(k * 300 + i)
            texts.append(t)
    for i in range(100):  # plus uniques that must pass through untouched
        ids.append(10_000 + i)
        texts.append(" ".join(f"u{i}x{j}" for j in range(40)))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(8)

    kept = dedup.minhash_dedup(docs, threshold=0.8, num_perm=64,
                               bands=16).to_pandas()
    assert calls["n_pairs"] > 200_000, calls  # the joined path really ran
    # per class: min id kept + the 44 beyond-cap docs; all uniques kept
    expected = sorted(
        [k * 300 for k in range(3)]
        + [k * 300 + i for k in range(3) for i in range(256, 300)]
        + [10_000 + i for i in range(100)])
    assert sorted(kept["doc_id"]) == expected


def test_ivf_persisted_index_prunes_reads_and_matches_oneshot(ray_session,
                                                              tmp_path):
    """The persisted IVF index must (a) read ONLY probed cluster
    partitions — asserted on actual file counts — and (b) return exactly
    the one-shot knn_ivf results (same seeded centroids → same probes →
    same candidate rows)."""
    import pandas as pd
    import pyarrow as pa

    from pttcrawler_ray.textops.similarity import (build_ivf_index, knn_ivf,
                                                   knn_ivf_indexed)

    embs = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(embs, index_dir, n_clusters=8)

    q = np.stack(embs.limit(1).to_pandas()["embedding"])
    stats: dict = {}
    got = knn_ivf_indexed(index_dir, q, k=5, nprobe=2,
                          stats_out=stats).to_pandas()
    # one query, nprobe=2 → at most 2 partition dirs touched, strictly
    # fewer files than the whole store (8 clusters exist)
    assert stats["partition_dirs_read"] <= 2
    assert stats["files_read"] < stats["files_total"], stats
    assert stats["n_clusters"] == 8

    want = knn_ivf(embs, q, k=5, n_clusters=8, nprobe=2).to_pandas()
    cols = ["query_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(got[cols].reset_index(drop=True),
                                  want[cols].reset_index(drop=True))


def test_ivfpq_index_adc_prunes_and_rerank_is_exact(ray_session, tmp_path):
    """IVF-PQ: (a) the ADC scan's working set is the uint8 code columns —
    asserted on parquet footer byte counts (codes ≪ the embedding bytes in
    the same probed files); (b) with refine covering every probed row the
    exact rerank reproduces knn_ivf_indexed verbatim (same seeded
    centroids → same probes → same rows, rerank is exact cosine); (c) at a
    modest refine the top-1 self-match survives PQ quantization."""
    import pandas as pd

    from pttcrawler_ray.textops.similarity import (build_ivf_index,
                                                   build_ivfpq_index,
                                                   knn_ivf_indexed,
                                                   knn_ivfpq_indexed)

    embs = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(embs, idx, n_clusters=8, m_sub=8)
    q = np.stack(embs.limit(3).to_pandas().sort_values("vec_id")["embedding"])

    stats: dict = {}
    got = knn_ivfpq_indexed(idx, q, k=5, nprobe=2, refine=4,
                            stats_out=stats).to_pandas()
    assert stats["bytes_codes_read"] * 3 < stats["bytes_embedding_probed"], stats
    assert stats["refine_rows"] <= 3 * 5 * 4  # nq · k · refine bound
    assert len(got) == 15
    # top-1 is the query vector itself (queries are rows of the table)
    top1 = got[got["rank"] == 1].sort_values("query_id")
    assert top1["vec_id"].tolist() == [0, 1, 2]

    ref = str(tmp_path / "ivf")
    build_ivf_index(embs, ref, n_clusters=8)
    want = knn_ivf_indexed(ref, q, k=5, nprobe=2).to_pandas()
    big = knn_ivfpq_indexed(idx, q, k=5, nprobe=2, refine=10_000).to_pandas()
    cols = ["query_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(big[cols].reset_index(drop=True),
                                  want[cols].reset_index(drop=True))


def test_distributed_kmeans_matches_sequential_lloyd(embs):
    """train_centroids_distributed must equal sequential full-data Lloyd
    from the same seeded init (the distributed form only reorders the
    per-cluster summation), and slot into build_ivf_index."""
    from pttcrawler_ray.textops.similarity import (_normalize,
                                                   train_centroids,
                                                   train_centroids_distributed)

    dist = train_centroids_distributed(embs, n_clusters=8, iters=4, seed=7)

    df = embs.to_pandas().sort_values("vec_id")
    x = _normalize(np.stack(df["embedding"]).astype(np.float64))
    # same init the distributed trainer uses (iters=0 = seeded init only;
    # table fits the sample so init is deterministic)
    c = train_centroids(embs, 8, sample=2048, iters=0, seed=7)
    for _ in range(4):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(len(c)):
            m = x[assign == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c = _normalize(c)
    assert dist.shape == c.shape
    np.testing.assert_allclose(dist, c, atol=1e-9)


def test_build_ivf_index_distributed_train(embs, tmp_path):
    from pttcrawler_ray.textops.similarity import (build_ivf_index,
                                                   knn_ivf_indexed,
                                                   train_centroids_distributed)

    cents = build_ivf_index(embs, str(tmp_path / "ivf"), n_clusters=8,
                            iters=4, distributed_train=True)
    np.testing.assert_allclose(
        cents, train_centroids_distributed(embs, 8, iters=4, seed=7), atol=1e-9)
    q = np.stack(embs.to_pandas().sort_values("vec_id")["embedding"][:1])
    stats = {}
    out = knn_ivf_indexed(str(tmp_path / "ivf"), q, k=3, nprobe=3,
                          stats_out=stats)
    # one query probes exactly nprobe of the n_clusters partition dirs
    assert stats["partition_dirs_read"] <= 3 < stats["n_clusters"]
    assert len(out) == 3


def test_curate_library_pipeline(ray_session, tmp_path):
    """curate(): junk (no stopwords / low quality) dropped, near-dup pair
    collapses to the lower doc_id, clean docs keep quality/pred_lang
    columns; CLI subprocess smoke over the same table."""
    from pttcrawler_ray.textops.curate import curate

    base = ("the quick brown fox jumps over the lazy dog and runs to the "
            "river where it drinks some water before the long sleep") * 3
    near = base + " extra tail tokens here"
    junk = " ".join(f"zz{i}" for i in range(40))  # no stopwords
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([base, near, junk,
                          "the cat sat on the mat and the dog sat too " * 5]),
    })
    kept = curate(rd.from_arrow(tbl), dedup_threshold=0.7).to_pandas()
    assert set(kept["doc_id"]) == {1, 4}  # 2 = near-dup of 1, 3 = junk
    assert {"quality", "pred_lang"} <= set(kept.columns)

    # CLI smoke (own process = own Ray session)
    import json as _json
    import subprocess
    import sys
    src = tmp_path / "docs.parquet"
    dest = tmp_path / "curated"
    pq.write_table(tbl, src)
    out = subprocess.run(
        [sys.executable, "-m", "pttcrawler_ray", "curate", "--input", str(src),
         "--dest", str(dest), "--threshold", "0.7", "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    stats = _json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["input_docs"] == 4 and stats["kept_docs"] == 2
    got = pq.read_table(dest.as_posix()).column("doc_id").to_pylist()
    assert sorted(got) == [1, 4]


def test_split_assign_deterministic_and_partition_invariant(ray_session):
    """split_assign: fractions track the ratios, and the assignment of a
    given doc_id is identical regardless of partitioning (the
    coordination-free property — rows never move between splits when the
    corpus is repartitioned or appended to)."""
    from pttcrawler_ray.textops.sampling import split_assign

    docs = rd.range(5000).map_batches(
        lambda t: pa.table({"doc_id": t["id"]}), batch_format="pyarrow")
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_assign(docs, ratios, salt=42).to_pandas()
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03 and abs(frac["val"] - 0.1) < 0.03

    b = split_assign(docs.repartition(13), ratios, salt=42).to_pandas()
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # a different salt reshuffles the assignment
    c = split_assign(docs, ratios, salt=43).to_pandas()
    m2 = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
    assert (m2["split_a"] != m2["split_c"]).any()


def test_stratified_sample_rates_and_monotone(ray_session):
    """stratified_sample: rate-1.0 keeps every row, rate-0.0 keeps none,
    intermediate rates track, and lowering a rate keeps a strict SUBSET
    (same hash, lower threshold — recipe tightening without corpus
    churn)."""
    from pttcrawler_ray.textops.sampling import stratified_sample

    n = 4000
    docs = rd.range(n).map_batches(
        lambda t: pa.table({
            "doc_id": t["id"],
            "grp": pa.array(["a" if i % 2 else "b" for i in
                             t["id"].to_pylist()]),
        }), batch_format="pyarrow")
    kept = stratified_sample(docs, {"a": 1.0, "b": 0.0}, group_col="grp",
                             salt=7).to_pandas()
    assert (kept["grp"] == "a").all() and len(kept) == n // 2

    half = stratified_sample(docs, {"a": 0.5, "b": 0.25}, group_col="grp",
                             salt=7).to_pandas()
    fa = (half["grp"] == "a").sum() / (n // 2)
    fb = (half["grp"] == "b").sum() / (n // 2)
    assert abs(fa - 0.5) < 0.05 and abs(fb - 0.25) < 0.05

    quarter = stratified_sample(docs, {"a": 0.25, "b": 0.25}, group_col="grp",
                                salt=7).to_pandas()
    assert set(quarter[quarter["grp"] == "a"]["doc_id"]) <= \
        set(half[half["grp"] == "a"]["doc_id"])
    # default_rate covers groups missing from the rate map
    dflt = stratified_sample(docs, {}, group_col="grp", default_rate=1.0,
                             salt=7).to_pandas()
    assert len(dflt) == n


def test_pack_offsets_prefix_sum(ray_session):
    """pack_offsets: handcrafted stream — doc lengths (3,2,7,1) + EOS each,
    seq_len 4 → starts 0,4,7,15; a doc longer than seq_len spans examples;
    result is invariant to partitioning and to range_size (the prefix-sum
    decomposition must not leak into the answer)."""
    import pandas as pd

    from pttcrawler_ray.textops.packing import pack_offsets

    docs = rd.from_items([
        {"doc_id": 10, "text": "a b c"},        # eff 4: tokens 0-2, eos 3
        {"doc_id": 11, "text": "d e"},          # eff 3: 4-5, eos 6
        {"doc_id": 12, "text": "f g h i j k l"},  # eff 8: 7-13, eos 14
        {"doc_id": 13, "text": "m"},            # eff 2: 15, eos 16
    ])
    got = pack_offsets(docs, seq_len=4, range_size=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["tok_start"].tolist() == [0, 4, 7, 15]
    assert got["start_example"].tolist() == [0, 1, 1, 3]
    assert got["start_offset"].tolist() == [0, 0, 3, 3]
    assert got["end_example"].tolist() == [0, 1, 3, 4]  # doc 12 spans 1..3

    # partitioning / range decomposition invariance
    for rs in (1, 64):
        alt = pack_offsets(docs.repartition(3), seq_len=4,
                           range_size=rs).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(alt, got)


def test_ann_cli_build_append_query(tmp_path):
    """`ann` CLI end-to-end in a subprocess (own Ray session): build an
    IVF-PQ store over half the vectors, append the other half, query a
    known vec_id — self-match at rank 1, store kind auto-detected."""
    import json as _json
    import subprocess
    import sys

    src = "/root/testdata/sf0.01/embeddings.parquet"
    idx = str(tmp_path / "pqstore")

    def run(*a):
        out = subprocess.run(
            [sys.executable, "-m", "pttcrawler_ray", "ann", *a,
             "--index", idx, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo")
        assert out.returncode == 0, out.stderr[-2000:]
        return _json.loads(out.stdout.strip().splitlines()[-1])

    assert run("--action", "build", "--input", src, "--pq",
               "--clusters", "8")["pq"] is True
    assert run("--action", "append", "--input", src)["appended"] == 500
    res = run("--action", "query", "--input", src, "--query-ids", "7",
              "--k", "3")
    assert res["stats"]["bytes_codes_read"] < res["stats"]["bytes_embedding_probed"]
    top = res["neighbors"][0]
    assert top["query_vec_id"] == 7 and top["vec_id"] == 7 and top["rank"] == 1


def test_incremental_dedup_equals_batch(ray_session, tmp_path):
    """minhash_dedup_incremental over two id-monotone increments must keep
    exactly the docs a from-scratch minhash_dedup keeps on the union —
    including cross-increment near-dup clusters and a dup-of-a-DROPPED-doc
    chain (the store keeps dropped docs' bands/shingles so transitivity
    through them survives)."""
    from pttcrawler_ray.textops.dedup import minhash_dedup
    from pttcrawler_ray.textops.incremental import minhash_dedup_incremental

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon " * 3).split()
    rows = []
    # cluster A entirely in increment 1 (keeps id 0)
    rows.append({"doc_id": 0, "text": " ".join(base)})
    v = list(base); v[3] = "x1"
    rows.append({"doc_id": 1, "text": " ".join(v)})  # dropped (dup of 0)
    # uniques in increment 1
    for i in range(2, 20):
        rng = np.random.default_rng(500 + i)
        rows.append({"doc_id": i, "text": " ".join(f"u{i}_{j}" for j in range(60))})
    # increment 2: near-dup of the DROPPED doc 1 (chain through a drop),
    # near-dup of the KEPT doc 0, and a fresh cluster split across nothing
    w = list(v); w[7] = "x2"
    rows.append({"doc_id": 30, "text": " ".join(w)})   # ~1 (dropped) → drop
    u = list(base); u[11] = "x3"
    rows.append({"doc_id": 31, "text": " ".join(u)})   # ~0 (kept) → drop
    for i in range(32, 45):
        rng = np.random.default_rng(900 + i)
        rows.append({"doc_id": i, "text": " ".join(f"q{i}_{j}" for j in range(60))})

    full = minhash_dedup(rd.from_items(rows), threshold=0.6).to_pandas()
    want = set(full["doc_id"])

    state = str(tmp_path / "dedup_state")
    inc1 = rd.from_items([r for r in rows if r["doc_id"] < 30])
    inc2 = rd.from_items([r for r in rows if r["doc_id"] >= 30])
    k1 = minhash_dedup_incremental(inc1, state, threshold=0.6).to_pandas()
    k2 = minhash_dedup_incremental(inc2, state, threshold=0.6).to_pandas()
    got = set(k1["doc_id"]) | set(k2["doc_id"])
    assert got == want, (sorted(got ^ want))

    # monotonicity enforced
    with pytest.raises(AssertionError, match="monotone"):
        minhash_dedup_incremental(inc1, state, threshold=0.6)

    # empty increment = clean no-op (store untouched)
    import json as _json
    import os as _os
    before = _json.load(open(_os.path.join(state, "manifest.json")))
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    assert minhash_dedup_incremental(empty, state, threshold=0.6).count() == 0
    assert _json.load(open(_os.path.join(state, "manifest.json"))) == before


def test_append_ivf_index_equals_full_assign(embs, tmp_path):
    """build on half the vectors, append the other half: queries over the
    appended store must equal a store holding ALL rows assigned with the
    SAME centroids (append = assign against persisted centroids, no
    retrain), and the CLI-visible file layout stays cluster-partitioned."""
    import os

    import pandas as pd
    from pttcrawler_ray.textops.similarity import (_ivf_assign,
                                                   append_ivf_index,
                                                   build_ivf_index,
                                                   knn_ivf_indexed)

    df = embs.to_pandas().sort_values("vec_id")
    mid = int(df["vec_id"].median())
    inc1 = embs.filter(expr=f"vec_id < {mid}")
    inc2 = embs.filter(expr=f"vec_id >= {mid}")

    idx = str(tmp_path / "ivf")
    build_ivf_index(inc1, idx, n_clusters=8, iters=2)
    n = append_ivf_index(inc2, idx)
    assert n == len(df) - mid

    # reference: every row assigned with the SAME persisted centroids
    ref = str(tmp_path / "ivf_ref")
    cents = np.load(os.path.join(idx, "centroids.npy"))
    import ray as _ray
    assigned = embs.map_batches(
        _ivf_assign, fn_kwargs={"centroids_ref": _ray.put(cents)},
        batch_format="pyarrow").sort("ivf_cluster")
    assigned.write_parquet(os.path.join(ref, "data"),
                           partition_cols=["ivf_cluster"])
    np.save(os.path.join(ref, "centroids.npy"), cents)

    q = np.stack(df["embedding"][:3])
    a = knn_ivf_indexed(idx, q, k=5, nprobe=4).to_pandas()
    b = knn_ivf_indexed(ref, q, k=5, nprobe=4).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_append_ivfpq_index_equals_full_assign(embs, tmp_path):
    """IVF-PQ append: assign+encode the increment with the PERSISTED
    centroids/codebooks; queries over the appended store equal a store
    holding all rows encoded with the same sidecars."""
    import os

    import pandas as pd
    import ray as _ray
    from pttcrawler_ray.textops.similarity import (_pq_encode_assign,
                                                   append_ivfpq_index,
                                                   build_ivfpq_index,
                                                   knn_ivfpq_indexed)

    df = embs.to_pandas().sort_values("vec_id")
    mid = int(df["vec_id"].median())
    inc1 = embs.filter(expr=f"vec_id < {mid}")
    inc2 = embs.filter(expr=f"vec_id >= {mid}")

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(inc1, idx, n_clusters=8, m_sub=8, iters=2)
    n = append_ivfpq_index(inc2, idx)
    assert n == len(df) - mid

    ref = str(tmp_path / "ivfpq_ref")
    cents = np.load(os.path.join(idx, "centroids.npy"))
    books = np.load(os.path.join(idx, "codebooks.npy"))
    assigned = embs.map_batches(
        _pq_encode_assign,
        fn_kwargs={"centroids_ref": _ray.put(cents), "books_ref": _ray.put(books)},
        batch_format="pyarrow").sort("ivf_cluster")
    assigned.write_parquet(os.path.join(ref, "data"),
                           partition_cols=["ivf_cluster"])
    np.save(os.path.join(ref, "centroids.npy"), cents)
    np.save(os.path.join(ref, "codebooks.npy"), books)
    import json as _json
    import shutil as _shutil

    _shutil.copy(os.path.join(idx, "pq_meta.json"),
                 os.path.join(ref, "pq_meta.json"))

    q = np.stack(df["embedding"][:3])
    a = knn_ivfpq_indexed(idx, q, k=5, nprobe=4, refine=4).to_pandas()
    b = knn_ivfpq_indexed(ref, q, k=5, nprobe=4, refine=4).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_incremental_state_compaction(ray_session, tmp_path):
    """compact_state rewrites the store into one generation without
    changing dedup results: an increment processed after compaction must
    drop cross-increment dups exactly as before."""
    from pttcrawler_ray.textops.incremental import (compact_state,
                                                    minhash_dedup_incremental)

    base = ("one two three four five six seven eight nine ten eleven twelve "
            "thirteen fourteen fifteen sixteen seventeen eighteen" * 3).split()
    inc1 = rd.from_items([{"doc_id": 0, "text": " ".join(base)}]
                         + [{"doc_id": i, "text": " ".join(f"s{i}_{j}" for j in range(50))}
                            for i in range(1, 6)])
    inc2 = rd.from_items([{"doc_id": 10, "text": " ".join(f"t{j}" for j in range(50))}])
    v = list(base); v[2] = "changed"
    inc3 = rd.from_items([{"doc_id": 20, "text": " ".join(v)}])  # ~0

    state = str(tmp_path / "st")
    assert minhash_dedup_incremental(inc1, state, threshold=0.6).count() == 6
    assert minhash_dedup_incremental(inc2, state, threshold=0.6).count() == 1
    m = compact_state(state)
    assert m["increments"] == 1 and m["max_id"] == 10
    import glob as _glob
    assert _glob.glob(str(tmp_path / "st" / "bands" / "inc=*")) \
        == [str(tmp_path / "st" / "bands" / "inc=0")]
    # cross-increment dup still dropped through the compacted store
    assert minhash_dedup_incremental(inc3, state, threshold=0.6).count() == 0


def test_incremental_retro_drops_on_bridging(ray_session, tmp_path):
    """A new doc that bridges two previously-separate old components
    must emit the losing old keeper as a retro-drop tombstone, and
    (union of kept sets) minus tombstones must equal a from-scratch
    batch minhash_dedup over everything — the exact CDC-style contract
    read_retro_drops documents.  The bridge here runs through DROPPED
    old docs, so root resolution must chase the comps store."""
    from pttcrawler_ray.textops.dedup import minhash_dedup
    from pttcrawler_ray.textops.incremental import (compact_state,
                                                    minhash_dedup_incremental,
                                                    read_retro_drops)

    wa = [f"a{j}" for j in range(40)]
    wb = [f"b{j}" for j in range(40)]
    wa1 = list(wa); wa1[5] = "xa"     # near-dup of wa (j ~ 0.85)
    wb1 = list(wb); wb1[5] = "xb"     # near-dup of wb
    kw = dict(threshold=0.45, num_perm=128, bands=64)  # r=2: recall ~1 at j=0.487
    rows1 = ([{"doc_id": 0, "text": " ".join(wa)},
              {"doc_id": 1, "text": " ".join(wa1)},   # dropped, root 0
              {"doc_id": 10, "text": " ".join(wb)},
              {"doc_id": 11, "text": " ".join(wb1)}]  # dropped, root 10
             + [{"doc_id": i, "text": " ".join(f"u{i}_{j}" for j in range(60))}
                for i in range(2, 8)])
    # bridge = concatenation of the two DROPPED variants: jaccard ~0.49
    # to each of docs 1 and 11, ~0.43 to docs 0 and 10 (below threshold)
    rows2 = [{"doc_id": 100, "text": " ".join(wa1 + wb1)},
             {"doc_id": 101, "text": " ".join(f"v_{j}" for j in range(60))}]

    state = str(tmp_path / "st")
    k1 = set(minhash_dedup_incremental(
        rd.from_items(rows1), state, **kw).to_pandas()["doc_id"])
    assert k1 == {0, 10} | set(range(2, 8))
    k2 = set(minhash_dedup_incremental(
        rd.from_items(rows2), state, **kw).to_pandas()["doc_id"])
    assert k2 == {101}                       # the bridge doc itself drops
    retro = set(read_retro_drops(state)["doc_id"].to_pylist())
    assert retro == {10}                     # loser keeper tombstoned

    batch = set(minhash_dedup(
        rd.from_items(rows1 + rows2), **kw).to_pandas()["doc_id"])
    assert (k1 | k2) - retro == batch

    # a later doc near the retro-dropped cluster still drops, resolution
    # chasing 11 -> 10 -> 0 through the (compacted) comps store
    compact_state(state)
    wb2 = list(wb); wb2[9] = "xc"
    k3 = minhash_dedup_incremental(
        rd.from_items([{"doc_id": 200, "text": " ".join(wb2)}]), state, **kw)
    assert k3.count() == 0
    assert set(read_retro_drops(state)["doc_id"].to_pylist()) == {10}


def test_vocab_topk_exact_and_bounded(docs):
    """Distributed wordcount == pandas value_counts with the same
    (n DESC, gram ASC) tie-break; the bigram variant builds grams only
    inside document boundaries."""
    from pttcrawler_ray.textops.vocab import vocab_topk

    texts = docs.to_pandas()["text"]
    t = vocab_topk(docs, k=25, n=1).to_pandas()
    exp = (texts.str.split().explode().dropna().value_counts()
           .rename_axis("gram").reset_index(name="n"))
    exp = exp.sort_values(["n", "gram"], ascending=[False, True],
                          kind="stable").head(25).reset_index(drop=True)
    assert t["gram"].tolist() == exp["gram"].tolist()
    assert t["n"].tolist() == exp["n"].tolist()

    t2 = vocab_topk(docs, k=10, n=2).to_pandas()
    bigrams = {}
    for s in texts:
        toks = s.split()
        for a, b in zip(toks, toks[1:]):
            bigrams[f"{a} {b}"] = bigrams.get(f"{a} {b}", 0) + 1
    exp2 = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(t2["gram"], t2["n"])) == exp2


def test_repetition_scores_match_python(docs):
    from pttcrawler_ray.textops.analysis import repetition_batch
    from collections import Counter

    df = (docs.map_batches(repetition_batch, batch_format="pyarrow")
          .to_pandas().set_index("doc_id").sort_index())
    for doc_id, row in df.head(20).iterrows():
        toks = row["text"].split()
        uni = Counter(toks)
        bg = Counter(zip(toks, toks[1:]))
        exp_u = (max(uni.values()) if uni else 0) / max(len(toks), 1)
        exp_b = (max(bg.values()) if bg else 0) / max(len(toks) - 1, 1)
        assert row["top_token_frac"] == pytest.approx(exp_u)
        assert row["top_bigram_frac"] == pytest.approx(exp_b)
    # rows with zero/one token degrade to 0, not NaN
    import ray.data as rd
    one = rd.from_items([{"doc_id": 0, "text": ""},
                         {"doc_id": 1, "text": "solo"}])
    df1 = (one.map_batches(repetition_batch, batch_format="pyarrow")
           .to_pandas().set_index("doc_id").sort_index())
    assert df1["top_token_frac"].tolist() == [0.0, 1.0]
    assert df1["top_bigram_frac"].tolist() == [0.0, 0.0]


def test_decontaminate_matches_python_and_is_nonvacuous(docs):
    """Engine contamination scan == a sequential string-set reference on
    the fixture corpus; planted near-dups make it non-vacuous."""
    import pyarrow as pa
    from pttcrawler_ray.textops.decontam import decontaminate

    NGRAM, MOD = 5, 29
    df = docs.to_pandas()

    def grams(s):
        toks = s.split()
        return {" ".join(toks[i:i + NGRAM])
                for i in range(len(toks) - NGRAM + 1)}

    bench_grams = set()
    for _, r in df[df.doc_id % MOD == 0].iterrows():
        bench_grams |= grams(r["text"])
    exp = {int(r["doc_id"]): len(grams(r["text"]) & bench_grams)
           for _, r in df[df.doc_id % MOD != 0].iterrows()
           if grams(r["text"]) & bench_grams}
    assert exp, "fixture corpus must plant cross-slice near-dups"

    def is_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy() % MOD == 0))

    def not_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy() % MOD != 0))

    bench = docs.map_batches(is_bench, batch_format="pyarrow")
    corpus = docs.map_batches(not_bench, batch_format="pyarrow")
    got = decontaminate(corpus, bench, n=NGRAM).to_pandas()
    assert dict(zip(got["doc_id"], got["n_hits"])) == exp


def test_decontaminate_partitioned_equals_broadcast(docs, tmp_path):
    """The sharded-store plan (bloom prefilter -> one narrow shuffle ->
    per-shard exact recheck) returns EXACTLY the broadcast plan's rows.
    bits_per_key=2 forces heavy bloom false positives and n_shards=16 on
    a tiny bench set leaves some shards empty — both must be harmless."""
    from pttcrawler_ray.textops.decontam import (
        build_benchmark_store, decontaminate, decontaminate_partitioned)

    NGRAM, MOD = 5, 29

    def is_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % MOD == 0))

    def not_bench(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % MOD != 0))

    bench = docs.map_batches(is_bench, batch_format="pyarrow")
    corpus = docs.map_batches(not_bench, batch_format="pyarrow")

    store = str(tmp_path / "bench_store")
    mf = build_benchmark_store(bench, store, n=NGRAM, n_shards=16,
                               bits_per_key=2)
    assert mf["n_grams"] > 0

    exp = decontaminate(corpus, bench, n=NGRAM).to_pandas()
    got = decontaminate_partitioned(corpus, store).to_pandas()
    assert len(exp) > 0
    assert dict(zip(got["doc_id"], got["n_hits"])) == \
        dict(zip(exp["doc_id"], exp["n_hits"]))


def test_corpus_stats_null_and_tiny_docs(ray_session):
    """Null / empty / sub-n-gram texts flow through all three new ops
    without nulls leaking into grams or NaNs into scores."""
    import ray.data as rd
    from pttcrawler_ray.textops.vocab import vocab_topk
    from pttcrawler_ray.textops.analysis import repetition_batch
    from pttcrawler_ray.textops.decontam import decontaminate

    rows = [{"doc_id": 0, "text": None},
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "one"},
            {"doc_id": 3, "text": "a b a b a"},
            {"doc_id": 4, "text": "  x   y  "}]
    ds = rd.from_items(rows)

    t = vocab_topk(ds, k=10, n=1)
    assert dict(zip(t["gram"].to_pylist(), t["n"].to_pylist())) == \
        {"a": 3, "b": 2, "one": 1, "x": 1, "y": 1}
    t2 = vocab_topk(ds, k=10, n=2)
    assert dict(zip(t2["gram"].to_pylist(), t2["n"].to_pylist())) == \
        {"a b": 2, "b a": 2, "x y": 1}

    df = (ds.map_batches(repetition_batch, batch_format="pyarrow")
          .to_pandas().set_index("doc_id").sort_index())
    assert df["top_token_frac"].tolist() == [0.0, 0.0, 1.0, 3 / 5, 0.5]
    assert df["top_bigram_frac"].tolist() == [0.0, 0.0, 0.0, 2 / 4, 1.0]

    # decontam with an n-gram wider than every doc: no hits, no crash
    got = decontaminate(ds, ds, n=6).to_pandas()
    assert len(got) == 0


def test_corpus_stats_cli(tmp_path):
    """`corpus-stats` CLI in a subprocess: top-K vocab equals a pandas
    count, repetition parquet lands, decontamination vs a planted
    benchmark slice is non-empty."""
    import json as _json
    import subprocess
    import sys

    import pandas as pd
    import pyarrow.parquet as _pq

    src = "/root/testdata/sf0.01/documents.parquet"
    df = _pq.read_table(src, columns=["doc_id", "text"]).to_pandas()
    bench = str(tmp_path / "bench.parquet")
    rep = str(tmp_path / "rep")
    _pq.write_table(
        _pq.read_table(src).filter((_pq.read_table(src)["doc_id"].to_numpy()
                                    % 29 == 0)), bench)

    out = subprocess.run(
        [sys.executable, "-m", "pttcrawler_ray", "corpus-stats",
         "--input", src, "--top-k", "5", "--repetition-dest", rep,
         "--benchmark", bench, "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    res = _json.loads(out.stdout.strip().splitlines()[-1])

    counts = df["text"].str.split().explode().dropna().value_counts()
    exp = sorted(((g, int(c)) for g, c in counts.items()),
                 key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [tuple(x) for x in res["top_grams"]] == exp
    rep_df = pd.read_parquet(rep)
    assert len(rep_df) == len(df)
    assert set(rep_df.columns) == {"doc_id", "top_token_frac",
                                   "top_bigram_frac"}
    # CLI scans the WHOLE input (bench docs self-match), so hits ⊇ the
    # 7 cross-slice near-dups known from the oracle check
    assert res["contaminated_docs"] >= 7

    # --benchmark-store switches to the partitioned plan; identical counts
    out2 = subprocess.run(
        [sys.executable, "-m", "pttcrawler_ray", "corpus-stats",
         "--input", src, "--benchmark", bench,
         "--benchmark-store", str(tmp_path / "bstore"), "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    res2 = _json.loads(out2.stdout.strip().splitlines()[-1])
    assert res2["contaminated_docs"] == res["contaminated_docs"]
    assert res2["contaminated_doc_gram_pairs"] == \
        res["contaminated_doc_gram_pairs"]


def test_paragraph_dedup_paths_match_duckdb(ray_session, monkeypatch):
    """paragraph_dedup (both rewrite plans, both keep rules) must equal the
    DuckDB twin, which groups by the paragraph STRING — so this also
    cross-checks the 64-bit hash identity at test scale."""
    import duckdb
    import pandas as pd

    from pttcrawler_ray.textops import paradedup
    from pttcrawler_ray.textops.paradedup import (paragraph_dedup,
                                                  paragraph_dedup_sql)

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")

    def run(keep_first):
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        got = paragraph_dedup(ds, sep=" row ", keep_first=keep_first) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        exp = con.execute(
            paragraph_dedup_sql("documents", " row ", keep_first=keep_first)
        ).fetch_df().sort_values("doc_id").reset_index(drop=True)
        cols = ["doc_id", "text_clean", "n_paras", "n_dropped"]
        pd.testing.assert_frame_equal(got[cols], exp[cols],
                                      check_dtype=False)
        return got

    got = run(keep_first=True)
    assert got["n_dropped"].sum() > 0  # corpus actually has repeats
    run(keep_first=False)

    # at-scale plan: force the co-partition rewrite (no broadcast)
    monkeypatch.setattr(paradedup, "_BCAST_DROP_MAX", 0)
    run(keep_first=True)


def test_span_dedup_paths_match_duckdb(ray_session, monkeypatch):
    """span_dedup (both rewrite plans) must equal the DuckDB twin, which
    groups by the span's token STRING — so this also cross-checks the
    64-bit Karp-Rabin span hash at test scale."""
    import duckdb
    import pandas as pd

    from pttcrawler_ray.textops import spandedup
    from pttcrawler_ray.textops.spandedup import span_dedup, span_dedup_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")

    def run(k):
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"])
        got = span_dedup(ds, k=k).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp = con.execute(span_dedup_sql("documents", k=k)).fetch_df() \
            .sort_values("doc_id").reset_index(drop=True)
        cols = ["doc_id", "text_clean", "n_tokens", "n_dropped"]
        pd.testing.assert_frame_equal(got[cols], exp[cols],
                                      check_dtype=False)
        return got

    got = run(k=8)
    assert got["n_dropped"].sum() > 0          # repeats actually cut
    assert got["n_dropped"].sum() < got["n_tokens"].sum()  # not everything
    # overlapping duplicated windows merged into interval unions: planted
    # near-dup passages are longer than k, so some doc lost > k tokens
    assert (got["n_dropped"] > 8).any()

    # at-scale plan: force the co-partition rewrite (no broadcast)
    monkeypatch.setattr(spandedup, "_BCAST_DROP_MAX", 0)
    run(k=8)


def test_span_dedup_unit_semantics(ray_session):
    """Hand-built corpus: first occurrence survives, later ones cut,
    within-doc repeats cut, overlapping spans union into one gap."""
    from pttcrawler_ray.textops.spandedup import span_dedup

    a = "w1 w2 w3 w4 tail1 tail2"          # first occurrence (kept)
    b = "head w1 w2 w3 w4 rest"            # cross-doc repeat (cut)
    c = "w1 w2 w3 w4 mid w1 w2 w3 w4"      # both occurrences repeat -> cut
    d = "u1 u2 u3 u4 u5"                   # untouched
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [a, b, c, d]}))
    out = {r["doc_id"]: r for r in
           span_dedup(ds, k=4).to_pandas().to_dict("records")}
    assert out[0]["text_clean"] == a                  # globally first
    assert out[1]["text_clean"] == "head rest"
    assert out[1]["n_dropped"] == 4
    assert out[2]["text_clean"] == "mid"              # both repeats cut
    assert out[2]["n_dropped"] == 8
    assert out[3]["text_clean"] == d
    assert out[3]["n_dropped"] == 0


def test_redact_pii_batch():
    from pttcrawler_ray.textops.redact import redact_pii_batch

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "text": ["mail a.b+c@x-y.co.uk now",
                           "ips 10.0.255.3 999.1.1.1",
                           "call +886 2 1234-5678 ok",
                           "no pii here",
                           ""]})
    out = redact_pii_batch(t)
    assert out["text_redacted"].to_pylist() == [
        "mail <EMAIL> now", "ips <IP> <IP>", "call <PHONE> ok",
        "no pii here", ""]
    assert out["n_redactions"].to_pylist() == [1, 2, 1, 0, 0]
    # email consumed before the phone pattern can eat its digits
    t2 = pa.table({"text": ["reach 12345678@host.com fast"]})
    out2 = redact_pii_batch(t2)
    assert out2["text_redacted"].to_pylist() == ["reach <EMAIL> fast"]
    assert out2["n_redactions"].to_pylist() == [1]


def test_perplexity_matches_sequential(docs):
    """Distributed unigram-LM perplexity == a sequential Python twin,
    EXACTLY (int ppm): same vocab tie-break, same math.log table, same
    per-doc float addition order."""
    import math
    from collections import Counter

    from pttcrawler_ray.textops.perplexity import (perplexity_docs,
                                                   train_unigram_lm)

    top_v = 16  # < the corpus's distinct-token count -> OOV really hit
    out = perplexity_docs(docs, top_v=top_v).to_pandas() \
        .set_index("doc_id").sort_index()

    texts = docs.to_pandas().set_index("doc_id").sort_index()["text"]
    tok_lists = [(t or "").split() for t in texts]
    ctr = Counter()
    for tl in tok_lists:
        ctr.update(tl)
    total = sum(ctr.values())
    vocab = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    denom = float(total + len(vocab) + 1)
    logp = {w: math.log((c + 1) / denom) for w, c in vocab}
    oov = math.log(1.0 / denom)
    exp_nt, exp_x = [], []
    for tl in tok_lists:
        s = 0.0
        for w in tl:
            s += logp.get(w, oov)
        exp_nt.append(len(tl))
        exp_x.append(math.floor((-s / len(tl) if tl else 0.0) * 1e6))
    assert out["n_tokens"].tolist() == exp_nt
    assert out["xent_ppm"].tolist() == exp_x
    # OOV path genuinely exercised: some scored token fell outside vocab
    assert len(ctr) > top_v

    # model is bounded and reusable: train once, reported totals honest
    lm = train_unigram_lm(docs, top_v=top_v)
    assert len(lm["vocab"]) == top_v and lm["total_tokens"] == total


def test_perplexity_edge_rows(ray_session):
    """Empty and null texts score 0; an all-OOV doc scores the OOV
    logp exactly; batching never changes a per-doc score."""
    import math

    from pttcrawler_ray.textops.perplexity import (score_perplexity,
                                                   train_unigram_lm)

    rows = [{"doc_id": 0, "text": "a a b"},
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": "zz zz"}]
    ds = rd.from_items(rows)
    lm = train_unigram_lm(ds, top_v=2)  # vocab = {a, zz or b by count}
    out = score_perplexity(ds, lm).to_pandas().set_index("doc_id") \
        .sort_index()
    assert out.loc[1, "xent_ppm"] == 0 and out.loc[1, "n_tokens"] == 0
    assert out.loc[2, "xent_ppm"] == 0 and out.loc[2, "n_tokens"] == 0
    # vocab by (count DESC, token ASC): a(2), zz(2) -> b is OOV
    assert lm["vocab"] == ["a", "zz"]
    exp0 = math.floor(-(2 * lm["logp"][0] + lm["logp_oov"]) / 3 * 1e6)
    assert out.loc[0, "xent_ppm"] == exp0
    # batch-size invariance: per-doc scores don't depend on blocking
    out2 = score_perplexity(ds.repartition(4), lm).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out2["xent_ppm"].tolist() == out["xent_ppm"].tolist()


def test_bm25_matches_sequential(docs):
    """Distributed BM25 top-k == a sequential Python twin EXACTLY:
    same math.log idf, same op order, per-term ppm floor before the
    integer per-query sum."""
    import math

    from pttcrawler_ray.textops.retrieval import bm25_topk

    queries = [(0, "fast table scan"), (7, "customer query join slow")]
    K1, B, TOPK = 1.2, 0.75, 8
    out = bm25_topk(docs, queries, topk=TOPK, k1=K1, b=B).to_pandas() \
        .sort_values(["query_id", "score_ppm", "doc_id"],
                     ascending=[True, False, True]).reset_index(drop=True)

    pdf = docs.to_pandas().sort_values("doc_id")
    ids = pdf["doc_id"].tolist()
    toks = [(t or "").split() for t in pdf["text"]]
    terms = sorted({w for _, q in queries for w in q.split()})
    N, ntok = len(toks), sum(len(t) for t in toks)
    df = {w: sum(1 for tl in toks if w in tl) for w in terms}
    avgdl = ntok / N
    idf = {w: math.log(1.0 + (N - df[w] + 0.5) / (df[w] + 0.5))
           for w in terms}
    exp_rows = []
    for qid, q in queries:
        scored = []
        for did, tl in zip(ids, toks):
            dl = float(len(tl))
            bb = K1 * (1.0 - B + B * dl / avgdl)
            s = 0
            for w in set(q.split()):
                tf = float(tl.count(w))
                contrib = idf[w] * ((tf * (K1 + 1.0)) / (tf + bb))
                s += int(math.floor(contrib * 1e6))
            if s > 0:
                scored.append((s, did))
        scored.sort(key=lambda t: (-t[0], t[1]))
        exp_rows += [(qid, did, s) for s, did in scored[:TOPK]]
    got = list(out.itertuples(index=False, name=None))
    assert got == exp_rows
    # every query actually retrieved a full page (non-vacuous corpus)
    assert out.groupby("query_id").size().eq(TOPK).all()


def test_bm25_indexed_matches_scan_and_prunes(docs, tmp_path):
    """The persisted inverted index returns EXACTLY the scan plan's
    rows (same ppm contract), under two different input partitionings,
    while reading only the partitions the query terms hash to."""
    import pandas as pd

    from pttcrawler_ray.textops.bm25index import (bm25_topk_indexed,
                                                  build_bm25_index)
    from pttcrawler_ray.textops.retrieval import bm25_topk

    queries = [(0, "fast table scan"), (7, "customer query join slow"),
               (9, "zzz_no_such_term")]
    K1, B, TOPK = 1.2, 0.75, 8
    cols = ["query_id", "score_ppm", "doc_id"]
    want = bm25_topk(docs, queries, topk=TOPK, k1=K1, b=B).to_pandas() \
        .sort_values(cols).reset_index(drop=True)

    idx = str(tmp_path / "bm25idx")
    meta = build_bm25_index(docs, idx, n_parts=16)
    assert meta["n_docs"] == docs.count()
    stats: dict = {}
    got = bm25_topk_indexed(idx, queries, topk=TOPK, k1=K1, b=B,
                            stats_out=stats).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)
    # pruning is real: the 7 distinct query terms hash to < all parts
    assert 0 < stats["parts_probed"] < stats["parts_total"]
    assert 0 < stats["files_read"] < stats["files_total"]

    # a different build partitioning yields the identical result
    idx2 = str(tmp_path / "bm25idx2")
    build_bm25_index(docs.repartition(7), idx2, n_parts=4)
    got2 = bm25_topk_indexed(idx2, queries, topk=TOPK, k1=K1, b=B) \
        .to_pandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2[cols], want[cols], check_dtype=False)

    # rebuilding IN PLACE replaces the store (no silent posting
    # duplication from the hive-append write)
    build_bm25_index(docs, idx2, n_parts=4)
    got3 = bm25_topk_indexed(idx2, queries, topk=TOPK, k1=K1, b=B) \
        .to_pandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got3[cols], want[cols], check_dtype=False)

    # no-hit query set → empty, stable schema (ray to_pandas drops
    # columns on 0-row datasets, so assert at the Dataset level)
    eds = bm25_topk_indexed(idx, [(1, "zzz_no_such_term")])
    assert eds.count() == 0 and set(cols) <= set(eds.schema().names)


def test_bm25_index_append_equals_rebuild(docs, tmp_path):
    """Incrementally appended postings score EXACTLY like a from-scratch
    rebuild over the union corpus (df/avgdl/N are read-time, so the very
    next query reflects the increment)."""
    import pandas as pd

    from pttcrawler_ray.textops.bm25index import (append_bm25_index,
                                                  bm25_topk_indexed,
                                                  build_bm25_index)

    queries = [(0, "fast table scan"), (7, "customer query join slow")]
    cols = ["query_id", "score_ppm", "doc_id"]
    t = docs.to_pandas()
    half = len(t) // 2
    first = rd.from_arrow(pa.Table.from_pandas(t.iloc[:half]))
    second = rd.from_arrow(pa.Table.from_pandas(t.iloc[half:]))

    inc = str(tmp_path / "inc")
    m0 = build_bm25_index(first, inc, n_parts=8)
    m1 = append_bm25_index(second, inc)
    assert m1["n_docs"] == m0["n_docs"] + (len(t) - half) == len(t)

    full = str(tmp_path / "full")
    build_bm25_index(docs, full, n_parts=8)
    got = bm25_topk_indexed(inc, queries, topk=8).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    want = bm25_topk_indexed(full, queries, topk=8).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)


def test_bm25_index_cdc_remove_equals_rebuild(docs, tmp_path):
    """CDC maintenance (build + append + remove) must equal a rebuild
    over the FINAL corpus — N/avgdl/df effects included, because
    removing docs that carry query terms shifts idf for every other
    result — and compaction must apply the deletes physically without
    changing any result."""
    import glob as _glob
    import os as _os

    import pandas as pd

    from pttcrawler_ray.textops.bm25index import (append_bm25_index,
                                                  bm25_topk_indexed,
                                                  build_bm25_index,
                                                  compact_bm25_index,
                                                  remove_from_bm25_index)

    queries = [(0, "fast table scan"), (7, "customer query join slow")]
    cols = ["query_id", "score_ppm", "doc_id"]
    t = docs.to_pandas()
    half = len(t) // 2
    first = rd.from_arrow(pa.Table.from_pandas(t.iloc[:half]))
    second = rd.from_arrow(pa.Table.from_pandas(t.iloc[half:]))

    # removals: docs that actually MATCH the queries (idf must shift) +
    # one miss-id that never existed (must be a no-op)
    idx = str(tmp_path / "cdc")
    build_bm25_index(first, idx, n_parts=8)
    append_bm25_index(second, idx)
    pre = bm25_topk_indexed(idx, queries, topk=8).to_pandas()
    rm = sorted(pre["doc_id"].unique()[:5].tolist())
    meta = remove_from_bm25_index(idx, rm + [10 ** 12])
    assert meta["n_docs"] == len(t) - len(rm)

    surviving = rd.from_arrow(pa.Table.from_pandas(
        t[~t["doc_id"].isin(rm)]))
    build_bm25_index(surviving, str(tmp_path / "rebuilt"), n_parts=8)
    want = bm25_topk_indexed(str(tmp_path / "rebuilt"), queries,
                             topk=8).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    got = bm25_topk_indexed(idx, queries, topk=8).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    assert not set(got["doc_id"]) & set(rm)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)

    # idempotent re-remove
    meta2 = remove_from_bm25_index(idx, rm)
    assert meta2["n_docs"] == meta["n_docs"]

    # compaction: physical delete, results unchanged, delete list gone
    compact_bm25_index(idx)
    assert not _os.path.isdir(_os.path.join(idx, "deleted"))
    ids_left = set()
    import pyarrow.parquet as _pq

    for f in _glob.glob(_os.path.join(idx, "postings", "part=*",
                                      "*.parquet")):
        ids_left |= set(_pq.read_table(f, columns=["doc_id"])["doc_id"]
                        .to_pylist())
    assert not ids_left & set(rm)
    got2 = bm25_topk_indexed(idx, queries, topk=8).to_pandas() \
        .sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2[cols], want[cols],
                                  check_dtype=False)


def test_bm25_index_guards(docs, tmp_path):
    """Version mismatch and uncommitted-write marker must fail loudly;
    repair rolls an interrupted append back to a consistent store."""
    import json as _json
    import os as _os

    import pandas as pd
    import pytest as _pytest

    from pttcrawler_ray.textops.bm25index import (bm25_topk_indexed,
                                                  build_bm25_index,
                                                  append_bm25_index,
                                                  repair_bm25_index)

    idx = str(tmp_path / "g")
    build_bm25_index(docs, idx, n_parts=4)
    queries = [(0, "fast table scan")]
    base = bm25_topk_indexed(idx, queries, topk=8).to_pandas() \
        .sort_values(["query_id", "score_ppm", "doc_id"]) \
        .reset_index(drop=True)

    # version bump: every entry point refuses
    mpath = _os.path.join(idx, "meta.json")
    meta = _json.load(open(mpath))
    _json.dump({**meta, "version": 999}, open(mpath, "w"))
    with _pytest.raises(RuntimeError, match="rebuild"):
        bm25_topk_indexed(idx, queries)
    with _pytest.raises(RuntimeError, match="rebuild"):
        append_bm25_index(docs, idx)
    _json.dump(meta, open(mpath, "w"))

    # crash mid-append: kill the process conceptually by staging the
    # marker + writing an orphan postings file without the meta commit
    from pttcrawler_ray.textops.bm25index import _stage_pending

    _stage_pending(idx, "append", "postings")
    orphan = _os.path.join(idx, "postings", "part=0", "orphan.parquet")
    import pyarrow.parquet as _pq

    _pq.write_table(pa.table({"term": ["fast"], "doc_id": [999999],
                              "tf": [50], "dl": [50]}), orphan)
    with _pytest.raises(RuntimeError, match="uncommitted"):
        bm25_topk_indexed(idx, queries)
    repair_bm25_index(idx)
    assert not _os.path.exists(orphan)
    after = bm25_topk_indexed(idx, queries, topk=8).to_pandas() \
        .sort_values(["query_id", "score_ppm", "doc_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(after, base, check_dtype=False)


def test_shuffle_rank_permutation_and_sql(docs):
    """shuffle_rank is a dense permutation 0..n-1 in splitmix64-hash
    order, invariant to input partitioning, and equals the pure-SQL
    DuckDB twin row for row."""
    import duckdb

    from pttcrawler_ray.textops.sampling import (shuffle_rank,
                                                 shuffle_rank_sql,
                                                 splitmix64)

    out = shuffle_rank(docs, salt=7).to_pandas().sort_values("doc_id")
    n = len(out)
    assert sorted(out["shuffle_rank"]) == list(range(n))
    ids = out["doc_id"].to_numpy().astype(np.uint64)
    h = splitmix64(ids + np.uint64(7))
    # rank order == hash order
    assert (np.argsort(out["shuffle_rank"].to_numpy()) == np.argsort(h)).all()

    out2 = shuffle_rank(docs.repartition(7), salt=7).to_pandas() \
        .sort_values("doc_id")
    assert out2["shuffle_rank"].tolist() == out["shuffle_rank"].tolist()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    sql = con.execute(shuffle_rank_sql("documents", salt=7)).df() \
        .sort_values("doc_id")
    assert sql["shuffle_rank"].astype(int).tolist() == \
        out["shuffle_rank"].tolist()


def test_minhash_dedup_zero_pairs(ray_session):
    """A corpus with NO near-dups must pass through minhash_dedup
    unchanged — the verified-pair set is then a zero-BLOCK dataset with
    no schema, which the pair collector must guard before sorting
    (regression: KeyError 'doc_a' from sort_values on a column-less
    empty frame)."""
    from pttcrawler_ray.textops.dedup import minhash_dedup

    rows = [{"doc_id": i,
             "text": " ".join(f"u{i}w{j}" for j in range(30))}
            for i in range(20)]
    out = minhash_dedup(rd.from_items(rows), threshold=0.7).to_pandas()
    assert sorted(out["doc_id"]) == list(range(20))


def test_semdedup_planted_groups(ray_session):
    """Planted anchor/subgroup structure: 3 orthogonal anchors × 2
    subgroups × 3 byte-identical members.  Within a subgroup cosine is
    exactly 1 (drop all but the scan-first member); across subgroups of
    one anchor cosine is 0.8 (< threshold, kept); centroid similarity
    ties everywhere, so the vec_id tiebreak decides — kept must be the
    minimum id of every (anchor, subgroup)."""
    from pttcrawler_ray.textops.semdedup import semdedup

    anchors = np.eye(8)[:3]
    rows = []
    i = 0
    for a in range(3):
        for g in range(2):
            base = anchors[a] + 0.5 * np.eye(8)[4 + g]
            for _ in range(3):
                rows.append({"vec_id": i,
                             "embedding": [float(x) for x in base]})
                i += 1
    out = semdedup(rd.from_items(rows), centroids=anchors,
                   threshold=0.9).to_pandas().sort_values("vec_id")
    assert len(out) == 18
    assert sorted(out[out.kept == 1].vec_id) == [0, 3, 6, 9, 12, 15]
    assert (out.cluster.to_numpy() == np.repeat([0, 1, 2], 6)).all()
    # stable under repartitioning (batch boundaries must not matter)
    out2 = semdedup(rd.from_items(rows).repartition(5), centroids=anchors,
                    threshold=0.9).to_pandas().sort_values("vec_id")
    assert out2.kept.tolist() == out.kept.tolist()


def test_semdedup_chunked_scan_matches_full():
    """triangular_prior_max's chunked scan == the one-shot full-matrix
    triangular max, including a chunk size that forces many chunks."""
    from pttcrawler_ray.textops import semdedup as sd

    rng = np.random.default_rng(3)
    m = rng.standard_normal((97, 16))
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    want = np.where(np.tri(97, k=-1, dtype=bool), sims, -np.inf).max(axis=1)
    got = sd.triangular_prior_max(m)
    assert np.allclose(got[1:], want[1:]) and got[0] == -np.inf
    old = sd._CHUNK_CELLS
    try:
        sd._CHUNK_CELLS = 300   # ~3-row chunks
        got2 = sd.triangular_prior_max(m)
    finally:
        sd._CHUNK_CELLS = old
    # BLAS blocking differs per chunk shape → last-ulp drift is expected;
    # drop decisions are protected by the threshold margin, not bitwise
    # equality (see the module docstring's determinism spec)
    assert np.allclose(got2[1:], got[1:], rtol=0, atol=1e-12)


def test_dsir_selects_target_like_docs(ray_session):
    """Planted domain structure: raw corpus = 10 target-like docs + 10
    junk docs; DSIR must weight every target-like doc above every junk
    doc and the Gumbel-top-10 resample must pick exactly the
    target-like set (the weight gap ~16e6 ppm dwarfs the noise)."""
    from pttcrawler_ray.textops.dsir import dsir_select

    target = rd.from_items([
        {"doc_id": 100 + i, "text": "alpha beta gamma delta"}
        for i in range(5)])
    raw_rows = (
        [{"doc_id": i, "text": "alpha beta gamma delta epsilon"}
         for i in range(10)] +
        [{"doc_id": 10 + i, "text": "zig zag zog quux blorp"}
         for i in range(10)])
    out = dsir_select(rd.from_items(raw_rows), target, k=10,
                      buckets=512).to_pandas().sort_values("doc_id")
    assert len(out) == 20
    assert sorted(out[out.selected == 1].doc_id) == list(range(10))
    w = dict(zip(out.doc_id, out.logw_ppm))
    assert min(w[i] for i in range(10)) > max(w[10 + i] for i in range(10))
    # 5 tokens -> 5 unigrams + 4 bigrams
    assert (out.n_grams == 9).all()
    # stable under repartitioning (batch boundaries must not matter)
    out2 = dsir_select(rd.from_items(raw_rows).repartition(7), target,
                       k=10, buckets=512).to_pandas().sort_values("doc_id")
    for c in ["n_grams", "logw_ppm", "key_ppm", "selected"]:
        assert out2[c].tolist() == out[c].tolist(), c


def test_dsir_topk_cut_ties_and_small_corpus(ray_session):
    """The integer cut keeps exactly k rows with (key DESC, id ASC)
    tiebreak; k >= corpus selects everything; empty docs weigh 0."""
    from pttcrawler_ray.textops.dsir import (dsir_weights, log_ratio_table,
                                             topk_cut)
    import numpy as np

    ratio = np.zeros(16)
    docs = rd.from_items([{"doc_id": i, "text": ""} for i in range(6)])
    w = dsir_weights(docs, ratio, salt=3).materialize()
    df = w.to_pandas()
    assert (df.logw_ppm == 0).all() and (df.n_grams == 0).all()
    # keys are the pure gumbel_ppm: distinct hashes, exact k survive
    cut = topk_cut(w, 3)
    ck, ci = cut
    sel = df[(df.key_ppm > ck) |
             ((df.key_ppm == ck) & (df.doc_id <= ci))]
    assert len(sel) == 3
    assert topk_cut(w, 6) is not None and topk_cut(w, 7) is None
    assert log_ratio_table(np.zeros(4, np.int64),
                           np.zeros(4, np.int64)).tolist() == [0.0] * 4


def test_prototype_prune_graded_clusters(ray_session):
    """Graded prototypicality: cluster 0 has 10 members at strictly
    decreasing centroid cosine, cluster 1 has 4.  drop_frac=0.3 must
    drop floor(3)=3 / floor(1.2)=1 members — exactly the highest-csim
    ones — and the shuffle is embedding-free by construction."""
    from pttcrawler_ray.textops.semdedup import prototype_prune

    anchors = np.eye(8)[:2]
    rows = []
    for j in range(10):  # cluster 0: csim = cos(j * 0.05), id order = csim order
        th = 0.05 * j
        v = np.cos(th) * anchors[0] + np.sin(th) * np.eye(8)[2]
        rows.append({"vec_id": j, "embedding": [float(x) for x in v]})
    for j in range(4):   # cluster 1
        th = 0.1 * j
        v = np.cos(th) * anchors[1] + np.sin(th) * np.eye(8)[3]
        rows.append({"vec_id": 100 + j, "embedding": [float(x) for x in v]})
    out = prototype_prune(rd.from_items(rows), centroids=anchors,
                          drop_frac=0.3).to_pandas().sort_values("vec_id")
    assert len(out) == 14
    dropped = sorted(out[out.kept == 0].vec_id)
    assert dropped == [0, 1, 2, 100]
    # stable under repartitioning
    out2 = prototype_prune(rd.from_items(rows).repartition(5),
                           centroids=anchors,
                           drop_frac=0.3).to_pandas().sort_values("vec_id")
    assert out2.kept.tolist() == out.kept.tolist()


def test_d4_fused_stages(ray_session):
    """D4 over the semdedup planted structure (3 anchors x 2 subgroups x
    3 identical members): semdedup keeps the min-id member of each
    subgroup (csim tie, id ASC); prototypes then drop floor(0.5 x 2)=1
    of the 2 survivors per cluster — the csim-tied LOWER id — so the
    final kept set is the g=1 subgroup representatives."""
    from pttcrawler_ray.textops.semdedup import d4

    anchors = np.eye(8)[:3]
    rows = []
    i = 0
    for a in range(3):
        for g in range(2):
            base = anchors[a] + 0.5 * np.eye(8)[4 + g]
            for _ in range(3):
                rows.append({"vec_id": i,
                             "embedding": [float(x) for x in base]})
                i += 1
    out = d4(rd.from_items(rows), centroids=anchors, threshold=0.9,
             drop_frac=0.5).to_pandas().sort_values("vec_id")
    assert len(out) == 18
    assert sorted(out[out.kept == 1].vec_id) == [3, 9, 15]
    stage = out.set_index("vec_id").drop_stage
    assert sorted(stage[stage == 2].index) == [0, 6, 12]
    assert (stage == 1).sum() == 12
    assert (out.kept == (out.drop_stage == 0).astype(int)).all()


def test_tokens_flat_layout_stress(ray_session):
    """Regression stress for the one observed nondeterministic wrong
    answer (round 4: an empty token survived _tokens_flat's filter once
    under a loaded session, n_tokens==3 for '  a   b  ').  Exercises the
    kernel over many physical layouts — multi-chunk arrays, sliced
    (non-zero-offset) arrays, 1-row slices, null-typed and null-bearing
    blocks — and repeats each, asserting exact str.split() parity and
    flat/parents alignment every time."""
    from pttcrawler_ray.textops.analysis import _tokens_flat
    from pttcrawler_ray.textops.chunking import chunk_batch

    rng = np.random.default_rng(7)
    ws = [" ", "  ", "\t", "\n", " \t "]
    words = ["a", "bb", "ccc", "w0", "中文", "x" * 17]

    def rand_text():
        n = int(rng.integers(0, 6))
        parts = []
        if rng.random() < 0.5:
            parts.append(ws[int(rng.integers(len(ws)))])
        for j in range(n):
            parts.append(words[int(rng.integers(len(words)))])
            parts.append(ws[int(rng.integers(len(ws)))])
        txt = "".join(parts)
        return txt if rng.random() < 0.9 else None

    def check(arr):
        flat, parents, counts = _tokens_flat(arr)
        pylist = arr.to_pylist()
        expect_toks = [(t or "").split() for t in pylist]
        assert counts.tolist() == [len(t) for t in expect_toks]
        assert len(flat) == len(parents) == sum(len(t) for t in expect_toks)
        assert flat.to_pylist() == [w for t in expect_toks for w in t]
        assert parents.tolist() == [i for i, t in enumerate(expect_toks)
                                    for _ in t]

    for _ in range(30):
        texts = [rand_text() for _ in range(40)]
        plain = pa.array(texts, pa.string())
        check(plain)
        # sliced views at odd offsets (non-zero offset + bit-offset mask)
        for off, ln in ((1, 7), (3, 1), (9, 17), (33, 7)):
            check(plain.slice(off, ln))
        # multi-chunk with empty and 1-row chunks interleaved
        check(pa.chunked_array([
            plain.slice(0, 5), pa.array([], pa.string()),
            plain.slice(5, 1), plain.slice(6, 34)]))

    # null-typed column (from_items all-None) and the exact round-4 doc
    check(pa.array([None, None], pa.null()))
    tbl = pa.table({"doc_id": pa.array([3], pa.int64()),
                    "text": pa.array(["  a   b  "])})
    for _ in range(50):
        out = chunk_batch(tbl, size=16, stride=12, id_col="doc_id",
                          text_col="text")
        assert out["n_tokens"].to_pylist() == [2]
        assert out["text"].to_pylist() == ["a b"]


def test_chunk_docs_windows(ray_session):
    """Sliding-window spec: n=16/size=16 is one chunk; n=17 is two
    (second = tokens 12..16, 5 tokens); empty docs emit nothing; chunk
    text is the space-joined token slice."""
    from pttcrawler_ray.textops.chunking import chunk_docs

    docs = [
        {"doc_id": 0, "text": " ".join(f"w{j}" for j in range(16))},
        {"doc_id": 1, "text": " ".join(f"w{j}" for j in range(17))},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "  a   b  "},
    ]
    out = chunk_docs(rd.from_items(docs), size=16,
                     stride=12).to_pandas().sort_values(
        ["doc_id", "chunk_id"]).reset_index(drop=True)
    assert out.doc_id.tolist() == [0, 1, 1, 3]
    assert out.chunk_id.tolist() == [0, 0, 1, 0]
    assert out.n_tokens.tolist() == [16, 16, 5, 2]
    assert out.text[2] == "w12 w13 w14 w15 w16"
    assert out.text[3] == "a b"


def test_bpe_train_and_encode_semantics(ray_session):
    """Hand-computed merge sequence (count-then-lexicographic tie-break,
    '</w>' sorts before letters) + greedy lowest-rank encode; the
    streaming counter equals a per-doc replay."""
    from pttcrawler_ray.textops.bpe import (bpe_token_counts, encode_word,
                                            train_bpe)

    merges = train_bpe([("aa", 3), ("ab", 2)], n_merges=4, min_freq=2)
    assert merges == [("a", "</w>"), ("a", "a</w>"),
                      ("a", "b"), ("ab", "</w>")]

    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("aa", ranks) == ["aa</w>"]
    assert encode_word("ab", ranks) == ["ab</w>"]
    assert encode_word("ba", ranks) == ["b", "a</w>"]   # partial coverage
    assert encode_word("zq", ranks) == ["z", "q", "</w>"]  # OOV passthrough

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["aa ab aa", "zq ba"]}))
    got = {r["doc_id"]: r for r in
           bpe_token_counts(ds, merges).to_pandas().to_dict("records")}
    assert got[0]["n_tokens"] == 3 and got[0]["n_bpe_tokens"] == 3
    assert got[1]["n_tokens"] == 2 and got[1]["n_bpe_tokens"] == 5


def test_span_dedup_empty_and_null_text(ray_session):
    """Empty / whitespace-only / null texts flow through the rewrite
    (regression: a trailing zero-token doc crashed the reduceat)."""
    import duckdb
    import pandas as pd

    from pttcrawler_ray.textops.spandedup import span_dedup, span_dedup_sql

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["a b c d e f", None, "   ",
                                    "a b c d e f tail", ""], pa.string())})
    got = span_dedup(rd.from_arrow(t), k=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(span_dedup_sql("documents", k=4)).fetch_df() \
        .sort_values("doc_id").reset_index(drop=True)
    cols = ["doc_id", "text_clean", "n_tokens", "n_dropped"]
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)
    assert got.loc[3, "n_dropped"] == 6   # the shared prefix span union
