"""Multimodal resize/frame-sample plumbing + pages ingest source."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def test_resize_media(ray_session):
    from pttcrawler_ray.multimodal import DecodeMedia, ResizeMedia, make_fake_blob, resize_media

    with pytest.raises(NotImplementedError):
        ResizeMedia(8, 8, fake=False)

    rows = [{"media_id": i, "payload": make_fake_blob(i)} for i in range(12)]
    rows.append({"media_id": 99, "payload": b"junk"})
    out = resize_media(rd.from_items(rows), 8, 6, fake=True).to_pandas()
    ok = out[out["error"].isna()]
    assert len(ok) == 12 and out[out["media_id"] == 99]["error"].iloc[0] == "resize failed"
    # resized blobs are themselves decodable at the new dimensions
    dec = DecodeMedia(fake=True)
    k, w, h, c, _ = dec._decode_one(ok.iloc[0]["payload"])
    assert (w, h, c) == (8, 6, 3)


def test_frame_sample(ray_session):
    from pttcrawler_ray.multimodal import DecodeMedia, FrameSample, frame_sample, make_fake_blob

    with pytest.raises(NotImplementedError):
        FrameSample(4, fake=False)

    rows = [{"media_id": i, "payload": make_fake_blob(i, kind="video")} for i in range(5)]
    rows.append({"media_id": 50, "payload": make_fake_blob(50, kind="image")})  # not video
    out = frame_sample(rd.from_items(rows), n_frames=4, fake=True).to_pandas()
    assert set(out["media_id"]) == set(range(5))  # image rows skipped
    per = out.groupby("media_id")["frame_no"].apply(list)
    assert all(frames == sorted(frames) for frames in per)
    dec = DecodeMedia(fake=True)
    kind, w, h, c, _ = dec._decode_one(out.iloc[0]["payload"])
    assert kind == "image" and c == 3  # frames decode as images


def test_ingest_pages_jsonl(ray_session, tmp_path):
    from pttcrawler_ray.fixtures import corpus_for_scale
    from pttcrawler_ray.sources.ingest import ingest_pages
    from pttcrawler_ray.sources.pages import PagesStore

    # dump a slice of the t1 corpus to jsonl, ingest it back, verify lookup
    d = corpus_for_scale("t1")
    parts = [pq.read_table(f).slice(0, 15)
             for f in sorted(glob.glob(f"{d}/pages/bucket=*/*.parquet"))[:4]]
    src_tbl = pa.concat_tables(parts)
    jsonl = tmp_path / "dump.jsonl"
    with open(jsonl, "w") as f:
        for row in src_tbl.to_pylist():
            f.write(json.dumps({
                "url": row["url"], "warc_ts": row["warc_ts"].isoformat(),
                "html": row["html"].decode("utf-8"), "text": row["text"],
                "lang": row["lang"],
            }) + "\n")

    dest = str(tmp_path / "corpus")
    n = ingest_pages(str(jsonl), dest, n_buckets=4, fmt="jsonl")
    assert n == src_tbl.num_rows
    assert len(glob.glob(os.path.join(dest, "pages", "bucket=*"))) >= 2

    # the manifest pins the write-time modulus even if some buckets are empty
    with open(os.path.join(dest, "pages", "_manifest.json")) as f:
        assert json.load(f)["n_buckets"] == 4
    store = PagesStore(dest)
    assert store.n_buckets == 4

    from pttcrawler_ray.sources.pages import FetchPages

    fetch = FetchPages(corpus_dir=dest)
    url = src_tbl["url"][0].as_py()
    got = fetch(pa.table({"url": pa.array([url, "https://nope.example/x"])}))
    by_url = {u: (h, ok) for u, h, ok in zip(got["url"].to_pylist(),
                                             got["html"].to_pylist(),
                                             got["fetch_ok"].to_pylist())}
    assert by_url[url] == (src_tbl["html"][0].as_py(), True)
    assert by_url["https://nope.example/x"] == (None, False)  # 404 path
