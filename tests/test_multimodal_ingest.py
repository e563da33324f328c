"""Multimodal resize/frame-sample plumbing + pages ingest source."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data as rd


def test_resize_media(ray_session):
    from pttcrawler_ray.multimodal import DecodeMedia, make_fake_blob, resize_media

    rows = [{"media_id": i, "payload": make_fake_blob(i)} for i in range(12)]
    rows.append({"media_id": 99, "payload": b"junk"})
    out = resize_media(rd.from_items(rows), 8, 6, fake=True).to_pandas()
    ok = out[out["error"].isna()]
    assert len(ok) == 12
    assert out[out["media_id"] == 99]["error"].iloc[0].startswith(
        "resize failed")
    # resized blobs are themselves decodable at the new dimensions
    dec = DecodeMedia(fake=True)
    k, w, h, c, _, _ph = dec._decode_one(ok.iloc[0]["payload"])
    assert (w, h, c) == (8, 6, 3)
    # PTMM without fake=True is a typed error row, not a crash
    out2 = resize_media(rd.from_items(rows[:1]), 8, 6, fake=False).to_pandas()
    assert out2["error"].iloc[0].startswith("codec unavailable")


def test_resize_media_real_containers(ray_session):
    """Real containers resize for real: decode -> closed-form
    nearest-neighbor -> lossless PNG re-encode; output pixels equal
    resize_pixels() of the generated SOURCE arrays, and audio payloads
    come back as typed error rows."""
    import numpy as np

    from pttcrawler_ray.multimodal import (decode_png, make_bmp_source,
                                           make_codec_blob, make_gif_source,
                                           make_jpeg_source, resize_media,
                                           resize_pixels)

    rows = [{"media_id": i, "payload": make_codec_blob(i)} for i in range(8)]
    out = resize_media(rd.from_items(rows), 16, 12, fake=False).to_pandas() \
        .set_index("media_id").sort_index()
    for i in range(8):
        k = i % 4
        if k == 2:  # wav
            assert out.loc[i, "error"] == "resize undefined for audio container"
            continue
        assert out.loc[i, "error"] is None, out.loc[i, "error"]
        if k == 0:
            idx, pal = make_gif_source(i)
            src = pal[idx]
        elif k == 1:
            src = make_bmp_source(i)
        else:
            _, src = make_jpeg_source(i)
        exp = resize_pixels(src, 16, 12)
        w, h, c, px = decode_png(out.loc[i, "payload"])
        assert (w, h) == (16, 12)
        np.testing.assert_array_equal(px.reshape(12, 16, -1), exp)


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
    kind, w, h, c, _, _ph = dec._decode_one(out.iloc[0]["payload"])
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


def test_decode_png_hand_built():
    """A PNG assembled byte-by-byte in the test (no encoder involved):
    2x2 RGB, filter 0 rows — decode must return the exact pixels."""
    import struct
    import zlib
    from binascii import crc32

    from pttcrawler_ray.multimodal import decode_png

    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    raw = b""
    for row in px:
        raw += b"\x00" + b"".join(bytes(p) for p in row)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    w, h, c, arr = decode_png(blob)
    assert (w, h, c) == (2, 2, 3)
    assert arr.tolist() == [[[255, 0, 0], [0, 255, 0]],
                            [[0, 0, 255], [255, 255, 255]]]


def test_decode_png_all_filters_and_color_types():
    """Round-trip through every scanline filter (0..4) and every
    supported color type (gray / gray+alpha / RGB / RGBA)."""
    import numpy as np

    from pttcrawler_ray.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(11, 7, ch), dtype=np.uint8)
        for filters in ([0] * 11, [1] * 11, [2] * 11, [3] * 11, [4] * 11,
                        [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 3]):
            blob = encode_png(img, filters=filters)
            w, h, c, arr = decode_png(blob)
            assert (w, h, c) == (7, 11, ch)
            np.testing.assert_array_equal(arr, img), (ch, filters)


def test_decode_png_rejects_bad_input():
    import struct
    import zlib
    from binascii import crc32

    import numpy as np
    import pytest as _pytest

    from pttcrawler_ray.multimodal import decode_png, encode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNKJUNKJUNK")
    # corrupt a CRC byte
    blob = bytearray(encode_png(np.zeros((3, 3, 3), np.uint8)))
    blob[20] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC|bit depth|color type"):
        decode_png(bytes(blob))

    # palette color type rejected with a specific message
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF))

    pal = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
           + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="color type"):
        decode_png(pal)


def test_decode_media_real_png(ray_session):
    """decode_media(fake=False): real PNG pixels drive width/height/
    channels/pixel_hash/features; non-PNG containers error out."""
    import numpy as np

    from pttcrawler_ray.multimodal import decode_media, encode_png
    from pttcrawler_ray.util.hashing import hash_u64

    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, size=(6 + i, 5, 3), dtype=np.uint8)
            for i in range(4)}
    rows = [{"media_id": i, "payload": encode_png(img, filters=[4] * len(img))}
            for i, img in imgs.items()]
    rows.append({"media_id": 9, "payload": b"\x89PNG\r\n\x1a\nbroken"})
    # read back as Arrow: a nullable uint64 pixel_hash would round-trip
    # through pandas as float64 and lose low bits
    tbl = pa.concat_tables(
        ray.get(decode_media(rd.from_items(rows), fake=False).to_arrow_refs()))
    by_id = {r["media_id"]: r for r in tbl.to_pylist()}
    for i, img in imgs.items():
        r = by_id[i]
        assert (r["kind"], r["width"], r["height"], r["channels"]) == \
            ("image", 5, 6 + i, 3)
        assert r["pixel_hash"] == hash_u64(img.reshape(-1).tobytes())
        assert abs(sum(r["feature"]) - 1.0) < 1e-9
    assert by_id[9]["error"].startswith("png decode failed")


def test_lzw_round_trip_growth_and_reset():
    """GIF-variant LZW encoder/decoder agree through code-width growth
    to 12 bits and the 4096-entry table reset."""
    import numpy as np

    from pttcrawler_ray.multimodal import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0)
    for min_code in (2, 4, 8):
        for n in (1, 5, 300, 120_000):
            data = rng.integers(0, 1 << min_code, n).astype(np.uint8).tobytes()
            assert _lzw_decode(_lzw_encode(data, min_code), min_code) == data
            runs = np.repeat(rng.integers(0, 1 << min_code,
                                          max(n // 50, 1)), 50)
            runs = runs.astype(np.uint8).tobytes()[:n]
            assert _lzw_decode(_lzw_encode(runs, min_code), min_code) == runs


def test_decode_gif_bmp_wav_round_trip():
    import numpy as np

    from pttcrawler_ray.multimodal import (decode_bmp, decode_gif,
                                           decode_wav, encode_bmp,
                                           encode_gif, encode_wav)

    rng = np.random.default_rng(11)
    # GIF: palette sizes from 2-color to 256-color, incl. 12-bit growth
    for n in (2, 16, 256):
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(40, 60), dtype=np.uint8)
        w, h, c, px = decode_gif(encode_gif(idx, pal))
        assert (w, h, c) == (60, 40, 3)
        np.testing.assert_array_equal(px, pal[idx])
    # BMP: odd width exercises the 4-byte row padding
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    w, h, c, px = decode_bmp(encode_bmp(img))
    assert (w, h, c) == (7, 9, 3)
    np.testing.assert_array_equal(px, img)
    # WAV: 16-bit stereo and 8-bit mono
    smp = rng.integers(-32768, 32768, size=(500, 2)).astype("<i2")
    nf, sr, ch, out = decode_wav(encode_wav(smp, 16000))
    assert (nf, sr, ch) == (500, 16000, 2)
    np.testing.assert_array_equal(out, smp)
    smp8 = np.arange(256, dtype=np.uint8)
    nf, sr, ch, out = decode_wav(encode_wav(smp8, 8000))
    assert (nf, sr, ch, out.ravel().tolist()) == (256, 8000, 1,
                                                  list(range(256)))


def test_decode_jpeg_block_exact_and_lossy_bounds():
    """Baseline JPEG: 8x8 block-constant sources (DC-only coefficients)
    round-trip BIT-EXACTLY under quantizer-of-ones; arbitrary images
    come back within DCT-rounding bounds; restart markers (DRI + RSTn,
    predictor resets) decode identically to the unsegmented stream."""
    import numpy as np

    from pttcrawler_ray.multimodal import (decode_jpeg, encode_jpeg,
                                           make_jpeg_blob,
                                           make_jpeg_source)

    for mid in range(40):
        _, exp = make_jpeg_source(mid)
        w, h, c, px = decode_jpeg(make_jpeg_blob(mid))
        assert (w, h) == (exp.shape[1], exp.shape[0])
        assert c == (1 if exp.ndim == 2 else 3)
        np.testing.assert_array_equal(px, exp)

    rng = np.random.default_rng(11)
    # gray, non-multiple-of-8 dims (edge-replication padding + crop)
    img = rng.integers(0, 256, size=(37, 51), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img))
    assert (w, h, c) == (51, 37, 1)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 2
    # rgb: color-transform rounding adds a little
    img3 = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img3, source="rgb"))
    assert (w, h, c) == (24, 24, 3)
    assert np.abs(px.astype(int) - img3.astype(int)).max() <= 4

    # restart intervals must not change decoded pixels
    base = decode_jpeg(encode_jpeg(img))[3]
    for ri in (1, 3, 7):
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg(img, restart_interval=ri))[3], base)


def test_decode_jpeg_rejects_unsupported():
    import struct

    import numpy as np
    import pytest

    from pttcrawler_ray.multimodal import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"JUNK")
    blob = bytearray(encode_jpeg(
        np.zeros((8, 8), np.uint8)))
    sof = blob.index(b"\xff\xc0")
    prog = bytes(blob[:sof]) + b"\xff\xc2" + bytes(blob[sof + 2:])
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    # corrupt the sampling byte -> subsampled rejection
    sub = bytearray(blob)
    sub[sof + 2 + 2 + 6 + 1] = 0x22  # component 0 H/V
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(bytes(sub))
    # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob[:sof]) + b"\xff\xd9")


def test_decode_media_real_codecs(ray_session):
    """decode_media(fake=False) recognises GIF/BMP/WAV/JPEG signatures
    and reproduces hashes of the generated SOURCE arrays (no round-trip
    on the expectation side)."""
    from pttcrawler_ray.multimodal import (codec_expected_row,
                                           decode_media, make_codec_blob)

    rows = [{"media_id": i, "payload": make_codec_blob(i)}
            for i in range(12)]
    rows.append({"media_id": 99, "payload": b"GIF89a broken"})
    tbl = pa.concat_tables(
        ray.get(decode_media(rd.from_items(rows), fake=False).to_arrow_refs()))
    by_id = {r["media_id"]: r for r in tbl.to_pylist()}
    for i in range(12):
        kind, w, h, c, ph = codec_expected_row(i)
        r = by_id[i]
        assert (r["kind"], r["width"], r["height"], r["channels"],
                r["pixel_hash"]) == (kind, w, h, c, ph), i
        assert r["error"] is None
    assert by_id[99]["error"].startswith("gif decode failed")


def test_phash_dedup_reencoded_copies(ray_session):
    """dHash is a pure function of the PIXELS: re-encoding with
    different PNG filter bytes changes the file, not the hash, and the
    dedup keeps exactly the smallest media_id per hash."""
    import ray.data as rd

    from pttcrawler_ray.multimodal import (decode_png, dhash_pixels,
                                           encode_png, make_png_pixels,
                                           phash_dedup)

    px, filters = make_png_pixels(11)
    b_a = encode_png(px, filters=filters)
    b_b = encode_png(px, filters=None)
    assert b_a != b_b                                  # bytes differ
    assert dhash_pixels(decode_png(b_a)[3]) == \
        dhash_pixels(decode_png(b_b)[3])               # hashes agree

    px2, f2 = make_png_pixels(12)
    blobs = rd.from_arrow(pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([b_a, b_b, encode_png(px2, filters=f2)],
                            pa.binary())}))
    out = phash_dedup(blobs).to_pandas().sort_values("media_id")
    assert out["kept"].tolist() == [1, 0, 1]
    assert out["dhash"].iloc[0] == out["dhash"].iloc[1]
    assert out["dhash"].iloc[2] != out["dhash"].iloc[0]
