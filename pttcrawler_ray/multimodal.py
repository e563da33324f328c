"""Multimodal column plumbing (training-data ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages with small batch sizes (large binary
rows).

Codec coverage in this container:

- **PNG is decoded for real** — :func:`decode_png` is a pure-stdlib
  (zlib inflate + per-filter unfilter) pixel decoder for 8-bit
  non-interlaced PNGs (gray / gray+alpha / RGB / RGBA), with
  :func:`encode_png` as its fixture-side twin.  ``DecodeMedia`` (any
  mode) recognises the PNG signature and returns real width / height /
  channels / pixel_hash / byte-histogram features.
- Every other container (JPEG/ffmpeg/torchaudio class) is STUBBED: the
  libraries are not in this environment, so non-PNG payloads decode only
  via the clearly-marked deterministic fake codec (``fake=True``,
  header-parse of the synthetic ``PTMM`` blob format) and otherwise come
  back as typed error rows.  Everything around the stub — schema, actor
  signature, batch sizing, output layout — is real and tested.

Synthetic blob format (``make_fake_blob``):
``b"PTMM" | u8 kind | u16 width | u16 height | u8 channels | payload``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .util.hashing import hash_u64

MEDIA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
    ]
)

_KINDS = ["image", "audio", "video"]
_MAGIC = b"PTMM"


def make_fake_blob(media_id: int, kind: str = "image") -> bytes:
    """Deterministic synthetic media blob (pure function of media_id)."""
    rng = np.random.default_rng(media_id)
    w, h, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3
    payload = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
    return _MAGIC + struct.pack("<BHHB", _KINDS.index(kind), w, h, c) + payload


# ------------------------------------------------------------ real PNG codec
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → channel count (8-bit, non-palette types)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(blob: bytes):
    """Real PNG pixel decode, stdlib only (``zlib`` inflate + the five
    scanline unfilters of the PNG spec §9): returns ``(width, height,
    channels, pixels)`` with ``pixels`` an ``(h, w, channels)`` uint8
    array.  Supports 8-bit non-interlaced gray / gray+alpha / RGB / RGBA
    (color types 0/4/2/6); palette, 16-bit and Adam7 raise ``ValueError``
    with a specific message.  Chunk CRCs are verified."""
    import binascii
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ct = None
    idat = []
    while pos + 12 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        typ = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln:pos + 12 + ln])
        if binascii.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch ({typ!r})")
        if typ == b"IHDR":
            w, h, depth, ct, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ct not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {ct}")
            if inter:
                raise ValueError("interlaced (Adam7) PNG unsupported")
            if comp or filt:
                raise ValueError("nonstandard PNG compression/filter method")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG decompressed length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)
    out = np.empty((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f, cur = int(filters[y]), rows[y]
        if f == 0:
            rec = cur
        elif f == 1:   # Sub: modular prefix sum per channel lane
            rec = (cur.reshape(w, ch).cumsum(axis=0) & 255).reshape(stride)
        elif f == 2:   # Up
            rec = (cur + prev) & 255
        elif f == 3:   # Average — sequential in x (left depends on recon)
            c2, pr = cur.reshape(w, ch), prev.reshape(w, ch)
            r2 = np.empty((w, ch), np.int32)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                left = (c2[x] + ((left + pr[x]) >> 1)) & 255
                r2[x] = left
            rec = r2.reshape(stride)
        elif f == 4:   # Paeth — sequential in x
            c2, pr = cur.reshape(w, ch), prev.reshape(w, ch)
            r2 = np.empty((w, ch), np.int32)
            left = np.zeros(ch, np.int32)
            ul = np.zeros(ch, np.int32)
            for x in range(w):
                p = left + pr[x] - ul
                da, db = np.abs(p - left), np.abs(p - pr[x])
                dc = np.abs(p - ul)
                pred = np.where((da <= db) & (da <= dc), left,
                                np.where(db <= dc, pr[x], ul))
                left = (c2[x] + pred) & 255
                r2[x] = left
                ul = pr[x]
            rec = r2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = out[y]
    return int(w), int(h), ch, out.astype(np.uint8).reshape(h, w, ch)


def encode_png(arr: "np.ndarray", filters: "list[int] | None" = None) -> bytes:
    """Fixture-side PNG encoder (stdlib): ``(h, w[, channels])`` uint8 →
    8-bit non-interlaced PNG bytes.  ``filters`` picks the per-row filter
    type (default all 0) so tests can exercise every unfilter path of
    :func:`decode_png`."""
    import binascii
    import zlib

    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    rows = arr.reshape(h, w * ch).astype(np.int32)
    filters = list(filters) if filters is not None else [0] * h
    assert len(filters) == h
    prev = np.zeros(w * ch, np.int32)
    scan = []
    for y in range(h):
        cur, f = rows[y], filters[y]
        c2 = cur.reshape(w, ch)
        left = np.vstack([np.zeros((1, ch), np.int32), c2[:-1]])
        up = prev.reshape(w, ch)
        ul = np.vstack([np.zeros((1, ch), np.int32), up[:-1]])
        if f == 0:
            raw = cur
        elif f == 1:
            raw = (c2 - left).reshape(-1)
        elif f == 2:
            raw = cur - prev
        elif f == 3:
            raw = (c2 - ((left + up) >> 1)).reshape(-1)
        elif f == 4:
            p = left + up - ul
            da, db, dc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((da <= db) & (da <= dc), left,
                            np.where(db <= dc, up, ul))
            raw = (c2 - pred).reshape(-1)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        scan.append(bytes([f]) + (raw & 255).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data +
                struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(scan)))
            + chunk(b"IEND", b""))


def make_png_pixels(media_id: int):
    """Deterministic synthetic image (pure function of media_id):
    ``(pixels[h,w,c] uint8, per-row filter types)``.  Covers all four
    supported color types and all five scanline filters across ids."""
    rng = np.random.default_rng(media_id ^ 0x504E47)  # 'PNG'
    w, h = int(rng.integers(4, 32)), int(rng.integers(4, 32))
    ch = int(rng.choice([1, 2, 3, 4]))
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    filters = [int(f) for f in rng.integers(0, 5, size=h)]
    return px, filters


def make_png_blob(media_id: int) -> bytes:
    """Real PNG bytes for the deterministic synthetic image."""
    px, filters = make_png_pixels(media_id)
    return encode_png(px, filters=filters)


class DecodeMedia:
    """map_batches actor: payload → decoded metadata + feature vector +
    ``pixel_hash`` (64-bit hash of the decoded pixel bytes).

    PNG payloads decode for REAL in every mode (:func:`decode_png`,
    stdlib zlib).  The synthetic ``PTMM`` container decodes only with
    ``fake=True`` (the clearly-marked deterministic fake codec); any
    other container returns a typed error row naming the missing codec —
    the libraries (Pillow/ffmpeg) are not in this environment.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        self.feature_dim = feature_dim
        self.fake = fake

    def _features(self, pixel_bytes: np.ndarray):
        # bucketed byte histogram, L1-normalized (stands in for a model
        # embedding; deterministic for the oracle)
        hist = np.bincount(pixel_bytes // (256 // self.feature_dim),
                           minlength=self.feature_dim)[: self.feature_dim]
        return hist / max(1, hist.sum())

    def _decode_one(self, blob: bytes):
        """(kind, w, h, c, feature, pixel_hash) or an error string."""
        if blob[:8] == _PNG_SIG:
            try:
                w, h, c, px = decode_png(blob)
            except ValueError as e:
                return f"png decode failed: {e}"
            flat = px.reshape(-1)
            return ("image", w, h, c, self._features(flat),
                    hash_u64(flat.tobytes()))
        if blob[:4] == _MAGIC:
            if not self.fake:
                return ("codec unavailable for synthetic PTMM container "
                        "(use fake=True)")
            kind_i, w, h, c = struct.unpack("<BHHB", blob[4:10])
            payload = np.frombuffer(blob[10:], dtype=np.uint8)
            return (_KINDS[kind_i], w, h, c, self._features(payload),
                    hash_u64(payload.tobytes()))
        return "decode failed"

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "kind": [], "width": [], "height": [],
               "channels": [], "feature": [], "pixel_hash": [], "error": []}
        for mid, blob in zip(batch["media_id"].to_pylist(),
                             batch["payload"].to_pylist()):
            dec = self._decode_one(blob) if blob else "decode failed"
            out["media_id"].append(mid)
            if isinstance(dec, str):
                out["kind"].append(None); out["width"].append(None)
                out["height"].append(None); out["channels"].append(None)
                out["feature"].append(None); out["pixel_hash"].append(None)
                out["error"].append(dec)
            else:
                kind, w, h, c, feat, ph = dec
                out["kind"].append(kind); out["width"].append(w)
                out["height"].append(h); out["channels"].append(c)
                out["feature"].append([float(x) for x in feat])
                out["pixel_hash"].append(ph)
                out["error"].append(None)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "kind": pa.array(out["kind"], pa.string()),
            "width": pa.array(out["width"], pa.int32()),
            "height": pa.array(out["height"], pa.int32()),
            "channels": pa.array(out["channels"], pa.int32()),
            "feature": pa.array(out["feature"], pa.list_(pa.float64())),
            "pixel_hash": pa.array(out["pixel_hash"], pa.uint64()),
            "error": pa.array(out["error"], pa.string()),
        })


def decode_media(ds, fake: bool = True, concurrency: int = 2, batch_size: int = 64):
    """Actor-pool decode stage; small batch size — binary rows are wide."""
    return ds.map_batches(
        DecodeMedia, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


class ResizeMedia:
    """map_batches actor: payload → payload resized to (w, h).

    Real path = codec resample (unavailable here → stub); fake path
    deterministically rewrites the header and nearest-neighbor-samples the
    byte grid, so output blobs are themselves decodable."""

    def __init__(self, width: int, height: int, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "media codecs are not available; use ResizeMedia(..., fake=True)")
        self.w = width
        self.h = height

    def _resize_one(self, blob: bytes):
        if blob[:4] != _MAGIC:
            return None
        kind_i, w, h, c = struct.unpack("<BHHB", blob[4:10])
        grid = np.frombuffer(blob[10:10 + w * h * c], dtype=np.uint8)
        if len(grid) < w * h * c:
            return None
        grid = grid.reshape(h, w, c)
        ys = (np.arange(self.h) * h // self.h)
        xs = (np.arange(self.w) * w // self.w)
        out = grid[ys][:, xs].tobytes()
        return _MAGIC + struct.pack("<BHHB", kind_i, self.w, self.h, c) + out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, errors = [], []
        for blob in batch["payload"].to_pylist():
            res = self._resize_one(blob) if blob else None
            payloads.append(res)
            errors.append(None if res is not None else "resize failed")
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload", pa.array(payloads, pa.binary()))
        return out.append_column("error", pa.array(errors, pa.string()))


class FrameSample:
    """map_batches fn-object: video payload → n frame rows (flat_map shape).

    Fake frame extraction slices the byte grid into ``n_frames`` horizontal
    bands, each emitted as its own image blob row (media_id, frame_no,
    payload) — the plumbing a real ffmpeg-based sampler would use."""

    def __init__(self, n_frames: int, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "video codecs are not available; use FrameSample(..., fake=True)")
        self.n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for mid, blob in zip(batch["media_id"].to_pylist(),
                             batch["payload"].to_pylist()):
            if not blob or blob[:4] != _MAGIC:
                continue
            kind_i, w, h, c = struct.unpack("<BHHB", blob[4:10])
            if _KINDS[kind_i] != "video":
                continue
            grid = np.frombuffer(blob[10:10 + w * h * c], dtype=np.uint8)
            if len(grid) < w * h * c:
                continue
            grid = grid.reshape(h, w, c)
            band = max(1, h // self.n)
            for f in range(min(self.n, h)):
                sub = grid[f * band:(f + 1) * band]
                if sub.size == 0:
                    break
                ids.append(mid)
                frames.append(f)
                payloads.append(_MAGIC + struct.pack("<BHHB", _KINDS.index("image"),
                                                     w, sub.shape[0], c) + sub.tobytes())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_no": pa.array(frames, pa.int32()),
            "payload": pa.array(payloads, pa.binary()),
        })


def resize_media(ds, width: int, height: int, fake: bool = True,
                 concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        ResizeMedia, fn_constructor_kwargs={"width": width, "height": height, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def frame_sample(ds, n_frames: int, fake: bool = True,
                 concurrency: int = 2, batch_size: int = 32):
    """Small batches: video rows are the widest payloads in the pipeline."""
    return ds.map_batches(
        FrameSample, fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
