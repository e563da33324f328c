"""Multimodal column plumbing (training-data ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages with small batch sizes (large binary
rows).  The actual codec libraries (Pillow/ffmpeg/torchaudio) are NOT in
this container, so the codec call is STUBBED: ``DecodeMedia`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
clearly-marked deterministic fake decoder (header-parse of the synthetic
``PTMM`` blob format) stands in.  Everything around the stub — schema,
actor signature, batch sizing, output layout — is real and tested.

Synthetic blob format (``make_fake_blob``):
``b"PTMM" | u8 kind | u16 width | u16 height | u8 channels | payload``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

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


class DecodeMedia:
    """map_batches actor: payload → decoded metadata + feature vector.

    Real path: would hold the codec handle loaded once per actor.  In this
    container that import is unavailable → NotImplementedError (stub),
    unless constructed with fake=True (deterministic fake decoder).
    """

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "media codecs (Pillow/ffmpeg) are not available in this "
                "environment; construct DecodeMedia(fake=True) for the "
                "deterministic fake decode path")

    def _decode_one(self, blob: bytes):
        if blob[:4] != _MAGIC:
            return None
        kind_i, w, h, c = struct.unpack("<BHHB", blob[4:10])
        payload = np.frombuffer(blob[10:], dtype=np.uint8)
        # fake 'feature extraction': bucketed byte histogram, L1-normalized
        hist = np.bincount(payload // (256 // self.feature_dim),
                           minlength=self.feature_dim)[: self.feature_dim]
        feat = hist / max(1, hist.sum())
        return _KINDS[kind_i], w, h, c, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "kind": [], "width": [], "height": [],
               "channels": [], "feature": [], "error": []}
        for mid, blob in zip(batch["media_id"].to_pylist(),
                             batch["payload"].to_pylist()):
            dec = self._decode_one(blob) if blob else None
            out["media_id"].append(mid)
            if dec is None:
                out["kind"].append(None); out["width"].append(None)
                out["height"].append(None); out["channels"].append(None)
                out["feature"].append(None); out["error"].append("decode failed")
            else:
                kind, w, h, c, feat = dec
                out["kind"].append(kind); out["width"].append(w)
                out["height"].append(h); out["channels"].append(c)
                out["feature"].append([float(x) for x in feat])
                out["error"].append(None)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "kind": pa.array(out["kind"], pa.string()),
            "width": pa.array(out["width"], pa.int32()),
            "height": pa.array(out["height"], pa.int32()),
            "channels": pa.array(out["channels"], pa.int32()),
            "feature": pa.array(out["feature"], pa.list_(pa.float64())),
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
