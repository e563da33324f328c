"""Multimodal column plumbing (training-data ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages with small batch sizes (large binary
rows).

Codec coverage in this container:

- **PNG, GIF, BMP, WAV and JPEG are decoded for real**, pure
  stdlib/numpy: :func:`decode_png` (zlib inflate + the five scanline
  unfilters, 8-bit non-interlaced gray / gray+alpha / RGB / RGBA),
  :func:`decode_gif` (full GIF-variant LZW with growing code widths and
  table resets, global/local color tables), :func:`decode_bmp` (24-bit
  uncompressed, top-down and bottom-up), :func:`decode_wav` (stdlib
  ``wave``, 8/16-bit PCM), and :func:`decode_jpeg` (baseline SOF0:
  marker parse, canonical Huffman entropy decode with byte-unstuffing
  and RSTn restarts, dequantize + vectorized IDCT, JFIF YCbCr→RGB;
  grayscale or 4:4:4 — progressive/subsampled/12-bit raise).  Each has
  a fixture-side encoder twin (:func:`encode_png` / :func:`encode_gif`
  / :func:`encode_bmp` / :func:`encode_wav` / :func:`encode_jpeg`) so
  tests pin decode(encode(x)) == x (JPEG: bit-exact on 8x8
  block-constant sources under quantizer-of-ones, bounded-error on
  arbitrary images — it is a lossy codec) and the driver oracle hashes
  real pixels.  ``DecodeMedia`` (any mode) recognises all five
  signatures.
- Everything else (ffmpeg/torchaudio-class video+audio codecs) is
  STUBBED: those libraries are not in this environment, so such
  payloads decode only via the clearly-marked deterministic fake codec
  (``fake=True``, header-parse of the synthetic ``PTMM`` blob format)
  and otherwise come back as typed error rows.  Everything around the
  stub — schema, actor signature, batch sizing, output layout — is
  real and tested.

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


# ------------------------------------------------------------ real WAV codec

def decode_wav(blob: bytes):
    """Real WAV PCM decode (stdlib ``wave``): returns ``(n_frames,
    sample_rate, channels, samples)`` with ``samples`` an ``(n_frames,
    channels)`` array — uint8 for 8-bit PCM, int16 for 16-bit.
    Compressed / float WAV raises ``ValueError``."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(blob)) as w:
            ch, sw, sr = w.getnchannels(), w.getsampwidth(), w.getframerate()
            n = w.getnframes()
            data = w.readframes(n)
    except wave.Error as e:
        raise ValueError(f"bad WAV: {e}") from None
    if sw == 1:
        samples = np.frombuffer(data, np.uint8)
    elif sw == 2:
        samples = np.frombuffer(data, "<i2")
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if len(samples) != n * ch:
        raise ValueError("WAV frame count mismatch")
    return n, sr, ch, samples.reshape(n, ch)


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """Fixture-side WAV encoder: ``(n_frames, channels)`` uint8 or int16
    PCM → RIFF/WAVE bytes (stdlib ``wave``)."""
    import io
    import wave

    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    sw = 1 if samples.dtype == np.uint8 else 2
    if sw == 2:
        samples = samples.astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(sw)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def make_wav_source(media_id: int):
    """Deterministic synthetic 16-bit PCM clip (pure fn of media_id):
    ``(samples (n, ch) int16, sample_rate)`` — the oracle side hashes
    these directly, no round-trip."""
    rng = np.random.default_rng(media_id ^ 0x574156)  # 'WAV'
    n = int(rng.integers(64, 2048))
    ch = int(rng.choice([1, 2]))
    sr = int(rng.choice([8000, 16000, 44100]))
    return rng.integers(-32768, 32768, size=(n, ch)).astype("<i2"), sr


def make_wav_blob(media_id: int) -> bytes:
    samples, sr = make_wav_source(media_id)
    return encode_wav(samples, sr)


# ------------------------------------------------------------ real BMP codec

def decode_bmp(blob: bytes):
    """Real BMP decode (24-bit uncompressed BITMAPINFOHEADER, the
    overwhelmingly common on-disk form): returns ``(width, height, 3,
    pixels)`` with ``pixels`` ``(h, w, 3)`` uint8 RGB.  Top-down
    (negative height) and bottom-up rows both handled; other bit depths
    / compressions raise ``ValueError``."""
    if blob[:2] != b"BM" or len(blob) < 54:
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", blob[10:14])
    hdr_sz, w, h = struct.unpack("<Iii", blob[14:26])
    planes, bpp = struct.unpack("<HH", blob[26:30])
    (comp,) = struct.unpack("<I", blob[30:34])
    if hdr_sz < 40:
        raise ValueError(f"unsupported BMP header size {hdr_sz}")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    data = blob[off:off + stride * h]
    if len(data) != stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, np.uint8).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        px = px[::-1]
    return int(w), int(h), 3, np.ascontiguousarray(px)


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Fixture-side 24-bit BMP encoder: ``(h, w, 3)`` uint8 RGB →
    bottom-up BITMAPINFOHEADER bytes."""
    arr = np.asarray(arr, np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    return (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                          2835, 2835, 0, 0) + data)


def make_bmp_source(media_id: int):
    """Deterministic synthetic RGB image for the BMP path: (h, w, 3)."""
    rng = np.random.default_rng(media_id ^ 0x424D50)  # 'BMP'
    w, h = int(rng.integers(3, 40)), int(rng.integers(3, 40))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def make_bmp_blob(media_id: int) -> bytes:
    return encode_bmp(make_bmp_source(media_id))


# ------------------------------------------------------------ real GIF codec

def _lzw_decode(data: bytes, min_code: int) -> bytes:
    """GIF-variant LZW decode (LSB-first bit packing, CLEAR/END codes,
    code width grows to 12 bits, table reset on CLEAR)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code + 1
    out = bytearray()
    prev = None
    bitbuf = bits = pos = 0
    while True:
        while bits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream ended without END code")
            bitbuf |= data[pos] << bits
            bits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear streams stop growing
                table.append(prev + entry[:1])
        elif code == len(table) and code < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        if prev is not None and len(table) >= (1 << code_size) \
                and code_size < 12:
            code_size += 1
        out += entry
        prev = entry


def _lzw_encode(data: bytes, min_code: int) -> bytes:
    """GIF-variant LZW encode — the exact inverse convention of
    :func:`_lzw_decode` (emit-then-add, width grows when the NEXT code
    wouldn't fit, table reset at 4096 entries)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    bitbuf = bits = 0

    def emit(code, size):
        nonlocal bitbuf, bits
        bitbuf |= code << bits
        bits += size
        while bits >= 8:
            out.append(bitbuf & 255)
            bitbuf >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code + 1
    emit(clear, code_size)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        # decoder mirrors this entry; widen when the next emit could
        # reference it and it no longer fits
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code >= 4096:  # table full — 4096 won't fit in 12 bits
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code + 1
        w = wk[-1:]
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if bits:
        out.append(bitbuf & 255)
    return bytes(out)


def decode_gif(blob: bytes):
    """Real GIF decode (stdlib-only LZW): first image frame of a
    GIF87a/89a stream → ``(width, height, 3, pixels)`` uint8 RGB.
    Extensions are skipped; local color tables honored; interlaced
    frames raise ``ValueError``."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(blob[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        _l, _t, w, h, iflags = struct.unpack("<HHHHB", blob[pos:pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(blob[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if iflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = blob[pos]
        pos += 1
        chunks = []
        while blob[pos]:
            ln = blob[pos]
            chunks.append(blob[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_lzw_decode(b"".join(chunks), min_code),
                            np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data short")
        idx = idx[: w * h]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF index outside color table")
        return int(w), int(h), 3, pal[idx].reshape(h, w, 3)
    raise ValueError("GIF missing image descriptor")


def encode_gif(indices: "np.ndarray", palette: "np.ndarray") -> bytes:
    """Fixture-side GIF89a encoder: ``(h, w)`` uint8 palette indices +
    ``(n, 3)`` uint8 palette (n a power of two ≥ 2) → single-frame GIF
    with real LZW compression."""
    indices = np.asarray(indices, np.uint8)
    palette = np.asarray(palette, np.uint8)
    h, w = indices.shape
    n = len(palette)
    assert n >= 2 and (n & (n - 1)) == 0, "palette size must be a power of 2"
    depth = max(int(n).bit_length() - 1, 1)
    min_code = max(depth, 2)  # GIF LZW minimum code size floor
    lzw = _lzw_encode(indices.tobytes(), min_code)
    subs = b"".join(bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
                    for i in range(0, len(lzw), 255))
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
            + palette.tobytes()
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([min_code]) + subs + b"\x00" + b"\x3B")


def make_gif_source(media_id: int):
    """Deterministic synthetic paletted frame: (indices (h, w), palette)."""
    rng = np.random.default_rng(media_id ^ 0x474946)  # 'GIF'
    w, h = int(rng.integers(3, 48)), int(rng.integers(3, 48))
    n = int(rng.choice([2, 4, 16, 64, 256]))
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    return idx, pal


def make_gif_blob(media_id: int) -> bytes:
    idx, pal = make_gif_source(media_id)
    return encode_gif(idx, pal)


# ---------------------------------------------------------- real JPEG codec
# Baseline DCT JPEG (ITU T.81 SOF0), pure numpy/stdlib: generic marker
# parse (DQT / DHT / DRI / SOS, APPn/COM skipped), canonical Huffman
# entropy decode with byte-unstuffing and RSTn predictor resets,
# dequantize + inverse zigzag + vectorized 8x8 IDCT (one einsum over all
# blocks per component), JFIF YCbCr->RGB.  Scope: 8-bit baseline,
# grayscale or 3-component 4:4:4 (all sampling factors 1x1); progressive
# (SOF2), subsampled, arithmetic-coded or 12-bit streams raise
# ``ValueError`` and surface as typed error rows.  The fixture-side
# encoder twin emits quantizer-of-ones streams with fixed-length
# canonical Huffman tables (legal per Annex C, wasteful on purpose —
# the decoder must read real DHT segments either way), so 8x8
# block-constant sources round-trip BIT-EXACTLY: a constant block has
# only a DC coefficient 8*(c-128), an exact integer under quant 1.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)


def _dct_basis() -> "np.ndarray":
    k = np.arange(8, dtype=np.float64)
    c = 0.5 * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c  # F = C @ (block-128) @ C.T ; block = C.T @ F @ C + 128


_DCT_C = _dct_basis()


def ycbcr_to_rgb(ycc: "np.ndarray") -> "np.ndarray":
    """JFIF (BT.601 full-range) YCbCr → RGB, rounded and clipped — the
    SAME closed form the oracle uses to compute expected pixels."""
    f = ycc.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def rgb_to_ycbcr(rgb: "np.ndarray") -> "np.ndarray":
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    ycc = np.stack([0.299 * r + 0.587 * g + 0.114 * b,
                    128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                    128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b], axis=-1)
    return np.clip(np.round(ycc), 0, 255).astype(np.uint8)


class _BitReader:
    """MSB-first reader over UNSTUFFED scan bytes."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG scan data exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG scan data exhausted")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude code."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode_table(bits: "list[int]", vals: bytes) -> dict:
    """DHT (BITS, HUFFVAL) → {(length, code): symbol} canonical map."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _idct_blocks(coef: "np.ndarray") -> "np.ndarray":
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) uint8 samples."""
    spatial = np.einsum("ij,njk,kl->nil", _DCT_C.T, coef, _DCT_C)
    return np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)


def decode_jpeg(blob: bytes):
    """Real baseline JPEG decode → ``(width, height, channels, pixels)``
    (pixels ``(h, w)`` uint8 gray or ``(h, w, 3)`` uint8 RGB)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos, qt, ht = 2, {}, {}
    frame, restart = None, 0
    while pos < len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack(">H", blob[pos:pos + 2])[0]
        seg = blob[pos + 2:pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quantizers unsupported")
                qt[tq] = np.frombuffer(seg[i + 1:i + 65], np.uint8) \
                    .astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                ht[(tc, th)] = _huff_decode_table(
                    bits, seg[i + 17:i + 17 + n])
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled JPEG unsupported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
            frame = {"w": int(w), "h": int(h), "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG frame 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({"tq": comp["tq"],
                             "dc": (0, tda >> 4), "ac": (1, tda & 15)})
            return _decode_scan(blob, pos, frame, scan, qt, ht, restart)
    raise ValueError("JPEG has no scan")


def _decode_scan(blob: bytes, pos: int, frame, scan, qt, ht, restart: int):
    w, h = frame["w"], frame["h"]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    n_mcu = bw * bh
    # split the entropy stream at RSTn markers, unstuffing 0xFF00
    segments, cur = [], bytearray()
    i = pos
    while i < len(blob) - 1:
        if blob[i] == 0xFF:
            nxt = blob[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(blob[i])
        i += 1
    segments.append(bytes(cur))

    coefs = [np.zeros((n_mcu, 64), np.int32) for _ in scan]
    mcu = 0
    for seg_bytes in segments:
        br = _BitReader(seg_bytes)
        pred = [0] * len(scan)
        end = min(n_mcu, mcu + restart) if restart else n_mcu
        while mcu < end:
            for ci, comp in enumerate(scan):
                dc_tab, ac_tab = ht[comp["dc"]], ht[comp["ac"]]
                s = _huff_read(br, dc_tab)
                pred[ci] += _extend(br.receive(s), s)
                blk = coefs[ci][mcu]
                blk[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _huff_read(br, ac_tab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    blk[k] = _extend(br.receive(s), s)
                    k += 1
            mcu += 1
        if mcu >= n_mcu:
            break
    if mcu < n_mcu:
        raise ValueError("JPEG scan truncated")

    planes = []
    for ci, comp in enumerate(scan):
        dq = coefs[ci] * qt[comp["tq"]][None, :]
        blocks = np.zeros_like(dq)  # inverse zigzag via fancy index
        blocks[:, _ZIGZAG] = dq
        px = _idct_blocks(blocks.reshape(-1, 8, 8).astype(np.float64))
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
                  .reshape(bh * 8, bw * 8)[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return w, h, 1, planes[0]
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG unsupported")
    return w, h, 3, ycbcr_to_rgb(np.stack(planes, axis=-1))


# fixed-length canonical tables (see section comment): 12 DC symbols at
# 5 bits; the 162 AC symbols legal in 8-bit baseline (EOB, ZRL, and
# run 0-15 x size 1-10) at 8 bits — neither set reaches the all-ones
# code, and each per-length count fits the one-byte DHT Li field
_ENC_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = bytes(sorted({0x00, 0xF0} | {(r << 4) | s
                                            for r in range(16)
                                            for s in range(1, 11)}))


def _huff_encode_table(bits, vals) -> dict:
    enc, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        """Pad to a byte boundary with 1-bits (before RSTn / at scan end)."""
        if self.nbits:
            n = 8 - self.nbits
            self.write(n, (1 << n) - 1)

    def raw(self, data: bytes) -> None:
        """Emit marker bytes verbatim (caller must be byte-aligned)."""
        assert self.nbits == 0
        self.out += data

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """value → (SSSS category, SSSS-bit code) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(arr: "np.ndarray", source: str = "ycbcr",
                restart_interval: int = 0) -> bytes:
    """Fixture-side baseline JPEG encoder twin: ``(h, w)`` uint8 gray or
    ``(h, w, 3)`` uint8 planes → JFIF bytes with quantizer-of-ones
    tables.  ``source='ycbcr'`` treats 3-channel input as already-YCbCr
    planes (what block-exact fixtures want); ``source='rgb'`` converts
    first (a real-image path, lossy by rounding).  ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every that many MCUs (so
    the decoder's restart/predictor-reset path is pinned by test)."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 3 and source == "rgb":
        arr = rgb_to_ycbcr(arr)
    h, w = arr.shape[:2]
    ncomp = 1 if arr.ndim == 2 else arr.shape[2]
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    planes = [arr] if ncomp == 1 else [arr[..., c] for c in range(ncomp)]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    dc_enc = _huff_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _huff_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)

    bwr = _BitWriter()
    pred = [0] * ncomp
    mcu = rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwr.pad()
                bwr.raw(bytes([0xFF, 0xD0 + rst % 8]))
                rst += 1
                pred = [0] * ncomp
            mcu += 1
            for ci, plane in enumerate(planes):
                pad = np.empty((8, 8), np.float64)
                ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
                xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
                pad[:] = plane[np.ix_(ys, xs)].astype(np.float64) - 128.0
                coef = np.round(_DCT_C @ pad @ _DCT_C.T).astype(np.int64)
                zz = coef.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, code = _magnitude(diff)
                bwr.write(*dc_enc[s])
                if s:
                    bwr.write(s, code)
                nz = np.nonzero(zz[1:])[0]
                k = 0
                for idx in nz:
                    run = int(idx) - k
                    while run > 15:
                        bwr.write(*ac_enc[0xF0])  # ZRL
                        run -= 16
                    s, code = _magnitude(int(zz[1 + idx]))
                    bwr.write(*ac_enc[(run << 4) | s])
                    bwr.write(s, code)
                    k = int(idx) + 1
                if k < 63:
                    bwr.write(*ac_enc[0x00])  # EOB

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([c + 1, 0x11, 0]) for c in range(ncomp)))
    dht = seg(0xC4, b"\x00" + bytes(_ENC_DC_BITS) + _ENC_DC_VALS) + \
        seg(0xC4, b"\x10" + bytes(_ENC_AC_BITS) + _ENC_AC_VALS)
    dri = seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    sos = seg(0xDA, bytes([ncomp]) + b"".join(
        bytes([c + 1, 0x00]) for c in range(ncomp)) + b"\x00\x3f\x00")
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos + bwr.flush()
            + b"\xff\xd9")


def make_jpeg_source(media_id: int):
    """Deterministic 8x8-block-constant source: ``(planes,
    expected_pixels)``.  Gray ids return ``((h, w) gray, same array)``;
    color ids return ``((h, w, 3) YCbCr planes, closed-form RGB)`` —
    block-constant planes survive DCT+quant-1 bit-exactly, so the
    decoder must reproduce ``expected_pixels`` EXACTLY."""
    rng = np.random.default_rng(media_id ^ 0x4A504547)  # 'JPEG'
    hb, wb = int(rng.integers(1, 6)), int(rng.integers(1, 6))
    if rng.integers(0, 2) == 0:
        cells = rng.integers(0, 256, size=(hb, wb), dtype=np.uint8)
        img = np.repeat(np.repeat(cells, 8, 0), 8, 1)
        return img, img
    cells = rng.integers(0, 256, size=(hb, wb, 3), dtype=np.uint8)
    ycc = np.repeat(np.repeat(cells, 8, 0), 8, 1)
    return ycc, ycbcr_to_rgb(ycc)


def make_jpeg_blob(media_id: int) -> bytes:
    planes, _ = make_jpeg_source(media_id)
    return encode_jpeg(planes, source="ycbcr")


_CODEC_KINDS = ("gif", "bmp", "wav", "jpeg")


def make_codec_blob(media_id: int) -> bytes:
    """Round-robin real-codec blob for the driver query: media_id % 4
    picks GIF / BMP / WAV / JPEG."""
    k = _CODEC_KINDS[media_id % len(_CODEC_KINDS)]
    if k == "gif":
        return make_gif_blob(media_id)
    if k == "bmp":
        return make_bmp_blob(media_id)
    if k == "jpeg":
        return make_jpeg_blob(media_id)
    return make_wav_blob(media_id)


def codec_expected_row(media_id: int):
    """Oracle-side expected (kind, width, height, channels, pixel_hash)
    computed from the GENERATED source arrays — no encode/decode
    round-trip, so the engine must really inflate the container bytes
    to match (wav maps as width=n_frames, height=sample_rate; JPEG
    expected pixels are the closed-form color transform of the
    block-constant source planes, bit-exact under quant 1)."""
    k = _CODEC_KINDS[media_id % len(_CODEC_KINDS)]
    if k == "gif":
        idx, pal = make_gif_source(media_id)
        px = pal[idx]
        return ("image", px.shape[1], px.shape[0], 3,
                hash_u64(px.reshape(-1).tobytes()))
    if k == "bmp":
        px = make_bmp_source(media_id)
        return ("image", px.shape[1], px.shape[0], 3,
                hash_u64(px.reshape(-1).tobytes()))
    if k == "jpeg":
        _, px = make_jpeg_source(media_id)
        c = 1 if px.ndim == 2 else 3
        return ("image", px.shape[1], px.shape[0], c,
                hash_u64(px.reshape(-1).tobytes()))
    samples, sr = make_wav_source(media_id)
    return ("audio", samples.shape[0], sr, samples.shape[1],
            hash_u64(samples.tobytes()))


def resize_expected_row(media_id: int, width: int, height: int):
    """Oracle-side expected (width, height, channels, pixel_hash) of the
    REAL resize stage: :func:`resize_pixels` applied to the GENERATED
    source pixels — independent of the container decode/encode
    machinery.  Returns ``None`` for audio rotation slots (resize is
    undefined there)."""
    k = _CODEC_KINDS[media_id % len(_CODEC_KINDS)]
    if k == "wav":
        return None
    if k == "gif":
        idx, pal = make_gif_source(media_id)
        src = pal[idx]
    elif k == "bmp":
        src = make_bmp_source(media_id)
    else:
        _, src = make_jpeg_source(media_id)
    out = resize_pixels(src, width, height)
    return (width, height, out.shape[2],
            hash_u64(out.reshape(-1).tobytes()))


class DecodeMedia:
    """map_batches actor: payload → decoded metadata + feature vector +
    ``pixel_hash`` (64-bit hash of the decoded pixel bytes).

    PNG / GIF / BMP / WAV / JPEG payloads decode for REAL in every mode
    (pure stdlib/numpy codecs above).  The synthetic ``PTMM`` container
    decodes only with ``fake=True`` (the clearly-marked deterministic
    fake codec); any other container returns a typed error row naming
    the missing codec — the libraries (Pillow/ffmpeg) are not in this
    environment.
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
        """(kind, w, h, c, feature, pixel_hash) or an error string.

        Audio (WAV) maps onto the image-shaped schema as width=n_frames,
        height=sample_rate, channels=n_channels; pixel_hash hashes the
        raw PCM sample bytes."""
        if blob[:8] == _PNG_SIG:
            try:
                w, h, c, px = decode_png(blob)
            except ValueError as e:
                return f"png decode failed: {e}"
            flat = px.reshape(-1)
            return ("image", w, h, c, self._features(flat),
                    hash_u64(flat.tobytes()))
        if blob[:2] == b"BM":
            try:
                w, h, c, px = decode_bmp(blob)
            except ValueError as e:
                return f"bmp decode failed: {e}"
            flat = px.reshape(-1)
            return ("image", w, h, c, self._features(flat),
                    hash_u64(flat.tobytes()))
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            try:
                w, h, c, px = decode_gif(blob)
            except ValueError as e:
                return f"gif decode failed: {e}"
            flat = px.reshape(-1)
            return ("image", w, h, c, self._features(flat),
                    hash_u64(flat.tobytes()))
        if blob[:2] == b"\xff\xd8":
            try:
                w, h, c, px = decode_jpeg(blob)
            except ValueError as e:
                return f"jpeg decode failed: {e}"
            flat = px.reshape(-1)
            return ("image", w, h, c, self._features(flat),
                    hash_u64(flat.tobytes()))
        if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            try:
                n, sr, c, samples = decode_wav(blob)
            except ValueError as e:
                return f"wav decode failed: {e}"
            raw = samples.tobytes()
            return ("audio", n, sr, c,
                    self._features(np.frombuffer(raw, np.uint8)),
                    hash_u64(raw))
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


def decode_media(ds, fake: bool = True, concurrency=(1, 2), batch_size: int = 64):
    """Actor-pool decode stage; small batch size — binary rows are wide.
    Autoscaling ``(1, n)`` pool so chained codec stages (resize → decode)
    can't starve each other on small CPU budgets."""
    return ds.map_batches(
        DecodeMedia, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def decode_image(blob: bytes):
    """Container dispatch over the REAL image codecs: PNG / BMP / GIF /
    JPEG signature → ``(w, h, c, pixels)``; other bytes raise
    ``ValueError``."""
    if blob[:8] == _PNG_SIG:
        return decode_png(blob)
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(blob)
    if blob[:2] == b"\xff\xd8":
        return decode_jpeg(blob)
    raise ValueError("not a supported image container")


def resize_pixels(px: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resample with the fixed index map
    ``src = arange(dst) * src_dim // dst_dim`` — closed-form, so the
    oracle can compute expected output pixels without the codecs."""
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w = px.shape[:2]
    ys = np.arange(height) * h // height
    xs = np.arange(width) * w // width
    return px[ys][:, xs]


class ResizeMedia:
    """map_batches actor: payload → payload resized to (w, h).

    REAL image containers (PNG/BMP/GIF/JPEG) decode through the stdlib
    codecs, nearest-neighbor resample (:func:`resize_pixels`), and
    re-encode LOSSLESSLY as PNG — output blobs are themselves decodable
    by the decode stage.  The synthetic ``PTMM`` container resizes only
    with ``fake=True`` (header rewrite + byte-grid sampling); audio and
    unknown containers come back as typed error rows."""

    def __init__(self, width: int, height: int, fake: bool = False):
        self.w = width
        self.h = height
        self.fake = fake

    def _resize_one(self, blob: bytes):
        """Resized payload bytes, or an error string."""
        if blob[:4] == _MAGIC:
            if not self.fake:
                return ("codec unavailable for synthetic PTMM container "
                        "(use fake=True)")
            kind_i, w, h, c = struct.unpack("<BHHB", blob[4:10])
            grid = np.frombuffer(blob[10:10 + w * h * c], dtype=np.uint8)
            if len(grid) < w * h * c:
                return "resize failed: PTMM payload short"
            out = resize_pixels(grid.reshape(h, w, c), self.w, self.h)
            return _MAGIC + struct.pack("<BHHB", kind_i, self.w, self.h,
                                        c) + out.tobytes()
        if blob[:4] == b"RIFF":
            return "resize undefined for audio container"
        try:
            _w, _h, c, px = decode_image(blob)
        except ValueError as e:
            return f"resize failed: {e}"
        out = resize_pixels(px, self.w, self.h)
        return encode_png(out if c > 1 else out[:, :, 0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, errors = [], []
        for blob in batch["payload"].to_pylist():
            res = (self._resize_one(blob) if blob
                   else "resize failed: empty payload")
            if isinstance(res, str):
                payloads.append(None)
                errors.append(res)
            else:
                payloads.append(res)
                errors.append(None)
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
                 concurrency=(1, 2), batch_size: int = 64):
    return ds.map_batches(
        ResizeMedia, fn_constructor_kwargs={"width": width, "height": height, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def frame_sample(ds, n_frames: int, fake: bool = True,
                 concurrency: int = 2, batch_size: int = 32):
    """Small batches: video rows are the widest payloads in the pipeline."""
    return ds.map_batches(
        FrameSample, fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


# ---------------------------------------------------- perceptual image dedup
def dhash_pixels(px: "np.ndarray") -> int:
    """Integer dHash (difference hash) of a decoded image — the standard
    perceptual fingerprint for re-encoded-duplicate detection, made
    fully deterministic: grayscale by integer luma
    ``(299 R + 587 G + 114 B) // 1000`` (channel 0 for gray/gray+alpha),
    9x8 downscale by pure-integer grid sampling
    ``g[(y*h)//8, (x*w)//9]``, bit ``y*8+x`` set iff the left cell is
    brighter than its right neighbor."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch >= 3:
        g = (299 * px[:, :, 0].astype(np.int64)
             + 587 * px[:, :, 1].astype(np.int64)
             + 114 * px[:, :, 2].astype(np.int64)) // 1000
    else:
        g = px[:, :, 0].astype(np.int64)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    grid = g[np.ix_(ys, xs)]
    bits = grid[:, :-1] > grid[:, 1:]
    k = np.arange(64, dtype=np.uint64)
    return int((bits.reshape(-1).astype(np.uint64) << k).sum(
        dtype=np.uint64))


def phash_batch(batch: "pa.Table") -> "pa.Table":
    """(media_id, dhash) for a batch of PNG payloads — REAL decode per
    blob, then the integer dHash."""
    ids = batch["media_id"].to_pylist()
    out = []
    for blob in batch["payload"].to_pylist():
        _w, _h, _ch, px = decode_png(blob)
        out.append(dhash_pixels(px))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "dhash": pa.array(np.array(out, np.uint64).view(np.int64),
                          pa.int64()),
    })


def phash_dedup(blobs, n_parts: int | None = None):
    """Perceptual dedup over a ``(media_id, payload)`` PNG Dataset:
    decode → dHash → keep the smallest media_id per hash (re-encoded
    copies collapse; the file BYTES differ, the pixels agree).  Returns
    ``(media_id, dhash, kept)`` for every input row.  One narrow
    (media_id, dhash) explode, ONE coarse hash-partition run scan —
    payload bytes never shuffle."""
    from .util.rayops import partitioned_map_groups

    hashed = blobs.map_batches(phash_batch, batch_format="pyarrow")

    def first_of_run(g: "pa.Table") -> "pa.Table":
        hh = g["dhash"].to_numpy(zero_copy_only=False)
        ids = g["media_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hh))
        hs, is_ = hh[order], ids[order]
        kept = np.r_[True, hs[1:] != hs[:-1]]
        return pa.table({"media_id": pa.array(is_, pa.int64()),
                         "dhash": pa.array(hs, pa.int64()),
                         "kept": pa.array(kept.astype(np.int32),
                                          pa.int32())})

    return partitioned_map_groups(hashed, "dhash", first_of_run,
                                  n_parts=n_parts)
