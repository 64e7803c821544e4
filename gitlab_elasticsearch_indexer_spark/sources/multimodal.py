"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched kernels over ``mapInPandas``.

Decode status: binary PPM (P6) images, PCM16 mono WAV audio,
zlib-compressed PNG (8-bit gray/RGB/RGBA, every scanline filter),
baseline-sequential JPEG (grayscale JFIF: Huffman entropy decode,
DPCM, dequant, IDCT), AND AVI/MJPEG video (RIFF container walk +
per-frame JPEG decode) decode for real in pure numpy/stdlib
(:func:`decode_media`, with :func:`synth_real_media` /
:func:`synth_png_media` / :func:`synth_jpeg_media` generating genuine
payloads).  The one remaining honest boundary is compressed
inter-frame video codecs (H.264/VP9/… inside MP4 etc.), which need a
codec library, not a container walk: ``decode_features`` raises
``NotImplementedError`` unless ``deterministic_fake=True``; the
Spark-side plumbing (schema, batching, partition flow) is identical
either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

FEATURE_DIM = 8
FEATURES_SCHEMA = "id long, kind string, n_bytes long, features array<float>"
FRAMES_SCHEMA = "id long, frame_no int, frame binary"
DECODE_SCHEMA = (
    "id long, kind string, width int, height int, rate int, "
    "n_samples int, mean double, rms double"
)


def synth_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from a text table: (id, kind, payload, meta)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lower(F.hex(F.substring(payload, 1, 4))).alias("magic"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata projection (fully native, SQL-expressible)."""
    return media.select(
        "id", "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.magic").alias("magic"),
    )


# --------------------------------------------------------------------------
# real decoders (pure numpy/stdlib)


def _wav_container(pcm16: bytes, rate: int) -> bytes:
    """Minimal RIFF/WAVE container around PCM16 mono data."""
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)  # PCM, mono
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm16))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm16)) + pcm16
    )


def _decode_ppm(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6): header = magic, width, height, maxval tokens,
    one whitespace byte, then 3·w·h raw pixel bytes."""
    pos = 0
    fields: list[bytes] = []
    while len(fields) < 4:
        while raw[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(raw[start:pos])
    pos += 1  # the single whitespace terminating the maxval token
    if fields[0] != b"P6" or int(fields[3]) != 255:
        raise ValueError("not an 8-bit binary PPM")
    w, h = int(fields[1]), int(fields[2])
    px = np.frombuffer(raw, dtype=np.uint8, count=3 * w * h, offset=pos)
    return w, h, px


def _decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE, PCM16 mono: walk the chunk list, return (rate, samples)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_format != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 mono decodes without codec libraries"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    p = a.astype(np.int64) + b.astype(np.int64) - c.astype(np.int64)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.int64)


def _decode_png(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real PNG decode in stdlib zlib + numpy: chunk walk → IDAT inflate
    → per-scanline unfilter (all five filter types).  Supports 8-bit
    depth, non-interlaced, gray/gray+alpha/RGB/RGBA — the PNG subset
    that needs no codec library.  Returns (width, height, channels,
    flat uint8 pixels)."""
    import struct
    import zlib

    if raw[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(raw):
        (size,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError("PNG subset: 8-bit, non-interlaced")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    data = zlib.decompress(b"".join(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    at = 0
    for y in range(h):
        ft = data[at]
        row = np.frombuffer(data, np.uint8, stride, at + 1).astype(np.int64)
        at += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-ch] → per-
            # channel cumulative sum (mod 256 commutes with the sum)
            cur = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride)
        elif ft == 2:  # Up
            cur = row + prev
        elif ft in (3, 4):  # Average / Paeth: left-dependent → pixel loop
            r2 = row.reshape(w, ch)
            p2 = (prev % 256).reshape(w, ch)
            cur2 = np.empty((w, ch), dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            upleft = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                if ft == 3:
                    cur2[x] = (r2[x] + (left + p2[x]) // 2) % 256
                else:
                    cur2[x] = (r2[x] + _paeth_vec(left, p2[x], upleft)) % 256
                upleft = p2[x]
                left = cur2[x]
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        cur = cur % 256
        out[y] = cur.astype(np.uint8)
        prev = cur
    return w, h, ch, out.reshape(-1)


def _encode_png(px: np.ndarray, w: int, h: int, channels: int,
                filter_of_row=None) -> bytes:
    """Minimal PNG writer (the synthesis side of the decode gate):
    forward-filters each scanline with ``filter_of_row(y)`` (default 0)
    — emitting all five filter types exercises every unfilter branch."""
    import struct
    import zlib

    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    img = px.reshape(h, stride).astype(np.int64)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    lines = []
    zero = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = img[y]
        prev = img[y - 1] if y else zero
        left = np.concatenate([np.zeros(channels, dtype=np.int64),
                               cur[:-channels]])
        upleft = np.concatenate([np.zeros(channels, dtype=np.int64),
                                 prev[:-channels]])
        ft = int(filter_of_row(y)) if filter_of_row else 0
        if ft == 0:
            raw = cur
        elif ft == 1:
            raw = cur - left
        elif ft == 2:
            raw = cur - prev
        elif ft == 3:
            raw = cur - (left + prev) // 2
        else:
            raw = cur - _paeth_vec(left, prev, upleft)
        lines.append(bytes([ft]) + (raw % 256).astype(np.uint8).tobytes())
    return (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# baseline JPEG (grayscale) — pure numpy/stdlib codec
#
# Standard baseline sequential DCT JPEG, single (luminance) component:
# SOI / APP0-JFIF / DQT / SOF0 / DHT(DC+AC, the ITU T.81 Annex K typical
# tables) / SOS / entropy-coded MCUs / EOI, with 0xFF byte stuffing.
# Real JPEGs — any codec library opens them.  Only 8-bit grayscale and
# dimensions that are multiples of 8 are implemented; anything else
# raises (the honest boundary is now video containers only).

# ITU T.81 Table K.3/K.5 (typical luminance Huffman tables): public spec
# constants, not library code.
_JPEG_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# quant table: DC step 8 makes constant (DC-only) blocks reconstruct
# bit-exactly (DCT of a constant block c is 8c, and 8c/8 rounds to c);
# AC steps 16 are a plausible mid-quality choice for the lossy path.
_JPEG_QTABLE = np.full(64, 16, dtype=np.uint16)
_JPEG_QTABLE[0] = 8

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8, dtype=np.float64)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m  # S = M @ block @ M.T ; block = M.T @ S @ M


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) via T.81 canonical code generation."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    return {(l, c): v for v, (c, l) in _huff_encode_table(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits): JPEG's signed-magnitude coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_jpeg_gray(px: np.ndarray, w: int, h: int) -> bytes:
    """Baseline grayscale JPEG of row-major 8-bit pixels (w, h % 8 == 0)."""
    if w % 8 or h % 8:
        raise NotImplementedError("JPEG subset: dimensions multiple of 8")
    m = _dct_matrix()
    img = px.reshape(h, w).astype(np.float64) - 128.0
    blocks = img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("ij,abjk,lk->abil", m, blocks, m)
    q = np.round(coeff.reshape(-1, 64)[:, _ZIGZAG]
                 / _JPEG_QTABLE[None, :]).astype(np.int64)

    dc_tab = _huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in q:
        cat, bits = _jpeg_magnitude(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        code, length = dc_tab[cat]
        bw.put(code, length)
        if cat:
            bw.put(bits, cat)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tab[0xF0]  # ZRL
                bw.put(code, length)
                run -= 16
            cat, bits = _jpeg_magnitude(v)
            code, length = ac_tab[(run << 4) | cat]
            bw.put(code, length)
            bw.put(bits, cat)
            run = 0
        if last < 63:
            code, length = ac_tab[0x00]  # EOB
            bw.put(code, length)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt = bytes([0]) + bytes(int(_JPEG_QTABLE[i]) & 0xFF for i in range(64))
    dht = (bytes([0x00]) + bytes(_JPEG_DC_BITS[1:]) + bytes(_JPEG_DC_VALS)
           + bytes([0x10]) + bytes(_JPEG_AC_BITS[1:]) + bytes(_JPEG_AC_VALS))
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, qt)
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, dht)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, raw: bytes) -> None:
        self.raw = raw
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.raw[self.pos]
            self.pos += 1
            if b == 0xFF:  # skip the stuffed 0x00
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _decode_jpeg_gray(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline grayscale JPEG (the subset the encoder writes,
    but with the tables read from the stream, not assumed)."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comp_q = 0
    scan_dc = scan_ac = 0
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = raw[pos + 1]
        if marker == 0xD9:
            break
        (size,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        body = raw[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tq] = np.frombuffer(
                    body[o + 1 : o + 65], dtype=np.uint8
                ).astype(np.float64)
                o += 65
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = [0] + list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                htables[(tc, th)] = _huff_decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if nc != 1 or body[7] != 0x11:
                raise NotImplementedError("JPEG subset: single 8x8 component")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("baseline sequential only")
        elif marker == 0xDA:
            scan_dc, scan_ac = body[2] >> 4, body[2] & 0xF
            break
    if w is None or h is None:
        raise ValueError("missing SOF0")

    dc_tab = htables[(0, scan_dc)]
    ac_tab = htables[(1, scan_ac)]
    qt = qtables[comp_q]

    def read_code(tab) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            if (length, code) in tab:
                return tab[(length, code)]
        raise ValueError("invalid Huffman code")

    br = _BitReader(raw[pos:])
    n_blocks = (h // 8) * (w // 8)
    coeffs = np.zeros((n_blocks, 64), dtype=np.float64)
    prev_dc = 0
    for b in range(n_blocks):
        cat = read_code(dc_tab)
        prev_dc += _jpeg_extend(br.bits(cat), cat)
        zz = np.zeros(64, dtype=np.float64)
        zz[0] = prev_dc
        i = 1
        while i < 64:
            rs = read_code(ac_tab)
            run, cat = rs >> 4, rs & 0xF
            if rs == 0x00:
                break  # EOB
            if rs == 0xF0:
                i += 16
                continue
            i += run
            zz[i] = _jpeg_extend(br.bits(cat), cat)
            i += 1
        coeffs[b] = zz * qt

    m = _dct_matrix()
    spatial = np.zeros((n_blocks, 8, 8))
    s2 = np.zeros((n_blocks, 8, 8))
    s2.reshape(n_blocks, 64)[:, _ZIGZAG] = coeffs
    spatial = np.einsum("ji,ajk,kl->ail", m, s2, m)
    px = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
    img = (
        px.reshape(h // 8, w // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h, w)
    )
    return w, h, img.reshape(-1)


# --------------------------------------------------------------------------
# AVI / MJPEG — minimal RIFF container (public spec: Microsoft AVI RIFF
# form, msdn "AVI RIFF File Reference").  MJPEG stores each video frame
# as a standalone baseline JPEG in a '00dc' movi chunk, so the frame
# payload decoder is the JPEG codec above.  This closes the video-
# container boundary for real: the walker parses actual RIFF bytes
# (fourcc + LE32 size, word-aligned chunks); only compressed inter-
# frame codecs (H.264/VP9/…) stay out of scope — they need a codec
# library, not a container walk.


def _encode_avi_mjpeg(frames: list[bytes], w: int, h: int,
                      fps: int = 10) -> bytes:
    """Minimal AVI writer: RIFF('AVI ') → LIST hdrl(avih, LIST
    strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER)) → LIST movi with
    one word-aligned '00dc' chunk per JPEG frame."""
    n = len(frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0, 0x10,           # padding, AVIF_HASINDEX off: no idx1 written
        n, 0, 1,           # totalframes, initialframes, streams
        max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIIIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0,
        1, fps, 0, n,      # scale, rate, start, length
        max_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk_avi(raw: bytes) -> tuple[int, int, int, list[bytes]]:
    """RIFF walk of an AVI: (width, height, header frame count, movi
    video-frame payloads).  Accepts any stream layout — scans chunks by
    fourcc + size, honoring word alignment; video frames are the
    ``##dc``/``##db`` movi entries."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI container")
    w = h = n_frames = -1
    frames: list[bytes] = []

    def scan(lo: int, hi: int, in_movi: bool) -> None:
        nonlocal w, h, n_frames
        o = lo
        while o + 8 <= hi:
            fourcc = raw[o:o + 4]
            (size,) = struct.unpack("<I", raw[o + 4:o + 8])
            body_lo, body_hi = o + 8, min(o + 8 + size, hi)
            if fourcc == b"LIST":
                ltype = raw[body_lo:body_lo + 4]
                scan(body_lo + 4, body_hi, ltype == b"movi")
            elif fourcc == b"avih":
                if body_hi - body_lo < 56:
                    raise NotImplementedError("truncated avih header")
                hdr = struct.unpack("<14I", raw[body_lo:body_lo + 56])
                n_frames, w, h = hdr[4], hdr[8], hdr[9]
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                frames.append(raw[body_lo:body_hi])
            o = body_lo + size + (size & 1)

    scan(12, len(raw), False)
    if w < 0:
        raise NotImplementedError("AVI without avih header")
    return w, h, n_frames, frames


def _decode_avi_mjpeg(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, n_frames, concatenated frame pixels) of an
    AVI whose frames are baseline grayscale JPEGs."""
    w, h, _n, frames = _walk_avi(raw)
    px = [
        _decode_jpeg_gray(f)[2] for f in frames
    ]
    return w, h, len(frames), (
        np.concatenate(px) if px else np.zeros(0, dtype=np.uint8)
    )


def synth_jpeg_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL baseline JPEGs per id: each 8×8 tile is the
    constant ``(id·37 + t·11) mod 256`` (tile index t, row-major).
    Constant tiles are DC-only — the DCT of a constant block c is
    exactly 8c and the DC quant step is 8 — so the lossy codec is
    bit-exact on them and an oracle can replay width/height/mean/rms
    analytically while the engine Huffman-decodes the actual stream."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                i = int(i)
                bw, bh = 2 + i % 3, 1 + i % 2  # tiles per side
                w, h = 8 * bw, 8 * bh
                tiles = ((i * 37 + np.arange(bw * bh, dtype=np.int64) * 11)
                         % 256).astype(np.uint8)
                img = np.repeat(
                    np.repeat(tiles.reshape(bh, bw), 8, axis=0), 8, axis=1
                )
                payloads.append(_encode_jpeg_gray(img.reshape(-1), w, h))
            yield pd.DataFrame(
                {"id": ids, "kind": ["image"] * len(ids), "payload": payloads}
            )

    media = df.select(F.col(id_col).cast("long").alias("id")).mapInPandas(
        kernel, schema="id long, kind string, payload binary"
    )
    return media.select(
        "id", "kind", "payload",
        F.struct(
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lower(F.hex(F.substring("payload", 1, 4))).alias("magic"),
        ).alias("meta"),
    )


def synth_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL PNG payloads per id: closed-form pixels
    ``(id·31 + k·7) mod 256`` over gray/RGB/RGBA (``id % 3``), each
    scanline forward-filtered with type ``(id + y) % 5`` so the decode
    gate exercises every PNG filter.  An oracle replays the pixel
    formula analytically while the engine inflates and unfilters the
    actual bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 16 + i % 16, 8 + i % 8
                ch = (1, 3, 4)[i % 3]
                px = ((i * 31 + np.arange(ch * w * h, dtype=np.int64) * 7)
                      % 256).astype(np.uint8)
                payloads.append(
                    _encode_png(px, w, h, ch,
                                filter_of_row=lambda y, i=i: (i + y) % 5)
                )
            yield pd.DataFrame(
                {"id": ids, "kind": ["image"] * len(ids), "payload": payloads}
            )

    media = df.select(F.col(id_col).cast("long").alias("id")).mapInPandas(
        kernel, schema="id long, kind string, payload binary"
    )
    return media.select(
        "id", "kind", "payload",
        F.struct(
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lower(F.hex(F.substring("payload", 1, 4))).alias("magic"),
        ).alias("meta"),
    )


def synth_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL media payloads per id: binary-PPM images
    (``id % 3 == 0``), PCM16 WAV audio (``id % 3 == 1``), and AVI/MJPEG
    video (``id % 3 == 2``: a real RIFF container whose frames are real
    baseline JPEGs with constant — hence bit-exact DC-only — 8×8
    tiles).  Pixels/samples follow closed-form generators, so an oracle
    can compute the expected decode output analytically while the
    engine path parses the actual bytes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            kinds, payloads = [], []
            for i in ids:
                i = int(i)
                kind = KINDS[i % 3]
                if kind == "image":
                    w, h = 16 + i % 16, 8 + i % 8
                    px = ((i * 31 + np.arange(3 * w * h, dtype=np.int64) * 7)
                          % 256).astype(np.uint8)
                    payload = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
                elif kind == "audio":
                    n = 256 + i % 256
                    pcm = (((i * 13 + np.arange(n, dtype=np.int64) * 5)
                            % 65536) - 32768).astype("<i2")
                    payload = _wav_container(pcm.tobytes(), rate=8000)
                else:
                    # 1 + i%4 frames, each a constant-tile (DC-only,
                    # bit-exact) grayscale JPEG; tile value depends on
                    # (id, frame, tile) so every frame differs
                    bw, bh = 2 + i % 3, 1 + i % 2
                    w, h = 8 * bw, 8 * bh
                    jf = []
                    for f in range(1 + i % 4):
                        tiles = ((i * 37 + f * 53
                                  + np.arange(bw * bh, dtype=np.int64) * 11)
                                 % 256).astype(np.uint8)
                        img = np.repeat(
                            np.repeat(tiles.reshape(bh, bw), 8, axis=0),
                            8, axis=1,
                        )
                        jf.append(_encode_jpeg_gray(img.reshape(-1), w, h))
                    payload = _encode_avi_mjpeg(jf, w, h)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame({"id": ids, "kind": kinds, "payload": payloads})

    media = df.select(F.col(id_col).cast("long").alias("id")).mapInPandas(
        kernel, schema="id long, kind string, payload binary"
    )
    return media.select(
        "id", "kind", "payload",
        F.struct(
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.lower(F.hex(F.substring("payload", 1, 4))).alias("magic"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode via mapInPandas: P6 PPM, PNG (zlib-compressed, all
    five scanline filters) and baseline grayscale JPEG (Huffman +
    dequant + IDCT) → (width, height, pixel mean/rms), PCM16 WAV →
    (rate, n_samples, sample mean/rms), AVI/MJPEG video (RIFF walk +
    per-frame JPEG decode) → (width, height, n_samples = frame count,
    pixel mean/rms over all frames).  Rows whose magic matches none of
    these (compressed inter-frame codecs) are passed over — route those
    through :func:`decode_features`'s stub boundary instead."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "kind", "width", "height", "rate",
                                   "n_samples", "mean", "rms")}
            for rid, kind, payload in zip(pdf["id"], pdf["kind"],
                                          pdf["payload"]):
                raw = bytes(payload)
                if (raw[:2] == b"P6" or raw[:8] == PNG_MAGIC
                        or raw[:2] == b"\xff\xd8"):
                    if raw[:2] == b"P6":
                        w, h, px = _decode_ppm(raw)
                    elif raw[:2] == b"\xff\xd8":
                        w, h, px = _decode_jpeg_gray(raw)
                    else:
                        w, h, _ch, px = _decode_png(raw)
                    v = px.astype(np.float64)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["rate"].append(None)
                    out["n_samples"].append(None)
                elif raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    w, h, nf, px = _decode_avi_mjpeg(raw)
                    if nf == 0:  # frameless container: nothing to report
                        continue
                    v = px.astype(np.float64)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["rate"].append(None)
                    out["n_samples"].append(nf)
                elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    rate, samples = _decode_wav(raw)
                    v = samples.astype(np.float64)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["rate"].append(rate)
                    out["n_samples"].append(len(samples))
                else:
                    continue  # compressed/unknown: stub boundary
                out["id"].append(rid)
                out["kind"].append(kind)
                out["mean"].append(float(v.mean()))
                out["rms"].append(float(np.sqrt((v * v).mean())))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=DECODE_SCHEMA)


def decode_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode payload → feature vector via mapInPandas (Arrow batches).

    Real decoding requires codec libraries absent from this container;
    with ``deterministic_fake`` the features are md5-derived floats in
    [0,1] — stable across runs/partitionings, exercising the full
    distributed path (batch iteration, schema, downstream joins).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires codec libraries (PIL/ffmpeg); "
                    "run with deterministic_fake=True in this environment"
                )
            feats = []
            for payload in pdf["payload"]:
                dig = hashlib.md5(bytes(payload)).digest()
                feats.append(
                    (np.frombuffer(dig[:FEATURE_DIM], dtype=np.uint8) / 255.0)
                    .astype(np.float32)
                    .tolist()
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 1024, stride: int = 4) -> DataFrame:
    """Frame sampling for video payloads: every ``stride``-th frame.

    AVI containers walk REAL frame boundaries (the movi '##dc' chunks —
    the keyframe-seek analog; each emitted frame is a standalone JPEG);
    other payloads fall back to fixed ``frame_bytes`` chunking."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                raw = bytes(payload)
                if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    _w, _h, _n, fpayloads = _walk_avi(raw)
                    for fno in range(0, len(fpayloads), stride):
                        ids.append(rid)
                        nos.append(fno)
                        frames.append(fpayloads[fno])
                    continue
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for fno in range(0, n_frames, stride):
                    ids.append(rid)
                    nos.append(fno)
                    frames.append(raw[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({"id": ids, "frame_no": nos, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, schema=FRAMES_SCHEMA)


FRAME_DECODE_SCHEMA = (
    "id long, frame_no int, width int, height int, mean double, rms double"
)


def decode_frames(frames: DataFrame) -> DataFrame:
    """Per-frame decode of :func:`sample_frames` output whose frames are
    standalone JPEGs (the MJPEG case): (width, height, pixel mean/rms)
    per (id, frame_no).  Non-JPEG frames are passed over."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "frame_no", "width", "height",
                                   "mean", "rms")}
            for rid, fno, frame in zip(pdf["id"], pdf["frame_no"],
                                       pdf["frame"]):
                raw = bytes(frame)
                if raw[:2] != b"\xff\xd8":
                    continue
                w, h, px = _decode_jpeg_gray(raw)
                v = px.astype(np.float64)
                out["id"].append(rid)
                out["frame_no"].append(fno)
                out["width"].append(w)
                out["height"].append(h)
                out["mean"].append(float(v.mean()))
                out["rms"].append(float(np.sqrt((v * v).mean())))
            yield pd.DataFrame(out)

    return frames.mapInPandas(kernel, schema=FRAME_DECODE_SCHEMA)
