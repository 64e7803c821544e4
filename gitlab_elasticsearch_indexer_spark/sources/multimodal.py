"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched kernels over ``mapInPandas``.

Decode status: binary PPM (P6) images, PCM16 mono WAV audio, AND
zlib-compressed PNG (8-bit gray/RGB/RGBA, every scanline filter) decode
for real in pure numpy/stdlib (:func:`decode_media`, with
:func:`synth_real_media` / :func:`synth_png_media` generating genuine
payloads).  Codec-library formats (JPEG/MP4/…) remain an honest stub:
``decode_features`` raises ``NotImplementedError`` unless
``deterministic_fake=True`` (no codec libraries in this container); the
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
    (``id % 3 == 0``), PCM16 WAV audio (``id % 3 == 1``), and an opaque
    synthetic container for video (``id % 3 == 2``, kept stub-decoded —
    real containers need ffmpeg).  Pixels/samples follow closed-form
    generators, so an oracle can compute the expected decode output
    analytically while the engine path parses the actual bytes."""

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
                    payload = (b"VID0"
                               + hashlib.md5(str(i).encode()).digest() * 64)
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
    """REAL decode via mapInPandas: P6 PPM and PNG (zlib-compressed,
    all five scanline filters) → (width, height, pixel mean/rms), PCM16
    WAV → (rate, n_samples, sample mean/rms).  Rows whose magic matches
    none of these (video containers, JPEG/MP4) are passed over — route
    those through :func:`decode_features`'s stub boundary instead."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "kind", "width", "height", "rate",
                                   "n_samples", "mean", "rms")}
            for rid, kind, payload in zip(pdf["id"], pdf["kind"],
                                          pdf["payload"]):
                raw = bytes(payload)
                if raw[:2] == b"P6" or raw[:8] == PNG_MAGIC:
                    if raw[:2] == b"P6":
                        w, h, px = _decode_ppm(raw)
                    else:
                        w, h, _ch, px = _decode_png(raw)
                    v = px.astype(np.float64)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["rate"].append(None)
                    out["n_samples"].append(None)
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
    """Frame sampling for video payloads: every ``stride``-th chunk.

    Chunking is the real plumbing; with actual video the kernel would
    seek keyframes instead of fixed offsets.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for fno in range(0, n_frames, stride):
                    ids.append(rid)
                    nos.append(fno)
                    frames.append(raw[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({"id": ids, "frame_no": nos, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(kernel, schema=FRAMES_SCHEMA)
