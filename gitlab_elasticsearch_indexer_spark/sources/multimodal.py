"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched kernels over ``mapInPandas``.

Decode status: UNCOMPRESSED formats decode for real, in pure
numpy/stdlib — binary PPM (P6) images and PCM16 mono WAV audio
(:func:`decode_media`, with :func:`synth_real_media` generating
genuine payloads of both).  COMPRESSED codecs (JPEG/PNG/MP4/…) remain
an honest stub: ``decode_features`` raises ``NotImplementedError``
unless ``deterministic_fake=True`` (no codec libraries in this
container); the Spark-side plumbing (schema, batching, partition flow)
is identical either way.
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
# real decoders (pure numpy/stdlib — uncompressed formats only)


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
    """REAL decode of uncompressed payloads via mapInPandas: P6 PPM →
    (width, height, pixel mean/rms), PCM16 WAV → (rate, n_samples,
    sample mean/rms).  Rows whose magic matches neither format (video
    containers, compressed codecs) are passed over — route those through
    :func:`decode_features`'s stub boundary instead."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "kind", "width", "height", "rate",
                                   "n_samples", "mean", "rms")}
            for rid, kind, payload in zip(pdf["id"], pdf["kind"],
                                          pdf["payload"]):
                raw = bytes(payload)
                if raw[:2] == b"P6":
                    w, h, px = _decode_ppm(raw)
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
