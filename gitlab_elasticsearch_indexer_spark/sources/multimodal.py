"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched kernels over ``mapInPandas``.  The
decode step itself is STUBBED (no codec libraries in this container):
``decode_features`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which derives a stable fake feature vector
from the payload bytes — the Spark-side plumbing (schema, batching,
partition flow) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

FEATURE_DIM = 8
FEATURES_SCHEMA = "id long, kind string, n_bytes long, features array<float>"
FRAMES_SCHEMA = "id long, frame_no int, frame binary"


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
