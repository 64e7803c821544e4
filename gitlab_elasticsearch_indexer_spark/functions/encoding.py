"""A8: charset detection → UTF-8 transcoding (indexer/encoding.go:12-76).

The reference uses ICU charset detection and converts the first
successful guess to UTF-8, passing raw bytes through when detection
fails (tryEncodeBytes semantics — never errors).  The canonical input
table here already stores UTF-8 strings, so this operator applies when
ingesting raw ``binary`` content: an Arrow-batched kernel that tries
UTF-8 → (optional charset detector) → latin-1 passthrough, mirroring
the never-fail contract.  The detector library is gated behind an
import-try (not baked into this container).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional detector — same role as the reference's ICU GuessCharset
    import charset_normalizer as _detector  # type: ignore
except ImportError:  # pragma: no cover
    _detector = None

CODECS_TRIED = ["utf-8", "utf-16", "gb18030", "shift_jis", "latin-1"]


def decode_bytes(raw: bytes) -> str:
    """tryEncodeBytes analog: best-effort decode, never raises.

    Order: strict UTF-8, then detector (if present), then the fixed
    codec list (latin-1 last — total, so decoding always succeeds,
    matching the reference's raw passthrough on failure).
    """
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if _detector is not None:
        best = _detector.from_bytes(raw).best()
        if best is not None:
            return str(best)
    for codec in CODECS_TRIED[1:]:
        try:
            return raw.decode(codec)
        except (UnicodeDecodeError, LookupError):
            continue
    return raw.decode("latin-1", errors="replace")  # unreachable; latin-1 is total


def transcode_to_utf8(df: DataFrame, bin_col: str = "raw", out_col: str = "content") -> DataFrame:
    """binary column → UTF-8 string column via mapInPandas batches."""
    cols = df.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [decode_bytes(bytes(b)) for b in pdf[bin_col]]
            yield out.drop(columns=[bin_col])

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != bin_col]
        + [f"{out_col} string"]
    )
    return df.mapInPandas(kernel, schema=schema)
