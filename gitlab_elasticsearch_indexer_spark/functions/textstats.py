"""Text-analysis operators for training-data pipelines.

All JVM-native column expressions (no Python in the hot path):
language-ID by stopword-hit ratio, quality scoring (length / punctuation
/ stopword / repetition signals), token counting (whitespace and a
BPE-ish regex segmentation), and document fingerprints (md5 canonical +
a vectorized rolling polynomial hash).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# tiny per-language stopword dims (heuristic langid)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "como"],
}

BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish segment counts per doc."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH), 0))
    return df.select(
        F.col(id_col).alias("id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals + a [0,1] composite score.

    Signals: char length band, mean word length band, punctuation ratio,
    stopword ratio, distinct-token ratio (repetition detector).
    """
    t = F.col(text_col)
    toks = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    mean_wlen = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    sw_ratio = sw_hits / F.greatest(n_tok, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    score = (
        F.when((n_chars >= 100) & (n_chars <= 20000), 0.25).otherwise(0.0)
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(distinct_ratio >= 0.3, 0.25).otherwise(0.0)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: argmax hits, tie/zero → 'unknown'.

    Deterministic tie-break: higher hits, then language code asc.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")

    def _hits(lang):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).alias(f"h_{lang}")

    hit_cols = [_hits(lang) for lang in sorted(STOPWORDS)]
    hits = df.select(F.col(id_col).alias("id"), *hit_cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"h_{l}") for l in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when((F.col(f"h_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return hits.select("id", *[F.col(f"h_{l}").cast("long").alias(f"h_{l}") for l in langs],
                       pred.alias("pred_lang"))


def fingerprint_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical-form fingerprint: md5 of lowercased, ws-collapsed text."""
    canon = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col).alias("id"), F.md5(canon).alias("fingerprint"))


def _rolling_hash(texts: pd.Series) -> pd.Series:
    """Vectorized polynomial rolling hash (base 1000003, mod 2^61-1)."""
    MOD = (1 << 61) - 1
    BASE = 1000003
    out = np.zeros(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        b = (text or "").encode("utf-8")
        arr = np.frombuffer(b, dtype=np.uint8).astype(object)
        h = 0
        # chunked horner: fold 64-byte chunks to bound the python loop
        for chunk in np.array_split(arr, max(1, len(arr) // 64)) if len(arr) else []:
            for c in chunk.tolist():
                h = (h * BASE + int(c)) % MOD
        out[i] = h
    return pd.Series(out)


rolling_hash_udf = F.pandas_udf(_rolling_hash, LongType())


def fingerprint_rolling(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), rolling_hash_udf(F.col(text_col)).alias("rhash")
    )
