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


# -- reusable column-expression builders (shared by the per-signal APIs
#    below and by operators/training.py's single-scan composite pipeline)

def ws_tokens_expr(text_col: str = "text"):
    return F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""))


def bpe_tokens_expr(text_col: str = "text"):
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0))


def canon_md5_expr(text_col: str = "text"):
    """md5 of lowercased, whitespace-collapsed text (near-exact dedup key)."""
    return F.md5(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "))


def quality_score_expr(text_col: str = "text"):
    """The [0,1] composite quality score as one raw (unrounded) Column.

    Exact multiples of 0.25, so threshold filters are float-safe.
    """
    t = F.col(text_col)
    toks = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    mean_wlen = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1))
    return (
        F.when((n_chars >= 100) & (n_chars <= 20000), 0.25).otherwise(0.0)
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(distinct_ratio >= 0.3, 0.25).otherwise(0.0)
    )


def pred_lang_expr(text_col: str = "text"):
    """Stopword-argmax language ID as one Column (ties: lang code asc)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")
    langs = sorted(STOPWORDS)

    def _hits(lang):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))

    hits = {lang: _hits(lang) for lang in langs}
    best = F.greatest(*hits.values())
    pred = F.lit("unknown")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish segment counts per doc."""
    return df.select(
        F.col(id_col).alias("id"),
        ws_tokens_expr(text_col).cast("long").alias("ws_tokens"),
        bpe_tokens_expr(text_col).cast("long").alias("bpe_tokens"),
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
    return df.select(
        F.col(id_col).alias("id"), canon_md5_expr(text_col).alias("fingerprint")
    )


_RH_MOD = np.uint64((1 << 61) - 1)
_RH_BASE = 1000003
_RH_MASK29 = np.uint64((1 << 29) - 1)

# BASE^j mod M for j < 64Ki, extended on demand; split hi/lo for the
# overflow-free vectorized modmul below
_rh_pows: np.ndarray = np.empty(0, dtype=np.uint64)


def _rh_powers(n: int) -> np.ndarray:
    global _rh_pows
    if len(_rh_pows) < n:
        size = max(n, 1 << 16)
        m, b = int(_RH_MOD), _RH_BASE
        p = np.empty(size, dtype=np.uint64)
        acc = 1
        # driver/executor-local one-time table; Python loop runs once per
        # max-doc-length growth, not per row
        for j in range(size):
            p[j] = acc
            acc = (acc * b) % m
        _rh_pows = p
    return _rh_pows


def _fold61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values mod 2^61-1 (2^61 ≡ 1)."""
    x = (x & _RH_MOD) + (x >> np.uint64(61))
    x = (x & _RH_MOD) + (x >> np.uint64(61))
    return np.where(x >= _RH_MOD, x - _RH_MOD, x)


def _rolling_hash(texts: pd.Series) -> pd.Series:
    """Batch-vectorized polynomial rolling hash (base 1000003, mod 2^61-1).

    h = Σ byte_i · BASE^(n-1-i) mod (2^61-1).  The whole Arrow batch is
    processed as ONE byte stream: per-byte contributions are computed
    with a hi/lo-split modmul (every intermediate fits uint64: byte <
    2^8, power < 2^61, 2^61 ≡ 1 mod M), summed per document with two
    ``np.add.reduceat`` passes over the contribution's 32-bit halves
    (sums stay < 2^52 for docs ≤ 1 MiB), then recombined with one more
    fold.  No per-byte — and no per-doc — Python arithmetic.
    """
    encoded = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=len(encoded))
    out = np.zeros(len(encoded), dtype=np.int64)
    nonempty = np.flatnonzero(lens)
    if len(nonempty) == 0:
        return pd.Series(out)

    buf = np.frombuffer(b"".join(encoded), dtype=np.uint8).astype(np.uint64)
    ends = np.cumsum(lens)
    starts = ends - lens
    # per-doc descending powers: O(1) reversed views per doc, one
    # sequential copy in concatenate — cheaper than a random gather
    pw = _rh_powers(int(lens.max()))
    p = np.concatenate([pw[n - 1 :: -1][:n] for n in lens if n > 0])

    # byte·power = byte·p_hi·2^32 + byte·p_lo with p split at 32 bits;
    # with t = byte·p_hi < 2^37 and 2^61 ≡ 1:  t·2^32 ≡ (t>>29) + (t&m29)·2^32.
    # Every addend is ALSO split before its per-doc sum so no partial sum
    # can wrap uint64 for docs up to 2^32 bytes (the binding term is
    # Σ(q&m32) < n·2^32): Σ(t>>29) < n·2^8, Σ(t&m29) < n·2^29,
    # Σ(q>>32) < n·2^8.  This is a general text API — the 1 MiB blob cap
    # does not bound its inputs, so length-safety is the kernel's job.
    t = buf * (p >> np.uint64(32))
    q = buf * (p & np.uint64(0xFFFFFFFF))  # byte·p_lo < 2^40
    seg = starts[nonempty]
    s_a = np.add.reduceat(t >> np.uint64(29), seg)
    s_b = np.add.reduceat(t & _RH_MASK29, seg)
    s_ch = np.add.reduceat(q >> np.uint64(32), seg)
    s_cl = np.add.reduceat(q & np.uint64(0xFFFFFFFF), seg)
    # recombine: x·2^32 via the same 2^61-fold identity for both the
    # t-half (x = s_b) and the q-high-half (x = s_ch); each folded
    # addend is < 2^61 so the three-way sums stay inside uint64
    h = _fold61(
        s_a + (s_b >> np.uint64(29)) + ((s_b & _RH_MASK29) << np.uint64(32))
    )
    c = _fold61(
        _fold61(s_cl) + (s_ch >> np.uint64(29)) + ((s_ch & _RH_MASK29) << np.uint64(32))
    )
    h = _fold61(h + c)
    out[nonempty] = h.astype(np.int64)
    return pd.Series(out)


rolling_hash_udf = F.pandas_udf(_rolling_hash, LongType())


def fingerprint_rolling(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), rolling_hash_udf(F.col(text_col)).alias("rhash")
    )


# --------------------------------------------------------------------------
# PII / secret redaction (training-data cleaning)

# RE2- and Java-regex-compatible patterns (no lookbehind), so the exact
# same redaction is replayable in the DuckDB oracle
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_HEX_SECRET = r"\b[0-9a-fA-F]{32,}\b"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails / IPv4s / long hex secrets; emit per-doc counts.

    Whole-stage-codegen path: three chained ``regexp_replace`` plus
    ``regexp_count`` columns — no Python, scales as a pure map.  Order
    matters (emails first: an address would otherwise survive with its
    domain dots mistaken for an IP fragment).
    """
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_HEX_SECRET,
        "<HEX>",
    )
    return df.select(
        F.col(id_col).alias("id"),
        red.alias("redacted"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_HEX_SECRET)).cast("long").alias("n_secrets"),
    )
