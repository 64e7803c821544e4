"""Composite training-data curation pipeline.

The single most common job a pretraining-data platform runs over a raw
document corpus, expressed as ONE Spark plan:

    quality gate  →  language gate  →  near-exact canonical dedup
                  →  per-language token budget

Built from the verified per-signal kernels in ``functions/textstats.py``
(each independently gated against a DuckDB oracle: t1 tokens, t2 quality,
t3 langid, t4 fingerprint) but composed WITHOUT self-joins: every signal
is a column expression over the same row, so the whole gate+enrich phase
is one codegen'd scan of the corpus.  The only shuffles are

  * ONE hash partitioning on ``fingerprint`` (the dedup key) — both the
    ``row_number`` winner pick and the ``count`` of copies run over the
    same window partitioning, so Catalyst plans a single Exchange; and
  * ONE tiny aggregation by ``pred_lang`` (≤ #languages rows) for the
    token-budget summary.

At 100 TB: the scan is embarrassingly parallel with full column pruning
(only ``id_col``/``text_col`` read); the fingerprint shuffle moves only
(id, lang, score, fingerprint, tokens) — never the text — and md5 keys
are uniform so there is no skew to salt.

The reference indexer has no training pipeline (it indexes one document
per blob, indexer/indexer.go); this operator set is the
training-data analog the task brief asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textstats as ts


def curate_training_set(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gate, language-gate, and canonically dedup a raw corpus.

    Keeps one representative per canonical-fingerprint group — the
    lowest id among the docs that survive the quality and language
    gates — and annotates it with how many surviving copies it stood
    for (``n_copies``).  The score threshold is float-safe: the
    composite score is an exact multiple of 0.25.

    Returns columns: ``id, pred_lang, quality_score, fingerprint,
    bpe_tokens, n_copies``.
    """
    enriched = docs.select(
        F.col(id_col).cast("long").alias("id"),
        ts.pred_lang_expr(text_col).alias("pred_lang"),
        F.round(ts.quality_score_expr(text_col), 2).alias("quality_score"),
        ts.canon_md5_expr(text_col).alias("fingerprint"),
        ts.bpe_tokens_expr(text_col).cast("long").alias("bpe_tokens"),
    )
    kept = enriched.filter(F.col("quality_score") >= min_quality)
    if langs is not None:
        kept = kept.filter(F.col("pred_lang").isin(list(langs)))
    by_fp = Window.partitionBy("fingerprint")
    return (
        kept.withColumn("rn", F.row_number().over(by_fp.orderBy(F.col("id").asc())))
        .withColumn("n_copies", F.count(F.lit(1)).over(by_fp).cast("long"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def training_token_budget(curated: DataFrame) -> DataFrame:
    """Per-language budget over a ``curate_training_set`` result.

    ``n_docs`` kept docs, ``n_dups_removed`` surviving-but-duplicate
    copies dropped by the canonical pick, and the total ``bpe_tokens``
    the kept set contributes to a training mix.  Tiny output (≤ one row
    per language), one partial-aggregated shuffle.
    """
    return curated.groupBy("pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("n_dups_removed"),
        F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
    )
