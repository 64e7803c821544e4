"""Source tables.

Two families:

* the driver-provided deterministic parquet tables at
  ``/root/testdata/sf*/`` (TPC-H-ish + ``documents`` + ``embeddings``),
* the engine's canonical input shape — an Iceberg-style table of
  source files ``(repo, path, commit, lang, content)`` (BASELINE.json
  ``input_hint``), either synthesized by :mod:`..fixtures` or adapted
  from the driver's ``documents`` table.

In this sandbox "Iceberg table" materializes as partitioned snapshotted
parquet (see :mod:`..operators.incremental` for the snapshot/checkpoint
layer); the DataFrame code is identical under a real Iceberg catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def source_files_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table to the canonical input shape.

    repo ← source, path ← synthesized stable POSIX path, commit ← sha256
    prefix of content (40 hex, deterministic), lang ← lang, content ← text.
    The same mapping is expressed in ANSI SQL by the DuckDB oracle.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(
            F.lit("docs/"),
            F.col("source"),
            F.lit("/doc_"),
            F.lpad(F.col("doc_id").cast("string"), 6, "0"),
            F.lit(".txt"),
        ).alias("path"),
        F.substring(F.sha2(F.col("text"), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        # A3: materialized size column — on a stored table this predicate
        # is parquet-pushable, so the 1 MiB cut never reads content
        # (git/gitaly.go:243-247 skips the blob fetch the same way)
        F.octet_length(F.col("text")).cast("long").alias("size"),
    )
