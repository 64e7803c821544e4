"""Structured Streaming front-end for the incremental indexer.

The reference's streaming surface is a gRPC change feed consumed one
file at a time (git/gitaly.go:123-174); the Spark-native equivalent is
a file-source stream of source-table snapshots driven through
``foreachBatch`` into the versioned incremental updater: each
micro-batch is one "snapshot" — the batch's rows are upserts, and rows
carrying ``_op = 'D'`` are deletes (rename = delete old path + add new,
matching integration_test.go:49-69).

``foreachBatch`` (not a streaming sink) is the right tool because the
index update is a multi-table transactional rewrite — the checkpoint
row is the commit point, and Spark's streaming checkpoint (the
``checkpointLocation``) guarantees each batch is applied at least once
with the version directory making replays idempotent (same snapshot_id
→ same deterministic output files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import load_versioned, update_index

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"


def start_incremental_stream(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    stream_checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream source-file drops from ``landing_dir`` into the index.

    Each micro-batch folds its rows into the *current* source state and
    runs one incremental index update (snapshot_id = base + batch_id).
    Returns the StreamingQuery.
    """
    base_snapshot = _latest_snapshot(spark, index_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        prev = load_versioned(spark, index_dir)
        prev_docs = prev.doc_stats.select("id", "repo", "path", "lang")
        batch_docs = batch_df.select(
            F.concat("repo", F.lit("_"), "path").alias("id"),
            "content", "repo", "path", "lang",
        )
        # current state = previous docs minus batch ids, plus batch rows —
        # we need previous contents for unchanged docs; they are not in
        # doc_stats, so the updater's diff handles it: update_index takes
        # the FULL current snapshot. Reconstruct it from the previous
        # source parquet tracked next to the index.
        src_path = f"{index_dir}/_source_state"
        prev_src = spark.read.parquet(src_path)
        curr = (
            prev_src.join(batch_docs.select("id"), "id", "left_anti")
            .unionByName(batch_docs.filter(F.col("content").isNotNull()))
        )
        curr.write.mode("overwrite").parquet(f"{src_path}_next")
        curr2 = spark.read.parquet(f"{src_path}_next")
        update_index(spark, index_dir, curr2, snapshot_id=base_snapshot + batch_id + 1)
        # promote the new source state (cheap dir swap emulation)
        curr2.write.mode("overwrite").parquet(src_path)

    reader = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", "16")
        .parquet(landing_dir)
    )
    writer = (
        reader.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", stream_checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def init_source_state(docs: DataFrame, index_dir: str) -> None:
    """Persist the initial source snapshot next to the index (streaming
    needs previous contents to reconstruct full snapshots from deltas)."""
    docs.select("id", "content", "repo", "path", "lang").write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/_source_state")


def _latest_snapshot(spark: SparkSession, index_dir: str) -> int:
    from ..operators.incremental import latest_checkpoint

    return int(latest_checkpoint(spark, index_dir)["snapshot_id"])
