"""Structured Streaming front-end for the incremental indexer.

The reference's streaming surface is a gRPC change feed consumed one
file at a time (git/gitaly.go:123-174); the Spark-native equivalent is
a file-source stream of source-table snapshots driven through
``foreachBatch`` into the versioned incremental updater: each
micro-batch is one "snapshot" — the batch's rows are upserts, and rows
with NULL content are deletes (rename = delete old path + add new,
matching integration_test.go:49-69).

``foreachBatch`` (not a streaming sink) is the right tool because the
index update is a multi-table transactional rewrite — the checkpoint
row is the commit point, and Spark's streaming checkpoint (the
``checkpointLocation``) guarantees each batch is applied at least once
with the version directory making replays idempotent.

Scale design (the round-1 version rewrote the ENTIRE source state twice
per micro-batch — O(corpus) I/O per trigger):

* source state lives hash-partitioned by ``state_part =
  pmod(xxhash64(id), N)``; a batch rewrites ONLY the partitions that
  contain its ids (dynamic partition overwrite), so per-batch write I/O
  is O(|touched partitions|), not O(corpus);
* snapshot ids derive from ``batch_id`` against a base snapshot pinned
  ONCE in ``_stream_meta`` at stream initialization — a post-crash
  replay of batch b maps to the same snapshot_id it had on the first
  attempt, keeping replays idempotent across restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import latest_checkpoint, update_index

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"

N_STATE_PARTS = 64


def _state_part(col):
    return F.pmod(F.xxhash64(col), F.lit(N_STATE_PARTS)).cast("int")


def init_source_state(docs: DataFrame, index_dir: str) -> None:
    """Persist the initial source snapshot next to the index (streaming
    needs previous contents to reconstruct full snapshots from deltas),
    hash-partitioned so batches can rewrite only touched partitions."""
    (
        docs.select("id", "content", "repo", "path", "lang")
        .withColumn("state_part", _state_part(F.col("id")))
        .write.mode("overwrite")
        .partitionBy("state_part")
        .parquet(f"{index_dir}/_source_state")
    )


def _stream_base_snapshot(spark: SparkSession, index_dir: str) -> int:
    """Pin the stream's base snapshot id once; reuse across restarts so
    a replayed batch_id maps to the same snapshot_id as its first run."""
    import os

    meta_path = f"{index_dir}/_stream_meta"
    if os.path.isdir(meta_path):
        return int(spark.read.parquet(meta_path).collect()[0]["base_snapshot"])
    base = int(latest_checkpoint(spark, index_dir)["snapshot_id"])
    spark.createDataFrame([(base,)], "base_snapshot long").write.mode(
        "overwrite"
    ).parquet(meta_path)
    return base


def start_incremental_stream(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    stream_checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream source-file drops from ``landing_dir`` into the index.

    Each micro-batch folds its rows into the hash-partitioned source
    state (touched partitions only) and runs one incremental index
    update (snapshot_id = pinned base + batch_id + 1).  Returns the
    StreamingQuery.
    """
    base_snapshot = _stream_base_snapshot(spark, index_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        src_path = f"{index_dir}/_source_state"
        batch_docs = batch_df.select(
            F.concat("repo", F.lit("_"), "path").alias("id"),
            "content", "repo", "path", "lang",
        ).withColumn("state_part", _state_part(F.col("id"))).persist()

        touched = [
            int(r["state_part"])
            for r in batch_docs.select("state_part").distinct().collect()
        ]
        # fold the batch into ONLY the touched partitions: anti-join out
        # the batch ids (covers modify + delete), union the upserts
        prev_touched = spark.read.parquet(src_path).filter(
            F.col("state_part").isin(touched)
        )
        # localCheckpoint (eager) — NOT persist: the write below
        # dynamic-overwrites the same path this plan reads, so the plan
        # must hold the folded rows themselves, with NO lineage back to
        # src_path.  A persist() only caches lazily; cache eviction or
        # executor loss would recompute from the half-overwritten source.
        folded = (
            prev_touched.join(batch_docs.select("id"), "id", "left_anti")
            .unionByName(batch_docs.filter(F.col("content").isNotNull()))
            .localCheckpoint(eager=True)
        )
        surviving = {
            int(r["state_part"])
            for r in folded.select("state_part").distinct().collect()
        }

        mode_key = "spark.sql.sources.partitionOverwriteMode"
        prev_mode = spark.conf.get(mode_key, "static")
        spark.conf.set(mode_key, "dynamic")
        try:
            # dynamic overwrite replaces only partitions present in the
            # written data; untouched partitions' files stay untouched.
            # Deterministic content per (batch_id, partition) → an
            # at-least-once replay converges to the same state.
            folded.write.mode("overwrite").partitionBy("state_part").parquet(src_path)
        finally:
            spark.conf.set(mode_key, prev_mode)
        batch_docs.unpersist()
        # a partition whose every row was deleted writes no data under
        # dynamic overwrite — drop its directory explicitly (under a
        # real table format this is the DELETE's metadata operation)
        import shutil

        for p in set(touched) - surviving:
            d = f"{src_path}/state_part={p}"
            shutil.rmtree(d, ignore_errors=True)

        curr = spark.read.parquet(src_path)
        update_index(spark, index_dir, curr,
                     snapshot_id=base_snapshot + batch_id + 1)

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
