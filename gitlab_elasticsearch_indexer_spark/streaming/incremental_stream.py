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

Scale design (round 1 rewrote the ENTIRE source state twice per
micro-batch; round 2 still RE-READ and re-hashed the whole corpus per
trigger to re-derive the diff the batch already encoded):

* the batch IS the change set: non-NULL-content rows are upserts,
  NULL-content rows are deletes — it feeds ``update_index_delta``
  directly, so per-trigger index compute is O(batch + touched doc
  partitions), never a corpus re-read or re-hash (the reference model:
  git/gitaly.go:123-174 streams only GetRawChanges);
* the optional source-state mirror lives hash-partitioned by
  ``state_part = pmod(xxhash64(id), N)``; a batch rewrites ONLY the
  partitions that contain its ids (dynamic partition overwrite), so
  per-batch state I/O is O(|touched partitions|), not O(corpus).  It
  exists for snapshot reconstruction/tooling — the index update does
  not read it;
* snapshot ids derive from ``batch_id`` against a base snapshot pinned
  ONCE in ``_stream_meta`` at stream initialization — a post-crash
  replay of batch b maps to the same snapshot_id it had on the first
  attempt, keeping replays idempotent across restarts (the delta
  updater additionally short-circuits committed snapshot ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import latest_checkpoint, update_index_delta

SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"

N_STATE_PARTS = 64


def _state_part(col):
    return F.pmod(F.xxhash64(col), F.lit(N_STATE_PARTS)).cast("int")


def init_source_state(docs: DataFrame, index_dir: str) -> None:
    """OPTIONAL: persist a source-state mirror next to the index (for
    snapshot reconstruction / tooling — the index update itself consumes
    batches as deltas and never reads this), hash-partitioned so batches
    rewrite only touched partitions."""
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
    from ..sources import fs as _fs

    meta_path = f"{index_dir}/_stream_meta"
    if _fs.isdir(meta_path):
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
        import os

        if batch_df.isEmpty():
            return
        src_path = f"{index_dir}/_source_state"
        # _seq = source file name: a micro-batch can span several file
        # drops (maxFilesPerTrigger > 1), and a doc modified twice in
        # one trigger must index the LATER drop's version — file names
        # sort by drop order for monotonically-named landings, and the
        # delta updater's dedup window prefers the highest _seq
        # (falling back to oid order only on ties / missing _seq).
        batch_docs = batch_df.select(
            F.concat("repo", F.lit("_"), "path").alias("id"),
            "content", "repo", "path", "lang",
            F.input_file_name().alias("_seq"),
        ).persist()

        # THE index update: the micro-batch is the change set — upserts
        # are the non-NULL-content rows, deletes the NULL-content rows.
        # No source-state read, no corpus re-hash: cost is O(batch +
        # touched doc partitions) end-to-end.
        update_index_delta(
            spark, index_dir,
            upserts=batch_docs.filter(F.col("content").isNotNull()),
            # deletes keep their _seq so a put-then-delete ordering
            # WITHIN one micro-batch resolves sequentially (highest
            # _seq wins in the updater, not upsert-always-wins)
            deletes=batch_docs.filter(F.col("content").isNull())
            .select("id", "repo", "_seq"),
            snapshot_id=base_snapshot + batch_id + 1,
        )

        # optional source-state mirror (snapshot reconstruction/tooling):
        # fold into touched state partitions only; skipped when
        # init_source_state was never called
        from ..sources import fs as _fs

        if _fs.isdir(src_path):
            _fold_source_state(spark, src_path, batch_docs)
        batch_docs.unpersist()

    def _fold_source_state(spark, src_path: str, batch_docs: DataFrame) -> None:
        from pyspark.sql.window import Window

        # collapse to ONE row per id first, with the SAME winner rule as
        # update_index_delta (_seq desc, then oid desc; a winning NULL-
        # content delete then drops out in the content filter below) —
        # otherwise a doc modified twice in one micro-batch keeps BOTH
        # content rows in _source_state, diverging from the index
        w = Window.partitionBy("id").orderBy(
            F.col("_seq").desc_nulls_last(),
            F.sha2(F.col("content"), 256).desc_nulls_last(),
        )
        staged = (
            batch_docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_seq")
            .withColumn("state_part", _state_part(F.col("id")))
        )
        touched = [
            int(r["state_part"])
            for r in staged.select("state_part").distinct().collect()
        ]
        prev_touched = spark.read.parquet(src_path).filter(
            F.col("state_part").isin(touched)
        )
        # localCheckpoint (eager) — NOT persist: the write below
        # dynamic-overwrites the same path this plan reads, so the plan
        # must hold the folded rows themselves, with NO lineage back to
        # src_path.  A persist() only caches lazily; cache eviction or
        # executor loss would recompute from the half-overwritten source.
        folded = (
            prev_touched.join(staged.select("id"), "id", "left_anti")
            .unionByName(staged.filter(F.col("content").isNotNull()))
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
        # a partition whose every row was deleted writes no data under
        # dynamic overwrite — drop its directory explicitly (under a
        # real table format this is the DELETE's metadata operation)
        from ..sources import fs as _fs

        for p in set(touched) - surviving:
            _fs.rmtree(f"{src_path}/state_part={p}")

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
