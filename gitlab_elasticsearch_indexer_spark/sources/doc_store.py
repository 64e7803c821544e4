"""Document store: the ES ``_source`` analog (elastic/client.go:158-195).

The reference's ES index stores every document's full source; GetBlob /
GetCommit return it by typed id (elastic/client.go:170-185).  The index
tables here carry only metadata (doc_stats), so point lookups that must
return *content* read a documents sidecar written at build time.

Layout (scale contract): hash-partitioned by ``store_part =
pmod(xxhash64(id), N)`` — stable under corpus growth — with rows
id-sorted inside each partition:

* a point lookup prunes to ONE partition directory (the store_part
  predicate constant-folds: both operands are literals) and then to one
  file's row groups via min/max id statistics (plan-asserted in tests);
* an incremental update rewrites ONLY the partitions containing changed
  ids (dynamic partition overwrite, same scheme as the streaming source
  state) — per-update write I/O is O(touched partitions), never
  O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_STORE_PARTS = 64


def _store_part(col):
    return F.pmod(F.xxhash64(col), F.lit(N_STORE_PARTS)).cast("int")


def save_documents(docs: DataFrame, index_path: str) -> None:
    """Persist full documents next to the index (full build / overwrite).

    The partition count is the module constant ``N_STORE_PARTS`` — NOT a
    parameter: readers and the incremental updater derive a row's
    partition from the same constant, so a store written with any other
    count would silently break point lookups and partition-scoped
    updates."""
    (
        docs.withColumn("store_part", _store_part(F.col("id")))
        .repartition("store_part")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .partitionBy("store_part")
        .parquet(f"{index_path}/documents")
    )


def update_documents(
    spark: SparkSession,
    index_path: str,
    upserts: DataFrame,
    delete_ids: DataFrame | None = None,
) -> None:
    """Fold a change set into the store, rewriting touched partitions only.

    ``upserts`` must carry the store's full document schema (same columns
    as the rows passed to save_documents); ``delete_ids`` needs an ``id``
    column.  Untouched partition directories' files are left byte-
    identical (asserted in tests).  Deterministic content per partition
    makes replays idempotent (at-least-once safe).
    """
    path = f"{index_path}/documents"
    ups = upserts.withColumn("store_part", _store_part(F.col("id")))
    change_ids = ups.select("id", "store_part")
    if delete_ids is not None:
        change_ids = change_ids.unionByName(
            delete_ids.select("id").withColumn("store_part", _store_part(F.col("id")))
        )
    touched = [
        int(r["store_part"])
        for r in change_ids.select("store_part").distinct().collect()
    ]
    if not touched:
        return

    prev = spark.read.parquet(path)
    if "store_part" not in prev.columns:
        # legacy un-partitioned store (pre-store_part layout, which
        # get_document still reads): one-time O(store) migration into
        # the hash-partitioned layout, folding this change set in.
        # checkpoint first — save_documents overwrites the path the
        # plan reads.
        folded = (
            prev.join(change_ids.select("id").distinct(), "id", "left_anti")
            .unionByName(ups.drop("store_part"))
            .localCheckpoint(eager=True)
        )
        save_documents(folded, index_path)
        return

    prev_touched = prev.filter(F.col("store_part").isin(touched))
    # eager localCheckpoint, NOT persist: the write below dynamic-
    # overwrites the path this plan reads — the plan must hold the rows
    # with no lineage back to it (same hazard as the streaming fold)
    folded = (
        prev_touched.join(change_ids.select("id").distinct(), "id", "left_anti")
        .unionByName(ups)
        .localCheckpoint(eager=True)
    )
    surviving = {
        int(r["store_part"])
        for r in folded.select("store_part").distinct().collect()
    }

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        (
            folded.repartition("store_part")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .partitionBy("store_part")
            .parquet(path)
        )
    finally:
        spark.conf.set(mode_key, prev_mode)

    # a partition whose every row was deleted writes no data under
    # dynamic overwrite — drop its directory explicitly (under a real
    # table format this is the DELETE's metadata operation)
    from . import fs

    for p in set(touched) - surviving:
        fs.rmtree(f"{path}/store_part={p}")


def point_read_documents(
    index_path: str, ids: list[str], columns: tuple[str, ...] = ("id", "content")
) -> dict[str, dict]:
    """Driver-side point reads of stored documents (no Spark job): the
    ids' store partitions are computed with the same XXH64 the writer
    partitioned by (functions.hashing, JVM bit-identity pinned in
    tests), then each touched ``store_part=P`` directory is read via a
    pyarrow dataset with an ``id IN`` filter (row-group pruning over
    the id-sorted files).  This is the fetch-phase primitive the search
    highlighter uses — cost is O(touched partitions), never a scan.
    Legacy un-partitioned stores fall back to one filtered read."""
    import pyarrow.dataset as pads

    from ..functions.hashing import term_bucket_py
    from . import fs

    root = f"{index_path}/documents"
    if not ids:
        return {}
    children = fs.listdir(root)
    if not children:
        return {}
    cols = list(dict.fromkeys(["id", *columns]))
    out: dict[str, dict] = {}
    has_parts = any(d.startswith("store_part=") for d in children)
    if not has_parts:  # legacy layout: single filtered read
        tbl = fs.dataset(root).to_table(
            columns=cols, filter=pads.field("id").isin(ids)
        )
        for row in tbl.to_pylist():
            out[row["id"]] = row
        return out
    live = {d for d in children if d.startswith("store_part=")}
    by_part: dict[int, list[str]] = {}
    for i in ids:
        by_part.setdefault(term_bucket_py(i, N_STORE_PARTS), []).append(i)
    for p, pids in sorted(by_part.items()):
        if f"store_part={p}" not in live:
            continue
        tbl = fs.dataset(f"{root}/store_part={p}").to_table(
            columns=cols, filter=pads.field("id").isin(pids)
        )
        for row in tbl.to_pylist():
            out[row["id"]] = row
    return out


def get_document(
    spark: SparkSession, index_path: str, doc_id: str, doc_type: str | None = None
) -> DataFrame:
    """Point lookup by document id (Client.Get analog): partition-pruned
    via the constant-folded store_part predicate, then row-group-pruned
    via the id sort."""
    df = spark.read.parquet(f"{index_path}/documents")
    cond = F.col("id") == doc_id
    if "store_part" in df.columns:  # legacy un-partitioned stores skip this
        cond = cond & (F.col("store_part") == _store_part(F.lit(doc_id)))
    df = df.filter(cond)
    if doc_type is not None:
        df = df.filter(F.col("type") == doc_type)
    return df.drop("store_part")


def get_blob(
    spark: SparkSession, index_path: str, parent_id: str, file_path: str,
    blob_type: str = "blob",
) -> DataFrame:
    """GetBlob analog: id = "{parent}_{path}" (indexer/blob.go:58-60)."""
    return get_document(spark, index_path, f"{parent_id}_{file_path}", blob_type)


def get_commit(
    spark: SparkSession, index_path: str, parent_id: str, sha: str
) -> DataFrame:
    """GetCommit analog: id = "{parent}_{sha}" (indexer/commit.go:20-22)."""
    return get_document(spark, index_path, f"{parent_id}_{sha}", "commit")
