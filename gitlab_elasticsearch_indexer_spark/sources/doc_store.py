"""Document store: the ES ``_source`` analog (elastic/client.go:158-195).

The reference's ES index stores every document's full source; GetBlob /
GetCommit return it by typed id (elastic/client.go:170-185).  The index
tables here carry only metadata (doc_stats), so point lookups that must
return *content* read a documents sidecar written at build time:
id-range-partitioned, id-sorted parquet — a point lookup prunes to one
file's row groups via min/max id statistics (plan-asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_documents(docs: DataFrame, index_path: str, num_ranges: int | None = None) -> None:
    """Persist full documents next to the index, id-sorted for pruning."""
    spark = docs.sparkSession
    num_ranges = num_ranges or spark.sparkContext.defaultParallelism
    (
        docs.repartitionByRange(num_ranges, F.col("id"))
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .parquet(f"{index_path}/documents")
    )


def get_document(
    spark: SparkSession, index_path: str, doc_id: str, doc_type: str | None = None
) -> DataFrame:
    """Point lookup by document id (Client.Get analog)."""
    df = spark.read.parquet(f"{index_path}/documents").filter(F.col("id") == doc_id)
    if doc_type is not None:
        df = df.filter(F.col("type") == doc_type)
    return df


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
