"""Split the postings-build phase (guide §1.4 noop-sink isolation):

  tokenize — the capture-TF mapInPandas kernel alone → noop sink
  rows     — tokenize + the (doc_part, bucket) key projection → noop
  full     — tokenize + shuffle + pack kernel (postings_from_docs) → noop

Usage: python tools/profile_postings.py [--cpus 32] [--n-files 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n-files", type=int, default=100_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.operators import index_build as ib
    from gitlab_elasticsearch_indexer_spark.operators import pipeline as pl
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(
        app_name="profile-postings",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 8),
    )
    src = spark.read.parquet(f"/root/repo/.cache/fixtures_{args.n_files}")
    src.count()

    docs = pl.run_blob_pipeline(spark, src).select(
        "id", "content", F.col("rid").alias("repo"), "path",
        F.col("language").alias("lang"),
    )
    caches: list = []
    with_idx, n_docs = ib.assign_doc_ids(docs, "id", with_count=True,
                                         caches=caches)
    with_idx = with_idx.persist()
    with_idx.count()  # materialize the cache so phases below are isolated

    import math

    docs_per_part = max(1024, math.ceil(
        n_docs / max(spark.sparkContext.defaultParallelism * 2, 8)))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    kernel = ib.make_term_rows_kernel("code", "content")
    for r in range(args.runs):
        out = {}
        sc = spark.sparkContext

        sc.setJobDescription("tokenize only")
        t0 = time.time()
        noop(with_idx.select("doc_idx", "content").mapInPandas(
            kernel, schema=ib.TERM_ROWS_SCHEMA))
        out["tokenize"] = round(time.time() - t0, 2)

        sc.setJobDescription("tokenize+keys")
        tokened = with_idx.select("doc_idx", "content").mapInPandas(
            kernel, schema=ib.TERM_ROWS_SCHEMA)
        term_rows = tokened.select(
            (F.col("doc_idx") / docs_per_part).cast("long").alias("doc_part"),
            F.pmod(F.xxhash64(F.substring("term", 1, 2)), F.lit(32)).alias("bucket"),
            "term", "doc_idx", "tf", "dl",
        )
        t0 = time.time()
        noop(term_rows)
        out["tokenize_keys"] = round(time.time() - t0, 2)

        sc.setJobDescription("full postings (tokenize+shuffle+pack)")
        t0 = time.time()
        noop(ib.postings_from_docs(with_idx, "code", docs_per_part,
                                   content_col="content"))
        out["full"] = round(time.time() - t0, 2)

        sc.setJobDescription("dl pandas-UDF pass")
        t0 = time.time()
        noop(ib.doc_stats_from_docs(with_idx, "code", docs_per_part,
                                    "id", "content"))
        out["doc_stats"] = round(time.time() - t0, 2)
        print(json.dumps({"run": r, **out}), flush=True)


if __name__ == "__main__":
    main()
