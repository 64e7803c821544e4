"""Phase-level profile of the index build (guide §1: measure first).

Replicates tools/bench_job.py's "index" mode job-for-job but records a
wall time at every job boundary, so the build wall decomposes into:

  assign   — blob pipeline + doc-id range shuffle + per-partition counts
  docstats — dl pandas-UDF pass + avgdl aggregation
  postings — tokenize kernel + (doc_part, bucket) shuffle + pack kernel
  save_*   — each save() write job

Usage: python tools/profile_build.py [--cpus 32] [--n-files 100000]
       [--no-save] [--runs 1]
Prints one JSON line per run.  NOT part of the driver bench contract —
bench.py/bench_job.py stay the measurement of record.
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
    ap.add_argument("--fixtures", default=None)
    ap.add_argument("--index-dir", default="/tmp/profile_index")
    ap.add_argument("--no-save", action="store_true")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    import shutil

    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.operators import index_build as ib
    from gitlab_elasticsearch_indexer_spark.operators import pipeline as pl
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(
        app_name=f"profile-build-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 8),
    )
    fixtures = args.fixtures or f"/root/repo/.cache/fixtures_{args.n_files}"
    src = spark.read.parquet(fixtures)
    src.count()  # page-cache warm

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, args.cpus * 4, 1, args.cpus * 4).mapInPandas(
        _noop, schema="id long"
    ).count()

    for _ in range(args.runs):
        shutil.rmtree(args.index_dir, ignore_errors=True)
        phases: dict[str, float] = {}
        t0 = time.time()
        t = t0

        def mark(name: str) -> None:
            nonlocal t
            now = time.time()
            phases[name] = round(now - t, 2)
            t = now

        sc = spark.sparkContext
        sc.setJobDescription("profile: pipeline+assign_doc_ids")
        docs = pl.run_blob_pipeline(spark, src).select(
            "id", "content", F.col("rid").alias("repo"), "path",
            F.col("language").alias("lang"),
        )
        caches: list = []
        with_idx, n_docs = ib.assign_doc_ids(
            docs, "id", with_count=True, caches=caches
        )
        mark("assign")

        import math

        target_parts = max(sc.defaultParallelism * 2, 8)
        docs_per_part = max(1024, math.ceil(n_docs / target_parts))
        with_idx = with_idx.persist()

        sc.setJobDescription("profile: doc_stats + avgdl")
        doc_stats = ib.doc_stats_from_docs(
            with_idx, "code", docs_per_part, "id", "content"
        ).persist()
        avgdl = float(doc_stats.agg(F.avg("dl")).collect()[0][0] or 0.0)
        mark("docstats")

        sc.setJobDescription("profile: postings build")
        postings = ib.postings_from_docs(
            with_idx, "code", docs_per_part, content_col="content"
        ).persist()
        postings.count()
        mark("postings")
        core = time.time() - t0

        idx = ib.InvertedIndex(
            postings=postings,
            doc_stats=doc_stats,
            term_stats=ib.term_stats_from_postings(postings, n_docs),
            n_docs=n_docs,
            avgdl=avgdl,
            analyzer="code",
            docs_per_part=docs_per_part,
            filters=ib.filters_from_doc_stats(doc_stats, docs_per_part),
            part_meta=ib.part_meta_from_doc_stats(doc_stats),
            caches=caches + [with_idx, doc_stats, postings],
        )
        if not args.no_save:
            sc.setJobDescription("profile: save postings")
            (
                idx.postings.repartition("doc_part")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("doc_part")
                .parquet(f"{args.index_dir}/postings")
            )
            mark("save_postings")
            sc.setJobDescription("profile: save doc_stats")
            idx.doc_stats.write.mode("overwrite").partitionBy(
                "doc_part"
            ).parquet(f"{args.index_dir}/doc_stats")
            mark("save_doc_stats")
            sc.setJobDescription("profile: save term_stats")
            idx.term_stats.write.mode("overwrite").parquet(
                f"{args.index_dir}/term_stats"
            )
            mark("save_term_stats")
            sc.setJobDescription("profile: save filters+part_meta+globals")
            idx.filters.write.mode("overwrite").partitionBy("doc_part").parquet(
                f"{args.index_dir}/filters"
            )
            idx.part_meta.write.mode("overwrite").parquet(
                f"{args.index_dir}/part_meta"
            )
            spark.createDataFrame(
                [(idx.n_docs, idx.avgdl, idx.analyzer, idx.docs_per_part)],
                "n_docs long, avgdl double, analyzer string, docs_per_part long",
            ).write.mode("overwrite").parquet(f"{args.index_dir}/globals")
            mark("save_rest")
        wall = time.time() - t0
        idx.unpersist()
        print(json.dumps({
            "wall_sec": round(wall, 2),
            "core_sec": round(core, 2),
            "n_docs": n_docs,
            "phases": phases,
        }), flush=True)


if __name__ == "__main__":
    main()
