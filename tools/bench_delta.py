"""Delta-maintenance cost vs corpus size (round-3 table, re-measured
with the round-4 bucketed term_stats).

For each corpus size: full build + save_versioned once, then time a
1-doc `update_index_delta` batch (min of k warm runs, fresh snapshot id
each) and a `vacuum(keep_last=1)`.  The delta path's contract is that
the per-batch cost is CORPUS-INDEPENDENT: classify prunes via the repo
routing manifest, the repack touches one partition, and the term_stats
merge now reads+writes only the batch terms' hash buckets.

Usage: python tools/bench_delta.py [sizes...]   (default 5000 20000 80000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [5000, 20000, 80000]
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.operators import incremental as inc
    from gitlab_elasticsearch_indexer_spark.operators.index_build import build_index
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    spark = get_spark(app_name="bench-delta", master="local[8]",
                      shuffle_partitions=16)
    out = []
    for n in sizes:
        docs = spark.range(n).select(
            F.concat(F.lit("repo-"), F.lpad((F.col("id") % 50).cast("string"), 3, "0"),
                     F.lit("_src/f"), F.col("id").cast("string"), F.lit(".py")).alias("id"),
            F.concat(F.lit("def getUser"), F.col("id").cast("string"),
                     F.lit("(): return if else import token"),
                     (F.col("id") % 97).cast("string")).alias("content"),
            F.concat(F.lit("repo-"), F.lpad((F.col("id") % 50).cast("string"), 3, "0")).alias("repo"),
            F.concat(F.lit("src/f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
            F.lit("Python").alias("lang"),
        )
        path = tempfile.mkdtemp(prefix=f"deltabench_{n}_")
        idx = build_index(spark, docs, analyzer="code")
        t0 = time.time()
        inc.save_versioned(idx, path, snapshot_id=0)
        save_sec = time.time() - t0
        idx.unpersist()

        delta_secs = []
        for s in (1, 2, 3):
            ups = spark.createDataFrame(
                [(f"repo-007_src/f7.py",
                  f"def patched{s}(): return betaToken{s}",
                  "repo-007", "src/f7.py", "Python")],
                "id string, content string, repo string, path string, lang string")
            t0 = time.time()
            inc.update_index_delta(spark, path, ups, None, snapshot_id=s)
            delta_secs.append(round(time.time() - t0, 2))
        t0 = time.time()
        vac = inc.vacuum(spark, path, keep_last=1)
        vac_sec = round(time.time() - t0, 2)
        out.append({"n_docs": n, "save_sec": round(save_sec, 2),
                    "delta_1doc_secs": delta_secs,
                    "delta_1doc_min": min(delta_secs),
                    "vacuum_sec": vac_sec,
                    "vacuum_removed_dirs": vac["removed_dirs"]})
        print(json.dumps(out[-1]), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"table": out}))


if __name__ == "__main__":
    main()
