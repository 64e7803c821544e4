"""Dump .explain("formatted") for the engine's key physical plans.

Checks the plan properties the design depends on:
* parquet scans show PushedFilters (term isin → row-group pruning on the
  term-sorted posting files) and pruned ReadSchema;
* broadcast joins where a side is small (language dim, top-k candidates);
* whole-stage codegen spans around the native column expressions.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def cap(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.operators import index_build as ib
    from gitlab_elasticsearch_indexer_spark.operators import pipeline as pl
    from gitlab_elasticsearch_indexer_spark.operators import query as q
    from gitlab_elasticsearch_indexer_spark.session import get_spark
    from gitlab_elasticsearch_indexer_spark.sources.tables import (
        source_files_from_documents,
    )

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    src = source_files_from_documents(spark, SF)
    print("=" * 30, "A5/A6 filters over parquet scan")
    plan = cap(pl.filter_indexable(src).select("repo", "path"))
    print(plan)

    print("=" * 30, "A7 language detect (broadcast dims expected)")
    print(cap(pl.detect_language(spark, src).select("path", "detected_lang")))

    # a saved index exercises the parquet read path (pushdown matters there)
    import tempfile

    docs = pl.run_blob_pipeline(spark, src)
    idx = ib.build_index(
        spark,
        docs.select("id", "content", F.col("rid").alias("repo"), "path",
                    F.col("language").alias("lang")),
        analyzer="simple", docs_per_part=128,
    )
    tmp = tempfile.mkdtemp(prefix="explain_idx_")
    idx.save(tmp)
    loaded = ib.load_index(spark, tmp)

    print("=" * 30, "B14 search over saved postings (term pushdown expected)")
    print(cap(q.search(loaded, "table scan", k=10)))

    print("=" * 30, "B14 scoring phase (lazy plan: In(term) pushdown,")
    print("pruned ReadSchema, per-part applyInPandas kernel)")
    print(cap(q.score_plan(loaded, "table scan merge", k=10)))

    print("=" * 30, "B23/B24 bool scoring (operator=and + must_not ride the")
    print("same single term-pruned scan — exclusion terms in the In() list)")
    print(cap(q.score_plan(loaded, "table scan merge", k=10,
                           operator="and", must_not="window")))

    print("=" * 30, "B32 prefix expansion (StartsWith pushed to the")
    print("term_stats scan, (term, df)-pruned ReadSchema)")
    print(cap(loaded.term_stats.filter(F.col("term").startswith("sc"))
              .select("term", "df")))

    print("=" * 30, "B33 fuzzy expansion (length band pushed; levenshtein")
    print("evaluated JVM-side inside the codegen span)")
    print(cap(loaded.term_stats.filter(
        (F.length("term") >= 3) & (F.length("term") <= 5)
        & (F.levenshtein(F.col("term"), F.lit("sort")) <= 1)
    ).select("term", "df")))

    print("=" * 30, "B32/B33/B34 rewritten scoring (expanded terms in the")
    print("In() pushdown like any multi-term query)")
    terms = q.expand_prefix(loaded, "s", max_expansions=8)
    if terms:
        print(cap(q.score_plan(loaded, "", k=10,
                               pre_weights={t: 1.0 for t in terms})))


if __name__ == "__main__":
    main()
