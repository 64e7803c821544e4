"""Dump .explain("formatted") for every bench query + the build plans.

Usage: python tools/dump_plans_r06.py <tree_root> <out_dir> <suffix>
e.g.   python tools/dump_plans_r06.py /root/repo plans/r06 after
       python tools/dump_plans_r06.py /tmp/wt_r5 plans/r06 before

Writes <out_dir>/<name>_<suffix>.txt per plan.  The query plans are the
SPARK scoring plans (score_plan) — on round-6 trees the single/batched
query entry points dispatch small queries to the driver-side fast path
(no Spark plan at all); the dumped plan is the distributed fallback,
which is also exactly what non-file-backed handles run.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

TREE = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
sys.path.insert(0, TREE)

QUERY_SET = [
    ("hot_term", "if", None, None),
    ("hot_multi", "if return def", None, None),
    ("camel_whole", "getUserById", None, None),
    ("camel_part", "user", None, None),
    ("prefix", "getu", None, None),
    ("multi_ident", "parseQuery buildIndex", None, None),
    ("lang_filter", "return", "Python", None),
    ("repo_filter", "if", None, "repo-003"),
    ("zero_hit", "zzz_nothing_here", None, None),
]


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

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name=f"plans-{SUFFIX}", master="local[8]",
                      shuffle_partitions=16)

    def write(name: str, text: str) -> None:
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(text)

    src = spark.read.parquet("/root/repo/.cache/fixtures_100000")
    docs = pl.run_blob_pipeline(spark, src).select(
        "id", "content", F.col("rid").alias("repo"), "path",
        F.col("language").alias("lang"),
    )
    # build plan: the postings chain (tokenize → shuffle → pack)
    caches: list = []
    with_idx, n_docs = ib.assign_doc_ids(docs, "id", with_count=True,
                                         caches=caches)
    import math

    dpp = max(1024, math.ceil(n_docs / 16))
    write("build_postings", cap(
        ib.postings_from_docs(with_idx, "code", dpp)))
    write("build_doc_stats", cap(
        ib.doc_stats_from_docs(with_idx, "code", dpp, "id", "content")))
    for c in caches:
        c.unpersist()

    idx = ib.load_index(spark, "/root/repo/.cache/bench_index_100000_c32")
    write("save_postings", cap(
        idx.postings.repartition("doc_part")
        .sortWithinPartitions(*(
            ("doc_part", "term") if SUFFIX != "before" else ("term",)
        ))
    ))
    for name, qs, lang, repo in QUERY_SET:
        mode = "bmw" if not (lang or repo) else "exhaustive"
        sp = q.score_plan(idx, qs, k=10, lang=lang, repo=repo, mode=mode)
        write(name, cap(sp) if sp is not None else
              "(no plan: zero live terms -> empty local result, no job)\n")
    print("done", SUFFIX)


if __name__ == "__main__":
    main()
