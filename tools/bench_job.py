"""One benchmark job in a clean JVM (invoked by bench.py via subprocess).

Modes:
  index  — timed: read cached fixture parquet → document pipeline →
           build inverted index (code analyzer) → save to parquet.
           Prints JSON {wall_sec, n_files, files_per_sec}.
  core   — timed: same chain up to the materialized packed postings,
           no save.  The scaling-efficiency measurement runs this mode
           at two parallelism levels on the same (larger) corpus, where
           the parallel fraction dominates the fixed per-job costs.
  query  — timed: load saved index, run the query set, report per-query
           wall times and p50.
  gen    — (untimed setup) materialize the synthetic corpus parquet.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

QUERY_SET = [
    ("hot_term", "if", 10, None, None),
    ("hot_multi", "if return def", 10, None, None),
    ("camel_whole", "getUserById", 10, None, None),
    ("camel_part", "user", 10, None, None),
    ("prefix", "getu", 10, None, None),
    ("multi_ident", "parseQuery buildIndex", 10, None, None),
    ("lang_filter", "return", 10, "Python", None),
    ("repo_filter", "if", 10, None, "repo-003"),
    ("zero_hit", "zzz_nothing_here", 10, None, None),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["gen", "index", "core", "query"])
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--n-files", type=int, required=True)
    ap.add_argument("--fixtures", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--bmw", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{args.mode}-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 8),
    )

    if args.mode == "gen":
        from gitlab_elasticsearch_indexer_spark.fixtures import materialize_fixtures

        t0 = time.time()
        materialize_fixtures(spark, args.fixtures, args.n_files)
        print(json.dumps({"gen_sec": round(time.time() - t0, 2)}))
        return

    if args.mode in ("index", "core"):
        from gitlab_elasticsearch_indexer_spark.operators import index_build as ib
        from gitlab_elasticsearch_indexer_spark.operators import pipeline as pl

        src = spark.read.parquet(args.fixtures)
        # warmup outside the timed window: page-cache the input, spin up
        # executor threads and one python worker per core
        src.count()

        def _noop(it):
            for pdf in it:
                yield pdf

        spark.range(0, args.cpus * 4, 1, args.cpus * 4).mapInPandas(
            _noop, schema="id long"
        ).count()
        # ... and JIT/codegen-warm the exact build plan shapes on a tiny
        # slice (~0.5% of sf0.1): a fresh JVM otherwise pays ~3-5 s of
        # first-execution compilation INSIDE the timed region — fixed
        # cost that distorts the core-scaling comparison most at the
        # high-parallelism level.  Same methodology: the timed region
        # still computes everything from the parquet input.
        warm_docs = pl.run_blob_pipeline(spark, src.limit(512))
        warm_idx = ib.build_index(
            spark,
            warm_docs.select(
                "id", "content", F.col("rid").alias("repo"), "path",
                F.col("language").alias("lang"),
            ),
            analyzer="code",
        )
        warm_idx.postings.count()
        warm_idx.unpersist()

        t0 = time.time()
        docs = pl.run_blob_pipeline(spark, src)
        idx = ib.build_index(
            spark,
            docs.select(
                "id", "content", F.col("rid").alias("repo"), "path",
                F.col("language").alias("lang"),
            ),
            analyzer="code",
        )
        idx.postings.count()  # materialize the packed index (core build)
        core = time.time() - t0
        if args.mode == "index":
            idx.save(args.index_dir)
        wall = time.time() - t0
        n = idx.n_docs
        print(json.dumps({
            "wall_sec": round(wall, 2),
            "core_sec": round(core, 2),
            "n_files": n,
            "files_per_sec": round(n / wall, 1),
            "core_files_per_sec": round(n / core, 1),
        }))
        return

    # query mode
    from gitlab_elasticsearch_indexer_spark.operators.index_build import load_index
    from gitlab_elasticsearch_indexer_spark.operators.query import search

    idx = load_index(spark, args.index_dir)
    idx.postings = idx.postings.persist()
    idx.doc_stats = idx.doc_stats.persist()
    idx.term_stats = idx.term_stats.persist()
    idx.postings.count(), idx.doc_stats.count(), idx.term_stats.count()  # warm

    mode = "bmw" if args.bmw else "exhaustive"
    per_query = {}
    lat = []
    for name, qs, k, lang, repo in QUERY_SET:
        m = mode if not (lang or repo) else "exhaustive"
        search(idx, qs, k=k, lang=lang, repo=repo, mode=m).collect()  # warm plan
        times = []
        for _ in range(3):
            t0 = time.time()
            search(idx, qs, k=k, lang=lang, repo=repo, mode=m).collect()
            times.append(time.time() - t0)
        per_query[name] = round(min(times), 3)
        lat.extend(times)

    # batched service path: one job for the whole unfiltered query set
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    batch = {name: qs for name, qs, _, lang, repo in QUERY_SET if not (lang or repo)}
    search_many(idx, batch, k=10).collect()  # warm
    t0 = time.time()
    search_many(idx, batch, k=10).collect()
    batch_sec = time.time() - t0
    print(json.dumps({
        "p50_sec": round(statistics.median(lat), 3),
        "queries": per_query,
        "batch_queries": len(batch),
        "batch_sec": round(batch_sec, 3),
        "batch_per_query_sec": round(batch_sec / max(len(batch), 1), 4),
    }))


if __name__ == "__main__":
    main()
