"""Extra query-path measurements (guide §1.4): phase isolation for the
bench query set, separate from the frozen bench.py/bench_job.py.

For every QUERY_SET entry of tools/bench_job.py this times, on a warm
loaded index (same persist+warm protocol as bench_job's query mode):

  total    — search(...).collect(), min of N (bench methodology)
  score    — the score_plan(...).collect() scoring job alone
  analyze  — query analysis + idf lookup (driver-side, post-warm)

Usage: python bench_extra.py --index-dir .cache/bench_index_100000_c32
       [--cpus 32] [--reps 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
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
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bmw", action="store_true", default=True)
    args = ap.parse_args()

    from gitlab_elasticsearch_indexer_spark.operators.index_build import load_index
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        score_plan, search, search_many,
    )
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    spark = get_spark(
        app_name="bench-extra-query",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 8),
    )
    idx = load_index(spark, args.index_dir)
    idx.postings = idx.postings.persist()
    idx.doc_stats = idx.doc_stats.persist()
    idx.term_stats = idx.term_stats.persist()
    idx.postings.count(), idx.doc_stats.count(), idx.term_stats.count()

    out: dict[str, dict] = {}
    for name, qs, k, lang, repo in QUERY_SET:
        m = ("bmw" if args.bmw else "exhaustive") if not (lang or repo) else "exhaustive"
        search(idx, qs, k=k, lang=lang, repo=repo, mode=m).collect()  # warm
        totals, scores = [], []
        for _ in range(args.reps):
            t0 = time.time()
            search(idx, qs, k=k, lang=lang, repo=repo, mode=m).collect()
            totals.append(time.time() - t0)
            t0 = time.time()
            sp = score_plan(idx, qs, k=k, lang=lang, repo=repo, mode=m)
            if sp is not None:
                sp.collect()
            scores.append(time.time() - t0)
        t0 = time.time()
        from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
            code_search_analyze,
        )
        idx.idf_map(code_search_analyze(qs))
        analyze = time.time() - t0
        out[name] = {
            "total": round(min(totals), 3),
            "score_job": round(min(scores), 3),
            "analyze": round(analyze, 4),
        }

    batch = {name: qs for name, qs, _, lang, repo in QUERY_SET if not (lang or repo)}
    search_many(idx, batch, k=10).collect()
    bt = []
    for _ in range(args.reps):
        t0 = time.time()
        search_many(idx, batch, k=10).collect()
        bt.append(time.time() - t0)
    result = {
        "queries": out,
        "batch_sec": round(min(bt), 3),
        "batch_per_query": round(min(bt) / len(batch), 4),
        "p50": round(statistics.median(
            [v["total"] for v in out.values()]), 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
