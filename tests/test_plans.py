"""Plan-shape regression tests: the physical properties the 100 TB
design depends on must survive refactors (SURVEY.md §4)."""

import pytest
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.operators.index_build import (
    build_index,
    load_index,
)
from gitlab_elasticsearch_indexer_spark.operators.pipeline import detect_language
from gitlab_elasticsearch_indexer_spark.operators.query import search
from gitlab_elasticsearch_indexer_spark.plans.checks import (
    assert_broadcast_join,
    assert_pushed_filter,
    formatted_plan,
)


@pytest.fixture(scope="module")
def saved_index(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [(f"r_{i:03d}", f"if return getUser{i} token{i % 7}") for i in range(200)],
        "id string, content string",
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=64)
    path = str(tmp_path_factory.mktemp("planidx"))
    idx.save(path)
    return load_index(spark, path)


def test_term_filter_pushed_to_postings_scan(saved_index):
    """Query terms must reach the parquet scan as In() filters — postings
    files are term-sorted, so this is the row-group pruning path."""
    hits = search(saved_index, "if getuser1", k=5)
    assert_pushed_filter(hits, "In(term")


def test_topk_join_is_broadcast(saved_index):
    """Per-partition top-k candidates (≤ k·n_parts rows) must broadcast
    against doc_stats, never shuffle the big side."""
    hits = search(saved_index, "if", k=5)
    assert_broadcast_join(hits)


def test_language_dims_are_broadcast(spark):
    df = spark.createDataFrame([("a/b.py",), ("c/d.rb",)], "path string")
    out = detect_language(spark, df)
    plan = assert_broadcast_join(out)
    assert plan.count("BroadcastHashJoin") >= 2  # filename dim + ext dim


def test_postings_scan_prunes_columns(saved_index):
    """A term lookup must not read the posting payload columns."""
    slim = saved_index.postings.select("term", "df")
    plan = formatted_plan(slim.filter(F.col("term") == "if"))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "docs_bin" not in read_schema[0], read_schema
