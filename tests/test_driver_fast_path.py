"""Driver-side scoring fast path (round 6): the local pyarrow scorer
must return EXACTLY what the distributed Spark plan returns, on every
feature it dispatches — plain OR, operator=and, must_not, msm,
dl_range, lang/repo filters, routing, search_after — and fall back
cleanly when disabled or over budget."""

from __future__ import annotations

import os

import pytest

from gitlab_elasticsearch_indexer_spark.operators import index_build as ib
from gitlab_elasticsearch_indexer_spark.operators import query as q


@pytest.fixture(scope="module")
def saved_index(spark, tmp_path_factory):
    docs = [
        (f"r{i % 4:02d}_f{i:04d}",
         " ".join(
             ["if"] * (1 + i % 3)
             + ["return"] * (i % 2)
             + [f"tok{i % 17}", f"ident{i % 7}", "getUserById"]
             + (["rare_needle"] if i in (7, 77) else [])
         ),
         f"r{i % 4:02d}", f"p/{i}.py",
         ["Python", "Go", "Ruby"][i % 3])
        for i in range(240)
    ]
    df = spark.createDataFrame(
        docs, "id string, content string, repo string, path string, lang string"
    )
    idx = ib.build_index(spark, df, analyzer="simple", docs_per_part=32)
    root = str(tmp_path_factory.mktemp("fastpath") / "idx")
    idx.save(root)
    idx.unpersist()
    loaded = ib.load_index(spark, root)
    assert getattr(loaded, "postings_root", None), (
        "load_index must expose postings_root for the driver fast path"
    )
    return loaded


def _rows(df):
    return [tuple(r) for r in df.collect()]


CASES = [
    dict(query="if", k=10),
    dict(query="if return", k=7, mode="bmw"),
    dict(query="if rare_needle", k=10),
    dict(query="nonexistent_term", k=5),
    dict(query="if return", k=10, operator="and"),
    dict(query="if", k=10, must_not="rare_needle"),
    dict(query="if return tok1", k=10, minimum_should_match=2),
    dict(query="if", k=10, lang="Python"),
    dict(query="if", k=10, lang=["Python", "Go"], repo="r01"),
    dict(query="if", k=10, repo="r02"),
    dict(query="if", k=10, dl_range=(3, 8)),
    dict(query="if", k=10, offset=5),
]


@pytest.mark.parametrize("case", CASES, ids=[str(i) for i in range(len(CASES))])
def test_local_equals_spark(saved_index, case):
    local = _rows(q.search(saved_index, **case))
    os.environ["SPARK_GRAFT_DRIVER_SCORE"] = "0"
    try:
        dist = _rows(q.search(saved_index, **case))
    finally:
        os.environ["SPARK_GRAFT_DRIVER_SCORE"] = "1"
    assert local == dist


def test_local_used_and_cached(saved_index):
    # the eligible path must not touch Spark for scoring: postings LRU
    # fills on first use and is hit on the second
    q.search(saved_index, "if return", k=5).collect()
    lru = saved_index.__dict__.get("_postings_lru")
    assert lru is not None and lru.cost > 0
    before = lru.cost
    q.search(saved_index, "if return", k=5).collect()
    assert lru.cost == before  # pure cache hits, nothing re-read


def test_budget_fallback(saved_index, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_SCORE_MAX_ENTRIES", "1")
    local = _rows(q.search(saved_index, "if return", k=6))
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_SCORE_MAX_ENTRIES")
    assert local == _rows(q.search(saved_index, "if return", k=6))


def test_search_after_parity(saved_index):
    page1 = q.search(saved_index, "if return", k=5).collect()
    cur = (float(page1[-1]["score"]), page1[-1]["id"])
    local = _rows(q.search(saved_index, "if return", k=5, search_after=cur))
    os.environ["SPARK_GRAFT_DRIVER_SCORE"] = "0"
    try:
        dist = _rows(q.search(saved_index, "if return", k=5, search_after=cur))
    finally:
        os.environ["SPARK_GRAFT_DRIVER_SCORE"] = "1"
    assert local == dist and len(local) == 5


def test_batch_parity(saved_index):
    batch = {
        "a": "if",
        "b": "if return",
        "c": {"q": "if", "lang": "Python"},
        "d": {"q": "if", "repo": "r03"},
        "e": {"q": "if return", "operator": "and"},
        "f": "nonexistent_term",
    }
    local = _rows(q.search_many(saved_index, batch, k=6))
    os.environ["SPARK_GRAFT_DRIVER_SCORE"] = "0"
    try:
        dist = _rows(q.search_many(saved_index, batch, k=6))
    finally:
        os.environ["SPARK_GRAFT_DRIVER_SCORE"] = "1"
    assert local == dist


def test_in_memory_handle_unaffected(spark):
    # a non-file-backed handle has no roots: search must keep using the
    # Spark plan (gates build in-memory indexes)
    df = spark.createDataFrame(
        [(f"d{i}", "if return tok") for i in range(50)],
        "id string, content string",
    )
    idx = ib.build_index(spark, df, analyzer="simple", docs_per_part=16)
    assert getattr(idx, "postings_root", None) is None
    hits = q.search(idx, "if", k=3).collect()
    assert len(hits) == 3
    idx.unpersist()
