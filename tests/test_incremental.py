"""Incremental index: versioned update must match a full rebuild, and the
streaming front-end must fold micro-batches into the same state."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.fixtures import generate_source_files
from gitlab_elasticsearch_indexer_spark.operators import incremental as inc
from gitlab_elasticsearch_indexer_spark.operators.index_build import build_index
from gitlab_elasticsearch_indexer_spark.operators.pipeline import run_blob_pipeline
from gitlab_elasticsearch_indexer_spark.operators.query import search


def _docs_view(documents):
    return documents.select(
        "id", "content", F.col("rid").alias("repo"), "path",
        F.col("language").alias("lang"),
    )


@pytest.fixture(scope="module")
def snapshots(spark):
    """snap1 = base corpus; snap2 = ~modified/added/deleted variant."""
    src = generate_source_files(spark, n_files=120, n_repos=6,
                                include_special=False)
    docs1 = run_blob_pipeline(spark, src).persist()
    d = _docs_view(docs1)
    # deterministic edits: modify ids ending in 0, delete ending in 1, add new
    last = F.substring(F.col("id"), -4, 1)
    modified = d.filter(last == "3").withColumn(
        "content", F.concat("content", F.lit(" patched getUserById"))
    )
    kept = d.filter((last != "3") & (last != "5"))
    added = d.filter(last == "7").select(
        F.concat(F.lit("newrepo_"), "id").alias("id"), "content",
        F.lit("newrepo").alias("repo"), "path", "lang",
    )
    docs2 = kept.unionByName(modified).unionByName(added).persist()
    return d, docs2


def _topk(index, query, k=10):
    return [
        (r["id"], round(r["score"], 9))
        for r in search(index, query, k=k, mode="exhaustive").collect()
    ]


def test_incremental_matches_full_rebuild(spark, snapshots, tmp_path):
    docs1, docs2 = snapshots
    path = str(tmp_path / "idx")

    idx1 = build_index(spark, docs1, analyzer="code", docs_per_part=32)
    inc.save_versioned(idx1, path, snapshot_id=0)

    idx2 = inc.update_index(spark, path, docs2, snapshot_id=1)
    full = build_index(spark, docs2, analyzer="code", docs_per_part=32)

    # collection stats identical
    assert idx2.n_docs == full.n_docs
    assert abs(idx2.avgdl - full.avgdl) < 1e-9

    # term stats identical
    t_inc = {r["term"]: (r["df"], r["cf"]) for r in idx2.term_stats.collect()}
    t_full = {r["term"]: (r["df"], r["cf"]) for r in full.term_stats.collect()}
    assert t_inc == t_full

    # query results identical (ids and scores)
    for query in ["if", "getUserById", "patched", "parseQuery", "getu"]:
        a, b = _topk(idx2, query), _topk(full, query)
        assert [x[0] for x in a] == [x[0] for x in b], (query, a, b)
        assert np.allclose([x[1] for x in a], [x[1] for x in b], rtol=1e-9)

    # deleted docs are gone
    assert idx2.doc_stats.filter(F.substring("id", -4, 1) == "5").count() == 0

    # resumable: reload from checkpoint gives the same state
    reloaded = inc.load_versioned(spark, path)
    assert reloaded.n_docs == full.n_docs
    a = _topk(reloaded, "patched")
    assert a == _topk(full, "patched")

    # previous snapshot still loadable (snapshot isolation)
    old = inc.load_versioned(spark, path, snapshot_id=0)
    assert old.n_docs == idx1.n_docs

    # lineage recorded per partition, with rebuilt flags
    lin = spark.read.parquet(f"{path}/lineage")
    assert lin.filter((F.col("snapshot_id") == 1) & F.col("rebuilt")).count() > 0
    assert lin.filter(F.col("snapshot_id") == 1).count() >= lin.filter(
        (F.col("snapshot_id") == 1) & F.col("rebuilt")
    ).count()


def test_streaming_incremental(spark, snapshots, tmp_path):
    from gitlab_elasticsearch_indexer_spark.streaming.incremental_stream import (
        init_source_state,
        start_incremental_stream,
    )

    docs1, _ = snapshots
    path = str(tmp_path / "sidx")
    landing = str(tmp_path / "landing")
    scp = str(tmp_path / "scp")

    idx1 = build_index(spark, docs1, analyzer="code", docs_per_part=32)
    inc.save_versioned(idx1, path, snapshot_id=0)
    init_source_state(docs1, path)

    # drop one micro-batch: a brand-new doc + a modification
    batch = spark.createDataFrame(
        [
            ("streamrepo", "src/new_stream.py", "c" * 40, "Python",
             "def streamNewThing if return"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    batch.write.mode("overwrite").parquet(landing)

    q = start_incremental_stream(spark, landing, path, scp, available_now=True)
    q.awaitTermination(300)

    idx2 = inc.load_versioned(spark, path)
    assert idx2.n_docs == idx1.n_docs + 1
    hits = _topk(idx2, "streamNewThing", k=5)
    assert hits and hits[0][0] == "streamrepo_src/new_stream.py"


def test_streaming_rewrites_only_touched_state_partitions(spark, snapshots, tmp_path):
    """Per-batch source-state I/O must be O(touched partitions): files
    of untouched state_part directories stay byte-identical across a
    micro-batch, and replayed snapshot ids are stable across stream
    restarts (pinned base in _stream_meta)."""
    import hashlib
    import os

    from gitlab_elasticsearch_indexer_spark.streaming import incremental_stream as st

    docs1, _ = snapshots
    path = str(tmp_path / "sidx2")
    landing = str(tmp_path / "landing2")
    scp = str(tmp_path / "scp2")

    idx1 = build_index(spark, docs1, analyzer="code", docs_per_part=32)
    inc.save_versioned(idx1, path, snapshot_id=0)
    st.init_source_state(docs1, path)

    def state_files():
        out = {}
        root = f"{path}/_source_state"
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        open(p, "rb").read()
                    ).hexdigest()
        return out

    before = state_files()

    batch = spark.createDataFrame(
        [("streamrepo", "src/only_one.py", "d" * 40, "Python",
          "def onlyOneTouched if")],
        "repo string, path string, commit string, lang string, content string",
    )
    batch.write.mode("overwrite").parquet(landing)
    q = st.start_incremental_stream(spark, landing, path, scp, available_now=True)
    q.awaitTermination(300)

    after = state_files()
    batch_part = int(
        spark.createDataFrame([("streamrepo_src/only_one.py",)], "id string")
        .select(st._state_part(F.col("id")).alias("p")).collect()[0]["p"]
    )
    touched_prefix = f"state_part={batch_part}"
    untouched_before = {k: v for k, v in before.items()
                        if not k.startswith(touched_prefix)}
    untouched_after = {k: v for k, v in after.items()
                       if not k.startswith(touched_prefix)}
    assert untouched_before == untouched_after  # byte-identical
    assert any(k.startswith(touched_prefix) for k in after)

    # snapshot-id stability: base pinned at init, not at (re)start
    base = spark.read.parquet(f"{path}/_stream_meta").collect()[0]["base_snapshot"]
    assert base == 0
    assert inc.latest_checkpoint(spark, path)["snapshot_id"] == 1


def test_streaming_source_state_one_row_per_id(spark, snapshots, tmp_path):
    """A doc modified twice (and another put-then-deleted) within ONE
    micro-batch: _source_state must hold exactly one row per surviving
    id — the _seq winner's content — and none for the deleted id
    (the fold collapses staged rows with the updater's winner rule)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gitlab_elasticsearch_indexer_spark.streaming import incremental_stream as st

    docs1, _ = snapshots
    path = str(tmp_path / "sidx3")
    landing = tmp_path / "landing3"
    landing.mkdir()

    idx1 = build_index(spark, docs1, analyzer="code", docs_per_part=32)
    inc.save_versioned(idx1, path, snapshot_id=0)
    st.init_source_state(docs1, path)
    idx1.unpersist()

    victim = docs1.limit(1).collect()[0]
    vid_repo, vid_path = victim["repo"], victim["path"]
    vid = f"{vid_repo}_{vid_path}"
    # file 1: modify twice-doc (v1) + create doomed doc; file 2: modify
    # twice-doc again (v2) + DELETE the doomed doc (NULL content)
    def tbl(rows):
        cols = ["repo", "path", "commit", "lang", "content"]
        return pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)})

    pq.write_table(tbl([
        (vid_repo, vid_path, "a" * 40, "Python", "twiceDoc versionOne"),
        ("zz", "doomed.py", "a" * 40, "Python", "doomedDoc body"),
    ]), str(landing / "0001.parquet"))
    pq.write_table(tbl([
        (vid_repo, vid_path, "b" * 40, "Python", "twiceDoc versionTwo"),
        ("zz", "doomed.py", None, "Python", None),
    ]), str(landing / "0002.parquet"))

    q = st.start_incremental_stream(
        spark, str(landing), path, str(tmp_path / "scp3"), available_now=True
    )
    q.awaitTermination(300)

    state = spark.read.parquet(f"{path}/_source_state")
    rows = state.filter(F.col("id") == vid).collect()
    assert len(rows) == 1  # ONE row, not both staged versions
    assert rows[0]["content"] == "twiceDoc versionTwo"
    assert state.filter(F.col("id") == "zz_doomed.py").count() == 0

    # and the index agrees: later version indexed, doomed doc absent
    out = inc.load_versioned(spark, path)
    terms = {r["term"] for r in out.term_stats.collect()}
    assert "versiontwo" in terms and "versionone" not in terms
    assert out.doc_stats.filter(F.col("id") == "zz_doomed.py").count() == 0
