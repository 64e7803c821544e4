"""Delta-driven incremental updates (update_index_delta): the change
set is consumed directly — no corpus re-read, no re-hash, no surviving
document ever re-tokenized (the reference's GetRawChanges model,
git/gitaly.go:123-174, indexer/indexer.go:35-76)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.operators import incremental as inc
from gitlab_elasticsearch_indexer_spark.operators.index_build import build_index
from gitlab_elasticsearch_indexer_spark.operators.query import search

DOCS_SCHEMA = "id string, content string, repo string, path string, lang string"


def _base_docs(spark, n=120, repos=4):
    rows = [
        (f"r{i % repos}_f{i:04d}.py", f"if return getUser{i} alpha{i % repos} tok{i % 9}",
         f"r{i % repos}", f"f{i:04d}.py", "Python" if i % 2 else "Go")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


@pytest.fixture()
def base_index(spark, tmp_path):
    docs = _base_docs(spark)
    path = str(tmp_path / "didx")
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=16)
    inc.save_versioned(idx, path, snapshot_id=0)
    idx.unpersist()
    return docs, path


def _topk(index, q, k=10, **kw):
    return [(r["id"], round(r["score"], 9))
            for r in search(index, q, k=k, **kw).collect()]


def test_delta_matches_full_rebuild(spark, base_index):
    docs, path = base_index
    ups = spark.createDataFrame(
        [
            ("r1_f0005.py", "patched deltaContent if", "r1", "f0005.py", "Go"),
            ("rX_new1.py", "brandNew deltaContent return", "rX", "new1.py", "Go"),
            ("r0_f0000.py", "if return getUser0 alpha0 tok0", "r0", "f0000.py",
             "Go"),  # unchanged content → must classify as a no-op
        ],
        DOCS_SCHEMA,
    )
    dels = spark.createDataFrame([("r2_f0002.py", "r2")], "id string, repo string")

    out = inc.update_index_delta(spark, path, ups, dels, snapshot_id=1)

    # equivalent corpus, built from scratch
    last = F.substring("id", -7, 7)
    expect = (
        _base_docs(spark)
        .filter(~F.col("id").isin("r1_f0005.py", "r2_f0002.py"))
        .unionByName(ups.filter(F.col("id") != "r0_f0000.py")
                     .filter(F.col("id") != "rX_new1.py"))
        .unionByName(ups.filter(F.col("id") == "rX_new1.py"))
    )
    full = build_index(spark, expect, analyzer="simple", docs_per_part=16)

    assert out.n_docs == full.n_docs
    assert abs(out.avgdl - full.avgdl) < 1e-9
    t_d = {r["term"]: (r["df"], r["cf"]) for r in out.term_stats.collect()}
    t_f = {r["term"]: (r["df"], r["cf"]) for r in full.term_stats.collect()}
    assert t_d == t_f

    for q in ["if", "deltacontent", "getuser5", "brandnew", "alpha2"]:
        a, b = _topk(out, q), _topk(full, q)
        assert [x[0] for x in a] == [x[0] for x in b], (q, a, b)
        assert np.allclose([x[1] for x in a], [x[1] for x in b], rtol=1e-9)

    # deleted doc gone; unchanged-oid upsert did not churn
    assert out.doc_stats.filter(F.col("id") == "r2_f0002.py").count() == 0
    st = out.__dict__["delta_stats"]
    assert st["n_appended"] == 2  # modified + new, NOT the no-op upsert
    assert st["n_dead"] == 2      # old row of modified + the delete

    # resumable: reload equals the returned view
    re = inc.load_versioned(spark, path)
    assert re.n_docs == full.n_docs
    assert _topk(re, "deltacontent") == _topk(full, "deltacontent")
    full.unpersist()


def test_pure_add_touches_no_existing_partition(spark, base_index):
    """A pure-add batch must open FRESH doc partitions and rebuild
    nothing: the new version owns only parts past the old max, every old
    part still resolves to version 0, and v0's files are untouched."""
    import os

    docs, path = base_index
    old_parts = {
        int(r["doc_part"])
        for r in inc.load_versioned(spark, path).doc_stats
        .select("doc_part").distinct().collect()
    }
    ups = spark.createDataFrame(
        [("zz_newA.py", "freshPartDoc if", "zz", "newA.py", "Go"),
         ("zz_newB.py", "freshPartDoc return", "zz", "newB.py", "Go")],
        DOCS_SCHEMA,
    )
    v0_files = {
        f: os.path.getmtime(os.path.join(d, f))
        for d, _, fs in os.walk(f"{path}/v0") for f in fs
    }
    out = inc.update_index_delta(spark, path, ups, None, snapshot_id=1)
    st = out.__dict__["delta_stats"]
    assert st["affected_parts"] == []  # nothing rebuilt
    assert set(st["written_parts"]) == set(st["appended_parts"])
    assert min(st["appended_parts"]) > max(old_parts)
    # manifest: every pre-existing part still owned by v0
    man = {int(r["doc_part"]): int(r["version"])
           for r in spark.read.parquet(f"{path}/v1/manifest").collect()}
    assert all(man[p] == 0 for p in old_parts)
    v0_after = {
        f: os.path.getmtime(os.path.join(d, f))
        for d, _, fs in os.walk(f"{path}/v0") for f in fs
    }
    assert v0_after == v0_files
    assert _topk(out, "freshpartdoc", k=3)[0][0] in {"zz_newA.py", "zz_newB.py"}


def test_delete_repacks_only_owning_partition_with_pruned_reads(spark, base_index):
    """A 1-doc delete must (a) classify against a repo-PRUNED subset of
    doc_stats partitions (the routing-manifest read path), and (b) write
    only the owning partition's repack into the new version."""
    docs, path = base_index
    target = "r3_f0003.py"
    before = inc.load_versioned(spark, path)
    owner = int(before.doc_stats.filter(F.col("id") == target)
                .select("doc_part").collect()[0][0])
    n_before = before.n_docs

    dels = spark.createDataFrame([(target, "r3")], "id string, repo string")
    empty_ups = spark.createDataFrame([], DOCS_SCHEMA)
    out = inc.update_index_delta(spark, path, empty_ups, dels, snapshot_id=1)

    st = out.__dict__["delta_stats"]
    all_parts = {
        int(r["doc_part"])
        for r in before.doc_stats.select("doc_part").distinct().collect()
    }
    assert set(st["cand_parts"]) < all_parts  # classify was pruned
    assert st["written_parts"] == [owner]     # only the owner repacked
    assert out.n_docs == n_before - 1
    assert out.doc_stats.filter(F.col("id") == target).count() == 0
    # the deleted doc's terms lost exactly one df everywhere it appeared
    old_df = {r["term"]: r["df"] for r in before.term_stats.collect()}
    new_df = {r["term"]: r["df"] for r in out.term_stats.collect()}
    assert old_df["getuser3"] - new_df.get("getuser3", 0) == 1
    # search result excludes it and scores reflect the new stats
    assert all(h[0] != target for h in _topk(out, "getuser3 if", k=20))


def test_delta_replay_is_idempotent(spark, base_index):
    docs, path = base_index
    ups = spark.createDataFrame(
        [("r1_f0001.py", "replayed patched if", "r1", "f0001.py", "Go")],
        DOCS_SCHEMA,
    )
    a = inc.update_index_delta(spark, path, ups, None, snapshot_id=1)
    t_a = {r["term"]: (r["df"], r["cf"]) for r in a.term_stats.collect()}
    # replay the SAME committed snapshot: short-circuits, state unchanged
    b = inc.update_index_delta(spark, path, ups, None, snapshot_id=1)
    t_b = {r["term"]: (r["df"], r["cf"]) for r in b.term_stats.collect()}
    assert a.n_docs == b.n_docs and t_a == t_b
    # re-sending the same change under a NEW snapshot is a no-op too
    c = inc.update_index_delta(spark, path, ups, None, snapshot_id=2)
    assert c.n_docs == b.n_docs
    assert {r["term"]: (r["df"], r["cf"])
            for r in c.term_stats.collect()} == t_b
    assert inc.latest_checkpoint(spark, path)["snapshot_id"] == 1  # no v2


def test_repeated_modification_empties_appended_part(spark, base_index):
    """Modifying the same doc across consecutive deltas: the second
    delta's repack kills EVERY doc of the part the first delta appended
    (a 1-doc fresh part) — the part must die cleanly (empty-repack path)
    and the manifest/stats must stay exact."""
    docs, path = base_index
    for s, text in enumerate(
        ["first patchOne if", "second patchTwo if", "third patchThree if"], 1
    ):
        ups = spark.createDataFrame(
            [("r1_f0001.py", text, "r1", "f0001.py", "Go")], DOCS_SCHEMA)
        out = inc.update_index_delta(spark, path, ups, None, snapshot_id=s)
    assert out.n_docs == 120  # modified in place, never duplicated
    assert out.doc_stats.filter(F.col("id") == "r1_f0001.py").count() == 1
    tdf = {r["term"]: r["df"] for r in out.term_stats.collect()}
    assert tdf.get("patchthree") == 1
    assert "patchone" not in tdf and "patchtwo" not in tdf
    hits = _topk(out, "patchthree", k=3)
    assert hits and hits[0][0] == "r1_f0001.py"
    assert not _topk(out, "patchone", k=3)
    # equivalence with a from-scratch build of the final corpus
    final = _base_docs(spark).withColumn(
        "content",
        F.when(F.col("id") == "r1_f0001.py", F.lit("third patchThree if"))
        .otherwise(F.col("content")))
    full = build_index(spark, final, analyzer="simple", docs_per_part=16)
    assert abs(out.avgdl - full.avgdl) < 1e-9
    t_f = {r["term"]: r["df"] for r in full.term_stats.collect()}
    assert tdf == t_f
    full.unpersist()


def test_duplicate_id_in_one_batch_collapses(spark, base_index):
    """Two changes to the same id inside one batch must collapse to ONE
    surviving doc (deterministic pick), never double-append; and an id
    both upserted and deleted in one batch resolves as the upsert."""
    docs, path = base_index
    ups = spark.createDataFrame(
        [("r1_f0001.py", "dupBatch alpha if", "r1", "f0001.py", "Go"),
         ("r1_f0001.py", "dupBatch beta if", "r1", "f0001.py", "Go")],
        DOCS_SCHEMA)
    dels = spark.createDataFrame([("r1_f0001.py", "r1")], "id string, repo string")
    out = inc.update_index_delta(spark, path, ups, dels, snapshot_id=1)
    assert out.n_docs == 120
    assert out.doc_stats.filter(F.col("id") == "r1_f0001.py").count() == 1
    tdf = {r["term"]: r["df"] for r in out.term_stats.collect()}
    assert tdf.get("dupbatch") == 1  # exactly one survivor's terms
    # the survivor is one of the two batch contents, deterministically
    surv = {r["term"] for r in out.term_stats.collect()}
    assert ("alpha" in surv) != ("beta" in surv)


def test_delete_plus_identical_upsert_keeps_the_doc(spark, base_index):
    """delete + recreate-with-identical-content in ONE batch must keep
    the doc (sequential delete-then-put keeps it): the unchanged-oid
    no-op filter may not leak the id into the dead set."""
    docs, path = base_index
    target = "r1_f0001.py"
    same = docs.filter(F.col("id") == target)  # identical content
    dels = spark.createDataFrame([(target, "r1")], "id string, repo string")
    out = inc.update_index_delta(spark, path, same, dels, snapshot_id=1)
    assert out.n_docs == 120
    assert out.doc_stats.filter(F.col("id") == target).count() == 1
    # true no-op batch: short-circuits before writing any new snapshot
    assert inc.latest_checkpoint(spark, path)["snapshot_id"] == 0
    hits = _topk(out, "getuser1", k=5)
    assert any(h[0] == target for h in hits)


def test_seq_column_orders_same_batch_changes(spark, base_index):
    """With a _seq column (the streaming front-end attaches the source
    file name), the HIGHEST _seq wins the within-batch dedup — temporal
    last-write-wins — even when oid order says otherwise."""
    docs, path = base_index
    # pick contents so that the LATER change has the SMALLER sha256:
    # oid("aaaa...") vs oid of the other — compute both, order so the
    # oid-fallback would pick the wrong row
    import hashlib

    c1, c2 = "earlyTok if", "lateTok if"
    if hashlib.sha256(c2.encode()).hexdigest() > hashlib.sha256(c1.encode()).hexdigest():
        c1, c2 = c2, c1  # ensure the later row (_seq=2) has the SMALLER oid
    ups = spark.createDataFrame(
        [("r1_f0001.py", c1, "r1", "f0001.py", "Go", "file-0001"),
         ("r1_f0001.py", c2, "r1", "f0001.py", "Go", "file-0002")],
        DOCS_SCHEMA + ", _seq string")
    out = inc.update_index_delta(spark, path, ups, None, snapshot_id=1)
    assert out.n_docs == 120
    surv_terms = {r["term"] for r in out.term_stats.collect()}
    late_tok = c2.split()[0].lower()
    early_tok = c1.split()[0].lower()
    assert late_tok in surv_terms and early_tok not in surv_terms


def test_put_then_delete_within_one_batch_deletes(spark, base_index):
    """When deletes carry _seq too, the HIGHEST _seq wins the
    upsert-vs-delete race: a put-then-delete ordering within one
    micro-batch removes the doc (sequential apply,
    indexer/indexer.go:35-76); delete-then-put keeps it."""
    docs, path = base_index
    ups = spark.createDataFrame(
        [("r1_f0001.py", "doomedTok if", "r1", "f0001.py", "Go", "file-0001")],
        DOCS_SCHEMA + ", _seq string")
    dels = spark.createDataFrame(
        [("r1_f0001.py", "r1", "file-0002")], "id string, repo string, _seq string")
    out = inc.update_index_delta(spark, path, ups, dels, snapshot_id=1)
    assert out.n_docs == 119  # the delete (newer _seq) won
    assert out.doc_stats.filter(F.col("id") == "r1_f0001.py").count() == 0
    assert "doomedtok" not in {r["term"] for r in out.term_stats.collect()}

    # reverse ordering: delete first, put later → the doc survives
    ups2 = spark.createDataFrame(
        [("r2_f0002.py", "revivedTok if", "r2", "f0002.py", "Go", "file-0004")],
        DOCS_SCHEMA + ", _seq string")
    dels2 = spark.createDataFrame(
        [("r2_f0002.py", "r2", "file-0003")], "id string, repo string, _seq string")
    out2 = inc.update_index_delta(spark, path, ups2, dels2, snapshot_id=2)
    assert out2.n_docs == 119
    assert out2.doc_stats.filter(F.col("id") == "r2_f0002.py").count() == 1
    assert _topk(out2, "revivedtok", k=3)[0][0] == "r2_f0002.py"


def test_append_only_zero_term_docs_commits(spark, base_index):
    """A batch whose only effect is appending docs that tokenize to ZERO
    terms (empty content) writes doc_stats rows but a row-less postings
    dir — the batch must still commit (no schema-inference crash after
    the manifest lands) and the docs must be live."""
    docs, path = base_index
    ups = spark.createDataFrame(
        [("zz_empty.py", "", "zz", "empty.py", "Go")], DOCS_SCHEMA)
    out = inc.update_index_delta(spark, path, ups, None, snapshot_id=1)
    assert out.n_docs == 121
    assert inc.latest_checkpoint(spark, path)["snapshot_id"] == 1
    assert out.doc_stats.filter(F.col("id") == "zz_empty.py").count() == 1
    # stats unchanged (no terms added) and search still exact
    assert _topk(out, "getuser7", k=3)
    re = inc.load_versioned(spark, path)
    assert re.n_docs == 121


def test_vacuum_skips_in_progress_staged_version(spark, base_index):
    """A version dir NEWER than the latest committed checkpoint (an
    in-progress update's staged snapshot) must survive vacuum."""
    import os
    import shutil

    docs, path = base_index
    ups = spark.createDataFrame(
        [("zz_v1.py", "vacProbe if", "zz", "v1.py", "Go")], DOCS_SCHEMA)
    inc.update_index_delta(spark, path, ups, None, snapshot_id=1)
    # fake an in-progress snapshot: copy v1 to v7 (manifest written,
    # checkpoint row NOT written)
    shutil.copytree(f"{path}/v1", f"{path}/v7")
    st = inc.vacuum(spark, path, keep_last=1)
    assert os.path.isdir(f"{path}/v7/manifest")  # untouched
    assert os.path.isdir(f"{path}/v7/postings")
    assert st["retained_snapshots"] == [1]


def test_avgdl_exact_across_many_chained_deltas(spark, base_index):
    """The checkpointed integer total_dl keeps avgdl EXACT (bit-for-bit
    vs a from-scratch rebuild) across a long chain of delta batches —
    no float-reconstruction drift in the BM25 normalizer."""
    docs, path = base_index
    n_batches = 40
    tgt = lambda s: f"r1_f{4 * (s % 7) + 1:04d}.py"  # existing r1 docs
    for s in range(1, n_batches + 1):
        ups = spark.createDataFrame(
            [(tgt(s), f"churn{s} tok{s % 5} " + "pad " * (s % 11),
              "r1", tgt(s)[3:], "Go")], DOCS_SCHEMA)
        out = inc.update_index_delta(spark, path, ups, None, snapshot_id=s)
    final = _base_docs(spark)
    for s in range(1, n_batches + 1):  # replay the same edits sequentially
        final = final.withColumn(
            "content",
            F.when(F.col("id") == tgt(s),
                   F.lit(f"churn{s} tok{s % 5} " + "pad " * (s % 11)))
            .otherwise(F.col("content")))
    full = build_index(spark, final, analyzer="simple", docs_per_part=16)
    assert out.n_docs == full.n_docs
    assert out.avgdl == full.avgdl  # EXACT, not approx
    cp = inc.latest_checkpoint(spark, path)
    assert cp["total_dl"] is not None and cp["avgdl"] == full.avgdl
    full.unpersist()


def test_delta_rewrites_only_its_terms_buckets(spark, base_index):
    """A small delta batch must rewrite ONLY the term-hash buckets
    containing its own terms (manifest-resolved like postings), never
    the whole vocabulary — the last O(|vocab|)-per-batch term killed."""
    import os

    from gitlab_elasticsearch_indexer_spark.functions.hashing import term_bucket_py
    from gitlab_elasticsearch_indexer_spark.operators.index_build import TERM_BUCKETS

    docs, path = base_index
    # the batch's vocabulary: the new content's terms PLUS the replaced
    # doc's old terms (their df/cf change too)
    old_terms = ["if", "return", "getuser1", "alpha1", "tok1"]
    new_terms = ["zzonly"]
    ups = spark.createDataFrame(
        [("r1_f0001.py", "zzOnly", "r1", "f0001.py", "Go")], DOCS_SCHEMA)
    out = inc.update_index_delta(spark, path, ups, None, snapshot_id=1)

    written = {
        int(d.split("=")[1])
        for d in os.listdir(f"{path}/v1/term_stats")
        if d.startswith("term_bucket=")
    }
    expect = {term_bucket_py(t, TERM_BUCKETS) for t in old_terms + new_terms}
    assert written <= expect and written  # only the batch's buckets

    # untouched buckets resolve to v0 through the term manifest (a
    # touched bucket may own v1 with no dir on disk — every term in it
    # died — which correctly reads as empty)
    man = {int(r["term_bucket"]): int(r["version"])
           for r in spark.read.parquet(f"{path}/v1/term_manifest").collect()}
    assert len(man) == TERM_BUCKETS
    assert all(man[b] == 1 for b in written)
    assert all(man[b] == 0 for b in set(range(TERM_BUCKETS)) - expect)

    # and the merged view is still exactly the full-rebuild stats
    final = _base_docs(spark).withColumn(
        "content", F.when(F.col("id") == "r1_f0001.py", F.lit("zzOnly"))
        .otherwise(F.col("content")))
    full = build_index(spark, final, analyzer="simple", docs_per_part=16)
    assert {r["term"]: (r["df"], r["cf"]) for r in out.term_stats.collect()} \
        == {r["term"]: (r["df"], r["cf"]) for r in full.term_stats.collect()}
    full.unpersist()


def test_classify_fallback_is_recorded(spark, base_index, caplog):
    """A batch whose deletes lack a repo column forces the full-metadata
    classify — the fallback must be OBSERVABLE in delta_stats (and on the
    logger), and a pruned batch must record None."""
    import logging

    docs, path = base_index
    dels = spark.createDataFrame([("r3_f0003.py",)], "id string")  # no repo
    empty_ups = spark.createDataFrame([], DOCS_SCHEMA)
    with caplog.at_level(logging.WARNING,
                         logger="gitlab_elasticsearch_indexer_spark.operators.incremental"):
        out = inc.update_index_delta(spark, path, empty_ups, dels, snapshot_id=1)
    st = out.__dict__["delta_stats"]
    assert st["classify_fallback"] == "deletes_missing_repo_column"
    assert any("deletes_missing_repo_column" in r.message for r in caplog.records)

    dels2 = spark.createDataFrame([("r2_f0002.py", "r2")], "id string, repo string")
    out2 = inc.update_index_delta(spark, path, empty_ups, dels2, snapshot_id=2)
    assert out2.__dict__["delta_stats"]["classify_fallback"] is None


def test_delete_everything_loads_as_valid_empty_index(spark, tmp_path):
    """A delta that deletes every document must leave a VALID zero-doc
    index (search returns no rows, no None handles) that can grow again."""
    docs = _base_docs(spark, n=20)
    path = str(tmp_path / "eidx")
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=16)
    inc.save_versioned(idx, path, snapshot_id=0)
    idx.unpersist()

    empty_ups = spark.createDataFrame([], DOCS_SCHEMA)
    out = inc.update_index_delta(spark, path, empty_ups,
                                 docs.select("id", "repo"), snapshot_id=1)
    assert out.n_docs == 0
    assert search(out, "if", k=5).count() == 0
    re = inc.load_versioned(spark, path)
    assert re.n_docs == 0 and search(re, "if", k=5).count() == 0

    ups = spark.createDataFrame(
        [("aa_new.py", "reborn if", "aa", "new.py", "Go")], DOCS_SCHEMA)
    out2 = inc.update_index_delta(spark, path, ups, None, snapshot_id=2)
    assert out2.n_docs == 1
    hits = _topk(out2, "reborn", k=3)
    assert hits and hits[0][0] == "aa_new.py"


def test_compact_merges_small_parts_losslessly(spark, base_index):
    """compact_index (Lucene segment-merge analog): the tiny doc
    partitions accreted by single-doc delta appends merge into one dense
    partition with IDENTICAL search results, term stats, and doc stats —
    docs are renumbered, never re-read; full partitions are untouched."""
    import os

    docs, path = base_index
    for s in range(1, 5):  # accrete four 1-doc appended partitions
        ups = spark.createDataFrame(
            [(f"zz_acc{s}.py", f"accreted{s} compactme if", "zz",
              f"acc{s}.py", "Go")], DOCS_SCHEMA)
        inc.update_index_delta(spark, path, ups, None, snapshot_id=s)

    before = inc.load_versioned(spark, path)
    parts_before = {int(r["doc_part"]) for r in
                    before.doc_stats.select("doc_part").distinct().collect()}
    queries = ["if", "compactme", "accreted2", "getuser7", "alpha1"]
    q_before = {q: _topk(before, q, k=25) for q in queries}
    ts_before = {r["term"]: (r["df"], r["cf"]) for r in before.term_stats.collect()}
    ds_before = {(r["id"], r["oid"], r["dl"]) for r in before.doc_stats.collect()}
    v0_files = {
        f: os.path.getmtime(os.path.join(d, f))
        for d, _, fs in os.walk(f"{path}/v0/postings") for f in fs
    }

    out = inc.compact_index(spark, path, snapshot_id=9, min_fill=0.5)
    st = out.__dict__["compact_stats"]
    assert len(st["compacted_parts"]) == 4          # the four 1-doc parts
    assert len(st["written_parts"]) == 1            # merged into one
    parts_after = {int(r["doc_part"]) for r in
                   out.doc_stats.select("doc_part").distinct().collect()}
    assert len(parts_after) == len(parts_before) - 3

    # lossless: results, term stats, and (id, oid, dl) sets identical
    for q in queries:
        assert _topk(out, q, k=25) == q_before[q], q
    assert {r["term"]: (r["df"], r["cf"])
            for r in out.term_stats.collect()} == ts_before
    assert {(r["id"], r["oid"], r["dl"])
            for r in out.doc_stats.collect()} == ds_before
    assert out.n_docs == before.n_docs and abs(out.avgdl - before.avgdl) < 1e-12

    # full v0 partitions untouched on disk and still owned by v0
    v0_after = {
        f: os.path.getmtime(os.path.join(d, f))
        for d, _, fs in os.walk(f"{path}/v0/postings") for f in fs
    }
    assert v0_after == v0_files
    man = {int(r["doc_part"]): int(r["version"])
           for r in spark.read.parquet(f"{path}/v9/manifest").collect()}
    for p in parts_before & parts_after:
        assert man[p] == 0

    # filtered/routed queries still exact post-compaction (sidecars
    # rewritten for the merged part)
    lf = _topk(out, "if", k=25, lang="Go", mode="bmw")
    assert lf == _topk(before, "if", k=25, lang="Go")

    # replay is idempotent; further deltas keep working
    again = inc.compact_index(spark, path, snapshot_id=9)
    assert again.n_docs == out.n_docs
    ups = spark.createDataFrame(
        [("zz_post.py", "postCompact if", "zz", "post.py", "Go")], DOCS_SCHEMA)
    nxt = inc.update_index_delta(spark, path, ups, None, snapshot_id=10)
    assert nxt.n_docs == out.n_docs + 1
    assert _topk(nxt, "postcompact", k=3)[0][0] == "zz_post.py"
    assert len(_topk(nxt, "compactme", k=5)) == 4  # compacted docs intact


def test_compact_spans_multiple_target_parts(spark, base_index):
    """Compaction where the merged docs overflow one target partition:
    35 docs from seven 5-doc parts land in three dense parts (dpp=16).
    Per-term posting lists must merge in global doc order — verified by
    BMW (whose block skipping requires sorted doc ids) matching the
    pre-compaction results exactly."""
    docs, path = base_index
    for s in range(1, 8):
        ups = spark.createDataFrame(
            [(f"zm_m{s}_{j}.py", f"spanTok batch{s} item{j} if", "zm",
              f"m{s}_{j}.py", "Go") for j in range(5)], DOCS_SCHEMA)
        inc.update_index_delta(spark, path, ups, None, snapshot_id=s)

    before = inc.load_versioned(spark, path)
    queries = ["spantok", "batch3", "item4", "if"]
    q_before = {q: _topk(before, q, k=40) for q in queries}

    out = inc.compact_index(spark, path, snapshot_id=9)
    st = out.__dict__["compact_stats"]
    assert len(st["compacted_parts"]) == 7
    assert len(st["written_parts"]) == 3  # ceil(35 / 16)
    for q in queries:
        assert _topk(out, q, k=40) == q_before[q], q
    assert _topk(out, "spantok", k=40, mode="bmw") == q_before["spantok"]


def test_vacuum_drops_unreferenced_files_and_keeps_index_valid(spark, base_index):
    """build → deltas → compact → vacuum(keep_last=1): every surviving
    postings/doc_stats/term_stats directory must be referenced by the
    LATEST manifests, superseded files must be gone (bytes freed > 0),
    and all searches/stats must be identical on the vacuumed index."""
    import glob
    import os

    docs, path = base_index
    # supersede some v0 partitions (modifications) and accrete appends
    for s in range(1, 4):
        ups = spark.createDataFrame(
            [(f"r1_f{4 * s + 1:04d}.py", f"vacuumed{s} if", "r1",
              f"f{4 * s + 1:04d}.py", "Go"),
             (f"zz_vac{s}.py", f"fresh{s} if", "zz", f"vac{s}.py", "Go")],
            DOCS_SCHEMA)
        inc.update_index_delta(spark, path, ups, None, snapshot_id=s)
    inc.compact_index(spark, path, snapshot_id=4, min_fill=0.5)

    before = inc.load_versioned(spark, path)
    queries = ["if", "vacuumed2", "fresh3", "getuser7", "alpha1"]
    q_before = {q: _topk(before, q, k=25) for q in queries}
    ts_before = {r["term"]: (r["df"], r["cf"]) for r in before.term_stats.collect()}

    st = vac = inc.vacuum(spark, path, keep_last=1)
    assert st["retained_snapshots"] == [4]
    assert st["removed_dirs"] > 0 and st["bytes_freed"] > 0

    # every surviving (version, doc_part) dir is referenced by the
    # latest manifest; same for term buckets
    man = {(int(r["version"]), int(r["doc_part"]))
           for r in spark.read.parquet(f"{path}/v4/manifest").collect()}
    tman = {(int(r["version"]), int(r["term_bucket"]))
            for r in spark.read.parquet(f"{path}/v4/term_manifest").collect()}
    for vd in glob.glob(f"{path}/v*"):
        v = int(os.path.basename(vd)[1:])
        for table in ("postings", "doc_stats", "filters"):
            if os.path.isdir(f"{vd}/{table}"):
                for sub in os.listdir(f"{vd}/{table}"):
                    if sub.startswith("doc_part="):
                        assert (v, int(sub.split("=")[1])) in man, (vd, sub)
        if os.path.isdir(f"{vd}/term_stats"):
            for sub in os.listdir(f"{vd}/term_stats"):
                if sub.startswith("term_bucket="):
                    assert (v, int(sub.split("=")[1])) in tman, (vd, sub)

    after = inc.load_versioned(spark, path)
    assert after.n_docs == before.n_docs
    for q in queries:
        assert _topk(after, q, k=25) == q_before[q], q
    assert {r["term"]: (r["df"], r["cf"])
            for r in after.term_stats.collect()} == ts_before
    # filtered search still reads its (retained) sidecars
    assert _topk(after, "if", k=10, lang="Go", mode="bmw") == \
        _topk(before, "if", k=10, lang="Go", mode="bmw")

    # the index keeps evolving after a vacuum
    ups = spark.createDataFrame(
        [("zz_postvac.py", "postVacuum if", "zz", "postvac.py", "Go")],
        DOCS_SCHEMA)
    nxt = inc.update_index_delta(spark, path, ups, None, snapshot_id=5)
    assert nxt.n_docs == after.n_docs + 1
    assert _topk(nxt, "postvacuum", k=3)[0][0] == "zz_postvac.py"
    del vac


def test_streaming_uses_delta_path_without_source_state(spark, tmp_path):
    """The stream must work with NO source-state mirror at all — proof
    the index update consumes the batch as a delta rather than
    reconstructing snapshots."""
    from gitlab_elasticsearch_indexer_spark.streaming.incremental_stream import (
        start_incremental_stream,
    )

    docs = _base_docs(spark, n=60)
    path = str(tmp_path / "sidx")
    landing = str(tmp_path / "landing")
    scp = str(tmp_path / "scp")
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=16)
    inc.save_versioned(idx, path, snapshot_id=0)
    idx.unpersist()

    batch = spark.createDataFrame(
        [
            ("zz", "stream_new.py", "c" * 40, "Go", "streamDeltaDoc if"),
            ("r1", "f0001.py", "d" * 40, "Go", None),  # NULL content = delete
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    batch.write.mode("overwrite").parquet(landing)
    q = start_incremental_stream(spark, landing, path, scp, available_now=True)
    q.awaitTermination(300)

    out = inc.load_versioned(spark, path)
    assert out.n_docs == 60  # +1 add, -1 delete
    assert out.doc_stats.filter(F.col("id") == "r1_f0001.py").count() == 0
    hits = _topk(out, "streamdeltadoc", k=3)
    assert hits and hits[0][0] == "zz_stream_new.py"


def test_streaming_later_file_wins_within_one_trigger(spark, tmp_path):
    """Two drops modifying the SAME doc can land in one micro-batch
    (maxFilesPerTrigger > 1): the LATER file's version must index —
    the stream attaches the file name as _seq and the delta dedup
    prefers it over the arbitrary oid fallback."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gitlab_elasticsearch_indexer_spark.streaming.incremental_stream import (
        start_incremental_stream,
    )

    docs = _base_docs(spark, n=20)
    path = str(tmp_path / "sqidx")
    landing = tmp_path / "landing"
    landing.mkdir()
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=16)
    inc.save_versioned(idx, path, snapshot_id=0)
    idx.unpersist()

    c_early, c_late = "earlyDrop if", "lateDrop if"
    if (hashlib.sha256(c_late.encode()).hexdigest()
            > hashlib.sha256(c_early.encode()).hexdigest()):
        # make the LATER file's content the oid-order LOSER, so only
        # the _seq preference can pick it
        c_early, c_late = c_late, c_early
    for name, content in (("0001.parquet", c_early), ("0002.parquet", c_late)):
        pq.write_table(
            pa.table({"repo": ["r1"], "path": ["f0001.py"],
                      "commit": ["c" * 40], "lang": ["Go"],
                      "content": [content]}),
            str(landing / name),
        )
    q = start_incremental_stream(
        spark, str(landing), path, str(tmp_path / "scp"), available_now=True
    )
    q.awaitTermination(300)

    out = inc.load_versioned(spark, path)
    assert out.n_docs == 20
    terms = {r["term"] for r in out.term_stats.collect()}
    assert c_late.split()[0].lower() in terms
    assert c_early.split()[0].lower() not in terms
