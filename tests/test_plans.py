"""Plan-shape regression tests: the physical properties the 100 TB
design depends on must survive refactors (SURVEY.md §4)."""

import pytest
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.operators.index_build import (
    build_index,
    load_index,
)
from gitlab_elasticsearch_indexer_spark.operators.pipeline import detect_language
from gitlab_elasticsearch_indexer_spark.operators.query import score_plan, search
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
    files are term-sorted, so this is the row-group pruning path.
    (score_plan is search's lazy scoring phase — search itself consumes
    it eagerly for the fetch join, so the plan is asserted here.)"""
    scored = score_plan(saved_index, "if getuser1", k=5)
    assert_pushed_filter(scored, "In(term")


def test_bool_query_keeps_term_pushdown(saved_index):
    """operator='and' and must_not ride the SAME term-pruned postings
    scan: positive and exclusion terms together form one In() pushdown
    — exclusion never becomes a second scan or an anti-join shuffle."""
    scored = score_plan(saved_index, "if getuser1", k=5, operator="and")
    assert_pushed_filter(scored, "In(term")
    scored = score_plan(saved_index, "if", k=5, must_not="return")
    plan = assert_pushed_filter(scored, "In(term")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("return" in l for l in pushed)  # neg term rides the scan


def test_topk_join_is_broadcast(saved_index):
    """Distributed fetch fallback: per-partition top-k candidates
    (≤ k·n_parts rows) must broadcast against doc_stats, never shuffle
    the big side."""
    hits = search(saved_index, "if", k=5, fetch="spark")
    assert_broadcast_join(hits)


def test_fetch_point_reads_equal_spark_join(saved_index):
    """The driver-side point-read fetch phase (auto) must return
    EXACTLY the pruned-join fetch's rows — ids, scores, order."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    for q in ("if", "getuser1", "if getuser2"):
        a = [(r["id"], round(r["score"], 9))
             for r in search(saved_index, q, k=5).collect()]
        b = [(r["id"], round(r["score"], 9))
             for r in search(saved_index, q, k=5, fetch="spark").collect()]
        assert a == b and a, q
    qs = {"q1": "if", "q2": "getuser3"}
    a = [tuple(r) for r in search_many(saved_index, qs, k=5)
         .orderBy("query_id", "rank").collect()]
    b = [tuple(r) for r in search_many(saved_index, qs, k=5, fetch="spark")
         .orderBy("query_id", "rank").collect()]
    assert a == b and a


def test_batched_fetch_join_prunes_doc_stats(saved_index):
    """search_many's single id-resolution join must carry a doc_part
    partition filter (union of every query's hit parts) on the
    doc_stats scan — never a full metadata read."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    out = search_many(saved_index, {"q1": "if", "q2": "getuser1"}, k=5,
                      fetch="spark")
    plan = formatted_plan(out)
    ds_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    # the hit-part list prints as IN/INSET, or collapses to = when every
    # hit lands in ONE part (Catalyst simplifies a one-element IN) —
    # all three are the pruned scan this test demands
    assert ds_lines and any(
        "doc_part" in l and ("IN" in l or "=" in l) for l in ds_lines
    ), plan


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


def test_repo_filtered_query_prunes_doc_parts(spark, tmp_path_factory):
    """B17: a repo-scoped query must scan a strict subset of doc_part
    partitions (routing analog: elastic/client.go:162), and the filtered
    top-k must equal the full ranking restricted to that repo."""
    rows = [
        (f"r{r}_src/f{i}.py", f"if return getUser{i} alpha{r} beta{i % 5}",
         f"r{r}", f"src/f{i}.py", "Python")
        for r in range(4)
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows, "id string, content string, repo string, path string, lang string"
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=32)
    path = str(tmp_path_factory.mktemp("prunedidx"))
    idx.save(path)
    loaded = load_index(spark, path)

    n_parts_total = loaded.part_meta.count()
    pruned_parts = loaded.part_meta.filter(
        (F.col("repo_min") <= "r2") & (F.col("repo_max") >= "r2")
    ).count()
    assert 0 < pruned_parts < n_parts_total  # routing is selective

    # the static IN list reaches the partitioned postings scan
    scored = score_plan(loaded, "if alpha2", k=5, repo="r2", mode="bmw")
    splan = formatted_plan(scored)
    assert "PartitionFilters" in splan and "doc_part" in splan

    hits = search(loaded, "if alpha2", k=5, repo="r2", mode="bmw",
                  fetch="spark")
    # fetch phase (distributed fallback): the id-resolution join's
    # doc_stats scan must carry a doc_part partition filter (hit parts
    # only), never a full metadata scan — the ES fetch-from-hit-shards
    # analog (the default fetch goes further: driver-side point reads)
    plan = formatted_plan(hits)
    ds_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    # the hit-part list prints as IN/INSET, or collapses to = when every
    # hit lands in ONE part (Catalyst simplifies a one-element IN) —
    # all three are the pruned scan this test demands
    assert ds_lines and any(
        "doc_part" in l and ("IN" in l or "=" in l) for l in ds_lines
    ), plan
    assert "/doc_stats" in plan

    got = [(r["id"], round(r["score"], 6)) for r in hits.collect()]
    full = search(loaded, "if alpha2", k=1000).collect()
    want = [
        (r["id"], round(r["score"], 6)) for r in full if r["repo"] == "r2"
    ][:5]
    assert got == want


def test_lang_filtered_bmw_equals_exhaustive(spark):
    """Filtered BMW must be exact: bitmap-masked block-max pruning may
    not change the top-k or scores vs the exhaustive filtered kernel."""
    rows = [
        (f"d{i:03d}", f"if token{i % 11} return extra{i % 3}",
         f"repo{i % 2}", f"p{i}", "Python" if i % 3 else "Go")
        for i in range(150)
    ]
    docs = spark.createDataFrame(
        rows, "id string, content string, repo string, path string, lang string"
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=48)
    for q in ["if token3", "return extra1 token5", "if"]:
        a = [(r["id"], round(r["score"], 9))
             for r in search(idx, q, k=7, lang="Go", mode="bmw").collect()]
        b = [(r["id"], round(r["score"], 9))
             for r in search(idx, q, k=7, lang="Go", mode="exhaustive").collect()]
        assert a == b and len(a) > 0


def test_size_filter_is_pushed_to_parquet_scan(spark, tmp_path):
    """A3: with a stored size column, the 1 MiB cut reaches the scan as
    a pushed filter — no content bytes read to decide the skip
    (git/gitaly.go:243-247 skips the fetch on metadata the same way)."""
    from gitlab_elasticsearch_indexer_spark.operators.pipeline import filter_indexable

    p = str(tmp_path / "src")
    spark.createDataFrame(
        [(f"r_{i}", f"f{i}.py", "c" * 40, "Python", "if return " * i, 11 * i)
         for i in range(1, 50)],
        "repo string, path string, commit string, lang string, content string, size long",
    ).write.parquet(p)
    out = filter_indexable(spark.read.parquet(p))
    assert_pushed_filter(out, "size")
    assert out.count() == 49


def test_doc_store_point_lookup_pushes_id_filter(spark, tmp_path):
    """B19/_source store: a typed GET must reach the parquet scan as a
    pushed id filter over id-sorted files (row-group pruning path)."""
    from gitlab_elasticsearch_indexer_spark.sources import doc_store as ds

    docs = spark.createDataFrame(
        [(f"r1_f{i:04d}.py", "blob", f"body {i}") for i in range(500)],
        "id string, type string, content string",
    )
    path = str(tmp_path / "docidx")
    ds.save_documents(docs, path)
    got = ds.get_document(spark, path, "r1_f0042.py", "blob")
    assert_pushed_filter(got, "id")
    # and the constant-folded store_part predicate prunes partitions
    plan = formatted_plan(got)
    assert "PartitionFilters" in plan and "store_part" in plan
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["content"] == "body 42"


def test_doc_store_update_migrates_legacy_layout(spark, tmp_path):
    """A store written before the store_part layout existed must survive
    an incremental update via a one-time migration (not crash on the
    missing column), after which point lookups prune partitions."""
    from gitlab_elasticsearch_indexer_spark.sources import doc_store as ds

    path = str(tmp_path / "legidx")
    spark.createDataFrame(
        [("a", "A text"), ("b", "B text"), ("c", "C text")],
        "id string, content string",
    ).write.parquet(f"{path}/documents")  # legacy: no store_part

    ds.update_documents(
        spark, path,
        spark.createDataFrame([("b", "B v2")], "id string, content string"),
        delete_ids=spark.createDataFrame([("c",)], "id string"),
    )
    store = spark.read.parquet(f"{path}/documents")
    assert "store_part" in store.columns  # migrated
    out = {r["id"]: r["content"] for r in store.collect()}
    assert out == {"a": "A text", "b": "B v2"}
    got = ds.get_document(spark, path, "b").collect()
    assert len(got) == 1 and got[0]["content"] == "B v2"


def test_doc_store_update_touches_only_changed_partitions(spark, tmp_path):
    """Incremental _source maintenance: an update rewrites only the
    store partitions containing changed ids — untouched partition
    directories stay byte-identical — and typed GETs see the fold."""
    import hashlib
    import os

    from gitlab_elasticsearch_indexer_spark.sources import doc_store as ds

    docs = spark.createDataFrame(
        [(f"r1_f{i:04d}.py", "blob", f"body {i}") for i in range(400)],
        "id string, type string, content string",
    )
    path = str(tmp_path / "docinc")
    ds.save_documents(docs, path)

    def store_files():
        out = {}
        root = f"{path}/documents"
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        open(p, "rb").read()).hexdigest()
        return out

    before = store_files()
    ups = spark.createDataFrame(
        [("r1_f0042.py", "blob", "patched body"),
         ("r1_new.py", "blob", "brand new")],
        "id string, type string, content string",
    )
    dels = spark.createDataFrame([("r1_f0007.py",)], "id string")
    ds.update_documents(spark, path, ups, delete_ids=dels)
    after = store_files()

    touched = {
        int(r["p"]) for r in spark.createDataFrame(
            [("r1_f0042.py",), ("r1_new.py",), ("r1_f0007.py",)], "id string"
        ).select(ds._store_part(F.col("id")).alias("p")).collect()
    }
    untouched_b = {k: v for k, v in before.items()
                   if not any(k.startswith(f"store_part={t}") for t in touched)}
    untouched_a = {k: v for k, v in after.items()
                   if not any(k.startswith(f"store_part={t}") for t in touched)}
    assert untouched_b == untouched_a and untouched_b  # byte-identical

    assert ds.get_document(spark, path, "r1_f0042.py").collect()[0][
        "content"] == "patched body"
    assert ds.get_document(spark, path, "r1_new.py").count() == 1
    assert ds.get_document(spark, path, "r1_f0007.py").count() == 0
    assert ds.get_document(spark, path, "r1_f0100.py").collect()[0][
        "content"] == "body 100"


def test_build_save_unpersist_releases_all_caches(spark, tmp_path):
    """A build→save→unpersist cycle must leave no persisted RDDs behind
    (a long-lived query service would otherwise leak executor storage
    per build), and an update_index call must release its own persists."""
    from gitlab_elasticsearch_indexer_spark.operators import incremental as inc

    def cached_ids():
        # compare RDD-id SETS, not counts: Spark's ContextCleaner drops
        # earlier tests' unreferenced cached RDDs asynchronously, so a
        # global count can shift mid-test; only rdds NEW since `before`
        # are this test's responsibility
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    before = cached_ids()
    docs = spark.createDataFrame(
        [(f"d{i:03d}", f"if token{i % 5}", f"r{i % 2}", f"p{i}", "Go")
         for i in range(100)],
        "id string, content string, repo string, path string, lang string",
    )
    path = str(tmp_path / "cidx")
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=32)
    inc.save_versioned(idx, path, snapshot_id=0)
    assert cached_ids() - before  # build does cache (by design)
    idx.unpersist()
    assert not (cached_ids() - before)

    docs2 = docs.withColumn(
        "content", F.when(F.col("id") == "d000", F.lit("patched if"))
        .otherwise(F.col("content")))
    upd = inc.update_index(spark, path, docs2, snapshot_id=1)
    assert not (cached_ids() - before)  # update released its own persists
    assert upd.n_docs == 100


def test_versioned_load_reads_persisted_filter_sidecars(spark, tmp_path):
    """A filtered search on a load_versioned index must read the on-disk
    filters parquet (the ES doc-values analog) — not recompute bitmaps
    from doc_stats per query — and an incremental update must write
    sidecars for its rebuilt parts only."""
    import os

    from gitlab_elasticsearch_indexer_spark.operators import incremental as inc

    rows = [
        (f"r{r}_f{i}.py", f"if alpha{r} beta{i % 4}", f"r{r}", f"f{i}.py",
         "Python" if i % 2 else "Go")
        for r in range(3)
        for i in range(40)
    ]
    docs = spark.createDataFrame(
        rows, "id string, content string, repo string, path string, lang string"
    )
    path = str(tmp_path / "vidx")
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=32)
    inc.save_versioned(idx, path, snapshot_id=0)
    assert os.path.isdir(f"{path}/v0/filters")
    assert os.path.isdir(f"{path}/v0/part_meta")

    # incremental update: modify one repo's docs → v1 sidecars cover only
    # the rebuilt parts, the rest resolve to v0 through the manifest
    docs2 = docs.withColumn(
        "content",
        F.when(F.col("repo") == "r1", F.concat("content", F.lit(" patched")))
        .otherwise(F.col("content")),
    )
    upd = inc.update_index(spark, path, docs2, snapshot_id=1)
    v1_parts = {
        int(r["doc_part"])
        for r in spark.read.parquet(f"{path}/v1/filters")
        .select("doc_part").distinct().collect()
    }
    all_parts = {
        int(r["doc_part"])
        for r in upd.doc_stats.select("doc_part").distinct().collect()
    }
    assert v1_parts and v1_parts < all_parts  # strict subset: rebuilt only

    loaded = inc.load_versioned(spark, path)
    scored = score_plan(loaded, "if beta1", k=5, lang="Go", mode="bmw")
    plan = formatted_plan(scored)
    scan_locations = [l for l in plan.splitlines() if "Location" in l]
    assert any("/filters" in l for l in scan_locations), scan_locations

    # and the filtered result over the loaded index is still exact
    hits = search(loaded, "if beta1", k=5, lang="Go", mode="bmw")
    full = search(loaded, "if beta1", k=1000).collect()
    want = [(r["id"], round(r["score"], 9)) for r in full if r["lang"] == "Go"][:5]
    got = [(r["id"], round(r["score"], 9)) for r in hits.collect()]
    assert got == want and len(got) > 0


def test_combined_lang_and_repo_filter_is_exact(spark):
    """Both predicates together AND their bitmaps in the kernel — the
    combined-filter top-k must equal the full ranking restricted to
    docs satisfying both, under BMW and exhaustive alike."""
    rows = [
        (f"r{r}_f{i}.py", f"if alpha{r} beta{i % 4} gamma{i % 7}",
         f"r{r}", f"f{i}.py", "Python" if i % 2 else "Go")
        for r in range(3)
        for i in range(80)
    ]
    docs = spark.createDataFrame(
        rows, "id string, content string, repo string, path string, lang string"
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=64)
    full = search(idx, "if beta1", k=1000).collect()
    want = [
        (r["id"], round(r["score"], 9))
        for r in full
        if r["repo"] == "r1" and r["lang"] == "Go"
    ][:6]
    for mode in ("bmw", "exhaustive"):
        got = [
            (r["id"], round(r["score"], 9))
            for r in search(idx, "if beta1", k=6, lang="Go", repo="r1",
                            mode=mode).collect()
        ]
        assert got == want and len(got) > 0, mode


def test_facet_scan_is_column_pruned(spark, tmp_path_factory):
    """facet_counts must read docs_bin ONLY from postings (no tf/dl/
    block payloads) with the query terms pushed to the scan, and its
    output shuffle is the tiny (field,value,n) aggregate."""
    from gitlab_elasticsearch_indexer_spark.operators.query import facet_counts

    docs = spark.createDataFrame(
        [(f"r_{i:03d}", f"alpha beta{i % 3} gamma", f"L{i % 2}")
         for i in range(80)],
        "id string, content string, lang string",
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=32)
    path = str(tmp_path_factory.mktemp("facetidx"))
    idx.save(path)
    idx.unpersist()
    loaded = load_index(spark, path)

    fc = facet_counts(loaded, "alpha beta0", fields=("lang",))
    plan = formatted_plan(fc)
    post_reads = [
        l for l in plan.splitlines()
        if "ReadSchema" in l and "docs_bin" in l
    ]
    assert post_reads, plan
    for l in post_reads:
        assert "tfs_bin" not in l and "block_last" not in l, l
    assert_pushed_filter(fc, "In(term")


def test_metric_agg_scan_prunes_columns(saved_index):
    """dl_stats/dl_histogram read (term, docs_bin, dls_bin) ONLY from
    postings — no tf or block payloads — with the query terms pushed;
    dl rides the posting lists, so NO doc_stats join appears in the
    plan (nothing per-doc leaves a partition)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import dl_stats

    st = dl_stats(saved_index, "if return")
    plan = formatted_plan(st)
    reads = [l for l in plan.splitlines()
             if "ReadSchema" in l and "docs_bin" in l]
    assert reads, plan
    for l in reads:
        assert "dls_bin" in l, l
        assert "tfs_bin" not in l and "block_last" not in l, l
    assert_pushed_filter(st, "In(term")
    # no doc_stats scan: the only parquet reads are postings reads
    assert "doc_stats" not in plan, plan


def test_facet_dl_range_reads_dls_only_when_filtering(saved_index):
    """the facet/count scan stays docs_bin-only WITHOUT a dl range and
    adds ONLY dls_bin when one is present."""
    from gitlab_elasticsearch_indexer_spark.operators.query import facet_counts

    plain = formatted_plan(
        facet_counts(saved_index, "if", fields=(), include_total=True)
    )
    for l in plain.splitlines():
        if "ReadSchema" in l and "docs_bin" in l:
            assert "dls_bin" not in l, l
    ranged = formatted_plan(
        facet_counts(saved_index, "if", fields=(), include_total=True,
                     dl_range=(1, 100))
    )
    reads = [l for l in ranged.splitlines()
             if "ReadSchema" in l and "docs_bin" in l]
    assert reads and all("dls_bin" in l for l in reads), ranged
    for l in reads:
        assert "tfs_bin" not in l and "block_last" not in l, l


def test_phrase_scan_pushes_terms_and_matches_meta(spark, tmp_path_factory):
    """phrase_search's sidecar scan must push the phrase terms down;
    the persisted sidecar must round-trip pos_meta (analyzer + its own
    avgdl)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import phrase_search

    docs = spark.createDataFrame(
        [(f"r_{i:03d}", f"alpha beta gamma delta{i % 5}") for i in range(60)],
        "id string, content string",
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=32,
                      positions=True)
    path = str(tmp_path_factory.mktemp("phraseidx"))
    idx.save(path)
    idx.unpersist()
    loaded = load_index(spark, path)
    assert loaded.pos_analyzer == "simple"
    assert loaded.pos_avgdl == pytest.approx(idx.pos_avgdl)

    cand = loaded.pos_postings.filter(
        F.col("term").isin(["alpha", "beta"])
    ).select("doc_part", "term", "docs_bin", "cnt_bin", "dls_bin", "pos_bin")
    from gitlab_elasticsearch_indexer_spark.plans.checks import (
        assert_pushed_filter as apf,
    )

    apf(cand, "In(term")
    hits = phrase_search(loaded, "alpha beta", k=5)
    assert hits.count() == 5  # every doc contains the phrase; top-5 kept


def test_multifield_scan_pushes_terms_and_prunes_columns(spark, tmp_path_factory):
    """Multi-field scoring: every field's postings scan must receive its
    analyzed query terms as an In() pushdown and read only the scoring
    columns (no block-max sidecars on the exhaustive path)."""
    from gitlab_elasticsearch_indexer_spark.operators import (
        incremental as inc,
    )
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        multi_score_plan,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", f"if return tok{i % 5}", "r0", f"p/q/name_{i}.py", "py")
         for i in range(60)],
        "id string, content string, repo string, path string, lang string",
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=32,
                      fields={"file_name": "simple"})
    path = str(tmp_path_factory.mktemp("mfplan"))
    inc.save_versioned(idx, path, snapshot_id=0)
    idx.unpersist()
    loaded = inc.load_versioned(spark, path)

    scored = multi_score_plan(loaded, "name_3.py name_4.py if return",
                              fields=("content", "file_name"), k=5)
    plan = formatted_plan(scored)
    # each field's scan gets ITS analyzed terms pushed down
    assert plan.count("In(term") >= 2, plan
    assert "name_3.py" in plan, plan
    # no scan reads the block-max columns on this path
    import re

    for m in re.findall(r"ReadSchema: [^\n]*", plan):
        assert "block_last" not in m, m

    # and the result matches the in-memory index's (same corpus)
    mem = build_index(spark, docs, analyzer="simple", docs_per_part=32,
                      fields={"file_name": "simple"})
    try:
        from gitlab_elasticsearch_indexer_spark.operators.query import (
            multi_search,
        )

        a = [(r["id"], round(r["score"], 9)) for r in
             multi_search(loaded, "name_3.py if", k=5,
                          fields=("content", "file_name")).collect()]
        b = [(r["id"], round(r["score"], 9)) for r in
             multi_search(mem, "name_3.py if", k=5,
                          fields=("content", "file_name")).collect()]
        assert a == b and a
    finally:
        mem.unpersist()


def test_curation_pipeline_single_exchange_pruned_scan(spark):
    """The composite curation pipeline must stay one scan + ONE shuffle:
    both fingerprint windows (winner pick, copy count) share the same
    partitioning, and the corpus scan reads only (id, text)."""
    from gitlab_elasticsearch_indexer_spark.operators import training as tr

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = tr.curate_training_set(docs, min_quality=0.5,
                                 langs=["de", "en", "es", "fr"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "doc_id" in scan[0] and "text" in scan[0]
    assert "source" not in scan[0] and "n_chars" not in scan[0]


def test_mget_broadcasts_hits_and_pushes_ids(saved_index):
    """mget must stay a point plan: the id list reaches the doc_stats
    scan as a pushed In() filter and the bounded hit set broadcasts."""
    from gitlab_elasticsearch_indexer_spark.operators.query import mget

    out = mget(saved_index, ["r_001", "r_042", "nope"])
    plan = formatted_plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert_pushed_filter(out, "In(id")
    rows = {r["id"]: r["found"] for r in out.collect()}
    assert rows == {"r_001": True, "r_042": True, "nope": False}


@pytest.fixture(scope="module")
def meta_index(spark, tmp_path_factory):
    """An index whose docs carry the keyword metadata (repo/path/lang)
    the match_all surfaces filter and sort on."""
    docs = spark.createDataFrame(
        [(f"r_{i:03d}", f"if return getUser{i} token{i % 7}",
          f"repo{i % 3}", f"p/{i}.py", "Python") for i in range(200)],
        "id string, content string, repo string, path string, lang string",
    )
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=64)
    path = str(tmp_path_factory.mktemp("metaidx"))
    idx.save(path)
    return load_index(spark, path)


def test_match_all_browse_plan_is_native(meta_index):
    """The no-must_not match_all browse must be PURE Catalyst: the
    doc_stats scan carries the pushed keyword/range predicates and the
    routing PartitionFilters, the sort executes as TakeOrderedAndProject
    (per-partition top-k + driver merge — the ES sorted-search shard
    plan), and NO Python evaluation appears anywhere."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        match_all_sorted_plan,
    )

    out = match_all_sorted_plan(meta_index, sort="dl", ascending=False,
                                n=10, repo="repo1", dl_range=(1, 500))
    plan = formatted_plan(out)
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan and "FlatMapCoGroups" not in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and any("EqualTo(repo,repo1)" in l for l in pushed), plan
    assert any("GreaterThanOrEqual(dl,1)" in l for l in pushed), plan
    parts = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert parts and any("doc_part" in l and "IN" in l for l in parts), plan


def test_match_all_agg_plans_are_native(meta_index):
    """match_all facets / stats / histogram without must_not must stay
    JVM-side: native groupBy over the filtered doc_stats scan, no
    postings relation, no Python kernels."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        dl_histogram,
        facet_counts,
    )

    for out in (
        facet_counts(meta_index, None, fields=("lang",), repo="repo2",
                     include_total=True),
        dl_histogram(meta_index, None, 16, lang="Python"),
    ):
        plan = formatted_plan(out)
        assert "EvalPython" not in plan and "FlatMapCoGroups" not in plan
        assert "postings" not in plan  # doc_stats only
        assert "HashAggregate" in plan


def test_match_all_must_not_plan_is_bounded(meta_index):
    """The must_not kernel path must prune the postings scan to ONLY the
    excluded terms (pushed In) — never a full postings read, never an
    anti-join shuffle of per-doc rows."""
    from gitlab_elasticsearch_indexer_spark.operators.query import facet_counts

    out = facet_counts(meta_index, None, fields=("lang",), must_not="if")
    plan = formatted_plan(out)
    post = [l for l in plan.splitlines()
            if "PushedFilters" in l and "term" in l]
    assert post and any("In(term" in l or "EqualTo(term,if)" in l
                        for l in post), plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_significant_terms_plan_prunes_and_broadcasts(saved_index):
    """significant_terms: the sampler MUST reach the postings scan as a
    doc_part PartitionFilter (cost ∝ sampled parts at any corpus size),
    and the matched-total sentinel must rejoin by broadcast — the
    term_stats join never broadcasts the big postings side."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        significant_terms,
    )

    sig = significant_terms(saved_index, "if getuser1", size=5,
                            sample_parts=2)
    plan = formatted_plan(sig)
    parts = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("doc_part" in l and
               ("(0,1)" in l.replace(" ", "") or "IN (0,1)" in l or
                "in(0,1)" in l.replace(" ", "").lower())
               for l in parts), parts
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_suggest_scan_pushes_prefix(saved_index):
    """The suggester's vocabulary neighborhood scan pushes the
    prefix_length StartsWith to the term_stats parquet scan (the same
    row-group pruning path as the fuzzy rewrite); the Levenshtein
    predicate stays JVM-side (codegen), never Python."""
    from functools import reduce

    # replicate the exact filter suggest_terms builds (its result is
    # eagerly resolved, so assert the scan shape on the plan directly)
    t = "getuser1"
    cond = (
        (F.length("term") >= len(t) - 2) & (F.length("term") <= len(t) + 2)
        & F.col("term").startswith(t[:1])
        & (F.levenshtein(F.col("term"), F.lit(t)) <= 2)
    )
    scan = saved_index.term_stats.filter(cond).select("term", "df")
    plan = assert_pushed_filter(scan, "StartsWith(term")
    assert "levenshtein" in plan  # evaluated in the scan's codegen span


def test_grouped_search_rows_out_bounded(saved_index):
    """grouped_search: the scored relation leaving the partitions is
    (value, doc_idx, score) rows — assert the term pushdown rides the
    postings scan and the result matches the flat search's winners
    when every doc is its own group value (id-free sanity)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        grouped_search,
        search,
    )

    # saved_index has no lang/repo variety, so group by repo must
    # still work when the sidecar holds a single value
    hits = grouped_search(saved_index, "if getuser1", by="repo",
                          k_per_group=3, groups=5)
    rows = hits.collect()
    flat = search(saved_index, "if getuser1", k=3).collect()
    assert [(r["id"], round(r["score"], 9)) for r in rows] == \
        [(r["id"], round(r["score"], 9)) for r in flat]
