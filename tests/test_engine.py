"""End-to-end: fixtures → pipeline → index → query, rank-identical to the
pure-Python oracle (SURVEY.md §5 'rank-identity check')."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.fixtures import generate_source_files
from gitlab_elasticsearch_indexer_spark.operators.index_build import (
    assign_doc_ids,
    build_index,
)
from gitlab_elasticsearch_indexer_spark.operators.pipeline import (
    filter_indexable,
    run_blob_pipeline,
)
from gitlab_elasticsearch_indexer_spark.operators.query import get_by_id, search
from gitlab_elasticsearch_indexer_spark.oracle import build_oracle_index

N_FILES = 250


@pytest.fixture(scope="session")
def corpus(spark):
    return generate_source_files(spark, n_files=N_FILES, n_repos=8).persist()


@pytest.fixture(scope="session")
def documents(spark, corpus):
    return run_blob_pipeline(spark, corpus).persist()


@pytest.fixture(scope="session")
def index(spark, documents):
    return build_index(
        spark,
        documents.select("id", F.col("content"), F.col("rid").alias("repo"),
                         "path", F.col("language").alias("lang")),
        analyzer="code",
        docs_per_part=64,  # force multiple doc partitions
    )


@pytest.fixture(scope="session")
def oracle(documents):
    rows = [
        {"doc_id": r["id"], "content": r["content"], "lang": r["language"],
         "repo": r["rid"]}
        for r in documents.collect()
    ]
    return build_oracle_index(rows, analyzer="code")


# --- pipeline (Family A) ---------------------------------------------------


def test_skip_rules(spark, corpus):
    kept = filter_indexable(corpus)
    paths = {r["path"] for r in kept.select("path").collect()}
    assert "bin/early_nul.dat" not in paths  # NUL in first 8 KiB → skipped
    assert "bin/late_nul.dat" in paths       # NUL after 8 KiB → kept
    assert "big/huge.txt" not in paths       # > 1 MiB → skipped
    assert "files/empty" in paths            # empty file → kept


def test_submodule_mode_filter(spark):
    """A4: gitlink entries (mode 0160000) drop when a mode column exists
    (git/gitaly.go:147-149); regular file modes survive."""
    rows = [
        ("r1", "vendor/dep", "c1", "", "", 0o160000),
        ("r1", "src/a.py", "c1", "Python", "x = 1", 0o100644),
        ("r1", "bin/run", "c1", "Shell", "#!/bin/sh", 0o100755),
        ("r1", "src/nomode.py", "c1", "Python", "y = 2", None),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, mode long")
    kept = {r["path"] for r in filter_indexable(df).select("path").collect()}
    # NULL mode = unknown, must be kept (only a known gitlink mode drops)
    assert kept == {"src/a.py", "bin/run", "src/nomode.py"}


def test_blob_document_shape_and_upsert(documents):
    cols = set(documents.columns)
    assert cols == {"type", "id", "oid", "rid", "commit_sha", "content",
                    "path", "file_name", "language"}
    dup = documents.filter(F.col("id") == "repo-003_dup/same.py").collect()
    assert len(dup) == 1  # last-write-wins upsert per id


def test_sha256_invariant(spark, corpus, documents):
    """BASELINE.json input_hint: per-row content sha256 equality vs source."""
    src = filter_indexable(corpus).select(
        F.concat("repo", F.lit("_"), "path").alias("id"),
        F.col("commit").alias("commit_sha"),
        F.sha2("content", 256).alias("src_sha"),
    )
    joined = documents.select("id", "commit_sha", F.col("oid").alias("doc_sha")).join(
        src, ["id", "commit_sha"]
    )
    assert joined.count() == documents.count()  # every doc traces to a source row
    bad = joined.filter(F.col("src_sha") != F.col("doc_sha")).count()
    assert bad == 0


def test_doc_ids_deterministic_across_parallelism(spark, documents):
    a = assign_doc_ids(documents.select("id", "content"), num_ranges=2)
    b = assign_doc_ids(documents.select("id", "content"), num_ranges=7)
    da = {r["id"]: r["doc_idx"] for r in a.select("id", "doc_idx").collect()}
    db = {r["id"]: r["doc_idx"] for r in b.select("id", "doc_idx").collect()}
    assert da == db
    assert sorted(da.values()) == list(range(len(da)))


# --- index + query (Family B) ----------------------------------------------

QUERIES = [
    # (query, k, lang, repo) — classes from FIXTURES.md §4
    ("if", 10, None, None),                # hot skew term
    ("return", 10, None, None),
    ("getUserById", 10, None, None),       # camelCase whole-token
    ("user", 10, None, None),              # split part of camelCase ids
    ("getu", 10, None, None),              # prefix >=2 → edgeNGram
    ("if return def", 10, None, None),     # multi-term
    ("getUser scoreIndex", 15, None, None),
    ("zzz_no_such_term", 10, None, None),  # zero-hit
    ("if", 10, "Python", None),            # keyword filter lang
    ("return", 10, None, "repo-003"),      # routing filter repo
    ("IF", 10, None, None),                # lowercase at search time
]


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_rank_identity_vs_oracle(spark, index, oracle, mode):
    for query, k, lang, repo in QUERIES:
        if mode == "bmw" and (lang or repo):
            continue  # BMW path is for unfiltered queries
        got = search(index, query, k=k, lang=lang, repo=repo, mode=mode)
        got_rows = [(r["id"], r["score"]) for r in got.collect()]
        exp = oracle.search(query, k=k, lang=lang, repo=repo)
        assert [g[0] for g in got_rows] == [e[0] for e in exp], (
            f"{mode} {query!r}: {got_rows} != {exp}"
        )
        assert np.allclose([g[1] for g in got_rows], [e[1] for e in exp],
                           rtol=1e-9, atol=1e-12), (query, got_rows, exp)


BOOL_QUERIES = [
    # (query, operator, must_not, lang) — ES bool must / must_not shapes
    ("get user if", "and", None, None),
    ("return self", "and", None, None),
    ("getUser scoreIndex", "and", None, None),   # code-analyzer capture
    ("def return", "and", "user", None),         # AND + exclusion
    ("get user", "or", "if", None),              # OR + exclusion
    ("get user", "or", "if return", None),       # multi-term exclusion
    ("if", "or", "if", None),                    # `foo -foo` ⇒ empty
    ("if user", "or", "if", None),               # OR drops excluded clause
    ("if return", "and", "return", None),        # required AND excluded ⇒ ∅
    ("get zzz_no_such_term", "and", None, None),  # dead required term ⇒ ∅
    ("get user if", "and", None, "Python"),      # AND + keyword filter
]


def test_bool_rank_identity_vs_oracle(spark, index, oracle):
    """operator='and' / must_not match the brute-force oracle rank- and
    score-identically (the bool must / must_not ES shapes)."""
    for query, op, neg, lang in BOOL_QUERIES:
        got = [(r["id"], r["score"]) for r in
               search(index, query, k=12, operator=op, must_not=neg,
                      lang=lang).collect()]
        exp = oracle.search(query, k=12, operator=op, must_not=neg, lang=lang)
        assert [g[0] for g in got] == [e[0] for e in exp], (query, op, neg)
        assert np.allclose([g[1] for g in got], [e[1] for e in exp],
                           rtol=1e-9, atol=1e-12), (query, op, neg)


def test_bool_search_many_matches_single(index, oracle):
    """Batched operator/must_not entries return exactly the single-query
    results (shared-decode kernel parity)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    batch = {
        f"q{i}": {"q": q, "operator": op, **({"must_not": neg} if neg else {}),
                  **({"lang": lang} if lang else {})}
        for i, (q, op, neg, lang) in enumerate(BOOL_QUERIES)
    }
    rows = search_many(index, batch, k=12).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for i, (q, op, neg, lang) in enumerate(BOOL_QUERIES):
        exp = [(j + 1, d, s) for j, (d, s) in enumerate(
            oracle.search(q, k=12, operator=op, must_not=neg, lang=lang))]
        got = sorted(by_q.get(f"q{i}", []))
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in exp], (
            q, op, neg)
        assert np.allclose([s for *_, s in got], [s for *_, s in exp],
                           rtol=1e-9, atol=1e-12)


MSM_QUERIES = [
    # (query, msm, must_not, lang) — ES minimum_should_match shapes
    ("get user if", 2, None, None),
    ("get user if return", 3, None, None),
    ("get user if", 2, "return", None),       # msm + exclusion
    ("get user if", 2, None, "Python"),       # msm + keyword filter
    ("get user if", 3, None, None),           # msm == distinct terms ≡ AND
    ("get user zzz_no_such_term", 2, None, None),  # dead term still a clause
    ("if user", 5, None, None),               # msm > clauses ⇒ empty
]


def test_minimum_should_match_rank_identity(spark, index, oracle):
    """ES minimum_should_match: hits match ≥ N distinct analyzed terms,
    rank- and score-identical to the brute-force referee; composes with
    must_not and keyword filters."""
    for query, m, neg, lang in MSM_QUERIES:
        got = [(r["id"], r["score"]) for r in
               search(index, query, k=12, minimum_should_match=m,
                      must_not=neg, lang=lang).collect()]
        exp = oracle.search(query, k=12, minimum_should_match=m,
                            must_not=neg, lang=lang)
        assert [g[0] for g in got] == [e[0] for e in exp], (query, m, neg)
        assert np.allclose([g[1] for g in got], [e[1] for e in exp],
                           rtol=1e-9, atol=1e-12), (query, m, neg)
    # sanity: the msm=2 constraint actually bites on this corpus
    loose = oracle.search("get user if", k=10**6)
    tight = oracle.search("get user if", k=10**6, minimum_should_match=2)
    assert 0 < len(tight) < len(loose)


def test_minimum_should_match_batch_and_count(index, oracle):
    """Batched msm entries match the singles; _count/facets stay
    consistent with the msm match set."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        match_count,
        search_many,
    )

    batch = {
        f"q{i}": {"q": qs, "minimum_should_match": m,
                  **({"must_not": neg} if neg else {}),
                  **({"lang": lang} if lang else {})}
        for i, (qs, m, neg, lang) in enumerate(MSM_QUERIES)
    }
    rows = search_many(index, batch, k=12).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["score"]))
    for i, (qs, m, neg, lang) in enumerate(MSM_QUERIES):
        exp = oracle.search(qs, k=12, minimum_should_match=m,
                            must_not=neg, lang=lang)
        got = sorted(by_q.get(f"q{i}", []))
        assert [d for _, d, _ in got] == [d for d, _ in exp], (qs, m)
        assert np.allclose([s for *_, s in got], [s for _, s in exp],
                           rtol=1e-9, atol=1e-12)

    n = match_count(index, "get user if", minimum_should_match=2)
    exp_n = len(oracle.search("get user if", k=10**6,
                              minimum_should_match=2))
    assert n == exp_n and n > 0
    assert match_count(index, "if user", minimum_should_match=5) == 0


def test_minimum_should_match_validation(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    with pytest.raises(ValueError, match="minimum_should_match"):
        search(index, "get user", operator="and", minimum_should_match=2)
    with pytest.raises(ValueError, match=">= 0"):
        search(index, "get user", minimum_should_match=-1)
    with pytest.raises(ValueError, match="single-field"):
        search(index, "get user", fields=("file_name",),
               minimum_should_match=2)
    with pytest.raises(ValueError, match="plain term"):
        search_many(index, {"a": {"q": "get user", "phrase": True,
                                  "minimum_should_match": 2}})
    with pytest.raises(ValueError, match="operator"):
        search_many(index, {"a": {"q": "get user", "operator": "and",
                                  "minimum_should_match": 2}})


AGG_QUERIES = [
    # (query, operator, must_not, msm, lang)
    ("get user", "or", None, 0, None),
    ("get user if", "or", None, 2, None),       # msm-consistent aggs
    ("def return", "and", None, 0, None),       # bool must
    ("get user", "or", "if", 0, "Python"),      # exclusion + filter
    ("if", "or", None, 0, None),                # hot term, wide match set
    ("zzz_no_such_term", "or", None, 0, None),  # zero matches
]


def test_dl_stats_and_histogram_match_referee(index, oracle):
    """ES stats/histogram aggregations over dl: partials aggregate ALL
    matching docs (not top-k) under every bool shape, matching the
    brute-force referee's match set exactly."""
    from collections import Counter

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        dl_histogram,
        dl_stats,
    )

    for query, op, neg, msm, lang in AGG_QUERIES:
        hits = oracle.search(query, k=10**6, operator=op, must_not=neg,
                             minimum_should_match=msm, lang=lang)
        dls = [oracle.dls[d] for d, _ in hits]
        row = dl_stats(index, query, operator=op, must_not=neg,
                       minimum_should_match=msm, lang=lang).collect()[0]
        if not dls:
            assert row["count"] == 0
            assert row["min_dl"] is None and row["avg_dl"] is None
        else:
            assert row["count"] == len(dls), (query, op)
            assert row["sum_dl"] == sum(dls)
            assert row["min_dl"] == min(dls)
            assert row["max_dl"] == max(dls)
            assert abs(row["avg_dl"] - sum(dls) / len(dls)) < 1e-9
        got = {int(r["bucket"]): int(r["n"]) for r in
               dl_histogram(index, query, 10, operator=op, must_not=neg,
                            minimum_should_match=msm, lang=lang).collect()}
        exp = Counter((dl // 10) * 10 for dl in dls)
        assert got == dict(exp), (query, op, neg)
    # the wide match set actually exercises multi-part partials
    assert len(oracle.search("if", k=10**6)) > 64  # > docs_per_part


def test_dl_agg_validation(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        dl_histogram,
        dl_stats,
    )

    with pytest.raises(ValueError, match="interval"):
        dl_histogram(index, "if", 0)
    with pytest.raises(ValueError, match="minimum_should_match"):
        dl_stats(index, "if user", operator="and", minimum_should_match=2)
    with pytest.raises(ValueError, match="operator"):
        dl_stats(index, "if", operator="nor")


def _brute_mlt(oracle, doc_id, k, mqt, mtf, mdf, lang=None):
    """Brute-force more_like_this referee: tf·idf term selection over
    the doc's term vector, then equal-weight bool-should BM25 excluding
    the source doc."""
    from gitlab_elasticsearch_indexer_spark.oracle import B, K1

    tv = {t: pl[doc_id] for t, pl in oracle.postings.items()
          if doc_id in pl}
    cands = [(tf * oracle.idf(t), t) for t, tf in tv.items()
             if tf >= mtf and len(oracle.postings[t]) >= mdf]
    cands.sort(key=lambda x: (-x[0], x[1]))
    sel = [t for _, t in cands[:mqt]]
    avgdl = oracle.avgdl
    scores: dict[str, float] = {}
    for t in sel:
        idf = oracle.idf(t)
        for d, tf in oracle.postings[t].items():
            if d == doc_id:
                continue
            dl = oracle.dls[d]
            tfn = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + idf * tfn
    hits = [(d, s) for d, s in scores.items()
            if lang is None or oracle.meta[d].get("lang") == lang]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def test_more_like_this_matches_referee(index, oracle, documents):
    """ES more_like_this: tf·idf term selection + equal-weight
    bool-should BM25, source doc excluded — rank- and score-identical
    to the brute-force referee across param shapes."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        more_like_this,
        term_vector,
    )

    doc_ids = [r["id"] for r in
               documents.select("id").orderBy("id").limit(3).collect()]
    shapes = [(25, 1, 1, None), (5, 1, 2, None), (10, 2, 1, None),
              (25, 1, 1, "Python")]
    for doc_id in doc_ids:
        # the term vector itself matches the referee's postings view
        tv = term_vector(index, doc_id)
        exp_tv = sorted((t, pl[doc_id])
                        for t, pl in oracle.postings.items()
                        if doc_id in pl)
        assert tv == exp_tv, doc_id
        for mqt, mtf, mdf, lang in shapes:
            got = [(r["id"], r["score"]) for r in
                   more_like_this(index, doc_id, k=10, max_query_terms=mqt,
                                  min_term_freq=mtf, min_doc_freq=mdf,
                                  lang=lang).collect()]
            exp = _brute_mlt(oracle, doc_id, 10, mqt, mtf, mdf, lang=lang)
            assert [g[0] for g in got] == [e[0] for e in exp], (
                doc_id, mqt, mtf, mdf, lang)
            assert np.allclose([g[1] for g in got], [e[1] for e in exp],
                               rtol=1e-9, atol=1e-12)
            assert doc_id not in [g[0] for g in got]  # include: false


def test_more_like_this_validation(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        more_like_this,
        term_vector,
    )

    with pytest.raises(ValueError, match="not found"):
        term_vector(index, "no_such_doc")
    with pytest.raises(ValueError, match="max_query_terms"):
        more_like_this(index, "x", max_query_terms=0)
    # a doc whose every term is too rare for min_doc_freq → no hits
    from gitlab_elasticsearch_indexer_spark.operators.query import search

    assert more_like_this(
        index, search(index, "if", k=1).collect()[0]["id"],
        min_doc_freq=10**9,
    ).count() == 0


SORT_SHAPES = [
    # (query, sort, ascending, extra-kwargs)
    ("get user", "path", True, {}),
    ("get user", "path", False, {}),
    ("if", "dl", False, {}),                       # hot term, numeric desc
    ("if", "dl", True, {"lang": "Python"}),
    ("def return", "id", True, {"operator": "and"}),
    ("get user if", "repo", False, {"minimum_should_match": 2}),
    ("get user", "lang", True, {"must_not": "if"}),
    ("zzz_no_such_term", "path", True, {}),
]


def _brute_sorted(oracle, paths, query, sort, asc, k, offset=0, **kw):
    hits = oracle.search(query, k=10**6, **kw)
    docs = [d for d, _ in hits]

    def keyf(d):
        return {"id": d, "repo": oracle.meta[d].get("repo") or "",
                "lang": oracle.meta[d].get("lang") or "",
                "path": paths[d], "dl": oracle.dls[d]}[sort]

    if asc:
        docs.sort(key=lambda d: (keyf(d), d))
    else:
        docs.sort()
        docs.sort(key=keyf, reverse=True)
    return [(d, oracle.meta[d].get("repo"), paths[d],
             oracle.meta[d].get("lang"), oracle.dls[d])
            for d in docs[offset:offset + k]]


def test_sort_search_matches_referee(index, oracle, documents):
    """ES sort clause: field-ordered top-k (no scores) matches the
    brute-force referee across keyword/numeric fields, both directions,
    and every bool shape; each doc partition returns only its own top-k
    by the key (the ES sorted-search shard plan)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import sort_search

    paths = {r["id"]: r["path"] for r in
             documents.select("id", "path").collect()}
    for query, sort, asc, kw in SORT_SHAPES:
        got = [(r["id"], r["repo"], r["path"], r["lang"], r["dl"])
               for r in sort_search(index, query, sort=sort, ascending=asc,
                                    k=12, **kw).collect()]
        exp = _brute_sorted(oracle, paths, query, sort, asc, 12, **kw)
        assert got == exp, (query, sort, asc, kw)


def test_sort_search_paging(index, oracle, documents):
    """offset and search_after page the sorted order exactly."""
    from gitlab_elasticsearch_indexer_spark.operators.query import sort_search

    full = [(r["id"], r["path"]) for r in
            sort_search(index, "get user", sort="path", k=30).collect()]
    off = [(r["id"], r["path"]) for r in
           sort_search(index, "get user", sort="path", k=5,
                       offset=5).collect()]
    assert off == full[5:10]
    # cursor paging: (sort_value, id) of the last hit seeds page 2
    p1 = sort_search(index, "get user", sort="path", k=5).collect()
    cur = (p1[-1]["path"], p1[-1]["id"])
    p2 = [(r["id"], r["path"]) for r in
          sort_search(index, "get user", sort="path", k=5,
                      search_after=cur).collect()]
    assert p2 == full[5:10]
    # numeric desc cursor
    fdl = [(r["id"], r["dl"]) for r in
           sort_search(index, "if", sort="dl", ascending=False,
                       k=40).collect()]
    p1 = sort_search(index, "if", sort="dl", ascending=False, k=7).collect()
    cur = (int(p1[-1]["dl"]), p1[-1]["id"])
    p2 = [(r["id"], r["dl"]) for r in
          sort_search(index, "if", sort="dl", ascending=False, k=7,
                      search_after=cur).collect()]
    assert p2 == fdl[7:14]


def test_sort_search_validation(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import sort_search

    with pytest.raises(ValueError, match="sort must be"):
        sort_search(index, "if", sort="score")
    with pytest.raises(ValueError, match="mutually exclusive"):
        sort_search(index, "if", offset=3, search_after=("a", "b"))
    with pytest.raises(ValueError, match="minimum_should_match"):
        sort_search(index, "if user", operator="and",
                    minimum_should_match=2)


def test_dl_range_filter_matches_referee(index, oracle):
    """ES range filter over dl: hits restricted to lo <= dl <= hi,
    rank/score-identical to the referee, composing with every bool
    knob, BMW, aggregations, counts, and the batched path."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        dl_stats,
        match_count,
        search_many,
    )

    dls = sorted(oracle.dls.values())
    lo, hi = dls[len(dls) // 4], dls[3 * len(dls) // 4]
    shapes = [
        ("if", (lo, hi), {}),
        ("if", (lo, hi), {"mode": "bmw"}),
        ("get user", (None, hi), {"lang": "Python"}),
        ("def return", (lo, None), {"operator": "and"}),
        ("get user if", (lo, hi), {"minimum_should_match": 2}),
        ("get user", (lo, hi), {"must_not": "if"}),
        ("if", (hi + 10**6, None), {}),  # empty band
    ]
    for query, rng, kw in shapes:
        mode = kw.pop("mode", "exhaustive")
        got = [(r["id"], r["score"]) for r in
               search(index, query, k=12, dl_range=rng, mode=mode,
                      **kw).collect()]
        exp = oracle.search(query, k=12, dl_range=rng, **kw)
        assert [g[0] for g in got] == [e[0] for e in exp], (query, rng, kw)
        assert np.allclose([g[1] for g in got], [e[1] for e in exp],
                           rtol=1e-9, atol=1e-12)
        kw["mode"] = mode
    # the band actually bites
    assert len(oracle.search("if", k=10**6, dl_range=(lo, hi))) not in (
        0, len(oracle.search("if", k=10**6)))

    # batch parity
    rows = search_many(index, {"r": {"q": "if", "dl_range": [lo, hi]}},
                       k=12).collect()
    got = [(r["id"], r["score"]) for r in sorted(rows, key=lambda r: r["rank"])]
    exp = oracle.search("if", k=12, dl_range=(lo, hi))
    assert [g[0] for g in got] == [e[0] for e in exp]
    assert np.allclose([g[1] for g in got], [e[1] for e in exp], rtol=1e-9)

    # count + stats consistency with the filtered match set
    exp_set = oracle.search("if", k=10**6, dl_range=(lo, hi))
    assert match_count(index, "if", dl_range=(lo, hi)) == len(exp_set)
    srow = dl_stats(index, "if", dl_range=(lo, hi)).collect()[0]
    band = [oracle.dls[d] for d, _ in exp_set]
    assert srow["count"] == len(band) and srow["sum_dl"] == sum(band)
    assert srow["min_dl"] >= lo and srow["max_dl"] <= hi

    with pytest.raises(ValueError, match="dl_range"):
        search(index, "if", dl_range=(10, 5))


def test_search_many_sorted_entries_match_single(index):
    """Sorted msearch bodies (ES sort in _msearch): every sorted entry
    reproduces sort_search exactly — mixed with scored entries, bool
    knobs, filters, from, and the (sort_value, id) cursor; scores are
    NULL for sorted hits as in ES."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        search_many,
        sort_search,
    )

    p1 = sort_search(index, "get user", sort="path", k=4).collect()
    cur = [p1[-1]["path"], p1[-1]["id"]]
    qs = {
        "s0": {"q": "get user", "sort": "path"},
        "s1": {"q": "if", "sort": "dl:desc", "lang": "Python"},
        "s2": {"q": "def return", "sort": "id", "operator": "and"},
        "s3": {"q": "get user if", "sort": "repo:desc",
               "minimum_should_match": 2},
        "s4": {"q": "get user", "sort": "path", "from": 3},
        "s5": {"q": "get user", "sort": "path", "search_after": cur},
        "s6": {"q": "zzz_nope", "sort": "path"},
        "t0": "get user",  # a scored entry shares the batch
    }
    rows = search_many(index, qs, k=4).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    singles = {
        "s0": sort_search(index, "get user", sort="path", k=4),
        "s1": sort_search(index, "if", sort="dl", ascending=False, k=4,
                          lang="Python"),
        "s2": sort_search(index, "def return", sort="id", k=4,
                          operator="and"),
        "s3": sort_search(index, "get user if", sort="repo",
                          ascending=False, k=4, minimum_should_match=2),
        "s4": sort_search(index, "get user", sort="path", k=4, offset=3),
        "s5": sort_search(index, "get user", sort="path", k=4,
                          search_after=(cur[0], cur[1])),
        "s6": sort_search(index, "zzz_nope", sort="path", k=4),
    }
    for qid, single in singles.items():
        exp_ids = [r["id"] for r in single.collect()]
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["id"] for r in got] == exp_ids, (qid, got, exp_ids)
        assert all(r["score"] is None for r in got), qid
        off = qs[qid].get("from", 0) if isinstance(qs[qid], dict) else 0
        assert [r["rank"] for r in got] == list(
            range(off + 1, off + 1 + len(exp_ids)))
    # the scored entry is unaffected
    from gitlab_elasticsearch_indexer_spark.operators.query import search

    exp = [(r["id"], round(r["score"], 9)) for r in
           search(index, "get user", k=4).collect()]
    got = sorted(by_q["t0"], key=lambda r: r["rank"])
    assert [(r["id"], round(r["score"], 9)) for r in got] == exp

    with pytest.raises(ValueError, match="sort"):
        search_many(index, {"a": {"q": "if", "sort": "path",
                                  "phrase": True}})
    with pytest.raises(ValueError, match="sort must be"):
        search_many(index, {"a": {"q": "if", "sort": "score"}})


def test_bool_validation_errors(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    with pytest.raises(ValueError, match="operator"):
        search(index, "if", operator="xor")
    with pytest.raises(ValueError, match="single-field"):
        search(index, "if", operator="and", fields=("file_name",))
    with pytest.raises(ValueError, match="operator"):
        search_many(index, {"a": {"q": "if", "operator": "nand"}})
    with pytest.raises(ValueError, match="plain term"):
        search_many(index, {"a": {"q": "if", "operator": "and",
                                  "phrase": True}})
    with pytest.raises(ValueError, match="plain term"):
        search_many(index, {"a": {"q": "if", "must_not": "x",
                                  "fields": ["file_name"]}})


@pytest.mark.parametrize("mode,extra", [
    ("exhaustive", {}),
    ("bmw", {}),
    ("exhaustive", {"operator": "and"}),
    ("bmw", {"must_not": "return"}),
])
def test_search_after_pages_match_full_ranking(index, mode, extra):
    """ES search_after: paging by cursor reproduces the full ranking
    exactly (ids AND float64 scores) across kernels — each page costs
    O(k) at any depth, unlike offset paging."""
    full = [(r["id"], r["score"]) for r in
            search(index, "get user if", k=30, mode=mode, **extra).collect()]
    paged: list = []
    cursor = None
    while len(paged) < len(full):
        page = [(r["id"], r["score"]) for r in
                search(index, "get user if", k=5, mode=mode,
                       search_after=cursor, **extra).collect()]
        if not page:
            break
        paged.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert paged[:len(full)] == full
    assert len(paged) >= len(full)


def test_search_after_batch_is_self_consistent(index):
    """Batched search_after entries page the batch ranking exactly
    (cursor ids resolve in one shared lookup)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    def batch_page(spec, k):
        out = search_many(index, {"x": spec}, k=k).collect()
        return [(r["id"], r["score"])
                for r in sorted(out, key=lambda r: r["rank"])]

    full = batch_page({"q": "get user if"}, 30)
    paged: list = []
    cursor = None
    while len(paged) < len(full):
        spec = {"q": "get user if"}
        if cursor:
            spec["search_after"] = [cursor[1], cursor[0]]
        page = batch_page(spec, 5)
        if not page:
            break
        paged.extend(page)
        cursor = page[-1]
    assert paged[:len(full)] == full
    assert len(paged) >= len(full)


def test_explain_reproduces_search_score(index, oracle):
    """ES _explain analog: per-term contributions sum EXACTLY to the
    doc's search score, and per-clause tf/dl/idf match the oracle."""
    from gitlab_elasticsearch_indexer_spark.operators.query import explain

    hits = [(r["id"], r["score"]) for r in
            search(index, "get user if", k=3).collect()]
    for doc_id, score in hits:
        rows = explain(index, "get user if", doc_id).collect()
        total = float(np.sum(np.array([r["contribution"] for r in rows])))
        assert total == pytest.approx(score, rel=1e-12)
        for r in rows:
            assert r["tf"] == oracle.postings[r["term"]][doc_id]
            assert r["dl"] == oracle.dls[doc_id]
            assert r["idf"] == pytest.approx(oracle.idf(r["term"]), rel=1e-12)

    # a doc matching only some query terms emits only those clauses
    some = search(index, "get zzz_no_such_term", k=1).collect()
    rows = explain(index, "get zzz_no_such_term", some[0]["id"]).collect()
    assert [r["term"] for r in rows] == ["get"]

    with pytest.raises(ValueError, match="not found"):
        explain(index, "get", "zz_missing_doc")


def test_search_after_validation_errors(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    with pytest.raises(ValueError, match="mutually exclusive"):
        search(index, "if", k=5, offset=5, search_after=(1.0, "x"))
    with pytest.raises(ValueError, match="not found"):
        search(index, "if", k=5, search_after=(1.0, "zz_missing_id"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        search_many(index, {"a": {"q": "if", "from": 5,
                                  "search_after": [1.0, "x"]}})


def test_term_stats_consistency(index, oracle):
    n = index.n_docs
    assert n == oracle.n_docs
    assert abs(index.avgdl - oracle.avgdl) < 1e-9
    rows = index.term_stats.filter(F.col("term").isin(["if", "getuserbyid"])).collect()
    for r in rows:
        assert r["df"] == len(oracle.postings.get(r["term"], {}))


def test_get_by_id(index):
    row = get_by_id(index, "repo-003_with space/README.md").collect()
    assert len(row) == 1 and row[0]["path"] == "with space/README.md"


def test_default_analyzer_rank_identity(spark, documents):
    """B6 path: stemmed default-analyzer index matches the oracle."""
    idx = build_index(
        spark,
        documents.select("id", "content", F.col("rid").alias("repo"),
                         "path", F.col("language").alias("lang")),
        analyzer="default", docs_per_part=64,
    )
    rows = [{"doc_id": r["id"], "content": r["content"], "lang": r["language"],
             "repo": r["rid"]} for r in documents.collect()]
    orc = build_oracle_index(rows, analyzer="default")
    for query in ["returns", "getuserbyid", "users values"]:
        got = [(r["id"], r["score"]) for r in search(idx, query, k=10).collect()]
        exp = orc.search(query, k=10)
        assert [g[0] for g in got] == [e[0] for e in exp], (query, got, exp)
        assert np.allclose([g[1] for g in got], [e[1] for e in exp], rtol=1e-9)


def test_query_edge_cases(index):
    # a term longer than max_gram 40 can never match (index holds <=40-char
    # prefixes only) — must return empty, not error
    long_term = "x" * 45
    assert search(index, long_term, k=5).count() == 0
    # whitespace-only query
    assert search(index, "   ", k=5).count() == 0
    # k larger than corpus
    big = search(index, "if", k=10_000).count()
    assert 0 < big <= index.n_docs


def test_hot_term_skew_is_salted(index):
    """North_rule: Zipfian hot terms ('if', 'return') must be spread
    across doc partitions with per-group size bounded by docs_per_part —
    the document partition is the salt (SURVEY.md B12)."""
    hot = index.postings.filter(F.col("term").isin(["if", "return"])) \
        .select("term", "doc_part", "df").collect()
    by_term = {}
    for r in hot:
        by_term.setdefault(r["term"], []).append(r["df"])
    for term, dfs in by_term.items():
        assert len(dfs) > 1, f"hot term {term!r} landed in one partition"
        assert max(dfs) <= index.docs_per_part, (term, max(dfs))
    # total df across salted groups equals the global term_stats df
    ts = {r["term"]: r["df"] for r in index.term_stats
          .filter(F.col("term").isin(["if", "return"])).collect()}
    for term, dfs in by_term.items():
        assert sum(dfs) == ts[term]


def test_search_many_matches_single_queries(index):
    """Batched execution must agree with per-query search exactly."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    qs = {"a": "if return", "b": "getUserById", "c": "zzz_nothing"}
    batched = search_many(index, qs, k=5).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["score"]))
    for qid, qtext in qs.items():
        single = [(i + 1, r["id"], r["score"])
                  for i, r in enumerate(search(index, qtext, k=5).collect())]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [s[:2] for s in single], (qid, got, single)
        assert np.allclose([g[2] for g in got], [s[2] for s in single], rtol=1e-9)


_BATCH_SPECS = {
    "plain": "if return",
    "lang": {"q": "if", "lang": "Python"},
    "repo": {"q": "return", "repo": "repo-003"},
    "both": {"q": "if def", "lang": "Python", "repo": "repo-001"},
    "miss": {"q": "if", "repo": "no-such-repo"},
}


@pytest.mark.parametrize("mode", ["exhaustive", "bmw"])
def test_search_many_filtered_matches_single(index, mode):
    """B16/B17 parity on the batched path: per-query lang/repo predicates
    (bitmap-masked) and repo part-pruning must reproduce per-query
    ``search`` exactly, in both kernels."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    batched = search_many(index, _BATCH_SPECS, k=5, mode=mode).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["score"]))
    for qid, spec in _BATCH_SPECS.items():
        if isinstance(spec, str):
            spec = {"q": spec}
        single = [
            (i + 1, r["id"], r["score"])
            for i, r in enumerate(
                search(index, spec["q"], k=5, lang=spec.get("lang"),
                       repo=spec.get("repo"), mode=mode).collect()
            )
        ]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [s[:2] for s in single], (
            mode, qid, got, single
        )
        assert np.allclose([g[2] for g in got], [s[2] for s in single], rtol=1e-9)


def test_search_many_all_repo_scoped_prunes_scan(index):
    """When every batch entry is repo-scoped, the postings scan itself is
    pruned to the union of covering doc_parts (static IN on doc_part)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    all_parts = {
        r["doc_part"] for r in index.part_meta.select("doc_part").collect()
    }
    one_repo = {"only": {"q": "return", "repo": "repo-003"}}
    covering = {
        int(r["doc_part"])
        for r in index.part_meta.filter(
            (F.col("repo_min") <= "repo-003") & (F.col("repo_max") >= "repo-003")
        ).select("doc_part").collect()
    }
    assert covering and covering < all_parts, "fixture must allow pruning"
    plan = search_many(index, one_repo, k=5)._jdf.queryExecution().toString()
    assert "doc_part" in plan and "IN" in plan.upper()
    # and the pruned run still matches the unpruned per-query search
    got = [(r["rank"], r["id"]) for r in search_many(index, one_repo, k=5).collect()]
    exp = [(i + 1, r["id"]) for i, r in enumerate(
        search(index, "return", k=5, repo="repo-003").collect())]
    assert sorted(got) == exp


# --- facets / count (ES aggs + _count analogs) -----------------------------


def test_facet_counts_match_oracle(index, oracle):
    """facet_counts equals a brute-force matched-set group-by from the
    pure-Python oracle — including under a repo keyword predicate."""
    from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
        code_search_analyze,
    )
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        facet_counts,
        match_count,
    )

    query = "getUserById parse"
    terms = set(code_search_analyze(query))
    matched = {d for t in terms for d in oracle.postings.get(t, ())}
    assert matched, "fixture query must match something"

    def brute(field, pred=None):
        out = {}
        for d in matched:
            m = oracle.meta[d]
            if pred and any(m.get(f) != v for f, v in pred):
                continue
            out[m[field]] = out.get(m[field], 0) + 1
        return out

    got = {
        (r["value"]): r["n"]
        for r in facet_counts(index, query, fields=("lang",)).collect()
    }
    assert got == brute("lang")

    # repo facet under a lang predicate: bitmap AND path + routing off
    got2 = {
        r["value"]: r["n"]
        for r in facet_counts(index, query, fields=("repo",), lang="Python").collect()
    }
    assert got2 == brute("repo", pred=[("lang", "Python")])

    # _count analog, with and without a repo filter (routing-pruned)
    assert match_count(index, query) == len(matched)
    repo = oracle.meta[sorted(matched)[0]]["repo"]
    assert match_count(index, query, repo=repo) == sum(
        1 for d in matched if oracle.meta[d]["repo"] == repo
    )

    # no-match query → empty facets / zero count
    assert facet_counts(index, "zzqqxxnotaterm").count() == 0
    assert match_count(index, "zzqqxxnotaterm") == 0


def test_facet_and_count_bool_semantics(index, oracle):
    """facet_counts / match_count under operator='and' and must_not
    equal brute-force set algebra over the oracle's postings — the
    aggregations stay consistent with the bool hits they accompany."""
    from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
        code_search_analyze,
    )
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        facet_counts,
        match_count,
    )

    def docs_of(t):
        return set(oracle.postings.get(t, ()))

    q_terms = code_search_analyze("get user if")
    conj = set.intersection(*(docs_of(t) for t in q_terms))
    assert conj, "fixture conjunction must match something"
    assert match_count(index, "get user if", operator="and") == len(conj)

    def brute_lang(match_set):
        out: dict = {}
        for d in match_set:
            lang = oracle.meta[d]["lang"]
            out[lang] = out.get(lang, 0) + 1
        return out

    got = {
        r["value"]: r["n"]
        for r in facet_counts(index, "get user if", fields=("lang",),
                              operator="and").collect()
    }
    assert got == brute_lang(conj)

    excl = (docs_of("get") | docs_of("user")) - docs_of("if")
    assert match_count(index, "get user", must_not="if") == len(excl)
    got2 = {
        r["value"]: r["n"]
        for r in facet_counts(index, "get user", fields=("lang",),
                              must_not="if").collect()
    }
    assert got2 == brute_lang(excl)

    # dead shapes: required df=0 term / required-and-excluded ⇒ zero
    assert match_count(index, "get zzqqxxnotaterm", operator="and") == 0
    assert match_count(index, "get if", operator="and", must_not="if") == 0
    # `foo -foo` under OR ⇒ zero
    assert match_count(index, "if", must_not="if") == 0


def test_search_pagination_slices_global_order(index):
    """offset (ES `from`) returns exactly rows [offset, offset+k) of
    the full ranking, on both fetch paths."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search

    full = [(r["id"], round(r["score"], 9))
            for r in search(index, "get user if", k=60).collect()]
    assert len(full) >= 41  # pages below must lie inside the full list
    for fetch in ("auto", "spark"):
        for off, k in ((0, 5), (5, 5), (10, 30)):
            page = [(r["id"], round(r["score"], 9))
                    for r in search(index, "get user if", k=k, offset=off,
                                    fetch=fetch).collect()]
            assert page == full[off:off + k], (fetch, off, k)
    # offset past the result set → empty
    assert search(index, "get user if", k=5, offset=10_000).count() == 0


@pytest.mark.parametrize("fetch", ["auto", "spark"])
def test_search_many_offset_matches_single(index, fetch):
    """Per-entry 'from' slices each batch entry's ranking exactly like
    search(offset=) — global rank numbering, tie-break preserved — on
    both fetch paths; a 'from' past the result set yields no rows."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    qs = {
        "page0": {"q": "get user if", "from": 0},
        "page1": {"q": "get user if", "from": 5},
        "deep": {"q": "get user if", "from": 10},
        "filt": {"q": "if", "lang": "Python", "from": 3},
        "past": {"q": "get user if", "from": 10_000},
    }
    batched = search_many(index, qs, k=5, fetch=fetch).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        off = spec["from"]
        single = search(index, spec["q"], k=5, offset=off,
                        lang=spec.get("lang")).collect()
        exp = [(off + i + 1, r["id"], r["score"])
               for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (fetch, qid)
        assert np.allclose([g[2] for g in got], [e[2] for e in exp],
                           rtol=1e-9)


# --- prefix queries (ES prefix / trailing-* analog) -------------------------


def _oracle_prefix_hits(oracle, prefix, k, max_expansions):
    """Brute-force referee: LIKE-expand the vocabulary ranked by
    (df desc, term asc), cap, then sum per-term BM25 like the engine."""
    from gitlab_elasticsearch_indexer_spark.oracle import B, K1

    cands = sorted(
        ((len(docs), t) for t, docs in oracle.postings.items()
         if t.startswith(prefix)),
        key=lambda x: (-x[0], x[1]),
    )
    terms = [t for _, t in cands[:max_expansions]]
    avgdl = oracle.avgdl
    scores = {}
    for t in terms:
        idf = oracle.idf(t)
        for doc_id, tf in oracle.postings[t].items():
            dl = oracle.dls[doc_id]
            tfn = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
    hits = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
    return hits[:k], len(cands)


@pytest.mark.parametrize("prefix,max_exp", [
    ("get", 50),       # camelCase captures: getuserbyid → get... terms
    ("us", 4),         # cap bites: certifies the df-ranked rewrite
    ("zzzznope", 50),  # no vocabulary match → empty
])
def test_prefix_search_rank_identity(index, oracle, prefix, max_exp):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        expand_prefix,
        prefix_search,
    )

    exp, n_matching = _oracle_prefix_hits(oracle, prefix, 12, max_exp)
    got = [(r["id"], r["score"])
           for r in prefix_search(index, prefix, k=12,
                                  max_expansions=max_exp).collect()]
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)
    # the expansion itself matches the referee's ranked cap
    cands = sorted(
        ((len(d), t) for t, d in oracle.postings.items()
         if t.startswith(prefix)), key=lambda x: (-x[0], x[1]))
    assert expand_prefix(index, prefix, max_expansions=max_exp) == [
        t for _, t in cands[:max_exp]
    ]
    if prefix == "us":
        assert n_matching > max_exp  # the cap actually bit


def test_prefix_search_normalizes_and_filters(index, oracle):
    from gitlab_elasticsearch_indexer_spark.operators.query import prefix_search

    # prefix is lowercased like an indexed token (ES prefix queries
    # normalize, not analyze)
    a = [(r["id"], r["score"])
         for r in prefix_search(index, "GET", k=10).collect()]
    b = [(r["id"], r["score"])
         for r in prefix_search(index, "get", k=10).collect()]
    assert a == b and a
    # lang filter composes through the shared scoring machinery
    hits = prefix_search(index, "get", k=10, lang="Python").collect()
    assert hits and all(r["lang"] == "Python" for r in hits)


def test_search_many_prefix_entries_match_single(index):
    """Prefix entries in search_many reproduce prefix_search exactly —
    expansion shared across the batch, mixed with plain term entries,
    keyword filters, offsets, and a no-match prefix."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        prefix_search,
        search,
        search_many,
    )

    qs = {
        "p0": {"q": "get", "prefix": True},
        "p1": {"q": "us", "prefix": True, "max_expansions": 4},
        "p2": {"q": "get", "prefix": True, "lang": "Python"},
        "p3": {"q": "get", "prefix": True, "from": 3},
        "p4": {"q": "zzzznope", "prefix": True},
        "t0": "if return",
    }
    by_q = {}
    for r in search_many(index, qs, k=6).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        if isinstance(spec, str):
            single = search(index, spec, k=6).collect()
            base_rank = 0
        else:
            single = prefix_search(
                index, spec["q"], k=6, lang=spec.get("lang"),
                max_expansions=spec.get("max_expansions", 50),
                offset=spec.get("from", 0),
            ).collect()
            base_rank = spec.get("from", 0)
        exp = [(base_rank + i + 1, r["id"], r["score"])
               for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (qid, got, exp)
        assert np.allclose([g[2] for g in got] or [0.0],
                           [e[2] for e in exp] or [0.0])


def test_prefix_search_after_pages_match_full_ranking(index):
    """search_after cursors compose with prefix queries on both the
    single and batched paths: page 2 via the page-1 tail cursor equals
    rows [3:6] of the full ranking, with exact float parity."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        prefix_search,
        search_many,
    )

    full = [(r["id"], r["score"])
            for r in prefix_search(index, "get", k=6).collect()]
    assert len(full) == 6
    cursor = (full[2][1], full[2][0])
    page2 = [(r["id"], r["score"])
             for r in prefix_search(index, "get", k=3,
                                    search_after=cursor).collect()]
    assert page2 == full[3:6]

    # batched kernels may differ from singles in the last ULP
    # (accumulation order) — ids exact, scores approx, like the
    # documented search_after caveat
    batched = sorted(search_many(index, {
        "p": {"q": "get", "prefix": True,
              "search_after": [cursor[0], cursor[1]]},
    }, k=3).collect(), key=lambda r: r["rank"])
    assert [r["id"] for r in batched] == [i for i, _ in full[3:6]]
    assert np.allclose([r["score"] for r in batched],
                       [s for _, s in full[3:6]], rtol=1e-12)


# --- fuzzy queries (ES fuzzy / term~N analog) --------------------------------


def _lev(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))

    return d(len(a), len(b))


@pytest.mark.parametrize("term,edits,plen", [
    ("getuser", 2, 0),    # typo-distance matches in the camelCase vocab
    ("return", 1, 0),
    ("return", 2, 3),     # prefix_length constrains the neighborhood
    ("zzzzzzzzzz", 1, 0), # nothing within reach → empty
])
def test_fuzzy_search_rank_identity(index, oracle, term, edits, plen):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        expand_fuzzy,
        fuzzy_search,
    )
    from gitlab_elasticsearch_indexer_spark.oracle import B, K1

    cands = sorted(
        ((len(docs), t) for t, docs in oracle.postings.items()
         if _lev(term, t) <= edits and t.startswith(term[:plen])),
        key=lambda x: (-x[0], x[1]),
    )
    terms = [t for _, t in cands[:50]]
    assert expand_fuzzy(index, term, max_edits=edits, max_expansions=50,
                        prefix_length=plen) == terms

    avgdl = oracle.avgdl
    scores = {}
    for t in terms:
        idf = oracle.idf(t)
        for doc_id, tf in oracle.postings[t].items():
            dl = oracle.dls[doc_id]
            tfn = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
    exp = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:12]
    got = [(r["id"], r["score"])
           for r in fuzzy_search(index, term, k=12, max_edits=edits,
                                 prefix_length=plen).collect()]
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_search_many_fuzzy_entries_match_single(index):
    """Fuzzy entries in search_many reproduce fuzzy_search exactly —
    one shared neighborhood scan per batch, mixed with prefix and term
    entries, edit budgets, prefix_length, and a no-match term."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        fuzzy_search,
        search_many,
    )

    qs = {
        "f0": {"q": "return", "fuzzy": True},
        "f1": {"q": "getuser", "fuzzy": True, "max_edits": 2},
        "f2": {"q": "return", "fuzzy": True, "max_edits": 2,
               "prefix_length": 3},
        "f3": {"q": "zzzzzzzzzz", "fuzzy": True},
        "p0": {"q": "get", "prefix": True},
        "t0": "if return",
    }
    by_q = {}
    for r in search_many(index, qs, k=6).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        if not (isinstance(spec, dict) and spec.get("fuzzy")):
            continue
        single = fuzzy_search(
            index, spec["q"], k=6, max_edits=spec.get("max_edits", 1),
            prefix_length=spec.get("prefix_length", 0),
        ).collect()
        exp = [(i + 1, r["id"], r["score"]) for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (qid, got, exp)
        assert np.allclose([g[2] for g in got] or [0.0],
                           [e[2] for e in exp] or [0.0], rtol=1e-12)


# --- wildcard queries (ES wildcard analog) -----------------------------------


@pytest.mark.parametrize("pattern", ["get*", "*user*", "g?t*", "zz*zz"])
def test_wildcard_search_rank_identity(index, oracle, pattern):
    import re

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        _wildcard_to_regex,
        expand_wildcard,
        wildcard_search,
    )
    from gitlab_elasticsearch_indexer_spark.oracle import B, K1

    rx = re.compile(_wildcard_to_regex(pattern))
    cands = sorted(
        ((len(docs), t) for t, docs in oracle.postings.items() if rx.match(t)),
        key=lambda x: (-x[0], x[1]),
    )
    terms = [t for _, t in cands[:50]]
    assert expand_wildcard(index, pattern, max_expansions=50) == terms

    avgdl = oracle.avgdl
    scores = {}
    for t in terms:
        idf = oracle.idf(t)
        for doc_id, tf in oracle.postings[t].items():
            dl = oracle.dls[doc_id]
            tfn = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
    exp = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:12]
    got = [(r["id"], r["score"])
           for r in wildcard_search(index, pattern, k=12).collect()]
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_wildcard_pattern_validation(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        expand_wildcard,
    )

    with pytest.raises(ValueError):
        expand_wildcard(index, "*")
    with pytest.raises(ValueError):
        expand_wildcard(index, "?*?")
    # regex metachars in the literal part are escaped, not interpreted
    assert expand_wildcard(index, "g.t*") == []


def test_search_many_wildcard_entries_match_single(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        search_many,
        wildcard_search,
    )

    qs = {
        "w0": {"q": "get*", "wildcard": True},
        "w1": {"q": "*user*", "wildcard": True, "max_expansions": 5},
        "w2": {"q": "zz*zz", "wildcard": True},
        "t0": "if return",
    }
    by_q = {}
    for r in search_many(index, qs, k=6).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        if not (isinstance(spec, dict) and spec.get("wildcard")):
            continue
        single = wildcard_search(
            index, spec["q"], k=6,
            max_expansions=spec.get("max_expansions", 50),
        ).collect()
        exp = [(i + 1, r["id"], r["score"]) for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (qid, got, exp)
        assert np.allclose([g[2] for g in got] or [0.0],
                           [e[2] for e in exp] or [0.0], rtol=1e-12)


# --- regexp queries (ES regexp analog) ----------------------------------------


@pytest.mark.parametrize(
    "pattern", ["get.*", "g[ae]t.*", "(get|set)user.*", "colou?r", "zz.*zz"]
)
def test_regexp_search_rank_identity(index, oracle, pattern):
    """regexp_search ranks identically to a brute-force referee that
    compiles the anchored pattern over the full vocabulary and sums
    BM25 over the capped expansions (the Lucene top-terms rewrite)."""
    import re

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        expand_regexp,
        regexp_search,
    )
    from gitlab_elasticsearch_indexer_spark.oracle import B, K1

    rx = re.compile(f"^(?:{pattern})$")
    cands = sorted(
        ((len(docs), t) for t, docs in oracle.postings.items() if rx.match(t)),
        key=lambda x: (-x[0], x[1]),
    )
    terms = [t for _, t in cands[:50]]
    assert expand_regexp(index, pattern, max_expansions=50) == terms

    avgdl = oracle.avgdl
    scores = {}
    for t in terms:
        idf = oracle.idf(t)
        for doc_id, tf in oracle.postings[t].items():
            dl = oracle.dls[doc_id]
            tfn = tf / (tf + K1 * (1.0 - B + B * dl / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
    exp = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:12]
    got = [(r["id"], r["score"])
           for r in regexp_search(index, pattern, k=12).collect()]
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_regexp_pattern_validation():
    """Non-portable / Lucene-operator constructs are rejected up front;
    the mandatory-literal-prefix extraction is conservative and sound."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        _regexp_literal_prefix,
        _validate_regexp,
    )

    for bad in ["", "get(", "get)", "[a-", "a\\", "a\\1", "(?=x)y",
                "(?i)get", "~get", "a&b", "a<1-2>", "^get", "get$"]:
        with pytest.raises(ValueError):
            _validate_regexp(bad)
    # portable core passes, incl. escaped operators and (?: groups
    for ok in ["get.*", "[gs]et", "(?:a|b)c+", "a{2,3}", "\\~x", "\\^y",
               "colou?r", "\\.hidden"]:
        assert _validate_regexp(ok) == f"^(?:{ok})$"

    assert _regexp_literal_prefix("get.*") == "get"
    assert _regexp_literal_prefix("colou?r") == "colo"   # ? owns the u
    assert _regexp_literal_prefix("ab+c") == "ab"        # + keeps the b
    assert _regexp_literal_prefix("ab{2}c") == "a"       # { owns the b
    assert _regexp_literal_prefix("[gs]et") == ""
    assert _regexp_literal_prefix("a|b") == ""           # top-level alt
    assert _regexp_literal_prefix("ab(c|d)") == "ab"     # nested alt ok
    assert _regexp_literal_prefix("\\.rc.*") == ".rc"    # escaped literal
    assert _regexp_literal_prefix("\\d+x") == ""         # \d is a class


def test_search_many_regexp_entries_match_single(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        regexp_search,
        search_many,
    )

    qs = {
        "r0": {"q": "get.*", "regexp": True},
        "r1": {"q": "(get|set)user.*", "regexp": True, "max_expansions": 5},
        "r2": {"q": "zz.*zz", "regexp": True},
        "t0": "if return",
    }
    by_q = {}
    for r in search_many(index, qs, k=6).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        if not (isinstance(spec, dict) and spec.get("regexp")):
            continue
        single = regexp_search(
            index, spec["q"], k=6,
            max_expansions=spec.get("max_expansions", 50),
        ).collect()
        exp = [(i + 1, r["id"], r["score"]) for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (qid, got, exp)
        assert np.allclose([g[2] for g in got] or [0.0],
                           [e[2] for e in exp] or [0.0], rtol=1e-12)


# --- terms filters (ES terms query: multi-value keyword filters) -------------


TERMS_FILTER_CASES = [
    # (query, lang, repo) — lists are ES terms filters (match ANY value)
    ("if return", ["Python", "Ruby"], None),
    ("return", None, ["repo-003", "repo-005"]),
    ("get user", ["Python", "Go"], ["repo-001", "repo-002", "repo-006"]),
    ("if", ["Python"], None),          # 1-element list ≡ plain string
    ("if", [], None),                  # empty terms list matches nothing
    ("return", None, []),              # empty repo list: routing kills it
    ("if", ["Klingon"], None),         # no doc carries the value
]


def test_terms_filter_rank_identity(index, oracle):
    """Multi-value lang/repo filters (ES `terms`) rank identically to
    the brute-force referee: OR within a field, AND across fields."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search

    for query, lang, repo in TERMS_FILTER_CASES:
        got = [(r["id"], r["score"]) for r in
               search(index, query, k=12, lang=lang, repo=repo).collect()]
        exp = oracle.search(query, k=12, lang=lang, repo=repo)
        assert [g[0] for g in got] == [e[0] for e in exp], (query, lang, repo)
        assert np.allclose([g[1] for g in got] or [0.0],
                           [e[1] for e in exp] or [0.0],
                           rtol=1e-9, atol=1e-12), (query, lang, repo)
        # a single-value list behaves exactly like the string form
        if lang and len(lang) == 1:
            single = [(r["id"], r["score"]) for r in
                      search(index, query, k=12, lang=lang[0]).collect()]
            assert got == single


def test_terms_filter_count_and_facets(index, oracle):
    """_count / facets under a terms filter count the union the filter
    admits (aggregations consistent with the filtered hits)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        facet_counts,
        match_count,
    )

    langs = ["Python", "Ruby"]
    exp_ids = {d for d, _ in oracle.search("if", k=10_000, lang=langs)}
    assert match_count(index, "if", lang=langs) == len(exp_ids)
    assert match_count(index, "if", lang=[]) == 0

    fc = {
        r["value"]: int(r["n"])
        for r in facet_counts(index, "if", fields=("lang",),
                              lang=langs).collect()
        if r["field"] == "lang"
    }
    exp_by_lang: dict[str, int] = {}
    for d in exp_ids:
        exp_by_lang[oracle.meta[d]["lang"]] = (
            exp_by_lang.get(oracle.meta[d]["lang"], 0) + 1
        )
    assert fc == exp_by_lang
    assert set(fc) <= set(langs)


def test_terms_filter_rewrites(index, oracle):
    """Terms filters compose with multi-term-rewrite queries exactly
    like single-value filters (shared pre_weights + predicate
    machinery)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        prefix_search,
    )

    # prefix rewrite under a repo terms filter
    repos = ["repo-001", "repo-004"]
    unf = {r["id"]: r["score"]
           for r in prefix_search(index, "get", k=10_000).collect()}
    gotp = [(r["id"], r["score"])
            for r in prefix_search(index, "get", k=10_000,
                                   repo=repos).collect()]
    expp = sorted(
        ((d, s) for d, s in unf.items()
         if oracle.meta[d]["repo"] in set(repos)),
        key=lambda x: (-x[1], x[0]),
    )
    assert gotp == expp


def test_search_many_terms_filter_entries_match_single(index):
    """Batched entries with list-valued lang/repo return exactly the
    single-query results (per-field OR fold parity in the batch
    kernels)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        search,
        search_many,
    )

    qs = {
        "t0": {"q": "if return", "lang": ["Python", "Ruby"]},
        "t1": {"q": "return", "repo": ["repo-003", "repo-005"]},
        "t2": {"q": "get user", "lang": ["Python", "Go"],
               "repo": ["repo-001", "repo-002", "repo-006"]},
        "t3": {"q": "if", "lang": []},
        "x0": {"q": "get", "prefix": True, "lang": ["Python", "Ruby"]},
        "plain": "if user",
    }
    by_q: dict[str, list] = {}
    for r in search_many(index, qs, k=8).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        if not isinstance(spec, dict):
            continue
        if spec.get("prefix"):
            from gitlab_elasticsearch_indexer_spark.operators.query import (
                prefix_search,
            )
            single = prefix_search(index, spec["q"], k=8,
                                   lang=spec.get("lang"),
                                   repo=spec.get("repo")).collect()
        else:
            single = search(index, spec["q"], k=8, lang=spec.get("lang"),
                            repo=spec.get("repo")).collect()
        exp = [(i + 1, r["id"], r["score"]) for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (qid, got, exp)
        assert np.allclose([g[2] for g in got] or [0.0],
                           [e[2] for e in exp] or [0.0], rtol=1e-12)


# --- match_all (filter-only) queries --------------------------------------


def _brute_match_all(oracle, paths, lang=None, repo=None, must_not=None,
                     dl_range=None):
    """Referee match set for ES match_all in filter context: every doc
    passing the keyword / dl filters, minus docs containing any
    must_not term."""
    langs = {lang} if isinstance(lang, str) else (set(lang) if lang else None)
    repos = {repo} if isinstance(repo, str) else (set(repo) if repo else None)
    excluded = set()
    if must_not:
        excluded = {d for d, _ in oracle.search(must_not, k=10**6)}
    out = []
    for d in oracle.dls:
        m = oracle.meta[d]
        if langs is not None and m.get("lang") not in langs:
            continue
        if repos is not None and m.get("repo") not in repos:
            continue
        if dl_range is not None:
            lo, hi = dl_range
            if lo is not None and oracle.dls[d] < lo:
                continue
            if hi is not None and oracle.dls[d] > hi:
                continue
        if d in excluded:
            continue
        out.append(d)
    return out


MATCH_ALL_SHAPES = [
    # (sort, asc, kwargs)
    ("path", True, {}),                                  # native browse
    ("path", False, {"repo": "repo-001"}),               # native + routing
    ("dl", False, {"lang": ["Python", "Ruby"]}),         # native + terms filter
    ("dl", True, {"dl_range": (10, 200)}),               # native + range
    ("dl", False, {"must_not": "if"}),                   # kernel path
    ("lang", True, {"must_not": "get user",
                    "repo": ["repo-000", "repo-002"]}),  # kernel + filters
    ("id", True, {"must_not": "zzz_no_such_term"}),      # dead neg → native
    ("path", True, {"repo": "no-such-repo"}),            # routed to nothing
]


def test_match_all_sort_matches_referee(index, oracle, documents):
    """ES match_all + sort (the GitLab file-browse shape): field-ordered
    listing of EVERY doc passing the filters matches the brute-force
    referee across the native (no must_not → TakeOrderedAndProject) and
    kernel (must_not subtraction) paths."""
    from gitlab_elasticsearch_indexer_spark.operators.query import sort_search

    paths = {r["id"]: r["path"] for r in
             documents.select("id", "path").collect()}
    for sort, asc, kw in MATCH_ALL_SHAPES:
        docs = _brute_match_all(oracle, paths, **kw)

        def keyf(d):
            return {"id": d, "repo": oracle.meta[d].get("repo") or "",
                    "lang": oracle.meta[d].get("lang") or "",
                    "path": paths[d], "dl": oracle.dls[d]}[sort]

        if asc:
            docs.sort(key=lambda d: (keyf(d), d))
        else:
            docs.sort()
            docs.sort(key=keyf, reverse=True)
        exp = [(d, oracle.meta[d].get("repo"), paths[d],
                oracle.meta[d].get("lang"), oracle.dls[d])
               for d in docs[:12]]
        got = [(r["id"], r["repo"], r["path"], r["lang"], r["dl"])
               for r in sort_search(index, None, sort=sort, ascending=asc,
                                    k=12, **kw).collect()]
        assert got == exp, (sort, asc, kw)


def test_match_all_paging(index, oracle, documents):
    """offset and the (sort_value, id) cursor page the match_all order
    exactly, on both the native and the must_not kernel paths."""
    from gitlab_elasticsearch_indexer_spark.operators.query import sort_search

    for kw in ({}, {"must_not": "if"}):
        full = [(r["id"], r["dl"]) for r in
                sort_search(index, None, sort="dl", ascending=False,
                            k=30, **kw).collect()]
        off = [(r["id"], r["dl"]) for r in
               sort_search(index, None, sort="dl", ascending=False, k=5,
                           offset=5, **kw).collect()]
        assert off == full[5:10], kw
        p1 = sort_search(index, None, sort="dl", ascending=False, k=5,
                         **kw).collect()
        cur = (int(p1[-1]["dl"]), p1[-1]["id"])
        p2 = [(r["id"], r["dl"]) for r in
              sort_search(index, None, sort="dl", ascending=False, k=5,
                          search_after=cur, **kw).collect()]
        assert p2 == full[5:10], kw


def test_match_all_aggregations_match_referee(index, oracle, documents):
    """match_all facets / _count / dl stats / histogram (the GitLab
    language-statistics chart shape) equal the referee's corpus-wide
    numbers under filters and must_not, on both the native-Catalyst and
    the kernel paths."""
    from collections import Counter

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        dl_histogram,
        dl_stats,
        facet_counts,
        match_count,
    )

    paths = {r["id"]: r["path"] for r in
             documents.select("id", "path").collect()}
    shapes = [
        {},
        {"repo": ["repo-001", "repo-004"]},
        {"lang": "Python", "dl_range": (5, None)},
        {"must_not": "if"},
        {"must_not": "return", "lang": ["Python", "Go"]},
        {"repo": "no-such-repo"},
    ]
    for kw in shapes:
        docs = _brute_match_all(oracle, paths, **kw)
        assert match_count(index, None, **kw) == len(docs), kw

        exp_fc = Counter(oracle.meta[d].get("lang") or "" for d in docs)
        got_fc = {r["value"]: r["n"] for r in
                  facet_counts(index, None, fields=("lang",), **kw).collect()}
        assert got_fc == {v: n for v, n in exp_fc.items() if n}, kw

        dls = [oracle.dls[d] for d in docs]
        row = dl_stats(index, None, **kw).collect()[0]
        if not dls:
            assert row["count"] == 0 and row["min_dl"] is None
        else:
            assert (row["count"], row["sum_dl"], row["min_dl"],
                    row["max_dl"]) == (len(dls), sum(dls), min(dls),
                                       max(dls)), kw
            assert abs(row["avg_dl"] - sum(dls) / len(dls)) < 1e-9
        got_h = {int(r["bucket"]): int(r["n"]) for r in
                 dl_histogram(index, None, 25, **kw).collect()}
        assert got_h == dict(Counter((dl // 25) * 25 for dl in dls)), kw
    # the _total row is the _count analog
    from gitlab_elasticsearch_indexer_spark.operators.query import facet_counts
    rows = facet_counts(index, None, fields=("lang",),
                        include_total=True).collect()
    total = [r for r in rows if r["field"] == "_total"]
    assert total and total[0]["n"] == len(oracle.dls)


def test_match_all_batch_entries_match_single(index):
    """msearch {"match_all": true, "sort": ...} bodies equal the
    single-query match_all browse, mixed with scored entries."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        search_many,
        sort_search,
    )

    qs = {
        "a": {"q": "", "match_all": True, "sort": "path"},
        "b": {"q": "", "match_all": True, "sort": "dl:desc",
              "must_not": "if", "repo": ["repo-001", "repo-003"]},
        "c": {"q": "", "match_all": True, "sort": "dl",
              "dl_range": [5, 150], "from": 3},
        "scored": "if return",
    }
    by_q: dict[str, list] = {}
    for r in search_many(index, qs, k=6).collect():
        by_q.setdefault(r["query_id"], []).append(r)
    singles = {
        "a": sort_search(index, None, sort="path", k=6),
        "b": sort_search(index, None, sort="dl", ascending=False, k=6,
                         must_not="if", repo=["repo-001", "repo-003"]),
        "c": sort_search(index, None, sort="dl", k=6, dl_range=(5, 150),
                         offset=3),
    }
    for qid, single in singles.items():
        exp = [r["id"] for r in single.collect()]
        got = [r["id"] for r in sorted(by_q.get(qid, []),
                                       key=lambda r: r["rank"])]
        assert got == exp and exp, qid
        assert all(r["score"] is None for r in by_q[qid])  # ES null _score
    assert by_q["scored"] and all(
        r["score"] is not None for r in by_q["scored"]
    )


def test_match_all_validation(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        facet_counts,
        search_many,
        sort_search,
    )

    with pytest.raises(ValueError, match="match_all facets"):
        facet_counts(index, None, fields=("path",))
    with pytest.raises(ValueError, match="sort must be"):
        sort_search(index, None, sort="score")
    with pytest.raises(ValueError, match="match_all needs a sort"):
        search_many(index, {"x": {"match_all": True}}, k=5).collect()
    with pytest.raises(ValueError, match="match_all composes"):
        search_many(index, {"x": {"q": "if", "match_all": True,
                                  "sort": "path"}}, k=5).collect()


def test_term_vectors_matches_oracle(index, oracle, documents):
    """ES _termvectors (term_statistics=true): per-term tf/df/ttf of a
    doc re-derived from the index equals the oracle's postings view."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        term_vectors,
    )

    doc_ids = [r["id"] for r in
               documents.select("id").orderBy("id").limit(2).collect()]
    for doc_id in doc_ids:
        got = [(r["term"], r["tf"], r["df"], r["ttf"])
               for r in term_vectors(index, doc_id).collect()]
        exp = sorted(
            (t, pl[doc_id], len(pl), sum(pl.values()))
            for t, pl in oracle.postings.items()
            if doc_id in pl
        )
        assert got == exp, doc_id
    with pytest.raises(ValueError, match="not found"):
        term_vectors(index, "no_such_doc")


def test_date_histogram_buckets(spark):
    """ES date_histogram (calendar_interval) over commit documents:
    day buckets count per-truncated-day, rid terms filter applies,
    empty buckets are omitted (min_doc_count: 1)."""
    from gitlab_elasticsearch_indexer_spark.operators.pipeline import (
        build_commit_documents,
    )
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        date_histogram,
    )

    rows = [
        ("r1", "s1", "2024-03-01 10:00:00", "fix a"),
        ("r1", "s2", "2024-03-01 23:59:59", "fix b"),
        ("r1", "s3", "2024-03-02 00:00:01", "fix c"),
        ("r2", "s4", "2024-03-05 12:00:00", "fix d"),
        ("r3", "s5", "2024-04-01 08:00:00", "fix e"),
    ]
    commits = spark.createDataFrame(
        rows, "repo string, sha string, t string, message string"
    ).select(
        "repo", "sha",
        F.lit("a").alias("author_name"),
        F.lit("a@x").alias("author_email"),
        F.col("t").cast("timestamp").alias("author_time"),
        F.lit("c").alias("committer_name"),
        F.lit("c@x").alias("committer_email"),
        F.col("t").cast("timestamp").alias("committer_time"),
        "message",
    )
    docs = build_commit_documents(commits)

    got = [(r["bucket"], r["n"])
           for r in date_histogram(docs, interval="day").collect()]
    assert got == [("2024-03-01 00:00:00", 2), ("2024-03-02 00:00:00", 1),
                   ("2024-03-05 00:00:00", 1), ("2024-04-01 00:00:00", 1)]

    got = [(r["bucket"], r["n"])
           for r in date_histogram(docs, interval="month",
                                   rid=["r1", "r2"]).collect()]
    assert got == [("2024-03-01 00:00:00", 4)]

    # ES calendar_interval validation
    with pytest.raises(ValueError, match="interval"):
        date_histogram(docs, interval="fortnight")


def test_dl_percentiles_match_referee(index, oracle):
    """ES percentiles aggregation over dl — exact nearest-rank
    (quantile_disc) percentiles from the bounded (dl, n) histogram,
    matching the referee's sorted match-set dls under every bool
    shape; match_all covers the native-partial path."""
    import math as _m

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        dl_percentiles,
    )

    for query, op, neg, msm, lang in AGG_QUERIES:
        hits = oracle.search(query, k=10**6, operator=op, must_not=neg,
                             minimum_should_match=msm, lang=lang)
        dls = sorted(oracle.dls[d] for d, _ in hits)
        rows = dl_percentiles(index, query, operator=op, must_not=neg,
                              minimum_should_match=msm, lang=lang).collect()
        assert [r["percent"] for r in rows] == \
            [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0]
        for r in rows:
            if not dls:
                assert r["value"] is None
            else:
                rank = max(1, _m.ceil(r["percent"] / 100 * len(dls)))
                assert r["value"] == dls[rank - 1], (query, r["percent"])

    # match_all (query=None) rides the native partial path
    all_dls = sorted(oracle.dls.values())
    rows = dl_percentiles(index, None, percents=(50.0, 99.0)).collect()
    for r in rows:
        rank = max(1, _m.ceil(r["percent"] / 100 * len(all_dls)))
        assert r["value"] == all_dls[rank - 1]

    with pytest.raises(ValueError, match="percents"):
        dl_percentiles(index, "if", percents=(0.0,))
    with pytest.raises(ValueError, match="duplicate"):
        dl_percentiles(index, "if", percents=(50.0, 50.0))


def test_field_cardinality_matches_referee(index, oracle):
    """ES cardinality aggregation: distinct repo/lang values among ALL
    matching docs under every bool shape; zero matches → 0; match_all
    covers the native path; the approximate flag rides HLL++."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        field_cardinality,
    )

    for query, op, neg, msm, lang in AGG_QUERIES:
        hits = oracle.search(query, k=10**6, operator=op, must_not=neg,
                             minimum_should_match=msm, lang=lang)
        ids = [d for d, _ in hits]
        exp = {
            "lang": len({oracle.meta[d].get("lang") for d in ids}),
            "repo": len({oracle.meta[d].get("repo") for d in ids}),
        }
        rows = field_cardinality(index, query, fields=("lang", "repo"),
                                 operator=op, must_not=neg,
                                 minimum_should_match=msm,
                                 lang=lang).collect()
        got = {r["field"]: r["cardinality"] for r in rows}
        assert got == exp, (query, op, neg)

    # match_all: every live doc
    rows = field_cardinality(index, None, fields=("repo",)).collect()
    assert rows[0]["cardinality"] == \
        len({m.get("repo") for m in oracle.meta.values()})

    # HLL++ path returns a sane estimate on the small corpus
    approx = field_cardinality(index, "if", fields=("repo",),
                               approximate=True, rsd=0.01).collect()
    exact = field_cardinality(index, "if", fields=("repo",)).collect()
    assert abs(approx[0]["cardinality"] - exact[0]["cardinality"]) <= \
        max(1, exact[0]["cardinality"] // 10)


def test_grouped_search_matches_referee(index, oracle):
    """ES collapse / top_hits: best k hits per repo/lang group, groups
    ordered by best-hit score — matches the referee's full-match-set
    grouping under every bool shape."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        grouped_search,
    )

    for query, op, neg, msm, lang in AGG_QUERIES:
        for by in ("repo", "lang"):
            for kpg in (1, 3):
                hits = oracle.search(query, k=10**6, operator=op,
                                     must_not=neg,
                                     minimum_should_match=msm, lang=lang)
                by_v: dict = {}
                for d, s in hits:
                    by_v.setdefault(oracle.meta[d].get(by), []).append(
                        (d, s))
                exp_groups = []
                for v, g in by_v.items():
                    g.sort(key=lambda t: (-t[1], t[0]))
                    exp_groups.append((v, g[:kpg]))
                exp_groups.sort(key=lambda t: (-t[1][0][1], t[0]))
                exp = [
                    (v, rank, d, round(s, 9))
                    for v, g in exp_groups[:5]
                    for rank, (d, s) in enumerate(g, 1)
                ]
                got = [
                    (r["value"], r["rank"], r["id"], round(r["score"], 9))
                    for r in grouped_search(
                        index, query, by=by, k_per_group=kpg, groups=5,
                        operator=op, must_not=neg,
                        minimum_should_match=msm, lang=lang).collect()
                ]
                assert got == exp, (query, op, neg, by, kpg)


def test_grouped_search_validation(index):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        grouped_search,
    )

    with pytest.raises(ValueError, match="by must be"):
        grouped_search(index, "if", by="path")
    with pytest.raises(ValueError, match="k_per_group"):
        grouped_search(index, "if", k_per_group=0)
    with pytest.raises(ValueError, match="minimum_should_match"):
        grouped_search(index, "if user", operator="and",
                       minimum_should_match=2)


def test_scan_streams_entire_match_set(index, oracle):
    """ES scroll / PIT+search_after iteration: concatenated pages equal
    the FULL match set in global (score desc, id asc) order, at several
    page sizes, under filters and bool knobs; every page but the last
    is exactly page_size."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        scan,
        scan_all,
    )

    for query, op, neg, msm, lang in AGG_QUERIES[:4]:
        exp = oracle.search(query, k=10**6, operator=op, must_not=neg,
                            minimum_should_match=msm, lang=lang)
        # page sizes that exercise multi-page iteration without
        # hundreds of 1-job pages (the hot term gets ps=50 below)
        for ps in (7, 1000):
            pages = list(scan(index, query, page_size=ps, operator=op,
                              must_not=neg, minimum_should_match=msm,
                              lang=lang))
            got = [(r["id"], round(r["score"], 9))
                   for page in pages for r in page]
            assert got == [(d, round(s, 9)) for d, s in exp], (query, ps)
            assert all(len(p) == ps for p in pages[:-1])

    # the hot, multi-part term: full-corpus-wide scan in 50-doc pages
    exp = oracle.search("if", k=10**6)
    pages = list(scan(index, "if", page_size=50))
    got = [(r["id"], round(r["score"], 9)) for page in pages for r in page]
    assert got == [(d, round(s, 9)) for d, s in exp]
    assert all(len(p) == 50 for p in pages[:-1])

    # max_pages bounds the scan
    pages = list(scan(index, "if", page_size=5, max_pages=2))
    assert len(pages) == 2 and all(len(p) == 5 for p in pages)
    full = scan_all(index, "if", page_size=64).collect()
    assert len(full) == len(oracle.search("if", k=10**6))
    with pytest.raises(ValueError, match="page_size"):
        list(scan(index, "if", page_size=0))


def _sig_referee(oracle, query, size=10, min_doc_count=3,
                 allowed_ids=None):
    """Brute significant_terms: fg = matched docs containing the term,
    bg = corpus df, JLH = (fg% − bg%)·(fg%/bg%); query terms excluded."""
    from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
        code_search_analyze,
    )

    matched = {d for d, _ in oracle.search(query, k=10**6)}
    if allowed_ids is not None:
        matched &= allowed_ids
    if not matched:
        return []
    qterms = set(code_search_analyze(query))
    n_docs = len(oracle.dls)
    out = []
    for t, pl in oracle.postings.items():
        if t in qterms:
            continue
        fg = len(matched & set(pl))
        if fg < min_doc_count:
            continue
        bg = len(pl)
        fr, br = fg / len(matched), bg / n_docs
        out.append((t, fg, bg, (fr - br) * (fr / br)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return [(t, fg, bg, round(s, 9)) for t, fg, bg, s in out[:size]]


def test_significant_terms_matches_referee(index, oracle):
    """ES significant_terms: 'uncommonly common' terms of the match
    set under JLH, query terms excluded, min_doc_count applied."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        significant_terms,
    )

    for query in ("get user", "if return", "window"):
        got = [(r["term"], r["fg"], r["bg"], round(r["score"], 9))
               for r in significant_terms(index, query, size=10).collect()]
        assert got == _sig_referee(oracle, query, size=10), query
    # the multi-term queries produce non-trivial rankings
    assert _sig_referee(oracle, "get user", size=10)
    assert _sig_referee(oracle, "if return", size=10)


def test_significant_terms_sampler_and_validation(index, oracle):
    """The sampler: sample_parts=N restricts the FOREGROUND to the
    first N doc_parts (deterministic shard sample — doc_idx is the
    rank of the string id) while the background df stays global."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        significant_terms,
    )

    all_ids = sorted(oracle.dls)
    allowed = set(all_ids[: 2 * index.docs_per_part])
    got = [(r["term"], r["fg"], r["bg"], round(r["score"], 9))
           for r in significant_terms(index, "get user", size=10,
                                      sample_parts=2).collect()]
    assert got == _sig_referee(oracle, "get user", size=10,
                               allowed_ids=allowed)
    assert got

    with pytest.raises(ValueError, match="size >= 1"):
        significant_terms(index, "if", size=0)
    with pytest.raises(ValueError, match="sample_parts"):
        significant_terms(index, "if", sample_parts=0)
    # a query with no live terms → empty, stable schema
    df = significant_terms(index, "zzz_no_such_term")
    assert df.columns == ["term", "fg", "bg", "score"]
    assert df.count() == 0


def test_boosting_query_matches_referee(index, oracle):
    """ES boosting query: negative matches are DEMOTED (score ×
    negative_boost), not excluded — re-ranked before the per-part
    top-k so the global merge stays exact."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        boosting_search,
    )

    for positive, negative, nb, lang in (
        ("get user", "if", 0.5, None),
        ("get user if", "return", 0.2, None),
        ("if return", "user", 0.7, "Python"),
        ("get user", "zzz_no_such_term", 0.5, None),  # dead negative
        ("if", "if", 0.5, None),  # a term both positive and negative
    ):
        hits = oracle.search(positive, k=10**6, lang=lang)
        negset = set()
        from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
            code_search_analyze,
        )
        for t in set(code_search_analyze(negative)):
            negset |= set(oracle.postings.get(t, ()))
        exp = [(d, s * nb if d in negset else s) for d, s in hits]
        exp.sort(key=lambda t: (-t[1], t[0]))
        exp = [(d, round(s, 9)) for d, s in exp[:10]]
        got = [(r["id"], round(r["score"], 9))
               for r in boosting_search(index, positive, negative,
                                        negative_boost=nb, k=10,
                                        lang=lang).collect()]
        assert got == exp, (positive, negative, nb)

    # demotion reorders but keeps the doc: some demoted doc must still
    # be present in the re-ranking
    base = {r["id"] for r in boosting_search(
        index, "get user", "if", negative_boost=0.5, k=10).collect()}
    assert base

    with pytest.raises(ValueError, match="negative_boost"):
        boosting_search(index, "get", "user", negative_boost=1.0)
    with pytest.raises(ValueError, match="negative_boost"):
        boosting_search(index, "get", "user", negative_boost=0.0)


def test_function_score_matches_referee(index, oracle):
    """ES function_score / field_value_factor over dl: bm25 <mode>
    modifier(factor·dl), re-ranked before the per-part top-k."""
    import math as _m

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        function_score_search,
    )

    mods = {"none": lambda x: x, "log1p": _m.log1p, "sqrt": _m.sqrt,
            "reciprocal": lambda x: 1.0 / x}
    for query, factor, modifier, mode, lang in (
        ("get user", 1.0, "log1p", "multiply", None),
        ("get user if", 0.1, "sqrt", "sum", None),
        ("if return", 2.0, "reciprocal", "multiply", "Python"),
        ("get user", 1.0, "none", "multiply", None),
    ):
        hits = oracle.search(query, k=10**6, lang=lang)
        exp = []
        for d, s in hits:
            fv = mods[modifier](factor * oracle.dls[d])
            exp.append((d, s * fv if mode == "multiply" else s + fv))
        exp.sort(key=lambda t: (-t[1], t[0]))
        exp = [(d, round(s, 9)) for d, s in exp[:10]]
        got = [(r["id"], round(r["score"], 9))
               for r in function_score_search(
                   index, query, factor=factor, modifier=modifier,
                   boost_mode=mode, k=10, lang=lang).collect()]
        assert got == exp, (query, modifier, mode)

    with pytest.raises(ValueError, match="modifier"):
        function_score_search(index, "if", modifier="log2p")
    with pytest.raises(ValueError, match="boost_mode"):
        function_score_search(index, "if", boost_mode="avg")
    with pytest.raises(ValueError, match="factor"):
        function_score_search(index, "if", factor=0)


def test_rare_terms_matches_referee(index, oracle):
    """ES rare_terms: long-tail field values (count ≤ max_doc_count)
    among matches, rare-first — exact (no CuckooFilter approximation),
    every bool shape."""
    from collections import Counter as _C

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        rare_terms,
    )

    for query, op, neg, msm, lang in AGG_QUERIES:
        hits = oracle.search(query, k=10**6, operator=op, must_not=neg,
                             minimum_should_match=msm, lang=lang)
        for field, mdc in (("repo", 2), ("lang", 1)):
            cnt = _C(oracle.meta[d].get(field) for d, _ in hits)
            exp = sorted(((v, n) for v, n in cnt.items() if n <= mdc),
                         key=lambda t: (t[1], t[0]))
            got = [(r["value"], r["n"])
                   for r in rare_terms(index, query, field=field,
                                       max_doc_count=mdc, operator=op,
                                       must_not=neg,
                                       minimum_should_match=msm,
                                       lang=lang).collect()]
            assert got == exp, (query, op, field, mdc)

    # match_all over the corpus
    cnt = _C(m.get("repo") for m in oracle.meta.values())
    exp = sorted(((v, n) for v, n in cnt.items() if n <= 40),
                 key=lambda t: (t[1], t[0]))
    got = [(r["value"], r["n"])
           for r in rare_terms(index, None, field="repo",
                               max_doc_count=40).collect()]
    assert got == exp

    with pytest.raises(ValueError, match="max_doc_count"):
        rare_terms(index, "if", max_doc_count=0)


def test_multi_terms_matches_referee(index, oracle):
    """ES multi_terms: compound (lang, repo) buckets of the match set,
    count desc then keys asc, every bool shape + match_all native."""
    from collections import Counter as _C

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        multi_terms,
    )

    def ref(ids, f1, f2):
        cnt = _C((oracle.meta[d].get(f1), oracle.meta[d].get(f2))
                 for d in ids)
        return sorted(((a, b, n) for (a, b), n in cnt.items()),
                      key=lambda t: (-t[2], t[0], t[1]))

    for query, op, neg, msm, lang in AGG_QUERIES:
        hits = oracle.search(query, k=10**6, operator=op, must_not=neg,
                             minimum_should_match=msm, lang=lang)
        exp = ref([d for d, _ in hits], "lang", "repo")
        got = [(r["v1"], r["v2"], r["n"])
               for r in multi_terms(index, query, fields=("lang", "repo"),
                                    operator=op, must_not=neg,
                                    minimum_should_match=msm,
                                    lang=lang).collect()]
        assert sorted(got) == sorted(exp), (query, op)
        # the (count desc, keys asc) order holds
        assert got == sorted(got, key=lambda t: (-t[2], t[0], t[1]))

    # match_all native path
    exp = ref(list(oracle.meta), "repo", "lang")
    got = [(r["v1"], r["v2"], r["n"])
           for r in multi_terms(index, None,
                                fields=("repo", "lang")).collect()]
    assert sorted(got) == sorted(exp)

    with pytest.raises(ValueError, match="two distinct"):
        multi_terms(index, "if", fields=("lang", "lang"))
    with pytest.raises(ValueError, match="supports fields"):
        multi_terms(index, "if", fields=("lang", "path"))
    with pytest.raises(ValueError, match="must_not"):
        multi_terms(index, None, must_not="if")


def test_histogram_bucket_stats_matches_referee(index, oracle):
    """ES pipeline aggs (max/min/avg/sum_bucket) over the dl
    histogram's sibling buckets — one lazy Catalyst plan; ties toward
    the smallest key."""
    from collections import Counter as _C

    from gitlab_elasticsearch_indexer_spark.operators.query import (
        histogram_bucket_stats,
    )

    for query, op, neg, msm, lang in AGG_QUERIES[:5]:
        hits = oracle.search(query, k=10**6, operator=op, must_not=neg,
                             minimum_should_match=msm, lang=lang)
        buckets = _C((oracle.dls[d] // 10) * 10 for d, _ in hits)
        row = histogram_bucket_stats(
            index, query, 10, operator=op, must_not=neg,
            minimum_should_match=msm, lang=lang).collect()[0]
        if not buckets:
            assert row["sum_n"] is None
            continue
        mxn = max(buckets.values())
        mnn = min(buckets.values())
        assert row["max_n"] == mxn
        assert row["max_key"] == min(k for k, n in buckets.items()
                                     if n == mxn)
        assert row["min_n"] == mnn
        assert row["min_key"] == min(k for k, n in buckets.items()
                                     if n == mnn)
        assert row["sum_n"] == sum(buckets.values())
        assert abs(row["avg_n"] - sum(buckets.values()) / len(buckets)) \
            < 1e-9
