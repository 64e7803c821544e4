"""End-to-end CLI coverage of the reference binary's surface
(main.go:16-18,46-47,69-79): blob + commit indexing by default,
--skip-commits / --blob-type wiki_blob opt-outs, incremental update,
and typed search."""

import json
from datetime import datetime

import pytest

from gitlab_elasticsearch_indexer_spark.__main__ import main

SRC_SCHEMA = "repo string, path string, commit string, lang string, content string"
COMMIT_SCHEMA = (
    "repo string, sha string, author_name string, author_email string, "
    "author_time timestamp, committer_name string, committer_email string, "
    "committer_time timestamp, message string"
)


@pytest.fixture()
def dirs(spark, tmp_path):
    src = str(tmp_path / "src")
    commits = str(tmp_path / "commits")
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [
            ("repo1", "src/app.py", "a" * 40, "Python", "def getUserById if return"),
            ("repo1", "src/db.py", "b" * 40, "Python", "table scan merge index"),
            ("repo2", "lib/util.rb", "c" * 40, "Ruby", "def helper method end"),
        ],
        SRC_SCHEMA,
    ).write.parquet(src)
    spark.createDataFrame(
        [
            ("repo1", "d" * 40, "alice", "a@x.io", datetime(2024, 1, 2, 3, 4, 5),
             "bob", "b@x.io", datetime(2024, 1, 2, 3, 4, 6), "Fixes the login flow"),
            ("repo1", "e" * 40, "bob", "b@x.io", datetime(2024, 2, 2, 3, 4, 5),
             "bob", "b@x.io", datetime(2024, 2, 2, 3, 4, 6), "Adds search endpoint"),
            ("repo2", "f" * 40, "eve", "e@x.io", datetime(2024, 3, 2, 3, 4, 5),
             "eve", "e@x.io", datetime(2024, 3, 2, 3, 4, 6), "Refactor helpers"),
        ],
        COMMIT_SCHEMA,
    ).write.parquet(commits)
    return src, commits, idx


def _lines(capsys):
    return [json.loads(l) for l in capsys.readouterr().out.strip().splitlines() if l]


def test_cli_build_search_commits_update(spark, dirs, capsys, tmp_path):
    src, commits, idx = dirs

    assert main(["build", "--source", src, "--index", idx, "--commits", commits]) == 0
    out = _lines(capsys)[-1]
    assert out["built"] == 3 and out["commits_built"] == 3

    # commit-message search (default analyzer: 'fixes' stems to 'fixe',
    # matching the indexed 'Fixes' — B6 end-to-end through the CLI)
    assert main(["search", "--index", idx, "--doc-type", "commit",
                 "--query", "fixes login"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo1_" + "d" * 40

    # blob search still works beside the commit index
    assert main(["search", "--index", idx, "--query", "getUserById", "--bmw"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo1_src/app.py"

    # incremental update: new file lands, old content survives
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [
            ("repo1", "src/app.py", "a" * 40, "Python", "def getUserById if return"),
            ("repo1", "src/db.py", "b" * 40, "Python", "table scan merge index"),
            ("repo2", "lib/util.rb", "c" * 40, "Ruby", "def helper method end"),
            ("repo2", "lib/new.rb", "9" * 40, "Ruby", "def brandNewFunction end"),
        ],
        SRC_SCHEMA,
    ).write.parquet(src2)
    assert main(["update", "--source", src2, "--index", idx, "--snapshot", "1"]) == 0
    assert _lines(capsys)[-1]["n_docs"] == 4

    assert main(["search", "--index", idx, "--query", "brandNewFunction", "--bmw"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo2_lib/new.rb"

    # the doc store follows the update: typed GET sees the new file
    assert main(["get", "--index", idx, "--parent", "repo2",
                 "--path", "lib/new.rb"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1 and rows[0]["content"] == "def brandNewFunction end"


def test_cli_update_maintains_commit_index(spark, dirs, capsys, tmp_path):
    """The reference re-indexes commits on every incremental run unless
    --skip-commits (main.go:73-77): an update given the commit snapshot
    must make new commit messages searchable and typed-GETtable."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx, "--commits", commits]) == 0
    _lines(capsys)

    commits2 = str(tmp_path / "commits2")
    spark.read.parquet(commits).unionByName(
        spark.createDataFrame(
            [("repo2", "1" * 40, "mallory", "m@x.io",
              datetime(2024, 4, 2, 3, 4, 5), "mallory", "m@x.io",
              datetime(2024, 4, 2, 3, 4, 6), "Hardens threadsafe quicksort")],
            COMMIT_SCHEMA,
        )
    ).write.parquet(commits2)
    assert main(["update", "--source", src, "--index", idx,
                 "--snapshot", "1", "--commits", commits2]) == 0
    out = _lines(capsys)[-1]
    assert out["n_docs"] == 3 and out["commits_n_docs"] == 4

    assert main(["search", "--index", idx, "--doc-type", "commit",
                 "--query", "threadsafe quicksort"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo2_" + "1" * 40

    assert main(["get", "--index", idx, "--type", "commit",
                 "--parent", "repo2", "--sha", "1" * 40]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1 and rows[0]["message"] == "Hardens threadsafe quicksort"

    # --skip-commits leaves the commit index at its previous snapshot
    assert main(["update", "--source", src, "--index", idx,
                 "--snapshot", "2", "--commits", commits2,
                 "--skip-commits"]) == 0
    assert "commits_n_docs" not in _lines(capsys)[-1]


def test_cli_wiki_blob_and_skip_commits(spark, dirs, capsys, tmp_path):
    src, commits, idx = dirs
    widx = str(tmp_path / "widx")

    # wiki_blob: rid carries the wiki_ prefix (indexer/indexer.go:53-69);
    # commits are never indexed for wiki builds (main.go:73-77)
    assert main(["build", "--source", src, "--index", widx,
                 "--blob-type", "wiki_blob", "--commits", commits]) == 0
    out = _lines(capsys)[-1]
    assert out["blob_type"] == "wiki_blob" and "commits_built" not in out

    # the doc id keeps the plain "{repo}_{path}" form; ONLY rid carries
    # the wiki_ prefix (indexer/blob.go:58-60 vs :100-102)
    assert main(["search", "--index", widx, "--query", "helper"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo2_lib/util.rb"
    assert hits[0]["repo"] == "wiki_repo2"

    # --skip-commits suppresses the commit index even when provided
    sidx = str(tmp_path / "sidx")
    assert main(["build", "--source", src, "--index", sidx,
                 "--commits", commits, "--skip-commits"]) == 0
    assert "commits_built" not in _lines(capsys)[-1]


def test_cli_msearch_batch(spark, dirs, capsys, tmp_path):
    """msearch (ES _msearch analog): a JSON batch of plain and filtered
    entries answers in one job and agrees with per-query search."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    qfile = str(tmp_path / "queries.json")
    with open(qfile, "w") as fh:
        json.dump({
            "plain": "table scan",
            "flt": {"q": "def", "lang": "Ruby"},
            "scoped": {"q": "getUserById", "repo": "repo1"},
        }, fh)
    assert main(["msearch", "--index", idx, "--queries", qfile, "--bmw"]) == 0
    rows = _lines(capsys)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
    assert by_q["plain"][0][1] == "repo1_src/db.py"
    assert [i for _, i in by_q["flt"]] == ["repo2_lib/util.rb"]
    assert by_q["scoped"][0][1] == "repo1_src/app.py"

    # agrees with the single-query surface
    assert main(["search", "--index", idx, "--query", "def",
                 "--lang", "Ruby"]) == 0
    single = _lines(capsys)
    assert [h["id"] for h in single] == [i for _, i in by_q["flt"]]


def test_cli_bool_operator_and_must_not(spark, dirs, capsys, tmp_path):
    """--operator and (simple_query_string default_operator AND) and
    --not (bool must_not) on the search CLI, plus the same spec keys
    through msearch; conflicting flags are rejected."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    # "def" appears in app.py and util.rb; only app.py also has "return"
    assert main(["search", "--index", idx, "--query", "def return",
                 "--operator", "and"]) == 0
    hits = _lines(capsys)
    assert [h["id"] for h in hits] == ["repo1_src/app.py"]

    # exclusion: "def" minus docs containing "helper" leaves app.py
    assert main(["search", "--index", idx, "--query", "def",
                 "--not", "helper"]) == 0
    hits = _lines(capsys)
    assert [h["id"] for h in hits] == ["repo1_src/app.py"]

    # batched parity through the msearch JSON spec
    qfile = str(tmp_path / "bool_queries.json")
    with open(qfile, "w") as fh:
        json.dump({
            "conj": {"q": "def return", "operator": "and"},
            "excl": {"q": "def", "must_not": "helper"},
        }, fh)
    assert main(["msearch", "--index", idx, "--queries", qfile]) == 0
    rows = _lines(capsys)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["id"])
    assert by_q == {"conj": ["repo1_src/app.py"],
                    "excl": ["repo1_src/app.py"]}

    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--operator", "and", "--phrase"])
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--sha", "abcdef1", "--not", "x"])


def test_cli_minimum_should_match(spark, dirs, capsys, tmp_path):
    """--min-should-match N (ES minimum_should_match) on search, count,
    facets, and the msearch spec key; conflicting flags rejected."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    # ≥2 of {def, table, helper}: only util.rb (def+helper) qualifies
    assert main(["search", "--index", idx, "--query", "def table helper",
                 "--min-should-match", "2", "--facet", "lang"]) == 0
    out = _lines(capsys)
    facets = out[0]["facets"]
    hits = [h for h in out[1:] if "id" in h]
    assert [h["id"] for h in hits] == ["repo2_lib/util.rb"]
    assert facets == {"lang": {"Ruby": 1}}  # aggs match the msm hits

    assert main(["count", "--index", idx, "--query", "def table helper",
                 "--min-should-match", "2"]) == 0
    assert _lines(capsys)[0]["count"] == 1

    # batched parity through the msearch JSON spec
    qfile = str(tmp_path / "msm_queries.json")
    with open(qfile, "w") as fh:
        json.dump({
            "m2": {"q": "def table helper", "minimum_should_match": 2},
        }, fh)
    assert main(["msearch", "--index", idx, "--queries", qfile]) == 0
    rows = _lines(capsys)
    assert [r["id"] for r in rows] == ["repo2_lib/util.rb"]

    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--operator", "and", "--min-should-match", "2"])
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--min-should-match", "2", "--phrase"])
    with pytest.raises(SystemExit):
        main(["count", "--index", idx, "--query", "de", "--prefix",
              "--min-should-match", "2"])


def test_cli_sort_search(spark, dirs, capsys):
    """search --sort FIELD[:asc|desc] (ES sort clause): field-ordered
    hits with the sort key in the ES hit.sort array, no scores."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    # "def" matches app.py (src/app.py) and util.rb (lib/util.rb)
    assert main(["search", "--index", idx, "--query", "def",
                 "--sort", "path:asc"]) == 0
    hits = _lines(capsys)
    assert [h["id"] for h in hits] == ["repo2_lib/util.rb",
                                       "repo1_src/app.py"]
    assert "score" not in hits[0] and hits[0]["sort"][0] == "lib/util.rb"

    assert main(["search", "--index", idx, "--query", "def",
                 "--sort", "path:desc"]) == 0
    assert [h["id"] for h in _lines(capsys)] == ["repo1_src/app.py",
                                                 "repo2_lib/util.rb"]

    # numeric sort + cursor: page 2 via the hit.sort values
    assert main(["search", "--index", idx, "--query", "def",
                 "--sort", "dl:desc", "--k", "1"]) == 0
    h1 = _lines(capsys)[0]
    assert main(["search", "--index", idx, "--query", "def",
                 "--sort", "dl:desc", "--k", "1",
                 "--after", str(h1["sort"][0]), h1["sort"][1]]) == 0
    h2 = _lines(capsys)[0]
    assert h2["id"] != h1["id"] and h2["dl"] <= h1["dl"]

    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--sort", "path:up"])
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--sort", "path", "--phrase"])
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--sort", "path", "--bmw"])


def test_cli_dl_range_filter(spark, tmp_path, capsys):
    """--dl-min/--dl-max (ES range filter over dl) on search and count;
    aggregations beside the hits respect the band."""
    src = str(tmp_path / "src_dl")
    idx = str(tmp_path / "idx_dl")
    spark.createDataFrame(
        [
            ("r1", "short.py", "a" * 40, "Python", "def alpha"),
            ("r1", "long.py", "b" * 40, "Python",
             "def alpha beta gamma delta epsilon zeta"),
        ],
        SRC_SCHEMA,
    ).write.parquet(src)
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    # learn the two matching docs' dls from the stats agg
    assert main(["search", "--index", idx, "--query", "def", "--stats"]) == 0
    out = _lines(capsys)
    stats = out[0]["stats"]
    assert stats["count"] == 2 and stats["min_dl"] < stats["max_dl"]

    # a band excluding the smaller doc keeps exactly the bigger one
    assert main(["search", "--index", idx, "--query", "def",
                 "--dl-min", str(stats["min_dl"] + 1), "--stats"]) == 0
    out = _lines(capsys)
    assert out[0]["stats"]["count"] == 1
    hits = [h for h in out[1:] if "id" in h]
    assert len(hits) == 1 and hits[0]["id"] != ""

    assert main(["count", "--index", idx, "--query", "def",
                 "--dl-max", str(stats["min_dl"])]) == 0
    assert _lines(capsys)[0]["count"] == 1

    # composes with --sort
    assert main(["search", "--index", idx, "--query", "def",
                 "--sort", "dl:desc", "--dl-max", str(stats["min_dl"])]) == 0
    hits = _lines(capsys)
    assert len(hits) == 1 and hits[0]["dl"] == stats["min_dl"]

    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def", "--phrase",
              "--dl-min", "1"])


def test_cli_msearch_sorted_entries(spark, dirs, capsys, tmp_path):
    """msearch bodies with a sort clause (ES sorted _msearch): field
    order, null scores, mixed with scored entries in one batch."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    qfile = str(tmp_path / "sorted_queries.json")
    with open(qfile, "w") as fh:
        json.dump({
            "by_path": {"q": "def", "sort": "path"},
            "scored": "def",
        }, fh)
    assert main(["msearch", "--index", idx, "--queries", qfile]) == 0
    rows = _lines(capsys)
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    sorted_rows = sorted(by_q["by_path"], key=lambda r: r["rank"])
    # "def" matches app.py (src/app.py) and util.rb (lib/util.rb)
    assert [r["id"] for r in sorted_rows] == ["repo2_lib/util.rb",
                                              "repo1_src/app.py"]
    assert all(r["score"] is None for r in sorted_rows)
    assert all(r["score"] is not None for r in by_q["scored"])


def test_cli_more_like_this(spark, dirs, capsys):
    """search --like DOC_ID (ES more_like_this analog): similar docs by
    shared interesting terms, the source doc excluded."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    # min_doc_freq=2 keeps only terms shared with another doc ('def' +
    # its grams): app.py and util.rb share them; db.py shares nothing
    assert main(["search", "--index", idx, "--like", "repo1_src/app.py",
                 "--min-doc-freq", "2"]) == 0
    hits = _lines(capsys)
    ids = [h["id"] for h in hits]
    assert "repo2_lib/util.rb" in ids
    assert "repo1_src/app.py" not in ids  # include: false
    assert "repo1_src/db.py" not in ids

    # min_doc_freq above every df → nothing is interesting → no hits
    assert main(["search", "--index", idx, "--like", "repo1_src/app.py",
                 "--min-doc-freq", "99"]) == 0
    assert _lines(capsys) == []

    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--like", "x", "--query", "y"])
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--like", "x", "--operator", "and"])
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--like", "x", "--phrase"])


def test_cli_stats_and_histogram(spark, dirs, capsys):
    """--stats / --histogram print ES-style dl aggregations beside the
    hits (semantics pinned in test_engine; this drives the CLI)."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "def",
                 "--stats", "--histogram", "5"]) == 0
    out = _lines(capsys)
    stats = out[0]["stats"]
    hist = out[1]["histogram"]
    hits = [h for h in out[2:] if "id" in h]
    # "def" matches app.py and util.rb
    assert {h["id"] for h in hits} == {"repo1_src/app.py",
                                       "repo2_lib/util.rb"}
    assert stats["count"] == 2
    assert stats["min_dl"] <= stats["max_dl"]
    assert stats["sum_dl"] >= stats["count"] * stats["min_dl"]
    assert abs(stats["avg_dl"] - stats["sum_dl"] / 2) < 1e-9
    assert sum(hist.values()) == 2

    # zero matches: count 0, null min/max/avg, empty histogram
    assert main(["search", "--index", idx, "--query", "zzznope",
                 "--stats", "--histogram", "5"]) == 0
    out = _lines(capsys)
    assert out[0]["stats"] == {"count": 0, "sum_dl": 0, "min_dl": None,
                               "max_dl": None, "avg_dl": None}
    assert out[1]["histogram"] == {}

    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def x", "--qs",
              "--stats"])


def test_cli_search_after_cursor(spark, dirs, capsys):
    """--after SCORE ID (ES search_after): page 2 continues exactly
    where page 1's last hit left off."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "def", "--k", "1"]) == 0
    p1 = _lines(capsys)
    assert len(p1) == 1
    score, hit_id = p1[0]["sort"]  # full-precision ES-style sort values
    assert main(["search", "--index", idx, "--query", "def", "--k", "1",
                 "--after", repr(score), hit_id]) == 0
    p2 = _lines(capsys)
    assert len(p2) == 1 and p2[0]["id"] != p1[0]["id"]

    # --after composes with every query shape; a single-term --qs body
    # dispatches to the same ranking, so the cursor lands on the same doc
    assert main(["search", "--index", idx, "--query", "def", "--qs",
                 "--k", "1", "--after", repr(score), hit_id]) == 0
    p2_qs = _lines(capsys)
    assert [r["id"] for r in p2_qs] == [p2[0]["id"]]

    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--after", "1.0", "x", "--from", "5"])


def test_cli_explain(spark, dirs, capsys):
    """explain (ES _explain analog): per-term clauses sum to the hit's
    search score."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "def helper"]) == 0
    hit = _lines(capsys)[0]
    assert main(["explain", "--index", idx, "--query", "def helper",
                 "--id", hit["id"]]) == 0
    ex = _lines(capsys)[0]
    assert ex["id"] == hit["id"]
    assert ex["score"] == pytest.approx(hit["sort"][0], rel=1e-12)
    assert ex["matched"] == len(ex["clauses"]) >= 1
    assert {c["term"] for c in ex["clauses"]} <= {"def", "helper"}


def test_cli_update_delta_applies_change_set(spark, dirs, capsys, tmp_path):
    """update-delta: the reference's FROM→TO contract (main.go:46-47) on
    the CLI — a pre-classified change set (NULL content = delete) runs
    through the O(batch) delta path; the plain-snapshot `update` is no
    longer the only operational surface."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx]) == 0
    _lines(capsys)

    changes = str(tmp_path / "changes")
    spark.createDataFrame(
        [
            ("repo1", "src/app.py", "9" * 40, "Python",
             "def getUserById if return patchedDelta"),      # modify
            ("repo2", "lib/fresh.rb", "8" * 40, "Ruby",
             "def freshDeltaFunction end"),                  # add
            ("repo1", "src/db.py", "7" * 40, "Python", None),  # delete
        ],
        SRC_SCHEMA,
    ).write.parquet(changes)
    assert main(["update-delta", "--changes", changes, "--index", idx,
                 "--snapshot", "1"]) == 0
    out = _lines(capsys)[-1]
    assert out["n_docs"] == 3  # 3 - 1 deleted + 1 added
    assert out["n_dead"] == 2 and out["n_appended"] == 2
    assert out["classify_fallback"] is None  # repo-routed classify

    assert main(["search", "--index", idx, "--query", "freshDeltaFunction"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo2_lib/fresh.rb"
    assert main(["search", "--index", idx, "--query", "patchedDelta"]) == 0
    assert _lines(capsys)[0]["id"] == "repo1_src/app.py"
    assert main(["search", "--index", idx, "--query", "table scan merge"]) == 0
    assert all(h["id"] != "repo1_src/db.py" for h in _lines(capsys))

    # the _source store followed the delta: add visible, delete gone
    assert main(["get", "--index", idx, "--parent", "repo2",
                 "--path", "lib/fresh.rb"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1 and rows[0]["content"] == "def freshDeltaFunction end"
    assert main(["get", "--index", idx, "--parent", "repo1",
                 "--path", "src/db.py"]) == 0
    assert _lines(capsys) == []


def test_cli_wiki_blob_survives_update(spark, dirs, capsys, tmp_path):
    """A wiki_blob index must stay wiki-typed through `update` and
    `update-delta` (the reference updates whatever blob type it was
    launched with, main.go:69): rid keeps the wiki_ prefix."""
    src, commits, idx = dirs
    widx = str(tmp_path / "widx2")
    assert main(["build", "--source", src, "--index", widx,
                 "--blob-type", "wiki_blob"]) == 0
    _lines(capsys)

    src2 = str(tmp_path / "wsrc2")
    spark.read.parquet(src).unionByName(
        spark.createDataFrame(
            [("repo2", "lib/wiki_new.rb", "9" * 40, "Ruby",
              "def wikiUpdatedPage end")], SRC_SCHEMA)
    ).write.parquet(src2)
    assert main(["update", "--source", src2, "--index", widx,
                 "--snapshot", "1"]) == 0
    assert _lines(capsys)[-1]["n_docs"] == 4

    assert main(["search", "--index", widx, "--query", "wikiUpdatedPage"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["repo"] == "wiki_repo2"  # type replayed
    assert hits[0]["id"] == "repo2_lib/wiki_new.rb"

    # typed GET with the wiki type still resolves after the update
    assert main(["get", "--index", widx, "--type", "wiki_blob",
                 "--parent", "repo2", "--path", "lib/wiki_new.rb"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1 and rows[0]["content"] == "def wikiUpdatedPage end"

    # and the delta surface keeps the type too
    changes = str(tmp_path / "wchanges")
    spark.createDataFrame(
        [("repo1", "docs/page.md", "6" * 40, "Markdown",
          "wikiDeltaPage content"),
         ("repo2", "lib/util.rb", "5" * 40, "Ruby", None)],  # wiki delete
        SRC_SCHEMA).write.parquet(changes)
    assert main(["update-delta", "--changes", changes, "--index", widx,
                 "--snapshot", "2"]) == 0
    out = _lines(capsys)[-1]
    assert out["n_docs"] == 4  # +1 page, -1 deleted wiki blob
    assert out["classify_fallback"] is None  # wiki_rid-routed classify
    assert main(["search", "--index", widx, "--query", "wikiDeltaPage"]) == 0
    assert _lines(capsys)[0]["repo"] == "wiki_repo1"
    assert main(["search", "--index", widx, "--query", "helper"]) == 0
    assert all(h["id"] != "repo2_lib/util.rb" for h in _lines(capsys))


def test_cli_typed_get_returns_stored_source(spark, dirs, capsys):
    """GetBlob/GetCommit analogs (elastic/client.go:170-185): typed point
    lookups return the full stored document including content."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx, "--commits", commits]) == 0
    _lines(capsys)

    assert main(["get", "--index", idx, "--parent", "repo1",
                 "--path", "src/app.py"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert rows[0]["content"] == "def getUserById if return"
    assert rows[0]["type"] == "blob" and rows[0]["language"] == "Python"

    assert main(["get", "--index", idx, "--type", "commit",
                 "--parent", "repo1", "--sha", "d" * 40]) == 0
    rows = _lines(capsys)
    assert len(rows) == 1
    assert rows[0]["message"] == "Fixes the login flow"
    assert rows[0]["author"]["name"] == "alice"

    # miss → zero rows, no error
    assert main(["get", "--index", idx, "--parent", "repo1",
                 "--path", "no/such.file"]) == 0
    assert _lines(capsys) == []


def test_cli_search_highlight_and_status(spark, dirs, capsys):
    """--highlight attaches matching source lines (ES highlight analog;
    content via store point reads) and `status` reports checkpoint +
    manifest health."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx, "--commits", commits]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "getUserById",
                 "--highlight"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo1_src/app.py"
    frags = hits[0]["highlight"]
    assert frags and frags[0]["line_no"] == 1
    assert "getUserById" in frags[0]["line"]

    # commit-index highlighting reads the message column
    assert main(["search", "--index", idx, "--doc-type", "commit",
                 "--query", "login", "--highlight"]) == 0
    chits = _lines(capsys)
    assert chits and any("login" in f["line"] for f in chits[0]["highlight"])

    assert main(["status", "--index", idx]) == 0
    st = _lines(capsys)[-1]
    assert st["latest"]["snapshot_id"] == 0 and st["latest"]["op"] == "full_build"
    assert st["has_doc_store"] and st["has_commit_index"]
    assert st["blob_type"] == "blob"
    assert sum(st["manifest_parts_by_version"].values()) >= 1
    assert sum(st["term_buckets_by_version"].values()) == 64


def test_point_read_documents_matches_store(spark, dirs, tmp_path):
    """The driver-side store point reader returns exactly the stored
    rows for present ids and skips absent ones — across partitions."""
    from gitlab_elasticsearch_indexer_spark.sources import doc_store as ds

    docs = spark.createDataFrame(
        [(f"r1_f{i:04d}.py", "blob", f"body {i}") for i in range(300)],
        "id string, type string, content string",
    )
    path = str(tmp_path / "pridx")
    ds.save_documents(docs, path)
    ids = ["r1_f0000.py", "r1_f0123.py", "r1_f0299.py", "r1_missing.py"]
    got = ds.point_read_documents(path, ids)
    assert set(got) == set(ids) - {"r1_missing.py"}
    assert got["r1_f0123.py"]["content"] == "body 123"


def test_strict_schema_rejects_unknown_fields(spark):
    """'dynamic': 'strict' analog (elastic/index.go:114; rejection test
    elastic/client_test.go:191-195): unmapped document fields error."""
    import pytest as _pt

    from gitlab_elasticsearch_indexer_spark.operators.pipeline import (
        StrictSchemaError,
        build_blob_documents,
        enforce_strict_schema,
    )

    docs = spark.createDataFrame(
        [("r1", "a.py", "c" * 40, "Python", "body", 4)],
        "repo string, path string, commit string, lang string, content string, size long",
    )
    good = build_blob_documents(docs)
    assert enforce_strict_schema(good) is good  # exact mapping passes

    bad = good.withColumn("rogue_field", good["id"])
    with _pt.raises(StrictSchemaError, match="rogue_field"):
        enforce_strict_schema(bad)
    with _pt.raises(StrictSchemaError, match="oid"):
        enforce_strict_schema(good, doc_type="commit")  # blob cols ∉ commit mapping


def test_cli_count_and_facets(spark, dirs, capsys):
    """`count` (ES _count analog) and search --facet (terms aggregation)
    report match counts over ALL matching docs, not just top-k."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx, "--commits", commits]) == 0
    _lines(capsys)

    assert main(["count", "--index", idx, "--query", "def"]) == 0
    assert _lines(capsys)[-1]["count"] == 2  # app.py + util.rb contain "def"

    assert main(["count", "--index", idx, "--query", "def", "--repo", "repo1"]) == 0
    assert _lines(capsys)[-1]["count"] == 1

    assert main(["search", "--index", idx, "--query", "def",
                 "--facet", "lang", "--facet", "repo"]) == 0
    out = _lines(capsys)
    facets = out[0]["facets"]
    assert facets["lang"] == {"Python": 1, "Ruby": 1}
    assert facets["repo"] == {"repo1": 1, "repo2": 1}
    assert {h["id"] for h in out[1:]} == {"repo1_src/app.py", "repo2_lib/util.rb"}


def test_cli_build_positions_and_phrase_search(spark, dirs, capsys):
    """build --positions + search --phrase: exact-phrase queries through
    the CLI, blob (whitespace sub-field on the code index) and commit
    (default-analyzer positions) alike; status reports the sidecar."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--commits", commits, "--positions"]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "table scan",
                 "--phrase"]) == 0
    hits = _lines(capsys)
    assert [h["id"] for h in hits] == ["repo1_src/db.py"]

    # adjacency matters: reversed order must not match
    assert main(["search", "--index", idx, "--query", "scan table",
                 "--phrase"]) == 0
    assert _lines(capsys) == []

    # commit index: default analyzer (stemmed) positions
    assert main(["search", "--index", idx, "--doc-type", "commit",
                 "--query", "login flow", "--phrase"]) == 0
    chits = _lines(capsys)
    assert len(chits) == 1 and "d" * 40 in chits[0]["id"]

    assert main(["status", "--index", idx]) == 0
    assert _lines(capsys)[-1]["has_positions"] is True


def test_cli_fields_sha_and_msearch_fields(spark, dirs, capsys, tmp_path):
    """build --field / search --fields / search --sha (blob oid AND
    commit sha) / msearch fields entries — the multi-field surface end
    to end through the CLI, including the update path maintaining the
    commit index's sha field."""
    import hashlib

    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--commits", commits, "--field", "file_name",
                 "--field", "oid"]) == 0
    _lines(capsys)

    # filename query hits the file whose name never appears in content
    assert main(["search", "--index", idx, "--query", "util.rb",
                 "--fields", "file_name", "--k", "2"]) == 0
    rows = _lines(capsys)
    assert rows and rows[0]["id"] == "repo2_lib/util.rb"

    # blob oid prefix lookup
    pfx = hashlib.sha256(b"table scan merge index").hexdigest()[:7]
    assert main(["search", "--index", idx, "--sha", pfx, "--k", "2"]) == 0
    rows = _lines(capsys)
    assert [r["id"] for r in rows] == ["repo1_src/db.py"]

    # commit sha prefix lookup (sha field on the commit index)
    assert main(["search", "--index", idx, "--doc-type", "commit",
                 "--sha", "e" * 7, "--k", "2"]) == 0
    rows = _lines(capsys)
    assert [r["id"] for r in rows] == ["repo1_" + "e" * 40]

    # explain --fields: per-(field, term) clause rows reassemble the
    # multi-field score the search reported (boost syntax included)
    assert main(["search", "--index", idx, "--query", "util.rb merge",
                 "--fields", "content,file_name^2", "--k", "1"]) == 0
    hit = _lines(capsys)[0]
    assert main(["explain", "--index", idx, "--query", "util.rb merge",
                 "--fields", "content,file_name^2", "--id", hit["id"]]) == 0
    ex = _lines(capsys)[0]
    assert abs(ex["score"] - hit["score"]) < 1e-4
    assert all("field" in c for c in ex["clauses"])

    # msearch with a fields entry mixed with a plain term entry
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps({
        "f1": {"q": "app.py", "fields": ["file_name"]},
        "t1": "merge index",
    }))
    assert main(["msearch", "--index", idx, "--queries", str(qf),
                 "--k", "2"]) == 0
    rows = _lines(capsys)
    got = {r["query_id"]: r["id"] for r in rows if r["rank"] == 1}
    assert got["f1"] == "repo1_src/app.py"
    assert got["t1"] == "repo1_src/db.py"

    # the update path maintains the commit sha field: a fresh commit's
    # prefix resolves after update
    from datetime import datetime as _dt

    commits2 = str(tmp_path / "commits2")
    spark.read.parquet(commits).unionByName(spark.createDataFrame(
        [("repo1", "9" * 40, "zoe", "z@x.io", _dt(2024, 4, 1, 0, 0, 0),
          "zoe", "z@x.io", _dt(2024, 4, 1, 0, 0, 1), "New thing")],
        COMMIT_SCHEMA,
    )).write.parquet(commits2)
    assert main(["update", "--source", src, "--index", idx,
                 "--snapshot", "1", "--commits", commits2]) == 0
    _lines(capsys)
    assert main(["search", "--index", idx, "--doc-type", "commit",
                 "--sha", "9" * 8, "--k", "2"]) == 0
    rows = _lines(capsys)
    assert [r["id"] for r in rows] == ["repo1_" + "9" * 40]

    # argument validation: --query and --sha are mutually exclusive,
    # and a <5-char prefix can't match any sha gram
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--query", "x", "--sha", "abcde"])
    with pytest.raises(SystemExit):
        main(["search", "--index", idx, "--sha", "abcd"])


def test_cli_mget_batch_point_lookup(spark, dirs, capsys):
    """ES _mget analog: one JSON line per requested id in request order,
    found=false for misses, content via driver-side store point reads."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    assert main(["mget", "--index", idx,
                 "repo1_src/app.py", "repo9_no/such.file",
                 "repo2_lib/util.rb"]) == 0
    rows = _lines(capsys)
    assert [r["id"] for r in rows] == [
        "repo1_src/app.py", "repo9_no/such.file", "repo2_lib/util.rb"
    ]
    assert [r["found"] for r in rows] == [True, False, True]
    assert rows[0]["content"] == "def getUserById if return"
    assert "content" not in rows[1]


def test_cli_prefix_search(spark, dirs, capsys):
    """--prefix expands the term dictionary (ES prefix / trailing-*
    analog) so `getuser` finds getUserById without the full term."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "getuser",
                 "--prefix"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo1_src/app.py"

    # no vocabulary match → zero hits, clean exit
    assert main(["search", "--index", idx, "--query", "zzz",
                 "--prefix"]) == 0
    assert _lines(capsys) == []


def test_cli_fuzzy_search(spark, dirs, capsys):
    """--fuzzy finds docs through a typo: 'mrege' is 2 edits from the
    indexed 'merge' capture."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "mrege",
                 "--fuzzy", "--max-edits", "2"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo1_src/db.py"

    # budget 1 is not enough for the transposition-as-2-edits typo
    assert main(["search", "--index", idx, "--query", "mrege",
                 "--fuzzy", "--max-edits", "1"]) == 0
    assert all(h["id"] != "repo1_src/db.py" for h in _lines(capsys))


def test_cli_wildcard_search(spark, dirs, capsys):
    """--wildcard finds docs through a pattern: 'ge?user*' matches the
    getuserbyid capture chain."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "ge?user*",
                 "--wildcard"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo1_src/app.py"

    assert main(["search", "--index", idx, "--query", "zz*zz",
                 "--wildcard"]) == 0
    assert _lines(capsys) == []


def test_cli_regexp_search(spark, dirs, capsys):
    """--regexp finds docs through a whole-term-anchored pattern:
    'ge.user.*' matches the getuserbyid capture chain."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    assert main(["search", "--index", idx, "--query", "ge.user.*",
                 "--regexp"]) == 0
    hits = _lines(capsys)
    assert hits and hits[0]["id"] == "repo1_src/app.py"

    assert main(["search", "--index", idx, "--query", "zz.*zz",
                 "--regexp"]) == 0
    assert _lines(capsys) == []

    # --facet with a rewrite counts the docs the rewrite scores (the
    # expansion rides facet_counts' pre_terms seam)
    assert main(["search", "--index", idx, "--query", "getuser.*",
                 "--regexp", "--facet", "lang"]) == 0
    out = _lines(capsys)
    assert out[0]["facets"]["lang"] == {"Python": 1}
    assert [h["id"] for h in out[1:]] == ["repo1_src/app.py"]


def test_cli_analyze(capsys):
    """`analyze` (ES _analyze analog) prints the chain's (term, tf) with
    no Spark session: index-side code chain edgeNGrams, query-side
    simple chain lowercases + asciifolds only."""
    assert main(["analyze", "--text", "getUserById"]) == 0
    out = _lines(capsys)[0]
    assert out["analyzer"] == "code" and out["side"] == "index"
    assert out["tokens"]["getuserbyid"] == 1
    # edgeNGram floor: 'ge' emitted by both the full token and the
    # 'get' capture
    assert out["tokens"]["ge"] == 2

    assert main(["analyze", "--analyzer", "simple", "--search",
                 "--text", "GetUser Été"]) == 0
    out = _lines(capsys)[0]
    assert out["side"] == "search"
    assert out["tokens"] == {"getuser": 1, "ete": 1}
    assert out["dl"] == 2


def test_cli_count_rewrites(spark, dirs, capsys):
    """count --prefix/--fuzzy/--wildcard counts docs matching ANY
    expansion — consistent with the corresponding search hits."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    # 'getuser*' expansions live only in repo1_src/app.py
    assert main(["count", "--index", idx, "--query", "getuser",
                 "--prefix"]) == 0
    assert _lines(capsys)[0]["count"] == 1

    assert main(["count", "--index", idx, "--query", "mrege",
                 "--fuzzy", "--max-edits", "2"]) == 0
    assert _lines(capsys)[0]["count"] == 1

    assert main(["count", "--index", idx, "--query", "zz*zz",
                 "--wildcard"]) == 0
    assert _lines(capsys)[0]["count"] == 0

    # regexp rides the same pre_terms seam as the other rewrites
    assert main(["count", "--index", idx, "--query", "getuser.*",
                 "--regexp"]) == 0
    assert _lines(capsys)[0]["count"] == 1

    assert main(["count", "--index", idx, "--query", "zz.*zz",
                 "--regexp"]) == 0
    assert _lines(capsys)[0]["count"] == 0


def test_cli_terms_filters(spark, dirs, capsys):
    """Repeated --lang/--repo flags form an ES terms filter (match ANY
    value) in search and count."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    # 'def' lives in repo1 (app.py) and repo2 (util.rb)
    assert main(["search", "--index", idx, "--query", "def",
                 "--repo", "repo1", "--repo", "repo2"]) == 0
    both = {h["id"] for h in _lines(capsys)}
    assert both == {"repo1_src/app.py", "repo2_lib/util.rb"}

    assert main(["search", "--index", idx, "--query", "def",
                 "--repo", "repo2"]) == 0
    assert {h["id"] for h in _lines(capsys)} == {"repo2_lib/util.rb"}

    # lang terms filter on count
    assert main(["count", "--index", idx, "--query", "def",
                 "--lang", "Python", "--lang", "Ruby"]) == 0
    assert _lines(capsys)[0]["count"] == 2
    assert main(["count", "--index", idx, "--query", "def",
                 "--lang", "Go"]) == 0
    assert _lines(capsys)[0]["count"] == 0


def test_cli_phrase_prefix_search(spark, dirs, capsys):
    """--phrase-prefix (ES match_phrase_prefix analog): the last token
    is a prefix completed by vocabulary expansions at the next
    position."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits", "--positions"]) == 0
    _lines(capsys)

    # 'table sc' completes to 'table scan' (db.py); app.py has no match
    assert main(["search", "--index", idx, "--query", "table sc",
                 "--phrase-prefix"]) == 0
    assert [h["id"] for h in _lines(capsys)] == ["repo1_src/db.py"]

    # adjacency still matters: 'scan ta' (reversed) must not match
    assert main(["search", "--index", idx, "--query", "scan ta",
                 "--phrase-prefix"]) == 0
    assert _lines(capsys) == []

    # one-token prefix degenerates to summed-tf prefix matching
    assert main(["search", "--index", idx, "--query", "me",
                 "--phrase-prefix"]) == 0
    got = {h["id"] for h in _lines(capsys)}
    assert got == {"repo1_src/db.py", "repo2_lib/util.rb"}  # merge, method


def test_cli_match_all(spark, dirs, capsys):
    """search --match-all: the filter-only browse (sorted listing) and
    corpus aggregations; count --match-all with --not."""
    src, _, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    capsys.readouterr()

    # sorted repo browse: every repo1 file by path, no scores
    assert main(["search", "--index", idx, "--match-all", "--sort", "path",
                 "--repo", "repo1"]) == 0
    hits = _lines(capsys)
    assert [h["id"] for h in hits] == ["repo1_src/app.py", "repo1_src/db.py"]
    assert all("score" not in h for h in hits)

    # language-statistics chart + total + stats in one request
    assert main(["search", "--index", idx, "--match-all", "--facet", "lang",
                 "--stats"]) == 0
    out = _lines(capsys)
    stats = next(o["stats"] for o in out if "stats" in o)
    facets = next(o["facets"] for o in out if "facets" in o)
    assert stats["count"] == 3
    assert facets["lang"] == {"Python": 2, "Ruby": 1}

    # match_all minus an excluded term ("files without X")
    assert main(["count", "--index", idx, "--match-all", "--not",
                 "merge"]) == 0
    assert _lines(capsys)[-1]["count"] == 2

    # msearch match_all body beside a scored one
    import json as _json
    qfile = src + "_matchall_queries.json"
    with open(qfile, "w") as f:
        _json.dump({"browse": {"q": "", "match_all": True,
                               "sort": "path:desc"},
                    "scored": "table scan"}, f)
    assert main(["msearch", "--index", idx, "--queries", qfile,
                 "--k", "2"]) == 0
    rows = _lines(capsys)
    browse = [r for r in rows if r["query_id"] == "browse"]
    # paths are src/db.py > src/app.py > lib/util.rb descending
    assert [r["id"] for r in sorted(browse, key=lambda r: r["rank"])] == [
        "repo1_src/db.py", "repo1_src/app.py"]
    assert all(r["score"] is None for r in browse)

    # rejected shapes
    for bad in (["search", "--index", idx, "--match-all"],
                ["search", "--index", idx, "--match-all", "--query", "x",
                 "--sort", "path"],
                ["search", "--index", idx, "--match-all", "--sort", "path",
                 "--bmw"],
                ["count", "--index", idx],
                ["count", "--index", idx, "--match-all", "--prefix"]):
        with pytest.raises(SystemExit):
            main(bad)


def test_cli_termvectors(spark, dirs, capsys):
    """ES _termvectors analog: per-term tf/df/ttf of one stored doc
    through the CLI; found=false for an unknown id."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)

    # default code analyzer: 'def getUserById if return' emits the
    # original tokens plus pattern_capture splits; spot-check stable ones
    assert main(["termvectors", "--index", idx, "repo1_src/app.py"]) == 0
    out = _lines(capsys)[-1]
    assert out["found"] is True
    terms = out["terms"]
    # 'def' appears once here and once in repo2's doc → df 2, ttf 2
    assert terms["def"] == {"term_freq": 1, "doc_freq": 2, "ttf": 2}
    assert terms["getuserbyid"]["doc_freq"] == 1
    # capture-split fragments of getUserById are indexed too
    assert "user" in terms and "by" in terms

    assert main(["termvectors", "--index", idx, "repo9_no/such.file"]) == 0
    assert _lines(capsys)[-1] == {"id": "repo9_no/such.file", "found": False}


def test_cli_suggest(spark, dirs, capsys):
    """`suggest` (ES term suggester analog): misspelled term → ranked
    vocabulary candidates with similarity + df; in-vocab terms get no
    entry under the default missing mode."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)
    assert main(["suggest", "--index", idx, "--size", "3", "mergq"]) == 0
    out = _lines(capsys)[0]
    sugg = out["suggest"]["mergq"]
    assert any(s["text"] == "merge" for s in sugg)
    assert all(s["freq"] >= 1 and 0 < s["score"] <= 1 for s in sugg)

    assert main(["suggest", "--index", idx, "merge"]) == 0
    assert _lines(capsys)[0]["suggest"] == {}


def test_cli_collapse(spark, dirs, capsys):
    """`search --collapse repo` (ES field collapsing): one best hit per
    repo ordered by best score; --collapse-size widens the inner hits."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)
    assert main(["search", "--index", idx, "--query", "def",
                 "--collapse", "repo"]) == 0
    out = _lines(capsys)
    repos = [d["fields"]["repo"] for d in out]
    assert len(repos) == len(set(repos)) and set(repos) == {"repo1", "repo2"}
    assert all(d["inner_rank"] == 1 for d in out)

    assert main(["search", "--index", idx, "--query", "def",
                 "--collapse", "repo", "--collapse-size", "2"]) == 0
    out = _lines(capsys)
    assert [d["inner_rank"] for d in out
            if d["fields"]["repo"] == "repo1"] == [1]  # repo1 has 1 'def' doc


def test_cli_new_aggregations(spark, dirs, capsys):
    """--percentiles / --cardinality / --significant agg lines beside
    the hits, sharing the hits' bool semantics."""
    src, commits, idx = dirs
    assert main(["build", "--source", src, "--index", idx,
                 "--skip-commits"]) == 0
    _lines(capsys)
    assert main(["search", "--index", idx, "--query", "def",
                 "--percentiles", "--cardinality", "lang",
                 "--cardinality", "repo",
                 "--significant", "3", "--sample-parts", "8"]) == 0
    out = _lines(capsys)
    pct = next(d["percentiles"] for d in out if "percentiles" in d)
    assert set(pct) == {"1.0", "5.0", "25.0", "50.0", "75.0", "95.0",
                        "99.0"}
    assert all(v is None or v >= 1 for v in pct.values())
    card = next(d["cardinality"] for d in out if "cardinality" in d)
    assert card["repo"] == 2 and card["lang"] == 2  # def hits Py + Ruby
    sig = next(d["significant_terms"] for d in out
               if "significant_terms" in d)
    assert all({"term", "fg", "bg", "score"} <= set(s) for s in sig)

    # validation wiring
    import pytest as _pt
    with _pt.raises(SystemExit):
        main(["search", "--index", idx, "--match-all",
              "--significant", "3"])
    with _pt.raises(SystemExit):
        main(["search", "--index", idx, "--query", "def",
              "--sample-parts", "2"])
