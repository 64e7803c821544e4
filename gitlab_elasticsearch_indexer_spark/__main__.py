"""CLI — the reference binary's surface (main.go) re-expressed.

The reference is driven as ``gitlab-elasticsearch-indexer <project-id>
<repo-path>`` with FROM_SHA/TO_SHA env vars selecting the incremental
range (/root/reference/main.go:15-47).  Here:

    python -m gitlab_elasticsearch_indexer_spark build  --source DIR --index DIR
    python -m gitlab_elasticsearch_indexer_spark update --source DIR --index DIR --snapshot N
    python -m gitlab_elasticsearch_indexer_spark update-delta --changes DIR --index DIR --snapshot N
    python -m gitlab_elasticsearch_indexer_spark compact --index DIR --snapshot N
    python -m gitlab_elasticsearch_indexer_spark vacuum  --index DIR [--keep-last K]
    python -m gitlab_elasticsearch_indexer_spark search --index DIR --query STR [--k K]
                                                        [--lang L] [--repo R] [--bmw]

``build`` = full index (FROM_SHA empty ⇒ index everything, the
NullTreeSHA case); ``update`` = snapshot diff against the indexed state
(re-reads the source — operationally simple, O(corpus));
``update-delta`` = the reference's ACTUAL FROM_SHA→TO_SHA contract
(main.go:46-47): a pre-classified change set, O(batch + touched
partitions), with rows whose content is NULL acting as deletes;
``compact``/``vacuum`` = Lucene segment-merge / delete-merged-segments
maintenance.  Both update forms resume from the last checkpoint and
replay the build-time blob type (main.go:69) via ``index_meta``.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def _write_index_meta(spark, path: str, blob_type: str) -> None:
    """Persist launch-time settings the reference carries in its CLI
    invocation (blob type, main.go:16-18) so ``update``/``update-delta``
    replay them instead of hard-coding the default pipeline."""
    spark.createDataFrame([(blob_type,)], "blob_type string").write.mode(
        "overwrite"
    ).parquet(f"{path}/index_meta")


def _read_index_meta(spark, path: str) -> dict:
    import os

    if not os.path.isdir(f"{path}/index_meta"):
        return {}
    return spark.read.parquet(f"{path}/index_meta").collect()[0].asDict()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gitlab_elasticsearch_indexer_spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--source", required=True, help="parquet dir of (repo,path,commit,lang,content)")
    b.add_argument("--index", required=True)
    b.add_argument("--analyzer", default="code")
    # main.go:16-18,69-77: blobs index as blob|wiki_blob; commits index
    # by default alongside plain blobs unless --skip-commits
    b.add_argument("--blob-type", choices=["blob", "wiki_blob"], default="blob")
    b.add_argument("--skip-commits", action="store_true")
    b.add_argument("--commits", default=None,
                   help="parquet dir of commit rows (repo, sha, author_*, "
                        "committer_*, message); indexed with the default "
                        "analyzer unless --skip-commits")
    b.add_argument("--positions", action="store_true",
                   help="also build the positional-postings sidecar "
                        "(whitespace sub-field on code indexes) enabling "
                        "`search --phrase`")
    b.add_argument("--field", action="append", default=None, metavar="NAME",
                   help="also index this field through the reference "
                        "mapping's analyzer (file_name→code, "
                        "path→path_analyzer, oid→sha_analyzer; "
                        "NAME=analyzer overrides; repeatable) enabling "
                        "`search --fields` / `search --sha`")

    u = sub.add_parser("update")
    u.add_argument("--source", required=True)
    u.add_argument("--index", required=True)
    u.add_argument("--snapshot", type=int, required=True)
    # the reference re-indexes commits on EVERY incremental run unless
    # --skip-commits (main.go:73-77) — mirror that here
    u.add_argument("--commits", default=None,
                   help="parquet dir of the commit snapshot; keeps the "
                        "commit index current through the update")
    u.add_argument("--skip-commits", action="store_true")

    ud = sub.add_parser(
        "update-delta",
        help="apply a PRE-CLASSIFIED change set — the reference's actual "
             "FROM_SHA→TO_SHA contract (main.go:46-47): the operational "
             "surface for the O(batch) delta path (plain `update` re-diffs "
             "the whole snapshot)")
    ud.add_argument("--changes", required=True,
                    help="parquet dir of change rows (repo, path, commit, "
                         "lang, content); rows with NULL content are deletes")
    ud.add_argument("--index", required=True)
    ud.add_argument("--snapshot", type=int, required=True)

    co = sub.add_parser("compact", help="merge under-filled doc partitions "
                                        "accreted by incremental updates "
                                        "(Lucene segment-merge analog)")
    co.add_argument("--index", required=True)
    co.add_argument("--snapshot", type=int, required=True)
    co.add_argument("--min-fill", type=float, default=0.5,
                    help="parts below this fill fraction are merged")

    v = sub.add_parser("vacuum", help="delete version files unreferenced by "
                                      "the last K checkpoints (Lucene "
                                      "delete-merged-segments analog)")
    v.add_argument("--index", required=True)
    v.add_argument("--keep-last", type=int, default=2)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", default=None)
    s.add_argument("--match-all", action="store_true", dest="match_all",
                   help="ES match_all in filter context: every live doc "
                        "passing --lang/--repo/--not/--dl-min/--dl-max — "
                        "use with --sort (browse, e.g. a repo's files by "
                        "path) and/or --stats/--histogram/--facet (corpus "
                        "aggregations, e.g. the per-language doc counts); "
                        "hits are not scored")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--from", dest="offset", type=int, default=0,
                   help="pagination offset (the ES from analog)")
    s.add_argument("--lang", action="append", default=None,
                   help="language filter; repeat for an ES terms filter "
                        "(match ANY given value)")
    s.add_argument("--repo", action="append", default=None,
                   help="repo filter; repeat for an ES terms filter — "
                        "the GitLab group-scope shape (routing prunes to "
                        "the union of the repos' doc_parts)")
    s.add_argument("--bmw", action="store_true")
    s.add_argument("--doc-type", choices=["blob", "commit"], default="blob",
                   help="commit searches the commit-message index built "
                        "alongside the blob index")
    s.add_argument("--highlight", action="store_true",
                   help="attach matching source lines per hit (the ES "
                        "highlight clause analog; content via store "
                        "point reads, no extra Spark job)")
    s.add_argument("--fragments", type=int, default=3)
    s.add_argument("--phrase", action="store_true",
                   help="exact-phrase query (ES match_phrase analog) over "
                        "the positional-postings sidecar; needs an index "
                        "built with --positions")
    s.add_argument("--slop", type=int, default=0,
                   help="with --phrase: ES match_phrase slop (Lucene "
                        "sloppy-phrase matching, tf = sloppy freq)")
    s.add_argument("--phrase-prefix", action="store_true",
                   help="search-as-you-type (ES match_phrase_prefix "
                        "analog): the last token is a prefix whose "
                        "expansions (top --max-expansions by df) may "
                        "complete the phrase; needs an index built with "
                        "--positions")
    s.add_argument("--prefix", action="store_true",
                   help="treat --query as a term PREFIX (ES prefix query / "
                        "trailing-* analog): expand against the term "
                        "dictionary (top --max-expansions by df), score "
                        "bool-should over the expansions")
    s.add_argument("--fuzzy", action="store_true",
                   help="treat --query as a FUZZY term (ES fuzzy / term~N "
                        "analog): expand to vocabulary terms within "
                        "--max-edits Levenshtein edits, score bool-should "
                        "over the expansions")
    s.add_argument("--max-edits", type=int, default=1,
                   help="with --fuzzy: Levenshtein edit budget")
    s.add_argument("--fuzzy-prefix-length", type=int, default=0,
                   help="with --fuzzy: require this many exact leading "
                        "chars (the ES prefix_length knob; pushes a "
                        "startswith predicate to the vocab scan)")
    s.add_argument("--wildcard", action="store_true",
                   help="treat --query as a WILDCARD pattern (ES wildcard "
                        "analog: * = any run, ? = any one char): expand "
                        "against the term dictionary, score bool-should "
                        "over the expansions")
    s.add_argument("--regexp", action="store_true",
                   help="treat --query as a whole-term-anchored REGEX (ES "
                        "regexp analog; portable syntax: . [] () | ? * + "
                        "{m,n}): expand against the term dictionary, score "
                        "bool-should over the expansions")
    s.add_argument("--max-expansions", type=int, default=50,
                   help="with --prefix/--fuzzy/--wildcard/--regexp: cap on "
                        "expanded terms (Lucene top-terms rewrite keeps the "
                        "most frequent)")
    s.add_argument("--fields", default=None,
                   help="comma-separated fields for bool-should multi-"
                        "field search (e.g. content,file_name,path); "
                        "a field may carry an ES boost suffix "
                        "(file_name^3 triples that field's clause "
                        "weights); needs an index built with --field")
    s.add_argument("--qs", action="store_true",
                   help="parse --query as ES simple_query_string (the "
                        "GitLab search-box syntax): bare terms, "
                        '"quoted phrases", -exclusions, combined under '
                        "--default-operator")
    s.add_argument("--default-operator", choices=["or", "and"],
                   default="and", help="clause combinator for --qs "
                   "(GitLab issues AND)")
    s.add_argument("--after", nargs=2, default=None,
                   metavar=("SCORE", "ID"),
                   help="ES search_after cursor: the last hit of the "
                        "previous page; O(k) deep paging at any depth "
                        "(mutually exclusive with --from)")
    s.add_argument("--operator", choices=["or", "and"], default="or",
                   help="'and' requires every analyzed query term (the "
                        "simple_query_string default_operator AND shape "
                        "GitLab issues)")
    s.add_argument("--not", dest="must_not", action="append", default=None,
                   metavar="TERM", help="exclude docs containing TERM "
                   "(ES bool must_not; repeatable)")
    s.add_argument("--min-should-match", type=int, default=0,
                   dest="min_should_match", metavar="N",
                   help="hits must match at least N distinct analyzed "
                        "terms (ES minimum_should_match; middle ground "
                        "between OR and --operator and)")
    s.add_argument("--sha", default=None, metavar="PREFIX",
                   help="SHA-prefix lookup (>=5 hex chars) over the oid "
                        "field's edgeNGram 5..40 grams; needs `build "
                        "--field oid`; replaces --query")
    s.add_argument("--dl-min", type=int, default=None, metavar="N",
                   help="ES range filter over dl: hits need dl >= N")
    s.add_argument("--dl-max", type=int, default=None, metavar="N",
                   help="ES range filter over dl: hits need dl <= N")
    s.add_argument("--sort", default=None, metavar="FIELD[:asc|desc]",
                   help="order hits by a doc field instead of relevance "
                        "(ES sort clause; id/repo/path/lang/dl, id-asc "
                        "tiebreak, no scores — each doc partition "
                        "returns its own top-k by the key, the driver "
                        "merges, the ES sorted-search plan)")
    s.add_argument("--like", default=None, metavar="DOC_ID",
                   help="more_like_this: find docs similar to this doc "
                        "(ES more_like_this analog — top tf*idf terms of "
                        "its term vector become a bool-should query; the "
                        "doc itself is excluded); replaces --query")
    s.add_argument("--max-query-terms", type=int, default=25,
                   help="how many interesting terms --like selects "
                        "(ES max_query_terms)")
    s.add_argument("--min-term-freq", type=int, default=1,
                   help="--like ignores doc terms below this tf "
                        "(ES min_term_freq)")
    s.add_argument("--min-doc-freq", type=int, default=1,
                   help="--like ignores terms below this corpus df "
                        "(ES min_doc_freq)")
    s.add_argument("--stats", action="store_true",
                   help="also print dl stats (count/sum/min/max/avg of "
                        "matching docs' token counts — the ES stats "
                        "aggregation analog)")
    s.add_argument("--histogram", type=int, default=None, metavar="INTERVAL",
                   help="also print a dl histogram with this bucket "
                        "interval (ES histogram aggregation analog)")
    s.add_argument("--facet", action="append", default=None, metavar="FIELD",
                   help="also print per-value match counts for this keyword "
                        "field (lang/repo; repeatable — the ES terms-"
                        "aggregation analog GitLab renders as per-language "
                        "hit counts)")
    s.add_argument("--percentiles", action="store_true",
                   help="also print dl percentiles at the ES default "
                        "percents [1,5,25,50,75,95,99] (ES percentiles "
                        "aggregation analog — exact nearest-rank from the "
                        "bounded dl histogram)")
    s.add_argument("--cardinality", action="append", default=None,
                   metavar="FIELD",
                   help="also print the distinct-value count of this "
                        "keyword field among matches (lang/repo; "
                        "repeatable — ES cardinality aggregation analog)")
    s.add_argument("--significant", type=int, default=None, metavar="SIZE",
                   help="also print the top-SIZE significant terms of the "
                        "match set (ES significant_terms, JLH-scored; "
                        "expensive — see --sample-parts)")
    s.add_argument("--sample-parts", type=int, default=None,
                   help="bound --significant to the first N doc "
                        "partitions (the ES sampler aggregation analog)")
    s.add_argument("--collapse", default=None, metavar="FIELD",
                   help="group hits by this keyword field (lang/repo) and "
                        "return the best --collapse-size hits per group for "
                        "the top -k groups (ES collapse / top_hits "
                        "aggregation — 'group results by project')")
    s.add_argument("--collapse-size", type=int, default=1,
                   help="hits per collapsed group (ES inner_hits size; "
                        "default 1 = pure field collapsing)")

    ex = sub.add_parser("explain", help="per-term BM25 score breakdown of "
                        "one (query, doc) pair (ES _explain analog)")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--id", required=True, dest="doc_id")
    ex.add_argument("--doc-type", choices=["blob", "commit"], default="blob")
    ex.add_argument("--fields", default=None,
                    help="explain the multi-field bool-should score "
                         "instead: comma-separated field list, boost "
                         "suffixes allowed (content,file_name^2)")

    c = sub.add_parser("count", help="total matching documents (ES _count "
                                     "analog): partition-local popcounts, "
                                     "no scoring, no fetch")
    c.add_argument("--index", required=True)
    c.add_argument("--query", default=None)
    c.add_argument("--match-all", action="store_true", dest="match_all",
                   help="count every live doc passing the filters "
                        "(ES match_all; composes with --not)")
    c.add_argument("--lang", action="append", default=None,
                   help="language filter; repeatable (ES terms filter)")
    c.add_argument("--repo", action="append", default=None,
                   help="repo filter; repeatable (ES terms filter)")
    c.add_argument("--operator", choices=["or", "and"], default="or")
    c.add_argument("--not", dest="must_not", action="append", default=None,
                   metavar="TERM")
    c.add_argument("--min-should-match", type=int, default=0,
                   dest="min_should_match", metavar="N",
                   help="count docs matching at least N distinct terms "
                        "(ES minimum_should_match)")
    c.add_argument("--dl-min", type=int, default=None, metavar="N")
    c.add_argument("--dl-max", type=int, default=None, metavar="N")
    c.add_argument("--doc-type", choices=["blob", "commit"], default="blob")
    c.add_argument("--prefix", action="store_true",
                   help="count docs matching any term with this prefix "
                        "(same expansion as search --prefix)")
    c.add_argument("--fuzzy", action="store_true",
                   help="count docs matching any term within --max-edits "
                        "(same expansion as search --fuzzy)")
    c.add_argument("--wildcard", action="store_true",
                   help="count docs matching any term matching the "
                        "*/? pattern (same expansion as search --wildcard)")
    c.add_argument("--regexp", action="store_true",
                   help="count docs matching any term matching the anchored "
                        "regex (same expansion as search --regexp)")
    c.add_argument("--max-edits", type=int, default=1)
    c.add_argument("--max-expansions", type=int, default=50)

    st = sub.add_parser("status", help="index health: checkpoint history, "
                                       "manifest summary, store presence")
    st.add_argument("--index", required=True)
    st.add_argument("--history", type=int, default=5)

    m = sub.add_parser("msearch", help="batched multi-query search (ES "
                                       "_msearch analog): one Spark job "
                                       "scores the whole batch")
    m.add_argument("--index", required=True)
    m.add_argument("--queries", required=True,
                   help="JSON file mapping query_id -> query string or "
                        '{"q": ..., "lang": ..., "repo": ..., "from": ..., '
                        '"phrase": true, "slop": ..., '
                        '"fields": ["content", "file_name", ...], '
                        '"prefix"/"fuzzy"/"wildcard"/"regexp": true, '
                        '"max_edits"/"max_expansions"/"prefix_length": N}')
    m.add_argument("--k", type=int, default=10)
    m.add_argument("--from", dest="offset", type=int, default=0,
                   help="default result offset (ES from) for entries "
                        "without their own")
    m.add_argument("--bmw", action="store_true")
    m.add_argument("--doc-type", choices=["blob", "commit"], default="blob")

    g = sub.add_parser("get", help="typed point lookup returning the stored "
                                   "document (GetBlob/GetCommit analog, "
                                   "elastic/client.go:170-185)")
    g.add_argument("--index", required=True)
    g.add_argument("--type", dest="doc_type", choices=["blob", "wiki_blob", "commit"],
                   default="blob")
    g.add_argument("--parent", required=True, help="project/repo id")
    g.add_argument("--path", default=None, help="blob path (blob types)")
    g.add_argument("--sha", default=None, help="commit sha (commit type)")

    mg = sub.add_parser("mget", help="batch point lookup by raw document id "
                                     "(ES _mget analog): one JSON line per "
                                     "requested id with found=true/false")
    mg.add_argument("--index", required=True)
    mg.add_argument("ids", nargs="+", help="document ids (e.g. 'repo1_a.py')")

    tv = sub.add_parser("termvectors", help="per-term tf/df/ttf statistics "
                                            "of one document (ES "
                                            "_termvectors analog, "
                                            "term_statistics=true)")
    tv.add_argument("--index", required=True)
    tv.add_argument("--doc-type", choices=["blob", "commit"], default="blob")
    tv.add_argument("doc_id", help="document id (e.g. 'repo1_a.py')")

    sg = sub.add_parser("suggest", help="spelling suggestions from the index "
                                        "vocabulary (ES term suggester / "
                                        "'did you mean' analog)")
    sg.add_argument("--index", required=True)
    sg.add_argument("--doc-type", choices=["blob", "commit"], default="blob")
    sg.add_argument("--size", type=int, default=5)
    sg.add_argument("--max-edits", type=int, default=2)
    sg.add_argument("--prefix-length", type=int, default=1)
    sg.add_argument("--suggest-mode", default="missing",
                    choices=["missing", "popular", "always"])
    sg.add_argument("--sort", default="score",
                    choices=["score", "frequency"])
    sg.add_argument("text", help="text to spell-check (analyzed with the "
                                 "index's query chain)")

    an = sub.add_parser("analyze", help="run text through an analysis chain "
                                        "and print (term, tf) — the ES "
                                        "_analyze API analog for debugging "
                                        "what a query/index will see")
    an.add_argument("--analyzer", default="code",
                    choices=["code", "simple", "default", "path", "sha"],
                    help="index-side chain; add --search for the asymmetric "
                         "query-side chain")
    an.add_argument("--search", action="store_true",
                    help="use the query-side (search_analyzer) chain "
                         "instead of the index-side one")
    an.add_argument("--text", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "analyze":
        # pure-Python kernels shared with the Spark UDFs — no JVM needed
        from .functions.analyzers import ANALYZERS_TF
        from .operators.query import QUERY_ANALYZERS

        if args.search:
            chain = QUERY_ANALYZERS.get(args.analyzer)
            if chain is None:
                ap.error(f"no query-side chain for analyzer {args.analyzer!r}")
            toks: dict[str, int] = {}
            for t in chain(args.text):
                toks[t] = toks.get(t, 0) + 1
            tfs, dl = toks, sum(toks.values())
        else:
            tfs, dl = ANALYZERS_TF[args.analyzer](args.text)
        print(json.dumps({
            "analyzer": args.analyzer,
            "side": "search" if args.search else "index",
            "dl": dl,
            "tokens": dict(sorted(tfs.items())),
        }))
        return 0

    from .operators import incremental as inc
    from .operators import index_build as ib
    from .operators import pipeline as pl
    from .operators import query as q
    from .session import get_spark

    spark = get_spark(app_name=f"ges-{args.cmd}", master=args.master)

    if args.cmd == "build":
        src = spark.read.parquet(args.source)
        docs = pl.run_blob_pipeline(spark, src, blob_type=args.blob_type)
        fields = None
        if args.field:
            fields = {}
            for spec in args.field:
                name, _, an = spec.partition("=")
                fields[name] = an or ib.FIELD_ANALYZERS.get(name, "simple")
        idx = ib.build_index(
            spark,
            docs.select("id", "content", F.col("rid").alias("repo"), "path",
                        F.col("language").alias("lang")),
            analyzer=args.analyzer,
            positions=args.positions,
            fields=fields,
        )
        inc.save_versioned(idx, args.index, snapshot_id=0)
        _write_index_meta(spark, args.index, args.blob_type)
        from .sources.doc_store import save_documents

        save_documents(docs, args.index)  # _source store for typed GETs
        idx.unpersist()  # everything is on disk; release build caches
        out = {"built": idx.n_docs, "avgdl": round(idx.avgdl, 3),
               "index": args.index, "blob_type": args.blob_type}
        # commits index by default only for plain blobs (main.go:73-77)
        if args.blob_type == "blob" and not args.skip_commits and args.commits:
            commits = spark.read.parquet(args.commits)
            cdocs = pl.build_commit_documents(commits)
            cidx = ib.build_index(
                spark,
                cdocs.select("id", F.col("message").alias("content"),
                             F.col("rid").alias("repo"),
                             F.lit("").alias("path"), F.lit("").alias("lang"),
                             "sha"),
                analyzer="default",  # commit.message uses the default chain
                positions=args.positions,
                # commit.sha maps through sha_analyzer (edgeNGram 5..40,
                # elastic/index.go:96-104) so `search --doc-type commit
                # --sha PREFIX` finds commits by prefix
                fields={"sha": "sha"},
            )
            inc.save_versioned(cidx, f"{args.index}/commit_index", snapshot_id=0)
            save_documents(cdocs, f"{args.index}/commit_index")
            cidx.unpersist()
            out["commits_built"] = cidx.n_docs
        print(json.dumps(out))
    elif args.cmd == "get":
        from .sources import doc_store as ds

        if args.doc_type == "commit":
            if not args.sha:
                ap.error("--sha is required for --type commit")
            rows = ds.get_commit(
                spark, f"{args.index}/commit_index", args.parent, args.sha
            ).collect()
        else:
            if not args.path:
                ap.error("--path is required for blob types")
            rows = ds.get_blob(spark, args.index, args.parent, args.path,
                               blob_type=args.doc_type).collect()
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
    elif args.cmd == "mget":
        from .sources import doc_store as ds

        # driver-side point reads of only the ids' store partitions —
        # no Spark job, O(touched partitions) like the highlighter fetch
        found = ds.point_read_documents(args.index, args.ids,
                                        columns=("id", "content"))
        for i in args.ids:
            row = found.get(i)
            if row is None:
                print(json.dumps({"id": i, "found": False}))
            else:
                print(json.dumps({**row, "found": True}, default=str))
    elif args.cmd == "update":
        src = spark.read.parquet(args.source)
        # the reference updates whatever blob type it was launched with
        # (main.go:69) — replay the build-time type from index_meta
        blob_type = _read_index_meta(spark, args.index).get("blob_type", "blob")
        docs = pl.run_blob_pipeline(spark, src, blob_type=blob_type)
        idx = inc.update_index(
            spark, args.index,
            docs.select("id", "content", F.col("rid").alias("repo"), "path",
                        F.col("language").alias("lang")),
            snapshot_id=args.snapshot,
            store_docs=docs,  # typed-GET store maintained from the diff
        )
        out = {"snapshot": args.snapshot, "n_docs": idx.n_docs}
        import os

        croot = f"{args.index}/commit_index"
        if (not args.skip_commits and args.commits
                and os.path.isdir(f"{croot}/checkpoint")):
            commits = spark.read.parquet(args.commits)
            cdocs = pl.build_commit_documents(commits)
            cidx = inc.update_index(
                spark, croot,
                cdocs.select("id", F.col("message").alias("content"),
                             F.col("rid").alias("repo"),
                             F.lit("").alias("path"), F.lit("").alias("lang"),
                             "sha"),  # sha field maintained through update
                snapshot_id=args.snapshot,
                store_docs=cdocs,
            )
            out["commits_n_docs"] = cidx.n_docs
        print(json.dumps(out))
    elif args.cmd == "msearch":
        root = (args.index if args.doc_type == "blob"
                else f"{args.index}/commit_index")
        idx = inc.load_versioned(spark, root)
        with open(args.queries) as fh:
            qspec = json.load(fh)
        rows = q.search_many(
            idx, qspec, k=args.k, offset=args.offset,
            mode="bmw" if args.bmw else "exhaustive",
        ).orderBy("query_id", "rank").collect()
        for r in rows:
            # sorted bodies carry NULL scores (ES returns null _score
            # when sorting by field)
            print(json.dumps({"query_id": r["query_id"], "rank": r["rank"],
                              "id": r["id"],
                              "score": (None if r["score"] is None
                                        else round(r["score"], 6))}))
    elif args.cmd == "update-delta":
        changes = spark.read.parquet(args.changes)
        blob_type = _read_index_meta(spark, args.index).get("blob_type", "blob")
        docs = pl.run_blob_pipeline(
            spark, changes.filter(F.col("content").isNotNull()),
            blob_type=blob_type,
        )
        # delete keys mirror the pipeline's id/rid forms: id stays
        # "{repo}_{path}" for every blob type, rid carries the wiki_
        # prefix (indexer/blob.go:58-60, indexer/indexer.go:53-69) —
        # the repo column must match doc_stats for routed classify
        rid = (F.concat(F.lit("wiki_"), F.col("repo"))
               if blob_type == "wiki_blob" else F.col("repo"))
        dels = changes.filter(F.col("content").isNull()).select(
            F.concat("repo", F.lit("_"), "path").alias("id"),
            rid.alias("repo"),
        )
        idx = inc.update_index_delta(
            spark, args.index,
            upserts=docs.select("id", "content", F.col("rid").alias("repo"),
                                "path", F.col("language").alias("lang")),
            deletes=dels,
            snapshot_id=args.snapshot,
            store_docs=docs,  # typed-GET store folded from the same batch
        )
        st = idx.__dict__.get("delta_stats", {})
        print(json.dumps({
            "snapshot": args.snapshot, "n_docs": idx.n_docs,
            "n_dead": st.get("n_dead"), "n_appended": st.get("n_appended"),
            "classify_fallback": st.get("classify_fallback"),
        }))
    elif args.cmd == "vacuum":
        st = inc.vacuum(spark, args.index, keep_last=args.keep_last)
        print(json.dumps(st))
    elif args.cmd == "compact":
        idx = inc.compact_index(spark, args.index, snapshot_id=args.snapshot,
                                min_fill=args.min_fill)
        st = idx.__dict__.get("compact_stats",
                              {"compacted_parts": [], "written_parts": []})
        print(json.dumps({"snapshot": args.snapshot, "n_docs": idx.n_docs,
                          "compacted_parts": len(st["compacted_parts"]),
                          "written_parts": len(st["written_parts"])}))
    elif args.cmd == "status":
        from .sources import fs as _sfs

        cp = inc._checkpoint_df(spark, args.index)
        hist = [r.asDict() for r in cp.orderBy(F.col("snapshot_id").desc())
                .limit(args.history).collect()]
        last = hist[0] if hist else {}
        man_parts = tm_buckets = None
        sid = last.get("snapshot_id")
        if sid is not None:
            man = spark.read.parquet(f"{args.index}/v{sid}/manifest")
            man_parts = {
                str(r["version"]): int(r["n"]) for r in
                man.groupBy("version").agg(F.count("*").alias("n")).collect()
            }
            if _sfs.isdir(f"{args.index}/v{sid}/term_manifest"):
                tm = spark.read.parquet(f"{args.index}/v{sid}/term_manifest")
                tm_buckets = {
                    str(r["version"]): int(r["n"]) for r in
                    tm.groupBy("version").agg(F.count("*").alias("n")).collect()
                }
        print(json.dumps({
            "latest": last,
            "history": hist,
            "manifest_parts_by_version": man_parts,
            "term_buckets_by_version": tm_buckets,
            "has_doc_store": _sfs.isdir(f"{args.index}/documents"),
            "has_commit_index": _sfs.isdir(f"{args.index}/commit_index"),
            "has_positions": any(
                _sfs.isdir(f"{args.index}/{d}/pos_postings")
                for d in _sfs.listdir(args.index) if d.startswith("v")
            ),
            "has_fields": any(
                _sfs.isdir(f"{args.index}/{d}/fields")
                for d in _sfs.listdir(args.index) if d.startswith("v")
            ),
            "blob_type": _read_index_meta(spark, args.index).get("blob_type", "blob"),
        }, default=str))
    elif args.cmd == "explain":
        root = (args.index if args.doc_type == "blob"
                else f"{args.index}/commit_index")
        idx = inc.load_versioned(spark, root)
        if args.fields:
            rows = q.explain_fields(
                idx, args.query, args.doc_id,
                fields=tuple(args.fields.split(",")),
            ).collect()
        else:
            rows = q.explain(idx, args.query, args.doc_id).collect()
        clauses = [
            {**({"field": r["field"]} if args.fields else {}),
             "term": r["term"], "occurrences": r["occurrences"],
             "idf": r["idf"], "tf": r["tf"], "dl": r["dl"], "tfn": r["tfn"],
             "contribution": r["contribution"]}
            for r in rows
        ]
        print(json.dumps({"id": args.doc_id,
                          "score": sum(c["contribution"] for c in clauses),
                          "matched": len(clauses), "clauses": clauses}))
    elif args.cmd == "termvectors":
        root = (args.index if args.doc_type == "blob"
                else f"{args.index}/commit_index")
        idx = inc.load_versioned(spark, root)
        try:
            rows = q.term_vectors(idx, args.doc_id).collect()
        except ValueError:
            print(json.dumps({"id": args.doc_id, "found": False}))
            return 0
        print(json.dumps({
            "id": args.doc_id, "found": True,
            "terms": {r["term"]: {"term_freq": r["tf"], "doc_freq": r["df"],
                                  "ttf": r["ttf"]}
                      for r in rows},
        }))
    elif args.cmd == "suggest":
        root = (args.index if args.doc_type == "blob"
                else f"{args.index}/commit_index")
        idx = inc.load_versioned(spark, root)
        rows = q.suggest_terms(
            idx, args.text, size=args.size, max_edits=args.max_edits,
            prefix_length=args.prefix_length,
            suggest_mode=args.suggest_mode, sort=args.sort,
        ).collect()
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(
                {"text": r["suggestion"], "score": round(r["score"], 6),
                 "freq": r["df"]})
        print(json.dumps({"suggest": by_term}))
    elif args.cmd == "count":
        root = args.index if args.doc_type == "blob" else f"{args.index}/commit_index"
        if (args.query is None) == (not args.match_all):
            ap.error("count needs exactly one of --query / --match-all")
        if args.match_all and (args.prefix or args.fuzzy or args.wildcard
                               or args.regexp or args.operator != "or"
                               or args.min_should_match > 1):
            ap.error("--match-all composes with --lang/--repo/--not/"
                     "--dl-min/--dl-max only (no should clauses to "
                     "rewrite or match)")
        if sum(map(bool, (args.prefix, args.fuzzy, args.wildcard,
                          args.regexp))) > 1:
            ap.error("--prefix, --fuzzy, --wildcard, and --regexp are "
                     "mutually exclusive")
        if (args.prefix or args.fuzzy or args.wildcard or args.regexp) and (
            args.operator != "or" or args.must_not or args.min_should_match > 1
        ):
            ap.error("--operator and / --not / --min-should-match apply to "
                     "plain term counts")
        if args.min_should_match > 1 and args.operator == "and":
            ap.error("--min-should-match applies to --operator or")
        idx = inc.load_versioned(spark, root)
        pre = None
        if args.prefix:
            pre = q.expand_prefix(idx, args.query,
                                  max_expansions=args.max_expansions)
        elif args.fuzzy:
            pre = q.expand_fuzzy(idx, args.query, max_edits=args.max_edits,
                                 max_expansions=args.max_expansions)
        elif args.wildcard:
            pre = q.expand_wildcard(idx, args.query,
                                    max_expansions=args.max_expansions)
        elif args.regexp:
            pre = q.expand_regexp(idx, args.query,
                                  max_expansions=args.max_expansions)
        if pre is not None and not pre:
            n = 0
        else:
            n = q.match_count(idx, args.query, lang=args.lang, repo=args.repo,
                              operator=args.operator,
                              must_not=(" ".join(args.must_not)
                                        if args.must_not else None),
                              pre_terms=pre,
                              minimum_should_match=args.min_should_match,
                              dl_range=(
                                  (args.dl_min, args.dl_max)
                                  if args.dl_min is not None
                                  or args.dl_max is not None else None))
        print(json.dumps({"count": n}))
    else:  # search
        root = args.index if args.doc_type == "blob" else f"{args.index}/commit_index"
        n_src = (sum(x is not None for x in (args.query, args.sha, args.like))
                 + bool(args.match_all))
        if n_src != 1:
            ap.error("search needs exactly one of --query / --sha / --like "
                     "/ --match-all")
        if args.match_all and (args.phrase or args.fields or args.prefix
                               or args.fuzzy or args.wildcard or args.regexp
                               or args.phrase_prefix or args.qs or args.bmw
                               or args.highlight or args.operator != "or"
                               or args.min_should_match > 1):
            ap.error("--match-all composes with --sort, the aggregations "
                     "(--stats/--histogram/--facet), --lang/--repo/--not/"
                     "--dl-min/--dl-max, --from and --after (no should "
                     "clauses — nothing to score, analyze, or rewrite)")
        if args.match_all and not (args.sort or args.stats or args.histogram
                                   or args.facet or args.percentiles
                                   or args.cardinality):
            ap.error("--match-all needs --sort and/or an aggregation "
                     "(--stats/--histogram/--facet/--percentiles/"
                     "--cardinality): ES match_all hits carry no "
                     "relevance order")
        if args.significant is not None and (args.match_all or args.sha
                                             or args.like or args.phrase
                                             or args.fields or args.prefix
                                             or args.fuzzy or args.wildcard
                                             or args.regexp
                                             or args.phrase_prefix
                                             or args.qs):
            ap.error("--significant applies to plain term queries "
                     "(a match set is required; match_all's would be "
                     "the whole corpus)")
        if args.sample_parts is not None and args.significant is None:
            ap.error("--sample-parts requires --significant")
        if sum(map(bool, (args.sha, args.like, args.phrase, args.fields,
                          args.prefix, args.fuzzy, args.wildcard,
                          args.regexp, args.phrase_prefix))) > 1:
            ap.error("--sha, --like, --phrase, --fields, --prefix, --fuzzy, "
                     "--wildcard, --regexp, and --phrase-prefix are "
                     "mutually exclusive query types")
        if args.sort and (args.sha or args.like or args.phrase or args.fields
                          or args.prefix or args.fuzzy or args.wildcard
                          or args.regexp or args.phrase_prefix or args.qs
                          or args.bmw or args.highlight):
            ap.error("--sort orders plain term queries (bool knobs, "
                     "--lang/--repo, --from, --after compose; scores are "
                     "not computed, so --bmw/--highlight don't apply)")
        if args.like and (args.operator != "or" or args.must_not
                          or args.min_should_match > 1 or args.facet
                          or args.stats or args.histogram or args.qs
                          or args.highlight or args.offset or args.after
                          or args.dl_min is not None
                          or args.dl_max is not None):
            ap.error("--like composes with --lang/--repo/-k only "
                     "(the ES more_like_this body has its own knobs)")
        if args.slop and not args.phrase:
            ap.error("--slop requires --phrase")
        dl_range = ((args.dl_min, args.dl_max)
                    if args.dl_min is not None or args.dl_max is not None
                    else None)
        if (args.operator == "and" or args.must_not
                or args.min_should_match > 1 or dl_range is not None) and (
            args.sha or args.phrase or args.fields or args.prefix
            or args.fuzzy or args.wildcard or args.regexp
            or args.phrase_prefix
        ):
            ap.error("--operator and / --not / --min-should-match / "
                     "--dl-min/--dl-max apply to plain term queries "
                     "(not --sha/--phrase/--fields/--prefix/--fuzzy/"
                     "--wildcard/--regexp/--phrase-prefix)")
        if args.min_should_match > 1 and args.operator == "and":
            ap.error("--min-should-match applies to --operator or")
        if args.after and args.offset:
            ap.error("--after and --from are mutually exclusive")
        if args.collapse and (args.sha or args.like or args.phrase
                              or args.fields or args.prefix or args.fuzzy
                              or args.wildcard or args.regexp
                              or args.phrase_prefix or args.qs or args.sort
                              or args.match_all or args.bmw
                              or args.highlight or args.offset
                              or args.after):
            ap.error("--collapse groups plain term queries (bool knobs, "
                     "--lang/--repo, --dl-min/--dl-max compose; the group "
                     "list has no flat pagination)")
        if args.qs and (args.sha or args.phrase or args.fields
                        or args.prefix or args.fuzzy or args.wildcard
                        or args.regexp or args.phrase_prefix
                        or args.operator != "or"
                        or args.min_should_match > 1
                        or args.must_not or args.facet
                        or args.stats or args.histogram):
            ap.error("--qs is a self-contained query syntax (quoted "
                     "phrases, -exclusions, --default-operator); don't "
                     "combine it with --sha/--phrase/--fields/--operator/"
                     "--not/--facet/--stats/--histogram")
        idx = inc.load_versioned(spark, root)
        # --after works on EVERY query shape (ES supports search_after
        # on any query): the kernels all filter at candidate time
        after = ((float(args.after[0]), args.after[1])
                 if args.after and not args.sort else None)
        if args.sort is not None:
            field, _, direction = args.sort.partition(":")
            if direction not in ("", "asc", "desc"):
                ap.error("--sort direction must be asc or desc")
            sort_after = None
            if args.after:
                v = int(args.after[0]) if field == "dl" else args.after[0]
                sort_after = (v, args.after[1])
            hits = q.sort_search(
                idx, args.query, sort=field,
                ascending=direction != "desc", k=args.k,
                lang=args.lang, repo=args.repo, operator=args.operator,
                must_not=(" ".join(args.must_not)
                          if args.must_not else None),
                minimum_should_match=args.min_should_match,
                offset=args.offset, search_after=sort_after,
                dl_range=dl_range,
            )
        elif args.collapse:
            hits = q.grouped_search(
                idx, args.query, by=args.collapse,
                k_per_group=args.collapse_size, groups=args.k,
                lang=args.lang, repo=args.repo, operator=args.operator,
                must_not=(" ".join(args.must_not)
                          if args.must_not else None),
                minimum_should_match=args.min_should_match,
                dl_range=dl_range,
            )
        elif args.match_all:
            hits = None  # aggregation-only match_all: no hit list
        elif args.like is not None:
            hits = q.more_like_this(
                idx, args.like, k=args.k, lang=args.lang, repo=args.repo,
                max_query_terms=args.max_query_terms,
                min_term_freq=args.min_term_freq,
                min_doc_freq=args.min_doc_freq,
            )
        elif args.sha is not None:
            if len(args.sha) < 5:
                ap.error("--sha needs >= 5 characters (sha_analyzer "
                         "emits edgeNGrams 5..40)")
            # blob indexes carry the blob sha as `oid`; commit indexes
            # carry the commit sha as `sha` (elastic/index.go:96-104)
            sha_field = "oid" if args.doc_type == "blob" else "sha"
            hits = q.multi_search(idx, args.sha, k=args.k,
                                  fields=(sha_field,), lang=args.lang,
                                  repo=args.repo, offset=args.offset,
                                  search_after=after)
            args.query = args.sha  # facet/highlight reuse below
        elif args.qs:
            hits = q.simple_query_string(
                idx, args.query, k=args.k,
                default_operator=args.default_operator,
                lang=args.lang, repo=args.repo, offset=args.offset,
                search_after=after,
            )
        elif args.prefix:
            hits = q.prefix_search(idx, args.query, k=args.k, lang=args.lang,
                                   repo=args.repo,
                                   max_expansions=args.max_expansions,
                                   offset=args.offset, search_after=after)
        elif args.fuzzy:
            hits = q.fuzzy_search(idx, args.query, k=args.k,
                                  max_edits=args.max_edits,
                                  lang=args.lang, repo=args.repo,
                                  max_expansions=args.max_expansions,
                                  prefix_length=args.fuzzy_prefix_length,
                                  offset=args.offset, search_after=after)
        elif args.wildcard:
            hits = q.wildcard_search(idx, args.query, k=args.k,
                                     lang=args.lang, repo=args.repo,
                                     max_expansions=args.max_expansions,
                                     offset=args.offset, search_after=after)
        elif args.regexp:
            hits = q.regexp_search(idx, args.query, k=args.k,
                                   lang=args.lang, repo=args.repo,
                                   max_expansions=args.max_expansions,
                                   offset=args.offset, search_after=after)
        elif args.phrase:
            hits = q.phrase_search(idx, args.query, k=args.k, lang=args.lang,
                                   repo=args.repo, slop=args.slop,
                                   offset=args.offset, search_after=after)
        elif args.phrase_prefix:
            hits = q.phrase_prefix_search(
                idx, args.query, k=args.k, lang=args.lang, repo=args.repo,
                max_expansions=args.max_expansions,
                offset=args.offset, search_after=after)
        elif args.fields:
            hits = q.search(idx, args.query, k=args.k, lang=args.lang,
                            repo=args.repo, offset=args.offset,
                            fields=tuple(args.fields.split(",")),
                            search_after=after)
        else:
            hits = q.search(idx, args.query, k=args.k, lang=args.lang,
                            repo=args.repo,
                            mode="bmw" if args.bmw else "exhaustive",
                            offset=args.offset, operator=args.operator,
                            must_not=(" ".join(args.must_not)
                                      if args.must_not else None),
                            search_after=after,
                            minimum_should_match=args.min_should_match,
                            dl_range=dl_range)
        if (args.facet or args.stats or args.histogram or args.percentiles
                or args.cardinality):
            # aggregations reflect the SAME bool semantics as the hits
            # they accompany (sha/phrase/fields queries keep the
            # any-term agg shape — their match sets aren't term-mask
            # unions); rewrite queries feed their expansions through
            # pre_terms so the aggregation covers the docs the rewrite
            # scores
            pre = None
            if args.prefix:
                pre = q.expand_prefix(idx, args.query,
                                      max_expansions=args.max_expansions)
            elif args.fuzzy:
                pre = q.expand_fuzzy(idx, args.query,
                                     max_edits=args.max_edits,
                                     max_expansions=args.max_expansions,
                                     prefix_length=args.fuzzy_prefix_length)
            elif args.wildcard:
                pre = q.expand_wildcard(idx, args.query,
                                        max_expansions=args.max_expansions)
            elif args.regexp:
                pre = q.expand_regexp(idx, args.query,
                                      max_expansions=args.max_expansions)
        if args.stats:
            srow = q.dl_stats(
                idx, args.query, lang=args.lang, repo=args.repo,
                operator=args.operator,
                must_not=(" ".join(args.must_not)
                          if args.must_not else None),
                pre_terms=pre,
                minimum_should_match=args.min_should_match,
                dl_range=dl_range,
            ).collect()[0]
            print(json.dumps({"stats": {
                "count": int(srow["count"]),
                "sum_dl": int(srow["sum_dl"]),
                "min_dl": None if srow["min_dl"] is None else int(srow["min_dl"]),
                "max_dl": None if srow["max_dl"] is None else int(srow["max_dl"]),
                "avg_dl": None if srow["avg_dl"] is None else float(srow["avg_dl"]),
            }}))
        if args.histogram:
            hrows = q.dl_histogram(
                idx, args.query, args.histogram, lang=args.lang,
                repo=args.repo, operator=args.operator,
                must_not=(" ".join(args.must_not)
                          if args.must_not else None),
                pre_terms=pre,
                minimum_should_match=args.min_should_match,
                dl_range=dl_range,
            ).collect()
            print(json.dumps({"histogram": {
                str(int(r["bucket"])): int(r["n"]) for r in hrows
            }}))
        if args.facet:
            fc = q.facet_counts(idx, args.query, fields=tuple(args.facet),
                                lang=args.lang, repo=args.repo,
                                operator=args.operator,
                                must_not=(" ".join(args.must_not)
                                          if args.must_not else None),
                                pre_terms=pre,
                                minimum_should_match=args.min_should_match,
                                dl_range=dl_range)
            facets: dict[str, dict[str, int]] = {}
            for r in fc.collect():
                facets.setdefault(r["field"], {})[r["value"]] = int(r["n"])
            print(json.dumps({"facets": facets}))
        if args.percentiles:
            prows = q.dl_percentiles(
                idx, args.query, lang=args.lang, repo=args.repo,
                operator=args.operator,
                must_not=(" ".join(args.must_not)
                          if args.must_not else None),
                pre_terms=pre,
                minimum_should_match=args.min_should_match,
                dl_range=dl_range,
            ).collect()
            print(json.dumps({"percentiles": {
                str(r["percent"]): (None if r["value"] is None
                                    else int(r["value"]))
                for r in prows
            }}))
        if args.cardinality:
            crows = q.field_cardinality(
                idx, args.query, fields=tuple(args.cardinality),
                lang=args.lang, repo=args.repo, operator=args.operator,
                must_not=(" ".join(args.must_not)
                          if args.must_not else None),
                pre_terms=pre,
                minimum_should_match=args.min_should_match,
                dl_range=dl_range,
            ).collect()
            print(json.dumps({"cardinality": {
                r["field"]: int(r["cardinality"]) for r in crows
            }}))
        if args.significant is not None:
            srows = q.significant_terms(
                idx, args.query, size=args.significant,
                sample_parts=args.sample_parts,
                lang=args.lang, repo=args.repo,
            ).collect()
            print(json.dumps({"significant_terms": [
                {"term": r["term"], "fg": int(r["fg"]), "bg": int(r["bg"]),
                 "score": round(float(r["score"]), 6)}
                for r in srows
            ]}))
        rows = hits.collect() if hits is not None else []
        frags: dict = {}
        if args.highlight:
            from .operators.highlight import highlight_hits

            frags = highlight_hits(
                root, [r["id"] for r in rows], args.query,
                analyzer=idx.analyzer, max_fragments=args.fragments,
                content_col="content" if args.doc_type == "blob" else "message",
            )
        sort_field = (args.sort.partition(":")[0] if args.sort else None)
        for r in rows:
            # "sort" carries the FULL-precision cursor values (the ES
            # hit.sort array) — feed them back via --after; the rounded
            # score is for display only.  Field-sorted hits carry the
            # sort-key value instead of a score (ES computes no scores
            # when sorting by field).
            if args.collapse:
                d = {"id": r["id"], "score": round(r["score"], 6),
                     "repo": r["repo"], "path": r["path"], "lang": r["lang"],
                     "fields": {args.collapse: r["value"]},
                     "inner_rank": int(r["rank"])}
            elif sort_field:
                d = {"id": r["id"], "repo": r["repo"], "path": r["path"],
                     "lang": r["lang"], "dl": int(r["dl"]),
                     "sort": [r[sort_field], r["id"]]}
            else:
                d = {"id": r["id"], "score": round(r["score"], 6),
                     "repo": r["repo"], "path": r["path"], "lang": r["lang"],
                     "sort": [r["score"], r["id"]]}
            if args.highlight:
                d["highlight"] = frags.get(r["id"], [])
            print(json.dumps(d))
    return 0


if __name__ == "__main__":
    sys.exit(main())
