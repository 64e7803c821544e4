"""simple_query_string (the ES query GitLab advanced search issues):
parser, mixed phrase+term bool evaluation vs a brute-force referee,
dispatch to the pure-term / pure-phrase paths, and CLI e2e."""

import math

import pytest
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
    code_search_analyze,
)
from gitlab_elasticsearch_indexer_spark.operators.index_build import (
    B,
    K1,
    build_index,
)
from gitlab_elasticsearch_indexer_spark.operators.query import (
    parse_simple_query_string,
    phrase_search,
    search,
    simple_query_string,
)

ROWS = [
    ("r1_a.py", "def get user by id if return user table hash", "Python", "r1"),
    ("r1_b.py", "table hash join table hash probe table hash merge", "Python", "r1"),
    ("r2_a.rb", "hash table is not table hash at all merge window", "Ruby", "r2"),
    ("r2_b.rb", "Table HASH with odd spacing merge", "Ruby", "r2"),
    ("r3_a.go", "no phrase here just hash and table far apart merge", "Go", "r3"),
    ("r3_b.go", "merge window only", "Go", "r3"),
]

TOKS = {i: code_search_analyze(c) for i, c, _, _ in ROWS}
DLS = {i: len(t) for i, t in TOKS.items()}
AVGDL = sum(DLS.values()) / len(ROWS)
META = {i: (l, r) for i, _, l, r in ROWS}


@pytest.fixture(scope="module")
def sidx(spark):
    docs = spark.createDataFrame(
        [(i, c, l, r) for i, c, l, r in ROWS],
        "id string, content string, lang string, repo string",
    ).withColumn("path", F.col("id"))
    return build_index(spark, docs, analyzer="simple", docs_per_part=2,
                       positions=True)


def _idf(t):
    df = sum(1 for tk in TOKS.values() if t in tk)
    return math.log(1 + (len(ROWS) - df + 0.5) / (df + 0.5)) if df else None


def _term_score(i, t):
    tf = TOKS[i].count(t)
    if not tf:
        return None
    return _idf(t) * tf / (tf + K1 * (1 - B + B * DLS[i] / AVGDL))


def _phrase_score(i, pterms):
    tk = TOKS[i]
    pf = sum(1 for s in range(len(tk) - len(pterms) + 1)
             if tk[s:s + len(pterms)] == pterms)
    if not pf:
        return None
    isum = sum(_idf(t) for t in pterms)
    return isum * pf / (pf + K1 * (1 - B + B * DLS[i] / AVGDL))


def brute(q, op="and", lang=None, repo=None):
    p = parse_simple_query_string(q)
    out = []
    for i in TOKS:
        if lang and META[i][0] != lang:
            continue
        if repo and META[i][1] != repo:
            continue
        if any(t in TOKS[i] for w in p["must_not"]
               for t in code_search_analyze(w)):
            continue
        clauses = []
        for w in p["terms"]:
            for t in code_search_analyze(w):
                clauses.append(_term_score(i, t))
        for ph in dict.fromkeys(p["phrases"]):
            clauses.append(_phrase_score(i, code_search_analyze(ph)))
        if op == "and":
            if not clauses or any(c is None for c in clauses):
                continue
            score = sum(clauses)
        else:
            live = [c for c in clauses if c is not None]
            if not live:
                continue
            score = sum(live)
        out.append((i, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("q,op,kw", [
    ('"table hash" merge', "and", {}),
    ('"table hash" merge -window', "and", {}),
    ('"table hash" merge', "or", {}),
    ('"table hash" "get user" merge', "or", {}),
    ('"table hash" zzznothere', "and", {}),
    ('"table hash" merge', "and", {"lang": "Python"}),
    ('"table hash" merge', "and", {"repo": "r2"}),
    ('"zzz nope" merge', "or", {}),
    ('"table hash" "table hash" merge', "and", {}),  # dup phrase dedupes
])
def test_sqs_matches_brute_force(sidx, q, op, kw):
    got = [(r["id"], round(r["score"], 10)) for r in
           simple_query_string(sidx, q, k=10, default_operator=op,
                               **kw).collect()]
    exp = [(d, round(s, 10)) for d, s in brute(q, op, **kw)][:10]
    assert got == exp, (q, op, kw)


def test_sqs_dispatches_to_plain_paths(sidx):
    """Pure-term and pure-phrase inputs return exactly what the
    dedicated paths return."""
    got = [(r["id"], r["score"]) for r in
           simple_query_string(sidx, "table merge", k=5).collect()]
    exp = [(r["id"], r["score"]) for r in
           search(sidx, "table merge", k=5, operator="and").collect()]
    assert got == exp

    got = [(r["id"], r["score"]) for r in
           simple_query_string(sidx, '"table hash"', k=5).collect()]
    exp = [(r["id"], r["score"]) for r in
           phrase_search(sidx, "table hash", k=5).collect()]
    assert got == exp


def test_sqs_parser():
    p = parse_simple_query_string('"a b" c -d "e" -f* g*')
    assert p == {"terms": ["c", "g"], "phrases": ["a b", "e"],
                 "must_not": ["d", "f"]}
    with pytest.raises(ValueError, match="negated phrases"):
        parse_simple_query_string('-"a b"')
    with pytest.raises(ValueError, match="unbalanced"):
        parse_simple_query_string('"a b')
    with pytest.raises(ValueError, match="not supported"):
        parse_simple_query_string("a | b")


def test_sqs_validation(sidx):
    with pytest.raises(ValueError, match="positive clause"):
        simple_query_string(sidx, "-only -negs")
    with pytest.raises(ValueError, match="default_operator"):
        simple_query_string(sidx, "a b", default_operator="nand")


def test_sqs_batch_entries_match_single(sidx):
    """{"qs": ...} msearch bodies: pure forms lower onto the shared
    batch jobs, mixed bodies run the combined kernel — all identical to
    the single-query surface."""
    import numpy as np

    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    batch = {
        "pure_term": {"qs": "table merge -window"},
        "pure_phrase": {"qs": '"table hash"'},
        "mixed": {"qs": '"table hash" merge', "operator": "and"},
        "mixed_or": {"qs": '"table hash" merge -window', "operator": "or"},
        "mixed_lang": {"qs": '"table hash" merge', "lang": "Ruby"},
        "plain": "merge",
    }
    out = search_many(sidx, batch, k=5).collect()
    by_q: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["id"], r["score"]))
    for qid, spec in batch.items():
        if isinstance(spec, str):
            continue
        single = [(r["id"], r["score"]) for r in
                  simple_query_string(
                      sidx, spec["qs"], k=5,
                      default_operator=spec.get("operator", "and"),
                      lang=spec.get("lang")).collect()]
        got = by_q.get(qid, [])
        assert [g[0] for g in got] == [s[0] for s in single], qid
        assert np.allclose([g[1] for g in got], [s[1] for s in single],
                           rtol=1e-12)

    with pytest.raises(ValueError, match="not both"):
        search_many(sidx, {"a": {"qs": "x", "q": "y"}})
    with pytest.raises(ValueError, match="positive clause"):
        search_many(sidx, {"a": {"qs": "-only"}})


def test_sqs_search_after_pages_match_full_ranking(sidx):
    """search_after pages MIXED simple_query_string rankings exactly —
    single path (combined bool kernel) and {"qs": ..., "search_after"}
    msearch bodies."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    qs = '"table hash" merge'
    full = [(r["id"], r["score"]) for r in
            simple_query_string(sidx, qs, k=10,
                                default_operator="or").collect()]
    assert len(full) >= 3

    paged: list = []
    cursor = None
    while len(paged) < len(full):
        page = [(r["id"], r["score"]) for r in
                simple_query_string(sidx, qs, k=2, default_operator="or",
                                    search_after=cursor).collect()]
        if not page:
            break
        paged.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert paged[:len(full)] == full

    def batch_page(spec, k):
        out = search_many(sidx, {"x": spec}, k=k).collect()
        return [(r["id"], r["score"])
                for r in sorted(out, key=lambda r: r["rank"])]

    full_b = batch_page({"qs": qs, "operator": "or"}, 10)
    paged_b: list = []
    cursor = None
    while len(paged_b) < len(full_b):
        spec = {"qs": qs, "operator": "or"}
        if cursor:
            spec["search_after"] = [cursor[1], cursor[0]]
        page = batch_page(spec, 2)
        if not page:
            break
        paged_b.extend(page)
        cursor = page[-1]
    assert paged_b[:len(full_b)] == full_b

    with pytest.raises(ValueError, match="mutually exclusive"):
        search_many(sidx, {"a": {"qs": qs, "from": 3,
                                 "search_after": [1.0, "x"]}})


def test_sqs_cli(spark, sidx, tmp_path, capsys):
    import json

    from gitlab_elasticsearch_indexer_spark.__main__ import main
    from gitlab_elasticsearch_indexer_spark.operators import incremental as inc

    path = str(tmp_path / "sqsidx")
    inc.save_versioned(sidx, path, snapshot_id=0)
    assert main(["search", "--index", path,
                 "--query", '"table hash" merge -window', "--qs"]) == 0
    hits = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    exp = brute('"table hash" merge -window', "and")
    assert [h["id"] for h in hits] == [d for d, _ in exp]

    with pytest.raises(SystemExit):
        main(["search", "--index", path, "--query", '"a" b', "--qs",
              "--phrase"])
