"""Golden tests for the analyzer kernels.

Goldens are hand-derived from the regexes and filter specs at
/root/reference/elastic/index.go:18-109 (see each case's comment).
"""

from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
    code_analyze_tf,
    code_analyze_tokens,
    code_search_analyze,
    edge_ngrams,
    fold_ascii,
    path_analyze,
    pattern_capture,
    sha_analyze,
    simple_analyze_tf,
)


def test_pattern_capture_camel_case():
    # P1 splits camelCase runs; P3 lookahead adds capital-run suffixes.
    assert pattern_capture("getUserById") == [
        "get", "User", "UserById", "By", "ById", "Id", "Id",
    ]


def test_pattern_capture_skips_whole_token_and_empty():
    # a capture equal to the entire token is suppressed (Lucene rule)
    assert pattern_capture("if") == []
    assert pattern_capture("foo") == []  # P1/P7 capture 'foo' == whole token


def test_pattern_capture_snake_case():
    assert pattern_capture("snake_case_id") == ["snake", "case", "id"]


def test_pattern_capture_digits():
    assert "2" in pattern_capture("HTTPServer2")
    assert pattern_capture("x1y2") == ["x", "1", "y", "2"]


def test_pattern_capture_quoted_strings():
    # P4 captures double-quoted contents (token has no spaces: whitespace
    # tokenizer runs first)
    caps = pattern_capture('"hello"')
    assert "hello" in caps


def test_pattern_capture_quoted_strings_are_greedy_like_es():
    """The JSON-unescaped quoted-string patterns ES compiles have a
    literal-quote alternative ("|[^"]|"), so multi-quoted tokens capture
    greedily across quotes (elastic/index.go:25-26 after JSON decode)."""
    assert 'a","b' in pattern_capture('"a","b"')
    assert "y" in pattern_capture("x='y'")


def test_pattern_capture_dot_and_slash_paths():
    caps = pattern_capture("foo/bar/baz.rb")
    for sub in ("foo", "bar", "rb"):
        assert sub in caps, caps
    caps2 = pattern_capture("a.b.c")
    assert caps2.count("b") == 2  # P6 and P7 both capture inner segment
    assert "a" in caps2 and "c" in caps2


def test_fold_ascii():
    assert fold_ascii("café") == "cafe"
    assert fold_ascii("Ünïcodé") == "Unicode"
    assert fold_ascii("straße") == "strasse"
    assert fold_ascii("ascii_only") == "ascii_only"


def test_edge_ngrams_bounds():
    assert edge_ngrams("if") == ["if"]
    assert edge_ngrams("a") == []
    assert edge_ngrams("return") == ["re", "ret", "retu", "retur", "return"]
    long = "x" * 50
    grams = edge_ngrams(long)
    assert len(grams) == 39 and grams[-1] == "x" * 40  # full token NOT kept


def test_code_analyzer_chain():
    toks = code_analyze_tokens("getUserById")
    # original token survives (preserve_original), lowercased + ngrammed
    assert "getuserbyid" in toks
    # camel parts present via captures
    assert "user" in toks and "by" in toks and "id" in toks
    # prefixes present via edgeNGram
    assert "getu" in toks and "ge" in toks
    # 1-char captures vanish (min_gram 2) — 'x1y2' pieces
    toks2 = code_analyze_tokens("x1y2")
    assert "x1y2" in toks2 and "x" not in toks2


def test_code_analyze_tf_and_dl():
    tfs, dl = code_analyze_tf("if foo x if")
    # dl counts whitespace tokens with folded length >= 2 ('x' drops)
    assert dl == 3
    assert tfs["if"] == 2
    assert tfs["foo"] == 1 and tfs["fo"] == 1


def test_code_search_analyzer_is_simple():
    assert code_search_analyze("GetUser café IF") == ["getuser", "cafe", "if"]
    # no ngram/capture expansion on the search side
    assert code_search_analyze("getUserById") == ["getuserbyid"]


def test_simple_analyze_tf():
    tfs, dl = simple_analyze_tf("The the THE x")
    assert tfs == {"the": 3, "x": 1}
    assert dl == 4


def test_path_analyzer_reversed_hierarchy():
    assert path_analyze("a/B/c.rb") == ["a/b/c.rb", "b/c.rb", "c.rb"]
    assert path_analyze("README.md") == ["readme.md"]


def test_sha_analyzer():
    grams = sha_analyze("b83d6e3")
    assert grams[0] == "b83d6" and grams[-1] == "b83d6e3"
    assert sha_analyze("abc") == []  # below min_gram 5


def test_oracle_self_consistency():
    from gitlab_elasticsearch_indexer_spark.oracle import build_oracle_index

    rows = [
        {"doc_id": "r1_a.py", "content": "def getUserById return if", "lang": "Python"},
        {"doc_id": "r1_b.py", "content": "if if if return", "lang": "Python"},
        {"doc_id": "r2_c.rb", "content": "class UserRecord getUser", "lang": "Ruby"},
    ]
    idx = build_oracle_index(rows, analyzer="code")
    hits = idx.search("getUserById", k=10)
    assert hits and hits[0][0] == "r1_a.py"
    # prefix query hits via index-side edgeNGram
    hits_prefix = idx.search("getu", k=10)
    ids = [h[0] for h in hits_prefix]
    assert "r1_a.py" in ids and "r2_c.rb" in ids
    # keyword filter (elastic/index.go:157-159)
    hits_rb = idx.search("getu", k=10, lang="Ruby")
    assert [h[0] for h in hits_rb] == ["r2_c.rb"]
    # zero-hit
    assert idx.search("zzzznothing", k=5) == []
    # ties broken by doc_id asc
    idx2 = build_oracle_index(
        [
            {"doc_id": "b", "content": "same text"},
            {"doc_id": "a", "content": "same text"},
        ]
    )
    hits_tie = idx2.search("same", k=2)
    assert [h[0] for h in hits_tie] == ["a", "b"]
    assert hits_tie[0][1] == hits_tie[1][1]


def test_capture_tf_expansion_equals_full_chain():
    """Capture-level rows + prefix expansion must reproduce the full
    code_analyzer term frequencies (the shuffle-reduction invariant)."""
    from collections import Counter

    from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
        MAX_GRAM,
        MIN_GRAM,
        code_analyze_tf,
        code_capture_tf,
    )

    texts = [
        "def getUserById(user_id): return USERS[user_id]",
        'path = "a/b/c.rb" x.y.z HTTPServer2 if if return',
        "café Größe naïve 日本語 x 1 a",
        "",
        "selfContained_longIdentifierName_withMany_parts123 " * 3,
    ]
    for text in texts:
        full, dl_full = code_analyze_tf(text)
        caps, dl_caps = code_capture_tf(text)
        assert dl_full == dl_caps
        expanded: Counter = Counter()
        for cap, cnt in caps.items():
            for k in range(MIN_GRAM, min(len(cap), MAX_GRAM) + 1):
                expanded[cap[:k]] += cnt
        assert dict(expanded) == full, text
