"""Phrase search (ES match_phrase analog) over the positional-postings
sidecar: engine vs a brute-force pure-Python oracle (token adjacency +
Lucene PhraseQuery scoring), persistence roundtrip, and the consistent-
degradation contract when an update path doesn't carry positions."""

import math

import numpy as np
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
from gitlab_elasticsearch_indexer_spark.operators.query import phrase_search

ROWS = [
    ("r1_a.py", "def get user by id if return user table hash", "Python", "r1"),
    ("r1_b.py", "table hash join table hash probe table hash", "Python", "r1"),
    ("r2_a.rb", "hash table is not table hash at all", "Ruby", "r2"),
    ("r2_b.rb", "Table   HASH  with odd   spacing", "Ruby", "r2"),
    ("r3_a.go", "no phrase here just hash and table far apart", "Go", "r3"),
    ("r3_b.go", "", "Go", "r3"),
]


@pytest.fixture(scope="module")
def pidx(spark):
    docs = spark.createDataFrame(
        [(i, c, l, r) for i, c, l, r in ROWS],
        "id string, content string, lang string, repo string",
    ).withColumn("path", F.col("id"))
    return build_index(spark, docs, analyzer="simple", docs_per_part=2,
                       positions=True)


def brute_phrase(phrase, lang=None, repo=None):
    """(id, score) list the Lucene way, tie-break (score desc, id asc)."""
    terms = code_search_analyze(phrase)
    toks = {i: code_search_analyze(c) for i, c, _, _ in ROWS}
    n = len(ROWS)
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / n
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in set(terms)
    }
    if any(df[t] == 0 for t in terms):
        return []
    idf_sum = sum(
        math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms
    )
    meta = {i: (l, r) for i, _, l, r in ROWS}
    out = []
    for i, tk in toks.items():
        if lang is not None and meta[i][0] != lang:
            continue
        if repo is not None and meta[i][1] != repo:
            continue
        pf = sum(
            1
            for s in range(len(tk) - len(terms) + 1)
            if tk[s : s + len(terms)] == terms
        )
        if pf:
            score = idf_sum * pf / (pf + K1 * (1 - B + B * dls[i] / avgdl))
            out.append((i, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("phrase,kw", [
    ("table hash", {}),
    ("Table  Hash", {}),            # analyzer normalizes case/whitespace
    ("table hash", {"lang": "Python"}),
    ("table hash", {"repo": "r2"}),
    ("user table hash", {}),        # 3-term phrase
    ("hash table hash", {}),        # duplicate term in the phrase
    ("missing phrase words", {}),   # absent term → empty
])
def test_phrase_matches_brute_force(pidx, phrase, kw):
    got = [
        (r["id"], r["score"])
        for r in phrase_search(pidx, phrase, k=10, **kw).collect()
    ]
    want = brute_phrase(phrase, **kw)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want])


def test_phrase_frequency_scores_higher(pidx):
    """r1_b contains 'table hash' 3× — phrase frequency must rank it
    above single-occurrence docs (pf enters the BM25 tf slot)."""
    hits = phrase_search(pidx, "table hash", k=10).collect()
    assert hits[0]["id"] == "r1_b.py"


def test_phrase_search_after_pages_match_full_ranking(pidx):
    """search_after pages the phrase ranking exactly — single path and
    batched ``{"phrase": True, "search_after": ...}`` entries (ES
    supports cursors on any query shape)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    full = [(r["id"], r["score"])
            for r in phrase_search(pidx, "table hash", k=10).collect()]
    assert len(full) >= 3

    paged: list = []
    cursor = None
    while len(paged) < len(full):
        page = [(r["id"], r["score"])
                for r in phrase_search(pidx, "table hash", k=2,
                                       search_after=cursor).collect()]
        if not page:
            break
        paged.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert paged[:len(full)] == full

    paged_b: list = []
    cursor = None
    while len(paged_b) < len(full):
        spec = {"q": "table hash", "phrase": True}
        if cursor:
            spec["search_after"] = [cursor[1], cursor[0]]
        out = search_many(pidx, {"x": spec}, k=2).collect()
        page = [(r["id"], r["score"])
                for r in sorted(out, key=lambda r: r["rank"])]
        if not page:
            break
        paged_b.extend(page)
        cursor = page[-1]
    assert paged_b[:len(full)] == full


def test_phrase_survives_versioned_roundtrip(spark, pidx, tmp_path):
    from gitlab_elasticsearch_indexer_spark.operators.incremental import (
        load_versioned,
        save_versioned,
    )

    path = str(tmp_path / "pidx")
    save_versioned(pidx, path, snapshot_id=0)
    loaded = load_versioned(spark, path)
    assert loaded.pos_postings is not None
    assert loaded.pos_analyzer == "simple"
    assert loaded.pos_avgdl == pytest.approx(pidx.pos_avgdl)
    got = [(r["id"], r["score"])
           for r in phrase_search(loaded, "table hash", k=10).collect()]
    want = brute_phrase("table hash")
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want])


def test_code_index_gets_whitespace_subfield(spark):
    """On a code-analyzer index the sidecar is the whitespace sub-field:
    phrase matching works over source text and the normalizer is the
    sub-field's own avgdl, not the gram avgdl."""
    docs = spark.createDataFrame(
        [("r1_x.py", "def getUserById if return", "Python", "r1"),
         ("r1_y.py", "if return early always", "Python", "r1"),
         ("r2_z.py", "return if reversed here", "Python", "r2")],
        "id string, content string, lang string, repo string",
    ).withColumn("path", F.col("id"))
    idx = build_index(spark, docs, analyzer="code", docs_per_part=2,
                      positions=True)
    assert idx.pos_analyzer == "simple"
    # the sub-field normalizer is computed under ITS chain; on plain
    # ASCII identifiers it coincides with code_dl (captures share a
    # Lucene position), so only presence is asserted here
    assert idx.pos_avgdl is not None and idx.pos_avgdl > 0
    ids = [r["id"] for r in phrase_search(idx, "if return", k=10).collect()]
    assert set(ids) == {"r1_x.py", "r1_y.py"}
    idx.unpersist()


def _brute_rows(rows, phrase, k=10):
    """Lucene-way phrase scoring over an arbitrary corpus snapshot."""
    import math as _m

    terms = code_search_analyze(phrase)
    toks = {i: code_search_analyze(c) for i, c, _, _ in rows}
    n = len(rows)
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / n if n else 0.0
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in set(terms)}
    if any(df[t] == 0 for t in terms):
        return [], avgdl
    idf_sum = sum(
        _m.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms
    )
    out = []
    for i, tk in toks.items():
        pf = sum(
            1 for s in range(len(tk) - len(terms) + 1)
            if tk[s : s + len(terms)] == terms
        )
        if pf:
            out.append(
                (i, idf_sum * pf / (pf + K1 * (1 - B + B * dls[i] / avgdl)))
            )
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k], avgdl


def test_positions_maintained_through_update_delta_compact(spark, tmp_path):
    """The phrase sidecar survives the WHOLE index lifecycle: snapshot
    update (re-tokenizes rebuilt parts), O(batch) delta (byte-slice
    repack of deletes + fresh positions for appends, exact pos_total_dl
    arithmetic), and compaction (per-doc blob remap) — phrase results
    after each step equal a from-scratch brute force over the then-
    current corpus, including the BM25 normalizer."""
    from gitlab_elasticsearch_indexer_spark.operators.incremental import (
        compact_index,
        load_versioned,
        save_versioned,
        update_index,
        update_index_delta,
    )

    docs = spark.createDataFrame(
        [(i, c, l, r) for i, c, l, r in ROWS],
        "id string, content string, lang string, repo string",
    ).withColumn("path", F.col("id"))
    idx = build_index(spark, docs, analyzer="simple", docs_per_part=2,
                      positions=True)
    path = str(tmp_path / "pidx2")
    save_versioned(idx, path, snapshot_id=0)
    idx.unpersist()

    def check(rows, phrase="table hash"):
        loaded = load_versioned(spark, path)
        assert loaded.pos_postings is not None
        want, avgdl = _brute_rows(rows, phrase)
        assert loaded.pos_avgdl == pytest.approx(avgdl)
        got = [(r["id"], r["score"])
               for r in phrase_search(loaded, phrase, k=10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want]
        assert np.allclose([g[1] for g in got], [w[1] for w in want])
        return got

    # 1) snapshot update: one doc rewritten to contain the phrase 4×
    new_body = "table hash table hash table hash table hash brand new"
    rows1 = [(i, new_body if i == "r3_a.go" else c, l, r)
             for i, c, l, r in ROWS]
    update_index(
        spark, path,
        spark.createDataFrame(
            rows1, "id string, content string, lang string, repo string"
        ).withColumn("path", F.col("id")),
        snapshot_id=1,
    )
    got = check(rows1)
    assert got[0][0] == "r3_a.go"  # pf=4 ranks first

    # 2) delta: delete one phrase doc + add one with the phrase twice
    ups = spark.createDataFrame(
        [("r4_new.py", "intro table hash middle table hash end",
          "Python", "r4", "r4_new.py")],
        "id string, content string, lang string, repo string, path string",
    )
    dels = spark.createDataFrame([("r2_a.rb", "r2")], "id string, repo string")
    update_index_delta(spark, path, ups, dels, snapshot_id=2)
    rows2 = [r for r in rows1 if r[0] != "r2_a.rb"] + [
        ("r4_new.py", "intro table hash middle table hash end",
         "Python", "r4"),
    ]
    check(rows2)

    # 3) compaction: the delta-accreted small parts merge; phrase
    # results and the normalizer are invariant
    out = compact_index(spark, path, snapshot_id=3, min_fill=1.0,
                        min_parts=2)
    assert out.__dict__.get("compact_stats", {}).get("written_parts")
    check(rows2)

    # 4) a second delta AFTER compaction keeps the chain exact
    ups2 = spark.createDataFrame(
        [("r1_b.py", "now no phrase at all", "Python", "r1", "r1_b.py")],
        "id string, content string, lang string, repo string, path string",
    )
    update_index_delta(spark, path, ups2, None, snapshot_id=4)
    rows3 = [
        ("r1_b.py", "now no phrase at all", "Python", "r1")
        if r[0] == "r1_b.py" else r
        for r in rows2
    ]
    check(rows3)


# ---------------------------------------------------------------------------
# slop (ES match_phrase with slop / Lucene sloppy phrase)

from hypothesis import given, settings, strategies as st

from gitlab_elasticsearch_indexer_spark.operators.query import sloppy_freq


def _adj_arrays(tokens, terms):
    """Offset-adjusted position arrays for each phrase term, or None if
    some term is absent (the doc can't match)."""
    arrays = []
    for i, t in enumerate(terms):
        pos = np.asarray([p - i for p, tok in enumerate(tokens) if tok == t],
                         dtype=np.int64)
        if len(pos) == 0:
            return None
        arrays.append(pos)
    return arrays


def _exact_pf(tokens, terms):
    m = len(terms)
    return sum(1 for s in range(len(tokens) - m + 1)
               if tokens[s:s + m] == terms)


def test_sloppy_freq_hand_examples():
    # adjacent pair: one exact match at any slop
    assert sloppy_freq(_adj_arrays(["a", "b"], ["a", "b"]), 0) == 1.0
    assert sloppy_freq(_adj_arrays(["a", "b"], ["a", "b"]), 3) == 1.0
    # one-token gap: miss at slop 0, 1/(1+1) at slop 1
    arr = _adj_arrays(["a", "x", "b"], ["a", "b"])
    assert sloppy_freq(arr, 0) == 0.0
    assert sloppy_freq(arr, 1) == 0.5
    # transposition costs 2 (adjusted distance |1 - (-1)|)
    arr = _adj_arrays(["b", "a"], ["a", "b"])
    assert sloppy_freq(arr, 1) == 0.0
    assert sloppy_freq(arr, 2) == pytest.approx(1 / 3)
    # two exact occurrences count twice
    arr = _adj_arrays(["a", "b", "y", "a", "b"], ["a", "b"])
    assert sloppy_freq(arr, 0) == 2.0


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "x", "y"]), min_size=2,
             max_size=30),
    st.sampled_from([["a", "b"], ["a", "b", "c"], ["c", "a"]]),
)
def test_sloppy_slop0_equals_exact_phrase_freq(tokens, terms):
    arrays = _adj_arrays(tokens, terms)
    if arrays is None:
        return
    assert sloppy_freq(arrays, 0) == float(_exact_pf(tokens, terms))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "x"]), min_size=2, max_size=25),
    st.sampled_from([["a", "b"], ["b", "a", "c"]]),
    st.integers(min_value=0, max_value=6),
)
def test_sloppy_freq_monotone_in_slop(tokens, terms, slop):
    arrays = _adj_arrays(tokens, terms)
    if arrays is None:
        return
    assert sloppy_freq(arrays, slop + 1) >= sloppy_freq(arrays, slop)


def brute_sloppy(phrase, slop, lang=None, repo=None):
    """Lucene sloppy-phrase scoring over ROWS: doc must contain every
    term; tf = sloppy_freq (the matcher itself is pinned by the unit +
    property tests above — this exercises the kernel's doc
    intersection, lazy position slicing, filters and BM25 plumbing)."""
    terms = code_search_analyze(phrase)
    toks = {i: code_search_analyze(c) for i, c, _, _ in ROWS}
    n = len(ROWS)
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / n
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in set(terms)}
    if any(df[t] == 0 for t in terms):
        return []
    idf_sum = sum(
        math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms
    )
    meta = {i: (l, r) for i, _, l, r in ROWS}
    out = []
    for i, tk in toks.items():
        if lang is not None and meta[i][0] != lang:
            continue
        if repo is not None and meta[i][1] != repo:
            continue
        arrays = _adj_arrays(tk, terms)
        if arrays is None:
            continue
        pf = sloppy_freq(arrays, slop)
        if pf > 0:
            score = idf_sum * pf / (pf + K1 * (1 - B + B * dls[i] / avgdl))
            out.append((i, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("phrase,slop,kw", [
    ("table hash", 1, {}),          # sloppy widens the exact result set
    ("hash table", 2, {}),          # transpositions within slop
    ("user table", 3, {}),          # long-range spread
    ("table hash", 1, {"lang": "Ruby"}),
    ("table hash", 2, {"repo": "r3"}),
])
def test_phrase_slop_matches_brute_force(pidx, phrase, slop, kw):
    got = [
        (r["id"], r["score"])
        for r in phrase_search(pidx, phrase, k=10, slop=slop, **kw).collect()
    ]
    want = brute_sloppy(phrase, slop, **kw)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert np.allclose([g[1] for g in got], [w[1] for w in want])


def test_phrase_slop_widens_and_reweights(pidx):
    """'hash' and 'apart' sit 4 apart in r3_a — invisible at slop 0,
    visible at slop 3 with a down-weighted tf."""
    ids0 = {r["id"] for r in phrase_search(pidx, "hash apart", k=10).collect()}
    assert "r3_a.go" not in ids0
    ids3 = {r["id"]
            for r in phrase_search(pidx, "hash apart", k=10, slop=3).collect()}
    assert "r3_a.go" in ids3


def test_phrase_slop_rejects_repeated_terms(pidx):
    with pytest.raises(ValueError, match="repeated"):
        phrase_search(pidx, "hash table hash", slop=1)
    with pytest.raises(ValueError):
        phrase_search(pidx, "table hash", slop=-1)


# --- phrase entries in the batched path (msearch mixed-body analog) --------


def test_search_many_phrase_entries_match_single(pidx):
    """Phrase entries in search_many reproduce phrase_search exactly —
    mixed with a term entry, keyword filters, repo routing, and slop."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        search,
        search_many,
    )

    qs = {
        "p0": {"q": "table hash", "phrase": True},
        "p1": {"q": "table hash", "phrase": True, "lang": "Python"},
        "p2": {"q": "table hash", "phrase": True, "repo": "r2"},
        "p3": {"q": "hash table", "phrase": True, "slop": 2},
        "p4": {"q": "zzz missing", "phrase": True},
        "t0": "table hash",
    }
    batched = search_many(pidx, qs, k=5).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        if isinstance(spec, str):
            single = search(pidx, spec, k=5).collect()
        else:
            single = phrase_search(
                pidx, spec["q"], k=5, lang=spec.get("lang"),
                repo=spec.get("repo"), slop=spec.get("slop", 0),
            ).collect()
        exp = [(i + 1, r["id"], r["score"]) for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (qid, got, exp)
        assert np.allclose([g[2] for g in got], [e[2] for e in exp])


@pytest.mark.parametrize("fetch", ["auto", "spark"])
def test_search_many_phrase_offset_pages_global_order(pidx, fetch):
    """A phrase entry's per-entry 'from' slices the same global ranking
    phrase_search produces, with GLOBAL rank numbering, on both fetch
    paths."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    full = [(r["id"], round(r["score"], 9))
            for r in phrase_search(pidx, "table hash", k=10).collect()]
    assert len(full) >= 3, "fixture must rank at least 3 phrase hits"
    got = search_many(
        pidx, {"p": {"q": "table hash", "phrase": True, "from": 1}},
        k=2, fetch=fetch,
    ).collect()
    rows = sorted((r["rank"], r["id"], round(r["score"], 9)) for r in got)
    assert rows == [(2, *full[1]), (3, *full[2])]


def test_phrase_terms_filter(pidx):
    """Multi-value lang/repo (ES terms filter) on phrase queries: OR
    within the field, AND across fields — same bitmap machinery as term
    search; batched entries agree with the single-query path."""
    from gitlab_elasticsearch_indexer_spark.operators.query import search_many

    def brute_multi(phrase, langs=None, repos=None):
        out = []
        for lang in (langs if langs is not None else [None]):
            for repo in (repos if repos is not None else [None]):
                out.extend(brute_phrase(phrase, lang=lang, repo=repo))
        seen = {}
        for d, s in out:
            seen[d] = s
        return sorted(seen.items(), key=lambda x: (-x[1], x[0]))

    cases = [
        (["Python", "Ruby"], None),
        (None, ["r1", "r3"]),
        (["Python", "Go"], ["r1", "r2"]),
        ([], None),  # empty terms list matches nothing
    ]
    for langs, repos in cases:
        got = [(r["id"], r["score"])
               for r in phrase_search(pidx, "table hash", k=10,
                                      lang=langs, repo=repos).collect()]
        want = brute_multi("table hash", langs, repos)
        assert [g[0] for g in got] == [w[0] for w in want], (langs, repos)
        assert np.allclose([g[1] for g in got] or [0.0],
                           [w[1] for w in want] or [0.0])

    rows = search_many(
        pidx,
        {"b0": {"q": "table hash", "phrase": True,
                "lang": ["Python", "Go"], "repo": ["r1", "r2"]}},
        k=10,
    ).collect()
    got_b = [(r["rank"], r["id"], r["score"]) for r in rows]
    want_b = [(i + 1, d, s) for i, (d, s) in
              enumerate(brute_multi("table hash", ["Python", "Go"],
                                    ["r1", "r2"]))]
    assert [g[:2] for g in sorted(got_b)] == [w[:2] for w in want_b]


# --- match_phrase_prefix (ES search-as-you-type) ------------------------------


def brute_phrase_prefix(phrase, max_expansions=50, lang=None, repo=None):
    """MultiPhraseQuery referee: last token is a prefix; expansions are
    the pos-vocabulary terms starting with it ranked (df desc, term
    asc) capped; pf = Σ per-expansion exact phrase counts; idf = Σ over
    fixed terms + every expansion."""
    tokens = code_search_analyze(phrase)
    fixed, last = tokens[:-1], tokens[-1]
    toks = {i: code_search_analyze(c) for i, c, _, _ in ROWS}
    n = len(ROWS)
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / n
    vocab = sorted({t for tk in toks.values() for t in tk})
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in vocab}
    exps = sorted((t for t in vocab if t.startswith(last)),
                  key=lambda t: (-df[t], t))[:max_expansions]
    if not exps or any(df.get(t, 0) == 0 for t in fixed):
        return []
    idf_sum = sum(
        math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        for t in list(fixed) + exps
    )
    meta = {i: (l, r) for i, _, l, r in ROWS}
    out = []
    for i, tk in toks.items():
        if lang is not None and meta[i][0] != lang:
            continue
        if repo is not None and meta[i][1] != repo:
            continue
        pf = 0
        for e in exps:
            terms = list(fixed) + [e]
            pf += sum(
                1
                for s in range(len(tk) - len(terms) + 1)
                if tk[s: s + len(terms)] == terms
            )
        if pf:
            score = idf_sum * pf / (pf + K1 * (1 - B + B * dls[i] / avgdl))
            out.append((i, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


@pytest.mark.parametrize("phrase,cap,kw", [
    ("table h", 50, {}),          # multi-expansion last position
    ("table ha", 50, {}),         # single expansion ≡ plain phrase
    ("table h", 1, {}),           # the cap BITES (keeps highest-df)
    ("ta", 50, {}),               # one-token phrase: prefix only
    ("table h", 50, {"lang": "Python"}),
    ("table h", 50, {"repo": ["r1", "r3"]}),  # composes with terms filter
    ("table zz", 50, {}),         # no expansion → empty
    ("zz table", 50, {}),         # dead fixed term → empty
])
def test_phrase_prefix_matches_brute_force(pidx, phrase, cap, kw):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        phrase_prefix_search,
    )

    got = [(r["id"], r["score"])
           for r in phrase_prefix_search(pidx, phrase, k=10,
                                         max_expansions=cap, **kw).collect()]
    brute_kw = {kk: (v if not isinstance(v, list) else v)
                for kk, v in kw.items()}
    if isinstance(brute_kw.get("repo"), list):
        # referee takes single values; union over the list
        merged = {}
        for rv in brute_kw["repo"]:
            for d, s in brute_phrase_prefix(phrase, max_expansions=cap,
                                            lang=brute_kw.get("lang"),
                                            repo=rv):
                merged[d] = s
        want = sorted(merged.items(), key=lambda x: (-x[1], x[0]))
    else:
        want = brute_phrase_prefix(phrase, max_expansions=cap, **brute_kw)
    assert [g[0] for g in got] == [w[0] for w in want], (phrase, kw, got, want)
    assert np.allclose([g[1] for g in got] or [0.0],
                       [w[1] for w in want] or [0.0])


def test_phrase_prefix_expansion_ranked_and_capped(pidx):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        expand_phrase_prefix,
    )

    exps = expand_phrase_prefix(pidx, "h")
    toks = {i: code_search_analyze(c) for i, c, _, _ in ROWS}
    df = {}
    for tk in toks.values():
        for t in set(tk):
            df[t] = df.get(t, 0) + 1
    want = sorted((t for t in df if t.startswith("h")),
                  key=lambda t: (-df[t], t))
    assert [t for t, _ in exps] == want
    assert [d for _, d in exps] == [df[t] for t in want]
    assert [t for t, _ in expand_phrase_prefix(pidx, "h", max_expansions=1)] \
        == want[:1]


def test_search_many_phrase_prefix_entries_match_single(pidx):
    """Batched phrase_prefix entries return exactly the single-query
    results (shared decodes + one expansion scan per batch)."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        phrase_prefix_search,
        search_many,
    )

    qs = {
        "pp0": {"q": "table h", "phrase_prefix": True},
        "pp1": {"q": "table h", "phrase_prefix": True, "max_expansions": 1},
        "pp2": {"q": "ta", "phrase_prefix": True},
        "pp3": {"q": "table zz", "phrase_prefix": True},
        "pp4": {"q": "table h", "phrase_prefix": True,
                "lang": ["Python", "Go"]},
        "t0": "table",
    }
    by_q: dict[str, list] = {}
    for r in search_many(pidx, qs, k=6).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["score"])
        )
    for qid, spec in qs.items():
        if not (isinstance(spec, dict) and spec.get("phrase_prefix")):
            continue
        single = phrase_prefix_search(
            pidx, spec["q"], k=6, lang=spec.get("lang"),
            max_expansions=spec.get("max_expansions", 50),
        ).collect()
        exp = [(i + 1, r["id"], r["score"]) for i, r in enumerate(single)]
        got = sorted(by_q.get(qid, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], (qid, got, exp)
        assert np.allclose([g[2] for g in got] or [0.0],
                           [e[2] for e in exp] or [0.0], rtol=1e-12)


def test_phrase_prefix_validation(pidx):
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        phrase_prefix_search,
        search_many,
    )

    with pytest.raises(ValueError):
        phrase_prefix_search(pidx, "table h", max_expansions=0)
    with pytest.raises(ValueError, match="slop"):
        search_many(pidx, {"x": {"q": "table h", "phrase_prefix": True,
                                 "slop": 1}}, k=5)
    with pytest.raises(ValueError, match="not several"):
        search_many(pidx, {"x": {"q": "table h", "phrase_prefix": True,
                                 "phrase": True}}, k=5)


def test_rescore_phrase_composes_primary_and_phrase(pidx):
    """ES rescore with a match_phrase rescorer: the top window of the
    BM25 first pass re-ranks by qw·primary <mode> rw·secondary, docs
    the phrase misses keep their weighted primary — verified against
    the composition of the two independently-gated rankings for every
    score_mode, a sub-window, weights, and slop."""
    from gitlab_elasticsearch_indexer_spark.operators.query import (
        rescore_phrase,
        search,
    )

    query, phrase = "table user probe", "table hash"
    prim = [(r["id"], r["score"])
            for r in search(pidx, query, k=10).collect()]
    ph = {r["id"]: r["score"]
          for r in phrase_search(pidx, phrase, k=100).collect()}
    assert prim and ph

    def expect(window, k, qw, rw, mode, slop_ph=None):
        src = slop_ph if slop_ph is not None else ph
        out = []
        for i, s in prim[:window]:
            p = qw * s
            if i in src:
                sec = rw * src[i]
                v = {"total": p + sec, "multiply": p * sec,
                     "max": max(p, sec), "min": min(p, sec),
                     "avg": (p + sec) / 2}[mode]
            else:
                v = p
            out.append((i, v))
        out.sort(key=lambda t: (-t[1], t[0]))
        return [(i, round(v, 9)) for i, v in out[:k]]

    for mode in ("total", "multiply", "max", "min", "avg"):
        for qw, rw in ((1.0, 1.0), (0.7, 1.2)):
            got = [(r["id"], round(r["score"], 9))
                   for r in rescore_phrase(
                       pidx, query, phrase, window_size=10, k=5,
                       query_weight=qw, rescore_query_weight=rw,
                       score_mode=mode).collect()]
            assert got == expect(10, 5, qw, rw, mode), (mode, qw, rw)

    # a SMALL window: docs outside it are never rescored (and never
    # returned) even if the phrase matches them strongly
    got = [(r["id"], round(r["score"], 9))
           for r in rescore_phrase(pidx, query, phrase, window_size=2,
                                   k=2).collect()]
    assert got == expect(2, 2, 1.0, 1.0, "total")
    assert {i for i, _ in got} <= {i for i, _ in prim[:2]}

    # slop passes through to the sloppy matcher
    slop_ph = {r["id"]: r["score"]
               for r in phrase_search(pidx, phrase, k=100, slop=2).collect()}
    got = [(r["id"], round(r["score"], 9))
           for r in rescore_phrase(pidx, query, phrase, window_size=10,
                                   k=5, slop=2).collect()]
    assert got == expect(10, 5, 1.0, 1.0, "total", slop_ph=slop_ph)

    # a phrase with a dead term: primary ranking survives, weighted
    got = [(r["id"], round(r["score"], 9))
           for r in rescore_phrase(pidx, query, "zzz_missing hash",
                                   window_size=10, k=5,
                                   query_weight=0.5).collect()]
    assert got == [(i, round(0.5 * s, 9)) for i, s in prim[:5]]

    import pytest as _pt
    with _pt.raises(ValueError, match="score_mode"):
        rescore_phrase(pidx, query, phrase, score_mode="sum")
    with _pt.raises(ValueError, match="k must be"):
        rescore_phrase(pidx, query, phrase, window_size=5, k=10)
