"""ES term suggester ("did you mean") — Lucene DirectSpellChecker
analog over the index vocabulary.

Referee: brute-force Levenshtein over the corpus's exact vocabulary +
df, replaying DirectSpellChecker's normalized edit similarity
``1 − d / min(len(term), len(cand))`` and both ES sort modes.
"""

import pytest

from gitlab_elasticsearch_indexer_spark.operators import index_build as ib
from gitlab_elasticsearch_indexer_spark.operators import query as q
from gitlab_elasticsearch_indexer_spark.operators.query import _lev_dist

DOCS = [
    ("d1", "query sorting merge table queue", "r1", "a/d1.txt", "en"),
    ("d2", "query quest sorted merge queue", "r1", "a/d2.txt", "en"),
    ("d3", "quest queue merge table tables", "r2", "a/d3.txt", "en"),
    ("d4", "sort sorts sorted sorting query", "r2", "a/d4.txt", "en"),
]


@pytest.fixture(scope="module")
def sg_index(spark):
    docs = spark.createDataFrame(
        DOCS, "id string, content string, repo string, path string, lang string"
    )
    idx = ib.build_index(spark, docs, analyzer="simple", docs_per_part=2)
    yield idx
    idx.unpersist()


def _vocab_df():
    df: dict[str, int] = {}
    for _, content, *_ in DOCS:
        for t in set(content.split()):
            df[t] = df.get(t, 0) + 1
    return df


def _referee(text, size=5, max_edits=2, prefix_length=1,
             suggest_mode="missing", sort="score"):
    vocab = _vocab_df()
    out = []
    for t in dict.fromkeys(text.lower().split()):
        if suggest_mode == "missing" and vocab.get(t, 0) > 0:
            continue
        cands = []
        for c, df in vocab.items():
            if c == t or c[:prefix_length] != t[:prefix_length]:
                continue
            d = _lev_dist(c, t)
            if d > max_edits:
                continue
            if suggest_mode == "popular" and df <= vocab.get(t, 0):
                continue
            cands.append((1.0 - d / min(len(t), len(c)), df, c))
        key = (lambda x: (-x[0], -x[1], x[2])) if sort == "score" else \
            (lambda x: (-x[1], -x[0], x[2]))
        cands.sort(key=key)
        out.extend((t, c, round(s, 9), df) for s, df, c in cands[:size])
    return out


def _got(df):
    return [(r["term"], r["suggestion"], round(r["score"], 9), r["df"])
            for r in df.collect()]


def test_suggest_matches_referee_all_modes(sg_index):
    for mode in ("missing", "popular", "always"):
        for sort in ("score", "frequency"):
            for text in ("querry", "sortt mergee", "quest", "xyzzy",
                         "tabl queu"):
                got = _got(q.suggest_terms(
                    sg_index, text, size=3, suggest_mode=mode, sort=sort))
                exp = _referee(text, size=3, suggest_mode=mode, sort=sort)
                assert got == exp, (mode, sort, text)


def test_suggest_missing_skips_in_vocab_terms(sg_index):
    # 'query' is in the vocabulary → missing mode suggests nothing
    assert _got(q.suggest_terms(sg_index, "query")) == []
    # always mode proposes its neighbors (both at distance 2, score
    # 0.6 — the df-desc tiebreak puts queue (df 3) before quest (df 2))
    got = _got(q.suggest_terms(sg_index, "query", suggest_mode="always"))
    assert [s for _, s, _, _ in got] == ["queue", "quest"]


def test_suggest_popular_requires_higher_df(sg_index):
    # 'quest' (df 2) in popular mode: only 'query' (df 3) qualifies,
    # 'queue' (df 3) too — both more frequent
    got = _got(q.suggest_terms(sg_index, "quest", suggest_mode="popular"))
    assert got == _referee("quest", suggest_mode="popular")
    assert all(df > 2 for _, _, _, df in got)


def test_suggest_prefix_and_edits_knobs(sg_index):
    # prefix_length=0 admits candidates with a different first char
    got0 = _got(q.suggest_terms(sg_index, "mergee", prefix_length=0,
                                suggest_mode="always"))
    assert got0 == _referee("mergee", prefix_length=0,
                            suggest_mode="always")
    # max_edits=1 is stricter than 2
    g1 = _got(q.suggest_terms(sg_index, "querry", max_edits=1))
    g2 = _got(q.suggest_terms(sg_index, "querry", max_edits=2))
    assert set(g1) <= set(g2)
    assert g1 == _referee("querry", max_edits=1)


def test_suggest_validation(sg_index):
    with pytest.raises(ValueError, match="suggest_mode"):
        q.suggest_terms(sg_index, "x", suggest_mode="nope")
    with pytest.raises(ValueError, match="sort must be"):
        q.suggest_terms(sg_index, "x", sort="df")
    with pytest.raises(ValueError, match="size >= 1"):
        q.suggest_terms(sg_index, "x", size=0)
    # empty analyzed text → empty result, stable schema
    df = q.suggest_terms(sg_index, "   ")
    assert df.columns == ["term", "suggestion", "score", "df"]
    assert df.count() == 0
