"""Round-6 optimization internals: the Arrow pack kernel, the combined-
key sort, and the expansion-free code_dl must be EXACTLY equivalent to
the constructs they replaced."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
    code_analyze_tf, code_dl,
)
from gitlab_elasticsearch_indexer_spark.operators.index_build import (
    _arrow_dict_encode, _sort_by_code_doc, factorize_strings,
    make_pack_group_kernel,
)


def test_arrow_dict_encode_nul_safe():
    # pandas' StringHashTable merges "de\x00tail" grams into "de";
    # Arrow hashes the full buffer — codes must distinguish them
    vals = ["de", "de\x00tail", "de", "de\x00tail", "detail"]
    codes, uniq = _arrow_dict_encode(pa.array(vals))
    assert len(uniq) == 3
    assert codes[0] == codes[2] and codes[1] == codes[3]
    assert codes[0] != codes[1] != codes[4]


def test_arrow_dict_encode_matches_factorize_on_clean_strings():
    vals = pd.Series(["b", "a", "b", "c", "a", "日本語", "grüße"])
    c1, u1 = factorize_strings(vals)
    c2, u2 = _arrow_dict_encode(pa.array(vals, from_pandas=True))
    assert list(c1) == list(c2)
    assert list(u1) == list(u2)


def test_sort_by_code_doc_equals_lexsort():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 50, 5000).astype(np.int64)
    docs = rng.integers(10_000, 12_000, 5000).astype(np.int64)
    got = _sort_by_code_doc(codes, docs)
    exp = np.lexsort((docs, codes))
    # stable ⇒ identical permutation, not just an equivalent order
    assert np.array_equal(got, exp)


def test_sort_by_code_doc_overflow_fallback():
    codes = np.array([1 << 61, 0, 1 << 61], dtype=np.int64)
    docs = np.array([5, 3, 4], dtype=np.int64)
    got = _sort_by_code_doc(codes, docs)
    assert np.array_equal(got, np.lexsort((docs, codes)))


def test_code_dl_equals_analyze_pos_sum():
    texts = [
        "if return getUserById x1 'lit' a",  # short token "a" drops
        "café naïve Größe 日本語",
        "de\x00tail weird\x00 pkg.mod.attr src/u/m.py",
        "", "   ", "x y z",
    ]
    for t in texts:
        assert code_dl(t) == code_analyze_tf(t)[1], t


def test_code_capture_tf_counter_path_identical():
    # code_capture_tf counts via ONE C-level Counter over memoized
    # per-token capture lists; counts AND key order must match the
    # per-token dict-merge it replaced
    from collections import Counter

    from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
        _token_captures, code_capture_tf,
    )

    def reference(text):
        caps = Counter()
        dl = 0
        for tok in text.split():
            tok_caps, pos = _token_captures(tok)
            dl += pos
            for c, n in tok_caps.items():
                caps[c] += n
        return dict(caps), dl

    texts = [
        "if return getUserById parseQuery x12 'lit1' \"msg\" pkg.mod.attr",
        "de\x00tail weird\x00ness if if if",
        "café naïve Größe 日本語テスト",
        "", "   ", "a", "if", '"a","b"',
        "src/util/mod.py BUILD_LIMIT UserRecord get_user_impl if if",
    ]
    for t in texts:
        got, ref = code_capture_tf(t), reference(t)
        assert got[0] == ref[0] and got[1] == ref[1], t
        assert list(got[0].keys()) == list(ref[0].keys()), t


def _old_postings_from_docs(with_idx, analyzer, docs_per_part,
                            term_buckets=32, content_col="content"):
    """The pre-round-6 physical plan: per-(doc, capture) row shuffle +
    pack — kept here as the identity referee for the partial-postings
    plan."""
    from pyspark.sql import functions as F

    import gitlab_elasticsearch_indexer_spark.operators.index_build as ib
    from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
        EXPAND_PREFIXES,
    )

    kernel = ib.make_term_rows_kernel(analyzer, content_col)
    tokened = with_idx.select("doc_idx", content_col).mapInPandas(
        kernel, schema=ib.TERM_ROWS_SCHEMA
    )
    term_rows = tokened.select(
        (F.col("doc_idx") / docs_per_part).cast("long").alias("doc_part"),
        F.pmod(F.xxhash64(F.substring("term", 1, 2)),
               F.lit(term_buckets)).alias("bucket"),
        "term", "doc_idx", "tf", "dl",
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [StructField("doc_part", LongType()),
         StructField("term", StringType())] + list(ib.PACK_SCHEMA.fields)
    )
    pack_group = ib.make_pack_group_kernel(EXPAND_PREFIXES[analyzer])
    return term_rows.groupBy("doc_part", "bucket").applyInPandas(
        pack_group, schema=out_schema
    )


def _postings_key(df):
    rows = {}
    for r in df.collect():
        rows[(r["doc_part"], r["term"])] = (
            r["df"], r["cf"], bytes(r["docs_bin"]), bytes(r["tfs_bin"]),
            bytes(r["dls_bin"]), list(r["block_last"]),
            list(r["block_max_tf"]), list(r["block_min_dl"]),
            r["max_tf"], r["min_dl"],
        )
    return rows


def test_partial_postings_identical_to_row_shuffle(spark):
    import gitlab_elasticsearch_indexer_spark.operators.index_build as ib

    texts = [
        "if return getUserById parseQuery x12 'lit1' \"msg\" pkg.mod.attr",
        "de\x00tail weird\x00ness if if if",
        "café naïve Größe 日本語テスト",
        "", "   ", "if",
        "src/util/mod.py BUILD_LIMIT UserRecord get_user_impl",
    ]
    docs = [(f"d{i:03d}", texts[i % len(texts)] + f" uniq{i}")
            for i in range(90)]
    df = spark.createDataFrame(docs, "id string, content string")
    with_idx = ib.assign_doc_ids(df, "id", caches=[])
    with_idx = with_idx.persist()
    for analyzer in ("code", "simple"):
        new = _postings_key(
            ib.postings_from_docs(with_idx, analyzer, 16))
        old = _postings_key(
            _old_postings_from_docs(with_idx, analyzer, 16))
        assert new == old, f"analyzer {analyzer}: packed outputs diverge"
    with_idx.unpersist()


def test_partial_kernel_flush_boundaries(spark):
    # a tiny flush threshold forces many partials per (task, term);
    # the merged output must not change
    import gitlab_elasticsearch_indexer_spark.operators.index_build as ib

    docs = [(f"d{i:03d}", "if return tok%d getUser" % (i % 5))
            for i in range(60)]
    df = spark.createDataFrame(docs, "id string, content string")
    with_idx = ib.assign_doc_ids(df, "id", caches=[]).persist()
    baseline = _postings_key(ib.postings_from_docs(with_idx, "code", 16))
    orig = ib.PARTIAL_FLUSH_ENTRIES
    try:
        ib.PARTIAL_FLUSH_ENTRIES = 7  # flush after every handful of entries
        tiny = _postings_key(ib.postings_from_docs(with_idx, "code", 16))
    finally:
        ib.PARTIAL_FLUSH_ENTRIES = orig
    assert tiny == baseline
    with_idx.unpersist()


def test_pack_kernel_unicode_and_nul_grams():
    # NUL-bearing and multibyte captures must expand/aggregate exactly
    # like the per-string reference (edge_ngrams over python slices)
    rows = []
    toks = ["de\x00tail", "日本語テスト", "grüße", "ab"]
    for d, tok in enumerate(toks):
        rows.append((0, tok, 2, 7, d))
    pdf = pd.DataFrame(rows, columns=["doc_part", "term", "tf", "dl", "doc_idx"])
    out = make_pack_group_kernel((2, 40))(pdf)
    grams = set(out["term"])
    expect = set()
    for tok in toks:
        expect |= {tok[:k] for k in range(2, len(tok) + 1)}
    assert grams == expect
    # every gram's df is the number of tokens sharing that prefix
    by_term = dict(zip(out["term"], out["df"]))
    assert by_term["de"] == 1 and by_term["de\x00"] == 1
    assert by_term["日本"] == 1
