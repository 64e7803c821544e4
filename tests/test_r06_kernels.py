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
