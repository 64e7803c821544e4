"""Goldens for the default/stemmer/ngram analyzers and A8 transcoding."""

from gitlab_elasticsearch_indexer_spark.functions.analyzers import (
    default_analyze,
    default_analyze_tf,
    light_english_stem,
    ngram_analyze,
)
from gitlab_elasticsearch_indexer_spark.functions.encoding import decode_bytes


def test_light_english_stem():
    # EnglishMinimalStemmer rules: plural -s dropped, -us/-ss kept
    assert light_english_stem("commits") == "commit"
    assert light_english_stem("classes") == "classe"
    assert light_english_stem("status") == "status"
    assert light_english_stem("pass") == "pass"
    assert light_english_stem("as") == "as"
    assert light_english_stem("fix") == "fix"


def test_default_analyzer():
    # standard-ish tokenizer splits on non-alphanumerics; lowercase; stem
    assert default_analyze("Fixes two bugs, adds tests!") == [
        "fixe", "two", "bug", "add", "test",
    ]
    tfs, dl = default_analyze_tf("bug bugs")
    assert tfs == {"bug": 2} and dl == 2


def test_ngram_analyzer():
    grams = ngram_analyze("ab1 x")
    # runs: 'ab1' → 2-grams ab,b1 + 3-gram ab1 ; 'x' shorter than min → none
    assert grams == ["ab", "b1", "ab1"]


def test_ngram_gate_expression_matches_kernel(spark):
    """The b9 gate's native Catalyst nGram expansion must agree with the
    shared ngram_analyze kernel (the semantic source of truth)."""
    from collections import Counter

    from pyspark.sql import functions as F

    names = ["src3", "my-repo_2", "Ab1 x", "zz"]
    df = spark.createDataFrame([(n,) for n in names], "name string").select(
        F.lower("name").alias("name"))
    runs = df.select(F.explode(
        F.expr(r"regexp_extract_all(name, '[\\p{L}\\p{N}]+', 0)")).alias("run"))
    grams = (
        runs.select("run", F.explode(F.sequence(F.lit(2), F.lit(3))).alias("sz"))
        .filter(F.length("run") >= F.col("sz"))
        .select(F.expr(
            "explode(transform(sequence(1, length(run) - sz + 1), "
            "i -> substring(run, i, sz)))").alias("term"))
    )
    native = Counter(r["term"] for r in grams.collect())
    kernel = Counter(g for n in names for g in ngram_analyze(n))
    assert native == kernel


def test_decode_bytes_reference_goldens():
    """Exact transcode equality for the reference's own golden cases
    (integration_test.go:208-226): GB18030 'encoding/iso8859.txt' and
    SHIFT_JIS 'encoding/test.txt'."""
    assert decode_bytes("狞\n".encode("gb18030")) == "狞\n"
    sj = (
        "これはテストです。\nこれもマージして下さい。\n\n"
        "Add excel file.\nDelete excel file."
    )
    assert decode_bytes(sj.encode("shift_jis")) == sj


def test_decode_bytes_utf8_and_fallbacks():
    assert decode_bytes("héllo".encode("utf-8")) == "héllo"
    # charset detection resolves CJK/latin families exactly, not just non-empty
    for s, enc in [
        ("你好世界", "gb18030"),
        ("简体中文测试文本，包含标点。", "gb18030"),
        ("日本語のテキストです。改行もあります。\n", "shift_jis"),
        ("한국어 테스트 문장입니다.", "euc_kr"),
        ("繁體中文測試，這是一段文字。", "big5"),
        ("café naïve résumé", "cp1252"),
    ]:
        assert decode_bytes(s.encode(enc)) == s, enc
    # BOM-declared unicode (BOM stripped); BOM-less utf-16 is never guessed
    for enc in ["utf-16", "utf-32", "utf-8-sig"]:
        assert decode_bytes("BOM test 日本語".encode(enc)) == "BOM test 日本語"
    # never raises, even on garbage
    assert isinstance(decode_bytes(b"\xff\xfe\xfa\x01\x00garbage"), str)
    assert decode_bytes(b"") == ""
