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


def test_decode_bytes_utf8_and_fallbacks():
    assert decode_bytes("héllo".encode("utf-8")) == "héllo"
    # GB18030 golden mirrors integration_test.go:208-226 transcode cases
    s = "你好世界"
    out = decode_bytes(s.encode("gb18030"))
    assert isinstance(out, str) and len(out) > 0
    # never raises, even on garbage
    assert isinstance(decode_bytes(b"\xff\xfe\xfa\x01\x00garbage"), str)
    assert decode_bytes(b"") == ""
