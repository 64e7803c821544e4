"""Deterministic synthetic source-file corpus (FIXTURES.md §1).

Generates the canonical input table ``(repo, path, commit, lang,
content)`` at any scale, distributed (rows synthesized inside
``mapInPandas`` from ``spark.range`` ids) and fully deterministic: every
field is a function of the row id via a numpy PCG64 stream seeded by the
id, so the corpus is identical at any parallelism — a precondition for
the N vs 4N scaling-efficiency comparison.

Content mimics source code: Zipfian token mix of keywords (hot skew
terms ``if``/``return``/``def`` per FIXTURES.md), camelCase /
snake_case / PascalCase identifiers, digit runs, quoted strings, dotted
and slashed paths — every class the pattern_capture regexes
(/root/reference/elastic/index.go:18-30) act on.

Special rows exercising the reference's skip rules (NUL byte, >1 MiB,
empty, unicode paths, duplicate (repo,path) at two commits) are appended
as a tiny driver-side DataFrame.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SCHEMA = "repo string, path string, commit string, lang string, content string"

_KEYWORDS = [  # Zipf head — the hot skew terms named by the north_rule
    "if", "return", "def", "end", "class", "import", "for", "while",
    "else", "self", "nil", "true", "false", "func", "var", "let",
]
_VERBS = ["get", "set", "build", "parse", "index", "merge", "read", "write",
          "fetch", "submit", "flush", "encode", "detect", "split", "score"]
_NOUNS = ["User", "Blob", "Commit", "Repo", "Index", "Token", "Query",
          "Batch", "Doc", "Posting", "Term", "File", "Path", "Shard", "Score"]
_TAILS = ["ById", "ByName", "Async", "V2", "Impl", "Helper", "", "", "", ""]

_LANGS = [
    ("Python", ".py"), ("Ruby", ".rb"), ("Go", ".go"), ("JavaScript", ".js"),
    ("Java", ".java"), ("C", ".c"), ("C++", ".cpp"), ("Markdown", ".md"),
    ("Text", ".txt"), ("YAML", ".yml"),
]
_DIRS = ["src", "lib", "app", "internal", "pkg", "cmd", "test", "docs"]


def _build_vocab() -> list[str]:
    """~2.2k distinct tokens covering every pattern_capture class."""
    vocab: list[str] = list(_KEYWORDS)
    for v in _VERBS:
        for n in _NOUNS:
            for t in _TAILS[:4]:
                vocab.append(f"{v}{n}{t}")          # camelCase
    for v in _VERBS:
        for n in _NOUNS[:8]:
            vocab.append(f"{v}_{n.lower()}_impl")   # snake_case
    for n in _NOUNS:
        vocab.append(n.upper() + "_LIMIT")           # ALLCAPS
        vocab.append(f"{n}Record")                   # PascalCase
    vocab += [f"x{i}" for i in range(40)]            # digit runs
    vocab += [f'"msg{i}"' for i in range(20)]        # double-quoted
    vocab += [f"'lit{i}'" for i in range(20)]        # single-quoted
    vocab += [f"pkg.mod{i}.attr" for i in range(30)]  # dotted paths
    vocab += [f"src/util{i}/mod.py" for i in range(30)]  # slashed paths
    vocab += ["café", "naïve", "Größe"]              # asciifolding cases
    return vocab


VOCAB = _build_vocab()
# Zipf-ish probabilities over the vocab (rank r weight ∝ 1/(r+3)^1.07)
_ranks = np.arange(len(VOCAB), dtype=np.float64)
_probs = 1.0 / np.power(_ranks + 3.0, 1.07)
_probs /= _probs.sum()


def _hex40(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()[:40]


def _gen_batch(ids: np.ndarray, n_repos: int) -> pd.DataFrame:
    rows = []
    for i in ids:
        rng = np.random.Generator(np.random.PCG64(int(i) + 1))
        li = int(rng.integers(0, len(_LANGS)))
        lang, ext = _LANGS[li]
        repo = f"repo-{int(i) % n_repos:03d}"
        d1 = _DIRS[int(rng.integers(0, len(_DIRS)))]
        d2 = _DIRS[int(rng.integers(0, len(_DIRS)))]
        path = f"{d1}/{d2}/file_{int(i):07d}{ext}"
        ntok = int(rng.integers(30, 400))
        toks = rng.choice(len(VOCAB), size=ntok, p=_probs)
        content = " ".join(VOCAB[t] for t in toks)
        rows.append((repo, path, _hex40(f"c{i}"), lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def _special_rows(spark: SparkSession) -> DataFrame:
    nul = chr(0)
    rows = [
        # NUL in first 8 KiB → binary, must be skipped (indexer/blob.go:125-132)
        ("repo-000", "bin/early_nul.dat", _hex40("s1"), "Text", "abc" + nul + "def"),
        # NUL only after 8 KiB → indexed (sniff window, indexer/blob.go:20)
        ("repo-000", "bin/late_nul.dat", _hex40("s2"), "Text",
         ("if return def " * 700)[:9000] + nul + "tail"),
        # > 1 MiB → skipped (git/gitaly.go:25)
        ("repo-001", "big/huge.txt", _hex40("s3"), "Text", "a" * (1024 * 1024 + 1)),
        # empty file → indexed with empty postings
        ("repo-001", "files/empty", _hex40("s4"), "Text", ""),
        # non-ASCII content (precomposed + decomposed + CJK)
        ("repo-002", "encoding/テスト.txt", _hex40("s5"), "Text",
         "café café 日本語 getUserById"),
        # filename-based language detection cases (linguist/language_test.go)
        ("repo-002", "Makefile.am", _hex40("s6"), "Text", "all: build"),
        ("repo-002", "scripts/foo.go.rb", _hex40("s7"), "Ruby", "def foo end"),
        # duplicate (repo,path) at two commits → upsert last-write-wins
        ("repo-003", "dup/same.py", _hex40("old"), "Python", "old version if"),
        ("repo-003", "dup/same.py", _hex40("new"), "Python", "new version if return"),
        # path with spaces (git/repository_test.go:291)
        ("repo-003", "with space/README.md", _hex40("s8"), "Markdown", "hello space"),
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


def generate_source_files(
    spark: SparkSession,
    n_files: int = 1000,
    n_repos: int = 32,
    include_special: bool = True,
    parallelism: int | None = None,
) -> DataFrame:
    """Deterministic corpus of ``n_files`` synthetic source files."""
    n_parts = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), n_repos)

    base = spark.range(0, n_files, 1, n_parts).mapInPandas(gen, schema=SCHEMA)
    if include_special:
        base = base.unionAll(_special_rows(spark))
    return base


def materialize_fixtures(
    spark: SparkSession, path: str, n_files: int, n_repos: int = 32
) -> str:
    """Write the corpus once to parquet (cache for tests/bench); idempotent."""
    import os

    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        from pyspark.sql import functions as F

        (
            generate_source_files(spark, n_files, n_repos)
            # A3: store size so the 1 MiB filter pushes to the scan
            .withColumn("size", F.octet_length("content").cast("long"))
            .write.mode("overwrite")
            .parquet(path)
        )
    return path
