"""Document pipeline — Family A operators from SURVEY.md §2.

The reference walks one file at a time through ``put``/``del`` callbacks
(/root/reference/indexer/indexer.go:35-76) and builds JSON blob/commit
documents.  Here the whole pipeline is a declarative column-expression
chain: every filter/projection is a native Catalyst expression (pushed
to the parquet scan where possible), no Python in the hot path.

Operators:

* A5 size filter       — skip blobs > 1 MiB (git/gitaly.go:25,
  indexer/blob.go:63-65)
* A6 binary filter     — NUL byte within the first 8 KiB
  (indexer/blob.go:19-21,125-132 — the same sniff git uses)
* A7 language detect   — basename/extension lookup against a broadcast
  dim table distilled from the linguist table
  (linguist/language.go:62-95); fallback "Text" (indexer/blob.go:113-120)
* A9 blob document     — {type, id, oid, rid, commit_sha, content,
  path, file_name, language} (indexer/blob.go:34-107); id =
  "{parent}_{path}" (indexer/blob.go:58-60)
* A10 commit document  — {type, id, author, committer, rid, message,
  sha} with person time format yyyyMMdd'T'HHmmssZ
  (indexer/commit.go:24-36, indexer/person.go:10-29)
* A12 upsert           — last-write-wins per id (elastic bulk index
  semantics, elastic/client.go:158-167)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LIMIT_FILE_SIZE = 1024 * 1024  # git/gitaly.go:25
BINARY_SNIFF_LIMIT = 8 * 1024  # indexer/blob.go:20
SUBMODULE_MODE = 0o160000  # gitlink entry mode (git/gitaly.go:147-149)

# The ES mapping is strict: "dynamic": "strict" (elastic/index.go:114)
# rejects documents carrying unknown fields with
# strict_dynamic_mapping_exception (proven by elastic/client_test.go:
# 191-195).  The write-path analog: document frames headed for the
# index must carry ONLY mapped fields.
BLOB_DOC_FIELDS = frozenset(
    ["type", "id", "oid", "rid", "commit_sha", "content", "path",
     "file_name", "language"]
)
COMMIT_DOC_FIELDS = frozenset(
    ["type", "id", "author", "committer", "rid", "message", "sha"]
)


class StrictSchemaError(ValueError):
    """strict_dynamic_mapping_exception analog (elastic/index.go:114)."""


def enforce_strict_schema(df: DataFrame, doc_type: str = "blob") -> DataFrame:
    """Reject document frames with fields outside the strict mapping."""
    allowed = BLOB_DOC_FIELDS if doc_type != "commit" else COMMIT_DOC_FIELDS
    unknown = set(df.columns) - allowed
    if unknown:
        raise StrictSchemaError(
            f"strict_dynamic_mapping_exception: unknown {doc_type} document "
            f"fields {sorted(unknown)} (mapping is dynamic=strict, "
            "elastic/index.go:114)"
        )
    return df

def filter_indexable(df: DataFrame, content_col: str = "content") -> DataFrame:
    """A5 + A6: drop too-large and binary blobs (both silent skips).

    A3: when the source carries a materialized ``size`` column (added
    at ingest, SURVEY §4), the 1 MiB cut uses it — a plain comparison
    on a stored column is parquet-pushable (row-group pruning before
    any content byte is read), the analog of the reference skipping
    the blob fetch on metadata alone (git/gitaly.go:243-247).

    A4: when the source carries a git ``mode`` column, submodule
    entries (gitlink mode 0160000) are dropped before any content work
    (git/gitaly.go:147-149) — also a pushable stored-column predicate.
    The synthetic columnar input has no mode column, so the filter is
    conditional on the column's presence.
    """
    c = F.col(content_col)
    size = F.col("size") if "size" in df.columns else F.octet_length(c)
    cond = (size <= F.lit(LIMIT_FILE_SIZE)) & (
        ~F.substring(c, 1, BINARY_SNIFF_LIMIT).contains(F.lit(chr(0)))
    )
    if "mode" in df.columns:
        # NULL-safe: a row with unknown mode is indexable (only a known
        # gitlink mode excludes it); plain != would null out the whole
        # conjunction and silently drop the row
        cond = cond & (
            F.col("mode").isNull()
            | (F.col("mode").cast("long") != F.lit(SUBMODULE_MODE))
        )
    return df.filter(cond)


def detect_language(
    spark: SparkSession, df: DataFrame, path_col: str = "path"
) -> DataFrame:
    """A7: full linguist lookup over the transcribed 391-language table,
    broadcast-joined, fallback "Text".

    Mirrors linguist.DetectLanguage (linguist/language.go:73-95):

    * unique basename match wins (len(byFilename)==1 fast path);
    * ambiguous basename → intersect filename candidates with extension
      candidates, preserving filename order (``and()`` semantics);
    * else first extension candidate; else "Text"
      (indexer/blob.go:113-120).

    Both candidate lists travel as ordered ``array<string>`` columns on
    two tiny broadcast dims (886 extensions / 74 filenames), so the
    whole resolution is native Catalyst array logic — no Python, and at
    scale the two joins are broadcast hash joins with no shuffle.
    """
    from gitlab_elasticsearch_indexer_spark.functions.linguist import (
        EXT_INDEX,
        FILENAME_INDEX,
    )

    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    # Go path.Ext: suffix from the final '.' of the basename ('.go' → '.go')
    ext = F.regexp_extract(base, r"(\.[^./]*)$", 1)

    fn_dim = spark.createDataFrame(
        [(k, v) for k, v in FILENAME_INDEX.items()],
        "fn string, fn_langs array<string>",
    )
    ext_dim = spark.createDataFrame(
        [(k, v) for k, v in EXT_INDEX.items()],
        "ext string, ext_langs array<string>",
    )

    fn_langs = F.coalesce(F.col("fn_langs"), F.array())
    ext_langs = F.coalesce(F.col("ext_langs"), F.array())
    resolved = (
        F.when(F.size(fn_langs) == 1, F.get(fn_langs, 0))
        .when(
            F.size(fn_langs) > 1,
            F.get(F.filter(fn_langs, lambda l: F.array_contains(ext_langs, l)), 0),
        )
        .otherwise(F.get(ext_langs, 0))
    )
    out = (
        df.withColumn("_base", base)
        .withColumn("_ext", ext)
        .join(F.broadcast(fn_dim), F.col("_base") == F.col("fn"), "left")
        .join(F.broadcast(ext_dim), F.col("_ext") == F.col("ext"), "left")
        .withColumn("detected_lang", F.coalesce(resolved, F.lit("Text")))
        .drop("_base", "_ext", "fn", "fn_langs", "ext", "ext_langs")
    )
    return out


def build_blob_documents(
    df: DataFrame, blob_type: str = "blob", dedup_latest: bool = True
) -> DataFrame:
    """A9 + A11 (+A12 last-write-wins): source rows → blob documents.

    Output schema matches the reference blob doc
    (indexer/blob.go:34-56; golden integration_test.go:300-313):
    type, id, oid, rid, commit_sha, content, path, file_name, language.
    ``oid`` has no git object store here; we define it as the sha256 of
    the content (also serving the per-row sha256 invariant from
    BASELINE.json).
    """
    rid = (
        F.col("repo") if blob_type == "blob"
        else F.concat(F.lit("wiki_"), F.col("repo"))  # indexer/indexer.go:53-69
    )
    doc = df.select(
        F.lit(blob_type).alias("type"),
        F.concat(F.col("repo"), F.lit("_"), F.col("path")).alias("id"),
        F.sha2(F.col("content"), 256).alias("oid"),
        rid.alias("rid"),
        F.col("commit").alias("commit_sha"),
        F.col("content"),
        F.col("path"),
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("lang").alias("language"),
    )
    if dedup_latest:
        # A12: ES bulk index is an upsert keyed by id — last write wins.
        # With no ingest order column, "latest" is made deterministic by
        # max(commit_sha) per id; real ingestion orders by snapshot.
        # Implemented as max_by over the (commit_sha, oid) order struct:
        # one hash aggregation with map-side partials instead of the
        # window's exchange + full sort + rank filter (guide §2.3
        # "aggregate before you shuffle") — the selected row per id is
        # identical (struct comparison IS the lexicographic
        # (commit_sha desc, oid desc) order the window used; a full tie
        # implies an identical document: same id ⇒ same repo/path, same
        # oid ⇒ same content).
        other = [c for c in doc.columns if c != "id"]
        doc = (
            doc.groupBy("id")
            .agg(
                F.max_by(
                    F.struct(*other),
                    F.struct(F.col("commit_sha"), F.col("oid")),
                ).alias("_doc")
            )
            .select("id", "_doc.*")
            .select(*doc.columns)  # restore the documented column order
        )
    return doc


def build_commit_documents(commits: DataFrame, repo_col: str = "repo") -> DataFrame:
    """A10: commit rows → commit documents (indexer/commit.go:24-36).

    Expects columns: repo, sha, author_name, author_email, author_time,
    committer_name, committer_email, committer_time, message.
    Person.time uses the reference's format "20060102T150405-0700"
    (indexer/person.go:10) = yyyyMMdd'T'HHmmssZ.
    """
    tfmt = "yyyyMMdd'T'HHmmssZ"

    def person(prefix: str):
        return F.struct(
            F.col(f"{prefix}_name").alias("name"),
            F.col(f"{prefix}_email").alias("email"),
            F.date_format(F.col(f"{prefix}_time"), tfmt).alias("time"),
        )

    return enforce_strict_schema(
        commits.select(
            F.lit("commit").alias("type"),
            F.concat(F.col(repo_col), F.lit("_"), F.col("sha")).alias("id"),
            person("author").alias("author"),
            person("committer").alias("committer"),
            F.col(repo_col).alias("rid"),
            F.col("message"),
            F.col("sha"),
        ),
        doc_type="commit",
    )


def run_blob_pipeline(
    spark: SparkSession, source: DataFrame, blob_type: str = "blob"
) -> DataFrame:
    """Full A-family pipeline: filters → language enrich → documents."""
    filtered = filter_indexable(source)
    enriched = detect_language(spark, filtered)
    # input lang column is advisory; the pipeline's detected value is
    # cross-checked in tests, the stored doc keeps the input lang when
    # present (it is authoritative in the source table).
    return enforce_strict_schema(build_blob_documents(enriched, blob_type))
