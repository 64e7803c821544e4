"""Incremental indexing with snapshot checkpoints (A1, A13, A16).

The reference consumes a FROM_SHA→TO_SHA change stream from Gitaly and
upserts/deletes by document id (/root/reference/git/gitaly.go:123-174,
indexer/indexer.go:35-76, main.go:46-47).  Here the change stream is a
snapshot diff of the source table, and the index is maintained as a
*versioned, manifest-tracked* set of document partitions — the Iceberg
pattern realized on plain parquet (under a real Iceberg catalog the
manifest bookkeeping is the table format's job):

* every update writes ONLY the rebuilt doc partitions under a new
  version directory ``v{snapshot_id}/``;
* a manifest maps doc_part → the version that owns its current data;
* a checkpoint table records (snapshot_id, globals, wall time) — the
  resume point; a crashed update never corrupts the previous version
  (new version dirs are invisible until the checkpoint row lands);
* a lineage table records per-partition row/term counts and rebuild
  provenance per snapshot.

Update algorithm (doc ids are append-ordered for increments; global-rank
determinism applies to full builds):

1. diff curr source vs indexed doc_stats on (id, oid=sha256(content)) →
   added / modified / deleted;
2. affected parts = parts holding modified∪deleted docs, plus the tail
   part that new doc_idx values (max+1…) extend into;
3. re-tokenize only the affected parts' surviving docs + all new docs,
   rebuild those partitions' postings; untouched partitions are reused
   via the manifest;
4. recompute term_stats (term-level aggregate over all postings) and
   the collection globals; write checkpoint + lineage.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import fs as _fs
from .index_build import (
    TERM_BUCKETS,
    InvertedIndex,
    assign_doc_ids,
    doc_stats_from_docs,
    filters_from_doc_stats,
    idf_expr,
    part_meta_from_doc_stats,
    postings_from_docs,
    term_bucket_expr,
    term_stats_from_postings,
)

log = logging.getLogger(__name__)

CHECKPOINT_SCHEMA = (
    "snapshot_id long, n_docs long, avgdl double, analyzer string, "
    "docs_per_part long, wall_sec double, op string, total_dl long"
)


def _checkpoint_df(spark: SparkSession, path: str) -> DataFrame:
    """Checkpoint table, schema-merged across rounds: pre-total_dl rows
    surface a NULL total_dl (callers fall back to the rounded
    avgdl·n_docs reconstruction those checkpoints were written with)."""
    cp = spark.read.option("mergeSchema", "true").parquet(f"{path}/checkpoint")
    if "total_dl" not in cp.columns:
        cp = cp.withColumn("total_dl", F.lit(None).cast("long"))
    return cp


def _total_dl_of(row) -> int:
    """Exact integer collection length from a checkpoint row; legacy
    rows (no total_dl) reconstruct it from the rounded float avgdl."""
    d = row if isinstance(row, dict) else row.asDict()
    if d.get("total_dl") is not None:
        return int(d["total_dl"])
    return int(round(float(d["avgdl"]) * int(d["n_docs"])))


def snapshot_diff(prev: DataFrame, curr: DataFrame, key: str = "id",
                  fingerprint: str = "oid") -> DataFrame:
    """A1 analog: classify (key) rows as added/modified/deleted.

    ``prev``/``curr`` need (key, fingerprint) columns; a full-outer join
    on the key classifies by null-ness and fingerprint inequality —
    rename semantics fall out as delete(old path) + add(new path),
    exactly like the reference (git/gitaly.go:151-158).
    """
    a = prev.select(F.col(key).alias("id"), F.col(fingerprint).alias("_fp_a"))
    b = curr.select(F.col(key).alias("id"), F.col(fingerprint).alias("_fp_b"))
    j = a.join(b, "id", "full_outer")
    return j.select(
        "id",
        F.when(F.col("_fp_b").isNull(), F.lit("deleted"))
        .when(F.col("_fp_a").isNull(), F.lit("added"))
        .when(F.col("_fp_a") != F.col("_fp_b"), F.lit("modified"))
        .otherwise(F.lit("same"))
        .alias("op"),
    ).filter(F.col("op") != "same")


# --------------------------------------------------------------------------
# versioned persistence


def save_versioned(index: InvertedIndex, path: str, snapshot_id: int = 0) -> None:
    """Full build → version v{snapshot_id} owning every partition."""
    spark = index.postings.sparkSession
    t0 = time.time()
    vdir = f"{path}/v{snapshot_id}"
    (
        index.postings.repartition("doc_part")
        .sortWithinPartitions("doc_part", "term")
        .write.mode("overwrite")
        .partitionBy("doc_part")
        .parquet(f"{vdir}/postings")
    )
    index.doc_stats.write.mode("overwrite").partitionBy("doc_part").parquet(
        f"{vdir}/doc_stats"
    )
    _write_term_stats_buckets(index.term_stats, vdir)
    _write_term_manifest(
        spark, vdir, [(b, snapshot_id) for b in range(TERM_BUCKETS)]
    )
    _write_sidecars(index.filters, index.part_meta, index.doc_stats,
                    index.docs_per_part, vdir)
    if index.pos_postings is not None:
        (
            index.pos_postings.repartition("doc_part")
            .sortWithinPartitions("doc_part", "term")
            .write.mode("overwrite")
            .partitionBy("doc_part")
            .parquet(f"{vdir}/pos_postings")
        )
        # exact integer token count of the phrase field (Σ cf counts
        # every position once): the delta path's pos_avgdl bookkeeping
        pos_total = int(
            spark.read.parquet(f"{vdir}/pos_postings")
            .agg(F.coalesce(F.sum("cf"), F.lit(0))).collect()[0][0]
        )
        _write_pos_meta(spark, vdir, index.pos_analyzer or "simple",
                        pos_total, index.n_docs)
    if index.fields:
        for name, fh in sorted(index.fields.items()):
            _write_field_postings(fh.postings, vdir, name)
        _write_fields_meta(spark, vdir, [
            (name, fh.analyzer, fh.total_dl)
            for name, fh in sorted(index.fields.items())
        ])

    parts = [r["doc_part"] for r in index.doc_stats.select("doc_part").distinct().collect()]
    manifest = spark.createDataFrame(
        [(int(p), snapshot_id) for p in parts], "doc_part long, version long"
    )
    manifest.write.mode("overwrite").parquet(f"{vdir}/manifest")
    _write_lineage(spark, path, snapshot_id, index, rebuilt_parts=set(parts))
    # exact integer collection length: the delta path derives avgdl from
    # it each batch instead of accumulating float drift across thousands
    # of (old_avgdl·old_n − dead + added)/n reconstructions
    total_dl = int(
        index.doc_stats.agg(F.coalesce(F.sum("dl"), F.lit(0))).collect()[0][0]
    )
    spark.createDataFrame(
        [(snapshot_id, index.n_docs, index.avgdl, index.analyzer,
          index.docs_per_part, round(time.time() - t0, 3), "full_build",
          total_dl)],
        CHECKPOINT_SCHEMA,
    ).write.mode("append").parquet(f"{path}/checkpoint")


def _write_sidecars(filters, part_meta, doc_stats, docs_per_part: int,
                    vdir: str) -> None:
    """Persist the keyword-filter bitmaps + routing manifest next to a
    version's postings — the ES analog is on-disk doc values and
    ``_routing`` (elastic/index.go:115-117), NOT per-query recomputation.
    ``doc_stats`` here covers only the partitions this version owns, so
    an incremental update writes sidecars for its rebuilt parts only;
    the manifest resolves each part's sidecar like its postings."""
    if filters is None:
        filters = filters_from_doc_stats(doc_stats, docs_per_part)
    if part_meta is None:
        part_meta = part_meta_from_doc_stats(doc_stats)
    filters.write.mode("overwrite").partitionBy("doc_part").parquet(
        f"{vdir}/filters"
    )
    part_meta.write.mode("overwrite").parquet(f"{vdir}/part_meta")


def _write_lineage(spark, path, snapshot_id, index: InvertedIndex,
                   rebuilt_parts: set[int]) -> None:
    """Per-partition lineage metrics (north_rule: per-partition lineage)."""
    stats = (
        index.doc_stats.groupBy("doc_part").agg(F.count("*").alias("n_docs"))
        .join(
            index.postings.groupBy("doc_part").agg(F.count("*").alias("n_terms")),
            "doc_part", "left",
        )
        .select(
            F.lit(snapshot_id).alias("snapshot_id"),
            "doc_part", "n_docs",
            F.coalesce("n_terms", F.lit(0)).alias("n_terms"),
            F.col("doc_part").isin([int(p) for p in rebuilt_parts]).alias("rebuilt"),
        )
    )
    stats.write.mode("append").parquet(f"{path}/lineage")


def latest_checkpoint(spark: SparkSession, path: str) -> dict:
    cp = _checkpoint_df(spark, path)
    row = cp.orderBy(F.col("snapshot_id").desc()).limit(1).collect()[0]
    return row.asDict()


def _manifest_by_version(spark: SparkSession, path: str,
                         snapshot_id: int) -> dict[int, list[int]]:
    manifest = spark.read.parquet(f"{path}/v{snapshot_id}/manifest")
    by_version: dict[int, list[int]] = {}
    for r in manifest.collect():
        by_version.setdefault(int(r["version"]), []).append(int(r["doc_part"]))
    return by_version


def _read_parts(spark: SparkSession, path: str,
                by_version: dict[int, list[int]], table: str) -> DataFrame:
    """Union a partitioned table across the versions that own its parts;
    the static IN lists reach each scan as partition filters.  Posting
    tables read with their EXPLICIT schema: a version dir whose batch
    appended only zero-term docs has doc_stats rows but a file-less
    postings dir, which must load as empty, not fail inference."""
    from .index_build import POS_PACK_SCHEMA, POSTINGS_TABLE_SCHEMA

    schema = {"postings": POSTINGS_TABLE_SCHEMA,
              "pos_postings": POS_PACK_SCHEMA}.get(table)
    if schema is None and table.startswith("fields/"):
        schema = POSTINGS_TABLE_SCHEMA  # field postings share the layout
    out = None
    for version, parts in sorted(by_version.items()):
        reader = spark.read if schema is None else spark.read.schema(schema)
        t = reader.parquet(f"{path}/v{version}/{table}").filter(
            F.col("doc_part").isin(parts)
        )
        # doc_stats may gain dl_<field> columns when extra fields are
        # built; versions written before that union as null (fields are
        # only consumed when EVERY live version carries them anyway)
        out = t if out is None else out.unionByName(
            t, allowMissingColumns=(table == "doc_stats")
        )
    return out


def _term_manifest_by_version(spark: SparkSession, path: str,
                              snapshot_id: int) -> dict[int, list[int]] | None:
    """Bucket-ownership map of a snapshot's term_stats (version →
    term_buckets), or ``None`` for the legacy whole-file layout."""

    p = f"{path}/v{snapshot_id}/term_manifest"
    if not _fs.isdir(p):
        return None
    out: dict[int, list[int]] = {}
    for r in spark.read.parquet(p).collect():
        out.setdefault(int(r["version"]), []).append(int(r["term_bucket"]))
    return out


def _read_term_stats_raw(spark: SparkSession, path: str,
                         tm_by_version: dict[int, list[int]],
                         buckets: list[int] | None = None) -> DataFrame:
    """(term, df, cf, term_bucket) union across the owning versions,
    pruned to ``buckets`` when given — the static IN lists reach each
    bucket-partitioned scan as partition filters."""
    out = None
    for v, bks in sorted(tm_by_version.items()):
        sel = bks if buckets is None else sorted(set(bks) & set(buckets))
        if buckets is not None and not sel:
            continue
        t = (
            # explicit schema: a delta that kills every term of its
            # touched buckets writes a file-less (but manifested)
            # term_stats dir — inference would fail, the known schema
            # loads it as empty
            spark.read.schema("term string, df long, cf long, term_bucket int")
            .parquet(f"{path}/v{v}/term_stats")
            .filter(F.col("term_bucket").isin(sel))
            .select("term", "df", "cf", "term_bucket")
        )
        out = t if out is None else out.unionByName(t)
    if out is None:
        out = spark.createDataFrame(
            [], "term string, df long, cf long, term_bucket int"
        )
    return out


def _read_term_stats(spark: SparkSession, path: str, snapshot_id: int,
                     n_docs: int) -> DataFrame:
    """Query view of a snapshot's term_stats.  The bucketed store holds
    (term, df, cf) only; idf derives from the CURRENT n_docs at read
    time (it changes every delta batch — storing it would leave every
    untouched bucket stale).  Legacy single-file layouts read as-is."""
    tm = _term_manifest_by_version(spark, path, snapshot_id)
    if tm is None:
        ts = spark.read.parquet(f"{path}/v{snapshot_id}/term_stats")
        if "idf" not in ts.columns:
            ts = ts.withColumn("idf", idf_expr(n_docs))
        return ts
    return _read_term_stats_raw(spark, path, tm).withColumn(
        "idf", idf_expr(n_docs)
    )


def _write_term_stats_buckets(ts: DataFrame, vdir: str) -> None:
    if "term_bucket" not in ts.columns:
        ts = ts.withColumn("term_bucket", term_bucket_expr())
    (
        ts.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            "term_bucket",
        )
        .repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{vdir}/term_stats")
    )


def _write_term_manifest(spark: SparkSession, vdir: str,
                         rows: list[tuple[int, int]]) -> None:
    spark.createDataFrame(
        [(int(b), int(v)) for b, v in rows], "term_bucket int, version long"
    ).write.mode("overwrite").parquet(f"{vdir}/term_manifest")


def _write_fields_meta(spark: SparkSession, vdir: str,
                       rows: list[tuple[str, str, int]]) -> None:
    """(field, analyzer, exact integer Σ field-dl) for a version that
    maintains the extra searchable fields (ES multi-field mapping)."""
    spark.createDataFrame(
        [(f, a, int(t)) for f, a, t in rows],
        "field string, analyzer string, total_dl long",
    ).write.mode("overwrite").parquet(f"{vdir}/fields_meta")


def _read_fields_meta(spark: SparkSession, path: str,
                      versions) -> dict[str, tuple[str, int]] | None:
    """{field: (analyzer, total_dl)} from the NEWEST version carrying a
    fields_meta (older versions' totals are stale), or None when no
    version maintains fields."""
    for v in sorted(versions, reverse=True):
        p = f"{path}/v{v}/fields_meta"
        if _fs.isdir(p):
            return {
                r["field"]: (r["analyzer"], int(r["total_dl"]))
                for r in spark.read.parquet(p).collect()
            }
    return None


def _write_field_postings(fpost: DataFrame, vdir: str, name: str) -> None:
    (
        fpost.repartition("doc_part").sortWithinPartitions("doc_part", "term")
        .write.mode("overwrite").partitionBy("doc_part")
        .parquet(f"{vdir}/fields/{name}/postings")
    )


def _empty_index(spark: SparkSession, path: str, snapshot_id: int,
                 g) -> InvertedIndex:
    """A delta batch can delete EVERY document, leaving an empty
    manifest; the index must then load as a VALID zero-doc engine
    (searches return no rows) rather than a handle full of Nones."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from .index_build import PACK_SCHEMA

    post_schema = StructType(
        [StructField("doc_part", LongType()), StructField("term", StringType())]
        + list(PACK_SCHEMA.fields)
    )
    return InvertedIndex(
        postings=spark.createDataFrame([], post_schema),
        doc_stats=spark.createDataFrame(
            [], "doc_part long, doc_idx long, id string, repo string, "
                "path string, lang string, oid string, dl int"),
        term_stats=_read_term_stats(spark, path, snapshot_id, int(g["n_docs"])),
        n_docs=int(g["n_docs"]),
        avgdl=float(g["avgdl"]),
        analyzer=g["analyzer"],
        docs_per_part=int(g["docs_per_part"]),
        filters=spark.createDataFrame(
            [], "doc_part long, field string, value string, bits binary"),
        part_meta=spark.createDataFrame(
            [], "doc_part long, repo_min string, repo_max string, n_docs long"),
        doc_stats_paths={},
    )


def load_versioned(spark: SparkSession, path: str,
                   snapshot_id: int | None = None) -> InvertedIndex:
    """Load the index at a checkpoint (default: latest).

    The filter-bitmap and routing sidecars are read from disk (written
    per version since this round, manifest-resolved like postings) so a
    filtered/routed query on a loaded index reads ≤ one tiny sidecar row
    per part instead of recomputing bitmaps from all of doc_stats per
    query.  Index dirs written before the sidecars existed fall back to
    lazy derivation.
    """

    cp = _checkpoint_df(spark, path)
    if snapshot_id is None:
        snapshot_id = cp.agg(F.max("snapshot_id")).collect()[0][0]
    g = cp.filter(F.col("snapshot_id") == snapshot_id).collect()[0]

    by_version = _manifest_by_version(spark, path, snapshot_id)
    if not by_version:
        return _empty_index(spark, path, snapshot_id, g)
    postings = _read_parts(spark, path, by_version, "postings")
    doc_stats = _read_parts(spark, path, by_version, "doc_stats")

    have_sidecars = all(
        _fs.isdir(f"{path}/v{v}/filters")
        and _fs.isdir(f"{path}/v{v}/part_meta")
        for v in by_version
    )
    if have_sidecars:
        filters = _read_parts(spark, path, by_version, "filters")
        part_meta = _read_parts(spark, path, by_version, "part_meta")
    else:  # pre-sidecar index layout: derive views (legacy fallback)
        filters = filters_from_doc_stats(doc_stats, int(g["docs_per_part"]))
        part_meta = part_meta_from_doc_stats(doc_stats)

    # phrase sidecar: loadable ONLY when every live version carries it —
    # a version written by an update path that doesn't maintain
    # positions degrades the whole index to pos=None (consistent: never
    # a mix of stale and fresh position partitions)
    pos_postings = pos_analyzer = pos_avgdl = None
    if all(_fs.isdir(f"{path}/v{v}/pos_postings") for v in by_version):
        pos_postings = _read_parts(spark, path, by_version, "pos_postings")
        pos_analyzer, pos_avgdl = "simple", None
        # the loaded snapshot's own dir first, then newest owner: the
        # most recent pos_meta carries the CURRENT collection's
        # pos_avgdl (older versions' values are stale)
        for v in [snapshot_id, *sorted(by_version, reverse=True)]:
            if _fs.isdir(f"{path}/v{v}/pos_meta"):
                pm = spark.read.parquet(f"{path}/v{v}/pos_meta").collect()[0]
                pos_analyzer, pos_avgdl = pm["pos_analyzer"], pm["pos_avgdl"]
                break

    # extra searchable fields: loadable ONLY when every live version
    # carries every field's postings (same all-or-nothing degradation
    # rule as the phrase sidecar — never a stale/fresh partition mix);
    # totals come from the NEWEST fields_meta, maintained exactly by
    # the update paths
    fields = None
    fmeta = _read_fields_meta(spark, path, {snapshot_id, *by_version})
    if fmeta and all(
        _fs.isdir(f"{path}/v{v}/fields/{name}/postings")
        for v in by_version for name in fmeta
    ):
        from .index_build import FieldIndex

        n_docs_g = int(g["n_docs"])
        fields = {
            name: FieldIndex(
                postings=_read_parts(
                    spark, path, by_version, f"fields/{name}/postings"
                ),
                analyzer=an,
                avgdl=(total / n_docs_g) if n_docs_g else 0.0,
                total_dl=total,
            )
            for name, (an, total) in sorted(fmeta.items())
        }

    return InvertedIndex(
        postings=postings,
        doc_stats=doc_stats,
        term_stats=_read_term_stats(spark, path, snapshot_id, int(g["n_docs"])),
        n_docs=g["n_docs"],
        avgdl=g["avgdl"],
        analyzer=g["analyzer"],
        docs_per_part=g["docs_per_part"],
        filters=filters,
        part_meta=part_meta,
        pos_postings=pos_postings,
        pos_analyzer=pos_analyzer,
        pos_avgdl=pos_avgdl,
        fields=fields,
        # manifest-resolved per-part doc_stats dirs: the query fetch
        # phase point-reads hit parts driver-side (no second job)
        doc_stats_paths={
            int(p): f"{path}/v{v}/doc_stats/doc_part={int(p)}"
            for v, parts in by_version.items() for p in parts
        },
    )


# --------------------------------------------------------------------------
# incremental update


def update_index(
    spark: SparkSession,
    path: str,
    curr_docs: DataFrame,
    snapshot_id: int,
    id_col: str = "id",
    content_col: str = "content",
    store_docs: DataFrame | None = None,
) -> InvertedIndex:
    """Apply a new source snapshot to a versioned index; returns the new view.

    Only partitions touched by modified/deleted docs (plus the append
    tail) are rebuilt and written; the rest is carried by manifest
    reference.  Resumable: until the checkpoint row is written the
    previous snapshot stays authoritative.

    ``store_docs`` (optional): the full-document frame backing the
    ``_source`` store — when given and a documents store exists at
    ``path``, the store is maintained INCREMENTALLY from this update's
    own diff (changed ids only; touched store partitions only), never
    rewritten whole.
    """
    t0 = time.time()
    prev = load_versioned(spark, path)
    prev_snapshot = latest_checkpoint(spark, path)["snapshot_id"]
    dpp = int(prev.docs_per_part)

    for c in ("repo", "path", "lang"):
        if c not in curr_docs.columns:
            curr_docs = curr_docs.withColumn(c, F.lit(""))
    # extra searchable fields: maintained when the previous snapshot's
    # doc_stats carries their dl_<field> columns (all-or-nothing, like
    # the sidecars).  Field source columns present in curr_docs ride
    # the whole rebuild (e.g. a commit index's `sha`); the rest derive
    # via FIELD_DERIVATIONS.
    fdefs = {
        name: fh.analyzer for name, fh in sorted((prev.fields or {}).items())
        if f"dl_{name}" in prev.doc_stats.columns
    }
    extra_src = [
        f for f in fdefs
        if f in curr_docs.columns
        and f not in (id_col, content_col, "repo", "path", "lang")
    ]
    caches: list = []  # update-scoped persists, released before return
    curr = curr_docs.select(
        F.col(id_col).alias("id"), F.col(content_col).alias("content"),
        "repo", "path", "lang", *extra_src,
        F.sha2(content_col, 256).alias("oid"),
    ).persist()
    caches.append(curr)

    diff = snapshot_diff(prev.doc_stats, curr).persist()
    caches.append(diff)
    changed = {r["op"] for r in diff.select("op").distinct().collect()}
    if not changed:
        for df in caches:
            df.unpersist()
        return prev

    old_max = prev.doc_stats.agg(F.max("doc_idx")).collect()[0][0] or -1

    # parts to rebuild: holders of modified/deleted docs + append tail
    gone_ids = diff.filter(F.col("op").isin("modified", "deleted")).select("id")
    affected = {
        int(r["doc_part"])
        for r in prev.doc_stats.join(gone_ids, "id").select("doc_part").distinct().collect()
    }

    new_ids = diff.filter(F.col("op").isin("added", "modified")).select("id")
    n_new = new_ids.count()
    if n_new:
        tail_part = int((old_max + 1) // dpp)
        affected |= {
            int((old_max + 1 + i) // dpp) for i in (0, n_new - 1)
        } | {tail_part}
        # all parts in the appended range
        affected |= set(range(int((old_max + 1) // dpp), int((old_max + n_new) // dpp) + 1))

    # surviving docs of affected parts keep their doc_idx
    surviving = (
        prev.doc_stats.filter(F.col("doc_part").isin([int(p) for p in affected]))
        .join(gone_ids, "id", "left_anti")
        .select("id", "doc_idx")
        .join(curr.select("id", "content", "repo", "path", "lang",
                          *extra_src), "id")
    )
    # new/modified docs get appended doc_idx (deterministic rank among batch)
    appended = (
        assign_doc_ids(
            curr.join(new_ids, "id").select("id", "content", "repo", "path",
                                            "lang", *extra_src),
            caches=caches,
        )
        .withColumn("doc_idx", F.col("doc_idx") + F.lit(old_max + 1))
    )
    rebuilt_src = surviving.unionByName(appended).persist()
    caches.append(rebuilt_src)

    if fdefs:
        from .index_build import with_field_columns

        rebuilt_src = with_field_columns(rebuilt_src, fdefs)

    new_doc_stats = doc_stats_from_docs(rebuilt_src, prev.analyzer, dpp,
                                        field_dls=fdefs or None)
    new_postings = postings_from_docs(rebuilt_src, prev.analyzer, dpp)

    vdir = f"{path}/v{snapshot_id}"
    new_postings.repartition("doc_part").sortWithinPartitions("doc_part", "term").write.mode(
        "overwrite"
    ).partitionBy("doc_part").parquet(f"{vdir}/postings")
    new_doc_stats.write.mode("overwrite").partitionBy("doc_part").parquet(
        f"{vdir}/doc_stats"
    )
    # sidecars for the REBUILT parts only — derived from the just-written
    # doc_stats (covers exactly this version's parts); untouched parts'
    # sidecars stay owned by their versions via the manifest
    _write_sidecars(None, None, spark.read.parquet(f"{vdir}/doc_stats"),
                    dpp, vdir)
    # phrase positions: maintained through the snapshot path when the
    # previous snapshot carried the sidecar — rebuilt parts re-tokenize
    # under the sidecar's own chain (this path re-reads content anyway)
    if prev.pos_postings is not None:
        from .index_build import positions_from_docs

        pos_an = prev.pos_analyzer or "simple"
        (
            positions_from_docs(rebuilt_src, pos_an, dpp)
            .repartition("doc_part").sortWithinPartitions("doc_part", "term")
            .write.mode("overwrite").partitionBy("doc_part")
            .parquet(f"{vdir}/pos_postings")
        )
    for name, an in fdefs.items():
        _write_field_postings(
            postings_from_docs(rebuilt_src, an, dpp, content_col=name),
            vdir, name,
        )

    rebuilt_parts = {
        int(r["doc_part"]) for r in new_doc_stats.select("doc_part").distinct().collect()
    }
    dead_parts = affected - rebuilt_parts  # fully-deleted partitions

    old_manifest = spark.read.parquet(f"{path}/v{prev_snapshot}/manifest")
    kept = old_manifest.filter(
        ~F.col("doc_part").isin([int(p) for p in (rebuilt_parts | dead_parts)])
    )
    new_rows = spark.createDataFrame(
        [(int(p), snapshot_id) for p in sorted(rebuilt_parts)],
        "doc_part long, version long",
    )
    kept.unionByName(new_rows).write.mode("overwrite").parquet(f"{vdir}/manifest")

    # reload through the new manifest (not yet checkpointed) to compute stats
    staged = _load_via_manifest(spark, path, snapshot_id)
    g = staged.doc_stats.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total_dl"),
    ).collect()[0]
    n_docs, total_dl = int(g["n"]), int(g["total_dl"])
    avgdl = total_dl / n_docs if n_docs else 0.0
    if prev.pos_postings is not None:
        # exact phrase-field token count over the NEW snapshot: sum of
        # the manifest-live sidecar rows' cf (Σ positions) — an
        # O(index-metadata) column-pruned agg, within this path's
        # O(corpus) cost envelope
        new_bv = _manifest_by_version(spark, path, snapshot_id)
        pos_total = int(
            _read_parts(spark, path, new_bv, "pos_postings")
            .agg(F.coalesce(F.sum("cf"), F.lit(0))).collect()[0][0]
        ) if new_bv else 0
        _write_pos_meta(spark, vdir, prev.pos_analyzer or "simple",
                        pos_total, n_docs)
    if fdefs:
        # exact per-field totals over the NEW snapshot: one column-
        # pruned agg of the manifest-live doc_stats' dl_<field> columns
        # (within this path's O(corpus) cost envelope)
        frow = staged.doc_stats.agg(
            *[
                F.coalesce(F.sum(f"dl_{name}"), F.lit(0)).alias(name)
                for name in fdefs
            ]
        ).collect()[0]
        _write_fields_meta(spark, vdir, [
            (name, an, int(frow[name])) for name, an in fdefs.items()
        ])
    # snapshot-diff updates recompute the whole vocabulary anyway (that
    # is their nature); the write is still bucketed so later DELTA
    # batches can rewrite bucket-scoped
    _write_term_stats_buckets(term_stats_from_postings(staged.postings, n_docs), vdir)
    _write_term_manifest(
        spark, vdir, [(b, snapshot_id) for b in range(TERM_BUCKETS)]
    )

    _write_lineage(spark, path, snapshot_id, staged, rebuilt_parts=rebuilt_parts)
    # keep the _source store current from the SAME diff: upserted docs'
    # rows replace, deleted ids drop — touched store partitions only.
    # BEFORE the checkpoint row (the commit point): a crash in between
    # replays the whole update under the same snapshot; committing first
    # would leave the store permanently stale (the replayed diff is then
    # empty and never re-runs the store fold).

    if store_docs is not None and _fs.isdir(f"{path}/documents"):
        from ..sources.doc_store import update_documents

        update_documents(
            spark, path,
            store_docs.join(new_ids, "id"),
            delete_ids=diff.filter(F.col("op") == "deleted").select("id"),
        )
    spark.createDataFrame(
        [(snapshot_id, n_docs, avgdl, prev.analyzer, dpp,
          round(time.time() - t0, 3), "incremental", total_dl)],
        CHECKPOINT_SCHEMA,
    ).write.mode("append").parquet(f"{path}/checkpoint")

    # every output is on disk by now — release the update-scoped caches;
    # the returned handle reads everything (incl. the persisted filter/
    # routing sidecars) back through the committed manifest
    for df in caches:
        df.unpersist()
    return load_versioned(spark, path, snapshot_id)


# --------------------------------------------------------------------------
# delta-driven incremental update (the reference's actual execution model)


def _restrict_versions(by_version: dict[int, list[int]],
                       parts: set[int]) -> dict[int, list[int]]:
    out: dict[int, list[int]] = {}
    for v, ps in by_version.items():
        sel = [p for p in ps if p in parts]
        if sel:
            out[v] = sel
    return out


def _make_repack_kernel():
    """Cogrouped kernel: (postings of one doc_part, dead (doc_part,
    doc_idx) rows) → repacked postings with dead docs dropped.

    Decode → mask → ONE vectorized pack_partition call per part; a term
    whose every posting survives is re-encoded identically (codec is
    deterministic), a term losing all postings disappears.  No content,
    no tokenization — the stored postings are self-contained.
    """
    import numpy as np
    import pandas as pd

    from ..functions.codecs import pack_partition, unpack_postings
    from .index_build import PACK_SCHEMA

    cols = ["doc_part", "term", *PACK_SCHEMA.fieldNames()]

    def repack(post_pdf: pd.DataFrame, dead_pdf: pd.DataFrame) -> pd.DataFrame:
        # typed empty frame: a zero-row slice of the input keeps Arrow-
        # compatible dtypes (a dict-of-[] frame defaults every column to
        # float64, which Arrow cannot cast to list/binary fields) — hit
        # when a batch kills every doc of a partition (e.g. re-modifying
        # a doc that lives alone in a previously-appended part)
        empty = post_pdf.iloc[0:0] if len(post_pdf) else pd.DataFrame(
            {c: pd.Series(dtype=object) for c in cols}
        )
        if len(post_pdf) == 0:
            return empty
        dead = np.unique(dead_pdf["doc_idx"].to_numpy(np.int64))
        terms: list[str] = []
        lens: list[int] = []
        docs_l, tfs_l, dls_l = [], [], []
        for row in post_pdf.itertuples(index=False):
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            docs = docs.astype(np.int64)
            if len(dead):
                pos = np.minimum(np.searchsorted(dead, docs), len(dead) - 1)
                keep = dead[pos] != docs
            else:
                keep = np.ones(len(docs), dtype=bool)
            if not keep.any():
                continue
            docs_l.append(docs[keep])
            tfs_l.append(tfs[keep])
            dls_l.append(dls[keep])
            terms.append(row.term)
            lens.append(int(keep.sum()))
        if not terms:
            return empty
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        packed = pack_partition(
            starts,
            np.concatenate(docs_l),
            np.concatenate(tfs_l),
            np.concatenate(dls_l),
        )
        out = pd.DataFrame(packed)
        out.insert(0, "term", terms)
        out.insert(0, "doc_part",
                   np.full(len(terms), post_pdf["doc_part"].iloc[0],
                           dtype=np.int64))
        return out

    return repack


def update_index_delta(
    spark: SparkSession,
    path: str,
    upserts: DataFrame,
    deletes: DataFrame | None,
    snapshot_id: int,
    store_docs: DataFrame | None = None,
) -> InvertedIndex:
    """Apply a PRE-CLASSIFIED change set — no full-corpus read anywhere.

    This is the reference's execution model: Gitaly streams only the
    ``GetRawChanges(from, to)`` change set (git/gitaly.go:123-174) and
    the indexer applies puts/dels one change at a time
    (indexer/indexer.go:35-76); it never re-reads the repository.  The
    Spark contract:

    * classify: the batch joins against doc_stats partitions PRUNED by
      the repo routing manifest (part_meta) — a 1-doc batch reads one
      doc_part's metadata, not the corpus;
    * deletes/modifications: the owning partitions' postings are
      REPACKED (decode → drop dead doc ids → re-encode) from the stored
      lists themselves — surviving documents are never re-read, never
      re-tokenized;
    * adds (and modified docs' new content) land in FRESH doc
      partitions past the manifest's max part — the Lucene
      segment-append analog — so a pure-add batch rebuilds nothing;
    * term_stats/globals update by a vocab-bounded delta merge
      (old stats − removed df/cf + added df/cf), never a corpus pass;
    * replays are idempotent: a committed snapshot_id short-circuits,
      and an upsert whose stored oid already matches classifies as a
      no-op.

    ``upserts``: (id, content, repo, path, lang) rows to add-or-replace.
    ``deletes``: rows with ``id`` (plus ``repo`` to keep partition
    pruning — without it the classify scans all doc_stats partitions).
    The id↔repo binding must be stable across a document's life (ids
    here are "repo_path", as in indexer/blob.go:58-60).

    Many small batches accrete many small doc partitions — compact with
    ``compact_index`` (the ES/Lucene segment-merge analog).
    """

    t0 = time.time()
    last = latest_checkpoint(spark, path)
    if snapshot_id <= int(last["snapshot_id"]):
        return load_versioned(spark, path)  # replay of a committed batch
    prev_snapshot = int(last["snapshot_id"])
    dpp = int(last["docs_per_part"])
    analyzer = last["analyzer"]
    old_n_docs = int(last["n_docs"])

    by_version = _manifest_by_version(spark, path, prev_snapshot)
    all_parts = {p for ps in by_version.values() for p in ps}
    # phrase sidecar present on EVERY live version → this batch
    # maintains it (repack for deletes, fresh build for the appended
    # docs — whose content is in the batch); otherwise the sidecar is
    # already degraded and stays so
    has_pos = bool(by_version) and all(
        _fs.isdir(f"{path}/v{v}/pos_postings") for v in by_version
    )
    pos_an = prev_pos_total = None
    if has_pos:
        pos_an, _, prev_pos_total = _read_pos_meta(
            spark, path, {prev_snapshot, *by_version}
        )
    # extra searchable fields: same presence rule as the phrase sidecar
    prev_fmeta = _read_fields_meta(spark, path, {prev_snapshot, *by_version})
    fdefs: dict[str, str] = {}
    if prev_fmeta and by_version and all(
        _fs.isdir(f"{path}/v{v}/fields/{n}/postings")
        for v in by_version for n in prev_fmeta
    ):
        fdefs = {n: an for n, (an, _t) in sorted(prev_fmeta.items())}

    caches: list = []
    has_seq = "_seq" in upserts.columns
    # field source columns present in the batch (e.g. a commit index's
    # `sha`) ride through to the append path; absent ones derive via
    # FIELD_DERIVATIONS at append time.  Whitelisted to the index's own
    # field sources — a stray column (doc_idx from a recycled join, a
    # leftover _rn) must not leak into assign_doc_ids' schema
    extra_src = [
        f for f in fdefs
        if f in upserts.columns
        and f not in ("id", "content", "repo", "path", "lang")
    ]
    ups = upserts.select(
        "id", "content", "repo", "path", "lang", *extra_src,
        *(["_seq"] if has_seq else []),
        F.sha2("content", 256).alias("oid"),
    )
    # collapse multiple changes to one id within a batch (a micro-batch
    # can span several pushes; without this both rows would append and
    # double-count the doc).  A ``_seq`` column, when present, carries
    # the batch's temporal order (the streaming front-end attaches the
    # source file name) and the HIGHEST _seq wins — true sequential
    # last-write-wins (the reference applies changes in order,
    # indexer/indexer.go:35-76).  Without it the survivor falls back to
    # deterministic-but-arbitrary oid order.  An id both upserted and
    # deleted in one batch resolves by _seq when the deletes carry one
    # (highest _seq wins — true sequential apply order, so a put-then-
    # delete ordering removes the doc); without delete-side _seq the
    # upsert wins (ties also resolve as the upsert).
    from pyspark.sql.window import Window

    order = ([F.col("_seq").desc_nulls_last()] if has_seq else []) + [
        F.col("oid").desc()
    ]
    w = Window.partitionBy("id").orderBy(*order)
    ups = (
        ups.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    if has_seq and deletes is not None and "_seq" in deletes.columns:
        # a delete strictly newer than the id's winning upsert removes
        # the doc: drop that upsert HERE, so the downstream delete set
        # (deletes − surviving upserted ids) includes it naturally
        dmax = deletes.groupBy("id").agg(F.max("_seq").alias("_del_seq"))
        ups = ups.join(F.broadcast(dmax), "id", "left").filter(
            F.col("_del_seq").isNull() | (F.col("_del_seq") <= F.col("_seq"))
        ).drop("_del_seq")
    ups = ups.drop(*(["_seq"] if has_seq else [])).persist()
    caches.append(ups)

    change_keys = ups.select("id", "repo")
    have_repos = True
    if deletes is not None:
        if "repo" in deletes.columns:
            change_keys = change_keys.unionByName(deletes.select("id", "repo"))
        else:
            change_keys = change_keys.unionByName(
                deletes.select("id", F.lit(None).cast("string").alias("repo"))
            )
            have_repos = False

    # candidate partitions via the routing manifest (repo ranges); the
    # repo list is batch-bounded.  Falls back to all parts when repos
    # are unknown or the batch touches too many to prune usefully — the
    # fallback REASON is recorded in delta_stats["classify_fallback"]
    # (and printed) so a silent full-metadata classify is observable.
    repos = [r["repo"] for r in change_keys.select("repo").distinct().collect()]
    cand_parts = set(all_parts)
    classify_fallback: str | None = None
    if not all_parts:
        classify_fallback = "empty_index"
    elif not have_repos:
        classify_fallback = "deletes_missing_repo_column"
    elif any(r is None for r in repos):
        classify_fallback = "null_repo_values"
    elif len(repos) > 256:
        classify_fallback = f"too_many_repos({len(repos)})"
    else:
        pm = None
        if all(_fs.isdir(f"{path}/v{v}/part_meta") for v in by_version):
            pm = _read_parts(spark, path, by_version, "part_meta")
        if pm is None:
            classify_fallback = "no_part_meta_sidecar"
        else:
            cond = None
            for r in repos:
                c = (F.col("repo_min") <= r) & (F.col("repo_max") >= r)
                cond = c if cond is None else (cond | c)
            cand_parts = {
                int(r["doc_part"]) for r in pm.filter(cond)
                .select("doc_part").collect()
            }
    if classify_fallback is not None and all_parts:
        log.warning(
            "update_index_delta snapshot=%s: classify falls back to ALL "
            "%d doc_stats partitions (%s)",
            snapshot_id, len(all_parts), classify_fallback,
        )

    # classify against PRUNED doc_stats metadata (broadcast the batch)
    ids = change_keys.select("id").distinct()
    existing = None
    if cand_parts:
        cand_ds = _read_parts(
            spark, path, _restrict_versions(by_version, cand_parts), "doc_stats"
        )
        fld_cols = [
            f"dl_{n}" for n in fdefs if f"dl_{n}" in cand_ds.columns
        ]
        if len(fld_cols) < len(fdefs):
            fdefs = {}  # doc_stats predates the field columns: degrade
            fld_cols = []
        existing = cand_ds.join(F.broadcast(ids), "id").select(
            "id", "doc_idx", "doc_part", "oid", "dl", *fld_cols
        ).persist()
        caches.append(existing)

    if existing is not None:
        # unchanged-oid upserts are no-ops (idempotent replay)
        ex_oid = existing.select("id", F.col("oid").alias("_old_oid"))
        live_ups = ups.join(F.broadcast(ex_oid), "id", "left").filter(
            (F.col("_old_oid").isNull()) | (F.col("_old_oid") != F.col("oid"))
        ).drop("_old_oid").persist()
        caches.append(live_ups)
        # "upserted AND deleted in one batch resolves as the upsert"
        # must hold even when the upsert's content matches the stored
        # oid: the unchanged-oid filter above drops that upsert from
        # live_ups, so exempt upserted ids from the delete set HERE —
        # otherwise a delete + recreate-identical-file in one batch
        # would silently remove the doc (sequential delete-then-put
        # keeps it, indexer/indexer.go:35-76).
        del_ids = (
            deletes.select("id").join(ups.select("id"), "id", "left_anti")
            if deletes is not None
            else spark.createDataFrame([], "id string")
        )
        dead = existing.join(
            F.broadcast(
                live_ups.select("id").unionByName(del_ids).distinct()
            ), "id",
        ).persist()  # old rows of modified docs + present deletes
        caches.append(dead)
    else:  # empty index or no candidate partitions: everything is an add
        live_ups = ups
        dead = spark.createDataFrame(
            [], "id string, doc_idx long, doc_part long, oid string, dl int"
            + "".join(f", dl_{n} int" for n in fdefs)
        )

    dead_agg = dead.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("dl"),
        *[
            F.coalesce(F.sum(f"dl_{n}"), F.lit(0)).alias(f"dl_{n}")
            for n in fdefs
        ],
    ).collect()[0]
    n_dead, dl_dead = int(dead_agg["n"]), int(dead_agg["dl"])
    fld_dead = {n: int(dead_agg[f"dl_{n}"]) for n in fdefs}
    affected = {
        int(r["doc_part"]) for r in dead.select("doc_part").distinct().collect()
    }
    n_app = live_ups.count()
    if n_dead == 0 and n_app == 0:
        for df in caches:
            df.unpersist()
        return load_versioned(spark, path)  # fully no-op batch

    vdir = f"{path}/v{snapshot_id}"

    # 1) repack affected partitions from their stored postings
    new_postings = new_doc_stats = None
    old_pos = new_pos = None
    new_fld: dict[str, DataFrame] = {}
    if affected:
        aff_versions = _restrict_versions(by_version, affected)
        old_post = _read_parts(spark, path, aff_versions, "postings")
        repacked = (
            old_post.groupBy("doc_part")
            .cogroup(dead.select("doc_part", "doc_idx").groupBy("doc_part"))
            .applyInPandas(
                _make_repack_kernel(),
                schema=old_post.schema,
            )
        )
        surv_ds = _read_parts(spark, path, aff_versions, "doc_stats").join(
            F.broadcast(dead.select("id")), "id", "left_anti"
        )
        new_postings, new_doc_stats = repacked, surv_ds
        if has_pos:
            # positions repack: surviving docs' blobs are byte-sliced
            # out of the stream, never decoded (per-doc deltas are
            # self-contained) — same O(touched parts) cost class
            old_pos = _read_parts(spark, path, aff_versions, "pos_postings")
            new_pos = (
                old_pos.groupBy("doc_part")
                .cogroup(dead.select("doc_part", "doc_idx").groupBy("doc_part"))
                .applyInPandas(_make_pos_repack_kernel(), schema=old_pos.schema)
            )
        for name in fdefs:
            # field postings share the tf layout — the same repack
            # kernel drops dead docs from the affected parts' streams
            old_f = _read_parts(
                spark, path, aff_versions, f"fields/{name}/postings"
            )
            new_fld[name] = (
                old_f.groupBy("doc_part")
                .cogroup(dead.select("doc_part", "doc_idx").groupBy("doc_part"))
                .applyInPandas(_make_repack_kernel(), schema=old_f.schema)
            )

    # 2) append new/modified docs into FRESH partitions
    app_parts: set[int] = set()
    if n_app:
        next_part = (max(all_parts) + 1) if all_parts else 0
        base_idx = next_part * dpp
        appended = (
            assign_doc_ids(
                live_ups.select("id", "content", "repo", "path", "lang",
                                *extra_src),
                caches=caches,
            ).withColumn("doc_idx", F.col("doc_idx") + F.lit(base_idx))
        )
        if fdefs:
            from .index_build import with_field_columns

            appended = with_field_columns(appended, fdefs)
        app_post = postings_from_docs(appended, analyzer, dpp)
        app_ds = doc_stats_from_docs(appended, analyzer, dpp,
                                     field_dls=fdefs or None)
        new_postings = (
            app_post if new_postings is None
            else new_postings.unionByName(app_post)
        )
        new_doc_stats = (
            app_ds if new_doc_stats is None
            else new_doc_stats.unionByName(app_ds)
        )
        app_parts = set(range(next_part, next_part + (n_app + dpp - 1) // dpp))
        if has_pos:
            from .index_build import positions_from_docs

            app_pos = positions_from_docs(appended, pos_an, dpp)
            new_pos = app_pos if new_pos is None else new_pos.unionByName(app_pos)
        for name, an in fdefs.items():
            app_f = postings_from_docs(appended, an, dpp, content_col=name)
            new_fld[name] = (
                app_f if name not in new_fld
                else new_fld[name].unionByName(app_f)
            )

    new_postings.repartition("doc_part").sortWithinPartitions("doc_part", "term").write.mode(
        "overwrite"
    ).partitionBy("doc_part").parquet(f"{vdir}/postings")
    new_doc_stats.write.mode("overwrite").partitionBy("doc_part").parquet(
        f"{vdir}/doc_stats"
    )
    pos_cf_written = 0
    if has_pos and new_pos is not None:
        new_pos.repartition("doc_part").sortWithinPartitions("doc_part", "term").write.mode(
            "overwrite"
        ).partitionBy("doc_part").parquet(f"{vdir}/pos_postings")
        try:
            pos_cf_written = int(
                spark.read.parquet(f"{vdir}/pos_postings")
                .agg(F.coalesce(F.sum("cf"), F.lit(0))).collect()[0][0]
            )
        except Exception:  # batch emptied every touched partition
            pos_cf_written = 0
    for name, fpost in new_fld.items():
        _write_field_postings(fpost, vdir, name)
    try:  # a batch that empties every touched partition writes no rows
        vds = spark.read.parquet(f"{vdir}/doc_stats")
        written_parts = {
            int(r["doc_part"]) for r in vds.select("doc_part").distinct().collect()
        }
    except Exception:
        vds, written_parts = None, set()
    if vds is not None:
        _write_sidecars(None, None, vds, dpp, vdir)
    dead_parts = affected - written_parts  # fully-deleted partitions

    old_manifest = spark.read.parquet(f"{path}/v{prev_snapshot}/manifest")
    kept = old_manifest.filter(
        ~F.col("doc_part").isin([int(p) for p in (written_parts | dead_parts)])
    )
    new_rows = spark.createDataFrame(
        [(int(p), snapshot_id) for p in sorted(written_parts)],
        "doc_part long, version long",
    )
    kept.unionByName(new_rows).write.mode("overwrite").parquet(f"{vdir}/manifest")

    # 3) vocab-bounded term_stats delta: old − removed + added
    n_docs = old_n_docs - n_dead + n_app
    if has_pos and new_pos is not None:
        # exact phrase-field token arithmetic, mirroring total_dl:
        # prev − (all positions of the affected parts) + (positions
        # written: affected survivors + appends).  Both deltas are
        # cf-column aggs over touched parts only — never a corpus pass.
        old_aff_cf = int(
            old_pos.agg(F.coalesce(F.sum("cf"), F.lit(0))).collect()[0][0]
        ) if old_pos is not None else 0
        _write_pos_meta(spark, vdir, pos_an,
                        (prev_pos_total or 0) - old_aff_cf + pos_cf_written,
                        n_docs)
    dl_added = 0
    if n_app or affected:
        vpost = None
        if vds is not None:
            try:
                # a batch whose only effect is appending zero-term docs
                # (e.g. empty content) writes doc_stats rows but a
                # row-less postings dir — schema inference would raise
                # AFTER the manifest landed, failing a replay-safe batch
                vpost = spark.read.parquet(f"{vdir}/postings")
                vpost.schema  # force the inference error here, if any
            except Exception:
                vpost = None
        if vpost is not None:
            added_stats = vpost.groupBy("term").agg(
                F.sum("df").alias("d_df"), F.sum("cf").alias("d_cf")
            )
        else:
            added_stats = spark.createDataFrame(
                [], "term string, d_df long, d_cf long"
            )
        if affected:
            # reuses the repack step's old_post frame; this job's scan
            # prunes to the (term, df, cf) columns — it never re-reads
            # the posting binaries
            removed_stats = (
                old_post
                .groupBy("term")
                .agg((-F.sum("df")).alias("d_df"), (-F.sum("cf")).alias("d_cf"))
            )
            added_stats = added_stats.unionByName(removed_stats)
        delta = (
            added_stats.groupBy("term")
            .agg(F.sum("d_df").alias("d_df"), F.sum("d_cf").alias("d_cf"))
            # the repack re-adds most of an affected partition's terms
            # unchanged (whole-partition stats out, whole-partition
            # stats back in): net-zero terms need no rewrite, and
            # dropping them keeps the touched-bucket set at "the dead
            # and added DOCS' terms", not the partition's vocabulary
            .filter((F.col("d_df") != 0) | (F.col("d_cf") != 0))
            .withColumn("term_bucket", term_bucket_expr())
            .persist()
        )
        caches.append(delta)
        # bucket-scoped merge: only the term-hash buckets containing
        # THIS batch's terms are read and rewritten — a 1-doc batch
        # touches its own terms' buckets, never the whole vocabulary
        # (the collect is ≤ TERM_BUCKETS rows)
        prev_tm = _term_manifest_by_version(spark, path, prev_snapshot)
        if prev_tm is None:
            # legacy whole-file layout: one-time O(vocab) migration
            old_ts = spark.read.parquet(
                f"{path}/v{prev_snapshot}/term_stats"
            ).select("term", "df", "cf")
            touched_buckets = list(range(TERM_BUCKETS))
        else:
            touched_buckets = sorted(
                int(r[0]) for r in delta.select("term_bucket").distinct().collect()
            )
            old_ts = _read_term_stats_raw(
                spark, path, prev_tm, buckets=touched_buckets
            ).drop("term_bucket")
        merged = (
            old_ts.join(delta.drop("term_bucket"), "term", "full_outer")
            .select(
                "term",
                (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))).alias("df"),
                (F.coalesce("cf", F.lit(0)) + F.coalesce("d_cf", F.lit(0))).alias("cf"),
            )
            .filter(F.col("df") > 0)
        )
        _write_term_stats_buckets(merged, vdir)
        if prev_tm is None:
            tm_rows = [(b, snapshot_id) for b in range(TERM_BUCKETS)]
        else:
            prev_owner = {b: v for v, bs in prev_tm.items() for b in bs}
            tset = set(touched_buckets)
            tm_rows = [
                (b, snapshot_id if b in tset else prev_owner.get(b, prev_snapshot))
                for b in range(TERM_BUCKETS)
            ]
        _write_term_manifest(spark, vdir, tm_rows)
        if n_app and vds is not None:
            app_row = (
                vds.filter(F.col("doc_part").isin([int(p) for p in app_parts]))
                .agg(
                    F.coalesce(F.sum("dl"), F.lit(0)).alias("dl"),
                    *[
                        F.coalesce(F.sum(f"dl_{n}"), F.lit(0)).alias(f"dl_{n}")
                        for n in fdefs
                    ],
                ).collect()[0]
            )
            dl_added = int(app_row["dl"])
            fld_added = {n: int(app_row[f"dl_{n}"]) for n in fdefs}
        else:
            fld_added = {n: 0 for n in fdefs}
    else:
        fld_added = {n: 0 for n in fdefs}
    if fdefs:
        # exact integer per-field totals: prev − dead + appended (the
        # same drift-free arithmetic as the checkpointed total_dl)
        _write_fields_meta(spark, vdir, [
            (n, an,
             prev_fmeta[n][1] - fld_dead.get(n, 0) + fld_added.get(n, 0))
            for n, an in fdefs.items()
        ])

    # exact integer arithmetic on the checkpointed total_dl — NOT the
    # float (old_avgdl·old_n − dead + added)/n reconstruction, which
    # accumulates rounding drift in the BM25 normalizer over thousands
    # of chained delta batches
    total_dl = _total_dl_of(last) - dl_dead + dl_added
    avgdl = total_dl / n_docs if n_docs else 0.0

    # per-partition lineage for the parts THIS snapshot produced (the
    # rest keep the lineage rows of their owning snapshots) — keeps the
    # lineage write batch-bounded, not corpus-bounded
    if vds is not None:
        from .index_build import POSTINGS_TABLE_SCHEMA

        staged = InvertedIndex(
            postings=spark.read.schema(POSTINGS_TABLE_SCHEMA)
            .parquet(f"{vdir}/postings"),
            doc_stats=vds, term_stats=None,  # type: ignore[arg-type]
            n_docs=0, avgdl=0.0, analyzer="", docs_per_part=0,
        )
        _write_lineage(spark, path, snapshot_id, staged,
                       rebuilt_parts=written_parts)

    if store_docs is not None and _fs.isdir(f"{path}/documents"):
        from ..sources.doc_store import update_documents

        update_documents(
            spark, path,
            store_docs.join(live_ups.select("id"), "id"),
            delete_ids=dead.select("id"),
        )

    spark.createDataFrame(
        [(snapshot_id, n_docs, float(avgdl), analyzer, dpp,
          round(time.time() - t0, 3), "delta", int(total_dl))],
        CHECKPOINT_SCHEMA,
    ).write.mode("append").parquet(f"{path}/checkpoint")
    for df in caches:
        df.unpersist()
    out = load_versioned(spark, path, snapshot_id)
    out.__dict__["delta_stats"] = {
        "cand_parts": sorted(cand_parts),
        "affected_parts": sorted(affected),
        "appended_parts": sorted(app_parts),
        "written_parts": sorted(written_parts),
        "n_dead": n_dead,
        "n_appended": int(n_app),
        "classify_fallback": classify_fallback,
    }
    return out


def _write_pos_meta(spark: SparkSession, vdir: str, pos_analyzer: str,
                    pos_total_dl: int, n_docs: int) -> None:
    spark.createDataFrame(
        [(pos_analyzer,
          float(pos_total_dl) / n_docs if n_docs else 0.0,
          int(pos_total_dl))],
        "pos_analyzer string, pos_avgdl double, pos_total_dl long",
    ).write.mode("overwrite").parquet(f"{vdir}/pos_meta")


def _read_pos_meta(spark: SparkSession, path: str,
                   versions) -> tuple[str, float, int]:
    """(pos_analyzer, pos_avgdl, pos_total_dl) from the newest version
    carrying a pos_meta (older versions' values are stale)."""

    for v in sorted(versions, reverse=True):
        p = f"{path}/v{v}/pos_meta"
        if _fs.isdir(p):
            pm = spark.read.parquet(p).collect()[0]
            d = pm.asDict()
            return (d["pos_analyzer"], float(d["pos_avgdl"]),
                    int(d.get("pos_total_dl") or 0))
    return "simple", 0.0, 0


def _make_pos_repack_kernel():
    """Cogrouped kernel: (positional rows of one doc_part, that part's
    dead (doc_part, doc_idx) rows) → rows with dead docs dropped.

    Positions are NEVER decoded: each doc's blob is self-contained
    (its first delta is absolute), so surviving docs' byte segments —
    located via codecs.pos_blob_boundaries — concatenate unchanged.
    Only the small docs/cnt/dls headers re-encode.
    """
    import numpy as np
    import pandas as pd

    from ..functions.codecs import (
        delta_decode, delta_encode, pos_blob_boundaries, varint_decode,
        varint_encode,
    )

    def repack(pos_pdf: pd.DataFrame, dead_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pos_pdf) == 0:
            return pos_pdf
        if dead_pdf is None or len(dead_pdf) == 0:
            return pos_pdf
        dead = np.unique(dead_pdf["doc_idx"].to_numpy(np.int64))
        keep_rows = []  # dict rows: robust to the parquet column order
        for row in pos_pdf.itertuples(index=False):
            d = row._asdict()
            docs = delta_decode(varint_decode(bytes(row.docs_bin))).astype(np.int64)
            keep = ~np.isin(docs, dead)
            if keep.all():
                keep_rows.append(d)
                continue
            if not keep.any():
                continue
            counts = varint_decode(bytes(row.cnt_bin)).astype(np.int64)
            dls = varint_decode(bytes(row.dls_bin)).astype(np.int64)
            blob = bytes(row.pos_bin)
            bnd = pos_blob_boundaries(counts, blob)
            d.update(
                df=int(keep.sum()),
                cf=int(counts[keep].sum()),
                docs_bin=varint_encode(delta_encode(docs[keep])),
                cnt_bin=varint_encode(counts[keep]),
                dls_bin=varint_encode(dls[keep]),
                pos_bin=b"".join(
                    blob[bnd[j]:bnd[j + 1]] for j in np.flatnonzero(keep)
                ),
            )
            keep_rows.append(d)
        return pd.DataFrame(keep_rows, columns=list(pos_pdf.columns))

    return repack


def _make_pos_unpack_kernel():
    """Cogrouped kernel for compaction: (positional rows of one small
    doc_part, that part's (old_idx → new doc_idx) map) → per-DOC rows
    (term, doc_idx, dl, npos, posb) carrying the NEW ids, each doc's
    blob sliced out of the stream un-decoded.  The shared
    ``index_build._pos_pack_group`` re-packs them under the new
    partitioning (doc order may interleave across source parts)."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import (
        delta_decode, pos_blob_boundaries, varint_decode,
    )

    def unpack(pos_pdf: pd.DataFrame, map_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"term": pd.Series(dtype=object),
             "doc_idx": pd.Series(dtype=np.int64),
             "dl": pd.Series(dtype=np.int32),
             "npos": pd.Series(dtype=np.int32),
             "posb": pd.Series(dtype=object)}
        )
        if len(pos_pdf) == 0 or len(map_pdf) == 0:
            return empty
        old_idx = map_pdf["old_idx"].to_numpy(np.int64)
        new_idx = map_pdf["doc_idx"].to_numpy(np.int64)
        order = np.argsort(old_idx)
        old_idx, new_idx = old_idx[order], new_idx[order]
        t_term, t_doc, t_dl, t_np, t_pb = [], [], [], [], []
        for row in pos_pdf.itertuples(index=False):
            docs = delta_decode(varint_decode(bytes(row.docs_bin))).astype(np.int64)
            counts = varint_decode(bytes(row.cnt_bin)).astype(np.int64)
            dls = varint_decode(bytes(row.dls_bin)).astype(np.int64)
            blob = bytes(row.pos_bin)
            bnd = pos_blob_boundaries(counts, blob)
            remapped = new_idx[np.searchsorted(old_idx, docs)]
            for j in range(len(docs)):
                t_term.append(row.term)
                t_doc.append(int(remapped[j]))
                t_dl.append(int(dls[j]))
                t_np.append(int(counts[j]))
                t_pb.append(blob[bnd[j]:bnd[j + 1]])
        return pd.DataFrame(
            {"term": t_term, "doc_idx": np.asarray(t_doc, dtype=np.int64),
             "dl": np.asarray(t_dl, dtype=np.int32),
             "npos": np.asarray(t_np, dtype=np.int32), "posb": t_pb}
        )

    return unpack


def _make_remap_kernel():
    """Cogrouped kernel: (postings of one small doc_part, that part's
    (old_idx → new doc_idx) rows) → decoded gram-level term rows carrying
    the NEW doc ids.  The remap is monotone (rank of old doc_idx), so
    every decoded list stays sorted; no content, no re-tokenization."""
    import numpy as np
    import pandas as pd

    from ..functions.codecs import unpack_postings

    def remap(post_pdf: pd.DataFrame, map_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"term": pd.Series(dtype=object),
             "doc_idx": pd.Series(dtype=np.int64),
             "tf": pd.Series(dtype=np.int32),
             "dl": pd.Series(dtype=np.int32)}
        )
        if len(post_pdf) == 0 or len(map_pdf) == 0:
            return empty
        old_idx = map_pdf["old_idx"].to_numpy(np.int64)
        new_idx = map_pdf["doc_idx"].to_numpy(np.int64)
        order = np.argsort(old_idx)
        old_idx, new_idx = old_idx[order], new_idx[order]
        terms, t_doc, t_tf, t_dl = [], [], [], []
        for row in post_pdf.itertuples(index=False):
            docs, tfs, dls = unpack_postings(
                bytes(row.docs_bin), bytes(row.tfs_bin), bytes(row.dls_bin)
            )
            pos = np.searchsorted(old_idx, docs.astype(np.int64))
            terms.append(np.full(len(docs), row.term, dtype=object))
            t_doc.append(new_idx[pos])
            t_tf.append(tfs.astype(np.int32))
            t_dl.append(dls.astype(np.int32))
        return pd.DataFrame(
            {"term": np.concatenate(terms),
             "doc_idx": np.concatenate(t_doc),
             "tf": np.concatenate(t_tf),
             "dl": np.concatenate(t_dl)}
        )

    return remap


def compact_index(
    spark: SparkSession,
    path: str,
    snapshot_id: int,
    min_fill: float = 0.5,
    min_parts: int = 2,
) -> InvertedIndex:
    """Segment-merge analog (Lucene merge / ES _forcemerge): coalesce
    the under-filled doc partitions that delta appends accrete into
    dense partitions — WITHOUT reading or re-tokenizing any document.

    * small parts: ``n_docs < min_fill * docs_per_part`` per the
      part_meta sidecars (fallback: a doc_stats count); a no-op below
      ``min_parts`` of them;
    * their docs get new dense doc_idx past the current max partition —
      the rank of the old doc_idx, a monotone remap, so every decoded
      posting list stays sorted and lists merge by concatenation;
    * postings are decoded → remapped → merged per (new part, term) →
      re-packed (``expand=None``: the stored grams must not be
      re-expanded); doc_stats rows are remapped identically;
    * untouched partitions carry over by manifest reference; term_stats
      and the collection globals are invariant under doc renumbering
      and carry forward;
    * replays are idempotent (committed snapshot_id short-circuits) and
      a crash before the checkpoint row leaves the previous snapshot
      authoritative.

    Cost: O(size of the compacted segments) — the accretion since the
    last compaction — never O(corpus).
    """

    from .index_build import PACK_SCHEMA, make_pack_group_kernel

    t0 = time.time()
    last = latest_checkpoint(spark, path)
    if snapshot_id <= int(last["snapshot_id"]):
        return load_versioned(spark, path)
    prev_snapshot = int(last["snapshot_id"])
    dpp = int(last["docs_per_part"])
    by_version = _manifest_by_version(spark, path, prev_snapshot)
    all_parts = {p for ps in by_version.values() for p in ps}

    pm = None
    if by_version and all(
        _fs.isdir(f"{path}/v{v}/part_meta") for v in by_version
    ):
        pm = _read_parts(spark, path, by_version, "part_meta")
    if pm is None:
        pm = _read_parts(spark, path, by_version, "doc_stats").groupBy(
            "doc_part"
        ).agg(F.count("*").alias("n_docs"))
    small = sorted(
        int(r["doc_part"])
        for r in pm.filter(F.col("n_docs") < int(min_fill * dpp))
        .select("doc_part").collect()
    )
    if len(small) < min_parts:
        return load_versioned(spark, path)

    caches: list = []
    small_versions = _restrict_versions(by_version, set(small))
    old_ds = _read_parts(spark, path, small_versions, "doc_stats")
    new_base = (max(all_parts) + 1) * dpp

    remapped = (
        assign_doc_ids(
            old_ds.withColumnRenamed("doc_idx", "old_idx")
            .withColumnRenamed("doc_part", "old_part"),
            id_col="old_idx", caches=caches,
        )
        .withColumn("doc_idx", F.col("doc_idx") + F.lit(new_base))
        .persist()
    )
    caches.append(remapped)
    new_ds = remapped.select(
        (F.col("doc_idx") / dpp).cast("long").alias("doc_part"),
        "doc_idx", "id", "repo", "path", "lang", "oid", "dl",
        # per-field lengths (dl_<field>) ride the remap untouched
        *[c for c in remapped.columns if c.startswith("dl_")],
    )

    old_post = _read_parts(spark, path, small_versions, "postings")
    term_rows = (
        old_post.groupBy("doc_part")
        .cogroup(remapped.select("old_part", "old_idx", "doc_idx")
                 .groupBy("old_part"))
        .applyInPandas(
            _make_remap_kernel(),
            schema="term string, doc_idx long, tf int, dl int",
        )
    )
    bucketed = term_rows.select(
        (F.col("doc_idx") / dpp).cast("long").alias("doc_part"),
        F.pmod(F.xxhash64(F.substring("term", 1, 2)), F.lit(32)).alias("bucket"),
        "term", "doc_idx", "tf", "dl",
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [StructField("doc_part", LongType()), StructField("term", StringType())]
        + list(PACK_SCHEMA.fields)
    )
    new_post = bucketed.groupBy("doc_part", "bucket").applyInPandas(
        make_pack_group_kernel(None), schema=out_schema
    )

    vdir = f"{path}/v{snapshot_id}"
    new_post.repartition("doc_part").sortWithinPartitions("doc_part", "term").write.mode(
        "overwrite"
    ).partitionBy("doc_part").parquet(f"{vdir}/postings")
    new_ds.write.mode("overwrite").partitionBy("doc_part").parquet(
        f"{vdir}/doc_stats"
    )
    vds = spark.read.parquet(f"{vdir}/doc_stats")
    _write_sidecars(None, None, vds, dpp, vdir)

    # phrase sidecar rides the same remap: per-doc blobs are byte-
    # sliced out of the small parts' streams (never decoded — the
    # monotone renumbering can interleave docs from different source
    # parts, so rows unpack to per-doc units and the shared pack kernel
    # regroups them under the new partitioning).  Totals are invariant
    # under renumbering and carry forward.
    if by_version and all(
        _fs.isdir(f"{path}/v{v}/pos_postings") for v in by_version
    ):
        from .index_build import pack_pos_rows

        old_pos = _read_parts(spark, path, small_versions, "pos_postings")
        pos_rows = (
            old_pos.groupBy("doc_part")
            .cogroup(remapped.select("old_part", "old_idx", "doc_idx")
                     .groupBy("old_part"))
            .applyInPandas(
                _make_pos_unpack_kernel(),
                schema="term string, doc_idx long, dl int, npos int, "
                       "posb binary",
            )
        )
        (
            pack_pos_rows(pos_rows, dpp)
            .repartition("doc_part").sortWithinPartitions("doc_part", "term")
            .write.mode("overwrite").partitionBy("doc_part")
            .parquet(f"{vdir}/pos_postings")
        )
        pos_an, _, prev_total = _read_pos_meta(
            spark, path, {prev_snapshot, *by_version}
        )
        _write_pos_meta(spark, vdir, pos_an, prev_total, int(last["n_docs"]))
    # extra searchable fields ride the same remap (field postings share
    # the tf layout); per-field totals are renumbering-invariant
    c_fmeta = _read_fields_meta(spark, path, {prev_snapshot, *by_version})
    if c_fmeta and by_version and all(
        _fs.isdir(f"{path}/v{v}/fields/{n}/postings")
        for v in by_version for n in c_fmeta
    ):
        for name in sorted(c_fmeta):
            old_f = _read_parts(
                spark, path, small_versions, f"fields/{name}/postings"
            )
            f_rows = (
                old_f.groupBy("doc_part")
                .cogroup(remapped.select("old_part", "old_idx", "doc_idx")
                         .groupBy("old_part"))
                .applyInPandas(
                    _make_remap_kernel(),
                    schema="term string, doc_idx long, tf int, dl int",
                )
            )
            f_bucketed = f_rows.select(
                (F.col("doc_idx") / dpp).cast("long").alias("doc_part"),
                F.pmod(F.xxhash64(F.substring("term", 1, 2)),
                       F.lit(32)).alias("bucket"),
                "term", "doc_idx", "tf", "dl",
            )
            _write_field_postings(
                f_bucketed.groupBy("doc_part", "bucket").applyInPandas(
                    make_pack_group_kernel(None), schema=out_schema
                ),
                vdir, name,
            )
        _write_fields_meta(spark, vdir, [
            (n, an, t) for n, (an, t) in sorted(c_fmeta.items())
        ])
    written_parts = {
        int(r["doc_part"]) for r in vds.select("doc_part").distinct().collect()
    }

    old_manifest = spark.read.parquet(f"{path}/v{prev_snapshot}/manifest")
    kept = old_manifest.filter(
        ~F.col("doc_part").isin([int(p) for p in (set(small) | written_parts)])
    )
    new_rows = spark.createDataFrame(
        [(int(p), snapshot_id) for p in sorted(written_parts)],
        "doc_part long, version long",
    )
    kept.unionByName(new_rows).write.mode("overwrite").parquet(f"{vdir}/manifest")

    # df/cf are invariant under doc renumbering — carry the buckets
    # forward BY MANIFEST REFERENCE (no data copied); legacy whole-file
    # layouts copy the file as before
    prev_tm = _term_manifest_by_version(spark, path, prev_snapshot)
    if prev_tm is None:
        spark.read.parquet(f"{path}/v{prev_snapshot}/term_stats").write.mode(
            "overwrite"
        ).parquet(f"{vdir}/term_stats")
    else:
        _write_term_manifest(
            spark, vdir, [(b, v) for v, bs in prev_tm.items() for b in bs]
        )

    staged = InvertedIndex(
        postings=spark.read.parquet(f"{vdir}/postings"),
        doc_stats=vds, term_stats=None,  # type: ignore[arg-type]
        n_docs=0, avgdl=0.0, analyzer="", docs_per_part=0,
    )
    _write_lineage(spark, path, snapshot_id, staged, rebuilt_parts=written_parts)
    spark.createDataFrame(
        [(snapshot_id, int(last["n_docs"]), float(last["avgdl"]),
          last["analyzer"], dpp, round(time.time() - t0, 3), "compact",
          _total_dl_of(last))],
        CHECKPOINT_SCHEMA,
    ).write.mode("append").parquet(f"{path}/checkpoint")
    for df in caches:
        df.unpersist()
    out = load_versioned(spark, path, snapshot_id)
    out.__dict__["compact_stats"] = {
        "compacted_parts": small,
        "written_parts": sorted(written_parts),
    }
    return out


def vacuum(spark: SparkSession, path: str, keep_last: int = 2) -> dict:
    """Version garbage collection — the ES/Lucene delete-merged-segments
    analog: every delta/compaction writes superseded partitions' new
    owners into a fresh ``v{N}/`` directory but never deletes the old
    files, so a long-lived streaming index grows disk unboundedly.

    Deletes every version file that NO manifest among the last
    ``keep_last`` checkpoints references:

    * ``postings/doc_stats/filters/doc_part=P`` directories of (version,
      part) pairs absent from every retained manifest;
    * ``term_stats/term_bucket=B`` directories absent from every
      retained term manifest (legacy whole-file term_stats are kept only
      for retained legacy snapshots);
    * ``manifest``/``term_manifest`` dirs of non-retained snapshots;
    * whole ``v{N}`` directories that end up owning nothing.

    The retention contract: the last ``keep_last`` checkpoints stay
    fully loadable (each retained manifest's references are live);
    older snapshots may no longer load.  The checkpoint and lineage
    tables are history and stay intact.  Idempotent, and version dirs
    NEWER than the latest committed checkpoint are never touched — an
    in-progress update's staged (manifest-written, not-yet-checkpointed)
    snapshot survives a concurrent vacuum.  The remaining single-writer
    assumption is only the usual one: at most one UPDATE runs at a time
    (two concurrent updates would race the checkpoint itself).
    """
    assert keep_last >= 1
    cp = _checkpoint_df(spark, path)
    snaps = sorted(
        {int(r["snapshot_id"]) for r in cp.select("snapshot_id").collect()},
        reverse=True,
    )
    retained = set(snaps[:keep_last])

    live_parts: dict[int, set[int]] = {}
    live_buckets: dict[int, set[int]] = {}
    legacy_ts: set[int] = set()  # retained snapshots on the whole-file layout
    for s in retained:
        man = f"{path}/v{s}/manifest"
        if _fs.isdir(man):
            for r in spark.read.parquet(man).collect():
                live_parts.setdefault(int(r["version"]), set()).add(
                    int(r["doc_part"])
                )
        tm = _term_manifest_by_version(spark, path, s)
        if tm is None:
            legacy_ts.add(s)
        else:
            for v, bks in tm.items():
                live_buckets.setdefault(int(v), set()).update(int(b) for b in bks)

    removed_dirs, bytes_freed = 0, 0

    def _rm(p: str):
        nonlocal removed_dirs, bytes_freed
        bytes_freed += _fs.tree_size(p)
        removed_dirs += 1
        _fs.rmtree(p)

    latest_committed = snaps[0] if snaps else -1
    for name in sorted(n for n in _fs.listdir(path) if n.startswith("v")):
        vd = f"{path}/{name}"
        if not name[1:].isdigit():
            continue
        v = int(name[1:])
        if v > latest_committed:
            continue  # staged by an in-progress update — not ours to GC
        lp = live_parts.get(v, set())
        lb = live_buckets.get(v, set())
        if v not in retained and not lp and not lb and v not in legacy_ts:
            _rm(vd)
            continue
        fld_tables = tuple(
            f"fields/{n}/postings" for n in _fs.listdir(f"{vd}/fields")
        ) if _fs.isdir(f"{vd}/fields") else ()
        for table in ("postings", "doc_stats", "filters", "pos_postings",
                      *fld_tables):
            tdir = f"{vd}/{table}"
            if not _fs.isdir(tdir):
                continue
            for sub in _fs.listdir(tdir):
                if sub.startswith("doc_part="):
                    if int(sub.split("=", 1)[1]) not in lp:
                        _rm(f"{tdir}/{sub}")
            if not lp:
                _rm(tdir)
        if not lp and _fs.isdir(f"{vd}/fields"):
            _rm(f"{vd}/fields")
        tdir = f"{vd}/term_stats"
        if _fs.isdir(tdir):
            subs = [s for s in _fs.listdir(tdir) if s.startswith("term_bucket=")]
            if subs:
                for sub in subs:
                    if int(sub.split("=", 1)[1]) not in lb:
                        _rm(f"{tdir}/{sub}")
                if not lb:
                    _rm(tdir)
            elif v not in legacy_ts:
                _rm(tdir)  # legacy whole-file layout, superseded
        if v not in retained:
            for meta in ("manifest", "term_manifest"):
                if _fs.isdir(f"{vd}/{meta}"):
                    _rm(f"{vd}/{meta}")
            if not lp and _fs.isdir(f"{vd}/part_meta"):
                _rm(f"{vd}/part_meta")
            if not lp and _fs.isdir(f"{vd}/pos_meta"):
                _rm(f"{vd}/pos_meta")
            if not lp and _fs.isdir(f"{vd}/fields_meta"):
                _rm(f"{vd}/fields_meta")
        # a version directory that ended up owning nothing disappears
        if _fs.isdir(vd) and not any(
            _fs.isdir(f"{vd}/{s}") for s in _fs.listdir(vd)
        ) and v not in retained:
            _rm(vd)

    return {
        "retained_snapshots": sorted(retained),
        "removed_dirs": removed_dirs,
        "bytes_freed": bytes_freed,
    }


def _load_via_manifest(spark: SparkSession, path: str, snapshot_id: int) -> InvertedIndex:
    """Pre-checkpoint staging view: postings/doc_stats through a manifest
    whose snapshot row does not exist yet (used to compute the globals
    that go INTO that row)."""
    by_version = _manifest_by_version(spark, path, snapshot_id)
    return InvertedIndex(
        postings=_read_parts(spark, path, by_version, "postings"),
        doc_stats=_read_parts(spark, path, by_version, "doc_stats"),
        term_stats=None,  # type: ignore[arg-type]
        n_docs=0, avgdl=0.0, analyzer="", docs_per_part=0,
    )
