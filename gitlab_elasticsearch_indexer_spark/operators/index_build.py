"""Inverted-index construction (Family B-ii, SURVEY.md §2: B11-B13, B17).

What Lucene does inside Elasticsearch — term dictionary, sorted posting
lists, doc/collection statistics — rebuilt as DataFrame transformations:

* tokenize: Arrow pandas UDF producing per-doc (terms[], tfs[], dl) —
  map-side tf pre-aggregation inside the kernel, so the only shuffle
  carries (doc, distinct-term) rows, never raw token streams;
* deterministic dense docIDs: global rank of the string id — identical
  at any parallelism (north_rule requires N vs 4N comparability), never
  ``monotonically_increasing_id``;
* document-partitioned layout (like ES shards, routed by doc range —
  ids sort as "repo_path", so ranges cluster by repo ≙ the reference's
  project routing, elastic/client.go:162): postings grouped by
  (doc_part, term).  Hot Zipfian terms ("if", "return") are split
  across all doc_parts — the partition IS the salt; the global df/cf
  merge is the second, salted aggregation stage (B12);
* posting payloads: delta+varint docIDs, varint tfs/dls, per-128 block
  (last_doc, max_tfn) for block-max WAND (B15).

Scale notes: one wide shuffle builds the index (groupBy doc_part+term);
per-(part,term) groups are bounded by docs_per_part regardless of term
hotness. term_stats is term-keyed but tiny (vocab-sized). On a real
cluster docs_per_part ≈ 2-8M keeps a 10^12-doc index at ~10^5-10^6
partitions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType,
)

from ..functions.analyzers import ANALYZERS_TF
from ..functions.codecs import block_stats, pack_partition, pack_postings

K1 = 1.2
B = 0.75

# versioned-store term_stats partitioning: term-hash buckets, so a delta
# batch rewrites only the buckets containing ITS terms (never the whole
# vocabulary) and idf lookups prune to the query terms' buckets.  At
# 10^8+ terms this is the knob that keeps per-batch term_stats I/O
# batch-bounded; raise it on a real cluster.
TERM_BUCKETS = 64

TERM_ROWS_SCHEMA = "doc_idx long, term string, tf int, dl int"


def term_bucket_expr(col="term"):
    """JVM-side bucket of a term — MUST stay in lockstep with the
    driver-side ``functions.hashing.term_bucket_py`` (equality pinned
    in tests)."""
    return F.pmod(F.xxhash64(col), F.lit(TERM_BUCKETS)).cast("int")


def idf_expr(n_docs: int, df_col="df"):
    """BM25 idf from a df column and the CURRENT collection size — the
    stored bucketed term_stats carry (df, cf) only, because idf depends
    on n_docs, which changes every delta batch; deriving it at read
    time keeps untouched buckets valid forever."""
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col(df_col) + F.lit(0.5))
        / (F.col(df_col) + F.lit(0.5))
    )

PACK_SCHEMA = StructType(
    [
        StructField("df", LongType()),
        StructField("cf", LongType()),
        StructField("docs_bin", BinaryType()),
        StructField("tfs_bin", BinaryType()),
        StructField("dls_bin", BinaryType()),
        StructField("block_last", ArrayType(LongType())),
        StructField("block_max_tf", ArrayType(LongType())),
        StructField("block_min_dl", ArrayType(LongType())),
        StructField("max_tf", LongType()),
        StructField("min_dl", LongType()),
    ]
)


# full on-disk schema of a postings table (partition column included):
# reads of versioned postings use it EXPLICITLY so a row-less partition
# dir (a batch appending only zero-term docs) loads as empty instead of
# failing schema inference
POSTINGS_TABLE_SCHEMA = StructType(
    [StructField("doc_part", LongType()), StructField("term", StringType())]
    + list(PACK_SCHEMA.fields)
)


def factorize_strings(
    values, nul_possible: bool | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """NUL-safe ``pd.factorize`` for string columns.

    pandas routes object-dtype str arrays through its C StringHashTable,
    whose hash/equality have C-string semantics: a term with an embedded
    NUL compares equal to its pre-NUL prefix, so the edgeNGram grams of
    a token like ``"de\\x00tail"`` all collapse into ``"de"`` — observed
    on binary-ish blobs the late-NUL rule (A6) keeps indexable.  Hashing
    the UTF-8 bytes instead routes through the generic object table
    (full-buffer hash, NUL-safe) — but the per-value bytes allocation
    costs ~6× a plain factorize (measured, 3M grams), so the common
    all-clean case takes ONE vectorized NUL scan (~0.15 s/M values) and
    the ordinary StringHashTable path.  ``nul_possible`` lets a caller
    that already scanned a SMALLER proxy (the pack kernel scans
    capture-level rows before the ~6× gram expansion) skip the scan.
    NaN/None stays code -1 and out of uniques, exactly like
    ``pd.factorize``."""
    s = (values if isinstance(values, pd.Series)
         else pd.Series(values, dtype=object))
    if nul_possible is None:
        nul_possible = bool(
            s.str.contains("\x00", regex=False, na=False).any()
        )
    if not nul_possible:
        codes, uniq = pd.factorize(s, sort=False)
        return codes, np.asarray(uniq, dtype=object)
    codes, _ = pd.factorize(s.str.encode("utf-8"), sort=False)
    valid = np.flatnonzero(codes >= 0)
    _, first = np.unique(codes[valid], return_index=True)
    return codes, s.to_numpy(dtype=object)[valid[first]]


def make_term_rows_kernel(analyzer: str, content_col: str = "content"):
    """mapInPandas kernel: docs → (doc_idx, term, tf, dl) rows.

    For the "code" analyzer the rows are CAPTURE-level (pre-edgeNGram):
    shuffling captures instead of grams cuts row volume ~4×; the pack
    kernel expands prefixes 2..40 post-shuffle (every gram of a capture
    shares its first-two-chars bucket key, so expansion is local).
    Tokenization, tf aggregation, and the explode happen in one Python
    pass with numpy repeats — the JVM never sees per-doc term arrays.
    """
    from ..functions.analyzers import CAPTURE_TF

    analyze = CAPTURE_TF[analyzer]

    CHUNK = 512  # docs per emitted frame — bounds the ~1000× row expansion

    def kernel(batches):
        for pdf in batches:
            ids_all = pdf["doc_idx"].to_numpy(np.int64)
            texts_all = pdf[content_col].to_numpy(dtype=object)
            for s in range(0, len(pdf), CHUNK):
                t_doc, t_term, t_tf, t_dl = [], [], [], []
                for doc_idx, text in zip(
                    ids_all[s : s + CHUNK], texts_all[s : s + CHUNK]
                ):
                    tfs, dl = analyze(text or "")
                    if tfs:
                        t_doc.append(np.full(len(tfs), doc_idx, dtype=np.int64))
                        t_term.append(
                            np.fromiter(tfs.keys(), dtype=object, count=len(tfs))
                        )
                        t_tf.append(
                            np.fromiter(tfs.values(), dtype=np.int32, count=len(tfs))
                        )
                        t_dl.append(np.full(len(tfs), dl, dtype=np.int32))
                if t_doc:
                    yield pd.DataFrame(
                        {
                            "doc_idx": np.concatenate(t_doc),
                            "term": np.concatenate(t_term),
                            "tf": np.concatenate(t_tf),
                            "dl": np.concatenate(t_dl),
                        }
                    )

    return kernel


POS_ROWS_SCHEMA = "doc_idx long, term string, dl int, npos int, posb binary"

# analyzers with a well-defined ordered single-position token stream —
# phrase positions exist for these.  The "code" analyzer is excluded by
# design: pattern_capture emits multiple tokens per source token and
# edgeNGram multiplies them, so positions there would not correspond to
# adjacency the way a phrase query needs (ES code search likewise runs
# simple_query_string term matching, not phrases, over that field).
POSITION_ANALYZERS = ("simple", "default")


def make_pos_rows_kernel(analyzer: str, content_col: str = "content"):
    """mapInPandas kernel: docs → one row per (doc, distinct term) with
    the doc's positions ALREADY delta+varint packed (codecs.pack_pos_list)
    — the shuffle volume matches the tf postings shuffle, never the raw
    token stream."""
    from ..functions.analyzers import code_search_analyze, default_analyze
    from ..functions.codecs import pack_pos_list

    tok_fn = {"simple": code_search_analyze,
              "default": default_analyze}[analyzer]

    def kernel(batches):
        for pdf in batches:
            ids_all = pdf["doc_idx"].to_numpy(np.int64)
            texts_all = pdf[content_col].to_numpy(dtype=object)
            t_doc, t_term, t_dl, t_np, t_pb = [], [], [], [], []
            for doc_idx, text in zip(ids_all, texts_all):
                toks = tok_fn(text or "")
                if not toks:
                    continue
                by_term: dict[str, list[int]] = {}
                for p, t in enumerate(toks):
                    by_term.setdefault(t, []).append(p)
                dl = len(toks)
                for t, ps in by_term.items():
                    t_doc.append(doc_idx)
                    t_term.append(t)
                    t_dl.append(dl)
                    t_np.append(len(ps))
                    t_pb.append(pack_pos_list(np.asarray(ps, dtype=np.int64)))
            if t_doc:
                yield pd.DataFrame(
                    {"doc_idx": np.asarray(t_doc, dtype=np.int64),
                     "term": t_term,
                     "dl": np.asarray(t_dl, dtype=np.int32),
                     "npos": np.asarray(t_np, dtype=np.int32),
                     "posb": t_pb}
                )

    return kernel


POS_PACK_SCHEMA = (
    "doc_part long, term string, df long, cf long, docs_bin binary, "
    "cnt_bin binary, dls_bin binary, pos_bin binary"
)


def _pos_pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """(doc_part, bucket)-group kernel shared by the build and the
    compaction remap: (term, doc_idx, dl, npos, posb) rows → packed
    positional rows.  Per-doc blobs concatenate in doc order — each
    blob's deltas are self-contained, so no position ever re-encodes.
    ``cf`` = total positions in the row (the sidecar's exact token
    count, the delta path's pos_total_dl bookkeeping unit)."""
    cols = ("doc_part", "term", "df", "cf", "docs_bin", "cnt_bin",
            "dls_bin", "pos_bin")
    if len(pdf) == 0:
        return pd.DataFrame({c: [] for c in cols}, dtype=object)
    from ..functions.codecs import delta_encode
    from ..functions.codecs import varint_encode as venc

    codes, _ = factorize_strings(pdf["term"])
    docs = pdf["doc_idx"].to_numpy(np.int64)
    order = np.lexsort((docs, codes))
    codes, docs = codes[order], docs[order]
    dls = pdf["dl"].to_numpy(np.int64)[order]
    nps = pdf["npos"].to_numpy(np.int64)[order]
    blobs = pdf["posb"].to_numpy(dtype=object)[order]
    terms = pdf["term"].to_numpy(dtype=object)[order]
    starts = np.concatenate(([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
    ends = np.concatenate((starts[1:], [len(codes)]))
    out = {c: [] for c in cols}
    part = int(pdf["doc_part"].iloc[0])
    for s, e in zip(starts, ends):
        out["doc_part"].append(part)
        out["term"].append(terms[s])
        out["df"].append(int(e - s))
        out["cf"].append(int(nps[s:e].sum()))
        out["docs_bin"].append(venc(delta_encode(docs[s:e])))
        out["cnt_bin"].append(venc(nps[s:e]))
        out["dls_bin"].append(venc(dls[s:e]))
        out["pos_bin"].append(b"".join(bytes(b) for b in blobs[s:e]))
    return pd.DataFrame(out)


def pack_pos_rows(
    rows: DataFrame, docs_per_part: int, term_buckets: int = 32
) -> DataFrame:
    """(doc_idx, term, dl, npos, posb) rows → packed positional-postings
    sidecar (grouped by (doc_part, term-hash bucket), same shape and
    scale argument as the tf postings build)."""
    keyed = rows.select(
        (F.col("doc_idx") / docs_per_part).cast("long").alias("doc_part"),
        F.pmod(F.xxhash64("term"), F.lit(term_buckets)).alias("bucket"),
        "term", "doc_idx", "dl", "npos", "posb",
    )
    return keyed.groupBy("doc_part", "bucket").applyInPandas(
        _pos_pack_group, schema=POS_PACK_SCHEMA
    )


def positions_from_docs(
    with_idx: DataFrame, analyzer: str, docs_per_part: int,
    term_buckets: int = 32, content_col: str = "content",
) -> DataFrame:
    """Positional postings sidecar (phrase queries): per (doc_part, term)
    the sorted doc list plus each doc's packed position list.

    Same physical shape as :func:`postings_from_docs` — one shuffle of
    (doc, distinct-term) rows grouped by (doc_part, term-hash bucket),
    per-group width bounded by docs_per_part — so the scale argument is
    identical.  Layout per row: df, cf (total positions), docs_bin
    (delta+varint doc ids), cnt_bin (varint positions-per-doc), dls_bin
    (varint dls), pos_bin (per-doc delta+varint positions concatenated
    in doc order).
    """
    if analyzer not in POSITION_ANALYZERS:
        raise ValueError(
            f"positions need a single-position token stream; analyzer "
            f"{analyzer!r} is not in {POSITION_ANALYZERS}"
        )
    kernel = make_pos_rows_kernel(analyzer, content_col)
    rows = with_idx.select("doc_idx", content_col).mapInPandas(
        kernel, schema=POS_ROWS_SCHEMA
    )
    return pack_pos_rows(rows, docs_per_part, term_buckets)


def make_dl_udf(analyzer: str):
    """Light stats-only pass: content → doc length (no gram expansion;
    shares the per-token cache with the heavy kernel, so definitions
    coincide exactly)."""
    from ..functions.analyzers import DL_FNS

    dl_fn = DL_FNS[analyzer]

    @F.pandas_udf(IntegerType())
    def dl(content: pd.Series) -> pd.Series:
        return pd.Series([dl_fn(c or "") for c in content], dtype=np.int32)

    return dl


def assign_doc_ids(
    docs: DataFrame,
    id_col: str = "id",
    num_ranges: int | None = None,
    with_count: bool = False,
    caches: list | None = None,
):
    """Dense deterministic doc_idx = global sorted rank of the string id.

    Range-partition the rows by id, sort within partitions, count per
    partition, then add cumulative offsets inside mapInPandas.  The rank
    is a property of the total order, so it is independent of partition
    boundaries and parallelism.  Cost at scale: ONE linear range shuffle
    of the input — the rows travel with their ids, so no join-back
    shuffle of the (wide) content column is needed, and the output is
    already doc_idx-range-partitioned (doc_part-aligned for the
    downstream postings/doc_stats passes).

    ``with_count=True`` also returns the total doc count (the partition
    counts are already on the driver — no extra job).
    """
    spark = docs.sparkSession
    num_ranges = num_ranges or spark.sparkContext.defaultParallelism * 2
    cols = docs.columns
    # The persist is LOAD-BEARING, not a cache hint: RangePartitioner
    # samples its boundaries per physical plan, so without pinning the
    # materialized partitioning, the count job and the consumer jobs
    # could see different boundaries → wrong offsets → colliding
    # doc_idx (two docs merging into one posting).  Persisting fixes
    # one RDD instance (one sampled boundary set) for every job.
    # ``caches`` (if given) collects the persisted handle so the caller
    # can release it once every consumer has materialized — the persist
    # must OUTLIVE all jobs over the output (see above), so it cannot be
    # unpersisted inside this function.
    parted = (
        docs.repartitionByRange(num_ranges, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if caches is not None:
        caches.append(parted)
    counts = dict(
        parted.groupBy("_pid").count().collect()  # ≤ num_ranges rows
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = parted.drop("_pid").schema.add("doc_idx", "long")

    def add_index(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = offsets[pid] + local
            out = pdf[cols].copy()
            out["doc_idx"] = np.arange(start, start + len(pdf), dtype=np.int64)
            local += len(pdf)
            yield out

    out = parted.mapInPandas(add_index, schema=schema)
    if with_count:
        return out, acc
    return out


@dataclass
class FieldIndex:
    """One additional searchable field (the ES multi-field mapping
    analog): its own postings table over the SAME doc_idx space, its own
    analyzer chain and BM25 length normalizer.  The reference maps
    ``blob.file_name`` through the code analyzer and ``blob.path``
    through ``path_analyzer`` (elastic/index.go:147-151,165-168) so a
    search can hit a file by NAME; ``commit_sha``/``oid``/``id`` go
    through ``sha_analyzer`` (elastic/index.go:96-104,137-140) for
    SHA-prefix lookup.

    No per-field term_stats table is materialized: a query's per-term
    df comes from a term-pruned aggregation over this (small) postings
    table, memoized on the handle (``InvertedIndex.field_df_map``)."""

    postings: DataFrame   # doc_part, term, df, cf, docs_bin, ... (PACK_SCHEMA)
    analyzer: str
    avgdl: float
    total_dl: int = 0     # exact integer Σ dl — delta-update arithmetic


# derivable extra-field source columns: when the named column is absent
# from the docs frame, derive it from the standard doc columns
FIELD_DERIVATIONS = {
    "file_name": lambda: F.element_at(F.split(F.col("path"), "/"), -1),
    "oid": lambda: F.sha2(F.col("content"), 256),
}

# reference mapping's analyzer per field (elastic/index.go:137-168):
# file_name → code_analyzer, path → path_analyzer, oid/commit_sha/id →
# sha_analyzer.  A dict ``fields`` argument overrides per field (the
# driver gates use the SQL-expressible "simple" chain for file_name the
# same way the content gates do).
FIELD_ANALYZERS = {
    "file_name": "code",
    "path": "path",
    "oid": "sha",
    "commit_sha": "sha",
    "id": "sha",
}


def normalize_fields(fields) -> dict[str, str]:
    """fields argument → {field: analyzer} (sequence uses the reference
    mapping's defaults)."""
    if not fields:
        return {}
    if isinstance(fields, dict):
        return dict(fields)
    unknown = [f for f in fields if f not in FIELD_ANALYZERS]
    if unknown:
        raise ValueError(
            f"field(s) {unknown!r} have no reference-mapping analyzer "
            f"(known: {sorted(FIELD_ANALYZERS)}); pass a "
            "{field: analyzer} dict to choose one explicitly"
        )
    return {f: FIELD_ANALYZERS[f] for f in fields}


def with_field_columns(docs: DataFrame, fields) -> DataFrame:
    """Ensure every extra field's source column exists (deriving
    ``file_name`` from ``path`` when absent)."""
    for f in fields or ():
        if f not in docs.columns:
            if f not in FIELD_DERIVATIONS:
                raise ValueError(
                    f"extra field {f!r}: no column of that name and no "
                    f"known derivation"
                )
            docs = docs.withColumn(f, FIELD_DERIVATIONS[f]())
    return docs


@dataclass
class InvertedIndex:
    """Handle over the index tables + collection globals."""

    postings: DataFrame     # doc_part, term, df, cf, docs_bin, tfs_bin, dls_bin, block_last, block_max_tfn, max_tfn
    doc_stats: DataFrame    # doc_part, doc_idx, id, repo, path, lang, dl
    term_stats: DataFrame   # term, df, cf, idf
    n_docs: int
    avgdl: float
    analyzer: str
    docs_per_part: int
    # keyword-filter sidecars (B16/B17): per-(doc_part, field, value)
    # packed local-doc-set bitmaps, and the per-part repo range manifest
    # used for routing-style doc_part pruning (elastic/client.go:162).
    filters: DataFrame | None = None
    part_meta: DataFrame | None = None  # doc_part, repo_min, repo_max, n_docs
    # positional-postings sidecar (phrase queries): doc_part, term, df,
    # docs_bin, cnt_bin, dls_bin, pos_bin — built when
    # build_index(positions=True); None = phrase search unavailable.
    # pos_analyzer names ITS token chain (an ES sub-field analog): equal
    # to `analyzer` for simple/default indexes, "simple" (whitespace)
    # for code-analyzer indexes where capture/edgeNGram positions would
    # not model adjacency.
    pos_postings: DataFrame | None = None
    pos_analyzer: str | None = None
    pos_avgdl: float | None = None  # the sidecar field's own avgdl
    # persisted DataFrames backing this handle (build-path caches).
    # Service-lifetime contract: they stay cached while the handle serves
    # queries; call unpersist() when done (after save(), or when the
    # query service retires the index) to release executor storage.
    caches: list | None = None
    # file-backed indexes map doc_part → its doc_stats parquet directory
    # (manifest-resolved for versioned stores): the query fetch phase
    # point-reads the hit parts driver-side (pyarrow) instead of paying
    # a second Spark job per query.  None for in-memory handles.
    doc_stats_paths: dict | None = None
    # additional searchable fields (ES multi-field mapping analog):
    # field name → FieldIndex.  Built by build_index(fields=...);
    # multi_search scores bool-should across content + these, summing
    # per-field BM25 (elastic/index.go:137-168).
    fields: dict | None = None
    # file-backed roots of the saved tables (set by load_index; None
    # for in-memory and versioned handles): these enable the
    # driver-side scoring fast path + handle-level postings caches in
    # operators.query — the ES "coordinating node answers from the
    # filesystem cache" analog.  Queries over handles without roots
    # run the distributed Spark plan unchanged.
    postings_root: str | None = None
    term_stats_root: str | None = None
    filters_root: str | None = None
    part_meta_root: str | None = None

    def unpersist(self, blocking: bool = False) -> None:
        """Release every build-path cache registered on this handle.
        The handle's DataFrames remain VALID but recompute from source
        on next use — call after save() + reload, or at end of life."""
        for df in self.caches or []:
            df.unpersist(blocking)
        self.caches = []

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        """idf per query term, memoized on the handle: a query service
        resolves most terms from the driver-side cache and pays the
        term_stats lookup job only for never-seen terms (misses are
        cached too, so repeated zero-hit terms stay job-free)."""
        cache = self.__dict__.setdefault("_idf_cache", {})
        missing = [t for t in set(terms) if t not in cache]
        if missing:
            ts = self.term_stats
            if "term_bucket" in ts.columns:
                # bucketed (versioned) store: the lookup prunes to the
                # missing terms' hash buckets — a partition filter on
                # the term_stats scan, not a full-vocabulary read
                from ..functions.hashing import term_bucket_py

                bks = sorted({term_bucket_py(t, TERM_BUCKETS) for t in missing})
                ts = ts.filter(F.col("term_bucket").isin(bks))
            rows = ts.filter(F.col("term").isin(missing)).collect()
            found = {r["term"]: r["idf"] for r in rows}
            for t in missing:
                cache[t] = found.get(t)
        return {t: cache[t] for t in terms if cache.get(t) is not None}

    def field_idf(self, field: str, terms: list[str]) -> dict[str, float]:
        """idf per query term over an EXTRA field, memoized like
        :meth:`idf_map`.  No per-field term_stats table exists — df
        comes from a term-pruned aggregation over the (small) field
        postings; n is the shared collection size (every doc carries
        the field — empty values index zero tokens but stay counted,
        like Lucene's docCount≈maxDoc here)."""
        import math

        cache = self.__dict__.setdefault("_field_idf_cache", {}).setdefault(
            field, {}
        )
        missing = [t for t in set(terms) if t not in cache]
        if missing:
            fh = (self.fields or {}).get(field)
            if fh is None:
                raise ValueError(f"index has no field {field!r}")
            rows = (
                fh.postings.filter(F.col("term").isin(missing))
                .groupBy("term").agg(F.sum("df").alias("df")).collect()
            )
            n = float(self.n_docs)
            found = {
                r["term"]: math.log(
                    1.0 + (n - float(r["df"]) + 0.5) / (float(r["df"]) + 0.5)
                )
                for r in rows
            }
            for t in missing:
                cache[t] = found.get(t)
        return {t: cache[t] for t in terms if cache.get(t) is not None}

    def save(self, path: str) -> None:
        # sort by (doc_part, term), not just term: the dynamic-partition
        # writer REQUIRES its output ordered by the partition columns and
        # would otherwise insert its own (unstable) sort by doc_part,
        # destroying the term order inside each written file.  With the
        # partition column leading, the writer reuses this sort (one sort
        # instead of two — guide §2.4) and every doc_part file comes out
        # term-ascending — the deterministic row order the driver-side
        # scoring fast path relies on for bit-identical accumulation.
        spark = self.postings.sparkSession
        # the component writes are INDEPENDENT jobs over already-pinned
        # inputs (postings/doc_stats caches) — submit them from a small
        # thread pool so each job's tail back-fills the others' idle
        # executors (guide §2.6 "overlap independent jobs"); actions are
        # thread-safe and job descriptions are thread-local.
        from concurrent.futures import ThreadPoolExecutor

        def _w_postings():
            (
                self.postings.repartition("doc_part")
                .sortWithinPartitions("doc_part", "term")
                .write.mode("overwrite")
                .partitionBy("doc_part")
                .parquet(f"{path}/postings")
            )

        def _w_doc_stats():
            self.doc_stats.write.mode("overwrite").partitionBy(
                "doc_part"
            ).parquet(f"{path}/doc_stats")

        def _w_term_stats():
            self.term_stats.write.mode("overwrite").parquet(
                f"{path}/term_stats"
            )

        def _w_filters():
            if self.filters is not None:
                self.filters.write.mode("overwrite").partitionBy(
                    "doc_part"
                ).parquet(f"{path}/filters")

        def _w_part_meta():
            if self.part_meta is not None:
                self.part_meta.write.mode("overwrite").parquet(
                    f"{path}/part_meta"
                )

        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [pool.submit(w) for w in
                    (_w_postings, _w_doc_stats, _w_term_stats,
                     _w_filters, _w_part_meta)]
            for f in futs:
                f.result()  # surface the first failure, complete all
        if self.pos_postings is not None:
            (
                self.pos_postings.repartition("doc_part")
                .sortWithinPartitions("doc_part", "term")
                .write.mode("overwrite")
                .partitionBy("doc_part")
                .parquet(f"{path}/pos_postings")
            )
            spark.createDataFrame(
                [(self.pos_analyzer or "simple",
                  float(self.pos_avgdl if self.pos_avgdl is not None
                        else self.avgdl))],
                "pos_analyzer string, pos_avgdl double",
            ).write.mode("overwrite").parquet(f"{path}/pos_meta")
        if self.fields:
            meta_rows = []
            for name, fh in sorted(self.fields.items()):
                (
                    fh.postings.repartition("doc_part")
                    .sortWithinPartitions("doc_part", "term")
                    .write.mode("overwrite")
                    .partitionBy("doc_part")
                    .parquet(f"{path}/fields/{name}/postings")
                )
                meta_rows.append(
                    (name, fh.analyzer, float(fh.avgdl), int(fh.total_dl))
                )
            spark.createDataFrame(
                meta_rows,
                "field string, analyzer string, avgdl double, total_dl long",
            ).write.mode("overwrite").parquet(f"{path}/fields_meta")
        spark.createDataFrame(
            [(self.n_docs, self.avgdl, self.analyzer, self.docs_per_part)],
            "n_docs long, avgdl double, analyzer string, docs_per_part long",
        ).write.mode("overwrite").parquet(f"{path}/globals")


def doc_stats_paths_of(root: str) -> dict:
    """doc_part → parquet dir map of a partitionBy("doc_part") layout."""
    from ..sources import fs

    out = {}
    for d in fs.listdir(root):
        if d.startswith("doc_part="):
            out[int(d.split("=", 1)[1])] = f"{root}/{d}"
    return out


def load_index(spark: SparkSession, path: str) -> InvertedIndex:
    from ..sources import fs

    g = spark.read.parquet(f"{path}/globals").collect()[0]
    filters = part_meta = pos_postings = None
    if fs.isdir(f"{path}/filters"):
        filters = spark.read.parquet(f"{path}/filters")
    if fs.isdir(f"{path}/part_meta"):
        part_meta = spark.read.parquet(f"{path}/part_meta")
    pos_analyzer = pos_avgdl = None
    if fs.isdir(f"{path}/pos_postings"):
        pos_postings = spark.read.parquet(f"{path}/pos_postings")
        pos_analyzer = "simple"
        if fs.isdir(f"{path}/pos_meta"):
            pm = spark.read.parquet(f"{path}/pos_meta").collect()[0]
            pos_analyzer, pos_avgdl = pm["pos_analyzer"], pm["pos_avgdl"]
    fields = None
    if fs.isdir(f"{path}/fields_meta"):
        # explicit schema: a field whose analyzer emitted no tokens
        # corpus-wide saves a row-less postings dir, which must load as
        # empty, not fail inference (same guard as _read_parts)
        fields = {
            r["field"]: FieldIndex(
                postings=spark.read.schema(POSTINGS_TABLE_SCHEMA).parquet(
                    f"{path}/fields/{r['field']}/postings"
                ),
                analyzer=r["analyzer"],
                avgdl=float(r["avgdl"]),
                total_dl=int(r["total_dl"]),
            )
            for r in spark.read.parquet(f"{path}/fields_meta").collect()
        }
    return InvertedIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        doc_stats=spark.read.parquet(f"{path}/doc_stats"),
        term_stats=spark.read.parquet(f"{path}/term_stats"),
        n_docs=g["n_docs"],
        avgdl=g["avgdl"],
        analyzer=g["analyzer"],
        docs_per_part=g["docs_per_part"],
        filters=filters,
        part_meta=part_meta,
        pos_postings=pos_postings,
        pos_analyzer=pos_analyzer,
        pos_avgdl=pos_avgdl,
        doc_stats_paths=doc_stats_paths_of(f"{path}/doc_stats"),
        fields=fields,
        postings_root=f"{path}/postings",
        term_stats_root=f"{path}/term_stats",
        filters_root=f"{path}/filters" if filters is not None else None,
        part_meta_root=f"{path}/part_meta" if part_meta is not None else None,
    )


def filters_from_doc_stats(
    doc_stats: DataFrame, docs_per_part: int, fields: tuple[str, ...] = ("lang", "repo")
) -> DataFrame:
    """Keyword-filter sidecar: per (doc_part, field, value) a packed set
    of local doc offsets (codecs.pack_doc_set — bitmap or offset list by
    density).

    This is how a keyword filter reaches the scoring kernel WITHOUT
    shipping an allowed-doc list through a shuffle: a filtered query
    cogroups postings with ≤ one tiny row per predicate per part (≤
    docs_per_part/8 bytes), and the kernel masks decoded postings by the
    bitmap.  Total sidecar volume is O(n_docs/8) bits per field —
    partition-aligned, independent of query count.
    """
    from ..functions.codecs import pack_doc_set

    cols = ["doc_part", "doc_idx", *fields]

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["doc_part"].iloc[0])
        local = pdf["doc_idx"].to_numpy(np.int64) - part * docs_per_part
        out_f: list[str] = []
        out_v: list[str] = []
        out_b: list[bytes] = []
        for f in fields:
            codes, uniq = factorize_strings(pdf[f])
            for ci, v in enumerate(uniq):
                offs = np.sort(local[codes == ci])
                out_f.append(f)
                out_v.append(v)
                out_b.append(pack_doc_set(offs, docs_per_part))
        return pd.DataFrame(
            {"doc_part": np.full(len(out_f), part, dtype=np.int64),
             "field": out_f, "value": out_v, "bits": out_b}
        )

    return doc_stats.select(*cols).groupBy("doc_part").applyInPandas(
        pack_group, schema="doc_part long, field string, value string, bits binary"
    )


def part_meta_from_doc_stats(doc_stats: DataFrame) -> DataFrame:
    """B17 routing manifest: per-part repo bounds.  Doc ids sort as
    "repo_path", so doc ranges cluster by repo and [repo_min, repo_max]
    is a tight containment bound — a repo-scoped query prunes to the
    parts whose range covers it (the ES analog routes to one shard,
    elastic/client.go:162, _routing required elastic/index.go:115-117)."""
    return doc_stats.groupBy("doc_part").agg(
        F.min("repo").alias("repo_min"),
        F.max("repo").alias("repo_max"),
        F.count("*").alias("n_docs"),
    )


def doc_stats_from_docs(
    with_idx: DataFrame, analyzer: str, docs_per_part: int,
    id_col: str = "id", content_col: str = "content",
    field_dls: dict[str, str] | None = None,
) -> DataFrame:
    """Light pass: per-doc metadata + oid + dl (no gram expansion).

    ``field_dls`` ({field: analyzer}) adds a ``dl_<field>`` column per
    extra searchable field — the per-doc length under THAT field's
    chain.  Riding in doc_stats means the delta path's dead-doc join,
    the survivor anti-join, and compaction's remap all carry field
    lengths for free, so per-field total_dl stays exact integers across
    the whole update lifecycle (the same arithmetic as ``dl``)."""
    dl_udf = make_dl_udf(analyzer)
    extra = [
        make_dl_udf(an)(F.col(f)).alias(f"dl_{f}")
        for f, an in (field_dls or {}).items()
    ]
    return with_idx.select(
        (F.col("doc_idx") / docs_per_part).cast("long").alias("doc_part"),
        "doc_idx", id_col, "repo", "path", "lang",
        F.sha2(F.col(content_col), 256).alias("oid"),
        dl_udf(F.col(content_col)).alias("dl"),
        *extra,
    )


# shuffle row format of the map-side PARTIAL postings (round-6 build
# optimization, guide §2.3 "aggregate before you shuffle"): one row per
# (map task flush, doc_part, capture term) carrying that slice's packed
# doc/tf/dl streams, instead of one row per (doc, capture) — ~100-150×
# fewer shuffled rows and ~5× fewer bytes (varint-packed) at identical
# final output.  ``first_doc`` orders a term's partials on the reduce
# side (map partitions hold disjoint doc ranges, so partials never
# interleave).
PARTIAL_ROWS_SCHEMA = StructType([
    StructField("doc_part", LongType()),
    StructField("bucket", LongType()),
    StructField("term", StringType()),
    StructField("df", LongType()),
    StructField("cf", LongType()),
    StructField("first_doc", LongType()),
    StructField("docs_bin", BinaryType()),
    StructField("tfs_bin", BinaryType()),
    StructField("dls_bin", BinaryType()),
])

# map-side partial flush threshold (posting entries buffered per task
# before a partial emit) — bounds map-task memory at cluster scale while
# keeping partials large enough to amortize the per-row overhead
PARTIAL_FLUSH_ENTRIES = 4_000_000


def _term_bucket_codes(uniq: np.ndarray, term_buckets: int) -> np.ndarray:
    """Shuffle-salt bucket per unique term: a pure function of the
    term's first two chars, so every capture sharing them (hence every
    edgeNGram prefix ≥ 2 of every capture) lands in one reduce group.
    Any deterministic hash works — the bucket is only a grouping salt,
    never persisted."""
    from zlib import crc32

    return np.fromiter(
        (crc32(t[:2].encode("utf-8", "surrogatepass")) % term_buckets
         for t in uniq),
        dtype=np.int64, count=len(uniq),
    )


def make_partial_postings_kernel(
    analyzer: str, docs_per_part: int, term_buckets: int,
    content_col: str = "content",
    flush_entries: int = PARTIAL_FLUSH_ENTRIES,
):
    """mapInPandas kernel: docs → PARTIAL packed postings rows.

    Tokenization (capture-level tf pre-aggregation, exactly
    :func:`make_term_rows_kernel`'s chain) and the per-task partial
    pack are fused into ONE Python stage: the per-(doc, capture) rows
    never cross the JVM boundary at all — the shuffle carries one
    varint-packed row per (doc_part, capture) per task flush.
    """
    import pyarrow as pa

    from ..functions.analyzers import CAPTURE_TF
    from ..functions.codecs import varint_encode_with_sizes

    analyze = CAPTURE_TF[analyzer]

    def _flush(d_ids, d_ns, d_dls, terms_flat, tfs_flat) -> pd.DataFrame | None:
        # buffers are flat Python lists (one append/extend per doc, no
        # per-doc numpy allocs); entry-level arrays materialize here in
        # one np.repeat / asarray pass each — same rows, same order
        if not d_ids:
            return None
        ns = np.asarray(d_ns, dtype=np.int64)
        docs = np.repeat(np.asarray(d_ids, dtype=np.int64), ns)
        tfs = np.asarray(tfs_flat, dtype=np.int64)
        dls = np.repeat(np.asarray(d_dls, dtype=np.int64), ns)
        codes, uniq = _arrow_dict_encode(pa.array(terms_flat, type=pa.string()))
        parts = docs // docs_per_part
        # order by (doc_part, term, doc): docs arrive in ascending order
        # per term already (docs processed in doc_idx order), so a
        # stable sort by (part, code) suffices — combined key
        pmax = int(parts.max()) if len(parts) else 0
        if (pmax + 1) * len(uniq) < (1 << 62):
            order = np.argsort(parts * len(uniq) + codes, kind="stable")
        else:  # pragma: no cover - astronomically wide ranges
            order = np.lexsort((codes, parts))
        codes, parts = codes[order], parts[order]
        docs, tfs, dls = docs[order], tfs[order], dls[order]
        run = np.flatnonzero(
            (codes[1:] != codes[:-1]) | (parts[1:] != parts[:-1])
        ) + 1
        starts = np.concatenate(([0], run))
        ends = np.concatenate((run, [len(codes)]))
        lens = ends - starts
        # delta with per-run reset (first value absolute), one varint
        # pass for the whole flush, per-run byte-range slices
        deltas = docs.astype(np.uint64).copy()
        deltas[1:] = (docs[1:] - docs[:-1]).astype(np.uint64)
        deltas[starts] = docs[starts].astype(np.uint64)
        d_stream, d_sz = varint_encode_with_sizes(deltas)
        t_stream, t_sz = varint_encode_with_sizes(tfs.astype(np.uint64))
        l_stream, l_sz = varint_encode_with_sizes(dls.astype(np.uint64))

        def slices(stream: bytes, sizes: np.ndarray) -> list[bytes]:
            cum = np.concatenate(([0], np.cumsum(sizes)))
            lo, hi = cum[starts], cum[ends]
            return [stream[a:b] for a, b in zip(lo.tolist(), hi.tolist())]

        cf = np.add.reduceat(tfs, starts)
        bucket_u = _term_bucket_codes(uniq, term_buckets)
        rcodes = codes[starts]
        return pd.DataFrame({
            "doc_part": parts[starts],
            "bucket": bucket_u[rcodes],
            "term": uniq[rcodes],
            "df": lens,
            "cf": cf,
            "first_doc": docs[starts],
            "docs_bin": slices(d_stream, d_sz),
            "tfs_bin": slices(t_stream, t_sz),
            "dls_bin": slices(l_stream, l_sz),
        })

    def kernel(batches):
        d_ids, d_ns, d_dls = [], [], []
        terms_flat, tfs_flat = [], []
        buffered = 0
        for pdf in batches:
            ids_all = pdf["doc_idx"].to_numpy(np.int64)
            texts_all = pdf[content_col].to_numpy(dtype=object)
            for doc_idx, text in zip(ids_all, texts_all):
                tfs, dl = analyze(text or "")
                if tfs:
                    d_ids.append(doc_idx)
                    d_ns.append(len(tfs))
                    d_dls.append(dl)
                    terms_flat.extend(tfs.keys())
                    tfs_flat.extend(tfs.values())
                    buffered += len(tfs)
            if buffered >= flush_entries:
                out = _flush(d_ids, d_ns, d_dls, terms_flat, tfs_flat)
                if out is not None:
                    yield out
                d_ids, d_ns, d_dls = [], [], []
                terms_flat, tfs_flat = [], []
                buffered = 0
        out = _flush(d_ids, d_ns, d_dls, terms_flat, tfs_flat)
        if out is not None:
            yield out

    return kernel


def make_merge_pack_kernel(expand: tuple[int, int] | None):
    """(doc_part, bucket)-group kernel over PARTIAL postings rows:
    decode every partial's streams in ONE vectorized pass (partials of
    a term concatenate in first_doc order — disjoint doc ranges), then
    expand/pack ENTIRELY on dictionary codes: the edgeNGram prefixes
    are sliced once per UNIQUE capture (a per-group CSR of gram codes)
    and per-entry expansion is integer gathers through that table —
    no per-entry string ever materializes, unlike the
    :func:`make_pack_group_kernel` string path it replaces.  The packed
    output stays BYTE-IDENTICAL to the row-shuffle build
    (pytest-pinned)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.codecs import varint_decode

    empty = make_pack_group_kernel(expand)  # canonical empty frame

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return empty(pd.DataFrame(
                {"doc_part": [], "term": [], "doc_idx": [], "tf": [],
                 "dl": []}))
        codes, uniq = _arrow_dict_encode(
            pa.array(pdf["term"], type=pa.string(), from_pandas=True)
        )
        dfs = pdf["df"].to_numpy(np.int64)
        first = pdf["first_doc"].to_numpy(np.int64)
        order = _sort_by_code_doc(codes, first)
        codes, dfs = codes[order], dfs[order]
        dbufs = pdf["docs_bin"].to_numpy(dtype=object)[order]
        tbufs = pdf["tfs_bin"].to_numpy(dtype=object)[order]
        lbufs = pdf["dls_bin"].to_numpy(dtype=object)[order]
        deltas = varint_decode(b"".join(dbufs)).astype(np.int64)
        tf_a = varint_decode(b"".join(tbufs)).astype(np.int64)
        dl_a = varint_decode(b"".join(lbufs)).astype(np.int64)
        # absolute docs: each partial's first delta is its absolute
        # first doc, so the within-segment cumsum IS the doc id
        # (csum minus each segment's prefix total — no Python loop)
        seg_starts = np.cumsum(dfs) - dfs
        csum = np.cumsum(deltas)
        base = np.where(seg_starts > 0, csum[seg_starts - 1], 0)
        docs_a = csum - np.repeat(base, dfs)
        doc_part = int(pdf["doc_part"].iloc[0])

        if expand is None:
            # entries are already grouped by final-term code with docs
            # ascending within each code (disjoint partial doc ranges in
            # first_doc order) — no per-entry sort, no aggregation
            e_codes = np.repeat(codes, dfs)
            starts = np.concatenate(
                ([0], np.flatnonzero(e_codes[1:] != e_codes[:-1]) + 1)
            )
            packed = pack_partition(starts, docs_a, tf_a, dl_a)
            out = pd.DataFrame(packed)
            out.insert(0, "term", uniq[e_codes[starts]])
            out.insert(0, "doc_part",
                       np.full(len(starts), doc_part, dtype=np.int64))
            return out

        # --- edgeNGram expansion on codes (lo..hi prefixes) ---
        lo, hi = expand
        uarr = pa.array(uniq, type=pa.string())
        lens_u = pc.utf8_length(uarr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nks = np.maximum(np.minimum(lens_u, hi) - lo + 1, 0)
        off = np.cumsum(nks) - nks
        total_flat = int(nks.sum())
        slices, flat_pos = [], []
        for k in range(lo, hi + 1):
            idx = np.flatnonzero(lens_u >= k)
            if idx.size == 0:
                break
            s = pc.utf8_slice_codeunits(uarr.take(pa.array(idx)), 0, k)
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            slices.append(s)
            flat_pos.append(off[idx] + (k - lo))
        if not slices:
            return empty(pd.DataFrame(
                {"doc_part": [], "term": [], "doc_idx": [], "tf": [],
                 "dl": []}))
        flat_pos = np.concatenate(flat_pos)
        gcodes_concat, gram_uniq = _arrow_dict_encode(
            pa.concat_arrays(slices))
        gram_code_flat = np.empty(total_flat, dtype=np.int64)
        gram_code_flat[flat_pos] = gcodes_concat

        # per-entry expansion: integer gathers through the CSR; the tf/dl
        # gathers compose the sort permutation with the entry row index
        # so only ONE expanded array (the gram code) is built pre-sort
        e_codes = np.repeat(codes, dfs)
        reps = nks[e_codes]
        total_e = int(reps.sum())
        start = np.repeat(off[e_codes], reps)
        grp = np.cumsum(reps) - reps
        within = np.arange(total_e, dtype=np.int64) - np.repeat(grp, reps)
        e_g = gram_code_flat[start + within]
        e_row = np.repeat(np.arange(len(docs_a), dtype=np.int64), reps)
        order2 = _sort_by_code_doc(e_g, docs_a[e_row])
        e_g = e_g[order2]
        row_s = e_row[order2]
        e_docs = docs_a[row_s]
        # aggregate tf per (gram, doc) — two captures of one doc sharing
        # a prefix merge into one posting (same rule as the string path)
        new_run = np.flatnonzero(
            (e_g[1:] != e_g[:-1]) | (e_docs[1:] != e_docs[:-1])
        ) + 1
        bnd = np.concatenate(([0], new_run))
        e_tf = np.add.reduceat(tf_a[row_s], bnd)
        e_docs, e_dl = e_docs[bnd], dl_a[row_s[bnd]]
        e_g = e_g[bnd]
        starts = np.concatenate(
            ([0], np.flatnonzero(e_g[1:] != e_g[:-1]) + 1)
        )
        packed = pack_partition(starts, e_docs, e_tf, e_dl)
        out = pd.DataFrame(packed)
        out.insert(0, "term", gram_uniq[e_g[starts]])
        out.insert(0, "doc_part",
                   np.full(len(starts), doc_part, dtype=np.int64))
        return out

    return merge


def postings_from_docs(
    with_idx: DataFrame, analyzer: str, docs_per_part: int,
    term_buckets: int = 32, content_col: str = "content",
) -> DataFrame:
    """docs → packed posting lists in one heavy pass.

    Round-6 physical plan (guide §2.3): the map side fuses tokenization
    and a per-task PARTIAL pack into one ``mapInPandas`` stage, so the
    shuffle carries one varint-packed row per (doc_part, capture) per
    task flush — ~100-150× fewer rows and ~5× fewer bytes than the
    per-(doc, capture) row shuffle it replaces, measured ~2× on the
    whole postings phase.  The reduce side (grouped by (doc_part,
    term-hash bucket) exactly as before — hot Zipfian terms stay
    bounded by docs_per_part per group, B12) merges partials
    vectorized and delegates to the same pack kernel, so the packed
    output is byte-identical.  Group width per (doc_part, bucket) is
    unchanged; map-task memory is bounded by PARTIAL_FLUSH_ENTRIES.
    """
    from ..functions.analyzers import EXPAND_PREFIXES

    kernel = make_partial_postings_kernel(
        analyzer, docs_per_part, term_buckets, content_col,
        flush_entries=PARTIAL_FLUSH_ENTRIES,
    )
    partials = with_idx.select("doc_idx", content_col).mapInPandas(
        kernel, schema=PARTIAL_ROWS_SCHEMA
    )

    out_schema = StructType(
        [StructField("doc_part", LongType()), StructField("term", StringType())]
        + list(PACK_SCHEMA.fields)
    )

    merge = make_merge_pack_kernel(EXPAND_PREFIXES[analyzer])
    return partials.groupBy("doc_part", "bucket").applyInPandas(
        merge, schema=out_schema
    )


def _sort_by_code_doc(codes: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Order for (code asc, doc asc): a single combined-key stable
    argsort (numpy radix sort on int64) — measured ~2× the two-pass
    ``np.lexsort`` on posting-scale arrays.  Falls back to lexsort when
    the combined key could overflow int64."""
    if len(docs) == 0:
        return np.empty(0, dtype=np.int64)
    dmin = int(docs.min())
    span = int(docs.max()) - dmin + 1
    cmax = int(codes.max()) if len(codes) else 0
    if cmax < (1 << 62) // max(span, 1):
        combined = codes * span + (docs - dmin)
        return np.argsort(combined, kind="stable")
    return np.lexsort((docs, codes))


def _arrow_dict_encode(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow dictionary-encode a string array → (int64 codes, object
    uniques).  The Arrow hash table hashes the FULL utf-8 buffer
    (length-prefixed), so embedded NULs are handled correctly with no
    pre-scan — this replaces the pandas ``factorize_strings`` NUL
    workaround in the pack path (pandas' C StringHashTable has C-string
    semantics, see :func:`factorize_strings`) AND runs severalfold
    faster (C++ hashing of Arrow buffers vs per-value Python-object
    hashing; measured ~7× on 2.6M grams)."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(arr)
    if hasattr(enc, "combine_chunks"):  # ChunkedArray input
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.asarray(enc.dictionary.to_pandas(), dtype=object)
    return codes, uniq


def make_pack_group_kernel(expand: tuple[int, int] | None):
    """(doc_part, bucket)-group kernel: term rows → packed posting rows.

    ``expand``: (lo, hi) edgeNGram prefix range to apply post-shuffle
    (the "code" analyzer ships captures), or None when the input rows
    already carry final terms (simple/default analyzers — and
    :func:`compact_index`'s decoded gram rows, which must NOT be
    re-expanded).

    The expansion and the term-code assignment run entirely in Arrow
    (guide §4.2: hand whole batches to vectorized native libraries):
    ``utf8_slice_codeunits`` slices every capture's k-prefix without
    materializing Python strings (codepoint semantics — identical to
    Python slicing, pytest-pinned), and ``dictionary_encode`` assigns
    term codes from the Arrow buffers (NUL-safe by construction, no
    pre-scan needed).  Only the per-term UNIQUE names ever become
    Python objects.  Round-6 measurement: the pack stage dropped ~2×
    versus the pandas ``str.slice``/``factorize`` version.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            # dtype=object: an untyped [] column defaults to float64,
            # which Arrow cannot cast to the list/binary output fields
            return pd.DataFrame(
                {"doc_part": [], "term": [],
                 **{k: [] for k in PACK_SCHEMA.fieldNames()}}, dtype=object
            )
        docs_a = pdf["doc_idx"].to_numpy(np.int64)
        tf_a = pdf["tf"].to_numpy(np.int64)
        dl_a = pdf["dl"].to_numpy(np.int64)
        term_arr = pa.array(pdf["term"], type=pa.string(), from_pandas=True)

        if expand is not None:
            # vectorized prefix expansion: for k=lo..hi take every
            # capture long enough and slice its k-prefix; gram tf sums
            # capture counts (reduceat after the (code, doc) sort)
            lo, hi = expand
            lens = pc.utf8_length(term_arr).to_numpy(zero_copy_only=False)
            slices, sel = [], []
            for k in range(lo, hi + 1):
                idx = np.flatnonzero(lens >= k)
                if idx.size == 0:
                    break
                s = pc.utf8_slice_codeunits(
                    term_arr.take(pa.array(idx)), 0, k
                )
                if isinstance(s, pa.ChunkedArray):
                    s = s.combine_chunks()
                slices.append(s)
                sel.append(idx)
            if not slices:
                return pd.DataFrame(
                    {"doc_part": [], "term": [],
                     **{k2: [] for k2 in PACK_SCHEMA.fieldNames()}},
                    dtype=object,
                )
            sel = np.concatenate(sel)
            docs_a, tf_a, dl_a = docs_a[sel], tf_a[sel], dl_a[sel]
            codes, uniq = _arrow_dict_encode(pa.concat_arrays(slices))
            order = _sort_by_code_doc(codes, docs_a)
            codes, docs_a = codes[order], docs_a[order]
            tf_a, dl_a = tf_a[order], dl_a[order]
            # aggregate tf per (gram, doc): boundaries of (code, doc) runs
            new_run = np.flatnonzero(
                (codes[1:] != codes[:-1]) | (docs_a[1:] != docs_a[:-1])
            ) + 1
            bnd = np.concatenate(([0], new_run))
            tf_a = np.add.reduceat(tf_a, bnd)
            docs_a, dl_a = docs_a[bnd], dl_a[bnd]
            codes = codes[bnd]
        else:
            # identity grams: sort by (term-code, doc) — Arrow dictionary
            # codes + numpy lexsort, all C-speed
            codes, uniq = _arrow_dict_encode(term_arr)
            order = _sort_by_code_doc(codes, docs_a)
            codes = codes[order]
            docs_a, tf_a, dl_a = docs_a[order], tf_a[order], dl_a[order]

        starts = np.concatenate(
            ([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1)
        )
        packed = pack_partition(starts, docs_a, tf_a, dl_a)
        out = pd.DataFrame(packed)
        out.insert(0, "term", uniq[codes[starts]])
        out.insert(
            0, "doc_part",
            np.full(len(starts), pdf["doc_part"].iloc[0], dtype=np.int64),
        )
        return out

    return pack_group


def term_stats_from_postings(postings: DataFrame, n_docs: int) -> DataFrame:
    """B12/B13: salted global term stats — stage 1 was the per-doc_part
    partial (df per (term, part)), stage 2 merges across parts."""
    return (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn("idf", idf_expr(n_docs))
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    analyzer: str = "code",
    docs_per_part: int | None = None,
    id_col: str = "id",
    content_col: str = "content",
    positions: bool = False,
    fields=None,
) -> InvertedIndex:
    """documents (id, content [, repo, path, lang]) → inverted index.

    ``positions=True`` additionally builds the positional-postings
    sidecar enabling :func:`operators.query.phrase_search`.  Its token
    chain is the index analyzer when that has single-position tokens
    (simple/default), else the whitespace "simple" chain (the ES
    sub-field pattern — a second analyzer over the same stored field).

    ``fields`` adds extra searchable fields (the ES multi-field mapping,
    elastic/index.go:137-168): a sequence of field names (reference
    analyzers — file_name→code, path→path, oid/commit_sha→sha) or a
    {field: analyzer} dict.  Each gets its own postings table over the
    same doc_idx/doc_part space plus its own BM25 length normalizer;
    :func:`operators.query.multi_search` scores bool-should across them.
    Missing source columns derive via FIELD_DERIVATIONS (file_name from
    path, oid from content).
    """
    pos_an = analyzer if analyzer in POSITION_ANALYZERS else "simple"
    for c in ("repo", "path", "lang"):
        if c not in docs.columns:
            docs = docs.withColumn(c, F.lit(""))
    fdefs = normalize_fields(fields)
    docs = with_field_columns(docs, fdefs)
    extra_cols = [
        f for f in fdefs
        if f not in (id_col, content_col, "repo", "path", "lang")
    ]

    caches: list = []
    with_idx, n_docs = assign_doc_ids(
        docs.select(id_col, content_col, "repo", "path", "lang", *extra_cols),
        id_col, with_count=True, caches=caches,
    )
    with_idx = with_idx.persist()  # consumed by two jobs (doc_stats,
    # postings); at cluster scale this would be a checkpointed staging
    # table instead of a cache.  n_docs rides along from the doc-id
    # assignment's partition counts — no separate count job.
    if docs_per_part is None:
        target_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
        docs_per_part = max(1024, math.ceil(n_docs / target_parts))

    doc_stats = doc_stats_from_docs(
        with_idx, analyzer, docs_per_part, id_col, content_col,
        field_dls=fdefs or None,
    ).persist()
    avgdl = float(doc_stats.agg(F.avg("dl")).collect()[0][0] or 0.0)

    pos_postings = None
    if positions:
        # persisted like the tf postings: an unpinned sidecar would
        # re-run the whole tokenize→shuffle→pack chain on EVERY phrase
        # query of an in-memory handle
        pos_postings = positions_from_docs(
            with_idx, pos_an, docs_per_part, content_col=content_col
        ).persist()
        caches.append(pos_postings)

    # persist the PACKED postings (compact: delta+varint binaries) so the
    # heavy tokenize→shuffle→pack chain runs exactly once — term_stats,
    # save(), and every query read the materialized result.  At cluster
    # scale the equivalent is writing the postings table before deriving
    # term_stats (incremental.update_index does exactly that).
    postings = postings_from_docs(with_idx, analyzer, docs_per_part,
                                  content_col=content_col).persist()
    term_stats = term_stats_from_postings(postings, n_docs)
    caches += [with_idx, doc_stats, postings]

    field_handles: dict[str, FieldIndex] | None = None
    if fdefs:
        # ONE stats job covers every field's exact integer Σ dl, read
        # off the cached doc_stats' dl_<field> columns (the delta path
        # maintains the same integers incrementally)
        dl_row = doc_stats.agg(
            *[
                F.coalesce(F.sum(f"dl_{f}"), F.lit(0)).alias(f)
                for f in fdefs
            ]
        ).collect()[0]
        field_handles = {}
        for f, an in fdefs.items():
            fpost = postings_from_docs(
                with_idx, an, docs_per_part, content_col=f
            ).persist()
            caches.append(fpost)
            total = int(dl_row[f])
            field_handles[f] = FieldIndex(
                postings=fpost,
                analyzer=an,
                avgdl=(total / n_docs) if n_docs else 0.0,
                total_dl=total,
            )

    return InvertedIndex(
        postings=postings,
        doc_stats=doc_stats,
        term_stats=term_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        analyzer=analyzer,
        docs_per_part=docs_per_part,
        # lazy sidecars — computed only when a filtered/routed query or
        # save() consumes them (no extra build-path jobs)
        filters=filters_from_doc_stats(doc_stats, docs_per_part),
        part_meta=part_meta_from_doc_stats(doc_stats),
        pos_postings=pos_postings,
        pos_analyzer=pos_an if positions else None,
        # BM25 normalizer of the PHRASE field: its own avgdl (the main
        # avgdl counts grams on a code index, not whitespace tokens)
        pos_avgdl=(
            avgdl if (not positions or pos_an == analyzer)
            else float(
                with_idx.select(
                    F.avg(make_dl_udf(pos_an)(F.col(content_col)))
                ).collect()[0][0] or 0.0
            )
        ) if positions else None,
        caches=caches,
        fields=field_handles,
    )


def make_pack_udf():
    """Pack sorted (docs, tfs, dls) arrays into compressed binaries +
    avgdl-independent block-max metadata (max tf / min dl per block)."""

    @F.pandas_udf(PACK_SCHEMA)
    def pack(docs: pd.Series, tfs: pd.Series, dls: pd.Series) -> pd.DataFrame:
        rows = {k: [] for k in PACK_SCHEMA.fieldNames()}
        for d, t, l in zip(docs, tfs, dls):
            d = np.asarray(d, dtype=np.int64)
            t = np.asarray(t, dtype=np.int64)
            l = np.asarray(l, dtype=np.int64)
            docs_bin, tfs_bin, dls_bin = pack_postings(d, t, l)
            last, bmax_tf, bmin_dl = block_stats(d, t, l)
            rows["df"].append(len(d))
            rows["cf"].append(int(t.sum()))
            rows["docs_bin"].append(docs_bin)
            rows["tfs_bin"].append(tfs_bin)
            rows["dls_bin"].append(dls_bin)
            rows["block_last"].append(last.tolist())
            rows["block_max_tf"].append(bmax_tf.tolist())
            rows["block_min_dl"].append(bmin_dl.tolist())
            rows["max_tf"].append(int(t.max()) if len(t) else 0)
            rows["min_dl"].append(int(l.min()) if len(l) else 0)
        return pd.DataFrame(rows)

    return pack
