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
from ..functions.codecs import block_stats, pack_postings

K1 = 1.2
B = 0.75

TOKENIZE_SCHEMA = StructType(
    [
        StructField("terms", ArrayType(StringType())),
        StructField("tfs", ArrayType(IntegerType())),
        StructField("dl", IntegerType()),
    ]
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


def make_tokenizer_udf(analyzer: str):
    """Vectorized tokenizer: content → (distinct terms, tfs, dl)."""
    analyze = ANALYZERS_TF[analyzer]

    @F.pandas_udf(TOKENIZE_SCHEMA)
    def tokenize(content: pd.Series) -> pd.DataFrame:
        terms_col, tfs_col, dl_col = [], [], []
        for text in content:
            tfs, dl = analyze(text or "")
            terms_col.append(list(tfs.keys()))
            tfs_col.append(list(tfs.values()))
            dl_col.append(dl)
        return pd.DataFrame({"terms": terms_col, "tfs": tfs_col, "dl": dl_col})

    return tokenize


def assign_doc_ids(docs: DataFrame, id_col: str = "id", num_ranges: int | None = None) -> DataFrame:
    """Dense deterministic doc_idx = global sorted rank of the string id.

    Range-partition a slim (id) projection, count per partition, then add
    cumulative offsets inside mapInPandas.  The rank is a property of the
    total order, so it is independent of partition boundaries and
    parallelism.  Cost at scale: one range shuffle of the id column plus
    one sort-merge join back — both linear.
    """
    spark = docs.sparkSession
    num_ranges = num_ranges or spark.sparkContext.defaultParallelism * 2
    slim = (
        docs.select(id_col)
        .repartitionByRange(num_ranges, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = dict(
        slim.groupBy("_pid").count().collect()  # ≤ num_ranges rows
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    def add_index(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = offsets[pid] + local
            out = pdf[[id_col]].copy()
            out["doc_idx"] = np.arange(start, start + len(pdf), dtype=np.int64)
            local += len(pdf)
            yield out

    ids = slim.mapInPandas(add_index, schema=f"{id_col} string, doc_idx long")
    out = docs.join(ids, on=id_col, how="inner")
    return out


@dataclass
class InvertedIndex:
    """Handle over the three index tables + collection globals."""

    postings: DataFrame     # doc_part, term, df, cf, docs_bin, tfs_bin, dls_bin, block_last, block_max_tfn, max_tfn
    doc_stats: DataFrame    # doc_part, doc_idx, id, repo, path, lang, dl
    term_stats: DataFrame   # term, df, cf, idf
    n_docs: int
    avgdl: float
    analyzer: str
    docs_per_part: int

    def idf_map(self, terms: list[str]) -> dict[str, float]:
        rows = self.term_stats.filter(F.col("term").isin(list(set(terms)))).collect()
        return {r["term"]: r["idf"] for r in rows}

    def save(self, path: str) -> None:
        spark = self.postings.sparkSession
        (
            self.postings.repartition("doc_part")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("doc_part")
            .parquet(f"{path}/postings")
        )
        self.doc_stats.write.mode("overwrite").partitionBy("doc_part").parquet(
            f"{path}/doc_stats"
        )
        self.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")
        spark.createDataFrame(
            [(self.n_docs, self.avgdl, self.analyzer, self.docs_per_part)],
            "n_docs long, avgdl double, analyzer string, docs_per_part long",
        ).write.mode("overwrite").parquet(f"{path}/globals")


def load_index(spark: SparkSession, path: str) -> InvertedIndex:
    g = spark.read.parquet(f"{path}/globals").collect()[0]
    return InvertedIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        doc_stats=spark.read.parquet(f"{path}/doc_stats"),
        term_stats=spark.read.parquet(f"{path}/term_stats"),
        n_docs=g["n_docs"],
        avgdl=g["avgdl"],
        analyzer=g["analyzer"],
        docs_per_part=g["docs_per_part"],
    )


def tokenize_docs(
    with_idx: DataFrame, analyzer: str, id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """(doc_idx, id, content, repo, path, lang) → tokened rows with
    (terms, tfs, dl, oid=sha256(content))."""
    tokenize = make_tokenizer_udf(analyzer)
    return with_idx.withColumn("_t", tokenize(F.col(content_col))).select(
        "doc_idx", id_col, "repo", "path", "lang",
        F.sha2(F.col(content_col), 256).alias("oid"),
        F.col("_t.terms").alias("terms"),
        F.col("_t.tfs").alias("tfs"),
        F.col("_t.dl").alias("dl"),
    )


def doc_stats_from_tokened(tokened: DataFrame, docs_per_part: int, id_col: str = "id") -> DataFrame:
    return tokened.select(
        (F.col("doc_idx") / docs_per_part).cast("long").alias("doc_part"),
        "doc_idx", id_col, "repo", "path", "lang", "oid", "dl",
    )


def postings_from_tokened(tokened: DataFrame, docs_per_part: int) -> DataFrame:
    """tokened rows → packed posting lists grouped by (doc_part, term).

    The groupBy key includes doc_part, so a hot term's postings are
    bounded by docs_per_part per group — the document partition is the
    salt for Zipfian skew (B12).
    """
    term_rows = tokened.select(
        (F.col("doc_idx") / docs_per_part).cast("long").alias("doc_part"),
        "doc_idx", "dl",
        F.explode(F.arrays_zip("terms", "tfs")).alias("tt"),
    ).select(
        "doc_part", "doc_idx", "dl",
        F.col("tt.terms").alias("term"),
        F.col("tt.tfs").alias("tf"),
    )

    grouped = term_rows.groupBy("doc_part", "term").agg(
        F.sort_array(F.collect_list(F.struct("doc_idx", "tf", "dl"))).alias("pl")
    ).select(
        "doc_part", "term",
        F.transform("pl", lambda x: x["doc_idx"]).alias("docs"),
        F.transform("pl", lambda x: x["tf"]).alias("tfs"),
        F.transform("pl", lambda x: x["dl"]).alias("dls"),
    )

    pack = make_pack_udf()
    return grouped.select(
        "doc_part", "term", pack("docs", "tfs", "dls").alias("p")
    ).select("doc_part", "term", "p.*")


def term_stats_from_postings(postings: DataFrame, n_docs: int) -> DataFrame:
    """B12/B13: salted global term stats — stage 1 was the per-doc_part
    partial (df per (term, part)), stage 2 merges across parts."""
    return (
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    analyzer: str = "code",
    docs_per_part: int | None = None,
    id_col: str = "id",
    content_col: str = "content",
) -> InvertedIndex:
    """documents (id, content [, repo, path, lang]) → inverted index."""
    for c in ("repo", "path", "lang"):
        if c not in docs.columns:
            docs = docs.withColumn(c, F.lit(""))

    with_idx = assign_doc_ids(
        docs.select(id_col, content_col, "repo", "path", "lang"), id_col
    )

    tokened = tokenize_docs(with_idx, analyzer, id_col, content_col).persist()

    g = tokened.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 0.0)

    if docs_per_part is None:
        target_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
        docs_per_part = max(1024, math.ceil(n_docs / target_parts))

    doc_stats = doc_stats_from_tokened(tokened, docs_per_part, id_col)
    postings = postings_from_tokened(tokened, docs_per_part)
    term_stats = term_stats_from_postings(postings, n_docs)

    return InvertedIndex(
        postings=postings,
        doc_stats=doc_stats,
        term_stats=term_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        analyzer=analyzer,
        docs_per_part=docs_per_part,
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
