"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: one JVM-native pass
  (zip_with/aggregate dot products), per-partition top-k via the global
  sort-limit (Spark's TakeOrdered);
* LSH-bucketed ANN — the scale path: sign-random-projection buckets
  from a deterministic hyperplane matrix (derived from md5 bits so the
  same planes are expressible in SQL); probes the query's bucket (and
  optionally multi-probe neighbors), then exact cosine re-rank.

At 100 TB the brute force is a full scan per query; the LSH variant
prunes to ~1/2^P of the data per probe with the bucket as a partition
key (parquet partition pruning does the skip).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(vec):
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def _dot_lit(vec, qvec: list[float]):
    """dot(vec, literal query vector) — JVM-native fold."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(vec, q, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = emb.select(
        F.col(id_col).alias("id"),
        (
            _dot_lit(F.col(vec_col), query_vec) / (_norm(F.col(vec_col)) * F.lit(qn))
        ).alias("cosine"),
    )
    return (
        scored.orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
        .select("id", F.round("cosine", 4).alias("cosine"))
    )


def hyperplanes(dim: int, n_planes: int = 8) -> np.ndarray:
    """Deterministic ±1 hyperplane matrix from md5 bits (shared w/ SQL)."""
    planes = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        bits = []
        i = 0
        while len(bits) < dim:
            h = hashlib.md5(f"plane{p}:{i}".encode()).digest()
            for byte in h:
                for b in range(8):
                    bits.append(1.0 if (byte >> b) & 1 else -1.0)
            i += 1
        planes[p] = bits[:dim]
    return planes


def lsh_bucket_expr(vec_col, planes: np.ndarray):
    """Bucket id = bits of sign(plane · vec), as a native column expr."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        dot = _dot_lit(vec_col, plane.tolist())
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


@dataclass
class IVFIndex:
    """Prebuilt IVF artifacts: the ``ivf_list``-assigned vector table
    (partitioned by list when loaded from disk) + the centroid matrix."""

    lists: DataFrame
    centroids: np.ndarray
    id_col: str = "vec_id"
    vec_col: str = "embedding"


def build_ivf(
    emb: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> IVFIndex:
    """IVF coarse quantizer: seeded KMeans centroids + per-row list id.

    This is the OFFLINE training job — run once per corpus, never per
    query (persist with :func:`save_ivf`).  At scale ``ivf_list`` is
    the partition column: a probe reads only n_probe/n_lists of the
    data via parquet partition pruning.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_lists, seed=seed, maxIter=10, featuresCol="_features",
        predictionCol="ivf_list",
    ).fit(feats)
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    assigned = model.transform(feats).drop("_features")
    return IVFIndex(lists=assigned, centroids=centroids,
                    id_col=id_col, vec_col=vec_col)


def save_ivf(ivf: IVFIndex, path: str) -> None:
    """Persist the IVF index: list-partitioned vectors + centroid table."""
    spark = ivf.lists.sparkSession
    ivf.lists.write.mode("overwrite").partitionBy("ivf_list").parquet(
        f"{path}/lists"
    )
    spark.createDataFrame(
        [(i, c.tolist()) for i, c in enumerate(ivf.centroids)],
        "ivf_list int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [(ivf.id_col, ivf.vec_col)], "id_col string, vec_col string"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def load_ivf(spark, path: str) -> IVFIndex:
    cent_rows = spark.read.parquet(f"{path}/centroids").orderBy("ivf_list").collect()
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return IVFIndex(
        lists=spark.read.parquet(f"{path}/lists"),
        centroids=np.array([r["centroid"] for r in cent_rows], dtype=np.float64),
        id_col=meta["id_col"],
        vec_col=meta["vec_col"],
    )


def ann_ivf_topk(
    ivf: IVFIndex,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN probe against a PREBUILT index: nearest-centroid ranking
    happens driver-side on the tiny centroid matrix, the scan touches
    only the n_probe matching ``ivf_list`` partitions (partition
    pruning on a saved index), and the survivors get an exact cosine
    re-rank."""
    qv = np.asarray(query_vec, dtype=np.float64)
    d2 = ((ivf.centroids - qv) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d2)[:n_probe]]
    cand = ivf.lists.filter(F.col("ivf_list").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=ivf.id_col, vec_col=ivf.vec_col)


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: probe the query's sign-LSH bucket, exact re-rank.

    ``multiprobe`` additionally probes buckets at Hamming distance 1 in
    the ``multiprobe`` lowest plane bits (recall/cost dial).
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for p in range(n_planes):
        if float(planes[p] @ qv) > 0:
            qbucket |= 1 << p
    probes = [qbucket] + [qbucket ^ (1 << p) for p in range(multiprobe)]

    bucketed = emb.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)
