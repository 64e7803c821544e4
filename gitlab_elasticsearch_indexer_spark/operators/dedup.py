"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's operator set (its ES index dedups only by doc id);
these are the standard corpus-dedup family, all expressed Spark-first:

* exact dedup        — content-hash groupBy (one shuffle on the hash);
* MinHash + LSH      — shingle → H minhashes → banded buckets →
  candidate pairs via a self-join on (band, signature).  The minhash
  uses lexicographic md5 minima so the identical permutation family is
  expressible in ANSI SQL for the DuckDB oracle;
* n-gram Jaccard     — exact similarity on candidate (or blocked) pairs
  via explode + co-shingle join + group;
* SimHash            — 64-bit sign fingerprint via a vectorized Arrow
  kernel (near-dup = small Hamming distance);
* embedding cosine   — exact cosine over a pair blocking, JVM-native
  (`zip_with` + `aggregate`), no Python in the hot path.

Scale notes: every op is shuffle-bounded by its key (hash, band,
shingle, bucket).  The shingle join skews on hot shingles — mitigated
by dropping top-percentile-df shingles (standard practice), exposed as
``max_shingle_df``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# --------------------------------------------------------------------------
# exact dedup (hash groupBy)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (content_hash, keep_id, n_dups).

    keep_id is the minimum id of the group (deterministic canonical row).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct text."""
    keys = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keys, on=id_col, how="inner")


# --------------------------------------------------------------------------
# shingling


def with_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Word n-gram shingles (distinct per doc), all JVM-native."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty-array branch instead of a clamped upper bound
    shingles = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col).alias("id"), shingles.alias("shingles"))


# --------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """id → minhash_0..H-1; hash_i(s) = md5(i || ':' || s), min by string.

    A keyed cryptographic hash is a uniform pseudo-permutation per i, so
    the lexicographic minimum is a valid minhash; identical SQL exists
    in any engine with md5().
    """
    def mh(i: int):
        pre = F.lit(f"{i}:")
        return F.array_min(
            F.transform("shingles", lambda s: F.md5(F.concat(pre, s)))
        ).alias(f"mh{i}")

    # shingle-less docs carry no signal — excluding them keeps null
    # signatures from colliding in the band join
    return shingled.filter(F.size("shingles") > 0).select(
        "id", *[mh(i) for i in range(num_hashes)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH: docs sharing any band signature → (id_a < id_b) pairs.

    ``max_bucket_size`` caps the quadratic within-bucket expansion: a
    bucket of n identical/near-identical docs otherwise emits C(n,2)
    pairs (a single mega-bucket of 10^6 dupes → 5·10^11 rows).  Over
    the cap, a bucket is deterministically sub-split by id hash into
    ⌈n/cap⌉ sub-buckets — pairs inside sub-buckets survive, cross-sub
    pairs are dropped, and the dropped volume is LOGGED (never silent).
    Exact-duplicate groups should be collapsed by ``exact_duplicates``
    first, which is what makes the residual drop acceptable.
    """
    rows_per_band = num_hashes // bands
    band_frames = []
    for b in range(bands):
        sig = F.md5(
            F.concat_ws("|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])
        )
        band_frames.append(
            signatures.select(F.lit(b).alias("band"), sig.alias("sig"), "id")
        )
    banded = band_frames[0]
    for f in band_frames[1:]:
        banded = banded.unionAll(f)

    if max_bucket_size is not None:
        import logging
        import math

        sizes = banded.groupBy("band", "sig").agg(F.count("*").alias("_n"))
        big = sizes.filter(F.col("_n") > max_bucket_size).persist()
        stats = big.agg(
            F.count("*").alias("buckets"),
            F.sum((F.col("_n") * (F.col("_n") - 1) / 2)
                  - F.ceil(F.col("_n") / max_bucket_size)
                  * ((F.col("_n") / F.ceil(F.col("_n") / max_bucket_size))
                     * (F.col("_n") / F.ceil(F.col("_n") / max_bucket_size) - 1) / 2)
                  ).alias("dropped_est"),
        ).collect()[0]
        if stats["buckets"]:
            logging.getLogger(__name__).warning(
                "lsh_candidate_pairs: capped %d oversized bucket(s) at %d "
                "members; ~%d candidate pair(s) dropped by sub-splitting",
                stats["buckets"], max_bucket_size,
                int(math.ceil(stats["dropped_est"] or 0)),
            )
        banded = (
            banded.join(F.broadcast(big), ["band", "sig"], "left")
            .withColumn(
                "sig",
                F.when(
                    F.col("_n").isNotNull(),
                    F.concat(
                        F.col("sig"), F.lit("#"),
                        F.pmod(
                            F.xxhash64("id"),
                            F.ceil(F.col("_n") / max_bucket_size),
                        ).cast("string"),
                    ),
                ).otherwise(F.col("sig")),
            )
            .drop("_n")
        )

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, for candidate verification)


def jaccard_pairs(
    shingled: DataFrame,
    block_col_df: DataFrame | None = None,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over co-shingle pairs: (id_a, id_b, jaccard ≥ t).

    Pairs are generated by joining on shared shingles (docs with no
    common shingle can't pass any threshold > 0).  ``max_shingle_df``
    drops ubiquitous shingles before the join to kill skew.
    """
    sizes = shingled.select("id", F.size("shingles").alias("n_sh"))
    ex = shingled.select("id", F.explode("shingles").alias("sh"))
    if max_shingle_df is not None:
        hot = ex.groupBy("sh").count().filter(F.col("count") > max_shingle_df)
        ex = ex.join(F.broadcast(hot.select("sh")), "sh", "left_anti")
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


# --------------------------------------------------------------------------
# SimHash (vectorized Arrow kernel)


def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit simhash over lowercase whitespace tokens (tf-weighted).

    Vectorized per Arrow batch: the batch's token stream is factorized
    to a vocabulary, md5 runs ONCE per unique token (not per
    occurrence), and the per-doc ±1 bit accumulation is a single
    ``np.add.reduceat`` over the vocabulary's ±1 bit matrix gathered by
    token code — no per-token Python in the hot loop.
    """
    import hashlib

    tok_lists = [(t or "").lower().split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    out = np.zeros(len(tok_lists), dtype=np.int64)
    nonempty = np.flatnonzero(lens)
    if len(nonempty) == 0:
        return pd.Series(out)

    flat = [tok for toks in tok_lists for tok in toks]
    import pyarrow as pa

    from .index_build import _arrow_dict_encode

    # Arrow dictionary encode: C++ hashing of the token buffer (round 6,
    # same swap as the pack kernel) — NUL-safe with no pre-scan and
    # severalfold faster than the pandas factorize it replaces; codes
    # only feed the reduceat gather, so dictionary order is irrelevant
    codes, vocab = _arrow_dict_encode(pa.array(flat, type=pa.string()))
    # md5 per unique token; top-8 bytes big-endian, bit b = (h >> b) & 1
    hv = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            for t in vocab
        ),
        dtype=np.uint64,
        count=len(vocab),
    )
    bits_pm = (
        ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        .astype(np.int8) * 2 - 1
    ).astype(np.int32)  # (V, 64) of ±1

    starts = np.cumsum(lens) - lens
    acc = np.add.reduceat(bits_pm[codes], starts[nonempty], axis=0)  # (D+, 64)
    sig = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = sig.view(np.int64)
    return pd.Series(out)


simhash_udf = F.pandas_udf(_simhash64, LongType())


def simhash_fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ k, blocked on 16-bit chunks.

    Pigeonhole: two signatures within Hamming 3 share at least one of 4
    16-bit chunks exactly — join per chunk, then verify distance.
    """
    if max_hamming > 3:
        raise ValueError(
            "simhash_near_pairs: 4-chunk pigeonhole blocking is complete "
            f"only for max_hamming <= 3 (got {max_hamming})"
        )
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"c{c}")
        for c in range(4)
    ]
    keyed = fps.select("id", "simhash", *chunks)
    pairs = None
    for c in range(4):
        a, b = keyed.alias("a"), keyed.alias("b")
        p = (
            a.join(b, F.col(f"a.c{c}") == F.col(f"b.c{c}"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"),
            )
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# embedding cosine


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine near-dup pairs, blocked (default: same label).

    JVM-native: dot products via zip_with + aggregate, no Python.
    At scale the block column comes from LSH bucketing (see
    similarity.ann_lsh) — here any coarse partitioner works.
    """
    if block_col is None:
        raise ValueError(
            "cosine_pairs requires a block column: block_col=None would "
            "degenerate to an all-pairs cartesian join (use an LSH bucket "
            "or label column)"
        )
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col(block_col).alias("blk"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.vec"), F.col("b.vec"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", dot / (F.col("a.nrm") * F.col("b.nrm")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("cosine", 4).alias("cosine"),
        )
    )


def _norm(vec):
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


# --------------------------------------------------------------------------
# duplicate groups: connected components over candidate pairs


def dedup_groups(pairs: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Near-dup PAIRS → duplicate GROUPS: (id, group_id) with group_id =
    the minimum id of each connected component.

    This is the step a training pipeline actually needs after pair
    generation (keep one doc per component, not per pair).  Implemented
    as alternating large-star / small-star label propagation — the
    standard MapReduce connected-components algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): each
    round is two shuffles keyed by vertex, converging in
    O(log^2 n) rounds on any graph and ~2-4 rounds on the short, fat
    components dedup produces.  No driver-side graph state: the only
    collect is the per-round convergence check (a count).

    Convergence detection uses the label-sum invariant (sum strictly
    decreases while labels move; equal sums two rounds in a row with
    unchanged count means fixed point — checked exactly via a join).
    """
    # localCheckpoint (not persist): iterative self-referential plans
    # grow super-linearly in analysis cost per round — checkpointing
    # materializes the partitions AND truncates the logical plan, the
    # standard treatment for iterative DataFrame algorithms.  It also
    # pins the edge list so rounds don't re-run the (potentially
    # expensive) upstream pair-generation lineage.
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # label(v) starts as v; edges are (u, v) with labels folded in
    labels = (
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        lab_u = labels.select(F.col("id").alias("u"), F.col("label").alias("lu"))
        lab_v = labels.select(F.col("id").alias("v"), F.col("label").alias("lv"))
        both = edges.join(lab_u, "u").join(lab_v, "v")
        # propagate: every endpoint adopts the min label seen across its
        # incident edges (one round of min-label propagation = combined
        # small-star/large-star step for label graphs)
        prop = (
            both.select(F.col("u").alias("id"), F.least("lu", "lv").alias("cand"))
            .unionByName(
                both.select(F.col("v").alias("id"), F.least("lu", "lv").alias("cand"))
            )
            .groupBy("id")
            .agg(F.min("cand").alias("new_label"))
        )
        updated = labels.join(prop, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("new_label", "label")).alias("label"),
        )
        # pointer-jumping: chase labels one hop (label ← label(label))
        # so chains collapse logarithmically instead of linearly
        hop = updated.select(F.col("id").alias("label"), F.col("label").alias("ll"))
        jumped = (
            updated.join(hop, "label", "left")
            .select("id", F.least(F.col("label"), F.coalesce("ll", "label")).alias("label"))
            .localCheckpoint(eager=True)  # truncate the iterative plan
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("group_id"))


def dedup_keep_canonical(
    docs: DataFrame,
    groups: DataFrame,
    id_col: str = "id",
    order_col: str | None = None,
) -> DataFrame:
    """The step AFTER :func:`dedup_groups` in a training pipeline: keep
    ONE canonical representative per duplicate group plus every
    never-paired doc, dropping the rest of each cluster.

    ``groups`` is the (id, group_id) output of :func:`dedup_groups`;
    docs absent from it (singletons that never produced a candidate
    pair) keep their own id as ``group_id`` and always survive.
    ``order_col`` ranks docs within a group DESCENDING (a quality
    score, token count, text length — "keep the best copy"); ties and
    the default fall back to ascending id, so selection is
    deterministic under any partitioning.

    Returns the input rows (plus ``group_id``) minus non-canonical
    duplicates.

    Scale: one equi-join on the id (groups carries only ever-paired
    docs — typically a few percent of the corpus — so Spark/AQE
    broadcasts it when small) and ONE window shuffle keyed by group_id;
    group sizes are duplicate-cluster sizes, so no skewed giant
    partitions, and nothing collects to the driver.
    """
    from pyspark.sql.window import Window

    g = groups.select(F.col("id").alias(id_col), "group_id")
    joined = docs.join(g, id_col, "left").withColumn(
        "group_id", F.coalesce("group_id", F.col(id_col))
    )
    order = [F.col(id_col).asc()]
    if order_col is not None:
        order.insert(0, F.col(order_col).desc())
    w = Window.partitionBy("group_id").orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
