import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gitlab_elasticsearch_indexer_spark.functions.codecs import (
    block_stats,
    delta_decode,
    delta_encode,
    pack_postings,
    unpack_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**14, 2**21 - 1, 2**35, 2**63], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_is_compact():
    small = np.arange(1000, dtype=np.uint64) % 100
    assert len(varint_encode(small)) == 1000  # all < 128 → 1 byte each


def test_delta_roundtrip():
    ids = np.array([3, 7, 8, 100, 100000], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_pack_unpack_postings():
    docs = np.array([1, 5, 6, 900, 100000], dtype=np.uint64)
    tfs = np.array([2, 1, 7, 1, 3], dtype=np.uint64)
    dls = np.array([10, 20, 30, 40, 50], dtype=np.uint64)
    d, t, l = unpack_postings(*pack_postings(docs, tfs, dls))
    assert np.array_equal(d, docs) and np.array_equal(t, tfs) and np.array_equal(l, dls)


def test_block_stats():
    n = 300
    docs = np.arange(n, dtype=np.int64) * 2
    tfs = np.arange(1, n + 1, dtype=np.int64)
    dls = np.arange(n, 0, -1, dtype=np.int64)
    last, bmax_tf, bmin_dl = block_stats(docs, tfs, dls, block=128)
    assert len(last) == 3 == len(bmax_tf) == len(bmin_dl)
    assert last[0] == docs[127] and last[-1] == docs[-1]
    assert bmax_tf[0] == tfs[127] and bmax_tf[-1] == tfs[-1]
    assert bmin_dl[0] == dls[127] and bmin_dl[-1] == dls[-1]


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.integers(min_value=1, max_value=12))
def test_pack_partition_property(seed, n_terms):
    """The whole-partition vectorized pack must round-trip every term run
    (delta reset at boundaries, block metadata from reduceat)."""
    from gitlab_elasticsearch_indexer_spark.functions.codecs import (
        block_stats,
        pack_partition,
        unpack_postings,
    )

    rng = np.random.default_rng(seed)
    starts, docs, tfs, dls = [], [], [], []
    pos = 0
    for _ in range(n_terms):
        n = int(rng.integers(1, 400))
        starts.append(pos)
        docs.append(np.sort(rng.choice(10_000, size=n, replace=False)))
        tfs.append(rng.integers(1, 100, size=n))
        dls.append(rng.integers(1, 5_000, size=n))
        pos += n
    docs_a = np.concatenate(docs); tfs_a = np.concatenate(tfs); dls_a = np.concatenate(dls)
    packed = pack_partition(np.array(starts), docs_a, tfs_a, dls_a)
    for i in range(n_terms):
        d, t, l = unpack_postings(
            packed["docs_bin"][i], packed["tfs_bin"][i], packed["dls_bin"][i]
        )
        assert np.array_equal(d.astype(np.int64), docs[i])
        assert np.array_equal(t.astype(np.int64), tfs[i])
        assert np.array_equal(l.astype(np.int64), dls[i])
        assert packed["df"][i] == len(docs[i])
        assert packed["cf"][i] == int(tfs[i].sum())
        assert packed["max_tf"][i] == int(tfs[i].max())
        assert packed["min_dl"][i] == int(dls[i].min())
        last, bmax, bmin = block_stats(docs[i], tfs[i], dls[i])
        assert packed["block_last"][i] == last.tolist()
        assert packed["block_max_tf"][i] == bmax.tolist()
        assert packed["block_min_dl"][i] == bmin.tolist()


def test_python_xxhash64_matches_spark(spark):
    """The driver-side bucket computation (idf lookup pruning) must be
    bit-identical to the JVM xxhash64 the term_stats writer partitions
    by — a silent divergence would make lookups miss their buckets."""
    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.functions.hashing import (
        term_bucket_py,
        xxhash64,
    )
    from gitlab_elasticsearch_indexer_spark.operators.index_build import (
        TERM_BUCKETS,
    )

    terms = ["if", "return", "getuserbyid", "a", "zz", "ab_cd.e", "x" * 7,
             "y" * 8, "q" * 31, "r" * 32, "s" * 100, "日本語", "naïve"]
    rows = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(TERM_BUCKETS)).alias("b"),
    ).collect()
    for r in rows:
        h = xxhash64(r["term"].encode("utf-8"))
        signed = h - (1 << 64) if h >= (1 << 63) else h
        assert signed == r["h"], r["term"]
        assert term_bucket_py(r["term"], TERM_BUCKETS) == r["b"], r["term"]
