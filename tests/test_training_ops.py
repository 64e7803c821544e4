"""Tests for the training-data pipeline operators (dedup, similarity,
text stats, multimodal plumbing) on the driver's sf0.001 tables."""

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gitlab_elasticsearch_indexer_spark.operators import dedup, similarity
from gitlab_elasticsearch_indexer_spark.functions import textstats
from gitlab_elasticsearch_indexer_spark.sources import multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    # add exact + near duplicates deterministically
    dups = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = d.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit(" extra tail token")).alias("text"),
        "lang", "source", "n_chars",
    )
    return d.unionAll(dups).unionAll(near).persist()


@pytest.fixture(scope="session")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_exact_dedup(docs):
    base = docs.count()
    deduped = dedup.dedup_exact(docs)
    n_dup_sources = docs.filter((F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100000)).count()
    assert deduped.count() == base - n_dup_sources
    # canonical keeps the min id
    groups = dedup.exact_duplicates(docs).filter(F.col("n_dups") > 1).collect()
    assert groups and all(g["keep_id"] < 100000 for g in groups)


def test_minhash_lsh_finds_exact_and_near_dups(docs):
    sh = dedup.with_shingles(docs)
    sig = dedup.minhash_signatures(sh, num_hashes=16)
    pairs = dedup.lsh_candidate_pairs(sig, num_hashes=16, bands=4).collect()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    # every exact duplicate pair must be a candidate (identical signatures)
    exact_expected = {
        (i, i + 100000) for i in range(0, 50, 10)
    }
    assert exact_expected <= got, got
    # near-dups (one extra shingle) should mostly collide too
    near_hits = sum(1 for i in range(5, 50, 10) if (i, i + 200000) in got)
    assert near_hits >= 3


def test_jaccard_pairs(docs):
    sh = dedup.with_shingles(docs)
    pairs = dedup.jaccard_pairs(sh, threshold=0.8).collect()
    d = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    for i in range(0, 50, 10):
        assert d.get((i, i + 100000)) == 1.0  # exact dup → jaccard 1
    for i in range(5, 50, 10):
        j = d.get((i, i + 200000))
        assert j is not None and 0.8 <= j < 1.0


def test_simhash(docs, spark):
    fps = dedup.simhash_fingerprints(docs)
    vals = {r["id"]: r["simhash"] for r in fps.collect()}
    for i in range(0, 50, 10):
        assert vals[i] == vals[i + 100000]  # identical text → identical simhash
    pairs = dedup.simhash_near_pairs(fps, max_hamming=3).collect()
    got = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
    for i in range(0, 50, 10):
        assert got.get((i, i + 100000)) == 0


def test_cosine_pairs_blocked(emb):
    pairs = dedup.cosine_pairs(emb, threshold=0.999).collect()
    for p in pairs:
        assert p["cosine"] >= 0.999


def test_cosine_topk_matches_numpy(emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
    }
    exp = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = similarity.cosine_topk(emb, q.tolist(), k=5).collect()
    assert [r["id"] for r in got] == [e[0] for e in exp]
    assert np.allclose([r["cosine"] for r in got], [round(e[1], 4) for e in exp], atol=1e-4)


def test_ann_lsh_recall(emb):
    rows = emb.collect()
    q = list(rows[7]["embedding"])
    exact = [r["id"] for r in similarity.cosine_topk(emb, q, k=10).collect()]
    # 50 vectors → keep the bucket space coarse (4 buckets, probe 2)
    approx = [r["id"] for r in similarity.ann_lsh_topk(emb, q, k=10, n_planes=2,
                                                       multiprobe=1).collect()]
    # the query's own vector must be found, and recall should be nontrivial
    assert rows[7]["vec_id"] in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, (recall, exact, approx)


def test_token_counts(docs, spark):
    got = {r["id"]: (r["ws_tokens"], r["bpe_tokens"])
           for r in textstats.token_counts(docs).collect()}
    sample = docs.filter(F.col("doc_id") == 1).collect()[0]
    import regex as re
    exp_ws = len([t for t in sample["text"].split() if t])
    exp_bpe = len(re.findall(textstats.BPE_ISH, sample["text"]))
    assert got[1] == (exp_ws, exp_bpe)


def test_quality_scores(docs):
    rows = textstats.quality_scores(docs).collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["distinct_ratio"] <= 1.0


def test_langid_deterministic(docs):
    rows = textstats.langid(docs).collect()
    assert all(r["pred_lang"] in {"en", "de", "fr", "es", "unknown"} for r in rows)


def test_fingerprints(docs):
    fp = {r["id"]: r["fingerprint"] for r in textstats.fingerprint_md5(docs).collect()}
    for i in range(0, 50, 10):
        assert fp[i] == fp[i + 100000]
    rh = {r["id"]: r["rhash"] for r in textstats.fingerprint_rolling(docs).collect()}
    # matches a pure-python reference
    sample = docs.filter(F.col("doc_id") == 2).collect()[0]["text"]
    MOD, BASE = (1 << 61) - 1, 1000003
    h = 0
    for c in sample.encode():
        h = (h * BASE + c) % MOD
    assert rh[2] == h


def test_rolling_hash_large_doc_no_wrap():
    """Docs past ~2^24 bytes used to wrap the uint64 partial sum of the
    byte*p_lo addend.  Verify a 20 MB doc against the compositional
    identity h(a||b) = h(a)*BASE^len(b) + h(b) (mod M), evaluated over
    sub-1MiB chunks (the independently-proven regime)."""
    import pandas as pd

    from gitlab_elasticsearch_indexer_spark.functions.textstats import (
        _rolling_hash,
    )

    rng = np.random.default_rng(7)
    big = bytes(rng.integers(32, 127, size=20_000_000, dtype=np.uint8)).decode(
        "ascii"
    )
    direct = int(_rolling_hash(pd.Series([big])).iloc[0])

    MOD, BASE = (1 << 61) - 1, 1000003
    CH = 1 << 19  # 512 KiB chunks — well inside the proven bound
    chunks = [big[i : i + CH] for i in range(0, len(big), CH)]
    hashes = _rolling_hash(pd.Series(chunks)).tolist()
    h = 0
    for ch, hc in zip(chunks, hashes):
        h = (h * pow(BASE, len(ch), MOD) + int(hc)) % MOD
    assert direct == h


def test_multimodal_plumbing(docs, spark):
    media = multimodal.synth_media(docs)
    meta = {r["id"]: (r["kind"], r["n_bytes"], r["magic"])
            for r in multimodal.media_metadata(media).collect()}
    sample = docs.filter(F.col("doc_id") == 3).collect()[0]
    raw = sample["text"].encode()
    assert meta[3] == ("image", len(raw), raw[:4].hex())

    feats = multimodal.decode_features(media, deterministic_fake=True).collect()
    by_id = {r["id"]: r["features"] for r in feats}
    exp = (np.frombuffer(hashlib.md5(raw).digest()[:8], dtype=np.uint8) / 255.0)
    assert np.allclose(by_id[3], exp.astype(np.float32))

    frames = multimodal.sample_frames(media, frame_bytes=64, stride=2).collect()
    assert frames  # some docs are 'video'
    vid_ids = {r["id"] for r in frames}
    assert all(i % 3 == 2 for i in vid_ids)

    # compressed-codec decode path is stubbed: must raise cleanly
    import pytest as _pt
    from py4j.protocol import Py4JJavaError
    with _pt.raises(Exception) as ei:
        multimodal.decode_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_ppm_and_wav_decoders_golden():
    """Pure-kernel goldens: hand-built binary-PPM and PCM16-WAV payloads
    decode to their known dimensions and statistics."""
    # 2x2 P6: pixels 0..11
    ppm = b"P6\n2 2\n255\n" + bytes(range(12))
    w, h, px = multimodal._decode_ppm(ppm)
    assert (w, h) == (2, 2)
    assert px.tolist() == list(range(12))
    # whitespace-variant header parses too
    w2, h2, px2 = multimodal._decode_ppm(b"P6 2\t2  255\n" + bytes(range(12)))
    assert (w2, h2) == (2, 2) and px2.tolist() == px.tolist()

    samples = np.array([0, 1000, -1000, 32767, -32768], dtype="<i2")
    wav = multimodal._wav_container(samples.tobytes(), rate=8000)
    rate, got = multimodal._decode_wav(wav)
    assert rate == 8000 and got.tolist() == samples.tolist()
    # odd-sized chunk before data: 2-byte RIFF alignment honored
    odd = (wav[:12] + b"junk" + (3).to_bytes(4, "little") + b"abc\x00"
           + wav[12:])
    rate2, got2 = multimodal._decode_wav(odd)
    assert rate2 == 8000 and got2.tolist() == samples.tolist()

    import pytest as _pt
    with _pt.raises(NotImplementedError):  # stereo → honest stub boundary
        stereo = multimodal._wav_container(samples.tobytes(), rate=8000)
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        multimodal._decode_wav(
            stereo[:16] + struct.pack("<I", len(fmt)) + fmt
            + stereo[16 + 4 + 16:]
        )


def test_synth_real_media_decodes_to_generator_truth(spark, docs):
    """End-to-end: generated REAL payloads → decode_media recovers the
    closed-form generator's dimensions and statistics exactly."""
    media = multimodal.synth_real_media(docs.select("doc_id"))
    rows = {r["id"]: r for r in multimodal.decode_media(media).collect()}
    assert rows  # both modalities present
    for i, r in rows.items():
        if r["kind"] == "image":
            w, h = 16 + i % 16, 8 + i % 8
            v = (i * 31 + np.arange(3 * w * h, dtype=np.int64) * 7) % 256
            assert (r["width"], r["height"]) == (w, h)
        elif r["kind"] == "audio":
            n = 256 + i % 256
            v = ((i * 13 + np.arange(n, dtype=np.int64) * 5) % 65536) - 32768
            assert (r["rate"], r["n_samples"]) == (8000, n)
        else:  # AVI/MJPEG: constant (id, frame, tile) generator
            bw, bh, nf = 2 + i % 3, 1 + i % 2, 1 + i % 4
            v = np.array([
                (i * 37 + f * 53 + t * 11) % 256
                for f in range(nf) for t in range(bw * bh)
            ], dtype=np.int64)
            assert (r["width"], r["height"]) == (8 * bw, 8 * bh)
            assert r["n_samples"] == nf
        v = v.astype(np.float64)
        assert abs(r["mean"] - v.mean()) < 1e-9
        assert abs(r["rms"] - np.sqrt((v * v).mean())) < 1e-9
    kinds = {r["kind"] for r in rows.values()}
    assert kinds == {"image", "audio", "video"}  # all three decode for real


def test_ann_ivf_recall(emb, spark, tmp_path):
    """Probe a PERSISTED IVF index (built offline, loaded back) and
    assert recall vs the exact scorer plus list-partition pruning."""
    path = str(tmp_path / "ivf")
    similarity.save_ivf(similarity.build_ivf(emb, n_lists=8), path)
    ivf = similarity.load_ivf(spark, path)

    rows = emb.collect()
    q = list(rows[3]["embedding"])
    exact = [r["id"] for r in similarity.cosine_topk(emb, q, k=10).collect()]
    approx = [r["id"] for r in similarity.ann_ivf_topk(ivf, q, k=10,
                                                       n_probe=3).collect()]
    assert rows[3]["vec_id"] in approx  # the query's own vector is found
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)

    # a probe must scan only n_probe of the 8 list partitions
    qv = __import__("numpy").asarray(q)
    d2 = ((ivf.centroids - qv) ** 2).sum(axis=1)
    probes = [int(i) for i in d2.argsort()[:3]]
    cand = ivf.lists.filter(F.col("ivf_list").isin(probes))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_list" in plan
    touched = {r["ivf_list"] for r in cand.select("ivf_list").distinct().collect()}
    assert touched <= set(probes) and len(touched) <= 3


def test_lsh_mega_bucket_cap(spark, caplog):
    """A bucket of near-identical docs must not explode quadratically:
    over max_bucket_size it is sub-split (pairs bounded) and the dropped
    volume is logged, never silent."""
    import logging

    docs = spark.createDataFrame(
        [(i, "identical text body repeated tokens here now") for i in range(40)]
        + [(1000, "a completely different document about other things entirely")],
        "doc_id long, text string",
    )
    sh = dedup.with_shingles(docs, text_col="text", id_col="doc_id")
    sig = dedup.minhash_signatures(sh, num_hashes=8)

    uncapped = dedup.lsh_candidate_pairs(sig, num_hashes=8, bands=4).count()
    assert uncapped == 40 * 39 // 2

    with caplog.at_level(logging.WARNING):
        capped = dedup.lsh_candidate_pairs(
            sig, num_hashes=8, bands=4, max_bucket_size=10
        ).count()
    assert capped < uncapped
    # every surviving pair is genuine; drop is logged with an estimate
    assert any("dropped" in r.message for r in caplog.records)


def test_dedup_groups_connected_components(spark, docs):
    """Pairs → components: exact dups + near dups of one source doc must
    land in one group labeled by the minimum id; chains collapse."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
        + [(i, i + 1) for i in range(30, 35)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["group_id"] for r in dedup.dedup_groups(pairs).collect()}
    assert got == {
        **{i: 1 for i in (1, 2, 3, 4)},
        **{i: 10 for i in (10, 11, 12)},
        20: 20, 21: 20,
        **{i: 30 for i in range(30, 36)},
    }

    # real pipeline shape: LSH pairs over the dup-seeded corpus — every
    # exact-dup pair (i, i+100000) must share a group rooted at i
    sh = dedup.with_shingles(docs)
    sig = dedup.minhash_signatures(sh, num_hashes=16)
    cand = dedup.lsh_candidate_pairs(sig, num_hashes=16, bands=4)
    groups = {r["id"]: r["group_id"] for r in dedup.dedup_groups(cand).collect()}
    for i in range(0, 50, 10):
        assert groups[i + 100000] == groups[i] <= i


def test_dedup_keep_canonical(spark):
    """Keep ONE representative per component: order_col desc picks the
    'best' copy, ties fall to min id; never-paired docs all survive
    with their own id as group_id."""
    corpus = spark.createDataFrame(
        [(1, "short", 5.0), (2, "longer text", 9.0), (3, "longer", 9.0),
         (10, "solo a", 1.0), (11, "solo b", 2.0), (20, "x", 0.0),
         (21, "y", 3.0)],
        "id long, text string, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (20, 21)], "id_a long, id_b long"
    )
    groups = dedup.dedup_groups(pairs)

    kept = {r["id"]: r["group_id"]
            for r in dedup.dedup_keep_canonical(
                corpus, groups, order_col="quality").collect()}
    # {1,2,3}: quality ties at 9.0 for ids 2,3 → min id 2; {20,21}: 21
    assert kept == {2: 1, 10: 10, 11: 11, 21: 20}

    # default order: min id per group
    kept_min = {r["id"] for r in
                dedup.dedup_keep_canonical(corpus, groups).collect()}
    assert kept_min == {1, 10, 11, 20}

    # a non-"id" id column joins correctly
    corpus2 = corpus.withColumnRenamed("id", "doc_id")
    kept2 = {r["doc_id"] for r in dedup.dedup_keep_canonical(
        corpus2, groups, id_col="doc_id", order_col="quality").collect()}
    assert kept2 == {2, 10, 11, 21}


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@ex-a.co.uk now"),
         (2, "srv at 10.0.255.5 and 1.2.3.4"),
         (3, "key deadbeefdeadbeefdeadbeefdeadbeef end"),
         (4, "clean text only 1.2 not.an.ip"),
         (5, "a@b.io 127.0.0.1 " + "ab" * 20)],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in textstats.redact_pii(df).collect()}
    assert got[1]["redacted"] == "mail <EMAIL> now"
    assert got[2]["redacted"] == "srv at <IP> and <IP>" and got[2]["n_ips"] == 2
    assert got[3]["redacted"] == "key <HEX> end" and got[3]["n_secrets"] == 1
    assert got[4]["redacted"] == "clean text only 1.2 not.an.ip"
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_secrets"]) == (0, 0, 0)
    assert got[5]["redacted"] == "<EMAIL> <IP> <HEX>"


def test_png_codec_all_filters_roundtrip():
    """PNG decode (stdlib zlib + numpy): filter 0 is trivially correct
    (raw scanlines ARE the pixels, pinning the chunk walk + inflate);
    every other filter type must decode to the same image, pinning each
    unfilter branch independently; mixed per-row filters too."""
    import numpy as np

    from gitlab_elasticsearch_indexer_spark.sources import multimodal

    for ch in (1, 3, 4):
        w, h = 20, 11
        px = ((7 + np.arange(ch * w * h) * 13) % 256).astype(np.uint8)
        ref = multimodal._decode_png(
            multimodal._encode_png(px, w, h, ch, lambda y: 0))
        assert ref[:3] == (w, h, ch) and np.array_equal(ref[3], px)
        for ft in range(1, 5):
            got = multimodal._decode_png(
                multimodal._encode_png(px, w, h, ch, lambda y, ft=ft: ft))
            assert np.array_equal(got[3], px), (ch, ft)
        mixed = multimodal._decode_png(
            multimodal._encode_png(px, w, h, ch, lambda y: y % 5))
        assert np.array_equal(mixed[3], px), ch


def test_synth_png_media_decodes_through_spark(spark, docs):
    """The PNG path end-to-end on the distributed surface: synthesized
    compressed payloads decode to the closed-form generator stats."""
    import numpy as np

    from gitlab_elasticsearch_indexer_spark.sources import multimodal

    media = multimodal.synth_png_media(docs.select("doc_id").limit(60))
    rows = {r["id"]: r for r in multimodal.decode_media(media).collect()}
    assert len(rows) == 60
    for i, r in rows.items():
        w, h = 16 + i % 16, 8 + i % 8
        ch = (1, 3, 4)[i % 3]
        v = ((i * 31 + np.arange(ch * w * h, dtype=np.int64) * 7) % 256
             ).astype(np.float64)
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean"] - v.mean()) < 1e-9
        assert abs(r["rms"] - np.sqrt((v * v).mean())) < 1e-9


def test_jpeg_codec_dc_exact_and_lossy_paths():
    """Baseline-JPEG codec (pure numpy): constant 8x8 tiles are DC-only
    and must roundtrip BIT-EXACTLY (DCT of constant c is 8c; DC quant
    step is 8) — pinning markers, Huffman, DPCM, byte stuffing, zigzag,
    dequant and IDCT end-to-end.  A dense image exercises the AC path
    (run lengths, ZRL, EOB) and must stay within the quantization error
    bound."""
    import numpy as np

    from gitlab_elasticsearch_indexer_spark.sources import multimodal as mm

    rng = np.random.default_rng(11)
    bw, bh = 5, 3
    tiles = rng.integers(0, 256, bw * bh, dtype=np.int64).astype(np.uint8)
    img = np.repeat(np.repeat(tiles.reshape(bh, bw), 8, 0), 8, 1)
    raw = mm._encode_jpeg_gray(img.reshape(-1), 8 * bw, 8 * bh)
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    w, h, px = mm._decode_jpeg_gray(raw)
    assert (w, h) == (8 * bw, 8 * bh)
    assert np.array_equal(px, img.reshape(-1))

    # dense image: lossy, bounded by the AC quant step (16) per coeff
    img2 = rng.integers(0, 256, (16, 24), dtype=np.int64).astype(np.uint8)
    raw2 = mm._encode_jpeg_gray(img2.reshape(-1), 24, 16)
    _, _, px2 = mm._decode_jpeg_gray(raw2)
    err = np.abs(px2.astype(float) - img2.reshape(-1).astype(float))
    assert err.mean() < 40 and err.max() < 160

    # non-multiple-of-8 dims are the documented boundary
    import pytest

    with pytest.raises(NotImplementedError):
        mm._encode_jpeg_gray(np.zeros(35, np.uint8), 7, 5)


def test_synth_jpeg_media_decodes_through_spark(spark, docs):
    """JPEG end-to-end on the distributed surface: genuine entropy-coded
    streams decode to the closed-form tile generator stats."""
    import numpy as np

    from gitlab_elasticsearch_indexer_spark.sources import multimodal as mm

    media = mm.synth_jpeg_media(docs.select("doc_id").limit(60))
    rows = {r["id"]: r for r in mm.decode_media(media).collect()}
    assert len(rows) == 60
    for i, r in rows.items():
        bw, bh = 2 + i % 3, 1 + i % 2
        v = ((i * 37 + np.arange(bw * bh, dtype=np.int64) * 11) % 256
             ).astype(np.float64)
        assert (r["width"], r["height"]) == (8 * bw, 8 * bh)
        assert abs(r["mean"] - v.mean()) < 1e-9
        assert abs(r["rms"] - np.sqrt((v * v).mean())) < 1e-9


def test_avi_mjpeg_round_trip_kernel():
    """Pure-kernel AVI: writer → walker round-trips frames bit-exactly,
    honors word alignment for odd-length frame bodies, and rejects
    non-RIFF payloads at the honest boundary."""
    import numpy as np
    import pytest as _pt

    from gitlab_elasticsearch_indexer_spark.sources import multimodal as mm

    frames, expect = [], []
    for f in range(3):
        tiles = ((f * 53 + np.arange(2, dtype=np.int64) * 11) % 256
                 ).astype(np.uint8)
        img = np.repeat(np.repeat(tiles.reshape(1, 2), 8, axis=0), 8, axis=1)
        frames.append(mm._encode_jpeg_gray(img.reshape(-1), 16, 8))
        expect.append(img.reshape(-1))
    raw = mm._encode_avi_mjpeg(frames, 16, 8)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    w, h, nf, px = mm._decode_avi_mjpeg(raw)
    assert (w, h, nf) == (16, 8, 3)
    assert np.array_equal(px, np.concatenate(expect))

    # odd-length movi chunk bodies stay word-aligned through the walk
    odd = b"\xff\xd8" + b"x" * 7
    _, _, n, fr = mm._walk_avi(mm._encode_avi_mjpeg([odd, odd], 8, 8))
    assert n == 2 and fr == [odd, odd]

    with _pt.raises(NotImplementedError):
        mm._walk_avi(b"MP4\x00" + b"\x00" * 64)


def test_avi_video_decodes_through_spark(spark, docs):
    """Video end-to-end on the distributed surface: synth_real_media's
    AVI payloads decode through the RIFF walk + per-frame JPEG path to
    the closed-form (id, frame, tile) generator stats, and
    sample_frames walks REAL frame boundaries (stride over movi
    chunks), each sampled frame decoding standalone."""
    import numpy as np

    from gitlab_elasticsearch_indexer_spark.sources import multimodal as mm

    media = mm.synth_real_media(docs.select("doc_id").limit(90))
    vids = {r["id"]: r for r in mm.decode_media(media).collect()
            if r["kind"] == "video"}
    assert len(vids) == 30
    for i, r in vids.items():
        bw, bh, nf = 2 + i % 3, 1 + i % 2, 1 + i % 4
        v = np.array([
            (i * 37 + f * 53 + t * 11) % 256
            for f in range(nf) for t in range(bw * bh)
        ], dtype=np.float64)
        assert (r["width"], r["height"]) == (8 * bw, 8 * bh)
        assert r["n_samples"] == nf
        assert abs(r["mean"] - v.mean()) < 1e-9
        assert abs(r["rms"] - np.sqrt((v * v).mean())) < 1e-9

    frames = mm.sample_frames(media, stride=2)
    decoded = mm.decode_frames(frames).collect()
    by_id: dict = {}
    for r in decoded:
        by_id.setdefault(r["id"], []).append(r)
    for i, rs in by_id.items():
        nf = 1 + i % 4
        assert sorted(r["frame_no"] for r in rs) == list(range(0, nf, 2))
        for r in rs:
            bw, bh = 2 + i % 3, 1 + i % 2
            v = np.array([(i * 37 + r["frame_no"] * 53 + t * 11) % 256
                          for t in range(bw * bh)], dtype=np.float64)
            assert abs(r["mean"] - v.mean()) < 1e-9


# --------------------------------------------------------------------------
# composite curation pipeline (operators/training.py)

def test_curate_training_set_crafted(spark):
    from gitlab_elasticsearch_indexer_spark.operators import training as tr

    good = (
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for running code in the sun with many distinct tokens around here"
    )
    rows = [
        (1, good),                                  # canonical winner (lowest id)
        (2, "  " + good.upper() + "  "),            # ws/case variant → same fingerprint
        (3, good + " entirely different tail that changes the fingerprint"),
        (4, "xx " * 60),                            # repetitive → distinct_ratio ≈ 0
        (5, "der die das und ist nicht ein mit zu auf " * 5),  # German, decent quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tr.curate_training_set(docs, min_quality=0.5, langs=["de", "en", "es", "fr"])
    by_id = {r["id"]: r for r in out.collect()}

    assert set(by_id) == {1, 3, 5}          # 2 folded into 1; 4 fails quality
    assert by_id[1]["n_copies"] == 2
    assert by_id[3]["n_copies"] == 1
    assert by_id[1]["pred_lang"] == "en"
    assert by_id[5]["pred_lang"] == "de"
    fps = [r["fingerprint"] for r in by_id.values()]
    assert len(set(fps)) == len(fps)

    budget = {r["pred_lang"]: r for r in tr.training_token_budget(out).collect()}
    assert budget["en"]["n_docs"] == 2
    assert budget["en"]["n_dups_removed"] == 1
    assert budget["de"]["n_docs"] == 1
    assert budget["en"]["total_bpe_tokens"] == (
        by_id[1]["bpe_tokens"] + by_id[3]["bpe_tokens"]
    )


def test_curate_training_set_invariants(docs):
    from gitlab_elasticsearch_indexer_spark.operators import training as tr
    from gitlab_elasticsearch_indexer_spark.functions import textstats as ts

    out = tr.curate_training_set(docs, min_quality=0.5,
                                 langs=["de", "en", "es", "fr"]).persist()
    rows = out.collect()
    assert rows, "curation must keep something at sf0.001"
    # unique fingerprints, gates respected
    assert len({r["fingerprint"] for r in rows}) == len(rows)
    assert all(r["quality_score"] >= 0.5 for r in rows)
    assert all(r["pred_lang"] in {"de", "en", "es", "fr"} for r in rows)

    # canonical = min id among SURVIVING members; n_copies = group size
    surviving = (
        docs.select(
            F.col("doc_id").cast("long").alias("id"),
            F.round(ts.quality_score_expr("text"), 2).alias("q"),
            ts.pred_lang_expr("text").alias("pl"),
            ts.canon_md5_expr("text").alias("fp"),
        )
        .filter((F.col("q") >= 0.5) & F.col("pl").isin("de", "en", "es", "fr"))
        .groupBy("fp")
        .agg(F.min("id").alias("min_id"), F.count("*").alias("n"))
        .collect()
    )
    expect = {r["fp"]: (r["min_id"], r["n"]) for r in surviving}
    assert {r["fingerprint"]: (r["id"], r["n_copies"]) for r in rows} == expect
    out.unpersist()
