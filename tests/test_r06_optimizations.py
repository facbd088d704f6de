"""Focused tests for the round-6 optimization internals: the spread
fan-out helper, the cumsum-as-left-fold property the Arrow pair scorer
relies on, and the restructured simhash / doc_fingerprint /
near_dup_lsh shapes staying value-identical to their naive forms."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from adscraper_spark.pipelines.common import spread

SF = "/root/testdata/sf0.001"


def test_cumsum_matches_sequential_left_fold():
    """_pair_cos_arrow replaces the JVM `aggregate` fold (sequential
    left-to-right double adds) with numpy cumsum; they must agree to
    the last bit, including the float→double upcast of each product."""
    rng = np.random.default_rng(7)
    for _ in range(500):
        a32 = rng.standard_normal(64).astype(np.float32)
        b32 = rng.standard_normal(64).astype(np.float32)
        prods = a32.astype(np.float64) * b32.astype(np.float64)
        acc = 0.0
        for p in prods:
            acc = acc + p
        assert prods.cumsum()[-1] == acc  # bitwise, no tolerance


def test_spread_fans_out_small_scans_and_is_identity_at_scale(spark):
    doc = spark.read.parquet(f"{SF}/documents.parquet")
    n = spark.sparkContext.defaultParallelism
    assert spread(doc, "doc_id").rdd.getNumPartitions() == n
    # content unchanged (same rows, any order)
    a = sorted(map(tuple, doc.collect()))
    b = sorted(map(tuple, spread(doc, "doc_id").collect()))
    assert a == b
    # identity once the input already carries >= parallelism splits
    wide = doc.repartition(n * 2)
    assert spread(wide, "doc_id") is wide


def test_simhash_bitpack_equals_per_bit_substring(spark):
    """The conv()-packed vote extraction must equal the per-bit
    substring casts it replaced, token for token."""
    toks = (spark.read.parquet(f"{SF}/documents.parquet")
            .limit(50)
            .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .select("doc_id",
                    F.translate(F.md5(F.col("tok").cast("binary")),
                                "0123456789abcdef",
                                "0000000011111111").alias("m"))
            .withColumn("v", F.conv(F.col("m"), 2, 10).cast("long")))
    checks = [
        (F.substring("m", j + 1, 1).cast("int")
         != F.shiftright(F.col("v"), 31 - j).bitwiseAND(F.lit(1)))
        for j in range(32)
    ]
    diverging = toks.filter(sum(c.cast("int") for c in checks) > 0)
    assert diverging.count() == 0


def test_doc_fingerprint_explode_min_equals_array_min(spark):
    """The explode→partial-min shape must reproduce the former
    array_min(transform(...)) fingerprint for every doc."""
    from adscraper_spark.pipelines.text_quality import (
        FINGERPRINT_K, FINGERPRINT_STRIDE, doc_fingerprint)

    doc = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter(F.length("text") >= FINGERPRINT_K)
    shingles = F.transform(
        F.sequence(F.lit(1),
                   F.length("text") - F.lit(FINGERPRINT_K - 1),
                   F.lit(FINGERPRINT_STRIDE)),
        lambda i: F.md5(F.substring(F.col("text"), i, FINGERPRINT_K)
                        .cast("binary")))
    naive = doc.select("doc_id",
                       F.array_min(shingles).alias("fingerprint")) \
        .orderBy("doc_id").collect()
    got = doc_fingerprint(spark, SF).collect()
    assert list(map(tuple, got)) == list(map(tuple, naive))


def test_pair_index_chunks_cover_all_pairs_bounded():
    """Chunked pair generation must enumerate every i<j pair exactly
    once for any (m, chunk), with no chunk exceeding the bound by more
    than one anchor row's tail."""
    from adscraper_spark.pipelines.similarity import _pair_index_chunks

    for m in (0, 1, 2, 3, 7, 50, 113):
        for chunk in (1, 5, 37, 10_000):
            seen = set()
            for ia, ib in _pair_index_chunks(m, chunk):
                assert len(ia) == len(ib)
                assert len(ia) <= max(chunk, m - 1)
                assert (ia < ib).all()
                pairs = set(zip(ia.tolist(), ib.tolist()))
                assert not (pairs & seen), "duplicate pairs"
                seen |= pairs
            assert len(seen) == m * (m - 1) // 2, (m, chunk)


def test_bucket_pair_scores_match_jvm_fold(spark):
    """The within-bucket numpy scorer must reproduce the JVM HOF
    cosine bit-for-bit for every pair it emits, and emit every pair
    above the conservative margin."""
    from adscraper_spark.pipelines.similarity import (
        _NEAR_DUP_MARGIN, _bucket_pair_scores, _dot, _with_norm)

    emb = _with_norm(
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 60))
    bandvecs = emb.select(
        F.lit(0).alias("band"), F.lit("k").alias("bkey"),
        "vec_id", "embedding", "nrm")
    got = {(r["a"], r["b"]): r["cos_raw"]
           for r in _bucket_pair_scores(bandvecs).collect()}
    ea = emb.select(F.col("vec_id").alias("a"),
                    F.col("embedding").alias("va"),
                    F.col("nrm").alias("na"))
    eb = emb.select(F.col("vec_id").alias("b"),
                    F.col("embedding").alias("vb"),
                    F.col("nrm").alias("nb"))
    jvm = (ea.crossJoin(eb).filter(F.col("a") < F.col("b"))
           .select("a", "b", (_dot(F.col("va"), F.col("vb"))
                              / (F.col("na") * F.col("nb")))
                   .alias("cos_raw")).collect())
    expected = {(r["a"], r["b"]): r["cos_raw"] for r in jvm
                if r["cos_raw"] >= _NEAR_DUP_MARGIN}
    assert set(got) == set(expected) and len(expected) > 0
    for k, v in expected.items():
        assert got[k] == v  # exact doubles, no tolerance
