"""Differential test: the salted join must produce exactly the rows
of the plain inner join, on a deliberately skewed dataset (one key
carrying half the rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from downloader_spark.functions.skew import salted_join


def test_salted_join_equals_plain_join_under_skew(spark):
    # 5000 rows for the hot key, 50 for each of 100 cold keys
    big = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    ).union(
        spark.range(5000).select(
            (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("payload")
        )
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(101)], "k long, label string"
    )

    plain = big.join(small, "k", "inner").select("k", "payload", "label")
    salted = salted_join(big, small, "k", n_salts=8, salt_by="payload").select(
        "k", "payload", "label"
    )
    assert salted.count() == plain.count() == 10000
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # the hot key is actually scattered: >1 distinct salt observed
    scattered = (
        big.withColumn(
            "__salt", F.pmod(F.hash(F.col("k"), F.col("payload")), F.lit(8))
        )
        .filter("k = 0")
        .select("__salt")
        .distinct()
        .count()
    )
    assert scattered > 1


def test_embed_lsh_buckets_bounded_on_correlated_corpus(spark):
    """Random-hyperplane LSH must spread a corpus whose LEADING
    dimensions are correlated (all-positive first 8 dims): the old
    axis-aligned scheme (sign of dims 1..8) collapsed such a corpus
    into ONE bucket — O(N^2) pair work.  The md5-seeded hyperplanes
    mix all dims, so the max bucket population stays near uniform."""
    import random

    from downloader_spark.operators.llm_dedup import (
        _spark_bucket_expr,
        derive_sign_bits,
        sign_buckets,
    )

    rng = random.Random(7)
    n, dim = 2000, 64
    rows = [
        (
            i,
            # dims 0..7 strictly positive (correlated); the rest random
            [float(abs(rng.gauss(3, 1)))] * 8
            + [float(rng.gauss(0, 1)) for _ in range(dim - 8)],
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # old scheme's behavior, reproduced: sign of the first 8 dims
    axis_signs = [[1 if d == j else 0 for d in range(dim)] for j in range(8)]
    axis_buckets = emb.select(
        F.expr(_spark_bucket_expr(axis_signs)).alias("b")
    ).groupBy("b").count().collect()
    assert max(r["count"] for r in axis_buckets) == n  # total collapse

    # scale path: derived width + corpus-centered hyperplanes
    bits = derive_sign_bits(n)  # 2000/64 -> still the 8-bit floor
    got = (
        sign_buckets(emb).groupBy("bucket").count().collect()
    )
    max_pop = max(r["count"] for r in got)
    # near-uniform: expected pop is n/2^bits ~ 8; allow generous slack
    assert len(got) > 100
    assert max_pop <= 8 * (n // 2**bits + 1), max_pop


def test_derive_sign_bits_scales_with_corpus():
    from downloader_spark.operators.llm_dedup import derive_sign_bits

    assert derive_sign_bits(10) == 8  # floor
    assert derive_sign_bits(500) == 8
    assert derive_sign_bits(1_000_000) == 14  # ceil(log2(1e6/64))
    assert derive_sign_bits(1_000_000_000) == 24  # ceiling clamp
    # monotone non-decreasing
    prev = 0
    for n in (10, 1000, 10**5, 10**7, 10**9, 10**11):
        b = derive_sign_bits(n)
        assert b >= prev
        prev = b


def test_scaled_sign_bits_oracle_compatible_then_scales(spark):
    """The checked LSH keys' round-15 width rule: the fixed SIGN_BITS
    exact-check width at every fixture scale (so static oracles stay
    bit-exact), derive_sign_bits beyond — and since hyperplanes are
    prefix-stable, the wider bucket is a strict refinement of the
    checked one."""
    from downloader_spark.operators.llm_dedup import (
        SIGN_BITS,
        hyperplane_signs,
        scaled_sign_bits,
    )

    def fake(n):
        return spark.range(n).selectExpr(
            "id AS vec_id", "array(CAST(id AS double)) AS embedding"
        )

    for n in (0, 1, 500, 5000, 16_384):
        assert scaled_sign_bits(fake(n)) == SIGN_BITS, n
    assert scaled_sign_bits(fake(50_000)) == 10
    assert scaled_sign_bits(fake(500_000)) == 13
    assert hyperplane_signs(10, 64)[:8] == hyperplane_signs(8, 64)
