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
