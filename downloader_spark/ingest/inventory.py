"""Persisted archive inventory: the dedup/catalog state.

Replaces the reference's O(full-bucket) listing per dedup check
(/root/reference/file/api.go:52-65, called twice per file from
common.go:169-177) with an appended Parquet table — the fix demanded
by SURVEY §4.3.1.  A dedup probe is a *scoped* scan: the ``scope``
filter pushes down to Parquet, so the cost is O(scope), and at 100 TB
the table would be written bucketed/partitioned by scope (and the
probe becomes a hash-partitioned anti-join for batch ingest).

``current`` is a DERIVED table (SURVEY §3.3: UpdateCurrent.sh rebuilds
pointers from the archive alone): latest row per dataset by ingest
sequence, tie-broken by name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

INVENTORY_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("md5", T.StringType(), False),
        T.StructField("scope", T.StringType(), False),
        T.StructField("dataset", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("ingest_seq", T.LongType(), False),
    ]
)


class InventoryTable:
    def __init__(self, path: str) -> None:
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def load(self, spark: SparkSession) -> DataFrame:
        if not self.exists():
            return spark.createDataFrame([], INVENTORY_SCHEMA)
        return spark.read.parquet(self.path)

    def append(self, spark: SparkSession, rows: list[tuple]) -> None:
        df = spark.createDataFrame(rows, INVENTORY_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def next_seq(self, spark: SparkSession) -> int:
        if not self.exists():
            return 1
        row = self.load(spark).agg(F.max("ingest_seq").alias("m")).collect()[0]
        return (row.m or 0) + 1

    def is_duplicate(self, spark: SparkSession, scope: str, md5_hex: str) -> bool:
        """True iff the scope already holds this content hash.

        Reference parity with one deliberate strengthening:
        CheckIfHashIsUniqueInList (common.go:183-190) excludes the
        object's OWN name, so a re-download of the same name+content
        re-publishes (idempotent overwrite in an object store).  With
        an append-only inventory that would double-append the catalog
        row, so the same-name+same-content case is treated as a
        duplicate too — same observable archive, append-exactly-once
        catalog.  A same-name NEW content still publishes (new
        version).  The scope+md5 filters push down to the Parquet
        scan, so the probe is O(scope), never a full listing."""
        if not self.exists():
            return False
        return (
            self.load(spark)
            .filter((F.col("scope") == scope) & (F.col("md5") == md5_hex))
            .limit(1)
            .count()
            > 0
        )

    def current_table(self, spark: SparkSession) -> DataFrame:
        """Latest object per dataset — the derived 'current' pointers
        (window row_number=1; same plan as the latest_per_key
        operator, reference A7/A8)."""
        w = Window.partitionBy("dataset").orderBy(
            F.col("ingest_seq").desc(), F.col("name").desc()
        )
        return (
            self.load(spark)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("dataset", "name", "md5", "ingest_seq")
        )

    def stats(self, spark: SparkSession) -> DataFrame:
        """Per-dataset inventory rollup (object count, distinct
        contents, bytes) — the analytic form of the reference's
        metrics surface (A10/A15)."""
        return self.load(spark).groupBy("dataset").agg(
            F.count("*").alias("n_objects"),
            F.countDistinct("md5").alias("n_distinct"),
            F.sum("size").alias("total_bytes"),
        )
