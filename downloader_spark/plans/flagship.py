"""The flagship pipeline: the reference's whole semantic core as one plan.

Incremental watermark filter (A3, routeviews.go:107) → exact content-
hash dedup keep-first (A5, common.go:169-190) → latest per key (A7,
file/api.go:81-87) — i.e. "fetch only new log entries, drop content
duplicates, maintain the current pointer per dataset" as a single
declarative DataFrame plan over the events table.

Plan shape at scale: one pushed-down scan filter, then two hash
shuffles (digest, then key), each skew-free.  Catalyst fuses the two
window evaluations with the projections around them; nothing touches
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table


def flagship(spark: SparkSession, sf_dir: str, watermark: int = 100) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    dedup_w = Window.partitionBy("content_md5").orderBy("event_id")
    latest_w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.filter(F.col("event_id") > watermark)
        .withColumn("content_md5", F.md5(F.col("props")))
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .withColumn("rk", F.row_number().over(latest_w))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", "ts", "event_type", "content_md5")
    )
