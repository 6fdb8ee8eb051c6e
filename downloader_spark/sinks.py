"""Sinks: partitioned Parquet writes matching the reference's
date-partitioned object layout.

The reference derives its archive layout from the ingest timestamp —
``Maxmind/<YYYY/MM/DD/>`` built at /root/reference/downloader.go:64
and maxmind.go:38-40 — and publishes non-atomically (write, then
delete if dup, common.go:106-130).  The Spark translation inverts
that: dedup BEFORE write, then rely on the job-commit protocol for
atomicity (SURVEY §4.3.4), and express the path scheme as Hive-style
``year=/month=/day=`` partitions so Catalyst prunes them on date
predicates for free.

Scale notes: ``partitionBy`` writes one file per (task, partition
value) — repartition on the partition columns first so each output
partition is written by few tasks (avoids the small-files explosion
at 1000 executors).  ``maxRecordsPerFile`` bounds file size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DATE_PARTS = ("year", "month", "day")


def with_date_partitions(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the reference's YYYY/MM/DD partition columns from an
    event-time column (downloader.go:64 equivalent)."""
    return (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write a date-partitioned Parquet archive.

    Repartitioning on the partition columns keeps the file count at
    O(partitions), not O(tasks x partitions); AQE coalescing then
    right-sizes the shuffle.  The write is transactional per job —
    the dedup-before-write replacement for the reference's
    write-then-delete (common.go:123-129).
    """
    out = with_date_partitions(df, ts_col)
    (
        out.repartition(*[F.col(c) for c in DATE_PARTS])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*DATE_PARTS)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """General partitioned Parquet write (co-located layout for
    downstream partition-pruned scans / bucketed-style joins)."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (native Spark writer) — interop with ORC-based lakes;
    carries the same pushdown/pruning contract as parquet on read
    (tests/test_io_loaders.py pins the round-trip and the pushed
    filters)."""
    df.write.mode(mode).orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted Parquet table write.

    Bucketing pre-shuffles the data ONCE at write time: every
    subsequent equi-join or aggregation on the bucket columns between
    tables bucketed the same way runs with NO exchange (verified by
    plan assertion in tests).  At 100 TB this is the difference
    between re-shuffling the fact table per query and never shuffling
    it again — the write-side analog of the reference's path-encoded
    partition scheme (SURVEY §1.1/D2).

    Bucketing requires the table catalog (bucket metadata lives
    there), hence ``saveAsTable`` with an explicit path rather than a
    bare ``parquet(path)``.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
