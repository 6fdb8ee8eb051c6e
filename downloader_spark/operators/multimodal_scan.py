"""Binary-file inventory scan as a registered query key.

The reference's only catalog is the bucket listing itself
(/root/reference/file/api.go:52-65, NamesToMD5); the Spark-native
equivalent is a ``binaryFile`` scan projected to (file, size) — the
inventory DataFrame of SURVEY §1.4/D1.  The payload decode pipeline
built on the same scan lives in ``downloader_spark.multimodal``.

Oracle note: DuckDB's ``read_blob`` needs a literal path, so the
oracle pins the driver's correctness scale directory (sf0.01) — the
Spark side receives the same directory via ``sf_dir``.  DuckDB 1.0
cannot md5 a BLOB, so the digest column (computed JVM-side in the
full inventory, multimodal.with_media_metadata) is excluded from the
checked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.multimodal import scan_binary
from downloader_spark.plans.registry import query


@query(
    "multimodal_inventory",
    oracle="""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS file,
           size AS size_bytes
    FROM read_blob('/root/testdata/sf0.01/*.parquet')
    """,
    tags=("multimodal", "scan"),
)
def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory of a binary corpus: one row per file with basename
    and byte size.  binaryFile scans parallelize per file and the
    ``content`` column is pruned away here — the scan reads only file
    metadata, not payloads."""
    return scan_binary(spark, sf_dir, glob="*.parquet").select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"),
        F.col("length").alias("size_bytes"),
    )
