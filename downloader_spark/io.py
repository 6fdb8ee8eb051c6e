"""Loaders for the driver-generated parquet tables (TESTDATA.md).

All queries go through ``load_table`` so filters/projections written
against the returned DataFrame reach the parquet scan (predicate
pushdown + column pruning are Catalyst's job once the plan is
declarative — verify with ``.explain('formatted')``: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Pin the session timezone: date_format/date_trunc/extract over
    # TIMESTAMP(_LTZ) are session-tz-dependent, and the oracle engine
    # (DuckDB) treats naive timestamps as UTC.  Runtime-settable, so it
    # also holds under the driver's own session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 cannot
        # read as a timestamp.  Read the raw int64 nanos and truncate
        # to microseconds — exactly what DuckDB does when it coerces
        # ns -> its us-precision TIMESTAMP, so oracle comparisons stay
        # value-identical.  (Runtime-settable SQLConf; safe under any
        # parent session, including the driver's.)
        # ORACLE-VERSION DEPENDENCY: the pinned DuckDB 1.0.0 coerces
        # TIMESTAMP(NANOS) to us-precision TIMESTAMP on read; newer
        # DuckDB preserves TIMESTAMP_NS.  If the oracle engine is ever
        # upgraded, add an explicit us-truncating cast in every events
        # oracle, or the ns tail would silently diverge.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan.  Always pass an explicit schema in production paths —
    inferSchema is a full extra pass over the data (fatal at 100 TB).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def load_json(
    spark: SparkSession, path: str, schema: str | None = None, **options: str
) -> DataFrame:
    """JSON-lines scan; explicit schema skips the inference pass."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def load_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw line scan (one ``value`` column) — the entry point for the
    regex-parse ingestion pattern (creation logs, SURVEY §1.1/D3)."""
    return spark.read.text(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
