"""Python UDF surface (SURVEY.md §2.B): Arrow-vectorized pandas UDFs —
a scalar UDF and a grouped-aggregate UDAF.

UDFs are the engine's escape hatch, not its hot path: everything else
in this repo is JVM built-ins.  When Python IS needed, the rules are
(a) ``pandas_udf`` (Arrow batch transfer, columnar compute) — never
row-at-a-time ``F.udf``; (b) the UDF body is pure vectorized
pandas/numpy; (c) at 100 TB the scalar UDF pipelines per Arrow batch
(no shuffle), and the grouped UDAF shuffles once on the group key
exactly like a built-in aggregate.

Both keys are exact-checked: the UDF bodies compute integer/ratio
arithmetic that the DuckDB oracle replicates in SQL — proving the
Python path produces the same answers as the declarative one, which
is precisely the property a user migrating a UDF wants verified.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from downloader_spark.io import load_table
from downloader_spark.plans.registry import query


@pandas_udf(T.DoubleType())
def _chars_per_token(text: pd.Series) -> pd.Series:
    """Vectorized chars-per-whitespace-token (single double division of
    exact ints — engine-identical after 6dp rounding)."""
    n_chars = text.str.len().astype("float64")
    n_tokens = (text.str.count(" ") + 1).astype("float64")
    return (n_chars / n_tokens).round(6)


@pandas_udf(T.LongType())
def _space_runs(text: pd.Series) -> pd.Series:
    """Vectorized count of space characters (== token gaps)."""
    return text.str.count(" ").astype("int64")


@query(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           CAST(len(text) - len(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
           round(CAST(len(text) AS DOUBLE)
                 / (len(text) - len(replace(text, ' ', '')) + 1), 6)
             AS chars_per_tok
    FROM documents
    """,
    tags=("udf",),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over documents: space count and
    chars-per-token, computed in Python (Arrow-batched) and verified
    exactly against the SQL equivalent."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _space_runs("text").alias("n_spaces"),
        _chars_per_token("text").alias("chars_per_tok"),
    )


@pandas_udf(T.LongType())
def _sum_chars(n_chars: pd.Series) -> int:
    """GROUPED_AGG: exact int64 sum (associative — order-independent)."""
    return int(n_chars.sum())


@pandas_udf(T.DoubleType())
def _median_chars(n_chars: pd.Series) -> float:
    """GROUPED_AGG: median of ints (exact: midpoint of two int64s is an
    exactly-representable double)."""
    return float(n_chars.median())


@query(
    "udtf_grouped_map",
    oracle="""
    SELECT doc_id, lang,
           CAST(n_chars * 1000000 // sum(n_chars) OVER (PARTITION BY lang)
                AS BIGINT) AS share_ppm,
           CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS group_n
    FROM documents
    """,
    tags=("udf", "udtf"),
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (UDTF-style) transform via ``applyInPandas``: each
    language group arrives as one pandas DataFrame and is mapped to an
    output frame of the same length — the flatMap-per-group shape
    (SURVEY §2.B UDTF row).  The body computes each doc's integer
    share of its group's characters (floor ppm — exact), so the
    whole-group dependency (the group total) is what makes this a
    genuinely grouped transform rather than a scalar UDF.

    Scale: one shuffle on the group key, Arrow-batched per group;
    group size bounds executor memory (fine for bounded groups like
    languages; use salted sub-groups for unbounded keys)."""

    def share(pdf: pd.DataFrame) -> pd.DataFrame:
        total = int(pdf["n_chars"].sum())
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "share_ppm": (pdf["n_chars"].astype("int64") * 1_000_000) // total,
                "group_n": len(pdf),
            }
        )

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").applyInPandas(
        share, schema="doc_id long, lang string, share_ppm long, group_n long"
    )


@query(
    "udaf_grouped",
    oracle="""
    SELECT lang,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(median(n_chars) AS DOUBLE) AS median_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("udf",),
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDAF per language: exact integer sum
    and integer median (both order-independent, so exact-checkable
    against DuckDB despite arbitrary partitioning).

    Scale caveat: GROUPED_AGG gives parallelism <= #groups and ships
    each FULL group through one Python worker — fine for a bounded
    key like language (5 groups; the ~2 s bench cost is Python worker
    startup, not the plan), wrong for unbounded/skewed keys.  For
    those, use ``udaf_grouped_salted`` below: a salted two-phase form
    whose phase-1 parallelism is #groups x n_salts and whose per-task
    group slice is 1/n_salts of the data."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        _sum_chars("n_chars").alias("total_chars"),
        _median_chars("n_chars").alias("median_chars"),
    )


def udaf_grouped_salted(
    docs: DataFrame, n_salts: int = 32
) -> DataFrame:
    """The unbounded-key form of ``udaf_grouped``'s sum: salt each row
    by a hash of its id, run the pandas UDAF per (group, salt) — so no
    Python worker ever sees more than ~1/n_salts of a hot group — then
    combine the partials with a built-in sum.  Only DECOMPOSABLE
    aggregates can ride this (sum/count/min/max, any commutative
    monoid); a holistic statistic like the median cannot be salted —
    route it to the engine's percentile machinery instead (see
    agg_percentile), which is exactly what the direct key does for
    bounded groups.

    Output: (lang, total_chars), equal to the direct form's sum column
    for every group under any partitioning."""
    salted = docs.withColumn(
        "_salt", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(n_salts))
    )
    partials = salted.groupBy("lang", "_salt").agg(
        _sum_chars("n_chars").alias("partial_chars")
    )
    return partials.groupBy("lang").agg(
        F.sum("partial_chars").cast("long").alias("total_chars")
    )
