"""Extended engine surface: pivot, exact percentiles, distribution
windows, edit distance, and deterministic dataset splitting — the
long-tail operators a training-data pipeline reaches for after the
core relational set (SURVEY §2.B north-star widening).

Everything here stays JVM-side and exact-checkable; the dataset
split in particular is the reproducibility-critical one — hash-based
assignment means the same document lands in the same split on any
engine, any cluster size, any run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.plans.registry import query

PIVOT_SOURCES = ["src0", "src1", "src2", "src3", "src4"]


@query(
    "agg_pivot",
    oracle=f"""
    SELECT lang,
           {", ".join(f"CAST(sum(CASE WHEN source = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{s}" for s in PIVOT_SOURCES)}
    FROM documents
    GROUP BY lang
    """,
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-language doc counts spread across source columns.
    The pivot values are EXPLICIT — with an unspecified value list
    Spark runs an extra distinct-collect job to discover them (a
    driver round-trip you never want at 100 TB).  Plans as one
    two-phase hash aggregation, same as any groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    pivoted = (
        docs.groupBy("lang")
        .pivot("source", PIVOT_SOURCES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "lang",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in PIVOT_SOURCES],
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           round(CAST(median(o_totalprice) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90,
           round(CAST(quantile_cont(o_totalprice, 0.99) AS DOUBLE), 4) AS p99,
           round(CAST(min(o_totalprice) AS DOUBLE), 4) AS p0
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    == DuckDB ``quantile_cont``: identical (1-f)*a + f*b interpolation
    on identical sorted doubles — verified bit-equal).  Exact
    percentile sorts each group; for sketch-sized state at 100 TB the
    engine also exposes approx_percentile (KLL/GK), which — like any
    sketch — is engine-specific and not oracle-comparable."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        F.round(F.min("o_totalprice").cast("double"), 4).alias("p0"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities,
           CAST(count(DISTINCT o_orderpriority) AS INT) AS n_prio
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-list aggregation made deterministic: raw
    collect_list order depends on partitioning and can never
    hash-match, so the exposed form is sorted-distinct-joined
    (collect_set → array_sort → array_join == DuckDB's ordered
    string_agg DISTINCT).  The collected domain must be small
    (a group's distinct values live in one reducer's memory) — for
    large domains use explode-side aggregation instead."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
        F.countDistinct("o_orderpriority").cast("int").alias("n_prio"),
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (WHERE o_totalprice > 100000) AS BIGINT) AS n_big,
           CAST(count(*) FILTER (WHERE o_orderpriority LIKE '1-%') AS BIGINT)
             AS n_urgent,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "filter"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause (conditional) aggregation: several differently-
    predicated counts in ONE pass over the group — the idiom that
    replaces N separate filtered scans.  Same SQL on both engines."""
    for t in ("orders",):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"ds_{t}")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               count(*) FILTER (WHERE o_orderpriority LIKE '1-%') AS n_urgent,
               count(*) AS n
        FROM ds_orders
        GROUP BY o_orderstatus
        """
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           round(CAST(median(o_totalprice) AS DOUBLE), 4) AS p50_exact,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "approx"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch with a verifiable surface (same pattern as
    agg_approx): the raw approx_percentile estimate is engine-specific,
    so the checked output is the exact median plus ``approx_ok`` =
    "the sketch's p50 is within 2% of exact" — a passing hash proves
    the sketch ran and converged.  At 100 TB only the sketch survives:
    its state is O(1/accuracy) per group vs the exact form's
    sort-the-group."""
    orders = load_table(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, 0.5)")
    approx = F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
    return orders.groupBy("o_orderstatus").agg(
        F.round(exact, 4).alias("p50_exact"),
        (F.abs(approx - exact) <= 0.02 * exact).alias("approx_ok"),
    )


@query(
    "window_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_30m,
           round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE), 2)
             AS vsum_30m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frames"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval RANGE frame: per user, rolling 30-minute count/sum —
    the event-time sliding aggregate expressed as a window frame.
    Spark's rangeBetween needs a numeric ordering column, so the
    frame runs on microsecond epochs (bit-equivalent to DuckDB's
    INTERVAL arithmetic, which is also µs-precision); the sum is
    decimal-exact per functions/numeric.py."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-30 * 60 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_30m"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double"), 2
        ).alias("vsum_30m"),
    )


PROFILE_COLS = ["user_id", "event_type", "value", "props"]


@query(
    "profile_columns",
    oracle="""
    SELECT 'user_id' AS col, CAST(count(*) - count(user_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct FROM events
    UNION ALL
    SELECT 'event_type', CAST(count(*) - count(event_type) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT) FROM events
    UNION ALL
    SELECT 'value', CAST(count(*) - count(value) AS BIGINT),
           CAST(count(DISTINCT value) AS BIGINT) FROM events
    UNION ALL
    SELECT 'props', CAST(count(*) - count(props) AS BIGINT),
           CAST(count(DISTINCT props) AS BIGINT) FROM events
    """,
    tags=("profiling",),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profiling: null and distinct counts per
    column in ONE scan — the aggregates all compute side by side and
    ``stack`` melts the single result row to long form (the oracle
    spells it as UNION ALL; Spark reads the table once)."""
    events = load_table(spark, sf_dir, "events")
    aggs = []
    for c in PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"dist_{c}"))
    one = events.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, dist_{c}" for c in PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) AS (col, n_null, n_distinct)"
        )
    )


@query(
    "window_distribution",
    oracle="""
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1))
    and cume_dist — both single-division doubles of exact ints, so
    6dp rounding is engine-identical.  Tie-broken ordering keeps the
    rank basis total."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return events.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "scalar_levenshtein",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS INT) AS d_name_type,
           CAST(levenshtein(p_name, reverse(p_name)) AS INT) AS d_palindrome,
           round(CAST(levenshtein(p_name, p_type) AS DOUBLE)
                 / greatest(len(p_name), len(p_type)), 6) AS d_norm
    FROM part
    """,
    tags=("scalar", "similarity"),
)
def scalar_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (exact integer, identical DP in both engines) +
    the length-normalized ratio used as a near-dup similarity gate.
    Map-only; at scale this is the verify step after candidate
    blocking, never an all-pairs metric."""
    part = load_table(spark, sf_dir, "part")
    d1 = F.levenshtein("p_name", "p_type")
    return part.select(
        "p_partkey",
        d1.alias("d_name_type"),
        F.levenshtein(F.col("p_name"), F.reverse(F.col("p_name"))).alias("d_palindrome"),
        F.round(
            d1.cast("double") / F.greatest(F.length("p_name"), F.length("p_type")), 6
        ).alias("d_norm"),
    )


@query(
    "scalar_explode",
    oracle="""
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
             AS val_scaled
    FROM embeddings
    WHERE vec_id < 50
    """,
    tags=("scalar", "explode"),
)
def scalar_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with ordinality (``posexplode``): array column →
    one row per element with its position — the flatten step feeding
    long-format pipelines (the dedup suite's shingle explode is this
    same generator).  Values emitted as 1e6-scaled ints (float32 cast
    exact, round identical).  Generate is pipelined with the scan —
    no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        F.round(F.col("v").cast("double") * 1000000).cast("bigint").alias(
            "val_scaled"
        ),
    )


SPLIT_BUCKETS = 100
TRAIN_UPTO = 80  # [0,80) train, [80,90) val, [90,100) test


@query(
    "sample_split",
    oracle=f"""
    SELECT doc_id,
           {_duck_h60("concat('split:', CAST(doc_id AS VARCHAR))")} % {SPLIT_BUCKETS}
             AS bucket,
           CASE WHEN {_duck_h60("concat('split:', CAST(doc_id AS VARCHAR))")} % {SPLIT_BUCKETS} < {TRAIN_UPTO} THEN 'train'
                WHEN {_duck_h60("concat('split:', CAST(doc_id AS VARCHAR))")} % {SPLIT_BUCKETS} < {TRAIN_UPTO + 10} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    tags=("llm", "sampling"),
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket — the
    reproducible-split primitive every training pipeline needs:
    membership depends only on the key (never on partitioning, row
    order, or engine), so reruns and backfills land every doc in the
    same split.  80/10/10 over {SPLIT_BUCKETS} md5-derived buckets;
    pure map stage.  (Spark's df.sample is seed-dependent ON
    PARTITIONING — it is NOT reproducible under repartition, which is
    why hash-gating is the standard instead.)"""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        f"{_spark_h60('concat(' + chr(39) + 'split:' + chr(39) + ', CAST(doc_id AS STRING))')} % {SPLIT_BUCKETS}"
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_UPTO, "train")
        .when(bucket < TRAIN_UPTO + 10, "val")
        .otherwise("test")
        .alias("split"),
    )


STRAT_K = 40  # per-stratum balanced-subsample size


@query(
    "sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {_duck_h60("concat('strat:', CAST(doc_id AS VARCHAR))")},
                        doc_id) AS strat_rank
      FROM documents
    )
    SELECT doc_id, lang, CAST(strat_rank AS BIGINT) AS strat_rank
    FROM ranked WHERE strat_rank <= {STRAT_K}
    """,
    tags=("sampling", "llm", "training-data"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-language subsample: exactly min({STRAT_K}, n) docs
    per lang, chosen by md5-hash rank — the class-balancing step of a
    training-data mix (a uniform sample keeps majority-language skew;
    rank-by-deterministic-hash makes the balanced pick reproducible
    across runs AND engines, where any RNG-based sampler could not be
    oracle-checked at all).

    One shuffle on lang; the per-stratum sort ranks by the 60-bit
    hash (ties broken by doc_id — a total order, so row_number is
    deterministic).  Stratum cardinality is bounded by the language
    count, so at 100 TB the sort partitions are the hot spot: for
    huge strata switch to the two-phase form — hash-threshold
    pre-filter to ~2-3k candidates per stratum (map-only, no sort),
    then rank the survivors; same answer, sort input shrunk by
    orders of magnitude."""
    docs = load_table(spark, sf_dir, "documents")
    h = _spark_h60("concat('strat:', CAST(doc_id AS STRING))")
    w = Window.partitionBy("lang").orderBy(F.expr(h), "doc_id")
    return (
        docs.select(
            "doc_id", "lang", F.row_number().over(w).cast("bigint").alias("strat_rank")
        )
        .filter(F.col("strat_rank") <= STRAT_K)
    )
