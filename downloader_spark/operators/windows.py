"""Window-function operators (SURVEY.md §2.B): ranking, analytic
(lag/lead/first/last), and moving frames.

Every window here uses a total (tie-broken) ordering so ranking and
frame contents are engine-independent — the generic rule for
hash-comparable window queries.

Scale: a window = one hash exchange on the partition key + an
in-partition sort.  Partition keys are chosen to be high-cardinality
(custkey, user_id) so no single partition dominates; Spark spills
window buffers if a key is hot, and AQE skew handling covers the
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.functions.numeric import dec
from downloader_spark.io import load_table
from downloader_spark.plans.registry import query


@query(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, rk, rnk, drnk, q4
    FROM (
        SELECT o_orderkey, o_orderstatus,
               row_number() OVER w AS rk,
               rank()       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rnk,
               dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS drnk,
               ntile(4)     OVER w AS q4
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rk <= 10
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile; top-10 per order status.

    row_number and ntile use the tie-broken ordering (price, key);
    rank/dense_rank rank on price alone — value-based, so ties get
    equal ranks identically in any engine.

    Scale shape: o_orderstatus has ~3 values, so a naive global window
    is 3 reducer partitions regardless of cluster size — the classic
    low-cardinality-partition straggler.  Instead: (1) salted LOCAL
    top-10 per (status, salt) bounds any one sort to 1/64 of a status;
    (2) the global window runs on <= 64*10 survivors per status.  The
    pruning is lossless for every emitted column:
    - row_number: any row preceding a top-10 row in the tie-broken
      order is itself top-10 of its salt bucket, so survivors contain
      the true global top-10 prefix;
    - rank/dense_rank count only rows with strictly higher price,
      which all sort earlier and therefore all survive;
    - ntile(4) needs the FULL partition row count, so it is computed
      analytically from rk and the per-status count n (3-row broadcast
      agg), replicating Spark/SQL NTile bucketing: the first n%4
      buckets get one extra row.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")

    w_local = Window.partitionBy(
        "o_orderstatus", F.pmod(F.col("o_orderkey"), F.lit(64))
    ).orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    survivors = (
        base.withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= 10)
        .drop("lr")
    )

    w_total = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_price = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc())
    counts = base.groupBy("o_orderstatus").agg(F.count("*").alias("n"))

    ranked = (
        survivors.select(
            "o_orderkey",
            "o_orderstatus",
            F.row_number().over(w_total).alias("rk"),
            F.rank().over(w_price).alias("rnk"),
            F.dense_rank().over(w_price).alias("drnk"),
        )
        .filter(F.col("rk") <= 10)
        .join(F.broadcast(counts), "o_orderstatus")
    )
    # NTile(4) on the full partition, from (rk, n): bucket size n DIV 4,
    # first n%4 buckets hold one extra row.
    q4 = F.expr(
        """CASE
             WHEN rk <= (n DIV 4 + 1) * (n % 4)
               THEN CAST(ceil(rk / (n DIV 4 + 1.0)) AS INT)
             ELSE CAST((n % 4) + ceil((rk - (n DIV 4 + 1) * (n % 4)) / (n DIV 4 * 1.0)) AS INT)
           END"""
    )
    return ranked.select(
        "o_orderkey", "o_orderstatus", "rk", "rnk", "drnk", q4.alias("q4")
    )


@query(
    "window_lag",
    oracle="""
    SELECT event_id,
           lag(event_id)    OVER w AS prev_id,
           lead(event_type) OVER w AS next_type,
           first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS first_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value and inter-event gaps per user session
    stream — the per-key sequential analytics the reference's
    creation-log ordering implies (seqnum gaps, routeviews.go:25-31).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "event_id",
        F.lag("event_id").over(w).alias("prev_id"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_id").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("first_id"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "window_moving",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS mv3_sum,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mv3_n
    FROM orders
    """,
    tags=("window",),
)
def window_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 3-row aggregate frame per customer order history.

    The frame sum runs in DECIMAL so partial order never matters;
    ROWS frames (not RANGE) keep the frame contents deterministic
    under the tie-broken sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum(dec("o_totalprice", 2)).over(w).cast("double"), 2).alias("mv3_sum"),
        F.count(F.lit(1)).over(w).alias("mv3_n"),
    )


@query(
    "window_running",
    oracle="""
    SELECT user_id, event_id,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
               AS running_value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    """,
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) per-key sum — the watermark-accumulation
    shape of the reference's seqnum tracking (downloader.go:61-62),
    generalized to values."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(dec("value", 2)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("double"),
            2,
        ).alias("running_value"),
        F.row_number().over(w).alias("seq"),
    )


@query(
    "window_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    flagged AS (
      SELECT user_id, day,
             CASE WHEN day - lag(day) OVER (PARTITION BY user_id ORDER BY day) = 1
                  THEN 0 ELSE 1 END AS is_start
      FROM days
    ),
    islands AS (
      SELECT user_id, day,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY day) AS island_id
      FROM flagged
    )
    SELECT user_id,
           CAST(min(day) AS BIGINT) AS start_day,
           CAST(max(day) AS BIGINT) AS end_day,
           CAST(count(*) AS BIGINT) AS n_days
    FROM islands
    GROUP BY user_id, island_id
    """,
    tags=("window", "gaps-islands", "sessionize"),
)
def window_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    user — streak detection, the calendar-grain cousin of
    events_sessionize (which segments on a time gap, not day
    adjacency).

    Spark uses the classic row_number ANCHOR trick — day - row_number
    is constant within a consecutive run — so ONE window pass assigns
    island identity with no lag/running-sum cascade; the oracle uses
    the two-window lag-flag + running-sum formulation instead.  Two
    independent island constructions, one hash.

    Scale: distinct (user, day) first (map-side combinable, collapses
    the fact by ~events-per-user-day), then a single user-partitioned
    window — per-user day sequences are tiny and uniform, and the
    final rollup reuses the same user partitioning."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id", F.expr("unix_micros(ts) DIV 86400000000").alias("day")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.withColumn(
        "anchor", F.col("day") - F.row_number().over(w)
    )
    return anchored.groupBy("user_id", "anchor").agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("anchor")


@query(
    "window_cum_distinct",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type,
             CAST(min(epoch_us(ts)) // 86400000000 AS BIGINT) AS first_day
      FROM events GROUP BY user_id, event_type
    ),
    days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    )
    SELECT d.user_id, d.day,
           CAST(count(f.event_type) AS BIGINT) AS types_seen
    FROM days d
    LEFT JOIN firsts f ON f.user_id = d.user_id AND f.first_day <= d.day
    GROUP BY d.user_id, d.day
    """,
    tags=("window", "distinct", "cumulative"),
)
def window_cum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count: per user per active day, how many
    distinct event types they have used so far — the feature-adoption
    curve ("day N of a user's life, how much of the product have
    they touched").  Plain cumulative windows can't de-duplicate, so
    the scaling rewrite reduces distinctness to FIRST OCCURRENCES:
    one aggregation finds each (user, type)'s first day, a flag
    marks firsts on the day table, and a running SUM of flags equals
    the running distinct count — shuffle sizes are |user x type| and
    |user x day|, both tiny against the fact.

    Spark runs the flag + running-sum form (one user-partitioned
    window); the oracle instead counts firsts-at-or-before each day
    with a range join — two constructions, one hash."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min(day).alias("first_day")
    )
    days = ev.select("user_id", day.alias("day")).distinct()
    flags = (
        firsts.groupBy("user_id", F.col("first_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    joined = days.join(flags, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.sum("new_types").over(w).cast("long").alias("types_seen"),
    )
