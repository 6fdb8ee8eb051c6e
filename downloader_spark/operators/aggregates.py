"""Aggregation operators (SURVEY.md §2.B): hash aggregation, exact and
approximate distinct, rollup/cube grouping sets.

All groupBys here are two-phase (map-side partial + final) by
Catalyst construction — the shuffle carries combined partials, not
rows.  Float sums go through DECIMAL (functions/numeric.py) so the
value hash matches DuckDB regardless of partial-aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.functions.numeric import (
    dec,
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
)
from downloader_spark.io import load_table, spread
from downloader_spark.plans.registry import query


@query(
    "agg_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_money_sum("l_quantity", "sum_qty", scale=2)},
           {sql_money_sum("l_extendedprice", "sum_base_price", scale=2)},
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_disc_price,
           {sql_money_avg("l_quantity", "avg_qty", scale=2)},
           {sql_money_avg("l_extendedprice", "avg_price", scale=2)},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: sum/avg/count over a scan
    filter and a 2-column group.

    The headline aggregation benchmark: one pushed filter, one
    6-group hash agg, everything whole-stage-codegen'd.
    """
    # CPU-dense decimal partials over the single-split fixture scan:
    # spread across cores before the aggregation (no-op on multi-split
    # inputs; the sql_q1_pricing posture)
    li = spread(
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .select(
            "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ),
        key="l_orderkey",
    )
    disc_price = dec("l_extendedprice", 2) * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(18,2)"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity", "sum_qty", scale=2),
        money_sum("l_extendedprice", "sum_base_price", scale=2),
        F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
        money_avg("l_quantity", "avg_qty", scale=2),
        money_avg("l_extendedprice", "avg_price", scale=2),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(DISTINCT o_orderpriority) AS n_prio
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT DISTINCT alongside a plain count.

    Spark plans this as expand + two-stage agg; distinct sets are
    partially deduped map-side before the shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
    )


@query(
    "agg_approx",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type.

    Sketch estimates are engine-specific and can never hash-match
    DuckDB's estimator, so the raw estimate is not emitted.  The
    checkable surface instead: the exact distinct count plus
    ``approx_ok`` = "the HLL estimate is within 10% of exact" (rsd is
    0.02, so a passing run proves the sketch actually ran and
    converged; Spark's HLL is deterministic for a given dataset, so
    the boolean is stable).  The oracle asserts TRUE.

    The point at 100 TB: the HLL sketch is constant-size per group, so
    the shuffle is O(groups), not O(distinct values) like the exact
    form — keep the exact column only at validation scale.
    """
    events = load_table(spark, sf_dir, "events")
    # Pre-aggregate to distinct (event_type, user_id) pairs first: the
    # exact distinct count becomes a plain count(*), and the HLL sketch
    # is duplicate-insensitive so feeding it deduped values yields the
    # same estimate — one hash shuffle instead of countDistinct's
    # expand + double aggregation (measured ~1.8x r01 -> comfortably
    # under with this shape).
    pairs = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.count(F.lit(1))
    return pairs.groupBy("event_type").agg(
        F.sum("n_rows").alias("n"),
        exact.alias("exact_users"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.1 * exact.cast("double")
        ).alias("approx_ok"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n,
           {sql_money_sum("c_acctbal", "total_bal", scale=2)}
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
    tags=("aggregate",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical grouping sets: (segment, nation), (segment), ().

    Spark's rollup expands each input row once per grouping set then
    hash-aggregates; subtotal rows carry NULL group keys exactly as
    ANSI ROLLUP does.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("c_acctbal", "total_bal", scale=2),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_money_sum("l_quantity", "sum_qty", scale=2)}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two low-cardinality dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("l_quantity", "sum_qty", scale=2),
    )


@query(
    "agg_outliers",
    oracle="""
    WITH q AS (
      SELECT l_orderkey, l_linenumber, l_partkey,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    stats AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
             sum(qty) AS s, sum(qty * qty) AS ss
      FROM q GROUP BY l_partkey
    )
    SELECT q.l_orderkey, q.l_linenumber, q.l_partkey, q.qty
    FROM q JOIN stats t ON t.l_partkey = q.l_partkey
    WHERE t.n >= 5
      AND (t.n * q.qty - t.s) * (t.n * q.qty - t.s) * 4
          > 9 * (t.n * t.ss - t.s * t.s)
    """,
    tags=("aggregate", "outlier", "quality"),
)
def agg_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sigma-rule outlier flagging WITHOUT floats: a lineitem is
    flagged when its quantity deviates more than 1.5 standard
    deviations from its part's mean — but mean and stddev never
    materialize.  |q - s/n| > (3/2)·sqrt(ss/n - (s/n)²) is multiplied
    through by (2n)² into the all-integer inequality
    (n·q - s)²·4 > 9·(n·ss - s²), so the flag is bit-exact on both
    engines (any float-formulated z-score would hash-diverge on the
    division/sqrt) — the data-cleaning primitive for numeric columns,
    same verifiable-surface trick as the dedup family's floor-ppm.

    Two passes: one map-side-combinable (n, Σq, Σq²) aggregation per
    part, then the moments join back (broadcast-or-hash as the
    optimizer prefers — the stats table is |parts| rows) and the flag
    is a row-local predicate.  Groups with n < 5 are skipped (a
    5-row variance is noise, and n·ss - s² = 0 for constant groups
    would flag nothing anyway).  Integer range: safe while
    n·max(q)² < 2⁶³/n, i.e. any realistic per-part row count."""
    q = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    stats = q.groupBy("l_partkey").agg(
        F.count("*").alias("n"),
        F.sum("qty").alias("s"),
        F.sum(F.expr("qty * qty")).alias("ss"),
    )
    return (
        q.join(stats, "l_partkey")
        .filter(
            (F.col("n") >= 5)
            & (
                (F.col("n") * F.col("qty") - F.col("s"))
                * (F.col("n") * F.col("qty") - F.col("s"))
                * 4
                > 9 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
            )
        )
        .select("l_orderkey", "l_linenumber", "l_partkey", "qty")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    WITH bits AS (
      SELECT event_type,
             CAST(user_id // 60 AS BIGINT) AS bucket,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 60 AS INT)) AS bm
      FROM events GROUP BY event_type, user_id // 60
    )
    SELECT event_type,
           CAST(SUM(bit_count(bm)) AS BIGINT) AS distinct_users,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM bits GROUP BY event_type
    """,
    tags=("aggregate", "distinct", "bitmap"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-based exact distinct counting — the scalable alternative
    to COUNT(DISTINCT) for dense integer keys: pack each 60-key id
    range into one BIGINT bitmap with bit_or (associative, map-side
    combinable — unlike the expand-based distinct rewrite), then sum
    popcounts.  Two aggregations but the first shrinks the data
    60:1 and both partial-aggregate; at 100 TB this is the
    roaring-bitmap pattern every OLAP engine uses for user-count
    rollups, expressed with nothing but bit_or/bit_count/shiftleft.

    60-bit buckets, not 64: DuckDB raises on ``1 << 63`` overflow
    while Java wraps — staying below bit 62 keeps the bitmaps
    bit-identical on both engines.  Verified equal to the exact
    COUNT(DISTINCT) in tests."""
    ev = load_table(spark, sf_dir, "events")
    bits = ev.groupBy(
        "event_type",
        F.expr("CAST(user_id DIV 60 AS BIGINT)").alias("bucket"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 60 AS INT)))"
        ).alias("bm")
    )
    return bits.groupBy("event_type").agg(
        F.expr("CAST(SUM(bit_count(bm)) AS BIGINT)").alias("distinct_users"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS p,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ),
    c AS (
      SELECT flag, p, wt,
             SUM(wt) OVER (PARTITION BY flag ORDER BY p, wt
                           ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY flag) AS tw
      FROM x
    )
    SELECT flag, MIN(p) AS weighted_median_pu
    FROM c WHERE cw * 2 >= tw GROUP BY flag
    """,
    tags=("aggregate", "percentile", "window"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    50th percentile no SQL engine exposes as a one-call aggregate:
    sort each group by price, accumulate weights, and take the first
    value whose cumulative weight reaches half the total.  Entirely
    integer (4dp price units, BIGINT weights), with a total order
    (p, wt) inside the cumulative sum so both engines accumulate in
    the identical sequence — bit-exact without any float quantile
    interpolation.

    One window shuffle on the group key, then a trivial MIN
    aggregation over the filtered rows.  At 100 TB the group-ordered
    window is the cost — same shape (and same key) as any per-group
    ranking; nothing global."""
    x = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
        ).alias("p"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("wt"),
    )
    from pyspark.sql import Window as W

    cum = (
        W.partitionBy("flag")
        .orderBy("p", "wt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = W.partitionBy("flag")
    c = x.select(
        "flag",
        "p",
        F.sum("wt").over(cum).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return (
        c.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("p").alias("weighted_median_pu"))
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT event_type,
           user_id AS top_user,
           event_id AS top_event,
           CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS top_value_pu
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY event_type
      ORDER BY CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) DESC,
               event_id
    ) = 1
    """,
    tags=("aggregate", "argmax"),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG MAX — the full row attributes of each group's maximum
    (SQL's max_by / arg_max), with the tie pinned to the smallest
    event_id so the answer is unique.  The Spark side is a struct-max
    over (value, -event_id, user_id) — associative, map-side
    combinable, no window, no second pass; the oracle is an
    independent QUALIFY row_number ranking.  Two different
    algorithms, one hash (the agg_mode pattern).

    One partial-aggregated shuffle carrying |groups| combiner rows
    per partition — the cheapest possible per-group extremum at any
    scale (the reference's top-1-by-name repair, A8, is this same
    shape)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias("pu"),
    )
    return (
        ev.groupBy("event_type")
        .agg(F.max(F.struct(F.col("pu"), (-F.col("event_id")).alias("neg_eid"), F.col("user_id"))).alias("m"))
        .select(
            "event_type",
            F.col("m.user_id").alias("top_user"),
            (-F.col("m.neg_eid")).alias("top_event"),
            F.col("m.pu").alias("top_value_pu"),
        )
    )


@query(
    "agg_histogram_eqdepth",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority,
             ntile(8) OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                             AS BIGINT), o_orderkey) AS bucket,
             CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS p
      FROM orders
    )
    SELECT o_orderpriority, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           MIN(p) AS lo_pu, MAX(p) AS hi_pu
    FROM t GROUP BY o_orderpriority, bucket
    """,
    tags=("aggregate", "histogram", "statistics", "window"),
)
def agg_histogram_eqdepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram per priority class — the CBO-statistics
    primitive (equal row count per bucket, data-driven boundaries)
    complementing agg_histogram's fixed-width bins.  ntile(8) over a
    tie-broken total order (price units, then order key) assigns
    bucket ids deterministically; the bucket rollup then reports
    each bucket's population and [lo, hi] boundary in exact 4dp
    integers.

    The window partitions by the priority class, never globally —
    bounded partitions at any scale.  (A truly global equi-depth
    histogram at 100 TB would use approx_percentile boundaries
    instead of a global sort; the per-class form here is the shape
    optimizers actually collect, one histogram per partition
    column value.)"""
    from pyspark.sql import Window as W

    t = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)").alias(
            "p"
        ),
    )
    w = W.partitionBy("o_orderpriority").orderBy("p", "o_orderkey")
    b = t.select(
        "o_orderpriority", F.ntile(8).over(w).cast("long").alias("bucket"), "p"
    )
    return b.groupBy("o_orderpriority", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("p").alias("lo_pu"),
        F.max("p").alias("hi_pu"),
    )


# Time-decayed sum: half-life of one day, ages capped to keep the
# power-of-two divisor inside a BIGINT.
DECAY_MAX_AGE = 62


@query(
    "agg_decay_sum",
    oracle=f"""
    WITH anchored AS (
      SELECT user_id,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             (SELECT max(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
              FROM events) AS max_day
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents // (CAST(1 AS BIGINT)
                              << CAST(least(max_day - day, {DECAY_MAX_AGE})
                                      AS INT))) AS BIGINT)
             AS decayed_cents,
           CAST(max(day) AS BIGINT) AS last_day
    FROM anchored
    GROUP BY user_id
    """,
    tags=("aggregate", "timeseries", "feature"),
)
def agg_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user — the
    feature-store staple (recent activity counts, old activity
    fades) with a one-day half-life.

    Float decay (value * 0.5^age) cannot hash across engines; the
    exact form divides floor-cents by the POWER-OF-TWO divisor
    1 << age — bit-identical everywhere, halving per day like the
    float version, and still associative for map-side partials.  The
    corpus max-day anchor is a 1-row aggregate that BROADCASTS onto
    the scan (stream_late_filter's watermark-scalar shape); ages cap
    at {DECAY_MAX_AGE} so the shift never overflows.  One scalar
    broadcast + one hash aggregation — no window, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    max_day = ev.agg(F.max(day).alias("max_day"))
    anchored = ev.crossJoin(F.broadcast(max_day)).select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        day.alias("day"),
        "max_day",
    )
    age = F.least(
        F.col("max_day") - F.col("day"), F.lit(DECAY_MAX_AGE)
    ).cast("int")
    return anchored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.expr(
                f"cents DIV shiftleft(CAST(1 AS BIGINT),"
                f" CAST(least(max_day - day, {DECAY_MAX_AGE}) AS INT))"
            )
        ).alias("decayed_cents"),
        F.max("day").alias("last_day"),
    )


@query(
    "agg_share_of_total",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS nation_rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           round(CAST(nation_rev AS DOUBLE), 2) AS nation_revenue,
           round(CAST(SUM(nation_rev) OVER (PARTITION BY region) AS DOUBLE), 2)
             AS region_revenue,
           round(CAST(nation_rev AS DOUBLE)
                 / CAST(SUM(nation_rev) OVER (PARTITION BY region) AS DOUBLE), 6)
             AS share_r6
    FROM rev
    """,
    tags=("aggregate", "window", "ratio"),
)
def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent report: each nation's share of its REGION's
    revenue — the % -of-total column every BI table carries, built as
    a window-over-aggregate (the parent total is a window SUM over
    the already-aggregated child rows, never a second scan or a
    self-join back to the fact).

    The window runs on the |nations| aggregate table — 25 rows — so
    "window after aggregate" costs nothing at any fact scale; the
    fact is touched exactly once.  Decimal sums both levels; the
    share divides the two exact decimals in double."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(dec("l_extendedprice", 2)).cast("decimal(38,2)").alias("nation_rev")
        )
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.round(F.col("nation_rev").cast("double"), 2).alias("nation_revenue"),
        F.round(F.sum("nation_rev").over(wr).cast("double"), 2).alias(
            "region_revenue"
        ),
        F.round(
            F.col("nation_rev").cast("double")
            / F.sum("nation_rev").over(wr).cast("double"),
            6,
        ).alias("share_r6"),
    )
