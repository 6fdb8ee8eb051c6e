"""Round-6 surface extensions: the remaining TPC-H report shapes the
SQL surface lacked (Q4/Q7/Q9/Q11/Q12/Q15/Q20/Q21 analogs, adapted to
the reduced fixture schema — no partsupp/commitdate/shipmode columns
ship with the corpus) plus the learned-cluster SemDeDup composition
the r5 verdict requested (embed_kmeans assignments feeding the
semantic prune, end-to-end learned).

Unlike olap_shapes' same-text-both-engines keys, every key here is a
GENUINE cross-engine differential: the Spark side is an independent
DataFrame-algebra algorithm (per-order max-lag aggregation instead of
correlated EXISTS, top-2 per-order statistics instead of NOT EXISTS,
broadcast scalar thresholds instead of scalar subqueries) checked
against DuckDB's correlated-subquery formulation — two constructions,
one hash.

Driver rotation: module import order in plans/catalog.py is
APPEND-ONLY (the ordering rule and its rationale live in
plans/catalog.py — newest round module goes last).

Cross-engine exactness: floor-cents/centi-quantity BIGINTs for every
compared amount (floor over an IEEE double product is deterministic),
DECIMAL-sum -> round(double, 2) for reported money, epoch-day integer
arithmetic for date lags (Spark DIV == DuckDB // on non-negatives).

Scale notes (100 TB):
- ``sql_q4_late_orders`` aggregates lineitem per order FIRST (partial
  agg, one combiner row per order) and joins the pre-filtered orders
  — never a correlated per-row probe.
- ``sql_q7_nation_flows`` filters the nation dimension to the two
  target names BEFORE joining, so the fact scan prunes through two
  broadcast chains (supplier-side and customer-side).
- ``sql_q9_part_profit`` pushes the LIKE filter into the broadcast
  part dimension; the fact joins a shrunken build side.
- ``sql_q11_key_parts`` / ``sql_q15_top_supplier`` broadcast a 1-row
  scalar (corpus total / max) onto the aggregated table — the
  agg_decay_sum anchor shape; no re-aggregation per row.
- ``sql_q12_lag_buckets`` is one fact-fact equi join + ONE
  conditional aggregation (3-row output) — Q12's CASE-sum shape.
- ``sql_q20_excess_share`` reuses the per-(part,supplier) aggregate
  for the per-part total (two chained partial aggs), then semi-joins
  suppliers — bucketed by part key throughout.
- ``sql_q21_last_shipper`` replaces the classic double-correlated
  EXISTS/NOT EXISTS with per-order top-2 order statistics (max,
  count-at-max, runner-up) computed in ONE aggregation and joined
  back — O(|lineitem|) shuffled once on orderkey, no per-row
  subquery, skew-bounded by order size.
- ``dedup_semantic_learned`` inherits embed_kmeans' driver loop
  (k x dims ints per iteration) and dedup_semantic's one-struct-max-
  per-cluster prune; the only new cost is one assignment projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table, spread
from downloader_spark.operators.llm_similarity import (
    km_assign_expr,
    km_cte_chain,
    km_fit,
    km_quantized_points,
    KM_DIMS,
    KM_K,
)
from downloader_spark.operators.llm_text import (
    DUCK_QUALITY_EXPR,
    quality_stat_columns,
    spark_quality_from_stats,
)
from downloader_spark.plans.registry import query

# Q4: an order "shipped late" if any line ships > LATE_DAYS after the
# order date; Q7: the two trade nations; Q9/Q20: part-name filters;
# Q21: the audited supplier nation.
LATE_DAYS = 60
Q7_NATIONS = ("NATION_3", "NATION_7")
Q9_PART_LIKE = "%red%"
Q20_PART_LIKE = "small%"
Q21_NATION = "NATION_4"

_SPARK_DAY = "unix_micros(CAST({c} AS TIMESTAMP)) DIV 86400000000"
_DUCK_DAY = "epoch_us({c}) // 86400000000"


@query(
    "sql_q4_late_orders",
    oracle=f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND {_DUCK_DAY.format(c="l.l_shipdate")}
              - {_DUCK_DAY.format(c="o.o_orderdate")} > {LATE_DAYS}
      )
    GROUP BY o_orderpriority
    """,
    tags=("sql", "subquery", "semi-join", "aggregate"),
)
def sql_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped priority check: how many 1996 orders, per
    priority class, had at least one line shipped more than
    {LATE_DAYS} days after ordering (the fixture has no commit/receipt
    dates; ship-lag is the late criterion).

    The oracle is the classic correlated EXISTS; the Spark side is
    the de-correlated algebra — lineitem pre-aggregates its max ship
    day per order (partial agg: one combiner row per order per
    partition), joins the date-pruned orders scan, and the lag filter
    plus a tiny priority rollup finish driver-side-free.  At 100 TB
    the per-order aggregate is the only fact shuffle and the EXISTS
    never re-probes."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    max_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.expr(_SPARK_DAY.format(c="l_shipdate"))).alias("max_day"))
    )
    late = orders.join(
        max_ship, orders.o_orderkey == max_ship.l_orderkey
    ).filter(
        F.col("max_day") - F.expr(_SPARK_DAY.format(c="o_orderdate"))
        > LATE_DAYS
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "sql_q7_nation_flows",
    oracle=f"""
    WITH flows AS (
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1.0 - l.l_discount AS DECIMAL(8,4)) AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE (sn.n_name = '{Q7_NATIONS[0]}' AND cn.n_name = '{Q7_NATIONS[1]}')
         OR (sn.n_name = '{Q7_NATIONS[1]}' AND cn.n_name = '{Q7_NATIONS[0]}')
    )
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 2) AS revenue
    FROM flows GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("sql", "join", "aggregate", "report"),
)
def sql_q7_nation_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped bilateral trade volume: revenue flowing each
    direction between two nations, per ship year — the classic
    "who sells to whom" report over a 6-relation tree.

    Spark side filters nation to the TWO target names before any
    fact touches it, so both dimension chains (supplier->nation,
    customer->orders->nation) broadcast shrunken build sides and the
    disjunctive pair predicate collapses to a cheap post-join filter
    on two broadcast columns; one decimal partial agg finishes.  The
    oracle keeps the textbook formulation with the OR over the full
    dimension join."""
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*Q7_NATIONS)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nations.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem")
    flows = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return flows.groupBy(
        "supp_nation",
        "cust_nation",
        F.expr("CAST(year(l_shipdate) AS BIGINT)").alias("l_year"),
    ).agg(
        F.round(
            F.sum(
                F.expr(
                    "CAST(l_extendedprice AS DECIMAL(18,2))"
                    " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
                )
            ).cast("double"),
            2,
        ).alias("revenue")
    )


@query(
    "sql_q9_part_profit",
    oracle=f"""
    WITH profits AS (
      SELECT sn.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1.0 - l.l_discount AS DECIMAL(8,4))
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(18,2))
               * CAST(0.5 AS DECIMAL(2,1)) AS amount
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
                 AND p.p_name LIKE '{Q9_PART_LIKE}'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT nation, o_year,
           round(CAST(sum(amount) AS DOUBLE), 2) AS profit
    FROM profits GROUP BY nation, o_year
    """,
    tags=("sql", "join", "aggregate", "report"),
)
def sql_q9_part_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped product profit: per supplier nation and order
    year, revenue minus a retail-price-based cost surrogate (the
    fixture has no partsupp supplycost; half the catalog price per
    unit stands in) for parts matching a name pattern.

    The LIKE filter is applied to the part DIMENSION before the
    broadcast, so the fact join's build side holds only matching
    parts and non-matching lineitems drop at the join — the
    filter-through-dimension prune Q9 exists to exercise.  All
    amounts are exact decimals until the final round(double, 2)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(Q9_PART_LIKE)
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem")
    profits = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    amount = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
        " - CAST(p_retailprice AS DECIMAL(18,2))"
        "   * CAST(l_quantity AS DECIMAL(18,2))"
        "   * CAST(0.5 AS DECIMAL(2,1))"
    )
    return profits.groupBy(
        "nation",
        F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("o_year"),
    ).agg(F.round(F.sum(amount).cast("double"), 2).alias("profit"))


@query(
    "sql_q11_key_parts",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey AS partkey,
             CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS v_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = '{Q7_NATIONS[1]}'
      GROUP BY l.l_partkey
    )
    SELECT partkey, v_cents
    FROM val
    WHERE v_cents * 1000 > (SELECT sum(v_cents) FROM val)
    """,
    tags=("sql", "subquery", "aggregate", "having"),
)
def sql_q11_key_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped key-inventory report: parts whose shipped
    value from one nation's suppliers exceeds 0.1% of that nation's
    total — the scalar-subquery HAVING over a grouped aggregate
    (value is floor-cents so the share comparison is pure BIGINT).

    Spark computes the per-part value table ONCE, derives the global
    threshold as a 1-row aggregate OF THAT TABLE, and broadcasts it
    back as a filter — the decay-sum anchor shape; at 100 TB the
    part-value aggregation is the only data shuffle and the total
    never re-scans the fact."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q7_NATIONS[1]
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            ).alias("v_cents")
        )
    )
    # val feeds both the output rows and the global total:
    # materialize it once (minhash materialization precedent) so the
    # fact scan + supplier join run ONCE, not per consumer
    val = val.localCheckpoint()
    total = val.agg(F.sum("v_cents").alias("total_cents"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v_cents") * 1000 > F.col("total_cents"))
        .select("partkey", "v_cents")
    )


@query(
    "sql_q12_lag_buckets",
    oracle=f"""
    WITH lagged AS (
      SELECT CAST({_DUCK_DAY.format(c="l.l_shipdate")}
                  - {_DUCK_DAY.format(c="o.o_orderdate")} AS BIGINT)
               AS lag_days,
             o.o_orderpriority AS pri
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT CASE WHEN lag_days <= 30 THEN 'fast'
                WHEN lag_days <= 90 THEN 'medium'
                ELSE 'slow' END AS ship_bucket,
           CAST(sum(CASE WHEN pri IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN pri IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lagged GROUP BY 1
    """,
    tags=("sql", "join", "aggregate", "case"),
)
def sql_q12_lag_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped shipping-performance report: lineitems
    bucketed by ship lag (days from order to ship; the fixture has no
    shipmode, so the lag bucket is the service tier), counting high-
    vs low-priority lines per bucket — the CASE-inside-SUM shape.

    One fact-fact equi join (orders projected to two columns) feeding
    ONE conditional aggregation with a 3-row output; both CASE sums
    ride the same partial agg.  Day arithmetic is integer epoch-days
    on both engines (non-negative, so DIV == //)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr(_SPARK_DAY.format(c="l_shipdate")).alias("l_day")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(_SPARK_DAY.format(c="o_orderdate")).alias("o_day"),
    )
    lag = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        (F.col("l_day") - F.col("o_day")).alias("lag_days"),
        F.col("o_orderpriority").alias("pri"),
    )
    bucket = (
        F.when(F.col("lag_days") <= 30, "fast")
        .when(F.col("lag_days") <= 90, "medium")
        .otherwise("slow")
    )
    high = F.col("pri").isin("1-URGENT", "2-HIGH")
    return lag.groupBy(bucket.alias("ship_bucket")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


@query(
    "sql_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.rev_cents
    FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
    WHERE r.rev_cents = (SELECT max(rev_cents) FROM rev)
    """,
    tags=("sql", "subquery", "aggregate", "top1"),
)
def sql_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: the supplier(s) with the
    highest quarterly revenue, revenue in exact floor-cents so the
    max-equality join is integer.

    The oracle's scalar subquery becomes a broadcast 1-row max joined
    onto the (already tiny) per-supplier revenue table; supplier
    attributes broadcast-join last.  The revenue aggregation is the
    only data-sized shuffle — Q15's view materialization collapses
    into one reusable DataFrame."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(
            F.expr(
                "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)"
                " AS BIGINT)"
            )
        ).alias("rev_cents")
    )
    # rev feeds the output rows AND the scalar max: materialize the
    # |suppliers|-row aggregate once so the fact scans once
    rev = rev.localCheckpoint()
    top = rev.agg(F.max("rev_cents").alias("max_cents"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(supp), F.col("suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "rev_cents")
    )


@query(
    "sql_q20_excess_share",
    oracle=f"""
    WITH pq AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT))
                  AS BIGINT) AS sq
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    ),
    tot AS (SELECT partkey, sum(sq) AS tq FROM pq GROUP BY partkey)
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT pq.suppkey
      FROM pq
      JOIN tot ON pq.partkey = tot.partkey
      JOIN part p ON p.p_partkey = pq.partkey
                 AND p.p_name LIKE '{Q20_PART_LIKE}'
      WHERE pq.sq * 2 > tot.tq
    )
    """,
    tags=("sql", "subquery", "semi-join", "aggregate"),
)
def sql_q20_excess_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped dominant-supplier audit: suppliers who
    shipped MORE THAN HALF of some matching part's yearly volume
    (the fixture has no partsupp availability; majority share of
    shipped quantity is the excess criterion).  Quantities are
    centi-units, so the share comparison is pure BIGINT.

    Spark chains the two aggregation levels — per-(part,supplier)
    then per-part — with the second REUSING the first's output
    (shuffled once on the part key), applies the part-name filter as
    a broadcast semi join on the small aggregate (not the fact), and
    finishes with a left-semi join into supplier.  The oracle keeps
    the nested-IN formulation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    pq = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.col("l_suppkey").alias("suppkey"),
    ).agg(
        F.sum(F.expr("CAST(floor(l_quantity * 100) AS BIGINT)")).alias("sq")
    )
    # pq feeds both aggregation levels: materialize the
    # per-(part,supplier) aggregate once so the fact scans once
    pq = pq.localCheckpoint()
    tot = pq.groupBy("partkey").agg(F.sum("sq").alias("tq"))
    matching = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(Q20_PART_LIKE)
    ).select("p_partkey")
    dominant = (
        pq.join(tot, "partkey")
        .join(F.broadcast(matching), F.col("partkey") == F.col("p_partkey"))
        .filter(F.col("sq") * 2 > F.col("tq"))
        .select("suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        dominant, supp.s_suppkey == dominant.suppkey, "leftsemi"
    ).select("s_suppkey", "s_name")


@query(
    "sql_q21_last_shipper",
    oracle=f"""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
                 AND n.n_name = '{Q21_NATION}'
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    """,
    tags=("sql", "subquery", "anti-join", "aggregate"),
)
def sql_q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped blame report: for one nation's suppliers,
    count finished-order lineitems where that supplier shipped
    strictly LAST among the order's >= 2 suppliers (no commit/receipt
    dates in the fixture; "kept everyone waiting" is being the unique
    latest shipper).

    The oracle is the classic EXISTS + NOT-EXISTS double correlation.
    The Spark side de-correlates into per-order ORDER STATISTICS
    computed in one aggregation pass over the per-(order, supplier)
    max-ship table: the order's supplier count, its max ship date
    M1, how many suppliers achieve M1, and the runner-up M2.  A row
    survives iff its order has >= 2 suppliers (the EXISTS) and the
    max over OTHER suppliers — M1 unless this supplier is the UNIQUE
    M1 achiever, else M2 — does not exceed its own ship date (the
    NOT EXISTS).  One orderkey shuffle, no correlated probes, and
    per-order state is 4 scalars regardless of order width."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == Q21_NATION
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    # per-(order, supplier) latest shipment
    smax = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    # smax has three consumers (the m1 inner aggregate, the stats
    # conditional aggregate, and the per-row join back): materialize
    # the per-(order,supplier) aggregate once
    smax = smax.localCheckpoint()
    # per-order order statistics over supplier maxima: count, max M1,
    # count-at-M1, runner-up M2 — M1 joins back onto the (tiny,
    # already order-partitioned) smax table so the conditional
    # aggregation computes cnt1/m2 in one more pass, never re-reading
    # the fact.  (An unordered-window-max formulation was A/B'd at
    # sf0.1 and 10x — 3.09/9.28 s vs 2.19/8.86 s for this join form —
    # measured-and-rejected; the join also keeps the plan window-free,
    # PERF.md round 6.)
    stats = (
        smax.join(
            smax.groupBy("l_orderkey").agg(F.max("s_max").alias("m1")),
            "l_orderkey",
        )
        .groupBy("l_orderkey", "m1")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.when(F.col("s_max") == F.col("m1"), 1).otherwise(0)).alias(
                "cnt1"
            ),
            F.max(F.when(F.col("s_max") < F.col("m1"), F.col("s_max"))).alias(
                "m2"
            ),
        )
    )
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders_f, F.col("l_orderkey") == orders_f.o_orderkey)
        .join(stats, "l_orderkey")
        .join(smax, ["l_orderkey", "l_suppkey"])
    )
    other_max = F.when(
        (F.col("s_max") == F.col("m1")) & (F.col("cnt1") == 1), F.col("m2")
    ).otherwise(F.col("m1"))
    kept = l1.filter(
        (F.col("n_supp") >= 2) & (other_max <= F.col("l_shipdate"))
    )
    return kept.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


def _learned_semantic_oracle() -> str:
    chain, prev = km_cte_chain()
    dist = " + ".join(
        f"(p.q{i} - c.c{i}) * (p.q{i} - c.c{i})" for i in range(KM_DIMS)
    )
    return f"""
    {chain},
    fa AS (
      SELECT p.vec_id, arg_min(c.cid, ({dist}) * {KM_K} + c.cid) AS cid
      FROM pts p CROSS JOIN {prev} c GROUP BY ALL
    ),
    scored AS (
      SELECT fa.cid AS cluster_id, d.doc_id,
             CAST(floor(({DUCK_QUALITY_EXPR}) * 1000000) AS BIGINT) AS q_ppm
      FROM fa JOIN documents d ON d.doc_id = fa.vec_id
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc,
           CAST(max(CASE WHEN rn = 1 THEN q_ppm END) AS BIGINT) AS keep_q_ppm
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY cluster_id ORDER BY q_ppm DESC NULLS LAST, doc_id
      ) AS rn
      FROM scored
    )
    GROUP BY cluster_id
    """


@query(
    "dedup_semantic_learned",
    oracle=_learned_semantic_oracle(),
    tags=("llm", "dedup", "semantic", "embedding", "iterative"),
)
def dedup_semantic_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup end-to-end LEARNED (r5 verdict item 8): instead of
    the pretrained ``label`` column (dedup_semantic), cluster
    assignments come from the repo's own k-means (embed_kmeans's
    exact integer trajectory), so the pipeline is
    fit -> assign -> prune with no external clustering.

    Composition: km_fit's driver loop yields final centroids (k x
    dims ints per iteration, nothing data-sized collects), one
    codegen'd CASE projection assigns every vector, and the prune is
    dedup_semantic's ONE struct-max per cluster over ppm-exact
    quality — associative, map-side combinable, no window over data.
    The oracle unrolls the identical Lloyd iterations as chained
    CTEs (km_cte_chain), appends an arg_min assignment pass, and
    ranks with a window — two constructions, one hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = km_quantized_points(emb)
    cents, _ = km_fit(pts)
    assigned = pts.select(
        "vec_id", F.expr(km_assign_expr(cents)).alias("cluster_id")
    )
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select("doc_id", *quality_stat_columns())
    scored = assigned.join(stats, assigned.vec_id == stats.doc_id).select(
        "cluster_id",
        "doc_id",
        F.floor(spark_quality_from_stats() * 1_000_000)
        .cast("long")
        .alias("q_ppm"),
    )
    key = F.struct(
        F.col("q_ppm").isNotNull().alias("has_q"),
        F.col("q_ppm").alias("q"),
        (-F.col("doc_id")).alias("nd"),
        F.col("doc_id").alias("doc_id"),
    )
    return scored.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
        F.max(key).getField("doc_id").alias("keep_doc"),
        F.max(key).getField("q").alias("keep_q_ppm"),
    )


# Exact substring-span dedup (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better" — public paper): find
# cross-document repeated token SPANS, not whole-document near-dups.
SPAN_W = 5          # word w-grams; a run of R grams = R + W - 1 tokens
SPAN_MIN_RUN = 3    # report pairs sharing >= 3 consecutive grams
SPAN_DF_CAP = 20    # drop grams with more postings (hot-boilerplate cap)

_SPAN_NORM_SPARK = (
    "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' ')"
)
_SPAN_NORM_DUCK = (
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


def _h60_spark(arg: str) -> str:
    return f"CAST(conv(substring(md5({arg}), 1, 15), 16, 10) AS BIGINT)"


def _h60_duck(arg: str) -> str:
    return f"CAST(concat('0x', substring(md5({arg}), 1, 15)) AS BIGINT)"


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SPAN_NORM_DUCK} AS toks FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             {_h60_duck(f"array_to_string(toks[i:i+{SPAN_W - 1}], ' ')")} AS h
      FROM toks,
           unnest(generate_series(1, greatest(len(toks) - {SPAN_W - 1}, 0)))
             AS t(i)
    ),
    kept AS (SELECT h FROM grams GROUP BY h HAVING count(*) <= {SPAN_DF_CAP}),
    g AS (SELECT grams.* FROM grams JOIN kept USING (h)),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             a.pos - b.pos AS delta, a.pos AS pa
      FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    runs AS (
      SELECT da, db, count(*) AS run_len
      FROM (SELECT da, db, delta, pa,
                   pa - row_number() OVER (
                     PARTITION BY da, db, delta ORDER BY pa) AS grp
            FROM pairs)
      GROUP BY da, db, delta, grp
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST(max(run_len) AS BIGINT) AS max_run,
           CAST(max(run_len) + {SPAN_W - 1} AS BIGINT) AS span_tokens,
           CAST(sum(CASE WHEN run_len >= {SPAN_MIN_RUN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_spans
    FROM runs GROUP BY da, db
    HAVING max(run_len) >= {SPAN_MIN_RUN}
    """,
    tags=("llm", "dedup", "substring", "positional"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated SUBSTRING detection (Lee et al. 2021's
    exact-substring dedup, re-expressed relationally): document pairs
    sharing a run of >= {SPAN_MIN_RUN} consecutive word {SPAN_W}-grams
    — i.e. a verbatim span of >= {SPAN_MIN_RUN + SPAN_W - 1} tokens —
    with the longest shared span and the span count per pair.  This is
    the dedup the doc-level families (minhash/simhash/ngram) cannot
    see: two long documents sharing one copied paragraph.

    Spark shape: a POSITIONAL shingle index (doc, pos, h60(gram)) —
    the suffix-array role from the paper played by an inverted index —
    with a posting-count cap fused into a window count over the same
    h-partitioned exchange the self-join then REUSES (the
    dedup_ngram_jaccard exchange-reuse discipline); matching
    positions collapse to runs by the gaps-and-islands trick GROUPED
    ON THE ANTI-DIAGONAL (da, db, pos_a - pos_b): consecutive shared
    grams have constant delta, so pa - row_number() is constant
    exactly on a verbatim run.  Candidate work is bounded per gram by
    the {SPAN_DF_CAP}-posting cap (boilerplate grams drop), never
    all-pairs; every downstream key is (pair, delta) — uniform.  At
    100 TB this is the standard span-dedup pipeline: one gram
    exchange, one capped self-join, two aggregations."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.selectExpr("doc_id", f"{_SPAN_NORM_SPARK} AS toks")
        .selectExpr(
            "doc_id",
            "toks",
            f"CASE WHEN size(toks) >= {SPAN_W}"
            f" THEN sequence(1, size(toks) - {SPAN_W - 1})"
            " ELSE array() END AS idx",
        )
        .select("doc_id", F.explode("idx").alias("pos"), "toks")
        .selectExpr(
            "doc_id",
            "pos",
            _h60_spark(f"concat_ws(' ', slice(toks, pos, {SPAN_W}))") + " AS h",
        )
    )
    from pyspark.sql import Window

    w_h = Window.partitionBy("h")
    g = (
        grams.withColumn("df", F.count(F.lit(1)).over(w_h))
        .filter(F.col("df") <= SPAN_DF_CAP)
        .drop("df")
    )
    # both sides of the self-join consume g: materialize the capped
    # posting table once (minhash materialization precedent) so the
    # explode + md5 + df-cap pipeline runs ONCE, not per side
    g = g.localCheckpoint()
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("da"),
        F.col("b.doc_id").alias("db"),
        (F.col("a.pos") - F.col("b.pos")).alias("delta"),
        F.col("a.pos").alias("pa"),
    )
    w_run = Window.partitionBy("da", "db", "delta").orderBy("pa")
    runs = (
        pairs.withColumn("grp", F.col("pa") - F.row_number().over(w_run))
        .groupBy("da", "db", "delta", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy(
            F.col("da").alias("doc_a"), F.col("db").alias("doc_b")
        )
        .agg(
            F.max("run_len").alias("max_run"),
            F.sum(
                F.when(F.col("run_len") >= SPAN_MIN_RUN, 1).otherwise(0)
            ).alias("n_spans"),
        )
        .filter(F.col("max_run") >= SPAN_MIN_RUN)
        .select(
            "doc_a",
            "doc_b",
            "max_run",
            (F.col("max_run") + F.lit(SPAN_W - 1)).alias("span_tokens"),
            "n_spans",
        )
    )


@query(
    "sample_importance",
    oracle=f"""
    WITH q AS (
      SELECT doc_id,
             CAST(floor(({DUCK_QUALITY_EXPR}) * 1000000) AS BIGINT) AS q_ppm,
             {_h60_duck("concat('imp:', CAST(doc_id AS VARCHAR))")}
               % 1000000 AS draw_ppm
      FROM documents
    )
    SELECT doc_id, q_ppm, draw_ppm
    FROM q WHERE draw_ppm < q_ppm
    """,
    tags=("llm", "sampling", "quality"),
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional (importance) sampling: each document is
    kept with probability equal to its quality score — the
    data-pruning step that keeps a corpus's good tail at full weight
    while thinning boilerplate, without a hard cutoff.  Deterministic
    like sample_split: the draw is the md5-derived hash of the doc id
    reduced mod 1e6 and compared against the floor-ppm quality, so
    membership is identical under any partitioning, rerun, or engine
    (df.sample is partitioning-dependent and irreproducible).
    NULL-quality (empty) docs never pass the comparison in either
    engine.  Pure map stage over the scan — no shuffle at any
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select("doc_id", *quality_stat_columns())
    draw = F.expr(
        _h60_spark("concat('imp:', CAST(doc_id AS STRING))") + " % 1000000"
    )
    q = stats.select(
        "doc_id",
        F.floor(spark_quality_from_stats() * 1_000_000)
        .cast("long")
        .alias("q_ppm"),
        draw.alias("draw_ppm"),
    )
    return q.filter(F.col("draw_ppm") < F.col("q_ppm"))


@query(
    "text_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SPAN_NORM_DUCK} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] AS w1,
             concat_ws(' ', toks[i], toks[i+1]) AS bg
      FROM toks,
           unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)
    ),
    bgd AS (
      SELECT doc_id, w1, bg, CAST(count(*) AS BIGINT) AS n
      FROM bg GROUP BY ALL
    ),
    cbg AS (SELECT bg, sum(n) AS c_bg FROM bgd GROUP BY bg),
    cw1 AS (SELECT w1, sum(n) AS c_w1 FROM bgd GROUP BY w1)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_bigrams,
           CAST(sum(n * (c_bg * 1000000 // c_w1)) // sum(n) AS BIGINT)
             AS lm_score_ppm
    FROM bgd JOIN cbg USING (bg) JOIN cw1 USING (w1)
    GROUP BY doc_id
    """,
    tags=("llm", "text", "quality", "lm"),
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram language-model score per document — the
    perplexity-filter stand-in (KenLM-style fluency gating) made
    hash-exact: a document's score is the average conditional bigram
    probability p(w2|w1) = C(w1 w2) / C(w1 ·) over its bigram
    occurrences, in floor-ppm integer arithmetic (log-space
    perplexity is not cross-engine hash-safe; the average
    conditional probability ranks fluency the same way on a fixed
    corpus).  Repetitive/boilerplate docs score high, token-salad
    scores low — combined with text_quality it is the standard
    two-signal quality gate.

    Scale shape: ONE explode shuffled ONCE into per-(doc, w1,
    bigram) counts (`bgd`), which are materialized once and reused
    by all three consumers (the two corpus count tables and the
    scoring join).  `bgd` itself — which for natural text is close
    to token-stream-sized — does feed the two count-table exchanges
    and the final join, which is unavoidable for corpus-conditional
    counts; what is saved is re-running the explode+first-shuffle
    three times.  The count tables themselves are
    vocabulary-bounded, not corpus-bounded.  All divisions are
    non-negative integer floor (Spark DIV == DuckDB //)."""
    # spread: the tokenize + zip_with + explode + partial-aggregation
    # stage otherwise runs on the single-split scan task (profiled
    # r17: 1.31 s single-task stage, 1.27 s CPU — the key's dominant
    # stage); the doc_id exchange moves only the raw (doc_id, text)
    # rows once and is a no-op at 100 TB where the scan is already
    # thousands of splits.  (An earlier r16 A/B rejected this spread
    # against the PRE-vocab-level plan; re-measured A/B/A on the
    # current plan it wins ~0.7 s.)
    docs = spread(load_table(spark, sf_dir, "documents"), key="doc_id")
    bg = (
        docs.selectExpr("doc_id", f"{_SPAN_NORM_SPARK} AS toks")
        .selectExpr(
            "doc_id",
            # zip_with over two shifted slices, NOT
            # transform(sequence(...), i -> element_at(toks, i)):
            # the per-index element_at chain is CodegenFallback
            # (interpreted, per-element boxing) and measured ~6x
            # slower on the identical output; the struct-only
            # zip_with lambda is cheap (PERF.md round-7 A/B).
            "CASE WHEN size(toks) >= 2 THEN zip_with("
            "  slice(toks, 1, size(toks) - 1),"
            "  slice(toks, 2, size(toks) - 1),"
            "  (a, b) -> struct(a AS w1, concat_ws(' ', a, b) AS bg))"
            " ELSE array() END AS pairs",
        )
        .select("doc_id", F.explode("pairs").alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    )
    bgd = bg.groupBy("doc_id", "w1", "bg").agg(
        F.count(F.lit(1)).alias("n")
    )
    # three consumers (two corpus count tables + the scoring join):
    # materialize the per-doc bigram counts once
    bgd = bgd.localCheckpoint()
    # p(w2|w1) is a property of the BIGRAM, not of the (doc, bigram)
    # row: resolve c_bg DIV c_w1 at vocabulary level (w1 is determined
    # by bg — tokens are space-free, bg = concat(w1,' ',w2) — so
    # groupBy(w1, bg) has exactly cbg's cardinality) and attach ONE
    # precomputed ppm per bigram.  The token-stream-sized bgd then
    # crosses two exchanges (bg join, doc_id rollup) instead of three
    # (bg join, w1 join, doc_id rollup); the w1 join moves to the
    # vocabulary-bounded count table (guide §2.3 "shuffle fewer
    # bytes").  Arithmetic per row is unchanged:
    # n * (c_bg * 1000000 DIV c_w1).
    # c_w1 folds out of the bigram count table instead of its own
    # pass over token-stream-sized bgd: sum(n) grouped by w1 ==
    # sum(c_bg) grouped by w1 (both integer sums over the same rows,
    # regrouped) — one fewer full-token-stream aggregation pass
    # (guide §2.3/§2.4); cbg itself is vocabulary-bounded.
    cbg = bgd.groupBy("w1", "bg").agg(F.sum("n").alias("c_bg"))
    cw1 = cbg.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    pbg = cbg.join(cw1, "w1").select(
        "bg", F.expr("c_bg * 1000000 DIV c_w1").alias("p_ppm")
    )
    scored = bgd.join(pbg, "bg")
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.expr(
            "CAST(sum(n * p_ppm) DIV sum(n) AS BIGINT)"
        ).alias("lm_score_ppm"),
    )
