"""Classic OLAP report shapes (TPC-H Q1/Q6/Q8/Q10/Q13/Q14/Q16/Q17/
Q18/Q19/Q22 analogs) — the full-table-report half of the SQL surface
(sql_surface.py holds the CTE/subquery/6-way-join half).  As of
round 7, EVERY key here is a differential: the oracle keeps the
textbook SQL formulation (correlated subqueries, join-then-aggregate,
duplicated OR predicates, scalar subqueries) while the Spark side is
an independently-constructed algebra (aggregate-first, semi-join
membership, pre-projected classifier flags, explicit anti joins) —
two constructions, one hash.  The reference's own "reports" are
counters scraped over HTTP
(/root/reference/metrics/metrics.go:14-61); the north star promotes
them to the standard warehouse report set over the archived facts.

Cross-engine exactness (see functions/numeric.py): every money
aggregate is summed as DECIMAL and emitted as round(double, 2);
pass-through float columns are emitted as floor-scaled integer cents
(floor on a double is exact and identical cross-engine); every
ORDER BY ends in a unique key so LIMIT is a total order.

Scale notes (100 TB):
- ``sql_q1_pricing`` is ONE hash aggregation over the fact scan with
  a pushed shipdate filter: 6 decimal sums + a count, all map-side
  combinable, 6-group output.  The canonical whole-stage-codegen
  benchmark query — no join, no window, no sort of data.
- ``sql_q10_returns`` pre-aggregates returned revenue per order
  (decimal partial agg on the returnflag-pruned scan) BEFORE joining
  the quarter-pruned orders, so the fact-fact join carries one
  decimal per order; customer + nation broadcast onto the per-customer
  totals; the top-20 is TakeOrderedAndProject — per-partition heaps,
  never a global sort.
- ``sql_q16_variety`` rewrites NOT IN over a 6-row exclusion list to
  a broadcast null-aware anti join; COUNT(DISTINCT) expands
  per-group — the skew-safe two-phase distinct.
- ``sql_q18_toporders`` aggregates lineitem ONCE — the per-order sum
  is both the HAVING filter and the reported value, so the fact is
  scanned and shuffled exactly once (the oracle's IN-subquery form
  aggregates it twice); customer broadcasts onto the tiny
  qualifying set.
- ``sql_q19_disjuncts`` is the disjunctive-pushdown showcase: the
  OR-of-conjunctions collapses to a single CASE projection after one
  broadcast part join; the per-branch rollup is a 9-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table, spread
from downloader_spark.plans.registry import query

_TABLES = ("customer", "orders", "lineitem", "supplier", "part", "nation")


def _run(spark: SparkSession, sf_dir: str, body: str, tables=_TABLES) -> DataFrame:
    """Register ds_-prefixed temp views and run ``body`` with table
    names rewritten to them — the same SQL text the oracle runs.
    The rewrite is \\b-anchored so a table whose name prefixes
    another (part vs partsupp) never corrupts the body.

    As of round 7 no registered key uses this (every TPC-H key is a
    two-construction or API-vs-parser differential); kept as the
    documented harness for running any oracle body through
    ``spark.sql`` when diagnosing a hash mismatch."""
    import re as _re

    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"ds_{t}")
    for t in tables:
        body = _re.sub(rf"\b(FROM|JOIN)\s+{t}\b", rf"\1 ds_{t}", body)
    return spark.sql(body)


_Q1_BODY = """
SELECT l_returnflag,
       l_linestatus,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1.0 - l_discount AS DECIMAL(8,4))
                      * CAST(1.0 + l_tax AS DECIMAL(8,4))) AS DOUBLE), 2) AS sum_charge,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price,
       round(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2001-06-01'
GROUP BY l_returnflag, l_linestatus
"""


@query(
    "sql_q1_pricing",
    oracle=_Q1_BODY,
    tags=("sql", "aggregate", "report"),
)
def sql_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: the canonical single-pass
    fact-table report — 6 decimal-exact sums, 3 derived averages and
    a count per (returnflag, linestatus), behind a pushed shipdate
    filter.  The whole query is one hash aggregation with map-side
    partials inside a single WholeStageCodegen span; the decimal
    products (price x (1-disc) x (1+tax)) stay within DECIMAL(38,_)
    so both engines compute identical exact sums.

    Construction note (round 7): the Spark side is DataFrame algebra
    with the decimal casts and the sum/count average derivation
    spelled explicitly (no SQL parser in the path); the oracle keeps
    the SQL text — a parser-vs-API differential for the decimal
    promotion rules, the weakest-but-nonzero differential class."""
    # the 6-decimal-sum partial aggregation is CPU-dense map work and
    # the fixture scan is one split — spread it across cores before
    # the aggregation (no-op on multi-split inputs); the projection
    # keeps the exchange narrow and the pushed shipdate filter stays
    # scan-side
    li = spread(
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-06-01"))
        .select(
            "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        ),
        key="l_orderkey",
    )
    qty = F.expr("CAST(l_quantity AS DECIMAL(18,2))")
    price = F.expr("CAST(l_extendedprice AS DECIMAL(18,2))")
    disc_price = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
    )
    charge = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
        " * CAST(1.0 + l_tax AS DECIMAL(8,4))"
    )
    disc = F.expr("CAST(l_discount AS DECIMAL(8,4))")
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
        F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
        F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / cnt, 2).alias("avg_qty"),
        F.round(F.sum(price).cast("double") / cnt, 2).alias("avg_price"),
        F.round(F.sum(disc).cast("double") / cnt, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


_Q10_BODY = """
SELECT c.c_custkey,
       c.c_name,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE), 2) AS revenue,
       CAST(floor(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1996-10-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, CAST(floor(c.c_acctbal * 100) AS BIGINT), n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@query(
    "sql_q10_returns",
    oracle=_Q10_BODY,
    tags=("sql", "join", "aggregate", "topk"),
)
def sql_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: top-20 customers by
    revenue lost to returns in one quarter.

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook join-then-aggregate; the Spark side
    AGGREGATES FIRST — per-order returned revenue is a decimal sum
    over the returnflag-pruned lineitem scan (map-side combinable,
    one combiner row per order), THEN joins the quarter-pruned
    orders, rolls up per customer, joins customer (no broadcast hint
    — customer is the unbounded dimension at 100 TB, so the build
    side is left to AQE, which will broadcast at test SF and
    shuffle-hash at scale), and broadcasts only the 25-row nation.
    Decimal addition is
    associative, so the regrouped sums are bit-identical.  At 100 TB
    the fact never passes through a join wider than (orderkey, one
    decimal); the top-20 is TakeOrderedAndProject on
    (revenue DESC, c_custkey) — a total order, so LIMIT is
    deterministic.  c_acctbal passes through as floor-scaled cents
    (exact cross-engine, unlike round())."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev_per_order = li.groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "CAST(l_extendedprice AS DECIMAL(18,2))"
                " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
            )
        ).alias("rev_dec")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    per_cust = (
        orders.join(rev_per_order, orders.o_orderkey == rev_per_order.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_dec").alias("rev_sum"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("rev_sum").cast("double"), 2).alias("revenue"),
            F.expr("CAST(floor(c_acctbal * 100) AS BIGINT)").alias(
                "acctbal_cents"
            ),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q16_BODY = """
SELECT p.p_brand,
       p.p_type,
       p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'STANDARD'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query(
    "sql_q16_variety",
    oracle=_Q16_BODY,
    tags=("sql", "join", "distinct", "subquery"),
)
def sql_q16_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier-variety report: distinct supplier
    count per (brand, type, size), excluding flagged suppliers.
    (The driver schema has no partsupp table — lineitem is the
    part<->supplier association, reference parity per SURVEY.md §1.)

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook NOT IN subquery + COUNT(DISTINCT)
    aggregate; the Spark side spells both out explicitly — a
    broadcast LEFT ANTI join against the flagged-supplier set
    (equivalent because suppkeys are non-null; NOT IN's three-valued
    logic never fires), then DISTINCT (brand, type, size, suppkey)
    pairs followed by a plain count — the distinct-then-count
    two-level aggregation vs the engine's internal distinct-expand.
    The part predicates prune the broadcast build side before the
    fact join; no row ever carries more than the three group keys
    plus a suppkey."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "STANDARD")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(flagged),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    pairs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


_Q18_BODY = """
SELECT c.c_custkey,
       c.c_name,
       o.o_orderkey,
       o.o_orderdate,
       CAST(floor(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       round(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
         CAST(floor(o.o_totalprice * 100) AS BIGINT)
ORDER BY sum_qty DESC, o.o_orderkey
LIMIT 100
"""


@query(
    "sql_q18_toporders",
    oracle=_Q18_BODY,
    tags=("sql", "join", "subquery", "having", "topk"),
)
def sql_q18_toporders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume-order report: orders whose total
    quantity exceeds a cap, with customer context, top-100 by
    quantity.

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook IN-subquery (lineitem aggregated
    inside the subquery AND re-summed in the outer query); the Spark
    side aggregates lineitem ONCE — the per-order decimal quantity
    sum doubles as both the HAVING filter and the reported value, so
    the fact is scanned and shuffled exactly once, and the (tiny)
    qualifying-order set joins orders and customer — customer gets
    NO broadcast hint (it is the unbounded dimension at 100 TB; the
    qualifying-order side is the small one, and AQE picks the build
    side from runtime sizes).  The
    two paths only agree if the subquery's and outer query's sums are
    really the same quantity — exactly the equivalence the
    differential checks.  ORDER BY (sum_qty DESC, o_orderkey) is
    total, so the LIMIT is deterministic; o_totalprice passes as
    floor-cents."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.expr("CAST(l_quantity AS DECIMAL(18,2))")).alias("sq")
    )
    big = per_order.filter(F.col("sq") > 250)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias(
                "totalprice_cents"
            ),
            F.round(F.col("sq").cast("double"), 2).alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_Q19_BODY = """
WITH matched AS (
  SELECT CASE
           WHEN p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                AND l.l_quantity BETWEEN 1 AND 11 THEN 'small'
           WHEN p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                AND l.l_quantity BETWEEN 10 AND 20 THEN 'medium'
           WHEN p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 20 AND 30 THEN 'large'
         END AS branch,
         l.l_returnflag,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1.0 - l.l_discount AS DECIMAL(8,4)) AS disc_price
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         AND l.l_quantity BETWEEN 1 AND 11)
     OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         AND l.l_quantity BETWEEN 10 AND 20)
     OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity BETWEEN 20 AND 30)
)
SELECT branch,
       l_returnflag,
       COUNT(*) AS n_items,
       round(CAST(SUM(disc_price) AS DOUBLE), 2) AS revenue
FROM matched
GROUP BY branch, l_returnflag
"""


@query(
    "sql_q19_disjuncts",
    oracle=_Q19_BODY,
    tags=("sql", "join", "predicate", "disjunction"),
)
def sql_q19_disjuncts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate revenue report: three
    OR'd (brand, size-range, quantity-range) conjunctions, rolled up
    per matched branch x returnflag.

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook form — the OR-of-conjunctions
    stated TWICE (WHERE filter + CASE classifier); the Spark side
    states each conjunction ONCE as a CASE branch and filters on
    branch IS NOT NULL, so the disjunction exists in exactly one
    place (the construction a hand optimizer writes).  The two only
    agree if the duplicated predicates really are the branch
    conditions — the drift the differential would catch.  Plan
    shape is unchanged and still gated: one lineitem scan with the
    quantity-bound union pushed down, one broadcast part join, no
    union-of-scans expansion."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        # the pushed range union [1, 30] — the only predicate stated
        # outside the classifier
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = F.expr(
        "CASE"
        " WHEN p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5"
        "      AND l_quantity BETWEEN 1 AND 11 THEN 'small'"
        " WHEN p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10"
        "      AND l_quantity BETWEEN 10 AND 20 THEN 'medium'"
        " WHEN p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15"
        "      AND l_quantity BETWEEN 20 AND 30 THEN 'large'"
        " END"
    )
    matched = j.withColumn("branch", branch).filter(
        F.col("branch").isNotNull()
    )
    return matched.groupBy("branch", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(
                F.expr(
                    "CAST(l_extendedprice AS DECIMAL(18,2))"
                    " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
                )
            ).cast("double"),
            2,
        ).alias("revenue"),
    )


_Q14_BODY = """
WITH priced AS (
  SELECT CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate) AS BIGINT) AS ym,
         p.p_type,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1.0 - l.l_discount AS DECIMAL(8,4)) AS disc_price
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= DATE '1996-01-01'
    AND l.l_shipdate < DATE '1997-01-01'
)
SELECT ym,
       round(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_price
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS promo_revenue,
       round(CAST(SUM(disc_price) AS DOUBLE), 2) AS total_revenue,
       round(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN disc_price
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(disc_price) AS DOUBLE), 6) AS promo_share_r6
FROM priced
GROUP BY ym
"""


@query(
    "sql_q14_promo",
    oracle=_Q14_BODY,
    tags=("sql", "join", "aggregate", "ratio"),
)
def sql_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promotion-effect report: per ship-month share
    of revenue from PROMO-type parts — the conditional-aggregate
    ratio every marketing dashboard computes.

    Two-construction differential (round 7, upgraded from same-text):
    the oracle classifies AFTER the join (CASE on the joined p_type
    string); the Spark side pre-projects the dimension to
    (p_partkey, is_promo) so the broadcast build side carries one
    boolean instead of the type string and the classifier is a
    column reference, not a post-join string compare.  One broadcast
    join, then ONE hash aggregation carrying both the conditional
    and the total sum — never two scans reconciled by a self-join.
    Both sums are decimal-exact; the share divides the two exact
    decimals in double on identical inputs, so round(..., 6) agrees
    bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    part_flag = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    dp = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
    )
    promo_dp = F.when(F.col("is_promo"), dp).otherwise(
        F.expr("CAST(0 AS DECIMAL(18,2))")
    )
    j = li.join(F.broadcast(part_flag), li.l_partkey == part_flag.p_partkey)
    return (
        j.withColumn(
            "ym",
            F.expr(
                "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)"
            ),
        )
        .groupBy("ym")
        .agg(
            F.round(F.sum(promo_dp).cast("double"), 2).alias("promo_revenue"),
            F.round(F.sum(dp).cast("double"), 2).alias("total_revenue"),
            F.round(
                F.sum(promo_dp).cast("double") / F.sum(dp).cast("double"), 6
            ).alias("promo_share_r6"),
        )
    )


_Q6_BODY = """
SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE), 2)
         AS discount_revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
GROUP BY CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
"""


@query(
    "sql_q6_selective",
    oracle=_Q6_BODY,
    tags=("sql", "aggregate", "pushdown"),
)
def sql_q6_selective(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecasting-revenue query, widened to a
    per-month rollup: three stacked selective predicates (date range,
    discount band, quantity cap) over the bare fact scan and one
    decimal-exact product sum.

    The predicate-pushdown showcase: ALL three predicates reach the
    parquet scan as PushedFilters (plan-gated) and prune row groups
    via min/max statistics before a single row is materialized; what
    survives flows through one map-side-combinable aggregation.  At
    100 TB with date-partitioned layout the date range also prunes
    whole partitions (sinks.py's layout test).

    Construction note (round 7): Spark side is DataFrame algebra
    (filters and decimal product spelled via the API, no SQL parser);
    the oracle keeps the SQL text — the parser-vs-API differential
    class."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return (
        li.withColumn(
            "ym",
            F.expr(
                "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)"
            ),
        )
        .groupBy("ym")
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "CAST(l_extendedprice AS DECIMAL(18,2))"
                        " * CAST(l_discount AS DECIMAL(8,4))"
                    )
                ).cast("double"),
                2,
            ).alias("discount_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q13_BODY = """
WITH percust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM percust
GROUP BY c_count
"""


@query(
    "sql_q13_custdist",
    oracle=_Q13_BODY,
    tags=("sql", "join", "aggregate", "distribution"),
)
def sql_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped customer order-count distribution: how many
    customers placed exactly k (non-urgent) orders — the
    count-of-counts histogram, including the zero bucket.

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook LEFT JOIN then count-per-customer;
    the Spark side AGGREGATES FIRST — non-urgent orders reduce to
    (custkey, k) before any join, customer LEFT-joins the (smaller)
    count table and coalesces the null-extension to the k=0 bucket.
    The two only agree if the null-extended row and the missing-count
    coalesce really encode the same zero — the classic distribution
    bug each formulation can hide from itself.  At 100 TB the fact
    shuffles once (pre-aggregated), and the join's probe side is one
    row per ordering customer instead of one per order."""
    non_urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    percust = cust.join(
        non_urgent, cust.c_custkey == non_urgent.o_custkey, "left"
    ).select(F.coalesce("k", F.lit(0)).alias("c_count"))
    return percust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q8_BODY = """
WITH sold AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         sn.n_name AS supp_nation,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1.0 - l.l_discount AS DECIMAL(8,4)) AS volume
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'AMERICA'
)
SELECT o_year,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2)
         AS nation_volume,
       round(CAST(SUM(volume) AS DOUBLE), 2) AS total_volume,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share_r6
FROM sold
GROUP BY o_year
"""


@query(
    "sql_q8_share",
    oracle=_Q8_BODY,
    tags=("sql", "join", "aggregate", "ratio"),
)
def sql_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market-share report: one supplier nation's
    share of all volume sold into a region, per order year — the
    deepest join tree in the SQL family (7 relations; nation joins
    TWICE, once for the customer side and once for the supplier
    side, so the alias discipline is itself under test).

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook 7-relation inner-join tree; the
    Spark side restructures it — the customer-side chain
    (region→nation→customer) collapses to a MEMBERSHIP check (a
    LEFT SEMI join against the America-customer key set: the
    dimensions only gate rows, they contribute no columns), and the
    supplier side pre-projects an is-target-nation BOOLEAN onto the
    broadcast build side (the q14 flag trick) so the classifier is a
    column reference, not a post-join string compare.  The share is
    a conditional decimal sum over the total decimal sum — one
    aggregation, division last."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    nation = load_table(spark, sf_dir, "nation")
    amer_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust_am = load_table(spark, sf_dir, "customer").join(
        F.broadcast(amer_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_flag = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select(
        "s_suppkey", (F.col("n_name") == "NATION_3").alias("is_n3")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("o_year"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(1.0 - l_discount AS DECIMAL(8,4))"
    )
    n3_vol = F.when(F.col("is_n3"), vol).otherwise(
        F.expr("CAST(0 AS DECIMAL(18,2))")
    )
    sold = (
        li.join(F.broadcast(supp_flag), li.l_suppkey == supp_flag.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust_am,
            F.col("o_custkey") == cust_am.c_custkey,
            "left_semi",
        )
    )
    return sold.groupBy("o_year").agg(
        F.round(F.sum(n3_vol).cast("double"), 2).alias("nation_volume"),
        F.round(F.sum(vol).cast("double"), 2).alias("total_volume"),
        F.round(
            F.sum(n3_vol).cast("double") / F.sum(vol).cast("double"), 6
        ).alias("mkt_share_r6"),
    )


_Q17_BODY = """
WITH threshold AS (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*)) AS qty_cap
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_small_lines,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS small_qty_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN threshold t ON t.l_partkey = l.l_partkey
WHERE l.l_quantity < t.qty_cap
GROUP BY p.p_brand
"""


@query(
    "sql_q17_avgqty",
    oracle=_Q17_BODY,
    tags=("sql", "join", "subquery", "decorrelation"),
)
def sql_q17_avgqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity revenue: lines whose quantity
    falls below 20% of their part's average, rolled up per brand —
    the AVG-correlated-subquery shape (sql_q2_corr pins the MIN
    variant; Q17's cap is computed from an aggregate of the SAME
    fact table being filtered).

    GENUINE cross-engine differential (r6: upgraded from running the
    oracle's text on both engines): the oracle keeps the decorrelated
    aggregate-then-join-back construction, while the Spark side
    computes the cap as an UNORDERED WINDOW over the partkey
    partition — one fact scan and one exchange instead of the join
    form's two scans (threshold agg + probe) and two shuffles.  Two
    constructions, one hash.  The cap's float ops replicate the
    oracle operand-for-operand (decimal window sum -> double ->
    divide -> 0.2 decimal-literal multiply), so row selection is
    bit-identical.  Measured at sf0.1: 0.91 s median vs 0.89 for the
    join form — local wall is a wash (page cache hides the second
    scan), but at 100 TB one fact scan instead of two is the
    dominant term and the window sort rides the same exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    capped = li.select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.expr(
            "0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))"
            " OVER (PARTITION BY l_partkey) AS DOUBLE)"
            " / COUNT(*) OVER (PARTITION BY l_partkey))"
        ).alias("qty_cap"),
    ).filter(F.col("l_quantity") < F.col("qty_cap"))
    return (
        capped.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            capped.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.expr(
                "round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))"
                " AS DOUBLE), 2)"
            ).alias("small_qty_revenue"),
        )
    )


_Q22_BODY = """
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_prospects,
       round(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_bal
FROM customer c, threshold t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= DATE '2000-01-01'
  )
GROUP BY c.c_mktsegment
"""


@query(
    "sql_q22_prospects",
    oracle=_Q22_BODY,
    tags=("sql", "subquery", "anti-join", "aggregate"),
)
def sql_q22_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped dormant-prospect report: customers with
    above-average positive balance and NO order since 2000, rolled
    up per market segment — the "high-value but gone quiet"
    marketing query (every customer in the corpus has SOME order, so
    the dormancy cutoff is what gives the anti join a real
    surviving set).

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook scalar subquery + correlated NOT
    EXISTS; the Spark side spells both out — the global average is a
    1-row broadcast aggregate joined on, and the dormancy check is an
    explicit LEFT ANTI join against the date-pre-filtered orders
    projection (the filter moves from inside the correlation to the
    scan, where it pushes down).  The anti join is the only
    data-sized operation — at 100 TB it is a shuffle anti join on
    the customer key, and everything else is scalar."""
    cust = load_table(spark, sf_dir, "customer")
    threshold = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.expr("CAST(c_acctbal AS DECIMAL(18,2))")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    prospects = (
        cust.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return prospects.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_prospects"),
        F.round(
            F.sum(F.expr("CAST(c_acctbal AS DECIMAL(18,2))")).cast("double"),
            2,
        ).alias("total_bal"),
    )
