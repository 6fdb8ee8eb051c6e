"""SQL-API surface: subquery predicates and a CTE analytics query
run through ``spark.sql`` over registered views — proof that the
engine's second front door (ANSI SQL text, not just the DataFrame
API) covers the same semantics with the same exactness discipline.

Catalyst rewrites both subquery forms into joins (IN → left-semi,
NOT EXISTS → left-anti — the same physical shape as the reference's
dedup anti-join, A5), so the SQL surface costs nothing over the
DataFrame one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import query


@query(
    "filter_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders o
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
      )
    """,
    tags=("filter", "subquery"),
)
def filter_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicates: uncorrelated IN and correlated NOT EXISTS.

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the subquery text; the Spark side builds the
    joins Catalyst WOULD decorrelate to — an explicit LEFT SEMI
    against the rich customers and a LEFT ANTI against the
    high-quantity lines (with the quantity filter pushed to the scan
    instead of living inside the correlation).  Equal hashes prove
    the decorrelation equivalence itself — the rewrite the engine's
    optimizer performs is re-derived by hand and checked against the
    engine that executes the subqueries natively."""
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    heavy = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(
            rich, orders.o_custkey == rich.c_custkey, "left_semi"
        )
        .join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_anti")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


_Q3_BODY = """
WITH rev AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS revenue
  FROM lineitem
  WHERE l_shipdate > DATE '1996-03-15'
  GROUP BY l_orderkey
)
SELECT o.o_orderkey,
       round(CAST(r.revenue AS DOUBLE), 2) AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN rev r ON r.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1996-03-15'
ORDER BY r.revenue DESC, o.o_orderkey
LIMIT 10
"""


@query(
    "sql_q3_cte",
    oracle=_Q3_BODY,
    tags=("sql", "cte", "join", "aggregate"),
)
def sql_q3_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped analytics: per-order shipped revenue after the
    cutoff, for BUILDING-segment customers with pre-cutoff orders,
    global top-10 by revenue.

    Construction note (round 7, upgraded from same-text): the Spark
    side builds the CTE's algebra explicitly with the DataFrame API
    (revenue pre-aggregated per order, then the pruned orders and
    broadcast customer joins); the oracle keeps the SQL-text CTE.
    Plan unchanged and still gated: pushed date/segment filters,
    broadcast customer, partial-aggregated revenue, and the ORDER
    BY+LIMIT becomes TakeOrderedAndProject — never a full sort."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-03-15"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(l_extendedprice AS DECIMAL(18,4))"
                    " * CAST(1.0 - l_discount AS DECIMAL(18,4))"
                )
            ).alias("revenue_dec")
        )
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15")
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(rev, rev.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderkey",
            F.round(F.col("revenue_dec").cast("double"), 2).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
            "revenue_dec",
        )
        .orderBy(F.col("revenue_dec").desc(), F.col("o_orderkey"))
        .limit(10)
        .drop("revenue_dec")
    )


_Q5_BODY = """
SELECT n.n_name,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * CAST(1.0 - l.l_discount AS DECIMAL(18,4)))
                  AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
GROUP BY n.n_name
"""


@query(
    "sql_q5_join6",
    oracle=_Q5_BODY,
    tags=("sql", "join", "aggregate", "broadcast"),
)
def sql_q5_join6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local-supplier-volume query: a 6-way join
    (customer x orders x lineitem x supplier x nation x region) with
    the same-nation correlation predicate (c_nationkey =
    s_nationkey), a pushed region filter, a pushed order-date range,
    and a decimal-exact revenue rollup per nation.

    Two-construction differential (round 7, upgraded from same-text):
    the oracle keeps the textbook star tree rooted at customer; the
    Spark side hand-builds the OPPOSITE order — the pruned dimension
    chain region→nation→supplier collapses into one small broadcast
    build side that prunes lineitem FIRST, the date-pruned orders
    join is the only fact-fact shuffle, and the same-nation
    correlation is enforced at the CUSTOMER join (c_custkey AND
    c_nationkey = s_nationkey, a composite-key shuffle join) instead
    of at the supplier join.  Decimal addition is associative and the
    filters commute, so the two trees agree bit-for-bit — exactly
    the equivalence the differential checks.  At 100 TB customer is
    NOT broadcastable; keying its join on (custkey, nationkey) keeps
    it a plain hash join."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (F.col("o_custkey") == cust.c_custkey)
            & (F.col("s_nationkey") == cust.c_nationkey),
        )
    )
    return j.groupBy("n_name").agg(
        F.round(
            F.sum(
                F.expr(
                    "CAST(l_extendedprice AS DECIMAL(18,4))"
                    " * CAST(1.0 - l_discount AS DECIMAL(18,4))"
                )
            ).cast("double"),
            2,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
