"""Relational operator surface (SURVEY.md §2.B): scans, filters, joins,
set operations.

The reference implements none of these (its only "join" is the MD5
anti-join of download/common.go:169-190); they enter via the north
star — the relational surface needed to query the archived data.
Everything is declarative DataFrame API so Catalyst owns join
strategy, reordering, pushdown and pruning.

Scale notes per operator in the docstrings; the global rules:
- dimension tables (region/nation/customer at dim scale) are
  broadcast — `F.broadcast` is a hint, results identical;
- fact-fact joins shuffle on their equi keys; range predicates ride
  along as join conditions, never as post-join filters;
- no collect()s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.functions.numeric import dec, money_sum, sql_money_sum
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.io import load_table
from downloader_spark.plans.registry import query


@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS DOUBLE) AS net_price
    FROM lineitem
    """,
    tags=("relational", "scan"),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection with a computed column.

    The 4-column select prunes the 11-column lineitem scan to exactly
    ReadSchema: [l_orderkey, l_linenumber, l_returnflag,
    l_extendedprice, l_discount].  The money product is computed in
    DECIMAL per row (exact, engine-independent) then emitted DOUBLE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (dec("l_extendedprice", 2) * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,2)"))
        .cast("double")
        .alias("net_price"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_discount <> 0.0
    """,
    tags=("relational", "filter"),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: BETWEEN, IN, comparison, inequality.

    All four conjuncts push to the parquet scan (PushedFilters) —
    at 100 TB with date-partitioned layout the shipdate predicate
    additionally prunes partitions.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") != 0.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "join_inner",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           {sql_money_sum("o.o_totalprice", "revenue")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("relational", "join"),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain fact->dim->dim with aggregation.

    nation (25 rows) is broadcast; customer carries NO broadcast hint
    — it is an unbounded dimension (~15 B rows at 100 TB, a
    guaranteed build-side OOM if pinned), so the orders⋈customer
    build side is left to AQE: broadcast at test SF, shuffle-hash at
    scale.  customer is projected to the two join columns before the
    join so the scale-out shuffle carries 12 bytes/row, and the final
    groupBy on n_name carries pre-combined partials.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice", "revenue"),
        )
    )


@query(
    "join_outer",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_recent,
           MAX(o.o_orderdate) AS last_order
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01') o
      ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    tags=("relational", "join"),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched build-side rows (customers
    with no recent orders -> count 0, null last_order)."""
    customer = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_recent"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH f AS (SELECT o_custkey, COUNT(*) AS n_f FROM orders
               WHERE o_orderstatus = 'F' GROUP BY o_custkey),
         p AS (SELECT o_custkey, COUNT(*) AS n_p FROM orders
               WHERE o_orderstatus = 'P' GROUP BY o_custkey)
    SELECT COALESCE(f.o_custkey, p.o_custkey) AS custkey, f.n_f, p.n_p
    FROM f FULL OUTER JOIN p ON f.o_custkey = p.o_custkey
    """,
    tags=("relational", "join"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates with disjoint key coverage
    (customers having only fulfilled or only pending orders survive
    with a null side)."""
    orders = load_table(spark, sf_dir, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_f"))
        .withColumnRenamed("o_custkey", "f_key")
    )
    p = (
        orders.filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_p"))
        .withColumnRenamed("o_custkey", "p_key")
    )
    return f.join(p, f.f_key == p.p_key, "outer").select(
        F.coalesce("f_key", "p_key").alias("custkey"), "n_f", "n_p"
    )


@query(
    "join_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_pending' AS tag FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    UNION ALL
    SELECT c_custkey, 'no_pending' AS tag FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    tags=("relational", "join"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti join — the anti form is the engine's
    content-dedup core (ref: download/common.go:169-190 decides
    "is this file new" by anti-joining the archive on MD5).

    Semi/anti never materialize the probe side's payload columns, so
    at scale only the join key shuffles.
    """
    customer = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    cond = customer.c_custkey == pending.o_custkey
    semi = customer.join(pending, cond, "left_semi").select(
        "c_custkey", F.lit("has_pending").alias("tag")
    )
    anti = customer.join(pending, cond, "left_anti").select(
        "c_custkey", F.lit("no_pending").alias("tag")
    )
    return semi.unionAll(anti)


@query(
    "join_range",
    oracle="""
    SELECT v.user_id, COUNT(*) AS n_pairs
    FROM (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.p_ts > v.v_ts
     AND p.p_ts <= v.v_ts + INTERVAL 10 MINUTE
    GROUP BY v.user_id
    """,
    tags=("relational", "join"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: purchases within 10 minutes after a view by
    the same user.

    The equi key (user_id) makes this a hash join with the band
    predicate evaluated inside the join — never a cartesian.  At
    100 TB you'd additionally bucket both sides by (user_id,
    time_bucket) so the band probe stays partition-local.
    """
    events = load_table(spark, sf_dir, "events")
    v = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        v.join(
            p,
            (v.user_id == p.p_user)
            & (p.p_ts > v.v_ts)
            & (p.p_ts <= v.v_ts + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_asof",
    oracle="""
    SELECT event_id AS purchase_id, user_id, signup_id
    FROM (
        SELECT event_id, user_id, event_type,
               last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_id
        FROM events
    ) WHERE event_type = 'purchase'
    """,
    tags=("relational", "join"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest prior match): each purchase paired with the
    user's most recent signup at-or-before it.

    PySpark has no native ASOF JOIN; the Spark-first composition is a
    single pass — union both event roles in one partition-sorted
    window and carry the last non-null match forward
    (last(ignorenulls) over ROWS UNBOUNDED PRECEDING).  One shuffle on
    the key, one sort — strictly cheaper than the range-join +
    row_number alternative, and it's exactly how you'd do it at
    100 TB (sort-merge friendly, no candidate blow-up).

    Tie rule: ordering is (ts, event_id), so a signup sharing a
    purchase's timestamp counts as prior iff its event_id is smaller —
    the oracle encodes the identical rule.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = events.withColumn(
        "signup_id",
        F.last(
            F.when(F.col("event_type") == "signup", F.col("event_id")),
            ignorenulls=True,
        ).over(w),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "signup_id"
    )


@query(
    "join_asof_fwd",
    oracle="""
    SELECT event_id AS purchase_id, user_id,
           last_value(CASE WHEN event_type = 'signup' THEN event_id END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS next_signup_id
    FROM events
    QUALIFY event_type = 'purchase'
    """,
    tags=("relational", "join"),
)
def join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (nearest FOLLOWING match): each purchase
    paired with the user's next signup at-or-after it — the mirror of
    join_asof, composed the same single-pass way with a FOLLOWING
    window frame carrying the first non-null match backward.  Same
    one-shuffle/one-sort scale shape.

    The oracle expresses the same pick as last-non-null over the
    DESCENDING order's preceding frame — scanning from the stream's
    end, the most recent signup seen is exactly the first one at or
    after the current row in ascending order."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = events.withColumn(
        "next_signup_id",
        F.first(
            F.when(F.col("event_type") == "signup", F.col("event_id")),
            ignorenulls=True,
        ).over(w),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "next_signup_id"
    )


@query(
    "join_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
           o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 25 = 0
    """,
    tags=("relational", "join", "skew"),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join as a CHECKED surface: the explicit hot-key
    scatter (big side salted across 16 buckets, small side replicated
    per bucket, join on (key, salt)) must produce EXACTLY the plain
    inner join's rows — the oracle is that plain join, so the
    semantics-preservation claim is hash-verified, not just unit-
    tested.  This is the planner-independent skew remedy for when
    AQE's skew splitting can't apply (broadcast-ineligible hot keys,
    non-sort-merge plans); see functions/skew.py."""
    from downloader_spark.functions.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 25 == 0)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    return salted_join(
        li, o, "l_orderkey", n_salts=16, salt_by="l_linenumber"
    ).select("l_orderkey", "l_linenumber", "o_custkey", "o_orderpriority")


ASOF_TOL_S = 7 * 24 * 3600  # tolerance: match must be within a week


@query(
    "join_asof_tol",
    oracle=f"""
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN sts IS NOT NULL
                     AND epoch_us(ts) - sts <= {ASOF_TOL_S * 1_000_000}
                THEN sid END AS signup_id
    FROM (
        SELECT event_id, user_id, event_type, ts,
               last_value(CASE WHEN event_type = 'signup'
                               THEN epoch_us(ts) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sts,
               last_value(CASE WHEN event_type = 'signup'
                               THEN event_id END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM events
    ) WHERE event_type = 'purchase'
    """,
    tags=("relational", "join"),
)
def join_asof_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas merge_asof's ``tolerance``):
    the nearest prior signup counts only if it happened within
    {ASOF_TOL_S} seconds of the purchase; staler matches yield NULL.

    Same single-pass shape as join_asof — the window carries the last
    signup's (time, id) forward; the tolerance is then one integer-µs
    comparison per row.  No extra shuffle over the plain as-of.  The
    oracle carries the two fields in two IGNORE-NULLS windows over the
    identical frame (they always come from the same signup row)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    signup = F.when(
        F.col("event_type") == "signup",
        F.struct(
            F.unix_micros("ts").alias("sts"), F.col("event_id").alias("sid")
        ),
    )
    marked = events.withColumn("m", F.last(signup, ignorenulls=True).over(w))
    within = (
        F.col("m").isNotNull()
        & (F.unix_micros("ts") - F.col("m.sts") <= ASOF_TOL_S * 1_000_000)
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(within, F.col("m.sid")).alias("signup_id"),
    )


@query(
    "set_ops",
    oracle="""
    SELECT 'f_and_p' AS tag, o_custkey AS custkey FROM
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    UNION ALL
    SELECT 'f_only' AS tag, o_custkey AS custkey FROM
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    UNION ALL
    SELECT 'either' AS tag, o_custkey AS custkey FROM
      (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
       UNION
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
    tags=("relational", "setops"),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (distinct) / UNION ALL in one result,
    tagged per branch.

    Single-scan formulation: the naive three-branch plan scans orders
    once per set operator (and shuffles each branch); computing the
    per-key membership flags with ONE conditional aggregation turns
    all three set operations into row-local boolean tests on the
    (custkey, has_f, has_p) table — one scan, one shuffle, and the
    set semantics fall out of the flags (INTERSECT = both, EXCEPT =
    first-only, UNION = either).  The tagged explode replicates rows
    per qualifying branch."""
    orders = load_table(spark, sf_dir, "orders")
    flags = (
        orders.filter(F.col("o_orderstatus").isin("F", "P"))
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderstatus") == "F").alias("has_f"),
            F.max(F.col("o_orderstatus") == "P").alias("has_p"),
        )
    )
    tags = F.array_compact(
        F.array(
            F.when(F.col("has_f") & F.col("has_p"), "f_and_p"),
            F.when(F.col("has_f") & ~F.col("has_p"), "f_only"),
            F.when(F.col("has_f") | F.col("has_p"), "either"),
        )
    )
    return flags.select(
        F.explode(tags).alias("tag"), F.col("o_custkey").alias("custkey")
    )


# 62-bit words sidestep 1<<63 sign-overflow divergence risk entirely
BLOOM_WORD_BITS = 62
BLOOM_WORDS = 66            # m = 4092 bits — sized for a ~25% FP rate at
BLOOM_K = 2                 # sf0.01 so the false-positive accounting is
                            # exercised by real rows, not vacuously zero
BLOOM_MEMBER_MIN_PRICE = 450_000  # 'big-spender' member set: ~2/3 of
                            # customers qualify, so real non-members exist
                            # for the filter to false-positive on


def _bloom_pos(engine_h60, i: int, key_sql: str, cast_ty: str) -> str:
    arg = f"concat('bloom{i}:', CAST({key_sql} AS {cast_ty}))"
    m = BLOOM_WORDS * BLOOM_WORD_BITS
    return f"({engine_h60(arg)} % {m})"


@query(
    "join_bloom_prune",
    oracle=f"""
    WITH members AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE o_totalprice > 450000),
    bloom AS (
      SELECT pos // {BLOOM_WORD_BITS} AS word_idx,
             bit_or(CAST(1 AS BIGINT) << (pos % {BLOOM_WORD_BITS})) AS bits
      FROM (
        SELECT {_bloom_pos(_duck_h60, 0, "o_custkey", "VARCHAR")} AS pos FROM members
        UNION ALL
        SELECT {_bloom_pos(_duck_h60, 1, "o_custkey", "VARCHAR")} FROM members
      ) GROUP BY 1
    ),
    probe AS (
      SELECT c_custkey, c_nationkey,
             {_bloom_pos(_duck_h60, 0, "c_custkey", "VARCHAR")} AS p0,
             {_bloom_pos(_duck_h60, 1, "c_custkey", "VARCHAR")} AS p1
      FROM customer
    ),
    checked AS (
      SELECT p.c_custkey, p.c_nationkey,
             CASE WHEN ((b0.bits >> (p.p0 % {BLOOM_WORD_BITS})) & 1) = 1
                   AND ((b1.bits >> (p.p1 % {BLOOM_WORD_BITS})) & 1) = 1
                  THEN 1 ELSE 0 END AS bloom_pass,
             CASE WHEN m.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS actual
      FROM probe p
      LEFT JOIN bloom b0 ON b0.word_idx = p.p0 // {BLOOM_WORD_BITS}
      LEFT JOIN bloom b1 ON b1.word_idx = p.p1 // {BLOOM_WORD_BITS}
      LEFT JOIN members m ON m.o_custkey = p.c_custkey
    )
    SELECT c_nationkey AS nationkey,
           CAST(sum(bloom_pass) AS BIGINT) AS n_candidates,
           CAST(sum(actual) AS BIGINT) AS n_actual,
           CAST(sum(bloom_pass) - sum(actual) AS BIGINT) AS n_false_pos
    FROM checked GROUP BY c_nationkey
    """,
    tags=("join", "bloom", "runtime-filter"),
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning with exact false-positive
    accounting: the big-spender custkey set (any order over {BLOOM_MEMBER_MIN_PRICE}) is compressed into a
    {BLOOM_WORDS}x{BLOOM_WORD_BITS}-bit filter (k={BLOOM_K}
    md5-derived positions, bit_or word aggregation), every customer
    probes it, and the per-nation rollup reports candidates vs true
    members vs false positives.

    This is the runtime-filter pattern that saves the big shuffle at
    100 TB: build the ~KB filter on the small/aggregated side,
    broadcast it, and drop most non-matching probe rows BEFORE the
    expensive join — here the filter is {BLOOM_WORDS} (word, bits)
    rows, deliberately undersized so the FP column proves the
    accounting runs on real rows (a production filter sizes m for
    ~1% FP).  Every position is md5-derived, so DuckDB rebuilds the
    identical filter and the FP counts match exactly — bloom
    behavior itself is under test, not just the join result.  No
    sign-overflow trap: {BLOOM_WORD_BITS}-bit words keep 1<<bit
    positive in both engines."""
    members = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > BLOOM_MEMBER_MIN_PRICE)
        .select("o_custkey")
        .distinct()
    )
    pos_exprs = [
        _bloom_pos(_spark_h60, i, "o_custkey", "STRING") for i in range(BLOOM_K)
    ]
    positions = members.select(
        F.explode(F.array(*[F.expr(p) for p in pos_exprs])).alias("pos")
    )
    bloom = positions.groupBy(
        F.expr(f"pos DIV {BLOOM_WORD_BITS}").alias("word_idx")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), pos % {BLOOM_WORD_BITS}))"
        ).alias("bits")
    )
    probe = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr(_bloom_pos(_spark_h60, 0, "c_custkey", "STRING")).alias("p0"),
        F.expr(_bloom_pos(_spark_h60, 1, "c_custkey", "STRING")).alias("p1"),
    )
    b0 = bloom.select(F.col("word_idx").alias("w0"), F.col("bits").alias("bits0"))
    b1 = bloom.select(F.col("word_idx").alias("w1"), F.col("bits").alias("bits1"))
    checked = (
        probe.join(F.broadcast(b0), F.expr(f"p0 DIV {BLOOM_WORD_BITS}") == F.col("w0"), "left")
        .join(F.broadcast(b1), F.expr(f"p1 DIV {BLOOM_WORD_BITS}") == F.col("w1"), "left")
        .join(
            F.broadcast(members.select(F.col("o_custkey").alias("c_custkey"))
                        .withColumn("is_member", F.lit(1))),
            "c_custkey",
            "left",
        )
        .select(
            "c_nationkey",
            F.expr(
                f"CASE WHEN (shiftright(bits0, CAST(p0 % {BLOOM_WORD_BITS} AS INT)) & 1) = 1"
                f" AND (shiftright(bits1, CAST(p1 % {BLOOM_WORD_BITS} AS INT)) & 1) = 1"
                " THEN 1 ELSE 0 END"
            ).alias("bloom_pass"),
            F.coalesce(F.col("is_member"), F.lit(0)).alias("actual"),
        )
    )
    return checked.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.sum("bloom_pass").alias("n_candidates"),
        F.sum("actual").alias("n_actual"),
        (F.sum("bloom_pass") - F.sum("actual")).alias("n_false_pos"),
    )


SCD2_VERSIONS = 3


def _scd2_bounds(engine: str) -> tuple[str, str]:
    """Per-supplier version boundaries b1 < b2, md5-derived days past
    1994-01-01 — identical literals both engines."""
    if engine == "spark":
        h1 = _spark_h60("concat('scd1:', CAST(s_suppkey AS STRING))")
        h2 = _spark_h60("concat('scd2:', CAST(s_suppkey AS STRING))")
        b1 = f"date_add(DATE '1994-01-01', CAST(pmod({h1}, 1000) AS INT))"
        b2 = f"date_add({b1}, CAST(1 + pmod({h2}, 700) AS INT))"
    else:
        h1 = _duck_h60("concat('scd1:', CAST(s_suppkey AS VARCHAR))")
        h2 = _duck_h60("concat('scd2:', CAST(s_suppkey AS VARCHAR))")
        b1 = f"(DATE '1994-01-01' + CAST({h1} % 1000 AS INT))"
        b2 = f"({b1} + CAST(1 + {h2} % 700 AS INT))"
    return b1, b2


_D_B1, _D_B2 = _scd2_bounds("duck")


@query(
    "join_scd2",
    oracle=f"""
    WITH dim AS (
      SELECT s_suppkey AS suppkey, 0 AS version,
             DATE '1900-01-01' AS valid_from, {_D_B1} AS valid_to,
             s_suppkey * 10 + 0 AS version_tag
      FROM supplier
      UNION ALL
      SELECT s_suppkey, 1, {_D_B1}, {_D_B2}, s_suppkey * 10 + 1 FROM supplier
      UNION ALL
      SELECT s_suppkey, 2, {_D_B2}, DATE '2999-12-31', s_suppkey * 10 + 2
      FROM supplier
    ),
    fact AS (
      SELECT l_suppkey AS suppkey, CAST(l_shipdate AS DATE) AS d
      FROM lineitem
    )
    SELECT f.suppkey, d.version, min(d.version_tag) AS version_tag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(min(f.d) AS VARCHAR) AS first_ship,
           CAST(max(f.d) AS VARCHAR) AS last_ship
    FROM fact f
    JOIN dim d ON d.suppkey = f.suppkey
              AND d.valid_from <= f.d AND f.d < d.valid_to
    GROUP BY 1, 2
    """,
    tags=("join", "temporal", "scd2"),
)
def join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD type-2) dimension join: every lineitem
    shipment matches the supplier VERSION whose validity interval
    contains its ship date — the classic warehouse temporal join the
    as-of family doesn't cover (as-of = nearest preceding event; SCD2
    = interval membership against a versioned dimension).  Version
    boundaries are md5-derived per supplier, so both engines build the
    identical dimension; intervals partition the timeline, so each
    fact matches exactly one version.

    Scale shape: equi-join on the supplier key with the per-key
    validity filter applied inside the join — fanout is bounded by
    versions-per-key ({SCD2_VERSIONS} here; dimension history is
    always shallow next to facts), and the dimension broadcasts.  No
    range-join machinery, no interval index: SCD2 at 100 TB is a
    broadcast equi-join plus a filter, which is exactly what this
    plan does (rolled up per (supplier, version) for a stable checked
    surface)."""
    s_b1, s_b2 = _scd2_bounds("spark")
    supplier = load_table(spark, sf_dir, "supplier")
    dims = []
    for v, (lo, hi) in enumerate(
        [("DATE '1900-01-01'", s_b1), (s_b1, s_b2), (s_b2, "DATE '2999-12-31'")]
    ):
        dims.append(
            supplier.select(
                F.col("s_suppkey").alias("suppkey"),
                F.lit(v).alias("version"),
                F.expr(lo).alias("valid_from"),
                F.expr(hi).alias("valid_to"),
                F.expr(f"s_suppkey * 10 + {v}").alias("version_tag"),
            )
        )
    dim = dims[0].unionByName(dims[1]).unionByName(dims[2])
    fact = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"),
        F.expr("CAST(l_shipdate AS DATE)").alias("d"),
    )
    joined = fact.join(
        F.broadcast(dim),
        ["suppkey"],
    ).filter((F.col("valid_from") <= F.col("d")) & (F.col("d") < F.col("valid_to")))
    return joined.groupBy("suppkey", "version").agg(
        F.min("version_tag").alias("version_tag"),
        F.count("*").alias("n_items"),
        F.expr("CAST(min(d) AS STRING)").alias("first_ship"),
        F.expr("CAST(max(d) AS STRING)").alias("last_ship"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ),
    signups AS (
      SELECT event_id AS signup_id, user_id, epoch_us(ts) AS s_us
      FROM events WHERE event_type = 'signup'
    )
    SELECT event_id AS purchase_id, user_id, signup_id,
           CAST(s_us - us AS BIGINT) AS delta_us
    FROM purchases p JOIN signups s USING (user_id)
    QUALIFY row_number() OVER (
      PARTITION BY event_id
      ORDER BY abs(s_us - us), s_us, signup_id
    ) = 1
    """,
    tags=("relational", "join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join, EITHER direction: each purchase
    pairs with the user's temporally closest signup, before or after
    (sensor-alignment semantics — join each reading to the closest
    calibration event).  Ties at equal distance go to the earlier
    signup; signed delta_us reports which side won.

    Spark-first composition: ONE partition-sorted window pass over
    the unioned stream carries BOTH the last-prior and first-next
    signup as (ts, id) structs (last-ignorenulls over the preceding
    frame + first-ignorenulls over the following frame share one
    exchange and one sort), then a row-local CASE picks the closer —
    never a per-row candidate join.  The oracle is the opposite
    algorithm — full purchase x signup join per user, ranked by
    distance — so the hash cross-checks the window composition
    against brute force.  At 100 TB the window form wins: cost is
    one shuffle of the stream vs a quadratic per-user fanout.

    Tie-break parity with the oracle's ORDER BY abs(delta), s_us,
    signup_id: the prior signup is a struct-MAX of (us, -id, id) —
    latest us first, then SMALLEST id among equal-us signups — and
    the next signup a struct-MIN of (us, id); plain first/last over
    the frame would pick the largest id when a user signs up twice
    in the same microsecond."""
    events = load_table(spark, sf_dir, "events")
    is_sig = F.col("event_type") == "signup"
    sig_prev = F.when(
        is_sig,
        F.struct(
            F.unix_micros("ts").alias("us"),
            (-F.col("event_id")).alias("neg_id"),
            F.col("event_id").alias("id"),
        ),
    )
    sig_next = F.when(
        is_sig,
        F.struct(F.unix_micros("ts").alias("us"), F.col("event_id").alias("id")),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.max(sig_prev).over(w_prev).alias("prev"),
        F.min(sig_next).over(w_next).alias("nxt"),
    ).filter(F.col("event_type") == "purchase")
    prev_d = F.col("us") - F.col("prev.us")  # >= 0 by construction
    next_d = F.col("nxt.us") - F.col("us")
    pick_prev = F.col("nxt").isNull() | (
        F.col("prev").isNotNull() & (prev_d <= next_d)
    )
    return marked.filter(
        F.col("prev").isNotNull() | F.col("nxt").isNotNull()
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(pick_prev, F.col("prev.id")).otherwise(F.col("nxt.id")).alias(
            "signup_id"
        ),
        F.when(pick_prev, -prev_d).otherwise(next_d).cast("long").alias(
            "delta_us"
        ),
    )
