"""Round-9 surface extensions: the batch twin of the stateful
streaming EWMA (``stream_ewma``), closing the round-7/8 promise in
``streaming/stateful.py`` that the recursive integer fold has an
oracle-checked batch equivalent, and the grid-bucketed interval-
overlap join (``join_interval_overlap``) — the one join shape the
relational surface lacked: two interval sets with NO shared equi key.
(Reference analog: the reference's per-source watermark state,
routeviews.go:60-62, is the same keyed incremental-fold shape; an
EWMA is its numeric generalisation.)

Differential style: the Spark side folds a sorted struct-array with a
SQL ``aggregate`` lambda whose floor-division is spelled explicitly
as ``(a + c - pmod(a + c, 2)) DIV 2`` (Spark ``DIV`` truncates, so
pmod-subtraction makes it a true floor); the DuckDB oracle uses a
completely different construction — ``list(... ORDER BY ...)`` +
``list_reduce`` with DuckDB's ``//``.  Both replicate
``streaming.stateful.fold_ewma`` (the pure-Python reference model,
asserted in tests/test_properties_r9.py), so the streaming operator,
the batch twin, and the oracle share one arithmetic definition.

Cross-engine exactness: floor-cents integer state (``floor(value *
100)`` on the same IEEE double both engines); the fold order is the
total order (ts, event_id) — event_id is unique, so the recursion is
deterministic; and the fold state never goes negative (value >= 0
so cents >= 0), which is what lets the three division dialects agree:
Spark's pmod-floor and Python ``//`` FLOOR, while DuckDB 1.0 ``//``
actually TRUNCATES toward zero (measured ``(-7)//2 = -3``) — on the
non-negative fold domain floor == truncate, so all three coincide.
(round9b_ext's ts_holt_linear, whose trend state DOES go negative,
uses plain truncating DIV on both engines instead.)

Driver rotation: module import order in plans/catalog.py is
APPEND-ONLY (the ordering rule and its rationale live in
plans/catalog.py — newest round module goes last).

Scale notes (100 TB):
- ``stream_ewma``: one hash exchange on user_id, then a per-group
  sort+fold evaluated entirely JVM-side (array_sort + aggregate HOF
  over a struct array — no Python, no window).  The recursion is
  inherently sequential PER KEY, so per-key work is bounded by that
  user's event count; key-parallelism is the scale axis (|users|
  ≫ cores).  A pathological single hot key is the same skew exposure
  every per-user sequence operator in this repo has (events_funnel,
  events_attribution); the unbounded-history cure is the streaming
  twin (``streaming/stateful.py:streaming_ewma``), which carries two
  integers of state per key instead of the batch group's array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.operators.round7_ext import KMV_K
from downloader_spark.plans.registry import query


@query(
    "stream_ewma",
    oracle="""
SELECT user_id,
       CAST(len(cs) AS BIGINT) AS n,
       CAST(list_reduce(cs, (a, x) -> (a + x) // 2) AS BIGINT)
           AS ewma_cents
FROM (
  SELECT user_id,
         list(CAST(floor(value * 100) AS BIGINT)
              ORDER BY ts, event_id) AS cs
  FROM events GROUP BY user_id
)
ORDER BY user_id
""",
    tags=("streaming", "events", "stateful-twin"),
)
def stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recursive integer EWMA (alpha = 1/2) over the full
    event history in (ts, event_id) order: e' = (e + floor(v*100))
    floor-div 2, seeded by the first observation — the batch twin of
    ``streaming.stateful.streaming_ewma``, byte-identical to draining
    the same history through the stateful operator (equivalence
    asserted in tests/test_streaming_equivalence.py).

    The fold is a SQL higher-order ``aggregate`` over the sorted
    struct array — sequential per key by definition (each output
    depends on ALL prior inputs), parallel across keys.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "event_id", "c")).alias("xs"))
        .select(
            "user_id",
            F.size("xs").cast("long").alias("n"),
            # (a + c - pmod(a + c, 2)) DIV 2 == floor((a + c) / 2)
            # exactly, matching Python/DuckDB // on negatives too;
            # struct array_sort orders by (ts, event_id, c) — a total
            # order because event_id is unique.
            F.expr(
                "aggregate(transform(array_sort(xs), s -> s.c),"
                " named_struct('k', CAST(0 AS BIGINT),"
                "              'e', CAST(0 AS BIGINT)),"
                " (acc, c) -> named_struct("
                "   'k', acc.k + CAST(1 AS BIGINT),"
                "   'e', IF(acc.k = 0, c,"
                "        (acc.e + c - pmod(acc.e + c, CAST(2 AS BIGINT)))"
                "        DIV 2)),"
                " acc -> acc.e)"
            ).alias("ewma_cents"),
        )
        .orderBy("user_id")
    )


# -------------------------------------------- interval-overlap join

# 10-minute grid cells in microseconds.  Cell length must exceed the
# longest interval (90 s here) so each interval covers <= 2 cells and
# the explode factor is bounded by 2; on a real deployment the cell is
# sized to the 99.9th-percentile interval length, with a separate
# "long interval" broadcast branch for the tail.
_CELL_US = 600_000_000
_ERR_LEN_US = 90_000_000   # error impact window
_PUR_LEN_US = 60_000_000   # purchase attribution window


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
      SELECT event_id AS error_id, epoch_us(ts) AS a_s,
             epoch_us(ts) + {_ERR_LEN_US} AS a_e
      FROM events WHERE event_type = 'error'
    ),
    b AS (
      SELECT epoch_us(ts) AS b_s, epoch_us(ts) + {_PUR_LEN_US} AS b_e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT error_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(least(a_e, b_e) - greatest(a_s, b_s)) AS BIGINT)
             AS overlap_us
    FROM a JOIN b ON a_s < b_e AND b_s < a_e
    GROUP BY error_id
    """,
    tags=("relational", "join", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key: every (error-impact
    window, purchase-attribution window) pair of overlapping time
    intervals, rolled up per error event — the join shape incident
    correlation, ad attribution, and sensor alignment all need, and
    the one Spark has no native operator for (a raw theta join on
    a_s < b_e AND b_s < a_e plans BroadcastNestedLoopJoin — O(n*m)
    comparisons even when almost nothing overlaps).

    Spark runs the GRID-BUCKETED equi form: each half-open interval
    [s, e) is exploded onto the 10-minute cells it covers
    (sequence(s div C, (e-1) div C) — <= 2 cells since intervals are
    <= 90 s), the join is a plain hash equi-join on the cell with the
    overlap predicate evaluated inside it, and the duplicate-pair
    problem (a pair overlapping in k shared cells would emit k rows)
    is solved WITHOUT a distinct: a pair is kept only in the single
    cell containing the overlap's start, greatest(a_s, b_s) div C.
    Each overlapping pair is counted exactly once, no dedup exchange
    exists in the plan, and every shuffle key is a (cell) integer —
    uniform by construction on event-time data.  At 100 TB both sides
    additionally range-partition by cell so the equi-join co-locates;
    skew only appears if one cell holds a super-spike, and then AQE
    skew-join splits it.

    The oracle is the orthogonal construction: DuckDB's native IEJoin
    range join on the raw inequality predicates — two independent
    algorithms, one answer.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        us.alias("a_s"),
        (us + F.lit(_ERR_LEN_US)).alias("a_e"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        us.alias("b_s"), (us + F.lit(_PUR_LEN_US)).alias("b_e")
    )
    cell = lambda s, e: F.explode(  # noqa: E731 — covered-cell range
        F.sequence(
            F.col(s) - F.pmod(F.col(s), F.lit(_CELL_US)),
            (F.col(e) - 1) - F.pmod(F.col(e) - 1, F.lit(_CELL_US)),
            F.lit(_CELL_US),
        )
    ).alias("cell")
    ac = a.select("error_id", "a_s", "a_e", cell("a_s", "a_e"))
    bc = b.select("b_s", "b_e", cell("b_s", "b_e"))
    pairs = ac.join(bc, "cell").filter(
        (F.col("a_s") < F.col("b_e"))
        & (F.col("b_s") < F.col("a_e"))
        # dedup-free: count the pair only in the overlap-start cell
        & (
            F.col("cell")
            == F.greatest("a_s", "b_s")
            - F.pmod(F.greatest("a_s", "b_s"), F.lit(_CELL_US))
        )
    )
    return pairs.groupBy("error_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(
            F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
        ).cast("long").alias("overlap_us"),
    )


# ------------------------------------- two-level mergeable sketch rollup

_KMV_EST = (
    f"CAST(CASE WHEN n_in_sketch < {KMV_K} THEN n_exact"
    f" WHEN h_k < {KMV_K} THEN n_exact"
    f" ELSE ({KMV_K} - 1) * 576460752303423488 DIV h_k * 2"
    " END AS BIGINT)"
)


@query(
    "agg_sketch_rollup",
    oracle=f"""
    WITH hashed AS (
      SELECT n.n_regionkey, n.n_nationkey,
             {_duck_h60("concat('kmvr:', CAST(c_custkey AS VARCHAR))")} AS h
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    ranked AS (
      SELECT n_regionkey, h,
             row_number() OVER (PARTITION BY n_regionkey ORDER BY h) AS rn
      FROM hashed
    ),
    kth AS (
      SELECT n_regionkey, max(h) AS h_k,
             CAST(count(*) AS BIGINT) AS n_in_sketch
      FROM ranked WHERE rn <= {KMV_K}
      GROUP BY n_regionkey
    ),
    exact AS (
      SELECT n_regionkey,
             CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_nations,
             CAST(count(*) AS BIGINT) AS n_exact
      FROM hashed GROUP BY n_regionkey
    )
    SELECT r.r_name AS region, e.n_nations, e.n_exact, k.n_in_sketch,
           {_KMV_EST.replace("h_k", "k.h_k")
                    .replace("n_in_sketch", "k.n_in_sketch")
                    .replace("n_exact", "e.n_exact")
                    .replace(" DIV ", " // ")} AS kmv_estimate
    FROM exact e
    JOIN kth k ON e.n_regionkey = k.n_regionkey
    JOIN region r ON r.r_regionkey = e.n_regionkey
    """,
    tags=("aggregate", "sketch", "distinct", "mergeable", "rollup"),
)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL mergeable-sketch rollup — the pre-aggregation pattern
    a 100 TB pipeline lives on: distinct customers per REGION estimated
    by first building a {KMV_K}-minimum-values sketch PER NATION
    (the partial a daily job would persist), then MERGING each
    region's nation partials (union -> keep the {KMV_K} smallest) and
    estimating from the merged sketch — the raw rows are touched once,
    at the finest level, and every coarser rollup works on sketch rows
    only ({KMV_K} hashes per nation, not |customers| rows).

    The differential IS the merge-losslessness proof: Spark computes
    the two-level merged sketch; the DuckDB oracle computes the
    region-level sketch DIRECTLY from the raw rows.  KMV's merge
    property (every region-level k-minimum is by definition among its
    own nation's k minima, so min-k(union of per-nation min-k) =
    min-k(region)) makes the two constructions equal exactly — any
    implementation error in either level breaks the hash match.
    Estimator arithmetic and overflow/exact-fallback arms are shared
    with ``agg_kmv_distinct`` (round7_ext).

    Plan shape: both rank prefixes are WindowGroupLimit-pruned (each
    partition discards all but its k smallest before the exchange),
    the nation dimension broadcasts, and the second level's input is
    |nations| * {KMV_K} rows — constant-sized, the point of the
    pattern."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = load_table(spark, sf_dir, "region")
    h = _spark_h60("concat('kmvr:', CAST(c_custkey AS STRING))")
    hashed = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).select("n_regionkey", "n_nationkey", F.expr(h).alias("h"))
    # level 1: per-nation sketch partials (k smallest hashes)
    w1 = Window.partitionBy("n_nationkey").orderBy("h")
    partials = (
        hashed.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    # level 2: merge each region's partials — union + keep k smallest
    w2 = Window.partitionBy("n_regionkey").orderBy("h")
    merged = (
        partials.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
    )
    kth = merged.groupBy("n_regionkey").agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
    )
    exact = hashed.groupBy("n_regionkey").agg(
        F.countDistinct("n_nationkey").cast("long").alias("n_nations"),
        F.count(F.lit(1)).cast("long").alias("n_exact"),
    )
    return (
        exact.join(kth, "n_regionkey")
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            "n_nations",
            "n_exact",
            "n_in_sketch",
            F.expr(_KMV_EST).alias("kmv_estimate"),
        )
    )
