"""Round-9 surface extensions: the batch twin of the stateful
streaming EWMA (``stream_ewma``), closing the round-7/8 promise in
``streaming/stateful.py`` that the recursive integer fold has an
oracle-checked batch equivalent.  (Reference analog: the reference's
per-source watermark state, routeviews.go:60-62, is the same keyed
incremental-fold shape; an EWMA is its numeric generalisation.)

Differential style: the Spark side folds a sorted struct-array with a
SQL ``aggregate`` lambda whose floor-division is spelled explicitly
as ``(a + c - pmod(a + c, 2)) DIV 2`` (Spark ``DIV`` truncates, so
pmod-subtraction makes it a true floor); the DuckDB oracle uses a
completely different construction — ``list(... ORDER BY ...)`` +
``list_reduce`` with DuckDB's native flooring ``//``.  Both replicate
``streaming.stateful.fold_ewma`` (the pure-Python reference model,
asserted in tests/test_properties_r9.py), so the streaming operator,
the batch twin, and the oracle share one arithmetic definition.

Cross-engine exactness: floor-cents integer state (``floor(value *
100)`` on the same IEEE double both engines); the fold order is the
total order (ts, event_id) — event_id is unique, so the recursion is
deterministic; NO signed division ambiguity (pmod-floor on the Spark
side mirrors DuckDB ``//`` flooring even for negative cents).

IMPORTANT (driver rotation): this module must stay the LAST import in
plans/catalog.py (after round7_ext) — the driver confirms a 50-key
prefix per round ordered never-confirmed-first then registry order,
so keys registered here sort AFTER any earlier never-confirmed keys.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
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
