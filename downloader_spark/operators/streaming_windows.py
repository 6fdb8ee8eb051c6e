"""Streaming window semantics, batch-expressed (SURVEY.md §2.B,
Phase 3): tumbling / sliding / session windows and a late-data
watermark filter over ``events``.

These are the exact-checkable batch forms of the reference's
incremental core — the watermark advance at
/root/reference/download/routeviews.go:60-62 and the incremental scan
at routeviews.go:107.  The genuine Structured Streaming wrappers
(``readStream`` + ``withWatermark``) live in
``downloader_spark.streaming`` and are validated by equivalence with
these batch plans; the driver's DuckDB oracle checks THESE.

Scale posture: every query here is one hash aggregation keyed by
(time-bucket[, dim]) — the shuffle key space grows with time range,
not data volume, so partitions stay balanced at 100 TB (time buckets
are near-uniform for event streams).  Float sums go through the
decimal-exact helper (functions/numeric.py) so partial-aggregation
order can't perturb the hash.

Session windows are the one genuinely stateful shape: the batch form
is a per-user sort (gaps-and-islands), which Spark executes as one
shuffle on user_id + in-partition sort — the same distribution
Structured Streaming uses for its session-state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.functions.numeric import money_sum, sql_money_sum
from downloader_spark.io import load_table
from downloader_spark.plans.registry import query

# DuckDB: naive-UTC epoch bucketing without timezone dependence.
_DUCK_BUCKET = (
    "TIMESTAMP '1970-01-01 00:00:00' + (epoch_us(ts) // {us} * {s}) * INTERVAL 1 SECOND"
)


@query(
    "stream_tumbling",
    oracle=f"""
    SELECT {_DUCK_BUCKET.format(us=600_000_000, s=600)} AS win_start,
           {_DUCK_BUCKET.format(us=600_000_000, s=600)} + INTERVAL 10 MINUTE AS win_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sql_money_sum("value", "val_sum")}
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming",),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window count/sum per event type
    (``F.window`` — epoch-aligned buckets, oracle = integer epoch
    floor).  The window struct is flattened to plain timestamp
    columns: the driver canonicalizer cannot hash structs."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), money_sum("value", "val_sum"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "val_sum",
        )
    )


@query(
    "stream_sliding",
    oracle=f"""
    WITH slid AS (
      SELECT e.*,
             {_DUCK_BUCKET.format(us=300_000_000, s=300)}
               - k.k * INTERVAL 5 MINUTE AS win_start
      FROM events e
      CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    )
    SELECT win_start,
           win_start + INTERVAL 10 MINUTE AS win_end,
           CAST(count(*) AS BIGINT) AS n,
           {sql_money_sum("value", "val_sum")}
    FROM slid
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10-minute length, 5-minute slide): every event
    lands in exactly length/slide = 2 windows.  The oracle generates
    the two candidate starts per event (slide-aligned floor minus
    k*slide for k in 0..1) — the standard offset-generation rewrite of
    a sliding window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), money_sum("value", "val_sum"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n",
            "val_sum",
        )
    )


@query(
    "stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    numbered AS (
      SELECT *, sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS sess_start,
           max(ts) + INTERVAL 30 MINUTE AS sess_end,
           CAST(count(*) AS BIGINT) AS n
    FROM numbered
    GROUP BY user_id, sess_id
    """,
    tags=("streaming",),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window per user, 30-minute gap (``F.session_window``).

    Spark's merge rule (probed empirically, Spark 4.1): an event
    merges into the open session iff ts <= last_ts + gap — the
    boundary event at exactly last+gap MERGES; session end =
    max(ts) + gap.  The gaps-and-islands oracle flags a new session
    only when ts is STRICTLY past lag(ts) + gap to match."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n",
        )
    )


@query(
    "rollup_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
      FROM events
    ),
    buckets AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, b.bucket FROM types t CROSS JOIN buckets b),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             {sql_money_sum("value", "val_sum")}
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.bucket,
           COALESCE(a.n, 0) AS n,
           COALESCE(a.val_sum, 0.0) AS val_sum
    FROM grid g LEFT JOIN agg a
      ON a.event_type = g.event_type AND a.bucket = g.bucket
    """,
    tags=("streaming", "timeseries"),
)
def rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup (the hypertable/time-series resample
    shape): a dense (event_type x hour) grid from the stream's bounds,
    left-joined with the hourly aggregates, empty buckets filled with
    zeros — downstream consumers (charts, anomaly detectors, training
    windows) need the dense series, not the sparse one.

    Scale: the grid is |types| x |hours| — generated from a 1-row
    bounds aggregate via sequence+explode, it costs nothing next to
    the event scan; the join key (type, hour-bucket) is the same key
    the aggregation shuffles on, and the tiny grid side broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    buckets = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(buckets))
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count("*").alias("n"), money_sum("value", "val_sum"))
    return (
        grid.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("val_sum", F.lit(0.0)).alias("val_sum"),
        )
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (small x small only — the grid/expansion
    primitive; rollup_gapfill is its real use).  Any large-side cross
    product is a design bug, which is why the plan-quality suite
    asserts no OTHER registered plan contains a CartesianProduct."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "stream_late_filter",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def stream_late_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark / late-data drop, batch-expressed: keep events within
    1 hour of the stream's max timestamp (streaming form:
    ``withWatermark('ts', '1 hour')`` dropping data older than
    max(event time) - delay).

    The max(ts) aggregate is a 1-row DataFrame broadcast into the
    filter — at 100 TB the scalar subquery costs one column-pruned
    scan (Parquet statistics make it near-free) and the filter itself
    is pushed to the scan."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("wm_ts")
    )
    return (
        ev.join(F.broadcast(wm), F.col("ts") > F.col("wm_ts"), "inner")
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "ts_interpolate",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
      FROM events
    ),
    buckets AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, b.bucket FROM types t CROSS JOIN buckets b),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
                  AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    dense AS (
      SELECT g.event_type, g.bucket,
             CAST(epoch(g.bucket) // 3600 AS BIGINT) AS h, a.v
      FROM grid g LEFT JOIN agg a
        ON a.event_type = g.event_type AND a.bucket = g.bucket
    ),
    ctx AS (
      SELECT event_type, bucket, h, v,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
             FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
      FROM dense
    )
    SELECT event_type, bucket,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + CAST(floor(CAST((nv - pv) * (h - ph) AS DOUBLE)
                                     / (nh - ph)) AS BIGINT) END AS v4,
           (v IS NULL) AS filled
    FROM ctx
    WHERE v IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
    """,
    tags=("streaming", "timeseries", "window"),
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing hourly buckets — the
    gap-filling sibling of ``rollup_gapfill`` that estimates instead
    of zero-filling: each absent (type, hour) gets
    ``prev + floor((next - prev) * steps / gap)`` between its
    nearest observed neighbors (edges with only one neighbor are
    dropped — no extrapolation).  Values are exact 4dp-integer sums
    (DECIMAL cents-of-cents), the interpolation is one float
    division of exact integers floored back to BIGINT, so both
    engines emit identical values even for downward-sloping
    (negative-numerator) gaps where trunc- vs floor-division would
    diverge.

    Plan: the same 1-row-bounds dense grid as rollup_gapfill (costs
    nothing), one hourly aggregation, then TWO window passes over
    the |types| x |hours| grid — which is tiny relative to the event
    scan at any scale; the event data itself shuffles exactly once,
    on the aggregation key."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    buckets = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(buckets))
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT)"
        ).alias("v")
    )
    dense = grid.join(agg, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.expr("CAST(unix_timestamp(bucket) DIV 3600 AS BIGINT)").alias("h"),
        "v",
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    known_h = F.expr("CASE WHEN v IS NOT NULL THEN h END")
    ctx = dense.select(
        "event_type",
        "bucket",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(known_h, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(known_h, ignorenulls=True).over(w_next).alias("nh"),
    )
    return ctx.filter(
        F.col("v").isNotNull()
        | (F.col("pv").isNotNull() & F.col("nv").isNotNull())
    ).select(
        "event_type",
        "bucket",
        F.expr(
            "CASE WHEN v IS NOT NULL THEN v"
            " ELSE pv + CAST(floor(CAST((nv - pv) * (h - ph) AS DOUBLE)"
            " / (nh - ph)) AS BIGINT) END"
        ).alias("v4"),
        F.col("v").isNull().alias("filled"),
    )
