"""Composite pipeline + event-analytics keys (round 3).

`pipeline_corpus` composes the training-data primitives — quality
gate, exact content dedup, deterministic split — into the ONE query a
corpus-prep user actually runs, proving the operators compose without
re-verifying each piece by hand.  `events_funnel` and
`events_retention` are the two standard event-analytics shapes
(ordered-step conversion, cohort retention) expressed as single-scan
aggregations.

Same exactness rules as everywhere: md5-derived 60-bit hashes for
identity/splits, integer epoch arithmetic for time bucketing, NULL
guards on any divisible-by-zero denominator, identical aliases both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.operators.llm_text import (
    DUCK_QUALITY_EXPR,
    quality_stat_columns,
    spark_quality_from_stats,
)
from downloader_spark.plans.registry import query

QUALITY_MIN_PPM = 400_000  # composite quality >= 0.40 survives


@query(
    "pipeline_corpus",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             {DUCK_QUALITY_EXPR} AS quality
      FROM documents
    ),
    gated AS (
      SELECT * FROM scored
      WHERE CAST(floor(quality * 1000000) AS BIGINT) >= {QUALITY_MIN_PPM}
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, md5(text) AS content_md5
      FROM gated GROUP BY md5(text)
    )
    SELECT d.doc_id, g.lang, g.quality, d.content_md5,
           CASE WHEN {_duck_h60("concat('split:', CAST(d.doc_id AS VARCHAR))")} % 100 < 80
                THEN 'train'
                WHEN {_duck_h60("concat('split:', CAST(d.doc_id AS VARCHAR))")} % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM deduped d JOIN gated g ON g.doc_id = d.doc_id
    """,
    tags=("llm", "pipeline", "composite"),
)
def pipeline_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-prep pipeline as ONE declarative plan:
    quality-score every document (text_quality's exact composite),
    gate at quality >= 0.40 (compared in floor-ppm so the float
    boundary is unambiguous), exact-dedup the survivors by content md5
    keeping the lowest doc_id (dedup_exact_hash's struct-min shape),
    and assign the deterministic 80/10/10 split (sample_split's hash
    gate).  This is the composition a real training-data user runs
    nightly; Catalyst pipelines it into scan → map → one dedup shuffle
    → map, with the quality gate pushed below the shuffle so only
    surviving docs are exchanged."""
    docs = load_table(spark, sf_dir, "documents")
    # the SHARED quality composite (llm_text), in the two-stage
    # stats-then-formula shape so the regexp/split trees evaluate once;
    # empty docs score NULL and are dropped by the gate on both engines
    stats = docs.select("doc_id", "lang", "text", *quality_stat_columns())
    gated = stats.select(
        "doc_id",
        "lang",
        "text",
        spark_quality_from_stats().alias("quality"),
    ).filter(
        F.floor(F.col("quality") * 1000000).cast("bigint") >= QUALITY_MIN_PPM
    )
    # struct-min dedup carries the survivor's payload through the ONE
    # aggregation — no join back to `gated`, whose lineage (the quality
    # stats) would otherwise be recomputed on both sides of the join
    survivors = (
        gated.groupBy(F.md5("text").alias("content_md5"))
        .agg(F.min(F.struct("doc_id", "lang", "quality")).alias("m"))
        .select("content_md5", "m.doc_id", "m.lang", "m.quality")
    )
    split_bucket = F.expr(
        f"{_spark_h60(chr(39) + 'split:' + chr(39) + ' || CAST(doc_id AS STRING)')} % 100"
    )
    return survivors.select(
        "doc_id",
        "lang",
        "quality",
        "content_md5",
        F.when(split_bucket < 80, "train")
        .when(split_bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


FUNNEL_WINDOW_S = 3600  # step B must follow step A within an hour


@query(
    "events_funnel",
    oracle=f"""
    WITH steps AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) // 3600000000 AS BIGINT) AS cohort_hour,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT cohort_hour,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS step_view,
           CAST(count(CASE WHEN t_click > t_view
                           AND t_click - t_view <= {FUNNEL_WINDOW_S * 1_000_000}
                           THEN 1 END) AS BIGINT) AS step_click,
           CAST(count(CASE WHEN t_click > t_view
                           AND t_click - t_view <= {FUNNEL_WINDOW_S * 1_000_000}
                           AND t_purchase > t_click
                           AND t_purchase - t_click <= {FUNNEL_WINDOW_S * 1_000_000}
                           THEN 1 END) AS BIGINT) AS step_purchase
    FROM steps
    GROUP BY cohort_hour
    """,
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view → click → purchase, each step within
    an hour of the previous), broken out by first-seen-hour cohort —
    the standard conversion query with the cohort dimension a real
    funnel report carries.  One scan, one shuffle on user_id — the
    per-user step times and the cohort hour are conditional-MIN / MIN
    aggregates (map-side combinable), and the step predicates are
    integer microsecond comparisons (no timestamp arithmetic
    ambiguity).  The second rollup shuffles only one row per user.  At
    100 TB this is the shape that works: no ordering window, no
    self-join per step pair."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, us))

    steps = ev.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(ts) DIV 3600000000")).alias("cohort_hour"),
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    w_us = FUNNEL_WINDOW_S * 1_000_000
    did_click = (
        (F.col("t_click") > F.col("t_view"))
        & (F.col("t_click") - F.col("t_view") <= w_us)
    )
    did_purchase = did_click & (
        (F.col("t_purchase") > F.col("t_click"))
        & (F.col("t_purchase") - F.col("t_click") <= w_us)
    )
    return steps.groupBy("cohort_hour").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("step_view"),
        F.count(F.when(did_click, 1)).alias("step_click"),
        F.count(F.when(did_purchase, 1)).alias("step_purchase"),
    )


SESSION_GAP_S = 1800  # 30-minute inactivity closes a session


@query(
    "events_sessionize",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(sum(CASE WHEN prev_us IS NULL
                         OR epoch_us(ts) - prev_us > {SESSION_GAP_S * 1_000_000}
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_idx
    FROM (
        SELECT event_id, user_id, ts,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events
    )
    """,
    tags=("events", "sessionize"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session-id assignment (gaps-and-islands): an event
    starts a new session when more than {SESSION_GAP_S}s of inactivity
    precede it; ``session_idx`` is the user's running session ordinal.
    This is the row-level companion to stream_session's per-session
    aggregates — the form you need to JOIN session context back onto
    events.  One shuffle on user_id, one sort, two window passes over
    the same frame (lag + running sum — Spark plans them in a single
    Window node); gap arithmetic in integer µs, tie order
    (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros("ts")
    prev_us = F.lag(us).over(order_w)
    new_session = F.when(
        prev_us.isNull() | (us - prev_us > SESSION_GAP_S * 1_000_000), 1
    ).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(new_session).over(run_w).cast("bigint").alias("session_idx"),
    )


@query(
    "events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) // 86400000000 AS BIGINT) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort_day
               AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity
    GROUP BY cohort_day, day_offset
    """,
    tags=("events", "retention"),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted as active per whole-day offset since their cohort day.
    Day bucketing is integer floor-division of epoch microseconds —
    no timezone/calendar ambiguity between engines.  Two shuffles
    (first-seen per user, then the (cohort, offset) rollup of the
    deduplicated activity), both on uniform keys; the firsts table
    joins back broadcast-or-hash as the optimizer prefers."""
    ev = load_table(spark, sf_dir, "events")
    # integer floor-division (DIV), matching DuckDB's `//` — a double
    # division + cast would risk FP-truncation mismatches
    day = F.expr("unix_micros(ts) DIV 86400000000")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (day - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


ATTRIB_LOOKBACK_S = 30 * 86400  # 30-day touch-attribution window before a purchase


@query(
    "events_attribution",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    framed AS (
      SELECT user_id, event_id, event_type,
        arg_min(event_id, printf('%020d:%020d', us, event_id))
          FILTER (event_type IN ('view','click'))
          OVER w AS first_touch_id,
        arg_min(event_type, printf('%020d:%020d', us, event_id))
          FILTER (event_type IN ('view','click'))
          OVER w AS first_touch_type,
        arg_max(event_id, printf('%020d:%020d', us, event_id))
          FILTER (event_type IN ('view','click'))
          OVER w AS last_touch_id,
        arg_max(event_type, printf('%020d:%020d', us, event_id))
          FILTER (event_type IN ('view','click'))
          OVER w AS last_touch_type,
        CAST(count(CASE WHEN event_type IN ('view','click') THEN 1 END)
             OVER w AS BIGINT) AS n_touches
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN {ATTRIB_LOOKBACK_S * 1_000_000} PRECEDING
                   AND 1 PRECEDING)
    )
    SELECT event_id, user_id, first_touch_id, first_touch_type,
           last_touch_id, last_touch_type, n_touches
    FROM framed WHERE event_type = 'purchase'
    """,
    tags=("events", "attribution", "window"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution: every purchase is
    annotated with the earliest and latest view/click in the
    {ATTRIB_LOOKBACK_S}s before it (purchases with no prior touch keep
    NULLs — unattributed conversions are a real category, not an
    error).

    ONE range-frame window over (user, event-time µs) computes first
    touch, last touch, and the touch count together: first/last are
    conditional struct-extrema over the frame (min/max of
    (us, event_id, type) — total order, tie-broken by event_id), so
    no self-join, no per-purchase scan, one shuffle on user_id.  The
    range frame ends at us-1: a same-microsecond touch never
    attributes to its own instant's purchase, identically in both
    engines.  The oracle mirrors the extrema with arg_min/arg_max
    over a fixed-width sortable (us, id) string key."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-ATTRIB_LOOKBACK_S * 1_000_000, -1)
    )
    touch = F.col("event_type").isin("view", "click")
    tkey = F.when(
        touch, F.struct(us.alias("us"), F.col("event_id").alias("id"),
                        F.col("event_type").alias("typ"))
    )
    framed = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.min(tkey).over(w).alias("ft"),
        F.max(tkey).over(w).alias("lt"),
        F.count(F.when(touch, 1)).over(w).alias("n_touches"),
    )
    return framed.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ft.id").alias("first_touch_id"),
        F.col("ft.typ").alias("first_touch_type"),
        F.col("lt.id").alias("last_touch_id"),
        F.col("lt.typ").alias("last_touch_type"),
        "n_touches",
    )


@query(
    "events_pattern",
    oracle="""
    WITH stream AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      FROM events WHERE event_type <> 'error'
    ),
    seq AS (
      SELECT user_id, event_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_id, 1) OVER w AS id1,
             lead(event_type, 2) OVER w AS t2,
             lead(event_id, 2) OVER w AS id2
      FROM stream
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT user_id, event_id AS view_id, id1 AS click_id, id2 AS purchase_id
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    """,
    tags=("events", "pattern", "cep"),
)
def events_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern detection (MATCH_RECOGNIZE / CEP semantics in
    batch): emit every strictly-consecutive view→click→purchase triple
    in a user's error-filtered event stream — the funnel's strict
    cousin (events_funnel allows gaps; this demands adjacency, the
    shape CEP engines sell).

    One window pass: two leads over the (ts, event_id)-ordered stream
    (a total order, so adjacency is well-defined under ties), filter
    to the pattern — no self-joins, one shuffle on user_id, and the
    two leads share a single Window node.  At 100 TB this is the
    pattern-mining shape that scales: per-user sequences co-locate
    under one exchange and the match test is a row-local predicate."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") != "error"
    )
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_id", 1).over(w).alias("id1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("event_id", 2).over(w).alias("id2"),
    )
    return seq.filter(
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
    ).select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("id1").alias("click_id"),
        F.col("id2").alias("purchase_id"),
    )


@query(
    "events_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST((n * 1000000) // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS prob_ppm
    FROM pairs
    """,
    tags=("events", "analytics", "window"),
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: LEAD pairs each event with its successor (total order:
    ts then event_id, so ties never flip cross-engine), the pair
    counts aggregate, and each row carries its integer-ppm
    transition probability (floor of n*1e6 / row-total — both
    operands positive, so DuckDB's floor-div and Spark's DIV
    agree).  The funnel/recommender companion: "what follows a
    signup, with what probability".

    Plan: one window shuffle on user_id (uniform key), one |types|²
    aggregation, then a second window over ≤ |types|² rows — the
    expensive stage scans each event exactly once.  At 100 TB the
    per-user ordering shuffle is the irreducible cost; everything
    after is tiny."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.expr("CAST((n * 1000000) DIV SUM(n) OVER (PARTITION BY from_type) AS BIGINT)").alias(
            "prob_ppm"
        ),
    )


@query(
    "events_spike",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, bucket, n,
             CAST(count(*) OVER tw AS BIGINT) AS wn,
             SUM(n) OVER tw AS s,
             SUM(n * n) OVER tw AS ss
      FROM hourly
      WINDOW tw AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket, n, wn, CAST(s AS BIGINT) AS s
    FROM w
    WHERE wn >= 12
      AND (wn * n - s) > 0
      AND (wn * n - s) * (wn * n - s) * 4 > 25 * (wn * ss - s * s)
    """,
    tags=("events", "anomaly", "timeseries", "window"),
)
def events_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-spike detection over hourly event counts — flag any hour
    whose count exceeds its own type's trailing-24h mean by more than
    2.5 trailing standard deviations, computed float-free: the
    z-score inequality |n - s/w| > 2.5·σ is multiplied through by
    (2w)² into the all-integer form (w·n - s)²·4 > 25·(w·ss - s²),
    restricted to positive deviations (spikes, not dips), with a
    12-observation warm-up before any flag fires (the agg_outliers
    trick applied to a MOVING frame — anomaly detection on the
    monitoring series the reference only counts, metrics.go:29-42).

    Plan: the event scan partial-aggregates to |types|x|hours| rows
    BEFORE any window work, so the trailing-frame pass runs over the
    tiny hourly series — the same two-stage shape a 100 TB streaming
    monitor would use (aggregate in the stream, detect on the
    rollup)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tw = (
        Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-24, -1)
    )
    w = hourly.select(
        "event_type",
        "bucket",
        "n",
        F.count(F.lit(1)).over(tw).cast("long").alias("wn"),
        F.sum("n").over(tw).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(tw).alias("ss"),
    )
    dev = F.col("wn") * F.col("n") - F.col("s")
    return w.filter(
        (F.col("wn") >= 12)
        & (dev > 0)
        & (dev * dev * 4 > 25 * (F.col("wn") * F.col("ss") - F.col("s") * F.col("s")))
    ).select("event_type", "bucket", "n", "wn", "s")


@query(
    "table_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
               AS price_pu
      FROM orders WHERE o_orderkey % 97 <> 0
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = 0
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 11000 AS BIGINT)
                  ELSE CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
             END AS price_pu
      FROM orders WHERE o_orderkey % 101 <> 0
    )
    SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           v1.price_pu AS old_price_pu,
           v2.price_pu AS new_price_pu
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.price_pu <> v2.price_pu
    """,
    tags=("cdc", "join", "diff"),
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC detect): classify every key across two
    table versions as added / removed / changed via a full outer
    join on the primary key, emitting only the delta.  The two
    "snapshots" are deterministic transforms of orders (v1 drops
    keys %97=0, v2 drops %101=0 and bumps price 10% on %89=0), so
    the key exercises all three change classes with exact-integer
    price comparison.

    The canonical incremental-maintenance primitive: at 100 TB both
    sides hash-partition on the SAME key, the join co-locates
    one-to-one, and unchanged rows (the overwhelming majority) are
    filtered before anything downstream — the output is O(churn),
    not O(table).  Bucketed snapshots would make the diff
    exchange-free (sinks.py's bucketing demonstrates the layout)."""
    orders = load_table(spark, sf_dir, "orders")
    pu = "CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
    v1 = orders.filter("o_orderkey % 97 <> 0").select(
        "o_orderkey", F.expr(pu).alias("price_pu")
    )
    v2 = orders.filter("o_orderkey % 101 <> 0").select(
        "o_orderkey",
        F.expr(
            "CASE WHEN o_orderkey % 89 = 0"
            " THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 11000 AS BIGINT)"
            f" ELSE {pu} END"
        ).alias("price_pu"),
    )
    j = v1.withColumnRenamed("price_pu", "old_price_pu").join(
        v2.withColumnRenamed("o_orderkey", "k2").withColumnRenamed(
            "price_pu", "new_price_pu"
        ),
        F.col("o_orderkey") == F.col("k2"),
        "full_outer",
    )
    return j.filter(
        F.col("o_orderkey").isNull()
        | F.col("k2").isNull()
        | (F.col("old_price_pu") != F.col("new_price_pu"))
    ).select(
        F.coalesce("o_orderkey", "k2").alias("o_orderkey"),
        F.when(F.col("o_orderkey").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
        "old_price_pu",
        "new_price_pu",
    )


# Pretraining shard assembly: minimum doc length + per-shard budget.
PRETRAIN_MIN_CHARS = 256
SHARD_TOK_BUDGET = 2048


@query(
    "pipeline_pretrain",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, lang, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents WHERE n_chars >= {PRETRAIN_MIN_CHARS}
    ),
    kept AS (
      SELECT doc_id, lang, n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    placed AS (
      SELECT lang, doc_id, n_tok,
             CAST((SUM(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                                    ROWS UNBOUNDED PRECEDING) - 1)
                  // {SHARD_TOK_BUDGET} AS BIGINT) AS shard
      FROM kept
    )
    SELECT lang, shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM placed
    GROUP BY lang, shard
    """,
    tags=("llm", "pipeline", "composite", "training-data"),
)
def pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining shard-assembly pipeline as ONE declarative
    plan: length gate → exact content dedup (keep-first) → md5-
    shuffled placement → token-budget shard cut → per-shard manifest
    (doc count, token count, membership-anchoring min/max doc) — what
    a data loader consumes to stream a training epoch.

    Composition discipline: the gate sits UNDER the dedup shuffle
    (rows die before they move), dedup is the sortless min-per-digest
    aggregation (dedup_exact_hash's shape), and shard placement is a
    per-lang running token sum over the (hash, id) order — the
    reproducible shuffle.  Only (doc_id, lang, n_tok, hash) ever
    shuffles; the text dies at the scan after hashing.  At 100 TB the
    per-lang running sum adopts curriculum_order's two-phase
    bucket-offset recipe; the within-lang window here is the
    driver-scale specialization of the same total order."""
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(F.col("n_chars") >= PRETRAIN_MIN_CHARS).select(
        "doc_id",
        "lang",
        F.md5("text").alias("content_md5"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    kept = (
        gated.groupBy("content_md5")
        .agg(
            F.min(
                F.struct(
                    F.col("doc_id").alias("doc_id"),
                    F.col("lang").alias("lang"),
                    F.col("n_tok").alias("n_tok"),
                )
            ).alias("k")
        )
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.lang").alias("lang"),
            F.col("k.n_tok").alias("n_tok"),
            F.md5(F.col("k.doc_id").cast("string")).alias("h"),
        )
    )
    placed = kept.select(
        "lang",
        "doc_id",
        "n_tok",
        F.expr(
            f"(sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)"
            f" DIV {SHARD_TOK_BUDGET}"
        ).alias("shard"),
    )
    return placed.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "events_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
      FROM events GROUP BY user_id
    ),
    converted AS (
      SELECT user_id,
             CAST((p_us - v_us) // 60000000 AS BIGINT) AS mins
      FROM firsts WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us
    )
    SELECT CAST(CASE WHEN mins <= 0 THEN 0 ELSE len(bin(mins)) END AS INT)
             AS bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(mins) AS BIGINT) AS min_mins,
           CAST(max(mins) AS BIGINT) AS max_mins
    FROM converted
    GROUP BY bucket
    """,
    tags=("events", "funnel", "histogram"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: minutes from a user's FIRST
    view to their FIRST purchase at-or-after it, rolled into
    power-of-two latency buckets (1m, 2m, 4m, ... — the log-scale
    histogram every conversion dashboard draws).

    One conditional-MIN aggregation per user (events_funnel's
    single-pass shape — view-min and purchase-min ride the same
    groupBy), then a driver-scale rollup.  The log2 bucket is
    computed EXACTLY as the binary-representation length of the
    integer minutes (len(bin(m)) — identical in both engines), never
    float log2, whose boundary rounding can disagree."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    converted = firsts.filter(
        F.col("v_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") >= F.col("v_us"))
    ).select(
        F.expr("(p_us - v_us) DIV 60000000").alias("mins")
    )
    bucket = F.when(F.col("mins") <= 0, 0).otherwise(
        F.length(F.bin("mins"))
    ).cast("int")
    return converted.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("mins").alias("min_mins"),
        F.max("mins").alias("max_mins"),
    )


# A/B assignment: md5 ring split, treatment share in percent.
AB_TREAT_PCT = 50


@query(
    "events_ab_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN {_duck_h60("concat('ab:', CAST(user_id AS VARCHAR))")}
                       % 100 < {AB_TREAT_PCT}
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT arm, week,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(cents * cents) AS BIGINT) AS sumsq_cents,
           round(CAST(sum(cents) AS DOUBLE) / count(*), 4) AS mean_cents
    FROM assigned
    GROUP BY arm, week
    """,
    tags=("events", "experiment", "sampling"),
)
def events_ab_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout: users split 50/50 into
    arms by an md5 ring over user_id (sticky, reproducible,
    engine-independent — RNG assignment can't be oracle-checked or
    replayed), purchase value rolled up per arm with the exact
    integer moments (n, Σx, Σx²) a t-test consumes.

    The assignment hash is sample_split's salted-md5 gate over a
    different salt ('ab:'), so experiment membership is independent
    of the train/val/test split by construction — the property
    experimentation platforms must guarantee.  One scan, one
    two-group aggregation; variance math happens downstream on exact
    BIGINTs, so the only float is the per-arm mean of identical
    integers."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    h = F.expr(_spark_h60("concat('ab:', CAST(user_id AS STRING))"))
    arm = F.when(h % 100 < AB_TREAT_PCT, "treatment").otherwise("control")
    cents = F.floor(F.col("value") * 100).cast("long")
    week = F.expr("unix_micros(ts) DIV 604800000000")
    assigned = ev.select(
        arm.alias("arm"), week.alias("week"), cents.alias("cents")
    )
    return assigned.groupBy("arm", "week").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("cents").alias("sum_cents"),
        F.sum(F.col("cents") * F.col("cents")).alias("sumsq_cents"),
        F.round(F.sum("cents").cast("double") / F.count(F.lit(1)), 4).alias(
            "mean_cents"
        ),
    )


@query(
    "events_ltv_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) // 86400000000 AS BIGINT) AS cohort_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT f.cohort_day,
             CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort_day
               AS day_offset,
             CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
               AS day_cents
      FROM events e
      JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY f.cohort_day,
               CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort_day
    )
    SELECT cohort_day, day_offset, day_cents,
           CAST(sum(day_cents) OVER (
             PARTITION BY cohort_day ORDER BY day_offset
             ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_cents
    FROM daily
    """,
    tags=("events", "ltv", "cohort", "window"),
)
def events_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: purchase revenue per
    (first-seen day, day offset) with the CUMULATIVE running total
    every LTV curve plots — events_retention's money twin plus a
    window-over-aggregate cumulative sum.

    Shape: first-seen week per user (one agg), revenue rollup on the
    joined fact (second agg), then the running sum over the TINY
    (cohorts x offsets) triangle — the cumulative window never
    touches fact-sized data.  Revenue is floor-cents BIGINTs
    end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_day", (day - F.col("cohort_day")).alias("day_offset")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "day_cents"
            )
        )
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "cohort_day",
        "day_offset",
        "day_cents",
        F.sum("day_cents").over(w).cast("long").alias("cum_cents"),
    )
