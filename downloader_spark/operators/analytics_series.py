"""Ordered-series analytics: OHLC candle aggregation, sweep-line peak
concurrency, trailing EWMA, percentile winsorization, and a two-phase
Pareto skyline (SURVEY.md §2.B north star — the time-ordered /
order-statistic query surface over the archived fact streams the
reference publishes, routeviews.go:25-31 being itself an ordered
(seqnum, timestamp) series).

Cross-engine exactness: prices and values enter comparisons as
DECIMAL(18,2) or floor-scaled integers (floor(x*100) — floor on a
double is exact and identical cross-engine, unlike round(), which is
HALF_UP in Spark and not in DuckDB); weights are powers of two;
every division is an integer floor DIV present in both dialects.

Scale notes (100 TB):
- ``agg_ohlc`` is ONE hash aggregation: open/close are struct-extrema
  over the unique (ship-day, orderkey, linenumber) total order —
  associative, map-side combinable, no window, no sort.  The oracle
  uses an independent ranking (QUALIFY row_number) formulation — two
  algorithms, one hash.
- ``events_concurrency`` partitions the sweep line by DAY: intervals
  are clipped into per-day segments first, so no window ever spans
  more than a day's endpoints (at 100 TB you'd sub-shard hot days
  and prefix-merge shard offsets — same two-phase shape as the
  skyline below).
- ``ts_ewma`` is one Window node with 8 lag() taps — Spark collapses
  the taps into a single pass; partition key user_id is uniform.
- ``agg_winsorize`` computes the per-group thresholds in one tiny
  aggregation broadcast back over the scan — two passes, no sort of
  the data itself.
- ``agg_skyline`` is the two-phase global-order pattern: band-local
  windows + a running max over the (tiny) band-stats table, instead
  of one global-order window that would serialize the whole table
  through a single partition.  This is the general recipe for
  "needs a global ORDER BY" operators at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.functions.numeric import dec
from downloader_spark.io import load_table
from downloader_spark.plans.registry import query

# Sessions: same inactivity gap as events_sessionize (pipeline_ext).
CONC_GAP_S = 1800
# EWMA: alpha = 1/2 over the trailing EWMA_TAPS observations —
# weights are exact powers of two, newest first.
EWMA_TAPS = 8
_EWMA_W = [1 << (EWMA_TAPS - 1 - k) for k in range(EWMA_TAPS)]  # 128..1
# Winsorization percentile bounds (exact interpolated percentiles).
WINSOR_LO = 0.05
WINSOR_HI = 0.95
# Skyline price bands: $100 per band (cents DIV 10000).
SKY_BAND_CENTS = 10_000


@query(
    "agg_ohlc",
    oracle="""
    WITH r AS (
      SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             CAST(l_quantity AS DECIMAL(18,2)) AS q,
             row_number() OVER (PARTITION BY year(l_shipdate) * 100 + month(l_shipdate)
                                ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn_a,
             row_number() OVER (PARTITION BY year(l_shipdate) * 100 + month(l_shipdate)
                                ORDER BY l_shipdate DESC, l_orderkey DESC,
                                         l_linenumber DESC) AS rn_d
      FROM lineitem
    )
    SELECT ym,
           round(CAST(min(CASE WHEN rn_a = 1 THEN p END) AS DOUBLE), 2) AS open,
           round(CAST(max(p) AS DOUBLE), 2) AS high,
           round(CAST(min(p) AS DOUBLE), 2) AS low,
           round(CAST(min(CASE WHEN rn_d = 1 THEN p END) AS DOUBLE), 2) AS close,
           round(CAST(sum(q) AS DOUBLE), 2) AS volume,
           count(*) AS n_trades
    FROM r
    GROUP BY ym
    """,
    tags=("aggregate", "timeseries", "ohlc"),
)
def agg_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle aggregation: per ship-month open/high/low/close of
    l_extendedprice over the unique (l_shipdate, l_orderkey,
    l_linenumber) total order, plus volume — the canonical downsample
    for any ordered numeric stream (finance candles, sensor rollups).

    Open/close are struct-extrema — min/max of (order-key..., price)
    structs — so the WHOLE operator is one associative hash
    aggregation: map-side partials combine, no window, no sort, no
    second pass.  The oracle instead ranks rows (row_number() = 1
    ascending/descending) — two independent algorithms agreeing on
    one hash.  Prices compare as DECIMAL(18,2); emitted as
    round(double, 2) on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    ym = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym")
    p = dec("l_extendedprice", 2)
    s = F.struct(
        F.col("l_shipdate").alias("d"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        p.alias("p"),
    )
    return (
        li.select(ym, p.alias("p"), dec("l_quantity", 2).alias("q"), s.alias("s"))
        .groupBy("ym")
        .agg(
            F.round(F.min("s").getField("p").cast("double"), 2).alias("open"),
            F.round(F.max("p").cast("double"), 2).alias("high"),
            F.round(F.min("p").cast("double"), 2).alias("low"),
            F.round(F.max("s").getField("p").cast("double"), 2).alias("close"),
            F.round(F.sum("q").cast("double"), 2).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


@query(
    "events_concurrency",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT user_id, us,
             CASE WHEN prev_us IS NULL
                       OR us - prev_us > {CONC_GAP_S * 1_000_000}
                  THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ), sess0 AS (
      SELECT user_id, us,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), sess AS (
      SELECT user_id, sid, min(us) AS s_us,
             max(us) + {CONC_GAP_S * 1_000_000} AS e_us
      FROM sess0 GROUP BY user_id, sid
    ), days AS (
      SELECT user_id, sid, s_us, e_us, CAST(d AS BIGINT) AS day
      FROM sess, LATERAL unnest(generate_series(
             s_us // 86400000000, (e_us - 1) // 86400000000)) AS t(d)
    ), deltas AS (
      SELECT day, greatest(s_us, day * 86400000000) AS t, 1 AS delta
      FROM days
      UNION ALL
      SELECT day, least(e_us, (day + 1) * 86400000000) AS t, -1 AS delta
      FROM days
    ), run AS (
      SELECT day,
             sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM deltas
    )
    SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY day
    """,
    tags=("events", "sweepline", "window"),
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day, exactly, by sweep line:
    sessionize each user's stream (same {CONC_GAP_S}s gap rule as
    events_sessionize), close each session {CONC_GAP_S}s after its
    last event, clip the [start, end) intervals into per-day
    segments, emit +1/-1 endpoint deltas, and take the max running
    sum per day.  Endpoint order (t, delta) processes closings
    before openings at the same instant — half-open interval
    semantics, and the max is invariant under reordering of
    identical (t, delta) rows, so the result is total-order-free.

    Scale: every window partitions by user_id or day — the sweep is
    never global.  A hot day at 100 TB would shard into (day, k)
    ranges whose running sums prefix-merge (associative), the same
    two-phase shape as agg_skyline."""
    return daily_peak_concurrency(load_table(spark, sf_dir, "events"))


def daily_peak_concurrency(ev: DataFrame) -> DataFrame:
    """Core sweep-line pipeline over (user_id, ts, event_id) rows."""
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = Window.partitionBy("user_id").orderBy("us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    us = F.unix_micros("ts")
    prev = F.lag(us).over(order_w)
    flagged = ev.select(
        "user_id",
        us.alias("us"),
        F.when(prev.isNull() | (us - prev > CONC_GAP_S * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    sess = (
        flagged.withColumn("sid", F.sum("new_s").over(run_w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("us").alias("s_us"),
            (F.max("us") + CONC_GAP_S * 1_000_000).alias("e_us"),
        )
    )
    day_us = 86_400_000_000
    days = sess.select(
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us DIV {day_us}"), F.expr(f"(e_us - 1) DIV {day_us}")
            )
        ).alias("day"),
    )
    starts = days.select(
        "day", F.greatest("s_us", F.expr(f"day * {day_us}")).alias("t"), F.lit(1).alias("delta")
    )
    ends = days.select(
        "day",
        F.least("e_us", F.expr(f"(day + 1) * {day_us}")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    sweep_w = Window.partitionBy("day").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        starts.unionAll(ends)
        .withColumn("conc", F.sum("delta").over(sweep_w))
        .groupBy("day")
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
    )


@query(
    "ts_ewma",
    oracle=f"""
    WITH v AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(floor(value * 100) AS BIGINT) AS v_cents
      FROM events
    ), lagged AS (
      SELECT event_id, user_id, v_cents,
             row_number() OVER w AS rn,
             {", ".join(f"lag(v_cents, {k}) OVER w AS l{k}" for k in range(EWMA_TAPS))}
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT event_id, user_id, v_cents,
           CAST(({" + ".join(f"{w} * l{k}" for k, w in enumerate(_EWMA_W))})
                // {sum(_EWMA_W)} AS BIGINT) AS ewma_cents
    FROM lagged
    WHERE rn >= {EWMA_TAPS}
    """,
    tags=("timeseries", "window", "ewma"),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average of event values
    per user, integer-exact: alpha = 1/2 over the last {EWMA_TAPS}
    observations gives power-of-two weights (128, 64, ..., 1), so
    ewma = sum(w_k * lag_k) DIV sum(w) is pure integer arithmetic —
    the standard streaming smoother with none of float EWMA's
    order-dependence.  Values enter as floor(value * 100) cents
    (floor on a double is exact cross-engine; round() is not).

    One Window node: Spark evaluates all {EWMA_TAPS} lag() taps in a
    single pass over each user partition.  The {EWMA_TAPS}-row
    warm-up is dropped (rn >= {EWMA_TAPS}) so every output has a
    full tap set."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    v = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v_cents"),
    )
    lagged = v.select(
        "event_id",
        "user_id",
        "v_cents",
        F.row_number().over(w).alias("rn"),
        *[F.lag("v_cents", k).over(w).alias(f"l{k}") for k in range(EWMA_TAPS)],
    )
    num = " + ".join(f"{w_} * l{k}" for k, w_ in enumerate(_EWMA_W))
    return lagged.filter(F.col("rn") >= EWMA_TAPS).selectExpr(
        "event_id",
        "user_id",
        "v_cents",
        f"CAST(({num}) DIV {sum(_EWMA_W)} AS BIGINT) AS ewma_cents",
    )


@query(
    "agg_winsorize",
    oracle=f"""
    WITH th AS (
      SELECT lang,
             quantile_cont(n_chars, {WINSOR_LO}) AS lo,
             quantile_cont(n_chars, {WINSOR_HI}) AS hi
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           round(greatest(th.lo, least(th.hi, CAST(d.n_chars AS DOUBLE))), 2)
             AS clamped,
           CAST(d.n_chars < th.lo OR d.n_chars > th.hi AS BOOLEAN) AS clipped
    FROM documents d JOIN th ON d.lang = th.lang
    """,
    tags=("aggregate", "percentile", "ml-prep"),
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization, the standard outlier-robust feature
    clamp: per-language p5/p95 of document length (exact interpolated
    percentiles — Spark ``percentile`` and DuckDB ``quantile_cont``
    interpolate bit-identically over integers, the agg_percentile
    precedent), then every document's length clamps into [p5, p95]
    with a clipped flag.

    Two passes, no data sort: the thresholds are ONE tiny per-group
    aggregation (5 rows) broadcast back over the scan — the shape
    that holds at any corpus size.  At 100 TB the exact percentile
    pass would swap for approx_percentile with the same plan."""
    docs = load_table(spark, sf_dir, "documents")
    th = docs.groupBy("lang").agg(
        F.expr(f"percentile(n_chars, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(n_chars, {WINSOR_HI})").alias("hi"),
    )
    return (
        docs.join(F.broadcast(th), "lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(
                F.greatest("lo", F.least("hi", F.col("n_chars").cast("double"))), 2
            ).alias("clamped"),
            ((F.col("n_chars") < F.col("lo")) | (F.col("n_chars") > F.col("hi")))
            .alias("clipped"),
        )
    )


@query(
    "agg_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           CAST(floor(p.p_retailprice * 100) AS BIGINT) AS cents,
           p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE floor(q.p_retailprice * 100) <= floor(p.p_retailprice * 100)
        AND q.p_size >= p.p_size
        AND (floor(q.p_retailprice * 100) < floor(p.p_retailprice * 100)
             OR q.p_size > p.p_size)
    )
    """,
    tags=("aggregate", "skyline", "two-phase"),
)
def agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline (minimize price, maximize size): the parts
    no other part dominates — cheaper-or-equal AND bigger-or-equal
    with at least one strict.  The multi-objective top-k primitive
    (Börzsönyi et al., ICDE'01 skyline operator, public work).

    Two-phase, never a global sort: parts bucket into $100 price
    bands; per-band max sizes (a TINY table) get a running max over
    strictly-lower bands, broadcast back; then a band-LOCAL range
    window supplies the max size at strictly-lower prices within the
    band, and a per-price partition catches same-price strict
    domination.  A row survives iff no prior max reaches it.  The
    oracle is the independent NOT EXISTS quantifier form — two
    algorithms, one hash.  This band + prefix-merge decomposition is
    the general scale recipe for global-order operators (same shape
    as events_concurrency's sharded sweep)."""
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_name",
        F.expr("CAST(floor(p_retailprice * 100) AS BIGINT)").alias("cents"),
        "p_size",
    )
    return pareto_skyline(p)


def pareto_skyline(p: DataFrame) -> DataFrame:
    """Two-phase skyline core over (p_partkey, p_name, cents, p_size):
    minimize cents, maximize p_size."""
    p = p.withColumn("band", F.expr(f"cents DIV {SKY_BAND_CENTS}"))
    band_stats = p.groupBy("band").agg(F.max("p_size").alias("band_max"))
    w_bands = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    prior = band_stats.select(
        "band", F.max("band_max").over(w_bands).alias("max_before_band")
    )
    w_in_band = (
        Window.partitionBy("band").orderBy("cents").rangeBetween(
            Window.unboundedPreceding, -1
        )
    )
    w_same_price = Window.partitionBy("cents")
    return (
        p.join(F.broadcast(prior), "band")
        .withColumn("max_lower_in_band", F.max("p_size").over(w_in_band))
        .withColumn("max_same_price", F.max("p_size").over(w_same_price))
        .filter(
            (
                F.coalesce(
                    F.greatest("max_before_band", "max_lower_in_band"),
                    F.coalesce("max_before_band", "max_lower_in_band"),
                ).isNull()
                | (
                    F.coalesce(
                        F.greatest("max_before_band", "max_lower_in_band"),
                        F.coalesce("max_before_band", "max_lower_in_band"),
                    )
                    < F.col("p_size")
                )
            )
            & (F.col("max_same_price") <= F.col("p_size"))
        )
        .select("p_partkey", "p_name", "cents", "p_size")
    )


# Autocorrelation: lags examined over the daily per-type count series.
ACF_MAX_LAG = 7


@query(
    "ts_autocorr",
    oracle=f"""
    WITH series AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, day
    ),
    lags AS (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag),
    pairs AS (
      SELECT x.event_type, l.lag, x.c AS xv, y.c AS yv
      FROM series x
      CROSS JOIN lags l
      JOIN series y ON y.event_type = x.event_type
                   AND y.day = x.day + l.lag
    ),
    stats AS (
      SELECT event_type, lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(xv * yv) AS BIGINT) AS sxy,
             CAST(sum(xv * xv) AS BIGINT) AS sxx,
             CAST(sum(yv * yv) AS BIGINT) AS syy
      FROM pairs GROUP BY event_type, lag
    )
    SELECT event_type, lag, n_pairs,
           n_pairs * sxy - sx * sy AS cov_num,
           n_pairs * sxx - sx * sx AS var_x_num,
           n_pairs * syy - sy * sy AS var_y_num,
           CASE WHEN n_pairs * sxx - sx * sx > 0
                 AND n_pairs * syy - sy * sy > 0
                THEN round((n_pairs * sxy - sx * sy)
                           / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))), 4)
           END AS acf_r4
    FROM stats
    """,
    tags=("timeseries", "autocorrelation", "aggregate"),
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series per
    event type — the seasonality probe every forecasting pipeline
    runs before choosing model lags.

    Shape: ONE aggregation builds the daily series (map-side
    combinable count), the 7-row lag table cross-joins onto it (a
    broadcast nested loop over a TINY side — the one place a
    cartesian is correct), and the lag alignment is an equi-join of
    the series against itself on (type, day+lag) — co-partitioned on
    event_type, so at 100 TB the only data-sized shuffle is the
    initial count; the series table is |types| x |days|, already
    thousands of times smaller than the events fact.

    Exactness: Pearson terms are computed as integer moment sums
    (n*Σxy - ΣxΣy etc, BIGINT-exact at any realistic count scale);
    the float division + sqrt happens once per (type, lag) on
    identical integers, so round(..., 4) agrees bit-for-bit.  Pairs
    use observed-days semantics (both endpoints present), identical
    by construction in both engines."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    series = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    x = series.select("event_type", "day", F.col("c").alias("xv"))
    y = series.select(
        F.col("event_type").alias("et2"), F.col("day").alias("day2"),
        F.col("c").alias("yv"),
    )
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .join(
            y,
            (F.col("et2") == F.col("event_type"))
            & (F.col("day2") == F.col("day") + F.col("lag")),
        )
    )
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("xv") * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv") * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    return stats.select(
        "event_type",
        "lag",
        "n_pairs",
        num.alias("cov_num"),
        dx.alias("var_x_num"),
        dy.alias("var_y_num"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))), 4
            ),
        ).alias("acf_r4"),
    )


@query(
    "ts_changepoint",
    oracle="""
    WITH series AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, day
    ),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS total
      FROM series GROUP BY event_type
    ),
    pre AS (
      SELECT s.event_type, s.day,
             (SELECT sum(c) FROM series s2
              WHERE s2.event_type = s.event_type AND s2.day <= s.day) AS pc,
             (SELECT count(*) FROM series s3
              WHERE s3.event_type = s.event_type AND s3.day <= s.day) AS k
      FROM series s
    )
    SELECT p.event_type, t.n_days, t.total,
           p.day AS cp_day,
           CAST(t.n_days * p.pc - p.k * t.total AS BIGINT) AS cusum_at_cp,
           CAST(abs(t.n_days * p.pc - p.k * t.total) AS BIGINT) AS abs_cusum
    FROM pre p JOIN tot t ON t.event_type = p.event_type
    QUALIFY row_number() OVER (
      PARTITION BY p.event_type
      ORDER BY abs(t.n_days * p.pc - p.k * t.total) DESC, p.day
    ) = 1
    """,
    tags=("timeseries", "changepoint", "cusum"),
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection: per event type, the day where the
    cumulative deviation of the daily count from its series mean
    peaks — the standard drift locator for monitoring pipelines (did
    the event rate shift, and WHEN).

    ALL-INTEGER algebra: the mean-deviation prefix sum
    S_k = Σ_{i≤k}(c_i − total/n) is scaled by n to
    S'_k = n·prefix_k − k·total, an exact BIGINT with the same
    argmax — no float ever enters, so the hash cannot drift.  Spark
    computes prefixes with ONE ordered window per type plus a
    struct-max argmax (tie → earliest day); the oracle recomputes the
    same prefixes with correlated subqueries and picks the peak by
    ranking — different dataflow, same integers.

    Scale: the windowed stage runs on the |types| x |days| series
    table (thousands of times smaller than the fact); per-type
    sequences co-locate under one exchange.  The argmax is an
    associative struct MAX — map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    series = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_all = Window.partitionBy("event_type")
    w_ord = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = series.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w_all).alias("n_days"),
        F.sum("c").over(w_all).alias("total"),
        F.sum("c").over(w_ord).alias("pc"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("k"),
    ).withColumn(
        "sk", F.col("n_days") * F.col("pc") - F.col("k") * F.col("total")
    )
    best = scored.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.abs("sk").alias("a"),
                (-F.col("day")).alias("nd"),
                F.col("day").alias("day"),
                F.col("sk").alias("sk"),
                F.col("n_days").alias("n_days"),
                F.col("total").alias("total"),
            )
        ).alias("m")
    )
    return best.select(
        "event_type",
        F.col("m.n_days").alias("n_days"),
        F.col("m.total").alias("total"),
        F.col("m.day").alias("cp_day"),
        F.col("m.sk").alias("cusum_at_cp"),
        F.col("m.a").alias("abs_cusum"),
    )


# Rolling median: trailing window width in days (odd -> true median
# once warm; the lower median before that).
ROLL_MED_DAYS = 7


@query(
    "ts_rolling_median",
    oracle=f"""
    WITH series AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, day
    )
    SELECT event_type, day, c,
           CAST(l[CAST((len(l) + 1) // 2 AS BIGINT)] AS BIGINT)
             AS rolling_median,
           CAST(len(l) AS INT) AS window_n
    FROM (
      SELECT event_type, day, c,
             list_sort(list(c) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {ROLL_MED_DAYS - 1} PRECEDING AND CURRENT ROW
             )) AS l
      FROM series
    )
    """,
    tags=("timeseries", "window", "median"),
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row rolling MEDIAN of the daily count series per
    event type — the robust smoother (moving averages chase spikes;
    the median ignores them).  Emits the LOWER median (element
    (n+1)//2 of the sorted window), an exact integer in both engines
    — float median-of-even averaging never enters.

    Both engines collect the bounded 7-element frame, sort it, and
    index it: a constant-width frame makes collect-sort-pick O(w log
    w) per row with w=7 — the right rolling-quantile algorithm at
    any scale because the frame, not the partition, bounds the work.
    One exchange on event_type; the series table is already
    thousands of times smaller than the fact."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    series = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(ROLL_MED_DAYS - 1), Window.currentRow)
    )
    frame = series.withColumn("l", F.array_sort(F.collect_list("c").over(w)))
    return frame.select(
        "event_type",
        "day",
        "c",
        F.expr("l[CAST((size(l) + 1) DIV 2 AS INT) - 1]")
        .cast("long")
        .alias("rolling_median"),
        F.size("l").cast("int").alias("window_n"),
    )


@query(
    "ts_trend",
    oracle="""
    WITH series AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type, day
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(day) AS BIGINT) AS sx,
             CAST(sum(cents) AS BIGINT) AS sy,
             CAST(sum(day * cents) AS BIGINT) AS sxy,
             CAST(sum(day * day) AS BIGINT) AS sxx
      FROM series GROUP BY event_type
    )
    SELECT event_type, n,
           n * sxy - sx * sy AS slope_num,
           n * sxx - sx * sx AS slope_den,
           CASE WHEN n * sxx - sx * sx > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE), 4)
           END AS slope_cents_per_day,
           CASE WHEN n * sxx - sx * sx > 0
                THEN round((CAST(sy AS DOUBLE)
                            - CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 2)
           END AS intercept_cents
    FROM m
    """,
    tags=("timeseries", "regression", "trend"),
)
def ts_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend: slope and intercept of
    daily revenue-cents against the day index, per event type — the
    "is this metric growing?" primitive behind every KPI trend arrow.

    Same exactness recipe as ts_autocorr: the OLS closed form is
    assembled from INTEGER moment sums (n·Σxy − ΣxΣy over n·Σx² −
    (Σx)², exact BIGINTs emitted for the hash), and only the final
    slope/intercept divisions run in double — on identical integers,
    so round(…, 4) agrees bit-for-bit.  Two chained map-side-
    combinable aggregations (daily rollup, then moments); no window,
    no sort, group count = |event types|."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    series = ev.groupBy("event_type", day.alias("day")).agg(
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents")
    )
    m = series.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum(F.col("day") * F.col("cents")).alias("sxy"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return m.select(
        "event_type",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den > 0, F.round(slope, 4)).alias("slope_cents_per_day"),
        F.when(
            den > 0,
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double"),
                2,
            ),
        ).alias("intercept_cents"),
    )
