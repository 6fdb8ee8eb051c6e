"""Round-9b surface extensions (session 2 of round 9).

Families added here:

- Distribution-shape aggregates (``agg_moments``) — skewness/kurtosis
  from exact integer power sums, the third/fourth-moment siblings of
  ``agg_dispersion``'s variance-to-mean ratio.
- A second recursive stateful-twin fold (``ts_holt_linear``) — Holt's
  two-state level+trend smoother, generalizing ``stream_ewma``'s
  one-state EWMA (reference analog: the per-source watermark state in
  routeviews.go:60-62 is the same keyed incremental-fold shape).
- Robust trend estimation (``ts_robust_trend``) — bounded-lag
  Theil-Sen median-of-slopes, the breakdown-resistant counterpart of
  ``ts_trend``'s OLS (one wild day drags an OLS slope arbitrarily;
  the pairwise-slope median shrugs it off).
- Lead-lag analysis (``ts_cross_corr``) — bivariate lagged Pearson
  between two event-type daily series, the cross-series sibling of
  ``ts_autocorr``.

Driver rotation: module import order in plans/catalog.py is
APPEND-ONLY (the ordering rule and its rationale live in
plans/catalog.py — newest round module goes last).

Cross-engine exactness notes shared by the keys below:

- Integer ``DIV`` (Spark) and integer ``//`` (DuckDB 1.0) BOTH
  truncate toward zero, including on negatives (measured:
  ``(-7)//2 = -3`` in DuckDB) — so the Holt fold uses plain
  truncating division on both sides with no pmod-floor adjustment,
  and stays exact even when the trend state goes negative.
- ``sqrt`` is IEEE-754 correctly rounded in both engines, so
  ``sqrt(x)*x`` replaces ``power(x, 1.5)`` (``power`` carries no
  rounding guarantee) wherever a 3/2 power is needed.
- Power sums that exceed int64 per element (c^4 at 5-digit cents) are
  widened to DECIMAL(38,0) BEFORE the multiply on both engines;
  DECIMAL aggregation stays map-side combinable and codegen'd, so
  the exactness costs a few percent, not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import query

# ------------------------------------------------------------------
# agg_moments — skewness / kurtosis from exact integer power sums
# ------------------------------------------------------------------

# The final-formula text is SHARED between the Spark plan
# (selectExpr) and the DuckDB oracle, so every double operation
# happens in the same order on the same exact inputs — the same
# recipe ts_trend and ts_autocorr use for their closed forms.
_MOMENT_DOUBLES = [
    "CAST(n AS DOUBLE) AS dn",
    "CAST(s1 AS DOUBLE) AS d1",
    "CAST(s2 AS DOUBLE) AS d2",
    "CAST(s3 AS DOUBLE) AS d3",
    "CAST(s4 AS DOUBLE) AS d4",
]
_MOMENT_CENTRAL = [
    "d1/dn AS mean",
    "d2/dn - (d1/dn)*(d1/dn) AS m2",
    "d3/dn - 3*(d1/dn)*(d2/dn) + 2*(d1/dn)*(d1/dn)*(d1/dn) AS m3",
    "d4/dn - 4*(d1/dn)*(d3/dn) + 6*(d1/dn)*(d1/dn)*(d2/dn)"
    " - 3*(d1/dn)*(d1/dn)*(d1/dn)*(d1/dn) AS m4",
]
_MOMENT_OUT = [
    "round(mean, 2) AS mean_cents",
    "CASE WHEN m2 > 0 THEN round(m3 / (sqrt(m2) * m2), 6) END AS skew_r6",
    "CASE WHEN m2 > 0 THEN round(m4 / (m2 * m2) - 3, 6) END AS kurt_r6",
]


@query(
    "agg_moments",
    oracle=f"""
    WITH cents AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS c
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2,
             CAST(sum(c * c * c) AS DECIMAL(38,0)) AS s3,
             CAST(sum(CAST(c * c AS DECIMAL(38,0)) * (c * c))
                  AS DECIMAL(38,0)) AS s4
      FROM cents GROUP BY event_type
    ),
    doubles AS (SELECT event_type, n, {", ".join(_MOMENT_DOUBLES)} FROM sums),
    central AS (SELECT event_type, n, {", ".join(_MOMENT_CENTRAL)} FROM doubles)
    SELECT event_type, n, {", ".join(_MOMENT_OUT)} FROM central
    """,
    tags=("aggregate", "statistics", "moments"),
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of the value distribution per
    event type — the distribution-shape profile (long tail? heavy
    tail?) behind outlier-threshold and sampling-temperature choices;
    the 3rd/4th-moment siblings of agg_dispersion's variance ratio.

    Shape: ONE map-side-combinable hash aggregation of five power
    sums — moments are algebraic, so partials merge by addition and
    the shuffle carries |types| x 5 numbers per map partition.  At
    100 TB this is the cheapest aggregate family there is.

    Exactness: cents are exact BIGINTs; c^2 and c^3 fit int64 at
    5-digit cents, c^4 does NOT (5.6e4^4 ~ 9.8e18 > int64) and is
    widened to DECIMAL(38,0) BEFORE the multiply on both engines
    (Spark's BIGINT SUM would also wrap on the c^3 sum, so s3/s4 sum
    in DECIMAL).  The central-moment formula is one shared expression
    text evaluated on identical doubles; sqrt(m2)*m2 replaces
    power(m2, 1.5) because sqrt is correctly rounded and power is
    not.  Groups with zero variance emit NULL shape stats.
    """
    ev = load_table(spark, sf_dir, "events")
    sums = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s1"),
            F.sum(F.expr("c * c")).alias("s2"),
            F.sum(F.expr("CAST(c * c * c AS DECIMAL(38,0))")).alias("s3"),
            F.sum(F.expr("CAST(c * c AS DECIMAL(38,0)) * (c * c)")).alias("s4"),
        )
    )
    doubles = sums.selectExpr("event_type", "n", *_MOMENT_DOUBLES)
    central = doubles.selectExpr("event_type", "n", *_MOMENT_CENTRAL)
    return central.selectExpr("event_type", "n", *_MOMENT_OUT)


# ------------------------------------------------------------------
# ts_holt_linear — two-state Holt level+trend recursive fold
# ------------------------------------------------------------------


@query(
    "ts_holt_linear",
    oracle="""
WITH RECURSIVE packed AS (
  SELECT user_id, list(CAST(floor(value * 100) AS BIGINT)
                       ORDER BY ts, event_id) AS cs
  FROM events GROUP BY user_id
),
fold AS (
  SELECT user_id, cs, 1 AS k, cs[1] AS l, CAST(0 AS BIGINT) AS b
  FROM packed
  UNION ALL
  SELECT user_id, cs, k + 1,
         (cs[k + 1] + l + b) // 2,
         (((cs[k + 1] + l + b) // 2) - l + b) // 2
  FROM fold WHERE k < len(cs)
)
SELECT user_id,
       CAST(len(cs) AS BIGINT) AS n,
       l AS level_cents,
       b AS trend_cents,
       l + b AS forecast_cents
FROM fold WHERE k = len(cs)
ORDER BY user_id
""",
    tags=("timeseries", "stateful-twin", "events"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt linear (level + trend) exponential smoother over
    the full event-value history in (ts, event_id) order, alpha =
    beta = 1/2 in exact integer-cents arithmetic:

        l' = (c + l + b) div 2        (level: average of obs and
                                       the prior one-step forecast)
        b' = ((l' - l) + b) div 2     (trend: average of the level
                                       step and the prior trend)

    seeded l = c_1, b = 0 — the two-state generalization of
    ``stream_ewma``'s one-state fold, and the second batch twin of
    the keyed incremental-state shape in ``streaming/stateful.py``.
    Emits the final level, trend, and one-step-ahead forecast.

    Differential: Spark folds a sorted struct array with an
    ``aggregate`` HOF over a named_struct accumulator; the oracle is
    a genuinely different construction — a RECURSIVE CTE stepping an
    index through the per-user sorted list.  (A ``list_reduce`` over
    struct accumulators was rejected: DuckDB 1.0 evaluates
    interdependent struct fields against partially-updated
    accumulator state in chained reduces — ``{'l': a.l + x.l, 'b':
    (a.l + x.l) + a.b}`` over [10,20,30] yields b = 120 where the
    fold semantics give 90 — so struct-state folds there must be
    recursive CTEs.)  Both engines truncate integer division toward
    zero (Spark ``DIV`` == DuckDB ``//``, verified on negatives), so
    the fold stays exact when the trend state dips negative.

    Shape: identical to stream_ewma — one hash exchange on user_id,
    then a JVM-side per-group sort+fold; sequential per key by
    definition, parallel across keys (|users| >> cores at scale).
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
            F.expr(
                "aggregate(transform(array_sort(xs), s -> s.c),"
                " named_struct('k', CAST(0 AS BIGINT),"
                "              'l', CAST(0 AS BIGINT),"
                "              'b', CAST(0 AS BIGINT)),"
                " (a, c) -> named_struct("
                "   'k', a.k + CAST(1 AS BIGINT),"
                "   'l', IF(a.k = 0, c, (c + a.l + a.b) DIV 2),"
                "   'b', IF(a.k = 0, CAST(0 AS BIGINT),"
                "        ((IF(a.k = 0, c, (c + a.l + a.b) DIV 2)) - a.l + a.b)"
                "        DIV 2))"
                ")"
            ).alias("st"),
        )
        .select(
            "user_id",
            "n",
            F.col("st.l").alias("level_cents"),
            F.col("st.b").alias("trend_cents"),
            (F.col("st.l") + F.col("st.b")).alias("forecast_cents"),
        )
        .orderBy("user_id")
    )


# ------------------------------------------------------------------
# ts_robust_trend — bounded-lag Theil-Sen median-of-slopes
# ------------------------------------------------------------------

_TS_MAX_LAG = 7


@query(
    "ts_robust_trend",
    oracle=f"""
    WITH series AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY event_type, day
    ),
    lags AS (SELECT unnest(generate_series(1, {_TS_MAX_LAG})) AS lag),
    slopes AS (
      SELECT x.event_type,
             CAST(y.v - x.v AS DOUBLE) / CAST(l.lag AS DOUBLE) AS slope
      FROM series x
      CROSS JOIN lags l
      JOIN series y ON y.event_type = x.event_type
                   AND y.day = x.day + l.lag
    ),
    packed AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_pairs,
             list(slope ORDER BY slope) AS sl
      FROM slopes GROUP BY event_type
    )
    SELECT event_type, n_pairs,
           round(CASE WHEN n_pairs % 2 = 1 THEN sl[CAST((n_pairs + 1) // 2 AS INT)]
                      ELSE (sl[CAST(n_pairs // 2 AS INT)]
                            + sl[CAST(n_pairs // 2 + 1 AS INT)]) / 2
                 END, 6) AS median_slope_r6
    FROM packed
    """,
    tags=("timeseries", "robust", "trend"),
)
def ts_robust_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue trend per event type: the median of
    pairwise slopes between days at most 7 apart — the
    bounded-lag Theil-Sen estimator, ts_trend's breakdown-resistant
    sibling (one promo-day outlier drags OLS; the slope median
    tolerates up to ~29% wild days).

    Scale: classic Theil-Sen is O(days^2) pairs per group — the lag
    bound makes it O(days x 7) and turns the pair
    generation into an EQUI-join: explode 7 lags per day
    row and join the series against itself on (type, day + lag), so
    the only data-sized shuffle is the initial daily aggregation
    (the series table is |types| x |days|, thousands of times
    smaller than the fact).  No range join, no cartesian.

    Exactness: day revenues are exact BIGINT cents; each slope is
    ONE double division of exact integers (day distance == lag by
    construction of the equi-join); the median of the sorted slope
    list takes the middle element (odd) or one (a+b)/2 double op
    (even) — identical element choice and arithmetic both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            F.floor(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("v"))
    )
    lagged = series.select(
        "event_type",
        "day",
        "v",
        F.explode(F.expr(f"sequence(1, {_TS_MAX_LAG})")).alias("lag"),
    ).select("event_type", (F.col("day") + F.col("lag")).alias("day"), F.col("v").alias("xv"), "lag")
    slopes = lagged.join(
        series.select("event_type", "day", F.col("v").alias("yv")),
        ["event_type", "day"],
    ).select(
        "event_type",
        (F.expr("CAST(yv - xv AS DOUBLE)") / F.col("lag").cast("double")).alias("slope"),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.array_sort(F.collect_list("slope")).alias("sl"),
        )
        .selectExpr(
            "event_type",
            "n_pairs",
            "round(CASE WHEN n_pairs % 2 = 1"
            " THEN element_at(sl, CAST((n_pairs + 1) DIV 2 AS INT))"
            " ELSE (element_at(sl, CAST(n_pairs DIV 2 AS INT))"
            "       + element_at(sl, CAST(n_pairs DIV 2 + 1 AS INT))) / 2"
            " END, 6) AS median_slope_r6",
        )
    )


# ------------------------------------------------------------------
# ts_cross_corr — lead-lag Pearson between two event-type series
# ------------------------------------------------------------------

_XC_A = "click"
_XC_B = "purchase"
_XC_MAX_LAG = 3


@query(
    "ts_cross_corr",
    oracle=f"""
    WITH series AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events
      WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type, day
    ),
    lags AS (SELECT unnest(generate_series(-{_XC_MAX_LAG}, {_XC_MAX_LAG})) AS lag),
    pairs AS (
      SELECT l.lag, x.c AS xv, y.c AS yv
      FROM series x
      CROSS JOIN lags l
      JOIN series y ON y.event_type = 'purchase'
                   AND y.day = x.day + l.lag
      WHERE x.event_type = 'click'
    ),
    stats AS (
      SELECT lag,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(xv * yv) AS BIGINT) AS sxy,
             CAST(sum(xv * xv) AS BIGINT) AS sxx,
             CAST(sum(yv * yv) AS BIGINT) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT lag, n_days,
           CASE WHEN n_days * sxx - sx * sx > 0
                 AND n_days * syy - sy * sy > 0
                THEN round((n_days * sxy - sx * sy)
                           / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6)
           END AS xcorr_r6
    FROM stats
    """,
    tags=("timeseries", "correlation", "lead-lag"),
)
def ts_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the daily 'click' and
    'purchase' count series at lags -3..3 —
    "do clicks today predict purchases in k days?", the bivariate
    sibling of ts_autocorr and the alignment probe behind
    events_attribution's window choice.

    Shape: same as ts_autocorr — one map-side-combinable count
    aggregation builds both series, a 7-row lag table broadcast
    cross-joins onto the A series, and alignment is an equi-join on
    day + lag.  Everything after the first aggregation operates on
    |days| rows.

    Exactness: integer moment sums, one double formula per lag on
    identical integers, correctly-rounded sqrt — identical recipe to
    ts_autocorr, observed-days (inner-join) semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.where(F.col("event_type").isin(_XC_A, _XC_B))
        .select(
            "event_type",
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = series.where(F.col("event_type") == _XC_A).select("day", F.col("c").alias("xv"))
    b = series.where(F.col("event_type") == _XC_B).select(
        F.col("day").alias("bday"), F.col("c").alias("yv")
    )
    pairs = (
        a.select(
            "day",
            "xv",
            F.explode(F.expr(f"sequence(-{_XC_MAX_LAG}, {_XC_MAX_LAG})")).alias("lag"),
        )
        .join(b, F.col("bday") == F.col("day") + F.col("lag"))
        .select("lag", "xv", "yv")
    )
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("xv").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.expr("xv * yv")).alias("sxy"),
        F.sum(F.expr("xv * xv")).alias("sxx"),
        F.sum(F.expr("yv * yv")).alias("syy"),
    )
    return stats.selectExpr(
        "lag",
        "n_days",
        "CASE WHEN n_days * sxx - sx * sx > 0"
        " AND n_days * syy - sy * sy > 0"
        " THEN round((n_days * sxy - sx * sy)"
        " / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))"
        "    * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6)"
        " END AS xcorr_r6",
    )


# ------------------------------------------------------------------
# text_gopher_rules — rule-bundle quality gate (Gopher-style)
# ------------------------------------------------------------------

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on"]


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, ' +'), w -> w <> '') AS ws
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(ws, w -> len(w))), 0)
                  AS BIGINT) AS sum_len,
             CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
                  AS BIGINT) AS n_alpha,
             CAST({" + ".join(f"CAST(list_contains(ws, '{w}') AS INT)" for w in _STOPWORDS)}
                  AS BIGINT) AS n_stop
      FROM toks
    )
    SELECT doc_id, n_words,
           (100 * sum_len) // nullif(n_words, 0) AS mean_len_c100,
           n_words BETWEEN 40 AND 100000 AS r_len,
           sum_len BETWEEN 3 * n_words AND 10 * n_words AS r_wordlen,
           5 * n_alpha >= 4 * n_words AS r_alpha,
           n_stop >= 2 AS r_stop,
           (n_words BETWEEN 40 AND 100000)
             AND (sum_len BETWEEN 3 * n_words AND 10 * n_words)
             AND (5 * n_alpha >= 4 * n_words)
             AND (n_stop >= 2) AS passes
    FROM feats
    """,
    tags=("llm", "text", "quality", "filter"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-bundle quality gate (Rae et al. 2021, public
    paper): per-doc word-count bounds, mean-word-length band,
    alphabetic-word fraction, and distinct-stopword presence, plus
    the conjunction the pretraining filter actually applies — the
    rule-level audit trail text_quality's single composite score
    does not expose.

    Exactness: every rule is an integer cross-multiply (5*n_alpha >=
    4*n_words, never a float ratio); even the reported mean word
    length is integer centi-chars (100*sum DIV n) — a rounded double
    hits round-half boundaries the engines disagree on (189/40 =
    4.725 rounded 4.73 vs 4.72).  Stopword presence
    is exact list membership on whitespace tokens, not substring
    matching.  Pure map stage — zero shuffles, trivially scales.
    """
    docs = load_table(spark, sf_dir, "documents")
    stop_sum = " + ".join(
        f"CAST(array_contains(ws, '{w}') AS INT)" for w in _STOPWORDS
    )
    feats = docs.selectExpr(
        "doc_id",
        "filter(split(text, ' +'), w -> w != '') AS ws",
    ).selectExpr(
        "doc_id",
        "CAST(size(ws) AS BIGINT) AS n_words",
        "CAST(aggregate(transform(ws, w -> length(w)), 0, (a, x) -> a + x)"
        " AS BIGINT) AS sum_len",
        "CAST(size(filter(ws, w -> w rlike '[a-zA-Z]')) AS BIGINT) AS n_alpha",
        f"CAST({stop_sum} AS BIGINT) AS n_stop",
    )
    return feats.selectExpr(
        "doc_id",
        "n_words",
        "(100 * sum_len) DIV nullif(n_words, 0) AS mean_len_c100",
        "n_words BETWEEN 40 AND 100000 AS r_len",
        "sum_len BETWEEN 3 * n_words AND 10 * n_words AS r_wordlen",
        "5 * n_alpha >= 4 * n_words AS r_alpha",
        "n_stop >= 2 AS r_stop",
        "(n_words BETWEEN 40 AND 100000)"
        " AND (sum_len BETWEEN 3 * n_words AND 10 * n_words)"
        " AND (5 * n_alpha >= 4 * n_words)"
        " AND (n_stop >= 2) AS passes",
    )


# ------------------------------------------------------------------
# dedup_lines — corpus-frequency boilerplate line removal
# ------------------------------------------------------------------

_LINE_TOKENS = 10
_BOILER_MIN_DOCS = 5


@query(
    "dedup_lines",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN concat(CASE WHEN doc_id % 3 = 0
                                   THEN concat('copyright notice all rights'
                                               ' reserved by the host site'
                                               ' operator ', text)
                                   ELSE text END,
                              ' subscribe to our newsletter for more updates'
                              ' from this site today')
                  ELSE CASE WHEN doc_id % 3 = 0
                            THEN concat('copyright notice all rights reserved'
                                        ' by the host site operator ', text)
                            ELSE text END END AS t
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(t, ' +'), w -> w <> '') AS ws
      FROM seeded
    ),
    lines AS (
      SELECT doc_id,
             array_to_string(
               ws[(i - 1) * {_LINE_TOKENS} + 1 : i * {_LINE_TOKENS}], ' ')
               AS line
      FROM toks,
           unnest(generate_series(
             1, greatest((len(ws) + {_LINE_TOKENS} - 1) // {_LINE_TOKENS}, 1)))
             AS u(i)
    ),
    freq AS (
      SELECT md5(line) AS lh, count(DISTINCT doc_id) AS nd
      FROM lines GROUP BY md5(line)
    )
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN f.nd >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           round(CAST(sum(CASE WHEN f.nd >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0
                          END) AS DOUBLE) / count(*), 4) AS boiler_frac_r4
    FROM lines l JOIN freq f ON f.lh = md5(l.line)
    GROUP BY l.doc_id
    """,
    tags=("llm", "dedup", "boilerplate"),
)
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency line dedup — the RefinedWeb/CCNet boilerplate
    pass: any "line" occurring in >= 5 distinct documents (headers,
    footers, nav text) is flagged, and each doc reports its
    boilerplate fraction.  The fixture corpus has no newlines, so
    "lines" are consecutive 10-token chunks, and boilerplate is
    INJECTED deterministically (a header on doc_id%3=0, a footer on
    doc_id%5=0) so the detector provably fires — including on the
    partial unaligned footer tails, exactly the smear real
    boilerplate shows at arbitrary document offsets.

    Shape: explode to lines, ONE count-distinct aggregation keyed by
    the md5 line hash (uniform — skew-free), one hash join of lines
    against the frequency table on that hash, one per-doc
    re-aggregation.  Never all-pairs; the frequency table is the
    line-vocabulary, bounded far below the corpus at 100 TB (that is
    the whole point of boilerplate).  Joining on the 32-hex md5
    rather than raw line text keeps shuffle rows narrow.
    """
    docs = load_table(spark, sf_dir, "documents")
    header = "copyright notice all rights reserved by the host site operator "
    footer = " subscribe to our newsletter for more updates from this site today"
    seeded = docs.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % 5 = 0 THEN concat("
        f" CASE WHEN doc_id % 3 = 0 THEN concat('{header}', text) ELSE text END,"
        f" '{footer}')"
        f" ELSE CASE WHEN doc_id % 3 = 0 THEN concat('{header}', text)"
        f" ELSE text END END AS t",
    )
    lines = (
        seeded.selectExpr(
            "doc_id", "filter(split(t, ' +'), w -> w != '') AS ws"
        )
        .selectExpr(
            "doc_id",
            "ws",
            f"explode(sequence(1, greatest((size(ws) + {_LINE_TOKENS} - 1)"
            f" DIV {_LINE_TOKENS}, 1))) AS i",
        )
        .selectExpr(
            "doc_id",
            f"md5(array_join(slice(ws, (i - 1) * {_LINE_TOKENS} + 1,"
            f" {_LINE_TOKENS}), ' ')) AS lh",
        )
    )
    freq = lines.groupBy("lh").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        lines.join(freq, "lh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("nd") >= _BOILER_MIN_DOCS, 1).otherwise(0)
            ).alias("n_boiler"),
        )
        .selectExpr(
            "doc_id",
            "CAST(n_lines AS BIGINT) AS n_lines",
            "CAST(n_boiler AS BIGINT) AS n_boiler",
            "round(CAST(n_boiler AS DOUBLE) / n_lines, 4) AS boiler_frac_r4",
        )
    )


# ------------------------------------------------------------------
# text_link_profile — inline URL extraction + per-host rollup
# ------------------------------------------------------------------

_URL_RE = "https?://[^ ]+"


@query(
    "text_link_profile",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN concat(text, ' see https://host',
                              CAST(doc_id % 7 AS VARCHAR),
                              '.example.com/p/', CAST(doc_id AS VARCHAR),
                              ' and http://alt', CAST(doc_id % 3 AS VARCHAR),
                              '.example.org/q?x=1')
                  ELSE text END AS t
      FROM documents
    ),
    links AS (
      SELECT doc_id, unnest(regexp_extract_all(t, '{_URL_RE}')) AS url
      FROM seeded
    )
    SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_https
    FROM links
    GROUP BY host
    """,
    tags=("llm", "text", "links"),
)
def text_link_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline-URL inventory: extract every URL from document text and
    roll up per host (link count, citing-doc count, https share) —
    the outlink profile a crawl-curation pipeline uses to find
    link-farm hosts and http-only sources.  The fixture text has no
    URLs, so two are injected into every even doc (the pii_mask
    pattern); scalar_url parses a URL *column* — this key mines URLs
    out of free TEXT, a different operator.

    Shape: map-side regexp_extract_all + explode, one
    map-side-combinable rollup keyed by host.  The host key space is
    web-host-sized — small next to the corpus; a pathological
    single-host skew would partial-aggregate away map-side anyway.
    """
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 2 = 0 THEN concat(text, ' see https://host',"
        " CAST(doc_id % 7 AS STRING), '.example.com/p/',"
        " CAST(doc_id AS STRING), ' and http://alt',"
        " CAST(doc_id % 3 AS STRING), '.example.org/q?x=1')"
        " ELSE text END AS t",
    )
    links = seeded.selectExpr(
        "doc_id",
        f"explode(regexp_extract_all(t, '{_URL_RE}', 0)) AS url",
    )
    return (
        links.selectExpr(
            "doc_id",
            "url",
            "regexp_extract(url, '^https?://([^/]+)', 1) AS host",
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("url").startswith("https://"), 1).otherwise(0))
            .cast("long")
            .alias("n_https"),
        )
    )


# ------------------------------------------------------------------
# text_code_detect — code-vs-prose heuristic filter
# ------------------------------------------------------------------

_CODE_KWS = ["def", "return", "else", "function", "var"]
_CODE_SNIPPET = (
    " def update(x): return x+1; } else { i == 0 && j != 1; #include <vector>"
)


@query(
    "text_code_detect",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 6 = 0 THEN concat(text, '{_CODE_SNIPPET}')
                  ELSE text END AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '[{{}}();=<>#]')) AS BIGINT)
               AS n_sym,
             CAST({" + ".join(
                 "CAST(list_contains(list_filter("
                 "string_split_regex(t, ' +'), w -> w <> ''), "
                 f"'{w}') AS INT)" for w in _CODE_KWS)}
                  AS BIGINT) AS n_kw,
             CAST(len(t) AS BIGINT) AS n_chars
      FROM seeded
    )
    SELECT doc_id, n_sym, n_kw,
           CASE WHEN n_chars > 0 THEN (1000 * n_sym) // n_chars
                ELSE 0 END AS sym_permille,
           (CASE WHEN n_chars > 0 THEN (1000 * n_sym) // n_chars
                 ELSE 0 END) >= 20 OR n_kw >= 2 AS is_code
    FROM feats
    """,
    tags=("llm", "text", "quality", "filter"),
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection — the corpus-routing heuristic that
    decides whether a document belongs in the code or prose mixture
    bucket: code-symbol density (braces/semicolons/operators per
    character, in exact integer permille) plus programming-keyword
    token hits.  A code snippet is injected into every sixth doc
    (the fixture is pure prose) so both branches of the classifier
    measurably fire.

    Exactness: symbol density is integer 1000*n DIV chars (both
    engines truncate); keyword hits are exact token membership.
    Pure map stage — zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % 6 = 0 THEN concat(text, '{_CODE_SNIPPET}')"
        " ELSE text END AS t",
    )
    kw_sum = " + ".join(
        "CAST(array_contains(filter(split(t, ' +'), w -> w != ''),"
        f" '{w}') AS INT)"
        for w in _CODE_KWS
    )
    feats = seeded.selectExpr(
        "doc_id",
        "CAST(size(regexp_extract_all(t, '[{}();=<>#]', 0)) AS BIGINT)"
        " AS n_sym",
        f"CAST({kw_sum} AS BIGINT) AS n_kw",
        "CAST(length(t) AS BIGINT) AS n_chars",
    )
    return feats.selectExpr(
        "doc_id",
        "n_sym",
        "n_kw",
        "CASE WHEN n_chars > 0 THEN (1000 * n_sym) DIV n_chars ELSE 0 END"
        " AS sym_permille",
        "(CASE WHEN n_chars > 0 THEN (1000 * n_sym) DIV n_chars ELSE 0 END)"
        " >= 20 OR n_kw >= 2 AS is_code",
    )


# ------------------------------------------------------------------
# graph_kcore_peel — unrolled k-core peeling on the co-supplier graph
# ------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3
_KCORE_MIN_QTY = 45  # same edge recipe as graph_triangles
_KCORE_ORDER_CAP = 20


def _kcore_duck_sql() -> str:
    """Generate the unrolled peel CTE chain (pagerank's _pr_iter_sql
    pattern): nodes_{r+1} = nodes of nodes_r with induced degree >= K."""
    rounds = []
    for r in range(_KCORE_ROUNDS):
        rounds.append(
            f"""deg{r} AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT e.a AS node FROM e
        JOIN nodes{r} na ON na.node = e.a JOIN nodes{r} nb ON nb.node = e.b
        UNION ALL
        SELECT e.b FROM e
        JOIN nodes{r} na ON na.node = e.a JOIN nodes{r} nb ON nb.node = e.b
      ) GROUP BY node
    ),
    nodes{r + 1} AS (
      SELECT node FROM deg{r} WHERE d >= {_KCORE_K}
    )"""
        )
    return f"""
    WITH su AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
      FROM lineitem WHERE l_quantity >= {_KCORE_MIN_QTY}
    ),
    capped AS (
      SELECT ok, s FROM (
        SELECT ok, s, count(*) OVER (PARTITION BY ok) AS n_s FROM su
      ) WHERE n_s <= {_KCORE_ORDER_CAP}
    ),
    e AS (
      SELECT DISTINCT a.s AS a, b.s AS b
      FROM capped a JOIN capped b ON a.ok = b.ok AND a.s < b.s
    ),
    deg_init AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d0 FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e
      ) GROUP BY node
    ),
    nodes0 AS (SELECT node FROM deg_init),
    {",".join(rounds)}
    SELECT di.node, di.d0 AS degree_initial,
           sv.node IS NOT NULL AS in_core
    FROM deg_init di
    LEFT JOIN nodes{_KCORE_ROUNDS} sv ON sv.node = di.node
    """


@query(
    "graph_kcore_peel",
    oracle=_kcore_duck_sql(),
    tags=("graph", "iterative", "kcore"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition by iterative peeling (3 unrolled rounds,
    k = 3) on the co-supplier graph graph_triangles defines: each
    round recomputes degrees within the surviving induced subgraph
    and drops nodes below k — the community-core extractor that
    separates densely-embedded suppliers from hangers-on.  Emits
    every node's initial degree and whether it survives the peels.

    Shape: the edge table is built once (same df-capped
    shared-order join as graph_triangles — the cap bounds the
    per-order pair blowup) and reused across rounds; each round is
    two hash joins of the edge list against the shrinking node set
    plus one map-side-combinable degree count.  Node sets only ever
    shrink, so per-round cost is monotonically falling; the driver
    never collects anything (the unrolled plan is pure dataflow, the
    graph_pagerank posture).  At 100 TB the peel rounds would be a
    convergence loop with localCheckpoint per round (dedup_clusters
    precedent); 3 unrolled rounds keep the oracle a static string.
    """
    li = load_table(spark, sf_dir, "lineitem")
    su = (
        li.where(F.col("l_quantity") >= _KCORE_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    from pyspark.sql import Window as W

    capped = (
        su.withColumn("n_s", F.count(F.lit(1)).over(W.partitionBy("ok")))
        .where(F.col("n_s") <= _KCORE_ORDER_CAP)
        .drop("n_s")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg_init = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d0"))
        # feeds round-1 peeling AND the final report join: pin one pass
        .localCheckpoint(eager=False)
    )
    # Round 1's induced subgraph IS the full edge list (nodes0 = every
    # endpoint), so its degree table IS deg_init — no join, no second
    # degree pass.  Subsequent rounds subtract edges touching the
    # (typically SMALL, ever-shrinking) set of nodes dropped by the
    # previous round via anti-joins, instead of re-filtering the FULL
    # edge list against the (large) survivor set twice per round:
    # 3 exchanges/round -> 1 degree exchange/round, and AQE is free to
    # broadcast the dropped set (guide §2.4/§3.1).  Fixpoint identical:
    # live(r) = edges with both endpoints surviving round r-1, by
    # induction over dropped(r-1) = nodes(r-2) - nodes(r-1).
    deg = deg_init.select("node", F.col("d0").alias("d"))
    live = edges
    for r in range(_KCORE_ROUNDS - 1):
        dropped = deg.where(F.col("d") < _KCORE_K).select("node")
        live = live.join(
            dropped.select(F.col("node").alias("a")), "a", "left_anti"
        ).join(dropped.select(F.col("node").alias("b")), "b", "left_anti")
        deg = (
            live.select(F.col("a").alias("node"))
            .unionAll(live.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
    nodes = deg.where(F.col("d") >= _KCORE_K).select("node")
    surv = nodes.withColumn("in_core_flag", F.lit(True))
    return (
        deg_init.join(surv, "node", "left")
        .select(
            "node",
            F.col("d0").cast("long").alias("degree_initial"),
            F.coalesce(F.col("in_core_flag"), F.lit(False)).alias("in_core"),
        )
    )


# ------------------------------------------------------------------
# graph_common_neighbors — link prediction by shared-neighbor count
# ------------------------------------------------------------------

_CN_MIN = 2  # emit pairs sharing at least this many neighbors


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH su AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
      FROM lineitem WHERE l_quantity >= {_KCORE_MIN_QTY}
    ),
    capped AS (
      SELECT ok, s FROM (
        SELECT ok, s, count(*) OVER (PARTITION BY ok) AS n_s FROM su
      ) WHERE n_s <= {_KCORE_ORDER_CAP}
    ),
    e AS (
      SELECT DISTINCT a.s AS a, b.s AS b
      FROM capped a JOIN capped b ON a.ok = b.ok AND a.s < b.s
    ),
    adj AS (
      SELECT a AS node, b AS nb FROM e
      UNION ALL SELECT b, a FROM e
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node
    ),
    cn AS (
      SELECT x.node AS u, y.node AS v, CAST(count(*) AS BIGINT) AS common
      FROM adj x JOIN adj y ON x.nb = y.nb AND x.node < y.node
      GROUP BY x.node, y.node
      HAVING count(*) >= {_CN_MIN}
    ),
    linked AS (SELECT a, b FROM e)
    SELECT cn.u, cn.v, cn.common,
           (cn.common * 1000000)
             // (du.d + dv.d - cn.common) AS jaccard_ppm,
           l.a IS NOT NULL AS already_linked
    FROM cn
    JOIN deg du ON du.node = cn.u
    JOIN deg dv ON dv.node = cn.v
    LEFT JOIN linked l ON l.a = cn.u AND l.b = cn.v
    """,
    tags=("graph", "link-prediction"),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the co-supplier graph:
    for every node pair sharing >= 2 neighbors, the shared-neighbor
    count, neighbor-set Jaccard (exact integer ppm), and whether the
    pair is ALREADY an edge — the classic "suppliers you may also
    co-ship with" recommender signal, and the graph-native cousin of
    dedup_ngram_jaccard's inverted-index self-join.

    Shape: candidate pairs come from the symmetric adjacency list
    self-joined ON THE SHARED NEIGHBOR — an equi-join whose per-key
    fan-out is that neighbor's degree, already bounded by the
    order-cap in the edge recipe (the same df-cap that keeps every
    inverted-index join in this repo sub-quadratic).  Never an
    all-pairs product; degrees and the already-linked flag attach by
    equi-joins on node ids.
    """
    li = load_table(spark, sf_dir, "lineitem")
    su = (
        li.where(F.col("l_quantity") >= _KCORE_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    from pyspark.sql import Window as W

    capped = (
        su.withColumn("n_s", F.count(F.lit(1)).over(W.partitionBy("ok")))
        .where(F.col("n_s") <= _KCORE_ORDER_CAP)
        .drop("n_s")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("a"), F.col("b.s").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = edges.select(F.col("a").alias("node"), F.col("b").alias("nb")).unionAll(
        edges.select(F.col("b").alias("node"), F.col("a").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    x = adj.alias("x")
    y = adj.alias("y")
    cn = (
        x.join(y, (F.col("x.nb") == F.col("y.nb")) & (F.col("x.node") < F.col("y.node")))
        .groupBy(F.col("x.node").alias("u"), F.col("y.node").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= _CN_MIN)
    )
    linked = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.lit(True).alias("lk")
    )
    return (
        cn.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .join(linked, ["u", "v"], "left")
        .selectExpr(
            "u",
            "v",
            "CAST(common AS BIGINT) AS common",
            "(common * 1000000) DIV (du + dv - common) AS jaccard_ppm",
            "coalesce(lk, false) AS already_linked",
        )
    )


# ------------------------------------------------------------------
# embed_bucket_profile — LSH bucket occupancy diagnostics
# ------------------------------------------------------------------


from downloader_spark.operators.llm_dedup import (  # noqa: E402
    _DUCK_SIGN_BUCKET,
    _SPARK_NORM,
    SIGN_BITS,
    _duck_h60,
    _spark_h60,
    sign_buckets,
)


@query(
    "embed_bucket_profile",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, {_DUCK_SIGN_BUCKET} AS bucket FROM embeddings
    ),
    per_bucket AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bucket
    )
    SELECT n AS bucket_size,
           CAST(count(*) AS BIGINT) AS n_buckets,
           n * CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(*) AS BIGINT) * (n * (n - 1) // 2) AS n_pairs
    FROM per_bucket
    GROUP BY n
    """,
    tags=("llm", "embedding", "lsh", "diagnostics"),
)
def embed_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-occupancy histogram for the engine's own sign-LSH
    (dedup_embed's bucketing, fixed 8-bit width): bucket-size ->
    number of buckets, vectors covered, and within-bucket candidate
    pairs — the diagnostic that tells an ANN/dedup operator whether
    its hash width balances (a fat bucket = quadratic pair blowup;
    all-singletons = recall loss).  Reuses sign_buckets verbatim, so
    the profile measures exactly what dedup_embed will pay.

    Shape: one map stage computes buckets (static hyperplane
    constants folded into the projection), one count per bucket,
    one |buckets|-row histogram aggregation.  n*(n-1)/2 stays exact
    in BIGINT (n*(n-1) is even, so DIV 2 is exact division).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    per_bucket = (
        sign_buckets(emb, sign_bits=SIGN_BITS)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_bucket.groupBy(F.col("n").cast("long").alias("bucket_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_buckets"))
        .selectExpr(
            "bucket_size",
            "n_buckets",
            "bucket_size * n_buckets AS n_vectors",
            "n_buckets * (bucket_size * (bucket_size - 1) DIV 2) AS n_pairs",
        )
    )


# ------------------------------------------------------------------
# events_concentration — Lorenz top-share user concentration
# ------------------------------------------------------------------


@query(
    "events_concentration",
    oracle="""
    WITH counts AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn
      FROM counts
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(c) AS BIGINT) AS total_events
      FROM counts
    )
    SELECT t.n_users, t.total_events,
           CAST(sum(CASE WHEN r.rn <= (t.n_users + 99) // 100 THEN r.c
                         ELSE 0 END) AS BIGINT) AS top1pct_events,
           CAST(sum(CASE WHEN r.rn <= (t.n_users + 9) // 10 THEN r.c
                         ELSE 0 END) AS BIGINT) AS top10pct_events,
           CAST((CAST(sum(CASE WHEN r.rn <= (t.n_users + 9) // 10 THEN r.c
                           ELSE 0 END) AS BIGINT)
            * 1000000) // t.total_events AS BIGINT) AS top10pct_share_ppm
    FROM ranked r CROSS JOIN tot t
    GROUP BY t.n_users, t.total_events
    """,
    tags=("events", "concentration", "analytics"),
)
def events_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-concentration (Lorenz) profile of the event stream: what
    share of all events do the top 1% / top 10% most active users
    produce — the bot/whale detector and the load-skew forecast for
    every per-user operator in this engine (a 40%-from-1%-of-users
    stream is exactly where join salting starts paying).

    Shape: the fact reduces to |users| count rows in ONE map-side
    combinable aggregation; ranking and the share sums then run on
    that compact table (an unpartitioned window over |users| rows —
    the ts_seasonal posture; at 100 TB the per-user table is still
    millions of rows, where a two-phase salted top-k would replace
    the global sort, as window_rank already demonstrates).

    Exactness: pure integer counts; percentile cutoffs are ceiling
    divisions ((n+99) DIV 100); shares in integer ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    ranked = counts.select(
        "c",
        F.row_number()
        .over(W.orderBy(F.col("c").desc(), F.col("user_id")))
        .alias("rn"),
    )
    tot = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("total_events"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n_users", "total_events")
        .agg(
            F.sum(
                F.expr("CASE WHEN rn <= (n_users + 99) DIV 100 THEN c ELSE 0 END")
            )
            .cast("long")
            .alias("top1pct_events"),
            F.sum(
                F.expr("CASE WHEN rn <= (n_users + 9) DIV 10 THEN c ELSE 0 END")
            )
            .cast("long")
            .alias("top10pct_events"),
        )
        .selectExpr(
            "n_users",
            "total_events",
            "top1pct_events",
            "top10pct_events",
            "(top10pct_events * 1000000) DIV total_events"
            " AS top10pct_share_ppm",
        )
    )


# ------------------------------------------------------------------
# events_interarrival — per-user gap statistics
# ------------------------------------------------------------------


@query(
    "events_interarrival",
    oracle="""
    WITH packed AS (
      SELECT user_id,
             list(epoch_us(ts) ORDER BY ts, event_id) AS us
      FROM events GROUP BY user_id
    ),
    gaps AS (
      SELECT user_id,
             list_sort(list_transform(generate_series(1, len(us) - 1),
                                      i -> us[i + 1] - us[i])) AS gs
      FROM packed
    )
    SELECT user_id,
           CAST(len(gs) AS BIGINT) AS n_gaps,
           CASE WHEN len(gs) > 0 THEN gs[1] END AS min_gap_us,
           CASE WHEN len(gs) > 0 THEN gs[len(gs)] END AS max_gap_us,
           CASE WHEN len(gs) = 0 THEN NULL
                WHEN len(gs) % 2 = 1 THEN gs[(len(gs) + 1) // 2]
                ELSE (gs[len(gs) // 2] + gs[len(gs) // 2 + 1]) // 2
           END AS median_gap_us
    FROM gaps
    """,
    tags=("events", "timeseries", "interarrival"),
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time profile: count, min, max, and
    median of the microsecond gaps between consecutive events — the
    cadence fingerprint behind bot detection (impossibly regular or
    impossibly fast gaps) and the empirical basis for
    events_sessionize's gap threshold.

    Differential: Spark computes gaps with a per-user LAG window and
    aggregates; the oracle never uses a window at all — it packs
    each user's epoch list and takes adjacent differences by index.
    Median on even counts is the truncating integer midpoint
    ((a+b) DIV 2, gaps are non-negative so truncation is exact and
    engine-identical) — no float interpolation anywhere.

    Shape: one hash exchange on user_id feeds both the window and
    the final aggregation (same clustering key, Catalyst plans a
    single exchange); per-user state is that user's event count.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (
                F.expr("unix_micros(ts)")
                - F.lag(F.expr("unix_micros(ts)")).over(w)
            ).alias("gap"),
        )
    )
    return (
        gaps.groupBy("user_id")
        .agg(F.array_sort(F.expr("collect_list(gap)")).alias("gs"))
        .selectExpr(
            "user_id",
            "CAST(size(gs) AS BIGINT) AS n_gaps",
            "CASE WHEN size(gs) > 0 THEN element_at(gs, 1) END AS min_gap_us",
            "CASE WHEN size(gs) > 0 THEN element_at(gs, size(gs)) END"
            " AS max_gap_us",
            "CASE WHEN size(gs) = 0 THEN NULL"
            " WHEN size(gs) % 2 = 1"
            " THEN element_at(gs, CAST((size(gs) + 1) DIV 2 AS INT))"
            " ELSE (element_at(gs, CAST(size(gs) DIV 2 AS INT))"
            "       + element_at(gs, CAST(size(gs) DIV 2 + 1 AS INT))) DIV 2"
            " END AS median_gap_us",
        )
    )


# ------------------------------------------------------------------
# sample_temperature — temperature-scaled mixture allocation
# ------------------------------------------------------------------

_TEMP_BUDGET = 300  # docs to draw across all sources


@query(
    "sample_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source
    ),
    weights AS (
      SELECT source, c,
             CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS w
      FROM counts
    ),
    alloc AS (
      SELECT source, c, w,
             CAST((w * {_TEMP_BUDGET}) // (SELECT CAST(sum(w) AS BIGINT)
                                           FROM weights) AS BIGINT) AS quota
      FROM weights
    )
    SELECT d.doc_id, d.source, a.quota
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) d
    JOIN alloc a ON a.source = d.source
    WHERE d.rn <= a.quota
    """,
    tags=("llm", "sampling", "mixture"),
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (T = 2, i.e. weights
    proportional to count^(1/2)) — the multilingual-pretraining
    allocator that up-samples small sources relative to proportional
    sampling without letting giants dominate: each source gets quota
    = floor-share of sqrt(count), and that many docs are drawn
    deterministically by md5 rank.

    Exactness: sqrt of an exact integer is IEEE correctly rounded —
    identical in both engines — and floor(sqrt(c)*1000) pins the
    weight to an exact BIGINT; quotas are integer floor divisions;
    the draw is the md5-ranked prefix (no RNG — reproducible under
    any partitioning, the sample_* family discipline).

    Shape: source quotas are a |sources|-row aggregate broadcast
    back; the draw is one per-source window rank — a single hash
    exchange on source.  A skewed giant source is exactly where the
    temperature flattens the quota, so the rank's per-key work is
    budget-bounded.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    weights = counts.select(
        "source",
        "c",
        F.expr("CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000) AS BIGINT)").alias("w"),
    )
    total_w = weights.agg(F.sum("w").alias("tw"))
    alloc = weights.crossJoin(F.broadcast(total_w)).selectExpr(
        "source", f"(w * {_TEMP_BUDGET}) DIV tw AS quota"
    )
    from pyspark.sql import Window as W

    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .alias("rn"),
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "source", "quota")
    )


# ------------------------------------------------------------------
# window_topk_hop — per-hopping-window top-k event types
# ------------------------------------------------------------------

_HOP_K = 2


@query(
    "window_topk_hop",
    oracle=f"""
    WITH slid AS (
      SELECT event_type,
             TIMESTAMP '1970-01-01 00:00:00'
               + (epoch_us(ts) // 300000000 * 300) * INTERVAL 1 SECOND
               - k.k * INTERVAL 5 MINUTE AS win_start
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    ),
    counted AS (
      SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS n
      FROM slid GROUP BY win_start, event_type
    )
    SELECT win_start, event_type, n,
           CAST(rn AS BIGINT) AS rank_in_window
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY win_start ORDER BY n DESC, event_type) AS rn
      FROM counted
    ) WHERE rn <= {_HOP_K}
    """,
    tags=("streaming", "window", "topk"),
)
def window_topk_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} event types per hopping window (10-minute length,
    5-minute hop — every event lands in exactly 2 windows): the
    trending-now layer on top of stream_sliding's plain counts, with
    the deterministic (count DESC, type ASC) tie-break every exact-
    checked top-k in this repo uses.

    Shape: the fat event stream reduces to the |windows| x |types|
    count table FIRST (map-side combinable after the 2-way window
    explode); the rank then runs over that bounded table, and Spark 4
    plans WindowGroupLimit — a PARTIAL per-partition top-k before the
    exchange (plan-gated), so even the count table never shuffles
    whole.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    counted = (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    return (
        counted.withColumn(
            "rank_in_window",
            F.row_number().over(
                W.partitionBy("win_start").orderBy(
                    F.col("n").desc(), F.col("event_type")
                )
            ),
        )
        .where(F.col("rank_in_window") <= _HOP_K)
        .select(
            "win_start",
            "event_type",
            "n",
            F.col("rank_in_window").cast("long").alias("rank_in_window"),
        )
    )


# ------------------------------------------------------------------
# scalar_struct — STRUCT-type scalar surface
# ------------------------------------------------------------------


@query(
    "scalar_struct",
    oracle="""
    SELECT o_orderkey,
           {'cents': pc, 'key': o_orderkey}.cents AS price_cents,
           {'a': {'cents': pc, 'key': o_orderkey},
            'b': o_orderstatus}.a.key AS nested_key,
           ({'c': pc, 'k': o_orderkey} < {'c': 250000, 'k': o_orderkey})
             AS below_2500,
           CASE WHEN {'c': pc, 'k': o_orderkey}
                     < {'c': 250000, 'k': o_orderkey}
                THEN 'low' ELSE 'high' END AS tier
    FROM (
      SELECT o_orderkey, o_orderstatus,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS pc
      FROM orders WHERE o_orderkey % 13 = 0
    )
    """,
    tags=("scalar", "struct", "sql-surface"),
)
def scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT-type scalar surface: construction (named_struct),
    field access, NESTED structs, and lexicographic struct
    comparison driving a CASE — the composite-value vocabulary the
    engine's own struct-min/argmax aggregation patterns build on
    (agg_argmax, agg_mode), exposed as a user-facing scalar family.

    Both engines order structs field-by-field lexicographically;
    fields are exact integers, so comparisons carry no float
    ambiguity.  Pure map stage over a modulus-pruned slice.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") % 13 == 0)
        .selectExpr(
            "o_orderkey",
            "o_orderstatus",
            "CAST(floor(o_totalprice * 100) AS BIGINT) AS pc",
        )
        .selectExpr(
            "o_orderkey",
            "named_struct('cents', pc, 'key', o_orderkey).cents"
            " AS price_cents",
            "named_struct('a', named_struct('cents', pc, 'key', o_orderkey),"
            " 'b', o_orderstatus).a.key AS nested_key",
            "(named_struct('c', pc, 'k', o_orderkey)"
            " < named_struct('c', CAST(250000 AS BIGINT), 'k', o_orderkey))"
            " AS below_2500",
            "CASE WHEN named_struct('c', pc, 'k', o_orderkey)"
            " < named_struct('c', CAST(250000 AS BIGINT), 'k', o_orderkey)"
            " THEN 'low' ELSE 'high' END AS tier",
        )
    )


# ------------------------------------------------------------------
# agg_rate_ci — Wilson confidence interval for group rates
# ------------------------------------------------------------------

# z = 2 (~95.45%), kept integer so z^2 = 4 and z^4 = 16 stay exact.
_WILSON_FORMULAS = [
    "round((ds + 2.0) / (dn + 4.0), 6) AS center_r6",
    "round(((ds + 2.0) / (dn + 4.0))"
    " - (2.0 * sqrt(dn) / (dn + 4.0))"
    "   * sqrt(ds / dn * (1.0 - ds / dn) + 1.0 / dn), 6) AS lo_r6",
    "round(((ds + 2.0) / (dn + 4.0))"
    " + (2.0 * sqrt(dn) / (dn + 4.0))"
    "   * sqrt(ds / dn * (1.0 - ds / dn) + 1.0 / dn), 6) AS hi_r6",
]


@query(
    "agg_rate_ci",
    oracle=f"""
    WITH counts AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM events GROUP BY event_type
    ),
    doubles AS (
      SELECT event_type, n, s, CAST(n AS DOUBLE) AS dn,
             CAST(s AS DOUBLE) AS ds
      FROM counts
    )
    SELECT event_type, n, s, {", ".join(_WILSON_FORMULAS)}
    FROM doubles
    """,
    tags=("aggregate", "statistics", "interval"),
)
def agg_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score confidence interval (z = 2) for the per-type
    high-value-event rate — the uncertainty band an experimentation
    or data-quality dashboard must put around every small-sample
    rate (the plain p-hat ± z·se interval collapses pathologically
    at p near 0/1 and small n; Wilson does not).

    Exactness: n and s are exact integers from ONE combinable
    aggregation; the interval is a shared-text double formula using
    the agresti-coull-style z=2 arithmetic — only correctly-rounded
    ops (+ - * / sqrt) on identical inputs, rounded 6dp.  The
    formula is the Wilson center ± half-width rewritten so every
    intermediate is one op: no power(), no engine-variant rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") >= 100.0, 1).otherwise(0)).alias("s"),
    )
    doubles = counts.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n",
        "CAST(s AS BIGINT) AS s",
        "CAST(n AS DOUBLE) AS dn",
        "CAST(s AS DOUBLE) AS ds",
    )
    return doubles.selectExpr("event_type", "n", "s", *_WILSON_FORMULAS)


# ------------------------------------------------------------------
# dq_freshness — per-partition data-freshness audit
# ------------------------------------------------------------------

_FRESH_STALE_US = 86_400_000_000  # 1 day


@query(
    "dq_freshness",
    oracle=f"""
    WITH per_type AS (
      SELECT event_type,
             CAST(max(epoch_us(ts)) AS BIGINT) AS max_us,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    anchor AS (SELECT CAST(max(max_us) AS BIGINT) AS global_us FROM per_type)
    SELECT p.event_type, p.n,
           a.global_us - p.max_us AS lag_us,
           (a.global_us - p.max_us) // 3600000000 AS lag_hours,
           a.global_us - p.max_us > {_FRESH_STALE_US} AS is_stale
    FROM per_type p CROSS JOIN anchor a
    """,
    tags=("quality", "freshness", "ops"),
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: each event type's most recent
    timestamp lagged against the newest event anywhere, with a
    staleness flag at 1 day — the "is this feed still flowing"
    check an ingest control plane runs before advancing watermarks
    (the reference advances per-source watermarks only while
    downloads are error-free, routeviews.go:60-62; this is the
    query-side view of the same invariant).

    Shape: one map-side-combinable MAX/count per type, a 1-row
    global anchor broadcast back — integer epoch micros end-to-end.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max(F.expr("unix_micros(ts)")).alias("max_us"),
        F.count(F.lit(1)).alias("n"),
    )
    anchor = per_type.agg(F.max("max_us").alias("global_us"))
    return per_type.crossJoin(F.broadcast(anchor)).selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n",
        "global_us - max_us AS lag_us",
        "(global_us - max_us) DIV 3600000000 AS lag_hours",
        f"global_us - max_us > {_FRESH_STALE_US} AS is_stale",
    )


# ------------------------------------------------------------------
# multimodal_wav_energy — audio feature extraction, oracle-checked
# ------------------------------------------------------------------

_WAV_N = 800  # samples per synthetic clip
_WAV_FRAME = 200  # samples per analysis frame
_WAV_RATE = 8000


@query(
    "multimodal_wav_energy",
    oracle=f"""
    WITH samples AS (
      SELECT doc_id, i,
             (doc_id * 31 + i * 17) % 2003 - 1001 AS s
      FROM documents,
           unnest(generate_series(0, {_WAV_N - 1})) AS u(i)
    )
    SELECT doc_id,
           CAST(i // {_WAV_FRAME} AS BIGINT) AS frame_no,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(s * s) AS BIGINT) AS energy
    FROM samples
    GROUP BY doc_id, i // {_WAV_FRAME}
    """,
    tags=("multimodal", "audio", "mapInPandas"),
)
def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio energy through the REAL byte path: each doc's
    deterministic int16 waveform is ENCODED to PCM16 RIFF/WAVE bytes
    and DECODED back inside an Arrow ``mapInPandas`` stage (the
    pure-Python codec in downloader_spark/media.py), then framed and
    summed — so the exact-check covers the container roundtrip, the
    Arrow batch plumbing, and the feature math, not a manifest stub.

    Differential: the oracle never sees a byte — it recomputes each
    frame's energy from the closed-form synthesis
    (s_i = (doc_id·31 + i·17) mod 2003 − 1001), so any corruption in
    the encode/decode path (endianness, header offsets, sample
    truncation) breaks the hash.  Energy is an exact integer
    (|s| ≤ 1001, Σs² per frame ≤ 200·1001² ≪ int64).

    Shape: map-only — one Arrow stage, rows per doc bounded by the
    frame count; at 100 TB the synthesis select is replaced by a
    ``binaryFile`` scan feeding the same decode UDF (the
    multimodal_inventory posture), partitioned by file.
    """
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n, frame, rate = _WAV_N, _WAV_FRAME, _WAV_RATE

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                i = np.arange(n, dtype=np.int64)
                s = (doc_id * 31 + i * 17) % 2003 - 1001
                wav = encode_wav(s.astype("<i2"), rate)
                got_rate, back = decode_wav(wav)
                assert got_rate == rate and len(back) == n
                sq = back.astype(np.int64) ** 2
                for f in range(n // frame):
                    chunk = sq[f * frame : (f + 1) * frame]
                    out.append((int(doc_id), f, len(chunk), int(chunk.sum())))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_no", "n_samples", "energy"]
            )

    return docs.mapInPandas(
        run,
        "doc_id long, frame_no long, n_samples long, energy long",
    )


# ------------------------------------------------------------------
# embed_triplet_mining — in-batch hardest positive/negative mining
# ------------------------------------------------------------------

_TRIP_DIMS = 8
_TRIP_SCALE = 1000
_TRIP_BATCHES = 8  # fixed width for the static oracle
_TRIP_TARGET_POP = 64  # scale path: batches = ceil(N / this)


def _trip_q(engine: str) -> str:
    """Quantized first-8-component column list (shared recipe with
    embed_kmeans: floor milli-units of the float components)."""
    one = engine == "duck"
    return ", ".join(
        f"CAST(floor(CAST(embedding[{i + (1 if one else 0)}] AS DOUBLE)"
        f" * {_TRIP_SCALE}) AS BIGINT) AS q{i}"
        for i in range(_TRIP_DIMS)
    )


_TRIP_D2 = " + ".join(
    f"(x.q{i} - y.q{i}) * (x.q{i} - y.q{i})" for i in range(_TRIP_DIMS)
)


@query(
    "embed_triplet_mining",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, label,
             {_duck_h60("CAST(vec_id AS VARCHAR)")} % {_TRIP_BATCHES}
               AS batch,
             {_trip_q("duck")}
      FROM embeddings WHERE len(embedding) >= {_TRIP_DIMS}
    ),
    pairs AS (
      SELECT x.vec_id, x.label,
             y.vec_id AS other_id, y.label AS other_label,
             {_TRIP_D2} AS d2
      FROM pts x JOIN pts y
        ON x.batch = y.batch AND x.vec_id <> y.vec_id
    )
    SELECT vec_id, label,
           max(CASE WHEN other_label = label
                    THEN {{'d': d2, 'i': -other_id}} END).i * -1
             AS hard_pos_id,
           max(CASE WHEN other_label = label
                    THEN {{'d': d2, 'i': -other_id}} END).d AS hard_pos_d2,
           min(CASE WHEN other_label <> label
                    THEN {{'d': d2, 'i': other_id}} END).i AS hard_neg_id,
           min(CASE WHEN other_label <> label
                    THEN {{'d': d2, 'i': other_id}} END).d AS hard_neg_d2
    FROM pairs
    GROUP BY vec_id, label
    """,
    tags=("llm", "embedding", "training", "mining"),
)
def embed_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-batch triplet mining for metric learning: vectors are
    dealt into deterministic md5 "batches" (exactly the in-batch
    negative pool a contrastive trainer sees), and each anchor
    reports its hardest positive (same label, MAXIMUM distance) and
    hardest negative (different label, MINIMUM distance) within the
    batch, on exact integer squared distances over floor-quantized
    components (the embed_kmeans discipline).

    Tie-breaks are pinned by struct aggregation: hardest-positive =
    struct-max of (d2, -other_id) — farthest, then LOWEST id;
    hardest-negative = struct-min of (d2, other_id) — closest, then
    lowest id.  Anchors lacking a same-label (or other-label) batch
    peer emit NULL in that column; anchors with NO batch peer at all
    contribute no pair rows and are absent, exactly as the trainer
    would skip them.

    Scale: the exact-check runs at the fixed 8-batch width (the
    oracle is a static string); the scale path is ``triplet_mine``
    with n_batches=None, which derives the batch COUNT from the
    corpus size so batch SIZE stays ~64 (the dedup_embed /
    derive_sign_bits discipline) — per-key fan-out is then a
    training-hyperparameter constant and pair work is O(N·B), not
    O(N²/batches) at a frozen count.  The md5 deal is uniform, so
    no batch skews; the pair join is an equi-join on the batch key.
    """
    return triplet_mine(
        load_table(spark, sf_dir, "embeddings"), n_batches=_TRIP_BATCHES
    )


def triplet_mine(emb: DataFrame, n_batches: int | None = None) -> DataFrame:
    """Mining pipeline shared by the exact-checked key (fixed
    ``n_batches``) and the scale path (``None`` — derive the batch
    count so expected batch population stays ~64, keeping the
    within-batch pair join linear in the corpus)."""
    if n_batches is None:
        n_batches = max(1, -(-emb.count() // _TRIP_TARGET_POP))
    pts = emb.where(F.size("embedding") >= _TRIP_DIMS).selectExpr(
        "vec_id",
        "label",
        f"{_spark_h60('CAST(vec_id AS STRING)')} % {n_batches} AS batch",
        *_trip_q("spark").split(", "),
    )
    x = pts.alias("x")
    y = pts.alias("y")
    pairs = x.join(
        y,
        (F.col("x.batch") == F.col("y.batch"))
        & (F.col("x.vec_id") != F.col("y.vec_id")),
    ).selectExpr(
        "x.vec_id AS vec_id",
        "x.label AS label",
        "y.vec_id AS other_id",
        "y.label AS other_label",
        f"{_TRIP_D2} AS d2",
    )
    return pairs.groupBy("vec_id", "label").agg(
        F.expr(
            "max(CASE WHEN other_label = label"
            " THEN named_struct('d', d2, 'i', -other_id) END).i * -1"
        ).alias("hard_pos_id"),
        F.expr(
            "max(CASE WHEN other_label = label"
            " THEN named_struct('d', d2, 'i', -other_id) END).d"
        ).alias("hard_pos_d2"),
        F.expr(
            "min(CASE WHEN other_label <> label"
            " THEN named_struct('d', d2, 'i', other_id) END).i"
        ).alias("hard_neg_id"),
        F.expr(
            "min(CASE WHEN other_label <> label"
            " THEN named_struct('d', d2, 'i', other_id) END).d"
        ).alias("hard_neg_d2"),
    )


# ------------------------------------------------------------------
# window_nth — first/last/nth-value window surface
# ------------------------------------------------------------------


@query(
    "window_nth",
    oracle="""
    SELECT event_id, user_id,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id) OVER w AS last_event,
           nth_value(event_id, 3) OVER w AS third_event,
           lead(event_id, 1, -1) OVER w2 AS next_event,
           lag(event_id, 2, -1) OVER w2 AS prev2_event
    FROM events
    WHERE user_id % 7 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING),
           w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "sql-surface"),
)
def window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window-function surface: first_value / last_value /
    nth_value over the full-partition frame, plus lead/lag with
    explicit offsets and defaults — the session-bookend vocabulary
    (entry event, exit event, third touch, next/previous with
    sentinel) the events_* operators compose from, exposed directly.

    All values are exact integers over a (ts, event_id) total order;
    the frame is spelled UNBOUNDED..UNBOUNDED explicitly because the
    default frame for last_value (UNBOUNDED..CURRENT ROW) is the
    classic silent-wrong-answer trap — pinning it is part of the
    surface contract.  One hash exchange on user_id, one sort.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.where(F.col("user_id") % 7 == 0).select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.nth_value("event_id", 3).over(w).alias("third_event"),
        F.lead("event_id", 1, -1).over(w2).alias("next_event"),
        F.lag("event_id", 2, -1).over(w2).alias("prev2_event"),
    )


# ------------------------------------------------------------------
# pipeline_split_hygiene — train/test contamination audit
# ------------------------------------------------------------------

_HYG_MIN_SHARED = 3  # shared distinct shingle hashes that flag a doc


@query(
    "pipeline_split_hygiene",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                              ' ', 'g')), ' ') AS toks,
             {_duck_h60("concat('split:', CAST(doc_id AS VARCHAR))")} % 100
               AS bucket
      FROM documents
    ),
    sh AS (
      SELECT doc_id, bucket,
             unnest(CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                  ELSE [array_to_string(toks, ' ')] END) AS s
      FROM toks
    ),
    hashed AS (
      SELECT doc_id, bucket, {_duck_h60("s")} AS h FROM sh
    ),
    train_set AS (
      SELECT DISTINCT h FROM hashed WHERE bucket < 80
    ),
    test_overlap AS (
      SELECT t.doc_id, CAST(count(DISTINCT t.h) AS BIGINT) AS n_shared
      FROM hashed t JOIN train_set tr ON tr.h = t.h
      WHERE t.bucket >= 90
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, coalesce(o.n_shared, 0) AS n_shared,
           coalesce(o.n_shared, 0) >= {_HYG_MIN_SHARED} AS contaminated
    FROM (SELECT doc_id FROM toks WHERE bucket >= 90) d
    LEFT JOIN test_overlap o ON o.doc_id = d.doc_id
    """,
    tags=("llm", "pipeline", "hygiene", "dedup"),
)
def pipeline_split_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: for every TEST document of
    the engine's own md5 train/val/test split (sample_split's exact
    bucket arithmetic), count distinct 3-gram shingle hashes it
    shares with ANY train document — the eval-hygiene gate that
    catches near-duplicate leakage across the split boundary, which
    doc-level dedup alone cannot see (a test doc can share a
    paragraph with a different train doc).  text_contamination
    audits an external benchmark set; this audits the pipeline's OWN
    split.

    Shape: the train side reduces to its DISTINCT shingle-hash SET
    (bounded by the shingle vocabulary, not the corpus) before the
    join; the test side joins on the 60-bit integer hash and
    re-aggregates per doc.  Integer keys end-to-end (16 B/posting,
    the llm_dedup discipline); never doc×doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    from downloader_spark.operators.extended import SPLIT_BUCKETS, TRAIN_UPTO

    hashed = (
        docs.selectExpr(
            "doc_id",
            f"{_SPARK_NORM} AS toks",
            f"{_spark_h60(chr(39).join(['concat(', 'split:', ', CAST(doc_id AS STRING))']))}"
            f" % {SPLIT_BUCKETS} AS bucket",
        )
        .selectExpr(
            "doc_id",
            "bucket",
            "explode(CASE WHEN size(toks) >= 3"
            " THEN array_distinct(transform("
            "   sequence(1, size(toks) - 2),"
            "   i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))"
            " ELSE array(array_join(toks, ' ')) END) AS s",
        )
        .selectExpr("doc_id", "bucket", f"{_spark_h60('s')} AS h")
    )
    train_set = (
        hashed.where(F.col("bucket") < TRAIN_UPTO).select("h").distinct()
    )
    test_docs = hashed.where(F.col("bucket") >= TRAIN_UPTO + 10)
    overlap = (
        test_docs.join(train_set, "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_shared"))
    )
    ids = test_docs.select("doc_id").distinct()
    return ids.join(overlap, "doc_id", "left").selectExpr(
        "doc_id",
        "coalesce(n_shared, CAST(0 AS BIGINT)) AS n_shared",
        f"coalesce(n_shared, CAST(0 AS BIGINT)) >= {_HYG_MIN_SHARED}"
        " AS contaminated",
    )


# ------------------------------------------------------------------
# text_vocab_coverage — tokenizer-budget coverage curve
# ------------------------------------------------------------------

_COV_CUTS = [10, 50, 100]


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
      FROM documents
    ),
    tnz AS (SELECT tok FROM toks WHERE tok <> ''),
    counts AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tnz GROUP BY tok
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rn FROM counts
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
    SELECT k.k AS vocab_k,
           CAST(sum(CASE WHEN r.rn <= k.k THEN r.n ELSE 0 END) AS BIGINT)
             AS covered,
           t.total,
           CAST((CAST(sum(CASE WHEN r.rn <= k.k THEN r.n ELSE 0 END)
                 AS BIGINT) * 1000000) // t.total AS BIGINT)
             AS coverage_ppm
    FROM ranked r
    CROSS JOIN (SELECT unnest({_COV_CUTS}) AS k) k
    CROSS JOIN tot t
    GROUP BY k.k, t.total
    """,
    tags=("llm", "text", "vocabulary"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget coverage curve: what fraction of all token
    OCCURRENCES do the top-10/50/100 corpus types cover (exact
    integer ppm) — the sizing curve a vocabulary/BPE budget decision
    reads before committing to a token count (text_oov_rate fixes
    one k; this sweeps the curve).

    Shape: the token stream reduces to the |vocab| count table in
    one combinable aggregation; ranking and the three cutoff sums
    run on that compact table (window over |vocab| rows), with the
    1-row total broadcast.  Corpus-global key — deliberately NOT
    doc_id-cohorted (cohort_by_doc buys nothing when the only
    grouping key is the token).
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    counts = (
        docs.selectExpr(f"explode({_SPARK_NORM}) AS tok")
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = counts.select(
        "n",
        F.row_number().over(W.orderBy(F.col("n").desc(), F.col("tok"))).alias("rn"),
    )
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    cuts = ranked.crossJoin(
        F.broadcast(
            ranked.sparkSession.createDataFrame(
                [(k,) for k in _COV_CUTS], "k int"
            )
        )
    )
    return (
        cuts.crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").alias("vocab_k"), "total")
        .agg(
            F.sum(F.expr("CASE WHEN rn <= k THEN n ELSE 0 END"))
            .cast("long")
            .alias("covered")
        )
        .selectExpr(
            "CAST(vocab_k AS BIGINT) AS vocab_k",
            "covered",
            "total",
            "(covered * 1000000) DIV total AS coverage_ppm",
        )
    )
