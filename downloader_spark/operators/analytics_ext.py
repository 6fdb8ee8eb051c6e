"""Analytics surface extensions (round 3): grouping sets, unpivot/melt,
exact moment-based correlation aggregates, deterministic mode,
URL parsing, and multi-probe IVF search.

Same contract as every operator module: each key is a Spark
DataFrame plan plus a DuckDB oracle computing identical values with
identical column names; float arithmetic either rides exact integer /
decimal moments or performs the same double operations on identical
operands (bit-equal per IEEE-754), so order-insensitive value hashes
match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.functions.numeric import money_sum, sql_money_sum
from downloader_spark.io import load_table
from downloader_spark.plans.registry import query


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_money_sum("l_quantity", "sum_qty", scale=2)}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with non-hierarchical sets — the general
    form that rollup/cube (agg_rollup, agg_cube) are sugar for:
    per-returnflag totals, per-linestatus totals, and the grand total
    in ONE pass.  Spark expands each row once per set then
    hash-aggregates (same Expand->partial->final shape as cube, with
    3 sets instead of 4); decimal-exact quantity sums per
    functions/numeric."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("l_quantity", "sum_qty", scale=2),
    )


@query(
    "unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'qty' AS metric,
           l_quantity AS value
    FROM lineitem WHERE l_orderkey % 100 = 7
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
    FROM lineitem WHERE l_orderkey % 100 = 7
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc', l_discount
    FROM lineitem WHERE l_orderkey % 100 = 7
    """,
    tags=("reshape",),
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshape (melt) — the inverse of agg_pivot: three
    measure columns become (metric, value) rows.  Values pass through
    untouched (no arithmetic => no float-order hazard).  Spark's
    ``unpivot`` is a zero-shuffle Expand: each input row emits one row
    per measure map-side, so it composes with downstream aggregation
    without extra exchanges.  The metric names are re-labelled to the
    oracle's literals via the unpivot value-alias syntax."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 7
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("disc"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["qty", "price", "disc"],
        "metric",
        "value",
    )


_CORR_MOMENTS = """
      SELECT lang,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM (SELECT lang,
                   n_chars AS x,
                   CAST(len(text) - len(replace(text, ' ', '')) AS BIGINT) AS y
            FROM documents)
      GROUP BY lang
"""


@query(
    "agg_corr",
    oracle=f"""
    WITH m AS ({_CORR_MOMENTS})
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
                ELSE round((n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                           6) END AS corr_xy,
           round((sxy - sx * sy / n) / n, 6) AS covar_pop_xy,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                END AS slope_yx
    FROM m
    """,
    tags=("aggregate", "statistics"),
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates — Pearson correlation, population
    covariance, regression slope — per language, between document
    length (n_chars) and space count.

    The built-in ``corr``/``covar_pop`` accumulate running doubles
    whose value depends on partial-aggregation order, so they can
    never be hash-compared across engines.  Instead the five raw
    moments are summed EXACTLY as integers (associative, any
    partitioning), cast once to double, and combined with the textbook
    formulas in identical operation order on both engines — every
    double op has identical operands, so results are bit-equal.  Same
    one-shuffle partial-aggregate plan a built-in corr would produce.
    In production the built-ins are fine; this form is the verifiable
    surface (and what you'd use for a deterministic data release).

    Degenerate groups (single doc, or zero variance in either
    variable) yield NULL corr/slope via an explicit zero-denominator
    CASE on BOTH engines — Spark 4's ANSI mode turns double division
    by zero into a query-killing error and DuckDB turns it into NaN,
    so the guard is correctness-critical, not cosmetic."""
    return corr_stats(load_table(spark, sf_dir, "documents"))


def corr_stats(docs: DataFrame) -> DataFrame:
    """Core moment-based correlation pipeline over (lang, text,
    n_chars) rows; see agg_corr for the determinism story."""
    xy = docs.select(
        "lang",
        F.col("n_chars").alias("x"),
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", ""))
        ).cast("bigint").alias("y"),
    )
    m = xy.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return m.select(
        "lang",
        n.cast("bigint").alias("n_docs"),
        F.when(
            (var_x == 0) | (var_y == 0), F.lit(None).cast("double")
        ).otherwise(
            F.round((n * sxy - sx * sy) / (F.sqrt(var_x) * F.sqrt(var_y)), 6)
        ).alias("corr_xy"),
        F.round((sxy - sx * sy / n) / n, 6).alias("covar_pop_xy"),
        F.when(var_x == 0, F.lit(None).cast("double")).otherwise(
            F.round((n * sxy - sx * sy) / var_x, 6)
        ).alias("slope_yx"),
    )


HIST_BIN_WIDTH = 5000  # fixed-width price bins


@query(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(floor(l_extendedprice / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS bin_total
    FROM lineitem
    GROUP BY 1
    """,
    tags=("aggregate", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over price: bin id is a floor division
    (identical doubles floor identically — no boundary ambiguity),
    counts plus a decimal-exact per-bin total.  One map-side-combined
    shuffle on the bin id; fixed widths avoid the two-pass
    min/max-then-bin shape that data-dependent bounds would force
    (for those, compute bounds once and broadcast them)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / HIST_BIN_WIDTH)
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("l_extendedprice", "bin_total", scale=2),
        )
    )


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag,
           l_linestatus AS mode_status,
           CAST(cnt AS BIGINT) AS mode_count
    FROM counts
    QUALIFY row_number() OVER (
      PARTITION BY l_returnflag ORDER BY cnt DESC, l_linestatus DESC
    ) = 1
    """,
    tags=("aggregate", "mode"),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value) per group — the
    aggregate SQL's ``mode()`` leaves tie order unspecified, so it can
    never be hash-compared; this form pins ties to the greatest value
    via a struct-max over (count, value), which partial-aggregates
    map-side.  No window; the struct-max's own exchange only carries
    the tiny (group, value) counts table."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        counts.groupBy("l_returnflag")
        .agg(F.max(F.struct("cnt", "l_linestatus")).alias("m"))
        .select(
            "l_returnflag",
            F.col("m.l_linestatus").alias("mode_status"),
            F.col("m.cnt").alias("mode_count"),
        )
    )


@query(
    "scalar_url",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             concat('https://archive.example.com:8080/ds/',
                    replace(lower(o_orderpriority), ' ', '-'), '/',
                    CAST(o_orderkey AS VARCHAR),
                    '.gz?ver=', CAST(o_orderkey % 7 AS VARCHAR),
                    '&fmt=parquet') AS url
      FROM orders WHERE o_orderkey % 50 = 1
    )
    SELECT o_orderkey,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?#]([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]ver=([^&#]*)', 1) AS ver
    FROM u
    """,
    tags=("scalar", "url"),
)
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — the function family behind the reference's
    URL→object naming (common.go:95-101 lifts path segments out of
    source URLs with regexes).  Spark's ``parse_url`` (HOST excludes
    the port, PATH keeps the leading slash, QUERY takes a key) against
    a pure-regex oracle: two independent parsers, same fields.  URLs
    are synthesized deterministically from orders so the fixture needs
    no URL column."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 50 == 1
    )
    url = F.concat(
        F.lit("https://archive.example.com:8080/ds/"),
        F.regexp_replace(F.lower("o_orderpriority"), " ", "-"),
        F.lit("/"),
        F.col("o_orderkey").cast("string"),
        F.lit(".gz?ver="),
        (F.col("o_orderkey") % 7).cast("string"),
        F.lit("&fmt=parquet"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ver")).alias("ver"),
    )


# ------------------------------------------------------- multi-probe IVF

N_QUERIES = 5
NPROBE = 2
MP_TOP_K = 5

# Quantized-integer centroid geometry: component q = floor(v * 1000)
# (exact for float32 in double), centroid kept as the integer SUM
# vector (not the mean) so every dot/norm below is exact bigint
# arithmetic — order-independent, hence oracle-replicable.  Ranking by
# sum-vector cosine equals ranking by mean-vector cosine: the 1/n
# scale cancels in cosine.
_DUCK_NORM_NONZERO = (
    "list_reduce(list_transform(list_zip(embedding, embedding), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y) <> 0"
)

# centroid inputs carry the SAME zero-norm filter as the Spark side's
# corpus — asymmetric filtering would shift the integer centroid sums
# and hence the probe ranking
_DUCK_QCOMPS = f"""
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
      FROM embeddings WHERE vec_id >= {{nq}} AND {_DUCK_NORM_NONZERO}
"""


@query(
    "sim_search_multiprobe",
    oracle=f"""
    WITH comps AS ({_DUCK_QCOMPS.format(nq=N_QUERIES)}),
    cent AS (
      SELECT label, pos, SUM(q) AS cq FROM comps GROUP BY label, pos
    ),
    cnorm AS (
      SELECT label, SUM(cq * cq) AS c2 FROM cent GROUP BY label
    ),
    qcomps AS (
      SELECT vec_id AS query_id,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qq
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    qdots AS (
      SELECT q.query_id, c.label, SUM(q.qq * c.cq) AS dot_q
      FROM qcomps q JOIN cent c ON q.pos = c.pos
      GROUP BY q.query_id, c.label
    ),
    probes AS (
      SELECT query_id, label,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CASE WHEN c2 = 0 THEN NULL
                             ELSE CAST(dot_q AS DOUBLE) / sqrt(CAST(c2 AS DOUBLE))
                             END DESC NULLS LAST,
                        label
             ) AS cr
      FROM qdots JOIN cnorm USING (label)
      QUALIFY cr <= {NPROBE}
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb
          FROM embeddings WHERE vec_id < {N_QUERIES} AND {_DUCK_NORM_NONZERO}),
    c AS (SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id >= {N_QUERIES} AND {_DUCK_NORM_NONZERO}),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_reduce(list_transform(list_zip(q.q_emb, c.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
               / sqrt(list_reduce(list_transform(list_zip(q.q_emb, q.q_emb),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
                 * list_reduce(list_transform(list_zip(c.embedding, c.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y))
               AS cos
      FROM q
      JOIN probes p ON p.query_id = q.query_id
      JOIN c ON c.label = p.label
    )
    SELECT query_id, vec_id,
           CAST(floor(cos * 1000000) AS BIGINT) AS cos_ppm,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {MP_TOP_K}
    """,
    tags=("llm", "similarity", "ann"),
)
def sim_search_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN: each query scans its {NPROBE} NEAREST
    coarse clusters (by genuine centroid cosine, not a fixed label) —
    the standard recall-vs-scan-cost dial between nprobe=1
    (sim_search_ivf) and brute force (sim_search).

    The probe-selection geometry is exact: quantized components
    (floor(v*1000)) summed into integer centroid vectors, integer
    query·centroid dots, one double division per (query, centroid) on
    identical operands — so both engines pick identical probe sets and
    the hash check covers the whole pipeline, not just the rescoring.

    Scale shape: centroid stats are |labels| x dims cells
    (map-side partial-aggregated); the probe table is |queries| x
    nprobe rows, BROADCAST into the corpus join so the corpus only
    shuffles... never — it's scanned map-side with partition pruning
    when the corpus is stored partitioned by label.  Final top-k
    reuses the salted two-phase pattern via row_number windows over
    per-query survivors."""
    from downloader_spark.operators.llm_similarity import _norm_nonzero

    emb = load_table(spark, sf_dir, "embeddings")
    # zero-norm vectors (undefined cosine) are excluded once, per
    # vector — see llm_similarity._norm_nonzero for why a per-pair
    # guard is both slower and insufficient
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).filter(_norm_nonzero())
    comps = corpus.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * 1000).cast("bigint").alias("q"),
    )
    cent = comps.groupBy("label", "pos").agg(F.sum("q").alias("cq"))
    cnorm = cent.groupBy("label").agg(
        F.sum(F.col("cq") * F.col("cq")).alias("c2")
    )
    qcomps = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .select(
            "query_id",
            "pos",
            F.floor(F.col("v").cast("double") * 1000).cast("bigint").alias("qq"),
        )
    )
    qdots = (
        qcomps.join(cent, "pos")
        .groupBy("query_id", "label")
        .agg(F.sum(F.col("qq") * F.col("cq")).alias("dot_q"))
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.when(F.col("c2") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("dot_q").cast("double") / F.sqrt(F.col("c2").cast("double"))
        )
        .desc_nulls_last(),
        "label",
    )
    probes = (
        qdots.join(cnorm, "label")
        .withColumn("cr", F.row_number().over(probe_w))
        .filter(F.col("cr") <= NPROBE)
        .select("query_id", "label")
    )
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .filter(_norm_nonzero())
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    probe_q = queries.join(probes, "query_id")

    dot_expr = (
        "aggregate(zip_with(q_emb, embedding, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    nq_expr = (
        "aggregate(zip_with(q_emb, q_emb, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    nc_expr = (
        "aggregate(zip_with(embedding, embedding, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    # unguarded division is safe: queries and corpus pre-filtered to
    # norm != 0 above
    scored = corpus.join(F.broadcast(probe_q), "label").withColumn(
        "cos",
        F.expr(dot_expr) / F.sqrt(F.expr(nq_expr) * F.expr(nc_expr)),
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc_nulls_last(), "vec_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= MP_TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.floor(F.col("cos") * 1000000).cast("bigint").alias("cos_ppm"),
            "rank",
        )
    )
