"""Statistical mining operators: Gini diversity, deterministic
bootstrap resampling, order-2 path mining, chunk-level storage dedup,
and the correlated-scalar-subquery SQL shape (SURVEY.md §2.B north
star — the measurement layer over the archived streams; the
reference's own statistics stop at Prometheus counters,
metrics/metrics.go:13-53).

Cross-engine exactness: Gini avoids entropy's log with the exact
rational impurity 1 - Σp² in ppm; bootstrap weights are md5-derived
(no RNG); everything else is counts and floor divisions.

Scale notes (100 TB):
- ``agg_gini`` is two chained aggregations (type counts → per-user
  impurity) — both map-side combinable, keys uniform.
- ``sample_bootstrap`` evaluates ALL B resamples in one scan: the
  per-(row, replicate) weight is a hash expression, so the B
  pseudo-samples are B conditional-sum columns, not B passes.
- ``events_paths`` builds 3-step paths with two leads in ONE window
  node, then counts — the order-2 companion to events_transitions.
- ``multimodal_dedup_chunks`` is the content-addressed storage
  estimator: first-occurrence per chunk digest is a struct-min
  aggregation (no window), dup bytes roll up per document.
- ``sql_q2_corr`` exists to pin Catalyst's subquery decorrelation:
  the correlated scalar MIN rewrites to an aggregate + join, never
  a per-row subquery execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.plans.registry import query

# Bootstrap: number of resamples; weight = h % 3 (mean 1, var 2/3) —
# a deterministic integer surrogate for Poisson(1) multipliers.
BOOT_B = 20

# Path mining: path length 3, global top-k.
PATH_TOPK = 15

# Chunk dedup rides multimodal_scan's manifest geometry.
DEDUP_CHUNK_BYTES = 256

# Per-replicate deterministic weight expressions (md5(doc_id # b) % 3).
_DUCK_W = [
    _duck_h60(f"concat(CAST(doc_id AS VARCHAR), '#', '{b}')") for b in range(BOOT_B)
]
_SPARK_W = [
    _spark_h60(f"concat(CAST(doc_id AS STRING), '#', '{b}')") for b in range(BOOT_B)
]


@query(
    "agg_gini",
    oracle="""
    WITH tc AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(1000000 - sum(c * c) * 1000000 // (sum(c) * sum(c)) AS BIGINT)
             AS gini_ppm
    FROM tc
    GROUP BY user_id
    """,
    tags=("aggregate", "statistics", "diversity"),
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity of each user's event-type mix: 1 - Σp² in exact
    ppm — the diversity/concentration metric (0 = single-type user,
    → 1 = uniform mix).  Chosen over Shannon entropy deliberately:
    entropy needs log() (not bit-stable across libms), while Gini is
    a pure rational of counts — same measurement intent, hash-exact.

    Two chained hash aggregations — (user, type) counts, then the
    per-user moment sums — both associative with map-side partials;
    no window, no sort, uniform keys at any scale."""
    ev = load_table(spark, sf_dir, "events")
    tc = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    return tc.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        F.expr(
            "CAST(1000000 - sum(c * c) * 1000000 DIV (sum(c) * sum(c)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@query(
    "sample_bootstrap",
    oracle=f"""
    WITH v AS (
      SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS v FROM documents
    ), reps AS (
      SELECT lang,
             {", ".join(
                 f"sum(v * (({w}) % 3)) AS s{b}"
                 for b, w in enumerate(_DUCK_W))}
      FROM v GROUP BY lang
    ), moments AS (
      SELECT lang,
             ({" + ".join(f"s{b}" for b in range(BOOT_B))}) AS tot,
             ({" + ".join(f"s{b} * s{b}" for b in range(BOOT_B))}) AS tot2
      FROM reps
    )
    SELECT lang,
           CAST(tot // {BOOT_B} AS BIGINT) AS boot_mean,
           CAST((tot2 - tot * tot // {BOOT_B}) // {BOOT_B - 1} AS BIGINT)
             AS boot_var
    FROM moments
    """,
    tags=("sampling", "statistics", "bootstrap"),
)
def sample_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap uncertainty for a per-language total, deterministic:
    {BOOT_B} resamples where each document's replicate-b multiplier
    is (md5(doc_id # b) % 3) — an integer surrogate for the Poisson
    bootstrap's random weights (mean 1), reproducible across engines
    and runs where true RNG resampling never is.  Emits the bootstrap
    mean and variance of sum(n_chars) per language — the error bar a
    100 TB measurement pipeline attaches to its point estimates.

    ONE scan evaluates all {BOOT_B} pseudo-samples: the weights are
    hash expressions, so the resamples are {BOOT_B} conditional-sum
    columns in a single aggregation — never {BOOT_B} passes (the
    Poisson-bootstrap trick that makes resampling feasible at scale,
    public technique)."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.selectExpr("lang", "doc_id", "CAST(n_chars AS BIGINT) AS v")
    reps = v.groupBy("lang").agg(
        *[
            F.expr(f"sum(v * (({w}) % 3))").alias(f"s{b}")
            for b, w in enumerate(_SPARK_W)
        ]
    )
    tot = " + ".join(f"s{b}" for b in range(BOOT_B))
    tot2 = " + ".join(f"s{b} * s{b}" for b in range(BOOT_B))
    return reps.selectExpr(
        "lang",
        f"CAST(({tot}) DIV {BOOT_B} AS BIGINT) AS boot_mean",
        f"CAST((({tot2}) - ({tot}) * ({tot}) DIV {BOOT_B}) DIV {BOOT_B - 1}"
        " AS BIGINT) AS boot_var",
    )


@query(
    "events_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
             count(*) AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, CAST(n AS BIGINT) AS n
    FROM paths
    ORDER BY n DESC, path
    LIMIT {PATH_TOPK}
    """,
    tags=("events", "sequence", "mining"),
)
def events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOPK} 3-step behavioral paths across all user
    streams — the order-2 sequence-mining companion to
    events_transitions (order-1 Markov): two lead() taps in ONE
    window node build each strictly-consecutive event triple, a hash
    count aggregates them, and TakeOrderedAndProject returns the
    global top-k with a path-name tie-break.

    One user_id-partitioned window pass + one count shuffle whose
    cardinality is bounded by |event_types|³, not by rows — the
    output side is tiny at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOPK)
    )


@query(
    "multimodal_dedup_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, CAST(len(text) AS BIGINT) AS nb FROM documents
      WHERE len(text) > 0
    ), chunks AS (
      SELECT doc_id,
             CAST(ci AS BIGINT) AS chunk_idx,
             md5(substring(text, CAST(ci * {DEDUP_CHUNK_BYTES} + 1 AS INT),
                           {DEDUP_CHUNK_BYTES})) AS digest,
             least(nb - ci * {DEDUP_CHUNK_BYTES}, {DEDUP_CHUNK_BYTES})
               AS chunk_len
      FROM t, LATERAL unnest(generate_series(0,
             CAST((nb - 1) // {DEDUP_CHUNK_BYTES} AS BIGINT))) AS g(ci)
    ), firsts AS (
      SELECT digest, min(doc_id * 1000000 + chunk_idx) AS first_pos
      FROM chunks GROUP BY digest
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN c.doc_id * 1000000 + c.chunk_idx = f.first_pos
                         THEN 0 ELSE 1 END) AS BIGINT) AS dup_chunks,
           CAST(sum(CASE WHEN c.doc_id * 1000000 + c.chunk_idx = f.first_pos
                         THEN 0 ELSE c.chunk_len END) AS BIGINT) AS dup_bytes
    FROM chunks c JOIN firsts f ON c.digest = f.digest
    GROUP BY c.doc_id
    """,
    tags=("multimodal", "dedup", "storage"),
)
def multimodal_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed storage savings estimator: chunk every
    payload into {DEDUP_CHUNK_BYTES}-byte ranges (the
    multimodal_chunks manifest geometry), dedup chunks globally by
    digest, and report per document how many of its chunks — and
    bytes — are duplicates of an earlier occurrence (global
    (doc_id, chunk_idx) order).  This is the dedup ratio a
    content-addressed object store (or the reference's MD5 dedup,
    common.go:169-190, generalized below whole-object granularity)
    would realize on the corpus.

    First-occurrence per digest is a struct-min HASH AGGREGATION
    (min of the encoded position), never a window over the chunk
    stream; the chunk explode is shuffle-free; the only exchanges
    are the digest groupBy and the join back — both on uniform
    hash keys.  The documents corpus stands in for binary payloads
    (pure ASCII, test-asserted — multimodal_chunks precedent)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "text", F.length("text").cast("long").alias("nb")
    ).filter(F.col("nb") > 0)
    chunks = t.select(
        "doc_id",
        "text",
        "nb",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.expr(f"(nb - 1) DIV {DEDUP_CHUNK_BYTES}")
            )
        ).alias("ci"),
    ).selectExpr(
        "doc_id",
        "CAST(ci AS BIGINT) AS chunk_idx",
        f"md5(substring(text, CAST(ci * {DEDUP_CHUNK_BYTES} + 1 AS INT),"
        f" {DEDUP_CHUNK_BYTES})) AS digest",
        f"least(nb - ci * {DEDUP_CHUNK_BYTES}, {DEDUP_CHUNK_BYTES}) AS chunk_len",
    )
    firsts = chunks.groupBy("digest").agg(
        F.min(F.expr("doc_id * 1000000 + chunk_idx")).alias("first_pos")
    )
    return (
        chunks.join(firsts, "digest")
        .withColumn(
            "is_dup",
            (F.expr("doc_id * 1000000 + chunk_idx") != F.col("first_pos")).cast(
                "int"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("is_dup").cast("long").alias("dup_chunks"),
            F.sum(F.col("is_dup") * F.col("chunk_len")).cast("long").alias(
                "dup_bytes"
            ),
        )
    )


_Q2_SQL = """
SELECT p.p_partkey, p.p_name, s.s_suppkey,
       CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS price_cents
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size >= 48
  AND floor(l.l_extendedprice * 100) = (
    SELECT min(floor(l2.l_extendedprice * 100))
    FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
"""


@query(
    "sql_q2_corr",
    oracle=_Q2_SQL,
    tags=("sql", "subquery", "decorrelation"),
)
def sql_q2_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape correlated scalar subquery: for each large part,
    the supplier rows offering it at its global minimum price —
    `WHERE price = (SELECT min(price) ... WHERE same part)`.

    Two-construction differential (round 8, upgraded from same-text):
    the oracle keeps the textbook correlated scalar subquery (DuckDB
    decorrelates it its own way); the Spark side HAND-BUILDS the
    decorrelated plan — prune lineitem to qualifying parts first
    (inner join on the size-filtered part projection), take the
    per-part min of the floor-cents price, and join the min back on
    (partkey, price) — so the two engines only agree if the manual
    aggregate-join really is the subquery's semantics (min over ALL
    of the part's lineitem rows: the part-prune keeps whole parts,
    never individual rows, so the pruned min equals the global min).
    At 100 TB the size-filtered part side prunes the fact BEFORE the
    min aggregate, so both lineitem passes run over the qualifying
    subset only; prices compare as floor-cents integers (reference
    parity: the reference's latest-pointer rule is itself a
    per-group extremum, UpdateCurrent.sh:7-9)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 48)
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
    )
    pruned = li.join(part, li.l_partkey == part.p_partkey)
    minp = pruned.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("price_cents").alias("min_cents")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    return (
        pruned.join(
            minp,
            (pruned.l_partkey == minp.mk)
            & (pruned.price_cents == minp.min_cents),
        )
        .join(sup, pruned.l_suppkey == sup.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "price_cents")
    )
