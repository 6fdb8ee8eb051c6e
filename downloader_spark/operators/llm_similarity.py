"""Embedding similarity search (SURVEY.md §2.B north star):
brute-force cosine top-k as the exactness baseline, and an
IVF-partitioned variant as the scale path.

Cosine determinism: dot products and norms are left-folds of double
products in identical order on both engines (Spark ``aggregate`` with
0.0 init == DuckDB ``list_reduce`` first-element init, since
0.0 + x == x), so scores are bit-identical and top-k ordering cannot
diverge.  Scores are emitted as floor-ppm integers; ranking
tie-breaks on vec_id.

Scale design:
- the query set is small and BROADCAST — scoring is map-side, no
  shuffle of the corpus;
- top-k uses the two-phase pattern: per-salt-bucket partial top-k
  (bounds any one window partition to corpus/64), then final top-k
  over 64*k survivors per query.  A single window partitioned only by
  query_id would funnel the whole corpus through |queries| reducers —
  the classic straggler at 100 TB;
- the IVF variant prunes the scan to the query's coarse partition
  (here the pretrained cluster id in ``label``; nprobe=1), trading
  recall for a |corpus|/|clusters| scan — the standard ANN shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import query

N_QUERIES = 5  # vec_id < 5 are the query vectors; the rest is corpus
TOP_K = 10
SALT_BUCKETS = 64

_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
# Guarded like llm_dedup._DUCK_DOT: DuckDB's list_reduce errors on an
# empty list (both-empty zip) where Spark's aggregate init folds to
# 0.0, so a zero-length embedding must degrade to 0.0 → norm-filtered.
_DUCK_DOT = (
    "CASE WHEN len({a}) = 0 AND len({b}) = 0 THEN CAST(0.0 AS DOUBLE)"
    " ELSE list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y) END"
)


def _norm_nonzero() -> object:
    """Per-vector zero-norm predicate: ANSI Spark errors on double
    div-by-zero and DuckDB's NaN compares GREATER, so undefined-cosine
    vectors are excluded ONCE per vector (a per-pair nullif/CASE guard
    would re-evaluate the interpreted norm fold per inline site)."""
    return F.expr(_SPARK_DOT.format(a="embedding", b="embedding")) != 0


def _scored(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    """Broadcast-join every query against the corpus and score cosine."""
    q = queries.filter(_norm_nonzero()).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = corpus.filter(_norm_nonzero()).select("vec_id", "embedding")
    dot = F.expr(_SPARK_DOT.format(a="q_emb", b="embedding"))
    nq = F.expr(_SPARK_DOT.format(a="q_emb", b="q_emb"))
    nc = F.expr(_SPARK_DOT.format(a="embedding", b="embedding"))
    # unguarded: both sides pre-filtered to norm != 0
    return c.join(F.broadcast(q)).withColumn("cos", dot / F.sqrt(nq * nc))


def topk_per_query(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    """Two-phase per-group top-k: salt-local then final."""
    local_w = Window.partitionBy(
        "query_id", F.pmod(F.col("vec_id"), F.lit(SALT_BUCKETS))
    ).orderBy(F.col("cos").desc_nulls_last(), F.col("vec_id"))
    final_w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc_nulls_last(), F.col("vec_id")
    )
    return (
        scored.withColumn("lr", F.row_number().over(local_w))
        .filter(F.col("lr") <= k)
        .withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.floor(F.col("cos") * 1000000).cast("bigint").alias("cos_ppm"),
            "rank",
        )
    )


@query(
    "sim_search",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < {N_QUERIES}
                 AND {_DUCK_DOT.format(a="embedding", b="embedding")} <> 0),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}
            AND {_DUCK_DOT.format(a="embedding", b="embedding")} <> 0),
    scored AS (
      SELECT q.query_id, c.vec_id,
             {_DUCK_DOT.format(a="q.q_emb", b="c.embedding")}
               / sqrt({_DUCK_DOT.format(a="q.q_emb", b="q.q_emb")}
                      * {_DUCK_DOT.format(a="c.embedding", b="c.embedding")}) AS cos
      FROM q CROSS JOIN c
    )
    SELECT query_id, vec_id,
           CAST(floor(cos * 1000000) AS BIGINT) AS cos_ppm,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {TOP_K}
    """,
    tags=("llm", "similarity"),
)
def sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{TOP_K}: every query vector (vec_id <
    {N_QUERIES}, broadcast) against the whole corpus — the exactness
    baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    return topk_per_query(_scored(queries, corpus))


@query(
    "embed_centroids",
    oracle="""
    WITH comps AS (
      SELECT label,
             generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
      FROM embeddings
    )
    SELECT label, pos,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(q) AS DOUBLE) / count(*), 6) AS centroid_q
    FROM comps
    GROUP BY label, pos
    """,
    tags=("llm", "embedding", "centroid"),
)
def embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster centroid computation — the k-means / IVF-training
    update step — over QUANTIZED components: ``floor(v * 1000)`` maps
    each float32 to an integer (exact: the product fits a double, and
    floor has no rounding midpoints), so the cross-row sum is
    associative and engine/order-independent.  Raw float centroids
    cannot be exact-checked: their sum depends on partial-aggregation
    order.  Long format (label, pos) keys the shuffle — |labels| x
    dims cells, partial-aggregated map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * 1000).cast("bigint").alias("q"),
    )
    return comps.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        F.round(F.sum("q").cast("double") / F.count("*"), 6).alias("centroid_q"),
    )


IVF_TOP_K = 5


@query(
    "sim_search_ivf",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb, label
               FROM embeddings WHERE vec_id < {N_QUERIES}
                 AND {_DUCK_DOT.format(a="embedding", b="embedding")} <> 0),
    c AS (SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id >= {N_QUERIES}
            AND {_DUCK_DOT.format(a="embedding", b="embedding")} <> 0),
    scored AS (
      SELECT q.query_id, c.vec_id,
             {_DUCK_DOT.format(a="q.q_emb", b="c.embedding")}
               / sqrt({_DUCK_DOT.format(a="q.q_emb", b="q.q_emb")}
                      * {_DUCK_DOT.format(a="c.embedding", b="c.embedding")}) AS cos
      FROM q JOIN c ON q.label = c.label
    )
    SELECT query_id, vec_id,
           CAST(floor(cos * 1000000) AS BIGINT) AS cos_ppm,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {IVF_TOP_K}
    """,
    tags=("llm", "similarity"),
)
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN top-{IVF_TOP_K}: probe only the query's coarse
    partition (cluster id in ``label``, nprobe=1).  The equi-join on
    label IS the inverted-file scan prune — at 100 TB, with the corpus
    written partitioned by cluster id, Catalyst turns it into
    partition pruning and each query touches |corpus|/|clusters| rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .filter(_norm_nonzero())
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            "label",
        )
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES).filter(_norm_nonzero())
    dot = F.expr(_SPARK_DOT.format(a="q_emb", b="embedding"))
    nq = F.expr(_SPARK_DOT.format(a="q_emb", b="q_emb"))
    nc = F.expr(_SPARK_DOT.format(a="embedding", b="embedding"))
    scored = corpus.join(F.broadcast(queries), "label").withColumn(
        "cos", dot / F.sqrt(nq * nc)
    )
    return topk_per_query(scored, k=IVF_TOP_K)


# ------------------------------------------------------------ k-means loop

KM_DIMS = 8     # first 8 components: keeps the unrolled oracle tractable;
                # the recurrence is dimension-wise, so the full-dim scale
                # path is the same code with KM_DIMS=64
KM_K = 4
KM_ITERS = 3
KM_SCALE = 1_000_000


def km_cte_chain() -> tuple[str, str]:
    """The unrolled Lloyd iterations as a chained-CTE prefix (DuckDB
    text) plus the name of the final-centroid CTE — shared by the
    ``embed_kmeans`` oracle and any oracle composing ON TOP of the
    learned clustering (``dedup_semantic_learned``)."""
    d = range(KM_DIMS)
    qcols = ", ".join(
        f"CAST(floor(CAST(embedding[{i+1}] AS DOUBLE) * {KM_SCALE}) AS BIGINT)"
        f" AS q{i}"
        for i in d
    )
    sql = [
        f"WITH pts AS (SELECT vec_id, {qcols} FROM embeddings"
        f" WHERE len(embedding) >= {KM_DIMS})",
        # deterministic init: integer mean per (vec_id % K) slice
        f"c0 AS (SELECT vec_id % {KM_K} AS cid, "
        + ", ".join(f"CAST(sum(q{i}) // count(*) AS BIGINT) AS c{i}" for i in d)
        + " FROM pts GROUP BY 1)",
    ]
    prev = "c0"
    for it in range(1, KM_ITERS + 1):
        dist = " + ".join(f"(p.q{i} - c.c{i}) * (p.q{i} - c.c{i})" for i in d)
        sql.append(
            f"a{it} AS (SELECT p.*, arg_min(c.cid, ({dist}) * {KM_K} + c.cid)"
            f" AS cid FROM pts p CROSS JOIN {prev} c GROUP BY ALL)"
        )
        sql.append(
            f"m{it} AS (SELECT cid, count(*) AS n, "
            + ", ".join(f"CAST(sum(q{i}) // count(*) AS BIGINT) AS c{i}" for i in d)
            + f" FROM a{it} GROUP BY cid)"
        )
        # empty cluster keeps its previous centroid (n = 0)
        sql.append(
            f"c{it} AS (SELECT p.cid, COALESCE(m.n, 0) AS n, "
            + ", ".join(f"COALESCE(m.c{i}, p.c{i}) AS c{i}" for i in d)
            + f" FROM {prev} p LEFT JOIN m{it} m USING (cid))"
        )
        prev = f"c{it}"
    return ",\n".join(sql), prev


def _km_oracle() -> str:
    """Unrolled Lloyd iterations as chained CTEs — the declarative
    mirror of the Spark driver loop.  Fixed iteration count makes the
    unroll finite; every quantity is BIGINT (floor-quantized inputs,
    integer-floor centroid means, squared integer distances), so both
    engines compute the identical trajectory."""
    chain, prev = km_cte_chain()
    out = ", ".join(f"c{i}" for i in range(KM_DIMS))
    return (
        chain
        + f"\nSELECT cid AS cluster_id, CAST(n AS BIGINT) AS n_points, {out}"
        f" FROM {prev}"
    )


def km_quantized_points(emb: DataFrame) -> DataFrame:
    """Floor-quantized first-{KM_DIMS}-component point table — the
    shared input of the fit loop and any post-fit assignment pass.

    spread() fans the quantization off the fixture's single input
    split (no-op at scale); localCheckpoint materializes the compact
    (vec_id, q0..q{KM_DIMS}) integer rows ONCE, because km_fit's
    Lloyd loop runs {KM_ITERS}+1 full aggregation passes over this
    table — without it every iteration re-reads the parquet and
    re-quantizes on however many splits the scan planned (locally:
    one).  The checkpoint is the canonical iterative-reuse artifact,
    same discipline as connected_components' per-round state."""
    from downloader_spark.io import spread

    d = range(KM_DIMS)
    return (
        spread(emb, key="vec_id")
        .filter(F.size("embedding") >= KM_DIMS)
        .select(
            "vec_id",
            *[
                F.expr(
                    f"CAST(floor(CAST(embedding[{i}] AS DOUBLE) * {KM_SCALE})"
                    " AS BIGINT)"
                ).alias(f"q{i}")
                for i in d
            ],
        )
        .localCheckpoint()
    )


def km_assign_expr(cents: dict[int, list[int]]) -> str:
    """Nearest-centroid CASE expression (ties to the lower cluster
    id) with the centroids inlined as codegen'd literals."""
    d = range(KM_DIMS)
    dists = [
        " + ".join(
            f"(q{i} - CAST({cents[c][i]} AS BIGINT))"
            f" * (q{i} - CAST({cents[c][i]} AS BIGINT))"
            for i in d
        )
        for c in range(KM_K)
    ]
    assign_expr = "CASE "
    for c in range(KM_K - 1):
        conds = " AND ".join(
            f"({dists[c]}) <= ({dists[o]})" for o in range(c + 1, KM_K)
        )
        assign_expr += f"WHEN {conds} THEN {c} "
    assign_expr += f"ELSE {KM_K - 1} END"
    return assign_expr


def km_fit(pts: DataFrame) -> tuple[dict[int, list[int]], dict[int, int]]:
    """The {KM_ITERS}-iteration Lloyd driver loop: returns the final
    centroids and per-cluster sizes.  Each iteration collects only
    k x dims integers; no point ever leaves the executors."""
    d = range(KM_DIMS)
    init = (
        pts.groupBy((F.col("vec_id") % KM_K).alias("cid"))
        .agg(
            F.count("*").alias("n"),
            *[F.expr(f"sum(q{i}) DIV count(*)").alias(f"c{i}") for i in d],
        )
        .collect()
    )
    cents = {int(r.cid): [int(r[f"c{i}"]) for i in d] for r in init}
    # a slice can be empty (degenerate/empty corpus): seed it at the
    # origin so the loop and output stay total over all k clusters
    for c in range(KM_K):
        cents.setdefault(c, [0] * KM_DIMS)
    n_by_cid = {c: 0 for c in range(KM_K)}
    for _ in range(KM_ITERS):
        upd = (
            pts.select(
                *[f"q{i}" for i in d],
                F.expr(km_assign_expr(cents)).alias("cid"),
            )
            .groupBy("cid")
            .agg(
                F.count("*").alias("n"),
                *[F.expr(f"sum(q{i}) DIV count(*)").alias(f"c{i}") for i in d],
            )
            .collect()
        )
        n_by_cid = {c: 0 for c in range(KM_K)}
        for r in upd:  # emptied clusters keep their previous centroid
            cents[int(r.cid)] = [int(r[f"c{i}"]) for i in d]
            n_by_cid[int(r.cid)] = int(r.n)
    return cents, n_by_cid


@query(
    "embed_kmeans",
    oracle=_km_oracle(),
    tags=("llm", "embedding", "iterative", "ml"),
)
def embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KM_ITERS} full Lloyd iterations of k-means (k={KM_K}) over the
    first {KM_DIMS} embedding components — the training LOOP, where
    embed_centroids is one update step.  Every iteration: assign each
    vector to its nearest centroid by exact integer squared distance
    (floor-quantized components, ties to the lower cluster id), then
    recompute centroids as integer-floor means; an emptied cluster
    keeps its previous centroid.  Deterministic init (integer mean of
    each vec_id % {KM_K} slice) replaces random seeding so the whole
    trajectory — not just the final state — is identical in both
    engines; the oracle unrolls the same {KM_ITERS} iterations as
    chained CTEs.

    The Spark side is the canonical distributed k-means shape: the
    per-iteration collect moves only k x dims integers (the
    centroids) to the driver and inlines them as codegen'd literals
    in the next assignment pass, so each iteration is ONE map-side-
    combinable aggregation over the points — no point ever leaves
    the executors, and iteration cost is O(points x k x dims) scan
    work regardless of cluster count."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = km_quantized_points(emb)
    cents, n_by_cid = km_fit(pts)
    rows = [(c, n_by_cid[c], *cents[c]) for c in range(KM_K)]
    schema = "cluster_id long, n_points long, " + ", ".join(
        f"c{i} long" for i in range(KM_DIMS)
    )
    return spark.createDataFrame(rows, schema)


GRID_CELL = 100  # milli-unit cell edge for the spatial grid
GRID_OFF = 100_000  # shift coords positive so trunc-div == floor-div


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, label,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS xi,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT) AS yi
      FROM embeddings
    ),
    q AS (SELECT * FROM pts WHERE label = 0),
    c AS (SELECT vec_id, xi, yi,
                 (xi + {GRID_OFF}) // {GRID_CELL} AS cx,
                 (yi + {GRID_OFF}) // {GRID_CELL} AS cy
          FROM pts WHERE label <> 0),
    probes AS (
      SELECT q.vec_id AS qid, q.xi, q.yi,
             ((q.xi + {GRID_OFF}) // {GRID_CELL}) + dx.d AS cx,
             ((q.yi + {GRID_OFF}) // {GRID_CELL}) + dy.d AS cy
      FROM q
      CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS d) dx
      CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS d) dy
    ),
    cand AS (
      SELECT p.qid, c.vec_id AS nid,
             (p.xi - c.xi) * (p.xi - c.xi)
             + (p.yi - c.yi) * (p.yi - c.yi) AS d2
      FROM probes p JOIN c ON c.cx = p.cx AND c.cy = p.cy
    )
    SELECT qid, nid, d2
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY qid ORDER BY d2, nid) = 1
    """,
    tags=("similarity", "spatial", "join", "grid"),
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed nearest-neighbor join over 2-D points (the
    spatial-join pattern: geohash/S2-cell bucketing reduced to its
    arithmetic core).  Points are the first two embedding
    components floor-quantized to milli-units; label-0 vectors are
    the queries.  Each query explodes to its 3x3 neighborhood of
    {GRID_CELL}-milli cells, candidates equi-join ON THE CELL ID
    (never a distance cross-join), and a struct-min keeps the
    nearest candidate by exact integer squared distance with the
    tie pinned to the lowest id.  Queries whose 3x3 neighborhood is
    empty drop out (the documented grid approximation — a cell
    radius bounds the search, exactly like a geohash prefix join).

    Coordinates shift by +{GRID_OFF} before the cell division:
    DuckDB's // floors while Spark's DIV truncates toward zero, so
    negative coordinates would land in different cells; offsetting
    positive makes the two identical.  Scale: 9 probe rows per
    query, uniform cell keys, the candidate join is a plain hash
    join — the 100 TB shape for any fixed-radius spatial match."""
    pts = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000) AS BIGINT)").alias(
            "xi"
        ),
        F.expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)").alias(
            "yi"
        ),
    )
    cell = lambda col: F.expr(f"({col} + {GRID_OFF}) DIV {GRID_CELL}")  # noqa: E731
    q = pts.filter(F.col("label") == 0)
    c = pts.filter(F.col("label") != 0).select(
        F.col("vec_id").alias("nid"),
        F.col("xi").alias("cxi"),
        F.col("yi").alias("cyi"),
        cell("xi").alias("cx"),
        cell("yi").alias("cy"),
    )
    d = spark.range(-1, 2).select(F.col("id").alias("d"))
    probes = (
        q.crossJoin(F.broadcast(d.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(d.select(F.col("d").alias("dy"))))
        .select(
            F.col("vec_id").alias("qid"),
            "xi",
            "yi",
            (cell("xi") + F.col("dx")).alias("cx"),
            (cell("yi") + F.col("dy")).alias("cy"),
        )
    )
    cand = probes.join(c, ["cx", "cy"]).select(
        "qid",
        "nid",
        (
            (F.col("xi") - F.col("cxi")) * (F.col("xi") - F.col("cxi"))
            + (F.col("yi") - F.col("cyi")) * (F.col("yi") - F.col("cyi"))
        ).alias("d2"),
    )
    return (
        cand.groupBy("qid")
        .agg(F.min(F.struct("d2", "nid")).alias("m"))
        .select("qid", F.col("m.nid").alias("nid"), F.col("m.d2").alias("d2"))
    )


# Product quantization: M subspaces over the 64-dim embeddings, each
# coded against K deterministic anchor codewords.
PQ_M = 4
PQ_SUBDIM = 16  # 64 / PQ_M
PQ_K = 8


@query(
    "embed_pq",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qarr
      FROM embeddings
    ),
    anchors AS (
      SELECT qarr AS aarr,
             CAST(row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT)
               AS code
      FROM q
      QUALIFY code < {PQ_K}
    ),
    subs AS (
      SELECT vec_id, CAST(m AS BIGINT) AS m,
             qarr[CAST(m * {PQ_SUBDIM} + 1 AS BIGINT):
                  CAST((m + 1) * {PQ_SUBDIM} AS BIGINT)] AS sv
      FROM q, unnest(generate_series(0, {PQ_M - 1})) AS t(m)
    ),
    scored AS (
      SELECT s.vec_id, s.m, a.code,
             list_reduce(
               list_transform(list_zip(s.sv,
                 a.aarr[CAST(s.m * {PQ_SUBDIM} + 1 AS BIGINT):
                        CAST((s.m + 1) * {PQ_SUBDIM} AS BIGINT)]),
                 p -> (p[1] - p[2]) * (p[1] - p[2])),
               (x, y) -> x + y) AS dist
      FROM subs s CROSS JOIN anchors a
    ),
    best AS (
      SELECT vec_id, m,
             min({{'dist': dist, 'code': code}}) AS b
      FROM scored GROUP BY vec_id, m
    )
    SELECT vec_id,
           CAST(max(CASE WHEN m = 0 THEN b.code END) AS BIGINT) AS code_0,
           CAST(max(CASE WHEN m = 1 THEN b.code END) AS BIGINT) AS code_1,
           CAST(max(CASE WHEN m = 2 THEN b.code END) AS BIGINT) AS code_2,
           CAST(max(CASE WHEN m = 3 THEN b.code END) AS BIGINT) AS code_3,
           CAST(sum(b.dist) AS BIGINT) AS quant_err
    FROM best
    GROUP BY vec_id
    """,
    tags=("llm", "similarity", "ann", "quantization"),
)
def embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — THE 100 TB ANN memory technique: each
    64-dim embedding splits into M=4 subvectors, each coded as its
    nearest of K=8 codewords, compressing a vector to 4 small codes
    (here 12 bits) plus a measured quantization error.  At scale the
    codes support asymmetric-distance search over billions of
    vectors; this operator is the encode step.

    Determinism: components quantize to floor(x*1000) BIGINTs
    (embed_kmeans' idiom) so subspace distances are exact integer
    sums of squares; codewords are the md5-smallest corpus vectors
    (reproducible, engine-independent — a trained codebook would
    plug into the same plan); argmin tie-breaks on code.

    Plan: the K x M codebook table is TINY and broadcasts; the
    corpus explodes x4 (subspaces), scores 8 codewords map-side, and
    ONE aggregation (argmin per (vec, m) then re-rolled per vec)
    lands the codes — the corpus shuffles only (vec_id, m, 8 dists)
    metadata, never embeddings."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000)"
            " AS BIGINT))"
        ).alias("qarr"),
    )
    w = Window.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    anchors = (
        q.withColumn("code", F.row_number().over(w) - 1)
        .filter(F.col("code") < PQ_K)
        .select(F.col("qarr").alias("aarr"), F.col("code").cast("long"))
    )
    subs = q.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
        "qarr",
    ).select(
        "vec_id",
        F.col("m").cast("long").alias("m"),
        F.expr(f"slice(qarr, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("sv"),
    )
    scored = subs.join(F.broadcast(anchors)).select(
        "vec_id",
        "m",
        "code",
        F.expr(
            f"aggregate(zip_with(sv,"
            f" slice(aarr, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM}),"
            f" (x, y) -> (x - y) * (x - y)),"
            f" CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("dist"),
    )
    best = scored.groupBy("vec_id", "m").agg(
        F.min(F.struct(F.col("dist"), F.col("code"))).alias("b")
    )
    return best.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == i, F.col("b.code")))
            .cast("long")
            .alias(f"code_{i}")
            for i in range(PQ_M)
        ],
        F.sum("b.dist").cast("long").alias("quant_err"),
    )
