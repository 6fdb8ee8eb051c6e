"""Iterative graph operator: connected-components clustering of the
near-duplicate pair graph (the canonicalization step after any pair
finder — "which docs are the SAME content group, transitively").

This is the engine's one genuinely ITERATIVE operator: Spark runs
min-label propagation to a fixpoint (driver-controlled loop, fully
distributed per round), while the DuckDB oracle computes the same
components with a recursive CTE — two independent algorithms, one
answer, so the hash check validates the fixpoint itself.

Scale notes: label propagation converges in O(component diameter)
rounds — near-dup clusters are shallow (dozens of docs, diameter
2-4), so a handful of rounds suffices; each round is one hash join +
aggregation on the edge list.  ``localCheckpoint`` truncates the
lineage so plans don't grow with rounds.  Adversarial long-chain
graphs that blow the round budget fall back to the
large-star/small-star alternation (_star_components, O(log n)
rounds, Kiveris et al. SoCC'14) — same per-round join shape, so the
100 TB posture is identical.

Reference analog: the reference's identity is a flat md5 equality
(file/api.go:53) — components of EXACT-dup edges are trivially the
md5 groups; this operator generalizes the identity to transitive
NEAR-dup similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import (
    EMBED_COS_T,
    SIGN_BITS,
    _DUCK_DOT,
    _DUCK_SIGN_BUCKET,
    embed_pairs,
    scaled_sign_bits,
)
from downloader_spark.plans.registry import query

MAX_ROUNDS = 15  # >> any real near-dup component diameter


def _star_components(sym: DataFrame, parts: int, max_rounds: int = 40) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    O(log n)-round path for ADVERSARIAL graphs whose diameter defeats
    plain label propagation (a 1M-hop chain needs 1M propagation
    rounds but ~20 star rounds).

    Each half-round rewires every node's neighbors to its local
    minimum m(u) = min(N(u) ∪ {u}): large-star moves strictly-larger
    neighbors, small-star the rest; both keep (u, m(u)) so a
    component can never fall apart, and every added edge stays inside
    u's component so components can never merge.  The per-node label
    min(N(u) ∪ {u}) is non-increasing, so an unchanged label sum
    after a full round is the fixpoint — at which point every node's
    local minimum IS its component minimum and doubles as the output.

    ``sym`` must be the symmetric (src, dst) edge set.  One join +
    one aggregation per half-round, lineage truncated per round —
    identical dataflow shape to the propagation path, just O(log n)
    of them."""
    sym = sym.filter(F.col("src") != F.col("dst"))
    prev_sum = None
    for _ in range(max_rounds):
        for phase_large in (True, False):
            m = sym.groupBy("src").agg(F.min("dst").alias("mn")).select(
                "src", F.least(F.col("mn"), F.col("src")).alias("m")
            )
            cond = F.col("dst") > F.col("src") if phase_large else (
                F.col("dst") < F.col("src")
            )
            moved = (
                sym.join(m, "src")
                .filter(cond)
                .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            )
            self_edge = m.filter(F.col("src") != F.col("m")).select(
                F.col("src").alias("a"), F.col("m").alias("b")
            )
            e = moved.union(self_edge).filter(F.col("a") != F.col("b"))
            sym = (
                e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
                .union(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))
                .distinct()
                .repartition(parts, "dst")
                .localCheckpoint()
            )
        labels = sym.groupBy("src").agg(F.min("dst").alias("mn")).select(
            "src", F.least(F.col("mn"), F.col("src")).alias("label")
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            return labels.select(F.col("src").alias("node"), F.col("label").alias("cluster_id"))
        prev_sum = new_sum
    raise RuntimeError(
        f"_star_components did not converge in {max_rounds} rounds — "
        "not expected for any graph (O(log n) bound); investigate"
    )


def connected_components(
    edges: DataFrame,
    max_rounds: int = MAX_ROUNDS,
    on_nonconverge: str = "star",
) -> DataFrame:
    """(node, cluster_id=min node id in its component) for every node
    appearing in ``edges`` (columns: a, b).

    Min-label propagation: every node starts labelled with itself;
    each round a node takes the minimum label among itself and its
    neighbors; the fixpoint assigns every component its minimum node
    id — a unique, partition-independent answer.

    ``on_nonconverge`` governs the pathological case where the
    component diameter exceeds ``max_rounds`` (a >15-hop chain —
    never a real near-dup cluster shape): "star" (default) reruns
    with the O(log n) large-star/small-star alternation and still
    returns the exact components; "raise" keeps the strict behavior
    (a silent non-fixpoint would split components, so there is no
    silent option).

    The per-round joins run at a partition count sized to the edge
    list (~100k edges/partition, floor 2): iterative jobs pay fixed
    per-task scheduling cost EVERY round, so a small graph on the
    session's default shuffle width wastes task launches (measured
    ~10% here; the dominant round cost is checkpoint materialization,
    which is the price of bounded lineage).  Big graphs widen
    naturally with the edge count."""
    from pyspark.sql import Observation

    # Counts and convergence sums ride ON each round's checkpoint
    # materialization via observe() (CollectMetrics) — the graph_scc
    # posture: iterative jobs here are driver-job-latency bound, so
    # every separate agg-collect per round is a whole extra job.
    obs_e = Observation()
    sym0 = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    spark = sym0.sparkSession
    default_parts = spark.sparkContext.defaultParallelism
    n_edges = obs_e.get["n"]  # rode the checkpoint materialization
    parts = max(2, min(default_parts, n_edges // 100_000 + 2))
    sym = sym0.repartition(parts, "dst").localCheckpoint()
    sym0.unpersist()
    obs0 = Observation()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .repartition(parts, "node")
        .observe(obs0, F.sum("label").alias("s"))
        .localCheckpoint()
    )
    converged = False
    # labels start as node ids and only ever DECREASE, so the label sum
    # is strictly monotone until the fixpoint: an unchanged sum IS
    # convergence
    prev_sum = obs0.get["s"]
    for _ in range(max_rounds):
        # Round shape (r16): UNION + groupBy-min instead of the
        # original groupBy(dst-neighbor min) + left-join + least —
        # identical fixpoint (each node's new label = min of its own
        # and its in-neighbors'; the union's left branch keeps every
        # node's row), one join + one aggregation instead of two
        # joins.  sym (dst-partitioned) and labels (node-partitioned,
        # same width) are co-partitioned, so the join itself plans no
        # exchange; SHUFFLE_HASH builds the V-bounded label side as a
        # hash table instead of sort-merging both sides every round
        # (the graph_pagerank posture).
        prop = sym.join(
            labels.hint("shuffle_hash"), sym.dst == labels.node
        ).select(F.col("src").alias("node"), "label")
        obs = Observation()
        new_labels = (
            labels.unionAll(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint()  # truncate lineage each round
        )
        new_sum = obs.get["s"]
        labels.unpersist()  # free the previous round's cached blocks
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        if on_nonconverge == "star":
            # A graph whose diameter exceeds the round budget is the
            # adversarial long-chain case — rerun with the O(log n)
            # large-star/small-star alternation instead of silently
            # returning a non-fixpoint (which would split components).
            labels.unpersist()
            return _star_components(sym, parts)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(component diameter exceeds the round budget); raise max_rounds "
            "or pass on_nonconverge='star' for adversarial graphs"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding, {_DUCK_SIGN_BUCKET} AS bucket
      FROM embeddings
      WHERE {_DUCK_DOT.format(a="embedding", b="embedding")} <> 0
    ),
    pairs AS (
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
             {_DUCK_DOT.format(a="x.embedding", b="y.embedding")} AS dot,
             {_DUCK_DOT.format(a="x.embedding", b="x.embedding")} AS na,
             {_DUCK_DOT.format(a="y.embedding", b="y.embedding")} AS nb
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    ),
    e AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      WHERE dot / sqrt(na * nb) >= {EMBED_COS_T}
    ),
    bidir AS (
      SELECT a, b FROM e UNION SELECT b, a FROM e
      UNION SELECT a, a FROM e UNION SELECT b, b FROM e
    ),
    reach(a, b) AS (
      SELECT a, b FROM bidir
      UNION
      SELECT r.a, d.b FROM reach r JOIN bidir d ON r.b = d.a
    )
    SELECT a AS vec_id, min(b) AS cluster_id
    FROM reach GROUP BY a
    """,
    tags=("llm", "dedup", "graph", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-duplicate clusters over the embedding-cosine
    pair graph (dedup_embed's pairs): every vector that shares a
    near-dup edge — directly or through intermediates — gets the same
    ``cluster_id`` (the component's minimum vec_id), which is the
    canonical-representative assignment a dedup pipeline keeps.

    Spark side: iterative min-label propagation (connected_components
    above).  Oracle side: a recursive-CTE transitive closure.  The two
    algorithms share nothing but the edge list, so a matching hash
    certifies the fixpoint, not just the plumbing."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embed_pairs(emb, sign_bits=scaled_sign_bits(emb)).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
    )
    return connected_components(pairs).select(
        F.col("node").alias("vec_id"), "cluster_id"
    )


@query(
    "dedup_cluster_stats",
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding, {_DUCK_SIGN_BUCKET} AS bucket
      FROM embeddings
      WHERE {_DUCK_DOT.format(a="embedding", b="embedding")} <> 0
    ),
    pairs AS (
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
             {_DUCK_DOT.format(a="x.embedding", b="y.embedding")} AS dot,
             {_DUCK_DOT.format(a="x.embedding", b="x.embedding")} AS na,
             {_DUCK_DOT.format(a="y.embedding", b="y.embedding")} AS nb
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    ),
    e AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      WHERE dot / sqrt(na * nb) >= {EMBED_COS_T}
    ),
    bidir AS (
      SELECT a, b FROM e UNION SELECT b, a FROM e
      UNION SELECT a, a FROM e UNION SELECT b, b FROM e
    ),
    reach(a, b) AS (
      SELECT a, b FROM bidir
      UNION
      SELECT r.a, d.b FROM reach r JOIN bidir d ON r.b = d.a
    ),
    comp AS (SELECT a AS vec_id, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS cluster_size,
           CAST(max(vec_id) AS BIGINT) AS max_member
    FROM comp GROUP BY cluster_id
    """,
    tags=("llm", "dedup", "graph", "iterative"),
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster size + extremal member of the near-dup components —
    the table a dedup policy reads ("keep one per cluster" shrinkage
    = Σ(size-1); size outliers flag template/boilerplate families
    worth inspecting before deleting).  One row per component keeps
    the checked surface as wide as the cluster count, and max_member
    anchors the hash to membership, not just cardinality.

    Reuses the full iterative pipeline (embed_pairs → min-label
    propagation with the star fallback) and adds one aggregation over
    its output — the point is that the ITERATIVE operator's result
    composes downstream like any DataFrame, lineage truncation and
    all."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embed_pairs(emb, sign_bits=scaled_sign_bits(emb)).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
    )
    return (
        connected_components(pairs)
        .groupBy(F.col("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max("node").alias("max_member"),
        )
    )


# --- Triangle counting (degree-ordered) ------------------------------

# Co-supplier graph: suppliers are linked when they both ship a
# high-quantity line (l_quantity >= TRI_MIN_QTY) in the same order.
TRI_MIN_QTY = 45
# 100 TB guard: an order touched by a pathological number of suppliers
# would generate O(k^2) edges; cap the per-order fanout (the same
# df-cap idea that bounds the ngram inverted index).
TRI_ORDER_CAP = 20


@query(
    "graph_triangles",
    oracle=f"""
    WITH su AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
      FROM lineitem WHERE l_quantity >= {TRI_MIN_QTY}
    ),
    capped AS (
      SELECT ok, s FROM (
        SELECT ok, s, count(*) OVER (PARTITION BY ok) AS n_s FROM su
      ) WHERE n_s <= {TRI_ORDER_CAP}
    ),
    e AS (
      SELECT DISTINCT a.s AS a, b.s AS b
      FROM capped a JOIN capped b ON a.ok = b.ok AND a.s < b.s
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    node_tri AS (
      SELECT node, CAST(count(*) AS BIGINT) AS tri_count FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY node
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e
      ) GROUP BY node
    )
    SELECT d.node AS s_suppkey, d.degree,
           COALESCE(t.tri_count, 0) AS tri_count
    FROM deg d LEFT JOIN node_tri t ON t.node = d.node
    """,
    tags=("graph", "triangles", "join"),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting over the co-supplier graph (supplier
    pairs shipping high-quantity lines in the same order) — the core
    graph-mining primitive behind clustering coefficients and
    community detection.

    Spark runs the DEGREE-ORDERED algorithm (each undirected edge is
    oriented from the (degree, id)-smaller endpoint to the larger, so
    every wedge is enumerated exactly once from its lowest-rank
    corner; out-degrees are bounded by O(sqrt(m)), which is what
    keeps the wedge join polynomial on skewed graphs at 100 TB).  The
    oracle instead uses the naive ID-ORDERED 3-way self-join — two
    independent enumeration orders agreeing on every per-node count.

    Plan shape: the per-order fanout cap is a window COUNT over the
    same ok-partitioning the pair self-join needs, so the exchange is
    reused; the degree table (|V| rows) broadcasts onto the edge
    list; the closure check is a join on the oriented edge list
    itself.  No cartesian anywhere (suite-wide plan gate)."""
    li = load_table(spark, sf_dir, "lineitem")
    su = (
        li.filter(F.col("l_quantity") >= TRI_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    wn = Window.partitionBy("ok")
    capped = su.withColumn("n_s", F.count(F.lit(1)).over(wn)).filter(
        F.col("n_s") <= TRI_ORDER_CAP
    )
    a = capped.select("ok", F.col("s").alias("a"))
    b = capped.select("ok", F.col("s").alias("b"))
    e = (
        a.join(b, "ok")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        # e feeds the degree table AND the orientation join: pin the
        # capped self-join + distinct to one pass (kcore/common_neighbors
        # edge-recipe posture)
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select("b"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        # deg feeds two broadcast sides and the final report join
        .localCheckpoint(eager=False)
    )
    # Orient each edge by (degree, id) rank: low -> high.
    ranked = (
        e.join(F.broadcast(deg.withColumnRenamed("degree", "da")), e.a == deg.node)
        .drop("node")
        .join(
            F.broadcast(
                deg.select(F.col("node"), F.col("degree").alias("db"))
            ),
            e.b == F.col("node"),
        )
        .drop("node")
    )
    oriented = ranked.select(
        F.when(
            F.struct(F.col("da").alias("d"), F.col("a").alias("i"))
            < F.struct(F.col("db").alias("d"), F.col("b").alias("i")),
            F.struct(
                F.col("a").alias("lo"),
                F.col("b").alias("hi"),
                F.col("db").alias("dhi"),
            ),
        )
        .otherwise(
            F.struct(
                F.col("b").alias("lo"),
                F.col("a").alias("hi"),
                F.col("da").alias("dhi"),
            )
        )
        .alias("o")
    ).select(
        F.col("o.lo").alias("x"),
        F.col("o.hi").alias("y"),
        F.col("o.dhi").alias("dy"),
    )
    # The oriented edge list feeds THREE consumers (both wedge sides
    # and the closure probe); materialize it once so the capped
    # self-join + degree join lineage isn't re-evaluated per consumer
    # (same lineage-truncation discipline as connected_components).
    oriented = oriented.localCheckpoint()
    # Wedge = a pair of out-neighbors of the same low-rank corner x,
    # ordered y-before-z by the same (degree, id) rank; the closing
    # edge, if present, is necessarily oriented (y -> z).
    e1 = oriented.select("x", "y", "dy")
    e2 = oriented.select(
        F.col("x").alias("x2"), F.col("y").alias("z"), F.col("dy").alias("dz")
    )
    wedges = (
        e1.join(e2, e1.x == e2.x2)
        .filter(
            F.struct(F.col("dy").alias("d"), F.col("y").alias("i"))
            < F.struct(F.col("dz").alias("d"), F.col("z").alias("i"))
        )
        .select("x", "y", "z")
    )
    closing = oriented.select(F.col("x").alias("cy"), F.col("y").alias("cz"))
    tri = wedges.join(
        closing, (wedges.y == closing.cy) & (wedges.z == closing.cz)
    ).select("x", "y", "z")
    node_tri = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select("y"))
        .unionAll(tri.select("z"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_count"))
    )
    # node_tri is V-bounded (one row per triangle-bearing node) — same
    # broadcast class as the degree table the orientation join ships;
    # the hint is needed explicitly because the checkpointed deg leaf
    # carries no size statistics for the planner to decide from
    return (
        deg.join(F.broadcast(node_tri), "node", "left")
        .select(
            F.col("node").alias("s_suppkey"),
            "degree",
            F.coalesce("tri_count", F.lit(0).cast("long")).alias("tri_count"),
        )
    )
