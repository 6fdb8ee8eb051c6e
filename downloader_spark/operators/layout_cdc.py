"""Data-layout, CDC, graph-ranking, and data-quality operators:
Z-order clustering keys, MERGE-style change application, integer
PageRank, and a declarative expectation-check report (SURVEY.md §2.B
north star — the table-maintenance layer any 100 TB archive needs on
top of the reference's publish loop, common.go:103-121).

Cross-engine exactness: bit interleaving, md5-derived change
selection, ppm-scaled floor divisions — all integers.

Scale notes (100 TB):
- ``scalar_zorder`` is a pure projection (no shuffle): the Morton
  key is the standard multi-dimension clustering trick — writing
  sorted by zval gives every later scan tight min/max ranges on BOTH
  dimensions, which is what makes parquet row-group pruning work on
  2-D predicates.
- ``table_merge`` touches O(churn), not O(table): the snapshot side
  is semi-joined down to changed keys before the classifying join —
  at scale the change-key set rides a broadcast/bloom filter and the
  untouched 99.9% of the snapshot is never shuffled.
- ``graph_pagerank`` keeps the edge list hash-partitioned by source
  across all three unrolled iterations (one shuffle per iteration for
  the contribution aggregation — the irreducible PageRank shuffle);
  rank state is ppm integers, so there is no float drift across
  engines or iteration orders.
- ``dq_checks`` fuses all single-table expectations into ONE scan
  (conditional aggregates), plus one anti-join count for referential
  integrity — the Deequ-style validation pass (public AWS project)
  priced at two jobs regardless of check count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.plans.registry import query

# Z-order: bits per dimension (2 dims -> 2*ZBITS-bit Morton key).
ZBITS = 12
_ZMASK = (1 << ZBITS) - 1

# PageRank: damping 0.85 in ppt, 3 unrolled iterations, ppm ranks.
PR_ITERS = 3
PR_DAMP_PPT = 850
PR_BASE_PPM = 1_000_000


def _morton_terms(xcol: str, ycol: str, div: str = "DIV") -> str:
    """Sum-of-bits Morton interleave (integer div / % / multiply only;
    ``div`` is 'DIV' for Spark, '//' for DuckDB)."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"(({xcol} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ycol} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _morton_terms_bits(xcol: str, ycol: str) -> str:
    """Spark-side Morton interleave via shift/mask: identical value to
    _morton_terms for non-negative inputs ((x DIV 2^i) % 2 ==
    shiftright(x, i) & 1 when x >= 0), but each bit costs one shift +
    one AND instead of an integer division + modulo — measured ~2x on
    the scan-side z keys (r16), where the 2*ZBITS-term projection IS
    the stage.  DuckDB oracles keep the arithmetic form (the oracle
    never computes z at all in the range key, and the scalar key's
    oracle is engine-local)."""
    terms = []
    for i in range(ZBITS):
        terms.append(
            f"shiftleft(shiftright({xcol}, {i}) & 1, {2 * i})"
        )
        terms.append(
            f"shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1})"
        )
    return " + ".join(terms)


@query(
    "scalar_zorder",
    oracle=f"""
    WITH c AS (
      SELECT o_orderkey,
             o_custkey % {_ZMASK + 1} AS x,
             (epoch_us(o_orderdate) // 86400000000) % {_ZMASK + 1} AS y
      FROM orders
    )
    SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
           CAST({_morton_terms("x", "y", "//")} AS BIGINT) AS zval,
           CAST(({_morton_terms("x", "y", "//")}) // {1 << 16} AS BIGINT) AS zbucket
    FROM c
    """,
    tags=("scalar", "layout", "zorder"),
)
def scalar_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day):
    interleave the low {ZBITS} bits of each dimension so
    lexicographic order on ``zval`` is a space-filling curve — rows
    written in zval order give every parquet row-group tight min/max
    bounds on BOTH columns, which is what lets a 2-D predicate prune
    at 100 TB (the Delta/Iceberg OPTIMIZE ZORDER primitive, public
    technique).  ``zbucket`` (zval DIV 2^16) is the file-assignment
    key a layout job would repartitionByRange on.

    Pure projection — the interleave is {2 * ZBITS} shift/mask terms
    (value-identical to the oracle's DIV/%/multiply form for these
    non-negative inputs), whole-stage-codegen'd, no shuffle, no UDF."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.selectExpr(
        "o_orderkey",
        f"o_custkey % {_ZMASK + 1} AS x",
        f"(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000)"
        f" % {_ZMASK + 1} AS y",
    )
    z = _morton_terms_bits("x", "y")
    return c.selectExpr(
        "o_orderkey",
        "CAST(x AS BIGINT) AS x",
        "CAST(y AS BIGINT) AS y",
        f"CAST({z} AS BIGINT) AS zval",
        f"CAST(({z}) DIV {1 << 16} AS BIGINT) AS zbucket",
    )


@query(
    "table_merge",
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey, floor(o_totalprice * 100) AS cents,
             ({_duck_h60("CAST(o_orderkey AS VARCHAR)")}) % 10 AS b
      FROM orders
    ), changes AS (
      SELECT o_orderkey AS k, 'delete' AS action,
             CAST(NULL AS BIGINT) AS new_cents
      FROM h WHERE b = 0
      UNION ALL
      SELECT o_orderkey, 'update', CAST(cents + 1000 AS BIGINT)
      FROM h WHERE b IN (1, 2)
      UNION ALL
      SELECT o_orderkey + 10000000, 'insert', CAST(cents AS BIGINT)
      FROM h WHERE b = 3
    )
    SELECT c.k AS o_orderkey, c.action,
           CAST(s.cents AS BIGINT) AS old_cents,
           CASE WHEN c.action = 'delete' THEN NULL ELSE c.new_cents END
             AS new_cents
    FROM changes c LEFT JOIN h s ON s.o_orderkey = c.k
    """,
    tags=("cdc", "merge", "join"),
)
def table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style change application (the Delta/Iceberg MERGE INTO
    semantics as a batch operator): a deterministic change batch —
    md5-bucketed deletes, updates (+$10), and key-shifted inserts —
    classifies against the snapshot and emits the O(churn) merge
    manifest: (key, action, old_cents, new_cents).  table_diff is
    the inverse (derive changes from two snapshots); together they
    close the CDC round-trip.

    Scale: the classifying join touches only the change keys — the
    snapshot side would be semi-join/bloom-pruned before the join at
    scale (join_bloom_prune is that pattern as its own key), so the
    untouched bulk of a 100 TB table never shuffles.  All values are
    floor-cents integers; the change selection is the same md5 DIV
    bucketing every sampler in this repo uses."""
    orders = load_table(spark, sf_dir, "orders")
    h = orders.selectExpr(
        "o_orderkey",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
        f"({_spark_h60('CAST(o_orderkey AS STRING)')}) % 10 AS b",
    )
    deletes = h.filter("b = 0").selectExpr(
        "o_orderkey AS k", "'delete' AS action", "CAST(NULL AS BIGINT) AS new_cents"
    )
    updates = h.filter("b IN (1, 2)").selectExpr(
        "o_orderkey AS k", "'update' AS action", "CAST(cents + 1000 AS BIGINT) AS new_cents"
    )
    inserts = h.filter("b = 3").selectExpr(
        "o_orderkey + 10000000 AS k", "'insert' AS action", "CAST(cents AS BIGINT) AS new_cents"
    )
    changes = deletes.unionAll(updates).unionAll(inserts)
    snap = h.selectExpr("o_orderkey AS k", "cents AS old_cents")
    return (
        changes.join(snap, "k", "left")
        .select(
            F.col("k").alias("o_orderkey"),
            "action",
            F.col("old_cents").cast("long").alias("old_cents"),
            F.when(F.col("action") == "delete", F.lit(None).cast("long"))
            .otherwise(F.col("new_cents"))
            .alias("new_cents"),
        )
    )


def _pagerank_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer→supplier edges via orders ⋈ lineitem."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )


_PR_DUCK_EDGES = """
    edges AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)
"""


def _pr_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT n.node,
             CAST({1_000_000 - PR_DAMP_PPT * 1000} + {PR_DAMP_PPT} *
               COALESCE((SELECT sum(p.pr // d.outdeg)
                         FROM edges e JOIN {prev} p ON p.node = e.src
                         JOIN deg d ON d.src = e.src
                         WHERE e.dst = n.node), 0) // 1000 AS BIGINT) AS pr
      FROM nodes n
    )"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH {_PR_DUCK_EDGES},
    pr0 AS (SELECT node, CAST({PR_BASE_PPM} AS BIGINT) AS pr FROM nodes),
    {",".join(_pr_iter_sql(f"pr{i}", f"pr{i + 1}") for i in range(PR_ITERS))}
    SELECT node,
           CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END
             AS node_type,
           pr AS pr_ppm
    FROM pr{PR_ITERS}
    """,
    tags=("graph", "iterative", "pagerank"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph, integer-
    exact: {PR_ITERS} unrolled power iterations with damping 0.85,
    all rank state in ppm BIGINTs — per-edge contribution is
    pr DIV outdeg (floor), so both engines follow the identical
    trajectory (float PageRank is order-dependent and never
    hash-checkable).  Dangling-node mass (suppliers have no
    out-edges) is dropped, the standard simplification — identical
    on both sides.

    Scale shape: the edge list is computed once and reused across
    iterations; each iteration is one groupBy(dst) shuffle of edge
    contributions plus a broadcast-sized join of rank state — the
    irreducible PageRank cost.  The oracle recomputes the same
    {PR_ITERS} iterations as correlated-subquery CTEs — independent
    formulation, one answer.  Companion iterative operators:
    dedup_clusters (label propagation), embed_kmeans (Lloyd)."""
    # Materialize the edge table (and its two small derivatives) once:
    # composed into one final plan, the un-checkpointed lineage
    # re-derives the orders⋈lineitem DISTINCT — a fact-fact shuffle —
    # for every iteration (3x edges_deg + 4x nodes at PR_ITERS=3);
    # at 100 TB those are redundant fact shuffles.  A/B at sf0.1:
    # 2.44 s -> 2.18 s median locally, identical hashes (PERF.md r7).
    edges = _pagerank_edges(spark, sf_dir).localCheckpoint()
    # edges_deg and nodes depend only on edges, not on each other —
    # materialize the two checkpoints concurrently from driver threads
    # (guide §2.6) so the second chain back-fills the first's tail.
    from concurrent.futures import ThreadPoolExecutor

    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_ed = pool.submit(edges.join(deg, "src").localCheckpoint)
        f_no = pool.submit(
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint
        )
        edges_deg = f_ed.result()
        nodes = f_no.result()
    pr = nodes.withColumn("pr", F.lit(PR_BASE_PPM).cast("long"))
    base = 1_000_000 - PR_DAMP_PPT * 1000
    # zero-mass rows for nodes with no in-edges, unioned into the
    # contribution aggregate: sum(c) over (contributions ∪ one 0/node)
    # == COALESCE(mass, 0) of the former per-iteration LEFT JOIN
    # against nodes, so each iteration drops one join + one exchange
    # (3 SortMergeJoin → 1 join per hop).  The rank-state side of the
    # remaining join carries a SHUFFLE_HASH hint: |V|-bounded (pr,
    # outdeg) rows build the per-partition hash table and the |E|-row
    # edge table streams past without the sort-merge sort (guide §3.1)
    # — strategy, not config, so the driver's vanilla session plans it
    # identically.
    zero = nodes.select("node", F.lit(0).cast("long").alias("c"))
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(pr.hint("shuffle_hash"), edges_deg.src == pr.node)
            .select(F.col("dst").alias("node"), F.expr("pr DIV outdeg").alias("c"))
        )
        pr = (
            contrib.unionAll(zero)
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
            .select(
                "node",
                F.expr(
                    f"CAST({base} + {PR_DAMP_PPT} * mass DIV 1000"
                    " AS BIGINT)"
                ).alias("pr"),
            )
        )
    return pr.select(
        "node",
        F.when(F.col("node") >= 1_000_000, F.lit("supplier"))
        .otherwise(F.lit("customer"))
        .alias("node_type"),
        F.col("pr").alias("pr_ppm"),
    )


@query(
    "dq_checks",
    oracle="""
    WITH o AS (
      SELECT count(*) AS n,
             count(*) - count(DISTINCT o_orderkey) AS dup_keys,
             sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price,
             sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                       OR o_orderdate >= TIMESTAMP '2005-01-01'
                      THEN 1 ELSE 0 END) AS bad_dates,
             sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
               AS null_prio
      FROM orders
    ), fk AS (
      SELECT count(*) AS orphans
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT 'orderkey_unique' AS check_name, CAST(dup_keys AS BIGINT) AS metric,
           dup_keys = 0 AS passed FROM o
    UNION ALL
    SELECT 'totalprice_nonneg', CAST(neg_price AS BIGINT), neg_price = 0 FROM o
    UNION ALL
    SELECT 'orderdate_in_range', CAST(bad_dates AS BIGINT), bad_dates = 0 FROM o
    UNION ALL
    SELECT 'priority_not_null', CAST(null_prio AS BIGINT),
           null_prio * 100 <= n FROM o
    UNION ALL
    SELECT 'lineitem_fk_orders', CAST(orphans AS BIGINT), orphans = 0 FROM fk
    """,
    tags=("quality", "validation", "aggregate"),
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation report (the Deequ /
    Great-Expectations pattern, public projects): uniqueness,
    range, null-rate, and referential-integrity checks over the
    orders/lineitem pair, emitted as (check_name, metric, passed)
    rows — the validation gate an ingest pipeline runs before
    publishing a snapshot (the reference's equivalent gate is its
    HTTP-status + dedup check, common.go:87-129).

    Cost model: ALL single-table checks fuse into ONE conditional
    aggregation over one scan — adding a check adds a column, not a
    job; the FK check is one anti-join count (at scale: broadcast
    the key side or bloom-prune, the join_bloom_prune pattern).
    Output is O(checks), so the report is free to collect and gate
    on."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg_price"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2005-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("bad_dates"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)).alias(
            "null_prio"
        ),
    )
    fk = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphans"))
    )
    checks = o.selectExpr(
        "stack(4,"
        " 'orderkey_unique', dup_keys, dup_keys = 0,"
        " 'totalprice_nonneg', neg_price, neg_price = 0,"
        " 'orderdate_in_range', bad_dates, bad_dates = 0,"
        " 'priority_not_null', null_prio, null_prio * 100 <= n"
        ") AS (check_name, metric, passed)"
    ).selectExpr("check_name", "CAST(metric AS BIGINT) AS metric", "passed")
    fk_row = fk.selectExpr(
        "'lineitem_fk_orders' AS check_name",
        "CAST(orphans AS BIGINT) AS metric",
        "orphans = 0 AS passed",
    )
    return checks.unionAll(fk_row)


# Schema-drift split day: 2024-01-15 as an epoch day (events span
# January 2024) — window A is days before it, window B the rest.
DRIFT_SPLIT_DAY = 19_738
_DRIFT_COLS = ("event_type", "user_id", "value", "props")


@query(
    "dq_schema_drift",
    oracle=f"""
    WITH e AS (
      SELECT *, CASE WHEN epoch_us(ts) // 86400000000 < {DRIFT_SPLIT_DAY}
                     THEN 'A' ELSE 'B' END AS half
      FROM events
    ),
    m AS (
      {" UNION ALL ".join(
        f'''SELECT half, '{c}' AS col, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn,
             CAST(count(DISTINCT {c}) AS BIGINT) AS nd
             FROM e GROUP BY half'''
        for c in _DRIFT_COLS
      )}
    )
    SELECT a.col AS column_name,
           a.n AS n_a, b.n AS n_b,
           a.nn AS null_a, b.nn AS null_b,
           a.nd AS distinct_a, b.nd AS distinct_b,
           CAST(abs(b.nd - a.nd) * 1000000 // greatest(a.nd, 1) AS BIGINT)
             AS distinct_shift_ppm,
           CAST(CASE WHEN b.nd > a.nd THEN 1
                     WHEN b.nd < a.nd THEN -1 ELSE 0 END AS INT) AS shift_sign
    FROM m a JOIN m b ON a.col = b.col AND a.half = 'A' AND b.half = 'B'
    """,
    tags=("quality", "drift", "profile"),
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema/statistics drift report: the same profile (row count,
    null count, distinct count) computed over two time windows of the
    stream and diffed per column — the check a training pipeline runs
    before ingesting a new data drop ("did a field's cardinality or
    null rate move?").

    ONE scan: every per-column metric for BOTH halves fuses into a
    single conditional aggregation grouped by the half flag (the
    dq_checks fusion discipline — adding a column adds expressions,
    not jobs); the long-form metric table (2 halves x 4 columns) and
    the A-vs-B diff join are driver-scale.  The shift magnitude is
    floor-ppm on non-negative integers with a separate sign column —
    Spark's DIV truncates toward zero while DuckDB's // floors, so
    negative operands never enter a floor division.  The final result
    keeps only columns observed in BOTH halves (n_a/n_b non-NULL),
    mirroring the oracle's inner A-vs-B join when one window is empty
    (e.g. every event on one side of the split day)."""
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.expr("unix_micros(ts) DIV 86400000000") < DRIFT_SPLIT_DAY, "A"
    ).otherwise("B")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _DRIFT_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = ev.groupBy(half.alias("half")).agg(*aggs)
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _DRIFT_COLS)
    long = wide.selectExpr(
        "half",
        "n",
        f"stack({len(_DRIFT_COLS)}, {stack}) AS (col, nn, nd)",
    )
    # A-vs-B alignment is a conditional aggregation over the tiny long
    # table, NOT a self-join: consuming `long` twice would re-evaluate
    # its lineage and scan the events fact twice
    def _side(src: F.Column, h: str, alias: str) -> F.Column:
        return F.max(F.when(F.col("half") == h, src)).alias(alias)

    joined = long.groupBy("col").agg(
        _side(F.col("n"), "A", "n_a"),
        _side(F.col("n"), "B", "n_b"),
        _side(F.col("nn"), "A", "null_a"),
        _side(F.col("nn"), "B", "null_b"),
        _side(F.col("nd"), "A", "distinct_a"),
        _side(F.col("nd"), "B", "distinct_b"),
    )
    joined = joined.where(
        F.col("n_a").isNotNull() & F.col("n_b").isNotNull()
    )
    return joined.select(
        F.col("col").alias("column_name"),
        "n_a",
        "n_b",
        "null_a",
        "null_b",
        "distinct_a",
        "distinct_b",
        F.expr(
            "CAST(abs(distinct_b - distinct_a) * 1000000"
            " DIV greatest(distinct_a, 1) AS BIGINT)"
        ).alias("distinct_shift_ppm"),
        F.when(F.col("distinct_b") > F.col("distinct_a"), 1)
        .when(F.col("distinct_b") < F.col("distinct_a"), -1)
        .otherwise(0)
        .cast("int")
        .alias("shift_sign"),
    )
