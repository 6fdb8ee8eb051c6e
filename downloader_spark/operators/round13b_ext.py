"""Round-13 continuation keys (second batch).

Extends the codec and sketch families: a GIF87a/LZW dictionary codec
and an RFC 1951/1950 DEFLATE inflater — both from scratch in
downloader_spark.media — plus a theta-sketch set-intersection
estimator completing the mergeable-sketch story started by
``agg_kmv_distinct``.  (Reference lineage: payloads are opaque byte
streams at /root/reference/download/common.go:106; decode sits
strictly downstream of ingest, which is where these stages run.)
Registry contract as everywhere: a Spark-first plan plus an
independently-constructed DuckDB oracle, never the same SQL twice.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves stringified UDF type hints

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.plans.registry import query

# ------------------------------------------------------------------
# multimodal_gif_stats — GIF87a / variable-width LZW codec
# ------------------------------------------------------------------

_GIF_W = 24
_GIF_H = 16
_GIF_V = "(doc_id * 3 + 5 * x + 7 * y) % 256"


@query(
    "multimodal_gif_stats",
    oracle=f"""
    WITH grid AS (
      SELECT doc_id, x, y, {_GIF_V} AS v
      FROM documents,
           unnest(generate_series(0, {_GIF_H - 1})) AS a(y),
           unnest(generate_series(0, {_GIF_W - 1})) AS b(x)
    )
    SELECT doc_id,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
           CAST(max(CASE WHEN x = 0 AND y = 0 THEN v END) AS BIGINT)
               AS first_px,
           CAST(max(CASE WHEN x = {_GIF_W - 1} AND y = {_GIF_H - 1}
                    THEN v END) AS BIGINT) AS last_px
    FROM grid
    GROUP BY doc_id
    """,
    tags=("multimodal", "image", "gif", "lzw", "mapInPandas"),
)
def multimodal_gif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DICTIONARY compression through real bytes: each doc's
    deterministic {h}x{w} index plane is written as a complete GIF87a
    file (256-entry global palette, 255-byte sub-block framing) whose
    image stream is real variable-width LZW — 9..12-bit codes,
    CLEAR/EOI, width growth as the dictionary fills, the KwKwK
    self-reference case — then parsed and LZW-decoded back inside the
    Arrow stage (media.encode_gif_gray / decode_gif_gray, both from
    scratch).  Pixel stats are emitted from the RECONSTRUCTED plane,
    so any drift anywhere in the bit packing, width schedule or
    dictionary discipline lands a wrong pixel.

    Differential: the oracle recomputes the plane closed-form from
    the generator and never sees a byte.

    Shape: map-only Arrow stage over the repartitioned key column
    (the repo's codec posture); at 100 TB the synthesis select
    becomes a binaryFile scan partitioned by object — pixels never
    cross an exchange, only the per-doc stat rows do."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_gif_gray, encode_gif_gray

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)
    w, h = _GIF_W, _GIF_H

    def run(batches):
        yy, xx = np.mgrid[0:h, 0:w]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                idx = ((int(doc_id) * 3 + 5 * xx + 7 * yy) % 256).astype(
                    np.uint8
                )
                back = decode_gif_gray(encode_gif_gray(idx))
                assert back.shape == (h, w)
                out.append(
                    (
                        int(doc_id),
                        int(back.astype(np.int64).sum()),
                        int(np.unique(back).size),
                        int(back[0, 0]),
                        int(back[h - 1, w - 1]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "px_sum",
                    "n_distinct",
                    "first_px",
                    "last_px",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, px_sum long, n_distinct long, first_px long, last_px long",
    )


# ------------------------------------------------------------------
# multimodal_inflate_stats — RFC 1951/1950 DEFLATE decode
# ------------------------------------------------------------------

# payload: length 240 + doc_id % 64; byte i = 32 + ((doc_id % 41) +
# 3 * (i % 29)) % 64 — period-29 structure so LZ77 finds real
# back-references; compression level doc_id % 10 walks every zlib
# level, so stored (0), fixed- and dynamic-Huffman blocks all occur
# across the corpus.
_INF_L = "(240 + doc_id % 64)"
_INF_B = "(32 + ((doc_id % 41) + 3 * (i % 29)) % 64)"


@query(
    "multimodal_inflate_stats",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, i, {_INF_B} AS b
      FROM documents,
           unnest(generate_series(0, 239 + 63)) AS u(i)
      WHERE i < {_INF_L}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum(b) AS BIGINT) AS byte_sum,
           CAST(count(DISTINCT b) AS BIGINT) AS n_distinct
    FROM bytes
    GROUP BY doc_id
    """,
    tags=("multimodal", "deflate", "zlib", "huffman", "mapInPandas"),
)
def multimodal_inflate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTROPY-CODED byte streams through a from-scratch inflater:
    each doc's deterministic payload is compressed with stdlib zlib
    at level ``doc_id % 10`` (real-world streams: level 0 emits
    stored blocks, low levels fixed-Huffman, high levels
    dynamic-Huffman with the RFC 1951 code-length meta-alphabet) and
    decompressed inside the Arrow stage by media.zlib_decode — a
    from-scratch RFC 1950/1951 decoder: zlib header check, stored /
    fixed / dynamic blocks, LZ77 length-distance back-references with
    overlapping copies, and a from-scratch Adler-32 trailer verify.
    Emitted stats come from the DECOMPRESSED bytes, so a single wrong
    bit anywhere in the Huffman or LZ77 path lands a wrong sum (and
    the Adler check fails the task loudly first).

    Differential: the oracle regenerates the plaintext closed-form
    from the byte generator; it never sees a compressed stream.

    Shape: map-only Arrow stage (codec posture); at 100 TB this is
    the decode half of reading gzip members or zlib pages off a
    binaryFile scan — payload bytes never cross an exchange."""
    import numpy as np
    import pandas as pd
    import zlib

    from downloader_spark.media import zlib_decode

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ln = 240 + d % 64
                i = np.arange(ln)
                payload = (32 + ((d % 41) + 3 * (i % 29)) % 64).astype(
                    np.uint8
                ).tobytes()
                comp = zlib.compress(payload, d % 10)
                back = zlib_decode(comp)
                assert back == payload  # bit-exact roundtrip, per doc
                arr = np.frombuffer(back, np.uint8)
                out.append(
                    (
                        d,
                        int(arr.size),
                        int(arr.astype(np.int64).sum()),
                        int(np.unique(arr).size),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "byte_sum", "n_distinct"]
            )

    return docs.mapInPandas(
        run, "doc_id long, n_bytes long, byte_sum long, n_distinct long"
    )


# ------------------------------------------------------------------
# agg_theta_intersect — theta-sketch set intersection
# ------------------------------------------------------------------

THETA_K = 16  # sketch size, matching agg_kmv_distinct's KMV_K
_THETA_REF = "purchase"  # the reference cohort every type intersects


@query(
    "agg_theta_intersect",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             {_duck_h60("concat('tht:', CAST(user_id AS VARCHAR))")} AS h
      FROM events
    ), sk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashed
    ), sketch AS (
      -- "sketch not full" detected AFTER the rank prefix (max rn < k),
      -- so the rank filter needs no pre-filter count window — mirrors
      -- the Spark side, where this keeps WindowGroupLimit eligible
      SELECT event_type, h,
             CASE WHEN max(rn) OVER (PARTITION BY event_type) < {THETA_K}
                  THEN 1152921504606846976
                  ELSE max(CASE WHEN rn = {THETA_K} THEN h END)
                       OVER (PARTITION BY event_type)
             END AS theta
      FROM sk WHERE rn <= {THETA_K}
    ), pairs AS (
      SELECT a.event_type,
             least(max(a.theta), max(b.theta)) AS theta,
             CAST(sum(CASE WHEN a.h < least(a.theta, b.theta)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_common
      FROM sketch a JOIN sketch b
        ON a.h = b.h AND b.event_type = '{_THETA_REF}'
      GROUP BY a.event_type
    ), exact AS (
      SELECT e.event_type,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact_both
      FROM events e
      WHERE EXISTS (SELECT 1 FROM events r
                    WHERE r.event_type = '{_THETA_REF}'
                      AND r.user_id = e.user_id)
      GROUP BY e.event_type
    )
    SELECT x.event_type, x.n_exact_both, p.n_common,
           CAST(CASE WHEN p.theta = 1152921504606846976 THEN p.n_common
                ELSE p.n_common * 288230376151711744 // p.theta * 4
                END AS BIGINT) AS theta_estimate
    FROM exact x JOIN pairs p ON x.event_type = p.event_type
    """,
    tags=("aggregate", "sketch", "intersection", "mergeable"),
)
def agg_theta_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET INTERSECTION (the Datasketches theta family):
    per event_type keep the {THETA_K} smallest 60-bit hashes of its
    user set plus theta = the k-th smallest (2^60 when the set is
    smaller than k, i.e. the sketch is exact); the overlap with the
    '{_THETA_REF}' cohort is estimated as
    |common hashes below min(theta_a, theta_b)| x 2^60 / min(theta).
    This is THE mergeable way to ask "how many users who purchased
    also did X" at 100 TB: sketches are tiny, union/intersect without
    rescanning, and the join here is sketch x sketch ({THETA_K} rows
    per group), never users x users.

    Determinism: both engines build the identical md5-derived hash
    set, so the normally-approximate estimate is bit-reproducible;
    the estimator is computed as n x 2^58 DIV theta x 4 to stay
    inside int64 (two deterministic floor bits, identical on both
    engines — mirrors agg_kmv_distinct's trick), with the
    both-sketches-exact case short-circuited to the exact overlap.
    The n_exact_both column carried alongside exposes the estimation
    error to the reader.

    Plan: one distinct reduction, a rank prefix (WindowGroupLimit
    keeps per-partition k-smallest ahead of the exchange), then a
    broadcast-sized sketch-sketch join."""
    ev = load_table(spark, sf_dir, "events")
    h = _spark_h60("concat('tht:', CAST(user_id AS STRING))")
    hashed = ev.select("event_type", F.expr(h).alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    wall = Window.partitionBy("event_type")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= THETA_K)
        # "not full" = max rn < k AFTER the prefix filter: no unbounded
        # count window before the filter, so the rank prefix keeps its
        # WindowGroupLimit per-partition pre-truncation
        .withColumn(
            "theta",
            F.when(
                F.max("rn").over(wall) < THETA_K,
                F.lit(1152921504606846976),
            ).otherwise(
                F.max(
                    F.when(F.col("rn") == THETA_K, F.col("h"))
                ).over(wall)
            ),
        )
        .select("event_type", "h", "theta")
    )
    ref = sketch.filter(F.col("event_type") == _THETA_REF).select(
        F.col("h").alias("rh"), F.col("theta").alias("rtheta")
    )
    pairs = (
        sketch.join(F.broadcast(ref), F.col("h") == F.col("rh"))
        .groupBy("event_type")
        .agg(
            F.least(F.max("theta"), F.max("rtheta")).alias("theta"),
            F.sum(
                F.when(
                    F.col("h") < F.least(F.col("theta"), F.col("rtheta")), 1
                ).otherwise(0)
            ).alias("n_common"),
        )
    )
    ref_users = (
        ev.filter(F.col("event_type") == _THETA_REF)
        .select("user_id")
        .distinct()
    )
    exact = (
        ev.join(F.broadcast(ref_users), "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact_both"))
    )
    return exact.join(pairs, "event_type").select(
        "event_type",
        "n_exact_both",
        "n_common",
        F.expr(
            "CAST(CASE WHEN theta = 1152921504606846976 THEN n_common"
            " ELSE n_common * 288230376151711744 DIV theta * 4"
            " END AS BIGINT)"
        ).alias("theta_estimate"),
    )


# ------------------------------------------------------------------
# multimodal_gzip_members — RFC 1952 multi-member container walk
# ------------------------------------------------------------------

# member j of doc d: length 100 + (d + j) % 50, byte i =
# 33 + ((d * 5 + j * 11 + 3 * i) % 90); member count 2 + d % 2.
# Levels walk (d + j) % 10 so stored/fixed/dynamic bodies all occur,
# and member 0 carries an FNAME header field (hand-built writer) so
# the FLG walk is exercised on real bytes, not just unit tests.
_GZ_M = "(2 + doc_id % 2)"
_GZ_L = "(100 + (doc_id + j) % 50)"
_GZ_B = "(33 + ((doc_id * 5 + j * 11 + 3 * i) % 90))"


@query(
    "multimodal_gzip_members",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, j, i, {_GZ_B} AS b
      FROM documents,
           unnest(generate_series(0, 2)) AS m(j),
           unnest(generate_series(0, 148)) AS u(i)
      WHERE j < {_GZ_M} AND i < {_GZ_L}
    )
    SELECT doc_id,
           CAST(count(DISTINCT j) AS BIGINT) AS n_members,
           CAST(count(*) AS BIGINT) AS total_bytes,
           CAST(sum(b) AS BIGINT) AS byte_sum
    FROM bytes
    GROUP BY doc_id
    """,
    tags=("multimodal", "gzip", "container", "crc32", "mapInPandas"),
)
def multimodal_gzip_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCATENATED-gzip container walk — the WARC layout every crawl
    corpus ships: each doc's blob is 2-3 RFC 1952 members (member 0
    hand-built with an FNAME header field, the rest stdlib
    gzip.compress at level (doc_id+j) % 10, so stored / fixed /
    dynamic DEFLATE bodies all occur), parsed back by
    media.gzip_members_decode — FLG bit-field walk, the from-scratch
    inflater for each body, and from-scratch CRC-32 + ISIZE trailer
    verification per member.  Stats come from the DECOMPRESSED
    payloads; the per-member CRC check fails the task loudly before a
    wrong byte could reach them.

    Differential: the oracle regenerates every member's plaintext
    closed-form from the byte generator and never sees a container.

    Shape: map-only Arrow stage (codec posture); at 100 TB this is
    exactly the WARC ingest path — a binaryFile scan of .gz objects
    whose member payloads never cross an exchange."""
    import gzip
    import numpy as np
    import pandas as pd

    from downloader_spark.media import encode_gzip_member, gzip_members_decode

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                blob = b""
                n_members = 2 + d % 2
                payloads = []
                for j in range(n_members):
                    ln = 100 + (d + j) % 50
                    i = np.arange(ln)
                    p = (33 + ((d * 5 + j * 11 + 3 * i) % 90)).astype(
                        np.uint8
                    ).tobytes()
                    payloads.append(p)
                    if j == 0:
                        blob += encode_gzip_member(
                            p, 6, name=f"doc-{d}.txt".encode()
                        )
                    else:
                        blob += gzip.compress(p, (d + j) % 10, mtime=0)
                back = gzip_members_decode(blob)
                assert back == payloads  # member-exact roundtrip
                arr = np.frombuffer(b"".join(back), np.uint8)
                out.append(
                    (
                        d,
                        len(back),
                        int(arr.size),
                        int(arr.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_members", "total_bytes", "byte_sum"],
            )

    return docs.mapInPandas(
        run, "doc_id long, n_members long, total_bytes long, byte_sum long"
    )


# ------------------------------------------------------------------
# agg_exp_histogram — exponential-bucket histogram + percentiles
# ------------------------------------------------------------------

# quarter-octave log2 buckets over value-in-cents: k = floor(log2(v))
# computed EXACTLY as length(bin(v)) - 1 (a string op both engines
# share — no float log at bucket boundaries), sub-bucket from integer
# division.  Bucket lower bound reported in quarter-cents:
# 2^k * (4 + sub), always an integer.
_EXPH_V = "greatest(1, CAST(floor(value * 100) AS BIGINT))"


@query(
    "agg_exp_histogram",
    oracle=f"""
    WITH v AS (
      SELECT event_type, {_EXPH_V} AS vc FROM events
    ), b AS (
      SELECT event_type,
             length(bin(vc)) - 1 AS k,
             vc * 4 // CAST(power(2, length(bin(vc)) - 1) AS BIGINT) - 4
               AS sub
      FROM v
    ), hist AS (
      SELECT event_type, k, sub,
             CAST(power(2, k) AS BIGINT) * (4 + sub) AS lb_qc,
             count(*) AS n
      FROM b GROUP BY event_type, k, sub
    ), c AS (
      SELECT event_type, lb_qc, n,
             sum(n) OVER (PARTITION BY event_type
                          ORDER BY k * 4 + sub) AS cum,
             sum(n) OVER (PARTITION BY event_type) AS total
      FROM hist
    )
    SELECT event_type,
           CAST(max(total) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(min(lb_qc) FILTER (cum >= (total * 50 + 99) // 100)
                AS BIGINT) AS p50_lb_qc,
           CAST(min(lb_qc) FILTER (cum >= (total * 90 + 99) // 100)
                AS BIGINT) AS p90_lb_qc,
           CAST(min(lb_qc) FILTER (cum >= (total * 99 + 99) // 100)
                AS BIGINT) AS p99_lb_qc
    FROM c
    GROUP BY event_type
    """,
    tags=("aggregate", "histogram", "exponential", "percentile", "sketch"),
)
def agg_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIAL-bucket histogram (the OpenTelemetry/HDR shape) with
    quantile reconstruction from bucket boundaries — how latency and
    value percentiles are actually computed over 100 TB of metrics:
    per (group, quarter-octave log2 bucket) counts are mergeable
    across shards and days, and p50/p90/p99 come from the cumulative
    bucket walk, never from a global sort.  The octave index is
    computed EXACTLY as length(bin(v)) - 1 — a string op both engines
    share bit-for-bit — so no float log2 can flip a boundary; the
    sub-bucket and the reported lower bounds are pure integer math.

    Plan: one map-side-combined shuffle to (type, bucket) — the
    histogram IS the shuffle combiner — then windows over the tiny
    per-type bucket table (~120 rows); the raw values never feed a
    sort.  Differential: the oracle builds the same buckets through
    DuckDB's own bin()/window stack, filter-aggregates vs Spark's
    conditional mins."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.expr(_EXPH_V).alias("vc")
    )
    b = v.select(
        "event_type",
        (F.length(F.bin(F.col("vc"))) - 1).alias("k"),
        F.expr(
            "vc * 4 DIV CAST(power(2, length(bin(vc)) - 1) AS BIGINT) - 4"
        ).alias("sub"),
    )
    hist = (
        b.groupBy("event_type", "k", "sub")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "lb_qc",
            F.expr("CAST(power(2, k) AS BIGINT) * (4 + sub)"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("k") * 4 + F.col("sub"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = hist.select(
        "event_type",
        "lb_qc",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wall).alias("total"),
    )
    agg = [
        F.max("total").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).alias("n_buckets"),
    ]
    for p in (50, 90, 99):
        agg.append(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr(f"(total * {p} + 99) DIV 100"),
                    F.col("lb_qc"),
                )
            )
            .cast("bigint")
            .alias(f"p{p}_lb_qc")
        )
    return c.groupBy("event_type").agg(*agg)


# ------------------------------------------------------------------
# graph_scc — strongly connected components (coloring algorithm)
# ------------------------------------------------------------------

# Planted DIRECTED graph over doc ids: 2-cycles (node pairs with
# mutual edges — each pair is one SCC) plus one cross edge per cycle
# pair j = (2j, 2j+1).  Edge direction alternates with j: even j
# points low cycle -> high cycle (forward colors never flood), odd j
# points high -> low (the high cycle's color FLOODS the low one, so
# the low cycle has no root in round 1 and is only extracted in
# outer round 2) — both code paths of the coloring algorithm fire by
# construction.  SCC id = the max node of the cycle = base + 1.
# (The algorithm is fully general — nothing below assumes cycle
# size; the planted diameter is kept minimal because the inner
# fixpoints cost one distributed join per HOP, and local-mode job
# latency, not data volume, dominates at bench scale.)


@query(
    "graph_scc",
    oracle="""
    SELECT CAST(d.doc_id AS BIGINT) AS node,
           CAST(CASE WHEN p.doc_id IS NULL THEN d.doc_id
                     ELSE d.doc_id - d.doc_id % 2 + 1 END AS BIGINT)
             AS scc_id
    FROM documents d
    LEFT JOIN documents p
      ON p.doc_id = d.doc_id - d.doc_id % 2 + (1 - d.doc_id % 2)
    """,
    tags=("graph", "scc", "iterative", "coloring"),
)
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRONGLY connected components via the distributed coloring
    algorithm (Orzan 2004 / the MaxColor scheme Spark graph libraries
    use): iterate (1) forward max-color propagation to fixpoint,
    (2) roots = nodes whose color is their own id, (3) backward
    root-reachability marking WITHIN each color class — the marked
    set of a root is exactly the root's SCC — then remove extracted
    SCCs and repeat on the remainder.  Directed reachability is the
    part plain connected-components (dedup_clusters) cannot see: the
    planted cross edges connect cycles weakly but never strongly, and
    with alternating direction they force both the no-flood fast
    path and the flooded two-round path.

    Differential: the algorithm sees ONLY the edge list; the oracle
    knows the planted cycles closed-form.  A wrong color flood, a
    backward mark that escapes its color class, or a missed root
    each land nodes in the wrong component.

    Scale: every step is an edge-colors equi-join + max aggregation
    (map-side combinable), lineage cut per iteration with
    localCheckpoint; the driver sees only 1-row monotone convergence
    sums, never node data.  Outer rounds are data-dependent (2 here);
    each round peels at least the globally-max-id SCC, and the inner
    fixpoints are bounded by the active subgraph's diameter."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("node")
    )
    nodes = docs.repartition(32, "node").localCheckpoint()
    # cycle edges: node <-> partner (node XOR 1, via arithmetic);
    # left_semi drops edges whose partner is absent (odd doc count /
    # non-contiguous ids), leaving those nodes singleton SCCs — the
    # oracle's LEFT JOIN expresses exactly that case
    ring = nodes.select(
        F.col("node").alias("src"),
        (
            F.col("node")
            - F.col("node") % 2
            + (1 - F.col("node") % 2)
        ).alias("dst"),
    ).join(nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
    # cross edges: cycle pair j = (2j, 2j+1); src cycle = 2j + (j % 2)
    bases = nodes.filter(F.col("node") % 2 == 0).select(
        (F.col("node") / 2).cast("long").alias("ring")
    )
    even = bases.filter(F.col("ring") % 2 == 0).select(
        F.col("ring").alias("r0"), (F.col("ring") / 2).cast("long").alias("j")
    )
    # partner ring must exist (odd total ring count leaves the last unpaired)
    paired = even.join(
        bases.select((F.col("ring") - 1).alias("r0")), "r0", "left_semi"
    )
    # cross edges leave from the src cycle's MAX node (base+1): its
    # color is already final at hop 0, so the flood needs one hop to
    # enter and one to cover the dst cycle
    cross = paired.select(
        ((F.col("r0") + F.col("j") % 2) * 2 + 1).alias("src"),
        ((F.col("r0") + 1 - F.col("j") % 2) * 2).alias("dst"),
    ).join(nodes.withColumnRenamed("node", "src"), "src", "left_semi")
    edges = ring.union(cross)

    remaining = nodes
    parts = []
    n_active = remaining.count()  # 1-row control scalar
    for _outer in range(8):
        if n_active == 0:
            break
        if _outer == 0:  # round 1: every node is active, skip the trim
            act_edges = edges.repartition(32, "src").localCheckpoint()
        else:
            act_edges = (
                edges.join(
                    remaining.withColumnRenamed("node", "src"), "src", "left_semi"
                )
                .join(
                    remaining.withColumnRenamed("node", "dst"), "dst", "left_semi"
                )
                .repartition(32, "src")
                .localCheckpoint()
            )
        # (1) forward max-color propagation to fixpoint (one hop per
        # iteration: the color frame is used twice per hop, so it must
        # be checkpointed each hop or the lineage recomputes the prior
        # hop twice; probing every hop beats probing every other hop —
        # a skipped probe costs up to two EXTRA HOPS per fixpoint, and
        # hops are ~3x a probe — both variants were measured).
        # Hop shape (r16): UNION + groupBy-max instead of the original
        # groupBy(dst) + left-join + greatest — identical fixpoint
        # (new color(n) = max of n's current color and every in-edge
        # source's color; nodes without in-edges keep their row via
        # the union's left branch) but 2 exchanges per hop instead of
        # 3, which matters because this key is driver-job-latency
        # bound (profiled: 177 tiny jobs, ~0 task seconds — every
        # exchange is an extra AQE sub-job per hop).
        # The convergence probe rides ON the checkpoint materialization
        # via observe() (CollectMetrics): one driver action per hop
        # computes the hop AND yields the monotone sum — the former
        # separate agg-collect per hop (its own analysis + job) is gone.
        color = remaining.select("node", F.col("node").alias("color"))
        prev_sum = None
        for it in range(64):
            prop = act_edges.join(
                color.select(
                    F.col("node").alias("src"), F.col("color").alias("c")
                ),
                "src",
            ).select(F.col("dst").alias("node"), F.col("c").alias("color"))
            obs = Observation()
            color = (
                color.unionAll(prop)
                .groupBy("node")
                .agg(F.max("color").alias("color"))
                .observe(obs, F.sum("color").alias("s"))
                .localCheckpoint()
            )
            s = obs.get["s"]  # monotone
            if s == prev_sum:
                break
            prev_sum = s
        else:
            raise RuntimeError("graph_scc: forward coloring did not converge")
        # (2)+(3) roots, then backward marking within the color class.
        # The color fixpoint is FINAL here, so the "mark may only
        # spread where src and dst share a color" condition can be
        # pre-joined ONCE into a same-color edge subgraph (carrying
        # the shared color) instead of re-checked per hop — the
        # original per-hop reach-distinct + node-join + wc==color
        # filter collapses to one dst-join + union-groupBy per hop
        # (same fixpoint: a backward step dst→src marks src iff
        # src.color == dst.color, which is exactly eq-edge membership).
        csrc = color.select(F.col("node").alias("src"), F.col("color").alias("sc"))
        cdst = color.select(F.col("node").alias("dst"), F.col("color").alias("dc"))
        eqedges = (
            act_edges.join(csrc, "src")
            .join(cdst, "dst")
            .filter(F.col("sc") == F.col("dc"))
            .select("src", "dst", F.col("sc").alias("color"))
            .repartition(32, "dst")
            .localCheckpoint(eager=False)
        )
        mark = color.select(
            "node", "color", (F.col("node") == F.col("color")).alias("m")
        )
        prev_n = -1
        for it in range(64):
            reach = eqedges.join(
                mark.filter("m").select(F.col("node").alias("dst")), "dst"
            ).select(
                F.col("src").alias("node"), "color", F.lit(True).alias("m")
            )
            obs = Observation()
            mark = (
                mark.unionAll(reach)
                .groupBy("node", "color")
                .agg(F.max("m").alias("m"))
                .observe(obs, F.sum(F.col("m").cast("long")).alias("n"))
                .localCheckpoint()
            )
            n = obs.get["n"]  # monotone marked-node count
            if n == prev_n:
                break
            prev_n = n
        else:
            raise RuntimeError("graph_scc: backward marking did not converge")
        done = mark.filter("m").select(
            "node", F.col("color").alias("scc_id")
        ).localCheckpoint(eager=False)
        parts.append(done)
        obs_r = Observation()
        remaining = (
            remaining.join(done, "node", "left_anti")
            .observe(obs_r, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        n_active = obs_r.get["n"]
    else:
        raise RuntimeError("graph_scc: outer peel did not finish in 8 rounds")

    if not parts:  # empty corpus: no nodes, no components
        return nodes.select(
            F.col("node"), F.col("node").alias("scc_id")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# ------------------------------------------------------------------
# scalar_varint — protobuf/parquet LEB128 varint encode + decode
# ------------------------------------------------------------------

# value under test: v = doc_id * 7919 + n_chars (spans 1..4-byte
# varints across the corpus); n_bytes = ceil(bitlen(v)/7) via the
# same exact bin() trick as agg_exp_histogram.


@query(
    "scalar_varint",
    oracle="""
    WITH v AS (
      SELECT doc_id, doc_id * 7919 + n_chars AS val FROM documents
    ), g AS (
      SELECT doc_id, val,
             (length(bin(greatest(val, 1))) + 6) // 7 AS n_bytes
      FROM v
    ), b AS (
      SELECT doc_id, val, n_bytes, i,
             (val // CAST(power(2, 7 * i) AS BIGINT)) % 128
               + CASE WHEN i < n_bytes - 1 THEN 128 ELSE 0 END AS byte
      FROM g, unnest(generate_series(0, 9)) AS u(i)
      WHERE i < n_bytes
    )
    SELECT doc_id,
           CAST(max(val) AS BIGINT) AS val,
           CAST(max(n_bytes) AS BIGINT) AS n_bytes,
           CAST(sum(byte) AS BIGINT) AS byte_sum,
           CAST(sum((byte % 128) * CAST(power(2, 7 * i) AS BIGINT))
                AS BIGINT) AS decoded
    FROM b
    GROUP BY doc_id
    """,
    tags=("scalar", "varint", "leb128", "codegen"),
)
def scalar_varint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEB128 VARINT — the integer wire format under protobuf fields
    and parquet page headers — encoded AND decoded entirely in
    whole-stage-codegen'd JVM expressions (no UDF, no Python): the
    byte array is built with transform() over a sequence (7-bit
    groups, little-endian, continuation bit on all but the last),
    then folded back with aggregate() — index-aware via the (acc,
    shift) struct — and the decode must reproduce the input value
    byte-for-byte.  n_bytes uses the exact length(bin(v)) octave
    trick (shared string op, no float log).

    Differential: the oracle computes groups arithmetically from the
    value and never builds an array — a wrong continuation bit,
    shift, or terminal-group boundary lands a wrong byte_sum or a
    decode mismatch.

    Shape: pure projection, zero exchanges beyond the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "doc_id * 7919 + n_chars AS val",
    ).selectExpr(
        "doc_id",
        "val",
        "(length(bin(greatest(val, 1))) + 6) DIV 7 AS n_bytes",
    ).selectExpr(
        "doc_id",
        "val",
        "n_bytes",
        # encode: LEB128 byte array
        "transform(sequence(0, n_bytes - 1), i ->"
        " (val DIV CAST(power(2, 7 * i) AS BIGINT)) % 128"
        " + IF(i < n_bytes - 1, 128, 0)) AS bytes",
    ).selectExpr(
        "doc_id",
        "val",
        "n_bytes",
        "aggregate(bytes, 0L, (s, b) -> s + b) AS byte_sum",
        # decode: fold (acc, shift) over the bytes, masking the
        # continuation bit — the LEB128 reader proper
        "aggregate(bytes, named_struct('acc', 0L, 'sh', 0),"
        " (s, b) -> named_struct("
        "   'acc', s.acc + (b % 128) * CAST(power(2, s.sh) AS BIGINT),"
        "   'sh', s.sh + 7),"
        " s -> s.acc) AS decoded",
    )


# ------------------------------------------------------------------
# filter_zorder_range — 2-D range query through the Morton curve
# ------------------------------------------------------------------

# the consumer of scalar_zorder's layout: a (customer, order-day) box
# query answered as covering-z-interval prefilter + exact residual.
# Bounds chosen to intersect the fixture's actual day range (order
# days land in ~939..3343 mod 4096), selecting ~8% of rows — a real
# pruning workload, not a vacuous empty box.
_ZR_XA, _ZR_XB = 100, 2000
_ZR_YA, _ZR_YB = 1000, 2200


def _morton_const(x: int, y: int) -> int:
    z = 0
    for i in range(12):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@query(
    "filter_zorder_range",
    oracle=f"""
    WITH c AS (
      SELECT o_orderkey,
             o_custkey % 4096 AS x,
             (epoch_us(o_orderdate) // 86400000000) % 4096 AS y
      FROM orders
    )
    SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
    FROM c
    WHERE x BETWEEN {_ZR_XA} AND {_ZR_XB}
      AND y BETWEEN {_ZR_YA} AND {_ZR_YB}
    """,
    tags=("filter", "zorder", "layout", "pruning"),
)
def filter_zorder_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D BOX query answered through the Z-curve — the read half of
    the Delta/Iceberg ZORDER story (scalar_zorder is the write half):
    Morton interleave is monotone in each coordinate (zval =
    spread(x) + 2*spread(y), each spread order-preserving), so
    [morton(xa,ya), morton(xb,yb)] is a covering z-interval for the
    box; the query filters that interval FIRST (over a zval-sorted
    layout this is exactly the row-group min/max prune — see
    layout_compaction), then applies the exact per-dimension
    residual, which kills the curve's false positives (the Z jumps).

    Differential: the oracle answers the box with plain per-dimension
    predicates and never computes a z value; any error in the
    interleave or interval bound surfaces as a row diff.

    Shape: scan-side projection + filter, zero exchanges; the
    z-interval literals are compile-time constants."""
    zmin = _morton_const(_ZR_XA, _ZR_YA)
    zmax = _morton_const(_ZR_XB, _ZR_YB)
    orders = load_table(spark, sf_dir, "orders")
    from downloader_spark.operators.layout_cdc import _morton_terms_bits

    c = orders.selectExpr(
        "o_orderkey",
        "o_custkey % 4096 AS x",
        "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000)"
        " % 4096 AS y",
    ).selectExpr(
        "o_orderkey",
        "x",
        "y",
        f"{_morton_terms_bits('x', 'y')} AS zval",
    )
    # Conjunct order: the exact per-dimension residual evaluates FIRST
    # (a handful of cheap terms), the covering z-interval second — the
    # projection collapses into one Filter condition, so with z first
    # EVERY row paid the 2*ZBITS-term interleave (twice, via between's
    # two bounds; profiled r16: a 2.1 s single-task stage), while the
    # residual lets ~92% of rows short-circuit past it.  Output is
    # identical either way (conjunction; and Morton monotonicity makes
    # the z-interval a superset of the box).  At 100 TB the z-interval
    # is not a per-row filter at all — it is the row-group min/max
    # prune over a zval-sorted layout, skipping files before rows
    # exist; it stays in the plan as that story's differential
    # evidence.
    return (
        c.filter(
            F.col("x").between(_ZR_XA, _ZR_XB)
            & F.col("y").between(_ZR_YA, _ZR_YB)
        )
        .filter(F.col("zval").between(zmin, zmax))  # covering z-interval
        .select("o_orderkey", F.col("x").cast("bigint"), F.col("y").cast("bigint"))
    )


# ------------------------------------------------------------------
# dq_skew_profile — join-key skew diagnostics
# ------------------------------------------------------------------


@query(
    "dq_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id, count(*) AS cnt
      FROM events GROUP BY event_type, user_id
    ), dist AS (
      SELECT event_type, cnt, count(*) AS n_keys_at
      FROM counts GROUP BY event_type, cnt
    ), walk AS (
      SELECT event_type, cnt,
             sum(n_keys_at) OVER (PARTITION BY event_type ORDER BY cnt)
               AS cum,
             sum(n_keys_at) OVER (PARTITION BY event_type) AS nk
      FROM dist
    ), pct AS (
      SELECT event_type,
             min(cnt) FILTER (cum >= (nk * 50 + 99) // 100) AS p50_count,
             min(cnt) FILTER (cum >= (nk * 99 + 99) // 100) AS p99_count
      FROM walk GROUP BY event_type
    ), tot AS (
      SELECT event_type,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS max_count
      FROM counts GROUP BY event_type
    ), top1 AS (
      SELECT event_type, user_id AS top1_key
      FROM counts
      QUALIFY row_number() OVER (PARTITION BY event_type
                                 ORDER BY cnt DESC, user_id) = 1
    )
    SELECT t.event_type, t.n_rows, t.n_keys, t.max_count,
           CAST(k.top1_key AS BIGINT) AS top1_key,
           CAST(p.p50_count AS BIGINT) AS p50_count,
           CAST(p.p99_count AS BIGINT) AS p99_count,
           CAST(t.max_count * 1000 * t.n_keys // t.n_rows AS BIGINT)
             AS skew_ratio_milli,
           CAST(greatest(1, (t.max_count * t.n_keys + t.n_rows - 1)
                            // t.n_rows) AS BIGINT) AS salt_factor
    FROM tot t
    JOIN pct p ON t.event_type = p.event_type
    JOIN top1 k ON t.event_type = k.event_type
    """,
    tags=("dq", "skew", "diagnostics", "join"),
)
def dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW profile — the diagnostic a 100 TB pipeline runs
    BEFORE committing to a shuffle join on (event_type, user_id):
    per-key counts reduce once (map-side combined), then everything
    else — heavy-hitter top-1 (tie-broken by smallest key),
    exact-integer p50/p99 of the per-key count distribution (smallest
    count with cumulative keys >= ceil(q*n), the same deterministic
    walk as agg_exp_histogram), skew ratio max/mean in milli, and the
    ceil(max/mean) SALT FACTOR a salted join (join_salted) would use
    — runs over the tiny (type, count) distribution table.  All
    integer math, no float percentile interpolation to diverge
    cross-engine.

    Differential: the oracle rebuilds the walk with FILTER aggregates
    and arg_min over a negated tuple; Spark uses conditional mins and
    a struct-max — independent constructions of the same definition."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dist = counts.groupBy("event_type", "cnt").agg(
        F.count(F.lit(1)).alias("n_keys_at")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    walk = dist.select(
        "event_type",
        "cnt",
        F.sum("n_keys_at").over(wcum).alias("cum"),
        F.sum("n_keys_at").over(wall).alias("nk"),
    )
    pct = walk.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(nk * 50 + 99) DIV 100"), F.col("cnt"))
        ).alias("p50_count"),
        F.min(
            F.when(F.col("cum") >= F.expr("(nk * 99 + 99) DIV 100"), F.col("cnt"))
        ).alias("p99_count"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_count"),
        # struct-max over (cnt, -user_id): largest count, smallest key
        F.max(F.struct(F.col("cnt"), (-F.col("user_id")).alias("nk"))).alias(
            "m"
        ),
    )
    return (
        tot.join(pct, "event_type")
        .selectExpr(
            "event_type",
            "CAST(n_rows AS BIGINT) AS n_rows",
            "CAST(n_keys AS BIGINT) AS n_keys",
            "CAST(max_count AS BIGINT) AS max_count",
            "CAST(-m.nk AS BIGINT) AS top1_key",
            "CAST(p50_count AS BIGINT) AS p50_count",
            "CAST(p99_count AS BIGINT) AS p99_count",
            "CAST(max_count * 1000 * n_keys DIV n_rows AS BIGINT)"
            " AS skew_ratio_milli",
            "CAST(greatest(1, (max_count * n_keys + n_rows - 1)"
            " DIV n_rows) AS BIGINT) AS salt_factor",
        )
    )


# ------------------------------------------------------------------
# agg_theta_union — theta-sketch set union (completes the algebra)
# ------------------------------------------------------------------


@query(
    "agg_theta_union",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             {_duck_h60("concat('tht:', CAST(user_id AS VARCHAR))")} AS h
      FROM events
    ), sk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashed
    ), sketch AS (
      SELECT event_type, h FROM sk WHERE rn <= {THETA_K}
    ), merged AS (
      -- union-then-truncate: the k smallest of (A's k-min ∪ B's k-min)
      -- are the k smallest of A ∪ B — the KMV merge law
      SELECT a.event_type, u.h,
             row_number() OVER (PARTITION BY a.event_type ORDER BY u.h)
               AS rn
      FROM (SELECT DISTINCT event_type FROM sketch) a
      JOIN LATERAL (
        SELECT DISTINCT h FROM sketch s
        WHERE s.event_type = a.event_type
           OR s.event_type = '{_THETA_REF}'
      ) u ON true
    ), kth AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_in_union,
             max(h) AS h_k
      FROM merged WHERE rn <= {THETA_K}
      GROUP BY event_type
    ), exact AS (
      SELECT a.event_type,
             CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_exact_union
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN events u
        ON u.event_type = a.event_type OR u.event_type = '{_THETA_REF}'
      GROUP BY a.event_type
    )
    SELECT e.event_type, e.n_exact_union, k.n_in_union,
           CAST(CASE WHEN k.n_in_union < {THETA_K} THEN k.n_in_union
                ELSE ({THETA_K} - 1) * 576460752303423488 // k.h_k * 2
                END AS BIGINT) AS union_estimate
    FROM exact e JOIN kth k ON e.event_type = k.event_type
    """,
    tags=("aggregate", "sketch", "union", "mergeable"),
)
def agg_theta_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set UNION — the other half of the sketch algebra
    (agg_theta_intersect is the intersection): per event_type, merge
    its k-min sketch with the '{_THETA_REF}' cohort's by
    union-then-truncate (the k smallest of two k-min sets ARE the k
    smallest of the union — the law that makes daily sketches
    mergeable into monthly ones without rescanning), then estimate
    |A ∪ B| with the same (k−1)·2⁵⁹ DIV h_k · 2 integer estimator as
    agg_kmv_distinct, exact when the merged sketch isn't full.
    Carried-alongside n_exact_union exposes the estimation error.

    Plan: sketches are ≤ k rows per group, so the merge is a
    broadcast of the reference sketch onto each group's sketch, one
    rank prefix over ≤ 2k rows per group, never a users×users pass.

    Differential: the oracle merges via LATERAL-distinct, Spark via
    union-distinct + WindowGroupLimit-eligible rank — independent
    constructions of the same merge law."""
    ev = load_table(spark, sf_dir, "events")
    h = _spark_h60("concat('tht:', CAST(user_id AS STRING))")
    hashed = ev.select("event_type", F.expr(h).alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= THETA_K)
        .select("event_type", "h")
    )
    ref = sketch.filter(F.col("event_type") == _THETA_REF).select(
        F.col("h").alias("rh")
    )
    types = sketch.select("event_type").distinct()
    merged = (
        sketch.select("event_type", "h")
        .union(
            types.join(F.broadcast(ref)).select(
                "event_type", F.col("rh").alias("h")
            )
        )
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= THETA_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_in_union"),
            F.max("h").alias("h_k"),
        )
    )
    ref_users = (
        ev.filter(F.col("event_type") == _THETA_REF)
        .select("user_id")
        .distinct()
    )
    per_type_users = ev.select("event_type", "user_id").distinct()
    exact = (
        per_type_users.union(
            per_type_users.select("event_type").distinct().join(
                F.broadcast(ref_users)
            )
        )
        .distinct()
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_exact_union"))
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_exact_union",
        "n_in_union",
        F.expr(
            f"CAST(CASE WHEN n_in_union < {THETA_K} THEN n_in_union"
            f" ELSE ({THETA_K} - 1) * 576460752303423488 DIV h_k * 2"
            " END AS BIGINT)"
        ).alias("union_estimate"),
    )


# ------------------------------------------------------------------
# multimodal_zip_entries — ZIP central-directory container walk
# ------------------------------------------------------------------

# entry j of doc d: length 80 + (d + 17*j) % 40, byte i =
# 40 + ((d*3 + j*13 + 5*i) % 80); methods alternate deflate/stored.
_ZIP_N = 3
_ZIP_L = "(80 + (doc_id + 17 * j) % 40)"
_ZIP_B = "(40 + ((doc_id * 3 + j * 13 + 5 * i) % 80))"


@query(
    "multimodal_zip_entries",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, j, i, {_ZIP_B} AS b
      FROM documents,
           unnest(generate_series(0, {_ZIP_N - 1})) AS m(j),
           unnest(generate_series(0, 119)) AS u(i)
      WHERE i < {_ZIP_L}
    )
    SELECT doc_id,
           CAST({_ZIP_N} AS BIGINT) AS n_entries,
           CAST({(_ZIP_N + 1) // 2} AS BIGINT) AS n_deflated,
           CAST(count(*) AS BIGINT) AS total_bytes,
           CAST(sum(b) AS BIGINT) AS byte_sum
    FROM bytes
    GROUP BY doc_id
    """,
    tags=("multimodal", "zip", "container", "deflate", "mapInPandas"),
)
def multimodal_zip_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP container walk the way readers must actually do it — via
    the CENTRAL DIRECTORY found from the tail EOCD record, never by
    streaming local headers (appended data and self-extracting stubs
    make local walks wrong): each doc's archive holds {_ZIP_N}
    entries with alternating DEFLATE/stored methods, written by
    media.encode_zip and decoded by media.zip_entries_decode — EOCD
    scan, directory parse, local-header cross-check, the from-scratch
    inflater for method-8 bodies, from-scratch CRC-32 and both-size
    verification per entry.  Stats come from the DECODED payloads.

    Differential: the oracle regenerates every entry's plaintext
    closed-form from the byte generator and never sees an archive.

    Shape: map-only Arrow stage (codec posture); at 100 TB this is
    the dataset-distribution ingest path — a binaryFile scan of .zip
    objects whose entry payloads never cross an exchange."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import encode_zip, zip_entries_decode

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                entries = []
                for j in range(_ZIP_N):
                    ln = 80 + (d + 17 * j) % 40
                    i = np.arange(ln)
                    p = (40 + ((d * 3 + j * 13 + 5 * i) % 80)).astype(
                        np.uint8
                    ).tobytes()
                    entries.append((f"e{j}.bin", p, 8 if j % 2 == 0 else 0))
                back = zip_entries_decode(encode_zip(entries))
                assert back == entries  # entry-exact roundtrip
                arr = np.frombuffer(b"".join(p for _, p, _ in back), np.uint8)
                out.append(
                    (
                        d,
                        len(back),
                        sum(1 for _, _, m in back if m == 8),
                        int(arr.size),
                        int(arr.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_entries",
                    "n_deflated",
                    "total_bytes",
                    "byte_sum",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, n_entries long, n_deflated long,"
        " total_bytes long, byte_sum long",
    )


# ------------------------------------------------------------------
# multimodal_tar_members — tar.gz chain (gzip ∘ ustar ∘ payload)
# ------------------------------------------------------------------

# file j of doc d: length 90 + (d + 23 * j) % 60, byte i =
# 35 + ((d * 7 + j * 19 + 11 * i) % 85); 3 files per archive,
# gzip level d % 10 around the whole tar.
_TAR_N = 3
_TAR_L = "(90 + (doc_id + 23 * j) % 60)"
_TAR_B = "(35 + ((doc_id * 7 + j * 19 + 11 * i) % 85))"


@query(
    "multimodal_tar_members",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, j, i, {_TAR_B} AS b
      FROM documents,
           unnest(generate_series(0, {_TAR_N - 1})) AS m(j),
           unnest(generate_series(0, 149)) AS u(i)
      WHERE i < {_TAR_L}
    )
    SELECT doc_id,
           CAST({_TAR_N} AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS total_bytes,
           CAST(sum(b) AS BIGINT) AS byte_sum,
           CAST(sum(CASE WHEN j = 0 THEN b ELSE 0 END) AS BIGINT)
             AS first_file_sum
    FROM bytes
    GROUP BY doc_id
    """,
    tags=("multimodal", "tar", "gzip", "container", "mapInPandas"),
)
def multimodal_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAR.GZ through the full chain — the most common dataset
    tarball read, composed entirely from this repo's from-scratch
    pieces: each doc's blob is a POSIX ustar archive ({_TAR_N}
    checksummed 512-byte headers, octal sizes, zero-block
    terminator; media.encode_tar) wrapped in an RFC 1952 gzip member
    at level doc_id % 10, decoded by gzip_members_decode (from-
    scratch inflate + CRC-32) THEN tar_members_decode (header
    checksum verified with the spaces-seeded sum, octal size parse,
    block-padding walk).  Stats come from the extracted file
    payloads, so a wrong byte anywhere in either layer surfaces.

    Differential: the oracle regenerates every file's plaintext
    closed-form from the byte generator; it never sees an archive.
    Cross-implementation agreement with stdlib tarfile (both
    directions) is pinned in tests/test_media_codecs.py.

    Shape: map-only Arrow stage (codec posture); at 100 TB this is a
    binaryFile scan of .tar.gz objects — archive bytes never cross
    an exchange."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import (
        encode_gzip_member,
        encode_tar,
        gzip_members_decode,
        tar_members_decode,
    )

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                entries = []
                for j in range(_TAR_N):
                    ln = 90 + (d + 23 * j) % 60
                    i = np.arange(ln)
                    p = (35 + ((d * 7 + j * 19 + 11 * i) % 85)).astype(
                        np.uint8
                    ).tobytes()
                    entries.append((f"f{j}.dat", p))
                tgz = encode_gzip_member(encode_tar(entries), d % 10)
                back = tar_members_decode(gzip_members_decode(tgz)[0])
                assert back == entries  # chain-exact roundtrip
                arr = np.frombuffer(b"".join(p for _, p in back), np.uint8)
                first = np.frombuffer(back[0][1], np.uint8)
                out.append(
                    (
                        d,
                        len(back),
                        int(arr.size),
                        int(arr.astype(np.int64).sum()),
                        int(first.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_files",
                    "total_bytes",
                    "byte_sum",
                    "first_file_sum",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, n_files long, total_bytes long,"
        " byte_sum long, first_file_sum long",
    )


# ------------------------------------------------------------------
# multimodal_warc_records — .warc.gz web-archive ingest chain
# ------------------------------------------------------------------

# response payload of doc d: length 120 + d % 80, byte i =
# 32 + ((d * 11 + 13 * i) % 90); preceded by a fixed-shape warcinfo
# record whose payload is "crawler: spark-graft\r\n" (22 bytes).
_WARC_L = "(120 + doc_id % 80)"
_WARC_B = "(32 + ((doc_id * 11 + 13 * i) % 90))"


@query(
    "multimodal_warc_records",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, i, {_WARC_B} AS b
      FROM documents,
           unnest(generate_series(0, 199)) AS u(i)
      WHERE i < {_WARC_L}
    )
    SELECT doc_id,
           CAST(2 AS BIGINT) AS n_records,
           CAST(count(*) AS BIGINT) AS response_bytes,
           CAST(sum(b) AS BIGINT) AS response_sum,
           CAST(22 AS BIGINT) AS warcinfo_bytes
    FROM bytes
    GROUP BY doc_id
    """,
    tags=("multimodal", "warc", "gzip", "crawl", "mapInPandas"),
)
def multimodal_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC — the format crawl corpora actually arrive in — through
    the full .warc.gz chain built from this repo's own layers: each
    doc's archive is TWO records (warcinfo + response), each gzipped
    as its OWN member (the per-record framing that makes real WARCs
    seekable), decoded by gzip_members_decode (from-scratch inflate,
    CRC-32 per member) and then parse_warc_records (version line,
    named header fields, Content-Length-driven payload read, CRLF
    CRLF trailer check).  Stats come from the parsed record payloads
    and the record count — a wrong Content-Length, a missed trailer,
    or a corrupt member all fail loudly before stats.

    Differential: the oracle regenerates the response payload
    closed-form from the byte generator; it never sees a record.

    Shape: map-only Arrow stage (codec posture); this IS the 100 TB
    CommonCrawl ingest path — a binaryFile scan of .warc.gz objects
    whose record payloads never cross an exchange."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import (
        encode_gzip_member,
        encode_warc_record,
        gzip_members_decode,
        parse_warc_records,
    )

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ln = 120 + d % 80
                i = np.arange(ln)
                payload = (32 + ((d * 11 + 13 * i) % 90)).astype(
                    np.uint8
                ).tobytes()
                info = encode_warc_record(
                    {"WARC-Type": "warcinfo",
                     "WARC-Record-ID": f"<urn:uuid:{d}-0>"},
                    b"crawler: spark-graft\r\n",
                )
                resp = encode_warc_record(
                    {"WARC-Type": "response",
                     "WARC-Record-ID": f"<urn:uuid:{d}-1>",
                     "WARC-Target-URI": f"http://example.test/{d}"},
                    payload,
                )
                wgz = encode_gzip_member(info, 6) + encode_gzip_member(
                    resp, d % 10
                )
                records = parse_warc_records(
                    b"".join(gzip_members_decode(wgz))
                )
                assert len(records) == 2
                by_type = {h["WARC-Type"]: p for h, p in records}
                rp = np.frombuffer(by_type["response"], np.uint8)
                assert by_type["response"] == payload
                out.append(
                    (
                        d,
                        len(records),
                        int(rp.size),
                        int(rp.astype(np.int64).sum()),
                        len(by_type["warcinfo"]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_records",
                    "response_bytes",
                    "response_sum",
                    "warcinfo_bytes",
                ],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, n_records long, response_bytes long,"
        " response_sum long, warcinfo_bytes long",
    )


# ------------------------------------------------------------------
# text_html_strip — HTML -> text extraction (the crawl first step)
# ------------------------------------------------------------------


@query(
    "text_html_strip",
    oracle="""
    SELECT doc_id,
           md5(text) AS extracted_md5,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
    FROM documents
    """,
    tags=("llm", "text", "html", "extraction", "codegen"),
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> TEXT extraction, the first transform of every crawl
    pipeline, proven by INVERSION: each doc's text is wrapped into a
    realistic page INSIDE the plan (head with a script block to be
    dropped wholesale, words split into <p> elements separated by
    &nbsp; entities), then a GENERIC extractor — (1) remove
    script/style blocks with a dotall non-greedy regex, (2) unescape
    entities, (3) strip all tags, (4) collapse whitespace and trim —
    must recover the original text BYTE-EXACTLY, witnessed by md5.
    The extractor never sees how the page was built; any laziness
    (greedy script regex eating the body, tags replaced by spaces
    without collapsing, entities left behind or unescaped in the
    wrong order) flips the hash.

    The synthesis HTML-ESCAPES the text (& -> &amp; first, then
    < -> &lt;, > -> &gt;) exactly as a real page must, so documents
    containing markup metacharacters stay byte-exact; the extractor
    therefore strips tags BEFORE unescaping entities (the only
    correct generic order — unescape-first would turn a document's
    literal &lt;p&gt; into a tag and delete it) and unescapes &amp;
    LAST.  Remaining fixture precondition: intra-document whitespace
    is single spaces (the \\s+ collapse normalizes runs/newlines, so
    a doc containing a tab would hash differently — true of any
    whitespace-normalizing extractor).

    All stages are JVM regexp_replace/md5 expressions inside one
    whole-stage-codegen'd projection — zero exchanges, no Python.

    Differential: the oracle hashes the ORIGINAL text straight off
    the table; it never constructs or strips HTML."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        # HTML-escape the payload: & first (else it double-escapes)
        "replace(replace(replace(text, '&', '&amp;'),"
        " '<', '&lt;'), '>', '&gt;') AS esc",
    ).selectExpr(
        "doc_id",
        # page synthesis: script boilerplate + <p>-per-word body
        "concat('<html><head><title></title>',"
        " '<script type=\"text/javascript\">var x = \"<p>not text</p>\";',"
        " '</script></head>', char(10),"
        " '<body><p>', replace(esc, ' ', '</p>&nbsp;<p>'),"
        " '</p></body></html>') AS html",
    ).selectExpr(
        "doc_id",
        # stage 1: drop script/style subtrees wholesale (dotall, lazy)
        "regexp_replace(html, '(?s)<(script|style)[^>]*>.*?</\\\\1>', '')"
        " AS s1",
    ).selectExpr(
        "doc_id",
        # stage 2: strip tags FIRST (before entities, so a document's
        # escaped markup never becomes a tag)
        "regexp_replace(s1, '<[^>]+>', '') AS s2",
    ).selectExpr(
        "doc_id",
        # stage 3: entities -> characters, &amp; strictly last
        "replace(replace(replace(replace(s2, '&nbsp;', ' '),"
        " '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS s3",
    ).selectExpr(
        "doc_id",
        # stage 4: collapse whitespace runs, trim the shell's leakage
        "trim(regexp_replace(s3, '\\\\s+', ' ')) AS extracted",
    ).selectExpr(
        "doc_id",
        "md5(extracted) AS extracted_md5",
        "CAST(length(extracted) AS BIGINT) AS n_chars",
        "CAST(size(split(extracted, ' ')) AS BIGINT) AS n_words",
    )


# ------------------------------------------------------------------
# multimodal_http_chunked — RFC 9112 chunked transfer decode
# ------------------------------------------------------------------

# body of doc d: length 150 + d % 70, byte i = 33 + ((d * 13 + 7 * i)
# % 88); chunk sizes rotate over a d-dependent triple, extensions on
# for odd docs, a trailer field on docs % 3 == 0.
_HC_L = "(150 + doc_id % 70)"
_HC_B = "(33 + ((doc_id * 13 + 7 * i) % 88))"


@query(
    "multimodal_http_chunked",
    oracle=f"""
    WITH bytes AS (
      SELECT doc_id, i, {_HC_B} AS b
      FROM documents,
           unnest(generate_series(0, 219)) AS u(i)
      WHERE i < {_HC_L}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bytes,
           CAST(sum(b) AS BIGINT) AS byte_sum,
           CAST(max(CASE WHEN i = 0 THEN b END) AS BIGINT) AS first_byte
    FROM bytes
    GROUP BY doc_id
    """,
    tags=("multimodal", "http", "chunked", "crawl", "mapInPandas"),
)
def multimodal_http_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP/1.1 CHUNKED transfer decoding (RFC 9112 §7.1) — the body
    framing inside archived crawl responses, decoded from scratch:
    hex chunk-size lines (";ext" extensions ignored per spec, planted
    on odd docs), CRLF framing verified per chunk, zero chunk, and a
    trailer section (planted on every third doc) skipped correctly.
    Chunk sizes rotate over a doc-dependent triple so chunk
    boundaries land everywhere in the byte stream; stats come from
    the DEFRAMED body.

    Differential: the oracle regenerates the body closed-form from
    the byte generator; it never sees a framed message.

    Shape: map-only Arrow stage (codec posture); at 100 TB this runs
    downstream of the WARC record walk on the same binaryFile scan —
    body bytes never cross an exchange."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_http_chunked, encode_http_chunked

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ln = 150 + d % 70
                i = np.arange(ln)
                body = (33 + ((d * 13 + 7 * i) % 88)).astype(
                    np.uint8
                ).tobytes()
                sizes = [7 + d % 5, 19, 33 + d % 11]
                msg = encode_http_chunked(body, sizes, ext=bool(d % 2))
                if d % 3 == 0:  # trailer fields after the zero chunk
                    msg = msg[:-2] + f"X-Len: {ln}\r\n\r\n".encode()
                back = decode_http_chunked(msg)
                assert back == body  # frame-exact roundtrip
                arr = np.frombuffer(back, np.uint8)
                out.append(
                    (
                        d,
                        int(arr.size),
                        int(arr.astype(np.int64).sum()),
                        int(arr[0]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "n_bytes", "byte_sum", "first_byte"],
            )

    return docs.mapInPandas(
        run, "doc_id long, n_bytes long, byte_sum long, first_byte long"
    )


# ------------------------------------------------------------------
# multimodal_parquet_footer — the lake's own metadata, from scratch
# ------------------------------------------------------------------

# small fixture tables whose single-file footers we parse; leaf-column
# counts are schema facts the oracle states as literals.
_PQ_TABLES = (
    ("region", 2),
    ("nation", 3),
    ("customer", 5),
    ("supplier", 4),
    ("part", 6),
    ("documents", 5),
    ("embeddings", 3),
)


@query(
    "multimodal_parquet_footer",
    oracle="""
    SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS footer_rows,
           CAST(2 AS BIGINT) AS n_cols FROM region
    UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT), 3 FROM nation
    UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT), 5 FROM customer
    UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT), 4 FROM supplier
    UNION ALL SELECT 'part', CAST(count(*) AS BIGINT), 6 FROM part
    UNION ALL SELECT 'documents', CAST(count(*) AS BIGINT), 5 FROM documents
    UNION ALL SELECT 'embeddings', CAST(count(*) AS BIGINT), 3 FROM embeddings
    """,
    tags=("multimodal", "parquet", "thrift", "metadata", "mapInPandas"),
)
def multimodal_parquet_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAKE'S OWN FORMAT read from scratch: a binaryFile scan of
    the fixture parquet files feeds media.parse_parquet_footer — a
    from-scratch Thrift COMPACT protocol reader (varint/zigzag ints,
    nibble-packed field headers with delta field ids, size-prefixed
    binaries, generic typed skip over nested structs/lists/maps) —
    which pulls FileMetaData.num_rows and the leaf-column count out
    of the real footer bytes.  The differential is the strongest kind
    this repo has: the footer's CLAIMED row count must equal what
    DuckDB gets by actually scanning the data, for every table — a
    single mis-skipped field or a wrong zigzag lands a wrong count.

    At 100 TB this is the planner primitive everything else stands
    on: footer-only reads are how engines prune row groups and cost
    scans without touching data pages.

    Shape: binaryFile scan (one row per file, footers are tail bytes)
    into a map-only Arrow stage; no exchange."""
    import os

    import pandas as pd

    from downloader_spark.media import parse_parquet_footer

    paths = [
        (t, os.path.join(sf_dir, f"{t}.parquet")) for t, _ in _PQ_TABLES
    ]
    files = (
        spark.read.format("binaryFile")
        .load([p for _, p in paths])
        .select("path", "content")
        .repartition(len(paths))
    )

    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                # map by basename: robust to the URI shape binaryFile
                # reports (file:/..., file:///..., hdfs://...)
                name = path.rsplit("/", 1)[-1].removesuffix(".parquet")
                meta = parse_parquet_footer(bytes(content))
                out.append(
                    (name, meta["num_rows"], meta["n_leaf_columns"])
                )
            yield pd.DataFrame(
                out, columns=["tbl", "footer_rows", "n_cols"]
            )

    return files.mapInPandas(
        run, "tbl string, footer_rows long, n_cols long"
    )
