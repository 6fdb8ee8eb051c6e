"""Round-10 surface extensions, closing the round-9 verdict's ranked
asks plus adjacent families: the mergeable QUANTILE sketch rollup
(the missing third sketch family next to KMV-distinct and count-min
heavy hitters), INCREMENTAL MinHash dedup (new-batch vs corpus — the
shape a daily 100 TB crawl actually runs), a deterministic BLOOM
membership prefilter, REAL PNG decode keys (stdlib-zlib codec in
media.py — retires the BMP-only caveat on the image side), and five
analytics keys (local clustering coefficient, per-user type
diversity, char-class text profiling, PAA series compression,
per-dimension embedding moments, hash-systematic sampling).

Driver rotation: module import order in plans/catalog.py is
APPEND-ONLY (the ordering rule and its rationale live in
plans/catalog.py — newest round module goes last).

Cross-engine exactness notes shared by the keys below:

- Integer ``DIV`` (Spark) and ``//`` (DuckDB 1.0) both truncate
  toward zero — exact on negatives too (measured; see
  round9_ext.py's discussion).  Cents/milli quantization uses
  ``floor(x * scale)`` on the same IEEE double in both engines.
- 60-bit md5-derived hashes (``_spark_h60`` / ``_duck_h60`` from
  llm_dedup) are bit-equal across engines; every similarity /
  membership key below derives all randomness from them.
- Ratios are emitted as integer parts-per-million floor divisions.

Reference analog: the reference's only dedup identity is the content
MD5 (/root/reference/download/common.go:183-190); the incremental
and bloom keys extend that identity to batch-vs-corpus shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import (
    _DUCK_SHINGLE_CTE,
    _duck_h60,
    _spark_h60,
    _verified_pairs,
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    N_BANDS,
    N_HASHES,
    hashed_shingle_sets,
)
from downloader_spark.operators.llm_text import LANG_PROFILES, _lang_scores
from downloader_spark.operators.round9b_ext import (
    _KCORE_MIN_QTY,
    _KCORE_ORDER_CAP,
)
from downloader_spark.plans.registry import query

# ------------------------------------------------------------------
# agg_quantile_sketch_rollup — two-level mergeable histogram quantiles
# ------------------------------------------------------------------

_QSK_W = 50_000  # bucket width in cents ($500) — the fixed sketch grid
_QSK_P = (50, 95)  # quantiles reported


@query(
    "agg_quantile_sketch_rollup",
    oracle=f"""
    WITH cents AS (
      SELECT n.n_regionkey,
             CAST(floor(c.c_acctbal * 100) AS BIGINT) AS c
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    -- region-level bucket table built DIRECTLY from raw rows: the
    -- differential against Spark's nation->region two-level merge
    buckets AS (
      SELECT n_regionkey, c // {_QSK_W} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM cents GROUP BY n_regionkey, c // {_QSK_W}
    ),
    cum AS (
      SELECT n_regionkey, bucket, cnt,
             sum(cnt) OVER (PARTITION BY n_regionkey ORDER BY bucket) AS cum,
             sum(cnt) OVER (PARTITION BY n_regionkey) AS n
      FROM buckets
    )
    SELECT r.r_name AS region,
           CAST(max(cum.n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum.cum >= (cum.n * 50 + 99) // 100
                         THEN cum.bucket END) * {_QSK_W} AS BIGINT)
             AS p50_lo_cents,
           CAST(min(CASE WHEN cum.cum >= (cum.n * 95 + 99) // 100
                         THEN cum.bucket END) * {_QSK_W} AS BIGINT)
             AS p95_lo_cents
    FROM cum JOIN region r ON r.r_regionkey = cum.n_regionkey
    GROUP BY r.r_name
    """,
    tags=("aggregate", "sketch", "quantile", "mergeable", "rollup"),
)
def agg_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-LEVEL mergeable QUANTILE sketch rollup — the quantile
    analog of ``agg_sketch_rollup`` (round9_ext): account-balance
    quantiles per REGION computed from fixed-grid histogram sketches
    built PER NATION (the partial a daily job persists: at most
    |grid| (bucket, count) rows per nation), then MERGED at region
    level by adding counts — raw rows are touched exactly once, at
    the finest level; every coarser rollup reads sketch rows only.

    The differential IS the merge-losslessness proof: Spark builds
    nation partials and merges them; the DuckDB oracle histograms the
    region's raw rows DIRECTLY.  Fixed shared bucket boundaries make
    histogram merge exactly lossless (counts add), so the two
    constructions agree bit-for-bit — any binning or merge error
    breaks the hash.  The reported quantile is the sketch quantile
    (the lower cent bound of the first bucket whose cumulative count
    reaches ceil(n*p/100)) — resolution ±{_QSK_W} cents, the honest
    sketch contract; truncating division buckets straddle zero with a
    double-wide bucket 0, identically in both engines.

    Shape: level 1 is one map-side-combinable hash aggregation of
    (nation, bucket) counts; level 2 aggregates |nations| x |grid|
    rows — constant-sized; the quantile pick is a window over |grid|
    rows per region.  At 100 TB only level 1 sees data."""
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = load_table(spark, sf_dir, "region")
    cents = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "n_nationkey",
        "n_regionkey",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("c"),
    )
    # level 1: per-nation histogram partials on the shared fixed grid
    partials = cents.groupBy(
        "n_nationkey", "n_regionkey", F.expr(f"c DIV {_QSK_W}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # level 2: merge nation partials per region (counts add — lossless)
    merged = partials.groupBy("n_regionkey", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    wcum = (
        Window.partitionBy("n_regionkey")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("n_regionkey")
    cum = merged.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    picks = [
        F.min(
            F.when(
                F.expr(f"cum >= (n * {p} + 99) DIV 100"), F.col("bucket")
            )
        ).alias(f"b{p}")
        for p in _QSK_P
    ]
    per_region = cum.groupBy("n_regionkey").agg(
        F.max("n").cast("long").alias("n"), *picks
    )
    return per_region.join(
        F.broadcast(reg), per_region.n_regionkey == reg.r_regionkey
    ).select(
        F.col("r_name").alias("region"),
        "n",
        (F.col("b50") * _QSK_W).cast("long").alias("p50_lo_cents"),
        (F.col("b95") * _QSK_W).cast("long").alias("p95_lo_cents"),
    )


# ------------------------------------------------------------------
# dedup_minhash_incremental — new batch vs existing corpus via LSH
# ------------------------------------------------------------------

_INC_MOD = 10  # doc_id % 10 == 0 -> the "new batch"; else corpus


@query(
    "dedup_minhash_incremental",
    oracle=f"""
    WITH {_DUCK_SHINGLE_CTE},
    hsets AS (
      SELECT doc_id,
             list_distinct(list_transform(sh, s -> {_duck_h60("s")})) AS hh
      FROM shingled
    ),
    hps AS (
      SELECT doc_id, hh, list_transform(hh, x -> x % {MINHASH_P}) AS hp
      FROM hsets
    ),
    sigs AS (
      SELECT doc_id,
             list_transform(generate_series(0, {N_HASHES - 1}),
               i -> list_aggregate(
                      list_transform(hp,
                        x -> ({MINHASH_A}[i + 1] * x + {MINHASH_B}[i + 1])
                             % {MINHASH_P}),
                      'min')) AS sig
      FROM hps
    ),
    bands AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(0, {N_BANDS - 1}),
               b -> concat(b, ':', md5(concat(sig[2*b+1], ',', sig[2*b+2]))))) AS band
      FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band
      WHERE a.doc_id % {_INC_MOD} = 0 AND b.doc_id % {_INC_MOD} <> 0
    )
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(sa.hh, sb.hh)) AS INT) AS inter_size,
           CAST(len(sa.hh) + len(sb.hh) - len(list_intersect(sa.hh, sb.hh)) AS INT)
             AS union_size,
           CAST(len(list_intersect(sa.hh, sb.hh)) * 1000000
                // (len(sa.hh) + len(sb.hh) - len(list_intersect(sa.hh, sb.hh)))
                AS BIGINT) AS jacc_ppm
    FROM cand c
    JOIN hsets sa ON sa.doc_id = c.doc_a
    JOIN hsets sb ON sb.doc_id = c.doc_b
    WHERE len(list_intersect(sa.hh, sb.hh)) * 2
          >= len(sa.hh) + len(sb.hh) - len(list_intersect(sa.hh, sb.hh))
    """,
    tags=("llm", "dedup", "incremental"),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash near-dup: a NEW batch of documents
    (doc_id % {_INC_MOD} == 0 — the daily crawl delta) checked against
    the EXISTING corpus through shared LSH bands — the text analog of
    ``dedup_incremental`` (embedding side, llm_dedup.py), and the
    shape a production 100 TB pipeline actually runs daily: the
    candidate join is BIPARTITE (new x corpus within a band), never
    corpus x corpus and never new x new, so daily cost scales with
    |delta| x band-occupancy, not corpus size.

    Pipeline identical to ``dedup_minhash`` up to banding (same
    deterministic md5-derived hash family, same 6x2 banding — at
    production scale the corpus band table is the PERSISTED artifact
    the delta joins against); candidates are then exact-verified
    through the hashed-postings co-occurrence join and kept at
    Jaccard >= 0.5.  Oracle replicates the full algorithm with
    list-intersection verification — LSH false negatives cannot cause
    a mismatch.

    Output: (new doc, corpus doc) pairs with exact intersection /
    union sizes and Jaccard ppm."""
    docs = load_table(spark, sf_dir, "documents")
    ss = hashed_shingle_sets(docs).localCheckpoint()
    hp = ss.withColumn("hp", F.expr(f"pmod(h, {MINHASH_P})"))
    # the band self-join's two sides are compiled by AQE as independent
    # query stages that materialize CONCURRENTLY, so exchange reuse
    # never fires and the 12-min-aggregate signature pass would run
    # twice — checkpoint the V-sized signature table once (the
    # dedup_minhash_estimate_error / dedup_lsh_tuning posture)
    sigs = hp.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"pmod({MINHASH_A[i]} * hp + {MINHASH_B[i]}, {MINHASH_P})")
            ).alias(f"m{i}")
            for i in range(N_HASHES)
        ]
    ).localCheckpoint()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{b}:"),
                        F.md5(
                            F.concat(
                                F.col(f"m{2*b}").cast("string"),
                                F.lit(","),
                                F.col(f"m{2*b+1}").cast("string"),
                            )
                        ),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    )
    new_b = bands.filter(F.col("doc_id") % _INC_MOD == 0).alias("a")
    corp_b = bands.filter(F.col("doc_id") % _INC_MOD != 0).alias("b")
    cand = (
        new_b.join(corp_b, F.col("a.band") == F.col("b.band"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verified_pairs(ss, cand, keep_ratio=2)


# ------------------------------------------------------------------
# dedup_bloom_prefilter — deterministic Bloom membership prefilter
# ------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 3  # hash functions


def _bloom_pos(engine: str, j: int) -> str:
    """Bit position j for a doc's text: md5-derived 60-bit hash of a
    salted text, mod the filter size — identical in both engines."""
    arg = f"concat('bloom{j}:', text)"
    h = _spark_h60(arg) if engine == "spark" else _duck_h60(arg)
    return f"({h} % {_BLOOM_M})"


@query(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH batch AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {_INC_MOD} = 0
    ),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {_INC_MOD} <> 0
    ),
    bits AS (
      {" UNION ".join(f"SELECT DISTINCT {_bloom_pos('duck', j)} AS bit FROM corpus" for j in range(_BLOOM_K))}
    ),
    probes AS (
      {" UNION ALL ".join(f"SELECT doc_id, {_bloom_pos('duck', j)} AS bit FROM batch" for j in range(_BLOOM_K))}
    ),
    hits AS (
      SELECT p.doc_id, CAST(count(b.bit) AS BIGINT) AS n_hit
      FROM probes p LEFT JOIN bits b ON p.bit = b.bit
      GROUP BY p.doc_id
    ),
    exact AS (
      SELECT DISTINCT b.doc_id
      FROM batch b JOIN corpus c ON md5(b.text) = md5(c.text)
    )
    SELECT h.doc_id,
           h.n_hit = {_BLOOM_K} AS bloom_hit,
           e.doc_id IS NOT NULL AS in_corpus,
           (h.n_hit = {_BLOOM_K}) AND e.doc_id IS NULL AS is_false_positive
    FROM hits h LEFT JOIN exact e ON h.doc_id = e.doc_id
    """,
    tags=("llm", "dedup", "bloom", "incremental"),
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter MEMBERSHIP PREFILTER for incremental exact dedup:
    the corpus's {_BLOOM_K} md5-derived bit positions per document are
    folded into a {_BLOOM_M}-bit set (the persisted, broadcastable
    sketch — at 100 TB a few GB covers billions of docs); each
    new-batch document probes its {_BLOOM_K} positions and is flagged
    ``bloom_hit`` iff all are set.  The key emits the Bloom verdict
    NEXT TO exact membership (md5 equality against the corpus), so
    the output exhibits the filter's one-sided-error contract:
    ``in_corpus`` implies ``bloom_hit`` (no false negatives —
    hash-checked), while ``is_false_positive`` marks the collision
    cases the downstream exact check must re-verify.

    All randomness is the deterministic shared 60-bit md5 family, so
    the DuckDB oracle rebuilds the identical filter — any bit-position
    or probe discrepancy breaks the hash match.

    Shape: the bit set is <= {_BLOOM_M} rows (aggregated corpus-side,
    broadcast to the probe join); the probe side is 3 rows per batch
    doc; the exact check is a hash equi-join on md5 — everything is
    either broadcast-sized or |batch|-sized, never corpus x batch."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % _INC_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _INC_MOD != 0)
    pos_cols = F.array(
        *[F.expr(_bloom_pos("spark", j)) for j in range(_BLOOM_K)]
    )
    bits = (
        corpus.select(F.explode(pos_cols).alias("bit")).distinct()
    )
    probes = batch.select("doc_id", F.explode(pos_cols).alias("bit"))
    hits = (
        probes.join(F.broadcast(bits.withColumn("set_", F.lit(1))), "bit", "left")
        .groupBy("doc_id")
        .agg(F.count("set_").cast("long").alias("n_hit"))
    )
    exact = (
        batch.select("doc_id", F.md5("text").alias("h"))
        .join(
            corpus.select(F.md5("text").alias("h")).distinct(),
            "h",
            "left_semi",
        )
        .select("doc_id")
        .withColumn("in_", F.lit(True))
    )
    return hits.join(exact, "doc_id", "left").select(
        "doc_id",
        (F.col("n_hit") == _BLOOM_K).alias("bloom_hit"),
        F.coalesce(F.col("in_"), F.lit(False)).alias("in_corpus"),
        (
            (F.col("n_hit") == _BLOOM_K) & F.col("in_").isNull()
        ).alias("is_false_positive"),
    )


# ------------------------------------------------------------------
# multimodal_png_stats / multimodal_png_resize — real PNG byte path
# ------------------------------------------------------------------

_PNG_W = 16
_PNG_H = 12
_PNG_RW = 5  # resize target width (non-divisor: exercises floor sampling)
_PNG_RH = 7  # resize target height

# channel value at (doc_id, y, x, c) — closed-form synthesis shared by
# the Spark mapInPandas stage and the oracle (which never sees a byte)
_PNG_PIX = "(doc_id * 7 + {y} * 13 + {x} * 5 + {c} * 3) % 256"


def _png_sum_sql(y_expr: str, x_expr: str) -> str:
    """Oracle channel sums over a (doc_id, y2, x2) row set."""
    return ", ".join(
        f"CAST(sum({_PNG_PIX.format(y=y_expr, x=x_expr, c=c)}) AS BIGINT)"
        f" AS sum_{ch}"
        for c, ch in enumerate("rgb")
    )


@query(
    "multimodal_png_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({_PNG_W} AS INT) AS width,
           CAST({_PNG_H} AS INT) AS height,
           {_png_sum_sql("y", "x")}
    FROM documents,
         unnest(generate_series(0, {_PNG_H - 1})) AS u(y),
         unnest(generate_series(0, {_PNG_W - 1})) AS v(x)
    GROUP BY doc_id
    """,
    tags=("multimodal", "image", "png", "mapInPandas"),
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image geometry + exact channel sums through the REAL PNG
    byte path: each doc's deterministic RGB image is ENCODED to a
    genuine zlib-deflated PNG (per-row filters cycling through all
    five standard types) and DECODED back inside an Arrow
    ``mapInPandas`` stage (the pure-Python codec in
    downloader_spark/media.py), then channel-summed — the exact check
    covers deflate/inflate, chunk CRCs, all five unfilter paths, and
    the Arrow plumbing, not a manifest stub.  The WAV sibling is
    ``multimodal_wav_energy`` (round9b_ext); together they retire the
    codec-stub caveat for both image and audio families.

    Differential: the oracle never sees a byte — it recomputes the
    channel sums from the closed-form synthesis
    p(doc,y,x,c) = (doc·7 + y·13 + x·5 + c·3) mod 256, so any
    corruption anywhere in the container roundtrip breaks the hash.

    Shape: map-only, pipelines with a binaryFile scan at production
    scale (the multimodal_inventory posture)."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_png, encode_png

    # CPU-dense Python stage over a tiny key column arriving as ONE
    # parquet file: round-robin repartition spreads the codec work
    # across every core (the _shingle_rows precedent) — the exchange
    # carries 8-byte rows and bought 4.5 -> ~0.4 s settled at sf0.1.
    # A production binaryFile scan arrives pre-partitioned by file
    # and would skip this.
    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)
    w, h = _PNG_W, _PNG_H

    def run(batches):
        yy, xx = np.mgrid[0:h, 0:w]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                px = np.stack(
                    [
                        (int(doc_id) * 7 + yy * 13 + xx * 5 + c * 3) % 256
                        for c in range(3)
                    ],
                    axis=-1,
                ).astype(np.uint8)
                back = decode_png(encode_png(px))
                assert back.shape == (h, w, 3)
                sums = back.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (int(doc_id), w, h, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int,"
        " sum_r long, sum_g long, sum_b long",
    )


@query(
    "multimodal_png_resize",
    oracle=f"""
    SELECT doc_id,
           CAST({_PNG_RW} AS INT) AS width,
           CAST({_PNG_RH} AS INT) AS height,
           {_png_sum_sql(f"(y2 * {_PNG_H}) // {_PNG_RH}",
                         f"(x2 * {_PNG_W}) // {_PNG_RW}")}
    FROM documents,
         unnest(generate_series(0, {_PNG_RH - 1})) AS u(y2),
         unnest(generate_series(0, {_PNG_RW - 1})) AS v(x2)
    GROUP BY doc_id
    """,
    tags=("multimodal", "image", "png", "resize", "mapInPandas"),
)
def multimodal_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail generation through the real byte path: decode each
    doc's PNG, nearest-neighbor resample to {_PNG_RW}x{_PNG_RH}
    (deliberately NON-divisor targets so the floor sampling
    yy = y2*h // H is exercised off the trivial stride), RE-ENCODE to
    PNG, decode THAT, and emit the thumbnail's channel sums — two
    full container roundtrips per image.

    Differential: the oracle maps each target pixel back to its
    source index with the same floor arithmetic and sums the
    closed-form synthesis — resize indexing, both roundtrips, and
    every filter path must all be correct for the hash to match.

    Shape: map-only, same posture as multimodal_png_stats."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_png, encode_png, resize_nearest

    # same CPU-dense repartition as multimodal_png_stats (two decode
    # roundtrips per image make this the costlier of the pair)
    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)
    w, h, rw, rh = _PNG_W, _PNG_H, _PNG_RW, _PNG_RH

    def run(batches):
        yy, xx = np.mgrid[0:h, 0:w]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                px = np.stack(
                    [
                        (int(doc_id) * 7 + yy * 13 + xx * 5 + c * 3) % 256
                        for c in range(3)
                    ],
                    axis=-1,
                ).astype(np.uint8)
                small = resize_nearest(decode_png(encode_png(px)), rw, rh)
                back = decode_png(encode_png(small))
                assert back.shape == (rh, rw, 3)
                sums = back.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (int(doc_id), rw, rh, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return docs.mapInPandas(
        run,
        "doc_id long, width int, height int,"
        " sum_r long, sum_g long, sum_b long",
    )


# ------------------------------------------------------------------
# graph_clustering_coeff — per-node local clustering coefficient
# ------------------------------------------------------------------


@query(
    "graph_clustering_coeff",
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
    -- per-node triangle count by LISTING each triangle (i<j<k) once
    -- and crediting all three corners — a genuinely different
    -- decomposition from the Spark side's per-node wedge closure
    tri AS (
      SELECT e1.a AS i, e1.b AS j, e2.b AS k
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
      SELECT i AS node FROM tri
      UNION ALL SELECT j FROM tri
      UNION ALL SELECT k FROM tri
    ),
    tcount AS (
      SELECT node, CAST(count(*) AS BIGINT) AS t FROM corners GROUP BY node
    )
    SELECT d.node,
           d.d AS degree,
           CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
           CAST(CASE WHEN d.d >= 2
                     THEN coalesce(t.t, 0) * 2000000 // (d.d * (d.d - 1))
                     ELSE 0 END AS BIGINT) AS cc_ppm
    FROM deg d LEFT JOIN tcount t ON d.node = t.node
    """,
    tags=("graph", "triangles", "clustering"),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node on the shared co-supplier
    graph (same df-capped edge recipe as graph_triangles /
    graph_kcore_peel): cc(u) = 2·T(u) / (d(u)·(d(u)−1)) in integer
    ppm, where T(u) counts triangles through u — THE local density
    signal behind community detection and spam-graph filtering.

    Differential decompositions: Spark counts each node's triangles
    by closing WEDGES (adjacency ⋈ adjacency on the center node,
    ordered endpoints, closed against the edge list); the oracle
    lists every triangle once (i<j<k three-way edge join) and credits
    its three corners — two different triangle enumerations that must
    agree node-by-node.

    Shape: the df-cap bounds per-order pair fanout (the same device
    that makes graph_triangles safe); the wedge join is a self-join
    of the adjacency list hash-partitioned on the CENTER node, so
    wedge generation never shuffles the closure probe side twice;
    degree-2 nodes and triangle-free nodes emit cc_ppm = 0/NULL-free
    rows.  At 100 TB the standard refinement is degree-ordered
    orientation (probe from the lower-degree endpoint), which this
    plan inherits from the a<b edge ordering."""
    li = load_table(spark, sf_dir, "lineitem")
    su = (
        li.where(F.col("l_quantity") >= _KCORE_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    capped = (
        su.withColumn("n_s", F.count(F.lit(1)).over(Window.partitionBy("ok")))
        .where(F.col("n_s") <= _KCORE_ORDER_CAP)
        .drop("n_s")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("ea"), F.col("b.s").alias("eb"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = edges.select(F.col("ea").alias("node"), F.col("eb").alias("nb")).unionAll(
        edges.select(F.col("eb").alias("node"), F.col("ea").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    # wedges centered at node with ordered endpoints, closed on edges
    x = adj.alias("x")
    y = adj.alias("y")
    wedges = x.join(
        y,
        (F.col("x.node") == F.col("y.node")) & (F.col("x.nb") < F.col("y.nb")),
    ).select(
        F.col("x.node").alias("node"),
        F.col("x.nb").alias("ea"),
        F.col("y.nb").alias("eb"),
    )
    tri = wedges.join(edges, ["ea", "eb"]).groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        F.expr(
            "CAST(CASE WHEN degree >= 2 THEN"
            " coalesce(triangles, 0) * 2000000 DIV (degree * (degree - 1))"
            " ELSE 0 END AS BIGINT)"
        ).alias("cc_ppm"),
    )


# ------------------------------------------------------------------
# events_type_diversity — per-user Gini impurity over event types
# ------------------------------------------------------------------


@query(
    "events_type_diversity",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST((sum(c) * sum(c) - sum(c * c)) * 1000000
                // (sum(c) * sum(c)) AS BIGINT) AS gini_ppm
    FROM per_type GROUP BY user_id
    """,
    tags=("events", "aggregate", "diversity"),
)
def events_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity as the GINI IMPURITY of the
    event-type distribution, 1 − Σp², in exact integer ppm:
    (n² − Σc²)·10⁶ // n² — the log-free diversity index (entropy's
    integer-exact cousin), the standard one-number signal for
    single-behavior bots (gini → 0) vs broad browsers (gini → max).

    Exactness: all-integer — no logs, no float probabilities; counts
    are exact and the impurity is one floor division, so the hash
    match is unconditional (c ≤ 10⁴ per group here; at larger group
    cardinalities both engines' sums widen to the same BIGINT).

    Shape: two map-side-combinable hash aggregations — (user, type)
    counts, then per-user moments of those counts; the second input
    is at most |users| × |types| rows.  No windows, no explode; at
    100 TB the first agg is the only stage that sees raw events."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_type.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n_events"),
        F.expr(
            "CAST((sum(c) * sum(c) - sum(c * c)) * 1000000"
            " DIV (sum(c) * sum(c)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


# ------------------------------------------------------------------
# text_char_classes — per-doc character-class profile
# ------------------------------------------------------------------


@query(
    "text_char_classes",
    oracle="""
    SELECT doc_id,
           CAST(len(text) AS BIGINT) AS n_chars,
           CAST(len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g'))
                AS BIGINT) AS n_alpha,
           CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
                AS BIGINT) AS n_digit,
           CAST(len(text) - len(regexp_replace(text, ' ', '', 'g'))
                AS BIGINT) AS n_space,
           CAST((len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g')))
                * 1000000 // greatest(len(text), 1) AS BIGINT) AS alpha_ppm
    FROM documents
    """,
    tags=("llm", "text", "quality"),
)
def text_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class profile — alpha / digit /
    whitespace counts and alphabetic density in ppm: the cheapest
    quality-scoring inputs there are (binary-junk detection, OCR
    noise, code-vs-prose priors) and the usual first gate before any
    tokenization pass.

    Differential constructions: Spark counts each class by REMOVING
    every other character and measuring what remains
    (length(regexp_replace(text, '[^…]', ''))); the oracle removes
    the class itself and SUBTRACTS from the total — complementary
    count-vs-complement recipes that must agree per document.

    Shape: map-only over (doc_id, text) — one regex pass per class,
    no shuffle at all; whole-stage codegen'd JVM regexes (the A2
    logparse posture, reference download/common.go regex discipline).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_alpha = "length(regexp_replace(text, '[^A-Za-z]', ''))"
    return docs.select(
        "doc_id",
        F.expr("CAST(length(text) AS BIGINT)").alias("n_chars"),
        F.expr(f"CAST({n_alpha} AS BIGINT)").alias("n_alpha"),
        F.expr(
            "CAST(length(regexp_replace(text, '[^0-9]', '')) AS BIGINT)"
        ).alias("n_digit"),
        F.expr(
            "CAST(length(regexp_replace(text, '[^ ]', '')) AS BIGINT)"
        ).alias("n_space"),
        F.expr(
            f"CAST({n_alpha} * 1000000 DIV greatest(length(text), 1) AS BIGINT)"
        ).alias("alpha_ppm"),
    )


# ------------------------------------------------------------------
# ts_paa — piecewise aggregate approximation of daily series
# ------------------------------------------------------------------

_PAA_SEGMENTS = 6


@query(
    "ts_paa",
    oracle=f"""
    WITH series AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY event_type, day
    ),
    indexed AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS idx,
             count(*) OVER (PARTITION BY event_type) AS len
      FROM series
    )
    SELECT event_type,
           CAST(idx * {_PAA_SEGMENTS} // len AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(v) AS BIGINT) AS sum_cents,
           CAST(sum(v) // count(*) AS BIGINT) AS mean_cents
    FROM indexed
    GROUP BY event_type, idx * {_PAA_SEGMENTS} // len
    """,
    tags=("timeseries", "paa", "compression"),
)
def ts_paa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise Aggregate Approximation: each event type's daily
    value series is compressed to {_PAA_SEGMENTS} equal-width (±1)
    segments of its time axis, emitting per-segment day counts, exact
    cent sums, and mean — THE standard dimensionality reduction
    before any whole-series similarity search (and the PAA stage of
    SAX symbolization); comparing series at 100 TB happens on these
    {_PAA_SEGMENTS}-number signatures, not raw days.

    Segment assignment is the canonical integer form
    idx·S // len (truncating division, identical in both engines),
    so segment boundaries are derived, not stored, and per-type
    series of different lengths land on the same fixed-width
    signature.  All-integer (cent sums, floor mean) — hash-exact.

    Shape: one hash agg to days, one window pair (row_number + count
    over the same per-type partition — single exchange, single
    sort), one final hash agg of |types| × |days| rows."""
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
    w = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    indexed = series.select(
        "event_type",
        "v",
        (F.row_number().over(w) - 1).alias("idx"),
        F.count(F.lit(1)).over(wall).alias("len"),
    )
    return (
        indexed.groupBy(
            "event_type",
            F.expr(f"idx * {_PAA_SEGMENTS} DIV len").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("v").cast("long").alias("sum_cents"),
            F.expr("CAST(sum(v) DIV count(*) AS BIGINT)").alias("mean_cents"),
        )
    )


# ------------------------------------------------------------------
# embed_dim_profile — per-dimension moments of the embedding space
# ------------------------------------------------------------------


@query(
    "embed_dim_profile",
    oracle="""
    SELECT CAST(i - 1 AS INT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                         AS BIGINT)) AS BIGINT) AS s1_milli,
           CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                         AS BIGINT)
                    * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                           AS BIGINT)) AS BIGINT) AS s2_milli,
           CAST(min(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                         AS BIGINT)) AS BIGINT) AS min_milli,
           CAST(max(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000)
                         AS BIGINT)) AS BIGINT) AS max_milli
    FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
    GROUP BY i
    """,
    tags=("llm", "embedding", "statistics"),
)
def embed_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION moment profile of the embedding space: count,
    exact milli-unit sum and sum-of-squares, min and max for every
    coordinate — the inputs to whitening / standardization, dead-
    dimension detection (s2 ≈ 0), and the sanity dashboard every
    embedding pipeline runs after a model swap.

    Exactness: each float32 component widens to DOUBLE exactly, and
    floor(x·1000) of the same double is the same integer in both
    engines; sums of |q| ≤ ~10³ over 500 rows are far inside BIGINT
    (and the recipe widens identically at scale).  Spark explodes
    with 0-based ``posexplode``; the oracle indexes a 1-based
    ``generate_series`` — DuckDB 1.0 has no WITH ORDINALITY — and
    aligns with i − 1.

    Shape: one posexplode then one map-side-combinable hash agg keyed
    on the dimension index — |dims| groups, so the shuffle carries
    |dims| × 6 numbers per map partition regardless of corpus size.
    At 100 TB this is the cheapest full-corpus embedding statistic
    there is (and the explode never shuffles: the agg's partial
    runs in the same stage)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = "CAST(floor(CAST(comp AS DOUBLE) * 1000) AS BIGINT)"
    return (
        emb.select(F.posexplode("embedding").alias("dim", "comp"))
        .select(F.col("dim").cast("int").alias("dim"), F.expr(q).alias("q"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").cast("long").alias("s1_milli"),
            F.sum(F.expr("q * q")).cast("long").alias("s2_milli"),
            F.min("q").cast("long").alias("min_milli"),
            F.max("q").cast("long").alias("max_milli"),
        )
    )


# ------------------------------------------------------------------
# sample_systematic — hash-ordered systematic sampling per stratum
# ------------------------------------------------------------------

_SYS_K = 10  # keep every K-th row of the hash order


@query(
    "sample_systematic",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_orderkey, o_orderpriority,
             row_number() OVER (
               PARTITION BY o_orderpriority ORDER BY md5(CAST(o_orderkey AS VARCHAR))
             ) AS rn
      FROM orders
    )
    WHERE rn % {_SYS_K} = 1
    """,
    tags=("sampling", "systematic"),
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC 1-in-{_SYS_K} sampling on a deterministic hash
    order, stratified by order priority: rank each stratum by
    md5(key) — a uniform, reproducible shuffle of the keyspace — and
    keep every {_SYS_K}-th row.  Systematic-on-hash gives exact
    per-stratum rates (⌈n/{_SYS_K}⌉, no binomial variance — unlike
    Bernoulli sampling) while staying reproducible run-to-run and
    engine-to-engine: the md5 hex order and the rank are identical in
    both, so the SAMPLE ITSELF is hash-checked, not just its size.

    Shape: one window per stratum (rank over the hash order).  At
    100 TB the same guarantees come cheaper when exact ⌈n/k⌉ isn't
    required: filter on a hash residue (md5(key) mod k = 0,
    map-only) — documented trade-off; this key pins the
    exact-rate variant the residue form can't give."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string"))
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.pmod(F.col("rn"), F.lit(_SYS_K)) == 1)
    )


# ------------------------------------------------------------------
# events_survival_curve — signup -> purchase conversion survival
# ------------------------------------------------------------------

_SURV_MAX_DAY = 13  # day grid 0..13 (two weeks)


@query(
    "events_survival_curve",
    oracle=f"""
    WITH s AS (
      SELECT user_id, min(epoch_us(ts)) AS s_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id,
             min((epoch_us(e.ts) - s.s_us) // 86400000000) AS conv_day
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND epoch_us(e.ts) >= s.s_us
      GROUP BY s.user_id
    ),
    u AS (
      SELECT s.user_id, c.conv_day
      FROM s LEFT JOIN conv c ON s.user_id = c.user_id
    )
    SELECT d.day,
           CAST(count(*) AS BIGINT) AS n_at_risk,
           CAST(count(CASE WHEN u.conv_day <= d.day THEN 1 END) AS BIGINT)
             AS n_converted,
           CAST((count(*) - count(CASE WHEN u.conv_day <= d.day THEN 1 END))
                * 1000000 // count(*) AS BIGINT) AS surviving_ppm
    FROM u, (SELECT unnest(generate_series(0, {_SURV_MAX_DAY})) AS day) d
    GROUP BY d.day
    """,
    tags=("events", "survival", "retention"),
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style conversion SURVIVAL CURVE: for each day d
    in 0..{_SURV_MAX_DAY} after a user's first signup, the share of
    signed-up users NOT yet converted (first purchase at or after the
    signup) — the curve behind activation dashboards and churn-model
    labels, complementing ``events_time_to_convert``'s per-user lags
    with the population-level survival function.

    All-integer: conversion day is a truncating microsecond division
    (non-negative by the >= signup filter, so DIV == // == floor),
    survival share in exact ppm.

    Shape: two hash aggregations to one row per signed-up user, then
    a broadcast expansion over the fixed {_SURV_MAX_DAY + 1}-day grid
    and one final |grid|-group aggregation — the heavy side is
    touched twice (signup firsts, purchase-after-signup join) and
    both are equi-joins on user_id; the grid expansion carries
    |users| x {_SURV_MAX_DAY + 1} tiny rows, map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id", F.expr("unix_micros(ts)").alias("us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("s_us"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.expr("unix_micros(ts)").alias("p_us")
    )
    conv = (
        s.join(p, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(
            F.min(F.expr("(p_us - s_us) DIV 86400000000")).alias("conv_day")
        )
    )
    u = s.join(conv, "user_id", "left").select("user_id", "conv_day")
    grid = spark.range(_SURV_MAX_DAY + 1).select(F.col("id").alias("day"))
    return (
        u.crossJoin(F.broadcast(grid))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_at_risk"),
            F.count(F.when(F.col("conv_day") <= F.col("day"), 1))
            .cast("long")
            .alias("n_converted"),
        )
        .select(
            "day",
            "n_at_risk",
            "n_converted",
            F.expr(
                "CAST((n_at_risk - n_converted) * 1000000 DIV n_at_risk"
                " AS BIGINT)"
            ).alias("surviving_ppm"),
        )
    )


# ------------------------------------------------------------------
# multimodal_wav_decimate — 2:1 audio downsample through real bytes
# ------------------------------------------------------------------

_DEC_N = 800  # samples per synthetic clip (matches multimodal_wav_energy)
_DEC_RATE = 8000
_DEC_M = 2  # decimation factor


@query(
    "multimodal_wav_decimate",
    oracle=f"""
    WITH samples AS (
      SELECT doc_id, i,
             (doc_id * 31 + (i * {_DEC_M}) * 17) % 2003 - 1001 AS s
      FROM documents,
           unnest(generate_series(0, {_DEC_N // _DEC_M - 1})) AS u(i)
    )
    SELECT doc_id,
           CAST({_DEC_RATE // _DEC_M} AS INT) AS sample_rate,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(s * s) AS BIGINT) AS energy
    FROM samples GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "resample", "mapInPandas"),
)
def multimodal_wav_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2:1 audio DECIMATION through the real byte path — the audio
    analog of ``multimodal_png_resize``: each doc's deterministic
    waveform is encoded to PCM16 WAV, decoded, every {_DEC_M}-th
    sample kept at half the rate, RE-ENCODED, decoded again, and the
    decimated clip's exact energy emitted — two container roundtrips
    plus the rate bookkeeping, all hash-checked.

    Differential: the oracle synthesizes the DECIMATED sequence
    directly (s at index 2i) and never sees a byte.

    Shape: map-only Arrow stage over the pruned doc_id column (the
    multimodal_wav_energy posture)."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_wav, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n, m, rate = _DEC_N, _DEC_M, _DEC_RATE

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                i = np.arange(n, dtype=np.int64)
                s = (int(doc_id) * 31 + i * 17) % 2003 - 1001
                rate1, back = decode_wav(encode_wav(s.astype("<i2"), rate))
                dec = back[::m]
                rate2, final = decode_wav(
                    encode_wav(dec.astype("<i2"), rate1 // m)
                )
                assert rate2 == rate // m and len(final) == n // m
                energy = int((final.astype(np.int64) ** 2).sum())
                out.append((int(doc_id), rate2, len(final), energy))
            yield pd.DataFrame(
                out, columns=["doc_id", "sample_rate", "n_samples", "energy"]
            )

    return docs.mapInPandas(
        run, "doc_id long, sample_rate int, n_samples long, energy long"
    )


# ------------------------------------------------------------------
# graph_degree_assortativity — degree-degree Pearson over edges
# ------------------------------------------------------------------

# regular graphs (all degrees equal) have zero degree variance: the
# correlation is undefined there and must be NULL in BOTH engines
# (Spark's double x/0 is NaN/Inf; DuckDB's is NULL — so the guard is
# load-bearing, not cosmetic)
_ASSORT_FORMULA = (
    "CASE WHEN m * sxx - sx * sx = 0 THEN NULL"
    " ELSE round(CAST((m * sxy - sx * sx) AS DOUBLE)"
    " / (m * sxx - sx * sx), 6) END"
)


@query(
    "graph_degree_assortativity",
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
    pairs AS (
      SELECT dx.d AS du, dy.d AS dv
      FROM adj j JOIN deg dx ON j.node = dx.node
                 JOIN deg dy ON j.nb = dy.node
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(du) AS BIGINT) AS sx,
             CAST(sum(du * du) AS BIGINT) AS sxx,
             CAST(sum(du * dv) AS BIGINT) AS sxy
      FROM pairs
    )
    SELECT m, sx, sxx, sxy,
           {_ASSORT_FORMULA.replace(" // ", " / ")} AS assortativity
    FROM sums
    """,
    tags=("graph", "statistics", "assortativity"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY of the shared co-supplier graph: the
    Pearson correlation of endpoint degrees over every directed edge
    — positive means hubs attach to hubs (social-network shape),
    negative means hub-and-spoke (infrastructure shape); THE
    one-number topology fingerprint next to clustering coefficient.

    Exactness recipe is the agg_corr pattern: all four moment sums
    are exact BIGINTs (degrees are small ints), the final Pearson is
    ONE shared double expression evaluated on identical integers in
    both engines, rounded at 6dp.  Over the symmetric directed edge
    list the x and y marginals coincide (sx = sy, sxx = syy), so the
    correlation simplifies to (m·sxy − sx²)/(m·sxx − sx²) — computed
    from one pass over the edge list.

    Shape: degree table (one hash agg), two broadcast-sized joins of
    the edge list against it, one global 4-sum aggregate — the edge
    list is touched once; the driver sees a single row."""
    li = load_table(spark, sf_dir, "lineitem")
    su = (
        li.where(F.col("l_quantity") >= _KCORE_MIN_QTY)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    capped = (
        su.withColumn("n_s", F.count(F.lit(1)).over(Window.partitionBy("ok")))
        .where(F.col("n_s") <= _KCORE_ORDER_CAP)
        .drop("n_s")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("ea"), F.col("b.s").alias("eb"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    adj = edges.select(F.col("ea").alias("node"), F.col("eb").alias("nb")).unionAll(
        edges.select(F.col("eb").alias("node"), F.col("ea").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    dx = deg.select(F.col("node"), F.col("d").alias("du"))
    dy = deg.select(F.col("node").alias("nb"), F.col("d").alias("dv"))
    pairs = adj.join(dx, "node").join(dy, "nb")
    sums = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("du").cast("long").alias("sx"),
        F.sum(F.expr("du * du")).cast("long").alias("sxx"),
        F.sum(F.expr("du * dv")).cast("long").alias("sxy"),
    )
    return sums.select(
        "m", "sx", "sxx", "sxy", F.expr(_ASSORT_FORMULA).alias("assortativity")
    )


# ------------------------------------------------------------------
# pipeline_gate_funnel — sequential corpus-hygiene gate accounting
# ------------------------------------------------------------------

_GATE_MIN_CHARS = 200
_GATE_ALPHA_PPM = 600_000
_GATE_DIGIT_PPM = 100_000


@query(
    "pipeline_gate_funnel",
    oracle=f"""
    WITH flags AS (
      SELECT doc_id,
             len(text) >= {_GATE_MIN_CHARS} AS g1,
             (len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g')))
               * 1000000 >= {_GATE_ALPHA_PPM} * greatest(len(text), 1) AS g2,
             (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))
               * 1000000 <= {_GATE_DIGIT_PPM} * greatest(len(text), 1) AS g3
      FROM documents
    ),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(count(CASE WHEN g1 THEN 1 END) AS BIGINT) AS n1,
             CAST(count(CASE WHEN g1 AND g2 THEN 1 END) AS BIGINT) AS n2,
             CAST(count(CASE WHEN g1 AND g2 AND g3 THEN 1 END) AS BIGINT)
               AS n3
      FROM flags
    )
    SELECT s.stage, s.gate,
           CASE s.stage WHEN 1 THEN n0 WHEN 2 THEN n1 ELSE n2 END AS n_in,
           CASE s.stage WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END AS n_out,
           CASE s.stage WHEN 1 THEN (n0 - n1) * 1000000 // greatest(n0, 1)
                        WHEN 2 THEN (n1 - n2) * 1000000 // greatest(n1, 1)
                        ELSE (n2 - n3) * 1000000 // greatest(n2, 1)
           END AS drop_ppm
    FROM counts,
         (VALUES (1, 'min_chars'), (2, 'alpha_ratio'), (3, 'digit_ratio'))
           AS s(stage, gate)
    """,
    tags=("llm", "pipeline", "quality", "observability"),
)
def pipeline_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene GATE FUNNEL accounting: the per-stage in/out/
    drop-rate table every production filtering pipeline publishes
    (the observability layer over text_quality/text_gopher_rules-
    style gates) — three sequential gates (min length, alphabetic
    ratio >= 60%, digit ratio <= 10%), each counted AFTER all prior
    gates, drop rates in exact ppm.

    The ratio gates are spelled in cross-multiplied integer form
    (count·10⁶ >= threshold·len) — no division, no floats, no
    boundary ambiguity.

    Shape: ONE pass over the corpus computes all four cumulative
    counts as conditional aggregates (map-side combined to a single
    row); the 3-row funnel is then a broadcast expansion of that row
    — at 100 TB the funnel costs exactly one scan regardless of gate
    count.  A sequential multi-job implementation (filter, count,
    filter, count...) would scan per gate; this is the fused form."""
    docs = load_table(spark, sf_dir, "documents")
    n_alpha = "length(regexp_replace(text, '[^A-Za-z]', ''))"
    n_digit = "length(regexp_replace(text, '[^0-9]', ''))"
    flags = docs.select(
        F.expr(f"length(text) >= {_GATE_MIN_CHARS}").alias("g1"),
        F.expr(
            f"{n_alpha} * 1000000 >= {_GATE_ALPHA_PPM} * greatest(length(text), 1)"
        ).alias("g2"),
        F.expr(
            f"{n_digit} * 1000000 <= {_GATE_DIGIT_PPM} * greatest(length(text), 1)"
        ).alias("g3"),
    )
    counts = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.count(F.when(F.col("g1"), 1)).cast("long").alias("n1"),
        F.count(F.when(F.col("g1") & F.col("g2"), 1)).cast("long").alias("n2"),
        F.count(F.when(F.col("g1") & F.col("g2") & F.col("g3"), 1))
        .cast("long")
        .alias("n3"),
    )
    stages = spark.createDataFrame(
        [(1, "min_chars"), (2, "alpha_ratio"), (3, "digit_ratio")],
        "stage int, gate string",
    )
    return counts.crossJoin(F.broadcast(stages)).selectExpr(
        "stage",
        "gate",
        "CASE stage WHEN 1 THEN n0 WHEN 2 THEN n1 ELSE n2 END AS n_in",
        "CASE stage WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END AS n_out",
        "CASE stage WHEN 1 THEN (n0 - n1) * 1000000 DIV greatest(n0, 1)"
        " WHEN 2 THEN (n1 - n2) * 1000000 DIV greatest(n1, 1)"
        " ELSE (n2 - n3) * 1000000 DIV greatest(n2, 1) END AS drop_ppm",
    )


# ------------------------------------------------------------------
# agg_ttest_ab — Welch t statistic over the deterministic A/B split
# ------------------------------------------------------------------

# Welch's t from exact integer moments; ONE expression text evaluated
# on identical BIGINTs in both engines (the agg_corr recipe).  NULL
# when either arm lacks the 2 observations variance needs, or when
# both sample variances are zero (0/0 — Spark NaN vs DuckDB NULL).
_TTEST_FORMULA = """
CASE WHEN n_t < 2 OR n_c < 2 THEN NULL
     WHEN (CAST(s2_t AS DOUBLE) - CAST(s1_t AS DOUBLE) * s1_t / n_t)
            / (n_t - 1) / n_t
          + (CAST(s2_c AS DOUBLE) - CAST(s1_c AS DOUBLE) * s1_c / n_c)
            / (n_c - 1) / n_c = 0 THEN NULL
     ELSE round(
       (CAST(s1_t AS DOUBLE) / n_t - CAST(s1_c AS DOUBLE) / n_c)
       / sqrt(
           (CAST(s2_t AS DOUBLE) - CAST(s1_t AS DOUBLE) * s1_t / n_t)
             / (n_t - 1) / n_t
           + (CAST(s2_c AS DOUBLE) - CAST(s1_c AS DOUBLE) * s1_c / n_c)
             / (n_c - 1) / n_c
       ), 6)
END
"""


@query(
    "agg_ttest_ab",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN {_duck_h60("concat('ab:', CAST(user_id AS VARCHAR))")}
                       % 100 < 50
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(floor(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT
        CAST(count(CASE WHEN arm = 'treatment' THEN 1 END) AS BIGINT) AS n_t,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN c END), 0)
             AS BIGINT) AS s1_t,
        CAST(coalesce(sum(CASE WHEN arm = 'treatment' THEN c * c END), 0)
             AS BIGINT) AS s2_t,
        CAST(count(CASE WHEN arm = 'control' THEN 1 END) AS BIGINT) AS n_c,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN c END), 0)
             AS BIGINT) AS s1_c,
        CAST(coalesce(sum(CASE WHEN arm = 'control' THEN c * c END), 0)
             AS BIGINT) AS s2_c
      FROM assigned
    )
    SELECT n_t, s1_t, s2_t, n_c, s1_c, s2_c,
           {_TTEST_FORMULA} AS t_stat
    FROM m
    """,
    tags=("aggregate", "statistics", "experiment", "ab-test"),
)
def agg_ttest_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S T STATISTIC for the deterministic A/B experiment:
    completes ``events_ab_assign`` (which emits the per-arm/week
    moment partials) with the actual experiment readout — the
    two-sample unequal-variance t over purchase values, arms assigned
    by the same sticky md5 ring (salt 'ab:', 50/50).

    Exactness is the agg_corr recipe: the six moment inputs (n, Σc,
    Σc²) per arm are exact BIGINTs from ONE conditional aggregation
    pass; the t statistic is a single shared double expression
    rounded at 6dp.  NULL when an arm has < 2 observations or both
    variances are zero — spelled identically in both engines
    (Spark's 0/0 double is NaN where DuckDB's is NULL, so the guard
    is part of the contract).

    Shape: one scan, one map-side-combinable aggregation to a single
    row — the experimentation platform's cheapest possible readout at
    any scale."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    h = F.expr(_spark_h60("concat('ab:', CAST(user_id AS STRING))"))
    treat = (h % 100 < 50)
    cents = F.floor(F.col("value") * 100).cast("long")
    assigned = ev.select(treat.alias("t"), cents.alias("c"))
    m = assigned.agg(
        F.count(F.when(F.col("t"), 1)).cast("long").alias("n_t"),
        F.coalesce(F.sum(F.when(F.col("t"), F.col("c"))), F.lit(0))
        .cast("long")
        .alias("s1_t"),
        F.coalesce(
            F.sum(F.when(F.col("t"), F.expr("c * c"))), F.lit(0)
        )
        .cast("long")
        .alias("s2_t"),
        F.count(F.when(~F.col("t"), 1)).cast("long").alias("n_c"),
        F.coalesce(F.sum(F.when(~F.col("t"), F.col("c"))), F.lit(0))
        .cast("long")
        .alias("s1_c"),
        F.coalesce(
            F.sum(F.when(~F.col("t"), F.expr("c * c"))), F.lit(0)
        )
        .cast("long")
        .alias("s2_c"),
    )
    return m.select(
        "n_t", "s1_t", "s2_t", "n_c", "s1_c", "s2_c",
        F.expr(_TTEST_FORMULA).alias("t_stat"),
    )


# ------------------------------------------------------------------
# dedup_rate_by_source — exact-duplicate dashboard per source
# ------------------------------------------------------------------


@query(
    "dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           CAST((count(*) - count(DISTINCT md5(text))) * 1000000
                // count(*) AS BIGINT) AS dup_ppm
    FROM documents GROUP BY source
    """,
    tags=("llm", "dedup", "observability"),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate RATE per ingest source — the dedup dashboard
    slice that tells a crawl operator WHICH feed is redundant before
    any pair-level work runs (the content-md5 identity is the
    reference's own, download/common.go:183-190, grouped by origin).

    Shape: one hash aggregation with a distinct-count (Spark plans
    the standard two-phase expand+agg); the only data touched is
    (source, md5(text)) — the text itself reduces to 32 hex chars in
    the scan stage and never shuffles raw."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.md5("text").alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.expr(
                "CAST((n_docs - n_distinct) * 1000000 DIV n_docs AS BIGINT)"
            ).alias("dup_ppm"),
        )
    )


# ------------------------------------------------------------------
# dedup_lsh_tuning — candidate yield / precision per band config
# ------------------------------------------------------------------

# (bands, rows-per-band) splits of the 12-hash MinHash signature;
# banding theory: threshold ~ (1/b)^(1/r) — sweeping configs measures
# the precision/recall trade the pipeline designer actually tunes
_LSH_CONFIGS = ((6, 2), (4, 3), (3, 4), (2, 6))


def _lsh_duck_bands() -> str:
    parts = []
    for b, r in _LSH_CONFIGS:
        # one SELECT per band k of this config
        for k in range(b):
            cols = ", ".join(f"sig[{k * r + j + 1}]" for j in range(r))
            parts.append(
                f"SELECT doc_id, '{b}x{r}' AS cfg,"
                f" concat('{k}:', md5(concat_ws(',', {cols}))) AS band"
                " FROM sigs"
            )
    return " UNION ALL ".join(parts)


@query(
    "dedup_lsh_tuning",
    oracle=f"""
    WITH {_DUCK_SHINGLE_CTE},
    hsets AS (
      SELECT doc_id,
             list_distinct(list_transform(sh, s -> {_duck_h60("s")})) AS hh
      FROM shingled
    ),
    hps AS (
      SELECT doc_id, hh, list_transform(hh, x -> x % {MINHASH_P}) AS hp
      FROM hsets
    ),
    sigs AS (
      SELECT doc_id,
             list_transform(generate_series(0, {N_HASHES - 1}),
               i -> list_aggregate(
                      list_transform(hp,
                        x -> ({MINHASH_A}[i + 1] * x + {MINHASH_B}[i + 1])
                             % {MINHASH_P}),
                      'min')) AS sig
      FROM hps
    ),
    bands AS ({_lsh_duck_bands()}),
    cand AS (
      SELECT DISTINCT a.cfg, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.cfg = b.cfg AND a.band = b.band AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT c.cfg,
             len(list_intersect(sa.hh, sb.hh)) * 2
               >= len(sa.hh) + len(sb.hh) - len(list_intersect(sa.hh, sb.hh))
               AS is_true
      FROM cand c
      JOIN hsets sa ON sa.doc_id = c.doc_a
      JOIN hsets sb ON sb.doc_id = c.doc_b
    )
    SELECT cfg,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(count(CASE WHEN is_true THEN 1 END) AS BIGINT) AS n_true,
           CAST(count(CASE WHEN is_true THEN 1 END) * 1000000
                // count(*) AS BIGINT) AS precision_ppm
    FROM scored GROUP BY cfg
    """,
    tags=("llm", "dedup", "lsh", "tuning", "observability"),
)
def dedup_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BAND-CONFIGURATION sweep: candidate-pair yield and
    verification precision for every (bands x rows) split of the
    12-hash MinHash signature — {_LSH_CONFIGS} — the measurement a
    pipeline designer runs to pick the banding before committing a
    100 TB pass (theory: threshold ~ (1/b)^(1/r); this key measures
    the actual trade on the corpus).

    The signature table is computed ONCE and fanned out to all four
    configs (the persisted-artifact posture); candidates stay banded
    per config (never all-pairs), and verification reuses the hashed
    postings co-occurrence count.  Precision in exact ppm; true pair
    = exact Jaccard >= 0.5 (the dedup_minhash keep threshold).

    Shape: |configs| x |bands| band rows per doc, one self-join per
    the shared (cfg, band) key — the sweep costs ~2x one production
    config, not 4x, because candidate verification dominates and
    candidate sets overlap heavily across configs."""
    docs = load_table(spark, sf_dir, "documents")
    ss = hashed_shingle_sets(docs).localCheckpoint()
    hp = ss.withColumn("hp", F.expr(f"pmod(h, {MINHASH_P})"))
    sigs = hp.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"pmod({MINHASH_A[i]} * hp + {MINHASH_B[i]}, {MINHASH_P})")
            ).alias(f"m{i}")
            for i in range(N_HASHES)
        ]
    ).localCheckpoint()
    # All four configs' band rows come out of ONE explode over the
    # checkpointed signature table instead of a 4-way union of
    # per-config selects: identical rows (same cfg labels, same
    # "k:"+md5 band keys), but the logical tree the self-join below
    # duplicates — and that AQE re-optimizes at every stage boundary
    # — is one project+generate, not four unioned scans.  The frame
    # is then checkpointed: both self-join sides and the band
    # exchange read the |docs| x sum(b) materialized rows rather
    # than re-expanding the explode per side (guide §2.4, §3.3
    # "materialising an intermediate truncates the plan").
    cb = []
    for b, r in _LSH_CONFIGS:
        for k in range(b):
            cb.append(
                F.struct(
                    F.lit(f"{b}x{r}").alias("cfg"),
                    F.concat(
                        F.lit(f"{k}:"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"m{k * r + j}").cast("string")
                                    for j in range(r)
                                ],
                            )
                        ),
                    ).alias("band"),
                )
            )
    bands = (
        sigs.select("doc_id", F.explode(F.array(*cb)).alias("cb"))
        .select("doc_id", "cb.cfg", "cb.band")
        .localCheckpoint()
    )
    a = bands.alias("a")
    b_ = bands.alias("b")
    # ONE (doc_a, doc_b) aggregation replaces the former
    # distinct(cfg, a, b) + distinct(a, b) + join-back chain: the
    # band self-join's raw hits group straight into per-pair config
    # SETS (collect_set dedupes multi-band hits within a config
    # exactly like the old distinct), the pair list for verification
    # falls out as the group keys, and the per-config candidate
    # rows are re-expanded by an explode AFTER the verdict join —
    # 2 fewer aggregation exchanges and 2 fewer sequential AQE
    # stages on a key that is driver-latency-bound (profiled at r16:
    # ~18 sequential sub-second query stages).  Identical rows: cfg
    # sets per pair == the old distinct candidate triples.
    pair_cfgs = (
        a.join(
            b_,
            (F.col("a.cfg") == F.col("b.cfg"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.cfg").alias("cfg"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.collect_set("cfg").alias("cfgs"))
    )
    verified = _verified_pairs(
        ss, pair_cfgs.select("doc_a", "doc_b"), keep_ratio=2
    ).select("doc_a", "doc_b", F.lit(True).alias("is_true"))
    scored = pair_cfgs.join(verified, ["doc_a", "doc_b"], "left").select(
        F.explode("cfgs").alias("cfg"),
        F.coalesce(F.col("is_true"), F.lit(False)).alias("is_true"),
    )
    return scored.groupBy("cfg").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.count(F.when(F.col("is_true"), 1)).cast("long").alias("n_true"),
        F.expr(
            "CAST(count(CASE WHEN is_true THEN 1 END) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("precision_ppm"),
    )


# ------------------------------------------------------------------
# multimodal_phash_dedup — average-hash image dedup, real byte path
# ------------------------------------------------------------------

_PH_CELLS = 8  # aHash grid: 8x8 = 64 bits


def _phash_gray_sql(y_expr: str, x_expr: str) -> str:
    """Closed-form grayscale (channel sum) at a sampled source pixel."""
    return " + ".join(
        f"(doc_id * 7 + ({y_expr}) * 13 + ({x_expr}) * 5 + {c} * 3) % 256"
        for c in range(3)
    )


@query(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH cells AS (
      SELECT doc_id,
             y2 * {_PH_CELLS} + x2 AS cell,
             {_phash_gray_sql(f"(y2 * {_PNG_H}) // {_PH_CELLS}",
                              f"(x2 * {_PNG_W}) // {_PH_CELLS}")} AS gray
      FROM documents,
           unnest(generate_series(0, {_PH_CELLS - 1})) AS u(y2),
           unnest(generate_series(0, {_PH_CELLS - 1})) AS v(x2)
    ),
    tot AS (
      SELECT doc_id, sum(gray) AS total FROM cells GROUP BY doc_id
    ),
    bits AS (
      SELECT c.doc_id, c.cell,
             CASE WHEN c.gray * {_PH_CELLS * _PH_CELLS} > t.total
                  THEN '1' ELSE '0' END AS b
      FROM cells c JOIN tot t ON c.doc_id = t.doc_id
    ),
    folded AS (
      SELECT doc_id, string_agg(b, '' ORDER BY cell) AS ahash
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id, ahash,
           CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS cluster_size,
           count(*) OVER (PARTITION BY ahash) > 1 AS is_dup
    FROM folded
    """,
    tags=("multimodal", "image", "dedup", "phash", "mapInPandas"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash IMAGE dedup through the real byte path: each
    doc's PNG is decoded, nearest-neighbor downsampled to the
    {_PH_CELLS}x{_PH_CELLS} aHash grid, grayscaled (channel sum), and
    thresholded against the grid mean into a 64-bit signature; images
    sharing a signature cluster as near-duplicates — the standard
    first-pass image dedup (average hash), with the byte path (PNG
    inflate + unfilter + resample) inside the hash-checked contract.

    The synthesis plants GENUINE duplicate clusters: pixel values
    depend on doc_id only mod 256, so docs d and d+256 render
    identical images — the key must group them (and the planted-dup
    property test pins that recall directly).

    Differential: the oracle computes the same signature closed-form
    (sampled-index arithmetic, integer cross-multiplied mean compare
    gray·64 > Σgray) and never sees a byte.

    Shape: one Arrow stage over the repartitioned key column emits
    (doc_id, 64-char signature); clustering is one window count over
    the signature hash — at corpus scale the shuffle carries 8 bytes
    + 64 chars per image, never pixels."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_png, encode_png, resize_nearest

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)
    w, h, g = _PNG_W, _PNG_H, _PH_CELLS

    def run(batches):
        yy, xx = np.mgrid[0:h, 0:w]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                px = np.stack(
                    [
                        (int(doc_id) * 7 + yy * 13 + xx * 5 + c * 3) % 256
                        for c in range(3)
                    ],
                    axis=-1,
                ).astype(np.uint8)
                small = resize_nearest(decode_png(encode_png(px)), g, g)
                gray = small.astype(np.int64).sum(axis=2)
                total = int(gray.sum())
                bits = (gray.reshape(-1) * (g * g) > total).astype(np.uint8)
                out.append((int(doc_id), "".join("1" if b else "0" for b in bits)))
            yield pd.DataFrame(out, columns=["doc_id", "ahash"])

    sigs = docs.mapInPandas(run, "doc_id long, ahash string")
    w_cl = Window.partitionBy("ahash")
    return sigs.select(
        "doc_id",
        "ahash",
        F.count(F.lit(1)).over(w_cl).cast("long").alias("cluster_size"),
        (F.count(F.lit(1)).over(w_cl) > 1).alias("is_dup"),
    )


# ------------------------------------------------------------------
# text_lang_confusion — declared-vs-detected language matrix
# ------------------------------------------------------------------


def _langid_case_sql() -> str:
    """The text_langid argmax CASE (fixed tie-break en>de>fr>es>zh),
    generated from LANG_PROFILES so this key cannot drift from the
    classifier it audits."""
    langs = list(LANG_PROFILES)
    arms = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs[i + 1 :]
        )
        arms.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(arms) + f" ELSE '{langs[-1]}' END"


@query(
    "text_lang_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(
               f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT)"
               f" AS s_{lang}"
               for lang, pat in LANG_PROFILES.items())}
      FROM documents
    ),
    pred AS (
      SELECT lang AS declared, {_langid_case_sql()} AS detected
      FROM scored
    )
    SELECT declared, detected,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) * 1000000 //
                sum(count(*)) OVER (PARTITION BY declared) AS BIGINT)
             AS row_ppm
    FROM pred GROUP BY declared, detected
    """,
    tags=("llm", "text", "langid", "observability"),
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LANGUAGE CONFUSION MATRIX: declared corpus label x detected
    language (the text_langid argmax heuristic), with each cell's
    share of its declared row in exact ppm — the audit table that
    turns a per-doc classifier into a corpus-level quality decision
    (which declared languages does the detector actually recognize,
    and where does the mass leak).  The CASE/argmax is generated from
    the SAME ``LANG_PROFILES`` the classifier uses, so this key
    cannot drift from ``text_langid``.

    Shape: one map pass scores five regexes per doc; the matrix is a
    |langs|² hash aggregation plus a window over |langs|² rows."""
    docs = load_table(spark, sf_dir, "documents")
    c = _lang_scores(F.col("text"))
    langs = list(LANG_PROFILES)
    expr = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            piece = c[lang] >= c[other]
            cond = piece if cond is None else (cond & piece)
        expr = (
            F.when(cond, F.lit(lang))
            if expr is None
            else expr.when(cond, F.lit(lang))
        )
    detected = expr.otherwise(F.lit(langs[-1]))
    cells = (
        docs.select(F.col("lang").alias("declared"), detected.alias("detected"))
        .groupBy("declared", "detected")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_row = Window.partitionBy("declared")
    return cells.withColumn("row_total", F.sum("n").over(w_row)).selectExpr(
        "declared",
        "detected",
        "n",
        "CAST(n * 1000000 DIV row_total AS BIGINT) AS row_ppm",
    )


# ------------------------------------------------------------------
# agg_spearman — rank correlation via exact 2x-scaled average ranks
# ------------------------------------------------------------------

# Pearson over the integer 2x-ranks; shared double formula at 6dp,
# NULL when either rank variance is zero (constant column).  The
# zero-variance GUARD must stay exact, and sx ~ n², so sx*sx ~ n⁴
# blows past int64 around n = 55k rows per group — the guard widens
# per engine (Spark DECIMAL(38,0), DuckDB HUGEINT; both exact to
# ~1e38, i.e. n up to ~3e9 per group).  The 10x shape stress caught
# exactly this overflow at 200k rows/group (sf1 shape run, r10).
def _spearman_formula(engine: str) -> str:
    wide = "DECIMAL(38,0)" if engine == "spark" else "HUGEINT"

    def w(prod: str) -> str:
        a, b = prod.split(" * ")
        return f"CAST({a} AS {wide}) * {b}"

    return f"""
CASE WHEN {w("n * sxx")} - {w("sx * sx")} = 0
       OR {w("n * syy")} - {w("sy * sy")} = 0 THEN NULL
     ELSE round(
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
END
"""


@query(
    "agg_spearman",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type,
             -- 2x-scaled AVERAGE rank of value (ties share the mean
             -- of their rank range): 2*avg = 2*rank + (ties - 1)
             2 * rank() OVER (PARTITION BY event_type ORDER BY value)
               + count(*) OVER (PARTITION BY event_type, value) - 1 AS rx,
             -- time order is unique under the (ts, event_id) tie-break
             2 * row_number() OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS ry
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(rx) AS BIGINT) AS sx,
             CAST(sum(ry) AS BIGINT) AS sy,
             CAST(sum(rx * rx) AS BIGINT) AS sxx,
             CAST(sum(ry * ry) AS BIGINT) AS syy,
             CAST(sum(rx * ry) AS BIGINT) AS sxy
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n, {_spearman_formula("duck")} AS spearman
    FROM sums
    """,
    tags=("aggregate", "statistics", "rank-correlation", "timeseries"),
)
def agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN rank correlation between event VALUE and TIME ORDER
    per event type — the robust monotonic-trend detector (is this
    metric drifting up over time, outlier-proof?), complementing
    ts_trend's least-squares slope with a distribution-free statistic.

    Exactness: Spearman is Pearson over ranks, and ranks are made
    exact integers by 2x-scaling the tie-averaged rank (ties share
    the mean of their range: 2·avg = 2·rank + ties − 1 — integer
    always); the time axis ranks uniquely under the (ts, event_id)
    tie-break.  The five moment sums are exact BIGINTs; the final
    coefficient is one shared double formula at 6dp, NULL when either
    marginal is constant (zero rank variance) in both engines.

    Shape: one exchange per type partition drives BOTH rank windows
    (same partition key), then a map-side-combinable moment
    aggregation — |types| output rows, no joins."""
    ev = load_table(spark, sf_dir, "events")
    w_val = Window.partitionBy("event_type").orderBy("value")
    w_ties = Window.partitionBy("event_type", "value")
    w_time = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # rank()/row_number() are 32-bit INTs: widen to BIGINT before any
    # arithmetic — ry² overflows int32 past ~23k rows per group (the
    # sf1 shape stress caught this at 200k rows/group)
    ranked = ev.select(
        "event_type",
        (
            2 * F.rank().over(w_val).cast("long")
            + F.count(F.lit(1)).over(w_ties)
            - 1
        ).alias("rx"),
        (2 * F.row_number().over(w_time).cast("long")).alias("ry"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.expr("rx * rx")).cast("long").alias("sxx"),
        F.sum(F.expr("ry * ry")).cast("long").alias("syy"),
        F.sum(F.expr("rx * ry")).cast("long").alias("sxy"),
    )
    return sums.select(
        "event_type", "n", F.expr(_spearman_formula("spark")).alias("spearman")
    )


# ------------------------------------------------------------------
# multimodal_video_luma — frame-sampled stats through real Y4M bytes
# ------------------------------------------------------------------

_VID_W = 16
_VID_H = 12
_VID_FRAMES = 12
_VID_STEP = 3  # keep every 3rd frame (the frame-sample stage)
_VID_FPS = 25

# plane value at (doc, frame, y, x, c) — closed-form synthesis shared
# with the oracle (c = 0 is the luma plane)
_VID_PIX = "(doc_id * 11 + {f} * 29 + {y} * 13 + {x} * 5 + {c} * 3) % 256"


@query(
    "multimodal_video_luma",
    oracle=f"""
    SELECT doc_id,
           CAST(f AS BIGINT) AS frame_no,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum({_VID_PIX.format(f="f", y="y", x="x", c=0)}) AS BIGINT)
             AS luma_sum
    FROM documents,
         unnest(generate_series(0, {_VID_FRAMES - 1}, {_VID_STEP})) AS u(f),
         unnest(generate_series(0, {_VID_H - 1})) AS v(y),
         unnest(generate_series(0, {_VID_W - 1})) AS w(x)
    GROUP BY doc_id, f
    """,
    tags=("multimodal", "video", "frame-sample", "mapInPandas"),
)
def multimodal_video_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAME-SAMPLING through a REAL video container: each doc's
    deterministic {_VID_FRAMES}-frame clip is encoded to a genuine
    YUV4MPEG2 stream (the standard uncompressed interchange format —
    header + FRAME markers + planar Y'UV bytes, C444), DECODED back
    inside the Arrow stage, every {_VID_STEP}rd frame sampled, and
    the sampled frames' exact luma sums emitted — the
    decode/frame-sample shape of a video training-data pipeline with
    the container parsing inside the hash-checked contract.  Retires
    the video-side manifest-stub caveat the way multimodal_png_stats
    retired the image one (codec-library formats like H.264 stay
    honest stubs; the CONTAINER layer here is real).

    Differential: the oracle recomputes sampled-frame luma sums from
    the closed-form plane synthesis and never sees a byte.

    Shape: map-only Arrow stage over the repartitioned key column
    (the PNG keys' posture); at 100 TB the synthesis select becomes a
    binaryFile scan partitioned by clip."""
    import numpy as np
    import pandas as pd

    from downloader_spark.media import decode_y4m, encode_y4m

    n = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(n)
    w, h, nf, step, fps = _VID_W, _VID_H, _VID_FRAMES, _VID_STEP, _VID_FPS

    def run(batches):
        ff, yy, xx, cc = np.mgrid[0:nf, 0:h, 0:w, 0:3]
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                clip = (
                    (int(doc_id) * 11 + ff * 29 + yy * 13 + xx * 5 + cc * 3)
                    % 256
                ).astype(np.uint8)
                got_fps, back = decode_y4m(encode_y4m(clip, fps))
                assert got_fps == fps and back.shape == (nf, h, w, 3)
                for f in range(0, nf, step):
                    luma = int(back[f, :, :, 0].astype(np.int64).sum())
                    out.append((int(doc_id), f, h * w, luma))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_no", "n_pixels", "luma_sum"]
            )

    return docs.mapInPandas(
        run, "doc_id long, frame_no long, n_pixels long, luma_sum long"
    )
