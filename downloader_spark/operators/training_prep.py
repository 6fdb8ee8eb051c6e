"""Training-data preparation operators: sequence packing, document
chunking, mixture-weighted sampling, and embedding quantization —
the last-mile transforms between a cleaned corpus and a training run
(SURVEY.md §2.B north star; the reference stops at publishing files,
common.go:103-111 — these are the corpus-scale continuation).

Cross-engine exactness: every operator below is integer arithmetic
(token counts, cumulative sums, floor divisions, md5-derived hash
gates) or double arithmetic with identical operands and operation
order on both engines — no order-dependent float aggregation
anywhere.

Scale notes (100 TB):
- ``pack_sequences`` packs per (lang, shard), never globally: the
  concat-and-split rule is inherently sequential within one stream,
  so production packing shards the corpus and packs each shard
  independently — the window partitions stay bounded regardless of
  corpus size, and the shuffle key (lang, shard) is uniform.
- ``text_chunk`` is a pure map + explode — embarrassingly parallel,
  no shuffle at all.
- ``sample_mixture`` aggregates 5 lang counts (tiny), broadcasts the
  rate table, and gates each row on an md5 hash — one scan, one
  broadcast, zero data shuffles.
- ``embed_quantize`` is a per-row projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60
from downloader_spark.plans.registry import query

# Concat-and-split packing: token budget per training sequence.
PACK_BUDGET = 128
# Shards per language: the unit of packing parallelism.  At 100 TB
# this would be O(corpus / target-shard-size) instead of a constant.
PACK_SHARDS = 4

# Overlapping chunking: window of CHUNK_W tokens advancing CHUNK_S.
CHUNK_W = 64
CHUNK_S = 48

# Mixture sampling: target corpus size and per-language weight (ppm).
MIX_TARGET = 250
MIX_EN_PPM = 400_000
MIX_OTHER_PPM = 150_000

# Quantization: symmetric int8 range.
Q_LEVELS = 127


@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, lang, shard, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT doc_id, lang, shard, n_tok,
           CAST((cum - n_tok) // {PACK_BUDGET} AS BIGINT) AS start_seq,
           CAST((cum - 1) // {PACK_BUDGET} AS BIGINT) AS end_seq,
           CAST((cum - 1) // {PACK_BUDGET}
                - (cum - n_tok) // {PACK_BUDGET} AS BIGINT) AS n_splits
    FROM c
    """,
    tags=("llm", "training-data", "packing", "window"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing — assign every document its
    position in the fixed-budget training sequences that a
    concatenate-then-chop pretraining loader would emit.  Documents
    are streamed per (lang, shard) in doc_id order; a running token
    total places each doc at [cum - n_tok, cum) in the concatenated
    stream, so its first/last sequence ids are floor divisions of
    the interval endpoints and ``n_splits`` counts the sequence
    boundaries cutting through it (the "document fragmentation"
    metric packing strategies are judged on).

    All integers: token counts, one window SUM, two floor divisions
    — bit-exact cross-engine.  The window partitions by (lang,
    shard), not lang alone: packing is sequential within a stream by
    construction, so the scale unit is the shard — partitions stay
    bounded at any corpus size and the single shuffle key is
    uniform.  Map-side the scan only carries (doc_id, lang, 1 token
    count) — the text never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).cast("long").alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = toks.withColumn("cum", F.sum("n_tok").over(w))
    start = F.expr(f"(cum - n_tok) DIV {PACK_BUDGET}")
    end = F.expr(f"(cum - 1) DIV {PACK_BUDGET}")
    return c.select(
        "doc_id",
        "lang",
        "shard",
        "n_tok",
        start.cast("long").alias("start_seq"),
        end.cast("long").alias("end_seq"),
        (end - start).cast("long").alias("n_splits"),
    )


@query(
    "text_chunk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ), g AS (
      SELECT doc_id, n, toks,
             unnest(generate_series(0,
               CASE WHEN n <= {CHUNK_W} THEN 0
                    ELSE CAST((n - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S}
                              AS BIGINT) END)) AS ci
      FROM t
    )
    SELECT doc_id,
           CAST(ci AS BIGINT) AS chunk_idx,
           CAST(ci * {CHUNK_S} AS BIGINT) AS start_tok,
           CAST(LEAST({CHUNK_W}, n - ci * {CHUNK_S}) AS BIGINT)
             AS chunk_tokens,
           md5(array_to_string(
             toks[CAST(ci * {CHUNK_S} + 1 AS BIGINT):
                  CAST(ci * {CHUNK_S}
                       + LEAST({CHUNK_W}, n - ci * {CHUNK_S}) AS BIGINT)],
             ' ')) AS chunk_md5
    FROM g
    """,
    tags=("llm", "training-data", "chunking", "explode"),
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/embedding
    prep step: split every document into windows of {CHUNK_W} tokens
    advancing by {CHUNK_S} (16-token overlap), so no token falls
    more than one window from a chunk boundary.  The chunk count is
    ``1 + ceil((n - W) / S)`` (one chunk for short docs), realized
    as an exploded 0..k sequence; each chunk carries its token
    offset, length, and the md5 of its reassembled text (the md5
    keeps the checked surface exact without hashing raw arrays).

    Pure map + explode: no shuffle, no window — at 100 TB this is
    an embarrassingly parallel scan whose output is ~(n/S)/doc
    rows.  Tokenization is ``split(text, ' ')`` (corpus is
    single-space normalized, test-asserted) so both engines slice
    identical token arrays."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )
    last_ci = F.when(F.col("n") <= CHUNK_W, F.lit(0)).otherwise(
        F.expr(f"(n - {CHUNK_W} + {CHUNK_S} - 1) DIV {CHUNK_S}")
    )
    g = t.select(
        "doc_id",
        "n",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), last_ci.cast("long"))).alias("ci"),
    )
    chunk_len = F.least(F.lit(CHUNK_W), F.col("n") - F.col("ci") * CHUNK_S)
    return g.select(
        "doc_id",
        F.col("ci").cast("long").alias("chunk_idx"),
        (F.col("ci") * CHUNK_S).cast("long").alias("start_tok"),
        chunk_len.cast("long").alias("chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(
                    F.col("toks"),
                    (F.col("ci") * CHUNK_S + 1).cast("int"),
                    chunk_len.cast("int"),
                ),
            )
        ).alias("chunk_md5"),
    )


_MIX_W_SQL = f"CASE lang WHEN 'en' THEN {MIX_EN_PPM} ELSE {MIX_OTHER_PPM} END"


@query(
    "sample_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY lang
    ), rates AS (
      SELECT lang, c,
             LEAST(1000000, ({MIX_TARGET} * ({_MIX_W_SQL})) // c) AS accept_ppm
      FROM counts
    )
    SELECT d.doc_id, d.lang, r.accept_ppm
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_duck_h60("concat('mix:', CAST(d.doc_id AS VARCHAR))")} % 1000000
          < r.accept_ppm
    """,
    tags=("llm", "training-data", "sampling", "broadcast"),
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling — downsample each language to hit a
    target mixture (en 40%, others 15% each, {MIX_TARGET} docs
    total) regardless of the natural distribution.  The acceptance
    rate per language is an exact integer ppm derived from the
    observed counts (``target_share // observed``, capped at 1e6 for
    under-represented languages), and membership is gated on an
    md5-derived hash of the doc id — reproducible under
    repartitioning, rerunning, and engine choice, unlike
    ``df.sample`` (seed-dependent on partitioning).

    Plan: one tiny aggregation (|langs| rows), broadcast back onto
    the scan, map-side hash gate — zero data shuffles.  At 100 TB
    the rate table is still |domains| rows; the corpus never
    moves."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("c"))
    rates = counts.select(
        "lang",
        "c",
        F.least(
            F.lit(1_000_000).cast("long"),
            F.expr(f"({MIX_TARGET} * ({_MIX_W_SQL})) DIV c"),
        ).alias("accept_ppm"),
    )
    gate = F.expr(
        f"{_spark_h60(chr(39) + 'mix:' + chr(39) + ' || CAST(doc_id AS STRING)')}"
        " % 1000000"
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(gate < F.col("accept_ppm"))
        .select("doc_id", "lang", "accept_ppm")
    )


@query(
    "embed_quantize",
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), s AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS scale
      FROM v
    ), q AS (
      SELECT vec_id, scale,
             list_transform(e, x -> CAST(floor(x * {Q_LEVELS} / scale)
                                         AS BIGINT)) AS qv
      FROM s WHERE scale > 0
    )
    SELECT vec_id,
           CAST(floor(scale * 1000000) AS BIGINT) AS scale_upm,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           md5(array_to_string(qv, ',')) AS q_md5
    FROM q
    """,
    tags=("llm", "embedding", "quantization"),
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the storage/serving
    compression step for a 100 TB embedding corpus (4 bytes/dim →
    1).  Per vector: scale = max |x|, code = floor(x * {Q_LEVELS} /
    scale) ∈ [-{Q_LEVELS}-1, {Q_LEVELS}].  Floor (not round) keeps
    the codes bit-exact cross-engine: both engines widen the float
    input to double, run the identical double multiply/divide, and
    floor — no rounding-mode divergence (round() is HALF_UP in
    Spark, banker's in some engines).  The checked surface is the
    code-array md5 plus integer stats (sum/min/max) and the
    micro-scaled scale factor; zero vectors are dropped (scale 0
    has no quantization).

    Pure projection: array transform + aggregate expressions, no
    Python, no shuffle — embarrassingly parallel at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e")
    )
    s = v.select(
        "vec_id", "e", F.expr("array_max(transform(e, x -> abs(x)))").alias("scale")
    )
    q = s.filter(F.col("scale") > 0).select(
        "vec_id",
        "scale",
        F.expr(
            f"transform(e, x -> CAST(floor(x * {Q_LEVELS} / scale) AS BIGINT))"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        F.expr("CAST(floor(scale * 1000000) AS BIGINT)").alias("scale_upm"),
        F.expr(
            "CAST(aggregate(qv, CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)"
        ).alias("q_sum"),
        F.expr("CAST(array_min(qv) AS BIGINT)").alias("q_min"),
        F.expr("CAST(array_max(qv) AS BIGINT)").alias("q_max"),
        F.md5(F.concat_ws(",", F.expr("transform(qv, x -> CAST(x AS STRING))"))).alias(
            "q_md5"
        ),
    )


# BPE pair mining: top merge candidates surfaced per round.
BPE_TOP_K = 30


@query(
    "text_bpe_pairs",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS nw
      FROM words
      WHERE len(w) >= 2 AND regexp_full_match(w, '[a-z]+')
      GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair, nw
      FROM vocab, unnest(generate_series(1, len(w) - 1)) AS t(i)
    ),
    counted AS (
      SELECT pair, CAST(sum(nw) AS BIGINT) AS n
      FROM pairs GROUP BY pair
    )
    SELECT pair, n,
           CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rank
    FROM counted
    QUALIFY rank <= {BPE_TOP_K}
    """,
    tags=("llm", "text", "tokenizer", "bpe"),
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-step workhorse: corpus-frequency-weighted counts of
    adjacent CHARACTER pairs inside words, top-30 merge candidates —
    exactly the statistic a byte-pair-encoding tokenizer trainer
    computes every merge round (char-level round 0 here).

    The scale trick is the one real BPE trainers use: collapse the
    corpus to its VOCAB first (one map-side-combinable word count),
    then enumerate pairs over the vocab table — pair generation cost
    scales with |vocab|, not corpus tokens, because each distinct
    word carries its frequency as a weight.  The global top-k is
    TakeOrderedAndProject (per-partition heaps), and the rank window
    runs over 30 survivors only."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.length("w") >= 2) & F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    pairs = vocab.select(
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        "w",
        "nw",
    ).select(F.expr("substr(w, i, 2)").alias("pair"), "nw")
    counted = pairs.groupBy("pair").agg(F.sum("nw").alias("n"))
    top = counted.orderBy(F.col("n").desc(), F.col("pair")).limit(BPE_TOP_K)
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return top.withColumn("rank", F.row_number().over(w))


# Curriculum bands: docs are staged shortest-first in 512-char bands.
CURR_BAND_CHARS = 512
CURR_MAX_BAND = 7
# Sub-bucketing fans each band into 16 hash buckets so no ranking
# window ever sees more than band/16 of the data.
CURR_BUCKETS = 16


@query(
    "curriculum_order",
    oracle=f"""
    SELECT doc_id,
           CAST(least(n_chars // {CURR_BAND_CHARS}, {CURR_MAX_BAND}) AS BIGINT)
             AS band,
           CAST(row_number() OVER (
             ORDER BY least(n_chars // {CURR_BAND_CHARS}, {CURR_MAX_BAND}),
                      md5(CAST(doc_id AS VARCHAR)),
                      doc_id
           ) AS BIGINT) AS global_pos
    FROM documents
    """,
    tags=("llm", "training", "curriculum", "global-order"),
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: every document gets its global training
    position — shortest-band first (easy-to-hard scheduling), shuffled
    within each band by a reproducible md5 of the doc id (never an
    RNG: re-runs and engines must agree).

    The oracle is ONE global row_number over (band, md5, doc_id).
    Spark refuses that single-partition sort and builds the same
    total order with the two-phase distributed ranking recipe:
    (1) count per (band, md5-prefix-bucket) — a tiny grid of at most
    8x16 cells; (2) running-sum offsets over that grid in one
    window over a handful of rows; (3) rank WITHIN each
    (band, bucket) — windows partitioned by bucket, so no partition
    ever holds more than ~1/128th of the corpus; (4) position =
    grid offset + local rank.  Because a bucket's md5s all share the
    prefix hex digit, (band, bucket, md5) order IS (band, md5)
    order — the concatenation is exact, and the same recipe is how
    any global ORDER BY ships at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.expr(
            f"CAST(least(n_chars DIV {CURR_BAND_CHARS}, {CURR_MAX_BAND}) AS BIGINT)"
        ).alias("band"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn(
        "bucket", F.conv(F.substring("h", 1, 1), 16, 10).cast("int")
    )
    grid = keyed.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    wg = (
        Window.orderBy("band", "bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = grid.select(
        "band",
        "bucket",
        F.coalesce(F.sum("n").over(wg), F.lit(0)).alias("offset"),
    )
    wl = Window.partitionBy("band", "bucket").orderBy("h", "doc_id")
    local = keyed.withColumn("r", F.row_number().over(wl))
    return (
        local.join(F.broadcast(offsets), ["band", "bucket"])
        .select(
            "doc_id",
            "band",
            (F.col("offset") + F.col("r")).cast("long").alias("global_pos"),
        )
    )


# Negative sampling: negatives drawn per anchor from its md5 bucket.
NEG_K = 4


@query(
    "sample_negative",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, h, bucket,
             row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS r
      FROM keyed
    ),
    cands AS (
      SELECT a.doc_id AS anchor_id, m.doc_id AS neg_id, m.h AS neg_h
      FROM keyed a
      JOIN ranked m ON m.bucket = a.bucket
                   AND m.r <= {NEG_K + 1}
                   AND m.doc_id <> a.doc_id
    )
    SELECT anchor_id, neg_id,
           CAST(row_number() OVER (
             PARTITION BY anchor_id ORDER BY neg_h, neg_id
           ) AS INT) AS neg_rank
    FROM cands
    QUALIFY neg_rank <= {NEG_K}
    """,
    tags=("llm", "training", "sampling", "contrastive"),
)
def sample_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor document draws up to K=4 negatives — the md5-smallest
    members of its own md5-prefix bucket (excluding itself).  An RNG
    sampler can't be oracle-checked or reproduced across engines; the
    md5 ring gives every anchor a pseudo-random but STABLE negative
    set, the property that makes contrastive runs resumable.

    Scale: the bucket-minima table is 16 buckets x (K+1) rows after
    one bucket-partitioned window over the doc-id/hash projection
    (never the text), and it BROADCASTS onto the anchor scan — the
    per-anchor fanout is bounded by K+1 rows by construction, so the
    join output is O(K·docs) at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bucket", F.substring("h", 1, 1))
    wb = Window.partitionBy("bucket").orderBy("h", "doc_id")
    minima = (
        keyed.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") <= NEG_K + 1)
        .select(
            F.col("bucket").alias("mb"),
            F.col("doc_id").alias("neg_id"),
            F.col("h").alias("neg_h"),
        )
    )
    cands = keyed.join(
        F.broadcast(minima),
        (F.col("bucket") == F.col("mb")) & (F.col("doc_id") != F.col("neg_id")),
    )
    wa = Window.partitionBy("doc_id").orderBy("neg_h", "neg_id")
    return (
        cands.withColumn("neg_rank", F.row_number().over(wa))
        .filter(F.col("neg_rank") <= NEG_K)
        .select(
            F.col("doc_id").alias("anchor_id"),
            "neg_id",
            F.col("neg_rank").cast("int").alias("neg_rank"),
        )
    )
