"""Near-duplicate detection suite (SURVEY.md §2.B north star):
MinHash+LSH, SimHash, inverted-index n-gram Jaccard, and
embedding-cosine near-dup — the four standard LLM-corpus dedup
families, each designed for 100 TB and each *exactly* checkable.

The exactness trick: every randomized ingredient is replaced by a
deterministic, engine-portable one — hashes are the first 15 hex
chars of md5 (a 60-bit int both Spark ``conv(...,16,10)`` and DuckDB
``'0x...'::BIGINT`` decode identically; verified bit-equal), so the
DuckDB oracle replicates the *algorithm*, not just the intent.
Similarities are emitted as integer parts-per-million (floor
division) — no float-rounding ambiguity anywhere.

Scale design (the part that matters at 100 TB):
- candidate generation is always a shuffle on a hash key (band hash /
  shingle / sign-bucket), never an all-pairs product;
- stop-shingle frequency caps bound the worst-case fanout of the
  inverted index (a shingle shared by d docs creates O(d²) pairs);
- exact verification joins only the candidate set back to the
  per-doc shingle arrays;
- per-doc signatures (simhash) are one map pass with an
  array-accumulator fold — O(tokens) per doc, no shuffle at all.

Reference analog: the reference's dedup identity is the content MD5
(/root/reference/download/common.go:183-190); these operators extend
that exact-hash identity to similarity identities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import query

# ---------------------------------------------------------------- shared

# 60-bit deterministic hash, identical in both engines (bit-equality
# verified: conv(substring(md5(x),1,15),16,10) == '0x'||hex::BIGINT).
def _spark_h60(arg_sql: str) -> str:
    return f"CAST(conv(substring(md5({arg_sql}), 1, 15), 16, 10) AS BIGINT)"


def _duck_h60(arg_sql: str) -> str:
    return f"CAST(concat('0x', substring(md5({arg_sql}), 1, 15)) AS BIGINT)"


_DUCK_SHINGLES = """
CASE WHEN len(toks) >= 3
     THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
     ELSE [array_to_string(toks, ' ')] END
"""

_SPARK_NORM = "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' ')"
_DUCK_NORM = (
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


def shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, s): the distinct word-3-gram shingle set per document,
    in LONG format (one row per shingle).

    Deliberately NOT an array + higher-order-function pipeline: HOF
    lambdas (transform/aggregate) are CodegenFallback — interpreted,
    object-allocating, measured ~20x slower than codegen'd expressions
    on this stage — and arrays force explode/intersect work later.
    Long format keeps every step inside whole-stage codegen:

      posexplode(split) → lead(tok,1/2) window over (doc_id, pos)
      → concat_ws → distinct

    The doc_id co-location happens at the RAW-DOCS stage (hash
    repartition on doc_id, one compact row per doc), so the window
    runs on the already-clustered exploded tokens with NO exchange of
    its own — the token stream never shuffles.  ``distinct`` realizes
    the set semantics (its exchange carries shingle rows — two longs
    in the hashed form).  Docs with <3 tokens contribute their whole
    normalized text as one shingle (union of a tiny filtered branch),
    matching the oracle's CASE.

    The explicit repartition count parallelizes a corpus arriving as
    few large files; AQE's size-based coalescing is bypassed because
    these partitions are CPU-dense, not byte-dense."""
    return _shingle_rows(docs).distinct()


def _shingle_rows(docs: DataFrame) -> DataFrame:
    """Non-distinct (doc_id, s) shingle rows — the shared core of
    shingle_sets (distinct strings) and hashed_shingle_sets (distinct
    64-bit hashes, where the distinct runs AFTER hashing so the
    exchange carries two longs per row instead of a ~25-byte string).

    Hash-partitioning the raw docs on doc_id (instead of round-robin)
    removes the shingling window's own exchange — the only shuffle of
    the fat exploded token stream; measured at sf0.1: 4 exchanges -> 2
    on shingle_sets().distinct(), 0.92 -> 0.55 s median."""
    n = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(n, "doc_id").select(
        "doc_id", F.expr(_SPARK_NORM).alias("toks")
    )
    t = toks.select(
        "doc_id", F.size("toks").alias("nt"), F.posexplode("toks").alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        t.filter(F.col("nt") >= 3)
        .withColumn("t1", F.lead("tok", 1).over(w))
        .withColumn("t2", F.lead("tok", 2).over(w))
        .filter(F.col("t2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "t1", "t2").alias("s"))
    )
    degen = toks.filter(F.size("toks") < 3).select(
        "doc_id", F.array_join("toks", " ").alias("s")
    )
    return tri.union(degen)


def hashed_shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, h): the per-document shingle set as 60-bit md5-derived
    hashes (_spark_h60 — identical in DuckDB, so oracles replicate the
    mapping exactly).

    This is the form every set-similarity pipeline should join and
    aggregate on: after the one md5 per shingle ROW, the distinct, the
    df-count, the posting self-join, and the verification joins all
    carry (long, long) rows — at 100 TB that's the difference between
    shuffling raw 3-gram text (~25 B/posting) and 16 B/posting, and
    integer keys hash/compare without touching variable-length data.
    Two distinct shingles colliding in 60 bits (~1e-18 per pair) would
    merge them in BOTH engines identically — the comparison stays
    exact; only the (astronomically unlikely) reported count would
    shift, which planted-pair recall tests would surface."""
    return (
        _shingle_rows(docs)
        .select("doc_id", F.expr(_spark_h60("s")).alias("h"))
        .distinct()
    )


_DUCK_SHINGLE_CTE = f"""
    toks AS (SELECT doc_id, {_DUCK_NORM} AS toks FROM documents),
    shingled AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM toks)
"""

# ---------------------------------------------------------------- minhash

N_HASHES = 12
N_BANDS = 6  # r = 2 rows/band -> LSH threshold ~ (1/6)^(1/2) ~ 0.41

# One md5 per shingle, not N_HASHES: the 12 hash functions are a
# universal family h_i(x) = (a_i * x + b_i) mod P over the md5-derived
# 60-bit value folded to 31 bits — md5 is ~50x the cost of a
# multiply-add, and this stage dominated the whole pipeline (the
# 12-md5 form measured 7.4 s at sf0.1; this one ~halves it).  The
# a_i/b_i constants are themselves md5-derived (deterministic, no RNG)
# and inlined as literals in BOTH engines' SQL.  P = 2^31-1 keeps
# every product < 2^62: no bigint overflow under Spark's ANSI mode.
MINHASH_P = 2_147_483_647


def _minhash_consts() -> tuple[list[int], list[int]]:
    import hashlib

    def h(tag: str, i: int) -> int:
        return int(hashlib.md5(f"minhash-{tag}:{i}".encode()).hexdigest()[:7], 16)

    a = [h("a", i) % (MINHASH_P - 1) + 1 for i in range(N_HASHES)]  # 1..P-1
    b = [h("b", i) % MINHASH_P for i in range(N_HASHES)]
    return a, b


MINHASH_A, MINHASH_B = _minhash_consts()


@query(
    "dedup_minhash",
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
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
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
    tags=("llm", "dedup"),
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-verified.

    Pipeline: per-doc 3-gram shingle set → 12 deterministic
    md5-derived minhashes → 6 bands of 2 → shuffle on band hash →
    candidate pairs within a band → exact Jaccard verification on the
    candidate set only → keep pairs with Jaccard >= 0.5 (integer
    compare inter*2 >= union; similarity emitted as ppm floor).

    NEVER all-pairs: the only O(N²)-shaped step is within-band pairs,
    and banding is precisely the device that keeps bands small.  The
    band hash is a uniform md5, so the shuffle is skew-free.  The
    oracle replicates the full algorithm (same hashes, same bands), so
    LSH's false negatives cannot cause a mismatch — and recall against
    brute force is pinned separately in tests with planted near-dups.
    """
    return minhash_pairs(load_table(spark, sf_dir, "documents"))


def minhash_band_rows(ss: DataFrame) -> DataFrame:
    """(doc_id, band) LSH band table from hashed shingle sets — the
    shared banding stage of ``dedup_minhash`` /
    ``dedup_minhash_incremental`` and the streaming incremental-dedup
    pipeline (streaming/incremental_dedup.py): 12 deterministic
    minhash AGGREGATES (multiply-add over the pre-hashed shingle
    value, partial-aggregated map-side), then ``N_BANDS`` band hashes
    exploded long-format.  At production scale this table is the
    PERSISTED corpus artifact a daily delta joins against."""
    hp = ss.withColumn("hp", F.expr(f"pmod(h, {MINHASH_P})"))
    sigs = hp.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"pmod({MINHASH_A[i]} * hp + {MINHASH_B[i]}, {MINHASH_P})")
            ).alias(f"m{i}")
            for i in range(N_HASHES)
        ]
    )
    return sigs.select(
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


def minhash_pairs(docs: DataFrame) -> DataFrame:
    """Core MinHash+LSH pipeline over any (doc_id, text) DataFrame.

    Long-format all the way: the 12 minhashes are 12 ``min()``
    AGGREGATES over the (doc_id, shingle-hash) rows — partial-
    aggregated map-side, whole-stage-codegen'd, one shuffle on doc_id
    (reused from hashed_shingle_sets' own exchange).  Each shingle row
    is md5'd ONCE, before the distinct, so every exchange in the
    pipeline carries (long, long) rows — never raw shingle text; the
    12 functions are codegen'd multiply-adds over that value (see
    MINHASH_A/B above).  Band hashes are then a cheap row-wise md5
    over the 12-column signature row.  Candidate verification computes
    |A∩B| as a co-occurrence COUNT (join the candidate pairs through
    the hashed postings), never materializing or intersecting arrays."""
    # The hashed shingle table feeds FOUR consumers (signatures, the
    # semi-filtered postings, the size table, and the co-occurrence
    # join's two sides); materialize it once so the split+explode+md5
    # +distinct lineage isn't re-evaluated per consumer.  Measured at
    # sf0.1: 3.7 -> 2.4 s steady-state, identical pairs.  At
    # production scale this is the "materialize the shingle
    # intermediate" knob — a bucketed write would serve the same role
    # across jobs.
    ss = hashed_shingle_sets(docs).localCheckpoint()
    hp = ss.withColumn("hp", F.expr(f"pmod(h, {MINHASH_P})"))
    # The signature aggregate rides ss's doc_id partitioning (no
    # exchange of its own), so the band self-join's two sides would
    # otherwise each recompute the 12 min-aggregates from the
    # checkpoint — AQE materializes the twin band exchanges as
    # concurrent independent stages, so exchange reuse never fires
    # (the same effect profiled on dedup_ngram_jaccard).  Checkpoint
    # the V-sized signature table once; partitioning (doc_id, full
    # width) is inherited, so no AQE-coalesce risk is baked in.
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
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verified_pairs(ss, cand, keep_ratio=2)


def _verified_pairs(ss: DataFrame, cand: DataFrame, keep_ratio: int) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the
    long-format HASHED shingle sets (doc_id, h): inter = co-occurrence
    count through the postings, union from per-doc set sizes.  Keeps
    pairs with inter * keep_ratio >= union (jaccard >= 1/keep_ratio).
    Integer posting keys keep both verification joins on (long, long)
    rows — no shingle text moves through any exchange here.

    The postings are semi-join-filtered to candidate doc_ids first:
    the candidate set is tiny next to the corpus, so the verification
    joins move O(candidate docs x shingles) rows instead of the whole
    posting table."""
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ssc = ss.join(cand_docs, "doc_id", "left_semi")
    sizes = ss.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    inter = (
        cand.join(ssc.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(ssc.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_size", (F.col("na") + F.col("nb") - F.col("inter")).cast("int"))
        .filter(F.col("inter") * keep_ratio >= F.col("union_size"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("int").alias("inter_size"),
            "union_size",
            F.expr("CAST(inter * 1000000 DIV union_size AS BIGINT)").alias(
                "jacc_ppm"
            ),
        )
    )


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 60

# DuckDB has no fold-with-initial-value, so the oracle computes each
# bit's signed vote with its own list_sum — O(bits * tokens), fine at
# oracle scale.  The Spark side computes the votes as 60 codegen'd
# sum() aggregates over exploded token hashes (simhash_signatures).
_DUCK_SIMHASH = " + ".join(
    f"""CASE WHEN list_sum(list_transform(th,
          x -> CASE WHEN (x >> {k}) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        THEN CAST(1 AS BIGINT) << {k} ELSE 0 END"""
    for k in range(SIMHASH_BITS)
)

@query(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_DUCK_NORM}) AS dt FROM documents
    ),
    hashed AS (
      SELECT doc_id, CAST(len(dt) AS INT) AS n_tokens_d,
             list_transform(dt, t -> {_duck_h60("t")}) AS th
      FROM toks
    ),
    sims AS (SELECT doc_id, n_tokens_d, {_DUCK_SIMHASH} AS simhash FROM hashed)
    SELECT doc_id, n_tokens_d, simhash,
           (simhash >> 0) & 32767 AS band0,
           (simhash >> 15) & 32767 AS band1,
           (simhash >> 30) & 32767 AS band2,
           (simhash >> 45) & 32767 AS band3
    FROM sims
    """,
    tags=("llm", "dedup"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 60-bit SimHash fingerprint plus its 4 x 15-bit LSH
    bands (Charikar bit-majority over deterministic md5 token hashes).

    Near-dup candidates are pairs matching on any band (hamming <= 3
    guaranteed caught at 4 bands); the pair hunt itself is exercised
    in tests with planted duplicates — this key exact-checks the
    signature computation, which is the hard part to get identical.

    Spark computes the bit votes in ONE array-accumulator fold over
    the token hashes (O(tokens) per doc, map-only, no shuffle); the
    oracle recomputes each bit independently.  Both reduce to the same
    integer."""
    return simhash_signatures(load_table(spark, sf_dir, "documents"))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """Core SimHash signature computation over (doc_id, text).

    Long format, fully codegen'd: explode distinct tokens, hash each
    once, then ONE hash aggregation computing the 60 per-bit signed
    votes as 60 sum() columns; the final signature is a row-wise
    60-term reassembly.  The array-fold formulation this replaced
    ran interpreted (CodegenFallback) and serialized on large files.

    ONE exchange total, of the raw (doc_id, text) rows: hashing the
    repartition on doc_id makes HashPartitioning(doc_id) satisfy the
    clustering required by BOTH downstream aggregates (the
    (doc_id, tok) distinct — doc_id is a subset of its keys — and
    the doc_id vote groupBy), so Catalyst plans no further shuffle.
    The round-robin repartition this replaced planned 3 exchanges,
    and the distinct->groupBy pair scattered each doc's tokens over
    every live partition, making the 60-column vote partial-aggregate
    emit up to one ~500 B row per doc PER PARTITION — measured 24x
    shuffle growth for 10x docs on the sf1 shape bench (PERF.md r9)
    vs ~10x-linear after this change."""
    n = docs.sparkSession.sparkContext.defaultParallelism
    toks = (
        docs.repartition(n, "doc_id")
        .select("doc_id", F.explode(F.expr(_SPARK_NORM)).alias("tok"))
        .distinct()
        .select("doc_id", F.expr(_spark_h60("tok")).alias("h"))
    )
    votes = toks.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_tokens_d"),
        *[
            F.sum(
                F.expr(f"CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END")
            ).alias(f"v{k}")
            for k in range(SIMHASH_BITS)
        ],
    )
    simhash_expr = " + ".join(
        f"CASE WHEN v{k} > 0 THEN CAST(1 AS BIGINT) << {k} ELSE CAST(0 AS BIGINT) END"
        for k in range(SIMHASH_BITS)
    )
    return votes.select(
        "doc_id",
        "n_tokens_d",
        F.expr(simhash_expr).alias("simhash"),
        *[
            F.expr(f"(({simhash_expr}) >> {15 * i}) & 32767").alias(f"band{i}")
            for i in range(4)
        ],
    )


# ------------------------------------------------------- n-gram jaccard

STOP_SHINGLE_DF = 50  # drop shingles appearing in more docs (fanout cap)
NGRAM_JACCARD_T = 5  # keep pairs with jaccard >= 1/5 (inter*5 >= union)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_DUCK_SHINGLE_CTE},
    inv AS (
      SELECT DISTINCT doc_id, {_duck_h60("s")} AS h
      FROM (SELECT doc_id, unnest(sh) AS s FROM shingled)
    ),
    keep AS (
      SELECT h FROM inv GROUP BY h HAVING count(*) <= {STOP_SHINGLE_DF}
    ),
    inv2 AS (SELECT i.h, i.doc_id FROM inv i JOIN keep k ON i.h = k.h),
    sizes AS (SELECT doc_id, count(*) AS nsh FROM inv2 GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM inv2 a JOIN inv2 b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           CAST(p.inter AS INT) AS inter_size,
           CAST(sa.nsh + sb.nsh - p.inter AS INT) AS union_size,
           CAST(p.inter * 1000000 // (sa.nsh + sb.nsh - p.inter) AS BIGINT)
             AS jacc_ppm
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE p.inter * {NGRAM_JACCARD_T} >= sa.nsh + sb.nsh - p.inter
    """,
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs over the non-stop shingle
    sets, computed ENTIRELY from the inverted index: the intersection
    size of a pair is the number of (shared-shingle) postings it
    co-occurs in — one groupBy(doc_a, doc_b).count() — and the union
    comes from per-doc set sizes.  No shingle arrays are ever joined
    or intersected (an earlier array_intersect-per-candidate version
    measured 38s at sf0.1; this shape runs in ~3s and at 100 TB keeps
    the pair verification a pure integer aggregation).

    The stop-shingle document-frequency cap ({STOP_SHINGLE_DF}) is the
    scale guard: a shingle shared by d docs contributes O(d²)
    candidate pairs, so ubiquitous shingles are dropped from the
    feature set — they carry no discriminative signal (PPJoin-family
    prefix filtering, simplified).  Keep threshold: Jaccard >= 0.2."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def ngram_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Core inverted-index exact-Jaccard pipeline over (doc_id, text):
    the long-format HASHED shingle rows (doc_id, h) ARE the inverted
    index; drop stop-shingles, self-join on the shingle hash to count
    co-occurrences (= intersection size), join per-doc sizes, filter
    by ratio.  Hashing before the distinct keeps every exchange —
    distinct, df-count, posting self-join — on (long, long) rows
    instead of raw 3-gram text, and at small build sides AQE can
    broadcast the integer index where a string one would exceed the
    threshold.

    A PPJoin-style exact prefix filter (index each doc's rarest
    n - ceil(t*n) + 1 shingles by global df) was MEASURED on this
    corpus and rejected: at t = 0.2 it keeps 70% of the candidate
    pairs (788k of 1.13M at sf0.1; shared-vocabulary corpora defeat
    rarity-based pruning at low thresholds), while re-deriving the
    true intersections for the survivors costs a candidate×postings
    expansion (~41M rows) that dwarfs the 1.27M-row co-occurrence
    aggregation it replaces.  The df cap stays the scale guard: it
    bounds per-shingle fanout, and the co-occurrence count IS the
    verification."""
    inv = hashed_shingle_sets(docs)
    # df cap as a whole-partition window count, NOT groupBy-then-join:
    # count(*) OVER (PARTITION BY h) needs no sort (whole-partition
    # frame) and leaves the output hash-partitioned on h — exactly the
    # partitioning the self-join needs.  The filtered postings are
    # then MATERIALIZED (localCheckpoint): under AQE the self-join's
    # two sides are otherwise compiled as two independent query
    # stages that materialize CONCURRENTLY, so exchange reuse never
    # fires and the whole shingle+md5+window pipeline runs twice
    # (profiled at r16: two identical 260k-row exchange writes per
    # pass, the md5 stage being the key's dominant CPU).  The
    # checkpoint pins ONE evaluation and preserves the h hash
    # partitioning, so the self-join and the co-occurrence groupBy
    # read it exchange-free at the full partition width — which also
    # undoes AQE's byte-based coalescing of the pair stage (3 tasks
    # for a CPU-dense 1.2M-row join fanout).
    # The h exchange is an EXPLICIT fixed-width repartition, not the
    # window's implicit one: AQE byte-coalesces an implicit exchange
    # (3.5 MB of (long,long) rows -> ~3 partitions), which would bake
    # a 3-partition layout into the checkpoint and run the CPU-dense
    # 1.2M-row pair join at width 3 (measured 3.2 -> 7.0 s — worse
    # than no checkpoint at all).  A user repartition keeps the full
    # width; the window then rides it with no exchange of its own.
    n = docs.sparkSession.sparkContext.defaultParallelism
    w_df = Window.partitionBy("h")
    inv2 = (
        inv.repartition(n, "h")
        .withColumn("df", F.count("*").over(w_df))
        .filter(F.col("df") <= STOP_SHINGLE_DF)
        .drop("df")
        .localCheckpoint()
    )
    sizes = inv2.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = inv2.alias("a")
    b = inv2.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_size", (F.col("na") + F.col("nb") - F.col("inter")).cast("int"))
        .filter(F.col("inter") * NGRAM_JACCARD_T >= F.col("union_size"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("int").alias("inter_size"),
            "union_size",
            F.expr("CAST(inter * 1000000 DIV union_size AS BIGINT)").alias(
                "jacc_ppm"
            ),
        )
    )


# --------------------------------------------------------- embedding dup

SIGN_BITS = 8  # default LSH width: 2^8 buckets (the exact-check width)
EMBED_DIM = 64  # testdata embeddings.parquet dimensionality
EMBED_COS_T = 0.35
LSH_SEED = "dedup-embed-hyperplanes-v1"

_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
# DuckDB's list_reduce has no init value and ERRORS on an empty input
# list, while Spark's aggregate(..., 0.0, ...) folds an empty zip to
# 0.0 (so zero-length embeddings are dropped cleanly by the norm != 0
# filter).  Both-empty is the only erroring shape — list_zip of one
# empty and one non-empty side NULL-pads to a non-empty list — so the
# guard mirrors Spark's 0.0 exactly where DuckDB would raise.
_DUCK_DOT = (
    "CASE WHEN len({a}) = 0 AND len({b}) = 0 THEN CAST(0.0 AS DOUBLE)"
    " ELSE list_reduce(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y) END"
)


def hyperplane_signs(bits: int, dim: int, seed: str = LSH_SEED) -> list[list[int]]:
    """±1 coefficients of ``bits`` pseudo-random hyperplanes in R^dim,
    derived deterministically from md5 so BOTH engines can inline the
    same literals: random-hyperplane LSH without an RNG (the
    verifiable-surface pattern).  Random full-dimensional hyperplanes
    spread correlated corpora across buckets where the old axis-aligned
    planes (sign of the first k dims) collapsed them into a handful."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{j}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for d in range(dim)
        ]
        for j in range(bits)
    ]


def derive_sign_bits(
    n_vecs: int,
    target_bucket_pop: int = 64,
    min_bits: int = 8,
    max_bits: int = 24,
) -> int:
    """LSH width scaled to corpus size: enough buckets that the
    EXPECTED bucket population stays ~target, so within-bucket pair
    work grows linearly with the corpus instead of quadratically.
    2^24 buckets ~ 1e9-vector corpora at pop 64; widen max_bits (or
    multi-probe several tables) beyond that."""
    import math

    if n_vecs <= target_bucket_pop:
        return min_bits
    return max(min_bits, min(max_bits, math.ceil(math.log2(n_vecs / target_bucket_pop))))


def scaled_sign_bits(emb) -> int:
    """Static-oracle-COMPATIBLE scale width for the checked LSH keys:
    ``max(SIGN_BITS, derive_sign_bits(count))``.  At every fixture
    scale (<= ~16k vectors) this equals the fixed {SIGN_BITS}-bit
    exact-check width, so the static DuckDB oracles stay bit-exact;
    beyond that the width grows with the corpus so expected bucket
    population stays ~target — the round-15 sf1 shape probe measured
    the frozen width at 22.8x wall / 186x shuffle on a 10x CLUSTERED
    corpus (label clusters concentrate sign patterns), which the
    derived width collapses back to near-linear.  Hyperplanes are
    prefix-stable (md5-per-index), so a wider bucket is a strict
    refinement of the checked one — the standard LSH recall/width
    trade, taken in the direction a 100 TB dedup must take it.  The
    fully-uncapped path (centered hyperplanes, no static oracle) is
    ``sign_bits=None``.

    The width/oracle coupling is LOUD, not implicit: whenever the
    derived width exceeds the static {SIGN_BITS}-bit oracle width, a
    RuntimeWarning names the divergence — a checked fixture growing
    past the boundary surfaces at plan-build time instead of as a
    bare bench-time hash mismatch (round-15 ADVICE)."""
    n = emb.count()
    bits = max(SIGN_BITS, derive_sign_bits(n))
    if bits != SIGN_BITS:
        import warnings

        warnings.warn(
            f"scaled_sign_bits: {n} vectors derive a {bits}-bit LSH"
            f" width; the static {SIGN_BITS}-bit DuckDB oracles no"
            " longer describe this plan (wider buckets refine the"
            " checked pair set) — exact-check only at fixture scale",
            RuntimeWarning,
            stacklevel=2,
        )
    return bits


def _spark_bucket_expr(
    signs: list[list[int]], thresholds: list[float] | None = None
) -> str:
    """Bucket id = sign pattern of the hyperplane dots, packed into a
    BIGINT.  Each dot folds (embedding · s_j) in index order with a
    0.0 init — bit-identical to the DuckDB form below, so the SIGN
    (hence the bucket) can never disagree across engines.

    ``thresholds[j]`` shifts bit j's cut to ``dot >= t_j``: passing
    t_j = s_j·mean(embeddings) centers the hyperplanes on the corpus
    (dot_j(x - mu) = dot_j(x) - dot_j(mu)), the anti-skew move for
    corpora with a large common component.

    Length mismatch: ``zip_with`` PADS the shorter side with NULLs
    (it does not truncate), and one NULL product folds the whole dot
    to NULL — which would silently send every vector to bucket 0.
    Mismatched lengths are therefore sliced to the common length, so
    an embedding shorter than the hyperplane dimensionality genuinely
    uses the hyperplanes' prefix.  The slicing is DISPATCHED on
    size(embedding): the equal-length hot path (every uniform corpus)
    takes a branch with no slice at all — per-bit array copies
    measured ~+60% on the whole dedup_embed key."""
    dim = len(signs[0]) if signs else 0

    def bucket_sum(emb_sql: str, arr_of) -> str:
        terms = []
        for j, row in enumerate(signs):
            t = 0.0 if thresholds is None else thresholds[j]
            arr = "array(" + ",".join(f"CAST({s} AS DOUBLE)" for s in row) + ")"
            dot = (
                f"aggregate(zip_with({emb_sql}, {arr_of(arr)}, "
                "(x, s) -> CAST(x AS DOUBLE) * s), "
                "CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
            )
            terms.append(
                f"IF({dot} >= CAST({t!r} AS DOUBLE), "
                f"shiftleft(CAST(1 AS BIGINT), {j}), CAST(0 AS BIGINT))"
            )
        return " + ".join(terms)

    plain = bucket_sum("embedding", lambda a: a)
    emb_long = bucket_sum(f"slice(embedding, 1, {dim})", lambda a: a)
    emb_short = bucket_sum("embedding", lambda a: f"slice({a}, 1, size(embedding))")
    return (
        f"IF(size(embedding) = {dim}, {plain}, "
        f"IF(size(embedding) > {dim}, {emb_long}, {emb_short}))"
    )


def _duck_bucket_expr(signs: list[list[int]]) -> str:
    """DuckDB mirror of ``_spark_bucket_expr``, including its
    common-length dispatch: DuckDB's ``list_zip`` NULL-PADS the
    shorter list, one NULL product folds the dot to NULL, and a NULL
    comparison makes CASE take the 0-bit branch — so without the
    explicit slice a short vector would land in bucket 0 here while
    Spark computes real sign bits, a latent cross-engine hash
    mismatch for any non-{dim}-dim fixture."""
    dim = len(signs[0]) if signs else 0

    def bucket_sum(emb_sql: str, arr_of) -> str:
        terms = []
        for j, row in enumerate(signs):
            arr = "[" + ",".join(f"CAST({s} AS DOUBLE)" for s in row) + "]"
            dot = (
                f"list_reduce(list_transform(list_zip({emb_sql}, {arr_of(arr)}), "
                "p -> CAST(p[1] AS DOUBLE) * p[2]), (x, y) -> x + y)"
            )
            terms.append(
                f"CASE WHEN {dot} >= 0 THEN CAST(1 AS BIGINT) << {j} "
                "ELSE CAST(0 AS BIGINT) END"
            )
        return " + ".join(terms)

    plain = bucket_sum("embedding", lambda a: a)
    emb_long = bucket_sum(f"list_slice(embedding, 1, {dim})", lambda a: a)
    emb_short = bucket_sum(
        "embedding", lambda a: f"list_slice({a}, 1, len(embedding))"
    )
    # A zero-length embedding would make every list_zip in emb_short
    # empty and list_reduce raises on empty input; Spark's side folds
    # each dot to 0.0 and 0.0 >= 0 sets every bit.  Emit that constant
    # sign pattern directly (the row is norm-filtered out either way —
    # this branch only keeps the oracle from erroring wholesale).
    all_bits = (1 << len(signs)) - 1 if signs else 0
    return (
        f"CASE WHEN len(embedding) = 0 THEN CAST({all_bits} AS BIGINT) "
        f"WHEN len(embedding) = {dim} THEN {plain} "
        f"WHEN len(embedding) > {dim} THEN {emb_long} "
        f"ELSE {emb_short} END"
    )


_DUCK_SIGN_BUCKET = _duck_bucket_expr(hyperplane_signs(SIGN_BITS, EMBED_DIM))


@query(
    "dedup_embed",
    oracle=f"""
    WITH b AS (
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
    )
    SELECT vec_a, vec_b,
           CAST(floor(dot / sqrt(na * nb) * 1000000) AS BIGINT) AS cos_ppm
    FROM pairs
    WHERE dot / sqrt(na * nb) >= {EMBED_COS_T}
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via deterministic
    random-hyperplane sign-LSH: bucket on the sign pattern of
    {SIGN_BITS} md5-seeded hyperplane dots, compare only
    within-bucket, keep cosine >= {EMBED_COS_T}.

    Cosine and every hyperplane dot are left-folds of double products
    in identical order on both engines (0.0+x == x, so Spark's
    init-value fold equals DuckDB's first-element fold bit-for-bit);
    emitted as floor-ppm.  The exact-check runs at the fixed
    {SIGN_BITS}-bit width (the oracle is a static string); the scale
    path is ``embed_pairs(emb)`` with sign_bits=None, which derives
    the width from the corpus size (derive_sign_bits) so expected
    bucket population stays ~constant — within-bucket pair work grows
    linearly, not O(N²/2^bits) at a frozen width.  The shuffle key is
    the bucket id either way, never an all-pairs product."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embed_pairs(emb, sign_bits=scaled_sign_bits(emb))


def sign_buckets(
    emb: DataFrame,
    sign_bits: int | None = None,
    dim: int = EMBED_DIM,
    center: bool | None = None,
) -> DataFrame:
    """(vec_id, embedding, bucket) under deterministic hyperplane LSH.

    ``sign_bits=None`` (the scale path) counts the corpus, derives the
    LSH width, and CENTERS the hyperplanes on the corpus mean — a
    corpus whose vectors share a large common component (the usual
    shape of real embedding models) would otherwise bias every
    hyperplane's sign the same way and pile up in a few buckets.
    Centering costs one 64-double mean collect; the per-bit cut
    becomes dot >= s_j·mu, still a static scalar in the plan.
    Explicit ``sign_bits`` (the static-oracle check) defaults to
    uncentered so the oracle SQL stays a fixed string."""
    from downloader_spark.io import spread

    # The bucket expression is an interpreted HOF fold (sign_bits
    # zip_with dots per row over the 64-dim vector) — CPU-dense map
    # work that would otherwise run on the fixture's ONE input split
    # until the pair join's exchange (guide §2.5 input skew; no-op at
    # scale where the scan arrives as many splits).
    emb = spread(emb, key="vec_id")
    if sign_bits is None:
        sign_bits = derive_sign_bits(emb.count())
        if center is None:
            center = True
    signs = hyperplane_signs(sign_bits, dim)
    thresholds = None
    if center:
        mean_rows = (
            emb.select(F.posexplode("embedding").alias("pos", "v"))
            .groupBy("pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        mu = [0.0] * dim
        for r in mean_rows:
            if r.pos < dim:
                mu[r.pos] = float(r.m)
        thresholds = [sum(s * m for s, m in zip(row, mu)) for row in signs]
    return emb.select(
        "vec_id",
        "embedding",
        F.expr(_spark_bucket_expr(signs, thresholds)).alias("bucket"),
    )


def embed_pairs(
    emb: DataFrame, sign_bits: int | None = None, dim: int = EMBED_DIM
) -> DataFrame:
    """Core sign-LSH cosine near-dup pipeline over (vec_id, embedding).

    ``sign_bits=None`` (the scale path) counts the corpus and derives
    the LSH width (centered hyperplanes); pass an explicit width for a
    static-oracle check.  ``dim`` bounds the hyperplane dimensionality;
    shorter embeddings use the hyperplanes' prefix via explicit
    common-length slicing in the bucket expression (zip_with would
    NULL-pad, not truncate — see _spark_bucket_expr).

    Zero-norm vectors (undefined cosine) are excluded ONCE, per
    vector, before the pair join: Spark's ANSI mode errors on double
    division by zero and DuckDB's NaN compares greater than every
    threshold, and a per-PAIR guard (nullif/CASE) re-evaluates the
    interpreted norm folds per inline site — measured +70% on the
    whole key.  With both norms filtered positive, the per-pair
    division needs no guard at all."""
    norm = F.expr(_SPARK_DOT.format(a="embedding", b="embedding"))
    b = sign_buckets(emb, sign_bits=sign_bits, dim=dim).filter(norm != 0)
    x = b.alias("x")
    y = b.alias("y")
    dot = F.expr(_SPARK_DOT.format(a="x.embedding", b="y.embedding"))
    na = F.expr(_SPARK_DOT.format(a="x.embedding", b="x.embedding"))
    nb = F.expr(_SPARK_DOT.format(a="y.embedding", b="y.embedding"))
    pairs = (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vec_id") < F.col("y.vec_id")))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            dot.alias("dot"),
            na.alias("na"),
            nb.alias("nb"),
        )
    )
    # unguarded division is safe: both sides pre-filtered to norm != 0
    cos = F.col("dot") / F.sqrt(F.col("na") * F.col("nb"))
    return (
        pairs.filter(cos >= EMBED_COS_T)
        .select(
            "vec_a",
            "vec_b",
            F.floor(cos * 1000000).cast("bigint").alias("cos_ppm"),
        )
    )


NEW_BATCH_MOD = 10  # vec_id % 10 == 0 plays the "newly arrived batch"


@query(
    "dedup_incremental",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_DUCK_SIGN_BUCKET} AS bucket
      FROM embeddings
      WHERE {_DUCK_DOT.format(a="embedding", b="embedding")} <> 0
    ),
    newb AS (SELECT * FROM b WHERE vec_id % {NEW_BATCH_MOD} = 0),
    corp AS (SELECT * FROM b WHERE vec_id % {NEW_BATCH_MOD} <> 0),
    scored AS (
      SELECT n.vec_id AS new_id, c.vec_id AS match_id,
             {_DUCK_DOT.format(a="n.embedding", b="c.embedding")} AS dot,
             {_DUCK_DOT.format(a="n.embedding", b="n.embedding")} AS na,
             {_DUCK_DOT.format(a="c.embedding", b="c.embedding")} AS nb
      FROM newb n JOIN corp c ON n.bucket = c.bucket
    ),
    kept AS (
      SELECT new_id, match_id,
             CAST(floor(dot / sqrt(na * nb) * 1000000) AS BIGINT) AS cos_ppm
      FROM scored
    )
    SELECT new_id,
           arg_max(match_id, printf('%020d:%020d', cos_ppm + 1000000, match_id))
             AS match_id,
           max(cos_ppm) AS cos_ppm
    FROM kept GROUP BY new_id
    """,
    tags=("llm", "dedup", "embedding", "incremental"),
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: the newly-arrived batch (vec_id %
    {NEW_BATCH_MOD} == 0 stands in for today's crawl) is matched
    against the EXISTING corpus through the shared sign-LSH buckets,
    and each new vector reports its best in-bucket neighbor by cosine
    (ties broken by match_id; the ingest policy applies its own
    keep/drop threshold downstream) — the "is this new document
    already in my training set?" query a growing corpus runs every
    ingest cycle, without ever re-pairing corpus-vs-corpus.  The
    oracle's sortable tie-break key shifts cos_ppm by +1e6 because a
    below-zero cosine would break zero-padded lexicographic order.

    Bipartite shape, not self-join: candidates come from the bucket
    equi-join of a SMALL new side against the big corpus — here the
    new side broadcasts (an ingest batch is orders of magnitude
    smaller than the corpus); at equal scales both sides shuffle on
    the uniform bucket key.  Corpus work is O(|new| x bucket
    population), never O(|corpus|^2); the best-match reduction is a
    struct-max aggregate (map-side combinable), mirrored in the
    oracle by arg_max over a fixed-width sortable (cos_ppm, id) key."""
    norm = F.expr(_SPARK_DOT.format(a="embedding", b="embedding"))
    emb = load_table(spark, sf_dir, "embeddings")
    b = sign_buckets(emb, sign_bits=scaled_sign_bits(emb)).filter(norm != 0)
    newb = b.filter(F.col("vec_id") % NEW_BATCH_MOD == 0).select(
        F.col("vec_id").alias("new_id"),
        F.col("embedding").alias("n_emb"),
        "bucket",
    )
    corp = b.filter(F.col("vec_id") % NEW_BATCH_MOD != 0).select(
        F.col("vec_id").alias("match_id"),
        F.col("embedding").alias("c_emb"),
        "bucket",
    )
    dot = F.expr(_SPARK_DOT.format(a="n_emb", b="c_emb"))
    na = F.expr(_SPARK_DOT.format(a="n_emb", b="n_emb"))
    nb = F.expr(_SPARK_DOT.format(a="c_emb", b="c_emb"))
    kept = (
        corp.join(F.broadcast(newb), "bucket")
        .select(
            "new_id",
            "match_id",
            dot.alias("dot"),
            na.alias("na"),
            nb.alias("nb"),
        )
        .select(
            "new_id",
            "match_id",
            F.expr(
                "CAST(floor(dot / sqrt(na * nb) * 1000000) AS BIGINT)"
            ).alias("cos_ppm"),
        )
    )
    best = kept.groupBy("new_id").agg(
        F.max(F.struct(F.col("cos_ppm"), F.col("match_id"))).alias("m")
    )
    return best.select(
        "new_id", F.col("m.match_id").alias("match_id"), F.col("m.cos_ppm").alias("cos_ppm")
    )
