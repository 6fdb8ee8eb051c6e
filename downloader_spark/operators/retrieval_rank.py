"""Retrieval & ranking operators: BM25 scoring, winnowing document
fingerprints, asymmetric containment dedup, and a blocked fuzzy
string join (SURVEY.md §2.B north star — the retrieval-side
continuation of the corpus the reference archives, common.go:103-111).

Cross-engine exactness: every score here is integer arithmetic
(ppm-scaled rationals, floor divisions, md5-derived hashes) — the
float log/division forms of BM25 and edit similarity are replaced by
ranking-equivalent rational surrogates so both engines produce
bit-identical values (float ln() across libms is NOT hash-safe).

Scale notes (100 TB):
- ``text_bm25`` never explodes tokens: per-doc term frequencies come
  from JVM-side higher-order ``size(filter(...))`` lambdas in ONE
  scan, corpus stats are a 1-row aggregate broadcast back, and the
  top-k is TakeOrderedAndProject — no full sort, no token shuffle.
- ``text_winnow`` is positional: one posexplode, one bounded ROWS
  window per doc partition, one distinct — all shuffle keys are
  doc_id (uniform).  Fingerprint density is ~2/(w+1), so the output
  is a small fraction of the gram stream (Schleimer et al.,
  SIGMOD'03, public paper).
- ``dedup_containment`` rides the SAME hashed inverted index and
  stop-shingle df cap as dedup_ngram_jaccard — candidate generation
  is bucketed by shingle hash, never all-pairs.
- ``join_fuzzy`` blocks on the DISTINCT name dimension (vocabulary-
  bounded, not row-bounded): at 100 TB the fuzzy self-join runs on
  the tiny name dim and rows join back by exact key afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import (
    STOP_SHINGLE_DF,
    _duck_h60,
    _spark_h60,
    hashed_shingle_sets,
)
from downloader_spark.plans.registry import query

# BM25 with k1 = 6/5, b = 3/4 multiplied through to integers:
#   tf + k1*(1 - b + b*dl/avgdl)
#     = (20*avgdl*tf + 6*avgdl + 18*dl) / (20*avgdl)
#   term = idf * tf*(k1+1) / (...) = idf * 44*avgdl*tf / (20*avgdl*tf
#          + 6*avgdl + 18*dl)
# idf uses the rational surrogate N*1e6 DIV (df+1) (monotone in df,
# ranking-equivalent; ln() is not cross-engine hash-safe).
# NB: terms double as column suffixes (tf_<term>) in SQL text; avoid
# SQL keywords ("join") so dialect tooling never misparses them.
BM25_TERMS = ("spark", "query", "table")
BM25_TOPK = 10

# Winnowing: word-3-gram hashes, window of W consecutive grams,
# rightmost-minimum selection rule (Schleimer et al. 2003, §4).
WINNOW_W = 4
# Hash width for the arithmetic tie-break encoding: fingerprint key =
# h20 * 2^20 + (2^20-1-pos) so min(key) IS (min hash, rightmost pos).
WINNOW_BITS = 20
_W_MOD = 1 << WINNOW_BITS

# Containment: keep pairs where the smaller shingle set is >= 60%
# inside the larger (catches sub-document duplication that symmetric
# Jaccard misses when sizes differ).
CONTAIN_PPM = 600_000

# Fuzzy join: max edit distance between blocked part names.
FUZZY_MAXDIST = 4

_TOKS = "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' ')"
_DTOKS = "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"


def _bm25_tf_exprs(terms: tuple[str, ...]) -> list[str]:
    return [f"size(filter(toks, x -> x = '{t}')) AS tf_{t}" for t in terms]


def bm25_rank(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = BM25_TERMS,
    topk: int = BM25_TOPK,
) -> DataFrame:
    """BM25 top-k over ``documents`` for an ARBITRARY query-term list
    — the reusable component behind the fixed ``text_bm25`` key.

    Same integer-rational scoring (k1=1.2, b=0.75 multiplied through;
    idf = N*1e6 DIV (df+1)) and same plan shape for any term count:
    one scan computing per-term tf via JVM higher-order lambdas (the
    token stream is never exploded), ONE 1-row corpus-stats aggregate
    broadcast back, TakeOrderedAndProject for the top-k.  Terms must
    be lowercase alphanumeric (they double as column suffixes)."""
    for t in terms:
        if not t.isalnum() or t != t.lower():
            raise ValueError(f"BM25 term must be lowercase alphanumeric: {t!r}")
    docs = load_table(spark, sf_dir, "documents")
    tf = docs.selectExpr(
        "doc_id",
        f"{_TOKS} AS toks",
    ).selectExpr("doc_id", "size(toks) AS dl", *_bm25_tf_exprs(terms))
    stats = tf.agg(
        F.count("*").alias("n_docs"),
        F.expr("CAST(sum(dl) DIV count(*) AS BIGINT)").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in terms
        ],
    )
    score = " + ".join(
        f"(n_docs * 1000000 DIV (df_{t} + 1)) * (44 * avgdl * tf_{t})"
        f" DIV (20 * avgdl * tf_{t} + 6 * avgdl + 18 * dl)"
        for t in terms
    )
    return (
        tf.crossJoin(F.broadcast(stats))
        .selectExpr(
            "doc_id",
            "CAST(dl AS BIGINT) AS dl",
            f"CAST({score} AS BIGINT) AS score_ppm",
        )
        .orderBy(F.col("score_ppm").desc(), "doc_id")
        .limit(topk)
    )


@query(
    "text_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DTOKS} AS toks FROM documents
    ), tf AS (
      SELECT doc_id, len(toks) AS dl,
             {", ".join(f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in BM25_TERMS)}
      FROM toks
    ), stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) // count(*) AS BIGINT) AS avgdl,
             {", ".join(f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in BM25_TERMS)}
      FROM tf
    ), scored AS (
      SELECT doc_id, CAST(dl AS BIGINT) AS dl,
             CAST({" + ".join(
                 f"(n_docs * 1000000 // (df_{t} + 1)) * (44 * avgdl * tf_{t})"
                 f" // (20 * avgdl * tf_{t} + 6 * avgdl + 18 * dl)"
                 for t in BM25_TERMS)} AS BIGINT) AS score_ppm
      FROM tf CROSS JOIN stats
    )
    SELECT doc_id, dl, score_ppm
    FROM scored
    ORDER BY score_ppm DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
    tags=("llm", "retrieval", "ranking"),
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for a fixed query, integer-exact: top-10
    docs by the ppm-scaled rational BM25 (k1=1.2, b=0.75 multiplied
    through; idf = N*1e6 DIV (df+1), the ranking-equivalent rational
    surrogate for the log idf — ln() differs across libms in the last
    ulp and is not hash-checkable).

    Scale shape: term frequencies come from JVM-side higher-order
    ``size(filter(toks, ...))`` lambdas in the scan projection — the
    token stream is NEVER exploded or shuffled.  Corpus stats (N,
    avgdl, per-term df) are ONE 1-row aggregate, cross-joined back
    (broadcast of one row), and the top-10 plans as
    TakeOrderedAndProject: per-partition heaps + a k-row driver
    merge, no global sort at any corpus size.

    This checked key is the fixed 3-term instantiation of the
    general ``bm25_rank`` component (arbitrary query terms)."""
    return bm25_rank(spark, sf_dir, BM25_TERMS, BM25_TOPK)


@query(
    "text_winnow",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DTOKS} AS toks FROM documents
    ), grams AS (
      SELECT doc_id,
             CAST(i - 1 AS BIGINT) AS pos,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g,
             len(toks) - 2 AS n_grams
      FROM toks, LATERAL unnest(generate_series(1, len(toks) - 2)) AS t(i)
      WHERE len(toks) >= 3
    ), keyed AS (
      SELECT doc_id, pos, n_grams,
             (({_duck_h60("g")}) % {_W_MOD}) * {_W_MOD}
               + ({_W_MOD - 1} - pos) AS k
      FROM grams
    ), sel AS (
      SELECT doc_id, n_grams,
             min(k) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
               AS sel_k,
             pos
      FROM keyed
    ), fps AS (
      SELECT DISTINCT doc_id, n_grams, sel_k
      FROM sel WHERE pos <= n_grams - {WINNOW_W}
    )
    SELECT doc_id,
           CAST(max(n_grams) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_fp,
           CAST(count(*) * 1000000 // max(n_grams) AS BIGINT) AS density_ppm,
           CAST(sum(sel_k // {_W_MOD}) AS BIGINT) AS fp_checksum
    FROM fps
    GROUP BY doc_id
    """,
    tags=("llm", "dedup", "fingerprint", "window"),
)
def text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken —
    SIGMOD'03, the MOSS local fingerprinting algorithm): slide a
    window of {WINNOW_W} consecutive word-3-gram hashes over each
    document and keep the minimum of each window, rightmost on ties —
    guaranteeing a fingerprint in every {WINNOW_W}-gram stretch (the
    local property plain 0 mod p sampling lacks).

    The tie rule is encoded arithmetically so both engines agree with
    ONE window min: key = h20 * 2^20 + (2^20-1-pos) — minimizing the
    key minimizes (hash, then -position).  Expected density is
    2/(w+1), so fingerprints are a small fraction of the gram stream.
    Shuffle keys are doc_id throughout (uniform); the window frame is
    ROWS-bounded (streaming-friendly, no whole-partition buffering)."""
    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """Winnowing core over (doc_id, text) rows.

    cohort_by_doc co-locates the compact text rows up front, so the
    window-min, the fingerprint distinct, and the per-doc rollup all
    run exchange-free on the inherited doc_id partitioning — the
    exploded gram stream never shuffles."""
    from downloader_spark.operators.llm_text import cohort_by_doc

    grams = (
        cohort_by_doc(docs).selectExpr("doc_id", f"{_TOKS} AS toks")
        .filter(F.expr("size(toks) >= 3"))
        .selectExpr(
            "doc_id",
            "size(toks) - 2 AS n_grams",
            "posexplode(transform(sequence(0, size(toks) - 3),"
            " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
            " AS (pos, g)",
        )
        .selectExpr(
            "doc_id",
            "CAST(pos AS BIGINT) AS pos",
            "n_grams",
            f"(({_spark_h60('g')}) % {_W_MOD}) * {_W_MOD}"
            f" + ({_W_MOD - 1} - pos) AS k",
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    fps = (
        grams.withColumn("sel_k", F.min("k").over(w))
        .filter(F.col("pos") <= F.col("n_grams") - WINNOW_W)
        .select("doc_id", "n_grams", "sel_k")
        .distinct()
    )
    return fps.groupBy("doc_id").agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.count("*").cast("long").alias("n_fp"),
        F.expr("CAST(count(*) * 1000000 DIV max(n_grams) AS BIGINT)").alias(
            "density_ppm"
        ),
        F.expr(f"CAST(sum(sel_k DIV {_W_MOD}) AS BIGINT)").alias("fp_checksum"),
    )


@query(
    "dedup_containment",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DTOKS} AS toks FROM documents
    ), shingled AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM toks
    ), inv AS (
      SELECT DISTINCT doc_id, {_duck_h60("s")} AS h
      FROM (SELECT doc_id, unnest(sh) AS s FROM shingled)
    ), keep AS (
      SELECT h FROM inv GROUP BY h HAVING count(*) <= {STOP_SHINGLE_DF}
    ), inv2 AS (SELECT i.h, i.doc_id FROM inv i JOIN keep k ON i.h = k.h),
    sizes AS (SELECT doc_id, count(*) AS nsh FROM inv2 GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM inv2 a JOIN inv2 b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b,
           CAST(p.inter AS INT) AS inter_size,
           CAST(sa.nsh AS INT) AS na,
           CAST(sb.nsh AS INT) AS nb,
           CAST(p.inter * 1000000 // least(sa.nsh, sb.nsh) AS BIGINT)
             AS contain_ppm,
           CASE WHEN sa.nsh <= sb.nsh THEN 'a' ELSE 'b' END AS contained
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.doc_a
    JOIN sizes sb ON sb.doc_id = p.doc_b
    WHERE p.inter * 1000000 >= {CONTAIN_PPM} * least(sa.nsh, sb.nsh)
    """,
    tags=("llm", "dedup"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-containment near-dup pairs: |A∩B| / min(|A|,
    |B|) >= 60% — the sub-document duplication detector (a paragraph
    pasted into a larger page scores low symmetric Jaccard but high
    containment; Broder's containment coefficient, public work).

    Rides the SAME hashed inverted index, stop-shingle df cap, and
    co-occurrence counting as dedup_ngram_jaccard — intersections are
    a pure (doc_a, doc_b) count over shared postings, never array
    intersections, and candidate generation stays bucketed by shingle
    hash (no all-pairs work at any scale).  The ``contained`` column
    reports WHICH side is the contained one (tie → 'a').

    The df cap is an AGGREGATE + equi-join on h, not a count window:
    Window.partitionBy(h) must SORT the full Heaps-law posting list
    inside every partition (the round-15 sf1 probe adjudicated the
    6.73x 10x wall exactly there), while groupBy(h) is a hash
    aggregation with map-side partials and the join reuses the same
    h-hash exchange the posting self-join needs anyway — identical
    output, no sort of the long tail."""
    # The hashed index feeds FOUR consumers (the df-count, the join
    # probe, both posting self-join sides via inv2, and the sizes
    # aggregate), and its distinct rides the raw-docs doc_id exchange
    # (no exchange of its own sits above the md5 work) — so without a
    # materialization every consumer re-runs the whole shingle+md5
    # pipeline from the tiny docs exchange (profiled at r16: the md5
    # stage executed 4x per pass).  localCheckpoint pins one
    # evaluation; the (long, long) rows it stores are the cheapest
    # form the index ever takes.
    inv = hashed_shingle_sets(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint()
    keep = (
        inv.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= STOP_SHINGLE_DF)
        .select("h")
    )
    inv2 = inv.join(keep, "h")
    sizes = inv2.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = inv2.alias("a")
    b = inv2.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("inter") * 1_000_000 >= CONTAIN_PPM * F.least("na", "nb")
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("int").alias("inter_size"),
            F.col("na").cast("int").alias("na"),
            F.col("nb").cast("int").alias("nb"),
            F.expr(
                "CAST(inter * 1000000 DIV least(na, nb) AS BIGINT)"
            ).alias("contain_ppm"),
            F.when(F.col("na") <= F.col("nb"), F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("contained"),
        )
    )


@query(
    "join_fuzzy",
    oracle=f"""
    WITH names AS (
      SELECT p_name, count(*) AS n_parts,
             string_split(p_name, ' ')[-1] AS blk
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
           CAST(a.n_parts AS BIGINT) AS n_parts_a,
           CAST(b.n_parts AS BIGINT) AS n_parts_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAXDIST}
    """,
    tags=("join", "fuzzy", "blocking"),
)
def join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy string join (record-linkage shape): candidate
    pairs of part names within a blocking key (the trailing noun),
    verified by exact integer Levenshtein <= {FUZZY_MAXDIST}.

    The scale move is joining the DISTINCT name dimension, not the
    row stream: name vocabularies are bounded (the reference's whole
    object namespace is a few path templates, common.go:95-101) so
    the fuzzy self-join runs on a dim orders of magnitude smaller
    than the fact table, and fact rows would re-attach by exact key.
    Blocking bounds the quadratic term to within-block pairs — the
    standard record-linkage candidate-generation pattern; Levenshtein
    is an exact integer DP in both engines (same dedup family as the
    scalar_levenshtein key)."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("n_parts")).withColumn(
        "blk", F.expr("element_at(split(p_name, ' '), -1)")
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= FUZZY_MAXDIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("int")
            .alias("dist"),
            F.col("a.n_parts").cast("long").alias("n_parts_a"),
            F.col("b.n_parts").cast("long").alias("n_parts_b"),
        )
    )
