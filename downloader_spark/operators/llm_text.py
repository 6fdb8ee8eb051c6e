"""LLM-data-pipeline text analysis operators (SURVEY.md §2.B, north
star): corpus stats, language ID, quality scoring, token counting,
document fingerprinting — all over the ``documents`` table.

Every operator here is a map-stage projection or a single hash
aggregation built from JVM regex/string built-ins — no Python in the
hot path, so the plans are whole-stage-codegen'd and shuffle at most
once (on the groupBy key).  At 100 TB the per-doc queries are
embarrassingly parallel scans; ``text_stats`` shuffles only the
5-row-per-lang partial aggregates.

Cross-engine exactness rules used throughout:
- token/char counts are ints (bit-exact);
- ratios are a SINGLE double division of exact ints, rounded to 6dp —
  identical operand, identical order, identical result;
- regexes avoid lookaround so Java regex (Spark) and RE2 (DuckDB)
  agree;
- the docs corpus is single-space separated with no leading/trailing
  whitespace (asserted in tests), so ``split(text, ' ')`` tokenizes
  identically in both engines.

Reference analog: the reference's only text processing is regex field
extraction over log lines (routeviews.go:77); this module is the
corpus-scale generalization the north star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.io import load_table, spread
from downloader_spark.plans.registry import query

# BPE-ish pre-tokenizer: letter runs, digit runs, non-alnum runs, each
# optionally glued to one preceding space (GPT-2's pattern minus the
# lookahead, which RE2 cannot run).
BPE_ISH = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

# Tiny deterministic stopword profiles for the n-gram language-ID
# heuristic.  Scores are whole-word match counts; prediction is the
# argmax with a fixed tie-break order (en > de > fr > es > zh).
LANG_PROFILES = {
    "en": r"\b(the|a|of|and|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
    "zh": r"\b(de|le|shi|he|zai)\b",
}


def cohort_by_doc(docs: DataFrame) -> DataFrame:
    """Hash-partition raw (doc_id, text) rows on doc_id BEFORE any
    explode.  doc_id is a subset of every downstream clustering key a
    per-doc pipeline needs (doc_id windows, (doc_id, ...) groupBys and
    distincts), so Catalyst satisfies each later distribution with
    this one partitioning and plans NO further exchange — the fat
    exploded token stream (~3-4x the raw text bytes once pos/tok row
    overhead is added) never shuffles; only the compact text rows do.
    Operators whose only grouped keys are corpus-global (text_vocab's
    groupBy(tok)) gain nothing from this and should not pay the doc
    exchange.  Measured on the shingle core at sf0.1: 4 -> 2
    exchanges, 0.92 -> 0.55 s (PERF.md round-9 addendum)."""
    n = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(n, "doc_id")


@query(
    "text_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS total_chars,
           round(CAST(sum(len(text)) AS DOUBLE) / count(*), 2) AS avg_chars,
           CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+'))) AS BIGINT)
             AS total_tokens,
           CAST(min(len(text)) AS BIGINT) AS min_chars,
           CAST(max(len(text)) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("llm", "text"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: doc counts, char totals, token
    totals, length extrema.  One partial+final hash aggregation; the
    shuffle carries |langs| rows per map partition."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.regexp_count("text", F.lit("[a-zA-Z0-9]+"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.round(
                F.sum(F.length("text")).cast("double") / F.count("*"), 2
            ).alias("avg_chars"),
            F.sum(n_tokens).alias("total_tokens"),
            F.min(F.length("text")).alias("min_chars"),
            F.max(F.length("text")).alias("max_chars"),
        )
    )


def _lang_scores(col):
    return {
        lang: F.regexp_count(col, F.lit(pat)) for lang, pat in LANG_PROFILES.items()
    }


@query(
    "text_langid",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|is)\\b')) AS INT) AS s_en,
             CAST(len(regexp_extract_all(text, '\\b(der|die|das|und|ist)\\b')) AS INT) AS s_de,
             CAST(len(regexp_extract_all(text, '\\b(le|la|les|et|est)\\b')) AS INT) AS s_fr,
             CAST(len(regexp_extract_all(text, '\\b(el|los|las|y|es)\\b')) AS INT) AS s_es,
             CAST(len(regexp_extract_all(text, '\\b(de|le|shi|he|zai)\\b')) AS INT) AS s_zh
      FROM documents
    )
    SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_zh THEN 'es'
             ELSE 'zh'
           END AS pred_lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_zh THEN 'es'
             ELSE 'zh'
           END = lang AS hit
    FROM scored
    """,
    tags=("llm", "text"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: per-language whole-word
    profile counts, argmax with a fixed tie-break.  The heuristic (not
    the corpus label) is the contract — the oracle replicates the
    scoring exactly, and ``hit`` records agreement with the label.
    Pure map stage; at scale this is a scan-speed classifier."""
    docs = load_table(spark, sf_dir, "documents")
    s = _lang_scores(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[s[lang].alias(f"s_{lang}") for lang in LANG_PROFILES],
    )
    c = {lang: F.col(f"s_{lang}") for lang in LANG_PROFILES}
    pred = (
        F.when(
            (c["en"] >= c["de"])
            & (c["en"] >= c["fr"])
            & (c["en"] >= c["es"])
            & (c["en"] >= c["zh"]),
            F.lit("en"),
        )
        .when((c["de"] >= c["fr"]) & (c["de"] >= c["es"]) & (c["de"] >= c["zh"]), "de")
        .when((c["fr"] >= c["es"]) & (c["fr"] >= c["zh"]), "fr")
        .when(c["es"] >= c["zh"], "es")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id",
        "s_en",
        "s_de",
        "s_fr",
        "s_es",
        "s_zh",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("hit"),
    )


@query(
    "text_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS INT) AS alnum_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS distinct_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_ISH}')) AS INT) AS bpe_pieces,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS ttr
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, alnum-run regex,
    and a BPE-ish pre-tokenizer regex (GPT-2's pattern sans
    lookahead), plus distinct-token count and type-token ratio."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(ws).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-zA-Z0-9]+")).alias("alnum_tokens"),
        F.size(F.array_distinct(ws)).alias("distinct_tokens"),
        F.regexp_count("text", F.lit(BPE_ISH)).alias("bpe_pieces"),
        F.round(
            F.size(F.array_distinct(ws)).cast("double") / F.size(ws), 6
        ).alias("ttr"),
    )


# Quality-composite weights and expressions, single-sourced: both the
# text_quality key and the pipeline_corpus composite (pipeline_ext)
# must score documents IDENTICALLY, on both engines.
QUALITY_W_TTR = 0.5
QUALITY_W_ALPHA = 0.3
QUALITY_W_LEN = 0.2
QUALITY_LEN_LO, QUALITY_LEN_HI = 100, 2000


def quality_stat_columns() -> list:
    """The EXPENSIVE per-doc text statistics (regexp counts, token
    splits), computed exactly once in their own projection.  Consumers
    must keep this select as a separate stage and derive ratios from
    the resulting column REFS: expressions inside a CASE branch (the
    empty-doc guard) are excluded from codegen subexpression
    elimination, so inlining these trees into guarded formulas
    re-evaluates every regexp/split per consumer — measured 2.4x on
    text_quality.  A projection of multiply-referenced non-cheap
    aliases is exactly what CollapseProject refuses to merge, so the
    two-stage shape survives optimization."""
    ws = F.split("text", " ")
    return [
        F.length("text").alias("q_n_chars"),
        F.regexp_count("text", F.lit("[a-zA-Z]")).alias("q_alpha"),
        F.size(ws).alias("q_n_tokens"),
        F.size(F.array_distinct(ws)).alias("q_n_distinct"),
    ]


def spark_quality_from_stats(
    n_chars=None, alpha=None, n_tokens=None, n_distinct=None
):
    """The guarded composite quality score from precomputed stats
    columns: NULL for empty documents (ANSI div-by-zero / DuckDB-NaN
    guard).  Defaults to the column names quality_stat_columns emits,
    so callers that keep those aliases just write
    ``spark_quality_from_stats()``.  Pass cheap column refs, not
    expression trees — see quality_stat_columns."""
    n_chars = F.col("q_n_chars") if n_chars is None else n_chars
    alpha = F.col("q_alpha") if alpha is None else alpha
    n_tokens = F.col("q_n_tokens") if n_tokens is None else n_tokens
    n_distinct = F.col("q_n_distinct") if n_distinct is None else n_distinct
    ttr = n_distinct.cast("double") / n_tokens
    len_ok = (n_chars >= QUALITY_LEN_LO) & (n_chars <= QUALITY_LEN_HI)
    return F.when(n_chars == 0, F.lit(None).cast("double")).otherwise(
        F.round(
            F.lit(QUALITY_W_TTR) * ttr
            + F.lit(QUALITY_W_ALPHA) * (alpha.cast("double") / n_chars)
            + F.lit(QUALITY_W_LEN) * F.when(len_ok, 1.0).otherwise(0.0),
            6,
        )
    )


DUCK_QUALITY_EXPR = f"""CASE WHEN length(text) = 0 THEN NULL
                  ELSE round({QUALITY_W_TTR} * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                               / len(string_split(text, ' ')))
                       + {QUALITY_W_ALPHA} * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                                / length(text))
                       + {QUALITY_W_LEN} * (CASE WHEN length(text) BETWEEN {QUALITY_LEN_LO} AND {QUALITY_LEN_HI}
                                     THEN 1.0 ELSE 0.0 END), 6)
                  END"""


@query(
    "text_quality",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len(text) AS INT) AS n_chars_m,
             CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS INT) AS alpha_chars,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS digit_chars,
             CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS INT) AS punct_chars,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct
      FROM documents
    )
    SELECT doc_id, n_chars_m, alpha_chars, digit_chars, punct_chars,
           CASE WHEN n_chars_m = 0 THEN NULL
                ELSE round(CAST(alpha_chars AS DOUBLE) / n_chars_m, 6)
                END AS alpha_ratio,
           CASE WHEN n_chars_m = 0 THEN NULL
                ELSE round(CAST(punct_chars AS DOUBLE) / n_chars_m, 6)
                END AS punct_ratio,
           round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr,
           n_chars_m >= {QUALITY_LEN_LO} AND n_chars_m <= {QUALITY_LEN_HI} AS len_ok,
           CASE WHEN n_chars_m = 0 THEN NULL
                ELSE round({QUALITY_W_TTR} * (CAST(n_distinct AS DOUBLE) / n_tokens)
                     + {QUALITY_W_ALPHA} * (CAST(alpha_chars AS DOUBLE) / n_chars_m)
                     + {QUALITY_W_LEN} * (CASE WHEN n_chars_m >= {QUALITY_LEN_LO}
                                   AND n_chars_m <= {QUALITY_LEN_HI}
                                   THEN 1.0 ELSE 0.0 END), 6)
                END AS quality
    FROM m
    """,
    tags=("llm", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: char-class ratios, length gate,
    type-token ratio, and a fixed-weight composite score.  The
    composite is evaluated in one double expression with identical
    operation order on both engines, so 6dp rounding is exact.

    Empty documents (n_chars = 0) yield NULL ratios/quality via an
    explicit guard on both engines — ANSI Spark would error on the
    division, DuckDB would emit NaN.  (ttr needs no guard:
    split('', ' ') is [''], so n_tokens >= 1 always.)

    Two-stage projection: the expensive regexp/split stats compute
    ONCE (mirroring the oracle's m CTE), then the guarded ratios read
    their column refs — see quality_stat_columns for why."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        *quality_stat_columns(),
        F.regexp_count("text", F.lit("[0-9]")).alias("q_digit"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).alias("q_punct"),
    )
    n_chars_m = F.col("q_n_chars")
    alpha = F.col("q_alpha")
    n_tokens = F.col("q_n_tokens")
    n_distinct = F.col("q_n_distinct")
    len_ok = (n_chars_m >= QUALITY_LEN_LO) & (n_chars_m <= QUALITY_LEN_HI)
    ttr = n_distinct.cast("double") / n_tokens

    def nonempty(col):
        return F.when(n_chars_m == 0, F.lit(None).cast("double")).otherwise(col)

    return m.select(
        "doc_id",
        n_chars_m.alias("n_chars_m"),
        alpha.alias("alpha_chars"),
        F.col("q_digit").alias("digit_chars"),
        F.col("q_punct").alias("punct_chars"),
        nonempty(F.round(alpha.cast("double") / n_chars_m, 6)).alias("alpha_ratio"),
        nonempty(
            F.round(F.col("q_punct").cast("double") / n_chars_m, 6)
        ).alias("punct_ratio"),
        F.round(ttr, 6).alias("ttr"),
        len_ok.alias("len_ok"),
        spark_quality_from_stats(n_chars_m, alpha, n_tokens, n_distinct).alias(
            "quality"
        ),
    )


STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
_STOP_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"


@query(
    "text_clean",
    oracle=f"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, '{_STOP_RE}', '', 'g'),
                               ' +', ' ', 'g')) AS cleaned,
           CAST(len(text) - len(trim(regexp_replace(
                  regexp_replace(text, '{_STOP_RE}', '', 'g'), ' +', ' ', 'g')))
                AS INT) AS removed_chars
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-strip normalization: remove a fixed stopword list,
    collapse whitespace, report chars removed — the cleaning step
    before shingling/vocab in a training pipeline.  Map-only JVM
    regex; same pattern text in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace("text", _STOP_RE, ""), " +", " ")
    )
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        (F.length("text") - F.length(cleaned)).cast("int").alias("removed_chars"),
    )


@query(
    "text_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    bigrams AS (
      SELECT concat(a.tok, ' ', b.tok) AS bigram
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    counted AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bigrams GROUP BY bigram
    )
    SELECT bigram, n,
           CAST(row_number() OVER (ORDER BY n DESC, bigram) AS INT) AS rank
    FROM counted
    QUALIFY rank <= 20
    """,
    tags=("llm", "text", "ngram"),
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency analysis: top-20 word bigrams globally
    (the n-gram statistics pass of corpus analysis).  Spark builds
    bigrams with the same posexplode + lead window the shingle
    pipeline uses (codegen'd; cohort_by_doc co-locates the compact
    text rows so the window never shuffles the exploded stream),
    counts with a map-side-combinable aggregation, then global top-k
    before ranking."""
    docs = cohort_by_doc(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        t.withColumn("nxt", F.lead("tok", 1).over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "tok", "nxt").alias("bigram"))
    )
    counted = bigrams.groupBy("bigram").agg(F.count("*").alias("n"))
    top = counted.orderBy(F.col("n").desc(), F.col("bigram")).limit(20)
    wr = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return top.withColumn("rank", F.row_number().over(wr))


@query(
    "text_vocab",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counted AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
    )
    SELECT tok, n,
           CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT) AS rank
    FROM counted
    QUALIFY rank <= 50
    """,
    tags=("llm", "text"),
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global top-50 tokens by corpus frequency
    (tie-broken lexicographically) — the first step of tokenizer
    training.  Explode → two-phase count aggregation →
    TakeOrderedAndProject for the global top-k (Spark never sorts the
    full vocabulary for an ORDER BY + LIMIT).  At 100 TB the count
    table is |vocab| rows — tiny next to the corpus — and the
    explode/count is the canonical map-side-combinable word count."""
    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    # global top-k FIRST (TakeOrderedAndProject: per-partition heads,
    # no full sort), then rank the 50 survivors — the unbounded-window
    # rank over the whole vocab would funnel it into one partition
    top = counted.orderBy(F.col("n").desc(), F.col("tok")).limit(50)
    w = Window.orderBy(F.col("n").desc(), F.col("tok"))
    return top.withColumn("rank", F.row_number().over(w))


@query(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    dfreq AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfr FROM toks GROUP BY tok
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.tok,
             round(t.tf * ln(n.n_docs / d.dfr), 6) AS tfidf
      FROM tf t JOIN dfreq d ON t.tok = d.tok CROSS JOIN n
    )
    SELECT doc_id, tok, tfidf,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok) AS INT) AS rnk
    FROM scored
    QUALIFY rnk <= 3
    """,
    tags=("llm", "text", "tfidf"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by
    tf * ln(N/df).  Long-format word counts (map-side combinable),
    document frequencies joined back on the token (the df table is
    |vocab| rows — broadcast), top-3 via per-doc window.  ln is
    libm-correct on both engines; 6dp rounding absorbs the last ulp
    (same discipline as scalar_math).  cohort_by_doc makes the tf
    aggregation and the per-doc top-3 window exchange-free; only the
    df branch (corpus-global key) still shuffles its partials."""
    docs = cohort_by_doc(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("dfr"))
    n_docs = docs.count()  # driver scalar: one count job, O(1) result
    scored = tf.join(F.broadcast(dfreq), "tok").select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("dfr")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS n
      FROM documents
    )
    SELECT doc_id,
           md5(n) AS fp_md5,
           CAST(concat('0x', substring(md5(n), 1, 15)) AS BIGINT) AS fp_int60,
           md5(array_to_string(list_sort(list_distinct(string_split(n, ' '))), ' '))
             AS fp_sorted_sig
    FROM norm
    """,
    tags=("llm", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: a normalization fingerprint (lowercase,
    strip non-alnum, collapse whitespace → md5), a 60-bit integer form
    of it (first 15 hex chars — fits signed 64-bit on both engines),
    and a bag-of-words signature (md5 of the sorted distinct token
    set).  The int60 form is the join key a 100 TB dedup would
    hash-partition on — 8 bytes instead of a 32-char string."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    fp = F.md5(n)
    return docs.select(
        "doc_id",
        fp.alias("fp_md5"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint").alias("fp_int60"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split(n, " "))), " ")
        ).alias("fp_sorted_sig"),
    )


# ------------------------------------------------- collocations / sketches

MIN_COLLOC_N = 5     # a bigram must occur this often to be scored
TOP_COLLOC = 20

CMS_ROWS = 3         # count-min sketch depth (independent hash rows)
CMS_WIDTH = 32       # deliberately narrow: the fixture vocabulary is
                     # ~60 tokens, so counter collisions — the thing a
                     # CMS trades for its size — provably occur and the
                     # overestimate column is exercised by real rows
TOP_HITTERS = 20


def _colloc_h60(engine: str, tag: str, arg: str) -> str:
    from downloader_spark.operators.llm_dedup import _duck_h60, _spark_h60

    f = _spark_h60 if engine == "spark" else _duck_h60
    cast = "STRING" if engine == "spark" else "VARCHAR"
    return f(f"concat('{tag}:', CAST({arg} AS {cast}))")


@query(
    "text_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
    total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
    big AS (
      SELECT a.tok AS t1, b.tok AS t2, CAST(count(*) AS BIGINT) AS n_ab
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT concat(t1, ' ', t2) AS bigram, n_ab,
             n_ab * t.n_total * 1000000 // (ua.n * ub.n) AS lift_ppm
      FROM big
      JOIN uni ua ON ua.tok = t1
      JOIN uni ub ON ub.tok = t2
      CROSS JOIN total t
      WHERE n_ab >= {MIN_COLLOC_N}
    )
    SELECT bigram, n_ab, lift_ppm,
           CAST(row_number() OVER (ORDER BY lift_ppm DESC, bigram) AS INT)
             AS rank
    FROM scored
    QUALIFY rank <= {TOP_COLLOC}
    """,
    tags=("llm", "text", "collocation"),
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_COLLOC} collocations by LIFT — bigram probability
    normalized by its unigrams' (PMI's ratio, kept in exact integer
    floor-ppm instead of a float log): lift separates "sticky" word
    pairs from merely-frequent ones, the statistic text_ngrams' raw
    counts can't see, and the standard phrase-mining signal for
    tokenizer/vocab curation.

    Unigram and bigram counts are two map-side-combinable
    aggregations over the same exploded-token pass; the corpus total
    rides along as a 1-row cross join (broadcast).  lift_ppm =
    n_ab * N * 1e6 DIV (n_a * n_b) stays in BIGINT for corpora up to
    ~1e12 token-bigram products — both engines would raise on
    overflow rather than silently diverge (ANSI mode / DuckDB
    checked arithmetic).  cohort_by_doc keeps the bigram window off
    the exploded stream; the unigram/bigram count exchanges carry
    vocabulary-sized partials either way."""
    docs = cohort_by_doc(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    uni = t.groupBy("tok").agg(F.count("*").alias("n"))
    total = t.agg(F.count("*").alias("n_total"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        t.withColumn("nxt", F.lead("tok", 1).over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("t1"), F.col("nxt").alias("t2"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_COLLOC_N)
    )
    ua = uni.select(F.col("tok").alias("t1"), F.col("n").alias("na"))
    ub = uni.select(F.col("tok").alias("t2"), F.col("n").alias("nb"))
    scored = (
        big.join(ua, "t1")
        .join(ub, "t2")
        .crossJoin(F.broadcast(total))
        .select(
            F.concat_ws(" ", "t1", "t2").alias("bigram"),
            "n_ab",
            F.expr("n_ab * n_total * 1000000 DIV (na * nb)").alias("lift_ppm"),
        )
    )
    wr = Window.orderBy(F.col("lift_ppm").desc(), F.col("bigram"))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= TOP_COLLOC)
    )


@query(
    "agg_countmin",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
    cells AS (
      SELECT r, {_colloc_h60("duck", "cms' || r || '", "tok")} % {CMS_WIDTH}
               AS pos,
             CAST(count(*) AS BIGINT) AS c
      FROM toks CROSS JOIN (SELECT unnest([0,1,2]) AS r)
      GROUP BY 1, 2
    ),
    hitters AS (
      SELECT tok, n,
             CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT) AS rank
      FROM exact QUALIFY rank <= {TOP_HITTERS}
    ),
    probed AS (
      SELECT h.tok, h.n, h.rank, min(c.c) AS cms_estimate
      FROM hitters h
      JOIN cells c
        ON c.pos = {_colloc_h60("duck", "cms' || c.r || '", "h.tok")}
                   % {CMS_WIDTH}
      GROUP BY 1, 2, 3
    )
    SELECT tok, n AS exact_n, rank, cms_estimate,
           cms_estimate - n AS overestimate
    FROM probed
    """,
    tags=("aggregate", "sketch", "llm"),
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters with the sketch's error UNDER
    TEST: token frequencies compressed into a {CMS_ROWS}x{CMS_WIDTH}
    counter grid (md5-derived positions, pure counting — one
    aggregation builds all rows), the top-{TOP_HITTERS} exact tokens
    probe it, and the output reports estimate vs truth per token.
    CMS guarantees estimate >= truth; the overestimate column shows
    the collision inflation a {CMS_WIDTH}-wide sketch pays (sized so
    collisions provably occur on this vocabulary — a production
    sketch widens w for an epsilon bound; the plan shape is
    identical).

    At 100 TB this is the heavy-hitter pattern that avoids a full
    groupBy over a monster key space: the sketch is {CMS_ROWS}x
    {CMS_WIDTH} counters regardless of vocabulary size,
    map-side-combinable, broadcastable to any probe side.  Positions
    are md5-derived, so DuckDB rebuilds the identical grid and the
    per-token estimates match exactly."""
    # the token explode + 3x md5 cell derivation is CPU-dense map work
    # over the single-split scan (one core without spread; no-op at
    # 100 TB where the scan has thousands of splits) — fan it out
    # before the explode (the text_cdc_chunks posture)
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        key="doc_id",
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("n"))
    rows = toks.select(
        "tok", F.explode(F.array(*[F.lit(r) for r in range(CMS_ROWS)])).alias("r")
    )
    cells = rows.groupBy(
        "r",
        F.expr(
            f"pmod({_colloc_h60('spark', 'cms' + chr(39) + ' || r || ' + chr(39), 'tok')}, {CMS_WIDTH})"
        ).alias("pos"),
    ).agg(F.count("*").alias("c"))
    wr = Window.orderBy(F.col("n").desc(), F.col("tok"))
    hitters = (
        exact.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= TOP_HITTERS)
    )
    probe = hitters.select(
        "tok", "n", "rank",
        F.explode(F.array(*[F.lit(r) for r in range(CMS_ROWS)])).alias("r"),
    ).withColumn(
        "pos",
        F.expr(
            f"pmod({_colloc_h60('spark', 'cms' + chr(39) + ' || r || ' + chr(39), 'tok')}, {CMS_WIDTH})"
        ),
    )
    probed = (
        probe.join(F.broadcast(cells), ["r", "pos"])
        .groupBy("tok", "n", "rank")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return probed.select(
        "tok",
        F.col("n").alias("exact_n"),
        "rank",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n")).alias("overestimate"),
    )

HASHVEC_BUCKETS = 64


@query(
    "text_hashvec",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(concat('hv:', w)), 1, 15))
                  AS BIGINT) % {HASHVEC_BUCKETS} AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS nnz,
           CAST(SUM(c) AS BIGINT) AS total,
           CAST(SUM(c * c) AS BIGINT) AS sq_norm,
           md5(string_agg(concat(CAST(bucket AS VARCHAR), ':',
                                 CAST(c AS VARCHAR)), ',' ORDER BY bucket))
             AS vec_md5
    FROM b GROUP BY doc_id
    """,
    tags=("llm", "text", "features", "hashing"),
)
def text_hashvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorizer (the hashing trick): project every
    document's bag of words into a fixed {HASHVEC_BUCKETS}-bucket
    count vector by hashing tokens — no vocabulary pass, no global
    dictionary, memory O(buckets) per doc regardless of vocab size.
    This is the sklearn-HashingVectorizer / Vowpal-Wabbit primitive
    a streaming featurizer needs at 100 TB: the vocab table that
    text_vocab builds (and its full-corpus shuffle) disappears
    entirely.

    The checked surface is the sparse vector itself: per doc the
    nonzero count, L1 total, exact squared L2 norm, and the md5 of
    the bucket-ordered "bucket:count" serialization (struct-sorted
    numerically — never lexicographically — on both engines).  One
    explode + two groupBys, keyed on (doc, bucket) then doc — both
    satisfied exchange-free by cohort_by_doc's doc_id partitioning
    (doc_id is a subset of both key sets); uniform keys, no
    vocabulary skew by construction (hot tokens spread over buckets
    only if they hash apart; the bucket count bounds the damage
    either way)."""
    docs = cohort_by_doc(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    b = tok.groupBy(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(concat('hv:', w)), 1, 15), 16, 10) AS BIGINT)"
            f" % {HASHVEC_BUCKETS}"
        ).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return b.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nnz"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq_norm"),
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(bucket, c))),"
                    " s -> concat(CAST(s.bucket AS STRING), ':', CAST(s.c AS STRING)))"
                ),
                ",",
            )
        ).alias("vec_md5"),
    )


@query(
    "text_repetition",
    oracle="""
    WITH split AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    posed AS (
      SELECT doc_id, ts,
             unnest(generate_series(1, len(ts))) AS pos
      FROM split
    ),
    toks AS (
      SELECT doc_id, ts[CAST(pos AS BIGINT)] AS tok,
             CAST(pos AS BIGINT) AS pos
      FROM posed
    ),
    tri AS (
      SELECT doc_id, pos, tok,
             CASE WHEN lead(tok, 2) OVER w IS NOT NULL
                  THEN tok || ' ' || lead(tok, 1) OVER w
                       || ' ' || lead(tok, 2) OVER w
             END AS trigram,
             CASE WHEN lag(tok) OVER w IS DISTINCT FROM tok
                  THEN 1 ELSE 0 END AS run_start
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    runs AS (
      SELECT doc_id, trigram,
             count(*) OVER (PARTITION BY doc_id, run_id) AS run_len
      FROM (
        SELECT doc_id, trigram,
               sum(run_start) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
        FROM tri
      )
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(count(trigram) AS BIGINT) AS n_trigrams,
           CAST(count(DISTINCT trigram) AS BIGINT) AS distinct_trigrams,
           CAST(CASE WHEN count(trigram) > 0
                THEN (count(trigram) - count(DISTINCT trigram)) * 1000000
                     // count(trigram) END AS BIGINT) AS dup_ppm,
           CAST(max(run_len) AS BIGINT) AS max_run
    FROM runs
    GROUP BY doc_id
    """,
    tags=("llm", "text", "quality", "repetition"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics — the Gopher/RefinedWeb
    quality filter family: duplicate-trigram fraction (boilerplate
    and template spam) and longest identical-token run (stutter
    loops), per document.

    ONE exchange end-to-end — and of the COMPACT rows: cohort_by_doc
    hash-partitions the raw (doc_id, text) rows, and every later
    step — the explode, the trigram leads (doc_id, pos window), the
    run-anchor window (doc_id, tok), the run-length count, and the
    final per-doc rollup — clusters by doc_id or a superset, so
    Spark satisfies each distribution with the existing partitioning
    and never re-shuffles (previously the one exchange carried the
    exploded per-token rows, ~3-4x the text bytes).  Runs use the row_number ANCHOR trick
    (pos − rank-within-(doc, tok) is constant across a run); the
    oracle builds run ids with the lag-flag + running-sum
    formulation instead — two constructions, one hash."""
    docs = cohort_by_doc(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    w_run = Window.partitionBy("doc_id", "tok").orderBy("pos")
    tri = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.when(
            F.lead("tok", 2).over(w).isNotNull(),
            F.concat_ws(
                " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
            ),
        ).alias("trigram"),
        (F.col("pos") - F.row_number().over(w_run)).alias("run_anchor"),
    )
    w_len = Window.partitionBy("doc_id", "tok", "run_anchor")
    runs = tri.withColumn("run_len", F.count(F.lit(1)).over(w_len))
    n_tri = F.count("trigram")
    return runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        n_tri.alias("n_trigrams"),
        F.countDistinct("trigram").alias("distinct_trigrams"),
        F.when(
            n_tri > 0,
            F.expr(
                "(count(trigram) - count(DISTINCT trigram)) * 1000000"
                " DIV count(trigram)"
            ),
        ).alias("dup_ppm"),
        F.max("run_len").alias("max_run"),
    )
