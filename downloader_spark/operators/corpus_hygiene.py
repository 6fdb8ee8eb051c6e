"""Corpus-hygiene operators (round 3 tail): the web-corpus cleaning
steps every large-scale training-data pipeline runs that the dedup /
quality families don't yet cover — URL canonicalization dedup, PII
masking, and benchmark-contamination detection.

Exactness rules as everywhere: lookaround-free regexes (Java regex ==
RE2 on this subset), md5-derived hashes, integer counts; the oracle
replicates each transformation verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.operators.llm_dedup import shingle_sets
from downloader_spark.operators.llm_text import (
    DUCK_QUALITY_EXPR,
    quality_stat_columns,
    spark_quality_from_stats,
)
from downloader_spark.plans.registry import query

# --------------------------------------------------------- URL dedup

# Synthesized crawl URLs (the fixture has no URL column): scheme/case
# noise, default ports, tracking params and fragments are injected
# deterministically from the orderkey so canonicalization has real
# work to do, and orders sharing (custkey, orderpriority) collide to
# the same canonical URL — the duplicates to collapse.
_DUCK_RAW_URL = """
  concat(CASE WHEN o_orderkey % 3 = 0 THEN 'HTTPS' ELSE 'https' END,
         '://', CASE WHEN o_orderkey % 2 = 0 THEN 'Crawl.Example.COM'
                     ELSE 'crawl.example.com' END,
         CASE WHEN o_orderkey % 5 = 0 THEN ':443' ELSE '' END,
         '/item/', CAST(o_custkey AS VARCHAR), '/',
         replace(lower(o_orderpriority), ' ', '-'),
         CASE WHEN o_orderkey % 4 = 0
              THEN concat('?utm_source=feed&utm_campaign=x', '#frag')
              ELSE '' END)
"""


@query(
    "dedup_url",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey, {_DUCK_RAW_URL} AS url
      FROM orders WHERE o_orderkey % 20 = 3
    ),
    canon AS (
      SELECT o_orderkey,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url), '[?#].*$', ''),
                 ':443/', '/'),
               '/$', '') AS curl
      FROM raw
    )
    SELECT curl AS canonical_url,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(o_orderkey) AS BIGINT) AS keep_id
    FROM canon GROUP BY curl
    """,
    tags=("llm", "dedup", "url"),
)
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first dedup stage of any web
    corpus (scheme/host case folding, default-port strip, tracking
    query/fragment strip, trailing-slash strip), then collapse to one
    representative per canonical URL (lowest id) with the duplicate
    count.  Pure map stage + one combined shuffle on the canonical
    string; the regex chain is identical in both engines
    (lookaround-free)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 3)
    raw = F.concat(
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("HTTPS")).otherwise(
            F.lit("https")
        ),
        F.lit("://"),
        F.when(
            F.col("o_orderkey") % 2 == 0, F.lit("Crawl.Example.COM")
        ).otherwise(F.lit("crawl.example.com")),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/item/"),
        F.col("o_custkey").cast("string"),
        F.lit("/"),
        F.regexp_replace(F.lower("o_orderpriority"), " ", "-"),
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.lit("?utm_source=feed&utm_campaign=x#frag"),
        ).otherwise(F.lit("")),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), r"[?#].*$", ""), ":443/", "/"
        ),
        "/$",
        "",
    )
    return (
        o.select("o_orderkey", curl.alias("curl"))
        .groupBy(F.col("curl").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("o_orderkey").alias("keep_id"),
        )
    )


# ----------------------------------------------------------- PII mask

# Lookaround-free patterns (Java regex == RE2): emails and
# US-phone-shaped digit runs.  The fixture text has neither, so PII is
# INJECTED deterministically for a subset of docs — the masking then
# provably fires (mask counts are part of the checked output).
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "text_pii_mask",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                  THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                              '@mail.example.org or 555-',
                              lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
                              '-0199')
                  ELSE text END AS text
      FROM documents WHERE doc_id % 2 = 0
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS masked,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones
    FROM seeded
    """,
    tags=("llm", "text", "pii"),
)
def text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking — the corpus-cleaning pass that replaces emails and
    phone-shaped tokens with typed placeholders, plus per-doc match
    counts (the audit trail a data-governance review wants).  PII is
    injected deterministically into a quarter of the docs (the fixture
    contains none), so the masking measurably fires and the oracle
    checks the masked TEXT, not just counts.  Pure map stage; patterns
    are lookaround-free so both engines' regex dialects agree."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.org or 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-0199"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return seeded.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("masked"),
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
    )


# ------------------------------------------------- contamination scan

BENCH_DOCS = 25  # doc_id < 25 plays the held-out benchmark set
CONTAM_MIN_SHARED = 3  # >=3 shared 3-gram shingles flags a doc


@query(
    "text_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')
               AS toks
      FROM documents
    ),
    shingled AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM toks
    ),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
    bench AS (SELECT DISTINCT s FROM inv WHERE doc_id < {BENCH_DOCS}),
    hits AS (
      SELECT i.doc_id, count(*) AS shared
      FROM inv i JOIN bench b ON i.s = b.s
      WHERE i.doc_id >= {BENCH_DOCS}
      GROUP BY i.doc_id
    )
    SELECT doc_id, CAST(shared AS BIGINT) AS shared_shingles
    FROM hits WHERE shared >= {CONTAM_MIN_SHARED}
    """,
    tags=("llm", "text", "contamination"),
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: corpus documents sharing >=
    {CONTAM_MIN_SHARED} word-3-gram shingles with a held-out benchmark
    set (doc_id < {BENCH_DOCS} plays that role) — the decontamination
    gate run before training on web data.

    Shape: the benchmark's DISTINCT shingle set is small (it would be
    BROADCAST at scale); corpus shingle rows semi-join against it and
    a per-doc count applies the threshold — an asymmetric one-sided
    variant of the n-gram inverted index, with NO corpus-vs-corpus
    pair work at all.  Reuses shingle_sets' long-format machinery."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_sets(docs)
    bench = (
        sh.filter(F.col("doc_id") < BENCH_DOCS).select("s").distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") >= BENCH_DOCS)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    return hits.filter(F.col("shared_shingles") >= CONTAM_MIN_SHARED).select(
        "doc_id", F.col("shared_shingles").cast("bigint").alias("shared_shingles")
    )


@query(
    "dedup_semantic",
    oracle=f"""
    WITH scored AS (
      SELECT e.label, d.doc_id,
             CAST(floor(({DUCK_QUALITY_EXPR}) * 1000000) AS BIGINT) AS q_ppm
      FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped,
           CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_doc,
           CAST(max(CASE WHEN rn = 1 THEN q_ppm END) AS BIGINT) AS keep_q_ppm
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY label ORDER BY q_ppm DESC NULLS LAST, doc_id
      ) AS rn
      FROM scored
    )
    GROUP BY label
    """,
    tags=("llm", "dedup", "semantic", "embedding"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023, public):
    documents whose embeddings share a semantic cluster are
    near-redundant for training — keep ONE representative per
    cluster, the highest-quality member, and drop the rest.  Uses
    the pretrained cluster assignment in ``label`` (the same coarse
    partitioning the IVF index probes) and the shared text-quality
    composite as the keep criterion.

    The keep decision compares floor-ppm quality (exact BIGINT;
    float quality never enters an engine comparison) with doc_id
    tie-break, computed as ONE struct-max aggregation per cluster —
    associative, map-side combinable, no window over data (the
    oracle ranks instead — two constructions, one hash).  At 100 TB:
    embeddings join documents on their co-partitioned id, and the
    per-cluster argmax shuffles one combiner row per cluster per
    partition."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select("doc_id", *quality_stat_columns())
    scored = emb.join(stats, emb.vec_id == stats.doc_id).select(
        "label",
        "doc_id",
        F.floor(spark_quality_from_stats() * 1_000_000)
        .cast("long")
        .alias("q_ppm"),
    )
    # struct-max over (quality, -doc_id): NULL quality sorts last in
    # the oracle; make the struct key mirror that with a presence flag
    key = F.struct(
        F.col("q_ppm").isNotNull().alias("has_q"),
        F.col("q_ppm").alias("q"),
        (-F.col("doc_id")).alias("nd"),
        F.col("doc_id").alias("doc_id"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
        F.max(key).getField("doc_id").alias("keep_doc"),
        F.max(key).getField("q").alias("keep_q_ppm"),
    )
