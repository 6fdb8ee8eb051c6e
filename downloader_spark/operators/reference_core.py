"""Reference-core operators (SURVEY.md §2.A) as Spark DataFrame plans.

These re-express the dataflow semantics of m-lab/downloader —
regex-parsed log scan, watermark filter, path projection, content-hash
dedup (global and scoped), latest-pointer maintenance, inventory
aggregation, labeled-counter metrics — on the driver's synthetic
tables.  Reference sites cited per function.

Scale posture (100 TB): every operator here is a single hash-partition
pass — dedup shuffles on the content digest (uniformly distributed, no
skew), latest-per-key shuffles on the entity key, and the window
variants all reduce to one exchange + one sort within partitions.
No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from downloader_spark.functions.numeric import money_sum, sql_money_sum
from downloader_spark.io import load_table
from downloader_spark.plans.registry import query

# A2 (routeviews.go:73-113): the reference regex-scans a creation log,
# extracting (seqnum, ts, path) per line and dropping comment lines
# because the pattern requires leading digits.  Same shape here: a
# regexp_extract projection over a string column, non-matches dropped.
_KV_RE = r'"k":\s*(\d+)'


@query(
    "parse_regex_log",
    oracle=f"""
    SELECT event_id,
           CAST(regexp_extract(props, '{_KV_RE}', 1) AS INT) AS k_val
    FROM events
    WHERE regexp_matches(props, '{_KV_RE}')
    """,
    tags=("reference", "A2"),
)
def parse_regex_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scan + typed projection (ref: download/routeviews.go:73-113).

    The regex runs inside whole-stage codegen (JVM regexp_extract), so
    at scale this is a pure map stage — no shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("props").rlike(_KV_RE))
        .select(
            "event_id",
            F.regexp_extract("props", _KV_RE, 1).cast("int").alias("k_val"),
        )
    )


_WATERMARK = 100


@query(
    "filter_watermark",
    oracle=f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_id > {_WATERMARK}
    """,
    tags=("reference", "A3"),
)
def filter_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental high-water-mark scan (ref: download/routeviews.go:107).

    Expressed as a plain filter so Catalyst pushes the predicate into
    the parquet scan (PushedFilters: GreaterThan(event_id, wm)) — at
    100 TB with files sorted/partitioned by seqnum this prunes whole
    files via min/max stats instead of reading them.
    """
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") > _WATERMARK).select(
        "event_id", "user_id", "event_type"
    )


@query(
    "project_paths",
    oracle="""
    SELECT o_orderkey,
           concat('Orders/', strftime(o_orderdate, '%Y/%m/%d'), '/',
                  CAST(o_orderkey AS VARCHAR), '-', o_orderpriority) AS object_name,
           split_part(o_orderpriority, '-', 1) AS prio_code
    FROM orders
    """,
    tags=("reference", "A4"),
)
def project_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-encoded partition-name projection (ref: download/common.go:95-101,
    downloader.go:64): build hierarchical object names embedding the
    date partition, and extract the dedup-scope token.

    Pure projection — map-only, no shuffle, fully codegen'd.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.concat(
            F.lit("Orders/"),
            F.date_format("o_orderdate", "yyyy/MM/dd"),
            F.lit("/"),
            F.col("o_orderkey").cast("string"),
            F.lit("-"),
            F.col("o_orderpriority"),
        ).alias("object_name"),
        F.substring_index("o_orderpriority", "-", 1).alias("prio_code"),
    )


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT doc_id, content_md5
    FROM (
        SELECT doc_id, md5(text) AS content_md5,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    tags=("reference", "A5", "llm-dedup"),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash exact dedup, keep-first (ref: download/common.go:169-190,
    invoked at common.go:114): a file is new iff no other object shares
    its MD5.

    Spark-first shape: keep-first is a MIN aggregation on the digest
    (min(doc_id) per md5 == row_number()=1 ordered by doc_id), so the
    plan partial-aggregates map-side — one combiner row per digest per
    partition crosses the shuffle, and no in-partition sort happens at
    all.  MD5 is uniformly distributed, so the shuffle is skew-free by
    construction; at 100 TB this is the canonical O(N) one-shuffle
    dedup (vs the reference's O(N) bucket listing *per file*, SURVEY
    §4.3.1).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_md5")
    )


@query(
    "dedup_scoped",
    oracle="""
    SELECT doc_id, lang, content_md5
    FROM (
        SELECT doc_id, lang, md5(text) AS content_md5,
               row_number() OVER (PARTITION BY lang, md5(text) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
    tags=("reference", "A6"),
)
def dedup_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-scoped dedup (ref: download/common.go:114 + the
    DedupRegexp scope of download/maxmind.go:13): uniqueness is judged
    within a scope prefix, not globally.  We implement the *documented*
    scoped semantics (the production GCS impl ignores the prefix —
    file/api.go:53 — a bug per SURVEY §4.3.2).

    The scope column simply joins the hash in the grouping key — same
    single skew-free shuffle as the global dedup, min-aggregated
    map-side (see dedup_exact_hash).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "lang", F.md5(F.col("text")).alias("content_md5"))
        .groupBy("lang", "content_md5")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "lang", "content_md5")
    )


@query(
    "latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, round(value, 2) AS value_r
    FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("reference", "A7"),
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-pointer maintenance (ref: file/api.go:81-87 CopyTo, invoked
    common.go:115-121): the `current/` object per dataset == the newest
    row per key.

    Derived-state formulation (what UpdateCurrent.sh recomputes by
    hand, SURVEY §3.3), expressed as a struct-max AGGREGATION rather
    than a window sort: max(struct(ts, event_id, ...)) picks the same
    row as row_number()=1 over (ts DESC, event_id DESC) — (ts,
    event_id) leads the struct, and event_id is unique so the
    comparison never reaches the payload fields.  Unlike the window
    form this is partially aggregated map-side (Spark plans
    SortAggregate with partial_max: one combiner row per key per
    partition crosses the shuffle, and the only sort is by the
    grouping key, never the ordering column) — the 100 TB shape.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m"))
        .select(
            "user_id",
            F.col("m.event_id").alias("event_id"),
            F.col("m.event_type").alias("event_type"),
            F.round("m.value", 2).alias("value_r"),
        )
    )


@query(
    "top1_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    tags=("reference", "A8"),
)
def top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-by-name repair job (ref: UpdateCurrent.sh:7-9 — lexicographic
    max per prefix is the newest object because names embed dates):
    newest order per customer.

    Struct-max aggregation, not a window sort: identical pick to
    row_number()=1 over (o_orderdate DESC, o_orderkey DESC), but
    map-side combinable (see latest_per_key).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("m"))
        .select(
            "o_custkey",
            F.col("m.o_orderkey").alias("o_orderkey"),
            F.col("m.o_orderdate").alias("o_orderdate"),
        )
    )


@query(
    "inventory_agg",
    oracle="""
    SELECT source,
           COUNT(*) AS n_objects,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
    tags=("reference", "A10"),
)
def inventory_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive inventory rollup (ref: file/api.go:52-65 NamesToMD5 — the
    bucket listing is the catalog): objects + distinct content hashes
    per source prefix.

    SURVEY §4.3.1 fix embodied: the inventory is a *table* aggregated
    once per query, not an O(N) remote listing per file.  COUNT
    DISTINCT over md5 is a two-stage hash agg — partials combine
    map-side, so the shuffle carries only per-source hash sets.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_objects"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "metrics_rollup",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_money_sum("value", "total_value")}
    FROM events
    GROUP BY event_type
    """,
    tags=("reference", "A15"),
)
def metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-counter metrics as an aggregation (ref: metrics/metrics.go:13-53,
    e.g. downloader_download_failed_total{download_type}): a labeled
    Prometheus counter is exactly groupBy(label).count().

    The float sum goes through DECIMAL so the value hash is
    engine-exact (functions/numeric.py).
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("value", "total_value"),
    )
