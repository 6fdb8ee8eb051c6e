"""The flagship pipeline: the reference's whole semantic core as one plan.

Incremental watermark filter (A3, routeviews.go:107) → exact content-
hash dedup keep-first (A5, common.go:169-190) → latest per key (A7,
file/api.go:81-87) — i.e. "fetch only new log entries, drop content
duplicates, maintain the current pointer per dataset" as a single
declarative DataFrame plan over the events table.

Plan shape at scale: one pushed-down scan filter, then two SORTLESS
hash shuffles (digest, then key) — both stages are struct-extremum
aggregations that partial-aggregate map-side; nothing touches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from downloader_spark.io import load_table


def flagship_via_ingest(
    spark: SparkSession, sf_dir: str, state_dir: str, n_objects: int = 20
) -> DataFrame:
    """The flagship semantics driven through the REAL control plane:
    synthesize a creation log + payloads from the events table, run a
    full ingest cycle (fetch → dedup → publish → current, with
    checkpointed watermark), then answer from the DERIVED state —
    the current-pointer table joined with the inventory rollup.

    This is the integration proof that the query layer runs on state
    the ingest layer maintains (UpdateCurrent.sh's premise, SURVEY
    §3.3: 'current' is derivable from the archive alone)."""
    from downloader_spark.ingest import Downloader, InMemoryStore, SourceSpec
    from downloader_spark.ingest.fetcher import FakeFetcher

    rows = (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(n_objects)
        .collect()
    )
    base = "http://fixture.test/logs/"
    log_lines = ["# synthesized creation log"]
    responses = {}
    for r in rows:
        path = f"2024/01/ev-{r.event_id}.bin"
        log_lines.append(f"{r.event_id}\t{1700000000 + r.event_id}\t{path}")
        responses[base + path] = (r.props or "").encode()  # dup props -> dup content
    responses[base + "creation.log"] = "\n".join(log_lines).encode()

    spec = SourceSpec(
        name="flagship-events",
        kind="incremental",
        url=base + "creation.log",
        path_prefix="Events/",
        current_name="Events/current/latest.bin",
        url_regexp=r".*?(\d{4}/\d{2}/)(.*)",
        dedup_regexp=r"(.*/).*",
    )
    dl = Downloader(
        spark,
        InMemoryStore(),
        FakeFetcher(responses),
        state_dir,
        retry_min_s=0.01,
        retry_max_s=0.04,
        sleep=lambda s: None,
    )
    dl.run_cycle([spec])
    current = dl.current_table().select(
        "dataset", F.col("name").alias("current_name"), "ingest_seq"
    )
    stats = dl.inventory.stats(spark)
    return current.join(stats, "dataset")


def flagship(spark: SparkSession, sf_dir: str, watermark: int = 100) -> DataFrame:
    """Both stages are struct-extremum AGGREGATIONS, not window sorts
    (same rewrite as latest_per_key/dedup_exact_hash): keep-first per
    digest = min(struct(event_id, ...)), latest per user =
    max(struct(ts, event_id, ...)).  Each partial-aggregates map-side
    and skips the in-partition sort — the plan is two sortless hash
    shuffles end to end."""
    events = load_table(spark, sf_dir, "events")
    firsts = (
        events.filter(F.col("event_id") > watermark)
        .withColumn("content_md5", F.md5(F.col("props")))
        .groupBy("content_md5")
        .agg(F.min(F.struct("event_id", "ts", "user_id", "event_type")).alias("m"))
        .select(
            "content_md5",
            F.col("m.event_id").alias("event_id"),
            F.col("m.ts").alias("ts"),
            F.col("m.user_id").alias("user_id"),
            F.col("m.event_type").alias("event_type"),
        )
    )
    return (
        firsts.groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "event_type", "content_md5")).alias("m")
        )
        .select(
            "user_id",
            F.col("m.event_id").alias("event_id"),
            F.col("m.ts").alias("ts"),
            F.col("m.event_type").alias("event_type"),
            F.col("m.content_md5").alias("content_md5"),
        )
    )
