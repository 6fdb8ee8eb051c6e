"""End-to-end streaming integration (round-9 item: the stateful layer
must compose, not just pass unit gates): executor-parallel ingest
lands raw event-log objects in the archive store; ONE checkpointed
StreamingQuery tails the published prefix, regex-parses lines into
typed events, stateful-dedups on content hash within a checkpointed
watermark, and publishes survivors to a parquet table through the
exactly-once file sink; the published table is then QUERIED and must
equal the batch pipeline over the same raw objects — including across
a second ingest wave processed by a RESTARTED query from the same
checkpoint (only the new objects, against the retained dedup state).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from downloader_spark.ingest.batch import batch_ingest
from downloader_spark.ingest.config import SourceSpec
from downloader_spark.ingest.inventory import InventoryTable
from downloader_spark.ingest.store import LocalFSStore
from downloader_spark.streaming import (
    parse_event_log_lines,
    publish_deduped_stream,
)

BASE_TS = 1_700_000_000  # epoch seconds; all waves within one hour

# (file, line) -> "<epoch>,<user>,<type>,<value>,<payload>".  Payload
# duplicates: within ev-1 (dup-a twice), across wave-1 files (dup-b in
# ev-1 and ev-2), and across WAVES (dup-a again in ev-4 — must be
# suppressed by dedup state RETAINED in the checkpoint across the
# restart).
WAVE1 = {
    "ev-1.log": [
        (BASE_TS + 0, 1, "click", "1.25", "dup-a"),
        (BASE_TS + 10, 2, "view", "2.00", "uniq-1"),
        (BASE_TS + 20, 1, "click", "1.25", "dup-a"),
        (BASE_TS + 30, 3, "buy", "9.99", "dup-b"),
    ],
    "ev-2.log": [
        (BASE_TS + 60, 2, "view", "0.50", "dup-b"),
        (BASE_TS + 70, 4, "click", "3.75", "uniq-2"),
    ],
    "ev-3.log": [
        (BASE_TS + 120, 5, "buy", "19.99", "uniq-3"),
    ],
}
WAVE2 = {
    "ev-4.log": [
        (BASE_TS + 180, 6, "view", "4.00", "dup-a"),
        (BASE_TS + 190, 6, "click", "5.00", "uniq-4"),
    ],
    "ev-5.log": [
        (BASE_TS + 240, 7, "buy", "29.99", "uniq-5"),
        (BASE_TS + 250, 7, "buy", "29.99", "not a log line"),  # still parses props
    ],
}
# a malformed line to prove the regex scan drops garbage (A2 contract)
GARBAGE = "# comment line, no leading epoch"


def _write_wave(remote, wave, with_garbage=False):
    for name, rows in wave.items():
        lines = [",".join(map(str, r)) for r in rows]
        if with_garbage:
            lines.insert(0, GARBAGE)
        (remote / name).write_text("\n".join(lines) + "\n")


def _ingest(spark, remote, wave, root, inv, seq0):
    spec = SourceSpec(
        name="eventlogs",
        kind="incremental",
        path_prefix="logs/",
        current_name="logs/current/events.log",
        url_regexp=r".*/()(ev-\d+\.log)",
        dedup_regexp=r"(.*/).*",
    )
    items = [
        (seq0 + i, f"file://{remote}/{name}")
        for i, name in enumerate(sorted(wave))
    ]
    return batch_ingest(
        spark, spec, items, LocalFSStore(root),
        lambda: LocalFSStore(root), inv,
    )


@pytest.fixture()
def pipeline_dirs(tmp_path):
    remote = tmp_path / "remote"
    remote.mkdir()
    return {
        "remote": remote,
        "root": str(tmp_path / "store"),
        "inv": InventoryTable(str(tmp_path / "state" / "inventory")),
        "out": str(tmp_path / "published"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _batch_model(spark, src_dir):
    """The batch pipeline over the same published objects: same parse,
    first-seen (min event time, then props tie-break) per content
    hash — what the ts-ordered micro-batched stream must converge to."""
    parsed = parse_event_log_lines(spark.read.text(src_dir))
    return (
        parsed.withColumn("h", F.md5("props"))
        .groupBy("h")
        .agg(F.min(F.struct("ts", "user_id", "event_type", "value", "props")).alias("m"))
        .select("h", "m.ts", "m.user_id", "m.event_type", "m.value", "m.props")
    )


def test_ingest_dedup_publish_query_end_to_end(spark, pipeline_dirs):
    d = pipeline_dirs
    src_dir = os.path.join(d["root"], "logs")

    # --- wave 1: ingest (executor-parallel, transactional publish) ---
    _write_wave(d["remote"], WAVE1, with_garbage=True)
    summary = _ingest(spark, d["remote"], WAVE1, d["root"], d["inv"], 100)
    assert summary["published"] == len(WAVE1) and summary["failed"] == 0

    # --- wave 1: checkpointed stream — parse, dedup, publish ---
    q = publish_deduped_stream(spark, src_dir, d["out"], d["ckpt"])
    # a REAL StreamingQuery ran micro-batched with a checkpointed
    # event-time watermark: one file-source offset per micro-batch
    assert q.lastProgress is not None
    offsets = os.listdir(os.path.join(d["ckpt"], "offsets"))
    assert len(offsets) >= len(WAVE1)
    assert os.path.isdir(os.path.join(d["ckpt"], "state"))

    got1 = spark.read.parquet(d["out"])
    model1 = _batch_model(spark, src_dir)
    # batch equivalence, wave 1: same survivor digests, same rows
    assert got1.count() == model1.count()
    assert {r.h for r in got1.select("h").collect()} == {
        r.h for r in model1.select("h").collect()
    }
    assert (
        got1.select("h", "ts", "props")
        .exceptAll(model1.select("h", "ts", "props"))
        .count()
        == 0
    )
    # the garbage line was dropped by the regex scan, not published
    assert got1.filter(F.col("props").contains("comment")).count() == 0

    # --- wave 2: more objects ingested, query RESTARTED from the
    # same checkpoint — processes only the new objects, against the
    # RETAINED dedup state (dup-a must NOT re-emit) ---
    _write_wave(d["remote"], WAVE2)
    summary2 = _ingest(spark, d["remote"], WAVE2, d["root"], d["inv"], 200)
    assert summary2["published"] == len(WAVE2)
    publish_deduped_stream(spark, src_dir, d["out"], d["ckpt"])

    got2 = spark.read.parquet(d["out"])
    model2 = _batch_model(spark, src_dir)
    assert got2.count() == model2.count()
    assert (
        got2.select("h", "ts", "props")
        .exceptAll(model2.select("h", "ts", "props"))
        .count()
        == 0
    )
    # cross-wave suppression: dup-a survives exactly once, from wave 1
    dup_a = got2.filter(F.col("props") == "dup-a").collect()
    assert len(dup_a) == 1 and dup_a[0].user_id == 1

    # --- idempotent re-run: no new objects => nothing appended ---
    publish_deduped_stream(spark, src_dir, d["out"], d["ckpt"])
    assert spark.read.parquet(d["out"]).count() == got2.count()

    # --- query the published table (the consumer leg): per-type
    # counts + exact floor-cents revenue must match the batch model ---
    def rollup(df):
        return (
            df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)")).alias(
                    "cents"
                ),
            )
            .orderBy("event_type")
        )

    assert [r.asDict() for r in rollup(got2).collect()] == [
        r.asDict() for r in rollup(model2).collect()
    ]
