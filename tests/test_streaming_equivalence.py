"""Streaming-vs-batch equivalence (SURVEY Phase 3 tail): the genuine
Structured Streaming forms must converge to the same final state as
the exact-checked batch plans when fed the same files.

The stream is split into multiple micro-batches (maxFilesPerTrigger=1
over several files) so the state store actually carries state across
batches — a single-batch run would not exercise incrementality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.streaming import (
    latest_pointer_stream,
    run_to_memory,
    stream_from_parquet_dir,
    streaming_dedup,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events at sf0.001 rewritten as several clean-microsecond parquet
    files (the raw driver file is TIMESTAMP(NANOS), which streaming
    schemas can't take) — 4 files so maxFilesPerTrigger=1 yields 4
    micro-batches, ordered by time so watermarks advance naturally."""
    out = tmp_path_factory.mktemp("stream") / "events"
    ev = load_table(spark, SF_DIR, "events")
    ev.orderBy("ts").coalesce(1).sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(str(out))
    # re-split into 4 time-ordered files
    whole = spark.read.parquet(str(out))
    n = whole.count()
    per = (n + 3) // 4
    ranked = whole.orderBy("ts").withColumn(
        "part", (F.monotonically_increasing_id() / per).cast("int")
    )
    out2 = tmp_path_factory.mktemp("stream") / "events4"
    for i in range(4):
        ranked.filter(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(str(out2))
    return str(out2)


def test_streaming_dedup_matches_batch_distinct(spark, events_dir):
    # delay spans the whole fixture (30 days of events) so no digest's
    # state is evicted mid-run and the stream converges to exactly the
    # batch distinct; shorter delays trade exactness for bounded state
    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(
        streaming_dedup(stream, watermark_delay="45 days"),
        "dedup_out",
        output_mode="append",
    )
    got = spark.table("dedup_out")

    batch = spark.read.parquet(events_dir).withColumn("h", F.md5("props"))
    # one survivor per distinct content hash
    assert got.count() == batch.select("h").distinct().count()
    assert got.select("h").distinct().count() == got.count()
    assert {r.h for r in got.select("h").collect()} == {
        r.h for r in batch.select("h").distinct().collect()
    }


def test_streaming_dedup_state_is_evicted_after_watermark(spark, tmp_path):
    """The bounded-state contract: with dropDuplicatesWithinWatermark a
    digest older than the delay is evicted, so a far-later identical
    payload re-emits (exactly-once-within-horizon, not global)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 10, "a", 1.0, "same-payload"),
        (2, base + dt.timedelta(minutes=2), 11, "a", 1.0, "other"),
        # 10 days later: closing this batch advances the watermark far past
        # the first digest's (event time + 1h) expiry...
        (3, base + dt.timedelta(days=10), 12, "a", 1.0, "advancer"),
        # ...and the NEXT batch's cleanup phase evicts it (eviction uses the
        # watermark computed from prior batches, so one extra batch is needed)
        (4, base + dt.timedelta(days=10, minutes=1), 13, "a", 1.0, "advancer2"),
        # duplicate payload arrives after eviction => re-emits
        (5, base + dt.timedelta(days=10, minutes=2), 14, "a", 1.0, "same-payload"),
    ]
    src = str(tmp_path / "ev")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, r in enumerate(rows):  # one file per row => one micro-batch each
        spark.createDataFrame([r], cols).coalesce(1).write.mode("append").parquet(src)
    stream = stream_from_parquet_dir(spark, src, max_files_per_trigger=1)
    run_to_memory(
        streaming_dedup(stream, watermark_delay="1 hour"),
        "dedup_evict_out",
        output_mode="append",
    )
    got = spark.table("dedup_evict_out")
    # the duplicate payload survives twice: once per watermark horizon
    assert got.filter(F.col("props") == "same-payload").count() == 2
    assert got.count() == 5


def test_streaming_tumbling_matches_batch_windows(spark, events_dir):
    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(
        tumbling_counts(stream), "tumbling_out", output_mode="complete"
    )
    got = spark.table("tumbling_out")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
        )
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_latest_pointer_stream_matches_batch_latest(spark, events_dir):
    # durable "current" state folded across micro-batches
    state: dict[int, tuple] = {}

    def upsert(latest_df, batch_id):
        for r in latest_df.collect():
            key = (r.ts, r.event_id)
            if r.user_id not in state or key > (state[r.user_id][0], state[r.user_id][1]):
                state[r.user_id] = (r.ts, r.event_id, r.event_type, r.value)

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    latest_pointer_stream(stream, upsert)

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m"))
        .select("user_id", "m.ts", "m.event_id", "m.event_type", "m.value")
    )
    expect = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value) for r in batch.collect()
    }
    assert state == expect


def test_stateful_running_totals_matches_batch(spark, events_dir):
    from downloader_spark.streaming.stateful import running_totals

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the LAST update per user is the final running total
    import pandas as pd  # noqa: F401

    updates = spark.table("running_out").toPandas()
    final = updates.groupby("user_id").last()

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .toPandas()
        .set_index("user_id")
    )
    assert sorted(final.index) == sorted(batch.index)
    for uid in batch.index:
        assert final.loc[uid, "n"] == batch.loc[uid, "n"]
        assert abs(final.loc[uid, "total"] - batch.loc[uid, "total"]) < 1e-6


def test_streaming_session_matches_batch_sessions(spark, events_dir):
    from downloader_spark.streaming import session_counts

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(session_counts(stream), "session_out", output_mode="complete")
    got = spark.table("session_out")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n",
        )
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_streaming_dedup_checkpoint_restart_recovery(spark, events_dir, tmp_path):
    """Durability: a checkpointed dedup stream stopped and restarted
    over a grown input directory must process only the new files and
    keep its dedup state — no survivor is ever emitted twice across
    runs (the fix for the reference's volatile watermark, SURVEY
    §4.3.3, demonstrated end-to-end)."""
    import shutil
    import os

    # order files by their EVENT TIME, not by (random-uuid) name: run 1
    # must see the earlier half, else run 2's files are > 1h behind the
    # checkpointed watermark and dropDuplicates drops them as late —
    # which is correct streaming semantics, but not this test's topic
    candidates = [f for f in os.listdir(events_dir) if f.endswith(".parquet")]
    src_files = sorted(
        candidates,
        key=lambda f: spark.read.parquet(os.path.join(events_dir, f))
        .agg(F.min("ts"))
        .collect()[0][0],
    )
    assert len(src_files) >= 2
    input_dir = str(tmp_path / "input")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    def run_once():
        stream = stream_from_parquet_dir(spark, input_dir, max_files_per_trigger=1)
        q = (
            streaming_dedup(stream, watermark_delay="45 days")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: first half of the files
    half = len(src_files) // 2
    for f in src_files[:half]:
        shutil.copy(os.path.join(events_dir, f), input_dir)
    run_once()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # run 2 (restart over the same checkpoint): add the rest
    for f in src_files[half:]:
        shutil.copy(os.path.join(events_dir, f), input_dir)
    run_once()

    got = spark.read.parquet(out_dir)
    batch = spark.read.parquet(input_dir).withColumn("h", F.md5("props"))
    # exactly one survivor per distinct content hash ACROSS both runs
    assert got.count() == batch.select("h").distinct().count()
    assert got.select("h").distinct().count() == got.count()


def test_progress_listener_captures_batch_metrics(spark, events_dir):
    from downloader_spark.streaming.metrics import ProgressCapture

    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
        q = (
            tumbling_counts(stream)
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        import time

        total_rows = spark.read.parquet(events_dir).count()
        for _ in range(40):
            if cap.rows_in.get("metrics_probe", 0) >= total_rows:
                break
            time.sleep(0.25)
        assert cap.rows_in["metrics_probe"] == total_rows
        assert cap.batches["metrics_probe"] >= 4  # one per input file
        assert cap.last_progress_ts is not None
        m = {(r.metric, r.label): r.value for r in cap.metrics_df(spark).collect()}
        assert m[("streaming_rows_in_total", "metrics_probe")] == float(total_rows)
    finally:
        spark.streams.removeListener(cap)


def test_streaming_sliding_matches_batch_windows(spark, events_dir):
    from downloader_spark.streaming import sliding_counts

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(sliding_counts(stream), "sliding_out", output_mode="complete")
    got = spark.table("sliding_out")
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n",
        )
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0


def test_watermark_drops_late_data_in_genuine_stream(spark, tmp_path):
    """THE watermark semantics proof, across checkpointed runs: after
    run 1 checkpoints a watermark, a late event arriving in run 2 is
    DROPPED (numRowsDroppedByWatermark=1) and its window never reaches
    the append-mode output, while the on-time event aggregates in.
    (Within a single run this Spark build filters with the previous
    batch's watermark, so the drop is only observable across a
    restart — which is also the durable-watermark semantics the
    reference needs, SURVEY §4.3.3.)"""
    import datetime as dt

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    sec = dt.timedelta(seconds=1)
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def run():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        agg = (
            stream.withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "1 minute").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("win_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    # run 1: 30 on-time events -> watermark checkpoints at 12:00:19
    rows1 = [(i, base + i * sec, 1, "a", 1.0, "{}") for i in range(30)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(in_dir)
    run()

    # run 2: one on-time + one LATE event (11:50 << watermark)
    rows2 = [
        (100, base + 40 * sec, 1, "a", 1.0, "{}"),
        (101, base - dt.timedelta(minutes=10), 1, "a", 1.0, "{}"),
    ]
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = run()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1

    # run 3: push the watermark far past every open window to flush them
    rows3 = [(200, base + dt.timedelta(minutes=10), 1, "a", 1.0, "{}")]
    spark.createDataFrame(rows3, schema).coalesce(1).write.mode("append").parquet(in_dir)
    run()

    got = {r.win_start: r.n for r in spark.read.parquet(out).collect()}
    late_window = base - dt.timedelta(minutes=10)
    assert late_window not in got  # the dropped event never surfaced
    assert got[base] == 31  # 30 on-time + the run-2 on-time event


def test_stream_stream_join_matches_batch_interval_join(spark, events_dir):
    """Genuine stream-stream inner join (views x purchases within 1h,
    per user) across 4 micro-batches must converge to the batch
    interval join over the same files — watermark + time-range
    constraint bound the state without dropping any in-window pair
    (the fixture-wide delay keeps eviction behind the data)."""
    from downloader_spark.streaming import stream_stream_join

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    views_s = stream.filter(F.col("event_type") == "view")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    run_to_memory(
        stream_stream_join(views_s, purch_s),
        "ssj_out",
        output_mode="append",
    )
    got = {
        (r.v_user, r.view_id, r.purchase_id)
        for r in spark.table("ssj_out").collect()
    }

    batch = spark.read.parquet(events_dir)
    v = batch.filter(F.col("event_type") == "view").selectExpr(
        "user_id AS v_user", "ts AS v_ts", "event_id AS view_id"
    )
    p = batch.filter(F.col("event_type") == "purchase").selectExpr(
        "user_id AS p_user", "ts AS p_ts", "event_id AS purchase_id"
    )
    want = {
        (r.v_user, r.view_id, r.purchase_id)
        for r in v.join(
            p,
            F.expr(
                "v_user = p_user AND p_ts > v_ts"
                " AND p_ts <= v_ts + INTERVAL 1 HOUR"
            ),
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture must actually exercise the join


def test_checkpoint_restart_new_session_resumes_watermark(spark, tmp_path):
    """Kill-and-restart proof for the checkpointed-watermark fix
    (reference keeps its watermark in process memory and re-downloads
    everything on restart, downloader.go:61-62 / SURVEY §4.3(3)):
    run 2 uses a NEW SparkSession over the same checkpoint and must
    (a) not re-publish a digest already published in run 1,
    (b) drop a novel-but-late row older than the checkpointed
        watermark — proving the watermark RESUMED rather than reset
        to epoch (a reset would publish it), and
    (c) publish a fresh on-time row."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    input_dir = str(tmp_path / "input")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_file(sess, rows):
        sess.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("append").parquet(input_dir)

    def run_once(sess):
        stream = stream_from_parquet_dir(sess, input_dir)
        q = (
            streaming_dedup(stream, watermark_delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: A (10:00) + B (10:30) -> watermark commits at 09:30
    write_file(
        spark,
        [
            (1, base, 1, "view", 1.0, "dupA"),
            (2, base + dt.timedelta(minutes=30), 1, "view", 1.0, "B"),
        ],
    )
    run_once(spark)
    assert spark.read.parquet(out_dir).count() == 2

    # run 2: NEW SparkSession, same checkpoint.  One file with a
    # duplicate digest (10:05), a late novel row (08:00 < the 09:30
    # checkpointed watermark), and a fresh on-time row (10:45).
    restarted = spark.newSession()
    write_file(
        restarted,
        [
            (3, base + dt.timedelta(minutes=5), 2, "view", 1.0, "dupA"),
            (4, base - dt.timedelta(hours=2), 3, "view", 1.0, "late-novel"),
            (5, base + dt.timedelta(minutes=45), 4, "view", 1.0, "C"),
        ],
    )
    run_once(restarted)

    got = sorted(r.props for r in restarted.read.parquet(out_dir).collect())
    assert got == ["B", "C", "dupA"]  # dupA once, late-novel dropped


def test_stream_dedup_key_matches_genuine_streaming_dropduplicates(
    spark, events_dir
):
    """The registry key ``stream_dedup`` (batch struct-min first
    occurrence per (user, type)) pins WHICH row the genuine
    Structured Streaming dropDuplicatesWithinWatermark path keeps:
    with arrival order = event-time order (the ts-ordered fixture)
    and a horizon-spanning delay, the streaming survivors are exactly
    the (ts, event_id)-minimal rows the batch key reports."""
    from downloader_spark.plans.registry import registry

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    dd = (
        stream.withWatermark("ts", "45 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    run_to_memory(dd, "stream_dedup_key_out", output_mode="append")
    got = spark.table("stream_dedup_key_out").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )

    import downloader_spark.operators.round7_ext as r7

    batch_src = spark.read.parquet(events_dir)
    orig = r7.load_table
    r7.load_table = lambda s, d, n: batch_src
    try:
        expect = registry()["stream_dedup"].fn(spark, "ignored")
    finally:
        r7.load_table = orig

    g = {
        (r.user_id, r.event_type): (r.us, r.event_id) for r in got.collect()
    }
    e = {
        (r.user_id, r.event_type): (r.first_us, r.first_event_id)
        for r in expect.collect()
    }
    assert set(g) == set(e)          # same survivor key set
    # same surviving TIMESTAMP per key (event_id may differ only on
    # exact ts ties; the fixture's timestamps are distinct)
    assert {k: v[0] for k, v in g.items()} == {k: v[0] for k, v in e.items()}


def test_streaming_ewma_matches_python_recursion(spark, events_dir):
    """Drain the ts-ordered micro-batched backlog through the
    applyInPandasWithState EWMA; the LAST emitted row per user must
    equal a pure-Python per-key recursion over the ts-sorted batch
    rows (alpha=1/2 integer form, seeded by the first value)."""
    from downloader_spark.streaming import streaming_ewma

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(streaming_ewma(stream), "ewma_out", output_mode="update")
    got_df = spark.table("ewma_out")
    # update mode re-emits per batch: keep the final (max-n) row per key
    latest = {}
    for r in got_df.collect():
        if r.user_id not in latest or r.n > latest[r.user_id][0]:
            latest[r.user_id] = (r.n, r.ewma_cents)

    rows = (
        spark.read.parquet(events_dir)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    model: dict[int, tuple[int, int]] = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        cents = int(r.value * 100 // 1)
        n, e = model.get(r.user_id, (0, 0))
        e = cents if n == 0 else (e + cents) // 2
        model[r.user_id] = (n + 1, e)
    assert latest == model


def test_ewma_update_sorts_across_arrow_chunks():
    """applyInPandasWithState may deliver ONE group's batch as
    MULTIPLE Arrow chunks (arrow.maxRecordsPerBatch splits large
    groups) with rows in arbitrary post-shuffle order.  The fold must
    concatenate the chunks and sort ONCE — sorting each chunk
    independently would fold cross-chunk rows out of event-time order
    and make the recursive result nondeterministic.  Feed the update
    fn two chunks whose GLOBAL (ts, event_id) order interleaves them
    and check the result equals the single-sorted-batch recursion."""
    import datetime as dt

    import pandas as pd

    from downloader_spark.streaming.stateful import _ewma_update

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    base = dt.datetime(2024, 1, 1)
    # rows 0..5 in global ts order carry values 1,2,3,4,5,6 — chunk A
    # holds rows {0,2,4}, chunk B rows {1,3,5}, each internally sorted
    rows = [
        (base + dt.timedelta(minutes=i), i, float(v))
        for i, v in enumerate([1, 2, 3, 4, 5, 6])
    ]
    mk = lambda idx: pd.DataFrame(
        [rows[i] for i in idx], columns=["ts", "event_id", "value"]
    )
    st = FakeState()
    out = list(_ewma_update((7,), iter([mk([0, 2, 4]), mk([1, 3, 5])]), st))

    e = 0
    for i, v in enumerate([100, 200, 300, 400, 500, 600]):
        e = v if i == 0 else (e + v) // 2
    assert st.value == (6, e)
    assert out[0]["ewma_cents"].iloc[0] == e

    # empty iterator: state untouched semantics — n stays 0
    st2 = FakeState()
    list(_ewma_update((8,), iter([]), st2))
    assert st2.value == (0, 0)


def test_stream_ewma_batch_twin_matches_streaming_drain(spark, events_dir):
    """The ``stream_ewma`` registry key (batch twin,
    operators/round9_ext.py) must equal the final state of draining
    the same rows through the stateful streaming EWMA — the shared
    ``fold_ewma`` arithmetic promise in streaming/stateful.py, checked
    directly end-to-end rather than only via the Python model."""
    import downloader_spark.operators.round9_ext as r9
    from downloader_spark.streaming import streaming_ewma

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(streaming_ewma(stream), "ewma_twin_out", output_mode="update")
    latest: dict[int, tuple[int, int]] = {}
    for r in spark.table("ewma_twin_out").collect():
        if r.user_id not in latest or r.n > latest[r.user_id][0]:
            latest[r.user_id] = (r.n, r.ewma_cents)

    df = spark.read.parquet(events_dir)
    orig = r9.load_table
    r9.load_table = lambda s, d, n: df
    try:
        batch = {
            r.user_id: (r.n, r.ewma_cents)
            for r in r9.stream_ewma(spark, "ignored").collect()
        }
    finally:
        r9.load_table = orig
    assert batch == latest


def test_streaming_holt_matches_batch_twin(spark, events_dir):
    """Drain the ts-ordered micro-batched backlog (4 files -> 4
    micro-batches) through the applyInPandasWithState Holt smoother;
    the final state per user must equal the ``ts_holt_linear`` batch
    twin (operators/round9b_ext.py) — the shared fold_holt arithmetic
    promise, checked end-to-end across state-store boundaries."""
    import downloader_spark.operators.round9b_ext as r9b
    from downloader_spark.streaming import streaming_holt

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(streaming_holt(stream), "holt_out", output_mode="update")
    latest: dict[int, tuple] = {}
    for r in spark.table("holt_out").collect():
        if r.user_id not in latest or r.n > latest[r.user_id][0]:
            latest[r.user_id] = (
                r.n, r.level_cents, r.trend_cents, r.forecast_cents
            )

    df = spark.read.parquet(events_dir)
    orig = r9b.load_table
    r9b.load_table = lambda s, d, n: df
    try:
        batch = {
            r.user_id: (r.n, r.level_cents, r.trend_cents, r.forecast_cents)
            for r in r9b.ts_holt_linear(spark, "ignored").collect()
        }
    finally:
        r9b.load_table = orig
    assert batch == latest


def test_holt_update_sorts_across_arrow_chunks_and_truncates():
    """Chunk discipline + division semantics for the Holt update fn:
    (a) two interleaved Arrow chunks must fold in GLOBAL (ts,
    event_id) order; (b) the trend state goes negative on a falling
    series, where truncate-toward-zero (Spark DIV / DuckDB //)
    differs from Python floor — fold_holt must truncate."""
    import datetime as dt

    import pandas as pd

    from downloader_spark.streaming.stateful import (
        _holt_update,
        _tdiv2,
        fold_holt,
    )

    # division semantics: -7 div 2 == -3 (truncate), not -4 (floor)
    assert _tdiv2(-7) == -3 and _tdiv2(7) == 3 and (-7) // 2 == -4

    # falling series drives the trend negative through the fold
    k, l, b = fold_holt([1000, 400, 100, 50])
    model_k, model_l, model_b = 0, 0, 0
    for c in [1000, 400, 100, 50]:
        if model_k == 0:
            model_l, model_b = c, 0
        else:
            l2 = _tdiv2(c + model_l + model_b)
            model_b = _tdiv2(l2 - model_l + model_b)
            model_l = l2
        model_k += 1
    assert (k, l, b) == (model_k, model_l, model_b) and b < 0

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    base = dt.datetime(2024, 1, 1)
    vals = [9.0, 1.5, 7.0, 0.25, 3.0, 0.5]
    rows = [
        (base + dt.timedelta(minutes=i), i, v) for i, v in enumerate(vals)
    ]
    mk = lambda idx: pd.DataFrame(
        [rows[i] for i in idx], columns=["ts", "event_id", "value"]
    )
    st = FakeState()
    out = list(_holt_update((7,), iter([mk([0, 2, 4]), mk([1, 3, 5])]), st))
    want = fold_holt([int(v * 100) for v in vals])
    assert st.value == want
    assert out[0]["forecast_cents"].iloc[0] == want[1] + want[2]

    st2 = FakeState()
    list(_holt_update((8,), iter([]), st2))
    assert st2.value == (0, 0, 0)


def test_streaming_user_topk_matches_batch(spark, events_dir):
    """Drain 4 micro-batches through the bounded top-k state; the
    final state per user must equal the batch top-3 multiset of
    floor-cent values (arrival order must NOT matter — the fold is
    commutative, unlike EWMA/Holt)."""
    from downloader_spark.streaming import streaming_user_topk
    from downloader_spark.streaming.stateful import TOPK_K, fold_topk

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(streaming_user_topk(stream), "topk_out", output_mode="update")
    latest: dict[int, tuple] = {}
    for r in spark.table("topk_out").collect():
        if r.user_id not in latest or r.n_seen > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_seen, list(r.top_cents))

    batch = (
        spark.read.parquet(events_dir)
        .selectExpr("user_id", "CAST(floor(value * 100) AS BIGINT) AS c")
        .collect()
    )
    model: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for r in batch:
        model.setdefault(r.user_id, []).append(r.c)
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    want = {
        uid: (counts[uid], sorted(cs, reverse=True)[:TOPK_K])
        for uid, cs in model.items()
    }
    assert latest == want

    # pure-model sanity: eviction keeps duplicates-by-value
    assert fold_topk([5, 5, 9, 1]) == (4, [9, 5, 5])
    assert fold_topk([1], 3, [9, 5, 5]) == (4, [9, 5, 5])


def test_streaming_holt_checkpoint_restart_resumes_state(spark, tmp_path):
    """Durability for the NEW stateful ops: a checkpointed Holt
    stream stopped and restarted over a grown input directory must
    resume its per-key (k, l, b) state — the final forecast equals
    the single-pass fold over ALL rows, not a reseeded fold over the
    second half (which would differ: the fold is order-sensitive and
    seeded by the first observation)."""
    import os

    from downloader_spark.streaming import streaming_holt
    from downloader_spark.streaming.stateful import fold_holt

    base = dt_module = __import__("datetime")
    base = dt_module.datetime(2024, 3, 1)
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)
    cols = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    vals1 = [9.0, 1.5, 7.0]
    vals2 = [0.25, 3.0, 0.5]

    def write_rows(vals, offset):
        rows = [
            (offset + i, base + dt_module.timedelta(minutes=offset + i), 1,
             "a", v, "{}")
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(input_dir)

    seen: list[tuple] = []

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            seen.append((r.user_id, r.n, r.level_cents, r.trend_cents,
                         r.forecast_cents))

    def run_once():
        stream = stream_from_parquet_dir(spark, input_dir)
        q = (
            streaming_holt(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_rows(vals1, 0)
    run_once()
    write_rows(vals2, 100)
    run_once()  # restart over the SAME checkpoint: only new file reads

    final = None
    for uid, n, l, b, f in seen:
        if uid == 1 and (final is None or n > final[0]):
            final = (n, l, b, f)

    k, l, b = fold_holt([int(v * 100) for v in vals1 + vals2])
    assert final == (k, l, b, l + b), (
        "restart must RESUME the fold, not reseed it"
    )
    # and a reseeded second-half fold is genuinely different
    k2, l2, b2 = fold_holt([int(v * 100) for v in vals2])
    assert (k2, l2, b2) != (k, l, b)


# ------------------------------------------------------------------
# Incremental dedup as genuine Structured Streaming (foreachBatch
# with persisted corpus state) — streaming/incremental_dedup.py.
# ------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_delta_dir(spark, tmp_path_factory):
    """The dedup_minhash_incremental 'new batch' (doc_id % 10 == 0)
    split into 3 parquet files so maxFilesPerTrigger=1 yields 3
    micro-batches."""
    out = tmp_path_factory.mktemp("incdedup") / "delta"
    docs = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(out))
    return str(out)


def test_incremental_minhash_stream_matches_batch_twin(
    spark, docs_delta_dir, tmp_path
):
    """Frozen-corpus drain: corpus state seeded from the %10 != 0
    docs, the %10 == 0 delta streamed in 3 micro-batches — the union
    of per-batch matches must be EXACTLY the batch twin's output
    (dedup_minhash_incremental computes the same thing in one shot)."""
    from downloader_spark.plans.registry import registry
    from downloader_spark.streaming.incremental_dedup import (
        IncrementalMinhashDedup,
    )

    pipe = IncrementalMinhashDedup(
        spark, str(tmp_path / "state"), append_corpus=False
    )
    corpus = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    pipe.seed_corpus(corpus)
    q = pipe.run(docs_delta_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(300)

    got = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in pipe.matches().collect()
    }
    expect = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in registry()["dedup_minhash_incremental"].fn(spark, SF_DIR).collect()
    }
    assert got == expect and len(got) > 0


def test_incremental_bloom_stream_matches_batch_twin(
    spark, docs_delta_dir, tmp_path
):
    """Frozen-corpus Bloom drain == dedup_bloom_prefilter's one-shot
    verdicts (bit set, exact membership, and false-positive audit all
    carried through per-batch parquet state)."""
    from downloader_spark.plans.registry import registry
    from downloader_spark.streaming.incremental_dedup import (
        IncrementalBloomPrefilter,
    )

    pipe = IncrementalBloomPrefilter(
        spark, str(tmp_path / "state"), append_corpus=False
    )
    corpus = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    pipe.seed_corpus(corpus)
    q = pipe.run(docs_delta_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(300)

    got = {
        (r.doc_id, r.bloom_hit, r.in_corpus, r.is_false_positive)
        for r in pipe.results().collect()
    }
    expect = {
        (r.doc_id, r.bloom_hit, r.in_corpus, r.is_false_positive)
        for r in registry()["dedup_bloom_prefilter"].fn(spark, SF_DIR).collect()
    }
    assert got == expect and len(got) > 0


def test_incremental_minhash_growing_corpus_and_restart(spark, tmp_path):
    """Daily-crawl mode (append_corpus=True), plus checkpoint-restart:

    1. drain 2 document files -> batches 0,1 fold into corpus state;
    2. a 3rd file arrives; re-run with the SAME checkpoint -> only
       batch 2 is processed (offsets resumed, no reprocessing);
    3. the accumulated matches must equal the batch reconstruction
       that joins each delta's bands against strictly-earlier deltas
       only (b.batch < a.batch), verified through the shared exact-
       Jaccard path — i.e. the stream discovered exactly the pairs a
       one-shot run over the arrival order would;
    4. a final drain with no new files adds nothing (idempotence).
    """
    from downloader_spark.operators.llm_dedup import _verified_pairs
    from downloader_spark.streaming.incremental_dedup import (
        IncrementalMinhashDedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = tmp_path / "docs"
    for i in range(2):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    pipe = IncrementalMinhashDedup(
        spark, str(tmp_path / "state"), append_corpus=True
    )
    ck = str(tmp_path / "ckpt")
    pipe.run(str(src), ck, max_files_per_trigger=1).awaitTermination(300)
    import os

    done = sorted(os.listdir(str(tmp_path / "state" / "bands")))
    assert done == ["batch_id=0", "batch_id=1"]

    # late file arrives; restart from the same checkpoint
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    pipe.run(str(src), ck, max_files_per_trigger=1).awaitTermination(300)
    done = sorted(os.listdir(str(tmp_path / "state" / "bands")))
    assert done == ["batch_id=0", "batch_id=1", "batch_id=2"]

    # reconstruction: bands/shingles state carries which batch each
    # doc arrived in; matches must be exactly the earlier-batch joins
    bands = spark.read.option("basePath", str(tmp_path / "state" / "bands")).parquet(
        str(tmp_path / "state" / "bands")
    )
    ss = (
        spark.read.option("basePath", str(tmp_path / "state" / "shingles"))
        .parquet(str(tmp_path / "state" / "shingles"))
        .select("doc_id", "h")
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("b.batch_id") < F.col("a.batch_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    expect = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in _verified_pairs(ss, cand, keep_ratio=2).collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in pipe.matches().collect()
    }
    assert got == expect and len(got) > 0

    # no new files -> nothing reprocessed, nothing duplicated
    pipe.run(str(src), ck, max_files_per_trigger=1).awaitTermination(300)
    assert sorted(os.listdir(str(tmp_path / "state" / "bands"))) == done
    assert {
        (r.doc_a, r.doc_b) for r in pipe.matches().collect()
    } == {(a, b) for a, b, *_ in got}


def test_incremental_hll_registers_fold_to_batch_sketch(spark, events_dir, tmp_path):
    """Mergeability of the HLL register artifact, proven end-to-end:
    each micro-batch publishes its own register table; the union of
    per-batch tables re-folded must equal the one-shot batch sketch
    over ALL events (merge = max per register) — the 100 TB rollup
    posture of agg_hll_distinct's docstring, executed."""
    import downloader_spark.operators.round11_ext as r11
    from downloader_spark.streaming.incremental_dedup import IncrementalHll

    pipe = IncrementalHll(spark, str(tmp_path / "state"))
    q = pipe.run(events_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(300)
    import os

    batches = sorted(os.listdir(str(tmp_path / "state" / "registers")))
    assert len(batches) >= 3  # genuinely incremental

    got = {
        r.event_type: (r.sum_scaled, r.n_zero, r.hll_raw_est)
        for r in pipe.fold().collect()
    }

    all_events = spark.read.parquet(events_dir)
    orig = r11.load_table
    r11.load_table = lambda s, d, n: all_events
    try:
        expect = {
            r.event_type: (r.sum_scaled, r.n_zero, r.hll_raw_est)
            for r in r11.agg_hll_distinct(spark, "ignored").collect()
        }
    finally:
        r11.load_table = orig
    assert got == expect and len(got) > 0


def test_incremental_minhash_replay_sees_pre_batch_corpus(spark, tmp_path):
    """Crash-window replay exactness: if a crash lands AFTER batch N
    appended its own bands/shingles state but BEFORE the streaming
    checkpoint committed, the replayed batch N must read exactly the
    pre-batch-N corpus — no self-pairs (doc_a == doc_b at jaccard
    1.0), no delta x delta candidates, no doubled postings.  Simulated
    by invoking process_batch(delta, 0) twice: the second call IS the
    replay (state already contains batch 0's own append)."""
    from downloader_spark.streaming.incremental_dedup import (
        IncrementalMinhashDedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    pipe = IncrementalMinhashDedup(
        spark, str(tmp_path / "state"), append_corpus=True
    )
    pipe.seed_corpus(docs.filter(F.col("doc_id") % 10 != 0))
    delta = docs.filter(F.col("doc_id") % 10 == 0)

    pipe.process_batch(delta, 0)
    first = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in pipe.matches().collect()
    }
    assert len(first) > 0
    assert all(a != b for a, b, *_ in first)

    pipe.process_batch(delta, 0)  # the replay
    replayed = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in pipe.matches().collect()
    }
    assert replayed == first, "replay must converge, not self-match"


def test_incremental_bloom_replay_sees_pre_batch_corpus(spark, tmp_path):
    """Same crash window for the Bloom prefilter: a replayed batch
    must not probe its own earlier bit/hash append (which would mark
    the entire delta as bloom_hit/in_corpus)."""
    from downloader_spark.streaming.incremental_dedup import (
        IncrementalBloomPrefilter,
    )

    docs = load_table(spark, SF_DIR, "documents")
    pipe = IncrementalBloomPrefilter(
        spark, str(tmp_path / "state"), append_corpus=True
    )
    pipe.seed_corpus(docs.filter(F.col("doc_id") % 10 != 0))
    delta = docs.filter(F.col("doc_id") % 10 == 0)

    pipe.process_batch(delta, 0)
    first = {
        (r.doc_id, r.bloom_hit, r.in_corpus, r.is_false_positive)
        for r in pipe.results().collect()
    }
    assert len(first) > 0
    assert not all(in_corpus for _, _, in_corpus, _ in first)

    pipe.process_batch(delta, 0)  # the replay
    replayed = {
        (r.doc_id, r.bloom_hit, r.in_corpus, r.is_false_positive)
        for r in pipe.results().collect()
    }
    assert replayed == first, "replay must not see its own append"


def test_incremental_minhash_recrawled_doc_postings_not_doubled(spark, tmp_path):
    """A doc_id present in BOTH the corpus and the delta (a re-crawl)
    must not double its postings through the verification union: the
    exact-Jaccard of the re-crawled doc against its corpus copy is
    1.0 with inter == union == the true distinct-shingle count."""
    from downloader_spark.operators.llm_dedup import hashed_shingle_sets
    from downloader_spark.streaming.incremental_dedup import (
        IncrementalMinhashDedup,
    )

    docs = load_table(spark, SF_DIR, "documents")
    recrawled = docs.filter(F.col("doc_id") % 50 == 0)
    pipe = IncrementalMinhashDedup(
        spark, str(tmp_path / "state"), append_corpus=False
    )
    pipe.seed_corpus(docs)  # corpus already contains the re-crawls
    pipe.process_batch(recrawled, 0)

    true_sizes = {
        r.doc_id: r.n
        for r in hashed_shingle_sets(recrawled.select("doc_id", "text"))
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n"))
        .collect()
    }
    self_rows = {
        r.doc_a: (r.inter_size, r.union_size, r.jacc_ppm)
        for r in pipe.matches().filter(F.col("doc_a") == F.col("doc_b")).collect()
    }
    assert set(self_rows) == set(true_sizes) and len(self_rows) > 0
    for doc_id, (inter, union, ppm) in self_rows.items():
        assert inter == union == true_sizes[doc_id]
        assert ppm == 1_000_000


def test_stateful_hll_matches_batch_sketch(spark, events_dir, tmp_path):
    """applyInPandasWithState HLL: drain the micro-batched backlog
    with the 64-register sketch held as PER-KEY STATE; the final
    emitted row per event_type must be bit-identical to the batch
    key's fold over all events (same md5-derived hash mapping, so
    the registers agree exactly — not just the estimate).  Registers
    only rise, so sum_scaled is monotone non-increasing and the final
    row per key is its minimum."""
    import downloader_spark.operators.round11_ext as r11
    from downloader_spark.operators.round11_ext import (
        hll_fold,
        hll_registers,
    )
    from downloader_spark.streaming.stateful import streaming_hll

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(streaming_hll(stream), "hll_out", output_mode="update")
    final = {}
    for r in spark.table("hll_out").collect():
        cur = final.get(r.event_type)
        if cur is None or r.sum_scaled < cur[0]:
            final[r.event_type] = (r.sum_scaled, r.n_zero, r.hll_raw_est)

    all_events = spark.read.parquet(events_dir)
    expect = {
        r.event_type: (r.sum_scaled, r.n_zero, r.hll_raw_est)
        for r in hll_fold(
            hll_registers(all_events.select("event_type", "user_id"))
        ).collect()
    }
    assert final == expect and len(final) > 0


def test_incremental_state_discovery_via_hadoop_fs_uri(
    spark, docs_delta_dir, tmp_path
):
    """Round-13: state discovery must go through the Hadoop
    FileSystem API, so a NON-local-style ``file://`` URI (the same
    scheme-bearing shape an ``hdfs://`` or ``s3a://`` state dir has on
    a cluster) works end-to-end — seed, probe, drain, read back —
    and the probe itself answers correctly at each lifecycle stage."""
    from downloader_spark.streaming.incremental_dedup import (
        IncrementalMinhashDedup,
        _state_has_batches,
    )

    state_uri = "file://" + str(tmp_path / "state")
    pipe = IncrementalMinhashDedup(spark, state_uri, append_corpus=False)
    assert not _state_has_batches(spark, pipe.bands_dir)  # nothing yet
    corpus = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    pipe.seed_corpus(corpus)
    assert _state_has_batches(spark, pipe.bands_dir)  # batch_id=-1 seeded
    assert not _state_has_batches(spark, pipe.matches_dir)
    q = pipe.run(
        docs_delta_dir,
        "file://" + str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    got = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in pipe.matches().collect()
    }
    from downloader_spark.plans.registry import registry

    expect = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size, r.jacc_ppm)
        for r in registry()["dedup_minhash_incremental"].fn(spark, SF_DIR).collect()
    }
    assert got == expect and len(got) > 0


def test_stateful_kmv_matches_batch_sketch(spark, events_dir, tmp_path):
    """applyInPandasWithState KMV: drain the micro-batched backlog
    with the k-smallest-hash set held as PER-KEY STATE; the final
    emitted row per event_type must agree bit-for-bit with
    agg_kmv_distinct's one-shot sketch over all events (same 'kmv:'
    md5 hash, same (k-1)*2^59 DIV h_k * 2 estimator).  n_in_sketch
    only rises and h_k only falls, so the final row per key is the
    (max n, min h_k) one."""
    import downloader_spark.operators.round7_ext as r7
    from downloader_spark.streaming.stateful import streaming_kmv

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(streaming_kmv(stream), "kmv_out", output_mode="update")
    final = {}
    for r in spark.table("kmv_out").collect():
        cur = final.get(r.event_type)
        if cur is None or (r.n_in_sketch, -r.h_k) > (cur[0], -cur[1]):
            final[r.event_type] = (r.n_in_sketch, r.h_k, r.kmv_estimate)

    all_events = spark.read.parquet(events_dir)
    orig = r7.load_table
    r7.load_table = lambda s, d, n: all_events
    try:
        expect = {
            r.event_type: (r.n_in_sketch, r.kmv_estimate)
            for r in r7.agg_kmv_distinct(spark, "ignored").collect()
        }
    finally:
        r7.load_table = orig
    assert {k: (v[0], v[2]) for k, v in final.items()} == expect
    assert len(final) > 0


def test_stateful_kmv_both_branches_vs_python_model(spark, tmp_path):
    """Both estimator branches against an independent Python model:
    t0 has 5 distinct users (< k: the sketch IS the distinct set,
    estimate exact) and t1 has 40 (> k: the (k-1)*2^59 DIV h_k * 2
    estimator fires over the 16 smallest md5 hashes)."""
    import hashlib

    from downloader_spark.streaming.stateful import streaming_kmv

    rows = [("t0", i % 5) for i in range(20)] + [
        ("t1", 1000 + i % 40) for i in range(80)
    ]
    small = spark.createDataFrame(rows, "event_type string, user_id long")
    d = str(tmp_path / "small_events")
    small.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    run_to_memory(streaming_kmv(stream), "kmv_small", output_mode="update")
    final = {}
    for r in spark.table("kmv_small").collect():
        cur = final.get(r.event_type)
        if cur is None or (r.n_in_sketch, -r.h_k) > (cur[0], -cur[1]):
            final[r.event_type] = (r.n_in_sketch, r.h_k, r.kmv_estimate)

    def h(uid):
        return int(hashlib.md5(f"kmv:{uid}".encode()).hexdigest()[:15], 16)

    t0_hashes = sorted(h(u) for u in range(5))
    t1_hashes = sorted(h(1000 + u) for u in range(40))[:16]
    t1_est = 15 * (1 << 59) // t1_hashes[-1] * 2
    assert final == {
        "t0": (5, t0_hashes[-1], 5),
        "t1": (16, t1_hashes[-1], t1_est),
    }
    assert 20 <= t1_est  # sanity: estimator lands in a plausible band


def test_stateful_exp_histogram_matches_batch(spark, events_dir):
    """applyInPandasWithState exponential histogram: drain the
    micro-batched backlog with (bucket, count) arrays held as PER-KEY
    STATE; the final emitted row per event_type must agree
    bit-for-bit with agg_exp_histogram's one-shot answer over all
    events (same integer bucket mapping, same ceil((n*p)/100)
    percentile targets)."""
    import downloader_spark.operators.round13b_ext as r13b
    from downloader_spark.streaming.stateful import streaming_exp_histogram

    stream = stream_from_parquet_dir(spark, events_dir, max_files_per_trigger=1)
    run_to_memory(streaming_exp_histogram(stream), "exph_out", output_mode="update")
    final = {}
    for r in spark.table("exph_out").collect():
        cur = final.get(r.event_type)
        if cur is None or r.n_events > cur[0]:
            final[r.event_type] = (
                r.n_events,
                r.n_buckets,
                r.p50_lb_qc,
                r.p90_lb_qc,
                r.p99_lb_qc,
            )

    all_events = spark.read.parquet(events_dir)
    orig = r13b.load_table
    r13b.load_table = lambda s, d, n: all_events
    try:
        expect = {
            r.event_type: (
                r.n_events,
                r.n_buckets,
                r.p50_lb_qc,
                r.p90_lb_qc,
                r.p99_lb_qc,
            )
            for r in r13b.agg_exp_histogram(spark, "ignored").collect()
        }
    finally:
        r13b.load_table = orig
    assert final == expect
    assert len(final) > 0


def test_stateful_exp_histogram_bucket_model(spark, tmp_path):
    """The Python bucket mapping against hand-computed buckets, and
    state mergeability across micro-batches: the 64-cent octave's
    quarter-buckets break at 96/112/128 cents, so 1.00 and 1.10 share
    [96,112) while 1.12 starts [112,128); 2.56 opens the 256-cent
    octave (lb 1024 quarter-cents)."""
    from downloader_spark.streaming.stateful import (
        _exph_bucket,
        _exph_lb_qc,
        streaming_exp_histogram,
    )

    assert _exph_bucket(1.00) == _exph_bucket(1.10)
    assert _exph_bucket(1.12) == _exph_bucket(1.00) + 1
    assert _exph_lb_qc(_exph_bucket(1.00)) == 384  # 96 cents in qc
    assert _exph_lb_qc(_exph_bucket(2.56)) == 1024
    rows = [("t0", 1.00)] * 50 + [("t0", 1.30)] * 40 + [("t0", 90.0)] * 10
    small = spark.createDataFrame(rows, "event_type string, value double")
    d = str(tmp_path / "exph_events")
    small.repartition(4).write.parquet(d)
    stream = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    run_to_memory(streaming_exp_histogram(stream), "exph_small", output_mode="update")
    final = max(
        spark.table("exph_small").collect(), key=lambda r: r.n_events
    )
    # p50 over 100 values: target ceil(50) = 50 -> the [96,112)-cent
    # bucket; p90: 90 -> the 130-cent bucket; p99: 99 -> 9000 cents
    assert final.n_events == 100 and final.n_buckets == 3
    assert final.p50_lb_qc == 384
    assert final.p90_lb_qc == _exph_lb_qc(_exph_bucket(1.30))
    assert final.p99_lb_qc == _exph_lb_qc(_exph_bucket(90.0))
