#!/usr/bin/env python
"""10x stress for the events/window operator family (round-6 verdict
item 6): clone the sf0.1 events fact 10x by user/event-id key shift
(timestamps UNCHANGED, so every day becomes 10x hotter — the
adversarial direction for time-bucketed operators), then compare
warm wall-clock 1x vs 10x per key.

Run manually on a quiet machine; results recorded in PERF.md:

    python tests/stress_events_10x.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark

KEYS = (
    "events_attribution",
    "events_concurrency",
    "events_transitions",
    "window_cum_distinct",
    # round-9b additions: per-user folds and compact-table analytics —
    # the clone grows the USER key space 10x (shifted user_ids) while
    # per-user history length stays fixed, exactly these operators'
    # scale axis
    "ts_holt_linear",
    "events_interarrival",
    "events_concentration",
    "agg_moments",
)

BASE = "/root/testdata/sf0.1"
CLONE_DIR = "/tmp/stress10x_events"


def build_clone(spark) -> None:
    out = f"{CLONE_DIR}/events.parquet"
    if os.path.exists(out):
        return
    ev = load_table(spark, BASE, "events")
    copies = [
        ev.select(
            (F.col("event_id") + F.lit(k * 10_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 1_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(10)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.repartition(32).write.mode("overwrite").parquet(out)


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    spark = get_spark(app="stress-events-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_clone(spark)
    reg = registry()
    for name in KEYS:  # warm: compile every plan at the smallest SF
        force(reg[name].fn(spark, "/root/testdata/sf0.001"))
    print(f"{'key':24} {'1x sec':>8} {'10x sec':>8} {'ratio':>6} {'10x rows':>10}")
    for name in KEYS:
        t0 = time.perf_counter()
        force(reg[name].fn(spark, BASE))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(reg[name].fn(spark, CLONE_DIR))
        t10 = time.perf_counter() - t0
        rows = reg[name].fn(spark, CLONE_DIR).count()
        print(f"{name:24} {t1:8.2f} {t10:8.2f} {t10 / t1:6.1f} {rows:10d}")
    spark.stop()


if __name__ == "__main__":
    main()
