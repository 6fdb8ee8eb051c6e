#!/usr/bin/env python
"""10x stress for the round-7 keys, in each family's realistic
growth direction:

- events keys (agg_mad, events_cooccurrence, events_seasonality,
  ts_seasonal, sample_reservoir, graph_degree): clone the sf0.1
  events 10x by event_id shift with user/type/day SPACE UNCHANGED —
  10x fact volume over the same 150 users / 5 types / date range, so
  basket sizes, group cardinalities and the daily-series length
  saturate while volume grows.
- documents keys (text_oov_rate, dedup_prefix): clone documents 10x
  by doc_id shift, texts unchanged — vocabulary and prefix-group
  keys saturate, fact volume grows (the text_lm_score direction).

Linear-ish wall ratios mean the shuffle structure is volume-bound;
super-linear would expose pair-space or per-group-sort blowups.
Run manually on a quiet machine; results recorded in PERF.md:

    python tests/stress_r7_10x.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from downloader_spark.io import load_table
from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark

EVENT_KEYS = (
    "agg_mad",
    "events_cooccurrence",
    "events_seasonality",
    "ts_seasonal",
    "sample_reservoir",
    "graph_degree",
    "events_rfm",
    "agg_dispersion",
    "stream_dedup",
    "events_user_overlap",
    "events_dau_wau",
    "events_new_returning",
)
DOC_KEYS = (
    "text_oov_rate",
    "dedup_prefix",
    "pipeline_dedup",
    "text_novelty",
    "text_readability",
    "sample_class_balance",
    "layout_compaction",
)

BASE = "/root/testdata/sf0.1"
CLONE_DIR = "/tmp/stress10x_r7"
KEY_SHIFT = 100_000_000


def build_clone(spark) -> None:
    if os.path.exists(f"{CLONE_DIR}/documents.parquet"):
        return
    os.makedirs(CLONE_DIR, exist_ok=True)
    for t, key in (("events", "event_id"), ("documents", "doc_id")):
        src = load_table(spark, BASE, t)
        copies = [
            src.withColumn(key, F.col(key) + F.lit(k * KEY_SHIFT))
            for k in range(10)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.repartition(32).write.mode("overwrite").parquet(
            f"{CLONE_DIR}/{t}.parquet"
        )


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    spark = get_spark(app="stress-r7-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_clone(spark)
    reg = registry()
    keys = EVENT_KEYS + DOC_KEYS
    for name in keys:  # warm: compile every plan at the smallest SF
        force(reg[name].fn(spark, "/root/testdata/sf0.001"))
    print(f"{'key':24} {'1x sec':>8} {'10x sec':>8} {'ratio':>6} {'10x rows':>10}")
    for name in keys:
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
