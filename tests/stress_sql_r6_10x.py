#!/usr/bin/env python
"""10x stress for the round-6 SQL shapes: clone the sf0.1 fact tables
(lineitem + orders) 10x by orderkey shift with dimensions UNCHANGED —
10x orders over the same 100 suppliers / parts / nations, the realistic
fact-growth direction.  dedup_semantic_learned inherits the r5
kmeans/semantic stress profile (embeddings corpus unchanged here).

Run manually on a quiet machine; results recorded in PERF.md:

    python tests/stress_sql_r6_10x.py
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

KEYS = (
    "sql_q4_late_orders",
    "sql_q7_nation_flows",
    "sql_q9_part_profit",
    "sql_q11_key_parts",
    "sql_q12_lag_buckets",
    "sql_q15_top_supplier",
    "sql_q20_excess_share",
    "sql_q21_last_shipper",
)

BASE = "/root/testdata/sf0.1"
CLONE_DIR = "/tmp/stress10x_sql_r6"
KEY_SHIFT = 100_000_000


def build_clone(spark) -> None:
    if os.path.exists(f"{CLONE_DIR}/lineitem.parquet"):
        return
    os.makedirs(CLONE_DIR, exist_ok=True)
    for t in ("nation", "region", "supplier", "part", "customer"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{CLONE_DIR}/{t}.parquet")
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
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
    spark = get_spark(app="stress-sql-r6-10x")
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
