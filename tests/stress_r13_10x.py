#!/usr/bin/env python
"""10x stress for the round-13 keys, each in its realistic growth
direction:

- documents keys (multimodal_pframe_stats, dedup_unicode_fold):
  clone documents 10x by doc_id shift (shift divisible by 4 keeps
  the fold key's planted base-group structure) — 10x clips to
  encode/decode, 10x docs to fold.
- embeddings keys (embed_ann_graph, embed_ann_graph_recall): clone
  the CORPUS 10x by vec_id shift (queries vec_id < 5 stay 5) — this
  is the direct test of the linear-construction claim: bucket count
  grows ~10x (max(8, n // 62)), per-bucket pair cost stays O(62^2),
  and the search probe count per query must stay flat.
- orders key (join_ip_prefix6): clone orders 10x by o_orderkey
  shift — 10x lookup IPs against the same prefix dimension.

Linear-ish wall ratios mean volume-bound; super-linear exposes
pair-space blowups (the NSW construction is the one to watch).
Run manually on a quiet machine; results recorded in PERF.md:

    python tests/stress_r13_10x.py
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

BASE = "/root/testdata/sf0.1"
CLONE_DIR = "/tmp/stress10x_r13"
KEY_SHIFT = 100_000_000  # divisible by 4: preserves unicode-fold groups

DOC_KEYS = ("multimodal_pframe_stats", "dedup_unicode_fold")
EMB_KEYS = ("embed_ann_graph", "embed_ann_graph_recall")
ORD_KEYS = ("join_ip_prefix6", "scalar_ip6")
PASSTHROUGH = ("nation", "supplier", "customer", "part", "region",
               "lineitem", "events")


def build_clone(spark) -> None:
    if os.path.exists(f"{CLONE_DIR}/embeddings.parquet"):
        return
    os.makedirs(CLONE_DIR, exist_ok=True)
    for t, key, queries_lt in (
        ("documents", "doc_id", None),
        ("orders", "o_orderkey", None),
        ("embeddings", "vec_id", 5),
    ):
        src = load_table(spark, BASE, t)
        if queries_lt is not None:
            # queries stay singular; only the corpus side multiplies
            q = src.filter(F.col(key) < queries_lt)
            c = src.filter(F.col(key) >= queries_lt)
            copies = [
                c.withColumn(key, F.col(key) + F.lit(k * KEY_SHIFT))
                for k in range(10)
            ]
            df = q
            for cp in copies:
                df = df.unionByName(cp)
        else:
            copies = [
                src.withColumn(key, F.col(key) + F.lit(k * KEY_SHIFT))
                for k in range(10)
            ]
            df = copies[0]
            for cp in copies[1:]:
                df = df.unionByName(cp)
        df.repartition(32).write.mode("overwrite").parquet(
            f"{CLONE_DIR}/{t}.parquet"
        )
    for t in PASSTHROUGH:
        dst = f"{CLONE_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            src = f"{BASE}/{t}.parquet"
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app="stress-r13-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_clone(spark)
    reg = registry()
    keys = DOC_KEYS + EMB_KEYS + ORD_KEYS
    for name in keys:  # warm: compile every plan at the smallest SF
        force(reg[name].fn(spark, "/root/testdata/sf0.001"))
    print(f"{'key':26} {'1x sec':>8} {'10x sec':>8} {'ratio':>6} {'10x rows':>10}")
    for name in keys:
        t0 = time.perf_counter()
        force(reg[name].fn(spark, BASE))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(reg[name].fn(spark, CLONE_DIR))
        t10 = time.perf_counter() - t0
        rows = reg[name].fn(spark, CLONE_DIR).count()
        print(f"{name:26} {t1:8.2f} {t10:8.2f} {t10 / t1:6.1f} {rows:10d}")
    spark.stop()


if __name__ == "__main__":
    main()
