#!/usr/bin/env python
"""10x stress for the round-13b keys, each in its realistic growth
direction:

- documents/codec keys (gif, inflate, gzip members, varint) and
  graph_scc: clone documents 10x by doc_id shift.  The shift is
  divisible by 4, so the SCC key's planted 2-cycles stay disjoint
  and well-formed (cycle ids shift by KEY_SHIFT/2, which is even, so
  the cycle-pair parity is preserved too) — 10x components, same
  diameter, so the iteration count must stay FLAT while volume
  grows.
- events keys (theta intersect/union, exp histogram, skew profile):
  clone events 10x by event_id shift with user_id/value unchanged —
  per-key row counts grow 10x while the distinct-user sketches stay
  k-bounded, which is exactly the mergeable-sketch claim.
- orders key (filter_zorder_range): clone orders 10x — the covering
  z-interval stays constant, selectivity stays proportional.

Linear-ish wall ratios mean volume-bound; for graph_scc, near-flat
wall is the win (iteration-bound, not volume-bound).  Run manually on
a quiet machine; results recorded in PERF.md:

    python tests/stress_r13b_10x.py
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
CLONE_DIR = "/tmp/stress10x_r13b"
KEY_SHIFT = 100_000_000  # divisible by 4: preserves the SCC rings

DOC_KEYS = (
    "multimodal_gif_stats",
    "multimodal_inflate_stats",
    "multimodal_gzip_members",
    "multimodal_zip_entries",
    "multimodal_tar_members",
    "multimodal_warc_records",
    "multimodal_http_chunked",
    "text_html_strip",
    "scalar_varint",
    "graph_scc",
)
EVT_KEYS = (
    "agg_theta_intersect",
    "agg_theta_union",
    "agg_exp_histogram",
    "dq_skew_profile",
)
ORD_KEYS = ("filter_zorder_range",)
PASSTHROUGH = (
    "nation",
    "supplier",
    "customer",
    "part",
    "region",
    "lineitem",
    "embeddings",
)


def build_clone(spark) -> None:
    if os.path.exists(f"{CLONE_DIR}/orders.parquet"):
        return
    os.makedirs(CLONE_DIR, exist_ok=True)
    for t, key in (
        ("documents", "doc_id"),
        ("events", "event_id"),
        ("orders", "o_orderkey"),
    ):
        src = load_table(spark, BASE, t)
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
    spark = get_spark(app="stress-r13b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_clone(spark)
    reg = registry()
    keys = DOC_KEYS + EVT_KEYS + ORD_KEYS
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
