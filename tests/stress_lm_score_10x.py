#!/usr/bin/env python
"""10x stress for the token-stream-count family (text_lm_score):
clone the sf0.1 documents table 10x by doc_id shift with text
UNCHANGED — the bigram fact stream grows 10x while the vocabulary
tables (c_bg, c_w1) stay EXACTLY the same size (same texts), which
is the realistic corpus-growth direction for conditional-count
operators: fact volume scales, vocabulary saturates.

A super-linear wall ratio here would mean the per-doc counts or the
count-table joins are doing pair-space work; linear-ish (~<= 10x on
a 32-core box where 1x underutilizes) means the shuffle structure
holds.  Run manually on a quiet machine; results recorded in
PERF.md:

    python tests/stress_lm_score_10x.py
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

KEYS = ("text_lm_score",)

BASE = "/root/testdata/sf0.1"
CLONE_DIR = "/tmp/stress10x_lm_score"
KEY_SHIFT = 100_000_000


def build_clone(spark) -> None:
    if os.path.exists(f"{CLONE_DIR}/documents.parquet"):
        return
    os.makedirs(CLONE_DIR, exist_ok=True)
    src = load_table(spark, BASE, "documents")
    copies = [
        src.withColumn("doc_id", F.col("doc_id") + F.lit(k * KEY_SHIFT))
        for k in range(10)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.repartition(32).write.mode("overwrite").parquet(
        f"{CLONE_DIR}/documents.parquet"
    )


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def vocab_sizes(spark, sf_dir: str) -> tuple[int, int]:
    """Corpus count-table cardinalities — must NOT grow in the 10x
    clone (same texts => same vocabulary)."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .selectExpr(
            "split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', ' ')), ' +')"
            " AS toks"
        )
        .selectExpr("filter(toks, t -> t != '') AS toks")
    )
    bg = toks.filter(F.expr("size(toks) >= 2")).selectExpr(
        "explode(zip_with(slice(toks, 1, size(toks) - 1),"
        " slice(toks, 2, size(toks) - 1),"
        " (a, b) -> struct(a AS w1, concat_ws(' ', a, b) AS bg))) AS p"
    )
    n_bg = bg.select("p.bg").distinct().count()
    n_w1 = bg.select("p.w1").distinct().count()
    return n_bg, n_w1


def main() -> None:
    spark = get_spark(app="stress-lm-score-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_clone(spark)
    reg = registry()
    for name in KEYS:  # warm: compile the plan at the smallest SF
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
    b1, w1 = vocab_sizes(spark, BASE)
    b10, w10 = vocab_sizes(spark, CLONE_DIR)
    print(f"vocab: 1x bigrams={b1} w1={w1}; 10x bigrams={b10} w1={w10}"
          f" (must be equal: {b1 == b10 and w1 == w10})")
    spark.stop()


if __name__ == "__main__":
    main()
