#!/usr/bin/env python
"""10x stress for the round-14 keys, each in its realistic growth
direction:

- documents keys (text_charset_detect, pipeline_crawl): clone
  documents 10x by doc_id shift — 10x archives synthesized, decoded,
  extracted and deduped; the attrition aggregate stays 5 rows.
- multimodal_parquet_pages: the documents/events/orders clones are
  DIRECTORIES of part files 10x the original bytes — exercising the
  per-file-partial → mergeable-sum shape (the original fixture is a
  single file per table; a real lake is neither).
- embed_ann_hnsw: clone the embeddings CORPUS 10x by vec_id shift
  (queries stay the fixed vec_id < N_QUERIES originals — corpora
  grow, query sets don't).  Construction is bucket-bounded so build
  cost grows ~linearly; probe counts per query must stay FLAT
  (that's the whole point of graph ANN), so wall growth should be
  well under 10x.

Run manually on a quiet machine; results recorded in PERF.md:

    python tests/stress_r14_10x.py
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
CLONE_DIR = "/tmp/stress10x_r14"
KEY_SHIFT = 100_000_000

DOC_KEYS = (
    "text_charset_detect",
    "pipeline_crawl",
    "multimodal_parquet_pages",
)
EMB_KEYS = ("embed_ann_hnsw",)
KEYS = DOC_KEYS + EMB_KEYS
PASSTHROUGH = ("nation", "supplier", "customer", "part", "region", "lineitem")


def build_clone(spark) -> None:
    if os.path.exists(f"{CLONE_DIR}/embeddings.parquet"):
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
    # embeddings: clone the CORPUS half only; query ids stay unique
    from downloader_spark.operators.llm_similarity import N_QUERIES

    emb = load_table(spark, BASE, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    copies = [emb] + [
        corpus.withColumn("vec_id", F.col("vec_id") + F.lit(k * KEY_SHIFT))
        for k in range(1, 10)
    ]
    df = copies[0]
    for cp in copies[1:]:
        df = df.unionByName(cp)
    df.repartition(32).write.mode("overwrite").parquet(
        f"{CLONE_DIR}/embeddings.parquet"
    )
    for t in PASSTHROUGH:
        dst = f"{CLONE_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            src = f"{BASE}/{t}.parquet"
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app="stress-r14-10x")
    spark.sparkContext.setLogLevel("ERROR")
    build_clone(spark)
    reg = registry()
    for name in KEYS:  # warm: compile every plan at the smallest SF
        force(reg[name].fn(spark, "/root/testdata/sf0.001"))
    print(f"{'key':28} {'1x sec':>8} {'10x sec':>8} {'ratio':>6} {'10x rows':>10}")
    for name in KEYS:
        t0 = time.perf_counter()
        force(reg[name].fn(spark, BASE))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(reg[name].fn(spark, CLONE_DIR))
        t10 = time.perf_counter() - t0
        rows = reg[name].fn(spark, CLONE_DIR).count()
        print(f"{name:28} {t1:8.2f} {t10:8.2f} {t10 / t1:6.1f} {rows:10d}")
    spark.stop()


if __name__ == "__main__":
    main()
