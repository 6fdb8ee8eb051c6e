#!/usr/bin/env python
"""Session-drag probe (round 17): quantify why keys run 1.5-2x slower
in a full-registry sweep than isolated, and test mitigations.

Protocol: warm a fresh session exactly like bench.py (sf0.001 codegen
pass), time a 12-key PROBE basket, run N full sweep passes over every
registry key (the drag generator), re-time the probe basket in the
same session, and dump the JVM-side suspects before/after:
persistent-RDD count, storage memory, JIT code cache, metaspace, GC
totals.

    SPARK_GRAFT_DRAG_MODE=none|unpersist python tools/session_drag_probe.py

`unpersist` drains every persistent RDD between sweep keys (the
leaked-localCheckpoint hypothesis).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from downloader_spark.io import load_table
from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark

PROBE = (
    "dedup_minhash_estimate_error",
    "text_lm_score",
    "dedup_ngram_jaccard",
    "graph_pagerank",
    "dedup_suffix_spans",
    "text_readability",
    "agg_basic",
    "scan_project",
)
SF = "/root/testdata/sf0.1"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def jvm_stats(spark) -> dict:
    jvm = spark.sparkContext._jvm
    mgmt = jvm.java.lang.management.ManagementFactory
    out = {}
    for pool in mgmt.getMemoryPoolMXBeans().toArray():
        name = pool.getName()
        if any(k in name for k in ("CodeHeap", "Metaspace", "Old", "Eden")):
            u = pool.getUsage()
            out[name] = f"{u.getUsed() // (1 << 20)}/{u.getMax() // (1 << 20)}MB"
    gc_ms = 0
    gc_n = 0
    for gc in mgmt.getGarbageCollectorMXBeans().toArray():
        gc_ms += gc.getCollectionTime()
        gc_n += gc.getCollectionCount()
    out["gc"] = f"{gc_n} collections, {gc_ms} ms"
    out["persistent_rdds"] = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    return out


def time_probe(spark, specs) -> dict[str, float]:
    out = {}
    for k in PROBE:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(specs[k].fn(spark, SF))
            ts.append(time.perf_counter() - t0)
        out[k] = round(sorted(ts)[1], 3)
    return out


def main() -> None:
    mode = os.environ.get("SPARK_GRAFT_DRAG_MODE", "none")
    specs = registry()
    spark = get_spark(app="drag-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, SF, t).count()
    for name, spec in sorted(specs.items()):
        try:
            force(spec.fn(spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    print("jvm after warmup:", jvm_stats(spark))
    fresh = time_probe(spark, specs)
    print("probe FRESH:", fresh)

    jsc = spark.sparkContext._jsc
    t0 = time.perf_counter()
    insweep: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        tk = time.perf_counter()
        try:
            force(spec.fn(spark, SF))
        except Exception as e:
            print(f"sweep {name} FAILED: {e}", file=sys.stderr)
        insweep[name] = round(time.perf_counter() - tk, 3)
        if mode == "unpersist":
            it = jsc.sc().getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
    print(f"sweep pass done in {time.perf_counter() - t0:.1f}s (mode={mode})")
    print("probe keys IN-SWEEP:", {k: insweep[k] for k in PROBE})
    print("jvm after sweep:", jvm_stats(spark))
    aged = time_probe(spark, specs)
    print("probe AGED:", aged)
    ratios = {k: round(aged[k] / fresh[k], 2) for k in PROBE}
    print("aged/fresh ratios:", ratios)
    spark.stop()


if __name__ == "__main__":
    main()
