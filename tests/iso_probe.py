#!/usr/bin/env python
"""Isolation probe: time a comma-separated key list alone, with the
bench.py warmup discipline (sf0.001 codegen warmup + one untimed
settle pass at the target SF), printing per-key median/min over
SPARK_GRAFT_ISO_REPEAT timed passes.  The PERF.md isolation-table
instrument (round-15 lesson: full-sweep numbers run heavy keys up to
~1.3x their isolated steady state — always probe in isolation before
calling a sweep number a regression).

    SPARK_GRAFT_ISO_KEYS=a,b,c python tests/iso_probe.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from downloader_spark.io import load_table
from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark


def force(df) -> int:
    # noop sink, NOT count(): count() lets the optimizer prune columns
    # (and sometimes whole subtrees), so it can time a cheaper query
    # than the one bench.py measures (guide §1.4).  Same action as
    # bench.py's force() so isolation numbers are comparable.
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    keys = [
        k
        for k in os.environ.get("SPARK_GRAFT_ISO_KEYS", "").split(",")
        if k
    ]
    if not keys:
        raise SystemExit("set SPARK_GRAFT_ISO_KEYS=a,b,c")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_ISO_REPEAT", "5"))
    specs = registry()
    unknown = [k for k in keys if k not in specs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    spark = get_spark(app="downloader-spark-iso")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    for k in keys:
        force(specs[k].fn(spark, "/root/testdata/sf0.001"))
    for k in keys:
        force(specs[k].fn(spark, sf_dir))  # untimed settle pass
        times = []
        for _ in range(repeat):
            t0 = time.monotonic()
            force(specs[k].fn(spark, sf_dir))
            times.append(time.monotonic() - t0)
        print(
            f"{k}: median={statistics.median(times):.3f}s"
            f" min={min(times):.3f}s"
            f" all={[round(x, 3) for x in times]}"
        )


if __name__ == "__main__":
    main()
