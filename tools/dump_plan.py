#!/usr/bin/env python
"""Dump `.explain("formatted")` for a comma-separated key list to
plans/<dir>/<key>_<suffix>.txt — the judge-facing evidence files for
optimization rounds (the judge cannot run Spark; plan claims are
checked against these files).

    python tools/dump_plan.py --keys a,b,c --suffix before [--dir plans/r16]

The plan is built (not executed): lazy construction only, so keys
whose builders issue eager actions (checkpointed iterative operators)
will run those jobs — that is inherent to what their "plan" is.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--dir", default="plans/r16")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    keys = [k for k in args.keys.split(",") if k]
    specs = registry()
    unknown = [k for k in keys if k not in specs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    os.makedirs(args.dir, exist_ok=True)

    spark = get_spark(app="downloader-spark-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for k in keys:
        df = specs[k].fn(spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.dir, f"{k}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
