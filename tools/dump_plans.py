#!/usr/bin/env python
"""Dump .explain('formatted') for a comma-separated key list to
plans/r16/<key>_<tag>.txt — the plan-evidence half of the
optimization-round protocol (tools/profile_key.py does the same at
the end of a profiled run; this tool skips the timing passes).

    SPARK_GRAFT_PLAN_KEYS=a,b,c SPARK_GRAFT_PLAN_TAG=before \
        python tools/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark


def main() -> None:
    keys = [
        k for k in os.environ.get("SPARK_GRAFT_PLAN_KEYS", "").split(",") if k
    ]
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "")
    if not keys or not tag:
        raise SystemExit("set SPARK_GRAFT_PLAN_KEYS=a,b,c and SPARK_GRAFT_PLAN_TAG")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = registry()
    unknown = [k for k in keys if k not in specs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    spark = get_spark(app="downloader-spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        df = specs[k].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{k}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path)


if __name__ == "__main__":
    main()
