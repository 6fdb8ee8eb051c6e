#!/usr/bin/env python
"""Per-key profiler (optimization-round instrument).

Runs each requested query key with the bench.py warmup discipline
(sf0.001 codegen warmup + one untimed settle pass at the target SF),
forces the plan with the noop sink, and afterwards parses the Spark
event log into a per-stage table: wall seconds, task time, shuffle
read/write bytes+records, input bytes, output rows.  This is the
guide-§1 "where does the time actually go" instrument — the UI is
disabled in the sandbox, so the event log is the task-metrics source.

    SPARK_GRAFT_PROF_KEYS=a,b,c python tools/profile_key.py

Optionally SPARK_GRAFT_PROF_REPEAT (default 3 timed passes; the
per-stage table covers the LAST pass only, steady state).
Explain output goes to plans/r16/<key>_<tag>.txt when
SPARK_GRAFT_PROF_PLAN_TAG is set (e.g. "before"/"after").
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from downloader_spark.io import load_table
from downloader_spark.plans.registry import registry
from downloader_spark.session import get_spark

EVDIR = "/tmp/spark-events-prof"


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def parse_event_log(path: str) -> None:
    """Print a per-stage table grouped by job description."""
    job_of_stage: dict[int, int] = {}
    job_desc: dict[int, str] = {}
    job_span: dict[int, list[float]] = {}
    stages: list[dict] = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                for sid in ev.get("Stage IDs", []):
                    job_of_stage[sid] = jid
                props = ev.get("Properties") or {}
                job_desc[jid] = props.get("spark.job.description", "")
                job_span[jid] = [ev.get("Submission Time", 0), 0]
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_span:
                    job_span[jid][1] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub is None or com is None:
                    continue
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }

                def num(name: str) -> int:
                    v = acc.get(name, 0)
                    try:
                        return int(v)
                    except (TypeError, ValueError):
                        return 0

                stages.append(
                    {
                        "id": si["Stage ID"],
                        "name": si.get("Stage Name", "")[:60],
                        "tasks": si.get("Number of Tasks", 0),
                        "wall_s": (com - sub) / 1000.0,
                        "task_s": num("internal.metrics.executorRunTime")
                        / 1000.0,
                        "cpu_s": num("internal.metrics.executorCpuTime")
                        / 1e9,
                        "in_mb": num("internal.metrics.input.bytesRead")
                        / 1e6,
                        "sr_mb": (
                            num(
                                "internal.metrics.shuffle.read.localBytesRead"
                            )
                            + num(
                                "internal.metrics.shuffle.read.remoteBytesRead"
                            )
                        )
                        / 1e6,
                        "sw_mb": num(
                            "internal.metrics.shuffle.write.bytesWritten"
                        )
                        / 1e6,
                        "sw_rec": num(
                            "internal.metrics.shuffle.write.recordsWritten"
                        ),
                        "spill_mb": num("internal.metrics.diskBytesSpilled")
                        / 1e6,
                        "py_s": num("internal.metrics.pythonBootTime") / 1000.0
                        + num("internal.metrics.pythonTotalTime") / 1000.0,
                    }
                )
    by_job: dict[int, list[dict]] = {}
    for st in stages:
        jid = job_of_stage.get(st["id"], -1)
        by_job.setdefault(jid, []).append(st)
    for jid in sorted(by_job):
        desc = job_desc.get(jid, "")
        span = job_span.get(jid)
        jw = (span[1] - span[0]) / 1000.0 if span and span[1] else 0.0
        print(f"--- job {jid} [{desc}] wall={jw:.3f}s")
        for st in sorted(by_job[jid], key=lambda s: s["id"]):
            print(
                f"  stage {st['id']:>4} tasks={st['tasks']:<3}"
                f" wall={st['wall_s']:6.3f}s task={st['task_s']:7.2f}s"
                f" cpu={st['cpu_s']:7.2f}s in={st['in_mb']:8.2f}MB"
                f" sr={st['sr_mb']:8.2f}MB sw={st['sw_mb']:8.2f}MB"
                f" swrec={st['sw_rec']:<9} spill={st['spill_mb']:.1f}MB"
                f" py={st['py_s']:6.2f}s  {st['name']}"
            )


def main() -> None:
    keys = [
        k for k in os.environ.get("SPARK_GRAFT_PROF_KEYS", "").split(",") if k
    ]
    if not keys:
        raise SystemExit("set SPARK_GRAFT_PROF_KEYS=a,b,c")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_PROF_REPEAT", "3"))
    tag = os.environ.get("SPARK_GRAFT_PROF_PLAN_TAG", "")
    os.makedirs(EVDIR, exist_ok=True)
    for old in glob.glob(os.path.join(EVDIR, "*")):
        os.remove(old)
    specs = registry()
    unknown = [k for k in keys if k not in specs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    spark = get_spark(
        app="downloader-spark-prof",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            # Spark 4 defaults write a zstd-compressed rolling event
            # log DIRECTORY; parse_event_log wants one plain-text file
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()
    for k in keys:
        spark.sparkContext.setJobDescription(f"warmup:{k}")
        force(specs[k].fn(spark, "/root/testdata/sf0.001"))
    timings: dict[str, list[float]] = {}
    for k in keys:
        spark.sparkContext.setJobDescription(f"settle:{k}")
        force(specs[k].fn(spark, sf_dir))  # untimed settle pass
        for i in range(repeat):
            spark.sparkContext.setJobDescription(f"timed:{k}:{i}")
            t0 = time.monotonic()
            force(specs[k].fn(spark, sf_dir))
            timings.setdefault(k, []).append(time.monotonic() - t0)
        if tag:
            import contextlib
            import io

            df = specs[k].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            rnd = os.environ.get("SPARK_GRAFT_PROF_ROUND", "r17")
            out = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                rnd,
                f"{k}_{tag}.txt",
            )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(plan)
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    for k, ts in timings.items():
        s = sorted(ts)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(f"TIMED {k}: median={med:.3f}s all={[round(x,3) for x in ts]}")
    logs = glob.glob(os.path.join(EVDIR, f"*{app_id}*"))
    if logs:
        print(f"=== event log: {logs[0]}")
        # only print stages belonging to the LAST timed pass per key
        parse_event_log(logs[0])


if __name__ == "__main__":
    main()
