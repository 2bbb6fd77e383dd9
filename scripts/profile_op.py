#!/usr/bin/env python
"""Per-job profiler for registered ops (optimization-round tooling).

Runs each named op under a session with the Spark event log enabled,
then parses the log into a per-op job table: job duration, task count,
inter-job driver gap, and the job group/description — so optimization
targets the jobs (and the driver-side gaps between them) that actually
cost, instead of guessing from code shape (guide §1: measure first).

Usage:
    python scripts/profile_op.py --sf-dir /root/testdata/sf0.1 op1 op2 ...
    python scripts/profile_op.py --repeat 2 sim_index_ivfpq_delete
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import engine  # noqa: E402
from engine.session import RUNTIME_CONFS, apply_runtime_confs  # noqa: E402


def build_session(log_dir: str):
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    b = (
        SparkSession.builder.appName("profile_op")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(min(32, cpus * 2)))
        .config("spark.driver.memory", os.environ.get("ENGINE_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return apply_runtime_confs(b.getOrCreate())


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--min-ms", type=int, default=0, help="hide jobs shorter than this")
    ap.add_argument("ops", nargs="+")
    args = ap.parse_args()

    unknown = [n for n in args.ops if n not in engine.QUERIES]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")

    log_dir = tempfile.mkdtemp(prefix="profile_op_events_")
    spark = build_session(log_dir)
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        force(engine.table(spark, args.sf_dir, t))
    force(engine.table(spark, args.sf_dir, "orders").groupBy("o_orderstatus").count())

    spans = []  # (op, rep, t0_ms, t1_ms)
    for name in args.ops:
        for rep in range(args.repeat):
            spark.sparkContext.setJobDescription(f"op:{name}:{rep}")
            t0 = time.time() * 1000
            force(engine.QUERIES[name](spark, args.sf_dir))
            t1 = time.time() * 1000
            spark.sparkContext.setJobDescription(None)
            spans.append((name, rep, t0, t1, (t1 - t0) / 1000))
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # the event log is <dir>/<app_id>(.inprogress), or a rolling
    # eventlog_v2_<app_id>/ directory of events_* files (Spark 4)
    candidates = [
        os.path.join(log_dir, app_id),
        os.path.join(log_dir, app_id + ".inprogress"),
    ]
    roll = os.path.join(log_dir, f"eventlog_v2_{app_id}")
    if os.path.isdir(roll):
        candidates += sorted(
            os.path.join(roll, f)
            for f in os.listdir(roll)
            if f.startswith("events_")
        )
    lines = []
    for path in candidates:
        if os.path.isfile(path):
            with open(path) as f:
                lines.extend(f)
    jobs = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "site": props.get("callSite.short", ""),
                    "tasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                    "stages": len(ev.get("Stage Infos", [])),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]

    for name, rep, t0, t1, wall in spans:
        sel = sorted(
            (j for j in jobs.values() if "end" in j and t0 <= j["start"] <= t1),
            key=lambda j: j["start"],
        )
        jtot = sum(j["end"] - j["start"] for j in sel) / 1000
        print(f"\n== {name} rep={rep}: wall={wall:.2f}s  jobs={len(sel)} "
              f"job_time={jtot:.2f}s  driver_gaps={wall - jtot:.2f}s")
        prev_end = t0
        for j in sel:
            gap = (j["start"] - prev_end) / 1000
            dur = (j["end"] - j["start"]) / 1000
            prev_end = j["end"]
            if dur * 1000 < args.min_ms and gap * 1000 < args.min_ms:
                continue
            print(f"  gap={gap:6.3f}s  job={dur:6.3f}s  tasks={j['tasks']:4d} "
                  f"stages={j['stages']:2d}  {j['site'][:60]}")


if __name__ == "__main__":
    main()
