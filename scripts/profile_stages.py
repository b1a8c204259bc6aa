#!/usr/bin/env python
"""Per-stage profiler (guide §1/§7 without a live UI): run named queries
with the event log enabled, then print each job's stages with duration,
task count and shuffle bytes, grouped under the query's build/exec
phase via setJobDescription labels.

Usage: python scripts/profile_stages.py <query> [query ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EV_DIR = "/tmp/spark-events"


def main() -> None:
    from data_ingestion_system_spark import registry
    from data_ingestion_system_spark.session import get_spark

    names = sys.argv[1:]
    os.makedirs(EV_DIR, exist_ok=True)
    spark = get_spark(app_name="profile_stages", cpus="32", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EV_DIR,
        "spark.eventLog.compress": "false",
        "spark.eventLog.compression.codec": "none",
    })
    sc = spark.sparkContext
    qs = registry.queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up: codegen + python workers on an unrelated pandas-UDF query
    run(qs["dedup_semantic"](spark, SF_DIR))

    for name in names:
        spark.catalog.clearCache()
        sc.setJobDescription(f"{name} :: build")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t1 = time.perf_counter()
        sc.setJobDescription(f"{name} :: exec")
        run(df)
        t2 = time.perf_counter()
        sc.setJobDescription(None)
        print(f"## {name}: build {t1-t0:.3f}s exec {t2-t1:.3f}s",
              flush=True)

    app_id = sc.applicationId
    spark.stop()
    _report(app_id)


def _report(app_id: str) -> None:
    paths = glob.glob(f"{EV_DIR}/*{app_id}*/events*") + glob.glob(
        f"{EV_DIR}/*{app_id}*")
    path = next(p for p in paths if os.path.isfile(p))
    jobs: dict = {}
    stages: dict = {}
    for line in open(path):
        e = json.loads(line)
        t = e.get("Event")
        if t == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "desc": e["Properties"].get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                "start": e["Submission Time"]}
        elif t == "SparkListenerJobEnd":
            j = jobs.get(e["Job ID"])
            if j:
                j["dur"] = (e["Completion Time"] - j["start"]) / 1000
        elif t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0],
                "tasks": si["Number of Tasks"],
                "dur": (si.get("Completion Time", 0)
                        - si.get("Submission Time", 0)) / 1000}
    cur = None
    for jid, j in sorted(jobs.items()):
        if "::" not in j["desc"]:
            continue
        if j["desc"] != cur:
            cur = j["desc"]
            print(f"\n=== {cur}")
        print(f"  job {jid}: {j.get('dur', 0.0):7.3f}s")
        for s in sorted(j["stages"]):
            if s in stages:
                st = stages[s]
                print(f"    stage {s}: {st['dur']:7.3f}s {st['tasks']:4d} "
                      f"tasks  {st['name'][:70]}")


if __name__ == "__main__":
    main()
