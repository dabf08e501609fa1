"""Per-stage timing for one registry query via an (uncompressed) event
log: runs warmup + one timed execution, then prints each timed job's
stages with durations. Usage: r12_stageprof.py <name> [sf_dir]"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = "/tmp/spark-events-plain"
    os.makedirs(evdir, exist_ok=True)

    from blazingsql_spark.queries.registry import all_queries
    from blazingsql_spark.session import get_spark

    spark = get_spark(
        app_name="stageprof",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    specs = all_queries()
    spec = specs[name]
    spec.fn(spark, sf).write.format("noop").mode("overwrite").save()  # warm
    spark.sparkContext.setJobDescription("TIMED_RUN")
    t0 = time.perf_counter()
    spec.fn(spark, sf).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    appid = spark.sparkContext.applicationId
    spark.stop()
    print(f"{name} wall {wall:.3f}s")

    paths = []
    for d in glob.glob(f"{evdir}/*{appid}*"):
        paths.extend(
            p for p in ([d] if os.path.isfile(d) else glob.glob(d + "/*"))
            if "appstatus" not in os.path.basename(p)
        )
    jobs, stages, timed = {}, {}, set()
    for path in paths:
        for line in open(path):
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                desc = (e.get("Properties") or {}).get("spark.job.description", "")
                if desc == "TIMED_RUN":
                    timed.add(e["Job ID"])
                jobs[e["Job ID"]] = (e["Submission Time"], e["Stage IDs"])
            elif ev == "SparkListenerJobEnd" and e["Job ID"] in jobs:
                jobs[e["Job ID"]] = jobs[e["Job ID"]] + (e["Completion Time"],)
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                dur = (si.get("Completion Time") or 0) - (si.get("Submission Time") or 0)
                stages[si["Stage ID"]] = (dur, si["Number of Tasks"], si["Stage Name"])
    for jid in sorted(timed):
        rec = jobs[jid]
        dur = (rec[2] - rec[0]) if len(rec) > 2 else -1
        print(f"job {jid}: {dur} ms, {len(rec[1])} stage-ids")
        for sid in sorted(rec[1]):
            if sid in stages:
                d, nt, nm = stages[sid]
                print(f"  stage {sid:4d} {d:6d}ms tasks {nt:3d}  {nm[:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
