"""Per-stage profile of one query via the Spark event log.

Usage: python plans/r14/profile_query.py <query> [reps]
Runs the query warm and prints per-stage wall / task-time / shuffle
bytes, aggregated over reps. Measurement tool (guide §1/§7).
"""
from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

EVDIR = "/tmp/spark-events"


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.makedirs(EVDIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark(
        f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    import bench
    from radares_spark.plans import REGISTRY

    lib = {**bench.LIBRARY_PLANS, **bench._late_library_plans()}
    fn = lib.get(name) or REGISTRY[name].fn
    df = fn(spark, sf_dir)
    bench._materialize(df)  # cold
    spark.sparkContext.setJobDescription(f"PROF:{name}")
    t0 = time.perf_counter()
    for _ in range(reps):
        bench._materialize(df)
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse the event log
    log = Path(EVDIR) / app_id
    prof_jobs = set()
    job_stages = {}
    stages = {}
    for line in log.read_text().splitlines():
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            if desc.startswith("PROF:"):
                prof_jobs.add(ev["Job ID"])
                job_stages[ev["Job ID"]] = [
                    s["Stage ID"] for s in ev["Stage Infos"]
                ]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages.setdefault(si["Stage ID"], {}).update(
                name=si["Stage Name"].split("\n")[0][:70],
                wall_ms=(comp - sub) if sub and comp else None,
                tasks=si["Number of Tasks"],
            )
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            acc = {
                a["Name"]: a.get("Update", 0)
                for a in (ev.get("Task Info") or {}).get("Accumulables", [])
                if a.get("Internal")
            }
            agg = stages.setdefault(sid, {})
            agg["task_ms"] = agg.get("task_ms", 0) + acc.get(
                "internal.metrics.executorRunTime", 0
            )
            agg["sh_read"] = (
                agg.get("sh_read", 0)
                + acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                + acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
            )
            agg["sh_write"] = agg.get("sh_write", 0) + acc.get(
                "internal.metrics.shuffle.write.bytesWritten", 0
            )

    wanted = sorted(
        {s for j in prof_jobs for s in job_stages.get(j, [])}
    )
    print(f"{name}: {reps} reps, total {wall:.2f}s "
          f"({wall / reps:.3f}s/rep), {len(prof_jobs)} jobs, "
          f"{len(wanted)} stages")
    rows = [(sid, stages.get(sid, {})) for sid in wanted]
    rows.sort(key=lambda r: -(r[1].get("wall_ms") or 0))
    for sid, s in rows:
        if not s:
            continue
        print(
            f"  stage {sid:4d} wall={s.get('wall_ms', 0) or 0:6d}ms "
            f"task={s.get('task_ms', 0):7d}ms n={s.get('tasks', 0):3d} "
            f"shR={s.get('sh_read', 0) // 1024:6d}K "
            f"shW={s.get('sh_write', 0) // 1024:6d}K  {s.get('name', '')}"
        )


if __name__ == "__main__":
    main()
