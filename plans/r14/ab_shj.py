"""A/B: spark.sql.join.preferSortMergeJoin=false (shuffled-hash join
when the planner's size conditions hold) on the SMJ-carrying plans.

Join strategy never changes rows; equality is asserted anyway. The
conf is read at action time, so each timed rep re-sets it before the
noop write (plans are fixed at execution under the current conf).
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

REPS = int(os.environ.get("AB_REPS", "5"))
QUERIES = os.environ.get(
    "AB_QUERIES", "shards_pack,text_bpe_encode,q7_nation_volume"
).split(",")
CONF = os.environ.get("AB_CONF", "spark.sql.join.preferSortMergeJoin")
OFFV = os.environ.get("AB_OFF", "true")
ONV = os.environ.get("AB_ON", "false")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-ab-shj")
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    import bench
    from radares_spark.plans import REGISTRY

    lib = {**bench.LIBRARY_PLANS, **bench._late_library_plans()}

    def plan_fn(name):
        return REGISTRY[name].fn if name in REGISTRY else lib[name]

    for q in QUERIES:
        df = plan_fn(q)(spark, sf_dir)
        spark.conf.set(CONF, OFFV)
        rb = sorted(map(tuple, df.collect()))
        smj_b = df._jdf.queryExecution().executedPlan().toString().count(
            "SortMergeJoin"
        )
        spark.conf.set(CONF, ONV)
        rv = sorted(map(tuple, df.collect()))
        smj_v = df._jdf.queryExecution().executedPlan().toString().count(
            "SortMergeJoin"
        )
        shj_v = df._jdf.queryExecution().executedPlan().toString().count(
            "ShuffledHashJoin"
        )
        print(
            f"{q}: rows={len(rb)} equal={rb == rv} "
            f"smj true={smj_b} false={smj_v} shj false={shj_v}"
        )
        if rb != rv:
            spark.stop()
            sys.exit(1)

        for conf in (OFFV, ONV):
            spark.conf.set(CONF, conf)
            df.write.format("noop").mode("overwrite").save()  # warm both
        walls = {"smj": [], "shj": []}
        for _ in range(REPS):
            for tag, conf in (("smj", OFFV), ("shj", ONV)):
                spark.conf.set(CONF, conf)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                walls[tag].append(time.perf_counter() - t0)
        print(
            f"{q}: med smj={statistics.median(walls['smj']):.3f} "
            f"shj={statistics.median(walls['shj']):.3f} | "
            f"min smj={min(walls['smj']):.3f} shj={min(walls['shj']):.3f} | "
            f"{[round(x,2) for x in walls['smj']]} vs "
            f"{[round(x,2) for x in walls['shj']]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
