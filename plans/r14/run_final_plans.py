"""Execute timed plans via the noop sink and capture the FINAL
adaptive plan (ReusedExchange / runtime join strategy visible) plus
warm walls.

Usage: python plans/r14/run_final_plans.py <suffix> [name ...]
Writes plans/r14/final_<query>_<suffix>.txt and prints one JSON line
of warm medians. Measurement tool only (guide §1 / §7.2).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from radares_spark.plans import REGISTRY  # noqa: E402
from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

OUT = REPO / "plans" / "r14"
REPS = 3


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "final"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-final-plan")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    import bench

    plans = {name: spec.fn for name, spec in REGISTRY.items()}
    lib = {**bench.LIBRARY_PLANS, **bench._late_library_plans()}
    for name in bench.HEADLINE + bench.EXTRA:
        if name not in plans and name in lib:
            plans[name] = lib[name]

    warm: dict[str, float] = {}
    for name, fn in sorted(plans.items()):
        if only and name not in only:
            continue
        try:
            spark.sparkContext.setJobDescription(name)
            df = fn(spark, sf_dir)
            # collect() executes THIS DataFrame's QueryExecution, so the
            # adaptive plan below is the executed one (isFinalPlan=true
            # with ReusedExchange / runtime join strategies visible); a
            # noop write would wrap a fresh execution and leave df's own
            # plan unexecuted.
            df.collect()
            text = df._jdf.queryExecution().executedPlan().toString()
            (OUT / f"final_{name}_{suffix}.txt").write_text(text)
            warm[name] = round(
                statistics.median(
                    bench._noop_time(df) for _ in range(REPS)
                ),
                3,
            )
        except Exception as exc:  # noqa: BLE001
            warm[name] = -1.0
            (OUT / f"final_{name}_{suffix}.txt").write_text(
                f"ERROR: {type(exc).__name__}: {exc}"
            )
        print(name, warm.get(name), flush=True)
    print(json.dumps({"suffix": suffix, "warm": warm}))
    spark.stop()


if __name__ == "__main__":
    main()
