"""Capture .explain("formatted") for every timed/declared plan.

Usage: python plans/r14/capture_plans.py <suffix> [name ...]
Writes plans/r14/<query>_<suffix>.txt for each query (default: all).
Not part of the engine; a measurement tool for the r15 optimization
round (guide §1.1/§7.2).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from radares_spark.plans import REGISTRY  # noqa: E402
from radares_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

OUT = REPO / "plans" / "r15"


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("radares-plan-capture")

    import bench

    plans = {name: spec.fn for name, spec in REGISTRY.items()}
    lib = {**bench.LIBRARY_PLANS, **bench._late_library_plans()}
    for name in bench.HEADLINE + bench.EXTRA:
        if name not in plans and name in lib:
            plans[name] = lib[name]

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, fn in sorted(plans.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR: {type(exc).__name__}: {exc}"
        (OUT / f"{name}_{suffix}.txt").write_text(text)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
